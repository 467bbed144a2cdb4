"""Debug visualisations mirroring the reference's image dumps.

Covers SuperpixelSegmentation::getSegmentedImage / getRandomColorImage
(SuperpixelSegmentation.cpp:53-120), NormalAdaptiveSuperpixel::getNormalImg
(NormalAdaptiveSuperpixel.cpp:39-55), NormalMapGenerator::getNormalImg
(NormalMapGenerator.cu:423-440), and MarkovRandomField's depth colouring
(MarkovRandomField.cpp getRGB:86-99).  All jittable; returns u8 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_color_labels(labels: jnp.ndarray, k: int, seed: int = 0) -> jnp.ndarray:
    """Per-label random colours; -1 labels are black (getRandomColorImage)."""
    rng = np.random.default_rng(seed)
    palette = jnp.asarray(rng.integers(0, 255, (k, 3), dtype=np.uint8))
    lab0 = jnp.maximum(labels, 0)
    img = jnp.take(palette, lab0, axis=0)
    return jnp.where((labels >= 0)[..., None], img, 0).astype(jnp.uint8)


def label_boundaries(color: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """White superpixel boundaries over the colour image
    (getSegmentedImage 'Line' mode, SuperpixelSegmentation.cpp:57-73)."""
    down = jnp.concatenate([labels[1:, :], labels[-1:, :]], axis=0)
    right = jnp.concatenate([labels[:, 1:], labels[:, -1:]], axis=1)
    edge = (labels != down) | (labels != right)
    return jnp.where(edge[..., None], 255, color).astype(jnp.uint8)


def normal_image(normals: jnp.ndarray) -> jnp.ndarray:
    """n -> u8 rgb via 255*(n+1)/2 (getNormalImg)."""
    return jnp.clip(255.0 * (normals + 1.0) / 2.0, 0, 255).astype(jnp.uint8)


def depth_rgb(depth: jnp.ndarray, scale: float = 5000.0) -> jnp.ndarray:
    """The reference's ratio-based BGR ramp (MarkovRandomField::getRGB):
    valid depth maps through a 3-segment ramp, invalid (<=50mm) is black."""
    ratio = jnp.minimum(depth / scale, 0.99)
    c0 = jnp.where(
        ratio < 0.33, ratio / 0.33 * 255.0,
        jnp.where(ratio < 0.66, (0.66 - ratio) / 0.33 * 255.0, 0.0),
    )
    c1 = jnp.where(
        ratio < 0.33, 0.0,
        jnp.where(ratio < 0.66, (ratio - 0.33) / 0.33 * 255.0,
                  (0.99 - ratio) / 0.33 * 255.0),
    )
    c2 = jnp.where(ratio < 0.66, 0.0, (ratio - 0.66) / 0.33 * 255.0)
    img = jnp.stack([c0, c1, c2], axis=-1)
    valid = depth > 50.0
    return jnp.where(valid[..., None], jnp.clip(img, 0, 255), 0.0).astype(jnp.uint8)


def save_png(path: str, image: jnp.ndarray) -> None:
    """Write a u8 image (mirrors the reference's cv::imwrite debug hooks)."""
    from PIL import Image

    Image.fromarray(np.asarray(image)).save(path)
