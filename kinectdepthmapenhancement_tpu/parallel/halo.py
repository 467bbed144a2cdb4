"""Manual halo exchange for spatially tiled stencil ops (shard_map path).

The reference's stencils read up to 3 px past the thread block; on a TPU mesh
the analog is exchanging boundary strips between neighbouring shards over ICI
with jax.lax.ppermute before running the stencil locally (SURVEY.md §5).

`exchange_width` pads a [H, W_shard, ...] block with `radius` columns from
the neighbouring shards (zeros at the global image edges, matching the
stencil modules' zero-padding convention), so a local window op over the
padded block is bitwise-equal to the unsharded op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def exchange_width(x: jnp.ndarray, radius: int, axis_name: str) -> jnp.ndarray:
    """Return x padded to [H, W_shard + 2*radius, ...] with neighbour halos.

    Must be called inside shard_map with `axis_name` mapping the width axis.
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    left_strip = x[:, :radius]
    right_strip = x[:, -radius:]
    # send my right strip to my right neighbour (it becomes their left halo)
    from_left = lax.ppermute(
        right_strip, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my left strip to my left neighbour (their right halo)
    from_right = lax.ppermute(
        left_strip, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    zeros = jnp.zeros_like(left_strip)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)
