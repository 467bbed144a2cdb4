"""Superpixel merging via connected components over the cluster graph.

TPU-native re-design of LabelEquivalenceSeg(+PCA) (reference
LabelEquivalenceSeg/*.cu).  The reference runs a Hawick/Kalentev-style
label-equivalence loop over the full PIXEL grid: 10 rounds of per-pixel
neighbour scans with atomicMin into a union-find table + pointer jumping,
then atomicAdd accumulation of merged-cluster stats.

Observation: the merge predicate (compNormal) depends only on the two
pixels' ORIGINAL cluster ids — so the pixel-level fixpoint equals connected
components over the ~300-node cluster adjacency graph.  We therefore
  1. build the cluster adjacency matrix from 4-neighbour pixel pairs
     (one scatter-max over cluster-id pairs),
  2. apply the predicate on the [K, K] matrix,
  3. run min-label propagation + path compression on a length-K vector to
     convergence (lax.while_loop),
  4. compute merged stats with segment-sums.

Fidelity notes:
  * the reference runs a FIXED 10 scan/analysis rounds, which under-merges
    components whose cluster-graph eccentricity exceeds ~10 hops; we run to
    convergence (documented deviation — strictly more merged, normally equal).
  * compNormal requires acos(n1.n2) > 0, so two clusters with exactly equal
    normals do NOT merge (dot == 1 fails); the PCA variant has no such term
    and does merge them.  Both replicated.
  * the scan kernel's edge clamp uses `width`/`height` instead of w-1/h-1
    (reads one past the row/buffer); FIXED to a proper clamp, which makes the
    border neighbour self-comparisons no-ops as intended.
  * pixels whose cluster label is -1 index cluster_normals[-1] in the
    reference (out-of-bounds read); their merged label is forced to -1 on
    every path regardless, which is what we produce directly.
"""

from __future__ import annotations

from typing import NamedTuple

import math

import jax
import jax.numpy as jnp
from jax import lax

from kinectdepthmapenhancement_tpu.core.config import CCLParams, CCLPCAParams
from kinectdepthmapenhancement_tpu.ops import tables

INVALID_ND = 5.0


class MergeResult(NamedTuple):
    labels: jnp.ndarray       # [H, W] i32: merged cluster id (component min) or -1
    nd_map: jnp.ndarray       # [H, W, 4] f32: per-pixel merged plane (n, d)
    variance: jnp.ndarray     # [K] f32: per merged-cluster normal coherence
    sizes: jnp.ndarray        # [K] i32: per merged-cluster pixel count
    cluster_nd: jnp.ndarray   # [K, 4] f32: per merged-cluster plane
    eigenvalues: jnp.ndarray  # [K] f32 (PCA variant; zeros otherwise)
    eigen_map: jnp.ndarray    # [H, W] f32 (PCA variant; zeros otherwise)


def _adjacency(labels: jnp.ndarray, k: int) -> jnp.ndarray:
    """[K, K] bool: cluster pairs adjacent via a 4-neighbour pixel pair."""
    pairs_a = jnp.concatenate([labels[:, :-1].reshape(-1), labels[:-1, :].reshape(-1)])
    pairs_b = jnp.concatenate([labels[:, 1:].reshape(-1), labels[1:, :].reshape(-1)])
    if tables.use_mxu():
        # scatter serializes on TPU; count pair occurrences on the MXU
        pa = tables.one_hot(pairs_a, k)
        pb = tables.one_hot(pairs_b, k)
        counts = jax.lax.dot_general(
            pa, pb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (counts + counts.T) > 0.0
    la = jnp.where(pairs_a >= 0, pairs_a, k)
    lb = jnp.where(pairs_b >= 0, pairs_b, k)
    adj = jnp.zeros((k + 1, k + 1), jnp.bool_)
    adj = adj.at[la, lb].set(True)
    adj = adj.at[lb, la].set(True)
    return adj[:k, :k]


def _components(mergeable: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Min-label connected components over [K, K] bool adjacency.
    Returns rep [K] i32 (component minimum id); invalid nodes keep own id."""
    k = mergeable.shape[0]
    ids = jnp.arange(k, dtype=jnp.int32)

    def body(state):
        rep, _ = state
        neigh = jnp.where(mergeable, rep[None, :], k)
        nmin = jnp.min(neigh, axis=1).astype(jnp.int32)
        new = jnp.minimum(rep, jnp.where(valid, nmin, k).astype(jnp.int32))
        new = jnp.minimum(new, rep)
        # path compression (pointer jumping)
        new = new[new]
        new = new[new]
        return new, jnp.any(new != rep)

    def cond(state):
        return state[1]

    rep, _ = lax.while_loop(cond, body, (ids, jnp.bool_(True)))
    return rep


def _merge(
    labels: jnp.ndarray,
    cluster_nd: jnp.ndarray,      # [K, 4]
    cluster_valid: jnp.ndarray,   # [K] bool
    cluster_centers: jnp.ndarray, # [K, 3]
    predicate,
    eigenvalues: jnp.ndarray | None,
) -> MergeResult:
    h, w = labels.shape
    k = cluster_nd.shape[0]

    adj = _adjacency(labels, k)
    na = cluster_nd[:, None, :3]
    nb = cluster_nd[None, :, :3]
    dot = jnp.sum(na * nb, axis=-1)
    dd = jnp.abs(cluster_nd[:, None, 3] - cluster_nd[None, :, 3])
    pred = predicate(dot, dd)
    mergeable = adj & pred & cluster_valid[:, None] & cluster_valid[None, :]

    rep = _components(mergeable, cluster_valid)

    # per-pixel merged label: rep and validity gathered through the original
    # cluster table (K-entry lookups composed on the table side, then ONE
    # per-pixel gather via tables.gather)
    table_side = jnp.concatenate(
        [
            rep.astype(jnp.float32)[:, None],
            cluster_valid.astype(jnp.float32)[:, None],
            cluster_nd[:, :3],
            cluster_centers,
        ],
        axis=-1,
    )
    if eigenvalues is not None:
        table_side = jnp.concatenate([table_side, eigenvalues[:, None]], axis=-1)
    g = tables.gather(table_side, labels)
    pix_valid = (labels >= 0) & (g[..., 1] > 0.0)
    merged = jnp.where(pix_valid, g[..., 0].astype(jnp.int32), -1)
    pix_nd3 = g[..., 2:5]
    pix_ct = g[..., 5:8]

    # ---- stats (countKernel / calculate_nd)
    mlab = jnp.where(pix_valid, merged, -1)
    onehot_m = tables.one_hot(mlab, k) if tables.use_mxu() else None
    feats = jnp.concatenate(
        [
            pix_nd3.reshape(-1, 3),
            pix_ct.reshape(-1, 3),
            jnp.ones((h * w, 1), jnp.float32),
        ]
        + ([g[..., 8].reshape(-1, 1)] if eigenvalues is not None else []),
        axis=-1,
    )
    sums = tables.segment_sum(feats, mlab, k, onehot=onehot_m)
    sizes = sums[:, 6]
    safe = jnp.maximum(sizes, 1.0)
    mean_n = sums[:, 0:3] / safe[:, None]
    mean_c = sums[:, 3:6] / safe[:, None]
    mdist = jnp.abs(jnp.sum(mean_n * mean_c, axis=-1))
    merged_nd_k = jnp.concatenate([mean_n, mdist[:, None]], axis=-1)

    # variance: mean over pixels of dot(original nd, merged mean normal)
    merged_side = jnp.concatenate(
        [merged_nd_k, safe[:, None]]
        + ([(sums[:, 7] / safe)[:, None]] if eigenvalues is not None else []),
        axis=-1,
    )
    gm = tables.gather(merged_side, mlab, onehot=onehot_m)
    mean_n_pix = gm[..., 0:3]
    size_pix = jnp.maximum(gm[..., 4], 1.0)
    pix_dot = jnp.sum(pix_nd3 * mean_n_pix, axis=-1)
    var_sum = tables.segment_sum(
        jnp.where(pix_valid, pix_dot / size_pix, 0.0)[..., None],
        mlab, k, onehot=onehot_m,
    )[:, 0]

    nd_map = jnp.where((merged >= 0)[..., None], gm[..., 0:4], 0.0)

    if eigenvalues is not None:
        eig_k = sums[:, 7] / safe
        eig_map = jnp.where(merged >= 0, gm[..., 5], 0.0)
    else:
        eig_k = jnp.zeros((k,), jnp.float32)
        eig_map = jnp.zeros((h, w), jnp.float32)

    return MergeResult(
        labels=merged,
        nd_map=nd_map,
        variance=var_sum,
        sizes=sizes.astype(jnp.int32),
        cluster_nd=merged_nd_k,
        eigenvalues=eig_k,
        eigen_map=eig_map,
    )


def merge_normals(
    labels: jnp.ndarray,
    cluster_normals: jnp.ndarray,  # [K, 3], -1 sentinel
    cluster_centers: jnp.ndarray,  # [K, 3]
    p: CCLParams = CCLParams(),
) -> MergeResult:
    """LabelEquivalenceSeg::labelImage (LabelEquivalenceSeg.cu:228-282).

    Per-cluster plane: n = cluster normal, d = |n . center| (initLabel,
    cu:8-35); merge when 0 < acos(n1.n2) < pi/8 and |d1-d2| < offset max.
    """
    valid = jnp.any(cluster_normals != -1.0, axis=-1)
    d = jnp.abs(jnp.sum(cluster_normals * cluster_centers, axis=-1))
    nd = jnp.concatenate([cluster_normals, d[:, None]], axis=-1)
    nd = jnp.where(valid[:, None], nd, INVALID_ND)
    cos_max = math.cos(p.normal_angle_max)

    def predicate(dot, dd):
        # acos(dot) > 0  <=>  dot < 1;  acos(dot) < max  <=>  dot > cos(max);
        # dot > 1 -> acos is NaN -> both comparisons false in the reference.
        return (dot < 1.0) & (dot > cos_max) & (dd < p.plane_offset_max)

    return _merge(labels, nd, valid, cluster_centers, predicate, None)


def merge_pca(
    labels: jnp.ndarray,
    cluster_nd: jnp.ndarray,       # [K, 4] host-PCA planes; invalid = 5.0s
    cluster_centers: jnp.ndarray,  # [K, 3]
    eigenvalues: jnp.ndarray,      # [K]
    p: CCLPCAParams = CCLPCAParams(),
) -> MergeResult:
    """LabelEquivalenceSegPCA::labelImage (LabelEquivalenceSegPCA.cu:219-299).

    Validity test |nd.x| < 1.1 (invalid sentinel 5.0); predicate
    |acos(n1.n2)| < pi/8 (equal normals DO merge) and |d1-d2| < 700.
    """
    valid = jnp.abs(cluster_nd[:, 0]) < 1.1
    cos_max = math.cos(p.normal_angle_max)

    def predicate(dot, dd):
        return (dot <= 1.0) & (dot > cos_max) & (dd < p.plane_offset_max)

    return _merge(labels, cluster_nd, valid, cluster_centers, predicate, eigenvalues)
