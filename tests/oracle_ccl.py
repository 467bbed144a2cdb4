"""NumPy transliteration of LabelEquivalenceSeg(+PCA) semantics at the
cluster-graph level (converged; see ops/ccl.py fidelity notes)."""

from __future__ import annotations

import numpy as np


def merge(labels, cluster_nd, cluster_valid, cluster_centers, predicate, eigenvalues=None):
    h, w = labels.shape
    k = cluster_nd.shape[0]

    # adjacency from 4-neighbour pixel pairs
    adj = np.zeros((k, k), bool)
    for y in range(h):
        for x in range(w):
            a = labels[y, x]
            if a < 0:
                continue
            for dy, dx in ((0, 1), (1, 0)):
                yy, xx = y + dy, x + dx
                if yy < h and xx < w:
                    b = labels[yy, xx]
                    if b >= 0:
                        adj[a, b] = adj[b, a] = True

    mergeable = np.zeros((k, k), bool)
    for a in range(k):
        for b in range(k):
            if adj[a, b] and cluster_valid[a] and cluster_valid[b]:
                dot = float(np.dot(cluster_nd[a, :3], cluster_nd[b, :3]))
                dd = abs(cluster_nd[a, 3] - cluster_nd[b, 3])
                if predicate(dot, dd):
                    mergeable[a, b] = True

    # converged min-label components
    rep = np.arange(k)
    changed = True
    while changed:
        changed = False
        for a in range(k):
            for b in range(k):
                if mergeable[a, b]:
                    m = min(rep[a], rep[b])
                    if rep[a] != m or rep[b] != m:
                        rep[a] = rep[b] = m
                        changed = True
        for a in range(k):
            while rep[rep[a]] != rep[a]:
                rep[a] = rep[rep[a]]

    merged = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if l >= 0 and cluster_valid[l]:
                merged[y, x] = rep[l]

    sizes = np.zeros(k)
    nsum = np.zeros((k, 3))
    csum = np.zeros((k, 3))
    esum = np.zeros(k)
    for y in range(h):
        for x in range(w):
            m = merged[y, x]
            if m < 0:
                continue
            l = labels[y, x]
            sizes[m] += 1
            nsum[m] += cluster_nd[l, :3]
            csum[m] += cluster_centers[l]
            if eigenvalues is not None:
                esum[m] += eigenvalues[l]
    safe = np.maximum(sizes, 1.0)
    mean_n = nsum / safe[:, None]
    mean_c = csum / safe[:, None]
    mdist = np.abs(np.sum(mean_n * mean_c, axis=-1))

    variance = np.zeros(k)
    for y in range(h):
        for x in range(w):
            m = merged[y, x]
            if m < 0:
                continue
            variance[m] += np.dot(cluster_nd[labels[y, x], :3], mean_n[m]) / sizes[m]

    nd_map = np.zeros((h, w, 4))
    for y in range(h):
        for x in range(w):
            m = merged[y, x]
            if m >= 0:
                nd_map[y, x, :3] = mean_n[m]
                nd_map[y, x, 3] = mdist[m]
    out = {
        "labels": merged,
        "nd_map": nd_map,
        "variance": variance,
        "sizes": sizes,
        "mean_n": mean_n,
    }
    if eigenvalues is not None:
        out["eigenvalues"] = esum / safe
    return out


def merge_normals(labels, cluster_normals, cluster_centers, angle_max=np.pi / 8, dmax=150.0):
    valid = np.any(cluster_normals != -1.0, axis=-1)
    d = np.abs(np.sum(cluster_normals * cluster_centers, axis=-1))
    nd = np.concatenate([cluster_normals, d[:, None]], axis=-1)
    nd = np.where(valid[:, None], nd, 5.0)
    cos_max = np.cos(angle_max)

    def pred(dot, dd):
        return (dot < 1.0) and (dot > cos_max) and (dd < dmax)

    return merge(labels, nd, valid, cluster_centers, pred)


def merge_pca(labels, cluster_nd, cluster_centers, eigenvalues, angle_max=np.pi / 8, dmax=700.0):
    valid = np.abs(cluster_nd[:, 0]) < 1.1
    cos_max = np.cos(angle_max)

    def pred(dot, dd):
        return (dot <= 1.0) and (dot > cos_max) and (dd < dmax)

    return merge(labels, cluster_nd, valid, cluster_centers, pred, eigenvalues)
