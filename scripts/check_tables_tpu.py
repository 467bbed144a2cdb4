"""TPU-chip exactness check for the one-hot MXU table algebra (round 5).

Guards against the XLA miscompile found in round 5: the former route —
three dot_generals of exact bf16 split parts, summed in f32 — is
mathematically exact, but current XLA lowers the narrow-output dots through
a fused convolution path that re-merges the parts at bf16, silently
rounding every gathered table value to 8 mantissa bits (~0.3% of mm-scale
depths) and costing segment sums ~2^-8-relative error.  tables._dot now
uses one f32 x f32 dot at Precision.HIGHEST, which this script verifies is
EXACT on the real chip.  (The bug does not reproduce on the CPU backend, so
the pytest suite cannot guard it; run this on hardware after any XLA or
tables.py change.)

Usage: python scripts/check_tables_tpu.py
Exit code 0 = exact; prints per-case max errors.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from kinectdepthmapenhancement_tpu.ops import tables


def main() -> int:
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    failures = 0
    for n, k, f in ((307200, 300, 4), (307200, 300, 14), (19200, 300, 4)):
        lab = rng.integers(-9, k, n).astype(np.int32)
        feats = (rng.random((n, f)) * 5e6).astype(np.float32)
        truth = np.zeros((k, f))
        np.add.at(truth, lab[lab >= 0], feats[lab >= 0].astype(np.float64))
        out = np.asarray(
            jax.jit(lambda x, l: tables.segment_sum(x, l, k))(
                jnp.asarray(feats), jnp.asarray(lab)
            )
        )
        seg_rel = (np.abs(out - truth) / np.maximum(np.abs(truth), 1.0)).max()

        tbl = (rng.random((k, f)) * 5e6).astype(np.float32)
        g = np.asarray(
            jax.jit(lambda t, l: tables.gather(t, l))(
                jnp.asarray(tbl), jnp.asarray(lab)
            )
        )
        g_truth = np.where((lab >= 0)[:, None], tbl[np.maximum(lab, 0)], 0.0)
        gather_abs = np.abs(g - g_truth).max()

        ok = seg_rel < 1e-5 and gather_abs == 0.0
        failures += 0 if ok else 1
        print(
            f"N={n} F={f}: segment_sum rel {seg_rel:.2e} "
            f"gather abs {gather_abs} -> {'OK' if ok else 'FAIL'}"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
