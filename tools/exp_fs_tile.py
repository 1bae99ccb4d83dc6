"""A/B the full-search ME tile shape per resolution (r3 VERDICT item 3:
're-derive ME tile shape for the 4K grid'). TN=64 is VMEM-infeasible
(compile-proof, tools/exp_perf_results.json); this probes TM (8 vs 16)
at 1080p and 4K — taller tiles amortize the per-tile rots build and DMA
over twice the MBs at ~2x the VMEM scratch.

Each variant clears the kernel caches and routes through a fresh function
object (jit keys executables on callable identity). Timing: full-search
kernel standalone, host-fetch sync, dispatch overhead (~0.9 ms) common to
both arms. Writes tools/exp_fs_tile_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_clip
from video_encoder_tpu.codec import spec
from video_encoder_tpu.ops.pallas import sad as psad

REPS = int(os.environ.get("REPS", 10))


def timed_full_search(cur, ref):
    def fresh(fn):
        import functools

        @functools.wraps(fn)
        def w2(*a, **k):
            return fn(*a, **k)
        w2.__wrapped__ = None
        return w2

    f = jax.jit(fresh(lambda c, r: psad.full_search(c, r)))
    dy, dx, sad = f(cur, ref)
    np.asarray(sad[:1, :1])
    t0 = time.perf_counter()
    for _ in range(REPS):
        dy, dx, sad = f(cur, ref)
    np.asarray(sad[:1, :1])
    return (time.perf_counter() - t0) / REPS * 1e3, np.asarray(dy), np.asarray(dx)


def main():
    results = {"_meta": {"platform": jax.default_backend(), "reps": REPS}}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_fs_tile_results.json")
    orig = psad._fs_tile_shape
    for label, h, w in (("1080p", 1088, 1920), ("4K", 2176, 3840)):
        y, _, _ = synth_clip(2, h, w)
        cur = jnp.asarray(y[1].astype(np.int32))
        ref = jnp.asarray(y[0].astype(np.int32))
        row = {}
        base_mv = None
        for tm in (8, 16):
            psad._fs_tile_shape = lambda nby, nbx, _tm=tm: (
                _tm, 32 if nbx >= 48 else (16 if nbx >= 16 else 8))
            psad._full_search_call.cache_clear()
            try:
                ms, dy, dx = timed_full_search(cur, ref)
                if base_mv is None:
                    base_mv = (dy, dx)
                    row[f"tm{tm}_ms"] = round(ms, 3)
                else:
                    row[f"tm{tm}_ms"] = round(ms, 3)
                    row[f"tm{tm}_mv_equal"] = bool(
                        np.array_equal(base_mv[0], dy)
                        and np.array_equal(base_mv[1], dx))
            except Exception as e:  # compile infeasibility is a result too
                row[f"tm{tm}_error"] = str(e)[:300]
            finally:
                psad._fs_tile_shape = orig
                psad._full_search_call.cache_clear()
        results[label] = row
        print(json.dumps({label: row}), flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
