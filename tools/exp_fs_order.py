"""A/B the full-search kernel loop order (r4 verdict weak #5/#7: ME is
the biggest measured stage and the r4 A/Bs killed the layout levers).

dy_outer (r4): per dy, 33 lane-UNALIGNED slices build the diff block —
1089 unaligned lane shuffles per tile, the measured cost centre.
dx_outer (r5): per dx, ONE dynamic lane-roll of the whole window + 8
sublane rotations; every dy slice is sublane-aligned. Same matmuls, same
packed-key argmin (order-independent -> bit-identical mvs).

Each variant clears the kernel caches and routes through a fresh function
object (jit keys executables on callable identity — MEMORY.md). Timing:
full-search kernel standalone, host-fetch sync. Writes
tools/exp_fs_order_results.json.
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
                       "exp_fs_order_results.json")
    for label, h, w in (("1080p", 1088, 1920), ("4K", 2176, 3840)):
        y, _, _ = synth_clip(2, h, w)
        cur = jnp.asarray(y[1].astype(np.int32))
        ref = jnp.asarray(y[0].astype(np.int32))
        row = {}
        base_mv = None
        for order in ("dy_outer", "dx_outer"):
            psad._FS_ORDER = order
            psad._full_search_call.cache_clear()
            try:
                ms, dy, dx = timed_full_search(cur, ref)
                row[f"{order}_ms"] = round(ms, 3)
                if base_mv is None:
                    base_mv = (dy, dx)
                else:
                    row["mv_equal"] = bool(
                        np.array_equal(base_mv[0], dy)
                        and np.array_equal(base_mv[1], dx))
            except Exception as e:
                row[f"{order}_error"] = str(e)[:300]
            finally:
                psad._FS_ORDER = "dx_outer"
                psad._full_search_call.cache_clear()
        results[label] = row
        print(label, row, flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
