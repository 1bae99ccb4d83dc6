"""Quick per-mode 1080p encode rate on the real chip (full/diamond; hier retired r4).

Same steady-state methodology as bench.py device_fps (upload once, loop
the GOP program, sync with one host fetch); fills the BASELINE.md per-mode
rows without re-running the whole measure_matrix sweep.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.pipeline.gop_engine import (
        _block_words_for_qp, encode_gop_jit,
    )

    H, W = 1080, 1920
    hp = spec.ceil_to(H, 16)
    n_mbs = (hp // 16) * (W // 16)
    t, reps = 8, 5
    y, cb, cr = synth_clip(t, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    rows = {}
    for search in sys.argv[1:] or ("full", "diamond"):
        kw = dict(
            search=search, rc="none", block_words=_block_words_for_qp(30),
            cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
        )
        t_c0 = time.perf_counter()
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
        np.asarray(outs["bits"])
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
        np.asarray(outs["bits"])
        fps = t * reps / (time.perf_counter() - t0)
        rows[search] = dict(fps=round(fps, 2), compile_s=round(compile_s, 1))
        print(json.dumps({"search": search, **rows[search]}), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mode_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
