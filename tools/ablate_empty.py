"""The last ablation step: how much does an (almost) EMPTY GOP scan cost?

ablate_dce.py showed every codec stage's full producer chain is worth
<0.2 ms/frame of the 10.5 ms floor — so the floor must live in what no
stage ablation touches: the scan itself (xs slicing, uint8->int32 casts,
carry round-trips, stacked outputs) or per-iteration runtime overhead.
Variants patch gop_engine.encode_frame_traced wholesale:

- empty-frame:   body returns constants + passthrough recon (carry chain
                 kept, words output kept at full cap) — measures scan
                 plumbing with real input/output traffic.
- empty-smallout: same but cap_words=1024 — subtracts the words-output
                 stacking cost.
- t-sweep:       full REAL program at T=4/8/16 — separates per-program
                 from per-iteration cost.

Writes tools/ablate_empty_results.json (platform-tagged).
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
from video_encoder_tpu.codec import entropy, spec
from video_encoder_tpu.pipeline import gop_engine

H, W, REPS = 1080, 1920, 5


def timed(jitted, yd, cbd, crd, kw, t):
    outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    return (time.perf_counter() - t0) / (REPS * t) * 1e3



def _fresh_fn(fn):
    """A NEW function object wrapping fn: jax's jit executable cache keys
    on the underlying callable, so re-jitting the SAME fn after patching
    its module globals silently reuses the previous variant's traced
    program (measured: an 'empty' and a 'real' variant with identical
    shapes returned the same timing). A fresh wrapper forces a retrace."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        return fn(*a, **k)
    wrapper.__wrapped__ = None  # break functools.wraps's identity hint
    return wrapper

def main():
    hp = spec.ceil_to(H, 16)
    n_mbs = (hp // 16) * (W // 16)
    cap_full = entropy.capacity_words(n_mbs, 1024)
    fn = gop_engine.encode_gop_jit.__wrapped__
    static = ("search", "rc", "block_words", "cap_words", "target_bits",
              "fmt", "cqpo", "qbias", "vbv_bits", "qmat", "unroll", "islice")
    real_encode = gop_engine.encode_frame_traced

    def empty_frame(cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr, base_qp,
                    *, is_p, search, rc, block_words, cap_words, fmt=1,
                    cqpo=0, qbias=8, qmat=False, islice=0):
        nby, nbx = cur_y.shape[0] // 16, cur_y.shape[1] // 16
        return dict(
            words=jnp.zeros((cap_words,), jnp.uint32),
            bits=jnp.int32(1024),
            ovf=jnp.asarray(False),
            n_inter=jnp.int32(0),
            rec_y=cur_y, rec_cb=cur_cb, rec_cr=cur_cr,
            sse=jnp.zeros((3,), jnp.float32),
        )

    results = {"_meta": dict(platform=jax.default_backend(), h=H, w=W,
                             reps=REPS)}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ablate_empty_results.json")

    def flush():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def run(name, t, cap, empty):
        y, cb, cr = synth_clip(t, hp, W)
        yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
        kw = dict(search="full", rc="none",
                  block_words=gop_engine._block_words_for_qp(30),
                  cap_words=cap, target_bits=0)
        gop_engine.encode_frame_traced = empty_frame if empty else real_encode
        try:
            jitted = jax.jit(_fresh_fn(fn), static_argnames=static)
            ms = timed(jitted, yd, cbd, crd, kw, t)
        finally:
            gop_engine.encode_frame_traced = real_encode
        results[name] = dict(ms_per_frame=round(ms, 3), t=t, cap_words=cap,
                             empty=empty)
        print(json.dumps({"variant": name, **results[name]}), flush=True)
        flush()

    run("empty-frame", 8, cap_full, True)
    run("empty-smallout", 8, 1024, True)
    run("real-t4", 4, cap_full, False)
    run("real-t8", 8, cap_full, False)
    run("real-t16", 16, cap_full, False)


if __name__ == "__main__":
    main()
