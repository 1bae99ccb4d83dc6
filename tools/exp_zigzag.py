"""Isolate the cost of the levels relayout (blockify transpose + zigzag
gather) feeding the entropy pack (r4: the fused symbols+pack kernel was
measured perf-neutral, so the 5.2 ms 'pack' DCE attribution must live in
the only remaining producer the DCE stub deleted — the relayout chain
`tx.zigzag(tx.blockify(lv, 8))` in dispatch.code_plane).

Variants (each through a fresh function object — jit keys executables on
callable identity, tools/ablate_dce.py note):
  full        the real program
  zz-id       zigzag patched to identity (removes ONLY the 64-gather;
              blockify transpose stays) — garbage streams, valid timing
  flat        blockify+zigzag patched to a contiguity-preserving reshape
              (removes the transpose AND the gather)

Writes tools/exp_zigzag_results.json.
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
from video_encoder_tpu.ops import dispatch, transform as tx
from video_encoder_tpu.pipeline import gop_engine

H = int(os.environ.get("ABLATE_H", 1080))
W = int(os.environ.get("ABLATE_W", 1920))
T = int(os.environ.get("ABLATE_T", 8))
REPS = int(os.environ.get("ABLATE_REPS", 5))


def _fresh_fn(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        return fn(*a, **k)
    wrapper.__wrapped__ = None
    return wrapper


def timed(jitted, yd, cbd, crd, kw):
    outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    return (time.perf_counter() - t0) / (REPS * T) * 1e3


def main():
    hp = spec.ceil_to(H, 16)
    n_mbs = (hp // 16) * (W // 16)
    kw = dict(
        search="full", rc="none",
        block_words=gop_engine._block_words_for_qp(30),
        cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
    )
    y, cb, cr = synth_clip(T, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    fn = gop_engine.encode_gop_jit.__wrapped__
    static = ("search", "rc", "block_words", "cap_words", "target_bits",
              "fmt", "cqpo", "qbias", "vbv_bits", "qmat", "unroll", "islice")
    real_code = dispatch.code_plane

    from video_encoder_tpu.ops.pallas import codec as pcodec

    def code_zz_id(cur, pred, q_blk, qbias=8, qmat=False):
        lv, rec = pcodec.code_plane(cur, pred, q_blk, qbias, qmat)
        return tx.blockify(lv, 8).reshape(
            cur.shape[0] // 8, cur.shape[1] // 8, 64), rec

    def code_flat(cur, pred, q_blk, qbias=8, qmat=False):
        lv, rec = pcodec.code_plane(cur, pred, q_blk, qbias, qmat)
        return lv.reshape(cur.shape[0] // 8, cur.shape[1] // 8, 64), rec

    variants = [
        ("full", real_code),
        ("zz-id", code_zz_id),
        ("flat", code_flat),
    ]
    results = {"_meta": dict(platform=jax.default_backend(), h=H, w=W, t=T,
                             reps=REPS)}
    base = None
    for name, code in variants:
        dispatch.code_plane = code
        try:
            jitted = jax.jit(_fresh_fn(fn), static_argnames=static)
            ms = timed(jitted, yd, cbd, crd, kw)
        finally:
            dispatch.code_plane = real_code
        base = ms if base is None else base
        results[name] = dict(ms_per_frame=round(ms, 3),
                             delta_vs_full=round(base - ms, 3))
        print(json.dumps({name: results[name]}), flush=True)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "exp_zigzag_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
