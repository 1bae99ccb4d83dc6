"""Decompose the CHUNKS-emit pack cost (the production path) at any
resolution — r5 follow-up to exp_pack_parts.py after the 4K DCE ablation
re-attributed 14.6 ms/frame to the pack (tools/ablate_dce_results.json,
4K emit=chunks). Updated for the r5 MB-source merge (super_merge_mb took
over from _frame_pieces + _pieces_to_chunks). Seams, cut one at a time:

  full          the real program (fused block_pack + super_merge_mb)
  no-merge      _mb_pieces_to_chunks -> constants (keeps block_pack,
                header pack, and the y transpose; removes the merge)
  no-blockpack  _pack_blocks -> constants (removes the fused symbols+pack
                kernel; keeps everything around it)
  no-pack       pack_frame_chunks -> constants (everything pack-side gone)

Fresh function objects per variant (jit executable cache keys on callable
identity). Streams are garbage; only timing matters. Writes
tools/exp_pack_parts_chunks_results.json.
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

H = int(os.environ.get("ABLATE_H", 2160))
W = int(os.environ.get("ABLATE_W", 3840))
T = int(os.environ.get("ABLATE_T", 8))
REPS = int(os.environ.get("ABLATE_REPS", 3))


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
        emit="chunks",
    )
    bw_ = kw["block_words"]
    y, cb, cr = synth_clip(T, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    fn = gop_engine.encode_gop_jit.__wrapped__
    static = ("search", "rc", "block_words", "cap_words", "target_bits",
              "fmt", "cqpo", "qbias", "vbv_bits", "qmat", "unroll", "islice",
              "emit")

    real_merge = entropy._mb_pieces_to_chunks
    real_blocks = entropy._pack_blocks
    real_packc = entropy.pack_frame_chunks

    def no_merge(hw, hb, yw, yb, cbw, cbb, crw, crb, block_words):
        n_mbs_ = hb.shape[0]
        ns, h_, cw = entropy.chunk_capacity(n_mbs_ * 8, block_words)
        keep = (hw.astype(jnp.int32).sum() + yw.astype(jnp.int32).sum()
                + cbw.astype(jnp.int32).sum() + crw.astype(jnp.int32).sum()
                + hb.sum() + yb.sum() + cbb.sum() + crb.sum())
        return (jnp.zeros((ns, cw), jnp.uint32) + keep.astype(jnp.uint32),
                jnp.full((ns,), 32, jnp.int32),
                jnp.zeros((n_mbs_,), jnp.int32), jnp.asarray(False))

    def no_blockpack(levels, dc_pred, fmt_, block_words):
        lead = levels.shape[:-1]
        keep = levels.sum() + (0 if dc_pred is None else dc_pred.sum())
        w = jnp.zeros((*lead, block_words), jnp.uint32) + keep.astype(jnp.uint32)
        b = jnp.full(lead, 40, jnp.int32)
        return w, b, jnp.asarray(False)

    def no_pack(lz_y, lz_cb, lz_cr, qpd, is_p, is_inter, dy, dx, bwv):
        nby, nbx = qpd.shape
        nc, h_, cw = entropy.chunk_capacity(nby * nbx * 8, bwv)
        keep = (lz_y.sum() + lz_cb.sum() + lz_cr.sum() + qpd.sum()
                + dy.sum() + dx.sum())
        return (jnp.zeros((nc, cw), jnp.uint32) + keep.astype(jnp.uint32),
                jnp.full((nc,), 32, jnp.int32),
                jnp.zeros((nby, nbx), jnp.int32), jnp.asarray(False))

    variants = [
        ("full", {}),
        ("no-merge", {"merge": no_merge}),
        ("no-blockpack", {"blocks": no_blockpack}),
        ("no-pack", {"packc": no_pack}),
    ]
    results = {"_meta": dict(platform=jax.default_backend(), h=H, w=W, t=T,
                             reps=REPS, emit="chunks")}
    base = None
    for name, patches in variants:
        entropy._mb_pieces_to_chunks = patches.get("merge", real_merge)
        entropy._pack_blocks = patches.get("blocks", real_blocks)
        entropy.pack_frame_chunks = patches.get("packc", real_packc)
        try:
            jitted = jax.jit(_fresh_fn(fn), static_argnames=static)
            ms = timed(jitted, yd, cbd, crd, kw)
        finally:
            entropy._mb_pieces_to_chunks = real_merge
            entropy._pack_blocks = real_blocks
            entropy.pack_frame_chunks = real_packc
        base = ms if base is None else base
        results[name] = dict(ms_per_frame=round(ms, 3),
                             delta_vs_full=round(base - ms, 3))
        print(json.dumps({name: results[name]}), flush=True)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "exp_pack_parts_chunks_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
