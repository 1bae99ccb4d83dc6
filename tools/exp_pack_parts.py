"""Decompose the entropy-pack cost AFTER the fused symbols+pack kernel
landed (r4): the kernel made symbols+pack_dense ~free yet the program is
still ~10.5 ms/frame, so the 5.2 ms DCE attribution must sit in the
remaining pack stages. Variants cut, one at a time:

  full       the real program (fused block_pack kernel active)
  no-tree    entropy.tree_concat -> constant words (keeps the kernel,
             header pack, piece glue; removes the log-level merge)
  no-glue    _frame_pieces -> constants (keeps the block_pack kernel
             call alive via a cheap sum so its cost stays; removes the
             piece concat/transpose glue AND the tree)
  no-pack    pack_frame_planes -> constants (the r3 reference cut, 5.21)

Each variant through a fresh function object (jit executable cache keys
on callable identity). Streams are garbage; only timing is meaningful.
Writes tools/exp_pack_parts_results.json.
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

    real_tree = entropy.tree_concat
    real_pieces = entropy._frame_pieces
    real_pack = entropy.pack_frame_planes

    def no_tree(buffers, bits, n_words):
        return jnp.zeros((n_words,), jnp.uint32), bits.sum()

    def no_glue(levels_y8, levels_cb, levels_cr, qp_delta, is_p, is_inter,
                dy, dx, block_words):
        nby, nbx = qp_delta.shape
        n_mbs_ = nby * nbx
        # keep the fused kernel's cost alive, drop the glue after it
        w1, b1, _ = entropy._pack_blocks(levels_y8, None, 1, block_words)
        w2, b2, _ = entropy._pack_blocks(levels_cb, None, 1, block_words)
        w3, b3, _ = entropy._pack_blocks(levels_cr, None, 1, block_words)
        keep = (w1.astype(jnp.int32).sum() + w2.astype(jnp.int32).sum()
                + w3.astype(jnp.int32).sum()
                + b1.sum() + b2.sum() + b3.sum())
        pw = jnp.zeros((n_mbs_, 8, block_words), jnp.uint32) + keep.astype(jnp.uint32)
        pb = jnp.zeros((n_mbs_, 8), jnp.int32)
        mb = jnp.zeros((nby, nbx), jnp.int32)
        return pw, pb, mb, jnp.asarray(False)

    def no_pack(lz_y, lz_cb, lz_cr, qpd, is_p, is_inter, dy, dx, bw, capw):
        nby, nbx = qpd.shape
        return (jnp.zeros((capw,), jnp.uint32), jnp.int32(1024),
                jnp.zeros((nby, nbx), jnp.int32), jnp.asarray(False))

    variants = [
        ("full", {}),
        ("no-tree", {"tree": no_tree}),
        ("no-glue", {"pieces": no_glue}),
        ("no-pack", {"pack": no_pack}),
    ]
    results = {"_meta": dict(platform=jax.default_backend(), h=H, w=W, t=T,
                             reps=REPS)}
    base = None
    for name, patches in variants:
        entropy.tree_concat = patches.get("tree", real_tree)
        entropy._frame_pieces = patches.get("pieces", real_pieces)
        entropy.pack_frame_planes = patches.get("pack", real_pack)
        try:
            jitted = jax.jit(_fresh_fn(fn), static_argnames=static)
            ms = timed(jitted, yd, cbd, crd, kw)
        finally:
            entropy.tree_concat = real_tree
            entropy._frame_pieces = real_pieces
            entropy.pack_frame_planes = real_pack
        base = ms if base is None else base
        results[name] = dict(ms_per_frame=round(ms, 3),
                             delta_vs_full=round(base - ms, 3))
        print(json.dumps({name: results[name]}), flush=True)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "exp_pack_parts_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
