"""Per-stage timing of the 1080p full-search encode path on the real chip.

Times each stage as its own jitted program (so numbers include XLA fusion
within the stage but not cross-stage fusion; the full-frame number is the
truth, stages are for attribution).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_encoder_tpu.codec import entropy, spec
from video_encoder_tpu.ops import dispatch, motion, transform as tx
from video_encoder_tpu.pipeline import gop_engine


def _sync(out):
    """Fetch one leaf to the host: on axon, block_until_ready returns before
    execution finishes; a host fetch of the last program's output is the only
    honest sync (programs execute in submission order)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 256, (h, w), np.int32))
    ref = jnp.asarray(rng.integers(0, 256, (h, w), np.int32))
    cur_c = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32))
    ref_c = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32))
    nby, nbx = h // 16, w // 16

    fs = jax.jit(dispatch.full_search)
    print("full_search      %.2f ms" % timeit(fs, cur, ref))

    ds = jax.jit(dispatch.diamond_search)
    print("diamond_search   %.2f ms" % timeit(ds, cur, ref))

    hs = jax.jit(dispatch.hier_search)
    print("hier_search      %.2f ms" % timeit(hs, cur, ref))

    ic = jax.jit(motion.intra_cost_and_dc)
    print("intra_cost       %.2f ms" % timeit(ic, cur))

    dy, dx, _ = fs(cur, ref)
    mcy = jax.jit(dispatch.mc_fetch_luma_plane)
    print("mc_luma          %.2f ms" % timeit(mcy, ref, dy, dx))
    mcc = jax.jit(dispatch.mc_fetch_chroma_plane)
    print("mc_chroma x2     %.2f ms" % (2 * timeit(mcc, ref_c, dy >> 1, dx >> 1)))

    pred_y = mcy(ref, dy, dx)
    pred_c = mcc(ref_c, dy >> 1, dx >> 1)
    qp_mb = jnp.full((nby, nbx), 30, jnp.int32)

    cf = jax.jit(gop_engine._code_frame)
    print("code_frame(3pl)  %.2f ms" % timeit(
        cf, cur, cur_c, cur_c, pred_y, pred_c, pred_c, qp_mb))

    (lz_y, lz_cb, lz_cr), *_ = cf(cur, cur_c, cur_c, pred_y, pred_c, pred_c, qp_mb)
    is_inter = jnp.ones((nby, nbx), jnp.bool_)
    n_mbs = nby * nbx
    cap = entropy.capacity_words(n_mbs, 1024)
    pk = jax.jit(lambda *a: entropy.pack_frame_planes(*a, 24, cap))
    print("pack_frame       %.2f ms" % timeit(
        pk, lz_y, lz_cb, lz_cr, qp_mb - 30, jnp.asarray(True), is_inter, dy, dx))

    # whole frame for truth
    ef = jax.jit(lambda *a: gop_engine.encode_frame_traced(
        *a, is_p=True, search="full", rc="none", block_words=24, cap_words=cap))
    print("frame (full)     %.2f ms" % timeit(
        ef, cur, cur_c, cur_c, ref, ref_c, ref_c, jnp.asarray(30)))
    ef2 = jax.jit(lambda *a: gop_engine.encode_frame_traced(
        *a, is_p=True, search="diamond", rc="none", block_words=24, cap_words=cap))
    print("frame (diamond)  %.2f ms" % timeit(
        ef2, cur, cur_c, cur_c, ref, ref_c, ref_c, jnp.asarray(30)))


if __name__ == "__main__":
    main()
