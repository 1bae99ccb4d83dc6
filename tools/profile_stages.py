"""Per-stage timing of the 1080p encode path on the real chip.

Methodology (v2 — the r1 standalone-jit numbers were wrong): each stage is
wrapped in a lax.scan of K iterations inside ONE jitted program whose output
is a single scalar, because on this container's axon backend (a) a host
fetch costs a ~27 ms tunnel round-trip and (b) block_until_ready returns
before execution finishes. Standalone per-stage jits therefore measure the
tunnel, not the chip. In-scan, the one round-trip amortizes over K and the
scalar output keeps fetch bytes negligible. The input is perturbed by the
iteration index (one cheap VPU add) so XLA cannot hoist the stage out of
the loop as loop-invariant.

Stage numbers attribute cost; `frame (full/diamond/hier)` rows are the
in-scan truth for a whole frame.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_encoder_tpu.codec import entropy
from video_encoder_tpu.ops import dispatch, motion
from video_encoder_tpu.pipeline import gop_engine

K = 16  # scan iterations per measured program


def scan_time(stage, n_outer=3):
    """stage: k:int32 -> scalar-reducible pytree. Returns ms per iteration."""

    @jax.jit
    def prog():
        def body(acc, k):
            out = stage(k)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.int32), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(K, dtype=jnp.int32))
        return acc

    np.asarray(prog())  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = prog()
    np.asarray(out)
    dt = time.perf_counter() - t0
    # one ~27ms tunnel round-trip per batch of n_outer programs
    return dt / (n_outer * K) * 1e3


def main():
    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.integers(0, 256, (h, w), np.int32))
    ref = jnp.asarray(rng.integers(0, 256, (h, w), np.int32))
    cur_c = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32))
    ref_c = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32))
    nby, nbx = h // 16, w // 16
    n_mbs = nby * nbx
    cap = entropy.capacity_words(n_mbs, 1024)
    qp_mb = jnp.full((nby, nbx), 30, jnp.int32)

    def rows():
        yield "full_search", lambda k: dispatch.full_search(cur + (k & 1), ref)
        yield "diamond_search", lambda k: dispatch.diamond_search(cur + (k & 1), ref)
        yield "intra_cost", lambda k: motion.intra_cost_and_dc(cur + (k & 1))

        dy, dx, _ = jax.jit(dispatch.full_search)(cur, ref)
        yield "mc_luma", lambda k: dispatch.mc_fetch_luma_plane(ref + (k & 1), dy, dx)
        yield "mc_chroma_x2", lambda k: (
            dispatch.mc_fetch_chroma_plane(ref_c + (k & 1), dy >> 1, dx >> 1),
            dispatch.mc_fetch_chroma_plane(ref_c + (k & 1), dy >> 1, dx >> 1),
        )

        pred_y = jax.jit(dispatch.mc_fetch_luma_plane)(ref, dy, dx)
        pred_c = jax.jit(dispatch.mc_fetch_chroma_plane)(ref_c, dy >> 1, dx >> 1)
        yield "code_frame(3pl)", lambda k: gop_engine._code_frame(
            cur + (k & 1), cur_c, cur_c, pred_y, pred_c, pred_c, qp_mb
        )

        (lz_y, lz_cb, lz_cr), *_ = jax.jit(gop_engine._code_frame)(
            cur, cur_c, cur_c, pred_y, pred_c, pred_c, qp_mb
        )
        is_inter = jnp.ones((nby, nbx), jnp.bool_)
        yield "pack_frame", lambda k: entropy.pack_frame_planes(
            lz_y + 0 * (lz_y[0, 0, 0] ^ k), lz_cb, lz_cr, qp_mb - 30,
            jnp.asarray(True), is_inter, dy, dx, 24, cap,
        )

        for search in ("full", "diamond", "hier"):
            yield f"frame ({search})", (
                lambda k, s=search: gop_engine.encode_frame_traced(
                    cur + (k & 1), cur_c, cur_c, ref, ref_c, ref_c,
                    jnp.asarray(30), is_p=True, search=s, rc="none",
                    block_words=24, cap_words=cap,
                )
            )

    for name, stage in rows():
        print("%-17s %6.2f ms" % (name, scan_time(stage)), flush=True)


if __name__ == "__main__":
    main()
