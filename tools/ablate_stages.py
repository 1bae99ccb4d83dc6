"""True stage attribution of the 1080p full-search GOP encode by ablation.

profile_stages.py times stages as standalone scanned programs; that misses
what XLA fusion does to them inside the real GOP program (and its first
compile wedged the axon remote once — see repo memory). This tool instead
re-times the REAL encode_gop_jit program with one stage stubbed out per
variant (stage cost = full_ms - ablated_ms). Each variant is traced under
its own jax.jit object so the stubbed closure cannot collide with the
production jit cache.

Stubs keep shapes/dtypes identical and depend on the real inputs (via a
cheap slice) so XLA cannot dead-code the upstream producers they sample.
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
from video_encoder_tpu.ops import dispatch, motion
from video_encoder_tpu.pipeline import gop_engine

H = int(os.environ.get("ABLATE_H", 1080))
W = int(os.environ.get("ABLATE_W", 1920))
T = int(os.environ.get("ABLATE_T", 8))
REPS = int(os.environ.get("ABLATE_REPS", 5))


def timed(jitted, yd, cbd, crd, kw):
    outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    return (time.perf_counter() - t0) / (REPS * T) * 1e3  # ms/frame



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
    kw = dict(
        search="full", rc="none",
        block_words=gop_engine._block_words_for_qp(30),
        cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
    )
    y, cb, cr = synth_clip(T, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    fn = gop_engine.encode_gop_jit.__wrapped__
    static = ("search", "rc", "block_words", "cap_words", "target_bits",
              "fmt", "cqpo", "qbias", "vbv_bits", "qmat")

    real = dict(
        pack=entropy.pack_frame_planes,
        pack2=entropy.pack_frame_planes_v2,
        full=dispatch.full_search,
        mc_l=dispatch.mc_fetch_luma_plane,
        mc_c=dispatch.mc_fetch_chroma_plane,
        code=dispatch.code_plane,
        intra=motion.intra_cost_and_dc,
        sse=gop_engine._sse,
    )

    def stub_pack(lz_y, lz_cb, lz_cr, qpd, is_p, is_inter, dy, dx, bw, cap):
        # Signature-compatible with BOTH pack_frame_planes and
        # pack_frame_planes_v2 (same positional arglist); the tool patches
        # both so the ablation stays honest if fmt is ever changed from its
        # default of 1 (ADVICE r2: v2/v3 formats select the v2 packer).
        seed = (lz_y[0, 0, 0] ^ lz_cb[0, 0, 0] ^ lz_cr[0, 0, 0]
                ^ dy[0, 0] ^ dx[0, 0] ^ qpd[0, 0]).astype(jnp.uint32)
        words = jnp.zeros((cap,), jnp.uint32).at[0].set(seed)
        nby, nbx = qpd.shape
        return (words, (seed & 1023).astype(jnp.int32) + 1,
                jnp.zeros((nby, nbx), jnp.int32), jnp.asarray(False))

    def stub_full(cur, ref):
        nby, nbx = cur.shape[0] // 16, cur.shape[1] // 16
        s = (cur[0, 0] ^ ref[0, 0])
        z = jnp.zeros((nby, nbx), jnp.int32)
        return z + (s & 1), z, z + (s & 255)

    def stub_mc(ref, dy, dx):
        # samples dy/dx so ME isn't dead-coded when only MC is ablated
        return ref + (dy[0, 0] + dx[0, 0] & 1)

    def stub_mc_c(ref, dy, dx):
        return ref + (dy[0, 0] + dx[0, 0] & 1)

    def stub_code(cur, pred, q_blk, qbias=8, qmat=False):
        s = (cur[0, 0] ^ pred[0, 0] ^ q_blk[0, 0]) & 1
        return cur + s, jnp.clip(pred + s, 0, 255)

    def stub_intra(cur):
        nby, nbx = cur.shape[0] // 16, cur.shape[1] // 16
        z = jnp.zeros((nby, nbx), jnp.int32)
        return z + (cur[0, 0] & 255), z + 10**6  # huge cost -> all inter

    def stub_sse(a, b):
        return (a[0, 0] - b[0, 0]).astype(jnp.float32) ** 2

    variants = [
        ("full-program", {}),
        ("no-entropy-pack", dict(pack=stub_pack, pack2=stub_pack)),
        ("no-me", dict(full=stub_full)),
        ("no-mc", dict(mc_l=stub_mc, mc_c=stub_mc_c)),
        ("no-transform", dict(code=stub_code)),
        ("no-intra-cost", dict(intra=stub_intra)),
        ("no-sse", dict(sse=stub_sse)),
    ]

    # Tag the run so a committed artifact can never again be mistaken for a
    # different platform's numbers (ADVICE r2 medium finding).
    results = {"_meta": dict(
        platform=jax.default_backend(),
        devices=[str(d) for d in jax.devices()],
        h=H, w=W, t=T, reps=REPS,
    )}
    base_ms = None
    for name, patches in variants:
        entropy.pack_frame_planes = patches.get("pack", real["pack"])
        entropy.pack_frame_planes_v2 = patches.get("pack2", real["pack2"])
        dispatch.full_search = patches.get("full", real["full"])
        dispatch.mc_fetch_luma_plane = patches.get("mc_l", real["mc_l"])
        dispatch.mc_fetch_chroma_plane = patches.get("mc_c", real["mc_c"])
        dispatch.code_plane = patches.get("code", real["code"])
        motion.intra_cost_and_dc = patches.get("intra", real["intra"])
        gop_engine._sse = patches.get("sse", real["sse"])
        try:
            jitted = jax.jit(_fresh_fn(fn), static_argnames=static)
            ms = timed(jitted, yd, cbd, crd, kw)
        finally:
            entropy.pack_frame_planes = real["pack"]
            entropy.pack_frame_planes_v2 = real["pack2"]
            dispatch.full_search = real["full"]
            dispatch.mc_fetch_luma_plane = real["mc_l"]
            dispatch.mc_fetch_chroma_plane = real["mc_c"]
            dispatch.code_plane = real["code"]
            motion.intra_cost_and_dc = real["intra"]
            gop_engine._sse = real["sse"]
        if base_ms is None:
            base_ms = ms
        stage = round(base_ms - ms, 2) if name != "full-program" else None
        results[name] = dict(ms_per_frame=round(ms, 2), stage_ms=stage)
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ablation_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
