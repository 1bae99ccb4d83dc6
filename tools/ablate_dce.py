"""Traffic attribution of the 1080p GOP program by DEAD-CODE ablation.

ablate_stages.py's stubs keep shapes AND data dependencies alive, so they
remove only compute — and every stage measured ~0, which (with the XLA
cost analysis: 0.002 ms/frame of FLOPs vs ~975 MB/frame of accounted HBM
traffic, tools/gop_batch_results.json) means the program is traffic-bound.
This tool measures the complement: each variant replaces a stage's OUTPUT
with constants that do NOT consume the stage's inputs, letting XLA delete
the stage's entire producer chain — its compute AND its HBM streams. The
delta full_ms - ablated_ms is the stage's traffic cost on the critical
path. Streams are garbage; only timing is meaningful.

Writes tools/ablate_dce_results.json (platform-tagged).
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
EMIT = os.environ.get("ABLATE_EMIT", "chunks")  # r5: production default


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
        emit=EMIT,
    )
    cap = kw["cap_words"]
    y, cb, cr = synth_clip(T, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    fn = gop_engine.encode_gop_jit.__wrapped__
    static = ("search", "rc", "block_words", "cap_words", "target_bits",
              "fmt", "cqpo", "qbias", "vbv_bits", "qmat", "unroll", "islice",
              "emit")

    real = dict(
        packc=entropy.pack_frame_chunks,
        pack=entropy.pack_frame_planes,
        full=dispatch.full_search,
        mc_l=dispatch.mc_fetch_luma_plane,
        mc_c=dispatch.mc_fetch_chroma_plane,
        code=dispatch.code_plane,
        intra=motion.intra_cost_and_dc,
        sse=gop_engine._sse,
    )

    # DCE stubs: constants only — upstream producers become dead code
    def drop_pack(lz_y, lz_cb, lz_cr, qpd, is_p, is_inter, dy, dx, bw, capw):
        nby, nbx = qpd.shape
        return (jnp.zeros((capw,), jnp.uint32), jnp.int32(1024),
                jnp.zeros((nby, nbx), jnp.int32), jnp.asarray(False))

    bw_ = kw["block_words"]

    def drop_pack_chunks(lz_y, lz_cb, lz_cr, qpd, is_p, is_inter, dy, dx, bwv):
        nby, nbx = qpd.shape
        nc, h_, cw_ = entropy.chunk_capacity(nby * nbx * 8, bwv)
        return (jnp.zeros((nc, cw_), jnp.uint32),
                jnp.full((nc,), 32, jnp.int32),
                jnp.zeros((nby, nbx), jnp.int32), jnp.asarray(False))

    def drop_full(cur, ref):
        nby, nbx = cur.shape[0] // 16, cur.shape[1] // 16
        z = jnp.zeros((nby, nbx), jnp.int32)
        return z, z, z + 100

    def drop_mc(ref, dy, dx):
        return jnp.full(ref.shape, 128, jnp.int32)

    def drop_code(cur, pred, q_blk, qbias=8, qmat=False):
        h, w = cur.shape
        return (jnp.zeros((h // 8, w // 8, 64), jnp.int32),
                jnp.full((h, w), 128, jnp.int32))

    def drop_intra(cur):
        nby, nbx = cur.shape[0] // 16, cur.shape[1] // 16
        z = jnp.zeros((nby, nbx), jnp.int32)
        return z, z + 10**6

    def drop_sse(a, b):
        return jnp.float32(0.0)

    variants = [
        ("full-program", {}),
        ("drop-entropy-pack", dict(pack=drop_pack, packc=drop_pack_chunks)),
        ("drop-me", dict(full=drop_full)),
        ("drop-mc", dict(mc_l=drop_mc, mc_c=drop_mc)),
        ("drop-transform", dict(code=drop_code)),
        ("drop-intra-cost", dict(intra=drop_intra)),
        ("drop-sse", dict(sse=drop_sse)),
        # compound: only ME+MC+recon-code survive (the P-chain minimum)
        ("drop-pack+sse+intra", dict(pack=drop_pack, packc=drop_pack_chunks,
                                     sse=drop_sse, intra=drop_intra)),
    ]

    results = {"_meta": dict(
        platform=jax.default_backend(),
        devices=[str(d) for d in jax.devices()],
        h=H, w=W, t=T, reps=REPS,
        note="DCE ablation: stage outputs replaced by constants so XLA "
             "deletes the stage's compute AND HBM streams",
    )}
    base_ms = None
    for name, patches in variants:
        entropy.pack_frame_planes = patches.get("pack", real["pack"])
        entropy.pack_frame_chunks = patches.get("packc", real["packc"])
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
            entropy.pack_frame_chunks = real["packc"]
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
                           "ablate_dce_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
