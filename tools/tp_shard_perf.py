"""On-chip TP/SP shard perf (r4 verdict item 4's open half: compile a
1080p-shard-sized tile program and a ring step ON THE REAL CHIP, and show
the TP shard's rate within ~2x of the DP per-chip rate).

Single-chip method: shard_map over a 1-device mesh runs the REAL shard
programs (halo ppermute/psum become loopbacks; the r5 Pallas tile ME and
the prediction-only cond compile exactly as they would per-device on a
pod) on shard-shaped inputs — a 544x1920 'frame' is one shard of a
2-device 1080p run, 1088x1920 of a 2-device 4K-half etc. What this cannot
measure is the ICI hop itself (~us-scale halo transfers; see
tools/ici_projection.py for the static-bytes analysis).

DP reference: the GOP engine's per-chip ms for the same pixel rows.
Writes tools/tp_shard_perf_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bench import synth_clip
from video_encoder_tpu.codec import entropy, spec
from video_encoder_tpu.parallel import tiles
from video_encoder_tpu.pipeline.gop_engine import (_block_words_for_qp,
                                                   encode_gop_jit)

T, QP = 8, 30


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / (reps * T) * 1e3


def main():
    mesh = Mesh(np.array(jax.devices()[:1]), ("tile",))
    results = {"_meta": {"platform": jax.default_backend(),
                         "devices": [str(d) for d in jax.devices()],
                         "method": "1-device shard_map at shard shapes"}}

    for name, (hs, w, full_h) in {
        "1080p_2shard": (544, 1920, 1088),
        "4K_2shard": (1088, 3840, 2176),
    }.items():
        n_mbs = (hs // 16) * (w // 16)
        bw = _block_words_for_qp(QP)
        cap = entropy.capacity_words(n_mbs, 1024)
        y, cb, cr = synth_clip(T, hs, w)
        yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

        def tp(yy, cc, rr):
            return tiles.encode_gop_tiled(
                yy, cc, rr, QP, mesh=mesh, rc="none", block_words=bw,
                cap_words=cap, target_bits=0)

        def tpc(yy, cc, rr):
            return tiles.encode_gop_tiled(
                yy, cc, rr, QP, mesh=mesh, rc="none", block_words=bw,
                cap_words=cap, target_bits=0, emit="chunks")

        ms_tp = timed(jax.jit(tp), yd, cbd, crd)
        ms_tpc = timed(jax.jit(tpc), yd, cbd, crd)

        # DP reference at the same shard pixel count (the per-chip GOP
        # engine on hs rows)
        kw = dict(search="full", rc="none", block_words=bw, cap_words=cap,
                  target_bits=0, emit="chunks")
        ms_dp = timed(
            lambda a, b, c: encode_gop_jit(a, b, c, QP, **kw), yd, cbd, crd)

        results[name] = {
            "tile_shard_frame_emit_ms": round(ms_tp, 3),
            "tile_shard_chunks_emit_ms": round(ms_tpc, 3),
            "dp_same_rows_ms_per_frame": round(ms_dp, 3),
            "tp_over_dp": round(ms_tpc / ms_dp, 2),
            "note": "chunks = the r5 production emit (budgeted span-string "
                    "pack, the one ShardedGopEncoder uses); frame = the "
                    "old device-assembled tree_concat",
        }
        print(name, results[name], flush=True)

    # ring step: one stream on a 1-device ring compiles + runs the real
    # SP program (budgeted pack, prediction-only cond) on the chip
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.parallel.ring import RingEncoder

    h, w = 1088, 1920
    cfg = EncoderConfig(width=w, height=h, gop_n=T, base_qp=QP, search="full")
    rmesh = Mesh(np.array(jax.devices()[:1]), ("ring",))
    y, cb, cr = synth_clip(T, h, w)
    frames = [Frame.from_planes(y[k], cb[k], cr[k]) for k in range(T)]
    ring = RingEncoder(cfg, rmesh)
    t0 = time.perf_counter()
    pk = ring.encode_streams([frames], [0])
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    pk = ring.encode_streams([frames], [0])
    steady = time.perf_counter() - t0
    results["ring_1080p_1dev"] = {
        "compiled_and_ran": True,
        "first_call_s": round(compile_and_run, 1),
        "steady_ms_per_frame": round(steady / T * 1e3, 1),
        "packets": sum(len(p) for p in pk),
        "note": "steady rate is this container's host->device tunnel "
                "uploading 3.1 MB per ring step (the SP driver reads host "
                "frames per frame by design); the compiled step itself is "
                "the same per-frame program the tile rows measure",
    }
    print("ring", results["ring_1080p_1dev"], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tp_shard_perf_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
