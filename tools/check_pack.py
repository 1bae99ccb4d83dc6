"""On-chip check + timing of the chunk-emitting entropy pack.

The r3 design removes the device-side frame assembly (SURVEY.md §7.0
"host does bytes"): encode_gop_jit(emit="chunks") stops at VMEM-merged
chunk strings (ops/pallas/pack.py) and the host mux bit-concatenates
them. Checks here:

1. chunk path == frame path: pack_frame_chunks' host-concatenated stream
   must equal pack_frame_planes' device-assembled stream on real frame
   pieces at 1080p scale.
2. the GOP program's bits checksum matches the pre-change recording
   (11048559 for the T=8 qp30 synth clip — tools/, r3 session log).
3. the before/after timing the r2 verdict item 5 asked for ('before' =
   10.54 ms/frame, tools/ablate_dce_results.json full-program row).

Writes tools/check_pack_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.parallel.tiles import bit_concat
    from video_encoder_tpu.pipeline.gop_engine import (
        _block_words_for_qp, encode_gop_jit,
    )

    results = {"platform": jax.default_backend()}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "check_pack_results.json")

    def flush():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # 1. chunk stream == frame stream on a real coded frame
    H, W = 1080, 1920
    hp = spec.ceil_to(H, 16)
    nby, nbx = hp // 16, W // 16
    rng = np.random.default_rng(11)
    lz_y = jnp.asarray(np.where(rng.random((2 * nby, 2 * nbx, 64)) < 0.12,
                                rng.integers(-40, 41, (2 * nby, 2 * nbx, 64)),
                                0).astype(np.int32))
    lz_cb = jnp.asarray(np.where(rng.random((nby, nbx, 64)) < 0.08,
                                 rng.integers(-20, 21, (nby, nbx, 64)),
                                 0).astype(np.int32))
    lz_cr = lz_cb
    qpd = jnp.zeros((nby, nbx), jnp.int32)
    inter = jnp.asarray(rng.random((nby, nbx)) < 0.8)
    dy = jnp.asarray(rng.integers(-16, 17, (nby, nbx), np.int32))
    dx = jnp.asarray(rng.integers(-16, 17, (nby, nbx), np.int32))
    bw = 24
    n_words = entropy.capacity_words(nby * nbx, 1024)

    @jax.jit
    def both(lz_y, lz_cb, lz_cr, qpd, inter, dy, dx):
        w_f, b_f, _, o_f = entropy.pack_frame_planes(
            lz_y, lz_cb, lz_cr, qpd, True, inter, dy, dx, bw, n_words)
        cw_, cb_, _, o_c = entropy.pack_frame_chunks(
            lz_y, lz_cb, lz_cr, qpd, True, inter, dy, dx, bw)
        return w_f, b_f, o_f, cw_, cb_, o_c

    w_f, b_f, o_f, cw_, cb_, o_c = jax.tree.map(
        np.asarray, both(lz_y, lz_cb, lz_cr, qpd, inter, dy, dx))
    assert not o_f and not o_c, "unexpected overflow"
    frame_payload = w_f[: (int(b_f) + 31) // 32].astype(">u4").tobytes()
    chunk_payload, nbits = bit_concat(
        [(cw_[c], int(cb_[c])) for c in range(len(cb_)) if cb_[c]]
    )
    ok = nbits == int(b_f) and chunk_payload == frame_payload
    results["chunk_stream_equality"] = "ok" if ok else "MISMATCH"
    print(json.dumps({"chunk_stream_equality": results["chunk_stream_equality"],
                      "bits": int(b_f)}), flush=True)
    flush()

    # 2+3. GOP program with emit="chunks": checksum + timing
    nm = nby * nbx
    kw = dict(search="full", rc="none", block_words=_block_words_for_qp(30),
              cap_words=entropy.capacity_words(nm, 1024), target_bits=0,
              emit="chunks")
    y, cb, cr = synth_clip(8, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    t0 = time.perf_counter()
    outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    bits_sum = int(np.asarray(outs["bits"]).sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    ms = (time.perf_counter() - t0) / 40 * 1e3
    results["gop_1080p"] = dict(
        ms_per_frame=round(ms, 2), fps=round(1e3 / ms, 1),
        bits_sum=bits_sum,
        bits_sum_matches_prechange=(bits_sum == 11048559),
        compile_s=round(compile_s, 1),
        before_ms_per_frame=10.54,
    )
    print(json.dumps({"gop_1080p": results["gop_1080p"]}), flush=True)
    flush()

    # GOP=30 headline shape
    y, cb, cr = synth_clip(30, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
    outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    t0 = time.perf_counter()
    for _ in range(4):
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    fps = 120 / (time.perf_counter() - t0)
    results["gop30_1080p_fps"] = round(fps, 2)
    print(json.dumps({"gop30_1080p_fps": results["gop30_1080p_fps"]}),
          flush=True)
    flush()
    return 0 if ok and bits_sum == 11048559 else 1


if __name__ == "__main__":
    sys.exit(main())
