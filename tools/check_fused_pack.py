"""On-chip check + timing of the fused Pallas symbols+pack kernel
(ops/pallas/entropy_pack.py — r3 VERDICT item 1).

1. kernel vs jnp-pair equality at frame scale, v1 and v2 syntax.
2. the production GOP program (emit="frame", full, qp30, 1080p T=8) with
   the kernel integrated: bits checksum must still be 11048559 (the
   pre-change recording — the kernel changes WHERE symbols are computed,
   not the stream), plus before/after timing (before = 10.51-10.54
   ms/frame, tools/check_pack_results.json).
3. GOP=30 headline fps.

Writes tools/check_fused_pack_results.json.
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
    from video_encoder_tpu.ops.pallas import entropy_pack as ep
    from video_encoder_tpu.pipeline.gop_engine import (
        _block_words_for_qp, encode_gop_jit,
    )

    results = {"platform": jax.default_backend()}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "check_fused_pack_results.json")

    def flush():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # 1. kernel == jnp pair at 1080p-luma scale
    rng = np.random.default_rng(5)
    n, words = 32640, 16
    lv = np.where(rng.random((n, 64)) < 0.12,
                  rng.integers(-60, 61, (n, 64)), 0).astype(np.int32)
    lv[7] = rng.integers(-3925, 3926, 64)
    dcp = rng.integers(-200, 201, n).astype(np.int32)
    for fmt in (1, 2):
        if fmt >= 2:
            v, l = entropy.block_symbols_v2(jnp.asarray(lv), jnp.asarray(dcp))
        else:
            v, l = entropy.block_symbols(jnp.asarray(lv))
        want_w, want_b, _ = jax.jit(
            entropy.pack_dense, static_argnums=2)(v, l, words)
        got_w, got_b = ep.block_pack(jnp.asarray(lv), jnp.asarray(dcp),
                                     fmt, words)
        ok = (np.array_equal(np.asarray(want_b), np.asarray(got_b))
              and np.array_equal(np.asarray(want_w), np.asarray(got_w)))
        results[f"kernel_equality_v{fmt}"] = "ok" if ok else "MISMATCH"
        print(json.dumps({f"kernel_equality_v{fmt}":
                          results[f"kernel_equality_v{fmt}"]}), flush=True)
        flush()
        if not ok:
            return 1

    # 2. production GOP program: checksum + timing
    H, W = 1080, 1920
    hp = spec.ceil_to(H, 16)
    nby, nbx = hp // 16, W // 16
    nm = nby * nbx
    kw = dict(search="full", rc="none", block_words=_block_words_for_qp(30),
              cap_words=entropy.capacity_words(nm, 1024), target_bits=0)
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
        before_ms_per_frame=10.51,
    )
    print(json.dumps({"gop_1080p": results["gop_1080p"]}), flush=True)
    flush()

    # 3. GOP=30 headline shape
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
    return 0 if bits_sum == 11048559 else 1


if __name__ == "__main__":
    sys.exit(main())
