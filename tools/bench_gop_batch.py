"""Floor-breaking experiment (r2 verdict item 1): the on-chip ablation
(tools/ablation_results.json) shows the 1080p GOP scan pinned at ~10.5
ms/frame regardless of which stage is stubbed — a per-scan-iteration floor.
encode_gop_batch_jit amortizes that floor by vectorizing G independent GOPs
into each iteration (vmapped scan body); this tool measures aggregate
fps/chip vs G, plus lax.scan unroll on the single-GOP program, and dumps
the XLA cost analysis of the baseline program (flops / bytes accessed) so
the floor has a named, committed explanation.

Variants (argv, default all): base, unroll2, unroll4, g2, g4, g8, cost
Env: BGB_H/BGB_W/BGB_T/BGB_REPS override the 1080p GOP=8 default.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BGB_H", 1080))
W = int(os.environ.get("BGB_W", 1920))
T = int(os.environ.get("BGB_T", 8))
REPS = int(os.environ.get("BGB_REPS", 5))


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.pipeline.gop_engine import (
        _block_words_for_qp, encode_gop_batch_jit, encode_gop_jit,
    )

    hp = spec.ceil_to(H, 16)
    n_mbs = (hp // 16) * (W // 16)
    kw = dict(search="full", rc="none",
              block_words=_block_words_for_qp(30),
              cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0)

    which = sys.argv[1:] or ["base", "unroll2", "unroll4", "g2", "g4", "g8",
                             "cost"]
    results = {"_meta": dict(platform=jax.default_backend(),
                             h=H, w=W, t=T, reps=REPS)}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "gop_batch_results.json")

    def flush():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def timed_single(unroll):
        y, cb, cr = synth_clip(T, hp, W)
        yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
        t0 = time.perf_counter()
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw, unroll=unroll)
        np.asarray(outs["bits"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            outs = encode_gop_jit(yd, cbd, crd, 30, **kw, unroll=unroll)
        np.asarray(outs["bits"])
        fps = T * REPS / (time.perf_counter() - t0)
        return fps, compile_s

    def timed_batch(g):
        ys, cbs, crs = [], [], []
        for k in range(g):
            y, cb, cr = synth_clip(T, hp, W, seed=k)
            ys.append(y); cbs.append(cb); crs.append(cr)
        yd = jnp.asarray(np.stack(ys))
        cbd = jnp.asarray(np.stack(cbs))
        crd = jnp.asarray(np.stack(crs))
        t0 = time.perf_counter()
        outs = encode_gop_batch_jit(yd, cbd, crd, 30, **kw)
        np.asarray(outs["bits"])
        compile_s = time.perf_counter() - t0
        reps = max(2, REPS // g + 1)
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = encode_gop_batch_jit(yd, cbd, crd, 30, **kw)
        np.asarray(outs["bits"])
        fps = g * T * reps / (time.perf_counter() - t0)
        return fps, compile_s

    for name in which:
        try:
            if name == "base":
                fps, cs = timed_single(1)
                results[name] = dict(agg_fps=round(fps, 2),
                                     compile_s=round(cs, 1))
            elif name.startswith("unroll"):
                fps, cs = timed_single(int(name[6:]))
                results[name] = dict(agg_fps=round(fps, 2),
                                     compile_s=round(cs, 1))
            elif name.startswith("g"):
                g = int(name[1:])
                fps, cs = timed_batch(g)
                results[name] = dict(agg_fps=round(fps, 2), gops=g,
                                     compile_s=round(cs, 1),
                                     fps_per_gop=round(fps / g, 2))
            elif name == "cost":
                # XLA's own accounting of the baseline program: flops and
                # bytes accessed per execution -> ms-equivalents at v5e
                # peak (197 TF/s bf16, 819 GB/s HBM) name the floor.
                y, cb, cr = synth_clip(T, hp, W)
                lowered = encode_gop_jit.lower(
                    jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), 30, **kw
                )
                ca = lowered.compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0] if ca else {}
                flops = float(ca.get("flops", 0))
                bytes_acc = float(ca.get("bytes accessed", 0))
                results[name] = dict(
                    flops=flops, bytes_accessed=bytes_acc,
                    ms_flops_at_peak=round(flops / 197e12 * 1e3 / T, 3),
                    ms_hbm_at_peak=round(bytes_acc / 819e9 * 1e3 / T, 3),
                    note="per-frame ms at v5e peaks; T-frame program",
                )
        except Exception as e:
            results[name] = dict(error=str(e)[:300])
        print(json.dumps({"variant": name, **results[name]}), flush=True)
        flush()


if __name__ == "__main__":
    main()
