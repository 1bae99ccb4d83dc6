"""Perf experiments on the real chip: candidate tunings of the 1080p
full-search GOP program, each timed with the steady-state methodology.

Variants (pick with argv, default all):
- tn64:  full-search ME tile widened to TN=64 MBs (TW=1024 lanes) so the
  SAD-reduction matmul's N dim covers half the 128-wide MXU instead of a
  quarter. VMEM check: diff scratch 33*128*1024*bf16 = 8.6 MB + rots 3.2
  MB + window < 16 MB/core budget.
- bw16:  per-8x8-block pack budget 24 -> 16 words (512 bits): pack_dense
  compare-reduce and tree_concat costs scale with block_words; overflow
  (exactly detected) would fall back to the worst-case rerun in
  production, so the stream stays bit-exact either way. The variant
  reports the overflow flag so we know whether 16 is safe at qp 30.
- tn64_bw16: both.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, T, REPS = 1080, 1920, 8, 5



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
    import jax
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.ops.pallas import sad
    from video_encoder_tpu.pipeline.gop_engine import encode_gop_jit

    hp = spec.ceil_to(H, 16)
    n_mbs = (hp // 16) * (W // 16)
    y, cb, cr = synth_clip(T, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)

    which = sys.argv[1:] or ["base", "tn64", "bw16", "tn64_bw16"]
    results = {"_meta": dict(platform=jax.default_backend(),
                             h=H, w=W, t=T, reps=REPS)}
    orig_shape = sad._fs_tile_shape

    def wide_shape(nby, nbx):
        tm, tn = orig_shape(nby, nbx)
        return tm, (64 if nbx >= 96 else tn)

    static = ("search", "rc", "block_words", "cap_words", "target_bits",
              "fmt", "cqpo", "qbias", "vbv_bits", "qmat")

    for name in which:
        sad._fs_tile_shape = wide_shape if "tn64" in name else orig_shape
        sad._full_search_call.cache_clear()
        # A fresh jax.jit per variant: encode_gop_jit's own executable
        # cache is keyed on shapes+statics, identical across variants, so
        # reusing it would silently time the baseline program under every
        # patch (ADVICE r2 medium finding).
        jitted = jax.jit(_fresh_fn(encode_gop_jit.__wrapped__),
                         static_argnames=static)
        bw = 16 if "bw16" in name else 24
        kw = dict(search="full", rc="none", block_words=bw,
                  cap_words=entropy.capacity_words(n_mbs, 1024),
                  target_bits=0)
        try:
            t0 = time.perf_counter()
            outs = jitted(yd, cbd, crd, 30, **kw)
            ovf = bool(np.asarray(outs["ovf"]).any())
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                outs = jitted(yd, cbd, crd, 30, **kw)
            np.asarray(outs["bits"])
            fps = T * REPS / (time.perf_counter() - t0)
            results[name] = dict(fps=round(fps, 2), ovf=ovf,
                                 compile_s=round(compile_s, 1))
        except Exception as e:  # compile failure (e.g. VMEM) is a result
            results[name] = dict(error=str(e)[:300])
        finally:
            sad._fs_tile_shape = orig_shape
            sad._full_search_call.cache_clear()
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_perf_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
