"""A/B the large-m merge width budget divisor (r5): the 4K chunks-pack
decomposition re-attributed 6.6 ms/frame to super_merge
(tools/exp_pack_parts_chunks_results.json), and the merge's placement
pass count scales with the budgeted width. r4 set bpp_w = w/2 for
m >= 64 levels; typical strings fill ~1/12 of worst case, so /3 or /4
still carries ~4x/3x headroom — and genuine overflows are detected
exactly and re-encoded at worst case (bit-exact either way).

Device-resident timing (upload once; the tunnel moves uint8 at 26 MB/s
so GopEngine-level timing would be transfer-bound). Asserts zero
overflow on the bench content and identical (cbits, used words) vs the
/2 baseline. Writes tools/exp_merge_bpp_results.json.
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
from video_encoder_tpu.ops.pallas import pack as ppack
from video_encoder_tpu.pipeline import gop_engine

REPS = int(os.environ.get("REPS", 3))
STATIC = ("search", "rc", "block_words", "cap_words", "target_bits",
          "fmt", "cqpo", "qbias", "vbv_bits", "qmat", "unroll", "islice",
          "emit")


def _fresh_fn(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        return fn(*a, **k)
    wrapper.__wrapped__ = None
    return wrapper


def run(yd, cbd, crd, qp, n_mbs, t):
    kw = dict(search="full", rc="none",
              block_words=gop_engine._block_words_for_qp(qp),
              cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
              emit="chunks")
    fn = jax.jit(_fresh_fn(gop_engine.encode_gop_jit.__wrapped__),
                 static_argnames=STATIC)
    outs = fn(yd, cbd, crd, qp, **kw)
    np.asarray(outs["bits"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = fn(yd, cbd, crd, qp, **kw)
    np.asarray(outs["bits"])
    ms = (time.perf_counter() - t0) / (REPS * t) * 1e3
    return ms, outs


def main():
    results = {"_meta": {"platform": jax.default_backend(), "reps": REPS,
                         "note": "merge budget divisor A/B, device-resident; "
                                 "payloads must match the /2 baseline"}}
    orig = ppack._merge_budget
    for label, h, w, t in (("4K", 2160, 3840, 8), ("1080p", 1080, 1920, 8)):
        hp = spec.ceil_to(h, 16)
        n_mbs = (hp // 16) * (w // 16)
        y, cb, cr = synth_clip(t, hp, w)
        yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
        for qp in (30, 20):
            row = {}
            base = None
            for div in (2, 3, 4):
                def budget(w_, _d=div):
                    from video_encoder_tpu.codec import entropy as _e
                    if w_ >= _e.BLOCK_WORDS_MAX:
                        return w_
                    return max(w_ // _d, 2)
                ppack._merge_budget = budget
                ppack._reduce_call.cache_clear()
                ppack._super_merge_public.cache_clear()
                try:
                    ms, outs = run(yd, cbd, crd, qp, n_mbs, t)
                    ovf = bool(np.asarray(outs["ovf"]).any())
                    row[f"div{div}_ms"] = round(ms, 3)
                    row[f"div{div}_ovf"] = ovf
                    cbits = np.asarray(outs["cbits"])
                    maxw = int((cbits.max() + 31) // 32)
                    words = np.asarray(outs["words"][:, :, :maxw])
                    if base is None:
                        base = (cbits, words)
                    else:
                        mw = min(base[1].shape[2], words.shape[2])
                        row[f"div{div}_payload_equal"] = bool(
                            np.array_equal(base[0], cbits)
                            and np.array_equal(base[1][:, :, :mw],
                                               words[:, :, :mw]))
                except Exception as e:
                    row[f"div{div}_error"] = str(e)[:300]
                finally:
                    ppack._merge_budget = orig
                    ppack._reduce_call.cache_clear()
                    ppack._super_merge_public.cache_clear()
            results[f"{label}_qp{qp}"] = row
            print(label, qp, row, flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_merge_bpp_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
