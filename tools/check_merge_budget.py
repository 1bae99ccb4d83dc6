"""Measured check of the large-m merge width budget (ops/pallas/pack.py
_merge_budget): per-resolution/qp timing, overflow incidence on the bench
content, and chunks-vs-frame stream byte-equality. WRITES
tools/merge_budget_results.json (plus GOP=8 4K and GOP=30 1080p headline
rows). The bits_sum pin is the r4 value — every r5 pack change
(super_merge_mb, lane-wise header, w/4 budget, single-reduction wbody) is
byte-exact, so it must keep matching."""
import os
import sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import synth_clip
from video_encoder_tpu.codec import entropy, spec
from video_encoder_tpu.parallel.tiles import bit_concat
from video_encoder_tpu.pipeline.gop_engine import _block_words_for_qp, encode_gop_jit

results = {"_meta": {"platform": jax.default_backend(),
                     "note": "r5: MB-source merge + w/4 budget + "
                             "single-reduction block-pack wbody"}}

for H, W, T, reps in ((1080, 1920, 8, 5), (1080, 1920, 30, 4),
                      (2160, 3840, 4, 3), (2160, 3840, 8, 3)):
    hp = spec.ceil_to(H, 16)
    nm = (hp // 16) * (W // 16)
    y, cb, cr = synth_clip(T, hp, W)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
    for qp in (30, 20):
        bw = _block_words_for_qp(qp)
        kw = dict(search="full", rc="none", block_words=bw,
                  cap_words=entropy.capacity_words(nm, 1024), target_bits=0,
                  emit="chunks")
        t0 = time.perf_counter()
        outs = encode_gop_jit(yd, cbd, crd, qp, **kw)
        ovf = bool(np.asarray(outs["ovf"]).any()); cs = time.perf_counter()-t0
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = encode_gop_jit(yd, cbd, crd, qp, **kw)
        np.asarray(outs["bits"])
        ms = (time.perf_counter()-t0)/(reps*T)*1e3
        row = {"ms": round(ms, 3), "fps": round(1e3/ms, 1), "ovf": ovf}
        tag = "1080p" if H == 1080 else "4K"
        results[f"{tag}_gop{T}_qp{qp}"] = row
        print(json.dumps({"res": f"{W}x{H}", "gop": T, "qp": qp, "bw": bw,
                          "ovf": ovf, "ms": round(ms,3),
                          "fps": round(1e3/ms,1),
                          "compile_s": round(cs,1)}), flush=True)

# stream equality at 1080p qp30 vs frame path
H, W, T = 1080, 1920, 8
hp = spec.ceil_to(H, 16); nm = (hp//16)*(W//16)
y, cb, cr = synth_clip(T, hp, W)
yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
kwc = dict(search="full", rc="none", block_words=16,
           cap_words=entropy.capacity_words(nm, 1024), target_bits=0)
oc = encode_gop_jit(yd, cbd, crd, 30, emit="chunks", **kwc)
of = encode_gop_jit(yd, cbd, crd, 30, emit="frame", **kwc)
bits_f = np.asarray(of["bits"])
wf = np.ascontiguousarray(np.asarray(jax.lax.bitcast_convert_type(of["words"], jnp.uint8))).view(np.uint32)[..., 0]
cb_ = np.asarray(oc["cbits"])
cw_ = np.ascontiguousarray(np.asarray(jax.lax.bitcast_convert_type(oc["words"], jnp.uint8))).view(np.uint32)[..., 0]
ok = True
for t in range(T):
    pf = wf[t][: (int(bits_f[t]) + 31)//32].astype(">u4").tobytes()
    pc, nb = bit_concat([(cw_[t, c], int(cb_[t, c])) for c in range(cb_.shape[1]) if cb_[t, c]])
    ok &= (nb == int(bits_f[t]) and pc == pf)
results["stream_equality_vs_frame_path"] = bool(ok)
results["bits_sum_matches_prechange"] = int(bits_f.sum()) == 11048559
print(json.dumps({"stream_equality": bool(ok),
                  "bits_sum_matches": int(bits_f.sum()) == 11048559}), flush=True)
out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "merge_budget_results.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
