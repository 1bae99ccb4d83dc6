"""DCE decomposition of the emit="chunks" GOP program (r4): stubs the
super merge and the fused block_pack kernels one at a time to attribute
the frame floor. Shapes via env XH/XW/XT/XR (defaults 1080p, T=8).
Results recorded in tools/exp_chunks_results.json (hand-merged per run).
Each variant routes through a fresh function object (jit keys executables
on callable identity)."""

import sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import synth_clip
from video_encoder_tpu.codec import entropy, spec
from video_encoder_tpu.pipeline import gop_engine

import os
H, W, T, REPS = int(os.environ.get("XH",1080)), int(os.environ.get("XW",1920)), int(os.environ.get("XT",8)), int(os.environ.get("XR",5))
hp = spec.ceil_to(H, 16)
nm = (hp // 16) * (W // 16)
kw = dict(search="full", rc="none",
          block_words=gop_engine._block_words_for_qp(30),
          cap_words=entropy.capacity_words(nm, 1024), target_bits=0,
          emit="chunks")
y, cb, cr = synth_clip(T, hp, W)
yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
fn = gop_engine.encode_gop_jit.__wrapped__
static = ("search", "rc", "block_words", "cap_words", "target_bits",
          "fmt", "cqpo", "qbias", "vbv_bits", "qmat", "unroll", "islice", "emit")

def fresh(f):
    import functools
    @functools.wraps(f)
    def w2(*a, **k): return f(*a, **k)
    w2.__wrapped__ = None
    return w2

def timed(jitted):
    outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = jitted(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    return (time.perf_counter()-t0)/(REPS*T)*1e3

real = entropy._pieces_to_chunks
ms = timed(jax.jit(fresh(fn), static_argnames=static))
print(json.dumps({"full-chunks": round(ms,3)}), flush=True)

def no_merge(pw, pb, bw):
    n, w = pw.shape
    n2, h, cw, ns = __import__("video_encoder_tpu.ops.pallas.pack", fromlist=["x"]).span_geometry(n, w)
    keep = pw.astype(jnp.int32).sum() + pb.sum()
    return (jnp.zeros((ns, cw), jnp.uint32) + keep.astype(jnp.uint32),
            jnp.zeros((ns,), jnp.int32) + pb.sum(), jnp.asarray(False))
entropy._pieces_to_chunks = no_merge
try:
    ms2 = timed(jax.jit(fresh(fn), static_argnames=static))
finally:
    entropy._pieces_to_chunks = real
print(json.dumps({"no-merge": round(ms2,3), "delta": round(ms-ms2,3)}), flush=True)

# also: no block_pack (stub _pack_blocks) on the chunks path
real_pb = entropy._pack_blocks
def no_bp(levels, dcp, fmt, bw):
    lead = levels.shape[:-1]
    keep = levels.sum()
    return (jnp.zeros((*lead, bw), jnp.uint32) + keep.astype(jnp.uint32),
            jnp.zeros(lead, jnp.int32) + 40, jnp.asarray(False))
entropy._pack_blocks = no_bp
try:
    ms3 = timed(jax.jit(fresh(fn), static_argnames=static))
finally:
    entropy._pack_blocks = real_pb
print(json.dumps({"no-blockpack": round(ms3,3), "delta": round(ms-ms3,3)}), flush=True)
