"""On-chip correctness check for the GOP-batched Pallas kernel variants:
each custom_vmap batch rule must be bit-exact with a per-G python loop of
the single-plane kernel, and the full batched-GOP scan must reproduce the
sequential per-GOP streams (r2 verdict item 1). Writes
tools/batched_kernels_check.json; exits nonzero on any mismatch.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, T, G = 64, 128, 3, 2


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import entropy
    from video_encoder_tpu.ops.pallas import codec as pcodec
    from video_encoder_tpu.ops.pallas import sad as psad
    from video_encoder_tpu.pipeline.gop_engine import (
        encode_gop_batch_jit, encode_gop_jit,
    )

    results = {"platform": jax.default_backend()}
    rng = np.random.default_rng(3)
    cur = jnp.asarray(rng.integers(0, 256, (G, H, W), np.int32))
    ref = jnp.asarray(rng.integers(0, 256, (G, H, W), np.int32))

    def eq(name, a, b):
        ok = all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
        results[name] = "ok" if ok else "MISMATCH"
        print(json.dumps({name: results[name]}), flush=True)
        return ok

    ok = True

    # 1. full search
    want = [psad.full_search(cur[g], ref[g]) for g in range(G)]
    want = jax.tree.map(lambda *x: jnp.stack(x), *want)
    got = jax.jit(jax.vmap(psad.full_search))(cur, ref)
    ok &= eq("full_search", want, got)

    # 2. even SAD map (diamond)
    want = jnp.stack([psad.sad_map_even(cur[g], ref[g]) for g in range(G)])
    got = jax.jit(jax.vmap(psad.sad_map_even))(cur, ref)
    ok &= eq("sad_map_even", want, got)

    # 3. MC fetch (luma + chroma) and sad_at_mv
    dy = jnp.asarray(rng.integers(-16, 17, (G, H // 16, W // 16), np.int32))
    dx = jnp.asarray(rng.integers(-16, 17, (G, H // 16, W // 16), np.int32))
    want = jnp.stack([psad.mc_fetch_plane(ref[g], dy[g], dx[g]) for g in range(G)])
    got = jax.jit(jax.vmap(psad.mc_fetch_plane))(ref, dy, dx)
    ok &= eq("mc_fetch_luma", want, got)

    cdy, cdx = dy >> 1, dx >> 1
    refc = jnp.asarray(rng.integers(0, 256, (G, H // 2, W // 2), np.int32))
    want = jnp.stack(
        [psad.mc_fetch_plane_chroma(refc[g], cdy[g], cdx[g]) for g in range(G)]
    )
    got = jax.jit(jax.vmap(psad.mc_fetch_plane_chroma))(refc, cdy, cdx)
    ok &= eq("mc_fetch_chroma", want, got)

    want = jnp.stack([psad.sad_at_mv(cur[g], ref[g], dy[g], dx[g]) for g in range(G)])
    got = jax.jit(jax.vmap(psad.sad_at_mv))(cur, ref, dy, dx)
    ok &= eq("sad_at_mv", want, got)

    # 4. fused code_plane (flat + qmat)
    qb = jnp.asarray(rng.integers(10, 60, (G, H // 8, W // 8), np.int32))
    for qmat in (False, True):
        want = [pcodec.code_plane(cur[g], ref[g], qb[g], 8, qmat) for g in range(G)]
        want = jax.tree.map(lambda *x: jnp.stack(x), *want)
        got = jax.jit(jax.vmap(
            lambda c, p, q: pcodec.code_plane(c, p, q, 8, qmat)
        ))(cur, ref, qb)
        ok &= eq(f"code_plane_qmat{int(qmat)}", want, got)

    # 5. whole batched-GOP scan vs sequential, full + diamond search
    y, cb, cr = synth_clip(T * G, H, W)
    yb = jnp.asarray(y.reshape(G, T, H, W))
    cbb = jnp.asarray(cb.reshape(G, T, H // 2, W // 2))
    crb = jnp.asarray(cr.reshape(G, T, H // 2, W // 2))
    n_mbs = (H // 16) * (W // 16)
    for search in ("full", "diamond"):
        kw = dict(search=search, rc="none", block_words=24,
                  cap_words=entropy.max_words(n_mbs), target_bits=0)
        outs_b = encode_gop_batch_jit(yb, cbb, crb, 30, **kw)
        seq = [
            encode_gop_jit(yb[g], cbb[g], crb[g], 30, **kw) for g in range(G)
        ]
        want = jax.tree.map(lambda *x: jnp.stack(x, axis=1), *seq)
        ok &= eq(f"gop_batch_scan_{search}",
                 (want["words"], want["bits"]),
                 (outs_b["words"], outs_b["bits"]))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "batched_kernels_check.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"all_ok": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
