"""TPU-only kernel tests (RUN_TPU_TESTS=1): odd MB grids exercise the
tile-padding paths of the Pallas kernels; skipped on CPU where the jnp
fallbacks (already covered) are dispatched instead."""

import os

import numpy as np
import pytest

if not os.environ.get("RUN_TPU_TESTS"):
    pytest.skip("TPU-only kernel tests (set RUN_TPU_TESTS=1)", allow_module_level=True)

import jax
import jax.numpy as jnp

from video_encoder_tpu.ops import motion
from video_encoder_tpu.ops.pallas import sad as psad
from video_encoder_tpu.ops.transform import blockify


@pytest.mark.parametrize("h,w", [(368, 640), (144, 208), (1088, 1920)])
def test_full_search_odd_grids(rng, h, w):
    cur = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.roll(cur, (5, -7), (0, 1))
    gdy, gdx, gsad = motion.full_search(cur, ref)
    pdy, pdx, ps = psad.full_search(cur, ref)
    assert jnp.array_equal(gdy, pdy) and jnp.array_equal(gdx, pdx)
    assert jnp.array_equal(gsad, ps)



def test_mc_kernels_odd_grid(rng):
    h, w = 144, 208
    ref = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    nby, nbx = h // 16, w // 16
    dy = jnp.asarray(rng.integers(-16, 17, (nby, nbx)), jnp.int32)
    dx = jnp.asarray(rng.integers(-16, 17, (nby, nbx)), jnp.int32)
    refpad = motion.pad_ref(ref, 16)
    want = motion.mc_fetch(refpad, dy, dx, 16, 16)
    got = blockify(psad.mc_fetch_plane(ref, dy, dx), 16)
    assert jnp.array_equal(want, got)



def test_sad_map_even_matches_full_map(rng):
    h, w = 368, 640
    cur = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    mf = np.asarray(psad.sad_map(cur, ref))
    me = np.asarray(psad.sad_map_even(cur, ref))
    nby, nbx = mf.shape[:2]
    sub = mf.reshape(nby, nbx, 33, 33)[:, :, ::2, ::2].reshape(nby, nbx, 289)
    assert np.array_equal(sub, me)


@pytest.mark.parametrize("h,w", [(368, 640), (144, 208)])
def test_dispatch_diamond_odd_grids(rng, h, w):
    """Production map-descent diamond vs the jnp reference, odd MB grids."""
    from video_encoder_tpu.ops import dispatch

    cur = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.roll(cur, (2, 3), (0, 1))
    g = motion.diamond_search(cur, ref)
    p = jax.jit(dispatch.diamond_search)(cur, ref)
    assert all(bool(jnp.array_equal(a, b)) for a, b in zip(g, p))


@pytest.mark.parametrize("h,w,qbias,qmat", [
    (368, 640, 8, False), (144, 208, 8, False), (184, 320, 6, False),
    (1088, 1920, 8, False), (368, 640, 8, True)])
def test_code_plane_kernel(rng, h, w, qbias, qmat):
    """Fused Pallas transform+quant+recon vs the staged jnp path — exact,
    including non-tile-multiple heights (chroma shapes), non-default
    quant bias, and the v3 quant matrix (whose per-position step is now
    derived in-kernel from the block-level q, r5)."""
    from video_encoder_tpu.ops import dispatch

    cur = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    pred = jnp.asarray(
        np.clip(np.roll(np.asarray(cur), (2, 3), (0, 1))
                + rng.integers(-20, 21, (h, w)), 0, 255), jnp.int32)
    qps = rng.integers(1, 52, (h // 8, w // 8))
    from video_encoder_tpu.ops import transform as tx
    q_blk = tx.qstep(jnp.asarray(qps, jnp.int32))

    dispatch.force("jnp")
    try:
        lz_w, rec_w = dispatch.code_plane(cur, pred, q_blk, qbias, qmat)
        dispatch.force("pallas")
        lz_g, rec_g = dispatch.code_plane(cur, pred, q_blk, qbias, qmat)
    finally:
        dispatch.force(None)
    assert jnp.array_equal(lz_w, lz_g)
    assert jnp.array_equal(rec_w, rec_g)


def test_chunk_merge_matches_tree_concat(rng):
    """VMEM chunk-merge kernel (ops/pallas/pack.py) vs entropy.tree_concat
    on random piece strings — the bit-exactness the pack.py docstring
    claims (ADVICE r3 item 2)."""
    from video_encoder_tpu.codec import entropy
    from video_encoder_tpu.ops.pallas import pack as ppack

    n, w = 256, 8
    k = 32  # pieces per chunk (kernel emits two half-chunk strings)
    bits = rng.integers(0, 32 * w + 1, n).astype(np.int32)
    words = np.zeros((n, w), np.uint32)
    for i in range(n):
        nwords = (int(bits[i]) + 31) // 32
        vals = rng.integers(0, 2**32, nwords, dtype=np.uint64).astype(np.uint32)
        if nwords:
            tail = int(bits[i]) & 31
            if tail:
                vals[-1] &= np.uint32(0xFFFFFFFF) << (32 - tail)
        words[i, :nwords] = vals

    cw, cb = ppack.chunk_merge(jnp.asarray(words), jnp.asarray(bits), k)
    cw, cb = np.asarray(cw), np.asarray(cb)
    h = k // 2
    for c in range(n // h):
        want_w, want_b = entropy.tree_concat(
            jnp.asarray(words[c * h:(c + 1) * h]),
            jnp.asarray(bits[c * h:(c + 1) * h]), cw.shape[1],
        )
        assert int(want_b) == int(cb[c])
        assert np.array_equal(np.asarray(want_w), cw[c])


@pytest.mark.parametrize("fmt", [1, 2])
def test_block_pack_kernel_on_chip(rng, fmt):
    """Fused symbols+pack kernel (ops/pallas/entropy_pack.py) vs the jnp
    reference pair on the real chip — compiled mosaic, not interpret."""
    from video_encoder_tpu.codec import entropy
    from video_encoder_tpu.ops.pallas import entropy_pack as ep

    n, words = 700, 16
    lv = np.zeros((n, 64), np.int32)
    mask = rng.random((n, 64)) < 0.15
    lv[mask] = rng.integers(-3925, 3926, mask.sum())
    lv[0] = 0
    lv[1] = rng.integers(-3925, 3926, 64)
    dcp = rng.integers(-3925, 3926, n).astype(np.int32)

    if fmt >= 2:
        v, l = entropy.block_symbols_v2(jnp.asarray(lv), jnp.asarray(dcp))
    else:
        v, l = entropy.block_symbols(jnp.asarray(lv))
    want_w, want_b, _ = entropy.pack_dense(v, l, words)
    got_w, got_b = ep.block_pack(jnp.asarray(lv), jnp.asarray(dcp), fmt, words)
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b))
    assert np.array_equal(np.asarray(want_w), np.asarray(got_w))


def test_block_pack_worst_case_budget_compiles(rng):
    """The xl rerun (block_words = BLOCK_WORDS_MAX) is the correctness
    escape hatch for budget overflows — it must ALWAYS compile. At 1080p
    scale the W=78 output previously blew XLA's 16 MB scoped-VMEM budget
    (r4); the chunked block_pack call bounds every pallas scope."""
    from video_encoder_tpu.codec import entropy
    from video_encoder_tpu.ops.pallas import entropy_pack as ep

    n, words = 32768, entropy.BLOCK_WORDS_MAX
    lv = np.where(rng.random((n, 64)) < 0.5,
                  rng.integers(-3925, 3926, (n, 64)), 0).astype(np.int32)
    got_w, got_b = ep.block_pack(jnp.asarray(lv), None, 1, words)
    v, l = entropy.block_symbols(jnp.asarray(lv[:512]))
    want_w, want_b, _ = entropy.pack_dense(v, l, words)
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b[:512]))
    assert np.array_equal(np.asarray(want_w), np.asarray(got_w[:512]))


def test_gop_engine_overflow_rerun_on_chip(rng):
    """A qp-4 GOP floods the budgeted pack: the worst-case rerun must
    produce the same bytes as the golden engine ON THE CHIP (this exact
    path failed to compile before the chunked block_pack)."""
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    w, h, n = 96, 64, 3
    frames = [
        (rng.integers(0, 256, (h, w)).astype(np.uint8),
         rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
         rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
        for _ in range(n)
    ]
    cfg = EncoderConfig(width=w, height=h, gop_n=n, base_qp=4, search="full")
    pk, _ = GopEngine(cfg).encode_gop(
        [Frame.from_planes(*f) for f in frames], 0)
    from video_encoder_tpu.codec import golden as g

    ref = None
    for t, f in enumerate(frames):
        cur = Frame.from_planes(*f)
        res = g.encode_frame(cfg, cur, ref, 0 if t == 0 else 1, 4)
        assert pk[t].payload == res.payload, f"frame {t} bytes differ"
        assert pk[t].payload_bits == res.payload_bits
        ref = res.recon


def test_hpel_refine_on_chip(rng):
    """v4 half-pel refinement through the Pallas sad_at_mv kernels vs the
    golden reference (SPEC.md §14.4) on the real chip."""
    from video_encoder_tpu.codec import golden
    from video_encoder_tpu.ops import dispatch

    h, w = 144, 208
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    ref = np.clip(np.roll(cur, (2, -3), (0, 1))
                  + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.int32)
    idy, idx_, _ = golden.sad_full_search(cur, ref)
    g = golden.sad_hpel_refine(cur, ref, idy, idx_)
    p = jax.jit(dispatch.hpel_refine)(
        jnp.asarray(cur), jnp.asarray(ref), jnp.asarray(idy),
        jnp.asarray(idx_))
    assert np.array_equal(g[0], np.asarray(p[0]))
    assert np.array_equal(g[1], np.asarray(p[1]))
    assert np.array_equal(g[2].astype(np.int64),
                          np.asarray(p[2]).astype(np.int64))


def test_v4_gop_stream_on_chip(rng):
    """Full v4 GOP (hpel ME + MC + v2 syntax + chunks pack) on the chip,
    byte-identical to the golden per-frame chain."""
    from video_encoder_tpu.codec import golden
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    w, h, n = 96, 64, 4
    base = rng.integers(0, 256, (2 * h + 96, 2 * w + 96)).astype(np.float64)
    for k in (1, 2, 4):
        base = (base + np.roll(base, k, 0) + np.roll(base, -k, 0)
                + np.roll(base, k, 1) + np.roll(base, -k, 1)) / 5
    base = ((base - base.min()) / (base.max() - base.min()) * 255).astype(np.int32)
    frames = []
    for t in range(n):
        y = base[16 + t : 16 + t + 2 * h : 2,
                 32 + 3 * t : 32 + 3 * t + 2 * w : 2].astype(np.uint8)
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 140, np.uint8)))
    cfg = EncoderConfig(width=w, height=h, gop_n=n, base_qp=22,
                        search="full", format_version=4)
    pk, _ = GopEngine(cfg).encode_gop([Frame.from_planes(*f) for f in frames], 0)
    ref = None
    for t, f in enumerate(frames):
        res = golden.encode_frame(cfg, Frame.from_planes(*f), ref,
                                  0 if t == 0 else 1, 22)
        assert pk[t].payload == res.payload, f"frame {t} bytes differ"
        ref = res.recon


def _smooth_clip(rng, w, h, n, slide=3):
    base = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, 2, 1)) // 4
    return [
        (base[2 * t : 2 * t + h, slide * t : slide * t + w].astype(np.uint8),
         np.full((h // 2, w // 2), 90 + t, np.uint8),
         np.full((h // 2, w // 2), 150, np.uint8))
        for t in range(n)
    ]


@pytest.mark.parametrize("w,h", [(96, 64), (320, 192), (352, 288),
                                 (416, 240), (640, 360)])
@pytest.mark.parametrize("qp,fmt", [(27, 1), (28, 1), (27, 4), (28, 4)])
def test_resolution_grid_on_chip(rng, w, h, qp, fmt):
    """The production default (emit='chunks') must compile and produce
    golden bytes at EVERY resolution class — the r4 regression window
    (~1024-4096 pieces: 320x192/352x288/416x240) OOM'd scoped VMEM
    through span_geometry's non-idempotent padding while the bench shapes
    dodged it (r4 verdict weak #1). qp 27/28 cover both block-word
    budgets (24/16); qp 20 shares qp 27's program (base_qp is traced,
    block_words is the only static)."""
    from video_encoder_tpu.codec import golden
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    n = 3
    frames = _smooth_clip(rng, w, h, n)
    cfg = EncoderConfig(width=w, height=h, gop_n=n, base_qp=qp,
                        search="full", format_version=fmt)
    eng = GopEngine(cfg)
    assert eng.emit == "chunks"  # the production default is what's tested
    pk, _ = eng.encode_gop([Frame.from_planes(*f) for f in frames], 0)
    ref = None
    for t, f in enumerate(frames):
        res = golden.encode_frame(cfg, Frame.from_planes(*f), ref,
                                  0 if t == 0 else 1, qp)
        assert pk[t].payload == res.payload, f"frame {t} bytes differ"
        assert pk[t].payload_bits == res.payload_bits
        ref = res.recon


def test_chunks_equals_frame_emit_on_chip(rng):
    """emit='chunks' (super_merge + host mux) vs emit='frame' (device
    tree_concat) byte equality ON THE CHIP at a mid-size shape."""
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    w, h, n = 320, 192, 3
    frames = [Frame.from_planes(*f) for f in _smooth_clip(rng, w, h, n)]
    cfg = EncoderConfig(width=w, height=h, gop_n=n, base_qp=27,
                        search="full")
    eng_c = GopEngine(cfg)
    eng_f = GopEngine(cfg)
    eng_f.emit = "frame"
    pk_c, _ = eng_c.encode_gop(frames, 0)
    pk_f, _ = eng_f.encode_gop(frames, 0)
    assert [p.to_bytes() for p in pk_c] == [p.to_bytes() for p in pk_f]


def test_full_search_pre_haloed_matches_scan(rng):
    """The tile path's Pallas ME on a pre-haloed reference (r4 verdict
    weak #4) vs the jnp scan twin, both on a shard-shaped slice with a
    real neighbor halo and on a boundary shard (edge-replicated halo)."""
    from video_encoder_tpu.ops import dispatch
    from video_encoder_tpu.parallel import tiles

    h_full, w = 256, 208
    full = rng.integers(0, 256, (h_full, w)).astype(np.int32)
    cur_full = np.clip(np.roll(full, (3, -5), (0, 1))
                       + rng.integers(-4, 5, (h_full, w)), 0, 255)
    hs = 128  # shard height
    for start in (0, hs):  # boundary (top) and interior/bottom shards
        cur = jnp.asarray(cur_full[start:start + hs])
        top = np.repeat(full[:1], 16, 0) if start == 0 else full[start - 16:start]
        bot = (np.repeat(full[-1:], 16, 0) if start + hs == h_full
               else full[start + hs:start + hs + 16])
        ref_ext = jnp.asarray(np.concatenate([top, full[start:start + hs], bot], 0))
        from video_encoder_tpu.ops.pallas import sad as psad

        kdy, kdx, ksad = jax.jit(psad.full_search_pre_haloed)(cur, ref_ext)
        dispatch.force("jnp")
        try:
            sdy, sdx, ssad = jax.jit(tiles._full_search_haloed)(cur, ref_ext)
        finally:
            dispatch.force(None)
        assert np.array_equal(np.asarray(kdy), np.asarray(sdy))
        assert np.array_equal(np.asarray(kdx), np.asarray(sdx))
        assert np.array_equal(np.asarray(ksad), np.asarray(ssad))


def test_full_search_sea_matches_exhaustive(rng):
    """SEA-pruned full search (TVC_SEA=1, r5) is bit-identical to the
    exhaustive kernel AND the jnp twin — on prunable panning content, on
    i.i.d. random content (zero pruning, the bound-overhead worst case),
    and under the G-batched vmap rule. The stats variant must agree too."""
    from video_encoder_tpu.ops.pallas import sad as psad

    h, w = 144, 208
    smooth = rng.integers(0, 256, (h + 16, w + 16)).astype(np.int32)
    for _ in range(2):
        smooth = (smooth + np.roll(smooth, 1, 0) + np.roll(smooth, 1, 1)) // 3
    cases = [
        (jnp.asarray(smooth[2:2 + h, 3:3 + w]), jnp.asarray(smooth[:h, :w])),
        (jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32),
         jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)),
    ]
    prev = os.environ.get("TVC_SEA")
    try:
        for cur, ref in cases:
            want = motion.full_search(cur, ref)
            os.environ["TVC_SEA"] = "1"
            got = psad.full_search(cur, ref)
            sdy, sdx, ssad, cnt = psad.full_search_sea_stats(cur, ref)
            os.environ["TVC_SEA"] = "0"
            for a, b in zip(want, got):
                assert np.array_equal(np.asarray(a), np.asarray(b))
            assert np.array_equal(np.asarray(want[0]), np.asarray(sdy))
            assert np.array_equal(np.asarray(want[1]), np.asarray(sdx))
            assert np.array_equal(np.asarray(want[2]), np.asarray(ssad))
            assert int(np.asarray(cnt).max()) <= 33
        # G-batched twin under vmap (the batched-GOP scan route)
        cg = jnp.stack([c for c, _ in cases])
        rg = jnp.stack([r for _, r in cases])
        os.environ["TVC_SEA"] = "1"
        bdy, bdx, bsad = jax.vmap(psad.full_search)(cg, rg)
        os.environ["TVC_SEA"] = "0"
        for g, (cur, ref) in enumerate(cases):
            want = motion.full_search(cur, ref)
            assert np.array_equal(np.asarray(want[0]), np.asarray(bdy[g]))
            assert np.array_equal(np.asarray(want[1]), np.asarray(bdx[g]))
            assert np.array_equal(np.asarray(want[2]), np.asarray(bsad[g]))
    finally:
        if prev is None:
            os.environ.pop("TVC_SEA", None)
        else:
            os.environ["TVC_SEA"] = prev


def test_merge_budget_overflow_isolated_on_chip(rng):
    """On-chip twin of tests/test_merge_budget_overflow.py (r4 verdict
    weak #7): a frame of dense-but-legal blocks trips the m>=64 merge
    width budget through the COMPILED chunk pack, the per-block budget
    stays clean, and the engine's worst-case rerun produces bytes equal
    to the golden engine."""
    from video_encoder_tpu.codec import entropy
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.ops.pallas import pack as ppack
    from video_encoder_tpu.pipeline.encoder import GoldenGopAdapter
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    nby, nbx, bw = 8, 8, 16

    def levels(shape):
        lv = np.zeros(shape + (64,), np.int32)
        mask = rng.random(shape + (64,)) < 0.55
        lv[mask] = rng.integers(1, 3, mask.sum()) * rng.choice(
            [-1, 1], mask.sum())
        return jnp.asarray(lv)

    ly, lc = levels((2 * nby, 2 * nbx)), levels((nby, nbx))
    qpd = jnp.zeros((nby, nbx), jnp.int32)
    dyz = jnp.zeros((nby, nbx), jnp.int32)
    isin = jnp.ones((nby, nbx), bool)

    vb, lb = entropy.block_symbols(ly)
    _, bbits, bovf = entropy.pack_dense(vb, lb, bw)
    assert int(np.asarray(bbits).max()) <= 32 * bw and not bool(bovf)

    _, _, _, ovf = jax.jit(entropy.pack_frame_chunks, static_argnums=8)(
        ly, lc, lc, qpd, True, isin, dyz, dyz, bw)
    assert bool(ovf), "dense frame must trip the merge budget on the chip"

    # engine level: i.i.d. noise at qp 30 (bw=16, budget bpp_w=4 binding)
    # floods the merge budget; the xl rerun must reproduce golden bytes
    w, h, n = 128, 128, 3
    frames = [Frame.from_planes(
        rng.integers(0, 256, (h, w)).astype(np.uint8),
        rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
        rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
        for _ in range(n)]
    cfg = EncoderConfig(width=w, height=h, gop_n=n, base_qp=30, search="full")
    eng = GopEngine(cfg)
    y = jnp.asarray(np.stack([f.y for f in frames]))
    cb = jnp.asarray(np.stack([f.cb for f in frames]))
    cr = jnp.asarray(np.stack([f.cr for f in frames]))
    outs = eng._run(y, cb, cr, 30, xl=False)
    assert bool(np.asarray(outs["ovf"]).any()), \
        "noise GOP must overflow the budgeted pack"
    pk, _ = eng.encode_gop(frames, 0)
    pk_g, _ = GoldenGopAdapter(cfg).encode_gop(frames, 0)
    assert [p.to_bytes() for p in pk] == [p.to_bytes() for p in pk_g]


def test_gop_batch_v4_chunks_on_chip(rng):
    """--gop-batch x --format 4 x emit=chunks compiled on the real chip
    (r4 verdict item 9's last open matrix cell): the lockstep two-GOP
    program with half-pel motion and span-string emission is byte-equal
    to per-GOP single encodes."""
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    w, h, t = 96, 64, 3
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=27,
                        search="full", format_version=4, chroma_qp_offset=2)

    def clip():
        base = rng.integers(0, 256, (h + 8, w + 8)).astype(np.int32)
        return [Frame.from_planes(
            np.clip(base[k:k + h, k:k + w]
                    + rng.integers(-2, 3, (h, w)), 0, 255).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for k in range(t)]

    gops = [clip(), clip()]
    eng = GopEngine(cfg)           # emit defaults to "chunks"
    assert eng.emit == "chunks"
    ref = [eng.encode_gop(g, i * t)[0] for i, g in enumerate(gops)]
    got = eng.encode_gops(gops, [0, t])
    for (gp, _), rp in zip(got, ref):
        assert [p.to_bytes() for p in gp] == [p.to_bytes() for p in rp]


def test_mc_pre_haloed_matches_jnp(rng):
    """Tile-path MC on a pre-haloed reference (r5: the jnp per-block
    gather was 14 of the 18.7 ms/frame tile shard) vs the jnp twin, luma
    and chroma, boundary and interior shards, 1-D (cols edge-replicate)
    geometry."""
    from video_encoder_tpu.ops.pallas import sad as psad
    from video_encoder_tpu.ops.transform import unblockify

    h_full, w = 256, 208
    full = rng.integers(0, 256, (h_full, w)).astype(np.int32)
    hs = 128
    for bs, r, kern in ((16, 16, psad.mc_fetch_plane_pre_haloed),
                        (8, 8, psad.mc_fetch_plane_chroma_pre_haloed)):
        hv, wv = hs // (16 // bs) if bs == 8 else hs, w // (16 // bs) if bs == 8 else w
        fullv = full[:h_full // (16 // bs) if bs == 8 else h_full, :wv]
        for start in (0, hv):
            nby, nbx = hv // bs, wv // bs
            dy = jnp.asarray(rng.integers(-r, r + 1, (nby, nbx)), jnp.int32)
            dx = jnp.asarray(rng.integers(-r, r + 1, (nby, nbx)), jnp.int32)
            top = (np.repeat(fullv[:1], r, 0) if start == 0
                   else fullv[start - r:start])
            bot = (np.repeat(fullv[-1:], r, 0) if start + hv >= fullv.shape[0]
                   else fullv[start + hv:start + hv + r])
            ref_ext = jnp.asarray(
                np.concatenate([top, fullv[start:start + hv], bot], 0))
            got = jax.jit(kern)(ref_ext, dy, dx)
            from video_encoder_tpu.ops import motion
            refpad = jnp.pad(ref_ext, ((0, 0), (r, r)), mode="edge")
            want = unblockify(motion.mc_fetch(refpad, dy, dx, bs, r))
            assert np.array_equal(np.asarray(got), np.asarray(want)), (bs, start)


def test_tile_encode_on_chip_equals_gop_engine(rng):
    """Full tile-shard ENCODE compiled on the chip (1-device 'tile' mesh:
    halo loopback == unsharded pad semantics) byte-equal to the GOP
    engine — pins the whole r5 tile stack (Pallas pre-haloed ME + MC,
    chunks emit, prediction-only cond) at stream level."""
    from jax.sharding import Mesh

    from video_encoder_tpu.codec import entropy
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.parallel import tiles
    from video_encoder_tpu.pipeline.gop_engine import (GopEngine,
                                                       _block_words_for_qp)

    w, h, t, qp = 96, 64, 3, 27
    base = rng.integers(0, 256, (h + 8, w + 8)).astype(np.int32)
    frames = [Frame.from_planes(
        np.clip(base[k:k + h, k:k + w] + rng.integers(-2, 3, (h, w)),
                0, 255).astype(np.uint8),
        rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
        rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
        for k in range(t)]
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=qp, search="full")
    ref_pk, _ = GopEngine(cfg).encode_gop(frames, 0)

    mesh = Mesh(np.array(jax.devices()[:1]), ("tile",))
    y = jnp.asarray(np.stack([f.y for f in frames]))
    cb = jnp.asarray(np.stack([f.cb for f in frames]))
    cr = jnp.asarray(np.stack([f.cr for f in frames]))
    n_mbs = (h // 16) * (w // 16)
    outs = tiles.encode_gop_tiled(
        y, cb, cr, qp, mesh=mesh, rc="none",
        block_words=_block_words_for_qp(qp),
        cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
        emit="chunks")
    wc = np.asarray(outs["words"])  # [1, T, C, cw]
    bc = np.asarray(outs["bits"])   # [1, T, C]
    for ti, p in enumerate(ref_pk):
        payload, nbits = tiles.bit_concat(
            [(wc[0, ti, c], int(bc[0, ti, c]))
             for c in range(bc.shape[2]) if bc[0, ti, c]])
        assert nbits == p.payload_bits and payload == p.payload, ti


def test_pre_haloed_2d_geometry_on_chip(rng):
    """2-D tile geometry (horizontal halo present: ref_ext is [h+2r, w+2r])
    for BOTH pre-haloed kernels — the r5 1-D tests left the wider-ref
    branch uncovered. vs the jnp twins on an interior shard."""
    from video_encoder_tpu.ops import motion
    from video_encoder_tpu.ops.pallas import sad as psad
    from video_encoder_tpu.ops.transform import blockify, unblockify
    from video_encoder_tpu.parallel import tiles

    r = 16
    hs, ws = 128, 208
    full = rng.integers(0, 256, (hs + 2 * r, ws + 2 * r)).astype(np.int32)
    ref_ext = jnp.asarray(full)  # interior shard: all halo rows/cols real
    cur = jnp.asarray(np.clip(
        np.roll(full[r:-r, r:-r], (3, -5), (0, 1))
        + rng.integers(-4, 5, (hs, ws)), 0, 255), jnp.int32)

    # full search, 2-D branch
    kdy, kdx, ksad = jax.jit(psad.full_search_pre_haloed)(cur, ref_ext)
    from video_encoder_tpu.ops import dispatch
    dispatch.force("jnp")
    try:
        sdy, sdx, ssad = jax.jit(tiles._full_search_haloed)(cur, ref_ext)
    finally:
        dispatch.force(None)
    assert np.array_equal(np.asarray(kdy), np.asarray(sdy))
    assert np.array_equal(np.asarray(kdx), np.asarray(sdx))
    assert np.array_equal(np.asarray(ksad), np.asarray(ssad))

    # MC, 2-D branch (ref wider than the mv grid * bs)
    nby, nbx = hs // 16, ws // 16
    dy = jnp.asarray(rng.integers(-r, r + 1, (nby, nbx)), jnp.int32)
    dx = jnp.asarray(rng.integers(-r, r + 1, (nby, nbx)), jnp.int32)
    got = jax.jit(psad.mc_fetch_plane_pre_haloed)(ref_ext, dy, dx)
    want = unblockify(motion.mc_fetch(ref_ext, dy, dx, 16, r))
    assert np.array_equal(np.asarray(got), np.asarray(want))
