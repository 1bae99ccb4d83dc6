"""Adversarial merge-budget overflow coverage (r4 verdict weak #7: the
only overflow test ran at qp=4 where _block_words_for_qp picks
BLOCK_WORDS_MAX and _merge_budget(w) == w disables budgeting entirely —
the budget's detection had never been proven to fire where it binds).

These tests construct >=64 consecutive DENSE pieces at budgeted widths
(bw=16/24, qp>=20 class) that individually fit their block budget but
whose >=64-piece span exceeds the bpp_w intermediate width, and assert:
the ovf flag fires, it is the MERGE budget (not the per-block budget)
that fired, and the worst-case rerun is byte-exact vs the unbudgeted
golden concat. Interpret-mode here; the on-chip twin is
tests/test_tpu_kernels.py::test_merge_budget_overflow_isolated_on_chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from video_encoder_tpu.codec import entropy
from video_encoder_tpu.ops.pallas import pack as ppack


def _piece_strings(rng, n, w, bits_per_piece):
    """Valid MSB-first piece strings with the given bit counts."""
    bits = np.full(n, bits_per_piece, np.int32)
    words = np.zeros((n, w), np.uint32)
    for i in range(n):
        nwords = (int(bits[i]) + 31) // 32
        vals = rng.integers(0, 2**32, nwords, dtype=np.uint64).astype(np.uint32)
        tail = int(bits[i]) & 31
        if nwords and tail:
            vals[-1] &= np.uint32(0xFFFFFFFF) << (32 - tail)
        words[i, :nwords] = vals
    return jnp.asarray(words), jnp.asarray(bits)


def test_super_merge_budget_overflow_fires_and_rerun_matches(rng):
    """Dense 300-bit pieces at w=16 (block budget 512 bits: no per-block
    overflow) overflow the m>=64 intermediate widths (bpp_w=4 ->
    128-piece level budget 513 words = 16416 bits < 128*300); sparse
    64-bit pieces do not, and their budgeted strings equal tree_concat."""
    n, w = 1024, 16
    assert ppack._merge_budget(w) == 4

    dense_w, dense_b = _piece_strings(rng, n, w, 300)
    with pltpu.force_tpu_interpret_mode():
        _, _, ovf = ppack.super_merge(dense_w, dense_b)
    assert bool(ovf), "merge budget must detect the dense span"

    sparse_w, sparse_b = _piece_strings(rng, n, w, 64)
    with pltpu.force_tpu_interpret_mode():
        sw, sb, ovf2 = ppack.super_merge(sparse_w, sparse_b)
    assert not bool(ovf2)
    n2, h, cw, n_strings = ppack.span_geometry(n, w)
    want_w = []
    for s in range(n_strings):
        tw_, tb_ = entropy.tree_concat(
            sparse_w[s * h:(s + 1) * h], sparse_b[s * h:(s + 1) * h],
            sw.shape[1],
        )
        assert int(tb_) == int(sb[s])
        want_w.append(np.asarray(tw_))
    assert np.array_equal(np.stack(want_w), np.asarray(sw))


def test_pack_frame_chunks_overflow_isolated_to_merge_budget(rng, monkeypatch):
    """A frame of dense-but-legal blocks through the REAL chunk pack:
    every block fits its 16-word budget, yet ovf fires — and flipping
    _merge_budget to the identity makes it stop, isolating the cause to
    the merge budget. The worst-case rerun (BLOCK_WORDS_MAX, budget
    disabled) is byte-exact vs the golden tree_concat assembly."""
    from video_encoder_tpu.ops import dispatch

    nby, nbx, bw = 8, 8, 16
    n_mbs = nby * nbx
    # ~36 nonzero +-1..2 levels/block: ~250-350 bits, < 512 (no block ovf)
    def levels(shape):
        lv = np.zeros(shape + (64,), np.int32)
        mask = rng.random(shape + (64,)) < 0.55
        lv[mask] = rng.integers(1, 3, mask.sum()) * rng.choice(
            [-1, 1], mask.sum())
        return jnp.asarray(lv)

    ly = levels((2 * nby, 2 * nbx))
    lc = levels((nby, nbx))
    qpd = jnp.zeros((nby, nbx), jnp.int32)
    dy = jnp.zeros((nby, nbx), jnp.int32)
    isin = jnp.ones((nby, nbx), bool)

    # precondition: blocks fit their budget individually
    vb, lb = entropy.block_symbols(ly)
    _, bbits, bovf = entropy.pack_dense(vb, lb, bw)
    assert int(np.asarray(bbits).max()) <= 32 * bw and not bool(bovf)
    assert int(np.asarray(bbits).mean()) * 8 > 32 * ppack._merge_budget(bw) * 8

    def fresh_pack():
        # jit's executable cache keys on the WRAPPED function object: a
        # fresh def per variant, or the budget flip below is silently
        # ignored (the r3 measurement-artifact lesson, again)
        def f(a, b, c, d, e, f_, g, h, i):
            return entropy.pack_frame_chunks(a, b, c, d, e, f_, g, h, i)
        return jax.jit(f, static_argnums=8)

    dispatch.force("pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            cw_, cb_, _, ovf = fresh_pack()(
                ly, lc, lc, qpd, True, isin, dy, dy, bw)
        assert bool(ovf), "dense frame must trip the merge budget"

        # same frame, budget neutralized -> no overflow: the MERGE budget
        # (not the per-block pack) is what fired
        monkeypatch.setattr(ppack, "_merge_budget", lambda w: w)
        ppack._mb_stage1_call.cache_clear()
        ppack._reduce_call.cache_clear()
        with pltpu.force_tpu_interpret_mode():
            cw2, cb2, _, ovf2 = fresh_pack()(
                ly, lc, lc, qpd, True, isin, dy, dy, bw)
        assert not bool(ovf2)
    finally:
        dispatch.force(None)
        ppack._mb_stage1_call.cache_clear()
        ppack._reduce_call.cache_clear()

    # rerun equivalence: the unbudgeted strings equal the golden assembly
    pw, pb, _, _ = entropy._frame_pieces(ly, lc, lc, qpd, True, isin,
                                         dy, dy, bw)
    n = n_mbs * 8
    n2, h, cwcap, n_strings = ppack.span_geometry(n, bw)
    pw = jnp.pad(pw.reshape(n, bw), ((0, n2 - n), (0, 0)))
    pbf = jnp.pad(pb.reshape(n), (0, n2 - n))
    for s in range(n_strings):
        tw_, tb_ = entropy.tree_concat(
            pw[s * h:(s + 1) * h], pbf[s * h:(s + 1) * h], cw2.shape[1])
        assert int(tb_) == int(cb2[s])
        assert np.array_equal(np.asarray(tw_), np.asarray(cw2[s]))
