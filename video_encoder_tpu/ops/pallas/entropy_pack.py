"""Fused Pallas symbols+pack kernel — one VMEM pass from zigzag levels to
per-8x8-block bit strings (reference component C12; SURVEY.md §7.0
"entropy coding as two-pass parallel pack").

Why this kernel exists (r3 VERDICT item 1), with the r4 measured truth:
the XLA path materializes [blocks, 130] uint32+int32 symbol tables in HBM
(~50 MB/frame at 1080p) and streams them through pack_dense's compare-
select; this kernel computes symbols AND packs without leaving VMEM
(HBM sees the [n, 64] int16 levels once, ~8 MB/frame). Measured end to
end it is PERF-NEUTRAL on its own (10.55 vs 10.51 ms/frame,
tools/check_fused_pack_results.json) — the r3 "pack = 5.2 ms" DCE
attribution turned out to be 2.4 ms of tree_concat (fixed separately:
ops/pallas/pack.py super_merge) plus ~2.7 ms split across this stage's
predecessor relayout, the symbol work this kernel absorbs, and the
headers — see tools/exp_pack_parts_results.json for the decomposition.
The kernel still earns its place: it removes the ~50 MB/frame HBM
symbol-table footprint (capacity headroom for GOP batching), halves the
levels transport (int16), and is the prerequisite for the per-block
word-budget pack the chunk path builds on.

Bit-exactness: the kernel reproduces entropy.block_symbols(_v2) +
entropy.pack_dense symbol-for-symbol (same ue/se codes, same slot order,
same MSB-first two-word scatter); equality is asserted against the jnp
pair in tests/test_entropy_pack_kernel.py (interpret mode, every syntax)
and on the real chip in tests/test_tpu_kernels.py.

Kernel shape rules (see /opt/skills/guides/pallas_guide.md and the r3
mosaic notes): blocks ride the sublane axis (BT per tile), the 64 zigzag
positions ride the lane axis — so runs/offsets need lane-axis cummax/
cumsum, built from log-step pltpu.roll with iota masks (no lane reshapes,
no gathers, no scatters anywhere). The run/level interleave that forced a
[*, 128] lane reshape in the jnp path disappears algebraically: with
combined per-position length cl = run_len + lev_len, the run symbol sits
at header + excl_cumsum(cl) and the level right after it — two [BT, 64]
symbol planes with computed offsets instead of one interleaved [BT, 128]
plane. bitlen uses compare-sums (values here are < 2^15; lax.clz is not
in the mosaic op set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 256          # blocks per kernel tile (sublane axis)
_BITLEN_MAX = 15  # all kernel symbol values are < 2^15 (see docstring)


def _bitlen(x):
    """floor(log2(x)) + 1 for 1 <= x < 2**_BITLEN_MAX, 0 for x == 0.

    Float-exponent form (r5): int->f32 is exact below 2^24, so the IEEE
    exponent field IS floor(log2)+1 after bias removal — 3 VPU ops vs the
    15 compare-adds of the r4 version (equal on the whole domain,
    tests/test_entropy_pack_kernel.py runs every symbol path)."""
    e = (pltpu.bitcast(x.astype(jnp.float32), jnp.int32) >> 23) - 126
    return jnp.where(x > 0, e, 0)


def _ue(v):
    """(value, length) of ue(v): value = v+1 in 2*bitlen(v+1)-1 bits."""
    vp1 = v + 1
    return vp1.astype(jnp.uint32), 2 * _bitlen(vp1) - 1


def _se(v):
    """(value, length) of se(v) = ue(2v-1 if v>0 else -2v)."""
    return _ue(jnp.where(v > 0, 2 * v - 1, -2 * v))


def _lane_shift_right(x, d: int, fill):
    """out[:, i] = x[:, i-d] for i >= d, else fill (non-circular)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanes >= d, pltpu.roll(x, d, 1), fill)


def _lane_cummax(x, fill):
    """Inclusive cummax along lanes, log-step rolls."""
    d = 1
    while d < x.shape[1]:
        x = jnp.maximum(x, _lane_shift_right(x, d, fill))
        d *= 2
    return x


def _lane_cumsum_excl(x):
    """Exclusive cumsum along lanes, log-step rolls."""
    incl = x
    d = 1
    while d < x.shape[1]:
        incl = incl + _lane_shift_right(incl, d, 0)
        d *= 2
    return incl - x


def _contrib(val, length, off, live):
    """MSB-first two-word scatter pieces for one symbol plane: returns
    (w1, c1, c2) with word w1 += c1, word w1+1 += c2. Identical math to
    entropy.pack_dense (disjoint bit ranges make add equal to or)."""
    s = off & 31
    fits = (s + length) <= 32
    sh1 = jnp.clip(jnp.where(fits, 32 - s - length, length - (32 - s)), 0, 31)
    sh1 = sh1.astype(jnp.uint32)
    c1 = jnp.where(fits, val << sh1, val >> sh1)
    sh2 = jnp.clip(64 - s - length, 0, 31).astype(jnp.uint32)
    c2 = jnp.where(fits, jnp.uint32(0), val << sh2)
    c1 = jnp.where(live, c1, 0)
    c2 = jnp.where(live & ~fits, c2, 0)
    return off >> 5, c1, c2


def _make_block_pack_kernel(fmt: int, n_words: int, batched: bool):
    """Kernel body: [BT, 64] zigzag levels (+ [BT, 1] dc_pred for fmt>=2)
    -> [BT, n_words] uint32 strings + [BT, 1] bit counts."""

    def kernel(lv_ref, dcp_ref, out_w_ref, out_b_ref):
        # int16 operands: |level| <= 3925 (SPEC.md §4 range proof), so
        # int16 transport halves the kernel's HBM reads AND the XLA
        # scoped-vmem footprint when the call sits inside the I/P cond
        # (a bw=24 1080p program OOM'd the 16 MB scoped limit with int32
        # operands — axon compile log, r4)
        lv = (lv_ref[0] if batched else lv_ref[:]).astype(jnp.int32)
        idx = jax.lax.broadcasted_iota(jnp.int32, lv.shape, 1)

        if fmt >= 2:
            # v2/v3 block syntax (SPEC.md §12.4-12.5): cbf, se(dc - pred),
            # ue(nnz_ac), then (run, level) over AC positions 1..63 with
            # runs counted from position 1.
            dcp = (dcp_ref[0] if batched else dcp_ref[:]).astype(jnp.int32)
            is_coef = idx >= 1
            nz = (lv != 0) & is_coef
            dc = jnp.sum(jnp.where(idx == 0, lv, 0), axis=1, keepdims=True)
            pos = idx - 1                                  # AC position
            nnz = jnp.sum(nz.astype(jnp.int32), axis=1, keepdims=True)
            cbf = (dc != 0) | (nnz > 0)
            dcd_val, dcd_len = _se(dc - dcp)
            dcd_len = jnp.where(cbf, dcd_len, 0)
            nnz_val, nnz_len = _ue(nnz)
            nnz_len = jnp.where(cbf, nnz_len, 0)
            head_planes = [
                (cbf.astype(jnp.uint32), jnp.ones_like(nnz),
                 jnp.zeros_like(nnz), jnp.ones_like(cbf)),
                (dcd_val, dcd_len, jnp.ones_like(nnz), cbf),
                (nnz_val, nnz_len, 1 + dcd_len, cbf),
            ]
            header_len = 1 + dcd_len + nnz_len
        else:
            # v1 block syntax (SPEC.md §6): cbf, ue(nnz-1), then (run,
            # level) over all 64 zigzag positions.
            nz = lv != 0
            pos = idx
            nnz = jnp.sum(nz.astype(jnp.int32), axis=1, keepdims=True)
            cbf = nnz > 0
            nnz_val, nnz_len = _ue(jnp.maximum(nnz - 1, 0))
            nnz_len = jnp.where(cbf, nnz_len, 0)
            head_planes = [
                (cbf.astype(jnp.uint32), jnp.ones_like(nnz),
                 jnp.zeros_like(nnz), jnp.ones_like(cbf)),
                (nnz_val, nnz_len, jnp.ones_like(nnz), cbf),
            ]
            header_len = 1 + nnz_len

        # runs: distance to the previous nonzero coefficient position
        prev = _lane_shift_right(
            _lane_cummax(jnp.where(nz, pos, -1), -1), 1, -1
        )
        run = pos - prev - 1
        run_val, run_len = _ue(jnp.where(nz, run, 0))
        lev_val, lev_len = _se(lv)
        run_len = jnp.where(nz, run_len, 0)
        lev_len = jnp.where(nz, lev_len, 0)

        # interleaved (run, level) offsets without a lane interleave
        cl = run_len + lev_len
        coff = header_len + _lane_cumsum_excl(cl)
        bits = header_len + jnp.sum(cl, axis=1, keepdims=True)

        planes = head_planes + [
            (run_val, run_len, coff, nz),
            (lev_val, lev_len, coff + run_len, nz),
        ]
        # mosaic has no unsigned reductions: bitcast the uint32 pieces to
        # int32 for the masked sums (disjoint bit ranges make the adds
        # carry-free, so the bit pattern is identical) and bitcast back
        contribs = [
            (w1, pltpu.bitcast(c1, jnp.int32), pltpu.bitcast(c2, jnp.int32))
            for (w1, c1, c2) in (
                _contrib(v, l, o, live) for (v, l, o, live) in planes
            )
        ]
        # Word assembly as a fori_loop (NOT a python unroll): mosaic keeps
        # every unrolled iteration's [BT, 64] masked-sum temporaries live,
        # which cost ~53 MB of scoped VMEM at the worst-case W=78 (compile
        # failure, r4) — the loop carry bounds it at O(one iteration). The
        # bound is data-dependent: no symbol reaches past the tile's
        # largest bit count, so iterate to ceil(max bits / 32) + 1 words
        # instead of the capacity width (typical blocks fill ~4 of 16).
        lanes_w = jax.lax.broadcasted_iota(jnp.int32, (lv.shape[0], n_words), 1)

        def wbody(w, acc):
            # sum the planes' masked contributions FIRST (cheap elementwise
            # adds on disjoint-bit patterns), then ONE cross-lane reduction
            # — the per-plane jnp.sum version paid a log-step reduction
            # chain per plane per word (measured ~2 ms/frame at 4K, r5).
            # Header planes are [BT, 1]: accumulated directly (a shared
            # [BT, 64] accumulator would broadcast them 64x).
            col = jnp.zeros((lv.shape[0], 1), jnp.int32)
            sel = None
            for w1, c1, c2 in contribs:
                a = jnp.where(w1 == w, c1, 0) + jnp.where(w1 + 1 == w, c2, 0)
                if a.shape[1] == 1:
                    col = col + a
                else:
                    sel = a if sel is None else sel + a
            if sel is not None:
                col = col + jnp.sum(sel, axis=1, keepdims=True)
            return jnp.where(lanes_w == w, col, acc)

        n_dyn = jnp.minimum(((jnp.max(bits) + 63) >> 5) + 1, n_words)
        words = pltpu.bitcast(
            jax.lax.fori_loop(
                0, n_dyn, wbody, jnp.zeros((lv.shape[0], n_words), jnp.int32)
            ),
            jnp.uint32,
        )
        if batched:
            out_w_ref[0] = words
            out_b_ref[0] = bits
        else:
            out_w_ref[:] = words
            out_b_ref[:] = bits

    return kernel


@functools.lru_cache(maxsize=32)
def _block_pack_call(n_tiles: int, fmt: int, n_words: int,
                     interpret: bool = False):
    kernel = _make_block_pack_kernel(fmt, n_words, batched=False)

    def call(lv, dcp):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((BT, 64), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BT, n_words), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * BT, n_words), jnp.uint32),
                jax.ShapeDtypeStruct((n_tiles * BT, 1), jnp.int32),
            ],
            interpret=interpret,
        )(lv, dcp)

    return call


def _block_pack_impl(levels_zz, dc_pred, fmt: int, n_words: int,
                     interpret: bool = False):
    n = levels_zz.shape[0]
    n2 = -(-n // BT) * BT
    if n2 != n:
        levels_zz = jnp.pad(levels_zz, ((0, n2 - n), (0, 0)))
        dc_pred = jnp.pad(dc_pred, ((0, n2 - n), (0, 0)))
    lv = levels_zz.astype(jnp.int16)
    dcp = dc_pred.astype(jnp.int16)
    # Keep each pallas call's output under ~4 MB: XLA may stack-allocate a
    # call's buffers in the 16 MB scoped-VMEM budget, and the worst-case
    # word budget (the xl rerun, n_words = 78) overflowed it at 1080p
    # scale (axon compile log, r4). Chunking the block axis bounds every
    # call's scope; blocks are independent so the split is free.
    max_out = 4 << 20
    if n2 * n_words * 4 > max_out:
        step = max((max_out // (n_words * 4)) // BT, 1) * BT
        parts = [
            _block_pack_call(min(step, n2 - s0) // BT, fmt, n_words,
                             interpret)(lv[s0:s0 + step], dcp[s0:s0 + step])
            for s0 in range(0, n2, step)
        ]
        words = jnp.concatenate([p[0] for p in parts])
        bits = jnp.concatenate([p[1] for p in parts])
    else:
        words, bits = _block_pack_call(n2 // BT, fmt, n_words, interpret)(
            lv, dcp
        )
    return words[:n], bits[:n, 0]


@functools.lru_cache(maxsize=16)
def _block_pack_public(fmt: int, n_words: int):
    @jax.custom_batching.custom_vmap
    def fn(levels_zz, dc_pred):
        return _block_pack_impl(levels_zz, dc_pred, fmt, n_words)

    @fn.def_vmap
    def _rule(axis_size, in_batched, levels_zz, dc_pred):
        # blocks are independent: fold the batch (GOP) axis into the block
        # axis — same trick as pack.chunk_merge's rule
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        levels_zz, dc_pred = (bc(x, b) for x, b in
                              zip((levels_zz, dc_pred), in_batched))
        g, n, _ = levels_zz.shape
        w, b = _block_pack_impl(
            levels_zz.reshape(g * n, 64), dc_pred.reshape(g * n, 1),
            fmt, n_words,
        )
        return (w.reshape(g, n, n_words), b.reshape(g, n)), (True, True)

    return fn


def block_pack(levels_zz: jnp.ndarray, dc_pred: jnp.ndarray | None,
               fmt: int, n_words: int):
    """Pack each 8x8 block's levels into its own bit string, fused in VMEM.

    levels_zz: [n, 64] int32 zigzag-order levels; dc_pred: [n] int32 DC
    predictors (fmt >= 2 only; ignored for fmt 1). Returns (words
    [n, n_words] uint32 MSB-first strings, bits [n] int32). Bit-exact with
    entropy.block_symbols(_v2) + entropy.pack_dense. NOTE: like pack_dense,
    a block whose string exceeds n_words*32 bits is silently truncated —
    callers detect overflow from the returned bit counts.
    """
    if dc_pred is None:
        dc_pred = jnp.zeros((levels_zz.shape[0],), jnp.int32)
    return _block_pack_public(fmt, n_words)(
        levels_zz, dc_pred.reshape(-1, 1)
    )
