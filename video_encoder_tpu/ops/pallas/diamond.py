"""Fused diamond-search Pallas kernel (reference component C7; SPEC.md §9).

The whole masked fixed-budget diamond search runs inside one kernel per
4×8-MB tile: the reference window is DMA'd to VMEM once, and each step
extracts one 20×20 halo region around the MB's current center (rotated-copy
row alignment + one dynamic lane roll), from which all five large-diamond
candidates are static slices. Early exit is the SPMD early-freeze of the
jnp/golden version — bit-exact with golden.sad_diamond_search.

Per-MB per-step work ≈ one [24, 256] roll + 5 × 400-px SADs; ~60× less data
movement than calling the generic sad_at_mv kernel per candidate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codec import spec

R = spec.SEARCH_R           # 16
MB = spec.MB                # 16
TM, TN = 4, 8
TH, TW = TM * MB, TN * MB   # 64 x 128
PAD = R + 2                 # region reaches 2 px past the search radius
WH = TH + 2 * PAD           # 100 ...
WH = -(-WH // 8) * 8        # ... padded to 104 sublanes
WWA = TW + 128              # lane-aligned window width (>= TW + 2*PAD + 4)
REG = 24                    # rows taken per region slice (>= 20, mult of 8)
BIG = 1 << 28  # plain int: jnp scalars at module scope become captured consts

LARGE = ((-2, 0), (0, -2), (0, 2), (2, 0))
SMALL = ((-1, 0), (0, -1), (0, 1), (1, 0))


def _diamond_kernel(refpad_hbm, cur_ref, sad_ref, dy_ref, dx_ref, win, rots, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        refpad_hbm.at[pl.ds(i * TH, WH), pl.ds(j * TW, WWA)], win, sem
    )
    dma.start()
    dma.wait()
    w0 = win[:]
    for r in range(8):
        rots[r] = pltpu.roll(w0, (WH - r) % WH, 0)

    def region(my, mx, dy, dx):
        """[20, 20] window rows/cols around center (dy, dx) of MB (my, mx):
        region[2+oy : 18+oy, 2+ox : 18+ox] is the candidate at offset (oy, ox)."""
        row = my * MB + dy + PAD - 2
        col = mx * MB + dx + PAD - 2
        r = jax.lax.rem(row, 8)
        q8 = pl.multiple_of(row - r, 8)
        strip = rots[r, pl.ds(q8, REG), :]
        rolled = pltpu.roll(strip, (WWA - col) % WWA, 1)
        return jax.lax.slice(rolled, (0, 0), (20, 20))

    def cand_sad(reg, cur, oy, ox):
        cand = jax.lax.slice(reg, (2 + oy, 2 + ox), (18 + oy, 18 + ox))
        return jnp.abs(cur - cand).sum()

    def eval_step(my, mx, cur, dy, dx, cost, offsets):
        """First-min over [center, offsets...] with window-bound masking."""
        reg = region(my, mx, dy, dx)
        bdy, bdx, bcost = dy, dx, cost
        for oy, ox in offsets:
            ndy, ndx = dy + oy, dx + ox
            valid = (jnp.abs(ndy) <= R) & (jnp.abs(ndx) <= R)
            c = jnp.where(valid, cand_sad(reg, cur, oy, ox), jnp.int32(BIG))
            better = c < bcost
            bdy = jnp.where(better, ndy, bdy)
            bdx = jnp.where(better, ndx, bdx)
            bcost = jnp.where(better, c, bcost)
        return bdy, bdx, bcost

    def one_mb(my, mx):
        cur = cur_ref[my * MB : (my + 1) * MB, mx * MB : (mx + 1) * MB]
        dy = jnp.int32(0)
        dx = jnp.int32(0)
        reg0 = region(my, mx, dy, dx)
        cost = cand_sad(reg0, cur, 0, 0)
        frozen = cost < spec.DIAMOND_EARLY_SAD

        # true per-MB early exit: golden's frozen mask never unfreezes, so a
        # while_loop that stops at the first freeze is step-for-step identical
        def cond(st):
            step, _, _, _, frozen = st
            return (~frozen) & (step < spec.DIAMOND_MAX_STEPS)

        def body(st):
            step, dy, dx, cost, _ = st
            ndy, ndx, ncost = eval_step(my, mx, cur, dy, dx, cost, LARGE)
            moved = (ndy != dy) | (ndx != dx)
            nfrozen = ~moved | (ncost < spec.DIAMOND_EARLY_SAD)
            return step + 1, ndy, ndx, ncost, nfrozen

        _, dy, dx, cost, frozen = jax.lax.while_loop(
            cond, body, (jnp.int32(0), dy, dx, cost, frozen)
        )
        dy, dx, cost = eval_step(my, mx, cur, dy, dx, cost, SMALL)
        return dy, dx, cost

    sad_acc = jnp.zeros((TM, TN), jnp.int32)
    dy_acc = jnp.zeros((TM, TN), jnp.int32)
    dx_acc = jnp.zeros((TM, TN), jnp.int32)
    for my in range(TM):
        for mx in range(TN):
            dy, dx, cost = one_mb(my, mx)
            onehot = (
                (jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0) == my)
                & (jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) == mx)
            ).astype(jnp.int32)
            sad_acc = sad_acc + onehot * cost
            dy_acc = dy_acc + onehot * dy
            dx_acc = dx_acc + onehot * dx
    sad_ref[0, 0] = sad_acc
    dy_ref[0, 0] = dy_acc
    dx_ref[0, 0] = dx_acc


def _refine_kernel(refpad_hbm, cur_ref, cdy_ref, cdx_ref,
                   sad_ref, dy_ref, dx_ref, win, rots, sem):
    """Hier refinement (SPEC.md §9): HIER_REFINE_STEPS chained ±2 sweeps
    around per-MB centers. Same region machinery as the diamond kernel —
    one [20, 20] VMEM region per MB per step, 25 static slice-SADs."""
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(
        refpad_hbm.at[pl.ds(i * TH, WH), pl.ds(j * TW, WWA)], win, sem
    )
    dma.start()
    dma.wait()
    w0 = win[:]
    for r in range(8):
        rots[r] = pltpu.roll(w0, (WH - r) % WH, 0)

    def region(my, mx, dy, dx):
        row = my * MB + dy + PAD - 2
        col = mx * MB + dx + PAD - 2
        r = jax.lax.rem(row, 8)
        q8 = pl.multiple_of(row - r, 8)
        strip = rots[r, pl.ds(q8, REG), :]
        rolled = pltpu.roll(strip, (WWA - col) % WWA, 1)
        return jax.lax.slice(rolled, (0, 0), (20, 20))

    def cand_sad(reg, cur, oy, ox):
        cand = jax.lax.slice(reg, (2 + oy, 2 + ox), (18 + oy, 18 + ox))
        return jnp.abs(cur - cand).sum()

    rr = spec.HIER_REFINE_R
    sad_acc = jnp.zeros((TM, TN), jnp.int32)
    dy_acc = jnp.zeros((TM, TN), jnp.int32)
    dx_acc = jnp.zeros((TM, TN), jnp.int32)
    for my in range(TM):
        for mx in range(TN):
            cur = cur_ref[my * MB : (my + 1) * MB, mx * MB : (mx + 1) * MB]
            dy = cdy_ref[0, 0, my, mx]
            dx = cdx_ref[0, 0, my, mx]
            cost = jnp.int32(BIG)
            for _ in range(spec.HIER_REFINE_STEPS):
                reg = region(my, mx, dy, dx)
                bdy, bdx, bcost = dy, dx, jnp.int32(BIG)
                for u in range(-rr, rr + 1):      # (u, v) row-major:
                    for v in range(-rr, rr + 1):  # strict-< == first-min
                        ndy, ndx = dy + u, dx + v
                        valid = (jnp.abs(ndy) <= R) & (jnp.abs(ndx) <= R)
                        c = jnp.where(
                            valid, cand_sad(reg, cur, u, v), jnp.int32(BIG)
                        )
                        better = c < bcost
                        bdy = jnp.where(better, ndy, bdy)
                        bdx = jnp.where(better, ndx, bdx)
                        bcost = jnp.where(better, c, bcost)
                dy, dx, cost = bdy, bdx, bcost
            onehot = (
                (jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0) == my)
                & (jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) == mx)
            ).astype(jnp.int32)
            sad_acc = sad_acc + onehot * cost
            dy_acc = dy_acc + onehot * dy
            dx_acc = dx_acc + onehot * dx
    sad_ref[0, 0] = sad_acc
    dy_ref[0, 0] = dy_acc
    dx_ref[0, 0] = dx_acc


@jax.jit
def hier_refine(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                cdy: jnp.ndarray, cdx: jnp.ndarray):
    """Chained ±2 refinement around per-MB centers (cdy, cdx); returns
    (dy, dx, sad) per MB. Bit-exact with the refine loop of
    motion.hier_search (same candidate order and masking)."""
    h, w = cur_y.shape
    nby, nbx = h // MB, w // MB
    gy = -(-nby // TM) * TM
    gx = -(-nbx // TN) * TN
    hp, wp = gy * MB, gx * MB
    cur_p = jnp.pad(cur_y, ((0, hp - h), (0, wp - w)))
    ref_p = jnp.pad(ref_y, ((0, hp - h), (0, wp - w)), mode="edge")
    refpad = jnp.pad(
        ref_p, ((PAD, WH - TH - PAD), (PAD, WWA - TW - PAD)), mode="edge"
    )

    def to_tiles(a):
        a = jnp.pad(a, ((0, gy - nby), (0, gx - nbx)))
        return (a.reshape(gy // TM, TM, gx // TN, TN)
                 .transpose(0, 2, 1, 3))

    spec_mb = pl.BlockSpec((1, 1, TM, TN), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    sad, dy, dx = pl.pallas_call(
        _refine_kernel,
        grid=(gy // TM, gx // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            spec_mb,
            spec_mb,
        ],
        out_specs=[spec_mb, spec_mb, spec_mb],
        out_shape=[
            jax.ShapeDtypeStruct((gy // TM, gx // TN, TM, TN), jnp.int32)
            for _ in range(3)
        ],
        scratch_shapes=[
            pltpu.VMEM((WH, WWA), jnp.int32),
            pltpu.VMEM((8, WH, WWA), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(refpad, cur_p, to_tiles(cdy), to_tiles(cdx))

    def untile(a):
        return a.transpose(0, 2, 1, 3).reshape(gy, gx)[:nby, :nbx]

    return untile(dy), untile(dx), untile(sad)


@jax.jit
def diamond_search(cur_y: jnp.ndarray, ref_y: jnp.ndarray):
    """Same contract as motion.diamond_search: (dy, dx, best_sad) per MB."""
    h, w = cur_y.shape
    nby, nbx = h // MB, w // MB
    gy = -(-nby // TM) * TM
    gx = -(-nbx // TN) * TN
    hp, wp = gy * MB, gx * MB
    cur_p = jnp.pad(cur_y, ((0, hp - h), (0, wp - w)))
    ref_p = jnp.pad(ref_y, ((0, hp - h), (0, wp - w)), mode="edge")
    refpad = jnp.pad(
        ref_p, ((PAD, WH - TH - PAD), (PAD, WWA - TW - PAD)), mode="edge"
    )

    spec_mb = pl.BlockSpec((1, 1, TM, TN), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    sad, dy, dx = pl.pallas_call(
        _diamond_kernel,
        grid=(gy // TM, gx // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec_mb, spec_mb, spec_mb],
        out_shape=[
            jax.ShapeDtypeStruct((gy // TM, gx // TN, TM, TN), jnp.int32)
            for _ in range(3)
        ],
        scratch_shapes=[
            pltpu.VMEM((WH, WWA), jnp.int32),
            pltpu.VMEM((8, WH, WWA), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(refpad, cur_p)

    def untile(a):
        return a.transpose(0, 2, 1, 3).reshape(gy, gx)[:nby, :nbx]

    return untile(dy), untile(dx), untile(sad)
