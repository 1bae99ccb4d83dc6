"""Pallas TPU kernels for SAD motion search and motion compensation
(reference components C5–C8, SURVEY.md §2; SPEC.md §9).

Design (see /opt/skills/guides/pallas_guide.md):
- Grid tiles of TMxTN macroblocks chosen per frame size (wide tiles, e.g.
  8x32 MBs at 1080p, amortize window DMA and per-dy overheads).
- The padded reference stays in HBM (pl.ANY); each grid step DMAs its
  96×160 halo window into VMEM scratch once, then the candidate loop is
  pure VPU work over VMEM (dynamic slices + abs-diff + per-MB reduction).
- Full search: fori_loop over the 33 dy rows; each row's 33 dx diffs are
  batched into one bf16 matmul reduction (exact — see _full_search_kernel)
  and folded into a packed sad*2048+index key whose min reproduces the
  strict-< first-occurrence tie-break (SPEC.md §9 row-major order).
- sad_at_mv / mc_fetch: per-MB dynamic slices inside the same windows,
  used by the diamond search steps and the predictor fetch.

All int32 in, int32 out — bit-exact with ops/motion.py (the jnp fallback);
dispatch picks pallas on TPU backends (ops/dispatch.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codec import spec

R = spec.SEARCH_R          # 16
MB = spec.MB               # 16
ND = 2 * R + 1             # 33 shifts per axis


def _sea_enabled() -> bool:
    """Successive-elimination pruning for the full search (opt-in:
    TVC_SEA=1).

    Both variants produce identical (dy, dx, sad): SEA only skips dy rows
    whose exact column-sum lower bound already exceeds the best SAD found,
    so the packed-key minimum (and the spec's first-occurrence tie-break)
    is unchanged. Default OFF after measurement (tools/exp_sea_results.json,
    r5): on clean panning refs it prunes 60-70% of rows (1.2x standalone at
    4K once the bound matmuls run at Precision.HIGHEST — a rounded-up bound
    could over-prune, so exactness costs the extra passes), but the ENGINE
    searches against the previous RECON, whose qp~30
    quantization noise puts a ~256*E|err| floor under the best SAD while the
    column-sum bound cancels that noise — measured zero pruning at ref noise
    ±8, so in-engine SEA costs its ~16% bound overhead for nothing. The
    exact-prune family (SEA/MSEA) is structurally unable to help at
    production qp; kept as the documented negative and for clean-ref/low-qp
    use."""
    return os.environ.get("TVC_SEA", "0") == "1"


# Loop-order A/B hook (tools/exp_fs_order.py). dx_outer replaces the 1089
# lane-unaligned slices with 33 dynamic lane rolls + 264 sublane rolls —
# measured SLOWER (r5: 6.84 vs 6.61 ms @1080p, 18.87 vs 17.74 @4K,
# mv_equal both): the per-dy reduction matmul's structural cost (one-hot
# K-density 16/TW at 4 MXUs) dominates, not the slice shuffles. Kept as
# the documented negative so it stays tried-once.
_FS_ORDER = "dy_outer"


def _make_full_search_kernel(TM: int, TN: int, emit_map: bool = False,
                             stride: int = 1, batched: bool = False,
                             sea: bool = False, sea_stats: bool = False):
    """Full-search kernel for a TM x TN-MB tile (TH x TW px).

    emit_map=True writes the SAD volume per tile (candidate
    k = ((dy+R)/stride)*NDS + (dx+R)/stride over the stride-subsampled
    offset lattice, NDS = (ND+stride-1)//stride) instead of reducing to the
    argmin; the diamond search descends over this map (ops/dispatch.py).
    stride=2 gives the even-even sublattice, the only mvs the large-diamond
    loop can visit — 4x less matmul work than the full map.

    batched=True prepends a GOP-batch grid dim (g, i, j) and a leading G
    axis on every operand: vmap cannot batch a kernel whose reference stays
    in ANY/HBM (the lowering requires whole-array blocks there), so the
    batched-GOP scan (r2 verdict item 1) routes through these explicit
    variants via jax.custom_batching (see full_search below)."""
    assert stride == 1 or (emit_map and 8 % stride == 0)
    NDS = (ND + stride - 1) // stride  # offsets per axis in the emitted map
    TH, TW = TM * MB, TN * MB
    WH, WW = TH + 2 * R, TW + 2 * R
    WWA = TW + 128  # lane-aligned window width for DMA

    def kernel(refpad_hbm, cur_ref, *refs):
        """One dy-row of candidates per loop step, reduced by ONE batched
        matmul.

        The naive shape (one [TH,TW]x[TW,TN] matmul per candidate) is MXU
        latency-bound: ~49 ms/frame at 1080p. Batching all 33 dx diffs of a
        dy into a single [ND*TH, TW] x [TW, TN] bf16 matmul (diffs <= 255
        are exact in bf16; the MXU accumulates in f32, so column sums
        <= 4080 are exact) plus wide tiles (TN=32 amortizes the rots build
        and slice overheads) runs the same frame in ~5.3 ms. The running
        argmin is a packed key sad*2048 + candidate_index whose minimum
        reproduces the spec's strict-< first-occurrence tie-break exactly
        (sad <= 65280, index < 1089: the key fits int32).
        """
        if emit_map:
            sad_ref, win, rots, diff, sem = refs
        elif sea:
            if sea_stats:
                (sad_ref, idx_ref, cnt_ref, win, rots, diff,
                 winc, bd, best_ref, sem) = refs
            else:
                (sad_ref, idx_ref, win, rots, diff,
                 winc, bd, best_ref, sem) = refs
        else:
            sad_ref, idx_ref, win, rots, diff, sem = refs
        if batched:
            g, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
            src = refpad_hbm.at[g, pl.ds(i * TH, WH), pl.ds(j * TW, WWA)]
        else:
            i, j = pl.program_id(0), pl.program_id(1)
            src = refpad_hbm.at[pl.ds(i * TH, WH), pl.ds(j * TW, WWA)]
        dma = pltpu.make_async_copy(src, win, sem)
        dma.start()
        cur = (cur_ref[0] if batched else cur_ref[:]).astype(jnp.bfloat16)
        dma.wait()

        # row-rotated copies so any visited dy slice becomes sublane-aligned:
        # rots[r/stride][q*8 : q*8+TH] == win[q*8+r : q*8+r+TH] for dy = 8q+r
        # (dy is always a stride multiple, so only those remainders occur).
        # The dx_outer order builds these per dx instead (post-lane-roll).
        if emit_map or _FS_ORDER != "dx_outer":
            w0 = win[:]
            for r in range(0, 8, stride):
                rots[r // stride] = pltpu.roll(w0, (WH - r) % WH, 0).astype(
                    jnp.bfloat16
                )

        # col-block reduction matrix [TW, TN] (0/1, exact in bf16)
        colb = jax.lax.broadcasted_iota(jnp.int32, (TW, TN), 0) // MB
        right = (colb == jax.lax.broadcasted_iota(jnp.int32, (TW, TN), 1)).astype(
            jnp.bfloat16
        )

        def row_sads(dy):
            """[NDS, TM, TN] f32 SADs for every stride-th dx at this dy,
            exact (<= 65280)."""
            r = jax.lax.rem(dy, 8)
            q8 = pl.multiple_of(dy - r, 8)
            strip = rots[r // stride, pl.ds(q8, TH), :]  # [TH, WWA] bf16
            # (r4 A/B: building the diff block as one VALUE — a sublane
            # concat of the 33 slices instead of NDS scratch-ref stores +
            # a reload — measured 7.03 vs 6.85 ms standalone with
            # identical mvs: the ref round-trip is NOT the cost; the
            # slice+sub+abs work itself is. Kept in ref form.)
            for di, dx in enumerate(range(0, ND, stride)):
                # static unroll: lane slices of a value
                cand = jax.lax.slice(strip, (0, dx), (TH, dx + TW))
                diff[di] = jnp.abs(cur - cand)
            d2 = diff[:].reshape(NDS * TH, TW)
            colsum = jax.lax.dot_general(  # [NDS*TH, TN] f32, exact (<= 4080)
                d2, right, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # 16-row sums per MB: f32 exact (<= 65280)
            return jnp.sum(colsum.reshape(NDS, TM, MB, TN), axis=2)

        if emit_map:
            def map_body(i, carry):
                rows = row_sads(i * stride).astype(jnp.int32)
                if batched:
                    sad_ref[0, 0, 0, pl.ds(i * NDS, NDS)] = rows
                else:
                    sad_ref[0, 0, pl.ds(i * NDS, NDS)] = rows
                return carry

            jax.lax.fori_loop(0, NDS, map_body, jnp.int32(0))
            return

        if _FS_ORDER == "dx_outer":
            # r5 loop order: dx OUTER (one dynamic lane-roll of the whole
            # window per dx — WWA is 128-aligned, and dx <= 32 <= WWA-TW so
            # no circular wrap reaches lanes [0, TW)), dy INNER via
            # sublane-ALIGNED slices of 8 sublane-rotated copies. This
            # replaces the r4 structure's 1089 lane-UNaligned slices (the
            # measured cost centre: 'the slice+sub+abs work itself',
            # r4 A/B note above) with 33 lane rolls + 264 sublane rolls;
            # the packed-key min is order-independent, so mvs/sads are
            # bit-identical. Reuses the rots scratch for the per-dx
            # sublane rotations.
            def body_x(dx, best):
                # rolls run on int32 (mosaic: 'Rotate with non-32-bit
                # data' is NYI); the bf16 convert rides the rots store
                strip = pltpu.roll(win[:], jax.lax.rem(WWA - dx, WWA), 1)
                for r in range(8):
                    rots[r] = pltpu.roll(
                        strip, (WH - r) % WH, 0).astype(jnp.bfloat16)
                for dy in range(ND):
                    cand = jax.lax.slice(
                        rots[dy % 8], (dy - dy % 8, 0),
                        (dy - dy % 8 + TH, TW))
                    diff[dy] = jnp.abs(cur - cand)
                d2 = diff[:].reshape(ND * TH, TW)
                colsum = jax.lax.dot_general(
                    d2, right, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sad = jnp.sum(colsum.reshape(ND, TM, MB, TN), axis=2)
                k = dx + ND * jax.lax.broadcasted_iota(
                    jnp.int32, (ND, TM, TN), 0)
                key = sad.astype(jnp.int32) * 2048 + k
                return jnp.minimum(best, jnp.min(key, axis=0))

            best = jax.lax.fori_loop(
                0, ND, body_x, jnp.full((TM, TN), jnp.int32(2**31 - 1))
            )
            if batched:
                sad_ref[0, 0, 0] = best >> 11
                idx_ref[0, 0, 0] = best & 2047
            else:
                sad_ref[0, 0] = best >> 11
                idx_ref[0, 0] = best & 2047
            return

        if sea:
            # Successive elimination (Li & Salari 1995, column-sum form):
            # SAD(dy,dx) >= LB(dy,dx) = sum_c |sum_r cur - sum_r cand| by the
            # triangle inequality, and LB costs 1/16 of the exact row. Rows
            # are visited centre-out (motion statistics concentrate near 0,
            # so the running best tightens fast); a row runs exactly only if
            # some MB's row-min bound is <= its best SAD so far. Pruned
            # candidates satisfy SAD >= LB > best >= final min STRICTLY, so
            # the packed-key minimum — ties included — is untouched: both
            # kernels return bit-identical (dy, dx, sad).
            # All bound arithmetic is f32 on values <= 65280: exact.
            def up(x, k):
                return pltpu.roll(x, (WH - k) % WH, 0)

            # winc[y] = sum_{r<16} win[y+r] (cols), valid for y <= WH-16;
            # rows y in [TH+16, WH) wrap circularly and are never read
            # (max needed row is (TM-1)*16 + dymax = TH + 16).
            s = win[:].astype(jnp.float32)
            s = s + up(s, 1)
            s = s + up(s, 2)
            s = s + up(s, 4)
            s = s + up(s, 8)
            winc[:] = s

            # curCrows[m] = 16-row column sums of MB row m of cur
            r16 = (
                jax.lax.broadcasted_iota(jnp.int32, (TM, TH), 1) // MB
                == jax.lax.broadcasted_iota(jnp.int32, (TM, TH), 0)
            ).astype(jnp.float32)
            curc = jax.lax.dot_general(
                r16, cur.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [TM, TW] f32, exact (<= 4080; HIGHEST: the MXU's default
            #    f32 path may truncate operands toward bf16)
            rightf = right.astype(jnp.float32)

            best_ref[:] = jnp.full((TM, TN), jnp.int32(2**31 - 1))
            if sea_stats:
                if batched:
                    cnt_ref[0, 0, 0] = jnp.zeros((1, 1), jnp.int32)
                else:
                    cnt_ref[0, 0] = jnp.zeros((1, 1), jnp.int32)

            def sea_body(sstep, carry):
                # centre-out visit order: R, R-1, R+1, R-2, R+2, ...
                half = (sstep + 1) >> 1
                sign = 1 - 2 * (sstep & 1)
                dy = R + half * sign

                # row lower bounds: sCrows[m] = winc row m*16+dy
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TM, WH), 1)
                    == jax.lax.broadcasted_iota(jnp.int32, (TM, WH), 0) * MB
                    + dy
                ).astype(jnp.float32)
                scrows = jax.lax.dot_general(
                    sel, winc[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [TM, WWA]
                for di in range(ND):
                    bd[di] = jnp.abs(
                        curc - jax.lax.slice(scrows, (0, di), (TM, di + TW))
                    )
                lb = jax.lax.dot_general(  # [ND*TM, TN] f32, exact
                    bd[:].reshape(ND * TM, TW), rightf,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                rowmin = jnp.min(lb.reshape(ND, TM, TN), axis=0)
                bestsad = (best_ref[:] >> 11).astype(jnp.float32)
                need = jnp.any(rowmin <= bestsad)

                @pl.when(need)
                def _():
                    sad = row_sads(dy)
                    k = dy * ND + jax.lax.broadcasted_iota(
                        jnp.int32, (ND, TM, TN), 0
                    )
                    key = sad.astype(jnp.int32) * 2048 + k
                    best_ref[:] = jnp.minimum(
                        best_ref[:], jnp.min(key, axis=0)
                    )
                    if sea_stats:
                        if batched:
                            cnt_ref[0, 0, 0] = cnt_ref[0, 0, 0] + 1
                        else:
                            cnt_ref[0, 0] = cnt_ref[0, 0] + 1

                return carry

            jax.lax.fori_loop(0, ND, sea_body, jnp.int32(0))
            best = best_ref[:]
            if batched:
                sad_ref[0, 0, 0] = best >> 11
                idx_ref[0, 0, 0] = best & 2047
            else:
                sad_ref[0, 0] = best >> 11
                idx_ref[0, 0] = best & 2047
            return

        def body(dy, best):
            sad = row_sads(dy)
            k = dy * ND + jax.lax.broadcasted_iota(jnp.int32, (ND, TM, TN), 0)
            key = sad.astype(jnp.int32) * 2048 + k
            return jnp.minimum(best, jnp.min(key, axis=0))

        best = jax.lax.fori_loop(
            0, ND, body, jnp.full((TM, TN), jnp.int32(2**31 - 1))
        )
        if batched:
            sad_ref[0, 0, 0] = best >> 11
            idx_ref[0, 0, 0] = best & 2047
        else:
            sad_ref[0, 0] = best >> 11
            idx_ref[0, 0] = best & 2047

    return kernel, TH, TW, WH, WW, WWA


def _fs_tile_shape(nby: int, nbx: int) -> tuple[int, int]:
    """Pick the MB-tile shape: wide tiles win (bigger matmuls, amortized
    rots), bounded by grid size so small frames don't pad away the gain.
    (TM=16 at 4K measured ~3% faster STANDALONE — exp_fs_tile — but
    0.3 ms/frame SLOWER inside the GOP program, where its 13 MB scratch
    footprint squeezes the rest; tried r4 and again r5, kept at 8.)"""
    tn = 32 if nbx >= 48 else (16 if nbx >= 16 else 8)
    tm = 8 if nby >= 32 else 4
    return tm, tn


def _sea_scratch(sea, TM, TH, TW, WH, WWA):
    """Extra VMEM scratch for the SEA variant: the sliding column-sum field,
    the bound-diff block, and the running best key (~1 MB at TN=32)."""
    if not sea:
        return []
    return [
        pltpu.VMEM((WH, WWA), jnp.float32),       # winc
        pltpu.VMEM((ND, TM, TW), jnp.float32),    # bd
        pltpu.VMEM((TM, TW // MB), jnp.int32),    # best_ref [TM, TN]
    ]


@functools.lru_cache(maxsize=16)
def _full_search_call(nby: int, nbx: int, sea: bool = False,
                      sea_stats: bool = False):
    TM, TN = _fs_tile_shape(nby, nbx)
    kernel, TH, TW, WH, WW, WWA = _make_full_search_kernel(
        TM, TN, sea=sea, sea_stats=sea_stats
    )
    gy = -(-nby // TM) * TM
    gx = -(-nbx // TN) * TN

    def mb_spec():
        return pl.BlockSpec(
            (1, 1, TM, TN), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )

    out_specs = [mb_spec(), mb_spec()]
    out_shape = [
        jax.ShapeDtypeStruct((gy // TM, gx // TN, TM, TN), jnp.int32),
        jax.ShapeDtypeStruct((gy // TM, gx // TN, TM, TN), jnp.int32),
    ]
    if sea_stats:
        out_specs.append(pl.BlockSpec(
            (1, 1, 1, 1), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ))
        out_shape.append(
            jax.ShapeDtypeStruct((gy // TM, gx // TN, 1, 1), jnp.int32)
        )

    def call(cur_p, refpad):
        return pl.pallas_call(
            kernel,
            grid=(gy // TM, gx // TN),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # refpad stays in HBM
                pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((WH, WWA), jnp.int32),
                pltpu.VMEM((8, WH, WWA), jnp.bfloat16),
                pltpu.VMEM((ND, TH, TW), jnp.bfloat16),
            ] + _sea_scratch(sea, TM, TH, TW, WH, WWA) + [
                pltpu.SemaphoreType.DMA,
            ],
        )(refpad, cur_p)

    return call, TM, TN, gy, gx, WH, WW, WWA


@functools.lru_cache(maxsize=16)
def _full_search_call_batch(gn: int, nby: int, nbx: int, sea: bool = False):
    """G-batched twin of _full_search_call: grid (G, gy, gx), operands carry
    a leading G axis (the refpad stays whole in HBM; the kernel DMAs
    refpad[g]'s window per step)."""
    TM, TN = _fs_tile_shape(nby, nbx)
    kernel, TH, TW, WH, WW, WWA = _make_full_search_kernel(
        TM, TN, batched=True, sea=sea
    )
    gy = -(-nby // TM) * TM
    gx = -(-nbx // TN) * TN

    def mb_spec():
        return pl.BlockSpec(
            (1, 1, 1, TM, TN), lambda g, i, j: (g, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def call(cur_p, refpad):
        return pl.pallas_call(
            kernel,
            grid=(gn, gy // TM, gx // TN),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, TH, TW), lambda g, i, j: (g, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[mb_spec(), mb_spec()],
            out_shape=[
                jax.ShapeDtypeStruct((gn, gy // TM, gx // TN, TM, TN), jnp.int32),
                jax.ShapeDtypeStruct((gn, gy // TM, gx // TN, TM, TN), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((WH, WWA), jnp.int32),
                pltpu.VMEM((8, WH, WWA), jnp.bfloat16),
                pltpu.VMEM((ND, TH, TW), jnp.bfloat16),
            ] + _sea_scratch(sea, TM, TH, TW, WH, WWA) + [
                pltpu.SemaphoreType.DMA,
            ],
        )(refpad, cur_p)

    return call, TM, TN, gy, gx, WH, WW, WWA


def _fs_pads(cur, ref, gy, gx, WH, WW, WWA):
    """Shared tile/halo padding; works on [H, W] or [G, H, W] (leading axes
    untouched by the trailing-dim pads).

    Grid-padding MBs of cur take the co-located (edge-replicated) REF
    values, not zeros: their outputs are cropped either way, but with
    cur==ref there the mv-(0,0) probe scores SAD 0 and the SEA bound prunes
    every other row — zero-padded MBs see constant-column SADs whose ties
    (LB == best) forced edge tiles to evaluate all 33 rows."""
    h, w = cur.shape[-2:]
    hp, wp = gy * MB, gx * MB
    lead = ((0, 0),) * (cur.ndim - 2)
    ref_p = jnp.pad(ref, lead + ((0, hp - h), (0, wp - w)), mode="edge")
    cur_p = jax.lax.dynamic_update_slice(
        ref_p, cur.astype(ref_p.dtype), (0,) * cur.ndim
    )
    refpad = jnp.pad(ref_p, lead + ((R, R), (R, R + (WWA - WW))), mode="edge")
    return cur_p, refpad


def _full_search_impl(cur_y: jnp.ndarray, ref_y: jnp.ndarray,
                      stats: bool = False):
    h, w = cur_y.shape
    nby, nbx = h // MB, w // MB
    call, TM, TN, gy, gx, WH, WW, WWA = _full_search_call(
        nby, nbx, _sea_enabled() or stats, stats
    )
    cur_p, refpad = _fs_pads(cur_y, ref_y, gy, gx, WH, WW, WWA)
    outs = call(cur_p, refpad)
    sad, idx = outs[0], outs[1]

    def from_tiles(a):
        g1, g2 = a.shape[:2]
        return a.transpose(0, 2, 1, 3).reshape(g1 * TM, g2 * TN)

    sad = from_tiles(sad)[:nby, :nbx]
    idx = from_tiles(idx)[:nby, :nbx]
    dy = idx // ND - R
    dx = idx % ND - R
    if stats:
        return dy, dx, sad, outs[2][:, :, 0, 0]
    return dy, dx, sad


def full_search_sea_stats(cur_y: jnp.ndarray, ref_y: jnp.ndarray):
    """SEA full search that also returns the per-tile count of dy rows
    evaluated exactly (of ND=33) — the pruning-rate instrumentation for
    tools/exp_sea.py. (dy, dx, sad) are bit-identical to full_search."""
    return _full_search_impl(cur_y, ref_y, stats=True)


def _full_search_batch_impl(cur_g: jnp.ndarray, ref_g: jnp.ndarray):
    """[G, H, W] planes -> per-GOP (dy, dx, sad), bit-exact with a per-G
    loop of _full_search_impl (tests/test_tpu_kernels.py)."""
    gn, h, w = cur_g.shape
    nby, nbx = h // MB, w // MB
    call, TM, TN, gy, gx, WH, WW, WWA = _full_search_call_batch(
        gn, nby, nbx, _sea_enabled()
    )
    cur_p, refpad = _fs_pads(cur_g, ref_g, gy, gx, WH, WW, WWA)
    sad, idx = call(cur_p, refpad)

    def from_tiles(a):
        g1, g2 = a.shape[1:3]
        return a.transpose(0, 1, 3, 2, 4).reshape(gn, g1 * TM, g2 * TN)

    sad = from_tiles(sad)[:, :nby, :nbx]
    idx = from_tiles(idx)[:, :nby, :nbx]
    dy = idx // ND - R
    dx = idx % ND - R
    return dy, dx, sad


def full_search_pre_haloed(cur_y: jnp.ndarray, ref_ext: jnp.ndarray):
    """Full search where ref_ext already carries the vertical ±R halo rows
    (shape [h+2R, w]; or [h+2R, w+2R] with the horizontal halo too) — the
    tile-sharded path's reference after exchange_halo (parallel/tiles.py).

    Bit-exact twin of tiles' jnp scan: the kernel and its padding are the
    unsharded full_search's (the pre-haloed rows simply REPLACE pad_ref's
    vertical edge replication; rows/cols beyond the halo are only read for
    grid-padding MBs whose outputs are cropped)."""
    h, w = cur_y.shape
    nby, nbx = h // MB, w // MB
    call, TM, TN, gy, gx, WH, WW, WWA = _full_search_call(
        nby, nbx, _sea_enabled()
    )
    hp, wp = gy * MB, gx * MB
    ref_r = jnp.pad(ref_ext, ((0, hp - h), (0, 0)), mode="edge")
    if ref_ext.shape[1] == w:  # 1-D row sharding: columns edge-replicate
        ref_c = jnp.pad(ref_r, ((0, 0), (0, wp - w)), mode="edge")
        refpad = jnp.pad(ref_c, ((0, 0), (R, R + (WWA - WW))), mode="edge")
    else:  # horizontal halo present: [-R, w+R) columns are real
        refpad = jnp.pad(
            ref_r, ((0, 0), (0, (wp - w) + (WWA - WW))), mode="edge")
    # grid-padding MBs of cur mirror the co-located ref (see _fs_pads)
    cur_p = jax.lax.dynamic_update_slice(
        jax.lax.dynamic_slice(refpad, (R, R), (hp, wp)),
        cur_y.astype(refpad.dtype), (0, 0),
    )
    sad, idx = call(cur_p, refpad)

    def from_tiles(a):
        g1, g2 = a.shape[:2]
        return a.transpose(0, 2, 1, 3).reshape(g1 * TM, g2 * TN)

    sad = from_tiles(sad)[:nby, :nbx]
    idx = from_tiles(idx)[:nby, :nbx]
    return idx // ND - R, idx % ND - R, sad


@jax.custom_batching.custom_vmap
def full_search(cur_y: jnp.ndarray, ref_y: jnp.ndarray):
    """Exhaustive ±16 SAD search on TPU. Same contract as motion.full_search.

    cur_y, ref_y: [H, W] int32 with H % 16 == 0, W % 16 == 0. Under vmap
    (the batched-GOP scan), the custom batch rule routes to the explicit
    G-grid kernel — the ANY-memory-space reference cannot be vmapped."""
    return _full_search_impl(cur_y, ref_y)


@full_search.def_vmap
def _full_search_vmap(axis_size, in_batched, cur_y, ref_y):
    if not in_batched[0]:
        cur_y = jnp.broadcast_to(cur_y, (axis_size,) + cur_y.shape)
    if not in_batched[1]:
        ref_y = jnp.broadcast_to(ref_y, (axis_size,) + ref_y.shape)
    return _full_search_batch_impl(cur_y, ref_y), (True, True, True)


@functools.lru_cache(maxsize=16)
def _sad_map_call(nby: int, nbx: int, stride: int):
    TM, TN = _fs_tile_shape(nby, nbx)
    kernel, TH, TW, WH, WW, WWA = _make_full_search_kernel(
        TM, TN, emit_map=True, stride=stride
    )
    nds = (ND + stride - 1) // stride
    ncand = nds * nds
    gy = -(-nby // TM) * TM
    gx = -(-nbx // TN) * TN

    def call(cur_p, refpad):
        return pl.pallas_call(
            kernel,
            grid=(gy // TM, gx // TN),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, ncand, TM, TN),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (gy // TM, gx // TN, ncand, TM, TN), jnp.int32
            ),
            scratch_shapes=[
                pltpu.VMEM((WH, WWA), jnp.int32),
                pltpu.VMEM((8 // stride, WH, WWA), jnp.bfloat16),
                pltpu.VMEM((nds, TH, TW), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(refpad, cur_p)

    return call, TM, TN, gy, gx, WH, WW, WWA, ncand


@functools.lru_cache(maxsize=16)
def _sad_map_call_batch(gn: int, nby: int, nbx: int, stride: int):
    TM, TN = _fs_tile_shape(nby, nbx)
    kernel, TH, TW, WH, WW, WWA = _make_full_search_kernel(
        TM, TN, emit_map=True, stride=stride, batched=True
    )
    nds = (ND + stride - 1) // stride
    ncand = nds * nds
    gy = -(-nby // TM) * TM
    gx = -(-nbx // TN) * TN

    def call(cur_p, refpad):
        return pl.pallas_call(
            kernel,
            grid=(gn, gy // TM, gx // TN),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, TH, TW), lambda g, i, j: (g, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, ncand, TM, TN),
                lambda g, i, j: (g, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (gn, gy // TM, gx // TN, ncand, TM, TN), jnp.int32
            ),
            scratch_shapes=[
                pltpu.VMEM((WH, WWA), jnp.int32),
                pltpu.VMEM((8 // stride, WH, WWA), jnp.bfloat16),
                pltpu.VMEM((nds, TH, TW), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )(refpad, cur_p)

    return call, TM, TN, gy, gx, WH, WW, WWA, ncand


def _sad_map_impl(cur_y: jnp.ndarray, ref_y: jnp.ndarray, stride: int):
    h, w = cur_y.shape
    nby, nbx = h // MB, w // MB
    call, TM, TN, gy, gx, WH, WW, WWA, ncand = _sad_map_call(nby, nbx, stride)
    cur_p, refpad = _fs_pads(cur_y, ref_y, gy, gx, WH, WW, WWA)
    m = call(cur_p, refpad)
    m = m.transpose(0, 3, 1, 4, 2).reshape(gy, gx, ncand)
    return m[:nby, :nbx]


def _sad_map_batch_impl(cur_g: jnp.ndarray, ref_g: jnp.ndarray, stride: int):
    gn, h, w = cur_g.shape
    nby, nbx = h // MB, w // MB
    call, TM, TN, gy, gx, WH, WW, WWA, ncand = _sad_map_call_batch(
        gn, nby, nbx, stride
    )
    cur_p, refpad = _fs_pads(cur_g, ref_g, gy, gx, WH, WW, WWA)
    m = call(cur_p, refpad)
    m = m.transpose(0, 1, 4, 2, 5, 3).reshape(gn, gy, gx, ncand)
    return m[:, :nby, :nbx]


def _make_sad_map_public(stride: int, doc: str):
    @jax.custom_batching.custom_vmap
    def fn(cur_y: jnp.ndarray, ref_y: jnp.ndarray):
        return _sad_map_impl(cur_y, ref_y, stride)

    @fn.def_vmap
    def _rule(axis_size, in_batched, cur_y, ref_y):
        if not in_batched[0]:
            cur_y = jnp.broadcast_to(cur_y, (axis_size,) + cur_y.shape)
        if not in_batched[1]:
            ref_y = jnp.broadcast_to(ref_y, (axis_size,) + ref_y.shape)
        return _sad_map_batch_impl(cur_y, ref_y, stride), True

    fn.__doc__ = doc
    return fn


sad_map = _make_sad_map_public(
    1,
    """Full ±16 SAD volume per MB: [nby, nbx, N_CAND] int32 with candidate
    k = (dy+R)*ND + (dx+R). Same padding/values as full_search, so a descent
    over this map is bit-exact with per-candidate sad_at evaluation.""",
)

sad_map_even = _make_sad_map_public(
    2,
    """Even-even ±16 SAD sublattice per MB: [nby, nbx, 17*17] int32 with
    candidate kE = ((dy+R)/2)*17 + (dx+R)/2 — every mv the large-diamond
    loop can reach (ops/dispatch.py).""",
)


def make_mc_kernels(bs: int, radius: int, tm: int, tn: int):
    """Build (sad_at, mc_fetch) kernels for block size `bs` and search/pad
    radius `radius`, tiled tm×tn blocks per grid step.

    Luma uses (16, 16, 4, 8); chroma (8, 8, 4, 16) — tile px = (tm*bs, tn*bs)
    with tn*bs a lane multiple (128).

    Design: the per-block gather is done by two exact bf16 one-hot matmuls
    instead of per-block vector rolls (which serialize into ~32 dependent
    shuffle chains per tile, ~2.4+ ms/frame at 1080p). With blocks stacked
    on the M axis in raster order s = (my*tn + mx)*bs + r:

      T      = win @ CS        CS[c', (b,c)] = 1{c' == mx_b*bs + radius
                                                       + c + dx_b}
      out_p  = RowSel_p @ T_p  per 128-row panel p; RowSel[(b,r), y] =
                               1{y == my_b*bs + radius + r + dy_b}

    The diagonal bs×bs blocks of each [128, 128] panel are the predictors.
    Pixels <= 255 are bf16-exact and the MXU accumulates in f32, so results
    are bit-exact with the jnp fallback (ops/motion.py).
    """
    th, tw = tm * bs, tn * bs
    wh = th + 2 * radius
    wh = -(-wh // 8) * 8            # sublane-pad window height
    wwa = tw + 128                  # lane-aligned window width
    nblk = tm * tn
    nr = nblk * bs                  # block-stacked row count
    npanel = nr // 128
    bpp = 128 // bs                 # blocks per 128-row panel
    assert tw % 128 == 0 and th % 8 == 0 and nr % 128 == 0

    def selectors(dyv, dxv):
        """(RowSel [nr, wh] bf16, CS [wwa, nr] bf16) from per-tile mvs
        delivered as [1, nblk] values in block raster order."""
        dyf = dyv.astype(jnp.float32)  # [1, nblk]
        dxf = dxv.astype(jnp.float32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (nr, nblk), 0)
        bcol = jax.lax.broadcasted_iota(jnp.int32, (nr, nblk), 1)
        rep = (bcol == srow // bs).astype(jnp.float32)  # [nr, nblk] one-hot
        dyrep = jax.lax.dot_general(
            rep, dyf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                              # [nr, 1]
        dxrep = jax.lax.dot_general(
            rep, dxf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

        s1 = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
        rowt = (s1 // (tn * bs)) * bs + s1 % bs + radius + dyrep
        yrow = jax.lax.broadcasted_iota(jnp.int32, (nr, wh), 1)
        rowsel = (yrow == rowt).astype(jnp.bfloat16)

        cj = jax.lax.broadcasted_iota(jnp.int32, (wwa, nr), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (wwa, nr), 0)
        base = ((cj // bs) % tn) * bs + radius + cj % bs
        ones_sub = jnp.ones((wwa, 1), jnp.float32)
        dxcols = jax.lax.dot_general(   # broadcast dxrep across sublanes
            ones_sub, dxrep.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        cs = (ci == base + dxcols).astype(jnp.bfloat16)
        return rowsel, cs

    def fetch_panels(win, dyv, dxv):
        """Yield (panel index, [128, 128] f32) predictor panels."""
        rowsel, cs = selectors(dyv, dxv)
        t = jax.lax.dot_general(       # [wh, nr] f32, values <= 255
            win[:].astype(jnp.bfloat16), cs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)         # <= 255: exact
        for p in range(npanel):
            rs_p = jax.lax.slice(rowsel, (p * 128, 0), ((p + 1) * 128, wh))
            t_p = jax.lax.slice(t, (0, p * 128), (wh, (p + 1) * 128))
            out_p = jax.lax.dot_general(
                rs_p, t_p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yield p, out_p

    def _mc_store(out_ref, lead, win, dyv, dxv):
        for p, out_p in fetch_panels(win, dyv, dxv):
            for k in range(bpp):
                b = p * bpp + k
                my, mx = b // tn, b % tn
                blk = jax.lax.slice(
                    out_p, (k * bs, k * bs), (k * bs + bs, k * bs + bs)
                )
                idx = lead + (slice(my * bs, (my + 1) * bs),
                              slice(mx * bs, (mx + 1) * bs))
                out_ref[idx] = blk.astype(jnp.int32)

    def mc_kernel(refpad_hbm, dy_ref, dx_ref, out_ref, win, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        dma = pltpu.make_async_copy(
            refpad_hbm.at[pl.ds(i * th, wh), pl.ds(j * tw, wwa)], win, sem
        )
        dma.start()
        dma.wait()
        _mc_store(out_ref, (), win, dy_ref[0, 0], dx_ref[0, 0])

    def mc_kernel_g(refpad_hbm, dy_ref, dx_ref, out_ref, win, sem):
        """GOP-batched: grid (G, gy, gx); see full-search kernel note."""
        g, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        dma = pltpu.make_async_copy(
            refpad_hbm.at[g, pl.ds(i * th, wh), pl.ds(j * tw, wwa)], win, sem
        )
        dma.start()
        dma.wait()
        _mc_store(out_ref, (0,), win, dy_ref[0, 0, 0], dx_ref[0, 0, 0])

    def sad_body(cur, dyv, dxv, win):
        acc = jnp.zeros((tm, tn), jnp.int32)
        for p, out_p in fetch_panels(win, dyv, dxv):
            for k in range(bpp):
                b = p * bpp + k
                my, mx = b // tn, b % tn
                blk = jax.lax.slice(
                    out_p, (k * bs, k * bs), (k * bs + bs, k * bs + bs)
                ).astype(jnp.int32)
                cblk = cur[my * bs : (my + 1) * bs, mx * bs : (mx + 1) * bs]
                onehot = (
                    (jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0) == my)
                    & (jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) == mx)
                ).astype(jnp.int32)
                acc = acc + onehot * jnp.abs(cblk - blk).sum()
        return acc

    def sad_kernel(refpad_hbm, cur_ref, dy_ref, dx_ref, out_ref, win, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        dma = pltpu.make_async_copy(
            refpad_hbm.at[pl.ds(i * th, wh), pl.ds(j * tw, wwa)], win, sem
        )
        dma.start()
        dma.wait()
        out_ref[0, 0] = sad_body(cur_ref[:], dy_ref[0, 0], dx_ref[0, 0], win)

    def sad_kernel_g(refpad_hbm, cur_ref, dy_ref, dx_ref, out_ref, win, sem):
        g, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        dma = pltpu.make_async_copy(
            refpad_hbm.at[g, pl.ds(i * th, wh), pl.ds(j * tw, wwa)], win, sem
        )
        dma.start()
        dma.wait()
        out_ref[0, 0, 0] = sad_body(
            cur_ref[0], dy_ref[0, 0, 0], dx_ref[0, 0, 0], win
        )

    def to_flat(a, gy, gx):
        """MB grid [gy, gx] -> [gy/tm, gx/tn, 1, nblk] raster-per-tile."""
        return (
            a.reshape(gy // tm, tm, gx // tn, tn)
            .transpose(0, 2, 1, 3)
            .reshape(gy // tm, gx // tn, 1, nblk)
        )

    def flat_spec():
        return pl.BlockSpec(
            (1, 1, 1, nblk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )

    def mb_spec():
        return pl.BlockSpec(
            (1, 1, tm, tn), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        )

    def tile_call(kernel, cur_y, ref_y, dy, dx, out_is_plane):
        h, w = cur_y.shape
        nby, nbx = h // bs, w // bs
        gy = -(-nby // tm) * tm
        gx = -(-nbx // tn) * tn
        hp, wp = gy * bs, gx * bs
        cur_p = jnp.pad(cur_y, ((0, hp - h), (0, wp - w)))
        ref_p = jnp.pad(ref_y, ((0, hp - h), (0, wp - w)), mode="edge")
        # window rows span [i*th - radius, i*th - radius + wh); shift by
        # `radius` top pad: rows [i*th, i*th + wh) of refpad.
        refpad = jnp.pad(
            ref_p,
            ((radius, wh - radius), (radius, wwa - tw - radius)),
            mode="edge",
        )
        dy_p = to_flat(jnp.pad(dy, ((0, gy - nby), (0, gx - nbx))), gy, gx)
        dx_p = to_flat(jnp.pad(dx, ((0, gy - nby), (0, gx - nbx))), gy, gx)

        if out_is_plane:
            out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((hp, wp), jnp.int32)
            in_specs = [pl.BlockSpec(memory_space=pl.ANY), flat_spec(), flat_spec()]
            args = (refpad, dy_p, dx_p)
        else:
            out_spec = mb_spec()
            out_shape = jax.ShapeDtypeStruct((gy // tm, gx // tn, tm, tn), jnp.int32)
            in_specs = [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                flat_spec(),
                flat_spec(),
            ]
            args = (refpad, cur_p, dy_p, dx_p)

        out = pl.pallas_call(
            kernel,
            grid=(gy // tm, gx // tn),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((wh, wwa), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(*args)
        if out_is_plane:
            return out[:h, :w]
        return out.transpose(0, 2, 1, 3).reshape(gy, gx)[:nby, :nbx]

    def _pads_g(cur_g, ref_g):
        gn, h, w = cur_g.shape
        nby, nbx = h // bs, w // bs
        gy = -(-nby // tm) * tm
        gx = -(-nbx // tn) * tn
        hp, wp = gy * bs, gx * bs
        cur_p = jnp.pad(cur_g, ((0, 0), (0, hp - h), (0, wp - w)))
        ref_p = jnp.pad(ref_g, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
        refpad = jnp.pad(
            ref_p,
            ((0, 0), (radius, wh - radius), (radius, wwa - tw - radius)),
            mode="edge",
        )
        return cur_p, refpad, nby, nbx, gy, gx, hp, wp

    def _to_flat_g(a, gn, gy, gx):
        return (
            a.reshape(gn, gy // tm, tm, gx // tn, tn)
            .transpose(0, 1, 3, 2, 4)
            .reshape(gn, gy // tm, gx // tn, 1, nblk)
        )

    def _flat_spec_g():
        return pl.BlockSpec(
            (1, 1, 1, 1, nblk), lambda g, i, j: (g, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def tile_call_g(kernel_g, cur_g, ref_g, dy_g, dx_g, out_is_plane):
        """GOP-batched tile call: [G, ...] operands, grid (G, gy, gx)."""
        gn = cur_g.shape[0]
        cur_p, refpad, nby, nbx, gy, gx, hp, wp = _pads_g(cur_g, ref_g)
        pad2 = ((0, 0), (0, gy - nby), (0, gx - nbx))
        dy_p = _to_flat_g(jnp.pad(dy_g, pad2), gn, gy, gx)
        dx_p = _to_flat_g(jnp.pad(dx_g, pad2), gn, gy, gx)

        if out_is_plane:
            out_spec = pl.BlockSpec(
                (1, th, tw), lambda g, i, j: (g, i, j), memory_space=pltpu.VMEM
            )
            out_shape = jax.ShapeDtypeStruct((gn, hp, wp), jnp.int32)
            in_specs = [pl.BlockSpec(memory_space=pl.ANY), _flat_spec_g(),
                        _flat_spec_g()]
            args = (refpad, dy_p, dx_p)
        else:
            out_spec = pl.BlockSpec(
                (1, 1, 1, tm, tn), lambda g, i, j: (g, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(
                (gn, gy // tm, gx // tn, tm, tn), jnp.int32
            )
            in_specs = [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, th, tw), lambda g, i, j: (g, i, j),
                             memory_space=pltpu.VMEM),
                _flat_spec_g(),
                _flat_spec_g(),
            ]
            args = (refpad, cur_p, dy_p, dx_p)

        out = pl.pallas_call(
            kernel_g,
            grid=(gn, gy // tm, gx // tn),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((wh, wwa), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(*args)
        if out_is_plane:
            return out[:, : cur_g.shape[1], : cur_g.shape[2]]
        return out.transpose(0, 1, 3, 2, 4).reshape(gn, gy, gx)[:, :nby, :nbx]

    @jax.custom_batching.custom_vmap
    def sad_at(cur, ref, dy, dx):
        return tile_call(sad_kernel, cur, ref, dy, dx, False)

    @sad_at.def_vmap
    def _sad_at_vmap(axis_size, in_batched, cur, ref, dy, dx):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        cur, ref, dy, dx = (bc(x, b) for x, b in
                            zip((cur, ref, dy, dx), in_batched))
        return tile_call_g(sad_kernel_g, cur, ref, dy, dx, False), True

    @jax.custom_batching.custom_vmap
    def mc_fetch(ref, dy, dx):
        return tile_call(mc_kernel, ref, ref, dy, dx, True)

    @mc_fetch.def_vmap
    def _mc_fetch_vmap(axis_size, in_batched, ref, dy, dx):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        ref, dy, dx = (bc(x, b) for x, b in zip((ref, dy, dx), in_batched))
        return tile_call_g(mc_kernel_g, ref, ref, dy, dx, True), True

    def mc_fetch_pre_haloed(ref_ext, dy, dx):
        """mc_fetch where ref_ext already carries the vertical ±radius halo
        rows ([h+2r, w]; or [h+2r, w+2r] with the horizontal halo too) —
        the tile-sharded path's reference after exchange_halo. The halo
        rows REPLACE the pad_ref edge replication (full_search_pre_haloed's
        twin for MC: the jnp per-block gather this displaces was 14 of the
        18.7 ms/frame 1080p-class tile shard, tools/tp_shard_perf).
        Bit-exact with motion.mc_fetch on the same extended plane."""
        nby, nbx = dy.shape
        h, w = nby * bs, nbx * bs
        gy = -(-nby // tm) * tm
        gx = -(-nbx // tn) * tn
        hp, wp = gy * bs, gx * bs
        if ref_ext.shape[1] == w:  # 1-D row shard: columns edge-replicate
            rc_ = jnp.pad(
                ref_ext,
                ((0, 0), (radius, (wp - w) + wwa - tw - radius)),
                mode="edge",
            )
        else:  # horizontal halo present: [-r, w+r) columns are real
            rc_ = jnp.pad(
                ref_ext,
                ((0, 0), (0, (wp - w) + wwa - tw - 2 * radius)),
                mode="edge",
            )
        # ref_ext row 0 IS frame row -radius (== refpad's top pad row 0)
        refpad = jnp.pad(
            rc_, ((0, hp + wh - h - 2 * radius), (0, 0)), mode="edge"
        )
        dy_p = to_flat(jnp.pad(dy, ((0, gy - nby), (0, gx - nbx))), gy, gx)
        dx_p = to_flat(jnp.pad(dx, ((0, gy - nby), (0, gx - nbx))), gy, gx)
        out = pl.pallas_call(
            mc_kernel,
            grid=(gy // tm, gx // tn),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), flat_spec(),
                      flat_spec()],
            out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((wh, wwa), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(refpad, dy_p, dx_p)
        return out[:h, :w]

    return sad_at, mc_fetch, mc_fetch_pre_haloed


sad_at_mv, mc_fetch_plane, mc_fetch_plane_pre_haloed = make_mc_kernels(
    MB, R, 4, 8)
(sad_at_mv_chroma, mc_fetch_plane_chroma,
 mc_fetch_plane_chroma_pre_haloed) = make_mc_kernels(spec.BLK, spec.BLK, 4, 16)
