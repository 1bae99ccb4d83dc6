"""Fused Pallas transform+quant+recon kernel (reference components C9–C11,
C14 — SURVEY.md §2.2 "C5–C11, C14 become Pallas kernels").

One pass over each plane computes residual → forward ITX8 → quantize →
dequantize → inverse ITX8 → clipped reconstruction, writing exactly two
arrays (quantized levels in raster block layout, recon plane). The jnp path
(ops/transform.py via pipeline/gop_engine._code_plane) materializes each
stage in HBM; this kernel keeps everything in VMEM/registers.

Design notes (see /opt/skills/guides/pallas_guide.md):
- All math is int32 on the VPU — no bf16 splits to prove exact, and no
  8x8-matmul latency (the MXU is the wrong unit for K=8 contractions).
- The 8x8 transform is computed as 15 masked sublane/lane rolls:
  (B @ x)[8g+i, :] = sum_j B[i,j] x[8g+j, :]
                   = sum_{s=-7..7} C_s[r] * roll(x, -s, 0)[r, :]
  with C_s[r] = B[r%8, r%8+s] (0 outside the 8x8 group). Rolled rows that
  cross a group boundary always carry a zero mask, so tile wraparound is
  harmless. The lane-side multiply uses the same identity along axis 1.
- Quantization divides by the per-block step via an exact f32-reciprocal
  division (floor(n * (1/d)) plus a two-sided fixup): n <= ~87k and f32
  carries 24 mantissa bits, so the estimate is off by at most 1 before the
  fixup. Bit-exact with codec/spec.py quantize (the (16|c|+bias*q)//(16q)
  form equals the (2|c|+q)//(2q) form when bias == 8).

Value-range proof for int32 (matches ops/transform.py bounds):
  |resid| <= 255; |t1| <= 8*502*255 ~ 1.0e6; |t1r| <= ~1001;
  |coef| <= 8*502*1001 >> 10 ~ 3925; |deq| <= |coef| + q/2 <= ~4650;
  |u1| <= 8*502*4650 ~ 18.7e6; |u1r| <= ~18254; |u2| <= 8*502*18254
  ~ 73.3e6 < 2^31.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codec import spec

B_NP = np.asarray(spec.B_MATRIX, dtype=np.int32)
SHIFT = spec.TX_SHIFT
RND = 1 << (SHIFT - 1)


def _coef_table(n: int, axis: int, transpose: bool) -> np.ndarray:
    """Host-side coefficient table for the masked-roll multiply: column k
    (k = s+7, s in [-7,7]) holds c_s with c_s[r] = B[r%8, r%8+s]
    (B[r%8+s, r%8] when transpose), 0 where r%8+s leaves the 8x8 group.
    Shaped [n, 15] for the sublane side and [15, n] for the lane side so
    the kernel can slice broadcast-ready vectors without a relayout."""
    t = np.zeros((n, 15), np.int32)
    for s in range(-7, 8):
        for r in range(n):
            i = r % 8
            j = i + s
            if 0 <= j < 8:
                t[r, s + 7] = B_NP[j, i] if transpose else B_NP[i, j]
    return t if axis == 0 else t.T.copy()


def _mul8(x, coef_ref, axis: int):
    """The masked-roll 8x8 multiply: B @ x along sublanes (axis=0) or
    x @ B^T along lanes (axis=1); the table input picks plain/transpose."""
    n = x.shape[axis]
    acc = None
    for s in range(-7, 8):
        if axis == 0:
            c = coef_ref[:, s + 7 : s + 8]       # [n, 1]
        else:
            c = coef_ref[s + 7 : s + 8, :]       # [1, n]
        term = c * pltpu.roll(x, (-s) % n, axis)
        acc = term if acc is None else acc + term
    return acc


def _rshift_round(v):
    mag = (jnp.abs(v) + RND) >> SHIFT
    return jnp.where(v < 0, -mag, mag)


def _exact_div(n, d):
    """floor(n / d) for int32 n in [0, ~2^20], d in [1, 2^17] — f32
    reciprocal estimate plus a two-sided fixup (error <= 1 by the mantissa
    bound in the module docstring)."""
    df = d.astype(jnp.float32)
    t = jnp.floor(n.astype(jnp.float32) * (1.0 / df)).astype(jnp.int32)
    r = n - t * d
    t = t + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return t


def _make_code_plane_kernel(th: int, tw: int, qbias: int,
                            batched: bool = False, qmat: bool = False):
    def kernel(cur_ref, pred_ref, q_ref, bias_ref, qm_ref, cl_ref, cr_ref,
               clt_ref, crt_ref, lv_ref, rec_ref):
        if batched:  # GOP-batched blocks carry a leading (1,) axis
            pred = pred_ref[0]
            x = cur_ref[0] - pred
        else:
            pred = pred_ref[:]
            x = cur_ref[:] - pred

        t1 = _rshift_round(_mul8(x, cl_ref, 0))      # B @ x
        coef = _rshift_round(_mul8(t1, cr_ref, 1))   # .. @ B^T

        # per-8x8-block quant step expanded to pixel resolution IN VMEM by
        # two one-hot f32 matmuls (q <= ~131k < 2^24: exact). The r4 XLA
        # wrapper built the [H, W] q_px plane on HBM — 50 MB/frame of
        # round-trip at 4K (pltpu.repeat is np.tile, so the interleave
        # cannot be a kernel-side repeat; the matmul expansion can). The
        # q plane arrives as an 8-sublane-row block spanning the FULL lane
        # width (lane-dim blocks below 128 are unliftable; dynamic lane
        # slices must be 128-aligned): the one-hot selectors carry the
        # sub-block row offset (tiles of th=32 share a q block pairwise)
        # and the tile's global column window, both from program_id —
        # traced iota compares, no dynamic ref slicing.
        t8 = th // 8
        if batched:
            i, j = pl.program_id(1), pl.program_id(2)
            qblk = q_ref[0]                     # [8, W8] f32-safe int32
        else:
            i, j = pl.program_id(0), pl.program_id(1)
            qblk = q_ref[:]
        w8 = qblk.shape[-1]
        roff = (i * t8) % 8 if t8 < 8 else 0
        rsel = (
            jax.lax.broadcasted_iota(jnp.int32, (th, 8), 0) // 8 + roff
            == jax.lax.broadcasted_iota(jnp.int32, (th, 8), 1)
        ).astype(jnp.float32)
        csel = (
            jax.lax.broadcasted_iota(jnp.int32, (w8, tw), 0)
            == j * (tw // 8)
            + jax.lax.broadcasted_iota(jnp.int32, (w8, tw), 1) // 8
        ).astype(jnp.float32)
        # Precision.HIGHEST: the MXU's default f32 path truncates operands
        # toward bf16 passes; q reaches 2^17 and must survive exactly
        q = jax.lax.dot_general(
            jax.lax.dot_general(rsel, qblk.astype(jnp.float32),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST),
            csel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        if qmat:  # v3 per-position matrix (SPEC.md §13.2), folded in VMEM
            q = jnp.maximum(1, (q * qm_ref[:] + 8) >> 4)

        n = 16 * jnp.abs(coef) + bias_ref[:] * q
        mag = _exact_div(n, 16 * q)
        lv = jnp.where(coef < 0, -mag, mag)

        deq = lv * q
        u1 = _rshift_round(_mul8(deq, clt_ref, 0))   # B^T @ ..
        u2 = _rshift_round(_mul8(u1, crt_ref, 1))    # .. @ B
        rec = jnp.clip(u2 + pred, 0, 255)

        if batched:
            lv_ref[0] = lv
            rec_ref[0] = rec
        else:
            lv_ref[:] = lv
            rec_ref[:] = rec

    return kernel


def _qmat_tile(th: int, tw: int) -> np.ndarray:
    return np.tile(np.asarray(spec.QMAT, np.int32), (th // 8, tw // 8))


@functools.lru_cache(maxsize=16)
def _code_plane_call(h: int, w: int, qbias: int, qmat: bool = False):
    th = 64 if h % 64 == 0 else 32
    tw = 256 if w % 256 == 0 else 128
    gy, gx = h // th, w // tw
    kernel = _make_code_plane_kernel(th, tw, qbias, qmat=qmat)

    # broadcast constant tables (numpy module consts -> HLO literals)
    cl = _coef_table(th, 0, False)
    cr = _coef_table(tw, 1, False)
    clt = _coef_table(th, 0, True)
    crt = _coef_table(tw, 1, True)
    ri = np.arange(th) % 8
    ci = np.arange(tw) % 8
    bias16 = np.where(
        (ri[:, None] == 0) & (ci[None, :] == 0), 8, int(qbias)
    ).astype(np.int32)
    qm = _qmat_tile(th, tw)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    def call(cur, pred, q_blk):
        return pl.pallas_call(
            kernel,
            grid=(gy, gx),
            in_specs=[
                pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, w // 8), lambda i, j: (i * (th // 8) // 8, 0),
                             memory_space=pltpu.VMEM),
                const_spec((th, tw)),
                const_spec((th, tw)),
                const_spec((th, 15)),
                const_spec((15, tw)),
                const_spec((th, 15)),
                const_spec((15, tw)),
            ],
            out_specs=[
                pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((h, w), jnp.int32),
                jax.ShapeDtypeStruct((h, w), jnp.int32),
            ],
        )(cur, pred, q_blk, jnp.asarray(bias16), jnp.asarray(qm),
          jnp.asarray(cl), jnp.asarray(cr), jnp.asarray(clt),
          jnp.asarray(crt))

    return call


@functools.lru_cache(maxsize=16)
def _code_plane_call_g(gn: int, h: int, w: int, qbias: int,
                       qmat: bool = False):
    """GOP-batched twin of _code_plane_call: grid (G, gy, gx). Needed
    because vmap-of-pallas_call cannot batch this kernel's broadcast const
    operands cleanly on all backends; the batched-GOP scan routes here via
    the custom_vmap rule below."""
    th = 64 if h % 64 == 0 else 32
    tw = 256 if w % 256 == 0 else 128
    gy, gx = h // th, w // tw
    kernel = _make_code_plane_kernel(th, tw, qbias, batched=True, qmat=qmat)

    cl = _coef_table(th, 0, False)
    cr = _coef_table(tw, 1, False)
    clt = _coef_table(th, 0, True)
    crt = _coef_table(tw, 1, True)
    ri = np.arange(th) % 8
    ci = np.arange(tw) % 8
    bias16 = np.where(
        (ri[:, None] == 0) & (ci[None, :] == 0), 8, int(qbias)
    ).astype(np.int32)
    qm = _qmat_tile(th, tw)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda g, i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    def bspec():
        return pl.BlockSpec((1, th, tw), lambda g, i, j: (g, i, j),
                            memory_space=pltpu.VMEM)

    def call(cur, pred, q_blk):
        return pl.pallas_call(
            kernel,
            grid=(gn, gy, gx),
            in_specs=[
                bspec(), bspec(),
                pl.BlockSpec((1, 8, w // 8),
                             lambda g, i, j: (g, i * (th // 8) // 8, 0),
                             memory_space=pltpu.VMEM),
                const_spec((th, tw)),
                const_spec((th, tw)),
                const_spec((th, 15)),
                const_spec((15, tw)),
                const_spec((th, 15)),
                const_spec((15, tw)),
            ],
            out_specs=[bspec(), bspec()],
            out_shape=[
                jax.ShapeDtypeStruct((gn, h, w), jnp.int32),
                jax.ShapeDtypeStruct((gn, h, w), jnp.int32),
            ],
        )(cur, pred, q_blk, jnp.asarray(bias16), jnp.asarray(qm),
          jnp.asarray(cl), jnp.asarray(cr), jnp.asarray(clt),
          jnp.asarray(crt))

    return call


@functools.lru_cache(maxsize=8)
def _cp_public(qbias: int, qmat: bool):
    """custom_vmap entry for the padded fused kernel at a given qbias/qmat:
    plain call -> single-plane kernel; vmapped (batched-GOP scan) -> the
    G-grid kernel."""

    @jax.custom_batching.custom_vmap
    def fn(cur, pred, q_blk):
        h, w = cur.shape
        return _code_plane_call(h, w, qbias, qmat)(cur, pred, q_blk)

    @fn.def_vmap
    def _rule(axis_size, in_batched, cur, pred, q_blk):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        cur, pred, q_blk = (bc(x, b) for x, b in
                            zip((cur, pred, q_blk), in_batched))
        gn, h, w = cur.shape
        lv, rec = _code_plane_call_g(gn, h, w, qbias, qmat)(cur, pred, q_blk)
        return (lv, rec), (True, True)

    return fn


def code_plane(cur: jnp.ndarray, pred: jnp.ndarray, q_blk: jnp.ndarray,
               qbias: int = 8, qmat: bool = False):
    """Fused transform→quant→recon of one plane.

    cur, pred: [H, W] int32 (H, W multiples of 16); q_blk: [H/8, W/8] int32
    per-8x8-block quant steps. Returns (levels [H, W] int32 raster block
    layout, recon [H, W] int32) — bit-exact with the jnp path in
    pipeline/gop_engine._code_plane (levels there are zigzagged; callers
    apply ops/transform.zigzag to blockified levels). The per-pixel quant
    step is expanded from q_blk INSIDE the kernel (one-hot f32 matmuls;
    exact — the r4 wrapper's HBM q_px plane was 50 MB/frame of round-trip
    at 4K); qmat folds the v3 per-position matrix (SPEC.md §13.2) there
    too. Value bounds stay inside the module docstring proof:
    q <= 2.75x the flat step <= ~131k < 2^24, n <= 16*3925 + 8*4k < 2^20.
    """
    h, w = cur.shape
    th = 64 if h % 64 == 0 else 32
    tw = 256 if w % 256 == 0 else 128
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    if (hp, wp) != (h, w):
        cur = jnp.pad(cur, ((0, hp - h), (0, wp - w)))
        pred = jnp.pad(pred, ((0, hp - h), (0, wp - w)))
        q_blk = jnp.pad(
            q_blk, ((0, (hp - h) // 8), (0, (wp - w) // 8)),
            constant_values=1,
        )
    lv, rec = _cp_public(qbias, qmat)(cur, pred, q_blk)
    if (hp, wp) != (h, w):
        lv = lv[:h, :w]
        rec = rec[:h, :w]
    return lv, rec
