"""Device-side two-pass parallel entropy pack (SPEC.md §6–7).

The reference's serial bitwriter (SURVEY.md §3.1 hot loop; component C12) is
re-designed TPU-first per SURVEY.md §7.0: pass 1 computes every symbol's
(value, bit-length) in parallel over the whole MB grid with static
Exp-Golomb tables-as-formulas; pass 2 is an exclusive prefix-sum of lengths
plus a shifted scatter-add into the output uint32 word array. No sequential
bit I/O anywhere on the encode path.

Symbol slot layout per MB (fixed S slots; unused slots carry length 0 and
vanish in the pack — "early-exit becomes slot-freeze"):

  slot 0                  mb_mode   (ue; P frames only)
  slot 1, 2               se(dx), se(dy)   (inter MBs only)
  slot 3                  se(qp_delta)
  per block b in [0,6):   base = 4 + b*130
    base+0                cbf bit
    base+1                ue(nnz-1)        (if cbf)
    base+2+2i, base+3+2i  ue(run_i), se(level_i) for zigzag position i
                          (nonzero coefficients only)

S = 4 + 6*(2 + 128) = 784. Bit-exact against codec/bitio.BitWriter as used
by the golden model (tests/test_device.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import spec

SLOTS_PER_BLOCK = 2 + 2 * 64
SLOTS_PER_MB = 4 + 6 * SLOTS_PER_BLOCK  # 784
# Worst-case bits per MB: mode(3) + mv(2*11) + qp_delta(13)
#   + 6 * (cbf(1) + nnz(13) + 64 * (run(13) + level(25))) = 14714
MAX_MB_BITS = 3 + 22 + 13 + 6 * (1 + 13 + 64 * (13 + 25))


def _bitlen(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) + 1 for x>=1, 0 for x==0 (int32)."""
    return jnp.where(x > 0, 32 - jax.lax.clz(x.astype(jnp.int32)), 0)


def ue_code(v: jnp.ndarray):
    """(value, length) of ue(v): value = v+1 in 2*bitlen(v+1)-1 bits."""
    vp1 = v.astype(jnp.int32) + 1
    return vp1.astype(jnp.uint32), (2 * _bitlen(vp1) - 1).astype(jnp.int32)


def se_code(v: jnp.ndarray):
    """(value, length) of se(v) = ue(2v-1 if v>0 else -2v)."""
    m = jnp.where(v > 0, 2 * v - 1, -2 * v)
    return ue_code(m)


def mb_symbols(
    levels_zz: jnp.ndarray,  # [nby, nbx, 6, 64] int32, zigzag order
    qp_delta: jnp.ndarray,   # [nby, nbx] int32
    is_p_frame: jnp.ndarray, # scalar bool/int32
    is_inter: jnp.ndarray,   # [nby, nbx] bool
    dy: jnp.ndarray,         # [nby, nbx] int32
    dx: jnp.ndarray,
):
    """Pass 1: per-MB symbol (values, lengths) arrays [nby, nbx, S]."""
    nby, nbx = qp_delta.shape
    p = jnp.asarray(is_p_frame, jnp.bool_)

    # header symbols -------------------------------------------------------
    mode_val, mode_len = ue_code(jnp.where(is_inter, 0, 1))
    mode_len = jnp.where(p, mode_len, 0)
    inter_p = is_inter & p
    dx_val, dx_len = se_code(dx)
    dy_val, dy_len = se_code(dy)
    dx_len = jnp.where(inter_p, dx_len, 0)
    dy_len = jnp.where(inter_p, dy_len, 0)
    qpd_val, qpd_len = se_code(qp_delta)

    # coefficient symbols --------------------------------------------------
    nz = levels_zz != 0                       # [nby, nbx, 6, 64]
    nnz = nz.sum(axis=-1).astype(jnp.int32)   # [nby, nbx, 6]
    cbf = nnz > 0

    idx = jnp.arange(64, dtype=jnp.int32)
    masked_idx = jnp.where(nz, idx, -1)
    cm = jax.lax.cummax(masked_idx, axis=masked_idx.ndim - 1)
    prev_nz = jnp.concatenate(
        [jnp.full((*cm.shape[:-1], 1), -1, jnp.int32), cm[..., :-1]], axis=-1
    )
    run = idx - prev_nz - 1                   # valid where nz

    run_val, run_len = ue_code(jnp.where(nz, run, 0))
    lev_val, lev_len = se_code(levels_zz)
    run_len = jnp.where(nz, run_len, 0)
    lev_len = jnp.where(nz, lev_len, 0)

    cbf_val = cbf.astype(jnp.uint32)
    cbf_len = jnp.ones_like(nnz)
    nnz_val, nnz_len = ue_code(jnp.maximum(nnz - 1, 0))
    nnz_len = jnp.where(cbf, nnz_len, 0)

    # interleave run/level into [..., 6, 128] then assemble [..., S] -------
    coeff_val = jnp.stack([run_val, lev_val], axis=-1).reshape(nby, nbx, 6, 128)
    coeff_len = jnp.stack([run_len, lev_len], axis=-1).reshape(nby, nbx, 6, 128)
    block_val = jnp.concatenate(
        [cbf_val[..., None], nnz_val[..., None], coeff_val], axis=-1
    )  # [nby, nbx, 6, 130]
    block_len = jnp.concatenate(
        [cbf_len[..., None], nnz_len[..., None], coeff_len], axis=-1
    )

    head_val = jnp.stack([mode_val, dx_val, dy_val, qpd_val], axis=-1)
    head_len = jnp.stack([mode_len, dx_len, dy_len, qpd_len], axis=-1)

    values = jnp.concatenate(
        [head_val, block_val.reshape(nby, nbx, -1)], axis=-1
    ).astype(jnp.uint32)
    lengths = jnp.concatenate([head_len, block_len.reshape(nby, nbx, -1)], axis=-1)
    # zero the value wherever the length is zero (keeps the pack trivially safe)
    values = jnp.where(lengths > 0, values, 0)
    return values, lengths.astype(jnp.int32)


def pack_bits(values: jnp.ndarray, lengths: jnp.ndarray, n_words: int):
    """Pass 2: MSB-first scatter-pack of flat (value, length) symbol arrays.

    Returns (words uint32 [n_words], total_bits int32). Bit-exact with
    bitio.BitWriter.words(). Each symbol touches at most 2 output words;
    disjoint bit ranges make add equivalent to or.
    """
    values = values.reshape(-1).astype(jnp.uint32)
    lengths = lengths.reshape(-1).astype(jnp.int32)
    offsets = jnp.cumsum(lengths) - lengths  # exclusive prefix sum
    total_bits = offsets[-1] + lengths[-1] if lengths.size else jnp.int32(0)

    w = (offsets >> 5).astype(jnp.int32)
    s = (offsets & 31).astype(jnp.int32)
    fits = (s + lengths) <= 32

    sh1 = jnp.clip(jnp.where(fits, 32 - s - lengths, lengths - (32 - s)), 0, 31)
    c1 = jnp.where(
        fits, values << sh1.astype(jnp.uint32), values >> sh1.astype(jnp.uint32)
    )
    sh2 = jnp.clip(64 - s - lengths, 0, 31)
    c2 = jnp.where(fits, jnp.uint32(0), values << sh2.astype(jnp.uint32))

    live = lengths > 0
    c1 = jnp.where(live, c1, 0)
    c2 = jnp.where(live & ~fits, c2, 0)

    words = jnp.zeros((n_words,), jnp.uint32)
    words = words.at[w].add(c1, mode="drop")
    words = words.at[w + 1].add(c2, mode="drop")
    return words, total_bits


def max_words(n_mbs: int) -> int:
    """Static worst-case word count for a frame of n_mbs macroblocks."""
    return (n_mbs * MAX_MB_BITS + 31) // 32 + 1


def mb_bit_counts(lengths: jnp.ndarray) -> jnp.ndarray:
    """Per-MB bit totals [nby, nbx] from the [nby, nbx, S] length array."""
    return lengths.sum(axis=-1)
