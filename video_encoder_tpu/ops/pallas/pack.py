"""Pallas chunk-merge kernel for the entropy pack's bit-string reduction
(reference component C12; SURVEY.md §1 L3 "Pallas two-pass pack").

The corrected DCE ablation (tools/ablate_dce_results.json) puts the v1/v2
entropy pack at 5.2 of the 10.5 ms/frame 1080p floor — and inside it, the
XLA tree_concat dominates: every merge level re-streams the whole string
array through HBM O(log W) times for the binary-decomposed word placement
(~16 levels x ~6 MB x up to 18 passes ≈ most of the program's ~1 GB/frame
accounted traffic). Per-piece symbol work is tiny; the merge is pure data
movement — exactly what VMEM is for.

This kernel merges K consecutive piece strings into ONE chunk string
entirely in VMEM: the same pairwise algorithm as entropy.tree_concat
(carry shift + binary-decomposed word placement), but every intermediate
level lives on-chip, so HBM sees only the K*W-word input once and the
chunk string once. The few chunk strings are then folded on the XLA side
with per-chunk dynamic_update_slice placement (codec/entropy.py
tree_concat_chunked) — cheap because there are only a handful.

Bit-exact with entropy.tree_concat by construction (same reduction order:
left-associative over pieces in index order — concatenation is
associative, so any bracketing yields the same bit string; equality is
asserted on TPU in tests/test_tpu_kernels.py and tools/check_pack.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_level(buf, bits, w: int, w_out: int):
    """One pairwise merge level on VMEM values.

    buf [n, w] uint32 MSB-first word strings; bits [n, 1] int32 lengths.
    Returns ([n/2, w_out], [n/2, 1]). Identical math to
    entropy.tree_concat's level (carry shift + kbit word placement).
    Pairing splits the SUBLANE dim only (mosaic rejects lane-dim
    reshapes); widths grow by lane-dim pad/concat, which is supported."""
    n = buf.shape[0]
    # Extract BOTH pair members at sublane offset 0: the odd rows come from
    # a sublane roll then the same even-position slice (a direct
    # pair[:, 1, :] slice carries sublane offset 1, and mosaic refuses to
    # concatenate lanes across mismatched non-concat-dim offsets).
    rolled = pltpu.roll(buf, (n - 1) % n, 0)
    rolled_bits = pltpu.roll(bits, (n - 1) % n, 0)
    a = buf.reshape(n // 2, 2, w)[:, 0, :]
    b = rolled.reshape(n // 2, 2, w)[:, 0, :]
    bits_a = bits.reshape(n // 2, 2, 1)[:, 0, :]
    bits_b = rolled_bits.reshape(n // 2, 2, 1)[:, 0, :]

    s = (bits_a & 31).astype(jnp.uint32)
    ext = jnp.concatenate([b, jnp.zeros((n // 2, 1), jnp.uint32)], axis=1)
    prev = jnp.concatenate([jnp.zeros((n // 2, 1), jnp.uint32), b], axis=1)
    bs = jnp.where(s > 0, (ext >> s) | (prev << (32 - s)), ext)  # [n/2, w+1]
    if bs.shape[1] < w_out:
        bs = jnp.pad(bs, ((0, 0), (0, w_out - bs.shape[1])))
    else:
        bs = bs[:, :w_out]

    base = bits_a >> 5
    kbit = 0
    while (1 << kbit) < w_out:
        hit = (base & (1 << kbit)) != 0
        shifted = jnp.pad(bs, ((0, 0), (1 << kbit, 0)))[:, :w_out]
        bs = jnp.where(hit, shifted, bs)
        kbit += 1

    a_pad = jnp.pad(a, ((0, 0), (0, w_out - w)))
    return a_pad | bs, bits_a + bits_b


def _make_chunk_kernel(k: int, w: int, cw: int):
    def kernel(pw_ref, pb_ref, out_w_ref, out_b_ref):
        buf = pw_ref[0]          # [k, w] uint32
        bits = pb_ref[0]         # [k, 1] int32
        n, width = k, w
        while n > 2:             # stop at 2: the n=2 level's roll/concat
            w_out = min(2 * width + 1, cw)   # hits a mosaic layout-offset
            buf, bits = _merge_level(buf, bits, width, w_out)  # limitation;
            width = w_out                    # the XLA fold merges the pair
            n //= 2
        if width < cw:
            buf = jnp.pad(buf, ((0, 0), (0, cw - width)))
        out_w_ref[0] = buf          # [2, cw] vector store
        out_b_ref[0] = bits         # [2, 1]

    return kernel


@functools.lru_cache(maxsize=16)
def _chunk_call(n_chunks: int, k: int, w: int):
    # per-chunk output: TWO half-chunk strings (k/2 pieces each); exact
    # capacity per half: total bits <= (k/2)*32*w, +1 carry word
    cw = (k // 2) * w + 1
    kernel = _make_chunk_kernel(k, w, cw)

    def call(pieces, bits):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, k, w), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 2, cw), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks, 2, cw), jnp.uint32),
                jax.ShapeDtypeStruct((n_chunks, 2, 1), jnp.int32),
            ],
        )(pieces, bits)

    return call, cw


def pick_chunk_k(n: int, w: int) -> int:
    """Chunk size (pieces per kernel instance; the kernel emits two
    half-chunk strings). Sized so the widest in-kernel level stays a few
    hundred KB: mosaic keeps several copies of the widest level live
    during the placement unroll (an 8192-piece chunk compiled 42 min and
    then OOM'd scoped VMEM at 61 MB)."""
    k = 1024
    while k * w > 32768 and k > 16:
        k //= 2
    while k > n:
        k //= 2
    return max(k, 2)


def _chunk_merge_impl(buffers: jnp.ndarray, bits: jnp.ndarray, k: int):
    n, w = buffers.shape
    n_chunks = n // k
    call, cw = _chunk_call(n_chunks, k, w)
    cwords, cbits = call(
        buffers.reshape(n_chunks, k, w),
        bits.reshape(n_chunks, k, 1).astype(jnp.int32),
    )
    return cwords.reshape(n_chunks * 2, cw), cbits.reshape(n_chunks * 2)


@functools.lru_cache(maxsize=8)
def _chunk_merge_public(k: int):
    @jax.custom_batching.custom_vmap
    def fn(buffers, bits):
        return _chunk_merge_impl(buffers, bits, k)

    @fn.def_vmap
    def _rule(axis_size, in_batched, buffers, bits):
        # chunks are independent: fold the batch axis into the chunk grid
        if not in_batched[0]:
            buffers = jnp.broadcast_to(buffers, (axis_size,) + buffers.shape)
        if not in_batched[1]:
            bits = jnp.broadcast_to(bits, (axis_size,) + bits.shape)
        g, n, w = buffers.shape
        cw_, cb_ = _chunk_merge_impl(
            buffers.reshape(g * n, w), bits.reshape(g * n), k
        )
        ns = (n // k) * 2  # two half-chunk strings per chunk
        return (cw_.reshape(g, ns, -1), cb_.reshape(g, ns)), (True, True)

    return fn


def chunk_merge(buffers: jnp.ndarray, bits: jnp.ndarray, k: int):
    """Merge consecutive groups of k piece strings in VMEM.

    buffers [n, w] uint32, bits [n] int32, n divisible by k (pad with
    zero-length pieces first). Returns TWO half-chunk strings per chunk:
    (chunk_words [2n/k, (k/2)*w+1], chunk_bits [2n/k]), in piece order.
    vmap folds the batch axis into the chunk grid."""
    return _chunk_merge_public(k)(buffers, bits)
