"""Pallas merge kernels for the entropy pack's bit-string reduction
(reference component C12; SURVEY.md §1 L3 "Pallas two-pass pack").

Two generations live here:

- chunk_merge (r3): K consecutive piece strings -> one chunk string per
  VMEM kernel instance. Measured EQUAL to the XLA tree_concat it
  replaced — both are bound by the same placement-pass work, and the
  per-instance reduction goes sublane-ragged past n=8.
- super_merge (r4, production): the same pairwise reduction restructured
  so every level stays sublane-full (two kernel stages: 1024 pieces -> 8
  strings, then 32 strings -> 8), the word placement runs as a fori_loop
  of DYNAMIC rotates bounded by the largest actual word offset (not the
  capacity width), and intermediate level widths are budgeted at half the
  worst case with exact overflow detection feeding the caller's
  worst-case rerun. Each change is measured in BASELINE.md round-4.

Bit-exact with entropy.tree_concat by construction when no budget
overflow is reported (same reduction order: left-associative over pieces
in index order — concatenation is associative, so any bracketing yields
the same bit string; equality is asserted on TPU in
tests/test_tpu_kernels.py and tools/check_pack.py).
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

    # Binary-decomposed word placement as a fori_loop with DYNAMIC
    # pltpu.roll: the r3 unrolled pad-and-select version kept every
    # iteration's full-width copy live (mosaic does no liveness reuse
    # across an unroll), which scaled the kernel's VMEM as
    # O(width * log(width)) and OOM'd the 16 MB scoped budget for the
    # super-merge shapes; the loop carry keeps it at O(width).
    # tpu.dynamic_rotate wants a 128-aligned lane dim, so the placement
    # runs on a padded copy. Correctness of the circular roll on the
    # padded buffer: every iteration masks lanes < sh to 0, and junk that
    # drifts into the padding region can only wrap back into lanes < sh
    # (masked), so lanes [0, w_out) always hold the exact shifted string.
    base = bits_a >> 5
    wp = -(-w_out // 128) * 128
    bsp = jnp.pad(bs, ((0, 0), (0, wp - w_out))) if wp != w_out else bs
    lanes = jax.lax.broadcasted_iota(jnp.int32, bsp.shape, 1)

    def place(k, b):
        sh = 1 << k
        hit = (base & sh) != 0
        shifted = jnp.where(lanes >= sh, pltpu.roll(b, sh, 1), 0)
        return jnp.where(hit, shifted, b)

    # loop bound = bitlength of the LARGEST actual word offset this level
    # (traced), not of the capacity width: strings typically fill ~1/12 of
    # their worst-case budget, so most of the static bound's iterations
    # are no-ops on every row — data-dependent iteration count, identical
    # bits (place() is the identity for k >= bitlen(max base)).
    nbk = max(1, (w_out - 1).bit_length())
    max_base = jnp.max(base)
    nbk_dyn = jnp.zeros((), jnp.int32)
    for k in range(nbk):
        nbk_dyn = nbk_dyn + (max_base >= (1 << k)).astype(jnp.int32)
    bs = jax.lax.fori_loop(0, nbk_dyn, place, bsp)[:, :w_out]

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


# ---------------------------------------------------------------------------
# r4 super-merge: the measured cost of BOTH tree_concat (2.4 ms/frame at
# 1080p, tools/exp_pack_parts_results.json) and the k=1024 chunk_merge
# (equal within noise) is their RAGGED TAIL — every level past n=8 runs on
# 1-4 sublanes of 8 and pays the word-placement passes on the widest
# arrays at ~12% VPU occupancy. The super merge runs the same pairwise
# reduction but keeps EVERY level sublane-full, in two kernel stages so no
# grid instance ever holds wide×many buffers (the 16 MB scoped-VMEM
# budget rejects a single-stage version — axon compile logs, r4):
#   stage 1: 1024-piece groups  -> 8 strings of 128 pieces (cw1 words)
#   stage 2: 32-string groups   -> 8 strings of 512 pieces (cw words)
# The ~n/512 span strings per frame are glued by the host mux
# (emit="chunks" — SURVEY.md §7.0 "host does bytes").
# ---------------------------------------------------------------------------

def _stage1_k(w: int) -> int:
    """Pieces per reduce-kernel instance: <= 1024 AND <= 32768 words of
    input, so no instance's unrolled level chain outgrows the 16 MB
    scoped-VMEM stack (r4 ran k=2048 at w=24 through the mid-size window
    and the single-stage h=256 shape compiled to a 17.83 M stack
    allocation — axon compile log, r5; 1024*24 is the shape production
    1080p runs, measured fine)."""
    k = 1024
    while k > 16 and k * w > 32768:
        k //= 2
    return k


SUPER_K = 4096  # pieces per final span string * 8 at the default stage-1 k


def span_geometry(n_pieces: int, w: int):
    """(padded_n, pieces_per_string, words_per_string, n_strings) for the
    super merge of n_pieces piece strings of w words each.

    IDEMPOTENT on its own padded_n (span_geometry(padded_n, w) returns the
    same tuple): the r4 version re-derived the geometry after padding and
    a 1920-piece frame padded to 2048 flipped from the budgeted k=1024
    shape to an unbudgeted k=2048 one that overran scoped VMEM on-chip
    (the r4 verdict's 320x192 CLI regression)."""
    k1 = _stage1_k(w)
    if n_pieces > 3 * k1:
        f = 4 * k1
        n2 = -(-n_pieces // f) * f
        cw1 = (k1 // 8) * w + 1
        h = k1 // 2
        return n2, h, 4 * cw1 + 1, n2 // h
    k = 16
    while k * 2 <= n_pieces and k < k1:
        k *= 2
    n2 = -(-n_pieces // k) * k
    if n2 > n_pieces:
        return span_geometry(n2, w)  # geometry OF the padded count
    h = k // 8
    return n2, h, h * w + 1, (n2 // k) * 8


def _reduce_loop(buf, bits, g: int, w: int, stop: int, cw: int,
                 bpp_w: int, wpp: int):
    """The in-kernel pairwise reduction: [g, w] strings -> ([stop, cw],
    [stop, 1], ovf [1, 1]). bpp_w budgets the INTERMEDIATE level widths: a
    string of m pieces is given min(exact, bpp_w*m + 1) words. Typical
    strings fill ~1/12 of their worst case, so a half-budget (bpp_w =
    block_words/2) halves the merge's placement work; truncation is
    detected exactly (a level whose true bit count exceeds its width sets
    the ovf output) and the caller's worst-case rerun re-encodes the GOP
    unbudgeted. wpp = pieces per input string (1 for stage 1)."""
    n, width = g, w
    m = wpp
    ovf = jnp.zeros((1, 1), jnp.int32)
    while n > stop:
        m *= 2
        w_out = min(2 * width + 1, cw)
        if m >= 64:  # see _merge_budget: averaging holds at span scale
            # never shrink below the incoming width (strings are
            # already that wide; growth just stops at the budget)
            w_out = max(min(w_out, bpp_w * m + 1), width)
        buf, bits = _merge_level(buf, bits, width, w_out)
        ovf = ovf | (jnp.max(bits) > 32 * w_out).astype(jnp.int32)
        width = w_out
        n //= 2
    if width < cw:
        buf = jnp.pad(buf, ((0, 0), (0, cw - width)))
    return buf, bits, ovf


def _make_reduce_kernel(g: int, w: int, stop: int, cw: int,
                        bpp_w: int, wpp: int):
    """Merge each [g, w] group of strings down to [stop, cw] in VMEM."""

    def kernel(pw_ref, pb_ref, out_w_ref, out_b_ref, ovf_ref):
        buf, bits, ovf = _reduce_loop(
            pw_ref[0], pb_ref[0], g, w, stop, cw, bpp_w, wpp
        )
        out_w_ref[0] = buf
        out_b_ref[0] = bits
        ovf_ref[0] = ovf

    return kernel


@functools.lru_cache(maxsize=32)
def _reduce_call(n_groups: int, g: int, w: int, stop: int, cw: int,
                 bpp_w: int, wpp: int):
    kernel = _make_reduce_kernel(g, w, stop, cw, bpp_w, wpp)

    def call(strings, bits):
        return pl.pallas_call(
            kernel,
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((1, g, w), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, stop, cw), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, stop, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_groups, stop, cw), jnp.uint32),
                jax.ShapeDtypeStruct((n_groups, stop, 1), jnp.int32),
                jax.ShapeDtypeStruct((n_groups, 1, 1), jnp.int32),
            ],
        )(strings, bits)

    return call


def _reduce(strings, bits, g: int, stop: int, cw: int, bpp_w: int, wpp: int):
    n, w = strings.shape
    call = _reduce_call(n // g, g, w, stop, cw, bpp_w, wpp)
    sw, sb, ov = call(
        strings.reshape(n // g, g, w),
        bits.reshape(n // g, g, 1).astype(jnp.int32),
    )
    return sw.reshape(n // g * stop, -1), sb.reshape(n // g * stop), ov.any()


def _merge_budget(w: int) -> int:
    """Intermediate-width budget in words per piece, applied ONLY to
    levels of m >= 64 pieces (8+ macroblocks — the scale where averaging
    holds; a first attempt budgeted every level and two adjacent dense
    blocks overflowed the m=2 cap at ordinary qp, thrashing worst-case
    reruns). r4 shipped bpp_w = w/2; the r5 A/B measured w/4 another
    0.4 ms/frame faster at 4K with zero overflows at qp 14-30 on the bench
    content (>= 64 consecutive pieces must AVERAGE > 8*bpp_w bits each to
    overflow — 1/4 of worst case over 8+ macroblocks). Genuine overflows
    are detected exactly and re-encoded through the unbudgeted worst-case
    path."""
    from ...codec import entropy as _e

    if w >= _e.BLOCK_WORDS_MAX:
        return w
    return max(w // 4, 2)


def _super_merge_impl(buffers: jnp.ndarray, bits: jnp.ndarray,
                      n_frame: int | None = None):
    """n_frame: per-frame piece count for batched callers — the geometry
    must come from ONE frame's count (the vmap rule folds g frames into
    the piece axis; deriving geometry from g*n could change the branch
    and the per-frame string count, mis-slicing the batch reshape)."""
    n, w = buffers.shape
    nf = n if n_frame is None else n_frame
    n2, h, cw, n_strings = span_geometry(nf, w)
    assert nf == n2, "caller pads to span_geometry's padded_n"
    assert n % nf == 0
    bpp_w = _merge_budget(w)
    k1 = _stage1_k(w)
    if h == k1 // 2:  # two-stage shape (single-stage h is always <= k1/8)
        m1 = k1 // 8  # pieces per stage-1 string
        cw1 = m1 * w + 1
        if m1 >= 64:
            cw1 = min(cw1, bpp_w * m1 + 1)  # see _merge_budget
        s1w, s1b, ov1 = _reduce(buffers, bits, k1, 8, cw1, bpp_w, 1)
        cwf = min(cw, bpp_w * 4 * m1 + 1) if 4 * m1 >= 64 else cw
        sw, sb, ov2 = _reduce(s1w, s1b, 32, 8, cwf, bpp_w, m1)
        return sw, sb, ov1 | ov2
    cap = min(cw, bpp_w * h + 1) if h >= 64 else cw
    return _reduce(buffers, bits, h * 8, 8, cap, bpp_w, 1)


@functools.lru_cache(maxsize=2)
def _super_merge_public():
    @jax.custom_batching.custom_vmap
    def fn(buffers, bits):
        return _super_merge_impl(buffers, bits)

    @fn.def_vmap
    def _rule(axis_size, in_batched, buffers, bits):
        if not in_batched[0]:
            buffers = jnp.broadcast_to(buffers, (axis_size,) + buffers.shape)
        if not in_batched[1]:
            bits = jnp.broadcast_to(bits, (axis_size,) + bits.shape)
        g, n, w = buffers.shape
        _, _, _, n_strings = span_geometry(n, w)
        cw_, cb_, ov = _super_merge_impl(
            buffers.reshape(g * n, w), bits.reshape(g * n), n_frame=n
        )
        # one span's overflow triggers the caller's whole-batch rerun, so
        # the scalar flag broadcasts over the batch axis
        return (cw_.reshape(g, n_strings, -1), cb_.reshape(g, n_strings),
                jnp.broadcast_to(ov, (g,))), (True, True, True)

    return fn


def super_merge(buffers: jnp.ndarray, bits: jnp.ndarray):
    """Merge piece strings into span strings, sublane-full at every level.

    buffers [n, w] uint32, bits [n] int32; n must equal span_geometry's
    padded_n (pad with zero-length pieces). Returns (strings
    [n_strings, <=cw] uint32, bits [n_strings], overflow) in piece order;
    when overflow is False the strings are byte-exact with
    entropy.tree_concat over each span's pieces (intermediate widths are
    budgeted — see _merge_budget — and overflow reports any truncation)."""
    return _super_merge_public()(buffers, bits)


# ---------------------------------------------------------------------------
# r5 MB-source stage 1: the XLA concatenate that assembled the zero-padded
# [n_mbs, 8, W] piece array for super_merge measured 1.8 ms/frame at 4K
# (in-engine sub-ablation: 34.5 -> 32.8 with the concat replaced by a
# broadcast) — it writes ~33 MB of mostly padding to HBM only for stage 1
# to read it straight back. super_merge_mb instead takes the four compact
# per-MB sources (header / 4 luma pieces / Cb / Cr word strings) and
# interleaves them into the [g, w] piece buffer INSIDE the stage-1 kernel:
# a VMEM-side concat along a middle axis + sublane reshape, no HBM
# round-trip. piece_bits stay XLA-assembled (1 MB — negligible).
# ---------------------------------------------------------------------------


def _make_mb_stage1_kernel(gmb: int, w: int, stop: int, cw: int, bpp_w: int):
    """Stage-1 reduce whose instance assembles its g = gmb*8 pieces from
    per-MB sources: rows 8m+(0..7) = header (lane-padded), Y00..Y11, Cb,
    Cr, empty — the exact _frame_pieces order (codec/entropy.py)."""

    def kernel(hw_ref, yw_ref, cbw_ref, crw_ref, pb_ref,
               out_w_ref, out_b_ref, ovf_ref):
        hpad = jnp.pad(hw_ref[0], ((0, 0), (0, w - hw_ref.shape[-1])))
        pieces = jnp.concatenate(
            [
                hpad[:, None, :],
                yw_ref[0],
                cbw_ref[0][:, None, :],
                crw_ref[0][:, None, :],
                jnp.zeros((gmb, 1, w), jnp.uint32),
            ],
            axis=1,
        )  # [gmb, 8, w]
        buf = pieces.reshape(gmb * 8, w)
        buf, bits, ovf = _reduce_loop(
            buf, pb_ref[0], gmb * 8, w, stop, cw, bpp_w, 1
        )
        out_w_ref[0] = buf
        out_b_ref[0] = bits
        ovf_ref[0] = ovf

    return kernel


@functools.lru_cache(maxsize=32)
def _mb_stage1_call(n_groups: int, gmb: int, hww: int, w: int, stop: int,
                    cw: int, bpp_w: int):
    kernel = _make_mb_stage1_kernel(gmb, w, stop, cw, bpp_w)

    def call(hw, yw, cbw, crw, pb):
        return pl.pallas_call(
            kernel,
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((1, gmb, hww), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gmb, 4, w), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gmb, w), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gmb, w), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gmb * 8, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, stop, cw), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, stop, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_groups, stop, cw), jnp.uint32),
                jax.ShapeDtypeStruct((n_groups, stop, 1), jnp.int32),
                jax.ShapeDtypeStruct((n_groups, 1, 1), jnp.int32),
            ],
        )(hw, yw, cbw, crw, pb)

    return call


def _pad_mb_rows(a, n_mbs2):
    n = a.shape[0]
    if n == n_mbs2:
        return a
    return jnp.pad(a, ((0, n_mbs2 - n),) + ((0, 0),) * (a.ndim - 1))


def _super_merge_mb_impl(hw, yw, cbw, crw, piece_bits,
                         n_frame: int | None = None):
    """Per-MB sources -> span strings. hw [n_mbs, HW] u32, yw [n_mbs, 4, w]
    u32 (piece order), cbw/crw [n_mbs, w] u32, piece_bits [n_mbs*8] i32
    (already in piece order, zero for the empty 8th piece). See
    _super_merge_impl for n_frame (batched callers pre-pad each frame to
    span_geometry's padded_n)."""
    n_mbs, _, w = yw.shape
    n = n_mbs * 8
    if n_frame is None:
        n2, h, cw, n_strings = span_geometry(n, w)
        n_mbs2 = n2 // 8
        hw = _pad_mb_rows(hw, n_mbs2)
        yw = _pad_mb_rows(yw, n_mbs2)
        cbw = _pad_mb_rows(cbw, n_mbs2)
        crw = _pad_mb_rows(crw, n_mbs2)
        if piece_bits.shape[0] != n2:
            piece_bits = jnp.pad(piece_bits, (0, n2 - piece_bits.shape[0]))
    else:
        n2, h, cw, n_strings = span_geometry(n_frame, w)
        assert n_frame == n2 and n % n2 == 0
        n_mbs2 = n_mbs
    bpp_w = _merge_budget(w)
    k1 = _stage1_k(w)
    if h == k1 // 2:  # two-stage shape
        m1 = k1 // 8
        cw1 = m1 * w + 1
        if m1 >= 64:
            cw1 = min(cw1, bpp_w * m1 + 1)
        gmb = k1 // 8
        call = _mb_stage1_call(n_mbs2 // gmb, gmb, hw.shape[-1], w, 8, cw1,
                               bpp_w)
        s1w, s1b, ov1 = call(
            hw.reshape(n_mbs2 // gmb, gmb, -1),
            yw.reshape(n_mbs2 // gmb, gmb, 4, w),
            cbw.reshape(n_mbs2 // gmb, gmb, w),
            crw.reshape(n_mbs2 // gmb, gmb, w),
            piece_bits.reshape(n_mbs2 // gmb, gmb * 8, 1).astype(jnp.int32),
        )
        s1w = s1w.reshape(-1, cw1)
        s1b = s1b.reshape(-1)
        cwf = min(cw, bpp_w * 4 * m1 + 1) if 4 * m1 >= 64 else cw
        sw, sb, ov2 = _reduce(s1w, s1b, 32, 8, cwf, bpp_w, m1)
        return sw, sb, ov1.any() | ov2
    # single-stage shape: k = 8h pieces per instance = h MBs
    gmb = h
    cap = min(cw, bpp_w * h + 1) if h >= 64 else cw
    call = _mb_stage1_call(n_mbs2 // gmb, gmb, hw.shape[-1], w, 8, cap, bpp_w)
    sw, sb, ov = call(
        hw.reshape(n_mbs2 // gmb, gmb, -1),
        yw.reshape(n_mbs2 // gmb, gmb, 4, w),
        cbw.reshape(n_mbs2 // gmb, gmb, w),
        crw.reshape(n_mbs2 // gmb, gmb, w),
        piece_bits.reshape(n_mbs2 // gmb, gmb * 8, 1).astype(jnp.int32),
    )
    return sw.reshape(-1, sw.shape[-1]), sb.reshape(-1), ov.any()


@functools.lru_cache(maxsize=2)
def _super_merge_mb_public():
    @jax.custom_batching.custom_vmap
    def fn(hw, yw, cbw, crw, piece_bits):
        return _super_merge_mb_impl(hw, yw, cbw, crw, piece_bits)

    @fn.def_vmap
    def _rule(axis_size, in_batched, hw, yw, cbw, crw, piece_bits):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        hw, yw, cbw, crw, piece_bits = (
            bc(x, b) for x, b in
            zip((hw, yw, cbw, crw, piece_bits), in_batched)
        )
        g, n_mbs = yw.shape[:2]
        n = n_mbs * 8
        w = yw.shape[-1]
        n2, _, _, n_strings = span_geometry(n, w)
        if n2 != n:  # pad each frame's MB axis to the span geometry
            def padf(a):
                return jnp.pad(a, ((0, 0), (0, n2 // 8 - n_mbs))
                               + ((0, 0),) * (a.ndim - 2))
            hw, yw, cbw, crw = padf(hw), padf(yw), padf(cbw), padf(crw)
            piece_bits = jnp.pad(piece_bits, ((0, 0), (0, n2 - n)))
        nm2 = n2 // 8
        cw_, cb_, ov = _super_merge_mb_impl(
            hw.reshape(g * nm2, -1),
            yw.reshape(g * nm2, 4, w),
            cbw.reshape(g * nm2, -1),
            crw.reshape(g * nm2, -1),
            piece_bits.reshape(g * n2), n_frame=n2,
        )
        return (cw_.reshape(g, n_strings, -1), cb_.reshape(g, n_strings),
                jnp.broadcast_to(ov, (g,))), (True, True, True)

    return fn


def super_merge_mb(hw, yw, cbw, crw, piece_bits):
    """super_merge from per-MB piece sources (header/Y×4/Cb/Cr word
    strings + piece-order bit counts): identical output strings, no HBM
    materialization of the [n_mbs, 8, w] piece array."""
    return _super_merge_mb_public()(hw, yw, cbw, crw, piece_bits)
