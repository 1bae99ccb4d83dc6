"""Tile-parallel (spatially sharded) encode with halo exchange
(BASELINE.json config 5; SURVEY.md §2.1 TP/SP rows).

One frame's MB grid is sharded along MB rows over the 'tile' mesh axis.
Motion search reads reference pixels up to ±16 px past the shard edge, so
each step exchanges 16-row boundary strips of the *reconstruction* with
mesh neighbors via `ppermute` (the halo), or optionally `all_gather`s the
whole reference frame (the Ulysses-shaped variant, [B:5]); boundary shards
edge-replicate instead, which keeps the sharded encode bit-identical to the
unsharded one (tile-seam invariant, SURVEY.md §4.5).

Because the TVC1 MB syntax has no cross-MB prediction chains (SPEC.md §7:
qp_delta codes against the frame base, raw mvs), a frame's payload is the
plain bit-concatenation of the per-shard payloads in tile order — the host
mux glues shards with a word-shift, no re-encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..codec import entropy, spec
from ..ops import dispatch, motion, transform as tx
from ..pipeline.gop_engine import _code_frame

HALO_Y = spec.SEARCH_R  # 16 luma halo rows
HALO_C = spec.BLK       # 8 chroma halo rows


def exchange_halo(plane, halo, axis_name):
    """[h, w] shard -> [h + 2*halo, w] with neighbor strips via ppermute.

    Boundary shards edge-replicate their own first/last rows, matching the
    unsharded pad_ref semantics exactly.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_own = jnp.repeat(plane[:1], halo, axis=0)
    bot_own = jnp.repeat(plane[-1:], halo, axis=0)
    if n == 1:
        return jnp.concatenate([top_own, plane, bot_own], axis=0)
    # my bottom rows -> next shard's top halo; my top rows -> prev's bottom
    from_prev = jax.lax.ppermute(
        plane[-halo:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        plane[:halo], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    top = jnp.where(idx == 0, top_own, from_prev)
    bot = jnp.where(idx == n - 1, bot_own, from_next)
    return jnp.concatenate([top, plane, bot], axis=0)


def gather_ref(plane, halo, axis_name):
    """all_gather variant: full frame to every shard, then local+halo slice."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    full = jax.lax.all_gather(plane, axis_name, tiled=True)  # [h*n, w]
    h = plane.shape[0]
    padded = jnp.concatenate(
        [jnp.repeat(full[:1], halo, 0), full, jnp.repeat(full[-1:], halo, 0)], 0
    )
    return jax.lax.dynamic_slice_in_dim(padded, idx * h, h + 2 * halo, 0)


def _full_search_haloed(cur, ref_ext):
    """Full search where ref_ext already carries the vertical halo rows."""
    h, w = cur.shape
    refpad = jnp.pad(ref_ext, ((0, 0), (spec.SEARCH_R, spec.SEARCH_R)), mode="edge")

    def step(carry, k):
        best_sad, best_k = carry
        dy = k // (2 * spec.SEARCH_R + 1)
        dx = k % (2 * spec.SEARCH_R + 1)
        shifted = jax.lax.dynamic_slice(refpad, (dy, dx), (h, w))
        sad = tx.blockify(jnp.abs(cur - shifted), spec.MB).sum(axis=(2, 3))
        better = sad < best_sad
        return (jnp.where(better, sad, best_sad), jnp.where(better, k, best_k)), None

    nby, nbx = h // spec.MB, w // spec.MB
    init = (jnp.full((nby, nbx), motion.BIG, jnp.int32), jnp.zeros((nby, nbx), jnp.int32))
    (best, idx), _ = jax.lax.scan(
        step, init, jnp.arange(spec.N_CAND, dtype=jnp.int32)
    )
    dy = idx // (2 * spec.SEARCH_R + 1) - spec.SEARCH_R
    dx = idx % (2 * spec.SEARCH_R + 1) - spec.SEARCH_R
    return dy, dx, best


def _mc_haloed(ref_ext, dy, dx, bs, r):
    refpad = jnp.pad(ref_ext, ((0, 0), (r, r)), mode="edge")
    return tx.unblockify(motion.mc_fetch(refpad, dy, dx, bs, r))


def encode_frame_tile_traced(
    cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr, base_qp,
    *, is_p: bool, rc: str, block_words: int, cap_words: int,
    axis_name: str = "tile", ref_mode: str = "halo",
    fmt: int = 1, cqpo: int = 0, qbias: int = 8,
):
    """Per-shard frame encode; cur_/ref_ planes are local row shards.

    Collectives: halo ppermute (or all_gather) for the reference, psum for
    the frame bit total. Returns local payload words/bits + recon shards.
    """
    dc, icost = motion.intra_cost_and_dc(cur_y)
    nby, nbx = icost.shape

    if is_p:
        fetch = exchange_halo if ref_mode == "halo" else gather_ref
        ref_y_ext = fetch(ref_y, HALO_Y, axis_name)
        ref_cb_ext = fetch(ref_cb, HALO_C, axis_name)
        ref_cr_ext = fetch(ref_cr, HALO_C, axis_name)
        dy, dx, best_sad = _full_search_haloed(cur_y, ref_y_ext)
        is_inter = best_sad <= icost
        m_y = jnp.repeat(jnp.repeat(is_inter, spec.MB, 0), spec.MB, 1)
        m_c = jnp.repeat(jnp.repeat(is_inter, spec.BLK, 0), spec.BLK, 1)
        cdy, cdx = dy >> 1, dx >> 1
        pred_y = jnp.where(m_y, _mc_haloed(ref_y_ext, dy, dx, spec.MB, HALO_Y), 128)
        pred_cb = jnp.where(m_c, _mc_haloed(ref_cb_ext, cdy, cdx, spec.BLK, HALO_C), 128)
        pred_cr = jnp.where(m_c, _mc_haloed(ref_cr_ext, cdy, cdx, spec.BLK, HALO_C), 128)
    else:
        dy = jnp.zeros((nby, nbx), jnp.int32)
        dx = jnp.zeros((nby, nbx), jnp.int32)
        is_inter = jnp.zeros((nby, nbx), jnp.bool_)
        pred_y = jnp.full_like(cur_y, 128)
        pred_cb = jnp.full_like(cur_cb, 128)
        pred_cr = jnp.full_like(cur_cr, 128)

    if rc == "adaptive":
        qp_mb = motion.adaptive_qp(base_qp, icost)
    else:
        qp_mb = jnp.full((nby, nbx), base_qp, jnp.int32)

    (lz_y, lz_cb, lz_cr), rec_y, rec_cb, rec_cr = _code_frame(
        cur_y, cur_cb, cur_cr, pred_y, pred_cb, pred_cr, qp_mb,
        cqpo if fmt >= 2 else 0, qbias,
    )
    # v2 prediction is left-only within MB rows (SPEC.md §12), so the
    # row-sharded pack needs no cross-shard state
    pack = entropy.pack_frame_planes_v2 if fmt >= 2 else entropy.pack_frame_planes
    words, bits, mb_bits, ovf_p = pack(
        lz_y, lz_cb, lz_cr, qp_mb - base_qp, jnp.asarray(is_p), is_inter,
        dy, dx, block_words, cap_words,
    )
    frame_bits = jax.lax.psum(bits, axis_name)  # RC/stats aggregate over tiles
    return dict(
        words=words, bits=bits, frame_bits=frame_bits, ovf=ovf_p,
        n_inter=is_inter.sum().astype(jnp.int32),
        rec_y=rec_y, rec_cb=rec_cb, rec_cr=rec_cr,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "rc", "block_words", "cap_words",
                     "target_bits", "ref_mode", "fmt", "cqpo"),
)
def encode_gop_tiled(
    y_u8, cb_u8, cr_u8, base_qp,
    *, mesh, rc, block_words, cap_words, target_bits, ref_mode="halo",
    fmt: int = 1, cqpo: int = 0, qbias: int = 8, vbv_bits: int = 0,
):
    """GOP encode with frames row-sharded over the 'tile' mesh axis.

    y_u8: [T, H, W] uint8 (H/16 divisible by tile devices). Output words/
    bits are per-shard, P('tile') on their leading shard axis.
    """

    def per_shard(y, cb, cr):
        def body(carry, xs):
            ref_y, ref_cb, ref_cr, qp, fullness = carry
            cur_y = xs["y"].astype(jnp.int32)
            cur_cb = xs["cb"].astype(jnp.int32)
            cur_cr = xs["cr"].astype(jnp.int32)
            kw = dict(rc=rc, block_words=block_words, cap_words=cap_words,
                      fmt=fmt, cqpo=cqpo, qbias=qbias)
            out = jax.lax.cond(
                xs["i"] > 0,
                lambda: encode_frame_tile_traced(
                    cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr, qp,
                    is_p=True, ref_mode=ref_mode, **kw
                ),
                lambda: encode_frame_tile_traced(
                    cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr, qp,
                    is_p=False, ref_mode=ref_mode, **kw
                ),
            )
            qp_used = qp
            if rc == "bitrate" and target_bits > 0:
                t = max(target_bits, 1)
                delta = jnp.clip(((out["frame_bits"] - t) * 4) // t, -2, 2)
                qp = jnp.clip(qp + delta, spec.QP_MIN, spec.QP_MAX)
            elif rc == "vbv" and target_bits > 0:
                # spec.vbv_next on the psum'd frame total, so every tile
                # shard derives the identical next qp
                t = max(target_bits, 1)
                f = jnp.clip(fullness + target_bits - out["frame_bits"],
                             0, vbv_bits)
                delta = jnp.clip(((out["frame_bits"] - target_bits) * 4) // t,
                                 -2, 2)
                delta = (delta + (f < vbv_bits // 4).astype(jnp.int32)
                         - (f > (3 * vbv_bits) // 4).astype(jnp.int32))
                qp = jnp.clip(qp + delta, spec.QP_MIN, spec.QP_MAX)
                fullness = f
            carry = (out["rec_y"], out["rec_cb"], out["rec_cr"], qp, fullness)
            emit = dict(words=out["words"], bits=out["bits"], ovf=out["ovf"],
                        n_inter=out["n_inter"], qp=qp_used)
            return carry, emit

        t_frames = y.shape[0]
        init = (
            jnp.zeros(y.shape[1:], jnp.int32),
            jnp.zeros(cb.shape[1:], jnp.int32),
            jnp.zeros(cr.shape[1:], jnp.int32),
            jnp.asarray(base_qp, jnp.int32),
            jnp.asarray(spec.vbv_init(vbv_bits), jnp.int32),
        )
        xs = dict(y=y, cb=cb, cr=cr, i=jnp.arange(t_frames, dtype=jnp.int32))
        _, outs = jax.lax.scan(body, init, xs)
        # add the shard axis so out_specs can map it to 'tile'
        return jax.tree.map(lambda a: a[None], outs)

    sharded = P(None, "tile", None)
    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded),
        out_specs=dict(
            words=P("tile"), bits=P("tile"), ovf=P("tile"),
            n_inter=P("tile"), qp=P("tile"),
        ),
        check_vma=False,
    )(y_u8, cb_u8, cr_u8)


def bit_concat(payloads: list[tuple[np.ndarray, int]]) -> tuple[bytes, int]:
    """Host mux glue: bit-concatenate per-shard (words_u32_be, nbits) into
    one frame payload (bytes, total_bits). Pure numpy shift-or."""
    total_bits = sum(b for _, b in payloads)
    out = np.zeros((total_bits + 31) // 32 + 1, dtype=np.uint64)
    pos = 0
    for words, nbits in payloads:
        if nbits == 0:
            continue
        nw = (nbits + 31) // 32
        w = words[:nw].astype(np.uint64)
        word0, sh = pos >> 5, pos & 31
        if sh == 0:
            out[word0 : word0 + nw] |= w
        else:
            out[word0 : word0 + nw] |= w >> np.uint64(sh)
            out[word0 + 1 : word0 + 1 + nw] |= (w << np.uint64(32 - sh)) & np.uint64(
                0xFFFFFFFF
            )
        pos += nbits
    nw_total = (total_bits + 31) // 32
    return out[:nw_total].astype(np.uint32).astype(">u4").tobytes(), total_bits
