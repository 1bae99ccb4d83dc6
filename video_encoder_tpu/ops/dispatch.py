"""Backend dispatch: Pallas kernels on TPU, jnp fallbacks elsewhere.

Both paths are bit-exact implementations of SPEC.md, so tests can force
either and assert byte equality (SURVEY.md §4.4: the same code must produce
the identical bitstream on {cpu fake devices, 1 tpu chip}).
"""

from __future__ import annotations

import jax

_FORCE: str | None = None  # "pallas" | "jnp" | None


def force(mode: str | None) -> None:
    global _FORCE
    assert mode in (None, "pallas", "jnp")
    _FORCE = mode


def use_pallas() -> bool:
    if _FORCE is not None:
        return _FORCE == "pallas"
    return jax.default_backend() != "cpu"


def full_search(cur_y, ref_y):
    if use_pallas():
        from .pallas import sad as psad

        return psad.full_search(cur_y, ref_y)
    from . import motion

    return motion.full_search(cur_y, ref_y)


def sad_at_mv(cur_y, ref_y, dy, dx):
    if use_pallas():
        from .pallas import sad as psad

        return psad.sad_at_mv(cur_y, ref_y, dy, dx)
    from . import motion

    refpad = motion.pad_ref(ref_y, 16)
    return motion.sad_at(motion.blockify(cur_y, 16), refpad, dy, dx)


def mc_fetch_luma_plane(ref_y, dy, dx):
    """[H, W] luma predictor plane from per-MB mvs."""
    if use_pallas():
        from .pallas import sad as psad

        return psad.mc_fetch_plane(ref_y, dy, dx)
    from . import motion
    from .transform import unblockify

    refpad = motion.pad_ref(ref_y, 16)
    return unblockify(motion.mc_fetch(refpad, dy, dx, 16, 16))


def mc_fetch_chroma_plane(ref_c, cdy, cdx):
    """[H/2, W/2] chroma predictor plane from per-MB chroma mvs."""
    if use_pallas():
        from .pallas import sad as psad

        return psad.mc_fetch_plane_chroma(ref_c, cdy, cdx)
    from . import motion
    from .transform import unblockify

    refpad = motion.pad_ref(ref_c, 8)
    return unblockify(motion.mc_fetch(refpad, cdy, cdx, 8, 8))


def code_plane(cur, pred, q_blk, qbias: int = 8, qmat: bool = False):
    """Fused transform→quant→zigzag→recon of one plane (C9–C11, C14).

    Returns (levels zigzagged [nby, nbx, 64], recon [H, W]). On TPU one
    Pallas kernel keeps every stage in VMEM (measured 0.23 ms vs 1.06 ms
    for the staged jnp path on the Y plane at 1080p); the zigzag itself
    stays in XLA — it's a pure layout permute that fuses into the pack.
    qmat applies the v3 per-position quant matrix (SPEC.md §13.2)."""
    from . import transform as tx

    if use_pallas():
        from .pallas import codec as pcodec

        lv, rec = pcodec.code_plane(cur, pred, q_blk, qbias, qmat)
        return tx.zigzag(tx.blockify(lv, 8)), rec
    import jax.numpy as jnp

    resid = tx.blockify(cur - pred, 8)
    q = tx.qsteps_pos(q_blk, qmat)
    coefs = tx.forward_transform(resid)
    lz = tx.zigzag(tx.quantize(coefs, q, qbias))
    deq = tx.dequantize(tx.unzigzag(lz), q)
    rec = jnp.clip(tx.unblockify(tx.inverse_transform(deq)) + pred, 0, 255)
    return lz, rec


def diamond_search(cur_y, ref_y):
    """Diamond search: map-descent on TPU (one Pallas pass builds the full
    ±16 SAD volume on the MXU, then the spec's masked descent runs as
    vectorized gathers over it), jnp masked-loop reference elsewhere —
    bit-exact pair because the descent code and the SAD values are shared."""
    if use_pallas():
        import jax.numpy as jnp

        from . import motion
        from .pallas import sad as psad

        r = motion.R
        ne = motion.R + 1  # 17 even offsets per axis
        # The large-diamond loop only visits even-even mvs (see
        # motion.diamond_search_with), so one Pallas pass builds just that
        # 17x17 sublattice (4x less MXU work than the full ±16 volume).
        # int32 throughout: a uint16 map would halve scan traffic, but the
        # axon TPU runtime aborts on large u16 elementwise programs (seen at
        # 4K); gathers lower to full-map scans on TPU, so every lookup is a
        # masked reduction and scan size is what matters.
        meven = psad.sad_map_even(cur_y, ref_y)
        iota_e = jax.lax.broadcasted_iota(jnp.int32, meven.shape, 2)

        def sad_even(dy, dx):
            # dy/dx may be [nby, nbx] or batched [K, nby, nbx]: the masked
            # reduction broadcasts over leading axes, so one fused kernel
            # evaluates a whole diamond step's candidates.
            k = ((dy + r) >> 1) * ne + ((dx + r) >> 1)
            hit = jnp.where(iota_e == k[..., None], meven, 0)
            return jnp.sum(hit, axis=-1)

        def sad_small(dy, dx):
            # final ±1 refinement leaves the even lattice: evaluate its four
            # candidates directly (one sad_at_mv kernel pass each, outside
            # the descent loop)
            return psad.sad_at_mv(cur_y, ref_y, dy, dx)

        sad_even.batched = True
        return motion.diamond_search_with(cur_y, ref_y, sad_even, sad_small)
    from . import motion

    return motion.diamond_search(cur_y, ref_y)


def hpel_refine(cur_y, ref_y, dy, dx):
    """SPEC.md §14.4 half-pel refinement (format v4): evaluate the nine
    (2dy+u, 2dx+v) candidates row-major with first-minimum tie-break.

    Candidate (u, v) has fixed parity (|u|, |v|), so each evaluation is an
    INTEGER-mv SAD against the matching §14.2 parity plane — the existing
    sad_at_mv machinery (Pallas kernel on TPU, jnp twin elsewhere) carries
    the whole refinement; only the three parity planes are new (cheap
    elementwise averages). Bit-exact with golden.sad_hpel_refine."""
    import jax.numpy as jnp

    from . import motion
    from ..codec import spec

    hh, vv, dd = motion.hpel_planes(ref_y)
    planes = {(0, 0): ref_y, (0, 1): hh, (1, 0): vv, (1, 1): dd}
    r, r2 = spec.SEARCH_R, 2 * spec.SEARCH_R
    costs, cdy, cdx = [], [], []
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            d2y, d2x = 2 * dy + u, 2 * dx + v
            valid = (jnp.abs(d2y) <= r2) & (jnp.abs(d2x) <= r2)
            iy = jnp.clip(d2y >> 1, -r, r)
            ix = jnp.clip(d2x >> 1, -r, r)
            c = sad_at_mv(cur_y, planes[(abs(u), abs(v))], iy, ix)
            costs.append(jnp.where(valid, c, motion.BIG))
            cdy.append(d2y)
            cdx.append(d2x)
    cc = jnp.stack(costs)
    widx = jnp.argmin(cc, axis=0)  # first occurrence == (u, v) row-major
    d2y = jnp.take_along_axis(jnp.stack(cdy), widx[None], 0)[0]
    d2x = jnp.take_along_axis(jnp.stack(cdx), widx[None], 0)[0]
    sad = jnp.take_along_axis(cc, widx[None], 0)[0]
    return d2y, d2x, sad


def _hpel_mc(plane, d2y, d2x, fetch, px: int):
    """Shared §14.2 half-pel MC: integer fetch from each parity plane,
    per-MB (fy, fx) select expanded to pixel resolution."""
    import jax.numpy as jnp

    from . import motion

    hh, vv, dd = motion.hpel_planes(plane)
    iy, ix = d2y >> 1, d2x >> 1
    sel = (d2y & 1) * 2 + (d2x & 1)
    sel_px = jnp.repeat(jnp.repeat(sel, px, 0), px, 1)
    f0 = fetch(plane, iy, ix)
    f1 = fetch(hh, iy, ix)
    f2 = fetch(vv, iy, ix)
    f3 = fetch(dd, iy, ix)
    return jnp.where(
        sel_px == 0, f0,
        jnp.where(sel_px == 1, f1, jnp.where(sel_px == 2, f2, f3)),
    )


def mc_fetch_luma_plane_hpel(ref_y, d2y, d2x):
    """[H, W] luma predictor plane from per-MB half-pel mvs (SPEC.md §14)."""
    from ..codec import spec

    return _hpel_mc(ref_y, d2y, d2x, mc_fetch_luma_plane, spec.MB)


def mc_fetch_chroma_plane_hpel(ref_c, cd2y, cd2x):
    """[H/2, W/2] chroma predictor plane from per-MB chroma half-pel mvs."""
    from ..codec import spec

    return _hpel_mc(ref_c, cd2y, cd2x, mc_fetch_chroma_plane, spec.BLK)
