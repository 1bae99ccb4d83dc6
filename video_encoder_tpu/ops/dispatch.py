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
