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


def diamond_search(cur_y, ref_y):
    """Diamond search: fused single-kernel version on TPU (per-MB while-loop
    early exit), jnp masked-loop reference elsewhere — bit-exact pair."""
    if use_pallas():
        from .pallas import diamond as pdia

        return pdia.diamond_search(cur_y, ref_y)
    from . import motion

    return motion.diamond_search(cur_y, ref_y)
