"""Fused Pallas symbols+pack kernel (ops/pallas/entropy_pack.py) vs the
jnp reference pair block_symbols(_v2) + pack_dense — exact equality in
interpret mode on CPU, across syntaxes, word budgets, densities, and the
value extremes of the quantizer range (|level| <= 3925, SPEC.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_encoder_tpu.codec import entropy
from video_encoder_tpu.ops.pallas import entropy_pack as ep


def _levels(rng, n, density, mag=3000):
    lv = np.zeros((n, 64), np.int32)
    mask = rng.random((n, 64)) < density
    lv[mask] = rng.integers(-mag, mag + 1, mask.sum())
    if n >= 4:
        lv[0] = 0                                    # all-zero block
        lv[1] = rng.integers(-3925, 3926, 64)        # dense, extreme mags
        lv[2, 63] = 1                                # single trailing coef
        lv[3, 0] = -3925                             # DC-only
    return lv


@pytest.mark.parametrize("fmt", [1, 2])
@pytest.mark.parametrize("density", [0.02, 0.2, 0.7])
@pytest.mark.parametrize("n,words", [(37, 16), (300, 24), (512, 78)])
def test_block_pack_matches_reference(rng, fmt, density, n, words):
    lv = _levels(rng, n, density)
    dcp = rng.integers(-3925, 3926, n).astype(np.int32)
    if fmt >= 2:
        v, l = entropy.block_symbols_v2(jnp.asarray(lv), jnp.asarray(dcp))
    else:
        v, l = entropy.block_symbols(jnp.asarray(lv))
    want_w, want_b, _ = entropy.pack_dense(v, l, words)
    got_w, got_b = ep._block_pack_impl(
        jnp.asarray(lv), jnp.asarray(dcp).reshape(-1, 1), fmt, words,
        interpret=True,
    )
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b))
    assert np.array_equal(np.asarray(want_w), np.asarray(got_w))


def test_block_pack_overflow_bits_visible(rng):
    """A too-small word budget truncates the string (like pack_dense) but
    the bit count still reports the true length, so callers detect it."""
    lv = np.zeros((ep.BT, 64), np.int32)
    lv[:] = rng.integers(-3925, 3926, (ep.BT, 64))
    words = 4  # far below the dense-block worst case
    got_w, got_b = ep._block_pack_impl(
        jnp.asarray(lv), jnp.zeros((ep.BT, 1), jnp.int32), 1, words,
        interpret=True,
    )
    assert int(np.asarray(got_b).max()) > 32 * words
    v, l = entropy.block_symbols(jnp.asarray(lv))
    _, want_b, ovf = entropy.pack_dense(v, l, words)
    assert bool(ovf)
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b))
