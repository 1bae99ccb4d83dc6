"""Distributed-layer tests on the fake 8-device CPU mesh (SURVEY.md §4.4):
GOP-sharded and tile-sharded encodes must produce byte-identical streams to
single-device (SPEC.md §11 invariant 2; BASELINE.json configs 4–5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from video_encoder_tpu.codec import entropy, golden, spec
from video_encoder_tpu.codec.config import EncoderConfig
from video_encoder_tpu.parallel import tiles
from video_encoder_tpu.parallel.gop_parallel import ShardedGopEncoder
from video_encoder_tpu.pipeline.gop_engine import GopEngine

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (fake) devices"
)


def _smooth_frames(rng, h, w, n, slide=3):
    base = rng.integers(0, 256, (h + 64, w + 64)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1) + np.roll(base, 2, 1)) // 4
    out = []
    for t in range(n):
        y = base[2 * t : 2 * t + h, slide * t : slide * t + w].astype(np.uint8)
        out.append(
            golden.Frame.from_planes(
                y,
                np.full((h // 2, w // 2), 90 + t, np.uint8),
                np.full((h // 2, w // 2), 150, np.uint8),
            )
        )
    return out


@needs_devices
def test_gop_sharded_equals_single(rng):
    frames = _smooth_frames(rng, 32, 48, 8)
    gops = [frames[i : i + 2] for i in range(0, 8, 2)]
    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=30, search="full")

    eng = GopEngine(cfg)
    ref = []
    for g, gop in enumerate(gops):
        pk, _ = eng.encode_gop(gop, g * 2)
        ref += pk

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("gop", "tile"))
    senc = ShardedGopEncoder(cfg, mesh=mesh)
    pk = senc.encode_gop_batch(gops, [0, 2, 4, 6])
    ref.sort(key=lambda p: p.index)
    pk.sort(key=lambda p: p.index)
    assert all(a.to_bytes() == b.to_bytes() for a, b in zip(ref, pk))


@needs_devices
@pytest.mark.parametrize("ref_mode", ["halo", "allgather"])
def test_tile_sharded_equals_single(rng, ref_mode):
    h, w, t, ntile = 64, 32, 2, 4
    frames = _smooth_frames(rng, h, w, t)
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=30, search="full")
    ref_pk, _ = GopEngine(cfg).encode_gop(frames, 0)

    mesh = Mesh(np.array(jax.devices()[:ntile]), ("tile",))
    y = jnp.asarray(np.stack([f.y for f in frames]).astype(np.uint8))
    cb = jnp.asarray(np.stack([f.cb for f in frames]).astype(np.uint8))
    cr = jnp.asarray(np.stack([f.cr for f in frames]).astype(np.uint8))
    n_mbs_shard = (h // ntile // 16) * (w // 16)
    outs = tiles.encode_gop_tiled(
        y, cb, cr, 30, mesh=mesh, rc="none",
        block_words=entropy.BLOCK_WORDS_MAX,
        cap_words=entropy.max_words(n_mbs_shard),
        target_bits=0, ref_mode=ref_mode,
    )
    assert not bool(np.asarray(outs["ovf"]).any())
    bits = np.asarray(outs["bits"])
    words = np.asarray(outs["words"])
    for k in range(t):
        payload, nbits = tiles.bit_concat(
            [(words[s, k], int(bits[s, k])) for s in range(ntile)]
        )
        assert nbits == ref_pk[k].payload_bits
        assert payload == ref_pk[k].payload


def test_bit_concat_matches_bitwriter(rng):
    from video_encoder_tpu.codec.bitio import BitWriter

    chunks = []
    full = BitWriter()
    for _ in range(5):
        bw = BitWriter()
        for _ in range(50):
            length = int(rng.integers(1, 25))
            v = int(rng.integers(0, 1 << length))
            bw.put(v, length)
            full.put(v, length)
        chunks.append((bw.words(), bw.nbits))
    payload, nbits = tiles.bit_concat(chunks)
    assert nbits == full.nbits
    assert payload == full.tobytes()


def test_tile_sharded_v2_equals_single(rng):
    """Format v2's left-only prediction keeps the row-sharded encode
    byte-identical to the unsharded encode (SPEC.md §12)."""
    h, w, t, ntile = 64, 32, 2, 4
    frames = _smooth_frames(rng, h, w, t)
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=24, search="full",
                        format_version=2, chroma_qp_offset=2)
    ref_pk, _ = GopEngine(cfg).encode_gop(frames, 0)

    mesh = Mesh(np.array(jax.devices()[:ntile]), ("tile",))
    y = jnp.asarray(np.stack([f.y for f in frames]).astype(np.uint8))
    cb = jnp.asarray(np.stack([f.cb for f in frames]).astype(np.uint8))
    cr = jnp.asarray(np.stack([f.cr for f in frames]).astype(np.uint8))
    n_mbs_shard = (h // ntile // 16) * (w // 16)
    outs = tiles.encode_gop_tiled(
        y, cb, cr, 24, mesh=mesh, rc="none",
        block_words=entropy.BLOCK_WORDS_MAX,
        cap_words=entropy.max_words(n_mbs_shard),
        target_bits=0, ref_mode="halo", fmt=2, cqpo=2,
    )
    assert not bool(np.asarray(outs["ovf"]).any())
    bits = np.asarray(outs["bits"])
    words = np.asarray(outs["words"])
    for k in range(t):
        payload, nbits = tiles.bit_concat(
            [(words[s, k], int(bits[s, k])) for s in range(ntile)]
        )
        assert nbits == ref_pk[k].payload_bits
        assert payload == ref_pk[k].payload


@needs_devices
def test_tile_sharded_vbv_equals_single(rng):
    """rc=vbv derives qp from the psum'd frame total, so every tile shard
    tracks the same VBV state and the sharded stream equals single-chip."""
    h, w, t, ntile = 64, 32, 3, 4
    frames = _smooth_frames(rng, h, w, t)
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=24, search="full",
                        rc="vbv", target_kbps=50, vbv_kbits=10)
    ref_pk, _ = GopEngine(cfg).encode_gop(frames, 0)

    mesh = Mesh(np.array(jax.devices()[:ntile]), ("tile",))
    y = jnp.asarray(np.stack([f.y for f in frames]).astype(np.uint8))
    cb = jnp.asarray(np.stack([f.cb for f in frames]).astype(np.uint8))
    cr = jnp.asarray(np.stack([f.cr for f in frames]).astype(np.uint8))
    n_mbs_shard = (h // ntile // 16) * (w // 16)
    outs = tiles.encode_gop_tiled(
        y, cb, cr, 24, mesh=mesh, rc="vbv",
        block_words=entropy.BLOCK_WORDS_MAX,
        cap_words=entropy.max_words(n_mbs_shard),
        target_bits=cfg.target_bits_per_frame(), ref_mode="halo",
        vbv_bits=cfg.vbv_bits(),
    )
    assert not bool(np.asarray(outs["ovf"]).any())
    bits = np.asarray(outs["bits"])
    words = np.asarray(outs["words"])
    for k in range(t):
        payload, nbits = tiles.bit_concat(
            [(words[s, k], int(bits[s, k])) for s in range(ntile)]
        )
        assert nbits == ref_pk[k].payload_bits
        assert payload == ref_pk[k].payload
