"""Clip-level decoder drivers (reference component C16, SURVEY.md §3.3):
demux → entropy decode → reconstruction per frame → raw YUV out.

Three engines, all bit-identical (SPEC.md §11):
- GoldenDecodeEngine: pure-python reference (slow; tests / tiny clips).
- DeviceDecodeEngine: host C++ entropy parse (codec/native.py) + on-device
  reconstruction (unzigzag→dequant→ITX→MC→clip as one jitted program) —
  the decode mirror of the encode split "host does bytes, device does math".
- native decode_clip_native: whole decode in C++ (fastest host-only path).
"""

from __future__ import annotations

import functools
from typing import BinaryIO, Iterator

import numpy as np

from ..codec import bitstream, spec
from ..codec.golden import Frame, decode_frame


class GoldenDecodeEngine:
    def decode(self, width, height, pkt: bitstream.FramePacket, ref: Frame | None) -> Frame:
        return decode_frame(
            width, height, pkt.frame_type, pkt.base_qp, pkt.payload, pkt.payload_bits, ref
        )


class DeviceDecodeEngine:
    """C++ entropy parse on host, reconstruction on device (C14 shared math)."""

    def __init__(self):
        from ..codec import native

        self._native = native
        import jax

        try:
            jax.devices()
        except RuntimeError:
            # plugin backend unavailable (e.g. chip held by another process):
            # reconstruction math is backend-agnostic, fall back to CPU
            jax.config.update("jax_platforms", "cpu")
        # materialize module-level jnp constants eagerly, outside any trace
        from ..ops import transform as _tx  # noqa: F401
        from .device_engine import scatter_blocks  # noqa: F401

    @staticmethod
    @functools.partial(__import__("jax").jit, static_argnames=("is_p",))
    def _recon(levels_zz, dy, dx, is_inter, qp_mb, ref_y, ref_cb, ref_cr, *, is_p):
        # imports resolved at module scope (importing inside the trace would
        # turn the modules' jnp table constants into leaked tracers)
        import jax.numpy as jnp

        from ..ops import dispatch
        from ..ops import transform as tx
        from .device_engine import scatter_blocks

        nby, nbx = qp_mb.shape
        if is_p:
            m_y = jnp.repeat(jnp.repeat(is_inter, spec.MB, 0), spec.MB, 1)
            m_c = jnp.repeat(jnp.repeat(is_inter, spec.BLK, 0), spec.BLK, 1)
            cdy, cdx = dy >> 1, dx >> 1
            pred_y = jnp.where(m_y, dispatch.mc_fetch_luma_plane(ref_y, dy, dx), 128)
            pred_cb = jnp.where(m_c, dispatch.mc_fetch_chroma_plane(ref_cb, cdy, cdx), 128)
            pred_cr = jnp.where(m_c, dispatch.mc_fetch_chroma_plane(ref_cr, cdy, cdx), 128)
        else:
            pred_y = jnp.full_like(ref_y, 128)
            pred_cb = jnp.full_like(ref_cb, 128)
            pred_cr = jnp.full_like(ref_cr, 128)

        q = tx.QSTEP[qp_mb][:, :, None, None, None]
        deq = tx.dequantize(tx.unzigzag(levels_zz), q)
        resid = tx.inverse_transform(deq)
        yb, cbb, crb = scatter_blocks(resid)
        rec_y = jnp.clip(tx.unblockify(yb) + pred_y, 0, 255)
        rec_cb = jnp.clip(tx.unblockify(cbb) + pred_cb, 0, 255)
        rec_cr = jnp.clip(tx.unblockify(crb) + pred_cr, 0, 255)
        return rec_y, rec_cb, rec_cr

    def decode(self, width, height, pkt: bitstream.FramePacket, ref: Frame | None) -> Frame:
        import jax.numpy as jnp

        hp, wp = spec.ceil_to(height, spec.MB), spec.ceil_to(width, spec.MB)
        nby, nbx = hp // spec.MB, wp // spec.MB
        is_p = pkt.frame_type == 1
        levels, dy, dx, inter, qps = self._native.parse_frame(
            pkt.payload, pkt.payload_bits, is_p, pkt.base_qp, nby, nbx
        )
        if ref is None:
            ref = Frame(
                np.zeros((hp, wp), np.int32),
                np.zeros((hp // 2, wp // 2), np.int32),
                np.zeros((hp // 2, wp // 2), np.int32),
            )
        ry, rcb, rcr = self._recon(
            jnp.asarray(levels), jnp.asarray(dy), jnp.asarray(dx),
            jnp.asarray(inter), jnp.asarray(qps),
            jnp.asarray(ref.y, jnp.int32), jnp.asarray(ref.cb, jnp.int32),
            jnp.asarray(ref.cr, jnp.int32), is_p=is_p,
        )
        return Frame(np.asarray(ry), np.asarray(rcb), np.asarray(rcr))


def decode_clip(
    f: BinaryIO, engine=None
) -> tuple[bitstream.StreamInfo, Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Decode a TVC1 stream → (info, iterator of cropped (y, cb, cr))."""
    engine = engine or GoldenDecodeEngine()
    info, packets = bitstream.demux(f)

    def frames():
        ref: Frame | None = None
        for pkt in packets:
            if pkt.frame_type == 0:
                ref = None  # GOP boundary: I frames never reference
            rec = engine.decode(info.width, info.height, pkt, ref)
            ref = rec
            yield rec.crop(info.width, info.height)

    return info, frames()


def decode_clip_native(f: BinaryIO):
    """Whole-stream decode in C++ → (info, iterator of (y, cb, cr))."""
    from ..codec import native

    data = f.read()
    import io

    info = bitstream.read_stream_header(io.BytesIO(data))
    frames_flat = native.decode_stream(data, info.width, info.height, info.frame_count)

    def frames():
        from ..io import yuv

        for i in range(info.frame_count):
            yield yuv.split_i420(frames_flat[i].tobytes(), info.width, info.height)

    return info, frames()
