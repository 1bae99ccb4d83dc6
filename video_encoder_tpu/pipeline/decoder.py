"""Clip-level decoder driver (reference component C16, SURVEY.md §3.3):
demux → entropy decode → reconstruction per frame → raw YUV out."""

from __future__ import annotations

from typing import BinaryIO, Iterator

import numpy as np

from ..codec import bitstream
from ..codec.golden import Frame, decode_frame


class GoldenDecodeEngine:
    def decode(self, width, height, pkt: bitstream.FramePacket, ref: Frame | None) -> Frame:
        return decode_frame(
            width, height, pkt.frame_type, pkt.base_qp, pkt.payload, pkt.payload_bits, ref
        )


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
