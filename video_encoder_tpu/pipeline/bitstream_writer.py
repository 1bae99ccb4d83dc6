"""Resumable stream writer: fresh files get the header; resumed files are
truncated back to the last checkpointed GOP boundary (half-written GOPs
from a crash are discarded and re-encoded)."""

from __future__ import annotations

import os

from ..codec.bitstream import write_stream_header
from ..codec.config import EncoderConfig


def open_stream_for_resume(path: str, cfg: EncoderConfig, n_frames: int, state):
    if state is None or not os.path.exists(path):
        f = open(path, "wb")
        write_stream_header(f, cfg, n_frames)
        return f
    f = open(path, "r+b")
    f.truncate(state.byte_offset)
    f.seek(state.byte_offset)
    return f
