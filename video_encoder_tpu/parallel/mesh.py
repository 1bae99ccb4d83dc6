"""Device mesh construction (SURVEY.md §2.1 / §5 comm-backend row).

Axes: 'gop' — data parallelism over independent GOPs (closed under
prediction, zero inter-chip traffic); 'tile' — spatial sharding of one
frame's MB grid with halo exchange. Multi-host: the same mesh spans
processes under jax.distributed; ICI within a slice, DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_codec_mesh(gop_devices: int = 0, tile_devices: int = 1) -> Mesh:
    """2-D ('gop', 'tile') mesh. gop_devices=0 → use all devices on gop."""
    devs = jax.devices()
    if gop_devices == 0:
        gop_devices = len(devs) // tile_devices
    n = gop_devices * tile_devices
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(gop_devices, tile_devices)
    return Mesh(arr, ("gop", "tile"))
