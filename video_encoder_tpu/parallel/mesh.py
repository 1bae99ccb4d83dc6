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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (SURVEY.md §2.1 comm-backend row; BASELINE.json
    config 5). On a pod slice, call once per host before building meshes;
    the same shard_map programs then span processes — ICI within a slice,
    DCN across hosts. No-ops when unconfigured (single-process dev box)."""
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" not in __import__("os").environ:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


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
