"""Device mesh construction + named shardings.

Axes:
  gop  — data parallelism over the GOP batch (DP analog)
  tile — spatial row-tiles within each frame (SP/CP analog, halo exchange)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(gop: int = 1, tile: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = gop * tile
    if n > len(devices):
        raise ValueError(f"mesh {gop}x{tile} needs {n} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:n]).reshape(gop, tile)
    return Mesh(grid, axis_names=("gop", "tile"))


def gop_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-GOPs arrays: shard the leading batch axis."""
    return NamedSharding(mesh, P("gop"))


def frame_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ..., H, W, C]: batch over 'gop', rows over 'tile'."""
    return NamedSharding(mesh, P("gop", None, "tile"))
