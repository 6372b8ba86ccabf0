"""Distribution layer: device mesh, GOP data parallelism, spatial tiling.

The reference has zero parallelism (SURVEY.md §2.3) — every loop is serial
Python. The TPU build exposes the two sharding axes identified there:

  * "gop"  — GOPs are independent (every P references only its GOP's I,
             encoder.py:51): pure data parallelism over the GOP batch axis.
  * "tile" — spatial row-tiles of each frame: motion search reads a +/-16 px
             window around each block (motion.py:18), so tiles exchange
             boundary strips of the reference plane with their neighbors over
             ICI (`ppermute` halo exchange) before searching.
"""

from vcs_h264_tpu.parallel.mesh import make_mesh, gop_sharding
from vcs_h264_tpu.parallel.spatial import (sharded_decode_gop_batch,
                                           sharded_decode_gop_batch_420,
                                           sharded_encode_gop_batch,
                                           sharded_encode_gop_batch_420)

__all__ = ["make_mesh", "gop_sharding",
           "sharded_encode_gop_batch", "sharded_decode_gop_batch",
           "sharded_encode_gop_batch_420", "sharded_decode_gop_batch_420"]
