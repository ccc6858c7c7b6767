"""Multi-chip scaling via jax.sharding meshes.

The reference scales by spatial tiling (tiled-4K/8K = independent substreams,
ref: src/utils/video.c:67-74) and multi-GPU round-robin (ref: src/host.h:98).
The TPU-native equivalents here:

* **spatial**: shard frame rows across devices — conversions are row-local, so
  XLA partitions them with zero communication; filters needing neighbor rows
  (scale/deinterlace) get halo exchanges from XLA automatically.
* **data**: batch of frames (or tiles) across devices, one frame per chip.
"""

from ultragrid_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_frame_rows,
    shard_batch,
)
