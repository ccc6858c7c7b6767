"""ultragrid_tpu — a TPU-native media pipeline framework.

A from-scratch rebuild of the capabilities of CESNET/UltraGrid (low-latency
HD->8K video+audio capture -> convert -> compress -> FEC -> RTP transmission,
and the mirror receive path), designed TPU-first:

* frames are HBM-resident JAX arrays; the pixel-format/color-space layer is
  fused XLA/Pallas kernels (``ultragrid_tpu.ops``),
* compression (DXT1/DXT5-YCoCg, JPEG) and LDGM/RS FEC run on-device,
* the module registry / pipeline orchestration / RTP transport live on host
  (``ultragrid_tpu.modules``, ``ultragrid_tpu.pipeline``, ``ultragrid_tpu.net``),
* multi-chip scaling goes through ``jax.sharding`` meshes
  (``ultragrid_tpu.parallel``), not message passing.

Reference feature map: see SURVEY.md (citations into /root/reference).
"""

from ultragrid_tpu.types import (  # noqa: F401
    Codec,
    VideoDesc,
    VideoFrame,
    InterlacingType,
    get_bpp,
    get_bits_per_component,
    vc_get_linesize,
    vc_get_size,
    vc_get_datalen,
)

__version__ = "0.1.0"
