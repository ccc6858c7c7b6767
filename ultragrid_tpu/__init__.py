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

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # The axon TPU plugin force-sets jax_platforms at import registration,
    # which silently beats the standard env var; restore stock JAX
    # semantics so JAX_PLATFORMS=cpu really runs on (virtual) CPU devices.
    # (Only 'cpu' is restored — the plugin's own 'axon' value is an alias
    # it resolves internally and must be left alone.)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

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
