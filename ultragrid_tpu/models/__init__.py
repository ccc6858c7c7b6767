"""Flagship on-device pipelines ("models"): fused encode/decode graphs.

A *model* here is a compiled end-to-end device graph — e.g. UYVY frame in HBM
-> color conversion -> JPEG encode -> LDGM FEC parity — the TPU-native
equivalent of the reference's capture->compress->FEC sender hot path.
"""

from ultragrid_tpu.models.encode import EncodePipeline  # noqa: F401
