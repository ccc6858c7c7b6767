"""The flagship encode pipeline: frame -> convert -> compress [-> FEC].

This is the sender hot path of the reference (capture thread -> compress ->
fec_encode, ref: src/rxtx.cpp:181-287, src/rxtx/ultragrid_rtp.c:207-255)
re-designed as ONE fused jit graph over HBM-resident frames: no host
round-trips between stages.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, VideoDesc


@dataclasses.dataclass(frozen=True)
class EncodeConfig:
    in_codec: Codec = Codec.UYVY
    work_codec: Codec = Codec.RGB  # conversion target before compression
    compress: str = "none"  # none | dxt1 | dxt5 | jpeg
    quality: int = 80
    fec: str = "none"  # none | ldgm:k:m:c | rs:k:n


class EncodePipeline:
    """Builds a jittable step for a fixed video description."""

    def __init__(self, desc: VideoDesc, config: EncodeConfig = EncodeConfig()):
        self.desc = desc
        self.config = config
        self._step = self._build()

    def _build(self) -> Callable:
        desc, cfg = self.desc, self.config
        width = desc.width

        if cfg.compress == "jpeg":
            from ultragrid_tpu.ops.jpeg import JpegEncoder

            encoder = JpegEncoder(
                desc.width, desc.height, in_codec=cfg.in_codec, quality=cfg.quality
            )
            self.jpeg_encoder = encoder
            # the jitted device graph (per-component slots + bits + overflow)
            return encoder._encode_cache.setdefault(
                encoder.wwords, encoder._make_encode(encoder.wwords)
            )

        def step(frame: jnp.ndarray):
            data = frame
            if cfg.work_codec != cfg.in_codec and cfg.compress == "none":
                data = pixfmt.convert_frame(data, width, cfg.in_codec, cfg.work_codec)
            if cfg.compress == "dxt1":
                from ultragrid_tpu.ops.dxt import dxt1_encode_uyvy, dxt1_encode_rgb

                if cfg.in_codec == Codec.UYVY:
                    data = dxt1_encode_uyvy(data, width)
                else:
                    data = dxt1_encode_rgb(data, width)
            elif cfg.compress == "dxt5":
                from ultragrid_tpu.ops.dxt import dxt5_ycocg_encode_rgb

                data = dxt5_ycocg_encode_rgb(data, width)
            return data

        return jax.jit(step)

    def __call__(self, frame):
        return self._step(frame)
