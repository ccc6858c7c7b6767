"""Video modes & frame tiling (ref: src/utils/video.c:60-74, vf_split.cpp).

Multi-tile modes split one logical frame into independent substreams (the
reference's scaling mechanism for dual-link/3D/tiled-4K); each tile travels
as its own RTP substream and is re-merged at the receiver.
"""

from __future__ import annotations

import enum
from typing import List

import jax.numpy as jnp
import numpy as np

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame, vc_get_linesize


class VideoMode(enum.Enum):
    """ref: video_mode_info_map, src/utils/video.c:67-74 (name, x, y)."""

    NORMAL = ("normal", 1, 1)
    DUAL = ("dual-link", 1, 2)
    STEREO = ("3D", 2, 1)
    TILED_4K = ("tiled-2x2", 2, 2)
    THREE_X1 = ("3x1", 3, 1)

    @property
    def x(self) -> int:
        return self.value[1]

    @property
    def y(self) -> int:
        return self.value[2]

    @staticmethod
    def from_str(name: str) -> "VideoMode":
        for m in VideoMode:
            if m.value[0] == name:
                return m
        raise ValueError(f"unknown video mode {name!r}")


def vf_split(frame: VideoFrame, x_count: int, y_count: int) -> VideoFrame:
    """Split a single-tile frame into an x_count*y_count tile grid
    (ref: vf_split, src/utils/vf_split.cpp:50-100; tile order row-major)."""
    desc = frame.desc
    assert desc.width % x_count == 0 and desc.height % y_count == 0
    tw, th = desc.width // x_count, desc.height // y_count
    src = frame.data
    in_ls = vc_get_linesize(desc.width, desc.color_spec)
    out_ls = vc_get_linesize(tw, desc.color_spec)
    tiles = []
    for ty in range(y_count):
        for tx in range(x_count):
            tile = src[ty * th : (ty + 1) * th, tx * out_ls : (tx + 1) * out_ls]
            tiles.append(tile)
    out_desc = desc.with_(width=tw, height=th, tile_count=x_count * y_count)
    out = VideoFrame(out_desc, tiles)
    out.timestamp = frame.timestamp
    return out


def vf_merge_tiles(frame: VideoFrame, x_count: int, y_count: int) -> VideoFrame:
    """Inverse of vf_split (ref: vf_merge_tiles, vf_split.cpp:134)."""
    desc = frame.desc
    assert desc.tile_count == x_count * y_count
    rows = []
    for ty in range(y_count):
        row_tiles = [
            jnp.asarray(frame.tiles[ty * x_count + tx]) for tx in range(x_count)
        ]
        rows.append(jnp.concatenate(row_tiles, axis=1))
    merged = jnp.concatenate(rows, axis=0)
    out_desc = desc.with_(
        width=desc.width * x_count, height=desc.height * y_count, tile_count=1
    )
    out = VideoFrame(out_desc, [merged])
    out.timestamp = frame.timestamp
    return out
