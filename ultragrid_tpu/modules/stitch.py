"""Panorama stitcher capture: N cameras -> one equirectangular frame.

TPU-native counterpart of the reference's ``gpustitch`` capture module
(ref: src/video_capture/gpustitch.cpp — a CUDA SDK that composites multiple
camera inputs into a 360° panorama).  Here the whole composite is ONE jit
graph: per camera a precomputed inverse-projection gather map + feathered
weight mask, evaluated on device and blended as a weighted sum — no SDK.

Grammar: ``stitch:dev1#dev2[#...][;size=WxH][;fov=<deg>]``
(child capture specs use ``#`` separators and ``;`` for stitcher options so
the children keep their own ``:`` grammar).  Camera *i* is assumed to look
at yaw ``i * 360/N`` with the given horizontal FOV (the reference's rig
configs hardcode per-camera extrinsics the same way).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ultragrid_tpu.modules.registry import LibraryClass, register_module
from ultragrid_tpu.modules.video_capture import VideoCapture, initialize_video_capture
from ultragrid_tpu.types import Codec, InterlacingType, VideoDesc, VideoFrame
from ultragrid_tpu.utils.log import Logger

log = Logger("stitch")


class StitchCapture(VideoCapture):
    def __init__(self, cfg: str):
        super().__init__(cfg)
        ow, oh = 1024, 512
        fov = None
        main, _, opts = cfg.partition(";")
        for tok in [t for t in opts.split(";") if t]:
            key, _, val = tok.partition("=")
            if key == "size":
                w, _, h = val.partition("x")
                ow, oh = int(w), int(h)
            elif key == "fov":
                fov = float(val)
        specs = [s for s in main.split("#") if s]
        if not specs:
            raise ValueError("stitch: needs at least one child capture")
        self.children = [initialize_video_capture(s) for s in specs]
        n = len(self.children)
        if fov is None:
            # default: enough overlap to feather (1.4x the sector width)
            fov = min(140.0, 1.4 * 360.0 / n) if n > 1 else 120.0
        self.fov = fov
        self.ow, self.oh = ow, oh
        d0 = self.children[0].desc
        self.desc = VideoDesc(ow, oh, Codec.RGB, d0.fps, InterlacingType.PROGRESSIVE, 1)
        self._blend = None
        self._cam_wh: Optional[Tuple[int, int]] = None
        log.notice(f"stitching {n} cameras @ {fov:.0f}° hfov -> {ow}x{oh} equirect")

    def _build(self, cw: int, ch: int) -> None:
        import jax
        import jax.numpy as jnp

        n = len(self.children)
        ow, oh = self.ow, self.oh
        lon = (np.arange(ow) + 0.5) / ow * 2 * np.pi - np.pi
        lat = (np.arange(oh) + 0.5) / oh * np.pi - np.pi / 2
        lon, lat = np.meshgrid(lon, lat)
        dx = np.cos(lat) * np.sin(lon)
        dy = np.sin(lat)
        dz = np.cos(lat) * np.cos(lon)
        f = 0.5 * cw / np.tan(np.radians(self.fov) / 2)
        maps = []
        for i in range(n):
            yaw = np.radians(i * 360.0 / n)
            cy, sy = np.cos(yaw), np.sin(yaw)
            # rotate world dir into camera i's frame (inverse yaw)
            cdx = dx * cy - dz * sy
            cdz = dx * sy + dz * cy
            cdy = dy
            with np.errstate(divide="ignore", invalid="ignore"):
                u = cdx / cdz * f + cw / 2
                v = cdy / cdz * f + ch / 2
            valid = (cdz > 1e-6) & (u >= 0) & (u < cw) & (v >= 0) & (v < ch)
            # feather: weight by distance to the nearest frame edge
            wu = np.minimum(u, cw - 1 - u) / (cw / 2)
            wv = np.minimum(v, ch - 1 - v) / (ch / 2)
            w = np.where(valid, np.clip(np.minimum(wu, wv), 1e-4, 1.0), 0.0)
            sx = np.clip(np.nan_to_num(u), 0, cw - 1).astype(np.int32)
            sy_ = np.clip(np.nan_to_num(v), 0, ch - 1).astype(np.int32)
            maps.append((jnp.asarray(sx), jnp.asarray(sy_), jnp.asarray(w.astype(np.float32))))
        wsum = sum(np.asarray(m[2]) for m in maps)
        if (wsum == 0).any():
            log.warning(
                f"stitch: {(wsum == 0).mean() * 100:.1f}% of the panorama is "
                "uncovered (increase fov= or add cameras); filling black"
            )

        def blend(*rgbs):  # each [ch, cw, 3] u8 -> [oh, ow*3] u8
            acc = jnp.zeros((oh, ow, 3), jnp.float32)
            den = jnp.zeros((oh, ow, 1), jnp.float32)
            for (sx, syy, w), rgb in zip(maps, rgbs):
                sample = rgb[syy, sx, :].astype(jnp.float32)
                acc = acc + sample * w[:, :, None]
                den = den + w[:, :, None]
            out = acc / jnp.maximum(den, 1e-6)
            return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8).reshape(oh, ow * 3)

        self._blend = jax.jit(blend)
        self._cam_wh = (cw, ch)

    def grab(self):
        import jax.numpy as jnp

        from ultragrid_tpu.ops.pixfmt import convert_frame

        rgbs = []
        ts = None
        for c in self.children:
            frame, _a = c.grab()
            if frame is None:
                return None, None
            ts = frame.timestamp if ts is None else ts
            d = frame.desc
            tile = frame.data
            if d.color_spec == Codec.RGB:
                rgb = jnp.asarray(tile)
            else:
                rgb = convert_frame(tile, d.width, d.color_spec, Codec.RGB)
            rgbs.append(rgb[:, : d.width * 3].reshape(d.height, d.width, 3))
        cw, ch = rgbs[0].shape[1], rgbs[0].shape[0]
        if self._blend is None or self._cam_wh != (cw, ch):
            self._build(cw, ch)
        out = self._blend(*rgbs)
        vf = VideoFrame(self.desc, [out], timestamp=ts)
        return vf, None

    def done(self) -> None:
        for c in self.children:
            c.done()


register_module("stitch", LibraryClass.VIDEO_CAPTURE, StitchCapture)
register_module("gpustitch", LibraryClass.VIDEO_CAPTURE, StitchCapture)
