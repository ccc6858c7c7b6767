"""libavcodec-backed video compress/decompress modules.

Role analogue of the reference's most-used codec modules
(src/video_compress/libavcodec.cpp:200-248 — codec-name to encoder mapping,
option grammar; src/video_decompress/libavcodec.c — decoder + pixfmt
conversion glue).  Both the reference and this module wrap the SAME system
library (libavcodec); the ctypes surface lives in native/lavc_shim.c so no
version-specific struct layout is touched from Python.  libswscale inside
the shim plays the role of the reference's 6 kLoC lavc pixfmt glue
(src/libavcodec/*_conversions.c).

Grammar (ref: libavcodec.cpp usage): ``libavcodec:codec=H.264[:bitrate=N]
[:encoder=libx264][:q=QP][:<lavc opt>=<val>...]``.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from ultragrid_tpu.modules.registry import LibraryClass, register_module
from ultragrid_tpu.modules.video_compress import VideoCompress
from ultragrid_tpu.modules.video_decompress import VideoDecompress
from ultragrid_tpu.native import lavc_shim_lib
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame, vc_get_linesize
from ultragrid_tpu.utils.log import Logger

log = Logger("lavc")

# UG codec -> preferred lavc encoder names (ref: codec_params[] in
# libavcodec.cpp — the reference prefers libx264/libx265/libvpx the same way)
ENCODERS: Dict[Codec, List[str]] = {
    Codec.H264: ["libx264", "libopenh264"],
    Codec.H265: ["libx265", "hevc_nvenc"],
    Codec.VP8: ["libvpx"],
    Codec.VP9: ["libvpx-vp9"],
    Codec.AV1: ["libaom-av1", "libsvtav1", "librav1e"],
    Codec.FFV1: ["ffv1"],
    Codec.PRORES: ["prores"],
    Codec.JPEG: ["mjpeg"],
    Codec.CFHD: ["cfhd"],
}
DECODERS: Dict[Codec, List[str]] = {
    Codec.H264: ["h264"],
    Codec.H265: ["hevc"],
    Codec.VP8: ["vp8"],
    Codec.VP9: ["vp9"],
    Codec.AV1: ["libdav1d", "libaom-av1", "av1"],
    Codec.FFV1: ["ffv1"],
    Codec.PRORES: ["prores"],
    Codec.JPEG: ["mjpeg"],
    Codec.CFHD: ["cfhd"],
}
CODEC_NAMES = {
    "H.264": Codec.H264, "H264": Codec.H264,
    "H.265": Codec.H265, "H265": Codec.H265, "HEVC": Codec.H265,
    "VP8": Codec.VP8, "VP9": Codec.VP9, "AV1": Codec.AV1,
    "FFV1": Codec.FFV1, "prores": Codec.PRORES, "MJPEG": Codec.JPEG,
    "JPEG": Codec.JPEG, "CFHD": Codec.CFHD, "cineform": Codec.CFHD,
}
_IN_FMT = {Codec.UYVY: 0, Codec.RGB: 1, Codec.YUYV: 3, Codec.RGBA: 4}


def lavc_available() -> bool:
    return lavc_shim_lib() is not None


def lavc_encoders() -> List[str]:
    lib = lavc_shim_lib()
    if lib is None:
        return []
    buf = ctypes.create_string_buffer(1 << 16)
    n = lib.lavc_list(1, buf, 1 << 16)
    return buf.raw[:n].decode().split()


class LavcCompress(VideoCompress):
    """``-c libavcodec:codec=H.264[:bitrate=][:encoder=][:opt=val...]``."""

    def __init__(self, cfg: str):
        super().__init__(cfg)
        self.codec = Codec.H264
        self.encoder_name: Optional[str] = None
        self.bitrate = 0
        self.extra_opts: List[str] = []
        for part in (cfg or "").split(":"):
            if not part:
                continue
            key, _, val = part.partition("=")
            if key == "codec":
                c = CODEC_NAMES.get(val)
                if c is None:
                    raise ValueError(f"libavcodec: unknown codec {val!r}")
                self.codec = c
            elif key == "encoder":
                self.encoder_name = val
            elif key in ("bitrate", "b"):
                mult = 1
                if val and val[-1] in "kKmM":
                    mult = 1000 if val[-1] in "kK" else 1000000
                    val = val[:-1]
                self.bitrate = int(float(val) * mult)
            else:
                self.extra_opts.append(part)
        self._h = None
        self._desc: Optional[VideoDesc] = None
        self._out = None
        self._lib = lavc_shim_lib()
        if self._lib is None:
            raise ValueError("libavcodec shim unavailable")

    def _open(self, desc: VideoDesc) -> bool:
        names = [self.encoder_name] if self.encoder_name else ENCODERS.get(self.codec, [])
        in_fmt = _IN_FMT.get(desc.color_spec)
        if in_fmt is None:
            return False
        opts = ":".join(self.extra_opts)
        if not self.bitrate:
            # sane default like the reference's rate control fallback
            self.bitrate = int(desc.width * desc.height * max(desc.fps, 1) * 0.1)
        for name in names:
            if not name or not self._lib.lavc_have(name.encode(), 1):
                continue
            # low-latency defaults per encoder (the reference sets the same:
            # zerolatency/realtime so no frame is buffered in lookahead)
            eopts = opts
            defaults = {
                "libx264": "tune=zerolatency",
                "libx265": "tune=zerolatency",
                "libvpx": "deadline=realtime:lag-in-frames=0",
                "libvpx-vp9": "deadline=realtime:lag-in-frames=0",
                "libaom-av1": "usage=realtime:lag-in-frames=0:cpu-used=8",
            }.get(name)
            if defaults:
                eopts = f"{defaults}:{opts}" if opts else defaults
            h = self._lib.lavc_enc_open(
                name.encode(), desc.width, desc.height, in_fmt,
                int(desc.fps) or 30, self.bitrate, eopts.encode(),
            )
            if h:
                self._h = h
                ed = np.empty(4096, np.uint8)
                n = self._lib.lavc_enc_extradata(h, ed.ctypes.data, ed.size)
                self._extradata = bytes(ed[:n]) if n > 0 else None
                log.notice(f"libavcodec: encoder {name} {desc.width}x{desc.height} "
                           f"@{self.bitrate/1e6:.1f} Mbps")
                return True
        return False

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        desc = frame.desc
        if self._h is None or self._desc != desc:
            if self._h is not None:
                self._lib.lavc_enc_close(self._h)
                self._h = None
            if not self._open(desc):
                log.error(f"libavcodec: no encoder for {self.codec.name}")
                return None
            self._desc = desc
            cap = desc.width * desc.height * 4 + (1 << 16)
            self._out = np.empty(cap, np.uint8)
        data = np.ascontiguousarray(np.asarray(frame.data))
        ls = data.shape[1] if data.ndim == 2 else vc_get_linesize(desc.width, desc.color_spec)
        key = ctypes.c_int(0)
        n = self._lib.lavc_enc_frame(
            self._h, data.ctypes.data, ls, 0,
            self._out.ctypes.data, self._out.size, ctypes.byref(key),
        )
        if n <= 0:
            return None  # buffered (b-frames off, so only on errors)
        out = VideoFrame(desc.with_(color_spec=self.codec), [self._out[:n].copy()])
        out.timestamp = frame.timestamp
        out.callbacks["keyframe"] = bool(key.value)
        if self._extradata:
            # FFV1-class codecs carry a configuration record out of band
            out.callbacks["extradata"] = self._extradata
        return out

    def done(self) -> None:
        if self._h is not None:
            self._lib.lavc_enc_close(self._h)
            self._h = None


class LavcDecompress(VideoDecompress):
    """Decoder side (ref: src/video_decompress/libavcodec.c)."""

    SUPPORTS = [(c, o) for c in DECODERS for o in (Codec.UYVY, Codec.RGB)]

    def __init__(self) -> None:
        super().__init__()
        self._h = None
        self._in: Optional[Codec] = None
        self._out_buf = None
        self._lib = lavc_shim_lib()

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        if self._lib is None:
            return None
        desc = frame.desc
        if self._h is None or self._in != desc.color_spec:
            if self._h is not None:
                self._lib.lavc_dec_close(self._h)
                self._h = None
            ed = frame.callbacks.get("extradata")
            for name in DECODERS.get(desc.color_spec, []):
                if ed:
                    eda = np.frombuffer(ed, np.uint8)
                    h = self._lib.lavc_dec_open2(name.encode(), eda.ctypes.data,
                                                 eda.size, desc.width, desc.height)
                else:
                    h = self._lib.lavc_dec_open2(name.encode(), None, 0,
                                                 desc.width, desc.height)
                if h:
                    self._h = h
                    break
            if self._h is None:
                return None
            self._in = desc.color_spec
        data = np.ascontiguousarray(np.asarray(frame.data).reshape(-1))
        cap = max(desc.width * desc.height, 16) * 4 + (1 << 16)
        if self._out_buf is None or self._out_buf.size < cap:
            self._out_buf = np.empty(cap, np.uint8)
        wh = (ctypes.c_int * 2)()
        fmt_i = 0 if out_codec == Codec.UYVY else 1
        n = self._lib.lavc_dec_packet(
            self._h, data.ctypes.data, data.size, fmt_i,
            self._out_buf.ctypes.data, self._out_buf.size, wh,
        )
        if n <= 0:
            return None
        w, h = wh[0], wh[1]
        bpp = 2 if out_codec == Codec.UYVY else 3
        out = VideoFrame(
            VideoDesc(w, h, out_codec, desc.fps),
            [self._out_buf[:n].reshape(h, w * bpp).copy()],
        )
        out.timestamp = frame.timestamp
        return out

    def done(self) -> None:
        if self._h is not None:
            self._lib.lavc_dec_close(self._h)
            self._h = None


if lavc_available():
    register_module("libavcodec", LibraryClass.VIDEO_COMPRESS, LavcCompress)
    register_module("lavc", LibraryClass.VIDEO_COMPRESS, LavcCompress)  # alias
    register_module("libavcodec", LibraryClass.VIDEO_DECOMPRESS, LavcDecompress)
