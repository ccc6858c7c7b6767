"""Core video types: codec registry, video description, frames.

TPU-native analogue of the reference's ``src/types.h`` + ``src/video_codec.{h,c}``
(codec_t enum ``src/types.h:62-111``, metadata table ``src/video_codec.c:123-207``,
line-size math ``src/video_codec.c:508-539``).  The codec names, FourCCs, and the
block/alignment math are the public contract other layers rely on (packetizer,
conversions, compress modules); the *storage* here is JAX arrays instead of C
byte buffers.

A :class:`VideoFrame` stores the packed representation as a ``uint8`` array of
shape ``(tiles?, height, linesize)`` so that every conversion kernel is a pure
function over whole frames (not per-line calls like the reference's
``decoder_t``).
"""

from __future__ import annotations

import dataclasses
import enum
from fractions import Fraction
from typing import Any, Optional, Tuple

import numpy as np

__all__ = [
    "Codec",
    "Subsampling",
    "InterlacingType",
    "VideoDesc",
    "VideoFrame",
    "CodecInfo",
    "get_codec_info",
    "get_bpp",
    "get_bits_per_component",
    "get_subsampling",
    "is_codec_opaque",
    "is_codec_interframe",
    "codec_is_a_rgb",
    "codec_is_planar",
    "codec_is_const_size",
    "get_fourcc",
    "get_codec_from_fourcc",
    "get_codec_from_name",
    "vc_get_linesize",
    "vc_get_size",
    "vc_get_datalen",
    "codec_get_planes_subsampling",
    "to_fourcc",
    "MAX_PADDING",
    "PIX_BLOCK_LCM",
    "KHZ_90",
]

# Conversions may read up to this number of bytes past the line end; buffers
# over-allocate accordingly (ref: src/video_codec.h:61-64).
MAX_PADDING = 64
# Least common multiple of pixel-block sizes; the packetizer aligns split
# points of uncompressed video to this many pixels (ref: src/video_codec.h:64).
PIX_BLOCK_LCM = 24
# RTP media clock (ref: src/types.h:152).
KHZ_90 = 90000


def to_fourcc(a: str, b: str, c: str, d: str) -> int:
    return ord(a) | (ord(b) << 8) | (ord(c) << 16) | (ord(d) << 24)


class Codec(enum.IntEnum):
    """Video codec / pixel format ids (ref: codec_t, src/types.h:62-111)."""

    NONE = 0
    RGBA = 1
    UYVY = 2
    YUYV = 3
    VUYA = 4
    R10k = 5
    R12L = 6
    v210 = 7
    DVS10 = 8
    DXT1 = 9
    DXT1_YUV = 10
    DXT5 = 11
    RGB = 12
    JPEG = 13
    JPEG_XS = 14
    RAW = 15
    H264 = 16
    H265 = 17
    VP8 = 18
    VP9 = 19
    BGR = 20
    J2K = 21
    J2KR = 22
    HW_VDPAU = 23
    HFYU = 24
    FFV1 = 25
    CFHD = 26
    RG48 = 27
    AV1 = 28
    I420 = 29
    Y216 = 30
    Y416 = 31
    PRORES = 32
    PRORES_4444 = 33
    PRORES_4444_XQ = 34
    PRORES_422_HQ = 35
    PRORES_422 = 36
    PRORES_422_PROXY = 37
    PRORES_422_LT = 38
    APV = 39
    DRM_PRIME = 40


class Subsampling(enum.IntEnum):
    """Chroma subsampling for pixel formats; OPAQUE for compressed codecs."""

    OPAQUE = 0
    S420 = 420
    S422 = 422
    S444 = 444
    S4444 = 4444


class InterlacingType(enum.IntEnum):
    """Interlacing (ref: src/types.h interlacing_t)."""

    PROGRESSIVE = 0
    UPPER_FIELD_FIRST = 1
    LOWER_FIELD_FIRST = 2
    INTERLACED_MERGED = 3
    SEGMENTED_FRAME = 4


# --- codec flags ---
VCF_NONE = 0
VCF_RGB = 1 << 0
VCF_INTERFRAME = 1 << 1
VCF_CONST_SIZE = 1 << 2


@dataclasses.dataclass(frozen=True)
class CodecInfo:
    """Per-codec metadata (ref: struct codec_info_t, src/video_codec.c:104-116)."""

    name: str
    name_long: str
    fcc: int
    block_size_bytes: int
    block_size_pixels: int
    h_align: int
    bits_per_channel: int
    flags: int
    subsampling: Subsampling
    file_extension: Optional[str]

    @property
    def bpp(self) -> float:
        if self.block_size_pixels == 0:
            return 0.0
        return self.block_size_bytes / self.block_size_pixels

    @property
    def rgb(self) -> bool:
        return bool(self.flags & VCF_RGB)

    @property
    def opaque(self) -> bool:
        return self.subsampling == Subsampling.OPAQUE


_C = Codec
_S = Subsampling

# Metadata mirrors the reference table values exactly
# (ref: codec_info[], src/video_codec.c:123-207).
CODEC_INFO: dict[Codec, CodecInfo] = {
    _C.NONE: CodecInfo("(none)", "Undefined Codec", 0, 0, 0, 0, 0, VCF_NONE, _S.OPAQUE, None),
    _C.RGBA: CodecInfo("RGBA", "Red Green Blue Alpha 32bit", to_fourcc("R", "G", "B", "A"), 4, 1, 1, 8, VCF_RGB, _S.S4444, "rgba"),
    _C.UYVY: CodecInfo("UYVY", "YUV 4:2:2", to_fourcc("U", "Y", "V", "Y"), 4, 2, 2, 8, VCF_NONE, _S.S422, "yuv"),
    _C.YUYV: CodecInfo("YUYV", "YUV 4:2:2", to_fourcc("Y", "U", "Y", "V"), 4, 2, 2, 8, VCF_NONE, _S.S422, "yuv"),
    _C.VUYA: CodecInfo("VUYA", "VUYA 4:4:4:4", to_fourcc("V", "U", "Y", "A"), 4, 1, 1, 8, VCF_NONE, _S.S4444, "vuya"),
    _C.R10k: CodecInfo("R10k", "10-bit RGB 4:4:4", to_fourcc("R", "1", "0", "k"), 4, 1, 64, 10, VCF_RGB, _S.S444, "r10k"),
    _C.R12L: CodecInfo("R12L", "12-bit packed RGB 4:4:4 little-endian", to_fourcc("R", "1", "2", "l"), 36, 8, 8, 12, VCF_RGB, _S.S444, "r12l"),
    _C.v210: CodecInfo("v210", "10-bit YUV 4:2:2", to_fourcc("v", "2", "1", "0"), 16, 6, 48, 10, VCF_NONE, _S.S422, "v210"),
    _C.DVS10: CodecInfo("DVS10", "Centaurus 10bit YUV 4:2:2", to_fourcc("D", "S", "1", "0"), 16, 6, 48, 10, VCF_NONE, _S.S422, "dvs10"),
    _C.DXT1: CodecInfo("DXT1", "S3 Compressed Texture DXT1", to_fourcc("D", "X", "T", "1"), 1, 2, 0, 2, VCF_RGB, _S.OPAQUE, "dxt1"),
    _C.DXT1_YUV: CodecInfo("DXT1_YUV", "S3 Compressed Texture DXT1 YUV", to_fourcc("D", "X", "T", "Y"), 1, 2, 0, 2, VCF_NONE, _S.OPAQUE, "dxt1y"),
    _C.DXT5: CodecInfo("DXT5", "S3 Compressed Texture DXT5 YCoCg", to_fourcc("D", "X", "T", "5"), 1, 1, 0, 4, VCF_NONE, _S.OPAQUE, "yog"),
    _C.RGB: CodecInfo("RGB", "Red Green Blue 24bit", to_fourcc("R", "G", "B", "2"), 3, 1, 1, 8, VCF_RGB, _S.S444, "rgb"),
    _C.JPEG: CodecInfo("JPEG", "JPEG", to_fourcc("J", "P", "E", "G"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "jpg"),
    _C.JPEG_XS: CodecInfo("JPEG_XS", "JPEG XS", to_fourcc("J", "X", "S", "S"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "jxs"),
    _C.RAW: CodecInfo("raw", "Raw SDI video", to_fourcc("r", "a", "w", "s"), 1, 1, 0, 0, VCF_NONE, _S.OPAQUE, "raw"),
    _C.H264: CodecInfo("H.264", "H.264/AVC", to_fourcc("A", "V", "C", "1"), 1, 1, 0, 8, VCF_INTERFRAME, _S.OPAQUE, "h264"),
    _C.H265: CodecInfo("H.265", "H.265/HEVC", to_fourcc("H", "E", "V", "C"), 1, 1, 0, 8, VCF_INTERFRAME, _S.OPAQUE, "h265"),
    _C.VP8: CodecInfo("VP8", "Google VP8", to_fourcc("V", "P", "8", "0"), 1, 1, 0, 8, VCF_INTERFRAME, _S.OPAQUE, "vp8"),
    _C.VP9: CodecInfo("VP9", "Google VP9", to_fourcc("V", "P", "9", "0"), 1, 1, 0, 8, VCF_INTERFRAME, _S.OPAQUE, "vp9"),
    _C.BGR: CodecInfo("BGR", "Blue Green Red 24bit", to_fourcc("B", "G", "R", "2"), 3, 1, 1, 8, VCF_RGB, _S.S444, "bgr"),
    _C.J2K: CodecInfo("J2K", "JPEG 2000", to_fourcc("M", "J", "2", "C"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "j2k"),
    _C.J2KR: CodecInfo("J2KR", "JPEG 2000 RGB", to_fourcc("M", "J", "2", "R"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "j2k"),
    _C.HW_VDPAU: CodecInfo("HW_VDPAU", "VDPAU hardware surface", to_fourcc("V", "D", "P", "S"), 0, 1, 0, 8, VCF_CONST_SIZE, _S.OPAQUE, "vdpau"),
    _C.HFYU: CodecInfo("HFYU", "HuffYUV", to_fourcc("H", "F", "Y", "U"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "hfyu"),
    _C.FFV1: CodecInfo("FFV1", "FFV1", to_fourcc("F", "F", "V", "1"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "ffv1"),
    _C.CFHD: CodecInfo("CFHD", "Cineform", to_fourcc("C", "F", "H", "D"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "cfhd"),
    _C.RG48: CodecInfo("RG48", "16-bit RGB little-endian", to_fourcc("R", "G", "4", "8"), 6, 1, 1, 16, VCF_RGB, _S.S444, "rg48"),
    _C.AV1: CodecInfo("AV1", "AOMedia Video 1", to_fourcc("a", "v", "0", "1"), 1, 1, 0, 8, VCF_RGB, _S.OPAQUE, "av1"),
    _C.I420: CodecInfo("I420", "planar YUV 4:2:0", to_fourcc("I", "4", "2", "0"), 3, 2, 2, 8, VCF_NONE, _S.S420, "yuv"),
    _C.Y216: CodecInfo("Y216", "Packed 16-bit YUV 4:2:2 little-endian", to_fourcc("Y", "2", "1", "6"), 8, 2, 2, 16, VCF_NONE, _S.S422, "y216"),
    _C.Y416: CodecInfo("Y416", "Packed 16-bit YUV 4:4:4:4 little-endian", to_fourcc("Y", "4", "1", "6"), 8, 1, 1, 16, VCF_NONE, _S.S4444, "y416"),
    _C.PRORES: CodecInfo("PRORES", "Apple ProRes", 0, 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "pror"),
    _C.PRORES_4444: CodecInfo("PRORES_4444", "Apple ProRes 4444", to_fourcc("a", "p", "4", "h"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "ap4h"),
    _C.PRORES_4444_XQ: CodecInfo("PRORES_4444_XQ", "Apple ProRes 4444 (XQ)", to_fourcc("a", "p", "4", "x"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "ap4x"),
    _C.PRORES_422_HQ: CodecInfo("PRORES_422_HQ", "Apple ProRes 422 (HQ)", to_fourcc("a", "p", "c", "h"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "apch"),
    _C.PRORES_422: CodecInfo("PRORES_422", "Apple ProRes 422", to_fourcc("a", "p", "c", "n"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "apcn"),
    _C.PRORES_422_PROXY: CodecInfo("PRORES_422_PROXY", "Apple ProRes 422 (Proxy)", to_fourcc("a", "p", "c", "o"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "apco"),
    _C.PRORES_422_LT: CodecInfo("PRORES_422_LT", "Apple ProRes 422 (LT)", to_fourcc("a", "p", "c", "s"), 1, 1, 0, 8, VCF_NONE, _S.OPAQUE, "apcs"),
    _C.APV: CodecInfo("APV", "Advanced Professional Video", to_fourcc("a", "p", "v", "1"), 1, 1, 0, 0, VCF_NONE, _S.OPAQUE, "apv"),
    _C.DRM_PRIME: CodecInfo("DRM_PRIME", "DRM Prime buffer", to_fourcc("D", "R", "M", "P"), 0, 1, 0, 8, VCF_CONST_SIZE, _S.OPAQUE, "drm_prime"),
}

# Planar plane subsampling [c0_h, c0_v, c1_h, c1_v, ...]
# (ref: pixfmt_plane_info[], src/video_codec.c:214-217).
_PLANE_SUBSAMPLING: dict[Codec, Tuple[int, ...]] = {
    _C.I420: (1, 1, 2, 2, 2, 2, 0, 0),
}


def get_codec_info(codec: Codec) -> CodecInfo:
    return CODEC_INFO[Codec(codec)]


def get_bpp(codec: Codec) -> float:
    return get_codec_info(codec).bpp


def get_bits_per_component(codec: Codec) -> int:
    return get_codec_info(codec).bits_per_channel


def get_subsampling(codec: Codec) -> int:
    return int(get_codec_info(codec).subsampling)


def is_codec_opaque(codec: Codec) -> bool:
    return get_codec_info(codec).opaque


def is_codec_interframe(codec: Codec) -> bool:
    return bool(get_codec_info(codec).flags & VCF_INTERFRAME)


def codec_is_a_rgb(codec: Codec) -> bool:
    return get_codec_info(codec).rgb


def codec_is_const_size(codec: Codec) -> bool:
    return bool(get_codec_info(codec).flags & VCF_CONST_SIZE)


def codec_is_planar(codec: Codec) -> bool:
    return Codec(codec) in _PLANE_SUBSAMPLING


def get_fourcc(codec: Codec) -> int:
    return get_codec_info(codec).fcc


def get_codec_from_fourcc(fcc: int) -> Codec:
    for c, info in CODEC_INFO.items():
        if info.fcc == fcc and c != Codec.NONE:
            return c
    return Codec.NONE


def get_codec_from_name(name: str) -> Codec:
    for c, info in CODEC_INFO.items():
        if info.name.lower() == name.lower():
            return c
    return Codec.NONE


def vc_get_linesize(width: int, codec: Codec) -> int:
    """Aligned byte length of one line (ref: src/video_codec.c:508-522)."""
    info = get_codec_info(codec)
    if info.h_align:
        width = (width + info.h_align - 1) // info.h_align * info.h_align
    pixs = info.block_size_pixels
    if pixs == 0:
        return 0
    return (width + pixs - 1) // pixs * info.block_size_bytes


def vc_get_size(width: int, codec: Codec) -> int:
    """Unaligned byte size of `width` pixels (ref: src/video_codec.c:531-539)."""
    info = get_codec_info(codec)
    pixs = info.block_size_pixels
    if pixs == 0:
        return 0
    return (width + pixs - 1) // pixs * info.block_size_bytes


def codec_get_planes_subsampling(codec: Codec) -> Tuple[int, ...]:
    return _PLANE_SUBSAMPLING.get(Codec(codec), ())


def vc_get_datalen(width: int, height: int, codec: Codec) -> int:
    """Storage size of a frame (ref: src/video_codec.c:544-563)."""
    if not codec_is_planar(codec):
        return vc_get_linesize(width, codec) * height
    sub = codec_get_planes_subsampling(codec)
    total = 0
    for i in range(4):
        if sub[i * 2] == 0:
            break
        total += ((width + sub[i * 2] - 1) // sub[i * 2]) * (
            (height + sub[i * 2 + 1] - 1) // sub[i * 2 + 1]
        )
    return total


# ---------------------------------------------------------------------------
# Video description & frames
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VideoDesc:
    """Format descriptor (ref: struct video_desc, src/types.h:181-195)."""

    width: int
    height: int
    color_spec: Codec
    fps: float = 30.0
    interlacing: InterlacingType = InterlacingType.PROGRESSIVE
    tile_count: int = 1

    def linesize(self) -> int:
        return vc_get_linesize(self.width, self.color_spec)

    def datalen(self) -> int:
        return vc_get_datalen(self.width, self.height, self.color_spec)

    def with_(self, **kw: Any) -> "VideoDesc":
        return dataclasses.replace(self, **kw)

    def __str__(self) -> str:
        interl = {
            InterlacingType.PROGRESSIVE: "p",
            InterlacingType.UPPER_FIELD_FIRST: "uff",
            InterlacingType.LOWER_FIELD_FIRST: "lff",
            InterlacingType.INTERLACED_MERGED: "i",
            InterlacingType.SEGMENTED_FRAME: "psf",
        }[self.interlacing]
        fps = f"{self.fps:.4g}"
        return f"{self.width}x{self.height} @{fps}{interl}, codec {get_codec_info(self.color_spec).name}"

    @staticmethod
    def parse(s: str) -> "VideoDesc":
        """Parse ``WxH @fps[pi], codec NAME`` round-trippable with __str__."""
        size_part, rest = s.split(" @", 1)
        w, h = size_part.split("x")
        fps_part, codec_part = rest.split(", codec ")
        interl_map = {"p": InterlacingType.PROGRESSIVE, "uff": InterlacingType.UPPER_FIELD_FIRST,
                      "lff": InterlacingType.LOWER_FIELD_FIRST, "i": InterlacingType.INTERLACED_MERGED,
                      "psf": InterlacingType.SEGMENTED_FRAME}
        for suffix in ("psf", "uff", "lff", "i", "p"):
            if fps_part.endswith(suffix):
                interl = interl_map[suffix]
                fps = float(fps_part[: -len(suffix)])
                break
        else:
            raise ValueError(f"cannot parse interlacing from {fps_part!r}")
        return VideoDesc(int(w), int(h), get_codec_from_name(codec_part), fps, interl)


def parse_fps(fps_str: str) -> Fraction:
    """Parse fps strings like ``29.97``, ``30000/1001``, ``60``.

    Mirrors get_framerate semantics (ref: test/get_framerate_test.cpp):
    29.97 -> 30000/1001, 23.98 -> 24000/1001 etc.
    """
    if "/" in fps_str:
        num, den = fps_str.split("/")
        return Fraction(int(num), int(den))
    val = float(fps_str)
    if abs(val - round(val)) < 1e-9:
        return Fraction(round(val), 1)
    # NTSC-style rates: x.97/x.98 represent round(x+1)*1000/1001
    approx = Fraction(round((val * 1001) / 1000)) * 1000 / 1001
    if abs(float(approx) - val) < 0.01:
        return Fraction(round((val * 1001) / 1000) * 1000, 1001)
    return Fraction(val).limit_denominator(100000)


class VideoFrame:
    """A video frame: packed bytes as an array + descriptor.

    ``data`` is a ``uint8`` ndarray (numpy or jax) of shape ``(height, linesize)``
    for pixel formats, or 1-D ``(datalen,)`` for opaque/compressed codecs.  For
    multi-tile frames (``desc.tile_count > 1``) ``tiles`` holds one array per
    tile (ref: struct video_frame / struct tile, src/types.h:301-342).
    """

    __slots__ = ("desc", "tiles", "timestamp", "compress_start", "compress_end", "callbacks")

    def __init__(self, desc: VideoDesc, tiles: Optional[list] = None, timestamp: float = -1.0):
        self.desc = desc
        self.tiles = tiles if tiles is not None else []
        self.timestamp = timestamp  # seconds; RTP TS = timestamp * 90 kHz
        self.compress_start = 0.0
        self.compress_end = 0.0
        self.callbacks: dict[str, Any] = {}

    @property
    def data(self):
        return self.tiles[0]

    @data.setter
    def data(self, value) -> None:
        if self.tiles:
            self.tiles[0] = value
        else:
            self.tiles.append(value)

    @staticmethod
    def alloc(desc: VideoDesc) -> "VideoFrame":
        """Allocate zeroed host-side frame storage (ref: vf_alloc_desc_data)."""
        tiles = []
        for _ in range(desc.tile_count):
            if codec_is_planar(desc.color_spec) or is_codec_opaque(desc.color_spec):
                tiles.append(np.zeros((desc.datalen(),), dtype=np.uint8))
            else:
                tiles.append(np.zeros((desc.height, desc.linesize()), dtype=np.uint8))
        return VideoFrame(desc, tiles)

    def copy(self) -> "VideoFrame":
        f = VideoFrame(self.desc, [np.array(t) for t in self.tiles], self.timestamp)
        return f

    def __repr__(self) -> str:
        return f"VideoFrame({self.desc})"
