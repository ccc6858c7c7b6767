"""Video decompression modules (receiver side).

Mirrors the reference decompress contract (ref: src/video_decompress.h:90-199):
selection by (compressed codec, output codec) with priority probing.

Built-ins: dxt (DXT1/DXT5-YCoCg -> RGB), jpeg (-> UYVY/RGB), i420 (-> UYVY
shim, ref: src/video_decompress/i420.c).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ultragrid_tpu.modules.registry import LibraryClass, load_library, register_module
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.log import Logger

log = Logger("decompress")

DECODER_GOT_CODEC = 1  # probing result marker (ref: video_decompress.h:95)


class VideoDecompress:
    #: (in_codec, out_codec) pairs this module supports
    SUPPORTS: List[Tuple[Codec, Codec]] = []

    def __init__(self) -> None:
        pass

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        raise NotImplementedError

    def done(self) -> None:
        pass


class DxtDecompress(VideoDecompress):
    """DXT1/DXT5-YCoCg -> RGB (ref: src/video_decompress/dxt_glsl.c +
    dxt_compress display shaders, run as device kernels here)."""

    SUPPORTS = [(Codec.DXT1, Codec.RGB), (Codec.DXT5, Codec.RGB)]

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        from ultragrid_tpu.ops import dxt as dxt_ops

        desc = frame.desc
        if out_codec != Codec.RGB:
            return None
        if desc.color_spec == Codec.DXT1:
            rgb = dxt_ops.dxt1_decode_rgb(frame.data.reshape(-1), desc.width, desc.height)
        elif desc.color_spec == Codec.DXT5:
            rgb = dxt_ops.dxt5_ycocg_decode_rgb(frame.data.reshape(-1), desc.width, desc.height)
        else:
            return None
        out = VideoFrame(desc.with_(color_spec=Codec.RGB), [rgb])
        out.timestamp = frame.timestamp
        return out


class I420Decompress(VideoDecompress):
    """I420 -> UYVY shim (ref: src/video_decompress/i420.c)."""

    SUPPORTS = [(Codec.I420, Codec.UYVY)]

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        from ultragrid_tpu.ops.planar import i420_8_to_uyvy

        if out_codec != Codec.UYVY:
            return None
        desc = frame.desc
        data = i420_8_to_uyvy(frame.data.reshape(-1), desc.width, desc.height)
        out = VideoFrame(desc.with_(color_spec=Codec.UYVY), [data])
        out.timestamp = frame.timestamp
        return out


class JpegDecompress(VideoDecompress):
    """JPEG -> UYVY / RGB (ref: src/video_decompress/gpujpeg.c)."""

    SUPPORTS = [(Codec.JPEG, Codec.UYVY), (Codec.JPEG, Codec.RGB)]

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        from ultragrid_tpu.ops.jpeg import decode_jpeg_to_frame

        return decode_jpeg_to_frame(frame, out_codec)


class JpegToDxtDecompress(VideoDecompress):
    """JPEG -> DXT transcode entirely on device (ref:
    src/video_decompress/gpujpeg_to_dxt.cpp — decode and re-encode without
    leaving the accelerator, used for tiled display walls).  Here the C scan
    decode feeds the device IDCT whose output goes straight into the DXT
    block encoder."""

    SUPPORTS = [(Codec.JPEG, Codec.DXT1), (Codec.JPEG, Codec.DXT5)]

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        from ultragrid_tpu.ops import dxt as dxt_ops
        from ultragrid_tpu.ops.jpeg import decode_jpeg_to_frame

        mid = decode_jpeg_to_frame(frame, Codec.RGB)
        if mid is None:
            return None
        desc = mid.desc
        if out_codec == Codec.DXT1:
            data = dxt_ops.dxt1_encode_rgb(mid.data, desc.width)
        else:
            data = dxt_ops.dxt5_ycocg_encode_rgb(mid.data, desc.width)
        out = VideoFrame(desc.with_(color_spec=out_codec), [data])
        out.timestamp = frame.timestamp
        return out


class OwnH264Decompress(VideoDecompress):
    """Own H.264 decoder (ops/h264_dec.py): decodes the subset the own
    encoder emits — intra (I_PCM, I_16x16, I_4x4 CAVLC) and inter pictures
    (P_Skip / P_L0_16x16 integer-MV GOPs) — sample-exact with libavcodec
    (tested).  Stateful across access units so P frames find their
    reference.  Selected as the no-FFmpeg fallback for H.264; raises on
    streams outside the subset, which the driver treats as decode failure.
    """

    SUPPORTS = [(Codec.H264, Codec.UYVY)]

    def __init__(self):
        self._stream = None

    def decompress(self, frame: VideoFrame, out_codec: Codec):
        import numpy as np

        from ultragrid_tpu.ops.h264_dec import StreamDecoder, UnsupportedStream

        if self._stream is None:
            self._stream = StreamDecoder()
        try:
            y, cb, cr = self._stream.decode_au(bytes(np.asarray(frame.data)))
        except (UnsupportedStream, IndexError, KeyError):
            return None
        h, w = y.shape
        # I420 -> UYVY (chroma rows duplicated)
        cbf = np.repeat(cb, 2, axis=0)[:h]
        crf = np.repeat(cr, 2, axis=0)[:h]
        out = np.empty((h, w * 2), np.uint8)
        out[:, 1::2] = y
        out[:, 0::4] = cbf[:, : w // 2]
        out[:, 2::4] = crf[:, : w // 2]
        desc = VideoDesc(w, h, Codec.UYVY, frame.desc.fps,
                         frame.desc.interlacing, frame.desc.tile_count)
        return VideoFrame(desc, [out], timestamp=frame.timestamp)


register_module("dxt", LibraryClass.VIDEO_DECOMPRESS, DxtDecompress)
register_module("h264_own", LibraryClass.VIDEO_DECOMPRESS, OwnH264Decompress)
register_module("i420", LibraryClass.VIDEO_DECOMPRESS, I420Decompress)
register_module("jpeg", LibraryClass.VIDEO_DECOMPRESS, JpegDecompress)
register_module("jpeg_to_dxt", LibraryClass.VIDEO_DECOMPRESS, JpegToDxtDecompress)

class JpegXsDecompress(VideoDecompress):
    """JPEG XS-architecture stream -> UYVY (ref role:
    src/video_decompress/jpegxs.cpp; see ops/jpegxs.py)."""

    SUPPORTS = [(Codec.JPEG_XS, Codec.UYVY)]

    def __init__(self) -> None:
        from ultragrid_tpu.ops.jpegxs import JpegXsCodec

        self.codec = JpegXsCodec()

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        import numpy as np

        if out_codec != Codec.UYVY:
            return None
        stream = bytes(np.asarray(frame.data, np.uint8).reshape(-1))
        y, cb, cr = self.codec.decode_planes(stream)
        h, w = y.shape
        out = np.empty((h, 2 * w), np.uint8)
        out[:, 1::2] = np.clip(y, 0, 255)
        out[:, 0::4] = np.clip(cb, 0, 255)
        out[:, 2::4] = np.clip(cr, 0, 255)
        res = VideoFrame(frame.desc.with_(color_spec=Codec.UYVY), [out])
        res.timestamp = frame.timestamp
        return res


register_module("jpegxs", LibraryClass.VIDEO_DECOMPRESS, JpegXsDecompress)


class ApvDecompress(VideoDecompress):
    """APV-architecture stream -> UYVY (ref role:
    src/video_decompress/openapv.cpp wrapping liboapv; see ops/apv.py).
    The coded 10-bit 4:2:2 planes are rounded back to 8-bit UYVY."""

    SUPPORTS = [(Codec.APV, Codec.UYVY)]

    def __init__(self) -> None:
        from ultragrid_tpu.ops.apv import ApvCodec

        self.codec = ApvCodec()

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        import numpy as np

        if out_codec != Codec.UYVY:
            return None
        stream = bytes(np.asarray(frame.data, np.uint8).reshape(-1))
        planes = self.codec.decode_planes(stream)
        if len(planes) != 3:
            log.error("openapv: only 4:2:2/4:4:4 streams map to UYVY")
            return None
        y, cb, cr = ((p + 2) >> 2 for p in planes)  # 10 -> 8 bit
        if cb.shape[1] == y.shape[1]:  # 444 stream: decimate chroma
            cb, cr = cb[:, ::2], cr[:, ::2]
        h, w = y.shape
        out = np.empty((h, 2 * w), np.uint8)
        out[:, 1::2] = np.clip(y, 0, 255)
        out[:, 0::4] = np.clip(cb, 0, 255)
        out[:, 2::4] = np.clip(cr, 0, 255)
        res = VideoFrame(frame.desc.with_(color_spec=Codec.UYVY), [out])
        res.timestamp = frame.timestamp
        return res


register_module("openapv", LibraryClass.VIDEO_DECOMPRESS, ApvDecompress)


class CineformDecompress(VideoDecompress):
    """CineForm stream -> UYVY (ref role:
    src/video_decompress/cineform.cpp).  Real CFHD samples — our own
    encoder's AND libavcodec's cfhd encoder output — decode natively
    through ops/cfhd_bitstream.py; UCF1 (the lossless own container)
    through ops/cineform.py; anything neither parses falls back to
    libavcodec's cfhd decoder."""

    SUPPORTS = [(Codec.CFHD, Codec.UYVY)]

    def __init__(self) -> None:
        from ultragrid_tpu.ops.cineform import CineformCodec

        self.codec = CineformCodec()
        self._lavc = None

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        import numpy as np

        if out_codec != Codec.UYVY:
            return None
        stream = bytes(np.asarray(frame.data, np.uint8).reshape(-1))
        if stream[:4] != b"UCF1":
            try:
                from ultragrid_tpu.ops.cfhd_bitstream import cfhd_decode

                planes = cfhd_decode(stream, frame.desc.width, frame.desc.height)
                # CFHD channel order is Y, V, U; round the 10->8 conversion
                # (an exact inverse of the encoder's <<2 either way)
                y10, v10, u10 = (np.clip((p + 2) >> 2, 0, 255) for p in planes)
                h, w = y10.shape
                out = np.empty((h, 2 * w), np.uint8)
                out[:, 1::2] = y10
                out[:, 0::4] = u10  # chroma planes are half width
                out[:, 2::4] = v10
                res = VideoFrame(frame.desc.with_(color_spec=Codec.UYVY), [out])
                res.timestamp = frame.timestamp
                return res
            except Exception:  # noqa: BLE001 - unparseable -> lavc
                pass
            try:
                from ultragrid_tpu.modules.lavc import LavcDecompress

                if self._lavc is None:
                    self._lavc = LavcDecompress()
                return self._lavc.decompress(frame, out_codec)
            except Exception:  # noqa: BLE001 - no lavc -> decode failure
                log.error("cineform: foreign CFHD stream and no libavcodec")
                return None
        y, cb, cr = self.codec.decode_planes(stream)
        h, w = y.shape
        out = np.empty((h, 2 * w), np.uint8)
        out[:, 1::2] = np.clip(y, 0, 255)
        out[:, 0::4] = np.clip(cb, 0, 255)
        out[:, 2::4] = np.clip(cr, 0, 255)
        res = VideoFrame(frame.desc.with_(color_spec=Codec.UYVY), [out])
        res.timestamp = frame.timestamp
        return res


register_module("cineform", LibraryClass.VIDEO_DECOMPRESS, CineformDecompress)


class J2kDecompress(VideoDecompress):
    """JPEG 2000 -> RGB (ref role: src/video_decompress/cmpto_j2k.cpp).

    Own T.800 decoder first (ops/j2k.py Tier-2 + native/j2k_t1.c MQ/T1 —
    sample-exact with OpenJPEG on own streams, tested); codestreams using
    features outside the own profile fall back to OpenJPEG via Pillow (a
    system-library wrapper exactly like the lavc class)."""

    SUPPORTS = [(Codec.J2KR, Codec.RGB), (Codec.J2K, Codec.RGB)]

    def decompress(self, frame: VideoFrame, out_codec: Codec) -> Optional[VideoFrame]:
        import io

        import numpy as np

        if out_codec != Codec.RGB:
            return None
        stream = bytes(np.asarray(frame.data, np.uint8).reshape(-1))
        arr = None
        try:
            from ultragrid_tpu.ops.j2k import J2KDecoder, UnsupportedStream

            comps = J2KDecoder().decode(stream)
            arr = comps[0] if len(comps) == 1 else np.stack(comps[:3], axis=-1)
        except Exception:  # noqa: BLE001 - foreign profile -> OpenJPEG
            arr = None
        if arr is None:
            try:
                from PIL import Image

                arr = np.asarray(Image.open(io.BytesIO(stream)))
            except Exception:  # noqa: BLE001 - corrupt stream
                log.error("j2k: decode failed")
                return None
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        h, w = arr.shape[:2]
        out = VideoFrame(
            frame.desc.with_(color_spec=Codec.RGB),
            [np.ascontiguousarray(arr[:, :, :3]).reshape(h, w * 3)],
        )
        out.timestamp = frame.timestamp
        return out


register_module("cmpto_j2k", LibraryClass.VIDEO_DECOMPRESS, J2kDecompress)

_ALL = [DxtDecompress, I420Decompress, JpegDecompress, JpegToDxtDecompress,
        JpegXsDecompress, ApvDecompress, CineformDecompress, J2kDecompress]


def decompress_init(in_codec: Codec, out_candidates: List[Codec]):
    """Pick a decompressor + output codec (ref: src/video_decompress.c
    selection by priority; libavcodec is the catch-all fallback like the
    reference's probe order)."""
    classes = list(_ALL)
    try:
        from ultragrid_tpu.modules.lavc import LavcDecompress, lavc_available

        if lavc_available():
            classes.append(LavcDecompress)
    except Exception:  # noqa: BLE001 - lavc strictly optional
        pass
    # own H.264 intra decoder: after lavc (which handles every profile),
    # but present even without FFmpeg so own-encoder streams still display
    classes.append(OwnH264Decompress)
    for out_codec in out_candidates:
        for cls in classes:
            if (in_codec, out_codec) in cls.SUPPORTS:
                return cls(), out_codec
    return None, None
