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
    """Own H.264 decoder, preferred for in-envelope streams: the C entropy
    + reconstruction stage (native/h264_entropy.c via ops/h264_fast.py)
    decodes progressive baseline/main/high CAVLC+CABAC I/P streams in
    real time, sample-exact with libavcodec (tested).  The scalar Python
    decoder (ops/h264_dec.py) serves when the native build is unavailable.
    Out-of-envelope streams (interlace, scaling lists, temporal
    direct) hand the session over to lavc permanently — the same
    probe-then-commit behavior as the reference's decoder selection
    (src/video_decompress.c priority probing).
    """

    SUPPORTS = [(Codec.H264, Codec.UYVY)]

    GOP_CACHE_CAP = 512  # AUs kept since the last IDR for lavc takeover

    def __init__(self):
        self._stream = None
        self._delegate = None  # lavc takes over after UnsupportedStream
        self._gop_cache: list = []  # raw AUs since the last IDR

    @staticmethod
    def _has_idr(au: bytes) -> bool:
        i, n = 0, len(au)
        while i < n - 3:
            if au[i] == 0 and au[i + 1] == 0 and (
                    au[i + 2] == 1
                    or (au[i + 2] == 0 and i + 3 < n and au[i + 3] == 1)):
                s = i + (3 if au[i + 2] == 1 else 4)
                if s < n and (au[s] & 0x1F) == 5:
                    return True
                i = s
            else:
                i += 1
        return False

    def _cache_au(self, au: bytes) -> None:
        if self._has_idr(au):
            self._gop_cache = []
        if len(self._gop_cache) < self.GOP_CACHE_CAP:
            self._gop_cache.append(au)

    def _lavc_takeover(self, frame: VideoFrame, out_codec: Codec, why):
        try:
            from ultragrid_tpu.modules.lavc import LavcDecompress, lavc_available
        except Exception:  # noqa: BLE001
            return None
        if not lavc_available():
            return None
        import numpy as np

        from ultragrid_tpu.utils.log import Logger

        Logger("decompress").notice(
            f"own H.264 decoder: stream out of envelope ({why}); "
            "libavcodec takes over")
        self._delegate = LavcDecompress()
        # replay the GOP so far (incl. SPS/PPS + IDR the own decoder
        # consumed) so lavc has the references; return the freshest output
        out = None
        for au in self._gop_cache:
            vf = VideoFrame(frame.desc, [np.frombuffer(au, np.uint8)])
            vf.timestamp = frame.timestamp
            got = self._delegate.decompress(vf, out_codec)
            if got is not None:
                out = got
        self._gop_cache = []
        return out

    def decompress(self, frame: VideoFrame, out_codec: Codec):
        import numpy as np

        from ultragrid_tpu.ops.h264_dec import UnsupportedStream
        from ultragrid_tpu.utils.params import get_commandline_param

        if self._delegate is not None:
            return self._delegate.decompress(frame, out_codec)
        if self._stream is None:
            if get_commandline_param("h264-decoder") == "lavc":
                return self._lavc_takeover(frame, out_codec, "forced by --param")
            try:
                if get_commandline_param("h264-decoder") == "python":
                    raise UnsupportedStream("forced python decoder")
                from ultragrid_tpu.ops.h264_fast import FastStreamDecoder

                self._stream = FastStreamDecoder()
            except UnsupportedStream:
                from ultragrid_tpu.ops.h264_dec import StreamDecoder

                self._stream = StreamDecoder()
        au = bytes(np.asarray(frame.data))
        self._cache_au(au)
        try:
            got = self._stream.decode_au(au)
        except (UnsupportedStream, IndexError, KeyError) as exc:
            return self._lavc_takeover(frame, out_codec, exc)
        if got is None:
            return None  # B-stream display reorder still priming
        y, cb, cr = got
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


from ultragrid_tpu.utils.params import add_to_param  # noqa: E402

add_to_param("h264-decoder",
             "H.264 decode path: own (default; C entropy+recon, lavc "
             "fallback out of envelope) | lavc | python")

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
    # own H.264 decoder first: the C entropy+recon stage decodes
    # in-envelope streams in real time and hands out-of-envelope sessions
    # to lavc itself (--param h264-decoder=lavc forces the old order)
    classes.insert(0, OwnH264Decompress)
    for out_codec in out_candidates:
        for cls in classes:
            if (in_codec, out_codec) in cls.SUPPORTS:
                return cls(), out_codec
    return None, None
