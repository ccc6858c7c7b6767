"""Video compression modules + driver.

Mirrors the reference compress contract (ref: src/video_compress.h:115-236):
modules transform an uncompressed VideoFrame into a compressed one; the driver
(ref: src/video_compress.cpp) owns worker threading and runtime reconfiguration
via the message bus.

Built-ins: none (passthrough), uyvy (pixfmt downconvert "compression"),
dxt (DXT1/DXT5-YCoCg on device, the cuda_dxt/RTDXT equivalent),
jpeg (GPUJPEG-equivalent on device).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import numpy as np

from ultragrid_tpu.modules.messaging import (
    Message,
    MsgChangeCompress,
    Module,
    RESPONSE_INT_SERV_ERR,
    RESPONSE_OK,
    Response,
)
from ultragrid_tpu.modules.registry import LibraryClass, load_library, register_module
from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame, get_codec_from_name
from ultragrid_tpu.utils.log import Logger

log = Logger("compress")


class VideoCompress:
    def __init__(self, cfg: str):
        self.cfg = cfg

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        raise NotImplementedError

    def done(self) -> None:
        pass


class NoneCompress(VideoCompress):
    """Passthrough (ref: src/video_compress/none.cpp)."""

    def compress(self, frame: VideoFrame) -> VideoFrame:
        return frame


class UyvyCompress(VideoCompress):
    """Downconvert to UYVY via the conversion registry
    (ref: src/video_compress/uyvy.cpp)."""

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        if frame.desc.color_spec == Codec.UYVY:
            return frame
        dec = pixfmt.get_decoder_from_to(frame.desc.color_spec, Codec.UYVY)
        if dec is None:
            log.error(f"uyvy: cannot convert from {frame.desc.color_spec.name}")
            return None
        data = pixfmt.convert_frame(frame.data, frame.desc.width, frame.desc.color_spec, Codec.UYVY)
        out = VideoFrame(frame.desc.with_(color_spec=Codec.UYVY), [data])
        out.timestamp = frame.timestamp
        return out


class DxtCompress(VideoCompress):
    """DXT1 / DXT5-YCoCg block compression on device
    (ref: src/video_compress/cuda_dxt.cpp + cuda_dxt kernels).

    Config: ``dxt[:DXT1|DXT5]`` (default DXT1, "DXT6"/"DXT5" = DXT5-YCoCg).
    Accepts UYVY (with the reference's YUV->RGB pre-pass) or RGB input.
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        kind = (cfg or "DXT1").upper().strip(":")
        if kind in ("", "DXT1"):
            self.out_codec = Codec.DXT1
        elif kind in ("DXT5", "DXT6", "DXT5_YCOCG"):
            self.out_codec = Codec.DXT5
        else:
            raise ValueError(f"dxt: unknown variant {cfg!r}")

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        from ultragrid_tpu.ops import dxt as dxt_ops

        desc = frame.desc
        if desc.width % 4 or desc.height % 4:
            log.error("dxt: dimensions must be multiples of 4")
            return None
        src_codec = desc.color_spec
        if src_codec not in (Codec.UYVY, Codec.RGB, Codec.RGBA):
            # convert through the registry to RGB
            dec = pixfmt.get_decoder_from_to(src_codec, Codec.RGB)
            if dec is None:
                log.error(f"dxt: unsupported input {src_codec.name}")
                return None
            data = pixfmt.convert_frame(frame.data, desc.width, src_codec, Codec.RGB)
            src_codec = Codec.RGB
        else:
            data = frame.data
            if src_codec == Codec.RGBA:
                data = pixfmt.convert_frame(data, desc.width, Codec.RGBA, Codec.RGB)
                src_codec = Codec.RGB

        if self.out_codec == Codec.DXT1:
            if src_codec == Codec.UYVY:
                comp = dxt_ops.dxt1_encode_uyvy(data, desc.width)
            else:
                comp = dxt_ops.dxt1_encode_rgb(data, desc.width)
        else:
            if src_codec == Codec.UYVY:
                comp = dxt_ops.dxt5_ycocg_encode_uyvy(data, desc.width)
            else:
                comp = dxt_ops.dxt5_ycocg_encode_rgb(data, desc.width)

        out = VideoFrame(desc.with_(color_spec=self.out_codec), [comp])
        out.timestamp = frame.timestamp
        return out


class JpegCompress(VideoCompress):
    """GPUJPEG-equivalent JPEG encoder on device
    (ref: src/video_compress/gpujpeg.cpp).

    Config: ``jpeg[:quality][:restart_interval][:subsampling][:rate=<bps>]``
    (quality default 80; subsampling 422 for YCbCr inputs, 444 for RGB, or
    420 — same option set as gpujpeg.cpp:279-353).  ``rate=`` (or a fixed
    ``-l`` on the sender) turns on closed-loop rate control: the quality
    ladder is driven by the measured frame sizes (see utils/ratectl.py —
    the role the reference reaches only via libavcodec's rate control,
    src/video_compress/libavcodec.cpp:943-1003).
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        parts = [p for p in cfg.split(":") if p]
        kv = {k: v for k, _, v in
              (p.partition("=") for p in parts if "=" in p)}
        parts = [p for p in parts if "=" not in p]
        self.quality = int(parts[0]) if parts else 80
        self.restart_interval = int(parts[1]) if len(parts) > 1 else None
        if not self.restart_interval:
            self.restart_interval = None  # 0 = auto (we always use restarts)
        self.subsampling = parts[2] if len(parts) > 2 else None
        self._encoders: dict = {}   # quality -> JpegEncoder (per jit graph)
        self._desc: Optional[VideoDesc] = None
        self._rate_bps = 0
        self._rc = None
        if "rate" in kv:
            from ultragrid_tpu.utils.ratectl import parse_rate

            self._rate_bps = parse_rate(kv["rate"])

    def set_target_bitrate(self, bps: int) -> None:
        """Sender hook for a fixed ``-l`` rate; explicit ``rate=`` wins."""
        if not self._rate_bps:
            self._rate_bps = int(bps)
            self._rc = None  # rebuild against the new target

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        from ultragrid_tpu.ops.jpeg import JpegEncoder

        desc = frame.desc
        if self._desc != desc:
            self._encoders.clear()
            self._desc = desc
            if self._rate_bps:
                from ultragrid_tpu.utils.ratectl import jpeg_controller

                self._rc = jpeg_controller(self._rate_bps, desc.fps or 30.0,
                                           self.quality)
        q = self._rc.value if self._rc is not None else self.quality
        enc = self._encoders.get(q)
        if enc is None:
            enc = self._encoders[q] = JpegEncoder(
                desc.width,
                desc.height,
                in_codec=desc.color_spec,
                quality=q,
                restart_interval=self.restart_interval,
                subsampling=self.subsampling,
            )
        data = enc.encode(frame.data)
        if self._rc is not None:
            self._rc.update(int(np.asarray(data).size))
        out = VideoFrame(desc.with_(color_spec=Codec.JPEG), [data])
        out.timestamp = frame.timestamp
        return out




class H264Compress(VideoCompress):
    """This framework's OWN H.264 intra encoder (no FFmpeg; see ops/h264.py).

    ``h264[:qp=<0-51>][:mode=i16|i4|pcm|inter][:gop=N][:search=N]`` —
    Annex-B access units decodable by any AVC decoder, carried by the RFC
    6184 packetizer.  ``mode=pcm`` is lossless I_PCM; ``mode=inter`` runs
    the IDR+P GOP encoder (P_Skip / P_L0_16x16 integer-pel motion,
    exact-reconstruction loop — the inter-frame role the reference fills
    via libavcodec).  ``entropy=cabac`` re-encodes each AU's entropy
    layer with CABAC on the host (~10% smaller streams; C transcoder in
    native/h264_entropy.c, sample-exact and lavc-conformant).  For live
    libx264-class rates use ``libavcodec:codec=H.264`` (reference role:
    src/video_compress/libavcodec.cpp).
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        self.qp = 26
        self.mode = "i16"
        self.accel = "host"
        self.gop = 30
        self.search = 8
        self.deblock = False
        self.entropy = "cavlc"
        self.subpel = "half"
        self._rate_bps = 0
        for tok in [t for t in cfg.split(":") if t]:
            key, _, val = tok.partition("=")
            if key == "qp":
                self.qp = max(0, min(51, int(val)))
            elif key == "mode":
                self.mode = val
            elif key == "gop":
                self.gop = max(1, int(val))
            elif key == "search":
                self.search = max(0, int(val))
            elif key == "accel":
                self.accel = val  # host | device (device jit-compiles once)
            elif key == "deblock":
                # signal the in-loop filter (idc=0): intra modes only --
                # P references must match decoder-side filtered pictures
                self.deblock = val not in ("0", "off", "")
            elif key == "entropy":
                if val not in ("cavlc", "cabac"):
                    log.error(f"h264: unknown entropy {val!r}")
                else:
                    self.entropy = val
            elif key == "subpel":
                if val not in ("half", "quarter"):
                    log.error(f"h264: unknown subpel {val!r}")
                else:
                    self.subpel = val
            elif key == "rate":
                from ultragrid_tpu.utils.ratectl import parse_rate

                self._rate_bps = parse_rate(val)
            elif key == "help":
                print("h264 (own encoder): h264[:qp=<0-51>]"
                      "[:mode=i16|i4|pcm|inter][:gop=N][:search=N]"
                      "[:accel=host|device][:deblock=1 (intra host modes)]"
                      "[:entropy=cavlc|cabac]"
                      "[:rate=<bps> (closed-loop QP adaptation)]")
        self._enc = None
        self._geom = None
        self._rc = None
        self._transcoder = None

    def set_target_bitrate(self, bps: int) -> None:
        """Sender hook for a fixed ``-l`` rate; explicit ``rate=`` wins."""
        if not self._rate_bps:
            self._rate_bps = int(bps)
            self._rc = None

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        import numpy as np

        from ultragrid_tpu.ops import h264 as h264_ops

        desc = frame.desc
        src_codec = desc.color_spec
        data = frame.data
        if src_codec != Codec.UYVY:
            dec = pixfmt.get_decoder_from_to(src_codec, Codec.UYVY)
            if dec is None:
                log.error(f"h264: unsupported input {src_codec.name}")
                return None
            data = pixfmt.convert_frame(data, desc.width, src_codec, Codec.UYVY)
        deblock = self.deblock and self.mode in ("i16", "i4") \
            and self.accel != "device"
        if self.deblock and not deblock:
            log.warning("h264: deblock=1 only on intra host paths; ignored")
        if self._rate_bps and self._rc is None and self.mode != "pcm":
            from ultragrid_tpu.utils.ratectl import (GopRateController,
                                                     h264_intra_controller)

            fps = desc.fps or 30.0
            if self.mode == "inter":
                self._rc = GopRateController(self._rate_bps, fps, self.gop,
                                             self.qp)
            else:
                self._rc = h264_intra_controller(self._rate_bps, fps, self.qp)
            self._rc_pos = 0
        geom = (desc.width, desc.height, self.qp, self.mode, self.accel,
                deblock)
        if self._geom != geom:
            if self.mode == "pcm":
                self._enc = h264_ops.PcmEncoder(desc.width, desc.height)
            elif self.mode == "inter":
                if self.accel == "device":
                    from ultragrid_tpu.ops.h264_tpu import InterEncoderTpu

                    self._enc = InterEncoderTpu(
                        desc.width, desc.height, qp=self.qp, gop=self.gop,
                        search=self.search, subpel=self.subpel)
                else:
                    if self.subpel == "quarter":
                        log.warning("h264: subpel=quarter needs "
                                    "accel=device; using half-pel")
                    cls = (h264_ops.InterEncoder if self.accel == "scalar"
                           else h264_ops.InterEncoderV)
                    self._enc = cls(desc.width, desc.height, qp=self.qp,
                                    gop=self.gop, search=self.search)
            elif self.mode == "i4":
                # per-4x4 directional prediction: better compression, host path
                self._enc = h264_ops.Intra4x4Encoder(
                    desc.width, desc.height, qp=self.qp, deblock=deblock)
            elif self.accel == "device":
                from ultragrid_tpu.ops.h264_tpu import Intra16EncoderTpu

                self._enc = Intra16EncoderTpu(desc.width, desc.height, qp=self.qp)
            else:
                self._enc = h264_ops.Intra16EncoderV(
                    desc.width, desc.height, qp=self.qp, deblock=deblock)
            self._geom = geom
        bs = self._enc.encode_uyvy(np.asarray(data))
        if self.entropy == "cabac":
            if self.mode == "pcm":
                log.warning("h264: entropy=cabac unsupported for I_PCM; "
                            "keeping CAVLC")
                self.entropy = "cavlc"
            else:
                from ultragrid_tpu.ops.h264_transcode import Transcoder

                if self._transcoder is None:
                    try:
                        self._transcoder = Transcoder()
                    except Exception as e:  # noqa: BLE001
                        log.warning(f"h264: CABAC transcoder unavailable "
                                    f"({e}); keeping CAVLC")
                        self.entropy = "cavlc"
                if self._transcoder is not None:
                    bs = self._transcoder.transcode_au(bytes(bs))
        if self._rc is not None:
            nbytes = len(bytes(bs)) if not isinstance(bs, (bytes, bytearray)) \
                else len(bs)
            if self.mode == "inter":
                self._rc_pos += 1
                gop_done = self._rc_pos % self.gop == 0
                nqp = self._rc.frame(nbytes, gop_done)
            else:
                nqp = self._rc.update(nbytes)
            if nqp != self.qp:
                # next build (at the next frame for intra; the next GOP
                # opens with an IDR for inter, so the reference chain is
                # never broken by the swap)
                self.qp = nqp
                self._geom = None
        out_desc = VideoDesc(desc.width, desc.height, Codec.H264, desc.fps,
                             desc.interlacing, desc.tile_count)
        out = VideoFrame(out_desc, [np.frombuffer(bytes(bs), np.uint8)],
                         timestamp=frame.timestamp)
        out.callbacks.update(frame.callbacks)
        if self.mode == "inter":
            # P frames depend on the previous picture; receivers use this
            # to gate display on intact references (ref: interframe flag)
            out.callbacks["frame_type"] = (
                "I" if getattr(self._enc, "_frame_idx", 1) % self.gop == 1
                or self.gop == 1 else "P")
        return out


class JpegXsCompress(VideoCompress):
    """JPEG XS-architecture wavelet compression (ref role:
    src/video_compress/jpegxs.cpp wrapping SVT-JPEG-XS; here a from-scratch
    TPU 5/3-DWT codec, see ops/jpegxs.py for the conformance statement).

    Config: ``jpegxs[:quality]`` (default 90; 100 = lossless).
    Accepts UYVY directly (4:2:2 planes); other codecs convert to UYVY.
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        self.quality = int(cfg) if cfg else 90
        from ultragrid_tpu.ops.jpegxs import JpegXsCodec

        self.codec = JpegXsCodec(nlx=3, nly=1, quality=self.quality)

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        import numpy as np

        desc = frame.desc
        if desc.color_spec != Codec.UYVY:
            dec = pixfmt.get_decoder_from_to(desc.color_spec, Codec.UYVY)
            if dec is None:
                log.error(f"jpegxs: cannot convert from {desc.color_spec.name}")
                return None
            data = pixfmt.convert_frame(frame.data, desc.width, desc.color_spec, Codec.UYVY)
            frame = VideoFrame(desc.with_(color_spec=Codec.UYVY), [data])
        a = np.asarray(frame.data, np.uint8)[:, : 2 * desc.width]
        y = a[:, 1::2].astype(np.int32)
        cb = a[:, 0::4].astype(np.int32)
        cr = a[:, 2::4].astype(np.int32)
        stream = self.codec.encode_planes([y, cb, cr])
        out = VideoFrame(
            desc.with_(color_spec=Codec.JPEG_XS),
            [np.frombuffer(stream, np.uint8)],
        )
        out.timestamp = frame.timestamp
        return out


class CineformCompress(VideoCompress):
    """CineForm wavelet compression (ref role:
    src/video_compress/cineform.cpp wrapping the CineForm SDK).

    Emits REAL CFHD sample streams (ops/cfhd_bitstream.py — the wire
    format libavcodec's `cfhd` decoder reads, conformance-gated in
    tests/test_cfhd_bitstream.py) whenever the geometry allows
    (width % 16 == 0, height % 8 == 0) and quality < 100.  quality=100
    (true lossless — outside CFHD's vocabulary: the 0x2000 prescale
    drops 2 bits) and incompatible geometry use the documented own
    container (UCF1, ops/cineform.py) instead; both decode through the
    ``cineform`` decompress module.

    Config: ``cineform[:quality]`` (default 90; 100 = lossless UCF1).
    Accepts UYVY directly (4:2:2 planes); other codecs convert to UYVY.
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        self.quality = int(cfg) if cfg else 90
        from ultragrid_tpu.ops.cineform import CineformCodec

        self.codec = CineformCodec(levels=3, quality=self.quality)
        self._cfhd = None  # (w, h) -> CfhdEncoder, built lazily

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        import numpy as np

        desc = frame.desc
        if desc.color_spec != Codec.UYVY:
            dec = pixfmt.get_decoder_from_to(desc.color_spec, Codec.UYVY)
            if dec is None:
                log.error(f"cineform: cannot convert from {desc.color_spec.name}")
                return None
            data = pixfmt.convert_frame(frame.data, desc.width, desc.color_spec, Codec.UYVY)
            frame = VideoFrame(desc.with_(color_spec=Codec.UYVY), [data])
        a = np.asarray(frame.data, np.uint8)[:, : 2 * desc.width]
        if self.quality < 100 and desc.width % 16 == 0 and desc.height % 8 == 0:
            from ultragrid_tpu.ops.cfhd_bitstream import CfhdEncoder

            if self._cfhd is None or (self._cfhd.width, self._cfhd.height) != (
                desc.width, desc.height):
                self._cfhd = CfhdEncoder(desc.width, desc.height,
                                         quality=self.quality)
            stream = self._cfhd.encode_uyvy(a)
        else:
            y = a[:, 1::2].astype(np.int32)
            cb = a[:, 0::4].astype(np.int32)
            cr = a[:, 2::4].astype(np.int32)
            stream = self.codec.encode_planes([y, cb, cr])
        out = VideoFrame(
            desc.with_(color_spec=Codec.CFHD),
            [np.frombuffer(stream, np.uint8)],
        )
        out.timestamp = frame.timestamp
        return out


class J2kCompress(VideoCompress):
    """Own JPEG 2000 encoder (ref role: src/video_compress/cmpto_j2k.cpp —
    proprietary Comprimato SDK wrapper; here a from-scratch T.800
    implementation, OpenJPEG-conformance-tested — see ops/j2k.py).

    Config: ``cmpto_j2k[:quality]`` / ``j2k[:quality]`` (default 100 =
    mathematically lossless RCT+5/3).  RGB encodes directly; other codecs
    convert to RGB first (the reference SDK likewise takes RGB).
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        self.quality = int(cfg) if cfg else 100
        from ultragrid_tpu.ops.j2k import J2KEncoder

        self.enc = J2KEncoder(levels=5, quality=self.quality, mct=True)

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        desc = frame.desc
        if desc.color_spec != Codec.RGB:
            dec = pixfmt.get_decoder_from_to(desc.color_spec, Codec.RGB)
            if dec is None:
                log.error(f"j2k: cannot convert from {desc.color_spec.name}")
                return None
            data = pixfmt.convert_frame(frame.data, desc.width, desc.color_spec, Codec.RGB)
            frame = VideoFrame(desc.with_(color_spec=Codec.RGB), [data])
        rgb = np.asarray(frame.data, np.uint8)[:, : 3 * desc.width].reshape(
            desc.height, desc.width, 3
        )
        comps = [rgb[:, :, i] for i in range(3)]
        stream = self.enc.encode(comps)
        out = VideoFrame(
            desc.with_(color_spec=Codec.J2KR),
            [np.frombuffer(stream, np.uint8)],
        )
        out.timestamp = frame.timestamp
        return out


class ApvCompress(VideoCompress):
    """APV-architecture compression (ref role: src/video_compress/openapv.cpp
    wrapping liboapv — ISO/IEC 23090-33; here a from-scratch tile/DCT/Rice
    codec, see ops/apv.py for the conformance statement).

    Config: ``openapv[:qp=N][:tile_w=N][:tile_h=N]`` or ``openapv:N`` (qp,
    default 18; 0 = near-lossless).  Accepts UYVY directly (coded as
    10-bit 4:2:2 like the reference's OAPV_CS_YCBCR422_10LE default);
    other codecs convert to UYVY.
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        qp, tw, th = 18, 1920, 1080
        for tok in filter(None, cfg.split(":")):
            if tok.isdigit():
                qp = int(tok)
            elif tok.startswith("qp="):
                qp = int(tok[3:])
            elif tok.startswith("tile_w="):
                tw = int(tok[7:])
            elif tok.startswith("tile_h="):
                th = int(tok[7:])
        from ultragrid_tpu.ops.apv import ApvCodec

        self.codec = ApvCodec(qp=qp, bit_depth=10, tile_w=tw, tile_h=th)

    def compress(self, frame: VideoFrame) -> Optional[VideoFrame]:
        desc = frame.desc
        if desc.color_spec != Codec.UYVY:
            dec = pixfmt.get_decoder_from_to(desc.color_spec, Codec.UYVY)
            if dec is None:
                log.error(f"openapv: cannot convert from {desc.color_spec.name}")
                return None
            data = pixfmt.convert_frame(frame.data, desc.width, desc.color_spec, Codec.UYVY)
            frame = VideoFrame(desc.with_(color_spec=Codec.UYVY), [data])
        a = np.asarray(frame.data, np.uint8)[:, : 2 * desc.width]
        y = a[:, 1::2].astype(np.int32) << 2  # 8 -> 10 bit
        cb = a[:, 0::4].astype(np.int32) << 2
        cr = a[:, 2::4].astype(np.int32) << 2
        stream = self.codec.encode_planes([y, cb, cr])
        out = VideoFrame(
            desc.with_(color_spec=Codec.APV),
            [np.frombuffer(stream, np.uint8)],
        )
        out.timestamp = frame.timestamp
        return out


register_module("none", LibraryClass.VIDEO_COMPRESS, NoneCompress)
register_module("cmpto_j2k", LibraryClass.VIDEO_COMPRESS, J2kCompress)
register_module("j2k", LibraryClass.VIDEO_COMPRESS, J2kCompress)
register_module("openapv", LibraryClass.VIDEO_COMPRESS, ApvCompress)
register_module("apv", LibraryClass.VIDEO_COMPRESS, ApvCompress)  # alias
register_module("jpegxs", LibraryClass.VIDEO_COMPRESS, JpegXsCompress)
register_module("cineform", LibraryClass.VIDEO_COMPRESS, CineformCompress)
register_module("h264", LibraryClass.VIDEO_COMPRESS, H264Compress)
register_module("uyvy", LibraryClass.VIDEO_COMPRESS, UyvyCompress)
register_module("dxt", LibraryClass.VIDEO_COMPRESS, DxtCompress)
register_module("cuda_dxt", LibraryClass.VIDEO_COMPRESS, DxtCompress)  # alias
register_module("jpeg", LibraryClass.VIDEO_COMPRESS, JpegCompress)
register_module("gpujpeg", LibraryClass.VIDEO_COMPRESS, JpegCompress)  # alias


def compress_init(spec: str) -> VideoCompress:
    """ref: compress_init, src/video_compress.cpp:212."""
    name, _, cfg = spec.partition(":")
    cls = load_library(name, LibraryClass.VIDEO_COMPRESS)
    if cls is None:
        # control-socket commands use the reference's capitalized module
        # names ("compress JPEG:60"); registry keys are lowercase
        cls = load_library(name.lower(), LibraryClass.VIDEO_COMPRESS)
    if cls is None:
        raise ValueError(f"unknown compression {name!r}")
    return cls(cfg)


class CompressDriver:
    """Worker-thread compress stage with runtime reconfig
    (ref: compress driver, src/video_compress.cpp:79-209).

    Push frames with :meth:`enqueue`; pop results with :meth:`pop`.
    A ``MsgChangeCompress`` on the module swaps in a new codec without
    dropping frames (new state built off-thread, then atomically swapped).
    """

    def __init__(self, spec: str, parent: Optional[Module] = None):
        self.module = Module("compress", parent)
        self.module.msg_callback = self._on_message
        self._impl = compress_init(spec)
        self._lock = threading.Lock()
        self.in_queue: "queue.Queue" = queue.Queue(maxsize=2)
        self.out_queue: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, name="compress", daemon=True)
        self._thread.start()

    def _on_message(self, msg: Message) -> Response:
        if isinstance(msg, (MsgChangeCompress,)):
            try:
                new_impl = compress_init(msg.config)
            except Exception as e:  # noqa: BLE001
                return Response(RESPONSE_INT_SERV_ERR, str(e))
            with self._lock:
                old, self._impl = self._impl, new_impl
            old.done()
            log.notice(f"compression changed to {msg.config}")
            return Response(RESPONSE_OK)
        return Response(RESPONSE_INT_SERV_ERR, "unsupported message")

    def _worker(self) -> None:
        while True:
            frame = self.in_queue.get()
            if frame is None:
                self.out_queue.put(None)
                return
            frame.compress_start = time.monotonic()
            from ultragrid_tpu.utils import profiler

            with self._lock:
                impl = self._impl
            try:
                out = self._compress_one(impl, frame, profiler)
            except Exception as e:  # noqa: BLE001 - a codec failure must
                # drop the frame, not kill the compress thread (and with it
                # the whole sender pipeline)
                log.error(f"compress: dropping frame: {e}")
                continue
            if out is not None:
                out.compress_start = frame.compress_start
                out.compress_end = time.monotonic()
                self.out_queue.put(out)

    def _compress_one(self, impl, frame, profiler):
        if len(frame.tiles) > 1:
            # per-tile fan-out (ref: sync tile API fanned out via
            # task_run_async, src/video_compress.cpp:79-120)
            outs = []
            for t in frame.tiles:
                sub = VideoFrame(frame.desc.with_(tile_count=1), [t])
                sub.timestamp = frame.timestamp
                res = impl.compress(sub)
                if res is None:
                    return None
                outs.append(res)
            out = VideoFrame(outs[0].desc.with_(tile_count=len(outs)),
                             [o.data for o in outs])
            out.timestamp = frame.timestamp
            return out
        with profiler.zone("compress"):
            return impl.compress(frame)

    def enqueue(self, frame: Optional[VideoFrame]) -> None:
        self.in_queue.put(frame)

    def pop(self, timeout: Optional[float] = None) -> Optional[VideoFrame]:
        return self.out_queue.get(timeout=timeout)

    def stop(self) -> None:
        self.in_queue.put(None)
        self._thread.join(timeout=5)
        self._impl.done()
