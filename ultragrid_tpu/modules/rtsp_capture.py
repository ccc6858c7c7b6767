"""RTSP receive-client capture module.

Parity with the reference's ``-t rtsp`` capture (ref:
src/video_capture/rtsp.c — RTSP client + RTP depacketization feeding the
pipeline as a capture device).  Config grammar mirrors the reference:

    -t rtsp:rtsp://host[:port]/path[:decompress=uyvy|rgb|no]

The client DESCRIBEs the session, SETUPs the first video media on a local
UDP port pair, PLAYs, and depacketizes RTP into frames: RFC 2435 JPEG
(PT 26) and RFC 6184 H.264 are supported — the same payloads our sender
emits in standards mode, so the module is e2e-testable against our own
RtspServer.  Frames are decoded to raw pixels by default (JPEG via the
split device decoder, H.264 via libavcodec) so downstream filters/compress
work unchanged; ``decompress=no`` passes the compressed frames through.
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from typing import Optional, Tuple

import numpy as np

from ultragrid_tpu.modules.registry import LibraryClass, register_module
from ultragrid_tpu.modules.video_capture import VideoCapture
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.log import Logger

log = Logger("vidcap.rtsp")


def _bind_even_udp() -> Tuple[socket.socket, int]:
    """Bind a UDP socket on an even ephemeral port (RTP convention)."""
    for _ in range(64):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("", 0))
        port = s.getsockname()[1]
        if port % 2 == 0:
            return s, port
        even = port - 1 if port % 2 else port
        s2 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s2.bind(("", even))
            s.close()
            return s2, even
        except OSError:
            s2.close()
            s.close()
    raise OSError("could not bind an even RTP port")


class RtspCapture(VideoCapture):
    """RTSP client capture device (video track)."""

    def __init__(self, cfg: str):
        super().__init__(cfg)
        url = None
        self.decompress = "uyvy"
        toks = [t for t in cfg.split(":") if t]
        url_parts = []
        for tok in toks:
            if "=" in tok and not tok.startswith("//"):
                k, _, v = tok.partition("=")
                if k == "decompress":
                    self.decompress = v.lower()
                    continue
            url_parts.append(tok)
        if url_parts:
            url = ":".join(url_parts)
        if not url or not url.startswith("rtsp://"):
            raise ValueError(
                "usage: rtsp:rtsp://host[:port]/path[:decompress=uyvy|rgb|no]"
            )

        from ultragrid_tpu.net.rtsp_client import RtspClient

        self.client = RtspClient(url)
        medias = self.client.describe()
        video = next((m for m in medias if m.kind == "video"), None)
        if video is None:
            raise ValueError(f"no video media in RTSP session {url}")
        self.media = video
        self.sock, self.rtp_port = _bind_even_udp()
        self.sock.settimeout(0.25)
        self.client.setup(video, self.rtp_port)
        self.client.play()
        log.notice(
            f"playing {url}: {video.encoding} PT {video.payload_type} "
            f"-> local RTP port {self.rtp_port}"
        )

        if video.encoding == "JPEG":
            from ultragrid_tpu.net.rtpdec_jpeg import JpegDepacketizer

            self._depack = JpegDepacketizer()
            self._codec = Codec.JPEG
        elif video.encoding in ("H264", "H.264"):
            from ultragrid_tpu.net.rtpdec_h264 import H264Depacketizer

            self._depack = H264Depacketizer()
            self._codec = Codec.H264
            props = self.media.fmtp.get("sprop-parameter-sets", "")
            if props:
                import base64

                from ultragrid_tpu.net.rtpdec_h264 import NAL_PPS, NAL_SPS, nal_type

                for b64 in props.split(","):
                    try:
                        nal = base64.b64decode(b64 + "=" * (-len(b64) % 4))
                    except Exception:
                        continue
                    if nal and nal_type(nal[0]) == NAL_SPS:
                        self._depack.sps = nal
                    elif nal and nal_type(nal[0]) == NAL_PPS:
                        self._depack.pps = nal
        else:
            raise ValueError(f"unsupported RTSP video encoding {video.encoding!r}")

        self._decomp = None
        self._frames: "queue.Queue[VideoFrame]" = queue.Queue(maxsize=4)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._rx_loop, name="rtsp-rx", daemon=True)
        self._thread.start()

    # -- RTP receive ------------------------------------------------------

    def _rx_loop(self) -> None:
        while not self._stop.is_set():
            try:
                data, _ = self.sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                return
            if len(data) < 12 or (data[0] >> 6) != 2:
                continue
            pt = data[1] & 0x7F
            marker = bool(data[1] & 0x80)
            cc = data[0] & 0xF
            off = 12 + 4 * cc
            if data[0] & 0x10:  # extension
                if len(data) < off + 4:
                    continue
                ext_len = int.from_bytes(data[off + 2 : off + 4], "big")
                off += 4 + 4 * ext_len
            if pt != self.media.payload_type or len(data) <= off:
                continue
            out = self._depack.feed(data[off:], marker)
            if out is None:
                continue
            frame = self._to_frame(bytes(out))
            if frame is None:
                continue
            try:
                self._frames.put_nowait(frame)
            except queue.Full:  # drop oldest: live source, latest wins
                try:
                    self._frames.get_nowait()
                    self._frames.put_nowait(frame)
                except queue.Empty:
                    pass

    def _to_frame(self, payload: bytes) -> Optional[VideoFrame]:
        data = np.frombuffer(payload, dtype=np.uint8)
        if self._codec == Codec.JPEG:
            # dimensions ride in the JPEG headers; depacketizer rebuilt them
            from ultragrid_tpu.ops.jpeg import _parse_headers

            try:
                hdr = _parse_headers(payload)
                w, h = hdr["w"], hdr["h"]
            except Exception:
                return None
        else:
            w = h = 0  # parsed by the decoder below
        desc = VideoDesc(width=w, height=h, color_spec=self._codec, fps=30.0)
        frame = VideoFrame(desc, [data], timestamp=time.time())
        if self.decompress in ("no", "none"):
            return frame
        out_codec = Codec.RGB if self.decompress == "rgb" else Codec.UYVY
        if self._decomp is None:
            from ultragrid_tpu.modules.video_decompress import decompress_init

            picked = decompress_init(self._codec, [out_codec])
            if picked is None:
                log.error(f"no decompressor for {self._codec.name}")
                self.decompress = "no"
                return frame
            self._decomp, out_codec = picked
        try:
            return self._decomp.decompress(frame, out_codec)
        except Exception as exc:  # corrupted stream data must not kill rx
            log.warning(f"decode failed: {exc}")
            return None

    # -- capture API ------------------------------------------------------

    def grab(self):
        try:
            return self._frames.get(timeout=0.5), None
        except queue.Empty:
            return None, None

    def done(self) -> None:
        self._stop.set()
        try:
            self.client.teardown()
        except Exception:
            pass
        try:
            self.sock.close()
        except OSError:
            pass
        self._thread.join(timeout=2.0)


register_module("rtsp", LibraryClass.VIDEO_CAPTURE, RtspCapture)
