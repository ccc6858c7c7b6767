"""MPEG-TS rxtx: H.264 inside an MPEG transport stream over UDP
(ref: src/rxtx/mpegts.c — the reference drives libavformat's mpegts muxer
the same way; any TS receiver — VLC, ffplay, a set-top box — can play the
output).

Sender: capture -> H.264 (libavcodec) -> mpegts mux -> udp://host:port.
Receiver: libavformat demux+decode from udp://@:port -> display (reuses the
lavf path of the file capture device).
"""

from __future__ import annotations

import ctypes
import threading
import time
from typing import Optional

import numpy as np

from ultragrid_tpu.modules.video_capture import initialize_video_capture
from ultragrid_tpu.modules.video_display import initialize_video_display
from ultragrid_tpu.native import lavc_shim_lib
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.log import Logger

log = Logger("mpegts")


class MpegTsSender:
    def __init__(
        self,
        capture_spec: str,
        host: str,
        port: int = 5004,
        bitrate: str = "8M",
        frame_limit: Optional[int] = None,
        capture_filter: str = "",
    ):
        from ultragrid_tpu.modules.filters import FilterChain
        from ultragrid_tpu.modules.lavc import LavcCompress

        self.lib = lavc_shim_lib()
        if self.lib is None:
            raise ValueError("mpegts needs libavformat")
        self.capture = initialize_video_capture(capture_spec)
        self.capture_chain = FilterChain(capture_filter)
        self.enc = LavcCompress(f"codec=H.264:bitrate={bitrate}")
        self.url = f"udp://{host}:{port}?pkt_size=1316"
        self.frame_limit = frame_limit
        self._mux = None
        self.frames_sent = 0

    def run(self) -> int:
        count = 0
        while self.frame_limit is None or count < self.frame_limit:
            frame, _a = self.capture.grab()
            if frame is not None:
                frame = self.capture_chain.apply(frame)
            if frame is None:
                continue
            out = self.enc.compress(frame)
            if out is None:
                continue
            data = np.ascontiguousarray(np.asarray(out.data).reshape(-1))
            if self._mux is None:
                d = frame.desc
                self._mux = self.lib.lavf_mux_open(
                    self.url.encode(), 0, d.width, d.height, int(d.fps) or 30,
                    None, 0,
                )
                if not self._mux:
                    raise RuntimeError(f"cannot open {self.url}")
                log.notice(f"mpegts: muxing H.264 to {self.url}")
            self.lib.lavf_mux_write(
                self._mux, data.ctypes.data, data.size,
                1 if out.callbacks.get("keyframe") else 0,
            )
            count += 1
            self.frames_sent += 1
        if self._mux:
            self.lib.lavf_mux_close(self._mux)
            self._mux = None
        self.capture.done()
        self.enc.done()
        return self.frames_sent


class MpegTsReceiver:
    def __init__(
        self,
        display_spec: str,
        port: int = 5004,
        frame_limit: Optional[int] = None,
        timeout: float = 30.0,
    ):
        self.lib = lavc_shim_lib()
        if self.lib is None:
            raise ValueError("mpegts needs libavformat")
        self.display = initialize_video_display(display_spec)
        self.url = f"udp://0.0.0.0:{port}?timeout={int(timeout * 1e6)}"
        self.frame_limit = frame_limit
        self.timeout = timeout
        self.frames_displayed = 0

    def run(self) -> int:
        h = self.lib.lavf_open(self.url.encode())
        if not h:
            log.error(f"mpegts: cannot open {self.url}")
            return 0
        w = ctypes.c_int()
        hh = ctypes.c_int()
        fps = ctypes.c_double()
        self.lib.lavf_info(h, ctypes.byref(w), ctypes.byref(hh), ctypes.byref(fps))
        desc = VideoDesc(w.value, hh.value, Codec.UYVY, fps.value or 30.0)
        self.display.reconfigure(desc)
        buf = np.empty(w.value * hh.value * 2, np.uint8)
        start = time.monotonic()
        while self.frame_limit is None or self.frames_displayed < self.frame_limit:
            if time.monotonic() - start > self.timeout:
                break
            n = self.lib.lavf_read_frame(h, 0, buf.ctypes.data, buf.size)
            if n <= 0:
                break
            frame = VideoFrame(desc, [buf[:n].reshape(hh.value, w.value * 2).copy()])
            self.display.put_frame(frame)
            self.frames_displayed += 1
        self.lib.lavf_close(h)
        self.display.put_frame(None)
        return self.frames_displayed
