"""Local pipeline: capture -> convert -> display (the minimal end-to-end slice).

Mirrors the reference's thread-per-stage design (capture thread
src/main.cpp:347-397 feeding the display via queues) with the device-compute
stage as a single fused jit function — frames stay on the TPU between
conversion steps; only the display boundary fetches to host.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import jax
import numpy as np

from ultragrid_tpu.modules.messaging import Module
from ultragrid_tpu.modules.video_capture import VideoCapture, initialize_video_capture
from ultragrid_tpu.modules.video_display import VideoDisplay, initialize_video_display
from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, VideoFrame
from ultragrid_tpu.utils.log import Logger

log = Logger("pipeline")

_POISON = object()


class CaptureToDisplayPipeline:
    """capture thread -> [convert] -> display thread, bounded queue between."""

    def __init__(
        self,
        capture: VideoCapture,
        display: VideoDisplay,
        frame_limit: Optional[int] = None,
        capture_filter: str = "",
        postprocess: str = "",
    ):
        from ultragrid_tpu.modules.filters import FilterChain

        self.capture = capture
        self.display = display
        self.frame_limit = frame_limit
        self.capture_chain = FilterChain(capture_filter)
        self.postprocess_chain = FilterChain(postprocess)
        self.queue: "queue.Queue" = queue.Queue(maxsize=2)
        self.should_exit = threading.Event()
        self._decoder = None
        self._out_codec: Optional[Codec] = None
        self.frames_captured = 0

    def _setup_conversion(self, frame: VideoFrame) -> bool:
        codecs = self.display.get_property_codecs()
        dec, out = pixfmt.get_best_decoder_from(frame.desc.color_spec, codecs)
        if dec is None:
            log.error(
                f"no conversion from {frame.desc.color_spec.name} to display codecs"
            )
            return False
        self._decoder = dec
        self._out_codec = out
        out_desc = frame.desc.with_(color_spec=out)
        self.display.reconfigure(out_desc)
        log.info(f"decoder: {frame.desc.color_spec.name} -> {out.name}")
        return True

    def _capture_thread(self) -> None:
        try:
            while not self.should_exit.is_set():
                if self.frame_limit is not None and self.frames_captured >= self.frame_limit:
                    break
                frame, _audio = self.capture.grab()
                if frame is not None:
                    frame = self.capture_chain.apply(frame)
                if frame is None:
                    continue
                self.frames_captured += 1
                self.queue.put(frame)
        finally:
            self.queue.put(_POISON)

    def _display_loop(self) -> None:
        while True:
            item = self.queue.get()
            if item is _POISON:
                break
            result = self.postprocess_chain.apply(item)
            if result is None:
                continue
            # postprocess may fan one frame out into several (double_framerate)
            for frame in result if isinstance(result, list) else [result]:
                if self._decoder is None:
                    if not self._setup_conversion(frame):
                        self.should_exit.set()
                        break
                if self._out_codec != frame.desc.color_spec:
                    converted = pixfmt.convert_frame(
                        frame.data, frame.desc.width, frame.desc.color_spec, self._out_codec
                    )
                    out = VideoFrame(frame.desc.with_(color_spec=self._out_codec), [converted])
                    out.timestamp = frame.timestamp
                else:
                    out = frame
                self.display.put_frame(out)
        self.display.put_frame(None)

    def run(self) -> int:
        t = threading.Thread(target=self._capture_thread, name="capture", daemon=True)
        t.start()
        self._display_loop()
        self.should_exit.set()
        t.join(timeout=5)
        return self.frames_captured


def run_local_pipeline(
    capture_spec: str,
    display_spec: str,
    frame_limit: Optional[int] = None,
    capture_filter: str = "",
    postprocess: str = "",
) -> int:
    cap = initialize_video_capture(capture_spec)
    disp = initialize_video_display(display_spec)
    try:
        pipe = CaptureToDisplayPipeline(cap, disp, frame_limit, capture_filter, postprocess)
        return pipe.run()
    finally:
        disp.done()
        cap.done()
