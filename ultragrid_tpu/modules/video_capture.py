"""Video capture module API + built-in devices.

Mirrors the reference's vidcap contract (ref: struct video_capture_info,
src/video_capture.h:121-145): ``init(cfg) -> state``, ``grab() ->
(VideoFrame | None, AudioFrame | None)``, ``done()``.  Config strings use the
reference's colon/key=value grammar (``testcard:1920:1080:24:UYVY`` or
``testcard:s=1920x1080:f=60:c=UYVY:pattern=bars``).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from ultragrid_tpu.modules.registry import LibraryClass, register_module
from ultragrid_tpu.types import Codec, InterlacingType, VideoDesc, VideoFrame, get_codec_from_name
from ultragrid_tpu.utils.log import Logger
from ultragrid_tpu.utils.pattern import generate_pattern

log = Logger("vidcap")

VIDCAP_INIT_OK = 0
VIDCAP_INIT_FAIL = 1
VIDCAP_INIT_NOERR = 2  # help shown


class VideoCapture:
    """Base class for capture devices."""

    def __init__(self, cfg: str):
        self.cfg = cfg

    def grab(self) -> Tuple[Optional[VideoFrame], Optional[object]]:
        raise NotImplementedError

    def done(self) -> None:
        pass


class TestcardCapture(VideoCapture):
    """Synthetic pattern generator (ref: src/video_capture/testcard.c).

    Defaults mirror the reference: 1920x1080 UYVY 24 fps "bars"
    (ref: DEFAULT_FORMAT, testcard.c:101-102).
    """

    def __init__(self, cfg: str):
        super().__init__(cfg)
        width, height, fps, codec = 1920, 1080, 24.0, Codec.UYVY
        pattern = "bars"
        still = False
        positional = []
        for tok in [t for t in cfg.split(":") if t]:
            if "=" in tok:
                key, _, val = tok.partition("=")
                if key in ("s", "size"):
                    w, _, h = val.partition("x")
                    width, height = int(w), int(h)
                elif key in ("f", "fps"):
                    fps = float(val.rstrip("ip"))
                elif key in ("c", "codec"):
                    codec = get_codec_from_name(val)
                elif key in ("p", "pattern"):
                    pattern = val
                elif key == "still":
                    still = True
                else:
                    log.warning(f"testcard: unknown option {key}")
            else:
                positional.append(tok)
        # legacy positional grammar: width:height:fps:codec
        if len(positional) >= 2 and positional[0].isdigit():
            width, height = int(positional[0]), int(positional[1])
            if len(positional) >= 3:
                fps = float(positional[2])
            if len(positional) >= 4:
                codec = get_codec_from_name(positional[3])
        if codec == Codec.NONE:
            raise ValueError("testcard: unknown codec")
        self.desc = VideoDesc(width, height, codec, fps, InterlacingType.PROGRESSIVE, 1)
        self.still = still
        base = generate_pattern(width, height, codec, pattern)
        # pre-roll a few phase-shifted variants so motion is visible
        if still:
            frames = [base]
        else:
            frames = [np.roll(base, shift=i * 16, axis=0) for i in range(8)]
        # keep the ring on-device: downstream conversion/compress stages then
        # run entirely in HBM (the pattern is the reference's testcard
        # prerendered ring, but device-resident instead of malloc'd)
        import jax

        self.frames = [jax.device_put(f) for f in frames]
        self.count = 0
        self.start_time: Optional[float] = None
        log.notice(f"capturing {self.desc}, pattern {pattern}")

    def grab(self):
        # fps pacing (ref: testcard waits until next frame time)
        now = time.monotonic()
        if self.start_time is None:
            self.start_time = now
        next_deadline = self.start_time + self.count / self.desc.fps
        if now < next_deadline:
            time.sleep(next_deadline - now)
        frame = VideoFrame(self.desc, [self.frames[self.count % len(self.frames)]])
        frame.timestamp = time.monotonic()
        self.count += 1
        return frame, None


class NoiseCapture(VideoCapture):
    """Random-noise source for stress/benchmarks (testcard pattern=noise at
    frame rate, pre-generated ring to avoid host bottleneck)."""

    def __init__(self, cfg: str):
        super().__init__(cfg)
        tc = TestcardCapture(cfg + ":pattern=noise" if "pattern" not in cfg else cfg)
        self.inner = tc

    def grab(self):
        return self.inner.grab()


register_module("testcard", LibraryClass.VIDEO_CAPTURE, TestcardCapture)
register_module("noise", LibraryClass.VIDEO_CAPTURE, NoiseCapture)


def initialize_video_capture(spec: str) -> VideoCapture:
    """ref: initialize_video_capture, src/video_capture.c."""
    name, _, cfg = spec.partition(":")
    cls = __import__("ultragrid_tpu.modules.registry", fromlist=["load_library"]).load_library(
        name, LibraryClass.VIDEO_CAPTURE
    )
    if cls is None:
        raise ValueError(f"unknown capture device {name!r}")
    return cls(cfg)
