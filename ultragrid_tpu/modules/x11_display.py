"""X11 windowed display via the wire-protocol client (no Xlib/SDL/GL).

Role: the reference presents frames in a desktop window through SDL3 or
OpenGL (src/video_display/sdl3.cpp, src/video_display/gl.cpp), both
compiled only when their libraries exist.  This environment has no SDL,
GL or even libX11 — but a plain X11 core-protocol ``PutImage`` to a
window needs none of them, so the display speaks the wire directly
through :class:`ultragrid_tpu.net.x11.X11Connection` (the same client
the ``-t screen`` capture uses).

Accepts RGB/RGBA natively; the pipeline's decoder negotiates the
conversion from anything else (same contract as the reference's
``DISPLAY_PROPERTY_CODECS``).  Frames are converted to the server's
ZPixmap BGRX layout and row-chunked under the max-request-length.

Config: ``x11[:display=<DISPLAY>][:title=<str>]``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ultragrid_tpu.modules.registry import LibraryClass, register_module
from ultragrid_tpu.modules.video_display import VideoDisplay
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.log import Logger

log = Logger("x11")


def rgb_to_zpixmap(rgb: np.ndarray, byte_order: int) -> bytes:
    """[h, w, 3] RGB -> 32bpp ZPixmap bytes (BGRX LSB-first / XRGB MSB)."""
    h, w, _ = rgb.shape
    px = np.zeros((h, w, 4), np.uint8)
    if byte_order == 0:  # LSB-first: memory B,G,R,X
        px[:, :, 0] = rgb[:, :, 2]
        px[:, :, 1] = rgb[:, :, 1]
        px[:, :, 2] = rgb[:, :, 0]
    else:  # MSB-first: memory X,R,G,B
        px[:, :, 1] = rgb[:, :, 0]
        px[:, :, 2] = rgb[:, :, 1]
        px[:, :, 3] = rgb[:, :, 2]
    return px.tobytes()


class X11Display(VideoDisplay):
    """Present frames in an X11 window (``-d x11``)."""

    def __init__(self, cfg: str):
        super().__init__(cfg)
        from ultragrid_tpu.utils.params import get_commandline_param

        self.display_name: Optional[str] = None
        # --window-title overrides the default (ref: OPT_WINDOW_TITLE)
        self.title = get_commandline_param("window-title") or "ultragrid_tpu"
        for tok in filter(None, cfg.split(":")):
            if tok.startswith("display="):
                self.display_name = tok[8:]
            elif tok.startswith("title="):
                self.title = tok[6:]
        from ultragrid_tpu.net.x11 import X11Connection

        self.conn = X11Connection(self.display_name)
        self.win: Optional[int] = None
        self.gc: Optional[int] = None

    def get_property_codecs(self) -> List[Codec]:
        return [Codec.RGB, Codec.RGBA]

    def reconfigure(self, desc: VideoDesc) -> bool:
        if self.win is not None and self.desc is not None and (
            desc.width != self.desc.width or desc.height != self.desc.height
        ):
            self.conn.destroy_window(self.win)
            self.win = None
        self.desc = desc
        if self.win is None:
            self.win = self.conn.create_window(desc.width, desc.height, self.title)
            self.gc = self.conn.create_gc(self.win)
            self.conn.sync()
            log.notice(f"[x11] window {desc.width}x{desc.height} mapped")
        return True

    def put_frame(self, frame: Optional[VideoFrame], blocking: bool = True) -> None:
        if frame is None or self.win is None:
            return
        desc = frame.desc
        data = np.asarray(frame.data, np.uint8)
        if desc.color_spec == Codec.RGB:
            rgb = data[:, : 3 * desc.width].reshape(desc.height, desc.width, 3)
        elif desc.color_spec == Codec.RGBA:
            rgb = data[:, : 4 * desc.width].reshape(desc.height, desc.width, 4)[:, :, :3]
        else:  # negotiated contract should prevent this
            log.error(f"x11: cannot present {desc.color_spec.name}")
            return
        self.conn.put_image(
            self.win, self.gc, 0, 0, desc.width, desc.height,
            rgb_to_zpixmap(rgb, self.conn.image_byte_order),
        )
        self.conn.sync()
        super().put_frame(frame, blocking)

    def done(self) -> None:
        try:
            if self.win is not None:
                self.conn.destroy_window(self.win)
                self.conn.sync()
        except Exception:  # noqa: BLE001 - server may already be gone
            pass
        self.conn.close()


register_module("x11", LibraryClass.VIDEO_DISPLAY, X11Display)
