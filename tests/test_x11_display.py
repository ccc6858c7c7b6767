"""X11 windowed display against the mock X server: window lifecycle,
PutImage contents, request chunking, pipeline e2e (reference scope:
src/video_display/sdl3.cpp / gl.cpp window presentation — here spoken as
core-protocol PutImage, see modules/x11_display.py)."""

import time

import numpy as np
import pytest

from tests.test_screen_capture import MockXServer
from ultragrid_tpu.modules.x11_display import X11Display, rgb_to_zpixmap
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern


@pytest.fixture
def xserver(tmp_path):
    srv = MockXServer(str(tmp_path / "Xmock"))
    yield srv
    srv.close()


def _wait(cond, timeout=5.0):
    t0 = time.monotonic()
    while not cond() and time.monotonic() - t0 < timeout:
        time.sleep(0.01)
    assert cond()


def test_window_lifecycle_and_contents(xserver):
    disp = X11Display(f"display={xserver.path}:title=ugtest")
    w, h = 48, 24
    assert disp.reconfigure(VideoDesc(w, h, Codec.RGB, 30.0))
    _wait(lambda: xserver.mapped)
    wid = next(iter(xserver.mapped))
    assert xserver.titles.get(wid) == "ugtest"
    rgb = generate_pattern(w, h, Codec.RGB, "bars").reshape(h, w, 3)
    disp.put_frame(VideoFrame(VideoDesc(w, h, Codec.RGB, 30.0), [rgb.reshape(h, -1)]))
    # put_frame syncs, so contents are already there
    assert np.array_equal(xserver.windows[wid], rgb)
    disp.done()
    _wait(lambda: wid not in xserver.windows)


def test_rgba_and_reconfigure_resize(xserver):
    disp = X11Display(f"display={xserver.path}")
    assert disp.reconfigure(VideoDesc(32, 16, Codec.RGBA, 30.0))
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (16, 32, 4), dtype=np.uint8)
    disp.put_frame(VideoFrame(VideoDesc(32, 16, Codec.RGBA, 30.0), [rgba.reshape(16, -1)]))
    wid = next(iter(xserver.mapped))
    assert np.array_equal(xserver.windows[wid], rgba[:, :, :3])
    # reconfigure to a new size replaces the window
    assert disp.reconfigure(VideoDesc(40, 20, Codec.RGB, 30.0))
    _wait(lambda: wid not in xserver.windows and len(xserver.windows) == 1)
    disp.done()


def test_putimage_row_chunking(xserver):
    disp = X11Display(f"display={xserver.path}")
    assert disp.reconfigure(VideoDesc(64, 32, Codec.RGB, 30.0))
    disp.conn.max_req_bytes = 64 * 4 * 8 + 24  # force ~4 chunks
    rgb = generate_pattern(64, 32, Codec.RGB, "gradient").reshape(32, 64, 3)
    before = xserver.put_count
    disp.put_frame(VideoFrame(VideoDesc(64, 32, Codec.RGB, 30.0), [rgb.reshape(32, -1)]))
    wid = next(iter(xserver.mapped))
    assert xserver.put_count - before == 4
    assert np.array_equal(xserver.windows[wid], rgb)
    disp.done()


def test_zpixmap_byte_orders():
    rgb = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    lsb = np.frombuffer(rgb_to_zpixmap(rgb, 0), np.uint8).reshape(2, 2, 4)
    assert (lsb[0, 0, :3] == [2, 1, 0]).all()  # B,G,R
    msb = np.frombuffer(rgb_to_zpixmap(rgb, 1), np.uint8).reshape(2, 2, 4)
    assert (msb[0, 0, 1:] == [0, 1, 2]).all()  # X,R,G,B


def test_pipeline_e2e_testcard_to_x11(xserver, monkeypatch):
    """Full loopback: testcard UYVY -> decoder-negotiated RGB -> x11 window."""
    monkeypatch.setenv("DISPLAY", xserver.path)
    # drive via the display registry exactly as `-d x11` does
    from ultragrid_tpu.modules.registry import LibraryClass, load_library

    cls = load_library("x11", LibraryClass.VIDEO_DISPLAY)
    disp = cls(f"display={xserver.path}")
    assert disp.reconfigure(VideoDesc(64, 32, Codec.RGB, 10.0))
    uyvy = generate_pattern(64, 32, Codec.UYVY, "bars")
    from ultragrid_tpu.ops import pixfmt

    rgb = np.asarray(
        pixfmt.convert_frame(uyvy, 64, Codec.UYVY, Codec.RGB), np.uint8
    )
    disp.put_frame(VideoFrame(VideoDesc(64, 32, Codec.RGB, 10.0), [rgb]))
    wid = next(iter(xserver.mapped))
    assert np.array_equal(xserver.windows[wid], rgb.reshape(32, 64, 3))
    disp.done()
