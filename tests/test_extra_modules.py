"""Tests for the round-2 extra modules: caca/pano/pipe/aggregate displays,
testcard2 + ug_input captures."""

import threading

import numpy as np
import pytest

from ultragrid_tpu.modules.registry import LibraryClass, list_modules, load_library
from ultragrid_tpu.modules.video_display import initialize_video_display
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame, vc_get_linesize


def _bars_frame(w=64, h=32, codec=Codec.UYVY):
    from ultragrid_tpu.utils.pattern import generate_pattern

    desc = VideoDesc(w, h, codec, 30.0)
    return VideoFrame(desc, [generate_pattern(w, h, codec, "bars")])


def test_caca_display_renders_ansi(tmp_path):
    out = tmp_path / "caca.txt"
    d = initialize_video_display(f"caca:size=40x12:out={out}")
    f = _bars_frame()
    assert d.reconfigure(f.desc)
    d.put_frame(f)
    d.put_frame(None)
    d.done()
    text = out.read_text()
    assert "▀" in text
    assert "\x1b[38;2;" in text and "\x1b[48;2;" in text
    # one text row per pair of pixel rows
    rows = [ln for ln in text.split("\n") if "▀" in ln]
    assert 1 <= len(rows) <= 12


def test_pano_display_projects_equirect():
    from ultragrid_tpu.modules.extra_displays import PanoDisplay

    w, h = 128, 64
    # equirect: left half red, right half green (RGB)
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = (255, 0, 0)
    rgb[:, w // 2 :] = (0, 255, 0)
    desc = VideoDesc(w, h, Codec.RGB, 30.0)
    d = PanoDisplay("size=32x16:fov=90:yaw=0")
    assert d.reconfigure(desc)
    frame = VideoFrame(desc, [rgb.reshape(h, w * 3)])
    d.put_frame(frame)
    child = d.child
    assert child.frames_shown == 1
    # yaw=0 looks at lon 0 = equirect center = boundary; yaw=-90 sees left(red)
    d2 = PanoDisplay("size=32x16:fov=60:yaw=270")
    d2.reconfigure(desc)
    captured = {}

    class Grab:
        def __init__(self):
            self.frame = None

    d2.child.put_frame = lambda fr, blocking=True: captured.update(f=fr)
    d2.put_frame(frame)
    out = np.asarray(captured["f"].data).reshape(16, 32, 3)
    center = out[8, 16]
    assert center[0] > 200 and center[1] < 50  # red hemisphere


def test_pipe_display_delegate_and_poison():
    from ultragrid_tpu.modules.extra_displays import register_pipe_delegate

    got = []
    register_pipe_delegate("t1", got.append)
    d = initialize_video_display("pipe:t1")
    f = _bars_frame()
    d.reconfigure(f.desc)
    d.put_frame(f)
    d.put_frame(None)
    assert len(got) == 2 and got[0] is f and got[1] is None
    with pytest.raises(ValueError):
        initialize_video_display("pipe:unregistered")


def test_aggregate_display_routes_tiles():
    d = initialize_video_display("aggregate:dummy#dummy")
    w, h = 32, 16
    from ultragrid_tpu.utils.pattern import generate_pattern

    desc = VideoDesc(w, h, Codec.UYVY, 30.0, tile_count=2)
    t = generate_pattern(w, h, Codec.UYVY, "bars")
    frame = VideoFrame(desc, [t, t.copy()])
    assert d.reconfigure(desc)
    d.put_frame(frame)
    assert all(c.frames_shown == 1 for c in d.children)
    d.put_frame(None)
    d.done()


def test_testcard2_animates():
    cap = load_library("testcard2", LibraryClass.VIDEO_CAPTURE)("64:32:60:UYVY")
    frames = []
    for _ in range(3):
        f, _a = cap.grab()
        assert f is not None
        assert f.desc.width == 64 and f.desc.color_spec == Codec.UYVY
        frames.append(np.asarray(f.data))
    # bouncing squares must move: consecutive frames differ
    assert not np.array_equal(frames[0], frames[1])
    assert not np.array_equal(frames[1], frames[2])
    cap.done()


def test_ug_input_chains_receiver(unused_tcp_port_factory=None):
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 23454
    cap = load_library("ug_input", LibraryClass.VIDEO_CAPTURE)(f"port={port}")
    try:
        sender = VideoSender(
            "testcard:64:32:30:UYVY", "127.0.0.1", compress_spec="none",
            tx_port=port, frame_limit=5,
        )
        t = threading.Thread(target=sender.run, daemon=True)
        t.start()
        frame, _audio = cap.grab()
        assert frame is not None
        assert frame.desc.width == 64 and frame.desc.height == 32
        t.join(timeout=10)
    finally:
        cap.done()


def test_modules_listed():
    disp = list_modules(LibraryClass.VIDEO_DISPLAY)
    for name in ("caca", "pano", "pipe", "aggregate"):
        assert name in disp
    caps = list_modules(LibraryClass.VIDEO_CAPTURE)
    for name in ("testcard2", "ug_input"):
        assert name in caps


def test_thumbnailgen_writes_jpeg(tmp_path):
    from ultragrid_tpu.tools.thumbnailgen import write_thumbnail
    from ultragrid_tpu.ops.jpeg import decode_jpeg

    w, h = 50, 30  # non-aligned on purpose (pad path)
    rgb = np.linspace(0, 255, w * h * 3, dtype=np.float32).astype(np.uint8).tobytes()
    out = tmp_path / "t.jpg"
    write_thumbnail(w, h, rgb, str(out))
    data = out.read_bytes()
    assert data[:2] == b"\xff\xd8"
    decode_jpeg(data)  # parses + decodes
