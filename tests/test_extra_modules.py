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


def test_blend_display_crossfades():
    from ultragrid_tpu.modules.extra_displays import BlendDisplay

    d = BlendDisplay("dummy")
    captured = []
    d.child.put_frame = lambda fr, blocking=True: captured.append(
        None if fr is None else np.asarray(fr.data).copy())
    w, h = 32, 16
    desc = VideoDesc(w, h, Codec.RGB, 30.0)
    d.reconfigure(desc)
    black = np.zeros((h, w * 3), np.uint8)
    white = np.full((h, w * 3), 255, np.uint8)
    f1 = VideoFrame(desc, [black]); f1.callbacks["ssrc"] = 1
    d.put_frame(f1)
    assert (captured[-1] == 0).all()
    f2 = VideoFrame(desc, [white]); f2.callbacks["ssrc"] = 2
    d.put_frame(f2)  # transition starts: mostly the OLD (black) frame
    first = float(captured[-1].mean())
    assert 0 < first < 128
    means = [first]
    for _ in range(BlendDisplay.TRANSITION_FRAMES):
        nxt = VideoFrame(desc, [white]); nxt.callbacks["ssrc"] = 2
        d.put_frame(nxt)
        means.append(float(captured[-1].mean()))
    assert means == sorted(means)  # monotonic fade toward the new source
    assert (captured[-1] == 255).all()  # transition finished


def test_fluidsynth_midi_synth():
    from ultragrid_tpu.audio.capture import initialize_audio_capture

    cap = initialize_audio_capture("fluidsynth:loop=1")
    f = cap.read(48000)
    assert f is not None
    assert f.desc.sample_rate == 48000 and f.desc.ch_count == 2
    pcm = f.samples_float()
    assert pcm.shape[0] == 2
    rms = float(np.sqrt((pcm ** 2).mean()))
    assert rms > 0.01  # actually contains sound
    # spectral check: the bundled song starts on C (bass C2 ~ 65.4 Hz,
    # arp root C4 ~ 261.6 Hz) -- a strong component near 261.6 Hz
    spec = np.abs(np.fft.rfft(pcm[0][:48000]))
    freqs = np.fft.rfftfreq(48000, 1 / 48000)
    c4 = spec[(freqs > 255) & (freqs < 268)].max()
    assert c4 > spec.mean() * 20


def test_smf_parser_roundtrip():
    from ultragrid_tpu.audio.midi_synth import _bundled_song, parse_smf

    events = parse_smf(_bundled_song())
    assert len(events) > 20
    ons = [e for e in events if e[3] > 0]
    offs = [e for e in events if e[3] == 0]
    assert len(ons) == len(offs)
    assert events == sorted(events, key=lambda e: e[0])


def test_mux_ivf(tmp_path):
    import io
    from ultragrid_tpu.tools.mux_ivf import mux

    files = []
    for i in range(3):
        p = tmp_path / f"f{i}.vp8"
        p.write_bytes(bytes([i]) * (10 + i))
        files.append(str(p))
    buf = io.BytesIO()
    mux(64, 32, 30, files, buf)
    data = buf.getvalue()
    assert data[:4] == b"DKIF" and data[8:12] == b"VP80"
    import struct
    w, h, fps = struct.unpack("<HHI", data[12:20])
    assert (w, h, fps) == (64, 32, 30)
    sz, pts = struct.unpack("<IQ", data[32:44])
    assert sz == 10 and pts == 0


def test_mux_ivf_real_vp8_demuxes_with_lavf(tmp_path):
    """Encode VP8 with the lavc shim, mux to IVF, read back via the
    libavformat file capture -- full-container conformance."""
    pytest.importorskip("ctypes")
    from ultragrid_tpu.modules.registry import load_library as _ll
    from ultragrid_tpu.tools.mux_ivf import mux

    try:
        comp = _ll("libavcodec", LibraryClass.VIDEO_COMPRESS)("codec=VP8")
    except Exception as e:
        pytest.skip(f"no libvpx: {e}")
    from ultragrid_tpu.utils.pattern import generate_pattern

    w, h = 64, 32
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    files = []
    for i in range(3):
        f = VideoFrame(desc, [generate_pattern(w, h, Codec.UYVY, "bars")])
        out = comp.compress(f)
        if out is None:
            continue
        p = tmp_path / f"fr{i}.vp8"
        p.write_bytes(np.asarray(out.data).tobytes())
        files.append(str(p))
    if not files:
        pytest.skip("vp8 encoder produced no frames (lagged output)")
    ivf = tmp_path / "out.ivf"
    with open(ivf, "wb") as fh:
        mux(w, h, 30, files, fh)
    cap = _ll("file", LibraryClass.VIDEO_CAPTURE)(str(ivf))
    frame, _ = cap.grab()
    assert frame is not None and frame.desc.width == w
    cap.done()


def test_stitch_capture_composites_cameras():
    """Two cameras at yaw 0/180: panorama front sector comes from camera 0,
    back sector from camera 1; overlap regions blend."""
    from ultragrid_tpu.modules.video_capture import initialize_video_capture
    from ultragrid_tpu.modules.registry import register_module as _reg
    from ultragrid_tpu.modules.video_capture import VideoCapture as _VC

    class Solid(_VC):
        def __init__(self, cfg):
            super().__init__(cfg)
            r, g, b = (int(x) for x in cfg.split(","))
            w, h = 64, 48
            self.desc = VideoDesc(w, h, Codec.RGB, 30.0)
            img = np.zeros((h, w, 3), np.uint8)
            img[:] = (r, g, b)
            self._f = img.reshape(h, w * 3)

        def grab(self):
            import time as _t
            f = VideoFrame(self.desc, [self._f])
            f.timestamp = _t.monotonic()
            return f, None

    _reg("solidtest", LibraryClass.VIDEO_CAPTURE, Solid)
    cap = initialize_video_capture("stitch:solidtest:255,0,0#solidtest:0,255,0;size=128x64;fov=220")
    frame, _ = cap.grab()
    assert frame is not None and frame.desc.color_spec == Codec.RGB
    out = np.asarray(frame.data).reshape(64, 128, 3)
    front = out[32, 64]   # lon ~0 -> camera 0 (red)
    back = out[32, 2]     # lon ~-pi -> camera 1 (green)
    assert front[0] > 200 and front[1] < 50
    assert back[1] > 200 and back[0] < 50
    cap.done()


def test_uyvy2yuv422p_tool():
    from ultragrid_tpu.tools.uyvy2yuv422p import convert
    from ultragrid_tpu.ops.planar import uyvy_to_i422 as _maybe  # noqa: F401

    w, h = 8, 2
    # UYVY: U0 Y0 V0 Y1 ...
    uyvy = bytes(range(w * h * 2))
    out = convert(w, h, uyvy)
    y = out[: w * h]
    u = out[w * h : w * h + w * h // 2]
    v = out[w * h + w * h // 2 :]
    assert y[0] == 1 and y[1] == 3  # odd bytes
    assert u[0] == 0 and v[0] == 2
    assert len(u) == len(v) == w * h // 2
