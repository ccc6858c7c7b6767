"""End-to-end pipeline tests: testcard capture -> convert -> dummy display.

Mirrors the reference's hardware-independent device tests
(test/test_video_capture.c / test_video_display.c), which instantiate testcard
and dummy through the real module API.
"""

import time

import numpy as np
import pytest

from ultragrid_tpu.modules.registry import LibraryClass, list_modules
from ultragrid_tpu.modules.video_capture import initialize_video_capture
from ultragrid_tpu.modules.video_display import initialize_video_display
from ultragrid_tpu.pipeline.loop import CaptureToDisplayPipeline, run_local_pipeline
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def test_modules_registered():
    assert "testcard" in list_modules(LibraryClass.VIDEO_CAPTURE)
    assert "dummy" in list_modules(LibraryClass.VIDEO_DISPLAY)
    assert "null" in list_modules(LibraryClass.VIDEO_DISPLAY)


def test_testcard_capture_defaults():
    cap = initialize_video_capture("testcard")
    assert cap.desc.width == 1920 and cap.desc.height == 1080
    assert cap.desc.color_spec == Codec.UYVY
    assert cap.desc.fps == 24.0
    frame, audio = cap.grab()
    assert frame.data.shape == (1080, 3840)


def test_testcard_options():
    cap = initialize_video_capture("testcard:s=640x360:f=120:c=RGB:pattern=gradient")
    assert cap.desc.width == 640
    assert cap.desc.color_spec == Codec.RGB
    frame, _ = cap.grab()
    assert frame.data.shape == (360, 1920)


def test_testcard_legacy_positional():
    cap = initialize_video_capture("testcard:320:240:30:UYVY")
    assert (cap.desc.width, cap.desc.height, cap.desc.fps) == (320, 240, 30.0)


def test_pipeline_end_to_end():
    n = run_local_pipeline("testcard:s=320x240:f=1000:c=UYVY", "dummy", frame_limit=5)
    assert n == 5


def test_pipeline_with_conversion():
    """Display that only accepts RGB forces a UYVY->RGB conversion."""
    cap = initialize_video_capture("testcard:s=320x240:f=1000:c=UYVY")
    disp = initialize_video_display("dummy:codec=RGB")
    pipe = CaptureToDisplayPipeline(cap, disp, frame_limit=3)
    n = pipe.run()
    assert n == 3
    assert disp.frames_shown == 3
    assert disp.desc.color_spec == Codec.RGB


def test_file_display(tmp_path):
    out = tmp_path / "out.raw"
    n = run_local_pipeline("testcard:s=128x96:f=1000:c=UYVY:still=1", f"file:{out}", frame_limit=2)
    assert n == 2
    data = np.fromfile(out, dtype=np.uint8)
    assert data.size == 2 * 128 * 96 * 2


def test_pattern_bars_has_expected_colors():
    from ultragrid_tpu.utils.pattern import generate_pattern

    rgba = generate_pattern(192, 128, Codec.RGBA, "bars")
    # first bar is red (rect_colors[0] = 0xff0000ff -> bytes R=FF,G=00,B=00,A=FF)
    assert list(rgba[0, :4]) == [0xFF, 0, 0, 0xFF]
    # second bar green
    assert list(rgba[0, 32 * 4 : 32 * 4 + 4]) == [0, 0xFF, 0, 0xFF]


def test_messaging_tree():
    from ultragrid_tpu.modules.messaging import (
        Module,
        MsgUniversal,
        RESPONSE_NOT_FOUND,
        RESPONSE_OK,
        Response,
        send_message,
    )

    root = Module("root")
    video = Module("video", root)
    compress = Module("compress", video)
    got = []

    def cb(msg):
        got.append(msg)
        return Response(RESPONSE_OK)

    compress.msg_callback = cb
    r = send_message(root, "video.compress", MsgUniversal("quality 80"))
    assert r.ok and got[0].text == "quality 80"
    r = send_message(root, "video.nonexistent", MsgUniversal("x"))
    assert r.code == RESPONSE_NOT_FOUND


def test_y4m_display_and_file_capture_roundtrip(tmp_path):
    from ultragrid_tpu.pipeline.loop import run_local_pipeline
    from ultragrid_tpu.modules.video_capture import initialize_video_capture

    path = str(tmp_path / "out.y4m")
    n = run_local_pipeline(
        "testcard:s=192x128:f=1000:c=UYVY:still=1", f"y4m:{path}", frame_limit=3
    )
    assert n == 3
    cap = initialize_video_capture(f"file:{path}")
    assert cap.desc.color_spec == Codec.I420
    assert (cap.desc.width, cap.desc.height) == (192, 128)
    f, _ = cap.grab()
    assert f is not None and np.asarray(f.data).size == 192 * 128 * 3 // 2
    cap.done()


def test_multiplier_display():
    from ultragrid_tpu.modules.video_display import initialize_video_display
    from ultragrid_tpu.types import VideoDesc

    disp = initialize_video_display("multiplier:dummy#null")
    assert len(disp.children) == 2
    desc = VideoDesc(64, 48, Codec.UYVY, 30.0)
    disp.reconfigure(desc)
    frame = __import__("ultragrid_tpu.types", fromlist=["VideoFrame"]).VideoFrame.alloc(desc)
    disp.put_frame(frame)
    assert disp.children[0].frames_shown == 1


def test_aggregate_and_switcher_capture():
    from ultragrid_tpu.modules.video_capture import initialize_video_capture

    agg = initialize_video_capture(
        "aggregate:testcard:s=64x48:f=1000:c=UYVY#testcard:s=64x48:f=1000:c=UYVY"
    )
    frame, _ = agg.grab()
    assert frame.desc.tile_count == 2 and len(frame.tiles) == 2
    agg.done()

    sw = initialize_video_capture(
        "switcher:testcard:s=64x48:f=1000:c=UYVY#testcard:s=64x48:f=1000:c=RGB"
    )
    f, _ = sw.grab()
    assert f.desc.color_spec == Codec.UYVY
    assert sw.select(1)
    f, _ = sw.grab()
    assert f.desc.color_spec == Codec.RGB
    sw.done()


def test_conference_display_grid():
    from ultragrid_tpu.modules.video_display import initialize_video_display
    from ultragrid_tpu.types import VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    disp = initialize_video_display("conference:192x128")
    desc = VideoDesc(96, 64, Codec.UYVY, 30.0)
    for ssrc in (111, 222):
        data = generate_pattern(96, 64, Codec.UYVY, "bars")
        f = VideoFrame(desc, [data])
        f.callbacks["ssrc"] = ssrc
        disp.put_frame(f)
    assert len(disp.participants) == 2
    comp = np.asarray(disp.composite)
    assert comp.shape == (128, 384)


def test_encode_pipeline_fused_ldgm_fixed_size():
    """DXT1 + LDGM in ONE jit graph; parity bit-exact vs the host wire path
    (LdgmSession.encode, same [u32 len][data][pad][parity] container)."""
    from ultragrid_tpu.models.encode import EncodeConfig, EncodePipeline
    from ultragrid_tpu.ops.fec import LdgmSession
    from ultragrid_tpu.types import VideoDesc, vc_get_linesize
    from ultragrid_tpu.utils.pattern import generate_pattern

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    pipe = EncodePipeline(
        desc, EncodeConfig(in_codec=Codec.UYVY, compress="dxt1", fec="ldgm:32:8:5")
    )
    frame = generate_pattern(w, h, Codec.UYVY, "bars")
    data, parity = pipe(frame)
    data, parity = np.asarray(data), np.asarray(parity)
    sess = LdgmSession(32, 8, 5)
    buf, fdesc = sess.encode(data.reshape(-1))
    assert fdesc.symbol_size == pipe.fec_desc[-1]
    np.testing.assert_array_equal(parity.reshape(-1), buf[-parity.size:])


def test_encode_pipeline_fused_rs_fixed_size():
    from ultragrid_tpu.models.encode import EncodeConfig, EncodePipeline
    from ultragrid_tpu.ops.fec import RsSession
    from ultragrid_tpu.types import VideoDesc
    from ultragrid_tpu.utils.pattern import generate_pattern

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    pipe = EncodePipeline(
        desc, EncodeConfig(in_codec=Codec.UYVY, compress="dxt1", fec="rs:16:20")
    )
    frame = generate_pattern(w, h, Codec.UYVY, "gradient")
    data, parity = pipe(frame)
    data, parity = np.asarray(data), np.asarray(parity)
    sess = RsSession(16, 20)
    buf, fdesc = sess.encode(data.reshape(-1))
    assert fdesc.symbol_size == pipe.fec_desc[-1]
    np.testing.assert_array_equal(parity.reshape(-1), buf[-parity.size:])


@pytest.mark.parametrize("subsampling", ["422", "420"])
def test_encode_pipeline_fused_jpeg_ldgm(subsampling):
    """JPEG + LDGM parity over the slot-aligned device container, one graph.
    Parity must equal a host recomputation over the same container bytes.
    4:2:0 exercises the 4-luma-blocks-per-MCU part layout (round-4 fix:
    the part row counts assumed 4:2:2)."""
    from ultragrid_tpu.models.encode import EncodeConfig, EncodePipeline
    from ultragrid_tpu.ops.fec import build_ldgm_matrix
    from ultragrid_tpu.types import VideoDesc
    from ultragrid_tpu.utils.pattern import generate_pattern

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    pipe = EncodePipeline(
        desc, EncodeConfig(in_codec=Codec.UYVY, compress="jpeg",
                           fec="ldgm:32:16:5", subsampling=subsampling)
    )
    frame = generate_pattern(w, h, Codec.UYVY, "bars")
    ys, ybits, us, ubits, vs, vbits, parity, ovf = pipe(frame)
    assert not bool(ovf)
    kind, k, m, c, ps = pipe.fec_desc
    parity = np.asarray(parity)
    assert parity.shape == (m, ps)
    # host recomputation: each part starts on a fresh symbol row (the
    # device-native container layout), then plain numpy XOR over the matrix
    parts = [
        np.asarray(ys, np.uint32), np.asarray(ybits, np.int32).view(np.uint32),
        np.asarray(us, np.uint32), np.asarray(ubits, np.int32).view(np.uint32),
        np.asarray(vs, np.uint32), np.asarray(vbits, np.int32).view(np.uint32),
    ]
    rows = []
    for p in parts:
        nbytes = p.size * 4
        nrows = -(-nbytes // ps)
        buf = np.zeros(nrows * ps, np.uint8)
        buf[:nbytes] = p.reshape(-1).view(np.uint8)
        rows.append(buf.reshape(nrows, ps))
    sym = np.concatenate(rows)
    assert sym.shape[0] <= k
    sym = np.concatenate([sym, np.zeros((k - sym.shape[0], ps), np.uint8)])
    mat = build_ldgm_matrix(k, m, c, 1)
    expect = np.zeros((m, ps), np.uint8)
    for i in range(m):
        acc = np.zeros(ps, np.uint8)
        for j in np.nonzero(mat[i])[0]:
            acc ^= sym[j]
        if i:
            acc ^= expect[i - 1]  # staircase
        expect[i] = acc
    np.testing.assert_array_equal(parity, expect)


def test_loopback_rxtx_jpeg():
    """--protocol loopback: capture -> compress -> decompress -> display in
    one process (ref: src/rxtx/loopback.c, the single-process e2e fixture)."""
    from ultragrid_tpu.pipeline.loopback import LoopbackRxTx

    lb = LoopbackRxTx(
        "testcard:s=192x128:f=1000:c=UYVY:still=1", "dummy",
        compress_spec="jpeg", frame_limit=2,
    )
    n = lb.run()
    assert n == 2
    assert lb.display.frames_shown == 2


def test_disrupt_filter_drops_and_jitters():
    from ultragrid_tpu.modules.filters import DisruptFilter
    from ultragrid_tpu.types import VideoDesc, VideoFrame

    desc = VideoDesc(32, 16, Codec.UYVY, 30.0)
    frame = VideoFrame.alloc(desc)
    f = DisruptFilter("drop=50")
    kept = sum(1 for _ in range(200) if f.apply(frame) is not None)
    assert 60 < kept < 140  # ~50% +- slack
    f2 = DisruptFilter("jitter=1")
    t0 = time.time()
    for _ in range(5):
        assert f2.apply(frame) is not None
    assert time.time() - t0 < 1.0


def test_unix_sock_and_preview_display():
    """-d unix_socket / -d preview stream ipc_frame RGB over a unix socket
    (ref: src/video_display/unix_sock.cpp + tools/ipc_frame.h layout)."""
    import tempfile
    import threading

    from ultragrid_tpu.modules.ipc_display import (
        IpcFrameReader, UnixSockDisplay, ipc_scale_factor,
    )
    from ultragrid_tpu.utils.pattern import generate_pattern

    # scale-factor parity with ipc_frame_get_scale_factor
    assert ipc_scale_factor(1920, 1080, -1, -1) == 0
    assert ipc_scale_factor(1920, 1080, 960, 540) == 2
    assert ipc_scale_factor(640, 480, 960, 540) == 1

    path = tempfile.mktemp(prefix="ugtpu_ipc_")
    reader = IpcFrameReader(path)
    got = []

    def consume():
        reader.accept()
        while True:
            f = reader.read_frame()
            if f is None:
                return
            got.append(f)

    t = threading.Thread(target=consume, daemon=True)
    t.start()

    w, h = 128, 64
    disp = UnixSockDisplay(f"path={path}")
    desc = VideoDesc(w, h, Codec.RGB, 30.0)
    disp.reconfigure(desc)
    rgb = generate_pattern(w, h, Codec.RGB, "bars")
    # first 5 frames are skipped per the reference; send 7, expect 2
    for _ in range(7):
        disp.put_frame(VideoFrame(desc, [rgb]))
    disp.done()
    t.join(timeout=10)
    reader.close()
    assert len(got) == 2
    gw, gh, color, data = got[0]
    assert (gw, gh) == (w, h) and color == Codec.RGB
    np.testing.assert_array_equal(
        np.frombuffer(data, np.uint8).reshape(h, 3 * w), np.asarray(rgb)[:, : 3 * w]
    )


def test_v4l2_module_probes_cleanly():
    """v4l2 registers and probe-fails with a clear message when no
    /dev/video* exists (matches the reference's no-device behavior)."""
    import pytest as _pytest

    from ultragrid_tpu.modules.registry import LibraryClass, load_library
    from ultragrid_tpu.modules.v4l2_capture import (
        PIXFMT_MAP, V4l2Capture, v4l2_buffer, v4l2_capability, v4l2_format,
    )
    import ctypes as _ct
    import glob as _glob

    # UAPI struct sizes (64-bit) — wrong sizes would corrupt every ioctl
    assert _ct.sizeof(v4l2_capability) == 104
    assert _ct.sizeof(v4l2_format) == 208
    assert _ct.sizeof(v4l2_buffer) == 88
    assert PIXFMT_MAP[Codec.UYVY] == 0x59565955  # 'UYVY' little-endian

    assert load_library("v4l2", LibraryClass.VIDEO_CAPTURE) is V4l2Capture
    if not _glob.glob("/dev/video*"):
        with _pytest.raises(RuntimeError, match="no /dev/video"):
            V4l2Capture("")


def test_hw_stub_modules_report_probe_reason():
    import pytest as _pytest

    from ultragrid_tpu.modules.registry import LibraryClass, load_library

    cls = load_library("decklink", LibraryClass.VIDEO_CAPTURE)
    with _pytest.raises(RuntimeError, match="decklink"):
        cls("")
    cls = load_library("sdl", LibraryClass.VIDEO_DISPLAY)
    with _pytest.raises(RuntimeError, match="sdl"):
        cls("")


def test_swmix_capture_grid():
    """swmix software mixer: two testcards composited into a 2x1 grid
    (ref: src/video_capture/swmix.c)."""
    from ultragrid_tpu.modules.video_capture import initialize_video_capture

    cap = initialize_video_capture(
        "swmix:192:64:30:layout=2x1#testcard:s=96x64:c=RGB:pattern=gradient"
        "#testcard:s=96x64:c=RGB:pattern=blank"
    )
    frame, _ = cap.grab()
    assert frame is not None
    assert frame.desc.width == 192 and frame.desc.height == 64
    data = np.asarray(frame.data)
    left = data[:, : 3 * 96]
    right = data[:, 3 * 96 :]
    assert left.std() > 5  # gradient content
    assert right.max() <= 16  # blank
    cap.done()


def test_encode_pipeline_fused_scale_jpeg_ldgm():
    """BASELINE config #5: capture -> scale -> JPEG -> LDGM as ONE graph."""
    import numpy as np

    from ultragrid_tpu.models.encode import EncodeConfig, EncodePipeline
    from ultragrid_tpu.ops.jpeg import JpegEncoder
    from ultragrid_tpu.types import Codec, VideoDesc, vc_get_linesize

    desc = VideoDesc(128, 64, Codec.UYVY, 30.0)
    pipe = EncodePipeline(desc, EncodeConfig(
        in_codec=Codec.UYVY, compress="jpeg", quality=80,
        fec="ldgm:8:4:3", scale_to=(64, 32)))
    frame = np.random.default_rng(0).integers(
        0, 256, (64, vc_get_linesize(128, Codec.UYVY)), dtype=np.uint8)
    out = pipe._step(frame)
    assert len(out) == 8  # parts + parity + overflow
    # the scaled-down encode must match scaling on host then encoding
    from ultragrid_tpu.ops.postprocess import scale_nearest

    small = np.asarray(scale_nearest(frame, 128, Codec.UYVY, 64, 32))
    ref = JpegEncoder(64, 32, in_codec=Codec.UYVY, quality=80,
                      restart_interval=pipe.jpeg_encoder.restart_interval)
    ref.wwords = pipe.jpeg_encoder.wwords
    ref_out = ref._encode(small)
    got_ys = np.asarray(out[0])
    assert (got_ys == np.asarray(ref_out[0])).all()


def test_unix_sock_display_survives_dead_consumer():
    """A consumer that stops reading mid-stream must never wedge the
    pipeline: put_frame/done degrade to drops once the worker exits
    (found live: thumbnailgen -n 2 hung the whole sender)."""
    import socket as socket_mod
    import tempfile, os, time

    from ultragrid_tpu.modules.ipc_display import UnixSockDisplay
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    path = os.path.join(tempfile.gettempdir(), f"ug_deadcons_{os.getpid()}")
    srv = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    try:
        os.unlink(path)
    except FileNotFoundError:
        pass
    srv.bind(path)
    srv.listen(1)
    d = UnixSockDisplay(f"path={path}")
    conn, _ = srv.accept()
    conn.close()  # consumer goes away immediately
    srv.close()
    desc = VideoDesc(64, 32, Codec.RGB, 30.0)
    frame = VideoFrame(desc, [generate_pattern(64, 32, Codec.RGB, "bars")])
    d.reconfigure(desc)
    t0 = time.monotonic()
    for _ in range(20):  # > queue capacity; must not block forever
        d.put_frame(frame)
    d.put_frame(None)
    d.done()
    assert time.monotonic() - t0 < 30  # bounded, no wedge
    os.unlink(path)


def test_receiver_three_stage_pipeline_and_line_decode():
    """The receiver runs the reference's 3-stage decode pipeline (rx ->
    fec thread -> decompress thread, ref: video_decoders.cpp:46-93) and
    uncompressed native-codec streams are written straight into
    display-owned framebuffers (LINE_DECODER, video_decoders.cpp:1707-1796):
    put_frame receives the very frame get_frame handed out."""
    import threading
    import time as _time

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 24950
    handed_out = []
    displayed = []

    recv = VideoReceiver("dummy", rx_port=port, frame_limit=5, timeout=20.0)
    orig_get = recv.display.get_frame
    orig_put = recv.display.put_frame

    def spy_get():
        f = orig_get()
        handed_out.append(id(f))
        return f

    def spy_put(frame, blocking=True):
        if frame is not None:
            displayed.append((id(frame), bool(frame.callbacks.get("display_owned"))))
        orig_put(frame, blocking)

    recv.display.get_frame = spy_get
    recv.display.put_frame = spy_put
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    _time.sleep(0.2)

    sender = VideoSender(
        "testcard:s=128x96:f=30:c=UYVY:still=1", "127.0.0.1",
        compress_spec="none", tx_port=port, rx_port=0, frame_limit=12,
    )
    sender.run()
    t.join(timeout=15)

    assert recv.frames_displayed >= 5
    # every displayed frame was display-owned and one of the handed-out ones
    assert displayed and all(owned for _, owned in displayed)
    assert all(fid in handed_out for fid, _ in displayed)


def test_batched_jpeg_ldgm_parity_matches_single_frame():
    """BatchedJpegLdgmPipeline: per-frame parity bit-identical to the
    single-frame fused pipeline (frame boundaries are restart
    boundaries; throughput variant of the north-star sender graph)."""
    import numpy as np

    from ultragrid_tpu.models.encode import (
        BatchedJpegLdgmPipeline,
        EncodeConfig,
        EncodePipeline,
    )
    from ultragrid_tpu.types import Codec, VideoDesc

    desc = VideoDesc(64, 32, Codec.UYVY, 30.0)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (32, 128), dtype=np.uint8) for _ in range(3)]
    single = EncodePipeline(desc, EncodeConfig(compress="jpeg", quality=80,
                                               fec="ldgm:8:4:3"))
    batch = BatchedJpegLdgmPipeline(desc, 3, quality=80, fec="ldgm:8:4:3")
    outs = batch(np.concatenate(frames, axis=0))
    pars = np.asarray(outs[6])
    npm = batch.enc.single.nmcu
    ys = np.asarray(outs[0])
    for i, f in enumerate(frames):
        ref = single._step(f)
        np.testing.assert_array_equal(pars[i], np.asarray(ref[6]))
        np.testing.assert_array_equal(ys[i * npm * 2:(i + 1) * npm * 2],
                                      np.asarray(ref[0]))


def test_batched_jpeg_ldgm_420_parity_matches_batch1():
    """The 4:2:0 batched north-star graph (16x16 MCUs, 6 blocks/MCU) must
    keep per-frame bit-identity under row-wise frame stacking, like 4:2:2
    (measured 6.0 ms/frame at 8K batch-8 on one v5e chip — PERF.md)."""
    import numpy as np

    from ultragrid_tpu.models.encode import BatchedJpegLdgmPipeline
    from ultragrid_tpu.types import Codec, VideoDesc

    desc = VideoDesc(64, 32, Codec.UYVY, 30.0)
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (32, 128), dtype=np.uint8) for _ in range(3)]
    one = BatchedJpegLdgmPipeline(desc, 1, quality=80, fec="ldgm:8:4:3",
                                  subsampling="420")
    batch = BatchedJpegLdgmPipeline(desc, 3, quality=80, fec="ldgm:8:4:3",
                                    subsampling="420")
    assert batch.enc.single.subsampling == "420"
    outs = batch(np.concatenate(frames, axis=0))
    pars = np.asarray(outs[6])
    npm = batch.enc.single.nmcu
    ys = np.asarray(outs[0])
    for i, f in enumerate(frames):
        ref = one(f)
        np.testing.assert_array_equal(pars[i], np.asarray(ref[6])[0])
        np.testing.assert_array_equal(ys[i * npm * 4:(i + 1) * npm * 4],
                                      np.asarray(ref[0]))


def test_uncompressed_1080p_loopback_throughput_smoke():
    """Regression guard for the batched receive path: 1080p uncompressed
    loopback must sustain at least an order-of-magnitude below the
    measured 60 fps (see PERF.md receive-path table for the real numbers).

    The whole attempt is retried up to 3 times because the suite shares
    one CPU core: the sender paces at 60 fps regardless of receiver
    progress, so an unlucky scheduling stall makes the kernel drop most
    packets at the UDP socket with no code regression involved (honest
    UDP behavior).  A genuine receive-path breakage fails every attempt
    in any conditions (same load-hardening discipline as the adaptive-FEC
    stability test)."""
    import threading
    import time as _time

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    N = 20

    def attempt(port):
        recv = VideoReceiver("dummy", rx_port=port, frame_limit=N,
                             timeout=20.0)
        t = threading.Thread(target=recv.run, daemon=True)
        t.start()
        _time.sleep(0.2)
        t0 = _time.perf_counter()
        VideoSender("testcard:s=1920x1080:f=60:c=UYVY:still=1", "127.0.0.1",
                    compress_spec="none", tx_port=port, frame_limit=N + 15,
                    mtu=8192).run()
        t.join(timeout=25)
        dt = _time.perf_counter() - t0
        return recv.frames_displayed, recv.frames_displayed / dt

    results = []
    for i in range(3):
        frames, fps = attempt(24931 + i)
        results.append((frames, round(fps, 1)))
        if frames >= N // 2 and fps > 5.0:  # floors (uncontended: 20, 60)
            return
    raise AssertionError(
        f"loopback smoke missed floors on all 3 attempts "
        f"((frames, fps) per attempt: {results}; need >= {N // 2} frames "
        f"and > 5.0 fps on one)")
