"""GL display: real GLSL conversion shaders on the EGL-surfaceless Mesa
context (reference scope: src/video_display/gl.c shader table +
display_gl_putf) — UYVY/DXT shaders validated against the repo's own
device conversions, windowed presentation against the mock X server."""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern

try:
    from ultragrid_tpu.utils.glctx import GLContext, GLError

    _probe = GLContext()
    _HAS_S3TC = _probe.has_s3tc
    _probe.destroy()
    _GL_OK = True
except Exception:  # noqa: BLE001 - no Mesa/EGL in this environment
    _GL_OK = False
    _HAS_S3TC = False

pytestmark = pytest.mark.skipif(not _GL_OK, reason="no EGL surfaceless GL context")


def _mkframe(w, h, codec, data):
    return VideoFrame(VideoDesc(w, h, codec, 30.0), [data])


def _render(codec, w, h, data, cfg=""):
    from ultragrid_tpu.modules.gl_display import GlDisplay

    disp = GlDisplay(cfg)
    try:
        assert codec in disp.get_property_codecs()
        assert disp.reconfigure(VideoDesc(w, h, codec, 30.0))
        disp.put_frame(_mkframe(w, h, codec, data))
        out = disp.last_rgb()
        assert out is not None and out.shape == (h, w, 3)
        return out.copy()
    finally:
        disp.done()


def test_rgb_passthrough_exact():
    w, h = 48, 24
    rgb = generate_pattern(w, h, Codec.RGB, "bars").reshape(h, w, 3)
    out = _render(Codec.RGB, w, h, rgb.reshape(h, -1))
    assert np.array_equal(out, rgb)


def test_rgba_passthrough_exact():
    w, h = 32, 16
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    out = _render(Codec.RGBA, w, h, rgba.reshape(h, -1))
    assert np.array_equal(out, rgba[:, :, :3])


def test_uyvy_shader_matches_device_conversion():
    """The GLSL UYVY->RGB shader must agree with ops/convs_yuv.py's
    fixed-point conversion (ref: gl.c:118-139 vs pixfmt_conv.c:1102)."""
    from ultragrid_tpu.ops.convs_yuv import uyvy_to_rgb

    w, h = 64, 32
    uyvy = generate_pattern(w, h, Codec.UYVY, "bars")
    out = _render(Codec.UYVY, w, h, uyvy)
    want = np.asarray(uyvy_to_rgb(uyvy.reshape(h, -1), w)).reshape(h, w, 3)
    assert np.max(np.abs(out.astype(int) - want.astype(int))) <= 2


def test_uyvy_shader_random_bt601_sd():
    from ultragrid_tpu.ops.color import Colorspace, set_default_cs
    from ultragrid_tpu.ops.convs_yuv import uyvy_to_rgb

    w, h = 32, 18
    rng = np.random.default_rng(1)
    uyvy = rng.integers(16, 236, (h, 2 * w), dtype=np.uint8)
    set_default_cs(Colorspace.CS_601)  # shader + device conversion both follow
    try:
        out = _render(Codec.UYVY, w, h, uyvy)
        want = np.asarray(uyvy_to_rgb(uyvy, w)).reshape(h, w, 3)
    finally:
        set_default_cs(Colorspace.CS_709)
    assert np.max(np.abs(out.astype(int) - want.astype(int))) <= 2


@pytest.mark.skipif(not _HAS_S3TC, reason="driver lacks S3TC")
def test_dxt1_driver_decode_matches_own_decoder():
    from ultragrid_tpu.ops.dxt import dxt1_decode_rgb, dxt1_encode_rgb

    w, h = 32, 16
    rng = np.random.default_rng(2)
    base = np.linspace(0, 255, w, dtype=np.float32)
    rgb = np.stack([base + rng.normal(0, 4, w) for _ in range(3 * h)])
    rgb = rgb.clip(0, 255).astype(np.uint8).reshape(h, 3 * w)
    comp = np.asarray(dxt1_encode_rgb(rgb, w))
    out = _render(Codec.DXT1, w, h, comp)
    want = np.asarray(dxt1_decode_rgb(comp, w, h)).reshape(h, w, 3)
    # identical palettes; driver/our rounding of the 1/3-2/3 points differs
    assert np.max(np.abs(out.astype(int) - want.astype(int))) <= 4


@pytest.mark.skipif(not _HAS_S3TC, reason="driver lacks S3TC")
def test_dxt5_ycocg_shader_matches_own_decoder():
    """Driver S3TC decode + YCoCg shader (ref: fp_display_dxt5ycocg,
    gl.c:304-321) vs ops/dxt.py's decoder on the same stream."""
    from ultragrid_tpu.ops.dxt import dxt5_ycocg_decode_rgb, dxt5_ycocg_encode_rgb

    w, h = 32, 16
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (h, 3 * w), dtype=np.uint8)
    comp = np.asarray(dxt5_ycocg_encode_rgb(rgb, w))
    out = _render(Codec.DXT5, w, h, comp)
    want = np.asarray(dxt5_ycocg_decode_rgb(comp, w, h)).reshape(h, w, 3)
    assert np.max(np.abs(out.astype(int) - want.astype(int))) <= 6


@pytest.mark.skipif(not _HAS_S3TC, reason="driver lacks S3TC")
def test_dxt1_yuv_shader_close_to_direct_conversion():
    """DXT1_YUV: S3TC texture holds YUV; the shader converts to RGB
    (ref: fp_display_dxt1_yuv, gl.c:277-294).  On flat bars the DXT
    quantization is small, so the render must track the repo's direct
    UYVY->RGB conversion."""
    from ultragrid_tpu.ops.convs_yuv import uyvy_to_rgb
    from ultragrid_tpu.ops.dxt import dxt1_yuv_encode_uyvy

    w, h = 64, 32
    uyvy = generate_pattern(w, h, Codec.UYVY, "bars")
    comp = np.asarray(dxt1_yuv_encode_uyvy(uyvy.reshape(h, -1), w))
    out = _render(Codec.DXT1_YUV, w, h, comp)
    want = np.asarray(uyvy_to_rgb(uyvy.reshape(h, -1), w)).reshape(h, w, 3)
    # interior of each bar (block-aligned) must match closely
    assert np.median(np.abs(out.astype(int) - want.astype(int))) <= 4


def test_deinterlace_pass():
    """gl:deinterlace blends each line with the one below (ref:
    deinterlace_fp, gl.c:104-116)."""
    w, h = 16, 8
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[0::2] = 200  # even lines bright, odd lines black
    out = _render(Codec.RGB, w, h, rgb.reshape(h, -1), cfg="deinterlace")
    want = ((rgb[:, :, 0].astype(np.float32)
             + rgb[np.minimum(np.arange(h) + 1, h - 1), :, 0]) / 2.0)
    assert np.max(np.abs(out[:, :, 0].astype(np.float32) - want)) <= 1.0
    assert np.all(out[0] == out[1])  # fully blended pairs match


def test_windowed_presentation(tmp_path):
    """gl:window blits the rendered RGB through the X11 wire client."""
    from tests.test_screen_capture import MockXServer
    from ultragrid_tpu.modules.gl_display import GlDisplay

    srv = MockXServer(str(tmp_path / "Xmock"))
    try:
        disp = GlDisplay(f"display={srv.path}:title=gltest")
        w, h = 48, 24
        assert disp.reconfigure(VideoDesc(w, h, Codec.RGB, 30.0))
        rgb = generate_pattern(w, h, Codec.RGB, "bars").reshape(h, w, 3)
        disp.put_frame(_mkframe(w, h, Codec.RGB, rgb.reshape(h, -1)))
        wid = next(iter(srv.mapped))
        assert srv.titles.get(wid) == "gltest"
        assert np.array_equal(srv.windows[wid], rgb)
        disp.done()
        assert wid not in srv.windows
    finally:
        srv.close()


@pytest.mark.skipif(not _HAS_S3TC, reason="driver lacks S3TC")
def test_dxt1_rtp_native_display_passthrough():
    """DXT1 over RTP lands in the gl display as a compressed texture —
    no CPU decompression stage (ref: the RTDXT -> gl display flow)."""
    import threading

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 23492
    recv = VideoReceiver("gl", rx_port=port, frame_limit=2, timeout=60.0)
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    VideoSender(
        "testcard:64:48:30:UYVY", "127.0.0.1", compress_spec="dxt",
        tx_port=port, frame_limit=4,
    ).run()
    t.join(timeout=60)
    assert recv.frames_displayed >= 1
    assert recv._decompress is None  # native passthrough, no decode stage
    assert recv.display.desc.color_spec == Codec.DXT1
    assert recv.display.last_rgb() is not None


def test_pipeline_e2e_testcard_to_gl():
    """testcard -> gl display through the loopback pipeline (negotiation
    picks a codec the display accepts natively)."""
    from ultragrid_tpu.modules.registry import LibraryClass, load_library

    cls = load_library("gl", LibraryClass.VIDEO_DISPLAY)
    assert cls is not None
    disp = cls("")
    try:
        assert disp.reconfigure(VideoDesc(64, 32, Codec.UYVY, 30.0))
        uyvy = generate_pattern(64, 32, Codec.UYVY, "smpte_bars")
        for _ in range(3):
            disp.put_frame(_mkframe(64, 32, Codec.UYVY, uyvy))
        assert disp.frames_shown == 3
        assert disp.last_rgb() is not None
    finally:
        disp.done()
