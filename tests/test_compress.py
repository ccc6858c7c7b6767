"""DXT and JPEG compression tests.

JPEG gate mirrors the reference acceptance: round-trip max per-component
error <= 1 on testcard content (ref: test/gpujpeg_test.cpp:104).
"""

import io

import numpy as np
import pytest

from ultragrid_tpu.ops import dxt
from ultragrid_tpu.ops.jpeg import JpegEncoder, decode_jpeg, _assemble_python
from ultragrid_tpu.types import Codec
from ultragrid_tpu.utils.pattern import generate_pattern

W, H = 192, 128


def test_dxt1_roundtrip_quality():
    rgb = generate_pattern(W, H, Codec.RGB, "bars")
    enc = np.asarray(dxt.dxt1_encode_rgb(rgb, W))
    assert enc.size == W * H // 2
    dec = np.asarray(dxt.dxt1_decode_rgb(enc, W, H))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 8 and err.mean() < 1.0


def test_dxt1_solid_block_near_exact():
    solid = np.zeros((8, 24), np.uint8)
    solid[:, 0::3], solid[:, 1::3], solid[:, 2::3] = 200, 100, 50
    dec = np.asarray(dxt.dxt1_decode_rgb(np.asarray(dxt.dxt1_encode_rgb(solid, 8)), 8, 8))
    assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 4


def test_dxt5_ycocg_roundtrip_quality():
    rgb = generate_pattern(W, H, Codec.RGB, "gradient")
    enc = np.asarray(dxt.dxt5_ycocg_encode_rgb(rgb, W))
    assert enc.size == W * H
    dec = np.asarray(dxt.dxt5_ycocg_decode_rgb(enc, W, H))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 16 and err.mean() < 2.0


def test_dxt1_uyvy_input():
    uy = generate_pattern(W, H, Codec.UYVY, "bars")
    enc = np.asarray(dxt.dxt1_encode_uyvy(uy, W))
    assert enc.size == W * H // 2


def _pil_decode(data: np.ndarray):
    from PIL import Image

    img = Image.open(io.BytesIO(data.tobytes()))
    img.load()
    return img


def test_jpeg_rgb_roundtrip_pil():
    """Bitstream validity + quality gate via an independent decoder (PIL)."""
    pytest.importorskip("PIL")
    rgb = generate_pattern(W, H, Codec.RGB, "bars")
    enc = JpegEncoder(W, H, in_codec=Codec.RGB, quality=90)
    data = enc.encode(rgb)
    img = _pil_decode(data)
    assert img.size == (W, H)
    dec = np.asarray(img.convert("RGB")).reshape(H, 3 * W).astype(int)
    assert np.abs(dec - rgb.astype(int)).max() <= 1  # gpujpeg_test.cpp:104 gate


def test_jpeg_uyvy_422_y_plane_exact_on_bars():
    uy = generate_pattern(W, H, Codec.UYVY, "bars")
    enc = JpegEncoder(W, H, in_codec=Codec.UYVY, quality=90)
    data = enc.encode(uy)
    planes, hh, ww, samp = decode_jpeg(data.tobytes())
    assert (hh, ww) == (H, W)
    assert samp[0] == (2, 1)
    y = np.clip(np.round(planes[0]), 0, 255)[:H, :W]
    np.testing.assert_array_equal(y, uy[:, 1::2].astype(float))


def test_jpeg_entropy_noise_coefficient_roundtrip():
    """Entropy encode->decode is lossless at the coefficient level (<=1
    mismatch per 10k allowed for float-tie recomputation artifacts)."""
    import jax.numpy as jnp

    from ultragrid_tpu.ops.jpeg import _blockify_plane, _dct_quant_zigzag, dct_matrix_64

    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (H, 2 * W), dtype=np.int32).astype(np.uint8)
    enc = JpegEncoder(W, H, in_codec=Codec.UYVY, quality=95, restart_interval=3)
    data = enc.encode(noise)
    _, _, _, _, coeffs = decode_jpeg(data.tobytes(), collect_coeffs=True)

    from ultragrid_tpu.ops.jpeg import ZIGZAG

    (yp, up, vp), shifted = enc._planes_from_input(jnp.asarray(noise))
    assert not shifted  # YUV inputs stay uint8; level shift folds into matmul
    yb = yp.reshape(enc.nmcuy, 8, enc.nmcux, 2, 8).transpose(0, 2, 3, 1, 4).reshape(enc.nmcu * 2, 64)
    # same fused DCT+zigzag+quant matrix + level-shift constant the encoder
    # uses (identical rounding)
    qy = jnp.asarray(enc.qtab_luma[ZIGZAG]).astype(jnp.float32)
    m = jnp.asarray(dct_matrix_64())
    my = (m[jnp.asarray(ZIGZAG), :] / qy[:, None]).T
    cy = 128.0 * my.sum(axis=0)
    exp_y = np.asarray(
        jnp.round(
            jnp.dot(yb.astype(jnp.float32), my, preferred_element_type=jnp.float32)
            - cy[None, :]
        ).astype(jnp.int32)
    )
    got_y = coeffs[0]
    mismatches = int((got_y != exp_y).sum())
    assert mismatches <= max(2, got_y.size // 10000), mismatches


def test_jpeg_decode_420_subsampling():
    """RFC 2435 type 1 (4:2:0) is what ffmpeg/GStreamer cameras send; the
    receiver must upsample half-height chroma instead of crashing."""
    pytest.importorskip("PIL")
    from PIL import Image

    from ultragrid_tpu.ops.jpeg import decode_jpeg_to_frame
    from ultragrid_tpu.types import VideoDesc, VideoFrame

    rgb = generate_pattern(W, H, Codec.RGB, "gradient").reshape(H, W, 3)
    buf = io.BytesIO()
    Image.fromarray(rgb, "RGB").save(buf, "JPEG", quality=90, subsampling=2)  # 4:2:0
    data = np.frombuffer(buf.getvalue(), np.uint8)
    frame = VideoFrame(VideoDesc(W, H, Codec.JPEG, 30.0), [data])
    for out_codec in (Codec.UYVY, Codec.RGB):
        out = decode_jpeg_to_frame(frame, out_codec)
        assert out is not None and out.desc.color_spec == out_codec
        arr = np.asarray(out.data)
        assert arr.shape[0] == H
    # quality check on the RGB path
    out = decode_jpeg_to_frame(frame, Codec.RGB)
    dec = np.asarray(out.data).reshape(H, W, 3).astype(int)
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB")).astype(int)
    # same file, two decoders: only rounding/upsample-filter differences
    assert np.abs(dec - ref).mean() < 8


def test_jpeg_restart_marker_structure():
    uy = generate_pattern(W, H, Codec.UYVY, "bars")
    enc = JpegEncoder(W, H, in_codec=Codec.UYVY, quality=80, restart_interval=4)
    data = bytes(enc.encode(uy).tobytes())
    # count RST markers: nseg - 1
    count = 0
    i = data.index(b"\xff\xda")  # SOS
    i += 2
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            count += 1
            i += 2
        else:
            i += 1
    assert count == enc.nseg - 1


def test_jpeg_auto_slot_escalation():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (H, 2 * W), dtype=np.int32).astype(np.uint8)
    enc = JpegEncoder(W, H, in_codec=Codec.UYVY, quality=97)
    start_w = enc.wwords
    data = enc.encode(noise)
    assert data.size > 0
    # noise at q97 should have forced wider slots
    assert enc.wwords >= start_w


def test_jpeg_compress_module():
    from ultragrid_tpu.modules.video_compress import compress_init
    from ultragrid_tpu.types import VideoDesc, VideoFrame

    uy = generate_pattern(W, H, Codec.UYVY, "bars")
    frame = VideoFrame(VideoDesc(W, H, Codec.UYVY, 30.0), [uy])
    comp = compress_init("jpeg:85")
    out = comp.compress(frame)
    assert out.desc.color_spec == Codec.JPEG
    assert bytes(np.asarray(out.data)[:2].tobytes()) == b"\xff\xd8"

    dxtc = compress_init("dxt:DXT5")
    out2 = dxtc.compress(frame)
    assert out2.desc.color_spec == Codec.DXT5
    assert np.asarray(out2.data).size == W * H


def test_dxt_decompress_module():
    from ultragrid_tpu.modules.video_decompress import decompress_init
    from ultragrid_tpu.types import VideoDesc, VideoFrame

    rgb = generate_pattern(W, H, Codec.RGB, "bars")
    enc = np.asarray(dxt.dxt1_encode_rgb(rgb, W))
    frame = VideoFrame(VideoDesc(W, H, Codec.DXT1, 30.0), [enc])
    dec, out_codec = decompress_init(Codec.DXT1, [Codec.RGB, Codec.UYVY])
    assert out_codec == Codec.RGB
    out = dec.decompress(frame, out_codec)
    assert out.data.shape == (H, 3 * W)


def test_jpeg_to_dxt_transcode():
    """JPEG -> DXT1 on device (ref: gpujpeg_to_dxt.cpp role)."""
    from ultragrid_tpu.modules.video_decompress import decompress_init
    from ultragrid_tpu.ops.dxt import dxt1_decode_rgb
    from ultragrid_tpu.types import VideoDesc, VideoFrame

    uy = generate_pattern(W, H, Codec.UYVY, "bars")
    enc = JpegEncoder(W, H, quality=90)
    jpeg = enc.encode(uy)
    frame = VideoFrame(VideoDesc(W, H, Codec.JPEG, 30.0), [jpeg])

    dec, out_codec = decompress_init(Codec.JPEG, [Codec.DXT1])
    assert dec is not None and out_codec == Codec.DXT1
    out = dec.decompress(frame, out_codec)
    assert out.desc.color_spec == Codec.DXT1
    assert np.asarray(out.data).size == W * H // 2  # 8 bytes per 4x4 block

    # decoded DXT should resemble the original bars (lossy x2 but flat colors)
    rgb = np.asarray(dxt1_decode_rgb(out.data.reshape(-1), W, H)).reshape(H, W, 3)
    from ultragrid_tpu.ops.pixfmt import convert_frame

    ref = np.asarray(convert_frame(uy, W, Codec.UYVY, Codec.RGB)).reshape(H, W, 3)
    # compare away from bar edges; tolerance covers the JFIF (BT.601
    # full-range) vs registry (BT.709 limited) colorimetry conventions on
    # top of two lossy codecs
    err = np.abs(rgb[8:-8, 8:88].astype(int) - ref[8:-8, 8:88].astype(int))
    assert err.mean() < 20, err.mean()


def test_jpeg_warm_escalation_no_stall():
    """warm() pre-compiles the escalation width so overflow never recompiles."""
    uy = generate_pattern(W, H, Codec.UYVY, "bars")
    enc = JpegEncoder(W, H, quality=80)
    enc.warm()
    assert set(enc._compiled_cache) == {16, 32}
    data = enc.encode(uy)
    assert bytes(data[:2].tobytes()) == b"\xff\xd8"
    # escalated width runs through the precompiled executable
    enc.wwords = 32
    out = enc._encode(__import__("jax").numpy.asarray(uy))
    assert not bool(out[-1])


def test_scan_decode_mt_matches_serial():
    """Threaded restart-segment decode is bit-identical to the serial path."""
    import ctypes

    from ultragrid_tpu.native import jpeg_scan_decode_lib
    from ultragrid_tpu.ops.jpeg import _parse_headers

    lib = jpeg_scan_decode_lib()
    if lib is None:
        pytest.skip("native helper unavailable")
    uy = generate_pattern(W, H, Codec.UYVY, "gradient")
    enc = JpegEncoder(W, H, quality=85, restart_interval=4)
    jpeg = bytes(enc.encode(uy).tobytes())
    hdr = _parse_headers(jpeg)
    scan = hdr["scan"]
    nmcu = ((W + 15) // 16) * ((H + 7) // 8)
    tables = np.zeros((4, 272), np.uint8)
    for (tc, th), (bits, vals) in hdr["htabs"].items():
        slot = th * 2 + tc
        tables[slot, :16] = np.frombuffer(bits, np.uint8)
        tables[slot, 16 : 16 + len(vals)] = np.frombuffer(vals, np.uint8)
    comp_ntab = np.array([c["td"] for c in scan], np.int32)
    comp_nblocks = np.array([c["h"] * c["v"] for c in scan], np.int32)
    body = np.frombuffer(jpeg[hdr["scan_start"] :], np.uint8)

    results = []
    for nt in (1, 8):
        outs = [np.zeros((nmcu * int(nb), 64), np.int16) for nb in comp_nblocks]
        ptrs = (ctypes.POINTER(ctypes.c_int16) * len(outs))(
            *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for o in outs]
        )
        done = lib.jpeg_scan_decode_mt(
            body.ctypes.data, body.size, tables.ctypes.data,
            len(scan), comp_ntab.ctypes.data, comp_nblocks.ctypes.data,
            nmcu, hdr["ri"], ctypes.cast(ptrs, ctypes.c_void_p), nt,
        )
        assert done == nmcu
        results.append(outs)
    for o1, o8 in zip(*results):
        np.testing.assert_array_equal(o1, o8)


def test_jpeg_420_encode_decodes_everywhere():
    """4:2:0 encode (16x16 MCUs, 4 Y blocks, chroma pair-average folded
    into the mega-matrix): PIL and libavcodec both decode it; luma within
    the usual quality bound; our own parser handles the (2,2) sampling."""
    import io

    import numpy as np

    from ultragrid_tpu.ops.jpeg import JpegEncoder, decode_jpeg
    from ultragrid_tpu.types import Codec

    w, h = 64, 48
    rng = np.random.default_rng(1)
    frame = np.empty((h, 2 * w), np.uint8)
    frame[:, 1::2] = (
        np.linspace(30, 220, w, dtype=np.float32)[None, :]
        + rng.normal(0, 6, (h, w))
    ).clip(0, 255).astype(np.uint8)
    frame[:, 0::2] = 128  # neutral chroma
    enc = JpegEncoder(w, h, quality=85, subsampling="420")
    jpg = bytes(enc.encode(frame))
    assert len(jpg) < frame.nbytes
    # PIL
    from PIL import Image

    im = Image.open(io.BytesIO(jpg))
    im.load()
    y = np.asarray(im.convert("YCbCr"))[:, :, 0].astype(float)
    err = np.abs(y - frame[:, 1::2].astype(float))
    assert err.mean() < 4.5 and err.max() < 40, (err.mean(), err.max())
    # own parser handles (2,2)
    planes, hh, ww, sampling = (lambda t: (t[0], t[1], t[2], t[3]))(decode_jpeg(jpg))
    assert sampling[0] == (2, 2)
    # lavc mjpeg decoder cross-check when available
    try:
        from ultragrid_tpu.modules.lavc import lavc_available, LavcDecompress
        from ultragrid_tpu.types import VideoDesc, VideoFrame

        if lavc_available():
            vf = VideoFrame(VideoDesc(w, h, Codec.JPEG, 30.0),
                            [np.frombuffer(jpg, np.uint8)])
            out = LavcDecompress().decompress(vf, Codec.UYVY)
            assert out is not None
            ly = np.asarray(out.data)[:, 1::2].astype(float)
            assert np.abs(ly - frame[:, 1::2].astype(float)).mean() < 4.5
    except ImportError:
        pass


def test_jpeg_assemble_orientation_tiny_frame():
    """Regression: nblocks < wwords used to trip the row/word-major
    heuristic and emit a scrambled stream."""
    import io

    import numpy as np

    from ultragrid_tpu.ops.jpeg import JpegEncoder

    w, h = 32, 32
    frame = np.zeros((h, 2 * w), np.uint8)
    frame[:, 0::2] = 128
    vals = (np.arange(16).reshape(4, 4) + 1) * 15
    for by in range(4):
        for bx in range(4):
            frame[by * 8 : (by + 1) * 8, 1 + 2 * bx * 8 : 1 + 2 * (bx + 1) * 8 : 2] = vals[by, bx]
    for ss in ("422", "420"):
        jpg = bytes(JpegEncoder(w, h, quality=95, subsampling=ss).encode(frame))
        from PIL import Image

        im = Image.open(io.BytesIO(jpg))
        im.load()
        y = np.asarray(im.convert("YCbCr"))[:, :, 0]
        got = np.array([[y[by * 8 + 4, bx * 8 + 4] for bx in range(4)] for by in range(4)])
        assert np.abs(got.astype(int) - vals).max() <= 2, ss


def test_jpeg_decoder_cache_not_poisoned_across_qualities():
    """One decoder instance decoding a q60 stream must not reuse its
    quant-folded matmul for a later q90 stream of the same geometry
    (regression: 41-mean error on every frame of the second session)."""
    from ultragrid_tpu.ops.jpeg import JpegDecoder, JpegEncoder
    from ultragrid_tpu.utils.pattern import generate_pattern

    w, h = 192, 128
    uy = generate_pattern(w, h, Codec.UYVY, "bars")
    dec = JpegDecoder()
    for q in (60, 90, 60):
        enc = JpegEncoder(w, h, quality=q)
        stream = bytes(enc.encode(uy).tobytes())
        out, oh, ow = dec.decode_to_uyvy(stream)
        err = np.abs(np.asarray(out).astype(int) - uy.astype(int)).mean()
        assert err < 4.0, f"q{q} decode err {err}"
