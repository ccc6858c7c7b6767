"""Conformance gates for the C H.264 decoder (native/h264_entropy.c).

The native decoder must be SAMPLE-EXACT with the Python reference decoder
(ops/h264_dec.py + ops/h264_cabac.py) on every in-envelope stream — the
Python decoder is itself pinned sample-exact to libavcodec by
tests/test_h264.py / test_h264_cabac.py, so transitivity pins the C
decoder to libavcodec too (and the matrix here re-checks lavc directly).

Ref role: the decode half of src/video_decompress/libavcodec.c.
"""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern


def _fast():
    from ultragrid_tpu.ops.h264_fast import FastStreamDecoder, fast_available

    if not fast_available():
        pytest.skip("native H.264 decoder unavailable")
    return FastStreamDecoder


def _lavc():
    from ultragrid_tpu.modules.lavc import LavcCompress, lavc_available

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    return LavcCompress


def _test_frames(w=176, h=144, n=6):
    rng = np.random.default_rng(1)
    base = np.asarray(generate_pattern(w, h, Codec.UYVY, "bars"))
    frames = []
    for i in range(n):
        f = np.roll(base, i * 4, axis=1).copy()
        f[2:10, 2:40] = rng.integers(0, 255, (8, 38), np.uint8)
        frames.append(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
    return frames


def _encode(spec, frames):
    LavcCompress = _lavc()
    enc = LavcCompress(spec)
    out = []
    for f in frames:
        c = enc.compress(f)
        if c is not None:
            out.append(bytes(np.asarray(c.data)))
    enc.done()
    return out


def _assert_exact_vs_python(aus, tag):
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    Fast = _fast()
    pd = StreamDecoder()
    fd = Fast()
    for i, au in enumerate(aus):
        py = pd.decode_au(au)
        cc = fd.decode_au(au)
        assert (py is None) == (cc is None), (
            f"{tag} frame {i}: reorder priming disagrees "
            f"(python {py is None}, C {cc is None})")
        if py is None:
            continue
        for name, a, b in zip(("y", "cb", "cr"), py, cc):
            assert np.array_equal(a, b), (
                f"{tag} frame {i} {name}: C decoder diverges from Python "
                f"(max diff {np.abs(a.astype(int) - b.astype(int)).max()})")
    pt = pd.flush()
    ct = fd.flush()
    assert len(pt) == len(ct), f"{tag}: flush count differs"
    for i, (py, cc) in enumerate(zip(pt, ct)):
        for name, a, b in zip(("y", "cb", "cr"), py, cc):
            assert np.array_equal(a, b), f"{tag} flush {i} {name}" 


def test_fast_decoder_own_encoder_streams():
    """Own-encoder output (I_16x16, I_4x4, inter GOP) decodes identically
    in C and Python."""
    from ultragrid_tpu.ops.h264 import Intra16EncoderV

    Fast = _fast()
    rng = np.random.default_rng(0)
    w, h = 128, 96
    for qp in (12, 28, 40):
        y = rng.integers(16, 236, (h, w), np.uint8)
        cb = rng.integers(16, 240, (h // 2, w // 2), np.uint8)
        cr = rng.integers(16, 240, (h // 2, w // 2), np.uint8)
        bs = Intra16EncoderV(w, h, qp=qp).encode_planes(y, cb, cr)
        _assert_exact_vs_python([bs], f"own-i16 qp{qp}")
    # inter GOP from the own encoder
    from ultragrid_tpu.ops.h264 import InterEncoder

    enc = InterEncoder(w, h, qp=28, gop=4, search=4)
    from ultragrid_tpu.ops.h264_dec import StreamDecoder
    from ultragrid_tpu.ops.h264_fast import FastStreamDecoder

    pd, fd = StreamDecoder(), FastStreamDecoder()
    base = rng.integers(16, 236, (h, w), np.uint8)
    for i in range(5):
        y = np.roll(base, i * 2, axis=1)
        cb = rng.integers(16, 240, (h // 2, w // 2), np.uint8)
        bs = enc.encode_planes(y, cb, cb)
        py = pd.decode_au(bs)
        cc = fd.decode_au(bs)
        for name, a, b in zip(("y", "cb", "cr"), py, cc):
            assert np.array_equal(a, b), f"own-inter frame {i} {name}"


@pytest.mark.parametrize("tag,spec", [
    ("cavlc-intra-deblock",
     "codec=H.264:encoder=libx264:profile=baseline:qp=26:g=1:aq-mode=0"),
    ("cavlc-intra-lowqp",
     "codec=H.264:encoder=libx264:profile=baseline:qp=12:g=1:aq-mode=0"),
    ("cavlc-gop-multiref",
     "codec=H.264:encoder=libx264:profile=baseline:qp=28:g=6:aq-mode=0:"
     "refs=3:x264opts=partitions=p8x8"),
    ("cabac-intra",
     "codec=H.264:encoder=libx264:profile=main:qp=26:g=1:aq-mode=0"),
    ("cabac-gop",
     "codec=H.264:encoder=libx264:profile=main:qp=30:g=6:aq-mode=0:"
     "x264opts=bframes=0:weightp=0"),
    ("cabac-high-multiref",
     "codec=H.264:encoder=libx264:profile=high:qp=28:g=6:aq-mode=0:"
     "x264opts=bframes=0:weightp=0:ref=3"),
    ("cavlc-high-8x8",
     "codec=H.264:encoder=libx264:profile=high:qp=24:g=6:aq-mode=0:"
     "x264opts=bframes=0:weightp=0:coder=0"),
    ("cabac-high-8x8-dense",
     "codec=H.264:encoder=libx264:profile=high:qp=20:g=6:aq-mode=0:"
     "x264opts=bframes=0:weightp=0"),
    ("cavlc-weightp2",
     "codec=H.264:encoder=libx264:profile=high:qp=24:g=6:aq-mode=0:"
     "bf=0:coder=0:weightp=2"),
    ("cabac-weightp2-mr",
     "codec=H.264:encoder=libx264:profile=high:qp=24:g=6:aq-mode=0:"
     "bf=0:weightp=2:ref=3"),
    ("cavlc-b3-pyramid",
     "codec=H.264:encoder=libx264:profile=high:qp=26:g=12:aq-mode=0:"
     "coder=0:bf=3"),
    ("cabac-b3-pyramid",
     "codec=H.264:encoder=libx264:profile=high:qp=26:g=12:aq-mode=0:"
     "bf=3"),
    ("cabac-b2-nopyr-mr",
     "codec=H.264:encoder=libx264:profile=high:qp=24:g=12:aq-mode=0:"
     "bf=2:ref=3:x264opts=b-pyramid=none"),
])
def test_fast_decoder_foreign_matrix(tag, spec):
    """libx264 streams across the supported envelope decode identically
    in the C and Python decoders, and sample-exact vs libavcodec (both
    sides compared in DISPLAY order — B streams reorder)."""
    from ultragrid_tpu.modules.lavc import LavcDecompress

    aus = _encode(spec, _test_frames(n=12))
    _assert_exact_vs_python(aus, tag)
    Fast = _fast()
    fd = Fast()
    rd = LavcDecompress()
    ours, refs = [], []
    for au in aus:
        got = fd.decode_au(au)
        if got is not None:
            ours.append(got)
        ref = rd.decompress(
            VideoFrame(VideoDesc(176, 144, Codec.H264, 30.0),
                       [np.frombuffer(au, np.uint8)]), Codec.UYVY)
        if ref is not None:
            refs.append(np.asarray(ref.data).copy())
    ours.extend(fd.flush())
    n = min(len(ours), len(refs))
    assert n >= len(aus) - 4, f"{tag}: only {n} comparable frames"
    for i in range(n):
        y, cb, cr = ours[i]
        uy = refs[i]
        assert np.array_equal(uy[:, 1::2], y), f"{tag} frame {i}: luma"
        assert np.array_equal(uy[0::2, 0::4], cb), f"{tag} frame {i}: cb"
        assert np.array_equal(uy[0::2, 2::4], cr), f"{tag} frame {i}: cr"
    rd.done()


@pytest.mark.parametrize("tag,spec", [
    ("temporal-direct", "codec=H.264:encoder=libx264:profile=main:qp=28:"
                        "g=6:aq-mode=0:bf=2:x264opts=direct=temporal"),
    ("scaling-lists", "codec=H.264:encoder=libx264:profile=high:qp=28:g=6:"
                      "aq-mode=0:bf=0:weightp=0:x264opts=cqm=jvt"),
    ("interlace", "codec=H.264:encoder=libx264:profile=high:qp=28:g=6:"
                  "aq-mode=0:bf=0:weightp=0:x264opts=tff=1"),
])
def test_fast_decoder_unsupported_raises(tag, spec):
    """Out-of-envelope features raise UnsupportedStream cleanly (so the
    driver can delegate to lavc), never garbage or a crash."""
    from ultragrid_tpu.ops.h264_dec import UnsupportedStream

    Fast = _fast()
    # enough frames that the B-frame lookahead actually flushes B AUs
    # (weighted P no longer raises before the first B NAL appears)
    aus = _encode(spec, _test_frames(n=10))
    fd = Fast()
    with pytest.raises(UnsupportedStream):
        for au in aus:
            fd.decode_au(au)


def test_decompress_driver_prefers_own_and_delegates():
    """The driver now selects the own decoder for H.264->UYVY; feeding it
    an out-of-envelope stream transparently hands the session to lavc."""
    from ultragrid_tpu.modules.video_decompress import (
        OwnH264Decompress, decompress_init)

    _fast()
    dec, out = decompress_init(Codec.H264, [Codec.UYVY])
    assert isinstance(dec, OwnH264Decompress)
    assert out == Codec.UYVY
    # out-of-envelope stream (temporal direct — B frames themselves now
    # decode natively): the module must still decode via its internal
    # lavc takeover rather than returning None forever
    aus = _encode(
        "codec=H.264:encoder=libx264:profile=main:qp=28:g=6:aq-mode=0:"
        "bf=2:x264opts=direct=temporal", _test_frames(n=12))
    got = 0
    for au in aus:
        frame = VideoFrame(VideoDesc(176, 144, Codec.H264, 30.0),
                           [np.frombuffer(au, np.uint8)])
        out_frame = dec.decompress(frame, Codec.UYVY)
        if out_frame is not None:
            got += 1
            assert out_frame.desc.color_spec == Codec.UYVY
    assert got >= 3, "lavc takeover did not produce frames"
    assert dec._delegate is not None


def test_fast_decoder_realtime_floor_1080p():
    """Throughput guard: the C decoder must beat the Python decoder by a
    wide margin (the real numbers live in PERF.md; this is a structural
    regression guard, load-tolerant)."""
    import time

    Fast = _fast()
    aus = _encode(
        "codec=H.264:encoder=libx264:profile=main:qp=28:g=30:aq-mode=0:"
        "x264opts=bframes=0:weightp=0",
        _test_frames(w=640, h=360, n=10))
    fd = Fast()
    fd.decode_au(aus[0])
    t0 = time.perf_counter()
    for au in aus:
        fd.decode_au(au)
    dt = time.perf_counter() - t0
    # 360p CABAC measured ~2 ms/frame uncontended; 50 ms is a 25x margin
    assert dt / len(aus) < 0.050, f"{dt / len(aus) * 1e3:.1f} ms/frame at 360p"
