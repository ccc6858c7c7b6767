"""CAVLC -> CABAC entropy transcode (ops/h264_transcode.py +
native/h264_entropy.c h264fast_transcode_slice).

Gates: the transcoded stream must decode SAMPLE-EXACT to the CAVLC
original through (a) the own Python CABAC decoder, (b) the C fast
decoder, and (c) libavcodec — and it must be smaller.

Reference role: the entropy-backend choice of
/root/reference/src/video_compress/libavcodec.cpp (libx264 cabac flag).
"""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def _transcoder():
    from ultragrid_tpu.ops.h264_transcode import (Transcoder,
                                                  transcode_available)

    if not transcode_available():
        pytest.skip("native transcoder unavailable")
    return Transcoder()


def _content(w, h, seed=2):
    rng = np.random.default_rng(seed)
    base = ((rng.integers(16, 235, (h, w), np.int32)
             + np.linspace(0, 200, w, dtype=np.int32)[None, :]) // 2)
    y = base.clip(0, 255).astype(np.uint8)
    cb = np.tile(np.linspace(90, 150, w // 2, dtype=np.uint8), (h // 2, 1))
    cr = np.full((h // 2, w // 2), 130, np.uint8)
    return y, cb, cr


def _own_decode_all(bs):
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    return list(StreamDecoder().decode_stream(bs))


def _lavc_decode_uyvy(dec, au, w, h):
    out = dec.decompress(
        VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                   [np.frombuffer(au, np.uint8)]), Codec.UYVY)
    if out is None:
        pytest.skip("no lavc H.264 decoder")
    return np.asarray(out.data)


def _assert_frames_equal(fa, fb, tag):
    for a, b, nm in zip(fa, fb, ("y", "cb", "cr")):
        assert np.array_equal(a, b), \
            f"{tag} {nm}: max diff {np.abs(a.astype(int) - b.astype(int)).max()}"


@pytest.mark.parametrize("mode,qp", [("i16", 24), ("i16", 32), ("i4", 28)])
def test_intra_transcode_sample_exact_and_smaller(mode, qp):
    from ultragrid_tpu.ops import h264 as H

    tc = _transcoder()
    w, h = 96, 64
    y, cb, cr = _content(w, h)
    if mode == "i4":
        enc = H.Intra4x4Encoder(w, h, qp=qp)
    else:
        enc = H.Intra16Encoder(w, h, qp=qp)
    au = enc.encode_planes(y, cb, cr)
    au2 = tc.transcode_au(au)
    assert len(au2) < len(au), (len(au2), len(au))
    f1 = _own_decode_all(au)
    f2 = _own_decode_all(au2)
    assert len(f1) == len(f2) == 1
    _assert_frames_equal(f1[0], f2[0], f"{mode} qp{qp}")


def test_gop_transcode_sample_exact_own_and_fast():
    """IDR + P frames (P_L0_16x16, P_Skip runs, 16x8/8x16 from the
    vectorized encoder are absent but skip runs and dense MVs are not);
    decode through the Python CABAC decoder and the C fast decoder."""
    from ultragrid_tpu.ops import h264 as H

    tc = _transcoder()
    w, h = 96, 64
    y, cb, cr = _content(w, h)
    enc = H.InterEncoder(w, h, qp=28, gop=5, search=4)
    aus = [enc.encode_planes(np.roll(y, 2 * i, axis=1), cb, cr)
           for i in range(7)]
    aus2 = [tc.transcode_au(a) for a in aus]
    assert sum(map(len, aus2)) < sum(map(len, aus))
    f1 = _own_decode_all(b"".join(aus))
    f2 = _own_decode_all(b"".join(aus2))
    assert len(f1) == len(f2) == 7
    for i, (fa, fb) in enumerate(zip(f1, f2)):
        _assert_frames_equal(fa, fb, f"frame {i}")
    # C fast decoder accepts the CABAC product too
    from ultragrid_tpu.ops.h264_fast import FastStreamDecoder, fast_available

    if fast_available():
        fd = FastStreamDecoder()
        f3 = fd.decode_stream(b"".join(aus2))
        assert len(f3) == 7
        for i, (fa, fc) in enumerate(zip(f1, f3)):
            _assert_frames_equal(fa, fc, f"fast frame {i}")


def test_transcode_lavc_conformance():
    """libavcodec must accept and decode the CABAC output identically —
    the external-conformance gate."""
    from ultragrid_tpu.modules.lavc import LavcDecompress, lavc_available
    from ultragrid_tpu.ops import h264 as H

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    tc = _transcoder()
    w, h = 96, 64
    y, cb, cr = _content(w, h, seed=5)
    enc = H.InterEncoder(w, h, qp=26, gop=4, search=4)
    d1, d2 = LavcDecompress(), LavcDecompress()
    for i in range(6):
        au = enc.encode_planes(np.roll(y, 3 * i, axis=0), cb, cr)
        au2 = tc.transcode_au(au)
        ya = _lavc_decode_uyvy(d1, au, w, h)
        yb = _lavc_decode_uyvy(d2, au2, w, h)
        assert np.array_equal(ya, yb), f"frame {i}"


def test_compress_module_entropy_cabac():
    """-c h264:entropy=cabac end-to-end through the compress module; the
    product decodes through the standard decompress path."""
    from ultragrid_tpu.modules.video_compress import H264Compress

    w, h = 96, 64
    y, cb, cr = _content(w, h, seed=7)
    uyvy = np.empty((h, 2 * w), np.uint8)
    uyvy[:, 1::2] = y
    uyvy[:, 0::4] = np.repeat(cb[: h // 2], 2, axis=0)[:h]
    uyvy[:, 2::4] = np.repeat(cr[: h // 2], 2, axis=0)[:h]
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)

    comp_cavlc = H264Compress("qp=28:mode=inter:gop=4:search=4")
    comp_cabac = H264Compress("qp=28:mode=inter:gop=4:search=4:entropy=cabac")
    n1 = n2 = 0
    au2_all = []
    for i in range(5):
        f = VideoFrame(desc, [np.roll(uyvy, 4 * i, axis=1)])
        o1 = comp_cavlc.compress(f)
        o2 = comp_cabac.compress(f)
        n1 += np.asarray(o1.data).size
        n2 += np.asarray(o2.data).size
        au2_all.append(np.asarray(o2.data).tobytes())
    assert n2 < n1, (n2, n1)
    frames = _own_decode_all(b"".join(au2_all))
    assert len(frames) == 5
