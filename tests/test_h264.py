"""Own H.264 encoder conformance tests (decoded by libavcodec)."""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def _lavc_decode(bs: bytes, w: int, h: int):
    from ultragrid_tpu.modules.lavc import LavcDecompress

    dec = LavcDecompress()
    vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0), [np.frombuffer(bs, np.uint8)])
    out = dec.decompress(vf, Codec.UYVY)
    if out is None:
        pytest.skip("no H.264 decoder available")
    return np.asarray(out.data)[:h, : 2 * w]


def test_pcm_encoder_lossless_roundtrip():
    from ultragrid_tpu.ops.h264 import PcmEncoder, uyvy_to_i420

    w, h = 64, 48
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = PcmEncoder(w, h).encode_uyvy(frame)
    got = _lavc_decode(bs, w, h)
    y0, cb0, cr0 = uyvy_to_i420(frame, w, h)
    assert (got[:, 1::2] == y0).all()
    gcb = got[:, 0::4].astype(np.uint16)
    gcr = got[:, 2::4].astype(np.uint16)
    gcb = ((gcb[0::2] + gcb[1::2] + 1) >> 1).astype(np.uint8)
    gcr = ((gcr[0::2] + gcr[1::2] + 1) >> 1).astype(np.uint8)
    assert (gcb == cb0).all() and (gcr == cr0).all()


def test_pcm_encoder_nonaligned_size_crops():
    from ultragrid_tpu.ops.h264 import PcmEncoder

    w, h = 50, 38  # non-multiple-of-16 -> SPS cropping
    frame = np.random.default_rng(5).integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = PcmEncoder(w, h).encode_uyvy(frame)
    got = _lavc_decode(bs, w, h)
    assert got.shape == (h, 2 * w)


def test_exp_golomb_writer():
    from ultragrid_tpu.ops.h264 import BitWriter

    w = BitWriter()
    for v, bits in ((0, "1"), (1, "010"), (2, "011"), (3, "00100"), (7, "0001000")):
        w2 = BitWriter()
        w2.ue(v)
        w2.u(1, 1)
        w2.byte_align_zero()
        got = "".join(f"{b:08b}" for b in w2.rbsp())
        assert got.startswith(bits), (v, got, bits)
    w.se(0); w.se(1); w.se(-1); w.se(2)
    w.rbsp_trailing()
