"""Rate control for the own codec paths (utils/ratectl.py).

The reference only reaches bitrate-targeted video through libavcodec
(src/video_compress/libavcodec.cpp:943-1003); these tests pin the
equivalent closed loops on the from-scratch JPEG and H.264 encoders:
sustained rate within +/-10% of the target on variable content, driven
purely by measured frame sizes.
"""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern
from ultragrid_tpu.utils.ratectl import (GopRateController,
                                         LadderRateController, parse_rate)

W, H, FPS = 160, 128, 30.0


def _frames(n):
    """Variable content: moving bars + a noise patch whose area breathes."""
    rng = np.random.default_rng(7)
    base = np.asarray(generate_pattern(W, H, Codec.UYVY, "bars"))
    out = []
    for i in range(n):
        f = np.roll(base, i * 6, axis=1).copy()
        hh = 16 + 20 * (i % 3)  # breathing complexity
        f[8:8 + hh, 20:100] = rng.integers(0, 255, (hh, 80), np.uint8)
        out.append(f)
    return out


def test_parse_rate():
    assert parse_rate("800k") == 800_000
    assert parse_rate("1.5M") == 1_500_000
    assert parse_rate("2G") == 2_000_000_000
    with pytest.raises(ValueError):
        parse_rate("-3k")


def test_ladder_controller_converges_on_model():
    """Synthetic monotone size model: long-run average lands on target."""
    ladder = list(range(10, 100, 5))
    size = {q: 1000 + 60 * q for q in ladder}  # bytes at quality q
    target_bps = int(4200 * 8 * FPS)  # sits between two rungs
    rc = LadderRateController(target_bps, FPS, ladder, start=90)
    total, n = 0, 240
    for _ in range(n):
        b = size[rc.value]
        total += b
        rc.update(b)
    avg_bps = total * 8 * FPS / n
    assert abs(avg_bps - target_bps) / target_bps < 0.10


def test_gop_controller_adapts_direction():
    rc = GopRateController(600_000, FPS, gop=6, qp0=20)
    # oversized GOPs must push QP up, undersized pull it down
    for i in range(18):
        rc.frame(10_000, gop_done=(i % 6 == 5))
    assert rc.qp > 20
    qp_hi = rc.qp
    for i in range(18):
        rc.frame(500, gop_done=(i % 6 == 5))
    assert rc.qp < qp_hi


def test_jpeg_rate_control_e2e():
    """-c jpeg:rate=1.2M sustains the target within +/-10%."""
    from ultragrid_tpu.modules.video_compress import JpegCompress

    target = 1_200_000
    mod = JpegCompress(f"90:0:422:rate={target}")
    desc = VideoDesc(W, H, Codec.UYVY, FPS)
    sizes = []
    for f in _frames(90):
        out = mod.compress(VideoFrame(desc, [f]))
        sizes.append(int(np.asarray(out.data).size))
    tail = sizes[20:]  # after convergence
    bps = np.mean(tail) * 8 * FPS
    assert abs(bps - target) / target < 0.10, \
        f"sustained {bps/1e6:.2f} Mbps vs target {target/1e6:.2f}"
    # and the controller actually moved off the start quality
    assert mod._rc is not None and mod._rc.value != 90


def test_h264_inter_rate_control_e2e():
    """-c h264:mode=inter:rate=600k adapts QP per GOP to the budget."""
    from ultragrid_tpu.modules.video_compress import H264Compress

    target = 600_000
    mod = H264Compress(f"mode=inter:qp=20:gop=6:rate={target}")
    desc = VideoDesc(W, H, Codec.UYVY, FPS)
    sizes = []
    for f in _frames(60):
        out = mod.compress(VideoFrame(desc, [f]))
        sizes.append(int(np.asarray(out.data).size))
    tail = sizes[24:]  # after >= 4 GOPs of adaptation
    bps = np.mean(tail) * 8 * FPS
    assert abs(bps - target) / target < 0.10, \
        f"sustained {bps/1e6:.2f} Mbps vs target {target/1e6:.2f}"
    assert mod.qp != 20  # adapted away from the start QP


def test_h264_rate_controlled_stream_decodes():
    """QP swaps at GOP boundaries keep the stream decodable end to end
    (fresh IDR per swap — verified by the own decoder)."""
    from ultragrid_tpu.modules.video_compress import H264Compress
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    mod = H264Compress("mode=inter:qp=20:gop=6:rate=600k")
    desc = VideoDesc(W, H, Codec.UYVY, FPS)
    dec = StreamDecoder()
    shown = 0
    for f in _frames(18):
        out = mod.compress(VideoFrame(desc, [f]))
        y, cb, cr = dec.decode_au(bytes(np.asarray(out.data)))
        assert y.shape == (H, W)
        shown += 1
    assert shown == 18
