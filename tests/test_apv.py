"""APV-architecture codec: transform/Rice round trips, tile invariance,
module e2e, RTP e2e (ref role: src/video_compress/openapv.cpp +
src/video_decompress/openapv.cpp — liboapv wrappers; ours is a
from-scratch tile/DCT/Rice codec, conformance statement in ops/apv.py)."""

import numpy as np
import pytest

from ultragrid_tpu.ops.apv import (
    ApvCodec,
    _BitReader,
    _BitWriter,
    _rice_decode_vec,
    _rice_k,
    _rice_put,
)
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern


def test_rice_vec_round_trip_fuzz():
    """Vector Rice encode and the pointer-doubling decode are inverses."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        k = int(rng.integers(0, 12))
        n = int(rng.integers(1, 5000))
        # keep q <= 40 like the encoder's _rice_k cap guarantees
        vals = rng.integers(0, 40 << k if k else 40, n, dtype=np.int64)
        bw = _BitWriter()
        _rice_put(bw, vals, k)
        tail = rng.integers(0, 2, 13)  # stream continues after the plane
        bw.put_bits_vec(tail, np.ones(13, np.int64))
        br = _BitReader(bw.tobytes())
        got = _rice_decode_vec(br, n, k)
        assert np.array_equal(got, vals), f"trial {trial} k={k}"
        assert np.array_equal(br.take(np.ones(13, np.int64)).astype(np.int64), tail)


def test_rice_k_respects_unary_cap():
    vals = np.array([0, 1, 2, 1 << 16], np.int64)
    k = _rice_k(vals)
    assert (int(vals.max()) >> k) <= 40


def test_near_lossless_qp0_422():
    rng = np.random.default_rng(1)
    h, w = 120, 200
    y = (np.indices((h, w)).sum(0) * 7 % 1024).astype(np.int32)
    cb = rng.integers(300, 700, (h, w // 2)).astype(np.int32)
    cr = rng.integers(300, 700, (h, w // 2)).astype(np.int32)
    stream = ApvCodec(qp=0).encode_planes([y, cb, cr])
    out = ApvCodec().decode_planes(stream)
    for a, b in zip((y, cb, cr), out):
        assert np.abs(a - b).max() <= 1


def test_lossy_bounded_error_and_compression():
    h, w = 128, 256
    y = ((np.indices((h, w)).sum(0) * 3) % 1024).astype(np.int32)
    stream = ApvCodec(qp=24).encode_planes([y])
    out = ApvCodec().decode_planes(stream)[0]
    assert len(stream) < y.size * 2 // 4  # >4x vs 16-bit container on smooth content
    # max error bounded by a few quantizer steps (step ~10 at qp 24)
    assert np.abs(out - y).max() <= 40


def test_odd_sizes_400():
    rng = np.random.default_rng(5)
    p = rng.integers(0, 1024, (37, 53)).astype(np.int32)
    out = ApvCodec(qp=0).decode_planes(ApvCodec(qp=0).encode_planes([p]))[0]
    assert out.shape == p.shape
    assert np.abs(out - p).max() <= 1


def test_444_profile():
    rng = np.random.default_rng(7)
    planes = [rng.integers(0, 1024, (64, 80)).astype(np.int32) for _ in range(3)]
    out = ApvCodec(qp=12).decode_planes(ApvCodec(qp=12).encode_planes(planes))
    for a, b in zip(planes, out):
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 16


def test_tile_grid_invariance():
    """Tiling only partitions the entropy layer: reconstruction must be
    IDENTICAL for any tile grid (APV's independent-tile property)."""
    h, w = 160, 640
    y = ((np.indices((h, w)).sum(0) * 3) % 1024).astype(np.int32)
    cb = (y[:, ::2] // 2 + 100).astype(np.int32)
    cr = (y[:, 1::2] // 3 + 200).astype(np.int32)
    tiled = ApvCodec(qp=20, tile_w=256, tile_h=96).encode_planes([y, cb, cr])
    single = ApvCodec(qp=20, tile_w=1 << 20, tile_h=1 << 20).encode_planes([y, cb, cr])
    ot = ApvCodec().decode_planes(tiled)
    os_ = ApvCodec().decode_planes(single)
    assert tiled[16:18] != single[16:18]  # grids actually differ (ntc field)
    for a, b in zip(ot, os_):
        assert np.array_equal(a, b)


def test_module_e2e_uyvy():
    from ultragrid_tpu.modules.video_compress import compress_init
    from ultragrid_tpu.modules.video_decompress import decompress_init

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    frame = VideoFrame(desc, [generate_pattern(w, h, Codec.UYVY, "bars")])
    comp = compress_init("openapv:qp=0").compress(frame)
    assert comp is not None and comp.desc.color_spec == Codec.APV
    d, out_codec = decompress_init(Codec.APV, [Codec.UYVY])
    assert d is not None and out_codec == Codec.UYVY
    rec = d.decompress(comp, out_codec)
    err = np.abs(np.asarray(rec.data).astype(int) - np.asarray(frame.data).astype(int))
    assert err.max() <= 1  # qp 0 on 10-bit planes -> at most the 8-bit LSB

    # lossier qp: smaller stream, bounded error
    comp2 = compress_init("apv:36").compress(frame)
    assert comp2.data.size < comp.data.size
    rec2 = decompress_init(Codec.APV, [Codec.UYVY])[0].decompress(comp2, Codec.UYVY)
    err2 = np.abs(np.asarray(rec2.data).astype(int) - np.asarray(frame.data).astype(int))
    assert err2.max() <= 24


def test_golden_vector_stability():
    """The stream for a fixed input must stay byte-stable across rounds."""
    import hashlib

    plane = (np.arange(48 * 64, dtype=np.int64).reshape(48, 64) * 13 % 1021).astype(
        np.int32
    )
    stream = ApvCodec(qp=18).encode_planes([plane])
    out = ApvCodec().decode_planes(stream)[0]
    assert np.abs(out - plane).max() <= 16
    digest = hashlib.sha256(stream).hexdigest()
    # pin the golden digest: update ONLY with a format version bump
    assert digest == GOLDEN_DIGEST, f"stream format changed: {digest}"


GOLDEN_DIGEST = "9e62674295f42d8f4b784b1af9331b7301be2e40fca22141e3db08bb1391f8c0"


def test_apv_e2e_over_rtp():
    """-c openapv travels the native RTP path as an opaque codec and the
    receiver decompresses it for display (full loop like -c jpegxs)."""
    import threading
    import time

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 25902
    displayed = []
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=2, timeout=60.0)
    orig_put = recv.display.put_frame

    def spy(frame, blocking=True):
        if frame is not None:
            displayed.append(frame)
        orig_put(frame, blocking)

    recv.display.put_frame = spy
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    time.sleep(0.2)
    sender = VideoSender(
        "testcard:s=128x64:f=10:c=UYVY:still=1", "127.0.0.1",
        compress_spec="openapv:qp=0", tx_port=port, rx_port=0, frame_limit=6,
    )
    sender.run()
    t.join(timeout=30)
    assert displayed, "no apv frame displayed"
    expected = generate_pattern(128, 64, Codec.UYVY, "bars")
    best = min(int(np.abs(np.asarray(f.data).astype(int) - expected.astype(int)).max())
               for f in displayed if f.desc.color_spec == Codec.UYVY)
    assert best <= 1
