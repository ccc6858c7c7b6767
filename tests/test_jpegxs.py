"""JPEG XS-architecture codec: DWT reversibility, entropy round trip,
module e2e (ref role: src/video_compress/jpegxs.cpp + src/jpegxs/ —
SVT-JPEG-XS SDK wrapper; ours is a from-scratch 5/3-DWT implementation,
conformance statement in ops/jpegxs.py)."""

import numpy as np

from ultragrid_tpu.ops.jpegxs import JpegXsCodec, dwt53_forward, dwt53_inverse
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern


def test_dwt53_perfect_reconstruction():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for nlx, nly in [(1, 0), (3, 0), (3, 1), (5, 1)]:
        w = 32 * (1 << max(0, nlx - 5))
        plane = rng.integers(-512, 512, (16, 64), dtype=np.int64).astype(np.int32)
        bands = dwt53_forward(jnp.asarray(plane), nlx, nly)
        rec = np.asarray(dwt53_inverse(bands, nlx, nly))
        assert np.array_equal(rec, plane), f"nlx={nlx} nly={nly}"


def test_lossless_round_trip_multi_component():
    rng = np.random.default_rng(1)
    planes = [
        rng.integers(0, 256, (48, 64), dtype=np.int64).astype(np.int32),
        rng.integers(0, 256, (48, 32), dtype=np.int64).astype(np.int32),
        rng.integers(0, 256, (48, 32), dtype=np.int64).astype(np.int32),
    ]
    cod = JpegXsCodec(nlx=3, nly=1, quality=100)
    stream = cod.encode_planes(planes)
    out = JpegXsCodec().decode_planes(stream)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)


def test_lossy_bounded_error_and_compression():
    # smooth content compresses well; error bounded by the truncation
    x = np.indices((64, 96)).sum(axis=0)
    plane = ((x * 2) % 256).astype(np.int32)
    cod = JpegXsCodec(nlx=3, nly=1, quality=70)
    stream = cod.encode_planes([plane])
    out = JpegXsCodec().decode_planes(stream)[0]
    assert len(stream) < plane.size // 2  # >2x on smooth content
    assert np.abs(out - plane).max() <= 32  # few truncated planes


def test_module_e2e_uyvy():
    from ultragrid_tpu.modules.video_compress import compress_init
    from ultragrid_tpu.modules.video_decompress import decompress_init

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    frame = VideoFrame(desc, [generate_pattern(w, h, Codec.UYVY, "bars")])
    comp = compress_init("jpegxs:100").compress(frame)
    assert comp is not None and comp.desc.color_spec == Codec.JPEG_XS
    d, out_codec = decompress_init(Codec.JPEG_XS, [Codec.UYVY])
    assert d is not None and out_codec == Codec.UYVY
    rec = d.decompress(comp, out_codec)
    assert np.array_equal(np.asarray(rec.data), np.asarray(frame.data))

    # lossy: close but smaller
    comp2 = compress_init("jpegxs:80").compress(frame)
    rec2 = decompress_init(Codec.JPEG_XS, [Codec.UYVY])[0].decompress(comp2, Codec.UYVY)
    assert comp2.data.size < comp.data.size
    assert np.abs(rec2.data.astype(int) - frame.data.astype(int)).max() <= 16


GOLDEN = None


def test_golden_vector_stability():
    """The stream for a fixed input must stay byte-stable across rounds
    (decoders in the field depend on it)."""
    import hashlib

    plane = (np.arange(32 * 48, dtype=np.int64).reshape(32, 48) % 251).astype(np.int32)
    stream = JpegXsCodec(nlx=3, nly=1, quality=90).encode_planes([plane])
    digest = hashlib.sha256(stream).hexdigest()
    out = JpegXsCodec().decode_planes(stream)[0]
    assert np.abs(out - plane).max() <= 4
    # pin the golden digest: update ONLY with a format version bump
    assert digest == GOLDEN_DIGEST, f"stream format changed: {digest}"


GOLDEN_DIGEST = "20621eebdd37a4bb2b2d684f181ea0440a63541f3fd0d5412e8db1c3b1cc1d55"


def test_jpegxs_e2e_over_rtp():
    """-c jpegxs travels the native RTP path as an opaque codec and the
    receiver decompresses it for display (full loop like -c jpeg)."""
    import threading
    import time

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 25900
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
        compress_spec="jpegxs:100", tx_port=port, rx_port=0, frame_limit=6,
    )
    sender.run()
    t.join(timeout=30)
    assert displayed, "no jpegxs frame displayed"
    # lossless: the displayed frame equals the testcard exactly
    expected = generate_pattern(128, 64, Codec.UYVY, "bars")
    best = min(int(np.abs(np.asarray(f.data).astype(int) - expected.astype(int)).max())
               for f in displayed if f.desc.color_spec == Codec.UYVY)
    assert best == 0
