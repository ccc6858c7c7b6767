"""CineForm/VC-5-architecture codec: 2/6 DWT reversibility, entropy round
trip, module e2e (ref role: src/video_compress/cineform.cpp — CineForm SDK
wrapper; ours is a from-scratch 2/6-DWT codec, conformance statement in
ops/cineform.py)."""

import numpy as np

from ultragrid_tpu.ops.cineform import CineformCodec, dwt26_forward, dwt26_inverse
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern


def test_dwt26_perfect_reconstruction():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for levels in [1, 2, 3]:
        plane = rng.integers(-2048, 2048, (32, 64), dtype=np.int64).astype(np.int32)
        bands = dwt26_forward(jnp.asarray(plane), levels)
        rec = np.asarray(dwt26_inverse(bands, levels))
        assert np.array_equal(rec, plane), f"levels={levels}"


def test_lossless_round_trip_multi_component():
    rng = np.random.default_rng(1)
    planes = [
        rng.integers(0, 256, (48, 64), dtype=np.int64).astype(np.int32),
        rng.integers(0, 256, (48, 32), dtype=np.int64).astype(np.int32),
        rng.integers(0, 256, (48, 32), dtype=np.int64).astype(np.int32),
    ]
    cod = CineformCodec(levels=3, quality=100)
    stream = cod.encode_planes(planes)
    out = CineformCodec().decode_planes(stream)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)


def test_odd_sizes_lossless():
    """Non-multiple-of-2^levels geometry is edge-padded and cropped back."""
    rng = np.random.default_rng(5)
    plane = rng.integers(0, 256, (37, 53), dtype=np.int64).astype(np.int32)
    stream = CineformCodec(levels=3, quality=100).encode_planes([plane])
    out = CineformCodec().decode_planes(stream)[0]
    assert out.shape == plane.shape
    assert np.array_equal(out, plane)


def test_lossy_bounded_error_and_compression():
    x = np.indices((64, 96)).sum(axis=0)
    plane = ((x * 2) % 256).astype(np.int32)
    cod = CineformCodec(levels=3, quality=60)
    stream = cod.encode_planes([plane])
    out = CineformCodec().decode_planes(stream)[0]
    assert len(stream) < plane.size // 2  # >2x on smooth content
    assert np.abs(out - plane).max() <= 64


def test_module_e2e_uyvy():
    from ultragrid_tpu.modules.video_compress import compress_init
    from ultragrid_tpu.modules.video_decompress import decompress_init

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    frame = VideoFrame(desc, [generate_pattern(w, h, Codec.UYVY, "bars")])
    comp = compress_init("cineform:100").compress(frame)
    assert comp is not None and comp.desc.color_spec == Codec.CFHD
    d, out_codec = decompress_init(Codec.CFHD, [Codec.UYVY])
    assert d is not None and out_codec == Codec.UYVY
    rec = d.decompress(comp, out_codec)
    assert np.array_equal(np.asarray(rec.data), np.asarray(frame.data))

    # lossy: close but smaller
    comp2 = compress_init("cineform:80").compress(frame)
    rec2 = decompress_init(Codec.CFHD, [Codec.UYVY])[0].decompress(comp2, Codec.UYVY)
    assert comp2.data.size < comp.data.size
    assert np.abs(rec2.data.astype(int) - frame.data.astype(int)).max() <= 24


def test_golden_vector_stability():
    """The stream for a fixed input must stay byte-stable across rounds."""
    import hashlib

    plane = (np.arange(32 * 48, dtype=np.int64).reshape(32, 48) % 251).astype(np.int32)
    stream = CineformCodec(levels=3, quality=90).encode_planes([plane])
    digest = hashlib.sha256(stream).hexdigest()
    out = CineformCodec().decode_planes(stream)[0]
    assert np.abs(out - plane).max() <= 16
    # pin the golden digest: update ONLY with a format version bump
    assert digest == GOLDEN_DIGEST, f"stream format changed: {digest}"


GOLDEN_DIGEST = "6ecbfc71735be76a97dd97bb9d97aaf248c07f18cea7dedd63eba13d135b459d"
