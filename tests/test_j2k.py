"""Own JPEG 2000 encoder: DWT reversibility, OpenJPEG conformance, module
e2e (ref role: src/video_compress/cmpto_j2k.cpp — Comprimato SDK wrapper;
ours is a from-scratch T.800 implementation: 5/3 DWT + RCT in
ops/j2k.py, EBCOT Tier-1 MQ coder in native/j2k_t1.c).

Conformance is externally judged: every stream is decoded with OpenJPEG
(via Pillow), an independent implementation of the standard."""

import io

import numpy as np
import pytest

from ultragrid_tpu.ops.j2k import (
    dwt53_decompose,
    dwt53_reconstruct,
    encode_gray,
    encode_rgb_lossless,
    rct_forward,
    rct_inverse,
)
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern


def _pil_decode(cs: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(cs)))


def test_dwt53_perfect_reconstruction():
    rng = np.random.default_rng(0)
    for shape in [(32, 64), (37, 53), (1, 17), (16, 1)]:
        for levels in [1, 2, 3]:
            p = rng.integers(-2048, 2048, shape).astype(np.int32)
            ll, det = dwt53_decompose(p, levels)
            assert np.array_equal(dwt53_reconstruct(ll, det), p), (shape, levels)


def test_rct_exact():
    rng = np.random.default_rng(1)
    r, g, b = (rng.integers(-128, 128, (16, 16)).astype(np.int32) for _ in range(3))
    y, cb, cr = rct_forward(r, g, b)
    r2, g2, b2 = rct_inverse(y, cb, cr)
    assert np.array_equal(r, r2) and np.array_equal(g, g2) and np.array_equal(b, b2)


def test_gray_lossless_openjpeg_conformance():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    out = _pil_decode(encode_gray(img, levels=2))
    assert np.array_equal(out, img)


def test_rgb_lossless_openjpeg_conformance():
    rng = np.random.default_rng(3)
    for shape in [(64, 96, 3), (61, 83, 3), (16, 16, 3)]:
        rgb = rng.integers(0, 256, shape).astype(np.uint8)
        out = _pil_decode(encode_rgb_lossless(rgb, levels=5))
        assert np.array_equal(out, rgb), shape


def test_lossy_bounded_and_smaller():
    x = np.indices((64, 96)).sum(axis=0)
    sm = np.stack([(x * 2) % 256, (x * 3) % 256, x % 256], axis=-1).astype(np.uint8)
    lossless = encode_rgb_lossless(sm, levels=5, quality=100)
    lossy = encode_rgb_lossless(sm, levels=5, quality=70)
    out = _pil_decode(lossy)
    assert len(lossy) < len(lossless)
    assert np.abs(out.astype(int) - sm.astype(int)).max() <= 16


def test_module_e2e_uyvy_to_j2k():
    from ultragrid_tpu.modules.video_compress import compress_init
    from ultragrid_tpu.modules.video_decompress import decompress_init

    w, h = 128, 64
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    frame = VideoFrame(desc, [generate_pattern(w, h, Codec.UYVY, "bars")])
    comp = compress_init("cmpto_j2k:100").compress(frame)
    assert comp is not None and comp.desc.color_spec == Codec.J2KR
    d, out_codec = decompress_init(Codec.J2KR, [Codec.RGB, Codec.UYVY])
    assert d is not None and out_codec == Codec.RGB
    rec = d.decompress(comp, out_codec)
    assert rec is not None and rec.desc.color_spec == Codec.RGB
    # J2K itself is lossless here; only the UYVY->RGB conversion bounds error
    from ultragrid_tpu.ops import pixfmt

    ref_rgb = np.asarray(
        pixfmt.convert_frame(frame.data, w, Codec.UYVY, Codec.RGB), np.uint8
    )
    assert np.array_equal(np.asarray(rec.data, np.uint8), ref_rgb)


def test_own_decoder_lossless_round_trip():
    """Own Tier-2 + MQ/T1 decoder (no external library) recovers the own
    encoder's streams exactly."""
    from ultragrid_tpu.ops.j2k import J2KDecoder

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (37, 61)).astype(np.uint8)
    assert np.array_equal(J2KDecoder().decode(encode_gray(img, levels=3))[0], img)
    rgb = rng.integers(0, 256, (48, 80, 3)).astype(np.uint8)
    rec = np.stack(J2KDecoder().decode(encode_rgb_lossless(rgb, levels=5)), axis=-1)
    assert np.array_equal(rec, rgb)


def test_own_decoder_matches_openjpeg_on_lossy():
    """On truncated (lossy) streams the own decoder and OpenJPEG produce the
    SAME samples (identical mid-point reconstruction) — strict two-
    implementation agreement."""
    from ultragrid_tpu.ops.j2k import J2KDecoder

    x = np.indices((64, 96)).sum(axis=0)
    sm = np.stack([(x * 2) % 256, (x * 3) % 256, x % 256], axis=-1).astype(np.uint8)
    cs = encode_rgb_lossless(sm, levels=5, quality=70)
    own = np.stack(J2KDecoder().decode(cs), axis=-1)
    assert np.array_equal(own, _pil_decode(cs))


def test_golden_vector_stability():
    import hashlib

    plane = (np.arange(32 * 48, dtype=np.int64).reshape(32, 48) % 251).astype(np.uint8)
    cs = encode_gray(plane, levels=3, quality=100)
    assert np.array_equal(_pil_decode(cs), plane)
    digest = hashlib.sha256(cs).hexdigest()
    assert digest == GOLDEN_DIGEST, f"stream format changed: {digest}"


GOLDEN_DIGEST = "9be527f808147fff25561db1aec492f000c36eb5f84c19af10f63c538b165350"
