"""Parity of the fused Pallas JPEG kernel vs the canonical XLA path.

On CPU CI the kernel runs in the Pallas interpreter on a tiny geometry
(exercises the kernel logic, not Mosaic codegen); on real TPU the compiled
kernel is covered by the same check at larger sizes (run via _tools or the
bench).  Contract: bit-identical (slots, bits, overflow) to
JpegEncoder._make_encode for the same geometry — the XLA path is itself
validated against PIL/libavcodec decoders (tests/test_compress.py,
tests/test_lavc.py), so parity here transitively certifies the bitstream.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ultragrid_tpu.ops import jpeg_pallas
from ultragrid_tpu.ops.jpeg import JpegEncoder
from ultragrid_tpu.types import Codec

pytestmark = pytest.mark.skipif(
    not jpeg_pallas._HAVE_PALLAS, reason="pallas unavailable"
)


def _parity_case(w, h, ri, codec, quality, seed=7):
    enc = JpegEncoder(w, h, in_codec=codec, quality=quality, restart_interval=ri)
    rng = np.random.default_rng(seed)
    ncomp = 2 if codec in (Codec.UYVY, Codec.YUYV) else 3
    frame = rng.integers(0, 256, (h, ncomp * w), dtype=np.uint8)
    ref = jax.tree.map(np.asarray, enc._make_encode(enc.wwords)(frame))
    fn = jpeg_pallas.make_fused_encode(enc, enc.wwords, interpret=True)
    assert fn is not None
    got = jax.tree.map(np.asarray, fn(frame))
    for name, a, b in zip(
        ("ys", "ybits", "us", "ubits", "vs", "vbits", "overflow"), ref, got
    ):
        assert np.array_equal(a, b), f"{name} mismatch"


def test_pallas_parity_uyvy_422():
    _parity_case(64, 16, 2, Codec.UYVY, 80)


def test_pallas_parity_rgb_444():
    _parity_case(64, 16, 4, Codec.RGB, 85)


def test_pallas_parity_yuyv_high_quality():
    _parity_case(32, 16, 1, Codec.YUYV, 95)


def test_supports_gating():
    enc = JpegEncoder(64, 16, in_codec=Codec.UYVY, restart_interval=3)
    # 4 MCUs per row, ri=3 does not divide -> fused kernel must decline
    assert not jpeg_pallas.supports(enc)
    enc2 = JpegEncoder(64, 16, in_codec=Codec.UYVY)  # auto ri divides nmcux
    assert enc2.nmcux % enc2.restart_interval == 0


def test_batch_encoder_bit_identical_per_frame():
    """JpegBatchEncoder (frames stacked row-wise, one dispatch) must produce
    byte-identical JPEG files to per-frame encodes: frame boundaries land on
    restart boundaries because restart_interval divides the MCU-row width."""
    from ultragrid_tpu.ops.jpeg import JpegBatchEncoder, decode_jpeg

    w, h, B = 64, 16, 3
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (h, 2 * w), dtype=np.uint8) for _ in range(B)]
    batch = JpegBatchEncoder(w, h, B, in_codec=Codec.UYVY, quality=80)
    singles = []
    enc = JpegEncoder(w, h, in_codec=Codec.UYVY, quality=80,
                      restart_interval=batch.single.restart_interval)
    enc.wwords = batch.wwords
    for f in frames:
        singles.append(bytes(enc.encode(f)))
    got = batch.encode(np.stack(frames))
    assert len(got) == B
    for i in range(B):
        assert bytes(got[i]) == singles[i], f"frame {i} differs"
    # each file is a decodable standalone JPEG
    decode_jpeg(bytes(got[0]))


def test_pallas_parity_uyvy_420():
    """4:2:0 (16x16 MCUs, 6 blocks: Y00 Y01 Y10 Y11 Cb Cr) in the fused
    kernel — the subsampling the wider world defaults to (ref:
    gpujpeg.cpp:295-302)."""
    enc = JpegEncoder(64, 32, in_codec=Codec.UYVY, quality=80,
                      restart_interval=2, subsampling="420")
    assert jpeg_pallas.supports(enc)
    _parity_case_enc(enc)


def test_pallas_parity_yuyv_420_high_quality():
    enc = JpegEncoder(32, 32, in_codec=Codec.YUYV, quality=95,
                      restart_interval=1, subsampling="420")
    _parity_case_enc(enc)


def _parity_case_enc(enc, seed=7):
    rng = np.random.default_rng(seed)
    frame = rng.integers(0, 256, (enc.height, 2 * enc.width), dtype=np.uint8)
    ref = jax.tree.map(np.asarray, enc._make_encode(enc.wwords)(frame))
    fn = jpeg_pallas.make_fused_encode(enc, enc.wwords, interpret=True)
    assert fn is not None
    got = jax.tree.map(np.asarray, fn(frame))
    for name, a, b in zip(
        ("ys", "ybits", "us", "ubits", "vs", "vbits", "overflow"), ref, got
    ):
        assert np.array_equal(a, b), f"{name} mismatch"
