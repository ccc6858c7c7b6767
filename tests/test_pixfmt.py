"""Pixel-format conversion parity tests against the reference C implementation.

Every registered conversion pair is fed random frames and compared byte-exact
with the corresponding reference line decoder (run via ctypes on the compiled
reference code).  This is the strongest correctness gate in the suite —
analogous to (and broader than) test/codec_conversions_test.cpp.
"""

import numpy as np
import pytest

from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, vc_get_linesize

from . import refc

# pairs where our implementation intentionally diverges (documented in code)
TOLERANCE = {
    (Codec.UYVY, Codec.RGBA): 2,  # reference uses double arithmetic
}

WIDTH = 192  # multiple of 48 (v210), 64 (R10k), 8 (R12L), 6, 2
HEIGHT = 8


def _rand_frame(codec: Codec, width: int, height: int, rng) -> np.ndarray:
    ls = vc_get_linesize(width, codec)
    return rng.integers(0, 256, size=(height, ls), dtype=np.uint16).astype(np.uint8)


@pytest.mark.skipif(not refc.available(), reason="reference tree not present")
@pytest.mark.parametrize("pair", pixfmt.conversion_pairs(), ids=lambda p: f"{p[0].name}->{p[1].name}")
def test_conversion_parity(pair):
    in_codec, out_codec = pair
    if not refc.has_decoder(int(in_codec), int(out_codec)):
        pytest.skip("reference lacks this direct conversion")
    rng = np.random.default_rng(42 + int(in_codec) * 100 + int(out_codec))
    src = _rand_frame(in_codec, WIDTH, HEIGHT, rng)
    dst_len = vc_get_linesize(WIDTH, out_codec)
    expected = refc.convert_lines(int(in_codec), int(out_codec), src, dst_len)
    got = np.asarray(pixfmt.convert_frame(src, WIDTH, in_codec, out_codec))
    tol = TOLERANCE.get(pair, 0)
    if tol == 0:
        np.testing.assert_array_equal(got, expected, err_msg=f"{in_codec.name}->{out_codec.name}")
    else:
        diff = np.abs(got.astype(np.int16) - expected.astype(np.int16))
        assert diff.max() <= tol, f"{in_codec.name}->{out_codec.name}: max diff {diff.max()}"


@pytest.mark.skipif(not refc.available(), reason="reference tree not present")
def test_registry_covers_reference_table():
    """Every (in, out) pair in the reference decoders[] table has an entry."""
    missing = []
    ours = set(pixfmt.conversion_pairs())
    for in_codec in Codec:
        for out_codec in Codec:
            if in_codec == out_codec:
                continue
            if refc.has_decoder(int(in_codec), int(out_codec)):
                if (in_codec, out_codec) not in ours:
                    missing.append((in_codec.name, out_codec.name))
    assert not missing, f"missing conversions: {missing}"


def test_best_decoder_selection():
    fn, out = pixfmt.get_best_decoder_from(Codec.v210, [Codec.RGB, Codec.Y216, Codec.UYVY])
    # v210 is 10-bit 422 YCbCr: Y216 preserves depth+subsampling+colorspace
    assert out == Codec.Y216
    fn, out = pixfmt.get_best_decoder_from(Codec.UYVY, [Codec.RGB, Codec.UYVY])
    assert out == Codec.UYVY


def test_roundtrip_uyvy_v210():
    rng = np.random.default_rng(0)
    src = _rand_frame(Codec.UYVY, WIDTH, HEIGHT, rng)
    v210 = pixfmt.convert_frame(src, WIDTH, Codec.UYVY, Codec.v210)
    back = np.asarray(pixfmt.convert_frame(v210, WIDTH, Codec.v210, Codec.UYVY))
    np.testing.assert_array_equal(back[:, : 2 * WIDTH], np.asarray(src)[:, : 2 * WIDTH])


def test_roundtrip_rg48_r12l():
    rng = np.random.default_rng(1)
    # R12L holds exactly the top 12 bits of RG48; make low nibbles zero
    src = _rand_frame(Codec.RG48, WIDTH, HEIGHT, rng)
    src[:, 0::2] &= 0xF0
    r12l = pixfmt.convert_frame(src, WIDTH, Codec.RG48, Codec.R12L)
    back = np.asarray(pixfmt.convert_frame(r12l, WIDTH, Codec.R12L, Codec.RG48))
    np.testing.assert_array_equal(back, np.asarray(src))
