"""Spec-derived golden vectors for the XS/APV entropy + transform layers.

Round-3 verdict ask #9: the own-container XS/APV codecs were validated
only against themselves.  These tests pin hand-derived vectors:

* the reversible 5/3 DWT against a by-hand evaluation of the ISO lifting
  equations (ISO/IEC 15444-1 F.4.8.2.1-2 == ISO/IEC 21122-1 reversible
  filter; identical definition), plus a cross-IMPLEMENTATION anchor — the
  repo carries two independent 5/3 implementations (ops/j2k.py, proven
  sample-exact against OpenJPEG both directions, and ops/jpegxs.py) which
  must agree on every lattice;
* the XS band packet (group-of-4 MSB-position significance coding with
  vertical prediction + magnitude planes + signs, the ISO/IEC 21122-1
  clause 7 entropy structure) against a fully hand-assembled bitstream;
* the Golomb-Rice tokens of the APV layer against the textbook Rice
  definition (q zeros, terminator, k LSBs);
* the signed->unsigned interleave against the standard fold (same mapping
  as H.264 se(v), spec 9.1.1: positive v -> 2v-1, negative -> -2v).
"""

from __future__ import annotations

import numpy as np


def _bits_to_bytes(bitstr: str) -> bytes:
    bits = np.array([1 if b == "1" else 0 for b in bitstr], np.uint8)
    pad = (-bits.size) % 8
    if pad:
        bits = np.pad(bits, (0, pad))
    return np.packbits(bits).tobytes()


def test_dwt53_hand_vector():
    """One 5/3 level of x = [10,12,9,7,5,6,11,14], evaluated by hand from
    the ISO lifting equations with symmetric extension:

      d[n] = x[2n+1] - floor((x[2n] + x[2n+2]) / 2)
      s[n] = x[2n]   + floor((d[n-1] + d[n] + 2) / 4)

      d = [12-floor(19/2), 7-floor(14/2), 6-floor(16/2), 14-floor(22/2)]
        = [3, 0, -2, 3]                      (x[8] mirrors to x[6]=11)
      s = [10+floor(8/4), 9+floor(5/4), 5+floor(0/4), 11+floor(3/4)]
        = [12, 10, 5, 11]                    (d[-1] mirrors to d[0]=3)
    """
    import jax.numpy as jnp

    from ultragrid_tpu.ops import j2k
    from ultragrid_tpu.ops.jpegxs import _dwt53_1d

    x = np.array([10, 12, 9, 7, 5, 6, 11, 14], np.int32)
    s_ref = np.array([12, 10, 5, 11], np.int32)
    d_ref = np.array([3, 0, -2, 3], np.int32)

    s1, d1 = j2k._fdwt53_1d(x[None, :], axis=1)
    np.testing.assert_array_equal(s1[0], s_ref)
    np.testing.assert_array_equal(d1[0], d_ref)

    s2, d2 = _dwt53_1d(jnp.asarray(x)[None, :], axis=1)
    np.testing.assert_array_equal(np.asarray(s2)[0], s_ref)
    np.testing.assert_array_equal(np.asarray(d2)[0], d_ref)


def test_dwt53_cross_implementation_lattice():
    """ops/j2k.py (OpenJPEG-sample-exact) and ops/jpegxs.py implement the
    same ISO reversible 5/3 filter independently — they must agree on
    random even-length lattices, both directions."""
    import jax.numpy as jnp

    from ultragrid_tpu.ops import j2k
    from ultragrid_tpu.ops.jpegxs import _dwt53_1d, _idwt53_1d

    rng = np.random.default_rng(0)
    for w in (8, 16, 64, 126 + 2):
        x = rng.integers(-512, 512, (4, w)).astype(np.int32)
        s1, d1 = j2k._fdwt53_1d(x, axis=1)
        s2, d2 = _dwt53_1d(jnp.asarray(x), axis=1)
        np.testing.assert_array_equal(s1, np.asarray(s2))
        np.testing.assert_array_equal(d1, np.asarray(d2))
        # inverse agreement + perfect reconstruction
        r1 = j2k._idwt53_1d(s1, d1, axis=1)
        r2 = _idwt53_1d(jnp.asarray(s1), jnp.asarray(d1), axis=1)
        np.testing.assert_array_equal(r1, x)
        np.testing.assert_array_equal(np.asarray(r2), x)


def test_xs_band_packet_golden():
    """Hand-assembled XS band packet for

        band = [[ 3, 0, -1,  2],
                [ 0, 5,  0, -6]],  trunc = 0, Ng = 4

    Derivation (clause-7 structure: significance group MSB positions with
    vertical prediction, signed-unary deltas, magnitude planes, signs):

      row 0 group: max|.| = 3  -> msb 2;  pred 0 -> delta +2 -> q = 3
      row 1 group: max|.| = 6  -> msb 3;  pred 2 -> delta +1 -> q = 1
      unary:       0001 | 01
      magnitudes:  row0 (2 planes each):  3=11 0=00 1=01 2=10
                   row1 (3 planes each):  0=000 5=101 0=000 6=110
      signs (nonzero, raster order; 1 = negative):
                   +3 -> 0, -1 -> 1, +2 -> 0, +5 -> 0, -6 -> 1
    """
    from ultragrid_tpu.ops.jpegxs import _BitReader, _BitWriter, _decode_band, _encode_band

    band = np.array([[3, 0, -1, 2], [0, 5, 0, -6]], np.int64)
    bw = _BitWriter()
    _encode_band(band, 0, bw)
    got = bw.tobytes()

    expected_bits = (
        "0001" "01"                       # unary MSB deltas
        "11" "00" "01" "10"               # row-0 magnitude planes
        "000" "101" "000" "110"           # row-1 magnitude planes
        "0" "1" "0" "0" "1"               # signs
    )
    assert got == _bits_to_bytes(expected_bits)

    # and the decoder recovers the band from the hand-checked stream
    back = _decode_band(2, 4, 0, _BitReader(got))
    np.testing.assert_array_equal(back, band)


def test_xs_band_truncation_golden():
    """trunc=1 drops one LSB plane: msb counts shrink by 1 and magnitudes
    are coded >> 1 (the XS per-band truncation T_b role)."""
    from ultragrid_tpu.ops.jpegxs import _BitWriter, _encode_band

    band = np.array([[3, 0, -1, 2], [0, 5, 0, -6]], np.int64)
    bw = _BitWriter()
    _encode_band(band, 1, bw)
    # msb-trunc: row0 -> 1 (q=1), row1 -> 2 (delta +1, q=1)
    # mags >> 1: row0: 1,0,0,1 (1 plane each); row1: 0,2,0,3 (2 planes)
    # signs of coeffs whose truncated magnitude is nonzero:
    #   +3 -> 0, +2 -> 0 (row0); +5 -> 0, -6 -> 1
    expected_bits = (
        "01" "01"
        "1" "0" "0" "1"
        "00" "10" "00" "11"
        "0" "0" "0" "1"
    )
    assert bw.tobytes() == _bits_to_bytes(expected_bits)


def test_rice_tokens_golden():
    """Rice(k=2) of [0, 1, 5, 10] per the textbook definition
    (q = v>>k zeros, '1', then k LSBs):

        0 -> 1|00   1 -> 1|01   5 -> 01|01   10 -> 001|10
    """
    from ultragrid_tpu.ops.apv import _BitReader, _BitWriter, _rice_decode_vec, _rice_put

    vals = np.array([0, 1, 5, 10], np.uint64)
    bw = _BitWriter()
    _rice_put(bw, vals, 2)
    expected_bits = "100" "101" "0101" "00110"
    assert bw.tobytes() == _bits_to_bytes(expected_bits)

    back = _rice_decode_vec(_BitReader(bw.tobytes()), 4, 2)
    np.testing.assert_array_equal(back, vals.astype(np.int64))


def test_signed_interleave_golden():
    """_smap is the standard signed fold (H.264 9.1.1 se(v) mapping):
    0,1,-1,2,-2 -> 0,1,2,3,4."""
    from ultragrid_tpu.ops.apv import _smap, _sunmap

    v = np.array([0, 1, -1, 2, -2, 7, -7], np.int64)
    z = np.array([0, 1, 2, 3, 4, 13, 14], np.int64)
    np.testing.assert_array_equal(_smap(v), z)
    np.testing.assert_array_equal(_sunmap(z), v)
