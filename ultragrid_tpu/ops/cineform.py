"""CineForm/VC-5-architecture intra wavelet codec (TPU-first).

Role: the reference's ``-c cineform`` module wraps the proprietary CineForm
SDK (/root/reference/src/video_compress/cineform.cpp, 729 L, compiled only
when the SDK is present); this module is a from-scratch implementation of
the same coding architecture (SMPTE ST 2073 "VC-5" family core tools, the
codec CineForm is built on) designed for the TPU:

* **2/6 wavelet** — the CineForm transform: unnormalized Haar low-pass
  (pair sums) + high-pass with the ±1/8 neighbour correction, implemented
  as integer lifting so it is exactly invertible.  Three-level 2D Mallat
  pyramid (intra/spatial profile; the temporal transform only exists for
  CFHD's interlaced/3D modes).
* **Per-subband dead-zone quantization** — quantizer per band driven by a
  level-gain table; q=1 everywhere is fully lossless.
* **Zero-run + magnitude entropy layer** — VC-5's run-length coding of
  highpass bands: alternating Exp-Golomb zero-run / Exp-Golomb magnitude
  tokens + sign bits, with mag=0 as the run-continuation escape.  Fully
  vectorized emission (one ``put_bits_vec`` per band).

Wire format: this module's container is the codec's own documented one
(magic ``UCF1``) carrying picture geometry, level count and band
quantizers — it is the LOSSLESS mode of ``-c cineform`` (true lossless
is outside real CFHD's vocabulary: its 0x2000 prescale drops 2 bits).
The REAL CineForm HD sample bitstream — the wire format libavcodec's
``cfhd`` decoder reads — lives in ops/cfhd_bitstream.py, is the default
output of ``-c cineform`` for CFHD-compatible geometry, and is
conformance-gated against libavcodec in both directions in
tests/test_cfhd_bitstream.py.  What THIS module's tests pin down:
bit-exact lossless round-trips, quantization-bounded lossy error, and
decode of every stream the encoder emits.

The DWT is whole-plane jnp lifting (device-dispatched on TPU); entropy
packing is vectorized numpy on host — the same split as ops/jpegxs.py.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ultragrid_tpu.ops.jpegxs import _BitWriter

MAGIC = b"UCF1"

# ---------------------------------------------------------------------------
# 2/6 wavelet (integer lifting, exactly invertible)
# ---------------------------------------------------------------------------


def _dwt26_1d(x: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One 2/6 level along ``axis`` (even length required).

    s[n] = x[2n] + x[2n+1]                       (unnormalized Haar low)
    d[n] = (x[2n] - x[2n+1]) + ((s[n-1] - s[n+1] + 4) >> 3)

    with edge clamping of the s neighbourhood.  Inverse recovers
    x exactly: t = d - corr(s); x[2n] = (s+t)>>1 (s+t = 2*x[2n] is even).
    """
    x = jnp.moveaxis(x, axis, -1)
    even = x[..., 0::2]
    odd = x[..., 1::2]
    s = even + odd
    t = even - odd
    sm = jnp.concatenate([s[..., :1], s[..., :-1]], axis=-1)  # s[n-1]
    sp = jnp.concatenate([s[..., 1:], s[..., -1:]], axis=-1)  # s[n+1]
    d = t + ((sm - sp + 4) >> 3)
    return jnp.moveaxis(s, -1, axis), jnp.moveaxis(d, -1, axis)


def _idwt26_1d(s: jnp.ndarray, d: jnp.ndarray, axis: int) -> jnp.ndarray:
    s = jnp.moveaxis(s, axis, -1)
    d = jnp.moveaxis(d, axis, -1)
    sm = jnp.concatenate([s[..., :1], s[..., :-1]], axis=-1)
    sp = jnp.concatenate([s[..., 1:], s[..., -1:]], axis=-1)
    t = d - ((sm - sp + 4) >> 3)
    even = (s + t) >> 1
    odd = s - even
    out = jnp.stack([even, odd], axis=-1).reshape(*even.shape[:-1], -1)
    return jnp.moveaxis(out, -1, axis)


def dwt26_forward(plane: jnp.ndarray, levels: int) -> List[Tuple[str, jnp.ndarray]]:
    """3-level (default) 2D pyramid -> [(name, band)] with the final LL
    first.  Band names: L<k>{LH,HL,HH} for level k (1 = finest)."""
    bands: List[Tuple[str, jnp.ndarray]] = []
    ll = plane
    for lvl in range(1, levels + 1):
        lo, hi = _dwt26_1d(ll, axis=1)
        ll_, lh = _dwt26_1d(lo, axis=0)
        hl, hh = _dwt26_1d(hi, axis=0)
        bands.insert(0, (f"L{lvl}HH", hh))
        bands.insert(0, (f"L{lvl}HL", hl))
        bands.insert(0, (f"L{lvl}LH", lh))
        ll = ll_
    bands.insert(0, ("LL", ll))
    return bands


def dwt26_inverse(bands: List[Tuple[str, jnp.ndarray]], levels: int) -> jnp.ndarray:
    named = dict(bands)
    ll = named["LL"]
    for lvl in range(levels, 0, -1):
        lo = _idwt26_1d(ll, named[f"L{lvl}LH"], axis=0)
        hi = _idwt26_1d(named[f"L{lvl}HL"], named[f"L{lvl}HH"], axis=0)
        ll = _idwt26_1d(lo, hi, axis=1)
    return ll


# ---------------------------------------------------------------------------
# Entropy layer: zero-run / magnitude Exp-Golomb tokens
# ---------------------------------------------------------------------------

_RUN_CAP = 16383  # chunk long runs; EG(16383) = 27 bits


def _eg_len(u: np.ndarray) -> np.ndarray:
    """Exp-Golomb code length of u >= 0: 2*floor(log2(u+1))+1."""
    k = np.int32(np.log2(u.astype(np.int64) + 1))
    # guard fp edge at exact powers of two
    k = np.where((np.int64(1) << (k + 1)) <= u.astype(np.int64) + 1, k + 1, k)
    k = np.where((np.int64(1) << k) > u.astype(np.int64) + 1, k - 1, k)
    return 2 * k + 1


def _encode_band_rle(band: np.ndarray, q: int, bw: _BitWriter) -> None:
    """Quantize + RLE/EG encode one band into the bit writer.

    Token stream: (EG(run) EG(mag) [sign])* where mag = 0 means "run
    continuation, no coefficient" (used to chunk runs > _RUN_CAP and to
    flush trailing zeros); decoding stops when run totals + coefficient
    count cover the band.
    """
    flat = band.reshape(-1)
    if q > 1:
        flat = np.sign(flat) * (np.abs(flat) // q)
    nz_idx = np.flatnonzero(flat)
    mags = np.abs(flat[nz_idx]).astype(np.int64)
    signs = (flat[nz_idx] < 0).astype(np.uint32)
    # zero runs before each nonzero + the trailing run
    prev = np.concatenate([[-1], nz_idx])
    runs = (np.diff(prev) - 1).astype(np.int64)
    trailing = flat.size - 1 - (nz_idx[-1] if nz_idx.size else -1)

    # Per-coefficient token triples (run, mag, sign), vectorized; runs
    # beyond the cap spill into escape tokens (run=_RUN_CAP, mag=0), each
    # of which covers _RUN_CAP+1 zero positions at the decoder.
    n = nz_idx.size
    if n:
        nesc = (runs // (_RUN_CAP + 1)).astype(np.int64)  # escapes per coeff
        total_tokens = int(n + nesc.sum())
        run_vals = np.full(total_tokens, _RUN_CAP, np.int64)
        mag_vals = np.zeros(total_tokens, np.int64)
        sign_vals = np.zeros(total_tokens, np.uint32)
        is_coef = np.zeros(total_tokens, bool)
        pos = np.cumsum(nesc + 1) - 1  # index of each real-coefficient token
        run_vals[pos] = runs % (_RUN_CAP + 1)
        mag_vals[pos] = mags
        sign_vals[pos] = signs
        is_coef[pos] = True
        vals = np.stack(
            [(run_vals + 1).astype(np.uint32), (mag_vals + 1).astype(np.uint32), sign_vals],
            axis=1,
        ).reshape(-1)
        lens = np.stack(
            [_eg_len(run_vals), _eg_len(mag_vals), np.where(is_coef, 1, 0)], axis=1
        ).reshape(-1).astype(np.int32)
    else:
        vals = np.empty(0, np.uint32)
        lens = np.empty(0, np.int32)
    # trailing zeros: mag=0 tokens, each covering run+1 positions, summing
    # to EXACTLY `trailing` (any mismatch would desync the next band in the
    # shared bit stream)
    t_runs = []
    rem = int(trailing)
    while rem > 0:
        chunk = min(rem - 1, _RUN_CAP)
        t_runs.append(chunk)
        rem -= chunk + 1
    if t_runs:
        tr = np.asarray(t_runs, np.int64)
        vals2 = np.stack(
            [(tr + 1).astype(np.uint32), np.ones_like(tr, np.uint32)], axis=1
        ).reshape(-1)
        lens2 = np.stack([_eg_len(tr), np.ones_like(tr)], axis=1).reshape(-1).astype(np.int32)
        vals = np.concatenate([vals, vals2])
        lens = np.concatenate([lens, lens2])
    bw.put_bits_vec(vals.astype(np.uint32), lens.astype(np.int32))


class _Bits:
    """Sequential EG-token reader over a byte string (decode side)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read_eg(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        one_at = int(self.ones[i])
        k = one_at - self.pos
        val = 1
        for b in self.bits[one_at + 1 : one_at + 1 + k]:
            val = (val << 1) | int(b)
        self.pos = one_at + 1 + k
        return val - 1

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


def _decode_band_rle(h: int, w: int, q: int, br: _Bits) -> np.ndarray:
    out = np.zeros(h * w, np.int64)
    pos = 0
    size = h * w
    while pos < size:
        run = br.read_eg()
        mag = br.read_eg()
        if mag == 0:  # escape / trailing: run zeros + one implicit zero
            pos += run + 1
            continue
        pos += run
        sign = br.read_bit()
        out[pos] = -mag if sign else mag
        pos += 1
    if q > 1:
        nz = out != 0
        out[nz] = np.sign(out[nz]) * (np.abs(out[nz]) * q + q // 2)
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------

# band quantizer gains, finest level penalized most (VC-5 band gain role)
_BAND_QSHIFT = {"LL": 0, "L3LH": 0, "L3HL": 0, "L3HH": 1,
                "L2LH": 1, "L2HL": 1, "L2HH": 2,
                "L1LH": 2, "L1HL": 2, "L1HH": 3}


class CineformCodec:
    """Encoder/decoder over planar components (any int content <= 12 bit).

    quality: 100 = lossless (q=1 everywhere); lower quality scales the
    per-band quantizers up (error bound per coefficient <= q of its band).
    """

    def __init__(self, levels: int = 3, quality: int = 100):
        self.levels = levels
        self.quality = quality
        self.base_q = max(1, (100 - quality) // 8 + 1) if quality < 100 else 1

    def _q_for(self, name: str) -> int:
        if self.base_q == 1:
            return 1
        return self.base_q << _BAND_QSHIFT.get(name, 0)

    def encode_planes(self, planes: List[np.ndarray]) -> bytes:
        bw = _BitWriter()
        headers = []
        align = 1 << self.levels
        for plane in planes:
            h, w = plane.shape
            ph = h + (-h % align)
            pw = w + (-w % align)
            if (ph, pw) != (h, w):
                plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            bands = dwt26_forward(jnp.asarray(plane.astype(np.int32)), self.levels)
            bandinfo = []
            for name, band in bands:
                band_np = np.asarray(band)
                _encode_band_rle(band_np, self._q_for(name), bw)
                bandinfo.append((name, band_np.shape[0], band_np.shape[1]))
            headers.append((h, w, bandinfo))
        payload = bw.tobytes()
        hdr = bytearray()
        hdr += MAGIC
        hdr += struct.pack("<BBB", len(planes), self.levels, self.base_q)
        for h, w, bandinfo in headers:
            hdr += struct.pack("<HHB", w, h, len(bandinfo))
            for name, bh, bw_ in bandinfo:
                nb = name.encode()
                hdr += struct.pack("<B", len(nb)) + nb + struct.pack("<HH", bw_, bh)
        hdr += struct.pack("<I", len(payload))
        return bytes(hdr) + payload

    def decode_planes(self, data: bytes) -> List[np.ndarray]:
        assert data[:4] == MAGIC, "not a UCF1 stream"
        off = 4
        ncomp, levels, base_q = struct.unpack_from("<BBB", data, off)
        off += 3
        self.levels, self.base_q = levels, base_q
        comps = []
        for _ in range(ncomp):
            w, h, nbands = struct.unpack_from("<HHB", data, off)
            off += 5
            bands = []
            for _ in range(nbands):
                (ln,) = struct.unpack_from("<B", data, off)
                off += 1
                name = data[off : off + ln].decode()
                off += ln
                bw_, bh = struct.unpack_from("<HH", data, off)
                off += 4
                bands.append((name, bh, bw_))
            comps.append((w, h, bands))
        (paylen,) = struct.unpack_from("<I", data, off)
        off += 4
        br = _Bits(data[off : off + paylen])
        out = []
        for w, h, bands in comps:
            decoded = []
            for name, bh, bw_ in bands:
                band = _decode_band_rle(bh, bw_, self._q_for(name), br).astype(np.int32)
                decoded.append((name, jnp.asarray(band)))
            plane = np.asarray(dwt26_inverse(decoded, self.levels))
            out.append(plane[:h, :w])
        return out
