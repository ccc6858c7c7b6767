"""DXT1 / DXT5-YCoCg texture compression, TPU-native.

Algorithm re-derivation of the reference CUDA kernels
(ref: cuda_dxt/cuda_dxt.cu — dxt_encode<1> :514-621, dxt_encode<6> :472-511,
helpers :137-410, yuv_to_rgb :444-452).  Instead of one CUDA thread per 4x4
block, blocks are an array axis: every step is a vectorized f32 op over
``[nblocks, 16]`` lanes, which XLA maps straight onto the VPU; the bit packing
stays in int32/uint32 lanes.

Outputs are flat uint8 buffers in raster block order, 8 B/block (DXT1) or
16 B/block (DXT5), wire-compatible with the reference's DXT frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ultragrid_tpu.types import Codec

_OFFSET = 128.0 / 255.0


def _blockify_rgb(rgb_bytes: jnp.ndarray, width: int):
    """[H, 3W] uint8 -> (r, g, b) each [nblocks, 16] float32 in [0, 1]."""
    h = rgb_bytes.shape[0]
    px = rgb_bytes[:, : 3 * width].reshape(h, width, 3)
    return _blockify_px(px)


def _blockify_px(px: jnp.ndarray):
    h, width = px.shape[0], px.shape[1]
    nby, nbx = h // 4, width // 4
    # [nby, 4, nbx, 4, 3] -> [nby*nbx, 16, 3]
    blocks = px[: nby * 4, : nbx * 4].reshape(nby, 4, nbx, 4, 3)
    blocks = blocks.transpose(0, 2, 1, 3, 4).reshape(nby * nbx, 16, 3)
    f = blocks.astype(jnp.float32) * (1.0 / 255.0)
    return f[..., 0], f[..., 1], f[..., 2]


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _u32(x):
    return x.astype(jnp.uint32)


def _words_to_bytes(*words):
    """uint32 lanes [N] -> interleaved LE bytes [N * 4 * len(words)]."""
    w = jnp.stack(words, axis=-1)  # [N, nwords]
    b = jnp.stack([w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF], axis=-1)
    return b.astype(jnp.uint8).reshape(-1)


def _dxt1_core(r, g, b):
    """(r, g, b) [N, 16] floats -> (palette_code, indices) uint32 [N].

    ref: dxt_encode<1>, cuda_dxt.cu:514-621.
    """
    minr, ming, minb = r.min(axis=1), g.min(axis=1), b.min(axis=1)
    maxr, maxg, maxb = r.max(axis=1), g.max(axis=1), b.max(axis=1)

    # inset bounding box by 1/16
    def inset(lo, hi):
        ins = (hi - lo) * 0.0625
        return lo + ins, hi - ins

    minr, maxr = inset(minr, maxr)
    ming, maxg = inset(ming, maxg)
    minb, maxb = inset(minb, maxb)

    # diagonal selection via covariance with box center
    cr = (minr + maxr) * 0.5
    cg = (ming + maxg) * 0.5
    cb = (minb + maxb) * 0.5
    dr, dg, db = r - cr[:, None], g - cg[:, None], b - cb[:, None]
    cov_x = (dr * db).sum(axis=1)
    cov_y = (dg * db).sum(axis=1)
    minr, maxr = jnp.where(cov_x < 0, maxr, minr), jnp.where(cov_x < 0, minr, maxr)
    ming, maxg = jnp.where(cov_y < 0, maxg, ming), jnp.where(cov_y < 0, ming, maxg)

    # endpoint quantization to 565 (ref: encode_endpoint :424-440)
    def endpoint(cr_, cg_, cb_):
        qr = jnp.round(_saturate(cr_) * 31.0)
        qg = jnp.round(_saturate(cg_) * 63.0)
        qb = jnp.round(_saturate(cb_) * 31.0)
        code = (_u32(qr) << 11) + (_u32(qg) << 5) + _u32(qb)
        return code, qr / 31.0, qg / 63.0, qb / 31.0

    max_code, maxr, maxg, maxb = endpoint(maxr, maxg, maxb)
    min_code, minr, ming, minb = endpoint(minr, ming, minb)

    swap = max_code < min_code
    palette_code = jnp.where(swap, min_code + (max_code << 16), max_code + (min_code << 16))

    # project colors onto the min-max line, quantize t to palette index
    dir_r, dir_g, dir_b = minr - maxr, ming - maxg, minb - maxb
    dir_sqr = dir_r * dir_r + dir_g * dir_g + dir_b * dir_b
    inv = jnp.where(dir_sqr > 0, 1.0 / jnp.where(dir_sqr > 0, dir_sqr, 1.0), 0.0)
    t_r, t_g, t_b = dir_r * inv, dir_g * inv, dir_b * inv
    t_bias = t_r * maxr + t_g * maxg + t_b * maxb
    col_t = r * t_r[:, None] + g * t_g[:, None] + b * t_b[:, None] - t_bias[:, None]
    col_idx = _u32(3.0 * _saturate(col_t) + 0.5)  # trunc, as the C cast

    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    indices = (col_idx << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)
    indices = jnp.where(max_code != min_code, indices, jnp.uint32(0))
    indices = jnp.where(swap, ~indices, indices)
    # remap 00->00, 01->10, 10->11, 11->01
    lsbs = indices & jnp.uint32(0x55555555)
    msbs = indices & jnp.uint32(0xAAAAAAAA)
    indices = msbs ^ (jnp.uint32(2) * lsbs + (msbs >> 1))
    return palette_code, indices


def _yuv_to_rgb_f(y, u, v):
    """ref: yuv_to_rgb, cuda_dxt.cu:444-452 (unit-range floats)."""
    yy = 1.1643 * (y - 0.0625)
    uu = u - 0.5
    vv = v - 0.5
    r = yy + 1.7926 * vv
    g = yy - 0.2132 * uu - 0.5328 * vv
    b = yy + 2.1124 * uu
    return r, g, b


def _uyvy_to_px444(src: jnp.ndarray, width: int):
    """UYVY [H, 2W] -> per-pixel (y, u, v) floats (chroma duplicated,
    ref: yuv422_to_yuv444_kernel cuda_dxt.cu:697+)."""
    h = src.shape[0]
    g = src[:, : 2 * width].reshape(h, width // 2, 4).astype(jnp.float32) * (1.0 / 255.0)
    u, y0, v, y1 = g[..., 0], g[..., 1], g[..., 2], g[..., 3]
    y = jnp.stack([y0, y1], axis=-1).reshape(h, width)
    uu = jnp.repeat(u, 2, axis=1)
    vv = jnp.repeat(v, 2, axis=1)
    return y, uu, vv


def _px_f_to_blocks(chan, h, width):
    nby, nbx = h // 4, width // 4
    c = chan[: nby * 4, : nbx * 4].reshape(nby, 4, nbx, 4)
    return c.transpose(0, 2, 1, 3).reshape(nby * nbx, 16)


@partial(jax.jit, static_argnums=(1,))
def dxt1_encode_rgb(rgb: jnp.ndarray, width: int) -> jnp.ndarray:
    """RGB [H, >=3W] uint8 -> DXT1 bytes (8 B per 4x4 block)."""
    r, g, b = _blockify_rgb(rgb, width)
    pal, idx = _dxt1_core(r, g, b)
    return _words_to_bytes(pal, idx)


@partial(jax.jit, static_argnums=(1,))
def dxt1_encode_uyvy(src: jnp.ndarray, width: int) -> jnp.ndarray:
    """UYVY -> (BT.709 YUV->RGB) -> DXT1 (ref: cuda_dxt yuv pre-pass path)."""
    h = src.shape[0]
    y, u, v = _uyvy_to_px444(src, width)
    r, g, b = _yuv_to_rgb_f(y, u, v)
    rb = _px_f_to_blocks(r, h, width)
    gb = _px_f_to_blocks(g, h, width)
    bb = _px_f_to_blocks(b, h, width)
    pal, idx = _dxt1_core(rb, gb, bb)
    return _words_to_bytes(pal, idx)


@partial(jax.jit, static_argnums=(1,))
def dxt1_yuv_encode_uyvy(src: jnp.ndarray, width: int) -> jnp.ndarray:
    """DXT1_YUV: YCbCr packed straight into DXT1 channels (ref: RTDXT
    dxt_glsl.cpp DXT1_YUV mode — no color conversion)."""
    h = src.shape[0]
    y, u, v = _uyvy_to_px444(src, width)
    rb = _px_f_to_blocks(y, h, width)
    gb = _px_f_to_blocks(u, h, width)
    bb = _px_f_to_blocks(v, h, width)
    pal, idx = _dxt1_core(rb, gb, bb)
    return _words_to_bytes(pal, idx)


def _rgb_to_ycocg(r, g, b):
    """ref: ConvertRGBToYCoCg, cuda_dxt.cu:141-148."""
    y = (r + 2.0 * g + b) * 0.25
    co = (2.0 * r - 2.0 * b) * 0.25 + _OFFSET
    cg = (-r + 2.0 * g - b) * 0.25 + _OFFSET
    return y, co, cg


def _dxt5_ycocg_core(r, g, b):
    """(r, g, b) [N, 16] -> 4 uint32 words per block (DXT5-YCoCg).

    ref: dxt_encode<6>, cuda_dxt.cu:472-511 + helpers :243-410.
    """
    y, co, cg = _rgb_to_ycocg(r, g, b)

    miny, minco, mincg = y.min(axis=1), co.min(axis=1), cg.min(axis=1)
    maxy, maxco, maxcg = y.max(axis=1), co.max(axis=1), cg.max(axis=1)

    # SelectYCoCgDiagonal: swap Cg endpoints if covariance negative
    midco = (maxco + minco) * 0.5
    midcg = (maxcg + mincg) * 0.5
    cov = ((co - midco[:, None]) * (cg - midcg[:, None])).sum(axis=1)
    swap = cov < 0
    mincg, maxcg = jnp.where(swap, maxcg, mincg), jnp.where(swap, mincg, maxcg)

    # ScaleYCoCg
    m = jnp.maximum(
        jnp.maximum(jnp.abs(minco - _OFFSET), jnp.abs(mincg - _OFFSET)),
        jnp.maximum(jnp.abs(maxco - _OFFSET), jnp.abs(maxcg - _OFFSET)),
    )
    scale = jnp.where(m < 32.0 / 255.0, 4, jnp.where(m < 64.0 / 255.0, 2, 1)).astype(jnp.float32)

    # EmitEndPointsYCoCgDXT5
    def rescale(c):
        return (c - _OFFSET) * scale + _OFFSET

    eminco, emincg = rescale(minco), rescale(mincg)
    emaxco, emaxcg = rescale(maxco), rescale(maxcg)
    # InsetCoCgBBox
    ins_co = (emaxco - eminco) / 16.0 - (8.0 / 255.0) / 16.0
    ins_cg = (emaxcg - emincg) / 16.0 - (8.0 / 255.0) / 16.0
    eminco = _saturate(eminco + ins_co)
    emincg = _saturate(emincg + ins_cg)
    emaxco = _saturate(emaxco - ins_co)
    emaxcg = _saturate(emaxcg - ins_cg)

    qmaxco, qmaxcg = jnp.round(emaxco * 31.0), jnp.round(emaxcg * 63.0)
    qminco, qmincg = jnp.round(eminco * 31.0), jnp.round(emincg * 63.0)
    iscale = _u32(scale) - 1
    word_hi = (_u32(qmaxco) << 11) | (_u32(qmaxcg) << 5) | iscale
    word_lo = (_u32(qminco) << 11) | (_u32(qmincg) << 5) | iscale
    cocg_endpoints = word_hi | (word_lo << 16)

    # expand quantized endpoints back to floats, undo rescale
    def expand5(q):
        qi = _u32(q)
        return ((qi << 3) | (qi >> 2)).astype(jnp.float32) / 255.0

    def expand6(q):
        qi = _u32(q)
        return ((qi << 2) | (qi >> 4)).astype(jnp.float32) / 255.0

    fmaxco = (expand5(qmaxco) - _OFFSET) / scale + _OFFSET
    fmaxcg = (expand6(qmaxcg) - _OFFSET) / scale + _OFFSET
    fminco = (expand5(qminco) - _OFFSET) / scale + _OFFSET
    fmincg = (expand6(qmincg) - _OFFSET) / scale + _OFFSET

    # EmitIndicesYCoCgDXT5: 4-color palette over (Co, Cg)
    c0co, c0cg = fmaxco, fmaxcg
    c1co, c1cg = fminco, fmincg
    c2co = c0co + (c1co - c0co) * (1.0 / 3.0)
    c2cg = c0cg + (c1cg - c0cg) * (1.0 / 3.0)
    c3co = c0co + (c1co - c0co) * (2.0 / 3.0)
    c3cg = c0cg + (c1cg - c0cg) * (2.0 / 3.0)

    def dist(pc, pg):
        return (co - pc[:, None]) ** 2 + (cg - pg[:, None]) ** 2

    d0, d1, d2, d3 = dist(c0co, c0cg), dist(c1co, c1cg), dist(c2co, c2cg), dist(c3co, c3cg)
    bx = d0 > d3
    by = d1 > d2
    bz = d0 > d2
    bw = d1 > d3
    b4 = d2 > d3
    index = _u32(bx & b4) | (_u32((by & bz) | (bx & bw)) << 1)
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    cocg_indices = (index << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)

    # InsetYBBox
    ins_y = (maxy - miny) / 32.0 - (16.0 / 255.0) / 32.0
    iminy = _saturate(miny + ins_y)
    imaxy = _saturate(maxy - ins_y)

    # EmitAlphaEndPointsYCoCgDXT5: byte0 = max, byte1 = min
    c0 = _u32(jnp.round(iminy * 255.0))
    c1 = _u32(jnp.round(imaxy * 255.0))
    alpha_word0 = (c0 << 8) | c1

    # EmitAlphaIndicesYCoCgDXT5 (ref: cuda_dxt.cu:360-410)
    rng = 7.0
    mid = (imaxy - iminy) / (2.0 * rng)
    ab = [iminy + mid] + [
        ((k * imaxy + (7 - k) * iminy) * (1.0 / rng) + mid) for k in (6, 5, 4, 3, 2, 1)
    ]
    a = y
    index = jnp.ones_like(a, dtype=jnp.uint32)
    for t in ab:
        index = index + _u32(a <= t[:, None])
    index = index & 7
    index = index ^ _u32(index < 2)

    # pack 16 3-bit indices into 48 bits starting at bit 16 of word0
    idx64_lo = jnp.zeros_like(cocg_indices)
    idx64_hi = jnp.zeros_like(cocg_indices)
    for i in range(6):
        idx64_lo = idx64_lo | (index[:, i] << jnp.uint32(3 * i + 16))
    # i == 5 spills one bit into the high word (3*5+16 = 31)
    idx64_hi = idx64_hi | (index[:, 5] >> 1)
    for i in range(6, 16):
        idx64_hi = idx64_hi | (index[:, i] << jnp.uint32(3 * i - 16))

    word0 = alpha_word0 | idx64_lo
    word1 = idx64_hi
    return word0, word1, cocg_endpoints, cocg_indices


@partial(jax.jit, static_argnums=(1,))
def dxt5_ycocg_encode_rgb(rgb: jnp.ndarray, width: int) -> jnp.ndarray:
    """RGB [H, >=3W] uint8 -> DXT5-YCoCg bytes (16 B per 4x4 block)."""
    r, g, b = _blockify_rgb(rgb, width)
    w0, w1, w2, w3 = _dxt5_ycocg_core(r, g, b)
    return _words_to_bytes(w0, w1, w2, w3)


@partial(jax.jit, static_argnums=(1,))
def dxt5_ycocg_encode_uyvy(src: jnp.ndarray, width: int) -> jnp.ndarray:
    h = src.shape[0]
    y, u, v = _uyvy_to_px444(src, width)
    r, g, b = _yuv_to_rgb_f(y, u, v)
    rb = _px_f_to_blocks(r, h, width)
    gb = _px_f_to_blocks(g, h, width)
    bb = _px_f_to_blocks(b, h, width)
    w0, w1, w2, w3 = _dxt5_ycocg_core(rb, gb, bb)
    return _words_to_bytes(w0, w1, w2, w3)


# ---------------------------------------------------------------------------
# decoders (receiver path; ref: dxt_compress display shaders)
# ---------------------------------------------------------------------------


def _bytes_to_words(buf: jnp.ndarray, nwords: int):
    b = buf.reshape(-1, nwords, 4).astype(jnp.uint32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def _expand565(code):
    r5 = (code >> 11) & 0x1F
    g6 = (code >> 5) & 0x3F
    b5 = code & 0x1F
    r = ((r5 << 3) | (r5 >> 2)).astype(jnp.float32)
    g = ((g6 << 2) | (g6 >> 4)).astype(jnp.float32)
    b = ((b5 << 3) | (b5 >> 2)).astype(jnp.float32)
    return r, g, b


def _unblockify(px_blocks: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[N, 16, C] -> [H, W*C] uint8."""
    nby, nbx = height // 4, width // 4
    c = px_blocks.shape[-1]
    arr = px_blocks.reshape(nby, nbx, 4, 4, c).transpose(0, 2, 1, 3, 4)
    return arr.reshape(height, width * c)


@partial(jax.jit, static_argnums=(1, 2))
def dxt1_decode_rgb(buf: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """DXT1 bytes -> RGB [H, 3W] uint8 (4-color opaque mode)."""
    w = _bytes_to_words(buf, 2)
    pal, idx = w[:, 0], w[:, 1]
    c0 = pal & 0xFFFF
    c1 = pal >> 16
    r0, g0, b0 = _expand565(c0)
    r1, g1, b1 = _expand565(c1)
    # 4-color palette (we always emit c0 >= c1)
    def palette(a0, a1):
        return jnp.stack([a0, a1, (2 * a0 + a1) / 3.0, (a0 + 2 * a1) / 3.0], axis=-1)

    pr, pg, pb = palette(r0, r1), palette(g0, g1), palette(b0, b1)
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    sel = ((idx[:, None] >> shifts[None, :]) & 3).astype(jnp.int32)  # [N, 16]
    px = jnp.stack(
        [
            jnp.take_along_axis(pr, sel, axis=1),
            jnp.take_along_axis(pg, sel, axis=1),
            jnp.take_along_axis(pb, sel, axis=1),
        ],
        axis=-1,
    )
    return _unblockify(jnp.round(px).astype(jnp.uint8), height, width)


@partial(jax.jit, static_argnums=(1, 2))
def dxt5_ycocg_decode_rgb(buf: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """DXT5-YCoCg bytes -> RGB [H, 3W] uint8
    (ref: display_dxt5ycocg_fp.glsl semantics)."""
    w = _bytes_to_words(buf, 4)
    w0, w1, cocg_pal, cocg_idx = w[:, 0], w[:, 1], w[:, 2], w[:, 3]

    # alpha (Y) palette: a0 = byte0 (max), a1 = byte1 (min); 8-level mode
    a0 = (w0 & 0xFF).astype(jnp.float32)
    a1 = ((w0 >> 8) & 0xFF).astype(jnp.float32)
    levels = [a0, a1] + [((7 - k) * a0 + k * a1) / 7.0 for k in range(1, 7)]
    apal = jnp.stack(levels, axis=-1)  # [N, 8]

    # 48-bit alpha indices live at bit 16 of w0 through w1 (static shifts)
    sels = []
    for i in range(16):
        p = 3 * i + 16
        if p + 3 <= 32:
            sels.append((w0 >> p) & 7)
        elif p == 31:  # index 5 spans the word boundary
            sels.append(((w0 >> 31) & 1) | ((w1 & 3) << 1))
        else:
            sels.append((w1 >> (p - 32)) & 7)
    asel = jnp.stack(sels, axis=-1).astype(jnp.int32)  # [N, 16]
    yv = jnp.take_along_axis(apal, asel, axis=1) / 255.0

    # CoCg palette
    chi = cocg_pal & 0xFFFF
    clo = cocg_pal >> 16
    scale = ((chi & 3) + 1).astype(jnp.float32)
    co0, cg0, _ = _expand565(chi)
    co1, cg1, _ = _expand565(clo)

    def palette(a0_, a1_):
        return jnp.stack(
            [a0_, a1_, a0_ + (a1_ - a0_) / 3.0, a0_ + (a1_ - a0_) * 2.0 / 3.0], axis=-1
        )

    pco, pcg = palette(co0, co1), palette(cg0, cg1)
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    sel = ((cocg_idx[:, None] >> shifts[None, :]) & 3).astype(jnp.int32)
    co = jnp.take_along_axis(pco, sel, axis=1) / 255.0
    cg = jnp.take_along_axis(pcg, sel, axis=1) / 255.0
    co = (co - _OFFSET) / scale[:, None]
    cg = (cg - _OFFSET) / scale[:, None]

    r = yv + co - cg
    g = yv + cg
    b = yv - co - cg
    px = jnp.stack([r, g, b], axis=-1)
    px = jnp.round(jnp.clip(px, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return _unblockify(px, height, width)
