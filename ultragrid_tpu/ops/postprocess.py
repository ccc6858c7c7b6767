"""Postprocess / filter kernels: scale, deinterlace, crop, mirror, gamma, ...

Device-side replacements for src/vo_postprocess/ (scale.c, deinterlace.c,
crop, border, interlace) and the pixel-touching parts of src/capture_filter/
(gamma, grayscale, mirror, flip, matrix, blank, logo).  All pure jnp over
packed frames [H, linesize]; filters needing neighbor rows (deinterlace,
scale) shard cleanly over a spatial mesh with XLA-managed halo exchange.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultragrid_tpu.ops._kutils import shr
from ultragrid_tpu.types import Codec, codec_is_a_rgb, get_bits_per_component, get_codec_info, vc_get_linesize


# ---------------------------------------------------------------------------
# scale (ref: vo_postprocess/scale.c — GL nearest sampling over texels)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def scale_nearest(src: jnp.ndarray, width: int, codec: Codec, new_width: int, new_height: int) -> jnp.ndarray:
    """Nearest-neighbour scale at pixel-block granularity (UYVY scales in
    2-pixel texels, like the reference's RGBA-texture trick)."""
    info = get_codec_info(codec)
    bpx = info.block_size_pixels
    bby = info.block_size_bytes
    h = src.shape[0]
    blocks_in = width // bpx
    blocks_out = new_width // bpx
    g = src[:, : blocks_in * bby].reshape(h, blocks_in, bby)
    # GL_NEAREST: sample at texel centers
    xi = ((jnp.arange(blocks_out) + 0.5) * blocks_in / blocks_out).astype(jnp.int32)
    yi = ((jnp.arange(new_height) + 0.5) * h / new_height).astype(jnp.int32)
    out = g[yi][:, xi]
    return out.reshape(new_height, blocks_out * bby)


# ---------------------------------------------------------------------------
# deinterlace (ref: vc_deinterlace_ex video_codec.c; vo_postprocess/deinterlace.c)
# ---------------------------------------------------------------------------


def _avg_lines(a: jnp.ndarray, b: jnp.ndarray, codec: Codec) -> jnp.ndarray:
    """(x + y + 1) >> 1 at component granularity (ref: vc_deinterlace_ex)."""
    bpc = get_bits_per_component(codec)
    if codec == Codec.v210:
        from ultragrid_tpu.ops._kutils import u32_to_bytes, words_u32

        wa, wb = words_u32(a), words_u32(b)
        # exact replica of the reference (video_codec.c v210 branch): the top
        # field is averaged UNMASKED, so padding bits fold into bits 30-31
        f0 = ((wa & 0x3FF) + (wb & 0x3FF) + 1) >> 1
        f1 = ((((wa >> 10) & 0x3FF) + ((wb >> 10) & 0x3FF) + 1) >> 1) << 10
        f2 = (((wa >> 20) + (wb >> 20) + 1) >> 1) << 20
        out = (f2 | f1 | f0).astype(jnp.uint32)
        return u32_to_bytes(out)
    if bpc > 8:
        a16 = a.astype(jnp.int32).reshape(a.shape[0], -1, 2)
        b16 = b.astype(jnp.int32).reshape(b.shape[0], -1, 2)
        va = a16[..., 0] | (a16[..., 1] << 8)
        vb = b16[..., 0] | (b16[..., 1] << 8)
        v = (va + vb + 1) >> 1
        out = jnp.stack([v & 0xFF, (v >> 8) & 0xFF], axis=-1).astype(jnp.uint8)
        return out.reshape(a.shape)
    return ((a.astype(jnp.int32) + b.astype(jnp.int32) + 1) >> 1).astype(jnp.uint8)


@partial(jax.jit, static_argnums=(1,))
def deinterlace_blend(src: jnp.ndarray, codec: Codec) -> jnp.ndarray:
    """Linear blend: each line averaged with the next (ref: vc_deinterlace_ex:
    lines 0..n-2 get (l[y]+l[y+1]+1)/2, last line kept)."""
    nxt = jnp.concatenate([src[1:], src[-1:]], axis=0)
    return _avg_lines(src, nxt, codec)


@jax.jit
def deinterlace_bob_even(src: jnp.ndarray) -> jnp.ndarray:
    """Bob: duplicate even field lines (one field per output frame)."""
    return jnp.repeat(src[0::2], 2, axis=0)[: src.shape[0]]


@jax.jit
def deinterlace_bob_odd(src: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(src[1::2], 2, axis=0)[: src.shape[0]]


@partial(jax.jit, static_argnums=(1,))
def deinterlace_linear(src: jnp.ndarray, codec: Codec) -> jnp.ndarray:
    """Linear: keep even field, interpolate odd lines from neighbours."""
    even = src[0::2]
    nxt = jnp.concatenate([even[1:], even[-1:]], axis=0)
    interp = _avg_lines(even, nxt, codec)
    out = jnp.stack([even, interp], axis=1).reshape(-1, src.shape[1])
    return out[: src.shape[0]]


@jax.jit
def interlace(src: jnp.ndarray) -> jnp.ndarray:
    """Progressive -> interlaced merged: weave the two fields of one frame
    (ref: vo_postprocess/interlace.c — field order preserved)."""
    h = src.shape[0]
    top = src[0::2]
    bottom = src[1::2]
    return jnp.concatenate([top, bottom], axis=0)[:h]


# ---------------------------------------------------------------------------
# crop / border / mirror / flip (ref: vo_postprocess/crop.c, border;
# capture_filter/mirror.c, flip.c)
# ---------------------------------------------------------------------------


def crop(src: jnp.ndarray, width: int, codec: Codec, x: int, y: int, w: int, h: int) -> jnp.ndarray:
    """Crop at pixel-block granularity."""
    info = get_codec_info(codec)
    bpx, bby = info.block_size_pixels, info.block_size_bytes
    x0 = x // bpx * bby
    x1 = (x + w) // bpx * bby
    return src[y : y + h, x0:x1]


@partial(jax.jit, static_argnums=(1, 2))
def mirror(src: jnp.ndarray, width: int, codec: Codec) -> jnp.ndarray:
    """Horizontal mirror (ref: capture_filter/mirror.c).

    Reverses pixel blocks; within UYVY blocks, swaps the two lumas.
    """
    info = get_codec_info(codec)
    bpx, bby = info.block_size_pixels, info.block_size_bytes
    h = src.shape[0]
    nb = width // bpx
    g = src[:, : nb * bby].reshape(h, nb, bby)
    g = g[:, ::-1]
    if codec in (Codec.UYVY,):
        g = g[..., jnp.array([0, 3, 2, 1])]  # U Y1 V Y0
    elif codec in (Codec.YUYV,):
        g = g[..., jnp.array([2, 1, 0, 3])]
    return g.reshape(h, nb * bby)


@jax.jit
def flip(src: jnp.ndarray) -> jnp.ndarray:
    """Vertical flip (ref: capture_filter/flip.c)."""
    return src[::-1]


# ---------------------------------------------------------------------------
# gamma / grayscale / color matrix (ref: capture_filter/gamma.cpp,
# grayscale, matrix.cpp)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1,))
def gamma_correct(src: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Per-byte gamma LUT on 8-bit components (RGB-family frames)."""
    lut = jnp.round(((jnp.arange(256, dtype=jnp.float32) / 255.0) ** gamma) * 255.0).astype(jnp.uint8)
    # 256-entry gather is slow on TPU; compute directly instead
    x = src.astype(jnp.float32) / 255.0
    return jnp.round((x**gamma) * 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnums=(1, 2))
def grayscale(src: jnp.ndarray, width: int, codec: Codec) -> jnp.ndarray:
    """Neutralize chroma (UYVY) or desaturate via BT.709 luma (RGB)."""
    if codec in (Codec.UYVY, Codec.YUYV):
        h = src.shape[0]
        g = src[:, : 2 * width].reshape(h, width // 2, 4)
        if codec == Codec.UYVY:
            g = g.at[..., 0].set(128).at[..., 2].set(128)
        else:
            g = g.at[..., 1].set(128).at[..., 3].set(128)
        return g.reshape(h, 2 * width)
    if codec in (Codec.RGB, Codec.RGBA):
        ncomp = 3 if codec == Codec.RGB else 4
        h = src.shape[0]
        px = src[:, : ncomp * width].reshape(h, width, ncomp).astype(jnp.float32)
        y = 0.2126 * px[..., 0] + 0.7152 * px[..., 1] + 0.0722 * px[..., 2]
        y8 = jnp.round(y).astype(jnp.uint8)
        out = px.astype(jnp.uint8).at[..., 0].set(y8).at[..., 1].set(y8).at[..., 2].set(y8)
        return out.reshape(h, ncomp * width)
    raise ValueError(f"grayscale: unsupported codec {codec}")


def color_matrix(src: jnp.ndarray, width: int, codec: Codec, matrix: np.ndarray) -> jnp.ndarray:
    """3x3 color matrix on RGB(A) pixels (ref: capture_filter/matrix.cpp)."""
    ncomp = 3 if codec == Codec.RGB else 4
    h = src.shape[0]
    px = src[:, : ncomp * width].reshape(h, width, ncomp).astype(jnp.float32)
    rgb = px[..., :3] @ jnp.asarray(matrix, dtype=jnp.float32).T
    rgb = jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
    if ncomp == 4:
        out = jnp.concatenate([rgb, px[..., 3:4].astype(jnp.uint8)], axis=-1)
    else:
        out = rgb
    return out.reshape(h, ncomp * width)


def blank_region(src: jnp.ndarray, width: int, codec: Codec, x: int, y: int, w: int, h: int, color: int = 0) -> jnp.ndarray:
    """Blank a rectangle (ref: capture_filter/blank.cpp)."""
    info = get_codec_info(codec)
    bpx, bby = info.block_size_pixels, info.block_size_bytes
    x0, x1 = x // bpx * bby, (x + w) // bpx * bby
    if codec in (Codec.UYVY, Codec.YUYV):
        fill = np.tile(np.array([128, 16, 128, 16] if codec == Codec.UYVY else [16, 128, 16, 128], np.uint8), (x1 - x0) // 4)
    else:
        fill = np.full(x1 - x0, color, np.uint8)
    return src.at[y : y + h, x0:x1].set(jnp.asarray(fill)[None, :])


def logo_blit(src: jnp.ndarray, width: int, codec: Codec, logo_rgba: np.ndarray, x: int, y: int) -> jnp.ndarray:
    """Alpha-blend an RGBA logo onto an RGB(A) frame (ref: capture_filter/logo.cpp)."""
    ncomp = 3 if codec == Codec.RGB else 4
    h = src.shape[0]
    px = src[:, : ncomp * width].reshape(h, width, ncomp).astype(jnp.float32)
    lh, lw = logo_rgba.shape[0], logo_rgba.shape[1]
    logo = jnp.asarray(logo_rgba, dtype=jnp.float32)
    alpha = logo[..., 3:4] / 255.0
    region = px[y : y + lh, x : x + lw, :3]
    blended = region * (1 - alpha) + logo[..., :3] * alpha
    px = px.at[y : y + lh, x : x + lw, :3].set(blended)
    return jnp.round(px).astype(jnp.uint8).reshape(h, ncomp * width)


def add_noise(src: jnp.ndarray, key, amount: int = 16) -> jnp.ndarray:
    """Additive uniform noise (ref: capture_filter/noise.cpp)."""
    noise = jax.random.randint(key, src.shape, -amount, amount + 1, dtype=jnp.int32)
    return jnp.clip(src.astype(jnp.int32) + noise, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# double framerate (temporal deinterlace) helper
# ---------------------------------------------------------------------------


def fields_to_frames(src: jnp.ndarray, codec: Codec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split an interlaced-merged frame into two bob-doubled frames
    (ref: vo_postprocess double-framerate via putf timeout)."""
    return deinterlace_bob_even(src), deinterlace_bob_odd(src)


def matrix2_uyvy(src: jnp.ndarray, width: int, matrix: np.ndarray) -> jnp.ndarray:
    """3x3 matrix on unpacked YCbCr of a UYVY frame (ref:
    capture_filter/matrix2.c apply_to_uyvy): offsets Y-16 / C-128, the
    chroma rows use the two luma samples averaged, output truncated like the
    C double->uchar assignment (clamped to byte range)."""
    m = np.asarray(matrix, np.float64).reshape(9)
    h = src.shape[0]
    g = src[:, : 2 * width].reshape(h, width // 2, 4).astype(jnp.float64)
    u = g[..., 0] - 128.0
    y1 = g[..., 1] - 16.0
    v = g[..., 2] - 128.0
    y2 = g[..., 3] - 16.0
    y = (y1 + y2) / 2.0
    ou = 128.0 + m[3] * y + m[4] * u + m[5] * v
    oy1 = 16.0 + m[0] * y1 + m[1] * u + m[2] * v
    ov = 128.0 + m[6] * y + m[7] * u + m[8] * v
    oy2 = 16.0 + m[0] * y2 + m[1] * u + m[2] * v
    out = jnp.stack([ou, oy1, ov, oy2], axis=-1)
    out = jnp.clip(jnp.trunc(out), 0, 255).astype(jnp.uint8)
    return out.reshape(h, 2 * width)


def scale_bilinear_rgb(src: jnp.ndarray, width: int, codec: Codec, new_w: int, new_h: int) -> jnp.ndarray:
    """Bilinear resample of an RGB(A) frame (ref: swmix interpolation,
    src/video_capture/swmix.c:208 — bilinear mode; bicubic is a GL shader)."""
    ncomp = 3 if codec == Codec.RGB else 4
    h = src.shape[0]
    px = src[:, : ncomp * width].reshape(h, width, ncomp).astype(jnp.float32)
    ys = (jnp.arange(new_h) + 0.5) * (h / new_h) - 0.5
    xs = (jnp.arange(new_w) + 0.5) * (width / new_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, width - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = px[y0][:, x0]
    b = px[y0][:, x1]
    c = px[y1][:, x0]
    d = px[y1][:, x1]
    out = (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
           + c * wy * (1 - wx) + d * wy * wx)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8).reshape(new_h, ncomp * new_w)
