"""Shared helpers for pixel-format conversion kernels.

All conversions operate on whole frames shaped ``[H, linesize]`` uint8 and are
pure jnp functions (jit/vmap/pallas friendly).  Integer math is int32 with
arithmetic shifts, matching the reference's ``comp_type_t`` semantics
(ref: src/color_space.h:70-72).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultragrid_tpu.ops.color import COMP_BASE, ColorCoeffs, Colorspace, get_color_coeffs


def groups(src: jnp.ndarray, gbytes: int) -> jnp.ndarray:
    """[H, L] uint8 -> [H, G, gbytes] int32 (whole groups only)."""
    h, l = src.shape
    g = l // gbytes
    return src[:, : g * gbytes].reshape(h, g, gbytes).astype(jnp.int32)


def pack_bytes(*byte_vals: jnp.ndarray) -> jnp.ndarray:
    """Stack per-group byte lanes [H, G] into [H, G*nbytes] uint8."""
    stacked = jnp.stack(byte_vals, axis=-1).astype(jnp.uint8)
    h = stacked.shape[0]
    return stacked.reshape(h, -1)


def le16(src_groups: jnp.ndarray) -> jnp.ndarray:
    """Assemble little-endian 16-bit values from int32 byte pairs [..., 2]."""
    return src_groups[..., 0] | (src_groups[..., 1] << 8)


def split16(v: jnp.ndarray):
    """16-bit value -> (lo byte, hi byte)."""
    return v & 0xFF, (v >> 8) & 0xFF


def words_u32(src: jnp.ndarray) -> jnp.ndarray:
    """[H, L] uint8 -> [H, L//4] uint32 little-endian words."""
    h, l = src.shape
    w = src[:, : (l // 4) * 4].reshape(h, l // 4, 4).astype(jnp.uint32)
    return w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16) | (w[..., 3] << 24)


def u32_to_bytes(w: jnp.ndarray) -> jnp.ndarray:
    """[H, W] uint32 -> [H, W*4] uint8 little-endian."""
    h = w.shape[0]
    b = jnp.stack([w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF], axis=-1)
    return b.astype(jnp.uint8).reshape(h, -1)


def cdiv2(x: jnp.ndarray) -> jnp.ndarray:
    """C-style ``x / 2``: truncation toward zero (not floor) for negatives."""
    return jax.lax.div(x, jnp.int32(2))


def clamp(v: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    return jnp.clip(v, lo, hi)


def clamp_full(v: jnp.ndarray, depth: int) -> jnp.ndarray:
    """CLAMP_FULL (ref: src/color_space.h:96-98): SDI full-range limits."""
    return jnp.clip(v, 1 << (depth - 8), (255 << (depth - 8)) - 1)


def shr(v: jnp.ndarray, n: int) -> jnp.ndarray:
    """Arithmetic shift right (int32)."""
    return jnp.right_shift(v, n)


def rgb_to_y(c: ColorCoeffs, r, g, b):
    return r * c.y_r + g * c.y_g + b * c.y_b


def rgb_to_cb(c: ColorCoeffs, r, g, b):
    return r * c.cb_r + g * c.cb_g + b * c.cb_b


def rgb_to_cr(c: ColorCoeffs, r, g, b):
    return r * c.cr_r + g * c.cr_g + b * c.cr_b


def ycbcr_to_r(c: ColorCoeffs, y_scaled, cb, cr):
    return y_scaled + cr * c.r_cr


def ycbcr_to_g(c: ColorCoeffs, y_scaled, cb, cr):
    return y_scaled + cb * c.g_cb + cr * c.g_cr


def ycbcr_to_b(c: ColorCoeffs, y_scaled, cb, cr):
    return y_scaled + cb * c.b_cb


def dfl_coeffs(depth: int) -> ColorCoeffs:
    return get_color_coeffs(Colorspace.DFL, depth)
