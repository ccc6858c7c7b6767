"""Pallas TPU kernels for the hot entropy-coding path.

The JPEG per-block bit packer is memory-traffic-bound as plain XLA (the
[nblocks, W] accumulator streams through HBM on every one of the 65 unrolled
steps).  In Pallas the accumulator lives in VMEM for the whole tile, so HBM
traffic drops to "read symbols once, write slots once".

Layout notes: symbol inputs arrive slot-major [65, nblocks] so the in-kernel
fori_loop dynamic-slices along the sublane (major) dimension; blocks ride the
128-wide lane dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024


def _pack_kernel(hi_ref, lo_ref, ln_ref, off_ref, slots_ref, bits_ref, wwords: int):
    nslots = hi_ref.shape[0]
    tile = hi_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wwords), dimension=1)

    def body(si, acc):
        s_hi = hi_ref[si, :]
        s_lo = lo_ref[si, :]
        s_ln = ln_ref[si, :]
        s_off = off_ref[si, :]
        t = (s_off & 31).astype(jnp.uint32)
        w0 = s_off >> 5
        r = jnp.uint32(96) - s_ln.astype(jnp.uint32) - t
        a = (r >> 5).astype(jnp.int32)
        s = r & 31
        # (jnp.maximum on uint32 lowers to arith.maxui which Mosaic rejects)
        smax = jnp.where(s == 0, jnp.uint32(1), s)
        lo_ls = jnp.where(s == 0, s_lo, s_lo << s)
        carry = jnp.where(s == 0, 0, s_lo >> (32 - smax))
        hi_ls = jnp.where(s == 0, s_hi, (s_hi << s) | carry)
        top = jnp.where(s == 0, 0, s_hi >> (32 - smax))
        x0 = jnp.where(a == 0, top, jnp.where(a == 1, hi_ls, lo_ls))
        x1 = jnp.where(a == 0, hi_ls, jnp.where(a == 1, lo_ls, 0))
        x2 = jnp.where(a == 0, lo_ls, 0)
        live = s_ln > 0
        x0 = jnp.where(live, x0, 0)
        x1 = jnp.where(live, x1, 0)
        x2 = jnp.where(live, x2, 0)
        w0c = w0[:, None]
        contrib = (
            jnp.where(iota == w0c, x0[:, None], 0)
            | jnp.where(iota == w0c + 1, x1[:, None], 0)
            | jnp.where(iota == w0c + 2, x2[:, None], 0)
        )
        return acc | contrib

    acc = jax.lax.fori_loop(0, nslots, body, jnp.zeros((tile, wwords), jnp.uint32))
    slots_ref[:, :] = acc
    bits_ref[0, :] = off_ref[nslots - 1, :] + ln_ref[nslots - 1, :]


def pack_block_slots_pallas(hi, lo, ln, wwords: int, interpret: bool = False):
    """Pallas version of ops.jpeg._pack_block_slots (same outputs)."""
    nbt, nslots = hi.shape
    cum = jnp.cumsum(ln, axis=1)
    off = cum - ln
    overflow = jnp.max(cum[:, -1]) > wwords * 32

    pad = (-nbt) % _TILE
    hi_t = jnp.pad(hi, ((0, pad), (0, 0))).T
    lo_t = jnp.pad(lo, ((0, pad), (0, 0))).T
    ln_t = jnp.pad(ln, ((0, pad), (0, 0))).T
    off_t = jnp.pad(off, ((0, pad), (0, 0))).T
    n = nbt + pad
    grid = (n // _TILE,)
    spec_in = pl.BlockSpec((nslots, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    slots, bits = pl.pallas_call(
        partial(_pack_kernel, wwords=wwords),
        grid=grid,
        in_specs=[spec_in, spec_in, spec_in, spec_in],
        out_specs=[
            pl.BlockSpec((_TILE, wwords), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, wwords), jnp.uint32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(hi_t, lo_t, ln_t, off_t)
    return slots[:nbt], bits[0, :nbt], overflow
