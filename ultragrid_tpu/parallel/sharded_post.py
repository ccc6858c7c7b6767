"""Spatially-sharded postprocess with halo exchange over the mesh.

The reference scales frame *size* (not batch) by splitting one frame into
independently-processed tiles (SURVEY §5 long-context analogue;
ref: vf_split/vf_merge_tiles, src/utils/vf_split.h:64-76).  Filters whose
output row depends on the NEXT input row — deinterlace blend/linear
(ref: vc_deinterlace_ex, src/video_codec.c:82-85) — need one halo row from
the neighbouring shard.  Here that halo rides the ICI as a single
``lax.ppermute`` of one row per device instead of any host gather: each
shard sends its first row to its predecessor, the last shard substitutes
its own last row (the reference's self-blend boundary).

Bit-identical to the single-device ops in ``ops/postprocess`` (tested on
the virtual 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ultragrid_tpu.ops.postprocess import _avg_lines
from ultragrid_tpu.types import Codec


def _halo_next_row(blk: jnp.ndarray, axis: str,
                   self_boundary: jnp.ndarray) -> jnp.ndarray:
    """First row of the NEXT shard; the last shard (which has no next) gets
    ``self_boundary`` — the reference's blend-with-itself edge behavior."""
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    from_next = jax.lax.ppermute(
        blk[:1], axis, [(i, i - 1) for i in range(1, n)]
    )
    return jnp.where(idx == n - 1, self_boundary, from_next)


def _blend_block(blk: jnp.ndarray, codec: Codec, axis: str) -> jnp.ndarray:
    nxt = jnp.concatenate(
        [blk[1:], _halo_next_row(blk, axis, blk[-1:])], axis=0)
    return _avg_lines(blk, nxt, codec)


def _linear_block(blk: jnp.ndarray, codec: Codec, axis: str) -> jnp.ndarray:
    # shard heights are even, so local line parity == global line parity and
    # the next shard's row 0 is the next EVEN line — the same single-row
    # halo; the frame's last even line (blk[-2]) self-interpolates
    even = blk[0::2]
    nxt = jnp.concatenate(
        [even[1:], _halo_next_row(blk, axis, blk[-2:-1])], axis=0)
    interp = _avg_lines(even, nxt, codec)
    out = jnp.stack([even, interp], axis=1).reshape(-1, blk.shape[1])
    return out[: blk.shape[0]]


_KINDS = {"blend": _blend_block, "linear": _linear_block}


from functools import lru_cache


@lru_cache(maxsize=64)
def make_sharded_deinterlace(mesh: Mesh, codec: Codec, kind: str = "blend"):
    """Jitted [H, linesize] -> [H, linesize] deinterlace, rows sharded over
    the mesh's 'spatial' axis with a one-row ppermute halo exchange."""
    block = partial(_KINDS[kind], codec=codec, axis="spatial")
    fn = shard_map(
        block,
        mesh=mesh,
        in_specs=P("spatial", None),
        out_specs=P("spatial", None),
    )
    return jax.jit(fn)


def sharded_deinterlace(frame, codec: Codec, mesh: Mesh,
                        kind: str = "blend") -> np.ndarray:
    """Convenience wrapper: shard, run, gather."""
    n = mesh.shape["spatial"]
    h = np.asarray(frame).shape[0]
    if h % n or (h // n) % 2:
        raise ValueError(
            f"height {h} must split into even-height blocks over {n} shards")
    dev = jax.device_put(jnp.asarray(frame),
                         NamedSharding(mesh, P("spatial", None)))
    return np.asarray(make_sharded_deinterlace(mesh, codec, kind)(dev))
