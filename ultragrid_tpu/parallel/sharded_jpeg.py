"""Spatially-sharded JPEG encode: one frame split across a device mesh.

The TPU-native analogue of the reference's tiled-4K/8K multi-GPU mode
(ref: src/utils/video.c:67-74 — tiles as independent substreams;
src/host.h:98 — tiles round-robined over CUDA devices).  Here the frame's MCU
rows shard over the mesh's 'spatial' axis via shard_map; restart intervals are
chosen to divide the per-shard MCU count, so every shard's entropy stream is
independent and the concatenated per-block slots are bit-identical to a
single-device encode.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ultragrid_tpu.ops.jpeg import JpegEncoder
from ultragrid_tpu.types import Codec


class ShardedJpegEncoder:
    """JPEG encode over the 'spatial' axis of a mesh (rows -> devices)."""

    def __init__(
        self,
        width: int,
        height: int,
        mesh: Mesh,
        in_codec: Codec = Codec.UYVY,
        quality: int = 80,
    ):
        self.mesh = mesh
        nshards = mesh.shape["spatial"]
        assert height % (8 * nshards) == 0, "height must split into MCU rows per shard"
        local_h = height // nshards
        # pick a restart interval that divides the per-shard MCU count so
        # segments never span shard boundaries
        probe = JpegEncoder(width, local_h, in_codec=in_codec, quality=quality)
        nmcux = probe.nmcux
        ri = probe.restart_interval
        while nmcux % ri:
            ri -= 1
        self.local = JpegEncoder(
            width, local_h, in_codec=in_codec, quality=quality, restart_interval=ri
        )
        # a full-frame encoder clone for header/assembly metadata
        self.full = JpegEncoder(
            width, height, in_codec=in_codec, quality=quality, restart_interval=ri
        )
        self.nshards = nshards
        self._sharded_cache = {}
        self._sharded = self._build_sharded(self.local.wwords)

    def _build_sharded(self, wwords: int):
        cached = self._sharded_cache.get(wwords)
        if cached is not None:
            return cached
        local_fn = self.local._encode_cache.setdefault(
            wwords, self.local._build_encode(wwords)
        )

        def wrapped(frame):
            out = local_fn(frame)
            return out[:-1]  # drop per-shard overflow (checked via bits cap)

        fn = jax.jit(
            shard_map(
                wrapped,
                mesh=self.mesh,
                in_specs=P("spatial", None),
                out_specs=(
                    P("spatial", None), P("spatial"),
                    P("spatial", None), P("spatial"),
                    P("spatial", None), P("spatial"),
                ),
                # the fused Pallas kernel's out_shape structs carry no vma
                # annotation; outputs are plainly per-shard ("spatial")
                check_vma=False,
            )
        )
        self._sharded_cache[wwords] = fn
        return fn

    def encode_device(self, frame):
        """frame: uint8 [H, linesize] (sharded or replicated) -> parts."""
        frame = jax.device_put(
            frame, NamedSharding(self.mesh, P("spatial", None))
        ) if not hasattr(frame, "sharding") else frame
        return self._sharded(frame)

    def _escalate(self) -> None:
        """Double the slot window on overflow (mirrors
        JpegEncoder.escalate_and_retry; keeps local/full/assembly in step)."""
        ww = min(self.local.wwords * 2, 64)
        self.local.wwords = self.full.wwords = ww
        self._sharded = self._build_sharded(ww)

    def encode(self, frame) -> np.ndarray:
        frame = jnp.asarray(frame)
        parts = self.encode_device(frame)
        cap = self.local.wwords * 32
        while self.local.wwords < 64 and max(
            int(jnp.max(parts[i])) for i in (1, 3, 5)
        ) > cap:
            self._escalate()
            parts = self.encode_device(frame)
            cap = self.local.wwords * 32
        body = self.full.assemble(*(np.asarray(p) for p in parts))
        return np.concatenate(
            [
                np.frombuffer(self.full._header, dtype=np.uint8),
                body,
                np.frombuffer(b"\xff\xd9", dtype=np.uint8),
            ]
        )


class ShardedJpegDecoder:
    """Receive-side twin of ShardedJpegEncoder: the host C entropy decode
    fills per-MCU coefficient blocks, which shard over the mesh's 'spatial'
    axis (MCU rows are independent), and the reverse mega-matmul
    (ops/jpeg.py JpegDecoder._make_mega_uyvy_fn) runs per shard under
    shard_map.  Output is bit-identical to the single-device decode.
    Multi-chip analogue of the reference's per-GPU tile decompress
    (src/video_decompress/gpujpeg.c; tiles over CUDA devices, src/host.h:98).
    """

    def __init__(self, mesh: Mesh):
        from ultragrid_tpu.ops.jpeg import JpegDecoder

        self.mesh = mesh
        self.nshards = mesh.shape["spatial"]
        self._single = JpegDecoder()
        self._fns = {}

    def decode_to_uyvy(self, data: bytes):
        """Returns (uyvy [H, 2W] uint8, h, w) — sharded over 'spatial' when
        the geometry splits, else the single-device fast path."""
        from ultragrid_tpu.ops.jpeg import entropy_decode_422

        decoded = entropy_decode_422(data)
        if decoded is None:
            return self._single.decode_to_uyvy(data)
        hdr, outs, nmcux, nmcuy = decoded
        ns = self.nshards
        if nmcuy % ns:
            return self._single.decode_to_uyvy(data)
        scan = hdr["scan"]
        stacked = [
            jax.device_put(
                o.reshape(ns, -1, 64),
                NamedSharding(self.mesh, P("spatial", None, None)),
            )
            for o in outs
        ]
        qsig = tuple(hdr["qtabs"][c["tq"]].tobytes() for c in scan)
        key = (hdr["h"], hdr["w"], qsig)
        fn = self._fns.get(key)
        if fn is None:
            local = self._single._make_mega_uyvy_fn(hdr, nmcux, nmcuy // ns)

            def wrapped(cy, cu, cv):
                return local(cy[0], cu[0], cv[0])

            fn = self._fns[key] = jax.jit(
                shard_map(
                    wrapped,
                    mesh=self.mesh,
                    in_specs=(P("spatial", None, None),) * 3,
                    out_specs=P("spatial", None),
                )
            )
        uyvy = fn(*stacked)
        return uyvy, hdr["h"], hdr["w"]


class ShardedSenderStep:
    """The FULL multi-chip sender step as ONE shard_map graph: per-device
    JPEG encode of the frame's row band + per-device LDGM parity over that
    band's slot container.  Every output is per-shard — nothing is gathered
    across devices, which is the real deployment shape: each device's band
    is an independent RTP substream (ref: tiled-4K substream IDs,
    src/transmit.c:490; tiles round-robined over devices, src/host.h:98),
    packetized straight from that device's memory.

    Per-shard outputs are bit-identical to a single-chip encode of the same
    band (restart intervals are chosen so entropy segments never cross
    shard boundaries; asserted in tests/test_parallel.py).
    """

    def __init__(self, width: int, height: int, mesh: Mesh,
                 in_codec: Codec = Codec.UYVY, quality: int = 80,
                 k: int = 32, m: int = 8, c: int = 3):
        from ultragrid_tpu.models.encode import ldgm_container_params
        from ultragrid_tpu.ops.fec import build_ldgm_matrix, gf2_matmul

        self.base = ShardedJpegEncoder(width, height, mesh, in_codec, quality)
        self.mesh = mesh
        self.k, self.m, self.c = k, m, c
        local = self.base.local
        ww = local.wwords
        ky = {"422": 2, "420": 4}.get(local.subsampling, 1)
        n_y, n_c = local.nmcu * ky, local.nmcu
        part_words = [n_y * ww, n_y, n_c * ww, n_c, n_c * ww, n_c]
        total_bytes = sum(part_words) * 4
        ps, _ = ldgm_container_params(total_bytes, k)
        while sum(-(-(w * 4) // ps) for w in part_words) > k:
            ps += 4
        self.ps = ps
        row_counts = [-(-(w * 4) // ps) for w in part_words]
        self.row_counts = row_counts
        mask_np = build_ldgm_matrix(k, m, c, 1).astype(np.float32)
        starts = np.concatenate([[0], np.cumsum(row_counts)])
        mask_slices = [jnp.asarray(mask_np[:, starts[i]:starts[i + 1]])
                       for i in range(len(part_words))]
        local_fn = local._encode_cache.setdefault(
            ww, local._build_encode(ww))
        ps_ = ps

        def part_syms(arr_u32, rows):
            flat = arr_u32.reshape(-1)
            pad = rows * ps_ - flat.size * 4
            b = jax.lax.bitcast_convert_type(flat, jnp.uint8).reshape(-1)
            return jnp.concatenate([b, jnp.zeros(pad, jnp.uint8)]).reshape(rows, ps_)

        def local_step(frame):
            ys, ybits, us, ubits, vs, vbits, _ovf = local_fn(frame)
            parts = [
                ys, jnp.asarray(ybits, jnp.int32).view(jnp.uint32),
                us, jnp.asarray(ubits, jnp.int32).view(jnp.uint32),
                vs, jnp.asarray(vbits, jnp.int32).view(jnp.uint32),
            ]
            par = None
            for msl, p, rows in zip(mask_slices, parts, row_counts):
                pp = gf2_matmul(msl, part_syms(p, rows), False)
                par = pp if par is None else par ^ pp
            kshift = 1
            while kshift < m:
                par = par ^ jnp.pad(par, ((kshift, 0), (0, 0)))[:m]
                kshift *= 2
            return ys, ybits, us, ubits, vs, vbits, par

        self._fn = jax.jit(
            shard_map(
                local_step,
                mesh=mesh,
                in_specs=P("spatial", None),
                out_specs=(
                    P("spatial", None), P("spatial"),
                    P("spatial", None), P("spatial"),
                    P("spatial", None), P("spatial"),
                    P("spatial", None),
                ),
                check_vma=False,
            )
        )

    def __call__(self, frame):
        frame = jax.device_put(
            frame, NamedSharding(self.mesh, P("spatial", None))
        ) if not hasattr(frame, "sharding") else frame
        return self._fn(frame)
