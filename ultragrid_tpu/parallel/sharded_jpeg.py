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


def slot_container_geometry(local, k: int):
    """LDGM container geometry for one device's slot-container band.

    The per-shard payload is the encoder's six slot parts (Y/U/V slot words
    + bit counts), each padded to whole ``ps``-byte symbol rows and
    concatenated — so the receiver can slice symbol rows per part with no
    byte-stream parsing.  Returns (ps, row_counts, part_words)."""
    from ultragrid_tpu.models.encode import ldgm_container_params

    ww = local.wwords
    ky = {"422": 2, "420": 4}.get(local.subsampling, 1)
    n_y, n_c = local.nmcu * ky, local.nmcu
    part_words = [n_y * ww, n_y, n_c * ww, n_c, n_c * ww, n_c]
    total_bytes = sum(part_words) * 4
    ps, _ = ldgm_container_params(total_bytes, k)
    while sum(-(-(w * 4) // ps) for w in part_words) > k:
        ps += 4
    row_counts = [-(-(w * 4) // ps) for w in part_words]
    return ps, row_counts, part_words


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
        from ultragrid_tpu.ops.fec import build_ldgm_matrix, gf2_matmul

        self.base = ShardedJpegEncoder(width, height, mesh, in_codec, quality)
        self.mesh = mesh
        self.k, self.m, self.c = k, m, c
        local = self.base.local
        ww = local.wwords
        ky = {"422": 2, "420": 4}.get(local.subsampling, 1)
        n_y, n_c = local.nmcu * ky, local.nmcu
        ps, row_counts, part_words = slot_container_geometry(local, k)
        self.ps = ps
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


class ShardedReceiverStep:
    """The FULL multi-chip receiver step — the mirror of ShardedSenderStep.

    Each device owns one row band's substream (ref: tiled substream IDs,
    src/transmit.c:490; tiles round-robined over devices, src/host.h:98;
    receive role: src/rtp/video_decoders.cpp + ldgm decode).  Per shard:

      1. device LDGM erasure peel over that shard's [k+m, ps] symbol block
         (lossy rows zeroed) — ONE shard_map graph, the lax.while_loop peel
         running independently per device, no collective anywhere;
      2. a band-LOCAL host stage: the recovered slot container is sliced
         into the six slot parts (static row ranges — no byte-stream
         parse), assembled into that band's JPEG stream and entropy-decoded
         by the C scan decoder.  In deployment this runs on each device's
         own host core; there is no cross-band data dependence;
      3. per-shard reverse mega-matmul (IDCT + upsample + UYVY pack) under
         shard_map — the output frame stays sharded over 'spatial', ready
         for a sharded display/postprocess consumer.  Nothing is ever
         gathered across devices.

    A band whose erasures exceed the LDGM code's reach is zero-filled and
    reported in the ok mask (the receiver's standard concealment policy,
    ref: src/rtp/video_decoders.cpp blacklisting/zero-fill).  Per-shard
    byte-identity vs a single-chip decode of the same band is asserted in
    tests/test_parallel.py.
    """

    def __init__(self, width: int, height: int, mesh: Mesh,
                 in_codec: Codec = Codec.UYVY, quality: int = 80,
                 k: int = 32, m: int = 8, c: int = 3,
                 wwords: int | None = None):
        from ultragrid_tpu.ops.fec import LdgmSession
        from ultragrid_tpu.ops.jpeg import JpegDecoder, JpegEncoder

        self.mesh = mesh
        ns = mesh.shape["spatial"]
        self.nshards = ns
        assert height % (8 * ns) == 0, "height must split into MCU rows per shard"
        local_h = height // ns
        probe = JpegEncoder(width, local_h, in_codec=in_codec, quality=quality)
        ri = probe.restart_interval
        while probe.nmcux % ri:
            ri -= 1
        self.band = JpegEncoder(width, local_h, in_codec=in_codec,
                                quality=quality, restart_interval=ri)
        if wwords is not None:
            self.band.wwords = wwords
        self.k, self.m, self.c = k, m, c
        ps, row_counts, part_words = slot_container_geometry(self.band, k)
        self.ps, self.row_counts, self.part_words = ps, row_counts, part_words
        self.session = LdgmSession(k, m, c, seed=1)
        core = self.session._decode_device_fn(ps)

        def local_peel(sym, have):
            s, hv = core(sym[0], have[0])
            return s[None], hv[None]

        self._peel = jax.jit(
            shard_map(
                local_peel,
                mesh=mesh,
                in_specs=(P("spatial", None, None), P("spatial", None)),
                out_specs=(P("spatial", None, None), P("spatial", None)),
                # the peel's while_loop carries an unvarying scalar init
                # (rounds/progressed); outputs are plainly per-shard
                check_vma=False,
            )
        )
        self._dec = JpegDecoder()
        self._mega_cache = {}

    # -- band-local host stage -------------------------------------------
    def _band_arrays(self, rows: np.ndarray):
        """Recovered container rows [k, ps] -> the six slot parts."""
        starts = np.concatenate([[0], np.cumsum(self.row_counts)])
        out = []
        for i, w in enumerate(self.part_words):
            raw = rows[starts[i]:starts[i + 1]].reshape(-1)[: w * 4]
            arr = raw.view(np.uint32)
            out.append(arr.view(np.int32) if i % 2 else
                       arr.reshape(-1, self.band.wwords))
        return out

    def _assemble_band(self, rows: np.ndarray) -> bytes:
        body = self.band.assemble(*self._band_arrays(rows))
        return (self.band._header + body.tobytes() + b"\xff\xd9")

    def _mega(self, hdr, nmcux, nmcuy_band):
        qsig = tuple(hdr["qtabs"][c["tq"]].tobytes() for c in hdr["scan"])
        key = (hdr["h"], hdr["w"], qsig)
        fn = self._mega_cache.get(key)
        if fn is None:
            local = self._dec._make_mega_uyvy_fn(hdr, nmcux, nmcuy_band)

            def wrapped(cy, cu, cv):
                return local(cy[0], cu[0], cv[0])

            fn = self._mega_cache[key] = jax.jit(
                shard_map(
                    wrapped,
                    mesh=self.mesh,
                    in_specs=(P("spatial", None, None),) * 3,
                    out_specs=P("spatial", None),
                )
            )
        return fn

    def __call__(self, symbols, present):
        """symbols: [nshards, k+m, ps] uint8 (missing rows arbitrary);
        present: [nshards, k+m] bool.  Returns (uyvy, ok): uyvy is the
        [H, 2W] uint8 frame SHARDED over 'spatial' (one band per device,
        never gathered); ok[s] is False for bands that could not be
        recovered (zero-filled)."""
        from ultragrid_tpu.ops.jpeg import entropy_decode_422

        ns, k = self.nshards, self.k
        sym_sh = jax.device_put(
            np.where(np.asarray(present)[:, :, None], np.asarray(symbols), 0)
            .astype(np.uint8),
            NamedSharding(self.mesh, P("spatial", None, None)),
        )
        have_sh = jax.device_put(
            np.asarray(present, bool),
            NamedSharding(self.mesh, P("spatial", None)),
        )
        sym, have = self._peel(sym_sh, have_sh)
        sym_np, have_np = np.asarray(sym), np.asarray(have)
        ok = np.zeros(ns, bool)
        coeffs = None
        hdr = nmcux = nmcuy = None
        for s in range(ns):
            if have_np[s, :k].all():
                decoded = entropy_decode_422(self._assemble_band(sym_np[s]))
                if decoded is not None:
                    hdr, outs, nmcux, nmcuy = decoded
                    if coeffs is None:
                        coeffs = [np.zeros((ns,) + o.shape, o.dtype) for o in outs]
                    for st, o in zip(coeffs, outs):
                        st[s] = o
                    ok[s] = True
        if coeffs is None:
            raise ValueError("no band recovered")
        stacked = [
            jax.device_put(c, NamedSharding(self.mesh, P("spatial", None, None)))
            for c in coeffs
        ]
        uyvy = self._mega(hdr, nmcux, nmcuy)(*stacked)
        return uyvy, ok
