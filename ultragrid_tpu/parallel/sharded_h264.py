"""Mesh-sharded own-H.264 intra encode: one slice per device.

H.264 slices reset intra prediction and CAVLC contexts, so a horizontal
band encodes exactly like a standalone frame of its height — each device
on the mesh's 'spatial' axis runs the per-band jit graph (ops/h264_tpu)
over its own rows and the host emits one slice NAL per shard.  The TPU
twin of the reference's per-tile compress fan-out
(src/video_compress.cpp:79-120 task_run_async per tile), and the H.264
counterpart of parallel/sharded_jpeg.py's restart-aligned sharding.

Bit-identical to the host encoder with ``slices=nshards``
(tests/test_parallel.py).
"""

from __future__ import annotations

import numpy as np

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ultragrid_tpu.ops import h264 as H
from ultragrid_tpu.ops.h264_tpu import make_device_encode


class ShardedH264Encoder:
    def __init__(self, width: int, height: int, mesh: Mesh, qp: int = 26,
                 wwords: int = 80):
        self.mesh = mesh
        self.width, self.height = width, height
        self.qp = qp
        self.wwords = wwords
        self.mb_w = (width + 15) // 16
        self.mb_h = (height + 15) // 16
        nshards = mesh.shape["spatial"]
        assert self.mb_h % nshards == 0, "MB rows must split evenly over shards"
        self.nshards = nshards
        self.band_mbh = self.mb_h // nshards
        self.headers = H.make_sps(width, height) + H.make_pps(qp)
        self._sharded_cache = {}
        self._sharded = self._build(wwords)

    def _build(self, wwords: int):
        fn = self._sharded_cache.get(wwords)
        if fn is not None:
            return fn
        band = make_device_encode(self.width, self.band_mbh * 16, self.qp, wwords)

        def local(y, cb, cr):
            w, b, ovf = band(y, cb, cr)
            return w, b, ovf.reshape(1)

        fn = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P("spatial", None), P("spatial", None), P("spatial", None)),
                out_specs=(P("spatial", None), P("spatial"), P("spatial")),
                check_vma=False,
            )
        )
        self._sharded_cache[wwords] = fn
        return fn

    def _band_header_row(self, first_mb: int, wwords: int):
        hw = H.BitWriter()
        H._slice_header(hw, first_mb, 0, 0, disable_deblock=True)
        nbits = len(hw.bytes) * 8 + hw.nbits
        bits = int.from_bytes(bytes(hw.bytes), "big") << hw.nbits | hw.acc
        bits <<= (-nbits) % 32
        nw = (nbits + 31) // 32
        row = np.zeros(wwords, np.uint32)
        for i in range(nw):
            row[i] = (bits >> (32 * (nw - 1 - i))) & 0xFFFFFFFF
        return row, nbits

    def encode(self, frame: np.ndarray) -> bytes:
        """UYVY [H, 2W] -> Annex-B access unit (one slice per shard)."""
        import ctypes

        from ultragrid_tpu.native import h264_assemble_lib

        y, cb, cr = H._pad_to_mb(*H.uyvy_to_i420(np.asarray(frame), self.width, self.height))
        sh = NamedSharding(self.mesh, P("spatial", None))
        yj = jax.device_put(jnp.asarray(y), sh)
        cbj = jax.device_put(jnp.asarray(cb), sh)
        crj = jax.device_put(jnp.asarray(cr), sh)
        words, bits, ovf = self._sharded(yj, cbj, crj)
        while bool(np.asarray(ovf).any()) and self.wwords < 1024:
            self.wwords *= 2
            self._sharded = self._build(self.wwords)
            words, bits, ovf = self._sharded(yj, cbj, crj)
        wn = np.asarray(words)
        bn = np.asarray(bits).astype(np.int32)
        W = wn.shape[1]
        lib = h264_assemble_lib()
        nmb_band = self.band_mbh * self.mb_w
        out = [self.headers]
        start = b"\x00\x00\x00\x01" + bytes([(3 << 5) | 5])
        for s in range(self.nshards):
            hdr_row, hdr_bits = self._band_header_row(s * nmb_band, W)
            bw = np.ascontiguousarray(
                np.concatenate([hdr_row[None, :], wn[s * nmb_band : (s + 1) * nmb_band]]))
            bb = np.ascontiguousarray(
                np.concatenate([[hdr_bits], bn[s * nmb_band : (s + 1) * nmb_band]]).astype(np.int32))
            total_bits = int(bb.sum())
            cap = total_bits // 8 + total_bits // 64 + 64
            buf = np.empty(cap, np.uint8)
            n = lib.h264_assemble(bw.ctypes.data, bb.ctypes.data, bw.shape[0], W,
                                  buf.ctypes.data, cap)
            if n < 0:
                raise RuntimeError("h264_assemble: buffer too small")
            out.append(start + buf[:n].tobytes())
        return b"".join(out)
