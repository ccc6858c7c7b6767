"""The flagship encode pipeline: frame -> convert -> compress -> FEC.

This is the sender hot path of the reference (capture thread -> compress ->
fec_encode, ref: src/rxtx.cpp:181-287, src/rxtx/ultragrid_rtp.c:207-255)
re-designed as ONE fused jit graph over HBM-resident frames: no host
round-trips between stages.

FEC placement (TPU-first analysis, see PERF.md "device FEC"):

* Fixed-size payloads (uncompressed / DXT): the LDGM/RS container has a
  static shape, so parity is computed IN the same jit graph, bit-exact with
  the host `LdgmSession.encode` wire layout ([u32 len][data][pad][parity],
  ref: ldgm/src/ldgm-session.cpp:123-176).
* JPEG: the reference's LDGM protects the *assembled, byte-stuffed* JPEG
  stream.  Byte stuffing is value-dependent (0xFF -> FF 00 shifts every
  later byte), so a wire-exact device FEC would need data-dependent
  scatter/gather — the one primitive class that does not map to the TPU
  (measured ~9 ns/element, PERF.md).  Two supported modes instead:
    - RTP egress: host C assembler + C XOR LDGM overlap the device encode of
      the next frame (pipelined sender; wire-exact with the reference).
    - Device egress (chip-to-chip over ICI, or PCIe hosts that prefer device
      FLOPs): the fused graph ALSO emits LDGM parity over the slot-aligned
      entropy container (slots + bit counts), protecting the frame while it
      is still device-resident.  `fec="ldgm:k:m:c"` + `compress="jpeg"`
      builds this graph; `__graft_entry__.entry()` compiles it.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, VideoDesc, vc_get_linesize


@dataclasses.dataclass(frozen=True)
class EncodeConfig:
    in_codec: Codec = Codec.UYVY
    work_codec: Codec = Codec.RGB  # conversion target before compression
    compress: str = "none"  # none | dxt1 | dxt5 | jpeg
    quality: int = 80
    # JPEG chroma subsampling: None = encoder default (4:2:2 for UYVY/YUYV,
    # 4:4:4 for RGB); "420" | "422" | "444" to force
    subsampling: Optional[str] = None
    fec: str = "none"  # none | ldgm:k:m:c | rs:k:n
    # optional device pre-scale (BASELINE config #5: capture -> scale ->
    # JPEG -> LDGM as ONE graph); None = encode at capture resolution
    scale_to: Optional[Tuple[int, int]] = None


def _parse_fec(spec: str):
    """Returns ("ldgm", k, m, c) | ("rs", k, n) | None."""
    if spec in ("", "none", None):
        return None
    name, _, rest = spec.partition(":")
    parts = [int(p) for p in rest.split(":") if p] if rest else []
    if name == "ldgm":
        k = parts[0] if len(parts) > 0 else 512
        m = parts[1] if len(parts) > 1 else 384
        c = parts[2] if len(parts) > 2 else 5
        return ("ldgm", k, m, c)
    if name == "rs":
        k = parts[0] if parts else 200
        n = parts[1] if len(parts) > 1 else 240
        return ("rs", k, n)
    raise ValueError(f"unsupported device FEC {spec!r}")


def _container_symbols(payload_u8: jnp.ndarray, frame_size: int, k: int, ps: int):
    """[u32 len][payload][zero pad] -> [k, ps] uint8 symbols (the reference
    LDGM buffer layout, ldgm-session.cpp:123-176).  frame_size/k/ps static."""
    hdr = jnp.asarray(np.frombuffer(np.uint32(frame_size).tobytes(), dtype=np.uint8))
    flat = payload_u8.reshape(-1)
    pad = k * ps - 4 - flat.size
    data = jnp.concatenate([hdr, flat, jnp.zeros(pad, jnp.uint8)])
    return data.reshape(k, ps)


def ldgm_container_params(frame_size: int, k: int) -> Tuple[int, int]:
    """(symbol size ps, padded data size) per ldgm-session.cpp encode_frame."""
    align = k * 4
    data_size = frame_size + 4
    if data_size % align:
        data_size = (data_size // align + 1) * align
    return data_size // k, data_size


class EncodePipeline:
    """Builds a jittable step for a fixed video description."""

    def __init__(self, desc: VideoDesc, config: EncodeConfig = EncodeConfig()):
        self.desc = desc
        self.config = config
        self.jpeg_encoder = None
        self.fec_desc = None  # (kind, params...) when fec is fused
        self._step = self._build()

    # -- fused FEC helpers -----------------------------------------------

    def _make_ldgm_parity(self, k: int, m: int, c: int):
        from ultragrid_tpu.ops.fec import build_ldgm_matrix, gf2_matmul

        mask = jnp.asarray(build_ldgm_matrix(k, m, c, 1).astype(np.float32))

        def parity(symbols_u8):
            return gf2_matmul(mask, symbols_u8, True)

        return parity

    def _make_rs_parity(self, k: int, n: int):
        from ultragrid_tpu.ops.fec import _gf2_companion_expand, gf256_matmul

        bitmat = jnp.asarray(_gf2_companion_expand(k, n))

        def parity(symbols_u8):
            return gf256_matmul(bitmat, symbols_u8)

        return parity

    def _build(self) -> Callable:
        desc, cfg = self.desc, self.config
        width = desc.width
        fec = _parse_fec(cfg.fec)

        if cfg.compress == "jpeg":
            from ultragrid_tpu.ops.jpeg import JpegEncoder

            enc_w, enc_h = desc.width, desc.height
            prescale = None
            if cfg.scale_to is not None:
                from ultragrid_tpu.ops.postprocess import scale_nearest

                enc_w, enc_h = cfg.scale_to

                def prescale(frame):
                    return scale_nearest(frame, desc.width, cfg.in_codec, enc_w, enc_h)

            encoder = JpegEncoder(
                enc_w, enc_h, in_codec=cfg.in_codec, quality=cfg.quality,
                subsampling=cfg.subsampling,
            )
            self.jpeg_encoder = encoder
            raw = encoder._encode_cache.setdefault(
                encoder.wwords, encoder._build_encode(encoder.wwords)
            )
            if prescale is not None:
                inner_raw = raw

                @jax.jit
                def base(frame):
                    return inner_raw.__wrapped__(prescale(frame))
            else:
                base = raw
            if fec is None:
                return base
            # fused JPEG + FEC over the slot-aligned device container: the
            # entropy words + per-block bit counts, protected while still
            # device-resident (see module docstring for when this container
            # vs the host wire path applies)
            if fec[0] != "ldgm":
                raise ValueError("device-fused JPEG FEC supports ldgm only")
            _, k, m, c = fec
            ww = encoder.wwords
            ky = {"422": 2, "420": 4}.get(encoder.subsampling, 1)
            n_y = encoder.nmcu * ky
            n_c = encoder.nmcu
            part_words = [
                n_y * ww, n_y,      # y slots, y bits
                n_c * ww, n_c,      # u slots, u bits
                n_c * ww, n_c,      # v slots, v bits
            ]
            # Device-native container: each part starts on a fresh symbol row
            # (so parity = XOR of per-part sub-matmuls — no 70 MB concat, no
            # misaligned byte header; both measured expensive).  ps must give
            # sum(ceil(part/ps)) <= k; grow it until the per-part padding fits.
            total_bytes = sum(part_words) * 4
            ps, _ = ldgm_container_params(total_bytes, k)
            while sum(-(-(w * 4) // ps) for w in part_words) > k:
                ps += 4
            row_counts = [-(-(w * 4) // ps) for w in part_words]
            from ultragrid_tpu.ops.fec import (
                build_ldgm_matrix,
                gf2_matmul,
                make_gf2_parity_pallas,
            )

            mask_np = build_ldgm_matrix(k, m, c, 1).astype(np.float32)
            starts = np.concatenate([[0], np.cumsum(row_counts)])
            mask_slices = [
                jnp.asarray(mask_np[:, starts[i] : starts[i + 1]])
                for i in range(len(part_words))
            ]
            self.fec_desc = ("ldgm", k, m, c, ps)
            ps_words = ps // 4
            # Pallas XOR-accumulate parity on TPU (the XLA masked reduce is
            # ~5 ms at 8K container sizes); CPU keeps the XLA formulation
            from ultragrid_tpu.ops.jpeg_pallas import _HAVE_PALLAS, on_tpu

            pallas_par_fns = None
            if _HAVE_PALLAS and on_tpu():
                pallas_par_fns = [
                    make_gf2_parity_pallas(
                        mask_np[:, starts[i] : starts[i + 1]], ps_words
                    )
                    for i in range(len(part_words))
                ]

            inner = encoder._build_encode(ww)
            inner_fn = inner.__wrapped__
            if prescale is not None:
                _plain = inner_fn

                def inner_fn(frame):
                    return _plain(prescale(frame))

            def part_syms(arr_u32, rows):
                flat = arr_u32.reshape(-1)
                pad = rows * ps_words - flat.size
                padded = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint32)])
                return jax.lax.bitcast_convert_type(
                    padded.reshape(rows, ps_words), jnp.uint8
                ).reshape(rows, ps)

            def part_syms_u32(arr_u32, rows):
                flat = arr_u32.reshape(-1)
                pad = rows * ps_words - flat.size
                padded = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint32)])
                return padded.reshape(rows, ps_words)

            def step(frame):
                ys, ybits, us, ubits, vs, vbits, ovf = inner_fn(frame)
                parts = [
                    ys, jnp.asarray(ybits, jnp.int32).view(jnp.uint32),
                    us, jnp.asarray(ubits, jnp.int32).view(jnp.uint32),
                    vs, jnp.asarray(vbits, jnp.int32).view(jnp.uint32),
                ]
                par = None
                if pallas_par_fns is not None:
                    for pfn, p, rows in zip(pallas_par_fns, parts, row_counts):
                        pp = pfn(part_syms_u32(p, rows))
                        par = pp if par is None else par ^ pp
                else:
                    for msl, p, rows in zip(mask_slices, parts, row_counts):
                        pp = gf2_matmul(msl, part_syms(p, rows), False)
                        par = pp if par is None else par ^ pp
                # staircase accumulation over the m parity rows
                kshift = 1
                while kshift < m:
                    par = par ^ jnp.pad(par, ((kshift, 0), (0, 0)))[:m]
                    kshift *= 2
                if pallas_par_fns is not None:
                    # words -> the wire's byte layout (little-endian match)
                    par = jax.lax.bitcast_convert_type(par, jnp.uint8).reshape(m, ps)
                return ys, ybits, us, ubits, vs, vbits, par, ovf

            return jax.jit(step)

        def step(frame: jnp.ndarray):
            data = frame
            if cfg.work_codec != cfg.in_codec and cfg.compress == "none":
                data = pixfmt.convert_frame(data, width, cfg.in_codec, cfg.work_codec)
            if cfg.compress == "dxt1":
                from ultragrid_tpu.ops.dxt import dxt1_encode_uyvy, dxt1_encode_rgb

                if cfg.in_codec == Codec.UYVY:
                    data = dxt1_encode_uyvy(data, width)
                else:
                    data = dxt1_encode_rgb(data, width)
            elif cfg.compress == "dxt5":
                from ultragrid_tpu.ops.dxt import dxt5_ycocg_encode_rgb

                data = dxt5_ycocg_encode_rgb(data, width)
            return data

        if fec is None:
            return jax.jit(step)

        # fixed-size payload: FEC fused into the SAME graph, wire-exact with
        # the host LdgmSession/RsSession buffer layout
        if cfg.compress == "dxt1":
            out_bytes = desc.width * desc.height // 2
        elif cfg.compress == "dxt5":
            out_bytes = desc.width * desc.height
        else:
            out_bytes = desc.height * vc_get_linesize(desc.width, cfg.work_codec)
        if fec[0] == "ldgm":
            _, k, m, c = fec
            ps, _ = ldgm_container_params(out_bytes, k)
            parity_fn = self._make_ldgm_parity(k, m, c)
            self.fec_desc = ("ldgm", k, m, c, ps)
        else:
            _, k, n = fec
            ps = -(-(out_bytes + 4) // k)
            ps = (ps + 1) & ~1
            parity_fn = self._make_rs_parity(k, n)
            self.fec_desc = ("rs", k, n, ps)
        kk, pps = self.fec_desc[1], self.fec_desc[-1]
        nbytes = out_bytes

        def step_fec(frame):
            data = step(frame)
            payload = data.reshape(-1)
            symbols = _container_symbols(payload, nbytes, kk, pps)
            par = parity_fn(symbols)
            return data, par

        return jax.jit(step_fec)

    def __call__(self, frame):
        return self._step(frame)


class BatchedJpegLdgmPipeline:
    """Throughput variant of the fused JPEG+LDGM sender graph: B frames
    stacked row-wise ride ONE kernel dispatch (frame boundaries are restart
    boundaries, so per-frame output is bit-identical to the single-frame
    pipeline — the JpegBatchEncoder property), and per-frame LDGM parity is
    computed inside the same jit graph with the Pallas XOR kernel.

    Amortizes the per-dispatch floor across B frames; the latency-critical
    sender keeps the single-frame EncodePipeline."""

    def __init__(self, desc: VideoDesc, nframes: int,
                 quality: int = 80, fec: str = "ldgm:256:26:5",
                 subsampling: Optional[str] = None):
        from ultragrid_tpu.ops.jpeg import JpegBatchEncoder

        kind, k, m, c = _parse_fec(fec)
        assert kind == "ldgm"
        self.nframes = nframes
        self.enc = JpegBatchEncoder(desc.width, desc.height, nframes,
                                    in_codec=desc.color_spec, quality=quality,
                                    subsampling=subsampling)
        single = self.enc.single
        ww = single.wwords
        ky = 2 if single.subsampling == "422" else (4 if single.subsampling == "420" else 1)
        n_y = single.nmcu * ky
        n_c = single.nmcu
        part_words = [n_y * ww, n_y, n_c * ww, n_c, n_c * ww, n_c]
        total_bytes = sum(part_words) * 4
        ps, _ = ldgm_container_params(total_bytes, k)
        while sum(-(-(w * 4) // ps) for w in part_words) > k:
            ps += 4
        self.row_counts = [-(-(w * 4) // ps) for w in part_words]
        self.ps, self.k, self.m, self.c = ps, k, m, c
        ps_words = ps // 4
        from ultragrid_tpu.ops.fec import (
            build_ldgm_matrix,
            gf2_matmul,
            make_gf2_parity_pallas,
        )
        from ultragrid_tpu.ops.jpeg_pallas import _HAVE_PALLAS, on_tpu

        mask_np = build_ldgm_matrix(k, m, c, 1).astype(np.float32)
        starts = np.concatenate([[0], np.cumsum(self.row_counts)])
        use_pallas = _HAVE_PALLAS and on_tpu()
        if use_pallas:
            par_fns = [
                make_gf2_parity_pallas(mask_np[:, starts[i]: starts[i + 1]], ps_words)
                for i in range(len(part_words))
            ]
        else:
            mask_slices = [jnp.asarray(mask_np[:, starts[i]: starts[i + 1]])
                           for i in range(len(part_words))]
        row_counts = self.row_counts
        B = nframes
        npm, ww_ = single.nmcu, ww

        raw = self.enc.tall._encode_cache.setdefault(
            ww, self.enc.tall._build_encode(ww))
        inner_fn = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw

        def part_syms_u32(arr_u32, rows):
            flat = arr_u32.reshape(-1)
            pad = rows * ps_words - flat.size
            padded = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint32)])
            return padded.reshape(rows, ps_words)

        def frame_parity(parts_f):
            par = None
            if use_pallas:
                for pfn, p, rows in zip(par_fns, parts_f, row_counts):
                    pp = pfn(part_syms_u32(p, rows))
                    par = pp if par is None else par ^ pp
            else:
                for msl, p, rows in zip(mask_slices, parts_f, row_counts):
                    sym = jax.lax.bitcast_convert_type(
                        part_syms_u32(p, rows), jnp.uint8).reshape(rows, ps_words * 4)
                    pp = gf2_matmul(msl, sym, False)
                    par = pp if par is None else par ^ pp
            kshift = 1
            while kshift < m:
                par = par ^ jnp.pad(par, ((kshift, 0), (0, 0)))[:m]
                kshift *= 2
            if use_pallas:
                # words -> the wire's byte layout, same as EncodePipeline
                par = jax.lax.bitcast_convert_type(par, jnp.uint8).reshape(m, ps)
            return par

        def step(stacked):
            ys, ybits, us, ubits, vs, vbits, ovf = inner_fn(stacked)
            pars = []
            for f in range(B):
                sl = slice(f * npm * ky, (f + 1) * npm * ky)
                sc = slice(f * npm, (f + 1) * npm)
                parts_f = [
                    ys[sl],
                    jnp.asarray(ybits[sl], jnp.int32).view(jnp.uint32),
                    us[sc],
                    jnp.asarray(ubits[sc], jnp.int32).view(jnp.uint32),
                    vs[sc],
                    jnp.asarray(vbits[sc], jnp.int32).view(jnp.uint32),
                ]
                pars.append(frame_parity(parts_f))
            return ys, ybits, us, ubits, vs, vbits, jnp.stack(pars), ovf

        self._step = jax.jit(step)

    def __call__(self, stacked_frames):
        """stacked_frames: uint8 [B*H, linesize] (or [B, H, linesize])."""
        f = jnp.asarray(stacked_frames)
        if f.ndim == 3:
            f = f.reshape(self.enc.tall.height, f.shape[-1])
        return self._step(f)
