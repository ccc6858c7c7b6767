"""Fused Pallas TPU kernel for the JPEG encode hot path.

One `pallas_call` per frame does the ENTIRE device encode — byte
deinterleave + DCT + quantization (MXU matmul against the mega matrix from
``JpegEncoder._build_mega_matrix``) + Huffman symbol formation + per-block
bit packing — over one MCU row per grid step, entirely VMEM-resident.  The
XLA path in :mod:`ultragrid_tpu.ops.jpeg` materializes the quantized
coefficients, symbol values and symbol lengths in HBM between stages
(~200 MB of intermediate traffic per 4K frame); here the only HBM traffic is
the raw frame in and the packed slot words out.

Bit-exact contract: produces the identical ``(slots, bits)`` arrays as
``_encode_component_symbols`` + ``_pack_block_slots`` for the same geometry
(tested in tests/test_jpeg_pallas.py on real TPU; the XLA path remains the
canonical cross-checked implementation, cf. reference
/root/reference/src/video_compress/gpujpeg.cpp:106-168 for the role of the
CUDA twin in the reference).

TPU-first design notes (see /opt/skills/guides/pallas_guide.md):
  * lane layout: one MCU row per grid step as a [nmcux, 64*bpm] i32 tile —
    each 64-lane group is one zigzag-ordered 8x8 block, so every per-block
    op is a static lane-slice, never a reshape (Mosaic cannot split lanes).
  * Huffman lookups are GATHER-FREE: the 16 run-buckets of the AC table are
    folded into 7 packed u32 words selected by a linear where-chain, with
    LANE-MIXED constants (luma table in the Y lane groups, chroma in U/V),
    so one pass covers all components.
  * bit packing exploits that contributions to one output word have
    disjoint bit ranges, so integer ADD == OR and the per-word reduction is
    a plain lane-sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only at runtime; import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")


def supports(enc) -> bool:
    """True if the fused kernel covers this encoder geometry."""
    if not _HAVE_PALLAS:
        return False
    if enc._mega is None:
        return False
    if enc.subsampling not in ("422", "444", "420"):
        return False
    # row-aligned restart segments keep the DC chain tile-local
    if enc.nmcux % enc.restart_interval != 0:
        return False
    return True


# ---------------------------------------------------------------------------
# Table packing for the gather-free lookup
# ---------------------------------------------------------------------------


def _pack_ac_words(codes: np.ndarray, lens: np.ndarray):
    """AC table -> per-rr packed words.

    Returns (cw [16,5] u32, lw [16,2] u32): for each run-bucket rr, codes
    for s=1..10 two-per-word (low16 = odd s), and (len-1) nibbles (s=1..8 in
    lw[...,0], s=9..10 in lw[...,1]).
    """
    cw = np.zeros((16, 5), np.uint32)
    lw = np.zeros((16, 2), np.uint32)
    for rr in range(16):
        for s in range(1, 11):
            sym = (rr << 4) | s
            c = int(codes[sym]) & 0xFFFF
            ln = max(int(lens[sym]) - 1, 0) & 0xF
            j = (s - 1) >> 1
            cw[rr, j] |= np.uint32(c) << (((s - 1) & 1) * 16)
            k = (s - 1) & 7
            lw[rr, (s - 1) >> 3] |= np.uint32(ln) << (k * 4)
    return cw, lw


def _pack_dc_words(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """DC table -> [12] u32 of (code << 5) | (len-1)."""
    out = np.zeros(12, np.uint32)
    for s in range(12):
        out[s] = (np.uint32(int(codes[s])) << 5) | np.uint32(int(lens[s]) - 1)
    return out


def _lane_const(vals_per_group, nlanes):
    """Build a [1, nlanes] u32 constant: vals_per_group[g] in lane group g."""
    out = np.zeros((1, nlanes), np.uint32)
    for g, v in enumerate(vals_per_group):
        out[0, 64 * g : 64 * (g + 1)] = np.uint32(v)
    return out


# ---------------------------------------------------------------------------
# Kernel builder
# ---------------------------------------------------------------------------


def _size_of_i32(v):
    """32 - clz(|v|), matching jpeg._size_of, as i32."""
    a = jnp.abs(v)
    return jnp.where(a == 0, 0, 32 - jax.lax.clz(a))


def make_fused_encode(enc, wwords: int, interpret: bool = False,
                      _stop_after: str | None = None):
    """Build the jitted fused encode for a JpegEncoder, or None if unsupported.

    Returns fn(frame) -> (ys, ybits, us, ubits, vs, vbits, overflow) with
    shapes/dtypes identical to JpegEncoder._make_encode's encode_fn.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU test
    coverage of the kernel logic; production path is compiled on TPU).
    ``_stop_after`` is a perf-ablation debug knob ("front"|"dc"|"ac"|"sym")
    that truncates the kernel after that stage and emits garbage outputs;
    never set in production.
    """
    if not supports(enc):
        return None

    Wm, constv, bpr = enc._mega
    nmcux, nmcuy, nmcu = enc.nmcux, enc.nmcuy, enc.nmcu
    ri = enc.restart_interval
    bpm = enc.blocks_per_mcu  # 4 for 422 (YL YR U V); 3 for 444; 6 for 420
    nlanes = 64 * bpm
    is422 = enc.subsampling == "422"
    is420 = enc.subsampling == "420"
    mcu_h = enc.mcu_h  # 16 raw rows per MCU for 420, 8 otherwise
    n_y = {"422": 2, "420": 4}.get(enc.subsampling, 1)  # luma blocks/MCU

    # Tile = one chunk of an MCU row.  Chunk width must be a multiple of the
    # restart interval so every chunk starts at a restart boundary (DC chain
    # stays tile-local); cap ~240 MCUs to fit the ~16 MB VMEM scoped budget.
    cx = ri
    for cand in range(nmcux, 0, -1):
        if nmcux % cand == 0 and cand % ri == 0 and cand * bpm * 64 <= 240 * 256:
            cx = cand
            break
    ncx = nmcux // cx

    # per-lane-group component class: True = luma tables
    luma_groups = tuple([True] * n_y + [False, False])

    acl_codes, acl_lens = enc._ac_l
    acc_codes, acc_lens = enc._ac_c
    cw_l, lw_l = _pack_ac_words(acl_codes, acl_lens)
    cw_c, lw_c = _pack_ac_words(acc_codes, acc_lens)
    dc_l = _pack_dc_words(*enc._dc_l)
    dc_c = _pack_dc_words(*enc._dc_c)

    # lane-mixed AC table constants, stacked as one [16*7, nlanes] input:
    # row rr*7+j = packed word j for run-bucket rr (j 0..4 codes, 5..6 lens)
    ac_rows = []
    for rr in range(16):
        for j in range(5):
            ac_rows.append(
                _lane_const([(cw_l if lum else cw_c)[rr, j] for lum in luma_groups], nlanes)
            )
        for j in range(2):
            ac_rows.append(
                _lane_const([(lw_l if lum else lw_c)[rr, j] for lum in luma_groups], nlanes)
            )
    ac_tabs_np = np.concatenate(ac_rows, axis=0)  # [112, nlanes]

    # EOB / ZRL lane constants (value and bit length)
    def _sym_const(codes, lens, sym):
        return int(codes[sym]), int(lens[sym])

    eobs = [_sym_const(*(enc._ac_l if lum else enc._ac_c), 0x00) for lum in luma_groups]
    zrls = [_sym_const(*(enc._ac_l if lum else enc._ac_c), 0xF0) for lum in luma_groups]
    # misc lane constants, one [6, nlanes] input: eob code/len, zrl code/len,
    # zz2 (two fused ZRLs) code/len
    misc_np = np.concatenate(
        [
            _lane_const([c for c, _ in eobs], nlanes),
            _lane_const([l for _, l in eobs], nlanes),
            _lane_const([c for c, _ in zrls], nlanes),
            _lane_const([l for _, l in zrls], nlanes),
            _lane_const([(c << l) | c for c, l in zrls], nlanes),
            _lane_const([2 * l for _, l in zrls], nlanes),
        ],
        axis=0,
    )

    # DC table constants: [12, 128] u32, lane g (g < bpm) = group g's packed
    # word for size category s (lanes >= bpm zero)
    dc_words_np = np.zeros((12, 128), np.uint32)
    for s in range(12):
        for g, lum in enumerate(luma_groups):
            dc_words_np[s, g] = (dc_l if lum else dc_c)[s]

    # block-diagonal transposed-triangular matrix for per-block cumsum.
    # bf16 operands are EXACT here: vlen <= 42 and 0/1 entries are exactly
    # representable in bf16, and the f32 accumulator adds <= 256 small ints
    # exactly -- so the bf16 MXU path (4x f32 rate) is bit-identical.
    tri64 = np.tril(np.ones((64, 64), np.float32)).T
    tri_np = np.zeros((nlanes, nlanes), np.float32)
    for g in range(bpm):
        tri_np[64 * g : 64 * (g + 1), 64 * g : 64 * (g + 1)] = tri64

    W_in = Wm.astype(np.float32)  # [8*bpr, nlanes]
    c_in = constv.reshape(1, nlanes).astype(np.float32)

    def kernel(
        x_ref, w_ref, c_ref, tri_ref, ac_ref, misc_ref, dc_ref,
        ys_ref, yb_ref, us_ref, ub_ref, vs_ref, vb_ref,
    ):
        # ---- front end: bytes -> zigzag quantized coeffs ----
        xcat = jnp.concatenate(
            [x_ref[0, r] for r in range(mcu_h)], axis=1
        )  # [nmcux, mcu_h*bpr]
        f = jnp.dot(
            xcat.astype(jnp.int32).astype(jnp.float32),
            w_ref[:],
            preferred_element_type=jnp.float32,
        )
        q = jnp.round(f - c_ref[0][None, :]).astype(jnp.int32)  # [nmcux, nlanes]

        def _truncate(live_i32):
            # ablation-only: reduce the live intermediate into the bits
            # outputs (so Mosaic cannot DCE the stages run so far), zero the
            # slot outputs, and stop.
            red = jnp.sum(live_i32.astype(jnp.int32), axis=1, keepdims=True)
            zeros = jnp.zeros((live_i32.shape[0], wwords), jnp.uint32)
            for g in range(n_y):
                ys_ref[0, :, g, :] = zeros
            yb_ref[0] = jnp.broadcast_to(red, (red.shape[0], n_y))
            us_ref[0] = zeros
            ub_ref[0] = red
            vs_ref[0] = zeros
            vb_ref[0] = red

        if _stop_after == "front":
            _truncate(q)
            return

        lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, nlanes), 1) % 64
        seg = (jax.lax.broadcasted_iota(jnp.int32, (cx, 1), 0) % ri) == 0

        # ---- DC differentials (per block-group column) ----
        dcols = [q[:, 64 * g : 64 * g + 1] for g in range(bpm)]
        if n_y > 1:
            # luma DC chain walks the MCU's Y blocks in raster order, so Y0
            # predicts from the previous MCU's LAST Y block (or 0 at a
            # restart boundary); later Y blocks predict in-MCU
            diffs = [dcols[0] - jnp.where(seg, 0, pltpu.roll(dcols[n_y - 1], 1, 0))]
            for g in range(1, n_y):
                diffs.append(dcols[g] - dcols[g - 1])
            for g in range(n_y, bpm):  # chroma: per-component MCU chain
                diffs.append(dcols[g] - jnp.where(seg, 0, pltpu.roll(dcols[g], 1, 0)))
        else:
            diffs = [
                c - jnp.where(seg, 0, pltpu.roll(c, 1, 0)) for c in dcols
            ]
        diff = jnp.concatenate(diffs, axis=1)  # [nmcux, bpm]
        s_dc = _size_of_i32(diff)
        amp_dc = jnp.where(diff > 0, diff, diff - 1).astype(jnp.uint32) & (
            (jnp.uint32(1) << s_dc.astype(jnp.uint32)) - 1
        )
        dc_tab = jnp.where(s_dc == 0, dc_ref[0:1, 0:bpm], jnp.uint32(0))
        for s in range(1, 12):
            dc_tab = jnp.where(s_dc == s, dc_ref[s : s + 1, 0:bpm], dc_tab)
        dc_code = dc_tab >> 5
        dc_len = (dc_tab & 0x1F).astype(jnp.int32) + 1
        dc_val = (dc_code << s_dc.astype(jnp.uint32)) | amp_dc  # [nmcux, bpm]
        dc_vlen = dc_len + s_dc

        if _stop_after == "dc":
            _truncate(dc_vlen + dc_val.astype(jnp.int32))
            return

        # ---- AC run/size symbols over the full tile ----
        nz = (q != 0) & (lane_j != 0)
        nz_pos = jnp.where(nz, lane_j, 0)
        # inclusive prefix-max within each 64-lane block: log-shift doubling
        cm = nz_pos
        k = 1
        while k < 64:
            shifted = pltpu.roll(cm, k, 1)
            cm = jnp.maximum(cm, jnp.where(lane_j >= k, shifted, 0))
            k *= 2
        prev_nz = jnp.where(lane_j >= 1, pltpu.roll(cm, 1, 1), 0)
        run = lane_j - prev_nz - 1
        k_zrl = run >> 4
        rr = run & 0xF
        s_ac = _size_of_i32(q)
        amp = jnp.where(q > 0, q, q - 1).astype(jnp.uint32) & (
            (jnp.uint32(1) << s_ac.astype(jnp.uint32)) - 1
        )

        # gather-free AC table lookup: rr-select 7 packed words, extract by s
        words = [jnp.where(rr == 0, ac_ref[j : j + 1, :], jnp.uint32(0)) for j in range(7)]
        for r in range(1, 16):
            for j in range(7):
                words[j] = jnp.where(rr == r, ac_ref[r * 7 + j : r * 7 + j + 1, :], words[j])
        t_idx = (s_ac - 1) >> 1  # code word index 0..4 (s>=1 at lookups)
        w01 = jnp.where(t_idx == 0, words[0], words[1])
        w23 = jnp.where(t_idx == 2, words[2], words[3])
        code_w = jnp.where(t_idx == 4, words[4], jnp.where(t_idx < 2, w01, w23))
        ac_code = (code_w >> (((s_ac - 1) & 1) << 4).astype(jnp.uint32)) & 0xFFFF
        len_w = jnp.where(s_ac <= 8, words[5], words[6])
        ac_len = (
            (len_w >> (((s_ac - 1) & 7) * 4).astype(jnp.uint32)) & 0xF
        ).astype(jnp.int32) + 1

        val = (ac_code << s_ac.astype(jnp.uint32)) | amp
        vlen = ac_len + s_ac

        if _stop_after == "ac":
            _truncate(vlen + val.astype(jnp.int32) + dc_vlen[:, 0:1])
            return

        # ZRL redistribution (see jpeg._encode_component_symbols)
        kn = jnp.where(nz, k_zrl, 0)
        nxt1 = jnp.where(lane_j < 63, pltpu.roll(kn, nlanes - 1, 1), 0)
        nxt2 = jnp.where(lane_j < 62, pltpu.roll(kn, nlanes - 2, 1), 0)
        zrl_code = misc_ref[2:3, :]
        zrl_len = misc_ref[3:4, :].astype(jnp.int32)
        zz2_code = misc_ref[4:5, :]
        zz2_len = misc_ref[5:6, :].astype(jnp.int32)
        pm_val = jnp.where(
            nxt1 == 1,
            zrl_code,
            jnp.where(nxt1 >= 2, zz2_code, jnp.where(nxt2 == 3, zrl_code, jnp.uint32(0))),
        )
        pm_len = jnp.where(
            nxt1 == 1,
            zrl_len,
            jnp.where(nxt1 >= 2, zz2_len, jnp.where(nxt2 == 3, zrl_len, 0)),
        )
        val = jnp.where(nz, val, pm_val)
        vlen = jnp.where(nz, vlen, pm_len)

        # EOB at block-local lane 63 when the block has trailing zeros
        last_nz = cm  # at lane 63 this is the block's max nz position
        need_eob = (lane_j == 63) & (last_nz < 63)
        val = jnp.where(need_eob, misc_ref[0:1, :], val)
        vlen = jnp.where(need_eob, misc_ref[1:2, :].astype(jnp.int32), vlen)

        # merge DC symbols into block-local lane 0
        # dc columns spread back: build [nmcux, nlanes] with dc at lane 64g
        pieces = []
        for g in range(bpm):
            pieces.append(dc_val[:, g : g + 1])
            pieces.append(val[:, 64 * g + 1 : 64 * (g + 1)])
        val = jnp.concatenate(pieces, axis=1)
        pieces = []
        for g in range(bpm):
            pieces.append(dc_vlen[:, g : g + 1])
            pieces.append(vlen[:, 64 * g + 1 : 64 * (g + 1)])
        vlen = jnp.concatenate(pieces, axis=1)

        if _stop_after == "sym":
            _truncate(vlen + val.astype(jnp.int32))
            return

        # ---- pack: per-block bit offsets + disjoint-bit add reduction ----
        cum = jnp.dot(
            vlen.astype(jnp.bfloat16),
            tri_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        if _stop_after == "cum":
            _truncate(cum + val.astype(jnp.int32))
            return
        off = cum - vlen
        t = (off & 31).astype(jnp.int32)
        w0 = off >> 5
        d = t + vlen
        spans = d > 32
        du = d.astype(jnp.uint32)
        x0 = jnp.where(
            spans,
            val >> jnp.where(spans, du - 32, 0),
            val << ((jnp.uint32(32) - du) & 31),
        )
        x1 = jnp.where(spans, val << jnp.where(spans, jnp.uint32(64) - du, 0), jnp.uint32(0))

        if _stop_after == "shift":
            _truncate(w0 + x0.astype(jnp.int32) + x1.astype(jnp.int32))
            return

        slot_cols = [[] for _ in range(bpm)]
        for w in range(wwords):
            # a lane lands in word w0 (x0) and possibly w0+1 (x1); the two
            # cases are mutually exclusive per lane, so one nested select
            contrib = jnp.where(
                w0 == w, x0, jnp.where(w0 == w - 1, x1, jnp.uint32(0))
            )
            # disjoint bit ranges: integer add == OR
            ci = contrib.astype(jnp.int32)
            for g in range(bpm):
                slot_cols[g].append(
                    jnp.sum(ci[:, 64 * g : 64 * (g + 1)], axis=1, keepdims=True)
                )
        slots = [
            jnp.concatenate(cols, axis=1).astype(jnp.uint32) for cols in slot_cols
        ]  # bpm x [nmcux, wwords]
        bits = [cum[:, 64 * g + 63 : 64 * g + 64] for g in range(bpm)]  # [nmcux,1]

        for g in range(n_y):
            ys_ref[0, :, g, :] = slots[g]
        yb_ref[0] = (jnp.concatenate(bits[:n_y], axis=1) if n_y > 1 else bits[0])
        us_ref[0] = slots[n_y]
        ub_ref[0] = bits[n_y]
        vs_ref[0] = slots[n_y + 1]
        vb_ref[0] = bits[n_y + 1]

    y_per_mcu = n_y
    grid = (nmcuy, ncx)
    out_shapes = (
        jax.ShapeDtypeStruct((nmcuy, nmcux, y_per_mcu, wwords), jnp.uint32),
        jax.ShapeDtypeStruct((nmcuy, nmcux, y_per_mcu), jnp.int32),
        jax.ShapeDtypeStruct((nmcuy, nmcux, wwords), jnp.uint32),
        jax.ShapeDtypeStruct((nmcuy, nmcux, 1), jnp.int32),
        jax.ShapeDtypeStruct((nmcuy, nmcux, wwords), jnp.uint32),
        jax.ShapeDtypeStruct((nmcuy, nmcux, 1), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((1, cx, y_per_mcu, wwords), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cx, y_per_mcu), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cx, wwords), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cx, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cx, wwords), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cx, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
    )
    in_specs = [
        pl.BlockSpec((1, mcu_h, cx, bpr), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((mcu_h * bpr, nlanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nlanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nlanes, nlanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((112, nlanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((6, nlanes), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]

    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )

    Wj = jnp.asarray(W_in)
    cj = jnp.asarray(c_in)
    trij = jnp.asarray(tri_np)
    acj = jnp.asarray(ac_tabs_np)
    miscj = jnp.asarray(misc_np)
    dcj = jnp.asarray(dc_words_np)

    def encode_fn(frame):
        X = frame[:, : nmcux * bpr].reshape(nmcuy, mcu_h, nmcux, bpr)
        ys4, yb3, us3, ub3, vs3, vb3 = call(X, Wj, cj, trij, acj, miscj, dcj)
        ys = ys4.reshape(nmcu * y_per_mcu, wwords)
        ybits = yb3.reshape(nmcu * y_per_mcu)
        us = us3.reshape(nmcu, wwords)
        ubits = ub3.reshape(nmcu)
        vs = vs3.reshape(nmcu, wwords)
        vbits = vb3.reshape(nmcu)
        overflow = (
            (jnp.max(ybits) > wwords * 32)
            | (jnp.max(ubits) > wwords * 32)
            | (jnp.max(vbits) > wwords * 32)
        )
        return ys, ybits, us, ubits, vs, vbits, overflow

    return jax.jit(encode_fn)
