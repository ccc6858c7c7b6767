"""Device (TPU) path of the own H.264 intra encoder.

Whole-frame jit graph: source-neighbor DC prediction, 4x4 core transforms +
Hadamard DC as batched matmuls, quantization, fully vectorized CAVLC (the
16-step rank loops unroll into static jnp ops), and per-macroblock
MSB-first slot-window bit packing — the same machinery as the JPEG encoder
(ops/jpeg.py) applied to a second codec family.  Host side, the C assembler
(native/h264_assemble.c) concatenates the per-MB windows and inserts
emulation-prevention bytes.

Bit-identical to the numpy encoder ``Intra16EncoderV`` (asserted in
tests/test_h264.py), which is itself bit-identical to the scalar reference
implementation.  Overflowing slot windows escalate like the JPEG encoder.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultragrid_tpu.ops import h264 as H

_L = 16  # max coeffs per block


import os

# gather-free CAVLC table lookups (the JPEG kernel's lesson applied here:
# in-graph gathers over ~130k blocks are the prime suspect for the device
# H.264 cost; a row-select chain + one-hot column reduce is pure VPU)
_GATHERLESS = os.environ.get("UGTPU_H264_GATHERLESS", "1") != "0"


def _pack_vl(val: np.ndarray, ln: np.ndarray) -> np.ndarray:
    """(val, len) tables -> one packed (val<<5 | len) int32 table."""
    return ((val.astype(np.int64) << 5) | ln.astype(np.int64)).astype(np.int32)


def _sel_lookup(packed_np: np.ndarray, i, j):
    """Gather-free table[i, j] for a SMALL packed table: row-select chain
    over R constant rows, then a one-hot column reduce (exact, pure VPU —
    no gather lowering).  Returns (val, len)."""
    R, C = packed_np.shape
    cols = jnp.arange(C, dtype=jnp.int32)[None, :]
    rowvals = jnp.zeros((i.shape[0], C), jnp.int32)
    for r in range(R):
        rowvals = jnp.where(
            (i == r)[:, None],
            jnp.asarray(packed_np[r].astype(np.int32))[None, :],
            rowvals,
        )
    p = jnp.sum(jnp.where(j[:, None] == cols, rowvals, 0), axis=1)
    return p >> 5, p & 31


def _tables_jnp():
    t = {}
    for k in ("0", "2", "4", "c"):
        t[f"ctv{k}"] = jnp.asarray(H._CT_VAL[k].astype(np.int32))
        t[f"ctl{k}"] = jnp.asarray(H._CT_LEN[k].astype(np.int32))
        t[f"p_ct{k}"] = _pack_vl(H._CT_VAL[k], H._CT_LEN[k])
    t["tzv"] = jnp.asarray(H._TZ_VAL.astype(np.int32))
    t["tzl"] = jnp.asarray(H._TZ_LEN.astype(np.int32))
    t["tzcv"] = jnp.asarray(H._TZC_VAL.astype(np.int32))
    t["tzcl"] = jnp.asarray(H._TZC_LEN.astype(np.int32))
    t["rbv"] = jnp.asarray(H._RB_VAL.astype(np.int32))
    t["rbl"] = jnp.asarray(H._RB_LEN.astype(np.int32))
    t["p_tz"] = _pack_vl(H._TZ_VAL, H._TZ_LEN)
    t["p_tzc"] = _pack_vl(H._TZC_VAL, H._TZC_LEN)
    t["p_rb"] = _pack_vl(H._RB_VAL, H._RB_LEN)
    return t


_UE_N = 64
_UE_VAL = np.arange(_UE_N) + 1
_UE_LEN = 2 * np.ceil(np.log2(np.arange(_UE_N) + 2)).astype(np.int64) - 1
for _i in range(_UE_N):  # exact bit lengths
    _UE_LEN[_i] = 2 * int(_i + 1).bit_length() - 1


def cavlc_blocks_jnp(levels, nC, tabs, chroma_dc: bool = False):
    """jnp twin of h264.cavlc_blocks_vec: [N, L] zigzag levels -> slot grid.

    Returns (sval [N, 36] int32, slen [N, 36] int32, total [N] int32)."""
    n, L = levels.shape
    lv = levels.astype(jnp.int32)
    nzm = lv != 0
    total = nzm.sum(axis=1).astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    nz_after = (jnp.cumsum(nzm[:, ::-1], axis=1)[:, ::-1] - nzm).astype(jnp.int32)
    big = nzm & (jnp.abs(lv) > 1)
    lastbig = jnp.max(jnp.where(big, idx, -1), axis=1)
    nz_after_at_lastbig = jnp.sum(
        jnp.where(idx == lastbig[:, None], nz_after, 0), axis=1
    )
    t1 = jnp.minimum(jnp.where(lastbig >= 0, nz_after_at_lastbig, total), 3)
    last_nz = jnp.max(jnp.where(nzm, idx, -1), axis=1)
    zeros = jnp.where(total > 0, last_nz + 1 - total, 0).astype(jnp.int32)

    S = 36
    svals = []
    slens = []

    # coeff_token
    if chroma_dc:
        if _GATHERLESS:
            ct_v, ct_l = _sel_lookup(tabs["p_ctc"], t1, total)
        else:
            ct_v = tabs["ctvc"][t1, total]
            ct_l = tabs["ctlc"][t1, total]
    else:
        if _GATHERLESS:
            v0, l0 = _sel_lookup(tabs["p_ct0"], t1, total)
            v2, l2 = _sel_lookup(tabs["p_ct2"], t1, total)
            v4, l4 = _sel_lookup(tabs["p_ct4"], t1, total)
        else:
            v0 = tabs["ctv0"][t1, total]
            l0 = tabs["ctl0"][t1, total]
            v2 = tabs["ctv2"][t1, total]
            l2 = tabs["ctl2"][t1, total]
            v4 = tabs["ctv4"][t1, total]
            l4 = tabs["ctl4"][t1, total]
        vf = jnp.where(total == 0, 3, ((total - 1) << 2) | t1)
        ct_v = jnp.where(nC < 2, v0, jnp.where(nC < 4, v2, jnp.where(nC < 8, v4, vf)))
        ct_l = jnp.where(nC < 2, l0, jnp.where(nC < 4, l2, jnp.where(nC < 8, l4, 6)))
    svals.append(ct_v)
    slens.append(ct_l)

    # rank gathers via iota-compare (L small)
    rank = jnp.where(nzm, nz_after, jnp.int32(L))  # L = "no coeff"
    pos_of_rank = []
    lvl_of_rank = []
    for r in range(L):
        m = rank == r
        pos_of_rank.append(jnp.sum(jnp.where(m, idx, 0), axis=1))
        lvl_of_rank.append(jnp.sum(jnp.where(m, lv, 0), axis=1))

    # trailing-one signs
    for r in range(3):
        m = r < t1
        svals.append(jnp.where(m, (lvl_of_rank[r] < 0).astype(jnp.int32), 0))
        slens.append(jnp.where(m, 1, 0))

    # levels with suffix-length adaptation
    suffix_len = jnp.where((total > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    first = jnp.ones(n, bool)
    for r in range(L):
        m = (r >= t1) & (r < total)
        level = lvl_of_rank[r]
        code = jnp.where(level > 0, 2 * jnp.abs(level) - 2, 2 * jnp.abs(level) - 1)
        code = jnp.where(m & first & (t1 < 3), code - 2, code)
        sl = suffix_len
        p = code >> sl
        c0 = m & (sl == 0)
        val = jnp.where(c0 & (code < 14), 1, 0)
        ln = jnp.where(c0 & (code < 14), code + 1, 0)
        esc14 = c0 & (code >= 14) & (code < 30)
        val = jnp.where(esc14, (1 << 4) | (code - 14), val)
        ln = jnp.where(esc14, 19, ln)
        esc15_0 = c0 & (code >= 30)
        val = jnp.where(esc15_0, (1 << 12) | (code - 30), val)
        ln = jnp.where(esc15_0, 28, ln)
        c1 = m & (sl > 0)
        reg = c1 & (p < 15)
        val = jnp.where(reg, (1 << sl) | (code & ((1 << sl) - 1)), val)
        ln = jnp.where(reg, p + 1 + sl, ln)
        esc15 = c1 & (p >= 15)
        val = jnp.where(esc15, (1 << 12) | (code - (15 << sl)), val)
        ln = jnp.where(esc15, 28, ln)
        svals.append(val)
        slens.append(ln)
        suffix_len = jnp.where(m & (suffix_len == 0), 1, suffix_len)
        grow = m & (jnp.abs(level) > (3 << jnp.maximum(suffix_len - 1, 0))) & (suffix_len < 6)
        suffix_len = jnp.where(grow, suffix_len + 1, suffix_len)
        first = first & ~m

    # total_zeros
    m = (total > 0) & (total < L)
    if _GATHERLESS:
        tz_v, tz_l = _sel_lookup(tabs["p_tzc" if chroma_dc else "p_tz"],
                                 total, zeros)
    elif chroma_dc:
        tz_v = tabs["tzcv"][total, zeros]
        tz_l = tabs["tzcl"][total, zeros]
    else:
        tz_v = tabs["tzv"][total, zeros]
        tz_l = tabs["tzl"][total, zeros]
    svals.append(jnp.where(m, tz_v, 0))
    slens.append(jnp.where(m, tz_l, 0))

    # run_before
    zeros_left = zeros
    for r in range(L - 1):
        m = (r <= total - 2) & (zeros_left > 0)
        run = jnp.where(m, pos_of_rank[r] - pos_of_rank[r + 1] - 1, 0)
        zl = jnp.minimum(zeros_left, 7)
        if _GATHERLESS:
            rb_v, rb_l = _sel_lookup(tabs["p_rb"], zl, run)
        else:
            rb_v = tabs["rbv"][zl, run]
            rb_l = tabs["rbl"][zl, run]
        svals.append(jnp.where(m, rb_v, 0))
        slens.append(jnp.where(m, rb_l, 0))
        zeros_left = jnp.where(m, zeros_left - run, zeros_left)
    for _ in range(L - 1, 15):  # pad to 15 run slots for L < 16
        svals.append(jnp.zeros(n, jnp.int32))
        slens.append(jnp.zeros(n, jnp.int32))

    # layout: [0]=token [1..3]=signs [4..19]=levels [20]=tz [21..35]=runs
    # svals currently: 1 token + 3 signs + L levels + 1 tz + 15 runs
    if L < 16:
        # insert zero level slots to keep the 36-slot layout
        lv_part = svals[4 : 4 + L] + [jnp.zeros(n, jnp.int32)] * (16 - L)
        ll_part = slens[4 : 4 + L] + [jnp.zeros(n, jnp.int32)] * (16 - L)
    else:
        lv_part = svals[4 : 4 + 16]
        ll_part = slens[4 : 4 + 16]
    sval = jnp.stack(svals[:4] + lv_part + [svals[4 + L]] + svals[5 + L :], axis=1)
    slen = jnp.stack(slens[:4] + ll_part + [slens[4 + L]] + slens[5 + L :], axis=1)
    return sval.astype(jnp.int32), slen.astype(jnp.int32), total


def make_device_encode(width: int, height: int, qp: int, wwords: int = 80,
                       uyvy_in: bool = False):
    """Build the jitted whole-frame encode: (y, cb, cr) planes ->
    (mb_words u32 [nmb, wwords] MSB-first, mb_bits i32 [nmb], overflow).

    With ``uyvy_in`` the graph takes the padded UYVY frame directly and
    performs the 4:2:0 plane split (incl chroma pair-average) on device —
    one host->device transfer instead of three plus a host numpy pass."""
    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    nmb = mbw * mbh
    qpc = H.chroma_qp(qp)
    tabs = _tables_jnp()
    zz = jnp.asarray(H._ZZ_IDX)

    def _mleft(M, x, n):
        # exact integer small-matrix multiply: (M @ x) over axis -2
        return jnp.stack(
            [sum(int(M[i, j]) * x[..., j, :] for j in range(n)) for i in range(n)],
            axis=-2)

    def _mright_t(M, x, n):
        # x @ M.T over axis -1
        return jnp.stack(
            [sum(int(M[k, j]) * x[..., :, j] for j in range(n)) for k in range(n)],
            axis=-1)

    def core4(x):    # C4 @ x @ C4.T
        return _mright_t(H._C4, _mleft(H._C4, x, 4), 4)

    def had4(x):     # H4 @ x @ H4 (H4 symmetric)
        return _mright_t(H._H4, _mleft(H._H4, x, 4), 4)

    def had2(x):     # H2 @ x @ H2 (H2 symmetric)
        return _mright_t(H._H2, _mleft(H._H2, x, 2), 2)
    uev = jnp.asarray(_UE_VAL.astype(np.int32))
    uel = jnp.asarray(_UE_LEN.astype(np.int32))
    qbits = 15 + qp // 6
    mfr = H._MF[qp % 6]
    mf = jnp.asarray(np.array(
        [[mfr[H._POSCLASS[r][c]] for c in range(4)] for r in range(4)], np.float32))
    f_off = (1 << qbits) // 3
    qbc = 15 + qpc // 6
    mfrc = H._MF[qpc % 6]
    mfc = jnp.asarray(np.array(
        [[mfrc[H._POSCLASS[r][c]] for c in range(4)] for r in range(4)], np.float32))
    fc_off = (1 << qbc) // 3
    mf0 = float(mfr[0])
    mf0c = float(mfrc[0])

    def quant_ac(coefs, mfm, foff, qb):
        # coefs are exact small ints in f32; quant in int32 via float mul is
        # unsafe, so go int32
        ci = coefs.astype(jnp.int32)
        lv = (jnp.abs(ci) * mfm.astype(jnp.int32) + foff) >> qb
        return jnp.sign(ci) * lv

    def quant_dc(coefs, mf0v, foff, qb):
        ci = coefs.astype(jnp.int32)
        lv = (jnp.abs(ci) * jnp.int32(mf0v) + 2 * foff) >> (qb + 1)
        return jnp.sign(ci) * lv

    def encode(*args):
        if uyvy_in:
            (frame,) = args
            a = frame.astype(jnp.int32)
            y = a[:, 1::2]
            cbf = a[:, 0::4]
            crf = a[:, 2::4]
            cb = (cbf[0::2] + cbf[1::2] + 1) >> 1
            cr = (crf[0::2] + crf[1::2] + 1) >> 1
        else:
            y, cb, cr = args
        yi = y.astype(jnp.int32)
        # luma DC pred (source neighbors)
        bottom = yi[15::16, :].reshape(mbh, mbw, 16).sum(axis=2)
        right = yi[:, 15::16].reshape(mbh, 16, mbw).sum(axis=1)
        top_sum = jnp.concatenate([jnp.zeros((1, mbw), jnp.int32), bottom[:-1]], axis=0)
        left_sum = jnp.concatenate([jnp.zeros((mbh, 1), jnp.int32), right[:, :-1]], axis=1)
        has_t = jnp.concatenate([jnp.zeros((1, mbw), bool), jnp.ones((mbh - 1, mbw), bool)])
        has_l = jnp.concatenate([jnp.zeros((mbh, 1), bool), jnp.ones((mbh, mbw - 1), bool)], axis=1)
        pred = jnp.where(
            has_t & has_l, (top_sum + left_sum + 16) >> 5,
            jnp.where(has_l, (left_sum + 8) >> 4,
                      jnp.where(has_t, (top_sum + 8) >> 4, 128)))
        blocks = yi.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
        res = blocks - pred[:, :, None, None]
        b44 = res.reshape(mbh, mbw, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
        coefs = core4(b44)
        dc_raw = coefs[..., 0, 0]
        dc_had = had4(dc_raw)
        # JM: floor-div by 2 (python // semantics for negatives)
        dc_had = jnp.where(dc_had >= 0, dc_had >> 1, -((-dc_had + 1) >> 1))
        dc_lv = quant_dc(dc_had, mf0, f_off, qbits)
        ac_lv = quant_ac(coefs, mf, f_off, qbits)
        ac_lv = ac_lv.at[..., 0, 0].set(0)
        cbp_luma = jnp.any(ac_lv.reshape(mbh, mbw, -1) != 0, axis=2)

        cdc_lv = []
        cac_lv = []
        for plane in (cb, cr):
            p = plane.astype(jnp.int32)
            tq = jnp.concatenate([
                jnp.zeros((1, mbw, 2), jnp.int32),
                p[7::8][:-1].reshape(mbh - 1, mbw, 2, 4).sum(axis=3)], axis=0)
            lq = jnp.concatenate([
                jnp.zeros((mbh, 1, 2), jnp.int32),
                p[:, 7::8][:, :-1].reshape(mbh, 2, 4, mbw - 1).sum(axis=2).transpose(0, 2, 1)],
                axis=1)
            ht, hl = has_t, has_l
            c00 = jnp.where(ht & hl, (tq[:, :, 0] + lq[:, :, 0] + 4) >> 3,
                    jnp.where(hl, (lq[:, :, 0] + 2) >> 2,
                              jnp.where(ht, (tq[:, :, 0] + 2) >> 2, 128)))
            c01 = jnp.where(ht, (tq[:, :, 1] + 2) >> 2,
                    jnp.where(hl, (lq[:, :, 0] + 2) >> 2, 128))
            c10 = jnp.where(hl, (lq[:, :, 1] + 2) >> 2,
                    jnp.where(ht, (tq[:, :, 0] + 2) >> 2, 128))
            c11 = jnp.where(ht & hl, (tq[:, :, 1] + lq[:, :, 1] + 4) >> 3,
                    jnp.where(hl, (lq[:, :, 1] + 2) >> 2,
                              jnp.where(ht, (tq[:, :, 1] + 2) >> 2, 128)))
            cpred = jnp.stack([jnp.stack([c00, c01], axis=-1),
                               jnp.stack([c10, c11], axis=-1)], axis=-2)
            cblocks = p.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3)
            cres = cblocks.reshape(mbh, mbw, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
            cres = cres - cpred[..., None, None]
            cc = core4(cres)
            dc2 = had2(cc[..., 0, 0])
            cdc_lv.append(quant_dc(dc2, mf0c, fc_off, qbc))
            a = quant_ac(cc, mfc, fc_off, qbc)
            cac_lv.append(a.at[..., 0, 0].set(0))
        any_cac = (jnp.any(cac_lv[0].reshape(mbh, mbw, -1) != 0, axis=2)
                   | jnp.any(cac_lv[1].reshape(mbh, mbw, -1) != 0, axis=2))
        any_cdc = (jnp.any(cdc_lv[0].reshape(mbh, mbw, -1) != 0, axis=2)
                   | jnp.any(cdc_lv[1].reshape(mbh, mbw, -1) != 0, axis=2))
        cbp_chroma = jnp.where(any_cac, 2, jnp.where(any_cdc, 1, 0))

        # totals / nnz / nC
        zz_ac = ac_lv.reshape(mbh, mbw, 4, 4, 16)[..., zz][..., 1:]
        tot_l = (zz_ac != 0).sum(axis=4).astype(jnp.int32)
        nnz_l = (tot_l * cbp_luma[:, :, None, None]).transpose(0, 2, 1, 3).reshape(mbh * 4, mbw * 4)
        zz_cac = [a.reshape(mbh, mbw, 2, 2, 16)[..., zz][..., 1:] for a in cac_lv]
        tot_c = [(z != 0).sum(axis=4).astype(jnp.int32) for z in zz_cac]
        nnz_c = [(t * (cbp_chroma == 2)[:, :, None, None]).transpose(0, 2, 1, 3).reshape(mbh * 2, mbw * 2)
                 for t in tot_c]

        def nc_grid(nn):
            gh, gw = nn.shape
            na = jnp.concatenate([jnp.full((gh, 1), -1, jnp.int32), nn[:, :-1]], axis=1)
            nb = jnp.concatenate([jnp.full((1, gw), -1, jnp.int32), nn[:-1]], axis=0)
            both = (na >= 0) & (nb >= 0)
            return jnp.where(both, (na + nb + 1) >> 1,
                             jnp.where(na >= 0, na, jnp.where(nb >= 0, nb, 0)))

        ncl = nc_grid(nnz_l)
        ncc = [nc_grid(nn) for nn in nnz_c]

        # symbol grid
        S = 36
        parts_v = []
        parts_l = []
        mb_type = (1 + 2 + 4 * cbp_chroma.reshape(-1)
                   + 12 * cbp_luma.reshape(-1).astype(jnp.int32))
        # header rides as a pseudo-block of 36 slots (3 real + 33 empty) so
        # the slot grid reshapes to [nmb, 28 blocks, 36] for two-level pack
        zpad = jnp.zeros((nmb, 33), jnp.int32)
        parts_v.append(jnp.concatenate([jnp.stack(
            [uev[mb_type], jnp.ones(nmb, jnp.int32), jnp.ones(nmb, jnp.int32)],
            axis=1), zpad], axis=1))
        parts_l.append(jnp.concatenate([jnp.stack(
            [uel[mb_type], jnp.ones(nmb, jnp.int32), jnp.ones(nmb, jnp.int32)],
            axis=1), zpad], axis=1))
        # ONE batched CAVLC call per block family (keeps the traced graph
        # small: 4 calls instead of 27)
        zz_dc = dc_lv.reshape(mbh, mbw, 16)[..., zz].reshape(nmb, 16)
        dv, dl, _ = cavlc_blocks_jnp(zz_dc, ncl[::4, ::4].reshape(-1), tabs)
        parts_v.append(dv)
        parts_l.append(dl)
        keep_l = cbp_luma.reshape(-1)[:, None]
        lum_lv = jnp.stack([zz_ac[:, :, by, bx].reshape(nmb, 15)
                            for bx, by in H._BLK_ORDER])          # [16, nmb, 15]
        lum_nc = jnp.stack([ncl[by::4, bx::4].reshape(-1)
                            for bx, by in H._BLK_ORDER])          # [16, nmb]
        av, al, _ = cavlc_blocks_jnp(lum_lv.reshape(16 * nmb, 15),
                                     lum_nc.reshape(-1), tabs)
        av = av.reshape(16, nmb, 36).transpose(1, 0, 2).reshape(nmb, 16 * 36)
        al = al.reshape(16, nmb, 36).transpose(1, 0, 2).reshape(nmb, 16 * 36)
        parts_v.append(av * keep_l)
        parts_l.append(al * keep_l)
        keep_cd = (cbp_chroma.reshape(-1) > 0)[:, None]
        cdc_all = jnp.concatenate([cdc_lv[0].reshape(nmb, 4), cdc_lv[1].reshape(nmb, 4)])
        cv, cl, _ = cavlc_blocks_jnp(cdc_all, jnp.zeros(2 * nmb, jnp.int32),
                                     tabs, chroma_dc=True)
        cv = cv.reshape(2, nmb, 36).transpose(1, 0, 2).reshape(nmb, 72)
        cl = cl.reshape(2, nmb, 36).transpose(1, 0, 2).reshape(nmb, 72)
        parts_v.append(cv * keep_cd)
        parts_l.append(cl * keep_cd)
        keep_ca = (cbp_chroma.reshape(-1) == 2)[:, None]
        cac_l = jnp.stack([zz_cac[ci][:, :, by, bx].reshape(nmb, 15)
                           for ci in range(2)
                           for bx, by in ((0, 0), (1, 0), (0, 1), (1, 1))])
        cac_n = jnp.stack([ncc[ci][by::2, bx::2].reshape(-1)
                           for ci in range(2)
                           for bx, by in ((0, 0), (1, 0), (0, 1), (1, 1))])
        av, al, _ = cavlc_blocks_jnp(cac_l.reshape(8 * nmb, 15),
                                     cac_n.reshape(-1), tabs)
        av = av.reshape(8, nmb, 36).transpose(1, 0, 2).reshape(nmb, 8 * 36)
        al = al.reshape(8, nmb, 36).transpose(1, 0, 2).reshape(nmb, 8 * 36)
        parts_v.append(av * keep_ca)
        parts_l.append(al * keep_ca)
        sval = jnp.concatenate(parts_v, axis=1)
        slen = jnp.concatenate(parts_l, axis=1)

        # two-level MSB-first packing (see PERF.md): level 1 packs each
        # block's 36 symbols into a small BW-word window; level 2 treats
        # those words as 32-bit symbols and packs 28 block-windows into the
        # per-MB window — ~4x fewer pack-loop element ops than packing all
        # 1008 slots directly against the full MB window.
        BW = max(4, wwords // 10)  # grows with the escalation ladder, so
        # an L1 (per-block) overflow is also cured by doubling wwords
        nblk = nmb * 28
        sv1 = sval.reshape(nblk, 36)
        sl1 = slen.reshape(nblk, 36)
        ends1 = jnp.cumsum(sl1, axis=1)
        blk_bits = ends1[:, -1]
        offs1 = ends1 - sl1
        vv1 = sv1.astype(jnp.uint32) & ((jnp.uint32(1) << sl1.astype(jnp.uint32)) - 1)
        t1_ = (offs1 & 31).astype(jnp.uint32)
        d1 = t1_ + sl1.astype(jnp.uint32)
        w01 = offs1 >> 5
        sp1 = d1 > 32
        y0 = jnp.where(sp1, vv1 >> jnp.where(sp1, d1 - 32, 0),
                       vv1 << ((jnp.uint32(32) - d1) & 31))
        y1 = jnp.where(sp1, vv1 << jnp.where(sp1, jnp.uint32(64) - d1, 0), jnp.uint32(0))
        bwords = []
        for w in range(BW):
            c = jnp.where(w01 == w, y0, jnp.uint32(0)) | jnp.where(w01 == w - 1, y1, jnp.uint32(0))
            bwords.append(jnp.sum(c.astype(jnp.int32), axis=1))
        bwin = jnp.stack(bwords, axis=1).astype(jnp.uint32)  # [nblk, BW]
        l1_overflow = jnp.max(blk_bits) > BW * 32

        # level 2: 28*BW word-symbols per MB, len = clip(bits - 32k, 0, 32)
        k_iota = jnp.arange(BW, dtype=jnp.int32)[None, :]
        wlen = jnp.clip(blk_bits[:, None] - 32 * k_iota, 0, 32)  # [nblk, BW]
        wlenu = wlen.astype(jnp.uint32)
        wval = jnp.where(wlen >= 32, bwin,
                         jnp.where(wlen > 0, bwin >> ((jnp.uint32(32) - wlenu) & 31),
                                   jnp.uint32(0)))
        sv2 = wval.reshape(nmb, 28 * BW)
        sl2 = wlen.reshape(nmb, 28 * BW)
        ends = jnp.cumsum(sl2, axis=1)
        mb_bits = ends[:, -1]
        offs = ends - sl2
        t = (offs & 31).astype(jnp.uint32)
        w0 = offs >> 5
        d = t + sl2.astype(jnp.uint32)
        spans = d > 32
        x0 = jnp.where(spans, sv2 >> jnp.where(spans, d - 32, 0),
                       sv2 << ((jnp.uint32(32) - d) & 31))
        x1 = jnp.where(spans, sv2 << jnp.where(spans, jnp.uint32(64) - d, 0), jnp.uint32(0))
        words = []
        for w in range(wwords):
            contrib = jnp.where(w0 == w, x0, jnp.uint32(0)) | jnp.where(w0 == w - 1, x1, jnp.uint32(0))
            words.append(jnp.sum(contrib.astype(jnp.int32), axis=1))
        mb_words = jnp.stack(words, axis=1).astype(jnp.uint32)
        overflow = (jnp.max(mb_bits) > wwords * 32) | l1_overflow
        return mb_words, mb_bits.astype(jnp.int32), overflow

    return jax.jit(encode)


class Intra16EncoderTpu:
    """Device H.264 intra encoder: one jit graph + host C assembly.

    Bit-identical to Intra16EncoderV / Intra16Encoder."""

    def __init__(self, width: int, height: int, qp: int = 26, wwords: int = 40):
        self.width, self.height = width, height
        self.qp = qp
        self.wwords = wwords
        self.mb_w = (width + 15) // 16
        self.mb_h = (height + 15) // 16
        self.headers = H.make_sps(width, height) + H.make_pps(qp)
        self._fns = {}
        # slice header as a synthetic prefix window for the C assembler
        hw = H.BitWriter()
        H._slice_header(hw, 0, 0, 0, disable_deblock=True)
        nbits = len(hw.bytes) * 8 + hw.nbits
        bits = int.from_bytes(bytes(hw.bytes), "big") << hw.nbits | hw.acc
        bits <<= (-nbits) % 32
        nw = (nbits + 31) // 32
        self._hdr_words = np.array(
            [(bits >> (32 * (nw - 1 - i))) & 0xFFFFFFFF for i in range(nw)], np.uint32)
        self._hdr_bits = nbits

    def _fn(self, uyvy_in: bool = False):
        key = (self.wwords, uyvy_in)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = make_device_encode(
                self.width, self.height, self.qp, self.wwords, uyvy_in=uyvy_in)
        return fn

    def encode_planes(self, y, cb, cr) -> bytes:
        y, cb, cr = H._pad_to_mb(y, cb, cr)
        yj, cbj, crj = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
        words, bits, ovf = self._fn()(yj, cbj, crj)
        while bool(ovf) and self.wwords < 1024:
            self.wwords *= 4  # one jump reaches intra-grade windows
            words, bits, ovf = self._fn()(yj, cbj, crj)
        return self._assemble(words, bits)

    def _assemble(self, words, bits) -> bytes:
        from ultragrid_tpu.native import h264_assemble_lib

        wn = np.asarray(words)
        bn = np.asarray(bits)
        # prepend the slice header window
        W = wn.shape[1]
        hdr_row = np.zeros((1, W), np.uint32)
        hdr_row[0, : len(self._hdr_words)] = self._hdr_words
        wn = np.ascontiguousarray(np.concatenate([hdr_row, wn], axis=0))
        bn = np.ascontiguousarray(
            np.concatenate([[self._hdr_bits], bn]).astype(np.int32))
        lib = h264_assemble_lib()
        total_bits = int(bn.sum())
        cap = total_bits // 8 + total_bits // 64 + 64
        out = np.empty(cap, np.uint8)
        n = lib.h264_assemble(wn.ctypes.data, bn.ctypes.data, wn.shape[0], W,
                              out.ctypes.data, cap)
        if n < 0:
            raise RuntimeError("h264_assemble: buffer too small")
        payload = out[:n].tobytes()
        start = b"\x00\x00\x00\x01" + bytes([(3 << 5) | 5])
        return self.headers + start + payload

    def encode_uyvy(self, frame: np.ndarray) -> bytes:
        """UYVY in, ONE device transfer: plane split runs in the graph.

        Non-MB-aligned sizes take the plane path (host pad semantics differ
        from padding the interleaved frame; bit-identity with the numpy
        encoder is the contract)."""
        a = np.asarray(frame)[: self.height, : 2 * self.width]
        ph, pw = self.mb_h * 16, self.mb_w * 16
        if a.shape != (ph, 2 * pw):
            y, cb, cr = H.uyvy_to_i420(a, self.width, self.height)
            return self.encode_planes(y, cb, cr)
        fj = jnp.asarray(a)
        words, bits, ovf = self._fn(uyvy_in=True)(fj)
        while bool(ovf) and self.wwords < 1024:
            self.wwords *= 4
            words, bits, ovf = self._fn(uyvy_in=True)(fj)
        return self._assemble(words, bits)


# ---------------------------------------------------------------------------
# Device inter (P-frame) path: ME scan + MC + batched transforms + vectorized
# CAVLC + slot packing + exact in-graph reconstruction, ONE jit graph.
# Bit-identical to InterEncoderV at search=0 (asserted in tests).
# ---------------------------------------------------------------------------

from ultragrid_tpu.ops.h264_dec import _CBP_INTER_FWD as _CBPI_FWD_D  # noqa: E402
from ultragrid_tpu.ops.h264_dec import MC_PAD as _MC_PAD  # noqa: E402

_CBP_INTER_FWD_ARR = np.zeros(48, np.int32)
for _c, _i in _CBPI_FWD_D.items():
    _CBP_INTER_FWD_ARR[_c] = _i


def _ue_bitlen(v1):
    """Exact bit length of v1 (1 <= v1 < 2^30) in int32: float log2 with
    integer fixups for the power-of-two edges."""
    bl = jnp.floor(jnp.log2(v1.astype(jnp.float32))).astype(jnp.int32) + 1
    bl = jnp.where((jnp.int32(1) << bl) <= v1, bl + 1, bl)
    bl = jnp.where((jnp.int32(1) << (bl - 1)) > v1, bl - 1, bl)
    return bl


def _ue_sym2_jnp(v):
    """ue(v) as two slots (leading zeros, value) so lens stay <= 28."""
    v1 = (v + 1).astype(jnp.int32)
    bl = _ue_bitlen(v1)
    return (jnp.zeros_like(v1), bl - 1), (v1, bl)


def _se_sym2_jnp(v):
    cn = jnp.where(v > 0, 2 * v - 1, -2 * v).astype(jnp.int32)
    return _ue_sym2_jnp(cn)


def _itransform4_jnp(d):
    """Batched spec 8.5.12.2 inverse transform over [..., 4, 4] int32."""
    def pass1(x):
        x0, x1 = x[..., 0, :], x[..., 1, :]
        x2, x3 = x[..., 2, :], x[..., 3, :]
        e0 = x0 + x2
        e1 = x0 - x2
        e2 = (x1 >> 1) - x3
        e3 = x1 + (x3 >> 1)
        return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-2)

    h = jnp.swapaxes(pass1(jnp.swapaxes(d, -1, -2)), -1, -2)
    return pass1(h)


def make_device_encode_p(width: int, height: int, qp: int, search: int = 8,
                         wwords: int = 80, _stop_after: str | None = None,
                         subpel: str = "half"):
    """Jitted P-frame encode: (y, cb, cr, ref_y, ref_cb, ref_cr) ->
    (mb_words, mb_bits, overflow, recon_y, recon_cb, recon_cr).

    ``subpel``: "half" (default; fits the 1080p60 budget) or "quarter"
    (adds an 8-candidate quarter-pel refine around the half-pel best —
    spec 8.4.2.2.2 averaging, better compression at ~+2 ms/1080p)."""
    if search > 10:
        raise ValueError("search range > 10 exceeds the MC_PAD window")
    mbw = (width + 15) // 16
    mbh = (height + 15) // 16
    nmb = mbw * mbh
    Hl, Wl = mbh * 16, mbw * 16
    Hc, Wc = mbh * 8, mbw * 8
    qpc = H.chroma_qp(qp)
    tabs = _tables_jnp()
    zz = jnp.asarray(H._ZZ_IDX)

    def _mleft(M, x, n):
        return jnp.stack(
            [sum(int(M[i, j]) * x[..., j, :] for j in range(n)) for i in range(n)],
            axis=-2)

    def _mright_t(M, x, n):
        return jnp.stack(
            [sum(int(M[k, j]) * x[..., :, j] for j in range(n)) for k in range(n)],
            axis=-1)

    def core4(x):
        return _mright_t(H._C4, _mleft(H._C4, x, 4), 4)

    def had2(x):
        return _mright_t(H._H2, _mleft(H._H2, x, 2), 2)

    qbits = 15 + qp // 6
    mfr = H._MF[qp % 6]
    mf = jnp.asarray(np.array(
        [[mfr[H._POSCLASS[r][c]] for c in range(4)] for r in range(4)], np.int32))
    f_off = (1 << qbits) // 3
    qbc = 15 + qpc // 6
    mfrc = H._MF[qpc % 6]
    mfc = jnp.asarray(np.array(
        [[mfrc[H._POSCLASS[r][c]] for c in range(4)] for r in range(4)], np.int32))
    fc_off = (1 << qbc) // 3
    mf0c = int(mfrc[0])
    # dequant V matrices (decoder-exact reconstruction)
    from ultragrid_tpu.ops.h264_dec import _vmat
    vy_m = jnp.asarray(_vmat(qp).astype(np.int32))
    vc_m = jnp.asarray(_vmat(qpc).astype(np.int32))
    v00c = int(_vmat(qpc)[0, 0])

    cbp_fwd = jnp.asarray(_CBP_INTER_FWD_ARR)

    def encode(y, cb, cr, ry, rcb, rcr):
        cur = y.astype(jnp.int32)
        rpy = jnp.pad(ry.astype(jnp.int32), _MC_PAD, mode="edge")
        rpcb = jnp.pad(rcb.astype(jnp.int32), _MC_PAD, mode="edge")
        rpcr = jnp.pad(rcr.astype(jnp.int32), _MC_PAD, mode="edge")
        # native [mbh, rows, mbw, cols] block layout throughout ME/MC/
        # residual: TPU relayouts of non-128-aligned minor dims are
        # expensive, so the (by, bx, y, x) transpose happens once, on
        # the 4x4 residual blocks right before the DCT
        cur_b = cur.reshape(mbh, 16, mbw, 16)

        refb = rpy[_MC_PAD:_MC_PAD + Hl, _MC_PAD:_MC_PAD + Wl].reshape(
            mbh, 16, mbw, 16)

        if not search:
            # zero-MV path (bit-identical to the former 1-candidate scan):
            # prediction is the co-located reference block, chroma frac 0
            pred_y = refb
            pred_cb = rpcb[_MC_PAD:_MC_PAD + Hc, _MC_PAD:_MC_PAD + Wc].reshape(
                mbh, 8, mbw, 8)
            pred_cr = rpcr[_MC_PAD:_MC_PAD + Hc, _MC_PAD:_MC_PAD + Wc].reshape(
                mbh, 8, mbw, 8)
            mvx = jnp.zeros((mbh, mbw), jnp.int32)
            mvy = jnp.zeros((mbh, mbw), jnp.int32)
        else:
            # ---- gather-free ME (round 4) ------------------------------
            # The first design scanned the full (2S+1)^2 grid carrying a
            # 12 MB motion-compensated prediction through every lax.scan
            # step (~7 GB of HBM traffic/frame) and sampled half-pel and
            # chroma candidates with multi-MB gathers (~9 ns/element on
            # TPU) — 376 ms/frame at 1080p.  This shape is built from
            # static slices + one-hot where-chains only (XLA fuses them
            # into single passes; concatenations are hoisted OUT of the
            # select chains, which otherwise block fusion), SADs run in
            # uint8:
            #   (1) coarse full search on half-res planes (unrolled static
            #       shifts, zero candidate first),
            #   (2) ONE per-MB 20x20 window per plane (integer + the three
            #       6-tap half-pel planes of 8.4.2.2.1) extracted at the
            #       coarse MV with one-hot row/col selects,
            #   (3) +-1 integer refine and half-pel refine as static
            #       slices inside that window,
            #   (4) chroma MC from per-MB 9x9 windows (eighth-pel bilinear,
            #       same sample math as the decoder).

            # (1) coarse: half-res full search, zero candidate first
            Sh = max(1, (search + 1) // 2)
            ref_full = rpy[_MC_PAD:_MC_PAD + Hl, _MC_PAD:_MC_PAD + Wl]
            cur_h = ((cur.reshape(Hl // 2, 2, Wl // 2, 2).sum(axis=(1, 3))
                      + 2) >> 2).astype(jnp.uint8)
            ref_h = ((ref_full.reshape(Hl // 2, 2, Wl // 2, 2).sum(axis=(1, 3))
                      + 2) >> 2).astype(jnp.uint8)
            refh_p = jnp.pad(ref_h, Sh, mode="edge")

            def _sad(a_u8, b_u8):
                # native [mbh, 16, mbw, 16] block layout
                d = jnp.maximum(a_u8, b_u8) - jnp.minimum(a_u8, b_u8)
                return d.astype(jnp.int32).sum(axis=(1, 3))

            offs = [(0, 0)] + [(dx, dy) for dy in range(-Sh, Sh + 1)
                               for dx in range(-Sh, Sh + 1) if (dx, dy) != (0, 0)]
            # 8x8 block sums as two 0/1 matmuls on the MXU (strided
            # reshape-reduces measured ~2x slower); bf16 |d| operands with
            # f32 accumulation keep every sum exact (<= 544*255 << 2^24)
            A8 = np.zeros((mbh, Hl // 2), np.float32)
            for i_ in range(mbh):
                A8[i_, i_ * 8:(i_ + 1) * 8] = 1
            B8 = np.zeros((Wl // 2, mbw), np.float32)
            for i_ in range(mbw):
                B8[i_ * 8:(i_ + 1) * 8, i_] = 1
            ds = []
            for dx, dy in offs:
                sh = refh_p[Sh + dy:Sh + dy + Hl // 2,
                            Sh + dx:Sh + dx + Wl // 2]
                ds.append(jnp.maximum(cur_h, sh) - jnp.minimum(cur_h, sh))
            D = jnp.stack(ds).astype(jnp.bfloat16)
            t_ = jnp.einsum("mh,chw->cmw", jnp.asarray(A8, jnp.bfloat16), D,
                            preferred_element_type=jnp.float32)
            s_ = jnp.einsum("cmw,wk->cmk", t_, jnp.asarray(B8))
            ci = jnp.argmin(s_, axis=0)  # first min wins
            if _stop_after == "coarse":
                return (ci,)
            offs_np = np.asarray(offs, np.int32)
            ty0 = 2 * jnp.take(jnp.asarray(offs_np[:, 1]), ci)
            tx0 = 2 * jnp.take(jnp.asarray(offs_np[:, 0]), ci)

            # per-MB window machinery: Q planes live in a common coordinate
            # frame with origin _MC_PAD-24, so MB (my,mx)'s origin is at
            # Q[24+16*my, 24+16*mx]
            B0 = _MC_PAD - 24

            def _colblock(Q, stride, start):
                parts = [
                    Q[..., :, start + stride * j:start + stride * j
                      + mbw * stride].reshape(Q.shape[:-1] + (mbw, stride))
                    for j in range(3)
                ]
                return jnp.concatenate(parts, axis=-1)

            def _rowsel(CB, tv, vals, stride, win, org):
                # one-hot row select; the (stride, win-stride) split keeps
                # the where-chains pure-elementwise (fusable), concat once
                acc_a = acc_b = None
                nex = win - stride
                H_ = mbh * stride
                for v in vals:
                    base = org + v
                    a = CB[..., base:base + H_, :, :].reshape(
                        CB.shape[:-3] + (mbh, stride) + CB.shape[-2:])
                    bb = CB[..., base + stride:base + stride + H_, :, :].reshape(
                        CB.shape[:-3] + (mbh, stride)
                        + CB.shape[-2:])[..., :, :nex, :, :]
                    if acc_a is None:
                        acc_a, acc_b = a, bb
                    else:
                        m = (tv == v)[:, None, :, None]
                        acc_a = jnp.where(m, a, acc_a)
                        acc_b = jnp.where(m, bb, acc_b)
                return jnp.concatenate([acc_a, acc_b], axis=-3)

            def _colsel(R, tu, vals, org, win):
                acc = None
                for u in vals:
                    blk = R[..., org + u:org + u + win]
                    if acc is None:
                        acc = blk
                    else:
                        m = (tu == u)[:, None, :, None]
                        acc = jnp.where(m, blk, acc)
                return acc

            Hq, Wq = Hl + 48, Wl + 48

            # (2) ONE 25x25 INTEGER window per MB at the coarse MV, then
            # the half-pel planes (6-tap, spec 8.4.2.2.1) computed
            # IN-WINDOW.  The earlier shape built b/h/j over the full
            # padded frame and window-extracted all 4 planes: ~3x the
            # one-hot select traffic plus three full-frame int32 tap
            # passes.  The 6-tap is local, so a 25x25 integer window
            # (20 + 5 tap support; margin 2 for the +-1 refine and the
            # half-pel sample offsets) yields bit-identical planes.
            from ultragrid_tpu.ops.h264 import _HALF_OFFS

            evens = [2 * v for v in range(-Sh, Sh + 1)]
            ru8 = rpy.astype(jnp.uint8)[None]
            CB1 = _colblock(ru8[:, B0:B0 + Hq, B0:B0 + Wq], 16, 12)
            R1 = _rowsel(CB1, ty0, evens, 16, 25, 20)   # [1, mbh, 25, mbw, 48]
            W25 = _colsel(R1, tx0, evens, 8, 25)[0].astype(jnp.int32)
            # W25[my,r,mx,c] = integer plane at (16my+ty0-4+r, 16mx+tx0-4+c)

            def wtap_c(a):
                return (a[..., 0:-5] - 5 * a[..., 1:-4] + 20 * a[..., 2:-3]
                        + 20 * a[..., 3:-2] - 5 * a[..., 4:-1] + a[..., 5:])

            def wtap_r(a):
                return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
                        + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])

            w_b1 = wtap_c(W25)          # [mbh, 25, mbw, 20] (x+0.5 lattice)
            w_h1 = wtap_r(W25)          # [mbh, 20, mbw, 25] (y+0.5)
            w_j1 = wtap_r(w_b1)         # [mbh, 20, mbw, 20] (diagonal)
            W20 = jnp.stack([
                W25[:, 2:22, :, 2:22],
                jnp.clip((w_b1[:, 2:22] + 16) >> 5, 0, 255),
                jnp.clip((w_h1[:, :, :, 2:22] + 16) >> 5, 0, 255),
                jnp.clip((w_j1 + 512) >> 10, 0, 255),
            ]).astype(jnp.uint8)        # [4, mbh, 20, mbw, 20]
            if _stop_after == "extract":
                return (W20,)

            # (3a) +-1 integer refine: static slices of the integer plane;
            # W20[p][my,r,mx,c] = plane_p at (16*my+ty0-2+r, 16*mx+tx0-2+c)
            cur_b8 = y.reshape(mbh, 16, mbw, 16)
            refb8 = ry.reshape(mbh, 16, mbw, 16)
            deltas = [(0, 0)] + [(dx, dy) for dy in (-1, 0, 1)
                                 for dx in (-1, 0, 1) if (dx, dy) != (0, 0)]
            best = bdx = bdy = None
            for ddx, ddy in deltas:
                cand = W20[0, :, 2 + ddy:18 + ddy, :, 2 + ddx:18 + ddx]
                sad = _sad(cur_b8, cand)
                if best is None:
                    best = sad
                    bdx = jnp.zeros_like(sad)
                    bdy = jnp.zeros_like(sad)
                else:
                    m = sad < best
                    best = jnp.where(m, sad, best)
                    bdx = jnp.where(m, ddx, bdx)
                    bdy = jnp.where(m, ddy, bdy)
            ty = ty0 + bdy
            tx = tx0 + bdx

            # re-anchor the windows at the refined integer MV (3x3 one-hot)
            accr = None
            for by in (-1, 0, 1):
                blk = W20[:, :, 1 + by:19 + by, :, :]
                if accr is None:
                    accr = blk
                else:
                    accr = jnp.where((bdy == by)[:, None, :, None], blk, accr)
            W18 = None
            for bx in (-1, 0, 1):
                blk = accr[:, :, :, :, 1 + bx:19 + bx]
                if W18 is None:
                    W18 = blk
                else:
                    W18 = jnp.where((bdx == bx)[:, None, :, None], blk, W18)
            # W18[p][my,r,mx,c] = plane_p at (16*my+ty-1+r, 16*mx+tx-1+c)

            # (3b) half-pel refine: static slices of the half-pel planes
            pred_y8 = W18[0, :, 1:17, :, 1:17]
            mvx, mvy = tx * 4, ty * 4
            for hdx, hdy in _HALF_OFFS:
                fx, fy = hdx & 3, hdy & 3
                pi = 3 if (fx and fy) else (1 if fx else 2)
                ro, co = (hdy >> 2) + 1, (hdx >> 2) + 1
                cand = W18[pi, :, ro:ro + 16, :, co:co + 16]
                sad = _sad(cur_b8, cand)
                m = sad < best
                best = jnp.where(m, sad, best)
                mvx = jnp.where(m, tx * 4 + hdx, mvx)
                mvy = jnp.where(m, ty * 4 + hdy, mvy)
                pred_y8 = jnp.where(m[:, None, :, None], cand, pred_y8)

            if subpel == "quarter":
                # ---- quarter-pel refine (spec 8.4.2.2.2) --------------
                # 8 quarter candidates around the half-pel best.  Work in
                # absolute quarter coords relative to the W18 origin
                # (ty-1, tx-1): X0 = mvx-4*tx+4 in {2,4,6}.  A quarter
                # sample averages (upward rounding) its two even-coord
                # neighbours: along the axis for axis positions; the
                # b-type + h-type diagonal pair for both-odd positions
                # (the int/j diagonal is NOT used).  Source grids are
                # fetched from W18 with a 9-case (X0,Y0) one-hot; the
                # axis candidates reuse the half-pel best grid as one
                # source (it IS position (X0, Y0)).
                half_pred = pred_y8
                half_mvx, half_mvy = mvx, mvy
                X0 = half_mvx - 4 * tx + 4
                Y0 = half_mvy - 4 * ty + 4

                def _grid(EX, EY):
                    xh, yh = EX % 4 == 2, EY % 4 == 2
                    p = (1 if xh else 0) + (2 if yh else 0)
                    co = (EX - (2 if xh else 0)) // 4
                    ro = (EY - (2 if yh else 0)) // 4
                    return W18[p, :, ro:ro + 16, :, co:co + 16]

                def fetch(ex_of, ey_of):
                    acc = None
                    for x0 in (2, 4, 6):
                        for y0 in (2, 4, 6):
                            g = _grid(ex_of(x0, y0), ey_of(x0, y0))
                            if acc is None:
                                acc = g
                            else:
                                m_ = ((X0 == x0) & (Y0 == y0)
                                      )[:, None, :, None]
                                acc = jnp.where(m_, g, acc)
                    return acc

                def _pick(xc, want):
                    # xc odd: the even neighbour with residue `want` mod 4
                    return xc - 1 if (xc - 1) % 4 == want else xc + 1

                hp_i = half_pred.astype(jnp.int32)
                for qdx, qdy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                                 (1, 1), (1, -1), (-1, 1), (-1, -1)):
                    if qdy == 0:
                        other = fetch(lambda x0, y0: x0 + 2 * qdx,
                                      lambda x0, y0: y0)
                        cand = ((hp_i + other.astype(jnp.int32) + 1) >> 1
                                ).astype(jnp.uint8)
                    elif qdx == 0:
                        other = fetch(lambda x0, y0: x0,
                                      lambda x0, y0: y0 + 2 * qdy)
                        cand = ((hp_i + other.astype(jnp.int32) + 1) >> 1
                                ).astype(jnp.uint8)
                    else:
                        bsrc = fetch(
                            lambda x0, y0: _pick(x0 + qdx, 2),
                            lambda x0, y0: _pick(y0 + qdy, 0))
                        hsrc = fetch(
                            lambda x0, y0: _pick(x0 + qdx, 0),
                            lambda x0, y0: _pick(y0 + qdy, 2))
                        cand = ((bsrc.astype(jnp.int32)
                                 + hsrc.astype(jnp.int32) + 1) >> 1
                                ).astype(jnp.uint8)
                    sad = _sad(cur_b8, cand)
                    m = sad < best
                    best = jnp.where(m, sad, best)
                    mvx = jnp.where(m, half_mvx + qdx, mvx)
                    mvy = jnp.where(m, half_mvy + qdy, mvy)
                    pred_y8 = jnp.where(m[:, None, :, None], cand, pred_y8)

            # explicit zero-MV candidate (skip bias: wins ties)
            if _stop_after == "halfpel":
                return (pred_y8, mvx, mvy)
            sad0 = _sad(cur_b8, refb8)
            mz = sad0 <= best
            mvx = jnp.where(mz, 0, mvx)
            mvy = jnp.where(mz, 0, mvy)
            pred_y = jnp.where(mz[:, None, :, None], refb8, pred_y8
                               ).astype(jnp.int32)

            # (4) chroma MC from final MVs: per-MB 9x9 windows +
            # eighth-pel bilinear (identical sample math to the decoder)
            cxi, cxf = mvx >> 3, mvx & 7
            cyi, cyf = mvy >> 3, mvy & 7
            lo = (-4 * (search + 1) - 2) >> 3
            hi = (4 * (search + 1) + 2) >> 3
            cvals = list(range(lo, hi + 1))
            B0c = _MC_PAD - 12
            Qc = jnp.stack([
                rpcb[B0c:B0c + Hc + 24, B0c:B0c + Wc + 24],
                rpcr[B0c:B0c + Hc + 24, B0c:B0c + Wc + 24],
            ])
            CBc = _colblock(Qc, 8, 4)                 # [2, Hc+24, mbw, 24]
            Rc = _rowsel(CBc, cyi, cvals, 8, 9, 12)   # [2, mbh, 9, mbw, 24]
            W9 = _colsel(Rc, cxi, cvals, 8, 9)        # [2, mbh, 9, mbw, 9]
            wxf = cxf[:, None, :, None]
            wyf = cyf[:, None, :, None]
            a = W9[:, :, :8, :, :8]
            b_ = W9[:, :, :8, :, 1:9]
            c_ = W9[:, :, 1:9, :, :8]
            d_ = W9[:, :, 1:9, :, 1:9]
            blend = ((8 - wxf) * (8 - wyf) * a + wxf * (8 - wyf) * b_
                     + (8 - wxf) * wyf * c_ + wxf * wyf * d_ + 32) >> 6
            pred_cb, pred_cr = blend[0], blend[1]
            if _stop_after == "chroma":
                return (pred_y, pred_cb, pred_cr, mvx, mvy)

        # ---- luma residual: 16-coeff blocks ----
        res = cur_b - pred_y
        b44 = res.reshape(mbh, 4, 4, mbw, 4, 4).transpose(0, 3, 1, 4, 2, 5)
        coefs = core4(b44)
        lv = (jnp.abs(coefs) * mf + f_off) >> qbits
        q_l = jnp.sign(coefs) * lv
        zz_l = q_l.reshape(mbh, mbw, 4, 4, 16)[..., zz]
        grp = []
        for g in range(4):
            gy0, gx0 = (g // 2) * 2, (g % 2) * 2
            grp.append(jnp.any(
                zz_l[:, :, gy0:gy0 + 2, gx0:gx0 + 2] != 0, axis=(2, 3, 4)))
        cbp_luma = (grp[0] * 1 + grp[1] * 2 + grp[2] * 4 + grp[3] * 8
                    ).astype(jnp.int32)

        # ---- chroma residual ----
        cdc_lv, cac_lv, zz_cac = [], [], []
        for plane, predc in ((cb, pred_cb), (cr, pred_cr)):
            p = plane.astype(jnp.int32).reshape(mbh, 8, mbw, 8)
            cres = p - predc
            c44 = cres.reshape(mbh, 2, 4, mbw, 2, 4).transpose(0, 3, 1, 4, 2, 5)
            cc = core4(c44)
            dc2 = had2(cc[..., 0, 0])
            dclv = (jnp.abs(dc2) * mf0c + 2 * fc_off) >> (qbc + 1)
            cdc_lv.append(jnp.sign(dc2) * dclv)
            a = jnp.sign(cc) * ((jnp.abs(cc) * mfc + fc_off) >> qbc)
            a = a.at[..., 0, 0].set(0)
            cac_lv.append(a)
            zz_cac.append(a.reshape(mbh, mbw, 2, 2, 16)[..., zz][..., 1:])
        any_cac = (jnp.any(zz_cac[0] != 0, axis=(2, 3, 4))
                   | jnp.any(zz_cac[1] != 0, axis=(2, 3, 4)))
        any_cdc = (jnp.any(cdc_lv[0].reshape(mbh, mbw, -1) != 0, axis=2)
                   | jnp.any(cdc_lv[1].reshape(mbh, mbw, -1) != 0, axis=2))
        cbp_chroma = jnp.where(any_cac, 2, jnp.where(any_cdc, 1, 0)
                               ).astype(jnp.int32)
        cbp = cbp_luma | (cbp_chroma << 4)
        if _stop_after == "residual":
            return (cbp, zz_l, mvx, mvy)

        # ---- MV prediction / skip grids (spec 8.4.1.3 / 8.4.1.1) ----
        def shifted(a, dx, dy, avail):
            out = jnp.zeros_like(a)
            ys = slice(max(0, -dy), mbh - max(0, dy) or None)
            xs = slice(max(0, -dx), mbw - max(0, dx) or None)
            ys_s = slice(max(0, dy), mbh - max(0, -dy) or None)
            xs_s = slice(max(0, dx), mbw - max(0, -dx) or None)
            out = out.at[ys, xs].set(a[ys_s, xs_s])
            return jnp.where(avail, out, 0)

        availA = np.zeros((mbh, mbw), bool); availA[:, 1:] = True
        availB = np.zeros((mbh, mbw), bool); availB[1:, :] = True
        availC = np.zeros((mbh, mbw), bool); availC[1:, :-1] = True
        availD = np.zeros((mbh, mbw), bool); availD[1:, 1:] = True
        availCD = availC | availD
        jA, jB = jnp.asarray(availA), jnp.asarray(availB)
        jC, jCD = jnp.asarray(availC), jnp.asarray(availCD)
        navail = jnp.asarray(
            availA.astype(np.int32) + availB + availCD)
        geo = jnp.asarray(~availB & ~availCD & availA)
        pm = []
        for a in (mvx, mvy):
            va = shifted(a, -1, 0, jA)
            vb = shifted(a, 0, -1, jB)
            vc = jnp.where(jC, shifted(a, 1, -1, jC), shifted(a, -1, -1, jCD))
            med = jnp.maximum(jnp.minimum(va, vb),
                              jnp.minimum(jnp.maximum(va, vb), vc))
            only = (jnp.where(jA, va, 0) + jnp.where(jB, vb, 0)
                    + jnp.where(jCD, vc, 0))
            pm.append(jnp.where(geo, va, jnp.where(navail == 1, only, med)))
        pmx, pmy = pm
        za = shifted((mvx == 0) & (mvy == 0), -1, 0, jA)
        zb = shifted((mvx == 0) & (mvy == 0), 0, -1, jB)
        force0 = (~jA) | (~jB) | (jA & (za != 0)) | (jB & (zb != 0))
        smx = jnp.where(force0, 0, pmx)
        smy = jnp.where(force0, 0, pmy)
        skip = (cbp == 0) & (mvx == smx) & (mvy == smy)
        coded = (~skip).reshape(-1)

        # skip runs: run before coded MB i = i - prev_coded(i) - 1
        idx = jnp.arange(nmb, dtype=jnp.int32)
        marks = jnp.where(coded, idx, -1)
        prev_inclusive = jax.lax.associative_scan(jnp.maximum, marks)
        prevb = jnp.concatenate([jnp.array([-1], jnp.int32),
                                 prev_inclusive[:-1]])
        run = idx - prevb - 1

        # ---- nnz / nC ----
        gidx = np.array([[(by_ // 2) * 2 + (bx_ // 2) for bx_ in range(4)]
                         for by_ in range(4)])
        grp_stack = jnp.stack(grp, axis=-1)  # [mbh, mbw, 4]
        blk_coded = grp_stack[:, :, jnp.asarray(gidx.reshape(-1))].reshape(
            mbh, mbw, 4, 4) & coded.reshape(mbh, mbw, 1, 1)
        tot_l = (zz_l != 0).sum(axis=4).astype(jnp.int32)
        nnz_l = (tot_l * blk_coded).transpose(0, 2, 1, 3).reshape(mbh * 4, mbw * 4)
        keep_cac = (cbp_chroma == 2) & coded.reshape(mbh, mbw)
        nnz_c = [((z != 0).sum(axis=4).astype(jnp.int32)
                  * keep_cac[:, :, None, None]).transpose(0, 2, 1, 3
                  ).reshape(mbh * 2, mbw * 2) for z in zz_cac]

        def nc_grid(nn):
            gh, gw = nn.shape
            na = jnp.concatenate(
                [jnp.full((gh, 1), -1, jnp.int32), nn[:, :-1]], axis=1)
            nb = jnp.concatenate(
                [jnp.full((1, gw), -1, jnp.int32), nn[:-1]], axis=0)
            both = (na >= 0) & (nb >= 0)
            return jnp.where(both, (na + nb + 1) >> 1,
                             jnp.where(na >= 0, na,
                                       jnp.where(nb >= 0, nb, 0)))

        ncl = nc_grid(nnz_l)
        ncc = [nc_grid(nn) for nn in nnz_c]

        # ---- symbol grid: header pseudo-block (10 slots) + 26 blocks ----
        S = 36
        (rz_v, rz_l), (rv_v, rv_l) = _ue_sym2_jnp(run)
        mvd_x = (mvx - pmx).reshape(-1)
        mvd_y = (mvy - pmy).reshape(-1)
        (xz_v, xz_l), (xv_v, xv_l) = _se_sym2_jnp(mvd_x)
        (yz_v, yz_l), (yv_v, yv_l) = _se_sym2_jnp(mvd_y)
        cbp_code = jnp.take(cbp_fwd, cbp.reshape(-1))
        (cz_v, cz_l), (cv_v, cv_l) = _ue_sym2_jnp(cbp_code)
        has_cbp = (cbp.reshape(-1) != 0).astype(jnp.int32)
        ones = jnp.ones(nmb, jnp.int32)
        hdr_v = jnp.stack([rz_v, rv_v, ones, xz_v, xv_v, yz_v, yv_v,
                           cz_v, cv_v, ones], axis=1)
        hdr_l = jnp.stack([rz_l, rv_l, ones, xz_l, xv_l, yz_l, yv_l,
                           cz_l, cv_l, has_cbp], axis=1)
        zpad = jnp.zeros((nmb, S - 10), jnp.int32)
        parts_v = [jnp.concatenate([hdr_v, zpad], axis=1)]
        parts_l = [jnp.concatenate([hdr_l, zpad], axis=1)]
        # 16 luma blocks (full 16-coeff CAVLC), coding order
        lum_lv = jnp.stack([zz_l[:, :, by_, bx_].reshape(nmb, 16)
                            for bx_, by_ in H._BLK_ORDER])
        lum_nc = jnp.stack([ncl[by_::4, bx_::4].reshape(-1)
                            for bx_, by_ in H._BLK_ORDER])
        av, al, _ = cavlc_blocks_jnp(lum_lv.reshape(16 * nmb, 16),
                                     lum_nc.reshape(-1), tabs)
        keep_blk = jnp.stack([blk_coded[:, :, by_, bx_].reshape(-1)
                              for bx_, by_ in H._BLK_ORDER])  # [16, nmb]
        av = (av.reshape(16, nmb, S) * keep_blk[:, :, None]
              ).transpose(1, 0, 2).reshape(nmb, 16 * S)
        al = (al.reshape(16, nmb, S) * keep_blk[:, :, None]
              ).transpose(1, 0, 2).reshape(nmb, 16 * S)
        parts_v.append(av)
        parts_l.append(al)
        keep_cd = ((cbp_chroma.reshape(-1) > 0) & coded)[:, None]
        cdc_all = jnp.concatenate([cdc_lv[0].reshape(nmb, 4),
                                   cdc_lv[1].reshape(nmb, 4)])
        cv2, cl2, _ = cavlc_blocks_jnp(cdc_all, jnp.zeros(2 * nmb, jnp.int32),
                                       tabs, chroma_dc=True)
        cv2 = cv2.reshape(2, nmb, S).transpose(1, 0, 2).reshape(nmb, 2 * S)
        cl2 = cl2.reshape(2, nmb, S).transpose(1, 0, 2).reshape(nmb, 2 * S)
        parts_v.append(cv2 * keep_cd)
        parts_l.append(cl2 * keep_cd)
        kac = keep_cac.reshape(-1)[:, None]
        cac_l = jnp.stack([zz_cac[ci][:, :, by_, bx_].reshape(nmb, 15)
                           for ci in range(2)
                           for bx_, by_ in ((0, 0), (1, 0), (0, 1), (1, 1))])
        cac_n = jnp.stack([ncc[ci][by_::2, bx_::2].reshape(-1)
                           for ci in range(2)
                           for bx_, by_ in ((0, 0), (1, 0), (0, 1), (1, 1))])
        av2, al2, _ = cavlc_blocks_jnp(cac_l.reshape(8 * nmb, 15),
                                       cac_n.reshape(-1), tabs)
        av2 = av2.reshape(8, nmb, S).transpose(1, 0, 2).reshape(nmb, 8 * S)
        al2 = al2.reshape(8, nmb, S).transpose(1, 0, 2).reshape(nmb, 8 * S)
        parts_v.append(av2 * kac)
        parts_l.append(al2 * kac)
        sval = jnp.concatenate(parts_v, axis=1) * coded[:, None]
        slen = jnp.concatenate(parts_l, axis=1) * coded[:, None]

        # ---- two-level pack (27 block windows per MB) ----
        NB = 27
        BW = max(4, wwords // 10)
        nblk = nmb * NB
        sv1 = sval.reshape(nblk, S)
        sl1 = slen.reshape(nblk, S)
        ends1 = jnp.cumsum(sl1, axis=1)
        blk_bits = ends1[:, -1]
        offs1 = ends1 - sl1
        vv1 = sv1.astype(jnp.uint32) & ((jnp.uint32(1) << sl1.astype(jnp.uint32)) - 1)
        t1_ = (offs1 & 31).astype(jnp.uint32)
        d1 = t1_ + sl1.astype(jnp.uint32)
        w01 = offs1 >> 5
        sp1 = d1 > 32
        y0_ = jnp.where(sp1, vv1 >> jnp.where(sp1, d1 - 32, 0),
                        vv1 << ((jnp.uint32(32) - d1) & 31))
        y1_ = jnp.where(sp1, vv1 << jnp.where(sp1, jnp.uint32(64) - d1, 0),
                        jnp.uint32(0))
        bwords = []
        for w_ in range(BW):
            c = (jnp.where(w01 == w_, y0_, jnp.uint32(0))
                 | jnp.where(w01 == w_ - 1, y1_, jnp.uint32(0)))
            bwords.append(jnp.sum(c.astype(jnp.int32), axis=1))
        bwin = jnp.stack(bwords, axis=1).astype(jnp.uint32)
        l1_overflow = jnp.max(blk_bits) > BW * 32
        k_iota = jnp.arange(BW, dtype=jnp.int32)[None, :]
        wlen = jnp.clip(blk_bits[:, None] - 32 * k_iota, 0, 32)
        wlenu = wlen.astype(jnp.uint32)
        wval = jnp.where(wlen >= 32, bwin,
                         jnp.where(wlen > 0,
                                   bwin >> ((jnp.uint32(32) - wlenu) & 31),
                                   jnp.uint32(0)))
        sv2 = wval.reshape(nmb, NB * BW)
        sl2 = wlen.reshape(nmb, NB * BW)
        ends = jnp.cumsum(sl2, axis=1)
        mb_bits = ends[:, -1]
        offs = ends - sl2
        t = (offs & 31).astype(jnp.uint32)
        w0 = offs >> 5
        d = t + sl2.astype(jnp.uint32)
        spans = d > 32
        x0 = jnp.where(spans, sv2 >> jnp.where(spans, d - 32, 0),
                       sv2 << ((jnp.uint32(32) - d) & 31))
        x1 = jnp.where(spans, sv2 << jnp.where(spans, jnp.uint32(64) - d, 0),
                       jnp.uint32(0))
        words = []
        for w_ in range(wwords):
            contrib = (jnp.where(w0 == w_, x0, jnp.uint32(0))
                       | jnp.where(w0 == w_ - 1, x1, jnp.uint32(0)))
            words.append(jnp.sum(contrib.astype(jnp.int32), axis=1))
        mb_words = jnp.stack(words, axis=1).astype(jnp.uint32)
        overflow = (jnp.max(mb_bits) > wwords * 32) | l1_overflow

        # ---- exact in-graph reconstruction -> next reference ----
        dz = jnp.zeros((mbh, mbw, 4, 4, 16), jnp.int32)
        dz = dz.at[..., zz].set(zz_l * blk_coded[..., None])
        d_l = dz.reshape(mbh, mbw, 4, 4, 4, 4) * vy_m << (qp // 6)
        res_l = (_itransform4_jnp(d_l) + 32) >> 6
        rec = jnp.clip(pred_y.reshape(mbh, 4, 4, mbw, 4, 4).transpose(
            0, 3, 1, 4, 2, 5) + res_l, 0, 255)
        ny = rec.transpose(0, 2, 4, 1, 3, 5).reshape(Hl, Wl).astype(jnp.uint8)
        keep_dc = ((cbp_chroma > 0) & coded.reshape(mbh, mbw))
        nplanes = []
        for ci, predc in ((0, pred_cb), (1, pred_cr)):
            fdc = had2(cdc_lv[ci] * keep_dc[:, :, None, None])
            dcsc = ((fdc * v00c) << (qpc // 6)) >> 1
            zzc = jnp.zeros((mbh, mbw, 2, 2, 16), jnp.int32)
            zzc = zzc.at[..., 1:].set(zz_cac[ci] * keep_cac[:, :, None, None, None])
            dcf = jnp.zeros((mbh, mbw, 2, 2, 16), jnp.int32)
            dcf = dcf.at[..., zz].set(zzc)
            d_c = dcf.reshape(mbh, mbw, 2, 2, 4, 4) * vc_m << (qpc // 6)
            d_c = d_c.at[..., 0, 0].set(dcsc)
            res_c = (_itransform4_jnp(d_c) + 32) >> 6
            recc = jnp.clip(predc.reshape(mbh, 2, 4, mbw, 2, 4).transpose(
                0, 3, 1, 4, 2, 5) + res_c, 0, 255)
            nplanes.append(recc.transpose(0, 2, 4, 1, 3, 5).reshape(
                Hc, Wc).astype(jnp.uint8))
        return (mb_words, mb_bits.astype(jnp.int32), overflow,
                ny, nplanes[0], nplanes[1])

    return jax.jit(encode)


class InterEncoderTpu:
    """Device IDR+P encoder: P frames run as ONE jit graph (ME scan, MC,
    transforms, CAVLC, slot pack, exact reconstruction); IDR frames ride
    Intra16EncoderTpu with the reference picture reconstructed by the own
    decoder (sample-exact).  Bitstreams are decoder-conformant; at
    search=0 they are bit-identical to InterEncoderV/InterEncoder."""

    def __init__(self, width: int, height: int, qp: int = 26, gop: int = 30,
                 search: int = 8, wwords: int = 32, subpel: str = "half"):
        self.width, self.height = width, height
        self.qp, self.gop, self.search = qp, max(1, gop), search
        self.wwords = wwords
        self.subpel = subpel
        self.mb_w = (width + 15) // 16
        self.mb_h = (height + 15) // 16
        self.headers = H.make_sps(width, height, num_ref_frames=1) + H.make_pps(qp)
        self._intra = Intra16EncoderTpu(width, height, qp)
        self._intra.headers = b""
        self._fns = {}
        self._frame_idx = 0
        self._frame_num = 0
        self.ref = None  # device (y, cb, cr) uint8

    def _fn(self):
        fn = self._fns.get(self.wwords)
        if fn is None:
            fn = self._fns[self.wwords] = make_device_encode_p(
                self.width, self.height, self.qp, self.search, self.wwords,
                subpel=self.subpel)
        return fn

    def encode_uyvy(self, frame: np.ndarray) -> bytes:
        y, cb, cr = H.uyvy_to_i420(frame, self.width, self.height)
        return self.encode_planes(y, cb, cr)

    def encode_planes(self, y, cb, cr) -> bytes:
        y, cb, cr = H._pad_to_mb(y, cb, cr)
        if self.ref is None or self._frame_idx % self.gop == 0:
            bs = self._encode_idr(y, cb, cr)
        else:
            bs = self._encode_p(y, cb, cr)
        self._frame_idx += 1
        return bs

    def _encode_idr(self, y, cb, cr) -> bytes:
        from ultragrid_tpu.ops.h264_dec import IntraDecoder

        slice_bytes = self._intra.encode_planes(y, cb, cr)
        bs = self.headers + slice_bytes
        ry, rcb, rcr = IntraDecoder().decode(bs)
        ryp, rcbp, rcrp = H._pad_to_mb(ry, rcb, rcr)
        self.ref = (jnp.asarray(ryp), jnp.asarray(rcbp), jnp.asarray(rcrp))
        self._frame_num = 1
        return bs

    def _encode_p(self, y, cb, cr) -> bytes:
        fn = self._fn()
        args = (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)) + self.ref
        words, bits, ovf, ny, ncb, ncr = fn(*args)
        while bool(ovf) and self.wwords < 1024:
            self.wwords *= 4  # one jump reaches intra-grade windows
            words, bits, ovf, ny, ncb, ncr = self._fn()(*args)
        self.ref = (ny, ncb, ncr)
        bs = self._assemble(np.asarray(words), np.asarray(bits))
        self._frame_num = (self._frame_num + 1) & 15
        return bs

    def _assemble(self, wn: np.ndarray, bn: np.ndarray) -> bytes:
        from ultragrid_tpu.native import h264_assemble_lib

        # slice-header prefix window
        hw = H.BitWriter()
        H._p_slice_header(hw, 0, self._frame_num)
        hbits = len(hw.bytes) * 8 + hw.nbits
        hval = int.from_bytes(bytes(hw.bytes), "big") << hw.nbits | hw.acc
        # trailing skip run when the frame ends in skips (the C assembler
        # appends the rbsp stop bit + padding itself)
        nmb = self.mb_w * self.mb_h
        coded_idx = np.flatnonzero(bn > 0)
        trailing = (nmb - 1 - coded_idx[-1]) if coded_idx.size else nmb
        tw = H.BitWriter()
        if trailing:
            tw.ue(int(trailing))
        tbits = len(tw.bytes) * 8 + tw.nbits
        tval = int.from_bytes(bytes(tw.bytes), "big") << tw.nbits | tw.acc

        W = wn.shape[1]

        def window(val: int, nbits: int) -> np.ndarray:
            val <<= (-nbits) % 32
            nw = (nbits + 31) // 32
            row = np.zeros((1, W), np.uint32)
            row[0, :nw] = [(val >> (32 * (nw - 1 - i))) & 0xFFFFFFFF
                           for i in range(nw)]
            return row

        wn = np.ascontiguousarray(
            np.concatenate([window(hval, hbits), wn, window(tval, tbits)]))
        bn = np.ascontiguousarray(
            np.concatenate([[hbits], bn, [tbits]]).astype(np.int32))
        lib = h264_assemble_lib()
        total_bits = int(bn.sum())
        cap = total_bits // 8 + total_bits // 64 + 64
        out = np.empty(cap, np.uint8)
        n = lib.h264_assemble(wn.ctypes.data, bn.ctypes.data, wn.shape[0], W,
                              out.ctypes.data, cap)
        if n < 0:
            raise RuntimeError("h264_assemble: buffer too small")
        start = b"\x00\x00\x00\x01" + bytes([(3 << 5) | 1])  # non-IDR NAL
        return start + out[:n].tobytes()
