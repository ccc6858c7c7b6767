"""Own H.264 intra decoder (the encoder's subset: I_PCM + I_16x16 CAVLC).

Counterpart of the own encoder in ops/h264.py, so the framework can both
produce AND consume H.264 without FFmpeg (role: src/video_decompress/
libavcodec.c).  Implements the *decoder-side* spec math — CAVLC parsing,
dequantization (LevelScale tables), inverse Hadamard + inverse core
transform, and intra prediction from RECONSTRUCTED neighbors — so its
output must match any conformant decoder bit-exactly; tests assert
sample-exact agreement with libavcodec on our encoder's streams.

Supported: baseline profile, one I slice per IDR frame, mb types I_PCM and
I_16x16 with DC prediction (what the encoder emits), deblocking disabled.
Anything else raises ``UnsupportedStream``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ultragrid_tpu.ops import h264 as H


class UnsupportedStream(Exception):
    pass


# ---------------------------------------------------------------------------
# bit reading
# ---------------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise UnsupportedStream("bad exp-golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _unepb(data: bytes) -> bytes:
    """Remove emulation-prevention 0x03 bytes."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def split_nals(bs: bytes):
    """Annex-B -> [(nal_type, rbsp bytes)]."""
    out = []
    i = 0
    n = len(bs)
    starts = []
    while i < n - 3:
        if bs[i] == 0 and bs[i + 1] == 0 and (bs[i + 2] == 1 or (bs[i + 2] == 0 and i + 3 < n and bs[i + 3] == 1)):
            skip = 3 if bs[i + 2] == 1 else 4
            starts.append(i + skip)
            i += skip
        else:
            i += 1
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else n
        # trim the next start code's leading zeros
        while e > s and bs[e - 1] == 0 and k + 1 < len(starts):
            e -= 1
        nal_type = bs[s] & 0x1F
        out.append((nal_type, _unepb(bs[s + 1 : e])))
    return out


# ---------------------------------------------------------------------------
# VLC decode tables (inverted from the encoder's spec tables)
# ---------------------------------------------------------------------------


def _invert(table):
    """{(a,b): (val,len)} -> {(len, val): (a, b)}"""
    return {(l, v): key for key, (v, l) in table.items()}


_ICT = {k: _invert(t) for k, t in (("0", H._CT0), ("2", H._CT2), ("4", H._CT4), ("c", H._CTC))}
_ITZ = {tc: {(l, v): tz for tz, (v, l) in row.items()} for tc, row in H._TZ.items()}
_ITZC = {tc: {(l, v): tz for tz, (v, l) in row.items()} for tc, row in H._TZC.items()}
_IRB = {zl: {(l, v): r for r, (v, l) in row.items()} for zl, row in H._RB.items()}


def _read_vlc(r: BitReader, inv: Dict[Tuple[int, int], object], max_len: int = 16):
    v = 0
    for ln in range(1, max_len + 1):
        v = (v << 1) | r.u(1)
        hit = inv.get((ln, v))
        if hit is not None:
            return hit
    raise UnsupportedStream("vlc decode failed")


def decode_cavlc_block(r: BitReader, nC: int, max_coeffs: int) -> np.ndarray:
    """Read one CAVLC block -> zigzag-ordered coefficient array."""
    coeffs = np.zeros(max_coeffs, np.int64)
    if nC == -1:
        t1, total = _read_vlc(r, _ICT["c"])
    elif nC < 2:
        t1, total = _read_vlc(r, _ICT["0"])
    elif nC < 4:
        t1, total = _read_vlc(r, _ICT["2"])
    elif nC < 8:
        t1, total = _read_vlc(r, _ICT["4"])
    else:
        v = r.u(6)
        if v == 3:
            t1, total = 0, 0
        else:
            t1, total = v & 3, (v >> 2) + 1
    if total == 0:
        return coeffs
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (total > 10 and t1 < 3) else 0
    first = True
    for i in range(total - t1):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 16:
                raise UnsupportedStream("bad level prefix")
        if suffix_len == 0:
            if prefix < 14:
                code = prefix
            elif prefix == 14:
                code = 14 + r.u(4)
            else:
                code = 30 + r.u(12)
        else:
            if prefix < 15:
                code = (prefix << suffix_len) | r.u(suffix_len)
            else:
                code = (15 << suffix_len) + r.u(12)
        if first and t1 < 3:
            code += 2
        first = False
        level = (code + 2) // 2 if code % 2 == 0 else -((code + 1) // 2)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if total < max_coeffs:
        if nC == -1:
            zeros = _read_vlc(r, _ITZC[total])
        else:
            zeros = _read_vlc(r, _ITZ[total])
    else:
        zeros = 0
    # runs (levels[] is rank order: rank0 = highest zigzag pos)
    runs = []
    zeros_left = zeros
    for i in range(total - 1):
        if zeros_left > 0:
            runs.append(_read_vlc(r, _IRB[min(zeros_left, 7)]))
            zeros_left -= runs[-1]
        else:
            runs.append(0)
    runs.append(zeros_left)  # implied zeros before the lowest coeff
    pos = total - 1 + zeros
    for i, level in enumerate(levels):
        coeffs[pos] = level
        if i < total - 1:
            pos -= 1 + runs[i]
    return coeffs


# ---------------------------------------------------------------------------
# dequant + inverse transforms (spec 8.5)
# ---------------------------------------------------------------------------

_V = [
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]


def _vmat(qp: int) -> np.ndarray:
    vr = _V[qp % 6]
    return np.array([[vr[H._POSCLASS[r][c]] for c in range(4)] for r in range(4)],
                    np.int64)


def _itransform4(d: np.ndarray) -> np.ndarray:
    """Inverse core transform (rows then cols), WITHOUT the final >> 6."""
    def pass1(x):
        e0 = x[0] + x[2]
        e1 = x[0] - x[2]
        e2 = (x[1] >> 1) - x[3]
        e3 = x[1] + (x[3] >> 1)
        return np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])

    # spec 8.5.12.2: each ROW first (horizontal), then each column — the
    # >>1 terms make the order observable in the LSB
    h = pass1(d.T).T
    v = pass1(h)
    return v


def _ihadamard4(f: np.ndarray) -> np.ndarray:
    return H._H4 @ f.astype(np.int64) @ H._H4


def _dezigzag(zz: np.ndarray) -> np.ndarray:
    out = np.zeros(16, np.int64)
    out[H._ZZ_IDX] = zz
    return out.reshape(4, 4)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class IntraDecoder:
    """Decode the own encoder's Annex-B streams -> (Y, Cb, Cr) planes."""

    def decode(self, bs: bytes):
        sps = pps = None
        y = cb = cr = None
        state = None
        for nal_type, rbsp in split_nals(bs):
            if nal_type == 7:
                sps = self._parse_sps(rbsp)
            elif nal_type == 8:
                pps = self._parse_pps(rbsp)
            elif nal_type == 5:
                if sps is None or pps is None:
                    raise UnsupportedStream("slice before parameter sets")
                if state is None:
                    mbw, mbh = sps["mb_w"], sps["mb_h"]
                    state = (
                        np.zeros((mbh * 16, mbw * 16), np.int64),
                        np.zeros((mbh * 8, mbw * 8), np.int64),
                        np.zeros((mbh * 8, mbw * 8), np.int64),
                    )
                y, cb, cr = self._decode_slice(rbsp, sps, pps, state)
        if y is None:
            raise UnsupportedStream("no IDR slice found")
        w, h = sps["width"], sps["height"]
        return y[:h, :w], cb[: (h + 1) // 2, : (w + 1) // 2], cr[: (h + 1) // 2, : (w + 1) // 2]

    def _parse_sps(self, rbsp: bytes):
        r = BitReader(rbsp)
        profile = r.u(8)
        r.u(8)  # constraints
        r.u(8)  # level
        if r.ue() != 0:
            raise UnsupportedStream("sps_id != 0")
        if profile not in (66, 77):
            raise UnsupportedStream(f"profile {profile}")
        log2_mfn = r.ue() + 4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()
        elif poc_type == 1:
            raise UnsupportedStream("poc type 1")
        r.ue()  # max refs
        r.u(1)
        mb_w = r.ue() + 1
        mb_h = r.ue() + 1
        if r.u(1) != 1:
            raise UnsupportedStream("interlaced")
        r.u(1)
        crop = r.u(1)
        cl = cr_ = ct = cb_ = 0
        if crop:
            cl, cr_, ct, cb_ = r.ue(), r.ue(), r.ue(), r.ue()
        return {
            "mb_w": mb_w, "mb_h": mb_h, "log2_mfn": log2_mfn,
            "width": mb_w * 16 - 2 * (cl + cr_),
            "height": mb_h * 16 - 2 * (ct + cb_),
        }

    def _parse_pps(self, rbsp: bytes):
        r = BitReader(rbsp)
        if r.ue() != 0 or r.ue() != 0:
            raise UnsupportedStream("pps/sps id")
        if r.u(1) != 0:
            raise UnsupportedStream("CABAC")
        r.u(1)
        if r.ue() != 0:
            raise UnsupportedStream("slice groups")
        r.ue(); r.ue(); r.u(1); r.u(2)
        init_qp = 26 + r.se()
        r.se()
        chroma_off = r.se()
        dbf_ctrl = r.u(1)
        r.u(1); r.u(1)
        return {"init_qp": init_qp, "chroma_off": chroma_off, "dbf_ctrl": dbf_ctrl}

    def _decode_slice(self, rbsp: bytes, sps, pps, state):
        r = BitReader(rbsp)
        first_mb = r.ue()
        st = r.ue()
        if st % 5 != 2:
            raise UnsupportedStream("not an I slice")
        r.ue()  # pps id
        r.u(sps["log2_mfn"])  # frame_num
        r.ue()  # idr_pic_id
        r.u(1); r.u(1)  # dec_ref_pic_marking
        qp = pps["init_qp"] + r.se()
        if pps["dbf_ctrl"]:
            # deblocking is not implemented: only idc==1 (disabled) keeps
            # the decode loop valid; idc 0/2 also carry two se() offsets
            # that would desync the bitstream if left unread
            dbf_idc = r.ue()
            if dbf_idc != 1:
                raise UnsupportedStream(
                    f"deblocking filter requested (idc={dbf_idc}), "
                    "not implemented")
        mbw, mbh = sps["mb_w"], sps["mb_h"]
        y, cbp_, crp = state
        if first_mb % mbw:
            raise UnsupportedStream("slices must start at an MB row")
        my0 = first_mb // mbw  # slice's first MB row: resets availability
        nnz_l = np.zeros((mbh * 4, mbw * 4), np.int64)
        nnz_c = [np.zeros((mbh * 2, mbw * 2), np.int64) for _ in range(2)]
        # last meaningful bit = the rbsp stop bit (last set bit of the
        # last nonzero byte); more_rbsp_data() is true before it
        last_nz = len(rbsp) - 1
        while last_nz >= 0 and rbsp[last_nz] == 0:
            last_nz -= 1
        stop_pos = last_nz * 8 + (7 - ((rbsp[last_nz] & -rbsp[last_nz]).bit_length() - 1))
        qpc = H.chroma_qp(max(0, min(51, qp + pps["chroma_off"])))
        vy = _vmat(qp)
        vc = _vmat(qpc)

        def nc_of(nn, gx, gy, gy_min):
            na = nn[gy, gx - 1] if gx > 0 else None
            nb = nn[gy - 1, gx] if gy > gy_min else None
            if na is not None and nb is not None:
                return (int(na) + int(nb) + 1) >> 1
            if na is not None:
                return int(na)
            if nb is not None:
                return int(nb)
            return 0

        mb_addr = first_mb
        while r.pos < stop_pos:
            my, mx = mb_addr // mbw, mb_addr % mbw
            mb_addr += 1
            if True:
                mb_type = r.ue()
                if mb_type == 25:  # I_PCM
                    r.byte_align()
                    for i in range(16):
                        for j in range(16):
                            y[my * 16 + i, mx * 16 + j] = r.u(8)
                    for plane in (cbp_, crp):
                        for i in range(8):
                            for j in range(8):
                                plane[my * 8 + i, mx * 8 + j] = r.u(8)
                    nnz_l[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
                    for nn in nnz_c:
                        nn[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
                    continue
                if not 1 <= mb_type <= 24:
                    raise UnsupportedStream(f"mb_type {mb_type}")
                t = mb_type - 1
                pred_mode = t % 4
                cbp_chroma = (t // 4) % 3
                cbp_luma = 15 if t >= 12 else 0
                if pred_mode != 2:
                    raise UnsupportedStream("only DC I16 prediction emitted")
                if r.ue() != 0:
                    raise UnsupportedStream("chroma pred != DC")
                r.se()  # mb_qp_delta (always 0 from our encoder)

                # luma DC coefficients
                nc = nc_of(nnz_l, mx * 4, my * 4, my0 * 4)
                dc_zz = decode_cavlc_block(r, nc, 16)
                ac = np.zeros((4, 4, 16), np.int64)
                if cbp_luma:
                    for bx, by in H._BLK_ORDER:
                        gx, gy = mx * 4 + bx, my * 4 + by
                        nc = nc_of(nnz_l, gx, gy, my0 * 4)
                        zz = decode_cavlc_block(r, nc, 15)
                        ac[by, bx, 1:] = zz
                        nnz_l[gy, gx] = int(np.count_nonzero(zz))
                cdc = [np.zeros(4, np.int64), np.zeros(4, np.int64)]
                cac = [np.zeros((2, 2, 16), np.int64) for _ in range(2)]
                if cbp_chroma:
                    for ci in range(2):
                        cdc[ci] = decode_cavlc_block(r, -1, 4)
                if cbp_chroma == 2:
                    for ci in range(2):
                        for bx, by in ((0, 0), (1, 0), (0, 1), (1, 1)):
                            gx, gy = mx * 2 + bx, my * 2 + by
                            nc = nc_of(nnz_c[ci], gx, gy, my0 * 2)
                            zz = decode_cavlc_block(r, nc, 15)
                            cac[ci][by, bx, 1:] = zz
                            nnz_c[ci][gy, gx] = int(np.count_nonzero(zz))

                # ---- reconstruct luma ----
                left = y[my * 16 : my * 16 + 16, mx * 16 - 1] if mx > 0 else None
                top = y[my * 16 - 1, mx * 16 : mx * 16 + 16] if my > my0 else None
                if left is not None and top is not None:
                    pred = (int(left.sum()) + int(top.sum()) + 16) >> 5
                elif left is not None:
                    pred = (int(left.sum()) + 8) >> 4
                elif top is not None:
                    pred = (int(top.sum()) + 8) >> 4
                else:
                    pred = 128
                # DC: inverse hadamard then scale (spec 8.5.10)
                f = _ihadamard4(_dezigzag(dc_zz)[0:4, 0:4] if False else _dezigzag(dc_zz))
                v00 = int(vy[0, 0])
                if qp >= 12:
                    dcs = (f * v00) << (qp // 6 - 2)
                else:
                    dcs = (f * v00 + (1 << (1 - qp // 6))) >> (2 - qp // 6)
                for by in range(4):
                    for bx in range(4):
                        d = _dezigzag(ac[by, bx]) * vy << (qp // 6)
                        d[0, 0] = dcs[by, bx]
                        res = (_itransform4(d) + 32) >> 6
                        blk = np.clip(pred + res, 0, 255)
                        y[my * 16 + by * 4 : my * 16 + by * 4 + 4,
                          mx * 16 + bx * 4 : mx * 16 + bx * 4 + 4] = blk

                # ---- reconstruct chroma ----
                for ci, plane in enumerate((cbp_, crp)):
                    preds = np.zeros((2, 2), np.int64)
                    for by in range(2):
                        for bx in range(2):
                            x0, y0 = mx * 8 + bx * 4, my * 8 + by * 4
                            lcol = plane[y0 : y0 + 4, mx * 8 - 1] if mx > 0 else None
                            trow = plane[my * 8 - 1, x0 : x0 + 4] if my > my0 else None
                            use_l, use_t = lcol is not None, trow is not None
                            if bx == 1 and by == 0 and trow is not None:
                                use_l = False
                            if bx == 0 and by == 1 and lcol is not None:
                                use_t = False
                            if use_l and use_t:
                                preds[by, bx] = (int(lcol.sum()) + int(trow.sum()) + 4) >> 3
                            elif use_l:
                                preds[by, bx] = (int(lcol.sum()) + 2) >> 2
                            elif use_t:
                                preds[by, bx] = (int(trow.sum()) + 2) >> 2
                            else:
                                preds[by, bx] = 128
                    fdc = H._H2 @ np.array([[cdc[ci][0], cdc[ci][1]],
                                            [cdc[ci][2], cdc[ci][3]]], np.int64) @ H._H2
                    v00c = int(vc[0, 0])
                    dcsc = ((fdc * v00c) << (qpc // 6)) >> 1
                    for by in range(2):
                        for bx in range(2):
                            d = _dezigzag(cac[ci][by, bx]) * vc << (qpc // 6)
                            d[0, 0] = dcsc[by, bx]
                            res = (_itransform4(d) + 32) >> 6
                            blk = np.clip(preds[by, bx] + res, 0, 255)
                            plane[my * 8 + by * 4 : my * 8 + by * 4 + 4,
                                  mx * 8 + bx * 4 : mx * 8 + bx * 4 + 4] = blk
        return y.astype(np.uint8), cbp_.astype(np.uint8), crp.astype(np.uint8)
