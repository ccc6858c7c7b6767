"""Basis-vector probe for the High-profile 8x8 CAVLC residual path.

Hand-crafts minimal one-MB High-profile CAVLC streams with a SINGLE
nonzero coefficient (level L at zigzag index i of carrier k of 8x8
block 0), decodes them with libavcodec, and identifies exactly where
the coefficient lands in the raster block and what dequant scale/
rounding libavcodec applies.  This turns the 8.5.13.1 / zigzag-
interleave questions from spec-reading into measurements.

Companion to the binary-extraction harness noted in PERF.md: run when
extending the own-decoder envelope (new transform / scan variants).

Usage: python tests/probe_h264_8x8.py
"""

import numpy as np

from ultragrid_tpu.ops.h264 import BitWriter, nal, cavlc_block
from ultragrid_tpu.ops import h264_8x8 as h8
from ultragrid_tpu.ops.h264_dec import _CBP_INTRA
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.modules.lavc import LavcDecompress

# carrier cell positions inside 8x8 block 0 (4x4 block decode order)
_CELLS = [(0, 0), (1, 0), (0, 1), (1, 1)]  # (bx, by)


def make_sps_high(width: int, height: int) -> bytes:
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    w = BitWriter()
    w.u(100, 8)    # profile_idc: High
    w.u(0, 8)      # constraint flags
    w.u(51, 8)     # level
    w.ue(0)        # sps_id
    w.ue(1)        # chroma_format_idc: 4:2:0
    w.ue(0)        # bit_depth_luma_minus8
    w.ue(0)        # bit_depth_chroma_minus8
    w.u(0, 1)      # qpprime_y_zero_transform_bypass
    w.u(0, 1)      # seq_scaling_matrix_present
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(2)        # pic_order_cnt_type
    w.ue(0)        # max_num_ref_frames
    w.u(0, 1)      # gaps_in_frame_num
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)      # frame_mbs_only
    w.u(1, 1)      # direct_8x8_inference
    w.u(0, 1)      # frame_cropping
    w.u(0, 1)      # vui
    w.rbsp_trailing()
    return nal(3, 7, w.rbsp())


def make_pps_t8(init_qp: int) -> bytes:
    w = BitWriter()
    w.ue(0)        # pps_id
    w.ue(0)        # sps_id
    w.u(0, 1)      # entropy_coding_mode: CAVLC
    w.u(0, 1)      # pic_order_present
    w.ue(0)        # num_slice_groups_minus1
    w.ue(0); w.ue(0)
    w.u(0, 1)      # weighted_pred
    w.u(0, 2)      # weighted_bipred
    w.se(init_qp - 26)
    w.se(0)        # qs
    w.se(0)        # chroma_qp_index_offset
    w.u(1, 1)      # deblocking_filter_control_present
    w.u(0, 1)      # constrained_intra_pred
    w.u(0, 1)      # redundant_pic_cnt_present
    w.u(1, 1)      # transform_8x8_mode_flag
    w.u(0, 1)      # pic_scaling_matrix_present
    w.se(0)        # second_chroma_qp_index_offset
    w.rbsp_trailing()
    return nal(3, 8, w.rbsp())


def probe_stream(k: int, i: int, level: int, qp: int) -> bytes:
    """One 16x16 IDR frame: I_NxN, t8=1, DC modes, cbp luma=1 chroma=0,
    single coefficient `level` at zigzag index `i` of carrier `k`."""
    w = BitWriter()
    # slice header (IDR, I slice, deblocking off)
    w.ue(0)        # first_mb
    w.ue(7)        # slice_type I (all)
    w.ue(0)        # pps_id
    w.u(0, 4)      # frame_num
    w.ue(0)        # idr_pic_id
    w.u(0, 1); w.u(0, 1)   # dec_ref_pic_marking
    w.se(0)        # slice_qp_delta
    w.ue(1)        # disable_deblocking_filter_idc = 1
    # macroblock
    w.ue(0)        # mb_type I_NxN
    w.u(1, 1)      # transform_size_8x8_flag = 1
    for _ in range(4):
        w.u(1, 1)  # prev_intra8x8_pred_mode_flag (use predicted = DC)
    w.ue(0)        # intra_chroma_pred_mode: DC
    w.ue(_CBP_INTRA.index(1))  # cbp: luma bit0 only
    w.se(0)        # mb_qp_delta
    # carriers of 8x8 block 0, standard 4x4 nC derivation on their cells
    nnz = {}
    for kk in range(4):
        bx, by = _CELLS[kk]
        na = nnz.get((bx - 1, by))
        nb = nnz.get((bx, by - 1))
        if na is not None and nb is not None:
            nc = (na + nb + 1) >> 1
        elif na is not None:
            nc = na
        elif nb is not None:
            nc = nb
        else:
            nc = 0
        coeffs = [0] * 16
        if kk == k:
            coeffs[i] = level
        nnz[(bx, by)] = cavlc_block(w, coeffs, nc)
    w.rbsp_trailing()
    sl = nal(3, 5, w.rbsp())
    return make_sps_high(16, 16) + make_pps_t8(qp) + sl


def decode_y(bs: bytes) -> np.ndarray:
    ld = LavcDecompress()
    fr = VideoFrame(VideoDesc(16, 16, Codec.H264, 30.0),
                    [np.frombuffer(bs, np.uint8)])
    out = ld.decompress(fr, Codec.UYVY)
    return np.asarray(out.data)[:, 1::2].astype(np.int64)


def dequant_variant(c: np.ndarray, qp: int, scale: int) -> np.ndarray:
    v = h8.vmat8(qp) * scale
    if qp >= 36:
        return (c * v) << (qp // 6 - 6)
    return (c * v + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def _it8_cols_first(d: np.ndarray) -> np.ndarray:
    p1 = h8.itransform8.__wrapped__ if hasattr(h8.itransform8, "__wrapped__") else None
    # reuse the butterfly by transposing around the row-first implementation:
    # rows-first(d.T).T == cols-first(d)
    return h8.itransform8(d.T).T


def identify(res: np.ndarray, level: int, qp: int):
    """Which (raster position, scale, idct variant) reproduces res exactly?"""
    hits = []
    for r in range(64):
        d = np.zeros((8, 8), np.int64)
        d[r // 8, r % 8] = level
        for scale in (1, 16):
            dd = dequant_variant(d, qp, scale)
            for vname, it in (("rc", h8.itransform8), ("cr", _it8_cols_first)):
                cand = (it(dd) + 32) >> 6
                if np.array_equal(np.clip(128 + cand, 0, 255), res):
                    hits.append((r, scale, vname))
    return hits


def main():
    qp = 38
    level = 1
    ZZinv = np.zeros(64, np.int64)
    ZZinv[h8.ZZ8] = np.arange(64)
    print(" k  i -> raster  (row,col)  scanpos_in_ZZ8   [scale]")
    mapping = {}
    for k in range(4):
        for i in (0, 1, 2, 3, 4, 7, 8, 15):
            bs = probe_stream(k, i, level, qp)
            y = decode_y(bs)
            res = y[:8, :8]
            hits = identify(res, level, qp)
            tag = ""
            if hits:
                rs = {h[0] for h in hits}
                if len(rs) == 1:
                    r = rs.pop()
                    mapping[(k, i)] = (r, int(ZZinv[r]))
                    tag = (f"({r//8},{r%8})  s={int(ZZinv[r]):2d}  "
                           f"variants={[(h[1], h[2]) for h in hits]}")
                else:
                    tag = f"ambiguous {hits}"
            else:
                tag = f"NO MATCH  res[0,:4]={res[0,:4] - 128}"
            print(f"{k:2d} {i:2d} -> {tag}")
    # try to infer a rule
    ok_4ik = all(s == 4 * i + k for (k, i), (_, s) in mapping.items())
    ok_16ki = all(s == 16 * k + i for (k, i), (_, s) in mapping.items())
    print("rule s=4*i+k:", ok_4ik, "  rule s=16*k+i:", ok_16ki)


if __name__ == "__main__":
    main()
