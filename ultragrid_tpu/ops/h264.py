"""From-scratch H.264/AVC baseline intra encoder (no FFmpeg dependency).

The reference's workhorse codec class wraps libavcodec/libx264
(ref: src/video_compress/libavcodec.cpp:200-248); this module is this
framework's OWN encoder for the same wire format: Annex-B H.264 with
SPS/PPS + IDR slices, decodable by any AVC decoder (conformance-tested
against libavcodec in tests/test_h264.py).

Two macroblock modes:

* ``I_PCM`` — raw samples, no prediction/transform (bit-exact, no
  compression; the spec's escape hatch).  Deblocking is disabled in the
  slice header so decoded output equals input exactly.
* ``I_16x16`` DC prediction + 4x4 integer transform + CAVLC — the real
  compressed mode (build-up in stages; see Intra16Encoder).

Design note (TPU-first): prediction uses SOURCE neighbors, not
reconstructed ones, which removes the sequential macroblock dependency so
transform/quant/CAVLC all parallelize over macroblocks (the same
slot-pack strategy as the JPEG encoder, ops/jpeg.py).  The bitstream stays
fully conformant — only the encoder-side prediction differs, introducing
bounded drift (≤ the neighbors' quantization error), a standard fast-
encoder trade.

Colour handling: baseline profile is 4:2:0; UYVY (4:2:2) input gets its
chroma rows pair-averaged.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# bit writing
# ---------------------------------------------------------------------------


class BitWriter:
    """MSB-first bit accumulator with RBSP trailing + emulation prevention."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def ue(self, value: int) -> None:
        """Exp-Golomb unsigned."""
        v = value + 1
        nbits = v.bit_length()
        self.u(0, nbits - 1)
        self.u(v, nbits)

    def se(self, value: int) -> None:
        """Exp-Golomb signed: 1,-1,2,-2,... -> 1,2,3,4,..."""
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def byte_align_zero(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        self.byte_align_zero()

    def rbsp(self) -> bytes:
        assert self.nbits == 0, "call rbsp_trailing() first"
        return bytes(self.bytes)


def _ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention 0x03 bytes."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_ref_idc: int, nal_unit_type: int, rbsp: bytes, long_start: bool = True) -> bytes:
    start = b"\x00\x00\x00\x01" if long_start else b"\x00\x00\x01"
    hdr = bytes([(nal_ref_idc << 5) | nal_unit_type])
    return start + hdr + _ebsp(rbsp)


# ---------------------------------------------------------------------------
# parameter sets
# ---------------------------------------------------------------------------


def make_sps(width: int, height: int, level_idc: int = 51) -> bytes:
    """Baseline-profile SPS for a progressive 4:2:0 frame."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    crop_r = (mb_w * 16 - width) // 2   # in chroma samples (SubWidthC=2)
    crop_b = (mb_h * 16 - height) // 2
    w = BitWriter()
    w.u(66, 8)     # profile_idc: baseline
    w.u(0xC0, 8)   # constraint_set0/1 + reserved
    w.u(level_idc, 8)
    w.ue(0)        # sps_id
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(2)        # pic_order_cnt_type = 2 (display order = decode order)
    w.ue(0)        # max_num_ref_frames
    w.u(0, 1)      # gaps_in_frame_num_value_allowed
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)      # frame_mbs_only_flag
    w.u(1, 1)      # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)      # vui_parameters_present
    w.rbsp_trailing()
    return nal(3, 7, w.rbsp())


def make_pps(init_qp: int = 26) -> bytes:
    w = BitWriter()
    w.ue(0)        # pps_id
    w.ue(0)        # sps_id
    w.u(0, 1)      # entropy_coding_mode: CAVLC
    w.u(0, 1)      # bottom_field_pic_order_in_frame_present
    w.ue(0)        # num_slice_groups_minus1
    w.ue(0)        # num_ref_idx_l0_default_active_minus1
    w.ue(0)        # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)      # weighted_pred_flag
    w.u(0, 2)      # weighted_bipred_idc
    w.se(init_qp - 26)  # pic_init_qp_minus26
    w.se(0)        # pic_init_qs_minus26
    w.se(0)        # chroma_qp_index_offset
    w.u(1, 1)      # deblocking_filter_control_present
    w.u(0, 1)      # constrained_intra_pred
    w.u(0, 1)      # redundant_pic_cnt_present
    w.rbsp_trailing()
    return nal(3, 8, w.rbsp())


def _slice_header(w: BitWriter, first_mb: int, idr_pic_id: int, qp_delta_base: int,
                  disable_deblock: bool, slice_qp_delta: int = 0) -> None:
    w.ue(first_mb)     # first_mb_in_slice
    w.ue(7)            # slice_type: I (all slices in pic)
    w.ue(0)            # pps_id
    w.u(0, 4)          # frame_num (log2_max_frame_num = 4)
    w.ue(idr_pic_id)   # idr_pic_id
    # dec_ref_pic_marking (IDR, nal_ref_idc != 0):
    w.u(0, 1)          # no_output_of_prior_pics_flag
    w.u(0, 1)          # long_term_reference_flag
    w.se(slice_qp_delta)  # slice_qp_delta
    if disable_deblock:
        w.ue(1)        # disable_deblocking_filter_idc = 1
    else:
        w.ue(0)
        w.se(0)
        w.se(0)


# ---------------------------------------------------------------------------
# planes
# ---------------------------------------------------------------------------


def uyvy_to_i420(frame: np.ndarray, width: int, height: int):
    """UYVY [H, 2W] -> (Y [H,W], Cb [H/2,W/2], Cr [H/2,W/2]) with
    pair-averaged chroma rows (baseline is 4:2:0)."""
    a = np.asarray(frame, np.uint8)[:height, : 2 * width]
    y = a[:, 1::2]
    cb = a[:, 0::4].astype(np.uint16)
    cr = a[:, 2::4].astype(np.uint16)
    cb = ((cb[0::2] + cb[1::2] + 1) >> 1).astype(np.uint8)
    cr = ((cr[0::2] + cr[1::2] + 1) >> 1).astype(np.uint8)
    return y, cb, cr


def _pad_to_mb(y, cb, cr):
    """Edge-pad planes to multiples of 16 (luma) / 8 (chroma)."""
    h, w = y.shape
    ph = (h + 15) & ~15
    pw = (w + 15) & ~15
    y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    ch, cw = cb.shape
    pch, pcw = ph // 2, pw // 2
    cb = np.pad(cb, ((0, pch - ch), (0, pcw - cw)), mode="edge")
    cr = np.pad(cr, ((0, pch - ch), (0, pcw - cw)), mode="edge")
    return y, cb, cr


# ---------------------------------------------------------------------------
# I_PCM encoder (stage A: conformant, lossless, no compression)
# ---------------------------------------------------------------------------


class PcmEncoder:
    """Every macroblock I_PCM: decodable by any AVC decoder, output is
    bit-exact input (deblocking disabled).  ~1.0x size; exists as the
    always-correct fallback and the conformance baseline for the real
    Intra16Encoder."""

    def __init__(self, width: int, height: int):
        self.width, self.height = width, height
        self.mb_w = (width + 15) // 16
        self.mb_h = (height + 15) // 16
        self.headers = make_sps(width, height) + make_pps()

    def encode_planes(self, y, cb, cr) -> bytes:
        y, cb, cr = _pad_to_mb(y, cb, cr)
        w = BitWriter()
        _slice_header(w, 0, 0, 0, disable_deblock=True)
        for my in range(self.mb_h):
            for mx in range(self.mb_w):
                w.ue(25)  # mb_type I_PCM
                w.byte_align_zero()  # pcm_alignment_zero_bit
                yb = y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                for row in yb:
                    for v in row:
                        w.u(int(v), 8)
                for plane in (cb, cr):
                    pb = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    for row in pb:
                        for v in row:
                            w.u(int(v), 8)
        w.rbsp_trailing()
        return self.headers + nal(3, 5, w.rbsp())

    def encode_uyvy(self, frame: np.ndarray) -> bytes:
        y, cb, cr = uyvy_to_i420(frame, self.width, self.height)
        return self.encode_planes(y, cb, cr)
