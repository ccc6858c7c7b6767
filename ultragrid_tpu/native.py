"""Loader for the C native helpers (built on demand with the system compiler).

The native pieces mirror where the reference uses C/C++ for host-side hot
paths (entropy stream assembly, later: RTP packetizer, UDP I/O).  Build
products are cached next to the sources in ``native/build/``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache
from typing import Optional

from ultragrid_tpu.utils.log import Logger

log = Logger("native")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")


def _build(name: str, sources: list[str], extra_flags: Optional[list[str]] = None) -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    # Cache keyed on a content hash of the sources + flags (mtimes are not
    # preserved by git, so an mtime check could serve a stale binary after a
    # fresh clone).  Build products are gitignored, never committed.
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    h.update(" ".join(extra_flags or []).encode())
    so_path = os.path.join(_BUILD_DIR, f"{name}-{h.hexdigest()[:12]}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["cc", "-O3", "-fPIC", "-shared", "-o", so_path, *srcs, *(extra_flags or [])]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log.warning(f"native build of {name} failed ({e}); falling back to python")
        return None
    return so_path


@lru_cache(maxsize=None)
def jpeg_assemble_lib() -> Optional[ctypes.CDLL]:
    so = _build("jpeg_assemble", ["jpeg_assemble.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.jpeg_assemble.restype = ctypes.c_int64
    lib.jpeg_assemble.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.jpeg_assemble_3c.restype = ctypes.c_int64
    lib.jpeg_assemble_3c.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.jpeg_assemble_3c_strided.restype = ctypes.c_int64
    lib.jpeg_assemble_3c_strided.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    return lib


@lru_cache(maxsize=None)
def jpeg_scan_decode_lib() -> Optional[ctypes.CDLL]:
    so = _build("jpeg_scan_decode", ["jpeg_scan_decode.c"], ["-lpthread"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.jpeg_scan_decode.restype = ctypes.c_int64
    lib.jpeg_scan_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.jpeg_scan_decode_mt.restype = ctypes.c_int64
    lib.jpeg_scan_decode_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.jpeg_scan_decode_packed_mt.restype = ctypes.c_int64
    lib.jpeg_scan_decode_packed_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p,          # lo, dc
        ctypes.c_void_p, ctypes.c_void_p,          # exc_idx, exc_delta
        ctypes.c_int64, ctypes.c_void_p,           # exc_cap, &exc_count
        ctypes.c_int,
    ]
    return lib


@lru_cache(maxsize=None)
def ldgm_xor_lib() -> Optional[ctypes.CDLL]:
    so = _build("ldgm_xor", ["ldgm_xor.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.ldgm_encode_xor.restype = None
    lib.ldgm_encode_xor.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
    ]
    return lib


@lru_cache(maxsize=None)
def h264_assemble_lib() -> Optional[ctypes.CDLL]:
    so = _build("h264_assemble", ["h264_assemble.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.h264_assemble.restype = ctypes.c_long
    lib.h264_assemble.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long,
    ]
    return lib


@lru_cache(maxsize=None)
def lavc_shim_lib() -> Optional[ctypes.CDLL]:
    """libavcodec/libswscale shim (role analogue of the reference's
    src/video_compress/libavcodec.cpp + src/video_decompress/libavcodec.c
    wrappers around the same system library)."""
    so = _build("lavc_shim", ["lavc_shim.c"], ["-lavcodec", "-lavformat", "-lavutil", "-lswscale"])
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        log.warning(f"lavc shim load failed: {e}")
        return None
    lib.lavc_version.restype = ctypes.c_int
    lib.lavc_have.restype = ctypes.c_int
    lib.lavc_have.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.lavc_list.restype = ctypes.c_long
    lib.lavc_list.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
    lib.lavc_enc_open.restype = ctypes.c_void_p
    lib.lavc_enc_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_long, ctypes.c_char_p,
    ]
    lib.lavc_enc_frame.restype = ctypes.c_long
    lib.lavc_enc_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
    ]
    lib.lavc_enc_close.argtypes = [ctypes.c_void_p]
    lib.lavc_dec_open.restype = ctypes.c_void_p
    lib.lavc_dec_open.argtypes = [ctypes.c_char_p]
    lib.lavc_dec_open2.restype = ctypes.c_void_p
    lib.lavc_dec_open2.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
    lib.lavc_enc_extradata.restype = ctypes.c_long
    lib.lavc_enc_extradata.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    lib.lavc_dec_packet.restype = ctypes.c_long
    lib.lavc_dec_packet.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
    ]
    lib.lavc_dec_close.argtypes = [ctypes.c_void_p]
    lib.lavc_aenc_open.restype = ctypes.c_void_p
    lib.lavc_aenc_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_char_p]
    lib.lavc_aenc_frame_size.restype = ctypes.c_int
    lib.lavc_aenc_frame_size.argtypes = [ctypes.c_void_p]
    lib.lavc_aenc_encode.restype = ctypes.c_long
    lib.lavc_aenc_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lavc_adec_open.restype = ctypes.c_void_p
    lib.lavc_adec_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.lavc_adec_decode.restype = ctypes.c_long
    lib.lavc_adec_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lavc_acod_close.argtypes = [ctypes.c_void_p]
    lib.lavf_open.restype = ctypes.c_void_p
    lib.lavf_open.argtypes = [ctypes.c_char_p]
    lib.lavf_info.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.lavf_read_frame.restype = ctypes.c_long
    lib.lavf_read_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lavf_seek_start.argtypes = [ctypes.c_void_p]
    lib.lavf_close.argtypes = [ctypes.c_void_p]
    lib.lavf_mux_open.restype = ctypes.c_void_p
    lib.lavf_mux_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lavf_mux_write.restype = ctypes.c_int
    lib.lavf_mux_write.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
    ]
    lib.lavf_mux_close.argtypes = [ctypes.c_void_p]
    return lib


@lru_cache(maxsize=None)
def j2k_t1_lib() -> Optional[ctypes.CDLL]:
    """EBCOT Tier-1 block coder (MQ + coding passes) for the own JPEG 2000
    encoder (role analogue of the reference's cmpto_j2k SDK entropy stage,
    src/video_compress/cmpto_j2k.cpp)."""
    so = _build("j2k_t1", ["j2k_t1.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.j2k_t1_encode_cblk.restype = ctypes.c_long
    lib.j2k_t1_encode_cblk.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.j2k_t1_decode_cblk.restype = ctypes.c_long
    lib.j2k_t1_decode_cblk.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    return lib


@lru_cache(maxsize=None)
def udp_rx_lib() -> Optional[ctypes.CDLL]:
    so = _build("udp_rx", ["udp_rx.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.udp_recv_batch.restype = ctypes.c_long
    lib.udp_recv_batch.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long,
    ]
    return lib


@lru_cache(maxsize=None)
def video_rx_fast_lib() -> Optional[ctypes.CDLL]:
    """Fast-path video depacketizer (recvmmsg + RTP/payload-header parse +
    frame scatter in C; role analogue of the reference's receive hot path:
    udp_reader net_udp.c:163-187 + pbuf_insert pbuf.c:438 + LINE_DECODER
    copies video_decoders.cpp:1707-1796)."""
    so = _build("video_rx_fast", ["video_rx_fast.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.vrx_create.restype = ctypes.c_void_p
    lib.vrx_create.argtypes = [ctypes.c_long, ctypes.c_long]
    lib.vrx_destroy.argtypes = [ctypes.c_void_p]
    lib.vrx_set_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.vrx_drain.restype = ctypes.c_long
    lib.vrx_drain.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_long, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.vrx_poll.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.vrx_nslots.restype = ctypes.c_int
    lib.vrx_nslots.argtypes = [ctypes.c_void_p]
    lib.vrx_slot_hdr.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.vrx_slot_intervals.restype = ctypes.c_long
    lib.vrx_slot_intervals.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.vrx_ssrc_stats.restype = ctypes.c_long
    lib.vrx_ssrc_stats.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.vrx_totals.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    return lib


@lru_cache(maxsize=None)
def udp_tx_lib() -> Optional[ctypes.CDLL]:
    so = _build("udp_tx", ["udp_tx.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.udp_send_packets.restype = ctypes.c_int64
    lib.udp_send_packets.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_uint32,
    ]
    return lib


@lru_cache(maxsize=None)
def h264_fast_lib() -> Optional[ctypes.CDLL]:
    """Real-time own-H.264 decoder (native/h264_entropy.c): C entropy
    stage (CAVLC + CABAC) + reconstruction, sample-exact with the Python
    decoder in ops/h264_dec.py (ref role: the decode half of
    src/video_decompress/libavcodec.c)."""
    so = _build("h264_entropy", ["h264_entropy.c"])
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.h264fast_create.restype = ctypes.c_void_p
    lib.h264fast_create.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.h264fast_flush_frame.restype = ctypes.c_int
    lib.h264fast_flush_frame.argtypes = [ctypes.c_void_p]
    lib.h264fast_decode_au.restype = ctypes.c_int
    lib.h264fast_decode_au.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.h264fast_dims.restype = ctypes.c_int
    lib.h264fast_dims.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.h264fast_get_planes.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.h264fast_error.restype = ctypes.c_char_p
    lib.h264fast_error.argtypes = [ctypes.c_void_p]
    lib.h264fast_destroy.argtypes = [ctypes.c_void_p]
    return lib
