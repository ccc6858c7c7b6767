"""Build & wrap the reference C conversion code for parity testing.

Compiles selected reference translation units (pixfmt_conv.c, video_codec.c,
color_space.c, to_planar.c, from_planar.c) from the read-only checkout at
/root/reference into a throwaway shared library under /tmp, and exposes them
via ctypes.  Tests using this module skip automatically when the reference
tree or toolchain is unavailable — bit-exactness is additionally locked in by
golden-value tests that do not need the reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache

import numpy as np

REF = "/root/reference"
BUILD_DIR = "/tmp/ugtpu_refconv"

_STUBS = r"""
#include <stdarg.h>
#include <stddef.h>
int log_level = 5;
void log_msg(int level, const char *format, ...) { (void)level; (void)format; }
void log_msg_once(int level, unsigned int id, const char *format, ...) { (void)level;(void)id;(void)format; }
const char *get_commandline_param(const char *x){(void)x;return 0;}
void register_param(const char *a, const char *b){(void)a;(void)b;}
int get_log_output(void){return 0;}
int get_cpu_core_count(void){return 1;}
/* run tasks serially (worker-pool stub) */
typedef void *(*task_fn)(void *);
void task_run_parallel(task_fn task, int worker_count, void *data, size_t data_size, void *res) {
    (void)res;
    for (int i = 0; i < worker_count; ++i) {
        task((char *)data + (size_t)i * data_size);
    }
}
"""

_SOURCES = [
    "src/pixfmt_conv.c",
    "src/video_codec.c",
    "src/color_space.c",
    "src/to_planar.c",
    "src/from_planar.c",
]


def available() -> bool:
    return os.path.isdir(REF) and os.path.exists(os.path.join(REF, "src/pixfmt_conv.c"))


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    os.makedirs(BUILD_DIR, exist_ok=True)
    stub_path = os.path.join(BUILD_DIR, "stubs.c")
    with open(stub_path, "w") as f:
        f.write(_STUBS)
    so_path = os.path.join(BUILD_DIR, "refconv.so")
    srcs = [os.path.join(REF, s) for s in _SOURCES] + [stub_path]
    stamp = os.path.join(BUILD_DIR, "stamp")
    key = hashlib.sha256()
    for s in srcs:
        key.update(open(s, "rb").read())
    digest = key.hexdigest()
    if not (os.path.exists(so_path) and os.path.exists(stamp) and open(stamp).read() == digest):
        cmd = [
            "gcc", "-O2", "-fPIC", "-shared", "-D_GNU_SOURCE",
            f"-I{REF}/src", f"-I{REF}", "-o", so_path, *srcs,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(stamp, "w") as f:
            f.write(digest)
    return ctypes.CDLL(so_path)


_DEC = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
)


def has_decoder(in_codec: int, out_codec: int) -> bool:
    lib = _lib()
    lib.get_decoder_from_to.restype = ctypes.c_void_p
    return bool(lib.get_decoder_from_to(int(in_codec), int(out_codec)))


def convert_lines(
    in_codec: int, out_codec: int, src: np.ndarray, dst_len: int,
    rshift: int = 0, gshift: int = 8, bshift: int = 16,
) -> np.ndarray:
    """Run the reference line decoder row by row on [H, src_linesize] input."""
    lib = _lib()
    lib.get_decoder_from_to.restype = ctypes.c_void_p
    ptr = lib.get_decoder_from_to(int(in_codec), int(out_codec))
    assert ptr, f"reference has no decoder {in_codec}->{out_codec}"
    fn = _DEC(ptr)
    h = src.shape[0]
    out = np.zeros((h, dst_len), dtype=np.uint8)
    # MAX_PADDING slack for over-reads (ref: video_codec.h:61-64)
    src_padded = np.zeros((h, src.shape[1] + 64), dtype=np.uint8)
    src_padded[:, : src.shape[1]] = src
    dst_padded = np.zeros(dst_len + 64, dtype=np.uint8)
    for y in range(h):
        row = np.ascontiguousarray(src_padded[y])
        fn(
            dst_padded.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            row.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            dst_len, rshift, gshift, bshift,
        )
        out[y] = dst_padded[:dst_len]
    return out


def vc_get_linesize(width: int, codec: int) -> int:
    lib = _lib()
    lib.vc_get_linesize.restype = ctypes.c_int
    return lib.vc_get_linesize(ctypes.c_uint(width), int(codec))


def planar_fn(name: str):
    """Simple-signature planar conversions from video_codec.c."""
    lib = _lib()
    return getattr(lib, name)


class _ToPlanarData(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("out_data", ctypes.POINTER(ctypes.c_ubyte) * 4),
        ("out_linesize", ctypes.c_uint * 4),
        ("in_data", ctypes.POINTER(ctypes.c_ubyte)),
    ]


def to_planar(name: str, src: np.ndarray, width: int, height: int, out_sizes, out_linesizes):
    """Call a to_planar.c decode_buffer_func_t. Returns list of plane arrays."""
    lib = _lib()
    fn = getattr(lib, name)
    fn.argtypes = [_ToPlanarData]
    d = _ToPlanarData()
    d.width = width
    d.height = height
    src = np.ascontiguousarray(src.reshape(-1))
    d.in_data = src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    outs = []
    for i in range(4):
        if i < len(out_sizes):
            arr = np.zeros(out_sizes[i], dtype=np.uint8)
            outs.append(arr)
            d.out_data[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            d.out_linesize[i] = out_linesizes[i]
        else:
            d.out_data[i] = None
            d.out_linesize[i] = 0
    fn(d)
    return outs


def deinterlace_ex(codec: int, src: np.ndarray, width: int) -> np.ndarray:
    """Run the reference vc_deinterlace_ex (video_codec.c) on [H, linesize]."""
    lib = _lib()
    lib.vc_deinterlace_ex.restype = ctypes.c_bool
    h, ls = src.shape
    src = np.ascontiguousarray(src)
    dst = np.zeros_like(src)
    ok = lib.vc_deinterlace_ex(
        int(codec),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_size_t(ls),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_size_t(ls),
        ctypes.c_size_t(h),
    )
    assert ok
    return dst
