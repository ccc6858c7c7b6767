"""Build & wrap the reference LDGM coder for golden-buffer interop tests.

Compiles the reference's actual LDGM implementation (ldgm/src/
ldgm-session.cpp + ldgm-session-cpu.cpp + tanner.cpp and the matrix
generator ldgm/matrix-gen/) from the read-only checkout into a throwaway
shared library, and exposes encode/decode via an extern-"C" shim.  This is
the same technique as tests/refc.py for pixfmt conversions: our LDGM
containers are asserted byte-identical to buffers produced by the
reference's own compiled code for the same (k, m, c, seed) — retiring the
wire-compat risk of the re-derived matrix/container math in ops/fec.py.

Reference driver flow mirrored by the shim: src/rtp/ldgm.cpp:163-238
(set_params -> generate_ldgm_matrix into a cache file -> set_pcMatrix),
encode src/rtp/ldgm.cpp:430-470 (encode_frame), decode :246-255.

The reference's RS coder (src/rtp/rs.cpp) cannot be golden-anchored here:
it is a thin wrapper over zfec, and the zfec submodule (ext-deps/zfec) is
empty in this checkout — the actual coder bytes are not in the tree.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache

import numpy as np

REF = "/root/reference"
BUILD_DIR = "/tmp/ugtpu_refldgm"

_SHIM = r"""
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include "ldgm-session-cpu.h"
#include "../matrix-gen/matrix-generator.h"

extern "C" {

/* encode: returns malloc'd output buffer (caller frees via ref_ldgm_free),
 * sets *out_size and *packet_size */
char *ref_ldgm_encode(int k, int m, int c, int seed,
                      char *frame, int frame_size,
                      int *out_size, int *packet_size)
{
    char filename[512];
    snprintf(filename, sizeof filename,
             "%s/ldgm_matrix-%d-%d-%d-%d.bin", BUILD_DIR_STR, k, m, c, seed);
    FILE *f = fopen(filename, "rb");
    if (f) {
        fclose(f);
    } else if (generate_ldgm_matrix(filename, k, m, c, seed, 0) != 0) {
        return nullptr;
    }
    LDGM_session_cpu session;
    session.set_params(k, m, c);
    session.set_pcMatrix(filename);
    char *out = session.encode_frame(frame, frame_size, out_size);
    *packet_size = session.get_packet_size();
    return out;
}

/* decode: received buffer with holes + (offset, size) list of valid
 * ranges; returns the recovered frame pointer INTO the buffer (or NULL),
 * sets *frame_size */
char *ref_ldgm_decode(int k, int m, int c, int seed,
                      char *received, int buf_size,
                      const int *valid_off, const int *valid_sz, int n_valid,
                      int *frame_size)
{
    char filename[512];
    snprintf(filename, sizeof filename,
             "%s/ldgm_matrix-%d-%d-%d-%d.bin", BUILD_DIR_STR, k, m, c, seed);
    FILE *f = fopen(filename, "rb");
    if (f) {
        fclose(f);
    } else if (generate_ldgm_matrix(filename, k, m, c, seed, 0) != 0) {
        return nullptr;
    }
    LDGM_session_cpu session;
    session.set_params(k, m, c);
    session.set_pcMatrix(filename);
    std::map<int, int> valid;
    for (int i = 0; i < n_valid; ++i)
        valid[valid_off[i]] = valid_sz[i];
    return session.decode_frame(received, buf_size, frame_size, valid);
}

void ref_ldgm_free(char *buf) { free(buf); }

} // extern "C"
"""

_SOURCES = [
    "ldgm/src/ldgm-session.cpp",
    "ldgm/src/ldgm-session-cpu.cpp",
    "ldgm/src/tanner.cpp",
    "ldgm/matrix-gen/matrix-generator.cpp",
    "ldgm/matrix-gen/ldpc-matrix.cpp",
]


def available() -> bool:
    return os.path.isdir(REF) and os.path.exists(
        os.path.join(REF, "ldgm/src/ldgm-session-cpu.cpp"))


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    os.makedirs(BUILD_DIR, exist_ok=True)
    shim_path = os.path.join(BUILD_DIR, "shim.cpp")
    with open(shim_path, "w") as f:
        f.write(_SHIM)
    so_path = os.path.join(BUILD_DIR, "refldgm.so")
    srcs = [os.path.join(REF, s) for s in _SOURCES] + [shim_path]
    stamp = os.path.join(BUILD_DIR, "stamp")
    key = hashlib.sha256()
    for s in srcs:
        key.update(open(s, "rb").read())
    digest = key.hexdigest()
    if not (os.path.exists(so_path) and os.path.exists(stamp)
            and open(stamp).read() == digest):
        cmd = [
            "g++", "-O2", "-fPIC", "-shared", "-std=c++14", "-D_GNU_SOURCE",
            f'-DBUILD_DIR_STR="{BUILD_DIR}"',
            f"-I{REF}/ldgm/src", f"-I{REF}/ldgm/matrix-gen",
            "-o", so_path, *srcs,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(stamp, "w") as f:
            f.write(digest)
    lib = ctypes.CDLL(so_path)
    lib.ref_ldgm_encode.restype = ctypes.POINTER(ctypes.c_char)
    lib.ref_ldgm_encode.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ref_ldgm_decode.restype = ctypes.POINTER(ctypes.c_char)
    lib.ref_ldgm_decode.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.ref_ldgm_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
    return lib


def ldgm_encode(k: int, m: int, c: int, seed: int, frame: bytes):
    """Reference-compiled LDGM encode: returns (container bytes, symbol size)."""
    lib = _lib()
    out_size = ctypes.c_int(0)
    packet_size = ctypes.c_int(0)
    buf = lib.ref_ldgm_encode(k, m, c, seed, frame, len(frame),
                              ctypes.byref(out_size), ctypes.byref(packet_size))
    if not buf:
        raise RuntimeError("reference LDGM encode failed")
    out = ctypes.string_at(buf, out_size.value)
    lib.ref_ldgm_free(buf)
    return out, packet_size.value


def ldgm_decode(k: int, m: int, c: int, seed: int, received: bytes,
                valid: list[tuple[int, int]]):
    """Reference-compiled LDGM decode: returns recovered frame bytes or None.

    ``valid`` is a list of (offset, size) ranges present in ``received``
    (the pbuf/fec.h contract the receiver feeds to LDGM_session::decode_frame).
    """
    lib = _lib()
    frame_size = ctypes.c_int(0)
    offs = (ctypes.c_int * len(valid))(*[v[0] for v in valid])
    szs = (ctypes.c_int * len(valid))(*[v[1] for v in valid])
    rbuf = ctypes.create_string_buffer(received, len(received))
    ptr = lib.ref_ldgm_decode(k, m, c, seed, rbuf, len(received),
                              offs, szs, len(valid), ctypes.byref(frame_size))
    if not ptr or frame_size.value <= 0:
        return None
    return ctypes.string_at(ptr, frame_size.value)
