"""Host-side JPEG scan-decode throughput (the receive path's C stage).

Measures native/jpeg_scan_decode.c alone — entropy decode of a 4K q80
stream into coefficient arrays — per thread count.  The device
dequant+IDCT+UYVY matmul is measured separately (PERF.md); this isolates
the serial-tail candidate on the receiver host.

Usage: python tools/bench_scan_decode.py [WxH] [quality] [iters]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# the axon TPU plugin force-sets jax_platforms at registration; put the
# encode (only used to build the test stream) on the host CPU regardless
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "3840x2160"
    quality = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    w, h = (int(x) for x in size.split("x"))

    from ultragrid_tpu.ops.jpeg import JpegEncoder, _parse_headers
    from ultragrid_tpu.native import jpeg_scan_decode_lib
    from ultragrid_tpu.types import Codec

    rng = np.random.default_rng(0)
    base = (
        np.linspace(0, 255, w * 2, dtype=np.float32)[None, :]
        + rng.normal(0, 8, (h, 2 * w))
    ).clip(16, 235).astype(np.uint8)
    enc = JpegEncoder(w, h, in_codec=Codec.UYVY, quality=quality)
    data = bytes(np.asarray(enc.encode(base)))
    print(f"{w}x{h} q{quality}: {len(data)/1e6:.2f} MB stream")

    hdr = _parse_headers(data)
    lib = jpeg_scan_decode_lib()
    scan = hdr["scan"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    nmcu = ((w + 8 * hmax - 1) // (8 * hmax)) * ((h + 8 * vmax - 1) // (8 * vmax))
    tables = np.zeros((4, 272), np.uint8)
    for (tc, th), (bits, vals) in hdr["htabs"].items():
        slot = th * 2 + tc
        tables[slot, :16] = np.frombuffer(bits, np.uint8)
        tables[slot, 16 : 16 + len(vals)] = np.frombuffer(vals, np.uint8)
    comp_ntab = np.array([c["td"] for c in scan], np.int32)
    comp_nblocks = np.array([c["h"] * c["v"] for c in scan], np.int32)
    outs = [np.zeros((nmcu * int(nb), 64), np.int16) for nb in comp_nblocks]
    import ctypes

    ptr_arr = (ctypes.POINTER(ctypes.c_int16) * len(outs))(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for o in outs]
    )
    body = np.frombuffer(data[hdr["scan_start"]:], np.uint8)

    for nthreads in (1, 2, 4, 8):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            done = lib.jpeg_scan_decode_mt(
                body.ctypes.data, body.size, tables.ctypes.data,
                len(scan), comp_ntab.ctypes.data, comp_nblocks.ctypes.data,
                nmcu, hdr["ri"], ctypes.cast(ptr_arr, ctypes.c_void_p),
                nthreads,
            )
            times.append(time.perf_counter() - t0)
            assert done == nmcu, (done, nmcu)
        print(f"threads={nthreads}: min {min(times)*1e3:.1f} ms  "
              f"median {sorted(times)[len(times)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
