"""Benchmark suite: the five BASELINE.md configurations.

  1. testcard 1080p UYVY->RGB conversion
  2. v210 / R10k 10-bit unpack + color conversion at 4K
  3. DXT1 / DXT5-YCoCg of RGB 1080p
  4. JPEG encode 4:2:2 4K (device half)
  5. 8K UYVY -> scale -> JPEG -> LDGM full pipeline (device + host C halves)

Prints one JSON line per config.  (bench.py prints only the headline metric.)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugtpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def _force(r):
    """Force completion: block_until_ready is unreliable on the axon tunnel,
    so fetch one scalar of the final result."""
    arr = r[0] if isinstance(r, (tuple, list)) else r
    return float(jnp.ravel(arr)[0].astype(jnp.float32))


def _time(f, n=20, warm=2):
    for _ in range(warm):
        r = f()
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _force(r)
    return (time.perf_counter() - t0) / n


def report(name, seconds, unit="ms"):
    print(json.dumps({"config": name, "ms_per_frame": round(seconds * 1000, 3),
                      "fps": round(1.0 / seconds, 1)}))


def main() -> int:
    from ultragrid_tpu.ops import pixfmt
    from ultragrid_tpu.ops.dxt import dxt1_encode_rgb, dxt5_ycocg_encode_rgb
    from ultragrid_tpu.ops.jpeg import JpegEncoder
    from ultragrid_tpu.ops.fec import LdgmSession
    from ultragrid_tpu.ops.postprocess import scale_nearest
    from ultragrid_tpu.types import Codec, vc_get_linesize

    rng = np.random.default_rng(0)

    # 1. 1080p UYVY -> RGB
    f = jax.device_put(rng.integers(0, 255, (1080, 3840), np.int32).astype(np.uint8))
    dt = _time(lambda: pixfmt.convert_frame(f, 1920, Codec.UYVY, Codec.RGB))
    report("1080p UYVY->RGB convert", dt)

    # 2. 4K v210 -> RG48 (10-bit unpack + BT.709) and R10k -> Y416
    v210 = jax.device_put(rng.integers(0, 255, (2160, vc_get_linesize(3840, Codec.v210)), np.int32).astype(np.uint8))
    dt = _time(lambda: pixfmt.convert_frame(v210, 3840, Codec.v210, Codec.RG48))
    report("4K v210->RG48 convert", dt)
    r10k = jax.device_put(rng.integers(0, 255, (2160, vc_get_linesize(3840, Codec.R10k)), np.int32).astype(np.uint8))
    dt = _time(lambda: pixfmt.convert_frame(r10k, 3840, Codec.R10k, Codec.Y416))
    report("4K R10k->Y416 convert", dt)

    # 3. DXT 1080p RGB
    rgb = jax.device_put(rng.integers(0, 255, (1080, 5760), np.int32).astype(np.uint8))
    dt = _time(lambda: dxt1_encode_rgb(rgb, 1920))
    report("1080p DXT1 encode", dt)
    dt = _time(lambda: dxt5_ycocg_encode_rgb(rgb, 1920))
    report("1080p DXT5-YCoCg encode", dt)

    # 4. 4K JPEG device encode
    base4k = (np.linspace(0, 255, 3840 * 2, dtype=np.float32)[None, :]
              + rng.normal(0, 8, (2160, 7680))).clip(16, 235).astype(np.uint8)
    enc4k = JpegEncoder(3840, 2160, in_codec=Codec.UYVY, quality=80)
    f4k = jax.device_put(base4k)
    dt = _time(lambda: enc4k.encode_device(f4k)[1], n=20)
    report("4K UYVY->JPEG device encode", dt)

    # 4b. FULL encode path as the sender ships it: single-frame device
    #     dispatch + host C byte-stuffing/assembly, PIPELINED — the device
    #     encode of frame i+1 is queued (JAX async dispatch) before frame
    #     i's parts are fetched and assembled on the host, so the two
    #     halves overlap exactly like the live sender's compress worker
    #     (ref: GPUJPEG end-to-end role, gpujpeg.cpp:106-168)
    parts = enc4k.encode_device(f4k)
    n = 12
    t0 = time.perf_counter()
    for _ in range(n):
        nxt = enc4k.encode_device(f4k)  # queued async
        enc4k.assemble(*(np.asarray(p) for p in parts[:-1]))  # host overlap
        parts = nxt
    enc4k.assemble(*(np.asarray(p) for p in parts[:-1]))
    dt = (time.perf_counter() - t0) / (n + 1)
    report("4K UYVY->JPEG full path (device+assembly, pipelined)", dt)

    # 4c. 4:2:0 in the fused Pallas kernel (the wider world's default
    #     subsampling; ref: gpujpeg.cpp:295-302)
    enc420 = JpegEncoder(3840, 2160, in_codec=Codec.UYVY, quality=80,
                         subsampling="420")
    dt = _time(lambda: enc420.encode_device(f4k)[1], n=20)
    report("4K UYVY->JPEG 4:2:0 device encode", dt)

    # 5. full 8K pipeline: UYVY 8K -> JPEG device encode -> host C assemble
    #    -> host C LDGM encode (the north-star configuration)
    w8, h8 = 7680, 4320
    base8k = (np.linspace(0, 255, w8 * 2, dtype=np.float32)[None, :]
              + rng.normal(0, 8, (h8, w8 * 2))).clip(16, 235).astype(np.uint8)
    enc8k = JpegEncoder(w8, h8, in_codec=Codec.UYVY, quality=80)
    f8k = jax.device_put(base8k)
    ldgm = LdgmSession(1500, 250, 5)

    def full():
        parts = enc8k.encode_device(f8k)
        body = enc8k.assemble(*(np.asarray(p) for p in parts[:-1]))
        buf, desc = ldgm.encode(body)
        return buf

    # warm (compile + caches)
    full()
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = full()
    dt = (time.perf_counter() - t0) / n
    report("8K UYVY->JPEG->LDGM full pipeline (e2e incl host)", dt)

    # device-only half of the same
    dt = _time(lambda: enc8k.encode_device(f8k)[1], n=10)
    report("8K UYVY->JPEG device encode", dt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
