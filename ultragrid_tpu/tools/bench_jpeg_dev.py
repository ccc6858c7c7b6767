"""Dev-only microbench for JPEG encode experiments (real chip).

Usage: python -m ultragrid_tpu.tools.bench_jpeg_dev [iters]
Prints per-variant ms/frame for 4K UYVY q80.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugtpu_jaxcache")

import jax
import numpy as np


def make_frame(w=3840, h=2160):
    rng = np.random.default_rng(0)
    base = (
        np.linspace(0, 255, w * 2, dtype=np.float32)[None, :]
        + rng.normal(0, 8, (h, 2 * w))
    ).clip(16, 235).astype(np.uint8)
    return jax.device_put(base)


def timeit(fn, frame, iters=10, batches=7):
    """Min-of-batches ms/frame (interference only ever adds time)."""
    import jax.numpy as jnp

    def force(parts):
        leaf = parts[1]
        return float(jnp.asarray(leaf).reshape(-1)[::1009].astype(jnp.float32).sum())

    force(fn(frame))
    times = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            parts = fn(frame)
        force(parts)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return min(times)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from ultragrid_tpu.ops.jpeg import JpegEncoder
    from ultragrid_tpu.types import Codec

    frame = make_frame()
    enc = JpegEncoder(3840, 2160, in_codec=Codec.UYVY, quality=80)
    ms = timeit(enc.encode_device, frame, iters)
    print(f"4K UYVY->JPEG encode_device: {ms:.2f} ms/frame  ({1e3/ms:.1f} fps)")


if __name__ == "__main__":
    main()
