"""North-star bench: 8K(7680x2160) 4:2:2 UYVY->JPEG + LDGM(256,26,5) as
ONE fused jit graph on one chip (BASELINE.md north star: < 8 ms/frame).

Usage: python -m ultragrid_tpu.tools.bench_northstar [WxH] [iters]

Prints three numbers from the SAME session window so they are comparable:

- per-fetch sync floor (block_until_ready is a no-op over the axon
  tunnel, so every timed sync is a dependent scalar fetch paying the RPC
  round trip; a PCIe host pays ~0.05 ms),
- amortized ms/frame (k async dispatches, one final fetch — the TPU runs
  programs in launch order, so the last output's fetch syncs them all;
  floor amortizes away),
- single-dispatch ms (each dispatch individually synced; floor-inclusive,
  with the interleaved floor row printed right next to it).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugtpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.asarray(leaves[0]).reshape(-1)[::4099]
                 .astype(jnp.float32).sum())


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "7680x2160"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    w, h = (int(x) for x in size.split("x"))

    from ultragrid_tpu.models.encode import EncodeConfig, EncodePipeline
    from ultragrid_tpu.types import Codec, VideoDesc

    desc = VideoDesc(w, h, Codec.UYVY, 60.0)
    pipe = EncodePipeline(desc, EncodeConfig(
        in_codec=Codec.UYVY, compress="jpeg", quality=80,
        subsampling="422", fec="ldgm:256:26:5"))

    rng = np.random.default_rng(0)
    base = (np.linspace(0, 255, w * 2, dtype=np.float32)[None, :]
            + rng.normal(0, 8, (h, 2 * w))).clip(16, 235).astype(np.uint8)
    frame = jax.device_put(base)

    tiny = jax.jit(lambda a: ((a + 1.0).sum(),))
    tx = jax.device_put(np.zeros((128, 128), np.float32))
    _force(tiny(tx))
    _force(pipe(frame))  # warm / compile

    pre_floors = []
    for _ in range(8):
        t0 = time.perf_counter()
        _force(tiny(tx))
        pre_floors.append((time.perf_counter() - t0) * 1e3)
    fmin = min(pre_floors)

    # amortized: k async dispatches, one fetch (its floor subtracted)
    amort = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe(frame)
        _force(out)
        amort.append(((time.perf_counter() - t0) * 1e3 - fmin) / iters)

    # single-dispatch with interleaved floor, same window
    singles, floors = [], []
    for _ in range(max(12, iters)):
        t0 = time.perf_counter()
        _force(tiny(tx))
        floors.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _force(pipe(frame))
        singles.append((time.perf_counter() - t0) * 1e3)
    singles.sort(); floors.sort(); amort.sort()

    def p50(v):
        return v[len(v) // 2]

    print(f"== {w}x{h} 4:2:2 UYVY->JPEG q80 + LDGM(256,26,5), ONE fused graph")
    print(f"sync floor (same window):   min {floors[0]:7.2f}  p50 {p50(floors):7.2f} ms")
    print(f"amortized /frame (k={iters}):  min {amort[0]:7.2f}  p50 {p50(amort):7.2f} ms")
    print(f"single dispatch:            min {singles[0]:7.2f}  p50 {p50(singles):7.2f} ms")
    print(f"single net of floor (min-min): {singles[0] - floors[0]:7.2f} ms")


if __name__ == "__main__":
    main()
