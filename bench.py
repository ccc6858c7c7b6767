"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline (build order per BASELINE.md): 4K UYVY->RGB pixel-format
conversion frames/sec on one chip.  Will switch to 4K UYVY->JPEG encode fps
once the JPEG pipeline lands.  vs_baseline is measured against 240 fps — the
reference's capability claim (8K60 ~ 4x 4K60 ~ 240 fps of 4K) per README.md:36-38.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_4K_FPS = 240.0


def bench_convert_4k(n_iters: int = 100) -> float:
    from ultragrid_tpu.ops.pixfmt import convert_frame
    from ultragrid_tpu.types import Codec, vc_get_linesize

    width, height = 3840, 2160
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (height, vc_get_linesize(width, Codec.UYVY)), dtype=np.int32).astype(np.uint8)
    frame_dev = jax.device_put(frame)

    out = convert_frame(frame_dev, width, Codec.UYVY, Codec.RGB)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = convert_frame(frame_dev, width, Codec.UYVY, Codec.RGB)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    return 1.0 / dt


def main() -> None:
    fps = bench_convert_4k()
    print(
        json.dumps(
            {
                "metric": "4K UYVY->RGB convert fps/chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_4K_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
