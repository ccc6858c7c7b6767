"""Own-H.264 decode throughput: C stage (native/h264_entropy.c) vs the
Python reference decoder, per entropy mode and content class.

Usage: python -m ultragrid_tpu.tools.bench_h264_decode [WxH] [frames]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def make_frames(w, h, n, kind):
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    rng = np.random.default_rng(1)
    frames = []
    if kind == "synthetic":
        base = np.asarray(generate_pattern(w, h, Codec.UYVY, "bars"))
        for i in range(n):
            f = np.roll(base, i * 8, axis=1).copy()
            f[h // 10:h // 3, w // 5:w] = np.roll(
                f[h // 10:h // 3, w // 5:w], i * 3, axis=0)
            frames.append(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
    else:  # textured: smoothed noise with a global pan (worst-case rates)
        tex = rng.integers(0, 256, (h + 64, 2 * (w + 64)), np.uint8)
        tex = ((tex[:-1].astype(np.int32) + tex[1:]) // 2).astype(np.uint8)
        for i in range(n):
            f = tex[i:i + h, 2 * i:2 * i + 2 * w].copy()
            frames.append(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
    return frames


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    w, h = (int(x) for x in size.split("x"))

    from ultragrid_tpu.modules.lavc import LavcCompress
    from ultragrid_tpu.ops.h264_fast import FastStreamDecoder

    configs = [
        ("cavlc", "codec=H.264:encoder=libx264:profile=baseline:qp=28:g=30:"
                  "aq-mode=0:refs=3:x264opts=partitions=p8x8"),
        ("cabac", "codec=H.264:encoder=libx264:profile=main:qp=28:g=30:"
                  "aq-mode=0:x264opts=bframes=0:weightp=0"),
        ("cabac-b3", "codec=H.264:encoder=libx264:profile=high:qp=28:g=30:"
                     "aq-mode=0:bf=3"),
    ]
    for kind in ("synthetic", "textured"):
        frames = make_frames(w, h, n, kind)
        for name, spec in configs:
            enc = LavcCompress(spec)
            aus = []
            for f in frames:
                c = enc.compress(f)
                if c is not None:
                    aus.append(bytes(np.asarray(c.data)))
            enc.done()
            mb = sum(len(a) for a in aus) / 1e6
            fd = FastStreamDecoder()
            fd.decode_au(aus[0])
            t0 = time.perf_counter()
            for au in aus:
                fd.decode_au(au)
            dt = time.perf_counter() - t0
            print(f"{kind:9s} {name}: {len(aus)} frames, {mb:.2f} MB stream"
                  f" -> {len(aus) / dt:.1f} fps ({dt / len(aus) * 1e3:.2f}"
                  f" ms/frame, 1 core)")


if __name__ == "__main__":
    main()
