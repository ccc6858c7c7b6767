"""Dev microbench for the device H.264 encoders (real chip).

Usage::

    python -m ultragrid_tpu.tools.bench_h264_enc_dev [WxH] [qp]

Prints ms/frame for the P-frame graph across slot-window sizes (the
CAVLC+pack stage scales with ``wwords``; see PERF.md round-5) plus the
``_stop_after`` stage ablation, and the intra graph at its old/new
window defaults.  Min-of-batches timing: tunnel interference only ever
adds time.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugtpu_jaxcache")

import jax
import jax.numpy as jnp
import numpy as np


def frames(w, h):
    # device graphs take MB-aligned planes (the host wrapper pads real
    # frames the same way before upload)
    w = (w + 15) // 16 * 16
    h = (h + 15) // 16 * 16
    rng = np.random.default_rng(0)
    base = (np.linspace(0, 255, w, dtype=np.float32)[None, :]
            + rng.normal(0, 8, (h, w))).clip(16, 235).astype(np.uint8)
    cur_y = np.roll(base, 4, axis=1)
    ref_y = base
    ch = (h // 2, w // 2)
    cb = np.full(ch, 120, np.uint8)
    cr = np.full(ch, 130, np.uint8)
    return cur_y, cb, cr, ref_y, cb.copy(), cr.copy()


def force(out):
    leaf = out[0]
    return float(jnp.asarray(leaf).reshape(-1)[::4099]
                 .astype(jnp.float32).sum())


def sync_floor(iters=12):
    """Today's per-fetch tunnel floor (block_until_ready is a no-op over
    axon, so every timing sync is a dependent scalar fetch that pays the
    RPC round trip; measure it so it can be subtracted)."""
    f = jax.jit(lambda a: ((a + 1.0).sum(),))
    x = jax.device_put(np.zeros((128, 128), np.float32))
    force(f(x))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        force(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def timeit(fn, args, iters=24, batches=4, floor_ms=0.0):
    """Amortized: enqueue ``iters`` async dispatches (the TPU runs
    programs in launch order), fetch only the last output, subtract the
    per-fetch floor.  min-of-batches: tunnel interference only adds."""
    force(fn(*args))
    best = 1e9
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        force(out)
        best = min(best, (time.perf_counter() - t0 - floor_ms / 1e3) / iters)
    return best * 1000.0


def main() -> None:
    from ultragrid_tpu.ops.h264_tpu import (make_device_encode,
                                            make_device_encode_p)

    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    qp = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    w, h = (int(x) for x in size.split("x"))
    args = tuple(jax.device_put(a) for a in frames(w, h))
    floor = sync_floor()
    print(f"(per-fetch sync floor today: {floor:.1f} ms — subtracted)")
    print(f"== P graph {w}x{h} qp{qp} search=8 (ms/frame, min-of-batches)")
    for ww in (32, 64, 96):
        fn = make_device_encode_p(w, h, qp, 8, wwords=ww)
        ms = timeit(fn, args, floor_ms=floor)
        print(f"  wwords={ww:<3}                 {ms:8.2f}")
    for stage in ("coarse", "extract", "halfpel", "chroma", "residual"):
        fn = make_device_encode_p(w, h, qp, 8, wwords=32, _stop_after=stage)
        ms = timeit(fn, args, floor_ms=floor)
        print(f"  _stop_after={stage:<12} {ms:8.2f}")
    print(f"== intra graph {w}x{h} qp{qp}")
    yi = args[0]
    cbi, cri = args[1], args[2]
    for ww in (40, 80):
        fn = make_device_encode(w, h, qp, wwords=ww)
        ms = timeit(fn, (yi, cbi, cri), floor_ms=floor)
        print(f"  wwords={ww:<3}                 {ms:8.2f}")


if __name__ == "__main__":
    main()
