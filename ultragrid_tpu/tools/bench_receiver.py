"""Receiver-side benchmark: packets-in -> frame-displayed latency + fps.

Runs a localhost sender (testcard -> JPEG) and a receiver (dummy display),
and reports the p50/p95 of (last-packet arrival -> display put) per frame
plus sustained receive fps.  The reference spends three threads on this path
(src/rtp/video_decoders.cpp:46-93); here it is recv-thread + decode loop.

Usage: python -m ultragrid_tpu.tools.bench_receiver [WxH] [frames]
"""

from __future__ import annotations

import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugtpu_jaxcache")

import numpy as np


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    w, h = (int(x) for x in size.split("x"))

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    # prime the encode + decode jit graphs for this geometry so the live
    # session measures steady state, not XLA compilation
    from ultragrid_tpu.ops.jpeg import JpegEncoder, decode_jpeg_to_frame
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    print("warming encode/decode graphs...", flush=True)
    enc = JpegEncoder(w, h, in_codec=Codec.UYVY, quality=80)
    data = enc.encode(generate_pattern(w, h, Codec.UYVY, "bars"))
    jf = VideoFrame(VideoDesc(w, h, Codec.JPEG, 60.0), [np.asarray(data)])
    decode_jpeg_to_frame(jf, Codec.UYVY)

    port = 25900
    latencies = []
    display_times = []

    recv = VideoReceiver(
        "dummy", rx_port=port, frame_limit=frames + 5, timeout=180.0,
    )
    orig_handle = recv._handle_frame

    def timed_handle(node):
        t_last_pkt = max(p.arrival for p in node.packets)
        ok = orig_handle(node)
        if ok:
            now = time.monotonic()
            latencies.append(now - t_last_pkt)
            display_times.append(now)
        return ok

    recv._handle_frame = timed_handle
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    time.sleep(0.3)

    sender = VideoSender(
        f"testcard:s={w}x{h}:f=60:c=UYVY:still=1",
        "127.0.0.1",
        compress_spec="jpeg",
        tx_port=port,
        frame_limit=frames + 10,
    )
    sender.run()
    t.join(timeout=120)

    if len(display_times) >= 3:
        # drop the first (compile) frame for fps
        span = display_times[-1] - display_times[1]
        fps = (len(display_times) - 2) / span if span > 0 else 0.0
        lat = sorted(latencies[1:])
        p50 = lat[len(lat) // 2] * 1e3
        p95 = lat[int(len(lat) * 0.95)] * 1e3
        print(
            f"receiver: {len(display_times)} frames, {fps:.1f} fps sustained, "
            f"latency last-packet->display p50={p50:.1f} ms p95={p95:.1f} ms "
            f"(includes {recv.pbuf.playout_delay*1e3:.0f} ms playout delay)"
        )
    else:
        print(f"receiver got only {len(display_times)} frames")


if __name__ == "__main__":
    main()
