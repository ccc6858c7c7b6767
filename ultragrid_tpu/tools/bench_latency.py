"""End-to-end frame latency benchmark: capture -> display, live session.

Measures the p50/p95/p99 of (capture instant -> display put) per frame
across a REAL localhost session: testcard capture thread -> compress ->
FEC -> RTP/UDP -> recv thread -> pbuf (32 ms playout budget, ref:
src/rtp/pbuf.c:191) -> FEC decode -> decompress -> display.  The capture
instant rides the RTP timestamp (90 kHz, stamped at grab — ref: the role
of tv_to_rtp in src/transmit.c), so on a same-clock localhost pair the
receiver can difference it against time.monotonic() directly
(CLOCK_MONOTONIC shares its epoch across processes on Linux).

Sender and receiver run in SEPARATE processes like a real deployment —
in one process they would share the GIL and measure contention, not the
pipeline.

This is BASELINE.md's second metric ("p50 per-frame pipeline latency")
and the analogue of the reference's ~100 ms camera->display claim
(/root/reference/README.md:41-43).

Usage: python -m ultragrid_tpu.tools.bench_latency [WxH] [fps] [frames]
           [compress] [fec] [--json]
e.g.   python -m ultragrid_tpu.tools.bench_latency 1920x1080 60 300 jpeg \
           "ldgm:percents" --json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugtpu_jaxcache")

import numpy as np

TS_MOD = float(0x100000000) / 90000.0  # RTP TS wrap period in seconds


def _recv_child(frames: int, playout: float, port: int,
                warm: str = "") -> None:
    """Child process: receive `frames` frames on `port`, print per-frame
    (capture->display) latencies + display times as one JSON line."""
    if warm:
        w, h = (int(x) for x in warm.split(":")[0].split("x"))
        warm_graphs(w, h, warm.split(":", 1)[1], decode_side=True)
    from ultragrid_tpu.pipeline.receiver import VideoReceiver

    latencies: list = []
    display_times: list = []
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=frames,
                         timeout=120.0, playout_delay=playout)
    orig_handle = recv._handle_frame

    def timed_handle(frame):
        ts = getattr(frame, "timestamp", -1.0)
        ok = orig_handle(frame)
        if ok and ts is not None and ts >= 0:
            now = time.monotonic()
            latencies.append((now - ts) % TS_MOD)
            display_times.append(now)
        return ok

    recv._handle_frame = timed_handle
    print("READY", flush=True)
    recv.run()
    print(json.dumps({"latencies": latencies,
                      "display_times": display_times}), flush=True)


def run_session(w: int, h: int, fps: int, frames: int,
                compress: str = "jpeg", fec: str = "none",
                playout_delay: float = 0.032, port: int = 25910):
    from ultragrid_tpu.pipeline.sender import VideoSender

    warm = f"{w}x{h}:{compress}" \
        if compress.split(":")[0].lower() in ("jpeg", "gpujpeg") else ""
    child = subprocess.Popen(
        [sys.executable, "-m", "ultragrid_tpu.tools.bench_latency",
         "--recv-child", str(frames), f"{playout_delay:.6f}", str(port), warm],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        line = child.stdout.readline()
        if line.strip() != "READY":
            raise RuntimeError(f"receiver child failed: {line!r}")
        sender = VideoSender(
            f"testcard:s={w}x{h}:f={fps}:c=UYVY",
            "127.0.0.1",
            compress_spec=compress,
            fec_spec=fec,
            tx_port=port,
            mtu=8192,
            frame_limit=frames + 60,
        )
        sender.run()
        out = child.stdout.readline()
        child.wait(timeout=30)
    finally:
        if child.poll() is None:
            child.kill()
    res = json.loads(out)
    return res["latencies"], res["display_times"]


def warm_graphs(w: int, h: int, compress: str,
                decode_side: bool = False) -> None:
    """Prime the jit graphs so the live session measures steady state."""
    from ultragrid_tpu.ops.jpeg import JpegEncoder, decode_jpeg_to_frame
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    q = 80
    for tok in compress.split(":")[1:]:
        if tok.isdigit():
            q = int(tok)
    enc = JpegEncoder(w, h, in_codec=Codec.UYVY, quality=q)
    data = enc.encode(generate_pattern(w, h, Codec.UYVY, "bars"))
    if decode_side:
        jf = VideoFrame(VideoDesc(w, h, Codec.JPEG, 60.0),
                        [np.asarray(data)])
        decode_jpeg_to_frame(jf, Codec.UYVY)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--recv-child":
        _recv_child(int(sys.argv[2]), float(sys.argv[3]), int(sys.argv[4]),
                    sys.argv[5] if len(sys.argv) > 5 else "")
        return
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    size = args[0] if len(args) > 0 else "1920x1080"
    fps = int(args[1]) if len(args) > 1 else 60
    frames = int(args[2]) if len(args) > 2 else 300
    compress = args[3] if len(args) > 3 else "jpeg"
    fec = args[4] if len(args) > 4 else "none"
    w, h = (int(x) for x in size.split("x"))

    if compress.split(":")[0].lower() in ("jpeg", "gpujpeg"):
        if not as_json:
            print(f"warming {compress} graphs at {w}x{h}...", flush=True)
        warm_graphs(w, h, compress)

    latencies, display_times = run_session(w, h, fps, frames, compress, fec)
    if len(latencies) < 10:
        print(json.dumps({"error": f"only {len(latencies)} frames displayed"}))
        return

    # drop warmup frames (first graph dispatches / cache fills)
    lat = np.sort(np.asarray(latencies[5:], np.float64)) * 1000.0
    span = display_times[-1] - display_times[5]
    out_fps = (len(display_times) - 6) / span if span > 0 else 0.0
    result = {
        "config": f"{w}x{h}@{fps} {compress} fec={fec} localhost 2-process",
        "frames": len(lat),
        "sustained_fps": round(out_fps, 2),
        "latency_p50_ms": round(float(np.percentile(lat, 50)), 2),
        "latency_p95_ms": round(float(np.percentile(lat, 95)), 2),
        "latency_p99_ms": round(float(np.percentile(lat, 99)), 2),
        "latency_min_ms": round(float(lat[0]), 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
