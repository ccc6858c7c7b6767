"""Concurrency stress: hammer runtime reconfiguration while streaming.

The reference relies on conventions (module locks, poison pills) rather
than a sanitizer build (SURVEY §5); this suite is the de-facto race gate —
rapid atomic swaps of the compress impl and packetizer under live traffic
must never deadlock, crash a worker thread, or stall the stream.
"""

import socket
import threading
import time

import numpy as np

from ultragrid_tpu.modules.messaging import MsgChangeCompress, MsgChangeFec, send_message
from ultragrid_tpu.pipeline.receiver import VideoReceiver
from ultragrid_tpu.pipeline.sender import VideoSender


def test_rapid_reconfig_under_live_traffic():
    port = 26100
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=10_000, timeout=30.0)
    rx_t = threading.Thread(target=recv.run, daemon=True)
    rx_t.start()

    sender = VideoSender(
        "testcard:s=96x64:f=60:c=UYVY:still=1", "127.0.0.1",
        compress_spec="none", tx_port=port, rx_port=0, frame_limit=100_000,
    )
    tx_t = threading.Thread(target=sender.run, daemon=True)
    tx_t.start()

    # generous under full-suite load: this 1-core host runs everything at once
    deadline = time.monotonic() + 20
    while recv.frames_displayed < 3 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert recv.frames_displayed >= 3

    # hammer: alternate compress + FEC swaps as fast as they are accepted
    specs = ["uyvy", "none", "dxt", "none"]
    fecs = ["ldgm:16:8:4", "none", "rs:8:12", "mult:2", "none"]
    for i in range(24):
        r1 = send_message(sender.root, "sender.compress",
                          MsgChangeCompress(specs[i % len(specs)]))
        r2 = send_message(sender.root, "sender", MsgChangeFec(fecs[i % len(fecs)]))
        assert r1.ok and r2.ok
    n0 = sender.frames_sent
    deadline = time.monotonic() + 10
    while sender.frames_sent <= n0 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert sender.frames_sent > n0, "sender stalled during reconfig storm"
    # compress worker thread survived every swap
    assert sender.compress._thread.is_alive()

    sender.should_exit.set()
    recv.should_exit = True
    tx_t.join(timeout=15)
    rx_t.join(timeout=10)
    assert not tx_t.is_alive() and not rx_t.is_alive()


def test_concurrent_control_clients():
    """Several control-socket clients issuing commands simultaneously."""
    sender = VideoSender(
        "testcard:s=96x64:f=30:c=UYVY:still=1", "127.0.0.1",
        compress_spec="none", tx_port=26110, rx_port=0, frame_limit=100_000,
        control_port=0,
    )
    tx_t = threading.Thread(target=sender.run, daemon=True)
    tx_t.start()
    errors = []

    def client(k):
        try:
            with socket.create_connection(("127.0.0.1", sender.control.port),
                                          timeout=5) as c:
                for i in range(10):
                    cmd = ["pause", "play", "compress uyvy", "compress none",
                           "fec mult:2", "fec none"][(k + i) % 6]
                    c.sendall(cmd.encode() + b"\r\n")
                    resp = c.recv(4096)
                    if not resp[:1].isdigit():
                        errors.append(resp)
        except OSError as e:
            errors.append(e)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=20)
    assert not errors, errors
    sender.paused.clear()
    n0 = sender.frames_sent
    time.sleep(0.5)
    assert sender.frames_sent > n0
    sender.should_exit.set()
    tx_t.join(timeout=15)
