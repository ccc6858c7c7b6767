"""Playout buffer: per-SSRC ordered frame buffers keyed by RTP timestamp.

ref: src/rtp/pbuf.c — frames become playable after the playout delay
(default 32 ms, pbuf.c:191) and are deleted after twice that.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

from ultragrid_tpu.net.rtp import RtpPacket
from ultragrid_tpu.utils.log import Logger

log = Logger("pbuf")

DEFAULT_PLAYOUT_DELAY = 0.032  # ref: pbuf.c:191


class PbufNode:
    """One frame's worth of packets (same RTP TS)."""

    __slots__ = ("ts", "packets", "arrival", "playout_time", "deletion_time", "decoded", "completed", "mbit_seen")

    def __init__(self, ts: int, arrival: float, playout_delay: float):
        self.ts = ts
        self.packets: List[RtpPacket] = []
        self.arrival = arrival
        self.playout_time = arrival + playout_delay
        self.deletion_time = arrival + 2 * playout_delay
        self.decoded = False
        self.completed = False
        self.mbit_seen = False


class PlayoutBuffer:
    """Per-participant frame buffers keyed by (SSRC, RTP TS)
    (ref: per-SSRC pbufs walked by the receiver, ultragrid_rtp.c:483)."""

    def __init__(self, playout_delay: float = DEFAULT_PLAYOUT_DELAY):
        self.playout_delay = playout_delay
        self.frames: Dict[tuple, PbufNode] = {}  # keyed by (ssrc, ts)
        self.order: List[tuple] = []
        self.stats_received = 0

    def insert(self, pkt: RtpPacket) -> None:
        """ref: pbuf_insert, pbuf.c:438."""
        self.stats_received += 1
        key = (pkt.ssrc, pkt.ts)
        node = self.frames.get(key)
        if node is None:
            node = PbufNode(pkt.ts, pkt.arrival, self.playout_delay)
            self.frames[key] = node
            self.order.append(key)
        node.packets.append(pkt)
        if pkt.m:
            node.mbit_seen = True

    def decode(self, now: float, decode_cb: Callable[[PbufNode], bool]) -> bool:
        """Call decode_cb on the first playable undecoded frame
        (ref: pbuf_decode semantics)."""
        for ts in list(self.order):
            node = self.frames.get(ts)
            if node is None or node.decoded:
                continue
            if node.mbit_seen or now >= node.playout_time:
                ok = decode_cb(node)
                node.decoded = True
                return ok
        return False

    def remove_old(self, now: float) -> None:
        """ref: pbuf_remove, expire frames after 2x playout delay."""
        keep = []
        for ts in self.order:
            node = self.frames.get(ts)
            if node is not None and now >= node.deletion_time:
                del self.frames[ts]
            else:
                keep.append(ts)
        self.order = keep
