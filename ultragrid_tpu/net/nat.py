"""NAT traversal helpers: STUN binding discovery + UDP hole punching.

Parity with the reference's traversal stack (ref: src/utils/udp_holepunch.cpp
— libjuice-based punched socket negotiation; src/utils/nat.c — PCP/NAT-PMP/
UPnP port mappings).  This implementation speaks RFC 5389 STUN directly (no
external library): a Binding Request over the media socket discovers the
server-reflexive address, and `punch()` exchanges keepalives so both paths'
NAT state stays open.

PCP/UPnP need a cooperating gateway, which this environment cannot provide;
the STUN + punch path is the one the reference uses for peer-to-peer
sessions via its coordination server.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional, Tuple

from ultragrid_tpu.utils.log import Logger

log = Logger("nat")

STUN_MAGIC_COOKIE = 0x2112A442
STUN_BINDING_REQUEST = 0x0001
STUN_BINDING_RESPONSE = 0x0101
ATTR_MAPPED_ADDRESS = 0x0001
ATTR_XOR_MAPPED_ADDRESS = 0x0020
DEFAULT_STUN_PORT = 3478


def build_binding_request(txid: Optional[bytes] = None) -> bytes:
    """RFC 5389 section 6: 20-byte header, no attributes."""
    txid = txid or os.urandom(12)
    return struct.pack("!HHI", STUN_BINDING_REQUEST, 0, STUN_MAGIC_COOKIE) + txid


def parse_binding_response(data: bytes, txid: bytes) -> Optional[Tuple[str, int]]:
    """Extract the (XOR-)mapped address from a Binding Response."""
    if len(data) < 20:
        return None
    mtype, mlen, cookie = struct.unpack("!HHI", data[:8])
    if mtype != STUN_BINDING_RESPONSE or cookie != STUN_MAGIC_COOKIE:
        return None
    if data[8:20] != txid:
        return None
    pos = 20
    end = min(len(data), 20 + mlen)
    while pos + 4 <= end:
        atype, alen = struct.unpack("!HH", data[pos : pos + 4])
        aval = data[pos + 4 : pos + 4 + alen]
        if atype == ATTR_XOR_MAPPED_ADDRESS and len(aval) >= 8:
            family = aval[1]
            port = struct.unpack("!H", aval[2:4])[0] ^ (STUN_MAGIC_COOKIE >> 16)
            if family == 0x01:
                raw = struct.unpack("!I", aval[4:8])[0] ^ STUN_MAGIC_COOKIE
                ip = socket.inet_ntoa(struct.pack("!I", raw))
                return ip, port
        elif atype == ATTR_MAPPED_ADDRESS and len(aval) >= 8:
            port = struct.unpack("!H", aval[2:4])[0]
            ip = socket.inet_ntoa(aval[4:8])
            return ip, port
        pos += 4 + alen + ((-alen) % 4)
    return None


def stun_discover(
    sock: socket.socket,
    server: str,
    port: int = DEFAULT_STUN_PORT,
    retries: int = 3,
    timeout: float = 1.0,
) -> Optional[Tuple[str, int]]:
    """Learn this socket's server-reflexive (public) address via STUN.

    Uses the MEDIA socket itself so the discovered mapping is the one the
    RTP stream will ride (the same trick the reference's holepunch uses).
    """
    txid = os.urandom(12)
    req = build_binding_request(txid)
    old_timeout = sock.gettimeout()
    try:
        for _ in range(retries):
            sock.sendto(req, (server, port))
            sock.settimeout(timeout)
            try:
                data, _src = sock.recvfrom(2048)
            except socket.timeout:
                continue
            mapped = parse_binding_response(data, txid)
            if mapped:
                log.notice(f"STUN mapped address: {mapped[0]}:{mapped[1]}")
                return mapped
    except OSError as exc:
        log.warning(f"STUN discovery failed: {exc}")
    finally:
        sock.settimeout(old_timeout)
    return None


def punch(
    sock: socket.socket,
    peer: Tuple[str, int],
    duration: float = 1.0,
    interval: float = 0.1,
    token: bytes = b"ug-punch",
) -> bool:
    """Open the NAT path to `peer` by exchanging keepalives.

    Both sides call punch() with each other's reflexive address (learned via
    STUN and swapped over the coordination channel).  Returns True once a
    packet from the peer arrives.
    """
    deadline = time.monotonic() + duration
    old_timeout = sock.gettimeout()
    heard = False
    try:
        while time.monotonic() < deadline:
            try:
                sock.sendto(token, peer)
            except OSError:
                pass
            sock.settimeout(interval)
            try:
                data, src = sock.recvfrom(2048)
                if data == token:
                    heard = True
                    # answer once more so the peer also confirms
                    sock.sendto(token, peer)
                    break
            except socket.timeout:
                continue
    finally:
        sock.settimeout(old_timeout)
    return heard
