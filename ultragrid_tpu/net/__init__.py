"""Transport: RTP/RTCP over UDP, packetization, playout buffer.

Host-side, wire-compatible with the reference's RTP stack (payload formats
per src/rtp/rtp_types.h, packetization per src/transmit.c) so the two
implementations can interoperate on the same network.
"""
