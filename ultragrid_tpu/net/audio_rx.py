"""Receiver-side audio reassembly (ref: src/rtp/audio_decoders.cpp).

Per-channel reassembly from the 5-word audio payload header; decompress by
wire codec tag; hand to playback.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ultragrid_tpu.audio.codecs import get_audio_codec
from ultragrid_tpu.audio.types import TAG_TO_CODEC, AudioDesc, AudioFrame
from ultragrid_tpu.net import rtp_types as rt
from ultragrid_tpu.net.pbuf import PbufNode
from ultragrid_tpu.utils.log import Logger

log = Logger("audio_rx")


class AudioRxState:
    def __init__(self) -> None:
        self.frames_ok = 0

    def decode_frame(self, node: PbufNode) -> Optional[AudioFrame]:
        channels: Dict[int, np.ndarray] = {}
        desc = None
        codec_name = "PCM"
        for pkt in node.packets:
            if pkt.pt != rt.PT_AUDIO or len(pkt.payload) < rt.AUDIO_PAYLOAD_HDR_LEN:
                continue
            ch, buf_idx, offset, data_len, bps, rate, tag = rt.parse_audio_header(pkt.payload)
            codec_name = TAG_TO_CODEC.get(tag, "PCM")
            data = pkt.payload[rt.AUDIO_PAYLOAD_HDR_LEN :]
            if ch not in channels:
                channels[ch] = np.zeros(data_len, np.uint8)
            end = min(offset + len(data), data_len)
            channels[ch][offset:end] = np.frombuffer(data[: end - offset], np.uint8)
            desc = AudioDesc(bps=bps, sample_rate=rate, ch_count=len(channels), codec=codec_name)
        if desc is None:
            return None
        desc = desc.with_(ch_count=max(channels) + 1)
        chans = [channels.get(c, np.zeros(0, np.uint8)) for c in range(desc.ch_count)]
        frame = AudioFrame(desc, chans)
        if codec_name != "PCM":
            try:
                frame = get_audio_codec(codec_name).decompress(frame)
            except ValueError:
                log.warning(f"cannot decode audio codec {codec_name}")
                return None
        self.frames_ok += 1
        return frame
