"""CLI option surface parity (ref: src/main.cpp:690-740 getopt table).

Covers the round-3 additions: -f A:/V: medium prefixes, -l bitrate
grammar, -I playback, -T ttl, -4/-6, -U audio channel map,
--control-port.
"""

import time

import numpy as np
import pytest

from ultragrid_tpu.cli import build_parser
from ultragrid_tpu.net.transmit import (
    RATE_AUTO,
    RATE_DYNAMIC,
    RATE_UNLIMITED,
    parse_bitrate,
)


def _normalize_fec(args):
    # mirror of the normalization in cli.main
    video_fec, audio_fec = "none", "none"
    for spec in (args.fec or []):
        if len(spec) > 2 and spec[1] == ":" and spec[0].upper() in "AV":
            if spec[0].upper() == "A":
                audio_fec = spec[2:]
            else:
                video_fec = spec[2:]
        else:
            video_fec = spec
    return video_fec, audio_fec


def test_fec_medium_prefixes():
    p = build_parser()
    a = p.parse_args(["-f", "A:rs:160:200", "-f", "V:ldgm:256:26:5", "-t", "testcard"])
    v, au = _normalize_fec(a)
    assert v == "ldgm:256:26:5" and au == "rs:160:200"
    a = p.parse_args(["-f", "mult:3"])
    v, au = _normalize_fec(a)
    assert v == "mult:3" and au == "none"
    a = p.parse_args([])
    assert _normalize_fec(a) == ("none", "none")


def test_bitrate_grammar():
    assert parse_bitrate("auto") == (RATE_AUTO, False)
    assert parse_bitrate("dynamic") == (RATE_DYNAMIC, False)
    assert parse_bitrate("unlimited") == (RATE_UNLIMITED, False)
    assert parse_bitrate("10M") == (10_000_000, False)
    assert parse_bitrate("800k") == (800_000, False)
    assert parse_bitrate("1G") == (1_000_000_000, False)
    assert parse_bitrate("100k!") == (100_000, False)  # '!' only acknowledges
    assert parse_bitrate("5ME") == (5_000_000, True)  # 'E' = fixed nominal rate
    with pytest.raises(ValueError):
        parse_bitrate("banana")


def test_dynamic_rate_allows_occasional_excess_frame():
    from ultragrid_tpu.net.transmit import Tx

    tx = Tx(mtu=1500, bitrate=RATE_DYNAMIC)
    # warm the running average to steady state (avg -> 100k, no excess)
    for _ in range(30):
        base = tx._packet_rate(30.0, 100, 100_000)
    fast = tx._packet_rate(30.0, 100, 1_000_000)  # 10x frame: rate doubles
    assert fast == pytest.approx(base / 2, rel=0.01)
    # immediately-following excess frame is NOT boosted (EXCESS_GAP)
    notfast = tx._packet_rate(30.0, 100, 1_000_000)
    assert notfast > fast


def test_ttl_and_ip_version_flags():
    p = build_parser()
    a = p.parse_args(["-T", "4", "-6", "-t", "testcard"])
    assert a.ttl == 4 and a.force_ip_version == 6
    a = p.parse_args(["-4"])
    assert a.force_ip_version == 4
    a = p.parse_args([])
    assert a.ttl == -1 and a.force_ip_version == 0
    assert a.control_port == 5054


def test_playback_flag_maps_to_import_capture(tmp_path):
    # record a tiny session then replay it via -I (ref: export.c + playback.c)
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
    from ultragrid_tpu.utils.export import Exporter, ImportCapture

    d = tmp_path / "session"
    exp = Exporter(str(d))
    desc = VideoDesc(64, 48, Codec.UYVY, 30.0)
    for _ in range(3):
        exp.export_video(VideoFrame(desc, [np.zeros((48, 128), np.uint8)]))
    exp.finish()

    import ultragrid_tpu.cli as cli

    p = build_parser()
    args = p.parse_args(["-I", str(d), "-d", "dummy"])
    assert args.playback == str(d)
    # the main() normalization turns it into an import capture
    cap = ImportCapture(str(d))
    frame, _audio = cap.grab()
    assert frame is not None and frame.desc.width == 64
    cap.done()


def test_audio_channel_map_flag():
    p = build_parser()
    a = p.parse_args(["-U", "0:1,0:0", "-t", "testcard"])
    assert a.audio_channel_map == "0:1,0:0"


def test_audio_send_pacing_is_timestamp_driven():
    """A fast (non-realtime) audio source must be paced by cumulative
    samples/rate, not a fixed per-chunk sleep (ref: audio.cpp:707-776).
    With 8000 Hz and 25 chunks/s, 10 chunks should take ~0.4 s even though
    reads return instantly."""
    from ultragrid_tpu.pipeline.sender import VideoSender

    sender = VideoSender(
        "testcard:s=64x48:f=30:c=UYVY:still=1",
        "127.0.0.1",
        tx_port=24890,
        audio_capture="testcard:rate=8000",
        frame_limit=0,
    )

    t0 = time.monotonic()
    reads = []
    orig_read = sender.audio.read

    def counted_read(n):
        if len(reads) >= 10:
            return None
        reads.append(n)
        return orig_read(n)

    sender.audio.read = counted_read
    sender._audio_thread()
    elapsed = time.monotonic() - t0
    # 10 chunks of 320 samples @8 kHz = 0.4 s of media time
    assert 0.30 <= elapsed <= 1.5, f"pacing off: {elapsed:.2f}s for 0.4s media"
    sender.should_exit.set()
    sender.session.close()
    sender.audio_session.close()


def test_short_aliases_and_new_flags():
    p = build_parser()
    a = p.parse_args([
        "-t", "testcard", "-e", "pass:cipher=gcm", "-A", "Opus",
        "-F", "mirror", "-n", "0", "-x", "loopback", "-i", "gain:2",
        "-a", "channels=1:sample_rate=16000", "--audio-scale", "0.5",
        "--audio-host", "10.0.0.9", "--window-title", "demo",
        "--conv-policy", "cds", "-N", "upnp",
    ])
    assert a.encryption == "pass:cipher=gcm"
    assert a.audio_codec == "Opus"
    assert a.capture_filter == "mirror"
    assert a.control_port == 0
    assert a.protocol == "loopback"
    assert a.audio_filter == "gain:2"
    assert a.audio_capture_format == "channels=1:sample_rate=16000"
    assert a.audio_scale == "0.5"
    assert a.audio_host == "10.0.0.9"
    assert a.window_title == "demo"
    assert a.conv_policy == "cds"
    assert a.nat_traverse == "upnp"
    # -N without a mode defaults to auto
    a2 = p.parse_args(["-N", "-t", "testcard"])
    assert a2.nat_traverse == "auto"


def test_audio_capture_format_overrides():
    from ultragrid_tpu.audio import capture as ac

    saved = dict(ac._capture_format)
    try:
        ac.set_audio_capture_format("channels=1:bps=32:sample_rate=16k")
        d = ac.default_capture_desc()
        assert (d.ch_count, d.bps, d.sample_rate) == (1, 4, 16000)
        cap = ac.TestcardAudioCapture("")
        assert cap.desc.sample_rate == 16000 and cap.desc.ch_count == 1
        f = cap.read(160)
        assert f.sample_count == 160 and len(f.channels) == 1
        with pytest.raises(ValueError):
            ac.set_audio_capture_format("bps=7")
        with pytest.raises(ValueError):
            ac.set_audio_capture_format("bogus=1")
    finally:
        ac._capture_format.clear()
        ac._capture_format.update(saved)


def test_conv_policy_setter():
    from ultragrid_tpu.ops import pixfmt

    saved = pixfmt.PIXFMT_CONV_PREF
    try:
        pixfmt.set_pixfmt_conv_policy("cds")
        assert pixfmt.PIXFMT_CONV_PREF == "cds"
        with pytest.raises(ValueError):
            pixfmt.set_pixfmt_conv_policy("dd")
        with pytest.raises(ValueError):
            pixfmt.set_pixfmt_conv_policy("abc")
    finally:
        pixfmt.PIXFMT_CONV_PREF = saved


def test_audio_scale_factor():
    from ultragrid_tpu.audio.types import AudioDesc, AudioFrame
    from ultragrid_tpu.pipeline.receiver import VideoReceiver

    r = VideoReceiver.__new__(VideoReceiver)  # no sockets needed
    r.audio_scale = "0.5"
    desc = AudioDesc(bps=2, sample_rate=48000, ch_count=1)
    loud = AudioFrame.from_float(desc, np.full((1, 64), 0.8))
    scaled = r._scale_audio(loud)
    peak = np.abs(scaled.samples_float()).max()
    assert 0.35 <= peak <= 0.45
    r.audio_scale = "none"
    assert r._scale_audio(loud) is loud


def test_pbuf_delay_param():
    from ultragrid_tpu.utils.params import reset_params, set_commandline_param
    from ultragrid_tpu.pipeline.receiver import VideoReceiver

    set_commandline_param("pbuf-delay", "100")
    try:
        r = VideoReceiver("dummy", rx_port=24970)
        assert abs(r.pbuf.playout_delay - 0.100) < 1e-9
        r.session.close()
    finally:
        reset_params()


def test_separate_protocols_rejected(capsys):
    import ultragrid_tpu.cli as cli

    rc = cli.main(["-t", "testcard", "--audio-protocol", "rtsp"])
    assert rc == 1
    assert "no longer available" in capsys.readouterr().err
