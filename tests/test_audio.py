"""Audio subsystem tests: types, G.711 (validated vs stdlib audioop),
resampler, filters, and an end-to-end audio send/receive loop."""

import threading
import time
import warnings

import numpy as np
import pytest

from ultragrid_tpu.audio.capture import TestcardAudioCapture, WavAudioCapture
from ultragrid_tpu.audio.codecs import (
    AlawCodec,
    MulawCodec,
    _alaw_to_linear,
    _linear_to_alaw,
    _linear_to_mulaw,
    _mulaw_to_linear,
    get_audio_codec,
)
from ultragrid_tpu.audio.filters import AudioMixer, ChannelRemap, DelayFilter, GainFilter
from ultragrid_tpu.audio.playback import WavAudioPlayback
from ultragrid_tpu.audio.resampler import Resampler
from ultragrid_tpu.audio.types import AudioDesc, AudioFrame


def test_interleave_roundtrip():
    desc = AudioDesc(bps=2, sample_rate=48000, ch_count=2)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 2 * 2 * 100, dtype=np.int32).astype(np.uint8)
    f = AudioFrame.from_interleaved(desc, data)
    assert f.sample_count == 100
    np.testing.assert_array_equal(f.to_interleaved(), data)


def test_g711_exact_vs_audioop():
    audioop = pytest.importorskip("audioop")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pcm = np.arange(-32768, 32768, dtype="<i2")
        assert (np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2), np.uint8) == _linear_to_alaw(pcm)).all()
        assert (np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), np.uint8) == _linear_to_mulaw(pcm)).all()
        codes = np.arange(256, dtype=np.uint8)
        assert (np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2") == _alaw_to_linear(codes)).all()
        assert (np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2") == _mulaw_to_linear(codes)).all()


def test_g711_codec_roundtrip_quality():
    cap = TestcardAudioCapture()
    frame = cap.read(4800)
    for codec in (AlawCodec(), MulawCodec()):
        enc = codec.compress(frame)
        assert enc.desc.bps == 1
        dec = codec.decompress(enc)
        orig = frame.samples_float()
        rec = dec.samples_float()
        err = np.abs(orig - rec).max()
        assert err < 0.02, err  # G.711 SNR on a 0.25 amplitude sine


def test_resampler_sine_frequency_preserved():
    cap = TestcardAudioCapture(frequency=1000)
    frame = cap.read(48000)
    rs = Resampler(44100)
    out = rs.process(frame)
    assert out.desc.sample_rate == 44100
    assert abs(out.sample_count - 44100) <= 1
    # dominant FFT bin should stay at 1 kHz
    x = out.samples_float()[0]
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    peak_hz = np.argmax(spec) * 44100 / len(x)
    assert abs(peak_hz - 1000) < 5


def test_gain_and_mute():
    cap = TestcardAudioCapture()
    frame = cap.read(1000)
    g = GainFilter(gain_db=-6.02)
    out = g.apply(frame)
    ratio = np.abs(out.samples_float()).max() / np.abs(frame.samples_float()).max()
    assert abs(ratio - 0.5) < 0.01
    g.muted = True
    assert np.abs(g.apply(frame).samples_float()).max() == 0


def test_channel_remap():
    cap = TestcardAudioCapture()
    frame = cap.read(100)
    remap = ChannelRemap("0:1,1:0")
    out = remap.apply(frame)
    np.testing.assert_allclose(out.samples_float()[0], frame.samples_float()[1], atol=1e-4)


def test_delay_filter():
    cap = TestcardAudioCapture()
    frame = cap.read(100)
    d = DelayFilter(10)
    out = d.apply(frame)
    assert (out.samples_float()[:, :10] == 0).all()
    np.testing.assert_allclose(out.samples_float()[:, 10:], frame.samples_float()[:, :90], atol=1e-4)


def test_mixer():
    desc = AudioDesc()
    m = AudioMixer(desc)
    c1 = TestcardAudioCapture(frequency=1000).read(100)
    c2 = TestcardAudioCapture(frequency=2000).read(100)
    m.add(1, c1)
    m.add(2, c2)
    out = m.mix()
    expected = c1.samples_float() + c2.samples_float()
    np.testing.assert_allclose(out.samples_float(), np.clip(expected, -1, 1), atol=1e-3)


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "test.wav")
    pb = WavAudioPlayback(path)
    cap = TestcardAudioCapture()
    frame = cap.read(4800)
    pb.reconfigure(frame.desc)
    pb.put_frame(frame)
    pb.done()
    rd = WavAudioCapture(path)
    back = rd.read(4800)
    np.testing.assert_array_equal(back.to_interleaved(), frame.to_interleaved())


def test_audio_rtp_end_to_end():
    from ultragrid_tpu.net.audio_rx import AudioRxState
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx

    port = 23900
    rx = RtpSession(addr=None, rx_port=port, tx_port=0)
    tx_sess = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=port)
    tx = Tx(mtu=1500)

    cap = TestcardAudioCapture()
    frame = cap.read(4800)
    codec = get_audio_codec("alaw")
    tx.send_audio(tx_sess, codec.compress(frame), "alaw")

    pbuf = PlayoutBuffer()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        pkt = rx.recv(timeout=0.05)
        if pkt:
            pbuf.insert(pkt)
        if pbuf.frames and any(n.mbit_seen for n in pbuf.frames.values()):
            node = list(pbuf.frames.values())[0]
            if len(node.packets) >= 8:  # 2 ch x 4.8k alaw bytes / 1448
                break
    state = AudioRxState()
    node = list(pbuf.frames.values())[0]
    out = state.decode_frame(node)
    assert out is not None
    assert out.desc.sample_rate == 48000 and out.desc.ch_count == 2
    err = np.abs(out.samples_float() - frame.samples_float()).max()
    assert err < 0.02
    tx_sess.close()
    rx.close()


def test_audio_rs_fec_end_to_end():
    from ultragrid_tpu.net.audio_rx import AudioRxState
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx

    port = 23910
    rx = RtpSession(addr=None, rx_port=port, tx_port=0)
    tx_sess = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=port)
    tx = Tx(mtu=1500)
    cap = TestcardAudioCapture()
    frame = cap.read(2400)
    tx.send_audio(tx_sess, frame, "PCM", fec_spec="rs:16:20")

    pbuf = PlayoutBuffer()
    deadline = time.monotonic() + 5
    node = None
    while time.monotonic() < deadline:
        pkt = rx.recv(timeout=0.05)
        if pkt:
            pbuf.insert(pkt)
            if pkt.m:
                node = list(pbuf.frames.values())[0]
                break
    assert node is not None
    out = AudioRxState().decode_frame(node)
    assert out is not None
    np.testing.assert_array_equal(out.channels[0], frame.channels[0])
    np.testing.assert_array_equal(out.channels[1], frame.channels[1])
    tx_sess.close()
    rx.close()


def test_audio_rs_fec_recovers_lost_packet():
    """Drop a data packet and assert RS still reconstructs the channel exactly
    (ref: audio_fec_decode passes the received map so erasures are known)."""
    from ultragrid_tpu.net.audio_rx import AudioRxState
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx

    port = 23915
    rx = RtpSession(addr=None, rx_port=port, tx_port=0)
    tx_sess = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=port)
    tx = Tx(mtu=500)  # small MTU -> several packets per channel
    cap = TestcardAudioCapture()
    frame = cap.read(2400)
    tx.send_audio(tx_sess, frame, "PCM", fec_spec="rs:16:20")

    pbuf = PlayoutBuffer()
    deadline = time.monotonic() + 5
    node = None
    while time.monotonic() < deadline:
        pkt = rx.recv(timeout=0.05)
        if pkt:
            pbuf.insert(pkt)
            if pkt.m:
                node = list(pbuf.frames.values())[0]
                break
    assert node is not None and len(node.packets) >= 4
    # drop one mid-stream data packet (not the first: keep header parseable)
    del node.packets[1]
    out = AudioRxState().decode_frame(node)
    assert out is not None
    np.testing.assert_array_equal(out.channels[0], frame.channels[0])
    np.testing.assert_array_equal(out.channels[1], frame.channels[1])
    tx_sess.close()
    rx.close()


def test_echo_cancellation_converges():
    """Synthetic echo through a short room impulse response: the canceller
    must attenuate the echo by >15 dB (ERLE) after adaptation."""
    from ultragrid_tpu.audio.echo import EchoCanceller
    from ultragrid_tpu.audio.types import AudioDesc, AudioFrame

    rng = np.random.default_rng(7)
    rate = 48000
    n_total = 48000 * 2  # 2 s
    far = (rng.normal(0, 3000, n_total)).astype(np.float64)
    # room: direct + two reflections, all within one 512-sample partition
    h = np.zeros(400)
    h[10], h[150], h[320] = 0.8, -0.35, 0.15
    echo = np.convolve(far, h)[:n_total]
    near = echo  # no near-end speech: perfect cancellation possible

    desc = AudioDesc(bps=2, sample_rate=rate, ch_count=1)
    aec = EchoCanceller(filter_length=2048, mu=0.5)
    out = []
    blk = 512
    for i in range(0, n_total, blk):
        seg_far = np.clip(far[i : i + blk], -32768, 32767).astype("<i2")
        seg_near = np.clip(near[i : i + blk], -32768, 32767).astype("<i2")
        aec.play(AudioFrame(desc, [np.frombuffer(seg_far.tobytes(), np.uint8)]))
        res = aec.cancel(AudioFrame(desc, [np.frombuffer(seg_near.tobytes(), np.uint8)]))
        out.append(np.asarray(res.channels[0]).view("<i2").astype(np.float64))
    cleaned = np.concatenate(out)
    # measure last half-second
    tail = slice(-24000, None)
    erle = 10 * np.log10(
        (near[tail] ** 2).mean() / max((cleaned[tail] ** 2).mean(), 1e-9)
    )
    assert erle > 15.0, f"ERLE {erle:.1f} dB"


def test_volume_stats_format_and_parse():
    from ultragrid_tpu.audio.types import AudioDesc, AudioFrame
    from ultragrid_tpu.audio.volume import (
        calculate_rms,
        format_stats_line,
        parse_stats_line,
        to_dbfs,
    )

    # full-scale square wave: rms == peak == 1.0 -> 0 dBFS
    desc = AudioDesc(bps=2, sample_rate=48000, ch_count=2)
    sq = np.frombuffer((np.ones(480, "<i2") * 32767 * np.where(np.arange(480) % 2, 1, -1)).astype("<i2").tobytes(), np.uint8)
    quiet = np.frombuffer((np.ones(480, "<i2") * 3277).astype("<i2").tobytes(), np.uint8)
    frame = AudioFrame(desc, [sq, quiet])
    rms0, peak0 = calculate_rms(frame, 0)
    assert abs(to_dbfs(peak0)) < 0.01
    rms1, peak1 = calculate_rms(frame, 1)
    assert abs(to_dbfs(rms1) - (-20.0)) < 0.1  # 10% of full scale

    line = format_stats_line("ARECV", frame)
    assert line.startswith("stats ARECV volrms0 ")
    parsed = parse_stats_line(line)
    assert set(parsed) == {0, 1}
    assert abs(parsed[1][0] - (-20.0)) < 0.1


def test_astat_client_against_control_socket():
    import io
    import threading
    import time

    from ultragrid_tpu.modules.messaging import Module
    from ultragrid_tpu.tools.astat import run as astat_run
    from ultragrid_tpu.utils.control_socket import ControlServer

    root = Module("root")
    cs = ControlServer(root, port=0)
    try:
        def pump():
            for _ in range(20):
                cs.report_stats("stats ARECV volrms0 -18.0004 volpeak0 -14.9897")
                time.sleep(0.05)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        out = io.StringIO()
        peaks = astat_run("127.0.0.1", cs.port, seconds=1.5, out=out)
        assert 0 in peaks
        assert abs(peaks[0][1] - (-14.9897)) < 1e-6
        assert "ch0:" in out.getvalue()
    finally:
        cs.close()


def test_aes67_rtp_l24_receive():
    """AES67 capture: RTP L24 over localhost, BE->per-channel deinterleave
    (ref: src/audio/capture/aes67.cpp)."""
    import socket
    import struct
    import time as _time

    import ultragrid_tpu.audio.aes67 as a67
    from ultragrid_tpu.audio.aes67 import Aes67Capture, parse_sap

    port = 24890
    cap = Aes67Capture(f"addr=127.0.0.1:port={port}:codec=L24:rate=48000:ch=2")
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # two RTP packets of 48 samples, L24 stereo, counter pattern
        nsamp = 48
        payloads = []
        val = 0
        for p in range(2):
            body = bytearray()
            for s in range(nsamp):
                for ch in range(2):
                    body += int(val % (1 << 24)).to_bytes(3, "big")
                    val += 1
            payloads.append(bytes(body))
        for i, body in enumerate(payloads):
            hdr = struct.pack("!BBHII", 0x80, 96 + (0x80 if i == 1 else 0), i, i * nsamp, 0xABCD)
            tx.sendto(hdr + body, ("127.0.0.1", port))
        _time.sleep(0.2)
        frame = cap.read(96)
        assert frame is not None and frame.desc.bps == 3 and frame.desc.ch_count == 2
        ch0 = np.frombuffer(bytes(frame.channels[0]), np.uint8).reshape(-1, 3)
        # first sample of channel 0 is value 0, second is 2 (LE bytes)
        vals = ch0[:, 0].astype(int) | (ch0[:, 1].astype(int) << 8) | (ch0[:, 2].astype(int) << 16)
        assert vals[0] == 0 and vals[1] == 2 and vals[2] == 4
        tx.close()
    finally:
        cap.done()

    # SAP announcement parsing (RFC 2974 + SDP)
    sdp = (b"v=0\r\no=- 1 1 IN IP4 10.0.0.5\r\ns=PTP stream\r\n"
           b"c=IN IP4 239.69.1.2/32\r\nt=0 0\r\n"
           b"m=audio 5004 RTP/AVP 98\r\na=rtpmap:98 L24/48000/8\r\n")
    pkt = bytes([0x20, 0, 0, 0]) + socket.inet_aton("10.0.0.5") + b"application/sdp\0" + sdp
    out = parse_sap(pkt)
    assert out is not None and "L24/48000/8" in out


def test_encrypted_audio_round_trip():
    """PT_ENCRYPT_AUDIO / PT_ENCRYPT_AUDIO_RS: audio packets carry the same
    per-packet AES scheme as video (ref: rtp_types.h:75-80)."""
    import numpy as np

    from ultragrid_tpu.audio.types import AudioDesc, AudioFrame
    from ultragrid_tpu.net import rtp_types as rt
    from ultragrid_tpu.net.audio_rx import AudioRxState
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx
    from ultragrid_tpu.utils.crypto import PacketCrypto

    port = 25980
    rx = RtpSession(addr=None, rx_port=port, tx_port=0)
    tx_sess = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=port)
    rng = np.random.default_rng(0)
    desc = AudioDesc(bps=2, sample_rate=48000, ch_count=2, codec="PCM")
    pcm = [rng.integers(0, 256, 4800, dtype=np.uint8) for _ in range(2)]
    frame = AudioFrame(desc, [p.copy() for p in pcm])

    for fec in ("none", "rs:4:6"):
        while rx.recv(timeout=0.05) is not None:
            pass  # flush leftovers from the previous sub-case
        tx = Tx(mtu=1500, encryption=PacketCrypto("sekrit"))
        tx.send_audio(tx_sess, frame, "PCM", fec_spec=fec)
        pb = PlayoutBuffer(0.0)
        deadline = time.monotonic() + 3
        pts = set()
        while time.monotonic() < deadline:
            p = rx.recv(timeout=0.05)
            if p is None:
                if pts:
                    break
                continue
            pts.add(p.pt)
            pb.insert(p)
        expected_pt = rt.PT_ENCRYPT_AUDIO if fec == "none" else rt.PT_ENCRYPT_AUDIO_RS
        assert pts == {expected_pt}

        got = []
        st = AudioRxState(decryption=PacketCrypto("sekrit"))
        pb.decode(time.monotonic() + 100, lambda n: got.append(st.decode_frame(n)) or True)
        frames = [f for f in got if f is not None]
        assert frames, f"no decrypted audio frame (fec={fec})"
        out = frames[0]
        for ch in range(2):
            np.testing.assert_array_equal(np.asarray(out.channels[ch]), pcm[ch])

        # wrong key: auth fails, no frame comes out
        pb2 = PlayoutBuffer(0.0)
        tx.send_audio(tx_sess, frame, "PCM", fec_spec=fec)
        deadline = time.monotonic() + 3
        n_in = 0
        idle = 0
        while time.monotonic() < deadline and (n_in == 0 or idle < 3):
            p = rx.recv(timeout=0.05)
            if p is not None:
                pb2.insert(p); n_in += 1; idle = 0
            else:
                idle += 1
        bad = []
        stbad = AudioRxState(decryption=PacketCrypto("wrong"))
        pb2.decode(time.monotonic() + 100, lambda n: bad.append(stbad.decode_frame(n)) or True)
        assert all(f is None for f in bad)
    rx.close(); tx_sess.close()


def test_audio_filter_factory_and_chain():
    from ultragrid_tpu.audio.filters import (ControlPortStats, DelayFilter,
                                             DiscardFilter, GainFilter,
                                             make_audio_filter_chain)

    chain = make_audio_filter_chain("gain:-6#delay:480#discard#controlport_stats")
    assert isinstance(chain[0], GainFilter) and chain[0].gain_db == -6.0
    assert isinstance(chain[1], DelayFilter) and chain[1].samples == 480
    assert isinstance(chain[2], DiscardFilter)
    assert isinstance(chain[3], ControlPortStats)
    with pytest.raises(ValueError):
        make_audio_filter_chain("nosuchfilter")


def test_audio_filter_discard_and_stats():
    from ultragrid_tpu.audio.filters import ControlPortStats, DiscardFilter
    from ultragrid_tpu.audio.volume import parse_stats_line

    cap = TestcardAudioCapture()
    frame = cap.read(4800)
    assert DiscardFilter().apply(frame) is None

    class FakeControl:
        lines = []

        def report_stats(self, line):
            self.lines.append(line)

    ctl = FakeControl()
    f = ControlPortStats(ctl)
    out = f.apply(frame)
    assert out is frame  # pass-through
    stats = parse_stats_line(ctl.lines[-1].replace("stats ", "stats ", 1))
    assert stats and 0 in stats  # per-channel (rms, peak) present


def test_sender_audio_filter_chain_applied(tmp_path):
    """--audio-filter silence zeroes the stream end to end (received WAV
    must be all-zero samples)."""
    import threading
    import wave

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 23960
    wav_path = str(tmp_path / "rx.wav")
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=2, timeout=30.0,
                         audio_playback=f"wav:{wav_path}")
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    VideoSender(
        "testcard:64:48:30:UYVY", "127.0.0.1", tx_port=port, frame_limit=4,
        audio_capture="testcard", audio_filter="gain:0#silence",
    ).run()
    t.join(timeout=30)
    with wave.open(wav_path, "rb") as wf:
        n = wf.getnframes()
        assert n > 0
        data = np.frombuffer(wf.readframes(n), np.int16)
    assert np.abs(data).max() == 0


def test_audio_delay_maps_to_playout_offsets():
    """--audio-delay: positive pads the audio playout delay, negative pads
    video (ref: set_audio_delay -> per-medium offsets, host.cpp:1019)."""
    from ultragrid_tpu.pipeline.receiver import VideoReceiver

    r = VideoReceiver("dummy", rx_port=23971, audio_playback="dummy",
                      audio_delay_ms=200)
    assert abs(r.audio_pbuf.playout_delay - 0.232) < 1e-9
    assert abs(r.pbuf.playout_delay - 0.032) < 1e-9
    r2 = VideoReceiver("dummy", rx_port=23973, audio_playback="dummy",
                       audio_delay_ms=-100)
    assert abs(r2.audio_pbuf.playout_delay - 0.032) < 1e-9
    assert abs(r2.pbuf.playout_delay - 0.132) < 1e-9
