"""libavcodec-backed codec modules (video + audio).

The reference's most-used compress path is libavcodec
(src/video_compress/libavcodec.cpp, src/video_decompress/libavcodec.c,
src/audio/codec/libavcodec.c); these tests exercise our shim-backed modules
end to end, including H.264 over RFC 6184 depacketization into a displayed
frame and Opus/G.722 over the native RTP audio path.
"""

import threading
import time

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.pattern import generate_pattern

lavc = pytest.importorskip("ultragrid_tpu.modules.lavc")
if not lavc.lavc_available():
    pytest.skip("libavcodec shim unavailable", allow_module_level=True)

W, H = 320, 240


def _roundtrip(cfg, out_codec=Codec.UYVY):
    enc = lavc.LavcCompress(cfg)
    orig = generate_pattern(W, H, Codec.UYVY, "bars")
    frame = VideoFrame(VideoDesc(W, H, Codec.UYVY, 30.0), [orig])
    out = enc.compress(frame)
    assert out is not None, f"{cfg}: encode failed"
    dec = lavc.LavcDecompress()
    back = dec.decompress(out, out_codec)
    assert back is not None, f"{cfg}: decode failed"
    err = np.abs(np.asarray(back.data).astype(int) - orig.astype(int)).mean()
    enc.done()
    dec.done()
    return out, err


@pytest.mark.parametrize("codec", ["H.264", "VP8", "VP9", "MJPEG", "prores", "CFHD"])
def test_lavc_video_roundtrip(codec):
    out, err = _roundtrip(f"codec={codec}:bitrate=3M")
    assert err < 4.0, f"{codec} mean err {err}"


def test_lavc_ffv1_lossless():
    out, err = _roundtrip("codec=FFV1")
    assert err == 0.0


def test_h264_rfc6184_to_displayable_frame():
    """PT 96 H.264: packetize Annex-B per RFC 6184, depacketize through the
    receive path, decode with the decompress driver — received H.264 now
    DISPLAYS instead of only recording (ref: video_decompress/libavcodec.c)."""
    from ultragrid_tpu.modules.video_decompress import decompress_init
    from ultragrid_tpu.net.rtpdec_h264 import H264Depacketizer, packetize

    enc = lavc.LavcCompress("codec=H.264:bitrate=2M")
    orig = generate_pattern(W, H, Codec.UYVY, "bars")
    frame = VideoFrame(VideoDesc(W, H, Codec.UYVY, 30.0), [orig])
    out = enc.compress(frame)
    au = bytes(np.asarray(out.data))
    pkts = packetize(au, mtu_payload=800)
    dep = H264Depacketizer()
    got = None
    for i, p in enumerate(pkts):
        got = dep.feed(p, marker=i == len(pkts) - 1)
    assert got is not None
    vf = VideoFrame(VideoDesc(W, H, Codec.H264, 30.0), [np.frombuffer(got, np.uint8)])
    decomp, out_codec = decompress_init(Codec.H264, [Codec.UYVY, Codec.RGB])
    assert decomp is not None
    shown = decomp.decompress(vf, out_codec)
    assert shown is not None
    err = np.abs(np.asarray(shown.data).astype(int) - orig.astype(int)).mean()
    assert err < 4.0
    enc.done()
    decomp.done()


def test_lavc_end_to_end_rtp_h264():
    """UltraGrid-native RTP session with -c libavcodec:codec=H.264."""
    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 26100
    received = []
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=2, timeout=45.0)
    orig_put = recv.display.put_frame

    def capture_put(frame, blocking=True):
        if frame is not None:
            received.append(frame)
        orig_put(frame, blocking)

    recv.display.put_frame = capture_put
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    time.sleep(0.2)
    sender = VideoSender(
        "testcard:s=320x240:f=30:c=UYVY:still=1",
        "127.0.0.1",
        compress_spec="libavcodec:codec=H.264:bitrate=2M",
        tx_port=port,
        frame_limit=6,
    )
    sender.run()
    t.join(timeout=30)
    assert received, "no H.264 frames displayed"
    orig = generate_pattern(W, H, Codec.UYVY, "bars")
    got = np.asarray(received[-1].data)
    assert got.shape == orig.shape
    assert np.abs(got.astype(int) - orig.astype(int)).mean() < 4.0


@pytest.mark.parametrize("codec_name", ["Opus", "G722", "speex"])
def test_lavc_audio_rtp_end_to_end(codec_name):
    """Opus (the reference's default voice codec) / G.722 / Speex over the
    native audio RTP path (5-word header, per-channel packets)."""
    from ultragrid_tpu.audio.capture import TestcardAudioCapture
    from ultragrid_tpu.audio.codecs import get_audio_codec
    from ultragrid_tpu.net.audio_rx import AudioRxState
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx

    port = 26150 + 2 * ["Opus", "G722", "speex"].index(codec_name)
    rx = RtpSession(addr=None, rx_port=port, tx_port=0)
    tx_sess = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=port)
    tx = Tx(mtu=1500)
    cap = TestcardAudioCapture()
    codec = get_audio_codec(codec_name)
    state = AudioRxState()
    decoded = []
    for cycle in range(3):
        frame = cap.read(48000 // 25)
        # one RTP buffer per codec packet (ref compress loop, audio.cpp:774);
        # Speex emits two 20 ms packets per 40 ms cycle, Opus/G.722 one
        comps = codec.compress_multi(frame)
        if not comps:
            continue  # encoder latency on the first cycle
        for comp in comps:
            tx.send_audio(tx_sess, comp, codec_name)
        pbuf = PlayoutBuffer()
        nodes = []
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and len(nodes) < len(comps):
            pkt = rx.recv(timeout=0.05)
            if pkt:
                pbuf.insert(pkt)
                if pkt.m:
                    nodes = list(pbuf.frames.values())
        assert len(nodes) == len(comps)
        for node in nodes:
            out = state.decode_frame(node)
            assert out is not None
            assert out.desc.codec == "PCM"
            decoded.append(out)
    assert decoded, f"no {codec_name} frames decoded"
    # content sanity: decoded audio has energy (testcard sine)
    x = decoded[-1].samples_float()
    assert float(np.abs(x).mean()) > 0.01
    tx_sess.close()
    rx.close()


def test_tpu_jpeg_validates_against_lavc_decoder():
    """Independent-decoder conformance: the TPU JPEG encoder's bitstream
    (restart markers, split entropy coder, byte stuffing) must decode in
    libavcodec's mjpeg decoder within the same quality gate used for PIL
    (ref: test/gpujpeg_test.cpp acceptance)."""
    from ultragrid_tpu.ops.jpeg import JpegEncoder

    orig = generate_pattern(W, H, Codec.UYVY, "bars")
    enc = JpegEncoder(W, H, in_codec=Codec.UYVY, quality=90, restart_interval=4)
    data = enc.encode(orig)
    vf = VideoFrame(VideoDesc(W, H, Codec.JPEG, 30.0), [np.asarray(data)])
    dec = lavc.LavcDecompress()
    back = dec.decompress(vf, Codec.UYVY)
    assert back is not None, "lavc mjpeg decoder rejected our bitstream"
    got = np.asarray(back.data).astype(int)
    # cross-decoder agreement: libavcodec's decode of our stream must match
    # OUR decode of the same stream (residual quantization loss is the
    # encoder's, identical for both decoders; IDCTs differ by <=2)
    from ultragrid_tpu.ops.jpeg import decode_jpeg_to_frame

    ours = np.asarray(decode_jpeg_to_frame(vf, Codec.UYVY).data).astype(int)
    y_diff = np.abs(got[:, 1::2] - ours[:, 1::2])
    assert y_diff.max() <= 2, f"decoders disagree on luma by {y_diff.max()}"
    # and the lossy roundtrip itself stays within the PIL-test class gate
    y_err = np.abs(got[:, 1::2] - orig[:, 1::2].astype(int))
    assert y_err.mean() < 0.5
    dec.done()


def test_file_capture_any_container(tmp_path):
    """The file capture device reads arbitrary containers/codecs through
    libavformat (ref: src/video_capture/file.c), not just Y4M/raw."""
    from ultragrid_tpu.modules.video_capture import initialize_video_capture

    # produce a raw H.264 elementary stream (Annex-B demuxes via lavf)
    enc = lavc.LavcCompress("codec=H.264:bitrate=2M")
    path = tmp_path / "clip.h264"
    with open(path, "wb") as f:
        for i in range(5):
            orig = generate_pattern(W, H, Codec.UYVY, "bars")
            vf = VideoFrame(VideoDesc(W, H, Codec.UYVY, 30.0), [orig])
            out = enc.compress(vf)
            f.write(bytes(np.asarray(out.data)))
    enc.done()

    cap = initialize_video_capture(f"file:{path}")
    assert (cap.desc.width, cap.desc.height) == (W, H)
    frames = []
    for _ in range(5):
        fr, _a = cap.grab()
        if fr is None:
            break
        frames.append(fr)
    cap.done()
    assert len(frames) >= 3
    orig = generate_pattern(W, H, Codec.UYVY, "bars")
    got = np.asarray(frames[-1].data)
    assert np.abs(got.astype(int) - orig.astype(int)).mean() < 4.0


def test_mpegts_rxtx_end_to_end():
    """H.264-in-MPEG-TS over localhost UDP (ref: src/rxtx/mpegts.c):
    sender muxes, receiver demuxes+decodes+displays."""
    from ultragrid_tpu.pipeline.mpegts import MpegTsReceiver, MpegTsSender

    port = 26300
    received = []
    recv = MpegTsReceiver("dummy", port=port, frame_limit=3, timeout=20.0)
    orig_put = recv.display.put_frame

    def capture_put(frame, blocking=True):
        if frame is not None:
            received.append(frame)
        orig_put(frame, blocking)

    recv.display.put_frame = capture_put
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    time.sleep(0.3)
    sender = MpegTsSender(
        "testcard:s=320x240:f=30:c=UYVY:still=1", "127.0.0.1", port,
        bitrate="2M", frame_limit=15,
    )
    sender.run()
    t.join(timeout=25)
    assert len(received) >= 1, "no TS frames displayed"
    orig = generate_pattern(W, H, Codec.UYVY, "bars")
    got = np.asarray(received[-1].data)
    assert got.shape == orig.shape
    assert np.abs(got.astype(int) - orig.astype(int)).mean() < 4.0
