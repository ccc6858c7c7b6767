"""Tool tests: convert CLI, hd-rum-translator transcoding loop."""

import threading
import time

import numpy as np

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame, vc_get_linesize
from ultragrid_tpu.utils.pattern import generate_pattern


def test_convert_tool(tmp_path):
    from ultragrid_tpu.tools.convert import main

    w, h = 192, 128
    src = generate_pattern(w, h, Codec.UYVY, "bars")
    in_path = str(tmp_path / "in.yuv")
    out_path = str(tmp_path / "out.rgb")
    src.tofile(in_path)
    rc = main([f"{w}x{h}", "UYVY", in_path, "RGB", out_path])
    assert rc == 0
    out = np.fromfile(out_path, np.uint8)
    assert out.size == vc_get_linesize(w, Codec.RGB) * h
    # spot check against direct conversion
    from ultragrid_tpu.ops import pixfmt

    ref = np.asarray(pixfmt.convert_frame(src, w, Codec.UYVY, Codec.RGB))
    np.testing.assert_array_equal(out.reshape(h, -1), ref)


def test_hd_rum_translator_transcodes():
    """uncompressed in -> JPEG out to one client, raw to another."""
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx
    from ultragrid_tpu.net.video_rx import VideoRxState
    from ultragrid_tpu.tools.hd_rum_translator import HdRumTranslator

    rx_port, out1, out2 = 24300, 24301, 24302
    translator = HdRumTranslator(
        rx_port, [("127.0.0.1", out1, "jpeg:85"), ("127.0.0.1", out2, "none")]
    )
    t = threading.Thread(
        target=translator.run, kwargs={"frame_limit": 2, "timeout": 90}, daemon=True
    )
    t.start()
    time.sleep(0.2)

    # client receivers
    cli1 = RtpSession(addr=None, rx_port=out1, tx_port=0)
    cli2 = RtpSession(addr=None, rx_port=out2, tx_port=0)

    # send 3 uncompressed frames into the translator
    sender = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=rx_port)
    tx = Tx(mtu=1500)
    w, h = 192, 128
    data = generate_pattern(w, h, Codec.UYVY, "bars")
    frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [data])
    for _ in range(3):
        tx.send_video(sender, frame)
        time.sleep(0.1)

    # collect at client 1 (expect JPEG)
    pb1, pb2 = PlayoutBuffer(), PlayoutBuffer()
    deadline = time.monotonic() + 60
    got1 = got2 = None
    st1, st2 = VideoRxState(), VideoRxState()
    while time.monotonic() < deadline and (got1 is None or got2 is None):
        p1 = cli1.recv(timeout=0.01)
        if p1:
            pb1.insert(p1)
        p2 = cli2.recv(timeout=0.01)
        if p2:
            pb2.insert(p2)
        now = time.monotonic()
        if got1 is None:
            for node in list(pb1.frames.values()):
                if node.mbit_seen and not node.decoded:
                    node.decoded = True
                    got1 = st1.decode_frame(node)
        if got2 is None:
            for node in list(pb2.frames.values()):
                if node.mbit_seen and not node.decoded:
                    node.decoded = True
                    got2 = st2.decode_frame(node)
    assert got1 is not None and got1.desc.color_spec == Codec.JPEG
    assert got2 is not None and got2.desc.color_spec == Codec.UYVY
    np.testing.assert_array_equal(np.asarray(got2.data), data)
    for s in (cli1, cli2, sender):
        s.close()
    t.join(timeout=5)
