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


def test_webui_preview_control_capabilities(tmp_path):
    """Browser GUI contract: MJPEG preview from the ipc_frame socket,
    control-socket bridge, capabilities JSON (Qt GUI replacement)."""
    import http.client
    import io
    import json
    import socket as _socket
    import threading
    import time

    import numpy as np

    from ultragrid_tpu.modules.ipc_display import UnixSockDisplay
    from ultragrid_tpu.tools.webui import make_server
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    # mock control socket server
    ctl = _socket.socket()
    ctl.bind(("127.0.0.1", 0))
    ctl.listen(2)
    ctl_port = ctl.getsockname()[1]

    def ctl_loop():
        while True:
            try:
                conn, _ = ctl.accept()
            except OSError:
                return
            line = conn.recv(256).decode()
            if line.startswith("stats on"):
                conn.sendall(b"stats ITEM 42\r\n")
            else:
                conn.sendall(b"200 OK\r\n")

    threading.Thread(target=ctl_loop, daemon=True).start()

    path = str(tmp_path / "prev.sock")
    srv, hub, bridge = make_server(0, path, ctl_port)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    time.sleep(0.3)  # let the hub bind its unix socket

    # feed frames through the preview display path
    w, h = 96, 64
    disp = UnixSockDisplay(f"path={path}")
    desc = VideoDesc(w, h, Codec.RGB, 30.0)
    disp.reconfigure(desc)
    rgb = generate_pattern(w, h, Codec.RGB, "bars")
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            disp.put_frame(VideoFrame(desc, [rgb]))
            time.sleep(0.03)

    threading.Thread(target=pump, daemon=True).start()

    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        assert b"preview" in conn.getresponse().read()

        conn.request("GET", "/capabilities")
        caps = json.loads(conn.getresponse().read())
        assert "video_capture" in caps and "testcard" in caps["video_capture"]

        # one MJPEG part from the preview stream
        conn.request("GET", "/preview")
        resp = conn.getresponse()
        assert resp.getheader("Content-Type").startswith("multipart/x-mixed-replace")
        data = b""
        deadline = time.time() + 15
        while b"\xff\xd9" not in data and time.time() < deadline:
            data += resp.read(4096)
        i = data.index(b"\xff\xd8")
        j = data.index(b"\xff\xd9") + 2
        from PIL import Image

        img = Image.open(io.BytesIO(data[i:j]))
        img.load()
        assert img.size == (w, h)
        conn.close()

        # control + stats
        c2 = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c2.request("POST", "/control", body="compress jpeg:80")
        assert b"200" in c2.getresponse().read()
        deadline = time.time() + 10
        stats = b""
        while b"ITEM 42" not in stats and time.time() < deadline:
            c2.request("GET", "/stats")
            stats = c2.getresponse().read()
            time.sleep(0.2)
        assert b"ITEM 42" in stats
    finally:
        stop.set()
        disp.done()
        srv.shutdown()
        ctl.close()


def test_hd_rum_translator_slow_client_does_not_stall_others():
    """Per-client recompress threads: a wedged client drops its own frames
    while the fast client keeps receiving (ref: hd-rum-recompress.cpp
    worker-per-output)."""
    import threading
    import time as _time

    import numpy as np

    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx
    from ultragrid_tpu.tools.hd_rum_translator import HdRumTranslator
    from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame

    rx_port, fast_port, slow_port = 25840, 25844, 25848
    translator = HdRumTranslator(
        rx_port, [("127.0.0.1", fast_port, "none"), ("127.0.0.1", slow_port, "none")]
    )
    slow = translator.clients[1]
    orig_send = slow.tx.send_video

    def wedged_send(session, frame):
        _time.sleep(0.5)  # pathological client
        return orig_send(session, frame)

    slow.tx.send_video = wedged_send

    fast_rx = RtpSession(addr=None, rx_port=fast_port, tx_port=0)
    run_t = threading.Thread(
        target=lambda: translator.run(timeout=6.0), daemon=True
    )
    run_t.start()

    tx = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=rx_port)
    sender_tx = Tx(mtu=1500)
    desc = VideoDesc(64, 32, Codec.UYVY, 30.0)
    frame = VideoFrame(desc, [np.zeros((32, 128), np.uint8)])
    got_fast = 0
    for i in range(20):
        sender_tx.send_video(tx, frame)
        _time.sleep(0.03)
        while fast_rx.recv(timeout=0.01) is not None:
            got_fast += 1
    run_t.join(timeout=10)
    # the fast client saw most packets; the slow client dropped frames
    assert got_fast >= 10, f"fast client starved ({got_fast} pkts)"
    assert slow.dropped >= 5
    tx.close(); fast_rx.close()
