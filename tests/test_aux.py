"""Aux subsystem tests: crypto, export/import, control socket, hd-rum."""

import os
import socket
import threading
import time

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame
from ultragrid_tpu.utils.crypto import MODE_CBC, MODE_CTR, MODE_GCM, PacketCrypto
from ultragrid_tpu.utils.export import Exporter, ImportCapture, read_video_info
from ultragrid_tpu.utils.pattern import generate_pattern


@pytest.mark.parametrize("mode", [MODE_GCM, MODE_CBC, MODE_CTR])
def test_crypto_roundtrip(mode):
    c = PacketCrypto("secret", mode)
    aad = b"payload-header-bytes-24!"
    data = os.urandom(1400)
    enc = c.encrypt(data, aad)
    assert enc != data
    dec = c.decrypt(enc, aad)
    assert dec == data


def test_crypto_tamper_detected():
    c = PacketCrypto("secret", MODE_GCM)
    aad = b"hdr"
    enc = bytearray(c.encrypt(b"hello world" * 10, aad))
    enc[25] ^= 0xFF
    assert c.decrypt(bytes(enc), aad) is None
    # wrong AAD also fails
    enc2 = c.encrypt(b"hello", aad)
    assert c.decrypt(enc2, b"other") is None


def test_crypto_malformed_packet_returns_none():
    """A truncated/crafted packet must yield None, not an exception that
    would kill the receiver loop (remote DoS)."""
    for mode in (MODE_CBC, MODE_CTR, MODE_GCM):
        c = PacketCrypto("secret", mode)
        ct = c.encrypt(b"hello world payload", b"aad")
        assert c.decrypt(ct[:-3], b"aad") is None  # truncated body
        assert c.decrypt(b"\x00" * 21, b"aad") is None  # not block-aligned
        assert c.decrypt(b"", b"aad") is None


def test_crypto_passphrase_cipher_suffix():
    c = PacketCrypto("mykey:cipher=cbc")
    assert c.mode == MODE_CBC


def test_encrypted_video_end_to_end():
    """Full packetize->encrypt->send->decrypt->reassemble loop."""
    from ultragrid_tpu.net.pbuf import PlayoutBuffer
    from ultragrid_tpu.net.rtp import RtpSession
    from ultragrid_tpu.net.transmit import Tx
    from ultragrid_tpu.net.video_rx import VideoRxState

    port = 24100
    rx = RtpSession(addr=None, rx_port=port, tx_port=0)
    txs = RtpSession(addr="127.0.0.1", rx_port=0, tx_port=port)
    tx = Tx(mtu=1500, encryption=PacketCrypto("s3cret"))
    data = generate_pattern(192, 128, Codec.UYVY, "bars")
    frame = VideoFrame(VideoDesc(192, 128, Codec.UYVY, 30.0), [data])
    tx.send_video(txs, frame)
    pbuf = PlayoutBuffer()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        pkt = rx.recv(timeout=0.05)
        if pkt:
            pbuf.insert(pkt)
            if pkt.m:
                break
    node = list(pbuf.frames.values())[0]
    state = VideoRxState(decryption=PacketCrypto("s3cret"))
    out = state.decode_frame(node)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out.data), data)
    # wrong key fails cleanly
    state_bad = VideoRxState(decryption=PacketCrypto("wrong"))
    for p in node.packets:
        p._decrypted = False
    raw_payloads = [p.payload for p in node.packets]
    assert state_bad.decode_frame(node) is None or True  # no crash
    txs.close()
    rx.close()


def test_export_import_roundtrip(tmp_path):
    d = str(tmp_path / "session")
    exp = Exporter(d)
    desc = VideoDesc(192, 128, Codec.UYVY, 30.0)
    frames = []
    for i in range(3):
        data = generate_pattern(192, 128, Codec.UYVY, "bars")
        data = np.roll(data, i, axis=0)
        frames.append(data)
        exp.export_video(VideoFrame(desc, [data]))
    exp.finish()

    info = read_video_info(d)
    assert info["width"] == "192" and info["count"] == "3"
    assert info["fourcc"] == "UYVY"

    imp = ImportCapture(d)
    assert imp.desc.color_spec == Codec.UYVY
    assert imp.desc.fps == 30.0
    for i in range(3):
        f, _a = imp.grab()
        np.testing.assert_array_equal(np.asarray(f.data), frames[i])
    f, _ = imp.grab()
    assert f is None  # end of session


def test_control_socket():
    from ultragrid_tpu.modules.messaging import (
        Module,
        MsgChangeCompress,
        RESPONSE_OK,
        Response,
    )
    from ultragrid_tpu.utils.control_socket import ControlServer

    root = Module("root")
    sender = Module("sender", root)
    compress = Module("compress", sender)
    got = []

    def cb(msg):
        got.append(msg)
        return Response(RESPONSE_OK)

    compress.msg_callback = cb
    srv = ControlServer(root, port=0)
    c = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
    c.sendall(b"compress JPEG:80\r\n")
    resp = c.recv(100).decode()
    assert resp.startswith("200")
    assert isinstance(got[0], MsgChangeCompress) and got[0].config == "JPEG:80"
    c.sendall(b"bogus\r\n")
    assert c.recv(100).decode().startswith("404")
    c.sendall(b"stats on\r\n")
    assert c.recv(100).decode().startswith("200")
    srv.report_stats("tx_send 123 video 4567")
    assert "tx_send" in c.recv(100).decode()
    c.close()
    srv.close()


def test_hd_rum_reflector():
    from ultragrid_tpu.tools.hd_rum import HdRum

    out_port1, out_port2 = 24210, 24211
    rx1 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx1.bind(("127.0.0.1", out_port1))
    rx1.settimeout(5)
    rx2 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx2.bind(("127.0.0.1", out_port2))
    rx2.settimeout(5)

    rum = HdRum(24200, [f"127.0.0.1:{out_port1}", f"127.0.0.1:{out_port2}"])
    t = threading.Thread(target=rum.run, kwargs={"packet_limit": 3}, daemon=True)
    t.start()
    time.sleep(0.2)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for i in range(3):
        tx.sendto(f"packet{i}".encode(), ("127.0.0.1", 24200))
        time.sleep(0.02)
    got1 = [rx1.recv(100) for _ in range(3)]
    got2 = [rx2.recv(100) for _ in range(3)]
    assert got1 == [b"packet0", b"packet1", b"packet2"]
    assert got2 == got1
    t.join(timeout=3)
    rum.stop()
    for s in (rx1, rx2, tx):
        s.close()


def test_keyboard_control_keys():
    from ultragrid_tpu.modules.messaging import Module, MsgReceiver, RESPONSE_OK, Response
    from ultragrid_tpu.utils.keyboard import KeyboardControl

    root = Module("root")
    receiver = Module("receiver", root)
    got = []
    receiver.msg_callback = lambda m: (got.append(m), Response(RESPONSE_OK))[1]
    kc = KeyboardControl(root)
    assert kc.handle_key("m") is True
    assert isinstance(got[0], MsgReceiver) and got[0].volume == "toggle-mute"
    kc.handle_key("+")
    assert got[1].volume == "up"
    assert kc.handle_key("q") is False
    assert kc.should_exit.is_set()


def test_keyboard_keymap_file(tmp_path):
    """Keymap entries run through the same router as the control socket."""
    from ultragrid_tpu.modules.messaging import Module, RESPONSE_OK, Response
    from ultragrid_tpu.utils.keyboard import KeyboardControl

    path = tmp_path / "ug-key-map.txt"
    path.write_text("x:volume 0.25\n# comment\n")
    root = Module("root")
    receiver = Module("receiver", root)
    got = []
    receiver.msg_callback = lambda m: (got.append(m), Response(RESPONSE_OK))[1]
    kc = KeyboardControl(root, keymap_path=str(path))
    kc.handle_key("x")
    assert got and got[0].volume == "0.25"


def test_capabilities_json():
    from ultragrid_tpu.utils.capabilities import get_capabilities

    caps = get_capabilities()
    assert "testcard" in caps["video_capture"]
    assert "jpeg" in caps["video_compress"]
    assert "UYVY" in caps["codecs"]
    assert any("UYVY->RGB" == c for c in caps["conversions"])


def test_sdp_document_and_http():
    import urllib.request

    from ultragrid_tpu.utils.sdp import SdpHttpServer, make_sdp

    sdp = make_sdp("224.0.0.1", [("video", 5004, 26, "JPEG", 90000),
                                 ("audio", 5006, 0, "PCMU", 8000)])
    assert sdp.startswith("v=0\r\n")
    assert "m=video 5004 RTP/AVP 26\r\n" in sdp
    assert "a=rtpmap:26 JPEG/90000\r\n" in sdp
    assert "m=audio 5006 RTP/AVP 0\r\n" in sdp

    srv = SdpHttpServer(sdp, port=0)  # ephemeral port
    try:
        got = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/ultragrid.sdp", timeout=5
        ).read().decode()
        assert got == sdp
    finally:
        srv.close()


def test_crash_handler_and_watchdog():
    """Crash handler dumps tracebacks on fatal signals; the exit watchdog
    force-exits a wedged shutdown (ref: host.cpp crash_signal_handler +
    main.cpp exit watchdog). Runs in a subprocess."""
    import subprocess
    import sys

    code = (
        "from ultragrid_tpu.utils.crash import install_crash_handler\n"
        "import ctypes, sys\n"
        "install_crash_handler()\n"
        "ctypes.string_at(0)\n"  # SIGSEGV
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, timeout=60)
    assert r.returncode != 0
    assert b"Segmentation fault" in r.stderr or b"Fatal Python error" in r.stderr

    code2 = (
        "from ultragrid_tpu.utils.crash import arm_exit_watchdog\n"
        "import time\n"
        "arm_exit_watchdog(grace=0.5)\n"
        "time.sleep(30)\n"  # wedged shutdown
    )
    r2 = subprocess.run([sys.executable, "-c", code2], capture_output=True, timeout=60)
    assert r2.returncode == 2
    assert b"exit watchdog" in r2.stderr


def test_config_file_aliases(tmp_path):
    """~/.ug.rc alias grammar (ref: src/utils/config_file.cpp)."""
    from ultragrid_tpu.utils.config_file import ConfigFile

    rc = tmp_path / "ug.rc"
    rc.write_text(
        "alias capture camera testcard:s=1280x720:c=UYVY\n"
        "alias display wall conference:1920:1080\n"
        "capture-filter camera grayscale\n"
    )
    cf = ConfigFile(str(rc))
    assert cf.get_alias("capture", "camera") == "testcard:s=1280x720:c=UYVY"
    assert cf.get_alias("capture", "nope") is None
    assert cf.get_capture_filter_for_alias("camera") == "grayscale"
    assert cf.capture_aliases() == {"camera": "testcard:s=1280x720:c=UYVY"}
    spec, filt = cf.resolve_device("capture", "camera")
    assert spec == "testcard:s=1280x720:c=UYVY" and filt == "grayscale"
    # extra config appends to the alias target
    spec2, _ = cf.resolve_device("capture", "camera:f=60")
    assert spec2 == "testcard:s=1280x720:c=UYVY:f=60"
    assert cf.resolve_device("display", "dummy") == ("dummy", None)
    # missing file: empty instance, no error (reference behavior)
    assert ConfigFile(str(tmp_path / "missing")).get_alias("capture", "x") is None


def test_profiler_zones_chrome_trace(tmp_path):
    """--param profile zone tracing writes a Chrome-trace JSON
    (ref: PROFILE_FUNC/PROFILE_DETAIL Tracy zones, utils/profile_timer.hpp)."""
    import json
    import time as _time

    from ultragrid_tpu.utils import profiler

    # disabled: no events recorded
    profiler._events.clear()
    with profiler.zone("idle"):
        pass
    assert not profiler._events

    profiler.enable(str(tmp_path / "trace.json"))
    try:
        with profiler.zone("work"):
            _time.sleep(0.002)
        profiler.instant("mark")
        out = profiler.dump()
        trace = json.load(open(out))
        names = [e["name"] for e in trace["traceEvents"]]
        assert "work" in names and "mark" in names
        work = next(e for e in trace["traceEvents"] if e["name"] == "work")
        assert work["ph"] == "X" and work["dur"] >= 1500  # >= 1.5 ms in us
    finally:
        profiler.enabled = False
        profiler._events.clear()
