"""Sender pipeline: capture -> compress -> FEC -> RTP/UDP.

Thread-per-stage like the reference (capture thread src/main.cpp:347-397 ->
compress worker src/video_compress.cpp -> sender loop src/rxtx.cpp:259-287).
"""

from __future__ import annotations

import threading
import time
from typing import Optional

from ultragrid_tpu.modules.messaging import (
    Module,
    MsgChangeFec,
    MsgSender,
    RESPONSE_BAD_REQUEST,
    RESPONSE_OK,
    Response,
)
from ultragrid_tpu.modules.video_capture import initialize_video_capture
from ultragrid_tpu.modules.video_compress import CompressDriver
from ultragrid_tpu.net.rtp import RtpSession
from ultragrid_tpu.net.transmit import RATE_AUTO, Tx
from ultragrid_tpu.utils import profiler
from ultragrid_tpu.utils.log import Logger
from ultragrid_tpu.utils.params import add_to_param

add_to_param("fec-adaptive",
             "[=max_pct] adapt LDGM protection to RTCP-RR receiver loss "
             "(2x worst loss, decay when clean; sender-side, beyond the "
             "reference's display-only RR use, rtp.c:160-201)")

log = Logger("sender")


class VideoSender:
    def __init__(
        self,
        capture_spec: str,
        host: str,
        compress_spec: str = "none",
        fec_spec: str = "none",
        tx_port: int = 5004,
        rx_port: int = 0,
        mtu: int = 1500,
        frame_limit: Optional[int] = None,
        capture_filter: str = "",
        audio_capture: Optional[str] = None,
        audio_codec: str = "PCM",
        encryption: Optional[str] = None,
        record: Optional[str] = None,
        mode: str = "normal",
        rtp_standard: bool = False,
        rtsp: bool = False,
        control_port: Optional[int] = None,
        audio_fec: str = "none",
        audio_channel_map: Optional[str] = None,
        audio_filter: Optional[str] = None,
        start_paused: bool = False,
        bitrate: int = RATE_AUTO,
        bitrate_fixed: bool = False,
        ttl: int = 255,
        force_ip_version: int = 0,
        mcast_if=None,
        audio_host: Optional[str] = None,
    ):
        from ultragrid_tpu.utils.tiling import VideoMode

        self.mode = VideoMode.from_str(mode)
        self.exporter = None
        if record is not None:
            from ultragrid_tpu.utils.export import Exporter

            self.exporter = Exporter(record or None)
        from ultragrid_tpu.modules.filters import FilterChain

        self.capture_chain = FilterChain(capture_filter)
        self.capture = initialize_video_capture(capture_spec)
        self.audio = None
        self.audio_codec_name = audio_codec
        self.audio_fec = audio_fec
        # audio filter chain: -U remap first, then --audio-filter elements
        # (ref: --audio-filter grammar, main.cpp:271)
        from ultragrid_tpu.audio.filters import (ChannelRemap,
                                                 make_audio_filter_chain)

        self.audio_filters = []
        if audio_channel_map:
            self.audio_filters.append(ChannelRemap(audio_channel_map))
        if audio_filter:
            self.audio_filters.extend(make_audio_filter_chain(audio_filter))
        # "embedded" = audio rides along with video capture grabs
        # (ref: audio_sdi_send, main.cpp:365)
        self.audio_embedded = audio_capture == "embedded"
        if self.audio_embedded:
            from ultragrid_tpu.audio.codecs import get_audio_codec

            self.audio_codec = get_audio_codec(audio_codec)
            self.audio_session = RtpSession(addr=audio_host or host, rx_port=0,
                                            tx_port=tx_port + 2, mtu=mtu,
                                            ttl=ttl,
                                            force_ip_version=force_ip_version)
            self.audio_tx = Tx(mtu=mtu)
        elif audio_capture and audio_capture != "none":
            from ultragrid_tpu.audio.capture import initialize_audio_capture
            from ultragrid_tpu.audio.codecs import get_audio_codec

            self.audio = initialize_audio_capture(audio_capture)
            self.audio_codec = get_audio_codec(audio_codec)
            # audio ports = base + 2 (ref: src/main.cpp:592-628); --audio-host
            # redirects the audio stream (ref: OPT_AUDIO_HOST, main.cpp:895)
            self.audio_session = RtpSession(addr=audio_host or host, rx_port=0,
                                            tx_port=tx_port + 2, mtu=mtu,
                                            ttl=ttl,
                                            force_ip_version=force_ip_version)
            self.audio_tx = Tx(mtu=mtu)
        self.root = Module("root")
        # live-reconfigurable sender module (ref: the "sender" message
        # target, rxtx/rtp_common.c:216-241 + msg_sender handling)
        self.sender_module = Module("sender", self.root)
        self.sender_module.msg_callback = self._on_sender_message
        self.paused = threading.Event()
        if start_paused:
            self.paused.set()
        self.compress = CompressDriver(compress_spec, self.sender_module)
        if bitrate > 0:
            # a fixed -l rate also constrains the own-codec paths (the
            # reference reaches rate-targeted video only through its lavc
            # wrapper, src/video_compress/libavcodec.cpp:943-1003)
            impl = getattr(self.compress, "_impl", None)
            if impl is not None and hasattr(impl, "set_target_bitrate"):
                impl.set_target_bitrate(bitrate)
        crypto = None
        if encryption:
            from ultragrid_tpu.utils.crypto import PacketCrypto

            crypto = PacketCrypto(encryption)
        if crypto is not None and (self.audio is not None or self.audio_embedded):
            # audio rides the same per-packet AES (PT 25/36)
            self.audio_tx.encryption = crypto
        # RTCP always on like the reference (rtp_init starts RTCP on the
        # odd port; RR feedback feeds stats + adaptive FEC)
        self.session = RtpSession(addr=host, rx_port=rx_port, tx_port=tx_port,
                                  mtu=mtu, ttl=ttl, rtcp=True,
                                  force_ip_version=force_ip_version,
                                  mcast_if=mcast_if)
        self.tx = Tx(mtu=mtu, fec_spec=fec_spec, bitrate=bitrate,
                     bitrate_fixed=bitrate_fixed, encryption=crypto,
                     rfc2435=rtp_standard)
        self.sdp_server = None
        self.rtsp_server = None
        if rtsp:
            # serve the session over RTSP: PLAY adds the client as an RTP
            # destination (ref: rtsp rxtx mode / BasicRTSPOnlyServer.cpp)
            from ultragrid_tpu.net.rtsp import RtspServer

            try:
                self.rtsp_server = RtspServer(
                    [("video", tx_port, 26, "JPEG", 90000)],
                    on_play=self.session.add_destination,
                    on_teardown=self.session.remove_destination,
                )
            except OSError as exc:
                log.warning(f"RTSP server unavailable: {exc}")
        if rtp_standard:
            # publish an SDP for the standards-mode stream (ref: utils/sdp.c)
            from ultragrid_tpu.utils.sdp import SdpHttpServer, make_sdp

            sdp = make_sdp(host or "0.0.0.0", [("video", tx_port, 26, "JPEG", 90000)])
            try:
                self.sdp_server = SdpHttpServer(sdp)
            except OSError as exc:
                log.warning(f"SDP HTTP server unavailable: {exc}")
        self.frame_limit = frame_limit
        self.should_exit = threading.Event()
        self.frames_sent = 0
        # --echo-cancellation: assigned by the duplex session runner; the
        # captured (near-end) signal is cleaned before compression
        # (ref: echo_cancel, audio/echo.cpp)
        self.echo = None
        # runtime control socket — live sessions always get one like the
        # reference (ref: control_init, main.cpp:1288-1306)
        self.control = None
        if control_port is not None:
            from ultragrid_tpu.utils.control_socket import ControlServer

            try:
                self.control = ControlServer(self.root, control_port)
                log.notice(f"control socket on 127.0.0.1:{self.control.port}")
                from ultragrid_tpu.audio.filters import ControlPortStats

                for flt in self.audio_filters:
                    if isinstance(flt, ControlPortStats) and flt.control is None:
                        flt.control = self.control
            except OSError as e:
                log.warning(f"control socket unavailable: {e}")
        self._bytes_since_report = 0
        self._last_report = time.monotonic()

    def _maybe_adapt_fec(self) -> None:
        """Loss-adaptive LDGM protection driven by RTCP RR feedback
        (opt-in via ``--param fec-adaptive[=max_pct]``).  The reference only
        *displays* RR loss (rtp.c:160-201); here the sender raises the LDGM
        percentage toward 2x the worst receiver-reported loss and decays it
        slowly when the path recovers, swapping Tx atomically like a
        control-socket ``fec`` command."""
        from ultragrid_tpu.utils.params import (get_commandline_param,
                                                param_is_set)

        if not param_is_set("fec-adaptive"):
            return
        max_pct = float(get_commandline_param("fec-adaptive") or 50.0)
        worst = 0.0
        for rr in self.session.rtcp.remote_reports.values():
            if rr.get("type") == "RR":
                worst = max(worst, rr.get("fraction_lost", 0.0))
        cur = getattr(self, "_adaptive_pct", 0.0)
        target = min(worst * 100.0 * 2.0, max_pct)
        if target > cur:
            new = target  # raise immediately on observed loss
        else:
            new = max(target, cur * 0.9)  # decay ~10%/s when clean
        if new < 1.0:
            new = 0.0
        self._adaptive_pct = new
        applied = getattr(self, "_applied_pct", 0.0)
        # reswap Tx only on meaningful change (>=2 points or on/off flip)
        if abs(new - applied) < 2.0 and (new > 0.0) == (applied > 0.0):
            return
        self._applied_pct = new
        spec = f"ldgm:{max(new, 1.0):.0f}%" if new >= 1.0 else "none"
        self.tx = Tx(mtu=self.tx.mtu, fec_spec=spec, bitrate=self.tx.bitrate,
                     bitrate_fixed=self.tx.bitrate_fixed,
                     encryption=self.tx.encryption, rfc2435=self.tx.rfc2435)
        log.notice(f"adaptive FEC -> {spec} "
                   f"(worst receiver loss {worst * 100:.1f}%)")
        if self.control is not None:
            self.control.report_stats(f"fec_adapt {spec} loss {worst:.4f}")

    def _on_sender_message(self, msg) -> Response:
        """Runtime reconfig from the control socket / keyboard
        (ref: fec change rtp_common.c:216-241; msg_sender receiver/port/
        pause, src/video_rxtx/ultragrid_rtp.cpp message handling)."""
        if isinstance(msg, MsgChangeFec):
            spec = msg.fec.strip()
            # strip an optional V: medium prefix (ref: main.cpp:824-839)
            if spec[:2].upper() == "V:":
                spec = spec[2:]
            try:
                if spec not in ("", "none") and not spec.startswith("mult:"):
                    from ultragrid_tpu.ops.fec import fec_from_spec

                    fec_from_spec(spec, 65536, self.tx.mtu)  # validate
            except Exception as e:  # noqa: BLE001
                return Response(RESPONSE_BAD_REQUEST, f"bad fec {spec!r}: {e}")
            new_tx = Tx(mtu=self.tx.mtu, fec_spec=spec, bitrate=self.tx.bitrate,
                        bitrate_fixed=self.tx.bitrate_fixed,
                        encryption=self.tx.encryption, rfc2435=self.tx.rfc2435)
            self.tx = new_tx  # single-reference swap: next frame uses it
            log.notice(f"FEC changed to {spec or 'none'}")
            return Response(RESPONSE_OK)
        if isinstance(msg, MsgSender):
            if msg.receiver is not None:
                try:
                    self.session.set_receiver(msg.receiver)
                except (ValueError, OSError) as e:
                    return Response(RESPONSE_BAD_REQUEST, str(e))
                log.notice(f"receiver changed to {msg.receiver}")
            if msg.port is not None:
                addr = self.session._dest[0] if self.session._dest else None
                if addr is None:
                    return Response(RESPONSE_BAD_REQUEST, "no receiver set")
                self.session.set_receiver(addr, msg.port)
                log.notice(f"TX port changed to {msg.port}")
            if msg.paused is not None:
                if msg.paused:
                    self.paused.set()
                else:
                    self.paused.clear()
                log.notice("paused" if msg.paused else "playing")
            return Response(RESPONSE_OK)
        return Response(RESPONSE_BAD_REQUEST, "unsupported message")

    def _capture_thread(self) -> None:
        count = 0
        fps_t0 = time.monotonic()
        fps_n = 0
        try:
            while not self.should_exit.is_set():
                if self.frame_limit is not None and count >= self.frame_limit:
                    break
                with profiler.zone("capture.grab"):
                    frame, audio = self.capture.grab()
                # stamp the capture instant (ref: main.cpp captures carry a
                # timestamp into the RTP TS via tv_to_rtp); transmit maps
                # this to the 90 kHz RTP clock, so a same-host receiver can
                # measure capture->display latency against time.monotonic()
                if frame is not None and frame.timestamp < 0:
                    frame.timestamp = time.monotonic()
                if self.audio_embedded and audio is not None:
                    # embedded (SDI-style) audio rides the capture cadence
                    # (ref: audio_sdi_send, main.cpp:365)
                    for flt in self.audio_filters:
                        audio = flt.apply(audio)
                        if audio is None:
                            break
                    if audio is not None:
                        # one RTP buffer per codec packet (ref compress
                        # loop, audio.cpp:774-779)
                        for comp in self.audio_codec.compress_multi(audio):
                            self.audio_tx.send_audio(self.audio_session, comp,
                                                     self.audio_codec_name,
                                                     fec_spec=self.audio_fec)
                if frame is not None:
                    with profiler.zone("capture.filter"):
                        frame = self.capture_chain.apply(frame)
                if frame is None:
                    continue
                if self.paused.is_set():
                    continue  # drop while paused (ref: paused sender state)
                # periodic per-stage FPS line (ref: print_fps, main.cpp:307-332)
                fps_n += 1
                now = time.monotonic()
                if now - fps_t0 >= 5.0:
                    log.notice(f"[capture] {fps_n} frames in {now - fps_t0:.2f} s "
                               f"({fps_n / (now - fps_t0):.2f} fps)")
                    fps_t0, fps_n = now, 0
                if self.mode.x * self.mode.y > 1:
                    from ultragrid_tpu.utils.tiling import vf_split

                    frame = vf_split(frame, self.mode.x, self.mode.y)
                count += 1
                self.compress.enqueue(frame)
        finally:
            self.compress.enqueue(None)

    def _audio_thread(self) -> None:
        # ~1/25 s chunks; pacing is TIMESTAMP-driven off the cumulative
        # sample count, not a fixed sleep, so capture drift (48001 Hz
        # sources, slow reads) never desynchronizes the stream
        # (ref: audio_sender_thread cadence, audio.cpp:707-776)
        chunk = self.audio.desc.sample_rate // 25
        start = time.monotonic()
        samples_sent = 0
        while not self.should_exit.is_set():
            frame = self.audio.read(chunk)
            if frame is None:
                break
            # pacing advances by CAPTURED samples even if a filter drops
            nsamples = frame.channels[0].size // frame.desc.bps
            if self.echo is not None:
                frame = self.echo.cancel(frame) or frame
            for flt in self.audio_filters:
                frame = flt.apply(frame)
                if frame is None:
                    break
            if frame is not None:
                # one RTP buffer per codec packet (ref compress loop,
                # audio.cpp:774-779)
                for comp in self.audio_codec.compress_multi(frame):
                    self.audio_tx.send_audio(self.audio_session, comp,
                                             self.audio_codec_name,
                                             fec_spec=self.audio_fec)
            samples_sent += nsamples
            deadline = start + samples_sent / frame.desc.sample_rate
            delay = deadline - time.monotonic()
            if delay > 0:
                time.sleep(delay)

    def run(self) -> int:
        from ultragrid_tpu.utils.keyboard import KeyboardControl

        kb = KeyboardControl(self.root, on_exit=self.should_exit.set)
        kb.start()  # no-op unless stdin is a tty
        t = threading.Thread(target=self._capture_thread, name="capture", daemon=True)
        t.start()
        at = None
        if self.audio is not None:
            at = threading.Thread(target=self._audio_thread, name="audio", daemon=True)
            at.start()
        while True:
            frame = self.compress.pop()
            if frame is None:
                break
            if self.exporter is not None:
                self.exporter.export_video(frame)
            with profiler.zone("fec+tx.send"):
                before = self.session.bytes_sent
                self.tx.send_video(self.session, frame)
            self.frames_sent += 1
            if self.control is not None:
                # periodic bandwidth line (ref: report_stats, transmit.c:625-648)
                self._bytes_since_report += self.session.bytes_sent - before
                now = time.monotonic()
                if now - self._last_report >= 1.0:
                    self.control.report_stats(
                        f"tx_send {self.session.ssrc:x} video "
                        f"{self._bytes_since_report}")
                    if self.session.rtcp is not None:
                        # surface receiver-reported loss from RTCP RRs
                        # (ref: rtp.c:160-201 RR consumption)
                        for ssrc, rr in self.session.rtcp.remote_reports.items():
                            if rr.get("type") != "RR":
                                continue
                            self.control.report_stats(
                                f"rtcp_rr {ssrc:x} lost {rr.get('lost', 0)} "
                                f"fraction {rr.get('fraction_lost', 0.0):.4f} "
                                f"jitter {rr.get('jitter', 0)}")
                            log.info(
                                f"receiver {ssrc:x} reports "
                                f"{rr.get('lost', 0)} lost "
                                f"({rr.get('fraction_lost', 0.0) * 100:.1f}%)")
                        self._maybe_adapt_fec()
                    self._last_report = now
                    self._bytes_since_report = 0
        self.should_exit.set()
        # force-exit if a stuck device/capture thread wedges the shutdown
        # (ref: main.cpp:1438 exit watchdog)
        from ultragrid_tpu.utils.crash import arm_exit_watchdog

        wd = arm_exit_watchdog()
        if self.control is not None:
            self.control.close()
        if self.audio is not None or self.audio_embedded:
            self.audio_session.close()
        self.session.close()
        if self.exporter is not None:
            self.exporter.finish()
        t.join(timeout=5)
        wd.cancel()
        return self.frames_sent


def run_sender(args) -> int:
    from ultragrid_tpu.net.transmit import parse_bitrate

    bitrate, bitrate_fixed = parse_bitrate(getattr(args, "limit_bitrate", "auto"))
    sender = VideoSender(
        control_port=getattr(args, "control_port", None),
        audio_fec=getattr(args, "audio_fec", "none"),
        audio_channel_map=getattr(args, "audio_channel_map", None),
        audio_filter=getattr(args, "audio_filter", None),
        start_paused=getattr(args, "start_paused", False),
        bitrate=bitrate,
        bitrate_fixed=bitrate_fixed,
        ttl=getattr(args, "ttl", -1) if getattr(args, "ttl", -1) >= 0 else 255,
        force_ip_version=getattr(args, "force_ip_version", 0),
        mcast_if=getattr(args, "mcast_if", None),
        audio_host=getattr(args, "audio_host", None),
        capture_spec=args.capture,
        host=args.host,
        compress_spec=args.compress,
        fec_spec=args.fec,
        tx_port=int(str(args.ports).split(":")[0]),
        mtu=args.mtu,
        frame_limit=args.frames,
        capture_filter=getattr(args, "capture_filter", ""),
        audio_capture=getattr(args, "audio_capture", None),
        audio_codec=getattr(args, "audio_codec", "PCM"),
        encryption=getattr(args, "encryption", None),
        record=getattr(args, "record", None),
        mode=getattr(args, "mode", "normal"),
        rtp_standard=getattr(args, "rtp_standard", False),
        rtsp=getattr(args, "rtsp", False),
    )
    n = sender.run()
    log.notice(f"sent {n} frames")
    return 0
