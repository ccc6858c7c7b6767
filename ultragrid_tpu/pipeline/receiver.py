"""Receiver pipeline: RTP/UDP -> playout buffer -> FEC -> decompress -> display.

Mirror of the reference's receiver thread + 3-stage decode pipeline
(ref: src/rxtx/ultragrid_rtp.c:382-500, src/rtp/video_decoders.cpp:46-93).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

from ultragrid_tpu.modules.video_decompress import decompress_init
from ultragrid_tpu.modules.video_display import initialize_video_display
from ultragrid_tpu.net.pbuf import PlayoutBuffer
from ultragrid_tpu.utils.params import add_to_param

add_to_param("pbuf-delay",
             "<ms> playout (jitter) buffer delay, default 32 "
             "(ref: --param pbuf-delay, pbuf.c:191)")
add_to_param("vrx-fast",
             "* vrx-fast={auto|off}\n"
             "  C fast-path video depacketizer (default auto; off forces "
             "the Python pbuf path)")
from ultragrid_tpu.net.rtp import RtpSession
from ultragrid_tpu.net.video_rx import VideoRxState
from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, VideoFrame, is_codec_opaque
from ultragrid_tpu.utils import profiler
from ultragrid_tpu.utils.log import Logger

log = Logger("receiver")


class VideoReceiver:
    # class-level defaults so partially-constructed receivers (tests,
    # embedders) and early message handlers see sane values
    volume = 1.0
    muted = False
    audio_scale = None

    def __init__(
        self,
        display_spec: str,
        rx_port: int = 5004,
        frame_limit: Optional[int] = None,
        timeout: Optional[float] = None,
        playout_delay: float = 0.032,
        audio_delay_ms: int = 0,
        postprocess: str = "",
        audio_playback: Optional[str] = None,
        encryption: Optional[str] = None,
        mode: str = "normal",
        control=None,
        mcast_addr: Optional[str] = None,
        force_ip_version: int = 0,
        root=None,
        mcast_if: Optional[str] = None,
        audio_scale: Optional[str] = None,
    ):
        if audio_scale not in (None, "", "none", "auto"):
            float(audio_scale)  # fail fast on '--audio-scale 50%' typos
        self.audio_scale = audio_scale
        # --echo-cancellation: assigned by the duplex runner (far-end feed)
        self.echo = None
        from ultragrid_tpu.utils.tiling import VideoMode

        self.control = control
        # live-reconfigurable receiver module (ref: receiver-side messages,
        # e.g. runtime postprocess change via the control socket)
        if root is not None:
            from ultragrid_tpu.modules.messaging import (
                Module,
                MsgReceiver,
                RESPONSE_BAD_REQUEST,
                RESPONSE_OK,
                Response,
            )

            self._module = Module("receiver", root)

            def on_msg(msg):
                if isinstance(msg, MsgReceiver):
                    if msg.postprocess is not None:
                        from ultragrid_tpu.modules.filters import FilterChain

                        try:
                            chain = FilterChain(msg.postprocess)
                        except Exception as e:  # noqa: BLE001
                            return Response(RESPONSE_BAD_REQUEST, str(e))
                        self.postprocess_chain = chain  # atomic swap
                        log.notice(f"postprocess changed to "
                                   f"{msg.postprocess or 'none'}")
                    if msg.volume is not None:
                        # ref: volume/mute control commands + keyboard keys
                        v = msg.volume
                        if v == "mute":
                            self.muted = True
                        elif v == "unmute":
                            self.muted = False
                        elif v == "toggle-mute":  # keyboard 'm'
                            self.muted = not self.muted
                        elif v == "up":
                            self.volume *= 10 ** (1 / 20)  # +1 dB
                        elif v == "down":
                            self.volume /= 10 ** (1 / 20)
                        else:
                            try:
                                self.volume = float(v)
                            except ValueError:
                                return Response(RESPONSE_BAD_REQUEST,
                                                f"bad volume {v!r}")
                        log.notice(f"volume {self.volume:.3f}"
                                   f"{' (muted)' if self.muted else ''}")
                    if msg.av_delay_ms is not None:
                        # ref: av-delay command -> per-medium playout offsets
                        d = msg.av_delay_ms
                        self.pbuf.playout_delay = (
                            self._base_playout + max(-d, 0) / 1000.0)
                        if self.audio_playback is not None:
                            self.audio_pbuf.playout_delay = (
                                self._base_playout + max(d, 0) / 1000.0)
                        log.notice(f"av-delay {d} ms")
                    return Response(RESPONSE_OK)
                return Response(RESPONSE_BAD_REQUEST, "unsupported message")

            self._module.msg_callback = on_msg
        self.mode = VideoMode.from_str(mode)
        from ultragrid_tpu.modules.filters import FilterChain

        self.postprocess_chain = FilterChain(postprocess)
        self.display = initialize_video_display(display_spec)
        # a multicast session address makes the receiver join the group
        # (ref: session addr semantics, net_udp.c udp_join_mcast_grp)
        self.session = RtpSession(addr=mcast_addr, rx_port=rx_port, tx_port=0,
                                  rtcp=True,  # RR feedback to the sender
                                  force_ip_version=force_ip_version,
                                  mcast_if=mcast_if)
        self.audio_playback = None
        if audio_playback and audio_playback != "none":
            from ultragrid_tpu.audio.playback import initialize_audio_playback
            from ultragrid_tpu.net.audio_rx import AudioRxState

            self.audio_playback = initialize_audio_playback(audio_playback)
            self.audio_session = RtpSession(addr=mcast_addr, rx_port=rx_port + 2,
                                            tx_port=0,
                                            force_ip_version=force_ip_version)
            # --audio-delay: positive delays audio, negative delays video
            # (ref: set_audio_delay host.cpp:1019-1024 -> per-medium playout
            # offsets, rtp_common.c:320-321)
            self.audio_pbuf = PlayoutBuffer(
                playout_delay + max(audio_delay_ms, 0) / 1000.0)
            self.audio_rx = AudioRxState()
            self._audio_desc = None
        # --param pbuf-delay=<ms> overrides the 32 ms default
        # (ref: pbuf.c:191 + the pbuf-delay param)
        from ultragrid_tpu.utils.params import get_commandline_param

        pd = get_commandline_param("pbuf-delay")
        if pd is not None:
            playout_delay = float(pd) / 1000.0
            if self.audio_playback is not None:
                self.audio_pbuf.playout_delay = (
                    playout_delay + max(audio_delay_ms, 0) / 1000.0)
        self._base_playout = playout_delay
        self.volume = 1.0  # runtime audio gain (control socket / keyboard)
        self.muted = False
        self.pbuf = PlayoutBuffer(
            playout_delay + max(-audio_delay_ms, 0) / 1000.0)
        crypto = None
        if encryption:
            from ultragrid_tpu.utils.crypto import PacketCrypto

            crypto = PacketCrypto(encryption)
        self.rx_state = VideoRxState(decryption=crypto)
        if self.audio_playback is not None:
            self.audio_rx.decryption = crypto
        self.frame_limit = frame_limit
        self.timeout = timeout
        self.should_exit = False  # external stop (ug_input, embedding)
        self.frames_displayed = 0
        self._decompress = None
        self._decomp_out: Optional[Codec] = None
        self._decoder = None
        self._decoder_out: Optional[Codec] = None
        self._display_desc = None

    # -- stage 1: packet reassembly (runs on the rx thread) ---------------

    def _framebuffer_provider(self, desc):
        """Display-owned framebuffer for the LINE_DECODER path: only when
        the display accepts the network codec natively and no postprocess /
        tile merge sits between (ref: video_decoders.cpp:1707-1796)."""
        from ultragrid_tpu.types import is_codec_opaque

        if (is_codec_opaque(desc.color_spec)
                or desc.tile_count > 1
                or self.mode.x * self.mode.y > 1
                or self.postprocess_chain.filters
                or desc.color_spec not in self.display.get_property_codecs()):
            return None
        if self._display_desc != desc:
            self.display.reconfigure(desc)
            self._display_desc = desc
        return self.display.get_frame()

    def _reassemble_cb(self, node) -> bool:
        """pbuf decode callback: stage-1 reassembly only, then hand off to
        the fec thread (ref: decode_video_frame -> fec_queue push,
        video_decoders.cpp:1862)."""
        with profiler.zone("rx.reassemble"):
            out = self.rx_state.reassemble(node)
        if out is None:
            return False
        try:
            self._fec_q.put(out, timeout=1.0)
        except queue.Full:
            # the reference warns "your computer may be too slow" when the
            # decode pipeline cannot keep up (video_decoders.cpp:1845-1867)
            log.warning("decode pipeline too slow, dropping frame")
        return True

    # -- stage 2: FEC thread ---------------------------------------------

    def _fec_thread(self) -> None:
        from ultragrid_tpu.net.video_rx import FecJob

        while True:
            job = self._fec_q.get()
            if job is None:
                self._decomp_q.put(None)
                return
            if isinstance(job, FecJob):
                with profiler.zone("rx.fec"):
                    frame = self.rx_state.decode_fec_job(job)
                if frame is None:
                    continue
            else:
                frame = job
            try:
                self._decomp_q.put(frame, timeout=1.0)
            except queue.Full:
                log.warning("decompress queue full, dropping frame")

    # -- stage 3: decompress + display thread ----------------------------

    def _decompress_thread(self) -> None:
        while True:
            frame = self._decomp_q.get()
            if frame is None:
                return
            try:
                self._handle_frame(frame)
            except Exception as exc:  # noqa: BLE001 - drop, don't die
                log.warning(f"frame handling failed: {exc}")

    def _handle_frame(self, frame) -> bool:
        if frame.callbacks.get("display_owned"):
            # LINE_DECODER fast path: packets were written straight into
            # this display-owned buffer; show it as-is.  Holes from lost
            # packets keep the previous frame's pixels — exactly the
            # reference's LINE_DECODER, which zero-fills only the buffered
            # path (video_decoders.cpp:1828: `if (decoder_type !=
            # LINE_DECODER)`)
            with profiler.zone("rx.display"):
                self.display.put_frame(frame)
            self.display.recycle(frame)
            self.frames_displayed += 1
            return True
        if frame.desc.tile_count > 1:
            from ultragrid_tpu.utils.tiling import vf_merge_tiles

            if self.mode.x * self.mode.y == frame.desc.tile_count:
                frame = vf_merge_tiles(frame, self.mode.x, self.mode.y)
            else:
                # mode unknown: merge as a horizontal strip
                frame = vf_merge_tiles(frame, frame.desc.tile_count, 1)
        # decompress if the codec is opaque (JPEG/DXT...) — unless the
        # display takes it natively (ref: RTDXT -> gl display renders DXT
        # as compressed textures without a CPU decode)
        if (is_codec_opaque(frame.desc.color_spec)
                and frame.desc.color_spec not in self.display.get_property_codecs()):
            if self._decompress is None or frame.desc.color_spec != getattr(self, "_comp_codec", None):
                codecs = self.display.get_property_codecs()
                self._decompress, self._decomp_out = decompress_init(
                    frame.desc.color_spec, codecs
                )
                self._comp_codec = frame.desc.color_spec
                if self._decompress is None:
                    log.error(f"no decompressor for {frame.desc.color_spec.name}")
                    return False
            try:
                with profiler.zone("rx.decompress"):
                    frame = self._decompress.decompress(frame, self._decomp_out)
            except Exception as exc:  # corrupt bitstream from an incomplete frame
                # the reference drops frames whose decompression fails rather
                # than tearing the session down (video_decoders.cpp decompress
                # error path); incomplete frames are passed on zero-filled and
                # may be undecodable
                log.warning(f"decompress failed, dropping frame: {exc}")
                return False
            if frame is None:
                return False
        # pixel format conversion to display codec if needed
        codecs = self.display.get_property_codecs()
        if frame.desc.color_spec not in codecs:
            if self._decoder is None or frame.desc.color_spec != getattr(self, "_conv_in", None):
                self._decoder, self._decoder_out = pixfmt.get_best_decoder_from(
                    frame.desc.color_spec, codecs
                )
                self._conv_in = frame.desc.color_spec
            if self._decoder is None:
                log.error(f"cannot convert {frame.desc.color_spec.name} for display")
                return False
            data = pixfmt.convert_frame(
                frame.data, frame.desc.width, frame.desc.color_spec, self._decoder_out
            )
            frame = VideoFrame(frame.desc.with_(color_spec=self._decoder_out), [data])
        with profiler.zone("rx.postprocess"):
            out = self.postprocess_chain.apply(frame)
        if out is None:
            return False
        # postprocess may fan one frame out into several (double_framerate)
        for fr in out if isinstance(out, list) else [out]:
            if self._display_desc != fr.desc:
                self.display.reconfigure(fr.desc)
                self._display_desc = fr.desc
            with profiler.zone("rx.display"):
                self.display.put_frame(fr)
            # presentation done: hand the buffer back to the display pool
            # (ref: vf_recycle + frame pool, video_frame_pool.h:49)
            self.display.recycle(fr)
            self.frames_displayed += 1
        return True

    def _handle_audio(self, node) -> bool:
        frame = self.audio_rx.decode_frame(node)
        if frame is None:
            return False
        if self._audio_desc != frame.desc:
            self.audio_playback.reconfigure(frame.desc)
            self._audio_desc = frame.desc
        if self.control is not None:
            # volume stats for astat clients (ref: astat.cpp stats line)
            from ultragrid_tpu.audio.volume import format_stats_line

            self.control.report_stats(format_stats_line("ARECV", frame))
        frame = self._scale_audio(frame)
        if self.echo is not None:  # far-end feed for AEC (ref: echo_play)
            self.echo.play(frame)
        self.audio_playback.put_frame(frame)
        return True

    def _scale_audio(self, frame):
        """--audio-scale factor|auto|none plus runtime volume/mute
        (ref: OPT_AUDIO_SCALE + volume control commands)."""
        vol = 0.0 if self.muted else self.volume
        if self.audio_scale in (None, "", "none") and vol == 1.0:
            return frame
        import numpy as np

        samples = frame.samples_float()
        if self.audio_scale == "auto":
            peak = float(np.abs(samples).max()) or 1.0
            # follow the running peak toward full scale, limited slew
            self._agc_gain = min(
                getattr(self, "_agc_gain", 1.0) * 1.02, 0.95 / peak)
            gain = self._agc_gain
        elif self.audio_scale in (None, "", "none"):
            gain = 1.0
        else:
            gain = float(self.audio_scale)
        gain *= vol
        from ultragrid_tpu.audio.types import AudioFrame

        out = AudioFrame.from_float(frame.desc,
                                    np.clip(samples * gain, -1.0, 1.0))
        out.timestamp = getattr(frame, "timestamp", None)
        return out

    def run(self) -> int:
        """Receiver as the reference's 3-stage pipeline: rx thread (packet
        drain + reassembly) -> fec thread -> decompress/display thread with
        bounded queues (ref: video_decoders.cpp:46-93,423,623).  A dedicated
        recv thread drains the socket with recvmmsg batches (ref: udp_reader
        thread net_udp.c:163-187) so long decode calls never back up the
        kernel socket buffer."""
        start = time.monotonic()
        idle_since = time.monotonic()
        # C fast path: recvmmsg + RTP/payload parse + frame scatter in C,
        # frame-granularity gating here (net/vrx_fast.py); packets the C
        # layer does not handle flow through the ordinary pbuf path below
        from ultragrid_tpu.utils.params import get_commandline_param

        fast = None
        if (get_commandline_param("vrx-fast") or "auto") != "off":
            try:
                from ultragrid_tpu.net.vrx_fast import FastVideoRx

                fast = FastVideoRx(
                    self.session, self.rx_state,
                    framebuffer_provider=self._framebuffer_provider)
            except Exception as e:  # noqa: BLE001 — no cc, etc.
                log.debug(f"fast rx path unavailable: {e}")
        self._fast = fast
        if fast is None:
            self.session.start_recv_thread()
        self._fec_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._decomp_q: "queue.Queue" = queue.Queue(maxsize=2)
        self.rx_state.framebuffer_provider = self._framebuffer_provider
        fec_t = threading.Thread(target=self._fec_thread, name="fec", daemon=True)
        dec_t = threading.Thread(target=self._decompress_thread, name="decompress", daemon=True)
        fec_t.start()
        dec_t.start()
        while True:
            if self.should_exit:
                break
            if self.frame_limit is not None and self.frames_displayed >= self.frame_limit:
                break
            if self.timeout is not None and time.monotonic() - start > self.timeout:
                break
            if fast is not None:
                before = self.session.packets_received
                pkts = fast.drain(timeout=0.0001)
                now = time.monotonic()
                got_any = self.session.packets_received != before
                for pkt in pkts:  # slow-path packets -> pbuf as usual
                    self.pbuf.insert(pkt)
                self.pbuf.decode(now, self._reassemble_cb)
                self.pbuf.remove_old(now)
                with profiler.zone("rx.reassemble"):
                    ready = fast.poll(now, self.pbuf.playout_delay)
                for out in ready:
                    try:
                        self._fec_q.put(out, timeout=1.0)
                    except queue.Full:
                        log.warning("decode pipeline too slow, dropping frame")
                pkt = True if got_any else None  # idle detection below
                if got_any:
                    idle_since = now
            else:
                # batch-granularity drain: one queue op per recvmmsg batch
                pkts = self.session.recv_many(timeout=0.0001, max_pkts=512)
                now = time.monotonic()
                insert = self.pbuf.insert
                for pkt in pkts:
                    insert(pkt)
                if pkts:
                    idle_since = now
                pkt = pkts[-1] if pkts else None  # idle detection below
                self.pbuf.decode(now, self._reassemble_cb)
                self.pbuf.remove_old(now)
            if self.audio_playback is not None:
                apkts = self.audio_session.recv_many(timeout=0.0001, max_pkts=64)
                for apkt in apkts:
                    self.audio_pbuf.insert(apkt)
                if apkts:
                    idle_since = now
                self.audio_pbuf.decode(now, self._handle_audio)
                self.audio_pbuf.remove_old(now)
            if pkt is None and now - idle_since > 0.002:
                time.sleep(0.001)  # avoid busy-spin when idle
        self.session.close()
        if fast is not None:
            fast.close()
        self._fec_q.put(None)  # poison pill cascades through the stages
        fec_t.join(timeout=5)
        dec_t.join(timeout=5)
        if self.audio_playback is not None:
            self.audio_session.close()
            self.audio_playback.done()
        self.display.put_frame(None)
        self.display.done()  # join display worker threads cleanly
        return self.frames_displayed


def run_receiver(args) -> int:
    # live sessions always get a control socket + keyboard, like the
    # reference (ref: control_init + keyboard start, main.cpp:1288-1306)
    from ultragrid_tpu.modules.messaging import Module

    root = Module("root")
    control = None
    control_port = getattr(args, "control_port", None)
    if control_port is not None:
        from ultragrid_tpu.utils.control_socket import ControlServer

        try:
            control = ControlServer(root, control_port)
            log.notice(f"control socket on 127.0.0.1:{control.port}")
        except OSError as e:
            log.warning(f"control socket unavailable: {e}")
    receiver = VideoReceiver(
        display_spec=args.display,
        rx_port=int(str(args.ports).split(":")[0]),
        frame_limit=args.frames,
        postprocess=getattr(args, "postprocess", ""),
        audio_playback=getattr(args, "audio_playback", None),
        encryption=getattr(args, "encryption", None),
        mode=getattr(args, "mode", "normal"),
        control=control,
        # receiver-mode `uv -d gl 239.x.y.z` joins the multicast group
        mcast_addr=getattr(args, "host", None),
        force_ip_version=getattr(args, "force_ip_version", 0),
        root=root,
        mcast_if=getattr(args, "mcast_if", None),
        audio_delay_ms=getattr(args, "audio_delay", 0) or 0,
        audio_scale=getattr(args, "audio_scale", None),
    )
    from ultragrid_tpu.utils.keyboard import KeyboardControl

    def _stop():
        receiver.should_exit = True

    kb = KeyboardControl(root, on_exit=_stop)
    kb.start()  # no-op unless stdin is a tty
    n = receiver.run()
    if control is not None:
        control.close()
    log.notice(f"displayed {n} frames")
    return 0
