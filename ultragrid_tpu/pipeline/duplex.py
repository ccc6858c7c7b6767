"""Full-duplex session: send AND receive in one process.

The reference's normal videoconferencing invocation ``uv -t <cap> -d <disp>
<peer>`` runs the capture/compress/tx chain and the rx/decode/display chain
simultaneously (ref: capture thread main.cpp:347-397 + receiver thread
rxtx.cpp:153 in the same process, sharing the module tree, control socket
and keyboard).  This module composes the existing VideoSender and
VideoReceiver the same way: one root module, one control socket, receiver
on the rx port, sender to peer:tx_port.
"""

from __future__ import annotations

import threading

from ultragrid_tpu.utils.log import Logger

log = Logger("duplex")


def run_duplex(args) -> int:
    from ultragrid_tpu.net.transmit import parse_bitrate
    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    parts = [p for p in str(args.ports).split(":") if p]
    rx_port = int(parts[0])
    tx_port = int(parts[1]) if len(parts) > 1 else rx_port

    bitrate, bitrate_fixed = parse_bitrate(getattr(args, "limit_bitrate", "auto"))
    sender = VideoSender(
        capture_spec=args.capture,
        host=args.host,
        compress_spec=args.compress,
        fec_spec=args.fec,
        tx_port=tx_port,
        mtu=args.mtu,
        frame_limit=args.frames,
        capture_filter=getattr(args, "capture_filter", ""),
        audio_capture=getattr(args, "audio_capture", None),
        audio_codec=getattr(args, "audio_codec", "PCM"),
        audio_fec=getattr(args, "audio_fec", "none"),
        audio_channel_map=getattr(args, "audio_channel_map", None),
        audio_filter=getattr(args, "audio_filter", None),
        encryption=getattr(args, "encryption", None),
        record=getattr(args, "record", None),
        mode=getattr(args, "mode", "normal"),
        rtp_standard=getattr(args, "rtp_standard", False),
        control_port=getattr(args, "control_port", None),
        start_paused=getattr(args, "start_paused", False),
        bitrate=bitrate,
        bitrate_fixed=bitrate_fixed,
        ttl=getattr(args, "ttl", -1) if getattr(args, "ttl", -1) >= 0 else 255,
        force_ip_version=getattr(args, "force_ip_version", 0),
        mcast_if=getattr(args, "mcast_if", None),
        audio_host=getattr(args, "audio_host", None),
    )
    receiver = VideoReceiver(
        display_spec=args.display,
        rx_port=rx_port,
        postprocess=getattr(args, "postprocess", ""),
        audio_playback=getattr(args, "audio_playback", None),
        encryption=getattr(args, "encryption", None),
        mode=getattr(args, "mode", "normal"),
        control=sender.control,  # ONE control socket for the whole session
        mcast_addr=args.host,  # joins the group iff the peer addr is mcast
        force_ip_version=getattr(args, "force_ip_version", 0),
        root=sender.root,  # shared module tree: runtime msgs reach both
        mcast_if=getattr(args, "mcast_if", None),
        audio_delay_ms=getattr(args, "audio_delay", 0) or 0,
        audio_scale=getattr(args, "audio_scale", None),
    )

    if (getattr(args, "echo_cancellation", False)
            and sender.audio is not None
            and receiver.audio_playback is not None):
        # AEC: receiver playback = far end, sender capture = near end
        # (ref: echo_play/echo_cancel, src/audio/echo.cpp)
        from ultragrid_tpu.audio.echo import EchoCanceller

        ec = EchoCanceller()
        sender.echo = ec
        receiver.echo = ec
        log.notice("echo cancellation active")

    rx_thread = threading.Thread(target=receiver.run, name="rx-pipeline",
                                 daemon=True)
    rx_thread.start()
    try:
        n = sender.run()
        log.notice(f"sent {n} frames")
        # drain window: let in-flight packets clear the playout buffer before
        # stopping the receive chain (ref: pbuf playout delay, pbuf.c:191)
        import time

        deadline = time.monotonic() + 1.0
        while (time.monotonic() < deadline
               and receiver.frames_displayed < (n or 0)):
            time.sleep(0.05)
    finally:
        receiver.should_exit = True
        rx_thread.join(timeout=10)
    log.notice(f"displayed {receiver.frames_displayed} frames")
    return 0
