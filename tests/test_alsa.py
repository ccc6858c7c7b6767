"""ALSA PCM modules against an in-process fake kernel PCM device.

The fake emulates the hw_params/sw_params/readi/writei ioctl surface of
/dev/snd/pcmC0D0{c,p} (sound/asound.h), including an injected xrun so the
EPIPE re-prepare recovery path runs.
"""

from __future__ import annotations

import ctypes
import errno
import os

import numpy as np
import pytest

import ultragrid_tpu.audio.alsa as alsa
from ultragrid_tpu.audio.types import AudioDesc, AudioFrame


class FakePcm:
    def __init__(self, stream: str = "c", rate: int = 48000):
        self.stream = stream
        self.rate = rate
        self.fd = os.open("/dev/null", os.O_RDWR)
        self.state = "open"
        self.read_counter = 0
        self.written = bytearray()
        self.xrun_after = None  # inject EPIPE on the n-th xfer
        self.xfers = 0
        self.prepares = 0
        self.hw = None

    def open(self, path, flags):
        assert path == f"/dev/snd/pcmC0D0{self.stream}", path
        return self.fd

    def ioctl(self, fd, req, arg=0, mutate=True):
        assert fd == self.fd
        if req == alsa.SNDRV_PCM_IOCTL_HW_PARAMS:
            # the kernel chooses: honor requested rate/channels, pick the
            # lowest requested period size, derive buffer = 4 periods
            ch = arg.intervals[alsa.I_CHANNELS].min
            rate = arg.intervals[alsa.I_RATE].min
            psize = arg.intervals[alsa.I_PERIOD_SIZE].min
            if rate == 44100 and self.rate != 44100:
                raise OSError(errno.EINVAL, "rate not supported")
            arg.intervals[alsa.I_RATE].min = arg.intervals[alsa.I_RATE].max = rate
            arg.intervals[alsa.I_PERIOD_SIZE].max = psize
            bsz = alsa.I_BUFFER_SIZE
            arg.intervals[bsz].min = arg.intervals[bsz].max = psize * 4
            self.hw = (rate, ch, psize)
            self.state = "setup"
        elif req == alsa.SNDRV_PCM_IOCTL_SW_PARAMS:
            assert arg.boundary > 0
            self.sw = (arg.start_threshold, arg.stop_threshold)
        elif req == alsa.SNDRV_PCM_IOCTL_PREPARE:
            self.state = "prepared"
            self.prepares += 1
        elif req == alsa.SNDRV_PCM_IOCTL_DRAIN:
            pass
        elif req in (alsa.SNDRV_PCM_IOCTL_READI_FRAMES,
                     alsa.SNDRV_PCM_IOCTL_WRITEI_FRAMES):
            self.xfers += 1
            if self.xrun_after is not None and self.xfers > self.xrun_after:
                self.xrun_after = None
                self.state = "xrun"
                raise OSError(errno.EPIPE, "xrun")
            assert self.state == "prepared", self.state
            _, ch, _ = self.hw
            nbytes = arg.frames * ch * 2
            if req == alsa.SNDRV_PCM_IOCTL_READI_FRAMES:
                # deterministic s16 ramp so content can be asserted
                data = (np.arange(self.read_counter,
                                  self.read_counter + arg.frames * ch,
                                  dtype=np.int16)).tobytes()
                self.read_counter += arg.frames * ch
                ctypes.memmove(arg.buf, data, nbytes)
            else:
                self.written += ctypes.string_at(arg.buf, nbytes)
            arg.result = arg.frames
        else:
            raise OSError(errno.EINVAL, f"unexpected ioctl 0x{req:08x}")
        return 0


@pytest.fixture()
def fake_cap(monkeypatch):
    pcm = FakePcm("c")
    monkeypatch.setattr(alsa, "_ioctl", pcm.ioctl)
    monkeypatch.setattr(alsa, "_open", pcm.open)
    monkeypatch.setattr(alsa, "probe_devices",
                        lambda s: [f"/dev/snd/pcmC0D0{s}"])
    yield pcm


@pytest.fixture()
def fake_play(monkeypatch):
    pcm = FakePcm("p")
    monkeypatch.setattr(alsa, "_ioctl", pcm.ioctl)
    monkeypatch.setattr(alsa, "_open", pcm.open)
    monkeypatch.setattr(alsa, "probe_devices",
                        lambda s: [f"/dev/snd/pcmC0D0{s}"])
    yield pcm


def test_capture_negotiate_and_read(fake_cap):
    cap = alsa.AlsaAudioCapture("frames=64")
    assert fake_cap.hw == (48000, 2, 64)
    assert cap.desc.sample_rate == 48000
    start_threshold, stop_threshold = fake_cap.sw
    assert start_threshold == 1  # capture starts on first read
    assert stop_threshold == 64 * 4

    f = cap.read(32)
    assert f is not None and f.sample_count == 32
    # interleaved ramp de-interleaves to even/odd sequences
    left = f.channels[0].view(np.int16)
    right = f.channels[1].view(np.int16)
    assert list(left[:4]) == [0, 2, 4, 6]
    assert list(right[:4]) == [1, 3, 5, 7]
    cap.done()


def test_capture_xrun_recovery(fake_cap):
    cap = alsa.AlsaAudioCapture("")
    fake_cap.xrun_after = 0  # next xfer raises EPIPE
    f = cap.read(16)
    assert f is not None and f.sample_count == 16
    assert fake_cap.prepares == 2  # init + recovery re-prepare
    cap.done()


def test_playback_roundtrip(fake_play):
    pb = alsa.AlsaAudioPlayback("dev=hw:0,0:frames=32")
    desc = AudioDesc(bps=2, sample_rate=48000, ch_count=2)
    pb.reconfigure(desc)
    start_threshold, _ = fake_play.sw
    assert start_threshold == 32  # playback starts once a period is queued

    samples = np.arange(2 * 100, dtype=np.int16)
    frame = AudioFrame.from_interleaved(
        desc, samples.view(np.uint8))
    pb.put_frame(frame)
    assert np.array_equal(
        np.frombuffer(bytes(fake_play.written), np.int16), samples)
    pb.done()


def test_rate_refusal(fake_cap):
    with pytest.raises(RuntimeError, match="hw_params refused"):
        alsa.AlsaAudioCapture("", desc=AudioDesc(sample_rate=44100))


def test_probe_failure(monkeypatch):
    monkeypatch.setattr(alsa, "probe_devices", lambda s: [])
    with pytest.raises(RuntimeError, match="no /dev/snd"):
        alsa.AlsaAudioCapture("")
    with pytest.raises(RuntimeError, match="no /dev/snd"):
        alsa.AlsaAudioPlayback("")


def test_device_parsing():
    assert alsa.parse_device("hw:1,2") == (1, 2)
    assert alsa.parse_device("hw:3") == (3, 0)
    assert alsa.parse_device("default") == (0, 0)
