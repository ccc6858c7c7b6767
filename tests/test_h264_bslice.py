"""B-slice decode conformance: the own decoder vs libavcodec on libx264
streams with B frames — the last major envelope gap (round-4 verdict
"own-decoder envelope" item).

Covers: spatial direct (B_Skip / B_Direct_16x16 / B_Direct_8x8 with
8x8 inference), every B partition mode down to 4x4, implicit weighted
bipred (POC-distance weights), the b-pyramid (B frames as references,
managed by MMCO op 1), POC type 0 display reordering, and both entropy
coders.  Outputs are compared in DISPLAY order (decode_au returns None
while the reorder buffer primes; flush() drains it), exactly the
contract libavcodec's own delayed output follows.
"""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def _lavc():
    from ultragrid_tpu.modules.lavc import (LavcCompress, LavcDecompress,
                                            lavc_available)

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    return LavcCompress, LavcDecompress


def _frames(w, h, n, fade=False, seed=1):
    from ultragrid_tpu.utils.pattern import generate_pattern

    rng = np.random.default_rng(seed)
    base = np.asarray(generate_pattern(w, h, Codec.UYVY, "bars"))
    out = []
    for i in range(n):
        f = np.roll(base, i * 4, axis=1).copy()
        if fade:
            g = 4 + abs(n // 2 - i)
            f = (f.astype(np.int32) * g
                 // (n // 2 + 4)).clip(0, 255).astype(np.uint8)
        f[2:10, 2:40] = rng.integers(0, 255, (8, 38), np.uint8)
        out.append(f)
    return out


def _run(spec, frames, w, h):
    """Encode; decode with the own StreamDecoder and lavc; return the
    display-ordered output lists (ours incl. flush)."""
    LavcCompress, LavcDecompress = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    enc = LavcCompress(spec)
    dec = StreamDecoder()
    rd = LavcDecompress()
    ours, refs = [], []
    for f in frames:
        c = enc.compress(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
        if c is None:
            continue
        bs = bytes(np.asarray(c.data))
        got = dec.decode_au(bs)
        if got is not None:
            ours.append(got)
        ref = rd.decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        if ref is not None:
            refs.append(np.asarray(ref.data).copy())
    ours.extend(dec.flush())
    rd.done()
    enc.done()
    return ours, refs


@pytest.mark.parametrize("tag,spec", [
    ("cavlc-b2-nopyr",
     "profile=high:coder=0:bf=2:x264opts=b-pyramid=none"),
    ("cavlc-b3-pyramid", "profile=high:coder=0:bf=3"),
    ("cabac-b2-nopyr", "profile=high:bf=2:x264opts=b-pyramid=none"),
    ("cabac-b3-pyramid", "profile=high:bf=3"),
    ("cabac-b3-multiref", "profile=high:bf=3:ref=3"),
    ("cabac-b3-main", "profile=main:bf=3"),
])
def test_b_slices_sample_exact(tag, spec):
    w, h = 176, 144
    frames = _frames(w, h, 16)
    ours, refs = _run(
        f"codec=H.264:encoder=libx264:qp=24:g=12:aq-mode=0:{spec}",
        frames, w, h)
    n = min(len(ours), len(refs))
    assert n >= 10, f"{tag}: only {n} comparable frames"
    for i in range(n):
        y, cb, cr = ours[i]
        uy = refs[i]
        assert np.array_equal(uy[:, 1::2], y), f"{tag} frame {i} luma"
        assert np.array_equal(uy[0::2, 0::4], cb), f"{tag} frame {i} cb"
        assert np.array_equal(uy[0::2, 2::4], cr), f"{tag} frame {i} cr"


@pytest.mark.parametrize("tag,spec,fade", [
    # implicit weighted bipred earns its keep on fades
    ("cabac-fade-implicit", "profile=high:bf=3:weightp=2", True),
    # every partition mode incl. 4x4 subs in B_8x8
    ("cabac-parts-all", "profile=high:bf=3:x264opts=partitions=all", False),
    # dense residuals + 8x8 transform inside B slices
    ("cabac-dense-q18",
     "profile=high:bf=3:x264opts=b-pyramid=normal", False),
])
def test_b_slices_hard_content(tag, spec, fade):
    w, h = 320, 240
    frames = _frames(w, h, 14, fade=fade, seed=5)
    qp = 18 if "dense" in tag else 24
    ours, refs = _run(
        f"codec=H.264:encoder=libx264:qp={qp}:g=14:aq-mode=0:{spec}",
        frames, w, h)
    n = min(len(ours), len(refs))
    assert n >= 8, f"{tag}: only {n} comparable frames"
    for i in range(n):
        y, cb, cr = ours[i]
        uy = refs[i]
        assert np.array_equal(uy[:, 1::2], y), f"{tag} frame {i} luma"
        assert np.array_equal(uy[0::2, 0::4], cb), f"{tag} frame {i} cb"
        assert np.array_equal(uy[0::2, 2::4], cr), f"{tag} frame {i} cr"


def test_reorder_contract():
    """decode_au returns None exactly while priming (delay = the VUI's
    max_num_reorder_frames) and every frame comes out in display order."""
    w, h = 176, 144
    LavcCompress, _ = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    enc = LavcCompress("codec=H.264:encoder=libx264:qp=26:g=12:aq-mode=0:"
                       "profile=high:bf=2:x264opts=b-pyramid=none")
    dec = StreamDecoder()
    outs = []
    nones = 0
    fed = 0
    for f in _frames(w, h, 12):
        c = enc.compress(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
        if c is None:
            continue
        fed += 1
        got = dec.decode_au(bytes(np.asarray(c.data)))
        if got is None:
            nones += 1
        else:
            outs.append(got)
    outs.extend(dec.flush())
    # bf=2 no-pyramid -> VUI reorder = 1: exactly one priming None, and
    # every fed AU comes back out (the flush drains the last one)
    assert nones == 1
    assert len(outs) == fed >= 9
    enc.done()


def test_no_b_streams_keep_zero_delay():
    """P-only streams (and the own encoder's poc_type-2 output) must
    still return a frame for EVERY access unit — no added latency."""
    w, h = 176, 144
    LavcCompress, _ = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    enc = LavcCompress("codec=H.264:encoder=libx264:qp=26:g=6:aq-mode=0:"
                       "bf=0:weightp=0")
    dec = StreamDecoder()
    for f in _frames(w, h, 6):
        c = enc.compress(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
        got = dec.decode_au(bytes(np.asarray(c.data)))
        assert got is not None
    enc.done()
