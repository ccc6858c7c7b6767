"""CABAC decode conformance: the own decoder vs libavcodec on libx264
Main/High-profile streams (round-4 verdict ask #2).

Streams are encoded WITHOUT forcing baseline OR disabling the 8x8
transform: profile=main / profile=high at libx264 defaults (CABAC,
8x8dct on — what real-world encoders emit).  Envelope per
ops/h264_cabac.py: progressive I/P, 4x4 + 8x8 transforms, multi-ref;
B slices and weighted prediction raise UnsupportedStream (tested).
"""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def _lavc():
    from ultragrid_tpu.modules.lavc import LavcCompress, LavcDecompress, lavc_available

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    return LavcCompress, LavcDecompress


def _check_exact(bs, w, h, y, cb, cr, lavc_dec, tag=""):
    ref = lavc_dec.decompress(
        VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                   [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
    if ref is None:
        pytest.skip("no H.264 decoder available")
    uy = np.asarray(ref.data)
    assert np.array_equal(uy[:, 1::2], y), f"luma {tag}"
    assert np.array_equal(uy[0::2, 0::4], cb), f"cb {tag}"
    assert np.array_equal(uy[0::2, 2::4], cr), f"cr {tag}"


def _moving(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = np.clip(rng.normal(128, 40, (h + 32, w + 32)), 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        yv = base[8 + t:8 + t + h, 8 + 2 * t:8 + 2 * t + w]
        f = np.empty((h, 2 * w), np.uint8)
        f[:, 1::2] = yv
        f[:, 0::2] = 128
        frames.append(f)
    return frames


def test_cabac_intra_sample_exact_matrix():
    """Main-profile (CABAC) intra streams decode sample-exact: content x
    size x QP matrix with libx264 defaults (trellis ON, deblocking ON)."""
    LavcCompress, LavcDecompress = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    rng = np.random.default_rng(0)
    xx, yy_ = np.meshgrid(np.arange(64), np.arange(48))
    cases = [
        ("noise", 64, 48, 26), ("noise", 64, 48, 38),
        ("diag", 64, 48, 30), ("grad", 32, 32, 24), ("grad", 64, 48, 34),
    ]
    for kind, w, h, qp in cases:
        data = np.empty((h, 2 * w), np.uint8)
        if kind == "noise":
            yv = rng.integers(0, 256, (h, w))
        elif kind == "diag":
            yv = 128 + 60 * (((xx[:h, :w] - yy_[:h, :w]) % 4) < 2)
        else:
            yv = np.clip(np.arange(w)[None, :] * 3 + 100
                         + np.arange(h)[:, None] * 2, 0, 255)
        data[:, 1::2] = yv.astype(np.uint8)
        data[:, 0::2] = np.clip(rng.integers(100, 156, (h, w)), 0, 255).astype(np.uint8)
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [data])
        comp = LavcCompress(
            f"codec=H.264:encoder=libx264:profile=main:qp={qp}:g=1:aq-mode=0")
        bs = bytes(np.asarray(comp.compress(frame).tiles[0]).reshape(-1))
        y, cb, cr = StreamDecoder().decode_stream(bs)[0]
        _check_exact(bs, w, h, y, cb, cr, LavcDecompress(), f"{kind} {qp}")


def test_cabac_inter_gop_sample_exact():
    """Main-profile CABAC IDR+P GOPs (skip, partitions down to 4x4, mvd,
    per-MB intra, deblocking) decode sample-exact frame by frame."""
    LavcCompress, LavcDecompress = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    w, h = 64, 48
    frames = _moving(w, h, 8)
    comp = LavcCompress(
        "codec=H.264:encoder=libx264:profile=main:qp=30:g=8:aq-mode=0:"
        "x264opts=bframes=0:weightp=0")
    dec = StreamDecoder()
    lavc_dec = LavcDecompress()
    for i, f in enumerate(frames):
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f])
        bs = bytes(np.asarray(comp.compress(frame).tiles[0]).reshape(-1))
        y, cb, cr = dec.decode_au(bs)
        _check_exact(bs, w, h, y, cb, cr, lavc_dec, f"frame {i}")


def test_cabac_high_profile_multiref_sample_exact():
    """High-profile at libx264 DEFAULTS (8x8 transform ON) with 3
    reference frames: the CABAC ref_idx path + sliding-window DPB +
    transform_size_8x8_flag, sample-exact."""
    LavcCompress, LavcDecompress = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    w, h = 64, 48
    frames = _moving(w, h, 6, seed=3)
    comp = LavcCompress(
        "codec=H.264:encoder=libx264:profile=high:qp=28:g=10:aq-mode=0:"
        "x264opts=bframes=0:weightp=0:ref=3")
    dec = StreamDecoder()
    lavc_dec = LavcDecompress()
    for i, f in enumerate(frames):
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f])
        bs = bytes(np.asarray(comp.compress(frame).tiles[0]).reshape(-1))
        y, cb, cr = dec.decode_au(bs)
        _check_exact(bs, w, h, y, cb, cr, lavc_dec, f"frame {i}")


def test_high_8x8_transform_dense_matrix():
    """High-profile 8x8-transform residuals, BOTH entropy coders, dense
    (qp24) and sparse (qp38), I-only and IP GOPs — the exact matrix that
    caught the round-5 LAST8_INC transcription error (sparse 8x8 blocks
    never exercise scan positions >= 16 of the last-significant map)."""
    LavcCompress, LavcDecompress = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    lavc_dec = LavcDecompress()
    for kind in ("noise", "smooth"):
        for qp in (24, 38):
            for coder in ("", ":coder=0"):
                for gop, n in ((1, 2), (6, 6)):
                    w, h = 64, 48
                    rng = np.random.default_rng(qp)
                    if kind == "smooth":
                        xx, yy_ = np.meshgrid(np.arange(w + 32), np.arange(h + 32))
                        base = np.clip(
                            128 + 60 * np.sin(xx / 11.0) * np.cos(yy_ / 13.0)
                            + rng.normal(0, 3, (h + 32, w + 32)), 0, 255
                        ).astype(np.uint8)
                        frames = []
                        for t in range(n):
                            yv = base[8 + t:8 + t + h, 8 + 2 * t:8 + 2 * t + w]
                            f = np.empty((h, 2 * w), np.uint8)
                            f[:, 1::2] = yv
                            f[:, 0::2] = 128
                            frames.append(f)
                    else:
                        frames = _moving(w, h, n, seed=qp)
                    comp = LavcCompress(
                        f"codec=H.264:encoder=libx264:profile=high:qp={qp}:"
                        f"g={gop}:aq-mode=0:x264opts=bframes=0:weightp=0"
                        + coder)
                    dec = StreamDecoder()
                    for i, f in enumerate(frames):
                        bs = bytes(np.asarray(comp.compress(VideoFrame(
                            VideoDesc(w, h, Codec.UYVY, 30.0), [f])
                        ).tiles[0]).reshape(-1))
                        y, cb, cr = dec.decode_au(bs)
                        _check_exact(bs, w, h, y, cb, cr, lavc_dec,
                                     f"{kind} qp{qp} {coder or 'cabac'} "
                                     f"g{gop} fr{i}")


def test_cabac_8x8_ctx_tables_anchored():
    """The Table 9-43 8x8 significance/last maps carry the published
    constants: byte-verified against BOTH system codec binaries by the
    checked-in extraction harness (also catches future drift)."""
    from ultragrid_tpu.tools.extract_cabac_tables import main as extract_main

    assert extract_main() == 0


def _fading(w, h, n, seed=1):
    """Global fades — the content x264's smart weightp was built for."""
    rng = np.random.default_rng(seed)
    base = np.clip(rng.normal(140, 40, (h, w)), 0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        gain = 4 + abs(n // 2 - t)
        yv = (np.roll(base, 3 * t, axis=1).astype(np.int32) * gain
              // (n // 2 + 4)).clip(0, 255).astype(np.uint8)
        f = np.empty((h, 2 * w), np.uint8)
        f[:, 1::2] = yv
        f[:, 0::2] = rng.integers(100, 156, (h, w), np.uint8)
        frames.append(f)
    return frames


@pytest.mark.parametrize("tag, spec", [
    ("cavlc-wp1", "profile=main:coder=0:weightp=1"),
    ("cavlc-wp2", "profile=high:coder=0:weightp=2"),
    ("cabac-wp1", "profile=main:weightp=1"),
    ("cabac-wp2", "profile=high:weightp=2"),
    ("cabac-wp2-mr", "profile=high:weightp=2:ref=3"),
])
def test_weighted_prediction_sample_exact(tag, spec):
    """Explicit weighted P prediction (7.3.3.2 / 8.4.2.3.2) incl. x264's
    smart weightp=2, which DUPLICATES the reference via ref-list
    modification (8.2.4.3.1) to bind two weight sets to one picture —
    fades decode sample-exact, both entropy coders."""
    LavcCompress, LavcDecompress = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    w, h = 64, 48
    frames = _fading(w, h, 8)
    comp = LavcCompress(
        f"codec=H.264:encoder=libx264:qp=24:g=8:aq-mode=0:bf=0:{spec}")
    dec = StreamDecoder()
    lavc_dec = LavcDecompress()
    for i, f in enumerate(frames):
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f])
        bs = bytes(np.asarray(comp.compress(frame).tiles[0]).reshape(-1))
        y, cb, cr = dec.decode_au(bs)
        _check_exact(bs, w, h, y, cb, cr, lavc_dec, f"{tag} frame {i}")


def test_cabac_unsupported_features_raise_cleanly():
    """Outside-envelope features fail with UnsupportedStream (so the live
    decompress path can fall back to lavc), never garbage or crash."""
    LavcCompress, _ = _lavc()
    from ultragrid_tpu.ops.h264_dec import StreamDecoder, UnsupportedStream

    w, h = 64, 48
    specs = [
        # temporal direct B (we implement spatial only, the x264 default)
        "codec=H.264:encoder=libx264:profile=main:qp=28:g=10:aq-mode=0:"
        "bf=2:x264opts=direct=temporal",
        # scaling lists
        "codec=H.264:encoder=libx264:profile=high:qp=28:g=10:aq-mode=0:"
        "bf=0:weightp=0:x264opts=cqm=jvt",
        # interlaced coding
        "codec=H.264:encoder=libx264:profile=high:qp=28:g=10:aq-mode=0:"
        "bf=0:weightp=0:x264opts=tff=1",
    ]
    for spec in specs:
        comp = LavcCompress(spec)
        dec = StreamDecoder()
        # enough frames that the B-frame lookahead actually flushes B AUs
        # (weighted P no longer raises, so the B NAL itself must)
        with pytest.raises(UnsupportedStream):
            for f in _moving(w, h, 12, seed=1):
                out = comp.compress(
                    VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
                if out is None:  # encoder latency (B-frame lookahead)
                    continue
                bs = bytes(np.asarray(out.tiles[0]).reshape(-1))
                dec.decode_au(bs)


def test_cabac_tables_anchored():
    """The arithmetic-decoder tables carry the ISO values: spot-check
    entries of Table 9-44/9-45 and the Table 9-12 leading context inits
    (full validation = the sample-exact decodes above; the repo tables were
    extracted/verified against the system libavcodec/libx264 binaries)."""
    from ultragrid_tpu.ops.h264_cabac_tables import (
        CONTEXT_INIT, RANGE_TAB_LPS, TRANS_IDX_LPS)

    assert CONTEXT_INIT.shape == (4, 1024, 2)
    # Table 9-12 leading mb_type contexts, identical across all 4 tables
    assert CONTEXT_INIT[0, :3].tolist() == [[20, -15], [2, 54], [3, 74]]
    assert all((CONTEXT_INIT[i, :11] == CONTEXT_INIT[0, :11]).all()
               for i in range(4))
    # Table 9-13 mb_skip_flag P inits distinguish the cabac_init_idc tables
    assert CONTEXT_INIT[1, 11].tolist() == [23, 33]
    assert CONTEXT_INIT[2, 11].tolist() == [22, 25]
    assert CONTEXT_INIT[3, 11].tolist() == [29, 16]
    # Table 9-44 corners + the two entries a faulty transcription broke
    # in round 4 (caught by stream-level desync, then verified against
    # the binaries): rangeTabLPS[31][0] and transIdxLPS[28..30]
    assert RANGE_TAB_LPS[0].tolist() == [128, 176, 208, 240]
    assert RANGE_TAB_LPS[63].tolist() == [2, 2, 2, 2]
    assert RANGE_TAB_LPS[31][0] == 29
    assert TRANS_IDX_LPS[[28, 29, 30]].tolist() == [22, 22, 23]
    assert TRANS_IDX_LPS[63] == 63
