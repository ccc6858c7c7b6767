"""Own H.264 encoder conformance tests (decoded by libavcodec)."""

import numpy as np
import pytest

from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def _lavc_decode(bs: bytes, w: int, h: int):
    from ultragrid_tpu.modules.lavc import LavcDecompress

    dec = LavcDecompress()
    vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0), [np.frombuffer(bs, np.uint8)])
    out = dec.decompress(vf, Codec.UYVY)
    if out is None:
        pytest.skip("no H.264 decoder available")
    return np.asarray(out.data)[:h, : 2 * w]


def test_pcm_encoder_lossless_roundtrip():
    from ultragrid_tpu.ops.h264 import PcmEncoder, uyvy_to_i420

    w, h = 64, 48
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = PcmEncoder(w, h).encode_uyvy(frame)
    got = _lavc_decode(bs, w, h)
    y0, cb0, cr0 = uyvy_to_i420(frame, w, h)
    assert (got[:, 1::2] == y0).all()
    gcb = got[:, 0::4].astype(np.uint16)
    gcr = got[:, 2::4].astype(np.uint16)
    gcb = ((gcb[0::2] + gcb[1::2] + 1) >> 1).astype(np.uint8)
    gcr = ((gcr[0::2] + gcr[1::2] + 1) >> 1).astype(np.uint8)
    assert (gcb == cb0).all() and (gcr == cr0).all()


def test_pcm_encoder_nonaligned_size_crops():
    from ultragrid_tpu.ops.h264 import PcmEncoder

    w, h = 50, 38  # non-multiple-of-16 -> SPS cropping
    frame = np.random.default_rng(5).integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = PcmEncoder(w, h).encode_uyvy(frame)
    got = _lavc_decode(bs, w, h)
    assert got.shape == (h, 2 * w)


def test_exp_golomb_writer():
    from ultragrid_tpu.ops.h264 import BitWriter

    w = BitWriter()
    for v, bits in ((0, "1"), (1, "010"), (2, "011"), (3, "00100"), (7, "0001000")):
        w2 = BitWriter()
        w2.ue(v)
        w2.u(1, 1)
        w2.byte_align_zero()
        got = "".join(f"{b:08b}" for b in w2.rbsp())
        assert got.startswith(bits), (v, got, bits)
    w.se(0); w.se(1); w.se(-1); w.se(2)
    w.rbsp_trailing()


def test_cavlc_textbook_vector():
    from ultragrid_tpu.ops.h264 import BitWriter, cavlc_block

    w = BitWriter()
    tc = cavlc_block(w, [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8, 0)
    w.byte_align_zero()
    bits = "".join(f"{b:08b}" for b in w.rbsp())
    assert tc == 5
    assert bits.startswith("000010001110010111101101")


@pytest.mark.parametrize("qp", [10, 26, 40])
def test_intra16_conformance_matrix(qp):
    """Noise + gradient content through our Intra16 encoder must decode
    cleanly in libavcodec with QP-appropriate PSNR (catches any CAVLC
    desync, which corrupts everything after the first wrong bit)."""
    import math

    from ultragrid_tpu.ops.h264 import Intra16Encoder, uyvy_to_i420

    w, h = 96, 64
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, (h, 2 * w), dtype=np.uint8),
        (np.mgrid[0:h, 0 : 2 * w][1] % 220 + 10).astype(np.uint8),
    ]
    floor = {10: 40.0, 26: 30.0, 40: 18.0}[qp]
    for frame in frames:
        bs = Intra16Encoder(w, h, qp=qp).encode_uyvy(frame)
        got = _lavc_decode(bytes(bs), w, h)
        y0, _, _ = uyvy_to_i420(frame, w, h)
        gy = got[:, 1::2].astype(np.float64)
        mse = ((gy - y0.astype(np.float64)) ** 2).mean()
        psnr = 10 * math.log10(255 * 255 / max(mse, 1e-9))
        assert psnr > floor, (qp, psnr)
        assert len(bs) < frame.nbytes  # actually compresses


def test_own_h264_end_to_end_rtp():
    """testcard -> OWN H.264 encoder -> RFC 6184 RTP -> receiver decodes
    (via lavc) and displays: the complete loop without FFmpeg encoding."""
    import threading

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 23482
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=2, timeout=60.0)
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    sender = VideoSender(
        "testcard:64:48:30:UYVY", "127.0.0.1", compress_spec="h264:qp=20",
        tx_port=port, frame_limit=4,
    )
    sender.run()
    t.join(timeout=60)
    assert recv.frames_displayed >= 1


def test_vectorized_encoder_bit_identical_to_scalar():
    from ultragrid_tpu.ops.h264 import Intra16Encoder, Intra16EncoderV

    w, h = 96, 64
    rng = np.random.default_rng(1)
    for qp in (10, 26, 40):
        frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
        a = bytes(Intra16Encoder(w, h, qp=qp).encode_uyvy(frame))
        b = bytes(Intra16EncoderV(w, h, qp=qp).encode_uyvy(frame))
        assert a == b


def test_device_encoder_bit_identical():
    """The jnp/TPU encoder (h264_tpu) must produce byte-identical streams
    to the numpy encoder (integer-butterfly transforms keep it exact on
    any backend, including reduced-precision TPU matmul defaults)."""
    from ultragrid_tpu.ops.h264 import Intra16EncoderV
    from ultragrid_tpu.ops.h264_tpu import Intra16EncoderTpu

    w, h = 48, 32
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    a = bytes(Intra16EncoderV(w, h, qp=26).encode_uyvy(frame))
    b = bytes(Intra16EncoderTpu(w, h, qp=26).encode_uyvy(frame))
    assert a == b


def test_own_h264_standards_mode_rtp():
    """Own encoder over RFC 6184 standards mode (PT 96) end to end."""
    import threading

    from ultragrid_tpu.pipeline.receiver import VideoReceiver
    from ultragrid_tpu.pipeline.sender import VideoSender

    port = 23486
    recv = VideoReceiver("dummy", rx_port=port, frame_limit=2, timeout=60.0)
    t = threading.Thread(target=recv.run, daemon=True)
    t.start()
    sender = VideoSender(
        "testcard:64:48:30:UYVY", "127.0.0.1", compress_spec="h264:qp=20",
        tx_port=port, frame_limit=4, rtp_standard=True,
    )
    sender.run()
    t.join(timeout=60)
    assert recv.frames_displayed >= 1


def test_own_decoder_matches_lavc_reconstruction():
    """Decoder-side spec math (CAVLC parse, dequant, inverse transforms,
    reconstructed-neighbor prediction) must agree SAMPLE-EXACTLY with
    libavcodec on own-encoder streams."""
    from ultragrid_tpu.ops.h264 import Intra16EncoderV
    from ultragrid_tpu.ops.h264_dec import IntraDecoder

    w, h = 96, 64
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    for qp in (4, 26, 48):
        bs = bytes(Intra16EncoderV(w, h, qp=qp).encode_uyvy(frame))
        oy, _, _ = IntraDecoder().decode(bs)
        got = _lavc_decode(bs, w, h)
        assert (got[:, 1::2] == oy).all(), qp


def test_own_decoder_pcm_lossless():
    from ultragrid_tpu.ops.h264 import PcmEncoder
    from ultragrid_tpu.ops.h264_dec import IntraDecoder

    w, h = 64, 48
    frame = np.random.default_rng(5).integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = PcmEncoder(w, h).encode_uyvy(frame)
    oy, _, _ = IntraDecoder().decode(bs)
    assert (oy == frame[:, 1::2]).all()


def test_own_decompress_module_registered():
    from ultragrid_tpu.modules.video_decompress import decompress_init
    from ultragrid_tpu.ops.h264 import Intra16EncoderV

    w, h = 64, 48
    frame = np.random.default_rng(2).integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = bytes(Intra16EncoderV(w, h, qp=24).encode_uyvy(frame))
    dec, out_codec = decompress_init(Codec.H264, [Codec.UYVY])
    assert dec is not None
    vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0), [np.frombuffer(bs, np.uint8)])
    out = dec.decompress(vf, out_codec)
    assert out is not None and out.desc.color_spec == Codec.UYVY


def test_h264_compress_module_device_accel():
    """'-c h264:accel=device' module path produces the same stream as the
    host path (on CPU backends the device graph runs on CPU)."""
    from ultragrid_tpu.modules.registry import LibraryClass, load_library
    from ultragrid_tpu.types import VideoDesc, VideoFrame
    from ultragrid_tpu.utils.pattern import generate_pattern

    w, h = 64, 48
    desc = VideoDesc(w, h, Codec.UYVY, 30.0)
    frame = VideoFrame(desc, [generate_pattern(w, h, Codec.UYVY, "bars")])
    host = load_library("h264", LibraryClass.VIDEO_COMPRESS)("qp=24")
    dev = load_library("h264", LibraryClass.VIDEO_COMPRESS)("qp=24:accel=device")
    a = host.compress(frame)
    b = dev.compress(frame)
    assert a is not None and b is not None
    assert bytes(np.asarray(a.data)) == bytes(np.asarray(b.data))


def test_own_decoder_decodes_foreign_x264_streams():
    """The own decoder is no longer limited to own-encoder output: it
    decodes libx264-produced baseline intra streams (I_4x4 all nine
    prediction modes, I_16x16 all four, all chroma modes, CBP me(v),
    per-MB QP deltas) SAMPLE-EXACT vs libavcodec's decode
    (role: src/video_decompress/libavcodec.c as the universal decoder)."""
    import pytest

    from ultragrid_tpu.modules.lavc import LavcCompress, LavcDecompress, lavc_available
    from ultragrid_tpu.ops.h264_dec import IntraDecoder
    from ultragrid_tpu.utils.pattern import generate_pattern

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    rng = np.random.default_rng(0)
    cases = [
        (64, 64, 12, None),          # low QP noise: dense I_4x4, all modes
        (176, 144, 30, "gradient"),  # smooth: plane/DC 16x16 paths
        (64, 48, 40, None),          # high QP noise
    ]
    for w, h, qp, pat in cases:
        if pat is None:
            data = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
        else:
            data = np.asarray(generate_pattern(w, h, Codec.UYVY, pat))
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [data])
        comp = LavcCompress(
            "codec=H.264:encoder=libx264:profile=baseline:qp="
            f"{qp}:g=1:aq-mode=0:x264opts=no-deblock")
        out = comp.compress(frame)
        bs = bytes(np.asarray(out.tiles[0]).reshape(-1))
        y, cb, cr = IntraDecoder().decode(bs)
        ref = LavcDecompress().decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        uy = np.asarray(ref.data)
        assert np.array_equal(uy[:, 1::2].astype(np.int64), y.astype(np.int64)), \
            f"luma mismatch {w}x{h} qp{qp}"
        assert np.array_equal(uy[0::2, 0::4].astype(np.int64), cb.astype(np.int64))
        assert np.array_equal(uy[0::2, 2::4].astype(np.int64), cr.astype(np.int64))


def test_own_decoder_deblocking_intra_streams():
    """In-loop deblocking (spec 8.7): the own decoder now handles DEFAULT
    libx264 output (deblocking enabled) sample-exact vs libavcodec —
    including non-zero slice alpha/beta offsets.  Previously streams had
    to signal no-deblock (role: libavcodec.c universal decode)."""
    import pytest

    from ultragrid_tpu.modules.lavc import LavcCompress, LavcDecompress, lavc_available
    from ultragrid_tpu.ops.h264_dec import IntraDecoder
    from ultragrid_tpu.utils.pattern import generate_pattern

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    rng = np.random.default_rng(7)
    cases = [
        (64, 64, 24, None, ""),             # noise, default deblock (0,0)
        (176, 144, 36, "gradient", ""),     # smooth: strong (bS=4) paths
        (96, 64, 30, "bars", ":x264opts=deblock=2,-1"),  # custom offsets
        (64, 48, 44, None, ""),             # high QP: alpha/beta saturate
    ]
    for w, h, qp, pat, extra in cases:
        if pat is None:
            data = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
        else:
            data = np.asarray(generate_pattern(w, h, Codec.UYVY, pat))
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [data])
        comp = LavcCompress(
            "codec=H.264:encoder=libx264:profile=baseline:qp="
            f"{qp}:g=1:aq-mode=0{extra}")
        out = comp.compress(frame)
        bs = bytes(np.asarray(out.tiles[0]).reshape(-1))
        y, cb, cr = IntraDecoder().decode(bs)
        ref = LavcDecompress().decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        uy = np.asarray(ref.data)
        assert np.array_equal(uy[:, 1::2].astype(np.int64), y.astype(np.int64)), \
            f"luma mismatch {w}x{h} qp{qp} {extra or 'default deblock'}"
        assert np.array_equal(uy[0::2, 0::4].astype(np.int64), cb.astype(np.int64))
        assert np.array_equal(uy[0::2, 2::4].astype(np.int64), cr.astype(np.int64))


def test_own_decoder_deblocking_inter_streams():
    """Deblocking across a P GOP: bS from MV/ref/coded-coefficient rules
    (8.7.2.1) and the filtered picture feeding the DPB.  Foreign libx264
    stream constrained to the decoder's P toolset (16x16 partitions,
    full-pel ME) but with deblocking at its defaults."""
    import pytest

    from ultragrid_tpu.modules.lavc import LavcCompress, LavcDecompress, lavc_available
    from ultragrid_tpu.ops.h264_dec import StreamDecoder
    from ultragrid_tpu.utils.pattern import generate_pattern

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    w, h = 96, 64
    base = np.asarray(generate_pattern(w, h, Codec.UYVY, "gradient")).copy()
    rng = np.random.default_rng(3)
    frames = []
    for i in range(5):
        f = np.roll(base, i * 6, axis=1).copy()
        f[20:36, 40:80] = rng.integers(0, 256, (16, 40), dtype=np.uint8)
        frames.append(f)
    comp = LavcCompress(
        "codec=H.264:encoder=libx264:profile=baseline:qp=30:g=8:aq-mode=0:"
        "refs=1:partitions=none:trellis=0")
    bitstreams = []
    for f in frames:
        out = comp.compress(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
        bitstreams.append(bytes(np.asarray(out.tiles[0]).reshape(-1)))
    dec = StreamDecoder()
    ref_dec = LavcDecompress()
    for i, bs in enumerate(bitstreams):
        y, cb, cr = dec.decode_au(bs)
        ref = ref_dec.decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        uy = np.asarray(ref.data)
        assert np.array_equal(uy[:, 1::2].astype(np.int64), y.astype(np.int64)), \
            f"luma mismatch frame {i}"
        assert np.array_equal(uy[0::2, 0::4].astype(np.int64), cb.astype(np.int64)), \
            f"cb mismatch frame {i}"
        assert np.array_equal(uy[0::2, 2::4].astype(np.int64), cr.astype(np.int64)), \
            f"cr mismatch frame {i}"


def test_own_decoder_multi_reference_p_streams():
    """Multi-reference P decode: sliding-window DPB (most-recent-first
    default ref list, 8.2.4.2.1), ref_idx_l0 te(v) parsing, per-ref MC and
    the different-ref bS rule.  libx264 at refs=3 (its wild-type default
    class) must decode sample-exact across the GOP."""
    import pytest

    from ultragrid_tpu.modules.lavc import LavcCompress, LavcDecompress, lavc_available
    from ultragrid_tpu.ops.h264_dec import StreamDecoder
    from ultragrid_tpu.utils.pattern import generate_pattern

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    w, h = 96, 64
    base = np.asarray(generate_pattern(w, h, Codec.UYVY, "bars")).copy()
    rng = np.random.default_rng(9)
    frames = []
    for i in range(7):
        # alternating content so later refs genuinely win ref_idx > 0
        f = np.roll(base, (i % 2) * 16 + i, axis=1).copy()
        f[8:24, 16:48] = rng.integers(0, 256, (16, 16), dtype=np.uint8).repeat(2, axis=1)
        frames.append(f)
    comp = LavcCompress(
        "codec=H.264:encoder=libx264:profile=baseline:qp=28:g=10:aq-mode=0:"
        "refs=3:partitions=none:trellis=0:sc_threshold=0")
    dec = StreamDecoder()
    rd = LavcDecompress()
    for i, f in enumerate(frames):
        out = comp.compress(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f]))
        bs = bytes(np.asarray(out.tiles[0]).reshape(-1))
        y, cb, cr = dec.decode_au(bs)
        ref = rd.decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        uy = np.asarray(ref.data)
        assert np.array_equal(uy[:, 1::2].astype(np.int64), y.astype(np.int64)), \
            f"luma mismatch frame {i}"
        assert np.array_equal(uy[0::2, 0::4].astype(np.int64), cb.astype(np.int64)), \
            f"cb mismatch frame {i}"
        assert np.array_equal(uy[0::2, 2::4].astype(np.int64), cr.astype(np.int64)), \
            f"cr mismatch frame {i}"
    assert len(dec.dpb) == 3  # sliding window at max_num_ref_frames


def test_own_encoder_deblock_signal_conformance():
    """``-c h264:deblock=1`` signals disable_deblocking_filter_idc=0: the
    emitted stream asks decoders to run the 8.7 loop filter.  Conformance:
    libavcodec's decode of the stream must equal the OWN decoder's decode
    (both sides filter; equality validates our filter against lavc's from
    the encoder direction too)."""
    import pytest

    from ultragrid_tpu.modules.lavc import LavcDecompress, lavc_available
    from ultragrid_tpu.modules.video_compress import H264Compress
    from ultragrid_tpu.ops.h264_dec import IntraDecoder
    from ultragrid_tpu.utils.pattern import generate_pattern

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    w, h = 96, 64
    for mode, qp in (("i16", 36), ("i4", 30)):
        data = np.asarray(generate_pattern(w, h, Codec.UYVY, "gradient"))
        frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [data])
        out = H264Compress(f"qp={qp}:mode={mode}:deblock=1").compress(frame)
        bs = bytes(np.asarray(out.tiles[0]).reshape(-1))
        y, cb, cr = IntraDecoder().decode(bs)
        ref = LavcDecompress().decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        uy = np.asarray(ref.data)
        assert np.array_equal(uy[:, 1::2].astype(np.int64), y.astype(np.int64)), \
            f"{mode}: own filtered decode != lavc decode"
        assert np.array_equal(uy[0::2, 0::4].astype(np.int64), cb.astype(np.int64))
        assert np.array_equal(uy[0::2, 2::4].astype(np.int64), cr.astype(np.int64))
        # and the filter engaged: filtered != unfiltered at this QP
        out0 = H264Compress(f"qp={qp}:mode={mode}").compress(frame)
        bs0 = bytes(np.asarray(out0.tiles[0]).reshape(-1))
        y0, _, _ = IntraDecoder().decode(bs0)
        assert not np.array_equal(y0, y), f"{mode}: deblock had no effect"


def test_cbp_intra_table_matches_decoder():
    from ultragrid_tpu.ops.h264 import _CBP_INTRA_TAB
    from ultragrid_tpu.ops.h264_dec import _CBP_INTRA

    assert _CBP_INTRA_TAB == _CBP_INTRA


@pytest.mark.parametrize("qp", [10, 26, 40])
def test_intra4x4_conformance_matrix(qp):
    """I_NxN streams (directional source-neighbour prediction) must decode
    cleanly in libavcodec at QP-appropriate PSNR."""
    import math

    from ultragrid_tpu.ops.h264 import Intra4x4Encoder, uyvy_to_i420

    w, h = 96, 64
    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, (h, 2 * w), dtype=np.uint8),
        (np.mgrid[0:h, 0 : 2 * w][1] % 220 + 10).astype(np.uint8),
        (np.mgrid[0:h, 0 : 2 * w][0] * 3 % 200 + 20).astype(np.uint8),
    ]
    floor = {10: 40.0, 26: 30.0, 40: 18.0}[qp]
    for frame in frames:
        bs = Intra4x4Encoder(w, h, qp=qp).encode_uyvy(frame)
        got = _lavc_decode(bytes(bs), w, h)
        y0, _, _ = uyvy_to_i420(frame, w, h)
        gy = got[:, 1::2].astype(np.float64)
        mse = ((gy - y0.astype(np.float64)) ** 2).mean()
        psnr = 10 * math.log10(255 * 255 / max(mse, 1e-9))
        assert psnr > floor, (qp, psnr)
        assert len(bs) < frame.nbytes


def test_intra4x4_beats_i16_on_directional_content():
    """Vertical/horizontal prediction should code directional content
    smaller than I_16x16 DC at the same QP."""
    from ultragrid_tpu.ops.h264 import Intra4x4Encoder, Intra16Encoder

    w, h = 96, 64
    # strong vertical edges: columns of alternating ramps
    frame = ((np.mgrid[0:h, 0 : 2 * w][1] * 7) % 256).astype(np.uint8)
    b16 = Intra16Encoder(w, h, qp=26).encode_uyvy(frame)
    b4 = Intra4x4Encoder(w, h, qp=26).encode_uyvy(frame)
    assert len(b4) < len(b16), (len(b4), len(b16))


def test_intra4x4_own_decoder_roundtrip():
    """Our own decoder must reconstruct the I_NxN stream identically to
    libavcodec (sample-exact cross-check)."""
    from ultragrid_tpu.ops.h264 import Intra4x4Encoder
    from ultragrid_tpu.ops.h264_dec import IntraDecoder

    w, h = 64, 48
    rng = np.random.default_rng(13)
    frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    bs = bytes(Intra4x4Encoder(w, h, qp=26).encode_uyvy(frame))
    y_own, cb_own, cr_own = IntraDecoder().decode(bs)
    got = _lavc_decode(bs, w, h)
    assert (got[:, 1::2] == np.asarray(y_own)[:h, :w]).all()


def test_h264_compress_module_i4_mode():
    from ultragrid_tpu.modules.video_compress import H264Compress

    w, h = 64, 48
    comp = H264Compress("qp=26:mode=i4")
    frame = VideoFrame(
        VideoDesc(w, h, Codec.UYVY, 30.0),
        [np.random.default_rng(17).integers(0, 256, (h, 2 * w), dtype=np.uint8)],
    )
    out = comp.compress(frame)
    assert out is not None and out.desc.color_spec == Codec.H264
    got = _lavc_decode(bytes(np.asarray(out.data)), w, h)
    assert got.shape == (h, 2 * w)


def test_intra4x4_uses_diagonal_modes_and_stays_exact():
    """Diagonal content should select modes beyond V/H/DC, and the stream
    must still reconstruct identically in libavcodec and our decoder."""
    from ultragrid_tpu.ops.h264 import Intra4x4Encoder
    from ultragrid_tpu.ops.h264_dec import IntraDecoder

    w, h = 64, 48
    gy_, gx_ = np.mgrid[0:h, 0 : 2 * w]
    frame = ((gx_ + 2 * gy_) * 5 % 256).astype(np.uint8)  # diagonal ramp
    bs = bytes(Intra4x4Encoder(w, h, qp=20).encode_uyvy(frame))
    dec = IntraDecoder()
    dec.trace = []
    y_own, _, _ = dec.decode(bs)
    modes_used = {m for (_, _, m) in dec.trace}
    assert modes_used - {0, 1, 2}, modes_used  # some diagonal mode chosen
    got = _lavc_decode(bs, w, h)
    assert (got[:, 1::2] == np.asarray(y_own)[:h, :w]).all()


# ---------------------------------------------------------------------------
# Inter (P-frame) encoder/decoder
# ---------------------------------------------------------------------------


def _moving_seq(w, h, n, step=2):
    base = (np.linspace(16, 235, w, dtype=np.float32)[None, :]
            + np.linspace(0, 40, h, dtype=np.float32)[:, None]).astype(np.uint8)
    out = []
    for i in range(n):
        f = np.zeros((h, 2 * w), np.uint8)
        f[:, 1::2] = np.roll(base, i * step, axis=1)
        f[:, 0::2] = 128
        out.append(f)
    return out


@pytest.mark.parametrize("qp", [20, 28, 36])
def test_inter_encoder_lavc_sample_exact(qp):
    """IDR+P GOP decodes in libavcodec sample-exact vs the encoder's own
    reconstruction loop; P frames are smaller than the IDR."""
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264 import InterEncoder

    w, h = 64, 48
    frames = _moving_seq(w, h, 5)
    enc = InterEncoder(w, h, qp=qp, gop=10, search=8)
    dec = LavcDecompress()
    sizes = []
    for i, f in enumerate(frames):
        bs = enc.encode_uyvy(f)
        sizes.append(len(bs))
        vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                        [np.frombuffer(bs, np.uint8)])
        out = dec.decompress(vf, Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == enc.ref[0][:h, :w]).all(), f"frame {i} luma"
    assert all(s < sizes[0] for s in sizes[1:]), sizes  # P < IDR


def test_inter_own_decoder_sample_exact_with_gop_refresh():
    from ultragrid_tpu.ops.h264 import InterEncoder
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    w, h = 64, 48
    frames = _moving_seq(w, h, 7)
    enc = InterEncoder(w, h, qp=24, gop=3, search=8)
    stream = b""
    recons = []
    for f in frames:
        stream += enc.encode_uyvy(f)
        recons.append(tuple(p.copy() for p in enc.ref))
    dec = StreamDecoder()
    decoded = dec.decode_stream(stream)
    assert len(decoded) == len(frames)
    for i, (y, cb, cr) in enumerate(decoded):
        ry, rcb, rcr = recons[i]
        assert (y == ry[:h, :w]).all(), f"frame {i} luma"
        assert (cb == rcb[: h // 2, : w // 2]).all(), f"frame {i} cb"
        assert (cr == rcr[: h // 2, : w // 2]).all(), f"frame {i} cr"


def test_inter_still_content_all_skip():
    """Static input after the IDR becomes (nearly) all P_Skip — a few
    dozen bytes per frame."""
    from ultragrid_tpu.ops.h264 import InterEncoder

    w, h = 96, 64
    still = np.random.default_rng(2).integers(0, 256, (h, 2 * w), np.uint8)
    enc = InterEncoder(w, h, qp=26, gop=100, search=8)
    s0 = len(enc.encode_uyvy(still))
    s1 = len(enc.encode_uyvy(still))  # corrects the IDR's quant noise
    s2 = len(enc.encode_uyvy(still))  # reference now matches: all P_Skip
    assert s1 < s0 / 5, (s0, s1)
    assert s2 < 40, (s0, s1, s2)


def test_inter_scene_change_intra_fallback_conformant():
    """A scene change mid-GOP (uncorrelated noise) must still decode
    sample-exact in libavcodec (inter MBs with big residuals and/or
    skips never desync)."""
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264 import InterEncoder

    w, h = 64, 48
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (h, 2 * w), np.uint8)
    b = rng.integers(0, 256, (h, 2 * w), np.uint8)  # unrelated picture
    enc = InterEncoder(w, h, qp=30, gop=10, search=4)
    dec = LavcDecompress()
    for f in (a, a, b, b):
        bs = enc.encode_uyvy(f)
        vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                        [np.frombuffer(bs, np.uint8)])
        out = dec.decompress(vf, Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == enc.ref[0][:h, :w]).all()


def test_inter_nonaligned_geometry():
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264 import InterEncoder

    w, h = 50, 38
    frames = _moving_seq(w, h, 3)
    enc = InterEncoder(w, h, qp=26, gop=10, search=4)
    dec = LavcDecompress()
    for f in frames:
        bs = enc.encode_uyvy(f)
        vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                        [np.frombuffer(bs, np.uint8)])
        out = dec.decompress(vf, Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        assert np.asarray(out.data).shape[0] >= h


def test_inter_compress_module_e2e():
    """-c h264:mode=inter through the compress module + own stateful
    decompress."""
    from ultragrid_tpu.modules.video_compress import H264Compress
    from ultragrid_tpu.modules.video_decompress import OwnH264Decompress

    w, h = 64, 48
    comp = H264Compress("mode=inter:qp=26:gop=4")
    dec = OwnH264Decompress()
    frames = _moving_seq(w, h, 5)
    for i, f in enumerate(frames):
        vf = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [f])
        out = comp.compress(vf)
        assert out is not None and out.desc.color_spec == Codec.H264
        shown = dec.decompress(out, Codec.UYVY)
        assert shown is not None, f"frame {i} failed to decode"
        assert shown.desc.width == w and shown.desc.height == h


def test_inter_vectorized_bit_identical_at_zero_search():
    """InterEncoderV == InterEncoder bit-for-bit when ME is disabled (the
    vectorized CAVLC/skip/cbp machinery against the scalar reference)."""
    from ultragrid_tpu.ops.h264 import InterEncoder, InterEncoderV

    w, h = 64, 48
    frames = _moving_seq(w, h, 4)
    e1 = InterEncoder(w, h, qp=24, gop=10, search=0)
    e2 = InterEncoderV(w, h, qp=24, gop=10, search=0)
    for i, f in enumerate(frames):
        assert e1.encode_uyvy(f) == e2.encode_uyvy(f), f"frame {i}"


def test_inter_vectorized_me_lavc_sample_exact():
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264 import InterEncoderV

    w, h = 64, 48
    frames = _moving_seq(w, h, 5, step=3)  # odd step: refine stage must hit
    enc = InterEncoderV(w, h, qp=24, gop=10, search=8)
    dec = LavcDecompress()
    sizes = []
    for i, f in enumerate(frames):
        bs = enc.encode_uyvy(f)
        sizes.append(len(bs))
        vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                        [np.frombuffer(bs, np.uint8)])
        out = dec.decompress(vf, Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == enc.ref[0][:h, :w]).all(), f"frame {i}"
    assert all(s < sizes[0] for s in sizes[1:]), sizes


def test_inter_vectorized_own_decoder():
    from ultragrid_tpu.ops.h264 import InterEncoderV
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    w, h = 64, 48
    frames = _moving_seq(w, h, 5)
    enc = InterEncoderV(w, h, qp=26, gop=3, search=4)
    stream = b""
    recons = []
    for f in frames:
        stream += enc.encode_uyvy(f)
        recons.append(enc.ref[0].copy())
    for i, (y, _, _) in enumerate(StreamDecoder().decode_stream(stream)):
        assert (y == recons[i][:h, :w]).all(), f"frame {i}"


def test_inter_loss_resilience_and_idr_resync():
    """A lost P access unit causes drift, never a crash; the next IDR
    resynchronizes sample-exact (the receiver behavior over lossy RTP)."""
    from ultragrid_tpu.modules.video_decompress import OwnH264Decompress
    from ultragrid_tpu.ops.h264 import InterEncoderV

    w, h = 64, 48
    frames = _moving_seq(w, h, 6)
    enc = InterEncoderV(w, h, qp=26, gop=3, search=4)
    aus = [enc.encode_uyvy(f) for f in frames]  # I P P I P P
    recon3 = None
    # capture the encoder's recon at frame 3 (the IDR) for resync check
    enc2 = InterEncoderV(w, h, qp=26, gop=3, search=4)
    for i, f in enumerate(frames[:4]):
        enc2.encode_uyvy(f)
        if i == 3:
            recon3 = enc2.ref[0].copy()
    dec = OwnH264Decompress()
    out = []
    for i, au in enumerate(aus):
        if i == 1:
            continue  # drop a P frame
        vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                        [np.frombuffer(au, np.uint8)])
        out.append((i, dec.decompress(vf, Codec.UYVY)))
    # every surviving AU decodes (P against a stale ref drifts, no crash)
    assert all(o is not None for _, o in out), [i for i, o in out if o is None]
    # the IDR at index 3 resyncs sample-exact
    idr = dict(out)[3]
    assert (np.asarray(idr.data)[:h, 1::2] == recon3[:h, :w]).all()


def test_inter_first_au_p_without_reference_rejected():
    from ultragrid_tpu.modules.video_decompress import OwnH264Decompress
    from ultragrid_tpu.ops.h264 import InterEncoderV

    w, h = 64, 48
    frames = _moving_seq(w, h, 2)
    enc = InterEncoderV(w, h, qp=26, gop=10, search=0)
    enc.encode_uyvy(frames[0])          # IDR (discarded)
    p_au = enc.encode_uyvy(frames[1])   # P
    dec = OwnH264Decompress()
    vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                    [np.frombuffer(p_au, np.uint8)])
    assert dec.decompress(vf, Codec.UYVY) is None  # graceful, no crash


def test_inter_device_graph_bit_identical_and_conformant():
    """The ONE-jit-graph inter encoder (h264_tpu.InterEncoderTpu):
    bit-identical to InterEncoderV at search=0 (incl. GOP refresh), and
    with ME enabled every frame decodes sample-exact in both the own
    StreamDecoder and libavcodec."""
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264 import InterEncoderV
    from ultragrid_tpu.ops.h264_dec import StreamDecoder
    from ultragrid_tpu.ops.h264_tpu import InterEncoderTpu

    w, h = 64, 48
    frames = _moving_seq(w, h, 5)
    e1 = InterEncoderV(w, h, qp=24, gop=3, search=0)
    e2 = InterEncoderTpu(w, h, qp=24, gop=3, search=0)
    for i, f in enumerate(frames):
        assert e1.encode_uyvy(f) == e2.encode_uyvy(f), f"frame {i}"

    e3 = InterEncoderTpu(w, h, qp=24, gop=10, search=8)
    stream = b""
    recons = []
    for f in frames:
        stream += e3.encode_uyvy(f)
        recons.append(np.asarray(e3.ref[0]).copy())
    for i, (y, _, _) in enumerate(StreamDecoder().decode_stream(stream)):
        assert (y == recons[i][:h, :w]).all(), f"own-dec frame {i}"
    e4 = InterEncoderTpu(w, h, qp=24, gop=10, search=8)
    dec = LavcDecompress()
    for i, f in enumerate(frames):
        bs = e4.encode_uyvy(f)
        out = dec.decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == np.asarray(e4.ref[0])[:h, :w]).all(), i


def _halfpel_seq(w, h, n):
    """Frames translated by 0.5 px/frame (true sub-pel motion)."""
    xx = np.arange(w, dtype=np.float32)
    out = []
    for i in range(n):
        g = 16 + (np.sin((xx - i * 0.5) * 0.35) * 0.5 + 0.5) * 200
        f = np.zeros((h, 2 * w), np.uint8)
        f[:, 1::2] = np.repeat(g[None, :], h, axis=0).astype(np.uint8)
        f[:, 0::2] = 128
        out.append(f)
    return out


@pytest.mark.parametrize("enc_cls", ["InterEncoder", "InterEncoderV"])
def test_inter_halfpel_conformant_and_used(enc_cls):
    """Half-pel refine (6-tap planes, spec 8.4.2.2.1): sample-exact in
    libavcodec AND the own decoder; the refine must actually pick
    half-sample MVs on 0.5 px/frame content."""
    import ultragrid_tpu.ops.h264 as h264
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264_dec import StreamDecoder

    w, h = 64, 48
    frames = _halfpel_seq(w, h, 4)
    enc = getattr(h264, enc_cls)(w, h, qp=24, gop=10, search=4)
    dec = LavcDecompress()
    stream = b""
    recons = []
    sizes = []
    for i, f in enumerate(frames):
        bs = enc.encode_uyvy(f)
        sizes.append(len(bs))
        stream += bs
        recons.append(np.asarray(enc.ref[0]).copy())
        vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                        [np.frombuffer(bs, np.uint8)])
        out = dec.decompress(vf, Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == np.asarray(enc.ref[0])[:h, :w]).all(), i
    for i, (y, _, _) in enumerate(StreamDecoder().decode_stream(stream)):
        assert (y == recons[i][:h, :w]).all(), f"own-dec frame {i}"
    # with half-pel MC the P frames are far smaller than the IDR
    assert all(s < sizes[0] / 4 for s in sizes[1:]), sizes


def test_inter_device_halfpel_conformant():
    """Device graph half-pel refine: lavc + own decoder sample-exact on
    0.5 px/frame content; search=0 bit-identity with InterEncoderV holds."""
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264_dec import StreamDecoder
    from ultragrid_tpu.ops.h264_tpu import InterEncoderTpu

    w, h = 64, 48
    frames = _halfpel_seq(w, h, 4)
    enc = InterEncoderTpu(w, h, qp=24, gop=10, search=4)
    dec = LavcDecompress()
    stream = b""
    recons = []
    for i, f in enumerate(frames):
        bs = enc.encode_uyvy(f)
        stream += bs
        recons.append(np.asarray(enc.ref[0]).copy())
        out = dec.decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == np.asarray(enc.ref[0])[:h, :w]).all(), i
    for i, (y, _, _) in enumerate(StreamDecoder().decode_stream(stream)):
        assert (y == recons[i][:h, :w]).all(), i


def test_inter_device_quarterpel_conformant_and_effective():
    """Device graph quarter-pel refine (subpel=quarter, spec 8.4.2.2.2
    averaging): lavc + own decoder sample-exact on 0.25 px/frame content,
    and the quarter-sample MVs must pay — P frames far smaller than the
    half-pel encode of the same sequence."""
    from ultragrid_tpu.modules.lavc import LavcDecompress
    from ultragrid_tpu.ops.h264_dec import StreamDecoder
    from ultragrid_tpu.ops.h264_tpu import InterEncoderTpu

    w, h = 64, 48
    xx = np.arange(w, dtype=np.float32)
    frames = []
    for i in range(4):
        g = 16 + (np.sin((xx - i * 0.25) * 0.35) * 0.5 + 0.5) * 200
        f = np.zeros((h, 2 * w), np.uint8)
        f[:, 1::2] = np.repeat(g[None, :], h, axis=0).astype(np.uint8)
        f[:, 0::2] = 128
        frames.append(f)
    enc = InterEncoderTpu(w, h, qp=24, gop=10, search=4, subpel="quarter")
    dec = LavcDecompress()
    stream = b""
    recons = []
    q_sizes = []
    for i, f in enumerate(frames):
        bs = enc.encode_uyvy(f)
        q_sizes.append(len(bs))
        stream += bs
        recons.append(np.asarray(enc.ref[0]).copy())
        out = dec.decompress(
            VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                       [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
        if out is None:
            pytest.skip("no H.264 decoder available")
        got = np.asarray(out.data)[:h, : 2 * w]
        assert (got[:, 1::2] == np.asarray(enc.ref[0])[:h, :w]).all(), i
    for i, (y, _, _) in enumerate(StreamDecoder().decode_stream(stream)):
        assert (y == recons[i][:h, :w]).all(), i
    enc_h = InterEncoderTpu(w, h, qp=24, gop=10, search=4, subpel="half")
    h_sizes = [len(enc_h.encode_uyvy(f)) for f in frames]
    assert sum(q_sizes[1:]) * 2 < sum(h_sizes[1:]), (q_sizes, h_sizes)
