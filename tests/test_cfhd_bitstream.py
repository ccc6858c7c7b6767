"""Real CFHD sample-bitstream conformance (round-4 verdict ask #3): our
encoder's streams must decode correctly in libavcodec's `cfhd` decoder
(the only independent CFHD implementation here), and our decoder must
read lavc's cfhd-encoder streams — both PSNR/maxerr-gated.

Reference role: src/video_compress/cineform.cpp + video_decompress/
cineform.cpp (CineForm SDK wrappers).  Our wire format implementation is
ops/cfhd_bitstream.py (tag/value container, table-18 run/level codes,
2/6 wavelet with PrescaleTable-0x2000 semantics, decompanding curve).
"""

import numpy as np
import pytest

from ultragrid_tpu.ops.cfhd_bitstream import CfhdEncoder, cfhd_decode
from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame


def _lavc_dec():
    from ultragrid_tpu.modules.lavc import LavcDecompress, lavc_available

    if not lavc_available():
        pytest.skip("lavc shim unavailable")
    d = LavcDecompress()
    return d


def _psnr(err):
    mse = np.mean(err.astype(float) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse else float("inf")


def _content(w, h, kind, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "smooth":
        Y = 128 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
    elif kind == "detail":
        Y = 128 + 60 * np.sin(xx / 2.5) * np.cos(yy / 3.0) + rng.normal(0, 12, (h, w))
    else:  # flat
        Y = np.full((h, w), 128.0)
    Y = np.clip(Y + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
    U = np.clip(128 + 30 * np.sin(xx / 13.0), 0, 255).astype(np.uint8)
    V = np.clip(128 + 30 * np.cos(yy / 11.0), 0, 255).astype(np.uint8)
    uy = np.empty((h, 2 * w), np.uint8)
    uy[:, 1::2] = Y
    uy[:, 0::4] = U[:, ::2]
    uy[:, 2::4] = V[:, ::2]
    return uy


def _split(uy):
    return uy[:, 1::2].astype(np.int64), uy[:, 0::4].astype(np.int64), \
        uy[:, 2::4].astype(np.int64)


def test_our_cfhd_decoded_by_lavc_psnr_matrix():
    """Our encoder -> libavcodec cfhd decoder: high quality must land
    within a tight max-error bound; lower quality PSNR-gated."""
    for kind, w, h in (("smooth", 128, 64), ("detail", 64, 32), ("flat", 96, 56)):
        uy = _content(w, h, kind)
        Y, U, V = _split(uy)
        for quality, maxerr, psnr_min in ((95, 8, 46.0), (70, 32, 34.0)):
            # fresh decoder per stream: the lavc shim treats its input as
            # one video stream and carries state across decode calls
            dec = _lavc_dec()
            bs = CfhdEncoder(w, h, quality=quality).encode_uyvy(uy)
            r = dec.decompress(
                VideoFrame(VideoDesc(w, h, Codec.CFHD, 30.0),
                           [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
            if r is None:
                pytest.skip("no cfhd decoder in lavc build")
            out = np.asarray(r.data).astype(np.int64)
            err = np.abs(out[:, 1::2] - Y)
            assert err.max() <= maxerr, (kind, quality, err.max())
            assert _psnr(err) >= psnr_min, (kind, quality, _psnr(err))
            # chroma rides the same quantizers at half width, so HF chroma
            # carries more per-pixel loss than luma at high quality
            cerr = max(np.abs(out[:, 0::4] - U).max(), np.abs(out[:, 2::4] - V).max())
            assert cerr <= max(maxerr, 12), (kind, quality, cerr)


def test_own_decoder_matches_lavc_on_our_streams():
    """The two independent decoders agree on our encoder's output to
    within rounding (<= 2 codes) — pins both directions at once."""
    dec = _lavc_dec()
    w, h = 128, 64
    uy = _content(w, h, "smooth", seed=4)
    bs = CfhdEncoder(w, h, quality=90).encode_uyvy(uy)
    r = dec.decompress(VideoFrame(VideoDesc(w, h, Codec.CFHD, 30.0),
                                  [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
    if r is None:
        pytest.skip("no cfhd decoder in lavc build")
    lavc_y = np.asarray(r.data)[:, 1::2].astype(np.int64)
    own_y = np.clip((cfhd_decode(bs, w, h)[0] + 2) >> 2, 0, 255)
    assert np.abs(lavc_y - own_y).max() <= 2


def test_own_decoder_reads_lavc_encoder_streams():
    """Foreign direction: libavcodec's cfhd ENCODER output decodes in our
    ops/cfhd_bitstream.py decoder, agreeing with lavc's own decode."""
    from ultragrid_tpu.modules.lavc import LavcCompress

    dec = _lavc_dec()
    w, h = 128, 64
    uy = _content(w, h, "detail", seed=2)
    comp = LavcCompress("codec=cineform")
    cf = comp.compress(VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [uy]))
    if cf is None:
        pytest.skip("no cfhd encoder in lavc build")
    bs = bytes(np.asarray(cf.tiles[0]).reshape(-1))
    own = cfhd_decode(bs, w, h)
    own_y = np.clip((own[0] + 2) >> 2, 0, 255)
    r = dec.decompress(VideoFrame(VideoDesc(w, h, Codec.CFHD, 30.0),
                                  [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
    lavc_y = np.asarray(r.data)[:, 1::2].astype(np.int64)
    # two independent decoders; residue is synthesis-rounding noise
    # amplified by the <<2 prescale, not curve/placement error
    d = np.abs(lavc_y - own_y)
    assert d.max() <= 5 and d.mean() <= 0.6, (d.max(), d.mean())


def test_module_emits_real_cfhd_and_lavc_reads_it():
    """`-c cineform` (default quality) now emits REAL CFHD: the module
    output must not be UCF1, must decode in lavc, and must round-trip
    through our own decompress module."""
    from ultragrid_tpu.modules.video_compress import compress_init
    from ultragrid_tpu.modules.video_decompress import decompress_init

    dec = _lavc_dec()
    w, h = 128, 64
    uy = _content(w, h, "smooth", seed=7)
    frame = VideoFrame(VideoDesc(w, h, Codec.UYVY, 30.0), [uy])
    comp = compress_init("cineform").compress(frame)
    assert comp is not None and comp.desc.color_spec == Codec.CFHD
    bs = bytes(np.asarray(comp.tiles[0]).reshape(-1))
    assert bs[:4] != b"UCF1", "module should emit real CFHD by default"
    # lavc reads it
    r = dec.decompress(VideoFrame(VideoDesc(w, h, Codec.CFHD, 30.0),
                                  [np.frombuffer(bs, np.uint8)]), Codec.UYVY)
    if r is not None:
        err = np.abs(np.asarray(r.data).astype(np.int64) - uy.astype(np.int64))
        assert err.max() <= 8
    # our decompress module reads it
    d, out_codec = decompress_init(Codec.CFHD, [Codec.UYVY])
    rec = d.decompress(comp, out_codec)
    err = np.abs(np.asarray(rec.data).astype(np.int64) - uy.astype(np.int64))
    assert err.max() <= 8
    # quality=100 stays lossless via the UCF1 container
    comp100 = compress_init("cineform:100").compress(frame)
    assert bytes(np.asarray(comp100.tiles[0]).reshape(-1))[:4] == b"UCF1"
    rec100 = decompress_init(Codec.CFHD, [Codec.UYVY])[0].decompress(comp100, Codec.UYVY)
    assert np.array_equal(np.asarray(rec100.data), uy)


def test_cfhd_geometry_validation():
    with pytest.raises(ValueError):
        CfhdEncoder(130, 64)
    with pytest.raises(ValueError):
        CfhdEncoder(128, 62)
