"""Codec registry / linesize math tests (parity with reference video_codec.c)."""

import pytest

from ultragrid_tpu.types import (
    Codec,
    VideoDesc,
    get_bpp,
    get_codec_from_fourcc,
    get_codec_from_name,
    get_codec_info,
    vc_get_datalen,
    vc_get_linesize,
    vc_get_size,
)

from . import refc


def test_basic_linesize():
    assert vc_get_linesize(1920, Codec.UYVY) == 3840
    assert vc_get_linesize(1920, Codec.RGB) == 5760
    assert vc_get_linesize(1920, Codec.RGBA) == 7680
    # v210: 48-px alignment, 16 B / 6 px (ref: video_codec.c:138-139)
    assert vc_get_linesize(1920, Codec.v210) == 5120
    assert vc_get_linesize(1, Codec.v210) == 128
    assert vc_get_size(1, Codec.v210) == 16
    # R10k: 64-px alignment (ref: video_codec.c:134-135)
    assert vc_get_linesize(1, Codec.R10k) == 256
    # R12L: 36 B / 8 px (ref: video_codec.c:136-137)
    assert vc_get_linesize(8, Codec.R12L) == 36
    assert vc_get_linesize(1920, Codec.R12L) == 1920 * 36 // 8


def test_datalen_i420():
    assert vc_get_datalen(1920, 1080, Codec.I420) == 1920 * 1080 * 3 // 2


def test_fourcc_roundtrip():
    for c in Codec:
        if c in (Codec.NONE, Codec.PRORES):
            continue
        info = get_codec_info(c)
        if info.fcc:
            # JPEG's J2K share extensions but fourccs are unique except none
            assert get_codec_from_fourcc(info.fcc) in Codec


def test_name_lookup():
    assert get_codec_from_name("UYVY") == Codec.UYVY
    assert get_codec_from_name("v210") == Codec.v210
    assert get_codec_from_name("nonexistent") == Codec.NONE


def test_video_desc_str_roundtrip():
    d = VideoDesc(1920, 1080, Codec.UYVY, 25.0)
    assert VideoDesc.parse(str(d)) == d
    d2 = VideoDesc(3840, 2160, Codec.v210, 59.94)
    assert VideoDesc.parse(str(d2)) == d2


@pytest.mark.skipif(not refc.available(), reason="reference tree not present")
def test_linesize_parity_with_reference():
    for c in Codec:
        info = get_codec_info(c)
        if info.block_size_pixels == 0 or info.block_size_bytes == 0:
            continue
        for w in (1, 2, 7, 48, 127, 1280, 1920, 3840, 7680):
            assert vc_get_linesize(w, c) == refc.vc_get_linesize(w, int(c)), (
                f"{c.name} width={w}"
            )
