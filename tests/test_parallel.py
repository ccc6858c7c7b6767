"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import io

import jax
import numpy as np
import pytest

from ultragrid_tpu.parallel.mesh import make_mesh, shard_frame_rows
from ultragrid_tpu.types import Codec, vc_get_linesize
from ultragrid_tpu.utils.pattern import generate_pattern


def test_mesh_creation():
    mesh = make_mesh(8, data=2)
    assert mesh.shape == {"data": 2, "spatial": 4}


def test_sharded_conversion_matches_single():
    from ultragrid_tpu.ops import pixfmt

    mesh = make_mesh(8, data=1)
    w, h = 192, 128
    frame = generate_pattern(w, h, Codec.UYVY, "bars")
    ref = np.asarray(pixfmt.convert_frame(frame, w, Codec.UYVY, Codec.RGB))
    frame_dev = jax.device_put(frame, shard_frame_rows(mesh))
    out = pixfmt.convert_frame(frame_dev, w, Codec.UYVY, Codec.RGB)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_jpeg_bit_identical():
    """Sharded encode over 8 virtual devices == single-device encode."""
    from ultragrid_tpu.ops.jpeg import JpegEncoder
    from ultragrid_tpu.parallel.sharded_jpeg import ShardedJpegEncoder

    mesh = make_mesh(8, data=1)
    w, h = 192, 8 * 16  # 16 MCU rows -> 2 per shard
    frame = generate_pattern(w, h, Codec.UYVY, "gradient")

    sharded = ShardedJpegEncoder(w, h, mesh, in_codec=Codec.UYVY, quality=85)
    data_sharded = sharded.encode(frame)

    single = JpegEncoder(
        w, h, in_codec=Codec.UYVY, quality=85,
        restart_interval=sharded.local.restart_interval,
    )
    data_single = single.encode(frame)
    np.testing.assert_array_equal(data_sharded, data_single)


def test_sharded_jpeg_decodes():
    pytest.importorskip("PIL")
    from PIL import Image

    from ultragrid_tpu.parallel.sharded_jpeg import ShardedJpegEncoder

    mesh = make_mesh(8, data=1)
    w, h = 192, 128
    frame = generate_pattern(w, h, Codec.UYVY, "bars")
    enc = ShardedJpegEncoder(w, h, mesh, quality=90)
    data = enc.encode(frame)
    img = Image.open(io.BytesIO(data.tobytes()))
    img.load()
    assert img.size == (w, h)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
