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


def test_sharded_h264_bit_identical_and_conformant():
    """One H.264 slice per device: sharded encode == host multi-slice
    encode byte-for-byte; stream decodes in both our decoder and lavc."""
    import jax
    from jax.sharding import Mesh

    from ultragrid_tpu.ops.h264 import Intra16EncoderV
    from ultragrid_tpu.ops.h264_dec import IntraDecoder
    from ultragrid_tpu.parallel.sharded_h264 import ShardedH264Encoder

    w, h = 96, 128
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (h, 2 * w), dtype=np.uint8)
    mesh = Mesh(np.array(jax.devices()), ("spatial",))
    bs = bytes(ShardedH264Encoder(w, h, mesh, qp=26).encode(frame))
    ref = bytes(Intra16EncoderV(w, h, qp=26, slices=8).encode_uyvy(frame))
    assert bs == ref
    oy, _, _ = IntraDecoder().decode(bs)
    assert oy.shape == (h, w)
    # lavc cross-check when available
    try:
        from ultragrid_tpu.modules.lavc import LavcDecompress, lavc_available
        from ultragrid_tpu.types import Codec, VideoDesc, VideoFrame

        if lavc_available():
            vf = VideoFrame(VideoDesc(w, h, Codec.H264, 30.0),
                            [np.frombuffer(bs, np.uint8)])
            out = LavcDecompress().decompress(vf, Codec.UYVY)
            assert out is not None
            assert (np.asarray(out.data)[:h, 1::2] == oy).all()
    except ImportError:
        pass


def test_multislice_decodes_with_own_decoder():
    from ultragrid_tpu.ops.h264 import Intra16EncoderV
    from ultragrid_tpu.ops.h264_dec import IntraDecoder

    w, h = 96, 96
    frame = np.random.default_rng(3).integers(0, 256, (h, 2 * w), dtype=np.uint8)
    single = Intra16EncoderV(w, h, qp=30, slices=1).encode_uyvy(frame)
    multi = Intra16EncoderV(w, h, qp=30, slices=3).encode_uyvy(frame)
    y1, _, _ = IntraDecoder().decode(bytes(single))
    y3, _, _ = IntraDecoder().decode(bytes(multi))
    assert y1.shape == y3.shape == (h, w)
    # slice resets change prediction, so outputs differ slightly but both
    # must be close to the source
    src = np.asarray(frame)[:, 1::2].astype(np.float64)
    for y in (y1, y3):
        mse = ((y.astype(np.float64) - src) ** 2).mean()
        assert mse < 400  # > 22 dB on noise at qp30


def test_sharded_jpeg_decode_bit_identical():
    """ShardedJpegDecoder over the 8-device CPU mesh must reproduce the
    single-device reverse mega-matmul decode byte for byte."""
    import numpy as np

    from ultragrid_tpu.ops.jpeg import JpegDecoder, JpegEncoder
    from ultragrid_tpu.parallel.mesh import make_mesh
    from ultragrid_tpu.parallel.sharded_jpeg import ShardedJpegDecoder
    from ultragrid_tpu.types import Codec

    w, h = 256, 128  # nmcuy = 16 -> splits over 8 shards
    rng = np.random.default_rng(5)
    frame = (np.linspace(16, 235, 2 * w, dtype=np.float32)[None, :]
             + rng.normal(0, 6, (h, 2 * w))).clip(16, 235).astype(np.uint8)
    enc = JpegEncoder(w, h, in_codec=Codec.UYVY, quality=85)
    jpeg = bytes(enc.encode(frame))

    single = JpegDecoder().decode_to_uyvy(jpeg)
    assert single is not None
    mesh = make_mesh()
    sharded = ShardedJpegDecoder(mesh).decode_to_uyvy(jpeg)
    assert sharded is not None
    a = np.asarray(single[0])
    b = np.asarray(sharded[0])
    assert a.shape == b.shape
    assert np.array_equal(a, b)


@pytest.mark.parametrize("kind", ["blend", "linear"])
@pytest.mark.parametrize("codec", [Codec.UYVY, Codec.v210, Codec.RG48])
def test_sharded_deinterlace_bit_identical(kind, codec):
    """Halo-exchange deinterlace over 8 shards == single-device op."""
    from ultragrid_tpu.ops.postprocess import deinterlace_blend, deinterlace_linear
    from ultragrid_tpu.parallel.sharded_post import sharded_deinterlace

    mesh = make_mesh(8, data=1)
    w, h = 96, 8 * 4  # 4 rows per shard (even)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (h, vc_get_linesize(w, codec)), dtype=np.uint8)

    host = deinterlace_blend(frame, codec) if kind == "blend" else \
        deinterlace_linear(frame, codec)
    out = sharded_deinterlace(frame, codec, mesh, kind=kind)
    np.testing.assert_array_equal(out, np.asarray(host))


def test_sharded_deinterlace_rejects_odd_blocks():
    from ultragrid_tpu.parallel.sharded_post import sharded_deinterlace

    mesh = make_mesh(8, data=1)
    frame = np.zeros((8 * 3, 64), np.uint8)  # 3 rows/shard: odd
    with pytest.raises(ValueError, match="even-height"):
        sharded_deinterlace(frame, Codec.UYVY, mesh)


def test_sharded_sender_step_per_shard_byte_identity():
    """ShardedSenderStep (full sender step over the mesh: per-device JPEG +
    per-device LDGM parity, no cross-device gather): every shard's slot
    container AND parity must be byte-identical to an independent
    single-chip encode of that shard's row band (JpegEncoder with the same
    restart interval + host numpy LDGM over the same container layout)."""
    from ultragrid_tpu.models.encode import ldgm_container_params
    from ultragrid_tpu.ops.fec import build_ldgm_matrix
    from ultragrid_tpu.ops.jpeg import JpegEncoder
    from ultragrid_tpu.parallel.sharded_jpeg import ShardedSenderStep

    mesh = make_mesh(8, data=1)
    w, h = 96, 8 * 2 * 8  # 2 MCU rows per device
    k, m, c = 16, 6, 3
    frame = generate_pattern(w, h, Codec.UYVY, "noise")
    step = ShardedSenderStep(w, h, mesh, quality=80, k=k, m=m, c=c)
    ys, ybits, us, ubits, vs, vbits, par = step(frame)
    nsh = 8
    local_h = h // nsh
    local = step.base.local
    ref_enc = JpegEncoder(w, local_h, in_codec=Codec.UYVY, quality=80,
                          restart_interval=local.restart_interval)
    mask = build_ldgm_matrix(k, m, c, 1)
    ps = step.ps
    par_np = np.asarray(par).reshape(nsh, m, ps)
    n_y = local.nmcu * 2
    n_c = local.nmcu
    for s in range(nsh):
        band = np.asarray(frame)[s * local_h:(s + 1) * local_h]
        rys, rybits, rus, rubits, rvs, rvbits, rovf = (
            np.asarray(x) for x in ref_enc._encode_cache.setdefault(
                ref_enc.wwords, ref_enc._build_encode(ref_enc.wwords))(band))
        assert not bool(rovf)
        np.testing.assert_array_equal(np.asarray(ys)[s * n_y:(s + 1) * n_y], rys)
        np.testing.assert_array_equal(np.asarray(us)[s * n_c:(s + 1) * n_c], rus)
        np.testing.assert_array_equal(np.asarray(vs)[s * n_c:(s + 1) * n_c], rvs)
        np.testing.assert_array_equal(
            np.asarray(ybits)[s * n_y:(s + 1) * n_y], rybits)
        # independent host LDGM over the same per-shard container
        parts = [rys.astype(np.uint32), rybits.astype(np.int32).view(np.uint32),
                 rus.astype(np.uint32), rubits.astype(np.int32).view(np.uint32),
                 rvs.astype(np.uint32), rvbits.astype(np.int32).view(np.uint32)]
        rows = []
        for p, rc in zip(parts, step.row_counts):
            buf = np.zeros(rc * ps, np.uint8)
            raw = p.reshape(-1).view(np.uint8)
            buf[:raw.size] = raw
            rows.append(buf.reshape(rc, ps))
        sym = np.concatenate(rows)
        sym = np.concatenate([sym, np.zeros((k - sym.shape[0], ps), np.uint8)])
        expect = np.zeros((m, ps), np.uint8)
        for i in range(m):
            acc = np.zeros(ps, np.uint8)
            for j in np.nonzero(mask[i])[0]:
                acc ^= sym[j]
            if i:
                acc ^= expect[i - 1]
            expect[i] = acc
        np.testing.assert_array_equal(par_np[s], expect)


def test_sharded_receiver_step_recovers_and_matches_single_chip():
    """ShardedReceiverStep (full receiver step over the mesh: per-shard
    device LDGM peel -> band-local host entropy decode -> per-shard reverse
    mega-matmul, no cross-device gather): with per-shard erasures inside
    the code's reach, every recovered band's UYVY must be byte-identical
    to a single-chip JpegDecoder decode of that band's stream; a band with
    unrecoverable losses is zero-coefficient concealed and flagged."""
    from ultragrid_tpu.ops.jpeg import JpegDecoder, JpegEncoder
    from ultragrid_tpu.parallel.sharded_jpeg import (
        ShardedReceiverStep, ShardedSenderStep)

    mesh = make_mesh(8, data=1)
    nsh = 8
    w, h = 96, 8 * 2 * nsh
    k, m, c = 16, 6, 3
    frame = generate_pattern(w, h, Codec.UYVY, "noise")
    step = ShardedSenderStep(w, h, mesh, quality=80, k=k, m=m, c=c)
    ys, ybits, us, ubits, vs, vbits, par = (np.asarray(x) for x in step(frame))
    local = step.base.local
    ps = step.ps
    n_y, n_c = local.nmcu * 2, local.nmcu
    par = par.reshape(nsh, m, ps)

    # build each shard's [k+m, ps] wire symbols from the sender outputs
    sym = np.zeros((nsh, k + m, ps), np.uint8)
    for s in range(nsh):
        parts = [
            ys[s * n_y:(s + 1) * n_y].astype(np.uint32),
            ybits[s * n_y:(s + 1) * n_y].astype(np.int32).view(np.uint32),
            us[s * n_c:(s + 1) * n_c].astype(np.uint32),
            ubits[s * n_c:(s + 1) * n_c].astype(np.int32).view(np.uint32),
            vs[s * n_c:(s + 1) * n_c].astype(np.uint32),
            vbits[s * n_c:(s + 1) * n_c].astype(np.int32).view(np.uint32),
        ]
        row = 0
        for p, rc in zip(parts, step.row_counts):
            raw = p.reshape(-1).view(np.uint8)
            buf = np.zeros(rc * ps, np.uint8)
            buf[:raw.size] = raw
            sym[s, row:row + rc] = buf.reshape(rc, ps)
            row += rc
        sym[s, k:] = par[s]

    # per-shard erasures: different pattern per shard, all within reach
    present = np.ones((nsh, k + m), bool)
    rng = np.random.default_rng(7)
    from ultragrid_tpu.ops.fec import LdgmSession
    host = LdgmSession(k, m, c, seed=1)
    for s in range(nsh):
        for _ in range(50):
            drop = rng.choice(k + m, size=2 + (s % 3), replace=False)
            pr = np.ones(k + m, bool)
            pr[drop] = False
            blanked = sym[s].copy()
            blanked[~pr] = 0
            rec = host.decode(blanked, pr.copy())
            # host.decode parses a frame-size header we don't use; accept
            # recovery when all data rows peel back
            test_sym = blanked.copy()
            hv = pr.copy()
            if _peels(host, test_sym, hv):
                present[s] = pr
                break
        else:
            pytest.skip("no recoverable loss pattern found")
    lossy = sym.copy()
    lossy[~present] = 0

    rx = ShardedReceiverStep(w, h, mesh, quality=80, k=k, m=m, c=c,
                             wwords=local.wwords)
    uyvy, ok = rx(lossy, present)
    assert ok.all()
    out = np.asarray(uyvy)

    # byte-identity per band vs a single-chip decode of that band's stream
    local_h = h // nsh
    ref_enc = JpegEncoder(w, local_h, in_codec=Codec.UYVY, quality=80,
                          restart_interval=local.restart_interval)
    dec = JpegDecoder()
    for s in range(nsh):
        band = np.asarray(frame)[s * local_h:(s + 1) * local_h]
        ref_bytes = bytes(ref_enc.encode(band))
        ref_uyvy, rh, rw = dec.decode_to_uyvy(ref_bytes)
        np.testing.assert_array_equal(
            out[s * local_h:(s + 1) * local_h], np.asarray(ref_uyvy))

    # unrecoverable band: wipe more rows than the code can reach
    present2 = present.copy()
    present2[3, :m + 1] = False
    present2[3, k:] = False
    lossy2 = sym.copy()
    lossy2[~present2] = 0
    uyvy2, ok2 = rx(lossy2, present2)
    assert not ok2[3] and ok2[np.arange(nsh) != 3].all()
    out2 = np.asarray(uyvy2)
    np.testing.assert_array_equal(
        out2[np.r_[0:3 * local_h, 4 * local_h:h]],
        out[np.r_[0:3 * local_h, 4 * local_h:h]])


def _peels(session, sym, have):
    """Host-side check that the data rows are recoverable (ignores the
    frame-size header semantics of LdgmSession.decode)."""
    k, m = session.k, session.m
    rows = []
    for i in range(m):
        cols = [int(j) for j in np.nonzero(session.matrix[i])[0]]
        cols.append(k + i)
        if i > 0:
            cols.append(k + i - 1)
        rows.append(cols)
    changed = True
    while changed and not have[:k].all():
        changed = False
        for i in range(m):
            missing = [j for j in rows[i] if not have[j]]
            if len(missing) == 1:
                have[missing[0]] = True
                changed = True
    return bool(have[:k].all())
