"""FEC tests: LDGM and Reed-Solomon encode/recover round trips + reference
matrix parity."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from ultragrid_tpu.ops.fec import (
    FecDesc,
    LdgmSession,
    RsSession,
    build_ldgm_matrix,
    fec_from_spec,
    gf_mul,
    ldgm_suggest_params,
    rs_encode_matrix,
)

from . import refc


def test_ldgm_roundtrip_no_loss():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, 10000, dtype=np.int32).astype(np.uint8)
    s = LdgmSession(64, 64, 5)
    buf, desc = s.encode(frame)
    assert desc.k == 64 and desc.symbol_size * (desc.k + desc.m) == buf.size
    symbols = buf.reshape(desc.k + desc.m, desc.symbol_size)
    present = np.ones(desc.k + desc.m, dtype=bool)
    out = s.decode(symbols, present)
    np.testing.assert_array_equal(out, frame)


def test_ldgm_erasure_recovery():
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, 40000, dtype=np.int32).astype(np.uint8)
    s = LdgmSession(128, 128, 5)
    buf, desc = s.encode(frame)
    symbols = buf.reshape(desc.k + desc.m, desc.symbol_size).copy()
    present = np.ones(desc.k + desc.m, dtype=bool)
    # drop 10% of data symbols
    drop = rng.choice(desc.k, size=desc.k // 10, replace=False)
    present[drop] = False
    symbols[drop] = 0
    out = s.decode(symbols, present)
    assert out is not None
    np.testing.assert_array_equal(out, frame)


def test_ldgm_staircase_parity_semantics():
    """parity[m] = parity[m-1] XOR row-m data XOR (ref: encode_naive,
    ldgm-session-cpu.cpp:198-242)."""
    rng = np.random.default_rng(2)
    k, m, c = 64, 64, 5
    s = LdgmSession(k, m, c)
    frame = rng.integers(0, 256, 5000, dtype=np.int32).astype(np.uint8)
    buf, desc = s.encode(frame)
    ps = desc.symbol_size
    data = buf[: k * ps].reshape(k, ps)
    parity = buf[k * ps :].reshape(m, ps)
    expected_prev = np.zeros(ps, np.uint8)
    for i in range(min(m, 8)):
        acc = expected_prev.copy()
        for j in np.nonzero(s.matrix[i])[0]:
            acc ^= data[j]
        np.testing.assert_array_equal(parity[i], acc, err_msg=f"row {i}")
        expected_prev = parity[i]


@pytest.mark.skipif(not refc.available(), reason="reference tree not present")
def test_ldgm_matrix_matches_reference():
    """Our RFC5170+PMMS matrix generator is bit-exact with the reference's."""
    build_dir = "/tmp/ugtpu_ldgm_ref"
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "ldpc.so")
    if not os.path.exists(so):
        wrapper = os.path.join(build_dir, "wrap.cpp")
        with open(wrapper, "w") as f:
            f.write(
                '#include "ldpc-matrix.h"\n'
                'extern "C" void lmi(char **m, int k, int n, int n1, int seed)'
                "{ left_matrix_init(m, k, n, n1, seed); }\n"
            )
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared",
             "-I/root/reference/ldgm/matrix-gen", "-o", so,
             "/root/reference/ldgm/matrix-gen/ldpc-matrix.cpp", wrapper],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(so)
    k, m, c, seed = 256, 192, 5, 1
    rows = (ctypes.POINTER(ctypes.c_char) * m)()
    storage = np.zeros((m, k), dtype=np.uint8)
    for i in range(m):
        rows[i] = storage[i].ctypes.data_as(ctypes.POINTER(ctypes.c_char))
    lib.lmi(rows, k, k + m, c, seed)
    ours = build_ldgm_matrix(k, m, c, seed)
    np.testing.assert_array_equal(ours, storage)


def test_rs_roundtrip_no_loss():
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 256, 5000, dtype=np.int32).astype(np.uint8)
    s = RsSession(20, 30)
    buf, desc = s.encode(payload)
    symbols = buf.reshape(s.n, desc.symbol_size)
    out = s.decode(symbols, np.ones(s.n, dtype=bool))
    np.testing.assert_array_equal(out, payload)


def test_rs_erasure_recovery():
    rng = np.random.default_rng(4)
    payload = rng.integers(0, 256, 5000, dtype=np.int32).astype(np.uint8)
    s = RsSession(20, 30)
    buf, desc = s.encode(payload)
    symbols = buf.reshape(s.n, desc.symbol_size).copy()
    present = np.ones(s.n, dtype=bool)
    drop = rng.choice(s.n, size=10, replace=False)  # lose 10 of 30
    present[drop] = False
    symbols[drop] = 0
    out = s.decode(symbols, present)
    assert out is not None
    np.testing.assert_array_equal(out, payload)


def test_rs_systematic():
    """Top k rows of the encode matrix are identity (systematic code)."""
    enc = rs_encode_matrix(10, 15)
    np.testing.assert_array_equal(enc[:10], np.eye(10, dtype=np.uint8))


def test_gf_mul_basics():
    assert gf_mul(1, 77) == 77
    assert gf_mul(0, 77) == 0
    # distributivity spot check
    for a, b, c in [(3, 7, 200), (255, 254, 2)]:
        assert gf_mul(a, b ^ c) == gf_mul(a, b) ^ gf_mul(a, c)


def test_fec_spec_parsing():
    assert fec_from_spec("none") is None
    s = fec_from_spec("ldgm:128:128:5")
    assert isinstance(s, LdgmSession) and (s.k, s.m, s.c) == (128, 128, 5)
    r = fec_from_spec("rs:200:240")
    assert isinstance(r, RsSession) and (r.k, r.n) == (200, 240)
    assert fec_from_spec("mult:3") == ("mult", 3)
    k, m, c = ldgm_suggest_params(150000, 5.0)
    assert (k, m, c) == (1500, 450, 6)


def test_pallas_parity_kernel_matches_gf2_matmul():
    """make_gf2_parity_pallas (interpret mode on CPU) is bit-identical to
    the XLA gf2_matmul for odd symbol sizes that need column padding."""
    import jax
    import jax.numpy as jnp

    from ultragrid_tpu.ops.fec import (
        build_ldgm_matrix,
        gf2_matmul,
        make_gf2_parity_pallas,
    )

    k, m, c = 32, 6, 4
    psw = 700  # not a multiple of 512 -> exercises the pad/slice path
    mask = build_ldgm_matrix(k, m, c, 1).astype(np.float32)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2**32, (k, psw), dtype=np.uint32)
    ref = gf2_matmul(jnp.asarray(mask),
                     jnp.asarray(np.frombuffer(data.tobytes(), np.uint8)
                                 .reshape(k, psw * 4)), False)
    fn = make_gf2_parity_pallas(mask, psw, interpret=True)
    got = np.asarray(fn(jnp.asarray(data)))
    assert np.array_equal(np.frombuffer(got.tobytes(), np.uint8).reshape(m, psw * 4),
                          np.asarray(ref))


def test_ldgm_device_decode_bit_identical_to_host_peel():
    """decode_device (iterative XOR-matmul peel rounds on device) must
    recover exactly what the host peel recovers, including the None cases."""
    import numpy as np

    from ultragrid_tpu.ops.fec import LdgmSession

    k, m, c = 64, 16, 5
    s = LdgmSession(k, m, c, 1)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, 5000, dtype=np.uint8)
    buf, desc = s.encode(frame)
    ps = desc.symbol_size
    nsym = buf.size // ps
    sym = buf.reshape(nsym, ps)

    for trial, nloss in ((0, 5), (1, 12), (2, 16), (3, 30)):
        r = np.random.default_rng(trial)
        lost = r.choice(nsym, nloss, replace=False)
        present = np.ones(nsym, bool)
        present[lost] = False
        garbled = sym.copy()
        garbled[lost] = r.integers(0, 256, (nloss, ps), np.uint8)
        host = s.decode(garbled.copy(), present.copy())
        dev = s.decode_device(garbled.copy(), present.copy())
        if host is None:
            assert dev is None, f"trial {trial}"
        else:
            np.testing.assert_array_equal(np.asarray(dev), np.asarray(host))
            np.testing.assert_array_equal(np.asarray(host), frame)


def test_ldgm_device_decode_parity_only_chain():
    """Staircase chains (consecutive missing parity symbols) need multiple
    peel rounds — the device while_loop must iterate to convergence."""
    import numpy as np

    from ultragrid_tpu.ops.fec import LdgmSession

    k, m, c = 32, 12, 3
    s = LdgmSession(k, m, c, 1)
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, 3000, dtype=np.uint8)
    buf, desc = s.encode(frame)
    ps = desc.symbol_size
    nsym = buf.size // ps
    sym = buf.reshape(nsym, ps).copy()
    # lose a data symbol AND a run of parities: recovery must chain
    present = np.ones(nsym, bool)
    for idx in (3, k + 2, k + 3, k + 4):
        present[idx] = False
        sym[idx] = 0
    out = s.decode_device(sym, present)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), frame)


def test_ldgm_device_param_routes_receiver_solve():
    """--param ldgm-device=device routes the receiver's erasure solve
    through decode_device (same recovered frame)."""
    import numpy as np

    from ultragrid_tpu.net import rtp_types as rt
    from ultragrid_tpu.net.video_rx import FecJob, VideoRxState
    from ultragrid_tpu.ops.fec import LdgmSession
    from ultragrid_tpu.types import Codec, VideoDesc
    from ultragrid_tpu.utils.params import reset_params, set_commandline_param

    k, m, c, seed = 32, 8, 3, 1
    desc = VideoDesc(64, 16, Codec.UYVY, 30.0)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, desc.height * desc.linesize(),
                           dtype=np.uint8)
    hdr = np.frombuffer(
        rt.pack_video_header(desc, 0, 0, payload.size), np.uint8)
    sess = LdgmSession(k, m, c, seed)
    buf, fdesc = sess.encode(np.concatenate([hdr, payload]))
    ps = fdesc.symbol_size
    got = np.ones(buf.size, bool)
    got[2 * ps:3 * ps] = False  # one lost symbol
    bufc = buf.copy()
    bufc[2 * ps:3 * ps] = 0
    job = FecJob("ldgm", bufc, got, (buf.size, k, m, c, seed))
    try:
        set_commandline_param("ldgm-device", "device")
        st = VideoRxState()
        frame = st.decode_fec_job(job)
        assert frame is not None
        np.testing.assert_array_equal(
            np.asarray(frame.tiles[0]).reshape(-1), payload)
    finally:
        reset_params()
