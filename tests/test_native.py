"""Native C++ hot-path library: parity with the pure-Python reference
implementations (which remain the fallbacks)."""

import time

import numpy as np
import pytest

from srsue_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _py_gold(c_init, n):
    """Bit-serial reference (the same one test_seq_crc validates)."""
    Nc = 1600
    x1 = [0] * (Nc + n + 31)
    x2 = [0] * (Nc + n + 31)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(Nc + n):
        x1[i + 31] = (x1[i + 3] + x1[i]) % 2
        x2[i + 31] = (x2[i + 3] + x2[i + 2] + x2[i + 1] + x2[i]) % 2
    return np.array([(x1[i + Nc] + x2[i + Nc]) % 2 for i in range(n)], np.uint8)


def test_native_gold_matches_reference():
    for c_init in [0, 1, 0x12345, (1 << 30) | 777]:
        np.testing.assert_array_equal(
            native.gold_sequence(c_init, 500), _py_gold(c_init, 500)
        )


def test_native_turbo_matches_python():
    from srsue_tpu.phy import turbo

    rng = np.random.default_rng(0)
    for k in (40, 512, 6144):
        bits = rng.integers(0, 2, k).astype(np.uint8)
        nat = native.turbo_encode(bits, turbo.qpp_perm(k))
        # python path: temporarily disable native inside turbo.encode
        z1, t1x, t1z = turbo._rsc_encode(bits)
        z2, t2x, t2z = turbo._rsc_encode(bits[turbo.qpp_perm(k)])
        d = np.zeros((3, k + 4), np.uint8)
        d[0, :k] = bits
        d[1, :k] = z1
        d[2, :k] = z2
        d[0, k] = t1x[0]; d[1, k] = t1z[0]; d[2, k] = t1x[1]
        d[0, k+1] = t1z[1]; d[1, k+1] = t1x[2]; d[2, k+1] = t1z[2]
        d[0, k+2] = t2x[0]; d[1, k+2] = t2z[0]; d[2, k+2] = t2x[1]
        d[0, k+3] = t2z[1]; d[1, k+3] = t2x[2]; d[2, k+3] = t2z[2]
        np.testing.assert_array_equal(nat, d)


def test_native_conv_matches_python():
    from srsue_tpu.phy import convcode

    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 120).astype(np.uint8)
    nat = native.conv_encode(bits)
    # reference: the table-driven python implementation
    out_tab = convcode._tables()[0]
    state = 0
    for i in range(6):
        state |= int(bits[120 - 1 - i]) << (5 - i)
    ref = np.empty((3, 120), np.uint8)
    for i in range(120):
        w = (int(bits[i]) << 6) | state
        for j in range(3):
            ref[j, i] = (1 - int(out_tab[w, j])) // 2
        state = w >> 1
    np.testing.assert_array_equal(nat, ref)


def test_native_crc_matches_python():
    from srsue_tpu.phy import crc as crcmod

    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 1000).astype(np.uint8)
    for kind, (order, poly) in crcmod.POLY.items():
        want = crcmod.crc(bits, kind)
        got = native.crc_bits(bits, poly, order)
        want_val = int("".join(map(str, want)), 2)
        assert got == want_val, kind


def test_native_speedup():
    """The point of the native path: turbo-encoding a max TB's worth of
    codeblocks must be much faster than pure python."""
    from srsue_tpu.phy import turbo

    rng = np.random.default_rng(3)
    k = 6144
    bits = rng.integers(0, 2, k).astype(np.uint8)
    perm = turbo.qpp_perm(k)
    t0 = time.time()
    for _ in range(13):
        native.turbo_encode(bits, perm)
    t_nat = time.time() - t0
    assert t_nat < 0.1, f"native encode too slow: {t_nat:.3f}s for 13 blocks"


def test_native_turbo_decoder_cross_checks_jax():
    """The C++ max-log-MAP decoder (full BCJR, independent lineage) and
    the JAX windowed decoder agree on decoded bits over noisy blocks —
    breaking the TX<->RX self-referential loop one layer deeper."""
    import jax.numpy as jnp

    from srsue_tpu.phy import crc as crcmod
    from srsue_tpu.phy import turbo

    k = 1024
    rng = np.random.default_rng(5)
    msgs, llrs = [], []
    for _ in range(6):
        msg = crcmod.attach(rng.integers(0, 2, k - 24).astype(np.uint8),
                            "24A")
        x = 1.0 - 2.0 * turbo.encode(msg).astype(np.float32)
        sigma = 10 ** (-1.0 / 20)
        xn = x + rng.standard_normal(x.shape).astype(np.float32) * sigma
        llrs.append(2 * xn / sigma**2)
        msgs.append(msg)
    llrs = np.stack(llrs)
    msgs = np.stack(msgs)
    perm, inv = turbo.qpp_perm(k), turbo.qpp_inv(k)

    hard, iters = native.turbo_decode(llrs, perm, inv, n_iters=8,
                                      crc_poly=0x864CFB, crc_order=24)
    np.testing.assert_array_equal(hard, msgs)
    assert (iters >= 1).all() and (iters <= 8).all()

    m = np.zeros((k, 24), np.uint8)
    m[: k - 24] = crcmod.crc_matrix(k - 24, "24A")
    m[k - 24:] = np.eye(24, dtype=np.uint8)
    hard_j, _, ok_j = turbo.decode(jnp.asarray(llrs), k, n_iters=8,
                                   crc_mat=m)
    assert np.asarray(ok_j).all()
    np.testing.assert_array_equal(np.asarray(hard_j).astype(np.uint8), hard)


def test_native_iqstream_prefetch_ring(tmp_path):
    """C++ prefetching ring reader: byte-exact replay, seek, EOF
    zero-fill + underflow counting."""
    from srsue_tpu.radio.native_io import NativeFileRadio, available

    if not available():
        pytest.skip("native IQ runtime unavailable")
    rng = np.random.default_rng(0)
    n = 100_000
    data = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    path = tmp_path / "cap.iq"
    data.tofile(path)

    r = NativeFileRadio(str(path), srate=1.92e6, ring_samples=1 << 14,
                        block=4096)
    try:
        got, ts0 = r.rx_now(30_000)
        np.testing.assert_array_equal(got, data[:30_000])
        assert ts0 == 0.0
        got2, ts2 = r.rx_now(30_000)
        np.testing.assert_array_equal(got2, data[30_000:60_000])
        assert abs(ts2 - 30_000 / 1.92e6) < 1e-12
        # seek back
        assert r.seek(10_000)
        got3, ts3 = r.rx_now(5_000)
        np.testing.assert_array_equal(got3, data[10_000:15_000])
        assert abs(ts3 - 10_000 / 1.92e6) < 1e-12
        # read past EOF: zero fill + underflow count
        assert r.seek(n - 100)
        got4, _ = r.rx_now(1_000)
        np.testing.assert_array_equal(got4[:100], data[-100:])
        np.testing.assert_array_equal(got4[100:], np.zeros(900, np.complex64))
        assert r.underflows >= 1
    finally:
        r.close()


def test_native_txq_in_order_commit(tmp_path):
    """Timed-TX queue: out-of-order worker submissions commit in
    sequence order, gaps zero-padded, late bursts counted (the tx mutex
    ring semantics, phch_common.cc:210-240)."""
    from srsue_tpu.radio.native_io import NativeFileRadio, available

    if not available():
        pytest.skip("native IQ runtime unavailable")
    path = tmp_path / "z.iq"
    np.zeros(16, np.complex64).tofile(path)
    r = NativeFileRadio(str(path), srate=1000.0)
    try:
        b0 = np.full(100, 1 + 0j, np.complex64)
        b1 = np.full(100, 2 + 0j, np.complex64)
        b2 = np.full(100, 3 + 0j, np.complex64)
        # worker 1 finishes first (out of order), then 0, then 2 (late)
        r.tx_seq(1, b1, tx_time=0.250)
        assert r.tx_committed == 0  # held until seq 0 arrives
        r.tx_seq(0, b0, tx_time=0.100)
        assert r.tx_committed == 2
        r.tx_seq(2, b2, tx_time=0.200)  # overlaps committed head: late
        assert r.tx_committed == 3
        assert r.tx_late == 1
        stream, t0 = r.tx_stream()
        assert t0 == 100
        np.testing.assert_array_equal(stream[0:100], b0)
        # gap 200..250 was zero until seq2 landed at the stream head(350)
        np.testing.assert_array_equal(stream[150:250], b1)
        np.testing.assert_array_equal(stream[250:350], b2)
        np.testing.assert_array_equal(stream[100:150],
                                      np.zeros(50, np.complex64))
    finally:
        r.close()
