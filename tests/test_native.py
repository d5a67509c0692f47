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
