"""Gold sequence, PSS/SSS, CRC unit tests (golden-vector + property)."""

import numpy as np

from srsue_tpu.phy import crc, seq


def test_prs_matches_bit_serial_reference():
    """Vectorized generator == straightforward per-bit implementation."""

    def ref_prs(c_init, n):
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

    for c_init in [0, 1, 0x5F3A2, (1 << 30) + 12345]:
        got = seq.prs(c_init, 200)
        want = ref_prs(c_init, 200)
        np.testing.assert_array_equal(got, want)


def test_prs_long_consistency():
    a = seq.prs(777, 100_000)
    b = seq.prs(777, 1000)
    np.testing.assert_array_equal(a[:1000], b)
    # balanced-ish
    assert 0.45 < a.mean() < 0.55


def test_pss_properties():
    for nid2 in range(3):
        d = seq.pss_freq(nid2)
        assert d.shape == (62,)
        np.testing.assert_allclose(np.abs(d), 1.0, atol=1e-6)
    # distinct roots have low cross-correlation
    c01 = abs(np.vdot(seq.pss_freq(0), seq.pss_freq(1))) / 62
    assert c01 < 0.3


def test_sss_distinct_and_pm1():
    seen = set()
    for nid1 in [0, 1, 167, 335]:
        for nid2 in range(3):
            for sf5 in (False, True):
                d = seq.sss_freq(nid1, nid2, sf5)
                assert set(np.unique(d)) <= {-1.0, 1.0}
                seen.add(d.tobytes())
    assert len(seen) == 4 * 3 * 2  # all distinct


def test_crc_known_vector():
    # CRC-16/CCITT (poly 0x1021, zero init) of ASCII "123456789" is 0x31C3
    msg = np.unpackbits(np.frombuffer(b"123456789", dtype=np.uint8))
    par = crc.crc(msg, "16")
    val = int("".join(map(str, par)), 2)
    assert val == 0x31C3


def test_crc_attach_check_roundtrip():
    rng = np.random.default_rng(0)
    for kind in ["24A", "24B", "16", "8"]:
        for n in [16, 40, 1000, 6144]:
            bits = rng.integers(0, 2, n).astype(np.uint8)
            tb = crc.attach(bits, kind)
            assert crc.check(tb, kind)
            # flip a bit -> fail
            tb2 = tb.copy()
            tb2[n // 2] ^= 1
            assert not crc.check(tb2, kind)


def test_crc_mask():
    bits = np.ones(24, np.uint8)
    tb = crc.attach(bits, "16", mask=0xFFFF)
    assert not crc.check(tb, "16")
    assert crc.check(tb, "16", mask=0xFFFF)


def test_crc_matrix_matches_host():
    rng = np.random.default_rng(1)
    n = 120
    m = crc.crc_matrix(n, "24A")
    for _ in range(5):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        via_mat = (bits @ m) % 2
        np.testing.assert_array_equal(via_mat.astype(np.uint8), crc.crc(bits, "24A"))
