"""Independent PHY golden vectors (VERDICT r1 item 7): every generator
here is re-derived DIRECTLY from the 36.211/36.212 spec text inside this
test file with a deliberately different structure (bit-by-bit shift
registers, literal tables) from the package implementations — breaking
the TX<->RX self-referential loop that round-trip tests cannot break.

Covered: Gold sequence (36.211 §7.2), PSS Zadoff-Chu (§6.11.1), SSS
(§6.11.2), 64QAM mapping literals (Table 7.1.4-1), CRC24A/24B/16
(36.212 §5.1.1), turbo encoder + QPP interleaver (§5.1.3.2), tail-biting
convolutional encoder (§5.1.3.1), and the conv sub-block interleaver
(§5.1.4.2).
"""

import numpy as np

from srsue_tpu.phy import convcode, crc as crcmod, modulation, ratematch, seq, turbo


# --------------------------------------------------------------- Gold PRS
def _gold_ref(c_init: int, n: int) -> np.ndarray:
    """36.211 §7.2, literal LFSR simulation: x1(i+31)=x1(i+3)+x1(i),
    x2(i+31)=x2(i+3)+x2(i+2)+x2(i+1)+x2(i), Nc=1600."""
    nc = 1600
    x1 = [0] * (nc + n + 31)
    x2 = [0] * (nc + n + 31)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for i in range(nc + n):
        x1[i + 31] = (x1[i + 3] + x1[i]) % 2
        x2[i + 31] = (x2[i + 3] + x2[i + 2] + x2[i + 1] + x2[i]) % 2
    return np.array([(x1[i + nc] + x2[i + nc]) % 2 for i in range(n)],
                    dtype=np.uint8)


def test_gold_sequence_vs_spec_lfsr():
    for c_init in (0, 1, 0x1F2A3, (0x5A5A << 14) + (6 << 9) + 42):
        np.testing.assert_array_equal(seq.prs(c_init, 200),
                                      _gold_ref(c_init, 200))


# ------------------------------------------------------------------- PSS
def test_pss_zadoff_chu_formula():
    """d_u(n) = e^{-j pi u n(n+1)/63} (n<=30), e^{-j pi u (n+1)(n+2)/63}
    (n>=31), u in {25,29,34} — evaluated longhand per element."""
    for n_id_2, u in ((0, 25), (1, 29), (2, 34)):
        ref = []
        for n in range(63):
            if n == 31:
                continue  # punctured DC-adjacent element
            if n <= 30:
                ph = -np.pi * u * n * (n + 1) / 63.0
            else:
                ph = -np.pi * u * (n + 1) * (n + 2) / 63.0
            ref.append(complex(np.cos(ph), np.sin(ph)))
        np.testing.assert_allclose(seq.pss_freq(n_id_2),
                                   np.array(ref, np.complex64), atol=1e-5)


# ------------------------------------------------------------------- SSS
def test_sss_vs_spec_construction():
    """36.211 §6.11.2.1 longhand: independent m-sequence generation and
    the full m0/m1 derivation via q/q'/m' (not the package's closed
    form)."""

    def x_seq(poly_taps):
        x = [0, 0, 0, 0, 1]
        for i in range(26):
            x.append(sum(x[i + t] for t in poly_taps) % 2)
        return x

    s_t = [1 - 2 * v for v in x_seq((0, 2))]
    c_t = [1 - 2 * v for v in x_seq((0, 3))]
    z_t = [1 - 2 * v for v in x_seq((0, 1, 2, 4))]

    for n_id_1, n_id_2, sf5 in ((0, 0, False), (167, 2, True), (42, 1, False),
                                (503 // 3, 0, True)):
        q_prime = n_id_1 // 30
        q = (n_id_1 + q_prime * (q_prime + 1) // 2) // 30
        m_prime = n_id_1 + q * (q + 1) // 2
        m0 = m_prime % 31
        m1 = (m0 + m_prime // 31 + 1) % 31
        s0 = [s_t[(n + m0) % 31] for n in range(31)]
        s1 = [s_t[(n + m1) % 31] for n in range(31)]
        c0 = [c_t[(n + n_id_2) % 31] for n in range(31)]
        c1 = [c_t[(n + n_id_2 + 3) % 31] for n in range(31)]
        z1m0 = [z_t[(n + (m0 % 8)) % 31] for n in range(31)]
        z1m1 = [z_t[(n + (m1 % 8)) % 31] for n in range(31)]
        d = np.zeros(62, np.float32)
        if not sf5:
            d[0::2] = np.array(s0) * np.array(c0)
            d[1::2] = np.array(s1) * np.array(c1) * np.array(z1m0)
        else:
            d[0::2] = np.array(s1) * np.array(c0)
            d[1::2] = np.array(s0) * np.array(c1) * np.array(z1m1)
        np.testing.assert_array_equal(seq.sss_freq(n_id_1, n_id_2, sf5), d)


# ----------------------------------------------------------------- 64QAM
def test_64qam_literal_vectors():
    """36.211 Table 7.1.4-1 literal entries (I,Q)/sqrt(42)."""
    cases = {
        (0, 0, 0, 0, 0, 0): (3, 3),
        (0, 0, 0, 0, 0, 1): (3, 1),
        (0, 1, 0, 0, 0, 0): (3, -3),
        (1, 0, 0, 0, 0, 0): (-3, 3),
        # I from (b0,b2,b4), Q from (b1,b3,b5); Gray levels:
        # 000->3, 001->1, 010->5, 011->7, 100->-3, 101->-1, 110->-5, 111->-7
        (1, 1, 1, 1, 1, 1): (-7, -7),
        (1, 0, 1, 0, 1, 0): (-7, 3),
        (0, 1, 0, 1, 0, 1): (3, -7),
        (1, 1, 1, 0, 1, 1): (-7, -1),
        (0, 0, 1, 1, 0, 0): (5, 5),
        (0, 0, 1, 1, 1, 1): (7, 7),
        (0, 0, 0, 0, 1, 1): (1, 1),
    }
    for bits, (i_amp, q_amp) in cases.items():
        got = modulation.modulate_np(np.array(bits, np.uint8), 6)[0]
        want = (i_amp + 1j * q_amp) / np.sqrt(42)
        assert abs(got - want) < 1e-6, (bits, got, want)


# ------------------------------------------------------------------- CRC
def _crc_shift_reg(bits, poly_bits):
    """Long-division CRC with an explicit shift register (36.212 §5.1.1
    zero-initialized), structurally unlike the package's power-table."""
    deg = len(poly_bits) - 1
    reg = list(bits) + [0] * deg
    for i in range(len(bits)):
        if reg[i]:
            for j, p in enumerate(poly_bits):
                reg[i + j] ^= p
    return np.array(reg[-deg:], np.uint8)


def test_crc_polynomials_vs_long_division():
    # gCRC24A = x^24+x^23+x^18+x^17+x^14+x^11+x^10+x^7+x^6+x^5+x^4+x^3+x+1
    p24a = [1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1,
            0, 1, 1]
    # gCRC24B = x^24+x^23+x^6+x^5+x+1
    p24b = [1, 1] + [0] * 16 + [1, 1, 0, 0, 0, 1, 1]
    # gCRC16 = x^16+x^12+x^5+1
    p16 = [1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]
    rng = np.random.default_rng(7)
    for kind, poly in (("24A", p24a), ("24B", p24b), ("16", p16)):
        for n in (8, 40, 121):
            msg = rng.integers(0, 2, n).astype(np.uint8)
            np.testing.assert_array_equal(
                crcmod.crc(msg, kind), _crc_shift_reg(msg, poly),
                err_msg=f"CRC{kind} n={n}")


# ------------------------------------------------------------------ turbo
def _rsc_ref(bits):
    """36.212 §5.1.3.2.1 figure, literal register simulation:
    registers (s1,s2,s3); feedback = s2^s3 (g0=1+D^2+D^3);
    output z = u' ^ s1 ^ s3 with u' = u ^ feedback (g1=1+D+D^3)."""
    s1 = s2 = s3 = 0
    z = []
    for u in bits:
        up = int(u) ^ s2 ^ s3
        z.append(up ^ s1 ^ s3)
        s1, s2, s3 = up, s1, s2
    tail_x, tail_z = [], []
    for _ in range(3):
        u = s2 ^ s3  # switch to feedback: drives registers to zero
        up = 0
        tail_x.append(u)
        tail_z.append(up ^ s1 ^ s3)
        s1, s2, s3 = up, s1, s2
    assert (s1, s2, s3) == (0, 0, 0)
    return z, tail_x, tail_z


def test_turbo_encoder_vs_spec_registers():
    rng = np.random.default_rng(11)
    k = 40
    bits = rng.integers(0, 2, k).astype(np.uint8)
    f1, f2 = 3, 10  # Table 5.1.3-3 entry for K=40
    pi = [(f1 * i + f2 * i * i) % k for i in range(k)]
    z1, t1x, t1z = _rsc_ref(bits)
    z2, t2x, t2z = _rsc_ref(bits[pi])

    d = turbo.encode(bits)
    np.testing.assert_array_equal(d[0, :k], bits)
    np.testing.assert_array_equal(d[1, :k], z1)
    np.testing.assert_array_equal(d[2, :k], z2)
    # tail multiplexing (§5.1.3.2.2): d0=[x_K+1,z_K+2,x'_K+1,z'_K+2],
    # d1=[z_K+1,x_K+3,z'_K+1,x'_K+3], d2=[x_K+2,z_K+3? ...] per e-seq
    np.testing.assert_array_equal(
        d[0, k:], [t1x[0], t1z[1], t2x[0], t2z[1]])
    np.testing.assert_array_equal(
        d[1, k:], [t1z[0], t1x[2], t2z[0], t2x[2]])
    np.testing.assert_array_equal(
        d[2, k:], [t1x[1], t1z[2], t2x[1], t2z[2]])


def test_qpp_interleaver_table_entries():
    """Spot-check QPP permutations directly from the (f1, f2) formula for
    several K (Table 5.1.3-3 constants transcribed independently)."""
    for k, f1, f2 in ((40, 3, 10), (512, 31, 64), (6144, 263, 480),
                      (2048, 31, 64)):
        i = np.arange(k, dtype=np.int64)
        np.testing.assert_array_equal(turbo.qpp_perm(k), (f1 * i + f2 * i * i) % k)


# ----------------------------------------------------- convolutional code
def test_conv_encoder_vs_spec_registers():
    """36.212 §5.1.3.1: rate-1/3 tail-biting, K=7, G0=133 G1=171 G2=165
    (octal) — literal shift-register simulation."""
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, 50).astype(np.uint8)
    g = [0o133, 0o171, 0o165]
    # tail-biting: initialize register with the LAST 6 bits
    state = list(bits[-6:][::-1])  # s[0] = most recent
    outs = [[], [], []]
    for u in bits:
        window = [int(u)] + state  # 7 taps: current + 6 registers
        for j, poly in enumerate(g):
            v = 0
            for t in range(7):
                if (poly >> (6 - t)) & 1:
                    v ^= window[t]
            outs[j].append(v)
        state = window[:-1]
    ref = np.array(outs, np.uint8)
    got = convcode.encode(bits)
    assert got.shape[-2:] == (50, 3) or got.shape == (3, 50), got.shape
    got2 = got if got.shape == (3, 50) else got.T
    np.testing.assert_array_equal(got2, ref)


# ------------------------------------------------- sub-block interleaver
def test_conv_subblock_interleaver_vs_spec():
    """36.212 §5.1.4.2.1: 32 columns, pad with dummies at the FRONT,
    column permutation Table 5.1.4-2, read out column by column."""
    perm_cols = [1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31,
                 0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30]
    d = 50
    rows = -(-d // 32)
    n_dummy = rows * 32 - d
    mat = np.full((rows, 32), -1, np.int64)
    mat.reshape(-1)[n_dummy:] = np.arange(d)
    out = []
    for c in perm_cols:
        for r in range(rows):
            if mat[r, c] >= 0:
                out.append(mat[r, c])
    got = ratematch._interleave_idx(d, ratematch.PERM_CONV)
    got = got[got >= 0]
    np.testing.assert_array_equal(got, np.array(out, np.int64))
