"""Channel coding tests: conv/Viterbi, turbo codec, rate matching,
segmentation. Pattern: encode -> (optional noise) -> decode -> bit-exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import convcode, ratematch, segmentation, turbo
from srsue_tpu.phy import crc as crcmod


def _llr_from_bits(bits, snr_db=None, rng=None):
    """BPSK soft values: +1 for bit 0. Optional AWGN."""
    x = 1.0 - 2.0 * bits.astype(np.float32)
    if snr_db is not None:
        sigma = 10 ** (-snr_db / 20)
        x = x + rng.standard_normal(x.shape).astype(np.float32) * sigma
        x = 2 * x / sigma**2
    return x


# --- convolutional ---------------------------------------------------------


def test_conv_encode_decode_noiseless():
    rng = np.random.default_rng(0)
    n = 40
    msgs = rng.integers(0, 2, (6, n)).astype(np.uint8)
    llrs = np.stack([_llr_from_bits(convcode.encode(m).T) for m in msgs])  # [6,n,3]
    dec = np.asarray(convcode.decode(jnp.asarray(llrs)))
    np.testing.assert_array_equal(dec, msgs)


def test_conv_encode_jax_matches_numpy():
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, (4, 64)).astype(np.uint8)
    got = np.asarray(convcode.encode_jax(jnp.asarray(msgs)))
    for i, m in enumerate(msgs):
        np.testing.assert_array_equal(got[i], convcode.encode(m))


def test_conv_decode_noisy():
    rng = np.random.default_rng(2)
    n = 100
    msgs = rng.integers(0, 2, (8, n)).astype(np.uint8)
    llrs = np.stack(
        [_llr_from_bits(convcode.encode(m).T, snr_db=2.0, rng=rng) for m in msgs]
    )
    dec = np.asarray(convcode.decode(jnp.asarray(llrs)))
    # rate-1/3 K=7 at 2 dB: expect error-free for most blocks
    per_block_ok = (dec == msgs).all(axis=1)
    assert per_block_ok.mean() >= 0.75


def test_conv_tailbiting_property():
    """Encoder state wraps: encoding a rotated message = rotated codeword
    only for tail-biting (checks init-from-tail)."""
    rng = np.random.default_rng(3)
    m = rng.integers(0, 2, 48).astype(np.uint8)
    c = convcode.encode(m)
    # first output depends on last 6 message bits
    m2 = m.copy()
    m2[-1] ^= 1
    c2 = convcode.encode(m2)
    assert not np.array_equal(c[:, 0], c2[:, 0]) or not np.array_equal(
        c[:, -1], c2[:, -1]
    )


# --- QPP interleaver -------------------------------------------------------


def test_qpp_all_sizes_are_permutations():
    for k in turbo.QPP_TABLE:
        p = turbo.qpp_perm(k)
        assert len(np.unique(p)) == k, f"K={k} not a bijection"
    assert len(turbo.QPP_TABLE) == 188


def test_qpp_inverse():
    p = turbo.qpp_perm(512)
    inv = turbo.qpp_inv(512)
    np.testing.assert_array_equal(p[inv], np.arange(512))


# --- turbo -----------------------------------------------------------------


@pytest.mark.parametrize("k", [40, 104, 512])
def test_turbo_encode_properties(k):
    rng = np.random.default_rng(4)
    b = rng.integers(0, 2, k).astype(np.uint8)
    d = turbo.encode(b)
    assert d.shape == (3, k + 4)
    np.testing.assert_array_equal(d[0, :k], b)  # systematic


@pytest.mark.parametrize("k", [40, 200, 1024])
def test_turbo_decode_noiseless(k):
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, (4, k)).astype(np.uint8)
    llrs = np.stack([_llr_from_bits(turbo.encode(m)) for m in msgs])  # [4,3,k+4]
    hard, iters, ok = turbo.decode(jnp.asarray(llrs), k, n_iters=4)
    np.testing.assert_array_equal(np.asarray(hard), msgs)


def test_turbo_decode_noisy_with_crc_early_exit():
    k = 512
    rng = np.random.default_rng(6)
    payload = rng.integers(0, 2, (8, k - 24)).astype(np.uint8)
    msgs = np.stack([crcmod.attach(p, "24A") for p in payload])
    llrs = np.stack(
        [_llr_from_bits(turbo.encode(m), snr_db=0.0, rng=rng) for m in msgs]
    )
    cm = crcmod.crc_matrix(k - 24, "24A")
    full_m = np.zeros((k, 24), np.uint8)
    full_m[: k - 24] = cm
    full_m[k - 24 :] = np.eye(24, dtype=np.uint8)  # syndrome check form
    hard, iters, ok = turbo.decode(jnp.asarray(llrs), k, n_iters=8, crc_mat=full_m)
    hard = np.asarray(hard)
    ok = np.asarray(ok)
    assert ok.all(), f"turbo failed at 0 dB rate-1/3: {ok}"
    np.testing.assert_array_equal(hard[:, : k - 24], payload)
    # early exit engaged: average iterations well below the cap
    assert np.asarray(iters).mean() < 8


# --- rate matching ---------------------------------------------------------


@pytest.mark.parametrize("k,e,rv", [(40, 100, 0), (512, 700, 0), (512, 2100, 2), (6144, 5000, 3)])
def test_turbo_rm_roundtrip(k, e, rv):
    rng = np.random.default_rng(7)
    b = rng.integers(0, 2, k).astype(np.uint8)
    d = turbo.encode(b)
    d_flat = jnp.asarray(d.reshape(-1).astype(np.float32))
    idx = ratematch.turbo_rm_indices(k + 4, e, rv)
    tx = np.asarray(ratematch.match(d_flat, idx))
    # dematch the +-1 soft values and decode
    soft = 1.0 - 2.0 * tx
    w = ratematch.dematch(jnp.asarray(soft), idx, 3 * (k + 4))
    llr = np.asarray(w).reshape(3, k + 4)
    hard, _, _ = turbo.decode(jnp.asarray(llr[None]), k, n_iters=6)
    if e >= 3 * k:  # enough bits for reliable decode
        np.testing.assert_array_equal(np.asarray(hard)[0], b)


def test_turbo_rm_k0_differs_by_rv():
    idx0 = ratematch.turbo_rm_indices(44, 60, 0)
    idx2 = ratematch.turbo_rm_indices(44, 60, 2)
    assert not np.array_equal(idx0, idx2)


def test_conv_rm_roundtrip():
    rng = np.random.default_rng(8)
    n = 40
    m = rng.integers(0, 2, n).astype(np.uint8)
    c = convcode.encode(m)  # [3, n]
    idx = ratematch.conv_rm_indices(n, 120)
    tx = np.asarray(ratematch.match(jnp.asarray(c.reshape(-1).astype(np.float32)), idx))
    soft = 1.0 - 2.0 * tx
    w = np.asarray(ratematch.dematch(jnp.asarray(soft), idx, 3 * n)).reshape(3, n)
    dec = np.asarray(convcode.decode(jnp.asarray(w.T[None])))
    np.testing.assert_array_equal(dec[0], m)


# --- segmentation ----------------------------------------------------------


@pytest.mark.parametrize("tbs", [152, 1000, 6120, 6144, 20000, 75376])
def test_segmentation_roundtrip(tbs):
    rng = np.random.default_rng(9)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    blocks = segmentation.segment(tb)
    p = segmentation.plan(tbs)
    assert len(blocks) == p.c
    for blk, k in zip(blocks, p.block_ks):
        assert len(blk) == k
        assert k in turbo.QPP_TABLE
    back, ok = segmentation.desegment(blocks, tbs)
    assert ok
    np.testing.assert_array_equal(back, tb)


def test_segmentation_detects_corruption():
    tb = np.random.default_rng(10).integers(0, 2, 20000).astype(np.uint8)
    blocks = segmentation.segment(tb)
    blocks[1] = blocks[1].copy()
    blocks[1][5] ^= 1
    _, ok = segmentation.desegment(blocks, 20000)
    assert not ok
