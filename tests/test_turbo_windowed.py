"""Windowed-BCJR turbo decoder: parity with the full-trellis decoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import crc as crcmod
from srsue_tpu.phy import turbo


def _encode_noisy(k, b, snr_db, rng, with_crc=True):
    payloads = []
    llrs = []
    for _ in range(b):
        if with_crc:
            p = rng.integers(0, 2, k - 24).astype(np.uint8)
            msg = crcmod.attach(p, "24A")
        else:
            msg = rng.integers(0, 2, k).astype(np.uint8)
            p = msg
        x = 1.0 - 2.0 * turbo.encode(msg).astype(np.float32)
        sigma = 10 ** (-snr_db / 20)
        x = x + rng.standard_normal(x.shape).astype(np.float32) * sigma
        llrs.append(2 * x / sigma**2)
        payloads.append(p)
    return np.stack(payloads), np.stack(llrs)


def _crc_syndrome_matrix(k):
    m = np.zeros((k, 24), np.uint8)
    m[: k - 24] = crcmod.crc_matrix(k - 24, "24A")
    m[k - 24 :] = np.eye(24, dtype=np.uint8)
    return m


@pytest.mark.parametrize("k,window", [(512, 64), (1024, 128), (6144, 64)])
def test_windowed_matches_full_noiseless(k, window):
    rng = np.random.default_rng(0)
    msgs, llrs = _encode_noisy(k, 2, 30.0, rng, with_crc=False)
    h_full, _, _ = turbo.decode(jnp.asarray(llrs), k, 4, auto_window=False)
    h_win, _, _ = turbo.decode(jnp.asarray(llrs), k, 4, window=window)
    np.testing.assert_array_equal(np.asarray(h_full), msgs)
    np.testing.assert_array_equal(np.asarray(h_win), msgs)


def test_windowed_low_snr_parity():
    """At rate-1/3 near threshold the windowed decoder (with NII) must
    track the full decoder's BLER."""
    k = 1536
    rng = np.random.default_rng(1)
    m = _crc_syndrome_matrix(k)
    n_blocks = 12
    msgs, llrs = _encode_noisy(k, n_blocks, 0.0, rng)
    _, _, ok_full = turbo.decode(jnp.asarray(llrs), k, 8, crc_mat=m,
                                 auto_window=False)
    _, _, ok_win = turbo.decode(jnp.asarray(llrs), k, 8, crc_mat=m, window=64)
    full_rate = np.asarray(ok_full).mean()
    win_rate = np.asarray(ok_win).mean()
    assert full_rate == 1.0, f"full decoder below expectation: {full_rate}"
    assert win_rate >= full_rate - 1 / n_blocks  # allow one block difference


def test_windowed_early_exit_iters():
    k = 6144
    rng = np.random.default_rng(2)
    m = _crc_syndrome_matrix(k)
    msgs, llrs = _encode_noisy(k, 4, 10.0, rng)
    hard, iters, ok = turbo.decode(jnp.asarray(llrs), k, 8, crc_mat=m, window=64)
    assert np.asarray(ok).all()
    assert np.asarray(iters).mean() <= 2
    np.testing.assert_array_equal(np.asarray(hard)[:, : k - 24], msgs)


def test_pick_window():
    assert turbo.pick_window(6144) == 64
    assert turbo.pick_window(40) is None
    assert turbo.pick_window(512) == 64
    k = 1056  # 1056 = 64*16.5 -> not divisible by 64; 96 divides (11*96)
    w = turbo.pick_window(k)
    assert w is not None and k % w == 0
