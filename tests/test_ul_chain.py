"""UL chain tests: PUSCH SC-FDMA round trip, PRACH generation/detection,
PUCCH format 1/1a detection (TX at the UE, RX duals at the emulated eNB)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import prach, pucch, pusch
from srsue_tpu.phy.cell import Cell, UlGrant
from srsue_tpu.phy import ra
from srsue_tpu.utils.jaxutil import to_host


def _ul_grant(n_prb_cell, mcs, n_prb=None):
    g = ra.dl_grant(n_prb_cell, mcs, n_prb_alloc=n_prb)
    return UlGrant(n_prb=g.n_prb, prb_start=g.prb_start, mcs=g.mcs,
                   mod_order=g.mod_order, tbs=g.tbs, rv=0)


def test_pusch_roundtrip_clean():
    cell = Cell(n_prb=25, cell_id=33)
    grant = _ul_grant(25, 10)  # 16QAM
    codec = pusch.PuschCodec(cell, grant, rnti=0x2222, subframe=4)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    td = codec.encode_sf(payload)
    assert td.shape == (cell.sf_len,)
    # PAPR sanity: SC-FDMA should be low-PAPR vs plain OFDM
    papr = np.max(np.abs(td) ** 2) / np.mean(np.abs(td) ** 2)
    got, ok = codec.decode_sf(jnp.asarray(td[None]), noise_var=1e-6)
    assert bool(to_host(ok).all())
    np.testing.assert_array_equal(to_host(got)[0].astype(np.uint8), payload)


def test_pusch_roundtrip_noisy_with_channel():
    cell = Cell(n_prb=25, cell_id=77)
    grant = _ul_grant(25, 6)  # QPSK
    codec = pusch.PuschCodec(cell, grant, rnti=0x77, subframe=1)
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    td = codec.encode_sf(payload)
    # static multipath channel + AWGN at 12 dB
    h = np.array([1.0, 0, 0, 0.35 + 0.2j], np.complex64)
    rx = np.convolve(td, h)[: len(td)]
    p = np.mean(np.abs(rx) ** 2) * cell.nfft / (12 * grant.n_prb)
    nv = p / 10 ** (12 / 10)
    rx = rx + (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)) * np.sqrt(nv / 2)
    got, ok = codec.decode_sf(jnp.asarray(rx[None].astype(np.complex64)), noise_var=nv)
    assert bool(to_host(ok).all())
    np.testing.assert_array_equal(to_host(got)[0].astype(np.uint8), payload)


def test_pusch_dmrs_properties():
    for m_sc in (36, 300, 1200):
        s = pusch.dmrs_base_seq(m_sc, u=7)
        np.testing.assert_allclose(np.abs(s), 1.0, atol=1e-6)
        # low autocorrelation off-peak
        c = np.abs(np.fft.ifft(np.fft.fft(s) * np.conj(np.fft.fft(s))))
        assert c[0] > 3 * np.sort(c)[-2]


# --- PRACH -----------------------------------------------------------------


@pytest.mark.parametrize("preamble", [0, 17, 63])
def test_prach_detect(preamble):
    cell = Cell(n_prb=25, cell_id=5)
    td = prach.waveform(cell, root_seq_index=128, zero_corr=5,
                        preamble_idx=preamble)
    rng = np.random.default_rng(preamble)
    noisy = td + 0.05 * (
        rng.standard_normal(td.shape) + 1j * rng.standard_normal(td.shape)
    ).astype(np.complex64)
    hits = prach.detect(cell, noisy, 128, 5)
    assert any(h[0] == preamble for h in hits), f"missed preamble: {hits}"
    # strongest hit is the right one
    best = max(hits, key=lambda h: h[1])
    assert best[0] == preamble


def test_prach_no_false_alarm_on_noise():
    cell = Cell(n_prb=25, cell_id=5)
    rng = np.random.default_rng(9)
    n = len(prach.waveform(cell, 128, 5, 0))
    noise = 0.3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    hits = prach.detect(cell, noise, 128, 5, threshold=13.0)
    assert hits == []


def test_prach_preambles_distinct():
    tab = prach.preamble_table(128, 5)
    assert tab.shape == (64, 839)
    # zero-autocorrelation shifts: distinct preambles nearly orthogonal
    c = np.abs(tab[0] @ np.conj(tab[1])) / 839
    assert c < 0.1


# --- PUCCH -----------------------------------------------------------------


@pytest.mark.parametrize("ack", [True, False])
def test_pucch_format1a_ack_nack(ack):
    cell = Cell(n_prb=25, cell_id=101)
    grid = pucch.encode_format1(cell, subframe=3, n_pucch=7, ack=ack)
    rng = np.random.default_rng(int(ack))
    noisy = grid + 0.05 * (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64)
    metric, soft = pucch.detect_format1(cell, noisy, 3, 7)
    assert metric > 3.0
    assert (soft > 0) == ack


def test_pucch_sr_presence():
    cell = Cell(n_prb=25, cell_id=44)
    grid = pucch.encode_format1(cell, subframe=0, n_pucch=3, ack=None)
    m_on, _ = pucch.detect_format1(cell, grid, 0, 3)
    m_off, _ = pucch.detect_format1(cell, np.zeros_like(grid), 0, 3)
    assert m_on > 5 * max(m_off, 1e-6)
    # wrong resource index: low metric
    m_wrong, _ = pucch.detect_format1(cell, grid, 0, 8)
    assert m_on > 3 * m_wrong


def test_pucch_slot_hopping():
    cell = Cell(n_prb=25, cell_id=1)
    assert pucch.pucch_prb(cell, 0, 0) != pucch.pucch_prb(cell, 0, 1)
    assert pucch.pucch_prb(cell, 0, 0) + pucch.pucch_prb(cell, 0, 1) == cell.n_prb - 1


def test_pusch_with_uci_multiplexing():
    """UCI on PUSCH: CQI + ACK ride the shared channel with the TB; eNB
    recovers all three (36.212 §5.2.2.6-8 layout)."""
    cell = Cell(n_prb=25, cell_id=12)
    grant = _ul_grant(25, 8)
    codec = pusch.PuschCodec(cell, grant, rnti=0x99, subframe=2,
                             n_cqi_bits=4, with_ack=True)
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    cqi = np.array([1, 0, 1, 1], np.uint8)
    td = codec.encode_sf_uci(payload, cqi_bits=cqi, ack=True)
    noisy = td + 0.02 * (
        rng.standard_normal(td.shape) + 1j * rng.standard_normal(td.shape)
    ).astype(np.complex64)
    got, ok = codec.decode_sf(jnp.asarray(noisy[None]), noise_var=8e-4)
    assert bool(to_host(ok).all())
    np.testing.assert_array_equal(to_host(got)[0].astype(np.uint8), payload)
    got_cqi, got_ack = codec.decode_uci()
    np.testing.assert_array_equal(got_cqi, cqi)
    assert got_ack is True

    # NACK case
    td2 = codec.encode_sf_uci(payload, cqi_bits=cqi, ack=False)
    codec.decode_sf(jnp.asarray(td2[None]), noise_var=1e-5)
    _, got_ack2 = codec.decode_uci()
    assert got_ack2 is False
