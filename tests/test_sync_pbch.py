"""Cell search (PSS/SSS/CFO) and PBCH/MIB decode tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import chest, enb_tx, equalize, ofdm, pbch, sync
from srsue_tpu.phy.cell import Cell


def _sf0_waveform(cell, mib_sfn=0, snr_db=20, seed=0, cfo=0.0):
    """Build subframe 0 with CRS + PSS/SSS + PBCH and optional impairments."""
    rng = np.random.default_rng(seed)
    grid = enb_tx.empty_grid(cell)
    enb_tx.add_crs(cell, grid, 0, 0)
    enb_tx.add_sync(cell, grid, 0)
    mib = pbch.Mib(cell.n_prb, "normal", 1.0, mib_sfn)
    cw = pbch.encode(cell, mib, n_ports=1)
    pbch.map_to_grid(cell, grid, pbch.frame_symbols(cell, cw, mib_sfn % 4))
    td = np.asarray(ofdm.modulate(cell, jnp.asarray(grid)))
    if cfo:
        n = np.arange(len(td))
        td = td * np.exp(2j * np.pi * cfo * n / cell.nfft)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, nv = enb_tx.awgn(rng, td, snr_db, signal_power=p_sig)
    return noisy, mib


@pytest.mark.parametrize("cell_id", [0, 127, 503])
def test_pss_detection_and_timing(cell_id):
    cell = Cell(n_prb=6, cell_id=cell_id)
    td, _ = _sf0_waveform(cell, snr_db=10, seed=cell_id)
    nid2, t, peak = sync.find_pss(jnp.asarray(td))
    assert int(nid2) == cell.n_id_2
    # PSS is the last symbol of slot 0
    expected = ofdm.symbol_starts(cell)[sync.SEARCH_NFFT and cell.n_sym_slot - 1]
    assert abs(int(t) - expected) <= 2


def test_pss_detection_under_cfo_and_noise():
    cell = Cell(n_prb=6, cell_id=301)
    td, _ = _sf0_waveform(cell, snr_db=0, seed=7, cfo=0.31)
    nid2, t, peak = sync.find_pss(jnp.asarray(td))
    assert int(nid2) == cell.n_id_2
    # CFO estimate from CP of the detected PSS symbol
    start = int(t) - cell.cp_lengths[1]
    cfo = sync.cfo_estimate_cp(
        jnp.asarray(td[start : start + cell.nfft + cell.cp_lengths[1]]),
        cell.nfft,
        cell.cp_lengths[1],
    )
    assert abs(float(cfo) - 0.31) < 0.05


@pytest.mark.parametrize("cell_id,sf5", [(17, False), (250, True), (502, False)])
def test_sss_identification(cell_id, sf5):
    cell = Cell(n_prb=6, cell_id=cell_id)
    sf = 5 if sf5 else 0
    rng = np.random.default_rng(3)
    grid = enb_tx.empty_grid(cell)
    enb_tx.add_crs(cell, grid, sf, 0)
    enb_tx.add_sync(cell, grid, sf)
    td = np.asarray(ofdm.modulate(cell, jnp.asarray(grid)))
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, 5, signal_power=p_sig)
    g = ofdm.demodulate(cell, jnp.asarray(noisy))
    from srsue_tpu.phy import regrid

    sc = regrid.sync_sc(cell)
    pss_fd = g[regrid.pss_symbol(cell), sc[0] : sc[0] + 62]
    sss_fd = g[regrid.sss_symbol(cell), sc[0] : sc[0] + 62]
    nid1, got_sf5, score = sync.sss_coherent(pss_fd, sss_fd, cell.n_id_2)
    assert int(nid1) == cell.n_id_1
    assert bool(got_sf5) == sf5


@pytest.mark.parametrize("sfn", [0, 1, 2, 3, 100])
def test_pbch_mib_roundtrip(sfn):
    cell = Cell(n_prb=50, cell_id=123)
    td, mib = _sf0_waveform(cell, mib_sfn=sfn, snr_db=10, seed=sfn)
    g = ofdm.demodulate(cell, jnp.asarray(td))
    h, nvar, _ = chest.estimate(cell, g, 0, port=0)
    y = pbch.extract_re(cell, g)
    hh = pbch.extract_re(cell, h)
    x_eq, nv_eff = equalize.zf(y, hh, nvar)
    got, quarter, ports = pbch.decode(cell, x_eq, nv_eff)
    assert got is not None
    assert quarter == sfn % 4
    assert ports == 1
    assert got.n_prb == cell.n_prb
    assert got.sfn == sfn - (sfn % 4) + (sfn % 4)  # full SFN recovered
    assert got.phich_resources == 1.0


def test_pbch_fails_on_wrong_cell_id():
    cell = Cell(n_prb=6, cell_id=11)
    td, _ = _sf0_waveform(cell, snr_db=15)
    wrong = Cell(n_prb=6, cell_id=12)
    g = ofdm.demodulate(wrong, jnp.asarray(td))
    h, nvar, _ = chest.estimate(wrong, g, 0, port=0)
    x_eq, nv_eff = equalize.zf(
        pbch.extract_re(wrong, g), pbch.extract_re(wrong, h), nvar
    )
    got, _, _ = pbch.decode(wrong, x_eq, nv_eff)
    assert got is None


def test_decimate_preserves_pss():
    """Full-rate 10 MHz capture decimated 8x to the search rate still
    yields the correct PSS root and timing."""
    cell = Cell(n_prb=50, cell_id=99)
    td, _ = _sf0_waveform(cell, snr_db=10, seed=1)
    decim = cell.nfft // sync.SEARCH_NFFT
    low = sync.decimate(jnp.asarray(td), decim)
    nid2, t, peak = sync.find_pss(low)
    assert int(nid2) == cell.n_id_2
    cell6 = Cell(n_prb=6, cell_id=cell.cell_id)
    expected = ofdm.symbol_starts(cell6)[cell6.n_sym_slot - 1]
    assert abs(int(t) - expected) <= 3


def test_pbch_tm2_blind_port_detection():
    """A 2-port cell transmits PBCH with SFBC (36.211 §6.6.3); the
    single-port hypothesis fails its CRC mask and the receiver's
    Alamouti hypothesis recovers the MIB with the 2-port antenna mask —
    srslte_pbch_decode's per-port-count trial (r4 addition)."""
    from srsue_tpu.phy import enb_tx
    from srsue_tpu.phy.receiver import Receiver
    from srsue_tpu.radio.radio import ArrayRadio

    cell = Cell(n_prb=6, cell_id=33, n_ports=2)
    rng = np.random.default_rng(5)
    sfn0 = 8
    sfs = []
    for f in range(3):
        for sf in range(10):
            grids = [enb_tx.empty_grid(cell) for _ in range(2)]
            for p in range(2):
                enb_tx.add_crs(cell, grids[p], sf, p)
            enb_tx.add_sync(cell, grids[0], sf)
            if sf == 0:
                cw = pbch.encode(cell, pbch.Mib(6, "normal", 1.0, sfn0 + f),
                                 n_ports=2)
                pbch.map_to_grid_tm2(
                    cell, grids, pbch.frame_symbols(cell, cw, (sfn0 + f) % 4))
            sfs.append(np.sum(enb_tx.to_waveform(cell, grids), axis=0))
    td = np.concatenate(sfs)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td[None], 12, signal_power=p_sig)

    rx = Receiver(ArrayRadio(noisy[0], cell.srate))
    found = rx.cell_search()
    assert found is not None
    cell_id, is_sf5, t_off, cfo = found
    assert cell_id == 33
    got = rx.decode_mib_stream(cell_id, t_off, cfo, is_sf5)
    assert got is not None, "2-port PBCH not acquired"
    got_cell, mib, _ = got
    assert got_cell.n_ports == 2          # blind port detection
    assert got_cell.n_prb == 6
    assert mib.sfn in (sfn0, sfn0 + 1, sfn0 + 2)
