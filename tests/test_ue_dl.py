"""UeDl orchestration: full control+data subframe processing and the TM2
path through the cached jitted chains; UL control scheduling."""

import numpy as np
import pytest

from srsue_tpu.phy import control, dci, enb_tx, ra, ue_ul_ctrl
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.pdsch import PdschCodec
from srsue_tpu.phy.ue_dl import UeDl


def test_uedl_process_full_subframe():
    """PCFICH -> blind DCI -> PDSCH decode through UeDl.process."""
    cell = Cell(n_prb=25, cell_id=99)
    rng = np.random.default_rng(0)
    rnti = 0x5A5A
    subframe = 3
    cfi = 2
    grant = ra.dl_grant(cell.n_prb, 12)
    codec = PdschCodec(cell, grant, rnti, subframe, cfi)
    payload = rng.integers(0, 2, grant.tbs).astype(np.uint8)

    grid = enb_tx.empty_grid(cell)
    enb_tx.add_crs(cell, grid, subframe, 0)
    control.pcfich_map(cell, grid, subframe, cfi)
    d = dci.Dci1A(riv=dci.riv_encode(25, 0, 25), mcs=12, harq_pid=0,
                  ndi=True, rv=0, tpc=0)
    control.pdcch_map(cell, grid, subframe, cfi, dci.pack_1a(25, d), rnti, 0, 4)
    codec.map_to_grid(grid, codec.encode_symbols(payload))
    td = enb_tx.to_waveform(cell, [grid])[0]
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td[None], 20, signal_power=p_sig)

    ue = UeDl(cell)
    res = ue.process(noisy, subframe, rnti)
    assert res.cfi == cfi
    assert len(res.grants) == 1
    assert res.grants[0].tbs == grant.tbs
    assert res.tb_ok.all()
    np.testing.assert_array_equal(res.payload[0], payload)
    assert "snr_db" in res.metrics


def test_uedl_tm2_path():
    cell = Cell(n_prb=15, cell_id=150, n_ports=2)
    rng = np.random.default_rng(1)
    grant = ra.dl_grant(cell.n_prb, 8)
    codec = PdschCodec(cell, grant, rnti=0x10, subframe=2, cfi=1)
    payload = rng.integers(0, 2, grant.tbs).astype(np.uint8)
    grids = enb_tx.build_pdsch_subframe(cell, codec, payload, tm2=True)
    td = np.sum(enb_tx.to_waveform(cell, grids), axis=0)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td[None], 18, signal_power=p_sig)

    ue = UeDl(cell)
    got, ok, iters = ue.decode_pdsch(noisy, grant, 0x10, 2, 1)  # tm2 auto
    assert ok.all()
    np.testing.assert_array_equal(got[0].astype(np.uint8), payload)


def test_sr_cqi_scheduling():
    assert ue_ul_ctrl.sr_period_offset(17) == (20, 2)
    hits = [t for t in range(40) if ue_ul_ctrl.sr_opportunity(17, t)]
    assert hits == [2, 22]
    p, off = ue_ul_ctrl.cqi_period_offset(40)
    assert (p, off) == (40, 3)

    ctrl = ue_ul_ctrl.UlCtrl(ue_ul_ctrl.UlCtrlConfig(
        sr_config_index=5, cqi_config_index=3
    ))
    for _ in range(20):
        ctrl.update_snr(15.0)
    cqis = [(t, ctrl.cqi_for_tti(t)) for t in range(10)]
    sent = [(t, c) for t, c in cqis if c is not None]
    assert [t for t, _ in sent] == [1, 6]  # period 5, offset 1
    bits = sent[0][1]
    cqi_val = int("".join(map(str, bits)), 2)
    assert 7 <= cqi_val <= 15  # ~15 dB SNR -> high CQI


def test_uedl_process_tm2_control():
    """UeDl.process on a 2-port cell: PCFICH + blind DCI search through
    the SFBC-combined control region, PDSCH through Alamouti (r4)."""
    cell = Cell(n_prb=15, cell_id=150, n_ports=2)
    rng = np.random.default_rng(3)
    rnti = 0x7B7B
    subframe = 3
    cfi = 2
    grant = ra.dl_grant(cell.n_prb, 9)
    codec = PdschCodec(cell, grant, rnti, subframe, cfi)
    payload = rng.integers(0, 2, grant.tbs).astype(np.uint8)

    grids = [enb_tx.empty_grid(cell) for _ in range(2)]
    for p in range(2):
        enb_tx.add_crs(cell, grids[p], subframe, p)
    control.pcfich_map_tm2(cell, grids, subframe, cfi)
    d = dci.Dci1A(riv=dci.riv_encode(15, 0, 15), mcs=9, harq_pid=0,
                  ndi=True, rv=0, tpc=0)
    control.pdcch_map_tm2(cell, grids, subframe, cfi,
                          dci.pack_1a(15, d), rnti, 0, 4)
    codec.map_to_grid_tm2(grids, codec.encode_symbols(payload))
    td = np.sum(enb_tx.to_waveform(cell, grids), axis=0)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td[None], 20, signal_power=p_sig)

    ue = UeDl(cell)
    res = ue.process(noisy, subframe, rnti)
    assert res.cfi == cfi
    assert len(res.grants) == 1 and res.grants[0].tbs == grant.tbs
    assert res.tb_ok.all()
    np.testing.assert_array_equal(res.payload[0], payload)
