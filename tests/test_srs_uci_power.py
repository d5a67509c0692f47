"""SRS, UCI/CQI (RM20 + PUCCH format 2), UL power control tests."""

import numpy as np
import pytest

from srsue_tpu.phy import srs, uci
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.powerctrl import UlPower, UlPowerConfig


# --- SRS -------------------------------------------------------------------


def test_srs_roundtrip():
    cell = Cell(n_prb=25, cell_id=30)
    grid = np.zeros((cell.n_sym_sf, cell.n_sc), np.complex64)
    srs.map_to_grid(cell, grid, n_prb_srs=8, prb_offset=2, cyclic_shift=3)
    # only the last symbol's comb occupied
    assert np.abs(grid[: cell.n_sym_sf - 1]).sum() == 0
    m_on = srs.detect(cell, grid, 8, 2, 3)
    m_wrong_cs = srs.detect(cell, grid, 8, 2, 5)
    assert m_on > 0.9
    assert m_on > 3 * m_wrong_cs


def test_srs_schedules():
    assert srs.cell_srs_subframe(0, tti=123)  # T=1: every subframe
    assert srs.cell_srs_subframe(3, tti=10)
    assert not srs.cell_srs_subframe(3, tti=11)
    # UE schedule: I_srs=7 -> period 10 offset 0
    hits = [t for t in range(40) if srs.ue_srs_subframe(7, t)]
    assert hits == [0, 10, 20, 30]


# --- RM(20, A) CQI code ----------------------------------------------------


@pytest.mark.parametrize("a", [2, 4, 6, 10])
def test_rm20_roundtrip(a):
    rng = np.random.default_rng(a)
    for _ in range(10):
        bits = rng.integers(0, 2, a).astype(np.uint8)
        cw = uci.rm20_encode(bits)
        assert cw.shape == (20,)
        llr = (1.0 - 2.0 * cw) * 4.0
        llr += rng.standard_normal(20) * 0.8
        got, score = uci.rm20_decode(llr, a)
        np.testing.assert_array_equal(got, bits)


def test_rm20_min_distance():
    """All 2^6 codewords distinct with decent pairwise distance."""
    cb = uci._codebook(6)
    d = (20 - cb @ cb.T) / 2  # hamming distances
    np.fill_diagonal(d, 99)
    assert d.min() >= 4


def test_pucch_format2_cqi_roundtrip():
    cell = Cell(n_prb=25, cell_id=91)
    rng = np.random.default_rng(0)
    bits = np.array([1, 0, 1, 1], np.uint8)  # 4-bit CQI
    grid = uci.encode_format2(cell, subframe=2, n_pucch=5, cqi_bits=bits)
    noisy = grid + 0.03 * (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    ).astype(np.complex64)
    got, score = uci.decode_format2(cell, noisy, 2, 5, 4)
    np.testing.assert_array_equal(got, bits)


# --- UL power control ------------------------------------------------------


def test_open_loop_power():
    p = UlPower(UlPowerConfig(p0_nominal_pusch=-85, alpha=0.8))
    base = p.pusch_power_dbm(n_prb=10, pathloss_db=100)
    assert base == pytest.approx(10 - 85 + 80, abs=0.1)
    # more PRBs -> more power; deep pathloss hits the p_max cap
    assert p.pusch_power_dbm(100, 100) > base
    assert p.pusch_power_dbm(100, 130) == pytest.approx(23.0)


def test_tpc_accumulation():
    p = UlPower()
    b0 = p.pusch_power_dbm(1, 80)
    p.apply_tpc_pusch(3)  # +3 dB
    p.apply_tpc_pusch(0)  # -1 dB
    assert p.pusch_power_dbm(1, 80) == pytest.approx(b0 + 2.0)


def test_headroom_range():
    p = UlPower()
    # headroom_db is the REAL headroom (unclamped); the 36.133 [-23,40]
    # CE range is applied by PhrProc.generate_phr's level mapping
    assert -23 <= p.headroom_db(100, 130) <= 40
    assert p.headroom_db(1, 30) > 40  # real headroom, beyond CE ceiling
    from srsue_tpu.mac.procs import PhrProc

    phr = PhrProc()
    phr.triggered = True
    assert phr.generate_phr(p.headroom_db(1, 30)) == 63  # CE clamps
