"""DCI format 1C codec + grant conversion + blind decode at SI-RNTI."""

import numpy as np
import pytest

from srsue_tpu.phy import chest, control, dci, enb_tx, equalize, ofdm
from srsue_tpu.phy.cell import Cell


@pytest.mark.parametrize("n_rb", [25, 50, 100])
def test_dci1c_pack_unpack(n_rb):
    d = dci.Dci1C(riv=7, tbs_idx=17, gap=0)
    bits = dci.pack_1c(n_rb, d)
    assert len(bits) == dci.size_1c(n_rb)
    assert dci.unpack_1c(n_rb, bits) == d


def test_dci1c_grant():
    cell = Cell(n_prb=50, cell_id=1)
    step = 4
    d = dci.Dci1C(riv=dci.riv_encode(50 // step, 1, 2), tbs_idx=10)
    g = dci.dci1c_to_grant(cell, d)
    assert g.prb_start == step and g.n_prb == 2 * step
    assert g.tbs == dci.TBS_1C[10]
    assert g.mod_order == 2


def test_dci1c_blind_decode_si():
    """A 1C DCI on SI-RNTI found by the blind search with the 1C size."""
    cell = Cell(n_prb=50, cell_id=17)
    rng = np.random.default_rng(0)
    subframe, cfi = 5, 2
    d = dci.Dci1C(riv=dci.riv_encode(50 // 4, 0, 3), tbs_idx=12)
    bits = dci.pack_1c(50, d)
    grid = enb_tx.empty_grid(cell)
    enb_tx.add_crs(cell, grid, subframe, 0)
    control.pcfich_map(cell, grid, subframe, cfi)
    control.pdcch_map(cell, grid, subframe, cfi, bits, 0xFFFF, 0, 8)
    td = enb_tx.to_waveform(cell, [grid])[0]
    p = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td[None], 10, signal_power=p)
    import jax.numpy as jnp

    g = ofdm.demodulate(cell, jnp.asarray(noisy[0]))
    h, nvar, _ = chest.estimate(cell, g, subframe, port=0)
    g_eq, nv = equalize.zf(g, h, nvar)
    hits = control.pdcch_blind_decode(
        cell, g_eq, nv, subframe, cfi, 0xFFFF, dci.size_1c(50),
        ue_specific=False,
    )
    assert hits
    got = dci.unpack_1c(50, hits[0][2])
    assert got == d
