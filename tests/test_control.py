"""Control channel tests: PCFICH, PHICH, PDCCH blind decode, DCI codecs."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import chest, control, dci, enb_tx, equalize, ofdm
from srsue_tpu.phy.cell import Cell


def _control_subframe(cell, subframe, cfi, rng, snr_db=20, dcis=(), phich=()):
    """Build a subframe with CRS + PCFICH + optional PDCCH/PHICH, AWGN it,
    and return (received grid, equalized grid, nv_eff estimate)."""
    grid = enb_tx.empty_grid(cell)
    enb_tx.add_crs(cell, grid, subframe, 0)
    enb_tx.add_sync(cell, grid, subframe)
    control.pcfich_map(cell, grid, subframe, cfi)
    for bits, rnti, start, l in dcis:
        control.pdcch_map(cell, grid, subframe, cfi, bits, rnti, start, l)
    for group, nseq, ack in phich:
        control.phich_map(cell, grid, subframe, group, nseq, ack)
    td = enb_tx.to_waveform(cell, [grid])[0]
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, snr_db, signal_power=p_sig)
    g = ofdm.demodulate(cell, jnp.asarray(noisy))
    h, nvar, _ = chest.estimate(cell, g, subframe, port=0)
    g_eq, nv_eff = equalize.zf(g, h, nvar)
    return g, g_eq, nv_eff


# --- geometry invariants ---------------------------------------------------


@pytest.mark.parametrize("n_prb,cell_id", [(6, 0), (6, 5), (25, 77), (50, 211), (100, 503)])
def test_reg_cce_geometry(n_prb, cell_id):
    cell = Cell(n_prb=n_prb, cell_id=cell_id)
    for cfi in (1, 2, 3):
        n_cce, cce_re = control.pdcch_geometry(cell, cfi)
        assert n_cce >= 1
        flat = cce_re.reshape(-1)
        # no duplicates, and disjoint from PCFICH/PHICH REs
        assert len(np.unique(flat)) == len(flat)
        used = set(control._pcfich_re(cell).tolist())
        for gidx in range(control.n_phich_groups(cell)):
            used.update(control._phich_re(cell, gidx).tolist())
        assert used.isdisjoint(flat.tolist())
        # all REs inside the control region (cfi+1 symbols when n_prb<=10)
        from srsue_tpu.phy import regrid

        assert flat.max() < regrid.control_span(cell, cfi) * cell.n_sc


def test_control_region_idx_covers_narrow_cell_cfi3():
    """ADVICE r4: narrow cells (n_prb <= 10) span CFI+1 = 4 symbols at
    CFI=3; the SFBC combined-equalization index must cover symbol 3 or
    TM2 PDCCH REs there would stay at the noise sentinel."""
    from srsue_tpu.phy import regrid

    narrow = Cell(n_prb=6, cell_id=3)
    idx = control._control_region_idx(narrow)
    assert idx.max() >= 3 * narrow.n_sc  # symbol 3 covered
    assert idx.max() < regrid.control_span(narrow, 3) * narrow.n_sc
    # every CFI=3 PDCCH RE lands inside the covered set
    _, cce_re = control.pdcch_geometry(narrow, 3)
    assert set(cce_re.reshape(-1).tolist()) <= set(idx.tolist())
    # wide cells keep the 3-symbol max
    wide = Cell(n_prb=100, cell_id=3)
    assert control._control_region_idx(wide).max() < 3 * wide.n_sc


def test_phich_groups_disjoint_regs():
    cell = Cell(n_prb=50, cell_id=123)
    tab = control.phich_reg_table(cell)
    assert len(tab) == control.n_phich_groups(cell)
    for grp in tab:
        assert len(set(grp)) == 3


# --- PCFICH ----------------------------------------------------------------


@pytest.mark.parametrize("cfi", [1, 2, 3])
def test_pcfich_roundtrip(cfi):
    cell = Cell(n_prb=25, cell_id=101)
    rng = np.random.default_rng(cfi)
    _, g_eq, nv = _control_subframe(cell, 4, cfi, rng, snr_db=6)
    got, scores = control.pcfich_decode(cell, g_eq, nv, 4)
    assert int(got) == cfi


# --- PHICH -----------------------------------------------------------------


@pytest.mark.parametrize("ack", [True, False])
def test_phich_roundtrip(ack):
    cell = Cell(n_prb=25, cell_id=88)
    rng = np.random.default_rng(7)
    _, g_eq, nv = _control_subframe(
        cell, 2, 1, rng, snr_db=10, phich=[(1, 3, ack), (0, 0, not ack)]
    )
    m = control.phich_decode(cell, g_eq, 2, 1, 3)
    assert (float(m) > 0) == ack
    m2 = control.phich_decode(cell, g_eq, 2, 0, 0)
    assert (float(m2) > 0) == (not ack)


# --- DCI codecs ------------------------------------------------------------


def test_riv_roundtrip():
    for n_rb in (6, 25, 50, 100):
        for start in (0, 3, n_rb - 2):
            for length in (1, 2, n_rb - start):
                riv = dci.riv_encode(n_rb, start, length)
                s, l = dci.riv_decode(n_rb, riv)
                assert (s, l) == (start, length)


def test_dci_0_1a_pack_unpack():
    n_rb = 50
    d = dci.Dci1A(riv=dci.riv_encode(n_rb, 3, 10), mcs=17, harq_pid=5,
                  ndi=True, rv=2, tpc=1)
    bits = dci.pack_1a(n_rb, d)
    assert len(bits) == dci.size_0_1a(n_rb)
    got = dci.unpack_0_1a(n_rb, bits)
    assert got == d
    d0 = dci.Dci0(riv=dci.riv_encode(n_rb, 0, 4), mcs=11, ndi=False, tpc=3,
                  dmrs_cshift=2, cqi_request=True)
    got0 = dci.unpack_0_1a(n_rb, dci.pack_0(n_rb, d0))
    assert got0 == d0


def test_dci1_rbg_grant():
    cell = Cell(n_prb=50, cell_id=1)
    nbg = -(-50 // dci.rbg_size(50))
    d = dci.Dci1(rbg_bitmap=(1 << nbg) - 1, mcs=10, harq_pid=0, ndi=True,
                 rv=0, tpc=0)
    g = dci.dci1_to_grant(cell, d)
    assert g.n_prb == 50 and g.prb_start == 0


# --- PDCCH blind decode ----------------------------------------------------


@pytest.mark.parametrize("l_aggr,start", [(4, 0), (8, 0), (4, 4)])
def test_pdcch_blind_decode_common(l_aggr, start):
    cell = Cell(n_prb=25, cell_id=77)
    rng = np.random.default_rng(l_aggr + start)
    rnti = 0xFFFF  # SI-RNTI style
    d = dci.Dci1A(riv=dci.riv_encode(25, 0, 8), mcs=5, harq_pid=0,
                  ndi=False, rv=0, tpc=0)
    bits = dci.pack_1a(25, d)
    _, g_eq, nv = _control_subframe(
        cell, 5, 3, rng, snr_db=8, dcis=[(bits, rnti, start, l_aggr)]
    )
    hits = control.pdcch_blind_decode(
        cell, g_eq, nv, 5, 3, rnti, len(bits), ue_specific=False
    )
    assert len(hits) == 1
    got_start, got_l, payload = hits[0]
    # overlapping aggregations can legitimately decode the same codeword;
    # the payload (hence the grant) is the contract, L is advisory.
    assert got_start == start
    assert dci.unpack_0_1a(25, payload) == d


def test_pdcch_blind_decode_ue_specific():
    cell = Cell(n_prb=50, cell_id=300)
    rng = np.random.default_rng(9)
    rnti = 0x4B2C
    subframe = 3
    n_cce, _ = control.pdcch_geometry(cell, 2)
    cands = control.search_space_candidates(n_cce, rnti, subframe)
    start, l = [c for c in cands if c[1] == 2][0]
    d = dci.Dci1A(riv=dci.riv_encode(50, 10, 20), mcs=20, harq_pid=3,
                  ndi=True, rv=1, tpc=2)
    bits = dci.pack_1a(50, d)
    _, g_eq, nv = _control_subframe(
        cell, subframe, 2, rng, snr_db=12, dcis=[(bits, rnti, start, l)]
    )
    hits = control.pdcch_blind_decode(cell, g_eq, nv, subframe, 2, rnti, len(bits))
    assert any(
        (s, ll) == (start, l) and dci.unpack_0_1a(50, p) == d for s, ll, p in hits
    )


def test_pdcch_no_false_alarm_wrong_rnti():
    cell = Cell(n_prb=25, cell_id=77)
    rng = np.random.default_rng(11)
    bits = dci.pack_1a(25, dci.Dci1A(riv=1, mcs=0, harq_pid=0, ndi=False,
                                     rv=0, tpc=0))
    _, g_eq, nv = _control_subframe(
        cell, 1, 2, rng, snr_db=10, dcis=[(bits, 0x1234, 0, 4)]
    )
    hits = control.pdcch_blind_decode(cell, g_eq, nv, 1, 2, 0x4321, len(bits))
    assert hits == []


def test_tbs_fallback_properties():
    """The full TBS_TABLE (r4): monotone non-decreasing in N_PRB for
    every I_TBS, exact at every transcribed column, and every cell is a
    real spec TBS (zero-filler segmentation — the densified alphabet;
    deep checks live in tests/test_tbs.py)."""
    from srsue_tpu.phy import ra, segmentation

    for i in range(27):
        prev = 0
        for n in range(1, 111):
            v = ra.tbs(i, n)
            assert v >= prev, (i, n, prev, v)
            prev = v
            if n in ra.TBS_COLUMNS:
                assert v == ra.TBS_COLUMNS[n][i]
            else:
                assert v % 8 == 0 and segmentation.plan(v).f == 0, (i, n, v)
