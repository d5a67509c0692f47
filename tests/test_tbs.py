"""Full-width TBS table (36.213 Table 7.1.7.2.1-1) — VERDICT r3 item 3:
``tbs()`` must be defined (and well-behaved) for every N_PRB 1..110,
with spec-exact columns where transcribed and validated reconstruction
elsewhere (see ra.py provenance notes)."""

import numpy as np

from srsue_tpu.phy import ra, segmentation


def test_table_shape_and_range():
    t = ra.TBS_TABLE
    assert t.shape == (27, 110)
    assert t.min() >= 16 and t.max() <= 90000
    assert (t % 8 == 0).all()


def test_table_monotone_both_axes():
    t = ra.TBS_TABLE
    assert (np.diff(t, axis=0) >= 0).all(), "not monotone in I_TBS"
    assert (np.diff(t, axis=1) >= 0).all(), "not monotone in N_PRB"


def test_every_cell_zero_filler():
    """Every TBS in the table satisfies the spec alphabet property:
    after 24-bit TB CRC attachment and 36.212 §5.1.2 segmentation the
    code blocks land exactly on turbo QPP sizes (zero filler bits)."""
    for v in sorted(set(ra.TBS_TABLE.ravel().tolist())):
        p = segmentation.plan(int(v))
        assert p.f == 0, f"TBS {v} needs {p.f} filler bits"


def test_exact_columns_spot_rows():
    """Spec spot checks on transcribed columns (36.213 Table
    7.1.7.2.1-1)."""
    # (i_tbs, n_prb) -> TBS
    expect = {
        (0, 1): 16, (26, 1): 712,
        (5, 6): 504, (26, 6): 4392,
        (8, 10): 1384, (13, 12): 3112,
        (17, 15): 5352, (20, 20): 9144,
        (9, 25): 4008, (26, 25): 18336,
        (0, 50): 1384, (16, 50): 16416, (26, 50): 36696,
        (12, 75): 17568, (26, 75): 55056,
        (0, 100): 2792, (15, 100): 30576, (26, 100): 75376,
    }
    for (i, n), v in expect.items():
        assert ra.tbs(i, n) == v, (i, n, ra.tbs(i, n), v)


def test_full_width_coverage_sane_efficiency():
    """Every (i_tbs, n_prb) lookup works and per-PRB efficiency is
    smooth (no interpolation cliff: within +-6% of the neighbouring
    widths' envelope for n_prb >= 10)."""
    t = ra.TBS_TABLE.astype(np.float64)
    n = np.arange(1, 111)
    for i in range(27):
        eff = t[i] / n
        e = eff[9:]
        assert e.max() / e.min() < 1.15, (i, e.min(), e.max())


def test_mcs_to_grant_all_widths():
    for n_prb in (1, 7, 13, 27, 43, 68, 93, 107, 110):
        g = ra.dl_grant(110, 28, n_prb_alloc=n_prb)
        assert g.tbs == ra.tbs(26, n_prb)
        assert g.tbs > 0
