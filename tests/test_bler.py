"""BLER sweep harness sanity: monotone waterfall at sensible SNRs."""

import numpy as np
import pytest

from srsue_tpu.phy import bler
from srsue_tpu.phy.cell import Cell


def test_qpsk_waterfall():
    cell = Cell(n_prb=6, cell_id=3)
    pts = bler.sweep_pdsch(cell, mcs=5, snrs_db=[-4, 0, 4, 10], n_sf_per_point=6)
    blers = [p.bler for p in pts]
    assert blers[0] >= 0.8  # deep failure region
    assert blers[-1] == 0.0  # clean region
    assert all(a >= b - 0.2 for a, b in zip(blers, blers[1:]))  # ~monotone
    w = bler.waterfall_snr(pts)
    assert w is not None and -4 <= w <= 10
    # turbo iterations drop as SNR rises
    assert pts[-1].mean_iters <= pts[0].mean_iters


def test_16qam_needs_more_snr_than_qpsk():
    cell = Cell(n_prb=6, cell_id=3)
    q = bler.sweep_pdsch(cell, mcs=5, snrs_db=[2.0], n_sf_per_point=6)
    s = bler.sweep_pdsch(cell, mcs=14, snrs_db=[2.0], n_sf_per_point=6)
    assert s[0].bler >= q[0].bler
