"""SRS — sounding reference signal (36.211 §5.5.3; reference:
``srslte_ue_ul_srs_encode`` / ``srslte_refsignal_srs_send_cs/send_ue``
at ue/src/phy/phch_worker.cc:531-532, 636-658).

ZC base sequence on a comb (every 2nd subcarrier) in the LAST SC-FDMA
symbol of the subframe, bandwidth from the srs-Bandwidth config, with
cell- and UE-level subframe schedules.
"""

from __future__ import annotations

import numpy as np

from . import pusch
from .cell import Cell

# 36.211 Table 5.5.3.3-1 (FDD): srs-SubframeConfig -> (T_SFC, Delta_SFC set)
SFC_TABLE = [
    (1, {0}), (2, {0}), (2, {1}), (5, {0}), (5, {1}), (5, {2}), (5, {3}),
    (5, {0, 1}), (5, {2, 3}), (10, {0}), (10, {1}), (10, {2}), (10, {3}),
    (10, {0, 1, 2, 3, 4, 6, 8}), (10, {0, 1, 2, 3, 4, 5, 6, 8}), (10, set()),
]


def cell_srs_subframe(config: int, tti: int) -> bool:
    """srs_send_cs: does the CELL reserve this subframe for SRS?"""
    t, deltas = SFC_TABLE[config]
    return (tti % t) in deltas


def ue_srs_subframe(srs_config_index: int, tti: int) -> bool:
    """srs_send_ue: does THIS UE sound in this subframe?
    (36.213 Table 8.2-1: I_srs -> periodicity/offset)."""
    i = srs_config_index
    if i < 2:
        t, off = 2, i
    elif i < 7:
        t, off = 5, i - 2
    elif i < 17:
        t, off = 10, i - 7
    elif i < 37:
        t, off = 20, i - 17
    elif i < 77:
        t, off = 40, i - 37
    elif i < 157:
        t, off = 80, i - 77
    elif i < 317:
        t, off = 160, i - 157
    elif i < 637:
        t, off = 320, i - 317
    else:
        return False
    return tti % t == off


def generate(cell: Cell, n_prb_srs: int, cyclic_shift: int = 0,
             comb: int = 0) -> np.ndarray:
    """Frequency-domain SRS over n_prb_srs PRBs on a 2-comb:
    returns [6 * n_prb_srs] complex values for the occupied comb bins."""
    m_sc = 6 * n_prb_srs  # every other subcarrier over n_prb_srs PRBs
    u = cell.cell_id % 30
    base = pusch.dmrs_base_seq(max(m_sc, 36), u)[:m_sc] if m_sc >= 36 else (
        pusch.dmrs_base_seq(36, u)[:m_sc]
    )
    alpha = 2 * np.pi * cyclic_shift / 8
    n = np.arange(m_sc)
    return (base * np.exp(1j * alpha * n)).astype(np.complex64)


def map_to_grid(cell: Cell, grid: np.ndarray, n_prb_srs: int,
                prb_offset: int = 0, cyclic_shift: int = 0, comb: int = 0) -> None:
    """Place SRS into the last SC-FDMA symbol of a [n_sym_sf, n_sc] grid."""
    seq = generate(cell, n_prb_srs, cyclic_shift, comb)
    sym = cell.n_sym_sf - 1
    k0 = prb_offset * 12 + comb
    ks = k0 + 2 * np.arange(len(seq))
    grid[sym, ks] = seq


def detect(cell: Cell, grid: np.ndarray, n_prb_srs: int, prb_offset: int = 0,
           cyclic_shift: int = 0, comb: int = 0) -> float:
    """eNB-side coherent metric (presence / rough channel quality)."""
    seq = generate(cell, n_prb_srs, cyclic_shift, comb)
    sym = cell.n_sym_sf - 1
    k0 = prb_offset * 12 + comb
    ks = k0 + 2 * np.arange(len(seq))
    y = grid[sym, ks]
    return float(np.abs(np.vdot(seq, y)) / max(len(seq), 1))
