"""PUCCH — formats 1/1a (SR / HARQ-ACK) and 2 (CQI) (36.211 §5.4;
reference: ``srslte_ue_ul_pucch_encode`` at ue/src/phy/phch_worker.cc:592-634).

Format 1/1a: a length-12 cyclically-shifted base sequence, block-spread
over 4 data symbols per slot with an orthogonal cover (W_4), with 3 RS
symbols per slot; mapped to edge PRBs with slot hopping. Format 1a
BPSK-modulates an ACK bit onto the sequence; format 1 (SR) transmits
on/off. Format 2 carries 20 coded CQI bits QPSK on 10 data symbols.

eNB-side detect/decode duals included for round-trip tests.
"""

from __future__ import annotations

import functools

import numpy as np

from . import seq as seqmod
from .cell import Cell

# Orthogonal covers W for format 1 (normal CP, SF=4 over data symbols)
W4 = np.array([
    [1, 1, 1, 1],
    [1, -1, 1, -1],
    [1, -1, -1, 1],
], dtype=np.float32)

DATA_SYMS = (0, 1, 5, 6)  # format-1 data symbols within a slot (normal CP)
RS_SYMS = (2, 3, 4)


@functools.lru_cache(maxsize=256)
def base_seq12(cell_id: int) -> np.ndarray:
    """Length-12 base sequence r(n) = e^{j phi(n) pi/4}, group
    u = cell_id % 30 (36.211 Table 5.5.1.2-1)."""
    PHI = _PHI_TABLE[cell_id % 30]
    return np.exp(1j * np.pi * np.asarray(PHI) / 4).astype(np.complex64)


# 36.211 Table 5.5.1.2-1: phi(n) for M_sc = 12, groups 0..29
_PHI_TABLE = [
    [-1, 1, 3, -3, 3, 3, 1, 1, 3, 1, -3, 3],
    [1, 1, 3, 3, 3, -1, 1, -3, -3, 1, -3, 3],
    [1, 1, -3, -3, -3, -1, -3, -3, 1, -3, 1, -1],
    [-1, 1, 1, 1, 1, -1, -3, -3, 1, -3, 3, -1],
    [-1, 3, 1, -1, 1, -1, -3, -1, 1, -1, 1, 3],
    [1, -3, 3, -1, -1, 1, 1, -1, -1, 3, -3, 1],
    [-1, 3, -3, -3, -3, 3, 1, -1, 3, 3, -3, 1],
    [-3, -1, -1, -1, 1, -3, 3, -1, 1, -3, 3, 1],
    [1, -3, 3, 1, -1, -1, -1, 1, 1, 3, -1, 1],
    [1, -3, -1, 3, 3, -1, -3, 1, 1, 1, 1, 1],
    [-1, 3, -1, 1, 1, -3, -3, -1, -3, -3, 3, -1],
    [3, 1, -1, -1, 3, 3, -3, 1, 3, 1, 3, 3],
    [1, -3, 1, 1, -3, 1, 1, 1, -3, -3, -3, 1],
    [3, 3, -3, 3, -3, 1, 1, 3, -1, -3, 3, 3],
    [-3, 1, -1, -3, -1, 3, 1, 3, 3, 3, -1, 1],
    [3, -1, 1, -3, -1, -1, 1, 1, 3, 1, -1, -3],
    [1, 3, 1, -1, 1, 3, 3, 3, -1, -1, 3, -1],
    [-3, 1, 1, 3, -3, 3, -3, -3, 3, 1, 3, -1],
    [-3, 3, 1, 1, -3, 1, -3, -3, -1, -1, 1, -3],
    [-1, 3, 1, 3, 1, -1, -1, 3, -3, -1, -3, -1],
    [-1, -3, 1, 1, 1, 1, 3, 1, -1, 1, -3, -1],
    [-1, 3, -1, 1, -3, -3, -3, -3, -3, 1, -1, -3],
    [1, 1, -3, -3, -3, -3, -1, 3, -3, 1, -3, 3],
    [1, 1, -1, -3, -1, -3, 1, -1, 1, 3, -1, 1],
    [1, 1, 3, 1, 3, 3, -1, 1, -1, -3, -3, 1],
    [1, -3, 3, 3, 1, 3, 3, 1, -3, -1, -1, 3],
    [1, 3, -3, -3, 3, -3, 1, -1, -1, 3, -1, -3],
    [-3, -1, -3, -1, -3, 3, 1, -1, 1, 3, -3, -3],
    [-1, 3, -3, 3, -1, 3, 3, -3, 3, 3, -1, -1],
    [3, -3, -3, -1, -1, -3, -1, 3, -3, 3, 1, -1],
]


def _cyclic_shift_per_symbol(cell: Cell, ns: int, l: int, n_pucch: int) -> float:
    """alpha for (slot ns, symbol l): derived from the cell PRS (simplified
    n_cs hopping) + resource index."""
    c = seqmod.prs(cell.cell_id, 8 * 2 * 10 * 7 + 8 * (ns * 7 + l) + 8)
    ncs_cell = 0
    for i in range(8):
        ncs_cell = (ncs_cell << 1) | int(c[8 * (ns * 7 + l) + i])
    alpha_idx = (n_pucch + ncs_cell) % 12
    return 2 * np.pi * alpha_idx / 12


def pucch_prb(cell: Cell, n_pucch: int, slot: int) -> int:
    """Edge PRB with slot hopping (36.211 §5.4.3 m -> PRB mapping,
    simplified to m=0 region)."""
    m = n_pucch // 36
    if (m + slot) % 2 == 0:
        return m // 2
    return cell.n_prb - 1 - m // 2


def encode_format1(cell: Cell, subframe: int, n_pucch: int,
                   ack: bool | None = None) -> np.ndarray:
    """Format 1 (SR, ack=None) / 1a (HARQ ACK bit) subframe grid
    contribution: returns [n_sym_sf, n_sc] complex grid (zeros elsewhere)."""
    d = 1.0 if ack is None else (1.0 - 2.0 * (0 if ack else 1))  # BPSK
    # 36.211: d(0) = 1 for positive SR; for 1a: b=0 -> +1 (ACK)
    grid = np.zeros((cell.n_sym_sf, cell.n_sc), np.complex64)
    r = base_seq12(cell.cell_id)
    oc = W4[n_pucch % 3]
    for slot in range(2):
        prb = pucch_prb(cell, n_pucch, slot)
        sc0 = prb * 12
        for i, l in enumerate(DATA_SYMS):
            ns = 2 * subframe + slot
            alpha = _cyclic_shift_per_symbol(cell, ns, l, n_pucch)
            y = d * oc[i] * r * np.exp(1j * alpha * np.arange(12))
            grid[slot * cell.n_sym_slot + l, sc0 : sc0 + 12] = y / np.sqrt(12)
        for l in RS_SYMS:
            ns = 2 * subframe + slot
            alpha = _cyclic_shift_per_symbol(cell, ns, l, n_pucch)
            y = r * np.exp(1j * alpha * np.arange(12))
            grid[slot * cell.n_sym_slot + l, sc0 : sc0 + 12] = y / np.sqrt(12)
    return grid


def detect_format1(cell: Cell, grid: np.ndarray, subframe: int, n_pucch: int):
    """eNB-side coherent detection: returns (metric, ack_soft).

    metric >> 0 indicates PUCCH present (SR detection); sign of ack_soft
    decodes format 1a (positive = ACK)."""
    r = base_seq12(cell.cell_id)
    oc = W4[n_pucch % 3]
    acc = 0.0 + 0j
    rs_acc = 0.0 + 0j
    for slot in range(2):
        prb = pucch_prb(cell, n_pucch, slot)
        sc0 = prb * 12
        for i, l in enumerate(DATA_SYMS):
            ns = 2 * subframe + slot
            alpha = _cyclic_shift_per_symbol(cell, ns, l, n_pucch)
            ref = oc[i] * r * np.exp(1j * alpha * np.arange(12))
            y = grid[slot * cell.n_sym_slot + l, sc0 : sc0 + 12]
            acc += np.vdot(ref, y)
        for l in RS_SYMS:
            ns = 2 * subframe + slot
            alpha = _cyclic_shift_per_symbol(cell, ns, l, n_pucch)
            ref = r * np.exp(1j * alpha * np.arange(12))
            y = grid[slot * cell.n_sym_slot + l, sc0 : sc0 + 12]
            rs_acc += np.vdot(ref, y)
    # coherent demod: data correlation rotated by the RS channel estimate
    ack_soft = np.real(acc * np.conj(rs_acc))
    metric = (abs(acc) + abs(rs_acc)) / np.sqrt(12)
    return float(metric), float(ack_soft)
