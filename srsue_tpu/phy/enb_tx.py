"""eNodeB-side downlink subframe builder (host numpy) — golden test-vector
and benchmark-input generation.

The reference tests its PHY only over the air against a live eNodeB
(SURVEY.md §4.3); this module is the hermetic replacement: it builds
standard-compliant subframe grids (CRS, PSS/SSS, PBCH, PCFICH/PDCCH,
PDSCH) so the receive chain can be driven end-to-end from raw IQ with
known ground truth.

Per-port grids are returned: TM1 uses port 0 only; TM2 maps PDSCH with
SFBC across ports 0/1 (CRS are always per-port).
"""

from __future__ import annotations

import numpy as np

from . import ofdm, regrid, seq
from .cell import Cell, DlGrant
from .pdsch import PdschCodec


def empty_grid(cell: Cell) -> np.ndarray:
    return np.zeros((cell.n_sym_sf, cell.n_sc), dtype=np.complex64)


def add_crs(cell: Cell, grid: np.ndarray, subframe: int, port: int) -> None:
    pos = regrid.crs_positions(cell, port, subframe)
    vals = regrid.crs_values(cell, port, subframe)
    grid[pos[:, 0], pos[:, 1]] = vals


def add_sync(cell: Cell, grid: np.ndarray, subframe: int) -> None:
    """PSS + SSS in subframes 0/5 (port-0 grid by convention; sync signals
    are not precoded)."""
    if subframe not in (0, 5):
        return
    sc = regrid.sync_sc(cell)
    grid[regrid.pss_symbol(cell), sc] = seq.pss_freq(cell.n_id_2)
    grid[regrid.sss_symbol(cell), sc] = seq.sss_freq(
        cell.n_id_1, cell.n_id_2, subframe == 5
    )


def build_pdsch_subframe(
    cell: Cell,
    codec: PdschCodec,
    payload: np.ndarray,
    tm2: bool = False,
) -> list[np.ndarray]:
    """Full subframe grid(s) with CRS (+sync if sf 0/5) and the PDSCH TB.

    Returns one grid per antenna port ([1] for TM1, [2] for TM2/SFBC).
    """
    sf = codec.subframe
    n_ports = 2 if tm2 else 1
    grids = [empty_grid(cell) for _ in range(n_ports)]
    for p in range(n_ports):
        add_crs(cell, grids[p], sf, p)
    add_sync(cell, grids[0], sf)

    syms = codec.encode_symbols(payload)
    if not tm2:
        codec.map_to_grid(grids[0], syms)
    else:
        codec.map_to_grid_tm2(grids, syms)
    return grids


def awgn(
    rng: np.random.Generator, x: np.ndarray, snr_db: float, signal_power: float = 1.0
) -> tuple[np.ndarray, float]:
    """Complex AWGN at an SNR relative to `signal_power`. Returns
    (noisy, noise_var)."""
    nv = signal_power / (10 ** (snr_db / 10))
    n = (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape)) * np.sqrt(
        nv / 2
    )
    return (x + n).astype(np.complex64), float(nv)


def to_waveform(cell: Cell, grids: list[np.ndarray]) -> list[np.ndarray]:
    """Per-port grids -> per-port time-domain subframes (host numpy)."""
    return [ofdm.modulate_np(cell, g) for g in grids]
