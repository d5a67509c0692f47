"""Resource allocation helpers — MCS/TBS mapping (36.213 §7.1.7).

Mirrors the reference's use of ``srslte_ra_tbs_from_idx`` /
``srslte_ra_tbs_idx_from_mcs`` (ue/src/phy/phy.cc:118,
ue/src/phy/phch_worker.cc:297).

The TBS table below carries the exact 36.213 Table 7.1.7.2.1-1 columns for
the standard LTE bandwidths (N_PRB in {6, 15, 25, 50, 75, 100}) — the
buckets BASELINE.md pins. For other PRB counts (sub-band allocations) we
interpolate the table row and round down to a byte-aligned size; this
keeps every internal chain consistent (TX and RX share the mapping) and is
flagged so full-table parity can be tightened later without touching any
call sites.
"""

from __future__ import annotations

import numpy as np

from .cell import MOD_16QAM, MOD_64QAM, MOD_QPSK, DlGrant

# 36.213 Table 7.1.7.1-1: MCS -> (modulation order, I_TBS)
MCS_TABLE = [
    (MOD_QPSK, 0), (MOD_QPSK, 1), (MOD_QPSK, 2), (MOD_QPSK, 3), (MOD_QPSK, 4),
    (MOD_QPSK, 5), (MOD_QPSK, 6), (MOD_QPSK, 7), (MOD_QPSK, 8), (MOD_QPSK, 9),
    (MOD_16QAM, 9), (MOD_16QAM, 10), (MOD_16QAM, 11), (MOD_16QAM, 12),
    (MOD_16QAM, 13), (MOD_16QAM, 14), (MOD_16QAM, 15), (MOD_64QAM, 15),
    (MOD_64QAM, 16), (MOD_64QAM, 17), (MOD_64QAM, 18), (MOD_64QAM, 19),
    (MOD_64QAM, 20), (MOD_64QAM, 21), (MOD_64QAM, 22), (MOD_64QAM, 23),
    (MOD_64QAM, 24), (MOD_64QAM, 25), (MOD_64QAM, 26),
]

# 36.213 Table 7.1.7.2.1-1 columns (I_TBS 0..26) for the standard
# bandwidths plus the narrow-allocation columns N_PRB 1..5 (the widths
# DCI type-2 RA can produce; ADVICE r2: scaled fallback overestimated
# these by up to ~10x).
TBS_COLUMNS: dict[int, list[int]] = {
    1: [16, 24, 32, 40, 56, 72, 88, 104, 120, 136, 144, 176, 208, 224,
        256, 280, 328, 336, 376, 408, 440, 488, 520, 552, 584, 616, 712],
    2: [32, 56, 72, 104, 120, 144, 176, 224, 256, 296, 328, 376, 440,
        488, 552, 600, 632, 696, 776, 840, 904, 1000, 1064, 1128, 1192,
        1256, 1480],
    3: [56, 88, 144, 176, 208, 224, 256, 328, 392, 456, 504, 584, 680,
        744, 840, 904, 968, 1064, 1160, 1288, 1384, 1480, 1608, 1736,
        1800, 1864, 2216],
    4: [88, 144, 176, 208, 256, 328, 392, 472, 536, 616, 680, 776, 904,
        1000, 1128, 1224, 1288, 1416, 1544, 1736, 1864, 1992, 2152,
        2280, 2408, 2536, 2984],
    5: [120, 176, 208, 256, 328, 424, 504, 584, 680, 776, 872, 1000,
        1128, 1256, 1416, 1544, 1608, 1800, 1992, 2152, 2344, 2472,
        2664, 2856, 2984, 3112, 3752],
    6: [152, 208, 256, 328, 408, 504, 600, 712, 808, 936, 1032, 1192, 1352,
        1544, 1736, 1800, 1928, 2152, 2344, 2600, 2792, 2984, 3240, 3496,
        3624, 3752, 4392],
    15: [392, 520, 648, 872, 1064, 1320, 1544, 1800, 2024, 2344, 2600, 2984,
         3368, 3880, 4264, 4584, 4968, 5352, 5992, 6456, 6968, 7480, 7992,
         8504, 9144, 9528, 11064],
    25: [680, 904, 1096, 1416, 1800, 2216, 2600, 3112, 3496, 4008, 4392,
         4968, 5736, 6456, 7224, 7736, 7992, 9144, 9912, 10680, 11832,
         12576, 13536, 14112, 15264, 15840, 18336],
    50: [1384, 1800, 2216, 2856, 3624, 4392, 5160, 6200, 6968, 7992, 8760,
         9912, 11448, 12960, 14112, 15264, 16416, 18336, 19848, 21384,
         23688, 25456, 27376, 28336, 30576, 31704, 36696],
    75: [2088, 2728, 3368, 4264, 5352, 6712, 7736, 9144, 10680, 11832,
         12960, 14688, 17568, 19080, 21384, 22920, 24496, 27376, 29296,
         32856, 35160, 37888, 40576, 42368, 45352, 46888, 55056],
    100: [2792, 3624, 4584, 5736, 7224, 8760, 10296, 12216, 14112, 15840,
          17568, 19848, 22920, 25456, 28336, 30576, 32856, 36696, 39232,
          43816, 46888, 51024, 55056, 57336, 61664, 63776, 75376],
}


def mcs_to_mod_itbs(mcs: int) -> tuple[int, int]:
    return MCS_TABLE[mcs]


# The distinct values of 36.213 Table 7.1.7.2.1-1 form a small "valid TBS"
# alphabet (every cell of the full 27x110 table is drawn from it). For
# allocation widths between the standard columns we scale the nearest
# exact column and snap DOWN onto this alphabet, so interpolated grants
# still carry real spec TBS sizes (exact segmentation/filler behavior).
_VALID_TBS = sorted({v for col in TBS_COLUMNS.values() for v in col})


def tbs(i_tbs: int, n_prb: int) -> int:
    if n_prb in TBS_COLUMNS:
        return TBS_COLUMNS[n_prb][i_tbs]
    # fallback for non-standard allocation widths: LINEARLY INTERPOLATE
    # between the surrounding exact columns (monotone in n_prb by
    # construction — nearest-column scaling was not: the anchor switch
    # at the midpoint could step DOWN), then snap down to the largest
    # valid spec TBS <= the estimate (full 110-column table parity
    # tracked in PARITY.md). Below the alphabet floor, fall back to a
    # byte-aligned floor rather than clamping UP (ADVICE r2 medium).
    cols = sorted(TBS_COLUMNS)
    lo = max((c for c in cols if c <= n_prb), default=cols[0])
    hi = min((c for c in cols if c >= n_prb), default=None)
    if hi is None:  # beyond the widest anchor: scale the last column
        approx = TBS_COLUMNS[cols[-1]][i_tbs] * n_prb / cols[-1]
    else:
        t = (n_prb - lo) / (hi - lo)
        approx = (TBS_COLUMNS[lo][i_tbs] * (1.0 - t)
                  + TBS_COLUMNS[hi][i_tbs] * t)
    if approx < _VALID_TBS[0]:
        return max(16, int(approx) // 8 * 8)
    i = int(np.searchsorted(np.asarray(_VALID_TBS), approx, side="right")) - 1
    return _VALID_TBS[max(0, i)]


def dl_grant(n_prb_cell: int, mcs: int, n_prb_alloc: int | None = None,
             prb_start: int = 0, rv: int = 0) -> DlGrant:
    """Build a full-band (default) DL grant for an MCS."""
    if n_prb_alloc is None:
        n_prb_alloc = n_prb_cell
    mod, i_tbs = mcs_to_mod_itbs(mcs)
    return DlGrant(
        n_prb=n_prb_alloc,
        prb_start=prb_start,
        mcs=mcs,
        mod_order=mod,
        tbs=tbs(i_tbs, n_prb_alloc),
        rv=rv,
    )


def cqi_from_snr(snr_db: float) -> int:
    """CQI report from wideband SNR (mirrors ``srslte_cqi_from_snr``,
    ue/src/phy/phch_worker.cc:507-523): ~1.9 dB/CQI step anchored so
    CQI 7 ~ 9 dB (QPSK->16QAM crossover)."""
    table = [-6.7, -4.7, -2.3, 0.2, 2.4, 4.3, 5.9, 8.1, 10.3, 11.7,
             14.1, 16.3, 18.7, 21.0, 22.7]
    c = int(np.searchsorted(np.asarray(table), snr_db))
    return int(np.clip(c, 0, 15))


def mcs_from_cqi(cqi: int) -> int:
    """Rough CQI->MCS mapping for the link-adaptation loop in tests."""
    return int(np.clip(int(cqi * 28 / 15), 0, 28))
