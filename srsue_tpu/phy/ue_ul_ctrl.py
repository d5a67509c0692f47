"""UL control scheduling — SR and periodic-CQI opportunity timing +
payload generation (36.213 §10.1 SR configuration, §7.2.2 periodic CQI;
reference: phch_worker set_uci_sr/set_uci_periodic_cqi
ue/src/phy/phch_worker.cc:479-527 and sr_send_tti).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import ra


def sr_period_offset(i_sr: int) -> tuple[int, int]:
    """36.213 Table 10.1-5: sr-ConfigIndex -> (period, subframe offset)."""
    if i_sr < 5:
        return 5, i_sr
    if i_sr < 15:
        return 10, i_sr - 5
    if i_sr < 35:
        return 20, i_sr - 15
    if i_sr < 75:
        return 40, i_sr - 35
    if i_sr < 155:
        return 80, i_sr - 75
    raise ValueError(f"invalid sr-ConfigIndex {i_sr}")


def sr_opportunity(i_sr: int, tti: int) -> bool:
    p, off = sr_period_offset(i_sr)
    return tti % p == off


def cqi_period_offset(i_cqi: int) -> tuple[int, int]:
    """36.213 Table 7.2.2-1A (wideband): cqi-pmi-ConfigIndex ->
    (period, offset)."""
    if i_cqi < 2:
        return 2, i_cqi
    if i_cqi < 7:
        return 5, i_cqi - 2
    if i_cqi < 17:
        return 10, i_cqi - 7
    if i_cqi < 37:
        return 20, i_cqi - 17
    if i_cqi < 77:
        return 40, i_cqi - 37
    if i_cqi < 157:
        return 80, i_cqi - 77
    if i_cqi < 317:
        return 160, i_cqi - 157
    raise ValueError(f"invalid cqi config index {i_cqi}")


def cqi_opportunity(i_cqi: int, tti: int) -> bool:
    p, off = cqi_period_offset(i_cqi)
    return tti % p == off


# ---------------------------------------------------------------------------
# UE-selected subband reporting (periodic Mode 2-0, 36.213 §7.2.2)
# ---------------------------------------------------------------------------


def subband_geometry(n_prb: int) -> tuple[int, int]:
    """36.213 Table 7.2.2-2: system bandwidth -> (subband size k,
    bandwidth parts J) for UE-selected periodic reports."""
    if n_prb <= 7:
        return n_prb, 1  # wideband only (subband reporting not defined)
    if n_prb <= 10:
        return 4, 1
    if n_prb <= 26:
        return 4, 2
    if n_prb <= 63:
        return 6, 3
    return 8, 4


def subband_count(n_prb: int) -> int:
    k, _ = subband_geometry(n_prb)
    return -(-n_prb // k)


def subband_label_bits(n_prb: int) -> int:
    """L = ceil(log2(ceil(N/J))) label bits identifying the selected
    subband within the bandwidth part (§7.2.2)."""
    k, j = subband_geometry(n_prb)
    n_sb = -(-n_prb // k)
    per_part = -(-n_sb // j)
    return max(1, int(np.ceil(np.log2(max(per_part, 2)))))


def part_subbands(n_prb: int, j: int) -> tuple[int, int]:
    """Subband index range [lo, hi) of bandwidth part j."""
    k, parts = subband_geometry(n_prb)
    n_sb = -(-n_prb // k)
    per = -(-n_sb // parts)
    lo = j * per
    return lo, min(lo + per, n_sb)


def cqi_report_kind(i_cqi: int, tti: int, n_prb: int,
                    subband_k: int | None) -> tuple[str, int] | None:
    """What this TTI's periodic report is (shared by UE and eNB so both
    ends agree on the payload size without extra signalling):
    None | ("wb", 0) | ("sb", bandwidth_part_j). §7.2.2: the wideband
    report recurs every H = J*K + 1 opportunities; between them the
    bandwidth parts cycle."""
    if not cqi_opportunity(i_cqi, tti):
        return None
    if subband_k is None:
        return ("wb", 0)
    p, off = cqi_period_offset(i_cqi)
    i = (tti - off) // p  # opportunity counter
    _, parts = subband_geometry(n_prb)
    h = parts * subband_k + 1
    m = i % h
    if m == 0:
        return ("wb", 0)
    return ("sb", (m - 1) % parts)


@dataclass
class UlCtrlConfig:
    sr_config_index: int | None = None
    sr_pucch_resource: int = 0
    cqi_config_index: int | None = None
    cqi_pucch_resource: int = 0
    # Mode 2-0 (cqi-FormatIndicatorPeriodic subbandCQI): K parameter;
    # None = widebandCQI (phch_worker.cc:509-523 format_is_subband)
    cqi_subband_k: int | None = None
    n_prb: int = 0


class UlCtrl:
    """Per-TTI UL control decisions fed by the DL measurements — the
    glue between chest metrics and PUCCH payloads."""

    def __init__(self, cfg: UlCtrlConfig):
        self.cfg = cfg
        self.last_snr_db: float = 0.0
        self.subband_snr_db: np.ndarray | None = None
        self.metrics = {"cqi_sent": 0, "sr_sent": 0}

    def update_snr(self, snr_db: float) -> None:
        # EMA like phch_common's incremental averaging
        self.last_snr_db = 0.8 * self.last_snr_db + 0.2 * snr_db

    def update_subband_snr(self, snr_db) -> None:
        """Per-subband SNR estimates (len = subband_count(n_prb))."""
        v = np.asarray(snr_db, np.float64)
        if self.subband_snr_db is None or len(self.subband_snr_db) != len(v):
            self.subband_snr_db = v.copy()
        else:
            self.subband_snr_db = 0.8 * self.subband_snr_db + 0.2 * v

    def sr_opportunity(self, tti: int) -> bool:
        return (
            self.cfg.sr_config_index is not None
            and sr_opportunity(self.cfg.sr_config_index, tti)
        )

    def cqi_for_tti(self, tti: int) -> np.ndarray | None:
        """Periodic report payload for this TTI (None when it isn't an
        opportunity). Wideband: 4-bit CQI. Subband (Mode 2-0): 4-bit
        best-subband CQI + L-bit subband label within the current
        bandwidth part."""
        if self.cfg.cqi_config_index is None:
            return None
        kind = cqi_report_kind(self.cfg.cqi_config_index, tti,
                               self.cfg.n_prb, self.cfg.cqi_subband_k)
        if kind is None:
            return None
        self.metrics["cqi_sent"] += 1
        if kind[0] == "wb":
            cqi = ra.cqi_from_snr(self.last_snr_db)
            return ((cqi >> np.arange(3, -1, -1)) & 1).astype(np.uint8)
        if self.subband_snr_db is None:
            # Subband occasion before the first subband measurement: the
            # eNB derives the expected PUCCH format-2 payload size (4+L
            # bits) from the shared schedule alone, so the payload must
            # KEEP the subband shape — label 0 with the wideband CQI —
            # or the bit counts disagree and the decode garbles
            # (ADVICE r4). kind[1] is still consumed so the bandwidth
            # part cycle stays aligned.
            label = 0
            cqi = ra.cqi_from_snr(self.last_snr_db)
        else:
            lo, hi = part_subbands(self.cfg.n_prb, kind[1])
            sub = self.subband_snr_db[lo:hi]
            label = int(np.argmax(sub))
            cqi = ra.cqi_from_snr(float(sub[label]))
        nl = subband_label_bits(self.cfg.n_prb)
        cqi_b = ((cqi >> np.arange(3, -1, -1)) & 1).astype(np.uint8)
        lab_b = ((label >> np.arange(nl - 1, -1, -1)) & 1).astype(np.uint8)
        return np.concatenate([cqi_b, lab_b])
