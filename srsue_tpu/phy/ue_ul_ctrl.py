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


@dataclass
class UlCtrlConfig:
    sr_config_index: int | None = None
    sr_pucch_resource: int = 0
    cqi_config_index: int | None = None
    cqi_pucch_resource: int = 0


class UlCtrl:
    """Per-TTI UL control decisions fed by the DL measurements — the
    glue between chest metrics and PUCCH payloads."""

    def __init__(self, cfg: UlCtrlConfig):
        self.cfg = cfg
        self.last_snr_db: float = 0.0
        self.metrics = {"cqi_sent": 0, "sr_sent": 0}

    def update_snr(self, snr_db: float) -> None:
        # EMA like phch_common's incremental averaging
        self.last_snr_db = 0.8 * self.last_snr_db + 0.2 * snr_db

    def sr_opportunity(self, tti: int) -> bool:
        return (
            self.cfg.sr_config_index is not None
            and sr_opportunity(self.cfg.sr_config_index, tti)
        )

    def cqi_for_tti(self, tti: int) -> np.ndarray | None:
        """4-bit wideband CQI payload when this TTI is a reporting
        opportunity (None otherwise)."""
        if self.cfg.cqi_config_index is None:
            return None
        if not cqi_opportunity(self.cfg.cqi_config_index, tti):
            return None
        cqi = ra.cqi_from_snr(self.last_snr_db)
        self.metrics["cqi_sent"] += 1
        return ((cqi >> np.arange(3, -1, -1)) & 1).astype(np.uint8)
