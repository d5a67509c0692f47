"""UL HARQ entity — 36.321 §5.4.2 (reference: ue/src/mac/ul_harq.cc).

8 synchronous processes; pid = f(tti_tx) with the 4-ms grant->tx offset
(ul_harq.cc:133-139); RV sequence {0, 2, 3, 1} (ul_harq.cc:148);
adaptive/non-adaptive retransmission; Msg3 special handling; max-retx
count flushes the process.
"""

from __future__ import annotations

from dataclasses import dataclass

RV_SEQ = (0, 2, 3, 1)
N_HARQ_PROC = 8
HARQ_DELAY = 4  # FDD: grant at tti -> tx at tti+4


def pid_of_tti(tti_tx: int) -> int:
    return tti_tx % N_HARQ_PROC


@dataclass
class _UlProc:
    payload: bytes | None = None
    n_retx: int = 0
    current_irv: int = 0
    is_msg3: bool = False
    pending_ack: bool | None = None
    ndi: bool | None = None  # last grant's NDI (toggle = new tx, §5.4.2.1)


class UlHarq:
    def __init__(self, max_retx: int = 5, max_msg3_retx: int = 5):
        self.procs = [_UlProc() for _ in range(N_HARQ_PROC)]
        self.max_retx = max_retx
        self.max_msg3_retx = max_msg3_retx
        self.metrics = {"tx_ok": 0, "tx_ko": 0, "retx": 0, "tx_brate": 0}

    def reset(self) -> None:
        for p in self.procs:
            p.payload = None
            p.n_retx = 0
            p.current_irv = 0

    def new_tx(self, tti_tx: int, payload: bytes, is_msg3: bool = False,
               ndi: bool | None = None) -> int:
        """Start a new transmission; returns rv (always 0)."""
        p = self.procs[pid_of_tti(tti_tx)]
        p.payload = payload
        p.n_retx = 0
        p.current_irv = 0
        p.is_msg3 = is_msg3
        p.ndi = ndi
        self.metrics["tx_brate"] += 8 * len(payload)
        return RV_SEQ[0]

    def is_new_tx(self, tti_tx: int, ndi: bool | None) -> bool:
        """NDI-toggle new-transmission detection for a granted pid
        (ul_harq.cc:216-249): toggled or never-sent NDI = new TB."""
        p = self.procs[pid_of_tti(tti_tx)]
        if p.payload is None:
            return True
        if ndi is None:
            return False
        return p.ndi is None or ndi != p.ndi

    def retx(self, tti_tx: int, adaptive_rv: int | None = None) -> tuple[bytes, int] | None:
        """Retransmission for the process of tti_tx. Non-adaptive advances
        the RV sequence; adaptive uses the DCI-signaled rv. Returns
        (payload, rv) or None if max-retx exceeded (process flushed)."""
        p = self.procs[pid_of_tti(tti_tx)]
        if p.payload is None:
            return None
        limit = self.max_msg3_retx if p.is_msg3 else self.max_retx
        if p.n_retx + 1 >= limit:
            p.payload = None
            self.metrics["tx_ko"] += 1
            return None
        p.n_retx += 1
        self.metrics["retx"] += 1
        if adaptive_rv is None:
            p.current_irv = (p.current_irv + 1) % 4
            rv = RV_SEQ[p.current_irv]
        else:
            rv = adaptive_rv
            p.current_irv = RV_SEQ.index(rv) if rv in RV_SEQ else p.current_irv
        return p.payload, rv

    def harq_feedback(self, tti_tx: int, ack: bool) -> None:
        """PHICH feedback for the transmission made at tti_tx."""
        p = self.procs[pid_of_tti(tti_tx)]
        if ack and p.payload is not None:
            p.payload = None
            p.n_retx = 0
            self.metrics["tx_ok"] += 1

    def has_pending(self, tti_tx: int) -> bool:
        return self.procs[pid_of_tti(tti_tx)].payload is not None
