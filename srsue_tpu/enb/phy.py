"""eNB PHY + scheduler emulator — generates real downlink subframe
waveforms per TTI and receives the UE's uplink waveforms (PRACH detect,
PUSCH decode, PUCCH SR/ACK detect).

The reference's PHY/MAC tests run against a live commercial eNodeB over
the air (SURVEY.md §4.3); this module is the hermetic stand-in: a
time-master that schedules SIBs (SI windows), answers PRACH with RARs,
grants Msg3/UL, carries the EnbStack's RLC PDUs on PDSCH, and ACKs
uplink on PHICH-equivalent feedback.

Simplifications (documented, not hidden): zero timing advance channel
(perfect alignment), one UL grant profile, no HARQ retransmission on the
DL (the UE's combining is covered by dedicated tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..mac import pdu as pdu_mod
from ..phy import control, dci, enb_tx, pbch, prach, pusch, ra
from ..phy.cell import Cell, UlGrant
from ..phy.pdsch import PdschCodec
from ..rrc.si_sched import paging_occasion, sib1_occasion
from .stack import EnbStack

RA_RESPONSE_DELAY = 4
MSG3_DELAY = 4
CFI = 2


@dataclass
class _PendingDl:
    lcid: int
    pdu: bytes
    con_res: bytes | None = None
    t_crnti: bool = False


class EnbPhy:
    """Drives an EnbStack over real waveforms, one subframe per tti()."""

    def __init__(self, cell: Cell, stack: EnbStack, seed: int = 0,
                 prach_root: int = 128, prach_zcorr: int = 5):
        self.cell = cell
        self.stack = stack
        self.rng = np.random.default_rng(seed)
        self.prach_root = prach_root
        self.prach_zcorr = prach_zcorr
        self.crnti = stack.t_crnti
        self.sfn = 0
        # pending transmissions keyed by tti
        self._rar_at: dict[int, int] = {}  # tti -> preamble idx
        self._ul_grants: dict[int, UlGrant] = {}  # tti the UE must TX in
        self._msg3_tti: int | None = None
        self._ue_connected = False
        self._need_con_res = False
        self._phich_at: dict[int, bool] = {}  # tti -> ack
        self._page_pending: tuple[int, bytes] | None = None  # (ue_id, pcch)
        self._page_t_drx = 128
        self._page_nb_t = 1.0
        self.events: list[str] = []
        self._mcs_data = 6
        self._ul_mcs = 4
        self._ndi = False
        # fixed allocation buckets: keeps the number of distinct jitted
        # PDSCH configurations (and test compile time) small
        self._alloc_buckets = [4, 10, min(25, cell.n_prb), cell.n_prb]

    # ------------------------------------------------------------- downlink
    def build_dl_subframe(self, tti: int) -> np.ndarray:
        cell = self.cell
        sf = tti % 10
        self.sfn = tti // 10
        grid = enb_tx.empty_grid(cell)
        enb_tx.add_crs(cell, grid, sf, 0)
        enb_tx.add_sync(cell, grid, sf)
        control.pcfich_map(cell, grid, sf, CFI)

        ack = self._phich_at.pop(tti, None)
        if ack is not None:
            grp, seq = control.phich_group_seq(0, 0, control.n_phich_groups(cell))
            control.phich_map(cell, grid, sf, grp, seq, ack)

        if sf == 0:
            mib = pbch.Mib(cell.n_prb, "normal", 1.0, self.sfn)
            cw = pbch.encode(cell, mib, n_ports=1)
            pbch.map_to_grid(cell, grid,
                             pbch.frame_symbols(cell, cw, self.sfn % 4))
        if sib1_occasion(tti):
            self._map_dlsch(grid, sf, self.stack.make_sib1(), 0xFFFF, bcch=True)
        elif sf == 1 and self.sfn % 2 == 0:
            self._map_dlsch(grid, sf, self.stack.make_sib2(), 0xFFFF, bcch=True)
        elif self._page_pending is not None and paging_occasion(
                tti, self._page_pending[0], n_b_t=self._page_nb_t,
                t_drx=self._page_t_drx):
            _, pcch = self._page_pending
            self._page_pending = None
            self._map_dlsch(grid, sf, pcch, 0xFFFE, bcch=True)
            self.events.append("paging_sent")
        elif tti in self._rar_at:
            idx = self._rar_at.pop(tti)
            msg3_tti = tti + MSG3_DELAY
            g20 = pdu_mod.RarGrant(False, dci.riv_encode(cell.n_prb, 0, 4),
                                   self._ul_mcs, 0, False, False)
            self._ul_grants[msg3_tti] = dci.rar_to_ul_grant(cell, g20)
            self._msg3_tti = msg3_tti
            rar = pdu_mod.Rar(idx, ta=0, grant=g20, t_crnti=self.crnti)
            ra_rnti = getattr(self, "_rar_rnti", 1 + (tti % 10))
            self._map_dlsch(grid, sf, pdu_mod.pack_rar_pdu([rar], pdu_len=16),
                            ra_rnti)
            self.events.append("rar_sent")
        else:
            sent = self._drain_stack_dl(grid, sf) if sf in (3, 7) else False
            if not sent and self._ue_connected and sf == 4:
                # periodic UL grant (DCI format 0 on the UE's C-RNTI)
                d0 = dci.Dci0(riv=dci.riv_encode(cell.n_prb, 0, 4),
                              mcs=self._ul_mcs, ndi=True, tpc=0)
                self._ul_grants[tti + MSG3_DELAY] = dci.dci0_to_grant(cell, d0)
                n_cce, _ = control.pdcch_geometry(cell, CFI)
                cands = control.search_space_candidates(n_cce, self.crnti, sf)
                start, l = [c for c in cands if c[1] >= 4][0]
                control.pdcch_map(cell, grid, sf, CFI,
                                  dci.pack_0(cell.n_prb, d0), self.crnti,
                                  start, l)

        return enb_tx.to_waveform(self.cell, [grid])[0]

    def page(self, imsi: str, t_drx: int = 128, n_b_t: float = 1.0) -> None:
        """Queue a Paging message for the UE; transmitted with P-RNTI at
        the UE's next paging occasion (36.304 §7)."""
        self._page_pending = (int(imsi) % 1024, self.stack.make_paging(imsi))
        self._page_t_drx = t_drx
        self._page_nb_t = n_b_t

    def _drain_stack_dl(self, grid, sf) -> bool:
        """Carry one pending SRB PDU (with Msg4 CON_RES when needed)."""
        for lcid, ent in ((0, self.stack.srb0), (1, self.stack.srb1),
                          (3, self.stack.drb)):
            pdu = ent.read_pdu(200)
            if not pdu:
                continue
            mac_pdu = pdu_mod.MacPdu()
            t_crnti = False
            if lcid == 0 and self._need_con_res:
                # Msg4: contention resolution CE + the DL-CCCH SDU
                mac_pdu.add_ce(pdu_mod.LCID_CON_RES, self._msg3_crid)
                self._need_con_res = False
                t_crnti = True
            mac_pdu.add_sdu(lcid, pdu)
            raw = pdu_mod.pack(mac_pdu, len(pdu) + 12)
            self._map_dlsch(grid, sf, raw, self.crnti, temp_crnti=t_crnti)
            self.events.append(f"dl_lcid{lcid}")
            return True
        return False

    def _map_dlsch(self, grid, sf, payload: bytes, rnti: int,
                   bcch: bool = False, temp_crnti: bool = False):
        cell = self.cell
        mcs = self._mcs_data
        # pick a bucketed allocation with TBS >= payload
        for n_prb in self._alloc_buckets:
            g = ra.dl_grant(cell.n_prb, mcs, n_prb_alloc=n_prb)
            if g.tbs >= 8 * len(payload):
                break
        codec = PdschCodec(cell, g, rnti, sf, CFI)
        if not bcch and rnti == self.crnti:
            self._ndi = not self._ndi  # NDI toggle: every DL-SCH is new
        d = dci.Dci1A(riv=dci.riv_encode(cell.n_prb, 0, g.n_prb), mcs=mcs,
                      harq_pid=0, ndi=self._ndi, rv=0, tpc=0)
        if rnti >= 0xFFFE or rnti <= 10:
            start, l = 0, 4  # common search space (SI/P/RA-RNTI)
        else:
            n_cce, _ = control.pdcch_geometry(cell, CFI)
            cands = control.search_space_candidates(n_cce, rnti, sf)
            start, l = [c for c in cands if c[1] >= 4][0]
        control.pdcch_map(cell, grid, sf, CFI, dci.pack_1a(cell.n_prb, d),
                          rnti, start, l)
        bits = np.zeros(g.tbs, np.uint8)
        pb = np.unpackbits(np.frombuffer(payload, np.uint8))[: g.tbs]
        bits[: len(pb)] = pb
        codec.map_to_grid(grid, codec.encode_symbols(bits))

    # --------------------------------------------------------------- uplink
    PRACH_SF = 1  # must match the UE's PRACH opportunity gating

    def receive_ul(self, tti: int, samples: np.ndarray | None) -> None:
        if samples is None:
            return
        # PRACH detection only in configured PRACH subframes
        hits = []
        if tti % 10 == self.PRACH_SF:
            hits = prach.detect(self.cell, samples, self.prach_root,
                                self.prach_zcorr, threshold=10.0)
        if hits:
            best = max(hits, key=lambda h: h[1])[0]
            # answer in the next subframe-6 at least RA_RESPONSE_DELAY out
            # (fixed RAR subframe keeps the jitted-config population small)
            t = tti + RA_RESPONSE_DELAY
            while t % 10 != 6:
                t += 1
            self._rar_at[t] = best
            self._rar_rnti = 1 + (tti % 10)
            self.events.append(f"prach_{best}")
            return
        g = self._ul_grants.pop(tti, None)
        if g is not None:
            import jax.numpy as jnp

            from ..utils.jaxutil import to_device_complex, to_host

            codec = pusch.PuschCodec(self.cell, g, self.crnti, tti % 10)
            bits, ok = codec.decode_sf(to_device_complex(samples[None]),
                                       noise_var=1e-4)
            good = bool(to_host(ok).all())
            self._phich_at[tti + 4] = good  # HARQ feedback rides PHICH
            if good:
                raw = np.packbits(to_host(bits)[0].astype(np.uint8)).tobytes()
                self._on_ul_mac_pdu(raw, tti)

    def _on_ul_mac_pdu(self, raw: bytes, tti: int) -> None:
        parsed = pdu_mod.unpack(raw, uplink=True)
        for sh in parsed.subheaders:
            if sh.lcid == pdu_mod.LCID_CCCH and sh.payload:
                self._msg3_crid = sh.payload[:6].ljust(6, b"\x00")
                self.stack.srb0.write_pdu(sh.payload)
                self._ue_connected = True
                self._need_con_res = True
                self.events.append("msg3")
            elif sh.lcid in (1, 2, 3) and sh.payload:
                ent = {1: self.stack.srb1, 3: self.stack.drb}.get(sh.lcid)
                if ent is not None:
                    ent.write_pdu(sh.payload)
                self.events.append(f"ul_lcid{sh.lcid}")

    def ul_grant_for(self, tti: int) -> UlGrant | None:
        return self._ul_grants.get(tti)
