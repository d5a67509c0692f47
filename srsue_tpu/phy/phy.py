"""UE PHY facade — the reference's ``phy.cc`` + per-TTI worker role in
one front-end object: owns the DL processing (PCFICH -> blind DCI search
for every armed RNTI -> PDSCH decode -> MAC callbacks), the UL assembly
(PRACH, Msg3/PUSCH from RAR grants, DCI-0 granted PUSCH, SR on PUCCH) and
the MAC/RRC-facing control surface (``phy_interface``:
sync_start / prach_send / pdcch_dl_search_* / sr_send / set_timeadv /
configure_* — phy_interface.h:152-199).

Timing model: FDD n+4 — a grant decoded in TTI n is transmitted in
TTI n+4 (HARQ_DELAY), matching ul_harq.cc:133-139. The facade is driven
one subframe at a time by the owner loop: ``work(tti, dl_samples) ->
ul_samples | None`` (the phch_worker 'work_imp' surface without the
thread pool — batching happens inside the jitted stages).
"""

from __future__ import annotations

import numpy as np

from . import chest, control, dci, equalize, ofdm, prach as prach_mod, pusch, ra
from .cell import Cell, UlGrant
from .pdsch import PdschCodec
from .pucch import encode_format1
from ..mac import pdu as pdu_mod
from ..mac.mac import P_RNTI, SI_RNTI
from ..rrc.si_sched import SiConfig, paging_occasion, si_window, sib1_occasion
from ..utils.jaxutil import to_device_complex, to_host

HARQ_DELAY = 4


class Phy:
    PRACH_SF = 1  # PRACH opportunity subframe (prach-ConfigIndex ~3:
    #               one opportunity per frame; both sides gate on it)

    def __init__(self, cell: Cell, mac=None, rrc=None,
                 prach_root: int = 128, prach_zcorr: int = 5,
                 n_pucch_sr: int = 0, noise_floor: float = 1e-3):
        self.cell = cell
        self.mac = mac
        self.rrc = rrc
        self.prach_root = prach_root
        self.prach_zcorr = prach_zcorr
        self.n_pucch_sr = n_pucch_sr
        self.noise_floor = noise_floor

        self.crnti = 0
        self.temp_crnti = 0
        self._rar_window: tuple[int, int, int] | None = None
        self._prach_pending: tuple[int, float] | None = None
        self._sr_pending_tti: int | None = None
        self._ul_sched: dict[int, tuple[UlGrant, int]] = {}  # tti -> (grant, rnti)
        self._phich_wait: dict[int, int] = {}  # phich tti -> our UL tx tti
        self.ta = 0
        self._si_cfg: SiConfig | None = None
        self._paging: tuple[int, int, float] | None = None
        self.metrics = {"dl_ok": 0, "dl_ko": 0, "ul_tx": 0, "snr_db": 0.0}

    # --------------------------------------------------- phy_interface (MAC)
    def sync_start(self):
        pass

    def prach_send(self, preamble_idx: int, power: float, tti: int) -> int:
        self._prach_pending = (preamble_idx, power)
        # transmitted at the next PRACH opportunity (the returned tti
        # feeds the RA-RNTI computation, 36.321 §5.1.4)
        t = tti + 1
        while t % 10 != self.PRACH_SF:
            t += 1
        return t

    def pdcch_dl_search_rar(self, ra_rnti: int, start: int, window: int):
        self._rar_window = (ra_rnti, start, window)

    def pdcch_dl_search_temp_crnti(self, t_crnti: int):
        self.temp_crnti = t_crnti

    def pdcch_dl_search_crnti(self, crnti: int):
        # contention resolved: the temp C-RNTI becomes the C-RNTI and the
        # temp search (with its Msg4 delivery gate) is torn down
        self.crnti = crnti
        self.temp_crnti = 0

    def sr_opportunity(self, tti: int) -> bool:
        return self.n_pucch_sr >= 0

    def sr_send(self, tti: int):
        self._sr_pending_tti = tti

    def set_timeadv(self, ta: int):
        self.ta = ta

    def get_headroom_db(self) -> float:
        return 20.0

    def configure_si(self, cfg: SiConfig):
        """RRC decoded SIB1: SI-RNTI searches now follow its windows."""
        self._si_cfg = cfg

    def configure_paging(self, ue_id: int, t_drx: int = 128,
                         n_b_t: float = 1.0):
        """RRC decoded SIB2 pcch-Config: arm P-RNTI paging-occasion
        searches (36.304 §7; capability-plus vs the reference)."""
        self._paging = (ue_id, t_drx, n_b_t)

    def configure_ul_params(self, sib2):
        pass

    def configure_ul_power(self, cfg):
        self.ul_power_cfg = cfg

    def configure_prach(self, root_seq_index, zero_corr, freq_offset,
                        config_index):
        self.prach_root = root_seq_index
        self.prach_zcorr = zero_corr

    # ------------------------------------------------------------ per-TTI DL
    def work(self, tti: int, dl_samples: np.ndarray) -> np.ndarray | None:
        """Process one DL subframe, return the UL subframe to transmit in
        this TTI (or None)."""
        import jax.numpy as jnp

        sf = tti % 10
        grid = ofdm.demodulate(self.cell, to_device_complex(dl_samples))
        h, nvar, rsrp = chest.estimate(self.cell, grid, sf, port=0)
        g_eq, nv_eff = equalize.zf(grid, h, nvar)
        cfi_dev, _ = control.pcfich_decode(self.cell, g_eq, nv_eff, sf)
        cfi = int(to_host(cfi_dev))

        tx_tti = self._phich_wait.pop(tti, None)
        if tx_tti is not None and self.mac is not None:
            grp, seq = control.phich_group_seq(
                0, 0, control.n_phich_groups(self.cell)
            )
            m = control.phich_decode(self.cell, g_eq, sf, grp, seq)
            self.mac.harq_recv(tx_tti, ack=bool(float(to_host(m)) > 0))
        self.metrics["snr_db"] = float(
            10 * np.log10(max(float(to_host(rsrp)) /
                              max(float(to_host(nvar)), 1e-12), 1e-9))
        )

        searches = []
        si_hit = sib1_occasion(tti)
        if not si_hit:
            if self._si_cfg is not None:
                # SI windows from SIB1 scheduling (mac.cc:215-244)
                si_hit = any(
                    si_window(self._si_cfg, i, tti)
                    for i in range(len(self._si_cfg.si_periodicity_rf))
                )
            else:
                si_hit = sf == 1  # pre-SIB1: search broadly
        if si_hit:
            searches.append((SI_RNTI, "SI", False))
        if self._paging is not None:
            ue_id, t_drx, n_b_t = self._paging
            if paging_occasion(tti, ue_id, n_b_t=n_b_t, t_drx=t_drx):
                searches.append((P_RNTI, "PAGING", False))
        if self._rar_window is not None:
            ra_rnti, start, window = self._rar_window
            if start <= tti < start + window + 2:
                searches.append((ra_rnti, "RAR", False))
            elif tti >= start + window + 2:
                self._rar_window = None
        if self.temp_crnti and self.temp_crnti != self.crnti:
            searches.append((self.temp_crnti, "TEMP_CRNTI", True))
        if self.crnti:
            searches.append((self.crnti, "CRNTI", True))

        dci_len = dci.size_0_1a(self.cell.n_prb)
        for rnti, rnti_type, ue_specific in searches:
            hits = control.pdcch_blind_decode(
                self.cell, g_eq, nv_eff, sf, cfi, rnti, dci_len,
                ue_specific=ue_specific,
            )
            for start_cce, l, bits in hits:
                d = dci.unpack_0_1a(self.cell.n_prb, bits)
                if isinstance(d, dci.Dci0):
                    g = dci.dci0_to_grant(self.cell, d)
                    self._ul_sched[tti + HARQ_DELAY] = (g, rnti)
                    continue
                grant = dci.dci1a_to_grant(self.cell, d)
                self._decode_dlsch(tti, sf, cfi, grid, h, nvar, grant,
                                   rnti, rnti_type, d)

        return self._assemble_ul(tti)

    def _decode_dlsch(self, tti, sf, cfi, grid, h, nvar, grant, rnti,
                      rnti_type, d):
        codec = PdschCodec(self.cell, grant, rnti, sf, cfi)
        x_eq, nv_eff = equalize.zf(
            codec.extract_re(grid), codec.extract_re(h), nvar
        )
        softbuffers = codec.dematch(codec.demap_llrs(x_eq[None], nv_eff[None]))
        if self.mac is None:
            return
        pid = d.harq_pid if hasattr(d, "harq_pid") else 0
        if rnti_type in ("SI", "RAR", "PAGING"):
            ok = self.mac.tb_decoded(pid, codec, softbuffers, rnti_type)
        else:
            self.mac.new_grant_dl(pid, grant, rnti, rnti_type)
            ok = self.mac.tb_decoded(pid, codec, softbuffers, rnti_type)
        self.metrics["dl_ok" if ok else "dl_ko"] += 1
        if rnti_type == "RAR":
            # schedule Msg3 from the RAR UL grant (tti + 6 in the spec;
            # the emulator uses tti_rar + HARQ_DELAY)
            if ok and self.mac.ra.state.name == "CONTENTION_RESOLUTION":
                g = dci.rar_to_ul_grant(self.cell, self.mac.ra.last_rar.grant)
                self._ul_sched[tti + HARQ_DELAY] = (g, self.mac.temp_crnti)

    # ------------------------------------------------------------ per-TTI UL
    def _assemble_ul(self, tti: int) -> np.ndarray | None:
        if self._prach_pending is not None and tti % 10 == self.PRACH_SF:
            idx, power = self._prach_pending
            self._prach_pending = None
            wf = prach_mod.waveform(self.cell, self.prach_root,
                                    self.prach_zcorr, idx)
            self.metrics["ul_tx"] += 1
            out = np.zeros(self.cell.sf_len, np.complex64)
            out[: len(wf)] = wf[: self.cell.sf_len]
            return out
        sched = self._ul_sched.pop(tti, None)
        if sched is not None and self.mac is not None:
            grant, rnti = sched
            payload = self.mac.new_grant_ul(tti, grant.tbs // 8)
            if payload is not None:
                codec = pusch.PuschCodec(self.cell, grant, rnti, tti % 10)
                bits = np.unpackbits(np.frombuffer(payload, np.uint8))
                self.metrics["ul_tx"] += 1
                self._phich_wait[tti + 4] = tti  # HARQ feedback on PHICH
                return codec.encode_sf(bits)
        if self._sr_pending_tti == tti:
            self._sr_pending_tti = None
            grid = encode_format1(self.cell, tti % 10, self.n_pucch_sr,
                                  ack=None)
            from . import ofdm as _ofdm

            return _ofdm.modulate_np(self.cell, grid)
        return None
