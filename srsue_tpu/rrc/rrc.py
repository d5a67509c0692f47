"""RRC UE state machine — 36.331 subset (reference: ue/src/upper/rrc.cc,
1036 LoC): IDLE -> SIB acquisition -> connection establishment ->
security activation -> reconfiguration -> CONNECTED; config fan-out to
PHY/MAC (rrc.cc:589-860), NAS transport over SRB1/2.

The reference distributes ~100 scalar parameters through int64 param DBs;
here the fan-out pushes typed config objects to the phy/mac interfaces.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from enum import Enum, auto

from . import messages as M


class RrcState(Enum):
    IDLE = auto()
    PLMN_SELECTION = auto()
    SIB1_SEARCH = auto()
    SIB2_SEARCH = auto()
    WAIT_CON_SETUP = auto()
    COMPLETING_SETUP = auto()
    CONNECTED = auto()


class Rrc:
    def __init__(self, phy=None, mac=None, rlc=None, pdcp=None, nas=None, usim=None):
        self.phy = phy
        self.mac = mac
        self.rlc = rlc
        self.pdcp = pdcp
        self.nas = nas
        self.usim = usim
        self.state = RrcState.IDLE
        self.sib1: dict | None = None
        self.sib2: dict | None = None
        self.ue_crid = os.urandom(5)
        self.transaction_id = 0
        self.eea = 0
        self.eia = 2
        self.connected_cb = None

    # ------------------------------------------------------------- kickoff
    def connect(self) -> None:
        """NAS wants a connection (nas -> rrc_interface_nas)."""
        if self.state == RrcState.CONNECTED:
            self.nas.notify_connection_setup()
            return
        self.state = RrcState.SIB1_SEARCH
        if self.phy is not None:
            self.phy.sync_start()

    # ----------------------------------------------- broadcast reception
    def write_pdu_bcch_bch(self, payload: bytes) -> None:
        """MIB decoded (rrc.cc:132): start SIB search windows."""
        if self.state == RrcState.IDLE:
            self.state = RrcState.SIB1_SEARCH
        if self.mac is not None:
            self.mac_arm_si_search()

    def mac_arm_si_search(self) -> None:
        pass  # receiver loop drives SI windows; hook point for schedulers

    def write_pdu_bcch_dlsch(self, payload: bytes) -> None:
        """SIB container received on SI-RNTI."""
        kind, body = M.unpack(M.BCCH_DLSCH, payload)
        if kind == "sib1":
            self.sib1 = body
            if self.state == RrcState.SIB1_SEARCH:
                self.state = RrcState.SIB2_SEARCH
        elif kind == "sib2":
            self.sib2 = body
            self.apply_sib2_configs(body)
            if self.state == RrcState.SIB2_SEARCH:
                self.send_con_request()

    def apply_sib2_configs(self, sib2: dict) -> None:
        """Config fan-out (rrc.cc:589-721): RACH/PRACH/PUSCH/PUCCH/power
        parameters into MAC + PHY."""
        if self.mac is not None and hasattr(self.mac, "ra"):
            rach = sib2["rach"]
            cfg = self.mac.ra.cfg
            cfg.preamble_trans_max = int(rach["preamble_trans_max"][1:])
            cfg.power_ramp_db = int(rach["power_ramp_step"][2:])
            cfg.response_window = int(rach["response_window"][2:])
            cfg.contention_res_timer = int(rach["contention_res_timer"][2:])
        if self.phy is not None and hasattr(self.phy, "configure_ul_power"):
            from ..phy.powerctrl import UlPowerConfig

            up = sib2["ul_power"]
            self.phy.configure_ul_power(UlPowerConfig(
                p0_nominal_pusch=float(up["p0_nominal_pusch"]) - 126.0,
                alpha={"al0": 0.0, "al04": 0.4, "al05": 0.5, "al06": 0.6,
                       "al07": 0.7, "al08": 0.8, "al09": 0.9, "al1": 1.0}[
                    up["alpha"]],
                p0_nominal_pucch=float(up["p0_nominal_pucch"]) - 127.0,
                delta_preamble_msg3=float(up["delta_preamble_msg3"]),
            ))
        if self.phy is not None and hasattr(self.phy, "configure_prach"):
            pr = sib2["prach"]
            self.phy.configure_prach(
                root_seq_index=pr["root_sequence_index"],
                zero_corr=pr["zero_correlation_zone"],
                freq_offset=pr["freq_offset"],
                config_index=pr["config_index"],
            )
        if self.phy is not None and hasattr(self.phy, "configure_ul_params"):
            self.phy.configure_ul_params(sib2)

    # ----------------------------------------------- connection establishment
    def send_con_request(self) -> None:
        self.state = RrcState.WAIT_CON_SETUP
        msg = M.pack(
            M.UL_CCCH,
            ("rrcConnectionRequest", {"ue_id": self.ue_crid, "cause": "mo-Signalling"}),
        )
        # CCCH SDU -> MAC triggers RA with this as Msg3 (mac.cc:186-190);
        # MAC derives the contention-resolution id from the SDU itself
        self.mac.start_ra(msg)

    def ra_completed(self) -> None:
        pass  # PDCCH now armed on C-RNTI; ConnectionSetup arrives on DL-CCCH

    # ----------------------------------------------- PDCP -> RRC delivery
    def write_pdu(self, lcid: int, payload: bytes) -> None:
        if lcid == 0:
            self._handle_dl_ccch(payload)
        else:
            self._handle_dl_dcch(payload)

    def _handle_dl_ccch(self, payload: bytes) -> None:
        kind, body = M.unpack(M.DL_CCCH, payload)
        if kind == "rrcConnectionSetup":
            self.handle_con_setup(body)
        elif kind == "rrcConnectionReject":
            self.state = RrcState.IDLE

    def handle_con_setup(self, setup: dict) -> None:
        """rrc.cc:723: apply SRB1 + dedicated config, send SetupComplete
        with the NAS AttachRequest piggybacked."""
        srb1 = setup["srb1_config"]
        self.rlc.add_bearer_default_srb(1)
        self.pdcp.add_bearer(1)
        if self.mac is not None and hasattr(self.mac, "mux"):
            self.mac.mux.set_priority(1, priority=srb1["priority"], pbr_bytes_per_tti=-1)
        self.state = RrcState.COMPLETING_SETUP
        nas_pdu = self.nas.get_attach_request() if self.nas else b""
        msg = M.pack(
            M.UL_DCCH,
            (
                "rrcConnectionSetupComplete",
                {"transaction_id": 0, "selected_plmn": 1, "nas_pdu": nas_pdu},
            ),
        )
        self.pdcp.write_sdu(1, msg)
        self.state = RrcState.CONNECTED
        if self.nas:
            self.nas.notify_connection_setup()
        if self.connected_cb:
            self.connected_cb()

    def _handle_dl_dcch(self, payload: bytes) -> None:
        kind, body = M.unpack(M.DL_DCCH, payload)
        if kind == "dlInformationTransfer":
            self.nas.write_pdu(body["nas_pdu"])
        elif kind == "securityModeCommand":
            self._handle_security_mode(body)
        elif kind == "ueCapabilityEnquiry":
            self._send_capability_info(body["transaction_id"])
        elif kind == "rrcConnectionReconfiguration":
            self._handle_reconfig(body)
        elif kind == "rrcConnectionRelease":
            self.state = RrcState.IDLE
            self.rlc.reestablish()

    def _handle_security_mode(self, body: dict) -> None:
        """rrc.cc:499-501: trigger AS key derivation + integrity on."""
        self.eea, self.eia = body["eea"], body["eia"]
        if self.usim is not None:
            nas_count = self.nas.k_enb_nas_count if self.nas else 0
            self.usim.generate_as_keys(nas_count, self.eea, self.eia)
            self.pdcp.config_security_all(
                self.usim.keys["rrc_enc"], self.usim.keys["rrc_int"]
            )
        self.pdcp.enable_integrity(1)
        msg = M.pack(
            M.UL_DCCH, ("securityModeComplete", {"transaction_id": body["transaction_id"]})
        )
        self.pdcp.write_sdu(1, msg)

    def _send_capability_info(self, tid: int) -> None:
        msg = M.pack(
            M.UL_DCCH,
            (
                "ueCapabilityInformation",
                {"transaction_id": tid, "ue_category": 5, "rohc_supported": False},
            ),
        )
        self.pdcp.write_sdu(1, msg)

    def _handle_reconfig(self, body: dict) -> None:
        if body.get("drb_configs"):
            for drb in body["drb_configs"]:
                lcid = drb["lcid"]
                from ..rlc import RlcMode
                from ..pdcp.pdcp import PdcpConfig

                mode = {"tm": RlcMode.TM, "um": RlcMode.UM, "am": RlcMode.AM}[
                    drb["rlc_mode"]
                ]
                self.rlc.add_bearer(lcid, mode)
                self.pdcp.add_bearer(
                    lcid,
                    PdcpConfig(sn_bits=drb.get("pdcp_sn_bits") or 12, bearer_id=lcid),
                )
                if self.mac is not None and hasattr(self.mac, "mux"):
                    pbr = drb["pbr_kbps"] / 8.0  # kbps -> bytes/TTI(1ms)
                    self.mac.mux.set_priority(lcid, drb["priority"], pbr)
                    if hasattr(self.mac, "bsr"):
                        self.mac.bsr.set_lcg(lcid, lcg=2, priority=drb["priority"])
        if body.get("nas_pdu"):
            self.nas.write_pdu(body["nas_pdu"])
        msg = M.pack(
            M.UL_DCCH,
            (
                "rrcConnectionReconfigurationComplete",
                {"transaction_id": body["transaction_id"]},
            ),
        )
        self.pdcp.write_sdu(1, msg)

    # ----------------------------------------------- NAS uplink transport
    def write_sdu_nas(self, nas_pdu: bytes) -> None:
        msg = M.pack(M.UL_DCCH, ("ulInformationTransfer", {"nas_pdu": nas_pdu}))
        self.pdcp.write_sdu(1, msg)

    def max_retx_attempted(self) -> None:
        """RLC AM gave up (rrc.cc:194-197 TODO in the reference): go IDLE."""
        self.state = RrcState.IDLE
