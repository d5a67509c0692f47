"""eNB upper-stack emulator: RRC + NAS/MME responder driving a UE through
the full attach call flow (ConnectionSetup, authentication, NAS+AS
security, capability enquiry, DRB setup with AttachAccept), speaking the
same RRC/NAS codecs and RLC/PDCP entities as the UE (peer-configured).

Transport coupling is at the RLC-PDU level: `pump()` exchanges PDUs both
ways with configurable grant sizes — the MAC/PHY path below is exercised
by the PHY-level tests; this keeps the control-plane flow hermetic (the
layer-pair pattern of ue/test/upper/rlc_am_test.cc generalized to the
whole upper stack).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..nas import messages as NM
from ..pdcp.pdcp import PdcpConfig, PdcpEntity
from ..rlc.rlc_am import AmConfig, RlcAm
from ..rlc.rlc_tm import RlcTm
from ..rrc import messages as M
from ..usim import security as sec
from ..usim.usim import Usim, UsimConfig


class EnbStack:
    def __init__(self, ue_usim_cfg: UsimConfig | None = None):
        # the "HSS": knows the UE's K/OPc to run AKA
        self.hss = Usim(ue_usim_cfg or UsimConfig())
        self.rand = os.urandom(16)
        self.sqn = bytes(6)
        self.k_asme: bytes | None = None
        self.k_nas_int: bytes | None = None
        self.nas_count_dl = 0
        self.nas_count_ul = 0
        self.eea, self.eia = 0, 2

        self.srb0 = RlcTm(write_up=self._on_ccch)
        self.srb1 = RlcAm(
            AmConfig(), write_up=self._on_dcch
        )
        pc = PdcpConfig(is_control=True, bearer_id=1, tx_direction=1, rx_direction=0)
        self.pdcp1 = PdcpEntity(1, pc, self.srb1.write_sdu, self._on_dcch_sdu)
        # user-plane DRB peer (data loops back here in E2E tests)
        self.drb = RlcAm(AmConfig(), write_up=self._on_drb_pdu)
        self.drb_pdcp = PdcpEntity(
            3, PdcpConfig(sn_bits=12, bearer_id=3, tx_direction=1, rx_direction=0),
            self.drb.write_sdu, self._on_user_packet,
        )
        self.rx_packets: list[bytes] = []
        self.state = "idle"
        self.reconfig_complete = False
        self.t_crnti = 0x4601
        self.events: list[str] = []
        self.attach_request: NM.AttachRequest | None = None
        self.drb_lcid = 3
        self.ue_ip = "172.16.0.2"

    # ------------------------------------------------- broadcast
    def make_sib1(self) -> bytes:
        return M.pack(M.BCCH_DLSCH, ("sib1", {
            "plmn": {"mcc": 1, "mnc": 1}, "tac": 0x1234, "cell_id": 0x0101,
            "cell_barred": False, "intra_freq_resel": True, "q_rx_lev_min": 10,
            "freq_band": 7, "si_window_len": "ms20", "si_periodicity": "rf16",
            "sys_info_value_tag": 0,
        }))

    def make_sib2(self) -> bytes:
        return M.pack(M.BCCH_DLSCH, ("sib2", {
            "rach": {"n_preambles": "n52", "preamble_init_power": "dbm-104",
                     "power_ramp_step": "db4", "preamble_trans_max": "n10",
                     "response_window": "sf10", "contention_res_timer": "sf64",
                     "max_harq_msg3_tx": 5},
            "prach": {"root_sequence_index": 128, "config_index": 3,
                      "high_speed_flag": False, "zero_correlation_zone": 5,
                      "freq_offset": 2},
            "pusch": {"n_sb": 1, "hopping_mode": "interSubFrame",
                      "hopping_offset": 2, "enable_64qam": False,
                      "group_hopping": False, "group_assignment": 0,
                      "seq_hopping": False, "cyclic_shift": 0},
            "pucch": {"delta_shift": "ds1", "n_rb_cqi": 1, "n_cs_an": 0,
                      "n1_pucch_an": 2},
            "ul_power": {"p0_nominal_pusch": 41, "alpha": "al07",
                         "p0_nominal_pucch": 21, "delta_preamble_msg3": 6},
            "pdsch_rs_power": 60, "phich_duration": "normal",
            "phich_resources": "one", "sr_config_index": 17,
            "ul_bandwidth": None, "additional_spectrum_emission": 1,
            "time_alignment_timer": "sf10240",
        }))

    # ------------------------------------------------- RLC-facing plumbing
    def _on_ccch(self, sdu: bytes) -> None:
        kind, body = M.unpack(M.UL_CCCH, sdu)
        if kind == "rrcConnectionRequest":
            self.events.append("con_request")
            setup = M.pack(
                M.DL_CCCH,
                (
                    "rrcConnectionSetup",
                    {
                        "srb1_config": {
                            "lcid": 1, "rlc_mode": "am", "priority": 1,
                            "pbr_kbps": 0, "pdcp_sn_bits": None,
                        },
                        "phys_config": {
                            "cqi_period": 40, "cqi_pucch_resource": 0,
                            "sr_config_index": 17, "sr_pucch_resource": 1,
                            "p_srs_offset": None, "ant_mode": "tm1",
                        },
                    },
                ),
            )
            self.srb0.write_sdu(setup)
            self.state = "wait_setup_complete"

    def _on_dcch(self, pdu: bytes) -> None:
        self.pdcp1.write_pdu(pdu)

    def _on_drb_pdu(self, pdu: bytes) -> None:
        self.drb_pdcp.write_pdu(pdu)

    def _on_user_packet(self, lcid: int, sdu: bytes) -> None:
        self.rx_packets.append(sdu)

    def send_user_packet(self, pkt: bytes) -> None:
        self.drb_pdcp.write_sdu(pkt)

    def _on_dcch_sdu(self, lcid: int, sdu: bytes) -> None:
        kind, body = M.unpack(M.UL_DCCH, sdu)
        self.events.append(kind)
        if kind == "rrcConnectionSetupComplete":
            self.attach_request = NM.AttachRequest.unpack(body["nas_pdu"])
            self._send_auth_request()
        elif kind == "ulInformationTransfer":
            self._on_nas(body["nas_pdu"])
        elif kind == "securityModeComplete":
            self._send_capability_enquiry()
        elif kind == "ueCapabilityInformation":
            self._send_reconfiguration_with_attach_accept()
        elif kind == "rrcConnectionReconfigurationComplete":
            self.reconfig_complete = True

    # ------------------------------------------------- NAS/MME side
    def _send_dl_info(self, nas_pdu: bytes) -> None:
        msg = M.pack(
            M.DL_DCCH,
            ("dlInformationTransfer", {"transaction_id": 0, "nas_pdu": nas_pdu}),
        )
        self.pdcp1.write_sdu(msg)

    def _send_auth_request(self) -> None:
        autn = self._make_autn()
        nas = NM.AuthRequest(self.rand, autn).pack()
        self._send_dl_info(nas)
        self.state = "wait_auth"

    def _make_autn(self) -> bytes:
        res, ck, ik, ak = sec.milenage_f2345(self.hss.cfg.k, self.hss.opc, self.rand)
        mac_a, _ = sec.milenage_f1(
            self.hss.cfg.k, self.hss.opc, self.rand, self.sqn, self.hss.cfg.amf
        )
        sqn_xor_ak = bytes(a ^ b for a, b in zip(self.sqn, ak))
        self.expected_res = res
        plmn = Usim._plmn_bytes(1, 1)
        self.k_asme = sec.kdf_k_asme(ck, ik, plmn, sqn_xor_ak)
        return sqn_xor_ak + self.hss.cfg.amf + mac_a

    def _on_nas(self, pdu: bytes) -> None:
        sec_type, mac4, seq, plain = NM.secure_unwrap(pdu)
        if sec_type != NM.SEC_NONE and self.k_nas_int is not None:
            want = sec.eia2(self.k_nas_int, self.nas_count_ul, 0, 0,
                            bytes([seq]) + plain)
            if want != mac4:
                self.events.append("nas_integrity_fail")
                return
            self.nas_count_ul += 1
        mt = NM.msg_type_of(plain)
        if mt == NM.MT_AUTH_RESPONSE:
            resp = NM.AuthResponse.unpack(plain)
            assert resp.res == self.expected_res, "AKA RES mismatch"
            self.events.append("auth_ok")
            self._send_nas_security_mode()
        elif mt == NM.MT_SECURITY_MODE_COMPLETE:
            self.events.append("nas_smc_ok")
            self._send_rrc_security_mode()
        elif mt == NM.MT_ATTACH_COMPLETE:
            self.events.append("attach_complete")
            self.state = "attached"

    def _send_nas_security_mode(self) -> None:
        self.k_nas_int = sec.kdf_nas(self.k_asme, self.eia, is_integrity=True)
        nas = NM.SecurityModeCommand(self.eea, self.eia).pack()
        self._send_dl_info(nas)

    def _send_rrc_security_mode(self) -> None:
        # derive AS keys like the UE will (nas ul count snapshot = 0)
        k_enb = sec.kdf_k_enb(self.k_asme, 0)
        self.pdcp1.config_security(
            sec.kdf_as(k_enb, self.eea, "rrc_enc"),
            sec.kdf_as(k_enb, self.eia, "rrc_int"),
        )
        msg = M.pack(
            M.DL_DCCH,
            ("securityModeCommand",
             {"transaction_id": 1, "eea": self.eea, "eia": self.eia}),
        )
        self.pdcp1.write_sdu(msg)
        self.pdcp1.enable_integrity()

    def _send_capability_enquiry(self) -> None:
        msg = M.pack(M.DL_DCCH, ("ueCapabilityEnquiry", {"transaction_id": 2}))
        self.pdcp1.write_sdu(msg)

    def _send_reconfiguration_with_attach_accept(self) -> None:
        esm = NM.ActivateDefaultBearerRequest(ip_addr=self.ue_ip).pack()
        nas = NM.AttachAccept(esm_pdu=esm, guti=os.urandom(10)).pack()
        mac4 = sec.eia2(self.k_nas_int, self.nas_count_dl, 0, 1,
                        bytes([self.nas_count_dl & 0xFF]) + nas)
        nas_sec = NM.secure_wrap(nas, self.nas_count_dl, mac4)
        self.nas_count_dl += 1
        msg = M.pack(
            M.DL_DCCH,
            (
                "rrcConnectionReconfiguration",
                {
                    "transaction_id": 3,
                    "nas_pdu": nas_sec,
                    "drb_configs": [
                        {"lcid": self.drb_lcid, "rlc_mode": "am", "priority": 4,
                         "pbr_kbps": 8, "pdcp_sn_bits": 12}
                    ],
                    "phys_config": None,
                },
            ),
        )
        self.pdcp1.write_sdu(msg)

    # ------------------------------------------------- transport pump
    def pump(self, ue_rlc, n_rounds: int = 20, grant: int = 1000) -> None:
        """Exchange SRB0/SRB1 RLC PDUs with the UE's RLC container until
        quiescent (both directions, generous grants)."""
        for _ in range(n_rounds):
            moved = False
            for lcid, enb_ent in ((0, self.srb0), (1, self.srb1), (3, self.drb)):
                pdu = ue_rlc.read_pdu(lcid, grant)
                if pdu:
                    enb_ent.write_pdu(pdu)
                    moved = True
                pdu = enb_ent.read_pdu(grant)
                if pdu:
                    ue_rlc.write_pdu(lcid, pdu)
                    moved = True
            if not moved:
                break
