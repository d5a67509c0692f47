"""Full-stack attach: UE (MAC RA + RRC + NAS + PDCP + RLC) against the
eNB/core emulator — the reference's attach bring-up call flow
(SURVEY.md §3.1) run hermetically, plus user-plane data after attach."""

import numpy as np

from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.mac import pdu as pdu_mod
from srsue_tpu.ue import Ue


class RaPhy:
    """phy-interface fake that lets the MAC RA procedure run against the
    eNB emulator at MAC-PDU level (ue_itf_test_prach.cc analogue)."""

    def __init__(self):
        self.prach_tx = []
        self.ta = None

    def sync_start(self):
        pass

    def sr_opportunity(self, tti):
        return True

    def sr_send(self, tti):
        pass

    def prach_send(self, preamble_idx, power, tti):
        self.prach_tx.append((preamble_idx, power, tti))
        return tti

    def pdcch_dl_search_rar(self, ra_rnti, start, window):
        pass

    def pdcch_dl_search_temp_crnti(self, t_crnti):
        pass

    def pdcch_dl_search_crnti(self, crnti):
        pass

    def set_timeadv(self, ta):
        self.ta = ta

    def get_headroom_db(self):
        return 20.0

    def configure_ul_params(self, sib2):
        pass


def _run_attach(ue: Ue, enb: EnbStack, max_ttis: int = 200):
    phy = ue.phy
    # broadcast acquisition: MIB -> SIB1 -> SIB2 (drives rrc to RA kickoff)
    ue.rrc.write_pdu_bcch_bch(b"\x00" * 3)
    ue.rrc.write_pdu_bcch_dlsch(enb.make_sib1())
    ue.rrc.write_pdu_bcch_dlsch(enb.make_sib2())
    tti = 0
    while tti < max_ttis and not ue.is_attached:
        ue.run_tti(tti)
        # eNB side: respond to PRACH with a RAR for the sent preamble
        if phy.prach_tx and ue.mac.ra.state.name == "RESPONSE_RECEPTION":
            idx, power, ptti = phy.prach_tx.pop(0)
            grant = pdu_mod.RarGrant(False, 10, 2, 0, False, False)
            rar = pdu_mod.Rar(idx, ta=31, grant=grant, t_crnti=enb.t_crnti)
            ue.mac.ra.rar_received(pdu_mod.pack_rar_pdu([rar]))
            # UE answers with Msg3 (CCCH SDU inside a MAC PDU)
            msg3_mac = ue.mac.new_grant_ul(tti + 4, grant_bytes=64).payload
            parsed = pdu_mod.unpack(msg3_mac, uplink=True)
            ccch_sdu = b""
            for sh in parsed.subheaders:
                if sh.lcid == pdu_mod.LCID_CCCH:
                    ccch_sdu = sh.payload
                    enb.srb0.write_pdu(sh.payload)
            ue.mac.harq_recv(tti + 4, ack=True)
            # eNB Msg4: contention resolution CE (echoes Msg3 first 48
            # bits, 36.321 §5.1.5) + ConnectionSetup on SRB0
            m4 = pdu_mod.MacPdu()
            m4.add_ce(pdu_mod.LCID_CON_RES, ccch_sdu[:6].ljust(6, b"\0"))
            dl_ccch = enb.srb0.read_pdu(1000)
            if dl_ccch:
                m4.add_sdu(0, dl_ccch)
            ue.mac._deliver_temp_crnti = True
            ue.mac._deliver(0, pdu_mod.pack(m4, 200))
        # upper-layer transport
        enb.pump(ue.rlc)
        tti += 1
    return tti


def test_full_attach_flow():
    ue = Ue(phy=RaPhy())
    enb = EnbStack(ue.usim.cfg)
    ue.attach()
    ttis = _run_attach(ue, enb)
    assert ue.is_attached, f"attach failed; enb events: {enb.events}"
    assert enb.state == "attached"
    # call-flow order checkpoints (SURVEY.md §3.1)
    ev = enb.events
    assert "con_request" in ev
    assert ev.index("con_request") < ev.index("rrcConnectionSetupComplete")
    assert ev.index("auth_ok") < ev.index("nas_smc_ok")
    assert ev.index("nas_smc_ok") < ev.index("securityModeComplete")
    assert "ueCapabilityInformation" in ev
    assert "attach_complete" in ev
    # RA completed: C-RNTI installed, TA applied
    assert ue.mac.crnti == enb.t_crnti
    assert ue.phy.ta == 31
    # GW got its address from the AttachAccept ESM payload
    assert ue.gw.ip_addr == enb.ue_ip
    # AS security actually on: SRB1 PDCP integrity active both sides
    assert ue.pdcp.entities[1].integrity_active


def test_user_plane_after_attach():
    ue = Ue(phy=RaPhy())
    enb = EnbStack(ue.usim.cfg)
    ue.attach()
    _run_attach(ue, enb)
    assert ue.is_attached

    # UL: app -> TUN-queue -> PDCP DRB -> RLC AM -> eNB
    pkts = [bytes([0x45, 0, 0, i]) + bytes(20) for i in range(5)]
    for p in pkts:
        ue.gw.backend.inject_ul(p)
    for tti in range(20):
        ue.run_tti(1000 + tti)
        enb.pump(ue.rlc)
    assert enb.rx_packets == pkts

    # DL: eNB -> RLC AM -> PDCP DRB -> GW queue
    dl = [b"\x45\x00DLPKT" + bytes([i]) for i in range(3)]
    for p in dl:
        enb.send_user_packet(p)
    for tti in range(10):
        enb.pump(ue.rlc)
        ue.run_tti(1100 + tti)
    assert list(ue.gw.backend.to_net) == dl
    m = ue.get_metrics()
    assert m.gw["dl_pkts"] == 3 and m.gw["ul_pkts"] == 5
    assert m.emm_state == "REGISTERED" and m.rrc_state == "CONNECTED"


# ---------------------------------------------------------------- NAS errors

def _mini_nas():
    from srsue_tpu.nas import messages as NM
    from srsue_tpu.nas.nas import EmmState, Nas
    from srsue_tpu.usim.usim import Usim, UsimConfig

    sent = []

    class FakeRrc:
        def write_sdu_nas(self, pdu):
            sent.append(pdu)

        def connect(self):
            pass

    nas = Nas(usim=Usim(UsimConfig()), rrc=FakeRrc())
    return nas, sent, NM, EmmState


def test_nas_attach_reject_goes_deregistered():
    nas, sent, NM, EmmState = _mini_nas()
    nas.state = EmmState.REGISTERED_INITIATED
    nas.write_pdu(NM.AttachReject(emm_cause=0x0B).pack())
    assert nas.state == EmmState.DEREGISTERED
    assert nas.attach_reject_cause == 0x0B
    assert not sent


def test_nas_auth_reject_goes_deregistered():
    nas, sent, NM, EmmState = _mini_nas()
    nas.state = EmmState.REGISTERED_INITIATED
    nas.write_pdu(bytes([0x07, NM.MT_AUTH_REJECT]))
    assert nas.state == EmmState.DEREGISTERED


def test_nas_identity_request_answered_with_imsi():
    nas, sent, NM, EmmState = _mini_nas()
    nas.write_pdu(NM.IdentityRequest(id_type=1).pack())
    assert len(sent) == 1
    resp = NM.IdentityResponse.unpack(sent[0])
    assert resp.imsi == nas.usim.get_imsi()


def test_nas_bad_autn_no_response():
    """Network authentication failure: UE must stay silent
    (nas.cc:328-332)."""
    import os

    nas, sent, NM, EmmState = _mini_nas()
    bad_autn = bytes(16)  # MAC will not verify against random RAND
    nas.write_pdu(NM.AuthRequest(os.urandom(16), bad_autn).pack())
    assert not sent
    assert nas.state == EmmState.DEREGISTERED


def test_nas_service_reject_goes_deregistered():
    """Reference stubs parse_service_reject (nas.cc:387); we parse the
    cause and drop to DEREGISTERED."""
    nas, sent, NM, EmmState = _mini_nas()
    nas.state = EmmState.REGISTERED
    nas.write_pdu(NM.ServiceReject(emm_cause=0x09, t3442=0x2F).pack())
    assert nas.state == EmmState.DEREGISTERED
    assert nas.service_reject_cause == 0x09
    assert not sent


def test_nas_esm_information_request_answered_with_apn():
    """Reference stubs parse_esm_information_request (nas.cc:391); we
    answer with the configured APN (24.301 §6.6.1)."""
    nas, sent, NM, EmmState = _mini_nas()
    nas.apn = "internet.mnc001.mcc001"
    nas.write_pdu(NM.EsmInformationRequest(pti=4).pack())
    assert len(sent) == 1
    resp = NM.EsmInformationResponse.unpack(sent[0])
    assert resp.pti == 4
    assert resp.apn == "internet.mnc001.mcc001"


def test_nas_network_detach_answered_and_deregistered():
    """Network-initiated detach (capability-plus; absent in reference)."""
    nas, sent, NM, EmmState = _mini_nas()
    nas.state = EmmState.REGISTERED
    nas.ip_addr = "10.0.0.2"
    nas.write_pdu(NM.DetachRequestNw(detach_type=2).pack())
    assert len(sent) == 1
    NM.DetachAccept.unpack(sent[0])
    assert nas.state == EmmState.DEREGISTERED
    assert nas.ip_addr is None


def test_nas_esm_codec_roundtrips():
    from srsue_tpu.nas import messages as NM

    r = NM.EsmInformationResponse(pti=7, apn="a.b.internet")
    assert NM.EsmInformationResponse.unpack(r.pack()).apn == "a.b.internet"
    r2 = NM.EsmInformationResponse(pti=2, apn=None)
    assert NM.EsmInformationResponse.unpack(r2.pack()).apn is None
    sr = NM.ServiceReject(emm_cause=0x10)
    assert NM.ServiceReject.unpack(sr.pack()).t3442 is None
