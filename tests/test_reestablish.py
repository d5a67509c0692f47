"""RRC connection re-establishment (36.331 §5.3.7 + §5.3.11) — a
capability the reference explicitly leaves unhandled
(/root/reference/ue/src/upper/rrc.cc:459-464 "Connection
riestablishment not supported"): radio-link failure -> re-establishment
request (C-RNTI + PCI + shortMAC-I) over a fresh RA -> K_eNB* re-keying
(NH chain) -> SRB1 resume -> DRB resume via reconfiguration -> user
plane flows again, NAS untouched."""

import numpy as np

from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.mac import pdu as pdu_mod
from srsue_tpu.rrc.rrc import RrcState
from srsue_tpu.ue import Ue
from srsue_tpu.usim import security as sec
from srsue_tpu.usim.usim import Usim, UsimConfig

from test_attach_e2e import RaPhy, _run_attach


def _drive_ra(ue, enb, tti0: int, n_ttis: int = 120) -> int:
    """Drive a MAC RA loop against the emulator (same shape as the attach
    harness) until RRC leaves WAIT_CON_REESTABLISH or ttis run out."""
    phy = ue.phy
    tti = tti0
    while (tti < tti0 + n_ttis
           and ue.rrc.state == RrcState.WAIT_CON_REESTABLISH):
        ue.run_tti(tti)
        if phy.prach_tx and ue.mac.ra.state.name == "RESPONSE_RECEPTION":
            idx, power, ptti = phy.prach_tx.pop(0)
            grant = pdu_mod.RarGrant(False, 10, 2, 0, False, False)
            rar = pdu_mod.Rar(idx, ta=31, grant=grant, t_crnti=enb.t_crnti)
            ue.mac.ra.rar_received(pdu_mod.pack_rar_pdu([rar]))
            msg3_mac = ue.mac.new_grant_ul(tti + 4, grant_bytes=64).payload
            parsed = pdu_mod.unpack(msg3_mac, uplink=True)
            ccch_sdu = b""
            for sh in parsed.subheaders:
                if sh.lcid == pdu_mod.LCID_CCCH:
                    ccch_sdu = sh.payload
                    enb.srb0.write_pdu(sh.payload)
            ue.mac.harq_recv(tti + 4, ack=True)
            m4 = pdu_mod.MacPdu()
            m4.add_ce(pdu_mod.LCID_CON_RES, ccch_sdu[:6].ljust(6, b"\0"))
            dl_ccch = enb.srb0.read_pdu(1000)
            if dl_ccch:
                m4.add_sdu(0, dl_ccch)
            ue.mac._deliver_temp_crnti = True
            ue.mac._deliver(0, pdu_mod.pack(m4, 200))
        enb.pump(ue.rlc)
        tti += 1
    return tti


def _attached_pair():
    ue = Ue(phy=RaPhy())
    enb = EnbStack(ue.usim.cfg)
    ue.attach()
    _run_attach(ue, enb)
    assert ue.is_attached and enb.state == "attached"
    return ue, enb


def test_short_mac_i_interop():
    """UE and eNB derive the same shortMAC-I from the shared context."""
    ue, enb = _attached_pair()
    got = ue.rrc.short_mac_i(ue.mac.crnti)
    want = enb._short_mac_i_expected(ue.mac.crnti)
    assert got == want
    assert 0 <= got < 1 << 16
    # a different C-RNTI must change the MAC (context binding)
    assert ue.rrc.short_mac_i(ue.mac.crnti ^ 1) != got


def test_nh_chain_vertical_derivation():
    """UE NH-chain re-keying matches an independently stepped chain."""
    cfg = UsimConfig()
    u = Usim(cfg)
    u.k_asme = bytes(range(32))
    u.generate_as_keys(0, eea=0, eia=2)
    k0 = u.k_enb
    u.refresh_as_keys(pci=7, earfcn_dl=300, ncc=2, eea=0, eia=2)
    nh1 = sec.kdf_nh(bytes(range(32)), k0)
    nh2 = sec.kdf_nh(bytes(range(32)), nh1)
    assert u.k_enb == sec.kdf_k_enb_star(nh2, 7, 300)
    assert u.ncc == 2
    # horizontal: same NCC again -> derive from current K_eNB
    k_prev = u.k_enb
    u.refresh_as_keys(pci=7, earfcn_dl=300, ncc=2, eea=0, eia=2)
    assert u.k_enb == sec.kdf_k_enb_star(k_prev, 7, 300)


def test_full_reestablishment_flow():
    ue, enb = _attached_pair()
    old_k_enb = bytes(ue.usim.k_enb)
    enb.reconfig_complete = False

    # radio link failure: N310 out-of-sync indications start T310, which
    # then expires on WALL CLOCK (one step_tti per subframe) even though
    # the channel keeps delivering interleaved in-sync subframes below
    # the N311-consecutive threshold (ADVICE r3: T310 is wall-clock)
    for _ in range(ue.rrc.n310):
        ue.rrc.on_out_of_sync()
    for i in range(ue.rrc.t310_ms + 1):
        if i % 2 == 0:
            ue.rrc.on_out_of_sync()  # indications don't advance T310
        ue.rrc.step_tti()
    assert ue.rrc.state == RrcState.WAIT_CON_REESTABLISH

    tti = _drive_ra(ue, enb, tti0=500)
    assert ue.rrc.state == RrcState.CONNECTED, enb.events
    assert "reest_request" in enb.events
    assert "rrcConnectionReestablishmentComplete" in enb.events
    assert "reest_reject" not in enb.events

    # keys actually rotated (K_eNB* via the NH chain, NCC=1)
    assert ue.usim.k_enb != old_k_enb
    assert ue.usim.ncc == enb.reest_ncc
    # integrity is live on the new SRB1 both ways (reconfig round-trip)
    for t in range(tti, tti + 20):
        ue.run_tti(t)
        enb.pump(ue.rlc)
    assert enb.reconfig_complete

    # NAS untouched: still registered, same IP
    assert ue.is_attached
    assert ue.gw.ip_addr == enb.ue_ip

    # SRB1 PDCP COUNTs were reset on both sides (36.323 §5.2) and the
    # UE sent a PDCP status report on the resumed AM DRB (§5.3.1)
    assert ue.pdcp.entities[1].rx_count > 0  # post-reest traffic counted
    assert enb.drb_pdcp.peer_fms is not None
    assert enb.drb_pdcp.peer_fms == (
        ue.pdcp.entities[enb.drb_lcid].rx_count & 0xFFF)

    # user plane flows again after the DRB resume
    pkts = [bytes([0x45, 0, 0, i]) + bytes(20) for i in range(3)]
    for p in pkts:
        ue.gw.backend.inject_ul(p)
    for t in range(tti + 20, tti + 40):
        ue.run_tti(t)
        enb.pump(ue.rlc)
    assert enb.rx_packets[-3:] == pkts
    dl = b"\x45\x00after-reest"
    enb.send_user_packet(dl)
    for t in range(tti + 40, tti + 50):
        enb.pump(ue.rlc)
        ue.run_tti(t)
    assert list(ue.gw.backend.to_net)[-1] == dl


def test_reestablishment_reject_unknown_ue():
    """A UE the eNB has no context for gets a Reject and falls to IDLE."""
    ue, enb = _attached_pair()
    ue.mac.crnti = 0x9999  # C-RNTI not in the eNB's context -> reject
    ue.rrc.radio_link_failure()
    assert ue.rrc.state == RrcState.WAIT_CON_REESTABLISH
    _drive_ra(ue, enb, tti0=800)
    assert "reest_reject" in enb.events
    assert ue.rrc.state == RrcState.IDLE


def test_rlf_recovery_via_n311():
    """N311 CONSECUTIVE in-sync indications while T310 runs stop the
    timer (no RLF); non-consecutive ones do not (36.331 §5.3.11.2)."""
    ue, enb = _attached_pair()
    ue.rrc.n311 = 2
    for _ in range(ue.rrc.n310):
        ue.rrc.on_out_of_sync()
    for _ in range(5):
        ue.rrc.on_out_of_sync()  # T310 running
        ue.rrc.step_tti()
    # in-syncs interrupted by an out-of-sync do NOT satisfy N311=2
    ue.rrc.on_in_sync()
    ue.rrc.on_out_of_sync()      # resets the consecutive count
    ue.rrc.on_in_sync()
    assert ue.rrc._t310_left >= 0  # still running
    # two CONSECUTIVE in-syncs recover
    ue.rrc.on_in_sync()
    assert ue.rrc._t310_left < 0   # stopped
    for _ in range(ue.rrc.t310_ms + 10):
        ue.rrc.on_in_sync()
        ue.rrc.step_tti()
    assert ue.rrc.state == RrcState.CONNECTED


def test_rlc_max_retx_triggers_reestablishment():
    """36.331 §5.3.11.3: maxRetxThreshold exhaustion is an RLF trigger
    (the reference leaves the hook a TODO, rrc.cc:194-197)."""
    ue, enb = _attached_pair()
    ue.rrc.max_retx_attempted()
    assert ue.rrc.state == RrcState.WAIT_CON_REESTABLISH
    _drive_ra(ue, enb, tti0=1200)
    assert ue.rrc.state == RrcState.CONNECTED
