"""Intra-LTE handover (36.331 §5.3.5.4) — capability-plus: the
reference never decodes mobilityControlInfo. Source cell sends a
reconfiguration with mobilityControlInfo + securityConfigHO; the UE
applies the target identity, re-keys (K_eNB* toward the target PCI with
the signalled NCC), re-establishes PDCP/RLC, performs contention-free
RA with the dedicated preamble, and completes on the target's SRB1
under the new keys. T304 expiry falls back to re-establishment with
cause handoverFailure (§5.3.5.6)."""

from srsue_tpu.mac import pdu as pdu_mod
from srsue_tpu.rrc.rrc import RrcState
from srsue_tpu.usim import security as sec

from test_reestablish import _attached_pair

NEW_PCI = 77
NEW_CRNTI = 0x5E11
DED_PREAMBLE = 7


def _drive_ho(ue, enb, tti0: int, n_ttis: int = 80) -> int:
    """Deliver the handover command, then drive the contention-free RA
    against the emulator (RAR only — no Msg3/contention)."""
    phy = ue.phy
    tti = tti0
    while (tti < tti0 + n_ttis
           and getattr(ue.rrc, "_pending_ho_complete", None) is None):
        enb.pump(ue.rlc)   # deliver the reconfiguration w/ mobility
        ue.run_tti(tti)
        tti += 1
        if tti > tti0 + 5 and ue.rrc._pending_ho_complete is None:
            break  # command should be processed within a few TTIs
    while tti < tti0 + n_ttis and ue.rrc._pending_ho_complete is not None:
        ue.run_tti(tti)
        if phy.prach_tx and ue.mac.ra.state.name == "RESPONSE_RECEPTION":
            idx, power, ptti = phy.prach_tx.pop(0)
            assert idx == DED_PREAMBLE  # dedicated preamble was used
            grant = pdu_mod.RarGrant(False, 10, 2, 0, False, False)
            rar = pdu_mod.Rar(idx, ta=11, grant=grant, t_crnti=enb.t_crnti)
            ue.mac.ra.rar_received(pdu_mod.pack_rar_pdu([rar]))
        enb.pump(ue.rlc)
        tti += 1
    enb.pump(ue.rlc)
    return tti


def test_intra_lte_handover():
    ue, enb = _attached_pair()
    old_k_enb = bytes(ue.usim.k_enb)
    old_crnti = ue.mac.crnti

    enb.initiate_handover(NEW_PCI, NEW_CRNTI, ncc=1,
                          dedicated_preamble=DED_PREAMBLE)
    tti = _drive_ho(ue, enb, tti0=600)

    assert "ho_initiated" in enb.events
    assert "ho_complete" in enb.events, enb.events
    assert ue.rrc.state == RrcState.CONNECTED
    assert enb.state == "attached"

    # target identity installed
    assert ue.rrc.pci == NEW_PCI
    assert ue.mac.crnti == NEW_CRNTI and ue.mac.crnti != old_crnti
    # keys rotated via the NH chain toward the TARGET PCI
    assert ue.usim.k_enb != old_k_enb
    nh1 = sec.kdf_nh(ue.usim.k_asme, sec.kdf_k_enb(ue.usim.k_asme, 0))
    assert ue.usim.k_enb == sec.kdf_k_enb_star(nh1, NEW_PCI, 0)
    # NAS untouched
    assert ue.is_attached
    assert ue.gw.ip_addr == enb.ue_ip

    # user plane flows in both directions after the handover
    pkts = [bytes([0x45, 0, 0, i]) + bytes(16) for i in range(3)]
    for p in pkts:
        ue.gw.backend.inject_ul(p)
    for t in range(tti, tti + 20):
        ue.run_tti(t)
        enb.pump(ue.rlc)
    assert enb.rx_packets[-3:] == pkts
    dl = b"\x45\x00after-ho"
    enb.send_user_packet(dl)
    for t in range(tti + 20, tti + 30):
        enb.pump(ue.rlc)
        ue.run_tti(t)
    assert list(ue.gw.backend.to_net)[-1] == dl


def test_handover_t304_expiry_falls_back_to_reestablishment():
    ue, enb = _attached_pair()
    enb.initiate_handover(NEW_PCI, NEW_CRNTI, ncc=1,
                          dedicated_preamble=DED_PREAMBLE)
    # deliver the command but never answer the RA (no RAR): T304 expires
    enb.pump(ue.rlc)
    t304 = None
    for t in range(700, 700 + 2500):
        ue.run_tti(t)
        if t304 is None and ue.rrc._t304_left >= 0:
            t304 = ue.rrc._t304_left
        if ue.rrc.state == RrcState.WAIT_CON_REESTABLISH:
            break
    assert ue.rrc.state == RrcState.WAIT_CON_REESTABLISH
    assert t304 is not None  # T304 actually ran
