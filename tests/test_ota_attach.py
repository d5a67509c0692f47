"""Full over-the-air attach: the COMPLETE UE stack (PHY facade + MAC +
RLC + PDCP + RRC + NAS + USIM + GW) against the eNB PHY emulator, every
message crossing the air interface as a real subframe waveform — MIB and
SIBs on PBCH/PDSCH, PRACH/RAR/Msg3/Msg4, RRC connection setup, AKA
authentication, NAS+AS security, DRB setup, attach complete, and user
data on PUSCH/PDSCH. This is the reference's end-to-end bring-up
(SURVEY.md §3.1) with the air interface included."""

import numpy as np
import pytest

from srsue_tpu.enb.phy import EnbPhy
from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.phy import Phy
from srsue_tpu.ue import Ue


@pytest.mark.slow
def test_over_the_air_attach():
    cell = Cell(n_prb=15, cell_id=123)
    phy = Phy(cell)
    ue = Ue(phy=phy)
    phy.mac = ue.mac
    phy.rrc = ue.rrc
    enb_stack = EnbStack(ue.usim.cfg)
    enb = EnbPhy(cell, enb_stack)
    rng = np.random.default_rng(0)

    ue.attach()
    # MIB arrives via PBCH in the steady loop; kick the RRC SIB search
    ue.rrc.write_pdu_bcch_bch(b"\x00\x00\x00")

    max_tti = 200
    for tti in range(max_tti):
        dl = enb.build_dl_subframe(tti)
        noise = 0.01 * (
            rng.standard_normal(dl.shape) + 1j * rng.standard_normal(dl.shape)
        ).astype(np.complex64)
        ul = phy.work(tti, dl + noise)
        ue.run_tti(tti)
        enb.receive_ul(tti, ul)
        if ue.is_attached and enb_stack.state == "attached":
            break

    assert ue.is_attached, (
        f"not attached after {max_tti} TTIs; ue rrc={ue.rrc.state}, "
        f"ra={ue.mac.ra.state}, enb events={enb.events[:30]}, "
        f"stack events={enb_stack.events}"
    )
    assert enb_stack.state == "attached"
    # the whole ladder crossed the air
    assert any(e.startswith("prach_") for e in enb.events)
    assert "rar_sent" in enb.events
    assert "msg3" in enb.events
    assert ue.mac.crnti == enb.crnti
    assert ue.gw.ip_addr == enb_stack.ue_ip
    assert "auth_ok" in enb_stack.events
    assert "nas_smc_ok" in enb_stack.events

    # user-plane over the air: UL IP packet -> PUSCH -> eNB DRB
    pkt = b"\x45\x00over-the-air!"
    ue.gw.backend.inject_ul(pkt)
    t0 = tti + 1
    for tti in range(t0, t0 + 60):
        dl = enb.build_dl_subframe(tti)
        ul = phy.work(tti, dl)
        ue.run_tti(tti)
        enb.receive_ul(tti, ul)
        if enb_stack.rx_packets:
            break
    assert enb_stack.rx_packets == [pkt]

    # DL: eNB DRB -> PDSCH -> UE GW
    dpkt = b"\x45\x00downlink-data"
    enb_stack.send_user_packet(dpkt)
    t0 = tti + 1
    for tti in range(t0, t0 + 60):
        dl = enb.build_dl_subframe(tti)
        ul = phy.work(tti, dl)
        ue.run_tti(tti)
        enb.receive_ul(tti, ul)
        if list(ue.gw.backend.to_net):
            break
    assert list(ue.gw.backend.to_net) == [dpkt]
