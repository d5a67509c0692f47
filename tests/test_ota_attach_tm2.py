"""Over-the-air attach on a TWO-PORT (TM2 transmit-diversity) cell:
every DL channel — PBCH, PCFICH, PDCCH, PHICH, PDSCH — crosses the air
SFBC-precoded on two antenna ports (36.211 §6.3.4.3/§6.6.3) and the UE
receives them through per-port channel estimation + Alamouti combining
(r4: completes the reference's 'TM1 and TM2' capability at the SYSTEM
level, not just the data path)."""

import numpy as np
import pytest

from srsue_tpu.enb.phy import EnbPhy
from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.phy import Phy
from srsue_tpu.ue import Ue


@pytest.mark.slow
def test_over_the_air_attach_tm2():
    cell = Cell(n_prb=15, cell_id=123, n_ports=2)
    phy = Phy(cell)
    ue = Ue(phy=phy)
    phy.mac = ue.mac
    phy.rrc = ue.rrc
    enb_stack = EnbStack(ue.usim.cfg)
    enb = EnbPhy(cell, enb_stack)
    assert enb.tm2
    rng = np.random.default_rng(0)

    ue.attach()
    ue.rrc.write_pdu_bcch_bch(b"\x00\x00\x00")

    max_tti = 220
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
    assert any(e.startswith("prach_") for e in enb.events)
    assert "rar_sent" in enb.events
    assert "msg3" in enb.events
    assert ue.mac.crnti == enb.crnti

    # user plane both ways over the SFBC air interface
    pkt = b"\x45\x00tm2-uplink!"
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

    dpkt = b"\x45\x00tm2-downlink"
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
