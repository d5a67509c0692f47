"""Over-the-air intra-LTE handover (VERDICT r3 item 4): source and
target cells are emulated as two EnbPhy instances with different PCIs
(different CRS/PSS/SSS/scrambling identities) over one EnbStack. The
handover command reaches the UE on the SOURCE cell's PDSCH, the UE
retunes (Phy.set_pci), builds the DEDICATED-preamble PRACH as a real
waveform that the TARGET cell detects, receives the RAR over the
target's PDSCH, and completes on the target's SRB1 via the RAR's UL
grant on PUSCH — no stack-level injection anywhere."""

import numpy as np
import pytest

from srsue_tpu.enb.phy import EnbPhy
from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.phy import Phy
from srsue_tpu.rrc.rrc import RrcState
from srsue_tpu.ue import Ue

SRC_PCI = 123
NEW_PCI = 77
NEW_CRNTI = 0x5E11
DED_PREAMBLE = 7


def _step(ue, phy, enb, tti, rng):
    dl = enb.build_dl_subframe(tti)
    noise = 0.01 * (rng.standard_normal(dl.shape)
                    + 1j * rng.standard_normal(dl.shape)).astype(np.complex64)
    ul = phy.work(tti, dl + noise)
    ue.run_tti(tti)
    enb.receive_ul(tti, ul)


@pytest.mark.slow
def test_over_the_air_handover():
    cell1 = Cell(n_prb=15, cell_id=SRC_PCI)
    cell2 = Cell(n_prb=15, cell_id=NEW_PCI)
    phy = Phy(cell1)
    ue = Ue(phy=phy)
    phy.mac = ue.mac
    phy.rrc = ue.rrc
    stack = EnbStack(ue.usim.cfg)
    enb1 = EnbPhy(cell1, stack)
    rng = np.random.default_rng(0)

    # ---- attach on the source cell over the air ----
    ue.attach()
    ue.rrc.write_pdu_bcch_bch(b"\x00\x00\x00")
    tti = 0
    while tti < 200:
        _step(ue, phy, enb1, tti, rng)
        tti += 1
        if ue.is_attached and stack.state == "attached":
            break
    assert ue.is_attached and stack.state == "attached"
    old_crnti = ue.mac.crnti
    old_k_enb = bytes(ue.usim.k_enb)

    # ---- handover: command over the SOURCE air interface ----
    stack.initiate_handover(NEW_PCI, NEW_CRNTI, ncc=1,
                            dedicated_preamble=DED_PREAMBLE)
    enb2 = EnbPhy(cell2, stack)  # target PHY (stack is now target-role)
    assert enb2.crnti == NEW_CRNTI

    t_end = tti + 260
    while tti < t_end:
        on_target = ue.rrc.pci == NEW_PCI
        serving = enb2 if on_target else enb1
        _step(ue, phy, serving, tti, rng)
        tti += 1
        if stack.state == "attached" and ue.rrc.state == RrcState.CONNECTED \
                and on_target and ue.mac.crnti == NEW_CRNTI:
            break

    # command crossed the source air interface
    assert "ho_cmd_dl" in enb1.events, enb1.events[-15:]
    # dedicated preamble PRACH was BUILT and DETECTED at the target
    assert f"prach_{DED_PREAMBLE}" in enb2.events, enb2.events[:15]
    assert "rar_sent" in enb2.events
    # no contention: the target never saw a Msg3 CCCH
    assert "msg3" not in enb2.events
    # procedure completed on the target's SRB1 (Complete via RAR grant)
    assert "ho_complete" in stack.events, (stack.events, enb2.events[:20])
    assert stack.state == "attached"
    assert ue.rrc.state == RrcState.CONNECTED
    assert ue.rrc.pci == NEW_PCI
    # 36.321 §5.1.5: C-RNTI comes from mobilityControlInfo, not the RAR
    assert ue.mac.crnti == NEW_CRNTI and ue.mac.crnti != old_crnti
    assert ue.usim.k_enb != old_k_enb
    assert ue.is_attached  # NAS untouched

    # ---- user plane flows over the TARGET air interface ----
    pkt = b"\x45\x00ota-ho-ul"
    ue.gw.backend.inject_ul(pkt)
    t0 = tti
    while tti < t0 + 80 and not stack.rx_packets:
        _step(ue, phy, enb2, tti, rng)
        tti += 1
    assert stack.rx_packets == [pkt]
    dpkt = b"\x45\x00ota-ho-dl"
    stack.send_user_packet(dpkt)
    t0 = tti
    while tti < t0 + 80 and not list(ue.gw.backend.to_net):
        _step(ue, phy, enb2, tti, rng)
        tti += 1
    assert list(ue.gw.backend.to_net) == [dpkt]
