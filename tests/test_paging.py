"""Paging (PCCH / P-RNTI) — capability-plus: the reference has no PCCH
handling anywhere (no match for 'pcch' in ue/src or interfaces.h). Here:
36.304 §7 paging occasions, PCCH UPER codec, RRC paging-record matching,
systemInfoModification re-acquisition, and an over-the-air decode through
the eNB PHY emulator."""

import numpy as np

from srsue_tpu.rrc.si_sched import paging_occasion


def test_paging_occasion_math():
    # nB = oneT, T = 128: N = 128, Ns = 1 -> PF = ue_id mod 128, PO sf9
    ue_id = 0x155
    pf = ue_id % 128
    hits = [tti for tti in range(1280 * 10)
            if paging_occasion(tti, ue_id, n_b_t=1.0, t_drx=128)]
    assert hits == [(pf + 128 * k) * 10 + 9 for k in range(10)]
    # nB = quarterT: N = 32 -> PF = 4*(ue_id mod 32)
    hits = [tti for tti in range(1280)
            if paging_occasion(tti, 3, n_b_t=0.25, t_drx=128)]
    assert hits == [(128 // 32) * 3 * 10 + 9]


def test_pcch_codec_roundtrip():
    from srsue_tpu.enb.stack import EnbStack
    import srsue_tpu.rrc.messages as M

    s = EnbStack()
    name, _, body = M.unpack("PCCH", s.make_paging("001010123456789"))
    assert name == "paging"
    kind, digits = body["pagingRecordList"][0]["ue_Identity"]
    assert kind == "imsi" and "".join(map(str, digits)) == "001010123456789"
    name, _, body = M.unpack(
        "PCCH", s.make_paging(s_tmsi=(7, 0xDEADBEEF), si_modification=True))
    kind, st = body["pagingRecordList"][0]["ue_Identity"]
    assert (st["mmec"], st["m_TMSI"]) == (7, 0xDEADBEEF)
    assert body["systemInfoModification"] == "true"


def _rrc_with_usim():
    from srsue_tpu.rrc.rrc import Rrc
    from srsue_tpu.usim.usim import Usim, UsimConfig
    from srsue_tpu.nas.nas import Nas

    usim = Usim(UsimConfig())
    nas = Nas(usim=usim)
    rrc = Rrc(nas=nas, usim=usim)
    return rrc, nas, usim


def test_rrc_paging_record_matching():
    from srsue_tpu.enb.stack import EnbStack

    enb = EnbStack()
    rrc, nas, usim = _rrc_with_usim()
    # wrong IMSI: no match
    rrc.write_pdu_pcch(enb.make_paging("999990000000000"))
    assert not rrc.paged and not nas.paging_pending
    # our IMSI: match
    rrc.write_pdu_pcch(enb.make_paging(usim.get_imsi()))
    assert rrc.paged and nas.paging_pending
    # s-TMSI from the NAS GUTI tail
    rrc2, nas2, _ = _rrc_with_usim()
    nas2.guti = bytes.fromhex("f1100001") + bytes([7]) + (0xCAFEF00D).to_bytes(4, "big")
    rrc2.write_pdu_pcch(enb.make_paging(s_tmsi=(7, 0xCAFEF00D)))
    assert rrc2.paged


def test_rrc_system_info_modification_reacquires_si():
    from srsue_tpu.enb.stack import EnbStack
    from srsue_tpu.rrc.rrc import RrcState

    enb = EnbStack()
    rrc, _, _ = _rrc_with_usim()
    rrc.sib1 = {"x": 1}
    rrc.sib2 = {"y": 2}
    rrc.state = RrcState.SIB2_SEARCH
    rrc.write_pdu_pcch(enb.make_paging(si_modification=True))
    assert rrc.sib1 is None and rrc.sib2 is None
    assert rrc.state == RrcState.SIB1_SEARCH
    assert rrc.si_modified


def test_paging_over_the_air():
    """eNB pages the UE's IMSI; the UE PHY searches P-RNTI only at its
    paging occasion and the PCCH payload reaches RRC/NAS."""
    from srsue_tpu.enb.phy import EnbPhy
    from srsue_tpu.enb.stack import EnbStack
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.phy import Phy
    from srsue_tpu.ue import Ue

    cell = Cell(n_prb=15, cell_id=123)
    phy = Phy(cell)
    ue = Ue(phy=phy)
    phy.mac = ue.mac
    phy.rrc = ue.rrc
    enb = EnbPhy(cell, EnbStack(ue.usim.cfg))
    rng = np.random.default_rng(1)

    imsi = ue.usim.get_imsi()
    ue_id = int(imsi) % 1024
    t_drx = 32
    phy.configure_paging(ue_id, t_drx=t_drx, n_b_t=1.0)
    enb.page(imsi, t_drx=t_drx)

    # the single paging occasion in the first DRX cycle
    occ = [tti for tti in range(t_drx * 10)
           if paging_occasion(tti, ue_id, n_b_t=1.0, t_drx=t_drx)]
    assert len(occ) == 1
    for tti in range(max(0, occ[0] - 2), occ[0] + 2):
        dl = enb.build_dl_subframe(tti)
        noise = 0.01 * (rng.standard_normal(dl.shape)
                        + 1j * rng.standard_normal(dl.shape)).astype(np.complex64)
        phy.work(tti, dl + noise)
    assert "paging_sent" in enb.events
    assert ue.rrc.paged
    assert ue.nas.paging_pending
