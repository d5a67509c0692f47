"""MAC layer tests — PDU codec round-trips, HARQ entities, mux/LCP,
demux routing, RA procedure with a fake PHY (the reference's
interface-fake pattern, ue/test/mac/mac_test.cc)."""

import numpy as np

from srsue_tpu.mac import pdu as pdu_mod
from srsue_tpu.mac.demux import Demux
from srsue_tpu.mac.mux import Mux
from srsue_tpu.mac.proc_ra import RaConfig, RaProc, RaState
from srsue_tpu.mac.procs import BsrProc, PhrProc, SrProc
from srsue_tpu.mac.ul_harq import RV_SEQ, UlHarq


# --- MAC PDU codec ---------------------------------------------------------


def test_mac_pdu_single_sdu_roundtrip():
    p = pdu_mod.MacPdu()
    p.add_sdu(3, b"\xaa" * 40)
    raw = pdu_mod.pack(p, 50)
    got = pdu_mod.unpack(raw)
    sdus = [(s.lcid, s.payload) for s in got.subheaders]
    assert sdus == [(3, b"\xaa" * 40)]


def test_mac_pdu_multi_sdu_and_ce():
    p = pdu_mod.MacPdu()
    p.add_ce(pdu_mod.LCID_CRNTI, pdu_mod.make_ce_crnti(0x4B2C))
    p.add_sdu(1, b"\x01" * 10)
    p.add_sdu(2, b"\x02" * 200)
    raw = pdu_mod.pack(p, 250, uplink=True)
    assert len(raw) == 250
    got = pdu_mod.unpack(raw, uplink=True)
    assert got.subheaders[0].lcid == pdu_mod.LCID_CRNTI
    assert got.subheaders[0].payload == bytes([0x4B, 0x2C])
    assert got.subheaders[1].payload == b"\x01" * 10
    assert got.subheaders[2].payload == b"\x02" * 200


def test_mac_pdu_padding_cases():
    for pdu_len in (43, 44, 45, 60):  # exact, +1, +2, +many
        p = pdu_mod.MacPdu()
        p.add_sdu(3, b"\xbb" * 41)
        raw = pdu_mod.pack(p, pdu_len)
        assert len(raw) == pdu_len
        got = pdu_mod.unpack(raw)
        payloads = [s.payload for s in got.subheaders if s.lcid == 3]
        assert payloads == [b"\xbb" * 41]


def test_bsr_ce_roundtrip():
    assert pdu_mod.parse_long_bsr(pdu_mod.make_ce_long_bsr([1, 20, 45, 63])) == [1, 20, 45, 63]
    assert pdu_mod.bsr_index(0) == 0
    assert pdu_mod.bsr_index(10) == 1
    assert pdu_mod.bsr_index(150001) == 63


def test_rar_pdu_roundtrip():
    g = pdu_mod.RarGrant(hopping=False, riv=100, mcs=4, tpc=3,
                         ul_delay=False, cqi_req=False)
    rar = pdu_mod.Rar(rapid=17, ta=555, grant=g, t_crnti=0x5678)
    raw = pdu_mod.pack_rar_pdu([rar], backoff=5, pdu_len=20)
    rars, backoff = pdu_mod.unpack_rar_pdu(raw)
    assert backoff == 5
    assert rars[0] == rar


# --- UL HARQ ---------------------------------------------------------------


def test_ul_harq_rv_sequence_and_ack():
    h = UlHarq()
    rv = h.new_tx(4, b"payload")
    assert rv == 0
    got = h.retx(12)  # same pid (12 % 8 == 4)
    assert got == (b"payload", 2)
    got = h.retx(20)
    assert got == (b"payload", 3)
    h.harq_feedback(20, ack=True)
    assert not h.has_pending(28)
    assert h.metrics["tx_ok"] == 1


def test_ul_harq_max_retx_flush():
    h = UlHarq(max_retx=3)
    h.new_tx(0, b"x")
    assert h.retx(8) is not None
    assert h.retx(16) is not None
    assert h.retx(24) is None  # max reached -> flushed
    assert not h.has_pending(32)
    assert h.metrics["tx_ko"] == 1


# --- Mux / LCP -------------------------------------------------------------


class FakeRlc:
    def __init__(self):
        self.queues = {}

    def set(self, lcid, data):
        self.queues[lcid] = bytearray(data)

    def get_buffer_state(self, lcid):
        return len(self.queues.get(lcid, b""))

    def read_pdu(self, lcid, n):
        q = self.queues.get(lcid, bytearray())
        out = bytes(q[:n])
        del q[:n]
        return out


def test_mux_priority_order():
    rlc = FakeRlc()
    rlc.set(1, b"\x01" * 100)
    rlc.set(3, b"\x03" * 100)
    mux = Mux(rlc.read_pdu, rlc.get_buffer_state)
    mux.set_priority(1, priority=5)
    mux.set_priority(3, priority=1)  # higher priority
    raw = mux.pdu_get(50)
    got = pdu_mod.unpack(raw, uplink=True)
    sdu_lcids = [s.lcid for s in got.subheaders if s.lcid <= 10]
    assert sdu_lcids[0] == 3  # high priority served first


def test_mux_pbr_token_bucket():
    """PBR round-1 serving guarantees a LOW-priority channel its
    prioritized bit rate even when a higher-priority channel has
    unbounded data (36.321 §5.4.3.1 two-round LCP)."""
    rlc = FakeRlc()
    rlc.set(1, b"\x01" * 1000)  # high priority, no PBR reservation
    rlc.set(2, b"\x02" * 1000)  # low priority but PBR-protected
    mux = Mux(rlc.read_pdu, rlc.get_buffer_state)
    mux.set_priority(1, priority=1, pbr_bytes_per_tti=0)
    mux.set_priority(2, priority=5, pbr_bytes_per_tti=8)
    for _ in range(10):
        mux.step_bj()  # lcid2 accumulates Bj = 80
    raw = mux.pdu_get(200)
    got = pdu_mod.unpack(raw, uplink=True)
    by_lcid = {}
    for s in got.subheaders:
        if s.lcid <= 10:
            by_lcid[s.lcid] = by_lcid.get(s.lcid, 0) + len(s.payload)
    assert by_lcid[2] >= 80  # round-1 PBR quota honored
    assert by_lcid[1] > 0  # round 2 fills the rest by priority
    assert sum(by_lcid.values()) <= 200


def test_mux_ce_insertion():
    rlc = FakeRlc()
    rlc.set(3, b"\x03" * 10)
    mux = Mux(rlc.read_pdu, rlc.get_buffer_state)
    mux.set_priority(3, priority=1)
    mux.pending_crnti = 0x1234
    mux.pending_bsr_lcid = pdu_mod.LCID_SHORT_BSR
    mux.pending_bsr = pdu_mod.make_ce_short_bsr(0, 5)
    raw = mux.pdu_get(40)
    got = pdu_mod.unpack(raw, uplink=True)
    lcids = [s.lcid for s in got.subheaders]
    assert pdu_mod.LCID_CRNTI in lcids
    assert pdu_mod.LCID_SHORT_BSR in lcids


# --- Demux -----------------------------------------------------------------


def test_demux_routing_and_ces():
    delivered = []
    tas = []
    demux = Demux(
        write_pdu=lambda l, b: delivered.append((l, b)),
        on_ta=lambda ta: tas.append(ta),
    )
    p = pdu_mod.MacPdu()
    p.add_ce(pdu_mod.LCID_TA, bytes([33]))
    p.add_sdu(2, b"\xcc" * 25)
    demux.push_pdu(pdu_mod.pack(p, 40))
    assert delivered == [(2, b"\xcc" * 25)]
    assert tas == [33]


def test_demux_contention_resolution_gate():
    delivered = []
    demux = Demux(
        write_pdu=lambda l, b: delivered.append((l, b)),
        on_con_res=lambda crid: crid == b"\x01\x02\x03\x04\x05\x06",
    )
    p = pdu_mod.MacPdu()
    p.add_ce(pdu_mod.LCID_CON_RES, b"\x01\x02\x03\x04\x05\x06")
    p.add_sdu(0, b"\x11" * 8)
    raw = pdu_mod.pack(p, 20)
    assert demux.push_pdu_temp_crnti(raw)
    assert delivered == [(0, b"\x11" * 8)]
    # mismatched CRID -> PDU dropped
    delivered.clear()
    demux2 = Demux(
        write_pdu=lambda l, b: delivered.append((l, b)),
        on_con_res=lambda crid: False,
    )
    assert not demux2.push_pdu_temp_crnti(raw)
    assert delivered == []


# --- RA procedure ----------------------------------------------------------


class FakePhyRa:
    def __init__(self):
        self.preambles = []
        self.searches = []
        self.msg3 = []

    def prach_send(self, idx, power):
        self.preambles.append((idx, power))
        return len(self.preambles)  # fake tti

    def start_rar_search(self, ra_rnti, window):
        self.searches.append((ra_rnti, window))

    def send_msg3(self, data, t_crnti):
        self.msg3.append((data, t_crnti))


def test_ra_procedure_happy_path():
    phy = FakePhyRa()
    done = []
    ra = RaProc(
        RaConfig(),
        prach_send=phy.prach_send,
        start_rar_search=phy.start_rar_search,
        send_msg3=phy.send_msg3,
        on_complete=lambda crnti: done.append(crnti),
    )
    ra.start(b"CONNREQ", b"\xaa\xbb\xcc\xdd\xee\xff")
    for tti in range(3):
        ra.step(tti)
    assert phy.preambles, "preamble transmitted"
    assert ra.state == RaState.RESPONSE_RECEPTION
    # eNB answers with RAR for our preamble
    g = pdu_mod.RarGrant(False, 10, 2, 0, False, False)
    rar = pdu_mod.Rar(ra.preamble_idx, ta=100, grant=g, t_crnti=0x777)
    ra.rar_received(pdu_mod.pack_rar_pdu([rar]))
    assert phy.msg3 == [(b"CONNREQ", 0x777)]
    assert ra.state == RaState.CONTENTION_RESOLUTION
    # Msg4 carries our contention id
    assert ra.con_res_id_received(b"\xaa\xbb\xcc\xdd\xee\xff")
    assert done == [0x777]


def test_ra_power_ramping_and_retry():
    phy = FakePhyRa()
    ra = RaProc(
        RaConfig(response_window=2, power_ramp_db=2.0),
        prach_send=phy.prach_send,
        start_rar_search=phy.start_rar_search,
        send_msg3=phy.send_msg3,
        on_complete=lambda c: None,
    )
    ra.start(b"M3", b"\x00" * 6)
    for tti in range(40):
        ra.step(tti)
    assert len(phy.preambles) >= 2  # retried after RAR window expiry
    powers = [p for _, p in phy.preambles]
    assert powers[1] == powers[0] + 2.0  # power ramped


def test_ra_preamble_trans_max():
    phy = FakePhyRa()
    ra = RaProc(
        RaConfig(response_window=1, preamble_trans_max=3),
        prach_send=phy.prach_send,
        start_rar_search=phy.start_rar_search,
        send_msg3=phy.send_msg3,
        on_complete=lambda c: None,
    )
    ra.start(b"", b"\x00" * 6)
    for tti in range(100):
        ra.step(tti)
    assert ra.state == RaState.RA_PROBLEM
    assert len(phy.preambles) == 3


# --- BSR / SR / PHR --------------------------------------------------------


def test_bsr_regular_trigger_and_ce():
    rlc = FakeRlc()
    bsr = BsrProc(rlc.get_buffer_state)
    bsr.set_lcg(3, lcg=2, priority=3)
    bsr.step(0)
    assert not bsr.triggered
    rlc.set(3, b"x" * 100)
    bsr.step(1)
    assert bsr.triggered and bsr.sr_needed
    lcid, ce = bsr.generate_bsr()
    assert lcid == pdu_mod.LCID_SHORT_BSR
    lcg = (ce[0] >> 6) & 3
    assert lcg == 2


def test_bsr_long_format_two_groups():
    rlc = FakeRlc()
    bsr = BsrProc(rlc.get_buffer_state)
    bsr.set_lcg(1, lcg=0, priority=1)
    bsr.set_lcg(3, lcg=2, priority=3)
    rlc.set(1, b"x" * 50)
    rlc.set(3, b"y" * 500)
    bsr.step(0)
    lcid, ce = bsr.generate_bsr()
    assert lcid == pdu_mod.LCID_LONG_BSR
    idx = pdu_mod.parse_long_bsr(ce)
    assert idx[0] > 0 and idx[2] > 0 and idx[1] == 0 and idx[3] == 0


def test_sr_escalates_to_ra():
    sr = SrProc(sr_trans_max=4)
    sr.start()
    sent = sum(sr.step(t, sr_opportunity=True) for t in range(10))
    assert sent == 4
    assert sr.ra_needed


def test_phr_periodic():
    phr = PhrProc(periodic_timer=5, prohibit_timer=0)
    assert phr.generate_phr(10.0) is not None  # initial
    assert phr.generate_phr(10.0) is None
    for t in range(5):
        phr.step(t)
    v = phr.generate_phr(17.0)
    assert v == 40  # 17 + 23


def test_time_alignment_timer_flushes_harq():
    from srsue_tpu.mac.mac import Mac

    class PhyStub:
        def sr_opportunity(self, t): return False
        def sr_send(self, t): pass
        def set_timeadv(self, ta): self.ta = ta
        def get_headroom_db(self): return 10.0
        def pdcch_dl_search_crnti(self, c): pass
        def pdcch_dl_search_temp_crnti(self, c): pass
        def pdcch_dl_search_rar(self, *a): pass
        def prach_send(self, *a): return 0

    rlc = FakeRlc()
    mac = Mac(rlc=rlc, phy=PhyStub())
    mac.set_time_alignment_timer(5)
    mac._on_ta(17)
    assert mac.ul_time_aligned
    mac.ul_harq.new_tx(0, b"pending")
    for t in range(6):
        mac.run_tti(t)
    assert not mac.ul_time_aligned  # timer expired
    assert not mac.ul_harq.has_pending(8)  # HARQ flushed


def test_ra_rearms_after_completion():
    """After a successful RA the procedure must return to IDLE on the
    next step so a later SR-exhaustion RA can start (proc_ra.cc
    step_completition semantics)."""
    phy = FakePhyRa()
    done = []
    ra = RaProc(
        RaConfig(),
        prach_send=phy.prach_send,
        start_rar_search=phy.start_rar_search,
        send_msg3=phy.send_msg3,
        on_complete=lambda crnti: done.append(crnti),
    )
    crid = b"\x01\x02\x03\x04\x05\x06"
    for rnd in range(2):
        ra.start(b"MSG3", crid)
        for tti in range(3):
            ra.step(tti)
        g = pdu_mod.RarGrant(False, 10, 2, 0, False, False)
        rar = pdu_mod.Rar(ra.preamble_idx, ta=1, grant=g, t_crnti=0x700 + rnd)
        ra.rar_received(pdu_mod.pack_rar_pdu([rar]))
        assert ra.con_res_id_received(crid)
        assert not ra.is_running
        ra.step(99)  # COMPLETION -> IDLE
        assert ra.state == RaState.IDLE
    assert done == [0x700, 0x701]


def test_padding_bsr_truncated_short_long():
    """Padding BSR selection by leftover room (36.321 §5.4.5,
    proc_bsr.cc:310): long when >= 4 bytes fit, truncated of the
    highest-priority LCG when several groups but only short room,
    short when a single group."""
    rlc = FakeRlc()
    bsr = BsrProc(rlc.get_buffer_state)
    bsr.set_lcg(1, lcg=0, priority=1)
    bsr.set_lcg(3, lcg=2, priority=3)
    rlc.set(1, b"x" * 50)
    rlc.set(3, b"y" * 500)
    # room for long
    lcid, ce = bsr.generate_padding_bsr(4)
    assert lcid == pdu_mod.LCID_LONG_BSR
    # two groups, room only for short -> truncated, highest-priority LCG 0
    lcid, ce = bsr.generate_padding_bsr(2)
    assert lcid == pdu_mod.LCID_TRUNC_BSR
    assert (ce[0] >> 6) & 3 == 0
    # one group -> short
    rlc.set(1, b"")
    lcid, ce = bsr.generate_padding_bsr(2)
    assert lcid == pdu_mod.LCID_SHORT_BSR
    assert (ce[0] >> 6) & 3 == 2
    # no room
    assert bsr.generate_padding_bsr(1) is None


def test_mux_inserts_padding_bsr():
    """A grant with leftover room after SDUs carries a padding BSR CE."""
    rlc = FakeRlc()
    rlc.set(3, b"\x03" * 10)
    mux = Mux(rlc.read_pdu, rlc.get_buffer_state)
    mux.set_priority(3, priority=1)
    bsr = BsrProc(rlc.get_buffer_state)
    bsr.set_lcg(3, lcg=1, priority=1)
    mux.padding_bsr_cb = bsr.generate_padding_bsr
    raw = mux.pdu_get(40)  # 10 bytes of data, plenty of padding
    got = pdu_mod.unpack(raw, uplink=True)
    lcids = [s.lcid for s in got.subheaders]
    assert pdu_mod.LCID_LONG_BSR in lcids or pdu_mod.LCID_SHORT_BSR in lcids
