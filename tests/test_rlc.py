"""RLC loopback tests — the reference's dominant test pattern
(ue/test/upper/rlc_am_test.cc): two entities wired back-to-back in
memory, driven with deliberately small/odd grant sizes to force
segmentation/concatenation, asserting byte-exact reassembly."""

import numpy as np
import pytest

from srsue_tpu.rlc.rlc_am import AmConfig, RlcAm, pack_status, unpack_status
from srsue_tpu.rlc.rlc_tm import RlcTm
from srsue_tpu.rlc.rlc_um import RlcUm, UmConfig


class Sink:
    def __init__(self):
        self.sdus = []

    def __call__(self, sdu):
        self.sdus.append(bytes(sdu))


# --- TM --------------------------------------------------------------------


def test_tm_passthrough():
    sink = Sink()
    tx, rx = RlcTm(), RlcTm(write_up=sink)
    tx.write_sdu(b"hello")
    assert tx.get_buffer_state() == 5
    pdu = tx.read_pdu(100)
    rx.write_pdu(pdu)
    assert sink.sdus == [b"hello"]
    # grant too small -> nothing (TM cannot segment)
    tx.write_sdu(b"toolongforthis")
    assert tx.read_pdu(3) == b""


# --- UM --------------------------------------------------------------------


def test_um_basic():
    sink = Sink()
    tx, rx = RlcUm(), RlcUm(write_up=sink)
    msgs = [bytes([i] * (10 + i)) for i in range(5)]
    for m in msgs:
        tx.write_sdu(m)
    while tx.get_buffer_state():
        pdu = tx.read_pdu(100)
        if not pdu:
            break
        rx.write_pdu(pdu)
    assert sink.sdus == msgs


def test_um_segmentation_small_grants():
    """Small odd grants force both segmentation and concatenation
    (rlc_am_test.cc concat/segment pattern)."""
    rng = np.random.default_rng(0)
    sink = Sink()
    tx, rx = RlcUm(), RlcUm(write_up=sink)
    msgs = [rng.integers(0, 256, n).astype(np.uint8).tobytes() for n in
            (3, 40, 7, 129, 1, 55)]
    for m in msgs:
        tx.write_sdu(m)
    grants = [7, 11, 5, 23, 40, 9, 13, 60, 17, 100, 100, 100]
    for g in grants:
        pdu = tx.read_pdu(g)
        assert len(pdu) <= g
        if pdu:
            rx.write_pdu(pdu)
    assert sink.sdus == msgs


def test_um_5bit_sn():
    sink = Sink()
    cfg = UmConfig(sn_bits=5)
    tx, rx = RlcUm(cfg), RlcUm(cfg, write_up=sink)
    msgs = [bytes([i]) * 20 for i in range(40)]  # SN wraps (mod 32)
    for m in msgs:
        tx.write_sdu(m)
        pdu = tx.read_pdu(100)
        rx.write_pdu(pdu)
    assert sink.sdus == msgs


def test_um_loss_recovery_via_t_reordering():
    sink = Sink()
    tx, rx = RlcUm(UmConfig(t_reordering=5)), RlcUm(
        UmConfig(t_reordering=5), write_up=sink
    )
    msgs = [bytes([i]) * 10 for i in range(4)]
    pdus = []
    for m in msgs:
        tx.write_sdu(m)
        pdus.append(tx.read_pdu(100))
    rx.write_pdu(pdus[0])
    # drop pdus[1]
    rx.write_pdu(pdus[2])
    rx.write_pdu(pdus[3])
    assert sink.sdus == [msgs[0]]
    for _ in range(6):
        rx.step_timers()
    assert sink.sdus == [msgs[0], msgs[2], msgs[3]]
    assert rx.metrics["lost_pdus"] == 1


def test_um_5bit_window_push_without_timer():
    """36.322 §5.1.2.2.3: an SN arriving outside the reordering window
    pushes VR_UH and forces VR_UR past a lost PDU WITHOUT waiting for
    t_reordering (window = 16 for 5-bit SN)."""
    sink = Sink()
    cfg = UmConfig(sn_bits=5, t_reordering=1000)
    tx, rx = RlcUm(cfg), RlcUm(cfg, write_up=sink)
    msgs = [bytes([i]) * 8 for i in range(20)]
    pdus = []
    for m in msgs:
        tx.write_sdu(m)
        pdus.append(tx.read_pdu(100))
    rx.write_pdu(pdus[0])
    # drop SN 1; deliver 2..19 (SN 17 pushes the window past SN 1)
    for p in pdus[2:]:
        rx.write_pdu(p)
    assert sink.sdus == [msgs[0]] + msgs[2:]
    assert rx.metrics["lost_pdus"] == 1


def test_um_5bit_wrapped_sn_not_confused_with_old():
    """A next-cycle PDU reusing a lost SN (mod 32) must NOT be delivered
    in the old SN's position — the receive window keeps SN order."""
    sink = Sink()
    cfg = UmConfig(sn_bits=5, t_reordering=1000)
    tx, rx = RlcUm(cfg), RlcUm(cfg, write_up=sink)
    msgs = [bytes([i]) * 4 for i in range(40)]
    pdus = []
    for m in msgs:
        tx.write_sdu(m)
        pdus.append(tx.read_pdu(100))
    # lose index 1 (SN 1); index 33 is the NEXT cycle's SN 1
    order = [0] + list(range(2, 40))
    for i in order:
        rx.write_pdu(pdus[i])
    assert sink.sdus == [msgs[0]] + msgs[2:]


def test_um_duplicate_and_stale_discarded():
    sink = Sink()
    cfg = UmConfig(sn_bits=10, t_reordering=5)
    tx, rx = RlcUm(cfg), RlcUm(cfg, write_up=sink)
    msgs = [bytes([i]) * 6 for i in range(5)]
    pdus = []
    for m in msgs:
        tx.write_sdu(m)
        pdus.append(tx.read_pdu(100))
    rx.write_pdu(pdus[0])
    rx.write_pdu(pdus[2])
    rx.write_pdu(pdus[2])          # duplicate inside (VR_UR, VR_UH)
    rx.write_pdu(pdus[0])          # stale: below VR_UR
    rx.write_pdu(pdus[1])
    for p in pdus[3:]:
        rx.write_pdu(p)
    assert sink.sdus == msgs       # each delivered exactly once
    assert rx.metrics["dropped_pdus"] == 2


def test_um_gap_mid_segmented_sdu_drops_only_that_sdu():
    """Losing the middle PDU of a 3-PDU SDU must drop that SDU and
    still deliver neighbours after t_reordering expiry."""
    sink = Sink()
    cfg = UmConfig(t_reordering=3)
    tx, rx = RlcUm(cfg), RlcUm(cfg, write_up=sink)
    big = bytes(range(256)) * 3    # segmented across several PDUs
    tx.write_sdu(b"before")
    tx.write_sdu(big)
    tx.write_sdu(b"after")
    pdus = []
    while True:
        p = tx.read_pdu(100)
        if not p:
            break
        pdus.append(p)
    assert len(pdus) >= 4
    mid = len(pdus) // 2
    for i, p in enumerate(pdus):
        if i != mid:
            rx.write_pdu(p)
    for _ in range(4):
        rx.step_timers()
    assert b"before" in sink.sdus
    assert b"after" in sink.sdus
    assert big not in sink.sdus


# --- AM --------------------------------------------------------------------


def _drain(tx, rx, grants):
    for g in grants:
        pdu = tx.read_pdu(g)
        assert len(pdu) <= g, f"PDU overflows grant: {len(pdu)} > {g}"
        if pdu:
            rx.write_pdu(pdu)


def test_am_basic_with_status():
    sink = Sink()
    tx, rx = RlcAm(), RlcAm(write_up=sink)
    msgs = [bytes([i] * 30) for i in range(4)]
    for m in msgs:
        tx.write_sdu(m)
    _drain(tx, rx, [100] * 4)
    assert sink.sdus == msgs
    # poll bit was set (queue empty) -> rx owes a status
    assert rx.do_status
    status = rx.read_pdu(50)
    assert status
    tx.write_pdu(status)
    assert len(tx.tx_window) == 0  # all acked
    assert tx.vt_a == tx.vt_s


def test_am_segmentation_odd_grants():
    rng = np.random.default_rng(1)
    sink = Sink()
    tx, rx = RlcAm(), RlcAm(write_up=sink)
    msgs = [rng.integers(0, 256, n).astype(np.uint8).tobytes() for n in
            (100, 3, 77, 250, 1, 9)]
    for m in msgs:
        tx.write_sdu(m)
    for g in [13, 17, 7, 31, 200, 23, 11, 57, 300, 300]:
        pdu = tx.read_pdu(g)
        assert len(pdu) <= g
        if pdu:
            rx.write_pdu(pdu)
    assert sink.sdus == msgs


def test_am_retx_on_nack():
    sink = Sink()
    tx, rx = RlcAm(AmConfig(poll_pdu=2)), RlcAm(write_up=sink)
    msgs = [bytes([i] * 20) for i in range(4)]
    for m in msgs:
        tx.write_sdu(m)
    # grant 23 fits exactly one 20-byte SDU + header -> one PDU per SDU
    pdus = [tx.read_pdu(23) for _ in range(4)]
    assert all(len(p) for p in pdus)
    rx.write_pdu(pdus[0])
    # lose pdus[1]
    rx.write_pdu(pdus[2])
    rx.write_pdu(pdus[3])
    assert sink.sdus == [msgs[0]]
    status = rx._build_status()
    ack, nacks = unpack_status(status)
    assert nacks == [1]
    tx.write_pdu(status)
    retx = tx.read_pdu(50)
    assert retx
    rx.write_pdu(retx)
    assert sink.sdus == msgs
    assert tx.metrics["retx"] == 1


def test_am_max_retx_notifies_rrc():
    flag = []
    tx = RlcAm(AmConfig(max_retx_thresh=2), on_max_retx=lambda: flag.append(1))
    tx.write_sdu(b"x" * 10)
    pdu = tx.read_pdu(50)
    sn = 0
    for _ in range(3):
        tx.write_pdu(pack_status(1, [sn]))  # NACK it repeatedly
        got = tx.read_pdu(50)
        if not got:
            break
    assert flag


def test_am_status_codec_roundtrip():
    for ack, nacks in [(0, []), (512, [1, 5, 1000]), (1023, [0])]:
        got_ack, got_nacks = unpack_status(pack_status(ack, nacks))
        assert (got_ack, got_nacks) == (ack, nacks)


def test_am_window_stall():
    tx = RlcAm(AmConfig(poll_pdu=10**9, poll_byte=10**9))
    for i in range(600):
        tx.write_sdu(bytes([i % 256] * 5))
    n = 0
    while True:
        pdu = tx.read_pdu(8)  # exactly one 5-byte SDU per PDU
        if not pdu:
            break
        n += 1
    assert n == 512  # window size
