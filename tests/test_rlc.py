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
