"""RLC AM re-segmentation (RF=1/SO segments) — the reference's retx
re-segmentation behavior (rlc_am.cc segment/retx test variants)."""

import numpy as np

from srsue_tpu.rlc.rlc_am import AmConfig, RlcAm


def _one_pdu_per_sdu(tx, msgs, grant):
    pdus = []
    for m in msgs:
        tx.write_sdu(m)
        pdus.append(tx.read_pdu(grant))
    return pdus


def test_retx_resegmented_into_small_grants():
    sink = []
    tx = RlcAm(AmConfig(poll_pdu=10**9, poll_byte=10**9))
    rx = RlcAm(write_up=sink.append)
    msgs = [bytes([i] * 60) for i in range(3)]
    pdus = _one_pdu_per_sdu(tx, msgs, 100)
    rx.write_pdu(pdus[0])
    # lose pdus[1] (SN 1, 62 bytes); deliver 2
    rx.write_pdu(pdus[2])
    status = rx._build_status()
    tx.write_pdu(status)  # NACK SN 1
    # retx must fit grants of 30 bytes -> AMD PDU segments
    segs = []
    for _ in range(6):
        s = tx.read_pdu(30)
        if not s:
            break
        assert len(s) <= 30
        segs.append(s)
    assert len(segs) >= 2, "should have re-segmented"
    for s in segs:
        rx.write_pdu(s)
    assert sink == msgs


def test_reseg_out_of_order_segments():
    sink = []
    tx = RlcAm(AmConfig(poll_pdu=10**9, poll_byte=10**9))
    rx = RlcAm(write_up=sink.append)
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 256, 120).astype(np.uint8).tobytes()
    tx.write_sdu(msg)
    pdu = tx.read_pdu(200)
    # force reseg: NACK then tiny grants
    tx.tx_window[0].pending_retx = True
    segs = []
    while True:
        s = tx.read_pdu(40)
        if not s:
            break
        segs.append(s)
    assert len(segs) >= 3
    for s in reversed(segs):  # deliver out of order
        rx.write_pdu(s)
    assert sink == [msg]


def test_reseg_multi_sdu_pdu_boundaries():
    """A PDU carrying several concatenated SDUs, re-segmented at odd
    offsets: boundaries must survive the merge."""
    sink = []
    tx = RlcAm(AmConfig(poll_pdu=10**9, poll_byte=10**9))
    rx = RlcAm(write_up=sink.append)
    msgs = [bytes([0xA0 + i]) * (7 + 3 * i) for i in range(4)]
    for m in msgs:
        tx.write_sdu(m)
    pdu = tx.read_pdu(100)  # one PDU with 4 SDUs + LIs
    tx.tx_window[0].pending_retx = True
    segs = []
    while True:
        s = tx.read_pdu(23)
        if not s:
            break
        segs.append(s)
    assert len(segs) >= 2
    for s in segs:
        rx.write_pdu(s)
    assert sink == msgs
