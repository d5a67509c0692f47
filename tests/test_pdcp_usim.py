"""PDCP entity and USIM/security tests."""

import numpy as np
import pytest

from srsue_tpu.pdcp.pdcp import Pdcp, PdcpConfig, PdcpEntity
from srsue_tpu.usim import security as sec
from srsue_tpu.usim.usim import AuthError, Usim, UsimConfig


# --- security primitives ---------------------------------------------------


def test_aes_cmac_rfc4493_vectors():
    """RFC 4493 test vectors (AES-CMAC with the NIST key)."""
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    assert sec.aes_cmac(key, b"") == bytes.fromhex(
        "bb1d6929e95937287fa37d129b756746"
    )
    msg = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert sec.aes_cmac(key, msg) == bytes.fromhex(
        "070a16b46b4d4144f79bdd9dd04a287c"
    )
    msg40 = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411"
    )
    assert sec.aes_cmac(key, msg40) == bytes.fromhex(
        "dfa66747de9ae63030ca32611497c827"
    )


def test_eia2_and_eea2_roundtrip():
    key = bytes(range(16))
    msg = b"integrity protected message"
    mac = sec.eia2(key, count=7, bearer=1, direction=0, msg=msg)
    assert len(mac) == 4
    # deterministic and input-sensitive
    assert mac == sec.eia2(key, 7, 1, 0, msg)
    assert mac != sec.eia2(key, 8, 1, 0, msg)
    ct = sec.eea2(key, 7, 1, 0, msg)
    assert ct != msg
    assert sec.eea2(key, 7, 1, 0, ct) == msg


def test_kdf_lengths_and_distinctness():
    k_asme = bytes(32)
    k_enb = sec.kdf_k_enb(k_asme, 0)
    assert len(k_enb) == 32
    keys = {
        sec.kdf_as(k_enb, 2, kind)
        for kind in ("rrc_enc", "rrc_int", "up_enc", "up_int")
    }
    assert len(keys) == 4
    assert all(len(k) == 16 for k in keys)


def test_milenage_35207_test_set_1():
    """3GPP 35.207 §4 Test Set 1 golden vectors."""
    k = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
    rand = bytes.fromhex("23553cbe9637a89d218ae64dae47bf35")
    sqn = bytes.fromhex("ff9bb4d0b607")
    amf = bytes.fromhex("b9b9")
    op = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")
    opc = sec.milenage_opc(k, op)
    assert opc == bytes.fromhex("cd63cb71954a9f4e48a5994e37a02baf")
    mac_a, mac_s = sec.milenage_f1(k, opc, rand, sqn, amf)
    assert mac_a == bytes.fromhex("4a9ffac354dfafb3")
    res, ck, ik, ak = sec.milenage_f2345(k, opc, rand)
    assert res == bytes.fromhex("a54211d5e3ba50bf")
    assert ck == bytes.fromhex("b40ba9a3c58b2a05bbf0d987b21bf8cb")
    assert ik == bytes.fromhex("f769bcd751044604127672711c6d3441")
    assert ak == bytes.fromhex("aa689c648370")


# --- USIM ------------------------------------------------------------------


def _make_autn(k, opc, rand, sqn, amf):
    _, _, _, ak = sec.milenage_f2345(k, opc, rand)
    mac_a, _ = sec.milenage_f1(k, opc, rand, sqn, amf)
    sqn_xor_ak = bytes(a ^ b for a, b in zip(sqn, ak))
    return sqn_xor_ak + amf + mac_a


def test_usim_authentication():
    cfg = UsimConfig()
    u = Usim(cfg)
    rand = bytes(range(16))
    sqn = bytes(6)
    autn = _make_autn(cfg.k, u.opc, rand, sqn, cfg.amf)
    res = u.generate_authentication_response(rand, autn, mcc=1, mnc=1)
    assert len(res) == 8
    assert u.k_asme is not None
    u.generate_nas_keys(eea=0, eia=2)
    u.generate_as_keys(nas_count=0, eea=0, eia=2)
    assert len(u.keys["rrc_int"]) == 16


def test_usim_rejects_bad_autn():
    cfg = UsimConfig()
    u = Usim(cfg)
    rand = bytes(range(16))
    bad_autn = bytes(16)
    with pytest.raises(AuthError):
        u.generate_authentication_response(rand, bad_autn, 1, 1)


# --- PDCP ------------------------------------------------------------------


def test_pdcp_drb_12bit_roundtrip():
    out = []
    rlc_q = []
    tx = PdcpEntity(3, PdcpConfig(sn_bits=12, bearer_id=3), rlc_q.append,
                    lambda l, s: None)
    rx = PdcpEntity(3, PdcpConfig(sn_bits=12, bearer_id=3, tx_direction=1,
                                  rx_direction=0), lambda p: None,
                    lambda l, s: out.append(s))
    msgs = [bytes([i]) * 50 for i in range(5)]
    for m in msgs:
        tx.write_sdu(m)
    for p in rlc_q:
        rx.write_pdu(p)
    assert out == msgs


def test_pdcp_srb_integrity():
    key = bytes(range(16))
    rlc_q = []
    out = []
    tx = PdcpEntity(1, PdcpConfig(is_control=True, bearer_id=1), rlc_q.append,
                    lambda l, s: None)
    rx = PdcpEntity(1, PdcpConfig(is_control=True, bearer_id=1, tx_direction=1,
                                  rx_direction=0), lambda p: None,
                    lambda l, s: out.append(s))
    for e in (tx, rx):
        e.config_security(key, key)
        e.enable_integrity()
    tx.write_sdu(b"rrc message")
    rx.write_pdu(rlc_q[0])
    assert out == [b"rrc message"]
    # tampered PDU discarded
    bad = bytearray(rlc_q[0])
    bad[2] ^= 0xFF
    rx.write_pdu(bytes(bad))
    assert out == [b"rrc message"]


def test_pdcp_drb_ciphering_eea2():
    key = bytes(range(16))
    rlc_q = []
    out = []
    cfg = PdcpConfig(sn_bits=12, bearer_id=3, eea=2)
    cfg_peer = PdcpConfig(sn_bits=12, bearer_id=3, eea=2, tx_direction=1,
                          rx_direction=0)
    tx = PdcpEntity(3, cfg, rlc_q.append, lambda l, s: None)
    rx = PdcpEntity(3, cfg_peer, lambda p: None, lambda l, s: out.append(s))
    for e in (tx, rx):
        e.config_security(key, key)
        e.enable_ciphering()
    tx.write_sdu(b"user ip packet")
    assert b"user ip packet" not in rlc_q[0]  # actually ciphered
    rx.write_pdu(rlc_q[0])
    assert out == [b"user ip packet"]


def test_pdcp_container_routing():
    rrc_in, gw_in = [], []

    class FakeRlc:
        def __init__(self):
            self.q = []

        def write_sdu(self, lcid, sdu):
            self.q.append((lcid, sdu))

    class FakeRrc:
        def write_pdu(self, lcid, sdu):
            rrc_in.append((lcid, sdu))

        def write_pdu_bcch_dlsch(self, sdu):
            rrc_in.append(("bcch", sdu))

    class FakeGw:
        def write_pdu(self, lcid, sdu):
            gw_in.append((lcid, sdu))

    rlc = FakeRlc()
    p = Pdcp(rlc=rlc, rrc=FakeRrc(), gw=FakeGw())
    p.add_bearer(1, PdcpConfig(is_control=True, bearer_id=1))
    p.add_bearer(3, PdcpConfig(sn_bits=12, bearer_id=3))
    p.write_sdu(0, b"ccch")  # SRB0: straight to RLC
    assert rlc.q == [(0, b"ccch")]
    # loop a DRB PDU back up: goes to GW
    p.write_sdu(3, b"ippkt")
    lcid, pdu = rlc.q[1]
    p.write_pdu(3, pdu)
    assert gw_in == [(3, b"ippkt")]
    # SRB1 up: goes to RRC
    p.write_sdu(1, b"dcch")
    _, pdu1 = rlc.q[2]
    p.write_pdu(1, pdu1)
    assert rrc_in[-1][0] == 1
