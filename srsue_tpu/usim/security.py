"""LTE security primitives — 33.401/35.206 (reference:
liblte/src/liblte_security.cc:257-560).

* KDF: HMAC-SHA256 key derivation (K_ASME, K_eNB, K_NAS/K_RRC/K_UP).
* 128-EIA2: AES-CMAC integrity (NIST SP 800-38B over the EIA2 framing).
* 128-EEA2: AES-CTR ciphering; EEA0 = null cipher.
* Milenage: f1/f1*/f2/f3/f4/f5/f5* on AES-128 (35.206).

AES core via the `cryptography` package (the reference's polarssl role).
"""

from __future__ import annotations

import hmac
import hashlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def _aes_ecb(key: bytes, block: bytes) -> bytes:
    c = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return c.update(block) + c.finalize()


# ---------------------------------------------------------------------------
# KDF — 33.401 Annex A
# ---------------------------------------------------------------------------


def kdf(key: bytes, fc: int, *params: bytes) -> bytes:
    s = bytes([fc])
    for p in params:
        s += p + len(p).to_bytes(2, "big")
    return hmac.new(key, s, hashlib.sha256).digest()


def kdf_k_asme(ck: bytes, ik: bytes, plmn: bytes, sqn_xor_ak: bytes) -> bytes:
    """A.2: K_ASME from CK||IK, SN id (3 bytes), SQN^AK (6 bytes)."""
    return kdf(ck + ik, 0x10, plmn, sqn_xor_ak)


def kdf_k_enb(k_asme: bytes, nas_count: int) -> bytes:
    return kdf(k_asme, 0x11, nas_count.to_bytes(4, "big"))


def kdf_nh(k_asme: bytes, sync_input: bytes) -> bytes:
    """A.4: NH derivation. sync_input = initial K_eNB for NH(1), the
    previous NH for NH(i>1) — the vertical key-chaining input used at
    handover/re-establishment (33.401 §7.2.8)."""
    return kdf(k_asme, 0x12, sync_input)


def kdf_k_enb_star(key: bytes, pci: int, earfcn_dl: int) -> bytes:
    """A.5: K_eNB* from current K_eNB (horizontal, NCC unchanged) or NH
    (vertical, NCC increased) + target PCI + DL EARFCN."""
    return kdf(key, 0x13, pci.to_bytes(2, "big"), earfcn_dl.to_bytes(2, "big"))


def kdf_nas(k_asme: bytes, alg_id: int, is_integrity: bool) -> bytes:
    dist = 0x02 if is_integrity else 0x01
    return kdf(k_asme, 0x15, bytes([dist]), bytes([alg_id]))[16:]


def kdf_as(k_enb: bytes, alg_id: int, kind: str) -> bytes:
    """kind in {'rrc_enc','rrc_int','up_enc','up_int'} (A.7)."""
    dist = {"up_enc": 0x03, "up_int": 0x04, "rrc_enc": 0x05, "rrc_int": 0x06}[kind]
    return kdf(k_enb, 0x15, bytes([dist]), bytes([alg_id]))[16:]


# ---------------------------------------------------------------------------
# AES-CMAC (SP 800-38B) + 128-EIA2
# ---------------------------------------------------------------------------


def _leftshift(b: bytes) -> bytes:
    n = int.from_bytes(b, "big") << 1
    return (n & ((1 << 128) - 1)).to_bytes(16, "big"), (n >> 128) & 1


def _cmac_subkeys(key: bytes) -> tuple[bytes, bytes]:
    l = _aes_ecb(key, b"\x00" * 16)
    k1, ov = _leftshift(l)
    if ov:
        k1 = (int.from_bytes(k1, "big") ^ 0x87).to_bytes(16, "big")
    k2, ov = _leftshift(k1)
    if ov:
        k2 = (int.from_bytes(k2, "big") ^ 0x87).to_bytes(16, "big")
    return k1, k2


def aes_cmac(key: bytes, msg: bytes) -> bytes:
    k1, k2 = _cmac_subkeys(key)
    n = max(1, (len(msg) + 15) // 16)
    complete = len(msg) > 0 and len(msg) % 16 == 0
    blocks = [msg[i * 16 : (i + 1) * 16] for i in range(n)]
    last = blocks[-1]
    if complete:
        last = bytes(a ^ b for a, b in zip(last, k1))
    else:
        pad = last + b"\x80" + b"\x00" * (15 - len(last))
        last = bytes(a ^ b for a, b in zip(pad, k2))
    x = b"\x00" * 16
    for blk in blocks[:-1]:
        x = _aes_ecb(key, bytes(a ^ b for a, b in zip(x, blk)))
    return _aes_ecb(key, bytes(a ^ b for a, b in zip(x, last)))


def eia2(key: bytes, count: int, bearer: int, direction: int, msg: bytes) -> bytes:
    """128-EIA2 MAC-I (4 bytes)."""
    m = count.to_bytes(4, "big") + bytes([(bearer << 3) | (direction << 2)]) + b"\x00" * 3 + msg
    return aes_cmac(key, m)[:4]


def eea2(key: bytes, count: int, bearer: int, direction: int, msg: bytes) -> bytes:
    """128-EEA2 AES-CTR cipher (encrypt == decrypt)."""
    iv = count.to_bytes(4, "big") + bytes([(bearer << 3) | (direction << 2)]) + b"\x00" * 11
    c = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    return c.update(msg) + c.finalize()


def eea0(key: bytes, count: int, bearer: int, direction: int, msg: bytes) -> bytes:
    """Null ciphering (the reference's configured algorithm, rrc.cc:493-496)."""
    return bytes(msg)


EIA = {1: None, 2: eia2}  # EIA1 (SNOW) flagged unsupported
EEA = {0: eea0, 2: eea2}


# ---------------------------------------------------------------------------
# Milenage — 35.206 §4
# ---------------------------------------------------------------------------


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def _rot(b: bytes, r_bits: int) -> bytes:
    n = int.from_bytes(b, "big")
    n = ((n << r_bits) | (n >> (128 - r_bits))) & ((1 << 128) - 1)
    return n.to_bytes(16, "big")


def milenage_opc(k: bytes, op: bytes) -> bytes:
    return _xor(_aes_ecb(k, op), op)


def milenage_f1(k: bytes, opc: bytes, rand: bytes, sqn: bytes, amf: bytes):
    """Returns (mac_a, mac_s)."""
    temp = _aes_ecb(k, _xor(rand, opc))
    in1 = sqn + amf + sqn + amf
    out1 = _xor(
        _aes_ecb(k, _xor(_rot(_xor(in1, opc), 64), temp)), opc
    )
    return out1[:8], out1[8:]


def milenage_f2345(k: bytes, opc: bytes, rand: bytes):
    """Returns (res, ck, ik, ak)."""
    temp = _aes_ecb(k, _xor(rand, opc))
    # OUT2 = E[rot(temp^OPc, r2) ^ c2]K ^ OPc ; c2 = ...1, r2=0
    c2 = (1).to_bytes(16, "big")
    out2 = _xor(_aes_ecb(k, _xor(_xor(temp, opc), c2)), opc)
    res = out2[8:]
    ak = out2[:6]
    c3 = (2).to_bytes(16, "big")
    out3 = _xor(_aes_ecb(k, _xor(_rot(_xor(temp, opc), 32), c3)), opc)
    ck = out3
    c4 = (4).to_bytes(16, "big")
    out4 = _xor(_aes_ecb(k, _xor(_rot(_xor(temp, opc), 64), c4)), opc)
    ik = out4
    return res, ck, ik, ak


def milenage_f5_star(k: bytes, opc: bytes, rand: bytes) -> bytes:
    temp = _aes_ecb(k, _xor(rand, opc))
    c5 = (8).to_bytes(16, "big")
    out5 = _xor(_aes_ecb(k, _xor(_rot(_xor(temp, opc), 96), c5)), opc)
    return out5[:6]
