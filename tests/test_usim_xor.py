"""XOR test-algorithm USIM (34.108 §8; reference usim.cc 'xor' branch)."""

from srsue_tpu.usim.usim import Usim, UsimConfig


def test_xor_auth_res_and_keys():
    cfg = UsimConfig(algo="xor", k=bytes(range(16)))
    u = Usim(cfg)
    rand = bytes(range(16, 32))
    autn = bytes(16)
    res = u.generate_authentication_response(rand, autn, 1, 1)
    xdout = bytes(a ^ b for a, b in zip(cfg.k, rand))
    assert res == xdout[:8]
    assert u.k_asme is not None and len(u.k_asme) == 32
    u.generate_nas_keys(0, 2)
    assert len(u.keys["nas_int"]) == 16


def test_xor_deterministic_and_key_varies_with_rand():
    cfg = UsimConfig(algo="xor")
    u1, u2 = Usim(cfg), Usim(cfg)
    r1, r2 = bytes(16), bytes([1]) * 16
    a = bytes(16)
    assert u1.generate_authentication_response(r1, a, 1, 1) == \
        u2.generate_authentication_response(r1, a, 1, 1)
    k1 = u1.k_asme
    u1.generate_authentication_response(r2, a, 1, 1)
    assert u1.k_asme != k1
