"""Pallas BCJR kernel: bit parity with the pure-JAX windowed decoder
(interpret mode on CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import crc as crcmod
from srsue_tpu.phy import turbo, turbo_pallas


def _make(k, b, snr_db, rng):
    m = np.zeros((k, 24), np.uint8)
    m[: k - 24] = crcmod.crc_matrix(k - 24, "24A")
    m[k - 24 :] = np.eye(24, dtype=np.uint8)
    payloads, llrs = [], []
    for _ in range(b):
        p = rng.integers(0, 2, k - 24).astype(np.uint8)
        msg = crcmod.attach(p, "24A")
        x = 1.0 - 2.0 * turbo.encode(msg).astype(np.float32)
        sigma = 10 ** (-snr_db / 20)
        x = x + rng.standard_normal(x.shape).astype(np.float32) * sigma
        llrs.append(2 * x / sigma**2)
        payloads.append(msg)
    return np.stack(payloads), np.stack(llrs), m


def test_half_kernel_matches_jax():
    """The kernel's extrinsics/boundaries == the pure-JAX windowed half."""
    k, lw, b = 512, 64, 3
    rng = np.random.default_rng(0)
    _, llrs, _ = _make(k, b, 2.0, rng)
    sys1 = jnp.asarray(llrs[:, 0, :k])
    par1 = jnp.asarray(llrs[:, 1, :k])
    t = llrs[:, :, k : k + 4]
    tail_sys = jnp.asarray(np.stack([t[:, 0, 0], t[:, 2, 0], t[:, 1, 1]], 1))
    tail_par = jnp.asarray(np.stack([t[:, 1, 0], t[:, 0, 1], t[:, 2, 1]], 1))
    W = k // lw
    ab = jnp.zeros((b, W, 8), jnp.float32)
    bb = jnp.zeros((b, W, 8), jnp.float32)
    apriori = jnp.zeros((b, k), jnp.float32)

    ref_ext, ref_ab, ref_bb = turbo._bcjr_half_windowed(
        sys1, par1, apriori, tail_sys, tail_par, ab, bb, lw
    )
    got_ext, got_ab, got_bb = turbo_pallas.bcjr_half_windowed_pallas(
        sys1, par1, apriori, tail_sys, tail_par, ab, bb, lw, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_ext), np.asarray(ref_ext),
                               rtol=1e-5, atol=1e-4)
    # boundary metrics are defined up to a per-window additive offset
    # (max-log only uses differences; the kernel normalizes by state 0,
    # the JAX reference by the per-step max) — compare offset-invariantly
    def norm(x):
        return x - x.max(axis=-1, keepdims=True)

    np.testing.assert_allclose(norm(np.asarray(got_ab)),
                               norm(np.asarray(ref_ab)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(norm(np.asarray(got_bb)),
                               norm(np.asarray(ref_bb)),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("k", [512, 6144])
def test_full_decode_matches_windowed(k):
    rng = np.random.default_rng(1)
    payloads, llrs, m = _make(k, 2, 1.0, rng)
    h_ref, it_ref, ok_ref = turbo.decode(jnp.asarray(llrs), k, 4, crc_mat=m,
                                         window=64)
    h_pal, it_pal, ok_pal = turbo_pallas.decode(jnp.asarray(llrs), k, 4,
                                                crc_mat=m, window=64,
                                                interpret=True)
    assert np.asarray(ok_pal).all()
    np.testing.assert_array_equal(np.asarray(h_pal), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(it_pal), np.asarray(it_ref))


def test_unrolled_kernel_matches_fori_loop():
    """The UNROLLED kernel body (the variant actually compiled on TPU)
    equals the fori_loop form in interpret mode (ADVICE r2: the unrolled
    form previously shipped untested)."""
    k, lw, b = 256, 64, 2
    rng = np.random.default_rng(7)
    _, llrs, _ = _make(k, b, 2.0, rng)
    n = b * (k // lw)
    pad = (-n) % turbo_pallas.TILE
    lin = np.concatenate(
        [llrs[:, 0, :k].reshape(n, lw),
         np.zeros((pad, lw), np.float32)]).astype(np.float32)
    par = np.concatenate(
        [llrs[:, 1, :k].reshape(n, lw),
         np.zeros((pad, lw), np.float32)]).astype(np.float32)
    a0 = np.zeros((n + pad, 8), np.float32)
    b0 = np.zeros((n + pad, 8), np.float32)
    args = (jnp.asarray(lin), jnp.asarray(par), jnp.asarray(a0),
            jnp.asarray(b0))
    ref = turbo_pallas.half_windowed_pallas(*args, lw, interpret=True,
                                            unroll=False)
    got = turbo_pallas.half_windowed_pallas(*args, lw, interpret=True,
                                            unroll=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-5)


def test_radix4_matches_radix2(monkeypatch):
    """The radix-4 v4 kernel (two trellis steps per recursion step —
    the TPU default) equals the radix-2 v3 kernel in interpret mode
    (VERDICT r3 item 1: 'interpret-mode test pins radix-4 == radix-2')."""
    k, lw, b = 512, 64, 3
    rng = np.random.default_rng(21)
    _, llrs, _ = _make(k, b, 2.0, rng)
    n = b * (k // lw)
    pad = (-n) % turbo_pallas.TILE
    lin = np.concatenate(
        [llrs[:, 0, :k].reshape(n, lw),
         np.zeros((pad, lw), np.float32)]).astype(np.float32)
    par = np.concatenate(
        [llrs[:, 1, :k].reshape(n, lw),
         np.zeros((pad, lw), np.float32)]).astype(np.float32)
    rng2 = np.random.default_rng(22)
    a0 = rng2.standard_normal((n + pad, 8)).astype(np.float32)
    b0 = rng2.standard_normal((n + pad, 8)).astype(np.float32)
    args = (jnp.asarray(lin), jnp.asarray(par), jnp.asarray(a0),
            jnp.asarray(b0))
    outs = {}
    for variant in ("v3", "v4"):
        monkeypatch.setenv("SRSUE_TPU_TURBO_KERNEL", variant)
        outs[variant] = turbo_pallas.half_windowed_pallas(
            *args, lw, interpret=True)
    for g, r in zip(outs["v4"], outs["v3"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-4)


def test_v5_bf16_decodes_and_tracks_f32(monkeypatch):
    """v5 (radix-4 in BFLOAT16 on (16,128)-native tiles — the packed-
    instruction variant) decodes correctly and its extrinsics track the
    f32 kernel within bf16 quantization of the working LLR scale."""
    k = 512
    rng = np.random.default_rng(31)
    payloads, llrs, m = _make(k, 3, 1.0, rng)
    d = jnp.asarray(llrs)
    monkeypatch.setenv("SRSUE_TPU_TURBO_KERNEL", "v4")
    h4, it4, ok4 = turbo_pallas.decode(d, k, 4, crc_mat=m, window=64,
                                       interpret=True)
    monkeypatch.setenv("SRSUE_TPU_TURBO_KERNEL", "v5")
    h5, it5, ok5 = turbo_pallas.decode(d, k, 4, crc_mat=m, window=64,
                                       interpret=True)
    assert np.asarray(ok5).all()
    np.testing.assert_array_equal(np.asarray(h5), payloads)
    np.testing.assert_array_equal(np.asarray(h5), np.asarray(h4))
    # same convergence behaviour at this SNR
    assert (np.asarray(it5) <= np.asarray(it4) + 1).all()


def test_forced_path_decodes():
    """The lean forced-iteration path (no per-iteration CRC/masking —
    the 8-iter headline program) still decodes correctly and reports
    iters == n_iters."""
    k = 512
    rng = np.random.default_rng(9)
    payloads, llrs, m = _make(k, 2, 1.0, rng)
    h, it, ok = turbo_pallas.decode(jnp.asarray(llrs), k, 4, crc_mat=m,
                                    window=64, early_exit=False,
                                    interpret=True)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(h), payloads)
    np.testing.assert_array_equal(np.asarray(it), np.full(2, 4))


def test_tiled_forced_path_matches_window_linear(monkeypatch):
    """The tiled iteration loop (decode_forced_tiled: zero per-iteration
    transposes, composed-index interleave gathers) is numerically
    identical to the window-linear forced loop."""
    k = 512
    rng = np.random.default_rng(11)
    payloads, llrs, m = _make(k, 3, 1.0, rng)
    d = jnp.asarray(llrs)

    monkeypatch.setenv("SRSUE_TPU_TURBO_TILED", "0")
    h_ref, it_ref, ok_ref = turbo_pallas.decode(
        d, k, 3, crc_mat=m, window=64, early_exit=False, interpret=True)
    h_til, it_til, ok_til = turbo_pallas.decode_forced_tiled(
        d, k, 3, crc_mat=m, window=64, interpret=True)

    np.testing.assert_array_equal(np.asarray(h_til), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(ok_til), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(it_til), np.asarray(it_ref))
    assert np.asarray(ok_til).all()
    np.testing.assert_array_equal(np.asarray(h_til), payloads)

    # and the env-gated dispatch through decode() agrees too
    monkeypatch.setenv("SRSUE_TPU_TURBO_TILED", "1")
    h_dft, _, ok_dft = turbo_pallas.decode(
        d, k, 3, crc_mat=m, window=64, early_exit=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_dft), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(ok_dft), np.asarray(ok_ref))


@pytest.mark.parametrize("form", ["loop", "loop_tiled"])
def test_forced_loop_forms_match_unrolled(monkeypatch, form):
    """The env-selectable fori_loop forced forms (r5 perf ledger:
    rejected for runtime, kept as compile-time escape hatch /
    measurement record) stay bit-identical to the unrolled path."""
    k = 512
    rng = np.random.default_rng(13)
    payloads, llrs, m = _make(k, 5, 1.0, rng)  # 5 blocks: pad path too
    d = jnp.asarray(llrs)

    monkeypatch.setenv("SRSUE_TPU_TURBO_FORCED", "unroll")
    h_ref, it_ref, ok_ref = turbo_pallas.decode(
        d, k, 3, crc_mat=m, window=64, early_exit=False, interpret=True)
    monkeypatch.setenv("SRSUE_TPU_TURBO_FORCED", form)
    h, it, ok = turbo_pallas.decode(
        d, k, 3, crc_mat=m, window=64, early_exit=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(it), np.asarray(it_ref))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(h), payloads)


def test_bm_layout_flagship_k_window_remap(monkeypatch):
    """The flagship codeblock (K=5824) does not tile at lw=64 (W=91);
    the bm layout must remap to lw=104 (W=56) and stay equivalent to
    the window-linear paths — the exact shape the 20 MHz max-TBS bench
    decodes (r5)."""
    k = 5824
    assert turbo_pallas._bm_window(k, 64) == 104
    rng = np.random.default_rng(17)
    payloads, llrs, m = _make(k, 2, 1.0, rng)
    d = jnp.asarray(llrs)
    # direct bm entry points (B=2 pads to full lanes)
    h_f, it_f, ok_f = turbo_pallas.decode_forced_bm(
        d, k, 3, crc_mat=m, window=104, interpret=True)
    assert np.asarray(ok_f).all()
    np.testing.assert_array_equal(np.asarray(h_f), payloads)
    assert h_f.shape == (2, k) and it_f.shape == (2,)
    h_e, it_e, ok_e = turbo_pallas.decode_bm_early_exit(
        d, k, 6, m, window=104, interpret=True)
    assert np.asarray(ok_e).all()
    np.testing.assert_array_equal(np.asarray(h_e), payloads)
    assert (np.asarray(it_e) <= 3).all()
    # window-linear reference agrees
    monkeypatch.setenv("SRSUE_TPU_TURBO_LAYOUT", "linear")
    h_l, _, ok_l = turbo_pallas.decode(
        d, k, n_iters=3, crc_mat=m, window=104, early_exit=False,
        interpret=True)
    assert np.asarray(ok_l).all()
    np.testing.assert_array_equal(np.asarray(h_l), np.asarray(h_f))
