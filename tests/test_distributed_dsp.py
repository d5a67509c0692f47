"""Distributed DSP on the virtual 8-device mesh: time-block front end
with halo exchange, and window-sharded turbo decoding with ring boundary
+ all-gather extrinsic collectives (the BASELINE north-star patterns)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.parallel.mesh import make_mesh
from srsue_tpu.parallel import timeshard, turbo_shard
from srsue_tpu.phy import crc as crcmod
from srsue_tpu.phy import ofdm, turbo
from srsue_tpu.phy.cell import Cell
from srsue_tpu.utils.jaxutil import to_host, to_host_complex


def test_timeshard_frontend_matches_unsharded():
    cell = Cell(n_prb=6, cell_id=5)
    mesh = make_mesh(8, axis="time")
    n_sf_per_dev = 2
    rng = np.random.default_rng(0)
    n = 8 * n_sf_per_dev * cell.sf_len
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    run, in_shard, out_cell = timeshard.sharded_frontend(
        cell, mesh, n_sf_per_dev, decim=1, cfo=0.11
    )
    got = run(jax.device_put(iq, in_shard))

    # reference: unsharded continuous-phase CFO correction + demod
    ph = np.exp(-2j * np.pi * 0.11 * np.arange(n) / cell.nfft)
    ref = ofdm.demodulate_np(cell, (iq * ph).reshape(16, cell.sf_len))
    np.testing.assert_allclose(to_host_complex(got), ref, atol=2e-3)


def test_timeshard_with_decimation_halo():
    """Decimating FIR across shard boundaries: halo exchange must make
    the sharded result match the unsharded filter (excluding the final
    block tail, which has no right neighbor)."""
    from srsue_tpu.phy import sync

    cell = Cell(n_prb=50, cell_id=5)
    mesh = make_mesh(8, axis="time")
    n_sf_per_dev = 1
    rng = np.random.default_rng(1)
    n = 8 * n_sf_per_dev * cell.sf_len
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    decim = cell.nfft // 128

    run, in_shard, out_cell = timeshard.sharded_frontend(
        cell, mesh, n_sf_per_dev, decim=decim
    )
    got = to_host_complex(run(jax.device_put(iq, in_shard)))
    assert out_cell.n_prb == 6

    low_ref = np.asarray(
        sync.decimate(jnp.asarray(iq), decim)
    )
    ref = ofdm.demodulate_np(out_cell, low_ref.reshape(8, out_cell.sf_len))
    # all but the last device's grid must match exactly (last one loses
    # its FIR lookahead at the capture end)
    np.testing.assert_allclose(got[:7], ref[:7], atol=2e-3)


@pytest.mark.parametrize("k", [512, 6144])
def test_sharded_turbo_matches_local(k):
    mesh = make_mesh(8, axis="win")
    rng = np.random.default_rng(2)
    b = 2
    m = np.zeros((k, 24), np.uint8)
    m[: k - 24] = crcmod.crc_matrix(k - 24, "24A")
    m[k - 24 :] = np.eye(24, dtype=np.uint8)

    payloads, llrs = [], []
    for _ in range(b):
        p = rng.integers(0, 2, k - 24).astype(np.uint8)
        msg = crcmod.attach(p, "24A")
        x = 1.0 - 2.0 * turbo.encode(msg).astype(np.float32)
        sigma = 10 ** (-1.0 / 20)
        x = x + rng.standard_normal(x.shape).astype(np.float32) * sigma
        llrs.append(2 * x / sigma**2)
        payloads.append(msg)
    llrs = np.stack(llrs)
    payloads = np.stack(payloads)

    run = turbo_shard.make_sharded_decoder(k, 8, mesh, window=64, crc_mat=m)
    hard, iters, ok = run(jnp.asarray(llrs))
    assert to_host(ok).all(), "sharded turbo failed CRC"
    np.testing.assert_array_equal(to_host(hard).astype(np.uint8), payloads)

    # parity with the single-device windowed decoder
    h_loc, it_loc, ok_loc = turbo.decode(jnp.asarray(llrs), k, 8, crc_mat=m,
                                         window=64)
    np.testing.assert_array_equal(to_host(hard), np.asarray(h_loc))
