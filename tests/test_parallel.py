"""Multi-device sharding on the 8-device virtual CPU mesh — carriers
sharded across devices with mesh-global collectives (SURVEY.md §2.8)."""

import jax
import numpy as np
import pytest

from srsue_tpu.parallel.mesh import make_mesh, shard_decode
from srsue_tpu.phy import enb_tx, ra
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.pdsch import PdschCodec
from srsue_tpu.utils.jaxutil import to_host


def test_carrier_sharded_decode_8dev():
    assert len(jax.devices()) == 8
    cell = Cell(n_prb=6, cell_id=7)
    grant = ra.dl_grant(cell.n_prb, 5)
    codec = PdschCodec(cell, grant, rnti=0x42, subframe=1, cfi=1,
                       n_turbo_iters=4)
    mesh = make_mesh(8)
    run, in_spec, _ = shard_decode(cell, codec, mesh)

    rng = np.random.default_rng(0)
    b = 16  # 2 carriers per device
    payloads = np.stack(
        [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(b)]
    )
    td = np.stack([
        enb_tx.to_waveform(cell, enb_tx.build_pdsch_subframe(cell, codec, pl))[0]
        for pl in payloads
    ])
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, 20.0, signal_power=p_sig)

    iq = jax.device_put(noisy.astype(np.complex64), in_spec)
    # input really is sharded across the mesh
    assert len(iq.sharding.device_set) == 8
    payload, tb_ok, n_ok, snr = run(iq)
    assert to_host(tb_ok).all()
    assert int(to_host(n_ok)) == b  # psum across shards
    got = to_host(payload).astype(np.uint8)
    np.testing.assert_array_equal(got, payloads)
    # output keeps the carrier sharding
    assert len(payload.sharding.device_set) == 8


def test_graft_entry_dryrun():
    """The driver's multichip dry-run entry, executed in-process."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    payload, tb_ok, iters = out
    assert to_host(tb_ok).all()


@pytest.mark.slow
def test_32_carrier_sharded_decode():
    """BASELINE config 5 (scaled): 32 parallel carriers sharded across the
    8-device mesh, one jitted step, all CRCs pass, psum'd cell metrics.
    (Full-scale 32x20 MHz runs on real pods; the 1.4 MHz version keeps the
    hermetic CPU suite fast while exercising identical sharding.)"""
    cell = Cell(n_prb=6, cell_id=11)
    grant = ra.dl_grant(cell.n_prb, 6)
    codec = PdschCodec(cell, grant, rnti=0x77, subframe=4, cfi=1,
                       n_turbo_iters=4)
    mesh = make_mesh(8)
    run, in_spec, _ = shard_decode(cell, codec, mesh)
    rng = np.random.default_rng(1)
    b = 32
    payloads = np.stack(
        [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(b)]
    )
    td = np.stack([
        enb_tx.to_waveform(cell, enb_tx.build_pdsch_subframe(cell, codec, pl))[0]
        for pl in payloads
    ])
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, 18.0, signal_power=p_sig)
    iq = jax.device_put(noisy.astype(np.complex64), in_spec)
    payload, tb_ok, n_ok, snr = run(iq)
    assert int(to_host(n_ok)) == 32
    np.testing.assert_array_equal(to_host(payload).astype(np.uint8), payloads)
