"""Multi-process multi-host worker (SURVEY.md §4 'Implication' /
VERDICT r1 item 5): one process of a jax.distributed cluster running the
carrier-sharded PDSCH decode and the window-sharded turbo decode over
the GLOBAL mesh — collectives cross the process boundary (the DCN path
stand-in for a multi-host pod slice).

Usage: python tools/multihost_worker.py <process_id> <num_processes>
           <coordinator addr:port> <local_device_count>
Prints "MULTIHOST_OK ..." on success.
"""

import sys

sys.path.insert(0, ".")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    ndev_local = int(sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev_local)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    import numpy as np

    assert len(jax.local_devices()) == ndev_local
    ndev = len(jax.devices())
    assert ndev == nproc * ndev_local, jax.devices()

    import jax.numpy as jnp

    from srsue_tpu.parallel.mesh import make_mesh, shard_decode
    from srsue_tpu.parallel import turbo_shard
    from srsue_tpu.phy import crc as crcmod, enb_tx, ra, turbo
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.pdsch import PdschCodec
    from srsue_tpu.utils.jaxutil import to_host

    # ---- 1. carrier-data-parallel decode across BOTH processes ----
    cell = Cell(n_prb=6, cell_id=7)
    grant = ra.dl_grant(cell.n_prb, 5)
    subframe = 1
    codec = PdschCodec(cell, grant, rnti=0x42, subframe=subframe, cfi=1,
                       n_turbo_iters=4)
    mesh = make_mesh(ndev)
    run, in_spec, _ = shard_decode(cell, codec, mesh)

    rng = np.random.default_rng(0)  # same seed everywhere: same data
    b = 2 * ndev
    payloads = np.stack(
        [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(b)]
    )
    tds = []
    for pl in payloads:
        grids = enb_tx.build_pdsch_subframe(cell, codec, pl)
        tds.append(enb_tx.to_waveform(cell, grids)[0])
    td = np.stack(tds)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, 20.0, signal_power=p_sig)

    # build the globally-sharded input from per-process local shards
    arr_shape = noisy.shape
    global_iq = jax.make_array_from_callback(
        arr_shape, in_spec, lambda idx: noisy[idx].astype(np.complex64)
    )
    payload, tb_ok, n_ok, snr = run(global_iq)
    jax.block_until_ready(tb_ok)
    assert int(to_host(n_ok)) == b, f"carrier decode: {to_host(n_ok)}/{b}"

    # ---- 2. window-sharded turbo with cross-process ring ppermute ----
    k = 512
    m = np.zeros((k, 24), np.uint8)
    m[: k - 24] = crcmod.crc_matrix(k - 24, "24A")
    m[k - 24:] = np.eye(24, dtype=np.uint8)
    msg = crcmod.attach(rng.integers(0, 2, k - 24).astype(np.uint8), "24A")
    x = 1.0 - 2.0 * turbo.encode(msg).astype(np.float32)
    sigma = 10 ** (-2.0 / 20)
    xs = x[None] + rng.standard_normal((4,) + x.shape).astype(np.float32) * sigma
    llrs = (2 * xs / sigma**2).astype(np.float32)

    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh_w = make_mesh(ndev, axis="win")
    dec = turbo_shard.make_sharded_decoder(k, 6, mesh_w, window=64,
                                           crc_mat=m)
    repl = NamedSharding(mesh_w, P())
    llrs_g = jax.make_array_from_callback(
        llrs.shape, repl, lambda idx: llrs[idx])
    hard, iters, ok = dec(llrs_g)
    jax.block_until_ready(ok)

    # verify ON the mesh; only replicated scalars cross to the host
    # (globally-sharded arrays are not process-addressable)
    msg_np = msg.astype(np.int32)

    @functools.partial(jax.jit, out_shardings=(repl, repl))
    def check(hard_g, ok_g):
        ref = jnp.asarray(msg_np)
        errs = jnp.sum(jnp.abs(hard_g.astype(jnp.int32) - ref[None]))
        return jnp.sum(ok_g.astype(jnp.int32)), errs

    n_ok_t, n_err = check(hard, ok)
    assert int(to_host(n_ok_t)) == llrs.shape[0], "sharded turbo CRC"
    assert int(to_host(n_err)) == 0, "sharded turbo bit errors"

    print(f"MULTIHOST_OK pid={pid} ndev={ndev} carriers={b} turbo_ok=1",
          flush=True)


if __name__ == "__main__":
    main()
