"""Scaling-efficiency bench: carrier-sharded PDSCH decode over a device
mesh (BASELINE.md: "samples/s scaling efficiency measured at 1 chip,
1 host, and N>=2 hosts").

Only one physical TPU chip is reachable in this environment, so the mesh
is the 8-device virtual CPU platform (the same stand-in SURVEY.md §4
prescribes for pod slices); the numbers measure SHARDING efficiency —
how much of ideal linear speedup the carrier-DP program keeps as the
mesh grows — not absolute throughput (bench.py owns that, on the chip).

Strong scaling: fixed 16-carrier batch, mesh of 1/2/4/8 devices.
Prints one JSON line with samples/s per mesh size and parallel
efficiency vs the 1-device run.

Usage: python tools/bench_scaling.py [B] [n_turbo_iters]
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8, "need the 8-device virtual mesh"

    from srsue_tpu.parallel.mesh import make_mesh, shard_decode
    from srsue_tpu.phy import enb_tx, ra
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.pdsch import PdschCodec
    from srsue_tpu.utils.jaxutil import to_host

    cell = Cell(n_prb=25, cell_id=3)
    grant = ra.dl_grant(cell.n_prb, 16)
    codec = PdschCodec(cell, grant, rnti=0x42, subframe=2, cfi=1,
                       n_turbo_iters=n_iters, early_exit=False)

    rng = np.random.default_rng(0)
    payloads = np.stack(
        [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(B)]
    )
    td = np.stack([
        enb_tx.to_waveform(cell, enb_tx.build_pdsch_subframe(cell, codec, pl))[0]
        for pl in payloads
    ])
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, 18.0, signal_power=p_sig)
    noisy = noisy.astype(np.complex64)

    results = {}
    t1 = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        run, in_spec, _ = shard_decode(cell, codec, mesh)
        iq = jax.device_put(noisy, in_spec)
        payload, tb_ok, n_ok, _ = run(iq)  # compile + correctness
        assert int(to_host(n_ok)) == B, f"{n_dev}dev: decode failed"
        n_rep = 5
        t0 = time.time()
        for _ in range(n_rep):
            out = run(iq)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / n_rep
        if t1 is None:
            t1 = dt
        samp = B * cell.sf_len / dt
        eff = t1 / (dt * n_dev)
        results[n_dev] = {"dt_ms": round(dt * 1e3, 2),
                          "msamples_per_s": round(samp / 1e6, 2),
                          "efficiency": round(eff, 3)}
        print(f"{n_dev} dev: {dt*1e3:8.2f} ms  {samp/1e6:8.2f} Msamp/s  "
              f"eff {eff:.2f}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "carrier_dp_strong_scaling",
        "batch_carriers": B,
        "n_prb": cell.n_prb,
        "platform": "cpu_virtual_mesh",
        "per_mesh": results,
        "speedup_8dev": round(t1 / results[8]["dt_ms"] * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
