"""Micro-bench of the OFDM demodulation front-end (P0) on the device.

The axon relay adds a ~28 ms FIXED dispatch+readback cost to every jit
call (measured r4: a no-op jit costs the same as a 17-GFLOP matmul), so
naive per-call timing says nothing about kernel cost. This tool chains
N dependent demodulations inside ONE jit and reports the marginal cost
(chainN - chain1)/(N-1), plus the EVM floor vs the host-numpy twin.

Usage: python tools/bench_demod.py [B] [precision]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    if len(sys.argv) > 2:
        os.environ["SRSUE_TPU_FFT_PRECISION"] = sys.argv[2]

    import jax
    import jax.numpy as jnp

    from srsue_tpu.phy import ofdm
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.utils.jaxutil import iq_complex, iq_pairs

    cell = Cell(n_prb=100, cell_id=1)
    rng = np.random.default_rng(0)
    td = (rng.standard_normal((B, cell.sf_len))
          + 1j * rng.standard_normal((B, cell.sf_len))).astype(np.complex64)

    def mk(n_chain):
        @jax.jit
        def run(iq_p):
            probe = jnp.float32(0.0)
            for _ in range(n_chain):
                # fold the previous probe into the input: serializes the
                # chain so CSE can't collapse it
                g = ofdm.demodulate(cell, iq_complex(iq_p * (1 + 1e-12 * probe)))
                probe = jnp.sum(jnp.real(g[..., 0, :8]).astype(jnp.float32))
            return probe
        return run

    def timeit(fn, reps=8):
        t0 = time.time()
        out = float(np.asarray(fn(jnp.asarray(iq_pairs(td)))))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = float(np.asarray(fn(jnp.asarray(iq_pairs(td)))))
        return (time.time() - t0) / reps, tc, out

    d1, c1, _ = timeit(mk(1))
    d9, c9, _ = timeit(mk(9))
    marg = (d9 - d1) / 8

    # accuracy: single demod vs numpy twin
    gj = ofdm.demodulate(cell, iq_complex(jnp.asarray(iq_pairs(td[:4]))))
    gr = np.asarray(jnp.real(gj).astype(jnp.float32))
    gi = np.asarray(jnp.imag(gj).astype(jnp.float32))
    ref = ofdm.demodulate_np(cell, td[:4])
    d = (gr + 1j * gi) - ref
    evm = 20 * np.log10(np.sqrt(np.mean(np.abs(d) ** 2))
                        / np.sqrt(np.mean(np.abs(ref) ** 2)))
    prec = os.environ.get("SRSUE_TPU_FFT_PRECISION", "high")
    print(f"[demod B={B} prec={prec}] marginal {marg*1e3:.2f} ms/batch "
          f"(chain1 {d1*1e3:.1f} ms, chain9 {d9*1e3:.1f} ms, "
          f"compile {c1:.0f}/{c9:.0f}s) EVM {evm:.1f} dB")


if __name__ == "__main__":
    main()
