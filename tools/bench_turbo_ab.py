"""Pallas-vs-XLA turbo decoder A/B at production shapes (VERDICT r1
weak-2: "no recorded measurement backs the Pallas claim").

Times `turbo.decode` (pure-JAX windowed lax.scan BCJR) against
`turbo_pallas.decode` (hand-written VMEM-resident kernel) on the same
rate-1/3 LLR batch: K=6144, forced n_iters (no early exit), B blocks.
B=416 matches 32 subframes of the 20 MHz flagship (13 blocks/sf).

Usage: python tools/bench_turbo_ab.py [B] [n_iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 416
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    K = 6144

    import jax
    import jax.numpy as jnp

    from srsue_tpu.phy import crc as crcmod
    from srsue_tpu.phy import turbo, turbo_pallas

    rng = np.random.default_rng(0)
    m = np.zeros((K, 24), np.uint8)
    m[: K - 24] = crcmod.crc_matrix(K - 24, "24A")
    m[K - 24 :] = np.eye(24, dtype=np.uint8)
    payload = crcmod.attach(rng.integers(0, 2, K - 24).astype(np.uint8),
                            "24A")
    x = 1.0 - 2.0 * turbo.encode(payload).astype(np.float32)
    sigma = 10 ** (-1.0 / 20)
    xs = np.broadcast_to(x, (B,) + x.shape) + \
        rng.standard_normal((B,) + x.shape).astype(np.float32) * sigma
    llrs = jnp.asarray(2 * xs / sigma**2)

    def run(fn, name, n_rep=8):
        jf = jax.jit(lambda d: fn(d)[2].sum())
        t0 = time.time()
        ok = int(np.asarray(jf(llrs)))
        t_c = time.time() - t0
        t0 = time.time()
        for _ in range(n_rep):
            ok = int(np.asarray(jf(llrs)))
        dt = (time.time() - t0) / n_rep
        bits = B * (K - 24) * n_iters / 8  # info bits at 8-iter cost basis
        print(f"{name:8s}: {dt*1e3:8.2f} ms  ({B} blocks x {n_iters} it, "
              f"ok={ok}/{B}, compile {t_c:.0f}s) -> "
              f"{B*(K-24)/dt/1e6:.1f} Mbps", flush=True)
        return dt

    t_pal = run(lambda d: turbo_pallas.decode(
        d, K, n_iters=n_iters, crc_mat=m, window=64, early_exit=False),
        "pallas")
    t_xla = run(lambda d: turbo.decode(
        d, K, n_iters=n_iters, crc_mat=m, window=64, early_exit=False),
        "xla")
    print(f"speedup pallas vs xla: {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
