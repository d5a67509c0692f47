"""A/B the forced-iteration turbo loop form: unrolled vs fori_loop.

Measures, at the flagship decode shape (256 sf x 13 blocks = 3328 blocks
x K=6144, 8 forced iterations):
  * first-call (compile + run) time — the r4 compile_s driver,
  * per-call sync time,
  * chained marginal (2-call chain minus 1-call) — relay-fixed-cost-free.

Usage: python tools/bench_forced_loop.py [B] [forms...]
       (default: 3328, unroll loop)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(args[0]) if args else 3328
    forms = args[1:] or ["unroll", "loop"]
    K = 6144

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/srsue_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from srsue_tpu.phy import crc as crcmod
    from srsue_tpu.phy import turbo

    rng = np.random.default_rng(0)
    m = np.zeros((K, 24), np.uint8)
    m[: K - 24] = crcmod.crc_matrix(K - 24, "24A")
    m[K - 24:] = np.eye(24, dtype=np.uint8)
    payload = crcmod.attach(rng.integers(0, 2, K - 24).astype(np.uint8),
                            "24A")
    x = 1.0 - 2.0 * turbo.encode(payload).astype(np.float32)
    sigma = 10 ** (-1.0 / 20)
    xs = np.broadcast_to(x, (B,) + x.shape) + rng.standard_normal(
        (B,) + x.shape).astype(np.float32) * sigma
    llrs = jnp.asarray(2 * xs / sigma**2)

    for form in forms:
        os.environ["SRSUE_TPU_TURBO_FORCED"] = form  # read at trace time
        from srsue_tpu.phy import turbo_pallas

        def make(n_chain):
            @jax.jit
            def run(d):
                acc = jnp.float32(0)
                dd = d
                for _ in range(n_chain):
                    hard, _, ok = turbo_pallas.decode(
                        dd, K, n_iters=8, crc_mat=m, window=64,
                        early_exit=False)
                    acc = acc + ok.sum()
                    # serialize the chain: next input depends on last out
                    dd = d + 0.0 * hard[0, 0]
                return acc

            return run

        r1, r2 = make(1), make(2)
        t0 = time.time()
        ok1 = int(np.asarray(r1(llrs)))
        tc1 = time.time() - t0
        t0 = time.time()
        ok2 = int(np.asarray(r2(llrs)))
        tc2 = time.time() - t0
        n_rep = 6
        t0 = time.time()
        for _ in range(n_rep):
            ok1 = int(np.asarray(r1(llrs)))
        dt1 = (time.time() - t0) / n_rep
        t0 = time.time()
        for _ in range(n_rep):
            ok2 = int(np.asarray(r2(llrs)))
        dt2 = (time.time() - t0) / n_rep
        print(f"{form:7s}: first+compile {tc1:6.1f}s (chain2 {tc2:6.1f}s) "
              f"sync {dt1*1e3:7.2f} ms  marginal {(dt2-dt1)*1e3:7.2f} ms "
              f"ok={ok1}/{B},{ok2}/{2*B}", flush=True)
        r1.clear_cache()
        r2.clear_cache()


if __name__ == "__main__":
    main()
