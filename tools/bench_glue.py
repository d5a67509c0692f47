"""Micro-bench of the turbo iteration 'glue' on device: QPP interleaver
gather layouts + full forced-8 decode after the lean-path change.

Usage: python tools/bench_glue.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n_rep=8):
    t0 = time.time()
    out = float(np.asarray(fn(*args)))
    t_c = time.time() - t0
    t0 = time.time()
    for _ in range(n_rep):
        out = float(np.asarray(fn(*args)))
    return (time.time() - t0) / n_rep, t_c, out


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/srsue_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from srsue_tpu.phy import turbo

    B, K = 3328, 6144
    perm = turbo.qpp_perm(K)
    rng = np.random.default_rng(0)
    x_bk = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    x_kb = jnp.asarray(rng.standard_normal((K, B)).astype(np.float32))
    p = jnp.asarray(perm)

    def chain(fn, x, n):
        def step(c, _):
            return fn(c), None
        y, _ = jax.lax.scan(step, x, None, length=n)
        return y[0, 0]

    for name, fn, x in [
        ("col-gather [B,K] x[:,perm]", lambda c: c[:, p], x_bk),
        ("row-gather [K,B] x[perm,:]", lambda c: c[p, :], x_kb),
    ]:
        r1 = jax.jit(lambda x, fn=fn, n=1: chain(fn, x, n))
        r9 = jax.jit(lambda x, fn=fn, n=9: chain(fn, x, n))
        dt1, tc1, _ = timeit(r1, x)
        dt9, tc9, _ = timeit(r9, x)
        print(f"{name}: {(dt9-dt1)/8*1e3:7.3f} ms/apply "
              f"(scan1 {dt1*1e3:.1f}, scan9 {dt9*1e3:.1f}, "
              f"compile {tc1:.0f}/{tc9:.0f}s)", flush=True)

    # full forced-8 decode (lean path), v3 kernel
    os.environ["SRSUE_TPU_TURBO_KERNEL"] = "v3"
    from srsue_tpu.phy import crc as crcmod
    from srsue_tpu.phy import turbo_pallas

    m = np.zeros((K, 24), np.uint8)
    m[: K - 24] = crcmod.crc_matrix(K - 24, "24A")
    m[K - 24:] = np.eye(24, dtype=np.uint8)
    payload = crcmod.attach(rng.integers(0, 2, K - 24).astype(np.uint8),
                            "24A")
    xw = 1.0 - 2.0 * turbo.encode(payload).astype(np.float32)
    sigma = 10 ** (-1.0 / 20)
    xs = np.broadcast_to(xw, (B,) + xw.shape) + \
        rng.standard_normal((B,) + xw.shape).astype(np.float32) * sigma
    llrs = jnp.asarray(2 * xs / sigma**2)

    for it in (8, 1):
        jf = jax.jit(lambda d, it=it: turbo_pallas.decode(
            d, K, n_iters=it, crc_mat=m, window=64,
            early_exit=False)[2].sum())
        dt, tc, ok = timeit(jf, llrs)
        print(f"forced-{it} full decode: {dt*1e3:8.2f} ms "
              f"(ok={ok:.0f}/{B}, compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
