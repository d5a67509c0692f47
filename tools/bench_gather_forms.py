"""Measure TPU gather costs for candidate turbo-loop layouts (chained
marginals; relay fixed cost cancels).

Forms at the flagship interleave size (20.4M f32 = 3328 blocks x 6144):
  a) minor-dim gather x[:, perm]        [B, K] K-idx broadcast (current)
  b) row gather y[g]                    [R, 128] with R-idx, R = B*K/128
  c) row gather z[g2]                   [R2, 8, 128] with R2 = B*K/1024
  d) tile/untile transpose pair         (current per-half glue)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B, K = 3328, 6144
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/srsue_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))
    perm_np = rng.permutation(K).astype(np.int32)

    R = B * K // 128
    g_np = rng.permutation(R).astype(np.int32)
    R2 = B * K // 1024
    g2_np = rng.permutation(R2).astype(np.int32)

    def chain(fn, n):
        @jax.jit
        def run(x0):
            acc = x0
            for _ in range(n):
                acc = fn(acc)
            return acc.reshape(-1)[0]

        return run

    def marginal(fn, label, arr):
        r1, r5 = chain(fn, 1), chain(fn, 5)
        t0 = time.time()
        float(np.asarray(r1(arr)))
        tc = time.time() - t0
        float(np.asarray(r5(arr)))
        n_rep = 6
        t0 = time.time()
        for _ in range(n_rep):
            float(np.asarray(r1(arr)))
        dt1 = (time.time() - t0) / n_rep
        t0 = time.time()
        for _ in range(n_rep):
            float(np.asarray(r5(arr)))
        dt5 = (time.time() - t0) / n_rep
        print(f"{label:28s}: {(dt5-dt1)/4*1e3:7.2f} ms marginal "
              f"(compile {tc:.0f}s)", flush=True)
        r1.clear_cache()
        r5.clear_cache()

    marginal(lambda a: a[:, jnp.asarray(perm_np)], "minor-dim [B,K][:,perm]", x)
    y = x.reshape(R, 128)
    marginal(lambda a: a[jnp.asarray(g_np)], "row gather [R,128][g]", y)
    z = x.reshape(R2, 8, 128)
    marginal(lambda a: a[jnp.asarray(g2_np)], "row gather [R2,8,128][g]", z)

    from srsue_tpu.phy import turbo_pallas

    lw = 64
    n = B * K // lw
    T = n // turbo_pallas.TILE
    w = x.reshape(n, lw)

    def tile_pair(a):
        t = turbo_pallas.tile_windows(a, lw, T)
        return turbo_pallas.untile_windows(t, lw, T, n)

    marginal(tile_pair, "tile+untile pair [n,64]", w)


if __name__ == "__main__":
    main()
