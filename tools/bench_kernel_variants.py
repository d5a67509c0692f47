"""On-device A/B of turbo BCJR kernel variants at the flagship shape.

Times ONE half-iteration pallas_call (the unit the 8-iteration decode
invokes 16x) over the production window batch: 256 subframes x 13 blocks
x 96 windows = 319,488 windows (312 VPU tiles). Every timed rep forces a
readback (axon relay: async completion events cannot be trusted).

Usage: python tools/bench_kernel_variants.py [variants...]
       (default: v2 v3)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    variants = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "v2", "v3"]
    lw = 64
    n_windows = 256 * 13 * 96  # flagship shape
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/srsue_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from srsue_tpu.phy import turbo_pallas

    rng = np.random.default_rng(0)
    pad = (-n_windows) % turbo_pallas.TILE
    n = n_windows + pad
    lin = jnp.asarray(rng.standard_normal((n, lw)).astype(np.float32))
    par = jnp.asarray(rng.standard_normal((n, lw)).astype(np.float32))
    a0 = jnp.zeros((n, 8), jnp.float32)
    b0 = jnp.zeros((n, 8), jnp.float32)

    def make_run(n_chain):
        @jax.jit
        def run(lin, par, a0, b0):
            def step(carry, _):
                lin_c, a0_c, b0_c = carry
                ext, alast, bfirst = turbo_pallas.half_windowed_pallas(
                    lin_c, par, a0_c, b0_c, lw)
                # feed outputs back: forces serialization, defeats CSE
                return (ext, alast, bfirst), None

            (ext, alast, bfirst), _ = jax.lax.scan(
                step, (lin, a0, b0), None, length=n_chain)
            return ext[0, 0] + alast[0, 0] + bfirst[0, 0]

        return run

    def timeit(fn, n_rep=8):
        t0 = time.time()
        out = float(np.asarray(fn(lin, par, a0, b0)))
        t_c = time.time() - t0
        t0 = time.time()
        for _ in range(n_rep):
            out = float(np.asarray(fn(lin, par, a0, b0)))
        return (time.time() - t0) / n_rep, t_c, out

    results = {}
    for v in variants:
        os.environ["SRSUE_TPU_TURBO_KERNEL"] = v
        r1 = make_run(1)
        r9 = make_run(9)
        dt1, tc1, out1 = timeit(r1)
        dt9, tc9, out9 = timeit(r9)
        per_half = (dt9 - dt1) / 8  # fixed dispatch+readback cancels
        results[v] = per_half
        print(f"{v:4s}: {per_half*1e3:8.2f} ms/half "
              f"(-> {2*per_half*1e3:.2f} ms/iter kernel-only; "
              f"scan1 {dt1*1e3:.1f} ms, scan9 {dt9*1e3:.1f} ms, "
              f"compile {tc1:.0f}/{tc9:.0f}s, probe {out9:.4g})",
              flush=True)
        r1.clear_cache()
        r9.clear_cache()
    base = results.get("v2")
    for v, dt in results.items():
        if base and v != "v2":
            print(f"{v} vs v2: {base/dt:.3f}x")


if __name__ == "__main__":
    main()
