"""BLER vs SNR for the flagship 20 MHz 64QAM mcs28 chain — calibrates
bench.py's SNR_WATERFALL (the BLER~10% operating point demanded by
VERDICT r1 item 1).

Usage: python tools/snr_sweep.py [B] [snr ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    args = [a for a in sys.argv[1:]]
    B = int(args[0]) if args else 32
    snrs = [float(a) for a in args[1:]] or [20, 21, 22, 23, 24, 25, 26]

    import jax
    import jax.numpy as jnp

    from bench import add_noise, build_clean
    from srsue_tpu.phy import chest, equalize, ofdm
    from srsue_tpu.phy.pdsch import PdschCodec
    from srsue_tpu.utils.jaxutil import iq_complex, iq_pairs

    (cell, grant, subframe, cfi, rnti, dci_bits, payloads, td, p_sig,
     rng) = build_clean(B)
    codec = PdschCodec(cell, grant, rnti=rnti, subframe=subframe, cfi=cfi,
                       n_turbo_iters=8)

    @jax.jit
    def rx(iq_p):
        iq = iq_complex(iq_p)
        grid = ofdm.demodulate(cell, iq)
        h, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
        x_eq, nv = equalize.zf(codec.extract_re(grid),
                               codec.extract_re(h), nvar)
        payload, tb_ok, blk_ok, iters = codec.decode(x_eq, nv)
        out = jnp.zeros((8, 128), jnp.float32)
        return (out.at[0, 0].set(jnp.sum(tb_ok.astype(jnp.float32)))
                .at[0, 1].set(jnp.mean(iters.astype(jnp.float32)))
                .at[0, 2].set(jnp.mean(blk_ok.astype(jnp.float32))))

    for snr in snrs:
        iq = jnp.asarray(iq_pairs(add_noise(rng, td, p_sig, snr)))
        t0 = time.time()
        s = np.asarray(rx(iq))
        dt = time.time() - t0
        print(f"SNR {snr:5.1f} dB: TB BLER {1 - s[0,0]/B:6.3f} "
              f"({int(s[0,0])}/{B} ok), blk ok {s[0,2]:.3f}, "
              f"iters {s[0,1]:5.2f}  [{dt:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
