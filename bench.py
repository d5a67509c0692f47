"""Benchmark: PDSCH decode throughput at 20 MHz SISO 64QAM max TBS
(BASELINE config 3; reference anchor: 60 Mbps on i7-4790, README.md:4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbps", "vs_baseline": N}

Method (mirrors metrics_stdout's TB-bits/s discipline, SURVEY.md §6):
batch B full subframes of 64QAM max-TBS PDSCH at operating SNR, run the
complete grant-known receive chain (OFDM demod -> CRS chest -> ZF eq ->
demap -> descramble -> dematch -> 8-iter max-log-MAP turbo w/ CRC early
exit -> TB CRC) as one jitted program, and report decoded TB bits per
wall-clock second with inputs resident in HBM (streaming ingest is
benchmarked separately in the metrics suite).
"""

import json
import sys
import time

import numpy as np

BASELINE_MBPS = 60.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from srsue_tpu.phy import chest, enb_tx, equalize, ofdm, ra
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.pdsch import PdschCodec
    from srsue_tpu.utils.jaxutil import to_host

    cell = Cell(n_prb=100, cell_id=42)
    grant = ra.dl_grant(cell.n_prb, 28)  # 64QAM, TBS 75376, C=13
    subframe = 6
    codec = PdschCodec(cell, grant, rnti=0x1234, subframe=subframe, cfi=1,
                       n_turbo_iters=8)

    rng = np.random.default_rng(0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"building {B} subframes of 20 MHz 64QAM TBS={grant.tbs}...",
          file=sys.stderr, flush=True)
    payloads = np.stack(
        [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(B)]
    )
    tds = []
    for pl in payloads:
        grids = enb_tx.build_pdsch_subframe(cell, codec, pl)
        tds.append(enb_tx.to_waveform(cell, grids)[0])
    td = np.stack(tds)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, _ = enb_tx.awgn(rng, td, 26.0, signal_power=p_sig)

    # numpy (NOT device) constant: jit embeds numpy closures directly;
    # closing over a device array forces a D2H copy during lowering,
    # which the axon runtime rejects.
    expected = payloads.astype(np.float32)

    # Scalar-only outputs: the axon runtime's D2H path is only reliable for
    # small float32 transfers (see .claude/skills/verify/SKILL.md), and the
    # benchmark discipline wants no bulk readback anyway — payloads are
    # verified ON DEVICE against the known TX bits.
    # Results leave the device as ONE tile-aligned (8, 128) float32 array —
    # the only D2H shape class the axon relay has proven reliable for
    # (scalars/odd shapes from large executables hit UNIMPLEMENTED paths).
    @jax.jit
    def rx(iq):
        grid = ofdm.demodulate(cell, iq)
        h, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
        x_eq, nv_eff = equalize.zf(
            codec.extract_re(grid), codec.extract_re(h), nvar
        )
        payload, tb_ok, blk_ok, iters = codec.decode(x_eq, nv_eff)
        n_ok = jnp.sum(tb_ok.astype(jnp.float32))
        bit_match = jnp.mean(
            (payload.astype(jnp.float32) == jnp.asarray(expected)).astype(jnp.float32)
        )
        mean_iters = jnp.mean(iters.astype(jnp.float32))
        stats = jnp.zeros((8, 128), jnp.float32)
        stats = stats.at[0, 0].set(n_ok).at[0, 1].set(bit_match)
        stats = stats.at[0, 2].set(mean_iters)
        return stats

    iq = jnp.asarray(noisy)
    t0 = time.time()
    stats = rx(iq)
    jax.block_until_ready(stats)
    print(f"compile+first run: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    s = np.asarray(stats)
    n_ok, bit_match, mean_iters = s[0, 0], s[0, 1], s[0, 2]
    assert n_ok == B, f"decode failed: {n_ok}/{B} TBs ok"
    assert bit_match == 1.0, f"payload mismatch: {bit_match}"
    print(f"mean turbo iters: {mean_iters:.2f}", file=sys.stderr)

    # steady state
    n_rep = 20
    t0 = time.time()
    for _ in range(n_rep):
        out = rx(iq)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_rep
    mbps = B * grant.tbs / dt / 1e6
    msamp = B * cell.sf_len / dt / 1e6
    print(
        f"steady: {dt*1e3:.2f} ms/batch of {B} sf -> {mbps:.1f} Mbps, "
        f"{msamp:.1f} Msamples/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "pdsch_decode_20mhz_64qam_maxtbs",
                "value": round(mbps, 2),
                "unit": "Mbps",
                "vs_baseline": round(mbps / BASELINE_MBPS, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
