"""Benchmark: PDSCH decode throughput at 20 MHz SISO 64QAM max TBS
(BASELINE config 3; reference anchor: 60 Mbps on i7-4790, README.md:4).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbps", "vs_baseline": N}

Method (mirrors metrics_stdout's TB-bits/s discipline, SURVEY.md §6):
batch B full subframes of 64QAM max-TBS PDSCH at operating SNR through
the complete grant-known receive chain (OFDM demod -> CRS chest -> ZF eq
-> demap -> descramble -> dematch -> windowed 8-iter max-log-MAP turbo
w/ CRC early exit -> TB CRC) as one jitted program; decoded TB bits per
wall-clock second, inputs resident in HBM.

Robustness: the accelerator measurement runs in a TIMEOUT-GUARDED CHILD
process because this environment's axon relay can wedge on device->host
reads (.claude/skills/verify/SKILL.md). Every timed repetition forces a
small result readback so execution is PROVEN complete (the relay's async
completion events return immediately and cannot be trusted for timing).
If the child fails/times out, the same program is timed on the CPU
platform and reported with a "platform" tag.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_MBPS = 60.0
# ~30 ms of the per-call time is fixed relay dispatch+readback latency;
# batch until the marginal per-subframe compute (~0.25 ms) dominates.
# (B=512 reaches 220 Mbps but its compile+input-build time crowds the
# child timeout; 256 keeps >60% of the asymptote with margin.)
B_DEFAULT = 256


def build_input(B: int):
    import jax.numpy as jnp  # noqa: F401

    from srsue_tpu.phy import enb_tx, ra
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.pdsch import PdschCodec

    cell = Cell(n_prb=100, cell_id=42)
    grant = ra.dl_grant(cell.n_prb, 28)  # 64QAM, TBS 75376, C=13
    subframe = 6
    codec = PdschCodec(cell, grant, rnti=0x1234, subframe=subframe, cfi=1,
                       n_turbo_iters=8)
    rng = np.random.default_rng(0)
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
    return cell, grant, subframe, codec, payloads, noisy


def make_rx(cell, codec, subframe, expected):
    import jax.numpy as jnp

    from srsue_tpu.phy import chest, equalize, ofdm
    from srsue_tpu.utils.jaxutil import iq_complex

    def rx(iq_p):
        # IQ crosses host->device as float32 [..., 2] pairs: the axon
        # runtime rejects complex64 transfers (UNIMPLEMENTED).
        iq = iq_complex(iq_p)
        grid = ofdm.demodulate(cell, iq)
        h, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
        x_eq, nv_eff = equalize.zf(
            codec.extract_re(grid), codec.extract_re(h), nvar
        )
        payload, tb_ok, blk_ok, iters = codec.decode(x_eq, nv_eff)
        n_ok = jnp.sum(tb_ok.astype(jnp.float32))
        bit_match = jnp.mean(
            (payload.astype(jnp.float32) == jnp.asarray(expected[: iq.shape[0]]))
            .astype(jnp.float32)
        )
        mean_iters = jnp.mean(iters.astype(jnp.float32))
        stats = jnp.zeros((8, 128), jnp.float32)
        stats = stats.at[0, 0].set(n_ok).at[0, 1].set(bit_match)
        stats = stats.at[0, 2].set(mean_iters)
        return stats

    return rx


def measure(device_kind: str, B: int, n_rep: int = 10) -> dict:
    """Build, compile, verify and time the chain; returns result dict.
    Every timed rep includes a forced small readback (proof of
    execution)."""
    import jax
    import jax.numpy as jnp

    from srsue_tpu.utils.jaxutil import iq_pairs

    cell, grant, subframe, codec, payloads, noisy = build_input(B)
    expected = payloads.astype(np.float32)
    rx = jax.jit(make_rx(cell, codec, subframe, expected))

    iq = jnp.asarray(iq_pairs(noisy))

    def run_and_read():
        out = rx(iq)
        # tiny dependent op + read: proves the whole program executed
        probe = jnp.zeros((8, 128), jnp.float32) + out
        return np.asarray(probe)

    t0 = time.time()
    s = run_and_read()
    t_first = time.time() - t0
    assert s[0, 0] == B, f"decode failed: {s[0,0]}/{B} TBs ok"
    assert s[0, 1] == 1.0, f"payload mismatch: {s[0,1]}"
    print(
        f"[{device_kind}] compile+first(+read): {t_first:.1f}s, "
        f"iters {s[0,2]:.2f}",
        file=sys.stderr, flush=True,
    )

    t0 = time.time()
    for _ in range(n_rep):
        s = run_and_read()
    dt = (time.time() - t0) / n_rep
    mbps = B * grant.tbs / dt / 1e6
    msamp = B * cell.sf_len / dt / 1e6
    print(
        f"[{device_kind}] steady: {dt*1e3:.2f} ms/batch of {B} sf -> "
        f"{mbps:.1f} Mbps, {msamp:.1f} Msamples/s",
        file=sys.stderr, flush=True,
    )
    return {"mbps": mbps, "msamples": msamp, "dt_ms": dt * 1e3}


def _run_child(mode: str, B: int, timeout: int = 480):
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, timeout=timeout,
            env=dict(os.environ, SRSUE_BENCH_B=str(B)),
        )
        sys.stderr.write(p.stderr[-3000:])
        for line in p.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                return json.loads(line[len("CHILD_RESULT "):])
    except subprocess.TimeoutExpired as e:
        sys.stderr.write(f"bench child {mode} timed out\n")
    return None


def main() -> None:
    B = int(os.environ.get("SRSUE_BENCH_B", B_DEFAULT))

    if "--child" in sys.argv or "--child-cpu" in sys.argv:
        import jax

        if "--child-cpu" in sys.argv:
            # flip BEFORE any device query (sitecustomize force-registers
            # the accelerator; env vars alone cannot override it)
            jax.config.update("jax_platforms", "cpu")
        n_rep = 3 if "--child-cpu" in sys.argv else 10
        r = measure(jax.default_backend(), B, n_rep=n_rep)
        r["platform"] = jax.default_backend()
        print("CHILD_RESULT " + json.dumps(r), flush=True)
        return

    result = _run_child("--child", B)
    platform = result.get("platform") if result else None
    if result is None:
        result = _run_child("--child-cpu", B, timeout=900)
        platform = "cpu_fallback"
    if result is None:
        raise SystemExit("bench failed on every platform")

    print(
        json.dumps(
            {
                "metric": "pdsch_decode_20mhz_64qam_maxtbs",
                "value": round(result["mbps"], 2),
                "unit": "Mbps",
                "vs_baseline": round(result["mbps"] / BASELINE_MBPS, 3),
                "platform": platform,
                "msamples_per_s": round(result["msamples"], 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
