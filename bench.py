"""Benchmark: PDSCH decode throughput at 20 MHz SISO 64QAM max TBS
(BASELINE config 3; reference anchor: 60 Mbps on i7-4790, README.md:4,
"8-iteration turbo decoding" per BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbps", "vs_baseline": N, ...}

The HEADLINE value is the honest operating point: the COMPLETE per-TTI
receive pipeline — OFDM demod -> CRS chest -> full-grid ZF -> PCFICH
decode -> blind PDCCH search over every search-space candidate (DCI
unpacked on-device and verified against the transmitted grant) -> PDSCH
extract/demap/descramble/dematch -> EIGHT FORCED turbo iterations (no
early exit) -> TB CRC — matching what the reference's 60 Mbps number
includes (phch_worker.cc:132-243 does PDCCH+PDSCH every TTI at
max_noi-capped iterations). Secondary operating points reported in the
same JSON:

  * early_exit: same chain with CRC early exit at 26 dB SNR (the r1
    number's operating point)
  * waterfall:  early-exit chain at SNR near the BLER~10% cliff, with
    the measured BLER (throughput counts only CRC-pass TBs)

Method mirrors metrics_stdout's TB-bits/s discipline (SURVEY.md §6):
batch B full subframes as one jitted program; decoded TB bits per
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
# ~25 ms of the per-call time is fixed relay dispatch+readback latency;
# batch until the marginal per-subframe compute dominates.
B_DEFAULT = 256
SNR_OPERATING = 26.0
# near the BLER cliff for 64QAM mcs28 (rate .92) over AWGN; kept at
# 20 dB across rounds for comparability. r4 recalibration on v5e
# (tools/snr_sweep.py) after the chest pilot denoiser: BLER 1.2% @
# 20 dB / 9.4% @ 19 dB (was 4.3% / 100% with raw-LS chest) — the JSON
# carries the measured BLER so the point is self-describing. The bench
# asserts BLER < 60% so drift is caught rather than silently
# mismeasured.
SNR_WATERFALL = 20.0


def build_clean(B: int):
    """Build B subframes with CRS + PCFICH + PDCCH(DCI 1A @ C-RNTI) +
    max-TBS PDSCH — the full control+data subframe the timed chain must
    process blind."""
    from srsue_tpu.phy import control, dci, enb_tx, ra
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.pdsch import PdschCodec

    cell = Cell(n_prb=100, cell_id=42)
    grant = ra.dl_grant(cell.n_prb, 28)  # 64QAM, TBS 75376, C=13
    subframe = 6
    cfi = 1
    rnti = 0x1234
    codec = PdschCodec(cell, grant, rnti=rnti, subframe=subframe, cfi=cfi,
                       n_turbo_iters=8)
    d = dci.Dci1A(riv=dci.riv_encode(cell.n_prb, 0, cell.n_prb), mcs=28,
                  harq_pid=0, ndi=True, rv=0, tpc=0)
    dci_bits = dci.pack_1a(cell.n_prb, d)
    n_cce, _ = control.pdcch_geometry(cell, cfi)
    cands = control.search_space_candidates(n_cce, rnti, subframe)
    start, l = [c for c in cands if c[1] >= 4][0]

    rng = np.random.default_rng(0)
    payloads = np.stack(
        [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(B)]
    )
    tds = []
    for pl in payloads:
        grid = enb_tx.empty_grid(cell)
        enb_tx.add_crs(cell, grid, subframe, 0)
        control.pcfich_map(cell, grid, subframe, cfi)
        control.pdcch_map(cell, grid, subframe, cfi, dci_bits, rnti,
                          start, l)
        codec.map_to_grid(grid, codec.encode_symbols(pl))
        tds.append(enb_tx.to_waveform(cell, [grid])[0])
    td = np.stack(tds)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    return (cell, grant, subframe, cfi, rnti, dci_bits, payloads, td,
            p_sig, rng)


def add_noise(rng, td, p_sig, snr_db):
    from srsue_tpu.phy import enb_tx

    noisy, _ = enb_tx.awgn(rng, td, snr_db, signal_power=p_sig)
    return noisy


def make_rx(cell, grant, subframe, cfi, rnti, dci_bits, expected,
            early_exit: bool, eq: str = "zf"):
    """The full honest per-TTI chain as ONE jitted function.

    eq: "zf" | "mmse" (per-RE noise-weighted demap, information-
    equivalent in SISO) | "zf_scalar" (ZF with the noise variance
    AVERAGED over the allocation before demap — the naive receiver a
    scalar noise estimate gives; on frequency-selective channels this
    is what MMSE/per-RE weighting measurably beats)."""
    import jax.numpy as jnp

    from srsue_tpu.phy import chest, control, dci, equalize, ofdm
    from srsue_tpu.phy.pdsch import PdschCodec
    from srsue_tpu.utils.jaxutil import iq_complex

    codec = PdschCodec(cell, grant, rnti=rnti, subframe=subframe, cfi=cfi,
                       n_turbo_iters=8, early_exit=early_exit)
    dci_len = dci.size_0_1a(cell.n_prb)
    exp_dci = jnp.asarray(dci_bits.astype(np.float32))
    eq_fn = equalize.mmse if eq == "mmse" else equalize.zf

    def rx(iq_p):
        # IQ crosses host->device as float32 [..., 2] pairs: the axon
        # runtime rejects complex64 transfers (UNIMPLEMENTED).
        iq = iq_complex(iq_p)
        grid = ofdm.demodulate(cell, iq)
        h, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
        # control region: full-grid equalize -> PCFICH -> blind search
        g_eq, nv_grid = eq_fn(grid, h, nvar)
        cfi_dev, _ = control.pcfich_decode(cell, g_eq, nv_grid, subframe)
        hard, ok = control.pdcch_blind_batch(
            cell, g_eq, nv_grid, subframe, cfi, rnti, dci_len)
        # DCI verified on-device: some passing candidate carries exactly
        # the transmitted grant bits
        match = jnp.all(hard.astype(jnp.float32) == exp_dci, axis=-1) & ok
        n_dci = jnp.sum(jnp.any(match, axis=-1).astype(jnp.float32))
        cfi_ok = jnp.sum((cfi_dev == cfi).astype(jnp.float32))
        # data: PDSCH extract + equalize + decode
        x_eq, nv_eff = eq_fn(
            codec.extract_re(grid), codec.extract_re(h), nvar
        )
        if eq == "zf_scalar":
            nv_eff = jnp.broadcast_to(
                jnp.mean(nv_eff, axis=-1, keepdims=True), nv_eff.shape)
        payload, tb_ok, blk_ok, iters = codec.decode(x_eq, nv_eff)
        n_ok = jnp.sum(tb_ok.astype(jnp.float32))
        bit_match = jnp.mean(
            jnp.where(tb_ok[:, None],
                      (payload.astype(jnp.float32)
                       == jnp.asarray(expected[: iq.shape[0]])).astype(
                           jnp.float32),
                      1.0)
        )
        mean_iters = jnp.mean(iters.astype(jnp.float32))
        stats = jnp.zeros((8, 128), jnp.float32)
        stats = (stats.at[0, 0].set(n_ok).at[0, 1].set(bit_match)
                 .at[0, 2].set(mean_iters).at[0, 3].set(n_dci)
                 .at[0, 4].set(cfi_ok))
        return stats

    return rx


def build_tm2(B: int):
    """B TM2 (SFBC 2-port) max-TBS subframes at 20 MHz (BASELINE ladder
    config 4: '20 MHz TM2 Alamouti')."""
    from srsue_tpu.phy import enb_tx, ra
    from srsue_tpu.phy.cell import Cell
    from srsue_tpu.phy.pdsch import PdschCodec

    cell = Cell(n_prb=100, cell_id=42, n_ports=2)
    grant = ra.dl_grant(cell.n_prb, 28)
    subframe = 6
    rnti = 0x1234
    codec = PdschCodec(cell, grant, rnti=rnti, subframe=subframe, cfi=1,
                       n_turbo_iters=8, early_exit=False)
    rng = np.random.default_rng(1)
    payloads = np.stack([rng.integers(0, 2, grant.tbs).astype(np.uint8)
                         for _ in range(B)])
    tds = []
    for pl in payloads:
        grids = enb_tx.build_pdsch_subframe(cell, codec, pl, tm2=True)
        tds.append(np.sum(enb_tx.to_waveform(cell, grids), axis=0))
    td = np.stack(tds)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    return cell, grant, subframe, rnti, codec, payloads, td, p_sig, rng


def make_tm2_rx(cell, codec, subframe, expected):
    """TM2 data-path chain: demod -> 2-port chest -> SFBC combine ->
    decode (the ue_dl.py TM2 path at benchmark scale)."""
    import jax.numpy as jnp

    from srsue_tpu.phy import chest, equalize, ofdm
    from srsue_tpu.utils.jaxutil import iq_complex

    def rx(iq_p):
        iq = iq_complex(iq_p)
        grid = ofdm.demodulate(cell, iq)
        h0, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
        h1, _, _ = chest.estimate(cell, grid, subframe, port=1)
        x_eq, nv_eff = equalize.alamouti_combine(
            codec.extract_re(grid), codec.extract_re(h0),
            codec.extract_re(h1), nvar)
        payload, tb_ok, _, iters = codec.decode(x_eq, nv_eff)
        n_ok = jnp.sum(tb_ok.astype(jnp.float32))
        bit_match = jnp.mean(
            jnp.where(tb_ok[:, None],
                      (payload.astype(jnp.float32)
                       == jnp.asarray(expected)).astype(jnp.float32),
                      1.0))
        stats = jnp.zeros((8, 128), jnp.float32)
        return (stats.at[0, 0].set(n_ok).at[0, 1].set(bit_match)
                .at[0, 2].set(jnp.mean(iters.astype(jnp.float32))))

    return rx


def measure(device_kind: str, B: int, n_rep: int = 8) -> dict:
    """Build, compile, verify and time the three operating points.
    Every timed rep includes a forced small readback (proof of
    execution)."""
    import jax
    import jax.numpy as jnp

    from srsue_tpu.utils.jaxutil import iq_pairs

    (cell, grant, subframe, cfi, rnti, dci_bits, payloads, td, p_sig,
     rng) = build_clean(B)
    expected = payloads.astype(np.float32)

    iq_op = jnp.asarray(iq_pairs(add_noise(rng, td, p_sig, SNR_OPERATING)))
    iq_wf = jnp.asarray(iq_pairs(add_noise(rng, td, p_sig, SNR_WATERFALL)))

    def run_and_read(jf, iq):
        out = jf(iq)
        probe = jnp.zeros((8, 128), jnp.float32) + out
        return np.asarray(probe)

    def timed(jf, iq, label, want_all_ok=True, nb=None, control_ok=True,
              tbs=None):
        nb = B if nb is None else nb
        tbs = grant.tbs if tbs is None else tbs
        t0 = time.time()
        s = run_and_read(jf, iq)
        t_first = time.time() - t0
        if want_all_ok:
            assert s[0, 0] == nb, f"{label}: decode failed {s[0,0]}/{nb}"
        assert s[0, 1] == 1.0, f"{label}: payload mismatch {s[0,1]}"
        if control_ok:
            assert s[0, 3] == nb, f"{label}: blind DCI found {s[0,3]}/{nb}"
            assert s[0, 4] == nb, f"{label}: CFI decode {s[0,4]}/{nb}"
        # serial dispatch -> compute -> readback per batch. (Double-
        # buffered pipelining was measured WORSE here — 136.9 vs 128.1 ms
        # at the flagship shape — because the axon relay serializes
        # dispatch with execution, so in-flight batches only add queuing
        # overhead. On a directly-attached chip, overlap would hide the
        # ~25 ms fixed relay latency included in these numbers.)
        # SRSUE_BENCH_XPROF=<dir>: capture an XLA-profiler device trace
        # of the timed reps (TensorBoard/xprof), srsue_tpu.utils.trace
        import contextlib

        from srsue_tpu.utils.trace import XlaTrace

        xprof_dir = os.environ.get("SRSUE_BENCH_XPROF")
        ctx = (XlaTrace(f"{xprof_dir}/{label}") if xprof_dir
               else contextlib.nullcontext())
        t0 = time.time()
        with ctx:
            for _ in range(n_rep):
                s = run_and_read(jf, iq)
        dt = (time.time() - t0) / n_rep
        if xprof_dir and getattr(ctx, "errors", None):
            print(f"[{device_kind}] {ctx.errors[0]}", file=sys.stderr)
        ok = float(s[0, 0])
        mbps = ok * tbs / dt / 1e6
        print(f"[{device_kind}] {label}: {dt*1e3:.2f} ms/batch({nb}sf) "
              f"ok={ok:.0f}/{nb} iters={s[0,2]:.2f} -> {mbps:.1f} Mbps "
              f"(first+compile {t_first:.0f}s)", file=sys.stderr, flush=True)
        return {"mbps": mbps, "dt_ms": dt * 1e3, "bler": 1.0 - ok / nb,
                "iters": float(s[0, 2]), "compile_s": t_first}

    rx_forced = jax.jit(make_rx(cell, grant, subframe, cfi, rnti, dci_bits,
                                expected, early_exit=False))
    rx_ee = jax.jit(make_rx(cell, grant, subframe, cfi, rnti, dci_bits,
                            expected, early_exit=True))
    # waterfall runs the MMSE equalizer (VERDICT r3 item 5): at the BLER
    # cliff the regularized combiner buys real BLER vs plain ZF
    rx_mmse = jax.jit(make_rx(cell, grant, subframe, cfi, rnti, dci_bits,
                              expected, early_exit=True, eq="mmse"))

    r_forced = timed(rx_forced, iq_op, "8iter-forced")
    r_ee = timed(rx_ee, iq_op, "early-exit@26dB")
    r_wf = timed(rx_mmse, iq_wf, f"waterfall-mmse@{SNR_WATERFALL:.0f}dB",
                 want_all_ok=False)
    assert 0.0 <= r_wf["bler"] < 0.6, f"waterfall BLER off: {r_wf['bler']}"

    # sustained PIPELINED throughput: n_rep batches in flight, block
    # once — the streaming-deployment number (a continuous receiver
    # never synchronizes the host between batches; the sync numbers
    # above carry ~25-30 ms of per-call relay dispatch+readback that a
    # directly-attached chip wouldn't)
    t0 = time.time()
    outs = [rx_forced(iq_op) for _ in range(n_rep)]
    jax.block_until_ready(outs)
    dt_pipe = (time.time() - t0) / n_rep
    s = np.asarray(outs[-1] + jnp.zeros((8, 128), jnp.float32))
    assert s[0, 0] == B and s[0, 1] == 1.0
    pipe_mbps = float(s[0, 0]) * grant.tbs / dt_pipe / 1e6
    print(f"[{device_kind}] 8iter-pipelined: {dt_pipe*1e3:.2f} ms/batch "
          f"-> {pipe_mbps:.1f} Mbps", file=sys.stderr, flush=True)

    # 32-carrier realtime-latency point (BASELINE ladder config 5, the
    # single-chip shape: one subframe per carrier per 1-ms TTI). dt <=
    # 32 ms means a chip keeps up with 32 carriers in pipelined steady
    # state at this (blind-search + forced-8-iter) operating point.
    n_c = min(32, B)
    rx_c32 = jax.jit(make_rx(cell, grant, subframe, cfi, rnti, dci_bits,
                             expected[:n_c], early_exit=False))
    r_c32 = timed(rx_c32, iq_op[:n_c], f"carriers{n_c}x1sf", nb=n_c)
    # ... and the realistic operating mode of the same point: CRC early
    # exit (runs 1.0x iterations at this SNR) — VERDICT r4 item 5
    rx_c32_ee = jax.jit(make_rx(cell, grant, subframe, cfi, rnti, dci_bits,
                                expected[:n_c], early_exit=True))
    r_c32_ee = timed(rx_c32_ee, iq_op[:n_c], f"carriers{n_c}x1sf-ee",
                     nb=n_c)

    # frequency-SELECTIVE waterfall (VERDICT r4 item 4a): a 2-tap
    # channel with a 12-sample delay (well inside the 144-sample CP)
    # ripples |H| by +-3.5 dB with period nfft/12 ~ 171 subcarriers —
    # this is where per-RE noise weighting (MMSE / weighted ZF) and the
    # chest denoiser's adaptive FIR span become visible. Three
    # receivers on the SAME impaired IQ: per-RE-weighted MMSE, per-RE
    # weighted ZF (information-equivalent in SISO — recorded to verify
    # that equivalence rather than assert it), and scalar-noise ZF (the
    # naive receiver; measurably worse here).
    # calibrated on v5e (B=64 sweep): mmse BLER 1.6% @ 21 dB (zf
    # IDENTICAL — the SISO equivalence holds to the bit), zf_scalar 27%
    MP_SNR = 21.0
    taps = np.zeros(13, np.complex64)
    taps[0], taps[12] = 1.0, 0.5
    taps /= np.sqrt(np.sum(np.abs(taps) ** 2))
    td_mp = np.stack([np.convolve(t, taps)[: td.shape[1]] for t in td])
    iq_mp = jnp.asarray(iq_pairs(add_noise(rng, td_mp, p_sig, MP_SNR)))
    r_mp = {}
    for eq_kind in ("mmse", "zf", "zf_scalar"):
        rx_mp = jax.jit(make_rx(cell, grant, subframe, cfi, rnti, dci_bits,
                                expected, early_exit=True, eq=eq_kind))
        r_mp[eq_kind] = timed(rx_mp, iq_mp, f"multipath-{eq_kind}@{MP_SNR:.0f}dB",
                              want_all_ok=False, control_ok=False)
    assert r_mp["zf_scalar"]["bler"] >= r_mp["mmse"]["bler"], r_mp

    # UL PUSCH encode throughput (VERDICT r4 item 5b; encode_pusch
    # parity, phch_worker.cc:545-590): the production UL path is
    # host-side (one small subframe per TTI — a batch dimension never
    # exists on the real UL), so this is an honest host number over the
    # native C++ turbo encoder + numpy DFT-precode/map.
    from srsue_tpu.phy.cell import UlGrant
    from srsue_tpu.phy.pusch import PuschCodec
    from srsue_tpu.phy import ra as ra_mod

    gd = ra_mod.dl_grant(50, 20)  # 50 PRB, 64QAM — a fat UL allocation
    ul_grant = UlGrant(n_prb=gd.n_prb, prb_start=gd.prb_start, mcs=gd.mcs,
                       mod_order=gd.mod_order, tbs=gd.tbs, rv=0)
    ul_codec = PuschCodec(cell, ul_grant, rnti=rnti, subframe=2)
    ul_payloads = [rng.integers(0, 2, ul_grant.tbs).astype(np.uint8)
                   for _ in range(8)]
    ul_codec.encode_sf(ul_payloads[0])  # warm caches
    t0 = time.time()
    n_enc = 0
    while time.time() - t0 < 2.0:
        ul_codec.encode_sf(ul_payloads[n_enc % 8])
        n_enc += 1
    dt_enc = (time.time() - t0) / n_enc
    pusch_mbps = ul_grant.tbs / dt_enc / 1e6
    print(f"[{device_kind}] pusch-encode(host): {dt_enc*1e3:.2f} ms/sf "
          f"(TBS {ul_grant.tbs}) -> {pusch_mbps:.1f} Mbps",
          file=sys.stderr, flush=True)

    # TM2 Alamouti point (BASELINE ladder config 4), data-path chain
    B2 = min(B, 128)  # 128 sf x 13 blocks = 1664: bm-layout eligible
    (cell2, grant2, sf2, rnti2, codec2, pl2, td2, p2, rng2) = build_tm2(B2)
    iq2 = jnp.asarray(iq_pairs(add_noise(rng2, td2, p2,
                                         SNR_OPERATING + 2)))
    rx2 = jax.jit(make_tm2_rx(cell2, codec2, sf2, pl2.astype(np.float32)))
    r_tm2 = timed(rx2, iq2, "tm2-alamouti", nb=B2, control_ok=False,
                  tbs=grant2.tbs)

    msamp = B * cell.sf_len / (r_forced["dt_ms"] / 1e3) / 1e6
    return {
        "mbps": r_forced["mbps"],
        "msamples": msamp,
        "dt_ms": r_forced["dt_ms"],
        "compile_s": r_forced["compile_s"],
        "pipelined_mbps": pipe_mbps,
        "early_exit_mbps": r_ee["mbps"],
        "early_exit_iters": r_ee["iters"],
        "waterfall_mbps": r_wf["mbps"],
        "waterfall_bler": r_wf["bler"],
        "waterfall_iters": r_wf["iters"],
        "waterfall_snr_db": SNR_WATERFALL,
        "waterfall_eq": "mmse",
        "tm2_mbps": r_tm2["mbps"],
        "carriers32_ms": r_c32["dt_ms"],
        "carriers32_mbps": r_c32["mbps"],
        "carriers32_ee_ms": r_c32_ee["dt_ms"],
        "carriers32_ee_iters": r_c32_ee["iters"],
        "mp_snr_db": MP_SNR,
        "mp_mmse_mbps": r_mp["mmse"]["mbps"],
        "mp_mmse_bler": r_mp["mmse"]["bler"],
        "mp_zf_bler": r_mp["zf"]["bler"],
        "mp_zf_scalar_bler": r_mp["zf_scalar"]["bler"],
        "pusch_encode_mbps": pusch_mbps,
    }


def _run_child(mode: str, B: int, timeout: int = 3300):
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
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench child {mode} timed out\n")
    return None


def main() -> None:
    B = int(os.environ.get("SRSUE_BENCH_B", B_DEFAULT))

    if "--child" in sys.argv or "--child-cpu" in sys.argv:
        import jax

        try:
            # persistent compile cache: repeated bench runs skip the
            # multi-minute XLA/Mosaic compiles
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/srsue_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
        except Exception:
            pass
        if "--child-cpu" in sys.argv:
            # flip BEFORE any device query (sitecustomize force-registers
            # the accelerator; env vars alone cannot override it)
            jax.config.update("jax_platforms", "cpu")
        n_rep = 2 if "--child-cpu" in sys.argv else 8
        r = measure(jax.default_backend(), B, n_rep=n_rep)
        r["platform"] = jax.default_backend()
        print("CHILD_RESULT " + json.dumps(r), flush=True)
        return

    result = _run_child("--child", B)
    platform = result.get("platform") if result else None
    if result is None:
        result = _run_child("--child-cpu", max(B // 8, 16), timeout=1200)
        platform = "cpu_fallback"
    if result is None:
        raise SystemExit("bench failed on every platform")

    print(
        json.dumps(
            {
                "metric": "pdsch_20mhz_64qam_maxtbs_blindsearch_8iter",
                "value": round(result["mbps"], 2),
                "unit": "Mbps",
                "vs_baseline": round(result["mbps"] / BASELINE_MBPS, 3),
                "platform": platform,
                "msamples_per_s": round(result["msamples"], 1),
                "compile_s": round(result.get("compile_s", 0.0), 1),
                "pipelined_mbps": round(result.get("pipelined_mbps", 0.0), 2),
                "early_exit_26db_mbps": round(result["early_exit_mbps"], 2),
                "waterfall_mbps": round(result["waterfall_mbps"], 2),
                "waterfall_bler": round(result["waterfall_bler"], 4),
                "waterfall_snr_db": result["waterfall_snr_db"],
                "waterfall_iters": round(result["waterfall_iters"], 2),
                "waterfall_eq": result.get("waterfall_eq", "zf"),
                "tm2_mbps": round(result.get("tm2_mbps", 0.0), 2),
                "carriers32_ms": round(result.get("carriers32_ms", 0.0), 2),
                "carriers32_mbps": round(result.get("carriers32_mbps", 0.0),
                                         2),
                "carriers32_ee_ms": round(result.get("carriers32_ee_ms",
                                                     0.0), 2),
                "carriers32_ee_iters": round(
                    result.get("carriers32_ee_iters", 0.0), 2),
                "mp_snr_db": result.get("mp_snr_db", 0.0),
                "mp_mmse_mbps": round(result.get("mp_mmse_mbps", 0.0), 2),
                "mp_mmse_bler": round(result.get("mp_mmse_bler", 0.0), 4),
                "mp_zf_bler": round(result.get("mp_zf_bler", 0.0), 4),
                "mp_zf_scalar_bler": round(
                    result.get("mp_zf_scalar_bler", 0.0), 4),
                "pusch_encode_mbps": round(
                    result.get("pusch_encode_mbps", 0.0), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
