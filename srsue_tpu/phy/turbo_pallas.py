"""Pallas TPU kernel for the windowed max-log-MAP half-iteration — the
speed-of-light path for the dominant DL hot loop (SURVEY.md §7.3: "turbo
decoder as Pallas kernel ... batch codeblocks x windowed BCJR").

Layout (v2): the (codeblock x window) product tiles as full native VPU
registers — 8 SUBLANES x 128 LANES = 1024 windows per grid step — and
the 8 trellis states are unrolled into separate (8, 128) register
arrays. Every add-compare-select therefore runs on a complete VPU tile
(the v1 kernel put states on sublanes and got (1, 128)-shaped row ops —
7/8 of the VPU idle; measured 25.7 ms/iteration at B=256 on v5e).

One kernel invocation performs, for a [lw, 8, 128] window-batch tile:

  * the forward (alpha) recursion, all lw alpha sets in VMEM scratch
    (lw*8states*8*128*4B = 2 MB at lw=64),
  * the backward (beta) recursion fused with the extrinsic computation,
  * boundary emission (alpha_last / beta_first) for the caller's
    next-iteration-initialization chaining.

Max-log normalization exploits that only metric DIFFERENCES matter:
instead of a per-step max-tree, state 0's metric is subtracted every
NORM_EVERY steps (f32 headroom covers the drift between normalizations;
see _NORM notes). Branch metrics exploit the RSC structure: gamma(s,u)
takes one of only 4 values +-(Lin+Par)/2, +-(Lin-Par)/2.

The caller (decode()) keeps the iteration loop, interleaving, CRC early
exit and HARQ semantics in regular JAX; this kernel replaces only the
scan-heavy BCJR core. Correctness is pinned to the pure-JAX windowed
decoder (tests/test_turbo_pallas.py) in interpret mode on CPU and
compiled on TPU.

r4 measurement ledger (v5e, flagship 3328 blocks x 6144 bits, measured
by CHAINED-call marginals — per-call timing is swamped by the axon
relay's ~28 ms fixed dispatch):
  * v4 radix-4 kernel: 2.1-2.4 ms/half-iteration; the kernel executes
    at ~1 VPU instruction/cycle, i.e. it is INSTRUCTION-ISSUE bound,
    not dependency- or bandwidth-bound. v4 == v3 speed but the
    half-length unrolled body compiles 24x faster (4 s vs 97 s), and
    XLA dedupes the Mosaic payload across the 16 per-decode instances.
  * full decode (16 halves + interleave/tile glue + CRC): 43.2 ms/batch
    marginal, of which ~38 ms is kernel -> glue is ~5 ms total (NOT the
    ~15 ms earlier per-call profiles suggested).
  * REJECTED after measurement: v5 bf16 (2.58 ms/half — no packed bf16
    ALU on this VPU), fori_loop body (9.0 ms/half, 3.8x slower than
    unrolled), lax.scan iteration loop (r2: +10 ms/iter), plus the r2/r3
    rejects (NORM_EVERY=16, SUBLANES=16/32, B=512, tiled iteration
    loop).

r5 ledger (tools/bench_forced_loop.py, flagship 3328 x 6144 x 8 forced
iters; chained marginals):
  * COST-MODEL CORRECTION (xprof device trace): the Mosaic kernel is
    ~0.39 ms/half — the VPU retires ~4 (8,128) ops/cycle, NOT the ~1
    the r4 ledger inferred. bench_kernel_variants' "kernel-only"
    number chained half_windowed_pallas WHOLE, so its 2.13 ms/half
    included the tile/untile transposes; the true per-decode split was
    kernel ~6 ms, XLA copies/reshapes/pads (transposes + boundary
    concats) ~40 ms. The r4 "instruction-issue-bound" conclusion and
    its op-count-reduction program were therefore aimed at 13% of the
    cost; the LAYOUT was the 87%.
  * BLOCK-MINOR layout (decode_forced_bm / decode_bm_early_exit, the
    r5 default): lane = block%128, sublane = window%8 — the QPP
    interleave becomes a [Bg, K, 128] middle-axis gather (0.30 ms per
    78 MB stream, memory-bound; 0.08 ms/iter inside while bodies) and
    boundary chaining a small gather; streams stay in kernel layout
    across ALL iterations. Forced decode marginal 28.5 ms vs 45.5
    unrolled-linear (1.6x), measured back-to-back.
  * unrolled-linear (SRSUE_TPU_TURBO_LAYOUT=linear): 44.9-45.5
    ms/decode marginal, first+compile 40-72 s (relay-server cache
    state dependent).
  * SRSUE_TPU_TURBO_FORCED=loop_bm (fori_loop over bm carries, the
    zero-glue body): compile 15.6 s but sync 114.6 vs 50.4 ms unrolled
    at the true flagship shape (3328 x 5824, lw=104) — loop bodies on
    this backend carry an intrinsic ~8 ms/iteration penalty even with
    NO layout glue in the body. REJECTED for the headline; the
    early-exit while path keeps the loop form because stopping at
    convergence is its semantics, not a compile optimization.
  * SRSUE_TPU_TURBO_FORCED=loop (fori_loop body, natural-layout
    carries): compile 6 s (12x) but 101.7 ms marginal — the body's
    carry-adjacent tile/untile transposes cannot be absorbed the way
    the unrolled graph absorbs them (a bare tile+untile pair measures
    5.8 ms, tools/bench_gather_forms.py). REJECTED for runtime; kept
    selectable as the compile-time escape hatch.
  * SRSUE_TPU_TURBO_FORCED=loop_tiled (fori_loop, TILED carries,
    untile->QPP-gather->tile interior to the body): 607 ms — the
    interior composition does NOT get absorbed inside a loop body
    either; XLA:TPU lowers it near-scalar. REJECTED, kept as the
    measurement record.
  * SUBLANES=16 re-measured on the forced path: kernel-only 2.79 vs
    2.13 ms/half (SLOWER today, contradicting the r4 1.12x note) and
    end-to-end equal-at-best. Still rejected.
  * VERDICT r4's "one kernel per iteration with in-kernel QPP
    interleave" is VMEM-infeasible at K=6144: one block's streams are
    25 MB/stream in (8,128) tiles vs ~16 MB VMEM; windowed layouts
    (the only fit) put the interleave across grid steps, out of any
    single kernel instance's reach.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import turbo

LANES = 128
# sublanes per tile op: 8 = one native (8,128) f32 VPU register per op.
# Env-tunable for on-device A/B of wider register groups. Measured on
# v5e at the flagship shape: 16 is 1.12x faster KERNEL-ONLY (5.58 vs
# 6.26 ms/iter — better ILP per instruction) but SLOWER end-to-end
# (early-exit 259 vs 299 Mbps; the while_loop path's per-iteration
# tiling works worse at TILE=2048), and 32 fails to compile (VMEM).
# 8 stays the default.
SUBLANES = int(os.environ.get("SRSUE_TPU_TURBO_SUBLANES", "8"))
TILE = SUBLANES * LANES  # windows per grid step
# steps between state-0 renormalizations (env-tunable for on-device A/B).
# Drift is bounded by NORM_EVERY * max|gamma| ~ 8 * 0.5*(|Lin|+|Par|); with
# saturated filler LLRs (1e4) that is ~1e5, where f32 still resolves ~0.01
# absolute — far below the working LLR scale.
NORM_EVERY = int(os.environ.get("SRSUE_TPU_TURBO_NORM_EVERY", "8"))
_NEG = -1e9


@functools.lru_cache(maxsize=1)
def _static_tables():
    ns, par, _ = turbo._trellis()
    prev_s, prev_u = turbo._prev_tables()
    # gamma selector: for (s,u), gamma = 0.5*(u_sign*Lin + p_sign*Par)
    u_sign = np.array([1.0, -1.0], np.float32)
    p_sign = (1.0 - 2.0 * par).astype(np.float32)  # [8,2]
    return ns, par, prev_s, prev_u, u_sign, p_sign


def _gammas(lin_t, par_t):
    """The 4 possible branch metrics keyed by (u_sign, p_sign)."""
    hl = 0.5 * lin_t
    hp = 0.5 * par_t
    gpp = hl + hp
    gpm = hl - hp
    return {(1, 1): gpp, (1, -1): gpm, (-1, 1): -gpm, (-1, -1): -gpp}


def _half_kernel(lin_ref, par_ref, a0_ref, b0_ref,
                 ext_ref, alast_ref, bfirst_ref, alphas_ref,
                 *, unroll: bool):
    """One window-batch half-iteration over a TILE of windows.

    lin/par: [lw, 8, 128] (systematic+apriori, parity LLRs)
    a0/b0:   [8 states, 8, 128] boundary initializations
    ext:     [lw, 8, 128] extrinsic output
    alast/bfirst: [8 states, 8, 128] boundary outputs
    alphas (scratch): [lw, 8 states, 8, 128]

    unroll=True emits the whole lw-step recursion as straight-line code
    (static trellis offsets, no loop-carried index arithmetic) — Mosaic
    then schedules across the 8 independent state lanes and prefetches
    the static VMEM addresses; measured 10.6 -> ~7 ms/iteration at the
    flagship shape vs the fori_loop form. interpret mode keeps the
    fori_loop (unrolled tracing is pure overhead there).
    """
    ns, par, prev_s, prev_u, u_sign, p_sign = _static_tables()
    lw = lin_ref.shape[0]

    # ---------------- forward ----------------
    def fwd_step(t, alpha):
        for s in range(8):
            alphas_ref[t, s] = alpha[s]
        g = _gammas(lin_ref[t], par_ref[t])
        new = []
        for sp in range(8):
            s0, u0 = int(prev_s[sp, 0]), int(prev_u[sp, 0])
            s1, u1 = int(prev_s[sp, 1]), int(prev_u[sp, 1])
            c0 = alpha[s0] + g[(int(u_sign[u0]), int(p_sign[s0, u0]))]
            c1 = alpha[s1] + g[(int(u_sign[u1]), int(p_sign[s1, u1]))]
            new.append(jnp.maximum(c0, c1))
        return new

    def fwd_body(t_base, alpha):
        alpha = list(alpha)
        for j in range(NORM_EVERY):
            alpha = fwd_step(t_base * NORM_EVERY + j, alpha)
        z = alpha[0]
        return tuple(a - z for a in alpha)

    alpha = tuple(a0_ref[s] for s in range(8))
    if unroll:
        for t_base in range(lw // NORM_EVERY):
            alpha = fwd_body(t_base, alpha)
    else:
        alpha = jax.lax.fori_loop(0, lw // NORM_EVERY, fwd_body, alpha)
    for s in range(8):
        alast_ref[s] = alpha[s]

    # ---------------- backward + extrinsic ----------------
    def bwd_step(t, beta):
        g = _gammas(lin_ref[t], par_ref[t])
        m0 = None
        m1 = None
        new = []
        for s in range(8):
            a_s = alphas_ref[t, s]
            bu = None
            for u in range(2):
                gg = g[(int(u_sign[u]), int(p_sign[s, u]))]
                bcand = gg + beta[int(ns[s, u])]
                m = bcand + a_s
                if u == 0:
                    m0 = m if m0 is None else jnp.maximum(m0, m)
                else:
                    m1 = m if m1 is None else jnp.maximum(m1, m)
                bu = bcand if bu is None else jnp.maximum(bu, bcand)
            new.append(bu)
        ext_ref[t] = (m0 - m1) - lin_ref[t]
        return new

    def bwd_body(t_base, beta):
        beta = list(beta)
        for j in range(NORM_EVERY):
            beta = bwd_step(lw - 1 - (t_base * NORM_EVERY + j), beta)
        z = beta[0]
        return tuple(b - z for b in beta)

    beta = tuple(b0_ref[s] for s in range(8))
    if unroll:
        for t_base in range(lw // NORM_EVERY):
            beta = bwd_body(t_base, beta)
    else:
        beta = jax.lax.fori_loop(0, lw // NORM_EVERY, bwd_body, beta)
    for s in range(8):
        bfirst_ref[s] = beta[s]


def _half_kernel_v3(lin_ref, par_ref, a0_ref, b0_ref,
                    ext_ref, alast_ref, bfirst_ref,
                    alphas_ref, gpp_ref, gpm_ref,
                    *, unroll: bool, sublanes: int = SUBLANES):
    """v3 layout: branch metrics VECTORIZED over the whole window up
    front (two whole-array ops instead of per-step scalar folds), the
    recursion then reads them back from VMEM scratch. The four gamma
    values per step are +-gpp, +-gpm; negation is folded into the
    add/subtract of the recursion so no negative arrays are formed."""
    ns, par, prev_s, prev_u, u_sign, p_sign = _static_tables()
    lw = lin_ref.shape[0]

    # ---- vectorized branch metrics over all lw steps at once ----
    gpp_ref[:] = 0.5 * (lin_ref[:] + par_ref[:])
    gpm_ref[:] = 0.5 * (lin_ref[:] - par_ref[:])

    def g_of(t):
        gpp = gpp_ref[t]
        gpm = gpm_ref[t]
        return {(1, 1): gpp, (1, -1): gpm}

    def pm(g, us, ps):
        """alpha + gamma with negation folded: gamma(u,p) = us*hl+ps*hp;
        (us,ps) in {(+,+):gpp, (+,-):gpm, (-,+):-gpm, (-,-):-gpp}."""
        if us > 0:
            return (g[(1, 1)], 1.0) if ps > 0 else (g[(1, -1)], 1.0)
        return (g[(1, -1)], -1.0) if ps > 0 else (g[(1, 1)], -1.0)

    # ---------------- forward ----------------
    def fwd_step(t, alpha):
        g = g_of(t)
        for s in range(8):
            alphas_ref[t, s] = alpha[s]
        new = []
        for sp in range(8):
            s0, u0 = int(prev_s[sp, 0]), int(prev_u[sp, 0])
            s1, u1 = int(prev_s[sp, 1]), int(prev_u[sp, 1])
            ga, sa = pm(g, int(u_sign[u0]), int(p_sign[s0, u0]))
            gb, sb = pm(g, int(u_sign[u1]), int(p_sign[s1, u1]))
            c0 = alpha[s0] + ga if sa > 0 else alpha[s0] - ga
            c1 = alpha[s1] + gb if sb > 0 else alpha[s1] - gb
            new.append(jnp.maximum(c0, c1))
        return new

    def fwd_body(t_base, alpha):
        alpha = list(alpha)
        for j in range(NORM_EVERY):
            alpha = fwd_step(t_base * NORM_EVERY + j, alpha)
        z = alpha[0]
        return tuple(a - z for a in alpha)

    alpha = tuple(a0_ref[s] for s in range(8))
    if unroll:
        for t_base in range(lw // NORM_EVERY):
            alpha = fwd_body(t_base, alpha)
    else:
        alpha = jax.lax.fori_loop(0, lw // NORM_EVERY, fwd_body, alpha)
    for s in range(8):
        alast_ref[s] = alpha[s]

    # ---------------- backward + extrinsic ----------------
    def bwd_step(t, beta):
        g = g_of(t)
        m0 = None
        m1 = None
        new = []
        for s in range(8):
            a_s = alphas_ref[t, s]
            bu = None
            for u in range(2):
                gg, sg = pm(g, int(u_sign[u]), int(p_sign[s, u]))
                nb = beta[int(ns[s, u])]
                bcand = nb + gg if sg > 0 else nb - gg
                m = bcand + a_s
                if u == 0:
                    m0 = m if m0 is None else jnp.maximum(m0, m)
                else:
                    m1 = m if m1 is None else jnp.maximum(m1, m)
                bu = bcand if bu is None else jnp.maximum(bu, bcand)
            new.append(bu)
        ext_ref[t] = (m0 - m1) - lin_ref[t]
        return new

    def bwd_body(t_base, beta):
        beta = list(beta)
        for j in range(NORM_EVERY):
            beta = bwd_step(lw - 1 - (t_base * NORM_EVERY + j), beta)
        z = beta[0]
        return tuple(b - z for b in beta)

    beta = tuple(b0_ref[s] for s in range(8))
    if unroll:
        for t_base in range(lw // NORM_EVERY):
            beta = bwd_body(t_base, beta)
    else:
        beta = jax.lax.fori_loop(0, lw // NORM_EVERY, bwd_body, beta)
    for s in range(8):
        bfirst_ref[s] = beta[s]


@functools.lru_cache(maxsize=1)
def _radix4_tables():
    """2-step (radix-4) trellis tables, derived from the radix-2 ones.

    Each 2-step branch metric g2 = gamma_t(sp,u1) + gamma_{t+1}(sm,u2)
    takes the form sign * (A_x +- B_y) with A = (gpp_t, gpm_t) and
    B = (gpp_{t+1}, gpm_{t+1}): gamma_t(s,u) = u_sign * (gpp if
    u_sign*p_sign>0 else gpm), so g2 = s1*X + s2*Y = s1*(X +- Y).
    Key = (x, y, d) indexes the 8 possible bases (d=0: A_x+B_y,
    d=1: A_x-B_y); sign = s1.

    Returns (fwd, paths):
      fwd[s2]  = 4x (sp, key, sign) — the radix-4 predecessors of s2
      paths    = 32x (sp, s2, key, sign, u1, u2) — all 2-step branches
    """
    ns, par, prev_s, prev_u, u_sign, p_sign = _static_tables()
    paths = []
    fwd = [[] for _ in range(8)]
    for sp in range(8):
        for u1 in (0, 1):
            sm = int(ns[sp, u1])
            s1 = int(u_sign[u1])
            b1 = 0 if s1 * p_sign[sp, u1] > 0 else 1
            for u2 in (0, 1):
                s2sgn = int(u_sign[u2])
                b2 = 0 if s2sgn * p_sign[sm, u2] > 0 else 1
                s2 = int(ns[sm, u2])
                key = (b1, b2, 0 if s1 == s2sgn else 1)
                paths.append((sp, s2, key, s1, u1, u2))
                fwd[s2].append((sp, key, s1))
    assert all(len(f) == 4 for f in fwd)
    return fwd, tuple(paths)


def _half_kernel_v4(lin_ref, par_ref, a0_ref, b0_ref,
                    ext_ref, alast_ref, bfirst_ref,
                    alphas_ref, gpp_ref, gpm_ref,
                    *, unroll: bool):
    """v4: RADIX-4 BCJR — two trellis steps per recursion step.

    The sequential add-compare-select chain the VPU waits on halves
    (lw/2 steps instead of lw); per double-step each of the 8 states
    takes a 4-way max over 2-step branch metrics. Alpha is stored at
    EVEN positions only (half the VMEM scratch traffic of v2/v3); the
    backward pass jointly emits both bits' extrinsics from
    alpha_t + g2 + beta_{t+2} grouped by (u1, u2). Identical max-log
    semantics to radix-2 (max over paths associates) up to f32
    re-association; pinned against v3 in tests/test_turbo_pallas.py.
    """
    fwd_tab, paths = _radix4_tables()
    lw = lin_ref.shape[0]
    half = lw // 2
    ne2 = max(NORM_EVERY // 2, 1)
    assert lw % 2 == 0 and half % ne2 == 0

    # vectorized branch-metric halves over the whole window (v3 trick)
    gpp_ref[:] = 0.5 * (lin_ref[:] + par_ref[:])
    gpm_ref[:] = 0.5 * (lin_ref[:] - par_ref[:])

    def g2_of(td):
        t = 2 * td
        A = (gpp_ref[t], gpm_ref[t])
        B = (gpp_ref[t + 1], gpm_ref[t + 1])
        G = {}
        for x in range(2):
            for y in range(2):
                G[(x, y, 0)] = A[x] + B[y]
                G[(x, y, 1)] = A[x] - B[y]
        return G

    def maxtree4(c):
        return jnp.maximum(jnp.maximum(c[0], c[1]), jnp.maximum(c[2], c[3]))

    # ---------------- forward ----------------
    def fwd_step(td, alpha):
        G = g2_of(td)
        for s in range(8):
            alphas_ref[td, s] = alpha[s]
        new = []
        for s2 in range(8):
            cands = []
            for sp, key, sgn in fwd_tab[s2]:
                g = G[key]
                cands.append(alpha[sp] + g if sgn > 0 else alpha[sp] - g)
            new.append(maxtree4(cands))
        return new

    def fwd_body(tb, alpha):
        alpha = list(alpha)
        for j in range(ne2):
            alpha = fwd_step(tb * ne2 + j, alpha)
        z = alpha[0]
        return tuple(a - z for a in alpha)

    n_groups = half // ne2
    alpha = tuple(a0_ref[s] for s in range(8))
    if unroll:
        for tb in range(n_groups):
            alpha = fwd_body(tb, alpha)
    else:
        alpha = jax.lax.fori_loop(0, n_groups, fwd_body, alpha)
    for s in range(8):
        alast_ref[s] = alpha[s]

    # ---------------- backward + joint extrinsic ----------------
    def bwd_step(td, beta):
        G = g2_of(td)
        t = 2 * td
        bcand = {}
        for sp, s2, key, sgn, u1, u2 in paths:
            g = G[key]
            bcand[(sp, u1, u2)] = (beta[s2] + g if sgn > 0
                                   else beta[s2] - g)
        new = []
        gm = {}
        for sp in range(8):
            cands = [bcand[(sp, u1, u2)]
                     for u1 in (0, 1) for u2 in (0, 1)]
            new.append(maxtree4(cands))
            a_s = alphas_ref[td, sp]
            for u1 in (0, 1):
                for u2 in (0, 1):
                    p = bcand[(sp, u1, u2)] + a_s
                    k = (u1, u2)
                    gm[k] = p if k not in gm else jnp.maximum(gm[k], p)
        ext_ref[t] = (jnp.maximum(gm[(0, 0)], gm[(0, 1)])
                      - jnp.maximum(gm[(1, 0)], gm[(1, 1)])) - lin_ref[t]
        ext_ref[t + 1] = (jnp.maximum(gm[(0, 0)], gm[(1, 0)])
                          - jnp.maximum(gm[(0, 1)], gm[(1, 1)])
                          ) - lin_ref[t + 1]
        return new

    def bwd_body(tb, beta):
        beta = list(beta)
        for j in range(ne2):
            beta = bwd_step(half - 1 - (tb * ne2 + j), beta)
        z = beta[0]
        return tuple(b - z for b in beta)

    beta = tuple(b0_ref[s] for s in range(8))
    if unroll:
        for tb in range(n_groups):
            beta = bwd_body(tb, beta)
    else:
        beta = jax.lax.fori_loop(0, n_groups, bwd_body, beta)
    for s in range(8):
        bfirst_ref[s] = beta[s]


def _variant():
    """(kernel name, sublanes, compute dtype) for the selected variant.

    v5 = the radix-4 kernel computed in BFLOAT16 on (16, 128)-native
    tiles. Hypothesis: the kernel is instruction-issue-bound (~1 vector
    instr/cycle measured), so packing 2x lanes per bf16 instruction
    should halve the instruction count. MEASURED REJECT on v5e
    (tools/bench_kernel_variants.py): 2.58 ms/half vs v4's 2.11 — this
    VPU does NOT execute bf16 elementwise ops at 2x rate (only the MXU
    gains from bf16), and the extra converts cost ~20%. Kept selectable
    for future hardware where packed bf16 ALUs exist; numerics are
    production-ready (decode() rescales LLRs to RMS ~32 — max-log BCJR
    is scale-invariant — so bf16's 8-bit mantissa quantizes at ~0.4% of
    a working LLR; pinned in test_v5_bf16_decodes_and_tracks_f32)."""
    v = os.environ.get("SRSUE_TPU_TURBO_KERNEL", "v4")
    if v == "v5":
        return v, 16, jnp.bfloat16
    return v, SUBLANES, jnp.float32


def _bm_window(k: int, window: int) -> int | None:
    """Window length for the block-minor layout: the caller's window if
    its count already tiles the sublanes, else the longest alternative
    with K % lw == 0, (K/lw) % 8 == 0 and lw % NORM_EVERY == 0 (kernel
    constraint). None when no such window exists (fall back to the
    window-linear paths)."""
    if k % window == 0 and (k // window) % 8 == 0 \
            and window % NORM_EVERY == 0:
        return window
    # longer windows converge faster at low iteration counts (same
    # total trellis work — windows partition the block), so prefer the
    # longest near-64 alternative; e.g. K=5824 -> lw=104 (W=56).
    for lw in (104, 96, 112, 80, 128, 72, 56, 48, 40, 32):
        if k % lw == 0 and (k // lw) % 8 == 0 and lw % NORM_EVERY == 0 \
                and k // lw >= 2:
            return lw
    return None


def tile_windows(x, d, T, sublanes: int = SUBLANES):
    """[n, d] -> [T*d, sublanes, 128] with d-major rows inside each
    tile."""
    return (x.reshape(T, sublanes, LANES, d)
            .transpose(0, 3, 1, 2).reshape(T * d, sublanes, LANES))


def untile_windows(y, d, T, n, sublanes: int = SUBLANES):
    return (y.reshape(T, d, sublanes, LANES)
            .transpose(0, 2, 3, 1).reshape(n, d))


def half_tiled(lin_t, par_t, a0_t, b0_t, lw: int,
               interpret: bool = False, unroll: bool | None = None):
    """Fully-tiled half-iteration: all operands/results stay in the VPU
    tile layout ([T*lw, sl, 128] streams, [T*8, sl, 128] boundaries) —
    the zero-transpose entry point used by the tiled iteration loop."""
    if unroll is None:
        unroll = not interpret
    assert lw % NORM_EVERY == 0, f"window {lw} % {NORM_EVERY} != 0"
    T = lin_t.shape[0] // lw

    variant, sl, dt = _variant()
    grid = (T,)
    spec_lw = pl.BlockSpec((lw, sl, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_8 = pl.BlockSpec((8, sl, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    # v3 (vectorized branch metrics, negation folded into the recursion)
    # measured 1.11x the v2 kernel at the flagship shape on v5e
    # (tools/bench_kernel_variants.py); v2 kept for A/B.
    if variant in ("v4", "v5"):
        # radix-4: half the sequential steps, alpha scratch halves;
        # v5 additionally computes in bf16 on (16, 128)-native tiles
        kernel = functools.partial(_half_kernel_v4, unroll=unroll)
        scratch = [
            pltpu.VMEM((lw // 2, 8, sl, LANES), dt),
            pltpu.VMEM((lw, sl, LANES), dt),
            pltpu.VMEM((lw, sl, LANES), dt),
        ]
    elif variant == "v3":
        kernel = functools.partial(_half_kernel_v3, unroll=unroll)
        scratch = [
            pltpu.VMEM((lw, 8, sl, LANES), dt),
            pltpu.VMEM((lw, sl, LANES), dt),
            pltpu.VMEM((lw, sl, LANES), dt),
        ]
    else:
        kernel = functools.partial(_half_kernel, unroll=unroll)
        scratch = [pltpu.VMEM((lw, 8, sl, LANES), dt)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_lw, spec_lw, spec_8, spec_8],
        out_specs=[spec_lw, spec_8, spec_8],
        out_shape=[
            jax.ShapeDtypeStruct((T * lw, sl, LANES), dt),
            jax.ShapeDtypeStruct((T * 8, sl, LANES), dt),
            jax.ShapeDtypeStruct((T * 8, sl, LANES), dt),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(lin_t.astype(dt), par_t.astype(dt), a0_t.astype(dt),
      b0_t.astype(dt))


def half_windowed_pallas(lin, par, a0, b0, lw: int, interpret: bool = False,
                         unroll: bool | None = None,
                         par_is_tiled: bool = False):
    """[n, lw] window-major inputs -> (ext [n, lw], alpha_last [n, 8],
    beta_first [n, 8]) where n = number of (block, window) pairs, padded
    by the caller to a multiple of TILE (=1024).

    Window w rides (tile w//(sl*128), sublane (w%(sl*128))//128, lane
    w%128). unroll defaults to the compiled-path choice (True unless
    interpret); tests override it to pin both kernel forms against each
    other.
    """
    _, sl, _ = _variant()
    tile = sl * LANES
    n = lin.shape[0]
    assert n % tile == 0, f"pad window count to {tile}: {n}"
    T = n // tile

    def to_tiles(x, d):
        return tile_windows(x, d, T, sl)

    def from_tiles(y, d):
        return untile_windows(y, d, T, n, sl).astype(jnp.float32)

    ext, alast, bfirst = half_tiled(
        to_tiles(lin, lw), par if par_is_tiled else to_tiles(par, lw),
        to_tiles(a0, 8), to_tiles(b0, 8), lw,
        interpret=interpret, unroll=unroll)
    return from_tiles(ext, lw), from_tiles(alast, 8), from_tiles(bfirst, 8)


def pretile_par(par_llr, lw: int):
    """Pre-tile a (loop-invariant) parity stream for reuse across
    iterations: inside a lax.while/cond body the [n, lw] -> tile
    transpose would otherwise re-execute EVERY iteration (it is only
    CSE-hoisted in unrolled loops)."""
    _, sl, dt = _variant()
    tile = sl * LANES
    B, K = par_llr.shape
    n = B * (K // lw)
    pad = (-n) % tile
    par_w = par_llr.reshape(n, lw)
    if pad:
        par_w = jnp.concatenate(
            [par_w, jnp.zeros((pad, lw), par_w.dtype)])
    return tile_windows(par_w, lw, (n + pad) // tile, sl).astype(dt)


def bcjr_half_windowed_pallas(sys_llr, par_llr, apriori, tail_sys, tail_par,
                              alpha_b, beta_b, lw: int,
                              interpret: bool = False,
                              par_tiles=None):
    """Drop-in replacement for turbo._bcjr_half_windowed backed by the
    Pallas kernel. Shapes: [B, K] LLRs, [B, W, 8] boundaries.
    par_tiles: optional pretile_par(par_llr, lw) result; when given,
    par_llr is ignored in favor of the pre-tiled form."""
    B, K = sys_llr.shape
    W = K // lw
    n = B * W
    _, sl, _ = _variant()
    pad = (-n) % (sl * LANES)

    Lin = sys_llr + apriori
    lin_w = Lin.reshape(n, lw)
    par_w = par_llr.reshape(n, lw) if par_tiles is None else None

    known0 = jnp.full((8,), _NEG, jnp.float32).at[0].set(0.0)
    a0 = jnp.where(
        (jnp.arange(W)[None, :, None] == 0), known0, alpha_b
    ).reshape(n, 8)
    bt = turbo._tail_beta(tail_sys, tail_par, B)
    b0 = jnp.where(
        (jnp.arange(W)[None, :, None] == W - 1), bt[:, None, :], beta_b
    ).reshape(n, 8)

    if pad:
        z2 = jnp.zeros((pad, lw), jnp.float32)
        z8 = jnp.zeros((pad, 8), jnp.float32)
        lin_w = jnp.concatenate([lin_w, z2])
        if par_w is not None:
            par_w = jnp.concatenate([par_w, z2])
        a0 = jnp.concatenate([a0, z8])
        b0 = jnp.concatenate([b0, z8])

    ext, alast, bfirst = half_windowed_pallas(
        lin_w, par_tiles if par_tiles is not None else par_w, a0, b0, lw,
        interpret=interpret, par_is_tiled=par_tiles is not None)
    ext = ext[:n].reshape(B, K)
    alast = alast[:n].reshape(B, W, 8)
    bfirst = bfirst[:n].reshape(B, W, 8)

    new_alpha_b = jnp.concatenate(
        [jnp.zeros((B, 1, 8), jnp.float32), alast[:, :-1, :]], axis=1
    )
    new_beta_b = jnp.concatenate(
        [bfirst[:, 1:, :], jnp.zeros((B, 1, 8), jnp.float32)], axis=1
    )
    return ext, new_alpha_b, new_beta_b


def decode(d_llrs, k: int, n_iters: int = 8, crc_mat=None, window: int = 64,
           interpret: bool = False, early_exit: bool = True):
    """Full turbo decode with the Pallas BCJR core (same contract as
    turbo.decode)."""
    assert k % window == 0, f"window {window} must divide K={k}"
    if _variant()[0] == "v5":
        # bf16 kernel: pre-normalize the working LLR scale (max-log
        # BCJR is scale-invariant, so hard decisions and CRC are
        # unaffected) — bf16's 8-bit mantissa then quantizes at ~0.4%
        # of a typical LLR instead of being dominated by saturated
        # filler priors
        rms = jnp.sqrt(jnp.mean(jnp.square(d_llrs.astype(jnp.float32)))
                       + 1e-9)
        d_llrs = d_llrs * (32.0 / rms)
    B = d_llrs.shape[0]
    W = k // window
    # block-minor layout (r5): the default whenever a window length
    # exists whose count tiles the sublanes (W % 8 == 0; e.g. the
    # flagship K=5824 doesn't tile at lw=64 (W=91) but does at lw=56
    # (W=104)) and the block batch either fills the lanes exactly or is
    # large enough that zero-padding to full lanes costs less than the
    # transposes it removes. SRSUE_TPU_TURBO_LAYOUT=linear restores the
    # r4 paths.
    bm_w = _bm_window(k, window)
    bm_ok = (os.environ.get("SRSUE_TPU_TURBO_LAYOUT", "bm") == "bm"
             and bm_w is not None and (B % 128 == 0 or B >= 256))
    if bm_ok and crc_mat is not None and early_exit:
        return decode_bm_early_exit(d_llrs, k, n_iters, crc_mat,
                                    window=bm_w, interpret=interpret)
    _forced = os.environ.get("SRSUE_TPU_TURBO_FORCED", "unroll")
    if (bm_ok and not (crc_mat is not None and early_exit)
            and _forced in ("unroll", "loop_bm")):
        return decode_forced_bm(d_llrs, k, n_iters, crc_mat=crc_mat,
                                window=bm_w, interpret=interpret,
                                loop=_forced == "loop_bm")
    perm = jnp.asarray(turbo.qpp_perm(k))
    inv = jnp.asarray(turbo.qpp_inv(k))

    sys1 = d_llrs[:, 0, :k]
    par1 = d_llrs[:, 1, :k]
    par2 = d_llrs[:, 2, :k]
    sys2 = sys1[:, perm]
    t = d_llrs[:, :, k : k + 4]
    tail1_sys = jnp.stack([t[:, 0, 0], t[:, 2, 0], t[:, 1, 1]], axis=1)
    tail1_par = jnp.stack([t[:, 1, 0], t[:, 0, 1], t[:, 2, 1]], axis=1)
    tail2_sys = jnp.stack([t[:, 0, 2], t[:, 2, 2], t[:, 1, 3]], axis=1)
    tail2_par = jnp.stack([t[:, 1, 2], t[:, 0, 3], t[:, 2, 3]], axis=1)

    crc_m = None if crc_mat is None else jnp.asarray(crc_mat.astype(np.float32))

    # the parity streams are loop-invariant: pre-tile them ONCE so the
    # [n, lw] -> VPU-tile transposes don't re-execute per while/scan
    # iteration (unrolled loops get this via CSE; loop bodies do not)
    par1_t = pretile_par(par1, window)
    par2_t = pretile_par(par2, window)

    def crc_ok_of(hard):
        if crc_m is None:
            return jnp.zeros((B,), bool)
        syn = jnp.mod(jnp.round(hard.astype(jnp.float32) @ crc_m), 2.0)
        return jnp.sum(syn, axis=-1) == 0

    def body(carry, _):
        le21, done, iters_used, hard_prev, ab1, bb1, ab2, bb2 = carry
        le12, ab1n, bb1n = bcjr_half_windowed_pallas(
            sys1, par1, le21, tail1_sys, tail1_par, ab1, bb1, window,
            interpret=interpret, par_tiles=par1_t,
        )
        le21_raw, ab2n, bb2n = bcjr_half_windowed_pallas(
            sys2, par2, le12[:, perm], tail2_sys, tail2_par, ab2, bb2, window,
            interpret=interpret, par_tiles=par2_t,
        )
        le21_new = le21_raw[:, inv]
        post = sys1 + le12 + le21_new
        hard = (post < 0).astype(jnp.uint8)
        ok = crc_ok_of(hard)
        mask = done[:, None]
        mask3 = done[:, None, None]
        out = (
            jnp.where(mask, le21, le21_new),
            done | ok,
            iters_used + (~done).astype(jnp.int32),
            jnp.where(mask, hard_prev, hard),
            jnp.where(mask3, ab1, ab1n),
            jnp.where(mask3, bb1, bb1n),
            jnp.where(mask3, ab2, ab2n),
            jnp.where(mask3, bb2, bb2n),
        )
        return out, None

    zb = jnp.zeros((B, W, 8), jnp.float32)
    init = (
        jnp.zeros((B, k), jnp.float32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, k), jnp.uint8),
        zb, zb, zb, zb,
    )
    if crc_mat is not None and early_exit:
        # whole-batch device-side early exit (see turbo.decode). A
        # while_loop measured better than an unrolled lax.cond chain
        # here: both materialize the loop state per step, but the while
        # stops issuing work as soon as every block converged.
        def cond(state):
            i, carry = state
            return (i < n_iters) & ~jnp.all(carry[1])

        def step(state):
            i, carry = state
            carry, _ = body(carry, None)
            return (i + 1, carry)

        _, (le21, done, iters_used, hard, *_) = jax.lax.while_loop(
            cond, step, (jnp.int32(0), init)
        )
        ok = crc_ok_of(hard) | done
        return hard, iters_used, ok

    # forced-iteration path (the 8-iter headline): no per-iteration CRC
    # syndromes or done-masking, and the iteration loop is UNROLLED in
    # Python — lax.scan around the pallas custom-calls materializes its
    # big carries every step (measured +10 ms/iteration at the flagship
    # shape on v5e; unrolled: 5.3 ms/iteration ~= kernel cost). Hard
    # decision + CRC happen ONCE at the end.
    if os.environ.get("SRSUE_TPU_TURBO_TILED", "0") == "1":
        # Experimental tiled iteration loop (decode_forced_tiled):
        # everything stays in the VPU tile layout and the QPP interleave
        # + window tiling collapse into one composed-index gather per
        # half. MEASURED SLOWER on v5e (3608 vs ~97 ms/batch at the
        # flagship shape): XLA:TPU lowers a flat 20M-arbitrary-index
        # gather to a near-scalar loop (~220 ms per gather), while the
        # window-linear form below gathers with a [K] index broadcast
        # over blocks, which lowers to an efficient minor-dim gather.
        # Kept env-gated as the measurement record + layout reference.
        return decode_forced_tiled(d_llrs, k, n_iters, crc_mat=crc_mat,
                                   window=window, interpret=interpret)
    le21 = init[0]
    le12 = init[0]
    ab1 = bb1 = ab2 = bb2 = zb
    forced_form = os.environ.get("SRSUE_TPU_TURBO_FORCED", "unroll")
    if forced_form == "loop_tiled":
        return decode_forced_loop_tiled(d_llrs, k, n_iters, crc_mat=crc_mat,
                                        window=window, interpret=interpret)
    if forced_form == "loop":
        # fori_loop iteration body: ONE compiled body instead of n_iters
        # unrolled copies — the XLA graph (and compile time) shrinks
        # ~n_iters-fold. The r2-era "+10 ms/iter for lax.scan" no longer
        # applies: the loop-invariant tile transposes are hoisted via
        # pretile_par, so the body carries only the genuinely
        # iteration-varying arrays. Kept selectable while the unrolled
        # form remains the measured-fastest runtime.
        def fbody(_, carry):
            le12_c, le21_c, a1, b1, a2, b2 = carry
            le12_n, a1n, b1n = bcjr_half_windowed_pallas(
                sys1, par1, le21_c, tail1_sys, tail1_par, a1, b1, window,
                interpret=interpret, par_tiles=par1_t,
            )
            le21_raw, a2n, b2n = bcjr_half_windowed_pallas(
                sys2, par2, le12_n[:, perm], tail2_sys, tail2_par, a2, b2,
                window, interpret=interpret, par_tiles=par2_t,
            )
            return (le12_n, le21_raw[:, inv], a1n, b1n, a2n, b2n)

        le12, le21, *_ = jax.lax.fori_loop(
            0, n_iters, fbody, (le12, le21, ab1, bb1, ab2, bb2))
    else:
        for _ in range(n_iters):
            le12, ab1, bb1 = bcjr_half_windowed_pallas(
                sys1, par1, le21, tail1_sys, tail1_par, ab1, bb1, window,
                interpret=interpret, par_tiles=par1_t,
            )
            le21_raw, ab2, bb2 = bcjr_half_windowed_pallas(
                sys2, par2, le12[:, perm], tail2_sys, tail2_par, ab2, bb2,
                window, interpret=interpret, par_tiles=par2_t,
            )
            le21 = le21_raw[:, inv]
    post = sys1 + le12 + le21
    hard = (post < 0).astype(jnp.uint8)
    ok = crc_ok_of(hard)
    iters_used = jnp.full((B,), n_iters, jnp.int32)
    return hard, iters_used, ok


# ---------------------------------------------------------------------------
# Tiled iteration loop (forced-iteration path)
# ---------------------------------------------------------------------------
#
# The per-half glue of the window-linear loop — tile/untile transposes of
# the [n, lw] streams plus the [B, K] interleaver gathers — costs ~1.7 ms
# per iteration at the flagship shape (measured: 7.0 ms/iter total in
# tools/profile_chain.py vs 5.3 ms/iter kernel-only in
# tools/bench_kernel_variants.py). Keeping every iteration-carried array
# in the tile layout removes the transposes entirely; the QPP interleave
# composed with the tile layout becomes a single precomputed flat-index
# gather per half, and the window-boundary chaining (alpha from window
# w-1, beta from w+1, known terminal states at block edges) becomes a
# small gather + select on the [T*8, 8, 128] boundary arrays.


def _tiled_maps(B: int, K: int, lw: int):
    """Index/mask tables for the tiled loop at one (blocks, K, window)
    bucket, computed ON DEVICE from iota arithmetic. A precomputed numpy
    table would be ~80 MB of int32 per interleave direction; embedding
    that as an HLO constant blows up the serialized module (the axon
    relay rejects the compile request outright with HTTP 413). Only the
    [K]-sized QPP tables are constants; everything else is a handful of
    elementwise integer ops over an iota, loop-invariant and CSE'd across
    the unrolled iterations."""
    W = K // lw
    n = B * W
    T = -(-n // TILE)
    n_pad = T * TILE

    perm = turbo.qpp_perm(K).astype(np.int32)
    inv = turbo.qpp_inv(K).astype(np.int32)

    def flat_stream(w, jmod):
        return ((w // TILE) * lw + jmod) * TILE + (w % TILE)

    size_s = T * lw * TILE

    def stream_gather_idx(table_np):
        """For each flat tiled OUTPUT position p (natural bit (b, jj)),
        the flat tiled INPUT position of bit (b, table[jj])."""
        p = jnp.arange(size_s, dtype=jnp.int32)
        row = p // TILE
        col = p % TILE
        w = (row // lw) * TILE + col
        t = row % lw
        bblk = w // W
        jj = (w % W) * lw + t
        j = jnp.asarray(table_np)[jj % K]  # pad region: harmless wrap
        return flat_stream(bblk * W + j // lw, j % lw)

    # boundary arrays: [T*8, 8, 128] viewed 1-D
    size_b = T * 8 * TILE

    def bnd_expr():
        p = jnp.arange(size_b, dtype=jnp.int32)
        row = p // TILE
        col = p % TILE
        w = (row // 8) * TILE + col
        s = row % 8
        return p, w, s

    def flat_b(w, s):
        return ((w // TILE) * 8 + s) * TILE + (w % TILE)

    bshape = (T * 8, SUBLANES, LANES)
    sshape = (T * lw, SUBLANES, LANES)

    def build():
        g12 = stream_gather_idx(perm)
        g21 = stream_gather_idx(inv)
        _, w, s = bnd_expr()
        ga = flat_b(jnp.maximum(w - 1, 0), s)
        gb = flat_b(jnp.minimum(w + 1, n_pad - 1), s)
        first_m = ((w % W) == 0).reshape(bshape)
        last_m = ((w % W) == W - 1).reshape(bshape)
        known0 = jnp.where(s == 0, 0.0, _NEG).astype(
            jnp.float32).reshape(bshape)
        return g12, g21, ga, gb, first_m, last_m, known0

    return dict(T=T, n=n, n_pad=n_pad, W=W, build=build,
                sshape=sshape, bshape=bshape)


def _tile_padded(x, d: int, T: int, n: int):
    n_pad = T * TILE
    if n_pad > n:
        x = jnp.concatenate([x, jnp.zeros((n_pad - n, d), x.dtype)])
    return tile_windows(x, d, T)


# ---------------------------------------------------------------------------
# BLOCK-MINOR tiled layout ("bm") — r5
# ---------------------------------------------------------------------------
#
# The r5 device trace (xprof) overturned the r4 cost model: the Mosaic
# kernel is ~0.39 ms/half (the VPU retires ~4 ops/cycle, not 1), and the
# ~40 ms/decode previously attributed to "kernel" is actually XLA
# copies/reshapes/pads — the [n, lw] <-> VPU-tile transposes and the
# boundary concats executed per half. The fix is a LAYOUT, not a faster
# kernel: assign window w of block b to slot
#
#     lane = b % 128,  sublane = (w % 8),  tile = (b//128, w//8)
#
# (requires B % 128 == 0 and W % 8 == 0). Then for fixed (block-group,
# lane) the bit index j enumerates the MIDDLE axis of the bitcast view
# [Bg, K, 128], and the QPP interleave becomes a middle-axis gather with
# a shared [K] index — measured 0.30 ms per 78 MB stream on v5e
# (memory-bound), vs ~2.6 ms per tile+untile pair it replaces. Window
# boundary chaining becomes the same gather on the small [Bg, W*8, 128]
# boundary view (no concats), and the streams stay in the kernel layout
# across ALL iterations: the only full-size transposes left are one
# entry per stream and one exit for the posterior.


@functools.lru_cache(maxsize=16)
def _bm_maps(B: int, K: int, lw: int):
    """Index maps for the block-minor layout (numpy, host-cached)."""
    W = K // lw
    assert B % 128 == 0 and W % 8 == 0
    Bg, Wj = B // 128, W // 8
    T = Bg * Wj

    def o_of_j(j):
        wj = j // lw // 8
        s = (j // lw) % 8
        t = j % lw
        return (wj * lw + t) * 8 + s

    def j_of_o(o):
        wj = o // (lw * 8)
        t = (o % (lw * 8)) // 8
        s = o % 8
        return (wj * 8 + s) * lw + t

    o = np.arange(K)
    j = j_of_o(o)
    perm = turbo.qpp_perm(K).astype(np.int64)
    inv = turbo.qpp_inv(K).astype(np.int64)
    omap_perm = o_of_j(perm[j]).astype(np.int32)
    omap_inv = o_of_j(inv[j]).astype(np.int32)

    # boundary view [Bg, W*8, 128]: ob = ((wi//8)*8 + state)*8 + wi%8
    def ob_of(wi, st):
        return ((wi // 8) * 8 + st) * 8 + (wi % 8)

    obs = np.arange(W * 8)
    wi = (obs // 64) * 8 + obs % 8
    st = (obs // 8) % 8
    amap = ob_of(np.maximum(wi - 1, 0), st).astype(np.int32)
    bmap = ob_of(np.minimum(wi + 1, W - 1), st).astype(np.int32)
    first_m = (wi == 0)[None, :, None]
    last_m = (wi == W - 1)[None, :, None]
    known0 = np.where(st == 0, 0.0, _NEG).astype(np.float32)[None, :, None]
    tail_rows = np.asarray([ob_of(W - 1, s) for s in range(8)], np.int32)
    return dict(Bg=Bg, Wj=Wj, T=T, W=W,
                omap_perm=omap_perm, omap_inv=omap_inv,
                amap=amap, bmap=bmap, first_m=first_m, last_m=last_m,
                known0=known0, tail_rows=tail_rows)


def to_bm(x, lw: int):
    """[B, K] natural -> [T*lw, 8, 128] block-minor kernel layout."""
    B, K = x.shape
    Bg, W = B // 128, K // lw
    Wj = W // 8
    return (x.reshape(Bg, 128, Wj, 8, lw)
            .transpose(0, 2, 4, 3, 1).reshape(Bg * Wj * lw, 8, 128))


def from_bm(x_t, B: int, K: int, lw: int):
    Bg, W = B // 128, K // lw
    Wj = W // 8
    return (x_t.reshape(Bg, Wj, lw, 8, 128)
            .transpose(0, 4, 1, 3, 2).reshape(B, K))


class _BmCtx:
    """Shared setup for the block-minor decode paths: tiled streams,
    boundary machinery and the layout index maps."""

    def __init__(self, d_llrs, k: int, window: int, interpret: bool):
        self.B_orig = d_llrs.shape[0]
        pad = (-self.B_orig) % 128
        if pad:
            # pad the block batch to full lanes; padded blocks carry
            # zero LLRs (callers mark them done up front on the
            # early-exit path and slice every output back to B_orig)
            d_llrs = jnp.concatenate(
                [d_llrs, jnp.zeros((pad,) + d_llrs.shape[1:],
                                   d_llrs.dtype)])
        B = d_llrs.shape[0]
        self.B, self.k, self.window = B, k, window
        self.interpret = interpret
        m = _bm_maps(B, k, window)
        self.m = m
        self.Bg, self.T = m["Bg"], m["T"]

        sys1 = d_llrs[:, 0, :k]
        par1 = d_llrs[:, 1, :k]
        par2 = d_llrs[:, 2, :k]
        t = d_llrs[:, :, k : k + 4]
        tails = (
            (jnp.stack([t[:, 0, 0], t[:, 2, 0], t[:, 1, 1]], axis=1),
             jnp.stack([t[:, 1, 0], t[:, 0, 1], t[:, 2, 1]], axis=1)),
            (jnp.stack([t[:, 0, 2], t[:, 2, 2], t[:, 1, 3]], axis=1),
             jnp.stack([t[:, 1, 2], t[:, 0, 3], t[:, 2, 3]], axis=1)),
        )
        _, _, dt = _variant()
        self.sys1_t = to_bm(sys1, window)
        # sys2 (interleaved systematic) via the layout's own gather —
        # one fewer full-stream entry transpose (the composed map
        # o -> o(perm(j(o))) IS omap_perm)
        v = self.sys1_t.reshape(self.Bg, k, 128)
        self.sys2_t = v[:, jnp.asarray(m["omap_perm"]), :].reshape(
            self.T * window, 8, 128)
        self.par1_t = to_bm(par1, window).astype(dt)
        self.par2_t = to_bm(par2, window).astype(dt)
        self.bt_v = tuple(self._tail_bnd(ts, tp) for ts, tp in tails)
        self.first_m = jnp.asarray(m["first_m"])
        self.last_m = jnp.asarray(m["last_m"])
        self.known0 = jnp.asarray(m["known0"])
        self.amap = jnp.asarray(m["amap"])
        self.bmap = jnp.asarray(m["bmap"])
        self.nb = m["W"] * 8
        self.zs = jnp.zeros((self.T * window, 8, 128), jnp.float32)
        self.zb = jnp.zeros((self.T * 8, 8, 128), jnp.float32)

    def _tail_bnd(self, ts, tp):
        bt = turbo._tail_beta(ts, tp, self.B)  # [B, 8]
        btr = bt.reshape(self.Bg, 128, 8).transpose(0, 2, 1)
        v = jnp.full((self.Bg, self.m["W"] * 8, 128), 0.0, jnp.float32)
        return v.at[:, jnp.asarray(self.m["tail_rows"]), :].set(btr)

    def sgather(self, x_t, which: str):
        v = x_t.reshape(self.Bg, self.k, 128)
        omap = jnp.asarray(self.m["omap_" + which])
        return (v[:, omap, :].reshape(self.T * self.window, 8, 128)
                .astype(jnp.float32))

    def boundaries(self, al, bf, half_i: int):
        bv = lambda x: x.reshape(self.Bg, self.nb, 128)  # noqa: E731
        a0 = jnp.where(self.first_m, self.known0, bv(al)[:, self.amap, :])
        b0 = jnp.where(self.last_m, self.bt_v[half_i],
                       bv(bf)[:, self.bmap, :])
        return (a0.reshape(self.T * 8, 8, 128),
                b0.reshape(self.T * 8, 8, 128))

    def iteration(self, ext1, ext2, al1, bf1, al2, bf2):
        """One full turbo iteration entirely in the bm layout."""
        lin1 = self.sys1_t + self.sgather(ext2, "inv")
        a0, b0 = self.boundaries(al1, bf1, 0)
        ext1, al1, bf1 = half_tiled(lin1, self.par1_t, a0, b0, self.window,
                                    interpret=self.interpret)
        lin2 = self.sys2_t + self.sgather(ext1, "perm")
        a0, b0 = self.boundaries(al2, bf2, 1)
        ext2, al2, bf2 = half_tiled(lin2, self.par2_t, a0, b0, self.window,
                                    interpret=self.interpret)
        return (ext1.astype(jnp.float32), ext2.astype(jnp.float32),
                al1.astype(jnp.float32), bf1.astype(jnp.float32),
                al2.astype(jnp.float32), bf2.astype(jnp.float32))

    def post(self, ext1, ext2):
        return self.sys1_t + ext1 + self.sgather(ext2, "inv")

    def finish(self, post_t, crc_mat, iters_used):
        post = from_bm(post_t, self.B, self.k, self.window)[: self.B_orig]
        hard = (post < 0).astype(jnp.uint8)
        if crc_mat is None:
            ok = jnp.zeros((self.B_orig,), bool)
        else:
            crc_m = jnp.asarray(crc_mat.astype(np.float32))
            syn = jnp.mod(jnp.round(hard.astype(jnp.float32) @ crc_m), 2.0)
            ok = jnp.sum(syn, axis=-1) == 0
        return hard, iters_used[: self.B_orig], ok


def decode_forced_bm(d_llrs, k: int, n_iters: int, crc_mat=None,
                     window: int = 64, interpret: bool = False,
                     loop: bool | None = None):
    """Forced-iteration decode in the block-minor layout: zero stream
    transposes per iteration (see module section note). Bit-identical
    to the window-linear forced path (same kernel, same max-log
    arithmetic; pinned in test_turbo_pallas).

    loop=True runs the iteration as a lax.fori_loop over bm carries —
    unlike the natural-layout loop forms (r5 ledger: +7 ms/iter from
    carry-adjacent transposes), the bm body has no layout glue to lose,
    so the loop form trades nothing at runtime and shrinks the XLA
    graph (and compile time) ~n_iters-fold."""
    if loop is None:
        loop = (os.environ.get("SRSUE_TPU_TURBO_FORCED", "unroll")
                == "loop_bm")
    c = _BmCtx(d_llrs, k, window, interpret)
    carry = (c.zs, c.zs, c.zb, c.zb, c.zb, c.zb)
    if loop and not interpret:
        carry = jax.lax.fori_loop(
            0, n_iters, lambda _, cr: c.iteration(*cr), carry)
    else:
        for _ in range(n_iters):
            carry = c.iteration(*carry)
    post_t = c.post(carry[0], carry[1])
    iters = jnp.full((c.B,), n_iters, jnp.int32)
    return c.finish(post_t, crc_mat, iters)


def _bm_pad_done(c: "_BmCtx"):
    """done-mask initialized True for the zero-LLR padding blocks so
    they never gate the early-exit while loop."""
    b_idx = (jnp.arange(c.Bg)[:, None] * 128 + jnp.arange(128)[None, :])
    return b_idx >= c.B_orig


def decode_bm_early_exit(d_llrs, k: int, n_iters: int, crc_mat,
                         window: int = 64, interpret: bool = False):
    """Early-exit decode in the block-minor layout: the whole iteration
    (kernels, QPP gathers, boundary chaining, CRC syndrome) runs inside
    one lax.while_loop body with bm-layout carries. The per-iteration
    CRC contracts the middle axis of the [Bg, K, 128] stream view with
    the row-PERMUTED CRC matrix (M_bm[o] = M[j(o)]) on the MXU, so no
    layout change is needed to test convergence. Middle-axis gathers
    lower memory-bound inside while bodies (0.08 ms/iter measured at
    the flagship shape) — unlike the natural-layout loop forms whose
    carry transposes cost ~7 ms/iter (r5 ledger)."""
    c = _BmCtx(d_llrs, k, window, interpret)
    m = c.m
    # CRC matrix permuted into bm middle-axis order
    o = np.arange(k)
    wj = o // (window * 8)
    t_ = (o % (window * 8)) // 8
    s = o % 8
    j_of_o = (wj * 8 + s) * window + t_
    m_bm = jnp.asarray(crc_mat.astype(np.float32)[j_of_o])

    def crc_ok_v(post_t):
        hv = (post_t.reshape(c.Bg, k, 128) < 0).astype(jnp.float32)
        syn = jnp.mod(jnp.round(jnp.einsum("bol,oc->blc", hv, m_bm)), 2.0)
        return jnp.sum(syn, axis=-1) == 0  # [Bg, 128]

    def mask_s(done, new, old):
        d = done[:, None, :]  # [Bg, 1, 128]
        nv = new.reshape(c.Bg, -1, 128)
        ov = old.reshape(c.Bg, -1, 128)
        return jnp.where(d, ov, nv).reshape(new.shape)

    def body(state):
        i, ext1, ext2, al1, bf1, al2, bf2, done, iters = state
        new = c.iteration(ext1, ext2, al1, bf1, al2, bf2)
        ok = crc_ok_v(c.post(new[0], new[1]))
        outs = tuple(mask_s(done, n, o_) for n, o_ in
                     zip(new, (ext1, ext2, al1, bf1, al2, bf2)))
        iters = iters + (~done).astype(jnp.int32)
        return (i + 1, *outs, done | ok, iters)

    def cond(state):
        return (state[0] < n_iters) & ~jnp.all(state[7])

    done0 = _bm_pad_done(c)
    it0 = jnp.zeros((c.Bg, 128), jnp.int32)
    state = (jnp.int32(0), c.zs, c.zs, c.zb, c.zb, c.zb, c.zb, done0, it0)
    state = jax.lax.while_loop(cond, body, state)
    _, ext1, ext2, *_, iters_v = state
    post_t = c.post(ext1, ext2)
    # natural-order block indexing: b = bg*128 + lane
    iters = iters_v.reshape(c.B)
    hard, iters, ok = c.finish(post_t, crc_mat, iters)
    return hard, iters, ok


def decode_forced_loop_tiled(d_llrs, k: int, n_iters: int, crc_mat=None,
                             window: int = 64, interpret: bool = False):
    """Forced-iteration decode as a lax.fori_loop whose CARRIES stay in
    the VPU tile layout.

    The r4 fori_loop experiment measured +7 ms/iteration over the
    unrolled form: the loop body began by tiling the carried [B, K]
    extrinsics and ended by untiling them, and carry-adjacent transposes
    cannot be absorbed into neighbouring ops the way the unrolled graph
    absorbs them (tools/bench_gather_forms.py: a bare tile+untile pair
    costs 5.8 ms at the flagship size). Carrying the TILED streams
    instead keeps every untile -> QPP gather -> tile sequence interior
    to the body where XLA folds transposes into the gather; the body
    then costs what one unrolled iteration costs, while the XLA graph
    (and compile time) shrinks ~n_iters-fold.

    The flat composed-index gather of decode_forced_tiled is NOT used:
    XLA:TPU lowers it to a near-scalar loop (~220 ms); the via-natural
    form gathers [B, K] on the minor dim with a shared [K] index, the
    fast class (SKILL.md r3)."""
    assert k % window == 0
    B = d_llrs.shape[0]
    W = k // window
    n = B * W
    m = _tiled_maps(B, k, window)
    T = m["T"]
    n_pad = m["n_pad"]

    perm = jnp.asarray(turbo.qpp_perm(k))
    inv = jnp.asarray(turbo.qpp_inv(k))
    sys1 = d_llrs[:, 0, :k]
    par1 = d_llrs[:, 1, :k]
    par2 = d_llrs[:, 2, :k]
    t = d_llrs[:, :, k : k + 4]
    tail1_sys = jnp.stack([t[:, 0, 0], t[:, 2, 0], t[:, 1, 1]], axis=1)
    tail1_par = jnp.stack([t[:, 1, 0], t[:, 0, 1], t[:, 2, 1]], axis=1)
    tail2_sys = jnp.stack([t[:, 0, 2], t[:, 2, 2], t[:, 1, 3]], axis=1)
    tail2_par = jnp.stack([t[:, 1, 2], t[:, 0, 3], t[:, 2, 3]], axis=1)

    sys1_t = _tile_padded(sys1.reshape(n, window), window, T, n)
    sys2_t = _tile_padded(sys1[:, perm].reshape(n, window), window, T, n)
    par1_t = pretile_par(par1, window)
    par2_t = pretile_par(par2, window)

    def tail_tiled(ts, tp):
        bt = turbo._tail_beta(ts, tp, B)
        lin = jnp.zeros((B, W, 8), jnp.float32).at[:, W - 1, :].set(bt)
        return _tile_padded(lin.reshape(n, 8), 8, T, n)

    bt1_t = tail_tiled(tail1_sys, tail1_par)
    bt2_t = tail_tiled(tail2_sys, tail2_par)
    _, _, ga, gb, first_m, last_m, known0 = m["build"]()
    sshape, bshape = m["sshape"], m["bshape"]

    def gbnd(x_t, g):
        return x_t.reshape(-1)[g].reshape(bshape)

    def regather(x_t, table):
        """Tiled stream -> natural [B, K] -> minor-dim QPP gather ->
        tiled stream; the transposes stay interior to the loop body."""
        x = untile_windows(x_t, window, T, n_pad)[:n].reshape(B, k)
        xg = x[:, table].reshape(n, window)
        return _tile_padded(xg, window, T, n)

    zb = jnp.zeros(bshape, jnp.float32)
    zs = jnp.zeros(sshape, jnp.float32)

    def body(_, carry):
        ext1_t, ext2_t, al1, bf1, al2, bf2 = carry
        lin1_t = sys1_t + regather(ext2_t, inv)
        a0 = jnp.where(first_m, known0, gbnd(al1, ga))
        b0 = jnp.where(last_m, bt1_t, gbnd(bf1, gb))
        ext1_t, al1, bf1 = half_tiled(
            lin1_t, par1_t, a0, b0, window, interpret=interpret)
        lin2_t = sys2_t + regather(ext1_t, perm)
        a0 = jnp.where(first_m, known0, gbnd(al2, ga))
        b0 = jnp.where(last_m, bt2_t, gbnd(bf2, gb))
        ext2_t, al2, bf2 = half_tiled(
            lin2_t, par2_t, a0, b0, window, interpret=interpret)
        return (ext1_t, ext2_t, al1, bf1, al2, bf2)

    ext1_t, ext2_t, *_ = jax.lax.fori_loop(
        0, n_iters, body, (zs, zs, zb, zb, zb, zb))

    post_t = sys1_t + ext1_t + regather(ext2_t, inv)
    post = untile_windows(post_t, window, T, n_pad)[:n].reshape(B, k)
    hard = (post < 0).astype(jnp.uint8)
    if crc_mat is None:
        ok = jnp.zeros((B,), bool)
    else:
        crc_m = jnp.asarray(crc_mat.astype(np.float32))
        syn = jnp.mod(jnp.round(hard.astype(jnp.float32) @ crc_m), 2.0)
        ok = jnp.sum(syn, axis=-1) == 0
    iters_used = jnp.full((B,), n_iters, jnp.int32)
    return hard, iters_used, ok


def decode_forced_tiled(d_llrs, k: int, n_iters: int, crc_mat=None,
                        window: int = 64, interpret: bool = False):
    """Forced-iteration turbo decode with the iteration loop entirely in
    the VPU tile layout (same contract as the forced path of decode())."""
    assert k % window == 0
    B = d_llrs.shape[0]
    W = k // window
    n = B * W
    m = _tiled_maps(B, k, window)
    T = m["T"]

    perm = jnp.asarray(turbo.qpp_perm(k))
    sys1 = d_llrs[:, 0, :k]
    par1 = d_llrs[:, 1, :k]
    par2 = d_llrs[:, 2, :k]
    t = d_llrs[:, :, k : k + 4]
    tail1_sys = jnp.stack([t[:, 0, 0], t[:, 2, 0], t[:, 1, 1]], axis=1)
    tail1_par = jnp.stack([t[:, 1, 0], t[:, 0, 1], t[:, 2, 1]], axis=1)
    tail2_sys = jnp.stack([t[:, 0, 2], t[:, 2, 2], t[:, 1, 3]], axis=1)
    tail2_par = jnp.stack([t[:, 1, 2], t[:, 0, 3], t[:, 2, 3]], axis=1)

    sys1_t = _tile_padded(sys1.reshape(n, window), window, T, n)
    sys2_t = _tile_padded(sys1[:, perm].reshape(n, window), window, T, n)
    par1_t = pretile_par(par1, window)
    par2_t = pretile_par(par2, window)

    def tail_tiled(ts, tp):
        bt = turbo._tail_beta(ts, tp, B)  # [B, 8]
        lin = jnp.zeros((B, W, 8), jnp.float32).at[:, W - 1, :].set(bt)
        return _tile_padded(lin.reshape(n, 8), 8, T, n)

    bt1_t = tail_tiled(tail1_sys, tail1_par)
    bt2_t = tail_tiled(tail2_sys, tail2_par)

    g12, g21, ga, gb, first_m, last_m, known0 = m["build"]()
    sshape, bshape = m["sshape"], m["bshape"]

    def gs(x_t, g):
        return x_t.reshape(-1)[g].reshape(sshape)

    def gbnd(x_t, g):
        return x_t.reshape(-1)[g].reshape(bshape)

    zb = jnp.zeros(bshape, jnp.float32)
    ext1_t = ext2_t = None
    alast1 = bfirst1 = alast2 = bfirst2 = zb
    for i in range(n_iters):
        lin1_t = sys1_t if i == 0 else sys1_t + gs(ext2_t, g21)
        a0 = jnp.where(first_m, known0, gbnd(alast1, ga))
        b0 = jnp.where(last_m, bt1_t, gbnd(bfirst1, gb))
        ext1_t, alast1, bfirst1 = half_tiled(
            lin1_t, par1_t, a0, b0, window, interpret=interpret)
        lin2_t = sys2_t + gs(ext1_t, g12)
        a0 = jnp.where(first_m, known0, gbnd(alast2, ga))
        b0 = jnp.where(last_m, bt2_t, gbnd(bfirst2, gb))
        ext2_t, alast2, bfirst2 = half_tiled(
            lin2_t, par2_t, a0, b0, window, interpret=interpret)

    post_t = sys1_t + ext1_t + gs(ext2_t, g21)
    post = untile_windows(post_t, window, T, T * TILE)[:n].reshape(B, k)
    hard = (post < 0).astype(jnp.uint8)
    if crc_mat is None:
        ok = jnp.zeros((B,), bool)
    else:
        crc_m = jnp.asarray(crc_mat.astype(np.float32))
        syn = jnp.mod(jnp.round(hard.astype(jnp.float32) @ crc_m), 2.0)
        ok = jnp.sum(syn, axis=-1) == 0
    iters_used = jnp.full((B,), n_iters, jnp.int32)
    return hard, iters_used, ok
