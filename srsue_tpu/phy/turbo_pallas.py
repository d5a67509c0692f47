"""Pallas TPU kernel for the windowed max-log-MAP half-iteration — the
speed-of-light path for the dominant DL hot loop (SURVEY.md §7.3: "turbo
decoder as Pallas kernel ... batch codeblocks x windowed BCJR").

Layout: the (codeblock x window) product rides the LANES (tiles of 128);
the 8 trellis states ride SUBLANES. One kernel invocation performs, for a
[lw, n]-shaped window batch:

  * the forward (alpha) recursion, storing all lw alpha vectors in VMEM
    scratch (lw*8*128*4B = 256 KB at lw=64 — fits comfortably),
  * the backward (beta) recursion fused with the extrinsic computation
    (the [8,2] add-compare-select trees are fully unrolled: pure VPU
    row ops, no gathers),
  * emission of the boundary metrics (alpha_last / beta_first) for the
    next-iteration-initialization chaining done by the caller.

The branch metrics exploit the RSC structure: gamma(s,u) takes one of
only 4 values (+-Lin +- Lpar)/2, selected per (state, input) by the
static parity table — computed once per trellis step as 4 lane-rows.

The caller (decode()) keeps the iteration loop, interleaving, CRC early
exit and HARQ semantics in regular JAX; this kernel replaces only the
scan-heavy BCJR core. Correctness is pinned to the pure-JAX windowed
decoder (tests/test_turbo_pallas.py) in interpret mode on CPU and
compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import turbo

LANES = 128
_NEG = -1e9


@functools.lru_cache(maxsize=1)
def _static_tables():
    ns, par, _ = turbo._trellis()
    prev_s, prev_u = turbo._prev_tables()
    # gamma selector: for (s,u), gamma = 0.5*(u_sign*Lin + p_sign*Par)
    u_sign = np.array([1.0, -1.0], np.float32)
    p_sign = (1.0 - 2.0 * par).astype(np.float32)  # [8,2]
    return ns, par, prev_s, prev_u, u_sign, p_sign


def _half_kernel(lin_ref, par_ref, a0_ref, b0_ref,
                 ext_ref, alast_ref, bfirst_ref, alphas_ref):
    """One window-batch half-iteration.

    lin/par: [lw, N] (systematic+apriori, parity LLRs)
    a0/b0:   [8, N] boundary initializations
    ext:     [lw, N] extrinsic output
    alast/bfirst: [8, N] boundary outputs
    alphas (scratch): [lw, 8, N]
    """
    ns, par, prev_s, prev_u, u_sign, p_sign = _static_tables()
    lw = lin_ref.shape[0]

    # ---------------- forward ----------------
    def fwd_body(t, alpha):
        # alpha: [8, N] carried in registers/VMEM via fori_loop
        lin_t = lin_ref[t, :]
        par_t = par_ref[t, :]
        alphas_ref[t] = alpha
        half_lin = 0.5 * lin_t
        half_par = 0.5 * par_t
        # candidates for each next state: unrolled ACS
        rows = []
        for sp in range(8):
            c = None
            for j in range(2):
                s = int(prev_s[sp, j])
                u = int(prev_u[sp, j])
                g = u_sign[u] * half_lin + p_sign[s, u] * half_par
                cand = alpha[s, :] + g
                c = cand if c is None else jnp.maximum(c, cand)
            rows.append(c)
        a_next = jnp.stack(rows, axis=0)
        a_next = a_next - jnp.max(a_next, axis=0, keepdims=True)
        return a_next

    alpha0 = a0_ref[:, :]
    alpha_final = jax.lax.fori_loop(0, lw, fwd_body, alpha0)
    alast_ref[:, :] = alpha_final

    # ---------------- backward + extrinsic ----------------
    def bwd_body(i, beta):
        t = lw - 1 - i
        lin_t = lin_ref[t, :]
        par_t = par_ref[t, :]
        half_lin = 0.5 * lin_t
        half_par = 0.5 * par_t
        alpha_t = alphas_ref[t]
        # per (s,u): m = alpha[s] + gamma(s,u) + beta[ns[s,u]]
        m0 = None
        m1 = None
        rows = []
        for s in range(8):
            best_u = None
            for u in range(2):
                g = u_sign[u] * half_lin + p_sign[s, u] * half_par
                m = alpha_t[s, :] + g + beta[int(ns[s, u]), :]
                if u == 0:
                    m0 = m if m0 is None else jnp.maximum(m0, m)
                else:
                    m1 = m if m1 is None else jnp.maximum(m1, m)
                bcand = g + beta[int(ns[s, u]), :]
                best_u = bcand if best_u is None else jnp.maximum(best_u, bcand)
            rows.append(best_u)
        post = m0 - m1
        ext_ref[t, :] = post - lin_ref[t, :]
        beta_prev = jnp.stack(rows, axis=0)
        beta_prev = beta_prev - jnp.max(beta_prev, axis=0, keepdims=True)
        return beta_prev

    beta_final = jax.lax.fori_loop(0, lw, bwd_body, b0_ref[:, :])
    bfirst_ref[:, :] = beta_final


def half_windowed_pallas(lin, par, a0, b0, lw: int, interpret: bool = False):
    """[n, lw] window-major inputs -> (ext [n, lw], alpha_last [n, 8],
    beta_first [n, 8]) where n = number of (block, window) pairs.

    Internally transposed to lanes-last [lw, n] / [8, n]; n is padded to
    a multiple of 128 by the caller.
    """
    n = lin.shape[0]
    assert n % LANES == 0, f"pad window count to lanes: {n}"
    lin_t = lin.T  # [lw, n]
    par_t = par.T
    a0_t = a0.T  # [8, n]
    b0_t = b0.T

    grid = (n // LANES,)
    ext, alast, bfirst = pl.pallas_call(
        _half_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lw, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lw, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lw, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lw, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((lw, 8, LANES), jnp.float32)],
        interpret=interpret,
    )(lin_t, par_t, a0_t, b0_t)
    return ext.T, alast.T, bfirst.T


def bcjr_half_windowed_pallas(sys_llr, par_llr, apriori, tail_sys, tail_par,
                              alpha_b, beta_b, lw: int,
                              interpret: bool = False):
    """Drop-in replacement for turbo._bcjr_half_windowed backed by the
    Pallas kernel. Shapes: [B, K] LLRs, [B, W, 8] boundaries."""
    B, K = sys_llr.shape
    W = K // lw
    n = B * W
    pad = (-n) % LANES

    Lin = sys_llr + apriori
    lin_w = Lin.reshape(n, lw)
    par_w = par_llr.reshape(n, lw)

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
        par_w = jnp.concatenate([par_w, z2])
        a0 = jnp.concatenate([a0, z8])
        b0 = jnp.concatenate([b0, z8])

    ext, alast, bfirst = half_windowed_pallas(lin_w, par_w, a0, b0, lw,
                                              interpret=interpret)
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
           interpret: bool = False):
    """Full turbo decode with the Pallas BCJR core (same contract as
    turbo.decode)."""
    assert k % window == 0, f"window {window} must divide K={k}"
    B = d_llrs.shape[0]
    W = k // window
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

    def crc_ok_of(hard):
        if crc_m is None:
            return jnp.zeros((B,), bool)
        syn = jnp.mod(jnp.round(hard.astype(jnp.float32) @ crc_m), 2.0)
        return jnp.sum(syn, axis=-1) == 0

    def body(carry, _):
        le21, done, iters_used, hard_prev, ab1, bb1, ab2, bb2 = carry
        le12, ab1n, bb1n = bcjr_half_windowed_pallas(
            sys1, par1, le21, tail1_sys, tail1_par, ab1, bb1, window,
            interpret=interpret,
        )
        le21_raw, ab2n, bb2n = bcjr_half_windowed_pallas(
            sys2, par2, le12[:, perm], tail2_sys, tail2_par, ab2, bb2, window,
            interpret=interpret,
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
    if crc_mat is not None:
        # whole-batch device-side early exit (see turbo.decode)
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
    else:
        (le21, done, iters_used, hard, *_), _ = jax.lax.scan(
            body, init, None, length=n_iters
        )
    ok = crc_ok_of(hard) | done
    return hard, iters_used, ok
