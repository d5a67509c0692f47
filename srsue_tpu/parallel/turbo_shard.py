"""Device-sharded turbo decoding — BCJR windows sharded across the mesh
(BASELINE north star: "exchange ... turbo-iteration extrinsics via
collectives"; SURVEY.md §5: ring `ppermute` filling ring-attention's
role).

A codeblock's K trellis steps are split into W windows (phy/turbo.py
windowed BCJR); here the window axis is SHARDED over a mesh axis:

* window-local forward/backward scans run shard-locally;
* the next-iteration-initialization boundaries (final alpha of a
  device's last window -> right neighbor's first window; first beta of a
  device's first window -> left neighbor's last window) ride a ring
  `ppermute` — 8 floats per codeblock per hop;
* the QPP interleaver between constituent decoders is a global
  permutation, realized as `all_gather` of the extrinsics + a static
  per-device index table (the "turbo extrinsic exchange" collective);
* the on-device CRC early-exit check becomes partial GF(2) syndromes +
  `psum` (XOR == sum mod 2 across shards).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..phy import turbo

_NEG = -1e9


def _half_ring(sys_llr, par_llr, apriori, beta_tail, ab, bb, lw, w0_global,
               n_windows_global, axis):
    """One constituent windowed half-iteration, shard-local windows +
    ring boundary exchange. Shapes: [B, k_loc] LLRs, [B, w_loc, 8]
    boundaries. w0_global = global index of this device's first window
    (traced). beta_tail: [B, 8] termination beta (only used by the owner
    of the last global window)."""
    ns_np, par_np, _ = turbo._trellis()
    prev_s_np, prev_u_np = turbo._prev_tables()
    prev_s = jnp.asarray(prev_s_np)
    prev_u = jnp.asarray(prev_u_np)
    ns = jnp.asarray(ns_np)
    par_sign = jnp.asarray(1.0 - 2.0 * par_np.astype(np.float32))
    u_sign = jnp.asarray(np.array([1.0, -1.0], np.float32))

    B, k_loc = sys_llr.shape
    w_loc = k_loc // lw
    Lin = sys_llr + apriori
    lin_w = Lin.reshape(B, w_loc, lw)
    par_w = par_llr.reshape(B, w_loc, lw)

    gidx = w0_global + jnp.arange(w_loc)  # global window indices [w_loc]

    def gamma_k(lin_k, lp_k):
        return (
            0.5 * lin_k[..., None, None] * u_sign
            + 0.5 * lp_k[..., None, None] * par_sign
        )

    known0 = jnp.full((8,), _NEG, jnp.float32).at[0].set(0.0)
    a0 = jnp.where((gidx == 0)[None, :, None], known0, ab)

    def fwd(alpha, x):
        lin_k, lp_k = x
        g = gamma_k(lin_k, lp_k)
        cand = alpha[..., prev_s] + g[..., prev_s, prev_u]
        a = jnp.max(cand, axis=-1)
        return a - jnp.max(a, axis=-1, keepdims=True), alpha

    xs = (jnp.moveaxis(lin_w, 2, 0), jnp.moveaxis(par_w, 2, 0))
    alpha_last, alphas = jax.lax.scan(fwd, a0, xs)
    alphas = jnp.moveaxis(alphas, 0, 2)  # [B, w_loc, lw, 8]

    n_dev = jax.lax.psum(1, axis)
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    # boundary to the right neighbor: final alpha of my last window
    from_left = jax.lax.ppermute(alpha_last[:, -1, :], axis, right)
    new_ab = jnp.concatenate([from_left[:, None, :], alpha_last[:, :-1, :]],
                             axis=1)

    b0 = jnp.where(
        (gidx == n_windows_global - 1)[None, :, None], beta_tail[:, None, :], bb
    )

    def bwd(beta, x):
        lin_k, lp_k = x
        g = gamma_k(lin_k, lp_k)
        m = beta[..., ns] + g
        b = jnp.max(m, axis=-1)
        return b - jnp.max(b, axis=-1, keepdims=True), m

    xs_rev = (jnp.moveaxis(lin_w, 2, 0)[::-1], jnp.moveaxis(par_w, 2, 0)[::-1])
    beta_first, ms = jax.lax.scan(bwd, b0, xs_rev)
    ms = jnp.moveaxis(ms[::-1], 0, 2)

    from_right = jax.lax.ppermute(beta_first[:, 0, :], axis, left)
    new_bb = jnp.concatenate([beta_first[:, 1:, :], from_right[:, None, :]],
                             axis=1)

    full = alphas[..., None] + ms
    post = (jnp.max(full[..., 0], axis=-1) - jnp.max(full[..., 1], axis=-1))
    return post.reshape(B, k_loc) - Lin, new_ab, new_bb


def make_sharded_decoder(k: int, n_iters: int, mesh: Mesh, window: int = 64,
                         axis: str = "win", crc_mat: np.ndarray | None = None):
    """Jitted turbo decoder with the window/K axis sharded over `axis`.

    Input d_streams [B, 3, k] (data part; tails [B, 3, 4] passed
    separately, replicated). Output (hard [B, k], iters [B], ok [B]) —
    hard sharded on the k axis, scalars replicated.
    """
    n_dev = mesh.shape[axis]
    W = k // window
    assert W % n_dev == 0, f"{W} windows must split evenly over {n_dev} devices"
    k_loc = k // n_dev
    w_loc = W // n_dev

    perm_tab = turbo.qpp_perm(k).reshape(n_dev, k_loc)
    inv_tab = turbo.qpp_inv(k).reshape(n_dev, k_loc)
    if crc_mat is not None:
        crc_tab = crc_mat.astype(np.float32).reshape(n_dev, k_loc, 24)

    def local(d_loc, tails):
        # d_loc: [B, 3, k_loc] local; tails: [B, 3, 4] replicated
        B = d_loc.shape[0]
        idx = jax.lax.axis_index(axis)
        sys1 = d_loc[:, 0, :]
        par1 = d_loc[:, 1, :]
        par2 = d_loc[:, 2, :]
        t = tails
        tail1_sys = jnp.stack([t[:, 0, 0], t[:, 2, 0], t[:, 1, 1]], axis=1)
        tail1_par = jnp.stack([t[:, 1, 0], t[:, 0, 1], t[:, 2, 1]], axis=1)
        tail2_sys = jnp.stack([t[:, 0, 2], t[:, 2, 2], t[:, 1, 3]], axis=1)
        tail2_par = jnp.stack([t[:, 1, 2], t[:, 0, 3], t[:, 2, 3]], axis=1)
        bt1 = turbo._tail_beta(tail1_sys, tail1_par, B)
        bt2 = turbo._tail_beta(tail2_sys, tail2_par, B)

        # interleaved-domain systematic: gather from the full sys1
        sys1_full = jax.lax.all_gather(sys1, axis, axis=1, tiled=True)  # [B, k]
        my_perm = jnp.asarray(perm_tab)[idx]  # [k_loc]
        sys2 = jnp.take(sys1_full, my_perm, axis=1)
        my_inv = jnp.asarray(inv_tab)[idx]
        w0 = idx * w_loc

        def crc_ok_of(hard_loc):
            if crc_mat is None:
                return jnp.zeros((B,), bool)
            part = hard_loc.astype(jnp.float32) @ jnp.asarray(crc_tab)[idx]
            syn = jnp.mod(jnp.round(jax.lax.psum(part, axis)), 2.0)
            return jnp.sum(syn, axis=-1) == 0

        def body(carry, _):
            le21, done, iters_used, hard_prev, ab1, bb1, ab2, bb2 = carry
            le12, ab1n, bb1n = _half_ring(
                sys1, par1, le21, bt1, ab1, bb1, window, w0, W, axis
            )
            # extrinsic exchange: interleave le12 across the mesh
            le12_full = jax.lax.all_gather(le12, axis, axis=1, tiled=True)
            apr2 = jnp.take(le12_full, my_perm, axis=1)
            le21i, ab2n, bb2n = _half_ring(
                sys2, par2, apr2, bt2, ab2, bb2, window, w0, W, axis
            )
            le21i_full = jax.lax.all_gather(le21i, axis, axis=1, tiled=True)
            le21_new = jnp.take(le21i_full, my_inv, axis=1)
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

        zb = jnp.zeros((B, w_loc, 8), jnp.float32)
        init = (
            jnp.zeros((B, k_loc), jnp.float32),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, k_loc), jnp.uint8),
            zb, zb, zb, zb,
        )
        # align varying-manual-axes types: carry values exchanged via
        # collectives are 'varying' over the mesh axis
        _pcast = getattr(jax.lax, "pcast", None)
        if _pcast is not None:
            init = jax.tree.map(lambda x: _pcast(x, axis, to="varying"), init)
        else:  # older jax
            init = jax.tree.map(lambda x: jax.lax.pvary(x, (axis,)), init)
        (le21, done, iters_used, hard, *_), _ = jax.lax.scan(
            body, init, None, length=n_iters
        )
        ok = crc_ok_of(hard) | done
        # iters_used/ok are replicated BY CONSTRUCTION (they derive from
        # the psum'd CRC syndrome), but the varying-manual-axes checker
        # cannot infer that through the scan carry: an explicit pmax
        # (numerically the identity on replicated values) proves it,
        # keeping check_vma enabled (VERDICT r1 weak-6).
        iters_used = jax.lax.pmax(iters_used, axis)
        ok = jax.lax.pmax(ok.astype(jnp.int32), axis).astype(bool)
        return hard, iters_used, ok

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis), P()),
        out_specs=(P(None, axis), P(), P()),
        check_vma=True,
    )

    @jax.jit
    def run(d_llrs):
        d = d_llrs[:, :, :k]
        tails = d_llrs[:, :, k : k + 4]
        return fn(d, tails)

    return run
