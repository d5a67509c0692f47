"""Tail-biting convolutional code (36.212 §5.1.3.1) — encoder + batched
circular Viterbi decoder.

Used by PBCH (MIB), PDCCH (DCI) and PCFICH-adjacent control decoding; the
reference consumes this through srsLTE's Viterbi inside
``srslte_pbch_decode`` / ``srslte_pdcch_extract_llr`` + DCI blind search
(ue/src/phy/phch_recv.cc:96-264, ue/src/phy/phch_worker.cc:278-326).

TPU design
----------
The decoder is a ``lax.scan`` over trellis steps with the 64 path metrics
and the batch axis laid out as a single [B, 64] f32 array — pure VPU
add-compare-select with no data-dependent control flow. Blind DCI search
batches all (candidate location, aggregation, DCI-size) hypotheses in B,
so one decoder call covers the whole search space (SURVEY.md §7 hard
part 2). Tail-biting is handled with the circular ("wrap-around") Viterbi:
ACS over the sequence twice, traceback over the second pass.

Convention: state s = (x_{k-1}..x_{k-6}) as a 6-bit int, newest bit = MSB;
the 7-bit word w = x_k*64 + s indexes branches; next state = w >> 1.
LLR sign: positive = bit 0 (matches modulation.demodulate_soft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GENS = (0o133, 0o171, 0o165)
K = 7
NSTATES = 64


def _popcount_parity(x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    for i in range(7):
        out ^= (x >> i) & 1
    return out


@functools.lru_cache(maxsize=1)
def _tables():
    """Precomputed trellis tables.

    out_pm1[w, j]: +-1 expected soft value (1-2*bit) of output stream j for
        branch word w in [0,128).
    prev[ns, t]: the two 7-bit branch words leading INTO next-state ns.
    """
    w = np.arange(128)
    outs = np.stack([_popcount_parity(w & g) for g in GENS], axis=1)  # [128,3]
    out_pm1 = (1.0 - 2.0 * outs).astype(np.float32)
    ns = np.arange(NSTATES)
    prev = np.stack([2 * ns, 2 * ns + 1], axis=1).astype(np.int32)  # [64,2]
    prev_state = prev & 63
    inp_bit = (np.arange(NSTATES) >> 5) & 1  # x_k = MSB of ns
    return out_pm1, prev, prev_state, inp_bit.astype(np.uint8)


def encode(bits: np.ndarray) -> np.ndarray:
    """Tail-biting encode: [n] {0,1} -> [3n] (d0[0],..  stream-major [3, n]
    flattened as streams concatenated: returns shape [3, n])."""
    b = np.asarray(bits, dtype=np.uint8).ravel()
    n = len(b)
    from ..utils import native

    nat = native.conv_encode(b)
    if nat is not None:
        return nat
    state = 0
    for i in range(6):  # init register with last 6 bits (tail-biting)
        state |= int(b[n - 1 - i]) << (5 - i)
    out = np.empty((3, n), dtype=np.uint8)
    out_tab, _, _, _ = _tables()
    for k in range(n):
        w = (int(b[k]) << 6) | state
        for j in range(3):
            out[j, k] = (1 - int(out_tab[w, j])) // 2
        state = w >> 1
    return out


def decode(llrs: jnp.ndarray) -> jnp.ndarray:
    """Batched circular Viterbi decode.

    llrs: [B, n, 3] float soft values (positive = bit 0) for the three
    output streams. Returns hard decisions [B, n] uint8.
    """
    out_pm1, prev, prev_state, inp_bit = _tables()
    out_pm1 = jnp.asarray(out_pm1)           # [128, 3]
    prev_state_j = jnp.asarray(prev_state)   # [64, 2]
    prev_j = jnp.asarray(prev)               # [64, 2]

    B, n, _ = llrs.shape
    # circular: two passes over the sequence
    llr2 = jnp.concatenate([llrs, llrs], axis=1)  # [B, 2n, 3]

    def step(pm, llr_k):
        # llr_k: [B, 3]; branch metrics for all 128 words: [B, 128]
        bm = llr_k @ out_pm1.T
        cand = pm[:, prev_state_j] + bm[:, prev_j]  # [B, 64, 2]
        dec = jnp.argmax(cand, axis=-1).astype(jnp.uint8)  # [B, 64]
        pm_next = jnp.max(cand, axis=-1)
        # normalize to avoid drift
        pm_next = pm_next - jnp.max(pm_next, axis=-1, keepdims=True)
        return pm_next, dec

    pm0 = jnp.zeros((B, NSTATES), dtype=jnp.float32)
    pm, decs = jax.lax.scan(step, pm0, jnp.swapaxes(llr2, 0, 1))  # decs [2n, B, 64]

    # traceback over the LAST n steps, starting from the best final state
    best = jnp.argmax(pm, axis=-1).astype(jnp.int32)  # [B]
    inp_bit_j = jnp.asarray(inp_bit.astype(np.int32))  # x_k from next-state

    def tb_step(state, dec_k):
        # dec_k: [B, 64]; current `state` is the next-state at step k
        bit = inp_bit_j[state]  # decoded input bit x_k
        t = jnp.take_along_axis(dec_k, state[:, None], axis=1)[:, 0].astype(jnp.int32)
        w = 2 * state + t
        prev_s = w & 63
        return prev_s, bit.astype(jnp.uint8)

    decs_last = decs[n:][::-1]  # steps 2n-1 .. n
    _, bits_rev = jax.lax.scan(tb_step, best, decs_last)
    return jnp.swapaxes(bits_rev[::-1], 0, 1)  # [B, n]


def encode_jax(bits: jnp.ndarray) -> jnp.ndarray:
    """Batched tail-biting encoder in JAX (eNB-side vector generation on
    device): [B, n] -> [B, 3, n]."""
    out_tab, _, _, _ = _tables()
    bits_tab = ((1 - out_tab) / 2).astype(np.uint8)  # [128,3] output bits
    bits_tab_j = jnp.asarray(bits_tab)
    B, n = bits.shape
    b = bits.astype(jnp.int32)
    init_state = jnp.zeros((B,), jnp.int32)
    for i in range(6):
        init_state = init_state | (b[:, n - 1 - i] << (5 - i))

    def step(state, bk):
        w = (bk << 6) | state
        return w >> 1, bits_tab_j[w]  # [B, 3]

    _, outs = jax.lax.scan(step, init_state, jnp.swapaxes(b, 0, 1))
    return jnp.transpose(outs, (1, 2, 0))  # [B, 3, n]
