"""OFDM modulation/demodulation: CP insertion/removal + (I)FFT + subcarrier
(de)mapping — the TPU replacement of srsLTE's per-symbol FFT consumed via
``srslte_ue_dl_decode_fft_estimate`` (ue/src/phy/phch_worker.cc:254).

Design: whole subframes are processed as one batched FFT of shape
[..., n_sym, nfft]. All CP handling and subcarrier (de)mapping is **pure
static slicing + concat** — symbol start offsets and the DC-skipping
spectrum layout are compile-time constants per Cell, so no gather/scatter
ops appear at all (they are both slower than slices and unsupported in
exotic index forms on some TPU runtimes). The DL resource grid convention
is ``grid[..., n_sym_sf, n_sc]`` with DC skipped (36.211 §6.12).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from .cell import Cell


@functools.lru_cache(maxsize=32)
def symbol_starts(cell: Cell) -> tuple[int, ...]:
    """Start sample of each OFDM symbol's data part (after its CP) within
    one subframe."""
    starts = []
    t = 0
    for _slot in range(2):
        for cp in cell.cp_lengths:
            t += cp
            starts.append(t)
            t += cell.nfft
    assert t == cell.sf_len
    return tuple(starts)


def _demod_mat(cell: Cell):
    """Fused demodulation DFT operator [nfft, n_sc]: only the USED bins
    (DC skipped, fftshift grid order baked into the column order) at
    1/sqrt(nfft) scale. One tall MXU matmul instead of a 2-stage
    Cooley-Tukey whose [16,16] stage pads to the 128x128 MXU tile (8x
    FLOP waste).

    Built ON DEVICE from iota arithmetic — a multi-MB numpy constant
    baked into the jit bloats the serialized HLO the axon relay must
    compile and ship (the r3 turbo_pallas._tiled_maps lesson). The
    naive build would still cos/sin all nfft*n_sc elements (~28 ms
    marginal on-device); instead the row index factors as
    r = r1 + 16*r2, so W^(r*b) = W^(r1*b) * V^(r2*b) with
    V = W^16 = exp(-2j*pi/(nfft/16)) — the full operator is a
    broadcast complex product of a [16, n_sc] and a [nfft/16, n_sc]
    table (~170k transcendentals, then pure VPU multiplies). Integer
    phase indices are reduced mod the period BEFORE float conversion,
    keeping trig arguments in [0, 2pi) at full f32 precision."""
    import jax.numpy as jnp  # traced context

    nfft, half = cell.nfft, cell.n_sc // 2
    n1 = 16 if nfft % 16 == 0 else 1
    n2 = nfft // n1
    bins = jnp.concatenate([
        jnp.arange(nfft - half, nfft, dtype=jnp.int32),
        jnp.arange(1, half + 1, dtype=jnp.int32),
    ])[None, :]
    f32 = jnp.float32
    r1 = jnp.arange(n1, dtype=jnp.int32)[:, None]
    r2 = jnp.arange(n2, dtype=jnp.int32)[:, None]
    p1 = (-2.0 * np.pi / nfft) * ((r1 * bins) % nfft).astype(f32)
    p2 = (-2.0 * np.pi / n2) * ((r2 * bins) % n2).astype(f32)
    scale = np.float32(1.0 / np.sqrt(nfft))
    ar, ai = jnp.cos(p1) * scale, jnp.sin(p1) * scale  # [n1, n_sc]
    cr, ci = jnp.cos(p2), jnp.sin(p2)                  # [n2, n_sc]
    mr = (cr[:, None, :] * ar[None, :, :]
          - ci[:, None, :] * ai[None, :, :]).reshape(nfft, -1)
    mi = (cr[:, None, :] * ai[None, :, :]
          + ci[:, None, :] * ar[None, :, :]).reshape(nfft, -1)
    return mr, mi


@functools.lru_cache(maxsize=1)
def _demod_precision():
    """MXU pass count for the demod DFT: 'high' (3-pass bf16,
    f32-equivalent for this dynamic range) unless overridden. 1-pass
    'default' costs ~2 dB EVM at 64QAM (fft.py header note) — not
    acceptable at the mcs28 operating point."""
    name = os.environ.get("SRSUE_TPU_FFT_PRECISION", "high").upper()
    return getattr(jax.lax.Precision, name)


def demodulate(cell: Cell, sf_samples: jnp.ndarray) -> jnp.ndarray:
    """Time-domain subframe(s) -> resource grid.

    [..., sf_len] complex -> [..., n_sym_sf, n_sc] complex.
    """
    nfft = cell.nfft
    sym_td = jnp.stack(
        [sf_samples[..., s : s + nfft] for s in symbol_starts(cell)], axis=-2
    )
    if _fft._use_matmul():
        # single fused DFT-select matmul on the MXU ((real, imag) pairs:
        # complex64 matmul/transposes are UNIMPLEMENTED on axon)
        mr, mi = _demod_mat(cell)
        dot = functools.partial(jnp.matmul, precision=_demod_precision())
        xr = jnp.real(sym_td).astype(jnp.float32)
        xi = jnp.imag(sym_td).astype(jnp.float32)
        yr = dot(xr, mr) - dot(xi, mi)
        yi = dot(xr, mi) + dot(xi, mr)
        return jax.lax.complex(yr, yi)
    sym_fd = _fft.fft(sym_td, axis=-1) * (1.0 / np.sqrt(nfft))
    half = cell.n_sc // 2
    # sc 0..half-1 <- bins nfft-half.. ; sc half.. <- bins 1..half
    neg = sym_fd[..., nfft - half :]
    pos = sym_fd[..., 1 : half + 1]
    return jnp.concatenate([neg, pos], axis=-1).astype(jnp.complex64)


def modulate_np(cell: Cell, grid: np.ndarray) -> np.ndarray:
    """Host-numpy OFDM modulator twin (eNB-side waveform generation —
    keeps test-vector creation off the device entirely)."""
    nfft = cell.nfft
    n_sym = cell.n_sym_sf
    half = cell.n_sc // 2
    lead = grid.shape[:-2]
    fd = np.zeros(lead + (n_sym, nfft), dtype=np.complex64)
    fd[..., 1 : half + 1] = grid[..., half:]
    fd[..., nfft - half :] = grid[..., :half]
    td = np.fft.ifft(fd, axis=-1).astype(np.complex64) * np.sqrt(nfft)
    pieces = []
    cps = list(cell.cp_lengths) * 2
    for s in range(n_sym):
        cp = cps[s]
        sym = td[..., s, :]
        pieces.append(sym[..., nfft - cp :])
        pieces.append(sym)
    return np.concatenate(pieces, axis=-1).astype(np.complex64)


def demodulate_np(cell: Cell, sf_samples: np.ndarray) -> np.ndarray:
    """Host-numpy OFDM demodulator twin (reference cross-check in tests)."""
    nfft = cell.nfft
    sym_td = np.stack(
        [sf_samples[..., s : s + nfft] for s in symbol_starts(cell)], axis=-2
    )
    sym_fd = np.fft.fft(sym_td, axis=-1) / np.sqrt(nfft)
    half = cell.n_sc // 2
    return np.concatenate(
        [sym_fd[..., nfft - half :], sym_fd[..., 1 : half + 1]], axis=-1
    ).astype(np.complex64)


def modulate(cell: Cell, grid: jnp.ndarray) -> jnp.ndarray:
    """Resource grid -> time-domain subframe (the eNB-side dual, used for
    test-vector generation and the UL chain shape).

    [..., n_sym_sf, n_sc] complex -> [..., sf_len] complex.
    """
    nfft = cell.nfft
    n_sym = cell.n_sym_sf
    half = cell.n_sc // 2
    lead = grid.shape[:-2]
    zdc = jnp.zeros(lead + (n_sym, 1), dtype=jnp.complex64)
    zguard = jnp.zeros(lead + (n_sym, nfft - cell.n_sc - 1), dtype=jnp.complex64)
    fd = jnp.concatenate(
        [zdc, grid[..., half:], zguard, grid[..., :half]], axis=-1
    ).astype(jnp.complex64)
    td = _fft.ifft(fd, axis=-1) * np.sqrt(nfft)

    pieces = []
    cps = list(cell.cp_lengths) * 2
    for s in range(n_sym):
        cp = cps[s]
        sym = td[..., s, :]
        pieces.append(sym[..., nfft - cp :])
        pieces.append(sym)
    return jnp.concatenate(pieces, axis=-1).astype(jnp.complex64)
