"""Delay-spread-adaptive chest denoiser (VERDICT r4 item 8).

The pilot-axis FIR must back off when the channel's frequency
selectivity makes its bias dominate: estimation MSE with the adaptive
selector must (a) beat raw LS on a flat channel (denoising retained)
and (b) beat the FIXED 3-tap filter on a long-delay-spread channel
(back-off works), never losing to the best fixed choice by more than
the selector's estimation noise."""

import numpy as np
import pytest

import srsue_tpu.phy.chest as chest
from srsue_tpu.phy import enb_tx, regrid
from srsue_tpu.phy.cell import Cell


def _mse(cell, taps, snr_db, seed, adapt, denoise=True, n_sf=8):
    """Mean-squared channel-estimation error at the CRS symbols for a
    static multipath channel, with the denoiser stages configured."""
    import jax.numpy as jnp

    old = (chest._DENOISE, chest._ADAPT)
    chest._DENOISE, chest._ADAPT = denoise, adapt
    try:
        rng = np.random.default_rng(seed)
        subframe = 2
        grid = enb_tx.empty_grid(cell)
        enb_tx.add_crs(cell, grid, subframe, 0)
        # fill data REs with random QPSK so RSSI/noise paths see
        # realistic energy
        empty = grid == 0
        grid[empty] = ((rng.integers(0, 2, empty.sum()) * 2 - 1)
                       + 1j * (rng.integers(0, 2, empty.sum()) * 2 - 1)
                       ).astype(np.complex64) / np.sqrt(2)
        # true frequency response over the used subcarriers
        hf = np.fft.fft(taps, cell.nfft)
        half = cell.n_sc // 2
        bins = np.concatenate([np.arange(cell.nfft - half, cell.nfft),
                               np.arange(1, half + 1)])
        h_true = hf[bins].astype(np.complex64)  # [n_sc]
        faded = grid * h_true[None, :]
        sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
        errs = []
        for _ in range(n_sf):
            noisy = faded + sigma * (
                rng.standard_normal(grid.shape)
                + 1j * rng.standard_normal(grid.shape)
            ).astype(np.complex64)
            h, nvar, _ = chest.estimate(cell, jnp.asarray(noisy), subframe)
            h_np = np.asarray(h)
            syms = regrid.crs_symbols(cell, 0)
            errs.append(np.mean(np.abs(h_np[list(syms)] - h_true) ** 2))
        return float(np.mean(errs))
    finally:
        chest._DENOISE, chest._ADAPT = old


def test_adaptive_keeps_flat_channel_denoising():
    cell = Cell(n_prb=25, cell_id=31)
    flat = np.array([1.0], np.complex64)
    raw = _mse(cell, flat, 10.0, 0, adapt=False, denoise=False)
    fixed3 = _mse(cell, flat, 10.0, 0, adapt=False)
    adaptive = _mse(cell, flat, 10.0, 0, adapt=True)
    # denoising works, and the adaptive pick (5-tap on flat) is at
    # least as good as the fixed 3-tap
    assert fixed3 < 0.6 * raw, (fixed3, raw)
    assert adaptive <= fixed3 * 1.05, (adaptive, fixed3)


def test_adaptive_backs_off_on_long_delay_spread():
    """Channel with delay spread ~nfft/8 (ripple period ~8 subcarriers,
    comparable to the pilot spacing): the fixed 3-tap FIR's bias
    dominates; the selector must fall back toward raw LS."""
    cell = Cell(n_prb=25, cell_id=31)
    taps = np.zeros(64, np.complex64)  # nfft = 512 for 25 PRB
    taps[0], taps[40] = 1.0, 0.8
    taps /= np.sqrt(np.sum(np.abs(taps) ** 2))
    raw = _mse(cell, taps, 20.0, 1, adapt=False, denoise=False)
    fixed3 = _mse(cell, taps, 20.0, 1, adapt=False)
    adaptive = _mse(cell, taps, 20.0, 1, adapt=True)
    assert fixed3 > 2.0 * raw, (fixed3, raw)  # the bias really dominates
    assert adaptive < 0.6 * fixed3, (adaptive, fixed3)
    assert adaptive <= 1.3 * raw, (adaptive, raw)


def test_adaptive_mid_selectivity_picks_three_tap():
    """Moderate delay spread: 3-tap should win over both raw and 5-tap,
    and the adaptive result should track it."""
    cell = Cell(n_prb=25, cell_id=31)
    taps = np.zeros(9, np.complex64)
    taps[0], taps[8] = 1.0, 0.6
    taps /= np.sqrt(np.sum(np.abs(taps) ** 2))
    raw = _mse(cell, taps, 12.0, 2, adapt=False, denoise=False)
    fixed3 = _mse(cell, taps, 12.0, 2, adapt=False)
    adaptive = _mse(cell, taps, 12.0, 2, adapt=True)
    assert fixed3 < raw, (fixed3, raw)
    assert adaptive <= fixed3 * 1.1, (adaptive, fixed3)
