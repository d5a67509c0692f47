"""FFT backend for the OFDM chain.

TPU note: XLA lowers the FFT custom call on TPU to a generic radix
implementation that is far from the hardware's speed of light for the
small-N batched FFTs LTE needs (128..2048 points): measured 26 ms for
256 subframes x 14 symbols of 2048-point FFTs on v5e — as large as the
whole 8-iteration turbo decode is per iteration. The MXU path expresses
a two-stage Cooley-Tukey factorization N = N1*N2 as two dense DFT
matmuls + a twiddle multiply, which runs on the systolic array and fuses
with neighboring ops (measured ~6x faster at the flagship shape).

Implementation constraints (axon TPU runtime):
  * complex64 transposes/gathers are UNIMPLEMENTED -> the whole matmul
    path carries (real, imag) float32 pairs and only forms complex at
    the boundary (`jax.lax.complex`).
  * matmuls run at HIGHEST precision (3-pass bf16 = f32-equivalent);
    default bf16 precision costs ~2 dB EVM at 64QAM which is not
    acceptable for the mcs28 operating point.

fft()/ifft() pick the native jnp.fft implementation on CPU (fast,
exact) and the matmul path on TPU — both bit-compatible within f32
tolerance (pinned by tests/test_modulation_ofdm.py). Set
SRSUE_TPU_MATMUL_FFT=0 to force the native XLA FFT on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _factor(n: int) -> tuple[int, int]:
    """Prefer a 128 factor (full MXU K/N dims); else split near-square."""
    if n % 128 == 0 and n // 128 >= 2:
        return n // 128, 128
    n1 = 1 << (int(np.log2(n)) // 2)
    while n % n1:
        n1 >>= 1
    return n1, n // n1


@functools.lru_cache(maxsize=64)
def _dft_mat(n: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    m = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    return m.real.astype(np.float32), m.imag.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _twiddle(n1: int, n2: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    a = np.arange(n1)[:, None] * np.arange(n2)[None, :]
    m = np.exp(sign * 2j * np.pi * a / (n1 * n2))
    return m.real.astype(np.float32), m.imag.astype(np.float32)


def _cmatmul_ri(xr, xi, m: tuple[np.ndarray, np.ndarray]):
    """Complex [..., k] @ [k, n] on (real, imag) pairs via 4 real matmuls
    at HIGHEST precision (keeps the MXU busy, f32-accurate)."""
    mr = jnp.asarray(m[0])
    mi = jnp.asarray(m[1])
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    rr = dot(xr, mr) - dot(xi, mi)
    ri = dot(xr, mi) + dot(xi, mr)
    return rr, ri


def _ct_ri(xr, xi, n: int, sign: float):
    """Two-stage Cooley-Tukey DFT along the last axis, (real, imag) f32
    pairs throughout (no complex intermediates -> no complex transposes)."""
    n1, n2 = _factor(n)
    if n1 == 1:
        return _cmatmul_ri(xr, xi, _dft_mat(n, sign))
    lead = xr.shape[:-1]
    # decimation-in-time over rows: x[a1*n2 + a2] as [a1 in n1, a2 in n2]
    xr = xr.reshape(lead + (n1, n2))
    xi = xi.reshape(lead + (n1, n2))
    # stage 1: DFT over the a1 axis (stride-n2 samples)
    yr, yi = _cmatmul_ri(jnp.swapaxes(xr, -1, -2), jnp.swapaxes(xi, -1, -2),
                         _dft_mat(n1, sign))
    # y is [..., a2, k1]; twiddle W^(k1*a2)
    twr, twi = _twiddle(n1, n2, sign)
    twr = jnp.asarray(twr.T)  # [n2, n1]
    twi = jnp.asarray(twi.T)
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # stage 2: DFT over the a2 axis: [..., k1, a2] @ [n2, n2]
    zr = jnp.swapaxes(zr, -1, -2)
    zi = jnp.swapaxes(zi, -1, -2)
    wr, wi = _cmatmul_ri(zr, zi, _dft_mat(n2, sign))
    # output X[k1 + n1*k2] lives at [k1, k2] -> natural order needs
    # [k2-major]: transpose then flatten
    wr = jnp.swapaxes(wr, -1, -2).reshape(lead + (n,))
    wi = jnp.swapaxes(wi, -1, -2).reshape(lead + (n,))
    return wr, wi


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return _dispatch(x, axis, -1.0, jnp.fft.fft)


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = x.shape[axis]
    y = _dispatch(x, axis, +1.0, jnp.fft.ifft)
    if _use_matmul():
        y = y / n  # matmul path computes the unnormalized inverse DFT
    return y


@functools.lru_cache(maxsize=1)
def _use_matmul() -> bool:
    """MXU matmul-DFT on TPU (default there), native FFT elsewhere."""
    env = os.environ.get("SRSUE_TPU_MATMUL_FFT")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _dispatch(x, axis, sign, native):
    if not _use_matmul():
        return native(x, axis=axis).astype(jnp.complex64)
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = _ct_ri(xr, xi, x.shape[-1], sign)
    y = jax.lax.complex(yr, yi)
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y
