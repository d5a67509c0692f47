"""JAX backend shims.

The axon TPU PJRT runtime rejects several complex64 paths that full
backends support (all established empirically, see
.claude/skills/verify/SKILL.md):

* gathers/scatters on complex64 operands -> paired real/imag ops here;
* device->host copies of complex64 arrays -> ``to_host_complex``;
* host->device transfers of complex64 arrays -> ``to_device_complex``
  (the transfer itself returns UNIMPLEMENTED; float32 pairs are fine).

XLA fuses the split/recombine, so on full backends this costs nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_host_complex(x: jnp.ndarray) -> np.ndarray:
    """Device complex array -> host numpy complex64 via float32 transfers."""
    re = np.asarray(jnp.real(x), dtype=np.float32)
    im = np.asarray(jnp.imag(x), dtype=np.float32)
    return (re + 1j * im).astype(np.complex64)


def to_host(x) -> np.ndarray:
    """Device->host transfer that only ever moves float32 across the wire.

    The axon runtime's D2H path rejects complex64 and hangs on uint8/int32
    (empirically; float32 is reliable), so every result is cast to f32 on
    device and restored on the host. Exact for integers < 2^24 — all our
    integer results are bits, iteration counts, or small indices."""
    if jnp.iscomplexobj(x):
        return to_host_complex(x)
    dt = x.dtype
    if dt == jnp.float32:
        return np.asarray(x)
    return np.asarray(x.astype(jnp.float32)).astype(dt)


def iq_pairs(x: np.ndarray) -> np.ndarray:
    """Host complex array -> float32 ``[..., 2]`` (re, im) pairs — the only
    IQ layout that crosses the host->device boundary safely everywhere."""
    out = np.empty(x.shape + (2,), np.float32)
    out[..., 0] = x.real
    out[..., 1] = x.imag
    return out


def iq_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Device float32 ``[..., 2]`` pairs -> complex64 (inside or outside
    jit; eagerly this is a cheap on-device op)."""
    return jax.lax.complex(x[..., 0], x[..., 1])


def to_device_complex(x: np.ndarray) -> jnp.ndarray:
    """Host complex array -> device complex64 without a complex transfer.

    The axon runtime's H2D path rejects complex64 outright (UNIMPLEMENTED,
    discovered empirically); real/imag go across as one float32 array and
    are combined on device."""
    return iq_complex(jnp.asarray(iq_pairs(np.asarray(x))))


def cgather(x: jnp.ndarray, idx, axis: int = -1) -> jnp.ndarray:
    """x[..., idx] along `axis` that is safe for complex dtypes."""
    if not jnp.iscomplexobj(x):
        return jnp.take(x, idx, axis=axis)
    re = jnp.take(jnp.real(x), idx, axis=axis)
    im = jnp.take(jnp.imag(x), idx, axis=axis)
    return jax.lax.complex(re, im)


def cscatter_set(x: jnp.ndarray, idx, vals: jnp.ndarray) -> jnp.ndarray:
    """x.at[..., idx].set(vals) on the last axis, complex-safe."""
    if not jnp.iscomplexobj(x):
        return x.at[..., idx].set(vals)
    re = jnp.real(x).at[..., idx].set(jnp.real(vals))
    im = jnp.imag(x).at[..., idx].set(jnp.imag(vals))
    return jax.lax.complex(re, im)
