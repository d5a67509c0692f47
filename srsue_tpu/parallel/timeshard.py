"""Time-block sharding of the sample stream with halo exchange
(SURVEY.md §5 'long-context' mapping + BASELINE north star: "shard ...
time-blocks across a pod slice, exchanging overlap-save/CP boundary
samples ... via collectives").

The RX front end is a streaming filter chain: the decimating FIR needs
`ntaps-1` samples of lookahead across block boundaries, so each device
pulls a halo from its RIGHT neighbor with `jax.lax.ppermute` inside a
`shard_map` — the ring-permute pattern (SNIPPETS.md) standing in for the
reference's 2-subframe sliding worker buffer (phch_worker.cc:69).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..phy import ofdm, sync
from ..phy.cell import Cell


def sharded_frontend(cell: Cell, mesh: Mesh, n_sf_per_dev: int,
                     decim: int = 1, cfo: float = 0.0, axis: str = "time"):
    """Builds a jitted sharded front end: the IQ stream, sharded in time
    blocks of n_sf_per_dev subframes per device, is CFO-corrected,
    (optionally) FIR-decimated with right-neighbor halo exchange, and
    OFDM-demodulated — each device produces the grids of its own block.

    Returns (fn, in_sharding, out_cell): fn(iq [n_dev*block]) ->
    grids [n_dev*n_sf, n_sym, n_sc_eff]; out_cell describes the grid
    geometry after decimation (== cell when decim == 1).
    """
    n_dev = mesh.shape[axis]
    taps = sync._lpf_taps(decim) if decim > 1 else np.array([1.0], np.float32)
    halo = len(taps)  # lookahead needed across the boundary
    block = n_sf_per_dev * cell.sf_len
    out_cell = Cell(
        n_prb={1: cell.n_prb}.get(decim, 6), cell_id=cell.cell_id
    ) if decim > 1 else cell

    def local(x):  # x: [1, block] local time block
        x = x[0]
        # halo: first `halo` samples of the RIGHT neighbor's block
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        head_r = jax.lax.ppermute(
            jnp.real(x[:halo]), axis, perm
        )
        head_i = jax.lax.ppermute(jnp.imag(x[:halo]), axis, perm)
        idx = jax.lax.axis_index(axis)
        head = jax.lax.complex(head_r, head_i)
        # last device has no right neighbor: zero halo (end of capture)
        head = jnp.where(idx == n_dev - 1, jnp.zeros_like(head), head)
        ext = jnp.concatenate([x, head])
        if cfo:
            # continuous-phase CFO correction: rotate with the GLOBAL time
            # index so phase is continuous across shard boundaries
            t0 = idx * block
            n = jnp.arange(block + halo) + t0
            ph = -2.0 * np.pi * cfo * n / cell.nfft
            ext = ext * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        if decim > 1:
            low = sync.decimate(ext, decim)[: block // decim]
            sf = low.reshape(n_sf_per_dev, out_cell.sf_len)
        else:
            sf = ext[:block].reshape(n_sf_per_dev, cell.sf_len)
        grids = ofdm.demodulate(out_cell, sf)
        return grids[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )
    out_shape = (out_cell.n_sym_sf, out_cell.n_sc)

    @jax.jit
    def run(iq):
        blocks = iq.reshape(n_dev, block)
        return fn(blocks).reshape(n_dev * n_sf_per_dev, *out_shape)

    in_shard = NamedSharding(mesh, P(axis))
    return run, in_shard, out_cell
