"""BLER-vs-SNR sweep harness (SURVEY.md §7.9) — the link-level
verification tool the reference lacks in-tree (srsLTE upstream keeps
golden-IQ tests out of this repo; ue_itf tests need live RF).

Sweeps the full TX->AWGN->RX chain per (cell, mcs) bucket over an SNR
grid, batched: every SNR point is one device batch of independent
subframes, so a whole waterfall curve is a handful of jit calls.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import chest, enb_tx, equalize, ofdm, ra
from .cell import Cell
from .pdsch import PdschCodec
from ..utils.jaxutil import to_device_complex, to_host


@dataclass
class BlerPoint:
    snr_db: float
    bler: float
    n_blocks: int
    mean_iters: float


def sweep_pdsch(
    cell: Cell,
    mcs: int,
    snrs_db: list[float],
    n_sf_per_point: int = 8,
    subframe: int = 1,
    rnti: int = 0x1234,
    n_turbo_iters: int = 8,
    seed: int = 0,
    tm2: bool = False,
) -> list[BlerPoint]:
    rng = np.random.default_rng(seed)
    grant = ra.dl_grant(cell.n_prb, mcs)
    codec = PdschCodec(cell, grant, rnti, subframe, cfi=1,
                       n_turbo_iters=n_turbo_iters)

    # one TX batch reused across SNR points (noise is redrawn per point)
    payloads = np.stack([
        rng.integers(0, 2, grant.tbs).astype(np.uint8)
        for _ in range(n_sf_per_point)
    ])
    td = np.stack([
        enb_tx.to_waveform(
            cell, enb_tx.build_pdsch_subframe(cell, codec, pl, tm2=tm2)
        )[0 if not tm2 else 0]
        for pl in payloads
    ])
    if tm2:
        td = td + np.stack([
            enb_tx.to_waveform(
                cell, enb_tx.build_pdsch_subframe(cell, codec, pl, tm2=True)
            )[1]
            for pl in payloads
        ])
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc

    @jax.jit
    def rx(iq):
        grid = ofdm.demodulate(cell, iq)
        h, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
        x_eq, nv_eff = equalize.zf(
            codec.extract_re(grid), codec.extract_re(h), nvar
        )
        _, tb_ok, _, iters = codec.decode(x_eq, nv_eff)
        return (
            jnp.sum(tb_ok.astype(jnp.float32)),
            jnp.mean(iters.astype(jnp.float32)),
        )

    out = []
    for snr in snrs_db:
        noisy, _ = enb_tx.awgn(rng, td, snr, signal_power=p_sig)
        n_ok, iters = rx(to_device_complex(noisy))
        n_ok = float(to_host(n_ok))
        out.append(
            BlerPoint(
                snr_db=snr,
                bler=1.0 - n_ok / n_sf_per_point,
                n_blocks=n_sf_per_point,
                mean_iters=float(to_host(iters)),
            )
        )
    return out


def waterfall_snr(points: list[BlerPoint], target: float = 0.1) -> float | None:
    """Interpolated SNR where BLER crosses `target` (the waterfall)."""
    for a, b in zip(points, points[1:]):
        if a.bler >= target >= b.bler:
            if a.bler == b.bler:
                return a.snr_db
            t = (a.bler - target) / (a.bler - b.bler)
            return a.snr_db + t * (b.snr_db - a.snr_db)
    return None
