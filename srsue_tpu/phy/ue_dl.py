"""UE downlink subframe processor — the orchestration equivalent of the
reference's per-TTI worker pipeline (``phch_worker::work_imp``,
ue/src/phy/phch_worker.cc:132-243): OFDM demod -> channel estimation ->
equalization -> PCFICH -> PDCCH blind search -> PDSCH decode -> metrics.

Where the reference pipelines subframes across 2-4 RT threads with an
ordered-TX mutex ring (SURVEY.md §2.8), this processor is **batch-first**:
a [batch] axis of independent subframes/carriers rides through one jitted
program per static configuration bucket, and ordering is just array order.

The grant-known inner chain (``decode_pdsch``) is a single pure jitted
function — that is the benchmarked hot path. Control decisions (CFI
value, DCI hits -> grants) surface to the host between jitted stages,
mirroring the PHY->MAC boundary (mac_interface_phy, SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import chest, control, dci, equalize, ofdm, ra
from .cell import Cell, DlGrant
from .pdsch import codec as get_codec
from ..utils.jaxutil import to_host


@dataclass
class DlResult:
    """MAC-facing per-TTI result (the `tb_decoded` + metrics payload)."""

    payload: np.ndarray | None  # [batch, tbs] bits or None if no grant
    tb_ok: np.ndarray | None
    turbo_iters: np.ndarray | None
    cfi: int
    grants: list
    metrics: dict


class UeDl:
    """Per-cell DL receiver with cached jitted stages per config bucket."""

    def __init__(self, cell: Cell, n_turbo_iters: int = 8):
        self.cell = cell
        self.n_turbo_iters = n_turbo_iters

    # --- stage 1: front end (shared by all buckets) -----------------------
    @functools.lru_cache(maxsize=32)
    def _front_end(self, subframe: int):
        cell = self.cell

        @jax.jit
        def fe(iq):
            grid = ofdm.demodulate(cell, iq)
            h, nvar, rsrp = chest.estimate(cell, grid, subframe, port=0)
            g_eq, nv_eff = equalize.zf(grid, h, nvar)
            m = chest.metrics(cell, grid, nvar, rsrp)
            return grid, h, nvar, g_eq, nv_eff, m

        return fe

    # --- stage 2: grant-known PDSCH chain (the hot path) ------------------
    @functools.lru_cache(maxsize=64)
    def _pdsch_chain(self, grant: DlGrant, rnti: int, subframe: int, cfi: int,
                     tm2: bool = False):
        cell = self.cell
        codec = get_codec(cell, grant, rnti, subframe, cfi, self.n_turbo_iters)

        @jax.jit
        def run(iq):
            grid = ofdm.demodulate(cell, iq)
            if tm2:
                # TM2 transmit diversity: per-port chest + SFBC combining
                h0, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
                h1, _, _ = chest.estimate(cell, grid, subframe, port=1)
                y = codec.extract_re(grid)
                x_eq, nv_eff = equalize.alamouti_combine(
                    y, codec.extract_re(h0), codec.extract_re(h1), nvar
                )
            else:
                h, nvar, _ = chest.estimate(cell, grid, subframe, port=0)
                y = codec.extract_re(grid)
                hh = codec.extract_re(h)
                x_eq, nv_eff = equalize.zf(y, hh, nvar)
            payload, tb_ok, blk_ok, iters = codec.decode(x_eq, nv_eff)
            return payload, tb_ok, iters

        return codec, run

    def decode_pdsch(
        self, iq: np.ndarray, grant: DlGrant, rnti: int, subframe: int,
        cfi: int = 1, tm2: bool | None = None,
    ):
        """Grant-known batched PDSCH decode: [batch, sf_len] IQ ->
        (payload [batch, tbs], tb_ok [batch], iters). TM2 defaults on for
        2-port cells (README.md:15 transmission mode parity)."""
        if tm2 is None:
            tm2 = self.cell.n_ports == 2
        _, run = self._pdsch_chain(grant, rnti, subframe, cfi, tm2)
        payload, tb_ok, iters = run(jnp.asarray(iq))
        return to_host(payload), to_host(tb_ok), to_host(iters)

    # --- full control+data subframe processing ----------------------------
    def process(
        self,
        iq: np.ndarray,
        subframe: int,
        rnti: int,
        dci_len: int | None = None,
        ue_specific: bool = True,
    ) -> DlResult:
        """Process one (batch of) subframe(s): PCFICH -> PDCCH blind search
        -> PDSCH decode of the first matching DL grant."""
        cell = self.cell
        iq_j = jnp.asarray(iq)
        fe = self._front_end(subframe)
        grid, h, nvar, g_eq, nv_eff, m = fe(iq_j)

        cfi_dev, _ = control.pcfich_decode(cell, g_eq, nv_eff, subframe)
        cfi = int(to_host(cfi_dev).reshape(-1)[0])

        if dci_len is None:
            dci_len = dci.size_0_1a(cell.n_prb)
        g0 = g_eq[0] if g_eq.ndim == 3 else g_eq
        n0 = nv_eff[0] if nv_eff.ndim == 3 else nv_eff
        hits = control.pdcch_blind_decode(
            cell, g0, n0, subframe, cfi, rnti, dci_len, ue_specific
        )
        grants = []
        for start, l, payload_bits in hits:
            d = dci.unpack_0_1a(cell.n_prb, payload_bits)
            if isinstance(d, dci.Dci1A):
                grants.append(dci.dci1a_to_grant(cell, d))

        metrics = {k: to_host(v) for k, v in m.items()}
        if not grants:
            return DlResult(None, None, None, cfi, [], metrics)

        payload, tb_ok, iters = self.decode_pdsch(
            iq, grants[0], rnti, subframe, cfi
        )
        return DlResult(payload, tb_ok, iters, cfi, grants, metrics)
