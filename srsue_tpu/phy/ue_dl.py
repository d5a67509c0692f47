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
    grants: list  # DL grants found in batch element 0 (all formats)
    metrics: dict
    # per-batch-element blind-search hits: [(format, dci_obj), ...]
    hits_per_elem: list = None
    # every grant of element 0 decoded: [(grant, payload, tb_ok, iters)]
    decoded: list = None


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
            if cell.n_ports == 2:
                # TM2 cell: SFBC control region (REG-pair combining;
                # the Phy facade's path, control.sfbc_equalize_control)
                h1, _, _ = chest.estimate(cell, grid, subframe, port=1)
                g_eq, nv_eff = control.sfbc_equalize_control(
                    cell, grid, h, h1, nvar)
            else:
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

    # --- stage 3: batched blind search (all elements, all formats) --------
    @functools.lru_cache(maxsize=64)
    def _blind_search(self, subframe: int, cfi: int, rnti: int,
                      ue_specific: bool, formats: tuple):
        """One jitted program decoding every (candidate x format x batch
        element) hypothesis — the batch-first replacement of the
        reference's per-TTI find_dl_dci_type (phch_worker.cc:278-326)."""
        cell = self.cell
        sizes = {f: self._dci_len(f) for f in formats}

        @jax.jit
        def run(g_eq, nv_eff):
            out = {}
            for f, n in sizes.items():
                out[f] = control.pdcch_blind_batch(
                    cell, g_eq, nv_eff, subframe, cfi, rnti, n,
                    ue_specific=ue_specific,
                )
            return out

        return run

    def _dci_len(self, fmt: str) -> int:
        n_rb = self.cell.n_prb
        return {"0_1a": dci.size_0_1a(n_rb), "1": dci.size_1(n_rb),
                "1c": dci.size_1c(n_rb)}[fmt]

    def _unpack(self, fmt: str, bits: np.ndarray):
        if fmt == "0_1a":
            return dci.unpack_0_1a(self.cell.n_prb, bits)
        if fmt == "1":
            return dci.unpack_1(self.cell.n_prb, bits)
        return dci.unpack_1c(self.cell.n_prb, bits)

    def _to_dl_grant(self, fmt: str, d):
        if isinstance(d, dci.Dci1A):
            return dci.dci1a_to_grant(self.cell, d)
        if isinstance(d, dci.Dci1):
            return dci.dci1_to_grant(self.cell, d)
        if isinstance(d, dci.Dci1C):
            return dci.dci1c_to_grant(self.cell, d)
        return None

    # --- full control+data subframe processing ----------------------------
    def process(
        self,
        iq: np.ndarray,
        subframe: int,
        rnti: int,
        dci_len: int | None = None,
        ue_specific: bool = True,
        formats: tuple = ("0_1a",),
    ) -> DlResult:
        """Process one (batch of) subframe(s): PCFICH -> batched PDCCH
        blind search over ALL batch elements and DCI formats -> PDSCH
        decode of every DL grant found in element 0.

        formats: DCI sizes to blind-search, per the reference's per-TM
        breadth (phch_worker.cc:278-326): "0_1a" always; add "1" for
        TM1/TM2 C-RNTI search, "1c" for SI/P/RA-RNTI.
        """
        cell = self.cell
        iq_j = jnp.asarray(iq)
        fe = self._front_end(subframe)
        grid, h, nvar, g_eq, nv_eff, m = fe(iq_j)

        cfi_dev, _ = control.pcfich_decode(cell, g_eq, nv_eff, subframe)
        cfi = int(to_host(cfi_dev).reshape(-1)[0])

        search = self._blind_search(subframe, cfi, rnti, ue_specific,
                                    tuple(formats))
        raw = search(g_eq, nv_eff)

        batched = g_eq.ndim == 3
        B = g_eq.shape[0] if batched else 1
        n_cce, _ = control.pdcch_geometry(cell, cfi)
        cands = control.search_space_candidates(n_cce, rnti, subframe,
                                                ue_specific)
        hits_per_elem: list[list] = [[] for _ in range(B)]
        for f in formats:
            hard, ok = (to_host(x) for x in raw[f])
            if not batched:
                hard, ok = hard[None], ok[None]
            n = self._dci_len(f)
            for b in range(B):
                for start, l, bits in control.blind_hits(
                        cands, hard[b], ok[b], n):
                    hits_per_elem[b].append((f, self._unpack(f, bits)))

        grants = []
        for f, d in hits_per_elem[0]:
            g = self._to_dl_grant(f, d)
            if g is not None:
                grants.append(g)

        metrics = {k: to_host(v) for k, v in m.items()}
        if not grants:
            return DlResult(None, None, None, cfi, [], metrics,
                            hits_per_elem=hits_per_elem, decoded=[])

        decoded = []
        for g in grants:
            decoded.append((g,) + self.decode_pdsch(iq, g, rnti, subframe,
                                                    cfi))
        _, payload, tb_ok, iters = decoded[0]
        return DlResult(payload, tb_ok, iters, cfi, grants, metrics,
                        hits_per_elem=hits_per_elem, decoded=decoded)
