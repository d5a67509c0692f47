"""Cold-start E2E: multi-subframe eNB waveform -> ArrayRadio -> cell
search -> MIB -> PCFICH/PDCCH blind SI search -> SIB decode. This is the
reference's "cell_search -> sync_sfn -> steady state" bring-up
(phch_recv.cc:266-375) + ue_itf_test_sib1 pattern, fully hermetic."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.phy import chest, control, dci, enb_tx, equalize, ofdm, pbch, ra
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.pdsch import PdschCodec
from srsue_tpu.phy.receiver import Receiver
from srsue_tpu.radio import ArrayRadio
from srsue_tpu.mac.mac import SI_RNTI
from srsue_tpu.utils.jaxutil import to_host


def _build_downlink(cell, n_frames=3, sib_payloads=None, snr_db=15, seed=0,
                    mcs_si=3, sfn0=0, crnti=0, mcs_data=8, data_sfs=(3,)):
    """Generate n_frames of a live cell: CRS everywhere, PSS/SSS in sf0/5,
    PBCH in sf0, SIB PDSCH (DCI 1A on SI-RNTI) in sf5, and optional
    C-RNTI data PDSCH in `data_sfs`."""
    rng = np.random.default_rng(seed)
    sib_payloads = sib_payloads or {}
    grant = ra.dl_grant(cell.n_prb, mcs_si)
    data_grant = ra.dl_grant(cell.n_prb, mcs_data)
    cfi = 2
    sfs = []
    for f in range(n_frames):
        sfn = sfn0 + f
        for sf in range(10):
            grid = enb_tx.empty_grid(cell)
            enb_tx.add_crs(cell, grid, sf, 0)
            enb_tx.add_sync(cell, grid, sf)
            control.pcfich_map(cell, grid, sf, cfi)
            if crnti and sf in data_sfs:
                dcodec = PdschCodec(cell, data_grant, crnti, sf, cfi)
                dd = dci.Dci1A(riv=dci.riv_encode(cell.n_prb, 0, cell.n_prb),
                               mcs=mcs_data, harq_pid=0, ndi=True, rv=0, tpc=0)
                n_cce, _ = control.pdcch_geometry(cell, cfi)
                cands = control.search_space_candidates(n_cce, crnti, sf)
                start, l = [c for c in cands if c[1] >= 4][0]
                control.pdcch_map(cell, grid, sf, cfi,
                                  dci.pack_1a(cell.n_prb, dd), crnti, start, l)
                pl = rng.integers(0, 2, data_grant.tbs).astype(np.uint8)
                dcodec.map_to_grid(grid, dcodec.encode_symbols(pl))
            if sf == 0:
                mib = pbch.Mib(cell.n_prb, "normal", 1.0, sfn)
                cw = pbch.encode(cell, mib, n_ports=1)
                pbch.map_to_grid(cell, grid, pbch.frame_symbols(cell, cw, sfn % 4))
            if sf == 5 and (sfn % 2 == 0) and sib_payloads:
                # SI window: DCI 1A on SI-RNTI + PDSCH with the SIB
                codec = PdschCodec(cell, grant, SI_RNTI, sf, cfi)
                payload = sib_payloads.get(f % len(sib_payloads), None)
                if payload is not None:
                    d = dci.Dci1A(riv=dci.riv_encode(cell.n_prb, 0, cell.n_prb),
                                  mcs=mcs_si, harq_pid=0, ndi=False, rv=0, tpc=0)
                    control.pdcch_map(cell, grid, sf, cfi,
                                      dci.pack_1a(cell.n_prb, d), SI_RNTI, 0, 4)
                    bits = np.zeros(grant.tbs, np.uint8)
                    pb = np.unpackbits(np.frombuffer(payload, np.uint8))
                    bits[: len(pb)] = pb
                    codec.map_to_grid(grid, codec.encode_symbols(bits))
            sfs.append(enb_tx.to_waveform(cell, [grid])[0])
    td = np.concatenate(sfs)
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, nv = enb_tx.awgn(rng, td, snr_db, signal_power=p_sig)
    return noisy, grant, cfi


@pytest.mark.parametrize("cell_id,n_prb", [(123, 25), (47, 6)])
def test_cold_start_to_mib(cell_id, n_prb):
    cell = Cell(n_prb=n_prb, cell_id=cell_id)
    td, _, _ = _build_downlink(cell, n_frames=3, snr_db=12, sfn0=4)
    # random start offset: receiver must find timing itself
    lead = np.zeros(1234, np.complex64)
    radio = ArrayRadio(np.concatenate([lead, td]), cell.srate)
    rx = Receiver(radio)
    found = rx.cell_search()
    assert found is not None, "cell search failed"
    got_id, is_sf5, t_off, cfo = found
    assert got_id == cell_id
    got = rx.decode_mib_stream(got_id, t_off, cfo, is_sf5)
    assert got is not None, "MIB decode failed"
    got_cell, mib, t_next = got
    assert got_cell.n_prb == n_prb
    assert mib.sfn >= 4


def test_cold_start_with_cfo():
    cell = Cell(n_prb=25, cell_id=200)
    td, _, _ = _build_downlink(cell, n_frames=3, snr_db=12)
    n = np.arange(len(td))
    cfo_true = 0.22  # fractional CFO in subcarrier units
    decim = cell.nfft / 128
    td = (td * np.exp(2j * np.pi * cfo_true * n / cell.nfft)).astype(np.complex64)
    radio = ArrayRadio(td, cell.srate)
    rx = Receiver(radio)
    found = rx.cell_search()
    assert found is not None
    got_id, is_sf5, t_off, cfo = found
    assert got_id == 200
    got = rx.decode_mib_stream(got_id, t_off, cfo, is_sf5)
    assert got is not None, f"MIB failed under CFO (est {cfo:.3f})"


def test_cold_start_full_si_acquisition():
    """The full minimum slice (SURVEY.md §7.4 exit criterion): raw IQ ->
    cell found -> MIB -> blind SI-RNTI PDCCH search -> SIB PDSCH decode."""
    cell = Cell(n_prb=25, cell_id=77)
    enb = EnbStack()
    sib1 = enb.make_sib1()
    td, grant, cfi = _build_downlink(
        cell, n_frames=4, sib_payloads={0: sib1, 1: sib1}, snr_db=15
    )
    radio = ArrayRadio(td, cell.srate)
    rx = Receiver(radio)
    found = rx.cell_search()
    assert found is not None
    got_id, is_sf5, t_off, cfo = found
    got = rx.decode_mib_stream(got_id, t_off, cfo, is_sf5)
    assert got is not None
    got_cell, mib, t_next = got
    assert got_cell.n_prb == 25

    # steady-state: walk subframes until an SI subframe (sf5, even SFN).
    # t_next points at the start of the subframe-0 where the MIB was
    # decoded, so the stream resumes exactly at (mib.sfn, sf 0).
    decoded_sib = None
    for tti, iq in rx.subframes(got_cell, t_next, cfo, mib.sfn, 0, n=20):
        sf = tti % 10
        if sf != 5 or (tti // 10) % 2 != 0:
            continue
        grid = ofdm.demodulate(got_cell, iq)
        h, nvar, _ = chest.estimate(got_cell, grid, sf, port=0)
        g_eq, nv_eff = equalize.zf(grid, h, nvar)
        cfi_dev, _ = control.pcfich_decode(got_cell, g_eq, nv_eff, sf)
        got_cfi = int(to_host(cfi_dev))
        assert got_cfi == cfi
        dci_len = dci.size_0_1a(got_cell.n_prb)
        hits = control.pdcch_blind_decode(
            got_cell, g_eq, nv_eff, sf, got_cfi, SI_RNTI, dci_len,
            ue_specific=False,
        )
        if not hits:
            continue
        d = dci.unpack_0_1a(got_cell.n_prb, hits[0][2])
        g = dci.dci1a_to_grant(got_cell, d)
        codec = PdschCodec(got_cell, g, SI_RNTI, sf, got_cfi)
        x_eq, nv = equalize.zf(
            codec.extract_re(grid), codec.extract_re(h), nvar
        )
        payload, tb_ok, _, _ = codec.decode(x_eq, nv)
        if bool(to_host(tb_ok).all()):
            bits = to_host(payload).astype(np.uint8).reshape(-1)
            decoded_sib = np.packbits(bits).tobytes()[: len(sib1)]
            break
    assert decoded_sib == sib1, "SIB1 decode through blind SI search failed"
