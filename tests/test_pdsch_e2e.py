"""End-to-end PDSCH tests: eNB TX -> channel -> OFDM demod -> chest ->
equalize -> demap -> dematch -> turbo decode -> TB CRC. The hermetic
golden-vector layer the reference lacks (SURVEY.md §4 'Implication')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsue_tpu.phy import chest, enb_tx, equalize, ofdm, ra
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.pdsch import PdschCodec


def _run_chain(cell, mcs, subframe, snr_db, seed=0, tm2=False, n_sf=2,
               rv=0, mcs_prb=None, corrupt=False):
    rng = np.random.default_rng(seed)
    grant = ra.dl_grant(cell.n_prb, mcs, rv=rv)
    codec = PdschCodec(cell, grant, rnti=0x1234, subframe=subframe, cfi=1)

    payloads = [rng.integers(0, 2, grant.tbs).astype(np.uint8) for _ in range(n_sf)]
    tds = []
    for pl in payloads:
        grids = enb_tx.build_pdsch_subframe(cell, codec, pl, tm2=tm2)
        ports_td = enb_tx.to_waveform(cell, grids)
        tds.append(np.sum(ports_td, axis=0))  # flat channel: unit gain/port
    td = np.stack(tds)  # [n_sf, sf_len]
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy, nv = enb_tx.awgn(rng, td, snr_db, signal_power=p_sig)
    if corrupt:
        noisy[:, 1000:3000] = 0

    grid_rx = ofdm.demodulate(cell, jnp.asarray(noisy))
    if not tm2:
        h, nvar, rsrp = chest.estimate(cell, grid_rx, subframe, port=0)
        y = codec.extract_re(grid_rx)
        hh = codec.extract_re(h)
        x_eq, nv_eff = equalize.zf(y, hh, nvar)
    else:
        h0, nvar, _ = chest.estimate(cell, grid_rx, subframe, port=0)
        h1, _, _ = chest.estimate(cell, grid_rx, subframe, port=1)
        y = codec.extract_re(grid_rx)
        x_eq, nv_eff = equalize.alamouti_combine(
            y, codec.extract_re(h0), codec.extract_re(h1), nvar
        )
    payload_hat, tb_ok, blk_ok, iters = codec.decode(x_eq, nv_eff)
    return payloads, np.asarray(payload_hat), np.asarray(tb_ok), np.asarray(iters)


def test_pdsch_1p4mhz_qpsk():
    """BASELINE config 1: 1.4 MHz QPSK file-decode."""
    cell = Cell(n_prb=6, cell_id=17)
    payloads, hat, ok, _ = _run_chain(cell, mcs=5, subframe=1, snr_db=20)
    assert ok.all()
    np.testing.assert_array_equal(hat, np.stack(payloads))


def test_pdsch_multi_codeblock():
    """TBS > 6144 -> multi-block segmentation path (C > 1)."""
    cell = Cell(n_prb=25, cell_id=301)
    payloads, hat, ok, _ = _run_chain(cell, mcs=17, subframe=3, snr_db=22)
    assert ok.all()
    np.testing.assert_array_equal(hat, np.stack(payloads))


def test_pdsch_16qam_5mhz():
    """BASELINE config 2 shape: 5 MHz 16QAM with chest + equalizer."""
    cell = Cell(n_prb=25, cell_id=77)
    payloads, hat, ok, _ = _run_chain(cell, mcs=14, subframe=2, snr_db=18)
    assert ok.all()


def test_pdsch_subframe0_avoids_pbch():
    """Subframe 0: PDSCH must skip PBCH/PSS/SSS region and still decode."""
    cell = Cell(n_prb=6, cell_id=2)
    payloads, hat, ok, _ = _run_chain(cell, mcs=4, subframe=0, snr_db=20)
    assert ok.all()


def test_pdsch_crc_catches_bad_channel():
    cell = Cell(n_prb=6, cell_id=17)
    _, _, ok, _ = _run_chain(cell, mcs=9, subframe=1, snr_db=-3.0)
    assert not ok.any()


def test_pdsch_rv_nonzero():
    cell = Cell(n_prb=6, cell_id=5)
    payloads, hat, ok, _ = _run_chain(cell, mcs=6, subframe=4, snr_db=20, rv=2)
    assert ok.all()


def test_pdsch_tm2_alamouti():
    """BASELINE config 4 shape: TM2 transmit diversity, 2-port chest +
    SFBC combining."""
    cell = Cell(n_prb=15, cell_id=150, n_ports=2)
    payloads, hat, ok, _ = _run_chain(cell, mcs=8, subframe=2, snr_db=18, tm2=True)
    assert ok.all()
    np.testing.assert_array_equal(hat, np.stack(payloads))


def test_pdsch_harq_combining():
    """Two transmissions at low SNR individually fail; soft-combining the
    dematched buffers (rv 0 + rv 2) succeeds — dl_harq softbuffer
    semantics on device arrays."""
    cell = Cell(n_prb=6, cell_id=9)
    rng = np.random.default_rng(42)
    from srsue_tpu.phy import ra as _ra

    mcs = 9
    snr_db = 2.0
    grant0 = _ra.dl_grant(cell.n_prb, mcs, rv=0)
    grant2 = _ra.dl_grant(cell.n_prb, mcs, rv=2)
    c0 = PdschCodec(cell, grant0, rnti=0x10, subframe=1, cfi=1)
    c2 = PdschCodec(cell, grant2, rnti=0x10, subframe=1, cfi=1)
    payload = rng.integers(0, 2, grant0.tbs).astype(np.uint8)

    def rx(codec):
        grids = enb_tx.build_pdsch_subframe(cell, codec, payload)
        td = enb_tx.to_waveform(cell, grids)[0][None]
        p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
        noisy, _ = enb_tx.awgn(rng, td, snr_db, signal_power=p_sig)
        grid_rx = ofdm.demodulate(cell, jnp.asarray(noisy))
        h, nvar, _ = chest.estimate(cell, grid_rx, 1, port=0)
        x_eq, nv_eff = equalize.zf(
            codec.extract_re(grid_rx), codec.extract_re(h), nvar
        )
        return codec.dematch(codec.demap_llrs(x_eq, nv_eff))

    bufs0 = rx(c0)
    bufs2 = rx(c2)
    _, ok0, _, _ = c0.decode_softbuffers(bufs0)
    assert not bool(np.asarray(ok0).any()), "single rv0 decode should fail at 2 dB"
    combined = [a + b for a, b in zip(bufs0, bufs2)]
    payload_hat, okc, _, _ = c0.decode_softbuffers(combined)
    assert bool(np.asarray(okc).all()), "combined decode must pass"
    np.testing.assert_array_equal(np.asarray(payload_hat)[0], payload)


@pytest.mark.slow
def test_pdsch_20mhz_64qam_max_tbs():
    """BASELINE config 3: 20 MHz 64QAM max TBS (75376, C=13)."""
    cell = Cell(n_prb=100, cell_id=42)
    payloads, hat, ok, iters = _run_chain(
        cell, mcs=28, subframe=6, snr_db=26, n_sf=1
    )
    assert ok.all()
    np.testing.assert_array_equal(hat, np.stack(payloads))
