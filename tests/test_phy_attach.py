"""Waveform-level random access: PRACH detect -> RAR on PDSCH (blind
RA-RNTI search) -> Msg3 on PUSCH (SC-FDMA decode at the eNB) -> Msg4
contention resolution — the reference's over-the-air
ue_itf_test_prach.cc flow (SURVEY.md §4.3), fully hermetic."""

import numpy as np
import pytest

from srsue_tpu.mac import pdu as pdu_mod
from srsue_tpu.mac.mac import Mac
from srsue_tpu.phy import control, dci, enb_tx, prach, pusch, ra
from srsue_tpu.phy.cell import Cell, UlGrant
from srsue_tpu.phy.pdsch import PdschCodec
from srsue_tpu.phy.ue_dl import UeDl


class WaveformPhy:
    """phy-interface that actually synthesizes waveforms."""

    def __init__(self, cell):
        self.cell = cell
        self.tx_prach = []  # (tti, waveform)
        self.ta = None
        self.rar_search = None
        self.crnti_search = None

    def sync_start(self):
        pass

    def sr_opportunity(self, tti):
        return False

    def sr_send(self, tti):
        pass

    def prach_send(self, preamble_idx, power, tti):
        wf = prach.waveform(self.cell, root_seq_index=128, zero_corr=5,
                            preamble_idx=preamble_idx)
        self.tx_prach.append((tti, wf))
        return tti

    def pdcch_dl_search_rar(self, ra_rnti, start, window):
        self.rar_search = (ra_rnti, start, window)

    def pdcch_dl_search_temp_crnti(self, t_crnti):
        self.temp_crnti = t_crnti

    def pdcch_dl_search_crnti(self, crnti):
        self.crnti_search = crnti

    def set_timeadv(self, ta):
        self.ta = ta

    def get_headroom_db(self):
        return 20.0

    def configure_ul_params(self, sib2):
        pass


class FakeRlcCcch:
    """rlc_interface_mac with a canned ConnectionRequest on CCCH
    (mac_test.cc's rlctest pattern)."""

    def __init__(self):
        self.ccch = b""
        self.delivered = []

    def get_buffer_state(self, lcid):
        return len(self.ccch) if lcid == 0 else 0

    def read_pdu(self, lcid, n):
        if lcid == 0 and self.ccch and len(self.ccch) <= n:
            out = self.ccch
            self.ccch = b""
            return out
        return b""

    def write_pdu(self, lcid, data):
        self.delivered.append((lcid, data))

    def write_pdu_bcch_dlsch(self, data):
        self.delivered.append(("bcch", data))


def test_phy_level_rach_and_msg3():
    cell = Cell(n_prb=25, cell_id=123)
    phy = WaveformPhy(cell)
    rlc = FakeRlcCcch()
    mac = Mac(rlc=rlc, phy=phy)
    ue_dl = UeDl(cell)
    rng = np.random.default_rng(0)

    # --- Msg1: UE starts RA; the preamble crosses the "air" ---------------
    conn_req = b"\x5a" * 6 + b"\x01\x02"
    mac.start_ra(conn_req)
    for tti in range(4):
        mac.run_tti(tti)
    assert phy.tx_prach, "no PRACH transmitted"
    ptti, wf = phy.tx_prach[0]
    noisy = wf + 0.02 * (
        rng.standard_normal(wf.shape) + 1j * rng.standard_normal(wf.shape)
    ).astype(np.complex64)
    hits = prach.detect(cell, noisy, 128, 5)
    assert hits, "eNB missed the preamble"
    detected = max(hits, key=lambda h: h[1])[0]
    assert detected == mac.ra.preamble_idx

    # --- Msg2: eNB sends RAR on PDSCH @ RA-RNTI; UE blind-decodes ---------
    ra_rnti, start, window = phy.rar_search
    assert ra_rnti == 1 + (ptti % 10)
    grant20 = pdu_mod.RarGrant(False, riv=dci.riv_encode(25, 0, 4) & 0x3FF,
                               mcs=4, tpc=0, ul_delay=False, cqi_req=False)
    rar = pdu_mod.Rar(detected, ta=11, grant=grant20, t_crnti=0x4601)
    rar_bytes = pdu_mod.pack_rar_pdu([rar], backoff=None, pdu_len=56)

    sf = 6
    cfi = 2
    g = ra.dl_grant(cell.n_prb, 3, n_prb_alloc=6)
    codec = PdschCodec(cell, g, ra_rnti, sf, cfi)
    grid = enb_tx.empty_grid(cell)
    enb_tx.add_crs(cell, grid, sf, 0)
    control.pcfich_map(cell, grid, sf, cfi)
    d1a = dci.Dci1A(riv=dci.riv_encode(25, 0, 6), mcs=3, harq_pid=0,
                    ndi=False, rv=0, tpc=0)
    control.pdcch_map(cell, grid, sf, cfi, dci.pack_1a(25, d1a), ra_rnti, 0, 4)
    bits = np.zeros(g.tbs, np.uint8)
    pb = np.unpackbits(np.frombuffer(rar_bytes, np.uint8))[: g.tbs]
    bits[: len(pb)] = pb
    codec.map_to_grid(grid, codec.encode_symbols(bits))
    td = enb_tx.to_waveform(cell, [grid])[0]
    p_sig = float(np.mean(np.abs(td) ** 2)) * cell.nfft / cell.n_sc
    noisy_dl, _ = enb_tx.awgn(rng, td[None], 18, signal_power=p_sig)

    res = ue_dl.process(noisy_dl, sf, ra_rnti, ue_specific=False)
    assert res.grants and res.tb_ok.all(), "RAR PDSCH decode failed"
    rar_rx = np.packbits(res.payload[0]).tobytes()[: len(rar_bytes)]
    mac.ra.rar_received(rar_rx)
    assert mac.ra.state.name == "CONTENTION_RESOLUTION"
    assert phy.ta == 11

    # --- Msg3: UE PUSCH encode; eNB SC-FDMA decode ------------------------
    msg3_tx = mac.new_grant_ul(ptti + 6, grant_bytes=24)
    assert msg3_tx is not None
    msg3_mac_pdu = msg3_tx.payload
    ug = UlGrant(n_prb=4, prb_start=0, mcs=2, mod_order=2, tbs=24 * 8)
    pc = pusch.PuschCodec(cell, ug, rnti=0x4601, subframe=(sf + 2) % 10)
    payload_bits = np.unpackbits(np.frombuffer(msg3_mac_pdu, np.uint8))
    ul_td = pc.encode_sf(payload_bits)
    ul_noisy = ul_td + 0.01 * (
        rng.standard_normal(ul_td.shape) + 1j * rng.standard_normal(ul_td.shape)
    ).astype(np.complex64)
    import jax.numpy as jnp
    from srsue_tpu.utils.jaxutil import to_host

    got, ok = pc.decode_sf(jnp.asarray(ul_noisy[None]), noise_var=1e-4)
    assert bool(to_host(ok).all()), "eNB failed to decode Msg3 PUSCH"
    msg3_rx = np.packbits(to_host(got)[0].astype(np.uint8)).tobytes()
    parsed = pdu_mod.unpack(msg3_rx, uplink=True)
    ccch = [s.payload for s in parsed.subheaders if s.lcid == 0]
    assert ccch and ccch[0] == conn_req

    # --- Msg4: contention resolution --------------------------------------
    m4 = pdu_mod.MacPdu()
    m4.add_ce(pdu_mod.LCID_CON_RES, ccch[0][:6])
    mac._deliver_temp_crnti = True
    mac._deliver(0, pdu_mod.pack(m4, 32))
    assert mac.crnti == 0x4601
    assert phy.crnti_search == 0x4601
