"""Measurement reporting closed loop (36.331 §5.5 — capability-plus:
the reference ignores measConfig entirely). Two layers:

* unit: A3 entry/leave conditions, hysteresis, timeToTrigger and L3
  filtering against synthetic PHY measurements.
* over-the-air: eNB arms event A3 via measConfig; a neighbor cell's
  waveform ramps up; the UE measures its CRS RSRP from the combined
  waveform, fires A3, sends MeasurementReport on SRB1 over PUSCH; the
  eNB answers with an intra-LTE handover toward the reported PCI; the
  UE completes on the target over the air (dedicated-preamble PRACH,
  RAR, Complete on the target's SRB1)."""

import numpy as np
import pytest

from srsue_tpu.enb.phy import EnbPhy
from srsue_tpu.enb.stack import EnbStack
from srsue_tpu.phy.cell import Cell
from srsue_tpu.phy.phy import Phy
from srsue_tpu.rrc.rrc import Rrc, RrcState
from srsue_tpu.ue import Ue

SRC_PCI = 123
NEW_PCI = 77


class _PhyStub:
    def __init__(self):
        self.serving_rsrp_dbm = -80.0
        self.neighbor_rsrp_dbm = {}
        self.metrics = {"snr_db": 20.0}
        self.neigh_cfg = None

    def configure_neighbor_meas(self, pcis):
        self.neigh_cfg = list(pcis)


class _PdcpStub:
    def __init__(self):
        self.sdus = []

    def write_sdu(self, lcid, sdu):
        self.sdus.append((lcid, sdu))


def _armed_rrc(ttt="ms0", a3_off_db=3.0, hys_db=1.0):
    rrc = Rrc()
    rrc.state = RrcState.CONNECTED
    rrc.phy = _PhyStub()
    rrc.pdcp = _PdcpStub()
    rrc._apply_meas_config({
        "measObjectToAddModList": [{
            "measObjectId": 1,
            "measObject": ("measObjectEUTRA", {
                "carrierFreq": 0, "allowedMeasBandwidth": "mbw15",
                "presenceAntennaPort1": False, "neighCellConfig": 0,
                "cellsToAddModList": [{
                    "cellIndex": 1, "physCellId": NEW_PCI,
                    "cellIndividualOffset": "dB0"}],
            }),
        }],
        "reportConfigToAddModList": [{
            "reportConfigId": 1,
            "reportConfig": ("reportConfigEUTRA", {
                "triggerType": ("event", {
                    "eventId": ("eventA3", {
                        "a3_Offset": int(2 * a3_off_db),
                        "reportOnLeave": False}),
                    "hysteresis": int(2 * hys_db),
                    "timeToTrigger": ttt,
                }),
                "triggerQuantity": "rsrp",
                "reportQuantity": "sameAsTriggerQuantity",
                "maxReportCells": 4, "reportInterval": "ms480",
                "reportAmount": "r1",
            }),
        }],
        "measIdToAddModList": [
            {"measId": 1, "measObjectId": 1, "reportConfigId": 1}],
    })
    return rrc


def test_a3_entry_hysteresis_and_ttt():
    rrc = _armed_rrc(ttt="ms64")
    assert rrc.phy.neigh_cfg == [NEW_PCI]
    # neighbor below entry threshold: no report ever
    rrc.phy.neighbor_rsrp_dbm[NEW_PCI] = -78.5  # +1.5 dB < off+hys=3.5
    for _ in range(200):
        rrc.step_measurements()
    assert rrc.pdcp.sdus == []
    # neighbor above: needs TTT consecutive TTIs
    rrc.phy.neighbor_rsrp_dbm[NEW_PCI] = -74.0  # +6 dB > 3.5
    for _ in range(40):
        rrc.step_measurements()
    assert rrc.pdcp.sdus == []  # L3 filter + TTT not yet satisfied
    for _ in range(120):
        rrc.step_measurements()
    assert len(rrc.pdcp.sdus) == 1  # fired exactly once (reportAmount r1)
    lcid, sdu = rrc.pdcp.sdus[0]
    assert lcid == 1
    from srsue_tpu.rrc import messages as M

    kind, _, body = M.unpack("UL-DCCH", sdu)
    assert kind == "measurementReport"
    mr = body["measResults"]
    assert mr["measId"] == 1
    cells = mr["measResultNeighCells"][1]
    assert cells[0]["physCellId"] == NEW_PCI
    # RSRP-Range = dBm + 141: -74 -> 67, -80 -> 61
    assert abs(cells[0]["measResult"]["rsrpResult"] - 67) <= 1
    assert abs(mr["measResultServCell"]["rsrpResult"] - 61) <= 1


def test_a3_interrupted_ttt_does_not_fire():
    rrc = _armed_rrc(ttt="ms64")
    rrc.phy.neighbor_rsrp_dbm[NEW_PCI] = -70.0
    for _ in range(100):  # let the L3 filter converge above threshold
        rrc.step_measurements()
        if rrc.pdcp.sdus:
            break
    rrc2 = _armed_rrc(ttt="ms64")
    rrc2.phy.neighbor_rsrp_dbm[NEW_PCI] = -70.0
    for i in range(300):
        # dip below the LEAVE condition every 30 TTIs: TTT restarts and
        # can never reach 64 consecutive entries
        rrc2.phy.neighbor_rsrp_dbm[NEW_PCI] = (
            -95.0 if (i // 30) % 2 else -70.0)
        rrc2.step_measurements()
    assert rrc2.pdcp.sdus == []


def test_a3_cell_individual_offset_and_best_cell():
    """Ocn (cellIndividualOffset) biases the entry condition per cell;
    the report carries the BEST entering neighbor."""
    rrc = _armed_rrc(ttt="ms0")
    # re-apply config with two cells: 77 at dB0, 88 at dB6 boost
    rrc._apply_meas_config({
        "measObjectToAddModList": [{
            "measObjectId": 1,
            "measObject": ("measObjectEUTRA", {
                "carrierFreq": 0, "allowedMeasBandwidth": "mbw15",
                "presenceAntennaPort1": False, "neighCellConfig": 0,
                "cellsToAddModList": [
                    {"cellIndex": 1, "physCellId": 77,
                     "cellIndividualOffset": "dB0"},
                    {"cellIndex": 2, "physCellId": 88,
                     "cellIndividualOffset": "dB6"},
                ],
            }),
        }],
    })
    assert sorted(rrc.phy.neigh_cfg) == [77, 88]
    # 88 is 1 dB below serving, but +6 Ocn lifts it over off+hys = 4;
    # 77 at +1 dB does not enter
    rrc.phy.neighbor_rsrp_dbm = {77: -79.0, 88: -81.0}
    for _ in range(80):
        rrc.step_measurements()
    assert len(rrc.pdcp.sdus) == 1
    from srsue_tpu.rrc import messages as M

    _, _, body = M.unpack("UL-DCCH", rrc.pdcp.sdus[0][1])
    cells = body["measResults"]["measResultNeighCells"][1]
    assert cells[0]["physCellId"] == 88


def test_meas_config_remove_lists():
    rrc = _armed_rrc(ttt="ms0")
    rrc._apply_meas_config({
        "measIdToRemoveList": [1],
        "reportConfigToRemoveList": [1],
        "measObjectToRemoveList": [1],
    })
    assert not rrc.meas_ids and not rrc.meas_objects \
        and not rrc.meas_reports
    rrc.phy.neighbor_rsrp_dbm[NEW_PCI] = -60.0
    for _ in range(50):
        rrc.step_measurements()
    assert rrc.pdcp.sdus == []  # nothing armed -> nothing reported


@pytest.mark.slow
def test_ota_a3_measurement_triggers_handover():
    cell1 = Cell(n_prb=15, cell_id=SRC_PCI)
    cell2 = Cell(n_prb=15, cell_id=NEW_PCI)
    phy = Phy(cell1)
    ue = Ue(phy=phy)
    phy.mac = ue.mac
    phy.rrc = ue.rrc
    stack = EnbStack(ue.usim.cfg)
    enb1 = EnbPhy(cell1, stack)
    # the neighbor's broadcast-only waveform (own hermetic stack) until
    # the handover is initiated; then the REAL target PHY on the shared
    # stack takes over
    neigh = EnbPhy(cell2, EnbStack(ue.usim.cfg))
    rng = np.random.default_rng(0)

    ue.attach()
    ue.rrc.write_pdu_bcch_bch(b"\x00\x00\x00")
    tti = 0
    while tti < 200:
        dl = enb1.build_dl_subframe(tti)
        noise = 0.01 * (rng.standard_normal(dl.shape)
                        + 1j * rng.standard_normal(dl.shape)
                        ).astype(np.complex64)
        ul = phy.work(tti, dl + noise)
        ue.run_tti(tti)
        enb1.receive_ul(tti, ul)
        tti += 1
        if ue.is_attached and stack.state == "attached":
            break
    assert ue.is_attached

    # arm A3 with a short TTT; neighbor starts 20 dB down, then ramps
    # 6 dB ABOVE the serving cell -> entry condition (3 + 0.5 dB) holds
    stack.configure_measurements([NEW_PCI], a3_offset_db=3.0,
                                 hysteresis_db=1.0, ttt="ms40")
    gain = 0.1
    enb2 = None
    t_end = tti + 600
    import jax
    while tti < t_end:
        if tti % 150 == 0:
            # two cells' worth of jitted stages in one process pushes
            # XLA:CPU's live-executable limit (see conftest note); the
            # persistent compile cache makes re-JITs cheap
            jax.clear_caches()
        if "meas_configured" in stack.events and tti > 0 and gain < 2.0 \
                and ue.rrc.meas_ids:
            gain = 2.0  # +6 dB over serving
        if enb2 is None and "ho_initiated" in stack.events:
            enb2 = EnbPhy(cell2, stack)  # real target appears
        on_target = ue.rrc.pci == NEW_PCI and enb2 is not None
        if on_target:
            dl = enb2.build_dl_subframe(tti)
        else:
            dl = enb1.build_dl_subframe(tti)
            dl = dl + gain * neigh.build_dl_subframe(tti)
        noise = 0.01 * (rng.standard_normal(dl.shape)
                        + 1j * rng.standard_normal(dl.shape)
                        ).astype(np.complex64)
        ul = phy.work(tti, dl + noise)
        ue.run_tti(tti)
        (enb2 if on_target else enb1).receive_ul(tti, ul)
        tti += 1
        if (enb2 is not None and stack.state == "attached"
                and ue.rrc.state == RrcState.CONNECTED
                and ue.mac.crnti == stack.t_crnti and on_target):
            break

    # the whole loop closed over the air
    assert f"a3_report_pci{NEW_PCI}" in stack.events, stack.events
    assert stack.meas_reports, "no MeasurementReport decoded"
    assert "ho_cmd_dl" in enb1.events
    assert enb2 is not None and "rar_sent" in enb2.events
    assert "ho_complete" in stack.events, (stack.events, enb2.events[:20])
    assert ue.rrc.pci == NEW_PCI
    assert ue.mac.crnti == stack.t_crnti
    assert ue.rrc.state == RrcState.CONNECTED
