"""pcap writer, logger, metrics table, and the CLI selftest."""

import struct
import subprocess
import sys

import numpy as np

from srsue_tpu.utils.metrics import MetricsPrinter, PhyMetricsSnapshot
from srsue_tpu.utils.pcap import DLT_MAC_LTE, MacPcap


def test_pcap_file_structure(tmp_path):
    path = tmp_path / "mac.pcap"
    p = MacPcap(str(path), ue_id=2)
    p.write_dl_sirnti(b"\x40\x05hello", tti=5)
    p.write_ul_crnti(b"\x3d\x21data", rnti=0x4601, tti=8)
    p.close()
    raw = path.read_bytes()
    magic, vmaj, vmin, _, _, snap, dlt = struct.unpack("<IHHiIII", raw[:24])
    assert magic == 0xA1B2C3D4
    assert dlt == DLT_MAC_LTE
    # first record header + context starts with radioType=1(FDD)
    rec_len = struct.unpack("<IIII", raw[24:40])[2]
    ctx = raw[40 : 40 + rec_len]
    assert ctx[0] == 1  # FDD
    assert ctx[1] == 1  # downlink
    assert ctx[2] == 4  # SI-RNTI type
    assert b"\x40\x05hello" in ctx
    assert b"data" in raw


def test_metrics_printer_output():
    import io

    from srsue_tpu.mac.mac import MacMetrics

    buf = io.StringIO()
    mp = MetricsPrinter(out=buf, period_ttis=10)
    phy = PhyMetricsSnapshot(rsrp_dbm=-80, pathloss_db=60, cfo_hz=150,
                             dl_mcs=20, dl_snr_db=25, turbo_iters=1.5)
    m = MacMetrics(rx_pkts=100, rx_errors=1, rx_brate=5_000_000)
    for tti in range(25):
        mp.step(tti, attached=True, phy=phy, mac_metrics=m)
    out = buf.getvalue()
    assert "rsrp" in out  # header printed
    assert "-80.0" in out
    assert out.count("\n") >= 3


def test_logger_tti_stamping(capsys):
    from srsue_tpu.utils import logger as L

    log = L.get_logger("mac", level="info")
    L.step_tti(1234)
    log.info("hello %d", 42)
    err = capsys.readouterr().err
    assert "[ 1234]" in err
    assert "hello 42" in err


def test_cli_selftest():
    """The app-level smoke test: python -m srsue_tpu.main --selftest."""
    r = subprocess.run(
        [sys.executable, "-m", "srsue_tpu.main", "--selftest"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "SELFTEST PASS" in r.stdout
    assert "ul_pkts=True" in r.stdout
