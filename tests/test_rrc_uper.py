"""ASN.1 UPER engine + 36.331 schema tests.

Hand-derived golden vectors pin the wire format (the reference's
equivalents are the liblte_rrc pack/unpack pairs, e.g.
liblte/src/liblte_rrc.cc RRCConnectionRequest); round-trips cover every
message the stack produces; extension-skip covers forward compatibility
with later-release eNBs.
"""

import pytest

from srsue_tpu.rrc import asn1 as A
from srsue_tpu.rrc import messages as M
from srsue_tpu.rrc import uper


# --------------------------------------------------------------------- engine

def test_constrained_int_widths():
    assert uper.Int(0, 0).bits == 0
    assert uper.Int(0, 1).bits == 1
    assert uper.Int(1, 16).bits == 4
    assert uper.Int(0, 837).bits == 10
    assert uper.Int(-126, 24).bits == 8
    assert uper.Int(0, 65535).bits == 16
    for codec, v in [(uper.Int(-126, 24), -100), (uper.Int(1, 16), 16)]:
        assert uper.decode(codec, uper.encode(codec, v)) == v


def test_general_length_forms():
    w = uper.BitWriter()
    uper.put_general_length(w, 5)
    assert w.bits == [0, 0, 0, 0, 0, 1, 0, 1]
    w = uper.BitWriter()
    uper.put_general_length(w, 300)
    r = uper.BitReader(w.to_bytes())
    assert uper.get_general_length(r) == 300


def test_default_field_omitted_when_equal():
    codec = uper.Seq(("a", uper.Int(0, 15), uper.OPT, 4), ("b", uper.Bool()))
    # value == default -> presence bit 0 -> 1+0+1 bits = 2 bits used
    enc_default = uper.encode(codec, {"a": 4, "b": True})
    enc_explicit = uper.encode(codec, {"a": 5, "b": True})
    assert len(enc_default) == 1 and len(enc_explicit) == 1
    assert uper.decode(codec, enc_default)["a"] == 4
    assert uper.decode(codec, enc_explicit)["a"] == 5


def test_extension_skip_sequence():
    """A decoder built from the Rel-8 root must skip extension additions
    appended by a later release."""
    rel8 = uper.Seq(("x", uper.Int(0, 7)), ext=True)
    # hand-encode an extended instance: ext=1, x=3, 1 ext addition
    w = uper.BitWriter()
    w.put(1, 1)          # extension flag
    w.put(3, 3)          # x
    uper.put_normally_small(w, 0)   # (count-1) = 0 -> one addition
    w.put(1, 1)          # present
    uper.put_general_length(w, 2)   # open type: 2 octets
    w.put_bytes(b"\xde\xad")
    out = uper.decode(rel8, w.to_bytes())
    assert out["x"] == 3
    assert out["_ext"] == [b"\xde\xad"]


def test_extensible_enum_and_choice_decode():
    e = uper.Enum("a", "b", ext=True)
    w = uper.BitWriter()
    w.put(1, 1)
    uper.put_normally_small(w, 2)
    assert uper.decode(e, w.to_bytes()) == "_ext2"

    c = uper.Choice(("a", uper.Bool()), ext=True)
    w = uper.BitWriter()
    w.put(1, 1)
    uper.put_normally_small(w, 0)
    uper.put_general_length(w, 1)
    w.put_bytes(b"\x80")
    name, raw = uper.decode(c, w.to_bytes())
    assert name == "_ext0" and raw == b"\x80"


# ------------------------------------------------------------------- goldens

def test_golden_rrc_connection_request():
    """Hand-derived UPER: c1(0) + rrcConnectionRequest(1) + r8(0) +
    randomValue(1) + 40 bits + cause(011) + spare(0) = 48 bits."""
    data = M.pack("UL-CCCH", "rrcConnectionRequest", {
        "ue_Identity": ("randomValue", 0xAABBCCDDEE),
        "establishmentCause": "mo-Signalling",
        "spare": 0,
    })
    assert data.hex() == "5aabbccddee6"
    name, _, body = M.unpack("UL-CCCH", data)
    assert name == "rrcConnectionRequest"
    assert body["ue_Identity"] == ("randomValue", 0xAABBCCDDEE)
    assert body["establishmentCause"] == "mo-Signalling"


def test_golden_security_mode_complete():
    """c1(0) + idx5(0101) + tid(01) + r8(0) + noExt(0) = 9 bits -> 2A 00."""
    data = M.pack("UL-DCCH", "securityModeComplete", {}, tid=1)
    assert data.hex() == "2a00"


def test_golden_s_tmsi_connection_request():
    """s-TMSI variant: mmec=0xA5, m-TMSI=0x12345678, mt-Access."""
    data = M.pack("UL-CCCH", "rrcConnectionRequest", {
        "ue_Identity": ("s_TMSI", {"mmec": 0xA5, "m_TMSI": 0x12345678}),
        "establishmentCause": "mt-Access",
        "spare": 0,
    })
    # bits: 0,1,0,0 | 10100101 | 32 bits | 010 | 0
    assert len(data) == 6
    name, _, body = M.unpack("UL-CCCH", data)
    kind, stmsi = body["ue_Identity"]
    assert kind == "s_TMSI" and stmsi["m_TMSI"] == 0x12345678


# ---------------------------------------------------------------- roundtrips

def _roundtrip(channel, name, body, tid=0):
    data = M.pack(channel, name, body, tid=tid)
    got_name, got_tid, got = M.unpack(channel, data)
    assert got_name == name
    return got_tid, got, data


def test_roundtrip_sib1():
    from srsue_tpu.enb.stack import EnbStack

    enb = EnbStack()
    name, _, body = M.unpack("BCCH-DL-SCH", enb.make_sib1())
    assert name == "systemInformationBlockType1"
    info = body["cellAccessRelatedInfo"]
    assert info["trackingAreaCode"] == 0x1234
    assert info["plmn_IdentityList"][0]["plmn_Identity"]["mnc"] == [0, 1]
    assert body["si_WindowLength"] == "ms20"


def test_roundtrip_sib2():
    from srsue_tpu.enb.stack import EnbStack

    enb = EnbStack()
    name, _, body = M.unpack("BCCH-DL-SCH", enb.make_sib2())
    assert name == "systemInformation"
    kind, sib2 = body["sib_TypeAndInfo"][0]
    assert kind == "sib2"
    rr = sib2["radioResourceConfigCommon"]
    assert rr["prach_Config"]["rootSequenceIndex"] == 128
    assert rr["uplinkPowerControlCommon"]["p0_NominalPUSCH"] == -85
    assert sib2["timeAlignmentTimerCommon"] == "sf10240"


def test_roundtrip_connection_setup():
    body = {
        "radioResourceConfigDedicated": {
            "srb_ToAddModList": [{
                "srb_Identity": 1,
                "rlc_Config": ("explicitValue", ("am", {
                    "ul_AM_RLC": {"t_PollRetransmit": "ms45",
                                  "pollPDU": "p64", "pollByte": "kB500",
                                  "maxRetxThreshold": "t4"},
                    "dl_AM_RLC": {"t_Reordering": "ms35",
                                  "t_StatusProhibit": "ms0"},
                })),
            }],
            "mac_MainConfig": ("explicitValue", {
                "ul_SCH_Config": {
                    "maxHARQ_Tx": "n5",
                    "periodicBSR_Timer": "sf20",
                    "retxBSR_Timer": "sf320",
                    "ttiBundling": False,
                },
                "timeAlignmentTimerDedicated": "infinity",
                "phr_Config": ("setup", {
                    "periodicPHR_Timer": "sf20",
                    "prohibitPHR_Timer": "sf20",
                    "dl_PathlossChange": "dB3",
                }),
            }),
            "physicalConfigDedicated": {
                "pdsch_ConfigDedicated": {"p_a": "dB0"},
                "pusch_ConfigDedicated": {
                    "betaOffset_ACK_Index": 10,
                    "betaOffset_RI_Index": 12,
                    "betaOffset_CQI_Index": 15,
                },
                "uplinkPowerControlDedicated": {
                    "p0_UE_PUSCH": 0, "deltaMCS_Enabled": "en0",
                    "accumulationEnabled": True, "p0_UE_PUCCH": 0,
                    "pSRS_Offset": 7,
                },
                "soundingRS_UL_ConfigDedicated": ("setup", {
                    "srs_Bandwidth": "bw0", "srs_HoppingBandwidth": "hbw0",
                    "freqDomainPosition": 0, "duration": True,
                    "srs_ConfigIndex": 20, "transmissionComb": 0,
                    "cyclicShift": "cs0",
                }),
                "antennaInfo": ("explicitValue", {
                    "transmissionMode": "tm2",
                    "ue_TransmitAntennaSelection": ("release", None),
                }),
                "schedulingRequestConfig": ("setup", {
                    "sr_PUCCH_ResourceIndex": 1, "sr_ConfigIndex": 17,
                    "dsr_TransMax": "n64",
                }),
            },
        },
    }
    tid, got, _ = _roundtrip("DL-CCCH", "rrcConnectionSetup", body, tid=2)
    assert tid == 2
    rrcd = got["radioResourceConfigDedicated"]
    srb = rrcd["srb_ToAddModList"][0]
    assert srb["rlc_Config"][1][0] == "am"
    mac = rrcd["mac_MainConfig"][1]
    assert mac["ul_SCH_Config"]["maxHARQ_Tx"] == "n5"
    phys = rrcd["physicalConfigDedicated"]
    assert phys["pusch_ConfigDedicated"]["betaOffset_RI_Index"] == 12
    assert phys["uplinkPowerControlDedicated"]["filterCoefficient"] == "fc4"


def test_roundtrip_reconfiguration():
    from srsue_tpu.enb.stack import EnbStack

    enb = EnbStack()
    enb.k_nas_int = bytes(32)
    enb._send_reconfiguration_with_attach_accept.__func__  # exists
    body = {
        "dedicatedInfoNASList": [b"\x07\x42\x01\x23", b"\x01"],
        "radioResourceConfigDedicated": {
            "drb_ToAddModList": [{
                "eps_BearerIdentity": 5,
                "drb_Identity": 1,
                "rlc_Config": ("um_Bi_Directional", {
                    "ul_UM_RLC": {"sn_FieldLength": "size10"},
                    "dl_UM_RLC": {"sn_FieldLength": "size10",
                                  "t_Reordering": "ms50"},
                }),
                "pdcp_Config": {
                    "rlc_UM": {"pdcp_SN_Size": "len12bits"},
                    "headerCompression": ("notUsed", None),
                },
                "logicalChannelIdentity": 3,
            }],
        },
    }
    tid, got, _ = _roundtrip("DL-DCCH", "rrcConnectionReconfiguration",
                             body, tid=3)
    assert got["dedicatedInfoNASList"] == [b"\x07\x42\x01\x23", b"\x01"]
    drb = got["radioResourceConfigDedicated"]["drb_ToAddModList"][0]
    assert drb["rlc_Config"][0] == "um_Bi_Directional"
    assert drb["pdcp_Config"]["rlc_UM"]["pdcp_SN_Size"] == "len12bits"


def test_roundtrip_release_and_paging():
    tid, got, _ = _roundtrip("DL-DCCH", "rrcConnectionRelease", {
        "releaseCause": "other",
        "redirectedCarrierInfo": ("eutra", 3100),
    }, tid=1)
    assert got["redirectedCarrierInfo"] == ("eutra", 3100)

    data = M.pack("PCCH", "paging", {
        "pagingRecordList": [{
            "ue_Identity": ("s_TMSI", {"mmec": 1, "m_TMSI": 0xDEADBEEF}),
            "cn_Domain": "ps",
        }],
        "systemInfoModification": "true",
    })
    name, _, got = M.unpack("PCCH", data)
    assert name == "paging"
    assert got["pagingRecordList"][0]["ue_Identity"][1]["m_TMSI"] == 0xDEADBEEF
    assert got["systemInfoModification"] == "true"


def test_roundtrip_ue_capability():
    cap = M.ue_eutra_capability(ue_category=5, band=7)
    parsed = M.parse_ue_eutra_capability(cap)
    assert parsed["ue_Category"] == 5
    assert parsed["accessStratumRelease"] == "rel8"
    assert parsed["rf_Parameters"]["supportedBandListEUTRA"][0]["bandEUTRA"] == 7
    # DEFAULT maxNumberROHC-ContextSessions restored on decode
    assert parsed["pdcp_Parameters"]["maxNumberROHC_ContextSessions"] == "cs16"


def test_roundtrip_info_transfers():
    nas = bytes(range(64))
    _, got, _ = _roundtrip("UL-DCCH", "ulInformationTransfer", {
        "dedicatedInfoType": ("dedicatedInfoNAS", nas)})
    assert got["dedicatedInfoType"] == ("dedicatedInfoNAS", nas)
    _, got, _ = _roundtrip("DL-DCCH", "dlInformationTransfer", {
        "dedicatedInfoType": ("dedicatedInfoNAS", nas)}, tid=1)
    assert got["dedicatedInfoType"] == ("dedicatedInfoNAS", nas)


def test_unsupported_alternative_raises():
    # measConfig became a real codec in r4; inter-RAT handover remains a
    # deliberate Unsupported placeholder (absent from srsUE too)
    with pytest.raises(NotImplementedError):
        M.pack("DL-DCCH", "rrcConnectionReconfiguration", {
            "securityConfigHO": {"handoverType": ("interRAT", {})},
        }, tid=0)


def test_enum_sizes_pin_spec_tables():
    """Bit widths implied by the Rel-8 enumeration sizes."""
    assert len(A.T_PollRetransmit.names) == 64
    assert len(A.T_Reordering.names) == 32
    assert len(A.T_StatusProhibit.names) == 64
    assert len(A.PollByte.names) == 16
    assert A.T_Reordering.names[21] == "ms110"
    assert A.T_PollRetransmit.names[49] == "ms250"
    assert A.T_PollRetransmit.names[50] == "ms300"


def test_measurement_report_golden():
    """Hand-derived UPER golden vector for MeasurementReport (r4
    schemas). Bit layout (36.331 + X.691):
      b0      = 0   message CHOICE: c1
      b1-b4   = 0001  c1 alternative 1 = measurementReport (16 alts)
      b5      = 0   criticalExtensions CHOICE: c1
      b6-b8   = 000 c1 CHOICE: measurementReport-r8 (8 alts)
      b9      = 0   r8 IEs: nonCriticalExtension absent
      b10     = 0   MeasResults extension bit
      b11     = 1   measResultNeighCells present
      b12-b16 = 00000  measId 1 (offset from 1, 5 bits)
      b17-b23 = 0101000 rsrpResult 40 (7 bits)
      b24-b29 = 010100  rsrqResult 20 (6 bits)
      b30     = 0   neighCells CHOICE extension bit
      b31-b32 = 00  alternative 0 = measResultListEUTRA (4 root alts)
      b33-b35 = 000 list length 1 (SIZE 1..8, offset 3 bits)
      b36     = 0   cgi-Info absent
      b37-b45 = 001001101 physCellId 77 (9 bits)
      b46     = 0   measResult extension bit
      b47     = 1   rsrpResult present
      b48     = 0   rsrqResult absent
      b49-b55 = 0110111 rsrpResult 55
    -> 08 10 28 50 01 35 37"""
    raw = M.pack("UL-DCCH", "measurementReport", {"measResults": {
        "measId": 1,
        "measResultServCell": {"rsrpResult": 40, "rsrqResult": 20},
        "measResultNeighCells": ("measResultListEUTRA", [
            {"physCellId": 77, "measResult": {"rsrpResult": 55}},
        ]),
    }})
    assert raw.hex() == "08102850013537", raw.hex()
    name, _, body = M.unpack("UL-DCCH", raw)
    assert name == "measurementReport"
    assert body["measResults"]["measResultServCell"]["rsrpResult"] == 40
