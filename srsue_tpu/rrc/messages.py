"""RRC message schemas — 36.331, the ~subset srsUE touches
(SURVEY.md §2.3: MIB/SIB1/SIB2 acquisition, connection establishment,
security mode, capability transfer, reconfiguration; senders/parsers at
ue/src/upper/rrc.cc:203-525).

Declarative schemas over rrc.bitcodec (UPER-style: presence bitmaps +
unaligned fixed-width fields). Field sets mirror the IEs the reference
actually consumes (its config fan-out rrc.cc:589-860); encoding is
self-consistent across our UE and eNB emulator.
"""

from __future__ import annotations

from .bitcodec import (
    Bool, Choice, Enum, FixedBytes, Seq, SeqOf, Uint, VarBytes,
    decode_msg, encode_msg,
)

# ---------------------------------------------------------------------------
# System information
# ---------------------------------------------------------------------------

PLMN_IDENTITY = Seq(
    ("mcc", Uint(10)),
    ("mnc", Uint(10)),
)

SIB1 = Seq(
    ("plmn", PLMN_IDENTITY),
    ("tac", Uint(16)),
    ("cell_id", Uint(28)),
    ("cell_barred", Bool()),
    ("intra_freq_resel", Bool()),
    ("q_rx_lev_min", Uint(6)),  # -70..-22 offset coded
    ("freq_band", Uint(6, lo=1)),
    ("si_window_len", Enum("ms1", "ms2", "ms5", "ms10", "ms15", "ms20", "ms40")),
    ("si_periodicity", Enum("rf8", "rf16", "rf32", "rf64", "rf128", "rf256", "rf512")),
    ("sys_info_value_tag", Uint(5)),
)

PRACH_CONFIG = Seq(
    ("root_sequence_index", Uint(10)),
    ("config_index", Uint(6)),
    ("high_speed_flag", Bool()),
    ("zero_correlation_zone", Uint(4)),
    ("freq_offset", Uint(7)),
)

RACH_CONFIG = Seq(
    ("n_preambles", Enum(*[f"n{i}" for i in range(4, 68, 4)])),
    ("preamble_init_power", Enum(*[f"dbm{p}" for p in range(-120, -88, 2)])),
    ("power_ramp_step", Enum("db0", "db2", "db4", "db6")),
    ("preamble_trans_max", Enum("n3", "n4", "n5", "n6", "n7", "n8", "n10",
                                "n20", "n50", "n100", "n200")),
    ("response_window", Enum("sf2", "sf3", "sf4", "sf5", "sf6", "sf7", "sf8", "sf10")),
    ("contention_res_timer", Enum("sf8", "sf16", "sf24", "sf32", "sf40",
                                  "sf48", "sf56", "sf64")),
    ("max_harq_msg3_tx", Uint(3, lo=1)),
)

PUSCH_CONFIG = Seq(
    ("n_sb", Uint(2, lo=1)),
    ("hopping_mode", Enum("interSubFrame", "intraAndInterSubFrame")),
    ("hopping_offset", Uint(7)),
    ("enable_64qam", Bool()),
    ("group_hopping", Bool()),
    ("group_assignment", Uint(5)),
    ("seq_hopping", Bool()),
    ("cyclic_shift", Uint(3)),
)

PUCCH_CONFIG = Seq(
    ("delta_shift", Enum("ds1", "ds2", "ds3")),
    ("n_rb_cqi", Uint(7)),
    ("n_cs_an", Uint(3)),
    ("n1_pucch_an", Uint(11)),
)

UL_POWER_CONTROL = Seq(
    ("p0_nominal_pusch", Uint(8)),  # -126..24 offset coded
    ("alpha", Enum("al0", "al04", "al05", "al06", "al07", "al08", "al09", "al1")),
    ("p0_nominal_pucch", Uint(5)),  # -127..-96 offset coded
    ("delta_preamble_msg3", Uint(4)),
)

SIB2 = Seq(
    ("rach", RACH_CONFIG),
    ("prach", PRACH_CONFIG),
    ("pusch", PUSCH_CONFIG),
    ("pucch", PUCCH_CONFIG),
    ("ul_power", UL_POWER_CONTROL),
    ("pdsch_rs_power", Uint(7)),  # -60..50
    ("phich_duration", Enum("normal", "extended")),
    ("phich_resources", Enum("oneSixth", "half", "one", "two")),
    ("sr_config_index", Uint(8), True),
    ("ul_bandwidth", Enum("n6", "n15", "n25", "n50", "n75", "n100"), True),
    ("additional_spectrum_emission", Uint(5)),
    ("time_alignment_timer", Enum("sf500", "sf750", "sf1280", "sf1920",
                                  "sf2560", "sf5120", "sf10240", "infinity")),
)

BCCH_DLSCH = Choice(
    ("sib1", SIB1),
    ("sib2", SIB2),
)

# ---------------------------------------------------------------------------
# Connection establishment / dedicated
# ---------------------------------------------------------------------------

RRC_CONNECTION_REQUEST = Seq(
    ("ue_id", FixedBytes(5)),  # 40-bit random / S-TMSI
    ("cause", Enum("emergency", "highPriorityAccess", "mt-Access",
                   "mo-Signalling", "mo-Data")),
)

RB_CONFIG = Seq(
    ("lcid", Uint(4)),
    ("rlc_mode", Enum("tm", "um", "am")),
    ("priority", Uint(4)),
    ("pbr_kbps", Uint(16)),
    ("pdcp_sn_bits", Uint(4), True),
)

PHYS_CONFIG_DEDICATED = Seq(
    ("cqi_period", Uint(10), True),
    ("cqi_pucch_resource", Uint(11), True),
    ("sr_config_index", Uint(8), True),
    ("sr_pucch_resource", Uint(11), True),
    ("p_srs_offset", Uint(4), True),
    ("ant_mode", Enum("tm1", "tm2"), True),
)

RRC_CONNECTION_SETUP = Seq(
    ("srb1_config", RB_CONFIG),
    ("phys_config", PHYS_CONFIG_DEDICATED),
)

RRC_CONNECTION_SETUP_COMPLETE = Seq(
    ("transaction_id", Uint(2)),
    ("selected_plmn", Uint(3, lo=1)),
    ("nas_pdu", VarBytes()),
)

SECURITY_MODE_COMMAND = Seq(
    ("transaction_id", Uint(2)),
    ("eea", Uint(3)),
    ("eia", Uint(3)),
)

SECURITY_MODE_COMPLETE = Seq(("transaction_id", Uint(2)),)
SECURITY_MODE_FAILURE = Seq(("transaction_id", Uint(2)),)

UE_CAPABILITY_ENQUIRY = Seq(("transaction_id", Uint(2)),)

UE_CAPABILITY_INFORMATION = Seq(
    ("transaction_id", Uint(2)),
    ("ue_category", Uint(4, lo=1)),
    ("rohc_supported", Bool()),
)

RRC_CONNECTION_RECONFIGURATION = Seq(
    ("transaction_id", Uint(2)),
    ("nas_pdu", VarBytes(), True),
    ("drb_configs", SeqOf(RB_CONFIG, size_bits=4), True),
    ("phys_config", PHYS_CONFIG_DEDICATED, True),
)

RRC_CONNECTION_RECONFIGURATION_COMPLETE = Seq(("transaction_id", Uint(2)),)

DL_INFORMATION_TRANSFER = Seq(
    ("transaction_id", Uint(2)),
    ("nas_pdu", VarBytes()),
)

UL_INFORMATION_TRANSFER = Seq(("nas_pdu", VarBytes()),)

RRC_CONNECTION_RELEASE = Seq(
    ("transaction_id", Uint(2)),
    ("cause", Enum("loadBalancing", "other")),
)

# channel-level message wrappers -------------------------------------------

UL_CCCH = Choice(("rrcConnectionRequest", RRC_CONNECTION_REQUEST),)

DL_CCCH = Choice(
    ("rrcConnectionSetup", RRC_CONNECTION_SETUP),
    ("rrcConnectionReject", Seq(("wait_time", Uint(4, lo=1)),)),
)

UL_DCCH = Choice(
    ("rrcConnectionSetupComplete", RRC_CONNECTION_SETUP_COMPLETE),
    ("securityModeComplete", SECURITY_MODE_COMPLETE),
    ("securityModeFailure", SECURITY_MODE_FAILURE),
    ("ueCapabilityInformation", UE_CAPABILITY_INFORMATION),
    ("rrcConnectionReconfigurationComplete", RRC_CONNECTION_RECONFIGURATION_COMPLETE),
    ("ulInformationTransfer", UL_INFORMATION_TRANSFER),
)

DL_DCCH = Choice(
    ("securityModeCommand", SECURITY_MODE_COMMAND),
    ("ueCapabilityEnquiry", UE_CAPABILITY_ENQUIRY),
    ("rrcConnectionReconfiguration", RRC_CONNECTION_RECONFIGURATION),
    ("dlInformationTransfer", DL_INFORMATION_TRANSFER),
    ("rrcConnectionRelease", RRC_CONNECTION_RELEASE),
)


def pack(channel, value) -> bytes:
    return encode_msg(channel, value)


def unpack(channel, data: bytes):
    return decode_msg(channel, data)
