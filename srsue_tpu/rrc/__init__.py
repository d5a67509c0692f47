"""RRC layer — message codecs + UE state machine (reference:
ue/src/upper/rrc.cc + liblte/src/liblte_rrc.cc)."""
