"""Soft USIM + LTE security primitives (reference: ue/src/upper/usim.cc +
liblte/src/liblte_security.cc)."""
