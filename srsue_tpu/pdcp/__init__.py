"""PDCP layer (reference: ue/src/upper/pdcp.cc + pdcp_entity.cc)."""

from .pdcp import Pdcp, PdcpConfig
