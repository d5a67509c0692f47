"""GW (IP gateway) layer (reference: ue/src/upper/gw.cc)."""

from .gw import Gw
