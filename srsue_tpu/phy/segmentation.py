"""Transport-block CRC attachment + code block segmentation — 36.212 §5.1.2.

Host-side (config/shape plane): produces the static per-TB segmentation
plan that the device kernels are specialized on (SURVEY.md §7 hard part 3:
variable TB sizes vs static shapes -> per-(prb, mcs) buckets).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from . import crc
from .turbo import VALID_K

Z = 6144  # max code block size


@dataclass(frozen=True)
class SegPlan:
    """Static segmentation layout for a TB size."""

    tbs: int            # transport block payload bits (no CRC)
    c: int              # number of code blocks
    k_plus: int         # larger block size
    k_minus: int        # smaller block size (0 if unused)
    c_plus: int
    c_minus: int
    f: int              # filler bits (prepended to first block)

    @property
    def block_ks(self) -> tuple[int, ...]:
        return (self.k_minus,) * self.c_minus + (self.k_plus,) * self.c_plus

    @property
    def uniform_k(self) -> int:
        """Max block size — device arrays are padded to this."""
        return self.k_plus


@functools.lru_cache(maxsize=1024)
def plan(tbs: int) -> SegPlan:
    b = tbs + 24  # TB CRC24A
    if b <= Z:
        l = 0
        c = 1
        b_prime = b
    else:
        l = 24
        c = int(np.ceil(b / (Z - l)))
        b_prime = b + c * l
    k_plus = int(VALID_K[np.searchsorted(VALID_K, -(-b_prime // c))])
    if c == 1:
        c_plus, k_minus, c_minus = 1, 0, 0
    else:
        k_minus = int(VALID_K[np.searchsorted(VALID_K, k_plus) - 1])
        delta = k_plus - k_minus
        c_minus = (c * k_plus - b_prime) // delta
        c_plus = c - c_minus
    f = c_plus * k_plus + c_minus * k_minus - b_prime
    return SegPlan(tbs, c, k_plus, k_minus, c_plus, c_minus, f)


def segment(tb_bits: np.ndarray) -> list[np.ndarray]:
    """TB payload bits -> list of code blocks (each with CRC24B if C>1,
    filler zeros prepended to block 0). Matches plan(tbs)."""
    tb_bits = np.asarray(tb_bits, np.uint8).ravel()
    p = plan(len(tb_bits))
    b = crc.attach(tb_bits, "24A")
    if p.c == 1:
        blocks = [b]
        if p.f:
            blocks[0] = np.concatenate([np.zeros(p.f, np.uint8), blocks[0]])
        return blocks
    blocks = []
    pos = 0
    for i, k in enumerate(p.block_ks):
        payload = k - 24 - (p.f if i == 0 else 0)
        blk = b[pos : pos + payload]
        pos += payload
        if i == 0 and p.f:
            blk = np.concatenate([np.zeros(p.f, np.uint8), blk])
        blocks.append(crc.attach(blk, "24B"))
    assert pos == len(b)
    return blocks


def desegment(blocks: list[np.ndarray], tbs: int) -> tuple[np.ndarray, bool]:
    """Code blocks (hard bits, CRCs still attached) -> (TB payload, crc_ok).

    Checks per-block CRC24B (when C>1) and the TB CRC24A.
    """
    p = plan(tbs)
    ok = True
    if p.c == 1:
        b = blocks[0][p.f :]
    else:
        parts = []
        for i, blk in enumerate(blocks):
            ok &= crc.check(blk, "24B")
            payload = blk[:-24]
            if i == 0:
                payload = payload[p.f :]
            parts.append(payload)
        b = np.concatenate(parts)
    ok &= crc.check(b, "24A")
    return b[:-24], bool(ok)
