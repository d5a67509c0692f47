"""Declarative bit-level message codec engine.

The reference vendors 24k LoC of hand-written pack/unpack functions
(liblte_rrc.cc / liblte_mme.cc). This engine replaces that with a
schema DSL: a message is a list of (field_name, codec) pairs; codecs
compose (optional fields with presence bits, enums, choices, nested
sequences) in the style of ASN.1 UPER (presence bitmap first, then
fields; unaligned fixed-width integers). Schemas live next to the
message definitions in rrc/messages.py and nas (nas uses byte-aligned
TLV per 24.301 instead).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_bytes(self, data: bytes) -> None:
        for b in data:
            self.put(b, 8)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def get_bytes(self, n: int) -> bytes:
        return bytes(self.get(8) for _ in range(n))


# --- codec combinators ------------------------------------------------------


class Codec:
    def enc(self, w: BitWriter, v: Any) -> None:
        raise NotImplementedError

    def dec(self, r: BitReader) -> Any:
        raise NotImplementedError


class Uint(Codec):
    def __init__(self, bits: int, lo: int = 0):
        self.bits = bits
        self.lo = lo

    def enc(self, w, v):
        w.put(int(v) - self.lo, self.bits)

    def dec(self, r):
        return r.get(self.bits) + self.lo


class Bool(Codec):
    def enc(self, w, v):
        w.put(1 if v else 0, 1)

    def dec(self, r):
        return bool(r.get(1))


class Enum(Codec):
    def __init__(self, *names: str):
        self.names = names
        self.bits = max(1, (len(names) - 1).bit_length())

    def enc(self, w, v):
        w.put(self.names.index(v), self.bits)

    def dec(self, r):
        return self.names[r.get(self.bits)]


class FixedBytes(Codec):
    def __init__(self, n: int):
        self.n = n

    def enc(self, w, v):
        assert len(v) == self.n
        w.put_bytes(v)

    def dec(self, r):
        return r.get_bytes(self.n)


class VarBytes(Codec):
    """Length-prefixed byte string (16-bit length)."""

    def enc(self, w, v):
        w.put(len(v), 16)
        w.put_bytes(v)

    def dec(self, r):
        n = r.get(16)
        return r.get_bytes(n)


class Seq(Codec):
    """Sequence with optional fields: presence bitmap first (UPER style).

    fields: list of (name, codec, optional: bool). Values are dicts.
    """

    def __init__(self, *fields):
        self.fields = [
            (f[0], f[1], f[2] if len(f) > 2 else False) for f in fields
        ]

    def enc(self, w, v: dict):
        for name, _, opt in self.fields:
            if opt:
                w.put(1 if v.get(name) is not None else 0, 1)
        for name, codec, opt in self.fields:
            val = v.get(name)
            if opt and val is None:
                continue
            codec.enc(w, val)

    def dec(self, r) -> dict:
        present = {}
        for name, _, opt in self.fields:
            present[name] = r.get(1) == 1 if opt else True
        out = {}
        for name, codec, opt in self.fields:
            out[name] = codec.dec(r) if present[name] else None
        return out


class Choice(Codec):
    """Tagged union: (tag_name, codec) alternatives. Values are
    ('alt_name', value)."""

    def __init__(self, *alts):
        self.alts = alts
        self.bits = max(1, (len(alts) - 1).bit_length())

    def enc(self, w, v):
        name, val = v
        idx = [a[0] for a in self.alts].index(name)
        w.put(idx, self.bits)
        self.alts[idx][1].enc(w, val)

    def dec(self, r):
        idx = r.get(self.bits)
        name, codec = self.alts[idx]
        return (name, codec.dec(r))


class SeqOf(Codec):
    def __init__(self, inner: Codec, size_bits: int = 8):
        self.inner = inner
        self.size_bits = size_bits

    def enc(self, w, v):
        w.put(len(v), self.size_bits)
        for item in v:
            self.inner.enc(w, item)

    def dec(self, r):
        n = r.get(self.size_bits)
        return [self.inner.dec(r) for _ in range(n)]


class Null(Codec):
    def enc(self, w, v):
        pass

    def dec(self, r):
        return None


def encode_msg(codec: Codec, value: Any) -> bytes:
    w = BitWriter()
    codec.enc(w, value)
    return w.to_bytes()


def decode_msg(codec: Codec, data: bytes) -> Any:
    return codec.dec(BitReader(data))
