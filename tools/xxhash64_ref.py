"""Independent pure-Python xxHash64 (public spec, github.com/Cyan4973/xxHash
doc/xxhash_spec.md) + the engine's SimHash derivation on top of it.

Used to build golden oracle tables: the values here are computed WITHOUT
Spark, so an oracle join against them genuinely cross-checks the engine's
xxhash64-based operators (validated token-by-token against F.xxhash64,
including seed 42, empty strings, and multi-byte UTF-8).
"""

from __future__ import annotations

import re

MASK = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 of ``data``; seed defaults to 42 = Spark's F.xxhash64 seed."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


# same ASCII whitespace class as Java's \s (Spark normalize_text_expr)
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def tokens(text: str) -> list[str]:
    """Mirror of the engine's normalize_text_expr + tokens_expr: lowercase,
    collapse whitespace runs to one space, trim, split on space."""
    norm = _WS.sub(" ", text.lower()).strip(" ")
    return [t for t in norm.split(" ") if t != ""]


def simhash64(text: str) -> int | None:
    """Mirror of the engine's SimHash: per-token-occurrence xxhash64 (seed
    42), 64 sign counters, bit b set iff counter > 0.  None for token-less
    text (matching the NULL signature)."""
    toks = tokens(text)
    if not toks:
        return None
    counters = [0] * 64
    for tok in toks:
        h = xxh64(tok.encode("utf-8"))
        for b in range(64):
            counters[b] += 1 if (h >> b) & 1 else -1
    packed = 0
    for b in range(64):
        if counters[b] > 0:
            packed |= 1 << b
    return signed64(packed)
