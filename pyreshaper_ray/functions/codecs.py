"""Time-series codecs: delta-of-delta timestamps + Gorilla XOR floats.

Both follow the scheme published in the Facebook Gorilla paper
("Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015),
with bucket widths adapted to microsecond-resolution timestamps (the paper
assumes second resolution; our deltas are in the 1e6–1e9 µs range, so two
wider buckets — 32 and 64 bit — are added).

This is the analog of PyReshaper's ``netcdf4c`` compressed output format
(``specification.py::Specifier.ncfmt`` / ``compression_level`` in the public
NCAR/PyReshaper repo): a lossless, bit-deterministic encoding of each
per-conversation series. ``decode(encode(x)) == x`` exactly is the contract
(tested in tests/test_codecs.py).

Encode/decode run per conversation inside ``map_groups`` / actor-pool stages —
series are short relative to the corpus, so the Python packing loop is
amortized; the heavy lifting (XORs, leading/trailing-zero counts, delta
arithmetic) is vectorized with numpy up front.
"""

from __future__ import annotations

import numpy as np

# --- bit-level writer / reader -------------------------------------------------


class BitWriter:
    """Append-only MSB-first bit buffer."""

    __slots__ = ("_acc", "_nbits", "_out")

    def __init__(self) -> None:
        self._acc = 0  # int accumulator, MSB-first
        self._nbits = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        if self._nbits >= 8:
            rem = self._nbits & 7
            self._out += (self._acc >> rem).to_bytes((self._nbits - rem) >> 3, "big")
            self._acc &= (1 << rem) - 1
            self._nbits = rem

    def getvalue(self) -> bytes:
        out = bytes(self._out)
        if self._nbits:
            out += bytes([(self._acc << (8 - self._nbits)) & 0xFF])
        return out


class BitReader:
    """MSB-first bit reader over bytes."""

    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self._pos + nbits
        first_byte = self._pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(self._data[first_byte:last_byte], "big")
        total_bits = (last_byte - first_byte) * 8
        shift = total_bits - (end - (first_byte << 3))
        self._pos = end
        return (chunk >> shift) & ((1 << nbits) - 1)


# --- delta-of-delta timestamp codec --------------------------------------------

# (prefix, prefix_bits, value_bits); dod stored two's-complement in value_bits.
_DOD_BUCKETS = (
    (0b10, 2, 7),
    (0b110, 3, 9),
    (0b1110, 4, 12),
    (0b11110, 5, 32),
    (0b11111, 5, 64),
)


def dod_encode(ts: np.ndarray) -> bytes:
    """Encode an int64 microsecond timestamp array.

    Layout: [uint32 count][int64 first ts][int64 first delta]  then per
    remaining point a dod record: '0' when dod == 0, else a bucket prefix +
    two's-complement dod. Constant-spacing series (fixture conv000042's exact
    60 s grid) cost 1 bit per point after the header.
    """
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(ts)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    if n == 2:
        return w.getvalue()
    dods = np.diff(deltas)
    # one combined (prefix<<vbits | value) write per point
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
            continue
        for prefix, pbits, vbits in _DOD_BUCKETS:
            lo = -(1 << (vbits - 1))
            hi = (1 << (vbits - 1)) - 1
            if lo <= dod <= hi:
                w.write((prefix << vbits) | (dod & ((1 << vbits) - 1)), pbits + vbits)
                break
    return w.getvalue()


def _wrap64(v: int) -> int:
    """Reduce a Python int to signed-int64 two's-complement (numpy wrap)."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def dod_decode(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    out[0] = _wrap64(first)
    if n == 1:
        return out
    delta = _wrap64(r.read(64))
    out[1] = _wrap64(int(out[0]) + delta)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            # read continuation of prefix: buckets are 10,110,1110,11110,11111
            k = 0
            while k < 3 and r.read(1) == 1:
                k += 1
            if k < 3:
                _, _, vbits = _DOD_BUCKETS[k]
            else:
                vbits = 64 if r.read(1) == 1 else 32
            dod = r.read(vbits)
            if dod >= 1 << (vbits - 1):
                dod -= 1 << vbits
        delta = _wrap64(delta + dod)
        out[i] = _wrap64(int(out[i - 1]) + delta)
    return out


# --- Gorilla XOR float codec ---------------------------------------------------


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array with the Gorilla XOR scheme.

    Layout: [uint32 count][raw first 64-bit value] then per point:
    '0' when XOR == 0; '10' + meaningful bits inside the previous
    (leading, meaningful-length) window when it still fits; '11' + 5-bit
    leading-zero count + 6-bit (meaningful-length - 1) + meaningful bits.
    NaN-safe (NaN bit patterns round-trip exactly); identical consecutive
    values (fixture conv000042's constant metric) cost 1 bit.
    """
    vals = np.ascontiguousarray(values, dtype=np.float64)
    bits = vals.view(np.uint64)
    n = len(bits)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    if n == 1:
        return w.getvalue()
    xors = (bits[1:] ^ bits[:-1]).tolist()
    prev_lead = -1
    prev_mlen = 0
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        if lead > 31:
            lead = 31  # 5-bit field cap, as in the paper
        trail = (x & -x).bit_length() - 1
        mlen = 64 - lead - trail
        prev_trail = 64 - prev_lead - prev_mlen
        if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
            # control '10': meaningful bits fit the previous (lead, mlen)
            # window — one combined write per point
            w.write((0b10 << prev_mlen) | (x >> prev_trail), 2 + prev_mlen)
        else:
            # control '11' + 5-bit lead + 6-bit (mlen-1) + meaningful bits
            header = (0b11 << 11) | (lead << 6) | (mlen - 1)
            w.write((header << mlen) | (x >> trail), 13 + mlen)
            prev_lead, prev_mlen = lead, mlen
    return w.getvalue()


def gorilla_decode(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead = 0
    mlen = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            m = r.read(mlen)
            x = m << (64 - lead - mlen)
        else:  # '11' new window
            lead = r.read(5)
            mlen = r.read(6) + 1
            m = r.read(mlen)
            x = m << (64 - lead - mlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
