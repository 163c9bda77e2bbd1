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
    u = dods.view(np.uint64)

    # vectorized bucket classification → one (value, nbits) token per point
    vals = np.zeros(len(dods), dtype=np.uint64)
    nb = np.ones(len(dods), dtype=np.int64)
    rest = dods != 0
    for prefix, pbits, vbits in _DOD_BUCKETS[:-1]:
        lo, hi = -(1 << (vbits - 1)), (1 << (vbits - 1)) - 1
        m = rest & (dods >= lo) & (dods <= hi)
        vals[m] = (np.uint64(prefix) << np.uint64(vbits)) | (
            u[m] & np.uint64((1 << vbits) - 1)
        )
        nb[m] = pbits + vbits
        rest = rest & ~m
    if rest.any():
        # 5-bit '11111' prefix + full 64-bit payload = 69 bits → two tokens
        idx = np.flatnonzero(rest)
        vals[idx] = np.uint64(0b11111)
        nb[idx] = 5
        vals = np.insert(vals, idx + 1, u[idx])
        nb = np.insert(nb, idx + 1, 64)
    return pack_tokens(vals, nb, w)


def pack_tokens(vals: np.ndarray, nbits: np.ndarray, head: BitWriter) -> bytes:
    """Vectorized MSB-first bit packing of (value, nbits≤64) tokens appended
    after the bits already in ``head``.

    Each token's shifted value spans ≤9 bytes; contributions of different
    tokens to a shared boundary byte occupy disjoint bits, so a fused
    ``bitwise_or`` scatter per byte-lane assembles the stream without any
    per-token Python.
    """
    head_bytes = head.getvalue()
    head_bits = len(head._out) * 8 + head._nbits  # exact bit length of head
    if len(vals) == 0:
        return head_bytes
    vals = vals.astype(np.uint64, copy=False)
    nbits64 = nbits.astype(np.int64, copy=False)
    offs = head_bits + np.concatenate(([0], np.cumsum(nbits64)[:-1]))
    total_bits = int(head_bits + nbits64.sum())
    n_bytes = (total_bits + 7) // 8
    buf = np.zeros(n_bytes, dtype=np.uint8)
    buf[: len(head_bytes)] = np.frombuffer(head_bytes, dtype=np.uint8)

    end = offs + nbits64  # exclusive bit end
    pad = (-end) % 8  # right-pad to byte boundary
    end_byte = (end - 1) // 8
    start_byte = offs // 8
    span = end_byte - start_byte + 1
    pad_u = pad.astype(np.uint64)
    lo = vals << pad_u  # wraps mod 2^64 — low 64 bits of shifted value
    rshift = np.where(pad > 0, 64 - pad, 0).astype(np.uint64)  # < 64 always
    hi = np.where(pad > 0, vals >> rshift, np.uint64(0))

    max_span = int(span.max())
    for j in range(max_span):
        live = span > j
        idx = np.where(live, end_byte - j, 0)
        if j < 8:
            byte = (lo >> np.uint64(8 * j)).astype(np.uint8)
        else:
            byte = hi.astype(np.uint8)
        byte = np.where(live, byte, np.uint8(0))
        np.bitwise_or.at(buf, idx, byte)  # masked-to-zero lanes are no-ops
    return buf.tobytes()


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (exact: works on ≤32-bit halves,
    which float64 represents exactly)."""
    x = x.astype(np.uint64, copy=False)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    use_hi = hi != 0
    v = np.where(use_hi, hi, lo).astype(np.float64)
    bl = np.zeros(len(x), dtype=np.int64)
    nz = v > 0
    bl[nz] = np.floor(np.log2(v[nz])).astype(np.int64) + 1
    bl[use_hi] += 32
    return bl


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
    """Encode a float64 array with the Gorilla XOR scheme — vectorized.

    Layout: [uint32 count][raw first 64-bit value] then per point:
    '0' when XOR == 0, else '11' + 5-bit leading-zero count + 6-bit
    (meaningful-length − 1) + meaningful bits. This encoder always emits the
    explicit-window '11' control (never the '10' reuse form) — a valid
    Gorilla bitstream by construction, fully decodable by ``gorilla_decode``;
    ``gorilla_encode_windowed`` below is the sequential reference that also
    uses '10' window reuse (slightly smaller, ~25× slower). NaN-safe;
    identical consecutive values cost 1 bit.
    """
    vals64 = np.ascontiguousarray(values, dtype=np.float64)
    bits = vals64.view(np.uint64)
    n = len(bits)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    if n == 1:
        return w.getvalue()
    x = bits[1:] ^ bits[:-1]
    zero = x == 0
    bl = _bitlen_u64(x)
    lead = np.minimum(64 - bl, 31)
    low = x & (np.uint64(0) - x)  # isolate lowest set bit
    trail = np.where(zero, 0, _bitlen_u64(low) - 1)
    mlen = np.maximum(64 - lead - trail, 1)
    header13 = (
        (np.uint64(0b11) << np.uint64(11))
        | (lead.astype(np.uint64) << np.uint64(6))
        | (mlen.astype(np.uint64) - np.uint64(1))
    )
    payload = x >> trail.astype(np.uint64)
    small = mlen <= 51  # 13-bit header + payload fits one 64-bit token
    tvals = np.where(
        zero,
        np.uint64(0),
        np.where(
            small,
            (header13 << np.minimum(mlen, 51).astype(np.uint64)) | payload,
            header13,
        ),
    )
    tbits = np.where(zero, 1, np.where(small, 13 + mlen, 13))
    big = np.flatnonzero(~zero & ~small)
    if len(big):
        tvals = np.insert(tvals, big + 1, payload[big])
        tbits = np.insert(tbits, big + 1, mlen[big])
    return pack_tokens(tvals, tbits, w)


def gorilla_encode_windowed(values: np.ndarray) -> bytes:
    """Sequential Gorilla encoder with '10' previous-window reuse — the
    reference implementation of the full control scheme (used in tests;
    both encoders decode with ``gorilla_decode``)."""
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
