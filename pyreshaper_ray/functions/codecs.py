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

Three encoder forms per codec, all producing streams for ONE decoder:

- batch (``dod_encode`` / ``gorilla_encode``): vectorized token generation +
  one fused bit-pack. The Gorilla batch encoder emits the '10'
  window-reuse control using a *quantized-run* policy (windows rounded to
  8-bit lanes; a run of points whose quantized window is unchanged shares
  one '11' header) — fully vectorizable, ~13 bits/pt on metric series vs
  ~19 for the explicit-window form (kept as ``gorilla_encode_explicit``).
- sequential reference (``gorilla_encode_windowed``): the paper's greedy
  containment policy, bit-by-bit; used in tests as a second valid stream.
- streaming (``DodStreamEncoder`` / ``GorillaStreamEncoder``): chunked
  ``push()`` producing BYTE-IDENTICAL output to the batch form — used by
  the segment-salting stitch phase to encode a giant conversation's series
  one segment at a time without ever holding the full array.

Decoders are sequential by nature (variable-length codes) but carry a
zero-run fast path: a 64-bit peek counts consecutive '0' controls in one
step, and the corresponding points are filled vectorized (constant delta for
DoD, repeated value for Gorilla) — regular series (rollup grids, gap-filled
tiers, constant-spacing conversations) decode at tens of Mvals/s.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

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
    pack_tokens_at(vals, nbits64, offs, buf)
    return buf.tobytes()


def pack_tokens_at(
    vals: np.ndarray, nbits: np.ndarray, offs: np.ndarray, buf: np.ndarray
) -> None:
    """Scatter (value, nbits≤64) tokens into ``buf`` (uint8) at EXPLICIT
    bit offsets ``offs`` — the guts of :func:`pack_tokens`, exposed so a
    segmented caller (``bucket.encode_series_bucket``) can pack EVERY
    conversation's token stream in ONE pass: each conversation's region
    starts byte-aligned, regions are disjoint, and tokens never overlap,
    so a single fused bitwise_or per byte-lane assembles all streams with
    no per-conversation Python. Bits covered by offs/nbits must be zero
    on entry."""
    if len(vals) == 0:
        return
    vals = vals.astype(np.uint64, copy=False)
    nbits64 = nbits.astype(np.int64, copy=False)
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
    v &= _M64
    return v - (1 << 64) if v >= (1 << 63) else v


# --- delta-of-delta timestamp codec --------------------------------------------

# (prefix, prefix_bits, value_bits); dod stored two's-complement in value_bits.
_DOD_BUCKETS = (
    (0b10, 2, 7),
    (0b110, 3, 9),
    (0b1110, 4, 12),
    (0b11110, 5, 32),
    (0b11111, 5, 64),
)


def _dod_tokens(
    dods: np.ndarray, return_parents: bool = False
):
    """Vectorized bucket classification → one (value, nbits) token per point
    ('0' control for dod == 0; bucket prefix + two's-complement otherwise).

    ``return_parents``: also return, per OUTPUT token, the index of the
    input point it encodes (wide >2³¹ dods split into prefix + payload
    tokens; the payload's parent is the same input point) — the segmented
    bucket encoder uses this to keep per-conversation bit accounting exact.
    """
    u = dods.view(np.uint64)
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
    parents = np.arange(len(dods), dtype=np.int64)
    if rest.any():
        # 5-bit '11111' prefix + full 64-bit payload = 69 bits → two tokens
        idx = np.flatnonzero(rest)
        vals[idx] = np.uint64(0b11111)
        nb[idx] = 5
        vals = np.insert(vals, idx + 1, u[idx])
        nb = np.insert(nb, idx + 1, 64)
        if return_parents:
            parents = np.insert(parents, idx + 1, idx)
    if return_parents:
        return vals, nb, parents
    return vals, nb


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
    w.write(int(ts[0]) & _M64, 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & _M64, 64)
    if n == 2:
        return w.getvalue()
    vals, nb = _dod_tokens(np.diff(deltas))
    return pack_tokens(vals, nb, w)


def _read_bits(data: bytes, pos: int, nbits: int) -> int:
    """Standalone MSB-first field read (inline-friendly)."""
    end = pos + nbits
    first_byte = pos >> 3
    last_byte = (end + 7) >> 3
    chunk = int.from_bytes(data[first_byte:last_byte], "big")
    shift = ((last_byte - first_byte) << 3) - (end - (first_byte << 3))
    return (chunk >> shift) & ((1 << nbits) - 1)


_DOD_VBITS = (7, 9, 12, 32, 64)


def dod_decode(data: bytes) -> np.ndarray:
    """Decode a DoD stream. Sequential with a vectorized zero-run fast path:
    a 64-bit peek counts consecutive '0' controls (constant delta) at once
    and the run is filled with one numpy arange."""
    n = int.from_bytes(data[0:4], "big")
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = _wrap64(int.from_bytes(data[4:12], "big"))
    if n == 1:
        return out
    delta = _wrap64(int.from_bytes(data[12:20], "big"))
    out[1] = _wrap64(int(out[0]) + delta)
    pos = 160
    i = 2
    buf = data
    pad = buf + b"\x00" * 9  # safe 9-byte peeks near the end
    bufarr = np.frombuffer(pad, dtype=np.uint8)
    _col = np.arange(8, dtype=np.int64)
    while i < n:
        o = pos & 7
        fb = pos >> 3
        aligned = (int.from_bytes(pad[fb : fb + 9], "big") >> (8 - o)) & _M64
        if aligned < (1 << 63):  # leading '0' control(s) → zero-dod run
            run = 64 - aligned.bit_length() if aligned else 64
            if run > n - i:
                run = n - i
            # constant delta over the run: one vectorized arange fill
            out[i : i + run] = np.int64(out[i - 1]) + np.int64(delta) * np.arange(
                1, run + 1, dtype=np.int64
            )
            i += run
            pos += run
            continue
        # nonzero token: count leading ones (≤5) → bucket
        ones = 64 - ((aligned ^ _M64).bit_length())
        k = ones if ones < 5 else 5
        pbits = k + 1 if k < 5 else 5
        vbits = _DOD_VBITS[k - 1]
        w = pbits + vbits
        # same-bucket tokens share a width: gather a run at fixed stride and
        # decode it with two vectorized cumsums (dod → delta → ts)
        if w <= 56 and n - i > 2:
            k_fit = ((len(bufarr) - 8) * 8 - pos) // w + 1
            kk = min(512, n - i, max(k_fit, 0))
            if kk > 1:
                prefix = _DOD_BUCKETS[k - 1][0]
                starts = pos + w * np.arange(kk, dtype=np.int64)
                f_b = starts >> 3
                off = (starts & 7).astype(np.uint64)
                chunks = bufarr[f_b[:, None] + _col].astype(np.uint64)
                f64 = np.zeros(kk, dtype=np.uint64)
                for b in range(8):
                    f64 = (f64 << np.uint64(8)) | chunks[:, b]
                field = (f64 >> (np.uint64(64 - w) - off)) & np.uint64((1 << w) - 1)
                ok = (field >> np.uint64(vbits)) == np.uint64(prefix)
                r = kk if ok.all() else int(np.argmin(ok))
                if r > 1:
                    payload = (field[:r] & np.uint64((1 << vbits) - 1)).astype(
                        np.int64
                    )
                    dods = np.where(
                        payload >= (1 << (vbits - 1)), payload - (1 << vbits), payload
                    )
                    deltas = np.int64(delta) + np.cumsum(dods, dtype=np.int64)
                    out[i : i + r] = np.int64(out[i - 1]) + np.cumsum(
                        deltas, dtype=np.int64
                    )
                    delta = int(deltas[-1])
                    pos += w * r
                    i += r
                    continue
        if w <= 64:
            dod = (aligned >> (64 - w)) & ((1 << vbits) - 1)
        else:  # 5 + 64 = 69 bits — read payload separately
            dod = _read_bits(buf, pos + pbits, vbits)
        if dod >= 1 << (vbits - 1):
            dod -= 1 << vbits
        delta = _wrap64(delta + dod)
        out[i] = _wrap64(int(out[i - 1]) + delta)
        pos += w
        i += 1
    return out


# --- streaming byte sink --------------------------------------------------------


class _BitSink:
    """Streaming MSB-first bit sink: chunks of (vals, nbits) tokens are
    fuse-packed with ``pack_tokens`` and appended; only a <8-bit residual is
    carried between chunks, so memory stays O(output)."""

    __slots__ = ("_buf", "_acc", "_nbits")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.append(
            np.array([value & _M64], dtype=np.uint64),
            np.array([nbits], dtype=np.int64),
        )

    def append(self, vals: np.ndarray, nbits: np.ndarray) -> None:
        if len(vals) == 0:
            return
        head = BitWriter()
        head._acc = self._acc
        head._nbits = self._nbits
        packed = pack_tokens(vals, nbits, head)
        total_bits = self._nbits + int(nbits.sum())
        full = total_bits >> 3
        rem = total_bits & 7
        self._buf += packed[:full]
        self._acc = (packed[full] >> (8 - rem)) if rem else 0
        self._nbits = rem

    def getvalue(self) -> bytes:
        out = bytes(self._buf)
        if self._nbits:
            out += bytes([(self._acc << (8 - self._nbits)) & 0xFF])
        return out


class DodStreamEncoder:
    """Chunked DoD encoder — byte-identical to ``dod_encode`` on the
    concatenation of all pushed chunks. Used by the segment-salting stitch to
    encode a giant conversation one segment at a time (carry = last ts +
    last delta; the 32-bit count is patched into the header at finish)."""

    def __init__(self) -> None:
        self._sink = _BitSink()
        self._n = 0
        self._prev_ts: int | None = None
        self._prev_delta: int | None = None

    def push(self, ts: np.ndarray) -> None:
        ts = np.ascontiguousarray(ts, dtype=np.int64)
        if len(ts) == 0:
            return
        start = 0
        if self._n == 0:
            self._sink.write(0, 32)  # count placeholder, patched at finish
            self._sink.write(int(ts[0]) & _M64, 64)
            self._prev_ts = int(ts[0])
            self._n = 1
            start = 1
            if start >= len(ts):
                return
        if self._n == 1:
            delta = _wrap64(int(ts[start]) - self._prev_ts)
            self._sink.write(delta & _M64, 64)
            self._prev_ts = int(ts[start])
            self._prev_delta = delta
            self._n += 1
            start += 1
            if start >= len(ts):
                return
        chunk = ts[start:]
        full = np.concatenate(([self._prev_ts], chunk))
        deltas = np.diff(full)
        dods = np.diff(np.concatenate(([self._prev_delta], deltas)))
        vals, nb = _dod_tokens(dods)
        self._sink.append(vals, nb)
        self._prev_ts = int(chunk[-1])
        self._prev_delta = int(deltas[-1])
        self._n += len(chunk)

    def finish(self) -> bytes:
        out = bytearray(self._sink.getvalue())
        if not out:
            return (0).to_bytes(4, "big")
        out[0:4] = self._n.to_bytes(4, "big")
        return bytes(out)


# --- Gorilla XOR float codec ---------------------------------------------------


def _gorilla_tokens_windowed(
    x: np.ndarray,
    prev_lead: int,
    prev_trail: int,
    seg_start: np.ndarray | None = None,
    return_parents: bool = False,
):
    """Vectorized Gorilla tokens with the paper's greedy-containment '10'
    window reuse — byte-identical to ``gorilla_encode_windowed``.

    The window state only changes at '11' emissions, so the sequential chain
    is walked per RUN, not per point: from each '11' the next violation of
    (lead ≥ L, trail ≥ T) is found with exponentially-growing vectorized
    chunk scans (total work O(n) even when every point violates), and the
    whole reuse run's '10' tokens are built in one shot. ``prev_lead`` /
    ``prev_trail`` carry the open window across chunks (streaming); -1 = no
    window yet. Returns (vals, nbits, last_lead, last_trail).

    ``seg_start`` (optional bool array aligned to ``x``): True where a new
    independent SEGMENT begins at that token — the window resets to "none"
    there, so the tokens from position i to the next segment start are
    byte-identical to a separate call on that segment's slice. Lets the
    segmented bucket encoder tokenize every conversation in ONE call.
    A zero token at a segment start emits '0' as always (matching the
    fresh-stream behavior: no window yet, state untouched).
    """
    m = len(x)
    if m == 0:
        empty = (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.int64),
            prev_lead,
            prev_trail,
        )
        return empty + (np.empty(0, dtype=np.int64),) if return_parents else empty
    zero = x == 0
    bl = _bitlen_u64(x)
    lead = np.minimum(64 - bl, 31)  # 5-bit field cap, as in the paper
    low = x & (np.uint64(0) - x)
    trail = np.where(zero, 0, _bitlen_u64(low) - 1)
    vals = np.zeros(m, dtype=np.uint64)
    nb = np.ones(m, dtype=np.int64)  # zeros prefilled: '0' control, 1 bit
    nz_idx = np.flatnonzero(~zero)
    L, T = prev_lead, prev_trail
    # tokens too wide for one 64-bit slot are split into (header, payload);
    # record the payload halves here and insert them after the scan
    split_pos: list[np.ndarray] = []
    split_val: list[np.ndarray] = []
    split_bits: list[np.ndarray] = []
    if len(nz_idx):
        l_nz = lead[nz_idx]
        t_nz = trail[nz_idx]
        x_nz = x[nz_idx]
        mn = len(nz_idx)
        if seg_start is not None:
            # per-nz-token "window must reset first" flag: True when any
            # segment boundary lies in (previous nz position, this one]
            seg_id_nz = np.cumsum(seg_start)[nz_idx]
            brk = np.empty(mn, dtype=bool)
            brk[0] = seg_id_nz[0] > 0
            brk[1:] = seg_id_nz[1:] != seg_id_nz[:-1]
        else:
            brk = None
        i = 0
        while i < mn:
            if brk is not None and brk[i]:
                L, T = -1, -1  # new segment: no open window
            if L >= 0:
                # scan forward for the first containment violation
                j = i
                step = 64
                found = -1
                while j < mn:
                    end = min(j + step, mn)
                    bad = (l_nz[j:end] < L) | (t_nz[j:end] < T)
                    if brk is not None:
                        bad = bad | brk[j:end]
                    k = int(np.argmax(bad))
                    if bad[k]:
                        found = j + k
                        break
                    j = end
                    step <<= 1
                run_end = found if found >= 0 else mn
                if run_end > i:
                    # '10' tokens for the whole reuse run, vectorized
                    mlen_w = 64 - L - T
                    payload = x_nz[i:run_end] >> np.uint64(T)
                    sel = nz_idx[i:run_end]
                    if 2 + mlen_w <= 64:
                        vals[sel] = (np.uint64(0b10) << np.uint64(mlen_w)) | payload
                        nb[sel] = 2 + mlen_w
                    else:  # 2 + mlen_w > 64 bits → control + payload tokens
                        vals[sel] = np.uint64(0b10)
                        nb[sel] = 2
                        split_pos.append(sel)
                        split_val.append(payload)
                        split_bits.append(np.full(len(sel), mlen_w, dtype=np.int64))
                    i = run_end
                if found < 0:
                    break
            # '11' at i: open the natural window
            li = int(l_nz[i])
            ti = int(t_nz[i])
            mlen = 64 - li - ti
            header = (0b11 << 11) | (li << 6) | (mlen - 1)
            pos = int(nz_idx[i])
            payload_i = int(x_nz[i] >> np.uint64(ti))
            if 13 + mlen <= 64:
                vals[pos] = np.uint64((header << mlen) | payload_i)
                nb[pos] = 13 + mlen
            else:
                vals[pos] = np.uint64(header)
                nb[pos] = 13
                split_pos.append(np.array([pos], dtype=np.int64))
                split_val.append(np.array([payload_i], dtype=np.uint64))
                split_bits.append(np.array([mlen], dtype=np.int64))
            L, T = li, ti
            i += 1
    parents = np.arange(m, dtype=np.int64)
    if split_pos:
        sp = np.concatenate(split_pos)
        sv = np.concatenate(split_val).astype(np.uint64)
        sb = np.concatenate(split_bits)
        order = np.argsort(sp, kind="stable")
        sp, sv, sb = sp[order], sv[order], sb[order]
        vals = np.insert(vals, sp + 1, sv)
        nb = np.insert(nb, sp + 1, sb)
        if return_parents:
            parents = np.insert(parents, sp + 1, sp)
    if return_parents:
        return vals, nb, L, T, parents
    return vals, nb, L, T


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array with the Gorilla XOR scheme — vectorized, with
    '10' window reuse (quantized-run policy; see ``_gorilla_tokens_windowed``).

    Layout: [uint32 count][raw first 64-bit value] then per point: '0' when
    XOR == 0; '10' + meaningful bits when the quantized window is unchanged;
    '11' + 5-bit lead + 6-bit (mlen−1) + meaningful bits when it changes.
    NaN-safe; identical consecutive values cost 1 bit.
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
    tvals, tbits, _, _ = _gorilla_tokens_windowed(x, -1, -1)
    return pack_tokens(tvals, tbits, w)


class GorillaStreamEncoder:
    """Chunked Gorilla encoder — byte-identical to ``gorilla_encode`` on the
    concatenation of all pushed chunks (carry = previous raw bits + current
    quantized window; count patched at finish)."""

    def __init__(self) -> None:
        self._sink = _BitSink()
        self._n = 0
        self._prev_bits: int | None = None
        self._lead = -1
        self._trail = -1

    def push(self, values: np.ndarray) -> None:
        vals64 = np.ascontiguousarray(values, dtype=np.float64)
        bits = vals64.view(np.uint64)
        if len(bits) == 0:
            return
        start = 0
        if self._n == 0:
            self._sink.write(0, 32)  # count placeholder
            self._sink.write(int(bits[0]), 64)
            self._prev_bits = int(bits[0])
            self._n = 1
            start = 1
            if start >= len(bits):
                return
        chunk = bits[start:]
        full = np.concatenate(
            (np.array([self._prev_bits], dtype=np.uint64), chunk)
        )
        x = full[1:] ^ full[:-1]
        tvals, tbits, self._lead, self._trail = _gorilla_tokens_windowed(
            x, self._lead, self._trail
        )
        self._sink.append(tvals, tbits)
        self._prev_bits = int(chunk[-1])
        self._n += len(chunk)

    def finish(self) -> bytes:
        out = bytearray(self._sink.getvalue())
        if not out:
            return (0).to_bytes(4, "big")
        out[0:4] = self._n.to_bytes(4, "big")
        return bytes(out)


def gorilla_encode_explicit(values: np.ndarray) -> bytes:
    """Explicit-window ('11'-only) vectorized Gorilla encoder — kept as the
    no-reuse baseline for size comparisons (≈19 vs ≈13 bits/pt on metric
    series). Decodes with the same ``gorilla_decode``."""
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
    low = x & (np.uint64(0) - x)
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
    """Sequential Gorilla encoder with greedy-containment '10' reuse — the
    paper's reference policy, bit-by-bit (used in tests as a second valid
    stream for the shared decoder)."""
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
    """Decode a Gorilla stream (any encoder policy). Sequential with a
    vectorized zero-run fast path: a 64-bit peek counts consecutive '0'
    controls (repeated value) and fills the run in one numpy assignment."""
    n = int.from_bytes(data[0:4], "big")
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = int.from_bytes(data[4:12], "big")
    out[0] = prev
    lead = 0
    mlen = 0
    pos = 96
    i = 1
    buf = data
    pad = buf + b"\x00" * 9
    bufarr = np.frombuffer(pad, dtype=np.uint8)
    _col = np.arange(8, dtype=np.int64)
    while i < n:
        o = pos & 7
        fb = pos >> 3
        aligned = (int.from_bytes(pad[fb : fb + 9], "big") >> (8 - o)) & _M64
        if aligned < (1 << 63):  # '0' control run → repeat prev
            run = 64 - aligned.bit_length() if aligned else 64
            if run > n - i:
                run = n - i
            out[i : i + run] = prev
            i += run
            pos += run
            continue
        if aligned & (1 << 62):  # '11' new window
            lead = (aligned >> 57) & 0x1F
            mlen = ((aligned >> 51) & 0x3F) + 1
            if 13 + mlen <= 64:
                m = (aligned >> (64 - 13 - mlen)) & ((1 << mlen) - 1)
            else:
                m = _read_bits(buf, pos + 13, mlen)
            pos += 13 + mlen
            prev ^= m << (64 - lead - mlen)
            out[i] = prev
            i += 1
            continue
        # '10' reuse window. Consecutive '10' tokens all have the SAME width
        # (2 + mlen bits), so a run can be gathered at fixed stride and
        # decoded vectorized: extract K candidate fields, keep the prefix
        # whose control bits are '10', xor-scan to materialize the values.
        w = 2 + mlen
        if w <= 56 and n - i > 2:
            # cap candidates so every 8-byte gather window stays inside pad
            k_fit = ((len(bufarr) - 8) * 8 - pos) // w + 1
            k = min(512, n - i, max(k_fit, 0))
            starts = pos + w * np.arange(k, dtype=np.int64)
            f_b = starts >> 3
            off = (starts & 7).astype(np.uint64)
            chunks = bufarr[f_b[:, None] + _col].astype(np.uint64)  # (k, 8)
            f64 = np.zeros(k, dtype=np.uint64)
            for b in range(8):
                f64 = (f64 << np.uint64(8)) | chunks[:, b]
            field = (f64 >> (np.uint64(64 - w) - off)) & np.uint64((1 << w) - 1)
            ok = (field >> np.uint64(w - 2)) == np.uint64(0b10)
            r = k if ok.all() else int(np.argmin(ok))
            if r > 0:
                mvals = field[:r] & np.uint64((1 << mlen) - 1)
                xs = mvals << np.uint64(64 - lead - mlen)
                out[i : i + r] = np.uint64(prev) ^ np.bitwise_xor.accumulate(xs)
                prev = int(out[i + r - 1])
                pos += w * r
                i += r
                continue
        if 2 + mlen <= 64:
            m = (aligned >> (64 - 2 - mlen)) & ((1 << mlen) - 1)
        else:
            m = _read_bits(buf, pos + 2, mlen)
        pos += 2 + mlen
        prev ^= m << (64 - lead - mlen)
        out[i] = prev
        i += 1
    return out.view(np.float64)
