"""XOR (Gorilla) chunk codec — the reference's float chunk encoding.

Re-derivation of tsdb/chunkenc/xor.go (bit layout) and
tsdb/chunkenc/bstream.go (MSB-first bit stream):

- chunk bytes = 2-byte big-endian sample count + bit stream
- sample 0: timestamp as signed varint (zigzag), value as raw 64 bits
- sample 1: t-delta as uvarint, value XOR-encoded
- sample 2+: delta-of-delta with prefix codes
  ``0`` (dod=0) / ``10``+14b / ``110``+17b / ``1110``+20b / ``1111``+64b
  (xor.go:195-209, asymmetric ranges per bitRange xor.go:222), then the
  XOR-encoded value
- value XOR (xor.go:412 xorWrite): ``0`` when equal; ``1 0`` reuse the
  previous leading/trailing window; ``1 1`` + 5-bit leading (clamped to
  31) + 6-bit significant-bit count (64 encodes as 0) + the bits

Used by the STREAMED_XOR_CHUNKS remote-read response
(storage/remote/read_handler.go:188) — chunks are encoded driver-side
on already-collected, selectivity-bounded query results, so this pure
Python codec is protocol plumbing, not a data-path operator.
"""

from __future__ import annotations

import struct

_CHUNK_HEADER = 2
#: reference head appender targets 120 samples per chunk
#: (tsdb/head_append.go samplesPerChunk)
SAMPLES_PER_CHUNK = 120


class _BitWriter:
    """MSB-first bit stream (bstream.go)."""

    def __init__(self, seed: bytes = b""):
        self.stream = bytearray(seed)
        self.count = 0  # valid bits still writable in the last byte

    def write_bit(self, bit: int) -> None:
        if self.count == 0:
            self.stream.append(0)
            self.count = 8
        if bit:
            self.stream[-1] |= 1 << (self.count - 1)
        self.count -= 1

    def write_byte(self, byt: int) -> None:
        if self.count == 0:
            self.stream.append(byt & 0xFF)
            return
        # fill the partial byte, spill the rest into a new one
        self.stream[-1] |= (byt >> (8 - self.count)) & 0xFF
        self.stream.append((byt << self.count) & 0xFF)

    def write_bits(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        while nbits >= 8:
            nbits -= 8
            self.write_byte((value >> nbits) & 0xFF)
        for i in range(nbits - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def uvarint(self, v: int) -> None:
        while v >= 0x80:
            self.write_byte((v & 0x7F) | 0x80)
            v >>= 7
        self.write_byte(v)

    def varint(self, v: int) -> None:  # zigzag (binary.PutVarint)
        self.uvarint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # absolute bit position

    def read_bit(self) -> int:
        byt = self.data[self.pos >> 3]
        bit = (byt >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            out = (out << 1) | self.read_bit()
        return out

    def read_byte(self) -> int:
        return self.read_bits(8)

    def uvarint(self) -> int:
        out = shift = 0
        while True:
            b = self.read_byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def varint(self) -> int:
        u = self.uvarint()
        return (u >> 1) ^ -(u & 1)


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def _xor_write(w: _BitWriter, cur_bits: int, prev_bits: int, state: dict) -> None:
    delta = prev_bits ^ cur_bits
    if delta == 0:
        w.write_bit(0)
        return
    w.write_bit(1)
    leading = min(_clz64(delta), 31)  # clamp (xor.go:425)
    trailing = _ctz64(delta)
    if (
        state["leading"] != 0xFF
        and leading >= state["leading"]
        and trailing >= state["trailing"]
    ):
        w.write_bit(0)
        w.write_bits(
            delta >> state["trailing"],
            64 - state["leading"] - state["trailing"],
        )
        return
    state["leading"], state["trailing"] = leading, trailing
    w.write_bit(1)
    w.write_bits(leading, 5)
    sigbits = 64 - leading - trailing
    w.write_bits(sigbits, 6)  # sigbits==64 wraps to 0; decoder restores
    w.write_bits(delta >> trailing, sigbits)


def _xor_read(r: _BitReader, prev_bits: int, state: dict) -> int:
    if r.read_bit() == 0:
        return prev_bits
    if r.read_bit() == 0:
        leading, trailing = state["leading"], state["trailing"]
        if leading == 0xFF:  # corrupt stream; treat as full window
            leading = trailing = 0
    else:
        leading = r.read_bits(5)
        sigbits = r.read_bits(6) or 64
        trailing = 64 - leading - sigbits
        state["leading"], state["trailing"] = leading, trailing
    sigbits = 64 - leading - trailing
    return prev_bits ^ (r.read_bits(sigbits) << trailing)


def _bit_range(x: int, nbits: int) -> bool:
    return -((1 << (nbits - 1)) - 1) <= x <= 1 << (nbits - 1)


def xor_encode(samples: list[tuple[int, float]]) -> bytes:
    """[(t_ms, value)] → XOR chunk bytes (≤65535 samples)."""
    if len(samples) > 0xFFFF:
        raise ValueError("chunk capacity exceeded")
    w = _BitWriter(struct.pack(">H", len(samples)))
    state = {"leading": 0xFF, "trailing": 0}
    prev_t = prev_bits = 0
    t_delta = 0
    for i, (t, v) in enumerate(samples):
        bits = struct.unpack("<Q", struct.pack("<d", float(v)))[0]
        if i == 0:
            w.varint(t)
            w.write_bits(bits, 64)
        elif i == 1:
            # uint64 wraparound for negative deltas (xor.go:156 uint64 cast)
            t_delta = t - prev_t
            w.uvarint(t_delta & 0xFFFFFFFFFFFFFFFF)
            _xor_write(w, bits, prev_bits, state)
        else:
            dod = (t - prev_t) - t_delta
            t_delta = t - prev_t
            if dod == 0:
                w.write_bit(0)
            elif _bit_range(dod, 14):
                w.write_bits(0b10, 2)
                w.write_bits(dod, 14)
            elif _bit_range(dod, 17):
                w.write_bits(0b110, 3)
                w.write_bits(dod, 17)
            elif _bit_range(dod, 20):
                w.write_bits(0b1110, 4)
                w.write_bits(dod, 20)
            else:
                w.write_bits(0b1111, 4)
                w.write_bits(dod, 64)
            _xor_write(w, bits, prev_bits, state)
        prev_t, prev_bits = t, bits
    return bytes(w.stream)


def _sign_extend(value: int, nbits: int) -> int:
    # xor.go:385: strictly-greater comparison → asymmetric range
    if value > (1 << (nbits - 1)):
        value -= 1 << nbits
    return value


def xor_decode(data: bytes) -> list[tuple[int, float]]:
    """XOR chunk bytes → [(t_ms, value)]."""
    (num,) = struct.unpack(">H", data[:_CHUNK_HEADER])
    r = _BitReader(data[_CHUNK_HEADER:])
    state = {"leading": 0xFF, "trailing": 0}
    out: list[tuple[int, float]] = []
    t = bits = 0
    t_delta = 0
    for i in range(num):
        if i == 0:
            t = r.varint()
            bits = r.read_bits(64)
        elif i == 1:
            t_delta = r.uvarint()
            if t_delta >= 1 << 63:  # uint64 wrap of a negative delta
                t_delta -= 1 << 64
            t += t_delta
            bits = _xor_read(r, bits, state)
        else:
            d = 0
            while d < 4 and r.read_bit():
                d += 1
            if d == 0:
                dod = 0
            elif d == 1:
                dod = _sign_extend(r.read_bits(14), 14)
            elif d == 2:
                dod = _sign_extend(r.read_bits(17), 17)
            elif d == 3:
                dod = _sign_extend(r.read_bits(20), 20)
            else:
                dod = r.read_bits(64)
                if dod >= 1 << 63:
                    dod -= 1 << 64
            t_delta += dod
            t += t_delta
            bits = _xor_read(r, bits, state)
        out.append((t, struct.unpack("<d", struct.pack("<Q", bits))[0]))
    return out


def chunk_series(
    samples: list[tuple[int, float]],
    samples_per_chunk: int = SAMPLES_PER_CHUNK,
) -> list[tuple[int, int, bytes]]:
    """Split one series into XOR chunks of ≤ samples_per_chunk samples;
    returns [(min_t, max_t, chunk_bytes)] in time order."""
    out = []
    for i in range(0, len(samples), samples_per_chunk):
        part = samples[i : i + samples_per_chunk]
        out.append((part[0][0], part[-1][0], xor_encode(part)))
    return out


# --- XOR2 chunks (tsdb/chunkenc/xor2.go) ------------------------------------
#
# XOR2 replaces the separate dod + value prefixes with a JOINT control
# prefix per sample (>= 2) and adds an optional start-timestamp (ST)
# stream.  Layout: 2-byte BE count + 1-byte ST header (bit 7 =
# firstSTKnown, bits 6-0 = firstSTChangeOn; st.go:37-55) + bitstream.
#
# Joint control (xor2.go:19-26):
#   0     dod=0, value unchanged
#   10    dod=0, value changed        (then <varbit_xor2_nn>)
#   110   13-bit signed dod, byte-packed  (then <varbit_xor2>)
#   1110  20-bit signed dod, byte-packed  (then <varbit_xor2>)
#   11110 64-bit dod escape               (then <varbit_xor2>)
#   11111 dod=0, stale NaN
#
# <varbit_xor2>  (xor2.go:31-36):  0 unchanged | 10 reuse window |
#                110 new window | 111 stale NaN
# <varbit_xor2_nn> (xor2.go:38-41): 0 reuse window | 1 new window
#
# Values XOR against the last NON-stale value (xor2Iterator.baselineV,
# xor2.go:500), unlike EncXOR which XORs against the raw previous bits.
# ST deltas are (prevT - st), first recorded at firstSTChangeOn then
# delta-encoded with putVarbitInt (st.go:58-100; the appender's
# putVarbitIntFast writes identical bits).

#: value/value.go StaleNaN — bit-exact staleness marker
STALE_NAN_BITS = 0x7FF0000000000002

#: st.go:19 — an ST change later than this index forces an early record
_MAX_FIRST_ST_CHANGE_ON = 0x7F


def _xor2_write_vdelta(w: _BitWriter, vbits: int, baseline: int, state: dict) -> None:
    """<varbit_xor2> — the dod≠0 value encoding (xor2Appender.writeVDelta)."""
    if vbits == STALE_NAN_BITS:
        w.write_bits(0b111, 3)
        return
    delta = vbits ^ baseline
    if delta == 0:
        w.write_bit(0)
        return
    if _xor2_window_fits(delta, state):
        w.write_bits(0b10, 2)
        w.write_bits(
            delta >> state["trailing"],
            64 - state["leading"] - state["trailing"],
        )
        return
    _xor2_new_window(w, delta, state, prefix=0b110, plen=3)


def _xor2_window_fits(delta: int, state: dict) -> bool:
    leading = min(_clz64(delta), 31)
    trailing = _ctz64(delta)
    return (
        state["leading"] != 0xFF
        and leading >= state["leading"]
        and trailing >= state["trailing"]
    )


def _xor2_new_window(w: _BitWriter, delta: int, state: dict, prefix: int, plen: int) -> None:
    leading = min(_clz64(delta), 31)
    trailing = _ctz64(delta)
    state["leading"], state["trailing"] = leading, trailing
    w.write_bits(prefix, plen)
    w.write_bits(leading, 5)
    sigbits = 64 - leading - trailing
    w.write_bits(sigbits, 6)  # 64 wraps to 0; decoder restores
    w.write_bits(delta >> trailing, sigbits)


def _xor2_write_vdelta_nn(w: _BitWriter, delta: int, state: dict) -> None:
    """<varbit_xor2_nn> — dod=0, value-changed encoding
    (xor2Appender.writeVDeltaKnownNonZero; delta is non-zero)."""
    if _xor2_window_fits(delta, state):
        w.write_bit(0)
        w.write_bits(
            delta >> state["trailing"],
            64 - state["leading"] - state["trailing"],
        )
        return
    _xor2_new_window(w, delta, state, prefix=1, plen=1)


def xor2_encode(
    samples: list[tuple[int, float]], sts: list[int] | None = None
) -> bytes:
    """[(t_ms, value)] → XOR2 chunk bytes (enc 4).  ``sts`` optionally
    carries a start timestamp per sample (0 = unknown, the reference's
    sentinel); omitted → the ST header stays 0x00 and the stream carries
    no ST bits (xor2.go:48-54)."""
    n = len(samples)
    if n > 0xFFFF:
        raise ValueError("chunk capacity exceeded")
    st_list = [int(s) for s in sts] if sts is not None else [0] * n
    w = _BitWriter(struct.pack(">H", n) + b"\x00")
    state = {"leading": 0xFF, "trailing": 0}
    baseline = 0  # bits of the last non-stale value
    prev_t = t_delta = 0
    prev_st = st_diff = 0
    first_st_change_on = 0
    for i, (t, v) in enumerate(samples):
        st = st_list[i]
        vbits = _f64_bits(float(v))
        if i == 0:
            w.varint(t)
            w.write_bits(vbits, 64)
            if st != 0:
                w.varint(t - st)
                w.stream[2] |= 0x80  # firstSTKnown
        elif i == 1:
            t_delta = t - prev_t
            # Go stores tDelta as uint64 (xor2.go:207) — a negative delta
            # wraps through two's complement and round-trips via the
            # iterator's int64 re-cast
            w.uvarint(t_delta & 0xFFFFFFFFFFFFFFFF)
            _xor2_write_vdelta(w, vbits, baseline, state)
            if st != prev_st:
                st_diff = prev_t - st
                first_st_change_on = 1
                w.stream[2] |= 1
                _varbit_int(w, st_diff)
        else:
            new_delta = t - prev_t
            dod = new_delta - t_delta
            t_delta = new_delta
            if dod == 0:
                if vbits == STALE_NAN_BITS:
                    w.write_bits(0b11111, 5)
                elif vbits == baseline:
                    w.write_bit(0)
                else:
                    w.write_bits(0b10, 2)
                    _xor2_write_vdelta_nn(w, vbits ^ baseline, state)
            else:
                if -(1 << 12) <= dod <= (1 << 12) - 1:
                    # prefix 110 packed with the top 5 dod bits → 2 bytes
                    w.write_byte(0b1100_0000 | ((dod >> 8) & 0x1F))
                    w.write_byte(dod & 0xFF)
                elif -(1 << 19) <= dod <= (1 << 19) - 1:
                    w.write_byte(0b1110_0000 | ((dod >> 16) & 0x0F))
                    w.write_byte((dod >> 8) & 0xFF)
                    w.write_byte(dod & 0xFF)
                else:
                    w.write_bits(0b11110, 5)
                    w.write_bits(dod, 64)
                _xor2_write_vdelta(w, vbits, baseline, state)
            # ST stream (xor2.go Append default arm)
            if first_st_change_on == 0 and st == prev_st and i != _MAX_FIRST_ST_CHANGE_ON:
                pass
            elif first_st_change_on == 0:
                st_diff = prev_t - st
                first_st_change_on = i
                w.stream[2] |= i & 0x7F
                _varbit_int(w, st_diff)
            else:
                new_diff = prev_t - st
                _varbit_int(w, new_diff - st_diff)
                st_diff = new_diff
        if vbits != STALE_NAN_BITS:
            baseline = vbits
        prev_t, prev_st = t, st
    return bytes(w.stream)


def _xor2_read_window(r: _BitReader, baseline: int, state: dict) -> int:
    """Reuse-window read: sz bits shifted by the current trailing."""
    sz = 64 - state["leading"] - state["trailing"]
    return baseline ^ (r.read_bits(sz) << state["trailing"])


def _xor2_read_new_window(r: _BitReader, baseline: int, state: dict) -> int:
    leading = r.read_bits(5)
    sigbits = r.read_bits(6) or 64
    state["leading"], state["trailing"] = leading, 64 - leading - sigbits
    return baseline ^ (r.read_bits(sigbits) << state["trailing"])


def _xor2_read_vdelta(r: _BitReader, baseline: int, state: dict) -> int:
    """<varbit_xor2>: 0 unchanged | 10 reuse | 110 new | 111 stale."""
    if r.read_bit() == 0:
        return baseline
    if r.read_bit() == 0:
        return _xor2_read_window(r, baseline, state)
    if r.read_bit() == 0:
        return _xor2_read_new_window(r, baseline, state)
    return STALE_NAN_BITS


def xor2_st_decode(data: bytes) -> list[tuple[int, int, float]]:
    """XOR2 chunk bytes → [(st_ms, t_ms, value)] (st 0 = unknown)."""
    (num,) = struct.unpack(">H", data[:2])
    first_st_known = bool(data[2] & 0x80)
    first_st_change_on = data[2] & 0x7F
    r = _BitReader(data[3:])
    state = {"leading": 0, "trailing": 0}
    out: list[tuple[int, int, float]] = []
    baseline = 0
    t = t_delta = 0
    st = st_diff = 0
    for i in range(num):
        prev_t = t
        if i == 0:
            t = r.varint()
            vbits = r.read_bits(64)
            if first_st_known:
                st = t - r.varint()
        elif i == 1:
            t_delta = r.uvarint()
            if t_delta >= 1 << 63:  # uint64 wrap of a negative delta
                t_delta -= 1 << 64
            t += t_delta
            vbits = _xor2_read_vdelta(r, baseline, state)
            if first_st_change_on == 1:
                st_diff = _read_varbit_int(r)
                st = prev_t - st_diff
        else:
            ones = 0
            while ones < 4 and r.read_bit():
                ones += 1
            if ones == 0:  # dod=0, unchanged
                t += t_delta
                vbits = baseline
            elif ones == 1:  # dod=0, value changed
                t += t_delta
                if r.read_bit() == 0:
                    vbits = _xor2_read_window(r, baseline, state)
                else:
                    vbits = _xor2_read_new_window(r, baseline, state)
            elif ones < 4:  # 13- or 20-bit dod
                width = 13 if ones == 2 else 20
                b = r.read_bits(width)
                if b >= 1 << (width - 1):  # xor2.go readDod: >= (symmetric)
                    b -= 1 << width
                t_delta += b
                t += t_delta
                vbits = _xor2_read_vdelta(r, baseline, state)
            elif r.read_bit() == 0:  # 11110: 64-bit dod escape
                b = r.read_bits(64)
                if b >= 1 << 63:
                    b -= 1 << 64
                t_delta += b
                t += t_delta
                vbits = _xor2_read_vdelta(r, baseline, state)
            else:  # 11111: dod=0, stale NaN
                t += t_delta
                vbits = STALE_NAN_BITS
            if first_st_change_on > 0 and i >= first_st_change_on:
                sdod = _read_varbit_int(r)
                st_diff = sdod if i == first_st_change_on else st_diff + sdod
                st = prev_t - st_diff
        if vbits != STALE_NAN_BITS:
            baseline = vbits
        out.append((st, t, _bits_f64(vbits)))
    return out


def xor2_decode(data: bytes) -> list[tuple[int, float]]:
    """XOR2 chunk bytes → [(t_ms, value)] (ST stream decoded, dropped)."""
    return [(t, v) for _st, t, v in xor2_st_decode(data)]


# --- shared ST stream codec (tsdb/chunkenc/st.go stEncoder/stDecoder) ------
#
# The histogram ST chunks (enc 5/6) append start-timestamp data AFTER
# each sample's base encoding.  The ST header byte (bit 7 firstSTKnown,
# bits 6-0 firstSTChangeOn) sits at stream index 2 in all three ST
# layouts — xor2's byte after the count, and byte 2 of the 3-byte
# histogram ST header.


class _STEncoder:
    """st.go:26-100 — tracks st/stDiff/firstSTChangeOn across appends.
    ``encode`` must run after each sample with ``num`` = 1-based count."""

    def __init__(self) -> None:
        self.st = 0
        self.st_diff = 0
        self.change_on = 0

    def encode(self, w: _BitWriter, num: int, cur_t: int, prev_t: int, st: int) -> None:
        st = int(st)
        if num == 1:
            if st != 0:
                w.varint(cur_t - st)
                w.stream[2] |= 0x80
        elif num == 2:
            if st != self.st:
                self.st_diff = prev_t - st
                self.change_on = 1
                w.stream[2] |= 1
                _varbit_int(w, self.st_diff)
        elif self.change_on == 0:
            # forced record at maxFirstSTChangeOn keeps the 7-bit header
            # valid even if ST first changes on a later sample (st.go:81)
            if st != self.st or num - 1 == _MAX_FIRST_ST_CHANGE_ON:
                self.st_diff = prev_t - st
                self.change_on = num - 1
                w.stream[2] |= self.change_on & 0x7F
                _varbit_int(w, self.st_diff)
        else:
            new_diff = prev_t - st
            _varbit_int(w, new_diff - self.st_diff)
            self.st_diff = new_diff
        self.st = st


class _STDecoder:
    """st.go:102-139 — mirrors :class:`_STEncoder` on the read side."""

    def __init__(self, header_byte: int) -> None:
        self.known = bool(header_byte & 0x80)
        self.change_on = header_byte & 0x7F
        self.st = 0
        self.st_diff = 0

    def decode(self, r: _BitReader, num_read: int, cur_t: int, prev_t: int) -> int:
        if num_read == 1:
            if self.known:
                self.st = cur_t - r.varint()
        elif num_read == 2:
            if self.change_on == 1:
                self.st_diff = _read_varbit_int(r)
                self.st = prev_t - self.st_diff
        elif self.change_on > 0 and num_read - 1 >= self.change_on:
            sdod = _read_varbit_int(r)
            if num_read - 1 == self.change_on:
                self.st_diff = sdod
            else:
                self.st_diff += sdod
            self.st = prev_t - self.st_diff
        return self.st


# --- FLOAT_HISTOGRAM chunks (tsdb/chunkenc/float_histogram.go) -------------
#
# Layout: 2-byte BE sample count + 1 flag byte (counter-reset header in
# the top 2 bits, histogram.go:69-86) + bitstream.  The first sample
# writes the chunk layout (zero threshold, varbit schema, varbit spans,
# custom bounds for NHCB schemas — histogram_meta.go:22-130) then raw
# 64-bit count/zeroCount/sum/buckets; later samples write a varbit
# timestamp dod and XOR-encode every value stream with per-stream
# leading/trailing windows (count/zeroCount/sum AND buckets all start
# with the 0xff "no window yet" sentinel — float_histogram.go:93,556-612 —
# so the first changed value always opens a fresh window instead of
# taking the reuse branch with a full-width 64-bit window).

#: model/histogram.go CustomBucketsSchema — NHCB layouts carry bounds
CUSTOM_BUCKETS_SCHEMA = -53

_CR_HINT_TO_HEADER = {1: 0x80, 2: 0x40, 3: 0xC0}  # prompb hint → header
_CR_HEADER_TO_HINT = {v: k for k, v in _CR_HINT_TO_HEADER.items()}


def _varbit_int(w: _BitWriter, val: int) -> None:
    """varbit.go:35 putVarbitInt — dod-tuned bit bucketing."""
    for nbits, prefix, plen in (
        (3, 0b10, 2), (6, 0b110, 3), (9, 0b1110, 4), (12, 0b11110, 5),
        (18, 0b111110, 6), (25, 0b1111110, 7), (56, 0b11111110, 8),
    ):
        if val == 0:
            w.write_bit(0)
            return
        if -((1 << (nbits - 1)) - 1) <= val <= 1 << (nbits - 1):
            w.write_bits(prefix, plen)
            w.write_bits(val, nbits)
            return
    w.write_bits(0b11111111, 8)
    w.write_bits(val, 64)


def _read_varbit_int(r: _BitReader) -> int:
    d = 0
    for _ in range(8):
        d <<= 1
        if r.read_bit() == 0:
            break
        d |= 1
    sizes = {0b10: 3, 0b110: 6, 0b1110: 9, 0b11110: 12,
             0b111110: 18, 0b1111110: 25, 0b11111110: 56}
    if d == 0:
        return 0
    if d == 0b11111111:
        v = r.read_bits(64)
        return v - (1 << 64) if v >= 1 << 63 else v
    sz = sizes[d]
    v = r.read_bits(sz)
    if v > 1 << (sz - 1):
        v -= 1 << sz
    return v


def _varbit_uint(w: _BitWriter, val: int) -> None:
    for nbits, prefix, plen in (
        (3, 0b10, 2), (6, 0b110, 3), (9, 0b1110, 4), (12, 0b11110, 5),
        (18, 0b111110, 6), (25, 0b1111110, 7), (56, 0b11111110, 8),
    ):
        if val == 0:
            w.write_bit(0)
            return
        if val < (1 << nbits):
            w.write_bits(prefix, plen)
            w.write_bits(val, nbits)
            return
    w.write_bits(0b11111111, 8)
    w.write_bits(val, 64)


def _read_varbit_uint(r: _BitReader) -> int:
    d = 0
    for _ in range(8):
        d <<= 1
        if r.read_bit() == 0:
            break
        d |= 1
    sizes = {0b10: 3, 0b110: 6, 0b1110: 9, 0b11110: 12,
             0b111110: 18, 0b1111110: 25, 0b11111110: 56}
    if d == 0:
        return 0
    return r.read_bits(64 if d == 0b11111111 else sizes[d])


def _f64_bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", float(v)))[0]


def _bits_f64(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b))[0]


def _put_zero_threshold(w: _BitWriter, threshold: float) -> None:
    """histogram_meta.go:146 putZeroThreshold — one byte for powers of
    two in [2^-243, 2^10], 255+raw float otherwise."""
    import math

    if threshold == 0:
        w.write_byte(0)
        return
    frac, exp = math.frexp(threshold)
    if frac != 0.5 or exp < -242 or exp > 11:
        w.write_byte(255)
        w.write_bits(_f64_bits(threshold), 64)
        return
    w.write_byte(exp + 243)


def _read_zero_threshold(r: _BitReader) -> float:
    import math

    b = r.read_byte()
    if b == 0:
        return 0.0
    if b == 255:
        return _bits_f64(r.read_bits(64))
    return math.ldexp(0.5, b - 243)


def _put_custom_bound(w: _BitWriter, f: float) -> None:
    """histogram_meta.go:200 putCustomBound — millis-scaled varbit for
    typical bounds, raw float fallback."""
    tf = f * 1000
    if tf < 0 or tf > 33554430 or round(tf) != tf:
        w.write_bit(0)
        w.write_bits(_f64_bits(f), 64)
        return
    _varbit_uint(w, int(round(tf)) + 1)


def _read_custom_bound(r: _BitReader) -> float:
    b = _read_varbit_uint(r)
    if b == 0:
        return _bits_f64(r.read_bits(64))
    return (b - 1) / 1000


def _layout_key(h: dict) -> tuple:
    return (
        h.get("schema", 0),
        h.get("zero_threshold", 0.0),
        tuple((s["offset"], s["length"]) for s in h.get("pos_spans") or []),
        tuple((s["offset"], s["length"]) for s in h.get("neg_spans") or []),
        tuple(h.get("custom_values") or []),
    )


def fh_encode(
    samples: list[tuple[int, dict]], sts: list[int] | None = None
) -> bytes:
    """[(t_ms, hist_dict)] → FLOAT_HISTOGRAM chunk bytes.  Every sample
    must share the first sample's layout (use :func:`chunk_fh_series`
    to split on layout changes).

    Passing ``sts`` (one start timestamp per sample, 0 = unknown)
    switches to the FLOAT_HISTOGRAM_ST layout (enc 6,
    float_histogram_st.go): 3-byte header = counter-reset bits 7-6 of
    byte 0 + 14-bit BE count in bytes 0-1 + ST header byte 2, with the
    ST stream interleaved after each sample's base encoding."""
    first = samples[0][1]
    header = _CR_HINT_TO_HEADER.get(int(first.get("counter_reset_hint", 0)), 0)
    st_enc: _STEncoder | None = None
    if sts is not None:
        if len(samples) > 0x3FFF:
            raise ValueError("ST chunk capacity exceeded")
        n = len(samples)
        w = _BitWriter(bytes([header | ((n >> 8) & 0x3F), n & 0xFF, 0]))
        st_enc = _STEncoder()
    else:
        if len(samples) > 0xFFFF:
            raise ValueError("chunk capacity exceeded")
        w = _BitWriter(struct.pack(">H", len(samples)) + bytes([header]))
    schema = int(first.get("schema", 0))
    _put_zero_threshold(w, float(first.get("zero_threshold", 0.0)))
    _varbit_int(w, schema)
    for spans in (first.get("pos_spans") or [], first.get("neg_spans") or []):
        _varbit_uint(w, len(spans))
        for s in spans:
            _varbit_uint(w, int(s["length"]))
            _varbit_int(w, int(s["offset"]))
    if schema == CUSTOM_BUCKETS_SCHEMA:
        bounds = first.get("custom_values") or []
        _varbit_uint(w, len(bounds))
        for b in bounds:
            _put_custom_bound(w, float(b))

    n_pos = len(first.get("pos_buckets") or [])
    n_neg = len(first.get("neg_buckets") or [])
    # per-stream XOR windows all start at the 0xff "no window" sentinel
    # (float_histogram.go:93 appender init), so the first changed value
    # opens a tight window instead of reusing a full-width one
    cnt = {"leading": 0xFF, "trailing": 0}
    zcnt = {"leading": 0xFF, "trailing": 0}
    sm = {"leading": 0xFF, "trailing": 0}
    pstates = [{"leading": 0xFF, "trailing": 0} for _ in range(n_pos)]
    nstates = [{"leading": 0xFF, "trailing": 0} for _ in range(n_neg)]
    prev = {"cnt": 0, "zcnt": 0, "sum": 0, "pos": [0] * n_pos, "neg": [0] * n_neg}
    prev_t = t_delta = 0
    for i, (t, h) in enumerate(samples):
        if i == 0:
            _varbit_int(w, t)
            for v in (h.get("count", 0.0), h.get("zero_count", 0.0), h.get("sum", 0.0)):
                w.write_bits(_f64_bits(v), 64)
            for v in h.get("pos_buckets") or []:
                w.write_bits(_f64_bits(v), 64)
            for v in h.get("neg_buckets") or []:
                w.write_bits(_f64_bits(v), 64)
        else:
            dod = (t - prev_t) - t_delta
            t_delta = t - prev_t
            _varbit_int(w, dod)
            for state, key, v in (
                (cnt, "cnt", h.get("count", 0.0)),
                (zcnt, "zcnt", h.get("zero_count", 0.0)),
                (sm, "sum", h.get("sum", 0.0)),
            ):
                _xor_write(w, _f64_bits(v), prev[key], state)
                prev[key] = _f64_bits(v)
            for j, v in enumerate(h.get("pos_buckets") or []):
                _xor_write(w, _f64_bits(v), prev["pos"][j], pstates[j])
                prev["pos"][j] = _f64_bits(v)
            for j, v in enumerate(h.get("neg_buckets") or []):
                _xor_write(w, _f64_bits(v), prev["neg"][j], nstates[j])
                prev["neg"][j] = _f64_bits(v)
        if i == 0:
            prev["cnt"] = _f64_bits(h.get("count", 0.0))
            prev["zcnt"] = _f64_bits(h.get("zero_count", 0.0))
            prev["sum"] = _f64_bits(h.get("sum", 0.0))
            prev["pos"] = [_f64_bits(v) for v in h.get("pos_buckets") or []]
            prev["neg"] = [_f64_bits(v) for v in h.get("neg_buckets") or []]
        if st_enc is not None:
            st_enc.encode(w, i + 1, t, prev_t, int(sts[i]))
        prev_t = t
    return bytes(w.stream)


def fh_decode(data: bytes) -> list[tuple[int, dict]]:
    """FLOAT_HISTOGRAM chunk bytes → [(t_ms, hist_dict)]."""
    return [(t, h) for _st, t, h in _fh_decode(data, st_mode=False)]


def fh_st_decode(data: bytes) -> list[tuple[int, int, dict]]:
    """FLOAT_HISTOGRAM_ST chunk bytes (enc 6) → [(st_ms, t_ms, hist_dict)]
    (st 0 = unknown)."""
    return _fh_decode(data, st_mode=True)


def _fh_decode(data: bytes, st_mode: bool) -> list[tuple[int, int, dict]]:
    if st_mode:
        num = struct.unpack(">H", data[:2])[0] & 0x3FFF
        hint = _CR_HEADER_TO_HINT.get(data[0] & 0xC0, 0)
        st_dec: _STDecoder | None = _STDecoder(data[2])
    else:
        (num,) = struct.unpack(">H", data[:2])
        hint = _CR_HEADER_TO_HINT.get(data[2] & 0xC0, 0)
        st_dec = None
    r = _BitReader(data[3:])
    zero_threshold = _read_zero_threshold(r)
    schema = _read_varbit_int(r)
    spans_out = []
    for _side in range(2):
        spans = []
        for _ in range(_read_varbit_uint(r)):
            length = _read_varbit_uint(r)
            offset = _read_varbit_int(r)
            spans.append({"offset": offset, "length": length})
        spans_out.append(spans)
    pos_spans, neg_spans = spans_out
    custom_values = []
    if schema == CUSTOM_BUCKETS_SCHEMA:
        custom_values = [
            _read_custom_bound(r) for _ in range(_read_varbit_uint(r))
        ]
    n_pos = sum(s["length"] for s in pos_spans)
    n_neg = sum(s["length"] for s in neg_spans)

    cnt = {"leading": 0xFF, "trailing": 0}
    zcnt = {"leading": 0xFF, "trailing": 0}
    sm = {"leading": 0xFF, "trailing": 0}
    pstates = [{"leading": 0xFF, "trailing": 0} for _ in range(n_pos)]
    nstates = [{"leading": 0xFF, "trailing": 0} for _ in range(n_neg)]
    prev = {"cnt": 0, "zcnt": 0, "sum": 0, "pos": [0] * n_pos, "neg": [0] * n_neg}
    out: list[tuple[int, int, dict]] = []
    t = t_delta = 0
    st = 0
    for i in range(num):
        prev_t = t
        if i == 0:
            t = _read_varbit_int(r)
            prev["cnt"] = r.read_bits(64)
            prev["zcnt"] = r.read_bits(64)
            prev["sum"] = r.read_bits(64)
            prev["pos"] = [r.read_bits(64) for _ in range(n_pos)]
            prev["neg"] = [r.read_bits(64) for _ in range(n_neg)]
        else:
            t_delta += _read_varbit_int(r)
            t += t_delta
            prev["cnt"] = _xor_read(r, prev["cnt"], cnt)
            prev["zcnt"] = _xor_read(r, prev["zcnt"], zcnt)
            prev["sum"] = _xor_read(r, prev["sum"], sm)
            prev["pos"] = [
                _xor_read(r, prev["pos"][j], pstates[j]) for j in range(n_pos)
            ]
            prev["neg"] = [
                _xor_read(r, prev["neg"][j], nstates[j]) for j in range(n_neg)
            ]
        if st_dec is not None:
            st = st_dec.decode(r, i + 1, t, prev_t)
        out.append((
            st,
            t,
            {
                "schema": schema,
                "zero_threshold": zero_threshold,
                "zero_count": _bits_f64(prev["zcnt"]),
                "count": _bits_f64(prev["cnt"]),
                "sum": _bits_f64(prev["sum"]),
                "pos_spans": [dict(s) for s in pos_spans],
                "pos_buckets": [_bits_f64(b) for b in prev["pos"]],
                "neg_spans": [dict(s) for s in neg_spans],
                "neg_buckets": [_bits_f64(b) for b in prev["neg"]],
                "custom_values": list(custom_values),
                "counter_reset_hint": hint,
            },
        ))
    return out


def hist_int_encode(
    samples: list[tuple[int, dict]], sts: list[int] | None = None
) -> bytes:
    """Integer HISTOGRAM chunk (enc 2, tsdb/chunkenc/histogram.go:558):
    bucket values are the model's delta-encoded int64s, timestamps/
    counts double-delta varbit, sum XOR.  The hist dicts here carry
    INTEGER semantics: ``pos_buckets``/``neg_buckets`` are per-bucket
    deltas (ints), count/zero_count integral.  Our engine stores float
    histograms and streams enc 3; this encoder exists for round-trip
    tests and for tooling that must write reference-native chunks."""
    first = samples[0][1]
    header = _CR_HINT_TO_HEADER.get(int(first.get("counter_reset_hint", 0)), 0)
    stenc: _STEncoder | None = None
    if sts is not None:
        # HISTOGRAM_ST layout (enc 5, histogram_st.go:27-32): CR bits 7-6
        # of byte 0, 14-bit BE count in bytes 0-1, ST header byte 2
        if len(samples) > 0x3FFF:
            raise ValueError("ST chunk capacity exceeded")
        n = len(samples)
        w = _BitWriter(bytes([header | ((n >> 8) & 0x3F), n & 0xFF, 0]))
        stenc = _STEncoder()
    else:
        if len(samples) > 0xFFFF:
            raise ValueError("chunk capacity exceeded")
        w = _BitWriter(struct.pack(">H", len(samples)) + bytes([header]))
    schema = int(first.get("schema", 0))
    _put_zero_threshold(w, float(first.get("zero_threshold", 0.0)))
    _varbit_int(w, schema)
    for spans in (first.get("pos_spans") or [], first.get("neg_spans") or []):
        _varbit_uint(w, len(spans))
        for s in spans:
            _varbit_uint(w, int(s["length"]))
            _varbit_int(w, int(s["offset"]))
    if schema == CUSTOM_BUCKETS_SCHEMA:
        bounds = first.get("custom_values") or []
        _varbit_uint(w, len(bounds))
        for b in bounds:
            _put_custom_bound(w, float(b))

    n_pos = len(first.get("pos_buckets") or [])
    n_neg = len(first.get("neg_buckets") or [])
    # histogram.go:107 — the appender's sum XOR window starts at 0xff
    sum_state = {"leading": 0xFF, "trailing": 0}
    prev_sum = 0
    st = {"t": 0, "tD": 0, "cnt": 0, "cntD": 0, "z": 0, "zD": 0,
          "pos": [0] * n_pos, "posD": [0] * n_pos,
          "neg": [0] * n_neg, "negD": [0] * n_neg}
    for i, (t, h) in enumerate(samples):
        prev_t = st["t"]
        if i == 0:
            _varbit_int(w, t)
            _varbit_uint(w, int(h.get("count", 0)))
            _varbit_uint(w, int(h.get("zero_count", 0)))
            w.write_bits(_f64_bits(h.get("sum", 0.0)), 64)
            for v in h.get("pos_buckets") or []:
                _varbit_int(w, int(v))
            for v in h.get("neg_buckets") or []:
                _varbit_int(w, int(v))
            st["t"], st["cnt"], st["z"] = t, int(h.get("count", 0)), int(
                h.get("zero_count", 0)
            )
            st["pos"] = [int(v) for v in h.get("pos_buckets") or []]
            st["neg"] = [int(v) for v in h.get("neg_buckets") or []]
        else:
            t_delta = t - st["t"]
            cnt_delta = int(h.get("count", 0)) - st["cnt"]
            z_delta = int(h.get("zero_count", 0)) - st["z"]
            _varbit_int(w, t_delta - st["tD"])
            _varbit_int(w, cnt_delta - st["cntD"])
            _varbit_int(w, z_delta - st["zD"])
            _xor_write(w, _f64_bits(h.get("sum", 0.0)), prev_sum, sum_state)
            for j, v in enumerate(h.get("pos_buckets") or []):
                delta = int(v) - st["pos"][j]
                _varbit_int(w, delta - st["posD"][j])
                st["posD"][j] = delta
                st["pos"][j] = int(v)
            for j, v in enumerate(h.get("neg_buckets") or []):
                delta = int(v) - st["neg"][j]
                _varbit_int(w, delta - st["negD"][j])
                st["negD"][j] = delta
                st["neg"][j] = int(v)
            st["t"], st["tD"] = t, t_delta
            st["cnt"], st["cntD"] = int(h.get("count", 0)), cnt_delta
            st["z"], st["zD"] = int(h.get("zero_count", 0)), z_delta
        if stenc is not None:
            stenc.encode(w, i + 1, t, prev_t, int(sts[i]))
        prev_sum = _f64_bits(h.get("sum", 0.0))
    return bytes(w.stream)


def hist_int_decode(data: bytes) -> list[tuple[int, dict]]:
    """Integer HISTOGRAM chunk (enc 2) → [(t_ms, FLOAT hist_dict)]:
    integer bucket deltas are prefix-summed into absolute float counts,
    the same conversion the reference's iterator exposes via
    AtFloatHistogram (histogram.go:1218-1240) and our prompb decoder
    applies — so enc-2 chunks from a reference server land in the same
    canonical shape as everything else."""
    return [(t, h) for _st, t, h in _hist_int_decode(data, st_mode=False)]


def hist_int_st_decode(data: bytes) -> list[tuple[int, int, dict]]:
    """HISTOGRAM_ST chunk bytes (enc 5) → [(st_ms, t_ms, FLOAT hist_dict)]
    (st 0 = unknown)."""
    return _hist_int_decode(data, st_mode=True)


def _hist_int_decode(data: bytes, st_mode: bool) -> list[tuple[int, int, dict]]:
    if st_mode:
        num = struct.unpack(">H", data[:2])[0] & 0x3FFF
        hint = _CR_HEADER_TO_HINT.get(data[0] & 0xC0, 0)
        stdec: _STDecoder | None = _STDecoder(data[2])
    else:
        (num,) = struct.unpack(">H", data[:2])
        hint = _CR_HEADER_TO_HINT.get(data[2] & 0xC0, 0)
        stdec = None
    r = _BitReader(data[3:])
    zero_threshold = _read_zero_threshold(r)
    schema = _read_varbit_int(r)
    spans_out = []
    for _side in range(2):
        spans = []
        for _ in range(_read_varbit_uint(r)):
            length = _read_varbit_uint(r)
            offset = _read_varbit_int(r)
            spans.append({"offset": offset, "length": length})
        spans_out.append(spans)
    pos_spans, neg_spans = spans_out
    custom_values = []
    if schema == CUSTOM_BUCKETS_SCHEMA:
        custom_values = [
            _read_custom_bound(r) for _ in range(_read_varbit_uint(r))
        ]
    n_pos = sum(s["length"] for s in pos_spans)
    n_neg = sum(s["length"] for s in neg_spans)

    sum_state = {"leading": 0xFF, "trailing": 0}
    st = {"t": 0, "tD": 0, "cnt": 0, "cntD": 0, "z": 0, "zD": 0,
          "sum": 0,
          "pos": [0] * n_pos, "posD": [0] * n_pos,
          "neg": [0] * n_neg, "negD": [0] * n_neg}
    out: list[tuple[int, int, dict]] = []
    sample_st = 0
    for i in range(num):
        prev_t = st["t"]
        if i == 0:
            st["t"] = _read_varbit_int(r)
            st["cnt"] = _read_varbit_uint(r)
            st["z"] = _read_varbit_uint(r)
            st["sum"] = r.read_bits(64)
            st["pos"] = [_read_varbit_int(r) for _ in range(n_pos)]
            st["neg"] = [_read_varbit_int(r) for _ in range(n_neg)]
        else:
            st["tD"] += _read_varbit_int(r)
            st["t"] += st["tD"]
            st["cntD"] += _read_varbit_int(r)
            st["cnt"] += st["cntD"]
            st["zD"] += _read_varbit_int(r)
            st["z"] += st["zD"]
            st["sum"] = _xor_read(r, st["sum"], sum_state)
            for j in range(n_pos):
                st["posD"][j] += _read_varbit_int(r)
                st["pos"][j] += st["posD"][j]
            for j in range(n_neg):
                st["negD"][j] += _read_varbit_int(r)
                st["neg"][j] += st["negD"][j]
        if stdec is not None:
            sample_st = stdec.decode(r, i + 1, st["t"], prev_t)

        def prefix(vals: list) -> list[float]:
            acc = 0
            out_ = []
            for v in vals:
                acc += v
                out_.append(float(acc))
            return out_

        out.append((
            sample_st,
            st["t"],
            {
                "schema": schema,
                "zero_threshold": zero_threshold,
                "zero_count": float(st["z"]),
                "count": float(st["cnt"]),
                "sum": _bits_f64(st["sum"]),
                "pos_spans": [dict(s) for s in pos_spans],
                "pos_buckets": prefix(st["pos"]),
                "neg_spans": [dict(s) for s in neg_spans],
                "neg_buckets": prefix(st["neg"]),
                "custom_values": list(custom_values),
                "counter_reset_hint": hint,
            },
        ))
    return out


def chunk_fh_series(
    samples: list[tuple[int, dict]],
    samples_per_chunk: int = SAMPLES_PER_CHUNK,
) -> list[tuple[int, int, bytes]]:
    """Split a histogram series into FLOAT_HISTOGRAM chunks, cutting on
    layout change (the reference recodes compatible layout expansions,
    tsdb/chunkenc/float_histogram.go:620 recode; cutting a fresh chunk
    is always a valid encoding) or at samples_per_chunk."""
    out = []
    run: list[tuple[int, dict]] = []
    key = None
    for t, h in samples:
        k = _layout_key(h)
        if run and (k != key or len(run) >= samples_per_chunk):
            out.append((run[0][0], run[-1][0], fh_encode(run)))
            run = []
        key = k
        run.append((t, h))
    if run:
        out.append((run[0][0], run[-1][0], fh_encode(run)))
    return out
