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
            t_delta = t - prev_t
            w.uvarint(t_delta)
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
