"""Pure-stdlib Zstandard codec (RFC 8878) — Kafka codec 4.

The reference's Kafka sink leaves compression to the client library
(src/output/apache_kafka.rs:31-115); Kafka brokers since 2.1 accept
codec 4 (zstd) in RecordBatch v2 attributes.  gzip/snappy/lz4 landed in
kafka_wire.py earlier in round 7; zstd was the one codec still
library-bound because its entropy stage (FSE + Huffman over backwards
bitstreams) is an order of magnitude more involved than LZ4's token
grammar.  This module closes it from the PUBLIC spec (RFC 8878 /
zstd.net format documentation):

- ``zstd_decompress``: the FULL decoder — frame header (window
  descriptor, single-segment, frame content size, dictionary-ID
  rejection), skippable frames, raw/RLE/compressed blocks, literals in
  all four forms (raw, RLE, Huffman 1-stream, Huffman 4-stream with
  jump table, treeless repeat), Huffman tree descriptions both direct
  (4-bit pairs) and FSE-compressed (two interleaved states), sequence
  tables in all four modes (predefined, RLE, FSE-compressed, repeat),
  the three-slot repeat-offset history with the literals-length-0
  special case, and xxhash64 content-checksum verification.
- ``zstd_compress``: a spec-legal encoder built from raw + RLE blocks
  (single-segment frame, frame content size, content checksum) — the
  same interop-over-ratio trade as the snappy/lz4 encoders: any zstd
  reader inflates it, the compression win stays with gzip.

Verification posture: unlike the other wire codecs this one has a
canonical reference IN the container (the ``zstd`` CLI), so the decoder
is tested against real frames at several levels — which exercise
predefined, FSE-compressed, RLE and repeat table modes, 1- and
4-stream Huffman literals and treeless blocks — plus corrupt-input
fuzzing under the uniform ValueError contract, and the encoder's
frames are round-tripped through ``zstd -d`` (tests/test_zstdcodec.py).

Scale posture: control-plane fallback, same as kafka_wire — the JVM
datasource (librdkafka-grade, native zstd) owns the bulk path on a
real cluster; this path exists so the produce/fetch protocol including
codec 4 is executable and byte-verified in-container.

Dictionaries are intentionally unsupported (Kafka never uses them);
frames that declare a dictionary ID raise.
"""

from __future__ import annotations

import struct

__all__ = ["ZstdError", "zstd_compress", "zstd_decompress", "xxhash64"]


class ZstdError(ValueError):
    """Corrupt, truncated, or unsupported zstd input.

    Subclasses ValueError so the uniform corrupt-input contract
    (tests/test_codec_fuzz.py) and kafka_wire's KafkaWireError wrapper
    both catch it naturally.
    """


_MAGIC = 0xFD2FB528
_SKIPPABLE_LO, _SKIPPABLE_HI = 0x184D2A50, 0x184D2A5F

# ---------------------------------------------------------------------------
# xxhash64 (public spec, same lineage as kafka_wire.xxhash32) — frame
# content checksums are the low 32 bits of XXH64(content, seed=0).
# ---------------------------------------------------------------------------

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            for i in range(4):
                lane = int.from_bytes(data[pos + 8 * i : pos + 8 * i + 8], "little")
                v = (v1, v2, v3, v4)[i]
                v = (v + lane * _P2) & _M64
                v = (_rotl64(v, 31) * _P1) & _M64
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k = int.from_bytes(data[pos : pos + 8], "little")
        k = (_rotl64((k * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl64(h ^ k, 27) * _P1) + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _M64
        h = ((_rotl64(h, 23) * _P2) + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Bitstreams.  zstd uses BOTH directions: table descriptions are read
# FORWARD (LSB-first within each byte); entropy payloads are read
# BACKWARD from the last byte, whose highest set bit is a padding
# sentinel, each read taking the next-lower bits.
# ---------------------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if (end + 7) // 8 > len(self.data):
            raise ZstdError("truncated FSE table description")
        acc = int.from_bytes(
            self.data[self.bitpos // 8 : (end + 7) // 8], "little"
        )
        val = (acc >> (self.bitpos % 8)) & ((1 << n) - 1)
        self.bitpos = end
        return val

    def rewind(self, n: int) -> None:
        self.bitpos -= n

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) // 8


class _BackBits:
    """Backward reader over an entropy payload.

    The final byte's highest set bit marks the end padding; reads
    consume from just below it moving toward the first byte.  Once the
    stream is exhausted further reads zero-pad (the FSE termination
    condition tracks ``avail`` explicitly).
    """

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("entropy bitstream missing padding sentinel")
        self.val = int.from_bytes(data, "little")
        self.pos = len(data) * 8 - 8 + data[-1].bit_length() - 1  # drop sentinel

    @property
    def avail(self) -> int:
        return self.pos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.val >> self.pos) & ((1 << n) - 1)
        usable = n + self.pos  # bits that actually existed
        if usable <= 0:
            return 0
        return (self.val & ((1 << usable) - 1)) << (n - usable)


# ---------------------------------------------------------------------------
# FSE — table description parse, decode-table build, interleaved decode
# ---------------------------------------------------------------------------


def _fse_read_distribution(
    bits: _ForwardBits, max_accuracy: int, max_symbol: int
) -> tuple[list[int], int]:
    """RFC 8878 §4.1.1: returns (probabilities incl. -1 entries, accuracy_log)."""
    accuracy = bits.read(4) + 5
    if accuracy > max_accuracy:
        raise ZstdError(f"FSE accuracy log {accuracy} > max {max_accuracy}")
    remaining = (1 << accuracy) + 1
    probs: list[int] = []
    while remaining > 1 and len(probs) <= max_symbol:
        nbits = remaining.bit_length()
        val = bits.read(nbits)
        low_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        if (val & low_mask) < threshold:
            bits.rewind(1)
            val &= low_mask
        elif val > low_mask:
            val -= threshold
        prob = val - 1
        probs.append(prob)
        remaining -= 1 if prob < 0 else prob
        if prob == 0:
            while True:
                rep = bits.read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return probs, accuracy


class _FseTable:
    __slots__ = ("accuracy", "symbols", "nbits", "base")

    def __init__(self, probs: list[int], accuracy: int):
        size = 1 << accuracy
        self.accuracy = accuracy
        symbols = [0] * size
        high = size - 1
        counts = [0] * len(probs)
        for sym, p in enumerate(probs):
            if p == -1:  # less-than-one probability: one cell at the top
                symbols[high] = sym
                high -= 1
                counts[sym] = 1
            else:
                counts[sym] = p
        pos = 0
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        for sym, p in enumerate(probs):
            if p <= 0:
                continue
            for _ in range(p):
                symbols[pos] = sym
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE table spread did not close")
        nbits = [0] * size
        base = [0] * size
        state_desc = counts[:]
        for i in range(size):
            sym = symbols[i]
            d = state_desc[sym]
            state_desc[sym] += 1
            nb = accuracy - (d.bit_length() - 1)
            nbits[i] = nb
            base[i] = (d << nb) - size
        self.symbols = symbols
        self.nbits = nbits
        self.base = base

    @classmethod
    def rle(cls, symbol: int) -> "_FseTable":
        t = cls.__new__(cls)
        t.accuracy = 0
        t.symbols = [symbol]
        t.nbits = [0]
        t.base = [0]
        return t


def _fse_decompress_interleaved(table: _FseTable, bits: _BackBits) -> list[int]:
    """Two alternating states → symbol list (Huffman-weight streams)."""
    s1 = bits.read(table.accuracy)
    s2 = bits.read(table.accuracy)
    out: list[int] = []
    for _ in range(1 << 20):  # hard stop; real weight streams are ≤ 256 symbols
        out.append(table.symbols[s1])
        if bits.avail < table.nbits[s1]:
            out.append(table.symbols[s2])
            return out
        s1 = table.base[s1] + bits.read(table.nbits[s1])
        out.append(table.symbols[s2])
        if bits.avail < table.nbits[s2]:
            out.append(table.symbols[s1])
            return out
        s2 = table.base[s2] + bits.read(table.nbits[s2])
    raise ZstdError("runaway FSE weight stream")


# ---------------------------------------------------------------------------
# Huffman — weights → flat decode table; 1- and 4-stream literal decode
# ---------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("table_log", "symbols", "nbits")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("empty Huffman weight set")
        table_log = total.bit_length()  # smallest 2^k > total
        if table_log > 11:
            raise ZstdError("Huffman table log exceeds 11")
        left = (1 << table_log) - total
        if left & (left - 1):
            raise ZstdError("Huffman weights do not complete a power of two")
        weights = weights + [left.bit_length()]  # implicit last weight
        size = 1 << table_log
        symbols = bytearray(size)
        nbits = bytearray(size)
        pos = 0
        for w in range(1, table_log + 1):
            span = 1 << (w - 1)
            nb = table_log + 1 - w
            for sym, sw in enumerate(weights):
                if sw != w:
                    continue
                symbols[pos : pos + span] = bytes([sym]) * span
                nbits[pos : pos + span] = bytes([nb]) * span
                pos += span
        if pos != size:
            raise ZstdError("Huffman table fill mismatch")
        self.table_log = table_log
        self.symbols = bytes(symbols)
        self.nbits = bytes(nbits)

    def decode_stream(self, data: bytes, out_len: int) -> bytes:
        bits = _BackBits(data)
        tl = self.table_log
        symbols, nbits = self.symbols, self.nbits
        out = bytearray(out_len)
        for i in range(out_len):
            state = bits.read(tl)
            out[i] = symbols[state]
            bits.pos += tl - nbits[state]  # consume only the code's bits
            if bits.pos < -7:
                raise ZstdError("Huffman stream over-read")
        return bytes(out)


def _read_huffman_description(data: bytes, pos: int) -> tuple[_HufTable, int]:
    if pos >= len(data):
        raise ZstdError("missing Huffman tree description")
    hbyte = data[pos]
    pos += 1
    if hbyte < 128:
        # FSE-compressed weights: hbyte bytes of table description +
        # backwards bitstream, two interleaved states.
        payload = data[pos : pos + hbyte]
        if len(payload) < hbyte:
            raise ZstdError("truncated compressed Huffman weights")
        fb = _ForwardBits(payload)
        probs, accuracy = _fse_read_distribution(fb, 6, 255)
        table = _FseTable(probs, accuracy)
        stream = payload[fb.bytes_consumed() :]
        weights = _fse_decompress_interleaved(table, _BackBits(stream))
        pos += hbyte
    else:
        n = hbyte - 127
        nbytes = (n + 1) // 2
        raw = data[pos : pos + nbytes]
        if len(raw) < nbytes:
            raise ZstdError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        pos += nbytes
    if len(weights) > 255:
        raise ZstdError("too many Huffman weights")
    if any(w > 11 for w in weights):
        raise ZstdError("Huffman weight exceeds maximum")
    return _HufTable(weights), pos


# ---------------------------------------------------------------------------
# Sequence code tables (RFC 8878 §3.1.1.3.2.1) — baselines and extra bits
# ---------------------------------------------------------------------------

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# Predefined distributions (RFC 8878 §3.1.1.3.2.2) — (probs, accuracy_log)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYMBOL = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BlockState:
    """Entropy state carried across blocks within one frame: the last
    Huffman table (treeless literals), last FSE tables (repeat mode),
    and the three-slot repeat-offset history."""

    def __init__(self) -> None:
        self.huf: _HufTable | None = None
        self.fse: dict[str, _FseTable | None] = {"ll": None, "of": None, "ml": None}
        self.reps = [1, 4, 8]


def _decode_literals(
    block: bytes, pos: int, state: _BlockState
) -> tuple[bytes, int]:
    if pos >= len(block):
        raise ZstdError("missing literals section")
    b0 = block[pos]
    ltype = b0 & 0x03
    size_format = (b0 >> 2) & 0x03
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            if pos + 2 > len(block):
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) + (block[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(block):
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) + (block[pos + 1] << 4) + (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lit = block[pos : pos + regen]
            if len(lit) < regen:
                raise ZstdError("truncated raw literals")
            return lit, pos + regen
        if pos >= len(block):
            raise ZstdError("truncated RLE literal byte")
        return bytes([block[pos]]) * regen, pos + 1
    # Huffman-compressed (2) or treeless (3)
    if size_format == 0:
        if pos + 3 > len(block):
            raise ZstdError("truncated literals header")
        regen = (b0 >> 4) + ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) + (block[pos + 2] << 2)
        streams, pos = 1, pos + 3
    elif size_format == 1:
        if pos + 3 > len(block):
            raise ZstdError("truncated literals header")
        regen = (b0 >> 4) + ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) + (block[pos + 2] << 2)
        streams, pos = 4, pos + 3
    elif size_format == 2:
        if pos + 4 > len(block):
            raise ZstdError("truncated literals header")
        regen = (b0 >> 4) + (block[pos + 1] << 4) + ((block[pos + 2] & 0x03) << 12)
        comp = (block[pos + 2] >> 2) + (block[pos + 3] << 6)
        streams, pos = 4, pos + 4
    else:
        if pos + 5 > len(block):
            raise ZstdError("truncated literals header")
        regen = (b0 >> 4) + (block[pos + 1] << 4) + ((block[pos + 2] & 0x3F) << 12)
        comp = (block[pos + 2] >> 6) + (block[pos + 3] << 2) + (block[pos + 4] << 10)
        streams, pos = 4, pos + 5
    end = pos + comp
    if end > len(block):
        raise ZstdError("truncated compressed literals")
    if ltype == 2:
        state.huf, pos = _read_huffman_description(block, pos)
    elif state.huf is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    huf = state.huf
    payload = block[pos:end]
    if streams == 1:
        return huf.decode_stream(payload, regen), end
    if len(payload) < 6:
        raise ZstdError("missing 4-stream jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
    body = payload[6:]
    if s1 + s2 + s3 > len(body):
        raise ZstdError("jump table exceeds literals payload")
    part = (regen + 3) // 4
    sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
    lens = [part, part, part, regen - 3 * part]
    if lens[3] < 0:
        raise ZstdError("inconsistent 4-stream regenerated size")
    out = bytearray()
    off = 0
    for sz, ln in zip(sizes, lens):
        out += huf.decode_stream(body[off : off + sz], ln)
        off += sz
    return bytes(out), end


def _read_sequence_table(
    block: bytes, pos: int, mode: int, kind: str, state: _BlockState
) -> tuple[_FseTable, int]:
    if mode == 0:  # predefined
        probs, acc = _DEFAULTS[kind]
        table = _FseTable(probs, acc)
    elif mode == 1:  # RLE: one byte = the only symbol
        if pos >= len(block):
            raise ZstdError("truncated RLE sequence table")
        table = _FseTable.rle(block[pos])
        pos += 1
    elif mode == 2:  # FSE-compressed description
        fb = _ForwardBits(block[pos:])
        probs, acc = _fse_read_distribution(fb, _MAX_ACCURACY[kind], _MAX_SYMBOL[kind])
        table = _FseTable(probs, acc)
        pos += fb.bytes_consumed()
    else:  # repeat
        prev = state.fse[kind]
        if prev is None:
            raise ZstdError(f"repeat {kind} table with no previous block")
        table = prev
    state.fse[kind] = table
    return table, pos


def _decode_sequences(
    block: bytes, pos: int, literals: bytes, out: bytearray, state: _BlockState
) -> None:
    if pos >= len(block):
        raise ZstdError("missing sequences section")
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        out += literals
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if pos >= len(block):
            raise ZstdError("truncated sequence count")
        nseq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        if pos + 2 > len(block):
            raise ZstdError("truncated sequence count")
        nseq = struct.unpack_from("<H", block, pos)[0] + 0x7F00
        pos += 2
    if pos >= len(block):
        raise ZstdError("missing sequence compression modes")
    modes = block[pos]
    pos += 1
    if modes & 0x03:
        raise ZstdError("reserved sequence mode bits set")
    ll_table, pos = _read_sequence_table(block, pos, (modes >> 6) & 3, "ll", state)
    of_table, pos = _read_sequence_table(block, pos, (modes >> 4) & 3, "of", state)
    ml_table, pos = _read_sequence_table(block, pos, (modes >> 2) & 3, "ml", state)
    bits = _BackBits(block[pos:])
    ll_state = bits.read(ll_table.accuracy)
    of_state = bits.read(of_table.accuracy)
    ml_state = bits.read(ml_table.accuracy)
    lit_pos = 0
    reps = state.reps
    for i in range(nseq):
        of_code = of_table.symbols[of_state]
        if of_code > 31:
            raise ZstdError("offset code exceeds maximum")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_table.symbols[ml_state]
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_table.symbols[ll_state]
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        if offset_value > 3:
            offset = offset_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_value + (1 if ll == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 3:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # literals_length == 0 and offset_value == 3
                offset = reps[0] - 1
                if offset <= 0:
                    raise ZstdError("repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(literals):
            raise ZstdError("sequence literals overrun")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ZstdError("match offset beyond decoded window")
        if offset >= ml:
            out += out[-offset : len(out) - offset + ml]
        else:
            for _ in range(ml):  # overlapping copy = RLE-style extension
                out.append(out[-offset])
        if i + 1 < nseq:  # update order: LL, ML, OF; skipped after last
            ll_state = ll_table.base[ll_state] + bits.read(ll_table.nbits[ll_state])
            ml_state = ml_table.base[ml_state] + bits.read(ml_table.nbits[ml_state])
            of_state = of_table.base[of_state] + bits.read(of_table.nbits[of_state])
    if bits.avail < 0:
        raise ZstdError("sequence bitstream over-read")
    out += literals[lit_pos:]


def _decode_frame(data: bytes, pos: int, max_out: int, out: bytearray) -> int:
    desc = data[pos]
    pos += 1
    if desc & 0x08:
        raise ZstdError("reserved frame-descriptor bit set")
    fcs_flag = desc >> 6
    single_segment = bool(desc & 0x20)
    has_checksum = bool(desc & 0x04)
    did_size = (0, 1, 2, 4)[desc & 0x03]
    if not single_segment:
        if pos >= len(data):
            raise ZstdError("missing window descriptor")
        wd = data[pos]
        pos += 1
        window = (1 << (10 + (wd >> 3))) + ((1 << (10 + (wd >> 3))) >> 3) * (wd & 7)
        if window > (1 << 31):
            raise ZstdError("window size beyond supported maximum")
    if did_size:
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did:
            raise ZstdError("dictionary frames are not supported")
    fcs = None
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    if fcs_size:
        raw = data[pos : pos + fcs_size]
        if len(raw) < fcs_size:
            raise ZstdError("truncated frame content size")
        fcs = int.from_bytes(raw, "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    frame_start = len(out)
    state = _BlockState()
    while True:
        hdr = data[pos : pos + 3]
        if len(hdr) < 3:
            raise ZstdError("truncated block header")
        raw_hdr = int.from_bytes(hdr, "little")
        pos += 3
        last = raw_hdr & 1
        btype = (raw_hdr >> 1) & 3
        bsize = raw_hdr >> 3
        if btype == 0:  # raw
            chunk = data[pos : pos + bsize]
            if len(chunk) < bsize:
                raise ZstdError("truncated raw block")
            out += chunk
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= len(data):
                raise ZstdError("truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:  # compressed
            if bsize > (1 << 17):
                raise ZstdError("compressed block exceeds 128 KiB limit")
            block = data[pos : pos + bsize]
            if len(block) < bsize:
                raise ZstdError("truncated compressed block")
            pos += bsize
            literals, lpos = _decode_literals(block, 0, state)
            _decode_sequences(block, lpos, literals, out, state)
        else:
            raise ZstdError("reserved block type")
        if len(out) > max_out:
            raise ZstdError("decompressed output exceeds bound")
        if last:
            break
    if fcs is not None and len(out) - frame_start != fcs:
        raise ZstdError(
            f"frame content size mismatch: declared {fcs}, "
            f"decoded {len(out) - frame_start}"
        )
    if has_checksum:
        raw = data[pos : pos + 4]
        if len(raw) < 4:
            raise ZstdError("truncated content checksum")
        want = int.from_bytes(raw, "little")
        got = xxhash64(bytes(out[frame_start:])) & 0xFFFFFFFF
        if got != want:
            raise ZstdError("content checksum mismatch")
        pos += 4
    return pos


def zstd_decompress(data: bytes, max_out: int = 1 << 27) -> bytes:
    """Decode one or more concatenated zstd frames (skippable frames
    skipped), bounded by ``max_out``.  Raises :class:`ZstdError` on any
    corrupt, truncated, or unsupported input — never a bare
    IndexError/struct.error."""
    try:
        return _zstd_decompress(data, max_out)
    except ZstdError:
        raise
    except (IndexError, struct.error, OverflowError, MemoryError) as exc:
        raise ZstdError(f"corrupt zstd input: {exc!r}") from exc


def _zstd_decompress(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    pos = 0
    if not data:
        raise ZstdError("empty input")
    while pos < len(data):
        magic_raw = data[pos : pos + 4]
        if len(magic_raw) < 4:
            raise ZstdError("truncated frame magic")
        magic = int.from_bytes(magic_raw, "little")
        pos += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size_raw = data[pos : pos + 4]
            if len(size_raw) < 4:
                raise ZstdError("truncated skippable frame size")
            pos += 4 + int.from_bytes(size_raw, "little")
            if pos > len(data):
                raise ZstdError("skippable frame overruns input")
            continue
        if magic != _MAGIC:
            raise ZstdError(f"bad zstd magic 0x{magic:08X}")
        pos = _decode_frame(data, pos, max_out, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder — raw + RLE blocks, single frame, content checksum.
# ---------------------------------------------------------------------------

_MAX_BLOCK = (1 << 17) - 1  # raw-block size field is 21 bits; stay ≤ 128K-1


def _block_header(last: bool, btype: int, size: int) -> bytes:
    return ((1 if last else 0) | (btype << 1) | (size << 3)).to_bytes(3, "little")


def zstd_compress(data: bytes) -> bytes:
    """Spec-legal zstd frame of raw/RLE blocks: single-segment when the
    content fits one window, frame content size always present, content
    checksum on (what Kafka consumers verify).  Runs of ≥32 identical
    bytes become RLE blocks — the only compression this encoder does;
    the interop-over-ratio trade matches the snappy/lz4 encoders."""
    if len(data) <= 255:
        desc, fcs = 0x24, len(data).to_bytes(1, "little")  # FCS flag 0 + SS
    elif len(data) <= 65535 + 256:
        desc, fcs = 0x64, (len(data) - 256).to_bytes(2, "little")
    elif len(data) < (1 << 32):
        desc, fcs = 0xA4, len(data).to_bytes(4, "little")
    else:
        desc, fcs = 0xE4, len(data).to_bytes(8, "little")
    out = bytearray(struct.pack("<I", _MAGIC))
    out.append(desc)  # single-segment + checksum; window = content size
    out += fcs
    # Greedy blocking: emit an RLE block when a long constant run leads,
    # else a raw block up to the next long run (or the 128K cap).
    blocks: list[tuple[int, bytes | int]] = []  # (btype, payload | (byte,len))
    pos = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        run = 1
        while pos + run < n and run < _MAX_BLOCK and data[pos + run] == b:
            run += 1
        if run >= 32:
            blocks.append((1, (b, run)))
            pos += run
            continue
        end = min(pos + _MAX_BLOCK, n)
        cut = pos + run
        while cut < end:
            c = data[cut]
            r = 1
            while cut + r < end and r < 32 and data[cut + r] == c:
                r += 1
            if r >= 32:
                break
            cut += r
        blocks.append((0, data[pos:cut]))
        pos = cut
    if not blocks:
        blocks.append((0, b""))
    for i, (btype, payload) in enumerate(blocks):
        last = i == len(blocks) - 1
        if btype == 1:
            byte, run = payload  # type: ignore[misc]
            out += _block_header(last, 1, run)
            out.append(byte)
        else:
            out += _block_header(last, 0, len(payload))  # type: ignore[arg-type]
            out += payload  # type: ignore[operator]
    out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)
