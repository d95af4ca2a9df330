"""Baseline JPEG codec, numpy + stdlib only (no image libraries).

Closes the one declared multimodal gap (VERDICT r3 "What's missing" #2):
JPEG PIXEL decode. Scope -- the baseline sequential DCT process (ITU T.81):

  decode: SOI marker walk, DQT/DHT/SOF0/SOS parse, table-driven canonical
          Huffman entropy decode with byte-unstuffing, DC prediction,
          dequantize + dezigzag, float64 IDCT, level shift + clip, crop to
          the declared dimensions. Components with h=v=1 only (4:4:4 or
          grayscale); progressive (SOF2), subsampling and restart intervals
          are rejected loudly -- never silently wrong.
  encode: edge-padding to 8x8 blocks, FDCT, quality-scaled standard
          luminance quantization table (Annex K), zigzag run-length +
          canonical Huffman (standard luminance tables written into DHT
          and used for every component -- spec-legal, table-driven
          decoders read whatever DHT declares), byte stuffing, SOF0/SOS.

The decoder is TABLE-DRIVEN (tables come from the stream's own DQT/DHT),
so it decodes any compliant baseline 4:4:4 / grayscale JPEG, not just this
encoder's output. Grayscale block-constant images quantize to DC-only
blocks whose decoded pixels have an exact closed form (pixel =
clip(2 * rha((v - 128) / 2) + 128) at quality 50 where the DC quant step
is 16) -- that is what makes `jpeg_decode_gate` hash-exact against a SQL
oracle while full-gradient images exercise the AC path under the lossy-
roundtrip tests.

Rounding convention everywhere: round-half-away-from-zero (rha), chosen
over numpy's banker's rounding so the SQL oracle can mirror it exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# standard luminance quantization table (T.81 Annex K.1), natural order
STD_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# standard luminance Huffman tables (T.81 Annex K.3): BITS (codes per code
# length 1..16) and HUFFVAL (symbols in code order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    # anti-diagonals; odd diagonals run row-ascending, even ones row-descending
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZIGZAG = _zigzag_order()

# 8x8 DCT-II basis matrix: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
def _dct_matrix() -> np.ndarray:
    C = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            C[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_C = _dct_matrix()


def rha(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (the convention the SQL oracle mirrors).

    Inputs are snapped to 9 decimals first so float DCT noise (~1e-15
    relative) cannot flip an exact half-boundary -- without this, a
    constant block with odd (v - 128) quantizes to rha(k + 0.5 +- 1e-13)
    and the outcome depends on rounding-error sign, which no SQL closed
    form could reproduce."""
    x = np.round(np.asarray(x, dtype=np.float64), 9)
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def quality_scaled_quant(quality: int) -> np.ndarray:
    """IJG quality scaling of the standard luminance table (50 = as-is)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (STD_QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- canonical Huffman construction (T.81 C.2) ------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the table-driven decoder."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker: entropy data ended early
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code (corrupt stream or wrong table)")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_magnitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _decode_magnitude(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# --- encoder ----------------------------------------------------------------


def encode_jpeg(
    pixels: bytes, width: int, height: int, channels: int = 1, quality: int = 50
) -> bytes:
    """Baseline JPEG encoder: grayscale (1) or 4:4:4 YCbCr (3 -- input taken
    as R, G, B interleaved). Edge-pads to 8x8 blocks; every component uses
    the quality-scaled luminance quant table and the standard luminance
    Huffman tables (declared in DQT/DHT, so any table-driven decoder reads
    the output)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
    else:
        comps = [img[:, :, 0].astype(np.float64)]
    q = quality_scaled_quant(quality)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = []
    for comp in comps:
        p = np.pad(comp, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
        padded.append(p - 128.0)

    dc_codes = _huff_codes(DC_BITS, DC_VALS)
    ac_codes = _huff_codes(AC_BITS, AC_VALS)
    writer = _BitWriter()
    prev_dc = [0] * channels
    for by in range(bh):
        for bx in range(bw):
            for ci in range(channels):  # interleaved 4:4:4 MCU
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _C @ block @ _C.T
                zz = rha(coef / q).astype(np.int64)
                dc = int(zz[0, 0])
                diff = dc - prev_dc[ci]
                prev_dc[ci] = dc
                s = _category(diff)
                code, ln = dc_codes[s]
                writer.write(code, ln)
                if s:
                    writer.write(_encode_magnitude(diff, s), s)
                run = 0
                last_nz = 0
                seq = [int(zz[r, c]) for r, c in ZIGZAG[1:]]
                for k, v in enumerate(seq, start=1):
                    if v != 0:
                        last_nz = k
                for k, v in enumerate(seq, start=1):
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_codes[0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    writer.write(code, ln)
                    writer.write(_encode_magnitude(v, s), s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB
                    writer.write(code, ln)
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = bytes(int(q[r, c]) for r, c in ZIGZAG)
    dqt = seg(0xFFDB, b"\x00" + zz_q)
    ncomp = channels
    sof_comps = b"".join(struct.pack("BBB", i + 1, 0x11, 0) for i in range(ncomp))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps)
    dht = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + seg(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos_comps = b"".join(struct.pack("BB", i + 1, 0x00) for i in range(ncomp))
    sos = seg(0xFFDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


# --- decoder ----------------------------------------------------------------


def decode_jpeg(content: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG pixel decode, table-driven from the stream's own
    DQT/DHT. Supports 8-bit baseline (SOF0), 1 or 3 components, h=v=1,
    interleaved single scan, no restart intervals. Returns
    (width, height, channels, pixels) row-major interleaved (RGB for 3
    components). Every malformation raises ValueError -- callers rely on
    that single exception type to route corrupt payloads."""
    try:
        return _decode_jpeg(content)
    except (IndexError, KeyError, struct.error) as e:
        # out-of-range reads / missing tables on truncated or corrupt
        # streams; normalized so mapInPandas callers can pass the row
        # through instead of failing the batch
        raise ValueError(f"truncated or malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(content: bytes) -> tuple[int, int, int, bytes]:
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, quant_id, sampling)
    scan: list[tuple[int, int, int]] = []  # (comp_index, dc_id, ac_id)
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # ITU-T81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker; skip them so a padded-but-compliant stream isn't rejected
        # (a 0xFF "marker" byte would otherwise be parsed as a bogus segment)
        while pos + 1 < n and content[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= n:
            # stream tail is a run of 0xFF fill bytes with no marker byte
            # after them -- keep the every-malformation-raises-ValueError
            # contract instead of leaking IndexError from content[pos + 1]
            raise ValueError("truncated after fill bytes")
        if pos + 4 > n and content[pos + 1] != 0xD9:
            break
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(payload):
                prec, tid = payload[i] >> 4, payload[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = payload[i + 1 + k]
                quant[tid] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(payload):
                tclass, tid = payload[i] >> 4, payload[i] & 0x0F
                bits = list(payload[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(payload[i + 17 : i + 17 + nvals])
                table = _huff_decode_table(bits, vals)
                (huff_dc if tclass == 0 else huff_ac)[tid] = table
                i += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            depth, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if depth != 8:
                raise ValueError("only 8-bit samples supported")
            for ci in range(ncomp):
                cid, sampling, qid = payload[6 + ci * 3 : 9 + ci * 3]
                if sampling != 0x11:
                    raise ValueError("chroma subsampling not supported (h=v=1 only)")
                comps.append((cid, qid, sampling))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0xFF{marker:02X} not supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = payload[0]
            if ns != len(comps):
                # spec-legal non-interleaved baseline (one scan per
                # component) would need multi-scan assembly; decoding just
                # the first scan would silently return Y-only pixels
                raise ValueError(
                    f"non-interleaved scan not supported ({ns} of {len(comps)} components)"
                )
            for si in range(ns):
                cid, tables = payload[1 + si * 2 : 3 + si * 2]
                idx = next((i for i, c in enumerate(comps) if c[0] == cid), None)
                if idx is None:
                    raise ValueError(f"scan references unknown component id {cid}")
                scan.append((idx, tables >> 4, tables & 0x0F))
            entropy_start = pos
            return _decode_scan(
                content, entropy_start, width, height, comps, scan, quant, huff_dc, huff_ac
            )
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, width, height, comps, scan, quant, huff_dc, huff_ac):
    ncomp = len(scan)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in range(ncomp)]
    reader = _BitReader(data, pos)
    prev_dc = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for si, (ci, dc_id, ac_id) in enumerate(scan):
                zz = np.zeros(64, dtype=np.int64)
                s = reader.read_symbol(huff_dc[dc_id])
                diff = _decode_magnitude(reader.read_bits(s), s)
                prev_dc[si] += diff
                zz[0] = prev_dc[si]
                k = 1
                while k < 64:
                    sym = reader.read_symbol(huff_ac[ac_id])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k >= 64:
                        raise ValueError("AC run past end of block")
                    zz[k] = _decode_magnitude(reader.read_bits(size), size)
                    k += 1
                coef = np.zeros((8, 8), dtype=np.float64)
                qtbl = quant[comps[ci][1]]
                for k2, (r, c) in enumerate(ZIGZAG):
                    coef[r, c] = zz[k2] * qtbl[r, c]
                block = _C.T @ coef @ _C
                planes[si][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    out_planes = [
        np.clip(rha(p[:height, :width]) + 128.0, 0, 255) for p in planes
    ]
    if ncomp == 1:
        return width, height, 1, out_planes[0].astype(np.uint8).tobytes()
    if ncomp == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([rha(np.clip(v, 0, 255)) for v in (r, g, b)], axis=-1)
        return width, height, 3, rgb.astype(np.uint8).tobytes()
    raise ValueError(f"unsupported component count {ncomp}")
