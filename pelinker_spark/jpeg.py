"""Minimal baseline JPEG (JFIF) codec — pure numpy + stdlib, written from
the ITU-T T.81 spec (Annex K tables). 4:4:4 sampling (no chroma
subsampling), one DQT/DHT set, sequential baseline DCT only.

The entropy-coding layer (zigzag + DC-diff + run-length + Huffman) is
LOSSLESS: decode(encode(img)) must be bit-identical to the numpy-simulated
quantization pipeline (dct -> quant -> dequant -> idct -> clip), which the
test asserts exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 quantization tables (natural row-major order).
QT_LUM = np.array(
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
QT_CHR = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval).
HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Zigzag scan order: ZIGZAG[k] = flat index (row*8+col) of the k-th
# coefficient in scan order. Built, not typed, to avoid transcription bugs.
def _build_zigzag() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _build_zigzag()

# Orthonormal 8x8 DCT-II basis: F = A @ f @ A.T ; f = A.T @ F @ A.
def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    A = 0.5 * np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0)
    A[0, :] *= 1.0 / np.sqrt(2.0)
    return A


DCT_A = _dct_matrix()


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of an Annex K base table."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _quantized_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) -> (n_blocks, 8, 8) int32
    quantized DCT coefficients, blocks in raster order."""
    h, w = plane.shape
    f = plane.astype(np.float64) - 128.0
    blocks = (
        f.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ux,nxy,vy->nuv", DCT_A, blocks, DCT_A)
    # JPEG quantization: round to nearest (ties away from zero is what
    # np.round does NOT do; spec leaves rounding to the encoder — any
    # choice is valid as long as decode mirrors dequantization exactly).
    return np.round(coef / qt[None, :, :]).astype(np.int32)


def _reconstruct(blocks_q: np.ndarray, qt: np.ndarray, h: int, w: int) -> np.ndarray:
    """Inverse of `_quantized_blocks` up to quantization loss."""
    coef = blocks_q.astype(np.float64) * qt[None, :, :]
    pix = np.einsum("xu,nuv,yv->nxy", DCT_A.T.copy(), coef, DCT_A.T.copy())
    plane = (
        pix.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )
    return np.clip(np.round(plane + 128.0), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _encode_plane(
    writer: _BitWriter,
    blocks_q: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    for blk in blocks_q:
        zz = blk.reshape(64)[ZIGZAG]
        dc = int(zz[0])
        s, bitsv = _magnitude(dc - pred)
        code, ln = dc_codes[s]
        writer.put(code, ln)
        if s:
            writer.put(bitsv, s)
        pred = dc
        run = 0
        nz = np.flatnonzero(zz[1:])
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.put(code, ln)
                run -= 16
            s, bitsv = _magnitude(int(zz[1 + idx]))
            code, ln = ac_codes[(run << 4) | s]
            writer.put(code, ln)
            writer.put(bitsv, s)
            pos = int(idx) + 1
        if pos < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.put(code, ln)
    return pred


def _dht_segment(tclass: int, tid: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, huffval = table
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 -> baseline JFIF bytes, 4:4:4, Annex K tables
    quality-scaled. H and W must be multiples of 8 (synthetic media is)."""
    h, w, _ = rgb.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg requires H, W multiples of 8")
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]
    qts = [_scale_qt(QT_LUM, quality), _scale_qt(QT_CHR, quality)]
    blocks = [
        _quantized_blocks(planes[0], qts[0]),
        _quantized_blocks(planes[1], qts[1]),
        _quantized_blocks(planes[2], qts[1]),
    ]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    for tid, qt in enumerate(qts):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()
    # SOF0: 8-bit precision, 3 components, all 1x1 sampling (4:4:4)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    out += _dht_segment(0, 0, HT_DC_LUM)
    out += _dht_segment(1, 0, HT_AC_LUM)
    out += _dht_segment(0, 1, HT_DC_CHR)
    out += _dht_segment(1, 1, HT_AC_CHR)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tdta])
    out += bytes([0, 63, 0])

    writer = _BitWriter()
    dc_lum = _huff_codes(*HT_DC_LUM)
    ac_lum = _huff_codes(*HT_AC_LUM)
    dc_chr = _huff_codes(*HT_DC_CHR)
    ac_chr = _huff_codes(*HT_AC_CHR)
    preds = [0, 0, 0]
    n_mcu = (h // 8) * (w // 8)
    for m in range(n_mcu):  # interleaved MCU order: Y, Cb, Cr per MCU
        for ci, (dcc, acc) in enumerate(
            ((dc_lum, ac_lum), (dc_chr, ac_chr), (dc_chr, ac_chr))
        ):
            preds[ci] = _encode_plane(
                writer, blocks[ci][m : m + 1], dcc, acc, preds[ci]
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xff{marker:02x} in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits: list[int], huffval: list[int]):
    """(code, length) -> symbol lookup as {length: {code: symbol}}."""
    table: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table.setdefault(length, {})[code] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict[int, dict[int, int]]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        row = table.get(length)
        if row is not None and code in row:
            return row[code]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: appended-bits value -> signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JFIF -> (H, W, 3) uint8 RGB. Supports the
    subset `encode_jpeg` emits (and any equivalent baseline 4:4:4 file):
    8-bit, 3 components, 1x1 sampling, no restart intervals, no
    progressive scans."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc tid, ac tid)
    data_start = -1
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = flat
                qts[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            p = 6
            for _ in range(nc):
                cid, samp, tq = seg[p], seg[p + 1], seg[p + 2]
                if samp != 0x11:
                    raise NotImplementedError(
                        "only 4:4:4 (1x1 sampling) JPEG is supported"
                    )
                comps.append((cid, tq))
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential JPEG (SOF0)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(
                    bits, huffval
                )
                p += 17 + nv
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            for _ in range(ns):
                cid, t = seg[p], seg[p + 1]
                scan_comps.append((cid, t >> 4, t & 0x0F))
                p += 2
            data_start = pos + seglen
            break
        pos += seglen
    if data_start < 0 or not comps:
        raise ValueError("no scan data")
    if h % 8 or w % 8:
        raise NotImplementedError("dimensions must be multiples of 8 (4:4:4)")

    reader = _BitReader(payload[data_start:])
    n_mcu = (h // 8) * (w // 8)
    qt_by_cid = dict(comps)
    n = len(scan_comps)
    blocks = [np.zeros((n_mcu, 8, 8), dtype=np.int32) for _ in range(n)]
    preds = [0] * n
    for m in range(n_mcu):
        for ci, (cid, dct, act) in enumerate(scan_comps):
            zz = np.zeros(64, dtype=np.int32)
            s = _read_symbol(reader, dc_tables[dct])
            diff = _extend(reader.bits(s), s) if s else 0
            preds[ci] += diff
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = _read_symbol(reader, ac_tables[act])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(reader.bits(s), s)
                k += 1
            blk = np.zeros(64, dtype=np.int32)
            blk[ZIGZAG] = zz
            blocks[ci][m] = blk.reshape(8, 8)

    planes = [
        _reconstruct(blocks[ci], qts[qt_by_cid[cid]], h, w).astype(np.float64)
        for ci, (cid, _, _) in enumerate(scan_comps)
    ]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
