"""Pure-numpy baseline JPEG codec (r5) — no codec library needed.

Baseline sequential JPEG (SOF0) is, like PNG's DEFLATE, fully specified
arithmetic over public tables: Huffman coding (ITU-T T.81 Annex K gives
the standard code tables), 8×8 DCT (an orthonormal matrix multiply),
and the JFIF YCbCr colorspace. This module implements:

* ``encode_jpeg``: baseline 4:4:4 (or grayscale) encoder with the
  Annex-K quantization + Huffman tables, quality-scaled per the libjpeg
  convention — exists primarily so the decoder can be round-trip
  tested without any external JPEG producer in the container.
* ``decode_jpeg``: baseline SOF0 decoder — DQT (8/16-bit), multiple
  DHT segments, grayscale and 3-component scans with arbitrary
  sampling factors (4:4:4, 4:2:0, 4:2:2 covered by tests), DRI/RSTn
  restart markers, stuffed-byte bitstream, dequant → inverse zigzag →
  IDCT → chroma upsample (nearest) → YCbCr→RGB. Progressive (SOF2),
  arithmetic coding, 12-bit precision and hierarchical modes raise
  ValueError → the multimodal router degrades to ``fake_features``,
  same as any unsupported flavor.

JPEG is lossy: round-trip tests assert PSNR, not byte equality (the
codec pair is still a closed loop — encoder output must decode to a
faithful image, and corrupt streams must fail loudly, mirroring the
other five codecs' contracts in ``codecs.py``).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (ITU-T T.81)
# ---------------------------------------------------------------------------

# zigzag order: index = zigzag position, value = raster position
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 quantization tables (luma, chroma), raster order
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits[1..16] counts, values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: dct2(B) = _DCT @ B @ _DCT.T
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT[0, :] = np.sqrt(1 / 8)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value, for the bit-at-a-time decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return out


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention: 50 = tables as-is; clamp to [1,255]."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * s + 50) / 100), 1, 255)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value → (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_component(
    w: _BitWriter, blocks: np.ndarray, qtab: np.ndarray, dc_tab: dict, ac_tab: dict, pred: int
) -> int:
    """Quantize + huffman-encode a sequence of 8×8 blocks (one component,
    raster order). Returns the new DC predictor."""
    for b in blocks:
        coef = _DCT @ b @ _DCT.T
        q = np.round(coef / qtab).astype(np.int32)
        zz = q.reshape(-1)[_ZIGZAG]
        size, bits = _magnitude(int(zz[0]) - pred)
        pred = int(zz[0])
        code, ln = dc_tab[size]
        w.write(code, ln)
        if size:
            w.write(bits, size)
        run = 0
        for v in zz[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            size, bits = _magnitude(int(v))
            code, ln = ac_tab[(run << 4) | size]
            w.write(code, ln)
            w.write(bits, size)
            run = 0
        if run:
            code, ln = ac_tab[0x00]  # EOB
            w.write(code, ln)
    return pred


def _mcu_blocks(plane: np.ndarray, mcuy: int, mcux: int, v: int, hh: int) -> np.ndarray:
    """(H, W) plane → (mcuy*mcux, v*hh, 8, 8): the blocks of each MCU in
    scan order (v rows × hh cols of 8×8 blocks per MCU)."""
    ph, pw = mcuy * v * 8, mcux * hh * 8
    p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
    b = (
        p.reshape(mcuy, v, 8, mcux, hh, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(mcuy * mcux, v * hh, 8, 8)
    )
    return b


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) uint8 gray → baseline JFIF JPEG
    bytes (Annex-K tables quality-scaled). ``subsample``: '444' (one
    block per component per MCU), '420' (2×2 luma blocks + 2×2-mean
    chroma — the ubiquitous camera/web layout) or '422' (2×1 luma +
    horizontally-halved chroma — the broadcast layout; exercises the
    decoder's asymmetric sampling-factor path).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the resync feature real streams use; exercises the decoder's
    restart path)."""
    a = np.asarray(rgb, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (H, W, 3) or (H, W) uint8, got {a.shape}")
    if subsample not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsample {subsample!r} (444/420/422)")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if gray:
        planes = [a.astype(np.float64) - 128.0]
    else:
        f = a.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    nc = 1 if gray else 3
    if subsample in ("420", "422") and not gray:
        # luma hs×vs blocks per MCU; chroma mean-decimated by (vs, hs)
        hs, vs = (2, 2) if subsample == "420" else (2, 1)
        hv = [(hs, vs), (1, 1), (1, 1)]
        mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))
        ds = []
        for p in planes[1:]:
            pp = np.pad(p, ((0, (-h) % vs), (0, (-w) % hs)), mode="edge")
            ds.append(
                pp.reshape(pp.shape[0] // vs, vs, pp.shape[1] // hs, hs).mean(axis=(1, 3))
            )
        planes = [planes[0]] + ds
    else:
        hv = [(1, 1)] * nc
        mcux, mcuy = -(-w // 8), -(-h // 8)

    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0 if ci == 0 else 1])
    for tclass, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tclass << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)
    comp_mcus = [
        _mcu_blocks(planes[ci], mcuy, mcux, hv[ci][1], hv[ci][0]) for ci in range(nc)
    ]
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for bi in range(mcuy * mcux):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.flush()
            out += bw.buf
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * nc
        for ci in range(nc):
            qtab = ql if ci == 0 else qc
            dc = dc_l if ci == 0 else dc_c
            ac = ac_l if ci == 0 else ac_c
            preds[ci] = _encode_component(
                bw, comp_mcus[ci][bi], qtab, dc, ac, preds[ci]
            )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment bit reader: handles 0xFF00 stuffing, stops
    at markers; RSTn consumption is explicit via ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("unexpected RST marker mid-symbol")
            else:
                raise ValueError("marker inside entropy stream (truncated scan)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
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

    def restart(self) -> None:
        """Consume an RSTn marker at a restart interval boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected RST marker at restart interval")
        self.pos += 2


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: amplitude bits → signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes → (H, W, 3) uint8 RGB (grayscale is
    replicated to 3 channels). ValueError on progressive/arithmetic/
    12-bit/hierarchical or ANY malformed stream — index/struct errors
    from truncated segment bodies are converted so the multimodal
    router's single ``except ValueError`` is a complete degrade path
    (one bad payload must never kill a corpus-scale job)."""
    try:
        return _decode_jpeg_impl(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed JPEG stream: {e}") from e


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    d = payload
    if d is None or len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 4 > len(d):
            raise ValueError("truncated JPEG (no SOS)")
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = d[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7) or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", d, pos + 2)
        body = d[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                n = 64 * (2 if pq else 1)
                if bp + n > len(body):
                    raise ValueError("truncated DQT")
                vals = (
                    np.frombuffer(body[bp : bp + n], ">u2" if pq else np.uint8)
                    .astype(np.float64)
                )
                q = np.empty(64)
                q[_ZIGZAG] = vals  # stored zigzag → raster
                qtabs[tq] = q.reshape(8, 8)
                bp += n
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                bp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode (progressive/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            return _decode_scan(d, pos, sof, scan, qtabs, htabs, restart_interval)
        elif marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        # APPn / COM / others: skip
        pos += 2 + seglen


def _decode_scan(d, pos, sof, scan, qtabs, htabs, restart_interval):
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("empty JPEG image")
    nc = len(comps)
    if nc not in (1, 3) or len(scan) != nc:
        raise ValueError(f"unsupported component count {nc}")
    # a hostile SOF can claim 65535×65535 and the planes are allocated
    # BEFORE any entropy data is read — MemoryError is not ValueError, so
    # cap pixels explicitly (64 MPix is far beyond any feature payload)
    if h * w > (1 << 26):
        raise ValueError(f"implausible JPEG dimensions {w}x{h}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # EVERY factor must be 1..4 (a 0 would ZeroDivisionError the
    # upsample — not ValueError, so the router could not degrade) and
    # divide the max (nearest upsample assumes integer ratios)
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"bad sampling factors {c['h']}x{c['v']}")
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("non-integer sampling ratio unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    by_id = {c["id"]: c for c in comps}
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError("scan references missing Huffman table")
        if c["tq"] not in qtabs:
            raise ValueError("component references missing quant table")
        c["dc"] = htabs[(0, td)]
        c["ac"] = htabs[(1, ta)]
        c["q"] = qtabs[c["tq"]]
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        c["pred"] = 0

    br = _BitReader(d, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = _decode_block(br, c)
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk

    planes = []
    for c in comps:
        p = c["plane"]
        # upsample to full resolution (nearest — JFIF centered taps are a
        # quality nicety; nearest keeps the codec dependency-free)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])

    if nc == 1:
        y = np.clip(planes[0] + 128.0, 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0] + 128.0, planes[1], planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, c: dict) -> np.ndarray:
    zz = np.zeros(64, np.float64)
    size = _decode_huff(br, c["dc"])
    diff = _extend(br.bits(size), size) if size else 0
    c["pred"] += diff
    zz[0] = c["pred"]
    k = 1
    while k < 64:
        rs = _decode_huff(br, c["ac"])
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coef = np.empty(64)
    coef[_ZIGZAG] = zz  # zigzag → raster
    blk = coef.reshape(8, 8) * c["q"]
    return _DCT.T @ blk @ _DCT
