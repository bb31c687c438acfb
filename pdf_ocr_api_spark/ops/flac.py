"""Pure-Python/numpy FLAC codec — lossless audio needs no codec library.

Same class as GIF's LZW and PNG's DEFLATE (``ops/codecs.py``): FLAC's
"compression" is Rice entropy coding over integer-predictor residuals —
algorithms, not licensed codecs, fully specified by the public format
spec (the container carries every parameter in-stream; there are no
magic coefficient tables to import, unlike MP3's synthesis window).

Decoder: full subframe coverage — constant, verbatim, fixed predictors
(orders 0-4), arbitrary LPC (orders 1-32, in-stream quantized
coefficients) — Rice/Rice2 partitioned residuals with raw-bits escape,
wasted-bits shift, all four channel assignments (independent,
left/side, right/side, mid/side), CRC-8 frame-header and CRC-16 frame
checks, and the STREAMINFO MD5 of the unencoded PCM verified when
present. Hostile-stream contract matches the other codecs: every
failure is ``ValueError`` (the multimodal router's only degrade path).

Encoder: valid, genuinely compressing FLAC — per-block per-channel
best-of fixed predictors (orders 0-4 by residual magnitude) with
order-0 Rice partitions, constant-subframe short-circuit, correct
CRCs and STREAMINFO MD5. Encode→decode round-trip is bit-exact
(lossless — asserted sample-for-sample in tests); LPC decode paths are
exercised by hand-built streams through the same bit-writer.

Bit-level work is plain Python over a positioned reader; per-frame
reconstruction (predictor accumulation, channel recorrelation) is
numpy. Sizing note for the multimodal pipeline: FLAC sample decode is
a per-row pandas-UDF leaf like JPEG decode — partition-parallel,
never shuffled.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor residual weights, order 0-4 (binomial signs)
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_MAX_BLOCK = 1 << 16
_MAX_FRAMES = 1 << 20  # backstop against length-lying hostile streams


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tbl[i] = c & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("flac: truncated stream")
        v = 0
        pos = self.pos
        data = self.data
        while n:
            byte = data[pos >> 3]
            off = pos & 7
            take = min(n, 8 - off)
            v = (v << take) | ((byte >> (8 - off - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        # FLAC unary: q zero-bits terminated by a one-bit
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1
            if n > _MAX_BLOCK * 64:
                raise ValueError("flac: runaway unary code")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("flac: internal misalignment")
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("flac: unaligned writer")
        return bytes(self.buf)


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > 6:
        raise ValueError("flac: bad coded number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # an n-byte sequence (2 <= n <= 7) carries (7 - n) + 6*(n - 1) bits
    for nbytes in range(2, 8):
        if v < (1 << ((7 - nbytes) + 6 * (nbytes - 1))):
            break
    else:
        raise ValueError("flac: coded number too large")
    cont = []
    for _ in range(nbytes - 1):
        cont.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | v
    w.write(lead, 8)
    for b in reversed(cont):
        w.write(b, 8)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_residual(r: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = r.read(4)
    n_part = 1 << po
    if block_size % n_part:
        raise ValueError("flac: block size not divisible by partitions")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        count = (block_size >> po) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("flac: partition smaller than predictor order")
        param = r.read(plen)
        if param == escape:
            nbits = r.read(5)
            for i in range(count):
                out[idx + i] = r.read_signed(nbits) if nbits else 0
        else:
            for i in range(count):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += count
    return out


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")

    if stype == 0:  # constant
        v = r.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # verbatim
        out = np.fromiter(
            (r.read_signed(eff) for _ in range(block_size)), dtype=np.int64, count=block_size
        )
    elif 8 <= stype <= 12:  # fixed predictor
        order = stype - 8
        if order > block_size:
            raise ValueError("flac: predictor order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * out[i - 1 - j]
            out[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        if order > block_size:
            raise ValueError("flac: LPC order exceeds block size")
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coeffs[j] * int(out[i - 1 - j])
            out[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) != 34:
        raise ValueError("flac: bad STREAMINFO length")
    r = _BitReader(body)
    info = {
        "min_block": r.read(16),
        "max_block": r.read(16),
        "min_frame": r.read(24),
        "max_frame": r.read(24),
        "rate": r.read(20),
        "channels": r.read(3) + 1,
        "bps": r.read(5) + 1,
        "total_samples": r.read(36),
        "md5": body[18:34],
    }
    if info["rate"] == 0:
        raise ValueError("flac: zero sample rate")
    return info


def decode_flac(payload: bytes):
    """FLAC bytes → ``((n, channels) int32 samples, rate_hz, bps)``.

    Verifies CRC-8 (frame header), CRC-16 (frame) and, when the
    STREAMINFO MD5 is non-zero, the whole-stream PCM MD5. Any malformed
    structure raises ``ValueError``."""
    try:
        return _decode_flac(payload)
    except ValueError:
        raise
    except Exception as exc:  # index/overflow/struct errors on hostile input
        raise ValueError(f"flac: malformed stream ({exc.__class__.__name__})") from exc


def _decode_flac(payload: bytes):
    if len(payload) < 42 or payload[:4] != _MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = struct.unpack(">I", payload[pos:pos + 4])[0]
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = payload[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            info = _parse_streaminfo(body)
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")

    chunks = []
    n_frames = 0
    while pos < len(payload):
        frame, pos = _decode_frame(payload, pos, info)
        chunks.append(frame)
        n_frames += 1
        if n_frames > _MAX_FRAMES:
            raise ValueError("flac: too many frames")
    if not chunks:
        samples = np.zeros((0, info["channels"]), dtype=np.int32)
    else:
        samples = np.concatenate(chunks, axis=0).astype(np.int32)
    if info["total_samples"] and samples.shape[0] != info["total_samples"]:
        raise ValueError("flac: sample count does not match STREAMINFO")
    if info["md5"] != b"\x00" * 16:
        if _pcm_md5(samples, info["bps"]) != info["md5"]:
            raise ValueError("flac: PCM MD5 mismatch")
    return samples, info["rate"], info["bps"]


def _decode_frame(payload: bytes, pos: int, info: dict):
    r = _BitReader(payload, pos * 8)
    sync = r.read(14)
    if sync != 0x3FFE:
        raise ValueError("flac: lost frame sync")
    if r.read(1):
        raise ValueError("flac: reserved header bit set")
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    if r.read(1):
        raise ValueError("flac: reserved header bit set")
    _read_utf8_number(r)

    if bs_code == 0:
        raise ValueError("flac: reserved block size code")
    elif bs_code == 6:
        block_size = r.read(8) + 1
    elif bs_code == 7:
        block_size = r.read(16) + 1
    else:
        block_size = _BLOCK_SIZES[bs_code]
    if block_size > _MAX_BLOCK:
        raise ValueError("flac: block size over cap")

    if sr_code == 0:
        pass
    elif sr_code in _SAMPLE_RATES:
        pass
    elif sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    else:
        raise ValueError("flac: invalid sample rate code")

    if ch_code <= 7:
        n_ch, assign = ch_code + 1, "indep"
    elif ch_code == 8:
        n_ch, assign = 2, "ls"
    elif ch_code == 9:
        n_ch, assign = 2, "rs"
    elif ch_code == 10:
        n_ch, assign = 2, "ms"
    else:
        raise ValueError("flac: reserved channel assignment")
    if n_ch != info["channels"]:
        raise ValueError("flac: frame channel count != STREAMINFO")

    bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
    if bps is None:
        raise ValueError("flac: reserved sample size code")

    r.align()
    header_bytes = payload[pos:r.byte_pos]
    crc8_stored = r.read(8)
    if _crc8(header_bytes) != crc8_stored:
        raise ValueError("flac: frame header CRC-8 mismatch")

    chans = []
    for ch in range(n_ch):
        ch_bps = bps
        if (assign == "ls" and ch == 1) or (assign == "rs" and ch == 0) or (
            assign == "ms" and ch == 1
        ):
            ch_bps += 1  # the side channel carries one extra bit
        chans.append(_read_subframe(r, block_size, ch_bps))

    r.align()
    frame_bytes = payload[pos:r.byte_pos]
    crc16_stored = r.read(16)
    if _crc16(frame_bytes) != crc16_stored:
        raise ValueError("flac: frame CRC-16 mismatch")

    if assign == "ls":
        left, side = chans
        chans = [left, left - side]
    elif assign == "rs":
        side, right = chans
        chans = [side + right, right]
    elif assign == "ms":
        mid, side = chans
        mid = (mid << 1) | (side & 1)
        chans = [(mid + side) >> 1, (mid - side) >> 1]
    return np.stack(chans, axis=1), r.byte_pos


def _pcm_md5(samples: np.ndarray, bps: int) -> bytes:
    nbytes = (bps + 7) // 8
    a = samples.astype(np.int64)
    h = hashlib.md5()
    # little-endian, channel-interleaved, bps/8 bytes per sample
    flat = a.reshape(-1)
    buf = np.zeros((flat.shape[0], nbytes), dtype=np.uint8)
    v = flat & ((1 << (8 * nbytes)) - 1)
    for i in range(nbytes):
        buf[:, i] = (v >> (8 * i)) & 0xFF
    h.update(buf.tobytes())
    return h.digest()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _rice_param_for(resid: np.ndarray, plen: int) -> int:
    if len(resid) == 0:
        return 0
    mean = float(np.mean(np.abs(resid.astype(np.float64)))) + 1e-9
    p = max(0, int(np.ceil(np.log2(mean + 1))))
    return min(p, (1 << plen) - 2)  # never the escape code


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    w.write(0, 2)   # 4-bit rice params
    w.write(0, 4)   # partition order 0
    param = _rice_param_for(resid, 4)
    w.write(param, 4)
    for v in resid:
        v = int(v)
        u = ((-v) << 1) - 1 if v < 0 else (v << 1)  # inverse of (u>>1)^-(u&1)
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    if np.all(x == x[0]):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # fixed predictor order k residual == k-th finite difference
    best_order, best_cost, best_resid = 0, None, None
    xi = x.astype(np.int64)
    resid = xi
    for order in range(min(4, len(x) - 1) + 1):
        cost = float(np.sum(np.abs(resid)))
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_resid = order, cost, resid
        resid = np.diff(resid)
    order = best_order
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)  # no wasted bits
    for i in range(order):
        w.write(int(xi[i]) & ((1 << bps) - 1), bps)
    _write_residual(w, best_resid)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000, block_size: int = 4096) -> bytes:
    """``(n,)`` or ``(n, ch)`` int16/int32 PCM → FLAC bytes (bps 16).

    Independent channels, per-channel best fixed predictor (order 0-4),
    order-0 Rice partitions — a genuinely compressing, spec-valid
    stream with correct CRCs and STREAMINFO MD5 (so ``decode_flac``
    fully verifies what this writes)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[1] < 1 or a.shape[1] > 8:
        raise ValueError("flac: samples must be (n,) or (n, channels<=8)")
    if not (1 <= sample_rate < (1 << 20)):
        raise ValueError("flac: sample rate out of range")
    a = a.astype(np.int64)
    if a.size and (a.max() > 32767 or a.min() < -32768):
        raise ValueError("flac: encoder writes 16-bit PCM; samples out of range")
    n, n_ch = a.shape
    bps = 16

    frames = bytearray()
    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        block = a[start:start + block_size]
        if block.shape[0] == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)          # fixed block size strategy
        w.write(7, 4)          # block size: 16-bit at end of header
        w.write(0, 4)          # sample rate: from STREAMINFO
        w.write(n_ch - 1, 4)   # independent channels
        w.write(4, 3)          # 16 bps
        w.write(0, 1)
        _write_utf8_number(w, frame_idx)
        w.write(block.shape[0] - 1, 16)
        w.align()
        hdr = w.getvalue()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(b, 8)
        w2.write(_crc8(hdr), 8)
        for ch in range(n_ch):
            _encode_subframe(w2, block[:, ch], bps)
        w2.align()
        body = w2.getvalue()
        w3 = _BitWriter()
        for b in body:
            w3.write(b, 8)
        w3.write(_crc16(body), 16)
        frames += w3.getvalue()
        frame_idx += 1

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_body = si.getvalue() + _pcm_md5(a, bps)
    out = bytearray(_MAGIC)
    out += struct.pack(">I", (1 << 31) | (0 << 24) | len(si_body))
    out += si_body
    out += frames
    return bytes(out)
