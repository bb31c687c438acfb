"""Spec-reference PNG filterer shared by test_ops and test_properties.

Applies ITU/W3C PNG per-scanline filters (types 0-4) FORWARD,
independently of the codec under test, and assembles a full PNG stream
around the result — so the decoder's unfilter is checked against a
second implementation of the spec, not against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def ref_png_stream(img: np.ndarray, ftypes, include_ancillary: bool = False) -> bytes:
    """(H, W, 3|4) uint8 + per-row filter types → complete PNG bytes."""
    h, w, ch = img.shape
    stride = w * ch
    raw = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, np.int32)
    lines = []
    for y, t in zip(range(h), ftypes):
        row = raw[y]
        f = row.copy()
        if t == 1:
            f[ch:] = (row[ch:] - row[:-ch]) % 256
        elif t == 2:
            f = (row - prev) % 256
        elif t == 3:
            f[:ch] = (row[:ch] - (prev[:ch] >> 1)) % 256
            f[ch:] = (row[ch:] - ((row[:-ch] + prev[ch:]) >> 1)) % 256
        elif t == 4:
            f[:ch] = (row[:ch] - prev[:ch]) % 256
            for i in range(ch, stride):
                a, b, c = int(row[i - ch]), int(prev[i]), int(prev[i - ch])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[i] = (row[i] - pred) % 256
        lines.append(bytes([t]) + bytes(f.astype(np.uint8)))
        prev = row

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if include_ancillary:
        out += chunk(b"tEXt", b"k\x00v")  # must be skipped by the decoder
    return out + chunk(b"IDAT", zlib.compress(b"".join(lines))) + chunk(b"IEND", b"")
