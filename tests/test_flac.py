"""FLAC codec (ops/flac): lossless round-trip through our encoder, plus
hand-built streams (same bit-writer) for the decode paths the encoder
does not emit — LPC subframes, verbatim, all three stereo decorrelation
modes, Rice escape, wasted bits, partition order > 0 — and the hostile-
stream ValueError contract with CRC/MD5 tamper checks and fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_ocr_api_spark.ops import flac

rng = np.random.default_rng(20260817)


def _tonal(n=20000, ch=2):
    t = np.arange(n)
    cols = []
    for c in range(ch):
        cols.append(
            (2500 * np.sin(t / (23 + 6 * c)) + 700 * np.sin(t / (5 + c))
             + rng.normal(0, 30, n)).astype(np.int16)
        )
    return np.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# encoder round-trip (lossless, verified stream)
# ---------------------------------------------------------------------------

def test_roundtrip_stereo_lossless():
    x = _tonal()
    enc = flac.encode_flac(x, 44100)
    assert len(enc) < x.nbytes * 0.8          # genuinely compresses tonal PCM
    dec, rate, bps = flac.decode_flac(enc)
    assert rate == 44100 and bps == 16
    assert np.array_equal(dec, x)


@pytest.mark.parametrize("sig", [
    np.zeros(5000, np.int16),
    np.full(300, -12345, np.int16),
    rng.integers(-32768, 32768, 777).astype(np.int16),   # noise → order-0 rice
    np.arange(-4000, 4000, 2, dtype=np.int16),           # perfect ramp → order-2 zeros
    np.array([5], np.int16),
    np.zeros(0, np.int16),
])
def test_roundtrip_shapes(sig):
    dec, rate, bps = flac.decode_flac(flac.encode_flac(sig, 8000))
    assert np.array_equal(dec.reshape(-1), sig.astype(np.int32))


def test_roundtrip_multiblock_frame_numbers():
    # > 128 frames exercises multi-byte coded frame numbers on both sides
    x = _tonal(200 * 150, ch=1)
    dec, _, _ = flac.decode_flac(flac.encode_flac(x, 16000, block_size=200))
    assert np.array_equal(dec, x)


def test_md5_and_crc_tamper_detection():
    enc = bytearray(flac.encode_flac(_tonal(4000, 1), 16000))
    # flip one PCM-affecting byte near the end (inside a frame body)
    enc[-20] ^= 0xFF
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc))


def test_streaminfo_md5_tamper():
    enc = bytearray(flac.encode_flac(_tonal(1000, 1), 16000))
    enc[26] ^= 0x01  # inside STREAMINFO md5 region (offset 8+18..8+33)
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(enc))


# ---------------------------------------------------------------------------
# hand-built streams: decode paths the encoder doesn't emit
# ---------------------------------------------------------------------------

def _stream(frame_payloads: list[bytes], n_samples: int, n_ch: int, rate=8000, bps=16,
            md5=b"\x00" * 16) -> bytes:
    import struct
    si = flac._BitWriter()
    si.write(16, 16); si.write(65535, 16); si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(n_ch - 1, 3); si.write(bps - 1, 5); si.write(n_samples, 36)
    body = si.getvalue() + md5
    out = bytearray(b"fLaC") + struct.pack(">I", (1 << 31) | len(body)) + body
    for f in frame_payloads:
        out += f
    return bytes(out)


def _frame(subframes, block_size: int, ch_code: int, bps_code=4, frame_idx=0) -> bytes:
    """subframes: list of callables(writer) writing one subframe each."""
    w = flac._BitWriter()
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)            # 16-bit block size at end
    w.write(0, 4)            # rate from streaminfo
    w.write(ch_code, 4)
    w.write(bps_code, 3)     # 4 = 16 bps
    w.write(0, 1)
    flac._write_utf8_number(w, frame_idx)
    w.write(block_size - 1, 16)
    w.align()
    hdr = w.getvalue()
    w2 = flac._BitWriter()
    for b in hdr:
        w2.write(b, 8)
    w2.write(flac._crc8(hdr), 8)
    for sf in subframes:
        sf(w2)
    w2.align()
    body = w2.getvalue()
    w3 = flac._BitWriter()
    for b in body:
        w3.write(b, 8)
    w3.write(flac._crc16(body), 16)
    return w3.getvalue()


def _verbatim(x, bps=16):
    def _w(w):
        w.write(0, 1); w.write(1, 6); w.write(0, 1)
        for v in x:
            w.write(int(v) & ((1 << bps) - 1), bps)
    return _w


def test_verbatim_subframe():
    x = rng.integers(-1000, 1000, 64).astype(np.int64)
    f = _frame([_verbatim(x)], 64, ch_code=0)
    dec, _, _ = flac.decode_flac(_stream([f], 64, 1))
    assert np.array_equal(dec[:, 0], x)


def test_lpc_subframe():
    """LPC order 2, coeffs [3, -1], shift 1: x[i] = r[i] + (3x[i-1] - x[i-2]) >> 1."""
    warm = [100, 103]
    resid = list(rng.integers(-4, 5, 62))
    want = list(warm)
    for r in resid:
        want.append(r + ((3 * want[-1] - want[-2]) >> 1))

    def _lpc(w):
        w.write(0, 1); w.write(32 + 1, 6); w.write(0, 1)   # LPC order 2 = 33
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(4, 4)            # precision 5 bits
        w.write(1, 5)            # shift 1
        for c in (3, -1):
            w.write(c & 0x1F, 5)
        w.write(0, 2); w.write(0, 4)                        # rice, order 0
        w.write(3, 4)                                       # param 3
        for v in resid:
            u = ((-v) << 1) - 1 if v < 0 else (v << 1)
            w.write_unary(u >> 3); w.write(u & 7, 3)
    f = _frame([_lpc], 64, ch_code=0)
    dec, _, _ = flac.decode_flac(_stream([f], 64, 1))
    assert dec[:, 0].tolist() == want


def _subframe_for(x, bps=16):
    return _verbatim(x, bps)


@pytest.mark.parametrize("mode", ["ls", "rs", "ms"])
def test_stereo_decorrelation_modes(mode):
    left = rng.integers(-5000, 5000, 32).astype(np.int64)
    right = rng.integers(-5000, 5000, 32).astype(np.int64)
    side = left - right
    if mode == "ls":
        ch_code, chans = 8, [(left, 16), (side, 17)]
    elif mode == "rs":
        ch_code, chans = 9, [(side, 17), (right, 16)]
    else:
        mid = (left + right) >> 1
        ch_code, chans = 10, [(mid, 16), (side, 17)]
    f = _frame([_subframe_for(x, b) for x, b in chans], 32, ch_code=ch_code)
    dec, _, _ = flac.decode_flac(_stream([f], 32, 2))
    assert np.array_equal(dec[:, 0], left), mode
    assert np.array_equal(dec[:, 1], right), mode


def test_rice_escape_and_partitions():
    """Partition order 2 (4 partitions) with one escaped raw-bits
    partition — fixed order 1 so the first partition is shorter."""
    x = np.cumsum(rng.integers(-3, 4, 64)).astype(np.int64)
    resid = np.diff(x)

    def _fixed(w):
        w.write(0, 1); w.write(9, 6); w.write(0, 1)   # fixed order 1
        w.write(int(x[0]) & 0xFFFF, 16)
        w.write(0, 2); w.write(2, 4)                  # 4 partitions
        counts = [16 - 1, 16, 16, 16]
        idx = 0
        for p, cnt in enumerate(counts):
            part = resid[idx:idx + cnt]; idx += cnt
            if p == 1:
                w.write(15, 4)                        # escape
                w.write(6, 5)                         # raw 6-bit
                for v in part:
                    w.write(int(v) & 0x3F, 6)
            else:
                w.write(2, 4)
                for v in part:
                    v = int(v)
                    u = ((-v) << 1) - 1 if v < 0 else (v << 1)
                    w.write_unary(u >> 2); w.write(u & 3, 2)
    f = _frame([_fixed], 64, ch_code=0)
    dec, _, _ = flac.decode_flac(_stream([f], 64, 1))
    assert np.array_equal(dec[:, 0], x)


def test_wasted_bits():
    x = (rng.integers(-100, 100, 16) << 3).astype(np.int64)   # 3 trailing zero bits

    def _const_wasted(w):
        w.write(0, 1); w.write(1, 6)                  # verbatim
        w.write(1, 1); w.write_unary(2)               # wasted = 3
        for v in x:
            w.write(int(v >> 3) & 0x1FFF, 13)         # eff = 16 - 3
    f = _frame([_const_wasted], 16, ch_code=0)
    dec, _, _ = flac.decode_flac(_stream([f], 16, 1))
    assert np.array_equal(dec[:, 0], x)


# ---------------------------------------------------------------------------
# hostile streams: ValueError-only contract
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("payload", [
    b"", b"fLaC", b"fLaC" + b"\x00" * 10, b"Flac" + b"\x00" * 50,
    b"fLaC" + b"\x80\x00\x00\x22" + b"\x00" * 34,          # zero sample rate
    b"fLaC" + b"\xff\xff\xff\xff" + b"\x00" * 64,          # invalid block type 127
])
def test_hostile_fixed_cases(payload):
    with pytest.raises(ValueError):
        flac.decode_flac(payload)


def test_hostile_fuzz_never_escapes_valueerror():
    base = bytearray(flac.encode_flac(_tonal(3000, 2), 16000))
    for trial in range(300):
        mut = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            flac.decode_flac(bytes(mut))
        except ValueError:
            pass           # the contract
        # any other exception type propagates and fails the test


def test_truncation_fuzz():
    base = flac.encode_flac(_tonal(2000, 1), 16000)
    for cut in [4, 20, 41, 42, 60, len(base) // 2, len(base) - 1]:
        with pytest.raises(ValueError):
            flac.decode_flac(base[:cut])


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        flac.encode_flac(np.zeros((4, 9), np.int16))          # too many channels
    with pytest.raises(ValueError):
        flac.encode_flac(np.array([70000], np.int32))          # out of 16-bit range
    with pytest.raises(ValueError):
        flac.encode_flac(np.zeros(4, np.int16), sample_rate=0)


def test_utf8_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, (1 << 31), (1 << 36) - 1]:
        w = flac._BitWriter()
        flac._write_utf8_number(w, v)
        w.align()
        assert flac._read_utf8_number(flac._BitReader(w.getvalue())) == v, v


# ---------------------------------------------------------------------------
# pipeline integration: sniff → decode_audio → features → probe_media
# ---------------------------------------------------------------------------

def test_flac_pipeline_integration():
    from pdf_ocr_api_spark.ops import codecs, mediameta, multimodal

    x = _tonal(16000, 2)
    enc = flac.encode_flac(x, 16000)
    assert codecs.sniff_codec(enc) == "flac"

    samples, rate = multimodal.decode_audio(enc)
    assert rate == 16000 and samples.dtype == np.int16
    assert np.array_equal(samples, x)

    # features equal the WAV features for the same PCM (same backend math)
    wav = codecs.encode_wav(x, 16000)
    f_flac = multimodal.media_feature_vector(enc)
    f_wav = multimodal.media_feature_vector(wav)
    assert np.allclose(f_flac, f_wav)

    # header-only duration probe: 16000 samples @ 16 kHz = 1000 ms
    m = mediameta.probe_media(enc)
    assert m["mime"] == "audio/flac" and m["duration_ms"] == 1000
    assert m["width"] is None and m["height"] is None

    # corrupt STREAMINFO degrades with ValueError, not a crash
    bad = bytearray(enc)
    bad[5] ^= 0x40  # metadata length byte → not 34
    with pytest.raises(ValueError):
        mediameta.probe_media(bytes(bad))
