"""Pure-stdlib image/audio codecs for the multimodal decode seam.

The sandbox has no PIL/opencv/soundfile, but PNG is just zlib (stdlib)
plus per-row unfiltering (numpy), and WAV is a RIFF header walk
(stdlib ``struct``) — so the most common lossless formats decode for
REAL here, shrinking the documented codec seam in
operators/multimodal.py to lossy formats (JPEG/MP3/video), which
genuinely need external libraries.

Scope (decoder): 8-bit, non-interlaced PNG, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA) — all five filter types. Anything
else raises ValueError with the unsupported field named. The encoder
exists so tests and queries can synthesize valid PNGs without any
imaging library; it can emit a chosen filter type per row, which is
what lets the tests exercise every unfilter path byte-exactly.

PNG spec: https://www.w3.org/TR/png-3/ (public W3C standard).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a row (a=left, b=up,
    c=up-left), all int16+ to avoid uint8 wraparound in |p - x|."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(
    pixels: np.ndarray, filter_type: int | None = None
) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a valid PNG.

    ``filter_type`` forces one filter (0-4) on every row — the knob
    the round-trip tests use to exercise each unfilter path; None
    picks 0 (no filtering; zlib still compresses fine for fixtures).
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"unsupported channel count {c}")
    ft = 0 if filter_type is None else int(filter_type)
    if not 0 <= ft <= 4:
        raise ValueError(f"unsupported filter type {ft}")
    bpp = c
    raw = bytearray()
    prev = np.zeros((w * c,), dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        left = np.concatenate([np.zeros(bpp, row.dtype), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, prev.dtype), prev[:-bpp]])
        r16, l16, u16, ul16 = (
            a.astype(np.int16) for a in (row, left, prev, upleft)
        )
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = ((r16 - l16) % 256).astype(np.uint8)
        elif ft == 2:
            enc = ((r16 - u16) % 256).astype(np.uint8)
        elif ft == 3:
            enc = ((r16 - (l16 + u16) // 2) % 256).astype(np.uint8)
        else:
            enc = ((r16 - _paeth(l16, u16, ul16)) % 256).astype(np.uint8)
        raw.append(ft)
        raw.extend(enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG into an (h, w, channels) uint8 array.

    Supports the encoder's scope (8-bit, non-interlaced, color types
    0/2/4/6, any mix of the five row filters); everything else raises
    ValueError naming the unsupported field. The filter recurrences
    (Sub/Average/Paeth read the already-reconstructed left pixel) are
    inherently sequential along a row, so those rows reconstruct in a
    per-pixel-column loop over numpy slices — rows and the Up filter
    stay fully vectorized.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    ctype = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    c = _CHANNELS[ctype]
    bpp = c
    stride = width * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        ft = int(rows[y, 0])
        row = rows[y, 1:].astype(np.int16)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prev) % 256
        elif ft == 1:
            rec = row.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) % 256
        elif ft == 3:
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                upleft = prev[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(
                    np.int16(left), prev[x], np.int16(upleft)
                )) % 256
        else:
            raise ValueError(f"unsupported filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(height, width, c)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV (RIFF) into (sample_rate, samples) —
    samples shaped (n, channels) int16. Non-PCM or non-16-bit raises
    ValueError naming the field."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sr = None
    n_ch = None
    bits = None
    frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            fmt, n_ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError(f"unsupported WAV format code {fmt}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            frames = body
    if sr is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(
        frames[: len(frames) - (len(frames) % (2 * n_ch))], dtype="<i2"
    ).reshape(-1, n_ch)
    return sr, samples


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Encode (n,) or (n, channels) int16 samples as a 16-bit PCM WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    body = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * 2 * n_ch, 2 * n_ch, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
