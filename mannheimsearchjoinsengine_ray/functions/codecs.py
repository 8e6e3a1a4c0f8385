"""Pure-stdlib media codecs (numpy + zlib + wave) — REAL decode paths for the
multimodal stages without any image/audio library.

Formats chosen because their specs are fully implementable from the standard
library (public formats: netpbm P6, PNG RFC 2083 subset, RIFF/WAVE):

  * PPM (P6, 8-bit)           decode_ppm / encode_ppm
  * PNG (8-bit gray/RGB/RGBA,
    non-interlaced)           decode_png / encode_png  (zlib + the five
                              scanline filters incl. Paeth, vectorized
                              per-scanline)
  * WAV (PCM 8/16-bit)        decode_wav / encode_wav  (stdlib ``wave``)

The multimodal stages use these for real feature extraction / resizing;
exotic formats still raise, keeping the honest stub boundary visible.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PPM (netpbm P6)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pixels = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pixels.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# PNG (RFC 2083 subset: 8-bit, color types 0/2/6, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (h, w) or (h, w, c) uint8.  8-bit depth, gray/RGB/RGBA,
    non-interlaced only (the encode_png subset)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError("unsupported PNG variant (need 8-bit, gray/RGB/RGBA, "
                         "non-interlaced)")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    o = 0
    for y in range(height):
        f = raw[o]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=o + 1)
        o += 1 + stride
        if f == 0:
            cur = line.copy()
        elif f == 2:       # Up
            cur = line + prev
        elif f in (1, 3, 4):
            # Sub/Average/Paeth carry a left dependency — per-pixel scan with
            # channel-vectorized numpy (ch values at a time)
            cur = np.zeros(stride, dtype=np.uint8)
            lineM = line.reshape(width, ch)
            curM = cur.reshape(width, ch)
            prevM = prev.reshape(width, ch)
            zero = np.zeros(ch, dtype=np.uint8)
            for x in range(width):
                left = curM[x - 1] if x else zero
                if f == 1:
                    curM[x] = lineM[x] + left
                elif f == 3:
                    curM[x] = lineM[x] + (
                        (left.astype(np.uint16) + prevM[x]) // 2).astype(np.uint8)
                else:
                    ul = prevM[x - 1] if x else zero
                    curM[x] = lineM[x] + _paeth(left, prevM[x], ul)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    img = out.reshape(height, width, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 → PNG (filter 0 scanlines, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload)) + ctype + payload + \
            struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        n = wf.getnframes()
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(n)
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError("only 8/16-bit PCM WAV supported")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(x.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def sniff_media(data: bytes) -> str:
    """'png' | 'ppm' | 'wav' | 'unknown' by magic bytes."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"P6"):
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """PNG or PPM → (h, w, 3) uint8 (gray/RGBA normalized to RGB)."""
    kind = sniff_media(data)
    if kind == "ppm":
        return decode_ppm(data)
    if kind == "png":
        img = decode_png(data)
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[2] == 4:
            return img[:, :, :3].copy()
        return img
    raise ValueError("unsupported image payload (PNG/PPM supported; other "
                     "formats need an external library)")


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy."""
    ih, iw = img.shape[:2]
    ys = (np.arange(h) * ih // h).clip(0, ih - 1)
    xs = (np.arange(w) * iw // w).clip(0, iw - 1)
    return img[np.ix_(ys, xs)]
