"""Pure-stdlib/numpy media codecs for the multimodal stages.

The container has no PIL/libav, but several real formats need neither:

- PNG  (8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced)
  — zlib inflate + the five scanline filters, per the PNG spec.
- BMP  (uncompressed 24-bit BGR and 8-bit palette, bottom-up or top-down)
- PPM/PGM (binary P6/P5)
- WAV  (PCM16/PCM8, mono or interleaved multichannel → mono mean)

Color images reduce to luminance (ITU-R BT.601: 0.299 R + 0.587 G +
0.114 B) because every downstream stage consumes grayscale; alpha is
ignored.  JPEG and video formats genuinely need external codecs and
remain behind the explicit NotImplementedError in multimodal.py, as
does the deterministic FAKEIMG/FAKEAUD fixture format.

Decoders are format-sniffing: ``decode_image(blob) -> (w, h, gray u8
HxW)``, ``decode_audio(blob) -> (rate, float32 mono in [-1, 1])``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114])


def _to_gray(px: np.ndarray) -> np.ndarray:
    """HxWxC (or HxW) uint8 → HxW uint8 luminance."""
    if px.ndim == 2:
        return px
    if px.shape[2] >= 3:
        return (px[:, :, :3].astype(np.float64) @ _LUMA).round().clip(
            0, 255).astype(np.uint8)
    return px[:, :, 0]


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → HxW(xC) uint8 array."""
    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat_parts, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat_parts.append(data)  # join once — real encoders emit
            # IDAT in many small chunks; += would copy quadratically
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: no IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} unsupported "
            "(8-bit non-interlaced only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat_parts))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG: truncated scanlines")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels
    for y in range(h):
        row = raw[y * (stride + 1): (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub / average / paeth — sequential in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    cur[x] = (line[x] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise ValueError(f"PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels) if channels > 1 else out.reshape(h, w)
    if ctype == 3:  # palette lookup
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        px = plte[px.reshape(h, w)]
    return px


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------

def decode_bmp(blob: bytes) -> np.ndarray:
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_sz,) = struct.unpack("<I", blob[14:18])
    w, h_signed = struct.unpack("<ii", blob[18:26])
    _planes, bpp = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0:
        raise NotImplementedError("compressed BMP unsupported")
    h, bottom_up = abs(h_signed), h_signed > 0
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = []
        for y in range(h):
            off = data_off + y * stride
            row = np.frombuffer(blob[off:off + w * 3], dtype=np.uint8)
            rows.append(row.reshape(w, 3)[:, ::-1])  # BGR → RGB
        px = np.stack(rows)
    elif bpp == 8:
        n_colors = struct.unpack("<I", blob[46:50])[0] or 256
        pal_off = 14 + hdr_sz
        pal = np.frombuffer(
            blob[pal_off:pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, 2::-1]  # BGRA → RGB
        stride = (w + 3) & ~3
        rows = []
        for y in range(h):
            off = data_off + y * stride
            idx = np.frombuffer(blob[off:off + w], dtype=np.uint8)
            rows.append(pal[idx])
        px = np.stack(rows)
    else:
        raise NotImplementedError(f"BMP bpp {bpp} unsupported")
    return px[::-1] if bottom_up else px


def decode_ppm(blob: bytes) -> np.ndarray:
    magic = blob[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header: magic, whitespace/comments, width, height, maxval, 1 ws byte
    toks, i, tok = [], 2, b""
    while len(toks) < 3:
        c = blob[i:i + 1]
        i += 1
        if c == b"":
            raise ValueError("truncated PPM/PGM header")
        if c == b"#":
            while blob[i:i + 1] not in (b"\n", b""):
                i += 1
            continue
        if c.isspace():
            if tok:
                toks.append(int(tok))
                tok = b""
            continue
        tok += c
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(blob[i:i + w * h * ch], dtype=np.uint8)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


# ---------------------------------------------------------------------------
# sniffing entry points
# ---------------------------------------------------------------------------

def decode_image(blob: bytes) -> "tuple[int, int, np.ndarray]":
    """(width, height, HxW uint8 grayscale) for any supported format.

    Raises ValueError for BOTH unknown magics and corrupt blobs of a
    recognized format (web-crawl inputs are routinely truncated — the
    parse errors struct/zlib/numpy throw are normalized so callers see
    one predictable exception type); NotImplementedError only for valid
    but unsupported variants (16-bit, interlaced, compressed BMP)."""
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            fmt, px = "PNG", decode_png(blob)
        elif blob[:2] == b"BM":
            fmt, px = "BMP", decode_bmp(blob)
        elif blob[:2] in (b"P6", b"P5"):
            fmt, px = "PPM", decode_ppm(blob)
        else:
            raise ValueError("unsupported image format")
    except NotImplementedError:
        raise
    except ValueError:
        raise
    except Exception as e:  # struct.error, zlib.error, IndexError, ...
        raise ValueError(f"corrupt {blob[:2]!r} image blob: {e}") from e
    g = _to_gray(px)
    return g.shape[1], g.shape[0], g


def decode_wav(blob: bytes) -> "tuple[int, np.ndarray]":
    """(sample_rate, float32 mono samples in [-1, 1]) for PCM WAV."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise NotImplementedError(f"WAV format {fmt} (PCM only)")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV bit depth {bits}")
    if channels and channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return rate, x
