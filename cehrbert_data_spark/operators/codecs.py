"""Pure-stdlib/numpy media codecs for the multimodal decode path.

The container ships no image/audio libraries, but three load-bearing
formats are decodable with nothing beyond ``zlib`` / ``wave`` / numpy:

- **BMP** (24-bit BI_RGB, the classic uncompressed layout) — header parse
  plus a strided numpy view; also the RE-ENCODE target for
  :func:`resize_payload` because the writer is ~20 lines.
- **PNG** (8-bit gray/RGB/RGBA, non-interlaced) — ``zlib`` inflate of the
  IDAT chain plus the five scanline unfilters (None/Sub/Up/Average/Paeth).
  Up/None/Average-without-left are vectorized; Sub/Paeth fall back to a
  per-pixel loop (they are sequentially dependent by definition). This is
  a REFERENCE decoder: correct, deterministic, fast enough for
  thumbnail-scale payloads; a production deployment injects a
  turbo-codec-backed decoder through the same ``decoder=`` seam.
- **WAV** (PCM via the stdlib ``wave`` module) — frames × channels int16.

``default_media_decoder`` sniffs the magic bytes and routes; unknown or
unsupported payloads yield empty fields (NULL columns downstream) instead
of failing the task — at scale a NULL beats a dead executor, and the
count of NULLs is itself the data-quality signal.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# --- BMP ---------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a 24-bit uncompressed (BI_RGB) BMP."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    need = pixel_offset + stride * height
    if len(data) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, np.uint8, stride * height, pixel_offset)
    rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP from an (H, W, 3) uint8 RGB array."""
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp expects (H, W, 3)")
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, flip
    pixel_bytes = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return header + pixel_bytes


# --- PNG ---------------------------------------------------------------------

def decode_png(data: bytes) -> np.ndarray:
    """(H, W, C) uint8 from an 8-bit non-interlaced gray/RGB/RGBA PNG."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    width = height = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctag == b"IHDR":
            width, height = struct.unpack_from(">II", chunk, 0)
            depth, ctype, interlace = chunk[8], chunk[9], chunk[12]
        elif ctag == b"IDAT":
            idat.append(chunk)
        elif ctag == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if depth != 8 or channels is None or interlace:
        raise ValueError(
            f"unsupported PNG: depth={depth} color_type={ctype} interlace={interlace}"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = row.copy()
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal non-interlaced 8-bit PNG (filter 0 rows) from (H, W, C)."""
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- WAV ---------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """((frames, channels) int16 array, sample_rate) from a PCM WAV."""
    with wave.open(io.BytesIO(data)) as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {wf.getsampwidth()}")
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, np.int16).reshape(-1, wf.getnchannels())
        return arr, wf.getframerate()


# --- resize + default decoder seam ------------------------------------------

def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W, C) to (height, width, C)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def _decode_image(data: bytes) -> np.ndarray | None:
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    return None


def default_media_decoder(data: bytes) -> dict:
    """Magic-sniffing decoder for :func:`multimodal.decode_media`: PNG/BMP
    payloads yield dimensions and a mean-pixel summary, PCM WAV yields
    frame/rate/RMS, anything else yields {} (NULL fields downstream)."""
    try:
        img = _decode_image(data)
        if img is not None:
            return {
                "decoded_height": int(img.shape[0]),
                "decoded_width": int(img.shape[1]),
                "decoded_summary": f"mean={float(img.mean()):.3f}",
            }
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            pcm, rate = decode_wav(data)
            rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
            return {
                "decoded_summary": f"frames={pcm.shape[0]} rate={rate} rms={rms:.3f}",
            }
    except (ValueError, zlib.error, wave.Error, struct.error, EOFError):
        pass
    return {}


def stats_media_decoder(data: bytes) -> dict:
    """Numeric-stats decoder for :func:`multimodal.decode_media`: same real
    codecs as :func:`default_media_decoder` (PNG/BMP pixels, PCM WAV
    samples) but every statistic comes back as a typed numeric field —
    images yield (decoded_width, decoded_height, mean_pixel), WAV yields
    (n_samples, sample_rate, rms) — so a DuckDB oracle can recompute them
    exactly from planted payloads instead of string-matching a summary."""
    try:
        img = _decode_image(data)
        if img is not None:
            return {
                "decoded_height": int(img.shape[0]),
                "decoded_width": int(img.shape[1]),
                "mean_pixel": float(img.mean()),
            }
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            pcm, rate = decode_wav(data)
            return {
                "n_samples": int(pcm.shape[0]),
                "sample_rate": int(rate),
                "rms": float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))),
            }
    except (ValueError, zlib.error, wave.Error, struct.error, EOFError):
        pass
    return {}


def default_media_resizer(data: bytes, width: int, height: int) -> bytes | None:
    """Decode (PNG/BMP) → nearest-resize → re-encode as 24-bit BMP.
    Gray is broadcast to 3 channels, alpha is dropped; undecodable
    payloads resize to None rather than failing the task."""
    try:
        img = _decode_image(data)
    except (ValueError, zlib.error, struct.error):
        return None
    if img is None:
        return None
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    return encode_bmp(resize_nearest(img, width, height))
