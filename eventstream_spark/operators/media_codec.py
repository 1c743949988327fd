"""Pure-stdlib media codecs for the multimodal rung.

The container has no image/audio libraries, but two real formats need
nothing beyond the standard library, so the decode rung can be REAL
instead of a deterministic fake:

- PNG: the format is zlib deflate over per-scanline filtered pixel data
  (public spec, RFC 2083). ``decode_png`` parses the chunk stream,
  inflates IDAT with stdlib ``zlib``, and reverses the five scanline
  filters (None/Sub/Up/Average/Paeth); ``encode_png`` writes the minimal
  valid file back. 8-bit depth, color types 0 (gray), 2 (RGB) and
  6 (RGBA), no interlace — the shapes a generated test/thumbnail corpus
  uses. Anything else fails loudly.
- WAV: stdlib ``wave`` reads RIFF/WAVE headers directly.

These run inside the same ``mapInPandas`` batch loops as the stubs they
replace, so the Spark plumbing (schema, Arrow batching, partition sizing)
is identical; swapping in libvips/ffmpeg later changes only these
functions. Pure-Python per-pixel work is fine at test sizes and is the
explicitly-marked slow path at corpus scale — the 100 TB posture is the
batch shape, not this inner loop.

Reference parity note: the reference engine has no media surface at all;
this is north-star scope (multimodal training-data pipelines).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


class MediaFormatError(ValueError):
    """Malformed or unsupported media payload."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Minimal PNG writer: 8-bit, filter None on every scanline."""
    if channels not in _COLOR_TYPE:
        raise MediaFormatError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise MediaFormatError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * channels}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, raw 8-bit pixels row-major)."""
    if payload[:8] != PNG_MAGIC:
        raise MediaFormatError("not a PNG payload")
    pos, width = 8, None
    height = channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise MediaFormatError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise MediaFormatError(f"unsupported color type {color}")
            if interlace:
                raise MediaFormatError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if width is None:
        raise MediaFormatError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise MediaFormatError("scanline data size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        line_start = y * (stride + 1)
        filt = raw[line_start]
        line = bytearray(raw[line_start + 1 : line_start + 1 + stride])
        if filt == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up_left = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif filt != 0:
            raise MediaFormatError(f"unknown scanline filter {filt}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a raw row-major 8-bit pixel buffer."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = pixels[sy * width * channels : (sy + 1) * width * channels]
        dst = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            out[dst + x * channels : dst + (x + 1) * channels] = src_row[
                sx * channels : (sx + 1) * channels
            ]
    return bytes(out)


def resize_png(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Real decode → nearest-neighbor resample → re-encode."""
    width, height, channels, pixels = decode_png(payload)
    return encode_png(
        resize_nearest(pixels, width, height, channels, new_w, new_h),
        new_w,
        new_h,
        channels,
    )


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_width_bytes, frame_rate, n_frames) via stdlib."""
    if not is_wav(payload):
        raise MediaFormatError("not a WAV payload")
    with wave.open(io.BytesIO(payload)) as w:
        return w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()


def wav_samples(payload: bytes) -> bytes:
    """Raw PCM sample bytes via a REAL stdlib decode (RIFF chunk walk +
    frame extraction) — the audio sibling of decode_png's pixel path."""
    if not is_wav(payload):
        raise MediaFormatError("not a WAV payload")
    with wave.open(io.BytesIO(payload)) as w:
        return w.readframes(w.getnframes())


def encode_wav(
    frames: bytes, n_channels: int = 1, sample_width: int = 2, frame_rate: int = 16000
) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sample_width)
        w.setframerate(frame_rate)
        w.writeframes(frames)
    return buf.getvalue()
