"""Real media codecs from the Python standard library — no PIL/libav
needed. PNG (zlib + struct over the spec'd chunk layout) and WAV (the
stdlib ``wave`` module) are genuine file formats: blobs produced here
open in any image viewer / audio player, and the decoder rejects
corrupt bytes exactly the way PIL raises on a truncated file.

``stdlib_codec`` sniffs the magic and dispatches PNG → WAV → the
engine's synthetic GRFT format, so a single ``set_codec(stdlib_codec)``
upgrades the whole multimodal pipeline (operators/multimodal.py) from
the documented stub to real decoding, while staying dependency-free.
Real deployments with PIL/libav replace only this function; the Spark
plumbing (binary columns, Arrow batches, error-row capture) is shared.

PNG subset: 8-bit grayscale, no interlace, filter 0 — enough for
decode/resize/feature plumbing; a partial or re-filtered file raises
(caught upstream as a decode_error row).
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Any

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal real PNG: 8-bit grayscale, filter 0 scanlines. ``pixels``
    must be width*height bytes, row-major."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict[str, Any]:
    """Parse chunks, inflate IDAT, strip per-row filter bytes, return the
    typed metadata + pixel mean. Raises on anything malformed (bad magic,
    CRC mismatch, non-zero filters, truncation)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    saw_end = False
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError("bad CRC")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            saw_end = True
            break
        pos += 12 + ln
    if width is None or not idat or not saw_end:
        raise ValueError("missing IHDR/IDAT/IEND")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("bad scanline length")
    total = 0
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError("unsupported filter")
        total += sum(row[1:])
    n = width * height
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "sample_rate": 0,
        "n_frames": 1,
        "mean_byte": total / n if n else 0.0,
    }


def encode_wav(sample_rate: int, samples: bytes) -> bytes:
    """Real mono 8-bit WAV via the stdlib wave module."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(data: bytes) -> dict[str, Any]:
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n = w.getnframes()
        frames = w.readframes(n)
        sr = w.getframerate()
    total = sum(frames)
    return {
        "kind": "audio",
        "width": 0,
        "height": 0,
        "sample_rate": sr,
        "n_frames": n,
        "mean_byte": total / len(frames) if frames else 0.0,
    }


def png_pixels(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG (the supported subset) to (width, height, pixels)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    meta = decode_png(data)  # validates chunks/CRCs
    w, h = meta["width"], meta["height"]
    pos, idat = 8, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w + 1
    pixels = b"".join(raw[y * stride + 1 : (y + 1) * stride] for y in range(h))
    return w, h, pixels


def resize_png(data: bytes, new_w: int, new_h: int) -> bytes:
    """Real nearest-neighbor resample: decode → gather → re-encode. The
    output is again a spec-valid PNG."""
    w, h, px = png_pixels(data)
    out = bytearray(new_w * new_h)
    for y in range(new_h):
        sy = min(h - 1, (y * h) // new_h)
        row = px[sy * w : (sy + 1) * w]
        for x in range(new_w):
            out[y * new_w + x] = row[min(w - 1, (x * w) // new_w)]
    return encode_png(new_w, new_h, bytes(out))


def clip_wav(data: bytes, start_ms: int, dur_ms: int) -> bytes:
    """Real audio clipping: slice frames by time, re-encode WAV."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        frames = w.readframes(n)
    lo = min(n, (start_ms * sr) // 1000)
    hi = min(n, ((start_ms + dur_ms) * sr) // 1000)
    return encode_wav(sr, frames[lo:hi])


def stdlib_codec(content: bytes) -> dict[str, Any]:
    """Magic-sniffing dispatcher: PNG → WAV → GRFT synthetic. The drop-in
    argument for ``multimodal.set_codec``."""
    if content[:8] == PNG_SIG:
        return decode_png(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    from gcp_etl_pipeline_spark.operators.multimodal import _fake_decode

    return _fake_decode(content)


def wav_samples(data: bytes) -> tuple[int, bytes]:
    """Decode a WAV (the supported mono-8-bit subset) to
    (sample_rate, raw sample bytes) — the audio twin of ``png_pixels``.
    The mono-8-bit contract is ENFORCED: a stereo or 16-bit clip would
    otherwise be fingerprinted byte-wise into a meaningless-but-accepted
    hash; raising routes it into callers' existing undecodable-drop
    path instead."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 1 or w.getnchannels() != 1:
            raise ValueError(
                "wav_samples supports mono 8-bit only "
                f"(got {w.getnchannels()}ch x {8 * w.getsampwidth()}-bit)"
            )
        return w.getframerate(), w.readframes(w.getnframes())
