"""Pure-stdlib + numpy media codecs (no PIL/librosa/ffmpeg in this env).

Real encoders/decoders for three PUBLIC formats, from their public specs:

* **BMP** — uncompressed 24-bit Windows bitmap (BITMAPINFOHEADER,
  bottom-up rows, 4-byte row padding).
* **PNG** — 8-bit RGB, zlib-compressed scanlines with the five standard
  filters (None/Sub/Up/Average/Paeth) on both encode and decode; decode
  unfilters row-by-row with vectorized per-row kernels.
* **WAV** — PCM s16le via the stdlib ``wave`` module.

Video has no stdlib container, so ``FRAMESEQ`` is an honest synthetic
container documented here: magic ``b"FSEQ"`` + u32 frame count, then each
frame as u32 length + a real BMP payload.  Frame extraction and per-frame
decode are real; only the container framing is ours.

These kernels replace the round-2 ``FakeDecoder`` stub as the default
``decode_media`` path (reference parity: the crawler stores fetched bodies
as opaque bytes and derives typed metadata downstream —
``prosearch/src/main/java/com/milindmantri/Manager.java`` content handling).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------- BMP ----


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores BGR, bottom-up, each row padded to 4 bytes
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    file_size = 14 + 40 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (H, W, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(payload, np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# ---------------------------------------------------------------- PNG ----

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _paeth(a, b, c):
    """Vectorized Paeth predictor over int16 arrays (PNG spec §9.4)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, *, filter_mode: str = "cycle") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit-RGB PNG.

    ``filter_mode='cycle'`` applies filter type ``row % 5`` so every
    standard filter is exercised (and the decoder proven against all
    five); ``'none'`` writes filter-0 rows only."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    bpp = 3
    raw = arr.reshape(h, w * bpp)
    prev = np.zeros(w * bpp, np.uint8)
    out = bytearray()
    for y in range(h):
        row = raw[y]
        ft = (y % 5) if filter_mode == "cycle" else 0
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        else:
            enc = row - _paeth(left, prev, ul)
        out.append(ft)
        out.extend(enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit-RGB non-interlaced PNG (all five row filters)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError(f"unsupported PNG (depth={depth}, "
                                 f"color={ctype}, interlace={ilace})")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp, row_bytes = 3, w * 3
    stride = row_bytes + 1
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    out = np.empty((h, row_bytes), np.uint8)
    zero = np.zeros(row_bytes, np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y else zero
        if ft == 0:
            out[y] = cur
        elif ft == 1:
            # Sub: sequential in the pixel dimension; per-channel cumsum
            # over uint8 wraparound == the spec's byte-serial recurrence
            ch = cur.reshape(w, bpp)
            out[y] = np.cumsum(ch.astype(np.uint64), axis=0).astype(
                np.uint8).reshape(row_bytes)
        elif ft == 2:
            out[y] = cur + prev
        elif ft == 3:
            o = out[y]
            for x in range(row_bytes):
                left = o[x - bpp] if x >= bpp else 0
                o[x] = (int(cur[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:
            o = out[y]
            for x in range(row_bytes):
                a = o[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = int(a) + int(b) - int(c)
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c)
                o[x] = (int(cur[x]) + int(pred)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------- WAV ----


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode mono s16 PCM samples as a WAV via the stdlib wave module."""
    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Decode a PCM WAV -> (samples int16 ndarray, rate, n_channels)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        if width != 2:
            raise ValueError(f"unsupported WAV sample width {width}")
        data = f.readframes(f.getnframes())
    return np.frombuffer(data, np.int16), rate, nch


# ----------------------------------------------------------- FRAMESEQ ----

_FSEQ_MAGIC = b"FSEQ"


def encode_frameseq(frames) -> bytes:
    """Pack real BMP frames into the documented synthetic video container."""
    out = bytearray(_FSEQ_MAGIC + struct.pack("<I", len(frames)))
    for fr in frames:
        b = encode_bmp(fr)
        out.extend(struct.pack("<I", len(b)))
        out.extend(b)
    return bytes(out)


def iter_frameseq(payload: bytes, step: int = 1):
    """Yield (frame_index, bmp_bytes) for every ``step``-th frame WITHOUT
    decoding skipped frames (the point of frame sampling at scale)."""
    if payload[:4] != _FSEQ_MAGIC:
        raise ValueError("not a FRAMESEQ payload")
    n = struct.unpack_from("<I", payload, 4)[0]
    pos = 8
    for i in range(n):
        ln = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        if i % step == 0:
            yield i, payload[pos: pos + ln]
        pos += ln


def frameseq_len(payload: bytes) -> int:
    if payload[:4] != _FSEQ_MAGIC:
        raise ValueError("not a FRAMESEQ payload")
    return struct.unpack_from("<I", payload, 4)[0]


# ------------------------------------------------------------- sniffing --


def sniff_kind(payload: bytes) -> str:
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == _FSEQ_MAGIC:
        return "frameseq"
    raise ValueError(f"unrecognized media magic {payload[:8]!r}")


def resize_block_mean(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer block-mean downsample (vectorized): requires the source dims
    to be multiples of the target dims (the synthesis rule guarantees it)."""
    h, w, c = arr.shape
    fy, fx = h // out_h, w // out_w
    if fy * out_h != h or fx * out_w != w:
        raise ValueError(f"non-integer resize {w}x{h} -> {out_w}x{out_h}")
    v = arr[: out_h * fy, : out_w * fx].reshape(out_h, fy, out_w, fx, c)
    return (v.sum(axis=(1, 3), dtype=np.uint32) // (fy * fx)).astype(np.uint8)
