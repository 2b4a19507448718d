"""Pure-numpy reference codecs for the multimodal operators.

The container ships no media libraries, so the registry in
:mod:`linref_spark.web.multimodal` is proven end-to-end with two REAL
parsers for uncompressed formats (both fully specified public formats):

- 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up or top-down rows,
  4-byte row padding, BGR order);
- PCM16 mono WAV (RIFF chunk walk, fmt + data).

Compressed/exotic codecs (JPEG, PNG, MP4...) remain stubbed — registering
a real library decoder is a one-line swap, nothing else changes.
"""

from __future__ import annotations

import struct

import numpy as np

FEATURE_DIM = 16


# --- BMP (24-bit uncompressed) -------------------------------------------------


def encode_bmp24(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes (bottom-up, padded rows)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - w * 3)
    bgr = img[:, :, ::-1]
    rows = [bgr[y].tobytes() + pad for y in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp24(data: bytes) -> np.ndarray | None:
    """BMP bytes -> (h, w, 3) uint8 RGB; None if not 24-bit uncompressed."""
    if data is None or len(data) < 54 or data[:2] != b"BM":
        return None
    offset = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    if offset + row_size * h > len(data):
        return None
    buf = np.frombuffer(data, np.uint8, count=row_size * h, offset=offset)
    rows = buf.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (vectorized)."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[yi[:, None], xi[None, :]]


def bmp_feature(data: bytes) -> np.ndarray | None:
    """BMP -> 16-dim feature: 4x4 grid of grayscale block means in [0, 1].
    None for bytes that are not 24-bit uncompressed BMP (exotic codecs are
    deliberately stubbed)."""
    img = decode_bmp24(bytes(data)) if data is not None else None
    if img is None:
        return None
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = np.minimum((np.arange(h) * 4) // h, 3)
    xi = np.minimum((np.arange(w) * 4) // w, 3)
    bid = (yi[:, None] * 4 + xi[None, :]).ravel()
    sums = np.bincount(bid, weights=gray.ravel(), minlength=16)
    cnts = np.bincount(bid, minlength=16)
    return (sums / np.maximum(cnts, 1) / 255.0).astype(np.float32)


# --- WAV (PCM16 mono) -----------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    data = np.asarray(samples).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int] | None:
    """WAV bytes -> (int16 samples, sample_rate); None unless PCM16 mono."""
    if data is None or len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or bits != 16 or n_ch != 1:
                return None
        elif cid == b"data":
            samples = np.frombuffer(body[: sz - (sz & 1)], dtype="<i2")
        pos += 8 + sz + (sz & 1)
    if rate is None or samples is None:
        return None
    return samples, rate


def wav_feature(data: bytes) -> np.ndarray | None:
    """WAV -> 16-dim feature: mean |amplitude| envelope over 16 equal time
    bins, normalized by int16 full scale. None unless PCM16 mono."""
    dec = decode_wav_pcm16(bytes(data)) if data is not None else None
    if dec is None:
        return None
    s, _ = dec
    if len(s) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    absr = np.abs(s.astype(np.float64))
    bins = np.minimum((np.arange(len(s)) * 16) // len(s), 15)
    sums = np.bincount(bins, weights=absr, minlength=16)
    cnts = np.bincount(bins, minlength=16)
    return (sums / np.maximum(cnts, 1) / 32768.0).astype(np.float32)


# --- PNG (8-bit gray / RGB / RGBA, non-interlaced) -------------------------------
# Pure stdlib-zlib + numpy implementation of the public PNG spec (RFC 2083):
# chunk walk, IDAT inflate, and all five row filters un-applied. Makes the
# multimodal path credible on actual web-crawl bytes without any media lib.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, ch]) uint8 -> PNG bytes. Rows cycle through filter types
    0-4 so a roundtrip exercises every unfilter path."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = img.astype(np.int32)
    prior = np.zeros((w, ch), dtype=np.int32)
    out_rows = []
    for y in range(h):
        row = raw[y]
        f = y % 5
        left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
        ul = np.vstack([np.zeros((1, ch), np.int32), prior[:-1]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prior
        elif f == 3:
            filt = row - (left + prior) // 2
        else:  # paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = row - pred
        out_rows.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        prior = row
    idat = zlib.compress(b"".join(out_rows))

    def chunk(tag: bytes, body: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray | None:
    """PNG bytes -> (h, w, 3) uint8 RGB; None unless 8-bit gray/RGB/RGBA,
    non-interlaced (the overwhelmingly common web shapes). Grayscale is
    broadcast to RGB; alpha is dropped."""
    import zlib

    if data is None or len(data) < 8 or data[:8] != _PNG_SIG:
        return None
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln  # len + tag + body + crc
    if hdr is None or not idat:
        return None
    w, h, depth, color_type, comp, filt, interlace = hdr
    if depth != 8 or color_type not in _PNG_CHANNELS or comp or filt or interlace:
        return None
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (1 + stride):
        return None
    out = np.zeros((h, w, ch), dtype=np.int32)
    prior = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        rowb = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
        f = rowb[0]
        row = np.frombuffer(rowb, np.uint8, count=stride, offset=1).reshape(
            w, ch
        ).astype(np.int32)
        if f == 0:
            recon = row
        elif f == 1:  # sub: prefix sum along x per channel, mod 256
            recon = np.cumsum(row, axis=0) % 256
        elif f == 2:  # up
            recon = (row + prior) % 256
        elif f == 3:  # average: sequential in x (depends on left recon)
            recon = row.copy()
            recon[0] = (row[0] + prior[0] // 2) % 256
            for x in range(1, w):
                recon[x] = (row[x] + (recon[x - 1] + prior[x]) // 2) % 256
        elif f == 4:  # paeth
            recon = row.copy()
            for x in range(w):
                left = recon[x - 1] if x else np.zeros(ch, np.int32)
                ul = prior[x - 1] if x else np.zeros(ch, np.int32)
                p = left + prior[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prior[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior[x], ul)
                )
                recon[x] = (row[x] + pred) % 256
        else:
            return None
        out[y] = recon
        prior = recon
    img = out.astype(np.uint8)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()


def png_feature(data: bytes) -> np.ndarray | None:
    """PNG -> 16-dim feature: same 4x4 grayscale grid as bmp_feature."""
    img = decode_png(bytes(data)) if data is not None else None
    if img is None:
        return None
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = np.minimum((np.arange(h) * 4) // h, 3)
    xi = np.minimum((np.arange(w) * 4) // w, 3)
    bid = (yi[:, None] * 4 + xi[None, :]).ravel()
    sums = np.bincount(bid, weights=gray.ravel(), minlength=16)
    cnts = np.bincount(bid, minlength=16)
    return (sums / np.maximum(cnts, 1) / 255.0).astype(np.float32)


def image_feature(data: bytes) -> np.ndarray | None:
    """Magic-byte dispatch over the registered still-image codecs
    (BMP + PNG); None for anything else (jpeg/mp4 stay declared stubs)."""
    if data is None:
        return None
    b = bytes(data)
    if b[:2] == b"BM":
        return bmp_feature(b)
    if b[:8] == _PNG_SIG:
        return png_feature(b)
    return None


def decode_image(data: bytes) -> np.ndarray | None:
    """Magic-byte dispatch decode (BMP/PNG) -> (h, w, 3) uint8 RGB."""
    if data is None:
        return None
    b = bytes(data)
    if b[:2] == b"BM":
        return decode_bmp24(b)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    return None
