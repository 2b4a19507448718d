"""Pure-python ISO BMFF (MP4) demuxer — box walk + sample tables.

MP4 is a fully specified public container (ISO/IEC 14496-12): a tree of
[size(4) | type(4) | payload] boxes. This module parses the tree and the
sample tables of each track:

- ``moov/trak/mdia/hdlr``   handler (vide / soun)
- ``.../mdhd``              timescale + duration
- ``.../stbl/stsd``         codec fourcc
- ``.../stbl/stsz``         per-sample byte sizes
- ``.../stbl/stsc``         sample -> chunk mapping
- ``.../stbl/stco|co64``    chunk file offsets
- ``.../stbl/stss``         sync (key) samples, when present

Resolving (stsz, stsc, stco) yields the EXACT byte range of every sample
in the file — which is what distributed frame sampling actually needs:
:func:`linref_spark.web.multimodal.sample_frames` emits real per-frame
byte ranges for MP4 bytes instead of naive container slicing. Decoding
the codec payload (H.264 etc.) remains a declared stub — that genuinely
needs a media library.

A minimal writer (:func:`encode_mp4_stub`) synthesizes a valid
single-video-track file with deterministic fake sample payloads so the
demuxer is testable end-to-end without any media library.
"""

from __future__ import annotations

import struct
from typing import Optional

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta", b"dinf",
}


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in a span."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing span
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """First box at a nested path; returns (payload_start, payload_end)."""
    if not path:
        return start, end
    for btype, b0, b1 in _walk(data, start, end):
        if btype == path[0]:
            return _find(data, b0, b1, path[1:])
    return None


def _find_all(data: bytes, start: int, end: int, btype: bytes):
    return [(b0, b1) for t, b0, b1 in _walk(data, start, end) if t == btype]


def _table(data: bytes, off: int, count: int, width: int, fmt_char: str):
    """Unpack ``count`` fixed-width entries at ``off``; None when the
    declared count overruns the available bytes (truncated/malformed
    table — e.g. an stsz claiming 1000 samples with 8 bytes of payload
    must not raise struct.error inside a Spark task)."""
    end = off + width * count
    if count < 0 or end > len(data):
        return None
    return struct.unpack(f">{count}{fmt_char}", data[off:end])


def parse_mp4_tracks(data: bytes) -> Optional[list[dict]]:
    """MP4 bytes -> per-track metadata + resolved sample byte ranges.

    Returns None unless the bytes start with a valid ``ftyp`` box. Each
    track dict: handler ('vide'/'soun'/...), codec (stsd fourcc),
    timescale, duration, n_samples, samples = [(offset, size)], and
    sync_samples (1-based indices from stss; None = every sample a sync).
    """
    if data is None or len(data) < 12:
        return None
    data = bytes(data)
    top = list(_walk(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        return None
    moov = next(((b0, b1) for t, b0, b1 in top if t == b"moov"), None)
    if moov is None:
        return None
    tracks = []
    for t0, t1 in _find_all(data, moov[0], moov[1], b"trak"):
        mdia = _find(data, t0, t1, [b"mdia"])
        if mdia is None:
            continue
        handler = codec = None
        timescale = duration = 0
        hd = _find(data, mdia[0], mdia[1], [b"hdlr"])
        if hd is not None and hd[1] - hd[0] >= 12:
            handler = data[hd[0] + 8 : hd[0] + 12].decode("latin1")
        mh = _find(data, mdia[0], mdia[1], [b"mdhd"])
        if mh is not None and mh[1] - mh[0] >= 1:
            version = data[mh[0]]
            if version == 1 and mh[1] - mh[0] >= 32:
                timescale, duration = struct.unpack(
                    ">IQ", data[mh[0] + 20 : mh[0] + 32]
                )
            elif version == 0 and mh[1] - mh[0] >= 20:
                timescale, duration = struct.unpack(
                    ">II", data[mh[0] + 12 : mh[0] + 20]
                )
        stbl = _find(data, mdia[0], mdia[1], [b"minf", b"stbl"])
        if stbl is None:
            continue
        sd = _find(data, stbl[0], stbl[1], [b"stsd"])
        if sd is not None and sd[1] - sd[0] >= 16:
            codec = data[sd[0] + 12 : sd[0] + 16].decode("latin1")

        # Every declared table size below is validated against the bytes
        # actually present (_table -> None) so truncated or hostile sample
        # tables skip the track instead of raising struct.error.

        # --- sample size table (stsz) ---------------------------------
        sz = _find(data, stbl[0], stbl[1], [b"stsz"])
        if sz is None or sz[1] - sz[0] < 12:
            continue
        const_size, n_samples = struct.unpack(">II", data[sz[0] + 4 : sz[0] + 12])
        if const_size:
            # every sample must physically fit in the file
            if const_size * n_samples > len(data):
                continue
            sizes = [const_size] * n_samples
        else:
            tbl = _table(data, sz[0] + 12, n_samples, 4, "I")
            if tbl is None:
                continue
            sizes = list(tbl)

        # --- chunk offsets (stco / co64) ------------------------------
        co = _find(data, stbl[0], stbl[1], [b"stco"])
        if co is not None:
            if co[1] - co[0] < 8:
                continue
            (n_chunks,) = struct.unpack(">I", data[co[0] + 4 : co[0] + 8])
            tbl = _table(data, co[0] + 8, n_chunks, 4, "I")
        else:
            co = _find(data, stbl[0], stbl[1], [b"co64"])
            if co is None or co[1] - co[0] < 8:
                continue
            (n_chunks,) = struct.unpack(">I", data[co[0] + 4 : co[0] + 8])
            tbl = _table(data, co[0] + 8, n_chunks, 8, "Q")
        if tbl is None:
            continue
        offsets = list(tbl)

        # --- sample -> chunk (stsc), run-length encoded ----------------
        sc = _find(data, stbl[0], stbl[1], [b"stsc"])
        if sc is None or sc[1] - sc[0] < 8:
            continue
        (n_ent,) = struct.unpack(">I", data[sc[0] + 4 : sc[0] + 8])
        flat = _table(data, sc[0] + 8, 3 * n_ent, 4, "I")
        if flat is None:
            continue
        ents = [
            flat[3 * i : 3 * i + 3] for i in range(n_ent)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_index)

        samples: list[tuple[int, int]] = []
        si = 0
        for ei, (first, per_chunk, _desc) in enumerate(ents):
            last = (
                ents[ei + 1][0] - 1 if ei + 1 < len(ents) else len(offsets)
            )
            for chunk in range(first, last + 1):
                if chunk - 1 >= len(offsets) or si >= n_samples:
                    break
                off = offsets[chunk - 1]
                for _ in range(per_chunk):
                    if si >= n_samples:
                        break
                    samples.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        if si < n_samples:
            return None  # malformed tables

        # --- sync samples (stss), optional ----------------------------
        ss = _find(data, stbl[0], stbl[1], [b"stss"])
        sync = None
        if ss is not None and ss[1] - ss[0] >= 8:
            (n_sync,) = struct.unpack(">I", data[ss[0] + 4 : ss[0] + 8])
            tbl = _table(data, ss[0] + 8, n_sync, 4, "I")
            sync = list(tbl) if tbl is not None else None
        tracks.append(
            {
                "handler": handler,
                "codec": codec,
                "timescale": timescale,
                "duration": duration,
                "n_samples": n_samples,
                "samples": samples,
                "sync_samples": sync,
            }
        )
    return tracks


def mp4_frame_ranges(
    data: bytes, n_frames: int, keyframes_only: bool = False
) -> Optional[list[tuple[int, int, int]]]:
    """Evenly sample ``n_frames`` video samples: [(sample_idx, offset,
    size)]. ``keyframes_only`` restricts the pool to stss sync samples.
    None when the bytes are not parseable MP4 or have no video track."""
    tracks = parse_mp4_tracks(data)
    if not tracks:
        return None
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    if video is None or not video["samples"]:
        return None
    pool = list(range(len(video["samples"])))
    if keyframes_only and video["sync_samples"]:
        pool = [s - 1 for s in video["sync_samples"] if 0 < s <= len(pool)]
    if not pool:
        return None
    n = min(n_frames, len(pool))
    picked = [pool[(i * len(pool)) // n] for i in range(n)]
    return [(i, *video["samples"][i]) for i in picked]


# --- minimal writer for fixtures -------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mp4_stub(
    sample_payloads: list[bytes],
    timescale: int = 1000,
    sample_duration: int = 40,
    keyframe_every: int = 4,
    samples_per_chunk: int = 3,
    codec: bytes = b"fake",
) -> bytes:
    """Valid single-video-track MP4 whose mdat carries the given sample
    payloads. With the default ``codec=b'fake'`` the payloads are
    DETERMINISTIC FAKE codec data — not real video; pass ``codec=b'jpeg'``
    with baseline-JPEG payloads for a real decodable MJPEG-in-MP4 file
    (Motion JPEG: every sample is an independent JPEG image). The
    container structure and sample tables are real and spec-conformant
    either way. Chunks of ``samples_per_chunk`` exercise the stsc
    run-length path."""
    n = len(sample_payloads)
    sizes = [len(p) for p in sample_payloads]
    mdat_payload = b"".join(sample_payloads)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mdat follows ftyp directly; chunk offsets are absolute file offsets
    mdat_start = len(ftyp) + 8  # mdat payload offset
    chunk_offsets = []
    pos = mdat_start
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(sizes[i : i + samples_per_chunk])

    duration = n * sample_duration
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3xIIIIHH", 0, 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _box(b"hdlr", struct.pack(">B3xI4s12x", 0, 0, b"vide") + b"\x00")
    stsd = _box(
        b"stsd",
        struct.pack(">B3xI", 0, 1)
        + _box(codec, struct.pack(">6xH", 1)),  # sample-entry fourcc
    )
    stts = _box(b"stts", struct.pack(">B3xIII", 0, 1, n, sample_duration))
    stsc_entries = [(1, samples_per_chunk, 1)]
    rem = n % samples_per_chunk
    if rem:
        stsc_entries.append((len(chunk_offsets), rem, 1))
    stsc = _box(
        b"stsc",
        struct.pack(">B3xI", 0, len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _box(
        b"stco",
        struct.pack(">B3xI", 0, len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    syncs = list(range(1, n + 1, keyframe_every))
    stss = _box(
        b"stss",
        struct.pack(">B3xI", 0, len(syncs))
        + b"".join(struct.pack(">I", s) for s in syncs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">B3xIIII", 0, 0, 0, 1, 0) + b"\x00" * 64)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, duration) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


# --- MJPEG-in-MP4: the real end-to-end video path -------------------------------
#
# Motion JPEG stores every video sample as an independent baseline JPEG,
# so the pure-numpy JPEG codec (linref_spark/web/codecs.py) decodes real
# frames straight out of the demuxed byte ranges — no media library.
# H.264/H.265 payload decode remains the declared stub.

_MJPEG_FOURCC = {"jpeg", "mjpa", "mjpb", "MJPG", "AVDJ"}


def decode_mp4_mjpeg(data: bytes, frame: int = 0):
    """MP4 bytes -> (h, w, 3) uint8 RGB of the ``frame``-th video sample,
    when the track is Motion JPEG (or the sample simply IS a baseline
    JPEG — the payload magic decides, the fourcc is advisory). None for
    unparseable containers, missing frames, or non-JPEG payloads."""
    from linref_spark.web import codecs as _C

    tracks = parse_mp4_tracks(data)
    if not tracks:
        return None
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    if video is None or frame >= len(video["samples"]):
        return None
    off, sz = video["samples"][frame]
    return _C.decode_jpeg(data[off : off + sz])


def encode_mp4_mjpeg(img, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 -> single-frame MJPEG-in-MP4: a real container
    (fourcc 'jpeg') whose one video sample is a baseline JPEG, so the
    resize pipeline re-emits bytes that demux AND decode again."""
    from linref_spark.web import codecs as _C

    return encode_mp4_stub(
        [_C.encode_jpeg_baseline(img, quality=quality)], codec=b"jpeg"
    )


def mp4_mjpeg_feature(data: bytes):
    """MP4 bytes -> 16-dim feature of the first video frame (MJPEG only);
    None when the container or payload is not decodable."""
    from linref_spark.web import codecs as _C

    img = decode_mp4_mjpeg(bytes(data)) if data is not None else None
    if img is None:
        return None
    import numpy as np

    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = np.minimum((np.arange(h) * 4) // h, 3)
    xi = np.minimum((np.arange(w) * 4) // w, 3)
    bid = (yi[:, None] * 4 + xi[None, :]).ravel()
    sums = np.bincount(bid, weights=gray.ravel(), minlength=16)
    cnts = np.maximum(np.bincount(bid, minlength=16), 1)
    return (sums / cnts / 255.0).astype(np.float32)
