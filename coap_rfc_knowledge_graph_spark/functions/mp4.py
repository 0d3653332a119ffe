"""ISO BMFF (MP4/MOV) CONTAINER parser in pure stdlib — metadata only.

Codec-level frame decode (H.264/H.265/AAC) genuinely needs an external
library and stays a documented stub in ``multimodal.decode_backend``;
but the container — brand, movie duration, per-track handler/codec
fourcc/dimensions/sample counts — is plain big-endian struct walking,
and it is what a crawl pipeline actually needs from video rows before
any frame is ever decoded: real durations feed
``multimodal.sample_video_frames``'s timestamp fan-out, codec/track
facts feed curation filters (drop audio-only, drop >N-minute, keep
h264), all without shipping the payload past the metadata stage.

``parse_mp4`` walks the box tree (size/largesize/to-EOF forms,
versioned full boxes for mvhd/tkhd/mdhd) and returns movie + track
facts. ``build_mp4`` constructs a minimal conformant fixture tree so
tests roundtrip without any real video file (the
``encode_png``/``encode_jpeg``/``encode_gif`` pattern).
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        btype = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr:
            raise ValueError(f"bad MP4 box size {size} for {btype!r}")
        yield btype, i + hdr, min(i + size, end)
        i += size


def _full_box(data: bytes, s: int) -> tuple[int, int]:
    """(version, body offset past version/flags)."""
    return data[s], s + 4


def parse_mp4(payload: bytes) -> dict:
    """MP4/MOV bytes -> {brand, timescale, duration_ms, tracks:[...]}.
    Each track: {track_id, kind ('video'/'audio'/4cc), codec,
    width, height, n_samples, duration_ms}."""
    out: dict = {"brand": None, "timescale": None, "duration_ms": None, "tracks": []}
    saw_moov = False

    def walk(start: int, end: int, ctx: dict) -> None:
        nonlocal saw_moov
        for btype, s, e in _boxes(payload, start, end):
            if btype == b"ftyp":
                out["brand"] = payload[s : s + 4].decode("ascii", "replace")
            elif btype == b"moov":
                saw_moov = True
                walk(s, e, ctx)
            elif btype == b"mvhd":
                v, b = _full_box(payload, s)
                b += 16 if v == 1 else 8  # skip creation/modification times
                if v == 1:
                    ts, dur = struct.unpack(">IQ", payload[b : b + 12])
                else:
                    ts, dur = struct.unpack(">II", payload[b : b + 8])
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else None
            elif btype == b"trak":
                ctx = {"track_id": None, "kind": None, "codec": None,
                       "width": 0, "height": 0, "n_samples": 0, "duration_ms": None}
                out["tracks"].append(ctx)
                walk(s, e, ctx)
            elif btype == b"tkhd":
                v, b = _full_box(payload, s)
                b += 16 if v == 1 else 8
                (ctx["track_id"],) = struct.unpack(">I", payload[b : b + 4])
                # width/height: fixed 16.16 in the last 8 bytes
                wq, hq = struct.unpack(">II", payload[e - 8 : e])
                ctx["width"], ctx["height"] = wq >> 16, hq >> 16
            elif btype == b"mdhd":
                v, b = _full_box(payload, s)
                b += 16 if v == 1 else 8
                if v == 1:
                    ts, dur = struct.unpack(">IQ", payload[b : b + 12])
                else:
                    ts, dur = struct.unpack(">II", payload[b : b + 8])
                ctx["duration_ms"] = int(dur * 1000 // ts) if ts else None
            elif btype == b"hdlr":
                _v, b = _full_box(payload, s)
                handler = payload[b + 4 : b + 8]
                ctx["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                    handler, handler.decode("ascii", "replace")
                )
            elif btype == b"stsd":
                _v, b = _full_box(payload, s)
                (n_entries,) = struct.unpack(">I", payload[b : b + 4])
                if n_entries:
                    ctx["codec"] = payload[b + 8 : b + 12].decode("ascii", "replace")
            elif btype == b"stts":
                _v, b = _full_box(payload, s)
                (n_entries,) = struct.unpack(">I", payload[b : b + 4])
                total = 0
                for k in range(n_entries):
                    (cnt,) = struct.unpack(">I", payload[b + 4 + 8 * k : b + 8 + 8 * k])
                    total += cnt
                ctx["n_samples"] = total
            elif btype in _CONTAINERS:
                walk(s, e, ctx)

    walk(0, len(payload), {})
    if not saw_moov:
        raise ValueError("not an MP4 (no moov box)")
    return out


# --- fixture builder (roundtrip-test support) ------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(
    duration_ms: int = 4000,
    timescale: int = 1000,
    video: tuple[int, int, int] | None = (640, 360, 120),
    audio_samples: int = 0,
    brand: bytes = b"isom",
) -> bytes:
    """Minimal conformant MP4 fixture: ftyp + moov(mvhd + tracks) +
    empty mdat. ``video`` = (width, height, n_frames) or None;
    ``audio_samples`` > 0 adds an audio track."""
    dur = duration_ms * timescale // 1000

    def full(btype: bytes, body: bytes, version: int = 0) -> bytes:
        return _box(btype, bytes([version, 0, 0, 0]) + body)

    def stbl(fourcc: bytes, n_samples: int) -> bytes:
        stsd = full(b"stsd", struct.pack(">I", 1) + _box(fourcc, b"\x00" * 70))
        stts = full(b"stts", struct.pack(">III", 1, n_samples, max(1, dur // max(1, n_samples))))
        stsz = full(b"stsz", struct.pack(">III", 256, n_samples, 0))
        stco = full(b"stco", struct.pack(">I", 0))
        return _box(b"stbl", stsd + stts + stsz + stco)

    def trak(track_id: int, handler: bytes, fourcc: bytes, w: int, h: int, n: int) -> bytes:
        tkhd = full(
            b"tkhd",
            struct.pack(">II", 0, 0)  # ctime, mtime
            + struct.pack(">I", track_id)
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 8  # reserved
            + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, pad
            + b"\x00" * 36  # identity matrix slot (zeros are fine for parse)
            + struct.pack(">II", w << 16, h << 16),
            version=0,
        )
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, dur) + struct.pack(">HH", 0x55C4, 0))
        hdlr = full(b"hdlr", struct.pack(">I", 0) + handler + b"\x00" * 12 + b"parser\x00")
        minf = _box(b"minf", stbl(fourcc, n))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, dur) + b"\x00" * 80,
        version=0,
    )
    traks = b""
    tid = 1
    if video is not None:
        w, h, n = video
        traks += trak(tid, b"vide", b"avc1", w, h, n)
        tid += 1
    if audio_samples:
        traks += trak(tid, b"soun", b"mp4a", 0, 0, audio_samples)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + b"isomiso2")
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat
