"""MP4 / ISO-BMFF container parsing from scratch (ISO/IEC 14496-12
box structure) — the video-container path that does NOT need a codec.

What a 100 TB curation pipeline does with video FIRST is container
triage: duration, resolution, frame count, fps, bitrate shape,
keyframe density — all of it lives in the moov box's sample tables
(stts/stsz/stss/stco), none of it needs a single pixel decoded.  This
module parses the real box tree and sample tables and derives those
statistics; decoding the codec payloads inside mdat (avc1/hevc/vp9)
remains the documented external-codec extension point, exactly like
MP3 on the audio side.  Animated GIF stays the fully-native decode
path (multimodal.decode_gif_frames).

Writer twin: encode_mp4_skeleton authors a minimal-but-valid MP4
(ftyp + moov/trak/mdia/minf/stbl + mdat) so fixtures and tests
exercise the parser on real box layouts without shipping binaries.

Failure discipline matches the other codecs: malformed/truncated
containers raise ValueError (per-row tolerance), well-formed but
unsupported structure raises NotImplementedError.
"""

from __future__ import annotations

import struct

_CONTAINER_BOXES = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
    b"udta", b"mvex", b"moof", b"traf",
}


def walk_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield (type, body_start, body_end) for each box in buf[start:end].
    Handles 64-bit largesize (size == 1) and to-end-of-file (size == 0).
    Raises ValueError on truncated/overlapping sizes."""
    end = len(buf) if end is None else end
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = buf[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {btype!r} size {size} out of bounds")
        yield btype, body, pos + size
        pos += size


def _find(buf: bytes, path: list[bytes], start: int, end: int):
    """All (body_start, body_end) spans of boxes at a nested path."""
    spans = [(start, end)]
    for name in path:
        nxt = []
        for s, e in spans:
            for btype, bs, be in walk_boxes(buf, s, e):
                if btype == name:
                    nxt.append((bs, be))
        spans = nxt
    return spans


def _full_box(buf: bytes, s: int):
    """(version, flags, payload_start) of a FullBox body."""
    if s + 4 > len(buf):
        raise ValueError("truncated full box")
    ver = buf[s]
    flags = int.from_bytes(buf[s + 1: s + 4], "big")
    return ver, flags, s + 4


def _read_stts(buf: bytes, s: int, e: int):
    """[(sample_count, sample_delta)] decoding-time deltas."""
    _v, _f, p = _full_box(buf, s)
    n = struct.unpack_from(">I", buf, p)[0]
    if p + 4 + 8 * n > e:
        raise ValueError("truncated stts")
    return [
        struct.unpack_from(">II", buf, p + 4 + 8 * i) for i in range(n)
    ]


def _read_stsz(buf: bytes, s: int, e: int):
    """(uniform_size_or_0, [sizes])."""
    _v, _f, p = _full_box(buf, s)
    uniform, count = struct.unpack_from(">II", buf, p)
    if uniform:
        return uniform, []
    if p + 8 + 4 * count > e:
        raise ValueError("truncated stsz")
    return 0, [
        struct.unpack_from(">I", buf, p + 8 + 4 * i)[0] for i in range(count)
    ]


def _read_entries_u32(buf: bytes, s: int, e: int):
    _v, _f, p = _full_box(buf, s)
    n = struct.unpack_from(">I", buf, p)[0]
    if p + 4 + 4 * n > e:
        raise ValueError("truncated u32 entry table")
    return [struct.unpack_from(">I", buf, p + 4 + 4 * i)[0] for i in range(n)]


def parse_mp4_tracks(payload: bytes) -> dict:
    """Parse an ISO-BMFF payload into {brand, timescale, duration_s,
    tracks: [per-track dict with kind/codec/geometry/sample stats]}.

    Sample statistics come straight from the stbl tables: n_samples and
    per-sample durations from stts, byte sizes from stsz, keyframe
    numbers from stss (absent stss == all keyframes, per spec)."""
    if len(payload) < 8:
        raise ValueError("not an ISO-BMFF payload")
    try:
        top = list(walk_boxes(payload))
    except struct.error as exc:  # pragma: no cover - belt and braces
        raise ValueError(f"malformed box structure: {exc!r}") from exc
    types = [t for t, _s, _e in top]
    if b"ftyp" not in types:
        raise ValueError("missing ftyp box")
    fs, fe = next((s, e) for t, s, e in top if t == b"ftyp")
    brand = payload[fs:fs + 4].decode("latin-1")
    if b"moov" not in types:
        raise NotImplementedError(
            "ISO-BMFF without a moov box (fragmented-only stream?) — "
            "sample tables unavailable"
        )
    ms, me = next((s, e) for t, s, e in top if t == b"moov")
    out: dict = {"brand": brand, "tracks": []}
    for s, e in _find(payload, [b"mvhd"], ms, me):
        ver, _f, p = _full_box(payload, s)
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", payload, p + 16)
        else:
            ts, dur = struct.unpack_from(">II", payload, p + 8)
        out["timescale"] = ts
        out["duration_s"] = dur / ts if ts else 0.0
    for ts_, te_ in _find(payload, [b"trak"], ms, me):
        trk: dict = {}
        for s, e in _find(payload, [b"tkhd"], ts_, te_):
            ver, _f, p = _full_box(payload, s)
            trk["track_id"] = struct.unpack_from(
                ">I", payload, p + (16 if ver == 1 else 8)
            )[0]
            wh = struct.unpack_from(">II", payload, e - 8)  # 16.16 fixed
            trk["width"] = wh[0] / 65536.0
            trk["height"] = wh[1] / 65536.0
        for s, e in _find(payload, [b"mdia", b"mdhd"], ts_, te_):
            ver, _f, p = _full_box(payload, s)
            if ver == 1:
                mts, mdur = struct.unpack_from(">IQ", payload, p + 16)
            else:
                mts, mdur = struct.unpack_from(">II", payload, p + 8)
            trk["timescale"] = mts
            trk["duration_s"] = mdur / mts if mts else 0.0
        for s, e in _find(payload, [b"mdia", b"hdlr"], ts_, te_):
            _v, _f, p = _full_box(payload, s)
            handler = payload[p + 4: p + 8]
            trk["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                handler, handler.decode("latin-1")
            )
        for s, e in _find(
            payload, [b"mdia", b"minf", b"stbl", b"stsd"], ts_, te_
        ):
            _v, _f, p = _full_box(payload, s)
            n = struct.unpack_from(">I", payload, p)[0]
            if n >= 1:
                trk["codec"] = payload[p + 8: p + 12].decode("latin-1")
        stbl = _find(payload, [b"mdia", b"minf", b"stbl"], ts_, te_)
        for ss, se in stbl:
            for btype, bs, be in walk_boxes(payload, ss, se):
                if btype == b"stts":
                    deltas = _read_stts(payload, bs, be)
                    trk["n_samples"] = sum(c for c, _d in deltas)
                    trk["stts"] = deltas
                elif btype == b"stsz":
                    uniform, sizes = _read_stsz(payload, bs, be)
                    trk["uniform_size"] = uniform
                    trk["sizes"] = sizes
                elif btype == b"stss":
                    trk["keyframes"] = _read_entries_u32(payload, bs, be)
                elif btype == b"stco":
                    trk["chunk_offsets"] = _read_entries_u32(payload, bs, be)
        out["tracks"].append(trk)
    if not out["tracks"]:
        raise NotImplementedError("moov with no trak boxes")
    return out


def sample_timeline(trk: dict):
    """Per-sample (dts_seconds, size_bytes) from the stts/stsz tables —
    the container-level timeline a frame-sampling curator needs."""
    ts = trk.get("timescale") or 1
    dts, t = [], 0
    for count, delta in trk.get("stts", []):
        for _ in range(count):
            dts.append(t / ts)
            t += delta
    n = len(dts)
    if trk.get("uniform_size"):
        sizes = [trk["uniform_size"]] * n
    else:
        sizes = (trk.get("sizes") or [0] * n)[:n]
        sizes += [0] * (n - len(sizes))
    return list(zip(dts, sizes))


def mp4_container_features(payload: bytes) -> list[float]:
    """16 container-derived floats for an MP4 video payload — the same
    vector shape as multimodal.video_features but computed from the
    sample tables (no pixel decode): canvas dims, frame count,
    duration, fps, keyframe ratio, an 8-point bitrate-over-time
    profile, and mean sample size.  Honest scope: these are TRIAGE
    features (what you filter on before paying for a codec); pixel
    statistics require the external decoder."""
    import numpy as np

    info = parse_mp4_tracks(payload)
    vid = next(
        (t for t in info["tracks"] if t.get("kind") == "video"), None
    )
    if vid is None:
        raise NotImplementedError("MP4 without a video track")
    timeline = sample_timeline(vid)
    n = len(timeline)
    dur = vid.get("duration_s") or info.get("duration_s") or 0.0
    fps = n / dur if dur else 0.0
    sizes = np.array([sz for _t, sz in timeline], dtype=np.float64)
    if n == 0:
        sizes = np.zeros(1)
    # 8-bucket byte-rate profile over the timeline, normalized to sum 1
    # (the same fixed-length profile shape audio_features uses)
    seg = np.array_split(sizes, 8)
    e = np.array([s.sum() for s in seg], dtype=np.float64)
    total = e.sum()
    profile = (e / total) if total > 0 else np.zeros(8)
    kf = len(vid.get("keyframes", [])) or n  # no stss: all sync, per spec
    out = [
        vid.get("width", 0.0) / 4096.0,
        vid.get("height", 0.0) / 4096.0,
        n / 65536.0,
        dur / 60.0,
        fps / 120.0,
        (kf / n) if n else 0.0,
        *profile.tolist(),
        float(sizes.mean()) / 65536.0,
        (8.0 * float(sizes.sum()) / dur / 1e6) if dur else 0.0,  # Mbit/s
    ]
    return [float(np.float32(v)) for v in out]


# --- writer twin ---------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([ver]) + flags.to_bytes(3, "big") + body)


def encode_mp4_skeleton(width: int, height: int, sample_sizes: list[int],
                        fps: int = 10, timescale: int = 1000,
                        keyframe_every: int = 5,
                        codec: bytes = b"avc1") -> bytes:
    """Author a minimal valid single-video-track MP4: real ftyp / moov /
    trak / mdia / minf / stbl box layout with consistent stts / stsz /
    stsc / stco / stss tables and an mdat of deterministic filler bytes
    sized by sample_sizes.  The codec sample entry is a bare visual
    header (no avcC) — enough for any container parser, decodable by
    none, which is the point: fixtures for the triage path."""
    n = len(sample_sizes)
    delta = timescale // fps
    mdat_body = b"".join(
        bytes((i * 31 + j * 7) % 256 for j in range(sz))
        for i, sz in enumerate(sample_sizes)
    )
    # visual sample entry: 6 reserved + data_ref_index, then the 70-byte
    # visual header (pre-defined/reserved, width/height, dpi, frame
    # count, compressor name, depth, pre-defined)
    vse = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(codec, vse))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(
            struct.pack(">I", s) for s in sample_sizes
        ),
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    keyframes = list(range(1, n + 1, keyframe_every))
    stss = _full(
        b"stss", 0, 0,
        struct.pack(">I", len(keyframes)) + b"".join(
            struct.pack(">I", k) for k in keyframes
        ),
    )
    # stco needs the absolute mdat body offset: build once with a
    # placeholder, measure, rebuild (stco's size is value-independent)
    def build(chunk_off: int) -> bytes:
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
        stbl2 = _box(b"stbl", stsd + stts + stsc + stsz + stss + stco)
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        url = _full(b"url ", 0, 1, b"")
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
        dinf = _box(b"dinf", dref)
        minf = _box(b"minf", vmhd + dinf + stbl2)
        dur = n * delta
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"triage\x00",
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIII", 0, 0, 1, 0)
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", width << 16, height << 16),
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">IH", 0x00010000, 0x0100)
            + b"\x00" * 10
            + struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        moov = _box(b"moov", mvhd + trak)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        return ftyp + moov + _box(b"mdat", mdat_body)

    probe = build(0)
    mdat_off = len(probe) - len(mdat_body)
    return build(mdat_off)
