"""Matroska / WebM (EBML) container parsing from scratch — the second
video-container triage path next to mp4.py (ISO-BMFF).

Same 100 TB rationale as the MP4 parser: video curation FIRST triages
on container metadata (duration, resolution, codec, block timeline,
keyframe density, bitrate shape) and only then pays for a codec.  All
of that lives in the EBML element tree (Info / Tracks / Cluster); none
of it needs a pixel.  Decoding the codec payloads inside SimpleBlocks
(VP8/VP9/AV1/Opus) remains the documented external-codec extension
point, exactly like avc1 inside mdat on the MP4 side.

Writer twin: encode_webm_skeleton authors a minimal-but-valid Matroska
stream (EBML header + Segment{Info, Tracks, Clusters of SimpleBlocks})
so fixtures and tests exercise the parser on real element layouts
without shipping binaries.

Failure discipline matches the other codecs: malformed / truncated
streams raise ValueError (per-row tolerance), well-formed but
unsupported structure raises NotImplementedError.

EBML varint rules (RFC 8794 §4): the count of leading zero bits in the
first byte gives the tail length; element IDs KEEP the marker bit,
data sizes STRIP it; an all-ones size is "unknown" (streamed), which
this parser resolves as to-end-of-parent.
"""

from __future__ import annotations

import struct

# element IDs (with marker bit, as they appear on the wire)
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1
REFERENCE_BLOCK = 0xFB

_MASTER = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO, CLUSTER,
           BLOCK_GROUP, EBML_HEADER}


def read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos) of the EBML varint at pos.  keep_marker=True
    for element IDs, False for sizes.  Returns value -1 for an
    all-ones (unknown) size."""
    if pos >= len(buf):
        raise ValueError("truncated EBML varint")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (>8 bytes)")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(buf):
        raise ValueError("truncated EBML varint body")
    val = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    if not keep_marker:
        # all data bits set == unknown size
        if val == (1 << (7 * length)) - 1:
            return -1, pos + length
    return val, pos + length


def walk_elements(buf: bytes, start: int = 0, end: int | None = None):
    """Yield (element_id, body_start, body_end) for each EBML element in
    buf[start:end].  Unknown-size elements extend to the parent's end
    (only legal for master elements, per RFC 8794)."""
    end = len(buf) if end is None else end
    pos = start
    while pos < end:
        eid, p = read_vint(buf, pos, keep_marker=True)
        size, body = read_vint(buf, p, keep_marker=False)
        if size < 0:
            if eid not in _MASTER:
                raise ValueError(
                    f"unknown-size non-master element 0x{eid:x}")
            size = end - body
        if body + size > end:
            raise ValueError(f"element 0x{eid:x} size {size} out of bounds")
        yield eid, body, body + size
        pos = body + size


def _find(buf: bytes, path: list[int], start: int, end: int):
    """All (body_start, body_end) spans of elements at a nested path."""
    spans = [(start, end)]
    for eid in path:
        nxt = []
        for s, e in spans:
            for got, bs, be in walk_elements(buf, s, e):
                if got == eid:
                    nxt.append((bs, be))
        spans = nxt
    return spans


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError(f"EBML float of width {n}")


def parse_webm_tracks(payload: bytes) -> dict:
    """Parse a Matroska/WebM payload into {doctype, timestamp_scale_ns,
    duration_s, tracks: [...], blocks: [(track, abs_ts_ms, size,
    keyframe)]} — the container-level timeline a curator triages on.

    SimpleBlock keyframe flag is bit 0x80 of the flags byte; a Block
    inside a BlockGroup is a keyframe iff the group carries no
    ReferenceBlock (per spec)."""
    if len(payload) < 4:
        raise ValueError("not an EBML payload")
    top = list(walk_elements(payload))
    ids = [i for i, _s, _e in top]
    if not ids or ids[0] != EBML_HEADER:
        raise ValueError("missing EBML header")
    hs, he = top[0][1], top[0][2]
    doctype = "matroska"  # RFC 8794 default when DocType is absent
    for eid, s, e in walk_elements(payload, hs, he):
        if eid == DOCTYPE:
            doctype = payload[s:e].decode("latin-1").rstrip("\x00")
    if doctype not in ("matroska", "webm"):
        raise NotImplementedError(f"EBML doctype {doctype!r}")
    if SEGMENT not in ids:
        raise ValueError("missing Segment element")
    seg_s, seg_e = next((s, e) for i, s, e in top if i == SEGMENT)

    out: dict = {"doctype": doctype, "timestamp_scale_ns": 1_000_000,
                 "tracks": [], "blocks": []}
    for s, e in _find(payload, [INFO], seg_s, seg_e):
        for eid, es, ee in walk_elements(payload, s, e):
            if eid == TIMESTAMP_SCALE:
                out["timestamp_scale_ns"] = _uint(payload, es, ee)
            elif eid == DURATION:
                out["duration_ticks"] = _float(payload, es, ee)
    scale = out["timestamp_scale_ns"]
    if "duration_ticks" in out:
        out["duration_s"] = out.pop("duration_ticks") * scale / 1e9

    for ts_, te_ in _find(payload, [TRACKS, TRACK_ENTRY], seg_s, seg_e):
        trk: dict = {}
        for eid, es, ee in walk_elements(payload, ts_, te_):
            if eid == TRACK_NUMBER:
                trk["track_number"] = _uint(payload, es, ee)
            elif eid == TRACK_TYPE:
                t = _uint(payload, es, ee)
                trk["kind"] = {1: "video", 2: "audio"}.get(t, str(t))
            elif eid == CODEC_ID:
                trk["codec"] = payload[es:ee].decode("latin-1")
            elif eid == VIDEO:
                for vid, vs, ve in walk_elements(payload, es, ee):
                    if vid == PIXEL_WIDTH:
                        trk["width"] = _uint(payload, vs, ve)
                    elif vid == PIXEL_HEIGHT:
                        trk["height"] = _uint(payload, vs, ve)
            elif eid == AUDIO:
                for aid, as_, ae in walk_elements(payload, es, ee):
                    if aid == SAMPLING_FREQUENCY:
                        trk["sample_rate"] = _float(payload, as_, ae)
                    elif aid == CHANNELS:
                        trk["channels"] = _uint(payload, as_, ae)
        out["tracks"].append(trk)
    if not out["tracks"]:
        raise NotImplementedError("Matroska segment with no Tracks")

    def _block(bs: int, be: int, cluster_ts: int, keyframe: bool | None):
        tnum, p = read_vint(payload, bs, keep_marker=False)
        if p + 3 > be:
            raise ValueError("truncated block header")
        rel = struct.unpack(">h", payload[p:p + 2])[0]
        flags = payload[p + 2]
        kf = bool(flags & 0x80) if keyframe is None else keyframe
        abs_ms = (cluster_ts + rel) * scale / 1e6
        out["blocks"].append((tnum, abs_ms, be - (p + 3), kf))

    for cs, ce in _find(payload, [CLUSTER], seg_s, seg_e):
        cluster_ts = 0
        for eid, es, ee in walk_elements(payload, cs, ce):
            if eid == CLUSTER_TIMESTAMP:
                cluster_ts = _uint(payload, es, ee)
            elif eid == SIMPLE_BLOCK:
                _block(es, ee, cluster_ts, None)
            elif eid == BLOCK_GROUP:
                has_ref, span = False, None
                for gid, gs, ge in walk_elements(payload, es, ee):
                    if gid == REFERENCE_BLOCK:
                        has_ref = True
                    elif gid == BLOCK:
                        span = (gs, ge)
                if span:
                    _block(*span, cluster_ts, not has_ref)
    return out


def webm_container_features(payload: bytes) -> list[float]:
    """16 container-derived floats for a Matroska/WebM video payload —
    the same vector shape and semantics as mp4_container_features
    (canvas dims, block count, duration, fps, keyframe ratio, 8-point
    byte-rate profile, mean block size, Mbit/s), computed from the
    element tree with no codec.  Triage features only, by design."""
    import numpy as np

    info = parse_webm_tracks(payload)
    vid = next(
        (t for t in info["tracks"] if t.get("kind") == "video"), None)
    if vid is None:
        raise NotImplementedError("Matroska without a video track")
    vb = [b for b in info["blocks"]
          if b[0] == vid.get("track_number")]
    n = len(vb)
    dur = info.get("duration_s") or (
        (max(b[1] for b in vb) / 1e3 if vb else 0.0))
    fps = n / dur if dur else 0.0
    sizes = np.array([b[2] for b in vb], dtype=np.float64)
    if n == 0:
        sizes = np.zeros(1)
    seg = np.array_split(sizes, 8)
    e = np.array([s.sum() for s in seg], dtype=np.float64)
    total = e.sum()
    profile = (e / total) if total > 0 else np.zeros(8)
    kf = sum(1 for b in vb if b[3])
    out = [
        vid.get("width", 0.0) / 4096.0,
        vid.get("height", 0.0) / 4096.0,
        n / 65536.0,
        dur / 60.0,
        fps / 120.0,
        (kf / n) if n else 0.0,
        *profile.tolist(),
        float(sizes.mean()) / 65536.0,
        (8.0 * float(sizes.sum()) / dur / 1e6) if dur else 0.0,
    ]
    return [float(np.float32(v)) for v in out]


# --- writer twin --------------------------------------------------------------


def _enc_vint_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _enc_vint_size(size: int, width: int | None = None) -> bytes:
    if width is None:
        width = 1
        while size >= (1 << (7 * width)) - 1:
            width += 1
    return ((1 << (7 * width)) | size).to_bytes(width, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_webm_skeleton(width: int, height: int,
                         block_sizes: list[int], fps: int = 10,
                         keyframe_every: int = 5,
                         doctype: str = "webm",
                         codec: str = "V_VP9",
                         blocks_per_cluster: int = 8) -> bytes:
    """Author a minimal valid Matroska/WebM stream: EBML header with
    DocType, Segment{Info{TimestampScale, Duration}, Tracks{one video
    TrackEntry}, Clusters of SimpleBlocks} with deterministic filler
    frame bytes sized by block_sizes.  The codec payloads are filler —
    parseable by any container parser, decodable by none: fixtures for
    the triage path."""
    n = len(block_sizes)
    frame_ms = 1000 // fps
    header = _el(
        EBML_HEADER,
        _el_uint(0x4286, 1)          # EBMLVersion
        + _el_uint(0x42F7, 1)        # EBMLReadVersion
        + _el_uint(0x42F2, 4)        # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)        # EBMLMaxSizeLength
        + _el(DOCTYPE, doctype.encode())
        + _el_uint(0x4287, 2)        # DocTypeVersion
        + _el_uint(0x4285, 2),       # DocTypeReadVersion
    )
    info = _el(
        INFO,
        _el_uint(TIMESTAMP_SCALE, 1_000_000)
        + _el(DURATION, struct.pack(">d", float(n * frame_ms))),
    )
    tracks = _el(
        TRACKS,
        _el(
            TRACK_ENTRY,
            _el_uint(TRACK_NUMBER, 1)
            + _el_uint(0x73C5, 1)    # TrackUID
            + _el_uint(TRACK_TYPE, 1)
            + _el(CODEC_ID, codec.encode())
            + _el(
                VIDEO,
                _el_uint(PIXEL_WIDTH, width)
                + _el_uint(PIXEL_HEIGHT, height),
            ),
        ),
    )
    clusters = b""
    for c0 in range(0, n, blocks_per_cluster):
        cluster_ts = c0 * frame_ms
        body = _el_uint(CLUSTER_TIMESTAMP, cluster_ts)
        for i in range(c0, min(n, c0 + blocks_per_cluster)):
            rel = i * frame_ms - cluster_ts
            kf = 0x80 if i % keyframe_every == 0 else 0x00
            frame = bytes((i * 31 + j * 7) % 256
                          for j in range(block_sizes[i]))
            blk = (_enc_vint_size(1)          # track number as vint
                   + struct.pack(">h", rel) + bytes([kf]) + frame)
            body += _el(SIMPLE_BLOCK, blk)
        clusters += _el(CLUSTER, body)
    segment = _el(SEGMENT, info + tracks + clusters)
    return header + segment
