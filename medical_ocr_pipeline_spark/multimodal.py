"""Multimodal column plumbing: image/audio/video payloads as opaque
binary columns with typed metadata, processed through mapInPandas.

The reference rasterizes PDF pages to PIL images and POSTs them to OCR
services (S2/S3, notebooks/01_extract_blocks.ipynb cell 4:67-73).  Our
engine keeps the same shape Spark-native: a `binary` column + a metadata
struct, decoded/feature-extracted inside Arrow batches.

Decode kernels: REAL pure-python/numpy decoders — PPM P6 / BMP 24-bit,
8-bit RGB(A) PNG (round 3, stdlib zlib), baseline AND progressive
JPEG (jpeg.py — from-scratch Huffman + IDCT codec; SOF2 multi-scan
successive approximation landed round 4), TIFF — the archival
scanned-page format: both byte orders, strip assembly, bilevel/gray/
RGB, compressions none / CCITT MH (2) / CCITT G3 1-D (3) / CCITT G4
(4, ccitt.py — the fax compression medical scan archives actually
ship) / LZW §13 with horizontal predictor (5) / PackBits (32773),
with encode round-trip partners for each — PCM WAV audio (stdlib
`wave`), compressed WAV audio — G.711 mu-law / A-law and IMA ADPCM via
the from-scratch codecs in audio.py (round 4) — and FLAC (flac.py, a
full from-scratch lossless decoder+encoder, round 4) produce genuine
pixel/sample-derived features through
`media_features(real_decode=True)`.  MP4 and Matroska/WebM video and
MPEG audio (mp3.py frame-walk, round 5) get CONTAINER-level triage
features (no pixel/sample decode); JPEG-in-TIFF (compression 7,
including JPEGTables abbreviated streams) decodes through jpeg.py;
the remaining external-codec extension points are the codec payloads
inside video containers (H.264/VP9), MP3 sample decode, and OGG;
`deterministic_fake_decode` remains for plumbing tests that want
payload-seeded reproducible rows.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),  # fixed dim 16
])

FEATURE_DIM = 16


def _decode_ppm(payload: bytes):
    """PPM 'P6' (binary RGB, maxval<=255): header tokens may be separated
    by arbitrary whitespace/comments per the netpbm spec."""
    tokens, i = [], 2  # skip magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    import numpy as np

    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i + 1)
    return w, h, px.reshape(h, w, 3)


def _decode_bmp(payload: bytes):
    """BMP, uncompressed 24-bit BI_RGB, bottom-up rows padded to 4 bytes."""
    if len(payload) < 54:
        raise ValueError("truncated BMP")
    offset, = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression, = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP (got bpp={bpp})")
    import numpy as np

    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BMP stores BGR
    return w, h, (rgb[::-1] if flip else rgb)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_row(ftype: int, line: bytearray, prev: bytes, ch: int):
    """Reconstruct one scanline in place per PNG filter types 0-4
    (RFC 2083 §6); `prev` is the reconstructed previous scanline (zeros
    for the first row), `ch` the bytes per pixel."""
    n = len(line)
    if ftype == 0:
        return
    if ftype == 1:  # Sub
        for i in range(ch, n):
            line[i] = (line[i] + line[i - ch]) & 0xFF
    elif ftype == 2:  # Up
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            a = line[i - ch] if i >= ch else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = c
            line[i] = (line[i] + pred) & 0xFF
    else:
        raise ValueError(f"invalid PNG filter type {ftype}")


def _decode_png(payload: bytes):
    """Pure-stdlib PNG decode (zlib inflate + per-row unfiltering,
    filter types 0-4): 8-bit non-interlaced truecolor (color type 2) and
    truecolor+alpha (type 6).  Alpha is dropped — the pipeline's image
    kernels operate on HxWx3.  Palette/gray/16-bit/interlaced raise
    NotImplementedError (the documented codec extension point);
    malformed streams raise ValueError.  Per-row python loops: sized for
    the thumbnail/feature kernels' Arrow-batched per-row payloads."""
    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6):
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA PNG decode natively (depth={depth}, "
            f"color_type={color}); plug PIL here for palette/gray/16-bit"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    ch = 3 if color == 2 else 4
    stride = w * ch
    if len(raw) < h * (1 + stride):
        raise ValueError("PNG pixel data shorter than IHDR dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        off = y * (1 + stride)
        line = bytearray(raw[off + 1 : off + 1 + stride])
        _png_unfilter_row(raw[off], line, prev, ch)
        out += line
        prev = bytes(line)
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, ch)
    return w, h, px[:, :, :3]


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF LZW decompression (GIF89a spec appendix F): variable-width
    codes packed LSB-first, dictionary rebuilt on CLEAR, width grows at
    2^width up to 12 bits.  Returns exactly n_pixels color indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear: table freezes full
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data shorter than image descriptor")
    return bytes(out[:n_pixels])


def _decode_gif(payload: bytes):
    """Pure-stdlib GIF87a/89a decode (LZW + palette): first image
    frame, global or local color table, interlaced or not.  Animated
    GIFs yield their FIRST frame; transparency indices map through the
    palette like any other pixel (the feature kernels have no alpha).
    Malformed streams raise ValueError."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            w, h = struct.unpack_from("<HH", payload, pos + 5)
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = payload[pos : pos + 3 * n]
                if len(ct) < 3 * n:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            if w == 0 or h == 0:
                raise ValueError("empty GIF frame")
            if pos >= len(payload):
                raise ValueError("GIF truncated before LZW code size")
            min_code = payload[pos]
            if not 2 <= min_code <= 11:
                raise ValueError("invalid GIF LZW minimum code size")
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                if len(chunks[-1]) < ln:
                    raise ValueError("truncated GIF data sub-block")
                pos += 1 + ln
            idx = np.frombuffer(
                _gif_lzw_decode(b"".join(chunks), min_code, w * h),
                dtype=np.uint8,
            )
            if int(idx.max()) * 3 + 3 > len(ct):
                raise ValueError("GIF pixel index beyond color table")
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            px = pal[idx].reshape(h, w, 3)
            if ipacked & 0x40:  # Adam-style 4-pass GIF interlace
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                de = np.empty_like(px)
                de[order] = px
                px = de
            return w, h, px
        elif b == 0x3B:  # trailer before any frame
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


# --- TIFF (the scanned-document format) --------------------------------------
# Baseline TIFF 6.0 decode: both byte orders (II/MM), strip-organized
# bilevel (1-bit) / grayscale (8-bit) / RGB (8,8,8) images, compression
# 1 (none) and 32773 (PackBits).  That covers the classic scanned-page
# shapes short of the CCITT fax codes; G3/G4 and TIFF-LZW raise at the
# documented extension point below.  Reference analogue: the OCR
# pipeline's page rasters (notebooks/02_ocr_verifier.py) — TIFF is the
# archival scan format those pages arrive in.

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4, 7: 1}  # BYTE, SHORT, LONG, UNDEFINED


def _tiff_ifd(payload: bytes, e: str):
    """First IFD as {tag: [values]} (BYTE/SHORT/LONG entries only —
    the baseline tags this decoder reads are all integral)."""
    (off,) = struct.unpack(e + "I", payload[4:8])
    if off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n,) = struct.unpack(e + "H", payload[off:off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        ent = payload[off + 2 + 12 * i:off + 14 + 12 * i]
        if len(ent) < 12:
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        if typ not in _TIFF_TYPE_SIZE or cnt == 0:
            # RATIONAL/ASCII etc. aren't needed for pixels; a zero
            # count would store an empty list whose [0] access later
            # raises IndexError — which is NOT in media_features'
            # per-row catch tuple and would kill the task instead of
            # costing one row
            continue
        size = _TIFF_TYPE_SIZE[typ] * cnt
        raw = ent[8:12] if size <= 4 else None
        if raw is None:
            (voff,) = struct.unpack(e + "I", ent[8:12])
            raw = payload[voff:voff + size]
            if len(raw) < size:
                raise ValueError("truncated TIFF value block")
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
        tags[tag] = list(struct.unpack(e + fmt * cnt, raw[:size]))
    return tags


def _packbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF compression 32773): n<128 -> copy n+1
    literals, n>128 -> repeat next byte 257-n times, n=128 no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("PackBits stream shorter than strip")
    return bytes(out[:expected])


def _tiff_lzw(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: variable-width codes packed MSB-FIRST (the
    opposite bit order of GIF's LZW), table = 256 literals + Clear(256)
    + EOI(257), width starts at 9 and grows with EarlyChange (one code
    early: when the NEXT code to be added would be 2^width - 1), stream
    opens with Clear."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code after clear not "
                                 "a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # EarlyChange: bump when the next code to ADD would need more
        # bits than `width` can hold minus one (TIFF writers' default)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF LZW data shorter than strip")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """The §13 encoder twin (EarlyChange, Clear at 4094, MSB-first)."""
    CLEAR, EOI = 256, 257
    bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    bits.append((CLEAR, width))
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        bits.append((table[w], width))
        if nxt < 4094:
            table[wc] = nxt
            nxt += 1
            # the decoder's table lags ONE entry behind (its first
            # post-clear code adds nothing), so its EarlyChange bump at
            # len == 2^w - 1 lines up with the encoder's at nxt == 2^w
            if nxt == (1 << width) and width < 12:
                width += 1
        else:
            bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([b])
    if w:
        bits.append((table[w], width))
    bits.append((EOI, width))
    acc = 0
    nacc = 0
    out = bytearray()
    for code, cw in bits:
        acc = (acc << cw) | code
        nacc += cw
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _undo_predictor2(raw: bytearray, h: int, row_bytes: int,
                     spp: int) -> None:
    """TIFF Predictor 2 (horizontal differencing, 8-bit samples):
    cumulative sum across each row per sample channel, in place."""
    for y in range(h):
        base = y * row_bytes
        for i in range(spp, row_bytes):
            raw[base + i] = (raw[base + i] + raw[base + i - spp]) & 0xFF


def _decode_tiff(payload: bytes):
    import numpy as np

    e = {b"II": "<", b"MM": ">"}.get(payload[:2])
    magic = struct.unpack((e or "<") + "H", payload[2:4])[0] if e else 0
    if e is None or magic != 42:
        raise ValueError("bad TIFF header")
    t = _tiff_ifd(payload, e)
    try:
        w = t[256][0]
        h = t[257][0]
        offsets = t[273]
        counts = t[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    spp = t.get(277, [1])[0]
    bits = t.get(258, [1] * spp)
    rows_per_strip = t.get(278, [h])[0] or h
    if comp not in (1, 2, 3, 4, 5, 7, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (none/CCITT MH/"
            "CCITT G3 1-D/CCITT G4/LZW/new-style JPEG/PackBits; "
            "old-style JPEG (6) and deflate are the remaining "
            "extension points — plug PIL here)"
        )
    if comp == 7:
        # New-style JPEG-in-TIFF (TechNote 2): every strip is a JPEG
        # stream decoded by the from-scratch jpeg.py codec.  With a
        # JPEGTables tag (347) the strips are ABBREVIATED streams —
        # the shared tables ride the tag as SOI <tables> EOI and are
        # spliced after each strip's SOI before decoding.
        from medical_ocr_pipeline_spark.jpeg import decode_jpeg

        tables = bytes(t.get(347, []))
        body = b""
        if tables:
            if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
                raise ValueError("malformed JPEGTables payload")
            body = tables[2:-2]
        parts = []
        rows_left = h
        for soff, scnt in zip(offsets, counts):
            strip_rows = min(rows_per_strip, rows_left)
            chunk = payload[soff:soff + scnt]
            if len(chunk) < scnt:
                raise ValueError("truncated TIFF strip")
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("JPEG strip missing SOI")
            stream = b"\xff\xd8" + body + chunk[2:] if body else chunk
            sw, sh, arr = decode_jpeg(stream)
            if sw != w or sh < strip_rows:
                raise ValueError(
                    f"JPEG strip {sw}x{sh} disagrees with IFD "
                    f"{w}x{strip_rows}"
                )
            parts.append(arr[:strip_rows])
            rows_left -= strip_rows
        return w, h, np.concatenate(parts, axis=0)[:h]
    if (spp, bits) not in ((1, [1]), (1, [8]), (3, [8, 8, 8])):
        raise NotImplementedError(
            f"TIFF spp={spp} bits={bits} not supported (bilevel, "
            "8-bit gray, 8-bit RGB only)"
        )
    if t.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    if comp in (2, 3, 4):
        # CCITT bilevel (ccitt.py): MH 1-D (2) / G3-with-EOL (3, 1-D
        # only: T4Options bit0 = 2-D raises) / G4 2-D (4).  Fax
        # semantics: bit 1 = black; PhotometricInterpretation 0
        # (WhiteIsZero, the fax default) maps black -> 0, white -> 255.
        from medical_ocr_pipeline_spark.ccitt import (
            decode_g3_1d,
            decode_g4,
            decode_mh,
        )

        if bits != [1]:
            raise ValueError(f"CCITT TIFF must be bilevel, got {bits}")
        if t.get(266, [1])[0] != 1:
            raise NotImplementedError(
                "FillOrder 2 (LSB-first) CCITT not supported"
            )
        if comp == 3 and t.get(292, [0])[0] & 1:
            raise NotImplementedError(
                "2-D G3 (T4Options bit 0) not supported — G4 covers "
                "the 2-D case"
            )
        dec = {2: decode_mh, 3: decode_g3_1d, 4: decode_g4}[comp]
        rows = []
        rows_left = h
        for soff, scnt in zip(offsets, counts):
            strip_rows = min(rows_per_strip, rows_left)
            chunk = payload[soff:soff + scnt]
            if len(chunk) < scnt:
                raise ValueError("truncated TIFF strip")
            # each strip is an independent CCITT stream (reference
            # line resets per strip, per TIFF 6.0 §Section 11)
            rows.append(dec(chunk, w, strip_rows))
            rows_left -= strip_rows
        black = np.concatenate(rows, axis=0)[:h]
        px = (1 - black) * np.uint8(255)  # 1=black -> 0
        if photo == 1:  # BlackIsZero: inverted fax polarity
            px = 255 - px
        return w, h, np.repeat(px[:, :, None], 3, axis=2)
    predictor = t.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not supported (none/horizontal)"
        )
    if predictor == 2 and bits == [1]:
        raise ValueError("predictor 2 requires 8-bit samples")
    row_bytes = (w + 7) // 8 if bits == [1] else w * spp
    raw = bytearray()
    rows_left = h
    for soff, scnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, rows_left)
        expected = strip_rows * row_bytes
        chunk = payload[soff:soff + scnt]
        if len(chunk) < scnt:
            raise ValueError("truncated TIFF strip")
        # truncate uncompressed strips to the row payload too: writers
        # may pad StripByteCounts to a word boundary, and an untrimmed
        # pad byte would shift every subsequent row silently
        if comp == 1:
            strip = chunk[:expected]
        elif comp == 5:
            strip = _tiff_lzw(chunk, expected)
        else:
            strip = _packbits(chunk, expected)
        if predictor == 2:
            s = bytearray(strip)
            _undo_predictor2(s, strip_rows, row_bytes, spp)
            strip = bytes(s)
        raw += strip
        rows_left -= strip_rows
    if len(raw) < h * row_bytes:
        raise ValueError("TIFF pixel data shorter than dimensions")
    if bits == [1]:
        packed = np.frombuffer(
            bytes(raw[: h * row_bytes]), dtype=np.uint8
        ).reshape(h, row_bytes)
        px = np.unpackbits(packed, axis=1)[:, :w] * np.uint8(255)
        if photo == 0:  # WhiteIsZero
            px = 255 - px
        return w, h, np.repeat(px[:, :, None], 3, axis=2)
    arr = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8)
    if spp == 1:
        px = arr.reshape(h, w)
        if photo == 0:
            px = 255 - px
        return w, h, np.repeat(px[:, :, None], 3, axis=2)
    return w, h, arr.reshape(h, w, 3).copy()


def decode_image(payload: bytes):
    """Pure-python image decode: PPM P6, 24-bit BMP, 8-bit RGB/RGBA
    PNG, GIF87a/89a (LZW + palette, first frame), and JPEG — baseline
    and progressive (jpeg.py — stream-embedded Huffman/quant tables,
    4:4:4 / 4:2:0 / grayscale, restart intervals, SOF2 spectral
    selection + successive approximation), and baseline TIFF (both
    byte orders, strips, none/PackBits, bilevel/gray/RGB — the
    scanned-document format).  Returns (width, height, HxWx3 uint8
    array).  Other formats raise NotImplementedError — plug
    PIL/opencv here."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        from medical_ocr_pipeline_spark.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:2] in (b"II", b"MM") and len(payload) >= 4:
        return _decode_tiff(payload)
    raise NotImplementedError(
        "only PPM P6 / 24-bit BMP / 8-bit RGB(A) PNG / GIF / baseline+"
        "progressive JPEG / baseline TIFF decode natively; other "
        "formats need PIL/opencv wired into decode_image()"
    )


def decode_audio(payload: bytes):
    """Pure-python WAV decode: PCM via stdlib `wave`; G.711 mu-law /
    A-law and IMA ADPCM via the from-scratch codecs in audio.py (round
    4 — stdlib wave only speaks PCM, so compressed tags fall through to
    the manual RIFF walker).  Returns (sample_rate, n_channels, int16
    sample array, n_frames).  MP3/OGG/FLAC remain the external-codec
    extension point."""
    import numpy as np

    if payload[:4] == b"fLaC":
        from medical_ocr_pipeline_spark.flac import decode_flac

        return decode_flac(payload)
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            sr = wf.getframerate()
            ch = wf.getnchannels()
            width = wf.getsampwidth()
            n = wf.getnframes()
            raw = wf.readframes(n)
    except wave.Error as e:
        if payload[:4] == b"RIFF":
            from medical_ocr_pipeline_spark.audio import (
                decode_wav_compressed,
            )

            return decode_wav_compressed(payload)
        raise NotImplementedError(
            f"only WAV and FLAC containers decode natively ({e}); plug "
            "soundfile/librosa into decode_audio() for other formats"
        ) from e
    except (EOFError, struct.error) as e:
        # stdlib wave raises EOFError on a truncated header (e.g. bare
        # b'RIFF') and struct.error on short chunk fields — malformed
        # payloads, not unsupported formats, so surface them as
        # ValueError so per-row failure tolerance in media_features()
        # catches them (ADVICE r02 #1: a single corrupt audio payload
        # must never fail the Spark task)
        raise ValueError(f"malformed/truncated WAV payload: {e!r}") from e
    if width != 2:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    return sr, ch, np.frombuffer(raw, dtype="<i2"), n


def image_features(payload: bytes) -> list[float]:
    """16 pixel-derived floats: dims, per-channel means, luminance std,
    8-bin luminance histogram, mean horizontal/vertical gradient."""
    import numpy as np

    w, h, px = decode_image(payload)
    px = px.astype(np.float64)
    lum = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    hist = hist / lum.size
    gx = float(np.abs(np.diff(lum, axis=1)).mean()) if w > 1 else 0.0
    gy = float(np.abs(np.diff(lum, axis=0)).mean()) if h > 1 else 0.0
    out = [
        w / 4096.0,
        h / 4096.0,
        float(px[:, :, 0].mean()) / 255.0,
        float(px[:, :, 1].mean()) / 255.0,
        float(px[:, :, 2].mean()) / 255.0,
        float(lum.std()) / 255.0,
        *hist.tolist(),
        gx / 255.0,
        gy / 255.0,
    ]
    return [float(np.float32(v)) for v in out]


def audio_features(payload: bytes) -> list[float]:
    """16 sample-derived floats: duration, rate, channels, rms, peak,
    zero-crossing rate, 8-bin energy-over-time profile, DC offset,
    mean absolute amplitude."""
    import numpy as np

    sr, ch, samples, n_frames = decode_audio(payload)
    x = samples.astype(np.float64) / 32768.0
    if x.size == 0:
        x = np.zeros(1)
    rms = float(np.sqrt((x * x).mean()))
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if x.size > 1 else 0.0
    seg = np.array_split(x * x, 8)
    energy = np.array([s.mean() if s.size else 0.0 for s in seg])
    total = energy.sum()
    profile = (energy / total) if total > 0 else np.zeros(8)
    out = [
        (n_frames / sr) / 60.0 if sr else 0.0,
        sr / 48000.0,
        ch / 2.0,
        rms,
        float(np.abs(x).max()),
        zcr,
        *profile.tolist(),
        float(x.mean()),
        float(np.abs(x).mean()),
    ]
    return [float(np.float32(v)) for v in out]


def video_features(payload: bytes) -> list[float]:
    """16 frame-derived floats from a native video container (animated
    GIF, decode_gif_frames): canvas dims, frame count, duration, mean
    luminance / luminance spread across frames, an 8-point
    mean-luminance-over-time profile (resampled to fixed length like
    audio_features' energy profile), and mean inter-frame absolute
    difference — the motion statistic a sampling curator filters on."""
    import numpy as np

    w, h, frames = decode_gif_frames(payload, max_frames=64)
    lum = [
        0.299 * f[:, :, 0].astype(np.float64)
        + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        for _d, f in frames
    ]
    means = np.array([x.mean() for x in lum])
    duration_cs = sum(d for d, _f in frames)
    profile = np.interp(
        np.linspace(0, len(means) - 1, 8), np.arange(len(means)), means
    ) / 255.0
    motion = (
        float(np.mean([np.abs(a - b).mean() for a, b in zip(lum, lum[1:])]))
        if len(lum) > 1 else 0.0
    )
    out = [
        w / 4096.0,
        h / 4096.0,
        len(frames) / 256.0,
        duration_cs / 6000.0,  # minutes
        float(means.mean()) / 255.0,
        float(np.mean([x.std() for x in lum])) / 255.0,
        *profile.tolist(),
        motion / 255.0,
        float(means.std()) / 255.0,
    ]
    return [float(np.float32(v)) for v in out]


def real_decode_features(kind: str, payload: bytes) -> list[float]:
    """Per-kind dispatch for media_features(real_decode=True).  Video
    decodes natively when the container is an animated GIF; MP4/ISO-BMFF
    and Matroska/WebM yield CONTAINER-derived triage features (mp4.py /
    webm.py parse the real box/element trees — duration/fps/bitrate/
    keyframe shape — no pixel decode); the codec payloads inside
    mdat/SimpleBlocks remain the documented external-codec extension
    point."""
    if kind == "image":
        return image_features(payload)
    if kind == "audio" and payload[:4] == b"OggS":
        # Ogg Vorbis/Opus: page-walk CONTAINER triage (ogg.py, CRC
        # verified); packet-level audio decode stays the documented
        # external-codec extension point
        from medical_ocr_pipeline_spark.ogg import ogg_container_features

        return ogg_container_features(payload)
    if kind == "audio" and (
        payload[:3] == b"ID3"
        or (len(payload) > 1 and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0)
    ):
        # MPEG audio: frame-walk CONTAINER triage (mp3.py) — duration/
        # bitrate/VBR shape with zero DSP; sample decode stays the
        # documented external-codec extension point
        from medical_ocr_pipeline_spark.mp3 import mp3_container_features

        return mp3_container_features(payload)
    if kind == "audio":
        return audio_features(payload)
    if kind == "video" and payload[:6] in (b"GIF87a", b"GIF89a"):
        return video_features(payload)
    if kind == "video" and len(payload) >= 12 and payload[4:8] == b"ftyp":
        from medical_ocr_pipeline_spark.mp4 import mp4_container_features

        return mp4_container_features(payload)
    if kind == "video" and payload[:4] == b"\x1aE\xdf\xa3":
        from medical_ocr_pipeline_spark.webm import webm_container_features

        return webm_container_features(payload)
    raise NotImplementedError(
        f"no native decoder for kind={kind!r}; non-GIF/MP4/WebM video "
        "needs an external codec wired here"
    )


def deterministic_fake_decode(payload: bytes) -> list[float]:
    """Seeded stand-in for the decode+embed step: crc32-chained floats in
    [0, 1).  Deterministic, so golden tests of the plumbing are exact."""
    h = zlib.crc32(payload or b"")
    out = []
    for i in range(FEATURE_DIM):
        h = zlib.crc32(i.to_bytes(4, "little"), h)
        out.append((h % 10_000) / 10_000.0)
    return out


def media_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched.

    At 100 TB the binary column dominates row size: keep
    spark.sql.files.maxPartitionBytes small enough that one task's batch
    of payloads fits executor memory, and never collect this frame.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            kinds = pdf["kind"].tolist()
            if real_decode:
                # per-row failure tolerance (the reference's per-engine
                # timeout discipline): undecodable / NULL payloads get
                # features=None, never a task failure; row count is
                # preserved so n_bytes/checksum still describe the row
                feats = []
                for k, p in zip(kinds, payloads):
                    try:
                        feats.append(real_decode_features(k, p))
                    except (NotImplementedError, ValueError, TypeError,
                            EOFError, struct.error):
                        # EOFError/struct.error are belt-and-braces: the
                        # kernels re-raise malformed-payload errors as
                        # ValueError, but a decoder path that leaks the
                        # raw stdlib error must still cost one row, not
                        # the task
                        feats.append(None)
            else:
                feats = [deterministic_fake_decode(p) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": kinds,
                "n_bytes": [len(p or b"") for p in payloads],
                "checksum": [zlib.crc32(p or b"") for p in payloads],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (the decode itself is the stubbed kernel above).  Pure Catalyst —
    posexplode of a generated sequence, no Python."""
    d = F.col("meta.duration_ms")
    return (
        # zero-duration clips emit NO frames; NULL (unknown) duration
        # emits ONE probe frame at ts 0 — the item stays visible
        media.where((F.col("kind") == "video") & (d.isNull() | (d > 0)))
        .select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(d - 1, F.lit(0)), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_idx", "ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the media id."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = (f"media_{i:04d}".encode() * (8 + i % 5))
        rows.append((
            f"m{i:04d}", kind, payload,
            {"mime": f"{kind}/x-fake", "width": 64 + i, "height": 48 + i,
             "duration_ms": 5000 + 100 * i},
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 2000,
                     overlap_ms: int = 500) -> DataFrame:
    """Audio chunking plan: overlapping fixed-length windows over the
    clip duration — (chunk_idx, start_ms, end_ms) per chunk, stride =
    chunk_ms - overlap_ms.  Pure Catalyst (sequence + posexplode), no
    Python; the decode of each chunk is the stubbed kernel above.  The
    row-amplification factor is duration/stride, fixed and predictable —
    the same bounded-fanout discipline as the banded range join."""
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap_ms must be < chunk_ms")
    stride = chunk_ms - overlap_ms
    d = F.col("meta.duration_ms")
    return (
        # zero-length clips yield NO chunks (sequence(0, greatest(d-1,0))
        # would emit one empty chunk); NULL (unknown) duration yields ONE
        # probe chunk of the nominal chunk_ms
        media.where((F.col("kind") == "audio") & (d.isNull() | (d > 0)))
        .select(
            "media_id",
            d.alias("duration_ms"),
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(d - 1, F.lit(0)), F.lit(0)),
                    F.lit(stride),
                )
            ).alias("chunk_idx", "start_ms"),
        )
        .select(
            "media_id",
            "chunk_idx",
            "start_ms",
            F.least(
                F.col("start_ms") + chunk_ms, F.col("duration_ms")
            ).alias("end_ms"),
        )
    )


def resize_rgb(arr, out_w: int, out_h: int):
    """Nearest-neighbor RGB resize (pure numpy index arithmetic — the
    deterministic kernel; swap in PIL/opencv here for filtered resample).
    arr: HxWx3 uint8 -> out_h x out_w x 3 uint8."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def encode_ppm(arr) -> bytes:
    """HxWx3 uint8 -> PPM P6 bytes (the inverse of _decode_ppm)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(arr) -> bytes:
    """HxWx3 uint8 -> 8-bit truecolor PNG bytes (filter type 0 rows,
    one zlib stream) — the codec-format thumbnail sink paired with
    _decode_png."""
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def encode_tiff(arr, compression: int = 1, predictor: int = 1) -> bytes:
    """HxWx3 uint8 -> little-endian RGB TIFF (single strip, IFD after
    the pixel data) — the round-trip partner of _decode_tiff.
    compression 1 (none) or 5 (LZW §13, optionally with predictor 2
    horizontal differencing, the photographic-scan combination)."""
    if compression not in (1, 5):
        raise ValueError("encode_tiff supports compression 1 or 5")
    if predictor not in (1, 2) or (predictor == 2 and compression != 5):
        raise ValueError("predictor 2 only rides LZW here")
    h, w = arr.shape[:2]
    raw = arr.tobytes()
    if predictor == 2:
        import numpy as np

        a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w * 3).copy()
        a[:, 3:] = (
            a[:, 3:].astype(np.int16) - a[:, :-3].astype(np.int16)
        ).astype(np.uint8)
        raw = a.tobytes()
    px = raw if compression == 1 else _tiff_lzw_encode(raw)
    ifd_off = 8 + len(px)
    n_entries = 8 + (1 if predictor == 2 else 0)
    # entries + the out-of-line BitsPerSample triple after the IFD
    bits_off = ifd_off + 2 + n_entries * 12 + 4
    entries = [
        (256, 4, 1, w),            # ImageWidth
        (257, 4, 1, h),            # ImageLength
        (258, 3, 3, bits_off),     # BitsPerSample -> offset
        (259, 3, 1, compression),  # Compression
        (262, 3, 1, 2),            # Photometric: RGB
        (273, 4, 1, 8),            # StripOffsets: right after header
        (277, 3, 1, 3),            # SamplesPerPixel
        (279, 4, 1, len(px)),      # StripByteCounts
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor: horizontal
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)  # no next IFD
    ifd += struct.pack("<HHH", 8, 8, 8)
    return b"II*\x00" + struct.pack("<I", ifd_off) + px + ifd


def encode_tiff_ccitt(bits, g4: bool = True,
                      mode: str | None = None) -> bytes:
    """(h, w) 0/1 array (1 = black) -> little-endian bilevel CCITT TIFF
    (single strip, WhiteIsZero fax polarity): mode 'g4' (T.6, the
    default), 'mh' (compression 2), or 'g3' (compression 3, 1-D with
    EOLs) — the round-trip partner of the CCITT branch in
    _decode_tiff.  The g4 bool is the backward-compatible spelling of
    g4/mh."""
    from medical_ocr_pipeline_spark.ccitt import (
        encode_g3_1d,
        encode_g4,
        encode_mh,
    )

    mode = mode or ("g4" if g4 else "mh")
    enc, comp = {
        "g4": (encode_g4, 4), "mh": (encode_mh, 2),
        "g3": (encode_g3_1d, 3),
    }[mode]
    h, w = bits.shape[:2]
    px = enc(bits)
    ifd_off = 8 + len(px)
    entries = [
        (256, 4, 1, w),            # ImageWidth
        (257, 4, 1, h),            # ImageLength
        (258, 3, 1, 1),            # BitsPerSample: 1
        (259, 3, 1, comp),         # Compression
        (262, 3, 1, 0),            # Photometric: WhiteIsZero (fax)
        (273, 4, 1, 8),            # StripOffsets
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 4, 1, h),            # RowsPerStrip: single strip
        (279, 4, 1, len(px)),      # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", ifd_off) + px + ifd


def encode_tiff_jpeg(arr, quality: int = 90,
                     rows_per_strip: int | None = None) -> bytes:
    """HxWx3 uint8 -> new-style JPEG-in-TIFF (compression 7): each
    strip is a complete JFIF stream from the from-scratch jpeg.py
    encoder.  The abbreviated-stream (JPEGTables) variant is exercised
    by tests via segment splitting; this builder emits self-contained
    strips, the common writer shape."""
    from medical_ocr_pipeline_spark.jpeg import encode_jpeg

    h, w = arr.shape[:2]
    rps = rows_per_strip or h
    strips = [
        encode_jpeg(arr[y0:y0 + rps], quality=quality)
        for y0 in range(0, h, rps)
    ]
    pixel = b"".join(strips)
    n_strips = len(strips)
    multi = n_strips > 1
    ifd_off = 8 + len(pixel)
    n_entries = 9
    bits_off = ifd_off + 2 + n_entries * 12 + 4
    arr_off = bits_off + 6
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 3, bits_off),
        (259, 3, 1, 7),            # Compression: new-style JPEG
        (262, 3, 1, 6),            # Photometric: YCbCr
        (273, 4, n_strips, arr_off if multi else 8),
        (277, 3, 1, 3),
        (278, 4, 1, rps),
        (279, 4, n_strips,
         arr_off + 4 * n_strips if multi else len(pixel)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    ifd += struct.pack("<HHH", 8, 8, 8)
    if multi:
        offs = []
        pos = 8
        for s in strips:
            offs.append(pos)
            pos += len(s)
        ifd += struct.pack(f"<{n_strips}I", *offs)
        ifd += struct.pack(f"<{n_strips}I", *[len(s) for s in strips])
    return b"II*\x00" + struct.pack("<I", ifd_off) + pixel + ifd


def _gif_palette(flat):
    """distinct-color palette for exact-palette encoding: returns
    (palette array, index array, palette bit depth)."""
    import numpy as np

    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    bits = max(2, (len(pal) - 1).bit_length() if len(pal) > 1 else 1)
    return pal, idx, bits


def _gif_lzw_encode(idx_bytes: bytes, min_code: int) -> bytes:
    """Growing-dictionary LZW encode (the inverse of _gif_lzw_decode):
    LSB-first variable-width bit packing, clear at 12-bit exhaustion."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table: dict[bytes, int] = {
        bytes([i]): i for i in range(1 << min_code)
    }
    next_code = eoi + 1
    emit(clear, width)
    seq = b""
    for px in idx_bytes:
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # sync rule: the decoder mirrors this append one code LATER
        # (its size is always next_code - 1), so it widens after the
        # NEXT emit — the encoder widens when next_code FIRST EXCEEDS
        # 2^width, and clears when the 12-bit space is exhausted
        if next_code == (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        elif next_code == (1 << width) + 1 and width < 12:
            width += 1
        seq = bytes([px])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def _gif_subblocks(data: bytes) -> bytes:
    body = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return bytes(body)


def encode_gif(arr) -> bytes:
    """HxWx3 uint8 -> single-frame GIF89a bytes with a REAL growing-
    dictionary LZW encoder (the inverse of _decode_gif).  Exact-palette
    only: the image must use <= 256 distinct colors (true for the
    committed fixtures and synthetic media); richer images raise
    ValueError — quantization belongs to a real imaging library."""
    import numpy as np

    h, w = arr.shape[:2]
    pal, idx, bits = _gif_palette(arr.reshape(-1, 3))
    n_pal = 1 << bits
    pal_bytes = pal.astype(np.uint8).tobytes() + b"\x00" * (
        3 * (n_pal - len(pal))
    )
    min_code = bits
    body = _gif_subblocks(
        _gif_lzw_encode(idx.astype(np.uint8).tobytes(), min_code)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
        + pal_bytes
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + body
        + b"\x3b"
    )


def encode_gif_animated(frames, delays_cs=None, disposals=None,
                        rects=None, canvas=None) -> bytes:
    """Multi-frame GIF89a (the one video container a pure-stdlib
    pipeline can author): per-frame LOCAL color tables, Graphic Control
    Extension carrying delay + disposal, NETSCAPE2.0 loop block, and
    sub-rectangle frame placement — the full composition surface
    decode_gif_frames has to honor.

    frames: list of HxWx3 uint8 patch arrays (exact-palette).
    delays_cs: per-frame delay in centiseconds (default 10).
    disposals: per-frame disposal method (0/1 leave, 2 restore to
      background, 3 restore to previous).
    rects: per-frame (left, top) placement (default (0, 0)).
    canvas: (width, height); default = frame 0's size."""
    import numpy as np

    n = len(frames)
    if n == 0:
        raise ValueError("animated GIF needs at least one frame")
    delays_cs = list(delays_cs or [10] * n)
    disposals = list(disposals or [1] * n)
    rects = list(rects or [(0, 0)] * n)
    ch, cw = frames[0].shape[:2]
    if canvas is not None:
        cw, ch = canvas
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", cw, ch, 0, 0, 0)  # no global table
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, (arr, delay, disp, (lx, ty)) in enumerate(
            zip(frames, delays_cs, disposals, rects)):
        fh, fw = arr.shape[:2]
        if lx + fw > cw or ty + fh > ch:
            raise ValueError(f"frame {f} exceeds the canvas")
        pal, idx, bits = _gif_palette(np.asarray(arr).reshape(-1, 3))
        n_pal = 1 << bits
        pal_bytes = pal.astype(np.uint8).tobytes() + b"\x00" * (
            3 * (n_pal - len(pal))
        )
        # GCE: disposal in bits 2-4, no transparency
        out += b"\x21\xf9\x04" + bytes([disp << 2]) + struct.pack(
            "<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", lx, ty, fw, fh, 0x80 | (bits - 1))
        out += pal_bytes
        out += bytes([bits])
        out += _gif_subblocks(
            _gif_lzw_encode(idx.astype(np.uint8).tobytes(), bits))
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Animated GIF89a decode with full canvas composition: every frame
    is rendered onto the logical screen honoring its placement
    rectangle, transparency index, and the PREVIOUS frame's disposal
    method (1 leave, 2 restore-to-background, 3 restore-to-previous —
    GIF89a spec 23).  Returns (canvas_w, canvas_h,
    [(delay_cs, HxWx3 uint8 canvas snapshot), ...]).

    This is the engine's native video-container decode path: an
    animated GIF is a real timed frame sequence, so frame sampling and
    video features run end-to-end without an external codec (MP4 and
    Matroska/WebM get container-level triage via mp4.py / webm.py;
    their codec payloads remain the documented extension point)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    cw, ch = struct.unpack_from("<HH", payload, 6)
    if cw == 0 or ch == 0:
        raise ValueError("empty GIF canvas")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        npal = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * npal]
        if len(gct) < 3 * npal:
            raise ValueError("truncated GIF global color table")
        pos += 3 * npal
    canvas = np.zeros((ch, cw, 3), dtype=np.uint8)
    frames: list[tuple[int, "np.ndarray"]] = []
    # pending GCE state for the NEXT image descriptor
    delay_cs = 0
    disposal = 0
    transparent = -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos + 1]
            pos += 2
            blocks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                blocks.append(payload[pos + 1:pos + 1 + ln])
                if len(blocks[-1]) < ln:
                    raise ValueError("truncated GIF data sub-block")
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("GIF extension missing terminator")
            pos += 1
            if label == 0xF9 and blocks and len(blocks[0]) >= 4:
                gce = blocks[0]
                disposal = (gce[0] >> 2) & 0x07
                delay_cs = struct.unpack_from("<H", gce, 1)[0]
                transparent = gce[3] if gce[0] & 0x01 else -1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            lx, ty, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                npal = 2 << (ipacked & 0x07)
                ct = payload[pos:pos + 3 * npal]
                if len(ct) < 3 * npal:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * npal
            if ct is None:
                raise ValueError("GIF frame has no color table")
            if fw == 0 or fh == 0 or lx + fw > cw or ty + fh > ch:
                raise ValueError("GIF frame rect outside the canvas")
            if pos >= len(payload):
                raise ValueError("GIF truncated before LZW code size")
            min_code = payload[pos]
            if not 2 <= min_code <= 11:
                raise ValueError("invalid GIF LZW minimum code size")
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                if len(chunks[-1]) < ln:
                    raise ValueError("truncated GIF data sub-block")
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("GIF image missing block terminator")
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(b"".join(chunks), min_code, fw * fh),
                dtype=np.uint8,
            )
            if int(idx.max()) * 3 + 3 > len(ct):
                raise ValueError("GIF pixel index beyond color table")
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            patch = pal[idx].reshape(fh, fw, 3)
            if ipacked & 0x40:  # 4-pass interlace
                order = (
                    list(range(0, fh, 8)) + list(range(4, fh, 8))
                    + list(range(2, fh, 4)) + list(range(1, fh, 2))
                )
                de = np.empty_like(patch)
                de[order] = patch
                patch = de
            before = canvas.copy() if disposal == 3 else None
            region = canvas[ty:ty + fh, lx:lx + fw]
            if transparent >= 0:
                mask = idx.reshape(fh, fw) != transparent
                region[mask] = patch[mask]
            else:
                region[:] = patch
            frames.append((delay_cs, canvas.copy()))
            if max_frames is not None and len(frames) >= max_frames:
                return cw, ch, frames
            # apply THIS frame's disposal before the next composes
            if disposal == 2:
                canvas[ty:ty + fh, lx:lx + fw] = 0
            elif disposal == 3 and before is not None:
                canvas = before
            delay_cs = 0
            disposal = 0
            transparent = -1
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return cw, ch, frames


THUMB_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("thumbnail", T.BinaryType()),   # PPM P6 re-encode
])


def media_thumbnails(media: DataFrame, out_w: int = 32,
                     out_h: int = 32) -> DataFrame:
    """Decode -> resize -> re-encode thumbnail stage for image rows,
    Arrow-batched.  Real end-to-end for PPM, BMP, 8-bit RGB/RGBA PNG
    (stdlib-zlib decoder) and baseline/progressive JPEG (jpeg.py)
    payloads; rows whose format still needs an external codec (video
    stills / compressed audio) or arrive malformed are dropped per-row
    rather than
    failing the stage (the reference's per-engine timeout /
    failure-tolerance discipline, S4)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            ids, ws, hs, thumbs = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, arr = decode_image(payload)
                except (NotImplementedError, ValueError, TypeError,
                        EOFError, struct.error):
                    # TypeError covers NULL payloads (payload column is
                    # nullable); a bad row is skipped, never fatal
                    continue
                ids.append(media_id)
                ws.append(w)
                hs.append(h)
                thumbs.append(encode_ppm(resize_rgb(arr, out_w, out_h)))
            yield pd.DataFrame({
                "media_id": ids, "width": ws, "height": hs,
                "thumbnail": thumbs,
            })

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=THUMB_SCHEMA)
