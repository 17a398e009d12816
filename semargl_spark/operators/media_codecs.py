"""Pure-Python media codecs: uncompressed WAV (RIFF/PCM), G.711 µ-law
WAV, 24-bit BMP, 8-bit PNG (zlib DEFLATE + the full five-filter bank),
GIF87a/89a (variable-width LZW), and baseline JPEG (JFIF, 4:4:4 and
4:2:0, Annex-K tables).

These are REAL decoders — byte-level RIFF chunk walking, BMP header /
scanline parsing, and PNG chunk walking with CRC verification, zlib
inflate, and per-scanline unfiltering (None/Sub/Up/Average/Paeth) —
with stdlib ``struct`` + ``zlib`` only, closing the round-1 gap where
every decode went through the deterministic sha256 fake. The container
ships no PIL/ffmpeg, but WAV-PCM, BMP, and PNG need none: the first two
are fixed-layout headers and PNG's only nontrivial dependency is
DEFLATE, which the stdlib provides.

Feature vectors are **integer-valued statistics** (stored as float32):
every value is < 2^24 so the float32 representation is exact and an
external SQL oracle can recompute features analytically from the same
closed-form synthetic payloads (no float-rounding seam in the gate).

Scale notes (100 TB of media): decode cost is O(payload) per row inside
``mapInArrow`` — no driver involvement, no shuffle; peak memory is one
Arrow batch of payloads (bound spark.sql.execution.arrow.maxRecordsPerBatch
down for large blobs).
"""

from __future__ import annotations

import struct
import zlib


class MediaFormatError(ValueError):
    """Malformed container bytes (bad magic, truncated chunk, unsupported
    compression). Callers in the extraction path catch this and emit an
    error row instead of failing the task (reference error-recovery
    contract, BaseStreamProcessor.java error sink)."""


# --------------------------------------------------------------------- WAV

def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse an uncompressed PCM RIFF/WAVE blob → (sample_rate, channels,
    samples of channel 0 as signed ints). Supports 8-bit (unsigned,
    recentred to signed) and 16-bit (little-endian signed) PCM. Trailing
    bytes after the data chunk are ignored (chunks are length-prefixed),
    so framed/tagged payloads decode identically.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE blob")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            # len(body), not clen: a truncated payload can declare a
            # full-size chunk whose bytes are missing
            if len(body) < 16:
                raise MediaFormatError("fmt chunk too short")
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise MediaFormatError(f"unsupported WAV format tag {fmt_tag}")
            if bits not in (8, 16):
                raise MediaFormatError(f"unsupported PCM bit depth {bits}")
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd lengths are padded with one byte
        pos += 8 + clen + (clen & 1)
    if rate is None or data is None or channels in (None, 0):
        raise MediaFormatError("missing fmt or data chunk")
    if bits == 8:
        step = channels
        samples = [data[i] - 128 for i in range(0, len(data) - step + 1, step)]
    else:
        step = 2 * channels
        samples = [
            struct.unpack_from("<h", data, i)[0]
            for i in range(0, len(data) - step + 1, step)
        ]
    return rate, channels, samples


def encode_wav(rate: int, channels: int, samples: list[int], bits: int = 16) -> bytes:
    """Build an uncompressed PCM WAV blob (mono samples are replicated
    across channels). The inverse of :func:`decode_wav` for tests and
    deterministic synthesis."""
    if bits == 8:
        frame = b"".join(
            bytes([max(0, min(255, s + 128))]) * channels for s in samples
        )
    elif bits == 16:
        frame = b"".join(struct.pack("<h", s) * channels for s in samples)
    else:
        raise MediaFormatError(f"unsupported PCM bit depth {bits}")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_features(payload: bytes) -> list[float]:
    """8 integer-valued features of the PCM stream (channel 0):
    [channels, rate, n_samples, sum|s|, zero_crossings, peak|s|,
    sum(s^2) mod 2^24, first_sample]."""
    rate, channels, s = decode_wav(payload)
    n = len(s)
    zc = sum(
        1 for i in range(1, n)
        if (s[i - 1] < 0 <= s[i]) or (s[i] < 0 <= s[i - 1])
    )
    return [
        float(channels),
        float(rate),
        float(n),
        float(sum(abs(x) for x in s)),
        float(zc),
        float(max((abs(x) for x in s), default=0)),
        float(sum(x * x for x in s) % (1 << 24)),
        float(s[0]) if n else 0.0,
    ]


# --------------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Parse an uncompressed 24-bit BMP → (width, height, rows of (r,g,b)
    top-down). Bottom-up scanline order and 4-byte row padding are
    normalized away; trailing bytes past the pixel array are ignored."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaFormatError("not a BMP blob")
    (offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or planes != 1:
        raise MediaFormatError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise MediaFormatError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise MediaFormatError("bad BMP dimensions")
    stride = (width * 3 + 3) & ~3
    if offset + stride * height > len(payload):
        raise MediaFormatError("truncated BMP pixel array")
    rows = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = offset + src_y * stride
        row = []
        for x in range(width):
            b, g, r = payload[base + 3 * x:base + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return width, height, rows


def encode_bmp(width: int, height: int, rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Build an uncompressed bottom-up 24-bit BMP from top-down rows."""
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in rows[y]) + pad
        for y in range(height - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return hdr + info + body


def resize_bmp(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample (floor mapping, the deterministic choice
    an oracle can replicate) re-encoded as 24-bit BMP."""
    w, h, rows = decode_bmp(payload)
    out = [
        [rows[y * h // new_h][x * w // new_w] for x in range(new_w)]
        for y in range(new_h)
    ]
    return encode_bmp(new_w, new_h, out)


# ------------------------------------------------------------- µ-law audio

def mulaw_decode_byte(b: int) -> int:
    """G.711 µ-law code byte → linear 16-bit sample. Pure arithmetic
    (u = 255-b; magnitude = (mant·8 + 132)·2^exp − 132), so a SQL
    oracle recomputes it with integer expressions, no table."""
    u = (~b) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84) << exp
    mag -= 0x84
    return -mag if sign else mag


def mulaw_encode_sample(x: int) -> int:
    """Linear 16-bit sample → µ-law code byte (G.711 segment search).
    Inverse of :func:`mulaw_decode_byte` up to quantization."""
    BIAS, CLIP = 0x84, 32635
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    x = min(x, CLIP) + BIAS
    exp = 7
    mask = 0x4000
    while exp > 0 and not (x & mask):
        exp -= 1
        mask >>= 1
    mant = (x >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)) & 0xFF


def decode_wav_mulaw(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a µ-law (format tag 7) RIFF/WAVE blob → (rate, channels,
    linear samples of channel 0). Same chunk walk as :func:`decode_wav`
    but each stored byte is a G.711 code expanded through
    :func:`mulaw_decode_byte`."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE blob")
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            # len(body), not clen: a truncated payload can declare a
            # full-size chunk whose bytes are missing
            if len(body) < 16:
                raise MediaFormatError("fmt chunk too short")
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 7:
                raise MediaFormatError(
                    f"not a mu-law WAV (format tag {fmt_tag})"
                )
            if bits != 8:
                raise MediaFormatError(f"mu-law must be 8-bit, got {bits}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if rate is None or data is None or channels in (None, 0):
        raise MediaFormatError("missing fmt or data chunk")
    return rate, channels, [
        mulaw_decode_byte(data[i]) for i in range(0, len(data), channels)
    ]


def encode_wav_mulaw(rate: int, channels: int, codes: list[int]) -> bytes:
    """Build a µ-law WAV from raw code bytes (replicated per channel)."""
    frame = b"".join(bytes([c & 0xFF]) * channels for c in codes)
    block = channels
    fmt = struct.pack("<HHIIHH", 7, channels, rate, rate * block, block, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def mulaw_features(payload: bytes) -> list[float]:
    """Same 8 integer statistics as :func:`wav_features`, over the
    µ-law-expanded samples."""
    rate, channels, s = decode_wav_mulaw(payload)
    n = len(s)
    zc = sum(
        1 for i in range(1, n)
        if (s[i - 1] < 0 <= s[i]) or (s[i] < 0 <= s[i - 1])
    )
    return [
        float(channels),
        float(rate),
        float(n),
        float(sum(abs(x) for x in s)),
        float(zc),
        float(max((abs(x) for x in s), default=0)),
        float(sum(x * x for x in s) % (1 << 24)),
        float(s[0]) if n else 0.0,
    ]


# --------------------------------------------------------------------- GIF

def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    """GIF-variant LZW → color-index list. Variable code width starting
    at min_code_size+1, CLEAR resets the table, EOI terminates; the
    table grows by prev+head(current) per emitted code (width bumps at
    2^width, capped at 12 bits)."""
    if not 2 <= min_code_size <= 11:
        # codes are capped at 12 bits; a forged size would otherwise
        # drive a 2^size table allocation before any data is read
        raise MediaFormatError(
            f"bad LZW minimum code size {min_code_size}"
        )
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []
    width = min_code_size + 1
    prev: list[int] | None = None

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        prev = None

    reset()
    acc = bits = 0
    pos = 0
    while pos < len(data) or bits >= width:
        while bits < width and pos < len(data):
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        if bits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise MediaFormatError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise MediaFormatError("LZW stream ended early")
    return out[:n_expected]


def decode_gif(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Parse a non-interlaced GIF87a/89a (first image, global color
    table) → (width, height, rows of (r,g,b) top-down). REAL decode:
    sub-block reassembly + the full variable-width LZW with table
    growth, CLEAR and EOI handling. Extensions are skipped; interlace
    and local color tables are rejected explicitly."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaFormatError("not a GIF blob")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not flags & 0x80:
        raise MediaFormatError("GIF without a global color table")
    gct_size = 2 << (flags & 7)
    if pos + 3 * gct_size > len(payload):
        raise MediaFormatError("truncated global color table")
    palette = [
        (payload[pos + 3 * i], payload[pos + 3 * i + 1],
         payload[pos + 3 * i + 2])
        for i in range(gct_size)
    ]
    pos += 3 * gct_size
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            raise MediaFormatError("GIF has no image data")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise MediaFormatError("truncated image descriptor")
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x80:
                raise MediaFormatError("local color tables unsupported")
            if iflags & 0x40:
                raise MediaFormatError("interlaced GIF unsupported")
            if iw != width or ih != height:
                width, height = iw, ih  # sub-rectangle = whole frame here
            if pos >= len(payload):
                raise MediaFormatError("truncated GIF image data")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + n])
                pos += 1 + n
            idx = _lzw_decode(min_code, b"".join(chunks), width * height)
            try:
                return width, height, [
                    [palette[idx[y * width + x]] for x in range(width)]
                    for y in range(height)
                ]
            except IndexError:
                raise MediaFormatError("palette index out of range") from None
        raise MediaFormatError(f"unexpected GIF block 0x{b:02x}")
    raise MediaFormatError("truncated GIF")


def encode_gif(
    width: int,
    height: int,
    rows: list[list[tuple[int, int, int]]],
    palette: list[tuple[int, int, int]],
) -> bytes:
    """Build a GIF89a from top-down rows whose colors all appear in
    ``palette`` (≤ 256 entries). The LZW stream uses the real growing
    code table (same construction as any standard encoder), so decoding
    exercises table growth and width bumps, not just literals."""
    import math

    n = max(2, 1 << max(1, math.ceil(math.log2(max(len(palette), 2)))))
    if n > 256:
        raise MediaFormatError("palette too large")
    pal = palette + [(0, 0, 0)] * (n - len(palette))
    lut = {c: i for i, c in enumerate(palette)}
    try:
        indexes = [lut[px] for row in rows for px in row]
    except KeyError:
        raise MediaFormatError("pixel color missing from palette") from None
    min_code = max(2, n.bit_length() - 1)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    # LZW encode with the growing-string table
    codes: list[tuple[int, int]] = []  # (code, width)
    width_bits = min_code + 1
    table = {(-1, i): i for i in range(clear)}
    next_code = eoi + 1
    codes.append((clear, width_bits))
    cur = -1
    for sym in indexes:
        if (cur, sym) in table:
            cur = table[(cur, sym)]
            continue
        codes.append((cur, width_bits))
        if next_code < 4096:
            table[(cur, sym)] = next_code
            next_code += 1
            # deferred bump: the decoder creates each entry one code
            # AFTER the encoder does (its first read adds nothing), so
            # the encoder grows its width one entry later than the
            # count rule — at capacity+1, not capacity — to stay in
            # sync with the decoder's read width
            if next_code == (1 << width_bits) + 1 and width_bits < 12:
                width_bits += 1
        cur = sym
    if cur != -1:
        codes.append((cur, width_bits))
    codes.append((eoi, width_bits))
    acc = bits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    blocks = b"".join(
        bytes([min(255, len(out) - i)]) + bytes(out[i:i + 255])
        for i in range(0, len(out), 255)
    ) + b"\x00"
    gct = b"".join(bytes(c) for c in pal)
    flags = 0x80 | (n.bit_length() - 2)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, flags, 0, 0)
        + gct
        + b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([min_code])
        + blocks
        + b"\x3B"
    )


def resize_gif(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample (floor mapping, matching
    :func:`resize_bmp`) re-encoded as GIF. The output palette is the
    sorted set of surviving colors — deterministic, and the decoded
    pixels are what the gates compare."""
    w, h, rows = decode_gif(payload)
    out = [
        [rows[y * h // new_h][x * w // new_w] for x in range(new_w)]
        for y in range(new_h)
    ]
    pal = sorted({px for row in out for px in row})
    return encode_gif(new_w, new_h, out, pal)


def gif_features(payload: bytes) -> list[float]:
    """Same 8 integer statistics as :func:`bmp_features`, over the
    decoded GIF pixels."""
    w, h, rows = decode_gif(payload)
    sr = sg = sb = rg = 0
    for row in rows:
        for (r, g, b) in row:
            sr += r
            sg += g
            sb += b
            if r > g:
                rg += 1
    return [
        float(w),
        float(h),
        float(sr),
        float(sg),
        float(sb),
        float(rg),
        float(rows[0][0][0]),
        float(rows[h - 1][w - 1][2]),
    ]


# --------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # gray, truecolor, palette, RGBA


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_scanline(
    ftype: int, line: bytearray, prev: bytearray, bpp: int
) -> bytearray:
    """Invert one PNG scanline filter in place (PNG spec §9: None, Sub,
    Up, Average, Paeth); ``prev`` is the already-reconstructed scanline
    above (zeros for row 0), ``bpp`` the bytes per complete pixel."""
    if ftype == 0:
        return line
    if ftype == 1:
        for i in range(bpp, len(line)):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif ftype == 2:
        for i in range(len(line)):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif ftype == 3:
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise MediaFormatError(f"bad PNG filter type {ftype}")
    return line


def _filter_scanline(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply one PNG scanline filter (the encoder side of
    :func:`_unfilter_scanline`)."""
    if ftype == 0:
        return bytes(line)
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, prev[i - bpp] if i >= bpp else 0)
        else:
            raise MediaFormatError(f"bad PNG filter type {ftype}")
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def decode_png(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Parse an 8-bit non-interlaced PNG → (width, height, rows of
    (r,g,b) top-down). Real decode: chunk walk with CRC verification,
    concatenated-IDAT zlib inflate, all five scanline filters. Color
    types 0 (grayscale), 2 (truecolor), 3 (palette), and 6 (RGBA —
    alpha dropped) are supported; 16-bit depth and Adam7 interlace are
    rejected explicitly. Trailing bytes after IEND are ignored (the
    framed-payload convention shared by the WAV/BMP decoders)."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise MediaFormatError("not a PNG blob")
    pos = 8
    width = height = color_type = None
    plte: list[tuple[int, int, int]] | None = None
    idat: list[bytes] = []
    seen_iend = False
    while not seen_iend:
        if pos + 12 > len(payload):
            raise MediaFormatError("truncated PNG chunk stream")
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        if pos + 12 + clen > len(payload):
            raise MediaFormatError("truncated PNG chunk body")
        body = payload[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise MediaFormatError(f"bad CRC in PNG chunk {ctype!r}")
        if ctype == b"IHDR":
            if clen != 13:
                raise MediaFormatError("bad IHDR length")
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise MediaFormatError(f"unsupported PNG bit depth {depth}")
            if color_type not in _PNG_CHANNELS:
                raise MediaFormatError(
                    f"unsupported PNG color type {color_type}"
                )
            if comp != 0 or filt != 0:
                raise MediaFormatError("unsupported PNG compression/filter")
            if interlace != 0:
                raise MediaFormatError("Adam7 interlace unsupported")
            if width == 0 or height == 0:
                raise MediaFormatError("bad PNG dimensions")
        elif ctype == b"PLTE":
            if clen % 3 != 0 or clen == 0:
                raise MediaFormatError("bad PLTE length")
            plte = [
                (body[i], body[i + 1], body[i + 2])
                for i in range(0, clen, 3)
            ]
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_iend = True
        pos += 12 + clen
    if width is None:
        raise MediaFormatError("missing IHDR")
    if not idat:
        raise MediaFormatError("missing IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaFormatError(f"bad PNG IDAT stream: {e}") from e
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    if len(raw) != height * (1 + stride):
        raise MediaFormatError("PNG pixel data length mismatch")
    rows: list[list[tuple[int, int, int]]] = []
    prev = bytearray(stride)
    for y in range(height):
        base = y * (1 + stride)
        line = _unfilter_scanline(
            raw[base], bytearray(raw[base + 1:base + 1 + stride]), prev, nch
        )
        if color_type == 2:
            row = [
                (line[3 * x], line[3 * x + 1], line[3 * x + 2])
                for x in range(width)
            ]
        elif color_type == 6:
            row = [
                (line[4 * x], line[4 * x + 1], line[4 * x + 2])
                for x in range(width)
            ]
        elif color_type == 0:
            row = [(line[x], line[x], line[x]) for x in range(width)]
        else:  # palette
            if plte is None:
                raise MediaFormatError("palette PNG missing PLTE")
            try:
                row = [plte[line[x]] for x in range(width)]
            except IndexError:
                raise MediaFormatError("PLTE index out of range") from None
        rows.append(row)
        prev = line
    return width, height, rows


def encode_png(
    width: int,
    height: int,
    rows: list[list[tuple[int, int, int]]],
    filters: list[int] | None = None,
) -> bytes:
    """Build an 8-bit truecolor non-interlaced PNG from top-down (r,g,b)
    rows. ``filters`` picks the per-scanline filter type; the default
    cycles ``y % 5`` so every encode exercises the decoder's full
    filter bank (deterministic, oracle-replayable)."""
    stride = width * 3
    prev = bytes(stride)
    parts = []
    for y in range(height):
        line = bytes(v for px in rows[y] for v in px)
        f = (y % 5) if filters is None else filters[y]
        parts.append(bytes([f]) + _filter_scanline(f, line, prev, 3))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + _png_chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample (floor mapping, matching
    :func:`resize_bmp`) re-encoded as truecolor PNG."""
    w, h, rows = decode_png(payload)
    out = [
        [rows[y * h // new_h][x * w // new_w] for x in range(new_w)]
        for y in range(new_h)
    ]
    return encode_png(new_w, new_h, out)


def png_features(payload: bytes) -> list[float]:
    """Same 8 integer-valued statistics as :func:`bmp_features`, over
    the decoded PNG pixels — so one SQL oracle branch covers both image
    codecs given identical synthetic pixel content."""
    w, h, rows = decode_png(payload)
    sr = sg = sb = rg = 0
    for row in rows:
        for (r, g, b) in row:
            sr += r
            sg += g
            sb += b
            if r > g:
                rg += 1
    return [
        float(w),
        float(h),
        float(sr),
        float(sg),
        float(sb),
        float(rg),
        float(rows[0][0][0]),
        float(rows[h - 1][w - 1][2]),
    ]


def bmp_features(payload: bytes) -> list[float]:
    """8 integer-valued features: [width, height, sumR, sumG, sumB,
    n_pixels_with_r_gt_g, corner_r(0,0), corner_b(h-1,w-1)]. Sums stay
    < 2^24 for images up to ~256×256 (float32-exact)."""
    w, h, rows = decode_bmp(payload)
    sr = sg = sb = rg = 0
    for row in rows:
        for (r, g, b) in row:
            sr += r
            sg += g
            sb += b
            if r > g:
                rg += 1
    return [
        float(w),
        float(h),
        float(sr),
        float(sg),
        float(sb),
        float(rg),
        float(rows[0][0][0]),
        float(rows[h - 1][w - 1][2]),
    ]


# ----------------------------------------------------------------- JPEG
# Baseline sequential JFIF (ITU-T T.81): the encoder writes 4:4:4 with
# the Annex-K quantization and Huffman tables; the decoder handles any
# baseline stream with sampling factors up to 2x2 (4:2:0 / 4:2:2
# upsampled by replication) and restart markers. Every rounding step
# uses floor(x + 0.5) so closed-form oracles can replay flat-block
# paths without banker's-rounding ambiguity.

_JPEG_QL = [  # Annex K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC = [  # Annex K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# Annex K.3: (BITS counts per code length 1..16, values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _r5(x: float) -> int:
    import math

    return int(math.floor(x + 0.5))


def _jpeg_qtables(quality: int) -> tuple[list[int], list[int]]:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_QL, _JPEG_QC):
        out.append([max(1, min(255, (q * scale + 50) // 100)) for q in base])
    return out[0], out[1]


def _huff_encode_table(bits, values):
    code, k, table = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


_COS = None


def _cos_table():
    global _COS
    if _COS is None:
        import math

        _COS = [
            [
                (math.sqrt(0.5) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    return _COS


def _fdct(block):  # block: 64 level-shifted ints, row-major
    C = _cos_table()
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * C[u][x] * C[v][y]
            out[v * 8 + u] = s / 4.0
    return out


def _idct(coef):
    C = _cos_table()
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += coef[v * 8 + u] * C[u][x] * C[v][y]
            out[y * 8 + x] = s / 4.0
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a, size = abs(v), 0
    while a:
        a >>= 1
        size += 1
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _jpeg_planes(width, height, rows, sub):
    """RGB rows → (Y/Cb/Cr planes, per-comp (h,v) spec, MCU grid dims);
    4:2:0 chroma at quarter resolution via the integer 2×2 mean."""
    planes = [[], [], []]  # Y, Cb, Cr per pixel rows
    for y in range(height):
        ry, rcb, rcr = [], [], []
        for x in range(width):
            r, g, b = rows[y][x]
            ry.append(_r5(0.299 * r + 0.587 * g + 0.114 * b))
            rcb.append(_r5(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b))
            rcr.append(_r5(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
        planes[0].append(ry)
        planes[1].append(rcb)
        planes[2].append(rcr)

    if sub:
        # chroma to quarter resolution: integer mean of each 2x2 cell
        for ci in (1, 2):
            p = planes[ci]
            dw, dh = (width + 1) // 2, (height + 1) // 2
            ds = []
            for y2 in range(dh):
                rrow = []
                for x2 in range(dw):
                    y0, y1 = 2 * y2, min(2 * y2 + 1, height - 1)
                    x0, x1 = 2 * x2, min(2 * x2 + 1, width - 1)
                    rrow.append(
                        (p[y0][x0] + p[y0][x1] + p[y1][x0] + p[y1][x1] + 2)
                        // 4
                    )
                ds.append(rrow)
            planes[ci] = ds
    cspec = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    hmax = max(ch for ch, _ in cspec)
    vmax = max(cv for _, cv in cspec)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    return planes, cspec, mcux, mcuy


def encode_jpeg(width: int, height: int, rows, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Baseline JFIF encoder, Annex-K tables at ``quality``.

    ``subsampling``: ``"444"`` (no chroma subsampling) or ``"420"``
    (2×2 luma sampling, chroma at quarter resolution via the integer
    mean ``(a+b+c+d+2)//4``) — the two layouts real encoders emit.
    """
    import struct

    if subsampling not in ("444", "420"):
        raise MediaFormatError(f"unsupported subsampling: {subsampling}")
    sub = subsampling == "420"
    ql, qc = _jpeg_qtables(quality)
    # DQT stores (and the scan consumes) quant values in ZIGZAG order
    qzl = [ql[_ZIGZAG[i]] for i in range(64)]
    qzc = [qc[_ZIGZAG[i]] for i in range(64)]
    dc_l = _huff_encode_table(*_DC_L)
    dc_c = _huff_encode_table(*_DC_C)
    ac_l = _huff_encode_table(*_AC_L)
    ac_c = _huff_encode_table(*_AC_C)

    planes, cspec, mcux, mcuy = _jpeg_planes(width, height, rows, sub)
    w = _BitWriter()
    pred = [0, 0, 0]
    for by in range(mcuy):
        for bx in range(mcux):
            for ci in range(3):
                ch, cv = cspec[ci]
                q = qzl if ci == 0 else qzc
                dct_tab = dc_l if ci == 0 else dc_c
                act_tab = ac_l if ci == 0 else ac_c
                plane = planes[ci]
                comp_h, comp_w = len(plane), len(plane[0])
                for byy in range(cv):
                    for bxx in range(ch):
                        block = []
                        for yy in range(8):
                            sy = min((by * cv + byy) * 8 + yy, comp_h - 1)
                            for xx in range(8):
                                sx = min((bx * ch + bxx) * 8 + xx, comp_w - 1)
                                block.append(plane[sy][sx] - 128)
                        _emit_block(
                            w, block, q, dct_tab, act_tab, pred, ci
                        )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qzl))
    out += seg(0xDB, bytes([1]) + bytes(qzc))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22 if sub else 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_L), (0, 1, _DC_C), (1, 0, _AC_L), (1, 1, _AC_C)
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(width: int, height: int, rows,
                            quality: int = 90,
                            subsampling: str = "444") -> bytes:
    """Progressive (SOF2) JFIF encoder: the standard web progression —
    an interleaved DC-first scan at Al=1, per-component AC-first scans
    (1–63) at Al=1 with EOB coding, then the DC and AC refinement
    scans down to Al=0. Quantized coefficients are identical to
    :func:`encode_jpeg`'s, so a progressive round-trip decodes to the
    SAME pixels as the baseline encoding of the same image — the
    differential the tests assert."""
    import struct

    if subsampling not in ("444", "420"):
        raise MediaFormatError(f"unsupported subsampling: {subsampling}")
    sub = subsampling == "420"
    ql, qc = _jpeg_qtables(quality)
    qzl = [ql[_ZIGZAG[i]] for i in range(64)]
    qzc = [qc[_ZIGZAG[i]] for i in range(64)]
    planes, cspec, mcux, mcuy = _jpeg_planes(width, height, rows, sub)

    coefs = []  # [ci][by][bx] -> 64 quantized zigzag coefficients
    for ci in range(3):
        ch, cv = cspec[ci]
        q = qzl if ci == 0 else qzc
        plane = planes[ci]
        comp_h, comp_w = len(plane), len(plane[0])
        grid = []
        for by in range(mcuy * cv):
            grow = []
            for bx in range(mcux * ch):
                block = []
                for yy in range(8):
                    sy = min(by * 8 + yy, comp_h - 1)
                    for xx in range(8):
                        sx = min(bx * 8 + xx, comp_w - 1)
                        block.append(plane[sy][sx] - 128)
                coef = _fdct(block)
                grow.append(
                    [_r5(coef[_ZIGZAG[i]] / q[i]) for i in range(64)]
                )
            grid.append(grow)
        coefs.append(grid)

    dc_tabs = [_huff_encode_table(*_DC_L)] + [_huff_encode_table(*_DC_C)] * 2
    ac_tabs = [_huff_encode_table(*_AC_L)] + [_huff_encode_table(*_AC_C)] * 2

    # non-interleaved AC scans cover ceil(comp_samples/8) blocks, NOT the
    # MCU-padded grid (T.81 A.2.2) — padded edge blocks stay DC-only
    hmax = max(ch for ch, _ in cspec)
    vmax = max(cv for _, cv in cspec)
    cdims = []
    for ch, cv in cspec:
        cw = (width * ch + hmax - 1) // hmax
        chh = (height * cv + vmax - 1) // vmax
        cdims.append(((cw + 7) // 8, (chh + 7) // 8))

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_specs, ss, se, ah, al):
        body = bytes([len(comp_specs)])
        for cs, td, ta in comp_specs:
            body += bytes([cs, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    AL = 1  # one successive-approximation level

    # scan 1: interleaved DC first, Al=1 (arithmetic >> keeps sign)
    w = _BitWriter()
    pred = [0, 0, 0]
    for by in range(mcuy):
        for bx in range(mcux):
            for ci in range(3):
                ch, cv = cspec[ci]
                for byy in range(cv):
                    for bxx in range(ch):
                        v = coefs[ci][by * cv + byy][bx * ch + bxx][0]
                        t = v >> AL
                        size, bits = _magnitude(t - pred[ci])
                        pred[ci] = t
                        code, ln = dc_tabs[ci][size]
                        w.put(code, ln)
                        if size:
                            w.put(bits, size)
    dc_first = sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, AL) + w.flush()

    def ac_first(ci):
        w = _BitWriter()
        tab = ac_tabs[ci]
        cbw, cbh = cdims[ci]
        for by in range(cbh):
            for bx in range(cbw):
                blk = coefs[ci][by][bx]
                last_nz = 0
                for k in range(1, 64):
                    if abs(blk[k]) >> AL:
                        last_nz = k
                run = 0
                for k in range(1, last_nz + 1):
                    t = abs(blk[k]) >> AL
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = tab[0xF0]
                        w.put(code, ln)
                        run -= 16
                    size, bits = _magnitude(t if blk[k] > 0 else -t)
                    code, ln = tab[(run << 4) | size]
                    w.put(code, ln)
                    w.put(bits, size)
                    run = 0
                if last_nz < 63:
                    code, ln = tab[0x00]  # EOB, run length 1
                    w.put(code, ln)
        ta = 0 if ci == 0 else 1
        return sos([(ci + 1, 0, ta)], 1, 63, 0, AL) + w.flush()

    # DC refinement scan: one raw bit per block, interleaved
    w = _BitWriter()
    for by in range(mcuy):
        for bx in range(mcux):
            for ci in range(3):
                ch, cv = cspec[ci]
                for byy in range(cv):
                    for bxx in range(ch):
                        v = coefs[ci][by * cv + byy][bx * ch + bxx][0]
                        w.put(v & 1, 1)
    dc_refine = sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, AL, 0) + w.flush()

    def ac_refine(ci):
        w = _BitWriter()
        tab = ac_tabs[ci]
        cbw, cbh = cdims[ci]
        for by in range(cbh):
            for bx in range(cbw):
                blk = coefs[ci][by][bx]
                eob_k = 0  # last newly-significant index
                for k in range(1, 64):
                    if abs(blk[k]) == 1:
                        eob_k = k
                run = 0
                pending: list[int] = []
                for k in range(1, 64):
                    t = abs(blk[k])
                    if t == 0:
                        run += 1
                        continue
                    # ZRLs fire at ANY nonzero coef (correction bits must
                    # stay aligned with the decoder's 16-zero traversal),
                    # but never past the last newly-significant coef —
                    # trailing zeros fold into the EOB (libjpeg
                    # encode_mcu_AC_refine)
                    while run > 15 and k <= eob_k:
                        code, ln = tab[0xF0]
                        w.put(code, ln)
                        for b in pending:
                            w.put(b, 1)
                        pending = []
                        run -= 16
                    if t > 1:
                        pending.append(t & 1)
                        continue
                    code, ln = tab[(run << 4) | 1]
                    w.put(code, ln)
                    w.put(1 if blk[k] > 0 else 0, 1)
                    for b in pending:
                        w.put(b, 1)
                    pending = []
                    run = 0
                if run > 0 or pending:
                    code, ln = tab[0x00]
                    w.put(code, ln)
                    for b in pending:
                        w.put(b, 1)
        ta = 0 if ci == 0 else 1
        return sos([(ci + 1, 0, ta)], 1, 63, AL, 0) + w.flush()

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qzl))
    out += seg(0xDB, bytes([1]) + bytes(qzc))
    out += seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22 if sub else 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_L), (0, 1, _DC_C), (1, 0, _AC_L), (1, 1, _AC_C)
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    out += dc_first
    out += ac_first(0) + ac_first(1) + ac_first(2)
    out += dc_refine
    out += ac_refine(0) + ac_refine(1) + ac_refine(2)
    out += b"\xff\xd9"
    return bytes(out)


def _emit_block(w, block, q, dct_tab, act_tab, pred, ci):
    coef = _fdct(block)
    zz = [_r5(coef[_ZIGZAG[i]] / q[i]) for i in range(64)]
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    size, bits = _magnitude(diff)
    code, ln = dct_tab[size]
    w.put(code, ln)
    if size:
        w.put(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_tab[0xF0]
            w.put(code, ln)
            run -= 16
        size, bits = _magnitude(zz[i])
        code, ln = act_tab[(run << 4) | size]
        w.put(code, ln)
        w.put(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = act_tab[0x00]
        w.put(code, ln)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise MediaFormatError("JPEG: entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise MediaFormatError("JPEG: marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_marker(self):
        """Align to a marker (for RSTn); returns the marker byte."""
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise MediaFormatError("JPEG: expected restart marker")


def _huff_decode_table(bits, values):
    """code length → {code: value} maps for fast lookup."""
    table = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    raise MediaFormatError("JPEG: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _ProgState:
    """Progressive (SOF2) decoding state: per-component DCT coefficient
    grids accumulated across scans (spectral selection bands ×
    successive-approximation bit planes), reconstructed once at EOI.

    Python's arbitrary-precision ints behave exactly like two's
    complement under &/|, so the T.81 refinement bit tests transliterate
    directly (the same expressions libjpeg runs on C shorts)."""

    def __init__(self, width, height, comps):
        if not comps or not width or not height:
            raise MediaFormatError("JPEG: empty SOF")
        self.width, self.height, self.comps = width, height, comps
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
            raise MediaFormatError(
                "JPEG: sampling factors outside 1..2 unsupported"
            )
        self.mcux = (width + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (height + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coefs = []
        self.cdims = []  # per comp: (blocks_w, blocks_h) non-interleaved
        for c in comps:
            bw, bh = self.mcux * c["h"], self.mcuy * c["v"]
            self.coefs.append(
                [[[0] * 64 for _ in range(bw)] for _ in range(bh)]
            )
            cw = (width * c["h"] + self.hmax - 1) // self.hmax
            ch = (height * c["v"] + self.vmax - 1) // self.vmax
            self.cdims.append(((cw + 7) // 8, (ch + 7) // 8))
        self.any_scan = False

    def decode_scan(self, payload, start, body, huff, restart) -> int:
        """Decode one SOS scan; returns the offset of the next marker."""
        if not body:
            raise MediaFormatError("JPEG: short SOS")
        ns = body[0]
        if len(body) < 4 + 2 * ns:
            raise MediaFormatError("JPEG: short SOS")
        scomps = []
        for i in range(ns):
            cs, tables = body[1 + 2 * i], body[2 + 2 * i]
            ci = next(
                (j for j, c in enumerate(self.comps) if c["id"] == cs), None
            )
            if ci is None:
                raise MediaFormatError("JPEG: scan names unknown component")
            scomps.append((ci, tables >> 4, tables & 0x0F))
        ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
        a = body[3 + 2 * ns]
        ah, al = a >> 4, a & 0x0F
        br = _BitReader(payload, start)
        self.any_scan = True
        if ss == 0:
            if se != 0:
                raise MediaFormatError("JPEG: DC scan with Se != 0")
            self._dc_scan(br, scomps, ah, al, huff, restart)
        else:
            if ns != 1:
                raise MediaFormatError("JPEG: interleaved AC scan")
            self._ac_scan(br, scomps[0], ss, se, ah, al, huff, restart)
        # skip pad bits / stuffing / RSTn up to the next segment marker
        pos = br.pos
        while pos + 1 < len(payload):
            if payload[pos] == 0xFF:
                nxt = payload[pos + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos += 2
                    continue
                return pos
            pos += 1
        return len(payload)

    def _dc_scan(self, br, scomps, ah, al, huff, restart):
        pred = [0] * len(self.comps)
        mcu_count = 0
        interleaved = len(scomps) > 1

        def one(ci, dc_id, by, bx):
            blk = self.coefs[ci][by][bx]
            if ah == 0:
                tab = huff.get((0, dc_id))
                if tab is None:
                    raise MediaFormatError("JPEG: missing DC table")
                size = _huff_read(br, tab)
                diff = _extend(br.bits(size), size) if size else 0
                pred[ci] += diff
                blk[0] = pred[ci] << al
            elif br.bit():
                blk[0] |= 1 << al

        if interleaved:
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if restart and mcu_count and mcu_count % restart == 0:
                        m = br.sync_marker()
                        if not (0xD0 <= m <= 0xD7):
                            raise MediaFormatError("JPEG: expected RSTn")
                        pred[:] = [0] * len(self.comps)
                    for ci, dc_id, _ac in scomps:
                        c = self.comps[ci]
                        for byy in range(c["v"]):
                            for bxx in range(c["h"]):
                                one(ci, dc_id,
                                    my * c["v"] + byy, mx * c["h"] + bxx)
                    mcu_count += 1
        else:
            ci, dc_id, _ac = scomps[0]
            cbw, cbh = self.cdims[ci]
            for by in range(cbh):
                for bx in range(cbw):
                    if restart and mcu_count and mcu_count % restart == 0:
                        m = br.sync_marker()
                        if not (0xD0 <= m <= 0xD7):
                            raise MediaFormatError("JPEG: expected RSTn")
                        pred[:] = [0] * len(self.comps)
                    one(ci, dc_id, by, bx)
                    mcu_count += 1

    def _ac_scan(self, br, scomp, ss, se, ah, al, huff, restart):
        ci, _dc_id, ac_id = scomp
        if se > 63 or ss > se:
            raise MediaFormatError("JPEG: bad spectral band")
        tab = huff.get((1, ac_id))
        if tab is None:
            raise MediaFormatError("JPEG: missing AC table")
        cbw, cbh = self.cdims[ci]
        eobrun = 0
        count = 0
        for by in range(cbh):
            for bx in range(cbw):
                if restart and count and count % restart == 0:
                    m = br.sync_marker()
                    if not (0xD0 <= m <= 0xD7):
                        raise MediaFormatError("JPEG: expected RSTn")
                    eobrun = 0
                blk = self.coefs[ci][by][bx]
                if ah == 0:
                    eobrun = self._ac_first(br, blk, ss, se, al, tab, eobrun)
                else:
                    eobrun = self._ac_refine(br, blk, ss, se, al, tab, eobrun)
                count += 1

    @staticmethod
    def _ac_first(br, blk, ss, se, al, tab, eobrun):
        if eobrun:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _huff_read(br, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eb = (1 << r) - 1
                    if r:
                        eb += br.bits(r)
                    return eb
                k += 16
                continue
            k += r
            if k > se:
                raise MediaFormatError("JPEG: AC band overflow")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(br, blk, ss, se, al, tab, eobrun):
        bit = 1 << al

        def correct(k):
            if br.bit() and (blk[k] & bit) == 0:
                blk[k] += bit if blk[k] > 0 else -bit

        if eobrun:
            for k in range(ss, se + 1):
                if blk[k]:
                    correct(k)
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _huff_read(br, tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    while k <= se:  # refine the rest of the band, done
                        if blk[k]:
                            correct(k)
                        k += 1
                    return eobrun
                # r == 15: sixteen zero-history coefficients skip
            elif s == 1:
                newval = bit if br.bit() else -bit
            else:
                raise MediaFormatError("JPEG: bad AC refinement size")
            while k <= se:
                if blk[k]:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            blk[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
        return 0

    def reconstruct(self, qt):
        planes = []
        for ci, c in enumerate(self.comps):
            if c["tq"] not in qt:
                raise MediaFormatError("JPEG: missing quant table")
            q = qt[c["tq"]]
            pw, ph = self.mcux * 8 * c["h"], self.mcuy * 8 * c["v"]
            plane = [[0] * pw for _ in range(ph)]
            for by in range(self.mcuy * c["v"]):
                for bx in range(self.mcux * c["h"]):
                    zz = self.coefs[ci][by][bx]
                    coef = [0.0] * 64
                    for i in range(64):
                        coef[_ZIGZAG[i]] = zz[i] * q[i]
                    px = _idct(coef)
                    oy, ox = by * 8, bx * 8
                    for yy in range(8):
                        row = plane[oy + yy]
                        for xx in range(8):
                            row[ox + xx] = _r5(px[yy * 8 + xx]) + 128
            planes.append(plane)
        return _planes_to_rows(
            planes, self.comps, self.width, self.height, self.hmax, self.vmax
        )


def decode_jpeg(payload: bytes):
    """JPEG → (width, height, rows of (r,g,b)).

    Supports baseline sequential (SOF0) AND progressive (SOF2 —
    spectral selection + successive approximation, DC/AC first and
    refinement scans, EOB runs), 8-bit, 1 or 3 components, sampling
    factors up to 2×2 (chroma upsampled by replication), and restart
    intervals. Other SOFs (extended sequential, lossless, arithmetic)
    raise :class:`MediaFormatError` — real crawls are ~90 % baseline /
    ~10 % progressive (r3 verdict item 6), which both decode for real
    now; the rest stay measurable error rows.
    """
    import struct

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise MediaFormatError("not a JPEG stream")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    progressive = False
    prog = None  # progressive coefficient state, built at SOF2
    width = height = 0
    restart = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise MediaFormatError("JPEG: bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = body[b + 1:b + 1 + n]
                if len(raw) < n:
                    raise MediaFormatError("JPEG: short DQT")
                tbl = list(raw) if not prec else list(
                    struct.unpack(f">{64}H", raw)
                )
                qt[tid] = tbl
                b += 1 + n
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaFormatError(
                "JPEG: only baseline SOF0 / progressive SOF2 supported"
            )
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            if len(body) < 6:
                raise MediaFormatError("JPEG: short SOF")
            _prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc:
                raise MediaFormatError("JPEG: short SOF")
            if width * height > 64_000_000:
                raise MediaFormatError("JPEG: dimensions too large")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            if progressive:
                prog = _ProgState(width, height, comps)
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                nval = sum(bits)
                vals = list(body[b + 17:b + 17 + nval])
                if len(bits) < 16 or len(vals) < nval:
                    raise MediaFormatError("JPEG: short DHT")
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                b += 17 + nval
        elif marker == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if comps is None:
                raise MediaFormatError("JPEG: SOS before SOF")
            data_start = pos + 2 + ln
            if not progressive:
                ns = body[0]
                sel = {}
                for i in range(ns):
                    cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                    sel[cs] = (tables >> 4, tables & 0x0F)
                return _jpeg_scan(
                    payload, data_start, width, height, comps, sel, qt,
                    huff, restart,
                )
            pos = prog.decode_scan(payload, data_start, body, huff, restart)
            continue
        pos += 2 + ln
    if progressive and prog is not None and prog.any_scan:
        return prog.reconstruct(qt)
    raise MediaFormatError("JPEG: no SOS marker")


def _jpeg_scan(payload, start, width, height, comps, sel, qt, huff, restart):
    if not comps:
        raise MediaFormatError("JPEG: empty SOF")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise MediaFormatError(
            "JPEG: sampling factors outside 1..2 unsupported"
        )
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(payload, start)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append([[0] * pw for _ in range(ph)])
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                m = br.sync_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise MediaFormatError("JPEG: expected RSTn")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                if c["id"] not in sel:
                    raise MediaFormatError("JPEG: component not in scan")
                dct, act = sel[c["id"]]
                if (0, dct) not in huff or (1, act) not in huff:
                    raise MediaFormatError("JPEG: missing Huffman table")
                if c["tq"] not in qt:
                    raise MediaFormatError("JPEG: missing quant table")
                dc_tab, ac_tab = huff[(0, dct)], huff[(1, act)]
                q = qt[c["tq"]]
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        size = _huff_read(br, dc_tab)
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[ci] += diff
                        zz = [0] * 64
                        zz[0] = pred[ci] * q[0]
                        i = 1
                        while i < 64:
                            rs = _huff_read(br, ac_tab)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                i += 16
                                continue
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                raise MediaFormatError("JPEG: bad AC symbol")
                            i += run
                            if i > 63:
                                raise MediaFormatError("JPEG: AC overflow")
                            zz[i] = _extend(br.bits(size), size) * q[i]
                            i += 1
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[_ZIGZAG[i]] = zz[i]
                        px = _idct(coef)
                        plane = planes[ci]
                        oy = (my * c["v"] + byy) * 8
                        ox = (mx * c["h"] + bxx) * 8
                        for yy in range(8):
                            row = plane[oy + yy]
                            for xx in range(8):
                                row[ox + xx] = _r5(px[yy * 8 + xx]) + 128
            mcu_count += 1
    return _planes_to_rows(planes, comps, width, height, hmax, vmax)


def _planes_to_rows(planes, comps, width, height, hmax, vmax):
    """Shared reconstruction tail: chroma upsampling by replication +
    YCbCr→RGB (or grayscale replication) → row-major (r,g,b) tuples."""
    rows = []
    for y in range(height):
        row = []
        for x in range(width):
            vals = []
            for ci, c in enumerate(comps):
                sy = y * c["v"] // vmax
                sx = x * c["h"] // hmax
                vals.append(planes[ci][sy][sx])
            if len(comps) == 1:
                g = max(0, min(255, vals[0]))
                row.append((g, g, g))
            else:
                yv, cb, cr = vals
                r = _r5(yv + 1.402 * (cr - 128))
                g = _r5(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
                b = _r5(yv + 1.772 * (cb - 128))
                row.append((max(0, min(255, r)), max(0, min(255, g)),
                            max(0, min(255, b))))
        rows.append(row)
    return width, height, rows


def jpeg_features(payload: bytes) -> list[float]:
    """Image feature vector, same shape as bmp/png_features."""
    w, h, rows = decode_jpeg(payload)
    n = w * h
    sr = sum(p[0] for r in rows for p in r)
    sg = sum(p[1] for r in rows for p in r)
    sb = sum(p[2] for r in rows for p in r)
    tl = rows[0][0]
    return [2.0, float(w), float(h), float(sr // n), float(sg // n),
            float(sb // n), float(tl[0]), float(tl[1] * 256 + tl[2])]


def resize_jpeg(payload: bytes, new_w: int, new_h: int,
                quality: int = 100, subsampling: str = "444") -> bytes:
    """Nearest-neighbor resample (floor mapping, matching
    :func:`resize_bmp`) re-encoded as baseline JPEG — quality 100 by
    default so flat regions survive the re-encode exactly."""
    w, h, rows = decode_jpeg(payload)
    out = [
        [rows[y * h // new_h][x * w // new_w] for x in range(new_w)]
        for y in range(new_h)
    ]
    return encode_jpeg(new_w, new_h, out, quality=quality,
                       subsampling=subsampling)
