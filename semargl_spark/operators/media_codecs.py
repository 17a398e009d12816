"""Pure-Python media codecs: uncompressed WAV (RIFF/PCM), 24-bit BMP,
and 8-bit PNG (zlib DEFLATE + the full five-filter bank).

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
