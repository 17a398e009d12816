"""Pure-Python media codec tests: WAV (RIFF/PCM) and BMP (24-bit).

These close the round-1 "codec stubbed" caveat: decode is byte-level
real, cross-checked against the stdlib ``wave`` writer/reader, and
property-tested for encode→decode identity.
"""

from __future__ import annotations

import io
import struct
import wave

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from semargl_spark.operators.media_codecs import (
    MediaFormatError,
    _png_chunk,
    bmp_features,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    png_features,
    resize_bmp,
    resize_png,
    wav_features,
)
from semargl_spark.operators.multimodal import (
    DecodeUnavailable,
    real_decode,
    synth_bmp_payload,
    synth_png_payload,
    synth_wav_payload,
)

SAMPLES = [0, 100, -100, 32767, -32768, 7]


def test_wav_roundtrip_and_stdlib_interop():
    blob = encode_wav(44100, 2, SAMPLES)
    assert decode_wav(blob) == (44100, 2, SAMPLES)
    w = wave.open(io.BytesIO(blob))
    assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (44100, 2, 6)

    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(b"".join(struct.pack("<h", x) for x in SAMPLES))
    ww.close()
    assert decode_wav(buf.getvalue()) == (8000, 1, SAMPLES)


def test_wav_8bit_and_trailing_bytes():
    blob = encode_wav(8000, 1, [-128, 0, 127], bits=8)
    assert decode_wav(blob) == (8000, 1, [-128, 0, 127])
    # frame tags appended by extract_features must not change the decode
    assert decode_wav(blob + b"|f0") == (8000, 1, [-128, 0, 127])


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(1, 3),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_property(samples, rate, channels):
    assert decode_wav(encode_wav(rate, channels, samples)) == (
        rate, channels, samples,
    )


def test_wav_rejects_garbage():
    for bad in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE",
                b"not a wav at all" * 4):
        with pytest.raises(MediaFormatError):
            decode_wav(bad)


def test_bmp_roundtrip_with_row_padding():
    rows = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
            [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    blob = encode_bmp(3, 2, rows)
    assert decode_bmp(blob) == (3, 2, rows)
    assert decode_bmp(blob + b"|f0") == (3, 2, rows)


@given(st.integers(1, 9), st.integers(1, 9), st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(w, h, rnd):
    rows = [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
         for _ in range(w)]
        for _ in range(h)
    ]
    assert decode_bmp(encode_bmp(w, h, rows)) == (w, h, rows)


def test_bmp_resize_nearest_neighbor():
    rows = [[(1, 2, 3), (4, 5, 6)], [(10, 11, 12), (13, 14, 15)]]
    blob = encode_bmp(2, 2, rows)
    up = decode_bmp(resize_bmp(blob, 4, 4))
    assert up[0] == 4 and up[1] == 4
    # floor mapping: target (x, y) -> source (x*2//4, y*2//4)
    assert up[2][0][0] == rows[0][0] and up[2][3][3] == rows[1][1]
    down = decode_bmp(resize_bmp(blob, 1, 1))
    assert down == (1, 1, [[(1, 2, 3)]])


def test_bmp_rejects_unsupported():
    with pytest.raises(MediaFormatError):
        decode_bmp(b"")
    # 8bpp header
    body = encode_bmp(1, 1, [[(0, 0, 0)]])
    hacked = body[:28] + struct.pack("<H", 8) + body[30:]
    with pytest.raises(MediaFormatError):
        decode_bmp(hacked)


def test_real_decode_dispatch():
    wavf = real_decode(synth_wav_payload(4), "audio/wav")
    assert wavf[0] == 1.0 and wavf[1] == 8000.0 and wavf[2] == 68.0
    bmpf = real_decode(synth_bmp_payload(3), "image/bmp")
    assert bmpf[0] == 8 + 3 % 5 and bmpf[1] == 8 + 3 % 7
    with pytest.raises(DecodeUnavailable):
        real_decode(b"\x00\x00", "video/mp4")


def test_features_match_brute_force():
    for did in (0, 2, 10, 62):
        n = 64 + did % 64
        s = [((did * 31 + i * 7) % 256) - 128 for i in range(n)]
        zc = sum(
            1 for i in range(1, n)
            if (s[i - 1] < 0 <= s[i]) or (s[i] < 0 <= s[i - 1])
        )
        assert wav_features(synth_wav_payload(did)) == [
            1.0, 8000.0, float(n), float(sum(abs(x) for x in s)), float(zc),
            float(max(abs(x) for x in s)),
            float(sum(x * x for x in s) % (1 << 24)), float(s[0]),
        ]
    for did in (1, 3, 11):
        w, h = 8 + did % 5, 8 + did % 7
        px = [
            ((did + 7 * x + 13 * y) % 256, (3 * did + 11 * x + y) % 256)
            for y in range(h) for x in range(w)
        ]
        f = bmp_features(synth_bmp_payload(did))
        assert f[0] == w and f[1] == h
        assert f[2] == sum(r for r, _ in px)
        assert f[5] == sum(1 for r, g in px if r > g)


def test_real_media_pipeline_on_spark(spark):
    from semargl_spark.operators import multimodal

    media = multimodal.synth_real_media(spark, "/root/testdata/sf0.001")
    feats = multimodal.extract_features(media, use_fake=False)
    rows = feats.limit(50).collect()
    assert rows and all(len(r["feature"]) == 8 for r in rows)
    bmps = media.filter("mime = 'image/bmp'")
    resized = multimodal.resize_media(bmps, 4, 4, use_fake=False)
    r = resized.limit(5).collect()
    assert all((x["width"], x["height"]) == (4, 4) for x in r)
    assert all(decode_bmp(bytes(x["payload"]))[0] == 4 for x in r)
    pngs = media.filter("mime = 'image/png'")
    rp = multimodal.resize_media(pngs, 4, 4, use_fake=False).limit(5).collect()
    assert rp and all(decode_png(bytes(x["payload"]))[:2] == (4, 4) for x in rp)


# --------------------------------------------------------------------- PNG

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _rows(w, h, f=lambda x, y: (x * 7 % 256, y * 13 % 256, (x + y) % 256)):
    return [[f(x, y) for x in range(w)] for y in range(h)]


def test_png_roundtrip_every_filter_type():
    rows = _rows(9, 6)
    for ft in range(5):
        blob = encode_png(9, 6, rows, filters=[ft] * 6)
        assert decode_png(blob) == (9, 6, rows)
    # default cycling filters + trailing frame-tag bytes ignored
    blob = encode_png(9, 6, rows)
    assert decode_png(blob + b"|f0") == (9, 6, rows)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    rows = [
        [
            (
                (seed + 7 * x + 13 * y) % 256,
                (3 * seed + 11 * x + y) % 256,
                (5 * seed + x * y) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    assert decode_png(encode_png(w, h, rows)) == (w, h, rows)


def _manual_png(color_type, depth, width, height, raw_rows, extra=b"",
                interlace=0):
    """Hand-assemble a PNG from raw (unfiltered) scanline bytes."""
    import zlib as _z

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, interlace
    )
    body = b"".join(b"\x00" + r for r in raw_rows)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + _png_chunk(b"IDAT", _z.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def test_png_grayscale_palette_rgba_color_types():
    # grayscale (type 0): value replicated to r=g=b
    g = _manual_png(0, 8, 3, 2, [bytes([10, 20, 30]), bytes([40, 50, 60])])
    assert decode_png(g) == (
        3, 2, [[(10, 10, 10), (20, 20, 20), (30, 30, 30)],
               [(40, 40, 40), (50, 50, 50), (60, 60, 60)]])
    # RGBA (type 6): alpha dropped
    rgba = _manual_png(6, 8, 2, 1, [bytes([1, 2, 3, 255, 4, 5, 6, 0])])
    assert decode_png(rgba) == (2, 1, [[(1, 2, 3), (4, 5, 6)]])
    # palette (type 3)
    plte = _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    pal = _manual_png(3, 8, 2, 2, [bytes([0, 1]), bytes([1, 0])],
                      extra=plte)
    assert decode_png(pal) == (
        2, 2, [[(255, 0, 0), (0, 255, 0)], [(0, 255, 0), (255, 0, 0)]])


def test_png_rejects_malformed():
    rows = _rows(4, 4)
    good = encode_png(4, 4, rows)
    with pytest.raises(MediaFormatError, match="not a PNG"):
        decode_png(b"JUNK" + good[4:])
    # corrupt one IDAT byte -> CRC failure
    i = good.index(b"IDAT") + 10
    bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1:]
    with pytest.raises(MediaFormatError, match="CRC"):
        decode_png(bad)
    with pytest.raises(MediaFormatError, match="bit depth"):
        decode_png(_manual_png(0, 16, 1, 1, [b"\x00\x00"]))
    with pytest.raises(MediaFormatError, match="interlace"):
        decode_png(_manual_png(2, 8, 1, 1, [b"\x00\x00\x00"], interlace=1))
    with pytest.raises(MediaFormatError, match="missing PLTE"):
        decode_png(_manual_png(3, 8, 1, 1, [b"\x00"]))
    with pytest.raises(MediaFormatError, match="truncated"):
        decode_png(good[:len(good) - 8])
    # bad filter byte inside a valid zlib stream
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    bad_filter = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x07\x01\x02\x03"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(MediaFormatError, match="filter type"):
        decode_png(bad_filter)


def test_png_resize_and_features_match_closed_form():
    for did in (2, 5, 14):
        w, h = 8 + did % 5, 8 + did % 7
        f = png_features(synth_png_payload(did))
        px = [
            ((did + 7 * x + 13 * y) % 256, (3 * did + 11 * x + y) % 256,
             (5 * did + x * y) % 256)
            for y in range(h) for x in range(w)
        ]
        assert f[0] == w and f[1] == h
        assert f[2] == sum(r for r, _, _ in px)
        assert f[3] == sum(g for _, g, _ in px)
        assert f[4] == sum(b for _, _, b in px)
        assert f[5] == sum(1 for r, g, _ in px if r > g)
        # png and bmp synthetic payloads decode to identical pixels
        assert decode_png(synth_png_payload(did)) == decode_bmp(
            synth_bmp_payload(did)
        )
    small = decode_png(resize_png(synth_png_payload(5), 4, 4))
    w, h, _ = decode_png(synth_png_payload(5))
    assert (small[0], small[1]) == (4, 4)
    ref = decode_bmp(resize_bmp(synth_bmp_payload(5), 4, 4))
    assert small == ref  # resample parity across the two image codecs


def test_real_decode_dispatch_png():
    assert real_decode(synth_png_payload(8), "image/png") == png_features(
        synth_png_payload(8)
    )
    with pytest.raises(DecodeUnavailable):
        real_decode(b"xx", "video/mp4")


# ------------------------------------------------------------ µ-law + GIF

def test_mulaw_codec_roundtrip_all_codes():
    from semargl_spark.operators.media_codecs import (
        decode_wav_mulaw, encode_wav_mulaw, mulaw_decode_byte,
        mulaw_encode_sample,
    )

    # every byte is a valid code; encode(decode(b)) must re-quantize to
    # the same linear value
    for b in range(256):
        x = mulaw_decode_byte(b)
        assert mulaw_decode_byte(mulaw_encode_sample(x)) == x
    # segment formula spot checks: 0xFF -> 0, 0x7F -> -0
    assert mulaw_decode_byte(0xFF) == 0
    assert mulaw_decode_byte(0x7F) == 0
    codes = [(i * 37 + 11) % 256 for i in range(100)]
    blob = encode_wav_mulaw(8000, 2, codes)
    r, ch, s = decode_wav_mulaw(blob)
    assert (r, ch) == (8000, 2)
    assert s == [mulaw_decode_byte(c) for c in codes]
    assert decode_wav_mulaw(blob + b"|f0")[2] == s
    # a PCM wav must be rejected by the mulaw decoder and vice versa
    with pytest.raises(MediaFormatError, match="format tag"):
        decode_wav_mulaw(encode_wav(8000, 1, [1, 2, 3]))


def test_mulaw_matches_stdlib_audioop_table():
    # cross-check the segment expansion against the classic reference
    # table values (G.711): code 0x00 is the most negative magnitude
    from semargl_spark.operators.media_codecs import mulaw_decode_byte

    assert mulaw_decode_byte(0x00) == -8031 * 4 + 0x84 - 0x84 - (0)  # == -32124
    assert mulaw_decode_byte(0x00) == -32124
    assert mulaw_decode_byte(0x80) == 32124
    assert mulaw_decode_byte(0xFE) == 8


def test_gif_roundtrip_with_table_growth():
    from semargl_spark.operators.media_codecs import decode_gif, encode_gif

    pal = [(i, (7 * i) % 256, (11 * i) % 256) for i in range(256)]
    w, h = 33, 21
    rows = [[pal[(x * 91 + y * 53) % 256] for x in range(w)]
            for y in range(h)]
    blob = encode_gif(w, h, rows, pal)
    assert decode_gif(blob) == (w, h, rows)
    assert decode_gif(blob + b"|f0") == (w, h, rows)
    # small palettes exercise narrow code widths
    pal4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    rows4 = [[pal4[(x + y) % 4] for x in range(7)] for y in range(5)]
    assert decode_gif(encode_gif(7, 5, rows4, pal4)) == (7, 5, rows4)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**31))
def test_gif_roundtrip_property(w, h, seed):
    from semargl_spark.operators.media_codecs import decode_gif, encode_gif

    pal = [((i * 7 + 1) % 256, (i * 3) % 256, (i * 5) % 256)
           for i in range(256)]
    rows = [[pal[(seed + 7 * x + 13 * y) % 256] for x in range(w)]
            for y in range(h)]
    assert decode_gif(encode_gif(w, h, rows, pal)) == (w, h, rows)


def test_gif_rejects_malformed():
    from semargl_spark.operators.media_codecs import decode_gif, encode_gif

    pal = [(1, 2, 3), (4, 5, 6)]
    good = encode_gif(2, 2, [[pal[0], pal[1]], [pal[1], pal[0]]], pal)
    with pytest.raises(MediaFormatError, match="not a GIF"):
        decode_gif(b"JUNK" + good[4:])
    with pytest.raises(MediaFormatError):
        decode_gif(good[:20])
    # truncated LZW data: chop the image sub-blocks
    i = good.index(b"\x2C")
    with pytest.raises(MediaFormatError):
        decode_gif(good[:i + 11] + b"\x00" + good[-1:])


def test_gif_resize_and_real_decode_dispatch():
    from semargl_spark.operators.media_codecs import (
        decode_gif, gif_features, mulaw_features, resize_gif,
    )
    from semargl_spark.operators.multimodal import (
        synth_gif_payload, synth_mulaw_payload,
    )

    for did in (4, 9, 19):
        w, h = 8 + did % 5, 8 + did % 7
        f = gif_features(synth_gif_payload(did))
        idx = [(did + 7 * x + 13 * y) % 256
               for y in range(h) for x in range(w)]
        assert f[0] == w and f[1] == h
        assert f[2] == sum((i * 7 + 1) % 256 for i in idx)
        assert f[3] == sum((i * 3) % 256 for i in idx)
        assert f[4] == sum((i * 5) % 256 for i in idx)
    small = decode_gif(resize_gif(synth_gif_payload(9), 4, 4))
    assert (small[0], small[1]) == (4, 4)
    mf = mulaw_features(synth_mulaw_payload(3))
    assert mf[0] == 1.0 and mf[1] == 8000.0 and mf[2] == 64 + 3 % 64
    assert real_decode(synth_gif_payload(4), "image/gif") == gif_features(
        synth_gif_payload(4)
    )
    assert real_decode(
        synth_mulaw_payload(3), "audio/basic"
    ) == mulaw_features(synth_mulaw_payload(3))


# --------------------------------------------------- malformed-input safety

def test_decoders_raise_mediaformaterror_never_crash():
    """The extraction error contract: a decoder confronted with ANY
    malformed bytes raises MediaFormatError — never IndexError /
    struct.error, and never an unbounded allocation (a forged GIF LZW
    minimum-code-size of 68 previously drove a 2^68-entry table)."""
    import random

    from semargl_spark.operators.media_codecs import (
        decode_gif, decode_wav_mulaw, encode_gif,
    )
    from semargl_spark.operators.multimodal import (
        synth_gif_payload, synth_mulaw_payload,
    )

    # the four regressions found by fuzzing:
    # 1. GIF with a forged LZW min code size (allocation bomb)
    pal = [(0, 0, 0), (1, 1, 1)]
    g = encode_gif(2, 1, [[pal[0], pal[1]]], pal)
    i = g.index(b"\x2C") + 10  # min-code-size byte
    with pytest.raises(MediaFormatError, match="minimum code size"):
        decode_gif(g[:i] + bytes([68]) + g[i + 1:])
    # 2. PNG chunk body extending past the buffer (struct.error before)
    png = encode_png(2, 2, [[(0, 0, 0), (1, 1, 1)]] * 2)
    with pytest.raises(MediaFormatError):
        decode_png(png[:len(png) - 6])
    # 3./4. WAV fmt chunk declaring 16 bytes it doesn't have
    wav = encode_wav(8000, 1, [1, 2, 3])
    with pytest.raises(MediaFormatError):
        decode_wav(wav[:20])
    mu = synth_mulaw_payload(3)
    with pytest.raises(MediaFormatError):
        decode_wav_mulaw(mu[:22])

    # standing mutation fuzz: every decoder either succeeds or raises
    # MediaFormatError on mutated-valid payloads
    from semargl_spark.operators import media_codecs as mc
    from semargl_spark.operators.multimodal import (
        synth_bmp_payload, synth_png_payload, synth_wav_payload,
    )

    cases = [
        (mc.decode_wav, synth_wav_payload(4)),
        (mc.decode_bmp, synth_bmp_payload(3)),
        (mc.decode_png, synth_png_payload(5)),
        (mc.decode_gif, synth_gif_payload(7)),
        (mc.decode_wav_mulaw, synth_mulaw_payload(8)),
    ]
    rng = random.Random(11)
    for trial in range(600):
        dec, payload = cases[trial % 5]
        b = bytearray(payload)
        for _ in range(rng.randrange(1, 4)):
            op = rng.randrange(3)
            if op == 0 and b:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op == 1 and len(b) > 2:
                del b[rng.randrange(len(b)):]
            else:
                b[rng.randrange(len(b) + 1):0] = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(8))
                )
        try:
            dec(bytes(b))
        except MediaFormatError:
            pass


# ---------------------------------------------------------------- JPEG


def test_jpeg_flat_roundtrip_exact_both_layouts():
    from semargl_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    for color in ((200, 100, 50), (0, 0, 0), (255, 255, 255), (13, 250, 7)):
        rows = [[color] * 16 for _ in range(16)]
        for sub in ("444", "420"):
            w, h, out = decode_jpeg(
                encode_jpeg(16, 16, rows, quality=100, subsampling=sub))
            assert (w, h) == (16, 16)
            # quality-100 flat blocks lose nothing beyond the YCbCr
            # round trip, which is deterministic and color-stable
            expect = out[0][0]
            assert all(p == expect for r in out for p in r), (color, sub)
            assert max(abs(a - b) for a, b in zip(expect, color)) <= 1


def test_jpeg_gradient_bounded_error_and_nonmultiple_dims():
    from semargl_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rows = [[(min(255, x * 10), min(255, y * 12), 128) for x in range(24)]
            for y in range(17)]
    for sub in ("444", "420"):
        w, h, out = decode_jpeg(
            encode_jpeg(24, 17, rows, quality=92, subsampling=sub))
        assert (w, h) == (24, 17)
        err = max(abs(a - b) for r1, r2 in zip(rows, out)
                  for p1, p2 in zip(r1, r2) for a, b in zip(p1, p2))
        assert err <= 20, (sub, err)


def test_jpeg_malformed_inputs_raise():
    import pytest

    from semargl_spark.operators.media_codecs import (
        MediaFormatError, decode_jpeg, encode_jpeg)

    rows = [[(1, 2, 3)] * 8 for _ in range(8)]
    good = encode_jpeg(8, 8, rows)
    for bad in (b"", b"nope", b"\xff\xd8\xff\xc2\x00\x04ab",
                good[:40], good[:-20] + b"\x00" * 4):
        with pytest.raises(MediaFormatError):
            decode_jpeg(bad)
    with pytest.raises(MediaFormatError):
        encode_jpeg(8, 8, rows, subsampling="422")


def test_jpeg_huffman_exercises_runs_and_magnitudes():
    """A block with isolated impulses forces ZRL (16-zero runs) and
    multi-bit magnitudes through both Huffman directions."""
    from semargl_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    rows = [[(255, 255, 255) if (x, y) in ((0, 0), (15, 15), (7, 3))
             else (0, 0, 0) for x in range(16)] for y in range(16)]
    w, h, out = decode_jpeg(encode_jpeg(16, 16, rows, quality=85))
    # impulses survive as bright neighborhoods; background stays dark
    assert out[0][0][0] > 140 and out[15][15][0] > 120
    assert out[8][12][0] < 90


def test_jpeg_resize_flat_exact():
    from semargl_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg, resize_jpeg)

    rows = [[(40, 160, 220)] * 16 for _ in range(16)]
    data = encode_jpeg(16, 16, rows, quality=100, subsampling="420")
    w, h, out = decode_jpeg(resize_jpeg(data, 8, 24))
    assert (w, h) == (8, 24)
    base = decode_jpeg(data)[2][0][0]
    # one extra YCbCr round trip, but flat → every pixel identical and
    # within 1 of the single-pass decode
    assert all(p == out[0][0] for r in out for p in r)
    assert max(abs(a - b) for a, b in zip(out[0][0], base)) <= 1


# ------------------------------------------------------ progressive JPEG


def test_progressive_jpeg_decodes_to_baseline_pixels():
    """The SOF2 multi-scan path (DC first/refine, AC spectral bands with
    EOB runs, AC successive-approximation refinement) reconstructs the
    SAME coefficients the baseline stream carries, so decoded pixels are
    bit-identical to the baseline encoding of the same image."""
    import random

    from semargl_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    rng = random.Random(7)
    for (w, h) in ((19, 13), (33, 17), (16, 16)):
        rows = [[(min(255, x * 13 + y), (x * 7 + y * 11) % 256,
                  rng.randrange(256)) for x in range(w)] for y in range(h)]
        for subs in ("444", "420"):
            for q in (90, 40):
                base = encode_jpeg(w, h, rows, quality=q, subsampling=subs)
                prog = encode_jpeg_progressive(
                    w, h, rows, quality=q, subsampling=subs)
                assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
                assert decode_jpeg(prog) == decode_jpeg(base), (w, h, subs, q)


def test_progressive_jpeg_flat_roundtrip_exact():
    from semargl_spark.operators.media_codecs import (
        decode_jpeg, encode_jpeg_progressive)

    for color in ((200, 100, 50), (0, 0, 0), (255, 255, 255)):
        rows = [[color] * 16 for _ in range(16)]
        w, h, out = decode_jpeg(
            encode_jpeg_progressive(16, 16, rows, quality=100))
        assert (w, h) == (16, 16)
        assert all(p == out[0][0] for r in out for p in r)
        assert max(abs(a - b) for a, b in zip(out[0][0], color)) <= 1


def test_jpeg_mutation_fuzz_never_raises_foreign_errors():
    """Mutated baseline AND progressive streams either decode or raise
    MediaFormatError — never KeyError/struct.error/ZeroDivisionError
    (the extract-path never-raise contract)."""
    import random

    from semargl_spark.operators.media_codecs import (
        MediaFormatError, decode_jpeg, encode_jpeg,
        encode_jpeg_progressive)

    rows = [[((x * 31) % 256, (y * 17) % 256, (x * y) % 256)
             for x in range(16)] for y in range(16)]
    seeds = [
        encode_jpeg(16, 16, rows, quality=85),
        encode_jpeg(16, 16, rows, quality=85, subsampling="420"),
        encode_jpeg_progressive(16, 16, rows, quality=85),
        encode_jpeg_progressive(16, 16, rows, quality=85,
                                subsampling="420"),
    ]
    rng = random.Random(23)
    for trial in range(400):
        b = bytearray(seeds[trial % 4])
        for _ in range(rng.randrange(1, 4)):
            op = rng.randrange(3)
            if op == 0 and b:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op == 1 and len(b) > 2:
                del b[rng.randrange(len(b)):]
            else:
                b[rng.randrange(len(b) + 1):0] = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(8))
                )
        try:
            decode_jpeg(bytes(b))
        except MediaFormatError:
            pass
