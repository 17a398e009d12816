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
    bmp_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_bmp,
    wav_features,
)
from semargl_spark.operators.multimodal import (
    DecodeUnavailable,
    real_decode,
    synth_bmp_payload,
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
