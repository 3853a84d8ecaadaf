"""Pure-stdlib WAV codec (kernels/wav.py) + the real audio_features
path it powers (functions/multimodal.py codec='real').

Independent oracle: Python's stdlib ``wave`` module — every PCM depth
round-trips through BOTH codecs with byte/sample equality asserted.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pandas as pd
import pytest

from geocube_spark.kernels import wav as W

RNG = np.random.default_rng(4242)


def _tone(n=2000, freq=440.0, rate=8000, amp=0.5):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("bit_depth", [8, 16, 24, 32])
def test_pcm_roundtrip_matches_stdlib_wave(bit_depth):
    """encode -> (our decode == stdlib wave decode) at every PCM depth,
    and stdlib-written files decode identically through our parser."""
    x = np.stack([_tone(), _tone(freq=997.0)], axis=1)
    blob = W.wav_encode(x, 8000, bit_depth=bit_depth)
    ours, rate = W.wav_decode(blob)
    assert rate == 8000 and ours.shape == (2000, 2)

    # stdlib reads our bytes: header fields and raw frames agree
    r = wave.open(io.BytesIO(blob))
    assert (r.getnchannels(), r.getframerate(), r.getsampwidth()) == (
        2, 8000, bit_depth // 8,
    )
    raw = r.readframes(r.getnframes())

    # stdlib writes the same frames; our parser must decode equally
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setframerate(8000)
    w.setsampwidth(bit_depth // 8)
    w.writeframes(raw)
    w.close()
    theirs, rate2 = W.wav_decode(buf.getvalue())
    assert rate2 == 8000
    assert np.array_equal(ours, theirs)

    # quantization error bounded by one LSB
    assert np.abs(ours - x).max() <= 2.0 ** (1 - bit_depth) + 1e-12


@pytest.mark.parametrize("bit_depth", [32, 64])
def test_float_roundtrip(bit_depth):
    x = _tone(500)
    blob = W.wav_encode(x, 44100, bit_depth=bit_depth, fmt="float")
    info = W.wav_info(blob)
    assert info == {
        "sample_rate": 44100, "channels": 1, "bit_depth": bit_depth,
        "fmt": "float", "n_frames": 500,
        "duration_s": 500 / 44100,
    }
    s, rate = W.wav_decode(blob)
    if bit_depth == 64:
        assert np.array_equal(s[:, 0], x)
    else:
        assert np.array_equal(s[:, 0], x.astype(np.float32))


def test_extensible_format_dispatch():
    """WAVE_FORMAT_EXTENSIBLE wrapping PCM16 resolves through the
    SubFormat GUID; an unknown GUID raises."""
    x = np.stack([_tone(400), _tone(400)], axis=1)
    q = np.clip(np.round(x * 32768), -32768, 32767).astype("<i2")
    guid = struct.pack("<I", 1) + bytes.fromhex(
        "000010008000" + "00aa00389b71"
    )
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 2, 8000, 8000 * 4, 4, 16, 22, 16, 3
    ) + guid
    data = q.tobytes()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    info = W.wav_info(blob)
    assert info["fmt"] == "pcm" and info["bit_depth"] == 16
    s, rate = W.wav_decode(blob)
    assert np.array_equal(s, q.astype(np.float64) / 32768.0)

    bad = blob.replace(
        bytes.fromhex("00aa00389b71"), bytes.fromhex("00aa00389b72")
    )
    with pytest.raises(ValueError, match="SubFormat"):
        W.wav_info(bad)


def test_extra_chunks_and_odd_padding():
    """Real WAVs carry LIST/fact/cue chunks before data; odd-sized
    chunks are word-padded. The walker must skip both correctly."""
    x = _tone(300)
    base = W.wav_encode(x, 8000, bit_depth=16)
    fmt_chunk = base[12:12 + 8 + 16]
    data_chunk = base[12 + 8 + 16:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = W.wav_decode(blob)
    ref, _ = W.wav_decode(base)
    assert np.array_equal(s, ref)


def test_validation_errors():
    with pytest.raises(ValueError, match="RIFF"):
        W.wav_info(b"not audio at all")
    assert not W.is_wav(b"RIFFxxxxAIFF")
    x = _tone(50)
    good = W.wav_encode(x, 8000)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        W.wav_info(good[:20])
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 0x0055)  # MP3-in-WAV tag
    with pytest.raises(ValueError, match="0x0055"):
        W.wav_info(bytes(bad))
    # fmt present, data chunk missing
    nodata = good[:12 + 8 + 16]
    nodata = (
        b"RIFF" + struct.pack("<I", len(nodata) - 8) + nodata[8:]
    )
    with pytest.raises(ValueError, match="no data chunk"):
        W.wav_info(nodata)


def test_audio_features_real_and_stub(spark):
    """codec='real' decodes WAV rows and matches numpy-direct feature
    math; non-WAV rows drop. codec='stub' is deterministic on any
    payload through the same feature code path."""
    from geocube_spark.functions.multimodal import audio_features

    tone = _tone(4000, freq=440.0, rate=8000, amp=0.5)
    silence = np.zeros(1000)
    clip = np.stack([_tone(2000, 200.0, amp=0.9),
                     _tone(2000, 200.0, amp=0.9)], axis=1)
    rows = [
        {"doc_id": 1, "media": bytearray(W.wav_encode(tone, 8000))},
        {"doc_id": 2, "media": bytearray(
            W.wav_encode(silence, 16000, bit_depth=32, fmt="float"))},
        {"doc_id": 3, "media": bytearray(
            W.wav_encode(clip, 44100, bit_depth=24))},
        {"doc_id": 4, "media": bytearray(b"plain text, not audio")},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows), "doc_id long, media binary"
    )
    feats = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert set(feats) == {1, 2, 3}

    f1 = feats[1]
    dec, _ = W.wav_decode(W.wav_encode(tone, 8000))
    assert f1["duration_s"] == pytest.approx(0.5)
    assert f1["rms"] == pytest.approx(
        float(np.sqrt(np.mean(dec[:, 0] ** 2))), abs=1e-12)
    # a 440 Hz tone crosses zero ~2*440 times/sec
    assert f1["zero_cross_rate"] == pytest.approx(2 * 440 / 8000, rel=0.02)
    assert f1["sample_rate"] == 8000 and f1["channels"] == 1

    f2 = feats[2]
    assert f2["rms"] == 0.0 and f2["peak"] == 0.0
    assert f2["zero_cross_rate"] == 0.0
    assert f2["bit_depth"] == 32 and f2["duration_s"] == pytest.approx(
        1000 / 16000)

    f3 = feats[3]
    assert f3["channels"] == 2 and f3["sample_rate"] == 44100
    assert f3["peak"] == pytest.approx(0.9, abs=2 ** -23)

    stub = {r["doc_id"]: r
            for r in audio_features(df, codec="stub").collect()}
    assert set(stub) == {1, 2, 3, 4}
    b = b"plain text, not audio"
    x = (np.frombuffer(b, np.uint8).astype(np.float64) - 128.0) / 128.0
    assert stub[4]["rms"] == pytest.approx(
        float(np.sqrt(np.mean(x * x))), abs=1e-12)
    assert stub[4]["sample_rate"] == 8000 and stub[4]["bit_depth"] == 8

    with pytest.raises(ValueError, match="unknown codec"):
        audio_features(df, codec="mp3")
