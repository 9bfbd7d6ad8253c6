"""Unit tests for the real pure-Python WAV/RIFF codec (parse_wav /
decode_wav).

The m07 oracle differentially checks the generated-payload path end to
end at corpus scale; these pin the codec's parsing contract directly:
chunk walking (extra chunks, odd-size padding), little-endian signed
samples, the NotImplementedError magic contract, and malformed-payload
errors (truncation, non-PCM codecs).
"""

import struct

import pytest

from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
    decode_wav,
    parse_wav,
)


def _wav(samples, rate=8000, channels=1, extra_pre=b"", extra_post=b""):
    data = b"".join(struct.pack("<h", v) for v in samples)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    data_chunk = b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + extra_pre + fmt + extra_post + data_chunk
    return b"RIFF" + struct.pack("<I", len(body) - 4) + body


def test_basic_parse():
    rate, ch, samples = parse_wav(_wav([0, 100, -100, 32767, -32768]))
    assert (rate, ch) == (8000, 1)
    assert samples == [0, 100, -100, 32767, -32768]


def test_decode_features_are_integer_exact():
    vals = [3, -4, 12, 0]
    rate, n, peak, msq = decode_wav(_wav(vals, rate=44100))
    assert (rate, n, peak) == (44100, 4, 12)
    assert msq == (9 + 16 + 144 + 0) / 4


def test_little_endian_signed():
    # -1 is 0xFFFF little-endian; 256 is 0x00 0x01
    payload = _wav([])[:-4] + struct.pack("<I", 4) + b"\xff\xff\x00\x01"
    rate, ch, samples = parse_wav(payload)
    assert samples == [-1, 256]


def test_extra_chunk_and_odd_padding_skipped():
    # a LIST chunk with odd size (padded) between fmt and data
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, ch, samples = parse_wav(_wav([7, -7], extra_post=extra))
    assert samples == [7, -7]


def test_non_riff_magic_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        parse_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(NotImplementedError):
        parse_wav(b"RIFF\x00\x00\x00\x00AVI ")  # RIFF but not WAVE


def test_truncated_chunk_raises():
    good = _wav([1, 2, 3])
    with pytest.raises(ValueError):
        parse_wav(good[:-2])


def test_non_pcm_codec_raises():
    bad_fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32
    )  # IEEE float, 32-bit
    data_chunk = b"data" + struct.pack("<I", 0)
    body = b"WAVE" + bad_fmt + data_chunk
    payload = b"RIFF" + struct.pack("<I", len(body) - 4) + body
    with pytest.raises(ValueError):
        parse_wav(payload)


def test_missing_data_chunk_raises():
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + fmt
    with pytest.raises(ValueError):
        parse_wav(b"RIFF" + struct.pack("<I", len(body) - 4) + body)


def test_odd_data_size_raises():
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", 3) + b"abc"
    with pytest.raises(ValueError):
        parse_wav(b"RIFF" + struct.pack("<I", len(body) - 4) + body)


def test_empty_clip():
    rate, n, peak, msq = decode_wav(_wav([]))
    assert (rate, n, peak, msq) == (8000, 0, 0, 0.0)


def test_generator_roundtrip_matches_oracle_formula():
    """with_wav_payload's serialization parses back to the exact md5
    sample stream the m07 oracle derives (codec-level mirror of the
    corpus-scale hash check)."""
    import hashlib

    did = 37
    n = 8 + did % 25
    rate = 8000 + (did % 4) * 1000
    vals = [
        int(hashlib.md5(f"{did}:{k}".encode()).hexdigest()[:4], 16) - 32768
        for k in range(n)
    ]
    payload = _wav(vals, rate=rate)
    assert len(payload) == 44 + 2 * n
    r, nn, peak, msq = decode_wav(payload)
    assert (r, nn) == (rate, n)
    assert peak == max(abs(v) for v in vals)
    assert msq == sum(v * v for v in vals) / n


def test_property_roundtrip_arbitrary_samples():
    """Any int16 sample list serializes and parses back exactly
    (hypothesis property over the full sample domain)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), max_size=64
        ),
        st.sampled_from([8000, 16000, 22050, 44100]),
    )
    def check(samples, rate):
        rate_out, ch, parsed = parse_wav(_wav(samples, rate=rate))
        assert (rate_out, ch) == (rate, 1)
        assert parsed == samples
        r2, n, peak, msq = decode_wav(_wav(samples, rate=rate))
        assert n == len(samples)
        if samples:
            assert peak == max(abs(v) for v in samples)
            assert msq == sum(v * v for v in samples) / len(samples)

    check()
