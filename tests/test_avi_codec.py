"""Unit tests for the real pure-Python AVI/RIFF container codec
(make_avi / parse_avi / sample_avi_frames).

The m08 oracle differentially checks the generated-payload path end to
end at corpus scale; these pin the codec contract directly: the
generator↔parser roundtrip, the documented fixed header layout
(AVI_MOVI_BASE), odd-size chunk padding, the hdrl/avih field decode,
the declared-vs-actual frame-count cross-check, the
NotImplementedError magic contract, and malformed-payload errors.
"""

import struct

import pytest

from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
    AVI_MOVI_BASE,
    make_avi,
    parse_avi,
)


def test_roundtrip_preserves_frames_and_header():
    frames = [b"abcd", b"hello", b"\x00\xff\x01", b"evenlen!"]
    payload = make_avi(frames, usec_per_frame=40000)
    usec, n, parsed = parse_avi(payload)
    assert usec == 40000
    assert n == len(frames)
    assert [b for _off, b in parsed] == frames


def test_offsets_match_documented_layout():
    """Frame k's absolute body offset = AVI_MOVI_BASE + 8 +
    cumsum(8 + size + pad) over previous frames — the exact formula
    the m08 oracle uses."""
    frames = [b"abc", b"defgh", b"xy"]  # sizes 3 (pad), 5 (pad), 2
    payload = make_avi(frames)
    _, _, parsed = parse_avi(payload)
    want_off = []
    acc = AVI_MOVI_BASE
    for b in frames:
        want_off.append(acc + 8)
        acc += 8 + len(b) + (len(b) & 1)
    assert [off for off, _ in parsed] == want_off
    # and the bytes at those offsets really are the frame bodies
    for (off, body), src in zip(parsed, frames):
        assert payload[off : off + len(src)] == src


def test_empty_video_parses():
    usec, n, parsed = parse_avi(make_avi([]))
    assert (n, parsed) == (0, [])


def test_non_avi_magic_raises_notimplemented():
    with pytest.raises(NotImplementedError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError):
        parse_avi(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError):
        parse_avi(b"")


def test_truncated_chunk_raises_valueerror():
    payload = make_avi([b"abcd", b"efgh"])
    with pytest.raises(ValueError):
        parse_avi(payload[:-3])


def test_frame_count_crosscheck_raises():
    """A dwTotalFrames that disagrees with the movi stream is corrupt."""
    payload = bytearray(make_avi([b"abcd", b"efgh"]))
    # avih body starts at 12 (RIFF) + 8 (LIST hdr) + 4 ('hdrl') + 8
    # (avih hdr) = 32; dwTotalFrames is at body offset 16
    off = 32 + 16
    assert int.from_bytes(payload[off : off + 4], "little") == 2
    payload[off : off + 4] = struct.pack("<I", 7)
    with pytest.raises(ValueError, match="dwTotalFrames"):
        parse_avi(bytes(payload))


def test_missing_avih_raises():
    payload = make_avi([b"abcd"])
    # corrupt the avih chunk id so the header walk never finds it
    bad = payload.replace(b"avih", b"zzzz", 1)
    with pytest.raises(ValueError, match="avih"):
        parse_avi(bad)


def test_sample_avi_frames_contract(spark):
    """Distributed path: generated payloads parse back to one row per
    frame with the md5-stream byte sums; NULL and non-AVI payloads
    emit nothing (the unsupported-payload contract); stride samples
    every k-th frame."""
    import hashlib

    from pyspark.sql import functions as F

    from mxene_coin_cell_data_pipeline_spark.functions.multimodal import (
        sample_avi_frames,
        with_avi_payload,
    )

    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    rows = sample_avi_frames(with_avi_payload(ids)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did in range(12):
        frames = sorted(by_doc[did], key=lambda r: r["frame_idx"])
        assert len(frames) == 2 + did % 4
        for k, r in enumerate(frames):
            m = 4 + (did + k) % 5
            want = [
                int(hashlib.md5(f"{did}:{k}:{j}".encode()).hexdigest()[:2], 16)
                for j in range(m)
            ]
            assert r["frame_bytes"] == m
            assert r["byte_sum"] == sum(want)

    # error contract + stride
    mixed = spark.createDataFrame(
        [(1, None), (2, b"not an avi at all")], "doc_id long, payload binary"
    )
    assert sample_avi_frames(mixed).count() == 0
    strided = sample_avi_frames(with_avi_payload(ids), stride=2)
    assert {r["frame_idx"] % 2 for r in strided.collect()} == {0}
