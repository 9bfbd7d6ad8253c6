"""Unit tests for the real pure-Python PPM codec (decode_ppm).

The m05 oracle differentially checks the P3 path end to end at corpus
scale; these pin the codec's parsing contract directly: P6 raw pixels,
header comments, whitespace variants, the NotImplementedError magic
contract, and malformed-payload errors.
"""

import math

import pytest

from mxene_coin_cell_data_pipeline_spark.functions.multimodal import decode_ppm


def _luma(pixels):
    lsum = sum(299 * r + 587 * g + 114 * b for r, g, b in pixels)
    return lsum / (1000.0 * 255.0 * len(pixels))


def test_p3_basic():
    # 2x1 image: red and white
    payload = b"P3\n2 1\n255\n255 0 0 255 255 255\n"
    w, h, luma = decode_ppm(payload)
    assert (w, h) == (2, 1)
    assert luma == pytest.approx(_luma([(255, 0, 0), (255, 255, 255)]))


def test_p6_basic():
    pixels = [(10, 20, 30), (200, 100, 50)]
    raw = bytes(v for p in pixels for v in p)
    payload = b"P6\n2 1\n255\n" + raw
    w, h, luma = decode_ppm(payload)
    assert (w, h) == (2, 1)
    assert luma == pytest.approx(_luma(pixels))


def test_p3_and_p6_agree_on_same_image():
    pixels = [(i * 11 % 256, i * 7 % 256, i * 3 % 256) for i in range(6)]
    ascii_body = " ".join(str(v) for p in pixels for v in p)
    p3 = f"P3\n3 2\n255\n{ascii_body}\n".encode()
    p6 = b"P6\n3 2\n255\n" + bytes(v for p in pixels for v in p)
    assert decode_ppm(p3) == decode_ppm(p6)


def test_header_comments_and_whitespace():
    payload = b"P3\n# a comment\n  2 # trailing comment\n\t1\n# more\n255\n0 0 0 255 255 255\n"
    w, h, luma = decode_ppm(payload)
    assert (w, h) == (2, 1)
    assert luma == pytest.approx(_luma([(0, 0, 0), (255, 255, 255)]))


def test_maxval_normalization():
    # maxval 100: full-scale white is 100, luma normalizes to 1.0
    payload = b"P3\n1 1\n100\n100 100 100\n"
    _, _, luma = decode_ppm(payload)
    assert luma == pytest.approx(1.0)


def test_non_ppm_magic_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_ppm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_ppm(b"")


def test_truncated_pixels_raise_value_error():
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n2 2\n255\n1 2 3\n")  # 12 samples needed
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")


def test_bad_dimensions_raise_value_error():
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n0 1\n255\n")


def test_generator_roundtrip_matches_oracle_formula():
    """with_ppm_payload's serialization decoded by decode_ppm must
    reproduce the analytic (w, h, luma) the m05 oracle derives."""
    import hashlib

    did = 37
    w, h = 3 + did % 6, 2 + did % 4
    vals = [
        int(hashlib.md5(f"{did}:{k}".encode()).hexdigest()[:2], 16)
        for k in range(3 * w * h)
    ]
    txt = f"P3\n# id {did}\n{w} {h}\n255\n" + " ".join(map(str, vals)) + "\n"
    gw, gh, gl = decode_ppm(txt.encode("ascii"))
    assert (gw, gh) == (w, h)
    lsum = sum(
        (299, 587, 114)[k % 3] * v for k, v in enumerate(vals)
    )
    assert gl == lsum / (1000.0 * 255.0 * w * h)
    assert not math.isnan(gl)
