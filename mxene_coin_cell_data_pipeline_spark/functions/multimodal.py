"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with typed
metadata columns alongside (the lakehouse pattern for multimodal
training data). The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested, and
the engine ships a REAL pure-Python codec for a real container:
``decode_ppm`` parses Netpbm PPM images (P3 plain / P6 raw — magic,
comment lines, dimensions, maxval, pixel samples) and computes Rec.601
mean luminance; it is oracle-checked end to end over generated P3
payloads (m05). Heavier codecs (PIL/torchvision/ffmpeg — not in this
environment) drop in as the ``decoder`` callable of ``decode_images``
unchanged. ``_fake_decoder`` remains only as the codec-free
byte-heuristic used to pin the NULL-payload/error plumbing (m02).
"""

from __future__ import annotations

import sys
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .._serde import register_self

register_self(sys.modules[__name__])

#: output schema of decode_images — fixed contract for downstream ops
DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, mean_luma double"
)


def binary_payload_meta(docs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — JVM-side only."""
    return docs.select(
        "doc_id",
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def with_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter for the test tables: derive a binary payload column from
    text (real deployments read image bytes from object storage)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decoder(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder: pretends the bytes
    are a (w, h) image and 'measures' mean luminance from byte values.
    NOT a real decode — kept to pin the NULL-payload/error plumbing on
    arbitrary bytes; the real in-repo codec is ``decode_ppm``."""
    n = len(payload)
    width = max(1, n % 64)
    height = max(1, (n // 64) % 64)
    mean_luma = (sum(payload[:256]) / max(1, min(n, 256))) / 255.0
    return width, height, mean_luma


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """REAL pure-Python Netpbm PPM decoder (P3 plain / P6 raw).

    A genuine byte-format parse: magic sniff, whitespace/'#'-comment
    tokenization of the header (width, height, maxval), then pixel
    samples — ASCII decimals for P3, raw bytes for P6 — in row-major
    RGB order. Returns ``(width, height, mean_luma)`` where mean_luma
    is the Rec.601 luma ``(299 R + 587 G + 114 B) / 1000`` averaged
    over pixels and normalized by maxval; the accumulation is a pure
    integer sum, so the value is bit-deterministic and mirrored
    exactly by the m05 SQL oracle.

    Raises ``NotImplementedError`` for non-PPM magics (``decode_images``
    maps that to NULL features — the unsupported-payload contract) and
    ``ValueError`` for payloads that claim PPM but are malformed.
    """
    w, h, maxval, vals = parse_ppm(payload)
    n = 3 * w * h
    lsum = 0
    for i in range(0, n, 3):
        lsum += 299 * vals[i] + 587 * vals[i + 1] + 114 * vals[i + 2]
    return w, h, lsum / (1000.0 * maxval * w * h)


def parse_ppm(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a PPM container to ``(width, height, maxval, samples)``.

    The full byte-format parse behind ``decode_ppm`` (same magic sniff,
    header tokenization, comment handling, and error contract), exposed
    so pixel-level operators (``resize_ppm_nn``) share one parser."""
    if len(payload) < 2 or payload[:2] not in (b"P3", b"P6"):
        raise NotImplementedError("not a PPM payload")
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if w <= 0 or h <= 0 or maxval <= 0:
        raise ValueError("invalid PPM dimensions/maxval")
    n = 3 * w * h
    if magic == b"P6":
        pos += 1  # exactly one whitespace byte after maxval
        raw = payload[pos : pos + n]
        if len(raw) < n:
            raise ValueError("truncated P6 pixel data")
        vals = list(raw)
    else:
        toks = payload[pos:].split()
        if len(toks) < n:
            raise ValueError("truncated P3 pixel data")
        vals = [int(t) for t in toks[:n]]
    return w, h, maxval, vals


def resize_ppm_nn(
    payload: bytes, out_w: int, out_h: int
) -> tuple[int, int, int, int, float]:
    """Nearest-neighbor resize of a PPM image + resized mean luma.

    Source pixel for output (r, c) is ``(r*h // out_h, c*w // out_w)``
    — integer floor sampling, the canonical NN downsample, chosen so
    the SQL oracle reproduces the exact same source indices with
    integer division. Returns ``(width, height, out_w, out_h,
    mean_luma_resized)``; the luma accumulation over sampled pixels is
    the same integer Rec.601 sum as ``decode_ppm``. A real PIL
    ``Image.resize(..., NEAREST)`` drops into this slot unchanged."""
    w, h, maxval, vals = parse_ppm(payload)
    lsum = 0
    for r in range(out_h):
        sr = r * h // out_h
        for c in range(out_w):
            sc = c * w // out_w
            k = 3 * (sr * w + sc)
            lsum += 299 * vals[k] + 587 * vals[k + 1] + 114 * vals[k + 2]
    return w, h, out_w, out_h, lsum / (1000.0 * maxval * out_w * out_h)


def with_ppm_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic plain-PPM (P3) payload per row, for the oracle-
    checked decode path: ``w = 3 + id%6``, ``h = 2 + id%4``, maxval
    255, sample k = first byte of ``md5("{id}:{k}")`` — every byte of
    the container is reproducible in SQL (the m05 oracle re-derives
    n_bytes, dimensions, and the integer luma sum from the same md5
    stream without ever materializing the payload). The payload is a
    REAL P3 file: magic, a '#' comment line, dimensions, maxval, ASCII
    samples — decode_ppm genuinely parses it back."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                w = 3 + did % 6
                h = 2 + did % 4
                vals = [
                    int(
                        hashlib.md5(f"{did}:{k}".encode()).hexdigest()[:2], 16
                    )
                    for k in range(3 * w * h)
                ]
                txt = (
                    f"P3\n# id {did}\n{w} {h}\n255\n"
                    + " ".join(map(str, vals))
                    + "\n"
                )
                payloads.append(txt.encode("ascii"))
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def parse_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE container to ``(sample_rate, n_channels,
    samples)`` — REAL pure-Python audio codec #2 (next to ``parse_ppm``).

    A genuine byte-format parse: RIFF magic + WAVE form type, then a
    chunk walk (4-byte id, little-endian uint32 size, odd-size pad
    byte) collecting the ``fmt `` chunk (must be PCM, 16-bit) and the
    ``data`` chunk (little-endian signed int16 samples). Raises
    ``NotImplementedError`` for non-RIFF/WAVE magics (decode maps that
    to NULL features — the unsupported-payload contract) and
    ``ValueError`` for containers that claim WAVE but are malformed or
    use a codec other than 16-bit PCM.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt: tuple[int, int] | None = None  # (sample_rate, n_channels)
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAVE chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or bits != 16:
                raise ValueError("unsupported WAVE codec (need 16-bit PCM)")
            if n_channels < 1:
                raise ValueError("invalid channel count")
            fmt = (sample_rate, n_channels)
        elif cid == b"data":
            if size % 2:
                raise ValueError("odd PCM16 data size")
            data = body
        pos += 8 + size + (size & 1)  # RIFF pads odd-sized chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    samples = [
        int.from_bytes(data[i : i + 2], "little", signed=True)
        for i in range(0, len(data), 2)
    ]
    return fmt[0], fmt[1], samples


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """Decode a WAV payload to ``(sample_rate, n_samples, peak_abs,
    mean_square)``. Peak and the square sum are pure integer
    accumulations (sumsq < 2^53 for any bounded clip, so the final
    ``sumsq / n`` division is the only float op — bit-deterministic and
    mirrored exactly by the m07 SQL oracle)."""
    rate, _channels, samples = parse_wav(payload)
    n = len(samples)
    if n == 0:
        return rate, 0, 0, 0.0
    peak = 0
    sumsq = 0
    for v in samples:
        a = -v if v < 0 else v
        if a > peak:
            peak = a
        sumsq += v * v
    return rate, n, peak, sumsq / n


def with_wav_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM16 WAV payload per row, for the oracle-checked
    audio decode path: ``n = 8 + id%25`` samples, ``rate = 8000 +
    (id%4)*1000``, mono, sample k = ``int16(md5("{id}:{k}")[:4]) -
    32768`` — every byte of the 44-byte canonical header and the
    little-endian sample stream is reproducible in SQL (the m07 oracle
    re-derives byte length, rate, sample count, integer peak and square
    sum from the same md5 stream without materializing the payload).
    The payload is a REAL WAV file: ``parse_wav`` genuinely walks the
    RIFF chunks back out of it."""
    import hashlib
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                n = 8 + did % 25
                rate = 8000 + (did % 4) * 1000
                vals = [
                    int(
                        hashlib.md5(f"{did}:{k}".encode()).hexdigest()[:4], 16
                    )
                    - 32768
                    for k in range(n)
                ]
                data = b"".join(struct.pack("<h", v) for v in vals)
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


#: output schema of decode_audio — fixed contract for downstream ops
AUDIO_SCHEMA = (
    "doc_id long, n_bytes int, sample_rate int, n_samples int, "
    "peak_abs int, mean_square double"
)


def decode_audio(
    docs: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Distributed audio decode via mapInPandas (Arrow-batched): the
    audio sibling of ``decode_images``, running the REAL WAV codec.
    Same error contract: NULL payload → all-NULL row, non-WAV magic →
    n_bytes only (NULL features); malformed WAVE raises. At 100 TB
    this is scan-bound and shuffle-free — scales with payload bytes."""
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    out.append((doc_id, None, None, None, None, None))
                    continue
                raw = bytes(payload)
                try:
                    rate, n, peak, msq = decode_wav(raw)
                except NotImplementedError:
                    out.append((doc_id, len(raw), None, None, None, None))
                    continue
                out.append((doc_id, len(raw), rate, n, peak, msq))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "n_samples",
                    "peak_abs", "mean_square",
                ],
            )

    return docs.select(*cols).mapInPandas(batches, schema=AUDIO_SCHEMA)


#: output schema of sample_frames — one row per sampled frame
FRAME_SCHEMA = "doc_id long, frame_idx int, off long, frame_md5 string"


def sample_frames(
    docs: DataFrame,
    n_frames: int = 4,
    content_col: str = "text",
) -> DataFrame:
    """Uniform frame sampling: split each document's content into
    ``n_frames`` equal-length frames and emit one row per frame with
    its offset and content fingerprint — the video/audio
    frame-extraction shape (one input row → many output rows) run as a
    one-to-many ``mapInPandas`` (Arrow-batched; batch in, longer batch
    out; never per-row Python).

    The "decode" here is deterministic character-range slicing so the
    whole path is oracle-checkable end-to-end (a real ffmpeg/PIL frame
    grabber replaces the slicing, keeping schema, batching, and
    partition behavior). Documents shorter than ``n_frames`` emit
    nothing (frame length 0) — mirroring a codec skipping un-decodable
    payloads.
    """
    import hashlib

    cols = ["doc_id", content_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf[content_col]):
                if content is None:
                    continue
                flen = len(content) // n_frames
                if flen == 0:
                    continue
                for k in range(n_frames):
                    off = k * flen
                    chunk = content[off : off + flen]
                    out.append(
                        (
                            doc_id,
                            k,
                            off,
                            hashlib.md5(chunk.encode("utf-8")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "off", "frame_md5"]
            )

    return docs.select(*cols).mapInPandas(batches, schema=FRAME_SCHEMA)


def decode_images(
    docs: DataFrame,
    payload_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
) -> DataFrame:
    """Distributed decode via mapInPandas (Arrow-batched; one Python
    worker call per batch, never per row). Swap ``decoder`` for a real
    codec; raise NotImplementedError semantics are preserved for
    unsupported payloads by returning NULL features."""
    dec = decoder or _fake_decoder
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    out.append((doc_id, None, None, None, None))
                    continue
                raw = bytes(payload)
                try:
                    w, h, luma = dec(raw)
                except NotImplementedError:
                    out.append((doc_id, len(raw), None, None, None))
                    continue
                out.append((doc_id, len(raw), w, h, luma))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "width", "height", "mean_luma"]
            )

    return docs.select(*cols).mapInPandas(batches, schema=DECODE_SCHEMA)


#: output schema of byte_features — one row per payload
BYTE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, entropy double, magic_hex string"
)


def byte_features(
    docs: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Byte-level feature extraction over opaque binary payloads: size,
    mean byte value, Shannon entropy of the byte histogram (bits), and
    the first-4-bytes magic as hex — the content-type-sniff /
    corruption-screen stage every multimodal ingest runs before
    attempting a real decode.

    numpy-vectorized per payload inside ``mapInPandas``
    (``frombuffer`` → ``bincount`` → one 256-term log2 fold — no
    per-byte Python), Arrow-batched in and out; scales with total
    payload bytes, embarrassingly parallel, no shuffle at all.
    Entropy sums ascending by byte value so the float fold order is
    deterministic.
    """
    import numpy as np

    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    out.append((doc_id, 0, None, None, None))
                    continue
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / float(b.size)
                entropy = float(-(p * np.log2(p)).sum())
                out.append(
                    (
                        doc_id,
                        int(b.size),
                        float(b.mean()),
                        entropy,
                        bytes(payload[:4]).hex(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_bytes", "mean_byte", "entropy", "magic_hex"],
            )

    return docs.select(*cols).mapInPandas(batches, schema=BYTE_FEATURE_SCHEMA)


#: output schema of resize_images — one row per payload
RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "mean_luma_resized double"
)


def resize_images(
    docs: DataFrame,
    out_w: int = 2,
    out_h: int = 2,
    payload_col: str = "payload",
) -> DataFrame:
    """Distributed nearest-neighbor image resize via mapInPandas
    (Arrow-batched). Same error contract as ``decode_images``: NULL
    payload → all-NULL features, non-PPM magic → dimensions NULL.
    At 100 TB this is the resize stage of a multimodal ingest DAG:
    scan-bound, shuffle-free, scales with total payload bytes."""
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    out.append((doc_id, None, None, None, None, None))
                    continue
                try:
                    w, h, ow, oh, luma = resize_ppm_nn(
                        bytes(payload), out_w, out_h
                    )
                except NotImplementedError:
                    out.append((doc_id, None, None, None, None, None))
                    continue
                out.append((doc_id, w, h, ow, oh, luma))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "out_w", "out_h",
                    "mean_luma_resized",
                ],
            )

    return docs.select(*cols).mapInPandas(batches, schema=RESIZE_SCHEMA)


#: Fixed byte offset of the first movi frame chunk in the canonical
#: AVI layout emitted by with_avi_payload: 12 (RIFF hdr) + 200 (LIST
#: hdrl: 8+4 + avih 8+56 + LIST strl 8+4 + strh 8+56 + strf 8+40) +
#: 12 (LIST movi hdr) = 224. The m08 oracle derives absolute frame
#: offsets as AVI_MOVI_BASE + 8 + cumsum(previous 8 + size + pad).
AVI_MOVI_BASE = 224


def parse_avi(payload: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Parse a RIFF/AVI container to ``(usec_per_frame,
    total_frames_declared, frames)`` where ``frames`` is a list of
    ``(absolute_body_offset, body_bytes)`` — REAL pure-Python video
    container codec #3 (next to ``parse_ppm`` / ``parse_wav``; reuses
    the same RIFF chunk-walk discipline: 4-byte id, little-endian
    uint32 size, odd-size pad byte).

    A genuine byte-format parse: RIFF magic + ``AVI `` form type; the
    ``LIST hdrl`` list is walked for the ``avih`` main header
    (``dwMicroSecPerFrame`` at body offset 0, ``dwTotalFrames`` at
    body offset 16); the ``LIST movi`` list is walked for frame
    chunks (ids of the ``##db``/``##dc`` uncompressed/compressed
    video form), each yielding its absolute payload offset and bytes.
    Raises ``NotImplementedError`` for non-RIFF/AVI magics (decode
    maps that to the unsupported-payload contract) and ``ValueError``
    for containers that claim AVI but are malformed — truncated
    chunks, missing avih/movi, or a declared dwTotalFrames that
    disagrees with the movi frame count (the cross-check a real
    indexer performs before trusting either)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    usec_per_frame: int | None = None
    total_declared: int | None = None
    frames: list[tuple[int, bytes]] = []
    saw_movi = False
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body_at = pos + 8
        if body_at + size > len(payload):
            raise ValueError("truncated AVI chunk")
        if cid == b"LIST":
            ltype = payload[body_at : body_at + 4]
            inner = body_at + 4
            end = body_at + size
            if ltype == b"hdrl":
                p = inner
                while p + 8 <= end:
                    sid = payload[p : p + 4]
                    ssz = int.from_bytes(payload[p + 4 : p + 8], "little")
                    if p + 8 + ssz > end:
                        raise ValueError("truncated hdrl chunk")
                    if sid == b"avih":
                        if ssz < 20:
                            raise ValueError("short avih chunk")
                        b = payload[p + 8 : p + 8 + ssz]
                        usec_per_frame = int.from_bytes(b[0:4], "little")
                        total_declared = int.from_bytes(b[16:20], "little")
                    p += 8 + ssz + (ssz & 1)
            elif ltype == b"movi":
                saw_movi = True
                p = inner
                while p + 8 <= end:
                    sid = payload[p : p + 4]
                    ssz = int.from_bytes(payload[p + 4 : p + 8], "little")
                    if p + 8 + ssz > end:
                        raise ValueError("truncated movi chunk")
                    if sid[:2].isdigit() and sid[2:4] in (b"db", b"dc"):
                        frames.append((p + 8, payload[p + 8 : p + 8 + ssz]))
                    p += 8 + ssz + (ssz & 1)
        pos = body_at + size + (size & 1)
    if usec_per_frame is None or total_declared is None:
        raise ValueError("missing avih header")
    if not saw_movi:
        raise ValueError("missing movi list")
    if total_declared != len(frames):
        raise ValueError(
            f"dwTotalFrames={total_declared} != movi frames={len(frames)}"
        )
    return usec_per_frame, total_declared, frames


def make_avi(frames: list[bytes], usec_per_frame: int = 33333) -> bytes:
    """Assemble a REAL minimal AVI container from raw frame payloads:
    RIFF(AVI ) → LIST hdrl (avih + LIST strl(strh 'vids'/'DIB ' +
    strf BITMAPINFOHEADER)) → LIST movi ('00db' chunk per frame,
    odd sizes padded). The generator↔parser roundtrip is pinned by
    test; layout constants are documented at ``AVI_MOVI_BASE``."""
    import struct

    avih_body = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, 4, 1, 0, 0, 0, 0
    )
    strh_body = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 30, 0, len(frames), 0, 0, 0)
        + struct.pack("<HHHH", 0, 0, 4, 1)
    )
    strf_body = struct.pack("<IiiHHIIiiII", 40, 4, 1, 1, 8, 0, 4, 0, 0, 0, 0)
    strh = b"strh" + struct.pack("<I", len(strh_body)) + strh_body
    strf = b"strf" + struct.pack("<I", len(strf_body)) + strf_body
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    hdrl_items = avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_items)) + b"hdrl" + hdrl_items
    movi_items = b""
    for body in frames:
        movi_items += (
            b"00db"
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" + movi_items
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def with_avi_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL AVI payload per row, for the oracle-checked
    video decode path: ``n_frames = 2 + id%4``, frame k holds
    ``4 + (id+k)%5`` bytes, byte j of frame k = first byte of
    ``md5("{id}:{k}:{j}")`` — every byte of the movi stream is
    reproducible in SQL, and the fixed header layout makes absolute
    frame offsets derivable as ``AVI_MOVI_BASE + 8 + cumsum`` (the
    m08 oracle re-derives offsets, frame sizes, and per-frame byte
    sums without materializing the container). The payload is a REAL
    AVI file: ``parse_avi`` genuinely walks RIFF → hdrl/avih → movi
    back out of it, cross-checking dwTotalFrames."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                frames = []
                for k in range(2 + did % 4):
                    m = 4 + (did + k) % 5
                    frames.append(
                        bytes(
                            int(
                                hashlib.md5(
                                    f"{did}:{k}:{j}".encode()
                                ).hexdigest()[:2],
                                16,
                            )
                            for j in range(m)
                        )
                    )
                payloads.append(make_avi(frames))
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


#: output schema of sample_avi_frames — one row per PARSED frame
VIDEO_FRAME_SCHEMA = (
    "doc_id long, n_frames int, frame_idx int, off long, "
    "frame_bytes int, byte_sum long"
)


def sample_avi_frames(
    docs: DataFrame, payload_col: str = "payload", stride: int = 1
) -> DataFrame:
    """Frame extraction from GENUINELY PARSED AVI containers: one row
    per (every ``stride``-th) movi frame with its absolute byte
    offset, size, and integer byte sum — the production form of
    ``sample_frames``' offset contract, fed by the real container
    walk instead of deterministic slicing. Same error contract as the
    other decoders (NULL payload → no rows, non-AVI magic → no rows,
    malformed AVI raises); Arrow-batched one-to-many mapInPandas,
    scan-bound and shuffle-free at any scale."""
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    _usec, n_frames, frames = parse_avi(bytes(payload))
                except NotImplementedError:
                    continue
                for k, (off, body) in enumerate(frames):
                    if k % stride:
                        continue
                    out.append(
                        (doc_id, n_frames, k, off, len(body), sum(body))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_frames", "frame_idx", "off",
                    "frame_bytes", "byte_sum",
                ],
            )

    return docs.select(*cols).mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


#: output schema of avi_keyframes — one row per consecutive frame pair
KEYFRAME_SCHEMA = (
    "doc_id long, frame_idx int, prev_bytes int, frame_bytes int, "
    "diff_sum long, is_key int"
)


def avi_keyframes(docs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Scene-cut / keyframe detection over GENUINELY PARSED AVI
    containers: for every consecutive movi frame pair (k−1, k) the
    kernel computes the integer sum of absolute byte differences over
    the overlapping prefix and flags frame k as a keyframe when the
    mean difference reaches half the byte range — the integer predicate
    ``2·diff_sum ≥ 255·min(len_prev, len_cur)``, exact on both engines
    (no float thresholds). This is the frame-sampling policy real video
    curation uses (keep scene cuts, drop near-static frames) exercised
    on the real RIFF chunk walk rather than a stub.

    Same execution contract as the other codec kernels: Arrow-batched
    one-to-many ``mapInPandas``, per-doc work O(frames·bytes), NULL
    payload → no rows, non-AVI magic → no rows, malformed AVI raises.
    Scan-bound and shuffle-free at any scale — frame pairing happens
    inside the kernel on the parser's in-order frame list, so no window
    over an exploded frame table is ever needed.
    """
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    _usec, _n, frames = parse_avi(bytes(payload))
                except NotImplementedError:
                    continue
                for k in range(1, len(frames)):
                    prev, cur = frames[k - 1][1], frames[k][1]
                    m = min(len(prev), len(cur))
                    diff = sum(abs(cur[j] - prev[j]) for j in range(m))
                    out.append(
                        (
                            doc_id,
                            k,
                            len(prev),
                            len(cur),
                            diff,
                            1 if 2 * diff >= 255 * m else 0,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "frame_idx", "prev_bytes", "frame_bytes",
                    "diff_sum", "is_key",
                ],
            )

    return docs.select(*cols).mapInPandas(batches, schema=KEYFRAME_SCHEMA)


def with_ppm_pair_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Sibling-pair variant of ``with_ppm_payload`` for the image
    NEAR-DUP path: image content is keyed by ``g = doc_id // 2`` (so
    consecutive even/odd ids carry the same picture) and the odd
    sibling perturbs sample 0 by +1 mod 256 — a one-channel
    single-pixel edit, the canonical near-duplicate. Every byte stays
    SQL-derivable: sample k = first byte of ``md5("{g}:{k}")`` (+1 for
    odd ids at k=0), dimensions ``w = 3 + g%6``, ``h = 2 + g%4``."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                g = did // 2
                w = 3 + g % 6
                h = 2 + g % 4
                # digest()[0] == int(hexdigest[:2], 16): same first
                # byte without the hex round trip (optimization r11)
                vals = [
                    hashlib.md5(f"{g}:{k}".encode()).digest()[0]
                    for k in range(3 * w * h)
                ]
                if did % 2 == 1:
                    vals[0] = (vals[0] + 1) % 256
                txt = (
                    f"P3\n# id {did}\n{w} {h}\n255\n"
                    + " ".join(map(str, vals))
                    + "\n"
                )
                payloads.append(txt.encode("ascii"))
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def ahash_ppm(payload: bytes) -> str:
    """64-bit average-hash (aHash) of a PPM image: genuinely parse the
    container, nearest-neighbor sample an 8×8 grid (source pixel of
    cell (r,c) is ``(r*h//8, c*w//8)`` — the ``resize_ppm_nn`` index
    rule), take each cell's integer Rec.601 luma (299R+587G+114B, no
    floats), and set bit (r,c) when the cell exceeds the grid mean —
    compared exactly as ``64·cell > Σcells`` so the threshold is pure
    integer arithmetic and engine-reproducible."""
    w, h, _maxval, vals = parse_ppm(payload)
    lum = [
        299 * vals[3 * p] + 587 * vals[3 * p + 1] + 114 * vals[3 * p + 2]
        for p in range(w * h)
    ]
    cells = [
        lum[(r * h // 8) * w + (c * w // 8)] for r in range(8) for c in range(8)
    ]
    total = sum(cells)
    return "".join("1" if 64 * cl > total else "0" for cl in cells)


#: output schema of ahash_bits — one fingerprint row per payload
AHASH_SCHEMA = "doc_id long, ahash_bits string"


def ahash_bits(docs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image aHash fingerprints (``ahash_ppm``) under Arrow-batched
    mapInPandas — same error contract as the other codec kernels (NULL
    payload → no row, non-PPM magic → no row, malformed raises). The
    (doc_id, 64-char bit string) output feeds
    ``dedup.hamming_pairs_from_bits`` for the image near-dup band
    join — the d09 machinery pointed at pictures instead of text."""
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    bits = ahash_ppm(bytes(payload))
                except NotImplementedError:
                    continue
                out.append((doc_id, bits))
            yield pd.DataFrame(out, columns=["doc_id", "ahash_bits"])

    return docs.select(*cols).mapInPandas(batches, schema=AHASH_SCHEMA)


#: Fixed-point 8-point DCT-II basis, COS14[u][x] =
#: round(2^14 · cos(π·(2x+1)·u/16)) — hardcoded (not computed at
#: import) so the kernel and the generated oracle SQL share the exact
#: same integers independent of any libm; every entry sits ≥0.037 from
#: a rounding boundary (verified when the table was generated), so the
#: literal is unambiguous.
COS14 = [
    [16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384],
    [16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069],
    [15137, 6270, -6270, -15137, -15137, -6270, 6270, 15137],
    [13623, -3196, -16069, -9102, 9102, 16069, 3196, -13623],
    [11585, -11585, -11585, 11585, 11585, -11585, -11585, 11585],
    [9102, -16069, 3196, 13623, -13623, -3196, 16069, -9102],
    [6270, -15137, 15137, -6270, -6270, 15137, -15137, 6270],
    [3196, -9102, 13623, -16069, 16069, -13623, 9102, -3196],
]


def phash_ppm(payload: bytes) -> str:
    """64-bit perceptual DCT hash (pHash) of a PPM image, pure integer
    arithmetic end to end so the oracle re-derives every bit exactly:
    genuinely parse the container, NN-sample the same 8×8 integer-luma
    grid as ``ahash_ppm``, apply the separable fixed-point 8×8 DCT-II
    (``COS14``, 2^14 scale — int64-safe: |row pass| ≤ 8·255000·2^14
    ≈ 2^45, |2D| ≤ 2^63/256), and set bit (u,v) when the coefficient
    exceeds the MEAN of the 63 AC coefficients — compared exactly as
    ``63·D[u][v] > Σ AC`` (DC bit (0,0) is fixed 0; it carries only
    global brightness, which is exactly the component a perceptual
    hash must ignore). aHash thresholds NN-sampled PIXELS, so a few
    perturbed samples flip bits one-for-one; pHash thresholds
    low-order BASIS RESPONSES, each a weighted sum over the whole
    grid — localized pixel noise moves every coefficient a little
    instead of any cell a lot (pinned by the robustness fixture in
    tests/test_wave10.py)."""
    w, h, _maxval, vals = parse_ppm(payload)
    return phash_from_samples(w, h, vals)


def phash_from_samples(w: int, h: int, vals: list[int]) -> str:
    """The grid + fixed-point DCT core of ``phash_ppm``, factored so
    m12's video path can fingerprint already-parsed frame samples
    (same math, same COS14 literal, bit-identical)."""
    lum = [
        299 * vals[3 * p] + 587 * vals[3 * p + 1] + 114 * vals[3 * p + 2]
        for p in range(w * h)
    ]
    grid = [
        [lum[(r * h // 8) * w + (c * w // 8)] for c in range(8)]
        for r in range(8)
    ]
    # separable DCT-II: rows then columns, all int64
    rowt = [
        [sum(grid[r][x] * COS14[u][x] for x in range(8)) for u in range(8)]
        for r in range(8)
    ]
    d = [
        [sum(COS14[u][r] * rowt[r][v] for r in range(8)) for v in range(8)]
        for u in range(8)
    ]
    s_ac = sum(d[u][v] for u in range(8) for v in range(8)) - d[0][0]
    return "".join(
        "0"
        if (u, v) == (0, 0)
        else ("1" if 63 * d[u][v] > s_ac else "0")
        for u in range(8)
        for v in range(8)
    )


#: output schema of phash_bits — one fingerprint row per payload
PHASH_SCHEMA = "doc_id long, phash_bits string"


def phash_bits(docs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image DCT-pHash fingerprints (``phash_ppm``) under
    Arrow-batched mapInPandas — same error contract as ``ahash_bits``
    (NULL payload → no row, non-PPM magic → no row, malformed raises).
    The (doc_id, 64-char bit string) output feeds
    ``dedup.hamming_pairs_from_bits``, the third fingerprint family on
    that shared band machinery (text SimHash d09/d13, image aHash m10,
    image pHash m11)."""
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    bits = phash_ppm(bytes(payload))
                except NotImplementedError:
                    continue
                out.append((doc_id, bits))
            yield pd.DataFrame(out, columns=["doc_id", "phash_bits"])

    return docs.select(*cols).mapInPandas(batches, schema=PHASH_SCHEMA)


def with_avi_ppm_pair_payload(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Sibling-pair VIDEO payloads for the video near-dup path (m12):
    a real AVI container (``make_avi``) whose movi frames are real P3
    PPM images, structured as SCENES so keyframe detection is
    non-vacuous — content keyed by ``g = doc_id // 2`` (even/odd
    siblings carry the same footage):

    - ``n_scenes = 2 + g % 2`` scenes of 2 frames each (frame k:
      scene ``s = k // 2``, repeat flag ``rep = k % 2``);
    - all frames share dimensions ``w = 3 + g % 6``, ``h = 2 + g % 4``
      (the with_ppm_pair_payload formulas);
    - sample j of scene s = first byte of ``md5("{g}:{s}:{j}")`` —
      scene content is frame-independent, so the rep==1 frame repeats
      its scene image with only sample 0 bumped +1 mod 256 (a
      near-static frame: never a scene cut) while consecutive scenes
      are independent md5 streams (a scene cut);
    - the ODD sibling perturbs sample 1 of scene 0 by +1 mod 256 in
      EVERY frame of that scene — the single-sample edit pHash must
      shrug off (the m11 robustness property, now at video level).

    Every byte stays SQL-derivable; the container is genuinely walked
    back out by ``parse_avi`` and each frame by ``parse_ppm``."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                g = did // 2
                w = 3 + g % 6
                h = 2 + g % 4
                n_scenes = 2 + g % 2
                frames = []
                # one md5 stream per SCENE (optimization r11: the rep
                # frame repeats its scene image, so computing the
                # stream per FRAME doubled the md5 work); digest()[0]
                # IS int(hexdigest[:2], 16) — same first byte, no hex
                # round trip. Values unchanged byte for byte.
                scene_vals = {
                    s: [
                        hashlib.md5(f"{g}:{s}:{j}".encode()).digest()[0]
                        for j in range(3 * w * h)
                    ]
                    for s in range(n_scenes)
                }
                for k in range(2 * n_scenes):
                    s, rep = k // 2, k % 2
                    vals = list(scene_vals[s])
                    if rep == 1:
                        vals[0] = (vals[0] + 1) % 256
                    if did % 2 == 1 and s == 0:
                        vals[1] = (vals[1] + 1) % 256
                    txt = (
                        f"P3\n# vid {did} f {k}\n{w} {h}\n255\n"
                        + " ".join(map(str, vals))
                        + "\n"
                    )
                    frames.append(txt.encode("ascii"))
                payloads.append(make_avi(frames))
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


#: output schema of avi_keyframe_phash — one row per detected keyframe
KEYFRAME_PHASH_SCHEMA = (
    "doc_id long, kf_idx int, frame_idx int, n_kf int, phash_bits string"
)


def avi_keyframe_phash(
    docs: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Per-video ORDERED keyframe fingerprint sets — the m09 × m11
    composition: genuinely walk the AVI container (``parse_avi``),
    parse every movi frame as a PPM image (``parse_ppm``), detect
    scene cuts on the DECODED sample streams (frame 0 plus every frame
    k whose mean absolute sample difference from frame k−1 reaches a
    quarter of the byte range — the integer predicate ``4·diff_sum ≥
    255·min(n_prev, n_cur)``; m09's container-byte predicate moved to
    decoded pixels, where real scene-cut detectors operate), and DCT-
    pHash each keyframe (``phash_from_samples`` — the COS14 fixed-point
    kernel m11 verified). One output row per keyframe: (doc_id,
    kf_idx, frame_idx, n_kf, phash_bits); ``doc_id·8 + kf_idx`` is the
    collision-free frame id the shared hamming band machinery joins on
    (n_frames ≤ 6 < 8 by the generator; the factor is structural, not
    a corpus cap).

    Same execution contract as the other codec kernels: Arrow-batched
    one-to-many mapInPandas, NULL payload → no rows, non-AVI magic →
    no rows, malformed containers/frames raise. Scan-bound and
    shuffle-free; frame pairing and keyframe indexing happen inside
    the kernel on the parser's in-order frame list."""
    cols = ["doc_id", payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    _usec, _n, frames = parse_avi(bytes(payload))
                except NotImplementedError:
                    continue
                parsed = [parse_ppm(body) for _off, body in frames]
                kfs = []
                for k, (w, h, _mx, vals) in enumerate(parsed):
                    if k == 0:
                        kfs.append((k, w, h, vals))
                        continue
                    pvals = parsed[k - 1][3]
                    mlen = min(len(pvals), len(vals))
                    diff = sum(
                        abs(vals[j] - pvals[j]) for j in range(mlen)
                    )
                    if 4 * diff >= 255 * mlen:
                        kfs.append((k, w, h, vals))
                n_kf = len(kfs)
                for kf_idx, (k, w, h, vals) in enumerate(kfs):
                    out.append(
                        (
                            doc_id,
                            kf_idx,
                            k,
                            n_kf,
                            phash_from_samples(w, h, vals),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "kf_idx", "frame_idx", "n_kf", "phash_bits",
                ],
            )

    return docs.select(*cols).mapInPandas(
        batches, schema=KEYFRAME_PHASH_SCHEMA
    )


def with_wav_pair_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic sibling-pair WAV payloads for the m13 audio
    near-dup fixture (the ``with_avi_ppm_pair_payload`` pattern at
    audio granularity): content is keyed by ``g = doc_id // 2``, so
    consecutive ids form a clip pair. Each clip has ``nw = 2 + g % 3``
    windows of 128 mono PCM16 samples; base sample i of window w is
    ``(int16(md5("{g}:{w}:{i}")[:4]) % 32768) − 16384`` (range
    ±16384, leaving headroom). The ODD sibling applies the two
    perturbations the fingerprint contract is about: every sample is
    **amplitude-doubled** (×2 — exact in PCM16 given the headroom;
    sub-band energies scale ×4 uniformly, so energy-comparison bits
    must NOT change), and window ``g % nw`` is **spliced** — replaced
    wholesale with different content (md5 stream "{g}:spliced:{i}",
    also doubled), so exactly that window's fingerprint must change.
    The payload is a REAL 44-byte-header RIFF/WAVE file; ``parse_wav``
    genuinely walks it back out.
    """
    import hashlib
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                g = did // 2
                nw = 2 + g % 3
                spliced = g % nw
                vals: list[int] = []
                for w in range(nw):
                    for i in range(128):
                        if did % 2 == 0:
                            key = f"{g}:{w}:{i}"
                            mul = 1
                        elif w == spliced:
                            key = f"{g}:spliced:{i}"
                            mul = 2
                        else:
                            key = f"{g}:{w}:{i}"
                            mul = 2
                        # first two digest bytes == int(hexdigest[:4],
                        # 16) — same int16, no hex round trip
                        d = hashlib.md5(key.encode()).digest()
                        v16 = (d[0] << 8) | d[1]
                        vals.append(mul * (v16 % 32768 - 16384))
                data = b"".join(struct.pack("<h", v) for v in vals)
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": payloads}
            )

    return docs.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


#: output schema of wav_window_fingerprints — one row per PCM window
WAV_FP_SCHEMA = "doc_id long, win_idx int, n_win int, fp_bits string"


def wav_window_fingerprints(
    docs: DataFrame,
    payload_col: str = "payload",
    window: int = 128,
    chunks: int = 64,
) -> DataFrame:
    """Integer sub-band energy fingerprint per PCM window — the audio
    sibling of m10's image aHash / m11's DCT pHash, built for the
    robustness audio near-dup actually needs (Haitsma & Kalker,
    "A Highly Robust Audio Fingerprinting System", ISMIR 2002, is the
    energy-comparison lineage; this is its fixed-point aHash-form):
    the clip is cut into ``window``-sample windows, each window into
    ``chunks`` equal sub-bands, and bit j is ``1`` iff
    ``chunks · E_j > Σ E`` where ``E_j`` is the EXACT integer sample
    square-sum of sub-band j. Every quantity is integer arithmetic
    (|x| ≤ 2^15 → E_j ≤ window·2^30, chunks·E_j ≤ 2^43 — no libm, the
    COS14 discipline), so bits are bit-reproducible in SQL, and the
    comparison is **amplitude-invariant**: a uniform gain g scales
    every E_j and the total by g² exactly, leaving every bit unchanged
    — while a spliced segment changes only its own windows' bits. Runs
    the REAL WAV codec (``parse_wav``) under an Arrow mapInPandas
    kernel; trailing samples short of a full window are dropped.
    Returns one row per window: ``(doc_id, win_idx, n_win, fp_bits)``.

    Scale: shuffle-free scan over payload bytes; output is
    O(clip seconds) narrow rows feeding the shared star-capped
    hamming band machinery (``dedup.hamming_pairs_from_bits``).
    """
    cols = ["doc_id", payload_col]
    sub = window // chunks

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                try:
                    _rate, _ch, samples = parse_wav(raw)
                except NotImplementedError:
                    continue
                n_win = len(samples) // window
                for w in range(n_win):
                    base = w * window
                    energies = []
                    for j in range(chunks):
                        e = 0
                        for i in range(sub):
                            v = samples[base + j * sub + i]
                            e += v * v
                        energies.append(e)
                    tot = sum(energies)
                    bits = "".join(
                        "1" if chunks * e > tot else "0" for e in energies
                    )
                    out.append((doc_id, w, n_win, bits))
            yield pd.DataFrame(
                out, columns=["doc_id", "win_idx", "n_win", "fp_bits"]
            )

    return docs.select(*cols).mapInPandas(batches, schema=WAV_FP_SCHEMA)
