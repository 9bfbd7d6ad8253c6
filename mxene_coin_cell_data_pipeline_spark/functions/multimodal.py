"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with typed
metadata columns alongside (the lakehouse pattern for multimodal
training data). The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual decode is STUBBED (this environment has no image/audio codecs)
behind ``decode_images(..., decoder=...)``: the default deterministic
fake derives "features" from the payload bytes so tests pin the full
distributed path end-to-end, and a real decoder (PIL/torchvision/
ffmpeg) drops in as the ``decoder`` callable unchanged.
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
    NOT a real decode — replaced by PIL/torchvision in production."""
    n = len(payload)
    width = max(1, n % 64)
    height = max(1, (n // 64) % 64)
    mean_luma = (sum(payload[:256]) / max(1, min(n, 256))) / 255.0
    return width, height, mean_luma


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
