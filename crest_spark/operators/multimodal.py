"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

Design contract (100 TB posture):
- media lives in BinaryType columns (or object-store URIs) beside typed
  metadata columns; Spark never interprets the bytes in the JVM;
- decode / feature-extract run as ``mapInPandas`` over Arrow batches, so
  the Python worker sees contiguous byte arrays, not per-row calls;
- actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container — the
  decode step is stubbed behind ``_decode_image_stub`` with a clearly
  deterministic fake, keeping the Spark-side plumbing (schema, batch
  shape, partitioning) real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crest_spark.registry import register
from crest_spark.sources.tables import load_table

FEATURE_DIM = 8


@register(
    "multimodal_binary_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5,
               CAST(ascii(substring(text, 1, 1)) AS INT) AS first_byte
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "binary"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction, JVM-side only (no decode):
    byte length, content digest, leading byte. Uses text cast to binary as
    the stand-in payload (the container ships no media files)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.ascii(F.substring("text", 1, 1)).cast("int").alias("first_byte"),
    ).orderBy("doc_id")


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB for the real image decoder (PIL etc. not installed).

    Deterministic fake feature vector derived from the payload digest so
    tests are stable. Replace the body with a real decode + model forward
    when codecs are available; the Spark plumbing does not change.
    """
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    mapInPandas: each Arrow batch arrives as one pandas DataFrame; the
    decode loop is per-batch Python (vectorizable when a real codec takes
    buffer lists). Output schema: id + array<float> features + n_bytes.
    """
    schema = f"{id_col} long, features array<float>, n_bytes long"
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stdlib-only, fully self-contained closure: serializes by value,
        # so workers need no importable crest_spark module (the package is
        # also shipped via addPyFile by ensure_session_confs — this is the
        # belt to that suspender). Mirrors _decode_image_stub.
        import hashlib as _hashlib

        def decode(payload: bytes) -> list[float]:
            digest = _hashlib.sha256(payload).digest()
            return [b / 255.0 for b in digest[:dim]]

        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [decode(bytes(p)) for p in payloads],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing (decode stubbed): emits one row per
    sampled "frame" with a frame index and a deterministic fake thumbnail
    digest — the explode-shaped output a real ffmpeg-based sampler has."""
    schema = f"{id_col} long, frame_idx int, frame_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        suffixes = [i.to_bytes(4, "little") for i in range(n_frames)]
        for pdf in batches:
            if pdf.empty:
                continue
            # vectorized explode: ids/indexes by numpy repeat/tile; the md5
            # per (payload, frame) stays a Python call (hashlib has no
            # batch API) but the row bookkeeping no longer iterrows()
            payloads = [bytes(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_frames),
                    "frame_idx": np.tile(
                        np.arange(n_frames, dtype=np.int32), len(pdf)
                    ),
                    "frame_md5": [
                        hashlib.md5(p + sfx).hexdigest()
                        for p in payloads
                        for sfx in suffixes
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


@register("multimodal_features", oracle=None, tags=("llm", "multimodal"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing demo: binary payload -> Arrow-batched
    stub decode -> feature vector + reduction. Deterministic but the sha256
    stub is not SQL-expressible => rows-only driver check; pytest asserts
    exact values."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    feats = extract_image_features(with_payload, "payload", "doc_id")
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4).alias(
            "feature_sum"
        ),
        F.size("features").cast("int").alias("feature_dim"),
    ).orderBy("doc_id")


@register(
    "multimodal_features_hex",
    oracle="""
        SELECT doc_id,
               substring(sha256(text), 1, 2 * 8) AS feature_hex,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "binary"),
)
def multimodal_features_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated twin of ``multimodal_features``: the SAME Arrow-batched
    Python decode path (mapInPandas over binary payloads), projected as the
    raw digest-prefix hex instead of float features — float32 feature
    values can't hash-compare across engines, the bytes they derive from
    can. This pins the pandas-UDF plumbing (batch shape, binary transfer,
    per-payload decode) against DuckDB exactly."""
    dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            if pdf.empty:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature_hex": [
                        _hashlib.sha256(p).digest()[:dim].hex() for p in payloads
                    ],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    feats = with_payload.mapInPandas(
        run, "doc_id long, feature_hex string, n_bytes long"
    )
    return feats.orderBy("doc_id")


_RESIZE_W, _RESIZE_H = 64, 48  # target thumbnail dims


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = _RESIZE_W,
    height: int = _RESIZE_H,
) -> DataFrame:
    """Image resize plumbing (decode/encode stubbed): binary payload in,
    fixed-dims thumbnail payload + dims metadata out.

    The stub derives a deterministic ``width*height``-byte fake raster
    from the payload digest (a real implementation swaps the body for
    PIL decode -> resize -> encode; the Spark contract — binary in,
    binary out, Arrow-batched, metadata beside payload — is identical
    and is what this tests). Output payload size is CONSTANT, which is
    the operational point of thumbnailing at 100 TB: downstream stages
    shuffle fixed-size thumbnails, never the raw media."""
    schema = (
        f"{id_col} long, thumb binary, thumb_w int, thumb_h int, "
        "src_bytes long"
    )
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def fake_resize(payload: bytes) -> bytes:
            # digest-seeded byte expansion to exactly n_out bytes
            out = bytearray()
            seed = _hashlib.sha256(payload).digest()
            counter = 0
            while len(out) < n_out:
                out.extend(
                    _hashlib.sha256(seed + counter.to_bytes(4, "little")).digest()
                )
                counter += 1
            return bytes(out[:n_out])

        for pdf in batches:
            if pdf.empty:
                continue
            payloads = [bytes(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "thumb": [fake_resize(p) for p in payloads],
                    "thumb_w": width,
                    "thumb_h": height,
                    "src_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


@register("multimodal_resize", oracle=None, tags=("llm", "multimodal"))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline over the documents payload stand-in: constant-size
    thumbnails + dims metadata (sha-stubbed decode => rows-only driver
    check; pytest asserts determinism, sizes, and metadata)."""
    d = load_table(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    out = resize_images(payload)
    return out.select(
        "doc_id",
        F.octet_length("thumb").cast("int").alias("thumb_bytes"),
        "thumb_w",
        "thumb_h",
        "src_bytes",
        F.md5("thumb").alias("thumb_md5"),
    ).orderBy("doc_id")


_AUDIO_SR = 16_000  # stub sample rate (Hz)
_AUDIO_CHUNK_S = 30  # seconds per chunk
_AUDIO_BYTES_PER_S = _AUDIO_SR * 2  # 16-bit mono PCM


def chunk_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    chunk_seconds: int = _AUDIO_CHUNK_S,
    bytes_per_second: int = _AUDIO_BYTES_PER_S,
) -> DataFrame:
    """Audio chunking plumbing (decode stubbed): one binary payload in,
    one row per fixed-duration window out, with offsets and a chunk
    digest — the segmentation every ASR/audio-training pipeline runs
    before per-chunk feature extraction.

    The payload is treated as PCM at the stub rate (a real implementation
    decodes the container first; the windowing, Arrow batching, and
    explode-shaped output — the Spark contract — are identical). Chunks
    are size-bounded by construction, so downstream per-chunk work is
    uniform regardless of source-file length — the property that stops a
    10-hour recording from becoming one straggler task."""
    schema = (
        f"{id_col} long, chunk_idx int, start_s double, "
        "n_bytes long, chunk_md5 string"
    )
    window = chunk_seconds * bytes_per_second

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in (id_col, "chunk_idx", "start_s", "n_bytes", "chunk_md5")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                n_chunks = max(1, (len(data) + window - 1) // window)
                for i in range(n_chunks):
                    piece = data[i * window : (i + 1) * window]
                    out[id_col].append(doc_id)
                    out["chunk_idx"].append(i)
                    out["start_s"].append(float(i * chunk_seconds))
                    out["n_bytes"].append(len(piece))
                    out["chunk_md5"].append(hashlib.md5(piece).hexdigest())
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


@register("multimodal_audio_chunks", oracle=None, tags=("llm", "multimodal", "audio"))
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-chunking pipeline over the documents payload stand-in
    (1-second stub windows so the short fixtures produce multi-chunk
    docs). Deterministic sha/md5 stub => rows-only driver check; pytest
    pins coverage (every byte in exactly one chunk) and determinism."""
    d = load_table(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    out = chunk_audio(payload, chunk_seconds=1, bytes_per_second=64)
    return out.orderBy("doc_id", "chunk_idx")
