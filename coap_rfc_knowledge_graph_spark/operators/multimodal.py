"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched
pandas UDFs over ``mapInPandas``. The image/audio libraries are NOT in
this container, so the codec step is STUBBED: header sniffing and
deterministic fake features are real and tested; actual pixel/sample
decoding raises ``NotImplementedError`` behind ``decode_backend`` —
the Spark-side contract (schemas, batch shapes, partitioning, UDF
signatures) is exactly what a real backend drops into.

Scale notes: binary payloads dominate row size — the ops below select
ONLY (id, payload) into the Python worker (column pruning is explicit),
and emit fixed-size features, so shuffle volume after extraction is
tiny. Batch size for Arrow transfer is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
]


def sniff_mime(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def decode_backend(payload: bytes, mime: str) -> np.ndarray:
    """THE swap point for a real codec (PIL/torchaudio/pyav). Not
    available in this container."""
    raise NotImplementedError(
        "media decoding requires an image/audio backend not present in this "
        "container; plug PIL/torchaudio/pyav in here"
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature vector derived from payload bytes
    (so tests assert real dataflow end-to-end without a codec)."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload[: dim * 8], dtype=np.uint8).astype(np.float32)
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(arr))] = arr[:dim]
    n = np.linalg.norm(out)
    return out / n if n > 0 else out


def synthetic_media(spark, n: int, seed: int = 5, partitions: int | None = None) -> DataFrame:
    """Seeded fake media table exercising the binary path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        magics = [b"\x89PNG\r\n", b"RIFF\x00\x00", b"\x00\x00\x00\x18ftyp"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.Generator(np.random.Philox(key=int(i) + seed))
                ki = int(i) % 3
                body = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
                payload = magics[ki] + body
                rows.append(
                    (
                        int(i),
                        kinds[ki],
                        payload,
                        (sniff_mime(payload), int(rng.integers(16, 1024)), int(rng.integers(16, 1024)), int(rng.integers(0, 60000))),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 32, use_backend: bool = False) -> DataFrame:
    """(media_id, mime, n_bytes, features) — the decode/extract stage.
    ``use_backend=True`` routes through ``decode_backend`` (raises here;
    real deployments implement it); default uses the deterministic fake
    so the distributed plumbing is fully testable."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mime": [], "n_bytes": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                mime = sniff_mime(payload)
                if use_backend:
                    feats = decode_backend(payload, mime)[:dim]
                else:
                    feats = _fake_features(payload, dim)
                out["media_id"].append(int(mid))
                out["mime"].append(mime)
                out["n_bytes"].append(len(payload))
                out["features"].append(feats.astype(np.float32))
            yield pd.DataFrame(out)

    pruned = media.select("media_id", "payload")  # explicit column pruning
    return pruned.mapInPandas(fn, FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) — frame-sampling plan for video rows:
    the timestamp fan-out is NATIVE (sequence + explode over metadata);
    only the subsequent per-frame decode (stubbed) needs the payload.
    This ordering keeps the binary column out of the explode."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
