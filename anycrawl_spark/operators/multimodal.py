"""Multimodal columns: opaque binary payloads + typed metadata over Spark
(task brief: decode / feature-extract / resize / frame-sample as Pandas UDFs
over mapInPandas; decode stubbed — no image/audio libs in this container —
with the Spark-side plumbing real: schema, partitioning, UDF signature,
Arrow batch shape).

Media payloads are ``binary`` columns with a ``modality`` tag and a typed
metadata struct. The deterministic fake decoder derives plausible media
properties from the payload hash so every stage downstream of decode
(feature extraction, resizing plan, frame sampling) is real, tested
dataflow; swap ``_decode_stub`` for PIL/ffmpeg when available.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "media_id long, modality string, payload_bytes long, payload_sha string, "
    "width int, height int, duration_ms int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, modality string, feature array<float>, n_frames_sampled int, "
    "resized_width int, resized_height int"
)

HAVE_REAL_DECODERS = False  # PIL / torchaudio / ffmpeg not present in sandbox


def _decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic fake decode. A real deployment replaces this body with
    PIL.Image.open / soundfile / pyav; the surrounding dataflow (schemas,
    batching, partitioning) is identical."""
    if HAVE_REAL_DECODERS:  # pragma: no cover
        raise NotImplementedError("real decoders are wired here (PIL/pyav/soundfile)")
    digest = hashlib.sha256(payload).digest()
    h = int.from_bytes(digest[:8], "big")
    if modality == "image":
        return {"width": 64 + h % 1920, "height": 64 + (h >> 16) % 1080,
                "duration_ms": 0, "sample_rate": 0}
    if modality == "audio":
        return {"width": 0, "height": 0,
                "duration_ms": 500 + h % 60_000, "sample_rate": 16_000}
    return {"width": 320 + h % 1280, "height": 240 + (h >> 16) % 720,
            "duration_ms": 1_000 + h % 120_000, "sample_rate": 0}


def decode_media(df: DataFrame, id_col: str = "media_id",
                 payload_col: str = "payload",
                 modality_col: str = "modality") -> DataFrame:
    """mapInPandas decode stage: (id, payload, modality) → typed metadata.
    Repartitions by id so huge payload rows spread evenly (binary columns
    make partition sizes payload-bound, not row-bound)."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    def decode(iterator):
        for pdf in iterator:
            rows = []
            for mid, payload, modality in zip(
                    pdf[id_col], pdf[payload_col], pdf[modality_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = _decode_stub(payload, modality)
                rows.append((
                    int(mid), modality, len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    meta["width"], meta["height"],
                    meta["duration_ms"], meta["sample_rate"],
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "modality", "payload_bytes", "payload_sha",
                "width", "height", "duration_ms", "sample_rate"])

    return (
        df.select(id_col, payload_col, modality_col)
        .repartition(n_parts, id_col)
        .mapInPandas(decode, schema=MEDIA_META_SCHEMA)
    )


def extract_features(df: DataFrame, meta: DataFrame, dim: int = 8,
                     target: tuple[int, int] = (224, 224),
                     max_frames: int = 4) -> DataFrame:
    """Feature-extract + resize plan + frame-sample stage over decoded media.

    - feature: deterministic ``dim``-float vector from the payload hash
      (stands in for a CNN/CLAP embedding),
    - resized_width/height: aspect-preserving fit into ``target``,
    - n_frames_sampled: min(max_frames, duration-derived frame count).
    """
    joined = df.join(meta, "media_id").select(
        "media_id", meta["modality"].alias("modality"), "payload",
        "width", "height", "duration_ms")

    def featurize(iterator):
        for pdf in iterator:
            rows = []
            for mid, modality, payload, w, h, dur in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"],
                    pdf["width"], pdf["height"], pdf["duration_ms"]):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(b"feat:" + payload).digest()
                feature = [
                    int.from_bytes(digest[4 * i: 4 * i + 4], "big") / 2**32
                    for i in range(dim)
                ]
                if w and h:
                    scale = min(target[0] / w, target[1] / h, 1.0)
                    rw, rh = int(w * scale), int(h * scale)
                else:
                    rw = rh = 0
                frames = min(max_frames, max(1, int(dur) // 1000)) if dur else 0
                rows.append((int(mid), modality, feature, frames, rw, rh))
            yield pd.DataFrame(rows, columns=[
                "media_id", "modality", "feature", "n_frames_sampled",
                "resized_width", "resized_height"])

    return joined.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: the driver's documents table as a media table (payload =
    utf-8 bytes standing in for media bytes; modality round-robins)."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        modality.alias("modality"),
    )
