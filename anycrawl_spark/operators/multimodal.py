"""Multimodal columns: opaque binary payloads + typed metadata over Spark
(task brief: decode / feature-extract / resize / frame-sample as Pandas UDFs
over mapInPandas).

Media payloads are ``binary`` columns with a ``modality`` tag and a typed
metadata struct. Decode is REAL header parsing for PNG/GIF/JPEG/WAV/MP4
(``media_codec.decode_media_bytes`` — pure-struct reads, no PIL/ffmpeg
needed); payloads with an unrecognized magic fall back to the deterministic
hash stub (flagged ``format='unknown'``) so the downstream dataflow
(feature extraction, resizing plan, frame sampling) always has values. A
full-frame decoder (PIL/pyav) slots into the same mapInPandas stage.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from anycrawl_spark.operators.media_codec import (
    decode_media_bytes,
    make_bmp,
    make_gif,
    make_jpeg,
    make_mp3,
    make_mp4,
    make_png,
    make_wav,
    make_webp,
)

MEDIA_META_SCHEMA = (
    "media_id long, modality string, format string, payload_bytes long, "
    "payload_sha string, width int, height int, duration_ms int, "
    "sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, modality string, feature array<float>, n_frames_sampled int, "
    "resized_width int, resized_height int"
)

def _decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic fallback for payloads with no recognized container
    magic (real media always hits ``decode_media_bytes`` first): derives
    plausible properties from the payload hash so downstream stages have
    values. A frame-level decoder (PIL/pyav, absent in this sandbox) would
    replace this for exotic formats; the surrounding dataflow (schemas,
    batching, partitioning) is identical."""
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
                meta = decode_media_bytes(payload)
                if meta["format"] == "unknown":
                    meta = dict(_decode_stub(payload, modality),
                                format="unknown")
                rows.append((
                    int(mid), modality, meta["format"], len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    meta["width"], meta["height"],
                    meta["duration_ms"], meta["sample_rate"],
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "modality", "format", "payload_bytes",
                "payload_sha", "width", "height", "duration_ms",
                "sample_rate"])

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


MEDIA_PAYLOAD_SCHEMA = "media_id long, payload binary, modality string"


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a REAL media table from the documents table: each doc_id maps
    deterministically to a minimal valid container file (PNG/GIF/JPEG for
    images, WAV for audio, MP4 for video) whose header values are pure
    arithmetic in doc_id — so an independent SQL oracle can predict exactly
    what header decode must return.

    Parameter map (mirrored by the media_decode_meta oracle SQL):
      doc_id % 3 == 0 → image, format = [png,gif,jpeg,webp,bmp][(doc_id//3) % 5]
                        (webp bitstream variant = [vp8,vp8l,vp8x][(doc_id//15) % 3]
                         — all decode to format='webp'),
                        width = 16 + doc_id % 320, height = 16 + (7*doc_id) % 200
      doc_id % 3 == 1 → audio, format = [wav,mp3][(doc_id//3) % 2]
                        wav: sample_rate = 8000 + 4000*(doc_id % 5),
                             n_samples = 100*(1 + doc_id % 16)
                        mp3: sample_rate = [32000,44100,48000][(doc_id//6) % 3],
                             n_frames = 1 + doc_id % 8 (1152 samples/frame),
                             ID3v2 tag prepended when (doc_id//6) % 2 == 1
      doc_id % 3 == 2 → video mp4, width = 160 + 16*(doc_id % 60),
                        height = 120 + 8*(doc_id % 90),
                        duration_units = 500*(1 + doc_id % 20) @ timescale 600
    """
    n_parts = documents.sparkSession.sparkContext.defaultParallelism

    def synth(iterator):
        for pdf in iterator:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % 3
                if m == 0:
                    w, h = 16 + d % 320, 16 + (7 * d) % 200
                    fmt = (d // 3) % 5
                    if fmt == 0:
                        payload = make_png(w, h)
                    elif fmt == 1:
                        payload = make_gif(w, h)
                    elif fmt == 2:
                        payload = make_jpeg(w, h)
                    elif fmt == 3:
                        payload = make_webp(
                            w, h, ("vp8", "vp8l", "vp8x")[(d // 15) % 3])
                    else:
                        payload = make_bmp(w, h)
                    modality = "image"
                elif m == 1:
                    if (d // 3) % 2 == 0:
                        payload = make_wav(8000 + 4000 * (d % 5),
                                           100 * (1 + d % 16))
                    else:
                        payload = make_mp3(
                            (32000, 44100, 48000)[(d // 6) % 3],
                            1 + d % 8, with_id3=(d // 6) % 2 == 1)
                    modality = "audio"
                else:
                    payload = make_mp4(160 + 16 * (d % 60),
                                       120 + 8 * (d % 90),
                                       500 * (1 + d % 20), timescale=600)
                    modality = "video"
                rows.append((d, payload, modality))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "modality"])

    return (
        documents.select("doc_id")
        .repartition(n_parts, "doc_id")
        .mapInPandas(synth, schema=MEDIA_PAYLOAD_SCHEMA)
    )


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
