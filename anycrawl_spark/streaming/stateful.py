"""Custom stateful streaming operator: per-host streaming URL-seen dedup +
crawl-rate state via ``applyInPandasWithState`` (task brief: "custom stateful
operators"; SURVEY.md §2.9 — the reference's Redis counters re-expressed as
managed stream state).

For each host group, state holds (bloom bitmap, total urls, emitted urls)
across micro-batches; the operator emits only first-seen URLs downstream with
a running per-host sequence — a continuous-ingestion frontier feed where the
batch engine's round loop is replaced by stream micro-batches.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("host_seq", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("bitmap", BinaryType()),
    StructField("total_seen", LongType()),
    StructField("emitted", LongType()),
])

M_BITS = 1 << 16
K = 4


def _positions(url: str) -> list[int]:
    digest = hashlib.sha256(url.encode("utf-8")).hexdigest()
    return [int(digest[8 * i: 8 * (i + 1)], 16) % M_BITS for i in range(K)]


def _test_and_set(bitmap: bytearray, url: str) -> bool:
    """True if url was definitely NOT seen before (and marks it seen)."""
    positions = _positions(url)
    seen = all((bitmap[p >> 3] >> (p & 7)) & 1 for p in positions)
    for p in positions:
        bitmap[p >> 3] |= 1 << (p & 7)
    return not seen


def dedup_state_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterable[pd.DataFrame]:
    host = key[0]
    if state.exists:
        bitmap_bytes, total, emitted = state.get
        bitmap = bytearray(bitmap_bytes)
    else:
        bitmap = bytearray(M_BITS // 8)
        total = 0
        emitted = 0
    out_urls: list[str] = []
    out_seqs: list[int] = []
    for pdf in pdfs:
        for url in pdf["url"]:
            total += 1
            if _test_and_set(bitmap, url):
                out_urls.append(url)
                out_seqs.append(emitted)
                emitted += 1
    state.update((bytes(bitmap), total, emitted))
    yield pd.DataFrame({"host": host, "url": out_urls, "host_seq": out_seqs})


def streaming_seen_dedup(urls: DataFrame) -> DataFrame:
    """urls: streaming DataFrame with (host, url). Emits first-seen rows with
    a dense per-host sequence; state persists across micro-batches (and
    restarts via the stream checkpoint)."""
    return (
        urls.groupBy("host")
        .applyInPandasWithState(
            dedup_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
