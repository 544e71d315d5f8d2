"""Partitioned cuckoo-filter URL-seen set (north rule: "URL-seen set is a
partitioned Bloom/cuckoo filter keyed by canonicalized-URL hash").

Drop-in alternative to the Bloom family in :mod:`anycrawl_spark.seen`, with
the same segment-row interface (``bucket int, bitmap binary``) and the same
correctness contract: the filter only PRE-classifies candidates — rows it
rejects are definitely new (no false negatives), rows it flags pay the exact
anti-join — so crawl results are byte-identical whichever family is
configured. What cuckoo buys over Bloom at deployment scale:

- **deletion**: a fingerprint can be evicted without rebuilding the segment
  (the recrawl/TTL story: when a page-cache entry expires, its URL can be
  removed from the seen set so a monitor job re-enqueues it; a Bloom bit
  can never be cleared because it is shared by other keys);
- **bounded lookup cost**: membership probes exactly 2 buckets x 4 slots,
  independent of load, vs k scattered bit reads;
- **higher load factor at equal FP rate**: 16-bit fingerprints in 4-way
  buckets give ~0.012% FP up to ~95% occupancy.

Layout per hash-space bucket (same ``sha2(canonical_url, 256)`` sharding as
the Bloom family): a partial-key cuckoo table [Fan et al., CoNEXT'14 —
public algorithm] of ``n_slots`` 4-way buckets holding 16-bit fingerprints
(uint16 little-endian, 0 = empty), serialized as ``1 saturation-flag byte +
table bytes``. The alternate index is ``i XOR H(fp)`` so an entry's other
bucket is recoverable from (slot index, fingerprint) alone — which is what
makes **merge by re-insertion** possible (the per-round cumulative
checkpoint merge in the crawl engine) without keeping the original keys.

Saturation is the no-false-negative escape hatch: if an insert exhausts its
eviction chain (table effectively full), the segment is flagged saturated
and membership tests in that bucket return maybe-seen for every candidate —
degrading that bucket to the exact anti-join, never to a false negative.
Fingerprint/index derivation uses the same independent sha256-hex slices as
seen._positions, so membership is a pure function of the canonical URL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from anycrawl_spark.seen import SEGMENT_SCHEMA, bucket_col

SLOT_WIDTH = 4           # fingerprints per cuckoo bucket (4-way associative)
MAX_KICKS = 500          # eviction-chain bound before declaring saturation
DEFAULT_N_SLOTS = 1 << 12  # 4096 buckets x 4 slots = 16384 entries/segment
_FP_MIX = 0x5BD1E995     # multiplicative mix for the alternate-index hash


def check_n_slots(n_slots: int) -> None:
    """n_slots must be a positive power of two — the XOR alternate index
    masks with n_slots-1 (0 passes the naive bit test but masks with -1)."""
    if n_slots <= 0 or n_slots & (n_slots - 1):
        raise ValueError(f"n_slots must be a positive power of two, "
                         f"got {n_slots}")


def segment_nbytes(n_slots: int) -> int:
    """Serialized size of one segment: flag byte + uint16 table."""
    return 1 + n_slots * SLOT_WIDTH * 2


def _fp_i1(hash_hex: str, n_slots: int) -> tuple[int, int]:
    # hex slices [9:13) -> 16-bit fingerprint (0 remapped to 1: 0 is the
    # empty-slot sentinel), [17:25) -> primary index. Slice [1:9) is the
    # shard bucket id (seen.bucket_col); disjoint slices keep fingerprint,
    # index, and shard independent.
    fp = int(hash_hex[9:13], 16) or 1
    i1 = int(hash_hex[17:25], 16) & (n_slots - 1)
    return fp, i1


def _alt(i: int, fp: int, n_slots: int) -> int:
    # partial-key alternate index: involution (alt(alt(i)) == i), so either
    # resident bucket works as the "primary" when re-inserting during merges
    return (i ^ (fp * _FP_MIX)) & (n_slots - 1)


def _new_table(n_slots: int) -> np.ndarray:
    return np.zeros(n_slots * SLOT_WIDTH, dtype=np.uint16)


def _insert(arr: np.ndarray, fp: int, i1: int, n_slots: int) -> bool:
    """Insert fingerprint ``fp`` whose (either) resident index is ``i1``.
    Returns False when the eviction chain exceeds MAX_KICKS — the caller
    must mark the segment saturated (a displaced victim is lost from the
    table at that point, which saturation makes harmless)."""
    i2 = _alt(i1, fp, n_slots)
    for i in (i1, i2):
        base = i * SLOT_WIDTH
        for s in range(SLOT_WIDTH):
            if arr[base + s] == 0:
                arr[base + s] = fp
                return True
    i = i1
    for kick in range(MAX_KICKS):
        # deterministic victim (kick % width): membership never depends on
        # table layout, but determinism keeps checkpoints reproducible
        base = i * SLOT_WIDTH
        s = kick % SLOT_WIDTH
        victim = int(arr[base + s])
        arr[base + s] = fp
        fp = victim
        i = _alt(i, fp, n_slots)
        base = i * SLOT_WIDTH
        for s2 in range(SLOT_WIDTH):
            if arr[base + s2] == 0:
                arr[base + s2] = fp
                return True
    return False


def _contains(arr: np.ndarray, fp: int, i1: int, n_slots: int) -> bool:
    base = i1 * SLOT_WIDTH
    for s in range(SLOT_WIDTH):
        if arr[base + s] == fp:
            return True
    base = _alt(i1, fp, n_slots) * SLOT_WIDTH
    for s in range(SLOT_WIDTH):
        if arr[base + s] == fp:
            return True
    return False


def _delete(arr: np.ndarray, fp: int, i1: int, n_slots: int) -> bool:
    """Remove one copy of ``fp`` (safe only for keys actually inserted —
    the standard cuckoo-filter deletion contract)."""
    for i in (i1, _alt(i1, fp, n_slots)):
        base = i * SLOT_WIDTH
        for s in range(SLOT_WIDTH):
            if arr[base + s] == fp:
                arr[base + s] = 0
                return True
    return False


def _encode(arr: np.ndarray, saturated: bool) -> bytes:
    return bytes([1 if saturated else 0]) + arr.astype("<u2").tobytes()


def _decode(blob: bytes) -> tuple[np.ndarray, bool]:
    return (np.frombuffer(blob, dtype="<u2", offset=1).copy(),
            blob[0] != 0)


def _build_table(hashes, n_slots: int) -> bytes:
    """One fingerprint copy is stored PER DISTINCT KEY, even when two keys
    collide on (fp, bucket pair) — the standard cuckoo-filter rule that
    makes deletion safe (removing one key's copy must not erase another
    key's membership; a shared slot would turn deletion into a false
    negative). Input keys themselves are dedup'd (set): re-inserting the
    same URL twice is idempotent, not a second copy."""
    arr = _new_table(n_slots)
    saturated = False
    for h in sorted(set(hashes)):   # sorted: reproducible checkpoint bytes
        fp, i1 = _fp_i1(h, n_slots)
        if not _insert(arr, fp, i1, n_slots):
            saturated = True
            break
    return _encode(arr, saturated)


def build_segments(df: DataFrame, url_hash_col: str = "url_hash",
                   num_buckets: int = 32,
                   n_slots: int = DEFAULT_N_SLOTS) -> DataFrame:
    """Build (bucket, bitmap) cuckoo segment rows from url hashes —
    same applyInPandas shape as seen.build_segments."""
    check_n_slots(n_slots)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "bitmap": [_build_table(pdf[url_hash_col], n_slots)],
        })

    return (
        df.select(url_hash_col)
        .withColumn("bucket", bucket_col(url_hash_col, num_buckets))
        .groupBy("bucket")
        .applyInPandas(build, schema=SEGMENT_SCHEMA)
    )


def build_segments_driver(hashes, num_buckets: int = 32,
                          n_slots: int = DEFAULT_N_SLOTS) -> dict[int, bytes]:
    """Driver-side build over an already-collected hash list (the
    driver-resident small-filter fast path, seen.DRIVER_MERGE_MAX_BYTES)."""
    by_bucket: dict[int, list] = {}
    for h in hashes:
        by_bucket.setdefault(int(h[:8], 16) % num_buckets, []).append(h)
    return {b: _build_table(hs, n_slots) for b, hs in by_bucket.items()}


def _merge_tables(blobs: list[bytes], n_slots: int) -> bytes:
    """Merge cuckoo tables by re-inserting every occupied fingerprint of the
    smaller tables into the fullest one. Possible without the original keys
    because the alternate index is recoverable from (slot index, fp). Any
    saturated input — or a failed re-insert — saturates the result (a
    saturated table's contents are incomplete, so only the
    everything-is-maybe-seen reading stays false-negative-free)."""
    decoded = [_decode(b) for b in blobs]
    if any(sat for _, sat in decoded):
        return _encode(max((arr for arr, _ in decoded),
                           key=lambda a: int(np.count_nonzero(a))), True)
    # fullest table as the base; deterministic tie-break on serialized bytes
    order = sorted(range(len(decoded)),
                   key=lambda ix: (-int(np.count_nonzero(decoded[ix][0])),
                                   blobs[ix]))
    base = decoded[order[0]][0].copy()
    saturated = False
    for ix in order[1:]:
        arr = decoded[ix][0]
        for pos in np.flatnonzero(arr):
            # every stored copy is re-inserted (no dedup): copies are
            # per-key, and collapsing them would break deletion safety
            fp = int(arr[pos])
            i = int(pos) // SLOT_WIDTH
            if not _insert(base, fp, i, n_slots):
                saturated = True
                break
        if saturated:
            break
    return _encode(base, saturated)


def merge_segments(segments: DataFrame,
                   n_slots: int = DEFAULT_N_SLOTS) -> DataFrame:
    """Distributed per-bucket merge (the deployment-size cumulative
    checkpoint path — counterpart of seen.merge_segments)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "bitmap": [_merge_tables([bytes(b) for b in pdf["bitmap"]],
                                     n_slots)],
        })

    return segments.groupBy("bucket").applyInPandas(merge, schema=SEGMENT_SCHEMA)


def merge_into_driver(cache: dict[int, bytes], delta: dict[int, bytes],
                      n_slots: int = DEFAULT_N_SLOTS) -> dict[int, bytes]:
    """Driver-resident cumulative merge (counterpart of
    seen.merge_into_driver)."""
    out = dict(cache)
    for bucket, bm in delta.items():
        out[bucket] = (_merge_tables([out[bucket], bm], n_slots)
                       if bucket in out else bm)
    return out


def delete_driver(cache: dict[int, bytes], hashes,
                  num_buckets: int = 32,
                  n_slots: int = DEFAULT_N_SLOTS
                  ) -> tuple[dict[int, bytes], list[str]]:
    """Remove url hashes from a driver-resident filter (recrawl/TTL-expiry
    path). Returns ``(new_cache, skipped)``: deletion from a saturated
    segment is refused — its table is incomplete, so removal can't be
    verified (the cuckoo-filter contract defines deletion only for tracked
    insertions) — and the refused hashes are reported so the caller can
    rebuild that segment from the exact seen history instead (the same
    remedy crawl.py applies to missing/corrupt checkpoints). Deletion is
    safe against fingerprint collisions because builds/merges store one
    copy per distinct key (_build_table): removing one key's copy leaves a
    colliding survivor's copy in place (the survivor stays a member; the
    deleted key may linger as an ordinary false positive)."""
    out = dict(cache)
    skipped: list[str] = []
    for h in hashes:
        b = int(h[:8], 16) % num_buckets
        blob = out.get(b)
        if blob is None:
            continue
        arr, saturated = _decode(blob)
        if saturated:
            skipped.append(h)
            continue
        fp, i1 = _fp_i1(h, n_slots)
        if _delete(arr, fp, i1, n_slots):
            out[b] = _encode(arr, False)
    return out, skipped


def filter_new(candidates: DataFrame, segments: DataFrame | None,
               seen_exact: DataFrame | None,
               url_hash_col: str = "url_hash",
               num_buckets: int = 32,
               n_slots: int = DEFAULT_N_SLOTS) -> DataFrame:
    """Rows of ``candidates`` not in the seen set: cuckoo pre-filter +
    exact anti-join via the shared seen.prefilter_antijoin pipeline (only
    the membership probe differs between families)."""
    from anycrawl_spark.seen import prefilter_antijoin

    def test_batch(hashes, bitmaps):
        maybe = np.zeros(len(hashes), dtype=bool)
        for i, (h, bm) in enumerate(zip(hashes, bitmaps)):
            if bm is None:
                continue   # no segment for this bucket -> definitely new
            if bm[0]:      # saturated -> everything is maybe-seen
                maybe[i] = True
                continue
            # zero-copy read-only view (the probe never writes)
            arr = np.frombuffer(bm, dtype="<u2", offset=1)
            fp, i1 = _fp_i1(h, n_slots)
            maybe[i] = _contains(arr, fp, i1, n_slots)
        return maybe

    return prefilter_antijoin(candidates, segments, seen_exact,
                              url_hash_col, num_buckets, test_batch)
