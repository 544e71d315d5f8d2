"""Cuckoo-filter seen-set family (anycrawl_spark/cuckoo.py): no false
negatives, bounded false positives, deletion, merge-by-reinsertion,
saturation degrade, and byte-identical crawl parity vs the Bloom family
(north rule: "partitioned Bloom/cuckoo filter")."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from anycrawl_spark import cuckoo
from anycrawl_spark.crawl import CrawlConfig, CrawlEngine
from anycrawl_spark.seen import filter_family


def hx(i: int) -> str:
    return hashlib.sha256(f"k{i}".encode()).hexdigest()


HASHES = [hx(i) for i in range(5000)]
FRESH = [hx(i) for i in range(5000, 10000)]


class TestCuckooCore:
    def test_no_false_negatives_and_fp_bound(self):
        seg = cuckoo.build_segments_driver(HASHES, num_buckets=8)
        def member(h):
            blob = seg.get(int(h[:8], 16) % 8)
            if blob is None:
                return False
            arr, sat = cuckoo._decode(blob)
            if sat:
                return True
            fp, i1 = cuckoo._fp_i1(h, cuckoo.DEFAULT_N_SLOTS)
            return cuckoo._contains(arr, fp, i1, cuckoo.DEFAULT_N_SLOTS)

        assert all(member(h) for h in HASHES)          # no false negatives
        fps = sum(member(h) for h in FRESH)
        # 16-bit fp, 4-way, 2 buckets probed: expected FP ~ 8/65536 = 0.012%
        assert fps / len(FRESH) < 0.005

    def test_build_is_deterministic(self):
        a = cuckoo.build_segments_driver(HASHES, num_buckets=4)
        b = cuckoo.build_segments_driver(list(reversed(HASHES)), num_buckets=4)
        assert a == b                                   # sorted insertion

    def test_merge_driver_equals_joint_build(self):
        joint = cuckoo.build_segments_driver(HASHES, num_buckets=4)
        a = cuckoo.build_segments_driver(HASHES[:2500], num_buckets=4)
        b = cuckoo.build_segments_driver(HASHES[2500:], num_buckets=4)
        merged = cuckoo.merge_into_driver(a, b)
        # merged table layout may differ from the joint build (insertion
        # order differs) — the contract is MEMBERSHIP, not bytes
        n_slots = cuckoo.DEFAULT_N_SLOTS
        for h in HASHES:
            bkt = int(h[:8], 16) % 4
            arr, sat = cuckoo._decode(merged[bkt])
            assert not sat
            fp, i1 = cuckoo._fp_i1(h, n_slots)
            assert cuckoo._contains(arr, fp, i1, n_slots)
        assert set(merged) == set(joint)

    def test_delete(self):
        seg = cuckoo.build_segments_driver(HASHES[:100], num_buckets=2)
        out, skipped = cuckoo.delete_driver(seg, HASHES[:10], num_buckets=2)
        assert skipped == []
        n_slots = cuckoo.DEFAULT_N_SLOTS

        def member(segs, h):
            arr, _ = cuckoo._decode(segs[int(h[:8], 16) % 2])
            fp, i1 = cuckoo._fp_i1(h, n_slots)
            return cuckoo._contains(arr, fp, i1, n_slots)

        # deleted keys gone (a deleted key may only linger when it collides
        # with a surviving key's fingerprint; none among these 100)
        fps_kept = {cuckoo._fp_i1(h, n_slots) for h in HASHES[10:100]}
        for h in HASHES[:10]:
            if cuckoo._fp_i1(h, n_slots) not in fps_kept:
                assert not member(out, h)
        for h in HASHES[10:100]:
            assert member(out, h)

    def test_delete_keeps_colliding_survivor(self):
        # two distinct keys with identical bucket ([0:8)), fingerprint
        # ([9:13)) and primary index ([17:25)) slices: builds store one
        # copy PER KEY, so deleting one must not erase the other
        base = "00000000" + "0" + "abcd" + "0000" + "00000123" + "0" * 38
        h1, h2 = base + "1", base + "2"
        assert len(h1) == 64 and h1 != h2
        seg = cuckoo.build_segments_driver([h1, h2], num_buckets=1)
        n_slots = cuckoo.DEFAULT_N_SLOTS
        fp, i1 = cuckoo._fp_i1(h1, n_slots)
        arr, _ = cuckoo._decode(seg[0])
        assert int((arr == fp).sum()) == 2          # one copy per key
        out, skipped = cuckoo.delete_driver(seg, [h1], num_buckets=1)
        assert skipped == []
        arr, _ = cuckoo._decode(out[0])
        assert int((arr == fp).sum()) == 1          # survivor's copy intact
        assert cuckoo._contains(arr, fp, i1, n_slots)

    def test_delete_refuses_saturated_segment(self):
        seg = cuckoo.build_segments_driver(HASHES[:500], num_buckets=1,
                                           n_slots=8)
        assert cuckoo._decode(seg[0])[1]
        out, skipped = cuckoo.delete_driver(seg, HASHES[:3], num_buckets=1,
                                            n_slots=8)
        assert skipped == HASHES[:3] and out == seg

    def test_n_slots_validation(self):
        for bad in (0, -4, 3, 48):
            with pytest.raises(ValueError, match="power of two"):
                cuckoo.check_n_slots(bad)
        from anycrawl_spark.crawl import CrawlConfig

        with pytest.raises(ValueError, match="power of two"):
            CrawlConfig(job_id="x", seed_url="https://a.test/",
                        seen_filter="cuckoo", cuckoo_n_slots=0)

    def test_saturation_degrades_not_corrupts(self):
        # 8 slots x 4 = 32 entries per segment; 500 keys into 1 bucket
        seg = cuckoo.build_segments_driver(HASHES[:500], num_buckets=1,
                                           n_slots=8)
        arr, sat = cuckoo._decode(seg[0])
        assert sat                                     # flagged, not wrong
        merged = cuckoo.merge_into_driver(
            seg, cuckoo.build_segments_driver(FRESH[:5], num_buckets=1,
                                              n_slots=8), n_slots=8)
        assert cuckoo._decode(merged[0])[1]            # saturation is sticky

    def test_family_geometry_and_sizes(self):
        fam = filter_family("cuckoo", num_buckets=8, n_slots=1 << 10)
        assert fam.geometry == ["cuckoo", 8, 1024]
        assert fam.total_bytes == 8 * (1 + 1024 * 4 * 2)
        with pytest.raises(ValueError):
            filter_family("vacuum")


class TestCuckooSpark:
    def test_distributed_build_matches_driver(self, spark):
        df = spark.createDataFrame([(h,) for h in HASHES[:800]],
                                   "url_hash string")
        seg_rows = {r["bucket"]: bytes(r["bitmap"])
                    for r in cuckoo.build_segments(df, num_buckets=4).collect()}
        assert seg_rows == cuckoo.build_segments_driver(HASHES[:800],
                                                        num_buckets=4)

    def test_filter_new_equals_exact_antijoin(self, spark):
        cand = spark.createDataFrame([(h,) for h in HASHES[:400]],
                                     "url_hash string")
        seen = spark.createDataFrame([(h,) for h in HASHES[:200]],
                                     "url_hash string")
        segments = cuckoo.build_segments(seen, num_buckets=4)
        got = sorted(r["url_hash"] for r in cuckoo.filter_new(
            cand, segments, seen, num_buckets=4).collect())
        assert got == sorted(HASHES[200:400])

    def test_filter_new_saturated_segment_still_exact(self, spark):
        cand = spark.createDataFrame([(h,) for h in HASHES[:400]],
                                     "url_hash string")
        seen = spark.createDataFrame([(h,) for h in HASHES[:200]],
                                     "url_hash string")
        segments = cuckoo.build_segments(seen, num_buckets=1, n_slots=8)
        assert cuckoo._decode(bytes(segments.collect()[0]["bitmap"]))[1]
        got = sorted(r["url_hash"] for r in cuckoo.filter_new(
            cand, segments, seen, num_buckets=1, n_slots=8).collect())
        assert got == sorted(HASHES[200:400])


SEED = "https://site000.test/p/0"


class TestCuckooCrawlParity:
    def test_crawl_results_identical_to_bloom(self, spark, small_corpus,
                                              tmp_root):
        runs = {}
        for fam_name in ("bloom", "cuckoo"):
            engine = CrawlEngine(
                spark, small_corpus,
                os.path.join(tmp_root, f"fam_{fam_name}"))
            # prefilter_min_seen=0 forces the probe path even at this
            # small seen size (the engine's default would take the plain
            # exact anti-join below 25k hashes) — the parity under test is
            # the families' PROBE routing, so keep it engaged
            engine.run(CrawlConfig(
                job_id=f"fam_{fam_name}", seed_url=SEED, strategy="all",
                max_depth=6, limit=60, respect_robots=False,
                seen_filter=fam_name, prefilter_min_seen=0))
            runs[fam_name] = (
                [(r["seq"], r["url"], r["status"])
                 for r in engine.visit_order().collect()],
                sorted(r["url_hash"] for r in
                       engine.catalog.read(spark, "seen").collect()),
            )
        assert runs["bloom"] == runs["cuckoo"]

    def test_cuckoo_resume_and_family_switch_rejected(self, spark,
                                                      small_corpus, tmp_root):
        root = os.path.join(tmp_root, "fam_resume")
        engine = CrawlEngine(spark, small_corpus, root)
        kw = dict(seed_url=SEED, strategy="all", max_depth=6, limit=30,
                  respect_robots=False, seen_filter="cuckoo",
                  prefilter_min_seen=0)
        # killed after 2 rounds (max_rounds=2 simulates the kill)
        engine.run(CrawlConfig(job_id="fr", max_rounds=2, **kw))
        # family switch on resume must be rejected (geometry fingerprint)
        with pytest.raises(ValueError, match="geometry mismatch"):
            engine.run(CrawlConfig(job_id="fr", seed_url=SEED, strategy="all",
                                   max_depth=6, respect_robots=False,
                                   limit=30, seen_filter="bloom"),
                       resume=True)
        summary = engine.run(CrawlConfig(job_id="fr", **kw), resume=True)
        assert summary["done"] == 30
        fresh = CrawlEngine(spark, small_corpus,
                            os.path.join(tmp_root, "fam_fresh"))
        fresh.run(CrawlConfig(job_id="fr2", **kw))
        resumed = [(r["seq"], r["url"]) for r in engine.visit_order().collect()]
        direct = [(r["seq"], r["url"]) for r in fresh.visit_order().collect()]
        assert resumed == direct


class TestCuckooProperties:
    """Property tests: the no-false-negative contract must survive
    arbitrary insert orders, merges, and deletions of other keys."""

    def test_membership_after_random_merge_plan(self):
        import random

        rng = random.Random(42)
        n_slots = 1 << 8   # small table -> high load factors
        for trial in range(20):
            keys = [hashlib.sha256(f"t{trial}-{i}".encode()).hexdigest()
                    for i in range(rng.randrange(1, 700))]
            # random split into 1-4 independently built segments, merged
            parts, acc = [], []
            for h in keys:
                acc.append(h)
                if rng.random() < 0.3:
                    parts.append(acc)
                    acc = []
            if acc:
                parts.append(acc)
            merged = {}
            for part in parts:
                delta = cuckoo.build_segments_driver(part, num_buckets=2,
                                                     n_slots=n_slots)
                merged = cuckoo.merge_into_driver(merged, delta,
                                                  n_slots=n_slots)
            for h in keys:   # NO false negatives, loaded or saturated
                blob = merged[int(h[:8], 16) % 2]
                arr, sat = cuckoo._decode(blob)
                fp, i1 = cuckoo._fp_i1(h, n_slots)
                assert sat or cuckoo._contains(arr, fp, i1, n_slots), \
                    (trial, len(keys))

    def test_delete_never_creates_false_negative_for_others(self):
        import random

        rng = random.Random(7)
        n_slots = 1 << 8
        for trial in range(10):
            keys = [hashlib.sha256(f"d{trial}-{i}".encode()).hexdigest()
                    for i in range(rng.randrange(2, 400))]
            seg = cuckoo.build_segments_driver(keys, num_buckets=1,
                                               n_slots=n_slots)
            victims = rng.sample(keys, k=len(keys) // 3)
            out, skipped = cuckoo.delete_driver(seg, victims, num_buckets=1,
                                                n_slots=n_slots)
            survivors = [h for h in keys if h not in set(victims)]
            arr, sat = cuckoo._decode(out[0])
            if sat:
                continue   # saturated segments refuse deletion (skipped)
            for h in survivors:
                fp, i1 = cuckoo._fp_i1(h, n_slots)
                assert cuckoo._contains(arr, fp, i1, n_slots), trial
