"""Generate committed golden files (FIXTURES.md §6) into tests/golden/:

- markdown/<case>.md + text/<case>.txt for a deterministic slice of fixture
  pages (pipeline outputs of the extraction kernel),
- crawl/<job>.order.json — expected (seq, url, depth, status) visit order and
  final seen-set per seed job from the pure-Python simulator,
- canonical/urls.tsv — url → normalize_url → sha256 triples.

Regenerate with: python tools/gen_goldens.py   (idempotent; diffs = regression)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN = os.path.join(REPO, "tests", "golden")

CANONICAL_CASES = [
    "https://EXAMPLE.com/Path/",
    "https://example.com",
    "https://example.com/p?utm_source=x&b=2&a=1&fbclid=f",
    "https://sub.site001.test/blog/p/3#frag",
    "https://site000.test:443/p/1",
    "http://site000.test:8080/p/2?z=1&a=2",
]

CRAWL_JOBS = {
    "bfs-hostname": dict(strategy="same-hostname", max_depth=5, limit=40),
    "limited": dict(strategy="same-hostname", max_depth=10, limit=12),
    "globbed": dict(strategy="same-hostname", max_depth=6, limit=60,
                    include_paths=["**/p/*"], exclude_paths=["**/blog/**"]),
    "budgeted": dict(strategy="all", max_depth=4, limit=60, politeness_budget=2),
    "batched": dict(strategy="same-hostname", max_depth=5, limit=30, batch_size=5),
}


def main() -> None:
    from anycrawl_spark.corpus import build_page_html, host_name, host_plan, page_url
    from anycrawl_spark.kernel.canonical import normalize_url
    from anycrawl_spark.kernel.extract import extract_page
    from simulator import simulate_crawl

    for sub in ("markdown", "text", "crawl", "canonical"):
        os.makedirs(os.path.join(GOLDEN, sub), exist_ok=True)

    # --- page corpus identical to tests/conftest.py small_corpus -----------
    num_pages, num_hosts = 120, 6
    bounds = host_plan(num_pages, num_hosts)
    corpus: dict[str, str] = {}
    page_meta = []
    for gid in range(num_pages):
        host_idx = int(next(i for i in range(num_hosts)
                            if bounds[i] <= gid < bounds[i + 1]))
        local_idx = int(gid - bounds[host_idx])
        n_host = int(bounds[host_idx + 1] - bounds[host_idx])
        lang = ["en", "zh", "de", "fr", "ja"][host_idx % 5]
        html = build_page_html(host_idx, num_hosts, local_idx, n_host, lang)
        url = page_url(host_name(host_idx), local_idx)
        key = normalize_url(url).split("#", 1)[0]
        corpus[key] = html
        page_meta.append((url, html, host_idx, local_idx))

    # --- extraction goldens (every 7th page) -------------------------------
    for url, html, host_idx, local_idx in page_meta[::7]:
        case = f"h{host_idx}_p{local_idx}"
        doc = extract_page(url, html)
        with open(os.path.join(GOLDEN, "markdown", f"{case}.md"), "w") as f:
            f.write(doc["markdown"])
        with open(os.path.join(GOLDEN, "text", f"{case}.txt"), "w") as f:
            f.write(doc["text"])

    # --- crawl-order goldens ------------------------------------------------
    seed = page_url(host_name(0), 0)
    for job, kwargs in CRAWL_JOBS.items():
        sim = simulate_crawl(corpus, seed, **kwargs)
        payload = {
            "seed": seed,
            "config": kwargs,
            "visits": [
                [v.seq, v.url, v.depth, v.status, v.round]
                for v in sorted(sim.visits, key=lambda v: v.seq)
            ],
            "seen": sorted(hashlib.sha256(k.encode()).hexdigest() for k in sim.seen),
            "done": sim.done,
            "failed": sim.failed,
            "enqueued": sim.enqueued,
        }
        with open(os.path.join(GOLDEN, "crawl", f"{job}.order.json"), "w") as f:
            json.dump(payload, f, indent=1)

    # --- canonicalization goldens -------------------------------------------
    with open(os.path.join(GOLDEN, "canonical", "urls.tsv"), "w") as f:
        for url in CANONICAL_CASES:
            norm = normalize_url(url)
            digest = hashlib.sha256(norm.encode()).hexdigest()
            f.write(f"{url}\t{norm}\t{digest}\n")

    print(f"goldens written under {GOLDEN}")


if __name__ == "__main__":
    main()
