"""Kernel micro-benchmark: extraction ms/page on bench-shaped corpus pages.

Reports CPU time (time.process_time) — on a shared VM, wall-clock steal
noise swamps 5-15% kernel deltas; process CPU time isolates the
interpreter work being optimized. Used for the kernel-optimization A/B
records in BENCH.md.

    python tools/kernel_bench.py [n_pages]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from anycrawl_spark.corpus import build_page_html, host_name, page_url  # noqa: E402
from anycrawl_spark.kernel.extract import extract_page  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    htmls = [(page_url(host_name(3), i), build_page_html(3, 40, i, 3000, "en"))
             for i in range(n)]
    for u, h in htmls[:50]:
        extract_page(u, h, formats=("markdown", "text", "links"))
    best = 9e9
    for _ in range(5):
        t0 = time.process_time()
        for u, h in htmls:
            extract_page(u, h, formats=("markdown", "text", "links"))
        best = min(best, time.process_time() - t0)
    print(f"{best / n * 1000:.3f} ms/page (cpu, best of 5, n={n})")


if __name__ == "__main__":
    main()
