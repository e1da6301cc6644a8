"""Single-core kernel probe — the bench-trustworthiness anchor.

The sandbox box carries fluctuating external neighbor load, which swung
the round-3 full-width bench by 2x while the kernel itself was
unchanged. This probe times the pure-Python extraction kernel (no
Spark, no JVM, no shuffle) on ONE pinned core over pages built with the
same three archetype templates as spark/pages.synthesize_pages — so a
round-over-round delta in ms/doc is a KERNEL delta, and a full-width
bench delta without a probe delta is load, not regression.

Usage: python tools/kernel_probe.py [sf_dir] [n_docs]
Prints one JSON line; also importable (run_probe) so bench.py embeds
the number in its own JSON artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pages(sf_dir: str, n_docs: int = 500) -> list:
    """(url, html_bytes) pages mirroring synthesize_pages' archetypes."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "lang", "source"])
    rows = tbl.to_pylist()[:n_docs]
    pages = []
    for r in rows:
        did, text, lang, source = (r["doc_id"], r["text"], r["lang"],
                                   r["source"])
        url = f"https://docs.example.test/{lang}/{source}/{did}-r0"
        title = f"Doc {did}"
        arch = did % 3
        meta = ""
        if arch == 1:
            meta = (
                f'<meta property="og:title" content="{title}">'
                '<meta property="og:site_name" content="Example Docs">'
                '<meta name="author" content="Synthetic Author">'
                f'<meta name="description" content="Synthetic description of {title}.">'
                '<meta property="article:published_time" content="2024-01-15T00:00:00Z">'
                f'<meta property="og:image" content="https://img.example.test/{did}.png">'
                '<link rel="icon" href="/favicon-32.png">'
                f'<link rel="canonical" href="{url}">')
        if arch == 2:
            article = (f"<article><h1>{title}</h1>"
                       f'<div class="wrapper"><div class="inner"><p>{text}'
                       "</p></div></div></article>")
        else:
            imgs = ""
            if arch == 0:
                imgs = (f'<img src="/media/{did}.png" alt="Figure {did}"'
                        ' width="640" height="480">'
                        '<img src="/pix.png" width="10" height="10">'
                        '<div style="display:none">tracking beacon text</div>')
            article = f"<article><h1>{title}</h1><p>{text}</p>{imgs}</article>"
        html = (
            f'<!DOCTYPE html><html><head><meta charset="utf-8">'
            f"<title>{title}</title>{meta}</head><body>"
            '<header><div class="logo">Example Docs</div></header>'
            '<nav><a href="/">Home</a><a href="/archive">Archive</a>'
            '<a href="/tags">Tags</a></nav>'
            '<div class="ad">Buy widgets now! Limited time offer for subscribers.</div>'
            f"<main>{article}</main>"
            '<aside class="sidebar">Trending: <a href="/p1">One</a> '
            '<a href="/p2">Two</a></aside>'
            '<div id="comments"><p>First comment!</p><p>Great post.</p></div>'
            "<footer>© 2024 Example Docs. All rights reserved.</footer>"
            "</body></html>")
        pages.append((url, html.encode("utf-8")))
    return pages


def run_probe(sf_dir: str = "/root/testdata/sf0.01", n_docs: int = 500,
              reps: int = 3, pin_core: int = 0) -> dict:
    """Time the kernel single-core; returns the probe dict (best-of-reps,
    since neighbor noise only ever slows a run down)."""
    old_affinity = None
    if hasattr(os, "sched_setaffinity"):
        old_affinity = os.sched_getaffinity(0)
        try:
            os.sched_setaffinity(0, {pin_core})
        except OSError:
            old_affinity = None
    try:
        from defuddle_spark.kernel import extract_document_bytes
        pages = build_pages(sf_dir, n_docs)
        # warmup rep compiles selector tables / regexes
        for url, html in pages[:50]:
            extract_document_bytes(html, url=url)
        best = float("inf")
        words = 0
        for _ in range(reps):
            t0 = time.monotonic()
            words = 0
            for url, html in pages:
                words += extract_document_bytes(html, url=url).word_count
            best = min(best, time.monotonic() - t0)
        return {
            "kernel_ms_per_doc": round(best * 1000 / len(pages), 4),
            "probe_docs": len(pages),
            "probe_reps": reps,
            "probe_words": words,
            "probe_core": pin_core,
        }
    finally:
        if old_affinity is not None:
            os.sched_setaffinity(0, old_affinity)


# fork-shared page set for the full-width replicas: set in the parent
# BEFORE the Pool forks, read by workers copy-on-write — passing pages
# through pool.map task args would pickle the corpus once per replica
_FW_PAGES: list = []


def _fullwidth_worker(args) -> float:
    """One pinned replica: warm up, wait for the common barrier, then
    time ``reps`` consecutive passes over the page set. Returns total
    timed seconds (all replicas run the same work, so the SLOWEST total
    is the full-contention wall), or NaN if the barrier broke (a
    replica died — the probe must fail visibly, not hang the bench)."""
    core, reps, barrier = args
    import time as _time

    if hasattr(os, "sched_setaffinity"):
        try:
            os.sched_setaffinity(0, {core})
        except OSError:
            pass
    from defuddle_spark.kernel import extract_document_bytes
    pages = _FW_PAGES
    for url, html in pages[:50]:
        extract_document_bytes(html, url=url)
    try:
        barrier.wait(timeout=120)
    except Exception:  # BrokenBarrierError (threading's, via the proxy)
        return float("nan")
    t0 = _time.monotonic()
    for _ in range(reps):
        for url, html in pages:
            extract_document_bytes(html, url=url)
    return _time.monotonic() - t0


def run_probe_fullwidth(sf_dir: str = "/root/testdata/sf0.01",
                        n_docs: int = 200, reps: int = 2,
                        width: Optional[int] = None) -> dict:
    """FULL-WIDTH kernel probe: ``width`` pinned concurrent replicas of
    the single-core probe, started together on a barrier. The verdict-r6
    finding this exists for: a single-core probe ratio does NOT transfer
    to 32-wide wall time (all-core turbo drops the clock ~25-30% and
    memory bandwidth is shared — BENCH/BASELINE.md), so normalizing a
    32-wide bench total by the 1-core ratio restated a +2.8% move as a
    53% regression. ``kernel_ms_per_doc_fullwidth`` is the per-replica
    per-doc time under full contention — the number a full-width bench
    delta should be adjudicated against."""
    import math
    import multiprocessing as mp

    global _FW_PAGES
    if width is None:
        width = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _FW_PAGES = build_pages(sf_dir, n_docs)
    n = len(_FW_PAGES)
    try:
        from concurrent.futures import ProcessPoolExecutor

        ctx = mp.get_context("fork")  # pages ride fork COW, no pickling
        with ctx.Manager() as mgr:
            barrier = mgr.Barrier(width)
            # ProcessPoolExecutor (not mp.Pool): a replica killed
            # mid-task raises BrokenProcessPool instead of hanging map()
            with ProcessPoolExecutor(max_workers=width,
                                     mp_context=ctx) as pool:
                totals = list(pool.map(
                    _fullwidth_worker,
                    [(core, reps, barrier) for core in range(width)]))
    finally:
        _FW_PAGES = []
    if any(math.isnan(t) for t in totals):
        raise RuntimeError(
            "full-width probe: a replica died before the start barrier")
    return {
        "kernel_ms_per_doc_fullwidth": round(
            max(totals) * 1000 / (reps * n), 4),
        "probe_fullwidth_width": width,
        "probe_fullwidth_docs": n,
        "probe_fullwidth_reps": reps,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    out = run_probe(sf, n)
    if os.environ.get("SPARK_GRAFT_PROBE_FULLWIDTH", "0") == "1":
        out.update(run_probe_fullwidth(sf))
    out["load_avg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
