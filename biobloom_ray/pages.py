"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1-F3).

BASELINE.json input_hint shape: ``url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string``.  Everything is derived from a
fixed seed (default 42) with ``numpy.random.Generator(PCG64)`` — stable
across runs and processes; no wall clock, no external data.

- hosts are Zipf-skewed (a = 1.3 over 200 hosts) to exercise the salted
  repartition path;
- ``html`` wraps ``text`` as ``b"<html><body>" + text + b"</body></html>"``
  so extraction has a known byte-exact inverse per url;
- per-lang word pools share a controlled fraction of vocabulary so the
  per-lang reference filters produce unique / shared / multiMatch traffic
  (F2), and lang ``zz`` is a disjoint negative-control pool driving the
  observed-FPR acceptance check (F3 queries_neg).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = 1730419200000000  # 2024-11-01T00:00:00 UTC in microseconds
LANGS = ("en", "de", "fr", "es", "zz")
N_HOSTS = 200
SHARED_WORDS = 40   # words shared by all non-control langs (multiMatch driver)
POOL_WORDS = 400    # per-lang exclusive vocabulary


def _word_pools() -> dict[str, list[str]]:
    pools = {}
    shared = [f"common{i:03d}" for i in range(SHARED_WORDS)]
    for lang in LANGS:
        if lang == "zz":
            # negative control: NO k-shingle overlap with any other pool —
            # (the other pools all contain the substring "word", so the
            # control must not; 8-gram windows then never coincide)
            pools[lang] = [f"neg{i:03d}ctrl" for i in range(POOL_WORDS)]
        else:
            own = [f"{lang}word{i:03d}" for i in range(POOL_WORDS)]
            pools[lang] = own + shared
    return pools


def generate_pages(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(np.random.PCG64(seed))
    pools = _word_pools()
    lang_idx = rng.integers(0, len(LANGS), size=n_rows)
    # Zipf-ish host skew via power-law inverse-CDF (bounded, deterministic)
    u = rng.random(n_rows)
    hosts = np.minimum((N_HOSTS * (u ** 1.3)).astype(np.int64), N_HOSTS - 1)
    n_words = np.maximum((rng.lognormal(3.4, 0.5, size=n_rows)).astype(np.int64), 8)

    texts = np.empty(n_rows, dtype=object)
    for li, lang in enumerate(LANGS):
        rows = np.nonzero(lang_idx == li)[0]
        if not len(rows):
            continue
        pool = np.array(pools[lang], dtype=object)
        total = int(n_words[rows].sum())
        picks = rng.integers(0, len(pool), size=total)
        words = pool[picks]
        bounds = np.cumsum(n_words[rows])[:-1]
        for r, chunk in zip(rows, np.split(words, bounds)):
            texts[r] = " ".join(chunk)

    urls = np.array(
        [f"https://host{h:04d}.example/p/{i}" for i, h in enumerate(hosts)],
        dtype=object)
    ts = EPOCH_US + np.arange(n_rows, dtype=np.int64) * 137_000_000
    html = np.array(
        [b"<html><body>" + t.encode() + b"</body></html>" for t in texts],
        dtype=object)
    langs = np.array(LANGS, dtype=object)[lang_idx]
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array(html.tolist(), type=pa.binary()),
        "text": pa.array(texts.tolist(), type=pa.string()),
        "lang": pa.array(langs.tolist(), type=pa.string()),
    })


def generate_ref_corpora(docs_per_lang: int = 50, words_per_doc: int = 120,
                         seed: int = 43) -> pa.Table:
    """F2: seed documents per non-control lang whose shingles populate
    each reference Bloom filter (one filter_id per lang)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    pools = _word_pools()
    fids, docs = [], []
    for lang in LANGS:
        if lang == "zz":
            continue
        pool = np.array(pools[lang], dtype=object)
        for _ in range(docs_per_lang):
            picks = rng.integers(0, len(pool), size=words_per_doc)
            fids.append(lang)
            docs.append(" ".join(pool[picks]))
    return pa.table({
        "filter_id": pa.array(fids, type=pa.string()),
        "doc": pa.array(docs, type=pa.string()),
    })


def pages_path(n_rows: int, seed: int = 42,
               cache_dir: str = "/tmp/biobloom_ray_pages",
               n_files: int = 16) -> str:
    """Materialize (once) a deterministic pages table as a directory of
    parquet shards; returns the directory path.  Used by bench/tests."""
    d = os.path.join(cache_dir, f"pages_v2_n{n_rows}_s{seed}")
    marker = os.path.join(d, "_complete")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    table = generate_pages(n_rows, seed)
    per = max(n_rows // n_files, 1)
    for i in range(0, n_files):
        lo = i * per
        hi = n_rows if i == n_files - 1 else min((i + 1) * per, n_rows)
        if lo >= hi:
            break
        pq.write_table(table.slice(lo, hi - lo),
                       os.path.join(d, f"part-{i:04d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return d
