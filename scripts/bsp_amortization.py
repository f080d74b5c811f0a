"""BSP amortization evidence for the dup_clusters family (VERDICT r4 #6).

The round-4 verdict accepted the claim that the BSP label-propagation
trio's ~60 s forced-cluster wall on the 500-doc fixture is per-round
FIXED cost (Dataset operator setup) that amortizes once rounds are
data-bound — but asked for a measurement.  This script produces it:
it runs the forced-cluster (gate-zeroed) ``dup_clusters`` BSP loop on
the sf0.01 fixture (500 docs) and on a deterministic synthetic
documents table at larger scales (100k / 1M docs with planted
duplicate pairs), recording per-round wall via
``analytics.DUPC_ROUND_LOG``.  If per-round wall grows far slower
than the corpus (e.g. ~2000x docs -> low-single-digit x per round),
the fixed-cost attribution stands.

Usage: python scripts/bsp_amortization.py [n_docs ...]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CACHE = "/tmp/biobloom_bsp_amort"


def synth_documents(n_docs: int, dup_pct: float = 0.04,
                    seed: int = 7) -> str:
    """Deterministic documents table with ``dup_pct`` of docs planted
    as near-identical pairs (each pair shares every 30-char gram), the
    rest drawn from a 50k-word vocab so random docs share no 30-gram.
    Cached under /tmp; returns the directory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(CACHE, f"docs_n{n_docs}_p{dup_pct}_s{seed}")
    marker = os.path.join(d, "_complete")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(np.random.PCG64(seed))
    vocab = np.array([f"w{i:05d}" for i in range(50_000)], dtype=object)
    n_pairs = int(n_docs * dup_pct / 2)
    n_base = n_docs - n_pairs  # pair twins copy a base doc's text
    words_per = 25
    picks = rng.integers(0, len(vocab), size=(n_base, words_per))
    texts = np.array([" ".join(vocab[r]) for r in picks], dtype=object)
    # plant: docs n_base..n_docs duplicate the first n_pairs texts
    dup_texts = texts[:n_pairs].copy()
    all_texts = np.concatenate([texts, dup_texts])
    ids = np.arange(n_docs, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(all_texts.tolist(), pa.string())})
    # a DIRECTORY named documents.parquet so analytics._read's
    # "{sf_dir}/documents.parquet" path resolves to the shard set
    tdir = os.path.join(d, "documents.parquet")
    os.makedirs(tdir, exist_ok=True)
    n_files = max(1, min(32, n_docs // 20_000))
    per = -(-n_docs // n_files)
    for i in range(n_files):
        lo = i * per
        hi = min(n_docs, lo + per)
        if lo >= hi:
            break
        pq.write_table(tbl.slice(lo, hi - lo),
                       os.path.join(tdir, f"part-{i:04d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return d


def run_one(label: str, sf_dir: str) -> dict:
    import biobloom_ray.pipelines.analytics as A
    import time

    A.DUPC_DRIVER_MAX_ROWS = 0  # force the cluster BSP path
    A.DUPC_ROUND_LOG = []
    t0 = time.perf_counter()
    out = A.dup_clusters(sf_dir)
    wall = round(time.perf_counter() - t0, 2)
    log = A.DUPC_ROUND_LOG
    A.DUPC_ROUND_LOG = None
    per_round = [w for _, w in log]
    return {"label": label, "n_dup_docs": int(len(out)),
            "rounds": len(per_round),
            "per_round_s": per_round,
            "mean_round_s": round(sum(per_round) / max(len(per_round),
                                                       1), 3),
            "total_s": wall}


def main():
    import ray

    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    results = [run_one("sf0.01 fixture (500 docs)",
                       "/root/testdata/sf0.01")]
    for n in sizes:
        results.append(run_one(f"synthetic {n} docs",
                               synth_documents(n)))
    print(json.dumps({"metric": "dup_clusters BSP per-round wall",
                      "runs": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
