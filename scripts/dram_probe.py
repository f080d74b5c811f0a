"""Attribution experiment for the 8->32 scaling-efficiency gap
(VERDICT r3 #7): is it the engine, or the one-box memory subsystem?

Runs the categorize hot kernel -- Bloom `contains` probes over a
DRAM-resident filter bank -- at 1-, 8- and 32-way process concurrency
with NO Ray in the loop (plain multiprocessing, one private filter per
process), next to a cache-resident arithmetic control kernel of similar
FLOP count.  If per-process throughput of the probe kernel degrades at
32-way while the in-cache control holds ~1.0, the gap is DRAM
bandwidth shared across the "nodes" of this single-box sandbox -- a
term a real 4N-NODE cluster does not have (each node brings its own
memory controllers) -- and not scheduler/shuffle overhead.

Usage: python scripts/dram_probe.py          (~2-3 min)
Writes one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M_BITS = 1 << 27          # 16 MiB filter -> far beyond L3 share at 32-way
N_HASH = 1 << 21          # 2M probe hashes per iteration
ITERS = 6                 # timed iterations per worker (median taken)
CACHE_KB = 24             # control kernel working set (L1/L2-resident)


def probe_worker(seed: int) -> float:
    """Median seconds per Bloom-probe iteration (private 16 MiB filter,
    2M random 2-hash probes -- the categorize hot loop's shape)."""
    from biobloom_ray.sketches.bloom import BloomFilter

    rng = np.random.default_rng(seed)
    bf = BloomFilter(m=M_BITS, hash_num=2, kmer_size=8)
    h1 = rng.integers(0, 1 << 63, size=N_HASH, dtype=np.uint64)
    h2 = rng.integers(1, 1 << 62, size=N_HASH, dtype=np.uint64) | 1
    bf.insert(h1[: N_HASH // 4], h2[: N_HASH // 4])
    times = []
    for _ in range(ITERS):
        t = time.perf_counter()
        bf.contains(h1, h2)
        times.append(time.perf_counter() - t)
    return float(np.median(times))


def control_worker(seed: int) -> float:
    """Median seconds per in-cache arithmetic iteration (same call
    structure, working set ~CACHE_KB so DRAM is not touched)."""
    rng = np.random.default_rng(seed)
    x = rng.random(CACHE_KB * 1024 // 8)
    times = []
    for _ in range(ITERS):
        t = time.perf_counter()
        acc = x
        for _ in range(400):
            acc = acc * 1.0000001 + 0.5
        float(acc[0])
        times.append(time.perf_counter() - t)
    return float(np.median(times))


def run_level(fn, n_procs: int) -> float:
    """Median per-process iteration seconds at n_procs concurrency."""
    with mp.get_context("spawn").Pool(n_procs) as pool:
        res = pool.map(fn, range(n_procs))
    return float(np.median(res))


def main():
    out = {"m_bits": M_BITS, "n_hash": N_HASH, "iters": ITERS,
           "cache_kb": CACHE_KB, "protocol":
           "per-process median iteration time at 1/8/32-way process "
           "concurrency, interleaved rounds, no Ray; slowdown_X = "
           "time@X / time@1 (1.0 = perfect per-core isolation)"}
    rounds = {1: [], 8: [], 32: []}
    ctl = {1: [], 8: [], 32: []}
    for _ in range(3):
        for n in (1, 8, 32):            # interleave within each round
            rounds[n].append(run_level(probe_worker, n))
            ctl[n].append(run_level(control_worker, n))
    for n in (1, 8, 32):
        out[f"probe_sec_{n}"] = round(min(rounds[n]), 4)
        out[f"control_sec_{n}"] = round(min(ctl[n]), 4)
    for n in (8, 32):
        out[f"probe_slowdown_{n}"] = round(
            out[f"probe_sec_{n}"] / out["probe_sec_1"], 3)
        out[f"control_slowdown_{n}"] = round(
            out[f"control_sec_{n}"] / out["control_sec_1"], 3)
    out["implied_8_32_efficiency_from_probe"] = round(
        out["probe_slowdown_8"] / out["probe_slowdown_32"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
