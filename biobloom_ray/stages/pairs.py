"""Smart-pair mate matching (T7/J3) and the pair-key extractor (M6).

Reference: interleaved "smart pair" files buffer unmatched mates in an
unbounded ``unordered_map<header, FaRec>`` (``BioBloomClassifier.cpp:469,
512-522``); the pair key is the header with a trailing ``/1``/``/2``
digit stripped (``:500-503``).  The Ray rebuild replaces the in-memory
mate cache with a ``groupby(pair_key)`` hash shuffle — bounded memory,
any input order.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def add_pair_key(batch: pa.Table, header_col: str = "url") -> pa.Table:
    """M6: strip a trailing ``/1`` or ``/2`` to form the mate key."""
    key = pc.replace_substring_regex(batch[header_col],
                                     pattern=r"/[12]$", replacement="")
    mate = pc.extract_regex(batch[header_col], pattern=r"/(?P<mate>[12])$")
    mate_num = pc.struct_field(mate, "mate")
    return (batch.append_column("pair_key", key)
                 .append_column("mate", mate_num))


#: input-row gate for the broadcast mate-cache tier: below it, the /2
#: side collects once and broadcasts (the distributed analogue of the
#: reference's in-memory mate cache); above it the hash join shuffles.
#: The broadcast payload is the mate TEXTS, so the gate is conservative:
#: 100k rows ≈ 100 MB at 1 KB/doc
PAIR_BROADCAST_MAX_ROWS = 100_000


def pair_up(ds, header_col: str = "url", text_col: str = "text",
            order_col: str | None = None, n_rows: int | None = None):
    """Re-unite mates by pair key: one output row per matched pair with
    ``text_1``/``text_2`` columns; unmatched mates are dropped (the
    reference leaves them in its buffer forever).

    Shape, tiered by scale: below ``PAIR_BROADCAST_MAX_ROWS`` input
    rows the /2 mates collect once, sort by key, and broadcast — each
    /1 batch matches by ``searchsorted`` range, which IS the
    reference's in-memory mate cache (``BioBloomClassifier.cpp:469,
    512-522``) made worker-shared; above the gate the stream splits by
    mate number (two cheap filters on one scan) and the halves
    HASH-JOIN on ``pair_key`` — one shuffle, zero per-group Python.
    Tier-parity is pinned by tests.

    Duplicate-header semantics (ADVICE r2): by default headers are
    assumed unique per mate — a duplicated header fans out to all
    mate-1 × mate-2 combinations (identically on both tiers).  Pass
    ``order_col`` (e.g. a record number) to reproduce the reference's
    keep-FIRST behavior (the cache keeps the first record per header):
    each side dedups to the min-``order_col`` row per pair key before
    the join.  A stream has no global order without such a column, so
    keep-first is only defined when the caller provides one."""
    from biobloom_ray.io import cheap_count, hash_join

    keyed = ds.map_batches(lambda b: add_pair_key(b, header_col),
                           batch_format="pyarrow")

    if n_rows is None:
        # callers with a transformed input can pass n_rows explicitly
        # (cheap_count only trusts pure reads / in-memory inputs)
        n_rows = cheap_count(ds)
    if (order_col is None and n_rows is not None
            and n_rows <= PAIR_BROADCAST_MAX_ROWS):
        import numpy as np

        import ray

        k2_parts, t2_parts = [], []
        for blk in keyed.map_batches(
                lambda b: b.filter(pc.equal(b["mate"], "2")),
                batch_format="pyarrow").iter_batches(
                    batch_size=None, batch_format="pyarrow"):
            k2_parts.append(np.asarray(blk["pair_key"].to_pylist(),
                                       dtype=object))
            t2_parts.append(np.asarray(blk[text_col].to_pylist(),
                                       dtype=object))
        k2 = (np.concatenate(k2_parts) if k2_parts
              else np.empty(0, dtype=object))
        t2 = (np.concatenate(t2_parts) if t2_parts
              else np.empty(0, dtype=object))
        order2 = np.argsort(k2, kind="stable")
        cache_ref = ray.put((k2[order2], t2[order2]))

        def match(b: pa.Table) -> pa.Table:
            import ray as _r
            keys_s, texts_s = _r.get(cache_ref)
            sel = b.filter(pc.equal(b["mate"], "1"))
            k1 = np.asarray(sel["pair_key"].to_pylist(), dtype=object)
            lo = np.searchsorted(keys_s, k1, side="left")
            hi = np.searchsorted(keys_s, k1, side="right")
            counts = hi - lo
            rep = np.repeat(np.arange(len(k1)), counts)
            dst = np.zeros(len(k1) + 1, dtype=np.int64)
            np.cumsum(counts, out=dst[1:])
            take2 = np.repeat(lo - dst[:-1], counts) \
                + np.arange(int(counts.sum()))
            t1 = np.asarray(sel[text_col].to_pylist(), dtype=object)
            return pa.table({
                "pair_key": pa.array(k1[rep], type=pa.large_string()),
                "text_1": pa.array(t1[rep], type=pa.large_string()),
                "text_2": pa.array(texts_s[take2],
                                   type=pa.large_string()),
            })

        return keyed.map_batches(match, batch_format="pyarrow")

    def side(mate: str, out_col: str):
        def pick(b: pa.Table) -> pa.Table:
            sel = b.filter(pc.equal(b["mate"], mate))
            cols = {"pair_key": sel["pair_key"], out_col: sel[text_col]}
            if order_col is not None:
                cols[order_col] = sel[order_col]
            return pa.table(cols)
        s = keyed.map_batches(pick, batch_format="pyarrow")
        if order_col is not None:
            def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
                return g.nsmallest(1, order_col)[["pair_key", out_col]]
            s = s.groupby("pair_key").map_groups(first_per_key,
                                                 batch_format="pandas")
        return s

    return hash_join(side("1", "text_1"), side("2", "text_2"),
                     on=("pair_key",))
