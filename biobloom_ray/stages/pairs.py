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


def pair_up(ds, header_col: str = "url", text_col: str = "text",
            order_col: str | None = None):
    """Re-unite mates by pair key: one output row per matched pair with
    ``text_1``/``text_2`` columns; unmatched mates are dropped (the
    reference leaves them in its buffer forever).

    Shape: split the stream by mate number (two cheap filters on the
    same scan) and HASH-JOIN the halves on ``pair_key`` — one shuffle,
    zero per-group Python (round-2 rewrite of the per-pair
    ``map_groups``).

    Duplicate-header semantics (ADVICE r2): by default headers are
    assumed unique per mate, like the reference's mate cache — a
    duplicated header fans out to all mate-1 × mate-2 combinations.
    Pass ``order_col`` (e.g. a record number) to reproduce the
    reference's keep-FIRST behavior (``BioBloomClassifier.cpp:512-522``:
    the cache keeps the first record per header): each side dedups to
    the min-``order_col`` row per pair key before the join.  A stream
    has no global order without such a column, so keep-first is only
    defined when the caller provides one."""
    from biobloom_ray.io import hash_join

    keyed = ds.map_batches(lambda b: add_pair_key(b, header_col),
                           batch_format="pyarrow")

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
