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


def pair_up(ds, header_col: str = "url", text_col: str = "text"):
    """Self-join on the pair key: one output row per matched pair with
    ``text_1``/``text_2`` columns; unmatched mates are dropped (the
    reference leaves them in its buffer forever)."""
    keyed = ds.map_batches(lambda b: add_pair_key(b, header_col),
                           batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("mate")
        m1 = g[g["mate"] == "1"]
        m2 = g[g["mate"] == "2"]
        if len(m1) == 0 or len(m2) == 0:
            return pd.DataFrame({"pair_key": pd.Series(dtype="object"),
                                 "text_1": pd.Series(dtype="object"),
                                 "text_2": pd.Series(dtype="object")})
        return pd.DataFrame({"pair_key": [g["pair_key"].iloc[0]],
                             "text_1": [m1[text_col].iloc[0]],
                             "text_2": [m2[text_col].iloc[0]]})

    return keyed.groupby("pair_key").map_groups(combine, batch_format="pandas")
