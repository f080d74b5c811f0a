"""Skew handling: salted repartition for giant hosts (SURVEY.md §4,
BASELINE "skew from giant hosts is handled with salted repartitioning").

A Common-Crawl-style corpus is Zipf-skewed by host: one hot host can
dominate a partition and serialize any per-host stage.  The fix is to
key on ``hash(host) XOR salt(row mod S)`` so each hot host spreads over
S sub-buckets, then hash-repartition on that key.  Downstream per-host
aggregations pre-aggregate per (host, salt) and re-reduce per host — a
two-level tree that keeps the hot key parallel until the final tiny
combine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from biobloom_ray.hashing import U64, hash_strings, splitmix64


def extract_host(batch: pa.Table, url_col: str = "url") -> pa.Array:
    """host part of an URL column (scheme://HOST/...)."""
    m = pc.extract_regex(batch[url_col], pattern=r"^[a-z]+://(?P<host>[^/]+)")
    return pc.struct_field(m, "host")


def add_salted_key(batch: pa.Table, url_col: str = "url",
                   num_salts: int = 16, num_buckets: int = 256) -> pa.Table:
    """Append ``host``, ``salt`` and the shuffle key ``bucket`` =
    (hash(host) ^ splitmix(row_index mod S)) mod B."""
    host = extract_host(batch, url_col)
    hh = hash_strings(host)
    salt_idx = (np.arange(len(batch), dtype=np.int64) % num_salts)
    with np.errstate(over="ignore"):
        salted = hh ^ splitmix64(salt_idx.astype(U64))
        bucket = (salted % U64(num_buckets)).astype(np.int64)
    out = batch.append_column("host", host)
    out = out.append_column("salt", pa.array(salt_idx))
    return out.append_column("bucket", pa.array(bucket))


def salted_repartition(ds, url_col: str = "url", num_salts: int = 16,
                       num_blocks: int | None = None):
    """Spread hot hosts across blocks KEYED on the salted bucket: add
    the key, then range-partition on it (``sort`` — Ray Data's keyed
    exchange), so each (host, salt) sub-bucket lands contiguously and a
    hot host occupies ``num_salts`` separate block ranges instead of
    one.  Use before any per-host stage.  (A plain shuffle repartition
    would spread rows but NOT co-locate by the key — downstream
    per-bucket stages would shuffle again.)"""
    keyed = ds.map_batches(
        lambda b: add_salted_key(b, url_col, num_salts),
        batch_format="pyarrow").sort("bucket")
    if num_blocks:
        return keyed.repartition(num_blocks)
    return keyed


def per_host_counts(ds, url_col: str = "url", num_salts: int = 16):
    """Demonstration of the two-level skew-safe aggregation: count pages
    per host via (host, salt) partials → per-host sum."""
    from ray.data.aggregate import Count, Sum

    keyed = ds.map_batches(
        lambda b: add_salted_key(b, url_col, num_salts),
        batch_format="pyarrow").select_columns(["host", "salt"])
    partial = keyed.groupby(["host", "salt"]).aggregate(Count(alias_name="n"))
    return partial.groupby("host").aggregate(Sum("n", alias_name="n_pages"))


def salted_value_counts(ds, key_col: str, num_salts: int = 16,
                        alias: str = "n"):
    """Generic two-level skew-safe COUNT per key (the per_host_counts
    shape for any key column): partials per (key, salt) keep a hot key
    parallel across ``num_salts`` reducers, the per-key re-reduce sums
    ``num_salts`` rows per key.  Exact counts — salting is invisible in
    the result (oracle-checkable)."""
    from ray.data.aggregate import Count, Sum

    def add_salt(b: pa.Table) -> pa.Table:
        salt = np.arange(len(b), dtype=np.int64) % num_salts
        return pa.table({key_col: b[key_col], "salt": pa.array(salt)})

    partial = (ds.map_batches(add_salt, batch_format="pyarrow")
               .groupby([key_col, "salt"])
               .aggregate(Count(alias_name="_n")))
    return partial.groupby(key_col).aggregate(Sum("_n", alias_name=alias))
