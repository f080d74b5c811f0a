"""Parquet read helper.

The driver's test parquet carries pandas schema metadata whose nested
dict makes ``hash(pa.Schema)`` raise on this pyarrow version; Ray Data
hashes schemas to dedup them when unioning block metadata, so every
pipeline over a raw read spams "Failed to hash the schemas" warnings.
Stripping the metadata at the read (a zero-copy table rewrap that fuses
into the next map stage) fixes the noise at the source.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _strip_meta(batch: pa.Table) -> pa.Table:
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def read_parquet(paths, columns=None, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with schema metadata stripped from every
    block (column pruning still pushes down to the parquet reader)."""
    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(_strip_meta, batch_format="pyarrow")
