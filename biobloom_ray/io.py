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

# See module docstring: filter the schema-hash warning at its source
# module (message-targeted Filter, installed by the package __init__ —
# importing it here guarantees the filter is active wherever io is
# used); real errors and unrelated warnings still surface.
import biobloom_ray  # noqa: F401  (installs the _SchemaHashNoise filter)


def read_parquet(paths, columns=None, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet``.  (A dedicated metadata-strip stage was
    tried and reverted: it cannot fuse with the read operator, and one
    extra task hop per block costs more than the warning it silenced —
    the targeted logging filter is the whole fix.)"""
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def cheap_count(ds) -> int | None:
    """Row count ONLY when it is metadata-cheap (pure Read / in-memory
    input, no transform chain to execute); None otherwise.  Used to gate
    small-scale driver fast paths without ever paying an extra pipeline
    execution for the decision."""
    try:
        dag = ds._logical_plan.dag
        if type(dag).__name__ in ("Read", "InputData", "FromArrow",
                                  "FromPandas", "FromNumpy", "FromItems"):
            return ds.count()
    except Exception:
        pass
    return None


# ---------------------------------------------------------------------------
# hash-join sizing
# ---------------------------------------------------------------------------
# Ray's hash shuffle reserves one aggregator ACTOR per partition for the
# lifetime of the pipeline (default 1 CPU each) — chained joins on a
# small cluster deadlock if partitions ≈ CPUs.  Size partitions to a
# fraction of the cores and reserve fractional CPUs per aggregator so
# map tasks always make progress.
_AGG_REMOTE_ARGS = {"num_cpus": 0.25}


def cluster_cpus() -> int:
    import ray
    return int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8


def auto_partitions(num_partitions=None) -> int:
    if num_partitions:
        return num_partitions
    return max(2, cluster_cpus() // 4)


def hash_join(left, right, on, right_on=None, num_partitions=None,
              left_suffix=None, right_suffix=None, join_type="inner"):
    """``Dataset.join`` with deadlock-safe partition/actor sizing."""
    return left.join(right, join_type,
                     num_partitions=auto_partitions(num_partitions),
                     on=on, right_on=right_on, left_suffix=left_suffix,
                     right_suffix=right_suffix,
                     aggregator_ray_remote_args=dict(_AGG_REMOTE_ARGS))
