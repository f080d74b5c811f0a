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
# empty-partition join guard
# ---------------------------------------------------------------------------
# Ray 2.49's hash-join aggregator builds each partition's side from the
# shards it received; a partition that received NO rows for one side
# yields a zero-column table and acero raises "No match or multiple
# matches for key field ... on right side" — any inner join whose
# small side doesn't hash into every partition fails (e.g. a filtered
# vocabulary with a handful of survivors over 2+ partitions).  For an
# INNER join an empty side means zero output rows, so the patched
# finalize short-circuits to an empty block (Ray's block union skips
# schema-less empties); non-inner joins keep the stock behavior.
# CALLER CAVEAT: if one side is empty in EVERY partition (a fully
# empty join input) the whole result is schema-less — a caller that
# column-selects the output must restore its expected columns on an
# empty frame (see source_quality_gate).


try:
    import ray as _ray_ver_mod
    from ray.data._internal.execution.operators import join as _join_mod

    # Pin the internals this patch targets: the Ray minor version the
    # guard was written against AND the attributes finalize() touches.
    # A future Ray refactor must fail LOUDLY (warning + stock classes),
    # not silently drop the guard that callers like source_quality_gate
    # rely on to survive sparse inner-join partitions.
    _PATCH_TESTED_RAY = ("2.49",)
    if not any(_ray_ver_mod.__version__.startswith(v + ".") or
               _ray_ver_mod.__version__ == v for v in _PATCH_TESTED_RAY):
        raise RuntimeError(
            f"ray {_ray_ver_mod.__version__} not in tested set "
            f"{_PATCH_TESTED_RAY}")
    import inspect as _inspect
    _src = _inspect.getsource(_join_mod.JoiningShuffleAggregation)
    for _attr in ("_get_partition_builder", "_join_type",
                  "_left_key_col_names", "_right_key_col_names",
                  "_left_columns_suffix", "_right_columns_suffix"):
        if _attr not in _src:
            raise RuntimeError(f"JoiningShuffleAggregation lost {_attr}")
    if not hasattr(_join_mod, "_JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP"):
        raise RuntimeError("join verb map moved")

    class _GuardedJoinAggregation(_join_mod.JoiningShuffleAggregation):
        """JoiningShuffleAggregation whose finalize tolerates a
        schema-less (never-fed) partition side on inner joins."""

        def finalize(self, partition_id):
            left = self._get_partition_builder(
                input_seq_id=0, partition_id=partition_id).build()
            right = self._get_partition_builder(
                input_seq_id=1, partition_id=partition_id).build()
            if ((left.num_columns == 0 or right.num_columns == 0)
                    and str(getattr(self, "_join_type", ""))
                    .lower().endswith("inner")):
                return pa.table({})
            verb = _join_mod._JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP[
                self._join_type]
            return left.join(
                right, join_type=verb,
                keys=list(self._left_key_col_names),
                right_keys=list(self._right_key_col_names),
                left_suffix=self._left_columns_suffix,
                right_suffix=self._right_columns_suffix)

    # The JoinOperator factory lambda resolves this NAME at call time
    # and cloudpickles the captured class BY REFERENCE to this module,
    # which worker processes can import — so the guard reaches the
    # aggregator actors, unlike an in-place method patch.
    _join_mod.JoiningShuffleAggregation = _GuardedJoinAggregation
except Exception as _patch_err:  # pragma: no cover - future Ray refactors
    import warnings as _warnings
    _warnings.warn(
        "biobloom_ray: empty-partition inner-join guard NOT applied "
        f"({_patch_err!r}); sparse inner-join partitions may raise "
        "acero 'No match ... for key field' — re-validate the patch "
        "against this Ray version (biobloom_ray/io.py)",
        RuntimeWarning)


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
