from biobloom_ray.state.artifacts import load_filter, load_filter_bank, save_filter
from biobloom_ray.state.lineage import (
    PartitionManifest,
    completed_partitions,
    partition_dir,
    write_manifest,
)

__all__ = [
    "save_filter", "load_filter", "load_filter_bank",
    "PartitionManifest", "write_manifest", "completed_partitions",
    "partition_dir",
]
