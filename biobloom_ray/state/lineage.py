"""Per-partition lineage + checkpoint manifests (BASELINE requirement:
a killed job resumes without recomputing finished partitions).

Output layout (SURVEY.md §4 "Checkpoint / resume"):

    <out>/part=<i>/...parquet        partition output (written to part=<i>.tmp/,
                                     one dir rename publishes it atomically)
    <out>/part=<i>/_lineage.json     manifest: inputs, row counts, metrics,
                                     optional sketch-state blob path

A resumed run lists completed partitions (manifest present and marked
complete) and skips them.  The reference has no checkpointing at all —
any I/O error exits (``BioBloomClassifier.cpp:54-57``); this module is
the scale-hardening the Ray rebuild adds.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field


MANIFEST_NAME = "_lineage.json"


@dataclass
class PartitionManifest:
    partition: int
    inputs: list = field(default_factory=list)   # input fragment paths/ranges
    row_count: int = 0
    metrics: dict = field(default_factory=dict)  # e.g. wall_s, labels histogram
    sketch_blobs: list = field(default_factory=list)  # artifact paths
    complete: bool = False
    schema_fingerprint: str = ""


def partition_dir(out_dir: str, partition: int) -> str:
    return os.path.join(out_dir, f"part={partition}")


def write_manifest(out_dir: str, manifest: PartitionManifest) -> str:
    pdir = partition_dir(out_dir, manifest.partition)
    os.makedirs(pdir, exist_ok=True)
    payload = dict(asdict(manifest))
    payload["written_at"] = time.time()
    path = os.path.join(pdir, MANIFEST_NAME)
    fd, tmp = tempfile.mkstemp(dir=pdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def read_manifest(out_dir: str, partition: int) -> PartitionManifest | None:
    path = os.path.join(partition_dir(out_dir, partition), MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    d.pop("written_at", None)
    return PartitionManifest(**d)


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        try:
            i = int(name.split("=", 1)[1])
        except ValueError:
            continue
        m = read_manifest(out_dir, i)
        if m is not None and m.complete:
            done.add(i)
    return done
