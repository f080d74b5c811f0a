"""Resumable partitioned categorize run (BASELINE requirement: a killed
job resumes from per-partition lineage/sketch checkpoints without
recomputing finished partitions — SURVEY.md §4).

Unit of resume = one input parquet fragment (the natural shard of a
Common-Crawl-style layout).  Each partition writes its labeled output
under ``<out>/part=<i>/`` atomically and then its ``_lineage.json``
manifest; a partition whose manifest says ``complete`` is skipped on
re-run.  Because every UDF is deterministic (fixed hash seeds), a resume
produces byte-identical rows to an uninterrupted run.

This is a deliberate driver-side loop over partitions (not one big
Dataset): the loop IS the checkpoint boundary.  Within a partition the
work is still a streaming Ray Data pipeline, so each partition scales
out across the cluster; at 10^12 pages you'd raise the partition
granularity to directory-level shards.
"""

from __future__ import annotations

from biobloom_ray.io import read_parquet as _rp
import glob
import os
import time

import ray.data

from biobloom_ray.config import CategorizeConfig
from biobloom_ray.pipelines.categorize import categorize
from biobloom_ray.state.lineage import (
    PartitionManifest,
    completed_partitions,
    partition_dir,
    write_manifest,
)


def input_fragments(input_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def run_partitioned_categorize(
    input_dir: str,
    out_dir: str,
    bank,
    cfg: CategorizeConfig | None = None,
    text_col: str = "text",
    max_partitions: int | None = None,
    fail_after: int | None = None,
) -> dict:
    """Categorize every input fragment, checkpointing per partition.

    ``max_partitions`` / ``fail_after`` exist for the kill/resume tests:
    processing stops (as if the job died) after that many NEW partitions.
    Returns ``{"completed": [...], "skipped": [...], "rows": int}``.
    """
    cfg = cfg or CategorizeConfig()
    frags = input_fragments(input_dir)
    done = completed_partitions(out_dir)
    completed, skipped = [], []
    total_rows = 0
    fresh = 0
    for i, frag in enumerate(frags):
        if max_partitions is not None and i >= max_partitions:
            break
        if i in done:
            skipped.append(i)
            continue
        if fail_after is not None and fresh >= fail_after:
            break
        t0 = time.perf_counter()
        ds = _rp(frag)
        labeled = categorize(ds, bank, cfg, text_col=text_col)
        pdir = partition_dir(out_dir, i)
        # crash-atomic partition output: stream into part=<i>.tmp/, then
        # a single directory rename publishes it.  A kill mid-write
        # leaves only the tmp dir (removed on retry), so a re-run can
        # never mix new files with a crashed attempt's partials, and a
        # published partition is always complete even before its
        # manifest lands.
        tmpdir = pdir + ".tmp"
        if os.path.isdir(tmpdir):
            import shutil
            shutil.rmtree(tmpdir)
        if os.path.isdir(pdir):
            # data published but manifest missing (killed between rename
            # and manifest write): the data is complete — reuse it
            pass
        else:
            os.makedirs(tmpdir, exist_ok=True)
            labeled.write_parquet(tmpdir)
            os.rename(tmpdir, pdir)
        n_rows = _rp(pdir).count()
        write_manifest(out_dir, PartitionManifest(
            partition=i,
            inputs=[frag],
            row_count=int(n_rows),
            metrics={"wall_s": round(time.perf_counter() - t0, 3)},
            complete=True,
        ))
        completed.append(i)
        total_rows += int(n_rows)
        fresh += 1
    return {"completed": completed, "skipped": skipped, "rows": total_rows}
