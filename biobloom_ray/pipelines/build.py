"""biobloommaker analogue: build mergeable Bloom filters from a Dataset.

Pipeline shape (SURVEY.md §3.1):
    read → [pre-pass: Σ(len−k+1) per filter_id]        (A1, tiny result)
         → map_batches(PartialBloomBuilder)            (partial per block)
         → groupby("filter_id").map_groups(merge)      (tiny shuffle: blobs)
         → artifacts + info sidecars

The input is any Ray Dataset with a text column; ``label_col`` selects
which filter each row feeds (one filter per distinct label, built in a
single pass — the multi-`-f` maker).  ``label_col=None`` builds one
filter named ``filter_id``.
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data

from biobloom_ray.config import BuildConfig
from biobloom_ray.sketches.bloom import BloomFilter
from biobloom_ray.sketches.hll import HLL
from biobloom_ray.stages.build import (
    PartialBloomBuilder,
    compute_sizes,
    expected_entries_batch,
    merge_partials_group,
)


def expected_entries(ds: "ray.data.Dataset", text_col: str, k: int,
                     label_col: str | None = None,
                     normalize: bool = True) -> dict[str, int]:
    """Pre-pass (A1, ``BloomFilterGenerator.h:108-141``): total shingle
    frames per filter id, counted on the same normalized-UTF-8-byte
    representation the builder hashes.  Column-pruned read + per-block
    partial sums → the groupby only moves one row per (block, label)."""
    cols = [text_col] + ([label_col] if label_col else [])
    partials = (ds.select_columns(cols)
                .map_batches(lambda b: expected_entries_batch(
                    b, text_col, k, label_col, normalize=normalize),
                             batch_format="pyarrow")
                .groupby("filter_id").sum("frames"))
    return {r["filter_id"]: int(r["sum(frames)"]) for r in partials.take_all()}


def build_filters(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    label_col: str | None = None,
    cfg: BuildConfig | None = None,
    filter_id: str = "__all__",
    normalize: bool = True,
    with_hll: bool = True,
) -> dict[str, dict]:
    """Build one Bloom filter per label (or a single one).

    Returns ``{filter_id: {"filter": BloomFilter, "hll": HLL | None,
    "expected_entries": int}}``.  The final filters are small (sized to
    the reference corpora, not the stream) so they come back to the
    driver for broadcast; at 100 TB the *input* streams through blocks
    and only blobs shuffle.
    """
    cfg = cfg or BuildConfig()
    expected = (dict.fromkeys([filter_id], cfg.expected_entries)
                if (label_col is None and cfg.expected_entries)
                else expected_entries(ds, text_col, cfg.kmer_size, label_col,
                      normalize=normalize))
    if label_col is None and "__all__" in expected and filter_id != "__all__":
        expected[filter_id] = expected.pop("__all__")
    sizes = compute_sizes(expected, cfg)

    cols = [text_col] + ([label_col] if label_col else [])
    builder = PartialBloomBuilder(
        sizes=sizes, cfg=cfg, text_col=text_col,
        label_col=label_col, normalize=normalize, with_hll=with_hll)
    if label_col is None:
        # single filter: rename the builder's group key afterwards
        builder.sizes = {"__all__": sizes.get(filter_id, next(iter(sizes.values())))}
    merged = (ds.select_columns(cols)
              .map_batches(builder, batch_format="pyarrow",
                           batch_size=cfg.batch_size)
              .groupby("filter_id")
              .map_groups(merge_partials_group, batch_format="pandas"))
    out: dict[str, dict] = {}
    for row in merged.take_all():
        bf = BloomFilter.deserialize(row["blob"])
        fid = bf.filter_id if bf.filter_id != "__all__" else filter_id
        bf.filter_id = fid
        hll = HLL.deserialize(row["hll"]) if row["hll"] else None
        # redundancy warning (A3): ratio of redundant to unique shingles
        # minus the expected redundancy FPR — high values suggest the
        # input itself is highly repetitive (BioBloomMaker.cpp:527-540)
        if bf.n_distinct > 0:
            from biobloom_ray.sketches.bloom import calc_redundancy_fpr

            red_fpr = calc_redundancy_fpr(bf.m, bf.n_distinct, bf.hash_num)
            ratio = bf.n_redundant / bf.n_distinct - red_fpr
            if ratio > 0.25:
                import warnings

                warnings.warn(
                    f"filter {fid!r}: redundant/unique shingle ratio "
                    f"{ratio:.2f} exceeds 0.25 — input is highly repetitive "
                    "(reference warning, BioBloomMaker.cpp:527-540)")
        out[fid] = {
            "filter": bf,
            "hll": hll,
            "expected_entries": int(expected.get(row["filter_id"],
                                                 expected.get(fid, 0)) or 0),
        }
    return out
