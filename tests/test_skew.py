"""Salted-repartition skew handling (SURVEY §4, BASELINE requirement)."""

import numpy as np
import pytest

import ray.data

from biobloom_ray.pages import generate_pages
from biobloom_ray.stages.skew import add_salted_key, per_host_counts, salted_repartition


@pytest.fixture(scope="module")
def pages(ray_session):
    return ray.data.from_arrow(generate_pages(3000, seed=42))


def test_salted_key_spreads_hot_host():
    import pyarrow as pa

    # degenerate skew: 1000 rows on one host, 500 spread elsewhere
    urls = [f"https://megahost.example/p/{i}" for i in range(1000)] + \
           [f"https://host{i % 50:04d}.example/p/{i}" for i in range(500)]
    tbl = pa.table({"url": pa.array(urls)})
    keyed = add_salted_key(tbl, num_salts=16, num_buckets=64)
    df = keyed.to_pandas()
    hot_rows = df[df.host == "megahost.example"]
    assert len(hot_rows) == 1000
    # the hot host spreads across exactly its num_salts sub-buckets
    assert hot_rows.bucket.nunique() >= 12
    assert hot_rows.bucket.value_counts().max() <= 1000 / 8


def test_per_host_counts_correct(pages):
    out = per_host_counts(pages).to_pandas()
    df = generate_pages(3000, seed=42).to_pandas()
    import re

    truth = (df.url.str.extract(r"^[a-z]+://([^/]+)")[0]
             .value_counts().sort_index())
    got = out.set_index("host")["n_pages"].sort_index()
    assert got.equals(truth.rename_axis("host"))


def test_salted_repartition_balances_blocks(pages):
    ds = salted_repartition(pages, num_blocks=8)
    sizes = [len(b) for b in ds.iter_batches(batch_size=None,
                                             batch_format="pyarrow")]
    assert sum(sizes) == 3000
