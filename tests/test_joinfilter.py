"""Runtime Bloom join filter: no false negatives ever, exact query
results even at forced ~1.0 FPR, word-exact partial merge."""

import numpy as np
import pyarrow as pa

import ray.data


def test_no_false_negatives_and_merge_associative(ray_session):
    from biobloom_ray.stages.joinfilter import (bloom_semi_filter,
                                                build_key_bloom,
                                                int_key_hashes)

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=5000, dtype=np.int64)
    small = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    bf = build_key_bloom(small, "k", expected=5000, fpr=0.01)
    # every inserted key must probe true (Bloom contract: no FN)
    assert bf.contains(*int_key_hashes(keys)).all()
    # repartitioning must not change a single filter word
    bf2 = build_key_bloom(small.repartition(7), "k", expected=5000,
                          fpr=0.01)
    assert (bf.words == bf2.words).all()
    # probe side keeps all true matches
    probe_keys = np.concatenate([keys[:100],
                                 rng.integers(1 << 41, 1 << 42,
                                              size=10000)])
    probe = ray.data.from_arrow(pa.table({"k": pa.array(probe_keys)}))
    kept = bloom_semi_filter(probe, "k", bf).to_pandas()["k"].to_numpy()
    assert np.isin(keys[:100], kept).all()
    # and drops the bulk of the non-matching majority
    assert len(kept) < 100 + 0.05 * 10000


def test_segment_topk_exact_under_forced_fp_bloom(ray_session,
                                                  monkeypatch):
    """Force the runtime filter into a useless ~1.0-FPR regime (1-bit
    worth of filter): the query result must not change — FPs die in
    the hash join, so the Bloom is purely a pruning hint."""
    import biobloom_ray.pipelines.analytics as A
    import biobloom_ray.stages.joinfilter as JF

    sf = "/root/testdata/sf0.01"
    want = A.segment_revenue_topk(sf)

    monkeypatch.setattr(A, "SEGMENT_BROADCAST_MAX_ROWS", 0)
    got_cluster = A.segment_revenue_topk(sf)
    assert want.equals(got_cluster[list(want.columns)])

    real_build = JF.build_key_bloom

    def tiny_bloom(ds, col, expected, fpr=0.01, hash_num=3):
        return real_build(ds, col, expected=1, fpr=0.99, hash_num=1)

    monkeypatch.setattr(JF, "build_key_bloom", tiny_bloom)
    monkeypatch.setattr(A, "build_key_bloom", tiny_bloom, raising=False)
    got_fp = A.segment_revenue_topk(sf)
    assert want.equals(got_fp[list(want.columns)])
