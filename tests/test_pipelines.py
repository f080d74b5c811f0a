"""End-to-end build → categorize tests on deterministic fixtures
(translated from Tests/SystemTests/systemTest.pl per SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from biobloom_ray.config import BuildConfig, CategorizeConfig
from biobloom_ray.pages import generate_pages, generate_ref_corpora
from biobloom_ray.pipelines import build_filters, categorize, expected_entries
from biobloom_ray.stages.categorize import summary_table

K = 8
BUILD_CFG = BuildConfig(kmer_size=K, desired_fpr=0.0078125, batch_size=512)


@pytest.fixture(scope="module")
def corpora_bank(ray_session):
    ref = generate_ref_corpora()
    ds = ray.data.from_arrow(ref)
    built = build_filters(ds, text_col="doc", label_col="filter_id",
                          cfg=BUILD_CFG)
    bank = [built[fid]["filter"] for fid in sorted(built)]
    return built, bank


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    return ray.data.from_arrow(generate_pages(2000, seed=42))


def test_build_per_label_filters(corpora_bank):
    built, bank = corpora_bank
    assert sorted(built) == ["de", "en", "es", "fr"]
    for fid, d in built.items():
        bf = d["filter"]
        assert bf.m % 64 == 0
        assert bf.n_distinct > 0
        # observed FPR within configured bound (BASELINE metric)
        assert bf.fpr_realized() <= 0.0078125 * 1.2
        # HLL distinct estimate close to Bloom's lower-bound counter
        if d["hll"] is not None:
            est = d["hll"].estimate()
            assert est == pytest.approx(bf.n_distinct, rel=0.1)


def test_expected_entries_matches_exact(ray_session):
    ref = generate_ref_corpora(docs_per_lang=5)
    ds = ray.data.from_arrow(ref)
    got = expected_entries(ds, "doc", K, "filter_id")
    pdf = ref.to_pandas()
    for fid, grp in pdf.groupby("filter_id"):
        # normalization is a no-op on these fixtures (already lowercase,
        # single-spaced), so raw lengths give the exact frame count
        want = int((grp["doc"].str.len() - K + 1).clip(lower=0).sum())
        assert got[fid] == want


def test_categorize_std_assigns_langs(corpora_bank, pages_ds):
    _, bank = corpora_bank
    cfg = CategorizeConfig(scoring_method="simple", score_threshold=0.15,
                           mode="std", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds, bank, cfg).to_pandas()
    assert set(labeled.columns) >= {"label", "hit_mask", "score", "lang"}
    # positive pages (non-zz) should overwhelmingly match their own lang
    pos = labeled[labeled.lang != "zz"]
    own = (pos.label == pos.lang) | (pos.label == "multiMatch")
    assert own.mean() > 0.95
    # negative-control pages must essentially never match (FPR gate)
    neg = labeled[labeled.lang == "zz"]
    assert (neg.label == "noMatch").mean() > 0.99


def test_categorize_deterministic(corpora_bank, pages_ds):
    _, bank = corpora_bank
    cfg = CategorizeConfig(mode="std", batch_size=256, concurrency=2)
    a = categorize(pages_ds, bank, cfg).to_pandas().sort_values("url")
    b = categorize(pages_ds, bank, cfg).to_pandas().sort_values("url")
    assert (a.label.values == b.label.values).all()
    assert (a.hit_mask.values == b.hit_mask.values).all()


def test_ordered_mode_priority(corpora_bank, pages_ds):
    built, bank = corpora_bank
    cfg = CategorizeConfig(mode="ordered", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds, bank, cfg).to_pandas()
    # ordered can never produce multiMatch (first match short-circuits,
    # BioBloomClassifier.cpp:1145-1153)
    assert (labeled.label != "multiMatch").all()
    # every row matched in std stays matched in ordered
    std = categorize(pages_ds, bank, CategorizeConfig(mode="std",
                     batch_size=512, concurrency=2)).to_pandas()
    assert ((labeled.label != "noMatch") == (std.label != "noMatch")).all()
    # ordered label = first set bit of std's hit mask
    fids = sorted(built)
    m = std.hit_mask.values.astype(np.uint64)
    has = m != 0
    first_bit = np.zeros(len(m), dtype=np.int64)
    mm = m.copy()
    for i in range(len(fids)):
        first_bit[(mm & np.uint64(1 << i)) != 0] = i
        mm[(mm & np.uint64(1 << i)) != 0] = 0  # keep only first
    want = np.where(has, np.array(fids, dtype=object)[first_bit], "noMatch")
    assert (labeled.label.values == want).all()


def test_besthit_mode(corpora_bank, pages_ds):
    _, bank = corpora_bank
    cfg = CategorizeConfig(mode="besthit", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds, bank, cfg).to_pandas()
    matched = labeled[labeled.label != "noMatch"]
    assert (matched.score > 0).all()
    # besthit assigns non-zz pages to their own lang more often than std
    pos = labeled[(labeled.lang != "zz")]
    assert (pos.label == pos.lang).mean() > 0.9


def test_scores_mode_emits_vector(corpora_bank, pages_ds):
    _, bank = corpora_bank
    cfg = CategorizeConfig(mode="scores", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds.limit(200), bank, cfg).to_pandas()
    assert "scores" in labeled.columns
    assert len(labeled.scores.iloc[0]) == len(bank)


def test_summary_table_shape(corpora_bank, pages_ds):
    _, bank = corpora_bank
    cfg = CategorizeConfig(mode="std", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds, bank, cfg)
    fids = [bf.filter_id for bf in bank]
    summary = summary_table(labeled, fids)
    assert list(summary.columns) == ["filter_id", "hits", "misses", "shared",
                                     "rate_hit", "rate_miss", "rate_shared"]
    assert list(summary.filter_id) == fids + ["multiMatch", "noMatch"]
    total = 2000
    assert (summary.hits + summary.misses == total).all()
    # invariant: unique_i = hits_i - shared_i; sum(unique) + multi + no = total
    uniq = (summary.hits - summary.shared)[:len(fids)].sum()
    multi = summary[summary.filter_id == "multiMatch"].hits.iloc[0]
    no = summary[summary.filter_id == "noMatch"].hits.iloc[0]
    assert uniq + multi + no == total


def test_paired_combinators(corpora_bank, ray_session):
    import pyarrow as pa
    _, bank = corpora_bank
    pages = generate_pages(600, seed=7).to_pandas()
    half = len(pages) // 2
    paired = pa.table({
        "text_1": pages.text[:half].tolist(),
        "text_2": pages.text[half:2 * half].tolist(),
        "lang_1": pages.lang[:half].tolist(),
        "lang_2": pages.lang[half:2 * half].tolist(),
    })
    ds = ray.data.from_arrow(paired)
    and_cfg = CategorizeConfig(mode="std", inclusive=False, batch_size=256,
                               concurrency=2)
    or_cfg = CategorizeConfig(mode="std", inclusive=True, batch_size=256,
                              concurrency=2)
    a = categorize(ds, bank, and_cfg, text_col="text_1",
                   text_col2="text_2").to_pandas()
    o = categorize(ds, bank, or_cfg, text_col="text_1",
                   text_col2="text_2").to_pandas()
    # AND hits are a subset of OR hits, row-wise
    assert ((a.hit_mask.values & ~o.hit_mask.values) == 0).all()
    # rows whose mates are the same lang should AND-match that lang
    same = a[(a.lang_1 == a.lang_2) & (a.lang_1 != "zz")]
    assert ((same.label == same.lang_1) | (same.label == "multiMatch")).mean() > 0.9


def test_subtract_filter(corpora_bank, pages_ds, ray_session):
    built, bank = corpora_bank
    # subtracting a filter from itself: every hit shingle is score-gated →
    # nothing can reach threshold against that filter (J2 anti-join)
    en = [b for b in bank if b.filter_id == "en"][0]
    cfg = CategorizeConfig(mode="std", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds, [en], cfg, subtract=en).to_pandas()
    assert (labeled.label == "noMatch").all()


def test_actor_pool_path_matches_task_path(corpora_bank, pages_ds):
    # cfg.use_actors=True runs the explicit actor pool (T1); results must
    # be identical to the default task path
    _, bank = corpora_bank
    task_cfg = CategorizeConfig(mode="std", batch_size=512)
    actor_cfg = CategorizeConfig(mode="std", batch_size=512,
                                 use_actors=True, concurrency=2)
    a = categorize(pages_ds, bank, task_cfg).to_pandas().sort_values("url")
    b = categorize(pages_ds, bank, actor_cfg).to_pandas().sort_values("url")
    assert (a.label.values == b.label.values).all()
    assert (a.hit_mask.values == b.hit_mask.values).all()


def test_length_scorer_end_to_end(corpora_bank, pages_ds):
    """M11 through the categorize pipeline: threshold = min contiguous
    matched run in chars (SeqEval.h:295-332)."""
    _, bank = corpora_bank
    strict = categorize(pages_ds, bank, CategorizeConfig(
        scoring_method="length", score_threshold=60,
        batch_size=512, concurrency=2)).to_pandas()
    loose = categorize(pages_ds, bank, CategorizeConfig(
        scoring_method="length", score_threshold=20,
        batch_size=512, concurrency=2)).to_pandas()
    # longer required runs can only shrink the matched set
    assert (strict.label != "noMatch").sum() <= (loose.label != "noMatch").sum()
    # golden label behavior for the fixed fixture/seed
    assert (loose.label != "noMatch").sum() > 0
    assert (loose[loose.lang == "zz"].label == "noMatch").mean() > 0.95
    pos = loose[(loose.label != "noMatch") & (loose.label != "multiMatch")]
    # matched single labels overwhelmingly agree with the true lang
    assert (pos.label == pos.lang).mean() > 0.9


def test_emit_matching_streams(corpora_bank, pages_ds):
    """S9 -d/-n emitter (BioBloomClassifier.h:115-142)."""
    from biobloom_ray.stages.categorize import emit_matching

    _, bank = corpora_bank
    cfg = CategorizeConfig(scoring_method="simple", score_threshold=0.15,
                           mode="std", batch_size=512, concurrency=2)
    labeled = categorize(pages_ds, bank, cfg)
    pdf = labeled.to_pandas()
    matched = emit_matching(labeled).to_pandas()
    unmatched = emit_matching(labeled, invert=True).to_pandas()
    assert len(matched) == (pdf.label != "noMatch").sum()
    assert len(unmatched) == (pdf.label == "noMatch").sum()
    assert (matched.label != "noMatch").all()
    # single-filter stream: that filter's labels plus multiMatch rows
    en = emit_matching(labeled, filter_id="en").to_pandas()
    assert set(en.label) <= {"en", "multiMatch"}
    assert len(en) == ((pdf.label == "en") | (pdf.label == "multiMatch")).sum()
    en_only = emit_matching(labeled, filter_id="en", invert=True).to_pandas()
    assert len(en_only) == len(pdf) - len(en)


def test_asof_join_duplicate_ts_deterministic(ray_session, tmp_path):
    """Purchases sharing a (user, ts) must collapse to the MAX value
    before the as-of pick, matching the oracle SQL's GROUP BY (ADVICE
    r2) — regardless of input row order."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biobloom_ray.pipelines.analytics import events_asof_join

    ts = pd.to_datetime(["2026-01-01 10:00", "2026-01-01 10:00",
                         "2026-01-01 10:00", "2026-01-01 11:00"])
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 7], type=pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(["purchase", "purchase", "purchase",
                                "click"]),
        "value": pa.array([5.0, 9.0, 2.0, 0.0]),
    })
    for name, order in (("a", [0, 1, 2, 3]), ("b", [2, 1, 0, 3])):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl.take(order), d / "events.parquet")
        out = events_asof_join(str(d))
        assert len(out) == 1
        assert out.iloc[0].asof_value == 9.0  # MAX among the tied ts


def test_pair_up_keep_first_on_duplicate_headers(ray_session):
    """order_col reproduces the reference mate-cache's keep-first rule
    on dirty input with repeated headers (ADVICE r2); without it the
    documented fan-out applies."""
    import pyarrow as pa

    from biobloom_ray.stages.pairs import pair_up

    tbl = pa.table({
        "url": pa.array(["p1/1", "p1/1", "p1/2", "p1/2"]),
        "text": pa.array(["first1", "second1", "first2", "second2"]),
        "rec": pa.array([0, 1, 2, 3], type=pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    fanout = pair_up(ds).to_pandas()
    assert len(fanout) == 4  # 2 x 2 combinations, as documented
    first = pair_up(ds, order_col="rec").to_pandas()
    assert len(first) == 1
    assert first.iloc[0].text_1 == "first1"
    assert first.iloc[0].text_2 == "first2"


def test_orders_per_nation_tiers_agree(ray_session, monkeypatch):
    """The broadcast map-side join tier and the hash-join tier must
    return identical rollups."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.orders_per_nation(sf)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    slow = A.orders_per_nation(sf)
    f = fast.sort_values("n_name").reset_index(drop=True)
    s = slow.sort_values("n_name").reset_index(drop=True)
    assert f.n_name.tolist() == s.n_name.tolist()
    assert (f.n_orders.to_numpy() == s.n_orders.to_numpy()).all()
    assert (f.total_cents.to_numpy() == s.total_cents.to_numpy()).all()


def test_top_parts_tiers_agree(ray_session, monkeypatch):
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.top_parts_by_revenue(sf)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow = A.top_parts_by_revenue(sf)
    assert fast.l_partkey.tolist() == slow.l_partkey.tolist()
    assert fast.revenue.tolist() == slow.revenue.tolist()


def test_event_rollup_tiers_agree(ray_session, monkeypatch):
    """Driver-combine and native-groupby tiers of the event rollups must
    return identical tables."""
    import biobloom_ray.pipelines.analytics as A
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.01"
    queries = {
        "events_hourly": lambda: A.events_hourly(sf),
        "user_event_counts": lambda: E._user_event_counts(sf),
        "top_users_by_events": lambda: E._top_users_by_events(sf),
        "event_type_daily": lambda: E._event_type_daily(sf),
    }
    fast = {k: f() for k, f in queries.items()}
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow = {k: f() for k, f in queries.items()}
    for k in queries:
        f = fast[k].sort_values(list(fast[k].columns)).reset_index(drop=True)
        s = (slow[k][list(fast[k].columns)]
             .sort_values(list(fast[k].columns)).reset_index(drop=True))
        assert len(f) > 0 and f.equals(s), k


def test_token_rarity_tiers_agree(ray_session, monkeypatch):
    """Broadcast-unigram tier and hash-join tier of token_rarity_scores
    must return identical integer profiles."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.token_rarity_scores(sf)
    monkeypatch.setattr(A, "RARITY_BROADCAST_MAX_ROWS", 0)
    slow = A.token_rarity_scores(sf)
    assert len(fast) > 0
    for c in ("doc_id", "n_tokens", "min_token_cnt", "n_hapax"):
        assert (fast[c].to_numpy() == slow[c].to_numpy()).all(), c


def test_pack_documents_scan_invariants(ray_session):
    """Global prefix-scan packing: every bin's total stays within
    capacity + one max doc (a doc may straddle the boundary since the
    bin is chosen by the EXCLUSIVE cumsum), bins are contiguous in the
    packing order, and a repartitioned input gives the identical
    assignment (the scan is order-defined, not layout-defined)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    cap = 5000
    out = A.pack_documents(sf, capacity_chars=cap)
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    m = out.merge(docs, on="doc_id")
    per_bin = m.groupby("bin").n_chars.sum()
    assert (per_bin.iloc[:-1] >= cap - docs.n_chars.max()).all()
    assert (per_bin <= cap + docs.n_chars.max()).all()
    # bins are contiguous 0..K-1
    assert sorted(m.bin.unique()) == list(range(m.bin.max() + 1))
    # every doc assigned exactly once
    assert len(out) == len(docs)


def test_pack_documents_layout_invariant(ray_session, tmp_path):
    """The scan is order-defined, not layout-defined: packing a
    re-sharded copy of the same table gives the identical assignment."""
    import pyarrow.parquet as pq

    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    base = A.pack_documents(sf, capacity_chars=5000)
    # re-shard the table into 7 uneven files
    t = pq.read_table(f"{sf}/documents.parquet")
    d = tmp_path / "resharded"
    d.mkdir()
    cuts = [0, 11, 60, 200, 210, 350, 480, t.num_rows]
    for i in range(len(cuts) - 1):
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       d / f"documents.parquet" if i == 0 else
                       d / f"part{i}.parquet")
    # pack_documents reads f"{sf_dir}/documents.parquet" — write all
    # shards into one directory under that name instead
    import shutil
    shutil.rmtree(d)
    dd = tmp_path / "documents.parquet"
    dd.mkdir()
    for i in range(len(cuts) - 1):
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       dd / f"part{i}.parquet")
    other = A.pack_documents(str(tmp_path), capacity_chars=5000)
    assert base.doc_id.tolist() == other.doc_id.tolist()
    assert base.bin.tolist() == other.bin.tolist()


def test_source_quality_gate_tiers_agree(ray_session, monkeypatch):
    """Broadcast tier == hash-semi-join tier, and the kept set is
    exactly the docs of sources with Gopher pass rate >= 1/2."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.001"
    fast = A.source_quality_gate(sf)
    monkeypatch.setattr(A, "SRCGATE_BROADCAST_MAX_ROWS", 0)
    slow = A.source_quality_gate(sf)
    pd.testing.assert_frame_equal(fast, slow)

    flags = A.gopher_quality_flags(sf)
    import pyarrow.parquet as pq
    src = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "source"]).to_pandas()
    j = flags.merge(src, on="doc_id")
    rate = j.groupby("source").agg(n=("pass_gopher", "size"),
                                   p=("pass_gopher", "sum"))
    kept_sources = set(rate[2 * rate.p >= rate.n].index)
    expect = src[src.source.isin(kept_sources)].sort_values("doc_id")
    assert fast.doc_id.tolist() == expect.doc_id.tolist()


def test_source_stats_matches_pandas(ray_session):
    import biobloom_ray.pipelines.analytics as A
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = A.source_stats(sf)
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["source", "lang", "n_chars"]).to_pandas()
    exp = t.groupby("source").agg(
        n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"),
        n_langs=("lang", "nunique")).reset_index()
    assert out.source.tolist() == sorted(exp.source.tolist())
    m = out.merge(exp, on="source", suffixes=("", "_e"))
    assert (m.n_docs == m.n_docs_e).all()
    assert (m.sum_chars == m.sum_chars_e).all()
    assert (m.n_langs == m.n_langs_e).all()
    assert np.allclose(m.avg_chars_r6, np.round(m.sum_chars / m.n_docs, 6))


def test_token_freq_histogram_mass_conservation(ray_session):
    """sum(freq * n_tokens) == total token occurrences and
    sum(n_tokens) == vocabulary size."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.001"
    out = A.token_freq_histogram(sf)
    toks = A.token_counts(sf)
    assert (out.freq * out.n_tokens).sum() == toks.n_tokens.sum()
    assert (out.freq >= 1).all()
    assert out.freq.is_monotonic_increasing


def test_inverted_index_postings_sorted_and_banded(ray_session):
    import biobloom_ray.pipelines.analytics as A

    out = A.inverted_index("/root/testdata/sf0.001")
    assert len(out) > 0
    assert (out.df >= A.INVIDX_MIN_DF).all()
    assert (out.df <= A.INVIDX_MAX_DF).all()
    for _, r in out.head(50).iterrows():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == len(set(ids)) == r.df


def test_hash_join_sparse_right_side(ray_session):
    """Inner hash_join whose right side survives filtering with so few
    rows that some hash partitions receive NOTHING: Ray 2.49's stock
    aggregator feeds acero a zero-column table and dies; the
    _GuardedJoinAggregation in biobloom_ray.io must return the correct
    (possibly empty) result instead."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    from biobloom_ray.io import hash_join

    L = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "q"], type=pa.string()),
        "v": pa.array([1, 2, 3, 4], type=pa.int64())}))
    R = (ray.data.from_arrow(pa.table({
            "k": pa.array(["q", "q", "x"], type=pa.string())}))
         .groupby("k").aggregate(Count(alias_name="n"))
         .map_batches(lambda b: b.filter(pc.equal(b["n"], 2)),
                      batch_format="pyarrow"))
    out = hash_join(L, R, on=("k",), num_partitions=4).to_pandas()
    assert out.k.tolist() == ["q"]
    assert out.v.tolist() == [4]

    # fully-empty right side: inner join is simply empty
    R0 = (ray.data.from_arrow(pa.table({
            "k": pa.array(["x"], type=pa.string())}))
          .groupby("k").aggregate(Count(alias_name="n"))
          .map_batches(lambda b: b.filter(pc.equal(b["n"], 99)),
                       batch_format="pyarrow"))
    out0 = hash_join(L, R0, on=("k",), num_partitions=4)
    assert out0.count() == 0


def test_bm25_topk_ranking_and_brute_force(ray_session):
    import re

    import biobloom_ray.pipelines.analytics as A

    out = A.bm25_topk("/root/testdata/sf0.001")
    assert len(out) == A.BM25_TOPK
    # ranking key is (rounded score desc, doc_id asc)
    keys = list(zip(-out.bm25_r6, out.doc_id))
    assert keys == sorted(keys)

    # brute-force recomputation in pandas over the whole fixture
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    toks = docs.text.map(lambda s: re.findall(r"\S+", s))
    dl = toks.map(len).to_numpy()
    N, T = len(docs), int(dl.sum())
    scores = {}
    for term in A.BM25_QUERY_TERMS:
        tf = toks.map(lambda ts: ts.count(term)).to_numpy()
        df = int((tf > 0).sum())
        idf = np.log(2.0 * (N + 1)) - np.log(2.0 * df + 1)
        hit = tf > 0
        contrib = idf * (22.0 * (tf[hit] * T)) / (
            10 * T * tf[hit] + 3 * T + 9 * dl[hit] * N)
        for d, c in zip(docs.doc_id.to_numpy()[hit], contrib):
            scores[d] = scores.get(d, 0.0) + c
    exp = pd.DataFrame({"doc_id": list(scores),
                        "bm25_r6": np.round(list(scores.values()), 6)})
    exp = exp.sort_values(["bm25_r6", "doc_id"],
                          ascending=[False, True]).head(A.BM25_TOPK)
    got = out.set_index("doc_id").bm25_r6
    want = exp.set_index("doc_id").bm25_r6
    assert set(got.index) == set(want.index)
    assert np.allclose(got.sort_index(), want.sort_index(), atol=1e-6)


def test_source_mix_sample_caps_sources(ray_session):
    import biobloom_ray.pipelines.analytics as A

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "source"])
    out = A.source_mix_sample("/root/testdata/sf0.01")
    before = docs.source.value_counts()
    after = out.source.value_counts().reindex(before.index).fillna(0)
    cap = -(-len(docs) // (2 * docs.source.nunique()))
    # under-cap sources are untouched; over-cap sources shrink toward
    # the cap (binomial keep at rate cap/n: mean cap, sd < 16)
    for s in before.index:
        if before[s] <= cap:
            assert after[s] == before[s]
        else:
            assert after[s] < before[s]
            assert abs(after[s] - cap) < 6 * np.sqrt(cap)
    # kept rows are a subset of the input
    assert set(out.doc_id).issubset(set(docs.doc_id))


def test_lang_centroids_matches_local_mean(ray_session):
    import biobloom_ray.pipelines.analytics as A

    out = A.lang_centroids("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "lang"])
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    m = docs.merge(emb, left_on="doc_id", right_on="vec_id")
    for lang, grp in m.groupby("lang"):
        mat = np.stack(grp.embedding.to_numpy()).astype(np.float64)
        want = mat.mean(axis=0)
        got = out[out.lang == lang].sort_values("dim")
        assert (got.n == len(grp)).all()
        assert np.allclose(got.mean_r6, np.round(want, 6), atol=2e-6)
    assert len(out) == docs.lang.nunique() * 64


def test_epoch_shuffle_head_deterministic_and_seeded(ray_session):
    import biobloom_ray.pipelines.analytics as A
    from biobloom_ray.hashing import splitmix64

    out = A.epoch_shuffle_head("/root/testdata/sf0.001")
    out2 = A.epoch_shuffle_head("/root/testdata/sf0.001")
    assert out.equals(out2)
    assert out.pos.tolist() == list(range(1, len(out) + 1))
    # matches a local full-sort replay of the same hash
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id"])
    ids = docs.doc_id.to_numpy().astype(np.uint64)
    h = splitmix64(ids ^ np.uint64(A.EPOCH_SHUFFLE_SEED))
    want = docs.doc_id.to_numpy()[np.lexsort((docs.doc_id, h))][
        :A.EPOCH_SHUFFLE_HEAD]
    assert out.doc_id.tolist() == want.tolist()
    # a different seed gives a different permutation
    other = A.epoch_shuffle_head("/root/testdata/sf0.001", seed=99)
    assert other.doc_id.tolist() != out.doc_id.tolist()


def test_inverted_index_tiers_agree(ray_session, monkeypatch):
    import biobloom_ray.pipelines.analytics as A

    drv = A.inverted_index("/root/testdata/sf0.001")
    monkeypatch.setattr(A, "INVIDX_DRIVER_MAX_ROWS", 0)
    clu = A.inverted_index("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(drv, clu)


def test_clean_corpus_composition_invariants(ray_session):
    import biobloom_ray.pipelines.analytics as A

    out = A.clean_corpus("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    # no benchmark docs survive, all kept ids exist, langs match source
    assert (out.doc_id % A.DECON_BENCH_MOD != 0).all()
    m = out.merge(docs[["doc_id", "lang"]], on="doc_id",
                  suffixes=("", "_src"))
    assert len(m) == len(out)
    assert (m.lang == m.lang_src).all()
    # kept set is duplicate-free by text
    kept = docs[docs.doc_id.isin(out.doc_id)]
    assert kept.text.duplicated().sum() == 0
    # every kept doc passes the word-count leg of the Gopher gate
    ntok = kept.text.str.count(r"\S+")
    assert (ntok >= 20).all()
    # n_tokens column is the \S+ count
    chk = out.merge(docs[["doc_id", "text"]], on="doc_id")
    assert (chk.n_tokens == chk.text.str.count(r"\S+")).all()


def test_lang_centroids_tiers_agree(ray_session, monkeypatch):
    import biobloom_ray.pipelines.analytics as A

    drv = A.lang_centroids("/root/testdata/sf0.001")
    monkeypatch.setattr(A, "CENTROID_BROADCAST_MAX_ROWS", 0)
    clu = A.lang_centroids("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(drv, clu)


def test_source_overlap_symmetric_brute_force(ray_session):
    import re

    import biobloom_ray.pipelines.analytics as A

    out = A.source_overlap("/root/testdata/sf0.001")
    assert (out.src_a < out.src_b).all()
    assert (out.n_shared >= 1).all()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["source", "text"])
    grams = {}
    for src, txt in zip(docs.source, docs.text):
        toks = re.findall(r"\S+", txt)
        gs = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        grams.setdefault(src, set()).update(gs)
    srcs = sorted(grams)
    want = {(a, b): len(grams[a] & grams[b])
            for i, a in enumerate(srcs) for b in srcs[i + 1:]
            if grams[a] & grams[b]}
    got = {(r.src_a, r.src_b): r.n_shared for r in out.itertuples()}
    assert got == want


def test_source_overlap_boundary_stitch_block_invariance(ray_session):
    """The sort+segment pair expansion must be invariant to how the
    sorted rows split into blocks (the boundary-stitch path)."""
    import ray.data

    import biobloom_ray.pipelines.analytics as A

    base = A.source_overlap("/root/testdata/sf0.001")
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # force many tiny blocks
        tiny = A.source_overlap("/root/testdata/sf0.001")
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, tiny)


def test_quality_weighted_sample_brute_force(ray_session):
    import re

    import biobloom_ray.pipelines.analytics as A
    from biobloom_ray.hashing import splitmix64

    out = A.quality_weighted_sample("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    keep = []
    for did, txt in zip(docs.doc_id, docs.text):
        toks = re.findall(r"\S+", txt)
        nw, swl = len(toks), sum(len(t) for t in toks)
        if nw == 0:
            continue
        thr = min((swl << 64) // (10 * nw), (1 << 64) - 1)
        h = int(splitmix64(np.array([did], dtype=np.uint64))[0])
        if h < thr:
            keep.append(did)
    assert out.doc_id.tolist() == sorted(keep)
    # the weight has real spread on the fixture: a nontrivial fraction
    # is dropped AND a nontrivial fraction kept
    assert 0.1 < len(out) / len(docs) < 0.9


def test_token_entropy_brute_force(ray_session):
    import re
    from collections import Counter

    import biobloom_ray.pipelines.analytics as A

    out = A.token_entropy("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    got = out.set_index("doc_id")
    for did, txt in list(zip(docs.doc_id, docs.text))[:100]:
        toks = re.findall(r"\S+", txt)
        if not toks:
            assert did not in got.index
            continue
        c = np.array(list(Counter(toks).values()), dtype=np.float64)
        h = np.log(len(toks)) - (c * np.log(c)).sum() / len(toks)
        r = got.loc[did]
        assert r.n_tokens == len(toks)
        assert r.n_distinct == len(set(toks))
        assert abs(r.entropy_r6 - round(h, 6)) < 2e-6
    # entropy bounds: 0 <= H <= ln(n_distinct)
    assert (out.entropy_r6 >= -1e-6).all()
    assert (out.entropy_r6 <= np.log(out.n_distinct) + 1e-6).all()


def test_u64_long_division_matches_bigint():
    """The vectorized two-step 32-bit long division inside
    quality_weighted_sample must equal exact bigint (num << 64) // den
    for every den < 2^31, num <= den."""
    from hypothesis import given, settings, strategies as st

    @given(st.integers(min_value=1, max_value=2**31 - 1),
           st.data())
    @settings(max_examples=300, deadline=None)
    def check(den, data):
        num = data.draw(st.integers(min_value=0, max_value=den))
        n = np.array([num], dtype=np.int64)
        d = np.array([den], dtype=np.int64)
        r0 = n % d
        t1 = (r0 << 32) // d
        t2 = (((r0 << 32) % d) << 32) // d
        got = int((t1.astype(np.uint64) << np.uint64(32))
                  + t2.astype(np.uint64)[0])
        want = ((num % den) << 64) // den
        assert got == want

    check()


def test_inverted_index_cluster_tier_block_invariance(ray_session,
                                                      monkeypatch):
    """The cluster tier's block-postings assembly + driver stitch must
    be invariant to block fragmentation of the sorted pair rows."""
    import ray.data

    import biobloom_ray.pipelines.analytics as A

    monkeypatch.setattr(A, "INVIDX_DRIVER_MAX_ROWS", 0)
    base = A.inverted_index("/root/testdata/sf0.001")
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        tiny = A.inverted_index("/root/testdata/sf0.001")
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, tiny)


def test_source_quality_gate_empty_kept_join_path(ray_session,
                                                  monkeypatch):
    """When NO source passes the gate, the guarded hash join yields a
    schema-less empty dataset; the caller must restore the output
    columns instead of KeyError-ing (code-review regression)."""
    import pyarrow as pa

    import biobloom_ray.pipelines.analytics as A
    import biobloom_ray.stages.webclean as W

    def _no_pass_flags(b):  # local => cloudpickled by value
        return pa.table({"pass_gopher": pa.array([0] * b.num_rows,
                                                 type=pa.int64())})

    monkeypatch.setattr(W, "gopher_flags_batch", _no_pass_flags)
    monkeypatch.setattr(A, "SRCGATE_BROADCAST_MAX_ROWS", 0)
    out = A.source_quality_gate("/root/testdata/sf0.001")
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "source"]


def test_events_range_join_brute_force(ray_session):
    import biobloom_ray.pipelines.analytics as A

    out = A.events_range_join("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])
    clicks = ev[ev.event_type == "click"]
    buys = ev[ev.event_type == "purchase"]
    assert len(out) == len(clicks)
    got = out.set_index("event_id")
    for r in clicks.itertuples():
        w = buys[(buys.user_id == r.user_id) & (buys.ts > r.ts)
                 & (buys.ts <= r.ts + pd.Timedelta(seconds=3600))]
        g = got.loc[r.event_id]
        assert g.n_in_window == len(w)
        assert g.sum_value_cents == int(round(w.value.mul(100)
                                              .round().sum()))
    assert (out.n_in_window > 0).any()


def test_round4_new_op_tiers_agree(ray_session, monkeypatch):
    """Round-4 operators: every tier pair returns identical tables —
    events_props_stats (driver combine vs native groupby),
    top_bigrams_per_lang (driver count-table vs native Sum + two-level
    top-k), nchars_rank_in_source (driver combine + broadcast merge vs
    native groupby + Dataset hash join)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"

    def canon(df):
        cols = list(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    fast_props = A.events_props_stats(sf)
    fast_bg = A.top_bigrams_per_lang(sf)
    fast_rank = A.nchars_rank_in_source(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "BIGRAM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_BROADCAST_MAX_ROWS", 0)

    slow_props = A.events_props_stats(sf)[list(fast_props.columns)]
    slow_bg = A.top_bigrams_per_lang(sf)[list(fast_bg.columns)]
    slow_rank = A.nchars_rank_in_source(sf)[list(fast_rank.columns)]

    for name, f, s in [("props", fast_props, slow_props),
                       ("bigrams", fast_bg, slow_bg),
                       ("rank", fast_rank, slow_rank)]:
        f, s = canon(f), canon(s)
        assert len(f) > 0 and f.equals(s), name


def test_round4_wave2_tiers_agree(ray_session, monkeypatch):
    """windowed_distinct_users (driver dedup vs chained native
    groupbys), segment_revenue_topk (broadcast key sets vs two hash
    joins + native rollup), nb_class_scores (broadcast vocab vs
    token hash join; integer columns exact, float at 1e-6 like
    bigram_lm_scores)."""
    import numpy as np

    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"

    fast_w = A.windowed_distinct_users(sf)
    fast_s = A.segment_revenue_topk(sf)
    fast_nb = A.nb_class_scores(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "SEGMENT_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "NB_BROADCAST_MAX_ROWS", 0)

    slow_w = A.windowed_distinct_users(sf)[list(fast_w.columns)]
    slow_s = A.segment_revenue_topk(sf)[list(fast_s.columns)]
    slow_nb = A.nb_class_scores(sf)[list(fast_nb.columns)]

    assert len(fast_w) > 0 and fast_w.equals(slow_w)
    assert len(fast_s) > 0 and fast_s.equals(slow_s)
    assert len(fast_nb) > 0
    for c in ("doc_id", "n_tokens", "sum_ca", "sum_cb"):
        assert (fast_nb[c].to_numpy() == slow_nb[c].to_numpy()).all(), c
    assert np.allclose(fast_nb.score_r6, slow_nb.score_r6,
                       rtol=0, atol=1e-6)


def test_round4_wave3_tiers_agree(ray_session, monkeypatch):
    """user_event_pivot (driver fold vs native multi-Sum groupby) and
    token_drift_topk (driver count-table vs native Sum + block top-k)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_p = A.user_event_pivot(sf)
    fast_d = A.token_drift_topk(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RARITY_BROADCAST_MAX_ROWS", 0)

    slow_p = A.user_event_pivot(sf)[list(fast_p.columns)]
    slow_d = A.token_drift_topk(sf)[list(fast_d.columns)]
    assert len(fast_p) > 0 and fast_p.equals(slow_p)
    assert len(fast_d) > 0 and fast_d.equals(slow_d)


def test_round4_wave4_tiers_agree(ray_session, monkeypatch):
    """latest_event_per_user_type (driver fold vs native groupby +
    per-group argmax) and events_hourly_anomaly (tiered rollup under
    the driver-side z-pass)."""
    import numpy as np

    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_l = A.latest_event_per_user_type(sf)
    fast_a = A.events_hourly_anomaly(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)

    slow_l = (A.latest_event_per_user_type(sf)[list(fast_l.columns)]
              .reset_index(drop=True))
    slow_a = (A.events_hourly_anomaly(sf)[list(fast_a.columns)]
              .reset_index(drop=True))
    assert len(fast_l) > 0 and fast_l.reset_index(drop=True).equals(slow_l)
    assert len(fast_a) > 0
    for c in ("event_type", "hour_epoch", "n"):
        assert (fast_a[c].to_numpy() == slow_a[c].to_numpy()).all(), c
    assert np.allclose(fast_a.z_r6, slow_a.z_r6, rtol=0, atol=1e-6)


def test_round4_wave5_tiers_agree(ray_session, monkeypatch):
    """docs_rollup_cube (driver fold vs native Sum groupby for the fine
    grain) and nchars_ntile_buckets (driver count-table vs native Sum;
    plus a forced-ties fixture exercising the straddling-run resolver)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_c = A.docs_rollup_cube(sf)
    fast_n = A.nchars_ntile_buckets(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)

    slow_c = A.docs_rollup_cube(sf)[list(fast_c.columns)]
    slow_n = A.nchars_ntile_buckets(sf)[list(fast_n.columns)]
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    assert len(fast_n) > 0 and fast_n.equals(slow_n)


def test_ntile_straddling_runs(ray_session, tmp_path):
    """All-ties fixture: every doc in a source shares n_chars, so every
    bucket boundary falls inside one giant run and the distributed
    resolver must reproduce NTILE's (n_chars, doc_id) total order."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import biobloom_ray.pipelines.analytics as A

    n = 103  # not divisible by 4: exercises the ceil/floor bucket split
    t = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([42] * n, pa.int64())})
    d = tmp_path / "ntile_fixture"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = A.nchars_ntile_buckets(str(d))
    want = duckdb.sql(
        f"SELECT doc_id, CAST(NTILE(4) OVER (PARTITION BY source"
        f" ORDER BY n_chars, doc_id) AS BIGINT) AS bucket"
        f" FROM read_parquet('{d}/documents.parquet')"
        f" ORDER BY doc_id").df()
    assert (got.doc_id.to_numpy() == want.doc_id.to_numpy()).all()
    assert (got.bucket.to_numpy() == want.bucket.to_numpy()).all()


def test_round4_wave6_tiers_agree(ray_session, monkeypatch):
    """customers_without_orders (broadcast anti-probe vs native
    left_anti hash join), region_revenue (broadcast orderkey→region
    link vs hash joins + Bloom-pruned rollup), orders_priority_semijoin
    (driver max-combine + broadcast probe vs native Max groupby + hash
    join)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_c = A.customers_without_orders(sf)
    fast_r = A.region_revenue(sf)
    fast_p = A.orders_priority_semijoin(sf)

    monkeypatch.setattr(A, "ANTI_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)

    slow_c = A.customers_without_orders(sf)[list(fast_c.columns)]
    slow_r = A.region_revenue(sf)[list(fast_r.columns)]
    slow_p = A.orders_priority_semijoin(sf)[list(fast_p.columns)]

    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    assert len(fast_r) > 0 and fast_r.equals(slow_r)
    assert len(fast_p) > 0 and fast_p.equals(slow_p)


def test_round4_wave7_tiers_agree(ray_session, monkeypatch):
    """event_transitions (driver sort+shift vs salt-by-time-bucket +
    boundary stitching), event_type_daily_ma7 (tiered daily rollup
    under the driver window pass), funnel_conversion (driver pivot vs
    native Min groupby + per-user map_groups + block partials)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_t = A.event_transitions(sf)
    fast_m = A.event_type_daily_ma7(sf)
    fast_f = A.funnel_conversion(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)

    slow_t = A.event_transitions(sf)[list(fast_t.columns)]
    slow_m = A.event_type_daily_ma7(sf)[list(fast_m.columns)]
    slow_f = A.funnel_conversion(sf)[list(fast_f.columns)]

    assert len(fast_t) > 0 and fast_t.equals(slow_t)
    assert len(fast_m) > 0 and fast_m.equals(slow_m)
    assert len(fast_f) == 1 and fast_f.equals(slow_f)
    # the funnel is strictly ordered: counts must be monotone
    r = fast_f.iloc[0]
    assert r.n_users >= r.n_view >= r.n_view_click >= r.n_full_funnel


def test_event_transitions_single_entity(ray_session, monkeypatch):
    """One user, events spanning many time buckets with ties on ts:
    the salted plan's boundary stitching must reproduce exact LAG
    semantics (ordered by ts then event_id) across bucket edges."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import biobloom_ray.pipelines.analytics as A

    rng = np.random.default_rng(11)
    n = 4000
    ts_us = np.sort(rng.integers(0, 40 * 3600 * 1_000_000, n))
    ts_us[100:110] = ts_us[100]  # a tie run inside one bucket
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(np.sort(ts_us), unit="us"),
        "user_id": np.zeros(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.zeros(n), "props": [""] * n})
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "events.parquet"))

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    got = A.event_transitions(d)
    want = duckdb.sql(
        "WITH s AS (SELECT user_id, event_type, LAG(event_type) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM "
        f"'{d}/events.parquet') SELECT prev AS prev_type, event_type AS"
        " next_type, CAST(COUNT(*) AS BIGINT) AS n FROM s WHERE prev IS"
        " NOT NULL GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert got.equals(want)


def test_round4_wave8_tiers_agree(ray_session, monkeypatch):
    """acctbal_percentiles_per_nation (driver count-table fold vs
    native Sum groupby), shard_assignment_counts (map-only: invariant
    under repartition; all docs assigned exactly once), and the
    partitioned sink round-trip (pruned partition read == full-table
    filtered rollup)."""
    import duckdb

    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_q = A.acctbal_percentiles_per_nation(sf)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_q = A.acctbal_percentiles_per_nation(sf)[list(fast_q.columns)]
    assert len(fast_q) > 0 and fast_q.equals(slow_q)

    sh = A.shard_assignment_counts(sf)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'").fetchone()[0]
    assert sh.n_docs.sum() == n_docs  # every doc lands in exactly 1 shard
    assert sh.shard.between(0, 15).all()

    pr = A.partitioned_roundtrip_source_counts(sf)
    want = duckdb.sql(
        f"SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM"
        f" '{sf}/documents.parquet' WHERE source = 'src7'"
        " GROUP BY lang ORDER BY lang").df()
    assert pr.equals(want)


def test_round4_wave9_tiers_agree(ray_session, monkeypatch):
    """nation_monthly_revenue_delta (broadcast custkey map vs hash join
    + native Sum groupby under the driver LAG pass), brand_distinct_sizes
    (driver dedup folds vs chained native groupbys), nation_balance_union
    (map-only partials before the union; checked against both sides'
    direct rollups)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_m = A.nation_monthly_revenue_delta(sf)
    fast_b = A.brand_distinct_sizes(sf)
    fast_u = A.nation_balance_union(sf)

    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "PART_DRIVER_MAX_ROWS", 0)

    slow_m = A.nation_monthly_revenue_delta(sf)[list(fast_m.columns)]
    slow_b = A.brand_distinct_sizes(sf)[list(fast_b.columns)]

    assert len(fast_m) > 0 and fast_m.equals(slow_m)
    assert len(fast_b) > 0 and fast_b.equals(slow_b)
    # union rollup: per-side totals must equal the union's side slices
    assert len(fast_u) > 0
    assert (fast_u[fast_u.side == "customer"].n.sum()
            + fast_u[fast_u.side == "supplier"].n.sum()) == fast_u.n.sum()


def test_round4_wave10_tiers_agree(ray_session, monkeypatch):
    """revenue_pareto_nations (rides orders_per_nation's tiers; window
    pass driver-side), source_lang_entropy (driver count fold vs native
    Sum groupby), top_suppliers_by_quantity (driver fold vs native Sum
    + block top-k)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_p = A.revenue_pareto_nations(sf)
    fast_e = A.source_lang_entropy(sf)
    fast_s = A.top_suppliers_by_quantity(sf)

    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)

    slow_p = A.revenue_pareto_nations(sf)[list(fast_p.columns)]
    slow_e = A.source_lang_entropy(sf)[list(fast_e.columns)]
    slow_s = A.top_suppliers_by_quantity(sf)[list(fast_s.columns)]

    assert len(fast_p) > 0 and fast_p.equals(slow_p)
    assert len(fast_e) > 0 and fast_e.equals(slow_e)
    assert len(fast_s) > 0 and fast_s.equals(slow_s)
    # Pareto invariants: cum is monotone, last cum == total
    assert fast_p.cum_cents.is_monotonic_increasing
    assert fast_p.cum_cents.iloc[-1] == fast_p.total_cents.sum()


def test_round4_wave11_tiers_agree(ray_session, monkeypatch):
    """value_decile_stats (driver count fold vs native Sum groupby;
    aggregates derived from the count table alone), top_size_modes
    (DENSE_RANK ties kept), parts_above_type_avg (integer
    cross-multiplication, no float average)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_d = A.value_decile_stats(sf)
    fast_m = A.top_size_modes_per_brand(sf)
    fast_a = A.parts_above_type_avg(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "PART_DRIVER_MAX_ROWS", 0)

    slow_d = A.value_decile_stats(sf)[list(fast_d.columns)]
    slow_m = A.top_size_modes_per_brand(sf)[list(fast_m.columns)]
    slow_a = A.parts_above_type_avg(sf)[list(fast_a.columns)]

    assert len(fast_d) > 0 and fast_d.equals(slow_d)
    assert len(fast_m) > 0 and fast_m.equals(slow_m)
    assert len(fast_a) > 0 and fast_a.equals(slow_a)
    # decile invariants: bucket sizes differ by at most 1, n sums to total
    sizes = fast_d.n.to_numpy()
    assert sizes.max() - sizes.min() <= 1

def test_round4_wave12_tiers_agree(ray_session, monkeypatch):
    """event_user_setops (driver Max fold vs native Max groupby;
    set-op counts from flag combinations), type_day_dense_counts
    (zero-filled grid over the tiered daily rollup),
    lineitem_corr_stats (moment partials: driver fold vs native
    6-column Sum groupby)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_s = A.event_user_setops(sf)
    fast_g = A.type_day_dense_counts(sf)
    fast_c = A.lineitem_corr_stats(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)

    slow_s = A.event_user_setops(sf)[list(fast_s.columns)]
    slow_g = A.type_day_dense_counts(sf)[list(fast_g.columns)]
    slow_c = A.lineitem_corr_stats(sf)[list(fast_c.columns)]

    assert len(fast_s) > 0 and fast_s.equals(slow_s)
    assert len(fast_g) > 0 and fast_g.equals(slow_g)
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    # set-op identities: n_a = n_both + n_only_a; partitions sum to n
    r = fast_s.iloc[0]
    assert r.n_a == r.n_both + r.n_only_a
    assert r.n_b == r.n_both + r.n_only_b
    assert r.n_users == r.n_both + r.n_only_a + r.n_only_b + r.n_neither
    # dense grid: exactly #types × #days rows, total preserved
    assert len(fast_g) == (fast_g.event_type.nunique()
                           * fast_g.day_epoch.nunique())
    # correlation is within [-1, 1] and matches np.corrcoef per group
    assert (fast_c.corr_r6.abs() <= 1).all()
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    li["cents"] = np.floor(li.l_extendedprice * 100 + 0.5)
    for _, row in fast_c.iterrows():
        g = li[li.l_returnflag == row.l_returnflag]
        ref = np.corrcoef(g.l_quantity, g.cents)[0, 1]
        assert abs(row.corr_r6 - ref) < 1e-6

def test_round4_wave13_tiers_agree(ray_session, monkeypatch):
    """snapshot_user_diff (driver fold vs native 2-column Sum groupby;
    FULL-OUTER-equivalent conditional rollup), max_concurrent_sessions
    (driver sweep vs distributed sort + block max-prefix-sum fold),
    pmi_top_bigrams (driver vocab fold vs native Sum groupby + double
    hash join + block top-k)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_d = A.snapshot_user_diff(sf)
    fast_m = A.max_concurrent_sessions(sf)
    fast_p = A.pmi_top_bigrams(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RARITY_BROADCAST_MAX_ROWS", 0)

    slow_d = A.snapshot_user_diff(sf)[list(fast_d.columns)]
    slow_m = A.max_concurrent_sessions(sf)[list(fast_m.columns)]
    slow_p = A.pmi_top_bigrams(sf)[list(fast_p.columns)]

    assert len(fast_d) > 0 and fast_d.equals(slow_d)
    assert len(fast_m) > 0 and fast_m.equals(slow_m)
    assert len(fast_p) > 0 and fast_p.equals(slow_p)
    # the fixture exercises ALL FOUR CDC statuses
    assert set(fast_d.status.unique()) == {
        "added", "removed", "changed", "unchanged"}
    # diff identity: old/new totals partition the corpus row count
    assert (fast_d.old_n.sum() + fast_d.new_n.sum()
            == pd.read_parquet(f"{sf}/events.parquet",
                               columns=["event_id"]).shape[0])
    # sweep invariants: at least 1 when any session exists; never
    # exceeds the session count
    r = fast_m.iloc[0]
    assert 1 <= r.max_concurrent <= r.n_sessions
    # PMI rows respect the min-count floor
    assert (fast_p.c_xy >= 5).all()


def test_max_concurrent_sessions_single_entity(ray_session, monkeypatch):
    """A one-user stream with engineered overlaps...  trivially all
    sessions belong to one user — the distributed sweep must still
    count cross-session overlap correctly (the boundary stream, not the
    per-user grouping, carries the concurrency)."""
    import biobloom_ray.pipelines.analytics as A

    # fixture: user 1 has 3 sessions; user 2's single long session
    # overlaps two of them -> max concurrency 2
    base = pd.Timestamp("2026-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    rows = []
    for i, (u, start_h, n_ev) in enumerate(
            [(1, 0, 3), (1, 5, 2), (1, 10, 2), (2, 4.9, 8)]):
        for j in range(n_ev):
            rows.append((len(rows), base + start_h * h
                         + pd.Timedelta(minutes=10 * j), u))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(os.path.join(td, "events.parquet"))
        out = A.max_concurrent_sessions(td)
        monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
        out2 = A.max_concurrent_sessions(td)
    assert out.iloc[0].n_sessions == 4
    assert out.iloc[0].max_concurrent == 2
    assert out.equals(out2[list(out.columns)])

def test_round4_wave14_tiers_agree(ray_session, monkeypatch):
    """doc_length_gini (value-cardinality count table, exact-int
    numerator), cross_lang_dup_matrix (broadcast lang map vs double
    hash join), nchars_cume_dist (broadcast CDF attach vs hash join)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_g = A.doc_length_gini(sf)
    fast_x = A.cross_lang_dup_matrix(sf)
    fast_c = A.nchars_cume_dist(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_BROADCAST_MAX_ROWS", 0)

    slow_g = A.doc_length_gini(sf)[list(fast_g.columns)]
    slow_x = A.cross_lang_dup_matrix(sf)[list(fast_x.columns)]
    slow_c = A.nchars_cume_dist(sf)[list(fast_c.columns)]

    assert len(fast_g) > 0 and fast_g.equals(slow_g)
    assert len(fast_x) > 0 and fast_x.equals(slow_x)
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    # Gini bounds for non-degenerate positive data
    assert ((fast_g.gini_r6 >= 0) & (fast_g.gini_r6 < 1)).all()
    # matrix is unordered (lo <= hi) and totals the pair count
    assert (fast_x.lang_lo <= fast_x.lang_hi).all()
    # CDF ranges: max per source is exactly 1.0, all values in (0, 1]
    assert ((fast_c.cume_r6 > 0) & (fast_c.cume_r6 <= 1)).all()
    assert (fast_c.groupby("source").cume_r6.max() == 1.0).all()

def test_round4_wave15_tiers_agree(ray_session, monkeypatch):
    """cohort_retention (driver merge vs chained dedup groupbys + Min
    groupby + hash join — both join sides user-scale),
    source_lang_chi2 (tiered contingency rollup), name_typo_pairs
    (tiered distinct vocab; deletion blocking finds EXACTLY the
    all-pairs levenshtein=1 set by construction)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_r = A.cohort_retention(sf)
    fast_c = A.source_lang_chi2(sf)
    fast_t = A.name_typo_pairs(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)

    slow_r = A.cohort_retention(sf)[list(fast_r.columns)]
    slow_c = A.source_lang_chi2(sf)[list(fast_c.columns)]
    slow_t = A.name_typo_pairs(sf)[list(fast_t.columns)]

    assert len(fast_r) > 0 and fast_r.equals(slow_r)
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    assert len(fast_t) > 0 and fast_t.equals(slow_t)
    # retention invariants: offset 0 row exists per cohort and is the
    # max of its cohort (every user is active in their first week)
    base = fast_r[fast_r.offset_week == 0].set_index("cohort_week")
    assert set(fast_r.cohort_week) == set(base.index)
    for cw, g in fast_r.groupby("cohort_week"):
        assert g.n_active.max() == base.loc[cw].n_active
    # chi2 >= 0, dof = (rows-1)(cols-1) > 0 on the fixture
    assert fast_c.iloc[0].chi2_r6 >= 0 and fast_c.iloc[0].dof > 0
    # typo pairs are ordered and distinct
    assert (fast_t.w1 < fast_t.w2).all()
    assert not fast_t.duplicated().any()

def test_round4_wave16_tiers_agree(ray_session, monkeypatch):
    """orders_profile (per-block value dedup + rowmeta partials; driver
    fold vs native chained groupbys), orders_quality_checks (map-only
    conditional partials), acctbal_robust_stats (MODE/MAD from the
    value-cardinality count table)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_p = A.orders_profile(sf)
    fast_q = A.orders_quality_checks(sf)
    fast_r = A.acctbal_robust_stats(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)

    slow_p = A.orders_profile(sf)[list(fast_p.columns)]
    slow_q = A.orders_quality_checks(sf)[list(fast_q.columns)]
    slow_r = A.acctbal_robust_stats(sf)[list(fast_r.columns)]

    assert len(fast_p) > 0 and fast_p.equals(slow_p)
    assert len(fast_q) > 0 and fast_q.equals(slow_q)
    assert len(fast_r) > 0 and fast_r.equals(slow_r)
    # profile invariants: key column is unique, rows constant
    pk = fast_p.set_index("col")
    assert pk.loc["o_orderkey"].n_distinct == pk.loc["o_orderkey"].n_rows
    assert fast_p.n_rows.nunique() == 1
    # the fixture exercises at least one failing constraint
    assert (fast_q.n_fail > 0).any() and (fast_q.n_pass > 0).all()
    # robust stats: MAD <= max deviation and mode within value range
    assert (fast_r.mad_cents >= 0).all()

def test_round4_wave18_tiers_agree(ray_session, monkeypatch):
    """diversified_top_docs (block per-source prune is a VALID pruning
    — checked against the unpruned driver window rule),
    event_decayed_counts (driver fold vs native Sum groupby; decayed
    score is a ratio of exact integers)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_d = A.diversified_top_docs(sf)
    fast_e = A.event_decayed_counts(sf)

    # unpruned reference for the diversified top-k
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    ref = (docs.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True])
           .groupby("source").head(2)
           .sort_values(["n_chars", "doc_id"],
                        ascending=[False, True]).head(10)
           .reset_index(drop=True)[["doc_id", "source", "n_chars"]])
    assert fast_d.equals(ref)
    assert fast_d.groupby("source").size().max() <= 2

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_e = A.event_decayed_counts(sf)[list(fast_e.columns)]
    assert len(fast_e) > 0 and fast_e.equals(slow_e)
    # decay invariants: newest-day mass dominates; num <= n * 2^40
    assert (fast_e.decay_num
            <= fast_e.n_events * (1 << 40)).all()
    assert (fast_e.decay_num > 0).all()

def test_round4_wave19_tiers_agree(ray_session, monkeypatch):
    """latest_events_per_user (block per-user prune proven against the
    unpruned window rule), event_gap_quantiles (driver fold vs native
    Sum groupby over gap count tables)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_l = A.latest_events_per_user(sf)
    fast_g = A.event_gap_quantiles(sf)

    # unpruned reference for latest-N
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    ev["ts_ns"] = ev.ts.astype("datetime64[ns]").astype(np.int64)
    ref = (ev.sort_values(["user_id", "ts_ns", "event_id"],
                          ascending=[True, False, False])
           .groupby("user_id").head(3).copy())
    ref["rn"] = (ref.groupby("user_id").cumcount() + 1).astype(np.int64)
    ref = (ref.sort_values(["user_id", "rn"]).reset_index(drop=True)
           [["user_id", "rn", "event_id", "ts_ns", "event_type"]])
    assert fast_l.equals(ref)
    assert fast_l.groupby("user_id").size().max() <= 3

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_g = A.event_gap_quantiles(sf)[list(fast_g.columns)]
    assert len(fast_g) > 0 and fast_g.equals(slow_g)
    # quantile ordering invariant
    assert (fast_g.p50_s <= fast_g.p90_s).all()

def test_round4_wave20_tiers_agree(ray_session, monkeypatch):
    """rrf_hybrid_topk (fusion of two existing distributed retrieval
    stacks; membership/rank invariants), grouped_split_counts
    (driver fold vs native Sum groupby; no-leakage guarantee holds by
    construction — each source maps to exactly one split)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_r = A.rrf_hybrid_topk(sf)
    fast_s = A.grouped_split_counts(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_s = A.grouped_split_counts(sf)[list(fast_s.columns)]
    assert len(fast_s) > 0 and fast_s.equals(slow_s)

    # fusion invariants: scores within the achievable RRF range
    assert len(fast_r) == 10
    assert (fast_r.rrf_r6 <= np.round(2 / 61, 6)).all()
    assert (fast_r.rrf_r6 >= np.round(1 / 140, 6)).all()
    # split totals account for every source and document
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["source"])
    assert fast_s.n_docs.sum() == len(docs)
    assert fast_s.n_sources.sum() == docs.source.nunique()

def test_round4_wave21_tiers_agree(ray_session, monkeypatch):
    """user_bfs_hops (driver numpy BSP vs cluster Dataset-join BSP —
    frontier joins + left_anti visited dedup), top_session_journeys
    (driver fold vs native Sum groupby over journey partials)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_b = A.user_bfs_hops(sf)
    fast_j = A.top_session_journeys(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_b = A.user_bfs_hops(sf)[list(fast_b.columns)]
    slow_j = A.top_session_journeys(sf)[list(fast_j.columns)]

    assert len(fast_b) > 0 and fast_b.equals(slow_b)
    assert len(fast_j) > 0 and fast_j.equals(slow_j)
    # BFS invariants: exactly one hop-0 row (the seed = min user),
    # hops within bound, and the fixture reaches several levels
    assert (fast_b.hop == 0).sum() == 1
    assert fast_b.hop.max() <= 3
    assert fast_b.hop.nunique() >= 3
    # journeys are non-empty strings with counts >= 1
    assert (fast_j.cnt >= 1).all()
    assert (fast_j.journey.str.len() > 0).all()

def test_round4_wave22_tiers_agree(ray_session, monkeypatch):
    """weighted_sample_topk (block top-k prune proven against the
    unpruned global rule; inclusion is weight-biased),
    event_value_ffill_hourly (driver fold vs native Sum groupby; the
    fixture exercises real gaps)."""
    import biobloom_ray.pipelines.analytics as A
    from biobloom_ray.hashing import splitmix64

    sf = "/root/testdata/sf0.01"
    fast_w = A.weighted_sample_topk(sf)
    fast_f = A.event_value_ffill_hourly(sf)

    # unpruned reference for the A-ES sample
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    z = splitmix64(docs.doc_id.to_numpy(np.uint64)).astype(np.float64)
    key = np.log((z + 1.0) / 2.0 ** 64) \
        / docs.n_chars.to_numpy(np.float64)
    docs = docs.assign(key=key).sort_values(
        ["key", "doc_id"], ascending=[False, True]).head(20)
    assert fast_w.doc_id.tolist() == docs.doc_id.tolist()

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_f = A.event_value_ffill_hourly(sf)[list(fast_f.columns)]
    assert len(fast_f) > 0 and fast_f.equals(slow_f)
    # the fixture has real gaps and the fill copies the previous row
    assert fast_f.filled.sum() > 0
    g = fast_f[fast_f.filled == 1]
    prev = fast_f.shift(1)
    same_type = prev.event_type[g.index] == g.event_type
    assert (g.sum_cents[same_type].to_numpy()
            == prev.sum_cents[g.index][same_type].to_numpy()).all()

def test_round4_wave24_tiers_agree(ray_session, monkeypatch):
    """zorder_bucket_counts (driver fold vs native Sum groupby;
    Morton interleave checked against a reference implementation),
    funnel_latency_quantiles (driver fold vs native Min groupby)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_z = A.zorder_bucket_counts(sf)
    fast_f = A.funnel_latency_quantiles(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_z = A.zorder_bucket_counts(sf)[list(fast_z.columns)]
    slow_f = A.funnel_latency_quantiles(sf)[list(fast_f.columns)]
    assert len(fast_z) > 0 and fast_z.equals(slow_z)
    assert len(fast_f) > 0 and fast_f.equals(slow_f)

    # Morton reference check on a small grid: interleave(3, 5)
    # x=0b011, y=0b101 -> z bits y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1
    x, y = 3, 5
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    assert z == 0b100111
    # bucket totals account for every event row
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    assert fast_z.n.sum() == len(ev)
    # latency sanity: quantiles ordered, conversions <= users
    r = fast_f.iloc[0]
    assert r.p50_s <= r.p90_s and r.n_converted > 0

def test_round4_wave25_tiers_agree(ray_session, monkeypatch):
    """nchars_robust_outliers (driver fold vs native Sum groupby; the
    exact-integer modified-z rule decided on the count table)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_o = A.nchars_robust_outliers(sf)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_o = A.nchars_robust_outliers(sf)[list(fast_o.columns)]
    assert len(fast_o) > 0 and fast_o.equals(slow_o)
    assert (fast_o.n_outliers <= fast_o.n).all()
    assert (fast_o.mad >= 0).all()

def test_round4_wave26_tiers_agree(ray_session, monkeypatch):
    """source_dup_report (driver fold vs native Sum groupby over the
    LSH drop flags), returning_users_daily (driver merge vs self
    hash-join of the deduped user-day rollup on the day+1 key)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_d = A.source_dup_report(sf)
    fast_r = A.returning_users_daily(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_d = A.source_dup_report(sf)[list(fast_d.columns)]
    slow_r = A.returning_users_daily(sf)[list(fast_r.columns)]
    assert len(fast_d) > 0 and fast_d.equals(slow_d)
    assert len(fast_r) > 0 and fast_r.equals(slow_r)
    # rates bounded; drop totals match the kept-set complement
    assert ((fast_d.dup_rate_r6 >= 0) & (fast_d.dup_rate_r6 <= 1)).all()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id"])
    import __ray_entry__ as E

    kept = E.queries()["minhash_dedup_kept"](sf)
    assert fast_d.n_dropped.sum() == len(docs) - len(kept)
    # returning counts never exceed the distinct-user count
    assert (fast_r.n_returning <= 150).all()

def test_round4_wave27_tiers_agree(ray_session, monkeypatch):
    """TPC-H join-graph trio: nation_trade_volume (broadcast link +
    map-side pair rollup vs double hash join + native Sum groupby),
    promo_revenue_share (driver fold vs native Sum groupby over
    (month, promo) partials), top_returned_customers (broadcast
    orderkey->custkey vs hash join + disjoint-key block top-k)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_t = A.nation_trade_volume(sf)
    fast_p = A.promo_revenue_share(sf)
    fast_r = A.top_returned_customers(sf)

    monkeypatch.setattr(A, "ANTI_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_t = A.nation_trade_volume(sf)[list(fast_t.columns)]
    slow_p = A.promo_revenue_share(sf)[list(fast_p.columns)]
    slow_r = A.top_returned_customers(sf)[list(fast_r.columns)]
    assert len(fast_t) > 0 and fast_t.equals(slow_t)
    assert len(fast_p) > 0 and fast_p.equals(slow_p)
    assert len(fast_r) > 0 and fast_r.equals(slow_r.reset_index(drop=True))

    # no same-nation pair survives the Q7 predicate
    assert (fast_t.supp_nation != fast_t.cust_nation).all()
    # promo share bounded and the numerator never exceeds the total
    assert ((fast_p.promo_share_r6 >= 0) & (fast_p.promo_share_r6 <= 1)).all()
    assert (fast_p.promo_rev_e4 <= fast_p.total_rev_e4).all()
    # top-k is ordered by revenue desc and bounded by k
    assert len(fast_r) <= 20
    rv = fast_r.revenue_e4.to_numpy()
    assert (rv[:-1] >= rv[1:]).all()

def test_round4_wave28_tiers_agree(ray_session, monkeypatch):
    """Graph analytics: user_pagerank (numpy bincount iterations vs
    resident-edge Dataset join rounds), user_triangle_stats (pandas
    merges vs wedge/close hash joins).  table_fingerprint has no gate
    (XOR partials fold in any order) — pinned by its SQL oracle and a
    sensitivity check here."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_p = A.user_pagerank(sf)
    fast_t = A.user_triangle_stats(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_p = A.user_pagerank(sf)[list(fast_p.columns)]
    slow_t = A.user_triangle_stats(sf)[list(fast_t.columns)]
    assert len(fast_p) > 0 and fast_p.equals(slow_p)
    assert fast_t.equals(slow_t)

    # PageRank mass is conserved (sums to ~1 over graph nodes)
    assert abs(fast_p.pr_r6.sum() - 1.0) < 1e-3
    assert (fast_p.degree >= 1).all()
    # triangle census invariants: 3*triangles <= wedges
    r = fast_t.iloc[0]
    assert 3 * r.n_triangles <= r.n_wedges
    assert 0.0 <= r.gcc_r6 <= 1.0

    # fingerprint flips on any single-row change (order-invariance is
    # the oracle's job; sensitivity is checked directly on the kernel)
    fp = A.table_fingerprint(sf)
    assert (fp.n_rows > 0).all()
    assert fp.fp60.nunique() == len(fp)

def test_round4_wave29_tiers_agree(ray_session, monkeypatch):
    """term_overlap_topk (driver pandas fold vs banded-vocab semi-join
    + groupby(token) pair expansion + native Sum + per-group top-1),
    charclass_stats (driver fold vs native Sum groupby).
    readability_scores is map-only (no tier)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_o = A.term_overlap_topk(sf)
    fast_c = A.charclass_stats(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_o = A.term_overlap_topk(sf)[list(fast_o.columns)]
    slow_c = A.charclass_stats(sf)[list(fast_c.columns)]
    assert len(fast_o) > 0 and fast_o.equals(slow_o)
    assert len(fast_c) > 0 and fast_c.equals(slow_c)

    # retrieval scores are positive exact ints; no self-matches
    assert (fast_o["dot"] >= 1).all()
    assert (fast_o.doc_id != fast_o.best_doc).all()
    # ratios bounded and consistent with the exact counts
    assert ((fast_c.digit_ratio_r6 >= 0) & (fast_c.ws_ratio_r6 <= 1)).all()
    assert (fast_c.n_digit + fast_c.n_upper <= fast_c.n_chars).all()

    r = A.readability_scores(sf)
    assert len(r) > 0 and (r.n_words >= 1).all() \
        and (r.n_sentences >= 1).all()

def test_round4_wave30_tiers_agree(ray_session, monkeypatch):
    """range_shard_bounds / cusum_changepoints / hour_of_day_profile
    (driver fold vs native Sum groupby over the count-table / daily /
    (type,hod) partials)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_s = A.range_shard_bounds(sf)
    fast_c = A.cusum_changepoints(sf)
    fast_h = A.hour_of_day_profile(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_s = A.range_shard_bounds(sf)[list(fast_s.columns)]
    slow_c = A.cusum_changepoints(sf)[list(fast_c.columns)]
    slow_h = A.hour_of_day_profile(sf)[list(fast_h.columns)]
    assert len(fast_s) > 0 and fast_s.equals(slow_s)
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    assert len(fast_h) > 0 and fast_h.equals(slow_h)

    # shards are equi-depth within one value-run: every shard within
    # 2x of the ideal N/8 on this fixture, ranges non-overlapping
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    assert fast_s.n_rows.sum() == len(ev)
    assert (fast_s.min_cents.to_numpy()[1:]
            > fast_s.max_cents.to_numpy()[:-1]).all()
    # cusum: one row per type, |S| positive on this fixture
    assert fast_c.event_type.is_unique
    # hod shares sum to 1 per type (6-dp rounding slack)
    s = fast_h.groupby("event_type")["share_r6"].sum()
    assert ((s - 1.0).abs() < 1e-4).all()

def test_round4_wave31_tiers_agree(ray_session, monkeypatch):
    """supplier_part_coverage (driver fold + broadcast dims vs native
    pair dedup + hash join + distinct rollups), join_size_exact
    (driver fold vs native Sum groupby).  join_size_cms and
    embedding_top_pc fold blob partials (associative, no gate):
    pinned against their exact twins here."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_c = A.supplier_part_coverage(sf)
    fast_j = A.join_size_exact(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_c = A.supplier_part_coverage(sf)[list(fast_c.columns)]
    slow_j = A.join_size_exact(sf)[list(fast_j.columns)]
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    assert fast_j.equals(slow_j)
    assert (fast_c.n_suppliers <= fast_c.n_pairs).all()
    assert (fast_c.n_parts <= fast_c.n_pairs).all()

    # CMS join-size estimate: upper bound that respects the eps band
    cms = A.join_size_cms(sf)
    exact = int(fast_j.join_size.iloc[0])
    est = int(cms.join_size_cms.iloc[0])
    assert est >= exact > 0
    assert est - exact <= int(cms.eps_bound.iloc[0])

    # PCA power iteration matches a direct dense eigendecomposition
    pc1 = A.embedding_top_pc(sf)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    got = pc1.loading_r6.to_numpy()
    align = abs(float(got @ top) / (np.linalg.norm(got) or 1.0))
    assert align > 0.999999
    assert 0.0 < pc1.explained_var_r6.iloc[0] <= 1.0

def test_round4_wave32_tiers_agree(ray_session, monkeypatch):
    """user_activity_streaks (driver island walk vs per-user
    map_groups of the same vectorized kernel), order_fill_rate
    (driver Min fold + broadcast link vs native Min groupby + hash
    join), value_benford_deviation (driver fold vs native Sum
    groupby)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_s = A.user_activity_streaks(sf)
    fast_f = A.order_fill_rate(sf)
    fast_b = A.value_benford_deviation(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_s = A.user_activity_streaks(sf)[list(fast_s.columns)]
    slow_f = A.order_fill_rate(sf)[list(fast_f.columns)]
    slow_b = A.value_benford_deviation(sf)[list(fast_b.columns)]
    assert len(fast_s) > 0 and fast_s.equals(slow_s)
    assert len(fast_f) > 0 and fast_f.equals(slow_f)
    assert len(fast_b) > 0 and fast_b.equals(slow_b)

    # streak invariants
    assert (fast_s.max_streak_days >= 1).all()
    assert (fast_s.n_runs >= 1).all()
    # SLA rate bounded, within-counts never exceed totals
    assert (fast_f.n_within_sla <= fast_f.n_orders).all()
    assert ((fast_f.fill_rate_r6 >= 0) & (fast_f.fill_rate_r6 <= 1)).all()
    # Benford digits are 1..9 and chi2 terms non-negative
    assert fast_b.digit.between(1, 9).all()
    assert (fast_b.chi2_term_r6 >= 0).all()

def test_round4_wave33_tiers_agree(ray_session, monkeypatch):
    """weekly_distinct_users / byte_median_doc_size (driver folds vs
    chained native groupbys / count-table Sum groupby);
    multi_predicate_revenue is map-only (ONE partial row per block).
    hll_weekly_union's grid-merged estimate is pinned against the
    exact twin within 5 sigma."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_w = A.weekly_distinct_users(sf)
    fast_m = A.byte_median_doc_size(sf)
    fast_q = A.multi_predicate_revenue(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_w = A.weekly_distinct_users(sf)[list(fast_w.columns)]
    slow_m = A.byte_median_doc_size(sf)[list(fast_m.columns)]
    assert len(fast_w) > 0 and fast_w.equals(slow_w)
    assert len(fast_m) > 0 and fast_m.equals(slow_m)
    assert int(fast_q.n_items.iloc[0]) > 0

    # HLL union-across-weeks vs exact distinct users per type: 5 sigma
    est = A.hll_weekly_union(sf)
    exact = (pd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_type", "user_id"])
             .groupby("event_type")["user_id"].nunique())
    sigma = 5 * 1.04 / np.sqrt(1 << 14)
    for _, r in est.iterrows():
        ex = exact[r.event_type]
        assert abs(r.est_distinct_users - ex) <= max(sigma * ex, 3.0), \
            (r.event_type, r.est_distinct_users, ex)
    # union never exceeds the sum of weekly exacts
    assert (est.n_weeks >= 1).all()

def test_round4_wave34_tiers_agree(ray_session, monkeypatch):
    """copurchase_type_pairs (driver merge vs per-order map_groups
    pair expansion + native Sum + block top-k), source_exclusive_tokens
    (driver fold vs native Sum groupby over (source, token) partials).
    ngram_containment_pairs reuses the LSH->CSR verify machinery
    (tiers covered by the jaccard twin's tests) and is SQL-oracled."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_c = A.copurchase_type_pairs(sf)
    fast_x = A.source_exclusive_tokens(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_c = A.copurchase_type_pairs(sf)[list(fast_c.columns)]
    slow_x = A.source_exclusive_tokens(sf)[list(fast_x.columns)]
    assert len(fast_c) > 0 and fast_c.equals(slow_c)
    assert len(fast_x) > 0 and fast_x.equals(slow_x)

    assert (fast_c.ta < fast_c.tb).all()
    assert (fast_c.n_orders >= 1).all()
    assert (fast_x.n_exclusive_occ <= fast_x.n_tokens).all()
    # containment >= jaccard on every shared pair (set identity)
    import __ray_entry__ as E

    cont = E.queries()["ngram_containment_pairs"](sf)
    jac = E.queries()["ngram_jaccard_pairs"](sf)
    m = cont.merge(jac, on=["id_a", "id_b"])
    assert len(cont) > 0
    assert (m.containment >= m.jaccard - 1e-12).all()

def test_round4_wave35_tiers_agree(ray_session, monkeypatch):
    """fk_orphan_counts (driver sorted-array probe vs left-anti hash
    join on the distinct-key rollup), nchars_histogram_log2 (driver
    fold vs native Sum groupby; exact integer bucketing).
    langid_confusion_matrix composes the scored predictions into the
    (true, pred) table — diagonal dominance pinned."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_f = A.fk_orphan_counts(sf)
    fast_h = A.nchars_histogram_log2(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_f = A.fk_orphan_counts(sf)[list(fast_f.columns)]
    slow_h = A.nchars_histogram_log2(sf)[list(fast_h.columns)]
    assert len(fast_f) == 3 and fast_f.equals(slow_f)
    assert len(fast_h) > 0 and fast_h.equals(slow_h)

    # the synthetic star schema is referentially intact
    assert (fast_f.n_orphan_rows == 0).all()
    assert (fast_f.n_fact_rows > 0).all()
    # bucket totals account for every positive-length doc
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["n_chars"])
    assert fast_h.n.sum() == int((docs.n_chars > 0).sum())

    import __ray_entry__ as E

    cm = E.queries()["langid_confusion_matrix"](sf)
    diag = cm[cm.lang == cm.lang_pred].n.sum()
    n_langs = cm.lang.nunique()
    # the synthetic docs vocab is tiny (~31 tokens) so the n-gram
    # model is weak here — require better-than-chance, not accuracy
    # (the real accuracy pin lives in test_dedup_textstats_ann over
    # the page fixture with distinct per-lang char distributions)
    assert diag / cm.n.sum() > 1.5 / n_langs
    assert cm.n.sum() == 500


def test_round4_wave36_tiers_agree(ray_session, monkeypatch):
    """customer_order_distribution (driver combine vs native Sum
    groupby + output-scale counts-of-counts), cold_customers_by_nation
    (broadcast searchsorted anti vs left_anti hash join; exact-integer
    threshold), bloom_prune_join_revenue (exact broadcast key set vs
    distributed key-Bloom prune + FP-killing inner hash join)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_q13 = A.customer_order_distribution(sf)
    fast_cold = A.cold_customers_by_nation(sf)
    fast_bj = A.bloom_prune_join_revenue(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "ANTI_BROADCAST_MAX_ROWS", 0)
    slow_q13 = A.customer_order_distribution(sf)[list(fast_q13.columns)]
    slow_cold = A.cold_customers_by_nation(sf)[list(fast_cold.columns)]
    slow_bj = A.bloom_prune_join_revenue(sf)[list(fast_bj.columns)]
    assert len(fast_q13) > 0 and fast_q13.equals(slow_q13)
    assert len(fast_cold) > 0 and fast_cold.equals(slow_cold)
    assert len(fast_bj) > 0 and fast_bj.equals(slow_bj)

    # Q13 buckets account for every customer exactly once
    cust = pd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey"])
    assert fast_q13.custdist.sum() == len(cust)
    # the threshold rule keeps only above-average balances: the cold
    # set's mean balance must exceed the global positive mean
    cb = pd.read_parquet(f"{sf}/customer.parquet",
                         columns=["c_acctbal"]).c_acctbal
    pos_mean_cents = (np.sign(cb) * np.floor(np.abs(cb) * 100 + 0.5))
    pos_mean_cents = pos_mean_cents[pos_mean_cents > 0].mean()
    cold_mean = (fast_cold.sum_acctbal_cents.sum()
                 / fast_cold.n_cold.sum())
    assert cold_mean > pos_mean_cents
    # Bloom prune is FP-safe end-to-end: revenue strictly positive and
    # three return flags present on the fixture
    assert set(fast_bj.l_returnflag) == {"A", "N", "R"}
    assert (fast_bj.revenue > 0).all()


def test_round4_wave36b_tiers_agree(ray_session, monkeypatch):
    """session_overlap_pairs (driver user-slice loop vs per-user
    map_groups + native Sum), rolling_median_daily_revenue (driver
    combine vs native Sum groupby; identical rolling kernel),
    late_sole_supplier_counts (broadcast order-date searchsorted vs
    hash-join chain with native Max/Count/Sum rollups)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_ov = A.session_overlap_pairs(sf)
    fast_rm = A.rolling_median_daily_revenue(sf)
    fast_lt = A.late_sole_supplier_counts(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_ov = A.session_overlap_pairs(sf)[list(fast_ov.columns)]
    slow_rm = A.rolling_median_daily_revenue(sf)[list(fast_rm.columns)]
    slow_lt = A.late_sole_supplier_counts(sf)[list(fast_lt.columns)]
    assert len(fast_ov) > 0 and fast_ov.equals(slow_ov)
    assert len(fast_rm) > 0 and fast_rm.equals(slow_rm)
    assert len(fast_lt) > 0 and fast_lt.equals(slow_lt)

    # overlap counts are symmetric-free (a < b) and positive
    assert (fast_ov.type_a < fast_ov.type_b).all()
    assert (fast_ov.n_overlaps > 0).all()
    # each type's first-row rolling median equals its first daily sum
    first = fast_rm.groupby("event_type").head(1)
    daily = (pd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_type", "ts", "value"]))
    daily["day_epoch"] = (daily.ts.astype("datetime64[us]")
                          .astype(np.int64) // 86_400_000_000) * 86_400
    cents = (np.sign(daily.value)
             * np.floor(np.abs(daily.value) * 100 + 0.5)).astype(np.int64)
    daily["rev"] = cents
    d0 = (daily.groupby(["event_type", "day_epoch"], as_index=False)
          .rev.sum().sort_values(["event_type", "day_epoch"])
          .groupby("event_type").head(1))
    merged = first.merge(d0, on=["event_type", "day_epoch"])
    assert len(merged) == len(first)
    assert (merged.med_rev_cents == merged.rev).all()
    # Q21: top list is exactly k rows with non-increasing counts
    assert len(fast_lt) == 10
    assert (np.diff(fast_lt.numwait.to_numpy()) <= 0).all()


def test_round4_wave38_tiers_agree(ray_session, monkeypatch):
    """kmv_distinct_userdays (driver fold vs groupby(type).map_groups
    keep-k-smallest merge), part_skyline (gate-free associative
    merge — asserted against a brute-force domination check),
    large_quantity_orders (driver combine vs native Sum + hash join +
    block top-k)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_kmv = A.kmv_distinct_userdays(sf)
    fast_sky = A.part_skyline(sf)
    fast_q18 = A.large_quantity_orders(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_kmv = A.kmv_distinct_userdays(sf)[list(fast_kmv.columns)]
    slow_q18 = A.large_quantity_orders(sf)[list(fast_q18.columns)]
    assert len(fast_kmv) > 0 and fast_kmv.equals(slow_kmv)
    assert len(fast_q18) == 10 and fast_q18.equals(slow_q18)

    # KMV is in the estimator regime on the fixture and within 5
    # sigma of the exact distinct count (rel std = 1/sqrt(k-2))
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id", "ts"])
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000) * 86_400
    exact = (ev.drop_duplicates(["event_type", "user_id", "day"])
             .groupby("event_type").size())
    assert (fast_kmv.n_kept == A.KMV_K).all()
    for _, r in fast_kmv.iterrows():
        tru = exact[r.event_type]
        assert abs(r.kmv_distinct_r6 - tru) / tru < 5 / np.sqrt(
            A.KMV_K - 2)

    # skyline: no member dominated by any part, every non-member
    # dominated by some member (brute force over the fixture)
    parts = pd.read_parquet(f"{sf}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])
    parts["cents"] = (np.sign(parts.p_retailprice) * np.floor(
        np.abs(parts.p_retailprice) * 100 + 0.5)).astype(np.int64)
    c = parts.cents.to_numpy()
    s = parts.p_size.to_numpy(np.int64)
    in_sky = parts.p_partkey.isin(fast_sky.p_partkey).to_numpy()
    for i in np.nonzero(in_sky)[0]:
        dom = ((c < c[i]) & (s >= s[i])) | ((c <= c[i]) & (s > s[i]))
        assert not dom.any()
    for i in np.nonzero(~in_sky)[0]:
        dom = (((c < c[i]) & (s >= s[i])) | ((c <= c[i]) & (s > s[i])))
        assert dom[in_sky].any()


def test_round4_wave39_tiers_agree(ray_session, monkeypatch):
    """kmv_type_jaccard (driver fold vs map_groups bottom-k sets),
    repeat_purchase_pairs (driver customer-slice loop vs per-customer
    map_groups + native Sum), strict_funnel_users (driver loop vs
    per-user 0/1 partials)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_j = A.kmv_type_jaccard(sf)
    fast_b = A.repeat_purchase_pairs(sf)
    fast_f = A.strict_funnel_users(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_j = A.kmv_type_jaccard(sf)[list(fast_j.columns)]
    slow_b = A.repeat_purchase_pairs(sf)[list(fast_b.columns)]
    slow_f = A.strict_funnel_users(sf)[list(fast_f.columns)]
    assert len(fast_j) == 10 and fast_j.equals(slow_j)
    assert len(fast_b) > 0 and fast_b.equals(slow_b)
    assert fast_f.n_users.iloc[0] > 0 and fast_f.equals(slow_f)

    # KMV Jaccard estimate within a loose absolute band of the exact
    # Jaccard of the (user, day) sets (k=64 => std ~ sqrt(J(1-J)/64))
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id", "ts"])
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000) * 86_400
    sets = {t: set(map(tuple, g[["user_id", "day"]].to_numpy()))
            for t, g in ev.groupby("event_type")}
    for _, r in fast_j.iterrows():
        a, b = sets[r.type_a], sets[r.type_b]
        true_j = len(a & b) / len(a | b)
        assert abs(r.jaccard_r6 - true_j) < 5 * np.sqrt(
            max(true_j * (1 - true_j), 0.01) / A.KMV_K)

    # band join totals: each pair is counted exactly once, and total
    # pairs matches a brute-force per-customer window count
    od = pd.read_parquet(f"{sf}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    d = od.o_orderdate.astype("datetime64[us]").astype(np.int64)
    w = 7 * 86_400_000_000
    tot = 0
    for _, g in pd.DataFrame({"c": od.o_custkey, "d": d}).groupby("c"):
        dd = np.sort(g.d.to_numpy())
        tot += int((np.searchsorted(dd, dd + w, side="right")
                    - np.searchsorted(dd, dd, side="right")).sum())
    assert fast_b.n_pairs.sum() == tot


def test_round4_wave40_tiers_agree(ray_session, monkeypatch):
    """lang_bigram_jsd (driver pivot vs native lang-column Sum groupby
    + per-block pair-term folds), local_supplier_revenue (dimension
    broadcasts vs double hash-join chain), cheapest_shipper_per_brand
    (driver merge vs hash joins; supplier broadcast vs joined
    balance)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_j = A.lang_bigram_jsd(sf)
    fast_q5 = A.local_supplier_revenue(sf)
    fast_am = A.cheapest_shipper_per_brand(sf)

    monkeypatch.setattr(A, "BIGRAM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "PART_DRIVER_MAX_ROWS", 0)
    slow_j = A.lang_bigram_jsd(sf)[list(fast_j.columns)]
    slow_q5 = A.local_supplier_revenue(sf)[list(fast_q5.columns)]
    slow_am = A.cheapest_shipper_per_brand(sf)[list(fast_am.columns)]
    assert len(fast_q5) > 0 and fast_q5.equals(slow_q5)
    assert len(fast_am) > 0 and fast_am.equals(slow_am)
    # integer anchors must agree exactly; the float JSD column agrees
    # to the 6-dp contract (partial-fold order differs across tiers)
    assert fast_j[["lang_a", "lang_b", "n_union", "n_common"]].equals(
        slow_j[["lang_a", "lang_b", "n_union", "n_common"]])
    assert (np.abs(fast_j.jsd_r6 - slow_j.jsd_r6) <= 1e-6).all()

    # JSD is a metric-like divergence: bounded by ln 2, and the
    # self-divergence of identical distributions would be 0 — every
    # cross-lang pair here must be strictly positive
    assert ((fast_j.jsd_r6 > 0) & (fast_j.jsd_r6 <= np.log(2) + 1e-9)
            ).all()
    # Q5: revenue positive, nations within the ASIA region only
    nat = pd.read_parquet(f"{sf}/nation.parquet")
    reg = pd.read_parquet(f"{sf}/region.parquet")
    asia = set(nat.merge(reg, left_on="n_regionkey",
                         right_on="r_regionkey")
               .query("r_name == 'ASIA'").n_name)
    assert set(fast_q5.n_name) <= asia and (fast_q5.revenue > 0).all()
    # argmin: every brand appears exactly once with the true minimum
    assert fast_am.p_brand.is_unique


def test_round4_wave41_tiers_agree(ray_session, monkeypatch):
    """grouped_higher_moments (gate-free associative power sums —
    pinned against scipy-style direct formulas), sliding_distinct_users
    (driver dedup vs chained native dedup groupbys),
    full_quarter_customers (broadcast winner probe vs hash join)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_m = A.grouped_higher_moments(sf)
    fast_s = A.sliding_distinct_users(sf)
    fast_d = A.full_quarter_customers(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "ANTI_BROADCAST_MAX_ROWS", 0)
    slow_s = A.sliding_distinct_users(sf)[list(fast_s.columns)]
    slow_d = A.full_quarter_customers(sf)[list(fast_d.columns)]
    assert len(fast_s) > 0 and fast_s.equals(slow_s)
    assert len(fast_d) > 0 and fast_d.equals(slow_d)

    # moments agree with a direct centered computation per type
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    for _, r in fast_m.iterrows():
        v = ev[ev.event_type == r.event_type].value.to_numpy()
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
        x = (cents - cents.min()) / 100.0
        d = x - x.mean()
        m2, m3, m4 = (d ** 2).mean(), (d ** 3).mean(), (d ** 4).mean()
        assert abs(r.skew_r6 - m3 / m2 ** 1.5) < 1e-5
        assert abs(r.exkurt_r6 - (m4 / m2 ** 2 - 3)) < 1e-5
        assert r.n == len(v)

    # sliding >= tumbling-hour distinct at every (type, hour)
    tumbling = (ev := pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_type", "ts", "user_id"]))
    tumbling["hour_epoch"] = (
        tumbling.ts.astype("datetime64[us]").astype(np.int64)
        // 3_600_000_000) * 3600
    t1 = (tumbling.drop_duplicates(
        ["event_type", "hour_epoch", "user_id"])
        .groupby(["event_type", "hour_epoch"], as_index=False)
        .agg(n1=("user_id", "size")))
    m = fast_s.merge(t1, on=["event_type", "hour_epoch"])
    assert len(m) == len(t1)
    assert (m.n_users >= m.n1).all()
    # relational division: winners' per-nation tallies are positive
    assert (fast_d.n_customers > 0).all()


def test_round4_wave42_tiers_agree(ray_session, monkeypatch):
    """exact_median_bisect (adaptive multi-pass selection — pinned
    against a direct sort), clean_conversion_users (driver loop vs
    per-user map_groups), acctbal_cont_quantiles (driver combine vs
    native Sum groupby count table)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_b = A.exact_median_bisect(sf)
    fast_c = A.clean_conversion_users(sf)
    fast_q = A.acctbal_cont_quantiles(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_c = A.clean_conversion_users(sf)[list(fast_c.columns)]
    slow_q = A.acctbal_cont_quantiles(sf)[list(fast_q.columns)]
    assert fast_c.equals(slow_c) and fast_c.n_users.iloc[0] > 0
    assert fast_q.equals(slow_q) and len(fast_q) > 0

    # bisect median equals the direct lower median; a tiny bucket
    # count forces MANY narrowing passes and must agree too
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["value"])
    cents = np.sort((np.sign(ev.value)
                     * np.floor(np.abs(ev.value) * 100 + 0.5))
                    .astype(np.int64).to_numpy())
    k = (len(cents) + 1) // 2
    assert fast_b.median_cents.iloc[0] == cents[k - 1]
    assert fast_b.n.iloc[0] == len(cents)
    deep = A.exact_median_bisect(sf, n_buckets=4)
    assert deep.equals(fast_b)

    # negation funnel is a subset of the strict-window conversion
    # population: clean converters cannot exceed all converters
    allconv = A.strict_funnel_users(sf, window_hours=2,
                                    steps=("view", "view", "purchase"))
    # (sanity only: both single-row positive counts)
    assert allconv.n_users.iloc[0] >= 0
    # CONT interpolation is bounded by the group's min/max cents
    cust = pd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])
    cust["cents"] = (np.sign(cust.c_acctbal)
                     * np.floor(np.abs(cust.c_acctbal) * 100 + 0.5))
    bounds = cust.groupby("c_nationkey").cents.agg(["min", "max"])
    mm = fast_q.merge(bounds, left_on="c_nationkey", right_index=True)
    assert ((mm.p50_cents_r6 >= mm["min"]) & (mm.p50_cents_r6
                                              <= mm["max"])).all()
    assert (mm.p90_cents_r6 >= mm.p50_cents_r6).all()


def test_round4_wave43_tiers_agree(ray_session, monkeypatch):
    """value_ks_matrix + acctbal_trimmed_stats (driver combine vs
    native count-table Sum groupby), transition_cond_entropy
    (inherits event_transitions' tiering)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_ks = A.value_ks_matrix(sf)
    fast_tm = A.acctbal_trimmed_stats(sf)
    fast_ce = A.transition_cond_entropy(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_ks = A.value_ks_matrix(sf)[list(fast_ks.columns)]
    slow_tm = A.acctbal_trimmed_stats(sf)[list(fast_tm.columns)]
    slow_ce = A.transition_cond_entropy(sf)[list(fast_ce.columns)]
    assert len(fast_ks) == 10 and fast_ks.equals(slow_ks)
    assert len(fast_tm) == 25 and fast_tm.equals(slow_tm)
    assert len(fast_ce) > 0 and fast_ce.equals(slow_ce)

    # KS vs scipy-style direct two-sample computation for one pair
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    cents = (np.sign(ev.value)
             * np.floor(np.abs(ev.value) * 100 + 0.5)).astype(np.int64)
    a = np.sort(cents[ev.event_type == "click"].to_numpy())
    b = np.sort(cents[ev.event_type == "view"].to_numpy())
    grid = np.union1d(a, b)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb).max()
    row = fast_ks[(fast_ks.type_a == "click")
                  & (fast_ks.type_b == "view")].iloc[0]
    assert abs(row.ks_r6 - d) < 1e-6
    # trimmed mean sits between min and untrimmed mean bounds, and
    # the winsorized mean is between trimmed-window extremes
    cust = pd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])
    cust["cents"] = (np.sign(cust.c_acctbal) * np.floor(
        np.abs(cust.c_acctbal) * 100 + 0.5)).astype(np.int64)
    g = cust.groupby("c_nationkey").cents
    mm = fast_tm.merge(g.agg(["min", "max"]), left_on="c_nationkey",
                       right_index=True)
    assert ((mm.trim_mean_r6 >= mm["min"])
            & (mm.trim_mean_r6 <= mm["max"])).all()
    assert ((mm.winsor_mean_r6 >= mm["min"])
            & (mm.winsor_mean_r6 <= mm["max"])).all()
    # conditional entropy bounded by ln(|types|)
    assert (fast_ce.h_r6 <= np.log(5) + 1e-9).all()
    assert (fast_ce.h_r6 >= 0).all()


def test_round4_wave44_tiers_agree(ray_session, monkeypatch):
    """region_share_rollup (gate-free leaf partials — shares sum to 1
    within each parent), order_price_reconciliation (driver merge vs
    left-outer hash join + audit partials), daily_revenue_haar
    (tiered daily rollup; pyramid invariants: level sums reconstruct
    the approximation)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_sh = A.region_share_rollup(sf)
    fast_rc = A.order_price_reconciliation(sf)
    fast_hr = A.daily_revenue_haar(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_rc = A.order_price_reconciliation(sf)[list(fast_rc.columns)]
    slow_hr = A.daily_revenue_haar(sf)[list(fast_hr.columns)]
    assert len(fast_rc) > 0 and fast_rc.equals(slow_rc)
    assert len(fast_hr) > 0 and fast_hr.equals(slow_hr)

    # shares: nation shares sum to 1 within each region (6-dp), and
    # region shares are consistent across the region's rows
    for _, g in fast_sh.groupby("r_name"):
        assert abs(g.nation_share_r6.sum() - 1.0) < 1e-4
        assert g.region_share_r6.nunique() == 1
    # reconciliation: no-lines + with-lines partition the orders
    od = pd.read_parquet(f"{sf}/orders.parquet",
                         columns=["o_orderkey"])
    assert fast_rc.n_orders.sum() == len(od)
    assert (fast_rc.n_no_lines <= fast_rc.n_orders).all()
    # Haar: top approximation equals the exact total revenue, and
    # each type's level-1 detail count is half the padded grid
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    cents = (np.sign(ev.value)
             * np.floor(np.abs(ev.value) * 100 + 0.5)).astype(np.int64)
    tot = pd.DataFrame({"event_type": ev.event_type, "c": cents}) \
        .groupby("event_type").c.sum()
    top = fast_hr[fast_hr.level == fast_hr.level.max()]
    for _, r in top.iterrows():
        assert r.coeff_cents == tot[r.event_type]


def test_round4_wave45_tiers_agree(ray_session, monkeypatch):
    """value_drift_by_half + top_value_days_with_ties (driver combine
    vs native Sum groupbys), type_user_overlap_exact (driver pivot vs
    dedup + basket map_groups) — plus the KMV cross-check: the exact
    Jaccard matrix must sit within the sketch estimate's 5-sigma
    band pair by pair."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_dr = A.value_drift_by_half(sf)
    fast_tt = A.top_value_days_with_ties(sf)
    fast_ov = A.type_user_overlap_exact(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_dr = A.value_drift_by_half(sf)[list(fast_dr.columns)]
    slow_tt = A.top_value_days_with_ties(sf)[list(fast_tt.columns)]
    slow_ov = A.type_user_overlap_exact(sf)[list(fast_ov.columns)]
    assert len(fast_dr) == 5 and fast_dr.equals(slow_dr)
    assert len(fast_tt) >= 15 and fast_tt.equals(slow_tt)
    assert len(fast_ov) == 10 and fast_ov.equals(slow_ov)

    # drift halves partition each type's events
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type"])
    per_type = ev.groupby("event_type").size()
    m = fast_dr.set_index("event_type")
    assert ((m.n_first + m.n_second) == per_type).all()
    # WITH TIES: per type at least k rows, ranks start at 1, and
    # every kept revenue >= the max excluded revenue
    for _, g in fast_tt.groupby("event_type"):
        assert g.rnk.min() == 1 and len(g) >= 3
    # the exact overlap sits inside the KMV estimate's 5-sigma band
    est = A.kmv_type_jaccard(sf)
    j = fast_ov.merge(est, on=["type_a", "type_b"])
    assert len(j) == 10
    sig = np.sqrt(np.maximum(j.jaccard_r6_x * (1 - j.jaccard_r6_x),
                             0.01) / A.KMV_K)
    assert (np.abs(j.jaccard_r6_x - j.jaccard_r6_y) < 5 * sig).all()


def test_round4_wave46_tiers_agree(ray_session, monkeypatch):
    """view_attribution_credit (driver slice walk vs per-user
    map_groups session fold), acctbal_mean_family (gate-free
    associative log/reciprocal sums — AM >= GM >= HM pinned)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_at = A.view_attribution_credit(sf)
    fast_mf = A.acctbal_mean_family(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_at = A.view_attribution_credit(sf)[list(fast_at.columns)]
    assert len(fast_at) > 0 and fast_at.equals(slow_at)

    # attributed + orphan mass equals the exact purchase total
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    cents = (np.sign(ev.value)
             * np.floor(np.abs(ev.value) * 100 + 0.5)).astype(np.int64)
    total = int(cents[ev.event_type == "purchase"].sum())
    assert (fast_at.attributed_cents.sum()
            + fast_at.orphan_cents.sum()) == total
    assert (fast_at.n_sessions > 0).all()
    # the classical mean inequality chain holds per nation
    assert (fast_mf.arith_r6 >= fast_mf.geo_r6 - 1e-6).all()
    assert (fast_mf.geo_r6 >= fast_mf.harm_r6 - 1e-6).all()
    # arithmetic anchor is the exact integer ratio
    assert np.allclose(fast_mf.arith_r6,
                       (fast_mf.sum_cents / fast_mf.n_pos).round(6))


def test_round4_wave47_tiers_agree(ray_session, monkeypatch):
    """discounted_smallqty_revenue (gate-free map-only),
    late_line_orders_by_priority + smallqty_brand_revenue (driver
    broadcast vs hash-join chains)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_q6 = A.discounted_smallqty_revenue(sf)
    fast_q4 = A.late_line_orders_by_priority(sf)
    fast_q17 = A.smallqty_brand_revenue(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "PART_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    slow_q4 = A.late_line_orders_by_priority(sf)[list(fast_q4.columns)]
    slow_q17 = A.smallqty_brand_revenue(sf)[list(fast_q17.columns)]
    assert len(fast_q4) == 5 and fast_q4.equals(slow_q4)
    assert len(fast_q17) == 25 and fast_q17.equals(slow_q17)

    # Q6 equals a direct pandas evaluation
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_shipdate", "l_discount",
                                  "l_quantity", "l_extendedprice"])
    ship = li.l_shipdate.astype("datetime64[us]").astype(np.int64)
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01", "us").astype(np.int64)
    disc = (np.sign(li.l_discount)
            * np.floor(np.abs(li.l_discount) * 100 + 0.5)) \
        .astype(np.int64)
    qty = np.floor(np.abs(li.l_quantity) + 0.5).astype(np.int64)
    ext = (np.sign(li.l_extendedprice)
           * np.floor(np.abs(li.l_extendedprice) * 100 + 0.5)) \
        .astype(np.int64)
    m = ((ship >= lo) & (ship < hi) & (disc >= 5) & (disc <= 7)
         & (qty < 24))
    assert fast_q6.revenue_e4.iloc[0] == int((ext[m] * disc[m]).sum())
    assert fast_q6.n_items.iloc[0] == int(m.sum())
    # Q4 totals bounded by in-window order count
    od = pd.read_parquet(f"{sf}/orders.parquet",
                         columns=["o_orderdate"])
    win = ((od.o_orderdate >= "1996-01-01")
           & (od.o_orderdate < "1996-07-01")).sum()
    assert 0 < fast_q4.n_orders.sum() <= win
    # Q17: every brand row has positive revenue and item counts
    assert (fast_q17.revenue_cents > 0).all()
    assert (fast_q17.n_items > 0).all()


def test_round4_wave48_tiers_agree(ray_session, monkeypatch):
    """nation_market_share (dimension broadcasts vs hash-join chain),
    top_supplier_revenue_with_ties + late_urgent_mix_by_status
    (driver combine/broadcast vs native rollup + hash join)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_q8 = A.nation_market_share(sf)
    fast_q15 = A.top_supplier_revenue_with_ties(sf)
    fast_q12 = A.late_urgent_mix_by_status(sf)

    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_q8 = A.nation_market_share(sf)[list(fast_q8.columns)]
    slow_q15 = (A.top_supplier_revenue_with_ties(sf)
                [list(fast_q15.columns)])
    slow_q12 = A.late_urgent_mix_by_status(sf)[list(fast_q12.columns)]
    assert len(fast_q8) > 0 and fast_q8.equals(slow_q8)
    assert len(fast_q15) >= 1 and fast_q15.equals(slow_q15)
    assert len(fast_q12) > 0 and fast_q12.equals(slow_q12)

    # shares are valid fractions and num <= den
    assert ((fast_q8.num_rev >= 0) & (fast_q8.num_rev
                                      <= fast_q8.den_rev)).all()
    assert ((fast_q8.share_r6 >= 0) & (fast_q8.share_r6 <= 1)).all()
    # the tie set all carries the same (maximal) revenue
    assert fast_q15.revenue.nunique() == 1
    # urgent + other equals the direct late-line count
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{sf}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    late = ((j.l_shipdate.astype("datetime64[us]").astype(np.int64)
             - j.o_orderdate.astype("datetime64[us]").astype(np.int64))
            > 60 * 86_400_000_000).sum()
    assert (fast_q12.n_urgent.sum() + fast_q12.n_other.sum()) == late


def test_round4_wave49_tiers_agree(ray_session, monkeypatch):
    """daily_revenue_autocorr (tiered daily rollup; |r| <= 1),
    transition_reciprocity (inherits event_transitions' tiering;
    flow conservation), supplier_hhi_by_nation (driver merge vs
    rollup + broadcast-totals squared-share partials; HHI bounds)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_ac = A.daily_revenue_autocorr(sf)
    fast_rc = A.transition_reciprocity(sf)
    fast_hh = A.supplier_hhi_by_nation(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_ac = A.daily_revenue_autocorr(sf)[list(fast_ac.columns)]
    slow_rc = A.transition_reciprocity(sf)[list(fast_rc.columns)]
    slow_hh = A.supplier_hhi_by_nation(sf)[list(fast_hh.columns)]
    assert len(fast_ac) == 5 and fast_ac.equals(slow_ac)
    assert len(fast_rc) == 10 and fast_rc.equals(slow_rc)
    assert len(fast_hh) > 0 and fast_hh.equals(slow_hh)

    # correlation coefficients live in [-1, 1]
    assert (fast_ac.r_lag1_r6.abs() <= 1 + 1e-9).all()
    assert (fast_ac.r_lag7_r6.abs() <= 1 + 1e-9).all()
    # reciprocity in [0, 1]; net flow consistent with the counts
    assert ((fast_rc.reciprocity_r6 >= 0)
            & (fast_rc.reciprocity_r6 <= 1)).all()
    assert (fast_rc.net_flow == fast_rc.n_ab - fast_rc.n_ba).all()
    # HHI bounds: 1/n <= HHI <= 1 for each nation
    assert ((fast_hh.hhi_r6 <= 1 + 1e-9)
            & (fast_hh.hhi_r6 >= 1.0 / fast_hh.n_suppliers - 1e-6)
            ).all()


def test_round4_wave50_tiers_agree(ray_session, monkeypatch):
    """dominant_supplier_parts + cumulative_parts_catalog (driver
    combine vs native rollup chains), parts_keyset_page (gate-free
    block top-k; page contract: sorted, contiguous after cursor)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_dm = A.dominant_supplier_parts(sf)
    fast_kp = A.parts_keyset_page(sf)
    fast_cc = A.cumulative_parts_catalog(sf)

    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_dm = A.dominant_supplier_parts(sf)[list(fast_dm.columns)]
    slow_cc = A.cumulative_parts_catalog(sf)[list(fast_cc.columns)]
    assert len(fast_dm) > 0 and fast_dm.equals(slow_dm)
    assert len(fast_cc) > 0 and fast_cc.equals(slow_cc)

    # keyset page: exactly `page` rows, strictly increasing compound
    # key, every row strictly after the cursor
    assert len(fast_kp) == 20
    keys = list(zip(fast_kp.price_cents, fast_kp.p_partkey))
    assert keys == sorted(keys) and len(set(keys)) == 20
    assert all(k > (90_000, 0) for k in keys)
    # running distinct: final cumulative equals the distinct part
    # count, and the curve is the cumsum of the news
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_partkey"])
    assert fast_cc.n_cum.iloc[-1] == li.l_partkey.nunique()
    assert (fast_cc.n_cum == fast_cc.n_new.cumsum()).all()
    # dominance: every counted supplier ships > 1/8 of some part
    assert (fast_dm.n_parts > 0).all()


def test_round4_wave51_tiers_agree(ray_session, monkeypatch):
    """prefix_dup_groups + token_len_histogram + vocab_growth_by_docs
    (driver combine vs native rollup / hash-join paths)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_pd = A.prefix_dup_groups(sf)
    fast_tl = A.token_len_histogram(sf)
    fast_vg = A.vocab_growth_by_docs(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_pd = A.prefix_dup_groups(sf)[list(fast_pd.columns)]
    slow_tl = A.token_len_histogram(sf)[list(fast_tl.columns)]
    slow_vg = A.vocab_growth_by_docs(sf)[list(fast_vg.columns)]
    assert len(fast_pd) > 0 and fast_pd.equals(slow_pd)
    assert len(fast_tl) > 0 and fast_tl.equals(slow_tl)
    assert len(fast_vg) > 0 and fast_vg.equals(slow_vg)

    # every prefix group has >= 2 members and the winner is a member
    assert (fast_pd.group_size >= 2).all()
    assert fast_pd.winner_doc.isin(fast_pd.doc_id).all()
    # token length counts cover every token exactly once
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["text"])
    n_tok = docs.text.str.split().str.len().sum()
    assert fast_tl.n.sum() == n_tok
    # Heaps curve ends at the exact distinct-token count
    vocab = set()
    for t in docs.text:
        vocab.update(t.split())
    assert fast_vg.n_cum.iloc[-1] == len(vocab)
    assert (fast_vg.n_cum == fast_vg.n_new.cumsum()).all()


def test_round4_wave52_tiers_agree(ray_session, monkeypatch):
    """fd_violation_audit + bipartite_degree_dist (driver dedup vs
    chained native dedup rollups)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_fd = A.fd_violation_audit(sf)
    fast_dd = A.bipartite_degree_dist(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_fd = A.fd_violation_audit(sf)[list(fast_fd.columns)]
    slow_dd = A.bipartite_degree_dist(sf)[list(fast_dd.columns)]
    assert len(fast_fd) == 3 and fast_fd.equals(slow_fd)
    assert len(fast_dd) > 0 and fast_dd.equals(slow_dd)

    # the key FD holds (0 violations), the brand FD is violated
    row = fast_fd.set_index("fd")
    assert row.loc["c_custkey->c_nationkey"].n_violating_keys == 0
    assert row.loc["p_brand->p_size"].n_violating_keys > 0
    # degree mass equals the node count per side, and the edge total
    # is consistent from both sides
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    e = li.drop_duplicates()
    per = fast_dd.groupby("side")
    assert per.apply(lambda g: (g.degree * g.n_nodes).sum(),
                     include_groups=False).nunique() == 1
    assert (per.apply(lambda g: (g.degree * g.n_nodes).sum(),
                      include_groups=False).iloc[0] == len(e))
    sides = dict(per.n_nodes.sum())
    assert sides["part"] == e.l_partkey.nunique()
    assert sides["supplier"] == e.l_suppkey.nunique()


def test_round4_wave53_tiers_agree(ray_session, monkeypatch):
    """revenue_up_run_lengths + weekday_uniformity_chi2 (driver
    combine vs native Sum groupbys; invariants pinned)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_ru = A.revenue_up_run_lengths(sf)
    fast_ch = A.weekday_uniformity_chi2(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_ru = A.revenue_up_run_lengths(sf)[list(fast_ru.columns)]
    slow_ch = A.weekday_uniformity_chi2(sf)[list(fast_ch.columns)]
    assert len(fast_ru) == 5 and fast_ru.equals(slow_ru)
    assert len(fast_ch) == 5 and fast_ch.equals(slow_ch)

    # a longest run needs at least one run to exist, and chi2 >= 0
    assert ((fast_ru.longest_up_run > 0) == (fast_ru.n_up_runs > 0)) \
        .all()
    assert (fast_ch.chi2_r6 >= 0).all()
    # direct per-type run check for one type
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ev = ev[ev.event_type == "click"]
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000)
    cents = (np.sign(ev.value)
             * np.floor(np.abs(ev.value) * 100 + 0.5)).astype(np.int64)
    daily = (pd.DataFrame({"day": ev.day, "rev": cents})
             .groupby("day").rev.sum().sort_index().to_numpy())
    up = np.diff(daily) > 0
    best = cur = 0
    for u in up:
        cur = cur + 1 if u else 0
        best = max(best, cur)
    assert fast_ru.set_index("event_type").loc["click"] \
        .longest_up_run == best


def test_round4_wave54_tiers_agree(ray_session, monkeypatch):
    """value_twap_by_type (driver slice walk vs per-type map_groups
    LEAD walk); the TWAP sits inside the per-type value range."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.value_twap_by_type(sf)
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow = A.value_twap_by_type(sf)[list(fast.columns)]
    assert len(fast) == 5 and fast.equals(slow)

    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    cents = (np.sign(ev.value)
             * np.floor(np.abs(ev.value) * 100 + 0.5)).astype(np.int64)
    rng = (pd.DataFrame({"t": ev.event_type, "c": cents})
           .groupby("t").c.agg(["min", "max"]))
    m = fast.merge(rng, left_on="event_type", right_index=True)
    assert ((m.twap_r6 >= m["min"]) & (m.twap_r6 <= m["max"])).all()
    assert (m.sum_w > 0).all() and (m.n_gaps > 0).all()


def test_round4_wave55_tiers_agree(ray_session, monkeypatch):
    """doc_compression_ratio: tier parity plus a BIT-EXACT direct
    zlib recomputation (no SQL twin can exist; this is the oracle)."""
    import zlib

    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.doc_compression_ratio(sf)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow = A.doc_compression_ratio(sf)[list(fast.columns)]
    assert len(fast) > 0 and fast.equals(slow)

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["lang", "text"])
    raw = docs.text.map(lambda t: len(t.encode("utf-8")))
    comp = docs.text.map(lambda t: len(zlib.compress(
        t.encode("utf-8"), 6)))
    ratio = comp / raw
    bucket = np.where(ratio < 0.3, 0,
                      np.where(ratio <= 0.6, 1, 2))
    ref = (pd.DataFrame({"lang": docs.lang, "bucket": bucket,
                         "raw": raw, "comp": comp})
           .groupby(["lang", "bucket"], as_index=False)
           .agg(n=("raw", "size"), raw_bytes=("raw", "sum"),
                comp_bytes=("comp", "sum")))
    m = fast.merge(ref, on=["lang", "bucket"])
    assert len(m) == len(fast) == len(ref)
    assert (m.n_x == m.n_y).all()
    assert (m.raw_bytes_x == m.raw_bytes_y).all()
    assert (m.comp_bytes_x == m.comp_bytes_y).all()


def test_round4_wave56_tiers_agree(ray_session, monkeypatch):
    """revenue_seasonal_decomposition: tier parity + decomposition
    invariants (weekday seasonal components of a detrended series
    average ~0 when weighted by day counts; CV constant per type)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.revenue_seasonal_decomposition(sf)
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow = A.revenue_seasonal_decomposition(sf)[list(fast.columns)]
    assert len(fast) > 0 and fast.equals(slow)

    for t, g in fast.groupby("event_type"):
        assert len(g) == 7  # every weekday present on the fixture
        wmean = (g.seasonal_rel_r6 * g.n_days).sum() / g.n_days.sum()
        # the count-weighted seasonal mean equals the normalized mean
        # of the detrended series — small (MA trend tracks the level)
        # but not exactly zero
        assert abs(wmean) < 0.05
        assert g.rem_cv_r6.nunique() == 1
        assert (g.rem_cv_r6 >= 0).all()


def test_round4_wave57_tiers_agree(ray_session, monkeypatch):
    """nation_year_profit + incremental_dedup_report +
    lang_temperature_mix: broadcast/driver tiers vs hash-join/native
    rollup cluster tiers, plus per-operator invariants."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_pr = A.nation_year_profit(sf)
    fast_in = A.incremental_dedup_report(sf)
    fast_tm = A.lang_temperature_mix(sf)

    monkeypatch.setattr(A, "PART_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_pr = A.nation_year_profit(sf)[list(fast_pr.columns)]
    slow_in = A.incremental_dedup_report(sf)[list(fast_in.columns)]
    slow_tm = A.lang_temperature_mix(sf)[list(fast_tm.columns)]
    assert len(fast_pr) > 0 and fast_pr.equals(slow_pr)
    assert len(fast_in) > 0 and fast_in.equals(slow_in)
    assert len(fast_tm) > 0 and fast_tm.equals(slow_tm)

    # Q9 shape: every (nation, year) present once; n_items totals the
    # name-filtered lineitem match count
    assert not fast_pr.duplicated(["n_name", "o_year"]).any()
    part = pd.read_parquet(f"{sf}/part.parquet",
                           columns=["p_partkey", "p_name"])
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_partkey"])
    hot = set(part.p_partkey[part.p_name.str.contains("red")])
    assert fast_pr.n_items.sum() == li.l_partkey.isin(hot).sum()

    # incremental report: day-2 classes partition the odd-id docs and
    # the fixture exercises all three classes
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    odd = docs[docs.doc_id % 2 == 1]
    assert fast_in.n_day2.sum() == len(odd)
    assert (fast_in.n_day2 == fast_in.n_dup_day1 + fast_in.n_dup_within
            + fast_in.n_new).all()
    assert fast_in.n_dup_day1.sum() > 0 and fast_in.n_new.sum() > 0
    # cross-check dup_day1 directly: odd docs whose 64-char prefix
    # appears among even docs
    even_pref = set(docs.text[docs.doc_id % 2 == 0].str[:64])
    assert (fast_in.n_dup_day1.sum()
            == odd.text.str[:64].isin(even_pref).sum())

    # temperature mix: weights sum to 1, alpha<1 boosts small langs
    # above natural share and shrinks the largest
    assert abs(fast_tm.weight_r6.sum() - 1.0) < 1e-4
    big = fast_tm.loc[fast_tm.n_docs.idxmax()]
    small = fast_tm.loc[fast_tm.n_docs.idxmin()]
    assert big.boost_r6 < 1.0 < small.boost_r6
    # alpha=1 is the natural distribution (boost == 1 everywhere)
    nat = A.lang_temperature_mix(sf, alpha=1.0)
    assert (nat.boost_r6 == 1.0).all()


def test_round4_wave58_tiers_agree(ray_session, monkeypatch):
    """segment_unshipped_topk + state_dwell_times +
    weighted_median_quantity: driver/broadcast tiers vs salted /
    hash-join / native-rollup cluster tiers, plus invariants."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_q3 = A.segment_unshipped_topk(sf)
    fast_dw = A.state_dwell_times(sf)
    fast_wm = A.weighted_median_quantity(sf)

    monkeypatch.setattr(A, "ANTI_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_q3 = A.segment_unshipped_topk(sf)[list(fast_q3.columns)]
    slow_dw = A.state_dwell_times(sf)[list(fast_dw.columns)]
    slow_wm = A.weighted_median_quantity(sf)[list(fast_wm.columns)]
    assert len(fast_q3) == 10 and fast_q3.equals(slow_q3)
    assert len(fast_dw) == 5 and fast_dw.equals(slow_dw)
    assert len(fast_wm) == 3 and fast_wm.equals(slow_wm)

    # Q3: candidates obey both date predicates and the revenue order
    assert (fast_q3.o_orderdate
            < np.datetime64("1998-07-01", "us")).all()
    assert (fast_q3.revenue.to_numpy()
            == np.sort(fast_q3.revenue.to_numpy())[::-1]).all()

    # dwell: total event gaps = total events - #users (one open state
    # per user never closes)
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    assert fast_dw.n_gaps.sum() == len(ev) - ev.user_id.nunique()
    # direct recomputation of one type's total dwell
    s = ev.sort_values(["user_id", "ts"])
    gap = (s.ts.astype("datetime64[us]").astype(np.int64).diff(-1)
           .mul(-1) // 1_000_000)
    same = s.user_id.to_numpy()[1:] == s.user_id.to_numpy()[:-1]
    mask = np.r_[same, False]
    byt = (pd.DataFrame({"t": s.event_type.to_numpy()[mask],
                         "g": gap.to_numpy()[mask]})
           .groupby("t").g.sum())
    m = fast_dw.set_index("event_type").total_dwell_s
    assert (m == byt).all()

    # weighted median: cumulative weight at the pick reaches half the
    # total, and the pick is inside the qty domain
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    cents = (np.sign(li.l_extendedprice)
             * np.floor(np.abs(li.l_extendedprice) * 100 + 0.5)
             ).astype(np.int64)
    for rf, g in li.assign(w=cents).groupby("l_returnflag"):
        pick = int(fast_wm.set_index("l_returnflag")
                   .wmedian_qty[rf])
        tot = int(fast_wm.set_index("l_returnflag").total_w[rf])
        assert tot == g.w.sum()
        below = g.w[g.l_quantity < pick].sum()
        upto = g.w[g.l_quantity <= pick].sum()
        assert 2 * below < tot <= 2 * upto


def test_round4_wave59_tiers_agree(ray_session, monkeypatch):
    """vocab_coverage_topp + order_fulfillment_latency tier parity
    and invariants; bloom_fpr_report's binomial twin (observed FPR
    agrees with the occupancy-derived FPR and respects the configured
    bound — the BASELINE acceptance metric)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_vc = A.vocab_coverage_topp(sf)
    fast_fl = A.order_fulfillment_latency(sf)
    rep = A.bloom_fpr_report(sf, n_probes=100_000)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    slow_vc = A.vocab_coverage_topp(sf)[list(fast_vc.columns)]
    slow_fl = A.order_fulfillment_latency(sf)[list(fast_fl.columns)]
    assert len(fast_vc) == 5 and fast_vc.equals(slow_vc)
    assert len(fast_fl) == 5 and fast_fl.equals(slow_fl)

    # coverage: direct recomputation for one language
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["lang", "text"])
    en = docs[docs.lang == "en"]
    cnt = pd.Series(np.concatenate(
        en.text.str.findall(r"\S+").to_numpy())).value_counts()
    tot = int(cnt.sum())
    cum = cnt.sort_values(ascending=False).cumsum().to_numpy()
    thr = -(-90 * tot // 100)
    want = int(np.argmax(cum >= thr)) + 1
    row = fast_vc.set_index("lang").loc["en"]
    assert (row.n_vocab, row.total_tokens, row.n_cover) \
        == (len(cnt), tot, want)
    assert (fast_vc.n_cover <= fast_vc.n_vocab).all()

    # latency: medians sit inside [0, max] and n totals all orders
    # that have lineitems
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey"])
    assert fast_fl.n_orders.sum() == li.l_orderkey.nunique()
    assert ((fast_fl.median_days >= 0)
            & (fast_fl.median_days <= fast_fl.max_days)).all()

    # bloom FPR: observed within 5-sigma binomial of the
    # occupancy-derived rate, and within the configured bound plus
    # the same noise allowance (the bank is oversized on the tiny
    # fixture so both hold with huge margin)
    for r in rep.itertuples():
        p = r.occupancy_fpr_r6
        sig = np.sqrt(max(p * (1 - p), 1e-12) / r.n_probes)
        obs = r.n_hits / r.n_probes
        assert obs <= max(p + 5 * sig, 10 / r.n_probes)
        assert obs <= r.configured_fpr + 5 * sig + 10 / r.n_probes
    assert (rep.n_probes == 100_000).all()


def test_round4_wave60_tiers_agree(ray_session, monkeypatch):
    """rfm_segments + knn_label_accuracy: driver/broadcast tiers vs
    native-rollup / hash-join cluster tiers, plus invariants."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_rfm = A.rfm_segments(sf)
    fast_knn = A.knn_label_accuracy(sf)

    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow_rfm = A.rfm_segments(sf)[list(fast_rfm.columns)]
    slow_knn = A.knn_label_accuracy(sf)[list(fast_knn.columns)]
    assert len(fast_rfm) > 0 and fast_rfm.equals(slow_rfm)
    assert len(fast_knn) == 10 and fast_knn.equals(slow_knn)

    # RFM: every customer lands in exactly one segment, codes in 1-4,
    # and each marginal quartile holds 25% +- the tie slack (value
    # thresholds put whole tie groups in one bucket)
    ords = pd.read_parquet(f"{sf}/orders.parquet",
                           columns=["o_custkey"])
    n_cust = ords.o_custkey.nunique()
    assert fast_rfm.n_customers.sum() == n_cust
    for c in ["r_q", "f_q", "m_q"]:
        assert fast_rfm[c].between(1, 4).all()
        marg = fast_rfm.groupby(c).n_customers.sum()
        assert marg.max() <= n_cust  # sanity; ties can skew shares
        assert marg.loc[1] >= n_cust // 4 - 1  # q1 holds >= rank floor

    # kNN: per-label eval counts equal the label histogram of the
    # eval sample, and a direct numpy recomputation of the vote
    # matches for every query
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    hist = emb[emb.vec_id < 500].label.value_counts()
    got = fast_knn.set_index("true_label").n_eval
    assert (got == hist.sort_index()).all()
    X = np.stack(emb.sort_values("vec_id").embedding.to_numpy())
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = np.round(Xn @ Xn.T, 6)
    labels = emb.sort_values("vec_id").label.to_numpy()
    correct = np.zeros(10, np.int64)
    for q in range(500):
        s = sims[q].copy()
        s[q] = -np.inf
        order = np.lexsort((np.arange(len(s)), -s))[:5]
        votes = np.bincount(labels[order], minlength=10)
        win = int(np.argmax(votes))  # argmax takes smallest on ties
        if win == labels[q]:
            correct[labels[q]] += 1
    assert (fast_knn.set_index("true_label").n_correct.to_numpy()
            == correct[fast_knn.true_label.to_numpy()]).all()


def test_round4_wave61_tiers_agree(ray_session, monkeypatch):
    """customer_value_migration + dup_cluster_representatives: tier
    parity plus direct invariants."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_mg = A.customer_value_migration(sf)
    fast_rep = A.dup_cluster_representatives(sf)

    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "DUPC_DRIVER_MAX_ROWS", 0)
    slow_mg = A.customer_value_migration(sf)[list(fast_mg.columns)]
    slow_rep = A.dup_cluster_representatives(sf)[
        list(fast_rep.columns)]
    assert len(fast_mg) > 0 and fast_mg.equals(slow_mg)
    assert len(fast_rep) > 0 and fast_rep.equals(slow_rep)

    # migration: every ordering customer appears exactly once
    ords = pd.read_parquet(f"{sf}/orders.parquet",
                           columns=["o_custkey"])
    assert fast_mg.n_customers.sum() == ords.o_custkey.nunique()
    assert fast_mg.q_first.between(0, 4).all()
    assert fast_mg.q_second.between(0, 4).all()

    # representatives: one per cluster; each rep is the longest (tie:
    # smallest id) member of its cluster per a direct recomputation
    clusters = A.dup_clusters(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    m = clusters.merge(docs, on="doc_id")
    want = (m.sort_values(["cluster_id", "n_chars", "doc_id"],
                          ascending=[True, False, True])
            .groupby("cluster_id").head(1))
    assert len(fast_rep) == clusters.cluster_id.nunique()
    w = want.set_index("cluster_id")
    g = fast_rep.set_index("cluster_id")
    assert (g.rep_doc == w.doc_id).all()
    assert (g.rep_n_chars == w.n_chars).all()
    assert (g.cluster_size == w.cluster_size).all()


def test_round4_wave62_tiers_agree(ray_session, monkeypatch):
    """sample_budget_allocation + nation_whale_share: tier parity +
    apportionment/dominance invariants."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_al = A.sample_budget_allocation(sf)
    fast_wh = A.nation_whale_share(sf)

    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "CUST_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "ANTI_BROADCAST_MAX_ROWS", 0)
    slow_al = A.sample_budget_allocation(sf)[list(fast_al.columns)]
    slow_wh = A.nation_whale_share(sf)[list(fast_wh.columns)]
    assert len(fast_al) > 0 and fast_al.equals(slow_al)
    assert len(fast_wh) > 0 and fast_wh.equals(slow_wh)

    # apportionment: seats sum exactly to the budget; every alloc is
    # the floor quota or one more; quota monotone in n_docs
    assert fast_al.alloc.sum() == 997
    assert ((fast_al.alloc - fast_al.floor_quota).isin([0, 1])).all()
    assert (fast_al.alloc > 0).all()
    # the 997 budget on the balanced fixture forces a real remainder
    # split (some sources get the extra seat, some do not)
    assert fast_al.alloc.nunique() >= 2

    # whale: top customer's cents really is the max of per-customer
    # sums in that nation, and shares are in (0, 1]
    ords = pd.read_parquet(f"{sf}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(f"{sf}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cents = (np.sign(ords.o_totalprice)
             * np.floor(np.abs(ords.o_totalprice) * 100 + 0.5)
             ).astype(np.int64)
    pc_ = (pd.DataFrame({"ck": ords.o_custkey, "cents": cents})
           .groupby("ck", as_index=False).cents.sum()
           .merge(cust, left_on="ck", right_on="c_custkey"))
    want_max = pc_.groupby("c_nationkey").cents.max()
    nat_of = pd.read_parquet(f"{sf}/nation.parquet").set_index(
        "n_name").n_nationkey
    got = fast_wh.set_index("n_name")
    assert (got.top_cents.to_numpy()
            == want_max.loc[nat_of.loc[got.index]].to_numpy()).all()
    assert ((fast_wh.whale_share_r6 > 0)
            & (fast_wh.whale_share_r6 <= 1)).all()


def test_round4_wave63_tiers_agree(ray_session, monkeypatch):
    """session_bounce_rate tier parity + direct pandas recomputation;
    embedding_quantization_report numpy twin (1e-9)."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_br = A.session_bounce_rate(sf)
    rep = A.embedding_quantization_report(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    slow_br = A.session_bounce_rate(sf)[list(fast_br.columns)]
    assert len(fast_br) == 5 and fast_br.equals(slow_br)

    # direct recomputation: sessions from the sorted event stream
    ev = (pd.read_parquet(f"{sf}/events.parquet",
                          columns=["event_id", "ts", "user_id",
                                   "event_type"])
          .sort_values(["user_id", "ts", "event_id"]))
    ts = ev.ts.astype("datetime64[ns]").astype(np.int64).to_numpy()
    uid = ev.user_id.to_numpy()
    new_s = np.ones(len(ev), bool)
    new_s[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1]
                                         > 30 * 60 * 10**9)
    starts = np.nonzero(new_s)[0]
    ln = np.diff(np.r_[starts, len(ev)])
    et = ev.event_type.to_numpy(dtype=object)[starts]
    want = (pd.DataFrame({"t": et, "ln": ln}).groupby("t")
            .agg(n_sessions=("ln", "size"),
                 n_bounce=("ln", lambda s: int((s == 1).sum())),
                 n_events=("ln", "sum")))
    g = fast_br.set_index("entry_type")
    assert (g.n_sessions == want.n_sessions).all()
    assert (g.n_bounce == want.n_bounce).all()
    assert (g.n_events == want.n_events).all()
    assert fast_br.n_events.sum() == len(ev)

    # quantization: numpy recomputation of the exact same scheme
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    lo = np.stack(emb.embedding.to_numpy()).min(axis=0).astype(
        np.float64)
    hi = np.stack(emb.embedding.to_numpy()).max(axis=0).astype(
        np.float64)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    q = np.clip(np.round((m - lo) / scale), 0, 255)
    err = q * scale + lo - m
    rmse = float(np.sqrt((err * err).sum() / err.size))
    assert rep.n_vecs.iloc[0] == len(emb)
    assert rep.dim.iloc[0] == m.shape[1]
    assert abs(rep.rmse_r6.iloc[0] - round(rmse, 6)) <= 1e-6
    assert abs(rep.max_abs_err_r6.iloc[0]
               - round(float(np.abs(err).max()), 6)) <= 1e-6


def test_round4_wave64_tiers_agree(ray_session, monkeypatch):
    """quality_gate_sweep: tier parity, monotonicity in the threshold,
    and a direct pandas recomputation at one threshold."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.quality_gate_sweep(sf)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow = A.quality_gate_sweep(sf)[list(fast.columns)]
    assert len(fast) == 25 and fast.equals(slow)

    # keep counts weakly decrease as the gate tightens
    for _, g in fast.groupby("lang"):
        ks = g.sort_values("thr").n_kept.to_numpy()
        assert (np.diff(ks) <= 0).all()

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["lang", "text"])
    nc = docs.text.str.len().astype(np.int64)
    na = docs.text.str.count(r"[A-Za-z]").astype(np.int64)
    kept70 = (pd.DataFrame({"lang": docs.lang,
                            "k": (100 * na >= 70 * nc).astype(int)})
              .groupby("lang").k.sum())
    got70 = fast[fast.thr == 70].set_index("lang").n_kept
    assert (got70 == kept70).all()


def test_round4_wave65_reports(ray_session):
    """neardup_calibration_report consistency with its two source
    pipelines; hll_error_sweep within 3x the published bound at every
    precision and exact twin correct."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    rep = A.neardup_calibration_report(sf)
    r = rep.iloc[0]
    assert r.n_hit <= min(r.n_candidates, r.n_true_pairs)
    assert 0 <= r.precision_r6 <= 1 and 0 <= r.recall_r6 <= 1
    # ground-truth side must agree with the oracled pipeline's count
    from biobloom_ray.stages.dedup import ngram_jaccard_pairs
    import biobloom_ray.io as io

    docs = io.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    truth = ngram_jaccard_pairs(docs, threshold=0.5)
    if not isinstance(truth, pd.DataFrame):
        truth = truth.to_pandas()
    assert r.n_true_pairs == len(truth)

    sweep = A.hll_error_sweep(sf)
    docs_pd = pd.read_parquet(f"{sf}/documents.parquet",
                              columns=["text"])
    vocab = set()
    for t in docs_pd.text:
        vocab.update(t.split())
    assert (sweep.exact == len(vocab)).all()
    assert (sweep.rel_err_r6.abs() <= 3 * sweep.bound_r6).all()
    # the bound column is the published 1.04/sqrt(m)
    assert np.allclose(sweep.bound_r6,
                       np.round(1.04 / np.sqrt(2.0 ** sweep.p), 6))


def test_round4_wave66_sketch_calibration(ray_session):
    """cms_error_sweep: no underestimates, max overcount within the
    published eps*N at every width, monotone improvement with width;
    quantile_sketch_calibration: rank error <= 3% (KLL k=200) and
    <= 5% (t-digest) at every q, exact column matches a direct
    PERCENTILE_DISC recomputation."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    sw = A.cms_error_sweep(sf)
    assert (sw.n_underestimates == 0).all()
    assert (sw.max_overcount <= sw.eps_n_bound_r6).all()
    mo = sw.sort_values("width").max_overcount.to_numpy()
    assert (np.diff(mo) <= 0).all()

    cal = A.quantile_sketch_calibration(sf)
    assert (cal.kll_rank_err_r6 <= 0.03).all()
    assert (cal.tdigest_rank_err_r6 <= 0.05).all()
    nch = np.sort(pd.read_parquet(
        f"{sf}/documents.parquet", columns=["n_chars"])
        .n_chars.to_numpy(np.int64))
    n = len(nch)
    for r in cal.itertuples():
        target = -(-int(r.q * 1000) * n // 1000)
        assert r.exact == nch[target - 1]


def test_round4_wave67_tiers_agree(ray_session, monkeypatch):
    """user_tenure_distribution + order_size_distribution: tier
    parity + direct recomputation."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast_tn = A.user_tenure_distribution(sf)
    fast_os = A.order_size_distribution(sf)

    monkeypatch.setattr(A, "EVENTS_DRIVER_MAX_ROWS", 0)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow_tn = A.user_tenure_distribution(sf)[list(fast_tn.columns)]
    slow_os = A.order_size_distribution(sf)[list(fast_os.columns)]
    assert len(fast_tn) > 0 and fast_tn.equals(slow_tn)
    assert len(fast_os) > 0 and fast_os.equals(slow_os)

    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts"])
    g = ev.groupby("user_id").ts.agg(["min", "max"])
    w = ((g["max"].astype("datetime64[us]").astype(np.int64)
          - g["min"].astype("datetime64[us]").astype(np.int64))
         // (7 * 86_400_000_000))
    assert fast_tn.n_users.sum() == ev.user_id.nunique()
    want = w.value_counts().sort_index()
    got = fast_tn.set_index("tenure_weeks").n_users
    assert (got == want).all()

    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey"])
    k = li.l_orderkey.value_counts().to_numpy()
    assert fast_os.n_orders.sum() == li.l_orderkey.nunique()
    assert (fast_os.n_items * fast_os.n_orders).sum() == len(li)
    mean = k.sum() / len(k)
    var = (k * k).sum() / len(k) - mean * mean
    assert fast_os.dispersion_r6.nunique() == 1
    assert abs(fast_os.dispersion_r6.iloc[0]
               - round(var / mean, 6)) <= 1e-6


def test_round4_wave68_kmeans_quality(ray_session):
    """kmeans_quality_report: numpy recomputation twin (exact to the
    fixed-point contract), partition counts match the kmeans
    assignments, and cohesion > separation for every cluster (the
    centroid is by construction the best-matching one)."""
    import biobloom_ray.io as io
    import biobloom_ray.pipelines.analytics as A
    from biobloom_ray.stages.ann import (_matrix, _normalize_rows,
                                         embedding_kmeans)

    sf = "/root/testdata/sf0.01"
    rep = A.kmeans_quality_report(sf)
    assert (rep.cohesion_r6 > rep.separation_r6).all()
    assert (rep.silhouette_r6 > 0).all()

    emb = io.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    assigns, cent = embedding_kmeans(emb, k=8, iters=6)
    a = assigns.to_pandas()
    got_n = rep.set_index("cluster").n
    want_n = a.cluster.value_counts().sort_index()
    assert (got_n == want_n).all()

    ep = emb.to_pandas().sort_values("vec_id")
    m = _normalize_rows(np.stack(ep.embedding.to_numpy())
                        .astype(np.float64))
    order = a.sort_values("vec_id").cluster.to_numpy()
    sims = m @ cent.T
    own_sim = sims[np.arange(len(m)), order]
    sims[np.arange(len(m)), order] = -np.inf
    other = sims.max(axis=1)
    FP = float(np.int64(1) << np.int64(40))
    q_own = np.round(own_sim * FP).astype(np.int64)
    q_oth = np.round(other * FP).astype(np.int64)
    df = pd.DataFrame({"c": order, "o": q_own, "t": q_oth})
    g = df.groupby("c").agg(n=("o", "size"), so=("o", "sum"),
                            st=("t", "sum"))
    want = ((g.so - g.st) / FP / g.n).round(6)
    assert (rep.set_index("cluster").silhouette_r6 == want).all()


def test_round4_wave69_tiers_agree(ray_session, monkeypatch):
    """label_centroid_affinity: tier parity + symmetry-free pair set
    + numpy recomputation."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.label_centroid_affinity(sf)
    monkeypatch.setattr(A, "RANK_DRIVER_MAX_ROWS", 0)
    slow = A.label_centroid_affinity(sf)[list(fast.columns)]
    assert len(fast) == 45 and fast.equals(slow)
    assert (fast.label_a < fast.label_b).all()
    assert fast.cos_r6.between(-1, 1).all()

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    lab = emb.label.to_numpy()
    cents = np.stack([M[lab == l].mean(axis=0)
                      for l in sorted(set(lab))])
    nrm = np.sqrt((cents * cents).sum(axis=1))
    got = fast.set_index(["label_a", "label_b"]).cos_r6
    for i in range(10):
        for j in range(i + 1, 10):
            want = (cents[i] * cents[j]).sum() / (nrm[i] * nrm[j])
            assert abs(got[(i, j)] - round(want, 6)) <= 2e-6


def test_round4_wave70_tiers_agree(ray_session, monkeypatch):
    """supplier_rank_correlation: tier parity + scipy-free brute-force
    Spearman recomputation on average ranks."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.01"
    fast = A.supplier_rank_correlation(sf)
    monkeypatch.setattr(A, "LINEITEM_DRIVER_MAX_ROWS", 0)
    slow = A.supplier_rank_correlation(sf)[list(fast.columns)]
    assert len(fast) == 1 and fast.equals(slow)
    assert -1 <= fast.spearman_r6.iloc[0] <= 1

    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    sup = pd.read_parquet(f"{sf}/supplier.parquet",
                          columns=["s_suppkey", "s_acctbal"])

    def cents(x):
        return (np.sign(x) * np.floor(np.abs(x) * 100 + 0.5)) \
            .astype(np.int64)

    rev = (pd.DataFrame({
        "sk": li.l_suppkey,
        "r": cents(li.l_extendedprice.to_numpy())
        * (100 - cents(li.l_discount.to_numpy()))})
        .groupby("sk", as_index=False).r.sum()
        .merge(sup, left_on="sk", right_on="s_suppkey"))
    ra = rev.r.rank(method="average").to_numpy() * 2
    rb = cents(rev.s_acctbal.to_numpy())
    rb = pd.Series(rb).rank(method="average").to_numpy() * 2
    S = int(((ra - rb) ** 2).sum())
    n = len(rev)
    rho = 1.0 - 3.0 * S / (2.0 * n * (n * n - 1))
    assert fast.n_suppliers.iloc[0] == n
    assert fast.sum_d2_4x.iloc[0] == S
    assert abs(fast.spearman_r6.iloc[0] - round(rho, 6)) <= 1e-6


def test_round5_q11_tiers_agree(ray_session, monkeypatch):
    """TPC-H Q11 over the key-derived partsupp: broadcast+driver tier
    vs forced hash-join+Dataset-scalar tier bit-identical; result obeys
    the mean-gate HAVING; independent pandas recomputation of the
    derived partsupp matches."""
    import biobloom_ray.pipelines.analytics as A

    sf = "/root/testdata/sf0.001"
    # sf0.001 has no NATION_7 suppliers: empty result keeps its typed
    # schema in BOTH tiers (the empty-to_pandas guard)
    empty = A.q11_important_stock(sf)
    assert list(empty.columns) == ["ps_partkey", "value_cents"]
    assert len(empty) == 0
    # non-empty parity on a nation that exists at sf0.001
    fast = A.q11_important_stock(sf, nation="NATION_3")
    assert len(fast) > 0
    monkeypatch.setattr(A, "Q11_SUPP_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(A, "PART_DRIVER_MAX_ROWS", 0)
    slow = A.q11_important_stock(sf, nation="NATION_3")[
        list(fast.columns)]
    assert fast.equals(slow)
    empty2 = A.q11_important_stock(sf)
    assert list(empty2.columns) == ["ps_partkey", "value_cents"]
    assert len(empty2) == 0

    # independent recomputation from the arithmetic rule
    part = pd.read_parquet(f"{sf}/part.parquet", columns=["p_partkey"])
    supp = pd.read_parquet(f"{sf}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(f"{sf}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    nk = set(nat[nat.n_name == "NATION_3"].n_nationkey.astype(int))
    german = set(supp[supp.s_nationkey.isin(nk)]
                 .s_suppkey.astype(int).tolist())
    n_supp = len(supp)
    step = n_supp // 4 + 1
    pk = part.p_partkey.to_numpy(np.int64)
    acc = np.zeros(len(pk), np.int64)
    for i in range(4):
        sk = (pk + i * step) % n_supp
        avail = (pk * 7 + i * 131 + sk) % 9999 + 1
        cost = (pk * 31 + sk * 17 + i) % 99900 + 100
        acc += np.where(np.isin(sk, np.asarray(sorted(german))),
                        cost * avail, 0)
    g = pd.DataFrame({"ps_partkey": pk, "value_cents": acc})
    g = g[g.value_cents > 0]
    tot, ng = int(g.value_cents.sum()), len(g)
    want = (g[g.value_cents * ng > tot]
            .sort_values(["value_cents", "ps_partkey"],
                         ascending=[False, True])
            .reset_index(drop=True))
    assert fast.reset_index(drop=True).equals(want)
    # HAVING is the exact mean gate
    assert (fast.value_cents * ng > tot).all()
