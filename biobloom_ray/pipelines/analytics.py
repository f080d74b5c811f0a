"""Oracle-checkable analytics pipelines over the driver test tables
(documents / embeddings / events).  Each function takes ``sf_dir`` and
returns a small result (Dataset → pandas/Arrow by the caller); the
matching ANSI-SQL oracles live in ``__ray_entry__.oracle_sql``.

Scale notes: every reader prunes columns at the parquet read; per-batch
work is vectorized (pyarrow.compute / pandas C kernels / numpy);
aggregations pre-reduce inside map_batches so shuffles move partial rows
only.
"""

from __future__ import annotations

from biobloom_ray.io import cheap_count as _cheap_count
from biobloom_ray.io import read_parquet as _rp
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from biobloom_ray.stages.dedup import add_content_hash

K_DEFAULT = 25


def _read(sf_dir: str, table: str, columns=None):
    return _rp(f"{sf_dir}/{table}.parquet", columns=columns)


def _parts_pandas(parts_ds, schema: dict) -> pd.DataFrame:
    """`Dataset.to_pandas()` for partial tables, safe on EMPTY inputs:
    a zero-row source yields a schema-less empty frame whose missing
    columns would KeyError downstream (the ADVICE-r3 empty-input
    class) — substitute a typed empty frame instead."""
    df = parts_ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in schema.items()})
    return df


def _cents_away(x: np.ndarray) -> np.ndarray:
    """Integer cents with SQL ROUND semantics (half AWAY from zero).
    ``np.round``/``pc.round`` default to banker's half-to-even, which
    diverges from DuckDB's ROUND on an exact .5 at the cent boundary
    (latent on 2-dp fixtures, real on >=3-dp data)."""
    return (np.sign(x) * np.floor(np.abs(x) * 100.0 + 0.5)).astype(np.int64)


# -- simple grouped aggregates ------------------------------------------------

def lang_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n"))
    return out.to_pandas()


def frame_counts(sf_dir: str, k: int = K_DEFAULT):
    """A1 pre-pass as a query: Σ max(len−k+1, 0) frames per lang (raw
    text length, no normalization — matches the SQL oracle)."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False)
        frames = np.maximum(lens.astype(np.int64) - k + 1, 0)
        df = pd.DataFrame({"lang": b["lang"].to_pandas(), "frames": frames})
        agg = df.groupby("lang", as_index=False)["frames"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang").aggregate(Sum("frames", alias_name="frames")))
    return out.to_pandas()


def median_nchars_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "median_nchars": [float(np.quantile(
                g["n_chars"].to_numpy(np.float64), 0.5, method="linear"))],
        })

    return ds.groupby("lang").map_groups(med, batch_format="pandas").to_pandas()


#: shared input-row gate for the event-rollup driver-combine tiers: the
#: block partials are output-scale ((type, bucket) / user rows), so
#: below this many INPUT rows they combine in one driver pandas groupby
#: instead of a native shuffle; above it the native aggregate runs
EVENTS_DRIVER_MAX_ROWS = 5_000_000


def events_hourly(sf_dir: str):
    """Windowed aggregate, tiered: per-block (type, hour) partials with
    n/min/max always pre-reduce inside map_batches; below the row gate
    they combine on the driver, above it a native Sum/Min/Max groupby
    finishes (identical output, tier-parity-tested)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        # integral epoch seconds rather than a timestamp column: immune to
        # datetime64 unit differences between engines in the value hash;
        # cast via timestamp("s") so the conversion is input-unit-independent
        hour = (pc.floor_temporal(b["ts"], unit="hour")
                .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "hour_epoch": hour.to_numpy(zero_copy_only=False),
            "value": b["value"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["event_type", "hour_epoch"], as_index=False)
               .agg(n=("value", "size"), min_value=("value", "min"),
                    max_value=("value", "max")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas()
        out = (p.groupby(["event_type", "hour_epoch"], as_index=False)
               .agg(n=("n", "sum"), min_value=("min_value", "min"),
                    max_value=("max_value", "max")))
        return out

    out = (parts_ds
           .groupby(["event_type", "hour_epoch"])
           .aggregate(Sum("n", alias_name="n"),
                      Min("min_value", alias_name="min_value"),
                      Max("max_value", alias_name="max_value")))
    return out.to_pandas()


# -- dedup / distinct ---------------------------------------------------------

def exact_dedup_docs(sf_dir: str):
    """First-wins exact text dedup (D1 exact variant): min doc_id per
    distinct text.  ONE native aggregate — group on the content hash,
    ``Min(doc_id)`` picks the winner and ``Min(text)`` recovers the text
    (every text in an md5 group is identical, so Min IS the text); zero
    per-group Python, zero joins.  The generic row-preserving variant
    (arbitrary extra columns) is stages.dedup.exact_dedup's semi-join."""
    from biobloom_ray.stages.dedup import add_content_hash

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = (ds.map_batches(add_content_hash, batch_format="pyarrow")
           .groupby("fp_md5")
           .aggregate(Min("doc_id", alias_name="doc_id"),
                      Min("text", alias_name="text"))
           .to_pandas())
    return out[["doc_id", "text"]]


def distinct_text_per_lang(sf_dir: str):
    """Exact COUNT(DISTINCT text) per lang: per-batch (lang, hash) dedup
    → native two-level aggregate — groupby(lang, fp).count collapses
    duplicates, groupby(lang).count counts survivors.  (The HLL variant
    is the approximate twin — see hll_distinct_per_lang.)"""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        h = add_content_hash(b)
        df = pd.DataFrame({"lang": h["lang"].to_pandas(),
                           "fp": h["fp_md5"].to_pandas()})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    uniq = (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby(["lang", "fp"]).aggregate(Count(alias_name="_c"))
            .select_columns(["lang"]))

    # second level: the survivors are already distinct, so counting per
    # lang needs no second shuffle — per-block partial counts (≤ n_langs
    # rows per block) sum on the driver
    def lang_counts_partial(b: pa.Table) -> pa.Table:
        vc = b["lang"].to_pandas().value_counts()
        return pa.table({"lang": pa.array(vc.index.to_numpy()),
                         "n_distinct": pa.array(vc.to_numpy())})

    parts = uniq.map_batches(lang_counts_partial,
                             batch_format="pyarrow").to_pandas()
    out = (parts.groupby("lang", as_index=False)["n_distinct"].sum()
           .sort_values("lang").reset_index(drop=True))
    return out[["lang", "n_distinct"]]


# -- text stats ---------------------------------------------------------------

def token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        n = s.str.count(r"\S+").fillna(0).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(n.to_numpy())})

    return ds.map_batches(f, batch_format="pyarrow").to_pandas()


def quality_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        n_chars = s.str.len().fillna(0).astype(np.int64).to_numpy()
        n_alpha = s.str.count(r"[A-Za-z]").fillna(0).astype(np.int64).to_numpy()
        ratio = n_alpha / np.maximum(n_chars, 1)
        return pa.table({"doc_id": b["doc_id"],
                         "n_chars_calc": pa.array(n_chars),
                         "n_alpha": pa.array(n_alpha),
                         "alpha_ratio": pa.array(ratio)})

    return ds.map_batches(f, batch_format="pyarrow").to_pandas()


def doc_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        h = add_content_hash(b)
        return pa.table({"doc_id": b["doc_id"],
                         "fp_md5": h["fp_md5"].cast(pa.string())})

    return ds.map_batches(f, batch_format="pyarrow").to_pandas()


#: input-row gate for token_rarity_scores' broadcast tier: below it the
#: corpus unigram table broadcasts once; above it tokens hash-join the
#: frequency table and reduce with native aggregates
RARITY_BROADCAST_MAX_ROWS = 200_000


def token_rarity_scores(sf_dir: str):
    """Corpus-frequency rarity profile per document — a training-data
    quality signal in exact integers (no float-summation-order hazard in
    the oracle hash): ``n_tokens``, ``min_token_cnt`` (corpus count of
    the doc's rarest token) and ``n_hapax`` (tokens occurring exactly
    once corpus-wide).  Docs with zero tokens are dropped (no rarity is
    defined), matching the oracle's inner join.

    Tiered: below ``RARITY_BROADCAST_MAX_ROWS`` docs the sorted
    (token, count) unigram table broadcasts once and each block scores
    its docs with one searchsorted + np.minimum.at/add.at pass; above
    the gate the exploded (doc_id, token) rows hash-join the frequency
    table and reduce with native Count/Min/Sum aggregates."""
    import ray

    from biobloom_ray.io import hash_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def freq_partial(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        toks = s.str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        return pa.table({"token": pa.array(vc.index.astype(str),
                                           type=pa.string()),
                         "cnt": pa.array(vc.to_numpy().astype(np.int64))})

    freq_parts = ds.map_batches(freq_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= RARITY_BROADCAST_MAX_ROWS:
        fp = (freq_parts.to_pandas().groupby("token", as_index=False)
              ["cnt"].sum())
        tok_sorted = fp.token.to_numpy(dtype=object)
        order = np.argsort(tok_sorted, kind="stable")
        tok_sorted = tok_sorted[order]
        cnt_sorted = fp.cnt.to_numpy()[order]
        freq_ref = ray.put((tok_sorted, cnt_sorted))

        def score(b: pa.Table) -> pa.Table:
            import ray as _r
            toks_s, cnts_s = _r.get(freq_ref)
            s = b["text"].to_pandas()
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            lists = s.str.findall(r"\S+")
            lens = lists.str.len().to_numpy().astype(np.int64)
            flat = lists.explode().dropna().to_numpy(dtype=object)
            row_of = np.repeat(np.arange(len(ids)), lens)
            idx = np.searchsorted(toks_s, flat)
            c = cnts_s[idx]  # every token is in the corpus table
            mins = np.full(len(ids), np.iinfo(np.int64).max)
            np.minimum.at(mins, row_of, c)
            hapax = np.zeros(len(ids), dtype=np.int64)
            np.add.at(hapax, row_of, (c == 1).astype(np.int64))
            keep = lens > 0
            return pa.table({
                "doc_id": pa.array(ids[keep]),
                "n_tokens": pa.array(lens[keep]),
                "min_token_cnt": pa.array(mins[keep]),
                "n_hapax": pa.array(hapax[keep])})

        out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    freq = (freq_parts.groupby("token")
            .aggregate(Sum("cnt", alias_name="cnt")))

    def explode(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        lists = s.str.findall(r"\S+")
        lens = lists.str.len().to_numpy().astype(np.int64)
        flat = lists.explode().dropna().astype(str).to_numpy(dtype=object)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens)),
            "token": pa.array(flat, type=pa.string())})

    toks = ds.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(toks, freq, on=("token",))

    def hapax_col(b: pa.Table) -> pa.Table:
        c = b["cnt"].to_numpy(zero_copy_only=False)
        return b.append_column("is_hapax",
                               pa.array((c == 1).astype(np.int64)))

    out = (joined.map_batches(hapax_col, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Count(alias_name="n_tokens"),
                      Min("cnt", alias_name="min_token_cnt"),
                      Sum("is_hapax", alias_name="n_hapax"))
           .to_pandas())
    return (out[["doc_id", "n_tokens", "min_token_cnt", "n_hapax"]]
            .sort_values("doc_id").reset_index(drop=True))


def heavy_tokens_topk(sf_dir: str, k: int = 20):
    """Exact heavy hitters: per-batch token value_counts (pre-agg) →
    groupby(token).sum → deterministic top-k (count desc, token asc).
    The CMS twin is cms_heavy_hitters."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        toks = s.str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        return pa.table({"token": pa.array(vc.index.astype(str), type=pa.string()),
                         "cnt": pa.array(vc.to_numpy().astype(np.int64))})

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("cnt", alias_name="cnt")))
    top = summed.sort(["cnt", "token"], descending=[True, False]).limit(k)
    return top.to_pandas()


# -- sketch (rows-only) queries ----------------------------------------------

def hll_distinct_shingles_per_lang(sf_dir: str, k: int = 8, p: int = 14):
    """North-rule query: HLL distinct k-shingle cardinality per lang.
    Per-batch partial HLL rows → groupby(lang) register-max merge."""
    from biobloom_ray.hashing import shingle_hashes
    from biobloom_ray.sketches.hll import HLL

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        langs = b["lang"].to_pandas().to_numpy()
        texts = b["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _, nf = shingle_hashes(texts, k)
        row_of = np.repeat(np.arange(len(nf)), nf)
        out_l, out_b = [], []
        for lang in np.unique(langs):
            sel = (langs == lang)[row_of] if len(row_of) else np.zeros(0, bool)
            h = HLL(p=p)
            h.update(h1[sel])
            out_l.append(str(lang))
            out_b.append(h.serialize())
        return pa.table({"lang": pa.array(out_l, type=pa.string()),
                         "blob": pa.array(out_b, type=pa.large_binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = HLL.deserialize(g["blob"].iloc[0])
        for blob in g["blob"].iloc[1:]:
            acc.merge(HLL.deserialize(blob))
        return pd.DataFrame({"lang": [g["lang"].iloc[0]],
                             "distinct_shingles_est": [acc.estimate()]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").map_groups(merge, batch_format="pandas")
            .to_pandas())


def cms_heavy_hitters(sf_dir: str, k: int = 20, eps: float = 0.001,
                      delta: float = 0.01):
    """CMS heavy hitters: per-batch partial CMS + local candidate tokens →
    merged CMS estimates the final counts; top-k by estimate."""
    from biobloom_ray.hashing import hash_strings
    from biobloom_ray.sketches.cms import CountMinSketch

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        toks = s.str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        cms = CountMinSketch.for_error(eps, delta)
        keys = hash_strings(vc.index.tolist())
        cms.update(keys, vc.to_numpy().astype(np.int64))
        cands = vc.head(4 * k)
        return pa.table({
            "kind": pa.array(["cms"] + ["cand"] * len(cands)),
            "token": pa.array([""] + cands.index.astype(str).tolist()),
            "cnt": pa.array([0] + cands.to_numpy().astype(np.int64).tolist()),
            "blob": pa.array([cms.serialize()] + [b""] * len(cands),
                             type=pa.large_binary()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    cms_all = None
    cand_tokens = set()
    for r in rows:
        if r["kind"] == "cms":
            c = CountMinSketch.deserialize(r["blob"])
            cms_all = c if cms_all is None else cms_all.merge(c)
        else:
            cand_tokens.add(r["token"])
    cand = sorted(cand_tokens)
    est = cms_all.query(hash_strings(cand)) if cand else np.empty(0, np.int64)
    df = pd.DataFrame({"token": cand, "est_cnt": est})
    df = df.sort_values(["est_cnt", "token"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def kll_nchars_quantiles(sf_dir: str, qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """Page-length quantiles via merged per-block KLL partials."""
    from biobloom_ray.sketches.kll import KLL

    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        sk = KLL(k=200)
        sk.update(b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"blob": pa.array([sk.serialize()], type=pa.large_binary())})

    blobs = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = KLL.deserialize(blobs[0]["blob"])
    for r in blobs[1:]:
        acc.merge(KLL.deserialize(r["blob"]))
    return pd.DataFrame({"q": list(qs),
                         "n_chars_est": [acc.quantile(q) for q in qs]})


# -- relational pipelines over the TPC-H-ish tables ---------------------------
# Money amounts aggregate as INTEGER cents/basis-points (2- and 4-decimal
# values round-trip exactly through float64×100) so distributed partial
# sums are order-independent and hash-identical to the SQL oracle —
# float summation order would differ between engines in the last ulps.

def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing rollup.
    Per-batch integer partials → native Sum/Count groupby (6 partial
    columns per batch-group, never the 60k+ rows)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pandas(),
            "l_linestatus": b["l_linestatus"].to_pandas(),
            "qty": b["l_quantity"].to_numpy(zero_copy_only=False)
                   .astype(np.int64),
            "base_cents": _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)),
        })
        agg = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
               .agg(sum_qty=("qty", "sum"),
                    sum_base_cents=("base_cents", "sum"),
                    count_order=("qty", "size")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_cents", alias_name="sum_base_cents"),
                      Sum("count_order", alias_name="count_order"))
           .to_pandas())
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    return out


#: customer-side row gate for the broadcast join tier: below this the
#: custkey→nationkey map ships once per worker (two int64 arrays,
#: ~32 MB at the gate); above it the hash join takes over
CUST_BROADCAST_MAX_ROWS = 2_000_000


def orders_per_nation(sf_dir: str):
    """J-family join pipeline: orders ⋈ customer then nationkey→name via
    a BROADCAST lookup (nation is tiny and static; no shuffle).

    The orders⋈customer join is tiered like every small-side join here:
    below ``CUST_BROADCAST_MAX_ROWS`` the sorted custkey→nationkey
    arrays broadcast once (`ray.put`) and the join is a map-side
    ``searchsorted`` — no shuffle at all, and the final 25-nation
    rollup is a per-block partial + driver sum; above the gate both
    sides shuffle through a hash join (both grow with scale)."""
    import ray

    from biobloom_ray.io import hash_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation.n_nationkey.astype(np.int64),
                       nation.n_name))

    n_cust = _cheap_count(cust)

    if n_cust is not None and n_cust <= CUST_BROADCAST_MAX_ROWS:
        cd = cust.to_pandas()
        order_ = np.argsort(cd.c_custkey.to_numpy())
        ckeys = cd.c_custkey.to_numpy()[order_]
        cnat = cd.c_nationkey.to_numpy()[order_]
        lut_ref = ray.put((ckeys, cnat))

        def nation_partial(b: pa.Table) -> pa.Table:
            import ray as _r
            keys_s, nat_s = _r.get(lut_ref)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False)
            if len(keys_s) == 0 or len(ck) == 0:  # inner join: empty out
                return pa.table({
                    "nationkey": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64())})
            cents = _cents_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False))
            idx = np.searchsorted(keys_s, ck)
            idx[idx == len(keys_s)] = 0
            ok = keys_s[idx] == ck          # inner join semantics
            nk = nat_s[idx[ok]]
            cents = cents[ok]
            # per-block rollup straight to nation (≤ 25 rows out)
            n_per = np.bincount(nk)
            c_per = np.bincount(nk, weights=cents.astype(np.float64))
            nz = np.nonzero(n_per)[0]
            return pa.table({
                "nationkey": pa.array(nz.astype(np.int64)),
                "n": pa.array(n_per[nz].astype(np.int64)),
                "cents": pa.array(np.round(c_per[nz]).astype(np.int64))})

        parts = (orders.map_batches(nation_partial, batch_format="pyarrow")
                 .to_pandas())
        agg = (parts.groupby("nationkey", as_index=False)
               .agg(n_orders=("n", "sum"), total_cents=("cents", "sum")))
        agg["n_name"] = agg.nationkey.map(name_of)
        out = agg.sort_values("n_name").reset_index(drop=True)
        return out[["n_name", "n_orders", "total_cents"]]

    def order_partial(b: pa.Table) -> pa.Table:
        # pre-aggregate per customer INSIDE the batch: the join and the
        # groupby downstream see one row per (block, custkey), not every
        # order — the standard partial-aggregate pushdown below a join
        df = pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(zero_copy_only=False),
            "cents": _cents_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False))})
        agg = (df.groupby("o_custkey", as_index=False)
               .agg(n=("cents", "size"), cents=("cents", "sum")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    # block-partials join directly (no pre-join shuffle): the final
    # groupby(n_name) sums partials, so multiple rows per custkey are fine
    per_cust = orders.map_batches(order_partial, batch_format="pyarrow")
    joined = hash_join(per_cust, cust, on=("o_custkey",),
                       right_on=("c_custkey",))

    name_ref = ray.put(name_of)

    def add_name(b: pa.Table) -> pa.Table:
        import ray as _r
        lut = _r.get(name_ref)
        keys = b["c_nationkey"].to_numpy(zero_copy_only=False)
        names = pd.Series(keys).map(lut).to_numpy(dtype=object)
        return pa.table({"n_name": pa.array(names, type=pa.string()),
                         "n": b["n"], "cents": b["cents"]})

    out = (joined.map_batches(add_name, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Sum("cents", alias_name="total_cents"))
           .to_pandas())
    return out[["n_name", "n_orders", "total_cents"]]


#: lineitem-side row gate: below this the per-block (partkey, revenue)
#: partials combine on the driver (bounded by distinct parts × blocks);
#: above it the native groupby shuffle takes over
LINEITEM_DRIVER_MAX_ROWS = 5_000_000


def top_parts_by_revenue(sf_dir: str, k: int = 10):
    """O3 top-k on a revenue rollup: lineitem revenue in integer
    10⁻⁴-dollar units (extprice_cents × (100 − disc_pct)), pre-agg per
    batch, then tiered combine: below ``LINEITEM_DRIVER_MAX_ROWS`` the
    block partials sum on the driver (one pandas groupby, no shuffle);
    above it a native Sum groupby + per-block exact top-k +
    deterministic sort-limit."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        rev = cents * (100 - disc)
        df = pd.DataFrame({"l_partkey":
                           b["l_partkey"].to_numpy(zero_copy_only=False),
                           "revenue": rev})
        agg = df.groupby("l_partkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        parts = parts_ds.to_pandas()
        agg = parts.groupby("l_partkey", as_index=False)["revenue"].sum()
        return (agg.sort_values(["revenue", "l_partkey"],
                                ascending=[False, True])
                .head(k).reset_index(drop=True))

    summed = (parts_ds
              .groupby("l_partkey")
              .aggregate(Sum("revenue", alias_name="revenue")))

    def local_topk(b: pa.Table) -> pa.Table:
        # post-groupby blocks hold DISJOINT part keys, so per-block
        # top-k is exact; the global sort then touches ≤ k·n_blocks rows
        rev = b["revenue"].to_numpy(zero_copy_only=False)
        keys = b["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -rev))[:k]
        return pa.table({"l_partkey": pa.array(keys[order]),
                         "revenue": pa.array(rev[order])})

    return (summed.map_batches(local_topk, batch_format="pyarrow")
            .sort(["revenue", "l_partkey"], descending=[True, False])
            .limit(k).to_pandas())


def pack_documents(sf_dir: str, capacity_chars: int = 5000):
    """Sequence PACKING (the LLM sample-packing shape): assign each doc
    to a fixed-capacity bin by a GLOBAL prefix scan over the
    deterministic order (n_chars desc, doc_id asc) —
    ``bin = exclusive_cumsum(n_chars) // capacity`` — so bins fill
    greedily and reproducibly, and the whole assignment is exact
    integers (SQL window-frame oracle).

    Distributed scan pattern (a primitive Ray Data lacks): sort →
    materialize (pins the block layout) → pass 1 reads one row per
    block (its first (n_chars, doc_id) key + its sum; the sort's range
    partitioning makes first-keys order the blocks) → driver computes
    the #blocks-sized exclusive block offsets → pass 2 adds the
    broadcast offset to each block's local exclusive cumsum.
    Partitioning assumption, documented: pass 2's batches are exactly
    pass 1's blocks (``batch_size=None`` on the same materialized
    dataset)."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    sorted_ds = (ds.sort(["n_chars", "doc_id"],
                         descending=[True, False]).materialize())

    def block_key_sum(b: pa.Table) -> pa.Table:
        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(nc) == 0:
            return pa.table({"k_nchars": pa.array([], type=pa.int64()),
                             "k_docid": pa.array([], type=pa.int64()),
                             "blk_sum": pa.array([], type=pa.int64())})
        return pa.table({"k_nchars": pa.array([int(nc[0])]),
                         "k_docid": pa.array([int(ids[0])]),
                         "blk_sum": pa.array([int(nc.sum())])})

    blocks = (sorted_ds.map_batches(block_key_sum, batch_format="pyarrow",
                                    batch_size=None).to_pandas())
    blocks = blocks.sort_values(["k_nchars", "k_docid"],
                                ascending=[False, True])
    offs = blocks.blk_sum.cumsum().shift(fill_value=0).to_numpy()
    off_of = {(int(r.k_nchars), int(r.k_docid)): int(o)
              for r, o in zip(blocks.itertuples(), offs)}
    off_ref = ray.put(off_of)

    def assign(b: pa.Table) -> pa.Table:
        import ray as _r
        omap = _r.get(off_ref)
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(nc) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "bin": pa.array([], type=pa.int64())})
        base = omap[(int(nc[0]), int(ids[0]))]
        excl = np.zeros(len(nc), dtype=np.int64)
        np.cumsum(nc[:-1], out=excl[1:])
        return pa.table({
            "doc_id": pa.array(ids),
            "bin": pa.array((base + excl) // capacity_chars)})

    return (sorted_ds.map_batches(assign, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def stratified_sample(sf_dir: str, n_per_lang: int = 50):
    """Deterministic STRATIFIED sampler: the ``n_per_lang`` docs with
    the smallest ``splitmix64(doc_id)`` per language — uniform within
    each stratum, reproducible across runs/engines (the oracle SQL
    reuses the bit-exact 128-bit splitmix64 re-implementation), and
    fixed-size per group where the rate-based sampler
    (deterministic_sample_hash) is fixed-rate.  Per-block local top-n
    per lang (at most n·n_langs rows leave any block) → one tiny
    driver reduce — the O3 top-k shape keyed on the hash."""
    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def local_topn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        df = pd.DataFrame({"lang": b["lang"].to_pandas(), "doc_id": ids,
                           "h": h.astype(np.uint64)})
        top = (df.sort_values(["lang", "h", "doc_id"])
               .groupby("lang", as_index=False).head(n_per_lang))
        return pa.Table.from_pandas(top, preserve_index=False)

    parts = ds.map_batches(local_topn, batch_format="pyarrow").to_pandas()
    out = (parts.sort_values(["lang", "h", "doc_id"])
           .groupby("lang", as_index=False).head(n_per_lang))
    return (out[["lang", "doc_id"]].sort_values(["lang", "doc_id"])
            .reset_index(drop=True))


def events_sliding_window(sf_dir: str, window_minutes: int = 30):
    """SLIDING-window aggregate (the tumbling twin is events_hourly):
    for every event, the count of the same user's events in the
    trailing ``window_minutes`` (inclusive bounds, tie-inclusive —
    exactly SQL's ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT
    ROW`` frame).  Hash-partition by user (groupby), per-group kernel =
    two vectorized ``searchsorted`` passes over the time-sorted array —
    no row loops, exact integers (no float hash hazard).  Partitioning
    assumption, documented: a user's history fits one group (the
    standard entity-window sharding; salt by time range for
    pathological single-entity streams)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    win_ns = np.int64(window_minutes) * 60 * 1_000_000_000

    def tag(b: pa.Table) -> pa.Table:
        ts_ns = b["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["user_id"],
                         "ts_ns": ts_ns})

    def window_counts(g: pa.Table) -> pa.Table:
        ts = g["ts_ns"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        hi = np.searchsorted(ts_s, ts, side="right")
        lo = np.searchsorted(ts_s, ts - win_ns, side="left")
        return pa.table({"event_id": pa.array(eid),
                         "n_trailing": pa.array(hi - lo)})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(window_counts, batch_format="pyarrow")
            .to_pandas())


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Windowed/stateful operator: per-user sessionization — a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes``.  Hash-partition by user (groupby), per-group
    vectorized diff over the time-sorted events; only (user, count)
    rows leave the shuffle."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def sessions(g: pa.Table) -> pa.Table:
        # cast UP to timestamp("ns"): input-unit-independent and lossless
        # for s/ms/us/ns inputs (downcasting would raise on sub-second
        # precision)
        ts = np.sort(g["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
                     .to_numpy(zero_copy_only=False))
        n = 1 + int((np.diff(ts) > gap_ns).sum()) if len(ts) else 0
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], type=pa.int64()),
            "n_sessions": pa.array([n], type=pa.int64()),
        })

    return (ds.groupby("user_id")
            .map_groups(sessions, batch_format="pyarrow").to_pandas())


def deterministic_sample_hash(sf_dir: str, rate: float = 0.125):
    """PRODUCTION deterministic corpus sampler: keep a row iff
    ``splitmix64(doc_id) < rate · 2^64`` — one vectorized numpy pass,
    no per-row Python (VERDICT r2 "Next round" #7).  Reproducible
    across runs/retries/engines (the oracle SQL re-implements
    splitmix64 in 128-bit DuckDB arithmetic and matches bit-for-bit);
    stratification falls out of hash uniformity."""
    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    thresh = np.uint64(min(int(rate * 2.0 ** 64), 2 ** 64 - 1))

    def pick(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.filter(pa.array(splitmix64(ids) < thresh))

    return ds.map_batches(pick, batch_format="pyarrow").to_pandas()


def deterministic_sample(sf_dir: str, keep_hex: str = "01"):
    """Hash-bucket downsampling — md5-keyed ORACLE TWIN of
    :func:`deterministic_sample_hash` (kept because the md5 keep rule is
    trivially expressible in any engine's SQL; the per-row hashlib loop
    makes it the verification variant, not the production path): keep a
    row iff the first hex digit of md5(doc_id) is in ``keep_hex``
    (2 of 16 digits ≈ 12.5 %).  Pure map-side filter; stratification
    falls out of hash uniformity."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    keep = frozenset(keep_hex)

    def pick(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            (hashlib.md5(str(int(i)).encode()).hexdigest()[0] in keep
             for i in ids), dtype=bool, count=len(ids))
        return b.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow").to_pandas()


#: total-event-row gate for the direct (unsalted) temporal-join plans:
#: below this many input rows every entity's history trivially fits one
#: ``map_groups`` block, so the joins run as ONE groupby(user_id); above
#: it (or when the input size is not metadata-cheap) they switch to the
#: salt-by-time-range plan — groupby((user, time-bucket)) with a
#: window-sized halo (range join) / a tiny per-bucket carry table (as-of
#: join) — so a pathological single-entity stream spreads over many
#: groups instead of landing in one block.  Identical output
#: (tier-parity-tested with the gate forced to 0).
EVENTS_ENTITY_DIRECT_MAX_ROWS = 5_000_000

#: time-bucket span of the salted as-of plan (the range join's span is
#: its window — the natural halo); one hour keeps the per-(user,bucket)
#: carry table output-scale for multi-year streams
ASOF_SALT_SPAN_S = 3600


def _dedup_rights(r_ts_raw: np.ndarray, r_val_raw: np.ndarray):
    """Deterministic ties (ADVICE r2): purchases sharing a (user, ts)
    collapse to ONE row keeping the max value — DuckDB's ASOF pick among
    equal timestamps is unspecified, so both sides aggregate before the
    as-of (the oracle SQL mirrors this MAX).  Returns time-sorted
    (ts, value) arrays with unique ts."""
    order = np.lexsort((r_val_raw, r_ts_raw))
    ts_s, val_s = r_ts_raw[order], r_val_raw[order]
    last = np.r_[ts_s[1:] != ts_s[:-1], True]
    return ts_s[last], val_s[last]


def _asof_tag(b: pa.Table, left_type: str, right_type: str) -> pa.Table:
    keep = pc.is_in(b["event_type"],
                    value_set=pa.array([left_type, right_type]))
    b = b.filter(keep)
    # input-unit-independent, lossless nanosecond epochs
    ts_ns = b["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
    return pa.table({
        "user_id": b["user_id"],
        "event_id": b["event_id"],
        "ts_ns": ts_ns,
        "is_left": pc.equal(b["event_type"], left_type),
        "value": b["value"],
    })


def events_asof_join(sf_dir: str, left_type: str = "click",
                     right_type: str = "purchase"):
    """As-of join (a custom operator Ray Data lacks): for each ``click``
    event, attach the latest ``purchase`` of the SAME user at or before
    the click's timestamp.

    Composition: one scan splits the stream by side, one
    ``groupby(user_id)`` co-locates each entity's full history, and the
    per-group kernel is a vectorized ``searchsorted`` two-pointer over
    the time-sorted arrays (no row loops).  Tiered by scale: below
    ``EVENTS_ENTITY_DIRECT_MAX_ROWS`` total events an entity's history
    trivially fits one group; above it the salted plan
    (:func:`_asof_join_salted`) shards each entity by time bucket and
    resolves cross-bucket lookbacks through a per-(user, bucket) carry
    table, so a single-entity stream of 10^8 events never lands in one
    ``map_groups`` block.  Clicks with no prior purchase are dropped
    (inner as-of).
    """
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])
    n_rows = _cheap_count(ds)
    tagged = ds.map_batches(lambda b: _asof_tag(b, left_type, right_type),
                            batch_format="pyarrow")
    if n_rows is None or n_rows > EVENTS_ENTITY_DIRECT_MAX_ROWS:
        return _asof_join_salted(tagged, ASOF_SALT_SPAN_S)

    def asof(g: pa.Table) -> pa.Table:
        left = g.filter(g["is_left"])
        right = g.filter(pc.invert(g["is_left"]))
        if len(left) == 0 or len(right) == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "asof_ts_ns": pa.array([], type=pa.int64()),
                             "asof_value": pa.array([], type=pa.float64())})
        l_ts = left["ts_ns"].to_numpy(zero_copy_only=False)
        l_id = left["event_id"].to_numpy(zero_copy_only=False)
        r_ts, r_val = _dedup_rights(
            right["ts_ns"].to_numpy(zero_copy_only=False),
            right["value"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        ok = idx >= 0
        return pa.table({
            "event_id": pa.array(l_id[ok]),
            "asof_ts_ns": pa.array(r_ts[idx[ok]]),
            "asof_value": pa.array(r_val[idx[ok]]),
        })

    return (tagged.groupby("user_id")
            .map_groups(asof, batch_format="pyarrow").to_pandas())


def _asof_join_salted(tagged, span_s: int = ASOF_SALT_SPAN_S):
    """Salt-by-time-range as-of plan (VERDICT r3 #5).  Each entity's
    stream is sharded into ``span_s``-wide time buckets and grouped on
    (user, bucket) — many parallel groups per entity.  The as-of
    lookback is unbounded backwards, so a left whose own bucket holds no
    earlier right is resolved in a second pass against the CARRY table:
    one summary row per (user, bucket-with-rights) holding that bucket's
    latest right.  Any right in an earlier bucket precedes every left in
    a later one, so the carry answer for an unresolved left in bucket b
    is exactly the summary of the latest bucket b' < b — a backward
    ``merge_asof`` on bucket number (vectorized, per-user via ``by``).
    The carry table is output-scale (≤ one row per touched (user,
    bucket)) and is broadcast once via ``ray.put``; the pass-1 result is
    materialized to object-store blocks (narrow, ≤ one row per left) so
    the summary extraction does not re-execute the shuffle."""
    import ray

    span_ns = np.int64(span_s) * np.int64(1_000_000_000)

    def bucketize(b: pa.Table) -> pa.Table:
        ts = b["ts_ns"].to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array(ts // span_ns))

    def local_asof(g: pa.Table) -> pa.Table:
        """kind 0 = resolved left, 1 = unresolved left (needs carry),
        2 = bucket summary (latest right)."""
        left = g.filter(g["is_left"])
        right = g.filter(pc.invert(g["is_left"]))
        uid = g["user_id"][0].as_py()
        bkt = int(g["bucket"][0].as_py())
        parts = []
        if len(right):
            r_ts, r_val = _dedup_rights(
                right["ts_ns"].to_numpy(zero_copy_only=False),
                right["value"].to_numpy(zero_copy_only=False))
        if len(left):
            l_ts = left["ts_ns"].to_numpy(zero_copy_only=False)
            l_id = left["event_id"].to_numpy(zero_copy_only=False)
            if len(right):
                idx = np.searchsorted(r_ts, l_ts, side="right") - 1
                ok = idx >= 0
            else:
                ok = np.zeros(len(l_ts), dtype=bool)
            n_ok = int(ok.sum())
            if n_ok:
                parts.append(pa.table({
                    "kind": pa.array(np.zeros(n_ok, dtype=np.int8)),
                    "user_id": pa.array(np.full(n_ok, uid, dtype=np.int64)),
                    "bucket": pa.array(np.full(n_ok, bkt, dtype=np.int64)),
                    "event_id": pa.array(l_id[ok]),
                    "asof_ts_ns": pa.array(r_ts[idx[ok]]),
                    "asof_value": pa.array(r_val[idx[ok]])}))
            n_un = len(l_ts) - n_ok
            if n_un:
                parts.append(pa.table({
                    "kind": pa.array(np.ones(n_un, dtype=np.int8)),
                    "user_id": pa.array(np.full(n_un, uid, dtype=np.int64)),
                    "bucket": pa.array(np.full(n_un, bkt, dtype=np.int64)),
                    "event_id": pa.array(l_id[~ok]),
                    "asof_ts_ns": pa.array(
                        np.zeros(n_un, dtype=np.int64)),
                    "asof_value": pa.array(
                        np.zeros(n_un, dtype=np.float64))}))
        if len(right):
            parts.append(pa.table({
                "kind": pa.array(np.array([2], dtype=np.int8)),
                "user_id": pa.array([uid], type=pa.int64()),
                "bucket": pa.array([bkt], type=pa.int64()),
                "event_id": pa.array([-1], type=pa.int64()),
                "asof_ts_ns": pa.array([r_ts[-1]], type=pa.int64()),
                "asof_value": pa.array([r_val[-1]], type=pa.float64())}))
        if not parts:
            return pa.table({
                "kind": pa.array([], type=pa.int8()),
                "user_id": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "asof_ts_ns": pa.array([], type=pa.int64()),
                "asof_value": pa.array([], type=pa.float64())})
        return pa.concat_tables(parts)

    pass1 = (tagged.map_batches(bucketize, batch_format="pyarrow")
             .groupby(["user_id", "bucket"])
             .map_groups(local_asof, batch_format="pyarrow")
             .materialize())

    summ = (pass1.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 2)),
        batch_format="pyarrow").to_pandas())
    summ = summ.sort_values("bucket", kind="stable").reset_index(drop=True)
    # merge a POSITIONAL index, not the values: merge_asof upcasts
    # int64 columns to float64 when any row is unmatched, and float64
    # cannot represent ns epochs (~2^60) exactly — indices (< 2^53) are
    # safe, the ts/value arrays are gathered exactly afterwards
    summ_keys = pd.DataFrame({
        "user_id": summ["user_id"].to_numpy(np.int64),
        "bucket": summ["bucket"].to_numpy(np.int64),
        "c_idx": np.arange(len(summ), dtype=np.int64)})
    summ_ref = ray.put((summ_keys,
                        summ["asof_ts_ns"].to_numpy(np.int64),
                        summ["asof_value"].to_numpy(np.float64)))

    def patch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["kind"], 2))
        if len(b) == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "asof_ts_ns": pa.array([], type=pa.int64()),
                             "asof_value": pa.array([], type=pa.float64())})
        df = b.select(["kind", "user_id", "bucket", "event_id",
                       "asof_ts_ns", "asof_value"]).to_pandas()
        res = df[df["kind"] == 0]
        un = df[df["kind"] == 1]
        outs = [res[["event_id", "asof_ts_ns", "asof_value"]]]
        if len(un):
            s_keys, c_ts, c_val = ray.get(summ_ref)
            # carry from the latest STRICTLY-earlier bucket: the left's
            # own bucket had no right at-or-before it, so exact-bucket
            # matches are excluded
            m = pd.merge_asof(
                un.sort_values("bucket", kind="stable"), s_keys,
                on="bucket", by="user_id", direction="backward",
                allow_exact_matches=False)
            m = m[m["c_idx"].notna()]
            idx = m["c_idx"].to_numpy(np.int64)
            outs.append(pd.DataFrame({
                "event_id": m["event_id"].to_numpy(np.int64),
                "asof_ts_ns": c_ts[idx],
                "asof_value": c_val[idx]}))
        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    return pass1.map_batches(patch, batch_format="pyarrow").to_pandas()


def top_docs_per_lang(sf_dir: str, k: int = 3):
    """Per-group top-N (the windowed ROW_NUMBER shape): the k longest
    documents of every language.  Per-block local top-k per lang
    (pre-aggregation: at most k·n_langs rows leave any block) → one
    tiny per-lang reduce.  Deterministic ties: n_chars desc, doc_id asc."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def local_topk(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "lang": b["lang"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("lang").head(k),
                                    preserve_index=False)

    def final_topk(g: pa.Table) -> pa.Table:
        idx = np.lexsort((g["doc_id"].to_numpy(zero_copy_only=False),
                          -g["n_chars"].to_numpy(zero_copy_only=False)))[:k]
        return g.take(np.sort(idx))

    out = (ds.map_batches(local_topk, batch_format="pyarrow")
           .groupby("lang")
           .map_groups(final_topk, batch_format="pyarrow")
           .to_pandas())
    return (out.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True])
            .reset_index(drop=True)[["lang", "doc_id", "n_chars"]])


# -- repetition / decontamination (training-data quality family) --------------

def repetition_stats(sf_dir: str):
    """Per-document Gopher-style repetition profile (exact integers; see
    ``stages/textstats.repetition_stats_batch``).  Map-only — no shuffle
    at any scale; output is one narrow row per document."""
    from biobloom_ray.stages.textstats import repetition_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(repetition_stats_batch,
                         batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


#: decontaminate: benchmark membership rule — docs whose doc_id is
#: divisible by this constant form the "benchmark" corpus (deterministic
#: ~1% subset of the fixture; a real run would read the eval suite)
DECON_BENCH_MOD = 97
#: Bloom prefilter FPR for the broadcast benchmark n-gram filter
DECON_BLOOM_FPR = 1e-4


def _bench_trigram_state(ds, bench_mod: int, n: int, filter_id: str):
    """Build + broadcast the benchmark n-gram subtract-filter state
    shared by the decontamination family (:func:`decontaminate`,
    :func:`clean_corpus`, :func:`curation_funnel`): scan ``ds`` for
    the deterministic benchmark slice (``doc_id % bench_mod == 0``),
    collect its distinct token n-grams driver-side (the eval suite of
    a decontamination job is small and fixed by design), and
    ``ray.put`` ``(bloom words, m, hash_num, exact n-gram frozenset)``
    ONCE so every probe batch reads the same object-store copy —
    the Bloom filter is the bit-cheap vectorized prefilter, the exact
    set the verify probed only for the Bloom-positive fraction."""
    import ray

    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               ngram_strings_at,
                                               token_ngram_hashes)

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % bench_mod == 0)[0]
        if len(sel) == 0:
            return pa.table({"tg": pa.array([], type=pa.string()),
                             "h1": pa.array([], type=pa.uint64()),
                             "h2": pa.array([], type=pa.uint64())})
        sub = b.take(sel)
        flat, lens, row_of = _token_arrays(sub)
        h1, h2, _, start = token_ngram_hashes(flat, row_of, n)
        tg = ngram_strings_at(flat, start, n)
        df = pd.DataFrame({"tg": tg.to_numpy(dtype=object),
                           "h1": h1, "h2": h2}).drop_duplicates("tg")
        return pa.Table.from_pandas(df, preserve_index=False)

    bench = _parts_pandas(
        ds.map_batches(bench_grams, batch_format="pyarrow"),
        {"tg": object, "h1": np.uint64, "h2": np.uint64}
    ).drop_duplicates("tg")
    bf = BloomFilter.for_entries(max(len(bench), 1), DECON_BLOOM_FPR,
                                 kmer_size=n, filter_id=filter_id)
    if len(bench):
        bf.insert(bench.h1.to_numpy(dtype=np.uint64),
                  bench.h2.to_numpy(dtype=np.uint64))
    return ray.put((bf.words, bf.m, bf.hash_num,
                    frozenset(bench.tg.to_numpy(dtype=object))))


def decontaminate(sf_dir: str, n: int = 3, bench_mod: int = DECON_BENCH_MOD):
    """Benchmark decontamination: count, per training document, the token
    n-gram positions whose n-gram also occurs in a benchmark corpus, and
    flag documents with any overlap — the standard n-gram eval-set
    contamination check (GPT-3 appendix C / Gopher §A.2 shape), with the
    benchmark taken as the deterministic ``doc_id % bench_mod == 0``
    subset of the corpus.

    Scale design (the reason this is BioBloom's subtract-filter pattern,
    ``BioBloomClassifier.cpp:102-110``, re-expressed): the benchmark side
    of a decontamination job is a small fixed eval suite, so its distinct
    n-grams broadcast once via ``ray.put`` as (a) a Bloom filter over
    combined-token-hash n-gram keys — the bit-cheap prefilter every probe
    batch tests vectorized — and (b) the exact n-gram string set, probed
    only for the Bloom-positive fraction (≈ overlap rate + FPR), which
    keeps the verify exact (no hash-collision false flags) without ever
    materializing probe-side n-gram strings in the common case.  The
    probe pass is map-only: no shuffle at any scale.

    Output (sorted by doc_id, benchmark docs excluded, docs with < n
    tokens excluded — they have no n-grams): ``doc_id, n_trigrams,
    n_contam, contaminated``.
    """
    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               ngram_strings_at,
                                               token_ngram_hashes)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    state_ref = _bench_trigram_state(ds, bench_mod, n, "decon_bench")

    def probe(b: pa.Table) -> pa.Table:
        import ray as _r
        words, m, hnum, exact = _r.get(state_ref)
        pf = BloomFilter(m=m, hash_num=hnum, kmer_size=n, words=words)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % bench_mod != 0)[0]
        if len(sel) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_trigrams": pa.array([], type=pa.int64()),
                             "n_contam": pa.array([], type=pa.int64()),
                             "contaminated": pa.array([], type=pa.int64())})
        sub = b.take(sel)
        ids = ids[sel]
        flat, lens, row_of = _token_arrays(sub)
        h1, h2, trow, tstart = token_ngram_hashes(flat, row_of, n)
        n_contam = np.zeros(len(ids), dtype=np.int64)
        if len(h1):
            cand = pf.contains(h1, h2)
            if cand.any():
                cs = ngram_strings_at(flat, tstart[cand], n)
                verified = cs.isin(exact).to_numpy()
                np.add.at(n_contam, trow[cand][verified], 1)
        keep = lens >= n
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_trigrams": pa.array(lens[keep] - (n - 1)),
            "n_contam": pa.array(n_contam[keep]),
            "contaminated": pa.array((n_contam[keep] > 0).astype(np.int64))})

    out = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


#: input-row gate for repeated_substrings' driver tier: below it the
#: deduped (doc, shingle-hash) pairs combine on the driver; above it the
#: native groupby(h) + hash-join path runs
REPEAT_DRIVER_MAX_ROWS = 200_000
#: window length (chars) for cross-document repeated-substring detection
REPEAT_SUBSTR_K = 30


def repeated_substrings(sf_dir: str, k: int = REPEAT_SUBSTR_K):
    """Cross-document repeated-substring profile — the exact-substring
    dedup signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better") expressed per position: for every document,
    count the k-char window positions whose substring also occurs in at
    least one OTHER document.  Output (docs with ≥ k chars, sorted):
    ``doc_id, n_positions, n_repeated``.

    Shape: one shingle-hash scan emits per-batch-deduped narrow
    ``(doc_id, h:int64, pos_cnt)`` rows (a document is never split
    across input rows, so per-batch dedup is global dedup); shingles in
    ≥ 2 distinct docs come from ONE native ``groupby(h).Count()``; the
    per-doc repeated-position tally is an inner hash join back to the
    pair rows plus a ``groupby(doc_id).Sum(pos_cnt)``.  Below
    ``REPEAT_DRIVER_MAX_ROWS`` input docs the pair rows combine on the
    driver instead (identical output, tier-parity-tested).  Substring
    identity is the 64-bit rolling shingle hash — collision probability
    ~N²/2⁶⁵ over N distinct shingles (≈1e-9 at the parity fixture; at
    10¹²-position scale swap in a 128-bit hash).  A pathologically hot
    substring (boilerplate in every page) skews the groupby key; the
    pair rows are already deduped per doc, bounding any key at n_docs
    rows — salt via ``stages/skew`` if that bound is still hot.
    """
    from biobloom_ray.hashing import shingle_hashes

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs_partial(b: pa.Table) -> pa.Table:
        texts = b["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _, nf = shingle_hashes(texts, k)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(len(ids), dtype=np.int64), nf)
        hs = h1.view(np.int64)
        order = np.lexsort((hs, row_of))
        rs, hss = row_of[order], hs[order]
        new = np.ones(len(rs), dtype=bool)
        if len(rs) > 1:
            new[1:] = (rs[1:] != rs[:-1]) | (hss[1:] != hss[:-1])
        starts = np.nonzero(new)[0]
        cnts = np.diff(np.append(starts, len(rs))).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[rs[starts]]),
                         "h": pa.array(hss[starts]),
                         "pos_cnt": pa.array(cnts)})

    def positions_partial(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False)
        keep = lens >= k
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_positions": pa.array(lens[keep] - (k - 1))})

    pairs = ds.map_batches(pairs_partial, batch_format="pyarrow")
    npos = (ds.map_batches(positions_partial, batch_format="pyarrow")
            .to_pandas())
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= REPEAT_DRIVER_MAX_ROWS:
        p = pairs.to_pandas()
        n_docs = p.groupby("h")["doc_id"].transform("size")
        rep = (p[n_docs >= 2].groupby("doc_id", as_index=False)
               ["pos_cnt"].sum().rename(columns={"pos_cnt": "n_repeated"}))
    else:
        from biobloom_ray.io import hash_join
        rep_h = (pairs.groupby("h")
                 .aggregate(Count(alias_name="n_docs")))

        def only_repeated(b: pa.Table) -> pa.Table:
            m = pc.greater_equal(b["n_docs"], 2)
            return b.filter(m).select(["h"])

        rep_h = rep_h.map_batches(only_repeated, batch_format="pyarrow")
        joined = hash_join(pairs, rep_h, on=("h",))
        rep = (joined.groupby("doc_id")
               .aggregate(Sum("pos_cnt", alias_name="n_repeated"))
               .to_pandas())

    out = npos.merge(rep, on="doc_id", how="left")
    out["n_repeated"] = out.n_repeated.fillna(0).astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def pii_redact(sf_dir: str):
    """PII redaction over the events props column — emails, IPv4
    literals and digit runs replaced by typed tokens, plus the
    pre-redaction digit-run count.  Map-only (three pandas C regex
    passes per batch); no shuffle at any scale.  Patterns are pinned to
    the Python-re ∩ RE2 common syntax so the DuckDB oracle's
    ``regexp_replace(..., 'g')`` chain is byte-identical."""
    from biobloom_ray.stages.webclean import pii_redact_batch

    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    out = ds.map_batches(pii_redact_batch, batch_format="pyarrow")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def gopher_quality_flags(sf_dir: str):
    """Gopher-style quality gate per document (Rae et al. 2021 §A.1.1
    shape) in exact integers — see
    ``stages/webclean.gopher_flags_batch``.  Map-only; no shuffle."""
    from biobloom_ray.stages.webclean import gopher_flags_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(gopher_flags_batch, batch_format="pyarrow")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


#: input-row gate for the boilerplate remover's broadcast tier: below
#: it the corpus-frequent n-gram partials combine on the driver; above
#: it ONE native groupby(h).Sum reduces them in the cluster first.  The
#: broadcast set itself is bounded by boilerplate cardinality (n-grams
#: in >= min_docs distinct docs), not corpus size.
BOILERPLATE_DRIVER_MAX_ROWS = 200_000
BOILERPLATE_N = 3
BOILERPLATE_MIN_DOCS = 3


def remove_boilerplate_ngrams(sf_dir: str, n: int = BOILERPLATE_N,
                              min_docs: int = BOILERPLATE_MIN_DOCS):
    """Cross-document boilerplate removal (RefinedWeb/CCNet line-dedup
    analogue for unstructured text): every token position covered by a
    token n-gram occurring in >= ``min_docs`` DISTINCT documents is
    dropped, and the survivors are re-joined with single spaces.
    Output (sorted): ``doc_id, text_clean, n_removed``.

    Shape: scan 1 emits per-batch-deduped narrow ``(h, n_docs)``
    partials (a doc never splits across rows, so batch dedup is global
    dedup); the frequent set comes from ONE native ``groupby(h).Sum``
    (driver-combined below ``BOILERPLATE_DRIVER_MAX_ROWS`` docs —
    tier-parity-tested) and broadcasts once via ``ray.put`` (size is
    bounded by boilerplate cardinality); scan 2 is map-only: interval
    overlay + one vectorized ``binary_join`` reassembly per batch.
    N-gram identity is the 64-bit combined-token hash (collision odds
    ~N²/2⁶⁵; swap to 128-bit at 10¹²-doc scale)."""
    import ray

    from biobloom_ray.stages.webclean import (ngram_doc_partials,
                                              remove_ngrams_batch)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    parts = ds.map_batches(lambda b: ngram_doc_partials(b, n),
                           batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= BOILERPLATE_DRIVER_MAX_ROWS:
        p = parts.to_pandas()
        agg = p.groupby("h", as_index=False)["n_docs"].sum()
        freq = np.sort(agg[agg.n_docs >= min_docs].h.to_numpy())
    else:
        agg = parts.groupby("h").aggregate(Sum("n_docs",
                                               alias_name="n_docs"))

        def hot(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b["n_docs"],
                                             min_docs)).select(["h"])

        freq = np.sort(agg.map_batches(hot, batch_format="pyarrow")
                       .to_pandas().h.to_numpy())
    freq_ref = ray.put(freq)

    def clean(b: pa.Table) -> pa.Table:
        import ray as _r
        return remove_ngrams_batch(b, _r.get(freq_ref), n)

    out = ds.map_batches(clean, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


#: input-row gate for bigram_lm_scores' broadcast tier (same contract
#: as RARITY_BROADCAST_MAX_ROWS, one level up: bigram tables are ~V²
#: at worst, so the gate is lower)
BIGRAM_BROADCAST_MAX_ROWS = 100_000


def bigram_lm_scores(sf_dir: str):
    """Pandas-result wrapper over ``_bigram_scores_ds`` (the query
    contract); see that function for the full design notes."""
    out = _bigram_scores_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _bigram_scores_ds(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-trained bigram language-model score per document — the
    classic LM-quality signal (CCNet-style, with a corpus-internal
    model instead of an external KenLM): for every adjacent token pair
    the MLE conditional probability is ``c(w1 w2) / c(w1·)`` where
    ``c(w1·)`` counts w1 as a bigram prefix; a page's score is the mean
    log-probability over its bigrams.  Output (docs with >= 2 tokens,
    sorted): ``doc_id, n_bigrams, sum_bigram_cnt, min_bigram_cnt``
    (exact ints) and ``avg_logprob_r6`` (mean ln p rounded to 6 dp —
    the rounding absorbs libm/summation-order ulps vs the oracle).

    Tiered like ``token_rarity_scores``: one tokenize+hash scan emits
    per-batch-combined ``(hg, hp, cnt)`` partials (hg = bigram hash,
    hp = prefix-token hash — a function of hg, so carrying it is
    shuffle-free); bigram and prefix counts are two native Sums over
    those narrow rows; below the gate they combine on the driver and
    broadcast once, above it the exploded grams hash-join the two count
    tables and reduce with native aggregates."""
    import ray

    from biobloom_ray.hashing import hash_strings
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               token_ngram_hashes)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def grams(b: pa.Table, partial: bool) -> pa.Table:
        flat, lens, row_of = _token_arrays(b)
        hg, _, gram_row, gram_start = token_ngram_hashes(flat, row_of, 2)
        hgs = hg.view(np.int64)
        if not len(hgs):
            cols = {"hg": pa.array([], type=pa.int64()),
                    "hp": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64())}
            if not partial:
                cols["doc_id"] = pa.array([], type=pa.int64())
                del cols["cnt"]
            return pa.table(cols)
        th = hash_strings(pa.array(flat.tolist(),
                                   type=pa.large_string()))
        hps = th[gram_start].view(np.int64)
        if not partial:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({"doc_id": pa.array(ids[gram_row]),
                             "hg": pa.array(hgs), "hp": pa.array(hps)})
        order = np.argsort(hgs, kind="stable")
        hgs_s, hps_s = hgs[order], hps[order]
        new = np.ones(len(hgs_s), dtype=bool)
        if len(hgs_s) > 1:
            new[1:] = hgs_s[1:] != hgs_s[:-1]
        starts = np.nonzero(new)[0]
        cnts = np.diff(np.append(starts, len(hgs_s))).astype(np.int64)
        return pa.table({"hg": pa.array(hgs_s[starts]),
                         "hp": pa.array(hps_s[starts]),
                         "cnt": pa.array(cnts)})

    parts = ds.map_batches(lambda b: grams(b, True),
                           batch_format="pyarrow")
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= BIGRAM_BROADCAST_MAX_ROWS:
        p = parts.to_pandas()
        cg = p.groupby("hg", as_index=False)["cnt"].sum()
        cp = p.groupby("hp", as_index=False)["cnt"].sum()
        hg_s = cg.hg.to_numpy()
        order = np.argsort(hg_s)
        model = ((hg_s[order], cg.cnt.to_numpy()[order]),
                 (np.sort(cp.hp.to_numpy()),
                  cp.cnt.to_numpy()[np.argsort(cp.hp.to_numpy())]))
        model_ref = ray.put(model)

        def score(b: pa.Table) -> pa.Table:
            import ray as _r
            (hg_t, cg_t), (hp_t, cp_t) = _r.get(model_ref)
            g = grams(b, False)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            gid = g["doc_id"].to_numpy(zero_copy_only=False)
            c_g = cg_t[np.searchsorted(hg_t, g["hg"].to_numpy())]
            c_p = cp_t[np.searchsorted(hp_t, g["hp"].to_numpy())]
            lp = np.log(c_g / c_p)
            uid, inv = np.unique(gid, return_inverse=True)
            nb = np.bincount(inv).astype(np.int64)
            s_cnt = np.zeros(len(uid), dtype=np.int64)
            np.add.at(s_cnt, inv, c_g)
            m_cnt = np.full(len(uid), np.iinfo(np.int64).max)
            np.minimum.at(m_cnt, inv, c_g)
            s_lp = np.zeros(len(uid))
            np.add.at(s_lp, inv, lp)
            return pa.table({
                "doc_id": pa.array(uid),
                "n_bigrams": pa.array(nb),
                "sum_bigram_cnt": pa.array(s_cnt),
                "min_bigram_cnt": pa.array(m_cnt),
                "avg_logprob_r6": pa.array(np.round(s_lp / nb, 6))})

        return ds.map_batches(score, batch_format="pyarrow")

    from biobloom_ray.io import hash_join
    cg = parts.groupby("hg").aggregate(Sum("cnt", alias_name="c_g"))
    cp_parts = parts.map_batches(
        lambda b: b.select(["hp", "cnt"]), batch_format="pyarrow")
    cp = cp_parts.groupby("hp").aggregate(Sum("cnt", alias_name="c_p"))
    exploded = ds.map_batches(lambda b: grams(b, False),
                              batch_format="pyarrow")
    j = hash_join(hash_join(exploded, cg, on=("hg",)), cp, on=("hp",))

    def lp_col(b: pa.Table) -> pa.Table:
        c_g = b["c_g"].to_numpy(zero_copy_only=False)
        c_p = b["c_p"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b["doc_id"],
                         "c_g": b["c_g"],
                         "lp": pa.array(np.log(c_g / c_p))})

    agg = (j.map_batches(lp_col, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Count(alias_name="n_bigrams"),
                      Sum("c_g", alias_name="sum_bigram_cnt"),
                      Min("c_g", alias_name="min_bigram_cnt"),
                      Sum("lp", alias_name="s_lp")))

    def finish(b: pa.Table) -> pa.Table:
        s_lp = b["s_lp"].to_numpy(zero_copy_only=False)
        nb = b["n_bigrams"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"], "n_bigrams": b["n_bigrams"],
            "sum_bigram_cnt": b["sum_bigram_cnt"],
            "min_bigram_cnt": b["min_bigram_cnt"],
            "avg_logprob_r6": pa.array(np.round(s_lp / nb, 6))})

    return agg.map_batches(finish, batch_format="pyarrow")


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def chunk_documents(sf_dir: str, chunk: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE):
    """Fixed-size overlapping token-window chunking (training-prep
    fan-out; see ``stages/webclean.chunk_docs_batch`` for the
    vectorized kernel).  Map-only flat_map — output fan-out is local
    to each batch, no shuffle at any scale; at 100 TB this is the
    stage whose OUTPUT exceeds its input (~chunk/stride ×), so it
    should feed a streaming writer, never a driver collect — the
    pandas tail here is the small-scale query contract only."""
    from biobloom_ray.stages.webclean import chunk_docs_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(lambda b: chunk_docs_batch(b, chunk, stride),
                         batch_format="pyarrow")
    return (out.to_pandas().sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True))


#: input-row gate for tfidf_top_terms' broadcast tier (same contract
#: as RARITY_BROADCAST_MAX_ROWS: below it the vocabulary df table is
#: driver-combined and broadcast, above it a string-keyed hash join)
TFIDF_BROADCAST_MAX_ROWS = 100_000


def _doc_term_tf(b: pa.Table) -> pa.Table:
    """Per-batch (doc_id, token, tf) rows — exact, since a doc never
    splits across input rows.  Codes from np.unique are lex-ordered,
    which downstream tie-breaks rely on."""
    from biobloom_ray.stages.textstats import _token_arrays

    flat, lens, row_of = _token_arrays(b)
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    if not len(flat):
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "token": pa.array([], type=pa.string()),
                         "tf": pa.array([], type=pa.int64())})
    # hash-based factorize + small-vocab rank beats np.unique's
    # O(n log n) object-string sort ~30x; output is identical
    # (lex-sorted uniq, lex-ordered codes)
    codes0, uniq0 = pd.factorize(pd.Index(flat, dtype=object))
    vorder = np.argsort(uniq0)
    rank = np.empty(len(vorder), dtype=np.int64)
    rank[vorder] = np.arange(len(vorder))
    uniq = uniq0.to_numpy(dtype=object)[vorder]
    codes = rank[codes0]
    order = np.lexsort((codes, row_of))
    rs, cs = row_of[order], codes[order]
    new = np.ones(len(rs), dtype=bool)
    new[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
    starts = np.nonzero(new)[0]
    tf = np.diff(np.append(starts, len(rs))).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(ids[rs[starts]]),
        "token": pa.array(uniq[cs[starts]].tolist(), type=pa.string()),
        "tf": pa.array(tf)})


def tfidf_top_terms(sf_dir: str):
    """Most-salient term per document, ranked by EXACT INTEGERS —
    (tf desc, df asc, token asc) — so the winning row is float-free on
    both engines; the tf·idf score ``tf * ln(N/df)`` is emitted as a
    6-dp-rounded value column only (same float-absorption contract as
    ``bigram_lm_scores``).  Output (docs with >= 1 token, sorted):
    ``doc_id, top_term, tf, df, tfidf_r6``.

    Tiered: per-batch-deduped (token, df) partials -> ONE native
    ``groupby(token).Sum`` (df is exact: a doc never splits across
    rows).  Below the gate the vocabulary broadcasts once via
    ``ray.put`` (sorted-array binary search per batch, map-only
    pick); above it the (doc_id, token, tf) rows hash-join the df
    table, a global sort on the ranking key range-partitions the rows,
    each block keeps its first row per doc, and the driver keeps the
    first survivor per doc in sort order (candidates <= one per
    block that touches the doc; driver tail is proportional to the
    OUTPUT, one row per doc)."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = _cheap_count(ds)
    if n_docs is None:
        n_docs = ds.count()

    tf_ds = ds.map_batches(_doc_term_tf, batch_format="pyarrow")

    def df_partials(b: pa.Table) -> pa.Table:
        t = _doc_term_tf(b)
        ones = np.ones(len(t), dtype=np.int64)
        return pa.table({"token": t["token"], "df": pa.array(ones)})

    parts = ds.map_batches(df_partials, batch_format="pyarrow")

    if n_docs <= TFIDF_BROADCAST_MAX_ROWS:
        p = parts.to_pandas()
        dfg = p.groupby("token", as_index=False)["df"].sum()
        vocab = dfg.token.to_numpy(dtype=object)
        order = np.argsort(vocab)
        vocab, dfv = vocab[order], dfg.df.to_numpy()[order]
        ref = ray.put((vocab, dfv, n_docs))

        def pick(b: pa.Table) -> pa.Table:
            import ray as _r
            vocab, dfv, N = _r.get(ref)
            t = _doc_term_tf(b)
            if not len(t):
                return pa.table({
                    "doc_id": pa.array([], type=pa.int64()),
                    "top_term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                    "tfidf_r6": pa.array([], type=pa.float64())})
            toks = t["token"].to_numpy(zero_copy_only=False)
            tf = t["tf"].to_numpy(zero_copy_only=False)
            dids = t["doc_id"].to_numpy(zero_copy_only=False)
            dfx = dfv[np.searchsorted(vocab, toks)]
            # lex-ordered token codes keep the tie-break integer-only
            _, tcodes = np.unique(toks, return_inverse=True)
            order = np.lexsort((tcodes, dfx, -tf, dids))
            keep = np.ones(len(order), dtype=bool)
            keep[1:] = dids[order][1:] != dids[order][:-1]
            w = order[keep]
            return pa.table({
                "doc_id": pa.array(dids[w]),
                "top_term": pa.array(toks[w].tolist(), type=pa.string()),
                "tf": pa.array(tf[w]),
                "df": pa.array(dfx[w]),
                "tfidf_r6": pa.array(np.round(
                    tf[w] * np.log(N / dfx[w]), 6))})

        out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    from biobloom_ray.io import hash_join
    dfd = parts.groupby("token").aggregate(Sum("df", alias_name="df"))
    j = hash_join(tf_ds, dfd, on=("token",))
    ranked = j.sort(["doc_id", "tf", "df", "token"],
                    descending=[False, True, False, False])

    def block_first(b: pa.Table) -> pa.Table:
        dids = b["doc_id"].to_numpy(zero_copy_only=False)
        if not len(dids):
            return b
        keep = np.ones(len(dids), dtype=bool)
        keep[1:] = dids[1:] != dids[:-1]
        return b.filter(pa.array(keep))

    cand = (ranked.map_batches(block_first, batch_format="pyarrow",
                               batch_size=None).to_pandas())
    out = cand.drop_duplicates("doc_id", keep="first").copy()
    out["tfidf_r6"] = np.round(
        out.tf.to_numpy() * np.log(n_docs / out.df.to_numpy()), 6)
    out = out.rename(columns={"token": "top_term"})
    out = out[["doc_id", "top_term", "tf", "df", "tfidf_r6"]]
    return out.sort_values("doc_id").reset_index(drop=True)


PPL_BUCKETS = 3


def bigram_ppl_buckets(sf_dir: str, n_buckets: int = PPL_BUCKETS):
    """CCNet-style quality bucketing (head/middle/tail): NTILE over the
    corpus ranked by the bigram-LM score (best = bucket 1), with exact
    SQL NTILE semantics — earlier buckets take the remainder rows.

    Distributed global-rank pattern (same primitive as
    ``pack_documents``): sort by (score desc, doc_id) → materialize
    (pins the block layout) → pass 1 reads one row per block (first
    key + row count) → driver computes #blocks exclusive rank offsets
    → pass 2 adds the broadcast offset to each block's local arange
    and maps rank → bucket in closed form.  Partitioning assumption,
    documented: pass 2's batches are exactly pass 1's blocks
    (``batch_size=None`` on the same materialized dataset)."""
    import ray

    sc = _bigram_scores_ds(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "avg_logprob_r6"]),
        batch_format="pyarrow")
    sorted_ds = sc.sort(["avg_logprob_r6", "doc_id"],
                        descending=[True, False]).materialize()

    def block_key_cnt(b: pa.Table) -> pa.Table:
        lp = b["avg_logprob_r6"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(lp) == 0:
            return pa.table({"k_lp": pa.array([], type=pa.float64()),
                             "k_docid": pa.array([], type=pa.int64()),
                             "blk_n": pa.array([], type=pa.int64())})
        return pa.table({"k_lp": pa.array([float(lp[0])]),
                         "k_docid": pa.array([int(ids[0])]),
                         "blk_n": pa.array([len(lp)])})

    blocks = (sorted_ds.map_batches(block_key_cnt, batch_format="pyarrow",
                                    batch_size=None).to_pandas())
    blocks = blocks.sort_values(["k_lp", "k_docid"],
                                ascending=[False, True])
    offs = blocks.blk_n.cumsum().shift(fill_value=0).to_numpy()
    n_total = int(blocks.blk_n.sum())
    off_of = {(float(r.k_lp), int(r.k_docid)): int(o)
              for r, o in zip(blocks.itertuples(), offs)}
    off_ref = ray.put(off_of)
    base_sz, rem = divmod(n_total, n_buckets)
    cut = rem * (base_sz + 1)

    def assign(b: pa.Table) -> pa.Table:
        import ray as _r
        omap = _r.get(off_ref)
        lp = b["avg_logprob_r6"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(lp) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "avg_logprob_r6": pa.array(
                                 [], type=pa.float64()),
                             "ppl_bucket": pa.array([], type=pa.int64())})
        rank = omap[(float(lp[0]), int(ids[0]))] + np.arange(
            len(lp), dtype=np.int64)
        bucket = np.where(
            rank < cut, rank // (base_sz + 1) + 1,
            rem + (rank - cut) // max(base_sz, 1) + 1)
        return pa.table({"doc_id": pa.array(ids),
                         "avg_logprob_r6": pa.array(lp),
                         "ppl_bucket": pa.array(bucket)})

    return (sorted_ds.map_batches(assign, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


#: input-row gate for dup_clusters' driver tier (same contract as
#: REPEAT_DRIVER_MAX_ROWS: below it the deduped membership rows combine
#: on the driver, above it the iterative BSP label propagation runs)
DUPC_DRIVER_MAX_ROWS = 200_000
#: window length (chars) for the shared-substring edge definition
DUPC_SUBSTR_K = 30
#: grams in more than this many docs are boilerplate, not dup evidence
DUPC_HOT_GRAM_CAP = 10
#: hard stop for the label-propagation loop (converges in O(log D)
#: rounds for D-doc components; real dup clusters have tiny diameter)
DUPC_MAX_ITERS = 50

#: when a list, the BSP cluster loop appends (round, wall_s) per round —
#: used by scripts/bsp_amortization.py to evidence that per-round cost
#: is data-bound (fixed cost amortizes) as the corpus grows
DUPC_ROUND_LOG: list | None = None


def _gram_membership(b: pa.Table, k: int) -> pa.Table:
    """Per-batch-deduped ``(doc_id, h)`` membership rows: doc contains
    the k-char shingle with 64-bit rolling hash h.  A document never
    splits across input rows, so per-batch dedup is global dedup."""
    from biobloom_ray.hashing import shingle_hashes

    texts = b["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    h1, _, nf = shingle_hashes(texts, k)
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(len(ids), dtype=np.int64), nf)
    hs = h1.view(np.int64)
    order = np.lexsort((hs, row_of))
    rs, hss = row_of[order], hs[order]
    new = np.ones(len(rs), dtype=bool)
    if len(rs) > 1:
        new[1:] = (rs[1:] != rs[:-1]) | (hss[1:] != hss[:-1])
    return pa.table({"doc_id": pa.array(ids[rs[new]]),
                     "h": pa.array(hss[new])})


def dup_clusters(sf_dir: str, k: int = DUPC_SUBSTR_K,
                 cap: int = DUPC_HOT_GRAM_CAP):
    """Near-duplicate CLUSTERS by connected components over the
    shared-substring graph — the grouping step a dedup pipeline runs
    after pair generation (each cluster keeps one representative): two
    docs are connected when they share a k-char substring occurring in
    2..cap distinct docs (the cap excludes boilerplate grams, which are
    popularity, not duplication — same motivation as
    ``remove_boilerplate_ngrams``).  Output (docs in a component of
    size >= 2, sorted): ``doc_id, cluster_id, cluster_size`` with
    cluster_id = min doc_id of the component.

    Shape: one shingle scan emits per-batch-deduped narrow
    ``(doc_id, h)`` membership rows; grams kept by ONE native
    ``groupby(h).Count()`` (rows are deduped per doc, so Count = df);
    components via BSP min-label propagation on the bipartite doc-gram
    graph — per round, 2 hash joins + 2 native ``Min`` groupbys:
    ``lbl(doc) <- min over its grams of min over the gram's docs of
    lbl``.  Labels decrease monotonically, so ``sum(lbl)`` unchanged
    <=> fixpoint; rounds needed = O(log max-component-diameter).  The
    per-round label table is materialized to truncate lineage — it is
    16 B/doc narrow rows bounded by the DUPLICATE population, not the
    corpus (checkpoint to parquet above an object-store gate at real
    scale, as ``stages/dedup`` documents for signatures).  Below
    ``DUPC_DRIVER_MAX_ROWS`` input docs the membership rows combine on
    the driver with the identical numpy propagation
    (tier-parity-tested).  Substring identity is the 64-bit shingle
    hash — collision odds ~N^2/2^65 (swap in the 128-bit pair at
    10^12-shingle scale).  Skew: the cap bounds every gram group at
    ``cap`` rows; the groupby(h) key itself is the dedup bound
    (<= n_docs rows per h).
    """
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    mem_all = ds.map_batches(lambda b: _gram_membership(b, k),
                             batch_format="pyarrow")
    n_rows = _cheap_count(ds)

    def _frame(doc_id, cluster_id, cluster_size):
        out = pd.DataFrame({
            "doc_id": np.asarray(doc_id, dtype=np.int64),
            "cluster_id": np.asarray(cluster_id, dtype=np.int64),
            "cluster_size": np.asarray(cluster_size, dtype=np.int64)})
        return out.sort_values("doc_id").reset_index(drop=True)

    if n_rows is not None and n_rows <= DUPC_DRIVER_MAX_ROWS:
        p = mem_all.to_pandas()
        df_of = p.groupby("h")["doc_id"].transform("size")
        m = p[(df_of >= 2) & (df_of <= cap)]
        if len(m) == 0:
            return _frame([], [], [])
        docs, gid = np.unique(m.doc_id.to_numpy(), return_inverse=True)
        _, hidx = np.unique(m.h.to_numpy(), return_inverse=True)
        n_h = int(hidx.max()) + 1
        lbl = docs.copy()
        for _ in range(DUPC_MAX_ITERS):
            hl = np.full(n_h, np.iinfo(np.int64).max)
            np.minimum.at(hl, hidx, lbl[gid])
            nl = lbl.copy()
            np.minimum.at(nl, gid, hl[hidx])
            if (nl == lbl).all():
                break
            lbl = nl
        uniq, inv, cnt = np.unique(lbl, return_inverse=True,
                                   return_counts=True)
        return _frame(docs, lbl, cnt[inv])

    from biobloom_ray.io import hash_join
    dfc = mem_all.groupby("h").aggregate(Count(alias_name="n_docs"))

    def kept_only(b: pa.Table) -> pa.Table:
        ok = pc.and_(pc.greater_equal(b["n_docs"], 2),
                     pc.less_equal(b["n_docs"], cap))
        return b.filter(ok).select(["h"])

    kept = dfc.map_batches(kept_only, batch_format="pyarrow")
    mem = hash_join(mem_all, kept, on=("h",)).materialize()

    def init_lbl(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "lbl": b["doc_id"]})

    lbl_ds = (mem.groupby("doc_id").aggregate(Count(alias_name="x"))
              .map_batches(lambda b: init_lbl(b), batch_format="pyarrow")
              .materialize())
    import time as _time

    prev_tot = None
    for _r in range(DUPC_MAX_ITERS):
        _t0 = _time.perf_counter()
        a = hash_join(mem, lbl_ds, on=("doc_id",))
        hmin = a.groupby("h").aggregate(Min("lbl", alias_name="hlbl"))
        bjoin = hash_join(mem, hmin, on=("h",))
        lbl_ds = (bjoin.groupby("doc_id")
                  .aggregate(Min("hlbl", alias_name="lbl"))
                  .materialize())
        tot = lbl_ds.sum("lbl")
        if DUPC_ROUND_LOG is not None:  # amortization instrumentation
            DUPC_ROUND_LOG.append(
                (_r, round(_time.perf_counter() - _t0, 3)))
        if tot == prev_tot:
            break
        prev_tot = tot

    # label table is output-scale (one row per dup doc) — size the
    # clusters driver-side rather than paying another shuffle + join
    out = lbl_ds.to_pandas()
    if len(out) == 0:
        return _frame([], [], [])
    sizes = out.groupby("lbl")["doc_id"].transform("size")
    return _frame(out.doc_id, out.lbl, sizes)


def source_stats(sf_dir: str):
    """Per-domain corpus profile — the per-source aggregate every web
    pipeline keeps for domain-level filtering decisions (cf. C4 /
    RefinedWeb per-domain stats): document count, total chars, distinct
    languages, and mean chars (6-dp-rounded VALUE column; row identity
    is the exact source key).  Shape: per-batch pandas partials at
    (source, lang) granularity -> ONE native ``groupby([source, lang])``
    Sum (key cardinality #sources x #langs, never corpus-scale) -> the
    driver folds langs into the per-source row (output-scale).  Output
    sorted by source."""
    ds = _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "lang": b["lang"].to_pandas(),
                           "n_chars": b["n_chars"].to_numpy(
                               zero_copy_only=False)})
        agg = df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    sl = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["source", "lang"])
          .aggregate(Sum("n_docs", alias_name="n_docs"),
                     Sum("sum_chars", alias_name="sum_chars"))
          .to_pandas())
    out = (sl.groupby("source", as_index=False)
           .agg(n_docs=("n_docs", "sum"),
                sum_chars=("sum_chars", "sum"),
                n_langs=("lang", "size")))
    out["n_docs"] = out.n_docs.astype(np.int64)
    out["sum_chars"] = out.sum_chars.astype(np.int64)
    out["n_langs"] = out.n_langs.astype(np.int64)
    out["avg_chars_r6"] = np.round(
        out.sum_chars.to_numpy() / out.n_docs.to_numpy(), 6)
    out = out[["source", "n_docs", "sum_chars", "n_langs", "avg_chars_r6"]]
    return out.sort_values("source").reset_index(drop=True)


#: input-row gate for source_quality_gate's broadcast tier: below it
#: the kept-source set ships once via ray.put (filter is map-only);
#: above it a hash semi-join on source runs instead
SRCGATE_BROADCAST_MAX_ROWS = 100_000


def source_quality_gate(sf_dir: str):
    """Domain-level quality gate — keep documents whose SOURCE has a
    Gopher pass rate >= 1/2 (exact integers: ``2 * n_pass >= n_docs``),
    the UT1/RefinedWeb-style 'judge the domain, not the page' filter.
    Two phases: (1) per-batch (source, n_docs, n_pass) partials from
    the ``gopher_flags_batch`` kernel -> ONE native ``groupby(source)``
    Sum -> the kept-source table (#domains rows, never corpus-scale);
    (2) a map-only filter of the documents scan against that table —
    broadcast once via ``ray.put`` below ``SRCGATE_BROADCAST_MAX_ROWS``
    input rows, hash semi-join above it (tier-parity-tested).  Output
    (kept docs, sorted): ``doc_id, source``."""
    import ray

    from biobloom_ray.stages.webclean import gopher_flags_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def rate_partial(b: pa.Table) -> pa.Table:
        flags = gopher_flags_batch(b)
        df = pd.DataFrame({
            "source": b["source"].to_pandas(),
            "p": flags["pass_gopher"].to_numpy(zero_copy_only=False)})
        agg = df.groupby("source", as_index=False).agg(
            n_docs=("p", "size"), n_pass=("p", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    rates = (ds.map_batches(rate_partial, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("n_pass", alias_name="n_pass")))

    def kept_only(b: pa.Table) -> pa.Table:
        n = b["n_docs"].to_numpy(zero_copy_only=False)
        p = b["n_pass"].to_numpy(zero_copy_only=False)
        return pa.table({"source": b["source"].filter(
            pa.array(2 * p >= n))})

    kept = rates.map_batches(kept_only, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    # phase-2 scan re-reads only the two output columns — the text
    # column (the bulk of the table's bytes) stays in storage
    slim = _read(sf_dir, "documents", columns=["doc_id", "source"])

    if n_rows is not None and n_rows <= SRCGATE_BROADCAST_MAX_ROWS:
        kset = np.sort(kept.to_pandas().source.to_numpy(dtype=object))
        ref = ray.put(kset)

        def pick(b: pa.Table) -> pa.Table:
            import ray as _r
            ks = _r.get(ref)
            src = b["source"].to_numpy(zero_copy_only=False)
            if len(ks) == 0:
                m = np.zeros(len(src), dtype=bool)
            else:
                i = np.searchsorted(ks, src)
                i = np.minimum(i, len(ks) - 1)
                m = ks[i] == src
            return b.filter(pa.array(m))

        out = (slim.map_batches(pick, batch_format="pyarrow")
               .to_pandas())
    else:
        from biobloom_ray.io import hash_join
        out = hash_join(slim, kept, on=("source",)).to_pandas()
        if out.empty:
            # a fully-empty kept side makes every guarded-join
            # partition emit a schema-less block; restore the columns
            out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                "source": pd.Series([], dtype=object)})
        out = out[["doc_id", "source"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def token_freq_histogram(sf_dir: str):
    """Zipf profile of the corpus vocabulary: for every global token
    frequency f, how many distinct tokens occur exactly f times — the
    frequency-of-frequencies table (Good-Turing input, vocabulary-
    truncation diagnostics).  Shape: per-batch-combined (token, cnt)
    partials -> ONE native ``groupby(token)`` Sum (the inherent
    vocabulary shuffle, narrow rows) -> per-batch histogram partials ->
    a tiny ``groupby(freq)`` Sum (#distinct-frequencies keys, ~log-
    scale).  Output sorted by freq: ``freq, n_tokens``."""
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["text"])

    def tok_partial(b: pa.Table) -> pa.Table:
        flat, _, _ = _token_arrays(b)
        if not len(flat):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        # hash-based factorize beats np.unique's object-string sort
        # ~30x; partial order is irrelevant (feeds a groupby)
        codes, uniq = pd.factorize(pd.Index(flat, dtype=object))
        cnt = np.bincount(codes, minlength=len(uniq))
        return pa.table({"token": pa.array(uniq.to_numpy(dtype=object)
                                           .tolist(), type=pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    vocab = (ds.map_batches(tok_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("cnt", alias_name="cnt")))

    def hist_partial(b: pa.Table) -> pa.Table:
        c = b["cnt"].to_numpy(zero_copy_only=False)
        if not len(c):
            return pa.table({"freq": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64())})
        f, n = np.unique(c, return_counts=True)
        return pa.table({"freq": pa.array(f.astype(np.int64)),
                         "n_tokens": pa.array(n.astype(np.int64))})

    out = (vocab.map_batches(hist_partial, batch_format="pyarrow")
           .groupby("freq").aggregate(Sum("n_tokens",
                                          alias_name="n_tokens"))
           .to_pandas())
    out["n_tokens"] = out.n_tokens.astype(np.int64)
    return out.sort_values("freq").reset_index(drop=True)


#: posting-list df band: tokens in fewer docs are noise for retrieval,
#: hotter tokens are stopwords whose lists would be corpus-scale
INVIDX_MIN_DF = 2
INVIDX_MAX_DF = 50
#: input-row gate for inverted_index's driver tier (same contract as
#: TFIDF_BROADCAST_MAX_ROWS): below it the banded vocab broadcasts and
#: the output-scale filtered pairs are driver-assembled; above it the
#: hash-join + global-sort cluster path runs
INVIDX_DRIVER_MAX_ROWS = 100_000


def inverted_index(sf_dir: str, min_df: int = INVIDX_MIN_DF,
                   max_df: int = INVIDX_MAX_DF):
    """Token -> posting-list build (the retrieval-side index of a
    training-data search/decontamination stack): for every token with
    ``min_df <= df <= max_df`` distinct docs, the ascending doc_id
    list as a comma-joined string.  The df cap is what makes the op
    scale-sane — stopword-grade tokens would otherwise carry
    corpus-scale lists through the shuffle (cap them or shard them;
    here they are out of the index's scope by definition).

    Tiered.  Cluster path: per-batch-deduped ``(doc_id, token)`` pairs
    (a doc never splits across rows) -> df from ONE native
    ``groupby(token).Count`` -> banded tokens hash-join the pairs ->
    ONE global sort on ``(token, doc_id)`` range-partitions the
    postings -> per block, segment starts + ``pa.ListArray`` +
    int->string cast + ``binary_join`` build each token's in-block
    postings string with zero per-row Python -> the driver stitches
    the <= #blocks-1 tokens that span a block boundary (output-scale
    tail).  Below ``INVIDX_DRIVER_MAX_ROWS`` input docs ONE
    tokenization scan ships the per-doc-distinct (doc_id, token)
    pairs to the driver and the df/band/postings fold runs in pandas
    — no second scan, no shuffle; driver rows are bounded by
    gate_docs x distinct tokens per doc (bit-identical by the
    tier-parity test).  Output sorted by token:
    ``token, df, postings``."""
    from biobloom_ray.io import hash_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = _cheap_count(ds)
    if n_docs is None:
        n_docs = ds.count()

    if n_docs <= INVIDX_DRIVER_MAX_ROWS:
        # ONE tokenization scan: the per-doc-distinct (doc_id, token)
        # pairs come to the driver (rows <= gate_docs x distinct
        # tokens per doc — the gate bounds it, same memory order as
        # the TFIDF tier) and df + band + postings fold in pandas;
        # no cluster groupby, no join, no global sort, no re-scan
        def pairs_partial(b: pa.Table) -> pa.Table:
            return _doc_term_tf(b).select(["doc_id", "token"])

        hit = (ds.map_batches(pairs_partial, batch_format="pyarrow")
               .to_pandas())
        if len(hit) == 0:
            return pd.DataFrame({
                "token": pd.Series([], dtype=object),
                "df": pd.Series([], dtype=np.int64),
                "postings": pd.Series([], dtype=object)})
        dfs = hit.groupby("token").size()
        band = dfs[(dfs >= min_df) & (dfs <= max_df)]
        hit = hit[hit.token.isin(band.index)]
        if len(hit) == 0:
            return pd.DataFrame({
                "token": pd.Series([], dtype=object),
                "df": pd.Series([], dtype=np.int64),
                "postings": pd.Series([], dtype=object)})
        hit = hit.sort_values(["token", "doc_id"])
        out = (hit.groupby("token", sort=True)["doc_id"]
               .agg(lambda s: ",".join(str(int(x)) for x in s))
               .rename("postings").reset_index())
        out["df"] = band.loc[out.token].to_numpy().astype(np.int64)
        out = out[["token", "df", "postings"]]
        return out.sort_values("token").reset_index(drop=True)

    pairs = ds.map_batches(_doc_term_tf, batch_format="pyarrow") \
              .map_batches(lambda b: b.select(["doc_id", "token"]),
                           batch_format="pyarrow")
    dfc = pairs.groupby("token").aggregate(Count(alias_name="df"))

    def banded(b: pa.Table) -> pa.Table:
        ok = pc.and_(pc.greater_equal(b["df"], min_df),
                     pc.less_equal(b["df"], max_df))
        return b.filter(ok)

    kept = dfc.map_batches(banded, batch_format="pyarrow")
    j = hash_join(pairs, kept, on=("token",))
    srt = j.sort(["token", "doc_id"])

    def block_postings(b: pa.Table) -> pa.Table:
        toks = b["token"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(toks)
        if n == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "postings": pa.array([], type=pa.string())})
        new = np.ones(n, dtype=bool)
        new[1:] = toks[1:] != toks[:-1]
        starts = np.nonzero(new)[0]
        offs = np.append(starts, n).astype(np.int32)
        id_str = pc.cast(pa.array(ids), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offs), id_str)
        return pa.table({
            "token": pa.array(toks[starts].tolist(), type=pa.string()),
            "n": pa.array((offs[1:] - offs[:-1]).astype(np.int64)),
            "postings": pc.binary_join(lists, ",")})

    part = srt.map_batches(block_postings, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if len(part) == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype=np.int64),
                             "postings": pd.Series([], dtype=object)})
    # blocks arrive in global sort order; segments of one token are
    # adjacent — stitch them (at most #blocks-1 boundary tokens)
    out = (part.groupby("token", sort=True)
           .agg(df=("n", "sum"), postings=("postings", ",".join))
           .reset_index())
    out["df"] = out.df.astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


#: fixed retrieval query for bm25_topk (sorted; the summation order of
#: per-term contributions is pinned to this order in the engine)
BM25_QUERY_TERMS = ("merge", "spark", "window")
#: Okapi constants k1=1.2, b=0.75 — folded into the exact-integer
#: rational denominator (10*T*tf + 3*T + 9*dl*N) / (10*T) below
BM25_TOPK = 20


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = BM25_QUERY_TERMS,
              k: int = BM25_TOPK):
    """Okapi-BM25 retrieval of the top-``k`` documents for a fixed
    term query — the search side of a training-data inspection /
    decontamination stack.  Float parity with the SQL oracle follows
    the repo's 6-dp contract (`bigram_lm_scores`): every input to the
    score is an EXACT int64 (corpus doc count N, corpus token count T,
    per-term df, per-doc dl, per-doc-term tf), the k1=1.2 / b=0.75
    constants are folded into an exact rational,

        score = sum_t (ln(2*(N+1)) - ln(2*df_t+1))
                      * 22*tf*T / (10*T*tf + 3*T + 9*dl*N)

    so both engines evaluate the same double ops on identical exact
    integers and only ln/rounding ULPs remain, absorbed by ROUND(.,6).

    Shape: pass A is a map-only stats sweep (one fixed-width partial
    row per batch: n_docs, tot_tokens, per-term df) driver-summed at
    #batches scale; pass B is map-only scoring with the 5 stats ints
    closed over (no broadcast object needed), emitting each block's
    top-k candidates; the driver merges <= k * #blocks rows.  No
    shuffle at any scale; the corpus is read twice but each read is
    column-pruned and the stats pass does no groupby.

    Output (sorted by bm25_r6 desc, doc_id): ``doc_id, bm25_r6``."""
    from biobloom_ray.stages.textstats import _token_arrays

    tvocab = np.array(sorted(terms), dtype=object)
    m = len(tvocab)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(b: pa.Table) -> pa.Table:
        flat, lens, row_of = _token_arrays(b)
        cols = {"n_docs": pa.array([b.num_rows], type=pa.int64()),
                "tot_tokens": pa.array([int(len(flat))],
                                       type=pa.int64())}
        hit = np.isin(flat, tvocab)
        rows, toks = row_of[hit], flat[hit]
        tcode = np.searchsorted(tvocab, toks)
        # df partial: distinct docs in this batch containing the term
        dfp = np.zeros(m, dtype=np.int64)
        if len(rows):
            u = np.unique(rows * m + tcode)
            np.add.at(dfp, u % m, 1)
        for i in range(m):
            cols[f"df{i}"] = pa.array([int(dfp[i])], type=pa.int64())
        return pa.table(cols)

    st = (ds.map_batches(stats_partial, batch_format="pyarrow")
          .to_pandas().sum())
    N, T = int(st.n_docs), int(st.tot_tokens)
    dfv = np.array([int(st[f"df{i}"]) for i in range(m)],
                   dtype=np.int64)
    if T == 0 or not (dfv > 0).any():
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "bm25_r6": pd.Series([], dtype=np.float64)})
    idf = np.log(2.0 * (N + 1)) - np.log(2.0 * dfv + 1)

    def score_block(b: pa.Table) -> pa.Table:
        flat, lens, row_of = _token_arrays(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        hit = np.isin(flat, tvocab)
        if not hit.any():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "bm25_r6": pa.array([], type=pa.float64())})
        rows, toks = row_of[hit], flat[hit]
        tcode = np.searchsorted(tvocab, toks)
        # tf per (row, term); np.unique returns keys sorted, so the
        # per-row summation below runs in fixed (term-sorted) order
        key, tf = np.unique(rows * m + tcode, return_counts=True)
        krow, kterm = key // m, key % m
        dl = lens[krow]
        if T < 1 << 40:
            # exact-integer path (oracle-parity contract): every
            # product stays well inside int64/2^53
            num = 22.0 * (tf * T)
            den = (10 * T * tf + 3 * T + 9 * dl * N) \
                .astype(np.float64)
        else:
            # corpus scale: 10*T*tf would wrap int64 — compute in
            # float64 (rel err ~1e-16, far below the 6-dp contract)
            tff = tf.astype(np.float64)
            num = 22.0 * tff * T
            den = 10.0 * T * tff + 3.0 * T \
                + 9.0 * dl.astype(np.float64) * N
        contrib = idf[kterm] * (num / den)
        urow, inv = np.unique(krow, return_inverse=True)
        score = np.zeros(len(urow), dtype=np.float64)
        np.add.at(score, inv, contrib)
        r6 = np.round(score, 6)
        # block-local top-k on the exact final ranking key
        order = np.lexsort((ids[urow], -r6))[:k]
        return pa.table({"doc_id": pa.array(ids[urow][order]),
                         "bm25_r6": pa.array(r6[order])})

    cand = ds.map_batches(score_block, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    out = cand.sort_values(["bm25_r6", "doc_id"],
                           ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def source_mix_sample(sf_dir: str):
    """Source-mixture rebalancer — the dataset-mixing step of a
    training-data pipeline (cap a dominant domain, as in Pile/CCNet
    source weighting): downsample every source above the headroom cap
    ``C = ceil(total_docs / (2 * n_sources))`` (half the uniform
    share — the standard dominance bound that leaves room for
    under-represented domains to be upweighted later) with the SAME
    bit-exact splitmix64 keep rule as :func:`deterministic_sample_hash`
    (keep iff ``splitmix64(doc_id) < (C << 64) // n_s``; sources at or
    under the cap keep everything, no hash test).  Reproducible across
    runs/retries/engines; the oracle replays splitmix64 in 128-bit
    DuckDB arithmetic and computes the identical integer thresholds.

    Shape: one native ``groupby(source).Count`` (tiny shuffle, one row
    per source) -> per-source integer thresholds closed over (#sources
    entries, broadcast-trivial) -> map-only vectorized filter pass.
    Output (sorted by doc_id): ``doc_id, source``."""
    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    cnt = ds.groupby("source").aggregate(Count(alias_name="n")).to_pandas()
    total, k = int(cnt.n.sum()), len(cnt)
    if k == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "source": pd.Series([], dtype=object)})
    cap = (total + 2 * k - 1) // (2 * k)
    svocab = cnt.source.to_numpy(dtype=object)
    order = np.argsort(svocab)
    svocab = svocab[order]
    ns = cnt.n.to_numpy()[order].astype(np.int64)
    keep_all = ns <= cap
    thr = np.where(keep_all, np.uint64(0),
                   np.array([(cap << 64) // int(n) if n > cap else 0
                             for n in ns], dtype=np.uint64))

    def pick(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = b["source"].to_numpy(zero_copy_only=False)
        code = np.searchsorted(svocab, src)
        mask = keep_all[code] | (splitmix64(ids) < thr[code])
        return b.filter(pa.array(mask))

    out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


#: input-row gate for lang_centroids' broadcast tier: below it the
#: (doc_id, lang) map ships once via ray.put (sorted-id searchsorted
#: per batch — no join); above it the blob-packed hash join runs
CENTROID_BROADCAST_MAX_ROWS = 100_000


def lang_centroids(sf_dir: str):
    """Per-language embedding centroid (the seed statistic of
    clustering-based curation / domain-balance checks): mean embedding
    vector per ``lang``, one output row per (lang, dim).

    Cross-table shape (above the gate): embeddings' ``list<float>``
    column is packed to a FixedSizeBinary blob (acero rejects list
    payloads through a hash join — biobloom_ray.io gotcha),
    hash-joined with the documents (doc_id, lang) projection, then
    per-batch partial sums collapse each block to #langs x dim rows
    (factorize + one ``np.add.at``) before ONE native
    ``groupby([lang, dim]).Sum`` — the all-to-all moves partials only,
    never vectors.  Below ``CENTROID_BROADCAST_MAX_ROWS`` docs the
    (doc_id, lang) map broadcasts once and the whole op is map-only
    partials + a driver fold (#langs x dim rows per block,
    tier-parity-tested).  Mean is emitted under the repo's 6-dp float
    contract (sum order across engines differs at ~1e-12 relative;
    ROUND absorbs it).  Rows with a null ``lang`` are dropped (no
    centroid is defined for them; mirror with ``WHERE lang IS NOT
    NULL`` when the input can contain nulls).

    Output (sorted by lang, dim): ``lang, dim, n, mean_r6``."""
    import ray

    from biobloom_ray.io import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    n_docs = _cheap_count(docs)
    if n_docs is not None and n_docs <= CENTROID_BROADCAST_MAX_ROWS:
        dmap = docs.to_pandas()
        ids = dmap.doc_id.to_numpy()
        order = np.argsort(ids)
        ref = ray.put((ids[order],
                       dmap.lang.to_numpy(dtype=object)[order]))

        def bpartials(b: pa.Table) -> pa.Table:
            import ray as _r
            sid, slang = _r.get(ref)
            col = b["embedding"].combine_chunks()
            nr = len(col)
            if nr == 0 or len(sid) == 0:
                return pa.table({
                    "lang": pa.array([], type=pa.string()),
                    "dim": pa.array([], type=pa.int64()),
                    "psum": pa.array([], type=pa.float64()),
                    "pcnt": pa.array([], type=pa.int64())})
            vals = col.flatten().to_numpy(zero_copy_only=False)
            d = vals.size // nr
            mat = np.ascontiguousarray(vals, dtype=np.float64) \
                .reshape(nr, d)
            vid = b["vec_id"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(sid, vid)
            idx = np.minimum(idx, len(sid) - 1)
            ok = sid[idx] == vid
            langs = slang[idx[ok]]
            codes, uniq = pd.factorize(pd.Index(langs, dtype=object))
            keep = codes >= 0  # null lang rows are dropped (documented)
            sums = np.zeros((len(uniq), d), dtype=np.float64)
            np.add.at(sums, codes[keep], mat[ok][keep])
            cnts = np.bincount(codes[keep], minlength=len(uniq)) \
                .astype(np.int64)
            return pa.table({
                "lang": pa.array(np.repeat(uniq.to_numpy(dtype=object),
                                           d).tolist(),
                                 type=pa.string()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(uniq))),
                "psum": pa.array(sums.ravel()),
                "pcnt": pa.array(np.repeat(cnts, d))})

        part = (emb.map_batches(bpartials, batch_format="pyarrow")
                .to_pandas())
        agg = (part.groupby(["lang", "dim"], as_index=False)
               .agg(psum=("psum", "sum"), pcnt=("pcnt", "sum")))
        agg["n"] = agg.pcnt.astype(np.int64)
        agg["mean_r6"] = np.round(
            agg.psum.to_numpy() / agg.pcnt.to_numpy(), 6)
        out = agg[["lang", "dim", "n", "mean_r6"]]
        return out.sort_values(["lang", "dim"]).reset_index(drop=True)

    def to_blob(b: pa.Table) -> pa.Table:
        # LargeBinary (variable-width, all rows d*4 bytes) keeps the
        # schema constant even for empty blocks, where the row dim is
        # unknowable and a fixed_size_binary(0) would poison the union
        col = b["embedding"].combine_chunks()
        n = len(col)
        vals = col.flatten().to_numpy(zero_copy_only=False)
        vals = np.ascontiguousarray(vals, dtype=np.float32)
        d = vals.size // max(n, 1)
        offs = pa.array((np.arange(n + 1, dtype=np.int64) * d * 4))
        arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs.buffers()[1]),
             pa.py_buffer(vals.tobytes())])
        return pa.table({"doc_id": b["vec_id"], "blob": arr})

    j = hash_join(emb.map_batches(to_blob, batch_format="pyarrow"),
                  docs, on=("doc_id",))

    def partials(b: pa.Table) -> pa.Table:
        blob = b["blob"].combine_chunks()
        n = len(blob)
        if n == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "dim": pa.array([], type=pa.int64()),
                             "psum": pa.array([], type=pa.float64()),
                             "pcnt": pa.array([], type=pa.int64())})
        offs = np.frombuffer(blob.buffers()[1], dtype=np.int64)[
            blob.offset:blob.offset + n + 1]
        d = int(offs[1] - offs[0]) // 4
        flat = np.frombuffer(blob.buffers()[2], dtype=np.uint8)
        mat = flat[offs[0]:offs[-1]].view(np.float32).reshape(n, d)
        codes, uniq = pd.factorize(b["lang"].to_pandas())
        ok = codes >= 0  # null lang rows are dropped (documented)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, codes[ok], mat[ok])
        cnts = np.bincount(codes[ok], minlength=len(uniq)) \
            .astype(np.int64)
        return pa.table({
            "lang": pa.array(np.repeat(uniq.to_numpy(dtype=object), d)
                             .tolist(), type=pa.string()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "psum": pa.array(sums.ravel()),
            "pcnt": pa.array(np.repeat(cnts, d))})

    agg = (j.map_batches(partials, batch_format="pyarrow")
           .groupby(["lang", "dim"])
           .aggregate(Sum("psum", alias_name="psum"),
                      Sum("pcnt", alias_name="pcnt"))
           .to_pandas())
    agg["n"] = agg.pcnt.astype(np.int64)
    agg["mean_r6"] = np.round(agg.psum.to_numpy() / agg.pcnt.to_numpy(), 6)
    out = agg[["lang", "dim", "n", "mean_r6"]]
    return out.sort_values(["lang", "dim"]).reset_index(drop=True)


#: fixed epoch seed for the oracle-checked query (any uint64 works)
EPOCH_SHUFFLE_SEED = 7
EPOCH_SHUFFLE_HEAD = 100


def epoch_shuffle_head(sf_dir: str, seed: int = EPOCH_SHUFFLE_SEED,
                       head: int = EPOCH_SHUFFLE_HEAD):
    """Deterministic epoch shuffle — the reproducible global permutation
    a training run draws its batches from: order docs by the bit-exact
    key ``splitmix64(doc_id XOR seed)`` (new seed => new permutation;
    same seed => identical order across runs/retries/engines).  The
    oracle replays the hash in 128-bit DuckDB arithmetic.

    At scale the full permutation is ``sort(key)`` + partitioned write
    (one range per output shard); the oracle-checked query returns the
    permutation's first ``head`` rows, which pins the global order
    without materializing it: per block a vectorized argpartition keeps
    the ``head`` smallest keys (map-only, no shuffle), the driver
    merges <= head x #blocks candidate rows.  Output: ``pos`` (1-based
    position), ``doc_id``."""
    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    sd = np.uint64(seed)

    def block_head(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64) ^ sd)
        k = min(head, len(h))
        if k == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.uint64())})
        part = np.argpartition(h, k - 1)[:k]
        return pa.table({"doc_id": pa.array(ids[part]),
                         "h": pa.array(h[part])})

    cand = ds.map_batches(block_head, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    cand = cand.sort_values(["h", "doc_id"]).head(head)
    out = pd.DataFrame({"pos": np.arange(1, len(cand) + 1,
                                         dtype=np.int64),
                        "doc_id": cand.doc_id.to_numpy()})
    return out


def epoch_shuffle_full(sf_dir: str, seed: int = EPOCH_SHUFFLE_SEED):
    """The FULL epoch permutation with GLOBAL 1-based positions (r3
    verdict #9: the head query pins only the first rows; this one pins
    every position).  Distributed plan — no driver sort of the corpus:
    ``sort(h, doc_id)`` (Ray's range-partitioned exchange) +
    the :func:`pack_documents` block-offset prefix pattern: pass 1
    reads ONE row per block (first key + row count; the sort's range
    partitioning makes first-keys order the blocks), the driver prefixes
    the #blocks-sized counts, pass 2 adds the broadcast base offset to
    each block's local ``arange``.  Oracle: the same bit-exact
    128-bit splitmix64 SQL replay as the head query, without the LIMIT.

    Output (sorted by pos): ``pos``, ``doc_id``."""
    import ray

    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    sd = np.uint64(seed)

    def key(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64) ^ sd)
        return pa.table({"doc_id": pa.array(ids), "h": pa.array(h)})

    sorted_ds = (ds.map_batches(key, batch_format="pyarrow")
                 .sort(["h", "doc_id"]).materialize())

    def block_meta(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"k_h": pa.array([], type=pa.uint64()),
                             "k_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"k_h": pa.array([b["h"][0].as_py()],
                                         type=pa.uint64()),
                         "k_id": pa.array([b["doc_id"][0].as_py()],
                                          type=pa.int64()),
                         "n": pa.array([len(b)], type=pa.int64())})

    blocks = (sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                                    batch_size=None).to_pandas())
    blocks = blocks.sort_values(["k_h", "k_id"])
    offs = blocks.n.cumsum().shift(fill_value=0).to_numpy()
    off_of = {(int(r.k_h), int(r.k_id)): int(o)
              for r, o in zip(blocks.itertuples(), offs)}
    off_ref = ray.put(off_of)

    def assign(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"pos": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        omap = ray.get(off_ref)
        base = omap[(int(b["h"][0].as_py()), int(b["doc_id"][0].as_py()))]
        return pa.table({
            "pos": pa.array(base + 1 + np.arange(len(b), dtype=np.int64)),
            "doc_id": b["doc_id"]})

    return (sorted_ds.map_batches(assign, batch_format="pyarrow",
                                  batch_size=None)
            .to_pandas().sort_values("pos").reset_index(drop=True))


def clean_corpus(sf_dir: str, bench_mod: int = DECON_BENCH_MOD):
    """The canonical web-cleaning pipeline COMPOSED end-to-end in one
    streaming plan — quality gate -> exact dedup -> benchmark
    decontamination (the C4/Gopher/GPT-3 preparation order), proving
    the operators chain: (1) map-only Gopher gate + benchmark-doc
    exclusion, (2) first-wins exact dedup via ONE native
    ``groupby(fp_md5)`` with ``Min`` over a zero-padded
    ``doc_id|lang`` composite (19 digits covers every nonnegative
    int64, so the composite's lex order IS doc_id order and one Min
    recovers the winner's lang with no join back; negative doc_ids
    are out of contract),
    (3) map-only contamination probe of the winners against the
    broadcast benchmark-trigram state (Bloom prefilter + exact set —
    the same subtract-filter shape as :func:`decontaminate`).  The
    only shuffle is the dedup groupby.

    Output (kept docs, sorted by doc_id): ``doc_id, lang, n_tokens``."""
    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.stages.dedup import add_content_hash
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               ngram_strings_at,
                                               token_ngram_hashes)
    from biobloom_ray.stages.webclean import gopher_flags_batch

    n = 3
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    # benchmark trigram state over the FULL corpus bench slice (the
    # eval suite is fixed before any cleaning decision)
    state_ref = _bench_trigram_state(ds, bench_mod, n, "clean_bench")

    def cand(b: pa.Table) -> pa.Table:
        flags = gopher_flags_batch(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        ok = (flags["pass_gopher"].to_numpy(zero_copy_only=False) == 1) \
            & (ids % bench_mod != 0)
        sub = b.filter(pa.array(ok))
        h = add_content_hash(sub)
        wk = (pd.Series(sub["doc_id"].to_numpy(zero_copy_only=False))
              .astype(str).str.zfill(19)
              + "|" + sub["lang"].to_pandas().reset_index(drop=True))
        return pa.table({"fp_md5": h["fp_md5"],
                         "wk": pa.array(wk.to_numpy(dtype=object),
                                        type=pa.string()),
                         "text": sub["text"]})

    winners = (ds.map_batches(cand, batch_format="pyarrow")
               .groupby("fp_md5")
               .aggregate(Min("wk", alias_name="wk"),
                          Min("text", alias_name="text")))

    def probe(b: pa.Table) -> pa.Table:
        import ray as _r
        words, m, hnum, exact = _r.get(state_ref)
        pf = BloomFilter(m=m, hash_num=hnum, kmer_size=n, words=words)
        wk = b["wk"].to_pandas()
        ids = wk.str.slice(0, 19).astype(np.int64).to_numpy()
        langs = wk.str.slice(20)
        flat, lens, row_of = _token_arrays(b)
        h1, h2, trow, tstart = token_ngram_hashes(flat, row_of, n)
        contam = np.zeros(len(ids), dtype=bool)
        if len(h1):
            hit = pf.contains(h1, h2)
            if hit.any():
                cs = ngram_strings_at(flat, tstart[hit], n)
                verified = cs.isin(exact).to_numpy()
                contam[trow[hit][verified]] = True
        keep = ~contam
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "lang": pa.array(langs.to_numpy(dtype=object)[keep]
                             .tolist(), type=pa.string()),
            "n_tokens": pa.array(lens[keep])})

    out = winners.map_batches(probe, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def curation_funnel(sf_dir: str, bench_mod: int = DECON_BENCH_MOD):
    """Stage-attrition funnel of the canonical cleaning pipeline — the
    YIELD table a curation team reads first on a new crawl: documents
    and whitespace tokens surviving after each stage of
    :func:`clean_corpus`'s composition, in pipeline order (raw ->
    Gopher quality gate + benchmark exclusion -> first-wins exact
    dedup -> benchmark trigram decontamination; the C4/Gopher/GPT-3
    preparation order).  This is the report that tells you whether a
    stage is eating your token budget before you commit a 100-TB run.

    Scale shape: two map-only corpus scans each emitting ONE tiny
    partial row per block (raw/gate doc+token counts; candidate
    ``(fp_md5, text)`` rows), one native ``groupby(fp_md5)`` — the
    only shuffle — and a map-only probe of the dedup winners against
    the broadcast benchmark-trigram state (Bloom prefilter + exact
    set via :func:`_bench_trigram_state`, BioBloom's subtract-filter
    shape, ``BioBloomClassifier.cpp:102-110``).  Driver folds are
    over block-count-scale partial rows only (no ``*_MAX_ROWS`` gate
    needed — there is no corpus-scale driver tier at any size); the
    output is exactly 4 rows regardless of corpus size.

    Output: ``stage_id, stage, n_docs, n_tokens`` sorted by stage_id.
    """
    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.stages.dedup import add_content_hash
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               ngram_strings_at,
                                               token_ngram_hashes)
    from biobloom_ray.stages.webclean import gopher_flags_batch

    n = 3
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    state_ref = _bench_trigram_state(ds, bench_mod, n, "funnel_bench")

    def gate_mask(b: pa.Table) -> np.ndarray:
        flags = gopher_flags_batch(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return ((flags["pass_gopher"].to_numpy(zero_copy_only=False)
                 == 1) & (ids % bench_mod != 0))

    def raw_gate_partial(b: pa.Table) -> pa.Table:
        _, lens, _ = _token_arrays(b)
        ok = gate_mask(b)
        return pa.table({
            "raw_docs": pa.array([b.num_rows], type=pa.int64()),
            "raw_toks": pa.array([int(lens.sum())], type=pa.int64()),
            "gate_docs": pa.array([int(ok.sum())], type=pa.int64()),
            "gate_toks": pa.array([int(lens[ok].sum())],
                                  type=pa.int64())})

    def cand(b: pa.Table) -> pa.Table:
        sub = b.filter(pa.array(gate_mask(b)))
        h = add_content_hash(sub)
        return pa.table({"fp_md5": h["fp_md5"], "text": sub["text"]})

    # first-wins dedup needs only the TEXT (identical within an md5
    # group, so Min recovers it; stage counts don't depend on WHICH
    # doc_id wins — tokens and trigrams are functions of the text)
    winners = (ds.map_batches(cand, batch_format="pyarrow")
               .groupby("fp_md5")
               .aggregate(Min("text", alias_name="text")))

    def probe(b: pa.Table) -> pa.Table:
        import ray as _r
        words, m, hnum, exact = _r.get(state_ref)
        pf = BloomFilter(m=m, hash_num=hnum, kmer_size=n, words=words)
        flat, lens, row_of = _token_arrays(b)
        h1, h2, trow, tstart = token_ngram_hashes(flat, row_of, n)
        contam = np.zeros(len(lens), dtype=bool)
        if len(h1):
            hit = pf.contains(h1, h2)
            if hit.any():
                cs = ngram_strings_at(flat, tstart[hit], n)
                verified = cs.isin(exact).to_numpy()
                contam[trow[hit][verified]] = True
        keep = ~contam
        return pa.table({
            "win_docs": pa.array([len(lens)], type=pa.int64()),
            "win_toks": pa.array([int(lens.sum())], type=pa.int64()),
            "kept_docs": pa.array([int(keep.sum())], type=pa.int64()),
            "kept_toks": pa.array([int(lens[keep].sum())],
                                  type=pa.int64())})

    p1 = _parts_pandas(
        ds.map_batches(raw_gate_partial, batch_format="pyarrow"),
        {c: np.int64 for c in
         ["raw_docs", "raw_toks", "gate_docs", "gate_toks"]}).sum()
    p2 = _parts_pandas(
        winners.map_batches(probe, batch_format="pyarrow"),
        {c: np.int64 for c in
         ["win_docs", "win_toks", "kept_docs", "kept_toks"]}).sum()
    return pd.DataFrame({
        "stage_id": np.arange(4, dtype=np.int64),
        "stage": ["raw", "quality_gate", "exact_dedup",
                  "decontaminated"],
        "n_docs": np.array([p1.raw_docs, p1.gate_docs,
                            p2.win_docs, p2.kept_docs], np.int64),
        "n_tokens": np.array([p1.raw_toks, p1.gate_toks,
                              p2.win_toks, p2.kept_toks], np.int64)})


def dup_group_size_histogram(sf_dir: str):
    """Duplicate-group size distribution — the dedup diagnostic read
    before picking a dedup strategy: for each exact-content group
    size, how many groups have that size and how many documents they
    account for.  A long tail of big groups means template/boilerplate
    pages; all-1s means exact dedup is a no-op and the budget belongs
    to near-dup.

    Scale shape: one map-only content-hash scan (32-hex md5 keys,
    never text) -> ONE native ``groupby(fp_md5).Count`` — group sizes
    are corpus-distinct-scale, so the counts-of-counts fold is tiered:
    driver fold below ``RANK_DRIVER_MAX_ROWS`` input rows, else a
    second native ``groupby(group_size)`` whose output is
    size-distribution-scale (tiny) at any corpus size.

    Output: ``group_size, n_groups, n_docs`` sorted by group_size.
    """
    ds = _read(sf_dir, "documents", columns=["text"])
    fps = ds.map_batches(
        lambda b: add_content_hash(b).select(["fp_md5"]),
        batch_format="pyarrow")
    grp = fps.groupby("fp_md5").aggregate(
        Count(alias_name="group_size"))
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        sizes = _parts_pandas(grp, {"fp_md5": object,
                                    "group_size": np.int64})
        out = (sizes.groupby("group_size", as_index=False).size()
               .rename(columns={"size": "n_groups"}))
    else:
        out = _parts_pandas(
            grp.groupby("group_size")
            .aggregate(Count(alias_name="n_groups")),
            {"group_size": np.int64, "n_groups": np.int64})
    out["group_size"] = out.group_size.astype(np.int64)
    out["n_groups"] = out.n_groups.astype(np.int64)
    out["n_docs"] = out.group_size * out.n_groups
    return (out.sort_values("group_size").reset_index(drop=True)
            [["group_size", "n_groups", "n_docs"]])


def contamination_topk(sf_dir: str, n: int = 3,
                       bench_mod: int = DECON_BENCH_MOD, k: int = 20):
    """Contamination ATTRIBUTION — the debugging table behind
    :func:`decontaminate`: the top-k benchmark trigrams by how many
    distinct training documents they leak into (tie-broken by trigram
    text), with total occurrence counts.  A curation team reads this
    to decide whether a 'contaminated' flag means real eval leakage
    or a ubiquitous phrase that should be allowlisted.

    Scale shape: one map-only probe scan over the corpus against the
    broadcast benchmark state (Bloom prefilter + exact verify via
    :func:`_bench_trigram_state`); each block emits per-trigram
    partial rows ``(tg, n_docs, n_occ)`` — a document never splits
    across blocks, so per-block distinct ``(tg, doc)`` counts sum to
    the global distinct-doc count.  Partials are overlap-scale
    (verified hits only).  Tiered combine: driver fold below
    ``RANK_DRIVER_MAX_ROWS`` input rows, else native ``groupby(tg)``
    + per-block local top-k + driver final top-k over #blocks x k
    rows (the standard top-k reduction).
    """
    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               ngram_strings_at,
                                               token_ngram_hashes)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    state_ref = _bench_trigram_state(ds, bench_mod, n, "contam_bench")

    def hits(b: pa.Table) -> pa.Table:
        import ray as _r
        words, m, hnum, exact = _r.get(state_ref)
        pf = BloomFilter(m=m, hash_num=hnum, kmer_size=n, words=words)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % bench_mod != 0)[0]
        empty = pa.table({"tg": pa.array([], type=pa.string()),
                          "n_docs": pa.array([], type=pa.int64()),
                          "n_occ": pa.array([], type=pa.int64())})
        if len(sel) == 0:
            return empty
        sub = b.take(sel)
        ids = ids[sel]
        flat, lens, row_of = _token_arrays(sub)
        h1, h2, trow, tstart = token_ngram_hashes(flat, row_of, n)
        if not len(h1):
            return empty
        cand = pf.contains(h1, h2)
        if not cand.any():
            return empty
        cs = ngram_strings_at(flat, tstart[cand], n)
        ver = cs.isin(exact).to_numpy()
        if not ver.any():
            return empty
        df = pd.DataFrame({"tg": cs.to_numpy(dtype=object)[ver],
                           "doc": ids[trow[cand][ver]]})
        occ = df.groupby("tg", as_index=False).size()
        docs = (df.drop_duplicates()
                .groupby("tg", as_index=False).size())
        agg = occ.merge(docs, on="tg", suffixes=("_occ", "_docs"))
        return pa.table({
            "tg": pa.array(agg.tg.to_numpy(dtype=object),
                           type=pa.string()),
            "n_docs": pa.array(agg.size_docs.to_numpy()
                               .astype(np.int64)),
            "n_occ": pa.array(agg.size_occ.to_numpy()
                              .astype(np.int64))})

    parts_ds = ds.map_batches(hits, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds, {"tg": object,
                                        "n_docs": np.int64,
                                        "n_occ": np.int64})
               .groupby("tg", as_index=False)[["n_docs", "n_occ"]]
               .sum())
    else:
        g = (parts_ds.groupby("tg")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("n_occ", alias_name="n_occ")))

        def local_topk(t: pa.Table) -> pa.Table:
            d = t.to_pandas()
            return pa.Table.from_pandas(
                d.sort_values(["n_docs", "tg"],
                              ascending=[False, True]).head(k),
                preserve_index=False)

        agg = (g.map_batches(local_topk, batch_format="pyarrow")
               .to_pandas())
    out = (agg.sort_values(["n_docs", "tg"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["n_docs"] = out.n_docs.astype(np.int64)
    out["n_occ"] = out.n_occ.astype(np.int64)
    return out[["tg", "n_docs", "n_occ"]]


def curation_funnel_by_source(sf_dir: str,
                              bench_mod: int = DECON_BENCH_MOD):
    """Per-source yield attribution for the cleaning pipeline — the
    companion table to :func:`curation_funnel` a curation team reads
    when deciding which crawl sources to keep buying: for EVERY
    source × stage, docs and whitespace tokens surviving (raw ->
    Gopher gate + benchmark exclusion -> first-wins exact dedup ->
    trigram decontamination).  Dedup winners are attributed to the
    minimum-doc_id member's source (the first-wins contract), carried
    through the groupby as a zero-padded ``doc_id|source`` composite
    whose lex order IS doc_id order — same trick as
    :func:`clean_corpus`'s winner-lang recovery, no join back.

    Scale shape: identical to :func:`curation_funnel` (two map-only
    scans with per-block PER-SOURCE partial rows, one groupby
    shuffle, broadcast probe); driver folds are over
    |sources| × block-count partial rows and the output is
    |sources| × 4 rows — both result-scale at any corpus size.
    Sources absent from a stage get explicit zero rows (the grid is
    pinned to the raw-stage source set).

    Output: ``source, stage_id, stage, n_docs, n_tokens`` sorted by
    (source, stage_id).
    """
    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.stages.dedup import add_content_hash
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               ngram_strings_at,
                                               token_ngram_hashes)
    from biobloom_ray.stages.webclean import gopher_flags_batch

    n = 3
    ds = _read(sf_dir, "documents", columns=["doc_id", "text",
                                             "source"])
    state_ref = _bench_trigram_state(ds, bench_mod, n,
                                     "funnel_src_bench")

    def gate_mask(b: pa.Table) -> np.ndarray:
        flags = gopher_flags_batch(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return ((flags["pass_gopher"].to_numpy(zero_copy_only=False)
                 == 1) & (ids % bench_mod != 0))

    def raw_gate_partial(b: pa.Table) -> pa.Table:
        _, lens, _ = _token_arrays(b)
        ok = gate_mask(b)
        df = pd.DataFrame({
            "source": b["source"].to_pandas().to_numpy(dtype=object),
            "raw_docs": np.ones(b.num_rows, np.int64),
            "raw_toks": lens,
            "gate_docs": ok.astype(np.int64),
            "gate_toks": np.where(ok, lens, 0)})
        agg = (df.groupby("source", as_index=False)
               [["raw_docs", "raw_toks", "gate_docs", "gate_toks"]]
               .sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    def cand(b: pa.Table) -> pa.Table:
        sub = b.filter(pa.array(gate_mask(b)))
        h = add_content_hash(sub)
        wk = (pd.Series(sub["doc_id"].to_numpy(zero_copy_only=False))
              .astype(str).str.zfill(19)
              + "|" + sub["source"].to_pandas().reset_index(drop=True))
        return pa.table({"fp_md5": h["fp_md5"],
                         "wk": pa.array(wk.to_numpy(dtype=object),
                                        type=pa.string()),
                         "text": sub["text"]})

    winners = (ds.map_batches(cand, batch_format="pyarrow")
               .groupby("fp_md5")
               .aggregate(Min("wk", alias_name="wk"),
                          Min("text", alias_name="text")))

    def probe(b: pa.Table) -> pa.Table:
        import ray as _r
        words, m, hnum, exact = _r.get(state_ref)
        pf = BloomFilter(m=m, hash_num=hnum, kmer_size=n, words=words)
        src = b["wk"].to_pandas().str.slice(20).to_numpy(dtype=object)
        flat, lens, row_of = _token_arrays(b)
        h1, h2, trow, tstart = token_ngram_hashes(flat, row_of, n)
        contam = np.zeros(len(lens), dtype=bool)
        if len(h1):
            hit = pf.contains(h1, h2)
            if hit.any():
                cs = ngram_strings_at(flat, tstart[hit], n)
                verified = cs.isin(exact).to_numpy()
                contam[trow[hit][verified]] = True
        keep = ~contam
        df = pd.DataFrame({
            "source": src,
            "win_docs": np.ones(len(lens), np.int64),
            "win_toks": lens,
            "kept_docs": keep.astype(np.int64),
            "kept_toks": np.where(keep, lens, 0)})
        agg = (df.groupby("source", as_index=False)
               [["win_docs", "win_toks", "kept_docs", "kept_toks"]]
               .sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    c1 = ["raw_docs", "raw_toks", "gate_docs", "gate_toks"]
    c2 = ["win_docs", "win_toks", "kept_docs", "kept_toks"]
    sch1 = {"source": object}; sch1.update({c: np.int64 for c in c1})
    sch2 = {"source": object}; sch2.update({c: np.int64 for c in c2})
    p1 = (_parts_pandas(ds.map_batches(raw_gate_partial,
                                       batch_format="pyarrow"), sch1)
          .groupby("source", as_index=False)[c1].sum())
    p2 = (_parts_pandas(winners.map_batches(probe,
                                            batch_format="pyarrow"),
                        sch2)
          .groupby("source", as_index=False)[c2].sum())
    m = p1.merge(p2, on="source", how="left").fillna(0)
    stages = [(0, "raw", "raw_docs", "raw_toks"),
              (1, "quality_gate", "gate_docs", "gate_toks"),
              (2, "exact_dedup", "win_docs", "win_toks"),
              (3, "decontaminated", "kept_docs", "kept_toks")]
    out = pd.concat([pd.DataFrame({
        "source": m.source,
        "stage_id": np.full(len(m), sid, np.int64),
        "stage": stage,
        "n_docs": m[dc].astype(np.int64).to_numpy(),
        "n_tokens": m[tc].astype(np.int64).to_numpy()})
        for sid, stage, dc, tc in stages])
    return (out.sort_values(["source", "stage_id"])
            .reset_index(drop=True))


def source_overlap(sf_dir: str):
    """Cross-source contamination matrix — for every pair of sources,
    the number of distinct token trigrams they share (the leakage
    diagnostic behind 'which domains are mirroring each other / the
    benchmark').  Trigram identity is the 64-bit combined-token hash
    (same contract as :func:`repeated_substrings`: collision odds
    ~N²/2⁶⁵; swap a 128-bit hash above ~10¹² distinct grams).

    Shape — ONE all-to-all total: per-batch-deduped ``(h, source)``
    rows go straight into a global sort on (h, source); the sort
    co-locates every surviving duplicate, so a vectorized
    adjacent-row dedup inside each block IS the global dedup (a
    duplicate split across a block boundary makes its hash the block
    edge and falls into the stitch path).  Per block a pandas
    self-merge then expands pairs for hashes wholly inside the block
    (#pairs per hash <= #sources² — bounded, because rows are
    per-source distinct), while rows of the <= #blocks-1
    block-spanning hashes go to the driver raw, are deduped and
    expanded there (output-scale tail).  No groupby, no join — the
    sort replaces both.  Output (sorted): ``src_a, src_b, n_shared``."""
    from biobloom_ray.stages.textstats import (_token_arrays,
                                               token_ngram_hashes)

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def hs_partial(b: pa.Table) -> pa.Table:
        flat, lens, row_of = _token_arrays(b)
        h1, _, trow, _ = token_ngram_hashes(flat, row_of, 3)
        if not len(h1):
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string())})
        src = b["source"].to_pandas()
        codes, uniq = pd.factorize(src)
        hc = h1.view(np.int64)
        sc = codes[trow]
        ok = sc >= 0  # null-source docs carry no attributable grams
        hc, sc = hc[ok], sc[ok]
        order = np.lexsort((sc, hc))
        hs, ss = hc[order], sc[order]
        new = np.ones(len(hs), dtype=bool)
        new[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        return pa.table({
            "h": pa.array(hs[new]),
            "source": pa.array(uniq.to_numpy(dtype=object)[ss[new]]
                               .tolist(), type=pa.string())})

    srt = (ds.map_batches(hs_partial, batch_format="pyarrow")
           .sort(["h", "source"]))

    def block_pairs(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False)
        n = len(h)
        empty = pa.table({
            "kind": pa.array([], type=pa.int8()),
            "h": pa.array([], type=pa.int64()),
            "src_a": pa.array([], type=pa.string()),
            "src_b": pa.array([], type=pa.string()),
            "n_shared": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        src = b["source"].to_pandas().to_numpy(dtype=object)
        # adjacent-row dedup = global dedup (sort co-located dups;
        # boundary-split dups fall into the raw stitch path)
        keep = np.ones(n, dtype=bool)
        keep[1:] = (h[1:] != h[:-1]) | (src[1:] != src[:-1])
        h, src = h[keep], src[keep]
        n = len(h)
        interior = (h != h[0]) & (h != h[-1])
        dfb = pd.DataFrame({"h": h[interior], "s": src[interior]})
        m = dfb.merge(dfb, on="h")
        m = m[m.s_x < m.s_y]
        pairs = (m.groupby(["s_x", "s_y"], as_index=False)
                 .agg(n_shared=("h", "size")))
        bnd = ~interior
        out = pd.DataFrame({
            "kind": np.concatenate([
                np.zeros(len(pairs), dtype=np.int8),
                np.ones(int(bnd.sum()), dtype=np.int8)]),
            "h": np.concatenate([np.zeros(len(pairs), dtype=np.int64),
                                 h[bnd]]),
            "src_a": np.concatenate([pairs.s_x.to_numpy(dtype=object),
                                     src[bnd]]),
            "src_b": np.concatenate([pairs.s_y.to_numpy(dtype=object),
                                     np.full(int(bnd.sum()), "",
                                             dtype=object)]),
            "n_shared": np.concatenate([
                pairs.n_shared.to_numpy(dtype=np.int64),
                np.zeros(int(bnd.sum()), dtype=np.int64)])})
        return pa.Table.from_pandas(out, preserve_index=False)

    part = (srt.map_batches(block_pairs, batch_format="pyarrow",
                            batch_size=None).to_pandas())
    got = part[part.kind == 0][["src_a", "src_b", "n_shared"]]
    bnd = part[part.kind == 1][["h", "src_a"]].drop_duplicates()
    if len(bnd):
        m = bnd.merge(bnd, on="h")
        m = m[m.src_a_x < m.src_a_y]
        extra = (m.groupby(["src_a_x", "src_a_y"], as_index=False)
                 .agg(n_shared=("h", "size"))
                 .rename(columns={"src_a_x": "src_a",
                                  "src_a_y": "src_b"}))
        got = pd.concat([got, extra], ignore_index=True)
    out = (got.groupby(["src_a", "src_b"], as_index=False)["n_shared"]
           .sum())
    out["n_shared"] = out.n_shared.astype(np.int64)
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


def quality_weighted_sample(sf_dir: str):
    """Quality-weighted importance sampler — keep each document with
    probability proportional to its Gopher mean-word-length signal
    (the DoReMi-flavoured 'sample good text more' mixing step): keep
    iff ``splitmix64(doc_id) < (sum_word_len << 64) // (10 *
    n_words)`` — i.e. keep-probability = mean word length / 10, an
    exact integer threshold per doc (docs at mean length >= 10
    saturate to always-keep; zero-token docs are dropped).
    Deterministic across runs/retries/engines — the oracle replays
    both the hash and the thresholds in 128-bit DuckDB arithmetic.
    Map-only: quality stats and the keep decision happen in one fused
    scan, no shuffle at any scale.

    Output (kept docs, sorted by doc_id): ``doc_id, n_words,
    sum_word_len``."""
    from biobloom_ray.hashing import splitmix64
    from biobloom_ray.stages.webclean import gopher_flags_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pick(b: pa.Table) -> pa.Table:
        flags = gopher_flags_batch(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        nw = flags["n_words"].to_numpy(zero_copy_only=False)
        swl = flags["sum_word_len"].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        nz = nw > 0
        thr = np.zeros(len(ids), dtype=np.uint64)
        if nz.any():
            # exact (swl << 64) // (10*nw), vectorized as two 32-bit
            # long-division steps (10*nw < 2^31, so each partial fits
            # int64); swl >= 10*nw saturates to 2^64-1 (mirrored in
            # the SQL)
            num, den = swl[nz], 10 * nw[nz]
            r0 = num % den
            t1 = (r0 << 32) // den
            t2 = (((r0 << 32) % den) << 32) // den
            t = (t1.astype(np.uint64) << np.uint64(32)) \
                + t2.astype(np.uint64)
            t[num >= den] = np.uint64((1 << 64) - 1)
            thr[nz] = t
        keep = nz & (h < thr)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_words": pa.array(nw[keep]),
                         "sum_word_len": pa.array(swl[keep])})

    out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def token_entropy(sf_dir: str):
    """Per-document Shannon entropy of the token distribution — the
    unigram-diversity quality signal (low entropy = repetitive /
    template pages; pairs with :func:`repetition_stats`'s exact-count
    view).  ``H = ln(n) - (1/n) * sum_t c_t ln c_t`` over the doc's
    token counts — every input an exact int64, emitted 6-dp-rounded
    under the repo's float contract (the per-doc sum has <= #distinct
    tokens terms; engine sums in token-code order, ULPs absorbed by
    ROUND).  Map-only: factorize + one segment reduce per batch, no
    shuffle at any scale.

    Output (docs with >= 1 token, sorted): ``doc_id, n_tokens,
    n_distinct, entropy_r6``."""
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ent(b: pa.Table) -> pa.Table:
        flat, lens, row_of = _token_arrays(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "n_distinct": pa.array([], type=pa.int64()),
                "entropy_r6": pa.array([], type=pa.float64())})
        codes, _ = pd.factorize(pd.Index(flat, dtype=object))
        key = row_of * (codes.max() + 1) + codes
        uk, cnt = np.unique(key, return_counts=True)
        urow = (uk // (codes.max() + 1)).astype(np.int64)
        nd = np.bincount(urow, minlength=len(ids))
        clogc = np.zeros(len(ids), dtype=np.float64)
        np.add.at(clogc, urow, cnt * np.log(cnt))
        nz = lens > 0
        n = lens[nz].astype(np.float64)
        h = np.log(n) - clogc[nz] / n
        return pa.table({
            "doc_id": pa.array(ids[nz]),
            "n_tokens": pa.array(lens[nz]),
            "n_distinct": pa.array(nd[nz].astype(np.int64)),
            "entropy_r6": pa.array(np.round(h, 6))})

    out = ds.map_batches(ent, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def corpus_report(sf_dir: str):
    """One-row corpus health report — the summary a 100 TB curation run
    prints at the end: doc/token/char totals, language and source
    cardinalities, exact duplicate count, and the benchmark-slice size
    (all exact integers, so the oracle hash is float-free).

    Single scan -> per-batch partial row (ONE row per batch: counts +
    per-batch md5 multiset partials are impossible driver-side, so the
    dup count reuses the exact_dedup shuffle on narrow (fp, 1) rows) —
    concretely: a map-only partial pass for the scan stats plus ONE
    native ``groupby(fp_md5).Count`` whose >1 groups are summed in a
    per-block partial before a driver fold.  lang/source cardinality
    is folded from per-batch distinct strings — report-scale by
    assumption (langs and named sources print in the report); swap the
    HLL sketch when the source column is an unbounded URL domain.
    Output: ``n_docs, n_tokens, n_chars, n_langs, n_sources,
    n_dup_docs, n_bench_docs``."""
    from biobloom_ray.stages.dedup import add_content_hash
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])

    def scan_partial(b: pa.Table) -> pa.Table:
        flat, lens, _ = _token_arrays(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_docs": pa.array([b.num_rows], type=pa.int64()),
            "n_tokens": pa.array([int(lens.sum())], type=pa.int64()),
            "n_chars": pa.array([int(pc.sum(b["n_chars"]).as_py() or 0)],
                                type=pa.int64()),
            "n_bench_docs": pa.array(
                [int((ids % DECON_BENCH_MOD == 0).sum())],
                type=pa.int64()),
            # list-typed distinct partials — no delimiter to collide
            # with data; nulls excluded like SQL COUNT(DISTINCT)
            "langs": pa.array(
                [[x for x in set(b["lang"].to_pylist())
                  if x is not None]],
                type=pa.large_list(pa.large_string())),
            "sources": pa.array(
                [[x for x in set(b["source"].to_pylist())
                  if x is not None]],
                type=pa.large_list(pa.large_string()))})

    p = ds.map_batches(scan_partial, batch_format="pyarrow").to_pandas()
    langs = set()
    sources = set()
    for ls in p.langs:
        langs.update(ls)
    for ss in p.sources:
        sources.update(ss)

    fps = ds.map_batches(
        lambda b: add_content_hash(b).select(["fp_md5"]),
        batch_format="pyarrow")
    grp = fps.groupby("fp_md5").aggregate(Count(alias_name="c"))

    def dup_partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        # docs that are NOT the kept first of their group
        return pa.table({"d": pa.array([int((c[c > 1] - 1).sum())],
                                       type=pa.int64())})

    dups = int(grp.map_batches(dup_partial, batch_format="pyarrow")
               .to_pandas().d.sum())
    return pd.DataFrame({
        "n_docs": [np.int64(p.n_docs.sum())],
        "n_tokens": [np.int64(p.n_tokens.sum())],
        "n_chars": [np.int64(p.n_chars.sum())],
        "n_langs": [np.int64(len(langs))],
        "n_sources": [np.int64(len(sources))],
        "n_dup_docs": [np.int64(dups)],
        "n_bench_docs": [np.int64(p.n_bench_docs.sum())]})


#: range-join window (seconds): purchases counted within (t, t+3600]
RANGE_JOIN_WINDOW_S = 3600


def events_range_join(sf_dir: str, left_type: str = "click",
                      right_type: str = "purchase",
                      window_s: int = RANGE_JOIN_WINDOW_S):
    """Range join (the second custom temporal join Ray Data lacks,
    alongside :func:`events_asof_join`): for every ``click`` event,
    count and sum the SAME user's ``purchase`` events inside the
    window ``(t, t + window_s]`` — the conversion-funnel primitive.

    Composition mirrors the as-of join: one scan splits the stream by
    side, ONE ``groupby(user_id)`` co-locates each entity's history,
    and the per-group kernel is two vectorized ``searchsorted`` cuts
    over the time-sorted purchase array plus a prefix-sum difference
    for the value sum (no row loops).  Partitioning assumption: an
    entity's history fits one group (salt by time-range for
    pathological single-entity streams).  Sum is emitted as exact
    integer cents to keep the oracle hash float-free.  Clicks with no
    in-window purchase are kept with zeros (left join).

    Output (sorted by event_id): ``event_id, n_in_window,
    sum_value_cents``."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])
    n_rows = _cheap_count(ds)
    win_ns = np.int64(window_s) * np.int64(1_000_000_000)

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array([left_type, right_type]))
        b = b.filter(keep)
        ts_ns = b["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
        # exact integer cents; half_towards_infinity matches SQL ROUND
        # (pc.round's default half_to_even diverges on exact .5 cents)
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_ns": ts_ns,
            "is_left": pc.equal(b["event_type"], left_type),
            "cents": cents,
        })

    def rjoin(g: pa.Table) -> pa.Table:
        left = g.filter(g["is_left"])
        if len(left) == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "n_in_window": pa.array([], type=pa.int64()),
                "sum_value_cents": pa.array([], type=pa.int64())})
        right = g.filter(pc.invert(g["is_left"]))
        l_ts = left["ts_ns"].to_numpy(zero_copy_only=False)
        l_id = left["event_id"].to_numpy(zero_copy_only=False)
        if len(right) == 0:
            z = np.zeros(len(l_id), dtype=np.int64)
            return pa.table({"event_id": pa.array(l_id),
                             "n_in_window": pa.array(z),
                             "sum_value_cents": pa.array(z)})
        r_ts = right["ts_ns"].to_numpy(zero_copy_only=False)
        r_c = right["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(r_ts, kind="stable")
        r_ts, r_c = r_ts[order], r_c[order]
        csum = np.zeros(len(r_c) + 1, dtype=np.int64)
        np.cumsum(r_c, out=csum[1:])
        lo = np.searchsorted(r_ts, l_ts, side="right")
        hi = np.searchsorted(r_ts, l_ts + win_ns, side="right")
        return pa.table({
            "event_id": pa.array(l_id),
            "n_in_window": pa.array((hi - lo).astype(np.int64)),
            "sum_value_cents": pa.array(csum[hi] - csum[lo])})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if n_rows is None or n_rows > EVENTS_ENTITY_DIRECT_MAX_ROWS:
        # salt-by-time-range plan (VERDICT r3 #5): bucket span = the
        # window itself, so a left in bucket b sees every in-window
        # right inside buckets {b, b+1}.  Lefts keep their own bucket
        # (each left lands in exactly ONE group); every right is
        # replicated into its bucket and the one BELOW it (the halo) —
        # so the group for bucket b holds rights from (b·S, (b+2)·S),
        # a superset of every member left's window, and the
        # searchsorted cuts inside ``rjoin`` trim it exactly.  No
        # carry pass is needed (the window is bounded, unlike as-of);
        # 2× replication of the right side is the whole overhead.
        def salt(b: pa.Table) -> pa.Table:
            bkt = b["ts_ns"].to_numpy(zero_copy_only=False) // win_ns
            lefts = (b.filter(b["is_left"])
                     .append_column("bucket", pa.array(
                         bkt[b["is_left"].to_numpy(zero_copy_only=False)])))
            right_mask = pc.invert(b["is_left"]).to_numpy(
                zero_copy_only=False)
            rights = b.filter(pa.array(right_mask))
            r_bkt = bkt[right_mask]
            halo = pa.concat_tables([
                rights.append_column("bucket", pa.array(r_bkt)),
                rights.append_column("bucket", pa.array(r_bkt - 1))])
            return pa.concat_tables([lefts, halo])

        grouped = (tagged.map_batches(salt, batch_format="pyarrow")
                   .groupby(["user_id", "bucket"])
                   .map_groups(rjoin, batch_format="pyarrow"))
    else:
        grouped = (tagged.groupby("user_id")
                   .map_groups(rjoin, batch_format="pyarrow"))
    out = grouped.to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# -- round-4 additions: semi-structured props, per-group top-k bigrams,
# -- window ranks, and non-parquet source/sink round-trips ------------------

def events_props_stats(sf_dir: str):
    """Semi-structured column extraction + rollup: parse the JSON
    ``props`` payload (``{"k": N}``) with ONE vectorized RE2 pass
    (``pc.extract_regex`` — no Python-level json.loads per row) and
    aggregate per event_type.  Same tiering as the other event rollups:
    per-block partials always pre-reduce inside map_batches; below
    ``EVENTS_DRIVER_MAX_ROWS`` the output-scale partials combine on the
    driver, above it a native Sum/Min/Max groupby finishes."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "k": k.to_numpy(zero_copy_only=False)})
        agg = (df.groupby("event_type", as_index=False)
               .agg(n=("k", "size"), sum_k=("k", "sum"),
                    min_k=("k", "min"), max_k=("k", "max")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas()
        out = (p.groupby("event_type", as_index=False)
               .agg(n=("n", "sum"), sum_k=("sum_k", "sum"),
                    min_k=("min_k", "min"), max_k=("max_k", "max")))
    else:
        out = (parts_ds.groupby("event_type")
               .aggregate(Sum("n", alias_name="n"),
                          Sum("sum_k", alias_name="sum_k"),
                          Min("min_k", alias_name="min_k"),
                          Max("max_k", alias_name="max_k"))
               .to_pandas())
    return out.sort_values("event_type").reset_index(drop=True)


#: driver-combine gate for the bigram count table (output-scale:
#: #langs × distinct bigrams rows); above it the native groupby runs
BIGRAM_DRIVER_MAX_ROWS = 2_000_000


def top_bigrams_per_lang(sf_dir: str, k: int = 5):
    """Per-group heavy hitters: the k most frequent word bigrams of
    every language (exact counts, ties broken lexicographically).  Block
    partials factorize (lang, bigram) pairs with ONE pandas C groupby —
    at most the block's distinct-pair count leaves any block — then the
    count table reduces (driver below the gate, native Sum groupby
    above) and a per-block local-top-k → tiny per-lang reduce picks the
    winners, the same two-level shape as ``top_docs_per_lang``."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        from biobloom_ray.stages.textstats import _token_arrays

        flat, _lens, row_of = _token_arrays(b)
        if len(flat) < 2:
            return pa.table({"lang": pa.array([], pa.string()),
                             "bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        langs = b["lang"].to_pandas().to_numpy(dtype=object)
        same = row_of[1:] == row_of[:-1]  # adjacent pairs within one doc
        bg = (pd.Series(flat[:-1][same], dtype=object)
              .str.cat(pd.Series(flat[1:][same], dtype=object), sep=" "))
        df = pd.DataFrame({
            "lang": langs[row_of[:-1][same]],
            "bigram": bg.to_numpy(dtype=object)})
        agg = df.groupby(["lang", "bigram"], as_index=False).size()
        agg = agg.rename(columns={"size": "cnt"})
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= BIGRAM_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas()
        counts = (p.groupby(["lang", "bigram"], as_index=False)["cnt"]
                  .sum())
        counts = counts.sort_values(["lang", "cnt", "bigram"],
                                    ascending=[True, False, True])
        out = counts.groupby("lang").head(k)
        return (out.reset_index(drop=True)[["lang", "bigram", "cnt"]])

    counts_ds = (parts_ds.groupby(["lang", "bigram"])
                 .aggregate(Sum("cnt", alias_name="cnt")))

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["lang", "cnt", "bigram"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("lang").head(k),
                                    preserve_index=False)

    def final_topk(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(
            ["cnt", "bigram"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (counts_ds.map_batches(local_topk, batch_format="pyarrow")
           .groupby("lang").map_groups(final_topk, batch_format="pyarrow")
           .to_pandas())
    return (out.sort_values(["lang", "cnt", "bigram"],
                            ascending=[True, False, True])
            .reset_index(drop=True)[["lang", "bigram", "cnt"]])


#: input-row gate for the rank count-table reduce: the per-block
#: partials are output-scale ((source, n_chars) rows), so below this
#: many input rows they combine on the driver instead of a native
#: groupby shuffle; above it the unchanged native Sum groupby runs
RANK_DRIVER_MAX_ROWS = 5_000_000

#: rank-table broadcast gate: the (source, n_chars, rnk) table grows
#: with value cardinality, not corpus rows; above this many table rows
#: the map-side broadcast merge switches to a Dataset hash join
RANK_BROADCAST_MAX_ROWS = 2_000_000


def nchars_rank_in_source(sf_dir: str):
    """Window-function shape without a global sort: RANK() of each
    document's length within its source.  The per-(source, n_chars)
    count table is output-scale (≤ #sources × distinct lengths), so it
    reduces small, turns into cumulative ranks on the driver, and
    broadcasts back for a map-only join — no all-to-all over the
    documents themselves at any corpus size (the count table grows with
    VALUE cardinality, not row count)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = df.groupby(["source", "n_chars"], as_index=False).size()
        agg = agg.rename(columns={"size": "cnt"})
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["source", "n_chars"], as_index=False)["cnt"]
                  .sum())
    else:
        counts = (parts_ds.groupby(["source", "n_chars"])
                  .aggregate(Sum("cnt", alias_name="cnt"))
                  .to_pandas())
    counts = counts.sort_values(["source", "n_chars"]).reset_index(drop=True)
    # RANK() = 1 + #strictly-smaller within the source (exclusive cumsum)
    csum = counts.groupby("source")["cnt"].cumsum() - counts["cnt"]
    counts["rnk"] = (csum + 1).astype(np.int64)
    n_src = (counts.groupby("source", as_index=False)["cnt"].sum()
             .rename(columns={"cnt": "n_in_source"}))
    n_src["n_in_source"] = n_src["n_in_source"].astype(np.int64)
    import ray

    if len(counts) > RANK_BROADCAST_MAX_ROWS:
        # value cardinality too high to broadcast: hash-join the rank
        # table back instead (counts already carries rnk; n_in_source
        # joins on source alone — both sides stay Dataset-resident)
        from biobloom_ray.io import hash_join

        rank_ds = ray.data.from_pandas(
            counts[["source", "n_chars", "rnk"]].merge(n_src, on="source"))
        out = hash_join(ds, rank_ds,
                        on=("source", "n_chars")).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "source", "n_chars", "rnk", "n_in_source"]]

    lookup_ref = ray.put((counts[["source", "n_chars", "rnk"]], n_src))

    def attach(b: pa.Table) -> pa.Table:
        cdf, ndf = ray.get(lookup_ref)
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        df = (df.merge(cdf, on=["source", "n_chars"], how="left")
              .merge(ndf, on="source", how="left"))
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def jsonl_roundtrip_lang_counts(sf_dir: str):
    """Non-parquet source/sink (§2.1 format coverage, the reference's
    fasta/fastq-alongside-gz analogue): documents → JSONL shards under
    /tmp via ``Dataset.write_json`` → ``ray.data.read_json`` → the
    lang_counts rollup.  The oracle is plain lang_counts SQL over the
    original table, so the round-trip must be lossless."""
    import os
    import shutil
    import tempfile

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    tmp = tempfile.mkdtemp(prefix="bbr_jsonl_", dir="/tmp")
    try:
        ds.write_json(tmp)
        back = ray.data.read_json(tmp)
        out = (back.groupby("lang").aggregate(Count(alias_name="n"))
               .to_pandas())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.sort_values("lang").reset_index(drop=True)


def csv_roundtrip_event_counts(sf_dir: str):
    """CSV source/sink round-trip: events (event_id, event_type) →
    CSV shards → ``ray.data.read_csv`` → per-type counts; oracled by
    the plain SQL rollup over the original parquet view."""
    import shutil
    import tempfile

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])
    tmp = tempfile.mkdtemp(prefix="bbr_csv_", dir="/tmp")
    try:
        ds.write_csv(tmp)
        back = ray.data.read_csv(tmp)
        out = (back.groupby("event_type")
               .aggregate(Count(alias_name="n")).to_pandas())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.sort_values("event_type").reset_index(drop=True)


def windowed_distinct_users(sf_dir: str):
    """Windowed DISTINCT: exact unique users per (event_type, hour).
    Per-block pre-dedup of (type, hour, user) triples bounds what any
    block emits by its own distinct count; below the row gate the
    triples dedup+count on the driver, above it two chained native
    groupbys on the SAME key prefix finish (the first dedups the
    triples cluster-wide, the second counts survivors per window) —
    the exact twin of the HLL sketch path (`hll_distinct_per_lang`),
    kept for windows where exactness is worth the wider shuffle."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        hour = (pc.floor_temporal(b["ts"], unit="hour")
                .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "hour_epoch": hour.to_numpy(zero_copy_only=False),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas().drop_duplicates()
        out = (p.groupby(["event_type", "hour_epoch"], as_index=False)
               .agg(n_users=("user_id", "size")))
        out["n_users"] = out["n_users"].astype(np.int64)
    else:
        dedup = (parts_ds
                 .groupby(["event_type", "hour_epoch", "user_id"])
                 .aggregate(Count(alias_name="_c"))
                 .drop_columns(["_c"]))
        out = (dedup.groupby(["event_type", "hour_epoch"])
               .aggregate(Count(alias_name="n_users")).to_pandas())
    return (out.sort_values(["event_type", "hour_epoch"])
            .reset_index(drop=True)[["event_type", "hour_epoch",
                                     "n_users"]])


#: segment-customer broadcast gate: below this many CUSTOMER rows the
#: in-segment custkey set (and then the matching orderkey set) rides
#: ray.put broadcasts; above it both links become Dataset hash joins
SEGMENT_BROADCAST_MAX_ROWS = 1_000_000


def segment_revenue_topk(sf_dir: str, segment: str = "BUILDING",
                         k: int = 10):
    """TPC-H Q3 shape — a THREE-way join: customers of one market
    segment ⋈ their orders ⋈ lineitem revenue, top-k orders by exact
    integer revenue (10⁻⁴-dollar units, same fixed-point contract as
    ``top_parts_by_revenue``).  Below the gate the two link tables
    (in-segment custkeys, then matching orderkeys) broadcast via
    ``ray.put`` and revenue partials combine on the driver; above it
    the same DAG runs as two ``io.hash_join``s + a native Sum groupby
    + per-block exact top-k (nothing driver-bound grows with the
    corpus; the revenue rollup shuffles (orderkey, cents) partials
    only)."""
    import ray

    from biobloom_ray.io import hash_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def seg_keys(b: pa.Table) -> pa.Table:
        return (b.filter(pc.equal(b["c_mktsegment"], segment))
                .select(["c_custkey"]))

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "revenue": cents * (100 - disc)})
        agg = df.groupby("l_orderkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    n_cust = _cheap_count(cust)
    if n_cust is not None and n_cust <= SEGMENT_BROADCAST_MAX_ROWS:
        ck = np.sort(cust.map_batches(seg_keys, batch_format="pyarrow")
                     .to_pandas()["c_custkey"].to_numpy())
        ck_ref = ray.put(ck)

        def order_keys(b: pa.Table) -> pa.Table:
            keys = ray.get(ck_ref)
            oc = b["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, oc)
            pos[pos >= len(keys)] = 0
            hit = len(keys) > 0
            mask = (keys[pos] == oc) if hit else np.zeros(len(oc), bool)
            return b.filter(pa.array(mask)).select(["o_orderkey"])

        ok = np.sort(orders.map_batches(order_keys,
                                        batch_format="pyarrow")
                     .to_pandas()["o_orderkey"].to_numpy())
        ok_ref = ray.put(ok)

        def rev_in_seg(b: pa.Table) -> pa.Table:
            keys = ray.get(ok_ref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, lk)
            pos[pos >= len(keys)] = 0
            hit = len(keys) > 0
            mask = (keys[pos] == lk) if hit else np.zeros(len(lk), bool)
            return rev_partial(b.filter(pa.array(mask)))

        p = li.map_batches(rev_in_seg, batch_format="pyarrow").to_pandas()
        agg = p.groupby("l_orderkey", as_index=False)["revenue"].sum()
        agg = agg.rename(columns={"l_orderkey": "o_orderkey"})
        out = agg.sort_values(["revenue", "o_orderkey"],
                              ascending=[False, True]).head(k)
        return out.reset_index(drop=True)[["o_orderkey", "revenue"]]

    seg_ds = cust.map_batches(seg_keys, batch_format="pyarrow")
    seg_orders = hash_join(orders, seg_ds, on=("o_custkey",),
                           right_on=("c_custkey",)).select_columns(
                               ["o_orderkey"])
    # runtime Bloom join filter (the Spark/Presto "runtime filter"
    # move): prune ~4/5 of lineitem BEFORE its rollup shuffle with a
    # broadcast Bloom over the in-segment orderkeys; FPs drop in the
    # real hash join below, so the result is exactly unchanged
    # (tier-parity + forced-FP pytest pin this)
    from biobloom_ray.stages.joinfilter import (bloom_semi_filter,
                                                build_key_bloom)

    n_ord = _cheap_count(orders)
    okey_bloom = build_key_bloom(seg_orders, "o_orderkey",
                                 expected=max((n_ord or 1000) // 4, 1))
    li = bloom_semi_filter(li, "l_orderkey", okey_bloom)
    rev = (li.map_batches(rev_partial, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("revenue", alias_name="revenue")))
    joined = hash_join(rev, seg_orders, on=("l_orderkey",),
                       right_on=("o_orderkey",))

    def local_topk(b: pa.Table) -> pa.Table:
        rev_np = b["revenue"].to_numpy(zero_copy_only=False)
        keys = b["l_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((keys, -rev_np))[:k]
        return pa.table({"o_orderkey": pa.array(keys[idx]),
                         "revenue": pa.array(rev_np[idx])})

    cand = (joined.map_batches(local_topk, batch_format="pyarrow")
            .to_pandas())
    out = cand.sort_values(["revenue", "o_orderkey"],
                           ascending=[False, True]).head(k)
    return out.reset_index(drop=True)[["o_orderkey", "revenue"]]


#: document-row gate for the NB vocabulary broadcast (same contract as
#: RARITY_BROADCAST_MAX_ROWS: the class-count vocab table broadcasts
#: below it; above, the exploded tokens hash-join the vocab Dataset)
NB_BROADCAST_MAX_ROWS = 100_000


def nb_class_scores(sf_dir: str):
    """Supervised corpus-trained scorer — a multinomial Naive Bayes
    log-odds per document, the fastText-style quality-classifier shape
    (train a linear bag-of-words model on a labeled split, score every
    page) with a corpus-internal label: class A = documents whose
    source number is even, B = odd.  Training is ONE tokenize pass
    (per-block (token, ca, cb) partials, factorize-based); scoring is
    map-only against the broadcast vocabulary.  Output per doc:
    ``n_tokens, sum_ca, sum_cb`` (exact integers — they pin the
    token⋈vocab join float-free) and ``score_r6`` = Laplace-smoothed
    log-odds Σ ln((ca+1)/(ta+V)) − ln((cb+1)/(tb+V)) rounded to 6 dp
    (absorbs libm/summation-order ulps, same contract as
    ``bigram_lm_scores``).  Docs with zero tokens drop (no score).

    Tiered: below ``NB_BROADCAST_MAX_ROWS`` docs the vocab broadcasts
    once via ``ray.put`` (searchsorted per batch); above it the
    exploded (doc_id, token) rows hash-join the vocab Dataset and
    per-doc native Count/Sum aggregates finish — the float column sums
    per doc in whatever order the join emits, which the 6-dp rounding
    absorbs (tier-parity asserted at 1e-6)."""
    import ray

    from biobloom_ray.io import hash_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def _class_a(source: pd.Series) -> np.ndarray:
        nums = source.str.extract(r"(\d+)", expand=False).astype(np.int64)
        return (nums % 2 == 0).to_numpy()

    def vocab_partial(b: pa.Table) -> pa.Table:
        from biobloom_ray.stages.textstats import _token_arrays

        flat, lens, row_of = _token_arrays(b)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "ca": pa.array([], pa.int64()),
                             "cb": pa.array([], pa.int64())})
        is_a = _class_a(b["source"].to_pandas())[row_of]
        codes, uniq = pd.factorize(pd.Index(flat, dtype=object))
        ca = np.zeros(len(uniq), dtype=np.int64)
        cb = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(ca, codes[is_a], 1)
        np.add.at(cb, codes[~is_a], 1)
        return pa.table({"token": pa.array(uniq.to_numpy(dtype=object)
                                           .tolist(), type=pa.string()),
                         "ca": pa.array(ca), "cb": pa.array(cb)})

    vocab_parts = ds.map_batches(vocab_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= NB_BROADCAST_MAX_ROWS:
        vp = (vocab_parts.to_pandas().groupby("token", as_index=False)
              [["ca", "cb"]].sum())
        ta, tb, v = (int(vp.ca.sum()), int(vp.cb.sum()), len(vp))
        tok_sorted = vp.token.to_numpy(dtype=object)
        order = np.argsort(tok_sorted, kind="stable")
        model_ref = ray.put((tok_sorted[order],
                             vp.ca.to_numpy()[order],
                             vp.cb.to_numpy()[order], ta, tb, v))

        def score(b: pa.Table) -> pa.Table:
            import ray as _r

            from biobloom_ray.stages.textstats import _token_arrays

            toks_s, ca_s, cb_s, ta_, tb_, v_ = _r.get(model_ref)
            flat, lens, row_of = _token_arrays(b)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(toks_s, flat)
            ca = ca_s[idx]
            cb = cb_s[idx]
            lp = (np.log((ca + 1.0) / (ta_ + v_))
                  - np.log((cb + 1.0) / (tb_ + v_)))
            n = len(ids)
            sc = np.zeros(n)
            sa = np.zeros(n, dtype=np.int64)
            sb = np.zeros(n, dtype=np.int64)
            np.add.at(sc, row_of, lp)
            np.add.at(sa, row_of, ca)
            np.add.at(sb, row_of, cb)
            keep = lens > 0
            return pa.table({
                "doc_id": pa.array(ids[keep]),
                "n_tokens": pa.array(lens[keep]),
                "sum_ca": pa.array(sa[keep]),
                "sum_cb": pa.array(sb[keep]),
                "score_r6": pa.array(np.round(sc[keep], 6))})

        out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    vocab = (vocab_parts.groupby("token")
             .aggregate(Sum("ca", alias_name="ca"),
                        Sum("cb", alias_name="cb")))
    tot = (vocab.map_batches(
        lambda b: pa.table({
            "ta": pa.array([int(pc.sum(b["ca"]).as_py() or 0)]),
            "tb": pa.array([int(pc.sum(b["cb"]).as_py() or 0)]),
            "v": pa.array([b.num_rows])}), batch_format="pyarrow")
        .to_pandas().sum())
    ta, tb, v = int(tot.ta), int(tot.tb), int(tot.v)

    def explode(b: pa.Table) -> pa.Table:
        from biobloom_ray.stages.textstats import _token_arrays

        flat, lens, row_of = _token_arrays(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[row_of]),
            "token": pa.array(flat.tolist(), type=pa.string())})

    toks = ds.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(toks, vocab, on=("token",))

    def lp_col(b: pa.Table) -> pa.Table:
        ca = b["ca"].to_numpy(zero_copy_only=False)
        cb = b["cb"].to_numpy(zero_copy_only=False)
        lp = (np.log((ca + 1.0) / (ta + v))
              - np.log((cb + 1.0) / (tb + v)))
        return b.append_column("lp", pa.array(lp))

    out = (joined.map_batches(lp_col, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Count(alias_name="n_tokens"),
                      Sum("ca", alias_name="sum_ca"),
                      Sum("cb", alias_name="sum_cb"),
                      Sum("lp", alias_name="score"))
           .to_pandas())
    out["score_r6"] = np.round(out["score"].to_numpy(), 6)
    return (out[["doc_id", "n_tokens", "sum_ca", "sum_cb", "score_r6"]]
            .sort_values("doc_id").reset_index(drop=True))


def user_event_pivot(sf_dir: str):
    """Pivot / one-hot rollup — the feature-engineering crosstab: one
    row per user with a count column per event type (the fixture's
    closed set: click/error/purchase/signup/view).  Per-block pandas
    crosstab partials (C groupby, no Python loop) pre-reduce to at most
    #users-in-block rows; the tiered combine mirrors the other event
    rollups (driver fold below ``EVENTS_DRIVER_MAX_ROWS``, native Sum
    groupby above).  Unseen types stay all-zero columns so the schema
    is static at any scale."""
    types = ["click", "error", "purchase", "signup", "view"]
    cols = [f"n_{t}" for t in types]
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "event_type": b["event_type"].to_pandas()})
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=types, fill_value=0).astype(np.int64)
        ct.columns = cols
        ct = ct.reset_index()
        return pa.Table.from_pandas(ct, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        out = (parts_ds.to_pandas().groupby("user_id", as_index=False)
               [cols].sum())
    else:
        out = (parts_ds.groupby("user_id")
               .aggregate(*[Sum(c, alias_name=c) for c in cols])
               .to_pandas())
    return (out.sort_values("user_id").reset_index(drop=True)
            [["user_id"] + cols])


def token_drift_topk(sf_dir: str, k: int = 20):
    """Distribution-drift monitor between two corpus slices (here: even
    vs odd doc_id, standing in for yesterday's crawl vs today's): the k
    tokens with the largest absolute count difference — all exact
    integers, ties broken lexicographically.  ONE tokenize pass emits
    per-block (token, c_even, c_odd) partials; the count table reduces
    through the shared ``RARITY_BROADCAST_MAX_ROWS`` tier contract
    (driver fold below, native Sum groupby above) and top-k is a
    driver sort of the output-scale table below the gate / per-block
    local top-k + final reduce above it."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        from biobloom_ray.stages.textstats import _token_arrays

        flat, lens, row_of = _token_arrays(b)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "c_even": pa.array([], pa.int64()),
                             "c_odd": pa.array([], pa.int64())})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        is_even = (ids % 2 == 0)[row_of]
        codes, uniq = pd.factorize(pd.Index(flat, dtype=object))
        ce = np.zeros(len(uniq), dtype=np.int64)
        co = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(ce, codes[is_even], 1)
        np.add.at(co, codes[~is_even], 1)
        return pa.table({"token": pa.array(uniq.to_numpy(dtype=object)
                                           .tolist(), type=pa.string()),
                         "c_even": pa.array(ce), "c_odd": pa.array(co)})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RARITY_BROADCAST_MAX_ROWS:
        p = (parts_ds.to_pandas().groupby("token", as_index=False)
             [["c_even", "c_odd"]].sum())
        p["drift"] = np.abs(p.c_even - p.c_odd).astype(np.int64)
        out = p.sort_values(["drift", "token"],
                            ascending=[False, True]).head(k)
        return (out.reset_index(drop=True)
                [["token", "c_even", "c_odd", "drift"]])

    counts_ds = (parts_ds.groupby("token")
                 .aggregate(Sum("c_even", alias_name="c_even"),
                            Sum("c_odd", alias_name="c_odd")))

    def local_topk(b: pa.Table) -> pa.Table:
        ce = b["c_even"].to_numpy(zero_copy_only=False)
        co = b["c_odd"].to_numpy(zero_copy_only=False)
        drift = np.abs(ce - co)
        toks = b["token"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((toks, -drift))[:k]
        return pa.table({"token": pa.array(toks[idx].tolist(),
                                           type=pa.string()),
                         "c_even": pa.array(ce[idx]),
                         "c_odd": pa.array(co[idx]),
                         "drift": pa.array(drift[idx])})

    cand = (counts_ds.map_batches(local_topk, batch_format="pyarrow")
            .to_pandas())
    out = cand.sort_values(["drift", "token"],
                           ascending=[False, True]).head(k)
    return (out.reset_index(drop=True)
            [["token", "c_even", "c_odd", "drift"]])


def latest_event_per_user_type(sf_dir: str):
    """Latest-wins compaction (the CDC/upsert shape): for every
    (user_id, event_type) keep the newest event, ties broken by
    event_id desc.  Per-block argmax partials bound block output by
    the block's own distinct key count — at most #blocks candidate
    rows per key ever shuffle; the combine is tiered on the shared
    event gate (driver fold below, native groupby + per-group argmax
    above)."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "event_type": b["event_type"].to_pandas(),
            "event_id": b["event_id"].to_numpy(zero_copy_only=False),
            "ts_us": ts_us})
        df = df.sort_values(["user_id", "event_type", "ts_us",
                             "event_id"])
        keep = df.groupby(["user_id", "event_type"], as_index=False)
        return pa.Table.from_pandas(keep.tail(1), preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas()
        p = p.sort_values(["user_id", "event_type", "ts_us", "event_id"])
        out = p.groupby(["user_id", "event_type"], as_index=False).tail(1)
    else:
        def pick_latest(g: pa.Table) -> pa.Table:
            ts = g["ts_us"].to_numpy(zero_copy_only=False)
            eid = g["event_id"].to_numpy(zero_copy_only=False)
            i = int(np.lexsort((eid, ts))[-1])
            return g.slice(i, 1)

        out = (parts_ds.groupby(["user_id", "event_type"])
               .map_groups(pick_latest, batch_format="pyarrow")
               .to_pandas())
    return (out.sort_values(["user_id", "event_type"])
            .reset_index(drop=True)
            [["user_id", "event_type", "event_id", "ts_us"]])


def events_hourly_anomaly(sf_dir: str):
    """Anomaly flags over the hourly rollup: per event_type, the
    z-score of each hour's event count against that type's own
    hourly mean/stddev (sample).  The corpus-scale work is the SAME
    tiered hourly rollup as ``events_hourly``; the z-pass runs on the
    output-scale (type, hour) table on the driver — #hours × #types
    rows regardless of corpus size.  Exact-integer ``n`` pins the
    rollup; the float z is 6-dp rounded (same absorption contract as
    the other float oracles)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        hour = (pc.floor_temporal(b["ts"], unit="hour")
                .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "hour_epoch": hour.to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["event_type", "hour_epoch"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas()
        counts = (p.groupby(["event_type", "hour_epoch"], as_index=False)
                  ["n"].sum())
    else:
        counts = (parts_ds.groupby(["event_type", "hour_epoch"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    g = counts.groupby("event_type")["n"]
    mu = g.transform("mean")
    sd = g.transform("std")  # sample stddev, ddof=1 == SQL STDDEV_SAMP
    counts["z_r6"] = np.round((counts["n"] - mu) / sd, 6)
    return (counts.sort_values(["event_type", "hour_epoch"])
            .reset_index(drop=True)
            [["event_type", "hour_epoch", "n", "z_r6"]])


def docs_rollup_cube(sf_dir: str):
    """GROUPING-SETS rollup: doc counts and char sums at THREE grains —
    (lang, source), (lang), and grand total — in one result, the
    warehouse CUBE/ROLLUP shape.  The corpus touches ONE tiered
    (lang, source) rollup (driver fold below the shared gate, native
    Sum groupby above); both coarser grains derive from that
    output-scale table on the driver (#langs × #sources rows), so no
    second scan or shuffle exists at any corpus size.  `grouping_id`
    follows SQL GROUPING() numbering: 0 = (lang, source), 1 = lang
    subtotal (source grouped out), 3 = grand total; grouped-out key
    columns are empty strings (the oracle COALESCEs to match)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["lang", "source"], as_index=False)
               .agg(n=("n_chars", "size"), sum_chars=("n_chars", "sum")))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        fine = (parts_ds.to_pandas().groupby(["lang", "source"],
                                             as_index=False)
                [["n", "sum_chars"]].sum())
    else:
        fine = (parts_ds.groupby(["lang", "source"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("sum_chars", alias_name="sum_chars"))
                .to_pandas())
    by_lang = fine.groupby("lang", as_index=False)[["n", "sum_chars"]].sum()
    by_lang["source"] = ""
    by_lang["grouping_id"] = np.int64(1)
    total = pd.DataFrame({
        "lang": [""], "source": [""],
        "n": [np.int64(fine.n.sum())],
        "sum_chars": [np.int64(fine.sum_chars.sum())],
        "grouping_id": [np.int64(3)]})
    fine = fine.copy()
    fine["grouping_id"] = np.int64(0)
    out = pd.concat([fine, by_lang, total], ignore_index=True)
    return (out.sort_values(["grouping_id", "lang", "source"])
            .reset_index(drop=True)
            [["grouping_id", "lang", "source", "n", "sum_chars"]])


def nchars_ntile_buckets(sf_dir: str, n_buckets: int = 4):
    """Distributed NTILE (equi-depth binning) without a global sort:
    each document's quartile bucket of n_chars within its source.
    ROW_NUMBER's total order is (n_chars, doc_id); the cumulative
    BASE of each (source, n_chars) run comes from the same
    value-cardinality count table as ``nchars_rank_in_source``
    (broadcast once), and the within-run offset of tied docs is
    resolved by one tiny groupby over ONLY the runs that straddle a
    bucket boundary — ties on (source, n_chars) whose run lies fully
    inside a bucket need no ordering at all, so the shuffled residue
    is output-bucket-edge-scale, not corpus-scale."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def cpartial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = df.groupby(["source", "n_chars"], as_index=False).size()
        agg = agg.rename(columns={"size": "cnt"})
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(cpartial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["source", "n_chars"], as_index=False)["cnt"]
                  .sum())
    else:
        counts = (parts_ds.groupby(["source", "n_chars"])
                  .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
    counts = counts.sort_values(["source", "n_chars"]).reset_index(drop=True)
    base = (counts.groupby("source")["cnt"].cumsum()
            - counts["cnt"]).astype(np.int64)  # exclusive prefix
    counts["base"] = base
    n_src = counts.groupby("source")["cnt"].transform("sum").astype(np.int64)
    counts["n_src"] = n_src
    import ray

    def ntile_of(rownum: np.ndarray, n: np.ndarray) -> np.ndarray:
        """SQL NTILE(k): first (n % k) buckets take ceil(n/k) rows."""
        q, r = n // n_buckets, n % n_buckets
        big = r * (q + 1)
        idx0 = rownum - 1
        in_big = idx0 < big
        t = np.where(in_big, idx0 // np.maximum(q + 1, 1),
                     r + (idx0 - big) // np.maximum(q, 1))
        return (t + 1).astype(np.int64)

    # a run (all docs tying on (source, n_chars)) needs intra-run
    # ordering ONLY if a bucket boundary falls inside it: ≤ k−1 runs
    # per source, regardless of corpus size
    counts["b_lo"] = ntile_of(counts["base"].to_numpy() + 1,
                              counts["n_src"].to_numpy())
    counts["b_hi"] = ntile_of(counts["base"].to_numpy()
                              + counts["cnt"].to_numpy(),
                              counts["n_src"].to_numpy())
    lookup_ref = ray.put(counts[["source", "n_chars", "base", "n_src",
                                 "b_lo", "b_hi"]])

    def attach(b: pa.Table) -> pa.Table:
        cdf = ray.get(lookup_ref)
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        df = df.merge(cdf, on=["source", "n_chars"], how="left")
        return pa.Table.from_pandas(df, preserve_index=False)

    tagged = ds.map_batches(attach, batch_format="pyarrow")
    inside = (tagged
              .filter(expr="b_lo == b_hi")
              .map_batches(lambda b: pa.table({
                  "doc_id": b["doc_id"], "source": b["source"],
                  "n_chars": b["n_chars"], "bucket": b["b_lo"]}),
                  batch_format="pyarrow"))

    def resolve_run(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        rownum = g["base"].to_numpy(zero_copy_only=False)[order] \
            + np.arange(len(ids), dtype=np.int64) + 1
        bkt = ntile_of(rownum, g["n_src"].to_numpy(
            zero_copy_only=False)[order])
        return pa.table({"doc_id": pa.array(ids[order]),
                         "source": g["source"].take(order),
                         "n_chars": g["n_chars"].take(order),
                         "bucket": pa.array(bkt)})

    straddling = (tagged.filter(expr="b_lo != b_hi")
                  .groupby(["source", "n_chars"])
                  .map_groups(resolve_run, batch_format="pyarrow"))
    out = inside.union(straddling).to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "source", "n_chars", "bucket"]])


# -- round-4 wave 6: relational anti-join / multi-way join / EXISTS ----------

#: orders-side row gate: below it the distinct-buyer key set (bounded
#: by #customers, referential integrity) broadcasts once and the
#: anti-probe is a map-side sorted-array miss test; above it Ray's
#: native left_anti hash join shuffles both sides by key once
ANTI_BROADCAST_MAX_ROWS = 2_000_000


def customers_without_orders(sf_dir: str, year: int = 1996):
    """Distributed ANTI-join (SQL NOT EXISTS): customers who placed no
    order in one calendar year (lapsed-customer shape).  A Bloom
    filter is deliberately NOT used on this path — in the anti
    direction a Bloom false positive would wrongly DROP a customer, so
    the exact key set is required (contrast ``segment_revenue_topk``'s
    FP-safe semi-join pushdown).  Below the gate, per-block distinct
    in-year o_custkey partials reduce on the driver and broadcast once
    (``ray.put``); the probe is ``searchsorted`` misses — zero
    shuffle.  Above it the per-block-deduped buyer keys hash-join
    ``customer`` with ``join_type="left_anti"`` (duplicate right keys
    are anti-join-neutral, so block-local dedup suffices — no global
    distinct pass)."""
    import ray

    from biobloom_ray.io import hash_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    def buyer_keys(b: pa.Table) -> pa.Table:
        ts = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        k = np.unique(ck[(ts >= lo) & (ts < hi)])
        return pa.table({"o_custkey": pa.array(k)})

    keys_ds = orders.map_batches(buyer_keys, batch_format="pyarrow")

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_name": b["c_name"],
            "acctbal_cents": pa.array(_cents_away(
                b["c_acctbal"].to_numpy(zero_copy_only=False)))})

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= ANTI_BROADCAST_MAX_ROWS:
        buyers = np.unique(keys_ds.to_pandas()["o_custkey"].to_numpy())
        b_ref = ray.put(buyers)

        def anti_probe(b: pa.Table) -> pa.Table:
            keys = ray.get(b_ref)
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return project(b)
            pos = np.searchsorted(keys, ck)
            pos[pos >= len(keys)] = 0
            miss = keys[pos] != ck
            return project(b.filter(pa.array(miss)))

        out = (cust.map_batches(anti_probe, batch_format="pyarrow")
               .to_pandas())
    else:
        anti = hash_join(cust, keys_ds, on=("c_custkey",),
                         right_on=("o_custkey",), join_type="left_anti")
        out = anti.map_batches(project, batch_format="pyarrow").to_pandas()
    if out.empty:  # an all-buyers corpus: keep the output schema stable
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                            "c_name": pd.Series([], dtype=object),
                            "acctbal_cents": pd.Series([], dtype=np.int64)})
    return (out.sort_values("c_custkey").reset_index(drop=True)
            [["c_custkey", "c_name", "acctbal_cents"]])


def region_revenue(sf_dir: str, year: int = 1996):
    """TPC-H Q5 shape — a FIVE-table join pruned to one fact-table
    pass: lineitem revenue per REGION for orders placed in one year.
    The three dimension hops (customer→nation→region) collapse into a
    single orderkey→region-code link table; below the gate that table
    broadcasts once and lineitem reduces map-side straight to ≤5 rows
    per block (zero shuffle on the fact table).  Above it, orders hash-
    joins customer, the tiny nation⋈region lookup rides along as a
    broadcast dict, a runtime Bloom over the year's orderkeys prunes
    lineitem BEFORE its rollup shuffle (FPs drop in the real hash join
    below, so the result is exactly unchanged), and the final groupby
    sums (region, cents·(100−disc)) partials.  Revenue is exact integer
    10⁻⁴-dollar units (int64 headroom ≈ 1.8·10¹⁰ line items per region
    at worst-case prices; overflow-guarded upstream contracts apply)."""
    import ray

    from biobloom_ray.io import hash_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region",
                   columns=["r_regionkey", "r_name"]).to_pandas()
    reg_of_nat = dict(zip(nation.n_nationkey.astype(np.int64),
                          nation.n_regionkey.astype(np.int64)))
    name_of_reg = dict(zip(region.r_regionkey.astype(np.int64),
                           region.r_name))

    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    def year_orders(b: pa.Table) -> pa.Table:
        ts = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        m = (ts >= lo) & (ts < hi)
        return pa.table({
            "o_orderkey": b["o_orderkey"].filter(pa.array(m)),
            "o_custkey": b["o_custkey"].filter(pa.array(m))})

    ykeys = orders.map_batches(year_orders, batch_format="pyarrow")

    def finish(parts: pd.DataFrame) -> pd.DataFrame:
        agg = (parts.groupby("rcode", as_index=False)
               .agg(revenue_e4=("revenue_e4", "sum"),
                    n_items=("n_items", "sum")))
        agg["r_name"] = agg.rcode.map(name_of_reg)
        out = agg.sort_values("r_name").reset_index(drop=True)
        return out[["r_name", "revenue_e4", "n_items"]]

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= ANTI_BROADCAST_MAX_ROWS:
        cd = cust.to_pandas()
        nat_of_cust = dict(zip(cd.c_custkey.astype(np.int64),
                               cd.c_nationkey.astype(np.int64)))
        yo = ykeys.to_pandas()
        rcode = (yo.o_custkey.map(nat_of_cust).map(reg_of_nat)
                 .to_numpy(np.int64))
        order_ = np.argsort(yo.o_orderkey.to_numpy())
        link_ref = ray.put((yo.o_orderkey.to_numpy()[order_],
                            rcode[order_]))

        def li_partial(b: pa.Table) -> pa.Table:
            okeys, rc = ray.get(link_ref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(okeys) == 0 or len(lk) == 0:
                return pa.table({"rcode": pa.array([], pa.int64()),
                                 "revenue_e4": pa.array([], pa.int64()),
                                 "n_items": pa.array([], pa.int64())})
            pos = np.searchsorted(okeys, lk)
            pos[pos >= len(okeys)] = 0
            hit = okeys[pos] == lk
            cents = _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))[hit]
            disc = _cents_away(
                b["l_discount"].to_numpy(zero_copy_only=False))[hit]
            rev = cents * (100 - disc)
            r = rc[pos[hit]]
            nbins = int(r.max()) + 1 if len(r) else 1
            n_per = np.bincount(r, minlength=nbins)
            rev_per = np.zeros(nbins, dtype=np.int64)
            np.add.at(rev_per, r, rev)
            nz = np.nonzero(n_per)[0]
            return pa.table({
                "rcode": pa.array(nz.astype(np.int64)),
                "revenue_e4": pa.array(rev_per[nz]),
                "n_items": pa.array(n_per[nz].astype(np.int64))})

        parts = li.map_batches(li_partial, batch_format="pyarrow").to_pandas()
        return finish(parts)

    # cluster tier: orders ⋈ customer, dims ride as a broadcast dict
    yo_cust = hash_join(ykeys, cust, on=("o_custkey",),
                        right_on=("c_custkey",))
    lut_ref = ray.put((reg_of_nat,))

    def tag_region(b: pa.Table) -> pa.Table:
        (r_of_n,) = ray.get(lut_ref)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        rc = pd.Series(nk).map(r_of_n).to_numpy(np.int64)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "rcode": pa.array(rc)})

    link = yo_cust.map_batches(tag_region, batch_format="pyarrow")

    from biobloom_ray.stages.joinfilter import (bloom_semi_filter,
                                                build_key_bloom)

    okey_bloom = build_key_bloom(link, "o_orderkey",
                                 expected=max((n_ord or 1000) // 4, 1))
    li = bloom_semi_filter(li, "l_orderkey", okey_bloom)

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "revenue_e4": cents * (100 - disc),
            "n_items": np.ones(len(cents), dtype=np.int64)})
        agg = (df.groupby("l_orderkey", as_index=False)
               [["revenue_e4", "n_items"]].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    rev = li.map_batches(rev_partial, batch_format="pyarrow")
    joined = hash_join(rev, link, on=("l_orderkey",),
                       right_on=("o_orderkey",))

    def reg_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "rcode": b["rcode"].to_numpy(zero_copy_only=False),
            "revenue_e4": b["revenue_e4"].to_numpy(zero_copy_only=False),
            "n_items": b["n_items"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby("rcode", as_index=False)
               [["revenue_e4", "n_items"]].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = (joined.map_batches(reg_partial, batch_format="pyarrow")
             .to_pandas())
    return finish(parts)


def orders_priority_semijoin(sf_dir: str):
    """TPC-H Q4 shape — EXISTS rewritten as an aggregate semi-join:
    count orders per priority where some line item shipped AFTER the
    order date.  ``EXISTS(l_shipdate > o_orderdate)`` ⇔
    ``MAX(l_shipdate) per orderkey > o_orderdate``, so the fact table
    reduces FIRST (per-block max partials → tiered combine: driver
    fold below ``LINEITEM_DRIVER_MAX_ROWS``, native Max groupby above)
    and only one row per orderkey reaches the join.  The join is
    tiered on the orders side: the orderkey→max-shipdate table
    broadcasts below ``ANTI_BROADCAST_MAX_ROWS`` (map-side probe, ≤5
    rows out per block); above it an ``io.hash_join`` + the same
    5-row rollup."""
    import ray

    from biobloom_ray.io import hash_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def max_partial(b: pa.Table) -> pa.Table:
        ship = (b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "max_ship_us": ship})
        agg = df.groupby("l_orderkey", as_index=False)["max_ship_us"].max()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(max_partial, batch_format="pyarrow")

    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        maxship = (parts_ds.to_pandas()
                   .groupby("l_orderkey", as_index=False)["max_ship_us"]
                   .max())
    else:
        maxship = None  # stays a Dataset below

    def count_partial(prio, hit_mask) -> pa.Table:
        s = pd.Series(prio)[hit_mask]
        vc = s.value_counts()
        return pa.table({
            "o_orderpriority": pa.array(vc.index.to_numpy(dtype=object)
                                        .tolist(), type=pa.string()),
            "n": pa.array(vc.to_numpy(np.int64))})

    n_ord = _cheap_count(orders)
    if (maxship is not None and n_ord is not None
            and n_ord <= ANTI_BROADCAST_MAX_ROWS):
        order_ = np.argsort(maxship.l_orderkey.to_numpy())
        ms_ref = ray.put((maxship.l_orderkey.to_numpy()[order_],
                          maxship.max_ship_us.to_numpy()[order_]))

        def probe(b: pa.Table) -> pa.Table:
            keys, ms = ray.get(ms_ref)
            ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
            od = (b["o_orderdate"].cast(pa.timestamp("us"))
                  .cast(pa.int64()).to_numpy(zero_copy_only=False))
            if len(keys) == 0 or len(ok) == 0:
                return pa.table({
                    "o_orderpriority": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64())})
            pos = np.searchsorted(keys, ok)
            pos[pos >= len(keys)] = 0
            hit = (keys[pos] == ok) & (ms[pos] > od)
            return count_partial(
                b["o_orderpriority"].to_numpy(zero_copy_only=False), hit)

        parts = (orders.map_batches(probe, batch_format="pyarrow")
                 .to_pandas())
    else:
        if maxship is not None:
            ms_ds = ray.data.from_arrow(
                pa.Table.from_pandas(maxship, preserve_index=False))
        else:
            ms_ds = (parts_ds.groupby("l_orderkey")
                     .aggregate(Max("max_ship_us",
                                    alias_name="max_ship_us")))

        def order_proj(b: pa.Table) -> pa.Table:
            od = (b["o_orderdate"].cast(pa.timestamp("us"))
                  .cast(pa.int64()))
            return pa.table({"o_orderkey": b["o_orderkey"],
                             "od_us": od,
                             "o_orderpriority": b["o_orderpriority"]})

        joined = hash_join(orders.map_batches(order_proj,
                                              batch_format="pyarrow"),
                           ms_ds, on=("o_orderkey",),
                           right_on=("l_orderkey",))

        def filt_count(b: pa.Table) -> pa.Table:
            hit = (b["max_ship_us"].to_numpy(zero_copy_only=False)
                   > b["od_us"].to_numpy(zero_copy_only=False))
            return count_partial(
                b["o_orderpriority"].to_numpy(zero_copy_only=False), hit)

        parts = (joined.map_batches(filt_count, batch_format="pyarrow")
                 .to_pandas())
    out = parts.groupby("o_orderpriority", as_index=False)["n"].sum()
    return (out.sort_values("o_orderpriority").reset_index(drop=True)
            [["o_orderpriority", "n"]])


# -- round-4 wave 7: event-stream operators ----------------------------------

def event_transitions(sf_dir: str):
    """Markov transition counts with exact SQL LAG semantics: for each
    user's event stream ordered by (ts, event_id), count every
    consecutive (prev_type → next_type) pair.  Below the gate one
    pandas sort+shift on the driver; above it the salt-by-time-range
    plan: events shard into (user, hour-bucket) groups, each group
    emits its WITHIN-bucket transition partials plus one boundary row
    (its first/last event), and a second, much smaller
    ``groupby(user_id)`` stitches transitions across consecutive
    touched buckets (per-user group size = #touched buckets, bounded
    by stream duration / span — never by event count).  The final
    (prev, next) rollup is ≤ |types|² rows per block, summed on the
    driver at any scale."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        same = df["user_id"].to_numpy() == np.roll(
            df["user_id"].to_numpy(), 1)
        same[0] = False
        prev = np.roll(df["event_type"].to_numpy(dtype=object), 1)
        out = pd.DataFrame({
            "prev_type": prev[same],
            "next_type": df["event_type"].to_numpy(dtype=object)[same]})
        agg = (out.groupby(["prev_type", "next_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return (agg.sort_values(["prev_type", "next_type"])
                .reset_index(drop=True))

    span_us = np.int64(ASOF_SALT_SPAN_S) * np.int64(1_000_000)

    def bucketize(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": ts_us,
            "event_type": b["event_type"],
            "bucket": pc.divide(ts_us, span_us)})

    def local_trans(g: pa.Table) -> pa.Table:
        """kind 0 = within-bucket (prev,next) partial count; kind 1 =
        boundary row carrying the bucket's first and last event type."""
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        et = et[order]
        uid = g["user_id"][0].as_py()
        bkt = int(g["bucket"][0].as_py())
        parts = []
        if len(et) > 1:
            pairs = pd.DataFrame({"p": et[:-1], "q": et[1:]})
            agg = (pairs.groupby(["p", "q"], as_index=False).size()
                   .rename(columns={"size": "n"}))
            parts.append(pa.table({
                "kind": pa.array(np.zeros(len(agg), dtype=np.int8)),
                "user_id": pa.array(np.full(len(agg), uid, np.int64)),
                "bucket": pa.array(np.full(len(agg), bkt, np.int64)),
                "prev_type": pa.array(agg.p.tolist(), type=pa.string()),
                "next_type": pa.array(agg.q.tolist(), type=pa.string()),
                "n": pa.array(agg.n.to_numpy(np.int64))}))
        parts.append(pa.table({
            "kind": pa.array(np.array([1], dtype=np.int8)),
            "user_id": pa.array([uid], type=pa.int64()),
            "bucket": pa.array([bkt], type=pa.int64()),
            "prev_type": pa.array([str(et[0])], type=pa.string()),
            "next_type": pa.array([str(et[-1])], type=pa.string()),
            "n": pa.array([1], type=pa.int64())}))
        return pa.concat_tables(parts)

    pass1 = (ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby(["user_id", "bucket"])
             .map_groups(local_trans, batch_format="pyarrow")
             .materialize())

    def stitch(g: pa.Table) -> pa.Table:
        """Boundary rows of ONE user, across buckets: the transition
        last(bucket_i) → first(bucket_{i+1}) for consecutive touched
        buckets (intervening empty buckets contribute nothing)."""
        bkt = g["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bkt)
        first = g["prev_type"].to_numpy(zero_copy_only=False)[order]
        last = g["next_type"].to_numpy(zero_copy_only=False)[order]
        if len(bkt) < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"p": last[:-1], "q": first[1:]})
        agg = (pairs.groupby(["p", "q"], as_index=False).size()
               .rename(columns={"size": "n"}))
        return pa.table({
            "prev_type": pa.array(agg.p.tolist(), type=pa.string()),
            "next_type": pa.array(agg.q.tolist(), type=pa.string()),
            "n": pa.array(agg.n.to_numpy(np.int64))})

    boundary = (pass1.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 1)),
        batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(stitch, batch_format="pyarrow"))

    within = pass1.map_batches(
        lambda b: (b.filter(pc.equal(b["kind"], 0))
                   .select(["prev_type", "next_type", "n"])),
        batch_format="pyarrow")

    def pair_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "prev_type": b["prev_type"].to_pandas(),
            "next_type": b["next_type"].to_pandas(),
            "n": b["n"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["prev_type", "next_type"], as_index=False)
               ["n"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = (within.union(boundary)
             .map_batches(pair_partial, batch_format="pyarrow")
             .to_pandas())
    agg = (parts.groupby(["prev_type", "next_type"], as_index=False)
           ["n"].sum())
    agg["n"] = agg["n"].astype(np.int64)
    return (agg.sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


def event_type_daily_ma7(sf_dir: str):
    """Trailing 7-row moving window over the daily rollup (SQL ROWS
    BETWEEN 6 PRECEDING AND CURRENT ROW, per event_type ordered by
    day): emits the exact-integer window sum and row count alongside
    each day's n.  The corpus-scale work is the SAME tiered daily
    rollup as ``event_type_daily``; the window pass runs on the
    output-scale (type, day) table on the driver — #days × #types rows
    regardless of corpus size.  All columns are exact integers (no
    float AVG crosses the oracle hash)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "day_epoch": day.to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["event_type", "day_epoch"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["event_type", "day_epoch"], as_index=False)
                  ["n"].sum())
    else:
        counts = (parts_ds.groupby(["event_type", "day_epoch"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    counts = (counts.sort_values(["event_type", "day_epoch"])
              .reset_index(drop=True))
    g = counts.groupby("event_type")["n"]
    counts["sum7"] = g.transform(
        lambda s: s.rolling(7, min_periods=1).sum()).astype(np.int64)
    counts["cnt7"] = g.transform(
        lambda s: s.rolling(7, min_periods=1).count()).astype(np.int64)
    return counts[["event_type", "day_epoch", "n", "sum7", "cnt7"]]


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(sf_dir: str):
    """Ordered funnel (strict): count users whose FIRST view precedes
    their first click, which precedes their first purchase.  Stage 1
    reduces the corpus to per-(user, stage) first-touch minima (block
    partials → tiered combine: driver fold below the events gate,
    native Min groupby above); stage 2 co-locates each user's ≤3
    minima (``groupby(user_id)``, 3-row groups) and emits per-block
    flag-count partials — the driver ever sees ≤ 3 ints per block.
    One exact-integer summary row."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def min_partial(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(list(FUNNEL_STAGES)))
        b = b.filter(keep)
        ts_us = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "event_type": b["event_type"].to_pandas(),
            "ts_us": ts_us})
        agg = (df.groupby(["user_id", "event_type"], as_index=False)
               ["ts_us"].min())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(min_partial, batch_format="pyarrow")

    def flags_of(piv: pd.DataFrame) -> pd.DataFrame:
        mv = piv.get("view")
        mc = piv.get("click")
        mp = piv.get("purchase")
        n = len(piv)
        z = pd.Series(np.full(n, np.iinfo(np.int64).max), index=piv.index)
        mv = z if mv is None else mv.fillna(np.iinfo(np.int64).max)
        mc = z if mc is None else mc.fillna(np.iinfo(np.int64).max)
        mp = z if mp is None else mp.fillna(np.iinfo(np.int64).max)
        has_v = mv < np.iinfo(np.int64).max
        vc = has_v & (mc < np.iinfo(np.int64).max) & (mv < mc)
        full = vc & (mp < np.iinfo(np.int64).max) & (mc < mp)
        return pd.DataFrame({
            "n_users": [np.int64(n)],
            "n_view": [np.int64(has_v.sum())],
            "n_view_click": [np.int64(vc.sum())],
            "n_full_funnel": [np.int64(full.sum())]})

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        m = (parts_ds.to_pandas()
             .groupby(["user_id", "event_type"], as_index=False)
             ["ts_us"].min())
        piv = m.pivot(index="user_id", columns="event_type",
                      values="ts_us")
        out = flags_of(piv)
    else:
        mins = (parts_ds.groupby(["user_id", "event_type"])
                .aggregate(Min("ts_us", alias_name="ts_us")))

        def user_flags(g: pa.Table) -> pa.Table:
            piv = (g.to_pandas()
                   .pivot(index="user_id", columns="event_type",
                          values="ts_us"))
            return pa.Table.from_pandas(flags_of(piv),
                                        preserve_index=False)

        def sum_partial(b: pa.Table) -> pa.Table:
            return pa.table({c: pa.array([int(pc.sum(b[c]).as_py() or 0)],
                                         type=pa.int64())
                             for c in ("n_users", "n_view",
                                       "n_view_click", "n_full_funnel")})

        parts = (mins.groupby("user_id")
                 .map_groups(user_flags, batch_format="pyarrow")
                 .map_batches(sum_partial, batch_format="pyarrow")
                 .to_pandas())
        out = pd.DataFrame({c: [np.int64(parts[c].sum())]
                            for c in ("n_users", "n_view",
                                      "n_view_click", "n_full_funnel")})
    return out


# -- round-4 wave 8: exact quantiles / rendezvous sharding / partitioned sink -

PCTL_QS = ((1, 10), (1, 2), (9, 10))  # exact rationals: p10, p50, p90


def acctbal_percentiles_per_nation(sf_dir: str):
    """EXACT distributed PERCENTILE_DISC (p10/p50/p90 of customer
    account balance per nation) — the exact twin of the KLL/t-digest
    sketch quantiles.  The corpus reduces to a value-cardinality count
    table ((nationkey, cents) → n; same move as ``nchars_ntile``):
    driver fold below ``RANK_DRIVER_MAX_ROWS``, native Sum groupby
    above.  The percentile pass walks the output-scale count table
    (bounded by the value domain ≈ distinct cent amounts, not by
    customer count) with integer-exact rank thresholds
    ``ceil(q_num·n / q_den)`` — no float boundary can flip the picked
    rank."""
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation.n_nationkey.astype(np.int64), nation.n_name))

    def cpartial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "nationkey": b["c_nationkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "cents": _cents_away(
                b["c_acctbal"].to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["nationkey", "cents"], as_index=False)
               .size().rename(columns={"size": "cnt"}))
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = cust.map_batches(cpartial, batch_format="pyarrow")
    n_rows = _cheap_count(cust)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["nationkey", "cents"], as_index=False)["cnt"]
                  .sum())
    else:
        counts = (parts_ds.groupby(["nationkey", "cents"])
                  .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
    counts = (counts.sort_values(["nationkey", "cents"])
              .reset_index(drop=True))
    rows = []
    for nk, g in counts.groupby("nationkey"):
        cum = g["cnt"].cumsum().to_numpy(np.int64)
        vals = g["cents"].to_numpy(np.int64)
        n = int(cum[-1])
        picks = []
        for num, den in PCTL_QS:
            rank = max(-((-num * n) // den), 1)  # ceil, integer-exact
            picks.append(int(vals[np.searchsorted(cum, rank)]))
        rows.append((name_of[int(nk)], *picks, np.int64(n)))
    out = pd.DataFrame(rows, columns=["n_name", "p10_cents", "p50_cents",
                                      "p90_cents", "n_cust"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


SHARD_COUNT = 16


def shard_assignment_counts(sf_dir: str, n_shards: int = SHARD_COUNT):
    """Rendezvous (highest-random-weight) sharding: each document goes
    to ``argmax_s splitmix64(doc_id·n_shards + s)`` — the consistent-
    hashing scheme where removing one shard reassigns ONLY that shard's
    documents.  Map-only and bit-exactly SQL-replayable (same mixer
    contract as ``deterministic_sample_hash``); per-block rollup emits
    ≤ n_shards rows, summed on the driver at any corpus size."""
    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    ns = np.uint64(n_shards)

    def partial(b: pa.Table) -> pa.Table:
        ids = (b["doc_id"].to_numpy(zero_copy_only=False)
               .astype(np.uint64))
        if len(ids) == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        w = np.empty((n_shards, len(ids)), dtype=np.uint64)
        for s in range(n_shards):
            w[s] = splitmix64(ids * ns + np.uint64(s))
        shard = np.argmax(w, axis=0).astype(np.int64)  # first max wins
        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        n_per = np.bincount(shard, minlength=n_shards)
        c_per = np.zeros(n_shards, dtype=np.int64)
        np.add.at(c_per, shard, nc)
        nz = np.nonzero(n_per)[0]
        return pa.table({"shard": pa.array(nz.astype(np.int64)),
                         "n_docs": pa.array(n_per[nz].astype(np.int64)),
                         "sum_chars": pa.array(c_per[nz])})

    parts = (ds.map_batches(partial, batch_format="pyarrow").to_pandas())
    out = (parts.groupby("shard", as_index=False)
           [["n_docs", "sum_chars"]].sum())
    return out.sort_values("shard").reset_index(drop=True)


PART_ROUNDTRIP_SOURCE = "src7"


def partitioned_roundtrip_source_counts(sf_dir: str,
                                        source: str = PART_ROUNDTRIP_SOURCE):
    """Partitioned parquet sink + pruned re-read (the resumable-output
    contract, S5 analogue): write documents hive-partitioned by
    ``source``, then read back ONLY the requested partition directory
    — the re-read never opens the other partitions' files — and roll
    up language counts.  A crashed run re-reads only the partitions it
    needs; each partition directory is independently re-creatable."""
    import os
    import shutil

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    root = os.path.join("/tmp", "biobloom_ray_part_roundtrip",
                        os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    ds.write_parquet(root, partition_cols=["source"])

    part_dir = os.path.join(root, f"source={source}")
    back = _rp(part_dir, columns=["lang"])

    def lpartial(b: pa.Table) -> pa.Table:
        vc = pd.Series(b["lang"].to_pandas()).value_counts()
        return pa.table({
            "lang": pa.array(vc.index.to_numpy(dtype=object).tolist(),
                             type=pa.string()),
            "n": pa.array(vc.to_numpy(np.int64))})

    parts = back.map_batches(lpartial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


# -- round-4 wave 9: LAG delta / union rollup / multi-distinct ---------------

def nation_monthly_revenue_delta(sf_dir: str):
    """Month-over-month revenue delta per nation (SQL LAG): the
    corpus-scale work is ONE tiered orders⋈customer rollup to
    (nation, month) — broadcast custkey→nationkey map below
    ``CUST_BROADCAST_MAX_ROWS`` (map-side partials straight to
    ≤ #nations × #months rows per block), hash join + native Sum
    groupby above — and the LAG pass runs on the output-scale table
    on the driver.  ``delta_cents`` is NULL-free: the first month of
    each nation reports its own total (SQL COALESCE(c - LAG(c), c))."""
    import ray

    from biobloom_ray.io import hash_join

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation.n_nationkey.astype(np.int64), nation.n_name))

    def month_col(b: pa.Table) -> pa.Array:
        return (pc.floor_temporal(b["o_orderdate"], unit="month")
                .cast(pa.timestamp("s")).cast(pa.int64()))

    n_cust = _cheap_count(cust)
    if n_cust is not None and n_cust <= CUST_BROADCAST_MAX_ROWS:
        cd = cust.to_pandas()
        order_ = np.argsort(cd.c_custkey.to_numpy())
        lut_ref = ray.put((cd.c_custkey.to_numpy()[order_],
                           cd.c_nationkey.to_numpy()[order_]
                           .astype(np.int64)))

        def partial(b: pa.Table) -> pa.Table:
            keys_s, nat_s = ray.get(lut_ref)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False)
            if len(keys_s) == 0 or len(ck) == 0:
                return pa.table({"nationkey": pa.array([], pa.int64()),
                                 "month_epoch": pa.array([], pa.int64()),
                                 "cents": pa.array([], pa.int64())})
            idx = np.searchsorted(keys_s, ck)
            idx[idx >= len(keys_s)] = 0
            ok = keys_s[idx] == ck
            df = pd.DataFrame({
                "nationkey": nat_s[idx[ok]],
                "month_epoch": month_col(b).to_numpy(
                    zero_copy_only=False)[ok],
                "cents": _cents_away(b["o_totalprice"].to_numpy(
                    zero_copy_only=False))[ok]})
            agg = (df.groupby(["nationkey", "month_epoch"], as_index=False)
                   ["cents"].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        monthly = (orders.map_batches(partial, batch_format="pyarrow")
                   .to_pandas()
                   .groupby(["nationkey", "month_epoch"], as_index=False)
                   ["cents"].sum())
    else:
        def order_proj(b: pa.Table) -> pa.Table:
            return pa.table({
                "o_custkey": b["o_custkey"],
                "month_epoch": month_col(b),
                "cents": pa.array(_cents_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)))})

        joined = hash_join(orders.map_batches(order_proj,
                                              batch_format="pyarrow"),
                           cust, on=("o_custkey",), right_on=("c_custkey",))

        def mpartial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "nationkey": b["c_nationkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "month_epoch": b["month_epoch"].to_numpy(
                    zero_copy_only=False),
                "cents": b["cents"].to_numpy(zero_copy_only=False)})
            agg = (df.groupby(["nationkey", "month_epoch"],
                              as_index=False)["cents"].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        monthly = (joined.map_batches(mpartial, batch_format="pyarrow")
                   .groupby(["nationkey", "month_epoch"])
                   .aggregate(Sum("cents", alias_name="cents"))
                   .to_pandas())
    monthly["n_name"] = monthly.nationkey.map(name_of)
    monthly = (monthly.sort_values(["n_name", "month_epoch"])
               .reset_index(drop=True))
    prev = monthly.groupby("n_name")["cents"].shift(1)
    monthly["delta_cents"] = np.where(
        prev.isna(), monthly["cents"],
        monthly["cents"] - prev.fillna(0).astype(np.int64)).astype(np.int64)
    return monthly[["n_name", "month_epoch", "cents", "delta_cents"]]


def nation_balance_union(sf_dir: str):
    """``Dataset.union`` across two fact tables: customer and supplier
    account balances rolled up per (nation, side).  Each side maps to
    per-block (nationkey, side, n, sum_cents) partials BEFORE the
    union, so the united stream is output-scale (≤ #nations × 2 rows
    per block) and the driver sum never grows with the corpus — no
    gate needed."""
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    supp = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation.n_nationkey.astype(np.int64), nation.n_name))

    def side_partial(key_col: str, bal_col: str, side: str):
        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "nationkey": b[key_col].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "cents": _cents_away(
                    b[bal_col].to_numpy(zero_copy_only=False))})
            agg = (df.groupby("nationkey", as_index=False)
                   .agg(n=("cents", "size"), sum_cents=("cents", "sum")))
            agg["n"] = agg["n"].astype(np.int64)
            agg.insert(1, "side", side)
            return pa.Table.from_pandas(agg, preserve_index=False)
        return partial

    c_parts = cust.map_batches(
        side_partial("c_nationkey", "c_acctbal", "customer"),
        batch_format="pyarrow")
    s_parts = supp.map_batches(
        side_partial("s_nationkey", "s_acctbal", "supplier"),
        batch_format="pyarrow")
    parts = c_parts.union(s_parts).to_pandas()
    agg = (parts.groupby(["nationkey", "side"], as_index=False)
           [["n", "sum_cents"]].sum())
    agg["n_name"] = agg.nationkey.map(name_of)
    return (agg.sort_values(["n_name", "side"]).reset_index(drop=True)
            [["n_name", "side", "n", "sum_cents"]])


#: part-side row gate (same contract as the other driver gates)
PART_DRIVER_MAX_ROWS = 2_000_000


def brand_distinct_sizes(sf_dir: str):
    """Multi-DISTINCT rollup: per brand, the part count plus TWO
    distinct-counts (sizes, types) — the two-level dedup-then-count
    shape.  Block partials dedup (brand, size) / (brand, type) locally
    and pre-sum raw counts; below the gate one driver pass finishes,
    above it each distinct count is a chained native groupby (dedup
    groupby((brand, dim)) → Count per brand) and the part count a
    native Sum — three output-scale shuffles of deduped rows, never
    the part table itself."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_size", "p_type"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"brand": b["p_brand"].to_pandas(),
                           "size": b["p_size"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "type": b["p_type"].to_pandas()})
        cnt = (df.groupby("brand", as_index=False).size()
               .rename(columns={"size": "n_parts"}))
        cnt["n_parts"] = cnt["n_parts"].astype(np.int64)
        bs = df[["brand", "size"]].drop_duplicates()
        bt = df[["brand", "type"]].drop_duplicates()
        return pa.table({
            "kind": pa.array(
                np.r_[np.zeros(len(cnt), np.int8),
                      np.ones(len(bs), np.int8),
                      np.full(len(bt), 2, np.int8)]),
            "brand": pa.array(pd.concat([cnt.brand, bs.brand, bt.brand])
                              .tolist(), type=pa.string()),
            "size": pa.array(np.r_[np.zeros(len(cnt), np.int64),
                                   bs["size"].to_numpy(np.int64),
                                   np.zeros(len(bt), np.int64)]),
            "type": pa.array([""] * (len(cnt) + len(bs))
                             + bt["type"].tolist(), type=pa.string()),
            "n": pa.array(np.r_[cnt.n_parts.to_numpy(np.int64),
                                np.zeros(len(bs), np.int64),
                                np.zeros(len(bt), np.int64)])})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= PART_DRIVER_MAX_ROWS:
        p = parts_ds.to_pandas()
        n_parts = (p[p.kind == 0].groupby("brand", as_index=False)["n"]
                   .sum().rename(columns={"n": "n_parts"}))
        n_sizes = (p[p.kind == 1][["brand", "size"]].drop_duplicates()
                   .groupby("brand", as_index=False).size()
                   .rename(columns={"size": "n_sizes"}))
        n_types = (p[p.kind == 2][["brand", "type"]].drop_duplicates()
                   .groupby("brand", as_index=False).size()
                   .rename(columns={"size": "n_types"}))
    else:
        n_parts = (parts_ds
                   .filter(expr="kind == 0")
                   .groupby("brand")
                   .aggregate(Sum("n", alias_name="n_parts")).to_pandas())
        n_sizes = (parts_ds.filter(expr="kind == 1")
                   .groupby(["brand", "size"])
                   .aggregate(Count(alias_name="c"))
                   .groupby("brand")
                   .aggregate(Count(alias_name="n_sizes")).to_pandas()
                   [["brand", "n_sizes"]])
        n_types = (parts_ds.filter(expr="kind == 2")
                   .groupby(["brand", "type"])
                   .aggregate(Count(alias_name="c"))
                   .groupby("brand")
                   .aggregate(Count(alias_name="n_types")).to_pandas()
                   [["brand", "n_types"]])
    out = n_parts.merge(n_sizes, on="brand").merge(n_types, on="brand")
    for c in ("n_parts", "n_sizes", "n_types"):
        out[c] = out[c].astype(np.int64)
    out = out.rename(columns={"brand": "p_brand"})
    return out.sort_values("p_brand").reset_index(drop=True)


# -- round-4 wave 10: Pareto cum-share / diversity entropy / supplier topk ---

def revenue_pareto_nations(sf_dir: str):
    """Pareto (80/20) analysis: nations ranked by revenue with
    cumulative totals and an exact-integer top-80% membership flag
    (``cum·10 ≤ total·8`` — no float share crosses the oracle hash).
    Corpus-scale work is the same tiered orders⋈customer rollup
    as ``orders_per_nation``; the cumulative window runs on the
    ≤ #nations-row output."""
    base = orders_per_nation(sf_dir)  # n_name, n_orders, total_cents
    out = (base.sort_values(["total_cents", "n_name"],
                            ascending=[False, True])
           .reset_index(drop=True))
    out["cum_cents"] = out["total_cents"].cumsum().astype(np.int64)
    total = np.int64(out["total_cents"].sum())
    out["in_top80"] = (out["cum_cents"] * 10 <= total * 8)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "n_name", "total_cents", "cum_cents", "in_top80"]]


def source_lang_entropy(sf_dir: str):
    """Language-diversity entropy per source: H = ln(n) − (1/n)·Σ c·ln c
    over the (source, lang) count table — the mixture-diversity
    monitor for corpus curation.  Corpus work is ONE tiered
    (source, lang) rollup (shared ``RANK_DRIVER_MAX_ROWS`` gate); the
    entropy pass runs on the output-scale table.  Counts are exact
    integers; the entropy is 6-dp rounded (same float contract as
    ``token_entropy``)."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "lang": b["lang"].to_pandas()})
        agg = (df.groupby(["source", "lang"], as_index=False).size()
               .rename(columns={"size": "c"}))
        agg["c"] = agg["c"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["source", "lang"], as_index=False)["c"].sum())
    else:
        counts = (parts_ds.groupby(["source", "lang"])
                  .aggregate(Sum("c", alias_name="c")).to_pandas())
    g = counts.groupby("source")
    n = g["c"].transform("sum").to_numpy(np.int64)
    c = counts["c"].to_numpy(np.int64)
    counts["s"] = c * np.log(c)
    agg = (counts.groupby("source", as_index=False)
           .agg(n_docs=("c", "sum"), n_langs=("c", "size"),
                s=("s", "sum")))
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg["n_langs"] = agg["n_langs"].astype(np.int64)
    agg["entropy_r6"] = np.round(
        np.log(agg["n_docs"].to_numpy(np.float64))
        - agg["s"].to_numpy() / agg["n_docs"].to_numpy(np.float64), 6)
    return (agg.sort_values("source").reset_index(drop=True)
            [["source", "n_docs", "n_langs", "entropy_r6"]])


def top_suppliers_by_quantity(sf_dir: str, k: int = 10):
    """Supplier league table: top-k suppliers by total shipped
    quantity, name attached.  Lineitem reduces per block to
    (suppkey, qty, n) partials; tiered combine (driver fold below
    ``LINEITEM_DRIVER_MAX_ROWS``, native Sum groupby + per-block exact
    top-k above — post-groupby blocks hold disjoint keys); the ≤k-row
    result joins the supplier name via one pruned broadcast read."""
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "qty": b["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        agg = (df.groupby("l_suppkey", as_index=False)
               .agg(sum_qty=("qty", "sum"), n_items=("qty", "size")))
        agg["n_items"] = agg["n_items"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        agg = (parts_ds.to_pandas().groupby("l_suppkey", as_index=False)
               [["sum_qty", "n_items"]].sum())
        top = (agg.sort_values(["sum_qty", "l_suppkey"],
                               ascending=[False, True]).head(k))
    else:
        summed = (parts_ds.groupby("l_suppkey")
                  .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                             Sum("n_items", alias_name="n_items")))

        def local_topk(b: pa.Table) -> pa.Table:
            sq = b["sum_qty"].to_numpy(zero_copy_only=False)
            keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
            ni = b["n_items"].to_numpy(zero_copy_only=False)
            idx = np.lexsort((keys, -sq))[:k]
            return pa.table({"l_suppkey": pa.array(keys[idx]),
                             "sum_qty": pa.array(sq[idx]),
                             "n_items": pa.array(ni[idx])})

        top = (summed.map_batches(local_topk, batch_format="pyarrow")
               .to_pandas()
               .sort_values(["sum_qty", "l_suppkey"],
                            ascending=[False, True]).head(k))
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name"]).to_pandas()
    name_of = dict(zip(supp.s_suppkey.astype(np.int64), supp.s_name))
    top = top.reset_index(drop=True)
    top["s_name"] = top.l_suppkey.map(name_of)
    top["sum_qty"] = top["sum_qty"].astype(np.int64)
    return top[["l_suppkey", "s_name", "sum_qty", "n_items"]]


# -- round-4 wave 11: decile stats / DENSE_RANK ties / correlated agg --------

def value_decile_stats(sf_dir: str, n_buckets: int = 10):
    """Exact global equi-depth decile statistics over event value:
    per NTILE(10) bucket (total order: cents, then event_id), the row
    count, sum, min and max in integer cents.  KEY INSIGHT: every
    aggregate here is decided by the VALUE-CARDINALITY count table
    alone — rows tying on cents are interchangeable w.r.t. count/sum/
    min/max, so the tie-break inside a straddling run never changes
    the answer and no per-row pass exists at all.  The corpus reduces
    to (cents → n) partials (tiered: driver fold below the shared
    events gate, native Sum groupby above); the decile walk runs on
    the value-domain-bounded count table."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby("cents", as_index=False)["n"].sum())
    else:
        counts = (parts_ds.groupby("cents")
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    counts = counts.sort_values("cents").reset_index(drop=True)
    vals = counts["cents"].to_numpy(np.int64)
    cnt = counts["n"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    q, r = divmod(n, n_buckets)
    rows = []
    lo_rank = 0  # exclusive prefix rank of the current bucket
    for b in range(n_buckets):
        size = q + 1 if b < r else q
        if size == 0:
            continue
        hi_rank = lo_rank + size
        i0 = int(np.searchsorted(cum, lo_rank + 1))
        i1 = int(np.searchsorted(cum, hi_rank))
        # rows of value vals[i] fully inside: full count; edge runs
        # contribute only their in-bucket share
        full_sum = 0
        if i0 == i1:
            in_b = size
            s = int(vals[i0]) * in_b
        else:
            head = int(cum[i0] - lo_rank)           # part of run i0
            tail = int(hi_rank - cum[i1 - 1])       # part of run i1
            mid = cnt[i0 + 1:i1]
            s = (int(vals[i0]) * head + int(vals[i1]) * tail
                 + int(np.dot(vals[i0 + 1:i1], mid)))
        rows.append((np.int64(b + 1), np.int64(size), np.int64(s),
                     np.int64(vals[i0]), np.int64(vals[i1])))
        lo_rank = hi_rank
    out = pd.DataFrame(rows, columns=["bucket", "n", "sum_cents",
                                      "min_cents", "max_cents"])
    return out


def top_size_modes_per_brand(sf_dir: str, depth: int = 2):
    """Grouped DENSE_RANK with ties kept: per brand, every part size
    whose frequency ranks in the top ``depth`` DISTINCT frequencies
    (mode and runner-up — ALL ties survive, unlike row-limit top-k).
    Corpus work is one tiered (brand, size) count rollup; the
    dense-rank pass runs on the output-scale count table."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_size"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"p_brand": b["p_brand"].to_pandas(),
                           "p_size": b["p_size"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        agg = (df.groupby(["p_brand", "p_size"], as_index=False).size()
               .rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= PART_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["p_brand", "p_size"], as_index=False)["n"]
                  .sum())
    else:
        counts = (parts_ds.groupby(["p_brand", "p_size"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    # dense rank of n (desc) within brand; ties share a rank
    counts["rnk"] = (counts.groupby("p_brand")["n"]
                     .rank(method="dense", ascending=False)
                     .astype(np.int64))
    out = counts[counts.rnk <= depth].copy()
    return (out.sort_values(["p_brand", "rnk", "p_size"])
            .reset_index(drop=True)
            [["p_brand", "p_size", "n", "rnk"]])


def parts_above_type_avg(sf_dir: str):
    """Correlated-subquery rewrite: per part type, how many parts are
    STRICTLY larger than their own type's average size.  The average
    never materializes as a float — the predicate ``size > sum/n``
    becomes the exact integer cross-multiplication ``size·n > sum``.
    One tiered (type, size) count rollup feeds both the per-type
    totals and the comparison — no second scan, no join back to the
    part table."""
    ds = _read(sf_dir, "part", columns=["p_type", "p_size"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"p_type": b["p_type"].to_pandas(),
                           "p_size": b["p_size"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        agg = (df.groupby(["p_type", "p_size"], as_index=False).size()
               .rename(columns={"size": "c"}))
        agg["c"] = agg["c"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= PART_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["p_type", "p_size"], as_index=False)["c"]
                  .sum())
    else:
        counts = (parts_ds.groupby(["p_type", "p_size"])
                  .aggregate(Sum("c", alias_name="c")).to_pandas())
    g = counts.groupby("p_type")
    n_t = g["c"].transform("sum").to_numpy(np.int64)
    sum_t = (counts["p_size"].to_numpy(np.int64)
             * counts["c"].to_numpy(np.int64))
    counts["w"] = sum_t
    sum_type = g["w"].transform("sum").to_numpy(np.int64)
    above = (counts["p_size"].to_numpy(np.int64) * n_t
             > sum_type)
    counts["above_c"] = np.where(above, counts["c"].to_numpy(np.int64), 0)
    agg = (counts.groupby("p_type", as_index=False)
           .agg(n_parts=("c", "sum"), n_above=("above_c", "sum")))
    agg["n_parts"] = agg["n_parts"].astype(np.int64)
    agg["n_above"] = agg["n_above"].astype(np.int64)
    return agg.sort_values("p_type").reset_index(drop=True)

def event_user_setops(sf_dir: str, type_a: str = "click",
                      type_b: str = "purchase"):
    """Set operations (INTERSECT / EXCEPT) over per-type user sets as a
    single conditional rollup: users who did BOTH ``type_a`` and
    ``type_b``, either side only, or neither — one exact-integer report
    row.  The two user sets never materialize and never join: ONE
    tiered groupby(user_id) with Max-indicator partials decides every
    set-op count (|A∩B|, |A\\B|, |B\\A| fall out of the (a,b) flag
    combination counts), so the plan is a single shuffle of ≤ #users
    pre-deduped rows regardless of corpus size."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "a": pc.equal(et, type_a).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
            "b": pc.equal(et, type_b).to_numpy(zero_copy_only=False)
                 .astype(np.int64)})
        agg = df.groupby("user_id", as_index=False).max()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        flags = (parts_ds.to_pandas()
                 .groupby("user_id", as_index=False).max())
    else:
        flags = (parts_ds.groupby("user_id")
                 .aggregate(Max("a", alias_name="a"),
                            Max("b", alias_name="b")).to_pandas())
    a = flags["a"].to_numpy(np.int64)
    b = flags["b"].to_numpy(np.int64)
    return pd.DataFrame({
        "n_users": [np.int64(len(flags))],
        "n_a": [np.int64(a.sum())],
        "n_b": [np.int64(b.sum())],
        "n_both": [np.int64(int((a & b).sum()))],
        "n_only_a": [np.int64(int((a & (1 - b)).sum()))],
        "n_only_b": [np.int64(int(((1 - a) & b).sum()))],
        "n_neither": [np.int64(int(((1 - a) & (1 - b)).sum()))]})


def type_day_dense_counts(sf_dir: str):
    """Gap-filled dense time series (the warehouse "calendar cross
    join"): every (event_type × day) cell of the observed grid gets a
    row, zero-filled where no events landed.  Corpus work is the SAME
    tiered (type, day) count rollup every daily operator uses; the
    dense grid is the cartesian product of the two OUTPUT-scale
    distinct lists (#types × #days rows), built driver-side with a
    left merge + fillna(0) — no corpus-scale cross join ever runs."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "day_epoch": day.to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["event_type", "day_epoch"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"event_type": object, "day_epoch": np.int64, "n": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby(["event_type", "day_epoch"], as_index=False)
                  ["n"].sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby(["event_type", "day_epoch"])
            .aggregate(Sum("n", alias_name="n")), schema)
    types = np.sort(counts["event_type"].unique())
    days = np.sort(counts["day_epoch"].unique())
    grid = pd.MultiIndex.from_product(
        [types, days], names=["event_type", "day_epoch"]).to_frame(
        index=False)
    out = grid.merge(counts, on=["event_type", "day_epoch"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out["day_epoch"] = out["day_epoch"].astype(np.int64)
    return out.sort_values(["event_type", "day_epoch"]).reset_index(
        drop=True)


def lineitem_corr_stats(sf_dir: str):
    """Grouped Pearson correlation + least-squares slope
    (CORR / REGR_SLOPE shape) of extendedprice-cents against quantity
    per returnflag, from ONE pass of moment partials: n, Σx, Σy, Σxy,
    Σx² are exact int64 per block (quantity ≤ 50 keeps Σxy far from
    overflow), Σy² is float64 (y² up to 10¹⁴ would overflow int64 at
    corpus scale; the 6-dp ratio contract absorbs the ~1e-16 relative
    summation error).  Final r and slope are computed from the merged
    moments with exact-int numerators (Python int, no int64 overflow
    on n·Σxy or (Σy)²) and rounded to 6 dp — the oracle spells out the
    identical moment formula instead of the builtin CORR so both sides
    share one algebra."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = b["l_quantity"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = _cents_away(b["l_extendedprice"].to_numpy(
            zero_copy_only=False))
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pandas(),
            "n": np.ones(len(x), dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sx2": x * x,
            "sy2": y.astype(np.float64) ** 2})
        agg = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        m = (parts_ds.to_pandas()
             .groupby("l_returnflag", as_index=False).sum())
    else:
        m = (parts_ds.groupby("l_returnflag")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sx", alias_name="sx"),
                        Sum("sy", alias_name="sy"),
                        Sum("sxy", alias_name="sxy"),
                        Sum("sx2", alias_name="sx2"),
                        Sum("sy2", alias_name="sy2")).to_pandas())
    m = m.sort_values("l_returnflag").reset_index(drop=True)
    corr, slope = [], []
    for _, r in m.iterrows():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxy, sx2, sy2 = int(r.sxy), int(r.sx2), float(r.sy2)
        num = float(n * sxy - sx * sy)          # exact int → double
        dx = float(n * sx2 - sx * sx)           # exact int → double
        dy = n * sy2 - float(sy * sy)           # double (matches SQL)
        corr.append(num / np.sqrt(dx * dy))
        slope.append(num / dx)
    m["corr_r6"] = np.round(np.array(corr), 6)
    m["slope_r6"] = np.round(np.array(slope), 6)
    m["n"] = m["n"].astype(np.int64)
    return m[["l_returnflag", "n", "corr_r6", "slope_r6"]]

def snapshot_user_diff(sf_dir: str):
    """CDC / snapshot-diff (the FULL OUTER JOIN shape): compare two
    deterministic snapshots of the events table — "old" = even
    event_id, "new" = odd — at entity grain (user_id, k-decade from
    the JSON props), emitting old_n / new_n / status ∈ {added,
    removed, changed, unchanged} per entity.  The two snapshots never
    join: ONE tiered groupby(entity) over conditional count partials
    decides every cell (an outer join of two rollups of the same scan
    is just a wider rollup), so the plan is one shuffle of pre-reduced
    rows.  The oracle spells out the literal FULL OUTER JOIN to pin
    semantic equivalence."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "props"])

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = (pc.cast(pc.struct_field(ex, "k"), pa.int64())
             .to_numpy(zero_copy_only=False))
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        ent = uid * 100 + k // 10
        old = (eid % 2 == 0).astype(np.int64)
        df = pd.DataFrame({"entity": ent, "old_n": old,
                           "new_n": 1 - old})
        agg = df.groupby("entity", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"entity": np.int64, "old_n": np.int64, "new_n": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        c = (_parts_pandas(parts_ds, schema)
             .groupby("entity", as_index=False).sum())
    else:
        c = _parts_pandas(
            parts_ds.groupby("entity")
            .aggregate(Sum("old_n", alias_name="old_n"),
                       Sum("new_n", alias_name="new_n")), schema)
    o = c["old_n"].to_numpy(np.int64)
    n = c["new_n"].to_numpy(np.int64)
    c["status"] = np.select(
        [o == 0, n == 0, o != n], ["added", "removed", "changed"],
        default="unchanged")
    c["old_n"] = o
    c["new_n"] = n
    return (c.sort_values("entity").reset_index(drop=True)
            [["entity", "old_n", "new_n", "status"]])


def max_concurrent_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sweep-line interval aggregation: the global maximum number of
    concurrently open sessions (closed intervals [first_ts, last_ts]
    from the same 30-min-gap sessionization the sessionize operator
    uses).  Plan: per-user map_groups emits (start, end, unique
    boundary ids) — session-scale rows, not event-scale — then the
    boundary stream (+1 at start, −1 at end; starts sort before ends
    at the same instant) reduces by a DISTRIBUTED MAX-PREFIX-SUM: sort
    by the unique (t, dneg, bid) key, one pass reads per block only
    (first-key, Σdelta, local prefix max), and the driver folds
    #blocks rows — max = max_i(offset_i + local_max_i).  No second
    pass and nothing event-scale ever reaches the driver; below the
    shared events gate the fold runs directly on the session-scale
    boundary table."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def bounds(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
                     .to_numpy(zero_copy_only=False))
        if len(ts) == 0:
            return pa.table({"t": pa.array([], pa.int64()),
                             "dneg": pa.array([], pa.int64()),
                             "bid": pa.array([], pa.int64())})
        new_s = np.empty(len(ts), dtype=bool)
        new_s[0] = True
        new_s[1:] = np.diff(ts) > gap_ns
        starts = ts[new_s]
        # session end = element before the next session start
        end_idx = np.r_[np.flatnonzero(new_s)[1:] - 1, len(ts) - 1]
        ends = ts[end_idx]
        uid = int(g["user_id"][0].as_py())
        sid = uid * (1 << 20) + np.arange(len(starts), dtype=np.int64)
        t = np.concatenate([starts, ends])
        d = np.concatenate([np.ones(len(starts), dtype=np.int64),
                            -np.ones(len(ends), dtype=np.int64)])
        bid = np.concatenate([sid * 2, sid * 2 + 1])
        return pa.table({"t": pa.array(t), "dneg": pa.array(-d),
                         "bid": pa.array(bid)})

    bounds_ds = ds.groupby("user_id").map_groups(
        bounds, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        bdf = bounds_ds.to_pandas()
        if len(bdf) == 0:  # empty input: map_groups emits no schema
            return pd.DataFrame({"max_concurrent": [np.int64(0)],
                                 "n_sessions": [np.int64(0)]})
        order = np.lexsort((bdf["bid"].to_numpy(),
                            bdf["dneg"].to_numpy(),
                            bdf["t"].to_numpy()))
        d = -bdf["dneg"].to_numpy(np.int64)[order]
        mx = int(np.cumsum(d).max()) if len(d) else 0
        n_sessions = len(bdf) // 2
    else:
        sorted_ds = bounds_ds.sort(["t", "dneg", "bid"]).materialize()

        def block_partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"k_t": pa.array([], pa.int64()),
                                 "k_dneg": pa.array([], pa.int64()),
                                 "k_bid": pa.array([], pa.int64()),
                                 "bsum": pa.array([], pa.int64()),
                                 "bmax": pa.array([], pa.int64()),
                                 "bn": pa.array([], pa.int64())})
            d = -b["dneg"].to_numpy(zero_copy_only=False)
            cs = np.cumsum(d)
            return pa.table({
                "k_t": pa.array([int(b["t"][0].as_py())]),
                "k_dneg": pa.array([int(b["dneg"][0].as_py())]),
                "k_bid": pa.array([int(b["bid"][0].as_py())]),
                "bsum": pa.array([int(cs[-1])]),
                "bmax": pa.array([int(cs.max())]),
                "bn": pa.array([b.num_rows])})

        blocks = (sorted_ds.map_batches(block_partial,
                                        batch_format="pyarrow",
                                        batch_size=None).to_pandas())
        if len(blocks) == 0:
            return pd.DataFrame({"max_concurrent": [np.int64(0)],
                                 "n_sessions": [np.int64(0)]})
        blocks = blocks.sort_values(["k_t", "k_dneg", "k_bid"])
        offs = blocks.bsum.cumsum().shift(fill_value=0).to_numpy()
        mx = int((offs + blocks.bmax.to_numpy()).max()) if len(blocks) \
            else 0
        n_sessions = int(blocks.bn.sum()) // 2
    return pd.DataFrame({"max_concurrent": [np.int64(mx)],
                         "n_sessions": [np.int64(n_sessions)]})


def pmi_top_bigrams(sf_dir: str, min_count: int = 5, k: int = 20):
    """Global PMI collocations: the k strongest word bigrams by
    pointwise mutual information, PMI = ln(p(x,y) / (p(x)·p(y))) with
    p from exact corpus counts (bigram mass over N_bg, unigram mass
    over N_uni), restricted to bigrams seen ≥ ``min_count`` times.
    ONE tokenize scan feeds factorized bigram AND unigram count
    partials; both reduce through the shared rarity tier (driver fold
    below ``RARITY_BROADCAST_MAX_ROWS``, native Sum groupby + hash
    joins of the ≥min_count candidates against the unigram table
    above).  The 6-dp PMI is computed with the same left-associative
    double algebra the oracle spells out."""
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, _lens, row_of = _token_arrays(b)
        if len(flat) == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        uni = pd.DataFrame({"w1": flat, "w2": ""})
        if len(flat) >= 2:
            same = row_of[1:] == row_of[:-1]
            bg = pd.DataFrame({"w1": flat[:-1][same],
                               "w2": flat[1:][same]})
        else:
            bg = pd.DataFrame({"w1": [], "w2": []})
        df = pd.concat([uni, bg], ignore_index=True)
        agg = df.groupby(["w1", "w2"], as_index=False).size().rename(
            columns={"size": "c"})
        agg["c"] = agg["c"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def _pmi_frame(bg: pd.DataFrame, n_uni: int, n_bg: int
                   ) -> pd.DataFrame:
        c_xy = bg["c_xy"].to_numpy(np.int64)
        c_x = bg["c_x"].to_numpy(np.int64)
        c_y = bg["c_y"].to_numpy(np.int64)
        pmi = np.log(c_xy.astype(np.float64) * n_uni * n_uni
                     / (float(n_bg) * c_x * c_y))
        out = pd.DataFrame({
            "bigram": bg["w1"].str.cat(bg["w2"], sep=" "),
            "c_xy": c_xy, "pmi_r6": np.round(pmi, 6)})
        return (out.sort_values(["pmi_r6", "bigram"],
                                ascending=[False, True]).head(k)
                .reset_index(drop=True))

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RARITY_BROADCAST_MAX_ROWS:
        c = (parts_ds.to_pandas()
             .groupby(["w1", "w2"], as_index=False)["c"].sum())
        uni = c[c.w2 == ""]
        bg = c[(c.w2 != "") & (c.c >= min_count)].copy()
        n_uni = int(uni.c.sum())
        n_bg = int(c[c.w2 != ""].c.sum())
        cx = uni.set_index("w1").c
        bg = bg.rename(columns={"c": "c_xy"})
        bg["c_x"] = bg.w1.map(cx).to_numpy(np.int64)
        bg["c_y"] = bg.w2.map(cx).to_numpy(np.int64)
        return _pmi_frame(bg, n_uni, n_bg)

    # cluster tier: the vocab/bigram count table never visits the
    # driver — ≥min_count candidates hash-join the unigram side twice,
    # PMI + local top-k per block, and only #blocks·k rows reduce
    from biobloom_ray.io import hash_join

    counts_ds = (parts_ds.groupby(["w1", "w2"])
                 .aggregate(Sum("c", alias_name="c")).materialize())

    def tot_partial(b: pa.Table) -> pa.Table:
        w2 = b["w2"].to_numpy(zero_copy_only=False).astype(object)
        cc = b["c"].to_numpy(zero_copy_only=False)
        is_bg = w2 != ""
        return pa.table({"n_uni": pa.array([int(cc[~is_bg].sum())]),
                         "n_bg": pa.array([int(cc[is_bg].sum())])})

    tots = (counts_ds.map_batches(tot_partial, batch_format="pyarrow")
            .to_pandas())
    n_uni = int(tots.n_uni.sum())
    n_bg = int(tots.n_bg.sum())

    def uni_proj(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["w2"], ""))
        return pa.table({"w": t["w1"], "cu": t["c"]})

    def cand_proj(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.not_equal(b["w2"], ""),
                             pc.greater_equal(b["c"], min_count)))
        return pa.table({"w1": t["w1"], "w2": t["w2"], "c_xy": t["c"]})

    uni_ds = counts_ds.map_batches(uni_proj, batch_format="pyarrow")
    cand_ds = counts_ds.map_batches(cand_proj, batch_format="pyarrow")

    def ren(col_from: str, col_to: str):
        def f(b: pa.Table) -> pa.Table:
            names = [col_to if nm == col_from else nm
                     for nm in b.column_names]
            return b.rename_columns(names).drop_columns(
                [c for c in ("w",) if c in names])
        return f

    j1 = hash_join(cand_ds, uni_ds, on=("w1",), right_on=("w",)
                   ).map_batches(ren("cu", "c_x"),
                                 batch_format="pyarrow")
    j2 = hash_join(j1, uni_ds, on=("w2",), right_on=("w",)
                   ).map_batches(ren("cu", "c_y"),
                                 batch_format="pyarrow")

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        top = _pmi_frame(df, n_uni, n_bg)
        return pa.Table.from_pandas(top, preserve_index=False)

    pooled = (j2.map_batches(local_topk, batch_format="pyarrow")
              .to_pandas())
    return (pooled.sort_values(["pmi_r6", "bigram"],
                               ascending=[False, True]).head(k)
            .reset_index(drop=True)[["bigram", "c_xy", "pmi_r6"]])

def doc_length_gini(sf_dir: str):
    """Per-language Gini coefficient of document length — the
    inequality measure curation dashboards put next to mean/median.
    Exact-integer core: with x sorted ascending and 1-based ranks i,
    Gini = (2·Σi·x_i − (n+1)·Σx) / (n·Σx); runs of equal values
    commute (a run of value v over ranks a..b contributes v·Σ(a..b)
    regardless of internal order), so the whole numerator is decided
    by the VALUE-CARDINALITY count table — the same tiered
    (lang, n_chars, cnt) rollup the rank operators use, never a
    per-row sort.  Only the final ratio goes double (6-dp contract,
    identical CAST composition in the oracle)."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["lang", "n_chars"], as_index=False).size()
               .rename(columns={"size": "cnt"}))
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"lang": object, "n_chars": np.int64, "cnt": np.int64}
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby(["lang", "n_chars"], as_index=False)["cnt"]
                  .sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby(["lang", "n_chars"])
            .aggregate(Sum("cnt", alias_name="cnt")), schema)
    counts = counts.sort_values(["lang", "n_chars"]).reset_index(
        drop=True)
    rows = []
    for lang, g in counts.groupby("lang", sort=True):
        v = g["n_chars"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        sx = int(np.dot(v, c))
        # Σ i·x over each tie run: value · (arithmetic series of its
        # rank range) — exact Python ints, no overflow
        six = 0
        start = 1
        for vi, ci in zip(v.tolist(), c.tolist()):
            six += vi * (ci * (2 * start + ci - 1)) // 2
            start += ci
        gnum = 2 * six - (n + 1) * sx
        rows.append((lang, np.int64(n),
                     np.round(float(gnum) / float(n * sx), 6)))
    return pd.DataFrame(rows, columns=["lang", "n", "gini_r6"])


def cross_lang_dup_matrix(sf_dir: str, threshold: float = 0.5):
    """Cross-lingual contamination matrix: the exact-Jaccard near-dup
    pairs (same shingle/threshold contract as ``ngram_jaccard_pairs``)
    counted per unordered language pair — the curation report that
    tells you whether near-dups leak ACROSS languages (translation
    boilerplate, mirrored sites) or stay within one.  Composition op:
    the distributed dedup operator produces the output-scale pair
    list; each side then picks up its language (broadcast doc→lang
    map below the rank gate, two hash joins above) and a tiny rollup
    finishes."""
    import ray

    from biobloom_ray.stages.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=threshold)
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    meta = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    n_rows = _cheap_count(meta)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        lut = meta.to_pandas().set_index("doc_id")["lang"]
        la = pairs.id_a.map(lut)
        lb = pairs.id_b.map(lut)
    else:
        from biobloom_ray.io import hash_join

        pair_ds = ray.data.from_pandas(
            pairs[["id_a", "id_b"]].astype(np.int64))
        j = hash_join(pair_ds, meta.map_batches(
            lambda b: pa.table({"id_a": b["doc_id"],
                                "lang_a_j": b["lang"]}),
            batch_format="pyarrow"), on=("id_a",))
        j = hash_join(j, meta.map_batches(
            lambda b: pa.table({"id_b": b["doc_id"],
                                "lang_b_j": b["lang"]}),
            batch_format="pyarrow"), on=("id_b",))
        jd = j.to_pandas()
        la, lb = jd["lang_a_j"], jd["lang_b_j"]
    out = pd.DataFrame({
        "lang_lo": np.minimum(la.to_numpy(dtype=object),
                              lb.to_numpy(dtype=object)),
        "lang_hi": np.maximum(la.to_numpy(dtype=object),
                              lb.to_numpy(dtype=object))})
    agg = (out.groupby(["lang_lo", "lang_hi"], as_index=False).size()
           .rename(columns={"size": "n_pairs"}))
    agg["n_pairs"] = agg["n_pairs"].astype(np.int64)
    return agg.sort_values(["lang_lo", "lang_hi"]).reset_index(drop=True)


def nchars_cume_dist(sf_dir: str):
    """Quantile normalization (the CUME_DIST window): each document's
    length mapped to its within-source empirical CDF value — the
    standard way to make quality scores comparable ACROSS sources
    before a global gate.  Same no-global-sort machinery as
    ``nchars_rank_in_source``: the (source, n_chars) count table
    reduces small, turns into ties-INCLUSIVE cumulative counts on the
    driver, and broadcasts back for a map-only attach (hash join above
    the broadcast gate).  cume_r6 = round(cum_incl / n, 6) with the
    same double division the builtin CUME_DIST performs."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source",
                                             "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["source", "n_chars"], as_index=False).size()
               .rename(columns={"size": "cnt"}))
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["source", "n_chars"], as_index=False)["cnt"]
                  .sum())
    else:
        counts = (parts_ds.groupby(["source", "n_chars"])
                  .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
    counts = counts.sort_values(["source", "n_chars"]).reset_index(
        drop=True)
    cum = counts.groupby("source")["cnt"].cumsum().to_numpy(np.int64)
    n_src = counts.groupby("source")["cnt"].transform("sum").to_numpy(
        np.int64)
    counts["cume_r6"] = np.round(cum.astype(np.float64)
                                 / n_src.astype(np.float64), 6)
    import ray

    lookup = counts[["source", "n_chars", "cume_r6"]]
    if len(counts) > RANK_BROADCAST_MAX_ROWS:
        from biobloom_ray.io import hash_join

        out = hash_join(ds, ray.data.from_pandas(lookup),
                        on=("source", "n_chars")).to_pandas()
        return (out.sort_values("doc_id").reset_index(drop=True)
                [["doc_id", "source", "n_chars", "cume_r6"]])
    lookup_ref = ray.put(lookup)

    def attach(b: pa.Table) -> pa.Table:
        cdf = ray.get(lookup_ref)
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        df = df.merge(cdf, on=["source", "n_chars"], how="left")
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "source", "n_chars", "cume_r6"]])

WEEK_SECONDS = 7 * 86400


def cohort_retention(sf_dir: str):
    """Cohort retention matrix (the product-analytics staple): users
    grouped by first-activity week, counted per week-offset of return
    activity.  Two pre-reduced user-grain tables from ONE event scan
    shape — per-user cohort week (native Min groupby above the gate)
    and the deduped (user, week) activity pairs (chained same-prefix
    groupbys) — then a user-grain join (driver merge below the shared
    events gate, hash join above: BOTH sides are user-scale, never
    event-scale) and a tiny (cohort, offset) rollup."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        w = day.to_numpy(zero_copy_only=False) // WEEK_SECONDS
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "w": w})
        agg = df.drop_duplicates()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        uw = _parts_pandas(parts_ds, {"user_id": np.int64,
                                      "w": np.int64}).drop_duplicates()
        cohort = (uw.groupby("user_id", as_index=False)["w"].min()
                  .rename(columns={"w": "cw"}))
        j = uw.merge(cohort, on="user_id")
    else:
        from biobloom_ray.io import hash_join

        uw_ds = (parts_ds.groupby(["user_id", "w"])
                 .aggregate(Count(alias_name="_c"))
                 .map_batches(lambda b: b.drop_columns(["_c"]),
                              batch_format="pyarrow"))
        cohort_ds = (parts_ds.groupby("user_id")
                     .aggregate(Min("w", alias_name="cw")))
        j = hash_join(uw_ds, cohort_ds, on=("user_id",)).to_pandas()
    j["cohort_week"] = j["cw"].astype(np.int64)
    j["offset_week"] = (j["w"] - j["cw"]).astype(np.int64)
    out = (j.groupby(["cohort_week", "offset_week"], as_index=False)
           .size().rename(columns={"size": "n_active"}))
    out["n_active"] = out["n_active"].astype(np.int64)
    return (out.sort_values(["cohort_week", "offset_week"])
            .reset_index(drop=True))


def source_lang_chi2(sf_dir: str):
    """Pearson χ² test of independence between source and lang — the
    drift/balance check a curation pipeline runs before trusting a
    per-source language mix.  The corpus reduces to the tiered
    (source, lang) contingency rollup; expected counts come from the
    margins over the DENSE grid (zero-observed cells included, like
    every textbook χ²), and the statistic is assembled with the same
    left-associative double algebra the oracle spells out.  Output:
    one exact-n row with dof (exact int) and chi2_r6."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "lang": b["lang"].to_pandas()})
        agg = (df.groupby(["source", "lang"], as_index=False).size()
               .rename(columns={"size": "o"}))
        agg["o"] = agg["o"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        obs = (parts_ds.to_pandas()
               .groupby(["source", "lang"], as_index=False)["o"].sum())
    else:
        obs = (parts_ds.groupby(["source", "lang"])
               .aggregate(Sum("o", alias_name="o")).to_pandas())
    piv = (obs.pivot_table(index="source", columns="lang", values="o",
                           fill_value=0, aggfunc="sum")
           .astype(np.int64))
    o = piv.to_numpy(np.int64)
    r = o.sum(axis=1, keepdims=True)
    c = o.sum(axis=0, keepdims=True)
    n = int(o.sum())
    e = (r * c).astype(np.float64) / float(n)
    d = o.astype(np.float64) - e
    chi2 = float((d * d / e).sum())
    dof = (o.shape[0] - 1) * (o.shape[1] - 1)
    return pd.DataFrame({"n": [np.int64(n)], "dof": [np.int64(dof)],
                         "chi2_r6": [np.round(chi2, 6)]})


def name_typo_pairs(sf_dir: str):
    """Edit-distance-1 similarity join — the fuzzy-matching primitive
    (typo variants, OCR noise) — via FastSS deletion-neighborhood
    blocking, the edit-distance analogue of LSH banding: each distinct
    token emits its ≤len position-annotated single-deletion variants
    as blocking keys; ED=1 pairs are exactly (same variant, same
    position) = substitution and (variant of one == the other token)
    = insertion/deletion, so candidates are verified by construction
    and NO quadratic all-pairs comparison ever runs (the oracle is the
    literal all-pairs levenshtein join).  Tokens come from a tiered
    distinct-vocab rollup over customer names; blocking/bucketing
    happens on vocab scale, not row scale."""
    ds = _read(sf_dir, "customer", columns=["c_name"])

    def vocab_partial(b: pa.Table) -> pa.Table:
        s = b["c_name"].to_pandas()
        toks = s.str.findall(r"\S+").explode().dropna().unique()
        return pa.table({"w": pa.array(toks.astype(str),
                                       type=pa.string())})

    parts_ds = ds.map_batches(vocab_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        vocab = _parts_pandas(parts_ds, {"w": object}).w.unique()
    else:
        vocab = (parts_ds.groupby("w")
                 .aggregate(Count(alias_name="_c"))
                 .to_pandas().w.to_numpy(dtype=object))
    vocab = np.sort(vocab.astype(object))
    # deletion-neighborhood keys, vectorized over the vocab table:
    # one frame of (variant, pos, w); pos=-1 marks the token itself
    lens = np.char.str_len(vocab.astype(str))
    max_len = int(lens.max()) if len(lens) else 0
    frames = [pd.DataFrame({"v": vocab, "pos": -1, "w": vocab})]
    wser = pd.Series(vocab, dtype=object)
    for i in range(max_len):
        has = lens > i
        sub = wser[has]
        frames.append(pd.DataFrame({
            "v": (sub.str.slice(0, i) + sub.str.slice(i + 1))
                 .to_numpy(dtype=object),
            "pos": i, "w": sub.to_numpy(dtype=object)}))
    keys = pd.concat(frames, ignore_index=True)
    pair_frames = []
    # substitution: same deleted variant at the SAME position — pair
    # enumeration is vectorized per GROUP-SIZE CLASS (bucket sizes are
    # bounded by the alphabet, so each class is a dense (groups, s)
    # matrix hit with one triu_indices gather; no Python pair loop)
    dele = keys[keys.pos >= 0]
    comp = dele.v.str.cat(dele.pos.astype(str), sep="\x00")
    codes, _ = pd.factorize(comp, sort=False)
    order = np.argsort(codes, kind="stable")
    codes_s = codes[order]
    ws_s = dele.w.to_numpy(dtype=object)[order]
    bnd = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1], True])
    sizes = np.diff(bnd)
    for s in np.unique(sizes):
        if s < 2:
            continue
        starts = bnd[:-1][sizes == s]
        mat = ws_s[starts[:, None] + np.arange(s)[None, :]]
        iu, ju = np.triu_indices(s, 1)
        a = mat[:, iu].ravel()
        b2 = mat[:, ju].ravel()
        pair_frames.append(pd.DataFrame({"w1": np.minimum(a, b2),
                                         "w2": np.maximum(a, b2)}))
    # insertion/deletion: someone's deletion equals another full token
    vset = frozenset(vocab.tolist())
    hit = dele[dele.v.isin(vset) & (dele.v != dele.w)]
    if len(hit):
        hv = hit.v.to_numpy(dtype=object)
        hw = hit.w.to_numpy(dtype=object)
        pair_frames.append(pd.DataFrame({"w1": np.minimum(hv, hw),
                                         "w2": np.maximum(hv, hw)}))
    if not pair_frames:
        return pd.DataFrame({"w1": pd.Series([], dtype=object),
                             "w2": pd.Series([], dtype=object)})
    out = (pd.concat(pair_frames, ignore_index=True)
           .drop_duplicates()
           .sort_values(["w1", "w2"]))
    return out.reset_index(drop=True)

def orders_profile(sf_dir: str):
    """Dataset profiler (the deequ/dbt data-quality primitive): one row
    per column of orders with exact row / null / DISTINCT counts.
    Null and row counts are conditional partials (map-only); the exact
    per-column distinct counts reduce through per-block value dedup —
    each block contributes each (column, value) once, then one chained
    groupby counts survivors (driver fold below the shared lineitem
    gate, native chained groupbys above).  Values are canonicalized to
    an injective string key (epoch for timestamps, repr for floats) so
    the distinct CARDINALITY matches COUNT(DISTINCT col) exactly."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    ds = _read(sf_dir, "orders", columns=cols)

    def canon(col, name: str) -> np.ndarray:
        col = col.drop_null()  # SQL COUNT(DISTINCT) ignores NULLs
        if pa.types.is_timestamp(col.type):
            return (col.cast(pa.int64()).to_numpy(zero_copy_only=False)
                    .astype(str))
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            return np.array([repr(x) for x in v], dtype=object)
        return v.astype(str)

    def partial(b: pa.Table) -> pa.Table:
        frames = []
        for name in cols:
            col = b[name]
            nn = int(pc.sum(pc.is_null(col)).as_py() or 0)
            vals = canon(col, name)
            u = np.unique(vals[~pd.isna(vals)] if vals.dtype == object
                          else vals)
            frames.append(pd.DataFrame({
                "col": name, "v": u.astype(object),
                "n_rows": 0, "n_null": 0}))
            frames.append(pd.DataFrame({
                "col": [name], "v": ["\x00rowmeta"],
                "n_rows": [b.num_rows], "n_null": [nn]}))
        df = pd.concat(frames, ignore_index=True)
        agg = df.groupby(["col", "v"], as_index=False).sum()
        agg["n_rows"] = agg["n_rows"].astype(np.int64)
        agg["n_null"] = agg["n_null"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        t = (parts_ds.to_pandas()
             .groupby(["col", "v"], as_index=False).sum())
    else:
        t = (parts_ds.groupby(["col", "v"])
             .aggregate(Sum("n_rows", alias_name="n_rows"),
                        Sum("n_null", alias_name="n_null")).to_pandas())
    meta = t[t.v == "\x00rowmeta"]
    vals = t[t.v != "\x00rowmeta"]
    out = (vals.groupby("col", as_index=False).size()
           .rename(columns={"size": "n_distinct"}))
    out = out.merge(
        meta.groupby("col", as_index=False)[["n_rows", "n_null"]]
        .sum(), on="col")
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_null"] = out["n_null"].astype(np.int64)
    return (out.sort_values("col").reset_index(drop=True)
            [["col", "n_rows", "n_null", "n_distinct"]])


QUALITY_RULES = (
    ("totalprice_positive", "o_totalprice > 0"),
    ("custkey_not_null", "o_custkey IS NOT NULL"),
    ("status_in_domain", "o_orderstatus IN ('O', 'F', 'P')"),
    ("orderdate_in_range",
     "o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND"
     " TIMESTAMP '2000-01-01'"),
)


def orders_quality_checks(sf_dir: str):
    """Constraint-suite validation (deequ/Great-Expectations shape):
    each declared rule gets exact pass/fail counts in ONE map-only
    scan of conditional partials + a rule-count-sized reduce — no rule
    triggers its own pass over the data.  The oracle evaluates the
    same predicates via UNION ALL."""
    ds = _read(sf_dir, "orders",
               columns=["o_totalprice", "o_custkey", "o_orderstatus",
                        "o_orderdate"])
    lo = pd.Timestamp("1995-01-01").value
    hi = pd.Timestamp("2000-01-01").value

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        price = b["o_totalprice"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"]
        st = b["o_orderstatus"]
        od = (b["o_orderdate"].cast(pa.timestamp("ns"))
              .cast(pa.int64()).to_numpy(zero_copy_only=False))
        passes = {
            "totalprice_positive": int((price > 0).sum()),
            "custkey_not_null": n - int(pc.sum(pc.is_null(ck)).as_py()
                                        or 0),
            "status_in_domain": int(pc.sum(pc.is_in(
                st, value_set=pa.array(["O", "F", "P"]))).as_py() or 0),
            "orderdate_in_range": int(((od >= lo) & (od <= hi)).sum()),
        }
        names = [r[0] for r in QUALITY_RULES]
        return pa.table({
            "rule": pa.array(names),
            "n_pass": pa.array([passes[r] for r in names],
                               type=pa.int64()),
            "n_rows": pa.array([n] * len(names), type=pa.int64())})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        out = (parts_ds.to_pandas()
               .groupby("rule", as_index=False).sum())
    else:
        out = (parts_ds.groupby("rule")
               .aggregate(Sum("n_pass", alias_name="n_pass"),
                          Sum("n_rows", alias_name="n_rows"))
               .to_pandas())
    out["n_fail"] = (out["n_rows"] - out["n_pass"]).astype(np.int64)
    out["n_pass"] = out["n_pass"].astype(np.int64)
    out = out.drop(columns=["n_rows"])
    return (out.sort_values("rule").reset_index(drop=True)
            [["rule", "n_pass", "n_fail"]])


def acctbal_robust_stats(sf_dir: str):
    """Robust per-nation statistics — MODE (most frequent value,
    smallest-cents tie-break) and MAD (median absolute deviation,
    PERCENTILE_DISC semantics on both medians) over customer balances
    in integer cents.  Everything is decided by the per-nation
    value-cardinality count table: the mode is its argmax, the median
    is a rank walk, and the MAD folds the SAME table by |x − med|
    (counts of equal deviations merge) — no second corpus pass, no
    per-row sort anywhere."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["c_acctbal"].to_numpy(
            zero_copy_only=False))
        df = pd.DataFrame({
            "nationkey": b["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "cents": cents})
        agg = (df.groupby(["nationkey", "cents"], as_index=False)
               .size().rename(columns={"size": "cnt"}))
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["nationkey", "cents"], as_index=False)
                  ["cnt"].sum())
    else:
        counts = (parts_ds.groupby(["nationkey", "cents"])
                  .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())

    def disc_median(v: np.ndarray, c: np.ndarray) -> int:
        # PERCENTILE_DISC(0.5): smallest value with cum count >= n/2
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        # DuckDB PERCENTILE_DISC(0.5) picks rank ceil(0.5 * n) — the
        # same integer-exact ceil rule acctbal_percentiles_per_nation
        # pins against the oracle
        target = -(-n // 2)
        return int(v[np.searchsorted(cum, target)])

    rows = []
    for nk, g in counts.groupby("nationkey", sort=True):
        v = g["cents"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        imax = np.lexsort((v, -c))[0]
        mode = int(v[imax])
        med = disc_median(v, c)
        dev = np.abs(v - med)
        dd = pd.DataFrame({"d": dev, "c": c}).groupby(
            "d", as_index=False)["c"].sum()
        mad = disc_median(dd["d"].to_numpy(np.int64),
                          dd["c"].to_numpy(np.int64))
        rows.append((np.int64(nk), np.int64(n), np.int64(mode),
                     np.int64(med), np.int64(mad)))
    return pd.DataFrame(rows, columns=["nationkey", "n", "mode_cents",
                                       "med_cents", "mad_cents"])

def mg_heavy_tokens(sf_dir: str, k: int = 20, capacity: int = 4096):
    """Misra–Gries heavy hitters — the deterministic counter-based
    twin of ``cms_heavy_hitters`` (sixth mergeable sketch family):
    per-block partial MG summaries merge associatively on the driver
    (#blocks blob rows, like every sketch pipeline here), candidates
    ride along as per-block local top lists.  With ``capacity`` ≥ the
    corpus vocabulary the sketch NEVER truncates and every estimate is
    the exact count under any merge order — the regime the SQL oracle
    pins; the under-count bound N/(capacity+1) in the sketchy regime
    is pytest-pinned in test_sketches.py.  Same candidate caveat as
    the CMS query: per-block top lists can miss a globally-heavy but
    everywhere-locally-light token (documented, inherent to all
    candidate+sketch designs)."""
    from biobloom_ray.hashing import hash_strings
    from biobloom_ray.sketches.misra_gries import MisraGries

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        toks = s.str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        mg = MisraGries(capacity=capacity)
        mg.update(hash_strings(vc.index.tolist()),
                  vc.to_numpy().astype(np.int64))
        cands = vc.head(4 * k)
        return pa.table({
            "kind": pa.array(["mg"] + ["cand"] * len(cands)),
            "token": pa.array([""] + cands.index.astype(str).tolist()),
            "blob": pa.array([mg.serialize()] + [b""] * len(cands),
                             type=pa.large_binary()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = None
    cand_tokens = set()
    for r in rows:
        if r["kind"] == "mg":
            m = MisraGries.deserialize(r["blob"])
            acc = m if acc is None else acc.merge(m)
        else:
            cand_tokens.add(r["token"])
    cand = sorted(cand_tokens)
    from biobloom_ray.hashing import hash_strings as _hs

    est = acc.query(_hs(cand)) if cand else np.empty(0, np.int64)
    df = pd.DataFrame({"token": cand, "est_cnt": est})
    df = df.sort_values(["est_cnt", "token"],
                        ascending=[False, True]).head(k)
    df["est_cnt"] = df["est_cnt"].astype(np.int64)
    return df.reset_index(drop=True)

def diversified_top_docs(sf_dir: str, k: int = 10, per_source: int = 2):
    """Diversified top-k (the sampling-with-source-diversity shape):
    the k longest documents subject to AT MOST ``per_source`` per
    source — the constraint that keeps one giant crawl from filling a
    curated sample.  Per-block partials keep each block's per-source
    top ``per_source`` (a valid pruning: any global winner is a
    per-source winner of its block), the reduce re-applies the window
    rule on the ≤ #blocks·#sources·per_source survivors, then the
    global k picks with the deterministic (n_chars desc, doc_id asc)
    tie-break."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source",
                                             "n_chars"])

    def local_prune(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("source")
                                    .head(per_source),
                                    preserve_index=False)

    pooled = (ds.map_batches(local_prune, batch_format="pyarrow")
              .to_pandas())
    pooled = pooled.sort_values(["source", "n_chars", "doc_id"],
                                ascending=[True, False, True])
    capped = pooled.groupby("source").head(per_source)
    out = capped.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)[["doc_id", "source", "n_chars"]]
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out


DECAY_SCALE_BITS = 40  # ages beyond this contribute < 1 integer unit


def event_decayed_counts(sf_dir: str, half_life_days: int = 1):
    """Exponentially time-decayed counters (the streaming-analytics
    freshness score) with an EXACT-INTEGER core: weight = 2^(−age/h)
    becomes the integer numerator Σ n_d · 2^(S − age_d/h·…) — here
    h = 1 day so each day's bucket contributes cnt · 2^(S − age) with
    S = 40 and ages > S contributing 0 (below int64 resolution, the
    documented truncation) — so the decayed score is a RATIO OF EXACT
    INTEGERS and the oracle hash cannot drift.  The anchor (newest
    day) is itself an output-scale reduce; corpus work is the shared
    tiered (type, day) rollup."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "day_epoch": day.to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["event_type", "day_epoch"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (parts_ds.to_pandas()
                  .groupby(["event_type", "day_epoch"], as_index=False)
                  ["n"].sum())
    else:
        counts = (parts_ds.groupby(["event_type", "day_epoch"])
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    anchor = int(counts["day_epoch"].max())
    age = ((anchor - counts["day_epoch"].to_numpy(np.int64)) // 86400
           // max(half_life_days, 1))
    w = np.where(age <= DECAY_SCALE_BITS,
                 np.left_shift(np.int64(1),
                               (DECAY_SCALE_BITS - np.minimum(
                                   age, DECAY_SCALE_BITS)).astype(
                                   np.int64)),
                 0)
    counts["num"] = counts["n"].to_numpy(np.int64) * w
    out = (counts.groupby("event_type", as_index=False)
           .agg(n_events=("n", "sum"), decay_num=("num", "sum")))
    out["n_events"] = out["n_events"].astype(np.int64)
    out["decay_num"] = out["decay_num"].astype(np.int64)
    out["decayed_r6"] = np.round(
        out["decay_num"].to_numpy(np.float64)
        / float(1 << DECAY_SCALE_BITS), 6)
    return (out.sort_values("event_type").reset_index(drop=True)
            [["event_type", "n_events", "decay_num", "decayed_r6"]])

def latest_events_per_user(sf_dir: str, n: int = 3):
    """Latest-N-per-key compaction — the general form of the
    latest-wins CDC rule (N = 1): each user's ``n`` most recent events
    under the deterministic (ts desc, event_id desc) order.  Per-block
    per-user top-n partials are a VALID pruning (any global survivor
    survives its own block); the pooled reduce — ≤ #blocks·n rows per
    user — re-applies the same window rule.  Timestamps leave as epoch
    nanoseconds so the value hash is integer-exact."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "event_type"])

    def local_prune(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "event_id": b["event_id"].to_numpy(zero_copy_only=False),
            "ts_ns": b["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
                     .to_numpy(zero_copy_only=False),
            "event_type": b["event_type"].to_pandas()})
        df = df.sort_values(["user_id", "ts_ns", "event_id"],
                            ascending=[True, False, False])
        return pa.Table.from_pandas(df.groupby("user_id").head(n),
                                    preserve_index=False)

    pooled = (ds.map_batches(local_prune, batch_format="pyarrow")
              .to_pandas())
    pooled = pooled.sort_values(["user_id", "ts_ns", "event_id"],
                                ascending=[True, False, False])
    out = pooled.groupby("user_id").head(n).copy()
    out["rn"] = (out.groupby("user_id").cumcount() + 1).astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["event_id"] = out["event_id"].astype(np.int64)
    out["ts_ns"] = out["ts_ns"].astype(np.int64)
    return (out.sort_values(["user_id", "rn"]).reset_index(drop=True)
            [["user_id", "rn", "event_id", "ts_ns", "event_type"]])


def event_gap_quantiles(sf_dir: str):
    """Inter-arrival gap quantiles per event type — the crawl
    politeness / burstiness profile: gaps in whole seconds between
    consecutive same-type events of the same user (deterministic
    (ts, event_id) order), reduced to exact PERCENTILE_DISC p50/p90
    per type via the value-cardinality count table (the same
    ceil-rank walk the percentile operators pin).  Per-(user, type)
    histories sort inside one map_groups block — the documented
    per-entity-fits-a-block assumption shared with
    ``events_sessionize``; gap COUNT tables, not gaps, leave the
    shuffle."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "event_id", "ts"])

    def gaps(g: pa.Table) -> pa.Table:
        # lossless μs ints; whole-second gaps by floor division (the
        # oracle floors the SAME μs difference — no truncating cast)
        ts = (g["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        if len(ts) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "gap_s": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        d = np.diff(ts) // 1_000_000
        u, c = np.unique(d, return_counts=True)
        et = g["event_type"][0].as_py()
        return pa.table({"event_type": pa.array([et] * len(u)),
                         "gap_s": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    parts_ds = ds.groupby(["user_id", "event_type"]).map_groups(
        gaps, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"event_type": object, "gap_s": np.int64, "cnt": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby(["event_type", "gap_s"], as_index=False)
                  ["cnt"].sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby(["event_type", "gap_s"])
            .aggregate(Sum("cnt", alias_name="cnt")), schema)
    rows = []
    for et, g in counts.groupby("event_type", sort=True):
        v = g["gap_s"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        nn = int(cum[-1])
        p50 = int(v[np.searchsorted(cum, -(-nn // 2))])
        p90 = int(v[np.searchsorted(cum, -(-9 * nn // 10))])
        rows.append((et, np.int64(nn), np.int64(p50), np.int64(p90)))
    return pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                       "p50_s", "p90_s"])

def rrf_hybrid_topk(sf_dir: str, k: int = 10, pool: int = 20,
                    rrf_const: int = 60):
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.):
    the lexical ranking (BM25 top-``pool``) and the dense ranking
    (brute-force cosine top-``pool`` for the fixed query vector) fuse
    as score = Σ 1/(rrf_const + rank) over the lists a doc appears in.
    Both retrieval stacks are the engine's existing distributed
    operators; the fusion runs on the two pool-sized lists.  Ranks
    come from the 6-dp-ROUNDED retrieval scores (plus id tie-break) so
    rank assignment cannot flip on a last-ulp float difference between
    engines — the oracle ranks the same rounded values."""
    import pyarrow.parquet as pq

    from biobloom_ray.stages.ann import brute_force_topk

    bm = bm25_topk(sf_dir, k=pool)
    bm = bm.sort_values(["bm25_r6", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    bm["r_lex"] = np.arange(1, len(bm) + 1, dtype=np.int64)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    qi = int(np.nonzero(ids == 0)[0][0])
    qv = np.asarray(t["embedding"][qi].as_py(), dtype=np.float64)
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dense = brute_force_topk(emb, qv, k=pool).to_pandas()
    dense["sim_r6"] = np.round(dense["cos_sim"].to_numpy(np.float64), 6)
    dense = dense.sort_values(["sim_r6", "vec_id"],
                              ascending=[False, True]).reset_index(
        drop=True)
    dense["r_den"] = np.arange(1, len(dense) + 1, dtype=np.int64)
    dense = dense.rename(columns={"vec_id": "doc_id"})

    fused = bm[["doc_id", "r_lex"]].merge(
        dense[["doc_id", "r_den"]], on="doc_id", how="outer")
    a = np.where(fused.r_lex.notna(),
                 1.0 / (rrf_const + fused.r_lex.fillna(0).to_numpy(
                     np.float64)), 0.0)
    b = np.where(fused.r_den.notna(),
                 1.0 / (rrf_const + fused.r_den.fillna(0).to_numpy(
                     np.float64)), 0.0)
    fused["rrf_r6"] = np.round(a + b, 6)
    fused["doc_id"] = fused["doc_id"].astype(np.int64)
    out = fused.sort_values(["rrf_r6", "doc_id"],
                            ascending=[False, True]).head(k)
    return out.reset_index(drop=True)[["doc_id", "rrf_r6"]]


def grouped_split_counts(sf_dir: str):
    """No-leakage train/val/test split: every SOURCE (not document)
    lands in exactly one split — the grouping that keeps near-dups
    within a crawl from straddling splits — assigned by the md5 hex of
    the source name (0-b → train, c-d → val, e-f → test; md5 is the
    repo's SQL-replayable verification hash, and it runs on the
    OUTPUT-scale distinct-source list, never per document).  Output:
    per split, the source count and document count.  Corpus work is
    one tiered (source) count rollup."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["source"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": b["source"].to_pandas()})
        agg = (df.groupby("source", as_index=False).size()
               .rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"source": object, "n": np.int64}
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby("source", as_index=False)["n"].sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby("source")
            .aggregate(Sum("n", alias_name="n")), schema)

    def split_of(s: str) -> str:
        h = hashlib.md5(s.encode()).hexdigest()[0]
        if h in "0123456789ab":
            return "train"
        if h in "cd":
            return "val"
        return "test"

    counts["split"] = counts["source"].map(split_of)
    out = (counts.groupby("split", as_index=False)
           .agg(n_sources=("source", "size"), n_docs=("n", "sum")))
    out["n_sources"] = out["n_sources"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("split").reset_index(drop=True)

def user_bfs_hops(sf_dir: str, max_hops: int = 3):
    """Multi-round BSP graph traversal — BFS hop counts from the
    lowest-id user over the co-presence graph (users sharing a
    (minute, user) activity cell), the iterative-frontier shape
    connected components (dup_clusters) doesn't exercise.  Edges come
    from ONE deduped (minute, user) rollup + per-cell pair expansion
    (cells are bounded by per-minute activity — documented, same
    class as the LSH bucket assumption); each BSP round is a
    frontier⋈edges hash join + anti-join against the visited set on
    the cluster path, or one numpy adjacency pass on the driver below
    the shared events gate.  Oracle: a bounded recursive CTE taking
    MIN(hop)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cell_partial(b: pa.Table) -> pa.Table:
        minute = (pc.floor_temporal(b["ts"], unit="minute")
                  .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "cell": minute.to_numpy(zero_copy_only=False),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    n_rows = _cheap_count(ds)
    seed_df = _parts_pandas(
        ds.map_batches(
            lambda b: pa.table({"m": pa.array(
                [int(b["user_id"].to_numpy(
                    zero_copy_only=False).min())]
                if b.num_rows else [], type=pa.int64())}),
            batch_format="pyarrow"), {"m": np.int64})
    if len(seed_df) == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "hop": pd.Series([], dtype=np.int64)})
    seed = int(seed_df.m.min())

    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        # driver tier: ONE Dataset pass (the deduped cell partials);
        # pair expansion and the whole BSP run on the cell-scale table
        cdf = (_parts_pandas(
            ds.map_batches(cell_partial, batch_format="pyarrow"),
            {"cell": np.int64, "user_id": np.int64})
            .drop_duplicates().sort_values(["cell", "user_id"]))
        adj: dict = {}
        for _cell, g in cdf.groupby("cell", sort=False):
            u = g["user_id"].to_numpy(np.int64)
            if len(u) < 2:
                continue
            su = set(u.tolist())
            for x in u.tolist():
                s = adj.setdefault(x, set())
                s |= su
        for x, s in adj.items():
            s.discard(x)
        hop_of = {seed: 0}
        frontier = {seed}
        for h in range(1, max_hops + 1):
            nxt = set()
            for u in frontier:
                nxt |= adj.get(u, set())
            nxt -= hop_of.keys()
            for u in nxt:
                hop_of[u] = h
            frontier = nxt
            if not frontier:
                break
        out = pd.DataFrame(sorted(hop_of.items()),
                           columns=["user_id", "hop"])
        out["user_id"] = out["user_id"].astype(np.int64)
        out["hop"] = out["hop"].astype(np.int64)
        return out

    # cluster tier: deduped cell rollup → per-cell pair expansion →
    # edge dedup, then BSP rounds as Dataset joins — frontier⋈edges
    # for the next frontier, left_anti against visited to dedup
    import ray

    from biobloom_ray.io import hash_join

    cells = (ds.map_batches(cell_partial, batch_format="pyarrow")
             .groupby(["cell", "user_id"])
             .aggregate(Count(alias_name="_c")))

    def pair_expand(g: pa.Table) -> pa.Table:
        u = np.unique(g["user_id"].to_numpy(zero_copy_only=False))
        if len(u) < 2:
            return pa.table({"ua": pa.array([], pa.int64()),
                             "ub": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(len(u), 1)
        a, b2 = u[iu], u[ju]
        return pa.table({"ua": pa.array(np.r_[a, b2]),
                         "ub": pa.array(np.r_[b2, a])})

    edges = (cells.groupby("cell")
             .map_groups(pair_expand, batch_format="pyarrow")
             .groupby(["ua", "ub"]).aggregate(Count(alias_name="_c")))
    edges_m = edges.map_batches(
        lambda b: b.drop_columns(["_c"]), batch_format="pyarrow"
    ).materialize()
    visited = pd.DataFrame({"user_id": [seed],
                            "hop": np.int64(0)})
    frontier_ds = ray.data.from_pandas(
        pd.DataFrame({"ua": pd.Series([seed], dtype=np.int64)}))
    for h in range(1, max_hops + 1):
        nxt = hash_join(edges_m, frontier_ds, on=("ua",))
        nxt = nxt.map_batches(
            lambda b: pa.table({"user_id": b["ub"]}),
            batch_format="pyarrow")
        nxt = (nxt.groupby("user_id").aggregate(Count(alias_name="_c"))
               .map_batches(lambda b: b.drop_columns(["_c"]),
                            batch_format="pyarrow"))
        vis_ds = ray.data.from_pandas(visited[["user_id"]])
        nxt = hash_join(nxt, vis_ds, on=("user_id",),
                        join_type="left_anti")
        ndf = _parts_pandas(nxt, {"user_id": np.int64})
        if len(ndf) == 0:
            break
        ndf = ndf.drop_duplicates()
        ndf["hop"] = np.int64(h)
        visited = pd.concat([visited, ndf], ignore_index=True)
        frontier_ds = ray.data.from_pandas(
            ndf[["user_id"]].rename(columns={"user_id": "ua"}))
    out = visited.sort_values("user_id").reset_index(drop=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["hop"] = out["hop"].astype(np.int64)
    return out


def top_session_journeys(sf_dir: str, k: int = 10):
    """Session journey mining: the k most common event-type paths
    (">"-joined, deterministic (ts, event_id) order) across the same
    30-min-gap sessions the sessionize operator defines — the "what do
    users actually do" report.  Per-user map_groups emits one row per
    SESSION (output-scale); journey-count partials reduce through the
    shared events tier and a top-k finishes."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                          "event_type"])
    gap_ns = 30 * 60 * 1_000_000_000

    def journeys(g: pa.Table) -> pa.Table:
        ts = (g["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, et = ts[order], et[order]
        if len(ts) == 0:
            return pa.table({"journey": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        new_s = np.empty(len(ts), dtype=bool)
        new_s[0] = True
        new_s[1:] = np.diff(ts) > gap_ns
        sid = np.cumsum(new_s) - 1
        df = pd.DataFrame({"sid": sid, "et": et})
        j = df.groupby("sid")["et"].agg(">".join)
        vc = j.value_counts()
        return pa.table({"journey": pa.array(vc.index.astype(str)),
                         "cnt": pa.array(vc.to_numpy().astype(
                             np.int64))})

    parts_ds = ds.groupby("user_id").map_groups(
        journeys, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"journey": object, "cnt": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby("journey", as_index=False)["cnt"].sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby("journey")
            .aggregate(Sum("cnt", alias_name="cnt")), schema)
    out = counts.sort_values(["cnt", "journey"],
                             ascending=[False, True]).head(k)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.reset_index(drop=True)[["journey", "cnt"]]

def weighted_sample_topk(sf_dir: str, k: int = 20):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each doc draws u = (splitmix64(doc_id)+1)/2^64 and ranks by
    key = ln(u)/w with weight w = n_chars — the top-k keys are a
    weighted sample with inclusion ∝ weight, fixed size, no
    replacement (the fixed-k twin of the Bernoulli
    ``quality_weighted_sample``).  Deterministic and engine-replayable:
    u is the bit-exact splitmix64 the sampler family already replays
    in HUGEINT SQL, and the ln/divide composition is spelled
    identically in the oracle; map-only block top-k partials + one
    k-sized reduce."""
    from biobloom_ray.hashing import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def local_topk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        z = splitmix64(ids.astype(np.uint64)).astype(np.float64)
        u = (z + 1.0) / 18446744073709551616.0
        key = np.log(u) / w  # in (-inf, 0); larger = more likely kept
        order = np.lexsort((ids, -key))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order].astype(np.int64)),
            "n_chars": pa.array(b["n_chars"].to_numpy(
                zero_copy_only=False)[order].astype(np.int64)),
            "key": pa.array(key[order])})

    pooled = (ds.map_batches(local_topk, batch_format="pyarrow")
              .to_pandas())
    pooled = pooled.sort_values(["key", "doc_id"],
                                ascending=[False, True]).head(k)
    return (pooled.reset_index(drop=True)[["doc_id", "n_chars"]]
            .astype(np.int64))


def event_value_ffill_hourly(sf_dir: str):
    """Time-series resampling with forward fill (the LAST_VALUE IGNORE
    NULLS window): per event type, the DENSE hourly grid of
    cents aggregates (exact-integer sum/count carried separately),
    where an hour with no events inherits the most recent previous
    hour's aggregate — the
    gap-repair step before any rolling model sees the series.  Corpus
    work is the shared tiered (type, hour) rollup; the grid + fill run
    on the output-scale table."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        hour = (pc.floor_temporal(b["ts"], unit="hour")
                .cast(pa.timestamp("s")).cast(pa.int64()))
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "hour_epoch": hour.to_numpy(zero_copy_only=False),
            "sum_cents": cents,
            "n": np.ones(len(cents), dtype=np.int64)})
        agg = (df.groupby(["event_type", "hour_epoch"], as_index=False)
               .sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"event_type": object, "hour_epoch": np.int64,
              "sum_cents": np.int64, "n": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby(["event_type", "hour_epoch"], as_index=False)
                  .sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby(["event_type", "hour_epoch"])
            .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                       Sum("n", alias_name="n")), schema)
    if len(counts) == 0:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "hour_epoch": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "filled": pd.Series([], dtype=np.int64)})
    days = np.arange(counts.hour_epoch.min(),
                     counts.hour_epoch.max() + 1, 3600, dtype=np.int64)
    types = np.sort(counts.event_type.unique())
    grid = pd.MultiIndex.from_product(
        [types, days], names=["event_type", "hour_epoch"]).to_frame(
        index=False)
    out = grid.merge(counts, on=["event_type", "hour_epoch"],
                     how="left")
    out["filled"] = out["sum_cents"].isna().astype(np.int64)
    out = out.sort_values(["event_type", "hour_epoch"])
    g = out.groupby("event_type")
    out["sum_cents"] = (g["sum_cents"].ffill().fillna(0)
                        .astype(np.int64))
    out["n"] = g["n"].ffill().fillna(0).astype(np.int64)
    out["hour_epoch"] = out["hour_epoch"].astype(np.int64)
    return (out.reset_index(drop=True)
            [["event_type", "hour_epoch", "sum_cents", "n", "filled"]])

def sketch_setops_report(sf_dir: str, type_a: str = "click",
                         type_b: str = "purchase"):
    """Approximate SET ALGEBRA on sketches — the sketch-library
    counterpart of ``event_user_setops``: per-block HLL and Bloom
    partials for the two per-type user sets merge associatively
    (#blocks blob rows to the driver, like every sketch pipeline),
    then |A|, |B| and |A∪B| come from HLL, |A∩B| from
    inclusion–exclusion, and a second intersection estimate from the
    bitwise-AND Bloom via Swamidass–Baldi occupancy inversion.  No SQL
    oracle can exist for sketch outputs; the exact twin
    (``event_user_setops``) pins every estimate inside its published
    bound in ``test_sketches.py``."""
    from biobloom_ray.hashing import splitmix64
    from biobloom_ray.sketches.bloom import BloomFilter
    from biobloom_ray.sketches.hll import HLL

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    M_BITS, H_NUM, P = 1 << 16, 4, 12
    C2 = np.uint64(0x9E3779B97F4A7C15)

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        et = b["event_type"].to_numpy(zero_copy_only=False).astype(
            object)
        kinds, blobs = [], []
        for t, tag in ((type_a, "a"), (type_b, "b")):
            u = np.unique(uid[et == t])
            h1 = splitmix64(u)
            with np.errstate(over="ignore"):
                h2 = splitmix64(u ^ C2)
            hll = HLL(p=P)
            hll.update(h1)
            bf = BloomFilter(m=M_BITS, hash_num=H_NUM, kmer_size=0,
                             filter_id=tag)
            bf.insert(h1, h2)
            kinds += [f"{tag}_hll", f"{tag}_bf"]
            blobs += [hll.serialize(), bf.serialize()]
        return pa.table({"kind": pa.array(kinds),
                         "blob": pa.array(blobs,
                                          type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    hlls, bfs = {}, {}
    for r in rows:
        tag = r["kind"][0]
        if r["kind"].endswith("_hll"):
            s = HLL.deserialize(r["blob"])
            hlls[tag] = s if tag not in hlls else hlls[tag].merge(s)
        else:
            s = BloomFilter.deserialize(r["blob"])
            bfs[tag] = s if tag not in bfs else bfs[tag].merge(s)
    est_a = hlls["a"].estimate()
    est_b = hlls["b"].estimate()
    union = HLL.deserialize(hlls["a"].serialize()).merge(hlls["b"])
    est_u = union.estimate()
    est_inter_hll = est_a + est_b - est_u
    inter_bf = bfs["a"].intersect(bfs["b"])
    est_inter_bloom = inter_bf.estimate_cardinality()
    return pd.DataFrame({
        "est_a": [est_a], "est_b": [est_b], "est_union": [est_u],
        "est_inter_hll": [est_inter_hll],
        "est_inter_bloom": [est_inter_bloom]})

def zorder_bucket_counts(sf_dir: str, bits: int = 8):
    """Z-order (Morton) space-filling-curve bucketing — the
    data-layout primitive behind Delta/Iceberg Z-ORDER clustering:
    interleave the low ``bits`` bits of the two cluster dimensions
    (user_id mod 2^bits, absolute hour mod 2^bits) and bucket by the
    TOP byte of the curve position, so rows close in BOTH dimensions
    land in the same bucket/file.  Map-only exact-integer kernel (16
    shift/mask terms, no Python loop); the oracle spells the identical
    interleave arithmetic.  Output: rows per bucket — the file-size
    histogram a layout job would write."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    mask = (1 << bits) - 1

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        hour = (pc.floor_temporal(b["ts"], unit="hour")
                .cast(pa.timestamp("s")).cast(pa.int64())
                .to_numpy(zero_copy_only=False)) // 3600
        x = uid & mask
        y = hour & mask
        z = np.zeros(len(x), dtype=np.int64)
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        bucket = z >> bits  # top byte of the 2·bits-bit curve position
        df = pd.DataFrame({"bucket": bucket})
        agg = (df.groupby("bucket", as_index=False).size()
               .rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"bucket": np.int64, "n": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        out = (_parts_pandas(parts_ds, schema)
               .groupby("bucket", as_index=False)["n"].sum())
    else:
        out = _parts_pandas(
            parts_ds.groupby("bucket")
            .aggregate(Sum("n", alias_name="n")), schema)
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def funnel_latency_quantiles(sf_dir: str):
    """Funnel conversion LATENCY: across users whose first 'view'
    precedes (or equals) their first 'purchase', the exact
    PERCENTILE_DISC p50/p90 of the view→purchase delay in whole
    seconds.  One tiered per-(user) Min rollup per stage (the same
    first-touch minima the funnel operator uses), then the latency
    count table drives the ceil-rank walk — corpus work is one
    pre-reduced shuffle, the quantiles run on value-cardinality
    scale."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "event_type": b["event_type"].to_pandas(),
            "us": us.to_numpy(zero_copy_only=False)})
        df = df[df.event_type.isin(["view", "purchase"])]
        agg = (df.groupby(["user_id", "event_type"], as_index=False)
               ["us"].min())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"user_id": np.int64, "event_type": object,
              "us": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        m = (_parts_pandas(parts_ds, schema)
             .groupby(["user_id", "event_type"], as_index=False)
             ["us"].min())
    else:
        m = _parts_pandas(
            parts_ds.groupby(["user_id", "event_type"])
            .aggregate(Min("us", alias_name="us")), schema)
    piv = m.pivot_table(index="user_id", columns="event_type",
                        values="us", aggfunc="min")
    if "view" not in piv.columns or "purchase" not in piv.columns:
        return pd.DataFrame({"n_converted": [np.int64(0)],
                             "p50_s": [np.int64(0)],
                             "p90_s": [np.int64(0)]})
    both = piv.dropna(subset=["view", "purchase"])
    lat = ((both["purchase"].to_numpy(np.int64)
            - both["view"].to_numpy(np.int64)))
    lat = lat[lat >= 0] // 1_000_000
    if len(lat) == 0:
        return pd.DataFrame({"n_converted": [np.int64(0)],
                             "p50_s": [np.int64(0)],
                             "p90_s": [np.int64(0)]})
    v, c = np.unique(lat, return_counts=True)
    cum = np.cumsum(c)
    n = int(cum[-1])
    p50 = int(v[np.searchsorted(cum, -(-n // 2))])
    p90 = int(v[np.searchsorted(cum, -(-9 * n // 10))])
    return pd.DataFrame({"n_converted": [np.int64(n)],
                         "p50_s": [np.int64(p50)],
                         "p90_s": [np.int64(p90)]})

def lang_nchars_tdigest(sf_dir: str, qs=(0.5, 0.9)):
    """GROUPED sketch quantiles: one mergeable t-digest per language
    over document length — per-block (lang, digest-blob) partials, a
    per-lang blob merge (groupby(lang).map_groups over #blocks·#langs
    sketch rows), estimates per requested quantile.  Rows-only (sketch
    output); pytest pins each estimate inside the published t-digest
    band against the exact per-lang PERCENTILE_DISC."""
    from biobloom_ray.sketches.tdigest import TDigest

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "n": b["n_chars"].to_numpy(zero_copy_only=False)})
        langs, blobs = [], []
        for lang, g in df.groupby("lang"):
            td = TDigest()
            td.update(g["n"].to_numpy(np.float64))
            langs.append(lang)
            blobs.append(td.serialize())
        return pa.table({"lang": pa.array(langs),
                         "blob": pa.array(blobs,
                                          type=pa.large_binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        from biobloom_ray.sketches.tdigest import TDigest as TD

        acc = TD.deserialize(g["blob"].iloc[0])
        for blob in g["blob"].iloc[1:]:
            acc.merge(TD.deserialize(blob))
        row = {"lang": [g["lang"].iloc[0]]}
        for q in qs:
            row[f"p{int(q * 100)}_est"] = [acc.quantile(q)]
        return pd.DataFrame(row)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang").map_groups(merge, batch_format="pandas")
           .to_pandas())
    return out.sort_values("lang").reset_index(drop=True)


def nchars_robust_outliers(sf_dir: str):
    """Robust outlier detection (modified z-score, Iglewicz–Hoaglin):
    per language, count documents whose length deviates from the
    PERCENTILE_DISC median by more than 3.5 robust sigmas — evaluated
    as the EXACT INTEGER cross-multiplication
    ``1349·|x − med| > 7000·MAD`` (0.6745→1349/2000, 3.5→7000/2000),
    so no float boundary can flip a flag.  med and MAD come from the
    same value-cardinality count table the robust-stats operator uses;
    the flag pass is decided on that table too (counts of equal
    lengths flag together) — no second corpus scan."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["lang", "n_chars"], as_index=False).size()
               .rename(columns={"size": "cnt"}))
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"lang": object, "n_chars": np.int64, "cnt": np.int64}
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, schema)
                  .groupby(["lang", "n_chars"], as_index=False)["cnt"]
                  .sum())
    else:
        counts = _parts_pandas(
            parts_ds.groupby(["lang", "n_chars"])
            .aggregate(Sum("cnt", alias_name="cnt")), schema)

    def disc(v: np.ndarray, c: np.ndarray, num: int, den: int) -> int:
        cum = np.cumsum(c)
        n = int(cum[-1])
        return int(v[np.searchsorted(cum, -(-num * n // den))])

    rows = []
    for lang, g in counts.groupby("lang", sort=True):
        g = g.sort_values("n_chars")
        v = g["n_chars"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        med = disc(v, c, 1, 2)
        dev = np.abs(v - med)
        dd = (pd.DataFrame({"d": dev, "c": c})
              .groupby("d", as_index=False)["c"].sum()
              .sort_values("d"))
        mad = disc(dd["d"].to_numpy(np.int64),
                   dd["c"].to_numpy(np.int64), 1, 2)
        flag = 1349 * dev > 7000 * mad
        rows.append((lang, np.int64(int(c.sum())),
                     np.int64(med), np.int64(mad),
                     np.int64(int(c[flag].sum()))))
    return pd.DataFrame(rows, columns=["lang", "n", "med", "mad",
                                       "n_outliers"])

def source_dup_report(sf_dir: str, threshold: float = 0.6):
    """Per-source near-dup rate — the curation report that tells you
    WHICH crawl is polluting the corpus: the production MinHash-LSH
    dedup (same keep-lowest-id contract as ``minhash_dedup_kept``)
    decides the drop set, each doc picks up its source, and a tiny
    rollup emits docs / dropped / 6-dp dup-rate per source.  At
    fixture scale every near-dup pair's Jaccard is far from the
    threshold, so the exact-shingle SQL drop set provably equals the
    LSH drop set (the argument the kept-set oracle documents) and the
    report is DuckDB-oracled end-to-end."""
    from biobloom_ray.stages.dedup import minhash_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept = set(minhash_dedup(docs, threshold=threshold)
               .select_columns(["doc_id"]).to_pandas().doc_id)
    meta = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False),
            "source": b["source"].to_pandas()})
        df["dropped"] = (~df.doc_id.isin(kept)).astype(np.int64)
        agg = (df.groupby("source", as_index=False)
               .agg(n_docs=("doc_id", "size"),
                    n_dropped=("dropped", "sum")))
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        agg["n_dropped"] = agg["n_dropped"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = meta.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(meta)
    schema = {"source": object, "n_docs": np.int64,
              "n_dropped": np.int64}
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        out = (_parts_pandas(parts_ds, schema)
               .groupby("source", as_index=False).sum())
    else:
        out = _parts_pandas(
            parts_ds.groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_dropped", alias_name="n_dropped")),
            schema)
    out["dup_rate_r6"] = np.round(
        out["n_dropped"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64), 6)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_dropped"] = out["n_dropped"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def returning_users_daily(sf_dir: str):
    """Consecutive-period overlap (the day-over-day RETENTION line):
    for every day d (except the first), how many users were active on
    BOTH d−1 and d.  The deduped (user, day) activity table self-joins
    on the derived day+1 key — both sides are the SAME pre-reduced
    user-day rollup, so the shuffle moves activity rows, never events;
    below the shared gate the overlap is one driver merge."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "day_epoch": day.to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    schema = {"user_id": np.int64, "day_epoch": np.int64}
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        uw = _parts_pandas(parts_ds, schema).drop_duplicates()
        nxt = uw.copy()
        nxt["day_epoch"] = nxt["day_epoch"] + 86400
        j = uw.merge(nxt, on=["user_id", "day_epoch"])
    else:
        from biobloom_ray.io import hash_join

        uw_ds = (parts_ds.groupby(["user_id", "day_epoch"])
                 .aggregate(Count(alias_name="_c"))
                 .map_batches(lambda b: b.drop_columns(["_c"]),
                              batch_format="pyarrow")).materialize()
        nxt_ds = uw_ds.map_batches(
            lambda b: pa.table({
                "user_id": b["user_id"],
                "day_epoch": pc.add(b["day_epoch"], 86400)}),
            batch_format="pyarrow")
        j = _parts_pandas(hash_join(uw_ds, nxt_ds,
                                    on=("user_id", "day_epoch")),
                          schema)
    out = (j.groupby("day_epoch", as_index=False).size()
           .rename(columns={"size": "n_returning"}))
    out["day_epoch"] = out["day_epoch"].astype(np.int64)
    out["n_returning"] = out["n_returning"].astype(np.int64)
    return out.sort_values("day_epoch").reset_index(drop=True)


# -- round-4 wave 27: TPC-H join-graph trio (Q7 / Q14 / Q10 shapes) ----------

def nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape — cross-nation trade volume: revenue between
    every (supplier nation, customer nation) pair with DIFFERENT
    nations.  Two dimension paths meet on the fact table: suppkey→
    supp-nation rides as a sorted-array broadcast (searchsorted per
    block, no shuffle), custkey→cust-nation travels through orders.
    Below the orders gate the orderkey→cust-nation link also
    broadcasts and lineitem reduces map-side straight to ≤nations²
    rows per block (ZERO shuffle on the fact table); above it,
    orders ⋈ customer hash-joins, the supplier-tagged lineitem
    partial hash-joins the link on orderkey, and a native Sum groupby
    finishes over (snat, cnat) partials.  Revenue is exact integer
    10⁻⁴-dollar units (cents × (100 − disc-cents))."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    name_of_nat = dict(zip(nation.n_nationkey.astype(np.int64),
                           nation.n_name))
    # supplier dim: sorted key/value arrays once in plasma, probed with
    # one searchsorted per block (supplier ≪ lineitem at every sf)
    so = np.argsort(supp.s_suppkey.to_numpy())
    supp_ref = ray.put((supp.s_suppkey.to_numpy(np.int64)[so],
                        supp.s_nationkey.to_numpy(np.int64)[so]))
    # composite (snat, cnat) code for the bincount partial
    NAT_BASE = int(nation.n_nationkey.max()) + 1

    def pair_partial(okeys_sorted, cnat_sorted):
        def fn(b: pa.Table) -> pa.Table:
            sk_keys, sk_nat = ray.get(supp_ref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(okeys_sorted) == 0 or len(lk) == 0:
                return pa.table({"code": pa.array([], pa.int64()),
                                 "revenue_e4": pa.array([], pa.int64()),
                                 "n_items": pa.array([], pa.int64())})
            pos = np.searchsorted(okeys_sorted, lk)
            pos[pos >= len(okeys_sorted)] = 0
            hit = okeys_sorted[pos] == lk
            sk = b["l_suppkey"].to_numpy(zero_copy_only=False)[hit]
            spos = np.searchsorted(sk_keys, sk)
            spos[spos >= len(sk_keys)] = 0
            snat = sk_nat[spos]
            cnat = cnat_sorted[pos[hit]]
            keep = snat != cnat
            cents = _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))[hit][keep]
            disc = _cents_away(
                b["l_discount"].to_numpy(zero_copy_only=False))[hit][keep]
            rev = cents * (100 - disc)
            code = snat[keep] * NAT_BASE + cnat[keep]
            if len(code) == 0:
                return pa.table({"code": pa.array([], pa.int64()),
                                 "revenue_e4": pa.array([], pa.int64()),
                                 "n_items": pa.array([], pa.int64())})
            nbins = NAT_BASE * NAT_BASE
            n_per = np.bincount(code, minlength=nbins)
            rev_per = np.zeros(nbins, dtype=np.int64)
            np.add.at(rev_per, code, rev)
            nz = np.nonzero(n_per)[0]
            return pa.table({"code": pa.array(nz.astype(np.int64)),
                             "revenue_e4": pa.array(rev_per[nz]),
                             "n_items": pa.array(n_per[nz].astype(np.int64))})
        return fn

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= ANTI_BROADCAST_MAX_ROWS:
        od = orders.to_pandas()
        cd = cust.to_pandas()
        nat_of_cust = dict(zip(cd.c_custkey.astype(np.int64),
                               cd.c_nationkey.astype(np.int64)))
        cnat = od.o_custkey.map(nat_of_cust).to_numpy(np.int64)
        order_ = np.argsort(od.o_orderkey.to_numpy())
        parts = li.map_batches(
            pair_partial(od.o_orderkey.to_numpy(np.int64)[order_],
                         cnat[order_]),
            batch_format="pyarrow").to_pandas()
        agg = (parts.groupby("code", as_index=False)
               [["revenue_e4", "n_items"]].sum())
    else:
        link = hash_join(orders, cust, on=("o_custkey",),
                         right_on=("c_custkey",))

        def tag_snat(b: pa.Table) -> pa.Table:
            sk_keys, sk_nat = ray.get(supp_ref)
            sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
            spos = np.searchsorted(sk_keys, sk)
            spos[spos >= len(sk_keys)] = 0
            cents = _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))
            disc = _cents_away(
                b["l_discount"].to_numpy(zero_copy_only=False))
            return pa.table({"l_orderkey": b["l_orderkey"],
                             "snat": pa.array(sk_nat[spos]),
                             "rev": pa.array(cents * (100 - disc))})

        li_tag = li.map_batches(tag_snat, batch_format="pyarrow")
        joined = hash_join(li_tag, link, on=("l_orderkey",),
                           right_on=("o_orderkey",))

        def pair_rollup(b: pa.Table) -> pa.Table:
            snat = b["snat"].to_numpy(zero_copy_only=False)
            cnat = b["c_nationkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            keep = snat != cnat
            code = snat[keep] * NAT_BASE + cnat[keep]
            rev = b["rev"].to_numpy(zero_copy_only=False)[keep]
            if len(code) == 0:
                return pa.table({"code": pa.array([], pa.int64()),
                                 "revenue_e4": pa.array([], pa.int64()),
                                 "n_items": pa.array([], pa.int64())})
            nbins = NAT_BASE * NAT_BASE
            n_per = np.bincount(code, minlength=nbins)
            rev_per = np.zeros(nbins, dtype=np.int64)
            np.add.at(rev_per, code, rev)
            nz = np.nonzero(n_per)[0]
            return pa.table({"code": pa.array(nz.astype(np.int64)),
                             "revenue_e4": pa.array(rev_per[nz]),
                             "n_items": pa.array(n_per[nz].astype(np.int64))})

        agg = (joined.map_batches(pair_rollup, batch_format="pyarrow")
               .groupby("code")
               .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                          Sum("n_items", alias_name="n_items"))
               .to_pandas())
    agg["supp_nation"] = (agg.code // NAT_BASE).map(name_of_nat)
    agg["cust_nation"] = (agg.code % NAT_BASE).map(name_of_nat)
    agg["revenue_e4"] = agg["revenue_e4"].astype(np.int64)
    agg["n_items"] = agg["n_items"].astype(np.int64)
    return (agg[["supp_nation", "cust_nation", "revenue_e4", "n_items"]]
            .sort_values(["supp_nation", "cust_nation"])
            .reset_index(drop=True))


def promo_revenue_share(sf_dir: str, promo_type: str = "PROMO"):
    """TPC-H Q14 shape — per ship-month promotional revenue share.
    The part dimension collapses to a sorted promo-flag array
    broadcast once (searchsorted per block); lineitem reduces
    map-side to (month, promo?) partials — at most 2·months rows per
    block, zero fact-table shuffle at every tier (driver fold below
    the lineitem gate, native Sum groupby above).  Numerator and
    denominator stay exact integer 10⁻⁴-dollar units; only the final
    output-scale share divides (6-dp contract)."""
    import ray

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    po = np.argsort(part.p_partkey.to_numpy())
    part_ref = ray.put((
        part.p_partkey.to_numpy(np.int64)[po],
        (part.p_type.to_numpy() == promo_type)[po]))

    def partial(b: pa.Table) -> pa.Table:
        pk_keys, pk_promo = ray.get(part_ref)
        month = (pc.floor_temporal(b["l_shipdate"], unit="month")
                 .cast(pa.timestamp("s")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_keys, pk)
        pos[pos >= len(pk_keys)] = 0
        promo = pk_promo[pos] & (pk_keys[pos] == pk)
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        rev = cents * (100 - disc)
        df = pd.DataFrame({"month_epoch": month, "promo": promo,
                           "rev": rev})
        agg = (df.groupby(["month_epoch", "promo"], as_index=False)
               .agg(rev=("rev", "sum"), n=("rev", "size")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)
    schema = {"month_epoch": np.int64, "promo": np.bool_,
              "rev": np.int64, "n": np.int64}
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        parts = _parts_pandas(parts_ds, schema)
    else:
        parts = (parts_ds.groupby(["month_epoch", "promo"])
                 .aggregate(Sum("rev", alias_name="rev"),
                            Sum("n", alias_name="n")).to_pandas())
    agg = parts.groupby(["month_epoch", "promo"], as_index=False).sum()
    piv = agg.pivot_table(index="month_epoch", columns="promo",
                          values="rev", aggfunc="sum", fill_value=0)
    out = pd.DataFrame({"month_epoch": piv.index.to_numpy(np.int64)})
    promo_rev = (piv[True].to_numpy(np.int64) if True in piv.columns
                 else np.zeros(len(piv), np.int64))
    other_rev = (piv[False].to_numpy(np.int64) if False in piv.columns
                 else np.zeros(len(piv), np.int64))
    out["promo_rev_e4"] = promo_rev
    out["total_rev_e4"] = promo_rev + other_rev
    out["promo_share_r6"] = np.round(
        promo_rev.astype(np.float64) / out.total_rev_e4.to_numpy(np.float64),
        6)
    return out.sort_values("month_epoch").reset_index(drop=True)


def top_returned_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape — top-k customers by RETURNED-item revenue
    (l_returnflag = 'R'), nation name attached.  Lineitem pre-reduces
    per block to (orderkey, rev) partials on the filtered rows;
    below the orders gate the orderkey→custkey link broadcasts and
    the rollup folds on the driver; above it the partial hash-joins
    orders and a native Sum groupby over custkey finishes, with a
    per-block exact top-k on the disjoint-key post-groupby blocks so
    only ≤k·#blocks candidate rows reach the driver.  Names attach
    via pruned broadcast reads on the ≤k-row result."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        lk = b["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))[m]
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))[m]
        rev = cents * (100 - disc)
        df = pd.DataFrame({"l_orderkey": lk, "rev": rev})
        agg = (df.groupby("l_orderkey", as_index=False)
               .agg(rev=("rev", "sum"), n_items=("rev", "size")))
        agg["n_items"] = agg["n_items"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(partial, batch_format="pyarrow")
    n_ord = _cheap_count(orders)
    schema = {"l_orderkey": np.int64, "rev": np.int64, "n_items": np.int64}
    if n_ord is not None and n_ord <= ANTI_BROADCAST_MAX_ROWS:
        od = orders.to_pandas()
        cust_of = dict(zip(od.o_orderkey.astype(np.int64),
                           od.o_custkey.astype(np.int64)))
        parts = _parts_pandas(parts_ds, schema)
        parts["c_custkey"] = parts.l_orderkey.map(cust_of).astype(np.int64)
        agg = (parts.groupby("c_custkey", as_index=False)
               [["rev", "n_items"]].sum())
        top = (agg.sort_values(["rev", "c_custkey"],
                               ascending=[False, True]).head(k))
    else:
        joined = hash_join(parts_ds, orders, on=("l_orderkey",),
                           right_on=("o_orderkey",))

        def cust_rollup(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "c_custkey": b["o_custkey"].to_numpy(zero_copy_only=False),
                "rev": b["rev"].to_numpy(zero_copy_only=False),
                "n_items": b["n_items"].to_numpy(zero_copy_only=False)})
            agg = (df.groupby("c_custkey", as_index=False)
                   [["rev", "n_items"]].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        summed = (joined.map_batches(cust_rollup, batch_format="pyarrow")
                  .groupby("c_custkey")
                  .aggregate(Sum("rev", alias_name="rev"),
                             Sum("n_items", alias_name="n_items")))

        def local_topk(b: pa.Table) -> pa.Table:
            rv = b["rev"].to_numpy(zero_copy_only=False)
            keys = b["c_custkey"].to_numpy(zero_copy_only=False)
            ni = b["n_items"].to_numpy(zero_copy_only=False)
            idx = np.lexsort((keys, -rv))[:k]
            return pa.table({"c_custkey": pa.array(keys[idx]),
                             "rev": pa.array(rv[idx]),
                             "n_items": pa.array(ni[idx])})

        top = (summed.map_batches(local_topk, batch_format="pyarrow")
               .to_pandas()
               .sort_values(["rev", "c_custkey"],
                            ascending=[False, True]).head(k))
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    meta = cust.merge(nation, left_on="c_nationkey",
                      right_on="n_nationkey")
    top = top.reset_index(drop=True)
    top = top.merge(meta[["c_custkey", "c_name", "n_name"]], on="c_custkey",
                    how="left")
    top["revenue_e4"] = top["rev"].astype(np.int64)
    top["n_items"] = top["n_items"].astype(np.int64)
    return top[["c_custkey", "c_name", "n_name", "revenue_e4", "n_items"]]


# -- round-4 wave 28: graph analytics (PageRank / triangles) + integrity ----

def _copresence_cells(sf_dir: str):
    """Deduped (minute, user) activity cells — the shared edge source
    for the co-presence graph family (BFS / PageRank / triangles)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cell_partial(b: pa.Table) -> pa.Table:
        minute = (pc.floor_temporal(b["ts"], unit="minute")
                  .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "cell": minute.to_numpy(zero_copy_only=False),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    return ds, ds.map_batches(cell_partial, batch_format="pyarrow")


def _copresence_edges_ds(cells_parts):
    """Cluster-tier distinct directed edge Dataset from cell partials:
    dedup rollup → per-cell pair expansion (cells bounded by
    per-minute activity, the documented LSH-bucket-class assumption)
    → edge dedup.  Both directions are emitted."""
    cells = (cells_parts.groupby(["cell", "user_id"])
             .aggregate(Count(alias_name="_c")))

    def pair_expand(g: pa.Table) -> pa.Table:
        u = np.unique(g["user_id"].to_numpy(zero_copy_only=False))
        if len(u) < 2:
            return pa.table({"ua": pa.array([], pa.int64()),
                             "ub": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(len(u), 1)
        a, b2 = u[iu], u[ju]
        return pa.table({"ua": pa.array(np.r_[a, b2]),
                         "ub": pa.array(np.r_[b2, a])})

    return (cells.groupby("cell")
            .map_groups(pair_expand, batch_format="pyarrow")
            .groupby(["ua", "ub"]).aggregate(Count(alias_name="_c"))
            .map_batches(lambda b: b.drop_columns(["_c"]),
                         batch_format="pyarrow"))


def user_pagerank(sf_dir: str, n_iter: int = 3, damping: float = 0.85):
    """PageRank over the user co-presence graph, n_iter synchronous
    power iterations from the uniform vector (the BSP iterate the
    BFS frontier walk doesn't exercise: every round re-weights EVERY
    node, not just a frontier).  Driver tier (below the shared events
    gate): one Dataset pass for the deduped cells, then factorized
    numpy bincount iterations.  Cluster tier: the distinct-edge
    Dataset stays resident; each iteration is ONE edges⋈rank hash
    join → (dst, pr/deg) partial rollup → native Sum groupby → one
    rank⋈degree join — rank/degree tables are node-scale, edges never
    leave the cluster.  Isolated users (no co-presence partner) are
    outside the graph by construction, exactly as in the oracle's
    edge-derived node set.  Scores carry a 6-dp contract; degree and
    node count are exact."""
    ds, cells_parts = _copresence_cells(sf_dir)
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        cdf = (_parts_pandas(cells_parts,
                             {"cell": np.int64, "user_id": np.int64})
               .drop_duplicates())
        j = cdf.merge(cdf, on="cell", suffixes=("_a", "_b"))
        j = j[j.user_id_a != j.user_id_b]
        e = (j[["user_id_a", "user_id_b"]].drop_duplicates())
        if len(e) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "degree": pd.Series([], dtype=np.int64),
                "pr_r6": pd.Series([], dtype=np.float64)})
        nodes, src = np.unique(e.user_id_a.to_numpy(np.int64),
                               return_inverse=True)
        dst = np.searchsorted(nodes, e.user_id_b.to_numpy(np.int64))
        n = len(nodes)
        deg = np.bincount(src, minlength=n).astype(np.int64)
        pr = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            contrib = pr[src] / deg[src]
            inflow = np.bincount(dst, weights=contrib, minlength=n)
            pr = (1.0 - damping) / n + damping * inflow
        return pd.DataFrame({
            "user_id": nodes, "degree": deg,
            "pr_r6": np.round(pr, 6)})

    # cluster tier: resident edge Dataset + per-iteration join rounds
    from biobloom_ray.io import hash_join

    edges_m = _copresence_edges_ds(cells_parts).materialize()
    deg_ds = (edges_m.groupby("ua").aggregate(Count(alias_name="degree"))
              .materialize())
    n = _cheap_count(deg_ds) or deg_ds.count()

    rank = deg_ds.map_batches(
        lambda b: pa.table({"u": b["ua"],
                            "pr": pa.array(np.full(b.num_rows, 1.0 / n)),
                            "degree": b["degree"]}),
        batch_format="pyarrow")
    for _ in range(n_iter):
        contrib = hash_join(edges_m, rank, on=("ua",), right_on=("u",))

        def to_contrib(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "u": b["ub"].to_numpy(zero_copy_only=False),
                "c": b["pr"].to_numpy(zero_copy_only=False)
                / b["degree"].to_numpy(zero_copy_only=False)})
            agg = df.groupby("u", as_index=False)["c"].sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

        inflow = (contrib.map_batches(to_contrib, batch_format="pyarrow")
                  .groupby("u").aggregate(Sum("c", alias_name="c")))
        joined = hash_join(inflow, deg_ds, on=("u",), right_on=("ua",))
        base = (1.0 - damping) / n
        rank = joined.map_batches(
            lambda b, _base=base: pa.table({
                "u": b["u"],
                "pr": pa.array(_base + damping * b["c"]
                               .to_numpy(zero_copy_only=False)),
                "degree": b["degree"]}),
            batch_format="pyarrow")
    out = rank.to_pandas()
    out["pr_r6"] = np.round(out.pr.to_numpy(np.float64), 6)
    out["user_id"] = out.u.astype(np.int64)
    out["degree"] = out.degree.astype(np.int64)
    return (out[["user_id", "degree", "pr_r6"]]
            .sort_values("user_id").reset_index(drop=True))


def user_triangle_stats(sf_dir: str):
    """Global triangle census of the co-presence graph: node/edge
    counts, wedge count Σ d(d−1)/2, triangle count via the canonical
    a<b<c two-hop join, and the global clustering coefficient
    3·Δ/wedges (6-dp contract; counts exact).  Driver tier: two
    pandas merges on the cell-scale edge table.  Cluster tier: the
    canonical edge Dataset self-joins on the wedge midpoint, the
    open wedge closes against a third edge join, and per-block COUNT
    partials fold — triangles are never materialized row-per-row on
    the driver."""
    ds, cells_parts = _copresence_cells(sf_dir)
    n_rows = _cheap_count(ds)

    def stats_from(n_nodes, n_edges, wedges, tri):
        gcc = float(np.round(3.0 * tri / wedges, 6)) if wedges else 0.0
        return pd.DataFrame({
            "n_nodes": [np.int64(n_nodes)],
            "n_edges": [np.int64(n_edges)],
            "n_wedges": [np.int64(wedges)],
            "n_triangles": [np.int64(tri)],
            "gcc_r6": [gcc]})

    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        cdf = (_parts_pandas(cells_parts,
                             {"cell": np.int64, "user_id": np.int64})
               .drop_duplicates())
        j = cdf.merge(cdf, on="cell", suffixes=("_a", "_b"))
        j = j[j.user_id_a < j.user_id_b]
        e = (j[["user_id_a", "user_id_b"]].drop_duplicates()
             .rename(columns={"user_id_a": "ua", "user_id_b": "ub"}))
        if len(e) == 0:
            return stats_from(0, 0, 0, 0)
        nodes, ia = np.unique(
            np.r_[e.ua.to_numpy(np.int64), e.ub.to_numpy(np.int64)],
            return_inverse=True)
        n = len(nodes)
        deg = np.bincount(ia, minlength=n).astype(np.int64)
        wedges = int((deg * (deg - 1) // 2).sum())
        src, dst = ia[:len(e)], ia[len(e):]
        if n <= 4096:
            # dense adjacency: Δ = Σ (A²∘A)/6 — one float64 matmul
            # (counts ≪ 2^53, exact) beats the two merges ~20×
            A = np.zeros((n, n), dtype=np.float64)
            A[src, dst] = 1.0
            A[dst, src] = 1.0
            tri = int(round(((A @ A) * A).sum() / 6.0))
        else:
            ed = pd.DataFrame({"ua": src, "ub": dst})
            w = ed.merge(ed, left_on="ub", right_on="ua",
                         suffixes=("_1", "_2"))
            tri = len(w.merge(ed, left_on=["ua_1", "ub_2"],
                              right_on=["ua", "ub"]))
        return stats_from(n, len(e), wedges, tri)

    from biobloom_ray.io import hash_join

    edges_dir = _copresence_edges_ds(cells_parts).materialize()
    canon = edges_dir.map_batches(
        lambda b: b.filter(pc.less(b["ua"], b["ub"])),
        batch_format="pyarrow").materialize()
    n_edges = canon.count()
    degs = (edges_dir.groupby("ua").aggregate(Count(alias_name="d"))
            .to_pandas())
    n_nodes = len(degs)
    d = degs.d.to_numpy(np.int64)
    wedges = int((d * (d - 1) // 2).sum())
    w = hash_join(canon, canon, on=("ub",), right_on=("ua",),
                  left_suffix="_1", right_suffix="_2")
    w = w.map_batches(
        lambda b: pa.table({"ua": b["ua"], "ub": b["ub_2"]}),
        batch_format="pyarrow")
    closed = hash_join(w, canon, on=("ua", "ub"))
    tri_parts = closed.map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    tri = int(tri_parts.n.sum()) if len(tri_parts) else 0
    return stats_from(n_nodes, n_edges, wedges, tri)


def table_fingerprint(sf_dir: str):
    """Order-invariant per-source content fingerprint of the documents
    table — the anti-entropy / resumable-write integrity check: any
    changed, dropped or duplicated row flips the per-source XOR of a
    60-bit md5 prefix over the CANONICAL row string
    ``doc_id|lang|n_chars|text``.  XOR is commutative-associative, so
    block partials (one (source, xor, n) row per block per source —
    output-scale like every sketch partial) fold in any order with no
    gate; md5 is inherently per-item (same class as the codec loop).
    The oracle replays the exact hash: DuckDB ``md5`` + hex-prefix
    cast."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        lang = b["lang"].to_pylist()
        nch = b["n_chars"].to_numpy(zero_copy_only=False)
        txt = b["text"].to_pylist()
        src = b["source"].to_pylist()
        fp = np.fromiter(
            (int(hashlib.md5(
                f"{d}|{l}|{nc}|{t}".encode("utf-8")).hexdigest()[:15], 16)
             for d, l, nc, t in zip(doc, lang, nch, txt)),
            dtype=np.int64, count=len(doc))
        df = pd.DataFrame({"source": src, "fp": fp})
        agg = (df.groupby("source", as_index=False)
               .agg(fp60=("fp", lambda s: np.bitwise_xor.reduce(
                   s.to_numpy(np.int64))),
                    n_rows=("fp", "size")))
        agg["n_rows"] = agg["n_rows"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars", "text", "source"])
    parts = _parts_pandas(ds.map_batches(partial, batch_format="pyarrow"),
                          {"source": object, "fp60": np.int64,
                           "n_rows": np.int64})
    out = (parts.groupby("source", as_index=False)
           .agg(n_rows=("n_rows", "sum"),
                fp60=("fp60", lambda s: np.bitwise_xor.reduce(
                    s.to_numpy(np.int64)))))
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["fp60"] = out["fp60"].astype(np.int64)
    return (out[["source", "n_rows", "fp60"]]
            .sort_values("source").reset_index(drop=True))


# -- round-4 wave 29: retrieval-join + webtext readability/charclass --------

def term_overlap_topk(sf_dir: str, df_lo: int = 2, df_hi: int = 400):
    """Sparse lexical retrieval as an INDEX SELF-JOIN: for every doc,
    the best other doc by integer term-frequency dot product
    Σ_t tf_a(t)·tf_b(t) over the df-banded vocabulary (df in
    [df_lo, df_hi] — the inverted_index banding idea, which bounds
    every posting list and hence every token's pair expansion at
    df_hi² ≪ corpus²).  All scores are exact int64 (no float ranking
    anywhere); ties break to the smaller doc id.  Cluster tier: tf
    rows semi-join the banded vocab, ONE groupby(token) pair
    expansion, native Sum over (da, db), per-group top-1.  Driver
    tier below the shared gate folds the same tf partials in
    pandas."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tf_ds = ds.map_batches(_doc_term_tf, batch_format="pyarrow")
    n_rows = _cheap_count(ds)

    def best_of(pairs: pd.DataFrame) -> pd.DataFrame:
        out = (pairs.sort_values(["da", "dot", "db"],
                                 ascending=[True, False, True])
               .drop_duplicates("da"))
        return pd.DataFrame({
            "doc_id": out.da.to_numpy(np.int64),
            "best_doc": out.db.to_numpy(np.int64),
            "dot": out["dot"].to_numpy(np.int64)})

    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        tf = _parts_pandas(tf_ds, {"doc_id": np.int64, "token": object,
                                   "tf": np.int64})
        dfc = tf.groupby("token", as_index=False).size()
        band = dfc[(dfc["size"] >= df_lo) & (dfc["size"] <= df_hi)]
        tfb = tf[tf.token.isin(set(band.token))]
        j = tfb.merge(tfb, on="token", suffixes=("_a", "_b"))
        j = j[j.doc_id_a != j.doc_id_b]
        if len(j) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "best_doc": pd.Series([], dtype=np.int64),
                "dot": pd.Series([], dtype=np.int64)})
        j["dot"] = j.tf_a.to_numpy(np.int64) * j.tf_b.to_numpy(np.int64)
        pairs = (j.groupby(["doc_id_a", "doc_id_b"], as_index=False)
                 ["dot"].sum()
                 .rename(columns={"doc_id_a": "da", "doc_id_b": "db"}))
        return best_of(pairs).sort_values("doc_id").reset_index(drop=True)

    from biobloom_ray.io import hash_join

    dfc = tf_ds.groupby("token").aggregate(Count(alias_name="df"))
    band = dfc.map_batches(
        lambda b: pa.table({"token": b["token"].filter(pa.array(
            (b["df"].to_numpy(zero_copy_only=False) >= df_lo)
            & (b["df"].to_numpy(zero_copy_only=False) <= df_hi)))}),
        batch_format="pyarrow")
    tfb = hash_join(tf_ds, band, on=("token",))

    def pair_expand(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        t = g["tf"].to_numpy(zero_copy_only=False)
        if len(d) < 2:
            return pa.table({"da": pa.array([], pa.int64()),
                             "db": pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(len(d), 1)
        a, b2 = d[iu], d[ju]
        w = t[iu] * t[ju]
        return pa.table({"da": pa.array(np.r_[a, b2]),
                         "db": pa.array(np.r_[b2, a]),
                         "dot": pa.array(np.r_[w, w])})

    pairs_ds = (tfb.groupby("token")
                .map_groups(pair_expand, batch_format="pyarrow")
                .groupby(["da", "db"]).aggregate(Sum("dot",
                                                     alias_name="dot")))

    def top1(g: pa.Table) -> pa.Table:
        dot = g["dot"].to_numpy(zero_copy_only=False)
        db = g["db"].to_numpy(zero_copy_only=False)
        i = np.lexsort((db, -dot))[0]
        return pa.table({"doc_id": pa.array([g["da"][0].as_py()],
                                            pa.int64()),
                         "best_doc": pa.array([int(db[i])], pa.int64()),
                         "dot": pa.array([int(dot[i])], pa.int64())})

    out = (pairs_ds.groupby("da").map_groups(top1, batch_format="pyarrow")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def readability_scores(sf_dir: str):
    """Flesch-reading-ease-style readability per document, from three
    vectorized regex counts (words = \\S+ runs, sentences = [.!?]+
    runs clamped to ≥1, syllable proxy = [aeiouyAEIOUY]+ vowel
    groups): 206.835 − 1.015·(W/S) − 84.6·(V/W).  Counts are exact
    int64; the score carries the 6-dp contract.  Map-only — no
    shuffle at any scale; docs with zero words are excluded (score
    undefined), exactly as in the oracle's WHERE."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        w = pc.count_substring_regex(b["text"], r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(b["text"], r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = pc.count_substring_regex(b["text"], r"[aeiouyAEIOUY]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w > 0
        w, v = w[keep], v[keep]
        s = np.maximum(s[keep], 1)
        fl = 206.835 - 1.015 * (w / s) - 84.6 * (v / w)
        return pa.table({
            "doc_id": b["doc_id"].filter(pa.array(keep)),
            "n_words": pa.array(w), "n_sentences": pa.array(s),
            "n_vowel_groups": pa.array(v),
            "flesch_r6": pa.array(np.round(fl, 6))})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def charclass_stats(sf_dir: str):
    """Per-language character-class profile — mojibake / boilerplate
    drift signal: exact counts of total, digit [0-9], upper [A-Z]
    and whitespace (\\s) characters, plus 6-dp ratios.  Per-block
    (lang, sums) partials pre-reduce map-side; tiered combine (driver
    fold below the shared gate, native Sum groupby above)."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        tot = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dig = pc.count_substring_regex(b["text"], r"[0-9]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        upp = pc.count_substring_regex(b["text"], r"[A-Z]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ws = pc.count_substring_regex(b["text"], r"\s") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"lang": b["lang"].to_pandas(), "n_chars": tot,
                           "n_digit": dig, "n_upper": upp, "n_ws": ws})
        agg = (df.groupby("lang", as_index=False)
               [["n_chars", "n_digit", "n_upper", "n_ws"]].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    cols = ["n_chars", "n_digit", "n_upper", "n_ws"]
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds,
                             {"lang": object, **{c: np.int64
                                                 for c in cols}})
               .groupby("lang", as_index=False)[cols].sum())
    else:
        agg = (parts_ds.groupby("lang")
               .aggregate(*[Sum(c, alias_name=c) for c in cols])
               .to_pandas())
    for c in cols:
        agg[c] = agg[c].astype(np.int64)
    tot = agg.n_chars.to_numpy(np.float64)
    agg["digit_ratio_r6"] = np.round(agg.n_digit.to_numpy() / tot, 6)
    agg["upper_ratio_r6"] = np.round(agg.n_upper.to_numpy() / tot, 6)
    agg["ws_ratio_r6"] = np.round(agg.n_ws.to_numpy() / tot, 6)
    return agg.sort_values("lang").reset_index(drop=True)


# -- round-4 wave 30: range partitioner + CUSUM + seasonal profile ----------

def range_shard_bounds(sf_dir: str, n_shards: int = 8):
    """Equi-depth RANGE PARTITIONER — the primitive behind every
    distributed sort / range-partitioned write: exact k-quantile cut
    points over event value cents and the resulting per-shard row
    counts.  KEY INSIGHT (same as value_decile_stats): cuts and shard
    populations are decided by the VALUE-CARDINALITY count table
    alone — the corpus reduces to (cents → n) partials (driver fold
    below the shared events gate, native Sum groupby above) and the
    bound walk runs on the value-domain-bounded table.  Cut i is the
    smallest cents whose cumulative count ≥ ⌈i·N/k⌉ (exact integer
    ceiling); a row's shard is the number of cuts < its cents, so
    equal values never split across shards (the property a
    range-partitioned write needs for deterministic resume)."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds, {"cents": np.int64,
                                           "n": np.int64})
                  .groupby("cents", as_index=False)["n"].sum())
    else:
        counts = (parts_ds.groupby("cents")
                  .aggregate(Sum("n", alias_name="n")).to_pandas())
    counts = counts.sort_values("cents").reset_index(drop=True)
    if len(counts) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ["shard", "n_rows", "min_cents",
                                       "max_cents"]})
    cents = counts.cents.to_numpy(np.int64)
    n = counts.n.to_numpy(np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1])
    cuts = np.array(
        [cents[np.searchsorted(cum, (i * total + n_shards - 1)
                               // n_shards)]
         for i in range(1, n_shards)], dtype=np.int64)
    shard = np.searchsorted(cuts, cents, side="left").astype(np.int64)
    df = pd.DataFrame({"shard": shard, "cents": cents, "n": n})
    out = (df.groupby("shard", as_index=False)
           .agg(n_rows=("n", "sum"), min_cents=("cents", "min"),
                max_cents=("cents", "max")))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("shard").reset_index(drop=True)


def cusum_changepoints(sf_dir: str):
    """Change-point detection per event type over the daily count
    series — EXACT-INTEGER CUSUM: the walk accumulates
    S_d = Σ (x_d·D − total)  (the textbook cusum of deviations from
    the mean, scaled by the day count D so nothing is ever a float),
    and the change point is the day with max |S_d| (ties → earliest
    day).  The corpus reduces to the (type, day) rollup (tiered);
    the prefix walk runs on the output-scale series table."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "day_epoch": day.to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["event_type", "day_epoch"], as_index=False)
               .size().rename(columns={"size": "x"}))
        agg["x"] = agg["x"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds,
                               {"event_type": object,
                                "day_epoch": np.int64, "x": np.int64})
                 .groupby(["event_type", "day_epoch"], as_index=False)
                 ["x"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day_epoch"])
                 .aggregate(Sum("x", alias_name="x")).to_pandas())
    rows = []
    for et, g in daily.sort_values("day_epoch").groupby("event_type"):
        x = g.x.to_numpy(np.int64)
        days = g.day_epoch.to_numpy(np.int64)
        tot, nd = int(x.sum()), len(x)
        cus = np.cumsum(x * nd - tot)
        i = np.lexsort((days, -np.abs(cus)))[0]
        rows.append((et, int(days[i]), int(abs(cus[i])), nd))
    out = pd.DataFrame(rows, columns=["event_type", "cp_day_epoch",
                                      "max_abs_cusum", "n_days"])
    for c in ["cp_day_epoch", "max_abs_cusum", "n_days"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def hour_of_day_profile(sf_dir: str):
    """Cyclic seasonal profile: per (event_type, hour-of-day 0–23)
    event count, exact value-cents sum, and the hour's share of the
    type's total (6-dp, computed AFTER the global sums).  Per-block
    partials pre-reduce to ≤ types×24 rows; tiered combine."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        hod = pc.hour(b["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "hod": hod, "cents": cents})
        agg = (df.groupby(["event_type", "hod"], as_index=False)
               .agg(n=("cents", "size"), sum_cents=("cents", "sum")))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds,
                             {"event_type": object, "hod": np.int64,
                              "n": np.int64, "sum_cents": np.int64})
               .groupby(["event_type", "hod"], as_index=False)
               [["n", "sum_cents"]].sum())
    else:
        agg = (parts_ds.groupby(["event_type", "hod"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("sum_cents", alias_name="sum_cents"))
               .to_pandas())
    agg["n"] = agg["n"].astype(np.int64)
    agg["sum_cents"] = agg["sum_cents"].astype(np.int64)
    tot = agg.groupby("event_type")["n"].transform("sum")
    agg["share_r6"] = np.round(agg.n.to_numpy(np.float64)
                               / tot.to_numpy(np.float64), 6)
    return (agg.sort_values(["event_type", "hod"])
            .reset_index(drop=True))


# -- round-4 wave 31: distinct-over-join / sketch join-size / PCA -----------

def supplier_part_coverage(sf_dir: str):
    """TPC-H Q16 shape — per (brand, type): distinct suppliers,
    distinct parts, and distinct (part, supplier) pair count observed
    in lineitem.  The fact table reduces per block to distinct
    (partkey, suppkey) pairs; below the gate the driver folds them
    with the part dims broadcast; above it ONE native pair dedup
    groupby, a hash join against the pruned part table, and two
    disjoint-key distinct rollups finish — every shuffled row is a
    narrow pair, never a lineitem."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_type"])

    def pair_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    pairs_ds = li.map_batches(pair_partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)

    def finish(tagged: pd.DataFrame) -> pd.DataFrame:
        out = (tagged.groupby(["p_brand", "p_type"], as_index=False)
               .agg(n_suppliers=("sk", "nunique"),
                    n_parts=("pk", "nunique"),
                    n_pairs=("sk", "size")))
        for c in ["n_suppliers", "n_parts", "n_pairs"]:
            out[c] = out[c].astype(np.int64)
        return (out.sort_values(["p_brand", "p_type"])
                .reset_index(drop=True))

    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        pairs = (_parts_pandas(pairs_ds, {"pk": np.int64, "sk": np.int64})
                 .drop_duplicates())
        pd_ = part.to_pandas()
        tagged = pairs.merge(pd_, left_on="pk", right_on="p_partkey")
        return finish(tagged)

    from biobloom_ray.io import hash_join

    dedup = (pairs_ds.groupby(["pk", "sk"])
             .aggregate(Count(alias_name="_c"))
             .map_batches(lambda b: b.drop_columns(["_c"]),
                          batch_format="pyarrow"))
    tagged = hash_join(dedup, part, on=("pk",), right_on=("p_partkey",))

    def bt_partial(cols):
        def fn(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({c: (b[c].to_pandas() if c.startswith("p_")
                                   else b[c].to_numpy(
                                       zero_copy_only=False))
                               for c in cols})
            return pa.Table.from_pandas(df.drop_duplicates(),
                                        preserve_index=False)
        return fn

    # the tagged pair table is already distinct on (pk, sk); the two
    # distinct rollups dedup on their own key then count per group
    sup = (tagged.map_batches(bt_partial(["p_brand", "p_type", "sk"]),
                              batch_format="pyarrow")
           .groupby(["p_brand", "p_type", "sk"])
           .aggregate(Count(alias_name="_c"))
           .map_batches(lambda b: pa.table({
               "p_brand": b["p_brand"], "p_type": b["p_type"],
               "one": pa.array(np.ones(b.num_rows, np.int64))}),
               batch_format="pyarrow")
           .groupby(["p_brand", "p_type"])
           .aggregate(Sum("one", alias_name="n_suppliers")).to_pandas())
    prt = (tagged.map_batches(bt_partial(["p_brand", "p_type", "pk"]),
                              batch_format="pyarrow")
           .groupby(["p_brand", "p_type", "pk"])
           .aggregate(Count(alias_name="_c"))
           .map_batches(lambda b: pa.table({
               "p_brand": b["p_brand"], "p_type": b["p_type"],
               "one": pa.array(np.ones(b.num_rows, np.int64))}),
               batch_format="pyarrow")
           .groupby(["p_brand", "p_type"])
           .aggregate(Sum("one", alias_name="n_parts")).to_pandas())
    npair = (tagged.map_batches(
        lambda b: pa.table({"p_brand": b["p_brand"],
                            "p_type": b["p_type"],
                            "one": pa.array(np.ones(b.num_rows,
                                                    np.int64))}),
        batch_format="pyarrow")
        .groupby(["p_brand", "p_type"])
        .aggregate(Sum("one", alias_name="n_pairs")).to_pandas())
    out = (sup.merge(prt, on=["p_brand", "p_type"])
           .merge(npair, on=["p_brand", "p_type"]))
    for c in ["n_suppliers", "n_parts", "n_pairs"]:
        out[c] = out[c].astype(np.int64)
    out = out[["p_brand", "p_type", "n_suppliers", "n_parts", "n_pairs"]]
    return (out.sort_values(["p_brand", "p_type"])
            .reset_index(drop=True))


def _user_type_counts(sf_dir: str, ta: str, tb: str) -> pd.DataFrame:
    """Tiered (user, c_a, c_b) frequency table for the two event-type
    slices — the shared input of the exact and CMS join-size ops."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        m = (et == ta) | (et == tb)
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)[m],
            "is_a": (et[m] == ta).astype(np.int64)})
        agg = (df.groupby("user_id", as_index=False)
               .agg(ca=("is_a", "sum"), n=("is_a", "size")))
        agg["cb"] = (agg.n - agg.ca).astype(np.int64)
        return pa.Table.from_pandas(agg[["user_id", "ca", "cb"]],
                                    preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        return (_parts_pandas(parts_ds,
                              {"user_id": np.int64, "ca": np.int64,
                               "cb": np.int64})
                .groupby("user_id", as_index=False)[["ca", "cb"]].sum())
    return (parts_ds.groupby("user_id")
            .aggregate(Sum("ca", alias_name="ca"),
                       Sum("cb", alias_name="cb")).to_pandas())


def join_size_exact(sf_dir: str, ta: str = "view", tb: str = "purchase"):
    """EXACT equi-join cardinality |σ_{type=a}(events) ⋈_user
    σ_{type=b}(events)| = Σ_u c_a(u)·c_b(u) — the number the query
    planner needs before picking a join strategy.  One tiered
    (user, c_a, c_b) rollup; the Σ of products runs on the user-scale
    table.  All int64-exact."""
    uc = _user_type_counts(sf_dir, ta, tb)
    both = uc[(uc.ca > 0) & (uc.cb > 0)]
    return pd.DataFrame({
        "join_size": [np.int64((both.ca.to_numpy(np.int64)
                                * both.cb.to_numpy(np.int64)).sum())],
        "n_matching_users": [np.int64(len(both))]})


def join_size_cms(sf_dir: str, ta: str = "view", tb: str = "purchase",
                  eps: float = 0.0005, delta: float = 0.01):
    """Sketch-estimated join cardinality: one Count-Min sketch per
    side built from per-block blob partials (associative merge), then
    the Cormode–Muthukrishnan inner-product estimate min_r Σ_j
    a[r,j]·b[r,j].  Guarantees (pytest-pinned): est ≥ exact always,
    est ≤ exact + ε·N_a·N_b w.p. ≥ 1−δ.  The exact twin rides along
    for the error column; at corpus scale only the sketches move."""
    from biobloom_ray.hashing import splitmix64
    from biobloom_ray.sketches.cms import CountMinSketch

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        blobs, kinds = [], []
        for kind, m in (("a", et == ta), ("b", et == tb)):
            cms = CountMinSketch.for_error(eps, delta)
            keys = splitmix64(uid[m])
            cms.update(keys, 1)
            blobs.append(cms.serialize())
            kinds.append(kind)
        return pa.table({"kind": pa.array(kinds),
                         "blob": pa.array(blobs,
                                          type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    sk = {"a": None, "b": None}
    for r in rows:
        c = CountMinSketch.deserialize(r["blob"])
        sk[r["kind"]] = c if sk[r["kind"]] is None \
            else sk[r["kind"]].merge(c)
    est = sk["a"].inner_product(sk["b"]) if sk["a"] and sk["b"] else 0
    exact = int(join_size_exact(sf_dir, ta, tb).join_size.iloc[0])
    na = sk["a"].n if sk["a"] else 0
    nb = sk["b"].n if sk["b"] else 0
    return pd.DataFrame({
        "join_size_cms": [np.int64(est)],
        "join_size_exact": [np.int64(exact)],
        "abs_err": [np.int64(est - exact)],
        "eps_bound": [np.int64(int(np.ceil(eps * na * nb)))]})


def embedding_top_pc(sf_dir: str):
    """Distributed PCA, top principal component: each block
    contributes the moment partials (n, Σx, XᵀX) — d and d² numbers
    per block, never rows — which fold associatively into the exact
    covariance; the d×d eigendecomposition runs on the driver
    (d = embedding dim, data-scale-free — the same driver-matrix
    regime as the k-means centroid update).  Sign fixed by the
    largest-|loading| component.  Output: one row per dimension with
    the 6-dp loading, plus the explained-variance ratio."""
    from biobloom_ray.stages.ann import _matrix

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        m = _matrix(b["embedding"])
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([np.ascontiguousarray(
                m.sum(axis=0)).tobytes()], pa.large_binary()),
            "xtx": pa.array([np.ascontiguousarray(
                m.T @ m).tobytes()], pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return pd.DataFrame({
            "dim": pd.Series([], dtype=np.int64),
            "loading_r6": pd.Series([], dtype=np.float64),
            "explained_var_r6": pd.Series([], dtype=np.float64)})
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"], dtype=np.float64) for r in rows],
               axis=0)
    d = len(s)
    xtx = np.sum([np.frombuffer(r["xtx"],
                                dtype=np.float64).reshape(d, d)
                  for r in rows], axis=0)
    mu = s / n
    cov = xtx / n - np.outer(mu, mu)
    w, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    lam = float(w[-1])
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    evr = lam / float(np.trace(cov))
    return pd.DataFrame({
        "dim": np.arange(d, dtype=np.int64),
        "loading_r6": np.round(v, 6),
        "explained_var_r6": np.round(np.full(d, evr), 6)})


# -- round-4 wave 32: gaps-and-islands / fact-fact SLA / Benford ------------

def user_activity_streaks(sf_dir: str):
    """Gaps-and-islands: per user, the LONGEST run of consecutive
    active days and the number of distinct runs.  The corpus reduces
    to the deduped (user, day) rollup; the island walk is one
    vectorized pass (run starts where user changes or day−prev ≠ 1;
    run ids by cumsum; lengths by bincount) — on the driver below the
    shared gate, inside groupby(user).map_groups above it (per-user
    day lists are calendar-bounded, the documented group-size
    class)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["ts"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "day": day.to_numpy(zero_copy_only=False) // 86400})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)

    def streaks_vec(u: np.ndarray, d: np.ndarray) -> pd.DataFrame:
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
        rid = np.cumsum(new) - 1
        rlen = np.bincount(rid)
        ruser = u[new]
        out = (pd.DataFrame({"user_id": ruser, "len": rlen})
               .groupby("user_id", as_index=False)
               .agg(max_streak_days=("len", "max"),
                    n_runs=("len", "size")))
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        ud = (_parts_pandas(parts_ds, {"user_id": np.int64,
                                       "day": np.int64})
              .drop_duplicates())
        out = streaks_vec(ud.user_id.to_numpy(np.int64),
                          ud.day.to_numpy(np.int64))
        return out.sort_values("user_id").reset_index(drop=True)

    ud_ds = (parts_ds.groupby(["user_id", "day"])
             .aggregate(Count(alias_name="_c")))

    def per_user(g: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            streaks_vec(g["user_id"].to_numpy(zero_copy_only=False),
                        g["day"].to_numpy(zero_copy_only=False)),
            preserve_index=False)

    out = (ud_ds.groupby("user_id")
           .map_groups(per_user, batch_format="pyarrow").to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def order_fill_rate(sf_dir: str, sla_days: int = 7):
    """Fact-to-fact SLA join: per order priority, the fraction of
    orders whose FIRST lineitem ships within ``sla_days`` of the
    order date.  Lineitem pre-reduces per block to (orderkey,
    min-ship-day) — the Min is associative, so the shuffle (native
    Min groupby above the gate, driver fold below) moves one row per
    order at most; the SLA predicate and the priority rollup run on
    the order-scale join (broadcast link below the orders gate, hash
    join above).  Counts exact; rate 6-dp."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])

    def min_partial(b: pa.Table) -> pa.Table:
        day = (pc.floor_temporal(b["l_shipdate"], unit="day")
               .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "ship_day": day.to_numpy(zero_copy_only=False)})
        agg = (df.groupby("l_orderkey", as_index=False)["ship_day"]
               .min())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(min_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        first = (_parts_pandas(parts_ds, {"l_orderkey": np.int64,
                                          "ship_day": np.int64})
                 .groupby("l_orderkey", as_index=False)["ship_day"]
                 .min())
        od = orders.to_pandas()
        od["order_day"] = (od.o_orderdate.dt.floor("D")
                           .astype("datetime64[s]").astype(np.int64))
        j = od.merge(first, left_on="o_orderkey", right_on="l_orderkey")
    else:
        from biobloom_ray.io import hash_join

        first_ds = (parts_ds.groupby("l_orderkey")
                    .aggregate(Min("ship_day", alias_name="ship_day")))

        def tag_order(b: pa.Table) -> pa.Table:
            day = (pc.floor_temporal(b["o_orderdate"], unit="day")
                   .cast(pa.timestamp("s")).cast(pa.int64()))
            return pa.table({"o_orderkey": b["o_orderkey"],
                             "o_orderpriority": b["o_orderpriority"],
                             "order_day": day})

        od_ds = orders.map_batches(tag_order, batch_format="pyarrow")
        j = hash_join(first_ds, od_ds, on=("l_orderkey",),
                      right_on=("o_orderkey",)).to_pandas()
    within = ((j.ship_day.to_numpy(np.int64)
               - j.order_day.to_numpy(np.int64))
              <= sla_days * 86400).astype(np.int64)
    j = j.assign(within=within)
    out = (j.groupby("o_orderpriority", as_index=False)
           .agg(n_orders=("within", "size"),
                n_within_sla=("within", "sum")))
    out["n_orders"] = out.n_orders.astype(np.int64)
    out["n_within_sla"] = out.n_within_sla.astype(np.int64)
    out["fill_rate_r6"] = np.round(
        out.n_within_sla.to_numpy(np.float64)
        / out.n_orders.to_numpy(np.float64), 6)
    return (out.sort_values("o_orderpriority").reset_index(drop=True))


def value_benford_deviation(sf_dir: str):
    """Data-quality screen: leading-significant-digit distribution of
    positive event value cents per event type vs Benford's law, with
    the exact digit counts and a 6-dp chi-square statistic.  The
    leading digit is pure integer arithmetic (repeated //10 — no
    string pass); per-block (type, digit) partials pre-reduce to
    ≤ 9·types rows."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def lead_digit(c: np.ndarray) -> np.ndarray:
        c = c.copy()
        while (c >= 10).any():
            c[c >= 10] //= 10
        return c

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        m = cents > 0
        d = lead_digit(cents[m])
        df = pd.DataFrame({
            "event_type": pd.Series(
                b["event_type"].to_pandas())[m].to_numpy(dtype=object),
            "digit": d})
        agg = (df.groupby(["event_type", "digit"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds,
                             {"event_type": object, "digit": np.int64,
                              "n": np.int64})
               .groupby(["event_type", "digit"], as_index=False)
               ["n"].sum())
    else:
        agg = (parts_ds.groupby(["event_type", "digit"])
               .aggregate(Sum("n", alias_name="n")).to_pandas())
    agg["n"] = agg.n.astype(np.int64)
    agg["digit"] = agg.digit.astype(np.int64)
    tot = agg.groupby("event_type")["n"].transform("sum") \
        .to_numpy(np.float64)
    p_benford = np.log10(1.0 + 1.0
                         / agg.digit.to_numpy(np.float64))
    expected = tot * p_benford
    agg["chi2_term_r6"] = np.round(
        (agg.n.to_numpy(np.float64) - expected) ** 2 / expected, 6)
    return (agg.sort_values(["event_type", "digit"])
            .reset_index(drop=True))


# -- round-4 wave 33: grid HLL union / weighted median / Q19 predicate ------

def weekly_distinct_users(sf_dir: str):
    """Exact distinct users per (event_type, ISO week) — the exact
    twin of `hll_weekly_union`'s merged sketch path.  Per-block
    pre-dedup of (type, week, user) triples; driver dedup+count below
    the gate, two chained native groupbys on the same key prefix
    above it (dedup cluster-wide, then count survivors)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        week = (pc.floor_temporal(b["ts"], unit="week")
                .cast(pa.timestamp("s")).cast(pa.int64()))
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "week_epoch": week.to_numpy(zero_copy_only=False),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        tri = (_parts_pandas(parts_ds,
                             {"event_type": object,
                              "week_epoch": np.int64,
                              "user_id": np.int64}).drop_duplicates())
        out = (tri.groupby(["event_type", "week_epoch"], as_index=False)
               .size().rename(columns={"size": "n_users"}))
    else:
        dedup = (parts_ds
                 .groupby(["event_type", "week_epoch", "user_id"])
                 .aggregate(Count(alias_name="_c"))
                 .map_batches(lambda b: pa.table({
                     "event_type": b["event_type"],
                     "week_epoch": b["week_epoch"],
                     "one": pa.array(np.ones(b.num_rows, np.int64))}),
                     batch_format="pyarrow"))
        out = (dedup.groupby(["event_type", "week_epoch"])
               .aggregate(Sum("one", alias_name="n_users")).to_pandas())
    out["week_epoch"] = out.week_epoch.astype(np.int64)
    out["n_users"] = out.n_users.astype(np.int64)
    return (out.sort_values(["event_type", "week_epoch"])
            .reset_index(drop=True))


def hll_weekly_union(sf_dir: str, p: int = 14):
    """Grid-cell sketch merge: one HLL per (event_type, week) cell
    built from per-block blob partials, then the WEEK CELLS of each
    type merge into the type-level distinct-user estimate — the
    union-across-grid operation a precomputed sketch cube answers
    without rescanning (register-wise max, associative).  Pinned
    against the exact twin within 5σ = 5·1.04/√m in pytest."""
    from biobloom_ray.hashing import splitmix64
    from biobloom_ray.sketches.hll import HLL

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        week = (pc.floor_temporal(b["ts"], unit="week")
                .cast(pa.timestamp("s")).cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        kinds, weeks, blobs = [], [], []
        df = pd.DataFrame({"et": et, "wk": week})
        for (t, w), g in df.groupby(["et", "wk"], sort=False):
            h = HLL(p=p)
            h.update(splitmix64(uid[g.index.to_numpy()]))
            kinds.append(t)
            weeks.append(int(w))
            blobs.append(h.registers.tobytes())
        return pa.table({"event_type": pa.array(kinds),
                         "week_epoch": pa.array(weeks, pa.int64()),
                         "blob": pa.array(blobs, pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    cells: dict = {}
    for r in rows:
        h = HLL(p=p, registers=np.frombuffer(
            r["blob"], dtype=np.uint8).copy())
        key = (r["event_type"], r["week_epoch"])
        if key in cells:
            cells[key].merge(h)
        else:
            cells[key] = h
    # union across the week cells of each type
    per_type: dict = {}
    n_weeks: dict = {}
    for (t, _w), h in cells.items():
        n_weeks[t] = n_weeks.get(t, 0) + 1
        if t in per_type:
            per_type[t].merge(h)
        else:
            per_type[t] = HLL(p=p, registers=h.registers.copy())
    out = pd.DataFrame({
        "event_type": sorted(per_type),
        "n_weeks": [np.int64(n_weeks[t]) for t in sorted(per_type)],
        "est_distinct_users": [
            np.int64(round(per_type[t].estimate()))
            for t in sorted(per_type)]})
    return out


def byte_median_doc_size(sf_dir: str):
    """WEIGHTED median — the shard-planning number: per source, the
    smallest doc size X such that docs of size ≤ X hold at least half
    the source's total characters ('half the bytes live in docs this
    small or smaller').  Exactly decided on the (source, n_chars)
    count table with integer cross-multiplication (2·cum ≥ tot), same
    regime as value_decile_stats: the corpus reduces to per-block
    partials, the walk runs on the value-domain-bounded table."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["source", "n_chars"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["mass"] = (agg.n_chars.to_numpy(np.int64)
                       * agg.n.to_numpy(np.int64))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        counts = (_parts_pandas(parts_ds,
                                {"source": object, "n_chars": np.int64,
                                 "n": np.int64, "mass": np.int64})
                  .groupby(["source", "n_chars"], as_index=False)
                  [["n", "mass"]].sum())
    else:
        counts = (parts_ds.groupby(["source", "n_chars"])
                  .aggregate(Sum("n", alias_name="n"),
                             Sum("mass", alias_name="mass")).to_pandas())
    rows = []
    for src, g in counts.sort_values("n_chars").groupby("source"):
        mass = g.mass.to_numpy(np.int64)
        cum = np.cumsum(mass)
        tot = int(cum[-1])
        i = int(np.searchsorted(2 * cum, tot))
        rows.append((src, int(g.n_chars.to_numpy(np.int64)[i]), tot))
    out = pd.DataFrame(rows, columns=["source", "byte_median_size",
                                      "total_chars"])
    out["byte_median_size"] = out.byte_median_size.astype(np.int64)
    out["total_chars"] = out.total_chars.astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def multi_predicate_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue under an OR of composite
    (brand, size, quantity) predicates, decided map-side: the part
    dimension collapses to per-branch eligibility flag arrays
    broadcast once; each lineitem block evaluates the disjunction
    vectorized and emits ONE partial row.  Exact integer revenue."""
    import ray

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    po = np.argsort(part.p_partkey.to_numpy())
    pk = part.p_partkey.to_numpy(np.int64)[po]
    brand = part.p_brand.to_numpy()[po]
    size = part.p_size.to_numpy(np.int64)[po]
    flag1 = (brand == "Brand#1") & (size <= 10)
    flag2 = (brand == "Brand#2") & (size <= 20)
    part_ref = ray.put((pk, flag1, flag2))

    def partial(b: pa.Table) -> pa.Table:
        keys, f1, f2 = ray.get(part_ref)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lpk)
        pos[pos >= len(keys)] = 0
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        hit = ((f1[pos] & (qty >= 1) & (qty <= 20))
               | (f2[pos] & (qty >= 5) & (qty <= 30)))
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))[hit]
        disc = _cents_away(
            b["l_discount"].to_numpy(zero_copy_only=False))[hit]
        rev = int((cents * (100 - disc)).sum())
        return pa.table({"revenue_e4": pa.array([rev], pa.int64()),
                         "n_items": pa.array([int(hit.sum())],
                                             pa.int64())})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_e4": [np.int64(parts.revenue_e4.sum())],
        "n_items": [np.int64(parts.n_items.sum())]})


# -- round-4 wave 34: market basket / containment / exclusive vocab ---------

def copurchase_type_pairs(sf_dir: str, k: int = 20):
    """Market-basket pair mining: the top-k part-TYPE pairs
    co-occurring in the same order, counted once per order.  The
    fact table reduces per block to distinct (order, type) rows
    (types per order are bounded by the type domain — the documented
    small-group class); pair expansion runs per order group and the
    (ta, tb) support rollup is native.  Exact counts; ties break on
    the pair."""
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_type"]).to_pandas()
    po = np.argsort(part.p_partkey.to_numpy())
    pk = part.p_partkey.to_numpy(np.int64)[po]
    ptype = part.p_type.to_numpy()[po]
    part_ref = ray.put((pk, ptype))

    def ot_partial(b: pa.Table) -> pa.Table:
        keys, types = ray.get(part_ref)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lpk)
        pos[pos >= len(keys)] = 0
        df = pd.DataFrame({
            "o": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "t": types[pos]})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts_ds = li.map_batches(ot_partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)

    def pairs_from(ot: pd.DataFrame) -> pd.DataFrame:
        j = ot.merge(ot, on="o")
        j = j[j.t_x < j.t_y]
        out = (j.groupby(["t_x", "t_y"], as_index=False)
               .size().rename(columns={"t_x": "ta", "t_y": "tb",
                                       "size": "n_orders"}))
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return (out.sort_values(["n_orders", "ta", "tb"],
                                ascending=[False, True, True])
                .head(k).reset_index(drop=True))

    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        ot = _parts_pandas(parts_ds, {"o": np.int64, "t": object}) \
            .drop_duplicates()
        return pairs_from(ot)

    ot_ds = (parts_ds.groupby(["o", "t"])
             .aggregate(Count(alias_name="_c")))

    def pair_expand(g: pa.Table) -> pa.Table:
        t = np.unique(g["t"].to_numpy(zero_copy_only=False))
        if len(t) < 2:
            return pa.table({"ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string()),
                             "one": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(len(t), 1)
        return pa.table({"ta": pa.array(t[iu]), "tb": pa.array(t[ju]),
                         "one": pa.array(np.ones(len(iu), np.int64))})

    sup = (ot_ds.groupby("o").map_groups(pair_expand,
                                         batch_format="pyarrow")
           .groupby(["ta", "tb"])
           .aggregate(Sum("one", alias_name="n_orders")))

    def local_topk(b: pa.Table) -> pa.Table:
        n = b["n_orders"].to_numpy(zero_copy_only=False)
        ta = b["ta"].to_numpy(zero_copy_only=False)
        tb = b["tb"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((tb, ta, -n))[:k]
        return pa.table({"ta": pa.array(ta[idx]),
                         "tb": pa.array(tb[idx]),
                         "n_orders": pa.array(n[idx])})

    out = (sup.map_batches(local_topk, batch_format="pyarrow")
           .to_pandas()
           .sort_values(["n_orders", "ta", "tb"],
                        ascending=[False, True, True]).head(k))
    out["n_orders"] = out.n_orders.astype(np.int64)
    return out.reset_index(drop=True)


def source_exclusive_tokens(sf_dir: str):
    """Source-exclusive vocabulary — contamination/provenance signal:
    per source, how many of its token OCCURRENCES use a token that
    appears in NO other source, plus the exclusive-type count and the
    6-dp occurrence share.  The corpus reduces to the (token, source)
    rollup (vocab-scale); exclusivity is decided on the vocab table
    (a token's distinct-source count == 1) and joined back without
    touching the corpus again."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        from biobloom_ray.stages.textstats import _token_arrays

        flat, lens, row_of = _token_arrays(b)
        src = b["source"].to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table({"source": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"source": src[row_of], "token": flat})
        agg = (df.groupby(["source", "token"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        st = (_parts_pandas(parts_ds, {"source": object,
                                       "token": object, "n": np.int64})
              .groupby(["source", "token"], as_index=False)["n"].sum())
    else:
        st = (parts_ds.groupby(["source", "token"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    nsrc = st.groupby("token")["source"].transform("nunique")
    st["excl"] = (nsrc == 1).to_numpy()
    tot = st.groupby("source", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_tokens"})
    exc = (st[st.excl].groupby("source", as_index=False)
           .agg(n_exclusive_occ=("n", "sum"),
                n_exclusive_types=("token", "size")))
    out = tot.merge(exc, on="source", how="left").fillna(0)
    out["n_tokens"] = out.n_tokens.astype(np.int64)
    out["n_exclusive_occ"] = out.n_exclusive_occ.astype(np.int64)
    out["n_exclusive_types"] = out.n_exclusive_types.astype(np.int64)
    out["exclusive_share_r6"] = np.round(
        out.n_exclusive_occ.to_numpy(np.float64)
        / out.n_tokens.to_numpy(np.float64), 6)
    return out.sort_values("source").reset_index(drop=True)


# -- round-4 wave 35: FK audit / log2 histogram ------------------------------

def fk_orphan_counts(sf_dir: str):
    """Referential-integrity audit in one rollup per edge: orphan
    counts for the three star-schema FKs (lineitem→orders,
    lineitem→part, orders→customer).  Each fact side reduces per
    block to its distinct key partials; the key sets are dimension-
    scale, so membership is one sorted-array broadcast probe below
    the gate and a left-anti hash join above (the same tier pair the
    subtract/decontaminate ops use).  Output: one exact row per
    edge."""
    import ray

    from biobloom_ray.io import hash_join

    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
    ]
    rows = []
    for name, fact, fkey, dim, dkey in edges:
        fds = _read(sf_dir, fact, columns=[fkey])

        def key_partial(b: pa.Table, _k=fkey) -> pa.Table:
            u = np.unique(b[_k].to_numpy(zero_copy_only=False))
            return pa.table({"k": pa.array(u.astype(np.int64)),
                             "n": pa.array(
                                 pd.Series(b[_k].to_numpy(
                                     zero_copy_only=False))
                                 .value_counts().sort_index()
                                 .to_numpy(np.int64))})

        parts_ds = fds.map_batches(key_partial, batch_format="pyarrow")
        n_rows = _cheap_count(fds)
        if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
            keys = (_parts_pandas(parts_ds, {"k": np.int64,
                                             "n": np.int64})
                    .groupby("k", as_index=False)["n"].sum())
            dset = np.sort(_read(sf_dir, dim, columns=[dkey])
                           .to_pandas()[dkey].to_numpy(np.int64))
            kk = keys.k.to_numpy(np.int64)
            pos = np.searchsorted(dset, kk)
            pos[pos >= len(dset)] = max(len(dset) - 1, 0)
            orphan = (dset[pos] != kk) if len(dset) else \
                np.ones(len(kk), dtype=bool)
            rows.append((name,
                         int(keys.n.sum()),
                         int(keys.n.to_numpy(np.int64)[orphan].sum()),
                         int(orphan.sum())))
            continue
        # cluster tier: distinct-key rollup stays a Dataset; orphans
        # via a left-anti hash join against the dimension key column
        keys_ds = (parts_ds.groupby("k")
                   .aggregate(Sum("n", alias_name="n")).materialize())

        def _sums(b: pa.Table) -> pa.Table:
            nn = b["n"].to_numpy(zero_copy_only=False)
            return pa.table({"rows": pa.array([int(nn.sum())], pa.int64()),
                             "keys": pa.array([b.num_rows], pa.int64())})

        tot = keys_ds.map_batches(_sums, batch_format="pyarrow") \
            .to_pandas()
        dds = _read(sf_dir, dim, columns=[dkey])
        anti = hash_join(keys_ds, dds, on=("k",), right_on=(dkey,),
                         join_type="left_anti")
        orph = anti.map_batches(_sums, batch_format="pyarrow").to_pandas()
        rows.append((name,
                     int(tot.rows.sum()),
                     int(orph.rows.sum()) if len(orph) else 0,
                     int(orph.keys.sum()) if len(orph) else 0))
    out = pd.DataFrame(rows, columns=["fk_edge", "n_fact_rows",
                                      "n_orphan_rows",
                                      "n_orphan_keys"])
    for c in ["n_fact_rows", "n_orphan_rows", "n_orphan_keys"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("fk_edge").reset_index(drop=True)


def nchars_histogram_log2(sf_dir: str):
    """Log2-bucket size histogram per lang — the shard/batch-size
    planning view: bucket = ⌊log2(n_chars)⌋ computed EXACTLY by a
    searchsorted against the power-of-two table (no float log
    anywhere; the oracle uses the binary-string length for the same
    exact integer).  Per-block (lang, bucket) partials pre-reduce
    map-side; tiered combine."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    powers = (np.int64(1) << np.arange(63)).astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        x = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = x > 0
        bucket = (np.searchsorted(powers, x[m], side="right") - 1) \
            .astype(np.int64)
        df = pd.DataFrame({
            "lang": pd.Series(b["lang"].to_pandas())[m]
            .to_numpy(dtype=object),
            "bucket": bucket})
        agg = (df.groupby(["lang", "bucket"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds,
                             {"lang": object, "bucket": np.int64,
                              "n": np.int64})
               .groupby(["lang", "bucket"], as_index=False)["n"].sum())
    else:
        agg = (parts_ds.groupby(["lang", "bucket"])
               .aggregate(Sum("n", alias_name="n")).to_pandas())
    agg["bucket"] = agg.bucket.astype(np.int64)
    agg["n"] = agg.n.astype(np.int64)
    return (agg.sort_values(["lang", "bucket"])
            .reset_index(drop=True))


def customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape — counts-of-counts over a LEFT join: how many
    customers placed exactly N orders, INCLUDING the zero-order bucket
    (the left-join rows the fact table never sees).  The orders side
    pre-reduces per block to (custkey, n) partials; the second rollup
    (count values → customer tallies) is output-scale (bounded by the
    max orders per customer), so it always combines as tiny partials.
    The zero bucket is computed as |customer| − |distinct buyers| —
    valid under the star schema's FK integrity, which
    ``fk_orphan_counts`` audits (0 orphans on the fixture).  Cluster
    tier: native Sum groupby on custkey, then per-block counts-of-
    counts partials; nothing customer-scale ever reaches the driver."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        vc = (pd.Series(b["o_custkey"].to_numpy(zero_copy_only=False))
              .value_counts().sort_index())
        return pa.table({"ck": pa.array(vc.index.to_numpy(np.int64)),
                         "n": pa.array(vc.to_numpy(np.int64))})

    parts_ds = orders.map_batches(cnt_partial, batch_format="pyarrow")

    def rowcount_partial(b: pa.Table) -> pa.Table:
        return pa.table({"rows": pa.array([b.num_rows], pa.int64())})

    n_cust = _cheap_count(cust)
    if n_cust is None:
        n_cust = int(cust.map_batches(rowcount_partial,
                                      batch_format="pyarrow")
                     .to_pandas().rows.sum())

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= LINEITEM_DRIVER_MAX_ROWS:
        per_cust = (_parts_pandas(parts_ds, {"ck": np.int64,
                                             "n": np.int64})
                    .groupby("ck", as_index=False)["n"].sum())
        dist = (per_cust.groupby("n", as_index=False)
                .size().rename(columns={"n": "c_count",
                                        "size": "custdist"}))
        n_buyers = len(per_cust)
    else:
        counts_ds = (parts_ds.groupby("ck")
                     .aggregate(Sum("n", alias_name="n")).materialize())

        def dist_partial(b: pa.Table) -> pa.Table:
            vc = (pd.Series(b["n"].to_numpy(zero_copy_only=False))
                  .value_counts().sort_index())
            return pa.table({
                "c_count": pa.array(vc.index.to_numpy(np.int64)),
                "custdist": pa.array(vc.to_numpy(np.int64))})

        dist = (_parts_pandas(
            counts_ds.map_batches(dist_partial, batch_format="pyarrow"),
            {"c_count": np.int64, "custdist": np.int64})
            .groupby("c_count", as_index=False)["custdist"].sum())
        n_buyers = int(dist.custdist.sum())
    zero = int(n_cust) - int(n_buyers)
    if zero > 0:
        dist = pd.concat([dist, pd.DataFrame(
            {"c_count": [0], "custdist": [zero]})], ignore_index=True)
    dist["c_count"] = dist.c_count.astype(np.int64)
    dist["custdist"] = dist.custdist.astype(np.int64)
    return (dist.sort_values("c_count").reset_index(drop=True)
            [["c_count", "custdist"]])


def cold_customers_by_nation(sf_dir: str, cutoff: str = "1999-01-01"):
    """TPC-H Q22 shape — anti-join gated by a GLOBAL scalar threshold:
    high-balance customers with no order since ``cutoff`` (lapsed
    wealth), rolled up per nation.  The threshold (mean of positive
    balances) is decided with the exact-integer cross-multiplication
    rule ``cents·n_pos > sum_pos_cents`` — no float average anywhere,
    so the borderline customer is bit-deterministic on both the
    pipeline and the DuckDB oracle.  The threshold filter pushes down
    map-side BEFORE the anti-join (FP-free: the rule is row-local).
    Below the gate the recent-buyer key set broadcasts once and the
    probe is searchsorted misses; above it block-deduped buyer keys
    feed a ``left_anti`` hash join (duplicate right keys are
    anti-neutral).  The final rollup keys on c_nationkey (≤ dimension
    cardinality) and maps names from the tiny nation table."""
    import ray

    from biobloom_ray.io import hash_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    lo = np.datetime64(cutoff, "us").astype(np.int64)

    def pos_partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["c_acctbal"].to_numpy(zero_copy_only=False))
        p = cents[cents > 0]
        return pa.table({"s": pa.array([int(p.sum())], pa.int64()),
                         "c": pa.array([len(p)], pa.int64())})

    pos = _parts_pandas(cust.map_batches(pos_partial,
                                         batch_format="pyarrow"),
                        {"s": np.int64, "c": np.int64})
    sum_pos, n_pos = int(pos.s.sum()), int(pos.c.sum())

    def rich(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["c_acctbal"].to_numpy(zero_copy_only=False))
        keep = cents * n_pos > sum_pos
        return pa.table({
            "c_custkey": b["c_custkey"].filter(pa.array(keep)),
            "c_nationkey": b["c_nationkey"].filter(pa.array(keep)),
            "cents": pa.array(cents[keep])})

    rich_ds = cust.map_batches(rich, batch_format="pyarrow")

    def recent_keys(b: pa.Table) -> pa.Table:
        ts = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": pa.array(np.unique(ck[ts >= lo]))})

    keys_ds = orders.map_batches(recent_keys, batch_format="pyarrow")

    def nation_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_nationkey": b["c_nationkey"].to_numpy(zero_copy_only=False),
            "cents": b["cents"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby("c_nationkey", as_index=False)
               .agg(n_cold=("cents", "size"),
                    sum_acctbal_cents=("cents", "sum")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= ANTI_BROADCAST_MAX_ROWS:
        buyers = np.unique(_parts_pandas(keys_ds, {"o_custkey": np.int64})
                           ["o_custkey"].to_numpy(np.int64))
        b_ref = ray.put(buyers)

        def anti_probe(b: pa.Table) -> pa.Table:
            keys = ray.get(b_ref)
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return nation_partial(b)
            pos_ = np.searchsorted(keys, ck)
            pos_[pos_ >= len(keys)] = 0
            miss = keys[pos_] != ck
            return nation_partial(b.filter(pa.array(miss)))

        parts = rich_ds.map_batches(anti_probe, batch_format="pyarrow")
    else:
        anti = hash_join(rich_ds, keys_ds, on=("c_custkey",),
                         right_on=("o_custkey",), join_type="left_anti")
        parts = anti.map_batches(nation_partial, batch_format="pyarrow")
    agg = (_parts_pandas(parts, {"c_nationkey": np.int64,
                                 "n_cold": np.int64,
                                 "sum_acctbal_cents": np.int64})
           .groupby("c_nationkey", as_index=False)
           [["n_cold", "sum_acctbal_cents"]].sum())
    names = (_read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas())
    out = agg.merge(names, left_on="c_nationkey",
                    right_on="n_nationkey")[["n_name", "n_cold",
                                             "sum_acctbal_cents"]]
    out["n_cold"] = out.n_cold.astype(np.int64)
    out["sum_acctbal_cents"] = out.sum_acctbal_cents.astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


#: FPR for the key-Bloom the pruned join broadcasts (2^-8: ~11 bits/key,
#: so even a 10^9-key dimension side stays a ~1.4 GB one-time broadcast
#: while cutting ~99.6% of non-matching fact rows before the shuffle).
BLOOMJOIN_FPR = 1.0 / 256.0


def _key_hashes(keys: np.ndarray, seed: int = 0x9E3779B97F4A7C15):
    """(h1, h2) double-hash pair for int64 join keys (splitmix64
    family); h2 forced odd so ``h1 + i*h2`` walks all bit positions."""
    from biobloom_ray.hashing import splitmix64

    u = keys.astype(np.uint64)
    h1 = splitmix64(u)
    h2 = splitmix64(u ^ np.uint64(seed)) | np.uint64(1)
    return h1, h2


def bloom_prune_join_revenue(sf_dir: str, priority: str = "1-URGENT",
                             lo: str = "1995-01-01",
                             hi: str = "1996-01-01"):
    """Bloom-pruned fact⋈dimension join (the classic "Bloom join" /
    runtime-filter pushdown, here built from the engine's OWN sketch
    core): revenue of lineitems whose order is in-priority and
    in-window, per return flag — EXACT result, the Bloom only shrinks
    the shuffle.  Cluster tier: (1) the filtered order keys build a
    ``BloomFilter`` distributively — per-block partial filters OR-merge
    through a 16-way salted ``map_groups`` level, then once on the
    driver (same blob-partial shape as the maker UDAF,
    ``pipelines/build.py:49``; sized to the unfiltered order count so
    the realized FPR only undershoots ``BLOOMJOIN_FPR``); (2) the fact
    scan probes the broadcast filter map-side and pre-reduces survivors
    to (orderkey, flag, cents) partials — no false negatives, so
    nothing true is lost; (3) an inner hash join against the real key
    set kills the ≤FPR false positives, then a tiny Sum groupby.  At
    a selectivity of s the exchange moves ≈ (s + FPR) of the fact rows
    instead of all of them.  Below the gate the exact sorted key set
    broadcasts directly (no Bloom needed at that size)."""
    import ray

    from biobloom_ray.io import hash_join
    from biobloom_ray.sketches.bloom import (BloomFilter,
                                             calc_optimal_hash_num,
                                             calc_optimal_size)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    tlo = np.datetime64(lo, "us").astype(np.int64)
    thi = np.datetime64(hi, "us").astype(np.int64)

    def sel_keys(b: pa.Table) -> pa.Table:
        ts = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        keep = (pr == priority) & (ts >= tlo) & (ts < thi)
        return pa.table({"o_orderkey": pa.array(
            b["o_orderkey"].to_numpy(zero_copy_only=False)[keep])})

    keys_ds = orders.map_batches(sel_keys, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag",
                        "l_extendedprice", "l_discount"])

    _rev_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("l_returnflag", pa.string()),
                             ("revenue", pa.int64()),
                             ("n_items", pa.int64())])

    def rev_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # keep block schemas unifiable (no null cols)
            return _rev_schema.empty_table()
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "l_returnflag": pd.Series(b["l_returnflag"].to_pandas())
            .to_numpy(dtype=object),
            "revenue": cents * (100 - disc)})
        agg = (df.groupby(["l_orderkey", "l_returnflag"], as_index=False)
               .agg(revenue=("revenue", "sum"), n_items=("revenue", "size")))
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .cast(_rev_schema)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("l_returnflag", as_index=False)
               [["revenue", "n_items"]].sum())
        out["revenue"] = out.revenue.astype(np.int64)
        out["n_items"] = out.n_items.astype(np.int64)
        return out.sort_values("l_returnflag").reset_index(drop=True)

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= LINEITEM_DRIVER_MAX_ROWS:
        keys = np.sort(_parts_pandas(keys_ds, {"o_orderkey": np.int64})
                       ["o_orderkey"].to_numpy(np.int64))
        k_ref = ray.put(keys)

        def probe_exact(b: pa.Table) -> pa.Table:
            kk = ray.get(k_ref)
            ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(kk) == 0:
                return rev_partial(b.slice(0, 0))
            pos = np.searchsorted(kk, ok)
            pos[pos >= len(kk)] = 0
            hit = kk[pos] == ok
            return rev_partial(b.filter(pa.array(hit)))

        parts = li.map_batches(probe_exact, batch_format="pyarrow")
        return final(_parts_pandas(parts, {"l_orderkey": np.int64,
                                           "l_returnflag": object,
                                           "revenue": np.int64,
                                           "n_items": np.int64}))

    # cluster tier: distributed key-Bloom build (salted two-level merge)
    h = calc_optimal_hash_num(BLOOMJOIN_FPR)
    m = calc_optimal_size(max(int(n_ord or 1), 1), BLOOMJOIN_FPR, h)

    def bloom_partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter(m=m, hash_num=h, kmer_size=1,
                         filter_id="bloomjoin")
        kk = b["o_orderkey"].to_numpy(zero_copy_only=False)
        if len(kk):
            bf.insert(*_key_hashes(kk.astype(np.int64)))
        g = int(kk[0] % 16) if len(kk) else 0
        return pa.table({"g": pa.array([g], pa.int64()),
                         "blob": pa.array([bf.serialize()],
                                          pa.large_binary())})

    def or_merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = BloomFilter.deserialize(df.blob.iloc[0])
        for blob in df.blob.iloc[1:]:
            acc = acc.merge(BloomFilter.deserialize(blob))
        return pd.DataFrame({"g": [int(df.g.iloc[0])],
                             "blob": [acc.serialize()]})

    level1 = (keys_ds.map_batches(bloom_partial, batch_format="pyarrow")
              .groupby("g").map_groups(or_merge, batch_format="pandas")
              .to_pandas())
    bf = BloomFilter.deserialize(level1.blob.iloc[0])
    for blob in level1.blob.iloc[1:]:
        bf = bf.merge(BloomFilter.deserialize(blob))
    bf_ref = ray.put(bf.serialize())

    class BloomProbe:
        """Actor-pool stage: deserialize the broadcast filter ONCE per
        worker (worker-private words array — no per-batch plasma read),
        probe + pre-reduce per batch."""

        def __init__(self):
            self._bf = BloomFilter.deserialize(ray.get(bf_ref))

        def __call__(self, b: pa.Table) -> pa.Table:
            ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
            maybe = self._bf.contains(*_key_hashes(ok.astype(np.int64)))
            return rev_partial(b.filter(pa.array(maybe)))

    survivors = li.map_batches(BloomProbe, batch_format="pyarrow",
                               concurrency=(1, 8))
    exact = hash_join(survivors, keys_ds, on=("l_orderkey",),
                      right_on=("o_orderkey",), join_type="inner")
    agg = (exact.groupby("l_returnflag")
           .aggregate(Sum("revenue", alias_name="revenue"),
                      Sum("n_items", alias_name="n_items"))
           .to_pandas())
    return final(agg)


def session_overlap_pairs(sf_dir: str, gap_hours: int = 72):
    """Interval-OVERLAP join (interval × interval, not the point-in-
    range shape of ``events_range_join``): sessionize each user's
    stream per event type (episode break at > ``gap_hours``), then
    count, per unordered type pair, the cross-type episode pairs of
    the same user whose [start, end] intervals intersect.  Per-user
    work is one vectorized kernel — boundary detection by ``diff``,
    episode bounds by ``reduceat``, and per type pair TWO
    searchsorteds (episodes of one type are disjoint ⇒ starts AND
    ends are each sorted, so overlap count = rank(b.end in A.start)
    − rank(b.start in A.end)); no per-interval Python.  Cluster tier:
    ``groupby(user).map_groups`` (per-user history fits a block —
    the same bounded-entity assumption ``events_sessionize``
    documents) emitting per-user pair counts, then a native Sum
    groupby over ≤ |types|² rows per user.  Driver tier: one sorted
    pull + the same kernel per user slice."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    gap_us = int(gap_hours) * 3_600_000_000

    def user_kernel(tp: np.ndarray, ts: np.ndarray) -> dict:
        """(type, ts)-sorted arrays of ONE user → {(a, b): n}."""
        if len(ts) == 0:
            return {}
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (tp[1:] != tp[:-1]) | (np.diff(ts) > gap_us)
        starts_i = np.nonzero(new)[0]
        ends_i = np.append(starts_i[1:] - 1, len(ts) - 1)
        st, en, ty = ts[starts_i], ts[ends_i], tp[starts_i]
        out = {}
        utypes = np.unique(ty)
        for ai in range(len(utypes)):
            a_m = ty == utypes[ai]
            a_st, a_en = st[a_m], en[a_m]
            for bi in range(ai + 1, len(utypes)):
                b_m = ty == utypes[bi]
                n = int((np.searchsorted(a_st, en[b_m], side="right")
                         - np.searchsorted(a_en, st[b_m], side="left"))
                        .sum())
                if n:
                    out[(str(utypes[ai]), str(utypes[bi]))] = n
        return out

    def pairs_frame(acc: dict) -> pd.DataFrame:
        if not acc:
            return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                                 "type_b": pd.Series([], dtype=object),
                                 "n_overlaps": pd.Series([],
                                                         dtype=np.int64)})
        ks = sorted(acc)
        return pd.DataFrame({"type_a": [k[0] for k in ks],
                             "type_b": [k[1] for k in ks],
                             "n_overlaps": np.asarray(
                                 [acc[k] for k in ks], np.int64)})

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas().sort_values(["user_id", "event_type", "ts"])
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        tp = df.event_type.to_numpy(dtype=object)
        uid = df.user_id.to_numpy()
        cuts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        acc: dict = {}
        for lo, hi in zip(cuts, np.append(cuts[1:], len(uid))):
            for k, v in user_kernel(tp[lo:hi], ts[lo:hi]).items():
                acc[k] = acc.get(k, 0) + v
        return pairs_frame(acc)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "ts"])
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        return pairs_frame(user_kernel(df.event_type
                                       .to_numpy(dtype=object), ts))

    parts = (ds.groupby("user_id")
             .map_groups(per_user, batch_format="pandas"))
    agg = (parts.groupby(["type_a", "type_b"])
           .aggregate(Sum("n_overlaps", alias_name="n_overlaps"))
           .to_pandas())
    agg["n_overlaps"] = agg.n_overlaps.astype(np.int64)
    return (agg.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def rolling_median_daily_revenue(sf_dir: str, window: int = 7):
    """Rows-based rolling EXACT median — the robust twin of the
    ``event_type_daily_ma7`` moving average: per event type, the
    PERCENTILE_DISC(0.5) of the trailing ``window`` OBSERVED daily
    revenue sums (row frame, not a dense calendar range).  The daily
    rollup pre-reduces per block and combines tiered (native Sum
    groupby above the gate); the rolling pass runs on the
    output-scale (type, day) table — full windows via one
    ``sliding_window_view`` sort, the < window heads via a short
    per-type loop.  Discrete-quantile contract: element at 0-based
    index ⌈n/2⌉−1 of the sorted window, exact int64 cents on both
    sides."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def day_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = (ts // 86_400_000_000) * 86_400
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object),
            "day_epoch": day, "rev": cents})
        agg = (df.groupby(["event_type", "day_epoch"], as_index=False)
               ["rev"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(day_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds, {"event_type": object,
                                          "day_epoch": np.int64,
                                          "rev": np.int64})
                 .groupby(["event_type", "day_epoch"], as_index=False)
                 ["rev"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day_epoch"])
                 .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    daily = daily.sort_values(["event_type", "day_epoch"])
    out_rows = []
    for et, g in daily.groupby("event_type", sort=True):
        rv = g.rev.to_numpy(np.int64)
        de = g.day_epoch.to_numpy(np.int64)
        med = np.empty(len(rv), dtype=np.int64)
        head = min(window - 1, len(rv))
        for i in range(head):  # < window-row heads (≤ 6 per type)
            w = np.sort(rv[:i + 1])
            med[i] = w[(len(w) - 1) // 2]
        if len(rv) >= window:
            from numpy.lib.stride_tricks import sliding_window_view

            sw = np.sort(sliding_window_view(rv, window), axis=1)
            med[window - 1:] = sw[:, (window - 1) // 2]
        out_rows.append(pd.DataFrame({
            "event_type": et, "day_epoch": de, "med_rev_cents": med}))
    out = pd.concat(out_rows, ignore_index=True)
    out["day_epoch"] = out.day_epoch.astype(np.int64)
    out["med_rev_cents"] = out.med_rev_cents.astype(np.int64)
    return (out.sort_values(["event_type", "day_epoch"])
            .reset_index(drop=True))


def late_sole_supplier_counts(sf_dir: str, late_days: int = 90,
                              k: int = 10):
    """TPC-H Q21 shape — the sole-blame double-EXISTS, decorrelated
    into two disjoint-key rollups instead of correlated subqueries:
    a supplier "kept the order waiting" when its latest line shipped
    > ``late_days`` after the order date, the order used ≥ 2
    suppliers, and NO other supplier was late on it.  Plan: (1)
    per-block (orderkey, suppkey) Max(shipdate) partials → tiered
    pair rollup; (2) order dates attach by broadcast searchsorted
    below the gate / hash join above; (3) per-order (n_suppliers,
    n_late) from the pair table; (4) qualifying = late pairs in
    (ns ≥ 2, nl = 1) orders → per-supplier counts → exact block
    top-k (ties broken by suppkey; supplier names are key-monotonic,
    so the SQL name tiebreak is identical) → names map on the k-row
    result."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])
    late_us = int(late_days) * 86_400_000_000

    def pair_partial(b: pa.Table) -> pa.Table:
        ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()).to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "mx": ship})
        agg = df.groupby(["ok", "sk"], as_index=False)["mx"].max()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(pair_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    driver = n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS
    if driver:
        pairs = (_parts_pandas(parts_ds, {"ok": np.int64, "sk": np.int64,
                                          "mx": np.int64})
                 .groupby(["ok", "sk"], as_index=False)["mx"].max())
        od = orders.to_pandas()
        okeys = od.o_orderkey.to_numpy(np.int64)
        order_sort = np.argsort(okeys)
        okeys = okeys[order_sort]
        odates = (od.o_orderdate.astype("datetime64[us]")
                  .astype(np.int64).to_numpy()[order_sort])
        pos = np.searchsorted(okeys, pairs.ok.to_numpy(np.int64))
        pairs["late"] = (pairs.mx.to_numpy(np.int64)
                         > odates[pos] + late_us).astype(np.int64)
        po = (pairs.groupby("ok", as_index=False)
              .agg(ns=("sk", "size"), nl=("late", "sum")))
        q = pairs.merge(po, on="ok")
        q = q[(q.late == 1) & (q.ns >= 2) & (q.nl == 1)]
        counts = (q.groupby("sk", as_index=False)
                  .size().rename(columns={"size": "numwait"}))
    else:
        pair_ds = (parts_ds.groupby(["ok", "sk"])
                   .aggregate(Max("mx", alias_name="mx")))
        joined = hash_join(pair_ds, orders, on=("ok",),
                           right_on=("o_orderkey",))

        def flag(b: pa.Table) -> pa.Table:
            od_ = (b["o_orderdate"].cast(pa.timestamp("us"))
                   .cast(pa.int64()).to_numpy(zero_copy_only=False))
            late = (b["mx"].to_numpy(zero_copy_only=False)
                    > od_ + late_us).astype(np.int64)
            return pa.table({"ok": b["ok"], "sk": b["sk"],
                             "late": pa.array(late)})

        flagged = joined.map_batches(flag, batch_format="pyarrow") \
            .materialize()
        po_ds = (flagged.groupby("ok")
                 .aggregate(Count(alias_name="ns"),
                            Sum("late", alias_name="nl")))
        qual = hash_join(flagged, po_ds, on=("ok",))

        def supp_partial(b: pa.Table) -> pa.Table:
            m = (pc.and_(pc.and_(pc.equal(b["late"], 1),
                                 pc.greater_equal(b["ns"], 2)),
                         pc.equal(b["nl"], 1)))
            sk = b.filter(m)["sk"].to_numpy(zero_copy_only=False)
            vc = pd.Series(sk).value_counts().sort_index()
            return pa.table({
                "sk": pa.array(vc.index.to_numpy(np.int64)),
                "numwait": pa.array(vc.to_numpy(np.int64))})

        counts = (_parts_pandas(
            qual.map_batches(supp_partial, batch_format="pyarrow")
            .groupby("sk").aggregate(Sum("numwait",
                                         alias_name="numwait")),
            {"sk": np.int64, "numwait": np.int64}))
    if len(counts) == 0:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object),
                             "numwait": pd.Series([], dtype=np.int64)})
    top = (counts.sort_values(["numwait", "sk"],
                              ascending=[False, True]).head(k))
    names = _read(sf_dir, "supplier",
                  columns=["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(names, left_on="sk",
                    right_on="s_suppkey")[["s_name", "numwait"]]
    out["numwait"] = out.numwait.astype(np.int64)
    return out.reset_index(drop=True)


#: KMV (k-minimum-values / bottom-k) sketch size — 7th mergeable
#: sketch family.  Relative std ≈ 1/sqrt(k-2) ≈ 0.127 at 64.
KMV_K = 64


def _kmv_userday_partial(b: pa.Table, k: int) -> pa.Table:
    """Per-block bottom-k partial of the (user, day) KMV sketch:
    block-dedupe pairs, 60-bit md5 hash, keep the k smallest distinct
    hashes per event type.  Shared by ``kmv_distinct_userdays`` and
    ``kmv_type_jaccard``."""
    import hashlib

    ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
          .to_numpy(zero_copy_only=False))
    day = (ts // 86_400_000_000) * 86_400
    df = pd.DataFrame({
        "event_type": pd.Series(b["event_type"].to_pandas())
        .to_numpy(dtype=object),
        "user_id": b["user_id"].to_numpy(zero_copy_only=False),
        "day": day}).drop_duplicates()
    hv = np.fromiter(
        (int(hashlib.md5(f"{u}|{d}".encode()).hexdigest()[:15], 16)
         for u, d in zip(df.user_id, df.day)),
        dtype=np.int64, count=len(df))
    df["hv"] = hv
    keep = (df.drop_duplicates(["event_type", "hv"])
            .sort_values(["event_type", "hv"])
            .groupby("event_type").head(k))
    return pa.Table.from_pandas(keep[["event_type", "hv"]],
                                preserve_index=False)


def _kmv_type_sets(sf_dir: str, k: int) -> dict:
    """Tiered bottom-k-per-type fold → {event_type: sorted int64 hash
    array (≤ k)}.  Output scale is k × |types| rows at any corpus
    size."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])
    parts_ds = ds.map_batches(lambda b: _kmv_userday_partial(b, k),
                              batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        parts = _parts_pandas(parts_ds, {"event_type": object,
                                         "hv": np.int64})
    else:
        def fold_set(df: pd.DataFrame) -> pd.DataFrame:
            hv = np.unique(df.hv.to_numpy(np.int64))[:k]
            return pd.DataFrame({
                "event_type": df.event_type.iloc[0], "hv": hv})

        parts = (parts_ds.groupby("event_type")
                 .map_groups(fold_set, batch_format="pandas")
                 .to_pandas())
    return {t: np.unique(g.hv.to_numpy(np.int64))[:k]
            for t, g in parts.groupby("event_type", sort=True)}


def kmv_distinct_userdays(sf_dir: str, k: int = KMV_K):
    """KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002): per
    event type, estimate distinct (user, day) pairs from the k SMALLEST
    60-bit md5 hashes.  Fully SQL-oracled — unlike HLL, the KMV state
    is a deterministic function of the input set, so DuckDB replays the
    exact hash, the exact k-th order statistic, AND the exact estimate
    ((k−1)/normalized kth hash; exact count when fewer than k distinct
    hashes survive).  Merge is keep-k-smallest-of-union — associative,
    and lossless in the <k regime (no partial ever truncates before the
    union does).  Partials are ≤ k rows per (block, type); the combine
    shuffles nothing fact-scale (below the gate they fold on the
    driver, above it one ``groupby(type).map_groups`` whose groups are
    #types).  md5 is inherently per-item (same class as
    ``table_fingerprint``); it runs on block-DEDUPED pairs only."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])
    two60 = float(1 << 60)

    def partial(b: pa.Table) -> pa.Table:
        return _kmv_userday_partial(b, k)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        hv = np.unique(df.hv.to_numpy(np.int64))[:k]
        m = len(hv)
        kth = int(hv[-1]) if m else 0
        est = float(m) if m < k else (k - 1) / (kth / two60)
        return pd.DataFrame({
            "event_type": [df.event_type.iloc[0]],
            "n_kept": np.asarray([m], np.int64),
            "kth_hash": np.asarray([kth], np.int64),
            "kmv_distinct_r6": [round(est, 6)]})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        parts = _parts_pandas(parts_ds, {"event_type": object,
                                         "hv": np.int64})
        out = (parts.groupby("event_type", group_keys=False, sort=True)
               [["event_type", "hv"]].apply(fold).reset_index(drop=True))
    else:
        out = (parts_ds.groupby("event_type")
               .map_groups(fold, batch_format="pandas").to_pandas())
    out["n_kept"] = out.n_kept.astype(np.int64)
    out["kth_hash"] = out.kth_hash.astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def part_skyline(sf_dir: str):
    """Pareto-frontier (SKYLINE) query: parts not dominated in
    (cheaper-or-equal price, larger-or-equal size, strictly better in
    one).  Skyline-of-skylines is associative, and the 2-D frontier
    here is provably ≤ |size domain| rows (at most one surviving price
    level per size, sizes are small ints), so per-block partial
    frontiers fold on the driver with NO gate — the same
    bounded-partial argument as ``table_fingerprint``.  Kernel: one
    lexsort (price ↑, size ↓) + per-price max size + strict running-max
    filter; duplicates of a surviving (price, size) pair all survive
    (neither strictly dominates the other)."""
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])

    def skyline_rows(key, cents, size):
        if len(key) == 0:
            return key, cents, size
        order = np.lexsort((-size, cents))
        c, s = cents[order], size[order]
        first = np.r_[True, c[1:] != c[:-1]]
        pc_, ps = c[first], s[first]  # per-price max size, price asc
        run = np.maximum.accumulate(ps)
        keep_lvl = np.r_[True, ps[1:] > run[:-1]]
        lv_c, lv_s = pc_[keep_lvl], ps[keep_lvl]
        lv = set(zip(lv_c.tolist(), lv_s.tolist()))
        mask = np.fromiter(((a, b) in lv for a, b in
                            zip(cents.tolist(), size.tolist())),
                           dtype=bool, count=len(cents))
        return key[mask], cents[mask], size[mask]

    def partial(b: pa.Table) -> pa.Table:
        key = b["p_partkey"].to_numpy(zero_copy_only=False)
        cents = _cents_away(
            b["p_retailprice"].to_numpy(zero_copy_only=False))
        size = b["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        kk, cc, ss = skyline_rows(key, cents, size)
        return pa.table({"p_partkey": pa.array(kk.astype(np.int64)),
                         "price_cents": pa.array(cc),
                         "p_size": pa.array(ss)})

    parts = _parts_pandas(ds.map_batches(partial, batch_format="pyarrow"),
                          {"p_partkey": np.int64, "price_cents": np.int64,
                           "p_size": np.int64})
    kk, cc, ss = skyline_rows(parts.p_partkey.to_numpy(np.int64),
                              parts.price_cents.to_numpy(np.int64),
                              parts.p_size.to_numpy(np.int64))
    out = pd.DataFrame({"p_partkey": kk, "price_cents": cc,
                        "p_size": ss}).sort_values("p_partkey")
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def large_quantity_orders(sf_dir: str, min_qty: int = 180, k: int = 10):
    """TPC-H Q18 shape — HAVING on a fact rollup, then a dimension
    chain: orders whose total lineitem quantity exceeds ``min_qty``,
    top-k by order value.  The quantity rollup pre-reduces per block
    and combines tiered (native Sum groupby above the gate); the
    HAVING filter applies map-side on the rollup, the order/customer
    attributes attach to the SURVIVORS only (hash join above the gate,
    broadcast searchsorted below), and the final top-k uses per-block
    exact top-k partials.  Customer names map onto the k-row result
    via a map-only filtered scan — nothing customer-scale is joined."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def qty_partial(b: pa.Table) -> pa.Table:
        q = np.floor(np.abs(b["l_quantity"]
                            .to_numpy(zero_copy_only=False)) + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "q": q})
        agg = df.groupby("ok", as_index=False)["q"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(qty_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        sums = (_parts_pandas(parts_ds, {"ok": np.int64, "q": np.int64})
                .groupby("ok", as_index=False)["q"].sum())
        big = sums[sums.q > min_qty]
        od = orders.to_pandas()
        top = (big.merge(od, left_on="ok", right_on="o_orderkey"))
        top["total_cents"] = _cents_away(top.o_totalprice.to_numpy())
        top = (top.drop(columns=["o_orderkey", "o_totalprice"])
               .sort_values(["total_cents", "ok"],
                            ascending=[False, True]).head(k))
    else:
        sums_ds = (parts_ds.groupby("ok")
                   .aggregate(Sum("q", alias_name="q")))

        def having(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater(b["q"], min_qty))

        big_ds = sums_ds.map_batches(having, batch_format="pyarrow")
        joined = hash_join(big_ds, orders, on=("ok",),
                           right_on=("o_orderkey",))

        def topk_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "ok": b["ok"].to_numpy(zero_copy_only=False),
                "q": b["q"].to_numpy(zero_copy_only=False),
                "o_custkey": b["o_custkey"]
                .to_numpy(zero_copy_only=False),
                "total_cents": _cents_away(
                    b["o_totalprice"].to_numpy(zero_copy_only=False))})
            return pa.Table.from_pandas(
                df.sort_values(["total_cents", "ok"],
                               ascending=[False, True]).head(k),
                preserve_index=False)

        top = (_parts_pandas(
            joined.map_batches(topk_partial, batch_format="pyarrow"),
            {"ok": np.int64, "q": np.int64, "o_custkey": np.int64,
             "total_cents": np.int64})
            .sort_values(["total_cents", "ok"],
                         ascending=[False, True]).head(k))
    if len(top) == 0:
        return pd.DataFrame({
            "c_name": pd.Series([], dtype=object),
            "o_orderkey": pd.Series([], dtype=np.int64),
            "total_cents": pd.Series([], dtype=np.int64),
            "sum_qty": pd.Series([], dtype=np.int64)})
    want = np.sort(top.o_custkey.to_numpy(np.int64))
    w_ref = ray.put(want)

    def name_filter(b: pa.Table) -> pa.Table:
        keys = ray.get(w_ref)
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        pos[pos >= len(keys)] = 0
        return b.filter(pa.array(keys[pos] == ck))

    names = (_read(sf_dir, "customer", columns=["c_custkey", "c_name"])
             .map_batches(name_filter, batch_format="pyarrow")
             .to_pandas())
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey")
    out = out.rename(columns={"ok": "o_orderkey", "q": "sum_qty"})
    out = (out.sort_values(["total_cents", "o_orderkey"],
                           ascending=[False, True])
           [["c_name", "o_orderkey", "total_cents", "sum_qty"]])
    for c in ["o_orderkey", "total_cents", "sum_qty"]:
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def kmv_type_jaccard(sf_dir: str, k: int = KMV_K):
    """KMV SET ALGEBRA — the bottom-k sketch's party trick (HLL can
    only union): estimate the Jaccard similarity of the (user, day)
    sets of every event-type pair from the two bottom-k sketches
    alone.  J ≈ |bottom-k(A ∪ B) ∩ A_k ∩ B_k| / |bottom-k(A ∪ B)| —
    the k smallest hashes of the union are a uniform sample of the
    union, so the match fraction is an unbiased Jaccard estimate.
    Deterministic given the hash ⇒ DuckDB replays the whole
    computation bit-exactly (the sketch is SQL-oracled, not just
    bounded).  The per-type sets come from the shared tiered fold
    (``_kmv_type_sets``); the pair math runs on k × |types| rows."""
    sets = _kmv_type_sets(sf_dir, k)
    types = sorted(sets)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            u = np.union1d(sets[ta], sets[tb])[:k]
            both = np.intersect1d(np.intersect1d(u, sets[ta]),
                                  sets[tb])
            rows.append((ta, tb, len(u), len(both),
                         round(len(both) / len(u), 6) if len(u) else 0.0))
    out = pd.DataFrame(rows, columns=["type_a", "type_b",
                                      "n_union_kept", "n_matches",
                                      "jaccard_r6"])
    out["n_union_kept"] = out.n_union_kept.astype(np.int64)
    out["n_matches"] = out.n_matches.astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def repeat_purchase_pairs(sf_dir: str, window_days: int = 7):
    """BAND self-join (inequality θ-join — the pair shape none of the
    as-of/range/overlap joins cover): same-customer order pairs whose
    dates are 0 < Δ ≤ ``window_days`` apart, counted per month of the
    EARLIER order.  Per-customer kernel is two searchsorteds over the
    sorted date array (counts per anchor = rank(d+W, right) −
    rank(d, right); ties on equal dates are excluded by the strict
    lower bound on both sides).  Cluster tier:
    ``groupby(custkey).map_groups`` emitting (month, n) partials →
    native Sum groupby; driver tier: one sorted pull + the same
    kernel per customer slice."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    w_us = int(window_days) * 86_400_000_000

    def cust_kernel(d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """sorted int64 us dates of ONE customer → (month_epochs,
        counts) of in-window later orders per anchor."""
        n = (np.searchsorted(d, d + w_us, side="right")
             - np.searchsorted(d, d, side="right"))
        m = n > 0
        if not m.any():
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        months = (d[m].astype("datetime64[us]").astype("datetime64[M]")
                  .astype("datetime64[s]").astype(np.int64))
        return months, n[m].astype(np.int64)

    def month_frame(months: np.ndarray, cnts: np.ndarray) -> pd.DataFrame:
        if len(months) == 0:
            return pd.DataFrame({
                "month_epoch": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({"month_epoch": months, "n_pairs": cnts})
        return df.groupby("month_epoch", as_index=False)["n_pairs"].sum()

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas().sort_values(["o_custkey", "o_orderdate"])
        d = (df.o_orderdate.astype("datetime64[us]")
             .astype(np.int64).to_numpy())
        ck = df.o_custkey.to_numpy()
        cuts = np.nonzero(np.r_[True, ck[1:] != ck[:-1]])[0]
        ms, cs = [], []
        for lo, hi in zip(cuts, np.append(cuts[1:], len(ck))):
            mm, cc = cust_kernel(d[lo:hi])
            ms.append(mm)
            cs.append(cc)
        agg = month_frame(np.concatenate(ms), np.concatenate(cs))
    else:
        def per_cust(g: pd.DataFrame) -> pd.DataFrame:
            d = np.sort(g.o_orderdate.astype("datetime64[us]")
                        .astype(np.int64).to_numpy())
            return month_frame(*cust_kernel(d))

        parts = (ds.groupby("o_custkey")
                 .map_groups(per_cust, batch_format="pandas"))
        agg = (parts.groupby("month_epoch")
               .aggregate(Sum("n_pairs", alias_name="n_pairs"))
               .to_pandas())
    agg["month_epoch"] = agg.month_epoch.astype(np.int64)
    agg["n_pairs"] = agg.n_pairs.astype(np.int64)
    return agg.sort_values("month_epoch").reset_index(drop=True)


def strict_funnel_users(sf_dir: str, window_hours: int = 24,
                        steps: tuple = ("view", "click", "purchase")):
    """STRICT-SEQUENCE funnel (ordered triple within one window —
    stricter than ``funnel_conversion``'s first-touch minima): count
    users with at least one view < click < purchase chain whose total
    span is ≤ ``window_hours``.  Per-user kernel: for each middle
    step, the OPTIMAL witnesses are the latest earlier first-step and
    the earliest later last-step (two searchsorteds); a chain exists
    iff some middle event's witness span fits the window.  Single-row
    exact output; per-user map_groups above the gate emits 0/1
    partials into a native Sum."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    w_us = int(window_hours) * 3_600_000_000
    s0, s1, s2 = steps

    def user_converted(tp: np.ndarray, ts: np.ndarray) -> bool:
        a = np.sort(ts[tp == s0])
        b = np.sort(ts[tp == s1])
        c = np.sort(ts[tp == s2])
        if not (len(a) and len(b) and len(c)):
            return False
        ia = np.searchsorted(a, b, side="left") - 1   # latest a < b
        ic = np.searchsorted(c, b, side="right")      # earliest c > b
        ok = (ia >= 0) & (ic < len(c))
        if not ok.any():
            return False
        return bool((c[ic[ok]] - a[ia[ok]] <= w_us).any())

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas().sort_values("user_id")
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        tp = df.event_type.to_numpy(dtype=object)
        uid = df.user_id.to_numpy()
        cuts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        n = sum(user_converted(tp[lo:hi], ts[lo:hi])
                for lo, hi in zip(cuts, np.append(cuts[1:], len(uid))))
    else:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            ts = (g.ts.astype("datetime64[us]").astype(np.int64)
                  .to_numpy())
            conv = user_converted(g.event_type.to_numpy(dtype=object),
                                  ts)
            return pd.DataFrame({"c": np.asarray([int(conv)],
                                                 np.int64)})

        parts = (ds.groupby("user_id")
                 .map_groups(per_user, batch_format="pandas"))

        def total(b: pa.Table) -> pa.Table:
            return pa.table({"c": pa.array(
                [int(b["c"].to_numpy(zero_copy_only=False).sum())],
                pa.int64())})

        n = int(parts.map_batches(total, batch_format="pyarrow")
                .to_pandas().c.sum())
    return pd.DataFrame({"n_users": np.asarray([n], np.int64)})


def lang_bigram_jsd(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between the per-language
    word-bigram distributions — the corpus-drift / contamination
    screen in information-theoretic units.  Distributed shape: block
    partials PIVOT counts into one column per language (languages
    discovered in a tiny pre-pass), so ONE native Sum groupby on
    bigram co-locates every language's count for a key with no
    per-group Python; per-pair JSD terms then vectorize per block and
    fold into |langs|² rows.  Driver tier: pandas pivot_table.  The
    exact-integer anchors (union / common bigram counts) pin the
    float column, which rounds to 6 dp like every entropy oracle."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    langs = sorted(ds.groupby("lang").count().to_pandas()["lang"]
                   .to_numpy(dtype=object))
    lcols = [f"n_{i}" for i in range(len(langs))]
    lidx = {l: i for i, l in enumerate(langs)}

    def partial(b: pa.Table) -> pa.Table:
        from biobloom_ray.stages.textstats import _token_arrays

        flat, _lens, row_of = _token_arrays(b)
        cols = {"bigram": pd.Series([], dtype=object)}
        cols.update({c: pd.Series([], dtype=np.int64) for c in lcols})
        if len(flat) < 2:
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        preserve_index=False)
        lg = b["lang"].to_pandas().to_numpy(dtype=object)
        same = row_of[1:] == row_of[:-1]
        bg = (pd.Series(flat[:-1][same], dtype=object)
              .str.cat(pd.Series(flat[1:][same], dtype=object),
                       sep=" "))
        df = pd.DataFrame({"lang": lg[row_of[:-1][same]],
                           "bigram": bg.to_numpy(dtype=object)})
        agg = (df.groupby(["lang", "bigram"], as_index=False).size())
        piv = (agg.pivot_table(index="bigram", columns="lang",
                               values="size", fill_value=0,
                               aggfunc="sum").reset_index())
        out = pd.DataFrame({"bigram": piv.bigram
                            .to_numpy(dtype=object)})
        for l in langs:
            out[lcols[lidx[l]]] = (piv[l].to_numpy(np.int64)
                                   if l in piv.columns
                                   else np.zeros(len(piv), np.int64))
        return pa.Table.from_pandas(out, preserve_index=False)

    def pair_terms(mat: np.ndarray, tot: np.ndarray) -> pd.DataFrame:
        """(vocab_chunk × L) counts + GLOBAL totals → per-pair partial
        (Σ jsd terms, union tally, common tally) — associative."""
        rows = []
        for i in range(len(langs)):
            for j in range(i + 1, len(langs)):
                na, nb = mat[:, i], mat[:, j]
                m = (na > 0) | (nb > 0)
                p = na[m] / tot[i] if tot[i] else na[m] * 0.0
                q = nb[m] / tot[j] if tot[j] else nb[m] * 0.0
                mid = 0.5 * (p + q)
                with np.errstate(divide="ignore", invalid="ignore"):
                    ta = np.where(p > 0, p * np.log(
                        np.where(p > 0, p, 1.0) / np.where(
                            mid > 0, mid, 1.0)), 0.0)
                    tb = np.where(q > 0, q * np.log(
                        np.where(q > 0, q, 1.0) / np.where(
                            mid > 0, mid, 1.0)), 0.0)
                rows.append((langs[i], langs[j],
                             0.5 * float(ta.sum())
                             + 0.5 * float(tb.sum()),
                             int(m.sum()),
                             int(((na > 0) & (nb > 0)).sum())))
        return pd.DataFrame(rows, columns=["lang_a", "lang_b", "term",
                                           "n_union", "n_common"])

    def finish(parts: pd.DataFrame) -> pd.DataFrame:
        agg = (parts.groupby(["lang_a", "lang_b"], as_index=False)
               .agg(jsd_r6=("term", "sum"), n_union=("n_union", "sum"),
                    n_common=("n_common", "sum")))
        agg["jsd_r6"] = agg.jsd_r6.round(6)
        agg["n_union"] = agg.n_union.astype(np.int64)
        agg["n_common"] = agg.n_common.astype(np.int64)
        return (agg[["lang_a", "lang_b", "n_union", "n_common",
                     "jsd_r6"]].sort_values(["lang_a", "lang_b"])
                .reset_index(drop=True))

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= BIGRAM_DRIVER_MAX_ROWS:
        p = _parts_pandas(parts_ds, dict(
            [("bigram", object)] + [(c, np.int64) for c in lcols]))
        agg = p.groupby("bigram", as_index=False)[lcols].sum()
        mat = agg[lcols].to_numpy(np.int64)
        return finish(pair_terms(mat, mat.sum(axis=0)
                                 .astype(np.float64)))
    # cluster tier: ONE native Sum groupby co-locates each bigram's
    # per-lang counts; totals broadcast; per-block pair partials fold
    # to |blocks| × |pairs| rows — nothing vocab-scale leaves workers
    counts_ds = (parts_ds.groupby("bigram")
                 .aggregate(*[Sum(c, alias_name=c) for c in lcols])
                 .materialize())

    def col_sums(b: pa.Table) -> pa.Table:
        return pa.table({c: pa.array(
            [int(b[c].to_numpy(zero_copy_only=False).sum())],
            pa.int64()) for c in lcols})

    tot = (counts_ds.map_batches(col_sums, batch_format="pyarrow")
           .to_pandas()[lcols].sum().to_numpy(np.float64))
    import ray as _ray

    tot_ref = _ray.put(tot)

    def block_terms(b: pa.Table) -> pa.Table:
        sub = np.stack([b[c].to_numpy(zero_copy_only=False)
                        for c in lcols], axis=1).astype(np.int64)
        return pa.Table.from_pandas(
            pair_terms(sub, _ray.get(tot_ref)), preserve_index=False)

    parts = _parts_pandas(
        counts_ds.map_batches(block_terms, batch_format="pyarrow"),
        {"lang_a": object, "lang_b": object, "term": np.float64,
         "n_union": np.int64, "n_common": np.int64})
    return finish(parts)


def local_supplier_revenue(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5 shape — the FOUR-way star join (lineitem ⋈ orders ⋈
    customer ⋈ supplier) with the cross-dimension equality
    c_nationkey = s_nationkey and a region filter: revenue by nation
    where the customer and the shipping supplier are co-national.
    Plan: the region's nation keys broadcast (tiny); the supplier →
    nation map attaches MAP-SIDE to lineitem (dimension broadcast
    below the gate, hash join above) with non-region rows dropped
    before any shuffle; customers prune to the region BEFORE the
    orders join; the two fact-scale sides meet in ONE orderkey hash
    join of pre-reduced (orderkey, nation, revenue) partials, and the
    co-nationality predicate applies map-side on the join output."""
    import ray

    from biobloom_ray.io import hash_join

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg[reg.r_name == region].r_regionkey.iloc[0])
    nkeys = np.sort(nat[nat.n_regionkey == rkey]
                    .n_nationkey.to_numpy(np.int64))
    names = dict(zip(nat.n_nationkey.to_numpy(np.int64),
                     nat.n_name.to_numpy(dtype=object)))
    nk_ref = ray.put(nkeys)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def in_region(b: pa.Table, col: str) -> pa.Table:
        keys = ray.get(nk_ref)
        v = b[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, v)
        pos[pos >= len(keys)] = 0
        return b.filter(pa.array(keys[pos] == v))

    cust_r = cust.map_batches(lambda b: in_region(b, "c_nationkey"),
                              batch_format="pyarrow")
    supp_r = supp.map_batches(lambda b: in_region(b, "s_nationkey"),
                              batch_format="pyarrow")

    n_cust = _cheap_count(cust)
    broadcast = (n_cust is not None
                 and n_cust <= CUST_BROADCAST_MAX_ROWS)
    # supplier → nation map for the lineitem side
    sp = supp_r.to_pandas() if broadcast else None

    def li_partial(b: pa.Table, smap) -> pa.Table:
        sk = np.sort(smap.s_suppkey.to_numpy(np.int64))
        order = np.argsort(smap.s_suppkey.to_numpy(np.int64))
        sn = smap.s_nationkey.to_numpy(np.int64)[order]
        v = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, v)
        pos[pos >= len(sk)] = 0
        hit = (sk[pos] == v) if len(sk) else np.zeros(len(v), bool)
        sub = b.filter(pa.array(hit))
        if sub.num_rows == 0:
            return pa.table({"ok": pa.array([], pa.int64()),
                             "snat": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        snat = sn[pos[hit]]
        cents = _cents_away(
            sub["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(sub["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "ok": sub["l_orderkey"].to_numpy(zero_copy_only=False),
            "snat": snat, "rev": cents * (100 - disc)})
        agg = (df.groupby(["ok", "snat"], as_index=False)
               .agg(rev=("rev", "sum"), n=("rev", "size")))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    if broadcast:
        sp_ref = ray.put(sp)
        li_parts = li.map_batches(
            lambda b: li_partial(b, ray.get(sp_ref)),
            batch_format="pyarrow")
        cu = cust_r.to_pandas()
        ck = np.sort(cu.c_custkey.to_numpy(np.int64))
        order = np.argsort(cu.c_custkey.to_numpy(np.int64))
        cn = cu.c_nationkey.to_numpy(np.int64)[order]
        cu_ref = ray.put((ck, cn))

        def ord_map(b: pa.Table) -> pa.Table:
            kk, nn = ray.get(cu_ref)
            v = b["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, v)
            pos[pos >= len(kk)] = 0
            hit = (kk[pos] == v) if len(kk) else np.zeros(len(v), bool)
            sub = b.filter(pa.array(hit))
            return pa.table({
                "ok2": sub["o_orderkey"].cast(pa.int64()),
                "cnat": pa.array(nn[pos[hit]].astype(np.int64))})

        # the region-filtered (orderkey -> customer-nation) link is
        # bounded by the SAME orders gate this tier requires, so it
        # broadcasts as sorted arrays and the attach + co-nationality
        # predicate run map-side — no orderkey exchange below the
        # gate (the hash-join plan remains the at-scale else branch)
        op = (orders.map_batches(ord_map, batch_format="pyarrow")
              .to_pandas())
        oo = np.argsort(op.ok2.to_numpy(np.int64))
        ok_arr = op.ok2.to_numpy(np.int64)[oo]
        cn_arr = op.cnat.to_numpy(np.int64)[oo]
        oy_ref = ray.put((ok_arr, cn_arr))

        def cnat_attach(b: pa.Table) -> pa.Table:
            kk, nn = ray.get(oy_ref)
            v = b["ok"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, v)
            pos[pos >= len(kk)] = 0
            hit = (kk[pos] == v) if len(kk) else np.zeros(len(v), bool)
            sub = b.filter(pa.array(hit))
            return sub.append_column(
                "cnat", pa.array(nn[pos[hit]].astype(np.int64)))

        joined = li_parts.map_batches(cnat_attach,
                                      batch_format="pyarrow")
    else:
        # cluster tier: both attaches are hash joins; lineitem first
        # pre-reduces per block on (orderkey, suppkey)
        def li_pre(b: pa.Table) -> pa.Table:
            cents = _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))
            disc = _cents_away(
                b["l_discount"].to_numpy(zero_copy_only=False))
            df = pd.DataFrame({
                "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
                "rev": cents * (100 - disc)})
            agg = (df.groupby(["ok", "sk"], as_index=False)
                   .agg(rev=("rev", "sum"), n=("rev", "size")))
            agg["n"] = agg.n.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        li_sup = hash_join(li.map_batches(li_pre,
                                          batch_format="pyarrow"),
                           supp_r, on=("sk",), right_on=("s_suppkey",))

        def li_rename(b: pa.Table) -> pa.Table:
            return pa.table({"ok": b["ok"],
                             "snat": b["s_nationkey"].cast(pa.int64()),
                             "rev": b["rev"], "n": b["n"]})

        li_parts = li_sup.map_batches(li_rename, batch_format="pyarrow")
        ords_j = hash_join(orders, cust_r, on=("o_custkey",),
                           right_on=("c_custkey",))

        def ord_rename(b: pa.Table) -> pa.Table:
            return pa.table({
                "ok2": b["o_orderkey"].cast(pa.int64()),
                "cnat": b["c_nationkey"].cast(pa.int64())})

        ords = ords_j.map_batches(ord_rename, batch_format="pyarrow")
        joined = hash_join(li_parts, ords, on=("ok",), right_on=("ok2",))

    def conational(b: pa.Table) -> pa.Table:
        m = pc.equal(b["snat"], b["cnat"])
        sub = b.filter(m)
        df = pd.DataFrame({
            "nat": sub["snat"].to_numpy(zero_copy_only=False),
            "revenue": sub["rev"].to_numpy(zero_copy_only=False),
            "n_items": sub["n"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby("nat", as_index=False)
               [["revenue", "n_items"]].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = _parts_pandas(
        joined.map_batches(conational, batch_format="pyarrow"),
        {"nat": np.int64, "revenue": np.int64, "n_items": np.int64})
    agg = (parts.groupby("nat", as_index=False)
           [["revenue", "n_items"]].sum())
    agg["n_name"] = agg.nat.map(names)
    out = agg[["n_name", "revenue", "n_items"]] \
        .sort_values("n_name").reset_index(drop=True)
    out["revenue"] = out.revenue.astype(np.int64)
    out["n_items"] = out.n_items.astype(np.int64)
    return out


def cheapest_shipper_per_brand(sf_dir: str):
    """TPC-H Q2 shape — ARGMIN over a join: for every part brand, the
    supplier with the minimum account balance among suppliers that
    ever shipped that brand (ties → smaller suppkey).  The
    (brand, suppkey) link table block-dedupes before any shuffle
    (duplicate links are argmin-neutral); brand attaches from the
    part dimension (driver merge below the gate, hash join above);
    the argmin itself folds associatively — per-block argmin partials
    → a ≤ |brands| driver resolve.  The supplier balance map
    broadcasts below the dimension gate and hash-joins above it."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def link_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    links = li.map_batches(link_partial, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["p_brand", "cents", "sk"])
                .drop_duplicates("p_brand")
                [["p_brand", "sk", "cents"]])

    n_supp = _cheap_count(supp)
    small_supp = (n_supp is not None
                  and n_supp <= CUST_BROADCAST_MAX_ROWS)
    sb_ref = None
    if small_supp:
        sp = supp.to_pandas()
        order = np.argsort(sp.s_suppkey.to_numpy(np.int64))
        sb_ref = ray.put((sp.s_suppkey.to_numpy(np.int64)[order],
                          _cents_away(sp.s_acctbal.to_numpy())[order]))

    def attach_bal(df: pd.DataFrame) -> pd.DataFrame:
        kk, bal = ray.get(sb_ref)
        pos = np.searchsorted(kk, df.sk.to_numpy(np.int64))
        pos[pos >= len(kk)] = 0
        return df.assign(cents=bal[pos])

    n_li = _cheap_count(li)
    if (n_li is not None and n_li <= PART_DRIVER_MAX_ROWS
            and small_supp):
        pt = part.to_pandas()
        ln = (links.to_pandas().drop_duplicates()
              .merge(pt, left_on="pk", right_on="p_partkey"))
        resolved = resolve(attach_bal(ln[["p_brand", "sk"]]))
    else:
        branded = hash_join(links, part, on=("pk",),
                            right_on=("p_partkey",))
        if not small_supp:  # dimension too big to broadcast: join it
            branded = hash_join(branded, supp, on=("sk",),
                                right_on=("s_suppkey",))

        def blk(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "p_brand": pd.Series(b["p_brand"].to_pandas())
                .to_numpy(dtype=object),
                "sk": b["sk"].to_numpy(zero_copy_only=False)})
            if small_supp:
                df = attach_bal(df)
            else:
                df = df.assign(cents=_cents_away(
                    b["s_acctbal"].to_numpy(zero_copy_only=False)))
            return pa.Table.from_pandas(resolve(df),
                                        preserve_index=False)

        parts = _parts_pandas(
            branded.map_batches(blk, batch_format="pyarrow"),
            {"p_brand": object, "sk": np.int64, "cents": np.int64})
        resolved = (parts.sort_values(["p_brand", "cents", "sk"])
                    .drop_duplicates("p_brand"))
    out = resolved.rename(columns={"sk": "s_suppkey",
                                   "cents": "acctbal_cents"})
    out["s_suppkey"] = out.s_suppkey.astype(np.int64)
    out["acctbal_cents"] = out.acctbal_cents.astype(np.int64)
    return (out[["p_brand", "s_suppkey", "acctbal_cents"]]
            .sort_values("p_brand").reset_index(drop=True))


def grouped_higher_moments(sf_dir: str):
    """Grouped 3rd/4th-moment statistics — population skewness and
    excess kurtosis of ``value`` per event type — from ASSOCIATIVE
    power-sum partials (n, Σx, Σx², Σx³, Σx⁴), the same
    moment-partial shape as the distributed PCA.  Conditioning: x is
    shifted by the exact per-type integer cent MINIMUM (a tiny exact
    pre-pass) and scaled to dollars, so every x⁴ stays below 2⁵³ and
    each element's powers are bit-identical on the pipeline and the
    DuckDB oracle (powers composed as (x·x)·(x·x) on both sides);
    only the final fold order differs, absorbed by the 6-dp
    contract."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def min_partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object), "mn": cents})
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False)["mn"].min(),
            preserve_index=False)

    mins = (_parts_pandas(ds.map_batches(min_partial,
                                         batch_format="pyarrow"),
                          {"event_type": object, "mn": np.int64})
            .groupby("event_type", as_index=False)["mn"].min())
    mmap = dict(zip(mins.event_type, mins.mn.astype(np.int64)))
    import ray as _ray

    mm_ref = _ray.put(mmap)

    def pow_partial(b: pa.Table) -> pa.Table:
        mm = _ray.get(mm_ref)
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        et = pd.Series(b["event_type"].to_pandas()) \
            .to_numpy(dtype=object)
        shift = np.fromiter((mm[t] for t in et), dtype=np.int64,
                            count=len(et))
        x = (cents - shift) / 100.0
        x2 = x * x
        x4 = x2 * x2
        df = pd.DataFrame({"event_type": et, "n": np.int64(1),
                           "s1": x, "s2": x2, "s3": x2 * x, "s4": x4})
        agg = (df.groupby("event_type", as_index=False)
               .agg(n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"),
                    s3=("s3", "sum"), s4=("s4", "sum")))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = _parts_pandas(
        ds.map_batches(pow_partial, batch_format="pyarrow"),
        {"event_type": object, "n": np.int64, "s1": np.float64,
         "s2": np.float64, "s3": np.float64, "s4": np.float64})
    agg = (parts.groupby("event_type", as_index=False)
           [["n", "s1", "s2", "s3", "s4"]].sum())
    n = agg.n.to_numpy(np.float64)
    mu = agg.s1 / n
    # explicit multiply chains, mirrored verbatim in the SQL oracle so
    # each term is the same IEEE op sequence; only fold order differs
    m2 = agg.s2 / n - mu * mu
    m3 = agg.s3 / n - 3 * mu * (agg.s2 / n) + 2 * (mu * mu * mu)
    m4 = (agg.s4 / n - 4 * mu * (agg.s3 / n)
          + 6 * (mu * mu) * (agg.s2 / n) - 3 * (mu * mu * mu * mu))
    out = pd.DataFrame({
        "event_type": agg.event_type,
        "n": agg.n.astype(np.int64),
        "skew_r6": (m3 / (m2 * np.sqrt(m2))).round(6),
        "exkurt_r6": (m4 / (m2 * m2) - 3.0).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)


def sliding_distinct_users(sf_dir: str, window_hours: int = 6):
    """SLIDING exact distinct (vs the tumbling `windowed_distinct_
    users`): per (event_type, hour) on the dense hour grid, the
    distinct users seen in the TRAILING ``window_hours`` hours.  Halo
    expansion makes it shuffle-native: each block-deduped (type,
    user, hour) triple replicates to its ≤ W target hours, then the
    same two chained native groupbys as every exact-distinct op
    (cluster-wide dedup of (type, target, user), then count per
    window).  The expansion factor is the window length — bounded and
    chosen, not data-driven."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "user_id"])
    span = _read(sf_dir, "events", columns=["ts"])

    def ts_bounds(b: pa.Table) -> pa.Table:
        t = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False)) // 3_600_000_000
        return pa.table({"lo": pa.array([int(t.min())], pa.int64()),
                         "hi": pa.array([int(t.max())], pa.int64())})

    bounds = _parts_pandas(span.map_batches(ts_bounds,
                                            batch_format="pyarrow"),
                           {"lo": np.int64, "hi": np.int64})
    lo_h, hi_h = int(bounds.lo.min()), int(bounds.hi.max())
    w = int(window_hours)

    def halo_partial(b: pa.Table) -> pa.Table:
        t = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False)) // 3_600_000_000
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "h": t}).drop_duplicates()
        rep = df.loc[df.index.repeat(w)].reset_index(drop=True)
        rep["target"] = (rep.h.to_numpy(np.int64)
                         + np.tile(np.arange(w, dtype=np.int64),
                                   len(df)))
        rep = rep[rep.target <= hi_h]
        out = (rep[["event_type", "user_id", "target"]]
               .drop_duplicates())
        out["target"] = out.target.astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts_ds = ds.map_batches(halo_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        trip = (_parts_pandas(parts_ds, {"event_type": object,
                                         "user_id": np.int64,
                                         "target": np.int64})
                .drop_duplicates())
        agg = (trip.groupby(["event_type", "target"], as_index=False)
               .agg(n_users=("user_id", "size")))
    else:
        dedup = (parts_ds.groupby(["event_type", "target", "user_id"])
                 .aggregate(Count(alias_name="_c")))
        agg = (dedup.groupby(["event_type", "target"])
               .aggregate(Count(alias_name="n_users")).to_pandas())
    agg = agg.rename(columns={"target": "hour_epoch"})
    agg["hour_epoch"] = agg.hour_epoch.astype(np.int64) * 3600
    agg["n_users"] = agg.n_users.astype(np.int64)
    return (agg.sort_values(["event_type", "hour_epoch"])
            .reset_index(drop=True))


def full_quarter_customers(sf_dir: str, year: int = 1997):
    """RELATIONAL DIVISION (the FOR-ALL operator): customers who
    ordered in EVERY quarter of ``year``, counted per nation.  Plan:
    in-year orders block-dedupe to (custkey, quarter) links (≤ 4 per
    customer per block), a native dedup groupby makes them cluster-
    wide distinct, a second rollup counts quarters per customer, the
    ==4 survivors attach their nation from the customer table
    (broadcast probe below the gate, hash join above), and the
    nation rollup is dimension-sized."""
    import ray

    from biobloom_ray.io import hash_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    def link_partial(b: pa.Table) -> pa.Table:
        ts = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        m = (ts >= lo) & (ts < hi)
        month = (ts[m].astype("datetime64[us]")
                 .astype("datetime64[M]").astype(np.int64) % 12)
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False)[m],
            "q": (month // 3 + 1).astype(np.int64)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    links = orders.map_batches(link_partial, batch_format="pyarrow")
    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= ANTI_BROADCAST_MAX_ROWS:
        ln = (_parts_pandas(links, {"ck": np.int64, "q": np.int64})
              .drop_duplicates())
        qc = ln.groupby("ck", as_index=False).agg(nq=("q", "size"))
        winners = np.sort(qc[qc.nq == 4].ck.to_numpy(np.int64))
        w_ref = ray.put(winners)

        def nat_partial(b: pa.Table) -> pa.Table:
            keys = ray.get(w_ref)
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                sub = b.slice(0, 0)
            else:
                pos = np.searchsorted(keys, ck)
                pos[pos >= len(keys)] = 0
                sub = b.filter(pa.array(keys[pos] == ck))
            df = pd.DataFrame({"nk": sub["c_nationkey"]
                               .to_numpy(zero_copy_only=False)
                               .astype(np.int64)})
            agg = (df.groupby("nk", as_index=False)
                   .size().rename(columns={"size": "n_customers"}))
            agg["n_customers"] = agg.n_customers.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts = cust.map_batches(nat_partial, batch_format="pyarrow")
    else:
        dedup = (links.groupby(["ck", "q"])
                 .aggregate(Count(alias_name="_c")))
        qc = dedup.groupby("ck").aggregate(Count(alias_name="nq"))

        def keep4(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["nq"], 4)).select(["ck"])

        winners_ds = qc.map_batches(keep4, batch_format="pyarrow")
        joined = hash_join(winners_ds, cust, on=("ck",),
                           right_on=("c_custkey",))

        def nat_partial2(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({"nk": b["c_nationkey"]
                               .to_numpy(zero_copy_only=False)
                               .astype(np.int64)})
            agg = (df.groupby("nk", as_index=False)
                   .size().rename(columns={"size": "n_customers"}))
            agg["n_customers"] = agg.n_customers.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts = joined.map_batches(nat_partial2, batch_format="pyarrow")
    agg = (_parts_pandas(parts, {"nk": np.int64,
                                 "n_customers": np.int64})
           .groupby("nk", as_index=False)["n_customers"].sum())
    names = _read(sf_dir, "nation",
                  columns=["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(names, left_on="nk",
                    right_on="n_nationkey")[["n_name", "n_customers"]]
    out["n_customers"] = out.n_customers.astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def exact_median_bisect(sf_dir: str, n_buckets: int = 1024):
    """EXACT global median by ADAPTIVE MULTI-PASS SELECTION — the
    distributed k-th-element algorithm for domains too wide for one
    count table: each pass histograms the surviving [lo, hi] cent
    range into ``n_buckets`` sub-ranges (a map-only partial + a tiny
    driver fold), the bucket holding the target rank becomes the next
    range, and the loop exits when the range collapses to one cent —
    ⌈log_B(domain)⌉ passes total (2 here), never materializing a
    value-cardinality table.  Lower-median contract
    (PERCENTILE_DISC(0.5)): the smallest value whose cumulative count
    reaches ⌈n/2⌉."""
    ds = _read(sf_dir, "events", columns=["value"])

    def minmax(b: pa.Table) -> pa.Table:
        c = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        return pa.table({"lo": pa.array([int(c.min())], pa.int64()),
                         "hi": pa.array([int(c.max())], pa.int64()),
                         "n": pa.array([len(c)], pa.int64())})

    mm = _parts_pandas(ds.map_batches(minmax, batch_format="pyarrow"),
                       {"lo": np.int64, "hi": np.int64, "n": np.int64})
    lo, hi, n = int(mm.lo.min()), int(mm.hi.max()), int(mm.n.sum())
    k = (n + 1) // 2  # 1-based target rank (lower median)
    below = 0  # values strictly below current lo
    while hi > lo:
        edges = np.unique(np.linspace(lo, hi + 1, n_buckets + 1)
                          .astype(np.int64))

        def hist(b: pa.Table, e=edges, l=lo, h=hi) -> pa.Table:
            c = _cents_away(b["value"].to_numpy(zero_copy_only=False))
            c = c[(c >= l) & (c <= h)]
            cnt = np.zeros(len(e) - 1, dtype=np.int64)
            if len(c):
                idx = np.searchsorted(e, c, side="right") - 1
                np.add.at(cnt, idx, 1)
            return pa.table({"b": pa.array(
                np.arange(len(cnt), dtype=np.int64)),
                "cnt": pa.array(cnt)})

        h = (_parts_pandas(ds.map_batches(hist, batch_format="pyarrow"),
                           {"b": np.int64, "cnt": np.int64})
             .groupby("b")["cnt"].sum().sort_index().to_numpy())
        cum = below + np.cumsum(h)
        j = int(np.searchsorted(cum, k))
        below = int(below + (np.cumsum(h)[j - 1] if j else 0))
        lo, hi = int(edges[j]), int(edges[j + 1]) - 1
    return pd.DataFrame({"n": np.asarray([n], np.int64),
                         "median_cents": np.asarray([lo], np.int64)})


def clean_conversion_users(sf_dir: str, window_hours: int = 2):
    """Temporal NEGATION pattern (match A→B with NO intervening C):
    users with a view → purchase pair within ``window_hours`` and no
    'error' event strictly between them.  Per-user witness argument:
    for each purchase, only the LATEST in-window view need be checked
    — any earlier view's interval is a superset, so an error spoiling
    the latest view spoils them all.  Kernel: two searchsorteds
    (latest view, error count in the open interval via rank
    difference).  Single-row exact output; per-user map_groups above
    the gate."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    w_us = int(window_hours) * 3_600_000_000

    def user_clean(tp: np.ndarray, ts: np.ndarray) -> bool:
        v = np.sort(ts[tp == "view"])
        p = np.sort(ts[tp == "purchase"])
        e = np.sort(ts[tp == "error"])
        if not (len(v) and len(p)):
            return False
        iv = np.searchsorted(v, p, side="left") - 1  # latest view < p
        ok = (iv >= 0)
        if not ok.any():
            return False
        vv, pp = v[iv[ok]], p[ok]
        ok2 = pp - vv <= w_us
        if not ok2.any():
            return False
        vv, pp = vv[ok2], pp[ok2]
        n_err = (np.searchsorted(e, pp, side="left")
                 - np.searchsorted(e, vv, side="right"))
        return bool((n_err == 0).any())

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas().sort_values("user_id")
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        tp = df.event_type.to_numpy(dtype=object)
        uid = df.user_id.to_numpy()
        cuts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        n = sum(user_clean(tp[lo:hi], ts[lo:hi])
                for lo, hi in zip(cuts, np.append(cuts[1:], len(uid))))
    else:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            ts = (g.ts.astype("datetime64[us]").astype(np.int64)
                  .to_numpy())
            c = user_clean(g.event_type.to_numpy(dtype=object), ts)
            return pd.DataFrame({"c": np.asarray([int(c)], np.int64)})

        parts = (ds.groupby("user_id")
                 .map_groups(per_user, batch_format="pandas"))

        def total(b: pa.Table) -> pa.Table:
            return pa.table({"c": pa.array(
                [int(b["c"].to_numpy(zero_copy_only=False).sum())],
                pa.int64())})

        n = int(parts.map_batches(total, batch_format="pyarrow")
                .to_pandas().c.sum())
    return pd.DataFrame({"n_users": np.asarray([n], np.int64)})


def acctbal_cont_quantiles(sf_dir: str, qs: tuple = (0.5, 0.9)):
    """PERCENTILE_CONT — the INTERPOLATED quantile semantic (the
    existing per-nation percentiles are PERCENTILE_DISC): per nation,
    linearly interpolated p50/p90 of customer balances, exact from
    the (nation, cents, count) table.  The standard formula
    h = (n−1)·q, v = v⌊h⌋ + (h−⌊h⌋)·(v⌈h⌉ − v⌊h⌋) evaluates on the
    duplicate-inclusive sorted multiset via cumulative-count
    searchsorteds (no expansion).  Count-table partials combine
    tiered; the interpolation walk runs per nation on the
    value-cardinality table."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "nk": b["c_nationkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "cents": _cents_away(
                b["c_acctbal"].to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["nk", "cents"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        ct = (_parts_pandas(parts_ds, {"nk": np.int64,
                                       "cents": np.int64,
                                       "n": np.int64})
              .groupby(["nk", "cents"], as_index=False)["n"].sum())
    else:
        ct = (parts_ds.groupby(["nk", "cents"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for nk, g in ct.groupby("nk", sort=True):
        g = g.sort_values("cents")
        v = g.cents.to_numpy(np.int64).astype(np.float64)
        cum = g.n.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        vals = []
        for q in qs:
            hpos = (n - 1) * q
            lo_i, hi_i = int(np.floor(hpos)), int(np.ceil(hpos))
            vlo = v[np.searchsorted(cum, lo_i + 1)]
            vhi = v[np.searchsorted(cum, hi_i + 1)]
            vals.append(round(vlo + (hpos - lo_i) * (vhi - vlo), 6))
        rows.append((int(nk), np.int64(n), *vals))
    out = pd.DataFrame(rows, columns=["c_nationkey", "n_customers",
                                      "p50_cents_r6", "p90_cents_r6"])
    out["c_nationkey"] = out.c_nationkey.astype(np.int64)
    out["n_customers"] = out.n_customers.astype(np.int64)
    return out.sort_values("c_nationkey").reset_index(drop=True)


def value_ks_matrix(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov statistic between the ``value``
    distributions of every event-type pair — EXACT-INTEGER rational
    form: D = max|n_b·F_a(v) − n_a·F_b(v)| / (n_a·n_b), evaluated on
    the merged cent count tables, so the supremum is an int64
    cross-multiplication with no float CDF anywhere (the float column
    is one final division, 6-dp contract).  The count table combines
    tiered (native Sum groupby above the gate); the per-pair CDF walk
    runs on the value-cardinality table — the same driver scale as
    every robust-stats operator."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "t": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object),
            "v": _cents_away(b["value"].to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["t", "v"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        ct = (_parts_pandas(parts_ds, {"t": object, "v": np.int64,
                                       "n": np.int64})
              .groupby(["t", "v"], as_index=False)["n"].sum())
    else:
        ct = (parts_ds.groupby(["t", "v"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    types = sorted(ct.t.unique())
    series = {t: g.sort_values("v") for t, g in ct.groupby("t")}
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            ga, gb = series[ta], series[tb]
            na = int(ga.n.sum())
            nb = int(gb.n.sum())
            grid = np.union1d(ga.v.to_numpy(np.int64),
                              gb.v.to_numpy(np.int64))
            ca = np.zeros(len(grid), np.int64)
            cb = np.zeros(len(grid), np.int64)
            ia = np.searchsorted(grid, ga.v.to_numpy(np.int64))
            ib = np.searchsorted(grid, gb.v.to_numpy(np.int64))
            ca[ia] = ga.n.to_numpy(np.int64)
            cb[ib] = gb.n.to_numpy(np.int64)
            ca, cb = np.cumsum(ca), np.cumsum(cb)
            num = int(np.abs(nb * ca - na * cb).max())
            rows.append((ta, tb, num, na * nb,
                         round(num / (na * nb), 6)))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "ks_num",
                                      "ks_den", "ks_r6"])
    out["ks_num"] = out.ks_num.astype(np.int64)
    out["ks_den"] = out.ks_den.astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def acctbal_trimmed_stats(sf_dir: str, trim: float = 0.1):
    """Robust TRIMMED and WINSORIZED means per nation, exact from the
    cent count table: with k = ⌊trim·n⌋, the trimmed mean averages
    ranks (k, n−k] (partial multiplicities of the boundary values
    resolved by cumulative-count arithmetic — no row expansion), and
    the winsorized mean clamps to the rank-(k+1) / rank-(n−k) values.
    Integer sums throughout; the only float is the final division
    (6-dp contract).  Count-table partials combine tiered."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "nk": b["c_nationkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": _cents_away(
                b["c_acctbal"].to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["nk", "v"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        ct = (_parts_pandas(parts_ds, {"nk": np.int64, "v": np.int64,
                                       "n": np.int64})
              .groupby(["nk", "v"], as_index=False)["n"].sum())
    else:
        ct = (parts_ds.groupby(["nk", "v"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for nk, g in ct.groupby("nk", sort=True):
        g = g.sort_values("v")
        v = g.v.to_numpy(np.int64)
        n_ = g.n.to_numpy(np.int64)
        cum = np.cumsum(n_)
        n = int(cum[-1])
        k = int(np.floor(trim * n))

        def rank_value(r):  # cents value at 1-based rank r
            return int(v[np.searchsorted(cum, r)])

        # sum of the k smallest (partial multiplicity on the boundary)
        def head_sum(k_):
            if k_ <= 0:
                return 0
            j = int(np.searchsorted(cum, k_))
            full = int((v[:j] * n_[:j]).sum())
            return full + int(v[j]) * (k_ - int(cum[j - 1]) if j else k_)

        total = int((v * n_).sum())
        rev_v, rev_n = v[::-1], n_[::-1]
        rcum = np.cumsum(rev_n)

        def tail_sum(k_):
            if k_ <= 0:
                return 0
            j = int(np.searchsorted(rcum, k_))
            full = int((rev_v[:j] * rev_n[:j]).sum())
            return full + int(rev_v[j]) * (k_ - int(rcum[j - 1])
                                           if j else k_)

        mid_sum = total - head_sum(k) - tail_sum(k)
        mid_n = n - 2 * k
        lo_v, hi_v = rank_value(k + 1), rank_value(n - k)
        win_sum = mid_sum + k * lo_v + k * hi_v
        rows.append((int(nk), np.int64(n),
                     round(mid_sum / mid_n, 6),
                     round(win_sum / n, 6)))
    out = pd.DataFrame(rows, columns=["c_nationkey", "n_customers",
                                      "trim_mean_r6", "winsor_mean_r6"])
    out["c_nationkey"] = out.c_nationkey.astype(np.int64)
    out["n_customers"] = out.n_customers.astype(np.int64)
    return out.sort_values("c_nationkey").reset_index(drop=True)


def transition_cond_entropy(sf_dir: str):
    """Conditional entropy H(next type | current type) of the per-user
    event-type Markov chain — the predictability screen COMPOSED on
    top of ``event_transitions`` (which owns the exact (ts, event_id)
    LAG semantics and the salt-by-time-range cluster plan): per
    current type, the Shannon entropy (nats) of its next-type
    distribution over the |types|²-cell transition table, with the
    exact n_out integer anchor."""
    tc = event_transitions(sf_dir)
    rows = []
    for cur, g in tc.groupby("prev_type", sort=True):
        n = g.n.to_numpy(np.int64)
        tot = int(n.sum())
        p = n / tot
        rows.append((cur, np.int64(tot),
                     round(float(-(p * np.log(p)).sum()), 6)))
    out = pd.DataFrame(rows, columns=["cur_type", "n_out", "h_r6"])
    out["n_out"] = out.n_out.astype(np.int64)
    return out.sort_values("cur_type").reset_index(drop=True)


def region_share_rollup(sf_dir: str):
    """Hierarchical PERCENT-OF-PARENT rollup (ratio-to-parent across
    two dimension levels): each nation's share of its region's
    customer balance mass, and each region's share of the global
    mass — exact integer cent sums at the leaf rollup, shares as one
    final division each (6-dp contract).  The fact scan pre-reduces
    per block to (nationkey, sum, n); nation→region is a dimension
    map applied on the output-scale table."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["c_acctbal"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "nk": b["c_nationkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64), "s": cents})
        agg = (df.groupby("nk", as_index=False)
               .agg(s=("s", "sum"), n=("s", "size")))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    leaf = (_parts_pandas(ds.map_batches(partial, batch_format="pyarrow"),
                          {"nk": np.int64, "s": np.int64, "n": np.int64})
            .groupby("nk", as_index=False)[["s", "n"]].sum())
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    j = (leaf.merge(nat, left_on="nk", right_on="n_nationkey")
         .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
    rtot = j.groupby("r_name", as_index=False).s.sum() \
        .rename(columns={"s": "rs"})
    gtot = int(j.s.sum())
    out = j.merge(rtot, on="r_name")
    out["nation_share_r6"] = (out.s / out.rs).round(6)
    out["region_share_r6"] = (out.rs / gtot).round(6)
    out = out.rename(columns={"s": "sum_cents", "n": "n_customers"})
    out["sum_cents"] = out.sum_cents.astype(np.int64)
    out["n_customers"] = out.n_customers.astype(np.int64)
    return (out[["r_name", "n_name", "n_customers", "sum_cents",
                 "nation_share_r6", "region_share_r6"]]
            .sort_values(["r_name", "n_name"]).reset_index(drop=True))


def order_price_reconciliation(sf_dir: str):
    """Cross-table RECONCILIATION audit (fact-vs-rollup drift): per
    order status, how far ``o_totalprice`` sits from the order's
    lineitem extended-price sum — exact integer cent differences,
    plus the orders with no lineitems at all (a left join's null
    side, counted separately rather than silently dropped).  The
    lineitem rollup pre-reduces per block and combines tiered; order
    attributes attach by hash join above the gate / driver merge
    below."""
    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus",
                            "o_totalprice"])

    def sum_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "s": _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))})
        agg = df.groupby("ok", as_index=False)["s"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(sum_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)

    def finish(j: pd.DataFrame) -> pd.DataFrame:
        j["diff"] = np.where(
            j.s.notna(),
            (_cents_away(j.o_totalprice.to_numpy())
             - j.s.fillna(0).to_numpy(np.int64)), 0).astype(np.int64)
        j["has"] = j.s.notna()
        g = (j.groupby("o_orderstatus", as_index=False)
             .agg(n_orders=("has", "size"),
                  n_no_lines=("has", lambda x: int((~x).sum())),
                  n_exact=("diff", lambda d: 0),
                  max_abs_diff_cents=("diff", lambda d: 0)))
        # exact/max over the WITH-lines subset only
        sub = j[j.has]
        stats = (sub.assign(ad=sub["diff"].abs())
                 .groupby("o_orderstatus", as_index=False)
                 .agg(n_exact=("ad", lambda a: int((a == 0).sum())),
                      max_abs_diff_cents=("ad", "max")))
        g = (g.drop(columns=["n_exact", "max_abs_diff_cents"])
             .merge(stats, on="o_orderstatus", how="left"))
        g["n_exact"] = g.n_exact.fillna(0).astype(np.int64)
        g["max_abs_diff_cents"] = (g.max_abs_diff_cents.fillna(0)
                                   .astype(np.int64))
        g["n_orders"] = g.n_orders.astype(np.int64)
        g["n_no_lines"] = g.n_no_lines.astype(np.int64)
        return (g.sort_values("o_orderstatus").reset_index(drop=True)
                [["o_orderstatus", "n_orders", "n_no_lines", "n_exact",
                  "max_abs_diff_cents"]])

    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        sums = (_parts_pandas(parts_ds, {"ok": np.int64, "s": np.int64})
                .groupby("ok", as_index=False)["s"].sum())
        od = orders.to_pandas()
        return finish(od.merge(sums, left_on="o_orderkey",
                               right_on="ok", how="left"))
    sums_ds = parts_ds.groupby("ok").aggregate(Sum("s", alias_name="s"))
    joined = hash_join(orders, sums_ds, on=("o_orderkey",),
                       right_on=("ok",), join_type="left_outer")

    def audit_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        tc = _cents_away(df.o_totalprice.to_numpy())
        has = df.s.notna().to_numpy()
        ad = np.abs(tc - df.s.fillna(0).to_numpy(np.int64))
        out = pd.DataFrame({"o_orderstatus": df.o_orderstatus
                            .to_numpy(dtype=object),
                            "has": has, "ad": ad})
        g = (out.groupby("o_orderstatus", as_index=False)
             .agg(n_orders=("has", "size"),
                  n_no_lines=("has", lambda x: int((~x).sum())),
                  n_exact=("ad", lambda a: 0),
                  max_abs_diff_cents=("ad", "max")))
        sub = out[out.has]
        ne = (sub.groupby("o_orderstatus", as_index=False)
              .agg(n_exact=("ad", lambda a: int((a == 0).sum()))))
        g = (g.drop(columns=["n_exact"])
             .merge(ne, on="o_orderstatus", how="left"))
        g["n_exact"] = g.n_exact.fillna(0).astype(np.int64)
        for c in ["n_orders", "n_no_lines", "max_abs_diff_cents"]:
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(
            g[["o_orderstatus", "n_orders", "n_no_lines", "n_exact",
               "max_abs_diff_cents"]], preserve_index=False)

    parts = _parts_pandas(
        joined.map_batches(audit_partial, batch_format="pyarrow"),
        {"o_orderstatus": object, "n_orders": np.int64,
         "n_no_lines": np.int64, "n_exact": np.int64,
         "max_abs_diff_cents": np.int64})
    agg = (parts.groupby("o_orderstatus", as_index=False)
           .agg(n_orders=("n_orders", "sum"),
                n_no_lines=("n_no_lines", "sum"),
                n_exact=("n_exact", "sum"),
                max_abs_diff_cents=("max_abs_diff_cents", "max")))
    for c in ["n_orders", "n_no_lines", "n_exact",
              "max_abs_diff_cents"]:
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("o_orderstatus").reset_index(drop=True)


def daily_revenue_haar(sf_dir: str):
    """Multi-resolution HIERARCHICAL aggregate — an unnormalized Haar
    pyramid over each event type's daily revenue series (the shape
    time-series stores use for pre-aggregated zoom levels): the day
    grid pads to the next power of two from the GLOBAL span (exact
    bit-length arithmetic, no float log), detail coefficient (level
    l, pos i) = Σ rev(day)·sign where sign flips on bit l−1 of the
    day offset, plus the full-span approximation at the top.  All
    coefficients are exact int64 cents; the daily rollup combines
    tiered and the transform runs on the padded output-scale grid."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def day_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = ts // 86_400_000_000
        cents = _cents_away(b["value"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object), "day": day, "rev": cents})
        agg = (df.groupby(["event_type", "day"], as_index=False)
               ["rev"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(day_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds, {"event_type": object,
                                          "day": np.int64,
                                          "rev": np.int64})
                 .groupby(["event_type", "day"], as_index=False)
                 ["rev"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day"])
                 .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    d0 = int(daily.day.min())
    span = int(daily.day.max()) - d0 + 1
    slots = 1 << (span - 1).bit_length() if span > 1 else 1
    levels = slots.bit_length() - 1
    rows = []
    for et, g in daily.groupby("event_type", sort=True):
        series = np.zeros(slots, dtype=np.int64)
        series[(g.day.to_numpy(np.int64) - d0)] = \
            g.rev.to_numpy(np.int64)
        o = np.arange(slots, dtype=np.int64)
        for l in range(1, levels + 1):
            sign = 1 - 2 * ((o >> (l - 1)) & 1)
            block = o >> l
            coef = np.zeros(slots >> l, dtype=np.int64)
            np.add.at(coef, block, sign * series)
            for i, c in enumerate(coef):
                rows.append((et, np.int64(l), np.int64(i),
                             np.int64(c)))
        rows.append((et, np.int64(levels + 1), np.int64(0),
                     np.int64(series.sum())))
    out = pd.DataFrame(rows, columns=["event_type", "level", "pos",
                                      "coeff_cents"])
    for c in ["level", "pos", "coeff_cents"]:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["event_type", "level", "pos"])
            .reset_index(drop=True))


def value_drift_by_half(sf_dir: str):
    """Within-type TEMPORAL DRIFT screen (train/test shift monitor):
    split each event type's stream at the GLOBAL midpoint time, then
    compare the two halves' value distributions — exact lower medians
    (PERCENTILE_DISC) from cent count tables plus the exact-integer
    KS supremum between the halves (the same cross-multiplied form as
    ``value_ks_matrix``, here across TIME instead of across types).
    One pass builds (type, half, cents) count tables tiered; the walk
    runs on the value-cardinality table."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    span = _read(sf_dir, "events", columns=["ts"])

    def ts_bounds(b: pa.Table) -> pa.Table:
        t = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        return pa.table({"lo": pa.array([int(t.min())], pa.int64()),
                         "hi": pa.array([int(t.max())], pa.int64())})

    bounds = _parts_pandas(span.map_batches(ts_bounds,
                                            batch_format="pyarrow"),
                           {"lo": np.int64, "hi": np.int64})
    mid = (int(bounds.lo.min()) + int(bounds.hi.max())) // 2

    def partial(b: pa.Table) -> pa.Table:
        t = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "t": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object),
            "half": (t >= mid).astype(np.int64),
            "v": _cents_away(b["value"].to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["t", "half", "v"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        ct = (_parts_pandas(parts_ds, {"t": object, "half": np.int64,
                                       "v": np.int64, "n": np.int64})
              .groupby(["t", "half", "v"], as_index=False)["n"].sum())
    else:
        ct = (parts_ds.groupby(["t", "half", "v"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())

    def disc_median(g: pd.DataFrame) -> int:
        g = g.sort_values("v")
        cum = g.n.to_numpy(np.int64).cumsum()
        k = (int(cum[-1]) + 1) // 2
        return int(g.v.to_numpy(np.int64)[np.searchsorted(cum, k)])

    rows = []
    for t, gt in ct.groupby("t", sort=True):
        g0 = gt[gt.half == 0]
        g1 = gt[gt.half == 1]
        n0, n1 = int(g0.n.sum()), int(g1.n.sum())
        grid = np.union1d(g0.v.to_numpy(np.int64),
                          g1.v.to_numpy(np.int64))
        c0 = np.zeros(len(grid), np.int64)
        c1 = np.zeros(len(grid), np.int64)
        c0[np.searchsorted(grid, g0.v.to_numpy(np.int64))] = \
            g0.n.to_numpy(np.int64)
        c1[np.searchsorted(grid, g1.v.to_numpy(np.int64))] = \
            g1.n.to_numpy(np.int64)
        c0, c1 = np.cumsum(c0), np.cumsum(c1)
        num = int(np.abs(n1 * c0 - n0 * c1).max())
        rows.append((t, np.int64(n0), np.int64(n1),
                     np.int64(disc_median(g0.sort_values("v"))),
                     np.int64(disc_median(g1.sort_values("v"))),
                     round(num / (n0 * n1), 6)))
    out = pd.DataFrame(rows, columns=[
        "event_type", "n_first", "n_second", "med_first_cents",
        "med_second_cents", "ks_r6"])
    for c in ["n_first", "n_second", "med_first_cents",
              "med_second_cents"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def top_value_days_with_ties(sf_dir: str, k: int = 3):
    """Top-k WITH TIES (the RANK window semantic — every existing
    top-k uses a ROW_NUMBER tiebreak; this one KEEPS all rows tied at
    the boundary): per event type, the days whose daily revenue ranks
    in the top ``k`` by RANK() (gaps on ties, boundary ties all
    retained).  The daily rollup combines tiered; the rank filter
    runs per type on the output-scale table using a sorted-unique
    threshold (the k-th distinct rank's value), which is exactly the
    SQL RANK() <= k predicate when duplicate revenues share a
    rank."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def day_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = (ts // 86_400_000_000) * 86_400
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object),
            "day_epoch": day,
            "rev": _cents_away(b["value"]
                               .to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["event_type", "day_epoch"], as_index=False)
               ["rev"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(day_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds, {"event_type": object,
                                          "day_epoch": np.int64,
                                          "rev": np.int64})
                 .groupby(["event_type", "day_epoch"], as_index=False)
                 ["rev"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day_epoch"])
                 .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    frames = []
    for t, g in daily.groupby("event_type", sort=True):
        rv = g.rev.to_numpy(np.int64)
        # RANK() <= k keeps every row whose revenue is >= the k-th
        # ranked row's revenue (1-based rank over rev DESC)
        order = np.sort(rv)[::-1]
        thr = order[min(k, len(order)) - 1]
        sel = g[g.rev >= thr].copy()
        ranks = 1 + (order > sel.rev.to_numpy(np.int64)[:, None]) \
            .sum(axis=1)
        sel["rnk"] = ranks.astype(np.int64)
        frames.append(sel)
    out = pd.concat(frames, ignore_index=True)
    out["day_epoch"] = out.day_epoch.astype(np.int64)
    out["rev"] = out.rev.astype(np.int64)
    out["rnk"] = out.rnk.astype(np.int64)
    return (out.sort_values(["event_type", "rnk", "day_epoch"])
            [["event_type", "day_epoch", "rev", "rnk"]]
            .reset_index(drop=True))


def type_user_overlap_exact(sf_dir: str):
    """EXACT set-overlap matrix between event types over (user, day)
    activity sets — the exact twin the KMV Jaccard estimates
    (``kmv_type_jaccard``): |A ∩ B|, |A ∪ B| and the exact Jaccard
    per type pair.  Shape: each deduped (user, day) entity expands
    its ≤ |types| active-type set into pairs INSIDE the per-entity
    group (the market-basket expansion, domain-bounded), so the
    shuffle carries (pair, 1) partials only; totals come from the
    same dedup pass."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])

    def triple_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = (ts // 86_400_000_000) * 86_400
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "day": day}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    trips = ds.map_batches(triple_partial, batch_format="pyarrow")

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = (_parts_pandas(trips, {"event_type": object,
                                    "user_id": np.int64,
                                    "day": np.int64})
              .drop_duplicates())
        # vectorized pair expansion: sort by entity, pair adjacent
        # combinations via per-entity merges on the 5-type domain
        piv = (df.assign(one=1)
               .pivot_table(index=["user_id", "day"],
                            columns="event_type", values="one",
                            fill_value=0, aggfunc="max"))
        types = sorted(piv.columns)
        m = piv[types].to_numpy(np.int64)
        rows = []
        for i, a in enumerate(types):
            for j in range(i + 1, len(types)):
                inter = int((m[:, i] & m[:, j]).sum())
                union = int((m[:, i] | m[:, j]).sum())
                rows.append((a, types[j], np.int64(inter),
                             np.int64(union),
                             round(inter / union, 6) if union else 0.0))
    else:
        # cluster tier: global dedup of triples, then a per-entity
        # map_groups basket expansion into (pair, 1) partials
        dedup = (trips.groupby(["event_type", "user_id", "day"])
                 .aggregate(Count(alias_name="_c")))

        def basket(g: pd.DataFrame) -> pd.DataFrame:
            tps = sorted(set(g.event_type))
            out = {"ta": [], "tb": []}
            for i, a in enumerate(tps):
                for b_ in tps[i + 1:]:
                    out["ta"].append(a)
                    out["tb"].append(b_)
            o = pd.DataFrame(out)
            o["n"] = np.int64(1)
            return o

        pair_ds = (dedup.groupby(["user_id", "day"])
                   .map_groups(basket, batch_format="pandas"))
        pairs = (pair_ds.groupby(["ta", "tb"])
                 .aggregate(Sum("n", alias_name="n")).to_pandas())
        sz = (dedup.groupby("event_type")
              .aggregate(Count(alias_name="sz")).to_pandas())
        szmap = dict(zip(sz.event_type, sz.sz.astype(np.int64)))
        types = sorted(szmap)
        pmap = {(r.ta, r.tb): int(r.n) for r in pairs.itertuples()}
        rows = []
        for i, a in enumerate(types):
            for j in range(i + 1, len(types)):
                b_ = types[j]
                inter = pmap.get((a, b_), 0)
                union = szmap[a] + szmap[b_] - inter
                rows.append((a, b_, np.int64(inter), np.int64(union),
                             round(inter / union, 6) if union else 0.0))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_inter",
                                      "n_union", "jaccard_r6"])
    out["n_inter"] = out.n_inter.astype(np.int64)
    out["n_union"] = out.n_union.astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def view_attribution_credit(sf_dir: str, gap_hours: int = 24):
    """Session ATTRIBUTION coverage (the ads last-mile audit): split
    each user's stream into sessions (gap > ``gap_hours``, exact
    (ts, event_id) LAG ordering), then split every session's purchase
    cents into ATTRIBUTED (the session contains ≥ 1 view to credit)
    vs ORPHAN mass — all exact int64 cents, no fractional credit ever
    materialized (within one user the per-view fractions always
    re-sum to the session total, so the rollup stays integral).
    Per-user map_groups above the gate; sorted slice walk below."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts",
                        "value"])
    gap_us = int(gap_hours) * 3_600_000_000

    def user_fold(tp, ts, cents):
        """(ts, event_id)-ordered arrays of ONE user → (n_sessions,
        attributed, orphan)."""
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = np.diff(ts) > gap_us
        sid = np.cumsum(new) - 1
        ns = int(sid[-1]) + 1
        is_v = tp == "view"
        is_p = tp == "purchase"
        nv = np.zeros(ns, np.int64)
        pv = np.zeros(ns, np.int64)
        np.add.at(nv, sid[is_v], 1)
        np.add.at(pv, sid[is_p], cents[is_p])
        att = int(pv[nv > 0].sum())
        return ns, att, int(pv.sum()) - att

    def prep(df: pd.DataFrame):
        df = df.sort_values(["ts", "event_id"])
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        cents = _cents_away(df.value.to_numpy())
        return df.event_type.to_numpy(dtype=object), ts, cents

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas().sort_values(["user_id", "ts", "event_id"])
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        cents = _cents_away(df.value.to_numpy())
        tp = df.event_type.to_numpy(dtype=object)
        uid = df.user_id.to_numpy()
        cuts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        rows = []
        for lo, hi in zip(cuts, np.append(cuts[1:], len(uid))):
            ns, att, orp = user_fold(tp[lo:hi], ts[lo:hi],
                                     cents[lo:hi])
            rows.append((int(uid[lo]), ns, att, orp))
        out = pd.DataFrame(rows, columns=["user_id", "n_sessions",
                                          "attributed_cents",
                                          "orphan_cents"])
    else:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            tp, ts, cents = prep(g)
            ns, att, orp = user_fold(tp, ts, cents)
            return pd.DataFrame({
                "user_id": np.asarray([g.user_id.iloc[0]], np.int64),
                "n_sessions": np.asarray([ns], np.int64),
                "attributed_cents": np.asarray([att], np.int64),
                "orphan_cents": np.asarray([orp], np.int64)})

        out = (ds.groupby("user_id")
               .map_groups(per_user, batch_format="pandas")
               .to_pandas())
    for c in ["user_id", "n_sessions", "attributed_cents",
              "orphan_cents"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def acctbal_mean_family(sf_dir: str):
    """The MULTIPLICATIVE aggregate family: arithmetic, GEOMETRIC and
    HARMONIC means of positive customer balances per nation, from one
    pass of associative partials (n, Σcents, Σln cents, Σ1/cents) —
    the log-sum and reciprocal-sum shapes no other operator carries.
    Per-element ln/reciprocal are IEEE-deterministic; only the fold
    order differs between tiers and oracle (6-dp contract); n and the
    cent sum stay exact int64 anchors."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(b["c_acctbal"].to_numpy(zero_copy_only=False))
        nk = (b["c_nationkey"].to_numpy(zero_copy_only=False)
              .astype(np.int64))
        m = cents > 0
        x = cents[m].astype(np.float64)
        df = pd.DataFrame({"nk": nk[m], "s": cents[m],
                           "ln": np.log(x), "rc": 1.0 / x})
        df["one"] = np.int64(1)
        agg = (df.groupby("nk", as_index=False)
               .agg(n=("one", "sum"), s=("s", "sum"),
                    ln=("ln", "sum"), rc=("rc", "sum")))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = _parts_pandas(
        ds.map_batches(partial, batch_format="pyarrow"),
        {"nk": np.int64, "n": np.int64, "s": np.int64,
         "ln": np.float64, "rc": np.float64})
    agg = (parts.groupby("nk", as_index=False)
           [["n", "s", "ln", "rc"]].sum())
    n = agg.n.to_numpy(np.float64)
    out = pd.DataFrame({
        "c_nationkey": agg.nk.astype(np.int64),
        "n_pos": agg.n.astype(np.int64),
        "sum_cents": agg.s.astype(np.int64),
        "arith_r6": (agg.s / n).round(6),
        "geo_r6": np.exp(agg.ln / n).round(6),
        "harm_r6": (n / agg.rc).round(6)})
    return out.sort_values("c_nationkey").reset_index(drop=True)


def discounted_smallqty_revenue(sf_dir: str, year: int = 1996,
                                disc_lo: int = 5, disc_hi: int = 7,
                                max_qty: int = 24):
    """TPC-H Q6 shape — the pure MAP-ONLY predicate aggregate (the
    scan-efficiency baseline every optimizer paper quotes): potential
    revenue increase from discounted small-quantity lines shipped in
    one year.  Exact integers: the revenue term extprice·discount is
    kept in cents×cents (10⁻⁴-dollar) units; the discount band and
    quantity gate compare rounded int64 cents/units on both sides.
    One pass, no shuffle at any scale — partials are a single
    (sum, count) row per block."""
    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()).to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        qty = np.floor(np.abs(b["l_quantity"]
                              .to_numpy(zero_copy_only=False)) + 0.5) \
            .astype(np.int64)
        ext = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        m = ((ship >= lo) & (ship < hi) & (disc >= disc_lo)
             & (disc <= disc_hi) & (qty < max_qty))
        return pa.table({
            "revenue_e4": pa.array([int((ext[m] * disc[m]).sum())],
                                   pa.int64()),
            "n_items": pa.array([int(m.sum())], pa.int64())})

    parts = _parts_pandas(li.map_batches(partial,
                                         batch_format="pyarrow"),
                          {"revenue_e4": np.int64, "n_items": np.int64})
    return pd.DataFrame({
        "revenue_e4": np.asarray([int(parts.revenue_e4.sum())],
                                 np.int64),
        "n_items": np.asarray([int(parts.n_items.sum())], np.int64)})


def late_line_orders_by_priority(sf_dir: str, late_days: int = 60,
                                 lo: str = "1996-01-01",
                                 hi: str = "1996-07-01"):
    """TPC-H Q4 shape — EXISTS semi-join counted per group: in-window
    orders with at least one line shipped > ``late_days`` after the
    order date, per priority.  The EXISTS decorrelates into ONE
    per-order Max(shipdate) rollup (any-late ⇔ max-late, the same
    reduction Q21 uses), joined to the date-filtered orders; below
    the gate the order (date, priority) map broadcasts and the
    comparison is map-side."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    tlo = np.datetime64(lo, "us").astype(np.int64)
    thi = np.datetime64(hi, "us").astype(np.int64)
    late_us = int(late_days) * 86_400_000_000

    def mx_partial(b: pa.Table) -> pa.Table:
        ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()).to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "mx": ship})
        agg = df.groupby("ok", as_index=False)["mx"].max()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(mx_partial, batch_format="pyarrow")

    def sel_orders(b: pa.Table) -> pa.Table:
        od = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        keep = (od >= tlo) & (od < thi)
        sub = b.filter(pa.array(keep))
        return pa.table({
            "ok2": sub["o_orderkey"].cast(pa.int64()),
            "od": pa.array(od[keep]),
            "pr": sub["o_orderpriority"]})

    ords = orders.map_batches(sel_orders, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        mx = (_parts_pandas(parts_ds, {"ok": np.int64, "mx": np.int64})
              .groupby("ok", as_index=False)["mx"].max())
        od = ords.to_pandas()
        j = od.merge(mx, left_on="ok2", right_on="ok", how="inner")
        late = j[j.mx > j.od + late_us]
        counts = (late.groupby("pr", as_index=False)
                  .size().rename(columns={"size": "n_orders",
                                          "pr": "o_orderpriority"}))
    else:
        mx_ds = (parts_ds.groupby("ok")
                 .aggregate(Max("mx", alias_name="mx")))
        joined = hash_join(ords, mx_ds, on=("ok2",), right_on=("ok",))

        def late_partial(b: pa.Table) -> pa.Table:
            m = (b["mx"].to_numpy(zero_copy_only=False)
                 > b["od"].to_numpy(zero_copy_only=False) + late_us)
            vc = (pd.Series(b.filter(pa.array(m))["pr"].to_pandas())
                  .value_counts().sort_index())
            return pa.table({
                "o_orderpriority": pa.array(
                    vc.index.to_numpy(dtype=object), pa.string()),
                "n_orders": pa.array(vc.to_numpy(np.int64))})

        counts = (_parts_pandas(
            joined.map_batches(late_partial, batch_format="pyarrow"),
            {"o_orderpriority": object, "n_orders": np.int64})
            .groupby("o_orderpriority", as_index=False)
            ["n_orders"].sum())
    counts["n_orders"] = counts.n_orders.astype(np.int64)
    return (counts.sort_values("o_orderpriority")
            .reset_index(drop=True))


def smallqty_brand_revenue(sf_dir: str):
    """TPC-H Q17 shape — a CORRELATED AVERAGE gate decorrelated: the
    revenue of lines whose quantity is below HALF their part's average
    quantity, per brand.  The gate is the exact-integer
    cross-multiplication 2·qty·n_part < sum_qty_part (no float
    average anywhere).  Plan: per-part (Σqty, n) rollup (tiered),
    broadcast below the part gate / hash join above; the fact scan
    re-reads with the gate applied map-side and pre-reduces per
    brand."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def pq_partial(b: pa.Table) -> pa.Table:
        qty = np.floor(np.abs(b["l_quantity"]
                              .to_numpy(zero_copy_only=False)) + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "q": qty})
        agg = (df.groupby("pk", as_index=False)
               .agg(s=("q", "sum"), c=("q", "size")))
        agg["c"] = agg.c.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(pq_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    driver = n_li is not None and n_li <= PART_DRIVER_MAX_ROWS
    if driver:
        pq = (_parts_pandas(parts_ds, {"pk": np.int64, "s": np.int64,
                                       "c": np.int64})
              .groupby("pk", as_index=False)[["s", "c"]].sum())
        pb = part.to_pandas()
        pq = pq.merge(pb, left_on="pk", right_on="p_partkey")
        keys = np.sort(pq.pk.to_numpy(np.int64))
        order = np.argsort(pq.pk.to_numpy(np.int64))
        s_arr = pq.s.to_numpy(np.int64)[order]
        c_arr = pq.c.to_numpy(np.int64)[order]
        br_arr = pq.p_brand.to_numpy(dtype=object)[order]
        ref = ray.put((keys, s_arr, c_arr, br_arr))

        def gate(b: pa.Table) -> pa.Table:
            kk, ss, cc, bb = ray.get(ref)
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, pk)
            pos[pos >= len(kk)] = 0
            qty = np.floor(np.abs(b["l_quantity"]
                                  .to_numpy(zero_copy_only=False))
                           + 0.5).astype(np.int64)
            keep = (kk[pos] == pk) & (2 * qty * cc[pos] < ss[pos])
            ext = _cents_away(b["l_extendedprice"]
                              .to_numpy(zero_copy_only=False))
            df = pd.DataFrame({"p_brand": bb[pos[keep]],
                               "rev": ext[keep], "one": np.int64(1)})
            agg = (df.groupby("p_brand", as_index=False)
                   .agg(revenue_cents=("rev", "sum"),
                        n_items=("one", "sum")))
            agg["n_items"] = agg.n_items.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts = li.map_batches(gate, batch_format="pyarrow")
    else:
        pq_ds = (parts_ds.groupby("pk")
                 .aggregate(Sum("s", alias_name="s"),
                            Sum("c", alias_name="c")))
        pq_br = hash_join(pq_ds, part, on=("pk",),
                          right_on=("p_partkey",))

        def li_pre(b: pa.Table) -> pa.Table:
            qty = np.floor(np.abs(b["l_quantity"]
                                  .to_numpy(zero_copy_only=False))
                           + 0.5).astype(np.int64)
            return pa.table({
                "pk2": b["l_partkey"].cast(pa.int64()),
                "q": pa.array(qty),
                "ext": pa.array(_cents_away(
                    b["l_extendedprice"]
                    .to_numpy(zero_copy_only=False)))})

        fact = li.map_batches(li_pre, batch_format="pyarrow")
        joined = hash_join(fact, pq_br, on=("pk2",), right_on=("pk",))

        def gate2(b: pa.Table) -> pa.Table:
            keep = (2 * b["q"].to_numpy(zero_copy_only=False)
                    * b["c"].to_numpy(zero_copy_only=False)
                    < b["s"].to_numpy(zero_copy_only=False))
            sub = b.filter(pa.array(keep))
            df = pd.DataFrame({
                "p_brand": pd.Series(sub["p_brand"].to_pandas())
                .to_numpy(dtype=object),
                "rev": sub["ext"].to_numpy(zero_copy_only=False),
                "one": np.int64(1)})
            agg = (df.groupby("p_brand", as_index=False)
                   .agg(revenue_cents=("rev", "sum"),
                        n_items=("one", "sum")))
            agg["n_items"] = agg.n_items.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts = joined.map_batches(gate2, batch_format="pyarrow")
    out = (_parts_pandas(parts, {"p_brand": object,
                                 "revenue_cents": np.int64,
                                 "n_items": np.int64})
           .groupby("p_brand", as_index=False)
           [["revenue_cents", "n_items"]].sum())
    out["revenue_cents"] = out.revenue_cents.astype(np.int64)
    out["n_items"] = out.n_items.astype(np.int64)
    return out.sort_values("p_brand").reset_index(drop=True)


def nation_market_share(sf_dir: str, region: str = "ASIA",
                        nation: str = "NATION_2"):
    """TPC-H Q8 shape — MARKET SHARE by year: of all revenue billed
    to ``region``'s customers, the share shipped by ``nation``'s
    suppliers, per order year.  Exact integer numerator/denominator
    (10⁻⁴-dollar units) with one final division (6-dp contract).
    Plan mirrors the Q5 star: the supplier→is-target flag attaches
    map-side (dimension broadcast below the gate, hash join above),
    customers prune to the region BEFORE the orders join, and the two
    fact sides meet in ONE orderkey hash join of (orderkey, rev,
    rev_target) partials; the year rollup is output-scale."""
    import ray

    from biobloom_ray.io import hash_join

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg[reg.r_name == region].r_regionkey.iloc[0])
    nkeys = np.sort(nat[nat.n_regionkey == rkey]
                    .n_nationkey.to_numpy(np.int64))
    target_nk = int(nat[nat.n_name == nation].n_nationkey.iloc[0])
    nk_ref = ray.put(nkeys)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def cust_region(b: pa.Table) -> pa.Table:
        keys = ray.get(nk_ref)
        v = b["c_nationkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, v)
        pos[pos >= len(keys)] = 0
        return (b.filter(pa.array(keys[pos] == v))
                .select(["c_custkey"]))

    cust_r = cust.map_batches(cust_region, batch_format="pyarrow")

    def li_partial(b: pa.Table, sk, flag) -> pa.Table:
        v = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, v)
        pos[pos >= len(sk)] = 0
        hit = (sk[pos] == v) if len(sk) else np.zeros(len(v), bool)
        sub = b.filter(pa.array(hit))
        if sub.num_rows == 0:
            return pa.table({"ok": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64()),
                             "rev_t": pa.array([], pa.int64())})
        cents = _cents_away(
            sub["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(sub["l_discount"].to_numpy(zero_copy_only=False))
        rev = cents * (100 - disc)
        tgt = flag[pos[hit]]
        df = pd.DataFrame({
            "ok": sub["l_orderkey"].to_numpy(zero_copy_only=False),
            "rev": rev, "rev_t": rev * tgt})
        agg = (df.groupby("ok", as_index=False)
               [["rev", "rev_t"]].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    n_cust = _cheap_count(cust)
    broadcast = (n_cust is not None
                 and n_cust <= CUST_BROADCAST_MAX_ROWS)
    if broadcast:
        sp = supp.to_pandas()
        order = np.argsort(sp.s_suppkey.to_numpy(np.int64))
        sk = sp.s_suppkey.to_numpy(np.int64)[order]
        flag = (sp.s_nationkey.to_numpy(np.int64)[order]
                == target_nk).astype(np.int64)
        sref = ray.put((sk, flag))
        li_parts = li.map_batches(
            lambda b: li_partial(b, *ray.get(sref)),
            batch_format="pyarrow")
        cu = np.sort(cust_r.to_pandas().c_custkey.to_numpy(np.int64))
        cu_ref = ray.put(cu)

        def ord_map(b: pa.Table) -> pa.Table:
            kk = ray.get(cu_ref)
            v = b["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, v)
            pos[pos >= len(kk)] = 0
            hit = (kk[pos] == v) if len(kk) else np.zeros(len(v), bool)
            sub = b.filter(pa.array(hit))
            yr = (pd.Series(sub["o_orderdate"].to_pandas())
                  .dt.year.to_numpy(np.int64))
            return pa.table({"ok2": sub["o_orderkey"].cast(pa.int64()),
                             "yr": pa.array(yr)})

        # the region-filtered (orderkey -> year) link is bounded by
        # the SAME orders gate this tier already requires, so it
        # broadcasts as sorted arrays and the year attach runs
        # map-side on the lineitem partials — no orderkey exchange
        # below the gate (the hash-join plan remains the at-scale
        # path in the else branch)
        op = (orders.map_batches(ord_map, batch_format="pyarrow")
              .to_pandas())
        oo = np.argsort(op.ok2.to_numpy(np.int64))
        ok_arr = op.ok2.to_numpy(np.int64)[oo]
        yr_arr = op.yr.to_numpy(np.int64)[oo]
        oy_ref = ray.put((ok_arr, yr_arr))

        def year_attach(b: pa.Table) -> pa.Table:
            kk, yy = ray.get(oy_ref)
            v = b["ok"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, v)
            pos[pos >= len(kk)] = 0
            hit = (kk[pos] == v) if len(kk) else np.zeros(len(v), bool)
            df = pd.DataFrame({
                "yr": yy[pos[hit]],
                "den": b["rev"].to_numpy(zero_copy_only=False)[hit],
                "num": b["rev_t"].to_numpy(zero_copy_only=False)[hit]})
            agg = (df.groupby("yr", as_index=False)
                   [["num", "den"]].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts = li_parts.map_batches(year_attach,
                                     batch_format="pyarrow")
    else:
        def li_pre(b: pa.Table) -> pa.Table:
            cents = _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))
            disc = _cents_away(
                b["l_discount"].to_numpy(zero_copy_only=False))
            df = pd.DataFrame({
                "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
                "rev": cents * (100 - disc)})
            agg = (df.groupby(["ok", "sk"], as_index=False)
                   ["rev"].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        li_sup = hash_join(li.map_batches(li_pre,
                                          batch_format="pyarrow"),
                           supp, on=("sk",), right_on=("s_suppkey",))

        def li_flag(b: pa.Table) -> pa.Table:
            tgt = (b["s_nationkey"].to_numpy(zero_copy_only=False)
                   .astype(np.int64) == target_nk).astype(np.int64)
            rev = b["rev"].to_numpy(zero_copy_only=False)
            return pa.table({"ok": b["ok"], "rev": pa.array(rev),
                             "rev_t": pa.array(rev * tgt)})

        li_parts = li_sup.map_batches(li_flag, batch_format="pyarrow")
        ords_j = hash_join(orders, cust_r, on=("o_custkey",),
                           right_on=("c_custkey",))

        def ord_rename(b: pa.Table) -> pa.Table:
            yr = (pd.Series(b["o_orderdate"].to_pandas())
                  .dt.year.to_numpy(np.int64))
            return pa.table({"ok2": b["o_orderkey"].cast(pa.int64()),
                             "yr": pa.array(yr)})

        ords = ords_j.map_batches(ord_rename, batch_format="pyarrow")
        joined = hash_join(li_parts, ords, on=("ok",),
                           right_on=("ok2",))

        def year_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "yr": b["yr"].to_numpy(zero_copy_only=False),
                "den": b["rev"].to_numpy(zero_copy_only=False),
                "num": b["rev_t"].to_numpy(zero_copy_only=False)})
            agg = (df.groupby("yr", as_index=False)
                   [["num", "den"]].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts = joined.map_batches(year_partial,
                                   batch_format="pyarrow")
    agg = (_parts_pandas(
        parts,
        {"yr": np.int64, "num": np.int64, "den": np.int64})
        .groupby("yr", as_index=False)[["num", "den"]].sum())
    out = pd.DataFrame({
        "o_year": agg.yr.astype(np.int64),
        "num_rev": agg.num.astype(np.int64),
        "den_rev": agg.den.astype(np.int64),
        "share_r6": (agg.num / agg.den).round(6)})
    return out.sort_values("o_year").reset_index(drop=True)


def top_supplier_revenue_with_ties(sf_dir: str, lo: str = "1996-01-01",
                                   hi: str = "1996-04-01"):
    """TPC-H Q15 shape — ARGMAX WITH TIES over a computed revenue
    view: the supplier(s) with the maximum in-window revenue (every
    tie kept, matching the reference query's `= (SELECT MAX ...)`
    semantics).  The per-supplier rollup pre-reduces per block and
    combines tiered; the max and its ties resolve from per-block
    (max, rows-at-max) partials — associative; names attach to the
    tie-set only."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"])
    tlo = np.datetime64(lo, "us").astype(np.int64)
    thi = np.datetime64(hi, "us").astype(np.int64)

    def rev_partial(b: pa.Table) -> pa.Table:
        ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()).to_numpy(zero_copy_only=False))
        m = (ship >= tlo) & (ship < thi)
        sub = b.filter(pa.array(m))
        if sub.num_rows == 0:
            return pa.table({"sk": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        cents = _cents_away(
            sub["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(sub["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "sk": sub["l_suppkey"].to_numpy(zero_copy_only=False),
            "rev": cents * (100 - disc)})
        agg = df.groupby("sk", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(rev_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        sr = (_parts_pandas(parts_ds, {"sk": np.int64, "rev": np.int64})
              .groupby("sk", as_index=False)["rev"].sum())
    else:
        sr = (parts_ds.groupby("sk")
              .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    if len(sr) == 0:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object),
                             "revenue": pd.Series([], dtype=np.int64)})
    mx = int(sr.rev.max())
    ties = sr[sr.rev == mx]
    names = _read(sf_dir, "supplier",
                  columns=["s_suppkey", "s_name"]).to_pandas()
    out = (ties.merge(names, left_on="sk", right_on="s_suppkey")
           .rename(columns={"rev": "revenue"}))
    out["revenue"] = out.revenue.astype(np.int64)
    return (out[["s_name", "revenue"]].sort_values("s_name")
            .reset_index(drop=True))


def late_urgent_mix_by_status(sf_dir: str, late_days: int = 60):
    """TPC-H Q12 shape — CONDITIONAL two-way counts after a fact⋈fact
    join: among lines shipped > ``late_days`` after their order date,
    the urgent-priority vs other mix per line status.  The order
    (date, urgent-flag) map broadcasts below the gate (searchsorted
    attach) and hash-joins above; per-block partials carry the two
    conditional tallies so the final rollup is |statuses| rows."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_linestatus"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    late_us = int(late_days) * 86_400_000_000
    urgent = {"1-URGENT", "2-HIGH"}

    def mix_frame(status, is_urgent) -> pa.Table:
        df = pd.DataFrame({"l_linestatus": status,
                           "n_urgent": is_urgent.astype(np.int64),
                           "n_other": (~is_urgent).astype(np.int64)})
        agg = (df.groupby("l_linestatus", as_index=False)
               [["n_urgent", "n_other"]].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= LINEITEM_DRIVER_MAX_ROWS:
        od = orders.to_pandas()
        order = np.argsort(od.o_orderkey.to_numpy(np.int64))
        okeys = od.o_orderkey.to_numpy(np.int64)[order]
        odate = (od.o_orderdate.astype("datetime64[us]")
                 .astype(np.int64).to_numpy()[order])
        uflag = (od.o_orderpriority.isin(urgent).to_numpy()[order])
        ref = ray.put((okeys, odate, uflag))

        def probe(b: pa.Table) -> pa.Table:
            kk, dd, uu = ray.get(ref)
            ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
            ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                    .cast(pa.int64()).to_numpy(zero_copy_only=False))
            pos = np.searchsorted(kk, ok)
            pos[pos >= len(kk)] = 0
            hit = (kk[pos] == ok) & (ship > dd[pos] + late_us)
            return mix_frame(
                pd.Series(b.filter(pa.array(hit))["l_linestatus"]
                          .to_pandas()).to_numpy(dtype=object),
                uu[pos[hit]])

        parts = li.map_batches(probe, batch_format="pyarrow")
    else:
        def li_pre(b: pa.Table) -> pa.Table:
            ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                    .cast(pa.int64()).to_numpy(zero_copy_only=False))
            return pa.table({"ok": b["l_orderkey"].cast(pa.int64()),
                             "ship": pa.array(ship),
                             "l_linestatus": b["l_linestatus"]})

        joined = hash_join(li.map_batches(li_pre,
                                          batch_format="pyarrow"),
                           orders, on=("ok",),
                           right_on=("o_orderkey",))

        def mix_partial(b: pa.Table) -> pa.Table:
            od = (b["o_orderdate"].cast(pa.timestamp("us"))
                  .cast(pa.int64()).to_numpy(zero_copy_only=False))
            late = (b["ship"].to_numpy(zero_copy_only=False)
                    > od + late_us)
            sub = b.filter(pa.array(late))
            uf = (pd.Series(sub["o_orderpriority"].to_pandas())
                  .isin(urgent).to_numpy())
            return mix_frame(
                pd.Series(sub["l_linestatus"].to_pandas())
                .to_numpy(dtype=object), uf)

        parts = joined.map_batches(mix_partial, batch_format="pyarrow")
    agg = (_parts_pandas(parts, {"l_linestatus": object,
                                 "n_urgent": np.int64,
                                 "n_other": np.int64})
           .groupby("l_linestatus", as_index=False)
           [["n_urgent", "n_other"]].sum())
    agg["n_urgent"] = agg.n_urgent.astype(np.int64)
    agg["n_other"] = agg.n_other.astype(np.int64)
    return agg.sort_values("l_linestatus").reset_index(drop=True)


def daily_revenue_autocorr(sf_dir: str, lags: tuple = (1, 7)):
    """Lagged AUTOCORRELATION of each type's daily revenue — the
    seasonality detector (lag-1 momentum, lag-7 weekly cycle) —
    computed as Pearson r over the pairs of OBSERVED days exactly
    ``lag`` calendar days apart.  The daily rollup combines tiered;
    the lag self-join and the moment formula run on the output-scale
    (type, day) table with the same explicit op-order discipline as
    ``grouped_higher_moments`` (the oracle mirrors each term)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def day_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = ts // 86_400_000_000
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object), "day": day,
            "rev": _cents_away(b["value"]
                               .to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["event_type", "day"], as_index=False)
               ["rev"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(day_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds, {"event_type": object,
                                          "day": np.int64,
                                          "rev": np.int64})
                 .groupby(["event_type", "day"], as_index=False)
                 ["rev"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day"])
                 .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    rows = []
    for t, g in daily.groupby("event_type", sort=True):
        g = g.sort_values("day")
        d = g.day.to_numpy(np.int64)
        r = g.rev.to_numpy(np.int64).astype(np.float64)
        vals = [t]
        for lag in lags:
            pos = np.searchsorted(d, d + lag)
            pos_c = np.minimum(pos, len(d) - 1)
            hit = d[pos_c] == d + lag
            x, y = r[hit], r[pos_c[hit]]
            n = float(len(x))
            if n < 2:
                vals.extend([np.int64(len(x)), float("nan")])
                continue
            sx, sy = x.sum(), y.sum()
            sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
            num = sxy - sx * sy / n
            den = np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
            vals.extend([np.int64(len(x)), round(num / den, 6)])
        rows.append(tuple(vals))
    cols = ["event_type"]
    for lag in lags:
        cols += [f"n_lag{lag}", f"r_lag{lag}_r6"]
    out = pd.DataFrame(rows, columns=cols)
    for lag in lags:
        out[f"n_lag{lag}"] = out[f"n_lag{lag}"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def transition_reciprocity(sf_dir: str):
    """Markov-graph RECIPROCITY — for each unordered type pair, how
    symmetric the two directed transition flows are: n_ab, n_ba, the
    reciprocity min/max ratio, and the net-flow imbalance — composed
    over ``event_transitions``' exact LAG semantics (the |types|²
    table folds anywhere)."""
    tc = event_transitions(sf_dir)
    tc = tc[tc.prev_type != tc.next_type]
    m = {(r.prev_type, r.next_type): int(r.n) for r in tc.itertuples()}
    types = sorted(set(tc.prev_type) | set(tc.next_type))
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            ab, ba = m.get((a, b), 0), m.get((b, a), 0)
            hi = max(ab, ba)
            rows.append((a, b, np.int64(ab), np.int64(ba),
                         round(min(ab, ba) / hi, 6) if hi else 0.0,
                         np.int64(ab - ba)))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_ab",
                                      "n_ba", "reciprocity_r6",
                                      "net_flow"])
    for c in ["n_ab", "n_ba", "net_flow"]:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


def supplier_hhi_by_nation(sf_dir: str):
    """Market-CONCENTRATION index (Herfindahl–Hirschman) of supplier
    revenue within each supplier nation: HHI = Σ(share_i)² over the
    COMPLETED per-supplier revenue rollup — the sum-of-squared-shares
    shape needs each supplier's total finalized before squaring, so
    the plan is rollup → broadcast nation totals → per-block squared-
    share partials (three native stages, nothing supplier-scale on
    the driver above the gate).  Exact int64 anchors (supplier count,
    total revenue); shares square in double with per-element identical
    ops (6-dp contract)."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def rev_partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(b["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "rev": cents * (100 - disc)})
        agg = df.groupby("sk", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(rev_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    driver = n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS
    if driver:
        sr = (_parts_pandas(parts_ds, {"sk": np.int64, "rev": np.int64})
              .groupby("sk", as_index=False)["rev"].sum())
        sp = supp.to_pandas()
        sr = sr.merge(sp, left_on="sk", right_on="s_suppkey")
        tot = (sr.groupby("s_nationkey", as_index=False)
               .agg(total=("rev", "sum"), n=("rev", "size")))
        j = sr.merge(tot, on="s_nationkey")
        sh = j.rev / j.total
        j["sq"] = sh * sh
        agg = (j.groupby("s_nationkey", as_index=False)
               .agg(hhi=("sq", "sum")))
        agg = agg.merge(tot, on="s_nationkey")
    else:
        sr_ds = (parts_ds.groupby("sk")
                 .aggregate(Sum("rev", alias_name="rev")))
        joined = hash_join(sr_ds, supp, on=("sk",),
                           right_on=("s_suppkey",)).materialize()

        def tot_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "s_nationkey": b["s_nationkey"]
                .to_numpy(zero_copy_only=False).astype(np.int64),
                "rev": b["rev"].to_numpy(zero_copy_only=False)})
            agg_ = (df.groupby("s_nationkey", as_index=False)
                    .agg(total=("rev", "sum"), n=("rev", "size")))
            agg_["n"] = agg_.n.astype(np.int64)
            return pa.Table.from_pandas(agg_, preserve_index=False)

        tot = (_parts_pandas(
            joined.map_batches(tot_partial, batch_format="pyarrow"),
            {"s_nationkey": np.int64, "total": np.int64,
             "n": np.int64})
            .groupby("s_nationkey", as_index=False)
            [["total", "n"]].sum())
        tref = ray.put(dict(zip(tot.s_nationkey.astype(int),
                                tot.total.astype(int))))

        def sq_partial(b: pa.Table) -> pa.Table:
            tm = ray.get(tref)
            nk = (b["s_nationkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))
            rev = b["rev"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            tt = np.fromiter((tm[int(k)] for k in nk), dtype=np.float64,
                             count=len(nk))
            sh = rev / tt
            df = pd.DataFrame({"s_nationkey": nk, "sq": sh * sh})
            agg_ = df.groupby("s_nationkey", as_index=False)["sq"].sum()
            return pa.Table.from_pandas(agg_, preserve_index=False)

        hh = (_parts_pandas(
            joined.map_batches(sq_partial, batch_format="pyarrow"),
            {"s_nationkey": np.int64, "sq": np.float64})
            .groupby("s_nationkey", as_index=False)["sq"].sum()
            .rename(columns={"sq": "hhi"}))
        agg = hh.merge(tot, on="s_nationkey")
    names = _read(sf_dir, "nation",
                  columns=["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(names, left_on="s_nationkey",
                    right_on="n_nationkey")
    out = pd.DataFrame({
        "n_name": out.n_name,
        "n_suppliers": out.n.astype(np.int64),
        "total_rev": out.total.astype(np.int64),
        "hhi_r6": out.hhi.round(6)})
    return out.sort_values("n_name").reset_index(drop=True)


def dominant_supplier_parts(sf_dir: str, share_denom: int = 8):
    """TPC-H Q20 shape — a SHARE-OF-PARENT gate at the PAIR level:
    (part, supplier) links where the supplier shipped more than
    1/``share_denom`` of the part's total quantity, counted per
    supplier.  Exact-integer cross-multiplication
    ``share_denom·q_ps > q_p`` (no float share); the pair rollup and
    the parent rollup are the same tiered native Sums, the gate joins
    pair → parent (broadcast below the gate, hash join above) and the
    final per-supplier count is supplier-scale."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity"])

    def pair_partial(b: pa.Table) -> pa.Table:
        qty = np.floor(np.abs(b["l_quantity"]
                              .to_numpy(zero_copy_only=False)) + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "q": qty})
        agg = df.groupby(["pk", "sk"], as_index=False)["q"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(pair_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        ps = (_parts_pandas(parts_ds, {"pk": np.int64, "sk": np.int64,
                                       "q": np.int64})
              .groupby(["pk", "sk"], as_index=False)["q"].sum())
        pt = ps.groupby("pk", as_index=False).q.sum() \
            .rename(columns={"q": "tq"})
        j = ps.merge(pt, on="pk")
        dom = j[share_denom * j.q > j.tq]
        counts = (dom.groupby("sk", as_index=False)
                  .size().rename(columns={"size": "n_parts",
                                          "sk": "s_suppkey"}))
    else:
        ps_ds = (parts_ds.groupby(["pk", "sk"])
                 .aggregate(Sum("q", alias_name="q")).materialize())

        def pt_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "pk": b["pk"].to_numpy(zero_copy_only=False),
                "tq": b["q"].to_numpy(zero_copy_only=False)})
            agg = df.groupby("pk", as_index=False)["tq"].sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

        pt_ds = (ps_ds.map_batches(pt_partial, batch_format="pyarrow")
                 .groupby("pk").aggregate(Sum("tq", alias_name="tq")))
        joined = hash_join(ps_ds, pt_ds, on=("pk",))

        def dom_partial(b: pa.Table) -> pa.Table:
            keep = (share_denom * b["q"].to_numpy(zero_copy_only=False)
                    > b["tq"].to_numpy(zero_copy_only=False))
            sk = b.filter(pa.array(keep))["sk"] \
                .to_numpy(zero_copy_only=False)
            vc = pd.Series(sk).value_counts().sort_index()
            return pa.table({
                "s_suppkey": pa.array(vc.index.to_numpy(np.int64)),
                "n_parts": pa.array(vc.to_numpy(np.int64))})

        counts = (_parts_pandas(
            joined.map_batches(dom_partial, batch_format="pyarrow"),
            {"s_suppkey": np.int64, "n_parts": np.int64})
            .groupby("s_suppkey", as_index=False)["n_parts"].sum())
    counts["s_suppkey"] = counts.s_suppkey.astype(np.int64)
    counts["n_parts"] = counts.n_parts.astype(np.int64)
    return counts.sort_values("s_suppkey").reset_index(drop=True)


def parts_keyset_page(sf_dir: str, cursor_cents: int = 90_000,
                      cursor_key: int = 0, page: int = 20):
    """KEYSET PAGINATION (the engine feature OFFSET can't scale to):
    the next ``page`` parts strictly after the compound cursor
    (price_cents, partkey) in (price ASC, key ASC) order — the
    predicate (price > c) OR (price = c AND key > k) applies map-side
    and per-block exact top-``page`` partials resolve on the driver
    (the block top-k pattern; no global sort, no offset scan)."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_retailprice"])

    def page_partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(
            b["p_retailprice"].to_numpy(zero_copy_only=False))
        key = b["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = (cents > cursor_cents) | ((cents == cursor_cents)
                                         & (key > cursor_key))
        df = pd.DataFrame({"p_partkey": key[keep],
                           "price_cents": cents[keep]})
        return pa.Table.from_pandas(
            df.sort_values(["price_cents", "p_partkey"]).head(page),
            preserve_index=False)

    parts = _parts_pandas(
        ds.map_batches(page_partial, batch_format="pyarrow"),
        {"p_partkey": np.int64, "price_cents": np.int64})
    out = (parts.sort_values(["price_cents", "p_partkey"]).head(page)
           [["p_partkey", "price_cents"]].reset_index(drop=True))
    out["p_partkey"] = out.p_partkey.astype(np.int64)
    out["price_cents"] = out.price_cents.astype(np.int64)
    return out


def cumulative_parts_catalog(sf_dir: str):
    """RUNNING DISTINCT via the first-appearance trick: the
    distinct-parts-shipped-so-far curve needs no running set — a part
    enters the cumulative count exactly once, on its MIN ship day, so
    one per-part Min rollup + a day count + one output-scale prefix
    sum reproduce the whole curve (the same decomposition
    ``pack_documents`` uses for its global scan)."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])

    def min_partial(b: pa.Table) -> pa.Table:
        ship = (b["l_shipdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()).to_numpy(zero_copy_only=False))
        day = (ship // 86_400_000_000) * 86_400
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "d0": day})
        agg = df.groupby("pk", as_index=False)["d0"].min()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(min_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        firsts = (_parts_pandas(parts_ds, {"pk": np.int64,
                                           "d0": np.int64})
                  .groupby("pk", as_index=False)["d0"].min())
        daily = (firsts.groupby("d0", as_index=False)
                 .size().rename(columns={"size": "n_new",
                                         "d0": "day_epoch"}))
    else:
        firsts_ds = (parts_ds.groupby("pk")
                     .aggregate(Min("d0", alias_name="d0")))

        def day_count(b: pa.Table) -> pa.Table:
            vc = (pd.Series(b["d0"].to_numpy(zero_copy_only=False))
                  .value_counts().sort_index())
            return pa.table({
                "day_epoch": pa.array(vc.index.to_numpy(np.int64)),
                "n_new": pa.array(vc.to_numpy(np.int64))})

        daily = (_parts_pandas(
            firsts_ds.map_batches(day_count, batch_format="pyarrow"),
            {"day_epoch": np.int64, "n_new": np.int64})
            .groupby("day_epoch", as_index=False)["n_new"].sum())
    daily = daily.sort_values("day_epoch").reset_index(drop=True)
    daily["n_cum"] = daily.n_new.cumsum().astype(np.int64)
    daily["day_epoch"] = daily.day_epoch.astype(np.int64)
    daily["n_new"] = daily.n_new.astype(np.int64)
    return daily[["day_epoch", "n_new", "n_cum"]]


def prefix_dup_groups(sf_dir: str, n_chars: int = 64):
    """C4-style PREFIX dedup signal: groups of documents sharing an
    identical first-``n_chars`` prefix (boilerplate headers, mirrored
    pages) — per group: size and the winner (min doc_id), plus every
    member's id, limited to groups of ≥ 2.  Map-side prefix slice
    (``pc.utf8_slice_codeunits`` — no Python string loop), then the
    standard exact-dedup rollup keyed on the prefix; the group table
    is duplicate-scale."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(b["text"], 0, n_chars)
        return pa.table({"doc_id": b["doc_id"], "pref": pref})

    prefs = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        df = prefs.to_pandas()
        g = (df.groupby("pref", as_index=False)
             .agg(group_size=("doc_id", "size"),
                  winner_doc=("doc_id", "min")))
        g = g[g.group_size >= 2]
        out = df.merge(g, on="pref")
    else:
        counts = (prefs.groupby("pref")
                  .aggregate(Count(alias_name="group_size"),
                             Min("doc_id", alias_name="winner_doc")))

        def keep_dups(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b["group_size"], 2))

        from biobloom_ray.io import hash_join

        dups = counts.map_batches(keep_dups, batch_format="pyarrow")
        out = hash_join(prefs, dups, on=("pref",)).to_pandas()
    out = out[["doc_id", "group_size", "winner_doc"]]
    out["group_size"] = out.group_size.astype(np.int64)
    out["winner_doc"] = out.winner_doc.astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def token_len_histogram(sf_dir: str):
    """Token-LENGTH profile per language (the tokenizer-budget view:
    how many BPE pieces a word will shatter into correlates with
    length): exact counts per (lang, token character length), factorized
    per block with the shared ``_token_arrays`` kernel (no Python
    loop), tiered combine."""
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, _lens, row_of = _token_arrays(b)
        if len(flat) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "tok_len": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lg = b["lang"].to_pandas().to_numpy(dtype=object)
        ln = pd.Series(flat, dtype=object).str.len() \
            .to_numpy(np.int64)
        df = pd.DataFrame({"lang": lg[row_of], "tok_len": ln})
        agg = (df.groupby(["lang", "tok_len"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds, {"lang": object,
                                        "tok_len": np.int64,
                                        "n": np.int64})
               .groupby(["lang", "tok_len"], as_index=False)["n"].sum())
    else:
        agg = (parts_ds.groupby(["lang", "tok_len"])
               .aggregate(Sum("n", alias_name="n")).to_pandas())
    agg["tok_len"] = agg.tok_len.astype(np.int64)
    agg["n"] = agg.n.astype(np.int64)
    return (agg.sort_values(["lang", "tok_len"])
            .reset_index(drop=True))


def vocab_growth_by_docs(sf_dir: str, bucket: int = 1):
    """HEAPS'-LAW vocabulary growth: distinct tokens seen so far as
    the corpus is consumed in doc_id order, sampled every ``bucket``
    documents — running distinct via the FIRST-APPEARANCE trick (a
    token enters the curve at its MIN doc_id; one per-token Min
    rollup + an output-scale prefix sum — no running set, the same
    decomposition as ``cumulative_parts_catalog``)."""
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, _lens, row_of = _token_arrays(b)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "d0": pa.array([], pa.int64())})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"token": pd.Series(flat, dtype=object),
                           "d0": ids[row_of]})
        agg = df.groupby("token", as_index=False)["d0"].min()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        firsts = (_parts_pandas(parts_ds, {"token": object,
                                           "d0": np.int64})
                  .groupby("token", as_index=False)["d0"].min())
    else:
        firsts = (parts_ds.groupby("token")
                  .aggregate(Min("d0", alias_name="d0")).to_pandas())
    firsts["b"] = (firsts.d0.to_numpy(np.int64)
                   // bucket).astype(np.int64)
    daily = (firsts.groupby("b", as_index=False)
             .size().rename(columns={"size": "n_new",
                                     "b": "doc_bucket"}))
    daily = daily.sort_values("doc_bucket").reset_index(drop=True)
    daily["n_cum"] = daily.n_new.cumsum().astype(np.int64)
    daily["doc_bucket"] = daily.doc_bucket.astype(np.int64)
    daily["n_new"] = daily.n_new.astype(np.int64)
    return daily[["doc_bucket", "n_new", "n_cum"]]


def fd_violation_audit(sf_dir: str):
    """FUNCTIONAL-DEPENDENCY discovery audit — the profiling twin of
    the FK orphan check: for each candidate determinant → dependent
    pair, how many determinant values map to MORE than one dependent
    value (a holding FD has zero).  Each candidate is two chained
    dedup rollups (block-dedup pairs → cluster-wide distinct → per-key
    count), the same shape every exact-distinct operator uses; the
    verdict table is one row per candidate."""
    cands = [
        ("customer", "c_custkey->c_nationkey",
         "c_custkey", "c_nationkey"),
        ("part", "p_brand->p_size", "p_brand", "p_size"),
        ("orders", "o_custkey->o_orderpriority",
         "o_custkey", "o_orderpriority"),
    ]
    rows = []
    for table, name, det, dep in cands:
        ds = _read(sf_dir, table, columns=[det, dep])

        def pair_partial(b: pa.Table, d=det, p=dep) -> pa.Table:
            df = pd.DataFrame({
                "k": pd.Series(b[d].to_pandas())
                .to_numpy(dtype=object),
                "v": pd.Series(b[p].to_pandas())
                .to_numpy(dtype=object)}).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        pairs_ds = ds.map_batches(pair_partial, batch_format="pyarrow")
        n_rows = _cheap_count(ds)
        if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
            kp = (_parts_pandas(pairs_ds, {"k": object, "v": object})
                  .drop_duplicates())
            per_k = kp.groupby("k").size()
        else:
            dedup = (pairs_ds.groupby(["k", "v"])
                     .aggregate(Count(alias_name="_c")))
            per_k = (dedup.groupby("k")
                     .aggregate(Count(alias_name="nv")).to_pandas()
                     .set_index("k").nv)
        rows.append((name, np.int64(len(per_k)),
                     np.int64(int((per_k > 1).sum())),
                     np.int64(int(per_k.max()))))
    out = pd.DataFrame(rows, columns=["fd", "n_keys",
                                      "n_violating_keys",
                                      "max_distinct_dep"])
    for c in ["n_keys", "n_violating_keys", "max_distinct_dep"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("fd").reset_index(drop=True)


def bipartite_degree_dist(sf_dir: str):
    """DEGREE DISTRIBUTION of the part↔supplier bipartite link graph,
    both sides — the graph-health histogram (skew here predicts
    shuffle skew in every join over the link table): counts-of-counts
    on the deduped edge set, once per side.  Block-deduped edges →
    cluster-wide dedup → per-node degree → output-scale degree
    histogram."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def edge_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    edges_ds = li.map_batches(edge_partial, batch_format="pyarrow")
    n_li = _cheap_count(li)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        e = (_parts_pandas(edges_ds, {"pk": np.int64, "sk": np.int64})
             .drop_duplicates())
        frames = []
        for side, col in [("part", "pk"), ("supplier", "sk")]:
            deg = e.groupby(col).size()
            h = (deg.value_counts().sort_index()
                 .rename_axis("degree").reset_index(name="n_nodes"))
            h["side"] = side
            frames.append(h)
        out = pd.concat(frames, ignore_index=True)
    else:
        dedup = (edges_ds.groupby(["pk", "sk"])
                 .aggregate(Count(alias_name="_c")).materialize())
        frames = []
        for side, col in [("part", "pk"), ("supplier", "sk")]:
            deg = (dedup.groupby(col)
                   .aggregate(Count(alias_name="degree")))

            def hist_partial(b: pa.Table) -> pa.Table:
                vc = (pd.Series(b["degree"]
                                .to_numpy(zero_copy_only=False))
                      .value_counts().sort_index())
                return pa.table({
                    "degree": pa.array(vc.index.to_numpy(np.int64)),
                    "n_nodes": pa.array(vc.to_numpy(np.int64))})

            h = (_parts_pandas(
                deg.map_batches(hist_partial, batch_format="pyarrow"),
                {"degree": np.int64, "n_nodes": np.int64})
                .groupby("degree", as_index=False)["n_nodes"].sum())
            h["side"] = side
            frames.append(h)
        out = pd.concat(frames, ignore_index=True)
    out["degree"] = out.degree.astype(np.int64)
    out["n_nodes"] = out.n_nodes.astype(np.int64)
    return (out[["side", "degree", "n_nodes"]]
            .sort_values(["side", "degree"]).reset_index(drop=True))


def revenue_up_run_lengths(sf_dir: str):
    """MONOTONE-RUN analysis on each type's daily revenue series (the
    momentum screen): the longest strictly-increasing run of
    consecutive OBSERVED days and the number of maximal increasing
    runs.  The daily rollup combines tiered; the run walk is one
    vectorized diff/island pass on the output-scale series (the
    gaps-and-islands kernel, applied to a sign sequence)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def day_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = ts // 86_400_000_000
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object), "day": day,
            "rev": _cents_away(b["value"]
                               .to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["event_type", "day"], as_index=False)
               ["rev"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(day_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds, {"event_type": object,
                                          "day": np.int64,
                                          "rev": np.int64})
                 .groupby(["event_type", "day"], as_index=False)
                 ["rev"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day"])
                 .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    rows = []
    for t, g in daily.groupby("event_type", sort=True):
        g = g.sort_values("day")
        up = (np.diff(g.rev.to_numpy(np.int64)) > 0)
        if len(up) == 0:
            rows.append((t, np.int64(0), np.int64(0)))
            continue
        # island walk over the boolean up-steps: run length = longest
        # stretch of consecutive True
        changes = np.nonzero(np.diff(np.r_[False, up, False]))[0]
        starts, ends = changes[::2], changes[1::2]
        lens = ends - starts
        rows.append((t,
                     np.int64(int(lens.max()) if len(lens) else 0),
                     np.int64(len(lens))))
    out = pd.DataFrame(rows, columns=["event_type",
                                      "longest_up_run",
                                      "n_up_runs"])
    out["longest_up_run"] = out.longest_up_run.astype(np.int64)
    out["n_up_runs"] = out.n_up_runs.astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def weekday_uniformity_chi2(sf_dir: str):
    """GOODNESS-OF-FIT chi² (the one-sample twin of the existing
    independence test): are order placements uniform across the seven
    weekdays, per order priority?  Exact integer observed counts per
    (priority, ISO weekday); the statistic Σ(o − n/7)²/(n/7) is one
    mirrored float expression per row (6-dp contract)."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        dow = (pd.Series(b["o_orderdate"].to_pandas())
               .dt.dayofweek.to_numpy(np.int64))
        df = pd.DataFrame({
            "pr": pd.Series(b["o_orderpriority"].to_pandas())
            .to_numpy(dtype=object), "dow": dow})
        agg = (df.groupby(["pr", "dow"], as_index=False)
               .size().rename(columns={"size": "n"}))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        ct = (_parts_pandas(parts_ds, {"pr": object, "dow": np.int64,
                                       "n": np.int64})
              .groupby(["pr", "dow"], as_index=False)["n"].sum())
    else:
        ct = (parts_ds.groupby(["pr", "dow"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    for pr, g in ct.groupby("pr", sort=True):
        obs = np.zeros(7, dtype=np.int64)
        obs[g.dow.to_numpy(np.int64)] = g.n.to_numpy(np.int64)
        n = int(obs.sum())
        exp = n / 7.0
        chi2 = float((((obs - exp) * (obs - exp)) / exp).sum())
        rows.append((pr, np.int64(n), round(chi2, 6)))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                      "chi2_r6"])
    out["n_orders"] = out.n_orders.astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def value_twap_by_type(sf_dir: str):
    """TIME-WEIGHTED average value per event type (the TWAP / step-
    function integral no row-weighted mean can reproduce): each
    event's value holds until the NEXT event of its type, weighted by
    that gap in whole seconds — exact int64 numerator Σ v·w and
    denominator Σ w (whole-second weights keep every product exact;
    the contract is documented and mirrored in the oracle), one final
    division (6-dp).  Per-type ordered LEAD walk: driver slice pass
    below the gate, per-type map_groups above (types are few; each
    group's walk is one vectorized diff)."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "ts", "value"])

    def type_fold(ts_us: np.ndarray, cents: np.ndarray):
        """(ts, event_id)-ordered arrays of ONE type → (n_gaps,
        Σ v·w, Σ w) with whole-second gap weights."""
        if len(ts_us) < 2:
            return 0, 0, 0
        w = np.diff(ts_us) // 1_000_000
        v = cents[:-1]
        return len(w), int((v * w).sum()), int(w.sum())

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas().sort_values(["event_type", "ts",
                                         "event_id"])
        ts = df.ts.astype("datetime64[us]").astype(np.int64).to_numpy()
        cents = _cents_away(df.value.to_numpy())
        tp = df.event_type.to_numpy(dtype=object)
        cuts = np.nonzero(np.r_[True, tp[1:] != tp[:-1]])[0]
        rows = []
        for lo, hi in zip(cuts, np.append(cuts[1:], len(tp))):
            n, vw, w = type_fold(ts[lo:hi], cents[lo:hi])
            rows.append((tp[lo], n, vw, w))
    else:
        def per_type(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"])
            ts = (g.ts.astype("datetime64[us]").astype(np.int64)
                  .to_numpy())
            cents = _cents_away(g.value.to_numpy())
            n, vw, w = type_fold(ts, cents)
            return pd.DataFrame({
                "event_type": [g.event_type.iloc[0]],
                "n": np.asarray([n], np.int64),
                "vw": np.asarray([vw], np.int64),
                "w": np.asarray([w], np.int64)})

        parts = (ds.groupby("event_type")
                 .map_groups(per_type, batch_format="pandas")
                 .to_pandas())
        rows = [(r.event_type, int(r.n), int(r.vw), int(r.w))
                for r in parts.itertuples()]
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                      "sum_vw", "sum_w"])
    out["twap_r6"] = (out.sum_vw / out.sum_w).round(6)
    for c in ["n_gaps", "sum_vw", "sum_w"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def doc_compression_ratio(sf_dir: str, level: int = 6):
    """Compression-ratio quality signal (the classic repetitive-junk
    detector: highly compressible text is boilerplate or spam): per
    language, exact byte totals (raw UTF-8 vs zlib level-``level``)
    and the corpus-level ratio, plus counts in fixed ratio buckets
    (<0.3 suspicious, 0.3-0.6 typical, >0.6 high-entropy).  zlib is
    bit-deterministic for a fixed level, so the pytest twin recomputes
    byte-identically; no SQL oracle can exist (the driver records the
    rows-only check).  Per-doc compression is inherently per-item
    (same class as the md5/codec loops); everything around it is one
    tiered (lang, bucket) count rollup."""
    import zlib

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        lg = b["lang"].to_pandas().to_numpy(dtype=object)
        tx = b["text"].to_pylist()
        raw = np.fromiter((len(t.encode("utf-8")) for t in tx),
                          dtype=np.int64, count=len(tx))
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), level)) for t in tx),
            dtype=np.int64, count=len(tx))
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        bucket = np.where(ratio < 0.3, 0,
                          np.where(ratio <= 0.6, 1, 2)).astype(np.int64)
        df = pd.DataFrame({"lang": lg, "bucket": bucket, "raw": raw,
                           "comp": comp})
        agg = (df.groupby(["lang", "bucket"], as_index=False)
               .agg(n=("raw", "size"), raw_bytes=("raw", "sum"),
                    comp_bytes=("comp", "sum")))
        agg["n"] = agg.n.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        agg = (_parts_pandas(parts_ds, {"lang": object,
                                        "bucket": np.int64,
                                        "n": np.int64,
                                        "raw_bytes": np.int64,
                                        "comp_bytes": np.int64})
               .groupby(["lang", "bucket"], as_index=False)
               [["n", "raw_bytes", "comp_bytes"]].sum())
    else:
        agg = (parts_ds.groupby(["lang", "bucket"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("raw_bytes", alias_name="raw_bytes"),
                          Sum("comp_bytes", alias_name="comp_bytes"))
               .to_pandas())
    agg["ratio_r6"] = (agg.comp_bytes / agg.raw_bytes).round(6)
    for c in ["bucket", "n", "raw_bytes", "comp_bytes"]:
        agg[c] = agg[c].astype(np.int64)
    return (agg.sort_values(["lang", "bucket"])
            [["lang", "bucket", "n", "raw_bytes", "comp_bytes",
              "ratio_r6"]].reset_index(drop=True))


def revenue_seasonal_decomposition(sf_dir: str):
    """STL-lite SEASONAL DECOMPOSITION of each type's daily revenue —
    trend = centered 7-day moving average (full windows only),
    seasonal = per-weekday mean of the detrended series, remainder =
    detrended − seasonal: the additive decomposition every monitoring
    stack runs before alerting.  Output per (type, weekday): the
    seasonal component plus the type's remainder variance — float
    columns follow the 6-dp contract with mirrored op order; the day
    count is the exact integer anchor.  The daily rollup combines
    tiered; the decomposition runs on the output-scale series."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def day_partial(b: pa.Table) -> pa.Table:
        ts = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = ts // 86_400_000_000
        df = pd.DataFrame({
            "event_type": pd.Series(b["event_type"].to_pandas())
            .to_numpy(dtype=object), "day": day,
            "rev": _cents_away(b["value"]
                               .to_numpy(zero_copy_only=False))})
        agg = (df.groupby(["event_type", "day"], as_index=False)
               ["rev"].sum())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(day_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        daily = (_parts_pandas(parts_ds, {"event_type": object,
                                          "day": np.int64,
                                          "rev": np.int64})
                 .groupby(["event_type", "day"], as_index=False)
                 ["rev"].sum())
    else:
        daily = (parts_ds.groupby(["event_type", "day"])
                 .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    rows = []
    for t, g in daily.groupby("event_type", sort=True):
        g = g.sort_values("day")
        d = g.day.to_numpy(np.int64)
        r = g.rev.to_numpy(np.int64).astype(np.float64)
        if len(r) < 7:
            continue
        # centered MA-7 over OBSERVED rows (full windows only):
        # positions 3 .. n-4
        from numpy.lib.stride_tricks import sliding_window_view

        trend = sliding_window_view(r, 7).sum(axis=1) / 7.0
        mid = slice(3, len(r) - 3)
        det = r[mid] - trend
        dow = ((d[mid] + 4) % 7).astype(np.int64)  # 1970-01-01 = Thu
        seas = pd.DataFrame({"dow": dow, "det": det}) \
            .groupby("dow").det.agg(["mean", "size"])
        smap = seas["mean"].to_dict()
        rem = det - np.fromiter((smap[x] for x in dow),
                                dtype=np.float64, count=len(dow))
        n = float(len(rem))
        rem_var = ((rem * rem).sum() / n
                   - (rem.sum() / n) * (rem.sum() / n))
        mean_all = r.sum() / len(r)  # normalizer: O(1) outputs keep
        # the 6-dp contract safely above double noise
        for dw in sorted(smap):
            rows.append((t, np.int64(dw),
                         np.int64(int(seas["size"].loc[dw])),
                         round(float(smap[dw]) / mean_all, 6),
                         round(float(np.sqrt(max(rem_var, 0.0)))
                               / mean_all, 6)))
    out = pd.DataFrame(rows, columns=["event_type", "dow", "n_days",
                                      "seasonal_rel_r6", "rem_cv_r6"])
    out["dow"] = out.dow.astype(np.int64)
    out["n_days"] = out.n_days.astype(np.int64)
    return (out.sort_values(["event_type", "dow"])
            .reset_index(drop=True))


def nation_year_profit(sf_dir: str, name_token: str = "red"):
    """TPC-H Q9 shape (adapted: this fixture set has no partsupp
    table, so unit cost is the part's retail price) — PROFIT by
    supplier nation and order YEAR over parts whose name contains a
    token: the one Q-census shape grouping by attributes from TWO
    different dimension branches (supplier→nation, orders→year) of the
    same fact scan.  amount = extprice·(1−discount) − qty·retailprice
    in exact integer cent·percent units.  Plan: the part filter
    resolves to a (sorted partkey, retail-cents) pair that attaches
    MAP-SIDE below the gate (hash join above); supplier→nation rides
    the same tier; matching lineitem rows pre-reduce per block to
    (orderkey, nation, amount, n) so the year attach — broadcast
    (orderkey→year) below `CUST_BROADCAST_MAX_ROWS`, hash join above —
    moves partial rows only; the final (nation, year) rollup is
    output-scale (|nations|×|years|)."""
    import ray

    from biobloom_ray.io import hash_join

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat.n_nationkey.to_numpy(np.int64),
                     nat.n_name.to_numpy(dtype=object)))

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_name", "p_retailprice"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"])

    def part_sel(b: pa.Table) -> pa.Table:
        hit = pc.match_substring(b["p_name"], name_token)
        sub = b.filter(hit)
        return pa.table({
            "pk": sub["p_partkey"].cast(pa.int64()),
            "retail_cents": pa.array(_cents_away(
                sub["p_retailprice"].to_numpy(zero_copy_only=False)))})

    psel = part.map_batches(part_sel, batch_format="pyarrow")
    n_part = _cheap_count(part)
    broadcast = n_part is not None and n_part <= PART_DRIVER_MAX_ROWS

    def ord_year(b: pa.Table) -> pa.Table:
        yr = pc.year(b["o_orderdate"]).cast(pa.int64())
        return pa.table({"ok2": b["o_orderkey"].cast(pa.int64()),
                         "o_year": yr})

    if broadcast:
        pp = _parts_pandas(psel, {"pk": np.int64,
                                  "retail_cents": np.int64})
        order = np.argsort(pp.pk.to_numpy(np.int64))
        pk = pp.pk.to_numpy(np.int64)[order]
        retail = pp.retail_cents.to_numpy(np.int64)[order]
        sp = supp.to_pandas()
        so = np.argsort(sp.s_suppkey.to_numpy(np.int64))
        sk = sp.s_suppkey.to_numpy(np.int64)[so]
        sn = sp.s_nationkey.to_numpy(np.int64)[so]
        dim_ref = ray.put((pk, retail, sk, sn))

        def li_partial(b: pa.Table) -> pa.Table:
            kp, rt, ks, ns = ray.get(dim_ref)
            v = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kp, v)
            pos[pos >= len(kp)] = 0
            hit = (kp[pos] == v) if len(kp) else np.zeros(len(v), bool)
            sub = b.filter(pa.array(hit))
            if sub.num_rows == 0:
                return pa.table({"ok": pa.array([], pa.int64()),
                                 "snat": pa.array([], pa.int64()),
                                 "amount": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            rc = rt[pos[hit]]
            sv = sub["l_suppkey"].to_numpy(zero_copy_only=False)
            sp_ = np.searchsorted(ks, sv)
            sp_[sp_ >= len(ks)] = 0
            snat = ns[sp_]
            cents = _cents_away(
                sub["l_extendedprice"].to_numpy(zero_copy_only=False))
            disc = _cents_away(
                sub["l_discount"].to_numpy(zero_copy_only=False))
            qty = sub["l_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            amount = cents * (100 - disc) - qty * rc * 100
            df = pd.DataFrame({
                "ok": sub["l_orderkey"].to_numpy(zero_copy_only=False),
                "snat": snat, "amount": amount})
            agg = (df.groupby(["ok", "snat"], as_index=False)
                   .agg(amount=("amount", "sum"),
                        n=("amount", "size")))
            agg["n"] = agg.n.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        li_parts = li.map_batches(li_partial, batch_format="pyarrow")
    else:
        # cluster tier: (ok, sk, pk) block pre-reduce of (rev, qty, n),
        # then part and supplier attaches as hash joins
        def li_pre(b: pa.Table) -> pa.Table:
            cents = _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))
            disc = _cents_away(
                b["l_discount"].to_numpy(zero_copy_only=False))
            qty = b["l_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            df = pd.DataFrame({
                "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
                "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
                "rev": cents * (100 - disc), "qty": qty})
            agg = (df.groupby(["ok", "sk", "pk"], as_index=False)
                   .agg(rev=("rev", "sum"), qty=("qty", "sum"),
                        n=("rev", "size")))
            agg["n"] = agg.n.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        li_p = hash_join(li.map_batches(li_pre, batch_format="pyarrow"),
                         psel, on=("pk",))
        li_s = hash_join(li_p, supp, on=("sk",), right_on=("s_suppkey",))

        def li_amount(b: pa.Table) -> pa.Table:
            rev = b["rev"].to_numpy(zero_copy_only=False)
            qty = b["qty"].to_numpy(zero_copy_only=False)
            rc = b["retail_cents"].to_numpy(zero_copy_only=False)
            return pa.table({
                "ok": b["ok"],
                "snat": b["s_nationkey"].cast(pa.int64()),
                "amount": pa.array(rev - qty * rc * 100),
                "n": b["n"]})

        li_parts = li_s.map_batches(li_amount, batch_format="pyarrow")

    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= CUST_BROADCAST_MAX_ROWS:
        op = orders.map_batches(ord_year, batch_format="pyarrow") \
            .to_pandas()
        oo = np.argsort(op.ok2.to_numpy(np.int64))
        ok = op.ok2.to_numpy(np.int64)[oo]
        oy = op.o_year.to_numpy(np.int64)[oo]
        oy_ref = ray.put((ok, oy))

        def year_attach(b: pa.Table) -> pa.Table:
            kk, yy = ray.get(oy_ref)
            v = b["ok"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, v)
            pos[pos >= len(kk)] = 0
            df = pd.DataFrame({
                "snat": b["snat"].to_numpy(zero_copy_only=False),
                "o_year": yy[pos],
                "amount": b["amount"].to_numpy(zero_copy_only=False),
                "n": b["n"].to_numpy(zero_copy_only=False)})
            agg = (df.groupby(["snat", "o_year"], as_index=False)
                   [["amount", "n"]].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts_ds = li_parts.map_batches(year_attach,
                                        batch_format="pyarrow")
    else:
        joined = hash_join(
            li_parts, orders.map_batches(ord_year,
                                         batch_format="pyarrow"),
            on=("ok",), right_on=("ok2",))

        def grp_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "snat": b["snat"].to_numpy(zero_copy_only=False),
                "o_year": b["o_year"].to_numpy(zero_copy_only=False),
                "amount": b["amount"].to_numpy(zero_copy_only=False),
                "n": b["n"].to_numpy(zero_copy_only=False)})
            agg = (df.groupby(["snat", "o_year"], as_index=False)
                   [["amount", "n"]].sum())
            return pa.Table.from_pandas(agg, preserve_index=False)

        parts_ds = joined.map_batches(grp_partial,
                                      batch_format="pyarrow")

    parts = _parts_pandas(parts_ds, {"snat": np.int64,
                                     "o_year": np.int64,
                                     "amount": np.int64, "n": np.int64})
    agg = (parts.groupby(["snat", "o_year"], as_index=False)
           [["amount", "n"]].sum())
    agg["n_name"] = agg.snat.map(names)
    out = agg.rename(columns={"amount": "profit", "n": "n_items"}) \
        [["n_name", "o_year", "profit", "n_items"]] \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)
    out["o_year"] = out.o_year.astype(np.int64)
    out["profit"] = out.profit.astype(np.int64)
    out["n_items"] = out.n_items.astype(np.int64)
    return out


def incremental_dedup_report(sf_dir: str, n_chars: int = 64):
    """INCREMENTAL INGESTION dedup report — the day-2 batch classified
    against the day-1 snapshot, the shape every continuously-crawled
    corpus runs nightly.  Day 1 = even doc_ids, day 2 = odd (a
    deterministic split of the fixture); the dedup key is the C4-style
    ``n_chars``-prefix fingerprint (same key as `prefix_dup_groups`,
    which the fixture exercises with real collisions).  Each day-2 doc
    is exactly one of: `dup_day1` (prefix already in the snapshot),
    `dup_within` (new prefix but a smaller-id day-2 doc already has
    it), `new`.  Plan: ONE fingerprint rollup over all docs — per-fp
    (seen-in-day-1 flag, min odd id) pre-reduced per block — then
    day-2 rows classify map-side (rollup broadcast below
    `RANK_DRIVER_MAX_ROWS` input rows, hash join above) and the
    per-lang counts are output-scale.  No text moves in any shuffle:
    the rollup carries 32-hex digests of the prefix."""
    import ray

    from biobloom_ray.io import hash_join
    from biobloom_ray.textnorm import content_md5_batch

    SENTINEL = np.int64(2**62)
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def _pfp(b: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(b["text"], 0, n_chars)
        return b.append_column("fp_md5", pa.array(
            content_md5_batch(pref), type=pa.large_string()))

    def fp_partial(b: pa.Table) -> pa.Table:
        h = _pfp(b)
        did = h["doc_id"].to_numpy(zero_copy_only=False)
        odd = did % 2 == 1
        df = pd.DataFrame({
            "fp": h["fp_md5"].to_pandas().to_numpy(dtype=object),
            "has1": (~odd).astype(np.int64),
            "modd": np.where(odd, did, SENTINEL)})
        agg = (df.groupby("fp", as_index=False)
               .agg(has1=("has1", "max"), modd=("modd", "min")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def day2_rows(b: pa.Table) -> pa.Table:
        h = _pfp(b)
        odd = pc.equal(pc.bit_wise_and(h["doc_id"], 1), 1)
        sub = h.filter(odd)
        return pa.table({"doc_id": sub["doc_id"].cast(pa.int64()),
                         "lang": sub["lang"],
                         "fp2": sub["fp_md5"].cast(pa.string())})

    def classify(doc_id, lang, has1, modd) -> pa.Table:
        cls = np.where(has1 > 0, 0, np.where(doc_id > modd, 1, 2))
        df = pd.DataFrame({"lang": lang,
                           "n_day2": np.ones(len(cls), np.int64),
                           "n_dup_day1": (cls == 0).astype(np.int64),
                           "n_dup_within": (cls == 1).astype(np.int64),
                           "n_new": (cls == 2).astype(np.int64)})
        agg = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(fp_partial, batch_format="pyarrow")
    cols = ["n_day2", "n_dup_day1", "n_dup_within", "n_new"]
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        r = _parts_pandas(parts_ds, {"fp": object, "has1": np.int64,
                                     "modd": np.int64})
        r = (r.groupby("fp", as_index=False)
             .agg(has1=("has1", "max"), modd=("modd", "min")))
        order = np.argsort(r.fp.to_numpy(dtype=object))
        fps = r.fp.to_numpy(dtype=object)[order]
        has1 = r.has1.to_numpy(np.int64)[order]
        modd = r.modd.to_numpy(np.int64)[order]
        roll_ref = ray.put((fps, has1, modd))

        def cls_map(b: pa.Table) -> pa.Table:
            ff, hh, mm = ray.get(roll_ref)
            d2 = day2_rows(b)
            f2 = d2["fp2"].to_pandas().to_numpy(dtype=object)
            pos = np.searchsorted(ff, f2)  # every fp present
            return classify(
                d2["doc_id"].to_numpy(zero_copy_only=False),
                d2["lang"].to_pandas().to_numpy(dtype=object),
                hh[pos], mm[pos])

        cparts = ds.map_batches(cls_map, batch_format="pyarrow")
        p = _parts_pandas(cparts, {"lang": object,
                                   **{c: np.int64 for c in cols}})
        out = p.groupby("lang", as_index=False)[cols].sum()
    else:
        rollup = (parts_ds.groupby("fp")
                  .aggregate(Max("has1", alias_name="has1"),
                             Min("modd", alias_name="modd")))
        d2 = ds.map_batches(day2_rows, batch_format="pyarrow")
        joined = hash_join(d2, rollup, on=("fp2",), right_on=("fp",))

        def cls_join(b: pa.Table) -> pa.Table:
            return classify(
                b["doc_id"].to_numpy(zero_copy_only=False),
                b["lang"].to_pandas().to_numpy(dtype=object),
                b["has1"].to_numpy(zero_copy_only=False),
                b["modd"].to_numpy(zero_copy_only=False))

        cparts = joined.map_batches(cls_join, batch_format="pyarrow")
        out = (cparts.groupby("lang")
               .aggregate(*[Sum(c, alias_name=c) for c in cols])
               .to_pandas())
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def lang_temperature_mix(sf_dir: str, alpha: float = 0.5,
                         col: str = "lang"):
    """TEMPERATURE-SCALED mixing weights — the multinomial
    p_g ∝ n_g^α reweighting (α<1 up-samples small groups) every
    multilingual / multi-source training mix applies before sampling
    (the mBERT/XLM-R low-resource-language up-sampling trick; also
    works per ``source``).  Map-only per-block (group, n) partials,
    tiered combine, then the weight math runs on the output-scale
    (≤ |groups|) table: weight = n^α / Σ n^α and boost =
    weight / (n / N) — the factor by which the group is
    over/under-sampled vs natural frequency.  Float outputs follow
    the 6-dp contract with mirrored op order."""
    ds = _read(sf_dir, "documents", columns=[col])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            col: b[col].to_pandas().to_numpy(dtype=object)})
        agg = df.groupby(col, as_index=False).agg(
            n_docs=(col, "size"))
        agg["n_docs"] = agg.n_docs.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        c = (_parts_pandas(parts_ds, {col: object,
                                      "n_docs": np.int64})
             .groupby(col, as_index=False).n_docs.sum())
    else:
        c = (parts_ds.groupby(col)
             .aggregate(Sum("n_docs", alias_name="n_docs")).to_pandas())
    c = c.sort_values(col).reset_index(drop=True)
    n = c.n_docs.to_numpy(np.int64).astype(np.float64)
    w = np.power(n, alpha)
    tw, tn = w.sum(), n.sum()
    c["n_docs"] = c.n_docs.astype(np.int64)
    c["weight_r6"] = np.round(w / tw, 6)
    c["boost_r6"] = np.round((w / tw) / (n / tn), 6)
    return c


def segment_unshipped_topk(sf_dir: str, segment: str = "BUILDING",
                           cutoff: str = "1998-07-01", k: int = 10):
    """TPC-H Q3 shape — SHIPPING-PRIORITY top-k: among orders placed
    by customers of one market segment BEFORE the cutoff date, the
    top-k orders by revenue of their lineitems shipped AFTER the
    cutoff (the "booked but unshipped at date" report; the fixture
    set has no o_shippriority so the order's priority attaches in its
    place).  Exact integer cent·percent revenue.  Plan: the segment's
    custkeys prune date-filtered orders (broadcast sorted-array
    membership below `ANTI_BROADCAST_MAX_ROWS` customers, hash join
    above); lineitems filter map-side on shipdate and pre-reduce per
    block to (orderkey, rev, n) partials; the per-order rollup is a
    driver combine below the orders gate and a native Sum groupby
    above, with a per-block exact top-k on the disjoint-key
    post-groupby blocks; order attrs attach on the ≤k·#blocks
    candidate table."""
    import ray

    from biobloom_ray.io import hash_join

    cut = np.datetime64(cutoff, "us").astype(np.int64)
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        sd = (b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        m = sd > cut
        lk = b["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))[m]
        disc = _cents_away(
            b["l_discount"].to_numpy(zero_copy_only=False))[m]
        df = pd.DataFrame({"l_orderkey": lk,
                           "rev": cents * (100 - disc)})
        agg = (df.groupby("l_orderkey", as_index=False)
               .agg(rev=("rev", "sum"), n_items=("rev", "size")))
        agg["n_items"] = agg.n_items.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def ord_sel(b: pa.Table) -> pa.Table:
        od = (b["o_orderdate"].cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy(zero_copy_only=False))
        sub = b.filter(pa.array(od < cut))
        return pa.table({
            "ok": sub["o_orderkey"].cast(pa.int64()),
            "ck": sub["o_custkey"].cast(pa.int64()),
            "o_orderdate": sub["o_orderdate"],
            "o_orderpriority": sub["o_orderpriority"]})

    osel = orders.map_batches(ord_sel, batch_format="pyarrow")
    n_cust = _cheap_count(cust)
    if n_cust is not None and n_cust <= ANTI_BROADCAST_MAX_ROWS:
        cp = cust.to_pandas()
        keys = np.sort(cp.c_custkey[cp.c_mktsegment == segment]
                       .to_numpy(np.int64))
        keys_ref = ray.put(keys)

        def seg_filter(b: pa.Table) -> pa.Table:
            kk = ray.get(keys_ref)
            v = b["ck"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kk, v)
            pos[pos >= len(kk)] = 0
            hit = (kk[pos] == v) if len(kk) else np.zeros(len(v), bool)
            return b.filter(pa.array(hit))

        osel = osel.map_batches(seg_filter, batch_format="pyarrow")
    else:
        def seg_keys(b: pa.Table) -> pa.Table:
            sub = b.filter(pc.equal(b["c_mktsegment"], segment))
            return pa.table({"ck2": sub["c_custkey"].cast(pa.int64())})

        osel = hash_join(osel, cust.map_batches(
            seg_keys, batch_format="pyarrow"), on=("ck",),
            right_on=("ck2",))

    parts_ds = li.map_batches(li_partial, batch_format="pyarrow")
    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= CUST_BROADCAST_MAX_ROWS:
        op = osel.to_pandas()
        parts = _parts_pandas(parts_ds, {"l_orderkey": np.int64,
                                         "rev": np.int64,
                                         "n_items": np.int64})
        agg = (parts.groupby("l_orderkey", as_index=False)
               [["rev", "n_items"]].sum())
        cand = agg.merge(op, left_on="l_orderkey", right_on="ok")
    else:
        rolled = (parts_ds.groupby("l_orderkey")
                  .aggregate(Sum("rev", alias_name="rev"),
                             Sum("n_items", alias_name="n_items")))
        joined = hash_join(rolled, osel, on=("l_orderkey",),
                           right_on=("ok",))

        def local_topk(b: pa.Table) -> pa.Table:
            rv = b["rev"].to_numpy(zero_copy_only=False)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            idx = np.lexsort((lk, -rv))[:k]
            return b.take(pa.array(idx))

        cand = (joined.map_batches(local_topk, batch_format="pyarrow")
                .to_pandas())
    out = (cand.sort_values(["rev", "l_orderkey"],
                            ascending=[False, True]).head(k)
           [["l_orderkey", "rev", "n_items", "o_orderdate",
             "o_orderpriority"]]
           .rename(columns={"rev": "revenue"})
           .reset_index(drop=True))
    out["l_orderkey"] = out.l_orderkey.astype(np.int64)
    out["revenue"] = out.revenue.astype(np.int64)
    out["n_items"] = out.n_items.astype(np.int64)
    out["o_orderdate"] = out.o_orderdate.astype("datetime64[us]")
    return out


def state_dwell_times(sf_dir: str):
    """TIME-IN-STATE per event type: each event opens a "state" that
    lasts until the user's NEXT event (any type); dwell = that gap in
    whole seconds (per-gap floor, mirrored in the oracle), attributed
    to the OPENING event's type — the session-less engagement metric
    (how long users sit in search vs checkout).  Exact int64 gap sums
    + one final 6-dp division.  Below the gate: one driver
    sort + segment diff.  Above: the salt-by-time-range plan (same as
    `event_transitions`): (user, hour-bucket) map_groups emit
    within-bucket (type, n, sum_s) partials plus one boundary row,
    a second user-scale groupby stitches the cross-bucket gaps, and
    the final rollup is ≤ |types| rows per block."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    n_rows = _cheap_count(ds)

    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas()
        if not len(df):  # empty to_pandas loses the schema
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_gaps": pd.Series([], dtype=np.int64),
                "total_dwell_s": pd.Series([], dtype=np.int64),
                "mean_dwell_r6": pd.Series([], dtype=np.float64)})
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        uid = df.user_id.to_numpy()
        ts = df.ts_us.to_numpy()
        et = df.event_type.to_numpy(dtype=object)
        nxt_same = np.r_[uid[1:] == uid[:-1], False]
        gaps = np.empty(len(ts), np.int64)
        gaps[:-1] = (ts[1:] - ts[:-1]) // 1_000_000
        rows = pd.DataFrame({"event_type": et[nxt_same],
                             "dwell": gaps[nxt_same]})
        agg = (rows.groupby("event_type", as_index=False)
               .agg(n_gaps=("dwell", "size"),
                    total_dwell_s=("dwell", "sum")))
    else:
        span_us = np.int64(ASOF_SALT_SPAN_S) * np.int64(1_000_000)

        def bucketize(b: pa.Table) -> pa.Table:
            ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            return pa.table({
                "user_id": b["user_id"], "event_id": b["event_id"],
                "ts_us": ts_us, "event_type": b["event_type"],
                "bucket": pc.divide(ts_us, span_us)})

        def local_dwell(g: pa.Table) -> pa.Table:
            """kind 0 = within-bucket (type, n, s) partials; kind 1 =
            boundary row (first ts / last ts+type of the bucket)."""
            ts = g["ts_us"].to_numpy(zero_copy_only=False)
            eid = g["event_id"].to_numpy(zero_copy_only=False)
            et = g["event_type"].to_numpy(zero_copy_only=False)
            order = np.lexsort((eid, ts))
            ts, et = ts[order], et[order]
            uid = g["user_id"][0].as_py()
            bkt = int(g["bucket"][0].as_py())
            parts = []
            if len(ts) > 1:
                d = pd.DataFrame({
                    "t": et[:-1],
                    "s": (ts[1:] - ts[:-1]) // 1_000_000})
                agg = (d.groupby("t", as_index=False)
                       .agg(n=("s", "size"), s=("s", "sum")))
                parts.append(pa.table({
                    "kind": pa.array(np.zeros(len(agg), np.int64)),
                    "user_id": pa.array(
                        np.full(len(agg), uid, np.int64)),
                    "bucket": pa.array(
                        np.full(len(agg), bkt, np.int64)),
                    "t": pa.array(agg.t.to_numpy(dtype=object),
                                  pa.string()),
                    "n": pa.array(agg.n.to_numpy(np.int64)),
                    "s": pa.array(agg.s.to_numpy(np.int64)),
                    "first_ts": pa.array([0] * len(agg), pa.int64()),
                    "last_ts": pa.array([0] * len(agg), pa.int64())}))
            parts.append(pa.table({
                "kind": pa.array([1], pa.int64()),
                "user_id": pa.array([uid], pa.int64()),
                "bucket": pa.array([bkt], pa.int64()),
                "t": pa.array([str(et[-1])], pa.string()),
                "n": pa.array([0], pa.int64()),
                "s": pa.array([0], pa.int64()),
                "first_ts": pa.array([int(ts[0])], pa.int64()),
                "last_ts": pa.array([int(ts[-1])], pa.int64())}))
            return pa.concat_tables(parts)

        def stitch(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("bucket")
            ft = g.first_ts.to_numpy(np.int64)
            lt = g.last_ts.to_numpy(np.int64)
            tp = g.t.to_numpy(dtype=object)
            if len(g) < 2:
                return pd.DataFrame(
                    {"t": [], "n": [], "s": []}).astype(
                        {"t": object, "n": np.int64, "s": np.int64})
            d = pd.DataFrame({
                "t": tp[:-1], "s": (ft[1:] - lt[:-1]) // 1_000_000})
            agg = (d.groupby("t", as_index=False)
                   .agg(n=("s", "size"), s=("s", "sum")))
            agg["n"] = agg.n.astype(np.int64)
            agg["s"] = agg.s.astype(np.int64)
            return agg

        shards = (ds.map_batches(bucketize, batch_format="pyarrow")
                  .groupby(["user_id", "bucket"])
                  .map_groups(local_dwell, batch_format="pyarrow"))
        shards = shards.materialize()

        def keep_kind(k: int):
            def f(b: pa.Table) -> pa.Table:
                return b.filter(pc.equal(b["kind"], k))
            return f

        within = shards.map_batches(keep_kind(0),
                                    batch_format="pyarrow")
        bound = (shards.map_batches(keep_kind(1),
                                    batch_format="pyarrow")
                 .groupby("user_id")
                 .map_groups(stitch, batch_format="pandas"))

        def w_rollup(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "t": b["t"].to_pandas().to_numpy(dtype=object),
                "n": b["n"].to_numpy(zero_copy_only=False),
                "s": b["s"].to_numpy(zero_copy_only=False)})
            agg = df.groupby("t", as_index=False)[["n", "s"]].sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

        w1 = within.map_batches(w_rollup, batch_format="pyarrow") \
            .to_pandas()
        w2 = bound.map_batches(w_rollup, batch_format="pyarrow") \
            .to_pandas()
        agg = (pd.concat([w1, w2], ignore_index=True)
               .groupby("t", as_index=False)[["n", "s"]].sum()
               .rename(columns={"t": "event_type", "n": "n_gaps",
                                "s": "total_dwell_s"}))
    agg["mean_dwell_r6"] = (agg.total_dwell_s / agg.n_gaps).round(6)
    agg["n_gaps"] = agg.n_gaps.astype(np.int64)
    agg["total_dwell_s"] = agg.total_dwell_s.astype(np.int64)
    return agg.sort_values("event_type").reset_index(drop=True)


def weighted_median_quantity(sf_dir: str):
    """EXACT WEIGHTED MEDIAN — quantity weighted by revenue cents per
    return flag (the "median unit size by dollar volume" report no
    unweighted percentile reproduces).  The corpus reduces to a
    ((flag, qty) → Σw) weight-cardinality table — same move as the
    exact-percentile family but accumulating integer WEIGHT instead of
    count — then the median pass walks the output-scale table
    (bounded by the qty domain) picking the smallest qty with
    2·cumw ≥ totw: pure int64 comparisons, no float boundary."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "rf": b["l_returnflag"].to_pandas().to_numpy(dtype=object),
            "qty": b["l_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "w": _cents_away(
                b["l_extendedprice"].to_numpy(zero_copy_only=False))})
        agg = df.groupby(["rf", "qty"], as_index=False).w.sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        c = (_parts_pandas(parts_ds, {"rf": object, "qty": np.int64,
                                      "w": np.int64})
             .groupby(["rf", "qty"], as_index=False).w.sum())
    else:
        c = (parts_ds.groupby(["rf", "qty"])
             .aggregate(Sum("w", alias_name="w")).to_pandas())
    c = c.sort_values(["rf", "qty"]).reset_index(drop=True)
    rows = []
    for rf, g in c.groupby("rf", sort=True):
        w = g.w.to_numpy(np.int64)
        cw = np.cumsum(w)
        tot = int(cw[-1])
        pick = int(np.argmax(2 * cw >= tot))
        rows.append((rf, int(g.qty.to_numpy(np.int64)[pick]), tot))
    out = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_qty",
                                      "total_w"])
    out["wmedian_qty"] = out.wmedian_qty.astype(np.int64)
    out["total_w"] = out.total_w.astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def vocab_coverage_topp(sf_dir: str, pct: int = 90):
    """NUCLEUS (top-p) VOCABULARY COVERAGE per language: the minimal
    number of distinct tokens whose summed frequency reaches ``pct``%
    of the language's token mass (the "how small can the tokenizer
    vocab be" curve; Zipf makes it tiny).  Exact integers end-to-end:
    the inherent (lang, token) vocabulary shuffle (narrow rows) below
    — driver combine under `RANK_DRIVER_MAX_ROWS` input rows, native
    Sum groupby above — reduces to a per-lang COUNTS-OF-COUNTS table
    (≤ #distinct frequencies rows, log-scale under Zipf), and the
    crossing walk picks full count-buckets plus the exact partial take
    ceil((thr − cum)/cnt); ties inside a bucket are interchangeable so
    the minimum is exact."""
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def lt_partial(b: pa.Table) -> pa.Table:
        flat, lens, _ = _token_arrays(b)
        lg = np.repeat(
            b["lang"].to_pandas().to_numpy(dtype=object), lens)
        if not len(flat):
            return pa.table({"lang": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        df = pd.DataFrame({"lang": lg, "token": flat})
        agg = (df.groupby(["lang", "token"], as_index=False)
               .size().rename(columns={"size": "cnt"}))
        agg["cnt"] = agg.cnt.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(lt_partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        vocab = (_parts_pandas(parts_ds, {"lang": object,
                                          "token": object,
                                          "cnt": np.int64})
                 .groupby(["lang", "token"], as_index=False).cnt.sum())
        cc = (vocab.groupby(["lang", "cnt"], as_index=False)
              .size().rename(columns={"size": "k"}))
    else:
        vocab = (parts_ds.groupby(["lang", "token"])
                 .aggregate(Sum("cnt", alias_name="cnt")))

        def cc_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "lang": b["lang"].to_pandas().to_numpy(dtype=object),
                "cnt": b["cnt"].to_numpy(zero_copy_only=False)})
            agg = (df.groupby(["lang", "cnt"], as_index=False)
                   .size().rename(columns={"size": "k"}))
            agg["k"] = agg.k.astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        cc = (_parts_pandas(
            vocab.map_batches(cc_partial, batch_format="pyarrow"),
            {"lang": object, "cnt": np.int64, "k": np.int64})
            .groupby(["lang", "cnt"], as_index=False).k.sum())
    rows = []
    for lang, g in cc.groupby("lang", sort=True):
        g = g.sort_values("cnt", ascending=False)
        cnt = g.cnt.to_numpy(np.int64)
        k = g.k.to_numpy(np.int64)
        mass = cnt * k
        tot = int(mass.sum())
        n_vocab = int(k.sum())
        thr = -(-pct * tot // 100)  # ceil(pct·tot/100), exact
        cum = np.cumsum(mass)
        j = int(np.argmax(cum >= thr))
        before = int(cum[j - 1]) if j else 0
        need = thr - before
        n_cover = int(k[:j].sum()) + int(-(-need // cnt[j]))
        rows.append((lang, n_vocab, tot, n_cover))
    out = pd.DataFrame(rows, columns=["lang", "n_vocab",
                                      "total_tokens", "n_cover"])
    for c in ["n_vocab", "total_tokens", "n_cover"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def order_fulfillment_latency(sf_dir: str):
    """ORDER FULFILLMENT LATENCY per priority: whole days from order
    date to the LAST lineitem ship date (the complete-shipment lag).
    Exact integers: per-block (orderkey, max shipdate) partials →
    native Max groupby above `LINEITEM_DRIVER_MAX_ROWS` (driver
    combine below) → order date attach (broadcast sorted arrays below
    `CUST_BROADCAST_MAX_ROWS` orders, hash join above) → a (priority,
    days) count table whose per-priority walk yields n / max / exact
    lower-median days; the mean is one final 6-dp division."""
    import ray

    from biobloom_ray.io import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])

    def li_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "ship_us": b["l_shipdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False)})
        agg = df.groupby("ok", as_index=False).ship_us.max()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(li_partial, batch_format="pyarrow")
    DAY_US = np.int64(86_400_000_000)
    n_li = _cheap_count(li)
    n_ord = _cheap_count(orders)
    if n_li is not None and n_li <= LINEITEM_DRIVER_MAX_ROWS:
        ms = (_parts_pandas(parts_ds, {"ok": np.int64,
                                       "ship_us": np.int64})
              .groupby("ok", as_index=False).ship_us.max())
        op = orders.to_pandas()
        if not len(op):  # empty to_pandas loses the schema
            op = pd.DataFrame({
                "o_orderkey": pd.Series([], dtype=np.int64),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype=object)})
        op["od_us"] = op.o_orderdate.astype(
            "datetime64[us]").astype(np.int64)
        m = ms.merge(op, left_on="ok", right_on="o_orderkey")
        days = (m.ship_us.to_numpy(np.int64)
                - m.od_us.to_numpy(np.int64)) // DAY_US
        c = (pd.DataFrame({"pr": m.o_orderpriority
                           .to_numpy(dtype=object), "days": days})
             .groupby(["pr", "days"], as_index=False)
             .size().rename(columns={"size": "n"}))
    else:
        maxed = (parts_ds.groupby("ok")
                 .aggregate(Max("ship_us", alias_name="ship_us")))

        def ord_proj(b: pa.Table) -> pa.Table:
            return pa.table({
                "ok2": b["o_orderkey"].cast(pa.int64()),
                "od_us": b["o_orderdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "pr": b["o_orderpriority"]})

        oproj = orders.map_batches(ord_proj, batch_format="pyarrow")
        if n_ord is not None and n_ord <= CUST_BROADCAST_MAX_ROWS:
            od = oproj.to_pandas()
            oo = np.argsort(od.ok2.to_numpy(np.int64))
            okeys = od.ok2.to_numpy(np.int64)[oo]
            ods = od.od_us.to_numpy(np.int64)[oo]
            prs = od.pr.to_numpy(dtype=object)[oo]
            oref = ray.put((okeys, ods, prs))

            def attach(b: pa.Table) -> pa.Table:
                kk, dd, pp = ray.get(oref)
                v = b["ok"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(kk, v)
                pos[pos >= len(kk)] = 0
                days = (b["ship_us"].to_numpy(zero_copy_only=False)
                        - dd[pos]) // DAY_US
                df = pd.DataFrame({"pr": pp[pos], "days": days})
                agg = (df.groupby(["pr", "days"], as_index=False)
                       .size().rename(columns={"size": "n"}))
                agg["n"] = agg.n.astype(np.int64)
                return pa.Table.from_pandas(agg, preserve_index=False)

            cparts = maxed.map_batches(attach, batch_format="pyarrow")
        else:
            joined = hash_join(maxed, oproj, on=("ok",),
                               right_on=("ok2",))

            def jdays(b: pa.Table) -> pa.Table:
                days = (b["ship_us"].to_numpy(zero_copy_only=False)
                        - b["od_us"].to_numpy(zero_copy_only=False)
                        ) // DAY_US
                df = pd.DataFrame({
                    "pr": b["pr"].to_pandas().to_numpy(dtype=object),
                    "days": days})
                agg = (df.groupby(["pr", "days"], as_index=False)
                       .size().rename(columns={"size": "n"}))
                agg["n"] = agg.n.astype(np.int64)
                return pa.Table.from_pandas(agg, preserve_index=False)

            cparts = joined.map_batches(jdays, batch_format="pyarrow")
        c = (_parts_pandas(cparts, {"pr": object, "days": np.int64,
                                    "n": np.int64})
             .groupby(["pr", "days"], as_index=False).n.sum())
    rows = []
    for pr, g in c.groupby("pr", sort=True):
        g = g.sort_values("days")
        n = g.n.to_numpy(np.int64)
        d = g.days.to_numpy(np.int64)
        cw = np.cumsum(n)
        tot = int(cw[-1])
        med = int(d[np.argmax(2 * cw >= tot)])
        rows.append((pr, tot, int(d[-1]), med,
                     round(float((d * n).sum()) / tot, 6)))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                      "max_days", "median_days",
                                      "mean_days_r6"])
    for col in ["n_orders", "max_days", "median_days"]:
        out[col] = out[col].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def bloom_fpr_report(sf_dir: str, n_probes: int = 200_000):
    """OBSERVED vs CONFIGURED Bloom FPR — the BASELINE acceptance
    metric ("observed FPR ≤ configured bound at the chosen m/n and k
    hash functions") as a first-class report.  Builds the per-lang
    filter bank (distributed partial-OR build), then probes each
    filter with ``n_probes`` deterministic uniform hash pairs
    (splitmix64 of a counter — exactly the unseen-key distribution the
    FPR formula assumes): hit rate = observed FPR.  Probes stream as a
    `ray.data.range` → `map_batches` against the broadcast bank with
    per-block hit-count partials (#filters rows per block), so the
    probe count scales without driver involvement.  No SQL oracle can
    exist (sketch internals); the pytest twin pins binomial agreement
    with the occupancy-derived FPR and the configured bound."""
    import ray
    import ray.data

    from biobloom_ray.config import BuildConfig
    from biobloom_ray.hashing import splitmix64
    from biobloom_ray.pipelines import build_filters

    desired = 0.0078125
    docs = _read(sf_dir, "documents", columns=["text", "lang"])
    built = build_filters(docs, text_col="text", label_col="lang",
                          cfg=BuildConfig(kmer_size=8,
                                          desired_fpr=desired,
                                          batch_size=1024),
                          with_hll=False)
    fids = sorted(built)
    bank_ref = ray.put({f: built[f]["filter"].serialize()
                        for f in fids})

    def probe(b: pa.Table) -> pa.Table:
        from biobloom_ray.sketches.bloom import BloomFilter

        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h1 = splitmix64(ids)
        h2 = splitmix64(ids + np.uint64(0x9E3779B97F4A7C15))
        blobs = ray.get(bank_ref)
        hits = []
        for f in fids:
            bf = BloomFilter.deserialize(blobs[f])
            hits.append(int(bf.contains(h1, h2).sum()))
        return pa.table({"filter_id": pa.array(fids, pa.string()),
                         "n_hits": pa.array(hits, pa.int64()),
                         "n_probes": pa.array(
                             [len(ids)] * len(fids), pa.int64())})

    # batch_size=None → one batch per block: the bank deserializes 8
    # times total, not once per default-size minibatch
    parts = (ray.data.range(n_probes, override_num_blocks=8)
             .map_batches(probe, batch_format="pyarrow",
                          batch_size=None))
    agg = (_parts_pandas(parts, {"filter_id": object,
                                 "n_hits": np.int64,
                                 "n_probes": np.int64})
           .groupby("filter_id", as_index=False)
           [["n_hits", "n_probes"]].sum())
    meta = []
    for f in fids:
        bf = built[f]["filter"]
        meta.append((f, bf.m, bf.hash_num, bf.n_distinct,
                     desired, round(bf.fpr_realized(), 6)))
    md = pd.DataFrame(meta, columns=["filter_id", "m", "hash_num",
                                     "n_distinct", "configured_fpr",
                                     "occupancy_fpr_r6"])
    out = md.merge(agg, on="filter_id")
    out["observed_fpr_r6"] = (out.n_hits / out.n_probes).round(6)
    for c in ["m", "hash_num", "n_distinct", "n_hits", "n_probes"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("filter_id").reset_index(drop=True)


def rfm_segments(sf_dir: str):
    """RFM SEGMENTATION — the classic customer-value cube: per
    customer Recency (whole days from last order to the corpus max
    order date), Frequency (#orders) and Monetary (total cents), each
    bucketed 1-4 by EXACT value-threshold quartiles (t_j = smallest v
    with 4·cum ≥ j·tot — PERCENTILE_DISC semantics; value-based so
    ties share a bucket deterministically), then the output-scale
    (≤4³ rows) segment census.  Plan: per-block (custkey, n, cents,
    max date) partials → tiered combine (native multi-agg groupby
    above `CUST_BROADCAST_MAX_ROWS`) → three count-table threshold
    walks (value-cardinality scale) → map-side bucket assignment →
    segment rollup.  Everything integer-exact."""
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice", "o_orderdate"])
    DAY_US = np.int64(86_400_000_000)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False),
            "cents": _cents_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False)),
            "od_us": b["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False)})
        agg = (df.groupby("ck", as_index=False)
               .agg(f=("cents", "size"), m=("cents", "sum"),
                    last_us=("od_us", "max")))
        agg["f"] = agg.f.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = orders.map_batches(partial, batch_format="pyarrow")
    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= CUST_BROADCAST_MAX_ROWS:
        cust = (_parts_pandas(parts_ds, {"ck": np.int64, "f": np.int64,
                                         "m": np.int64,
                                         "last_us": np.int64})
                .groupby("ck", as_index=False)
                .agg(f=("f", "sum"), m=("m", "sum"),
                     last_us=("last_us", "max")))
    else:
        cust = (parts_ds.groupby("ck")
                .aggregate(Sum("f", alias_name="f"),
                           Sum("m", alias_name="m"),
                           Max("last_us", alias_name="last_us"))
                .to_pandas())
    if not len(cust):  # empty input -> empty census, not a crash
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ["r_q", "f_q", "m_q",
                                       "n_customers"]})
    mx = int(cust.last_us.max())
    cust["r"] = (mx - cust.last_us.to_numpy(np.int64)) // DAY_US

    def quartiles(v: np.ndarray) -> np.ndarray:
        """Exact t_1..t_3: smallest value with 4·cum ≥ j·tot."""
        vals, cnt = np.unique(v, return_counts=True)
        cum = np.cumsum(cnt)
        tot = int(cum[-1])
        return np.array([vals[np.argmax(4 * cum >= j * tot)]
                         for j in (1, 2, 3)], np.int64)

    seg = pd.DataFrame({"ck": cust.ck})
    for col, name in (("r", "r_q"), ("f", "f_q"), ("m", "m_q")):
        v = cust[col].to_numpy(np.int64)
        t = quartiles(v)
        seg[name] = (1 + (v > t[0]).astype(np.int64)
                     + (v > t[1]) + (v > t[2]))
    out = (seg.groupby(["r_q", "f_q", "m_q"], as_index=False)
           .size().rename(columns={"size": "n_customers"}))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["r_q", "f_q", "m_q"])
            .reset_index(drop=True))


def knn_label_accuracy(sf_dir: str, k: int = 5, n_eval: int = 500):
    """k-NN LABEL-VOTE ACCURACY — the standard embedding-quality eval:
    each of the first ``n_eval`` vectors (by id; the bounded eval
    sample) retrieves its k nearest corpus neighbours (cosine, self
    excluded), majority label vote (ties → smallest label), scored
    against the true label; per-label n / correct / accuracy.  The
    corpus side STREAMS — one broadcast (q, d) query matrix, one
    matmul + local top-k per block, per-query k-sized reduce
    (`brute_force_topk_multi`); only the eval sample is bounded.
    Neighbour ranks use the 6-dp-rounded similarity (tie → id) so a
    last-ulp engine difference cannot flip a rank — same contract as
    the retrieval oracles."""
    from biobloom_ray.io import hash_join
    from biobloom_ray.stages.ann import brute_force_topk_multi

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])
    # the eval sample is bounded by construction (map-side id filter);
    # only these n_eval vectors ever materialize with payloads
    qdf = (ds.map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], n_eval)),
        batch_format="pyarrow").to_pandas().sort_values("vec_id"))
    Q = np.stack(qdf.embedding.to_numpy())
    qids = qdf.vec_id.to_numpy(np.int64)

    # fetch a +9 margin beyond self+k so a 6-dp-rounded tie spanning
    # the raw top-k cut cannot change the rounded-rank selection below
    cand_ds = brute_force_topk_multi(ds, Q, qids, k=k + 10)
    labels = ds.select_columns(["vec_id", "label"])
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        meta = labels.to_pandas()
        label_of = dict(zip(meta.vec_id.astype(np.int64),
                            meta.label.astype(np.int64)))
        cand = cand_ds.to_pandas()
        cand["nl"] = cand.vec_id.map(label_of).astype(np.int64)
    else:
        cand = hash_join(
            cand_ds, labels.map_batches(
                lambda b: pa.table({
                    "vid2": b["vec_id"].cast(pa.int64()),
                    "nl": b["label"].cast(pa.int64())}),
                batch_format="pyarrow"),
            on=("vec_id",), right_on=("vid2",)).to_pandas()
        label_of = dict(zip(qdf.vec_id.astype(np.int64),
                            qdf.label.astype(np.int64)))
    cand = cand[cand.query_id != cand.vec_id]
    cand["key"] = cand.cos_sim.round(6)
    cand = (cand.sort_values(["query_id", "key", "vec_id"],
                             ascending=[True, False, True])
            .groupby("query_id").head(k))
    votes = (cand.groupby(["query_id", "nl"], as_index=False)
             .size().rename(columns={"size": "v"}))
    votes = (votes.sort_values(["query_id", "v", "nl"],
                               ascending=[True, False, True])
             .groupby("query_id").head(1))
    votes["true_label"] = votes.query_id.map(label_of).astype(np.int64)
    votes["ok"] = (votes.nl == votes.true_label).astype(np.int64)
    out = (votes.groupby("true_label", as_index=False)
           .agg(n_eval=("ok", "size"), n_correct=("ok", "sum")))
    out["n_eval"] = out.n_eval.astype(np.int64)
    out["n_correct"] = out.n_correct.astype(np.int64)
    out["accuracy_r6"] = (out.n_correct / out.n_eval).round(6)
    return out.sort_values("true_label").reset_index(drop=True)


def customer_value_migration(sf_dir: str):
    """CUSTOMER VALUE MIGRATION matrix — the period-over-period
    quartile transition every retention team tracks: spend per
    customer in the first vs second half of the order-date span
    (same mid = (min+max)//2 convention as `value_drift_by_half`),
    each half bucketed 0 (no spend) or 1-4 by exact value-threshold
    quartiles over that half's SPENDERS, then the ≤5×5 census.
    Plan: one cheap min/max date pre-pass, per-block (custkey, s0,
    s1) partials → tiered combine (native Sum groupby above
    `CUST_BROADCAST_MAX_ROWS`) → two count-table quartile walks →
    map-side bucketing → output-scale rollup.  Integer-exact."""
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def ts_minmax(b: pa.Table) -> pa.Table:
        us = (b["o_orderdate"].cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy(zero_copy_only=False))
        if not len(us):  # empty block
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(us.min())], pa.int64()),
                         "hi": pa.array([int(us.max())], pa.int64())})

    mm = _parts_pandas(
        orders.map_batches(ts_minmax, batch_format="pyarrow"),
        {"lo": np.int64, "hi": np.int64})
    if not len(mm):  # empty input -> empty matrix, not a crash
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ["q_first", "q_second",
                                       "n_customers"]})
    mid = (int(mm.lo.min()) + int(mm.hi.max())) // 2

    def partial(b: pa.Table) -> pa.Table:
        us = (b["o_orderdate"].cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy(zero_copy_only=False))
        cents = _cents_away(
            b["o_totalprice"].to_numpy(zero_copy_only=False))
        h1 = us >= mid
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False),
            "s0": np.where(h1, 0, cents),
            "s1": np.where(h1, cents, 0)})
        agg = df.groupby("ck", as_index=False)[["s0", "s1"]].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = orders.map_batches(partial, batch_format="pyarrow")
    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= CUST_BROADCAST_MAX_ROWS:
        cust = (_parts_pandas(parts_ds, {"ck": np.int64,
                                         "s0": np.int64,
                                         "s1": np.int64})
                .groupby("ck", as_index=False)[["s0", "s1"]].sum())
    else:
        cust = (parts_ds.groupby("ck")
                .aggregate(Sum("s0", alias_name="s0"),
                           Sum("s1", alias_name="s1")).to_pandas())

    def bucket(v: np.ndarray) -> np.ndarray:
        pos = np.sort(v[v > 0])
        if not len(pos):
            return np.zeros(len(v), np.int64)
        cum = np.arange(1, len(pos) + 1)
        t = np.array([pos[np.argmax(4 * cum >= j * len(pos))]
                      for j in (1, 2, 3)], np.int64)
        q = 1 + (v > t[0]).astype(np.int64) + (v > t[1]) + (v > t[2])
        return np.where(v == 0, 0, q)

    s0 = cust.s0.to_numpy(np.int64)
    s1 = cust.s1.to_numpy(np.int64)
    out = (pd.DataFrame({"q_first": bucket(s0), "q_second": bucket(s1)})
           .groupby(["q_first", "q_second"], as_index=False)
           .size().rename(columns={"size": "n_customers"}))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["q_first", "q_second"])
            .reset_index(drop=True))


def dup_cluster_representatives(sf_dir: str):
    """CANONICAL DOCUMENT per near-dup cluster — the keep-decision a
    dedup pipeline makes after clustering (C4/CCNet keep-the-longest
    heuristic): for every `dup_clusters` component, the member with
    max ``n_chars`` (tie → min doc_id) becomes the representative.
    The cluster table is DUPLICATE-scale, so the pick is a small
    merge; ``n_chars`` attaches by broadcasting the (sorted) dup-doc
    ids and filtering the pruned 2-column documents read map-side —
    no corpus-scale shuffle, no text moves."""
    import ray

    clusters = dup_clusters(sf_dir)
    ids = np.sort(clusters.doc_id.to_numpy(np.int64))
    ids_ref = ray.put(ids)
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def pick_members(b: pa.Table) -> pa.Table:
        kk = ray.get(ids_ref)
        v = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kk, v)
        pos[pos >= len(kk)] = 0
        hit = (kk[pos] == v) if len(kk) else np.zeros(len(v), bool)
        return b.filter(pa.array(hit))

    nc = docs.map_batches(pick_members,
                          batch_format="pyarrow").to_pandas()
    m = clusters.merge(nc, on="doc_id")
    m = m.sort_values(["cluster_id", "n_chars", "doc_id"],
                      ascending=[True, False, True])
    rep = m.groupby("cluster_id", as_index=False).head(1)
    out = rep.rename(columns={"doc_id": "rep_doc",
                              "n_chars": "rep_n_chars"})[
        ["cluster_id", "cluster_size", "rep_doc", "rep_n_chars"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("cluster_id").reset_index(drop=True)


def sample_budget_allocation(sf_dir: str, budget: int = 997):
    """LARGEST-REMAINDER APPORTIONMENT of a fixed sample budget across
    sources — the exact integer allocation a proportional sampler
    needs before drawing (Hamilton method: floor quotas, then the
    leftover slots go to the largest remainders, ties → source asc).
    Pure integer arithmetic (quota = B·n // N, remainder = B·n % N) so
    no float can perturb a seat.  Map-only (source, n) partials →
    tiered combine → the allocation walk on the output-scale
    (≤ |sources|) table."""
    ds = _read(sf_dir, "documents", columns=["source"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": b["source"].to_pandas().to_numpy(dtype=object)})
        agg = df.groupby("source", as_index=False).agg(
            n_docs=("source", "size"))
        agg["n_docs"] = agg.n_docs.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        c = (_parts_pandas(parts_ds, {"source": object,
                                      "n_docs": np.int64})
             .groupby("source", as_index=False).n_docs.sum())
    else:
        c = (parts_ds.groupby("source")
             .aggregate(Sum("n_docs", alias_name="n_docs")).to_pandas())
    c = c.sort_values("source").reset_index(drop=True)
    n = c.n_docs.to_numpy(np.int64)
    N = int(n.sum())
    if N == 0:  # empty input -> empty allocation, not a crash
        for col in ["alloc", "floor_quota", "remainder"]:
            c[col] = pd.Series([], dtype=np.int64)
        return c
    B = np.int64(budget)
    quota = (B * n) // N
    rem = (B * n) % N
    leftover = int(budget - quota.sum())
    order = np.lexsort((np.arange(len(c)), -rem))
    extra = np.zeros(len(c), np.int64)
    extra[order[:leftover]] = 1
    c["n_docs"] = c.n_docs.astype(np.int64)
    c["alloc"] = (quota + extra).astype(np.int64)
    c["floor_quota"] = quota.astype(np.int64)
    c["remainder"] = rem.astype(np.int64)
    return c


def nation_whale_share(sf_dir: str):
    """WHALE DEPENDENCE per nation: the share of a nation's order
    revenue contributed by its single largest customer (max-of-sums —
    the concentration-risk flag HHI's sum-of-squares smooths away).
    Exact cents: per-block (custkey, cents) partials → tiered
    customer rollup (native Sum groupby above
    `CUST_BROADCAST_MAX_ROWS`) → nation attach on the customer-scale
    table (broadcast sorted arrays below `ANTI_BROADCAST_MAX_ROWS`
    customers, hash join above) → per-nation (Σ, max, argmax-with-
    min-id) fold; one final 6-dp division."""
    import ray

    from biobloom_ray.io import hash_join

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nation.n_nationkey.to_numpy(np.int64),
                     nation.n_name.to_numpy(dtype=object)))

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ck": b["o_custkey"].to_numpy(zero_copy_only=False),
            "cents": _cents_away(
                b["o_totalprice"].to_numpy(zero_copy_only=False))})
        agg = df.groupby("ck", as_index=False).cents.sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = orders.map_batches(partial, batch_format="pyarrow")
    n_ord = _cheap_count(orders)
    if n_ord is not None and n_ord <= CUST_BROADCAST_MAX_ROWS:
        per_cust = (_parts_pandas(parts_ds, {"ck": np.int64,
                                             "cents": np.int64})
                    .groupby("ck", as_index=False).cents.sum())
        per_cust_ds = None
    else:
        per_cust_ds = (parts_ds.groupby("ck")
                       .aggregate(Sum("cents", alias_name="cents")))
        per_cust = None

    n_cust = _cheap_count(cust)
    if per_cust is not None and n_cust is not None \
            and n_cust <= ANTI_BROADCAST_MAX_ROWS:
        cp = cust.to_pandas()
        co = np.argsort(cp.c_custkey.to_numpy(np.int64))
        keys = cp.c_custkey.to_numpy(np.int64)[co]
        nats = cp.c_nationkey.to_numpy(np.int64)[co]
        pos = np.searchsorted(keys, per_cust.ck.to_numpy(np.int64))
        per_cust["nat"] = nats[pos]
        joined = per_cust
    else:
        if per_cust_ds is None:
            per_cust_ds = ray.data.from_pandas(per_cust)

        def cproj(b: pa.Table) -> pa.Table:
            return pa.table({
                "ck2": b["c_custkey"].cast(pa.int64()),
                "nat": b["c_nationkey"].cast(pa.int64())})

        joined = _parts_pandas(
            hash_join(per_cust_ds,
                      cust.map_batches(cproj, batch_format="pyarrow"),
                      on=("ck",), right_on=("ck2",)),
            {"ck": np.int64, "cents": np.int64, "nat": np.int64})
    # per-nation fold on the customer-scale table: total, max, and the
    # smallest custkey attaining the max
    j = joined.sort_values(["nat", "cents", "ck"],
                           ascending=[True, False, True])
    top = j.groupby("nat", as_index=False).head(1) \
        .rename(columns={"ck": "top_custkey", "cents": "top_cents"})
    tot = (joined.groupby("nat", as_index=False)
           .agg(total_cents=("cents", "sum"),
                n_customers=("cents", "size")))
    out = tot.merge(top[["nat", "top_custkey", "top_cents"]], on="nat")
    out["n_name"] = out.nat.map(names)
    out["whale_share_r6"] = (out.top_cents / out.total_cents).round(6)
    out = out[["n_name", "n_customers", "total_cents", "top_custkey",
               "top_cents", "whale_share_r6"]]
    for c in ["n_customers", "total_cents", "top_custkey", "top_cents"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def session_bounce_rate(sf_dir: str, gap_minutes: int = 30):
    """BOUNCE RATE by session ENTRY type: sessions split at >30-min
    gaps (same rule as `events_sessionize`, ties ordered by
    (ts, event_id)); a session's entry type is its first event's
    type; bounce = single-event session.  Per entry type: sessions,
    bounces, total events, 6-dp bounce rate.  Below the gate: one
    driver sort + vectorized segment walk.  Above: per-user
    ``map_groups`` emits an (entry_type, n_sessions, n_bounce,
    n_events) partial — ≤ |types| rows per user — and the final
    rollup is output-scale."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def fold(uid, ts_ns, et):
        """(user-major, time-ordered arrays) → per-entry-type partial
        counts.  Vectorized: session starts where user changes or the
        in-user gap exceeds gap_ns; session ids by cumsum; bounce =
        sessions of length 1."""
        if not len(ts_ns):
            return pd.DataFrame({"entry_type": [], "n_sessions": [],
                                 "n_bounce": [], "n_events": []})
        new_s = np.ones(len(ts_ns), bool)
        same = uid[1:] == uid[:-1]
        new_s[1:] = ~same | (ts_ns[1:] - ts_ns[:-1] > gap_ns)
        sid = np.cumsum(new_s) - 1
        starts = np.nonzero(new_s)[0]
        ln = np.diff(np.r_[starts, len(ts_ns)])
        df = pd.DataFrame({"entry_type": et[starts], "ln": ln})
        agg = (df.groupby("entry_type", as_index=False)
               .agg(n_sessions=("ln", "size"),
                    n_bounce=("ln", lambda s: int((s == 1).sum())),
                    n_events=("ln", "sum")))
        return agg

    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        df = ds.to_pandas()
        if not len(df):  # empty to_pandas loses the schema
            agg = pd.DataFrame({
                "entry_type": pd.Series([], dtype=object),
                "n_sessions": pd.Series([], dtype=np.int64),
                "n_bounce": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64)})
        else:
            df["ts_ns"] = df.ts.astype("datetime64[ns]").astype(
                np.int64)
            df = df.sort_values(["user_id", "ts_ns", "event_id"])
            agg = fold(df.user_id.to_numpy(), df.ts_ns.to_numpy(),
                       df.event_type.to_numpy(dtype=object))
    else:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"])
            ts_ns = g.ts.astype("datetime64[ns]").astype(
                np.int64).to_numpy()
            return fold(g.user_id.to_numpy(), ts_ns,
                        g.event_type.to_numpy(dtype=object))

        parts = (ds.groupby("user_id")
                 .map_groups(per_user, batch_format="pandas"))
        agg = (_parts_pandas(parts, {"entry_type": object,
                                     "n_sessions": np.int64,
                                     "n_bounce": np.int64,
                                     "n_events": np.int64})
               .groupby("entry_type", as_index=False)
               [["n_sessions", "n_bounce", "n_events"]].sum())
    agg["bounce_rate_r6"] = (agg.n_bounce / agg.n_sessions).round(6)
    for c in ["n_sessions", "n_bounce", "n_events"]:
        agg[c] = agg[c].astype(np.int64)
    return (agg.rename(columns={"entry_type": "entry_type"})
            .sort_values("entry_type").reset_index(drop=True))


def embedding_quantization_report(sf_dir: str):
    """INT8 SCALAR-QUANTIZATION error report — the memory-planning op
    for ANN at scale (uint8 codes = 8× less object-store traffic than
    float64): pass 1 folds per-block per-dim min/max; pass 2
    quantizes q = round((x−lo)/(hi−lo)·255), dequantizes and folds
    per-block (Σ err², Σ|err| max, n) partials.  Two map-only passes,
    #blocks × O(dim) rows to the driver, nothing corpus-scale
    materializes.  No SQL twin can exist (list-typed column); the
    pytest twin recomputes in numpy to 1e-9."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def minmax(b: pa.Table) -> pa.Table:
        m = np.stack(b["embedding"].to_pandas().to_numpy())
        return pa.table({
            "lo": pa.array([m.min(axis=0).tobytes()], pa.large_binary()),
            "hi": pa.array([m.max(axis=0).tobytes()], pa.large_binary()),
            "n": pa.array([m.shape[0]], pa.int64()),
            "d": pa.array([m.shape[1]], pa.int64())})

    mm = _parts_pandas(ds.map_batches(minmax, batch_format="pyarrow"),
                       {"lo": object, "hi": object, "n": np.int64,
                        "d": np.int64})
    dim = int(mm.d.iloc[0])
    lo = np.min(np.stack([np.frombuffer(b, np.float32)
                          for b in mm.lo]), axis=0).astype(np.float64)
    hi = np.max(np.stack([np.frombuffer(b, np.float32)
                          for b in mm.hi]), axis=0).astype(np.float64)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    ref = ray.put((lo, scale))

    def qerr(b: pa.Table) -> pa.Table:
        l, s = ray.get(ref)
        m = np.stack(b["embedding"].to_pandas().to_numpy()) \
            .astype(np.float64)
        q = np.clip(np.round((m - l) / s), 0, 255)
        rec = q * s + l
        err = rec - m
        return pa.table({
            "sse": pa.array([float((err * err).sum())], pa.float64()),
            "mae_max": pa.array([float(np.abs(err).max())],
                                pa.float64()),
            "n": pa.array([m.shape[0]], pa.int64())})

    p = _parts_pandas(ds.map_batches(qerr, batch_format="pyarrow"),
                      {"sse": np.float64, "mae_max": np.float64,
                       "n": np.int64})
    n = int(p.n.sum())
    out = pd.DataFrame({
        "n_vecs": np.asarray([n], np.int64),
        "dim": np.asarray([dim], np.int64),
        "rmse_r6": [round(float(np.sqrt(p.sse.sum() / (n * dim))), 6)],
        "max_abs_err_r6": [round(float(p.mae_max.max()), 6)],
        "bytes_saved_ratio_r6": [round(1.0 - 1.0 / 4.0, 6)]})
    return out


def quality_gate_sweep(sf_dir: str, thresholds=(50, 60, 70, 80, 90)):
    """GATE-TUNING SWEEP — the table a curation team reads before
    picking a quality threshold: for each alpha-ratio gate
    (keep iff 100·n_alpha ≥ thr·n_chars — exact integer
    cross-multiplication, no float boundary) and each language, docs
    kept / total / 6-dp keep rate.  Map-only per-block
    (lang, thr, kept) partials broadcast over the threshold grid;
    tiered combine; output-scale |langs|×|thresholds| table."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    thr = np.asarray(thresholds, np.int64)

    def partial(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas()
        n_chars = s.str.len().fillna(0).astype(np.int64).to_numpy()
        n_alpha = (s.str.count(r"[A-Za-z]").fillna(0)
                   .astype(np.int64).to_numpy())
        lg = b["lang"].to_pandas().to_numpy(dtype=object)
        kept = (100 * n_alpha[:, None] >= thr[None, :] * n_chars[:, None])
        df = pd.DataFrame({
            "lang": np.repeat(lg, len(thr)),
            "thr": np.tile(thr, len(lg)),
            "kept": kept.astype(np.int64).ravel(),
            "one": np.ones(len(lg) * len(thr), np.int64)})
        agg = (df.groupby(["lang", "thr"], as_index=False)
               [["one", "kept"]].sum()
               .rename(columns={"one": "n_docs", "kept": "n_kept"}))
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        out = (_parts_pandas(parts_ds, {"lang": object,
                                        "thr": np.int64,
                                        "n_docs": np.int64,
                                        "n_kept": np.int64})
               .groupby(["lang", "thr"], as_index=False)
               [["n_docs", "n_kept"]].sum())
    else:
        out = (parts_ds.groupby(["lang", "thr"])
               .aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("n_kept", alias_name="n_kept"))
               .to_pandas())
    out["keep_rate_r6"] = (out.n_kept / out.n_docs).round(6)
    for c in ["thr", "n_docs", "n_kept"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["lang", "thr"]).reset_index(drop=True)


def neardup_calibration_report(sf_dir: str, threshold: float = 0.5,
                               max_hamming: int = 3):
    """SKETCH-vs-EXACT calibration for the near-dup detectors — the
    table that justifies replacing exact all-pairs Jaccard with
    SimHash at scale: candidate pairs from the SimHash banding path
    vs ground-truth pairs from the exact n-gram-Jaccard path
    (threshold 0.5), intersected on normalized (lo, hi) keys →
    precision / recall counts.  Both sides are existing distributed
    pipelines; the pair tables are duplicate-scale so the set math is
    a driver fold.  No SQL twin for the SimHash side (sketch); the
    ground-truth side is already independently SQL-oracled
    (`ngram_jaccard_pairs`)."""
    from biobloom_ray.stages.dedup import (ngram_jaccard_pairs,
                                           simhash_neardup_pairs)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = simhash_neardup_pairs(docs, max_hamming=max_hamming)
    truth = ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=threshold)
    if not isinstance(cand, pd.DataFrame):
        cand = cand.to_pandas()
    if not isinstance(truth, pd.DataFrame):
        truth = truth.to_pandas()

    def keyset(df: pd.DataFrame) -> set:
        a = df["id_a"].to_numpy(np.int64)
        b = df["id_b"].to_numpy(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return set(zip(lo.tolist(), hi.tolist()))

    c, t = keyset(cand), keyset(truth)
    hit = len(c & t)
    out = pd.DataFrame({
        "n_candidates": np.asarray([len(c)], np.int64),
        "n_true_pairs": np.asarray([len(t)], np.int64),
        "n_hit": np.asarray([hit], np.int64),
        "precision_r6": [round(hit / len(c), 6) if c else 1.0],
        "recall_r6": [round(hit / len(t), 6) if t else 1.0]})
    return out


def hll_error_sweep(sf_dir: str, precisions=(8, 10, 12, 14)):
    """HLL PUBLISHED-ERROR-BOUND verification as a first-class query
    (BASELINE: sketches "verified against the algorithms' published
    error bounds"): ONE token-hash scan folds FOUR HLL precisions per
    block (register-max merge is associative at every p), the exact
    distinct count comes from the same scan's per-block token-hash
    dedup + one native distinct rollup, and the report shows
    est / exact / relative error / the 1.04/√m bound per precision.
    The pytest twin asserts |rel_err| ≤ 3× bound for every p."""
    from biobloom_ray.sketches.hll import HLL
    from biobloom_ray.stages.textstats import _token_arrays
    from biobloom_ray.hashing import hash_strings

    ds = _read(sf_dir, "documents", columns=["text"])
    ps = tuple(precisions)

    def partial(b: pa.Table) -> pa.Table:
        flat, _, _ = _token_arrays(b)
        # 64-bit token hashes: vectorized splitmix64-finalized
        # polynomial hash per distinct token (same kernel as the
        # production token-hash path; no per-item Python hashing)
        uniq = pd.unique(pd.Index(flat, dtype=object))
        h = hash_strings(uniq)
        blobs = []
        for p in ps:
            sk = HLL(p=p)
            sk.update(h)
            blobs.append(sk.serialize())
        return pa.table({
            "p": pa.array(list(ps), pa.int64()),
            "blob": pa.array(blobs, pa.large_binary())})

    parts = _parts_pandas(
        ds.map_batches(partial, batch_format="pyarrow"),
        {"p": np.int64, "blob": object})
    rows = []
    for p, g in parts.groupby("p"):
        acc = HLL.deserialize(g.blob.iloc[0])
        for blob in g.blob.iloc[1:]:
            acc.merge(HLL.deserialize(blob))
        rows.append((int(p), float(acc.estimate())))

    # exact twin: per-block distinct token rollup -> ONE native
    # distinct count on the narrow hash column
    def tok_hash(b: pa.Table) -> pa.Table:
        flat, _, _ = _token_arrays(b)
        uniq = pd.unique(pd.Index(flat, dtype=object))
        h = hash_strings(uniq)
        return pa.table({"h": pa.array(h.view(np.int64))})

    exact = (ds.map_batches(tok_hash, batch_format="pyarrow")
             .groupby("h").count().count())
    out = pd.DataFrame(rows, columns=["p", "estimate"])
    out["exact"] = np.int64(exact)
    out["rel_err_r6"] = ((out.estimate - exact) / exact).round(6)
    out["bound_r6"] = np.round(1.04 / np.sqrt(2.0 ** out.p), 6)
    out["estimate"] = out.estimate.round(6)
    out["p"] = out.p.astype(np.int64)
    return out.sort_values("p").reset_index(drop=True)


def cms_error_sweep(sf_dir: str, widths=(256, 1024, 4096), depth: int = 5):
    """CMS PUBLISHED-BOUND verification as a query (Cormode &
    Muthukrishnan: overcount ≤ ε·N with ε = e/width, w.p. 1−δ):
    ONE token scan folds a CMS per width (same depth/seed), the exact
    counts of the TRUE top tokens come from the count-table rollup,
    and the report shows per width the max/mean overcount on those
    tokens against ε·N.  CMS can only overcount, so underestimates
    flag a real defect.  The pytest twin asserts est ≥ exact for
    every probe token and max overcount ≤ ε·N."""
    from biobloom_ray.hashing import hash_strings
    from biobloom_ray.sketches.cms import CountMinSketch
    from biobloom_ray.stages.textstats import _token_arrays

    ds = _read(sf_dir, "documents", columns=["text"])
    ws = tuple(widths)

    def partial(b: pa.Table) -> pa.Table:
        flat, _, _ = _token_arrays(b)
        codes, uniq = pd.factorize(pd.Index(flat, dtype=object))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        h = hash_strings(uniq.to_numpy(dtype=object))
        blobs = []
        for w in ws:
            sk = CountMinSketch(depth=depth, width=w)
            sk.update(h, cnt)
            blobs.append(sk.serialize())
        return pa.table({"w": pa.array(list(ws), pa.int64()),
                         "blob": pa.array(blobs, pa.large_binary())})

    parts = _parts_pandas(
        ds.map_batches(partial, batch_format="pyarrow"),
        {"w": np.int64, "blob": object})

    # exact counts of every token (vocab-scale count table)
    def tok_cnt(b: pa.Table) -> pa.Table:
        flat, _, _ = _token_arrays(b)
        codes, uniq = pd.factorize(pd.Index(flat, dtype=object))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"token": pa.array(
            uniq.to_numpy(dtype=object).tolist(), pa.string()),
            "cnt": pa.array(cnt)})

    vocab = (_parts_pandas(
        ds.map_batches(tok_cnt, batch_format="pyarrow"),
        {"token": object, "cnt": np.int64})
        .groupby("token", as_index=False).cnt.sum())
    probes = hash_strings(vocab.token.to_numpy(dtype=object))
    exact = vocab.cnt.to_numpy(np.int64)
    N = int(exact.sum())
    rows = []
    for w, g in parts.groupby("w"):
        acc = CountMinSketch.deserialize(g.blob.iloc[0])
        for blob in g.blob.iloc[1:]:
            acc = acc.merge(CountMinSketch.deserialize(blob))
        est = acc.query(probes).astype(np.int64)
        over = est - exact
        rows.append((int(w), N, int(over.max()),
                     round(float(over.mean()), 6),
                     round(np.e / w * N, 6), int((over < 0).sum())))
    out = pd.DataFrame(rows, columns=["width", "n_tokens",
                                      "max_overcount",
                                      "mean_overcount_r6",
                                      "eps_n_bound_r6",
                                      "n_underestimates"])
    for c in ["width", "n_tokens", "max_overcount", "n_underestimates"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("width").reset_index(drop=True)


def quantile_sketch_calibration(sf_dir: str,
                                qs=(0.1, 0.5, 0.9, 0.99)):
    """KLL vs t-digest vs EXACT quantile calibration on page lengths —
    the rank-error report the north rule requires for the quantile
    sketches: per q, both sketch estimates, the exact value (count-
    table rank walk, PERCENTILE_DISC convention), and each estimate's
    RANK error (|rank(est) − q·n|/n — the metric KLL's guarantee is
    stated in).  One scan folds both sketches per block; the exact
    side is the (n_chars → count) table.  Pytest asserts rank error
    ≤ 3 % for KLL(k=200) and ≤ 5 % for t-digest at every q."""
    from biobloom_ray.sketches.kll import KLL
    from biobloom_ray.sketches.tdigest import TDigest

    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        kll = KLL(k=200)
        kll.update(v)
        td = TDigest()
        td.update(v)
        return pa.table({
            "kll": pa.array([kll.serialize()], pa.large_binary()),
            "td": pa.array([td.serialize()], pa.large_binary())})

    parts = _parts_pandas(ds.map_batches(partial,
                                         batch_format="pyarrow"),
                          {"kll": object, "td": object})
    kll = KLL.deserialize(parts.kll.iloc[0])
    td = TDigest.deserialize(parts.td.iloc[0])
    for i in range(1, len(parts)):
        kll = kll.merge(KLL.deserialize(parts.kll.iloc[i]))
        td = td.merge(TDigest.deserialize(parts.td.iloc[i]))

    def cpartial(b: pa.Table) -> pa.Table:
        v, c = np.unique(
            b["n_chars"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    ct = (_parts_pandas(ds.map_batches(cpartial, batch_format="pyarrow"),
                        {"v": np.int64, "c": np.int64})
          .groupby("v", as_index=False).c.sum().sort_values("v"))
    vals = ct.v.to_numpy(np.int64)
    cum = np.cumsum(ct.c.to_numpy(np.int64))
    n = int(cum[-1])

    def rank_of(x: float) -> int:
        """#values <= x (for rank error in the exact distribution)."""
        i = np.searchsorted(vals, x, side="right") - 1
        return int(cum[i]) if i >= 0 else 0

    rows = []
    for q in qs:
        target = -(-int(q * 1000) * n // 1000)  # ceil(q·n), q in 1/1000
        exact = int(vals[np.argmax(cum >= target)])
        e_kll = float(kll.quantile(q))
        e_td = float(td.quantile(q))
        rows.append((q, exact, round(e_kll, 6), round(e_td, 6),
                     round(abs(rank_of(e_kll) - q * n) / n, 6),
                     round(abs(rank_of(e_td) - q * n) / n, 6)))
    out = pd.DataFrame(rows, columns=["q", "exact", "kll_est_r6",
                                      "tdigest_est_r6",
                                      "kll_rank_err_r6",
                                      "tdigest_rank_err_r6"])
    out["exact"] = out.exact.astype(np.int64)
    return out


def user_tenure_distribution(sf_dir: str):
    """USER TENURE histogram: whole weeks between a user's first and
    last event (floor((last−first)/7d)), bucketed — the engagement-
    lifetime curve.  Exact integers: per-block (user, min, max)
    partials → tiered combine (native Min/Max groupby above
    `EVENTS_DRIVER_MAX_ROWS`) → user-scale tenure compute → an
    output-scale (weeks → n_users) histogram."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    WEEK_US = np.int64(7 * 86_400_000_000)

    def partial(b: pa.Table) -> pa.Table:
        us = (b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "u": b["user_id"].to_numpy(zero_copy_only=False),
            "lo": us, "hi": us})
        agg = (df.groupby("u", as_index=False)
               .agg(lo=("lo", "min"), hi=("hi", "max")))
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= EVENTS_DRIVER_MAX_ROWS:
        per_user = (_parts_pandas(parts_ds, {"u": np.int64,
                                             "lo": np.int64,
                                             "hi": np.int64})
                    .groupby("u", as_index=False)
                    .agg(lo=("lo", "min"), hi=("hi", "max")))
    else:
        per_user = (parts_ds.groupby("u")
                    .aggregate(Min("lo", alias_name="lo"),
                               Max("hi", alias_name="hi")).to_pandas())
    weeks = ((per_user.hi.to_numpy(np.int64)
              - per_user.lo.to_numpy(np.int64)) // WEEK_US)
    out = (pd.DataFrame({"tenure_weeks": weeks})
           .groupby("tenure_weeks", as_index=False)
           .size().rename(columns={"size": "n_users"}))
    out["tenure_weeks"] = out.tenure_weeks.astype(np.int64)
    out["n_users"] = out.n_users.astype(np.int64)
    return out.sort_values("tenure_weeks").reset_index(drop=True)


def order_size_distribution(sf_dir: str):
    """ORDER SIZE counts-of-counts: how many orders have exactly k
    lineitems, plus the integer overdispersion witness (n·Σk² vs
    (Σk)² — variance/mean > 1 ⇔ n·Σk² − (Σk)² > Σk·(n−?)… reported as
    raw exact sums so the 6-dp index is one final division).  Shape:
    per-block (orderkey, n) partials → tiered order rollup → the
    histogram is output-scale (k ≤ max items/order)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def partial(b: pa.Table) -> pa.Table:
        v, c = np.unique(b["l_orderkey"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"ok": pa.array(v.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    parts_ds = li.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        per_order = (_parts_pandas(parts_ds, {"ok": np.int64,
                                              "n": np.int64})
                     .groupby("ok", as_index=False).n.sum())
    else:
        per_order = (parts_ds.groupby("ok")
                     .aggregate(Sum("n", alias_name="n")).to_pandas())
    k = per_order.n.to_numpy(np.int64)
    out = (pd.DataFrame({"n_items": k})
           .groupby("n_items", as_index=False)
           .size().rename(columns={"size": "n_orders"}))
    n = len(k)
    if n == 0:  # empty input -> empty histogram, not a crash
        out["dispersion_r6"] = pd.Series([], dtype=np.float64)
        return out
    mean = k.sum() / n
    var = (k * k).sum() / n - mean * mean
    out["n_items"] = out.n_items.astype(np.int64)
    out["n_orders"] = out.n_orders.astype(np.int64)
    out["dispersion_r6"] = np.round(var / mean, 6)
    return out.sort_values("n_items").reset_index(drop=True)


def curation_run_summary(sf_dir: str):
    """The RESUMABLE CURATION RUNNER under the correctness oracle: the
    documents table splits into two deterministic doc_id-ordered
    fragments under /tmp, `run_partitioned_curation` executes its full
    per-partition DAG (alpha gate → within-partition first-wins dedup
    → cross-partition dedup vs the seen-key checkpoint → crash-atomic
    publish), and the published partitions roll up to per-lang kept
    counts.  Because fragments are doc_id-ordered, the runner's
    first-wins semantics equal the SQL twin's global
    min-doc_id-per-text rule — so the whole checkpointed runner, not
    just its kernels, is oracle-checked."""
    import hashlib
    import os
    import shutil
    import tempfile

    from biobloom_ray.pipelines.resumable import (
        run_partitioned_curation)

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(),
                        f"biobloom_curation_{tag}")
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)
    h = len(docs) // 2
    docs.iloc[:h].to_parquet(os.path.join(in_dir, "frag_00.parquet"))
    docs.iloc[h:].to_parquet(os.path.join(in_dir, "frag_01.parquet"))
    # 82% splits the fixture's alpha-ratio distribution (median ~82.2)
    # so the gate is exercised, not a pass-through
    run_partitioned_curation(in_dir, out_dir, min_alpha_pct=82)

    kept = _rp(out_dir + "/part=0").union(_rp(out_dir + "/part=1"))

    def lang_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas().to_numpy(dtype=object)})
        agg = df.groupby("lang", as_index=False).agg(
            n_kept=("lang", "size"))
        agg["n_kept"] = agg.n_kept.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (_parts_pandas(kept.map_batches(lang_partial,
                                          batch_format="pyarrow"),
                         {"lang": object, "n_kept": np.int64})
           .groupby("lang", as_index=False).n_kept.sum())
    shutil.rmtree(base, ignore_errors=True)
    out["n_kept"] = out.n_kept.astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def curation_partition_metrics(sf_dir: str):
    """The runner's PER-PARTITION LINEAGE METRICS under the oracle —
    the north-rule artifact ("every partition emits lineage +
    metrics") checked end-to-end: the same deterministic two-fragment
    demo as :func:`curation_run_summary` runs, then the table comes
    FROM THE PUBLISHED ``_lineage.json`` MANIFESTS (via
    :func:`biobloom_ray.pipelines.resumable.curation_partition_report`),
    not from recomputation — so a hash match proves the manifests
    record the true per-stage attrition (rows in → 82%-alpha gate →
    within-partition first-wins dedup → published rows after
    cross-partition drops).  The SQL twin replays the doc_id-ordered
    halves split and the runner's non-recursive drop rule.

    Output: ``part_id, rows_in, gate_kept, exact_kept, rows_out``
    (one row per partition, sorted)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from biobloom_ray.pipelines.resumable import (
        curation_partition_report, run_partitioned_curation)

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(),
                        f"biobloom_curation_pm_{tag}")
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)
    h = len(docs) // 2
    docs.iloc[:h].to_parquet(os.path.join(in_dir, "frag_00.parquet"))
    docs.iloc[h:].to_parquet(os.path.join(in_dir, "frag_01.parquet"))
    run_partitioned_curation(in_dir, out_dir, min_alpha_pct=82)
    rep = curation_partition_report(out_dir)
    shutil.rmtree(base, ignore_errors=True)
    rep = rep[["part_id", "rows_in", "gate_kept", "exact_kept",
               "rows_out"]]
    for c in rep.columns:
        rep[c] = rep[c].astype(np.int64)
    return rep.sort_values("part_id").reset_index(drop=True)


def kmeans_quality_report(sf_dir: str, k: int = 8, iters: int = 6):
    """CLUSTER-QUALITY (silhouette-lite) report for the distributed
    spherical k-means: per cluster — size, mean cosine to the OWN
    centroid (cohesion), mean cosine to the nearest OTHER centroid
    (separation), and their gap (positive = separated clusters).  One
    extra map-only pass over the corpus with the k·dim centroid matrix
    broadcast; per-block partials are ×2^40 FIXED-POINT int64 sums per
    cluster (integer addition is associative, so the report is
    bit-identical under any partitioning — same contract as the
    k-means itself).  No SQL twin (list column + pipeline-owned
    centroids); the pytest twin recomputes in numpy."""
    import ray

    from biobloom_ray.stages.ann import (_matrix, _normalize_rows,
                                         embedding_kmeans)

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _assigns, cent = embedding_kmeans(emb, k=k, iters=iters)
    cent_ref = ray.put(cent)
    FP = np.int64(1) << np.int64(40)

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize_rows(_matrix(b["embedding"]))
        sims = m @ c.T                      # (n, k)
        own = np.argmax(sims, axis=1)
        own_sim = sims[np.arange(len(m)), own]
        sims[np.arange(len(m)), own] = -np.inf
        other_sim = sims.max(axis=1)
        q_own = np.round(own_sim * float(FP)).astype(np.int64)
        q_oth = np.round(other_sim * float(FP)).astype(np.int64)
        n = np.bincount(own, minlength=len(c))
        s_own = np.zeros(len(c), np.int64)
        s_oth = np.zeros(len(c), np.int64)
        np.add.at(s_own, own, q_own)
        np.add.at(s_oth, own, q_oth)
        nz = np.nonzero(n)[0]
        return pa.table({
            "cluster": pa.array(nz.astype(np.int64)),
            "n": pa.array(n[nz].astype(np.int64)),
            "s_own": pa.array(s_own[nz]),
            "s_oth": pa.array(s_oth[nz])})

    p = (_parts_pandas(emb.map_batches(partial,
                                       batch_format="pyarrow"),
                       {"cluster": np.int64, "n": np.int64,
                        "s_own": np.int64, "s_oth": np.int64})
         .groupby("cluster", as_index=False)
         [["n", "s_own", "s_oth"]].sum())
    fp = float(FP)
    p["cohesion_r6"] = (p.s_own / fp / p.n).round(6)
    p["separation_r6"] = (p.s_oth / fp / p.n).round(6)
    p["silhouette_r6"] = ((p.s_own - p.s_oth) / fp / p.n).round(6)
    out = p[["cluster", "n", "cohesion_r6", "separation_r6",
             "silhouette_r6"]].copy()
    for c in ["cluster", "n"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("cluster").reset_index(drop=True)


def label_centroid_affinity(sf_dir: str):
    """LABEL-CENTROID AFFINITY matrix — pairwise cosine between the
    per-label mean embeddings (the class-confusability diagnostic; low
    affinity = separable classes).  The corpus reduces map-side to
    (label, dim, Σv, n) partials (|labels|·dim rows per block via one
    ``np.add.at``) — driver combine below `RANK_DRIVER_MAX_ROWS`
    input rows, native Sum groupby above — and the pairwise math runs
    on the |labels|×dim centroid matrix.  Float outputs follow the
    6-dp contract with mirrored op order (mean = Σ/n, dot over dims,
    norm = √Σm²)."""
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.stack(b["embedding"].to_pandas().to_numpy()) \
            .astype(np.float64)
        codes, uniq = pd.factorize(lab)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, codes, m)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        dim = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim)),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(n, dim))})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(ds)
    if n_rows is not None and n_rows <= RANK_DRIVER_MAX_ROWS:
        c = (_parts_pandas(parts_ds, {"label": np.int64,
                                      "dim": np.int64,
                                      "s": np.float64, "n": np.int64})
             .groupby(["label", "dim"], as_index=False)
             [["s", "n"]].sum())
    else:
        c = (parts_ds.groupby(["label", "dim"])
             .aggregate(Sum("s", alias_name="s"),
                        Sum("n", alias_name="n")).to_pandas())
    c = c.sort_values(["label", "dim"])
    labels = np.sort(c.label.unique())
    dim = int(c.dim.max()) + 1
    M = (c.s.to_numpy(np.float64) / c.n.to_numpy(np.int64)) \
        .reshape(len(labels), dim)
    nrm = np.sqrt((M * M).sum(axis=1))
    rows = []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            dot = float((M[i] * M[j]).sum())
            rows.append((int(labels[i]), int(labels[j]),
                         round(dot / (nrm[i] * nrm[j]), 6)))
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "cos_r6"])
    out["label_a"] = out.label_a.astype(np.int64)
    out["label_b"] = out.label_b.astype(np.int64)
    return out.sort_values(["label_a", "label_b"]) \
        .reset_index(drop=True)


def supplier_rank_correlation(sf_dir: str):
    """SPEARMAN rank correlation between supplier account balance and
    supplier revenue (does the ledger agree with the business?) —
    EXACT integer internals: both metrics rank with AVERAGE ranks for
    ties carried as 2·rank integers (2·avg = 2·RANK + #ties − 1), the
    statistic folds as S = Σ(2rᵃ − 2rᵇ)², and
    ρ = 1 − 3S / (2n(n²−1)) is one final 6-dp division (the
    average-rank d² form; mirrored verbatim in the oracle).  Shape:
    tiered per-supplier revenue rollup (native Sum groupby above
    `LINEITEM_DRIVER_MAX_ROWS`), balance attach on the supplier-scale
    table, rank walks on that table (suppliers ≪ facts; the at-scale
    caveat matches the other entity-scale walks)."""
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_acctbal"]).to_pandas()

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents_away(
            b["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc = _cents_away(
            b["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            "rev": cents * (100 - disc)})
        agg = df.groupby("sk", as_index=False).rev.sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts_ds = li.map_batches(partial, batch_format="pyarrow")
    n_rows = _cheap_count(li)
    if n_rows is not None and n_rows <= LINEITEM_DRIVER_MAX_ROWS:
        rev = (_parts_pandas(parts_ds, {"sk": np.int64,
                                        "rev": np.int64})
               .groupby("sk", as_index=False).rev.sum())
    else:
        rev = (parts_ds.groupby("sk")
               .aggregate(Sum("rev", alias_name="rev")).to_pandas())
    m = rev.merge(supp, left_on="sk", right_on="s_suppkey")
    bal = _cents_away(m.s_acctbal.to_numpy())

    def rank2(v: np.ndarray) -> np.ndarray:
        """2x average rank (exact integer): 2*RANK + ties - 1."""
        order = np.argsort(v, kind="stable")
        sv = v[order]
        uniq, start, cnt = np.unique(sv, return_index=True,
                                     return_counts=True)
        pos = np.searchsorted(uniq, v)
        return (2 * (start[pos] + 1) + cnt[pos] - 1).astype(np.int64)

    ra = rank2(m.rev.to_numpy(np.int64))
    rb = rank2(bal)
    n = len(m)
    S = int(((ra - rb) ** 2).sum())
    rho = 1.0 - 3.0 * S / (2.0 * n * (n * n - 1))
    out = pd.DataFrame({
        "n_suppliers": np.asarray([n], np.int64),
        "sum_d2_4x": np.asarray([S], np.int64),
        "spearman_r6": [round(rho, 6)]})
    return out


# -- TPC-H Q11 (important stock) over a KEY-DERIVED partsupp ------------------

#: supplier-side broadcast gate for Q11: below this many suppliers the
#: in-nation suppkey membership ships to every part task as one bool
#: array (n_supp bytes); above it the derived partsupp rows hash-join
#: the filtered supplier Dataset instead
Q11_SUPP_BROADCAST_MAX_ROWS = 2_000_000

#: Q11 partsupp fan-out: suppliers per part (TPC-H uses 4)
Q11_SUPP_PER_PART = 4


def _partsupp_terms(pk: np.ndarray, i: int, n_supp: int):
    """Deterministic partsupp derivation from keys — the fixture ships
    no partsupp file, so BOTH sides derive the identical table: part
    ``pk`` gets ``Q11_SUPP_PER_PART`` suppliers at stride
    ``n_supp // 4 + 1`` (TPC-H dbgen's rotation idea, ``dbgen/build.c``
    mk_part), with arithmetic availqty / supplycost-in-cents.  The SQL
    oracle's CTE mirrors this expression EXACTLY (see
    ``__ray_entry__.oracle_sql['q11_important_stock']``)."""
    step = n_supp // 4 + 1
    sk = (pk + i * step) % n_supp
    avail = (pk * 7 + i * 131 + sk) % 9999 + 1
    cost_c = (pk * 31 + sk * 17 + i) % 99900 + 100
    return sk, avail, cost_c


def q11_important_stock(sf_dir: str, nation: str = "NATION_7"):
    """TPC-H Q11 shape — grouped value with a GLOBAL scalar-subquery
    HAVING (``BioBloomCategorizer``'s summary-threshold census twin):
    per part, the total supplycost·availqty held by suppliers of one
    nation, keeping parts whose value exceeds the MEAN group value
    (``value·n_groups > total`` — exact integer cross-multiplication,
    no float fraction).  partsupp itself is derived arithmetically from
    (p_partkey, supplier count) — see ``_partsupp_terms``.

    Scale plan: the derivation is MAP-ONLY (all 4 supplier terms of a
    part live in its own input row, so the per-part German-value sum
    needs NO groupby).  Below ``Q11_SUPP_BROADCAST_MAX_ROWS`` suppliers
    the in-nation membership broadcasts as one bool array via
    ``ray.put``; above it the exploded (partkey, suppkey, v) rows
    hash-join the nation-filtered supplier table and reduce with a
    native Sum.  The global (total, n_groups) scalars come from one
    partial-fold pass; below ``PART_DRIVER_MAX_ROWS`` parts the final
    HAVING filter folds on the driver, above it it runs as a
    map_batches filter over the grouped Dataset with the two broadcast
    scalars (production would ``write_parquet`` that stream)."""
    import ray

    from biobloom_ray.io import hash_join

    part = _read(sf_dir, "part", columns=["p_partkey"])
    supp_ds = _read(sf_dir, "supplier",
                    columns=["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nk = set(nat[nat.n_name == nation].n_nationkey.astype(int).tolist())
    n_supp = _cheap_count(supp_ds)
    if n_supp is None:
        n_supp = int(supp_ds.count())

    n_parts = _cheap_count(part)
    if n_supp <= Q11_SUPP_BROADCAST_MAX_ROWS:
        sp = supp_ds.to_pandas()
        keep = np.zeros(n_supp, dtype=bool)
        keep[sp[sp.s_nationkey.isin(nk)].s_suppkey
             .to_numpy(np.int64)] = True
        keep_ref = ray.put(keep)

        def per_part(b: pa.Table) -> pa.Table:
            import ray as _r
            kp = _r.get(keep_ref)
            pk = b["p_partkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            acc = np.zeros(len(pk), dtype=np.int64)
            for i in range(Q11_SUPP_PER_PART):
                sk, avail, cost_c = _partsupp_terms(pk, i, n_supp)
                acc += np.where(kp[sk], cost_c * avail, 0)
            m = acc > 0
            return pa.table({
                "ps_partkey": pa.array(pk[m]),
                "value_cents": pa.array(acc[m])})

        grouped = part.map_batches(per_part, batch_format="pyarrow")
    else:
        def explode_ps(b: pa.Table) -> pa.Table:
            pk = b["p_partkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pks, sks, vs = [], [], []
            for i in range(Q11_SUPP_PER_PART):
                sk, avail, cost_c = _partsupp_terms(pk, i, n_supp)
                pks.append(pk)
                sks.append(sk)
                vs.append(cost_c * avail)
            return pa.table({
                "ps_partkey": pa.array(np.concatenate(pks)),
                "sk": pa.array(np.concatenate(sks)),
                "v": pa.array(np.concatenate(vs))})

        nk_arr = np.asarray(sorted(nk), dtype=np.int64)

        def in_nation(b: pa.Table) -> pa.Table:
            m = np.isin(b["s_nationkey"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), nk_arr)
            return pa.table({"s_suppkey":
                             b["s_suppkey"].filter(pa.array(m))
                             .cast(pa.int64())})

        german = supp_ds.map_batches(in_nation, batch_format="pyarrow")
        joined = hash_join(part.map_batches(explode_ps,
                                            batch_format="pyarrow"),
                           german, on=("sk",), right_on=("s_suppkey",))
        grouped = (joined.groupby("ps_partkey")
                   .aggregate(Sum("v", alias_name="value_cents")))

    if n_parts is not None and n_parts <= PART_DRIVER_MAX_ROWS:
        g = _parts_pandas(grouped, {"ps_partkey": np.int64,
                                    "value_cents": np.int64})
        tot = int(g.value_cents.sum())
        ng = len(g)
        out = g[g.value_cents * ng > tot]
    else:
        scal = _parts_pandas(
            grouped.map_batches(
                lambda b: pa.table({
                    "tot": pa.array([int(pc.sum(b["value_cents"])
                                         .as_py() or 0)], pa.int64()),
                    "ng": pa.array([b.num_rows], pa.int64())}),
                batch_format="pyarrow"),
            {"tot": np.int64, "ng": np.int64})
        tot, ng = int(scal.tot.sum()), int(scal.ng.sum())

        def having(b: pa.Table) -> pa.Table:
            v = b["value_cents"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(v * ng > tot))

        out = grouped.map_batches(having,
                                  batch_format="pyarrow").to_pandas()
        if len(out) == 0:  # empty to_pandas loses the schema
            out = pd.DataFrame(
                {"ps_partkey": pd.Series([], dtype=np.int64),
                 "value_cents": pd.Series([], dtype=np.int64)})
    out = out.copy()
    out["ps_partkey"] = out.ps_partkey.astype(np.int64)
    out["value_cents"] = out.value_cents.astype(np.int64)
    return (out.sort_values(["value_cents", "ps_partkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def curation_neardup_summary(sf_dir: str):
    """The resumable curation runner WITH the MinHash near-dup stage
    under the correctness oracle (VERDICT r4 #4): two doc_id-ordered
    fragments, ``run_partitioned_curation(neardup=True)`` executing its
    full per-partition DAG (alpha gate → exact first-wins dedup →
    cross-partition seen-key dedup → within+cross-partition MinHash
    near-dup vs the per-partition signature checkpoints → crash-atomic
    publish), rolled up to per-lang kept counts.

    Oracle equivalence: with doc_id-ordered fragments the runner's
    survivors equal the plain greedy min-neighbor rule over the gated
    corpus — drop a doc iff some smaller-id gated doc has the same
    text OR exact 5-shingle Jaccard ≥ 0.6 (at sf0.01 every true
    near-dup pair's est-Jaccard is far above the threshold, so the
    LSH pair set provably equals the exact-Jaccard pair set — the
    same argument the ``minhash_dedup_kept`` oracle rests on)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from biobloom_ray.pipelines.resumable import (
        run_partitioned_curation)

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(),
                        f"biobloom_curation_nd_{tag}")
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(in_dir, exist_ok=True)
    h = len(docs) // 2
    docs.iloc[:h].to_parquet(os.path.join(in_dir, "frag_00.parquet"))
    docs.iloc[h:].to_parquet(os.path.join(in_dir, "frag_01.parquet"))
    run_partitioned_curation(in_dir, out_dir, min_alpha_pct=82,
                             neardup=True, neardup_threshold=0.6)

    kept = _rp(out_dir + "/part=0").union(_rp(out_dir + "/part=1"))

    def lang_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas().to_numpy(dtype=object)})
        agg = df.groupby("lang", as_index=False).agg(
            n_kept=("lang", "size"))
        agg["n_kept"] = agg.n_kept.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (_parts_pandas(kept.map_batches(lang_partial,
                                          batch_format="pyarrow"),
                         {"lang": object, "n_kept": np.int64})
           .groupby("lang", as_index=False).n_kept.sum())
    shutil.rmtree(base, ignore_errors=True)
    out["n_kept"] = out.n_kept.astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)
