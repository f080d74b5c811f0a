"""Deduplication stages (graft additions for training-data pipelines).

Every variant is expressed Ray-Data-first:

- exact        — content-hash per batch → ``groupby(hash)`` keep-first
                 (the shuffle key is the 32-hex md5, never the text)
- minhash-LSH  — shingle → minhash signature → banded keys per batch →
                 ``groupby(band_key)`` emits candidate pairs → signature
                 (or exact n-gram) Jaccard verification — the standard
                 shingle→minhash→band→bucket pipeline
- simhash      — 64-bit fingerprints → band blocking → Hamming verify
- embedding    — see :mod:`biobloom_ray.stages.ann`

The reference's only dedup is the Bloom ``insertAndCheck`` first-wins
shingle dedup (``BloomFilterGenerator.h:171``, SURVEY.md §2.7 D1); the
exact variant here is its hash-partitioned exact counterpart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from biobloom_ray.hashing import shingle_hashes
from biobloom_ray.sketches.minhash import lsh_band_keys, minhash_signatures
from biobloom_ray.sketches.simhash import (
    hamming_distance,
    simhash_band_keys,
    simhash_fingerprints,
)
from biobloom_ray.textnorm import content_md5_batch


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column(
        "fp_md5", pa.array(content_md5_batch(batch[text_col]),
                           type=pa.large_string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """First-wins exact dedup: hash-partition on content hash, keep the
    row with the smallest id per group (deterministic winner)."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (hashed.groupby("fp_md5")
            .map_groups(keep_first, batch_format="pandas")
            .drop_columns(["fp_md5"]))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHashStage:
    """map_batches callable: per-row minhash signature + exploded
    (band_key, id, signature) rows.  Signatures travel with the band rows
    so verification happens inside the bucket group without a join."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 shingle_k: int = 5, num_perm: int = 128, num_bands: int = 16,
                 seed: int = 0x31337):
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _, nf = shingle_hashes(texts, self.shingle_k)
        sig = minhash_signatures(h1, nf, self.num_perm, self.seed)
        keys = lsh_band_keys(sig, self.num_bands)
        n = len(nf)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        # explode: one row per (row, band)
        rep_ids = np.repeat(ids, self.num_bands)
        band_key = keys.reshape(-1).astype(np.int64)  # view as int64 for arrow
        rep_sig = np.repeat(sig.astype(np.int64), self.num_bands, axis=0)
        flat = pa.array(rep_sig.reshape(-1), type=pa.int64())
        return pa.table({
            "band_key": pa.array(band_key),
            self.id_col: pa.array(rep_ids),
            "sig": pa.FixedSizeListArray.from_arrays(flat, self.num_perm),
        })


def _empty_pairs(value_col: str, dtype: str = "float64") -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64"),
                         value_col: pd.Series(dtype=dtype)})


def _ensure_pair_frame(df: pd.DataFrame, value_col: str,
                       dtype: str = "float64") -> pd.DataFrame:
    if df.empty or "id_a" not in df.columns:
        return _empty_pairs(value_col, dtype)
    return df.reset_index(drop=True)


def _pairs_from_bucket(g: pd.DataFrame, id_col: str, threshold: float,
                       max_bucket: int = 2000) -> pd.DataFrame:
    ids = g[id_col].to_numpy()
    if len(ids) < 2:
        return _empty_pairs("est_jaccard")
    if len(ids) > max_bucket:
        # giant bucket = degenerate key (e.g. all-empty docs); cap the
        # quadratic blowup and log via truncation (documented skew guard)
        g = g.iloc[:max_bucket]
        ids = ids[:max_bucket]
    sig = np.stack(g["sig"].to_numpy())
    order = np.argsort(ids, kind="stable")
    ids, sig = ids[order], sig[order]
    ii, jj = np.triu_indices(len(ids), k=1)
    est = (sig[ii] == sig[jj]).mean(axis=1)
    keep = est >= threshold
    return pd.DataFrame({"id_a": ids[ii[keep]], "id_b": ids[jj[keep]],
                         "est_jaccard": est[keep]})


def minhash_neardup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                          threshold: float = 0.7, shingle_k: int = 5,
                          num_perm: int = 128, num_bands: int = 16):
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle → minhash → band explode → groupby(band_key) bucket pairs →
    signature-Jaccard verify → global pair dedup (a pair found in several
    bands appears once, keeping the max estimate).
    """
    stage = MinHashStage(text_col, id_col, shingle_k, num_perm, num_bands)
    exploded = ds.map_batches(stage, batch_format="pyarrow")
    pairs = exploded.groupby("band_key").map_groups(
        lambda g: _pairs_from_bucket(g, id_col, threshold),
        batch_format="pandas")

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("est_jaccard", ascending=False).head(1)

    out = pairs.groupby(["id_a", "id_b"]).map_groups(
        dedup_pair, batch_format="pandas").to_pandas()
    return _ensure_pair_frame(out, "est_jaccard")


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.7, **kw):
    """Drop near-duplicates: greedy keep-lowest-id. Each doc appearing as
    ``id_b`` of a pair whose ``id_a`` is smaller is removed.  (Exact
    connected components would need iterated label propagation; greedy
    min-neighbor removal is the standard one-pass approximation and is
    deterministic.)"""
    pairs = minhash_neardup_pairs(ds, text_col, id_col, threshold, **kw)
    drop = set(pairs["id_b"].tolist())
    import ray
    drop_ref = ray.put(drop)

    def filter_batch(b: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, np.fromiter(d, dtype=ids.dtype, count=len(d))) \
            if len(d) else np.ones(len(ids), bool)
        return b.filter(pa.array(keep))

    return ds.map_batches(filter_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHashStage:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 shingle_k: int = 5, num_bands: int = 4):
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _, nf = shingle_hashes(texts, self.shingle_k)
        fp = simhash_fingerprints(h1, nf)
        keys = simhash_band_keys(fp, self.num_bands)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        rep_ids = np.repeat(ids, self.num_bands)
        return pa.table({
            "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
            self.id_col: pa.array(rep_ids),
            "fp": pa.array(np.repeat(fp.astype(np.int64), self.num_bands)),
        })


def simhash_neardup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                          max_hamming: int = 3, shingle_k: int = 5,
                          num_bands: int = 4):
    """Pairs within Hamming distance ≤ max_hamming of 64-bit SimHash.
    Blocking: identical band in any of ``num_bands`` bands (covers all
    pairs with < num_bands differing bits by pigeonhole)."""
    stage = SimHashStage(text_col, id_col, shingle_k, num_bands)
    exploded = ds.map_batches(stage, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return _empty_pairs("hamming", "int64")
        fp = g["fp"].to_numpy().astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, fp = ids[order], fp[order]
        ii, jj = np.triu_indices(len(ids), k=1)
        d = hamming_distance(fp[ii], fp[jj])
        keep = d <= max_hamming
        return pd.DataFrame({"id_a": ids[ii[keep]], "id_b": ids[jj[keep]],
                             "hamming": d[keep]})

    pairs = exploded.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pandas")
    out = pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas").to_pandas()
    return _ensure_pair_frame(out, "hamming", "int64")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, shingle_k: int = 5,
                        num_perm: int = 128, num_bands: int = 16,
                        candidate_threshold: float = 0.3):
    """MinHash-LSH candidates verified with EXACT n-gram Jaccard.

    The candidate ids come back to the driver (candidates are sparse —
    documented assumption), texts for just those ids are re-read via a
    pushdown filter, and exact shingle-set Jaccard decides."""
    import ray
    from biobloom_ray.sketches.minhash import exact_jaccard_from_hashes

    cand = minhash_neardup_pairs(ds, text_col, id_col,
                                 threshold=candidate_threshold,
                                 shingle_k=shingle_k, num_perm=num_perm,
                                 num_bands=num_bands)
    if len(cand) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    need = sorted(set(cand.id_a) | set(cand.id_b))
    need_np = np.array(need)

    def pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(ids, need_np)))

    texts = (ds.select_columns([id_col, text_col])
             .map_batches(pick, batch_format="pyarrow").to_pandas())
    hash_sets = {}
    h1, _, nf = shingle_hashes(texts[text_col].tolist(), shingle_k)
    offs = np.zeros(len(nf) + 1, dtype=np.int64)
    np.cumsum(nf, out=offs[1:])
    for i, did in enumerate(texts[id_col].tolist()):
        hash_sets[did] = h1[offs[i]:offs[i + 1]]
    rows = []
    for a, b_ in zip(cand.id_a, cand.id_b):
        j = exact_jaccard_from_hashes(hash_sets[a], hash_sets[b_])
        if j >= threshold:
            rows.append((a, b_, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
