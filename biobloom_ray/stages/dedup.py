"""Deduplication stages (graft additions for training-data pipelines).

Every variant is expressed Ray-Data-first:

- exact        — content-hash per batch → native ``groupby(hash).min(id)``
                 winners → hash semi-join back to the rows (the shuffle
                 key is the 32-hex md5, never the text)
- minhash-LSH  — shingle → minhash signature (materialized once, 1 KB/doc
                 ≈ 1-3 % of corpus bytes — the "signature checkpoint") →
                 NARROW banded rows (band_key, id; 16 B/row, no signature
                 payload) → native per-bucket count aggregate → candidate
                 pairs → distributed signature verify via two hash joins
- simhash      — 64-bit fingerprints → band blocking → Hamming verify,
                 same narrow-row + native-aggregate shape
- embedding    — see :mod:`biobloom_ray.stages.ann`

Scale notes (round-2 redesign, VERDICT.md "Next round" #1):

* Band rows carry ONLY (band_key, doc_id[, fp]) — the round-1 design
  replicated the full 128-perm signature into all 16 band rows
  (16 KB/doc of shuffle payload); now signatures move at most twice,
  via hash joins keyed on the candidate ids.
* The bucket-size aggregate makes the dominant case (bucket of exactly
  2 docs) fully native: ``groupby(band_key).agg(Count, Min(id),
  Max(id))`` yields the pair directly with zero per-group Python.
  Buckets with ≥3 docs are a sparse tail (duplicate *clusters*); their
  keys are broadcast and only those rows re-grouped for pair emission
  (bounded per bucket by ``max_bucket`` — degenerate keys, e.g.
  all-empty docs, truncate deterministically on sorted ids).
* At extreme scale (≥10¹¹ docs) run the banding per band-range so the
  per-bucket aggregate materializes 1/num_bands at a time; the
  signature checkpoint is what you would persist to parquet.

The reference's only dedup is the Bloom ``insertAndCheck`` first-wins
shingle dedup (``BloomFilterGenerator.h:171``, SURVEY.md §2.7 D1); the
exact variant here is its hash-partitioned exact counterpart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min

from biobloom_ray.hashing import shingle_hashes
from biobloom_ray.sketches.minhash import lsh_band_keys, minhash_signatures
from biobloom_ray.sketches.simhash import (
    hamming_distance,
    simhash_band_keys,
    simhash_fingerprints,
)
from biobloom_ray.textnorm import content_md5_batch

from biobloom_ray.io import hash_join as _join

DEFAULT_JOIN_PARTITIONS = None


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column(
        "fp_md5", pa.array(content_md5_batch(batch[text_col]),
                           type=pa.large_string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = DEFAULT_JOIN_PARTITIONS):
    """First-wins exact dedup: hash-partition on content hash, native
    ``Min(id)`` winner per group, then a hash semi-join brings back the
    winner rows.  No per-group Python, no text in the groupby shuffle."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow")
    winners = (hashed.select_columns(["fp_md5", id_col])
               .groupby("fp_md5")
               .aggregate(Min(id_col, alias_name=id_col))
               .select_columns([id_col]))
    return _join(ds, winners, on=(id_col,), num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHashSigStage:
    """map_batches callable: (doc_id, sig) — the signature as a
    ``num_perm × 8``-byte little-endian binary blob (join-friendly; Arrow
    acero joins reject list payloads)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 shingle_k: int = 5, num_perm: int = 128,
                 seed: int = 0x31337):
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.num_perm = num_perm
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _, nf = shingle_hashes(texts, self.shingle_k)
        sig = minhash_signatures(h1, nf, self.num_perm, self.seed)
        blobs = sig.astype("<u8").tobytes()
        w = self.num_perm * 8
        offs = np.arange(len(nf) + 1, dtype=np.int32) * w
        sig_arr = pa.BinaryArray.from_buffers(
            pa.binary(), len(nf),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blobs)])
        return pa.table({self.id_col: batch[self.id_col], "sig": sig_arr})


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """Binary signature column → (n, num_perm) uint64 matrix (zero-copy
    when the blobs are contiguous, which freshly-built arrays are)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    w = num_perm * 8
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1)
    if offs[0] == 0 and offs[-1] == n * w and len(bufs[2]) >= n * w:
        return np.frombuffer(bufs[2], dtype="<u8",
                             count=n * num_perm).reshape(n, num_perm)
    return np.stack([np.frombuffer(v.as_py(), dtype="<u8") for v in col]) \
        if n else np.empty((0, num_perm), dtype=np.uint64)


def _band_rows(batch: pa.Table, id_col: str, num_perm: int,
               num_bands: int) -> pa.Table:
    """(band_key, id) narrow rows from the signature table."""
    sig = _sig_matrix(batch["sig"], num_perm)
    keys = lsh_band_keys(sig, num_bands)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        "band_key": pa.array(keys.reshape(-1).view(np.int64)),
        id_col: pa.array(np.repeat(ids, num_bands)),
    })


def _empty_pairs(value_col: str, dtype: str = "float64") -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64"),
                         value_col: pd.Series(dtype=dtype)})


def _bucket_id_pairs(g: pa.Table, id_col: str,
                     max_bucket: int) -> pa.Table:
    """All (id_a < id_b) pairs of one bucket, deterministically truncated
    to the ``max_bucket`` smallest ids (degenerate-key skew guard)."""
    ids = np.sort(g[id_col].to_numpy(zero_copy_only=False))
    if len(ids) > max_bucket:
        ids = ids[:max_bucket]
    ii, jj = np.triu_indices(len(ids), k=1)
    return pa.table({"id_a": pa.array(ids[ii]), "id_b": pa.array(ids[jj])})


def _candidate_pairs(band, id_col: str, max_bucket: int):
    """Distinct candidate (id_a, id_b) pairs from narrow band rows.

    One groupby shuffle of 16 B rows; c==2 buckets (the bulk) become
    pairs natively; c≥3 bucket keys (sparse dup-cluster tail) are
    broadcast and only their rows re-grouped.
    """
    import ray

    agg = (band.groupby("band_key")
           .aggregate(Count(alias_name="c"),
                      Min(id_col, alias_name="id_a"),
                      Max(id_col, alias_name="id_b"))
           ).materialize()   # narrow (≈40 B/key); consumed twice below

    pairs2 = (agg.map_batches(
        lambda b: b.filter(pc.equal(b["c"], 2)).select(["id_a", "id_b"]),
        batch_format="pyarrow"))

    big_keys = np.array(
        [r["band_key"] for r in agg.map_batches(
            lambda b: b.filter(pc.greater(b["c"], 2)).select(["band_key"]),
            batch_format="pyarrow").take_all()], dtype=np.int64)
    if len(big_keys):
        big_keys.sort()
        keys_ref = ray.put(big_keys)

        def pick(b: pa.Table) -> pa.Table:
            k = b["band_key"].to_numpy(zero_copy_only=False)
            hot = ray.get(keys_ref)
            idx = np.searchsorted(hot, k)
            idx[idx == len(hot)] = 0
            return b.filter(pa.array(hot[idx] == k))

        pairs_big = (band.map_batches(pick, batch_format="pyarrow")
                     .groupby("band_key")
                     .map_groups(lambda g: _bucket_id_pairs(
                         g, id_col, max_bucket), batch_format="pyarrow"))
        cand = pairs2.union(pairs_big)
    else:
        cand = pairs2

    # a pair found in several bands appears once
    return (cand.groupby(["id_a", "id_b"])
            .aggregate(Count(alias_name="_nb"))
            .select_columns(["id_a", "id_b"]))


def _attach_sigs(cand, sig_ds, id_col: str, num_partitions: int):
    """cand (id_a, id_b) ⋈ sig_ds on both ids → (id_a, id_b, sig_a, sig_b)."""
    j = _join(cand, sig_ds, on=("id_a",), right_on=(id_col,),
              num_partitions=num_partitions)
    return _join(j, sig_ds, on=("id_b",), right_on=(id_col,),
                 num_partitions=num_partitions,
                 left_suffix="_a", right_suffix="_b")


def minhash_neardup_pairs_ds(ds, text_col: str = "text",
                             id_col: str = "doc_id", threshold: float = 0.7,
                             shingle_k: int = 5, num_perm: int = 128,
                             num_bands: int = 16, max_bucket: int = 2000,
                             num_partitions: int = DEFAULT_JOIN_PARTITIONS):
    """Near-duplicate pairs with estimated Jaccard ≥ threshold, as a
    Dataset (id_a, id_b, est_jaccard).

    shingle → minhash signature checkpoint → narrow band rows →
    native bucket aggregate → distinct candidate pairs → signature
    verify via two hash joins (signatures shipped once per candidate
    side, never per band).
    """
    stage = MinHashSigStage(text_col, id_col, shingle_k, num_perm)
    sig_ds = ds.map_batches(stage, batch_format="pyarrow").materialize()
    band = sig_ds.map_batches(
        lambda b: _band_rows(b, id_col, num_perm, num_bands),
        batch_format="pyarrow")
    cand = _candidate_pairs(band, id_col, max_bucket)
    joined = _attach_sigs(cand, sig_ds, id_col, num_partitions)

    def verify(b: pa.Table) -> pa.Table:
        A = _sig_matrix(b["sig_a"], num_perm)
        B = _sig_matrix(b["sig_b"], num_perm)
        est = (A == B).mean(axis=1) if len(A) else np.empty(0)
        t = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                      "est_jaccard": pa.array(est, type=pa.float64())})
        return t.filter(pc.greater_equal(t["est_jaccard"], threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_neardup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                          threshold: float = 0.7, shingle_k: int = 5,
                          num_perm: int = 128, num_bands: int = 16):
    """pandas convenience wrapper over :func:`minhash_neardup_pairs_ds`
    (result is small: the near-dup pair list)."""
    out = minhash_neardup_pairs_ds(
        ds, text_col, id_col, threshold, shingle_k, num_perm,
        num_bands).to_pandas()
    if out.empty:
        return _empty_pairs("est_jaccard")
    return (out.sort_values(["id_a", "id_b"], kind="stable")
            .reset_index(drop=True))


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.7, **kw):
    """Drop near-duplicates: greedy keep-lowest-id. Each doc appearing as
    ``id_b`` of a pair whose ``id_a`` is smaller is removed.  (Exact
    connected components would need iterated label propagation; greedy
    min-neighbor removal is the standard one-pass approximation and is
    deterministic.)  The drop set is broadcast once (size = #dup docs)."""
    pairs = minhash_neardup_pairs(ds, text_col, id_col, threshold, **kw)
    drop = np.unique(pairs["id_b"].to_numpy()) if len(pairs) else \
        np.empty(0, dtype=np.int64)
    import ray
    drop_ref = ray.put(drop)

    def filter_batch(b: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if not len(d):
            return b
        ids = b[id_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(d, ids)
        idx[idx == len(d)] = 0
        return b.filter(pa.array(d[idx] != ids))

    return ds.map_batches(filter_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHashStage:
    """(band_key, id, fp) narrow rows — fp is 8 B, cheap enough to ride
    along, so Hamming verification needs no join at all."""

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
        return pa.table({
            "band_key": pa.array(keys.reshape(-1).view(np.int64)),
            self.id_col: pa.array(np.repeat(ids, self.num_bands)),
            "fp": pa.array(np.repeat(fp.view(np.int64), self.num_bands)),
        })


def simhash_neardup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                          max_hamming: int = 3, shingle_k: int = 5,
                          num_bands: int = 4, max_bucket: int = 2000):
    """Pairs within Hamming distance ≤ max_hamming of 64-bit SimHash.
    Blocking: identical band in any of ``num_bands`` bands (covers all
    pairs with < num_bands differing bits by pigeonhole).

    Same shape as minhash: one narrow groupby-aggregate shuffle; c==2
    buckets yield (min_id, max_id, min_fp, max_fp) natively — for a
    2-row group {Min(fp), Max(fp)} IS the fp pair, and Hamming is
    symmetric so the id↔fp association is irrelevant; c≥3 buckets
    (sparse) re-group for exact in-bucket pairing.  Pair dedup is a
    native Min aggregate.
    """
    import ray

    stage = SimHashStage(text_col, id_col, shingle_k, num_bands)
    band = ds.map_batches(stage, batch_format="pyarrow")

    agg = (band.groupby("band_key")
           .aggregate(Count(alias_name="c"),
                      Min(id_col, alias_name="id_a"),
                      Max(id_col, alias_name="id_b"),
                      Min("fp", alias_name="fp_a"),
                      Max("fp", alias_name="fp_b"))
           ).materialize()

    def pairs_from_2(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["c"], 2))
        fa = b["fp_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        fb = b["fp_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        d = hamming_distance(fa, fb)
        t = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                      "hamming": pa.array(d)})
        return t.filter(pa.array(d <= max_hamming))

    pairs2 = agg.map_batches(pairs_from_2, batch_format="pyarrow")

    big_keys = np.array(
        [r["band_key"] for r in agg.map_batches(
            lambda b: b.filter(pc.greater(b["c"], 2)).select(["band_key"]),
            batch_format="pyarrow").take_all()], dtype=np.int64)
    if len(big_keys):
        big_keys.sort()
        keys_ref = ray.put(big_keys)

        def pick(b: pa.Table) -> pa.Table:
            k = b["band_key"].to_numpy(zero_copy_only=False)
            hot = ray.get(keys_ref)
            idx = np.searchsorted(hot, k)
            idx[idx == len(hot)] = 0
            return b.filter(pa.array(hot[idx] == k))

        def bucket_pairs(g: pa.Table) -> pa.Table:
            gid = g[id_col].to_numpy(zero_copy_only=False)
            order = np.argsort(gid, kind="stable")
            ids = gid[order][:max_bucket]
            fp = g["fp"].to_numpy(zero_copy_only=False)[order][:max_bucket] \
                .view(np.uint64)
            ii, jj = np.triu_indices(len(ids), k=1)
            d = hamming_distance(fp[ii], fp[jj])
            keep = d <= max_hamming
            return pa.table({"id_a": pa.array(ids[ii[keep]]),
                             "id_b": pa.array(ids[jj[keep]]),
                             "hamming": pa.array(d[keep])})

        pairs_big = (band.map_batches(pick, batch_format="pyarrow")
                     .groupby("band_key")
                     .map_groups(bucket_pairs, batch_format="pyarrow"))
        pairs = pairs2.union(pairs_big)
    else:
        pairs = pairs2

    out = (pairs.groupby(["id_a", "id_b"])
           .aggregate(Min("hamming", alias_name="hamming"))
           .to_pandas())
    if out.empty or "id_a" not in out.columns:
        return _empty_pairs("hamming", "int64")
    return (out.sort_values(["id_a", "id_b"], kind="stable")
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, shingle_k: int = 5,
                        num_perm: int = 128, num_bands: int = 16,
                        candidate_threshold: float = 0.3,
                        num_partitions: int = DEFAULT_JOIN_PARTITIONS):
    """MinHash-LSH candidates verified with EXACT n-gram Jaccard —
    fully distributed (round-2 redesign, VERDICT.md "Next round" #4).

    The candidate ids never visit the driver: a hash semi-join selects
    the candidate docs, whose sorted-unique shingle-hash sets become a
    binary column that joins onto the pair list; exact Jaccard runs
    per batch of pairs (sorted-array intersection per pair — candidate
    sets are small and the loop is over *pairs in one batch*, inside
    the cluster, not over the corpus on the driver)."""
    cand = minhash_neardup_pairs_ds(
        ds, text_col, id_col, threshold=candidate_threshold,
        shingle_k=shingle_k, num_perm=num_perm, num_bands=num_bands,
        num_partitions=num_partitions).materialize()

    if cand.count() == 0:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})

    need = (cand.select_columns(["id_a"]).rename_columns({"id_a": id_col})
            .union(cand.select_columns(["id_b"])
                   .rename_columns({"id_b": id_col}))
            .groupby(id_col).aggregate(Count(alias_name="_n"))
            .select_columns([id_col]))
    docs_needed = _join(ds.select_columns([id_col, text_col]), need,
                        on=(id_col,), num_partitions=num_partitions)

    def hash_sets(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h1, _, nf = shingle_hashes(texts, shingle_k)
        offs = np.zeros(len(nf) + 1, dtype=np.int64)
        np.cumsum(nf, out=offs[1:])
        blobs, boffs = [], [0]
        for i in range(len(nf)):
            u = np.unique(h1[offs[i]:offs[i + 1]]).astype("<u8")
            blobs.append(u.tobytes())
            boffs.append(boffs[-1] + len(u) * 8)
        sig_arr = pa.BinaryArray.from_buffers(
            pa.binary(), len(nf),
            [None, pa.py_buffer(np.array(boffs, dtype=np.int32).tobytes()),
             pa.py_buffer(b"".join(blobs))])
        return pa.table({id_col: b[id_col], "sig": sig_arr})

    hset_ds = docs_needed.map_batches(hash_sets, batch_format="pyarrow")
    joined = _attach_sigs(cand.select_columns(["id_a", "id_b"]), hset_ds,
                          id_col, num_partitions)

    def verify(b: pa.Table) -> pa.Table:
        sa, sb = b["sig_a"], b["sig_b"]
        if isinstance(sa, pa.ChunkedArray):
            sa = sa.combine_chunks()
        if isinstance(sb, pa.ChunkedArray):
            sb = sb.combine_chunks()
        jac = np.empty(len(b), dtype=np.float64)
        for i in range(len(b)):
            a = np.frombuffer(sa[i].as_py(), dtype="<u8")
            c = np.frombuffer(sb[i].as_py(), dtype="<u8")
            if len(a) == 0 and len(c) == 0:
                jac[i] = 1.0
                continue
            inter = len(np.intersect1d(a, c, assume_unique=True))
            jac[i] = inter / (len(a) + len(c) - inter)
        t = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                      "jaccard": pa.array(jac)})
        return t.filter(pc.greater_equal(t["jaccard"], threshold))

    out = joined.map_batches(verify, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    return (out.sort_values(["id_a", "id_b"], kind="stable")
            .reset_index(drop=True))
