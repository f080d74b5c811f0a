"""Similarity search over embedding columns (graft additions).

- brute-force cosine top-k: per-batch numpy matmul against a broadcast
  query matrix, local top-k per block, then a tiny global sort — the
  exact baseline;
- LSH-bucketed near-dup: random-hyperplane signatures bucket vectors,
  exact cosine verifies within buckets — the scale path (candidates
  shuffle, never the full cross product);
- IVF top-k: deterministic k-means (seeded sample on the driver, Lloyd
  iterations) → assignment via map_batches → probe the nearest
  ``n_probe`` lists only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-copy values buf)."""
    arr = batch_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if isinstance(arr, pa.FixedSizeListArray):
        d = arr.type.list_size
        return flat.reshape(-1, d)
    widths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("ragged embedding column")
    return flat.reshape(-1, d)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_ties(sims: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the exact per-block top-k by (sim DESC, id ASC).

    Selects ALL rows tied with the k-th similarity before ordering, so a
    block full of identical vectors cannot drop the lowest-id ties that
    the global (oracle) order would keep — argpartition alone chooses
    arbitrarily among ties.
    """
    n = len(sims)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= k:
        return np.lexsort((ids, -sims))
    kth = np.partition(-sims, k - 1)[k - 1]   # k-th largest (negated)
    sel = np.nonzero(-sims <= kth)[0]         # all rows ≥ k-th sim value
    order = sel[np.lexsort((ids[sel], -sims[sel]))][:k]
    return order


def brute_force_topk(ds, query_vec: np.ndarray, k: int = 10,
                     emb_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k of one query vector.

    map_batches: cosine per row (vectorized dot), keep each block's local
    top-k only → global ``sort(desc).limit(k)`` over ≤ k·n_blocks rows.
    Ties broken by ascending id (deterministic).
    """
    import ray
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize_rows(_matrix(batch[emb_col]))
        sims = m @ qv
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = _topk_ties(sims, ids, k)
        return pa.table({id_col: pa.array(ids[order]),
                         "cos_sim": pa.array(sims[order])})

    cand = ds.map_batches(local_topk, batch_format="pyarrow")
    top = cand.sort(["cos_sim", id_col], descending=[True, False]).limit(k)
    return top


class HyperplaneLSH:
    """Deterministic random-hyperplane signatures for cosine LSH."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 0xA55):
        rng = np.random.default_rng(np.random.PCG64(seed))
        self.planes = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits

    def keys(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        weights = (1 << np.arange(self.n_bits)).astype(np.int64)
        return bits.astype(np.int64) @ weights


def embedding_neardup_pairs(ds, threshold: float = 0.9,
                            emb_col: str = "embedding",
                            id_col: str = "vec_id",
                            n_bits: int = 10, dim: int | None = None):
    """Pairs with cosine ≥ threshold via hyperplane-LSH blocking + exact
    in-bucket verification.  n_bits trades recall (P[same bucket] =
    (1 − θ/π)^n_bits) for bucket size; pairs in no common bucket are
    missed — the documented approximation."""
    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    lsh = HyperplaneLSH(dim, n_bits)
    import ray
    lsh_ref = ray.put(lsh)

    def add_bucket(batch: pa.Table) -> pa.Table:
        l = ray.get(lsh_ref)
        m = _normalize_rows(_matrix(batch[emb_col]))
        key = l.keys(m)
        flat = pa.array(m.reshape(-1), type=pa.float64())
        return pa.table({
            "bucket": pa.array(key),
            id_col: batch[id_col],
            "emb": pa.FixedSizeListArray.from_arrays(flat, m.shape[1]),
        })

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "cos_sim": pd.Series(dtype="float64")})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return _empty()
        m = np.stack(g["emb"].to_numpy())
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        s = sims[ii, jj]
        keep = s >= threshold
        return pd.DataFrame({"id_a": ids[ii[keep]], "id_b": ids[jj[keep]],
                             "cos_sim": s[keep]})

    from ray.data.aggregate import Max

    pairs = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair found in several buckets appears once — native aggregate,
    # no per-pair Python (cos_sim identical across buckets)
    out = (pairs.groupby(["id_a", "id_b"])
           .aggregate(Max("cos_sim", alias_name="cos_sim")).to_pandas())
    if out.empty or "id_a" not in out.columns:
        return _empty()
    return (out.sort_values(["id_a", "id_b"], kind="stable")
            .reset_index(drop=True))


def ivf_topk(ds, query_vec: np.ndarray, k: int = 10, n_lists: int = 16,
             n_probe: int = 4, emb_col: str = "embedding",
             id_col: str = "vec_id", train_sample: int = 2048,
             seed: int = 0x1F5):
    """IVF approximate top-k: coarse k-means centroids (fit on a seeded
    driver-side sample), vectors assigned to nearest list via
    map_batches, query probes only the ``n_probe`` nearest lists."""
    import ray
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    sample = ds.random_sample(1.0, seed=seed).limit(train_sample).to_pandas()
    train = _normalize_rows(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(np.random.PCG64(seed))
    n_lists = min(n_lists, len(train))
    cent = train[rng.choice(len(train), n_lists, replace=False)]
    for _ in range(8):  # Lloyd iterations on the sample
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(n_lists):
            sel = assign == c
            if sel.any():
                v = train[sel].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    probe = np.argsort(-(cent @ q))[:n_probe]
    probe_set = set(int(x) for x in probe)
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)

    def local(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qv = ray.get(q_ref)
        m = _normalize_rows(_matrix(batch[emb_col]))
        assign = np.argmax(m @ c.T, axis=1)
        sel = np.isin(assign, list(probe_set))
        ids = batch[id_col].to_numpy(zero_copy_only=False)[sel]
        sims = (m[sel] @ qv)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "cos_sim": pa.array(sims[order])})

    cand = ds.map_batches(local, batch_format="pyarrow")
    return cand.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


def brute_force_topk_multi(ds, query_mat: np.ndarray, query_ids,
                           k: int = 10, emb_col: str = "embedding",
                           id_col: str = "vec_id"):
    """Exact cosine top-k for a BATCH of query vectors at once — the
    batched-inference shape: one broadcast (q, d) matrix, one matmul per
    block, local top-k per query, tiny global per-query reduce.

    Returns a Dataset (query_id, vec_id, cos_sim), k rows per query,
    ties broken by ascending id.
    """
    import ray

    Q = _normalize_rows(np.asarray(query_mat, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((Q, qids))

    def local_topk(batch: pa.Table) -> pa.Table:
        Qm, qi = ray.get(q_ref)
        m = _normalize_rows(_matrix(batch[emb_col]))
        sims = m @ Qm.T                       # (n, q)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for j in range(sims.shape[1]):
            s = sims[:, j]
            order = _topk_ties(s, ids, k)
            out_q.append(np.full(len(order), qi[j], dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(s[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "cos_sim": pa.array(np.concatenate(out_s)),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow")

    def per_query_topk(g: pa.Table) -> pa.Table:
        s = g["cos_sim"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:k]
        return pa.table({
            "query_id": pa.array(
                np.full(len(order), g["query_id"][0].as_py(),
                        dtype=np.int64)),
            id_col: pa.array(ids[order]),
            "cos_sim": pa.array(s[order]),
        })

    return (cand.groupby("query_id")
            .map_groups(per_query_topk, batch_format="pyarrow"))
