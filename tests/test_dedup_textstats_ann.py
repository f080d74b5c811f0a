"""Training-data pipeline operators: dedup variants, text stats, ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from biobloom_ray.sketches.minhash import (
    exact_jaccard_from_hashes,
    minhash_signatures,
    signature_jaccard,
)
from biobloom_ray.sketches.simhash import hamming_distance, simhash_fingerprints
from biobloom_ray.hashing import shingle_hashes
from biobloom_ray.stages.ann import brute_force_topk, embedding_neardup_pairs, ivf_topk
from biobloom_ray.stages.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_neardup_pairs,
    simhash_neardup_pairs,
)
from biobloom_ray.stages.multimodal import DecodeFeatureActor, FakeCodec
from biobloom_ray.stages.textstats import (
    LangIdActor,
    NGramLangProfiles,
    quality_score_batch,
    token_count_batch,
)


def _mutate(text: str, rate: float, seed: int) -> str:
    rng = np.random.default_rng(seed)
    chars = list(text)
    for i in range(len(chars)):
        if rng.random() < rate:
            chars[i] = chr(ord("a") + int(rng.integers(26)))
    return "".join(chars)


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    rng = np.random.default_rng(11)
    base = [" ".join(f"w{int(rng.integers(500)):03d}" for _ in range(80))
            for _ in range(40)]
    rows = []
    did = 0
    for b in base:
        rows.append((did, b)); did += 1
        rows.append((did, b)); did += 1                      # exact dup
        rows.append((did, _mutate(b, 0.02, did))); did += 1  # near dup
        rows.append((did, " ".join(f"z{int(rng.integers(500)):03d}"
                                   for _ in range(80)))); did += 1  # unrelated
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows], type=pa.string())})
    return ray.data.from_arrow(tbl), rows


class TestMinHashKernels:
    def test_signature_estimates_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = "the quick brown fox jumped over a lazy dog " * 5
        h1a, _, nfa = shingle_hashes([a], 5)
        h1b, _, nfb = shingle_hashes([b], 5)
        true_j = exact_jaccard_from_hashes(h1a, h1b)
        sig = minhash_signatures(np.concatenate([h1a, h1b]),
                                 np.array([nfa[0], nfb[0]]), num_perm=256)
        est = signature_jaccard(sig[0], sig[1])
        assert abs(est - true_j) < 0.12

    def test_identical_sets_full_match(self):
        h1, _, nf = shingle_hashes(["identical text here"], 4)
        sig = minhash_signatures(np.concatenate([h1, h1]),
                                 np.array([nf[0], nf[0]]), num_perm=64)
        assert (sig[0] == sig[1]).all()


class TestSimHashKernels:
    def test_similar_docs_low_hamming(self):
        a = "word soup with many common tokens repeated often " * 10
        b = a.replace("common", "shared", 2)
        c = "completely different content about other matters entirely " * 10
        h1, _, nf = shingle_hashes([a, b, c], 5)
        fp = simhash_fingerprints(h1, nf)
        d_ab = hamming_distance(fp[:1], fp[1:2])[0]
        d_ac = hamming_distance(fp[:1], fp[2:3])[0]
        assert d_ab < d_ac


class TestDedupPipelines:
    def test_exact_dedup_first_wins(self, dup_docs):
        ds, rows = dup_docs
        out = exact_dedup(ds).to_pandas()
        texts = [r[1] for r in rows]
        assert len(out) == len(set(texts))
        # winner is the smallest doc_id of each text group
        expect = (pd.DataFrame(rows, columns=["doc_id", "text"])
                  .groupby("text")["doc_id"].min())
        got = out.set_index("text")["doc_id"]
        assert got.sort_index().equals(expect.sort_index())

    def test_minhash_finds_exact_and_near_dups(self, dup_docs):
        ds, rows = dup_docs
        pairs = minhash_neardup_pairs(ds, threshold=0.6)
        found = set(zip(pairs.id_a, pairs.id_b))
        # every exact-dup pair (4i, 4i+1) must be found
        for i in range(0, len(rows), 4):
            assert (i, i + 1) in found, f"exact dup pair {(i, i+1)} missed"
        # near-dups (4i, 4i+2): most should be found at 2% mutation
        near_found = sum((i, i + 2) in found or (i + 1, i + 2) in found
                         for i in range(0, len(rows), 4))
        assert near_found >= 0.8 * (len(rows) // 4)
        # unrelated docs never pair with their base
        for i in range(0, len(rows), 4):
            assert (i, i + 3) not in found

    def test_minhash_dedup_drops_dupes(self, dup_docs):
        ds, rows = dup_docs
        kept = minhash_dedup(ds, threshold=0.6).to_pandas()
        kept_ids = set(kept.doc_id)
        for i in range(0, len(rows), 4):
            assert i in kept_ids           # base kept (lowest id)
            assert i + 1 not in kept_ids   # exact dup dropped
            assert i + 3 in kept_ids       # unrelated kept

    def test_simhash_finds_exact_dups(self, dup_docs):
        ds, rows = dup_docs
        pairs = simhash_neardup_pairs(ds, max_hamming=3)
        found = set(zip(pairs.id_a, pairs.id_b))
        for i in range(0, len(rows), 4):
            assert (i, i + 1) in found


class TestTextStats:
    def test_token_and_quality(self, ray_session):
        tbl = pa.table({"doc_id": [0, 1], "text": ["a bb  ccc", "Hello, World!"]})
        out = token_count_batch(tbl)
        assert out["n_tokens"].to_pylist() == [3, 2]
        q = quality_score_batch(tbl)
        assert q["n_chars_calc"].to_pylist() == [9, 13]
        assert q["n_alpha"].to_pylist() == [6, 10]
        assert q["punct_ratio"].to_pylist()[1] == pytest.approx(2 / 13)

    def test_langid_separates_disjoint_vocab(self, ray_session):
        rng = np.random.default_rng(5)
        pools = {"aa": [f"aa{i}" for i in range(50)],
                 "bb": [f"bb{i}" for i in range(50)]}
        docs, langs = [], []
        for lang, pool in pools.items():
            for _ in range(30):
                docs.append(" ".join(rng.choice(pool, 40)))
                langs.append(lang)
        model = NGramLangProfiles(n=3).fit(docs, langs)
        actor = LangIdActor(model)
        out = actor(pa.table({"text": docs}))
        pred = out["lang_pred"].to_pylist()
        acc = np.mean([p == l for p, l in zip(pred, langs)])
        assert acc > 0.95


class TestANN:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        rng = np.random.default_rng(17)
        m = rng.standard_normal((400, 32)).astype(np.float64)
        # plant near-dup pairs: vectors 0/1 and 2/3 nearly parallel
        m[1] = m[0] + 0.01 * rng.standard_normal(32)
        m[3] = m[2] + 0.01 * rng.standard_normal(32)
        flat = pa.array(m.reshape(-1), type=pa.float64())
        tbl = pa.table({"vec_id": pa.array(np.arange(400), type=pa.int64()),
                        "embedding": pa.FixedSizeListArray.from_arrays(flat, 32)})
        return ray.data.from_arrow(tbl), m

    def test_brute_force_matches_numpy(self, emb_ds):
        ds, m = emb_ds
        q = m[0]
        top = brute_force_topk(ds, q, k=5).to_pandas()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ (q / np.linalg.norm(q))
        want = np.lexsort((np.arange(len(sims)), -sims))[:5]
        assert top.vec_id.tolist() == want.tolist()

    def test_ivf_recall(self, emb_ds):
        ds, m = emb_ds
        q = m[0]
        exact = set(brute_force_topk(ds, q, k=10).to_pandas().vec_id)
        approx = set(ivf_topk(ds, q, k=10, n_lists=8, n_probe=4,
                              train_sample=400).to_pandas().vec_id)
        assert len(exact & approx) >= 6  # recall >= 0.6 with 4/8 probes

    def test_embedding_neardup(self, emb_ds):
        ds, m = emb_ds
        pairs = embedding_neardup_pairs(ds, threshold=0.95, n_bits=8)
        found = set(zip(pairs.id_a, pairs.id_b))
        assert (0, 1) in found
        assert (2, 3) in found


class TestMultimodal:
    def test_decode_actor_plumbing(self, ray_session):
        payloads = [b"some bytes", b"", b"other data longer payload"]
        tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                        "payload": pa.array(payloads, type=pa.large_binary())})
        ds = ray.data.from_arrow(tbl)
        out = ds.map_batches(DecodeFeatureActor,
                             fn_constructor_kwargs={"feature_dim": 8},
                             batch_size=2, concurrency=1,
                             batch_format="pyarrow").to_pandas()
        assert "features" in out.columns and "payload" not in out.columns
        assert len(out.features.iloc[0]) == 8
        # determinism
        again = FakeCodec(8).decode(payloads[0])
        got = np.asarray(out[out.doc_id == 0].features.iloc[0])
        assert np.allclose(got, again)


class TestFrameSample:
    def test_frame_sample_explodes_and_drops_payload(self, ray_session):
        from biobloom_ray.stages.multimodal import FrameSampleActor

        rng = np.random.default_rng(3)
        rows = []
        for i in range(20):
            n = int(rng.integers(0, 12))
            rows.append((i, n, rng.bytes(max(n, 1) * 64)))
        tbl = pa.table({
            "media_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_frames": pa.array([r[1] for r in rows], type=pa.int64()),
            "payload": pa.array([r[2] for r in rows], type=pa.large_binary()),
        })
        ds = ray.data.from_arrow(tbl)
        out = ds.map_batches(FrameSampleActor,
                             fn_constructor_kwargs={"every": 2,
                                                    "feature_dim": 8},
                             batch_size=4, concurrency=2,
                             batch_format="pyarrow").to_pandas()
        # one output row per sampled frame; payload column gone
        want = sum(len(range(0, n, 2)) for _, n, _ in rows)
        assert len(out) == want
        assert "payload" not in out.columns
        assert set(out.columns) == {"media_id", "frame_idx", "features"}
        assert all(len(f) == 8 for f in out.features)
        # deterministic across reruns
        out2 = ds.map_batches(FrameSampleActor,
                              fn_constructor_kwargs={"every": 2,
                                                     "feature_dim": 8},
                              batch_size=4, concurrency=2,
                              batch_format="pyarrow").to_pandas()
        a = out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
        b = out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
        assert a[["media_id", "frame_idx"]].equals(b[["media_id", "frame_idx"]])


def test_sig_matrix_honors_array_offset():
    """Sliced signature arrays must return THEIR rows, not the buffer
    head (zero-copy fast path + Array.offset)."""
    from biobloom_ray.stages.dedup import MinHashSigStage, _sig_matrix

    tbl = pa.table({"doc_id": pa.array(range(6), type=pa.int64()),
                    "text": [f"document number {i} with words" * 3
                             for i in range(6)]})
    sig_tbl = MinHashSigStage(num_perm=16)(tbl)
    col = sig_tbl["sig"]
    full = _sig_matrix(col, 16)
    sl = col.combine_chunks().slice(2, 3) if isinstance(col, pa.ChunkedArray) \
        else col.slice(2, 3)
    part = _sig_matrix(sl, 16)
    assert np.array_equal(part, full[2:5])


def test_ann_topk_tie_break_exact(ray_session):
    """Blocks full of identical vectors: ties must resolve by ascending
    id exactly like the SQL oracle's (sim DESC, id ASC) order."""
    from biobloom_ray.stages.ann import brute_force_topk, brute_force_topk_multi

    n = 200
    emb = [[1.0, 0.0, 0.0]] * n          # all identical → all ties
    tbl = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(emb)})
    ds = ray.data.from_arrow(tbl).repartition(4)
    top = brute_force_topk(ds, np.array([1.0, 0.0, 0.0]), k=10).to_pandas()
    assert top.vec_id.tolist() == list(range(10))
    multi = brute_force_topk_multi(
        ds, np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        [100, 200], k=10).to_pandas()
    got = multi[multi.query_id == 100].sort_values(
        ["cos_sim", "vec_id"], ascending=[False, True]).vec_id.tolist()
    assert got == list(range(10))


def test_minhash_empty_docs_never_pair(ray_session):
    """Docs shorter than the shingle width must not flood the output
    with degenerate all-sentinel pairs."""
    from biobloom_ray.stages.dedup import minhash_neardup_pairs

    rows = [(i, "") for i in range(30)] + [(100, "ab"), (101, "ab")] \
        + [(200, "a real document with actual words " * 5),
           (201, "a real document with actual words " * 5)]
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows], type=pa.string())})
    pairs = minhash_neardup_pairs(ray.data.from_arrow(tbl), threshold=0.6)
    found = set(zip(pairs.id_a, pairs.id_b))
    assert (200, 201) in found
    assert all(a >= 200 for a, _ in found), f"empty-doc pairs leaked: {found}"


def test_minhash_join_path_matches_broadcast(dup_docs):
    """Above broadcast_limit the verify runs via hash joins — it must
    produce the identical pair set as the broadcast path."""
    from biobloom_ray.stages.dedup import minhash_neardup_pairs_ds

    ds, rows = dup_docs
    via_join = (minhash_neardup_pairs_ds(ds, threshold=0.6,
                                         broadcast_limit=0)
                .to_pandas().sort_values(["id_a", "id_b"])
                .reset_index(drop=True))
    via_bcast = (minhash_neardup_pairs_ds(ds, threshold=0.6)
                 .to_pandas().sort_values(["id_a", "id_b"])
                 .reset_index(drop=True))
    assert len(via_join) > 0
    assert via_join[["id_a", "id_b"]].equals(via_bcast[["id_a", "id_b"]])
    assert np.allclose(via_join.est_jaccard, via_bcast.est_jaccard)


def test_ngram_join_path_matches_broadcast(dup_docs):
    """Forcing broadcast_limit=0 exercises the distributed hash-join
    verify; it must agree exactly with the broadcast path."""
    from biobloom_ray.stages.dedup import ngram_jaccard_pairs

    ds, rows = dup_docs
    a = ngram_jaccard_pairs(ds, threshold=0.5)
    b = ngram_jaccard_pairs(ds, threshold=0.5, broadcast_limit=0)
    assert len(a) > 0
    assert a[["id_a", "id_b"]].equals(b[["id_a", "id_b"]])
    assert np.allclose(a.jaccard, b.jaccard)


def test_minhash_parquet_checkpoint_parity(dup_docs, tmp_path):
    """Forcing the signature checkpoint to parquet (the >gate path at
    real scale) must yield the identical pair set as the in-memory
    materialization."""
    from biobloom_ray.stages.dedup import minhash_neardup_pairs_ds

    ds, rows = dup_docs
    mem = (minhash_neardup_pairs_ds(ds, threshold=0.6, checkpoint="memory")
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pq_ = (minhash_neardup_pairs_ds(ds, threshold=0.6, checkpoint="parquet",
                                    checkpoint_dir=str(tmp_path / "sigs"))
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(mem) > 0
    assert mem[["id_a", "id_b"]].equals(pq_[["id_a", "id_b"]])
    assert np.allclose(mem.est_jaccard, pq_.est_jaccard)
    # the checkpoint really landed on disk
    import glob
    assert glob.glob(str(tmp_path / "sigs" / "*.parquet"))


def test_jaccard_csr_kernels_match_naive():
    """The batched CSR intersection must equal per-pair np.intersect1d."""
    from biobloom_ray.stages.dedup import (_jaccard_from_sets,
                                           _pair_intersections)

    rng = np.random.default_rng(3)
    sets = [np.unique(rng.integers(0, 50, size=rng.integers(0, 30))
                      .astype(np.uint64)) for _ in range(40)]
    sets[0] = np.empty(0, dtype=np.uint64)  # both-empty pair below
    pairs = [(0, 0), (1, 2), (3, 4)] + \
        [(int(rng.integers(40)), int(rng.integers(40))) for _ in range(50)]
    va = np.concatenate([sets[a] for a, _ in pairs])
    vb = np.concatenate([sets[b] for _, b in pairs])
    la = np.array([len(sets[a]) for a, _ in pairs], dtype=np.int64)
    lb = np.array([len(sets[b]) for _, b in pairs], dtype=np.int64)
    inter = _pair_intersections(va, la, vb, lb)
    jac = _jaccard_from_sets(va, la, vb, lb)
    for t, (a, b) in enumerate(pairs):
        want = len(np.intersect1d(sets[a], sets[b], assume_unique=True))
        assert inter[t] == want
        u = la[t] + lb[t] - want
        assert jac[t] == (want / u if u else 1.0)


def test_minhash_band_driver_path_matches_groupby_path(dup_docs):
    """The three bucketing tiers (driver lexsort / groupby+driver pairs /
    full cluster) must produce identical pair sets."""
    from biobloom_ray.stages.dedup import minhash_neardup_pairs_ds

    ds, rows = dup_docs
    fast = (minhash_neardup_pairs_ds(ds, threshold=0.6)  # band-driver tier
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    grp = (minhash_neardup_pairs_ds(ds, threshold=0.6, band_driver_limit=0)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(fast) > 0
    assert fast[["id_a", "id_b"]].equals(grp[["id_a", "id_b"]])
    assert np.allclose(fast.est_jaccard, grp.est_jaccard)


def test_simhash_band_driver_path_matches_groupby_path(dup_docs):
    from biobloom_ray.stages.dedup import simhash_neardup_pairs

    ds, rows = dup_docs
    fast = simhash_neardup_pairs(ds, max_hamming=3)
    grp = simhash_neardup_pairs(ds, max_hamming=3, band_driver_limit=0)
    assert len(fast) > 0
    assert fast[["id_a", "id_b"]].reset_index(drop=True).equals(
        grp[["id_a", "id_b"]].reset_index(drop=True))
    assert (fast.hamming.to_numpy() == grp.hamming.to_numpy()).all()


def test_exact_dedup_tiers_agree(dup_docs, monkeypatch):
    import biobloom_ray.stages.dedup as D

    ds, rows = dup_docs
    fast = (D.exact_dedup(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(D, "EXACT_DEDUP_DRIVER_MAX_ROWS", 0)
    slow = (D.exact_dedup(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(fast) > 0 and len(fast) < ds.count()
    assert fast.doc_id.tolist() == slow.doc_id.tolist()


def test_jaccard_kernels_property(ray_session):
    """Hypothesis property: batched CSR intersection == per-pair
    np.intersect1d for arbitrary sorted-unique uint64 sets."""
    from hypothesis import given, settings, strategies as st

    from biobloom_ray.stages.dedup import _pair_intersections

    sets_strategy = st.lists(
        st.lists(st.integers(0, 2**64 - 1), max_size=25).map(
            lambda xs: np.unique(np.array(xs, dtype=np.uint64))),
        min_size=1, max_size=12)

    @settings(max_examples=60, deadline=None)
    @given(sets=sets_strategy, data=st.data())
    def run(sets, data):
        n = len(sets)
        pairs = [(data.draw(st.integers(0, n - 1)),
                  data.draw(st.integers(0, n - 1)))
                 for _ in range(data.draw(st.integers(1, 8)))]
        va = (np.concatenate([sets[a] for a, _ in pairs])
              if pairs else np.empty(0, np.uint64))
        vb = (np.concatenate([sets[b] for _, b in pairs])
              if pairs else np.empty(0, np.uint64))
        la = np.array([len(sets[a]) for a, _ in pairs], dtype=np.int64)
        lb = np.array([len(sets[b]) for _, b in pairs], dtype=np.int64)
        got = _pair_intersections(va, la, vb, lb)
        for t, (a, b) in enumerate(pairs):
            want = len(np.intersect1d(sets[a], sets[b],
                                      assume_unique=True))
            assert got[t] == want

    run()


def test_segment_gather_property():
    """Hypothesis property: _segment_gather concatenates exactly the
    requested CSR segments in order."""
    from hypothesis import given, settings, strategies as st

    from biobloom_ray.stages.dedup import _segment_gather

    @settings(max_examples=60, deadline=None)
    @given(segs=st.lists(st.lists(st.integers(0, 1000), max_size=10),
                         min_size=1, max_size=10), data=st.data())
    def run(segs, data):
        vals = np.array([x for s in segs for x in s], dtype=np.int64)
        offs = np.zeros(len(segs) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in segs], out=offs[1:])
        idx = np.array([data.draw(st.integers(0, len(segs) - 1))
                        for _ in range(data.draw(st.integers(1, 6)))],
                       dtype=np.int64)
        got, lens = _segment_gather(vals, offs, idx)
        want = np.concatenate([np.array(segs[i], dtype=np.int64)
                               for i in idx]) if len(idx) else vals[:0]
        assert np.array_equal(got, want)
        assert lens.tolist() == [len(segs[i]) for i in idx]

    run()


class TestEmbeddingKMeans:
    def test_clusters_recover_planted_structure(self, ray_session):
        """Planted well-separated directions (the sf fixture's label
        column carries no geometric structure — measured within-label
        cosine ≈ cross-label ≈ 0): spherical k-means at k = n_planted
        must recover them with high majority purity."""
        import pandas as pd

        import ray.data

        from biobloom_ray.stages.ann import embedding_kmeans

        rng = np.random.default_rng(17)
        K, dim, per = 6, 32, 80
        centers = rng.standard_normal((K, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows, labels = [], []
        for c in range(K):
            pts = centers[c] + 0.15 * rng.standard_normal((per, dim))
            rows.extend(pts.tolist())
            labels.extend([c] * per)
        tbl = pa.table({
            "vec_id": pa.array(range(K * per), type=pa.int64()),
            "embedding": pa.array(rows,
                                  type=pa.list_(pa.float32())),
        })
        emb = ray.data.from_arrow(tbl)
        assigns, cent = embedding_kmeans(emb, k=K, iters=8)
        df = assigns.to_pandas()
        df["label"] = np.array(labels)[df.vec_id.to_numpy()]
        purity = (df.groupby("cluster").label
                  .agg(lambda s: s.value_counts().iloc[0]).sum()) / len(df)
        assert purity > 0.95
        assert cent.shape == (K, dim)

    def test_deterministic_under_partitioning(self, ray_session):
        import ray.data

        from biobloom_ray.io import read_parquet as _rp
        from biobloom_ray.stages.ann import embedding_kmeans

        sf = "/root/testdata/sf0.01"
        emb = _rp(f"{sf}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
        a, ca = embedding_kmeans(emb, k=5, iters=5)
        b, cb = embedding_kmeans(emb.repartition(7), k=5, iters=5)
        assert np.array_equal(ca, cb)  # bit-identical centroids
        pa_ = a.to_pandas().sort_values("vec_id").reset_index(drop=True)
        pb_ = b.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert (pa_.cluster.to_numpy() == pb_.cluster.to_numpy()).all()


def test_kmeans_tiers_agree(ray_session, monkeypatch):
    """Driver tier and distributed Lloyd loop must give bit-identical
    centroids and assignments (fixed-point reduction)."""
    import biobloom_ray.stages.ann as ANN
    from biobloom_ray.io import read_parquet as _rp

    sf = "/root/testdata/sf0.01"
    emb = _rp(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    a, ca = ANN.embedding_kmeans(emb, k=5, iters=5)
    monkeypatch.setattr(ANN, "KMEANS_DRIVER_MAX_ROWS", 0)
    b, cb = ANN.embedding_kmeans(emb, k=5, iters=5)
    assert np.array_equal(ca, cb)
    pa_ = a.to_pandas().sort_values("vec_id").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (pa_.cluster.to_numpy() == pb_.cluster.to_numpy()).all()


# -- repetition stats + decontamination ---------------------------------------


class TestRepetitionStats:
    def test_hand_computed(self):
        from biobloom_ray.stages.textstats import repetition_stats_batch
        t = pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": ["a b a b a",          # 5 tok, 2 distinct, top=3(a);
                                            # bigrams: ab ba ab ba -> 2 distinct
                     "x",                  # 1 tok, no bigrams
                     "",                   # 0 tok -> dropped
                     "w w w w"]})          # 4 tok, 1 distinct, top=4;
                                            # bigrams: ww x3 -> 1 distinct
        out = repetition_stats_batch(t).to_pandas().set_index("doc_id")
        assert list(out.index) == [1, 2, 4]
        assert out.loc[1].tolist() == [5, 2, 3, 4, 2]
        assert out.loc[2].tolist() == [1, 1, 1, 0, 0]
        assert out.loc[4].tolist() == [4, 1, 4, 3, 1]

    def test_batchsize_invariance(self, ray_session):
        """Map-only op: identical output under any batch/block layout."""
        from biobloom_ray.pipelines.analytics import repetition_stats
        a = repetition_stats("/root/testdata/sf0.001")
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet").repartition(7)
        from biobloom_ray.stages.textstats import repetition_stats_batch
        b = (ds.map_batches(repetition_stats_batch, batch_format="pyarrow",
                            batch_size=13)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b[a.columns])


class TestDecontaminate:
    def test_bench_docs_excluded_and_flags_exact(self, ray_session, tmp_path):
        """Hand-built corpus: doc 0 (id 0 % anything == 0) is the
        benchmark; docs 3 and 6 share trigrams with it, doc 1 does not;
        a short doc (< 3 tokens) is absent from the output."""
        import pyarrow.parquet as pq
        docs = pa.table({
            "doc_id": [0, 1, 3, 5, 6],
            "text": ["the cat sat on the mat",
                     "dogs bark loudly at night",
                     "he saw the cat sat on a hat",
                     "too short",
                     "cat sat on nothing else matters"],
            "lang": ["en"] * 5, "source": ["s"] * 5,
            "n_chars": [22, 25, 27, 9, 30]})
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(docs, d / "documents.parquet")
        from biobloom_ray.pipelines.analytics import decontaminate
        out = decontaminate(str(d)).set_index("doc_id")
        assert list(out.index) == [1, 3, 6]   # 0 = bench, 5 too short
        assert out.loc[1, "n_contam"] == 0
        assert out.loc[1, "contaminated"] == 0
        # doc 3: "the cat sat" + "cat sat on" overlap the benchmark
        assert out.loc[3, "n_contam"] == 2
        assert out.loc[3, "contaminated"] == 1
        # doc 6: "cat sat on" overlaps
        assert out.loc[6, "n_contam"] == 1
        assert out.loc[6, "n_trigrams"] == 4

    def test_bloom_fp_cannot_false_flag(self, ray_session, tmp_path, monkeypatch):
        """Force the Bloom prefilter to 100% positives (1-bit-per-entry
        sizing is impossible, so patch FPR to ~1): the exact verify must
        still produce zero contamination for disjoint vocabulary."""
        import pyarrow.parquet as pq
        import biobloom_ray.pipelines.analytics as A
        monkeypatch.setattr(A, "DECON_BLOOM_FPR", 0.9999)
        docs = pa.table({
            "doc_id": [0, 1],
            "text": ["alpha beta gamma delta", "one two three four five"],
            "lang": ["en"] * 2, "source": ["s"] * 2, "n_chars": [22, 23]})
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(docs, d / "documents.parquet")
        out = A.decontaminate(str(d))
        assert out.contaminated.sum() == 0
        assert out.n_contam.sum() == 0


def test_repeated_substrings_tiers_agree(ray_session, monkeypatch):
    """Driver-combine tier and native groupby+join tier are bit-identical
    (same convention as every scale gate in the repo)."""
    import biobloom_ray.pipelines.analytics as A
    a = A.repeated_substrings("/root/testdata/sf0.001")
    monkeypatch.setattr(A, "REPEAT_DRIVER_MAX_ROWS", 0)
    b = A.repeated_substrings("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert a.n_repeated.sum() > 0  # the fixture's tiny vocab guarantees repeats
