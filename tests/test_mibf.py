"""Multi-index Bloom filter (T5/T6) — build determinism, rank math,
classification accuracy, saturation accounting."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from biobloom_ray.hashing import shingle_hashes
from biobloom_ray.pages import generate_pages, generate_ref_corpora
from biobloom_ray.pipelines.mibf import build_mibf, classify_mibf
from biobloom_ray.sketches.mibf import ID_MASK, MIBloomFilter, SATURATED


@pytest.fixture(scope="module")
def mibf(ray_session):
    ref = ray.data.from_arrow(generate_ref_corpora(docs_per_lang=60))
    return build_mibf(ref, text_col="doc", label_col="filter_id",
                      kmer_size=8, hash_num=3, occupancy=0.5)


class TestRankMath:
    def test_rank_counts_set_bits(self):
        f = MIBloomFilter(m=256, hash_num=2, kmer_size=4)
        pos = np.array([[3, 70], [64, 255]], dtype=np.uint64)
        f.set_bits(pos)
        f.build_rank()
        assert f.n_slots == 4
        r = f.rank(np.array([[3, 64, 70, 255]], dtype=np.uint64))[0]
        assert r.tolist() == [0, 1, 2, 3]


class TestBuild:
    def test_id_table_and_occupancy(self, mibf):
        assert mibf.id_names == ["de", "en", "es", "fr"]
        occ = mibf.rank_acc[-1] / mibf.m
        assert 0.2 < occ < 0.7
        # every slot owned (pass 2 assigns all set bits)
        assert ((mibf.ids & ID_MASK) != 0).all()

    def test_deterministic_rebuild(self, ray_session, mibf):
        ref = ray.data.from_arrow(generate_ref_corpora(docs_per_lang=60))
        again = build_mibf(ref, text_col="doc", label_col="filter_id",
                           kmer_size=8, hash_num=3, occupancy=0.5)
        assert np.array_equal(again.words, mibf.words)
        assert np.array_equal(again.ids, mibf.ids)  # order-free ownership

    def test_deterministic_under_different_partitioning(self, ray_session,
                                                        mibf):
        # different batch size AND different block layout → the bid
        # stream arrives in a different order with different coalescing;
        # the sharded min-reduce must still pick identical winners
        tbl = generate_ref_corpora(docs_per_lang=60)
        ref = ray.data.from_arrow(tbl).repartition(7)
        again = build_mibf(ref, text_col="doc", label_col="filter_id",
                           kmer_size=8, hash_num=3, occupancy=0.5,
                           batch_size=97)
        assert np.array_equal(again.words, mibf.words)
        assert np.array_equal(again.ids, mibf.ids)

    def test_some_saturation_on_shared_vocab(self, mibf):
        # corpora share `common###` words → contested slots exist, and
        # the losing (frame, id) marks saturation
        assert mibf.pop_saturated() > 0
        assert mibf.pop_saturated() < len(mibf.ids)

    def test_frame_probs_sane(self, mibf):
        p = mibf.frame_probs()
        used = p[1:len(mibf.id_names) + 1]
        assert (used > 0).all() and (used < 1).all()


class TestClassify:
    def test_assigns_langs(self, ray_session, mibf):
        pages = ray.data.from_arrow(generate_pages(1500, seed=42))
        out = classify_mibf(pages, mibf, min_fpr=0.01).to_pandas()
        pos = out[out.lang != "zz"]
        ok = (pos.label == pos.lang) | (pos.label == "multiMatch")
        assert ok.mean() > 0.9
        neg = out[out.lang == "zz"]
        assert (neg.label == "noMatch").mean() > 0.98

    def test_counts_monotone(self, ray_session, mibf):
        pages = ray.data.from_arrow(generate_pages(300, seed=1))
        out = classify_mibf(pages, mibf).to_pandas()
        assert (out.best_count >= out.second_count).all()
        matched = out[out.label != "noMatch"]
        assert (matched.best_count > 0).all()

    def test_multi_thresh_widens_multimatch(self, ray_session, mibf):
        pages = ray.data.from_arrow(generate_pages(500, seed=2))
        strict = classify_mibf(pages, mibf, multi_thresh=0).to_pandas()
        loose = classify_mibf(pages, mibf, multi_thresh=10 ** 6).to_pandas()
        assert (loose.label == "multiMatch").sum() >= (strict.label == "multiMatch").sum()

    def test_roundtrip_preserves_answers(self, ray_session, mibf):
        clone = MIBloomFilter.deserialize(mibf.serialize())
        pages = ray.data.from_arrow(generate_pages(200, seed=3))
        a = classify_mibf(pages, mibf).to_pandas()
        b = classify_mibf(pages, clone).to_pandas()
        assert (a.label.values == b.label.values).all()


class TestPairedClassify:
    """Paired-mate mode (``MIBFClassifier.hpp:409-617``): supports and
    trials sum across the two mates before the binomial gate."""

    def _mate_split(self, n, seed):
        tbl = generate_pages(n, seed=seed).to_pandas()
        half = tbl.text.str.len() // 2
        t1 = [t[:h] for t, h in zip(tbl.text, half)]
        t2 = [t[h:] for t, h in zip(tbl.text, half)]
        return pa.table({"doc_id": pa.array(range(n)),
                         "lang": pa.array(tbl.lang),
                         "text_1": pa.array(t1), "text_2": pa.array(t2)})

    def test_paired_assigns_langs(self, ray_session, mibf):
        pairs = ray.data.from_arrow(self._mate_split(1000, seed=7))
        out = classify_mibf(pairs, mibf, min_fpr=0.01, text_col="text_1",
                            text_col2="text_2").to_pandas()
        pos = out[out.lang != "zz"]
        ok = (pos.label == pos.lang) | (pos.label == "multiMatch")
        assert ok.mean() > 0.9
        neg = out[out.lang == "zz"]
        assert (neg.label == "noMatch").mean() > 0.98

    def test_paired_combines_counts(self, ray_session, mibf):
        """best_count of the pair ≥ best_count of either mate alone, and
        an empty second mate degrades exactly to single-mate evidence."""
        pairs_tbl = self._mate_split(300, seed=8)
        pairs = ray.data.from_arrow(pairs_tbl)
        both = classify_mibf(pairs, mibf, text_col="text_1",
                             text_col2="text_2").to_pandas()
        m1 = classify_mibf(ray.data.from_arrow(
            pairs_tbl.select(["doc_id", "text_1"])), mibf,
            text_col="text_1").to_pandas()
        merged = both.merge(m1, on="doc_id", suffixes=("_p", "_1"))
        assert (merged.best_count_p >= merged.best_count_1).all()

        empty2 = pairs_tbl.set_column(
            pairs_tbl.schema.get_field_index("text_2"), "text_2",
            pa.array([""] * len(pairs_tbl)))
        only1 = classify_mibf(ray.data.from_arrow(empty2), mibf,
                              text_col="text_1",
                              text_col2="text_2").to_pandas()
        assert (only1.sort_values("doc_id").label.values ==
                m1.sort_values("doc_id").label.values).all()


class TestSpacedSeedMIBF:
    def test_spaced_seed_build_and_classify(self, ray_session):
        SEEDS = ["110100101101", "101101001011"]
        ref = ray.data.from_arrow(generate_ref_corpora(docs_per_lang=60))
        f = build_mibf(ref, text_col="doc", label_col="filter_id",
                       spaced_seeds=SEEDS, occupancy=0.5)
        assert f.spaced_seeds == SEEDS
        assert f.hash_num == 2 and f.kmer_size == 12
        pages = ray.data.from_arrow(generate_pages(800, seed=6))
        out = classify_mibf(pages, f, min_fpr=0.01).to_pandas()
        pos = out[out.lang != "zz"]
        ok = (pos.label == pos.lang) | (pos.label == "multiMatch")
        assert ok.mean() > 0.85
        neg = out[out.lang == "zz"]
        assert (neg.label == "noMatch").mean() > 0.95
        # round-trip keeps the seeds and the answers
        clone = MIBloomFilter.deserialize(f.serialize())
        assert clone.spaced_seeds == SEEDS
        again = classify_mibf(pages, clone).to_pandas()
        assert (again.label.values == out.label.values).all()


class TestClusterPaths:
    def test_sharded_build_matches_driver_reduce(self, ray_session, mibf,
                                                 monkeypatch):
        """The large-filter cluster paths (tree OR, slot-sharded
        min-reduce, groupby saturation) must build a bit-identical
        filter to the small-filter driver paths."""
        import biobloom_ray.pipelines.mibf as M

        monkeypatch.setattr(M, "DRIVER_REDUCE_MAX_SLOTS", 0)
        monkeypatch.setattr(M, "DRIVER_REDUCE_MAX_M", 0)
        ref = ray.data.from_arrow(generate_ref_corpora(docs_per_lang=60))
        big_path = build_mibf(ref, text_col="doc", label_col="filter_id",
                              kmer_size=8, hash_num=3, occupancy=0.5)
        assert np.array_equal(big_path.words, mibf.words)
        assert np.array_equal(big_path.ids, mibf.ids)
