"""Sketch unit tests — translated from the reference's test strategy
(Tests/BloomFilterTests.cpp:44-117 for Bloom round-trip/size/membership;
FIXTURES.md F5/F7 for merge associativity and error bounds)."""

import numpy as np
import pytest

from biobloom_ray.hashing import hash_strings, shingle_hashes
from biobloom_ray.sketches import (
    HLL,
    KLL,
    BloomFilter,
    CountMinSketch,
    calc_approx_fpr,
    calc_optimal_hash_num,
    calc_optimal_size,
)


def _hashes(words):
    h1, h2, _ = shingle_hashes(words, 1)  # not used; keep simple
    return h1, h2


def _word_hashes(words):
    # one (h1, h2) pair per whole word
    from biobloom_ray.hashing import DEFAULT_SEED, splitmix64, U64
    h1 = hash_strings(words)
    h2 = splitmix64(h1 ^ U64(0xDEADBEEF)) | U64(1)
    return h1, h2


class TestBloom:
    def test_insert_contains(self):
        bf = BloomFilter.for_entries(1000, 0.01, kmer_size=4)
        pos = [f"present{i}" for i in range(500)]
        neg = [f"absent{i}" for i in range(500)]
        h1, h2 = _word_hashes(pos)
        bf.insert(h1, h2)
        assert bf.contains(h1, h2).all()
        n1, n2 = _word_hashes(neg)
        fp = bf.contains(n1, n2).mean()
        assert fp <= 0.05  # bound check below is the real FPR test

    def test_observed_fpr_below_configured(self):
        # BASELINE metric: observed FPR <= configured bound at chosen m/n, h
        fpr = 0.0078125
        n = 20000
        bf = BloomFilter.for_entries(n, fpr, kmer_size=4)
        h1, h2 = _word_hashes([f"ref{i}" for i in range(n)])
        bf.insert(h1, h2)
        q1, q2 = _word_hashes([f"neg{i}" for i in range(100000)])
        observed = bf.contains(q1, q2).mean()
        assert observed <= fpr * 1.15  # sampling slack; realized <= configured
        assert bf.fpr_realized() <= fpr * 1.15

    def test_size_multiple_of_64_and_roundtrip(self):
        bf = BloomFilter.for_entries(777, 0.02, kmer_size=5, filter_id="t")
        assert bf.m % 64 == 0
        assert len(bf.to_bytes()) == bf.m // 8
        h1, h2 = _word_hashes([f"x{i}" for i in range(100)])
        bf.insert(h1, h2)
        clone = BloomFilter.deserialize(bf.serialize())
        assert np.array_equal(clone.words, bf.words)
        assert clone.contains(h1, h2).all()
        assert clone.filter_id == "t"
        assert clone.n_distinct == bf.n_distinct

    def test_merge_associative_commutative(self):
        words = [f"w{i}" for i in range(3000)]
        parts = [words[:1000], words[1000:2000], words[2000:]]

        def build(stream):
            bf = BloomFilter(m=64 * 256, hash_num=4, kmer_size=4)
            h1, h2 = _word_hashes(stream)
            bf.insert(h1, h2)
            return bf

        a, b, c = (build(p) for p in parts)
        ab_c = build(parts[0]).merge(build(parts[1])).merge(build(parts[2]))
        a_bc = build(parts[0]).merge(build(parts[1]).merge(build(parts[2])))
        c_ba = build(parts[2]).merge(build(parts[1])).merge(build(parts[0]))
        assert np.array_equal(ab_c.words, a_bc.words)
        assert np.array_equal(ab_c.words, c_ba.words)
        whole = build(words)
        assert np.array_equal(ab_c.words, whole.words)

    def test_merge_incompatible_raises(self):
        a = BloomFilter(m=640, hash_num=3, kmer_size=4)
        b = BloomFilter(m=1280, hash_num=3, kmer_size=4)
        with pytest.raises(ValueError):
            a.merge(b)

    def test_distinct_redundant_counters(self):
        bf = BloomFilter(m=64 * 4096, hash_num=4, kmer_size=4)
        h1, h2 = _word_hashes(["a", "b", "c", "a", "b"])
        d, r = bf.insert(h1, h2)
        assert (d, r) == (3, 2)
        d2, r2 = bf.insert(*_word_hashes(["a", "d"]))
        assert (d2, r2) == (1, 1)
        assert bf.n_distinct == 4
        assert bf.n_redundant == 3
        assert bf.n_inserted == 7

    def test_sizing_formulas(self):
        # h = -log(fpr)/log(2) floored (BloomFilterInfo.h:73-76)
        assert calc_optimal_hash_num(0.0078125) == 7
        assert calc_optimal_hash_num(0.02) == 5
        m = calc_optimal_size(10000, 0.01, 5)
        assert m % 64 == 0
        # realized fpr at that size should be near target
        assert calc_approx_fpr(m, 10000, 5) <= 0.012


class TestHLL:
    def test_error_bound(self):
        hll = HLL(p=12)
        n = 200000
        hll.update(hash_strings([f"item{i}" for i in range(n)]))
        est = hll.estimate()
        rel = abs(est - n) / n
        assert rel < 3 * hll.relative_error  # 3 sigma of 1.04/sqrt(m)

    def test_duplicates_dont_count(self):
        hll = HLL(p=12)
        hs = hash_strings([f"x{i % 100}" for i in range(10000)])
        hll.update(hs)
        assert abs(hll.estimate() - 100) < 10

    def test_merge_bit_exact_any_order(self):
        streams = [[f"s{j}_{i}" for i in range(5000)] for j in range(3)]

        def build(st):
            h = HLL(p=12)
            h.update(hash_strings(st))
            return h

        ab_c = build(streams[0]).merge(build(streams[1])).merge(build(streams[2]))
        a_bc = build(streams[0]).merge(build(streams[1]).merge(build(streams[2])))
        c_ba = build(streams[2]).merge(build(streams[1])).merge(build(streams[0]))
        assert np.array_equal(ab_c.registers, a_bc.registers)
        assert np.array_equal(ab_c.registers, c_ba.registers)
        whole = build(streams[0] + streams[1] + streams[2])
        assert np.array_equal(ab_c.registers, whole.registers)

    def test_roundtrip(self):
        h = HLL(p=10)
        h.update(hash_strings(["a", "b", "c"]))
        h2 = HLL.deserialize(h.serialize())
        assert np.array_equal(h.registers, h2.registers)
        assert h2.estimate() == h.estimate()

    def test_small_range(self):
        h = HLL(p=12)
        h.update(hash_strings(["one", "two", "three"]))
        assert abs(h.estimate() - 3) < 0.5


class TestCMS:
    def test_overcount_bound(self):
        # CMS guarantee: est >= true, and est <= true + eps*N w.p. 1-delta
        cms = CountMinSketch.for_error(eps=0.005, delta=0.01)
        rng_items = []
        true = {}
        for i in range(200):
            cnt = 1 + (i * 7) % 50
            true[f"t{i}"] = cnt
            rng_items += [f"t{i}"] * cnt
        keys = hash_strings(rng_items)
        cms.update(keys)
        qkeys = hash_strings([f"t{i}" for i in range(200)])
        est = cms.query(qkeys)
        tv = np.array([true[f"t{i}"] for i in range(200)])
        assert (est >= tv).all()
        overshoot = (est - tv)
        assert (overshoot <= cms.eps * cms.n).mean() >= 0.99

    def test_merge_bit_exact_any_order(self):
        def build(lo, hi):
            c = CountMinSketch(depth=4, width=512)
            c.update(hash_strings([f"k{i % 37}" for i in range(lo, hi)]))
            return c

        ab_c = build(0, 100).merge(build(100, 200)).merge(build(200, 300))
        a_bc = build(0, 100).merge(build(100, 200).merge(build(200, 300)))
        c_ba = build(200, 300).merge(build(100, 200)).merge(build(0, 100))
        assert np.array_equal(ab_c.counts, a_bc.counts)
        assert np.array_equal(ab_c.counts, c_ba.counts)
        whole = build(0, 300)
        assert np.array_equal(ab_c.counts, whole.counts)

    def test_roundtrip(self):
        c = CountMinSketch(depth=3, width=128)
        c.update(hash_strings(["x", "y", "x"]))
        c2 = CountMinSketch.deserialize(c.serialize())
        assert np.array_equal(c.counts, c2.counts)
        assert c2.n == 3


class TestKLL:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(42)
        data = rng.normal(0, 1, 100000)
        kll = KLL(k=200)
        kll.update(data)
        s = np.sort(data)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            est = kll.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.025, (q, est, true_rank)

    def test_merge_preserves_accuracy(self):
        rng = np.random.default_rng(7)
        parts = [rng.uniform(0, 1, 30000) for _ in range(4)]
        sk = [KLL(k=200, seed=i) for i in range(4)]
        for s, p in zip(sk, parts):
            s.update(p)
        merged = sk[0].merge(sk[1]).merge(sk[2]).merge(sk[3])
        allv = np.sort(np.concatenate(parts))
        assert merged.n == len(allv)
        for q in (0.1, 0.5, 0.9):
            est = merged.quantile(q)
            true_rank = np.searchsorted(allv, est) / len(allv)
            assert abs(true_rank - q) < 0.03

    def test_exact_for_small_n(self):
        kll = KLL(k=200)
        kll.update(np.arange(100, dtype=float))
        assert kll.quantile(0.0) == 0.0
        assert kll.quantile(1.0) == 99.0
        assert abs(kll.quantile(0.5) - 49.5) <= 1.0

    def test_roundtrip(self):
        kll = KLL(k=64)
        kll.update(np.arange(10000, dtype=float))
        k2 = KLL.deserialize(kll.serialize())
        assert k2.n == kll.n
        assert k2.quantile(0.5) == kll.quantile(0.5)

    def test_determinism(self):
        a, b = KLL(k=128), KLL(k=128)
        data = np.arange(50000, dtype=float)
        a.update(data)
        b.update(data)
        assert a.quantile(0.37) == b.quantile(0.37)


class TestMisraGries:
    def test_exact_regime_any_merge_order(self):
        import numpy as np

        from biobloom_ray.sketches.misra_gries import MisraGries

        rng = np.random.default_rng(7)
        keys = rng.integers(0, 50, size=5000).astype(np.uint64)
        true = {int(u): int(c) for u, c in
                zip(*np.unique(keys, return_counts=True))}
        parts = np.array_split(keys, 7)
        # capacity >= distinct -> exact under ANY merge order
        def build(order):
            accs = []
            for p in parts:
                m = MisraGries(capacity=64)
                m.update(p)
                accs.append(m)
            acc = accs[order[0]]
            for i in order[1:]:
                acc.merge(accs[i])
            return acc

        a = build(list(range(7)))
        b = build([3, 6, 0, 5, 1, 4, 2])
        qa = a.query(np.arange(50, dtype=np.uint64))
        qb = b.query(np.arange(50, dtype=np.uint64))
        assert (qa == qb).all()
        for u, c in true.items():
            assert qa[u] == c
        assert a.error_bound() == 5000 // 65

    def test_undercount_bound_sketchy_regime(self):
        import numpy as np

        from biobloom_ray.sketches.misra_gries import MisraGries

        rng = np.random.default_rng(11)
        # zipf-ish skew: heavy keys must survive a tiny summary
        keys = (rng.zipf(1.5, size=20000) % 1000).astype(np.uint64)
        uniq, cnt = np.unique(keys, return_counts=True)
        m = MisraGries(capacity=8)
        for chunk in np.array_split(keys, 13):
            m.update(chunk)
        est = m.query(uniq)
        assert (est <= cnt).all()  # MG never over-counts
        assert (cnt - est <= m.error_bound()).all()
        # the single heaviest key is always tracked when its true count
        # exceeds the bound
        top = np.argmax(cnt)
        if cnt[top] > m.error_bound():
            assert est[top] > 0

    def test_serialize_roundtrip(self):
        import numpy as np

        from biobloom_ray.sketches.misra_gries import MisraGries

        m = MisraGries(capacity=16)
        m.update(np.arange(40, dtype=np.uint64),
                 np.arange(1, 41, dtype=np.int64))
        m2 = MisraGries.deserialize(m.serialize())
        assert m2.capacity == m.capacity and m2.n == m.n
        assert (np.sort(m2.keys) == np.sort(m.keys)).all()
        q = np.arange(40, dtype=np.uint64)
        assert (m.query(q) == m2.query(q)).all()


class TestSketchSetOps:
    def test_setops_estimates_within_bounds(self, ray_session):
        import biobloom_ray.pipelines.analytics as A

        sf = "/root/testdata/sf0.01"
        est = A.sketch_setops_report(sf).iloc[0]
        exact = A.event_user_setops(sf).iloc[0]
        # HLL p=12 -> ~1.6% relative error; allow 5 sigma
        tol = 5 * 1.04 / (2 ** 6)
        assert abs(est.est_a - exact.n_a) <= tol * exact.n_a + 2
        assert abs(est.est_b - exact.n_b) <= tol * exact.n_b + 2
        n_union = exact.n_a + exact.n_b - exact.n_both
        assert abs(est.est_union - n_union) <= tol * n_union + 2
        # inclusion-exclusion compounds three estimates
        assert abs(est.est_inter_hll - exact.n_both) \
            <= 3 * tol * n_union + 3
        # Bloom AND has no false negatives: the occupancy estimate
        # must not UNDER-shoot the true intersection beyond estimator
        # noise, and stays near it on a sparse filter
        assert est.est_inter_bloom >= exact.n_both * 0.9
        assert est.est_inter_bloom <= exact.n_both * 1.2 + 5

    def test_bloom_intersect_no_false_negatives(self):
        import numpy as np

        from biobloom_ray.hashing import splitmix64
        from biobloom_ray.sketches.bloom import BloomFilter

        rng = np.random.default_rng(3)
        a = rng.choice(10000, 400, replace=False).astype(np.uint64)
        b = np.concatenate([a[:150],
                            (rng.choice(10000, 250, replace=False)
                             + 20000).astype(np.uint64)])
        C2 = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            fa = BloomFilter(m=1 << 14, hash_num=4, kmer_size=0)
            fa.insert(splitmix64(a), splitmix64(a ^ C2))
            fb = BloomFilter(m=1 << 14, hash_num=4, kmer_size=0)
            fb.insert(splitmix64(b), splitmix64(b ^ C2))
            inter = fa.intersect(fb)
            common = a[:150]
            hits = inter.contains(splitmix64(common),
                                  splitmix64(common ^ C2))
        assert hits.all()  # A∩B always contained
        # Swamidass–Baldi on a fresh filter of known cardinality
        est = fa.estimate_cardinality()
        assert abs(est - 400) <= 0.05 * 400


class TestGroupedTDigest:
    def test_lang_quantiles_within_band(self, ray_session):
        import duckdb

        import biobloom_ray.pipelines.analytics as A

        sf = "/root/testdata/sf0.01"
        est = A.lang_nchars_tdigest(sf).set_index("lang")
        exact = duckdb.sql(
            f"""SELECT lang,
             PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_chars) p50,
             PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_chars) p90
             FROM '{sf}/documents.parquet' GROUP BY lang""").df()
        for _, r in exact.iterrows():
            e = est.loc[r.lang]
            # t-digest mid-quantile relative error band (delta=200):
            # generous 5% of the value plus a small absolute floor
            assert abs(e.p50_est - r.p50) <= 0.05 * r.p50 + 5
            assert abs(e.p90_est - r.p90) <= 0.05 * r.p90 + 5
