"""Web-corpus cleaning stages (stages/webclean.py): PII redaction,
Gopher quality gate, cross-document boilerplate removal, and the
corpus-internal bigram LM score — kernel unit tests against
hand-computed expectations plus tier-parity checks (driver/broadcast
tier vs forced-cluster tier must be bit-identical, same convention as
every scale gate in the repo)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SMALL = "/root/testdata/sf0.001"


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


class TestPiiRedact:
    def test_kernel_known_strings(self):
        from biobloom_ray.stages.webclean import pii_redact_batch

        batch = pa.table({
            "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "props": pa.array([
                "mail bob.smith+x@example.co.uk now",
                "from 192.168.0.1 port 8080",
                "no pii here",
                "a1b22c333d",
            ]),
        })
        out = pii_redact_batch(batch).to_pydict()
        assert out["props_redacted"] == [
            "mail <EMAIL> now",
            "from <IP> port <NUM>",
            "no pii here",
            "a<NUM>b<NUM>c<NUM>d",
        ]
        # digit-run counts are PRE-redaction (the IP row's four octets
        # + the port = 5 runs even though the output shows one <NUM>)
        assert out["n_digit_runs"] == [0, 5, 0, 3]

    def test_email_eats_digits_first(self):
        """Order matters: the email pattern must consume its digits
        before the digit-run pass ever sees them."""
        from biobloom_ray.stages.webclean import pii_redact_batch

        batch = pa.table({
            "event_id": pa.array([0], type=pa.int64()),
            "props": pa.array(["x99@y99.com"]),
        })
        out = pii_redact_batch(batch).to_pydict()
        assert out["props_redacted"] == ["<EMAIL>"]


class TestGopherFlags:
    def test_kernel_hand_computed(self):
        from biobloom_ray.stages.webclean import gopher_flags_batch

        good = " ".join(["the", "and", "for"] + ["word"] * 20)
        short = "the and tiny"                      # < 20 words
        no_stop = " ".join(["xyzzy"] * 25)          # 0 stopword hits
        symbols = " ".join(["$$$"] * 18 + ["the", "and"] + ["ok"] * 5)
        batch = _docs_table([good, short, no_stop, symbols, ""])
        out = gopher_flags_batch(batch).to_pydict()
        assert out["n_words"] == [23, 3, 25, 25, 0]
        assert out["n_stop"] == [3, 2, 0, 2, 0]
        assert out["n_alpha_words"] == [23, 3, 25, 7, 0]
        assert out["flag_word_count"] == [1, 0, 1, 1, 0]
        assert out["flag_stopwords"] == [1, 1, 0, 1, 0]
        # symbols doc: 7 alpha of 25 words -> 28% < 80%
        assert out["flag_alpha_words"] == [1, 1, 1, 0, 0]
        assert out["pass_gopher"] == [1, 0, 0, 0, 0]

    def test_mean_word_len_bounds(self):
        from biobloom_ray.stages.webclean import gopher_flags_batch

        # 25 single-char words -> mean 1 < 2; 25 11-char words -> 11 > 10
        too_short = " ".join(["a"] * 25)
        too_long = " ".join(["abcdefghijk"] * 25)
        ok = " ".join(["abc"] * 25)
        out = gopher_flags_batch(_docs_table([too_short, too_long, ok]))
        assert out["flag_mean_word_len"].to_pylist() == [0, 0, 1]


class TestBoilerplateRemoval:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        """Interval-overlay removal equals a per-doc brute-force scan
        over the same frequent-trigram rule on handcrafted docs."""
        import biobloom_ray.pipelines.analytics as A

        header = "subscribe to newsletter"
        texts = [
            f"{header} alpha beta gamma",
            f"delta {header} epsilon",
            f"zeta eta {header}",
            "theta iota kappa lambda mu",
            "one two",
        ]
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(_docs_table(texts), d / "documents.parquet")
        out = A.remove_boilerplate_ngrams(str(d))

        # brute force: trigram -> distinct docs, cover, rejoin
        toks = [t.split() for t in texts]
        from collections import defaultdict
        docs_of = defaultdict(set)
        for i, ts in enumerate(toks):
            for j in range(len(ts) - 2):
                docs_of[tuple(ts[j:j + 3])].add(i)
        freq = {g for g, s in docs_of.items() if len(s) >= 3}
        want_clean, want_removed = [], []
        for ts in toks:
            cov = np.zeros(len(ts), dtype=bool)
            for j in range(len(ts) - 2):
                if tuple(ts[j:j + 3]) in freq:
                    cov[j:j + 3] = True
            want_clean.append(" ".join(t for t, c in zip(ts, cov) if not c))
            want_removed.append(int(cov.sum()))
        assert out.text_clean.tolist() == want_clean
        assert out.n_removed.tolist() == want_removed
        assert sum(want_removed) > 0  # the header really was removed

    def test_tiers_agree(self, ray_session, monkeypatch):
        import biobloom_ray.pipelines.analytics as A

        fast = A.remove_boilerplate_ngrams(SF_SMALL)
        monkeypatch.setattr(A, "BOILERPLATE_DRIVER_MAX_ROWS", 0)
        slow = A.remove_boilerplate_ngrams(SF_SMALL)
        pd.testing.assert_frame_equal(fast, slow[fast.columns])
        # tiny fixture vocab guarantees cross-doc trigram repeats
        assert fast.n_removed.sum() > 0


class TestBigramLM:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        import biobloom_ray.pipelines.analytics as A

        texts = ["a b a b c", "a b c", "c a", "solo"]
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(_docs_table(texts), d / "documents.parquet")
        out = A.bigram_lm_scores(str(d))

        from collections import Counter
        bgs = [(t.split()[i], t.split()[i + 1])
               for t in texts for i in range(len(t.split()) - 1)]
        c_g, c_p = Counter(bgs), Counter(w1 for w1, _ in bgs)
        rows = {}
        for t, did in zip(texts, range(len(texts))):
            ts = t.split()
            if len(ts) < 2:
                continue
            cnts = [c_g[(ts[i], ts[i + 1])] for i in range(len(ts) - 1)]
            lps = [np.log(c_g[(ts[i], ts[i + 1])] / c_p[ts[i]])
                   for i in range(len(ts) - 1)]
            rows[did] = (len(cnts), sum(cnts), min(cnts),
                         round(float(np.mean(lps)), 6))
        assert out.doc_id.tolist() == sorted(rows)
        for _, r in out.iterrows():
            nb, sc, mc, lp = rows[r.doc_id]
            assert (r.n_bigrams, r.sum_bigram_cnt, r.min_bigram_cnt) \
                == (nb, sc, mc)
            assert r.avg_logprob_r6 == pytest.approx(lp, abs=1e-6)

    def test_tiers_agree(self, ray_session, monkeypatch):
        import biobloom_ray.pipelines.analytics as A

        fast = A.bigram_lm_scores(SF_SMALL)
        monkeypatch.setattr(A, "BIGRAM_BROADCAST_MAX_ROWS", 0)
        slow = A.bigram_lm_scores(SF_SMALL)
        for c in ("doc_id", "n_bigrams", "sum_bigram_cnt",
                  "min_bigram_cnt"):
            assert (fast[c].to_numpy() == slow[c].to_numpy()).all(), c
        assert np.allclose(fast.avg_logprob_r6, slow.avg_logprob_r6,
                           rtol=0, atol=1e-6)
