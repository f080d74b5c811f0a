"""Checkpoint/resume test (FIXTURES.md F6): kill after partition i, re-run,
byte-identical output, no recompute of finished partitions."""

import os

import pyarrow.parquet as pq
import pytest

import ray.data

from biobloom_ray.config import BuildConfig, CategorizeConfig
from biobloom_ray.pages import generate_pages, generate_ref_corpora, pages_path
from biobloom_ray.pipelines import build_filters
from biobloom_ray.pipelines.resumable import run_partitioned_categorize
from biobloom_ray.state.lineage import completed_partitions, read_manifest


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    input_dir = pages_path(4000, seed=9, cache_dir=str(
        tmp_path_factory.mktemp("pages")), n_files=4)
    ref = ray.data.from_arrow(generate_ref_corpora(docs_per_lang=30))
    built = build_filters(ref, text_col="doc", label_col="filter_id",
                          cfg=BuildConfig(kmer_size=8, batch_size=1024))
    bank = [built[f]["filter"] for f in sorted(built)]
    cfg = CategorizeConfig(mode="std", batch_size=512)
    return input_dir, bank, cfg


def _all_rows(out_dir):
    import pandas as pd

    frames = []
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not name.startswith("part="):
            continue
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                frames.append(pq.read_table(os.path.join(pdir, f)).to_pandas())
    return (pd.concat(frames).sort_values("url").reset_index(drop=True)
            if frames else pd.DataFrame())


def test_kill_and_resume_byte_identical(setup, tmp_path):
    input_dir, bank, cfg = setup
    out_a = str(tmp_path / "killed_run")
    out_b = str(tmp_path / "clean_run")

    # simulate a crash after 2 fresh partitions
    r1 = run_partitioned_categorize(input_dir, out_a, bank, cfg, fail_after=2)
    assert r1["completed"] == [0, 1]
    assert completed_partitions(out_a) == {0, 1}

    # record mtimes of finished outputs
    p0 = os.path.join(out_a, "part=0")
    mtimes = {f: os.path.getmtime(os.path.join(p0, f)) for f in os.listdir(p0)}

    # resume: skips 0/1, completes 2/3
    r2 = run_partitioned_categorize(input_dir, out_a, bank, cfg)
    assert r2["skipped"] == [0, 1]
    assert r2["completed"] == [2, 3]
    assert completed_partitions(out_a) == {0, 1, 2, 3}
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(p0, f)) == m, "partition 0 was recomputed"

    # uninterrupted reference run → byte-identical rows
    r3 = run_partitioned_categorize(input_dir, out_b, bank, cfg)
    assert r3["completed"] == [0, 1, 2, 3]
    a = _all_rows(out_a)
    b = _all_rows(out_b)
    assert a.equals(b)

    # manifests carry lineage
    m = read_manifest(out_a, 2)
    assert m.complete and m.row_count == 1000
    assert m.inputs and m.inputs[0].endswith(".parquet")


def test_crashed_partition_files_never_mix(setup, tmp_path):
    """A kill mid-partition leaves files only in part=<i>.tmp/; the
    retry discards them, so output rows can never duplicate."""
    input_dir, bank, cfg = setup
    out = str(tmp_path / "crashed_mid_write")

    # simulate a mid-write crash: a stale tmp dir with a bogus file
    tmpdir = os.path.join(out, "part=0.tmp")
    os.makedirs(tmpdir)
    with open(os.path.join(tmpdir, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")

    r = run_partitioned_categorize(input_dir, out, bank, cfg)
    assert r["completed"] == [0, 1, 2, 3]
    assert not os.path.exists(tmpdir)           # stale attempt removed

    clean = str(tmp_path / "clean_reference")
    run_partitioned_categorize(input_dir, clean, bank, cfg)
    a, b = _all_rows(out), _all_rows(clean)
    assert len(a) == len(b)
    assert a.equals(b)                           # no duplicated rows

    # published-but-unmanifested partition (killed between rename and
    # manifest): data is reused, not rewritten alongside itself
    out2 = str(tmp_path / "published_no_manifest")
    run_partitioned_categorize(input_dir, out2, bank, cfg, fail_after=1)
    manifest = os.path.join(out2, "part=0", "_lineage.json")
    assert os.path.exists(manifest)
    os.remove(manifest)
    p0 = os.path.join(out2, "part=0")
    files_before = sorted(f for f in os.listdir(p0) if f.endswith(".parquet"))
    run_partitioned_categorize(input_dir, out2, bank, cfg)
    # data files reused as-is; only the manifest is recreated
    assert sorted(f for f in os.listdir(p0)
                  if f.endswith(".parquet")) == files_before
    assert len(_all_rows(out2)) == len(b)


def _doc_fragments(tmpdir, n_frags=4):
    """Split the sf0.01 documents (doc_id-sorted ranges) into
    fragment files, planting cross-partition prefix duplicates by
    copying some texts of fragment 0 into fragments 1..3."""
    import numpy as np
    import pandas as pd

    docs = (pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
            .sort_values("doc_id").reset_index(drop=True))
    # plant exact duplicates across fragments: every 10th doc of the
    # first quarter reappears (new doc_id) in later quarters
    q = len(docs) // n_frags
    planted = []
    for j in range(1, n_frags):
        src = docs.iloc[: q: 10].copy()
        src["doc_id"] = docs.doc_id.max() * j * 10 + src.doc_id
        planted.append(src)
    full = pd.concat([docs] + planted, ignore_index=True)
    full = full.sort_values("doc_id").reset_index(drop=True)
    cuts = np.array_split(np.arange(len(full)), n_frags)
    os.makedirs(tmpdir, exist_ok=True)
    for i, idx in enumerate(cuts):
        full.iloc[idx].to_parquet(
            os.path.join(tmpdir, f"frag_{i:02d}.parquet"))
    return full


def test_curation_kill_resume_and_exact_dedup(ray_session, tmp_path):
    """run_partitioned_curation: kill/resume byte-identical; the
    concatenated output equals a single-shot gate+first-wins dedup
    recomputation; seen-state checkpoints exist per partition."""
    import pandas as pd

    from biobloom_ray.pipelines.resumable import (
        run_partitioned_curation)

    input_dir = str(tmp_path / "frags")
    full = _doc_fragments(input_dir)
    out_a = str(tmp_path / "killed")
    out_b = str(tmp_path / "clean")

    r1 = run_partitioned_curation(input_dir, out_a, fail_after=2)
    assert r1["completed"] == [0, 1]
    r2 = run_partitioned_curation(input_dir, out_a)
    assert r2["skipped"] == [0, 1] and r2["completed"] == [2, 3]
    r3 = run_partitioned_curation(input_dir, out_b)
    assert r3["completed"] == [0, 1, 2, 3]

    def all_rows(d):
        frames = []
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not name.startswith("part="):
                continue
            for f in sorted(os.listdir(p)):
                if f.endswith(".parquet"):
                    frames.append(pq.read_table(
                        os.path.join(p, f)).to_pandas())
        return (pd.concat(frames).sort_values("doc_id")
                .reset_index(drop=True))

    a, b = all_rows(out_a), all_rows(out_b)
    assert a.equals(b)

    # single-shot recomputation: gate then global first-wins dedup
    nc = full.text.str.len().astype("int64")
    na = full.text.str.count(r"[A-Za-z]").astype("int64")
    gated = full[100 * na >= 50 * nc]
    keep = ~gated.text.duplicated(keep="first")
    want = gated[keep].sort_values("doc_id").reset_index(drop=True)
    assert list(a.doc_id) == list(want.doc_id)
    # duplicates were actually planted AND removed across partitions
    assert len(a) < len(gated)

    # every partition has its seen-state checkpoint and manifest
    for i in range(4):
        assert os.path.exists(os.path.join(
            out_b, "state", f"seen_{i}.parquet"))
        m = read_manifest(out_b, i)
        assert m.complete and m.sketch_blobs


def test_curation_left_anti_seen_tier_parity(ray_session, tmp_path,
                                             monkeypatch):
    """Forcing the seen-set gate to 0 routes the cross-partition dedup
    through the left_anti hash join against the checkpoint parquet —
    output identical to the broadcast-probe tier."""
    import pandas as pd

    import biobloom_ray.pipelines.resumable as RS

    input_dir = str(tmp_path / "frags")
    _doc_fragments(input_dir)
    out_a = str(tmp_path / "broadcast")
    out_b = str(tmp_path / "anti_join")

    RS.run_partitioned_curation(input_dir, out_a)
    monkeypatch.setattr(RS, "SEEN_BROADCAST_MAX_KEYS", 0)
    RS.run_partitioned_curation(input_dir, out_b)

    def all_rows(d):
        frames = []
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not name.startswith("part="):
                continue
            for f in sorted(os.listdir(p)):
                if f.endswith(".parquet"):
                    frames.append(pq.read_table(
                        os.path.join(p, f)).to_pandas())
        return (pd.concat(frames).sort_values("doc_id")
                .reset_index(drop=True))

    a = all_rows(out_a)
    b = all_rows(out_b)[a.columns.tolist()]
    assert len(a) > 0 and a.equals(b)


def _neardup_fragments(tmpdir, n_frags=4):
    """Fragment fixture planting cross-partition NEAR-duplicates
    (VERDICT r4 #4): every 10th doc of the first quarter reappears in
    later quarters with a small word suffix appended — high shingle
    Jaccard but NOT byte-identical, so only the MinHash stage can
    catch it."""
    import numpy as np
    import pandas as pd

    docs = (pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
            .sort_values("doc_id").reset_index(drop=True))
    q = len(docs) // n_frags
    planted = []
    for j in range(1, n_frags):
        src = docs.iloc[: q: 10].copy()
        src["text"] = src.text + " qq zz xx"
        src["doc_id"] = docs.doc_id.max() * j * 10 + src.doc_id
        planted.append(src)
    full = pd.concat([docs] + planted, ignore_index=True)
    full = full.sort_values("doc_id").reset_index(drop=True)
    cuts = np.array_split(np.arange(len(full)), n_frags)
    os.makedirs(tmpdir, exist_ok=True)
    for i, idx in enumerate(cuts):
        full.iloc[idx].to_parquet(
            os.path.join(tmpdir, f"frag_{i:02d}.parquet"))
    planted_ids = np.sort(np.concatenate(
        [p.doc_id.to_numpy() for p in planted]))
    return full, planted_ids


def _curation_rows(d):
    import pandas as pd

    frames = []
    for name in sorted(os.listdir(d)):
        p = os.path.join(d, name)
        if not name.startswith("part="):
            continue
        for f in sorted(os.listdir(p)):
            if f.endswith(".parquet"):
                frames.append(pq.read_table(
                    os.path.join(p, f)).to_pandas())
    return (pd.concat(frames).sort_values("doc_id")
            .reset_index(drop=True))


def test_curation_neardup_kill_resume(ray_session, tmp_path):
    """run_partitioned_curation(neardup=True): kill/resume
    byte-identical; survivors equal the plain greedy min-neighbor
    rule over the gated corpus (recomputed with the pipeline's own
    pair machinery); planted cross-partition NEAR-dups (non-exact)
    are removed; per-partition signature checkpoints exist."""
    import numpy as np
    import pandas as pd

    import biobloom_ray.pipelines.resumable as RS
    from biobloom_ray.stages.dedup import minhash_neardup_pairs

    input_dir = str(tmp_path / "frags")
    full, planted_ids = _neardup_fragments(input_dir)
    out_a = str(tmp_path / "killed")
    out_b = str(tmp_path / "clean")

    r1 = RS.run_partitioned_curation(input_dir, out_a, neardup=True,
                                     fail_after=2)
    assert r1["completed"] == [0, 1]
    r2 = RS.run_partitioned_curation(input_dir, out_a, neardup=True)
    assert r2["skipped"] == [0, 1] and r2["completed"] == [2, 3]
    r3 = RS.run_partitioned_curation(input_dir, out_b, neardup=True)
    assert r3["completed"] == [0, 1, 2, 3]

    a, b = _curation_rows(out_a), _curation_rows(out_b)
    assert a.equals(b)

    # single-shot replay: gate, exact first-wins, then the greedy
    # min-neighbor near-dup rule via the pipeline's own pair function
    nc = full.text.str.len().astype("int64")
    na = full.text.str.count(r"[A-Za-z]").astype("int64")
    gated = full[100 * na >= 50 * nc]
    ex = gated.text.duplicated(keep="first")
    pairs = minhash_neardup_pairs(
        ray.data.from_pandas(gated[["doc_id", "text"]]
                             .reset_index(drop=True)),
        threshold=0.6)
    drop = set(pairs.id_b.tolist()) if len(pairs) else set()
    want = gated[~ex & ~gated.doc_id.isin(drop)]
    assert list(a.doc_id) == list(want.doc_id)

    # the planted near-dups are NOT exact dups, yet none survive
    assert not set(planted_ids) & set(a.doc_id)
    assert len(planted_ids) > 0

    # per-partition signature checkpoints + manifests carry them
    for i in range(4):
        assert os.path.exists(os.path.join(
            out_b, "state", f"sigs_{i}.parquet"))
        m = read_manifest(out_b, i)
        assert m.complete and len(m.sketch_blobs) == 2


def test_curation_neardup_cross_tier_parity(ray_session, tmp_path,
                                            monkeypatch):
    """Forcing NEARDUP_STATE_BROADCAST_MAX_ROWS to 0 routes the
    cross-partition near-dup probe through the band-key hash-join
    tier — output identical to the broadcast tier."""
    import biobloom_ray.pipelines.resumable as RS

    input_dir = str(tmp_path / "frags")
    _neardup_fragments(input_dir, n_frags=2)
    out_a = str(tmp_path / "broadcast")
    out_b = str(tmp_path / "joined")

    RS.run_partitioned_curation(input_dir, out_a, neardup=True)
    monkeypatch.setattr(RS, "NEARDUP_STATE_BROADCAST_MAX_ROWS", 0)
    RS.run_partitioned_curation(input_dir, out_b, neardup=True)

    a = _curation_rows(out_a)
    b = _curation_rows(out_b)[a.columns.tolist()]
    assert len(a) > 0 and a.equals(b)
