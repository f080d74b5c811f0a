"""Salt-by-time-range fallback for the temporal joins (VERDICT r3 #5):
above EVENTS_ENTITY_DIRECT_MAX_ROWS total events, events_asof_join and
events_range_join shard each entity's history into time buckets instead
of assuming it fits one map_groups block.  These tests force the gate to
0 and require the salted plans to be row-identical to the direct ones —
on the driver fixture AND on a pathological single-entity stream whose
as-of answers must cross bucket boundaries (the carry pass).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import biobloom_ray.pipelines.analytics as A

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True))


def test_temporal_salt_tiers_agree(ray_session, monkeypatch):
    """Forced-gate parity on the events fixture: salted == direct for
    both temporal joins (the verdict's done-criterion)."""
    direct = {"asof": A.events_asof_join(SF),
              "range": A.events_range_join(SF)}
    monkeypatch.setattr(A, "EVENTS_ENTITY_DIRECT_MAX_ROWS", 0)
    salted = {"asof": A.events_asof_join(SF),
              "range": A.events_range_join(SF)}
    for k in direct:
        f, s = _sorted(direct[k]), _sorted(salted[k])
        assert len(f) > 0 and len(f) == len(s), k
        for c in f.columns:
            assert (f[c].to_numpy() == s[c].to_numpy()).all(), (k, c)


def _write_events(tmp_path, ev: pd.DataFrame) -> str:
    d = tmp_path / "single_entity"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   d / "events.parquet")
    return str(d)


def test_asof_salt_single_entity_cross_bucket_carry(
        ray_session, tmp_path, monkeypatch):
    """One user, events spread over ~100 one-hour buckets with sparse
    purchases: most clicks must resolve through the cross-bucket carry
    table, clicks before the first purchase are dropped, and the salted
    output is identical to the direct plan and to a brute-force pandas
    as-of."""
    rng = np.random.default_rng(7)
    n = 400
    base = pd.Timestamp("2026-03-01").value  # ns
    ts_ns = np.sort(base + rng.integers(0, 100 * 3600, n) * 1_000_000_000)
    is_buy = rng.random(n) < 0.06  # sparse rights => cross-bucket carries
    is_buy[0] = False              # at least one pre-purchase click
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 42, dtype=np.int64),
        "ts": pd.to_datetime(ts_ns),
        "event_type": np.where(is_buy, "purchase", "click"),
        "value": np.round(rng.random(n) * 50, 2),
    })
    d = _write_events(tmp_path, ev)

    direct = A.events_asof_join(d)
    monkeypatch.setattr(A, "EVENTS_ENTITY_DIRECT_MAX_ROWS", 0)
    salted = A.events_asof_join(d)

    f, s = _sorted(direct), _sorted(salted)
    assert len(f) == len(s) > 0
    for c in f.columns:
        assert (f[c].to_numpy() == s[c].to_numpy()).all(), c

    # brute-force oracle: latest purchase at or before each click;
    # equal-ts purchases collapse to max value
    buys = (ev[is_buy].groupby("ts", as_index=False)["value"].max()
            .sort_values("ts"))
    b_ts = buys["ts"].to_numpy("datetime64[ns]").astype(np.int64)
    b_val = buys["value"].to_numpy()
    clicks = ev[~is_buy]
    c_ts = clicks["ts"].to_numpy("datetime64[ns]").astype(np.int64)
    idx = np.searchsorted(b_ts, c_ts, side="right") - 1
    ok = idx >= 0
    want = pd.DataFrame({
        "event_id": clicks["event_id"].to_numpy()[ok],
        "asof_ts_ns": b_ts[idx[ok]],
        "asof_value": b_val[idx[ok]]})
    w = _sorted(want)
    assert len(w) < len(clicks)  # the pre-purchase clicks really drop
    assert len(s) == len(w)
    for c in w.columns:
        assert (s[c].to_numpy() == w[c].to_numpy()).all(), c
    # the carry pass is genuinely exercised: some click has no purchase
    # inside its own hour bucket but a purchase in an earlier bucket
    span = 3600 * 1_000_000_000
    carried = 0
    for t in c_ts:
        b0 = t // span
        same = ((b_ts // span == b0) & (b_ts <= t)).any()
        earlier = (b_ts // span < b0).any()
        carried += (not same) and earlier
    assert carried > 0


def test_range_salt_single_entity(ray_session, tmp_path, monkeypatch):
    """Range join on the same pathological stream: halo replication must
    reproduce the direct plan exactly, including window edges that cross
    bucket boundaries."""
    rng = np.random.default_rng(11)
    n = 300
    base = pd.Timestamp("2026-03-01").value
    ts_ns = base + rng.integers(0, 40 * 3600, n) * 500_000_000  # .5s grid
    is_buy = rng.random(n) < 0.5
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 9, dtype=np.int64),
        "ts": pd.to_datetime(np.sort(ts_ns)),
        "event_type": np.where(is_buy, "purchase", "click"),
        "value": np.round(rng.random(n) * 20, 2),
    })
    d = _write_events(tmp_path, ev)

    direct = A.events_range_join(d)
    monkeypatch.setattr(A, "EVENTS_ENTITY_DIRECT_MAX_ROWS", 0)
    salted = A.events_range_join(d)
    assert len(direct) == len(salted) > 0
    for c in direct.columns:
        assert (direct[c].to_numpy() == salted[c].to_numpy()).all(), c
    assert (direct.n_in_window > 0).any()
