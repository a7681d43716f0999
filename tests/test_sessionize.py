"""Gap-based sessionization (stages/sessionize.py) — keyed windowed
aggregate with a DuckDB twin."""

import duckdb
import pyarrow as pa

from nxsearch_ray.stages.sessionize import sessionize, sessionize_sql

US = 1_000_000


def _ts(secs):
    return pa.array([s * US for s in secs],
                    pa.int64()).cast(pa.timestamp("us"))


def test_session_boundaries(ray_session):
    import ray.data as rd

    # user 1: events at t=0,100,2000 (gap 1900 > 1800 splits);
    # user 2: one event
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": _ts([0, 100, 2000, 50]),
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.5], pa.float64()),
    })
    out = {(r["user_id"], r["session_no"]): r
           for r in sessionize(rd.from_arrow(t), gap_s=1800).take_all()}
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["total_value_cents"] == 300
    assert out[(1, 2)]["n_events"] == 1
    assert out[(1, 2)]["total_value_cents"] == 300
    assert out[(2, 1)]["n_events"] == 1
    assert out[(2, 1)]["total_value_cents"] == 450


def test_exact_gap_is_same_session(ray_session):
    """gap == threshold stays in-session (strict > comparison, both
    sides)."""
    import ray.data as rd

    t = pa.table({
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": _ts([0, 1800]),
        "event_id": pa.array([1, 2], pa.int64()),
        "value": pa.array([1.0, 1.0], pa.float64()),
    })
    rows = sessionize(rd.from_arrow(t), gap_s=1800).take_all()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def test_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    got = sessionize(ds).to_pandas() \
        .sort_values(["user_id", "session_no"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(sessionize_sql() +
                       " ORDER BY user_id, session_no").fetchdf()
    assert got.shape == want.shape
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_partition_count_invariance(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    a = sessionize(ds, num_partitions=2).to_pandas() \
        .sort_values(["user_id", "session_no"]).reset_index(drop=True)
    b = sessionize(ds, num_partitions=7).to_pandas() \
        .sort_values(["user_id", "session_no"]).reset_index(drop=True)
    assert (a.values == b.values).all()
