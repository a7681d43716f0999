"""Gap-based sessionization — the keyed-window aggregate over an event
stream (the "windowed aggregate" custom-operator shape: Ray Data has
no window primitive, so it composes a key-disjoint exchange with a
vectorized per-block scan).

A session is a maximal run of one entity's events where consecutive
gaps are <= ``gap_s``.  Dataflow: one hash exchange on the entity key
(`stages.shuffle.hash_partitioned` — every entity lands wholly in one
block), then per block: sort by (entity, ts, event_id), one vectorized
break/cumsum pass, and ``np.*.reduceat`` per-session reductions.  No
per-event or per-session Python.

Value sums are emitted as integer cents (``round(value*100)``) so the
DuckDB twin (`sessionize_sql`) reproduces them exactly — float sums
are order-dependent across engines; integer sums are not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nxsearch_ray.stages.shuffle import hash_partitioned


def _sessionize_block(block: pa.Table, *, entity_col: str,
                      ts_col: str, gap_us: int) -> pa.Table:
    out_schema = pa.schema([
        (entity_col, pa.int64()), ("session_no", pa.int64()),
        ("n_events", pa.int64()),
        ("t_start", pa.timestamp("us")), ("t_end", pa.timestamp("us")),
        ("total_value_cents", pa.int64())])
    if block.num_rows == 0:
        return out_schema.empty_table()
    order = pc.sort_indices(block, sort_keys=[
        (entity_col, "ascending"), (ts_col, "ascending"),
        ("event_id", "ascending")])
    block = block.take(order)
    u = block.column(entity_col).to_numpy()
    t = block.column(ts_col).cast(pa.int64()).to_numpy()
    # half_away_from_zero to match SQL round() (Arrow's default is
    # banker's rounding: 12.5 -> 12, while DuckDB round() gives 13)
    cents = pc.round(pc.multiply(block.column("value"), 100.0),
                     round_mode="half_towards_infinity") \
        .cast(pa.int64()).to_numpy()

    brk = np.ones(len(u), dtype=bool)
    brk[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
    starts = np.flatnonzero(brk)
    n_events = np.diff(np.r_[starts, len(u)])
    ends = starts + n_events - 1

    # per-entity 1-based session ordinal: global session index minus
    # the entity's first session index
    sess_of_start = np.arange(len(starts))
    user_first = np.ones(len(starts), dtype=bool)
    user_first[1:] = u[starts[1:]] != u[starts[:-1]]
    base = sess_of_start[user_first]
    session_no = sess_of_start - np.repeat(
        base, np.diff(np.r_[np.flatnonzero(user_first),
                            len(starts)])) + 1

    total = np.add.reduceat(cents, starts)
    return pa.table({
        entity_col: pa.array(u[starts], type=pa.int64()),
        "session_no": pa.array(session_no, type=pa.int64()),
        "n_events": pa.array(n_events, type=pa.int64()),
        "t_start": pa.array(t[starts], type=pa.int64())
        .cast(pa.timestamp("us")),
        "t_end": pa.array(t[ends], type=pa.int64())
        .cast(pa.timestamp("us")),
        "total_value_cents": pa.array(total, type=pa.int64()),
    })


def sessionize(ds, *, entity_col: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800, num_partitions: int | None = None):
    """Session table: one row per (entity, session) with event count,
    start/end timestamps and the integer-cents value sum."""
    gap_us = int(gap_s) * 1_000_000
    parts = hash_partitioned(
        ds.select_columns([entity_col, ts_col, "event_id", "value"]),
        [entity_col], num_partitions)
    return parts.map_batches(
        lambda b: _sessionize_block(b, entity_col=entity_col,
                                    ts_col=ts_col, gap_us=gap_us),
        batch_format="pyarrow", batch_size=None)


def sessionize_sql(table: str = "events", *,
                   entity_col: str = "user_id", ts_col: str = "ts",
                   gap_s: int = 1800) -> str:
    """DuckDB query mirroring `sessionize` (epoch-µs integer gap
    compare, integer-cents sum)."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
WITH l AS (
  SELECT {entity_col}, {ts_col}, event_id,
         round(value * 100)::BIGINT AS cents,
         lag(epoch_us({ts_col})) OVER (
           PARTITION BY {entity_col}
           ORDER BY {ts_col}, event_id) AS prev_us
  FROM {table}),
g AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR epoch_us({ts_col}) - prev_us > {gap_us}
                 THEN 1 ELSE 0 END AS brk
  FROM l),
s AS (
  SELECT *, sum(brk) OVER (
      PARTITION BY {entity_col}
      ORDER BY {ts_col}, event_id
      ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g)
SELECT {entity_col}, session_no::BIGINT AS session_no,
       count(*) AS n_events,
       min({ts_col}) AS t_start, max({ts_col}) AS t_end,
       sum(cents)::BIGINT AS total_value_cents
FROM s GROUP BY {entity_col}, session_no
"""
