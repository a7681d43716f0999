"""Per-group top-k operator (the reference's capped results heap,
src/algo/heap.c) — correctness vs a pandas reference."""

import numpy as np
import pyarrow as pa


def test_topk_per_group(ray_session):
    import ray.data as rd

    from nxsearch_ray.stages.topk import topk_per_group

    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table({
        "g": rng.integers(0, 37, size=n),
        "v": rng.normal(size=n),
        "id": np.arange(n, dtype=np.int64),
    })
    out = topk_per_group(rd.from_arrow(t).repartition(9),
                         group_col="g", order_col="v", tie_col="id",
                         k=7)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=1 << 16,
                                    batch_format="pyarrow")
        if b.num_columns > 0).to_pandas()

    import pandas as pd

    df = t.to_pandas()
    want = df.sort_values(["g", "v", "id"],
                          ascending=[True, False, True]) \
        .groupby("g").head(7)
    key = lambda d: set(zip(d["g"], d["id"]))
    assert key(got) == key(want)


def test_topk_string_groups(ray_session):
    import ray.data as rd

    from nxsearch_ray.stages.topk import topk_per_group

    t = pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "v": [1.0, 3.0, 2.0, 5.0, 4.0],
        "id": [1, 2, 3, 4, 5],
    })
    out = topk_per_group(rd.from_arrow(t), group_col="g",
                         order_col="v", tie_col="id", k=2)
    got = sorted((r["g"], r["id"]) for r in out.take_all())
    assert got == [("a", 2), ("a", 3), ("b", 4), ("b", 5)]
