"""HyperLogLog gates: exact clz, estimator accuracy within the
published bound, duplicate-invariance, partial-merge associativity,
small-range linear counting, and the url_cardinality query."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _strings(n, tag):
    return [f"{tag}/{i:07d}/{(i * 2654435761) % 100003}"
            for i in range(n)]


def test_clz64_exact():
    from nxsearch_ray.stages.hll import _clz64

    rng = np.random.default_rng(3)
    xs = rng.integers(0, 2 ** 63, size=2000, dtype=np.int64) \
        .astype(np.uint64)
    xs[:64] = np.uint64(1) << np.arange(64, dtype=np.uint64)
    got = _clz64(xs.copy())
    want = np.array([64 - int(x).bit_length() for x in xs])
    assert np.array_equal(got, want)


def test_estimate_within_bound():
    from nxsearch_ray.stages.hll import hll_estimate, hll_partial

    n, p = 50000, 12
    regs = hll_partial(pa.array(_strings(n, "u")), p=p)
    est = hll_estimate(regs)
    assert abs(est / n - 1) < 3 * 1.04 / (1 << p) ** 0.5, est


def test_duplicates_do_not_inflate():
    from nxsearch_ray.stages.hll import hll_estimate, hll_partial

    base = _strings(1000, "d")
    once = hll_estimate(hll_partial(pa.array(base), p=12))
    many = hll_estimate(hll_partial(pa.array(base * 20), p=12))
    assert once == many            # registers are max — idempotent


def test_merge_equals_whole():
    from nxsearch_ray.stages.hll import (hll_estimate, hll_merge,
                                         hll_partial)

    vals = _strings(8000, "m")
    whole = hll_partial(pa.array(vals), p=10)
    parts = np.stack([hll_partial(pa.array(vals[i::5]), p=10)
                      for i in range(5)])
    assert np.array_equal(hll_merge(parts), whole)


def test_small_range_linear_counting():
    from nxsearch_ray.stages.hll import hll_estimate, hll_partial

    n = 30
    est = hll_estimate(hll_partial(pa.array(_strings(n, "s")), p=12))
    assert abs(est - n) < 2, est   # linear counting is near-exact here


def test_distributed_build_equals_local(ray_session):
    import ray
    import ray.data as rd

    from nxsearch_ray.stages.hll import hll_build_ref, hll_partial

    vals = _strings(6000, "r")
    ds = rd.from_arrow(pa.table({"key": pa.array(vals)})) \
        .repartition(17)
    got = ray.get(hll_build_ref(ds, "key", p=11))
    want = hll_partial(pa.array(vals), p=11)
    assert np.array_equal(got, want)


def test_url_cardinality_query(ray_session):
    import __ray_entry__ as e

    t = e.queries()["url_cardinality"]("/root/testdata/sf0.001")
    assert t.num_rows == 1
    assert t.column("n_exact")[0].as_py() == 500
    assert t.column("rel_err_ok")[0].as_py() is True
