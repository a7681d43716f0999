"""Semi/anti join + scalar function library tests."""

from __future__ import annotations

import pyarrow as pa

from nxsearch_ray.functions.levdist import levenshtein


def test_levenshtein_reference_cases():
    # the classic cases the reference's t_levdist suite pins
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("a", "") == 1
    assert levenshtein("", "abc") == 3
    assert levenshtein("book", "back") == 2


def test_levenshtein_cap():
    assert levenshtein("aaaaaaaa", "bbbbbbbb", cap=2) == 3
    assert levenshtein("abcdef", "abcdxf", cap=2) == 1
    assert levenshtein("short", "muchlongerstring", cap=3) == 4


def test_semi_anti_join(ray_session):
    import ray.data as rd

    from nxsearch_ray.stages.join import anti_join, semi_join

    t = pa.table({"k": [1, 2, 3, 4, 5], "v": list("abcde")})
    ds = rd.from_arrow(t).repartition(3)
    semi = pa.concat_tables(semi_join(ds, "k", [2, 4, 9]).iter_batches(
        batch_size=100, batch_format="pyarrow"))
    anti = pa.concat_tables(anti_join(ds, "k", [2, 4, 9]).iter_batches(
        batch_size=100, batch_format="pyarrow"))
    assert sorted(semi.column("k").to_pylist()) == [2, 4]
    assert sorted(anti.column("k").to_pylist()) == [1, 3, 5]
