"""Every registered query must hash-match its DuckDB oracle at sf0.001
(fast) — the driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from candia_spark.plans.compare import compare_query
from candia_spark.plans.queries import QUERY_REGISTRY


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_query_matches_oracle(spark, sf_smoke, name):
    result = compare_query(spark, sf_smoke, name)
    assert result["match"], result


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 19


def test_driver_window_invariants():
    """The driver certifies the FIRST 50 registry entries, so the
    rotation must keep the window at exactly 50 (a new query that
    forgets to extend _DRIVER_WINDOW_TAIL silently pushes an existing
    query out of certification), every name must resolve, and every
    windowed query must carry an oracle (rows-only entries would waste
    certified slots)."""
    from candia_spark.plans.queries import _DRIVER_WINDOW_TAIL

    names = list(QUERY_REGISTRY)
    assert len(names) - len(_DRIVER_WINDOW_TAIL) == 50
    assert names[-len(_DRIVER_WINDOW_TAIL):] == _DRIVER_WINDOW_TAIL
    window = names[:50]
    missing_oracle = [
        n for n in window if QUERY_REGISTRY[n].oracle is None
    ]
    assert not missing_oracle, missing_oracle
