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
