"""Every registered query vs its DuckDB oracle at sf0.001.

This is the local mirror of the driver's correctness gate
(CORRECTNESS_r{N}.json): row-count + schema + order-insensitive value hash.
Queries without an oracle get a rows-and-schema smoke check instead.
"""

from __future__ import annotations

import pytest

from tests._compare import assert_matches_oracle
from vunnel_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, ddb, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = sdf.collect()
        assert sdf.columns, f"{name}: empty schema"
        assert rows is not None
        return
    assert_matches_oracle(sdf, ddb, spec.oracle)


def test_registry_is_nonempty():
    assert len(REGISTRY) >= 19


def test_driver_contract_shape():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert "tpch_q1_pricing_summary" in qs
