"""Every registered slug vs its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate (see tools/check_queries.py for
the sf0.01 run)."""

from __future__ import annotations

import duckdb
import pytest

import tools.check_queries as chk
from resotodatalink_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = registry.QUERIES[name](spark, SF_DIR).toPandas()
    if name not in registry.ORACLES:
        assert len(sdf) >= 0  # rows-only contract; schema must materialize
        return
    try:
        odf = duck.execute(registry.ORACLES[name]).df()
    except duckdb.Error:
        # observed rare transient duckdb errors on this sandbox under
        # heavy page-cache churn (different slug each occurrence, never
        # reproducible); one retry — a real oracle failure recurs
        # deterministically and still fails
        odf = duck.execute(registry.ORACLES[name]).df()
    assert len(sdf) == len(odf), f"row count {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    cs, co = chk.canon_frame(sdf), chk.canon_frame(odf)
    if not cs.equals(co):
        neq = (cs != co).any(axis=1)
        bad = neq[neq].index[:3].tolist()
        detail = "\n".join(
            f"spark={cs.loc[i].to_dict()}\nduck ={co.loc[i].to_dict()}" for i in bad
        )
        pytest.fail(f"{int(neq.sum())} differing rows, e.g.\n{detail}")
