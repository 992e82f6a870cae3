"""Size-gated execution paths in the relational layer (r10 verdict
item 5): q24's exact-percentile sort must be a LOCAL-scale choice, with
the q52-validated approx_percentile sketch engaging past the byte
threshold — both paths value-tested, the engaged path plan-pinned."""

from __future__ import annotations

import pytest

from big_data_science_project_spark.operators import relational as R
from big_data_science_project_spark.plans.inspect import formatted_plan

SF = "/root/testdata/sf0.01"


def test_q24_exact_path_engages_at_fixture_scale(spark):
    """Fixture parquet (≈1 MB at sf0.01) sits far below the 256 MiB
    gate: the plan must carry the exact `percentile` aggregate and no
    sketch."""
    assert R._table_file_bytes(SF, "lineitem") < R.PERCENTILE_EXACT_MAX_BYTES
    plan = formatted_plan(R.q24_percentiles(spark, SF))
    assert "percentile(" in plan
    assert "approx_percentile" not in plan


def test_q24_sketch_path_engages_past_gate(spark, monkeypatch):
    """Force the gate shut: the plan must swap to approx_percentile with
    no exact sort aggregate left."""
    monkeypatch.setattr(R, "PERCENTILE_EXACT_MAX_BYTES", -1)
    plan = formatted_plan(R.q24_percentiles(spark, SF))
    assert "approx_percentile" in plan
    # the only remaining `percentile(` substrings are the approx ones
    assert plan.count("percentile(") == plan.count("approx_percentile(")


def test_q24_unknown_size_defaults_to_sketch(spark, monkeypatch):
    """A non-listable input (None from the size probe) must NEVER pick
    the exact sort blind — the sketch is the safe default."""
    monkeypatch.setattr(R, "_table_file_bytes", lambda d, n: None)
    plan = formatted_plan(R.q24_percentiles(spark, SF))
    assert "approx_percentile" in plan


def test_q24_sketch_path_within_one_percent(spark, monkeypatch):
    """The sketch path honors the q52-validated accuracy contract: every
    group's p50/p95 within 1% of the exact path's value (corr/covar are
    the same single-pass aggregates on both paths — equal exactly)."""
    exact = {r.l_returnflag: r for r in
             R.q24_percentiles(spark, SF).collect()}
    monkeypatch.setattr(R, "PERCENTILE_EXACT_MAX_BYTES", -1)
    approx = {r.l_returnflag: r for r in
              R.q24_percentiles(spark, SF).collect()}
    assert set(exact) == set(approx) and len(exact) >= 3
    for flag, e in exact.items():
        a = approx[flag]
        assert a.p50 == pytest.approx(e.p50, rel=0.01)
        assert a.p95 == pytest.approx(e.p95, rel=0.01)
        assert a.corr_price_qty == e.corr_price_qty
        assert a.covar_price_qty == e.covar_price_qty
