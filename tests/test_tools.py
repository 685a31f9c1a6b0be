"""Pure-Python tests for the repo tools (no Spark jobs): bench-artifact
recovery in tools/bench_compare.py and plan-fact parsing in
tools/explain_audit.py."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import bench_compare  # noqa: E402
from explain_audit import plan_facts  # noqa: E402


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_load_queries_full_map(tmp_path):
    p = _write(tmp_path, "full.json", {"queries": {"a": 1.5, "b": 0.25}, "sf": 0.1})
    assert bench_compare.load_queries(p) == {"a": 1.5, "b": 0.25}


def test_load_queries_tail_with_intact_map(tmp_path):
    """A front-truncated wrapper whose tail still contains the whole
    queries sub-object must be json-parsed — wrapper numerics like
    "value"/"sf" never leak in as query timings."""
    line = json.dumps(
        {"metric": "m", "value": 9.9, "queries": {"q1": 1.0, "q2": 2.0}, "sf": 0.1}
    )
    p = _write(tmp_path, "tail.json", {"tail": line[20:]})
    assert bench_compare.load_queries(p) == {"q1": 1.0, "q2": 2.0}


def test_load_queries_tail_cut_into_map(tmp_path):
    """Truncation into the map itself falls back to regex recovery
    intersected with the real registry names: a fabricated name and the
    trailing wrapper fields are both dropped."""
    tail = '_fake": 1.0, "flagship_pricing_summary": 0.5}, "sf": 0.1, "reps": 3}'
    p = _write(tmp_path, "cut.json", {"tail": tail})
    got = bench_compare.load_queries(p)
    assert got == {"flagship_pricing_summary": 0.5}


_PLAN = """AdaptiveSparkPlan isFinalPlan=true
(9) BroadcastHashJoin [codegen id : 2]
(10) SortMergeJoin
(12) Exchange
Arguments: hashpartitioning(l_returnflag#8, 32), ENSURE_REQUIREMENTS
(14) AQEShuffleRead
Input [2]: [x, y]
Arguments: coalesced
(15) HashAggregate [codegen id : 3]
(16) Scan parquet
PushedFilters: [IsNotNull(l_orderkey)]
(17) Scan parquet
PushedFilters: []
"""


def test_plan_facts_parses_formatted_layout():
    f = plan_facts(_PLAN)
    assert f["joins"] == {"BroadcastHashJoin": 1, "SortMergeJoin": 1}
    assert f["n_exchanges"] == 1  # counted via the Arguments: line
    assert f["aqe_coalesced"] == 1
    assert f["codegen_spans"] == 2
    assert f["pushed_filters"] == 1  # the empty [] does not count
    assert f["python_eval"] == 0
    assert f["final_plan"] is True
    assert f["aqe_skew_handled"] is False


def test_load_queries_tail_with_nested_value(tmp_path):
    """A nested object inside the queries map must not truncate the
    parse (round-5 ADVICE: flat find('}') stopped at the first brace)."""
    import json as _json

    line = _json.dumps(
        {
            "metric": "total",
            "queries": {"q1": 1.5, "meta": {"note": "nested"}, "q2": 2.25},
            "sf": 0.1,
        }
    )
    p = tmp_path / "bench.json"
    p.write_text(_json.dumps({"tail": line[10:]}))
    from tools.bench_compare import load_queries

    out = load_queries(str(p))
    assert out == {"q1": 1.5, "q2": 2.25}


def test_determinism_sweep_rejects_unknown_names(spark, monkeypatch):
    """Unknown names error out instead of being silently counted as
    checked (round-5 ADVICE: checked could exceed executed)."""
    import sys as _sys

    import pytest as _pytest

    from tools import determinism_sweep

    monkeypatch.setattr(
        _sys,
        "argv",
        ["determinism_sweep.py", "/root/testdata/sf0.001", "1", "no_such_query_xyz"],
    )
    with _pytest.raises(SystemExit, match="unknown query names"):
        determinism_sweep.main()


def test_bench_local_emits_reversed_registry_order():
    """Rotation discipline guard: the driver keeps only a front-truncated
    TAIL of bench.py's line, so the queries map MUST be emitted in
    reversed registry order (least-evidenced head of the registry at the
    retained end). BENCH_local.json is bench.py's own full-map output —
    if this ordering ever breaks, the next bench run fails here."""
    import json as _json
    from pathlib import Path

    import __spark_entry__ as entry

    art = Path(__file__).resolve().parents[1] / "BENCH_local.json"
    names = list(_json.loads(art.read_text())["queries"])
    present = set(names)
    expected = [n for n in reversed(list(entry.queries())) if n in present]
    assert names == expected
