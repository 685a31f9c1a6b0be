"""Float-ROUND determinism ledger (round-7 VERDICT task 7).

Enumerates every registered query whose output ROUNDs a float aggregate —
the determinism flake class: a float SUM/AVG's value depends on
partial-aggregation merge order, so a ROUND sitting on a .5 boundary can
flip run-to-run. For each candidate the tool records which mechanical
guard the query carries:

- ``int-scaled``   — terms are integer-scaled (CAST(ROUND(x*10^k) AS
                     BIGINT)) or summed as HUGEINT/DECIMAL before the
                     division: the sum is EXACT, merge-order-free.
- ``ordered-fold`` — the sum runs as a sequential fold over an ordered
                     bounded array (sort_array + F.aggregate /
                     list_sum / list_reduce): order fixed by
                     construction.
- ``window-seq``   — the sum is a running window aggregate with ORDER
                     BY: evaluated sequentially in frame order in both
                     engines.
- ``round-only``   — none of the above: the ROUND precision itself is
                     the only guard (accepted risk, monitored by
                     tools/determinism_sweep.py run-to-run).

Usage: python tools/float_round_audit.py [--markdown]
Writes FLOAT_ROUND_LEDGER.json at the repo root; --markdown prints the
SCALE.md table body.
"""

from __future__ import annotations

import inspect
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


#: float sums the regexes can't see (the summed column is a bare alias
#: whose float-ness lives in an upstream CTE); value = the guard that
#: actually covers it, verified by reading the query
KNOWN_INDIRECT = {
    "docs_zipf_slope_by_source": ("SUM(float alias)", "ordered-fold"),
    "docs_heaps_law_by_source": ("SUM(float alias)", "ordered-fold"),
    "events_cusum_drift": ("SUM(float) OVER", "window-seq"),
    "events_ks_binned_two_sample": ("SUM(int) OVER + exact num", "int-scaled"),
    "orders_benford_audit": ("SUM(float) OVER", "window-seq"),
    "customer_tcloseness_audit": ("SUM(|int cross-product|)", "int-scaled"),
    # round-8 wave: the ROUND's `* 1.0 /` makes the regex see a float
    # sum, but the summed column is a 1e6-scaled BIGINT (or a 0/1 CASE
    # int) — the sum is exact; verified by reading each query
    "docs_span_dedup_census": ("SUM(CASE int)", "int-scaled"),
    "docs_dsir_importance_by_source": ("SUM(1e6-scaled lq)", "int-scaled"),
    "docs_top_ngram_char_fraction": ("SUM(1e6-scaled frac)", "int-scaled"),
    "orders_seasonal_naive_backtest": ("SUM(1e6-scaled ape)", "int-scaled"),
    "docs_conformal_coverage": ("SUM(CASE int)", "int-scaled"),
    "docs_tokenizer_fertility": ("SUM(int counts)", "int-scaled"),
}


def _float_agg_hits(sql_u: str) -> list[str]:
    hits = []
    if re.search(r"\bAVG\s*\(", sql_u):
        hits.append("AVG")
    for m in re.finditer(r"SUM\s*\(", sql_u):
        frag = sql_u[m.end() : m.end() + 160]
        floaty = (
            "DOUBLE" in frag
            or "LN(" in frag
            or "LOG(" in frag
            or "SQRT(" in frag
            or re.search(r"\d\.\d", frag)
        )
        exact = "AS BIGINT" in frag or "HUGEINT" in frag or "AS INT" in frag
        if floaty and not exact:
            hits.append("SUM(float)")
            break
    return hits


def _guards(sql: str, src: str) -> list[str]:
    sql_u, g = sql.upper(), []
    if (
        re.search(
            r"ROUND\s*\(.{0,200}?\*\s*10{4,}[0-9.]*\s*\)\s*AS\s+BIGINT",
            sql_u,
            re.S,
        )
        or "HUGEINT" in sql_u
    ):
        g.append("int-scaled")
    if "int-scaled" not in g and re.search(
        r"F\.round\(.{0,200}?\*\s*10{4,}[0-9.]*\s*\)\s*\.cast\(.bigint.\)",
        src,
        re.S,
    ):
        # Spark side integer-scales even if the SQL spells it differently
        g.append("int-scaled")
    if "sort_array(F.collect_list" in src and "F.aggregate(" in src:
        g.append("ordered-fold")
    if re.search(r"LIST_SUM|LIST_REDUCE|LIST_AGGREGATE", sql_u) or (
        "F.aggregate(" in src and "ordered-fold" not in g and "sort_array" not in src
    ):
        # per-array fold (array order is data, not partition order)
        g.append("array-fold")
    if re.search(r"SUM\s*\([^)]*\)\s*OVER\s*\([^)]*ORDER BY", sql_u):
        g.append("window-seq")
    return g


def _round_precisions(sql_u: str) -> list[int]:
    return sorted(
        {int(m) for m in re.findall(r"ROUND\s*\([^;]*?,\s*(\d+)\s*\)", sql_u)}
    )


def run_audit() -> dict:
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    out = {}
    for name, sql in sorted(oracles.items()):
        sql_u = sql.upper()
        hits = _float_agg_hits(sql_u)
        if name in KNOWN_INDIRECT:
            agg, guard = KNOWN_INDIRECT[name]
            out[name] = {
                "float_aggs": sorted(set(hits + [agg])),
                "guards": [guard],
                "round_digits": _round_precisions(sql_u),
            }
            continue
        if not hits or "ROUND" not in sql_u:
            continue
        try:
            src = inspect.getsource(qs[name])
        except (OSError, TypeError):
            src = ""
        guards = _guards(sql, src)
        out[name] = {
            "float_aggs": hits,
            "guards": guards or ["round-only"],
            "round_digits": _round_precisions(sql_u),
        }
    return out


if __name__ == "__main__":
    res = run_audit()
    counts: dict[str, int] = {}
    for v in res.values():
        counts[v["guards"][0]] = counts.get(v["guards"][0], 0) + 1
    artifact = {"n_candidates": len(res), "primary_guard_counts": counts, "queries": res}
    Path("FLOAT_ROUND_LEDGER.json").write_text(json.dumps(artifact, indent=1))
    print(f"{len(res)} float-ROUND queries; primary guards: {counts}")
    if "--markdown" in sys.argv:
        print("\n| query | float aggs | guards | round digits |")
        print("|---|---|---|---|")
        for name, v in res.items():
            print(
                f"| `{name}` | {', '.join(v['float_aggs'])} |"
                f" {', '.join(v['guards'])} |"
                f" {', '.join(map(str, v['round_digits'])) or '-'} |"
            )
