"""Cross-engine tokenization parity on a GNARLY whitespace corpus.

The driver's DuckDB differential runs on the fixture corpus, whose texts
are single-space separated — so a Spark side that splits on ``\\s+``
and an oracle that splits on a literal space agree by accident (the
round-3 ADVICE flagged exactly this latent divergence in the LSH
sweep). This test regenerates a corpus full of tabs, newlines, runs of
spaces, and ragged edges, and replays the full oracle differential for
every registered query that reads the documents table. Any
tokenization (or trim) mismatch between an operator and its SQL twin
fails HERE even though the fixture corpus can't show it.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_SMALL = "/root/testdata/sf0.001"

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup el la les et est un une pour dans que"
).split()


def _gnarly_rows(n: int = 200) -> list[tuple]:
    rng = random.Random(42)
    rows = []
    for i in range(n):
        k = rng.randrange(5, 40)
        toks = [rng.choice(_WORDS) for _ in range(k)]
        seps = [
            rng.choice([" ", "  ", "\t", "\n", " \t ", "   "])
            for _ in range(k - 1)
        ] + [""]
        text = "".join(t + s for t, s in zip(toks, seps))
        if i % 3 == 0:
            text = "  " + text
        if i % 4 == 0:
            text = text + " \t"
        rows.append(
            (i, text, rng.choice(["en", "fr", "es"]), f"src{i % 5}", len(text))
        )
    return rows


@pytest.fixture(scope="module")
def gnarly_sf(tmp_path_factory):
    """An sf-dir whose documents table is whitespace-hostile; the other
    tables symlink to sf0.001 (the doc queries never read them, but the
    differential harness registers views for all ten)."""
    d = tmp_path_factory.mktemp("gnarly_sf")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", _gnarly_rows())
    con.execute(f"COPY d TO '{d}/documents.parquet' (FORMAT PARQUET)")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        (d / f"{t}.parquet").symlink_to(f"{SF_SMALL}/{t}.parquet")
    return str(d)


def test_doc_queries_match_oracle_on_gnarly_whitespace(gnarly_sf):
    from oracle_check import run_check

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    names = [n for n, sql in oracles.items() if "documents" in sql]
    assert len(names) >= 40  # the text/dedup surface, not a cherry-pick
    res = run_check(gnarly_sf, names)
    fails = {k: v for k, v in res.items() if v}
    hints = {}
    for k in fails:
        sql = oracles[k]
        if "string_split" in sql:
            hints[k] = (
                "oracle splits on literal space (string_split) — Spark side "
                "must use plans/text_queries._toks_space"
            )
        elif "regexp_split_to_array" in sql:
            hints[k] = (
                r"oracle splits on \s+ (regexp_split_to_array) — Spark side "
                "must use operators/text.tokens_col, NOT the literal-space "
                "_toks_space"
            )
    assert not fails, {"fails": fails, "tokenizer_hints": hints}
