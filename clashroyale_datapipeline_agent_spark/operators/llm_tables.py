"""LLM-context table operators (SURVEY.md §2.2 P11, §2.4 A14, §2.7 U1).

The Phase-2 prep nodes project analytics tables into compact row tables for
the coach LLM (``/root/reference/src/workflows/user_workflow.py:39-205``).
Pure DataFrame transforms; serialization (``toJSON`` + truncation) happens
only at the driver boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summary_to_metric_value(summary: DataFrame) -> DataFrame:
    """A14 — melt the 1-row summary into a (metric, value) long table.

    Parity: ``user_workflow.py:39-43``. The reference's ``value`` column is
    mixed-type (ints + float); relational form casts to string — documented
    convention (SURVEY.md §7.4 risk #5).
    """
    cols = summary.columns
    stack_args: list = []
    for c in cols:
        stack_args.append(F.lit(c))
        stack_args.append(F.col(c).cast("string"))
    return summary.select(
        F.stack(F.lit(len(cols)), *stack_args).alias("metric", "value")
    )


def tag_role_union(
    parts: list[tuple[DataFrame, str]], role_col: str = "role"
) -> DataFrame:
    """U1 — union tables tagged with a literal role column.

    Parity: best∪worst cards / tough∪easy opponent cards with ``role`` tags
    (``user_workflow.py:120-162``, ``:164-205``).
    """
    tagged = [df.withColumn(role_col, F.lit(role)) for df, role in parts]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


def reconcile_column_aliases(
    df: DataFrame, target: str, candidates: list[str]
) -> DataFrame:
    """P11 — accept any of ``candidates`` as the source for ``target``.

    Parity: ``user_workflow.py:46-74`` reconciles ``deck_type | type |
    my_deck_type`` (and ``card | card_name``) at read time. Relational form:
    ``coalesce`` over whichever candidates exist, dropping the aliases.
    """
    present = [c for c in candidates if c in df.columns]
    if not present:
        raise ValueError(f"none of {candidates} present in {df.columns}")
    out = df.withColumn(target, F.coalesce(*[F.col(c) for c in present]))
    for c in present:
        if c != target:
            out = out.drop(c)
    return out
