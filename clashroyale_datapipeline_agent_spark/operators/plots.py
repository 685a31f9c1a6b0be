"""Plot sinks (SURVEY.md §2.1 S6) — driver-side by design.

The reference renders top-k bar/pie charts from its row tables
(``/root/reference/src/analytics/plots.py:21-210``,
``meta_workflow.py:594-685``). The engine-side contract is: order, limit,
``toPandas`` — only k rows ever reach the driver; matplotlib is an optional
dependency (import-gated) and rendering never touches the row path.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # matplotlib is optional in this environment
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    HAVE_MPL = False


def _slug(name: str) -> str:
    # filename convention parity: lower + spaces->underscores
    # (meta_workflow.py:176-177)
    return name.lower().replace(" ", "_")


def top_k_pandas(df: DataFrame, order_cols: list, k: int) -> "object":
    """The engine-side part of every plot: top-k projection to pandas."""
    return df.orderBy(*order_cols).limit(k).toPandas()


def plot_bar(
    df: DataFrame,
    *,
    x: str,
    y: str,
    out_dir: str | Path,
    name: str,
    k: int = 10,
    order_desc: bool = True,
) -> str | None:
    """Bar chart of the top-k rows by ``y`` (card/deck-type stats shape).
    Returns the written path, or None when matplotlib is unavailable."""
    if not HAVE_MPL:
        return None
    pdf = top_k_pandas(df, [F.desc(y) if order_desc else F.asc(y), F.asc(x)], k)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{_slug(name)}.png"
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.bar(pdf[x].astype(str), pdf[y])
    ax.set_title(name)
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    ax.set_xticks(range(len(pdf)))
    ax.set_xticklabels(pdf[x].astype(str), rotation=45, ha="right")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return str(path)


def plot_pie(
    df: DataFrame, *, label: str, value: str, out_dir: str | Path, name: str,
    k: int = 10,
) -> str | None:
    """Pie chart of value share by label (deck-type share shape)."""
    if not HAVE_MPL:
        return None
    pdf = top_k_pandas(df, [F.desc(value), F.asc(label)], k)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{_slug(name)}.png"
    fig, ax = plt.subplots(figsize=(7, 7))
    ax.pie(pdf[value], labels=pdf[label].astype(str), autopct="%1.1f%%")
    ax.set_title(name)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return str(path)


def generate_meta_plots(
    meta_deck_summary: DataFrame,
    matchup_summary: DataFrame,
    out_dir: str | Path,
) -> dict[str, str | None]:
    """The Phase-0 plot set (``meta_workflow.py:594-685``): per-archetype
    games bar, share pie, and per-archetype matchup win-rate bars with
    mirror matchups excluded from the plot (P8 — totals keep them)."""
    plots: dict[str, str | None] = {
        "meta_games_by_type": plot_bar(
            meta_deck_summary, x="deck_type", y="games",
            out_dir=out_dir, name="Meta games by type",
        ),
        "meta_share_pie": plot_pie(
            meta_deck_summary, label="deck_type", value="meta_share",
            out_dir=out_dir, name="Meta share",
        ),
    }
    from clashroyale_datapipeline_agent_spark.operators.meta import (
        exclude_mirror_matchups,
    )

    no_mirror = exclude_mirror_matchups(
        matchup_summary, "attacker_type", "defender_type"
    )
    for row in matchup_summary.select("attacker_type").distinct().collect():
        t = row["attacker_type"]
        plots[f"matchups_{_slug(t)}"] = plot_bar(
            no_mirror.filter(F.col("attacker_type") == t),
            x="defender_type", y="win_rate",
            out_dir=out_dir, name=f"{t} matchups",
        )
    return plots
