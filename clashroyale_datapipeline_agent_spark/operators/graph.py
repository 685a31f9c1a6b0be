"""Connected components — transitive closure of near-dup pairs.

The dedup pipelines emit PAIRS (id_a, id_b); real-world dedup keeps one
document per *cluster*, and clusters are the connected components of the
pair graph (A~B, B~C ⇒ {A,B,C} even if A,C never met in a bucket). The
greedy drop-larger-id rule in ``minhash_lsh_dedup`` under-merges exactly
when chains exceed one hop; this operator closes them.

Spark-first design: iterative min-label propagation as a driver loop of
DataFrame joins — each vertex repeatedly adopts the smallest label among
itself and its neighbors; fixpoint = components labeled by their minimum
vertex id. Converges in O(graph diameter) rounds (near-dup clusters are
shallow — a handful of rounds in practice). Each round is one shuffle on
vertex id; ``localCheckpoint`` cuts the lineage so plan size stays O(1)
in rounds (same discipline as the Phase-0 accumulate loop). The driver
sees only the per-round changed-count scalar — the data never leaves the
cluster. Cross-engine: the oracle twin is a recursive CTE
(``graph_connected_components`` in plans/text_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Release a SUPERSEDED localCheckpoint's cached blocks (guide §5:
    unpersist when done). Loop operators otherwise hold one persisted
    RDD per round until the session's context cleaner gets around to
    it — bounded locally by round counts, but executor storage grows
    linearly with rounds at scale. Only call this on a checkpoint that
    no live DataFrame will ever read again: a local checkpoint's
    lineage is truncated, so an unpersisted one cannot be recomputed.
    Best-effort — on any JVM-handle change this degrades to the old
    leave-it-to-the-cleaner behavior."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup must never fail a query
        pass


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex of the undirected pair graph with the minimum
    vertex id of its component. Returns (id, component).

    ``max_iter`` bounds the rounds (diameter guard); raises if the
    fixpoint is not reached so truncated clusterings never slip through.
    """
    # both orientations from ONE pass over edges (explode, round-13):
    # the two-leg union evaluated the caller's edge lineage — typically
    # a full LSH candidate/verify pipeline — once per leg inside the
    # sym materialization job
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    def _hop(lbl: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
        # ``carry`` columns ride the lbl side of the (single) join —
        # the round start's label travels with each row so the changed
        # test needs no second join against the previous checkpoint
        nbr_min = (
            sym.join(lbl, sym.v == lbl.id)
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        return lbl.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
            *carry,
        )

    prev_ck = labels
    for i in range(max_iter):
        # each round's checkpoint carries the round-start label as
        # ``_orig`` (round-13): the changed test becomes a filter-count
        # over the new checkpoint alone instead of a shuffle join of
        # the new and old label tables — one exchange-free job per
        # round, and labels only ever decrease so new < _orig is
        # exactly the old new < old comparison
        start = labels.select("id", "component", F.col("component").alias("_orig"))
        if i < 2:
            # small-diameter graphs (the common near-dup case) converge
            # in 2-4 plain hash-min rounds; keep those rounds at the
            # cheap one-hop shape
            new_labels = _hop(start, carry=("_orig",)).localCheckpoint()
        else:
            # still unconverged at round 2 ⇒ long chains — escalate to
            # the CC-MR / hash-min-with-path-compression round: TWO
            # hash-min hops plus a pointer-jump, each label shortcut
            # through the round's own label map (labels are always node
            # ids and every node id is a labels key, so the inner join
            # preserves all rows and only ever LOWERS a label within
            # its own component). Fixpoint and changed==0 detection are
            # untouched (min-label is the unique fixpoint; every step
            # is monotone), but chains collapse in O(log diameter)
            # rounds instead of O(diameter). All three steps live
            # inside ONE checkpoint job: a round stays exactly two
            # serial driver jobs, and round count IS the cost of this
            # loop — each round is a global shuffle barrier with a
            # straggler tail, locally ~0.3 s of fixed job overhead
            # (measured 14 -> 6 rounds on the image near-dup report's
            # component stage).
            two_hop = _hop(_hop(start, carry=("_orig",)), carry=("_orig",))
            lut = two_hop.select(
                F.col("id").alias("_k"), F.col("component").alias("_v")
            )
            new_labels = (
                two_hop.join(lut, two_hop.component == lut._k)
                .select("id", F.col("_v").alias("component"), "_orig")
                .localCheckpoint()
            )
        changed = new_labels.filter(
            F.col("component") < F.col("_orig")
        ).count()
        # the count above materialized this round's checkpoint; the
        # previous round's blocks are now unreachable by any future
        # read — release them so persisted storage stays O(1) in
        # rounds instead of O(rounds) (guide §5)
        _unpersist_checkpoint(prev_ck)
        prev_ck = new_labels
        labels = new_labels.select("id", "component")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def leakage_safe_split(
    docs: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "doc_id",
    boundaries: list[tuple[str, str]] | None = None,
    last: str = "test",
    max_iter: int = 20,
) -> DataFrame:
    """Train/val/test assignment that keeps near-duplicates together.

    Splitting documents independently leaks evaluation data: a test doc
    whose near-dup sits in train is effectively memorized. Here the split
    key is the document's near-dup CLUSTER (connected component of the
    pair graph; unpaired docs are their own cluster), hashed through
    :func:`~clashroyale_datapipeline_agent_spark.operators.sampling.hash_split_col`
    — so every member of a cluster lands in the same split, and the
    assignment stays deterministic across engines, runs, and cluster
    sizes. Adds ``cluster`` (the split unit: the component's minimum doc
    id, or the doc's own id when unpaired) and ``split`` columns.
    """
    from clashroyale_datapipeline_agent_spark.operators.sampling import (
        hash_split_col,
    )

    bounds = boundaries or [("train", "cc"), ("val", "e6")]
    comps = connected_components(edges, max_iter=max_iter).withColumnRenamed(
        "id", id_col
    )
    return (
        docs.join(comps, id_col, "left")
        .withColumn("cluster", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("split", hash_split_col(F.col("cluster"), bounds, last))
        .drop("component")
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Power iteration as pure DataFrame joins: each round every node sends
    ``rank/outdeg`` along its out-edges and collects
    ``(1−d) + d·Σ incoming`` (per-node constant form, rank init 1.0).
    A FIXED iteration count — not convergence detection — keeps the
    computation replayable by an engine without loops (the oracle twin
    unrolls the same three rounds as stacked CTEs) and bounds cost:
    each round is exactly one (dst) shuffle over the edge list.

    Scale shape: out-degrees are computed once and live with the edges
    (one join before the loop, reused every round); ``localCheckpoint``
    every ``checkpoint_every`` rounds bounds plan depth for long runs —
    same discipline as :func:`connected_components` — while short
    fixed-iteration runs (the oracle-able 3-round form) fuse into ONE
    plan with zero mid-loop materializations: each eager checkpoint is
    a full job, and three of them dominated the query's wall-clock.
    Nodes with no in-edges keep the (1−d) floor via the left join +
    coalesce.

    Node universe and dangling-node CONTRACT: ranks cover every node
    appearing as ``src`` OR ``dst``. Sink-only nodes (in-edges only)
    receive mass and hold a rank but emit nothing — this is the
    simplified per-node-constant form ``(1−d) + d·Σ`` (the classic
    Spark/GraphX example semantics), NOT the stochastic-matrix form:
    dangling mass is absorbed, so Σrank is not conserved round to
    round. Rankings are unaffected for graphs without sinks; callers
    modeling an undirected walk (both orientations of each edge) never
    have sinks.

    Output: ``(node, rank, outdeg)`` with ``outdeg = 0`` for sinks.
    """
    # materialize the edge list ONCE (round-13, guide §2.4/§5): without
    # this, the edges lineage — for the pagerank query a lineitem⋈orders
    # + distinct — is embedded and re-executed in every consumer of the
    # un-checkpointed subtrees: deg inside the ed checkpoint job, both
    # union legs of nodes in the final job, and deg again in the final
    # outdeg join (~5 upstream evaluations for one query; Spark does no
    # cross-branch common-subexpression elimination on DataFrames)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    # rank universe = src ∪ dst: a sink-only node must appear (and keep
    # collecting mass) even though it never contributes
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    base = F.lit(1.0 - damping)
    prev_ck: DataFrame | None = None
    for i in range(iterations):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            ranks.select("node")
            .join(contribs, F.col("dst") == F.col("node"), "left")
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
            # the new (eager) checkpoint is materialized; the previous
            # one is superseded — release its blocks (guide §5)
            if prev_ck is not None:
                _unpersist_checkpoint(prev_ck)
            prev_ck = ranks
    return ranks.join(deg, ranks.node == deg.src, "left").select(
        "node", "rank", F.coalesce("outdeg", F.lit(0)).cast("bigint").alias("outdeg")
    )


def triangle_counts(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-node triangle counts via the degree-ordered edge orientation.

    Triangles measure local clustering — in dedup/link graphs they
    separate tight near-dup cliques from incidental chains. The naive
    three-way edge self-join explodes on hub nodes (a degree-d node
    spawns d² wedge candidates); the classical fix (Schank-Wagner /
    Cohen's MapReduce formulation) orients every undirected edge from
    its LOWER-degree endpoint to the higher (ties by id), which bounds
    per-node out-degree by O(sqrt(m)) and the wedge join by the graph's
    arboricity — the difference between hours and minutes at 100 TB.

    Input edges are treated as UNDIRECTED (direction and duplicates are
    normalized away; self-loops dropped). Three shuffles: degree agg,
    wedge join on the middle node, closure join on the (src, dst) pair.
    Every triangle credits all 3 corners once.
    """
    # materialize the normalized edge set once (round-13): it feeds deg
    # (both union legs) and the with_deg join — 3 evaluations of the
    # caller's edge lineage inside the adj checkpoint job otherwise
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    # orient low-(degree, id) -> high-(degree, id)
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # checkpoint the oriented adjacency: it feeds all THREE sides of the
    # wedge/closure joins, and without the lineage cut each alias
    # re-prints (and partially re-executes) the whole dedup+degree+join
    # pipeline — the same O(1)-plan discipline as connected_components
    adj = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).localCheckpoint(eager=True)
    a, b, c = adj.alias("a"), adj.alias("b"), adj.alias("c")
    triangles = (
        a.join(b, F.col("a.t") == F.col("b.s"))
        .join(
            c,
            (F.col("c.s") == F.col("a.s")) & (F.col("c.t") == F.col("b.t")),
        )
        .select(
            F.col("a.s").alias("x"), F.col("a.t").alias("y"), F.col("b.t").alias("z")
        )
    )
    # one explode credits all 3 corners in a single pass over the
    # triangle set (a 3-way union would read the closure join 3 times)
    corners = triangles.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    rounds: int | None = None,
) -> list[tuple[DataFrame, DataFrame]]:
    """Iterative k-core peeling: repeatedly delete vertices whose CURRENT
    degree is below ``k`` (with all their edges) until the graph is
    stable — what survives is the k-core, the standard density filter
    before community detection or embedding training on interaction
    graphs. Returns the per-round [(nodes_with_degree, edges)] trail so
    callers can audit the peel; the last entry is the core.

    ``rounds=None`` peels to the fixpoint (bounded by max 50 — degeneracy
    peels converge in O(peel depth) rounds); a fixed ``rounds`` runs
    exactly that many (the oracle-checked query unrolls the same count in
    SQL). Each round is one degree aggregation + one two-sided semi-join,
    ``localCheckpoint`` cutting lineage per round like
    :func:`connected_components` — at 100 TB every round shuffles the
    shrinking edge list on its endpoints and nothing else.
    """
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    trail: list[tuple[DataFrame, DataFrame]] = []
    max_rounds = rounds if rounds is not None else 50
    # each round's edge count is next round's "previous" count — carry
    # it in the driver instead of re-counting the old checkpoint every
    # round (round-13: one fewer job per peel round)
    prev_n = cur.count() if rounds is None else None
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).localCheckpoint()
        nxt = (
            cur.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .localCheckpoint()
        )
        trail.append((keep, nxt))
        if rounds is None:
            nxt_n = nxt.count()
            if nxt_n == prev_n:
                return trail
            prev_n = nxt_n
        cur = nxt
    if rounds is None:
        raise RuntimeError(f"kcore_peel did not stabilize in {max_rounds} rounds")
    return trail


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    rounds: int = 3,
) -> list[tuple[DataFrame, int]]:
    """Synchronous label propagation (Raghavan et al. 2007) — the cheap
    community detector an interaction-graph pipeline runs after the
    k-core density filter (:func:`kcore_peel`). Every vertex starts
    labeled with its own id; each round it adopts the MODE of its
    neighbors' labels, ties broken toward the smallest label, isolated
    vertices keeping their own. Returns the per-round
    ``[(labels, n_changed)]`` trail (labels = (id, label)).

    Deterministic by construction: the mode/tie-break rule is a total
    order (count DESC, label ASC), so unlike the randomized-order LPA in
    the literature the fixpoint trail is replayable — which is what lets
    an unrolled SQL oracle check it round for round.

    Scale shape: each round is one shuffle of the (directed-both-ways)
    edge list on dst to fetch neighbor labels, one (vertex, label) count
    agg, and one max-by reduce per vertex — all width-bounded by the
    edge list, nothing quadratic. ``localCheckpoint`` per round keeps
    the plan O(1) in rounds, same discipline as
    :func:`connected_components`. The synchronous variant (vs async
    sweeps) is the one that maps to bulk dataflow: no intra-round
    ordering dependence, so partitioning is free to follow the edge
    list.
    """
    # one pass over the edge lineage for both orientations (round-13,
    # same reshape as connected_components); u != v is orientation-
    # symmetric so one post-explode filter replaces the per-leg pair
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    trail: list[tuple[DataFrame, int]] = []
    for _ in range(rounds):
        nbr_label_counts = (
            sym.join(labels, sym.v == labels.id)
            .groupBy(F.col("u").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # mode with (count DESC, label ASC) tie-break via max_by on a
        # single orderable struct — one reduce, no window sort
        winner = nbr_label_counts.groupBy("id").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m")
        ).select("id", (-F.col("m.nl")).alias("new_label"))
        # the old label is already on the join's lbl side, so the
        # checkpoint carries the changed flag and the per-round count
        # is a filter over the new checkpoint alone — no second shuffle
        # join of old vs new labels (round-13, the
        # connected_components discipline)
        cp = (
            labels.join(winner, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", F.col("label")).alias("label"),
                (
                    F.coalesce("new_label", F.col("label"))
                    != F.col("label")
                ).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = cp.filter(F.col("_chg")).count()
        new_labels = cp.select("id", "label")
        trail.append((new_labels, changed))
        labels = new_labels
    return trail
