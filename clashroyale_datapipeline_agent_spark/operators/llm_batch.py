"""Batched per-row LLM operators (SURVEY.md §2.11).

The reference calls its classifier LLM once per question on the driver
(``phase2_qna_workflow.py:224-267``). The distributed form — classifying a
whole DataFrame of questions — runs the client inside ``mapInPandas``:
Arrow batches amortize the Python boundary, one client per task (not per
row), and the batch size caps concurrent requests per executor (the
rate-limit knob). The client is injected, so tests run with a mock and
production swaps in a real HTTP client without touching the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from clashroyale_datapipeline_agent_spark.plans.qna_router import (
    parse_classifier_output,
    route_by_category,
)

CLASSIFIED_SCHEMA = (
    "question_id long, question string, category string, "
    "data_needs array<string>, route string, llm_error string"
)


def classify_questions(
    questions: DataFrame,
    make_client: Callable[[], Callable[[str], str]],
    *,
    question_col: str = "question",
    id_col: str = "question_id",
    max_retries: int = 0,
    backoff_s: float = 1.0,
    sleeper: Callable[[float], None] | None = None,
) -> DataFrame:
    """Classify + route every question row.

    ``make_client()`` is called once per task and returns the raw-output
    classifier callable — connection setup cost is per-partition, request
    cost per row, parsing/fallbacks identical to the driver path
    (``parse_classifier_output``).

    Robustness replays the reference client's semantics PER ROW, never
    per batch (``phase2_qna_workflow.py:231-238``: an LLM error falls
    back to other/SEND_ALL for THAT question; ``:246-252``: malformed
    JSON likewise):

    - a raising client retries up to ``max_retries`` times with linear
      backoff (``backoff_s * attempt``; ``sleeper`` injectable so tests
      don't sleep) — the rate-limit answer for 429-style failures;
    - a row still failing gets the reference's error fallback
      (category ``other``, needs ``SEND_ALL``) plus the error string in
      ``llm_error``; every other row in the batch is unaffected;
    - malformed/invalid JSON output is a PARSE fallback (handled inside
      ``parse_classifier_output``), not an error: ``llm_error`` stays
      NULL and the reference's category/needs defaults apply.
    """
    do_sleep = sleeper if sleeper is not None else __import__("time").sleep

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = make_client()
        for pdf in batches:
            cats, needs, routes, errors = [], [], [], []
            for q in pdf[question_col]:
                raw: str | None = None
                err: str | None = None
                for attempt in range(max_retries + 1):
                    try:
                        raw = client(q)
                        err = None
                        break
                    except Exception as exc:  # per-row tolerance
                        err = f"{type(exc).__name__}: {exc}"[:500]
                        if attempt < max_retries:
                            do_sleep(backoff_s * (attempt + 1))
                if err is not None:
                    # reference LLM-error fallback: other/SEND_ALL
                    c = parse_classifier_output("")
                else:
                    c = parse_classifier_output(raw)
                cats.append(c.category)
                needs.append(c.data_needs)
                routes.append(route_by_category(c))
                errors.append(err)
            yield pd.DataFrame(
                {
                    "question_id": pdf[id_col],
                    "question": pdf[question_col],
                    "category": cats,
                    "data_needs": needs,
                    "route": routes,
                    "llm_error": errors,
                }
            )

    return questions.mapInPandas(run, schema=CLASSIFIED_SCHEMA)


#: Raw generation outcome per seed; hash/token enrichment happens JVM-side
#: in :func:`generate_synthetic` (keep the Python batch loop minimal).
GENERATED_RAW_SCHEMA = (
    "seed_id long, prompt string, output string, reject_reason string"
)


def generate_synthetic(
    seeds: DataFrame,
    make_client: Callable[[], Callable[[str], str]],
    *,
    prompt_col: str = "prompt",
    id_col: str = "seed_id",
    validate: Callable[[str], str | None] | None = None,
    max_retries: int = 0,
    backoff_s: float = 1.0,
    sleeper: Callable[[float], None] | None = None,
) -> DataFrame:
    """Synthetic-data generation at scale — the step between a seed/prompt
    table and the curation pipeline.

    Same execution contract as :func:`classify_questions` (one client per
    task, Arrow batches, per-row retry/backoff, a failing row never kills
    its batch), plus an injected ``validate(output) -> reject_reason |
    None`` hook so schema/grounding checks run NEXT TO the generation
    (rejecting inside the task avoids shipping garbage through the
    shuffle). Failures record ``reject_reason`` (``llm_error:...`` or the
    validator's reason) with a NULL output.

    The returned frame adds JVM-side enrichment the downstream curation
    ops key on — ``parsed_ok``, whitespace ``n_tokens``, and an md5
    ``content_hash`` (the exact-dedup key: synthetic generators repeat
    themselves, so generation composes with ``dedup.exact_dedup`` and
    ``sampling.plan_source_mixture`` before anything trains on it).
    """
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.operators.text import tokens_col

    do_sleep = sleeper if sleeper is not None else __import__("time").sleep

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = make_client()
        for pdf in batches:
            outs: list[str | None] = []
            rejects: list[str | None] = []
            for prompt in pdf[prompt_col]:
                raw: str | None = None
                err: str | None = None
                for attempt in range(max_retries + 1):
                    try:
                        raw = client(prompt)
                        err = None
                        break
                    except Exception as exc:  # per-row tolerance
                        err = f"llm_error:{type(exc).__name__}: {exc}"[:500]
                        if attempt < max_retries:
                            do_sleep(backoff_s * (attempt + 1))
                if err is None and validate is not None and raw is not None:
                    err = validate(raw)
                if err is not None:
                    outs.append(None)
                    rejects.append(err)
                else:
                    outs.append(raw)
                    rejects.append(None)
            yield pd.DataFrame(
                {
                    "seed_id": pdf[id_col],
                    "prompt": pdf[prompt_col],
                    "output": outs,
                    "reject_reason": rejects,
                }
            )

    raw = seeds.mapInPandas(run, schema=GENERATED_RAW_SCHEMA)
    return raw.select(
        "seed_id",
        "prompt",
        "output",
        "reject_reason",
        F.col("reject_reason").isNull().alias("parsed_ok"),
        F.when(
            F.col("output").isNotNull(), F.size(tokens_col(F.col("output")))
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_tokens"),
        F.when(F.col("output").isNotNull(), F.md5("output")).alias(
            "content_hash"
        ),
    )
