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
    "data_needs array<string>, route string"
)


def classify_questions(
    questions: DataFrame,
    make_client: Callable[[], Callable[[str], str]],
    *,
    question_col: str = "question",
    id_col: str = "question_id",
) -> DataFrame:
    """Classify + route every question row.

    ``make_client()`` is called once per task and returns the raw-output
    classifier callable — connection setup cost is per-partition, request
    cost per row, parsing/fallbacks identical to the driver path
    (``parse_classifier_output``).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = make_client()
        for pdf in batches:
            cats, needs, routes = [], [], []
            for q in pdf[question_col]:
                c = parse_classifier_output(client(q))
                cats.append(c.category)
                needs.append(c.data_needs)
                routes.append(route_by_category(c))
            yield pd.DataFrame(
                {
                    "question_id": pdf[id_col],
                    "question": pdf[question_col],
                    "category": cats,
                    "data_needs": needs,
                    "route": routes,
                }
            )

    return questions.mapInPandas(run, schema=CLASSIFIED_SCHEMA)
