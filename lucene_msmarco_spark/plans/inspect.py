"""Physical-plan inspection helpers — the engine's guard rails for the
properties that matter at 100 TB (SURVEY.md §4):

- the postings side of a query joins via **broadcast hash join** (the
  tiny query-term table broadcasts; postings never shuffle);
- scans **prune columns** (ReadSchema carries only what's selected) and
  **push filters** (PushedFilters non-empty where expected);
- a plan's **exchange (shuffle) count** stays at the designed number —
  a regression adding an extra shuffle is a scale bug even when tests
  still pass on 60k rows.

Used by tests/test_plans.py; also handy interactively:

    from lucene_msmarco_spark.plans.inspect import plan_summary
    print(plan_summary(df))
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    try:
        return jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"  # type: ignore[attr-defined]
        )
    except Exception:
        # fallback: capture DataFrame.explain's stdout
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


@dataclass
class PlanSummary:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_broadcast_exchanges: int
    wholestage_codegen_spans: int
    read_schemas: list[str]
    pushed_filters: list[str]
    text: str

    def __str__(self) -> str:  # pragma: no cover - debug aid
        return (
            f"exchanges={self.n_exchanges} "
            f"bhj={self.n_broadcast_joins} smj={self.n_sortmerge_joins} "
            f"codegen_spans={self.wholestage_codegen_spans}\n"
            + "\n".join(self.read_schemas)
        )


def plan_summary(df: DataFrame) -> PlanSummary:
    text = formatted_plan(df)
    return PlanSummary(
        # shuffle exchanges only — broadcast exchanges are not shuffles
        n_exchanges=len(re.findall(r"\bExchange (?:hash|range|Single)",
                                   text)),
        n_broadcast_joins=text.count("BroadcastHashJoin"),
        n_sortmerge_joins=text.count("SortMergeJoin"),
        n_broadcast_exchanges=text.count("BroadcastExchange"),
        # AQE formatted plans mark codegen nodes "* Node (n)" and detail
        # lines "[codegen id : k]" rather than WholeStageCodegen blocks
        wholestage_codegen_spans=(
            len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
            or len(set(re.findall(r"codegen id : (\d+)", text)))
            or len(re.findall(r"^\s*(?:[:+\-| ]*)\* \w", text, re.M))
        ),
        read_schemas=re.findall(r"ReadSchema: (.+)", text),
        pushed_filters=re.findall(r"PushedFilters: (.+)", text),
        text=text,
    )


def assert_no_cartesian(df: DataFrame) -> None:
    text = formatted_plan(df)
    assert "CartesianProduct" not in text, (
        "plan contains a cartesian product:\n" + text
    )


def assert_max_shuffles(df: DataFrame, n: int) -> PlanSummary:
    s = plan_summary(df)
    assert s.n_exchanges <= n, (
        f"plan has {s.n_exchanges} shuffle exchanges (budget {n}):\n"
        + s.text
    )
    return s
