"""Physical-plan inspection helpers.

The engine writes no custom Catalyst rules or strategies (SURVEY.md §4: the
reference has no optimizer either — everything maps to built-ins). What it
does instead is *assert the shapes* Catalyst should produce: these helpers
back the plan-invariant tests (tests/test_plans.py) and let users audit the
scale-critical properties documented in SCALE.md — single partial-agg
shuffle, column pruning reaching the scan, Python only where declared.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_PYTHON_NODES = re.compile(r"BatchEvalPython|ArrowEvalPython|PythonUDF|MapInPandas|FlatMapGroupsInPandas")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (same content as ``df.explain(mode)``)."""
    jvm_mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jvm_mode)


def hash_exchange_count(df: DataFrame) -> int:
    """Number of hash-partitioning shuffles (excludes the rangepartitioning
    exchange a final orderBy adds)."""
    return sum("hashpartitioning" in l for l in explain_str(df).splitlines())


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan evaluates any Python (Arrow-batched or row-wise)."""
    return bool(_PYTHON_NODES.search(explain_str(df)))


def codegen_span_ids(df: DataFrame) -> set[str]:
    """Distinct WholeStageCodegen span ids — fewer spans = wider codegen."""
    return set(re.findall(r"codegen id : (\d+)", explain_str(df)))


def read_schema(df: DataFrame) -> list[str]:
    """Column lists of each source scan's ReadSchema (pruning audit)."""
    return re.findall(r"ReadSchema: (\S+)", explain_str(df))
