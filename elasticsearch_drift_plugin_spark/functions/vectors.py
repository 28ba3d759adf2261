"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (``zip_with`` / ``aggregate``), JVM-side, no UDFs.

Accumulation is in DOUBLE, left-to-right over the array, which is exactly
what an ``unnest``-based SUM does per-row in the DuckDB oracle — bit-identical
results across engines for the same input vectors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vec(vals) -> Column:
    """A constant double array as ONE parsed expression.

    ``F.array(*[F.lit(x) ...])`` costs one py4j round trip per element —
    ~0.5 s of driver latency per 1024-element constant (measured); a single
    ``F.expr`` string is one round trip total. The ``D`` suffix makes each
    literal a DOUBLE (never DECIMAL), parsed via Double.parseDouble — an
    exact round trip of Python's repr.
    """
    return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
