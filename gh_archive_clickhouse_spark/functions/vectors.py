"""Dense-vector math over ``array<float>`` embedding columns.

Built from ``zip_with``/``aggregate`` higher-order functions: the fold
runs inside the JVM per row (no shuffle, no Python), and the sequential
left-to-right summation order is reproducible by SQL oracles
(list_transform + list_aggregate fold the same way), which keeps
floating-point results bit-comparable after widening float → double.

At 100 TB scale the alternative is a Pandas UDF with numpy — higher
per-batch throughput but an Arrow serialization hop; see
operators/similarity.py for when each is the right call.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, computed in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm, double precision."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
