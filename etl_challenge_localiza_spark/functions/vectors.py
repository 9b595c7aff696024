"""Vector math over ArrayType(FloatType) embedding columns.

All expressions fold sequentially over the array in element order with
double accumulation — deterministic, engine-portable (matches DuckDB's
list_sum/list_dot_product on double lists), and JVM-side (higher-order
functions, no UDF). For 100 TB scale the brute-force paths below are
the verification baseline; the approximate-NN paths live in
operators.similarity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with double accumulation in element order."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_sq(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        F.transform(a, lambda x: _d(x) * _d(x)), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def make_cosine_pandas_udf():
    """Arrow-vectorized scalar pandas_udf cosine — the sanctioned
    Python fallback when an expression outgrows built-ins (numpy BLAS
    per batch, one Arrow crossing per ~10k rows instead of per row).

    tests/test_similarity.py asserts it agrees with the JVM fold
    :func:`cosine` to float64 resolution; the JVM fold stays the
    default because it needs no Python workers at all.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no parameter annotations: this module uses postponed annotations
    # (PEP 563), which would reach pandas_udf's type-hint inference as
    # strings and be rejected — the explicit evalType default applies.
    def _cosine(a, b):
        am = np.stack(a.to_numpy()).astype("float64")
        bm = np.stack(b.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", am, bm)
        norms = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(dots / norms)

    return pandas_udf(_cosine, "double")
