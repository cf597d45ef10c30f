"""Let-binding for Spark SQL higher-order-function pipelines.

Spark's higher-order functions (transform / filter / aggregate ...) are
CodegenFallback: they evaluate interpreted, outside whole-stage codegen,
so neither codegen subexpression elimination nor any other CSE applies
to them. Combined with Catalyst's projection collapse — which inlines a
`withColumn` intermediate into every downstream reference — an
expression pipeline like

    df.withColumn("hv", transform(shingles, hash))
      .select(array_min(transform("hv", f1)), ... x24)

re-evaluates the WHOLE shingle+hash array once per consuming
expression (measured r7: 24x for the MinHash signature columns — 45s of
a 77s query; per-character for the winnowing rolling hash).

`hof_let(expr, fn)` binds `expr`'s VALUE to a lambda variable by
wrapping it in a single-element array and applying `transform`: the
array (hence `expr`) is evaluated exactly once per row, and every
reference to the lambda variable inside `fn` is a value lookup, not a
re-evaluation — the `let` of expression-land. Results are identical by
construction (same expression, evaluated once).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hof_let(expr: Column, fn) -> Column:
    """Evaluate `expr` once per row and pass its value to `fn`.

    fn: Column -> Column (the body, referencing the bound value).
    Returns fn(value) as a Column. Nesting is fine (pyspark generates
    fresh lambda-variable names per HOF).
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)
