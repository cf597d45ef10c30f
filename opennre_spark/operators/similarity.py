"""Similarity search over embedding columns (array<float>):
  - brute-force cosine top-k vs a query vector (exact baseline);
  - random-hyperplane LSH self-join (the scale path for all-pairs
    near-neighbor: candidates from shared sign-bands, verified with
    exact cosine).

Everything is Spark SQL higher-order functions (JVM codegen): dot
products via zip_with + aggregate in double precision — no Python UDF,
no driver-side collect of vectors (only the query vector is a literal).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. One narrow scan
    + a k-row ordered take (Spark's TakeOrderedAndProject — no full
    sort materialization). Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5
    cos = (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias(
        "cos_sim"
    )
    return (
        embeddings.select(id_col, cos)
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def hyperplane_signature(
    embeddings: DataFrame,
    dim: int,
    num_planes: int = 16,
    num_bands: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit signature under `num_planes` seeded random hyperplanes,
    split into bands: (id, band, band_bits). Cosine-similar vectors
    agree on sign bits with prob 1 - theta/pi per plane.
    """
    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]
    bits = [
        F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(p) for p in plane])) > 0, 1
        ).otherwise(0).alias(f"__b{i}")
        for i, plane in enumerate(planes)
    ]
    df = embeddings.select(id_col, vec_col, *bits)
    per_band = num_planes // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                sum(
                    (
                        F.col(f"__b{bi * per_band + r}") * F.lit(2**r)
                        for r in range(per_band)
                    ),
                    F.lit(0),
                ).alias("band_bits"),
            )
            for bi in range(num_bands)
        ]
    )
    return df.select(id_col, vec_col, F.explode(bands).alias("b")).select(
        id_col, vec_col, "b.band", "b.band_bits"
    )


def ann_self_join(
    embeddings: DataFrame,
    dim: int,
    cosine_threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """All-pairs approximate near-neighbor: hyperplane-LSH blocking
    (equi-join on band bits) + exact cosine verification on candidates.
    Returns (id_a, id_b, cos_sim). Linear in docs x bands instead of
    O(n^2) — the 100 TB path for embedding near-dup detection.
    """
    sigs = hyperplane_signature(embeddings, dim, id_col=id_col, vec_col=vec_col, **lsh_kwargs)
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias(
        "cos_sim"
    )
    return cand.select("id_a", "id_b", cos).filter(
        F.col("cos_sim") >= F.lit(cosine_threshold)
    )
