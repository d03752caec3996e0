"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a (small, broadcast)
  query set — the correctness baseline. Dot products run as SQL
  higher-order functions (zip_with + aggregate) entirely JVM-side,
  summed left-to-right so an ANSI-SQL oracle reproduces the doubles
  bit-for-bit.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic planes from a seeded RNG, inlined as literals);
  candidates share >=1 of ``n_tables`` bucket keys, then exact cosine
  re-ranks. Probe cost ~ bucket size x n_tables instead of corpus
  size. Recall<1 by construction; verified against brute force AND
  value-for-value against a DuckDB oracle that replays the same seeded
  planes (gate ``ann_lsh_topk``).

Plane shipping: at dim<=128 the literal arrays are a few hundred KB of
plan text — cheap, and they keep the whole bucket computation inside
whole-stage codegen. At word2vec-scale dims (768+), switch the bucket
step to a pandas UDF whose closure captures the (n_tables, bits, dim)
plane tensor — Spark broadcasts the serialized closure once per
executor and the signs come from one numpy matmul per batch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), "
    "(acc, v) -> acc + v)"
)


def _as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    dv = _as_double(vec_col)
    return df.withColumn("__v", F.expr(dv)).withColumn(
        "__norm", F.sqrt(F.expr(DOT.format(a="__v", b="__v")))
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos, rank<=k) — exact brute force.

    Queries are broadcast; corpus streams once. Rank ties break on
    vec_id ascending; cos is rounded to 6 digits *before* ranking so
    the ordering itself is float-noise-proof.
    """
    base = with_norm(emb, vec_col).select(
        F.col(id_col).cast("long").alias("vec_id"), "__v", "__norm"
    )
    q = base.where(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__norm").alias("__qnorm"),
    )
    pairs = base.join(F.broadcast(q), on=F.col("vec_id") != F.col("query_id"))
    cos = F.expr(DOT.format(a="__qv", b="__v")) / (F.col("__qnorm") * F.col("__norm"))
    scored = pairs.select(
        "query_id", "vec_id", F.round(cos, 6).alias("cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_tables: int, bits: int, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits, dim))


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Bucket key per table = sign-bit string of ``bits`` hyperplane dot
    products. Join on (table, bucket) -> candidates -> exact cosine ->
    per-query top-k. At 10^12 scale the bucket join replaces the full
    cross product; planes ship as literal arrays (a few KB).
    """
    planes = _hyperplanes(dim, n_tables, bits, seed)
    base = with_norm(emb, vec_col).select(
        F.col(id_col).cast("long").alias("vec_id"), "__v", "__norm"
    )

    def bucket_cols(prefix: str):
        cols = []
        for t in range(n_tables):
            bit_exprs = []
            for b in range(bits):
                arr = "array(" + ", ".join(repr(float(x)) for x in planes[t, b]) + ")"
                bit_exprs.append(
                    f"case when {DOT.format(a='__v', b=arr)} >= 0 then '1' else '0' end"
                )
            cols.append(F.expr("concat(" + ", ".join(bit_exprs) + ")").alias(f"{prefix}{t}"))
        return cols

    hashed = base.select("vec_id", "__v", "__norm", *bucket_cols("bk")).persist()
    stacked = None
    for t in range(n_tables):
        fr = hashed.select(
            "vec_id", "__v", "__norm", F.lit(t).alias("table"), F.col(f"bk{t}").alias("bucket")
        )
        stacked = fr if stacked is None else stacked.unionByName(fr)

    q = stacked.where(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__norm").alias("__qnorm"),
        "table",
        "bucket",
    )
    cand = (
        stacked.join(F.broadcast(q), on=["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "__qv", "__qnorm", "__v", "__norm")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cos = F.expr(DOT.format(a="__qv", b="__v")) / (F.col("__qnorm") * F.col("__norm"))
    scored = cand.select("query_id", "vec_id", F.round(cos, 6).alias("cos"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    n_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """(id_a < id_b, cos >= threshold) via the same LSH bucketing."""
    planes = _hyperplanes(dim, n_tables, bits, seed)
    base = with_norm(emb, vec_col).select(
        F.col(id_col).cast("long").alias("vec_id"), "__v", "__norm"
    )
    stacked = None
    for t in range(n_tables):
        bit_exprs = []
        for b in range(bits):
            arr = "array(" + ", ".join(repr(float(x)) for x in planes[t, b]) + ")"
            bit_exprs.append(
                f"case when {DOT.format(a='__v', b=arr)} >= 0 then '1' else '0' end"
            )
        fr = base.select(
            "vec_id",
            "__v",
            "__norm",
            F.lit(t).alias("table"),
            F.expr("concat(" + ", ".join(bit_exprs) + ")").alias("bucket"),
        )
        stacked = fr if stacked is None else stacked.unionByName(fr)
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), on=["table", "bucket"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
            F.col("x.__v").alias("__va"),
            F.col("x.__norm").alias("__na"),
            F.col("y.__v").alias("__vb"),
            F.col("y.__norm").alias("__nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.expr(DOT.format(a="__va", b="__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
