"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline; dot products via
  zip_with/aggregate Catalyst expressions (JVM codegen, no UDF).
* IVF (inverted-file) ANN — the scale path: vectors are assigned to their
  nearest centroid (coarse quantizer) at build; a query probes the nprobe
  nearest centroids and searches exactly only inside those cells. With a
  broadcast centroid table the assignment is a narrow map — the only
  shuffle is the (small) per-cell candidate aggregation. (Public: IVF/IVFPQ
  from Jégou et al. 2011 / FAISS.)
* random-hyperplane LSH near-dup pairs (Charikar 2002): deterministic
  seeded planes, sign-bit bucket key, pair join within buckets.

Everything float64 before rounding to *_e6 integers so the DuckDB oracle
(list_cosine_similarity) agrees bit-for-bit on the reported integers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL similarity (excluded from
    # top-k / cell assignment) instead of an ANSI DIVIDE_BY_ZERO error —
    # Spark 4 runs ANSI mode by default, so a single all-zeros embedding
    # would otherwise kill the whole job
    return F.try_divide(dot_col(a, b), norm_col(a) * norm_col(b))


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def brute_cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. The scan is embarrassingly parallel; the
    top-k is a TakeOrdered (per-partition heaps + driver merge), not a
    global sort."""
    q = _lit_vec(query_vec)
    scored = emb.select(
        F.col(id_col),
        F.floor(cosine_col(F.col(vec_col), q) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("cosine_e6"),
    )
    return scored.orderBy(F.col("cosine_e6").desc(), F.col(id_col).asc()).limit(k)


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine). ``centroids``
    are (centroid_id, vector) — deterministic (e.g. fixed training sample).
    Ties break toward the smallest centroid id (ORDER BY sim DESC, cid ASC
    — the same rule the SQL oracle's row_number() uses).

    Scale design: the centroids are a BROADCAST DataFrame cross-joined
    against the vectors, so plan size is O(1) in the number of cells — a
    real IVF build uses thousands of centroids, and folding each one in as
    a literal array inside a nested when-chain is a Catalyst plan-size /
    codegen killer (the literal-fold anti-pattern). The per-vector argmax
    is a groupBy with map-side partial aggregation; the broadcast join
    itself is a narrow map over the vector table."""
    spark = emb.sparkSession
    if not centroids:
        # degenerate input keeps the pre-broadcast contract: no cell
        return emb.select(
            F.col(id_col), F.col(vec_col), F.lit(-1).alias("cell")
        )
    cent = spark.createDataFrame(
        [(int(cid), [float(v) for v in cvec]) for cid, cvec in centroids],
        schema="cid int, cvec array<double>",
    )
    raw_sim = cosine_col(F.col(vec_col), F.col("cvec"))
    # a zero-norm vector (or centroid) yields NaN cosine; Spark orders NaN
    # ABOVE every double, so an unguarded max() would assign such vectors
    # to a real cell — null the NaN so it loses, and fall back to cell=-1
    # when every sim is NaN (the pre-broadcast when-chain's behavior)
    sim = F.when(F.isnan(raw_sim), F.lit(None)).otherwise(raw_sim)
    scored = emb.join(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.struct(
            sim.alias("sim"),
            (-F.col("cid")).alias("neg_cid"),  # max() -> smallest cid on ties
            F.col("cid").alias("cid"),
        ).alias("sc"),
    )
    return (
        scored.groupBy(id_col, vec_col)
        .agg(F.max("sc").alias("best"))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.when(F.col("best.sim").isNull(), F.lit(-1))
            .otherwise(F.col("best.cid"))
            .alias("cell"),
        )
    )


def ivf_topk(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the nprobe closest cells, exact search inside them.
    The probed-cell filter prunes the scan (at scale the assignment is a
    partition column of the vector table -> partition pruning)."""
    qv = np.asarray(query_vec, dtype=np.float64)

    def cos(c):
        cv = np.asarray(c, dtype=np.float64)
        return float(cv @ qv / (np.linalg.norm(cv) * np.linalg.norm(qv)))

    probed = sorted(centroids, key=lambda c: (-cos(c[1]), c[0]))[:nprobe]
    cells = [cid for cid, _ in probed]
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("cell").isin(cells))
    q = _lit_vec(query_vec)
    return (
        cand.select(
            F.col(id_col),
            F.col("cell"),
            F.floor(cosine_col(F.col(vec_col), q) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("cosine_e6"),
        )
        .orderBy(F.col("cosine_e6").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 16,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine_e6 >= threshold):
    exact cosine verification applied to LSH bucket candidates — a
    composition of :func:`lsh_candidate_pairs` + the exact filter, never an
    all-pairs join. Candidate recall is probabilistic (raise ``n_tables`` /
    lower ``n_planes`` to push it toward 1); every REPORTED pair is exact.
    The O(n^2) all-pairs form lives only in the test-only oracle helper
    :func:`all_pairs_cosine_pairs`."""
    cand = lsh_candidate_pairs(
        emb, n_planes, n_tables, seed, dim, id_col, vec_col
    )
    return _exact_verified(cand, threshold)


def all_pairs_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TEST-ONLY oracle helper: exact all-pairs cosine (O(n^2) self-join).
    Not part of the operator surface — use :func:`embedding_near_dup_pairs`
    (LSH candidates + exact verify) for real workloads."""
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    out = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.floor(
            cosine_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cosine_e6"),
    )
    return out.filter(F.col("cosine_e6") >= int(threshold * 1e6))


def lsh_planes(
    n_planes: int = 16, n_tables: int = 4, seed: int = 42, dim: int = 64
) -> list[np.ndarray]:
    """Deterministic hyperplane tables: one (n_planes, dim) matrix per
    table, drawn sequentially from a single seeded generator. The Spark
    path folds these in as literals; the correctness-gate oracle embeds the
    SAME values in its SQL, so both engines use identical planes."""
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]


def lsh_candidate_pairs(
    emb: DataFrame,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate generation: random-hyperplane LSH (Charikar 2002).
    n_tables independent sign-bit sketches of n_planes bits; docs sharing a
    full sketch in >=1 table become candidates. Planes are seeded ->
    deterministic across runs and cluster sizes (and re-derivable by the
    SQL oracle via :func:`lsh_planes`). Returns (id_a, id_b, va, vb) —
    the only join is bucket-equi on (table, key), never all-pairs."""
    keys = []
    for t, planes in enumerate(lsh_planes(n_planes, n_tables, seed, dim)):
        bits = None
        for p in range(n_planes):
            bit = F.when(dot_col(F.col(vec_col), _lit_vec(planes[p])) > 0, 1).otherwise(0)
            bits = bit if bits is None else bits * 2 + bit
        keys.append(F.struct(F.lit(t).alias("table"), bits.alias("key")))
    sk = emb.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*keys)).alias("sk")
    ).select(id_col, vec_col, "sk.table", "sk.key")
    a, b = sk.alias("a"), sk.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.key") == F.col("b.key"))
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
    return cand


def _exact_verified(cand: DataFrame, threshold: float) -> DataFrame:
    """Exact cosine over candidate (id_a, id_b, va, vb) rows — the verify
    step shared by every near-dup entry point."""
    out = cand.select(
        "id_a",
        "id_b",
        F.floor(cosine_col(F.col("va"), F.col("vb")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("cosine_e6"),
    )
    return out.filter(F.col("cosine_e6") >= int(threshold * 1e6))


def lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for near-dup pairs: LSH candidates + exact cosine verify
    (same composition as :func:`embedding_near_dup_pairs`, tunable recall
    knobs exposed)."""
    cand = lsh_candidate_pairs(
        emb, n_planes, n_tables, seed, dim, id_col, vec_col
    )
    return _exact_verified(cand, threshold)
