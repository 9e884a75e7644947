"""Deterministic cardinality / frequency sketches, exactly oracle-checkable.

Classic sketch structures a 100 TB curation pipeline leans on — distinct
counts per slice without a count-distinct shuffle of everything, and
heavy-hitter frequency estimates in bounded memory — implemented so that
every emitted cell is an exact integer a second engine (the DuckDB
oracles in ``__spark_entry__``) reproduces bit-for-bit:

* ``kmv_distinct`` — K-minimum-values distinct estimator (Bar-Yossef et
  al.): the k-th smallest hash of a set of n uniform 32-bit hashes sits
  near ``k/n * 2^32``, so ``(k-1) * 2^32 / h_k`` (integer division)
  estimates n. The sketch is just k small integers per group — mergeable
  across partitions/days by re-taking the k smallest.
* ``hll_registers`` — HyperLogLog register table + exact-integer
  summary: bucket = low ``p`` bits, rho = leading-zero rank of the
  remaining bits; the per-group harmonic denominator is emitted as the
  EXACT scaled integer ``sum(2^(maxrho - r))`` instead of a float, so the
  oracle compares integers and a consumer applies the (float) alpha_m
  correction at read time.
* ``cms_heavy_hitters`` — count-min sketch (Cormode & Muthukrishnan):
  ``depth`` pairwise-independent rows of ``width`` counters; a token's
  estimate is the min of its counters and can only OVER-estimate. The
  query emits the exact top-k tokens with exact and CMS counts side by
  side, making the collision error directly visible.

All three ride the same 32-bit md5-prefix base hash as the minhash
family (``dedup._minhash_base`` / ``_duck_minhash_base`` in the oracles)
and pure built-in expressions — no UDFs, no floats, no nondeterminism.

The reference has no sketch surface; this extends the engine along the
training-data-pipeline axis of the brief (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dr_source_spark.training.dedup import _minhash_base, _words, minhash_family

_HASH_SPACE = 1 << 32  # the base hash is uniform on [0, 2^32)


def _distinct_group_hashes(documents: DataFrame, group_col: str) -> DataFrame:
    """(group, h): distinct 32-bit token hashes per group — the set both
    cardinality sketches operate on. Distinct-on-(group, h) gives
    map-side partial dedup before the single wide shuffle."""
    return (
        documents.select(F.col(group_col).alias("grp"), F.explode(_words()).alias("w"))
        .select("grp", _minhash_base(F.col("w")).alias("h"))
        .distinct()
    )


def kmv_distinct(documents: DataFrame, k: int = 64, group_col: str = "lang") -> DataFrame:
    """(grp, k, n_kept, kth_hash, est_distinct): K-minimum-values
    distinct-token estimate per group.

    Scale shape: a full ``row_number() OVER (PARTITION BY grp ORDER BY
    h)`` sorts every distinct hash of a group through one task — at
    billions of tokens per language that single task is the bottleneck.
    Instead the k smallest are found in two exact stages: any value among
    a group's k smallest is also among the k smallest of its hash bucket,
    so stage 1 ranks within (grp, h % nbuckets) — nbuckets parallel
    little sorts — and keeps rank <= k (<= nbuckets*k rows per group);
    stage 2 ranks those survivors per group. Both engines agree because
    the prune is lossless, and ranking on the distinct hash VALUE is
    collision-free within a group.

    Groups with fewer than k distinct hashes fall back to their exact
    count (n_kept < k => est = n_kept, kth_hash = largest kept), the
    standard small-set KMV convention."""
    return kmv_estimate(kmv_sketch(documents, k, group_col), k)


def kmv_sketch(documents: DataFrame, k: int = 64, group_col: str = "lang") -> DataFrame:
    """(grp, h): the KMV sketch payload — the k smallest distinct token
    hashes per group. This IS the mergeable state: the k smallest of a
    union are among the union of each side's k smallest, so per-day /
    per-partition sketches combine via `kmv_merge` without rescanning."""
    return _k_smallest(_distinct_group_hashes(documents, group_col), k)


def _k_smallest(hashes: DataFrame, k: int) -> DataFrame:
    """Two-stage lossless k-smallest per group (see kmv_distinct)."""
    nbuckets = 32
    w1 = Window.partitionBy("grp", F.col("h") % nbuckets).orderBy("h")
    pruned = hashes.withColumn("_r1", F.row_number().over(w1)).where(F.col("_r1") <= k)
    w2 = Window.partitionBy("grp").orderBy("h")
    return (
        pruned.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= k)
        .select("grp", "h")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Union two KMV sketches into the sketch of the combined input:
    kmv_merge(kmv_sketch(A), kmv_sketch(B)) == kmv_sketch(A ∪ B) exactly
    (pytest law in tests/test_sketch.py). Inputs are <= k rows per group,
    so the re-prune is over at most 2k rows per group."""
    return _k_smallest(a.unionByName(b).distinct(), k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Summary row per group off a (grp, h) sketch — the read-time half
    of `kmv_distinct`, reusable on merged sketches."""
    return (
        sketch.groupBy("grp")
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
        .select(
            "grp",
            F.lit(k).cast("long").alias("k"),
            F.col("n_kept").cast("long"),
            "kth_hash",
            # integer division (Spark `div`, DuckDB `//`) — float division
            # could round the floor differently across engines
            F.when(F.col("n_kept") < k, F.col("n_kept"))
            .otherwise(F.expr(f"CAST({(k - 1) * _HASH_SPACE} AS BIGINT) div kth_hash"))
            .cast("long")
            .alias("est_distinct"),
        )
    )


def hll_registers(documents: DataFrame, p: int = 6, group_col: str = "lang") -> DataFrame:
    """(grp, m, used_regs, zero_regs, sum_rho, harmonic_scaled):
    HyperLogLog register summary per group, every cell an exact integer.

    bucket = h % 2^p (low bits), rem = h >> p (the remaining 32-p bits),
    rho(rem) = (32-p) - bit_length(rem) + 1 — the 1-based position of the
    highest set bit from the top, with rho = 32-p+1 for rem = 0.
    bit_length is ``length(bin(rem))`` in both engines. Registers are
    max(rho) per bucket; absent buckets are zero registers contributing
    2^maxrho each to the scaled harmonic sum

        harmonic_scaled = sum_j 2^(maxrho - r_j)   (maxrho = 32 - p + 1)

    so the float HLL estimate alpha_m * m^2 * 2^maxrho / harmonic_scaled
    is a pure read-time computation. Bounded exactly: m * 2^maxrho =
    2^(p + 33 - p) = 2^33 — comfortably in int64.

    Scale shape: distinct + two narrow groupBys with full map-side
    combine; output is m rows per group regardless of input size."""
    return hll_summary(hll_register_table(documents, p, group_col), p)


def hll_register_table(
    documents: DataFrame, p: int = 6, group_col: str = "lang"
) -> DataFrame:
    """(grp, bucket, r): the HLL register payload — max rho per bucket.
    This IS the mergeable state (registers combine by max): per-day /
    per-partition tables combine via `hll_merge` without rescanning."""
    m = 1 << p
    maxrho = 32 - p + 1
    rem = F.floor(F.col("h") / (1 << p))
    rho = F.when(rem == 0, F.lit(maxrho)).otherwise(
        F.lit(32 - p) - F.length(F.bin(rem)) + 1
    )
    return (
        _distinct_group_hashes(documents, group_col)
        .select("grp", (F.col("h") % m).alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two HLL register tables into the table of the combined
    input: hll_merge(regs(A), regs(B)) == regs(A ∪ B) exactly — max is
    idempotent and associative per (grp, bucket) (pytest law)."""
    return a.unionByName(b).groupBy("grp", "bucket").agg(F.max("r").alias("r"))


def hll_summary(regs: DataFrame, p: int) -> DataFrame:
    """Summary row per group off a (grp, bucket, r) register table — the
    read-time half of `hll_registers`, reusable on merged tables."""
    m = 1 << p
    maxrho = 32 - p + 1
    return regs.groupBy("grp").agg(
        F.lit(m).cast("long").alias("m"),
        F.count("*").alias("used_regs"),
        (F.lit(m) - F.count("*")).alias("zero_regs"),
        F.sum("r").cast("long").alias("sum_rho"),
        (
            F.sum(F.pow(F.lit(2), F.lit(maxrho) - F.col("r")).cast("long"))
            + (F.lit(m) - F.count("*")) * F.lit(1 << maxrho)
        )
        .cast("long")
        .alias("harmonic_scaled"),
    )


def _cms_tokens(documents: DataFrame) -> DataFrame:
    """(word, h) token INSTANCES (multiplicity preserved — frequencies,
    not sets, so no array_distinct)."""
    raw_words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    return documents.select(F.explode(raw_words).alias("word")).select(
        "word", _minhash_base(F.col("word")).alias("h")
    )


def _cms_positions(depth: int, width: int):
    """array<struct<row,pos>> counter coordinates of the ``h`` column —
    row d uses the shared deterministic pairwise-independent family."""
    from dr_source_spark.training.dedup import _MINHASH_P

    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("row"),
                ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MINHASH_P) % width)
                .cast("int")
                .alias("pos"),
            )
            for d, (a, b) in enumerate(minhash_family(depth))
        ]
    )


def cms_registers(documents: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """(row, pos, cnt): the count-min register payload — the mergeable
    state (counters combine by addition): per-day / per-partition
    sketches combine via `cms_merge` without rescanning."""
    return (
        _cms_tokens(documents)
        .select(F.explode(_cms_positions(depth, width)).alias("rp"))
        .groupBy(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Add two CMS register tables: cms_merge(regs(A), regs(B)) ==
    regs(A ++ B) exactly — counters are sums, sums are associative
    (pytest law)."""
    return (
        a.unionByName(b)
        .groupBy("row", "pos")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_heavy_hitters(
    documents: DataFrame, depth: int = 4, width: int = 256, top: int = 20
) -> DataFrame:
    """(word, exact_cnt, cms_est): the corpus's ``top`` most frequent
    tokens with their exact count and count-min-sketch estimate.

    The sketch is depth x width counters; row d maps a token to counter
    ``(a_d * h + b_d) % P % width`` using the same deterministic
    pairwise-independent family as the minhash signatures
    (``minhash_family``), and a token's estimate is the MIN of its depth
    counters — collisions only ever inflate it, so cms_est >= exact_cnt
    is an invariant (asserted in tests, visible in the query output).

    Token multiplicity matters here (frequencies, not sets), so the
    explode skips the array_distinct the dedup tokenizer applies.

    Scale shape: the register build is one groupBy over (row, pos) —
    depth*width cells regardless of corpus size, full map-side combine.
    The exact top-k is itself a big groupBy at 100 TB; that is the point
    of the query — it shows what the sketch replaces. The top-k join back
    to registers broadcasts ``top * depth`` rows."""
    toks = _cms_tokens(documents)
    positions = _cms_positions(depth, width)
    regs = (
        toks.select(F.explode(positions).alias("rp"))
        .groupBy(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = toks.groupBy("word", "h").agg(F.count("*").alias("exact_cnt"))
    topk = exact.orderBy(F.desc("exact_cnt"), F.asc("word")).limit(top)
    probe = topk.select(
        "word", "exact_cnt", F.explode(positions).alias("rp")
    ).select("word", "exact_cnt", F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
    return (
        regs.join(F.broadcast(probe), ["row", "pos"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
        .select("word", F.col("exact_cnt").cast("long"), "cms_est")
    )
