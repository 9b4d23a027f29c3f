package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

import graft.core.Tables
import graft.functions.{ScoredCand, TopKAggregator}

/** Similarity search over the embeddings table (builder mandate).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the query
  * vector(s), score every row scan-side (map-only — no shuffle except
  * the final TakeOrderedAndProject heap-merge), which is exactly how a
  * 1000-executor cluster would do one-query-vs-100TB exact search.
  * The LSH-bucketed variant (random hyperplane signs) is the scale
  * path for all-pairs / many-query workloads: candidates meet in
  * buckets, turning O(n·q) into per-bucket joins.
  *
  * Dot products fold left-to-right over double-cast elements — verified
  * bit-identical to DuckDB's `list_inner_product` on double lists, so
  * the oracle checks every digit (before a defensive round(…,6)).
  */
object Similarity {

  /** Sequential double fold of an elementwise product. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def doubled(c: Column): Column = transform(c, x => x.cast("double"))

  /** Zero-norm-guarded cosine: a 0/0 would yield NaN, whose sort order
    * differs between Spark (greatest) and a struct-field ascending sort
    * (last) — and DuckDB division can disagree again. Pin the degenerate
    * case to -2.0 (below any real cosine) on BOTH sides instead. */
  private def cosine(v: Column, qv: Column): Column = {
    val denom = sqrt(dot(v, v)) * sqrt(dot(qv, qv))
    when(denom === 0.0, lit(-2.0)).otherwise(dot(v, qv) / denom)
  }

  private val cosineSqlDenom =
    "(sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv)))"
  private val cosineSql =
    s"CASE WHEN $cosineSqlDenom = 0 THEN -2.0 ELSE list_inner_product(v, qv) / $cosineSqlDenom END"

  /** Exact cosine top-20 neighbours of vec_id = 0. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.join(broadcast(q))
      .withColumn("cos", cosine(col("v"), col("qv")))
      .filter(col("vec_id") =!= 0)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(20)
      .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
  }

  val cosineTopKSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |scored AS (
      |  SELECT vec_id, $cosineSql AS cos
      |  FROM e, q)
      |SELECT vec_id, round(cos, 6) AS cosine
      |FROM scored
      |WHERE vec_id <> 0
      |ORDER BY cos DESC, vec_id ASC
      |LIMIT 20""".stripMargin

  /** Exact kNN join: top-3 neighbours for each of 5 query vectors in one
    * pass — broadcast the query set, score scan-side, then ONE hash
    * aggregation with a bounded top-k aggregate (graft.functions.TopK):
    * map-side partials keep ≤ k candidates per (partition, query), so
    * the exchange carries ≤ partitions·q·k structs and reducer state is
    * O(k) — no window funnel, no unbounded collect_list (the round-2
    * defect). The aggregation itself is the salt: every scan partition
    * reduces locally in parallel regardless of |queries|. */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("v"), col("qv")))
      .groupBy(col("query_id"))
      .agg(topk(-col("cos"), col("vec_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top.cands")).as(Seq("pos", "x")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("x.id").as("neighbor_id"), round(col("x.c"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  val knnJoinSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id, $cosineSql AS cos
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
      |  FROM scored)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
      |  round(cos, 6) AS cosine
      |FROM ranked
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** Random-hyperplane (SimHash) LSH buckets: the sign pattern of dot
    * products against fixed pseudo-random hyperplanes. Deterministic —
    * hyperplane components are (-1)^bit from the vector index — so the
    * oracle reproduces the bucketing exactly. Map-only signature, then
    * one shuffle of (bucket, id): the ANN scale path.
    *
    * All 4 plane sums come out of ONE `aggregate` pass whose accumulator
    * carries the element index (i, s0..s3) — no `sequence` index array
    * is materialized and the vector is traversed once, not 4× (the
    * round-2 q31 defect). Addition order per plane is unchanged
    * (left-to-right), so results stay bit-identical to the oracle. */
  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    def signed(acc: Column, x: Column, j: Int): Column =
      (acc.getField(s"s$j") +
        when(shiftright(acc.getField("i"), j) % 2 === 0, x).otherwise(-x))
        .as(s"s$j")
    val bucket = aggregate(
      col("v"),
      struct(lit(0L).as("i"), lit(0.0).as("s0"), lit(0.0).as("s1"),
        lit(0.0).as("s2"), lit(0.0).as("s3")),
      (acc, x) => struct(
        (acc.getField("i") + 1L).as("i") +:
          (0 until 4).map(j => signed(acc, x, j)): _*),
      acc => (0 until 4)
        .map(j => when(acc.getField(s"s$j") >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _))
    e.withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"))
      .orderBy("bucket")
  }

  val lshBucketsSql: String = {
    def planeDot(j: Int): String = {
      val stride = math.pow(2, j).toLong.max(1L)
      s"list_sum(list_transform(range(1, len(v) + 1), i -> CASE WHEN ((i - 1) // $stride) % 2 = 0 THEN v[i] ELSE -v[i] END))"
    }
    val sig = (0 until 4)
      .map(j => s"(CASE WHEN ${planeDot(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings)
       |SELECT CAST($sig AS BIGINT) AS bucket,
       |  count(*) AS n_vectors, min(vec_id) AS min_vec
       |FROM e
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin
  }

  /** Per-label L2-norm envelope: order-free aggregates only (min/max/
    * count) so doubles stay bit-stable across engines. */
  def embeddingStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("label"), sqrt(dot(doubled(col("embedding")), doubled(col("embedding")))).as("norm"))
    e.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"))
      .orderBy("label")
  }

  val embeddingStatsSql: String =
    """SELECT label, count(*) AS n_vectors,
      | round(min(sqrt(list_inner_product(v, v))), 6) AS min_norm,
      | round(max(sqrt(list_inner_product(v, v))), 6) AS max_norm
      |FROM (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings)
      |GROUP BY label
      |ORDER BY label""".stripMargin
}
