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

  /** Sequential double dot product — the native codegen'd kernel
    * (`graft.functions.DotProduct`), bit-identical to the HOF fold
    * `dotHof` below (HashExprsSpec asserts equality row-for-row). */
  private[queries] def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** The HOF reference form of `dot` (kept as the executable spec). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private[queries] def doubled(c: Column): Column = transform(c, x => x.cast("double"))

  /** Zero-norm-guarded cosine: a 0/0 would yield NaN, whose sort order
    * differs between Spark (greatest) and a struct-field ascending sort
    * (last) — and DuckDB division can disagree again. Pin the degenerate
    * case to -2.0 (below any real cosine) on BOTH sides instead. */
  private[queries] def cosine(v: Column, qv: Column): Column = {
    val denom = sqrt(dot(v, v)) * sqrt(dot(qv, qv))
    when(denom === 0.0, lit(-2.0)).otherwise(dot(v, qv) / denom)
  }

  /** The oracle cosine over explicit operand expressions — parameterized
    * so multi-pair queries (q103) can't silently mis-substitute: a
    * string `.replace` that stops matching degrades into valid SQL
    * that certifies nothing (review r12), whereas operands passed here
    * are always spliced. */
  private[queries] def cosineSqlFor(v: String, q: String): String = {
    val denom = s"(sqrt(list_inner_product($v, $v)) * sqrt(list_inner_product($q, $q)))"
    s"CASE WHEN $denom = 0 THEN -2.0 ELSE list_inner_product($v, $q) / $denom END"
  }
  private val cosineSql = cosineSqlFor("v", "qv")

  /** The UNROUNDED scored frame behind q29 (query vec_id = 0 excluded)
    * — factored so the q118 hybrid fusion ranks on the same doubles
    * the top-k selection orders by. */
  private[queries] def cosineScored(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.join(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos", cosine(col("v"), col("qv")))
  }

  /** Exact cosine top-20 neighbours of vec_id = 0. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame =
    cosineScored(s, dir)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(20)
      .select(col("vec_id"), round(col("cos"), 6).as("cosine"))

  /** Oracle mirror of [[cosineScored]] — CTE chain ending in
    * `scored(vec_id, cos)`, shared by the q29 and q118 oracles. */
  private[queries] val cosineScoredCteSql: String =
    s"""e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |scored AS (
      |  SELECT vec_id, $cosineSql AS cos
      |  FROM e, q
      |  WHERE vec_id <> 0)""".stripMargin

  val cosineTopKSql: String =
    s"""WITH $cosineScoredCteSql
      |SELECT vec_id, round(cos, 6) AS cosine
      |FROM scored
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
  /** The n-plane SimHash bucket of a double-array column `v` (q31 uses
    * 4 planes = 16 buckets; the near-dup join q45 uses 6 = 64 — more
    * planes ⇒ smaller buckets ⇒ fewer candidate pairs; this is THE
    * knob that keeps the pair count sub-quadratic as n grows). */
  private def simhashBucket(v: Column, planes: Int = 4): Column =
    call_function("graft_simhash", v, lit(planes))

  /** The HOF reference form of `simhashBucket` (executable spec —
    * HashExprsSpec asserts the native kernel matches it exactly). */
  private[graft] def simhashBucketHof(v: Column, planes: Int = 4): Column = {
    def signed(acc: Column, x: Column, j: Int): Column =
      (acc.getField(s"s$j") +
        when(shiftright(acc.getField("i"), j) % 2 === 0, x).otherwise(-x))
        .as(s"s$j")
    aggregate(
      v,
      struct(lit(0L).as("i") +:
        (0 until planes).map(j => lit(0.0).as(s"s$j")): _*),
      (acc, x) => struct(
        (acc.getField("i") + 1L).as("i") +:
          (0 until planes).map(j => signed(acc, x, j)): _*),
      acc => (0 until planes)
        .map(j => when(acc.getField(s"s$j") >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _))
  }

  /** The same bucket, DuckDB form (shared by the q31/q45 oracles). */
  private def simhashBucketSql(planes: Int = 4): String = {
    def planeDot(j: Int): String = {
      val stride = math.pow(2, j).toLong.max(1L)
      s"list_sum(list_transform(range(1, len(v) + 1), i -> CASE WHEN ((i - 1) // $stride) % 2 = 0 THEN v[i] ELSE -v[i] END))"
    }
    (0 until planes)
      .map(j => s"(CASE WHEN ${planeDot(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
  }

  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    e.withColumn("bucket", simhashBucket(col("v")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"))
      .orderBy("bucket")
  }

  val lshBucketsSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings)
       |SELECT CAST(${simhashBucketSql()} AS BIGINT) AS bucket,
       |  count(*) AS n_vectors, min(vec_id) AS min_vec
       |FROM e
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  /** Embedding-cosine near-dup pairs, LSH-bucketed (builder mandate):
    * candidate pairs meet only inside a 6-plane SimHash bucket (64
    * buckets), then exact cosine ≥ τ confirms. THE scale path for
    * all-pairs semantic dedup — the equi-join on `bucket` makes pair
    * enumeration per-bucket-local, never an n² cross join, and the
    * plane count is the sub-quadratic knob. Norms are computed ONCE
    * per vector in the signature pass and joined along, so each pair
    * costs one dot product, not three (measured 14 s → ~2 s at sf0.1).
    * Both sides repartition on `bucket` and the join is pinned to a
    * shuffle join: the two exchanges canonicalize identically, so
    * ReuseExchange computes the signature subplan (scan + 6-plane
    * simhash + norm) ONCE and side b reads side a's shuffle blocks —
    * a broadcast self-join here runs the subplan twice (Catalyst does
    * not dedupe common subplans across a broadcast boundary). At
    * 100 TB that halves the scan + signature bill; the hash-partition
    * on `bucket` is also exactly the layout the per-bucket pair
    * enumeration needs. */
  def cosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val tau = 0.4
    val sig = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
      .withColumn("bucket", simhashBucket(col("v"), planes = 6))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .repartition(col("bucket"))
    val denom = col("a.norm") * col("b.norm")
    sig.as("a")
      .join(sig.as("b").hint("shuffle_hash"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        when(denom === 0.0, lit(-2.0))
          .otherwise(dot(col("a.v"), col("b.v")) / denom))
      .filter(col("cos") >= tau)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  val cosineNearDupSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sig AS (
       |  SELECT vec_id, v, CAST(${simhashBucketSql(6)} AS BIGINT) AS bucket,
       |    sqrt(list_inner_product(v, v)) AS norm
       |  FROM e),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    CASE WHEN a.norm * b.norm = 0 THEN -2.0
       |      ELSE list_inner_product(a.v, b.v) / (a.norm * b.norm) END AS cos
       |  FROM sig a JOIN sig b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, round(cos, 6) AS cosine
       |FROM pairs
       |WHERE cos >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  /** IVF-style ANN (builder mandate "IVF or LSH-bucketed variant"):
    * coarse quantization — every vector is assigned to its
    * best-cosine cell among K deterministic probe centroids (stand-ins
    * for trained k-means centroids; same dataflow) — then the query
    * searches only its `nprobe` best cells. At 100 TB the assignment
    * is a stored column and the cell filter prunes the candidate scan
    * to nprobe/K of the corpus; here both stages are visible in one
    * plan: broadcast centroid scoring (map-only), one window for the
    * argmax cell, broadcast semi-join of the probed cells, exact
    * top-k via TakeOrderedAndProject. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (kCent, nprobe, queryId, k) = (8, 2, 42, 10)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val cent = e.filter(col("vec_id") < kCent)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    // Cell assignment: best-cosine centroid per vector (ties by c_id
    // desc — deterministic, mirrored in the oracle's row_number).
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val assigned = e.join(broadcast(cent))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("v"))
    val qv = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"))
    // The query's nprobe best cells.
    val qcells = cent.join(broadcast(qv))
      .withColumn("cos_c", cosine(col("cv"), col("qv")))
      .orderBy(col("cos_c").desc, col("c_id").desc)
      .limit(nprobe)
      .select(col("c_id").as("probe_cell"))
    assigned
      .join(broadcast(qcells), col("cell") === col("probe_cell"))
      .join(broadcast(qv))
      .withColumn("cos", cosine(col("v"), col("qv")))
      .filter(col("vec_id") =!= queryId)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cell"), round(col("cos"), 6).as("cosine"))
  }

  val ivfTopKSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
       |scored AS (
       |  SELECT e.vec_id, cent.c_id, e.v,
       |    ${cosineSql.replace("(v, qv)", "(e.v, cent.cv)").replace("(qv, qv)", "(cent.cv, cent.cv)").replace("(v, v)", "(e.v, e.v)")} AS cos_c,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosineSql.replace("(v, qv)", "(e.v, cent.cv)").replace("(qv, qv)", "(cent.cv, cent.cv)").replace("(v, v)", "(e.v, e.v)")} DESC, cent.c_id DESC) AS rn
       |  FROM e, cent),
       |assigned AS (
       |  SELECT vec_id, c_id AS cell, v FROM scored WHERE rn = 1),
       |qv AS (SELECT v AS qv FROM e WHERE vec_id = 42),
       |qcells AS (
       |  SELECT c_id AS probe_cell FROM cent, qv
       |  ORDER BY ${cosineSql.replace("(v, qv)", "(cent.cv, qv)").replace("(v, v)", "(cent.cv, cent.cv)")} DESC, c_id DESC
       |  LIMIT 2)
       |SELECT vec_id, cell, round($cosineSql, 6) AS cosine
       |FROM assigned JOIN qcells ON cell = probe_cell, qv
       |WHERE vec_id <> 42
       |ORDER BY $cosineSql DESC, vec_id ASC
       |LIMIT 10""".stripMargin

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

  // ---- q72: Lloyd centroid-update step (semantic clustering) --------

  /** q72: one Lloyd iteration of embedding clustering — the refinement
    * step behind semantic dedup / corpus bucketing (cluster, then
    * dedup or sample within clusters). The first `CentroidK` vectors
    * seed the centroids (deterministic, like q46's IVF cells); every
    * vector joins its best-cosine centroid; the step emits the updated
    * per-(cell, dimension) means.
    *
    * Plan shape — the distributed-k-means contract:
    *  - centroids are k·dim doubles, ALWAYS driver-small: they embed
    *    as literals (the `Templates.scala:52` dimension-collect
    *    precedent), so assignment is a per-row argmax over k inlined
    *    cosines via `array_max` on (cos, c_id) structs — MAP-ONLY, no
    *    join, no window, no shuffle of the corpus;
    *  - the update aggregates fixed-point micro-unit longs
    *    (`floor(x·1e6+0.5)`): integer sums are exact and order-free,
    *    so the result is bit-stable under any partitioning — float
    *    means would be addition-order-dependent and could never
    *    hash-match a sequential oracle;
    *  - total traffic: ONE map-side-combined shuffle of
    *    (cell, pos, partial sum) rows — k·dim groups regardless of
    *    corpus size. At 100 TB each Lloyd round is one pass, and the
    *    next round's centroids are again driver-small.
    *
    * Tie semantics: struct max is lexicographic, so equal cosines
    * resolve to the larger c_id — mirrored in the oracle's
    * `ORDER BY cos DESC, c_id DESC` row_number. */
  val CentroidK = 8

  /** Literal-centroid cell assignment, shared by q72 (Lloyd update) and
    * q109 (semantic dedup) — one contract, one implementation, so the
    * two can never drift. Collects the first [[CentroidK]] vectors of
    * `e` (columns vec_id, v) as centroids — k·dim doubles, ALWAYS
    * driver-small — and tags every row with its best-cosine cell via a
    * per-row argmax over k inlined cosines: MAP-ONLY, no join, no
    * window, no shuffle of the corpus. The row norm is computed ONCE
    * per row (not once per centroid — k redundant O(dim) kernel calls
    * if codegen CSE doesn't dedupe them), and each centroid's norm is
    * a driver-side scalar: the same sequential fold the kernel runs,
    * so sqrt(Σx²) is bit-identical to the oracle's
    * sqrt(list_inner_product(qv, qv)). Tie semantics: struct max is
    * lexicographic, so equal cosines resolve to the larger c_id —
    * mirrored in the oracle's `ORDER BY cos DESC, c_id DESC`
    * row_number ([[cellAssignCteSql]]). Adds columns `nv` (norm) and
    * `cell`. */
  private def assignCells(e: DataFrame): DataFrame =
    assignCellsWith(e, collectCentroids(e))

  /** The first [[CentroidK]] vectors of `e` (columns vec_id, v) as
    * driver-side literal centroids — k·dim doubles, ALWAYS small. */
  private[queries] def collectCentroids(e: DataFrame): Array[(Long, Seq[Double])] =
    e.filter(col("vec_id") < CentroidK)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Above this k the literal argmax switches to the native
    * [[graft.functions.CellArgmax]] kernel (r14 verdict #2): the
    * literal form inlines k typedLit vectors and k cosine expression
    * TREES per row — at the documented production k ≈ √n (§9) that is
    * a megabyte-scale plan with O(k) codegen nodes, codegen falls
    * back, and every task ships the literals as plan text. The kernel
    * carries the same centroids as ONE foldable literal (parsed once
    * per executor), stays map-only / shuffle-free, and is spec-pinned
    * bit-identical to the literal form (CellArgmaxSpec) — assignment
    * semantics, tie rule and sentinel included. Fixture-k plans
    * (k = 8) keep the literal form, so every committed query plan is
    * unchanged. */
  private[queries] val MaxLiteralCentroids = 64

  /** [[assignCells]] against an EXPLICIT centroid set — the form the
    * incremental path uses with the warehouse's STORED centroids, so
    * an increment assigns new vectors with exactly the cells the index
    * build used (one contract, whichever side supplies the centroids).
    * Dispatches on k: literal argmax below [[MaxLiteralCentroids]],
    * the single-node native kernel above (same assignment, same
    * `cellAssignCteSql` oracle contract). */
  private[queries] def assignCellsWith(e: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame =
    if (cents.length <= MaxLiteralCentroids) assignCellsLiteral(e, cents)
    else assignCellsKernel(e, cents)

  /** The literal-argmax form — k inlined cosine trees; exact, and the
    * plan every committed fixture query runs (k = 8). */
  private[queries] def assignCellsLiteral(e: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame = {
    val scored = cents.map { case (id, cv) =>
      val cnorm = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
      val denom = col("nv") * lit(cnorm)
      struct(
        when(denom === 0.0, lit(-2.0))
          .otherwise(dot(col("v"), typedLit(cv)) / denom).as("cos"),
        lit(id).as("c_id"))
    }
    e.withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .withColumn("cell", array_max(array(scored.toSeq: _*)).getField("c_id"))
  }

  /** The single-node kernel form — the 100× scale path (one foldable
    * centroid payload at any k; CellArgmaxSpec pins bit-identity to
    * the literal form). */
  private[queries] def assignCellsKernel(e: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame = {
    val packed = cents.sortBy(_._1).toSeq.map { case (id, cv) =>
      (id, math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)), cv)
    }
    e.withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .withColumn("cell",
        call_function("graft_cell_argmax", col("v"), typedLit(packed)))
  }

  /** Production-k cell assignment instrument (r14 verdict #2's done
    * criterion): assign EVERY vector of a raw embeddings frame against
    * a first-k seeding at an EXPLICIT k — the corpus bench drives this
    * at k ≈ √n, where the single-node kernel dispatch (not the literal
    * plan) must carry the assignment. Returns (vec_id, cell); exact-
    * ness at this k is pinned by CellArgmaxSpec's planted clusters. */
  def assignCellsAtK(emb: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val e = emb.select(col("vec_id"), doubled(col("embedding")).as("v"))
    val cents = e.filter(col("vec_id") < k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assignCellsWith(e, cents).select(col("vec_id"), col("cell"))
  }

  /** The cell-bucketed vector index (vec_id, cell, norm, v) — what an
    * IVF-style index physically stores: every vector grouped by its
    * assigned cell, with the norm precomputed. This frame is what
    * `Warehouse.build` persists as the `cells` table and what q109's
    * pair enumeration / q126's increment probe read. */
  private[queries] def cellIndex(s: SparkSession, dir: String): DataFrame =
    cellIndexOf(Tables.embeddings(s, dir))

  /** [[cellIndex]] over an explicit raw embeddings frame (vec_id,
    * embedding) — the seam the full-grain merge certification uses to
    * build a STANDING index from the corpus minus today's batch. */
  private[queries] def cellIndexOf(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), doubled(col("embedding")).as("v"))
    assignCells(e)
      .select(col("vec_id"), col("cell"), col("nv").as("norm"), col("v"))
  }

  /** Cell rows (vec_id, cell, norm, v) for a raw embeddings frame
    * assigned against EXPLICIT centroids — the warehouse merge path's
    * batch-side assignment: new vectors get exactly the cells the
    * standing build used, without touching the stored corpus. */
  private[queries] def cellRowsWith(emb: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame =
    assignCellsWith(
      emb.select(col("vec_id"), doubled(col("embedding")).as("v")), cents)
      .select(col("vec_id"), col("cell"), col("nv").as("norm"), col("v"))

  /** The QUANTIZED mirror of a `cells` frame — the r15-verdict-#2
    * storage tier: (vec_id, cell, code, qnorm), where `code` is the
    * int8 max-abs quantization of `v` packed as a BINARY blob
    * (`graft_i8_pack`, 1 byte/dim vs 8 — the embedding-bytes
    * reduction that dominates a 100 TB dense index) and `qnorm` is
    * the exact-integer code norm precomputed at build (the `norm`
    * discipline at the quantized grain). The scale is deliberately
    * NOT stored: cosine is scale-invariant (the q103 argument), so
    * the prefilter ranks on integer codes alone, and the exact
    * rescore reads the full-precision row anyway. Pure per-row map of
    * the cells frame — every writer that derives `cells` derives this
    * beside it, so the two can never skew. */
  private[queries] def cellsQ8Of(cells: DataFrame): DataFrame =
    cells.select(col("vec_id"), col("cell"),
      call_function("graft_i8_pack", col("v")).as("code"))
      .withColumn("qnorm",
        sqrt(call_function("graft_i8_dot", col("code"), col("code"))
          .cast("double")))

  /** Centroid rows (c_id, v) for the warehouse's `centroids` table —
    * the literal centroids the build assigned cells with, persisted so
    * increments can re-create the SAME assignment without touching the
    * corpus. */
  private[queries] def centroidFrame(s: SparkSession, dir: String): DataFrame =
    centroidFrameOf(Tables.embeddings(s, dir))

  private[queries] def centroidFrameOf(emb: DataFrame): DataFrame =
    emb
      .filter(col("vec_id") < CentroidK)
      .select(col("vec_id").as("c_id"), doubled(col("embedding")).as("v"))

  /** Oracle mirror of [[assignCells]]: CTEs e (doubled vectors), c
    * (centroids), s (all vector×centroid cosines), a (cell = argmax
    * centroid via rn = 1). Shared by q72 and q109 SQL. */
  private[queries] val cellAssignCteSql: String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |c AS (SELECT vec_id AS c_id, v AS qv FROM e WHERE vec_id < $CentroidK),
       |s AS (
       |  SELECT e.vec_id, c.c_id, e.v, $cosineSql AS cos
       |  FROM e, c),
       |a AS (
       |  SELECT vec_id, v, c_id AS cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id DESC) AS rn
       |  FROM s)""".stripMargin

  def centroidUpdate(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    lloydMeansOf(assignCells(e)).orderBy("cell", "pos")
  }

  /** The Lloyd update's per-(cell, pos) micro-unit means over any
    * frame carrying `cell` + `v` — factored (r14) so the warehouse's
    * stored-path semantic refresh runs the IDENTICAL arithmetic as
    * q72 (one rule text, two instantiations). */
  private[queries] def lloydMeansOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("sq"))
      .select(col("cell"), col("pos"), col("n_members"),
        floor(col("sq").cast("double") / col("n_members") + 0.5).cast("long")
          .as("mean_micro"))

  /** Oracle mirror of [[lloydMeansOf]] over the `a` assignment CTE:
    * `x` explodes (cell, pos, element), `m` is the micro-unit mean
    * per (cell, pos). Shared by q72 and the q141 refresh chain. */
  private[queries] val lloydMeansCteSql: String =
    """x AS (
      |  SELECT cell, CAST(i - 1 AS INTEGER) AS pos, v[i] AS x
      |  FROM a, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) r
      |  WHERE rn = 1),
      |m AS (
      |  SELECT cell, pos, count(*) AS n_members,
      |    CAST(floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / count(*) + 0.5) AS BIGINT) AS mean_micro
      |  FROM x
      |  GROUP BY cell, pos)""".stripMargin

  val centroidUpdateSql: String =
    s"""WITH $cellAssignCteSql,
       |$lloydMeansCteSql
       |SELECT cell, pos, n_members, mean_micro
       |FROM m
       |ORDER BY cell, pos""".stripMargin

  // ---- q101: int8 scalar quantization + reconstruction certificate ---

  /** q101 — per-vector int8 scalar quantization, the storage/bandwidth
    * step in front of every large ANN index (a 64-dim float32 vector
    * becomes 64 bytes + one float scale: 4× smaller, SIMD-dot-able).
    * Max-abs scaling: scale = max|xᵢ|, qᵢ = round(xᵢ·127/scale) ∈
    * [−127, 127]. The output row carries the quantized identity
    * (integer L1 mass, extremes) plus a RECONSTRUCTION CERTIFICATE:
    * max|xᵢ − qᵢ·scale/127| ≤ scale/254 (+1e-12 double slop) — the
    * half-step bound that makes the quantizer usable for recall
    * estimates; it is checked per vector, in both engines, not assumed.
    * All certified columns are integers or booleans; the one float
    * output (the scale) is rounded at the boundary (q32 idiom).
    *
    * Scale: map-only — one pass over the embeddings scan, per-row HOF
    * arithmetic, no shuffle (orderBy is oracle determinism). At 100 TB
    * the quantized vectors would be WRITTEN (digest-width columns) and
    * the certificate aggregated; nothing here grows state.
    *
    * Double-precision portability: float32→double casts are exact;
    * both engines evaluate the same literal expression tree
    * left-to-right over the same doubles; round() is half-away-from-
    * zero on both (Spark HALF_UP on the shortest-repr BigDecimal ==
    * C-library round for doubles that are not exactly half-integers,
    * and half-integers are exactly representable so the reprs agree). */
  def quantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(
      col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val withScale = e.withColumn(
      "scale", array_max(transform(col("v"), x => abs(x))))
    // qᵢ recomputed inline in the error term (identical grammar to the
    // oracle — no zip, so both engines share one expression shape).
    def quant(x: Column): Column =
      when(col("scale") === 0d, lit(0d))
        .otherwise(round(x * lit(127) / col("scale")))
    withScale
      .withColumn("qs", transform(col("v"), x => quant(x).cast("long")))
      .withColumn("max_err", array_max(transform(col("v"), x =>
        when(col("scale") === 0d, lit(0d))
          .otherwise(abs(x - round(x * lit(127) / col("scale")) * col("scale") / lit(127))))))
      .select(
        col("vec_id"), col("label"),
        aggregate(col("qs"), lit(0L), (acc, q) => acc + abs(q)).as("q_l1"),
        array_max(col("qs")).as("q_max"),
        array_min(col("qs")).as("q_min"),
        round(col("scale"), 6).as("scale_r6"),
        (col("max_err") <= col("scale") / lit(254) + lit(1e-12)).as("within_bound"))
      .orderBy("vec_id")
  }

  /** q103 neighbourhood size and certification floor: top-10 with a
    * ≥ 8/10 overlap requirement. The fixture achieves 10/10; the floor
    * is the CONTRACT a quantized index must meet, not the observation. */
  private val RecallK = 10
  private val RecallBound = 8

  /** q103 — int8 retrieval-quality certification: does ANN over the
    * q101-quantized vectors actually return the same neighbours as
    * float vectors? For each of the 5 probe vectors (the q30 query
    * set), compute exact cosine top-10 twice — once over the float
    * embeddings, once over the int8-quantized vectors — and certify
    * per-query overlap ≥ [[RecallBound]]. Closes the loop q101 opened:
    * a small per-element error bound does NOT by itself guarantee
    * ranking stability; this measures ranking agreement directly.
    *
    * Cosine is scale-invariant, so the dequantized cosine
    * cos(q·s/127) ≡ cos(q) — we score the INTEGER vectors directly.
    * Integer-valued doubles (|qᵢ| ≤ 127, 64 dims ⇒ |q·q| ≤ 1.04e6)
    * make every dot product EXACT in both engines; the only floats
    * are one sqrt and one division over identical inputs, so ranks
    * (ties broken by vec_id) agree bit-for-bit and the overlap counts
    * are exact integers.
    *
    * Scale: queries broadcast (bounded probe set × corpus scan — the
    * q29/q30 linear ANN-baseline shape); BOTH top-k's come out of one
    * hash aggregation with bounded TopK partials, so the single
    * exchange carries ≤ partitions·q·k structs. At 100 TB the probe
    * set is the sampled certification suite, and this query is the
    * regression gate run after every re-quantization. */
  def int8Recall(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopKAggregator(RecallK), Encoders.product[ScoredCand])
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val z = e
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q", transform(col("v"), x =>
        when(col("scale") === 0d, lit(0d))
          .otherwise(round(x * lit(127) / col("scale")))))
      .select(col("vec_id"), col("v"), col("q"))
    val qry = z.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("q").as("qq"))
    z.join(broadcast(qry), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cos_f"),
        cosine(col("q"), col("qq")).as("cos_q"))
      .groupBy("query_id")
      .agg(
        topk(-col("cos_f"), col("vec_id"), col("cos_f")).as("tf"),
        topk(-col("cos_q"), col("vec_id"), col("cos_q")).as("tq"))
      .select(col("query_id"),
        transform(col("tf.cands"), x => x.getField("id")).as("ids_f"),
        transform(col("tq.cands"), x => x.getField("id")).as("ids_q"))
      .select(col("query_id"),
        size(array_intersect(col("ids_f"), col("ids_q"))).cast("long")
          .as("n_overlap"),
        aggregate(
          zip_with(col("ids_f"), col("ids_q"),
            (a, b) => when(a === b, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("n_rank_match"))
      .withColumn("certified", col("n_overlap") >= lit(RecallBound))
      .orderBy("query_id")
  }

  /** q106 — IVF recall/scan-fraction certification: does probing the
    * `nprobe` best cells (the q46 index discipline) actually beat
    * scanning a random subset of the same size? For each of 5 probe
    * vectors, exact cosine top-10 over the FULL corpus vs top-10 over
    * only the probed cells, plus how many candidates each side
    * scanned. The certificate is the integer-exact tradeoff property
    * `n_overlap · n_candidates ≥ k · n_probed` — i.e. recall@k ≥ the
    * scanned fraction, which is what "the index is better than random
    * pruning" means and holds for ANY data distribution an IVF index
    * is worth building on. (Absolute recall on the synthetic fixture
    * is structurally modest — the embeddings are unclustered, so
    * ~25% scan fraction buys ~30–50% recall; a clustered real corpus
    * pushes recall toward 1 at the same fraction. The certificate
    * deliberately pins the distribution-free property, not a fixture
    * artifact.)
    *
    * Scale: the ground truth needs the full scan anyway, so the whole
    * certification is ONE pass over the scored corpus — probe
    * membership is a broadcast-joined flag and both bounded top-k's
    * reduce in the same aggregation (in production the IVF side alone
    * would instead prune at the scan via the stored cell column,
    * reading ~nprobe/K of the data). Probe cells and queries
    * broadcast. */
  /** The ONE IVF certification shape, shared by q106 (float lists)
    * and q128 (int8 lists) — review r12: the two queries were 70-line
    * near-copies, and a sentinel or tie-break change applied to one
    * would have silently diverged the other (the purgeFrom
    * discipline). `quantized` only switches WHICH vectors the pruned
    * leg scores; the routing, sentinel padding, one-pass aggregation
    * and tradeoff certificate are literally the same code.
    *
    * One pass over the scored corpus (review r12: a two-branch plan
    * re-scored every cosine for the ivf side): the probe-membership
    * flag comes from a broadcast left join, and BOTH bounded top-k's
    * reduce in the same aggregation. Non-probed rows feed the ivf
    * aggregate a sentinel (neg_cos 3.0 > any real neg-cosine ≤ 2.0,
    * id −1) that sorts after every probed candidate, so the ivf
    * top-k is exactly the probed top-k padded with sentinels that
    * the id filter below drops. In the float path the pruned leg
    * REUSES the ground-truth cosine column (no second dot). */
  private def ivfCertify(s: SparkSession, dir: String,
      quantized: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (kCent, nprobe, k) = (8, 2, 10)
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val e =
      if (!quantized) base.withColumn("q", col("v"))
      else base
        .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
        .withColumn("q", transform(col("v"), x =>
          when(col("scale") === 0d, lit(0d))
            .otherwise(round(x * lit(127) / col("scale")))))
        .select(col("vec_id"), col("v"), col("q"))
    val cent = e.filter(col("vec_id") < kCent)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val assigned = e.join(broadcast(cent))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("v"), col("q"))
    val qs = e.filter(col("vec_id").between(40, 44))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("q").as("qq"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val qcells = cent.join(broadcast(qs))
      .withColumn("cos_c", cosine(col("cv"), col("qv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id").as("qc_query"), col("c_id").as("probe_cell"))
    val scored = assigned
      .join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .join(broadcast(qcells),
        col("query_id") === col("qc_query") && col("cell") === col("probe_cell"),
        "left")
      .withColumn("cos_f", cosine(col("v"), col("qv")))
      .withColumn("cos_q",
        if (quantized) cosine(col("q"), col("qq")) else col("cos_f"))
      .select(col("query_id"), col("vec_id"), col("cos_f"), col("cos_q"),
        col("qc_query").isNotNull.as("in_probe"))
    scored.groupBy("query_id").agg(
        topk(-col("cos_f"), col("vec_id"), col("cos_f")).as("te"),
        topk(when(col("in_probe"), -col("cos_q")).otherwise(lit(3.0)),
          when(col("in_probe"), col("vec_id")).otherwise(lit(-1L)),
          col("cos_q")).as("ti"),
        count(lit(1)).as("n_candidates"),
        sum(when(col("in_probe"), 1L).otherwise(0L)).as("n_probed"))
      .select(col("query_id"),
        size(array_intersect(
          transform(col("te.cands"), x => x.getField("id")),
          filter(transform(col("ti.cands"), x => x.getField("id")),
            id => id =!= lit(-1L)))).cast("long")
          .as("n_overlap"),
        col("n_probed"), col("n_candidates"))
      .withColumn("beats_random",
        col("n_overlap") * col("n_candidates") >= lit(k.toLong) * col("n_probed"))
      .orderBy("query_id")
  }

  def ivfRecall(s: SparkSession, dir: String): DataFrame =
    ivfCertify(s, dir, quantized = false)

  /** Oracle mirror of [[ivfCertify]] — one builder for both the q106
    * (float) and q128 (int8) certificates; `quantized` switches the
    * vector-prep chain and which columns the pruned leg scores, the
    * rest of the CTE text is shared verbatim. */
  private def ivfCertSql(quantized: Boolean): String = {
    val prep =
      if (!quantized)
        """e0 AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |  FROM embeddings),
          |e AS (SELECT vec_id, v, v AS q FROM e0)""".stripMargin
      else
        """e0 AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |  FROM embeddings),
          |sq AS (
          |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale
          |  FROM e0),
          |e AS (
          |  SELECT vec_id, v,
          |    list_transform(v, x ->
          |      CASE WHEN scale = 0 THEN 0.0 ELSE round(x * 127 / scale) END) AS q
          |  FROM sq)""".stripMargin
    val cq =
      if (quantized) cosineSqlFor("a.q", "qs.qq")
      else cosineSqlFor("a.v", "qs.qv")
    s"""WITH $prep,
      |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
      |sc AS (
      |  SELECT e.vec_id, cent.c_id, e.v, e.q,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY ${cosineSqlFor("e.v", "cent.cv")} DESC, cent.c_id DESC) AS rn
      |  FROM e, cent),
      |assigned AS (SELECT vec_id, c_id AS cell, v, q FROM sc WHERE rn = 1),
      |qs AS (SELECT vec_id AS query_id, v AS qv, q AS qq
      |       FROM e WHERE vec_id BETWEEN 40 AND 44),
      |qc AS (
      |  SELECT query_id, c_id AS probe_cell FROM (
      |    SELECT qs.query_id, cent.c_id,
      |      row_number() OVER (PARTITION BY qs.query_id
      |        ORDER BY ${cosineSqlFor("cent.cv", "qs.qv")} DESC, cent.c_id DESC) AS rn
      |    FROM cent, qs) WHERE rn <= 2),
      |scored AS (
      |  SELECT qs.query_id, a.vec_id, a.cell,
      |    ${cosineSqlFor("a.v", "qs.qv")} AS cf,
      |    $cq AS cq
      |  FROM assigned a, qs WHERE a.vec_id <> qs.query_id),
      |ex AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cf DESC, vec_id ASC) AS rk
      |  FROM scored),
      |iv AS (
      |  SELECT s.query_id, s.vec_id,
      |    row_number() OVER (PARTITION BY s.query_id ORDER BY s.cq DESC, s.vec_id ASC) AS rk,
      |    count(*) OVER (PARTITION BY s.query_id) AS n_probed
      |  FROM scored s JOIN qc ON qc.query_id = s.query_id AND qc.probe_cell = s.cell),
      |np AS (SELECT DISTINCT query_id, n_probed FROM iv),
      |nc AS (SELECT query_id, count(*) AS n_candidates FROM scored GROUP BY query_id),
      |le AS (SELECT query_id, list(vec_id ORDER BY rk) AS ids
      |       FROM ex WHERE rk <= 10 GROUP BY query_id),
      |li AS (SELECT query_id, list(vec_id ORDER BY rk) AS ids
      |       FROM iv WHERE rk <= 10 GROUP BY query_id)
      |SELECT le.query_id,
      |  CAST(len(list_intersect(le.ids, li.ids)) AS BIGINT) AS n_overlap,
      |  CAST(np.n_probed AS BIGINT) AS n_probed,
      |  CAST(nc.n_candidates AS BIGINT) AS n_candidates,
      |  (len(list_intersect(le.ids, li.ids)) * nc.n_candidates
      |    >= 10 * np.n_probed) AS beats_random
      |FROM le
      |JOIN li ON li.query_id = le.query_id
      |JOIN np ON np.query_id = le.query_id
      |JOIN nc ON nc.query_id = le.query_id
      |ORDER BY le.query_id""".stripMargin
  }

  val ivfRecallSql: String = ivfCertSql(quantized = false)

  val int8RecallSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale
      |  FROM e),
      |z AS (
      |  SELECT vec_id, v,
      |    list_transform(v, x ->
      |      CASE WHEN scale = 0 THEN 0.0 ELSE round(x * 127 / scale) END) AS q
      |  FROM sc),
      |qry AS (
      |  SELECT vec_id AS query_id, v AS qv, q AS qq FROM z WHERE vec_id < 5),
      |scored AS (
      |  SELECT qry.query_id, z.vec_id,
      |    ${cosineSqlFor("z.v", "qv")} AS cos_f,
      |    ${cosineSqlFor("z.q", "qq")} AS cos_q
      |  FROM z, qry WHERE z.vec_id <> qry.query_id),
      |rf AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_f DESC, vec_id ASC) AS rk
      |  FROM scored),
      |rq AS (
      |  SELECT query_id, vec_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, vec_id ASC) AS rk
      |  FROM scored),
      |lf AS (SELECT query_id, list(vec_id ORDER BY rk) AS ids
      |       FROM rf WHERE rk <= $RecallK GROUP BY query_id),
      |lq AS (SELECT query_id, list(vec_id ORDER BY rk) AS ids
      |       FROM rq WHERE rk <= $RecallK GROUP BY query_id)
      |SELECT lf.query_id,
      |  CAST(len(list_intersect(lf.ids, lq.ids)) AS BIGINT) AS n_overlap,
      |  CAST(len(list_filter(range(1, ${RecallK + 1}),
      |    i -> lf.ids[i] = lq.ids[i])) AS BIGINT) AS n_rank_match,
      |  (len(list_intersect(lf.ids, lq.ids)) >= $RecallBound) AS certified
      |FROM lf JOIN lq ON lq.query_id = lf.query_id
      |ORDER BY lf.query_id""".stripMargin

  val quantizeInt8Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, label, v,
      |    list_max(list_transform(v, x -> abs(x))) AS scale
      |  FROM e),
      |q AS (
      |  SELECT vec_id, label, scale,
      |    list_transform(v, x ->
      |      CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
      |           ELSE CAST(round(x * 127 / scale) AS BIGINT) END) AS qs,
      |    list_max(list_transform(v, x ->
      |      CASE WHEN scale = 0 THEN 0.0
      |           ELSE abs(x - round(x * 127 / scale) * scale / 127) END)) AS max_err
      |  FROM s)
      |SELECT vec_id, label,
      |  CAST(list_aggregate(list_transform(qs, q -> abs(q)), 'sum') AS BIGINT) AS q_l1,
      |  CAST(list_max(qs) AS BIGINT) AS q_max,
      |  CAST(list_min(qs) AS BIGINT) AS q_min,
      |  round(scale, 6) AS scale_r6,
      |  (max_err <= scale / 254 + 1e-12) AS within_bound
      |FROM q
      |ORDER BY vec_id""".stripMargin

  // ---- q109: semantic dedup (cluster → within-cell purge) -----------

  /** q109's cosine threshold — the q45 τ, so the two semantic-near-dup
    * surfaces (LSH-bucketed pairs, cluster-pruned purge) certify the
    * same similarity contract. */
  private[queries] val SemDedupTau = 0.4

  /** q109 — SemDeDup-style semantic deduplication (the published
    * cluster-then-prune recipe: Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus embeddings into k cells, then within each cell
    * purge every vector that has a LOWER-id neighbour with cosine ≥ τ.
    * The keep-first-index rule is the paper's greedy form and needs NO
    * transitive closure: j is purged because SOME earlier i covers it,
    * whether or not i itself survived — so the whole purge is one
    * aggregation over within-cell qualifying pairs, not a
    * connected-components loop (contrast q49/q105, where cluster
    * IDENTITY matters; here only keep/drop does).
    *
    * Scale shape — the reason this is THE semantic-dedup method at
    * 100 TB:
    *  - cell assignment is the shared [[assignCells]] literal-centroid
    *    argmax — map-only, no corpus shuffle; k grows with the corpus
    *    (k ≈ n / target-cell-size, SemDeDup uses k ≈ √n·const)
    *    precisely so within-cell pair enumeration stays sub-quadratic
    *    (Σ nᵢ² ≈ n²/k on balanced cells); the fixture pins
    *    k = [[CentroidK]];
    *  - pair enumeration reuses the q45 discipline: both sides
    *    repartition on `cell` and the join is pinned shuffle-hash, so
    *    the two exchanges canonicalize identically and ReuseExchange
    *    computes the scan + assignment subplan ONCE (a broadcast
    *    self-join would run it twice); norms are computed once per
    *    vector in the signature pass, so each pair costs ONE dot;
    *  - the τ predicate runs on exact doubles in both engines (the
    *    q45 bit-identity argument); the output cosine is rounded only
    *    at the boundary.
    *
    * Output: one row per PURGED vector — its cell, how many earlier
    * in-cell neighbours cover it, the smallest covering id (the
    * provenance a curation audit needs, q92's `kept_doc` idiom), and
    * the strongest covering cosine. Survivors don't appear: at corpus
    * scale the purge list is the small side and is what a pipeline
    * anti-joins against (exactly the q92/q108 delete-set contract). */
  def semanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticPurgeFromCells(cellIndex(s, dir))

  /** The within-cell greedy purge over an EXPLICIT cell index frame
    * (vec_id, cell, norm, v) — shared by q109 (index build form) and
    * `Warehouse.build` (which persists the purge computed from its own
    * stored `cells` table), so the purge rule cannot drift between the
    * registry query and the warehouse. */
  private[queries] def semanticPurgeFromCells(cellsIdx: DataFrame): DataFrame = {
    val sig = cellsIdx
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
      .repartition(col("cell"))
    val denom = col("a.norm") * col("b.norm")
    sig.as("a")
      .join(sig.as("b").hint("shuffle_hash"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        when(denom === 0.0, lit(-2.0))
          .otherwise(dot(col("a.v"), col("b.v")) / denom))
      .filter(col("cos") >= SemDedupTau)
      .groupBy(col("b.vec_id").as("vec_id"), col("b.cell").as("cell"))
      .agg(
        count(lit(1)).as("n_covering"),
        min(col("a.vec_id")).as("kept_by"),
        round(max(col("cos")), 6).as("max_cos"))
      .orderBy("vec_id")
  }

  // ---- q116: per-label centroid drift matrix -------------------------

  /** q116 — embedding-space drift monitoring: the pairwise cosine
    * matrix between per-label centroids, the one-glance answer to "are
    * the class/source clusters collapsing or separating?" that an
    * embedding-quality dashboard tracks across corpus versions (labels
    * here play the cohort role: sources, snapshot dates, model
    * versions at 100 TB).
    *
    * Exactness discipline (q72's fixed-point idiom carried one step
    * further): centroids are per-(label, dim) micro-unit integer means
    * — order-free exact sums, floor-rounded division — and the pair
    * matrix is computed DIRECTLY on those integers: dot products and
    * squared norms of 64-dim ≤ 10⁶-scale longs stay < 2⁵³ (6.4·10¹³),
    * so every number before the final sqrt/division is EXACT in both
    * engines and the oracle hash-checks the whole matrix to the last
    * bit of the rounded cosine.
    *
    * Scale shape: ONE map-side-combined shuffle of (label, pos,
    * partial sum) rows — labels·dim groups regardless of corpus size
    * (the q72 contract); after that everything is |labels|·dim rows —
    * driver-small. The pair join is |labels|²·dim on centroid rows,
    * never on the corpus. */
  def labelCentroidDrift(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.embeddings(s, dir)
      .select(col("label"), posexplode(doubled(col("embedding")))
        .as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("sq"))
      .select(col("label"), col("pos"), col("n_members"),
        floor(col("sq").cast("double") / col("n_members") + 0.5).cast("long")
          .as("m"))
    val norms = cents.groupBy(col("label"))
      .agg(sum(col("m") * col("m")).as("nrm2"),
        max(col("n_members")).as("n_members"))
    val dots = cents.as("a")
      .join(cents.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.m") * col("b.m")).as("dot"))
    dots
      .join(norms.select(col("label").as("label_a"), col("nrm2").as("na2"),
        col("n_members").as("n_a")), Seq("label_a"))
      .join(norms.select(col("label").as("label_b"), col("nrm2").as("nb2"),
        col("n_members").as("n_b")), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        when(col("na2") === 0L || col("nb2") === 0L, lit(-2.0))
          .otherwise(col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
          .as("cos"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("cos"), 6).as("centroid_cos"))
      .orderBy("label_a", "label_b")
  }

  val labelCentroidDriftSql: String =
    """WITH e AS (
      |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |xp AS (
      |  SELECT label, CAST(i - 1 AS INTEGER) AS pos, v[i] AS x
      |  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) r),
      |c AS (
      |  SELECT label, pos,
      |    CAST(count(*) AS BIGINT) AS n_members,
      |    CAST(floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / count(*) + 0.5) AS BIGINT) AS m
      |  FROM xp GROUP BY label, pos),
      |nr AS (
      |  SELECT label, CAST(sum(m * m) AS BIGINT) AS nrm2,
      |    max(n_members) AS n_members
      |  FROM c GROUP BY label),
      |d AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(sum(a.m * b.m) AS BIGINT) AS dot
      |  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
      |  GROUP BY a.label, b.label)
      |SELECT d.label_a, d.label_b,
      |  na.n_members AS n_a, nb.n_members AS n_b,
      |  round(CASE WHEN na.nrm2 = 0 OR nb.nrm2 = 0 THEN -2.0
      |    ELSE CAST(d.dot AS DOUBLE)
      |      / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
      |    END, 6) AS centroid_cos
      |FROM d
      |  JOIN nr na ON na.label = d.label_a
      |  JOIN nr nb ON nb.label = d.label_b
      |ORDER BY label_a, label_b""".stripMargin

  /** Oracle mirror of [[semanticPurgeFromCells]]'s pair enumeration
    * (expects the [[cellAssignCteSql]] chain in scope; yields
    * `sig(vec_id, v, cell, norm)` and `p(i, j, cell, cos)`) — shared
    * by the q109 oracle and the q134 warehouse-stats oracle so the
    * semantic pair definition cannot drift between them. */
  private[queries] val semPairCteSql: String =
    """sig AS (
      |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
      |  FROM a WHERE rn = 1),
      |p AS (
      |  SELECT pa.vec_id AS i, pb.vec_id AS j, pb.cell AS cell,
      |    CASE WHEN pa.norm * pb.norm = 0 THEN -2.0
      |      ELSE list_inner_product(pa.v, pb.v) / (pa.norm * pb.norm) END AS cos
      |  FROM sig pa JOIN sig pb
      |    ON pa.cell = pb.cell AND pa.vec_id < pb.vec_id)""".stripMargin

  val semanticDedupSql: String =
    s"""WITH $cellAssignCteSql,
       |$semPairCteSql
       |SELECT j AS vec_id, cell, count(*) AS n_covering,
       |  min(i) AS kept_by, round(max(cos), 6) AS max_cos
       |FROM p
       |WHERE cos >= $SemDedupTau
       |GROUP BY j, cell
       |ORDER BY vec_id""".stripMargin

  // ---- q118: hybrid retrieval fusion (RRF) ---------------------------

  /** The standard reciprocal-rank-fusion constant (Cormack et al.'s
    * k = 60 — large enough that rank 1 doesn't dominate, small enough
    * that depth still matters). */
  private[queries] val RrfK = 60

  /** q118 — HYBRID retrieval: the q112 sparse (BM25) and q29 dense
    * (cosine) top-20 lists fused by reciprocal rank fusion,
    * rrf(d) = Σ_leg 1/(k + rank_leg(d)) — the standard way a RAG stack
    * combines a lexical and an embedding index without score
    * calibration (ranks, not scores, cross the fusion boundary, so
    * the two legs' incomparable score scales never meet).
    *
    * Both legs rank on their UNROUNDED scores (the shared
    * [[TextOps.bm25Scored]] / [[cosineScored]] frames — ranking on the
    * display-rounded outputs could flip near-equal neighbours), ties
    * broken by doc_id: a total order, so ranks are integers both
    * engines agree on exactly, and 1/(k + rank) is one
    * correctly-rounded division of small integers — bit-identical.
    * Docs in only one list contribute one term (the other rank
    * reported as 0 = "absent").
    *
    * Scale shape: each leg is its own already-scale-shaped contract
    * (BM25: two scans + TakeOrdered heap; cosine: broadcast probe,
    * map-side score, TakeOrdered). The fusion itself touches 2k rows —
    * the in-list re-rank windows and the full-outer join run on ≤ 20
    * rows per leg regardless of corpus size. */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = TextOps.Bm25K
    val sp = TextOps.bm25Scored(s, dir)
      .orderBy(col("s").desc, col("doc_id").asc).limit(k)
      .withColumn("rank_sparse",
        row_number().over(Window.orderBy(col("s").desc, col("doc_id").asc))
          .cast("long"))
      .select(col("doc_id"), col("rank_sparse"))
    val dn = cosineScored(s, dir)
      .orderBy(col("cos").desc, col("vec_id").asc).limit(k)
      .withColumn("rank_dense",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_dense"))
    def term(r: Column): Column =
      when(r.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(RrfK) + r))
    sp.join(dn, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_sparse"), lit(0L)).as("rank_sparse"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
        round(term(col("rank_sparse")) + term(col("rank_dense")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  val hybridRrfSql: String =
    s"""WITH ${TextOps.bm25CteSql},
       |$cosineScoredCteSql,
       |spr AS (
       |  SELECT doc_id, rank_sparse FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank_sparse
       |    FROM sc) WHERE rank_sparse <= ${TextOps.Bm25K}),
       |den AS (
       |  SELECT doc_id, rank_dense FROM (
       |    SELECT vec_id AS doc_id,
       |      row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank_dense
       |    FROM scored) WHERE rank_dense <= ${TextOps.Bm25K})
       |SELECT COALESCE(spr.doc_id, den.doc_id) AS doc_id,
       |  CAST(COALESCE(rank_sparse, 0) AS BIGINT) AS rank_sparse,
       |  CAST(COALESCE(rank_dense, 0) AS BIGINT) AS rank_dense,
       |  round(COALESCE(CAST(1 AS DOUBLE) / ($RrfK + rank_sparse), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + rank_dense), 0), 6) AS rrf
       |FROM spr FULL OUTER JOIN den ON spr.doc_id = den.doc_id
       |ORDER BY rrf DESC, doc_id""".stripMargin

  // ---- q119: semantic decontamination --------------------------------

  private[queries] val SemDecontamTau = 0.35
  private[queries] val SemDecontamProbes = 10

  /** q119 — SEMANTIC decontamination: which corpus vectors sit within
    * cosine ≥ τ of any benchmark probe. The n-gram decontamination
    * family (q66 exact grams, q94 bloom, q111 chunk-grain) catches
    * verbatim and near-verbatim leakage; paraphrased eval items share
    * no 5-gram with their source and sail through — embedding
    * similarity is the standard second net (the contamination audits
    * run on modern LLM corpora pair exactly these two: lexical overlap
    * + embedding nearest-neighbour). Probes here are the vec_id <
    * [[SemDecontamProbes]] slice (the q66 "held-out benchmark" role);
    * output is one row per FLAGGED corpus vector — hit count, closest
    * probe (ties to the smaller probe id via the q113 lexicographic
    * struct max), max cosine. Clean vectors don't appear (the sparse
    * q66/q111 contract).
    *
    * Scale shape: the eval set is small by premise → broadcast; the
    * corpus side scores map-only against the broadcast probe block
    * (|corpus|·|probes| dot products with NO shuffle — the q29/q30
    * discipline) and only flagged rows reach the aggregation, which
    * groups on vec_id with map-side combine. At 100 TB: one corpus
    * scan, traffic O(contaminated rows). τ = [[SemDecontamTau]] is
    * evaluated on bit-identical doubles in both engines. */
  def semanticDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val probes = e.filter(col("vec_id") < SemDecontamProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    e.filter(col("vec_id") >= SemDecontamProbes)
      .join(broadcast(probes))
      .withColumn("cos", cosine(col("v"), col("pv")))
      .filter(col("cos") >= SemDecontamTau)
      .groupBy(col("vec_id"))
      .agg(
        count(lit(1)).as("n_probes_hit"),
        max(struct(col("cos"), (-col("probe_id")).as("neg"))).as("best"))
      .select(col("vec_id"), col("n_probes_hit"),
        (-col("best.neg")).as("top_probe"),
        round(col("best.cos"), 6).as("max_cos"))
      .orderBy("vec_id")
  }

  val semanticDecontaminateSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, v AS pv FROM e
       |      WHERE vec_id < $SemDecontamProbes),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id >= $SemDecontamProbes),
       |sx AS (
       |  SELECT c.vec_id, p.probe_id, ${cosineSqlFor("c.v", "p.pv")} AS cos
       |  FROM c, p),
       |f AS (SELECT * FROM sx WHERE cos >= $SemDecontamTau),
       |r AS (
       |  SELECT vec_id, probe_id, cos,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY cos DESC, probe_id ASC) AS rk,
       |    count(*) OVER (PARTITION BY vec_id) AS n_probes_hit
       |  FROM f)
       |SELECT vec_id, CAST(n_probes_hit AS BIGINT) AS n_probes_hit,
       |  probe_id AS top_probe, round(cos, 6) AS max_cos
       |FROM r
       |WHERE rk = 1
       |ORDER BY vec_id""".stripMargin

  // ---- q128: end-to-end ANN configuration certificate (IVF × int8) ---

  /** q128 — the PRODUCTION ANN configuration certified end-to-end:
    * IVF cell pruning (q106's index discipline) over int8-quantized
    * vectors (q101/q103's storage format) — the combination a real
    * 100 TB vector store actually runs (route the float query through
    * float centroids, scan only the probed cells' QUANTIZED lists) —
    * against the exact float full-scan top-10. q106 certified pruning
    * alone and q103 quantization alone; composing them is not free
    * (quantization error can demote exactly the borderline neighbours
    * pruning preserved), so the composed path gets its own measured
    * certificate: per query, overlap with ground truth, scan fraction,
    * and the distribution-free tradeoff property
    * `n_overlap·n_candidates ≥ k·n_probed` (the q106 "beats random
    * pruning" bar, now demanded of the full pipeline).
    *
    * Exactness: the int8 side scores INTEGER vectors directly (cosine
    * scale-invariance, the q103 argument — every dot exact in double);
    * the float side is the standing bit-identical cosine; ranks tie-
    * break on vec_id; overlaps are exact integers.
    *
    * Scale: ONE pass over the scored corpus — both top-k's reduce in
    * the same bounded-TopK aggregation, probe membership is a
    * broadcast-joined flag, sentinel padding keeps non-probed rows
    * out of the IVF heap (the q106 one-pass discipline; in production
    * the IVF side prunes at the scan via the stored cell column and
    * reads int8 lists — ~nprobe/K of the bytes at a quarter the
    * width). */
  def ivfInt8Recall(s: SparkSession, dir: String): DataFrame =
    ivfCertify(s, dir, quantized = true)

  val ivfInt8RecallSql: String = ivfCertSql(quantized = true)

  // ---- q126: incremental semantic dedup (new batch vs cell index) ----

  /** Deterministic "today's batch" slice: vec_id ≡ 9 (mod 10) — the
    * q41 hash-slice idiom, scale-factor-independent and disjoint from
    * the centroid ids (0..7). */
  private[queries] val IncrSemMod = 10L

  /** q126 — INCREMENTAL semantic dedup: the q113 day-to-day production
    * shape at EMBEDDING grain. The full-corpus pass (q109) builds the
    * cell-bucketed index once; every subsequent increment runs THIS —
    * each new-batch vector is assigned its cell by the shared
    * [[assignCells]] argmax and compared against the INDEX members of
    * that cell only (never new×new, never index×index, never across
    * cells). Verdict row per new vector with ≥ 1 in-cell index member:
    * cell population, covering count at the q109 τ, best index match
    * (ties to the smaller id via the oracle's row_number), and the
    * admit/reject flag. Empty-cell vectors are admitted implicitly
    * (the sparse q113/q66 contract).
    *
    * Scale shape: the index side is the STORED q109/q72 cell
    * assignment — since r13 read from the materialized
    * [[Warehouse]]'s `cells`/`centroids` tables; the new batch —
    * small by premise — is the only side
    * that computes assignments; the probe join touches only the cells
    * the new batch lands in, so increment cost is O(new batch +
    * matched cells), never O(index). k (cells) stays the sub-quadratic
    * knob exactly as in q109. */
  def incrementalSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val isNew = pmod(col("vec_id"), lit(IncrSemMod)) === lit(IncrSemMod - 1)
    // Since r13 the index side IS the stored warehouse: the increment
    // probes the persisted `cells` table (vectors bucketed by cell,
    // norms precomputed) and assigns the new batch with the persisted
    // `centroids` — the new batch is the only side that computes
    // anything from raw embeddings (PlanShapeSpec pins the shape).
    val cents = graft.queries.Warehouse.storedCentroids(s, dir)
    val newE = Tables.embeddings(s, dir).filter(isNew)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    val nb = assignCellsWith(newE, cents)
      .select(col("vec_id").as("new_vec"), col("v").as("nv2"),
        col("nv").as("nn"), col("cell"))
    val ib = graft.queries.Warehouse.stored(s, dir, "cells").filter(!isNew)
      .select(col("vec_id").as("idx_vec"), col("v").as("iv"),
        col("norm").as("inorm"), col("cell"))
    val denom = col("nn") * col("inorm")
    // The batch side BROADCASTS (r13 verdict #1's cell-probe audit):
    // without the hint the planner sort-merges on `cell` — k=8 keys,
    // so the ENTIRE stored cell index shuffles into 8 skewed
    // partitions. Broadcasting the (small by premise) batch keeps the
    // stored side map-only; the only exchange left is the final
    // per-new-vector aggregation, whose map-side combine reduces to
    // O(batch) rows before it ships.
    broadcast(nb).join(ib, Seq("cell"))
      .withColumn("cos",
        when(denom === 0.0, lit(-2.0))
          .otherwise(dot(col("nv2"), col("iv")) / denom))
      .groupBy(col("new_vec"), col("cell"))
      .agg(
        count(lit(1)).as("n_cell_index"),
        sum(when(col("cos") >= SemDedupTau, 1L).otherwise(0L)).as("n_covering"),
        max(struct(col("cos"), (-col("idx_vec")).as("neg"))).as("best"))
      .select(
        col("new_vec"), col("cell"), col("n_cell_index"), col("n_covering"),
        (-col("best.neg")).as("best_match"),
        round(col("best.cos"), 6).as("best_cos"),
        (col("best.cos") >= SemDedupTau).as("is_dup"))
      .orderBy("new_vec")
  }

  // ---- q142: ANN top-k SERVED from the stored index ------------------

  /** q142 — the ANN SERVING read path of the materialized warehouse:
    * the q46 IVF dataflow with every stage's input coming from STORED
    * tables, zero corpus scans (PlanShapeSpec pins neither
    * `embeddings.parquet` nor `documents.parquet` in the plan). The
    * query vector itself is fetched from the stored `cells` table —
    * a serving tier holds the index, not the corpus — the probe cells
    * are chosen against the stored `centroids` (k·dim rows, broadcast),
    * and the candidate scan reads `cells` restricted to the nprobe
    * probed cells with the norms PRECOMPUTED at build time (the point
    * of materializing an IVF index: search does no per-row sqrt over
    * the corpus side).
    *
    * Scale: at 100 TB `cells` is partitioned BY CELL, so the probe
    * semi-join is partition pruning — the scan reads nprobe/K of the
    * index and nothing else; the two broadcast sides are one row (the
    * query) and nprobe rows (the probed cell ids). Search latency is
    * O(index/K · nprobe), independent of corpus size, exactly the IVF
    * contract. Recall at this nprobe is certified by q106/q128; THIS
    * query certifies the stored read path end to end (the builder
    * mandate's similarity-search scale path, served from the
    * materialized index the way q113 serves dedup). */
  /** q142/q146 serve-protocol constants — the hybrid fusion serves
    * the SAME search as the standalone ANN query, one definition. */
  private[queries] val AnnProbeN = 2
  private[queries] val AnnQueryId = 42L
  private[queries] val AnnServeK = 10

  /** The q142 candidate frame BEFORE top-k/rounding — (vec_id, cell,
    * cos) for every index vector in the probed cells. Factored so the
    * q146 hybrid fusion ranks on the identical unrounded scores
    * (ranking on display-rounded values could flip near-equal
    * neighbours — the q118 discipline). */
  /** The vector tombstone list of the memoized fixture store for
    * `dir` (None — fixtures are never deleted from, so committed
    * plans are unchanged) — the fold every dense serve applies so a
    * caller-driven [[graft.queries.Warehouse.deleteVectors]] reaches
    * ALL of them (r15 verdict #6). */
  private def fixtureTomb(s: SparkSession, dir: String): Option[DataFrame] =
    graft.queries.Warehouse.vecTombstones(s,
      graft.queries.Warehouse.ensure(s, dir))

  private def minusTomb(cells: DataFrame,
      tomb: Option[DataFrame]): DataFrame =
    tomb.fold(cells)(t =>
      cells.join(broadcast(t.select("vec_id")), Seq("vec_id"), "left_anti"))

  private[queries] def annServeScored(s: SparkSession, dir: String): DataFrame = {
    val cells = minusTomb(
      graft.queries.Warehouse.stored(s, dir, "cells"), fixtureTomb(s, dir))
    val qv = cells.filter(col("vec_id") === AnnQueryId)
      .select(col("v").as("quv"), col("norm").as("qn"))
    val qcells = graft.queries.Warehouse.stored(s, dir, "centroids")
      .join(broadcast(qv))
      .withColumn("cos_c", cosine(col("v"), col("quv")))
      .orderBy(col("cos_c").desc, col("c_id").desc)
      .limit(AnnProbeN)
      .select(col("c_id").as("probe_cell"))
    val denom = col("norm") * col("qn")
    cells
      .join(broadcast(qcells), col("cell") === col("probe_cell"))
      .join(broadcast(qv))
      .filter(col("vec_id") =!= AnnQueryId)
      .withColumn("cos", when(denom === 0.0, lit(-2.0))
        .otherwise(dot(col("v"), col("quv")) / denom))
  }

  def annServe(s: SparkSession, dir: String): DataFrame =
    annServeScored(s, dir)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(AnnServeK)
      .select(col("vec_id"), col("cell"), round(col("cos"), 6).as("cosine"))

  /** The qp → qc → cand TAIL of the q142 probe chain — expects `sig`
    * (cell assignment with build-time norms) already in scope. Split
    * from [[annProbeCteSql]] so the q148 oracle can splice it after
    * [[semPairCteSql]], which defines the SAME `sig` rule text. */
  private[queries] val annProbeTailCteSql: String =
    s"""qp AS (SELECT v AS quv, norm AS qn FROM sig WHERE vec_id = $AnnQueryId),
       |qc AS (
       |  SELECT c_id AS probe_cell FROM c, qp
       |  ORDER BY ${cosineSqlFor("c.qv", "qp.quv")} DESC, c_id DESC
       |  LIMIT $AnnProbeN),
       |cand AS (
       |  SELECT sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * qp.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, qp.quv) / (sig.norm * qp.qn)
       |      END AS cos
       |  FROM sig JOIN qc ON sig.cell = qc.probe_cell, qp
       |  WHERE sig.vec_id <> $AnnQueryId)""".stripMargin

  /** Oracle rule text of the q142 probe chain (sig → qp → qc → cand);
    * splice [[cellAssignCteSql]] before it. Shared by q142 and the
    * q146 hybrid fusion so the serving path and the fused leg cannot
    * drift. */
  private[queries] val annProbeCteSql: String =
    s"""sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |$annProbeTailCteSql""".stripMargin

  /** Oracle: DuckDB re-derives the whole index from raw embeddings
    * (the shared [[cellAssignCteSql]] chain — what the warehouse
    * build persisted) and then runs the same probe + exact-rerank. */
  val annServeSql: String =
    s"""WITH $cellAssignCteSql,
       |$annProbeCteSql
       |SELECT vec_id, cell, round(cos, 6) AS cosine
       |FROM cand
       |ORDER BY cos DESC, vec_id ASC
       |LIMIT $AnnServeK""".stripMargin

  // ---- q150: PARAMETERIZED ANN serving (r14 verdict #1) --------------

  /** PARAMETERIZED ANN serving — the product API the pinned q142
    * fixture serve generalizes to: probe the stored IVF index with an
    * ARBITRARY query vector at an arbitrary (nprobe, k). Same plan
    * shape as q142 — centroids score against the one literal vector
    * (k·dim work, broadcast back as ≤ nprobe probe-cell ids), the
    * cells read prunes to the probed cells, the rerank is exact over
    * the pruned candidates. The query vector is ONE literal expression
    * regardless of dim, and per-row work carries zero per-centroid
    * nodes — the request scales exactly like the fixture one. Unlike
    * the pinned form there is no index identity to exclude: an
    * external query vector matching an indexed one is a legitimate
    * (cos = 1) neighbour. */
  def annServe(s: SparkSession, dir: String, queryVec: Seq[Double],
      nprobe: Int, k: Int): DataFrame =
    singleServe(serve(s, dir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k)), filtered = false)

  /** [[annServe]] against an EXPLICIT warehouse directory — the
    * product form for callers owning their own `Warehouse.build`
    * output (the corpus-dir overload resolves the memoized fixture
    * store; same types, so this needs its own name). */
  def annServeFrom(s: SparkSession, whDir: String, queryVec: Seq[Double],
      nprobe: Int, k: Int): DataFrame =
    singleServe(serveFrom(s, whDir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k)), filtered = false)

  /** The unrounded parameterized candidate frame (…, cell, cos) —
    * shared by [[annServe]] and the parameterized hybrid fusion. */
  private[queries] def annServeScoredRequest(s: SparkSession, dir: String,
      queryVec: Seq[Double], nprobe: Int): DataFrame =
    annServeScoredWith(graft.queries.Warehouse.stored(s, dir, _),
      queryVec, nprobe, fixtureTomb(s, dir))

  /** The ONE parameterized probe implementation, over any table
    * reader (memoized fixture store or an explicit warehouse). The
    * driver-side query norm is the same sequential fold the kernel
    * runs (the assignCellsWith discipline), so it is bit-identical to
    * the oracle's sqrt(list_inner_product(qv, qv)). Tombstoned
    * vectors (r15 verdict #6) anti-join out of the candidate read
    * before scoring. */
  private def annServeScoredWith(table: String => DataFrame,
      queryVec: Seq[Double], nprobe: Int,
      tomb: Option[DataFrame] = None): DataFrame = {
    require(queryVec.nonEmpty, "annServe needs a query vector")
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    val qn = math.sqrt(queryVec.foldLeft(0.0)((a, x) => a + x * x))
    val qv = typedLit(queryVec)
    val qcells = table("centroids")
      .withColumn("cos_c", cosine(col("v"), qv))
      .orderBy(col("cos_c").desc, col("c_id").desc)
      .limit(nprobe)
      .select(col("c_id").as("probe_cell"))
    val denom = col("norm") * lit(qn)
    minusTomb(table("cells"), tomb)
      .join(broadcast(qcells), col("cell") === col("probe_cell"))
      .withColumn("cos", when(denom === 0.0, lit(-2.0))
        .otherwise(dot(col("v"), qv) / denom))
  }

  /** The q150 pinned request — a DIFFERENT probe vector, nprobe and k
    * than the q142 fixture, so the certificate exercises the
    * parameterized path, not the pinned constants. The vector is an
    * indexed embedding read back as an arbitrary Seq[Double] request
    * (one bounded driver collect). */
  private[queries] val ParamQueryVecId = 123L
  private[queries] val ParamNprobe = 3
  private[queries] val ParamAnnK = 12

  /** q150 — the parameterized ANN serve certified against a
    * from-scratch DuckDB re-derivation of the index + the same
    * parameterized probe from raw embeddings. */
  def annServeParam(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    annServe(s, dir, qv, ParamNprobe, ParamAnnK)
  }

  /** Oracle rule text of the PARAMETERIZED probe chain for a literal
    * request (query vector = embedding `vecId`): `sig` (build-time
    * norms, the q142 rule text) → `aqp` (the request vector + norm) →
    * `aqc` (nprobe best cells) → `aqcand` (pruned exact rerank, the
    * query row NOT excluded). CTE names `aq*` — disjoint from the
    * bm25 request (`rq*`) chain so the q151 hybrid can splice both. */
  private[queries] def annRequestProbeCteSql(vecId: Long,
      nprobe: Int): String =
    s"""sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |${annRequestProbeTailCteSql(vecId, nprobe)}""".stripMargin

  /** The aqp → aqc → aqcand TAIL of the parameterized probe chain —
    * expects `sig` already in scope (the q158 vector-delete oracle
    * supplies a FILTERED sig; the standard form splices the full
    * one). */
  private[queries] def annRequestProbeTailCteSql(vecId: Long,
      nprobe: Int): String =
    s"""aqp AS (SELECT v AS quv, sqrt(list_inner_product(v, v)) AS qn
       |        FROM e WHERE vec_id = $vecId),
       |aqc AS (
       |  SELECT c_id AS probe_cell FROM c, aqp
       |  ORDER BY ${cosineSqlFor("c.qv", "aqp.quv")} DESC, c_id DESC
       |  LIMIT $nprobe),
       |aqcand AS (
       |  SELECT sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * aqp.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, aqp.quv) / (sig.norm * aqp.qn)
       |      END AS cos
       |  FROM sig JOIN aqc ON sig.cell = aqc.probe_cell, aqp)""".stripMargin

  val annServeParamSql: String =
    s"""WITH $cellAssignCteSql,
       |${annRequestProbeCteSql(ParamQueryVecId, ParamNprobe)}
       |SELECT vec_id, cell, round(cos, 6) AS cosine
       |FROM aqcand
       |ORDER BY cos DESC, vec_id ASC
       |LIMIT $ParamAnnK""".stripMargin

  // ---- q155: BATCHED ANN serving (r15 verdict #1) --------------------

  /** BATCHED ANN serving — N query vectors probed in ONE Spark job
    * (r15 verdict #1: the parameterized serve runs one ~200 ms driver
    * job per request). Every per-request contract of the sequential
    * [[annServe]] holds — centroid probe at (cos DESC, c_id DESC),
    * nprobe cell pruning, exact rerank over the pruned candidates, no
    * identity exclusion — with the work shared across the batch:
    *
    *  - the request set is a tiny broadcast frame (req_id, qv, qn);
    *    qn is the same sequential Σx² fold (`graft_dot`) the
    *    sequential path folds on the driver, so scores are
    *    bit-identical;
    *  - probe-cell selection scores |requests|·k_centroid rows (both
    *    sides small) and keeps nprobe cells per request via a window
    *    over that tiny frame;
    *  - the stored `cells` read prunes to the UNION of all probed
    *    cells via ONE broadcast hash join against the (req_id,
    *    probe_cell, qv, qn) frame — a cell probed by many requests is
    *    read once and fanned out on the broadcast side, the corpus
    *    side never shuffles;
    *  - per-request top-k is the house [[graft.functions.
    *    TopKAggregator]] (O(k) state, map-side partials).
    *
    * Output one row per (req_id, rank ≤ k): req_id, rank, vec_id,
    * cell, cosine — per request identical to the sequential serve
    * (BatchServeSpec pins it). */
  def annServeBatch(s: SparkSession, dir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int): DataFrame =
    serve(s, dir, requests, AnnServeOpts(nprobe, k))

  /** [[annServeBatch]] against an EXPLICIT warehouse directory — the
    * product form for callers owning their own index builds. */
  def annServeBatchFrom(s: SparkSession, whDir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int): DataFrame =
    serveFrom(s, whDir, requests, AnnServeOpts(nprobe, k))

  /** The q155 pinned battery: 60 distinct stored vectors replayed as
    * requests (req_id = source vec_id — which also keys the oracle's
    * request CTE), at a nprobe/k distinct from the q142/q150 pins. */
  private[queries] val BatchAnnIds: Seq[Long] =
    (0 until 60).map(i => ((i * 13 + 7) % 480).toLong)
  private[queries] val BatchAnnNprobe = 2
  private[queries] val BatchAnnK = 8

  /** q155 — the batched ANN serve certified per request against a
    * from-scratch DuckDB re-derivation of the index + all 60 probes. */
  def annServeBatchQ(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(s, dir)
      .filter(col("vec_id").isin(BatchAnnIds: _*))
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    annServeBatch(s, dir, vecs.toSeq, BatchAnnNprobe, BatchAnnK)
  }

  /** Oracle rule text of the BATCH probe chain for literal request
    * ids `vecIds` (req_id = vec_id): `bq` (request vectors + norms) →
    * `bpc` (nprobe best cells per request) → `bcand` (pruned exact
    * rerank per request). Expects `sig` in scope; CTE names `b*` —
    * disjoint from the single-request (`aq*`/`rq*`) chains. */
  private[queries] def annBatchProbeCteSql(vecIds: Seq[Long],
      nprobe: Int): String =
    s"""bq AS (
       |  SELECT vec_id AS req_id, v AS quv,
       |    sqrt(list_inner_product(v, v)) AS qn
       |  FROM e WHERE vec_id IN (${vecIds.mkString(", ")})),
       |bpc AS (
       |  SELECT req_id, probe_cell, quv, qn FROM (
       |    SELECT bq.req_id, c.c_id AS probe_cell, bq.quv, bq.qn,
       |      row_number() OVER (PARTITION BY bq.req_id
       |        ORDER BY ${cosineSqlFor("c.qv", "bq.quv")} DESC, c.c_id DESC) AS rn
       |    FROM c, bq) WHERE rn <= $nprobe),
       |bcand AS (
       |  SELECT bpc.req_id, sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * bpc.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, bpc.quv) / (sig.norm * bpc.qn)
       |      END AS cos
       |  FROM sig JOIN bpc ON sig.cell = bpc.probe_cell)""".stripMargin

  val annServeBatchSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |${annBatchProbeCteSql(BatchAnnIds, BatchAnnNprobe)}
       |SELECT req_id, rank, vec_id, cell, round(cos, 6) AS cosine FROM (
       |  SELECT req_id,
       |    row_number() OVER (PARTITION BY req_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank,
       |    vec_id, cell, cos
       |  FROM bcand)
       |WHERE rank <= $BatchAnnK
       |ORDER BY req_id, rank""".stripMargin

  // ---- q157: int8-prefiltered ANN serving (r15 verdict #2) -----------

  /** Rescore depth of the quantized serve: the int8 prefilter keeps
    * 4·k candidates for full-precision rescoring — deep enough that a
    * quantization-rank perturbation inside the window cannot drop a
    * true top-k member (q157 certifies the served top-k equals the
    * full-precision probed top-k at the fixtures), shallow enough
    * that the full-precision tier is touched for O(k) rows/request. */
  private[queries] val QuantRescoreR = 40

  /** PARAMETERIZED ANN serving from the QUANTIZED index: probe cells
    * against the full-precision centroids (k·dim rows), rank the
    * probed candidates by exact-integer int8 cosine over the stored
    * `cells_q8` codes (1 byte/dim — the only corpus-scale read), keep
    * the top `rescore`, then re-score those O(k) rows exactly from
    * the full-precision `cells` tier (broadcast semi-join on the
    * candidate ids). This is the q128-certified composition
    * (IVF × int8) as the SERVING read path: at 100 TB the hot index
    * a request scans is ~6–8× smaller than the full-precision tier,
    * which is only touched for `rescore` rows per request. */
  def annServeQuant(s: SparkSession, dir: String, queryVec: Seq[Double],
      nprobe: Int, k: Int, rescore: Int = QuantRescoreR): DataFrame =
    singleServe(serve(s, dir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore))),
      filtered = false)

  /** [[annServeQuant]] against an explicit warehouse directory. */
  def annServeQuantFrom(s: SparkSession, whDir: String,
      queryVec: Seq[Double], nprobe: Int, k: Int,
      rescore: Int = QuantRescoreR): DataFrame =
    singleServe(serveFrom(s, whDir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore))),
      filtered = false)

  /** q157 — the quantized serve CERTIFIED against the exact paths,
    * all four legs read from STORED tables (the q142 serving-
    * certificate discipline; queries are the q106/q128 probe battery,
    * nprobe equal, query row excluded for comparability with q128):
    *
    *  - `n_probed`       probed candidates (the IVF pruning);
    *  - `n_overlap_q8`   |int8-ranked top-k ∩ exact FULL-scan top-k| —
    *                     what serving the codes alone would give;
    *  - `n_overlap_rescored` the same after full-precision rescore of
    *                     the top-[[QuantRescoreR]] prefilter window —
    *                     what [[annServeQuant]] actually serves;
    *  - `rescore_lossless`  the served list EQUALS the full-precision
    *                     probed top-k, order included — the rescore
    *                     window lost nothing vs a full-precision IVF
    *                     serve, so the composition's recall is ≥ the
    *                     q128 composed level BY CONSTRUCTION (an
    *                     exact-on-probed ranking dominates a
    *                     quantized-on-probed one).
    *
    * The oracle re-derives the index, the quantization, all probes
    * and all four leg rankings from raw embeddings in one statement. */
  def quantServeRecall(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (nprobe, k) = (AnnProbeN, AnnServeK)
    def stored(t: String) = graft.queries.Warehouse.stored(s, dir, t)
    val qs = stored("cells").filter(col("vec_id").between(40, 44))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"))
    val qs8 = stored("cells_q8").filter(col("vec_id").between(40, 44))
      .select(col("vec_id").as("query_id"), col("code").as("qcode"),
        col("qnorm").as("qqn"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val qc = stored("centroids").join(broadcast(qs))
      .withColumn("cos_c", cosine(col("v"), col("qv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id").as("qc_query"), col("c_id").as("probe_cell"))
    // Full-precision probed candidates (query row excluded).
    val cand = stored("cells")
      .join(broadcast(qc), col("cell") === col("probe_cell"))
      .join(broadcast(qs), col("qc_query") === col("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", when(col("norm") * col("qn") === 0.0, lit(-2.0))
        .otherwise(dot(col("v"), col("qv")) / (col("norm") * col("qn"))))
      .select("query_id", "vec_id", "cos")
    // Int8 prefilter over the same candidates, from the stored codes.
    val pre = stored("cells_q8")
      .join(broadcast(qc), col("cell") === col("probe_cell"))
      .join(broadcast(qs8), col("qc_query") === col("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", when(col("qnorm") * col("qqn") === 0.0, lit(-2.0))
        .otherwise(
          call_function("graft_i8_dot", col("code"), col("qcode"))
            .cast("double") / (col("qnorm") * col("qqn"))))
      .select("query_id", "vec_id", "cos")
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    def topIds(scored: DataFrame, limit: Int): DataFrame = scored
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= limit)
      .groupBy("query_id")
      .agg(transform(
        sort_array(collect_list(struct(col("rk"), col("vec_id")))),
        x => x.getField("vec_id")).as("ids"))
    // Exact FULL-scan reference (all stored vectors, query excluded).
    val exact = stored("cells").join(broadcast(qs),
        col("vec_id") =!= col("query_id"))
      .withColumn("cos", when(col("norm") * col("qn") === 0.0, lit(-2.0))
        .otherwise(dot(col("v"), col("qv")) / (col("norm") * col("qn"))))
      .select("query_id", "vec_id", "cos")
    val preRk = pre.withColumn("rk", row_number().over(wr))
    val served = cand.join(
        preRk.filter(col("rk") <= QuantRescoreR)
          .select(col("query_id").as("pq"), col("vec_id").as("pv")),
        col("query_id") === col("pq") && col("vec_id") === col("pv"),
        "left_semi")
    val nProbed = cand.groupBy("query_id")
      .agg(count(lit(1)).as("n_probed"))
    topIds(exact, k).select(col("query_id"), col("ids").as("exact_ids"))
      .join(topIds(pre, k).select(col("query_id"), col("ids").as("q8_ids")),
        Seq("query_id"))
      .join(topIds(served, k)
        .select(col("query_id"), col("ids").as("served_ids")), Seq("query_id"))
      .join(topIds(cand, k)
        .select(col("query_id"), col("ids").as("probed_ids")), Seq("query_id"))
      .join(nProbed, Seq("query_id"))
      .select(col("query_id"), col("n_probed"),
        size(array_intersect(col("q8_ids"), col("exact_ids"))).cast("long")
          .as("n_overlap_q8"),
        size(array_intersect(col("served_ids"), col("exact_ids"))).cast("long")
          .as("n_overlap_rescored"),
        (col("served_ids") === col("probed_ids")).as("rescore_lossless"))
      .orderBy("query_id")
  }

  /** Oracle mirror of the `graft_i8_pack` quantization over the `e`
    * CTE: `z8` is the max-abs int8 code as integer-valued doubles
    * (DuckDB `round` is half-away-from-zero — the kernel's
    * `roundHalfAway`, QuantIndexSpec-pinned on exact halves), `z8n`
    * adds the exact code norm. ONE rule text shared by the q157
    * recall certificate and the q162 batched quant serve, so the two
    * oracles can never drift on the code space. */
  private[queries] val i8QuantCteSql: String =
    """z8 AS (
      |  SELECT vec_id,
      |    list_transform(v, x ->
      |      CASE WHEN scale = 0 THEN 0.0 ELSE round(x * 127 / scale) END) AS q
      |  FROM (SELECT vec_id, v,
      |          list_max(list_transform(v, x -> abs(x))) AS scale
      |        FROM e)),
      |z8n AS (
      |  SELECT vec_id, q, sqrt(list_inner_product(q, q)) AS qn8 FROM z8)""".stripMargin

  val quantServeRecallSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |$i8QuantCteSql,
       |cqe AS (
       |  SELECT vec_id AS query_id, v AS qv, norm AS qn FROM sig
       |  WHERE vec_id BETWEEN 40 AND 44),
       |cq8 AS (
       |  SELECT vec_id AS query_id, q AS qq, qn8 AS qqn FROM z8n
       |  WHERE vec_id BETWEEN 40 AND 44),
       |qc AS (
       |  SELECT query_id, probe_cell FROM (
       |    SELECT cqe.query_id, c.c_id AS probe_cell,
       |      row_number() OVER (PARTITION BY cqe.query_id
       |        ORDER BY ${cosineSqlFor("c.qv", "cqe.qv")} DESC, c.c_id DESC) AS rn
       |    FROM c, cqe) WHERE rn <= $AnnProbeN),
       |cand AS (
       |  SELECT qc.query_id, sig.vec_id,
       |    CASE WHEN sig.norm * cqe.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, cqe.qv) / (sig.norm * cqe.qn)
       |      END AS cos
       |  FROM sig
       |  JOIN qc ON sig.cell = qc.probe_cell
       |  JOIN cqe ON cqe.query_id = qc.query_id
       |  WHERE sig.vec_id <> qc.query_id),
       |p8 AS (
       |  SELECT qc.query_id, sig.vec_id,
       |    CASE WHEN z8n.qn8 * cq8.qqn = 0 THEN -2.0
       |      ELSE list_inner_product(z8n.q, cq8.qq) / (z8n.qn8 * cq8.qqn)
       |      END AS cos
       |  FROM sig
       |  JOIN qc ON sig.cell = qc.probe_cell
       |  JOIN z8n ON z8n.vec_id = sig.vec_id
       |  JOIN cq8 ON cq8.query_id = qc.query_id
       |  WHERE sig.vec_id <> qc.query_id),
       |p8r AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM p8),
       |served0 AS (
       |  SELECT cand.query_id, cand.vec_id, cand.cos
       |  FROM cand JOIN p8r
       |    ON p8r.query_id = cand.query_id AND p8r.vec_id = cand.vec_id
       |  WHERE p8r.rk <= $QuantRescoreR),
       |ex AS (
       |  SELECT cqe.query_id, sig.vec_id,
       |    CASE WHEN sig.norm * cqe.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, cqe.qv) / (sig.norm * cqe.qn)
       |      END AS cos
       |  FROM sig, cqe WHERE sig.vec_id <> cqe.query_id),
       |le AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk FROM ex)
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |l8 AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM p8r
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |ls AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk FROM served0)
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |lp AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk FROM cand)
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |np AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_probed
       |  FROM cand GROUP BY query_id)
       |SELECT le.query_id, np.n_probed,
       |  CAST(len(list_intersect(l8.ids, le.ids)) AS BIGINT) AS n_overlap_q8,
       |  CAST(len(list_intersect(ls.ids, le.ids)) AS BIGINT) AS n_overlap_rescored,
       |  (ls.ids = lp.ids) AS rescore_lossless
       |FROM le
       |JOIN l8 ON l8.query_id = le.query_id
       |JOIN ls ON ls.query_id = le.query_id
       |JOIN lp ON lp.query_id = le.query_id
       |JOIN np ON np.query_id = le.query_id
       |ORDER BY le.query_id""".stripMargin

  // ---- q162: BATCHED quantized ANN serving (q155 × q157) -------------

  /** The q162 pinned battery: 60 distinct stored vectors replayed as
    * quantized-serve requests (req_id = source vec_id, keying the
    * oracle's request CTE), disjoint stride from the q155 battery so
    * the two batch certificates don't share a request population. */
  private[queries] val QuantBatchIds: Seq[Long] =
    (0 until 60).map(i => ((i * 11 + 3) % 480).toLong)
  private[queries] val QuantBatchNprobe = 2
  private[queries] val QuantBatchK = 8

  /** BATCHED quantized ANN serving — the production read path at
    * 100 TB: N requests answered in ONE job whose only corpus-scale
    * read is the 1-byte/dim `cells_q8` tier, composing the q155 batch
    * discipline with the q157 quantize-prefilter-rescore chain.
    * Per request the rows are IDENTICAL to the sequential
    * [[annServeQuant]] (BatchServeSpec pins it):
    *
    *  - requests broadcast as (req_id, qv, qn, qcode, qqn); the code
    *    is packed driver-side with the build kernel's EXACT
    *    arithmetic ([[graft.functions.I8Quant.pack]]) and the code
    *    norm is the exact-integer driver fold — one code space with
    *    the stored tier;
    *  - probe cells per request against the full-precision centroids
    *    (k·dim rows, window over the tiny request×centroid frame);
    *  - int8 prefilter: ONE pruned `cells_q8` read fanned out via a
    *    broadcast (req_id, probe_cell) join, per-request
    *    top-`rescore` through the house [[graft.functions.
    *    TopKAggregator]] (O(rescore) state, map-side partials; its
    *    (neg_cos, id) order IS the sequential path's
    *    qcos DESC, vec_id ASC tie rule);
    *  - exact rescore: the ≤ |requests|·rescore surviving ids
    *    broadcast back into the full-precision `cells` tier (the
    *    corpus side never shuffles), per-request top-k over the
    *    rescored frame.
    *
    * Tombstones ([[minusTomb]]) exclude at the prefilter — the only
    * gate candidates pass through, exactly the sequential serve's
    * exclusion point. Output one row per (req_id, rank ≤ k): req_id,
    * rank, vec_id, cell, cosine. */
  def annServeQuantBatch(s: SparkSession, dir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      rescore: Int = QuantRescoreR): DataFrame =
    serve(s, dir, requests,
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore)))

  /** [[annServeQuantBatch]] against an EXPLICIT warehouse directory —
    * the product form for callers owning their own index builds. */
  def annServeQuantBatchFrom(s: SparkSession, whDir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      rescore: Int = QuantRescoreR): DataFrame =
    serveFrom(s, whDir, requests,
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore)))

  /** q162 — the batched quantized serve certified per request against
    * a from-scratch DuckDB re-derivation of the index, BOTH tiers'
    * codes, all 60 probes, prefilters and rescores. */
  def quantServeBatchQ(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(s, dir)
      .filter(col("vec_id").isin(QuantBatchIds: _*))
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    annServeQuantBatch(s, dir, vecs.toSeq, QuantBatchNprobe, QuantBatchK)
  }

  val quantServeBatchSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |$i8QuantCteSql,
       |sig8 AS (
       |  SELECT z8n.vec_id, sig.cell, z8n.q, z8n.qn8
       |  FROM z8n JOIN sig ON sig.vec_id = z8n.vec_id),
       |bq AS (
       |  SELECT vec_id AS req_id, v AS quv,
       |    sqrt(list_inner_product(v, v)) AS qn
       |  FROM e WHERE vec_id IN (${QuantBatchIds.mkString(", ")})),
       |bq8 AS (
       |  SELECT vec_id AS req_id, q AS qq, qn8 AS qqn FROM z8n
       |  WHERE vec_id IN (${QuantBatchIds.mkString(", ")})),
       |bpc AS (
       |  SELECT req_id, probe_cell FROM (
       |    SELECT bq.req_id, c.c_id AS probe_cell,
       |      row_number() OVER (PARTITION BY bq.req_id
       |        ORDER BY ${cosineSqlFor("c.qv", "bq.quv")} DESC, c.c_id DESC) AS rn
       |    FROM c, bq) WHERE rn <= $QuantBatchNprobe),
       |bpre AS (
       |  SELECT req_id, vec_id FROM (
       |    SELECT bpc.req_id, sig8.vec_id,
       |      row_number() OVER (PARTITION BY bpc.req_id
       |        ORDER BY CASE WHEN sig8.qn8 * bq8.qqn = 0 THEN -2.0
       |          ELSE list_inner_product(sig8.q, bq8.qq) / (sig8.qn8 * bq8.qqn)
       |          END DESC, sig8.vec_id ASC) AS rn
       |    FROM sig8
       |    JOIN bpc ON sig8.cell = bpc.probe_cell
       |    JOIN bq8 ON bq8.req_id = bpc.req_id) WHERE rn <= $QuantRescoreR),
       |bres AS (
       |  SELECT bpre.req_id, sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * bq.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, bq.quv) / (sig.norm * bq.qn)
       |      END AS cos
       |  FROM bpre
       |  JOIN sig ON sig.vec_id = bpre.vec_id
       |  JOIN bq ON bq.req_id = bpre.req_id)
       |SELECT req_id, rank, vec_id, cell, round(cos, 6) AS cosine FROM (
       |  SELECT req_id,
       |    row_number() OVER (PARTITION BY req_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank,
       |    vec_id, cell, cos
       |  FROM bres)
       |WHERE rank <= $QuantBatchK
       |ORDER BY req_id, rank""".stripMargin

  // ---- UNIFIED dense-serve kernel (r16 verdict #1) -------------------

  /** Options of the ONE dense-serve pipeline: every cell of the
    * param/batch × full/quant × filtered/unfiltered matrix is this
    * kernel under a different option vector — probe → candidate
    * source (`cells` | `cells_q8`) → tombstone gate → metadata
    * filter → (exact rescore when quantized) → per-request top-k.
    * The hand-written variant methods ([[annServe]],
    * [[annServeBatch]], [[annServeQuant]], [[annServeQuantBatch]],
    * [[annServeFiltered]] and the round-17 filled cells) are thin
    * wrappers, so a new axis composes instead of doubling the
    * hand-written surface.
    *
    *  - `quantized = true` ranks the probed candidates by
    *    exact-integer int8 cosine over the 1-byte/dim `cells_q8`
    *    tier (the only corpus-scale read), keeps the top `rescore`
    *    per request and re-scores those O(k) rows exactly from the
    *    full-precision tier;
    *  - `sources = Some(allow)` restricts candidates to vectors
    *    whose document carries an allowed source (stored `doc_stats`
    *    table; embeddings and documents share the id space). The
    *    gate applies BEFORE top-k/rescore selection — the rescore
    *    window fills with allowed candidates, the production-correct
    *    composition — and never touches scores (filtered ≡
    *    post-filtered at full depth, FilteredServeSpec). The filter
    *    side is index-sized and deliberately NOT broadcast: at
    *    100 TB an allowed set can be half the index. */
  final case class AnnServeOpts(
      nprobe: Int,
      k: Int,
      quantized: Boolean = false,
      rescore: Option[Int] = None,
      sources: Option[Seq[String]] = None,
      pq: Boolean = false) {
    /** The exact-rescore depth RESOLVED PER TIER (ADVICE r17): an
      * unset `rescore` means the serving default of whichever code
      * tier is active — [[PqRescoreR]] (120) for the 8-byte PQ codes,
      * [[QuantRescoreR]] (40) for int8 — so constructing
      * `AnnServeOpts(nprobe, k, pq = true)` directly serves with the
      * PQ tier's documented recovery window instead of silently
      * inheriting the int8 tier's shallower one. Irrelevant (and
      * unused) on the full-precision path. */
    def rescoreDepth: Int =
      rescore.getOrElse(if (pq) PqRescoreR else QuantRescoreR)
  }

  /** Retained for the cross-path spec pin: any request population of
    * at least 2 takes the broadcast-frame probe; exactly 1 takes the
    * literal single-request fast path (see the branch comment in
    * [[annServeUnified]]). */
  private[queries] val ProbeLiteralMaxRequests = 1

  /** The unified serve over the memoized fixture store. Output one
    * row per (req_id, rank ≤ k): req_id, rank, vec_id, cell,
    * [source,] cosine — per request identical to every legacy
    * variant (UnifiedServeSpec pins each wrapper). */
  def serve(s: SparkSession, dir: String,
      requests: Seq[(Long, Seq[Double])], opts: AnnServeOpts): DataFrame =
    annServeUnified(s, graft.queries.Warehouse.stored(s, dir, _),
      requests, opts, fixtureTomb(s, dir))

  /** [[serve]] against an EXPLICIT warehouse directory — the product
    * form for callers owning their own `Warehouse.build` output. */
  def serveFrom(s: SparkSession, whDir: String,
      requests: Seq[(Long, Seq[Double])], opts: AnnServeOpts): DataFrame =
    annServeUnified(s, graft.queries.Warehouse.read(s, whDir, _),
      requests, opts, graft.queries.Warehouse.vecTombstones(s, whDir))

  /** The ONE dense-serve implementation (see [[AnnServeOpts]]).
    * Stage contracts, each the certified form of the variant that
    * pioneered it:
    *
    *  - requests broadcast as (req_id, qv, qn[, qcode, qqn]); norms
    *    and codes fold on the driver with the build kernel's exact
    *    arithmetic ([[graft.functions.I8Quant]] statics, the
    *    sequential Σx² fold), so every form shares one score/code
    *    space bit for bit;
    *  - probe cells per request against the full-precision
    *    centroids (k·dim rows; window at cos DESC, c_id DESC — the
    *    q142 tie rule);
    *  - ONE pruned candidate read fanned out via a broadcast
    *    (req_id, probe_cell) join — a cell probed by many requests
    *    is read once, the corpus side never shuffles;
    *  - tombstones ([[minusTomb]]) exclude at the candidate read,
    *    the only gate rows pass through (q158 discipline);
    *  - the metadata gate semi-joins the pruned candidates against
    *    the allowed id set AFTER cell pruning (both sides index
    *    tables; the filter side deliberately not broadcast);
    *  - selection is the house [[graft.functions.TopKAggregator]]
    *    (O(k) state, map-side partials; (neg_cos, id) order IS the
    *    cos DESC, vec_id ASC tie rule), quantized selection keeps
    *    `rescore` candidates and re-scores them exactly from the
    *    full-precision tier (≤ |requests|·rescore broadcast ids —
    *    the corpus side never shuffles);
    *  - `source` re-attaches to the ≤ |requests|·k served rows by a
    *    join against the same allowed frame (doc_stats is unique
    *    per doc_id, so the join is 1:1). */
  private def annServeUnified(s: SparkSession, table: String => DataFrame,
      requests: Seq[(Long, Seq[Double])], opts: AnnServeOpts,
      tomb: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val AnnServeOpts(nprobe, k, quantized, _, sources, pq) = opts
    val rescore = opts.rescoreDepth
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    require(k > 0, s"k must be positive, got $k")
    require(!(quantized && pq),
      "quantized (int8) and pq are alternative prefilter tiers — pick one")
    if (quantized || pq)
      require(rescore >= k, s"rescore depth $rescore must be >= k = $k")
    require(requests.nonEmpty, "serve needs at least one request")
    require(requests.map(_._1).distinct.size == requests.size,
      "request ids must be unique")
    requests.foreach { case (rid, v) =>
      require(v.nonEmpty, s"request $rid needs a query vector") }
    sources.foreach(ss => require(ss.nonEmpty,
      "serve needs at least one allowed source — an empty filter " +
        "serves nothing by definition; drop the filter for unfiltered"))
    val books = if (pq) collectPqBooks(table("pq_books")) else Array.empty[(Int, Long, Seq[Double])]
    val pqm = if (pq) books.map(_._1).distinct.length else 0
    if (pq) {
      // Per-subspace layout validation (ADVICE r17): the flattened
      // index `sub * ksub + c` misindexes bookVecs silently on a
      // skewed table (sub 0 with 3 entries, sub 1 with 1) or
      // non-contiguous c_ids, so mirror the pqSeedBooks build-time
      // contract here — a corrupt or hand-edited store must refuse
      // instead of mis-scoring every ADC table.
      require(books.nonEmpty && books.length % pqm == 0,
        s"pq serve needs a well-formed pq_books table (got ${books.length} entries)")
      val perSub = books.length / pqm
      books.groupBy(_._1).foreach { case (sub, entries) =>
        val ids = entries.map(_._2).sorted.toSeq
        require(ids == (0L until perSub.toLong),
          s"pq_books subspace $sub must carry exactly $perSub entries " +
            s"with contiguous c_ids 0..${perSub - 1}; got $ids")
      }
    }
    val bookVecs = books.map(_._3.toArray)
    val ksub = if (pq) books.length / pqm else 0
    val reqRows = requests.map { case (rid, v) =>
      val code =
        if (quantized) graft.functions.I8Quant.pack(v.toArray)
        else Array.empty[Byte]
      (rid, v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)), code,
        if (quantized)
          math.sqrt(graft.functions.I8Quant.dot(code, code).toDouble)
        else 0.0,
        if (pq) graft.functions.PqOps.lut(bookVecs, ksub, v.toArray).toSeq
        else Seq.empty[Double])
    }
    // Lazy: the single-request fast path never materializes the
    // request frame or the broadcast-frame probe — encoder derivation
    // and the probe plan's analysis are a measurable slice of a
    // sub-second serve's wall.
    lazy val reqDf = reqRows.toDF("req_id", "qv", "qn", "qcode", "qqn", "lut")
    lazy val wpc = Window.partitionBy(col("req_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    lazy val probes = table("centroids").join(broadcast(reqDf))
      .withColumn("cos_c", cosine(col("v"), col("qv")))
      .withColumn("rn", row_number().over(wpc))
      .filter(col("rn") <= nprobe)
      .select(col("req_id"), col("qv"), col("qn"), col("qcode"),
        col("qqn"), col("lut"), col("c_id").as("probe_cell"))
    val allowed = sources.map(ss => table("doc_stats")
      .filter(col("source").isin(ss: _*))
      .select(col("doc_id").as("vec_id"), col("source")))
    def gate(cand: DataFrame): DataFrame =
      allowed.fold(cand)(a =>
        cand.join(a.select("vec_id"), Seq("vec_id"), "left_semi"))
    // SINGLE-REQUEST fast path (r17 verdict #2): the interactive /
    // param-battery case pays the request-frame machinery (broadcast
    // request join, per-request window or top-k aggregation,
    // posexplode) in full for one request. With exactly one request
    // every per-request structure collapses: the query vector, code
    // and ADC table inline as plan LITERALS (no request frame), the
    // probe is centroids × literal → TakeOrderedAndProject (nprobe
    // rows, broadcast in-plan — zero extra driver actions), and every
    // selection is orderBy+limit (TakeOrderedAndProject) instead of
    // an aggregation. Arithmetic and tie rules are IDENTICAL to the
    // batch form (same cosine/dot/i8/ADC kernels, cos DESC / vec_id
    // ASC, probe ties cos_c DESC / c_id DESC), so the output is
    // provably the batch-of-one slice — UnifiedServeSpec and the
    // batch≡sequential pins exercise both paths against each other.
    val ranked =
      if (requests.size == 1) {
        val (rid, qv0, qn0, qcode0, qqn0, lut0) = reqRows.head
        val qvL = typedLit(qv0)
        val qcells = table("centroids")
          .withColumn("cos_c", cosine(col("v"), qvL))
          .orderBy(col("cos_c").desc, col("c_id").desc)
          .limit(nprobe)
          .select(col("c_id").as("probe_cell"))
        def cand(t: String): DataFrame =
          gate(minusTomb(table(t), tomb)
            .join(broadcast(qcells), col("cell") === col("probe_cell")))
        val wr1 = Window.orderBy(col("cos").desc, col("vec_id").asc)
        def finish(scored: DataFrame): DataFrame = scored
          .orderBy(col("cos").desc, col("vec_id").asc)
          .limit(k)
          .withColumn("rank", row_number().over(wr1).cast("long"))
          .select(lit(rid).as("req_id"), col("rank"), col("vec_id"),
            col("cell"), round(col("cos"), 6).as("cosine"))
        if (!quantized && !pq) {
          val denom = col("norm") * lit(qn0)
          finish(cand("cells")
            .withColumn("cos", when(denom === 0.0, lit(-2.0))
              .otherwise(dot(col("v"), qvL) / denom)))
        } else {
          val preScored =
            if (pq) {
              val pdenom = col("norm") * lit(qn0)
              cand("cells_pq")
                .withColumn("qcos", when(pdenom === 0.0, lit(-2.0))
                  .otherwise(call_function("graft_pq_adc", col("code"),
                    typedLit(lut0)) / pdenom))
            } else {
              val qdenom = col("qnorm") * lit(qqn0)
              cand("cells_q8")
                .withColumn("qcos", when(qdenom === 0.0, lit(-2.0))
                  .otherwise(call_function("graft_i8_dot", col("code"),
                    lit(qcode0)).cast("double") / qdenom))
            }
          val pre = preScored
            .orderBy(col("qcos").desc, col("vec_id").asc)
            .limit(rescore)
            .select(col("vec_id").as("p_vec"))
          val denom = col("norm") * lit(qn0)
          finish(table("cells")
            .join(broadcast(pre), col("vec_id") === col("p_vec"))
            .withColumn("cos", when(denom === 0.0, lit(-2.0))
              .otherwise(dot(col("v"), qvL) / denom)))
        }
      } else if (!quantized && !pq) {
        val denom = col("norm") * col("qn")
        val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
        gate(minusTomb(table("cells"), tomb)
            .join(broadcast(probes), col("cell") === col("probe_cell")))
          .withColumn("cos", when(denom === 0.0, lit(-2.0))
            .otherwise(dot(col("v"), col("qv")) / denom))
          .groupBy(col("req_id"))
          .agg(topk(-col("cos"), col("vec_id"),
            col("cell").cast("double")).as("top"))
          .select(col("req_id"), posexplode(col("top.cands")).as(Seq("pos", "x")))
          .select(col("req_id"), (col("pos") + 1).cast("long").as("rank"),
            col("x.id").as("vec_id"), col("x.c").cast("long").as("cell"),
            round(-col("x.neg_cos"), 6).as("cosine"))
      } else {
        val topr =
          udaf(new TopKAggregator(rescore), Encoders.product[ScoredCand])
        // Prefilter tier: int8 codes scored by the exact-integer dot,
        // or PQ codes scored by the per-request ADC table — one
        // candidate read either way, the only difference is which
        // code column the pruned scan decodes.
        val preScored =
          if (pq) {
            val pdenom = col("norm") * col("qn")
            gate(minusTomb(table("cells_pq"), tomb)
                .join(broadcast(probes), col("cell") === col("probe_cell")))
              .withColumn("qcos", when(pdenom === 0.0, lit(-2.0))
                .otherwise(
                  call_function("graft_pq_adc", col("code"), col("lut"))
                    / pdenom))
          } else {
            val qdenom = col("qnorm") * col("qqn")
            gate(minusTomb(table("cells_q8"), tomb)
                .join(broadcast(probes), col("cell") === col("probe_cell")))
              .withColumn("qcos", when(qdenom === 0.0, lit(-2.0))
                .otherwise(
                  call_function("graft_i8_dot", col("code"), col("qcode"))
                    .cast("double") / qdenom))
          }
        val pre = preScored
          .groupBy(col("req_id"))
          .agg(topr(-col("qcos"), col("vec_id"), lit(0.0)).as("top"))
          .select(col("req_id").as("p_req"), explode(col("top.cands")).as("x"))
          .select(col("p_req"), col("x.id").as("p_vec"))
          .join(reqDf.select(col("req_id").as("r_req"), col("qv"), col("qn")),
            col("p_req") === col("r_req"))
          .select(col("p_req"), col("p_vec"), col("qv"), col("qn"))
        val denom = col("norm") * col("qn")
        val wr = Window.partitionBy(col("p_req"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        table("cells")
          .join(broadcast(pre), col("vec_id") === col("p_vec"))
          .withColumn("cos", when(denom === 0.0, lit(-2.0))
            .otherwise(dot(col("v"), col("qv")) / denom))
          .withColumn("rank", row_number().over(wr).cast("long"))
          .filter(col("rank") <= k)
          .select(col("p_req").as("req_id"), col("rank"), col("vec_id"),
            col("cell"), round(col("cos"), 6).as("cosine"))
      }
    val attached = allowed.fold(ranked)(a => ranked.join(a, Seq("vec_id"))
      .select(col("req_id"), col("rank"), col("vec_id"), col("cell"),
        col("source"), col("cosine")))
    // Output ordering: a global orderBy range-partitions, and the
    // range partitioner SAMPLES its input — one extra job that costs
    // a single-request serve ~30% wall on a k-row frame. The
    // unfiltered single-request path is ONE partition by construction
    // (TakeOrderedAndProject → single-partition window), so
    // sortWithinPartitions is already a TOTAL order there with zero
    // extra jobs; every other form keeps the global sort. (The
    // filtered single re-attaches `source` through a non-broadcast
    // join and so may be multi-partition — it stays on orderBy.)
    if (requests.size == 1 && sources.isEmpty)
      attached.sortWithinPartitions("req_id", "rank")
    else attached.orderBy("req_id", "rank")
  }

  /** Projection of a SINGLE-request unified serve to the sequential
    * output shape: rank order IS (cos DESC, vec_id ASC), so dropping
    * (req_id, rank) reproduces the legacy param forms exactly. */
  private def singleServe(df: DataFrame, filtered: Boolean): DataFrame =
    if (filtered)
      df.select(col("vec_id"), col("cell"), col("source"), col("cosine"))
    else df.select(col("vec_id"), col("cell"), col("cosine"))

  // ---- q158: vector-grain deletes SERVED (r15 verdict #6) ------------

  /** The q158 pinned delete wave: every vec_id ≡ [[VecDeleteRem]]
    * (mod [[VecDeleteMod]]) — includes a centroid seed (vec 4), so
    * the certificate also pins that deletes do NOT refit centroids
    * (build artifacts; [[refreshRecallLift]]'s refresh is the refit
    * path). The q150 request vector (123 ≡ 6 mod 9) survives the
    * wave. */
  private[queries] val VecDeleteMod = 9L
  private[queries] val VecDeleteRem = 4L

  private val vecPurgedWh =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized VECTOR-PURGED fixture store: full warehouse build,
    * then one [[graft.queries.Warehouse.deleteVectors]] wave — the
    * dense-family analogue of `RetrievalIndex.ensurePurged`. */
  private[queries] def ensureVecPurged(s: SparkSession,
      dir: String): String =
    vecPurgedWh.computeIfAbsent(dir, _ => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-vecpurged-wh").toString
      graft.queries.Warehouse.build(s, dir, wh)
      graft.queries.Warehouse.deleteVectors(s, wh,
        Tables.embeddings(s, dir)
          .filter(pmod(col("vec_id"), lit(VecDeleteMod)) === lit(VecDeleteRem))
          .select("vec_id"))
      wh
    })

  /** q158 — caller-driven vector deletes REACHING the serve path: the
    * q150 parameterized request answered from a store whose delete
    * wave is only a broadcast tombstone list (cells hard-linked
    * forward untouched, O(deletes) write). The served ranking must
    * equal a from-scratch probe over the remaining vectors — with the
    * centroids still the BUILD's (deletes don't refit) — which the
    * oracle re-derives from raw embeddings by filtering the delete
    * rule out of the candidate set only. The registered plan carries
    * the broadcast anti-join (PlanShapeSpec pins it) and zero corpus
    * scans on the candidate side. */
  def vecDeleteServe(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    annServeFrom(s, ensureVecPurged(s, dir), qv, ParamNprobe, ParamAnnK)
  }

  val vecDeleteServeSql: String =
    s"""WITH $cellAssignCteSql,
       |sig0 AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |sig AS (SELECT * FROM sig0
       |        WHERE vec_id % $VecDeleteMod <> $VecDeleteRem),
       |${annRequestProbeTailCteSql(ParamQueryVecId, ParamNprobe)}
       |SELECT vec_id, cell, round(cos, 6) AS cosine
       |FROM aqcand
       |ORDER BY cos DESC, vec_id ASC
       |LIMIT $ParamAnnK""".stripMargin

  // ---- q163/q164: hot-cell SPLIT — IVF list balancing -----------------

  /** The q163/q164 pinned split bound — tight enough that the
    * well-balanced fixture index (max cell ≈ 1.12–1.17× uniform)
    * still exercises real splits at every SF (two hot cells at
    * sf0.01 and sf0.1); production calls default to
    * [[graft.queries.Warehouse.DefaultHotCellRatio]]. */
  private[queries] val SplitRatio = 1.06

  private val splitWh =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized SPLIT fixture store: full warehouse build, then one
    * [[graft.queries.Warehouse.splitHotCells]] wave at
    * [[SplitRatio]] — shared by q163 (balance) and q164 (serve). */
  private[queries] def ensureSplit(s: SparkSession, dir: String): String =
    splitWh.computeIfAbsent(dir, _ => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-split-wh").toString
      graft.queries.Warehouse.build(s, dir, wh)
      val v = graft.queries.Warehouse.splitHotCells(s, wh, SplitRatio)
      require(v.nonEmpty,
        s"split fixture: no hot cells at ratio $SplitRatio over $dir")
      wh
    })

  /** q163 — the split BALANCE certificate: per-cell member counts of
    * the stored dense index BEFORE (the build snapshot, a time-travel
    * read) and AFTER the hot-cell split, one row per (stage, cell).
    * The oracle re-derives the build assignment, the hot rule
    * (n > ratio·total/k), the min/max-vec_id seed pick, the two-seed
    * reassignment and the final membership from raw embeddings — so a
    * committed split that moved one wrong member hash-mismatches.
    * The balance CLAIM (max fraction strictly drops, sub-cells
    * partition their parent) is asserted in CellSplitSpec. */
  def cellSplitBalance(s: SparkSession, dir: String): DataFrame = {
    val wh = ensureSplit(s, dir)
    val ver = graft.queries.Warehouse.version(wh)
    val before = graft.queries.Warehouse.readAt(s, wh, "cells", ver - 1)
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
      .withColumn("stage", lit("before"))
    val after = graft.queries.Warehouse.read(s, wh, "cells")
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
      .withColumn("stage", lit("after"))
    before.unionByName(after).select("stage", "cell", "n_members")
      .orderBy("stage", "cell")
  }

  /** Oracle rule text of the split chain (expects the
    * [[cellAssignCteSql]] chain in scope): `cnt` per-cell counts,
    * `hot` the ratio rule, `hotmap` the deterministic new-id
    * assignment (max c_id + rank of hot cell), `sv` the min/max
    * vec_id seed vectors, `re` the two-seed reassignment (ties to the
    * NEW id — the larger, the house c_id DESC rule), `a2` the final
    * membership (vec_id, v, cell). Shared by q163 and q164. */
  private[queries] val splitChainCteSql: String =
    s"""t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM a WHERE rn = 1),
       |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM c),
       |cnt AS (
       |  SELECT cell, CAST(count(*) AS BIGINT) AS n
       |  FROM a WHERE rn = 1 GROUP BY cell),
       |hot AS (
       |  SELECT cell FROM cnt, t, kk WHERE n > $SplitRatio * total / k),
       |maxc AS (SELECT max(c_id) AS mc FROM c),
       |hotmap AS (
       |  SELECT cell, mc + (row_number() OVER (ORDER BY cell)) AS new_id
       |  FROM hot, maxc),
       |seeds AS (
       |  SELECT a.cell, min(a.vec_id) AS a_id, max(a.vec_id) AS b_id
       |  FROM a JOIN hot ON a.cell = hot.cell
       |  WHERE a.rn = 1 GROUP BY a.cell),
       |sv AS (
       |  SELECT seeds.cell, ea.v AS av, eb.v AS bv, hotmap.new_id
       |  FROM seeds
       |  JOIN hotmap ON hotmap.cell = seeds.cell
       |  JOIN e ea ON ea.vec_id = seeds.a_id
       |  JOIN e eb ON eb.vec_id = seeds.b_id),
       |re AS (
       |  SELECT m.vec_id, m.v,
       |    CASE WHEN ${cosineSqlFor("m.v", "sv.bv")} >=
       |              ${cosineSqlFor("m.v", "sv.av")}
       |      THEN sv.new_id ELSE m.cell END AS cell
       |  FROM (SELECT vec_id, v, cell FROM a WHERE rn = 1) m
       |  JOIN sv ON sv.cell = m.cell),
       |a2 AS (
       |  SELECT vec_id, v, cell FROM re
       |  UNION ALL
       |  SELECT vec_id, v, cell FROM a
       |  WHERE rn = 1 AND cell NOT IN (SELECT cell FROM hot))""".stripMargin

  val cellSplitBalanceSql: String =
    s"""WITH $cellAssignCteSql,
       |$splitChainCteSql
       |SELECT stage, cell, n_members FROM (
       |  SELECT 'before' AS stage, cell,
       |    CAST(count(*) AS BIGINT) AS n_members
       |  FROM a WHERE rn = 1 GROUP BY cell
       |  UNION ALL
       |  SELECT 'after' AS stage, cell,
       |    CAST(count(*) AS BIGINT) AS n_members
       |  FROM a2 GROUP BY cell)
       |ORDER BY stage, cell""".stripMargin

  /** q164 — serving FROM the split store: the q150-style
    * parameterized request answered over the split index must equal a
    * from-raw re-derivation of the ENTIRE split — build assignment,
    * hot rule, seed reassignment, micro-unit sub-centroid means (the
    * q72 arithmetic, so untouched cells keep their stored centroids
    * bit for bit), probe over the union centroid set, pruned exact
    * rerank. One certificate covering membership AND the refitted
    * centroids at the serve site. */
  def splitServe(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    annServeFrom(s, ensureSplit(s, dir), qv, ParamNprobe, ParamAnnK)
  }

  val splitServeSql: String =
    s"""WITH $cellAssignCteSql,
       |$splitChainCteSql,
       |x2 AS (
       |  SELECT cell, CAST(i - 1 AS INTEGER) AS pos, v[i] AS x
       |  FROM re, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) r),
       |m2 AS (
       |  SELECT cell, pos,
       |    CAST(floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) + 0.5) AS BIGINT) AS mean_micro
       |  FROM x2 GROUP BY cell, pos),
       |c2 AS (
       |  SELECT c_id, qv FROM c WHERE c_id NOT IN (SELECT cell FROM hot)
       |  UNION ALL
       |  SELECT cell AS c_id, list(mean_micro / 1e6 ORDER BY pos) AS qv
       |  FROM m2 GROUP BY cell),
       |sig2 AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a2),
       |aqp AS (SELECT v AS quv, sqrt(list_inner_product(v, v)) AS qn
       |        FROM e WHERE vec_id = $ParamQueryVecId),
       |aqc AS (
       |  SELECT c_id AS probe_cell FROM c2, aqp
       |  ORDER BY ${cosineSqlFor("c2.qv", "aqp.quv")} DESC, c_id DESC
       |  LIMIT $ParamNprobe),
       |aqcand AS (
       |  SELECT sig2.vec_id, sig2.cell,
       |    CASE WHEN sig2.norm * aqp.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig2.v, aqp.quv) / (sig2.norm * aqp.qn)
       |      END AS cos
       |  FROM sig2 JOIN aqc ON sig2.cell = aqc.probe_cell, aqp)
       |SELECT vec_id, cell, round(cos, 6) AS cosine
       |FROM aqcand
       |ORDER BY cos DESC, vec_id ASC
       |LIMIT $ParamAnnK""".stripMargin

  // ---- q165/q166: cold-cell MERGE — the split's dual -------------------

  /** The q165/q166 pinned merge bound — wide enough that the
    * well-balanced fixture index (min cell ≈ 0.77–0.88× uniform)
    * still exercises real merges at every SF (two cold cells at
    * sf0.01 and sf0.1); production calls default to
    * [[graft.queries.Warehouse.DefaultColdCellRatio]]. */
  private[queries] val ColdRatio = 0.9

  private val mergeWh =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized MERGED fixture store: full warehouse build, then one
    * [[graft.queries.Warehouse.mergeColdCells]] wave at
    * [[ColdRatio]] — shared by q165 (balance) and q166 (serve). */
  private[queries] def ensureMerged(s: SparkSession, dir: String): String =
    mergeWh.computeIfAbsent(dir, _ => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-merge-wh").toString
      graft.queries.Warehouse.build(s, dir, wh)
      val v = graft.queries.Warehouse.mergeColdCells(s, wh, ColdRatio)
      require(v.nonEmpty,
        s"merge fixture: no cold cells at ratio $ColdRatio over $dir")
      wh
    })

  /** Oracle rule text of the merge chain (expects the
    * [[cellAssignCteSql]] chain in scope): `cnt` per-cell counts,
    * `cold` the ratio rule over EVERY stored centroid (a memberless
    * centroid counts 0), `surv` the survivors, `rs` the cold members'
    * argmax re-home over the survivors only (the house cos DESC,
    * c_id DESC rule — a member whose winner survives cannot move),
    * `a2` the final membership. Shared by q165 and q166. */
  private[queries] val coldChainCteSql: String =
    s"""t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM a WHERE rn = 1),
       |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM c),
       |cnt AS (
       |  SELECT cell, CAST(count(*) AS BIGINT) AS n
       |  FROM a WHERE rn = 1 GROUP BY cell),
       |cold AS (
       |  SELECT c.c_id AS cell FROM c
       |  LEFT JOIN cnt ON cnt.cell = c.c_id, t, kk
       |  WHERE coalesce(cnt.n, 0) < $ColdRatio * total / k),
       |surv AS (
       |  SELECT c_id, qv FROM c
       |  WHERE c_id NOT IN (SELECT cell FROM cold)),
       |rs AS (
       |  SELECT vec_id, v, c_id AS cell FROM (
       |    SELECT m.vec_id, m.v, surv.c_id,
       |      row_number() OVER (PARTITION BY m.vec_id
       |        ORDER BY ${cosineSqlFor("m.v", "surv.qv")} DESC,
       |                 surv.c_id DESC) AS rn2
       |    FROM (SELECT vec_id, v, cell FROM a WHERE rn = 1) m
       |    JOIN cold ON m.cell = cold.cell, surv)
       |  WHERE rn2 = 1),
       |a2 AS (
       |  SELECT vec_id, v, cell FROM rs
       |  UNION ALL
       |  SELECT vec_id, v, cell FROM a
       |  WHERE rn = 1 AND cell NOT IN (SELECT cell FROM cold))""".stripMargin

  /** q165 — the merge BALANCE certificate: per-cell member counts of
    * the stored dense index before and after the cold-cell merge, one
    * row per (stage, cell). The oracle re-derives the cold rule and
    * the argmax re-home from raw embeddings; the balance claims (cold
    * cells vanish, survivors only absorb, centroids bit-identical)
    * are asserted in CellSplitSpec. */
  def coldMergeBalance(s: SparkSession, dir: String): DataFrame = {
    val wh = ensureMerged(s, dir)
    val ver = graft.queries.Warehouse.version(wh)
    val before = graft.queries.Warehouse.readAt(s, wh, "cells", ver - 1)
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
      .withColumn("stage", lit("before"))
    val after = graft.queries.Warehouse.read(s, wh, "cells")
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
      .withColumn("stage", lit("after"))
    before.unionByName(after).select("stage", "cell", "n_members")
      .orderBy("stage", "cell")
  }

  val coldMergeBalanceSql: String =
    s"""WITH $cellAssignCteSql,
       |$coldChainCteSql
       |SELECT stage, cell, n_members FROM (
       |  SELECT 'before' AS stage, cell,
       |    CAST(count(*) AS BIGINT) AS n_members
       |  FROM a WHERE rn = 1 GROUP BY cell
       |  UNION ALL
       |  SELECT 'after' AS stage, cell,
       |    CAST(count(*) AS BIGINT) AS n_members
       |  FROM a2 GROUP BY cell)
       |ORDER BY stage, cell""".stripMargin

  /** q166 — serving FROM the merged store: the q150-style
    * parameterized request over the merged index must equal a
    * from-raw re-derivation of the merge (cold rule, argmax re-home,
    * survivor centroids bit-identical) probed and reranked — the
    * serve-site proof that absorbing cold members changed candidate
    * ROUTING but no score. */
  def mergeServe(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    annServeFrom(s, ensureMerged(s, dir), qv, ParamNprobe, ParamAnnK)
  }

  val mergeServeSql: String =
    s"""WITH $cellAssignCteSql,
       |$coldChainCteSql,
       |sig2 AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a2),
       |aqp AS (SELECT v AS quv, sqrt(list_inner_product(v, v)) AS qn
       |        FROM e WHERE vec_id = $ParamQueryVecId),
       |aqc AS (
       |  SELECT c_id AS probe_cell FROM surv, aqp
       |  ORDER BY ${cosineSqlFor("surv.qv", "aqp.quv")} DESC, c_id DESC
       |  LIMIT $ParamNprobe),
       |aqcand AS (
       |  SELECT sig2.vec_id, sig2.cell,
       |    CASE WHEN sig2.norm * aqp.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig2.v, aqp.quv) / (sig2.norm * aqp.qn)
       |      END AS cos
       |  FROM sig2 JOIN aqc ON sig2.cell = aqc.probe_cell, aqp)
       |SELECT vec_id, cell, round(cos, 6) AS cosine
       |FROM aqcand
       |ORDER BY cos DESC, vec_id ASC
       |LIMIT $ParamAnnK""".stripMargin

  // ---- q167: FILTERED ANN serving (metadata pre-filter) ---------------

  /** The q167 pinned filter battery: three sources ≈ 15% of the
    * corpus (the fixture's 20 sources are uniform). */
  private[graft] val FilterSources = Seq("src3", "src7", "src11")

  /** FILTERED ANN serving — the top-k restricted to vectors whose
    * document carries an allowed source: the "filtered vector
    * search" every retrieval product ends up needing (serve only
    * license-clean sources, only one tenant, only post-cutoff
    * crawls). Pre-filter composition: the IVF probe prunes cells as
    * usual, and the pruned candidates semi-join the ALLOWED id set
    * derived from the stored `doc_stats` table (embeddings and
    * documents share the id space, the q137 self-retrieval fixture
    * contract) — both sides are INDEX tables, so the plan touches no
    * corpus file and the join is index-sized at any corpus scale
    * (the filter side is NOT broadcast: at 100 TB an allowed set can
    * be half the index; Spark picks the hash join). Scores are
    * untouched by the filter — filtering before or after scoring is
    * the same set, which is how the oracle states it. A probe that
    * leaves fewer than k allowed candidates returns what it has
    * (raise nprobe for selective filters — documented, mirrored by
    * the oracle at equal nprobe). */
  def annServeFiltered(s: SparkSession, dir: String,
      queryVec: Seq[Double], nprobe: Int, k: Int,
      sources: Seq[String]): DataFrame =
    singleServe(serve(s, dir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, sources = Some(sources))), filtered = true)

  /** [[annServeFiltered]] against an EXPLICIT warehouse directory. */
  def annServeFilteredFrom(s: SparkSession, whDir: String,
      queryVec: Seq[Double], nprobe: Int, k: Int,
      sources: Seq[String]): DataFrame =
    singleServe(serveFrom(s, whDir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, sources = Some(sources))), filtered = true)

  // ---- q170–q172: the FILLED serve-matrix cells (r16 verdict #1) -----

  /** FILTERED × BATCH serving — a whole request population answered
    * in one job, each request's top-k restricted to allowed sources
    * (the q155 batch discipline × the q167 filter contract). */
  def annServeFilteredBatch(s: SparkSession, dir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      sources: Seq[String]): DataFrame =
    serve(s, dir, requests,
      AnnServeOpts(nprobe, k, sources = Some(sources)))

  /** [[annServeFilteredBatch]] against an explicit warehouse. */
  def annServeFilteredBatchFrom(s: SparkSession, whDir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      sources: Seq[String]): DataFrame =
    serveFrom(s, whDir, requests,
      AnnServeOpts(nprobe, k, sources = Some(sources)))

  /** FILTERED × QUANTIZED serving — THE production configuration
    * (license-filtered tenant queries over the int8 tier): the
    * filter gates the `cells_q8` candidates BEFORE the prefilter
    * window, so the rescore depth fills with allowed candidates and
    * the serve is the quantized serve of the allowed sub-index. */
  def annServeQuantFiltered(s: SparkSession, dir: String,
      queryVec: Seq[Double], nprobe: Int, k: Int, sources: Seq[String],
      rescore: Int = QuantRescoreR): DataFrame =
    singleServe(serve(s, dir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore),
        sources = Some(sources))), filtered = true)

  /** [[annServeQuantFiltered]] against an explicit warehouse. */
  def annServeQuantFilteredFrom(s: SparkSession, whDir: String,
      queryVec: Seq[Double], nprobe: Int, k: Int, sources: Seq[String],
      rescore: Int = QuantRescoreR): DataFrame =
    singleServe(serveFrom(s, whDir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore),
        sources = Some(sources))), filtered = true)

  /** FILTERED × QUANTIZED × BATCH — the full option vector: one job,
    * int8 candidate tier, per-request metadata filter. */
  def annServeQuantFilteredBatch(s: SparkSession, dir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      sources: Seq[String], rescore: Int = QuantRescoreR): DataFrame =
    serve(s, dir, requests,
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore),
        sources = Some(sources)))

  /** [[annServeQuantFilteredBatch]] against an explicit warehouse. */
  def annServeQuantFilteredBatchFrom(s: SparkSession, whDir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      sources: Seq[String], rescore: Int = QuantRescoreR): DataFrame =
    serveFrom(s, whDir, requests,
      AnnServeOpts(nprobe, k, quantized = true, rescore = Some(rescore),
        sources = Some(sources)))

  /** q167 — the filtered serve certified against a from-raw
    * re-derivation: index, probe, candidate scores AND the source
    * filter all recomputed from the raw tables in one statement. */
  def filteredServe(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    annServeFiltered(s, dir, qv, ParamNprobe, ParamAnnK, FilterSources)
  }

  val filteredServeSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |${annRequestProbeTailCteSql(ParamQueryVecId, ParamNprobe)},
       |src AS (
       |  SELECT doc_id AS vec_id, source FROM documents
       |  WHERE source IN (${FilterSources.map(s => s"'$s'").mkString(", ")}))
       |SELECT aqcand.vec_id, aqcand.cell, src.source,
       |  round(cos, 6) AS cosine
       |FROM aqcand JOIN src ON src.vec_id = aqcand.vec_id
       |ORDER BY cos DESC, aqcand.vec_id ASC
       |LIMIT $ParamAnnK""".stripMargin

  /** Oracle rule text of the allowed-source set ([[FilterSources]])
    * from the raw documents table — ONE text for every filtered-cell
    * oracle so the filter definition cannot drift between them. */
  private[queries] val filterSrcCteSql: String =
    s"""src AS (
       |  SELECT doc_id AS vec_id, source FROM documents
       |  WHERE source IN (${FilterSources.map(s => s"'$s'").mkString(", ")}))""".stripMargin

  // ---- q170: FILTERED × BATCH ANN serving ------------------------------

  /** The q170 pinned battery: 40 stored vectors replayed as filtered
    * batch requests, stride disjoint from the q155 (13·i+7) and q162
    * (11·i+3) batteries so no two batch certificates share a request
    * population. */
  private[queries] val FilterBatchIds: Seq[Long] =
    (0 until 40).map(i => ((i * 17 + 5) % 480).toLong)
  private[queries] val FilterBatchNprobe = 2
  private[queries] val FilterBatchK = 8

  private def batchVecsOf(s: SparkSession, dir: String,
      ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    Tables.embeddings(s, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** q170 — the filtered batch serve certified per request against a
    * from-raw re-derivation: index, probes, scores and the source
    * filter recomputed from the raw tables in one statement. A
    * request whose probed cells hold fewer than k allowed candidates
    * serves what it has (mirrored by the oracle at equal nprobe). */
  def filteredBatchServe(s: SparkSession, dir: String): DataFrame =
    annServeFilteredBatch(s, dir, batchVecsOf(s, dir, FilterBatchIds),
      FilterBatchNprobe, FilterBatchK, FilterSources)

  val filteredBatchServeSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |${annBatchProbeCteSql(FilterBatchIds, FilterBatchNprobe)},
       |$filterSrcCteSql
       |SELECT req_id, rank, vec_id, cell, source, round(cos, 6) AS cosine
       |FROM (
       |  SELECT bcand.req_id,
       |    row_number() OVER (PARTITION BY bcand.req_id
       |      ORDER BY bcand.cos DESC, bcand.vec_id ASC) AS rank,
       |    bcand.vec_id, bcand.cell, src.source, bcand.cos
       |  FROM bcand JOIN src ON src.vec_id = bcand.vec_id)
       |WHERE rank <= $FilterBatchK
       |ORDER BY req_id, rank""".stripMargin

  // ---- q171: FILTERED × QUANTIZED ANN serving --------------------------

  /** q171 — the filtered quantized serve (the production cell:
    * license-filtered queries over the int8 tier) certified against
    * a from-raw re-derivation of the index, BOTH code tiers, the
    * probe, the filtered prefilter window and the exact rescore. */
  def filteredQuantServe(s: SparkSession, dir: String): DataFrame = {
    val qv = Tables.embeddings(s, dir)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(doubled(col("embedding")).as("v"))
      .collect()(0).getSeq[Double](0)
    annServeQuantFiltered(s, dir, qv, ParamNprobe, ParamAnnK, FilterSources)
  }

  /** The filtered-prefilter rule: the int8 window ranks ONLY allowed
    * candidates (filter before rescore selection — [[AnnServeOpts]]),
    * then the survivors rescore exactly. `aqcand` (full-precision
    * scores of all probed candidates) supplies the exact scores, so
    * the rescore leg reuses the q150 rule text verbatim. */
  val filteredQuantServeSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |$i8QuantCteSql,
       |sig8 AS (
       |  SELECT z8n.vec_id, sig.cell, z8n.q, z8n.qn8
       |  FROM z8n JOIN sig ON sig.vec_id = z8n.vec_id),
       |${annRequestProbeTailCteSql(ParamQueryVecId, ParamNprobe)},
       |aq8 AS (SELECT q AS qq, qn8 AS qqn FROM z8n
       |        WHERE vec_id = $ParamQueryVecId),
       |$filterSrcCteSql,
       |fpre AS (
       |  SELECT vec_id FROM (
       |    SELECT sig8.vec_id,
       |      row_number() OVER (ORDER BY
       |        CASE WHEN sig8.qn8 * aq8.qqn = 0 THEN -2.0
       |          ELSE list_inner_product(sig8.q, aq8.qq) / (sig8.qn8 * aq8.qqn)
       |          END DESC, sig8.vec_id ASC) AS rn
       |    FROM sig8
       |    JOIN aqc ON sig8.cell = aqc.probe_cell
       |    JOIN src ON src.vec_id = sig8.vec_id, aq8)
       |  WHERE rn <= $QuantRescoreR)
       |SELECT aqcand.vec_id, aqcand.cell, src.source,
       |  round(aqcand.cos, 6) AS cosine
       |FROM aqcand
       |JOIN fpre ON fpre.vec_id = aqcand.vec_id
       |JOIN src ON src.vec_id = aqcand.vec_id
       |ORDER BY aqcand.cos DESC, aqcand.vec_id ASC
       |LIMIT $ParamAnnK""".stripMargin

  // ---- q172: FILTERED × QUANTIZED × BATCH ANN serving -------------------

  /** The q172 pinned battery: 50 stored vectors, stride disjoint from
    * every other batch battery (7·i+1 vs 13·i+7 / 11·i+3 / 17·i+5). */
  private[queries] val QuantFilterBatchIds: Seq[Long] =
    (0 until 50).map(i => ((i * 7 + 1) % 480).toLong)
  private[queries] val QuantFilterBatchNprobe = 2
  private[queries] val QuantFilterBatchK = 8

  /** q172 — the FULL option vector (one job, int8 candidate tier,
    * per-request metadata filter) certified per request against a
    * from-raw re-derivation of everything it composes. */
  def filteredQuantBatchServe(s: SparkSession, dir: String): DataFrame =
    annServeQuantFilteredBatch(s, dir,
      batchVecsOf(s, dir, QuantFilterBatchIds),
      QuantFilterBatchNprobe, QuantFilterBatchK, FilterSources)

  val filteredQuantBatchServeSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |$i8QuantCteSql,
       |sig8 AS (
       |  SELECT z8n.vec_id, sig.cell, z8n.q, z8n.qn8
       |  FROM z8n JOIN sig ON sig.vec_id = z8n.vec_id),
       |$filterSrcCteSql,
       |bq AS (
       |  SELECT vec_id AS req_id, v AS quv,
       |    sqrt(list_inner_product(v, v)) AS qn
       |  FROM e WHERE vec_id IN (${QuantFilterBatchIds.mkString(", ")})),
       |bq8 AS (
       |  SELECT vec_id AS req_id, q AS qq, qn8 AS qqn FROM z8n
       |  WHERE vec_id IN (${QuantFilterBatchIds.mkString(", ")})),
       |bpc AS (
       |  SELECT req_id, probe_cell FROM (
       |    SELECT bq.req_id, c.c_id AS probe_cell,
       |      row_number() OVER (PARTITION BY bq.req_id
       |        ORDER BY ${cosineSqlFor("c.qv", "bq.quv")} DESC, c.c_id DESC) AS rn
       |    FROM c, bq) WHERE rn <= $QuantFilterBatchNprobe),
       |bpre AS (
       |  SELECT req_id, vec_id FROM (
       |    SELECT bpc.req_id, sig8.vec_id,
       |      row_number() OVER (PARTITION BY bpc.req_id
       |        ORDER BY CASE WHEN sig8.qn8 * bq8.qqn = 0 THEN -2.0
       |          ELSE list_inner_product(sig8.q, bq8.qq) / (sig8.qn8 * bq8.qqn)
       |          END DESC, sig8.vec_id ASC) AS rn
       |    FROM sig8
       |    JOIN src ON src.vec_id = sig8.vec_id
       |    JOIN bpc ON sig8.cell = bpc.probe_cell
       |    JOIN bq8 ON bq8.req_id = bpc.req_id) WHERE rn <= $QuantRescoreR),
       |bres AS (
       |  SELECT bpre.req_id, sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * bq.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, bq.quv) / (sig.norm * bq.qn)
       |      END AS cos
       |  FROM bpre
       |  JOIN sig ON sig.vec_id = bpre.vec_id
       |  JOIN bq ON bq.req_id = bpre.req_id)
       |SELECT req_id, rank, vec_id, cell, source, round(cos, 6) AS cosine
       |FROM (
       |  SELECT bres.req_id,
       |    row_number() OVER (PARTITION BY bres.req_id
       |      ORDER BY bres.cos DESC, bres.vec_id ASC) AS rank,
       |    bres.vec_id, bres.cell, src.source, bres.cos
       |  FROM bres JOIN src ON src.vec_id = bres.vec_id)
       |WHERE rank <= $QuantFilterBatchK
       |ORDER BY req_id, rank""".stripMargin

  // ---- q152: refreshed-centroid recall LIFT certification -------------

  /** Lloyd steps the q152 refresh runs before re-certifying recall —
    * chosen where the refreshed recall is ≥ the build recall at every
    * fixture SF (measured: +3 overlap at sf0.01, +1 at sf0.1, +8 at
    * sf0.001 for the 5-query battery). */
  private[queries] val LloydRefineSteps = 2

  /** Refreshed centroids: `steps` Lloyd iterations from the first-k
    * seeding — each step the EXACT q72 arithmetic (micro-unit means
    * via [[lloydMeansOf]], cells with no members drop out, the q141
    * empty-cell rule). Driver-held k·dim state, one Spark job per
    * step. */
  private def refinedCentroids(e: DataFrame,
      steps: Int): Array[(Long, Seq[Double])] = {
    var cents = collectCentroids(e)
    (1 to steps).foreach { _ =>
      cents = lloydMeansOf(assignCellsWith(e, cents)).collect()
        .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1))
            .map(_.getLong(3).toDouble / 1e6).toSeq)
        }.toArray
    }
    cents
  }

  /** Per-step max-|Δ| drift trace (micro units) of `steps` Lloyd
    * iterations from the first-k seeding — drift of step i = the
    * [[graft.queries.Warehouse.semanticDriftMicro]] statistic between
    * step i's micro means and step i−1's centroids. Driver-held
    * k·dim state, one Spark job per step (the refinedCentroids
    * shape + the drift fold). */
  private[graft] def lloydDriftTrace(e: DataFrame,
      steps: Int): Seq[Long] = {
    var cents = collectCentroids(e)
    (1 to steps).map { _ =>
      val prevMicro = cents.map { case (id, v) =>
        id -> v.map(x => math.floor(x * 1e6 + 0.5).toLong)
      }.toMap
      val rows = lloydMeansOf(assignCellsWith(e, cents)).collect()
      val drift = rows.foldLeft(0L) { (acc, r) =>
        val cm = prevMicro.get(r.getLong(0))
          .map(_(r.getInt(1))).getOrElse(0L)
        math.max(acc, math.abs(r.getLong(3) - cm))
      }
      cents = rows
        .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (cell, rs) =>
          (cell, rs.sortBy(_.getInt(1))
            .map(_.getLong(3).toDouble / 1e6).toSeq)
        }.toArray
      drift
    }
  }

  /** One-pass (exact top-10 ∩ probed top-10) overlap per probe query
    * under an EXPLICIT centroid set — the q106 certification shape
    * with the centroid basis as a parameter (same 5 queries, same
    * nprobe = 2, same sentinel-padded single aggregation). */
  private[queries] def probedOverlap(e: DataFrame,
      cents: Array[(Long, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = e.sparkSession
    import s.implicits._
    val (nprobe, k) = (2, 10)
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
    val cent = cents.toSeq.toDF("c_id", "cv")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val qs = e.filter(col("vec_id").between(40, 44))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val qcells = cent.join(broadcast(qs))
      .withColumn("cos_c", cosine(col("cv"), col("qv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id").as("qc_query"), col("c_id").as("probe_cell"))
    e.join(broadcast(cent))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("v"))
      .join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .join(broadcast(qcells),
        col("query_id") === col("qc_query") && col("cell") === col("probe_cell"),
        "left")
      .withColumn("cos_f", cosine(col("v"), col("qv")))
      .select(col("query_id"), col("vec_id"), col("cos_f"),
        col("qc_query").isNotNull.as("in_probe"))
      .groupBy("query_id").agg(
        topk(-col("cos_f"), col("vec_id"), col("cos_f")).as("te"),
        topk(when(col("in_probe"), -col("cos_f")).otherwise(lit(3.0)),
          when(col("in_probe"), col("vec_id")).otherwise(lit(-1L)),
          col("cos_f")).as("ti"),
        sum(when(col("in_probe"), 1L).otherwise(0L)).as("n_probed"))
      .select(col("query_id"),
        size(array_intersect(
          transform(col("te.cands"), x => x.getField("id")),
          filter(transform(col("ti.cands"), x => x.getField("id")),
            id => id =!= lit(-1L)))).cast("long")
          .as("n_overlap"),
        col("n_probed"))
  }

  // ---- q174: IVF build-seeding comparison (r16 verdict #3) -----------

  /** Deterministic farthest-point ("k-means++-style") IVF build
    * seeding: seed 1 is the smallest vec_id; each next seed is the
    * vector MINIMIZING its maximum cosine to the seeds chosen so far
    * (max-min angular spread), ties to the smaller vec_id — fully
    * deterministic, RNG-free, oracle-derivable. k−1 driver rounds,
    * each ONE map-only job over the corpus with k·dim driver state —
    * a build-time cost (≤ k corpus scans), never a serving one.
    *
    * What it buys, honestly: on corpora with CLUSTER structure the
    * spread guarantees seed coverage of every well-separated cluster
    * — SeedSpreadSpec's planted geometry makes first-k collapse all
    * seeds into one cluster (probed recall craters) while the spread
    * recovers one seed per cluster with a strict recall lift. On the
    * driver's ISOTROPIC synthetic embeddings it is recall-neutral by
    * measurement (q174: overlap sums 19/19, 21/17, 20/18 across the
    * three SFs at equal nprobe) — with no cluster structure, seed
    * placement cannot matter, and the Lloyd refresh (q152/q160) is
    * the real recall lever. q174 certifies exactly that comparison
    * against a from-raw oracle so the finding is a number, not a
    * claim. */
  private[queries] def spreadCentroids(e: DataFrame,
      k: Int): Array[(Long, Seq[Double])] = {
    require(k > 0, s"k must be positive, got $k")
    var chosen = e.orderBy(col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    while (chosen.length < k) {
      val scored = chosen.toSeq.map { case (_, cv) =>
        val cnorm = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
        val denom = col("nv") * lit(cnorm)
        when(denom === 0.0, lit(-2.0))
          .otherwise(dot(col("v"), typedLit(cv)) / denom)
      }
      val mc = if (scored.size == 1) scored.head else greatest(scored: _*)
      val next = e.withColumn("nv", sqrt(dot(col("v"), col("v"))))
        .withColumn("mc", mc)
        .orderBy(col("mc").asc, col("vec_id").asc)
        .limit(1).select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      chosen = chosen ++ next
    }
    chosen
  }

  /** q174 — the SEEDING COMPARISON certificate: the q106 probed-
    * recall@10 measurement (same 5 queries, same nprobe = 2, query
    * excluded) under the first-k build seeding AND under the
    * farthest-point spread seeding, side by side with each leg's
    * probed-candidate count (the scan fraction recall is bought
    * with). The oracle re-derives both seedings, both assignments,
    * both probes and all intersections from raw embeddings. */
  def seedCompare(s: SparkSession, dir: String): DataFrame =
    seedCompareOf(Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v")))

  /** [[seedCompare]] over an explicit doubled frame (vec_id, v) —
    * the seam SeedSpreadSpec's planted-cluster geometry drives. */
  private[queries] def seedCompareOf(e: DataFrame): DataFrame = {
    val ovF = probedOverlap(e, collectCentroids(e))
      .select(col("query_id"), col("n_overlap").as("n_overlap_first"),
        col("n_probed").as("n_probed_first"))
    val ovS = probedOverlap(e, spreadCentroids(e, CentroidK))
      .select(col("query_id"), col("n_overlap").as("n_overlap_spread"),
        col("n_probed").as("n_probed_spread"))
    ovF.join(ovS, Seq("query_id")).orderBy("query_id")
  }

  /** Oracle rule text of the farthest-point seeding: k−1 chained
    * rounds (`spr`/`sps`/`sp` CTEs), final centroid CTE `spreadc`. */
  private def spreadSeedCteSql(k: Int): String = {
    val rounds = (1 until k).map { i =>
      val prev = s"sp${i - 1}"
      s"""spr$i AS (
         |  SELECT e.vec_id, max(${cosineSqlFor("e.v", "c.v")}) AS mc
         |  FROM e, $prev c GROUP BY e.vec_id),
         |sps$i AS (
         |  SELECT e.vec_id, e.v FROM e JOIN spr$i ON spr$i.vec_id = e.vec_id
         |  ORDER BY spr$i.mc ASC, e.vec_id ASC LIMIT 1),
         |sp$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM sps$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""sp0 AS (SELECT vec_id, v FROM e ORDER BY vec_id ASC LIMIT 1),
       |$rounds,
       |spreadc AS (SELECT vec_id AS c_id, v AS cv FROM sp${k - 1})"""
      .stripMargin
  }

  /** Probed-candidate count per query under recall leg `suffix`. */
  private def probeCountCteSql(suffix: String): String =
    s"""np$suffix AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_probed
       |  FROM iv$suffix GROUP BY query_id)""".stripMargin

  val seedCompareSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $CentroidK),
       |${spreadSeedCteSql(CentroidK)},
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
       |       WHERE vec_id BETWEEN 40 AND 44),
       |ex AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qs.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${cosineSqlFor("e.v", "qs.qv")} DESC, e.vec_id ASC) AS rk
       |    FROM e, qs WHERE e.vec_id <> qs.query_id) WHERE rk <= 10),
       |le AS (SELECT query_id, list(vec_id) AS ids FROM ex GROUP BY query_id),
       |${lloydAssignCteSql("cent0", "zf", "af")},
       |${lloydAssignCteSql("spreadc", "zsp", "asp")},
       |${recallLegCteSql("cent0", "f")},
       |${probeCountCteSql("f")},
       |${recallLegCteSql("spreadc", "sp")},
       |${probeCountCteSql("sp")}
       |SELECT le.query_id,
       |  CAST(len(list_intersect(le.ids, lif.ids)) AS BIGINT)
       |    AS n_overlap_first,
       |  npf.n_probed AS n_probed_first,
       |  CAST(len(list_intersect(le.ids, lisp.ids)) AS BIGINT)
       |    AS n_overlap_spread,
       |  npsp.n_probed AS n_probed_spread
       |FROM le
       |JOIN lif ON lif.query_id = le.query_id
       |JOIN npf ON npf.query_id = le.query_id
       |JOIN lisp ON lisp.query_id = le.query_id
       |JOIN npsp ON npsp.query_id = le.query_id
       |ORDER BY le.query_id""".stripMargin

  /** q152 — DOES THE REFRESH PAY? q141 certified the refresh
    * machinery (stored-state Lloyd step, table for table); q106/q128
    * certified that probing beats random at the BUILD-time seeding.
    * This query closes the loop the r14 verdict asked for: the same
    * recall@10 certificate at the same nprobe, run under the
    * build-time centroids AND under [[LloydRefineSteps]] refreshed
    * centroids, per probe query — with the live total-lift flag
    * `refresh_no_worse` (Σ refreshed overlap ≥ Σ build overlap) that
    * the oracle recomputes from raw embeddings, whole chain included
    * (seed → R micro-unit Lloyd steps → re-assignment → both probes →
    * both exact-vs-probed intersections). Strict per-cluster lift on
    * a planted corpus is spec-pinned (CellArgmaxSpec's geometry;
    * RefreshRecallSpec).
    *
    * Scale: the exact leg needs the full scan anyway (q106 argument);
    * each Lloyd step is the q72 shuffle shape (k·dim groups); the two
    * probe legs ride the same one-pass aggregation — everything else
    * broadcasts. */
  def refreshRecallLift(s: SparkSession, dir: String): DataFrame =
    refreshRecallLiftOf(Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v")))

  /** [[refreshRecallLift]] over an explicit doubled frame (vec_id, v)
    * — the seam the planted-cluster strict-lift spec drives. */
  private[queries] def refreshRecallLiftOf(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ovB = probedOverlap(e, collectCentroids(e))
      .withColumnRenamed("n_overlap", "n_overlap_build")
    val ovR = probedOverlap(e, refinedCentroids(e, LloydRefineSteps))
      .withColumnRenamed("n_overlap", "n_overlap_refresh")
    val w = Window.partitionBy()
    ovB.join(ovR, Seq("query_id"))
      .select(col("query_id"), col("n_overlap_build"), col("n_overlap_refresh"),
        (col("n_overlap_refresh") - col("n_overlap_build")).as("lift"))
      .withColumn("refresh_no_worse",
        sum(col("n_overlap_refresh")).over(w) >=
          sum(col("n_overlap_build")).over(w))
      .orderBy("query_id")
  }

  /** Oracle assignment CTE against an arbitrary centroid CTE
    * (`centName(c_id, cv)`): the cellAssign rule text with the
    * centroid basis as a parameter. */
  private def lloydAssignCteSql(centName: String, sName: String,
      aName: String): String =
    s"""$sName AS (
       |  SELECT e.vec_id, c.c_id, e.v, ${cosineSqlFor("e.v", "c.cv")} AS cos
       |  FROM e, $centName c),
       |$aName AS (
       |  SELECT vec_id, v, c_id AS cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id DESC) AS rn
       |  FROM $sName)""".stripMargin

  /** Oracle Lloyd step: micro-unit means of assignment `aName` →
    * next centroid CTE (the q72/q141 arithmetic, name-parameterized). */
  private def lloydStepCteSql(aName: String, xName: String, mName: String,
      centNext: String): String =
    s"""$xName AS (
       |  SELECT cell, CAST(i - 1 AS INTEGER) AS pos, v[i] AS x
       |  FROM $aName, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) r
       |  WHERE rn = 1),
       |$mName AS (
       |  SELECT cell, pos, count(*) AS n_members,
       |    CAST(floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) + 0.5) AS BIGINT) AS mean_micro
       |  FROM $xName
       |  GROUP BY cell, pos),
       |$centNext AS (
       |  SELECT cell AS c_id, list(mean_micro / 1000000.0 ORDER BY pos) AS cv
       |  FROM $mName GROUP BY cell)""".stripMargin

  /** Oracle probed-recall leg under centroid CTE `centName`: probe
    * cells, assignment `a$suffix` (must already be in scope), pruned
    * ranks, top-10 id list `li$suffix`. */
  private def recallLegCteSql(centName: String, suffix: String): String =
    s"""qc$suffix AS (
       |  SELECT query_id, c_id AS probe_cell FROM (
       |    SELECT qs.query_id, c.c_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${cosineSqlFor("c.cv", "qs.qv")} DESC, c.c_id DESC) AS rn
       |    FROM $centName c, qs) WHERE rn <= 2),
       |iv$suffix AS (
       |  SELECT s.query_id, s.vec_id,
       |    row_number() OVER (PARTITION BY s.query_id
       |      ORDER BY s.cf DESC, s.vec_id ASC) AS rk
       |  FROM (SELECT qs.query_id, g.vec_id, g.cell,
       |          ${cosineSqlFor("g.v", "qs.qv")} AS cf
       |        FROM (SELECT vec_id, cell, v FROM a$suffix WHERE rn = 1) g, qs
       |        WHERE g.vec_id <> qs.query_id) s
       |  JOIN qc$suffix q ON q.query_id = s.query_id AND q.probe_cell = s.cell),
       |li$suffix AS (SELECT query_id, list(vec_id ORDER BY rk) AS ids
       |              FROM iv$suffix WHERE rk <= 10 GROUP BY query_id)""".stripMargin

  val refreshRecallLiftSql: String = {
    val steps = (0 until LloydRefineSteps).map { i =>
      lloydAssignCteSql(s"cent$i", s"s$i", s"a$i") + ",\n" +
        lloydStepCteSql(s"a$i", s"x$i", s"m$i", s"cent${i + 1}")
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $CentroidK),
       |$steps,
       |${lloydAssignCteSql("cent0", "sb", "ab")},
       |${lloydAssignCteSql(s"cent$LloydRefineSteps", "sr", "ar")},
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
       |       WHERE vec_id BETWEEN 40 AND 44),
       |ex AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qs.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${cosineSqlFor("e.v", "qs.qv")} DESC, e.vec_id ASC) AS rk
       |    FROM e, qs WHERE e.vec_id <> qs.query_id) WHERE rk <= 10),
       |le AS (SELECT query_id, list(vec_id) AS ids FROM ex GROUP BY query_id),
       |${recallLegCteSql("cent0", "b")},
       |${recallLegCteSql(s"cent$LloydRefineSteps", "r")},
       |res AS (
       |  SELECT le.query_id,
       |    CAST(len(list_intersect(le.ids, lib.ids)) AS BIGINT) AS ovb,
       |    CAST(len(list_intersect(le.ids, lir.ids)) AS BIGINT) AS ovr
       |  FROM le
       |  JOIN lib ON lib.query_id = le.query_id
       |  JOIN lir ON lir.query_id = le.query_id)
       |SELECT query_id, ovb AS n_overlap_build, ovr AS n_overlap_refresh,
       |  ovr - ovb AS lift,
       |  (sum(ovr) OVER () >= sum(ovb) OVER ()) AS refresh_no_worse
       |FROM res
       |ORDER BY query_id""".stripMargin
  }

  // ---- q160: drift-gated Lloyd refresh UNTIL CONVERGED (r15 #5) ------

  /** Convergence gate of the iterated refresh: stop when a step moves
    * no centroid coordinate by ≥ [[LloydEpsMicro]] micro units (the
    * [[graft.queries.Warehouse.semanticDriftMicro]] statistic), bound
    * the loop at [[LloydMaxSteps]]. ε sits above the measured
    * micro-rounded plateau (~8–30k micro at the fixtures after the
    * first step's ~300k) — Lloyd on micro-unit means dithers around
    * its fixed point rather than reaching drift 0, so "converged"
    * means "inside the dither band", the statistic a production
    * refresh job actually gates on. */
  private[queries] val LloydMaxSteps = 4
  private[graft] val LloydEpsMicro = 25000L

  /** q160 — the ITERATED, drift-gated refresh (r15 verdict #5: q152
    * pins a fixed 2-step refresh; a production refit runs until the
    * gate closes). One row per EXECUTED step (the loop stops at the
    * first converged step or at the bound):
    *
    *  - `drift_micro`  the step's max coordinate movement — the gate;
    *  - `converged`    drift < ε (true exactly on the last row unless
    *                   the bound cut the loop);
    *  - `recall_sum`   Σ over the 5-probe battery of probed
    *                   overlap@10 under THAT step's centroids (the
    *                   q152 leg per step);
    *  - `converged_no_worse_than_build`  recall at the final executed
    *                   step ≥ the BUILD seeding's recall — the q152
    *                   lift property certified at the CONVERGED
    *                   point (true at every fixture SF: 25/23/21 vs
    *                   build 19/21/20). Probed recall under a k-cell
    *                   partition is not monotone in Lloyd steps
    *                   (moving centroids shifts cell boundaries, and
    *                   a step can trade one query's probed set
    *                   against another's — the sf0.01 trace dips
    *                   24 → 23 between steps 2 and 3), so the honest
    *                   invariant is against the baseline the refresh
    *                   exists to beat, not against the previous step.
    *
    * The oracle re-derives every step's means, drift, assignment and
    * recall leg from raw embeddings, and applies the same stop rule
    * (steps ≤ first-converged-or-bound), so the loop's control flow
    * itself is certified, not just its final state. */
  /** Probed recall_sum of the BUILD seeding (step 0) — the q152
    * baseline the converged refresh is certified against. */
  private[graft] def buildRecallSumOf(e: DataFrame): Long =
    probedOverlap(e, collectCentroids(e))
      .agg(coalesce(sum(col("n_overlap")), lit(0L))).collect()(0).getLong(0)

  def lloydConverge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), doubled(col("embedding")).as("v"))
    var cents = collectCentroids(e)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean, Long)]()
    var step = 1
    var done = false
    while (step <= LloydMaxSteps && !done) {
      val prevMicro = cents.map { case (id, v) =>
        id -> v.map(x => math.floor(x * 1e6 + 0.5).toLong)
      }.toMap
      val rows = lloydMeansOf(assignCellsWith(e, cents)).collect()
      val drift = rows.foldLeft(0L) { (acc, r) =>
        val cm = prevMicro.get(r.getLong(0))
          .map(_(r.getInt(1))).getOrElse(0L)
        math.max(acc, math.abs(r.getLong(3) - cm))
      }
      cents = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (cell, rs) =>
          (cell, rs.sortBy(_.getInt(1))
            .map(_.getLong(3).toDouble / 1e6).toSeq)
        }.toArray
      val recallSum = probedOverlap(e, cents)
        .agg(coalesce(sum(col("n_overlap")), lit(0L))).collect()(0).getLong(0)
      val conv = drift < LloydEpsMicro
      out += ((step.toLong, drift, conv, recallSum))
      done = conv
      step += 1
    }
    val recallFinal = out.last._4
    val recallBuild = buildRecallSumOf(e)
    out.toSeq.toDF("step", "drift_micro", "converged", "recall_sum")
      .withColumn("converged_no_worse_than_build",
        lit(recallFinal >= recallBuild))
      .orderBy("step")
  }

  val lloydConvergeSql: String = {
    val chain = (0 until LloydMaxSteps).map { i =>
      lloydAssignCteSql(s"cent$i", s"s$i", s"a$i") + ",\n" +
        lloydStepCteSql(s"a$i", s"x$i", s"m$i", s"cent${i + 1}")
    }.mkString(",\n")
    val lastAssign =
      lloydAssignCteSql(s"cent$LloydMaxSteps", "sfin",
        s"a$LloydMaxSteps")
    // Step i's means live in the chain's m${i-1} CTE (the chain
    // names its stage outputs by the SOURCE centroid index).
    val drifts = (1 to LloydMaxSteps).map { i =>
      s"""d$i AS (
         |  SELECT max(abs(m.mean_micro -
         |    CAST(floor(c.cv[m.pos + 1] * 1e6 + 0.5) AS BIGINT))) AS drift
         |  FROM m${i - 1} m JOIN cent${i - 1} c ON c.c_id = m.cell)""".stripMargin
    }.mkString(",\n")
    val legs = (0 to LloydMaxSteps)
      .map(i => recallLegCteSql(s"cent$i", s"$i")).mkString(",\n")
    val sums = (0 to LloydMaxSteps).map { i =>
      s"""rs$i AS (
         |  SELECT CAST($i AS BIGINT) AS step,
         |    CAST(sum(len(list_intersect(le.ids, li$i.ids))) AS BIGINT)
         |      AS recall_sum
         |  FROM le JOIN li$i ON li$i.query_id = le.query_id)""".stripMargin
    }.mkString(",\n")
    val driftRows = (1 to LloydMaxSteps).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, (SELECT drift FROM d$i) AS drift_micro")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $CentroidK),
       |$chain,
       |$lastAssign,
       |$drifts,
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e
       |       WHERE vec_id BETWEEN 40 AND 44),
       |ex AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qs.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${cosineSqlFor("e.v", "qs.qv")} DESC, e.vec_id ASC) AS rk
       |    FROM e, qs WHERE e.vec_id <> qs.query_id) WHERE rk <= 10),
       |le AS (SELECT query_id, list(vec_id) AS ids FROM ex GROUP BY query_id),
       |$legs,
       |$sums,
       |ds AS (
       |  $driftRows),
       |rsall AS (${(0 to LloydMaxSteps).map(i => s"SELECT * FROM rs$i")
           .mkString(" UNION ALL ")}),
       |sel AS (
       |  SELECT COALESCE((SELECT min(step) FROM ds
       |                   WHERE drift_micro < $LloydEpsMicro),
       |    $LloydMaxSteps) AS s_last)
       |SELECT ds.step, ds.drift_micro,
       |  ds.drift_micro < $LloydEpsMicro AS converged,
       |  rsall.recall_sum,
       |  ((SELECT recall_sum FROM rsall, sel WHERE rsall.step = sel.s_last)
       |    >= (SELECT recall_sum FROM rsall WHERE rsall.step = 0))
       |    AS converged_no_worse_than_build
       |FROM ds JOIN rsall ON rsall.step = ds.step, sel
       |WHERE ds.step <= sel.s_last
       |ORDER BY ds.step""".stripMargin
  }

  // ---- q148: sem-purge-aware ANN serving -----------------------------

  /** q148 — the dense leg's q147: SemDeDup's purge decision APPLIED to
    * ANN serving. The warehouse already materializes `sem_purge` (q109's
    * keep-first-index rule, build-certified by q134), so the serve is
    * q142's stored-index probe with one broadcast anti-join on the
    * purged vec_ids before the rerank — purged near-duplicates never
    * surface as neighbours, and nothing recomputes or rewrites: the
    * purge table IS the deletion vector of the dense index (the
    * tombstone discipline q147 gives the lexical leg, served here from
    * a table the index already keeps). Same plan shape as q142 (the
    * anti-join side is O(purged-in-index), broadcast); zero corpus
    * scans, PlanShapeSpec-pinned. The oracle re-derives the index, the
    * within-cell purge rule AND the probe from raw embeddings in one
    * statement (cellAssign + semPair + the probe tail — one `sig` rule
    * text shared by purge and probe, which is the point: the serve and
    * the decision it honors cannot drift). */
  def annServePurged(s: SparkSession, dir: String): DataFrame =
    annServeScored(s, dir)
      .join(broadcast(graft.queries.Warehouse.stored(s, dir, "sem_purge")
        .select(col("vec_id"))), Seq("vec_id"), "left_anti")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(AnnServeK)
      .select(col("vec_id"), col("cell"), round(col("cos"), 6).as("cosine"))

  val annServePurgedSql: String =
    s"""WITH $cellAssignCteSql,
       |$semPairCteSql,
       |$annProbeTailCteSql,
       |spg AS (SELECT DISTINCT j AS vec_id FROM p WHERE cos >= $SemDedupTau)
       |SELECT vec_id, cell, round(cos, 6) AS cosine
       |FROM cand
       |WHERE vec_id NOT IN (SELECT vec_id FROM spg)
       |ORDER BY cos DESC, vec_id ASC
       |LIMIT $AnnServeK""".stripMargin

  val incrementalSemanticDedupSql: String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |nb AS (SELECT * FROM sig WHERE vec_id % $IncrSemMod = ${IncrSemMod - 1}),
       |ib AS (SELECT * FROM sig WHERE vec_id % $IncrSemMod <> ${IncrSemMod - 1}),
       |p AS (
       |  SELECT nb.vec_id AS new_vec, nb.cell, ib.vec_id AS idx_vec,
       |    CASE WHEN nb.norm * ib.norm = 0 THEN -2.0
       |      ELSE list_inner_product(nb.v, ib.v) / (nb.norm * ib.norm) END AS cos
       |  FROM nb JOIN ib ON ib.cell = nb.cell),
       |r AS (
       |  SELECT new_vec, cell, idx_vec, cos,
       |    row_number() OVER (PARTITION BY new_vec
       |                       ORDER BY cos DESC, idx_vec ASC) AS rk,
       |    count(*) OVER (PARTITION BY new_vec) AS n_cell_index,
       |    sum(CASE WHEN cos >= $SemDedupTau THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY new_vec) AS n_covering
       |  FROM p)
       |SELECT new_vec, cell,
       |  CAST(n_cell_index AS BIGINT) AS n_cell_index,
       |  CAST(n_covering AS BIGINT) AS n_covering,
       |  idx_vec AS best_match, round(cos, 6) AS best_cos,
       |  (cos >= $SemDedupTau) AS is_dup
       |FROM r
       |WHERE rk = 1
       |ORDER BY new_vec""".stripMargin

  // ---- PRODUCT-QUANTIZED dense-index tier (r17) -----------------------

  /** PQ geometry: [[PqM]] contiguous subspaces per vector, [[PqK]]
    * codebook entries per subspace — a code is PqM unsigned bytes
    * (8 bytes/vector at the fixture dim 64 vs the 64-byte int8 tier:
    * the next bandwidth rung down for the corpus-scale prefilter
    * read). Entry ids are ALWAYS in [0, PqK): the build seeds entry
    * c of every subspace from vector vec_id = c (the first-k
    * discipline centroids use — build artifacts are pure seeds, so
    * merge ≡ rebuild holds by construction; [[graft.queries.Warehouse.refreshPq]]
    * is the refit path, exactly as [[graft.queries.Warehouse.refreshSemantic]]
    * is for the IVF centroids). */
  private[queries] val PqM = 8
  private[queries] val PqK = 8

  /** Exact-rescore window of the PQ serve — deeper than the int8
    * tier's [[QuantRescoreR]] because an 8-byte code ranks far more
    * coarsely than a 64-byte one; the certificate (q179) REPORTS the
    * overlap rather than assuming it. */
  private[queries] val PqRescoreR = 120

  /** The q179 probe battery: stored vectors 50–54 replayed as PQ
    * serve requests — disjoint from the q157 battery (40–44) so the
    * two quantized-tier certificates don't share a population. */
  private[queries] val PqQueryLo = 50L
  private[queries] val PqQueryHi = 54L

  /** Vector width of a (…, v) frame — one bounded driver read (the
    * 1-row stats-collect idiom); PQ needs it to slice subspaces at
    * plan time. */
  private def vecDimOf(e: DataFrame): Int =
    e.select(size(col("v"))).head.getInt(0)

  /** Map-only fan-out of an (vec_id, v) frame into its PqM contiguous
    * subvectors (vec_id, sub, sv) — the training/audit-side view;
    * the ENCODE path never materializes it (per-subspace argmax
    * kernels over plan-time slices). */
  /** Subspace count for a vector width: [[PqM]] when it divides the
    * width, else the largest divisor that does (a 4-dim test corpus
    * gets 4 one-dim subspaces; the fixture dim 64 gets the full 8).
    * Always ≥ 1 — the width divides itself. */
  private[queries] def pqMFor(dim: Int): Int =
    (PqM to 1 by -1).find(m => dim % m == 0).get

  private[queries] def pqSubVectors(e: DataFrame, dim: Int): DataFrame = {
    val m = pqMFor(dim)
    val dsub = dim / m
    val slices = (0 until m).map(j => slice(col("v"), j * dsub + 1, dsub))
    e.select(col("vec_id"),
      posexplode(array(slices: _*)).as(Seq("sub", "sv")))
  }

  /** BUILD codebooks: entry (sub, c) = subvector `sub` of vector
    * vec_id = c, for c < PqK — pure seeds (k·dsub driver rows), the
    * exact analogue of [[collectCentroids]] one tier down. Sorted by
    * (sub, c_id): the flattened index `sub * PqK + c` is the layout
    * contract every ADC consumer shares ([[graft.functions.PqOps]]). */
  private[queries] def pqSeedBooks(e: DataFrame,
      dim: Int): Array[(Int, Long, Seq[Double])] = {
    val out = pqSubVectors(e.filter(col("vec_id") < PqK), dim)
      .collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    // Entry ids double as CODE BYTES and ADC-table positions — the
    // layout contract needs them contiguous from 0 (a corpus shorter
    // than PqK vectors gets a smaller codebook). Refuse a corpus
    // whose leading vec_ids have gaps rather than emit codes that
    // silently misindex every lookup table.
    val ids = out.map(_._2).distinct.sorted
    require(ids.nonEmpty && ids.sameElements(0L until ids.length.toLong),
      s"pq seeding needs a contiguous vec_id prefix; got ${ids.toSeq}")
    out
  }

  /** [[pqSeedBooks]] over a raw (vec_id, embedding) frame — the
    * build path's entry point. */
  private[queries] def pqSeedBooksOf(emb: DataFrame): Array[(Int, Long, Seq[Double])] = {
    val e = emb.select(col("vec_id"), doubled(col("embedding")).as("v"))
    pqSeedBooks(e, vecDimOf(e))
  }

  /** Codebooks as a writable frame (sub, c_id, bv) — the `pq_books`
    * warehouse table. */
  private[queries] def pqBookFrameOf(s: SparkSession,
      books: Array[(Int, Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    books.toSeq.toDF("sub", "c_id", "bv")
  }

  /** The stored codebooks collected back to the driver — m·PqK rows
    * (kilobytes at any corpus scale: codebook size grows with PqM·PqK,
    * never with the corpus). */
  private[queries] def collectPqBooks(df: DataFrame): Array[(Int, Long, Seq[Double])] =
    df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))

  /** ENCODE a cells frame (vec_id, cell, norm, v) against explicit
    * codebooks → the `cells_pq` tier (vec_id, cell, code, norm):
    * per subspace one [[graft.functions.CellArgmax]] kernel over the
    * plan-time slice (cosine argmax, ties to the larger entry — the
    * cell-assignment tie rule), the PqM entry ids packed to one
    * binary blob ([[graft.functions.PqPack]]). Map-only and
    * codegen'd: zero shuffle at any corpus scale, and every writer
    * that derives `cells` derives this beside it (the [[cellsQ8Of]]
    * discipline). `norm` is the FULL-PRECISION vector norm — the ADC
    * cosine's denominator (the approximation lives in the dot, not
    * the norms). */
  private[queries] def cellsPqOf(cells: DataFrame,
      books: Array[(Int, Long, Seq[Double])]): DataFrame = {
    require(books.nonEmpty, "cellsPqOf needs a non-empty codebook")
    val dsub = books.head._3.length
    val m = books.map(_._1).max + 1
    val codeCols = (0 until m).map { j =>
      val packed = books.filter(_._1 == j).sortBy(_._2).toSeq.map {
        case (_, id, bv) =>
          (id, math.sqrt(bv.foldLeft(0.0)((a, x) => a + x * x)), bv)
      }
      call_function("graft_cell_argmax",
        slice(col("v"), j * dsub + 1, dsub), typedLit(packed)).cast("int")
    }
    cells.select(col("vec_id"), col("cell"),
      call_function("graft_pq_pack", array(codeCols: _*)).as("code"),
      col("norm"))
  }

  /** One Lloyd refit step of the codebooks from STORED state only
    * (the [[graft.queries.Warehouse.refreshSemantic]] arithmetic one
    * tier down): new entry (sub, c) = the micro-unit mean of the
    * subvectors the STORED codes assigned to it (the stored
    * assignment IS the Lloyd assignment — no re-assignment job),
    * entries with no members carry forward unchanged (a codebook is
    * a fixed-shape artifact; an unused entry keeps its seed). Reads
    * the index tables only — the corpus is never re-read. */
  private[queries] def pqRefitBooks(cells: DataFrame, cellsPq: DataFrame,
      books: Array[(Int, Long, Seq[Double])]): Array[(Int, Long, Seq[Double])] = {
    val dsub = books.head._3.length
    val assigned = cellsPq
      .select(col("vec_id"),
        posexplode(call_function("graft_pq_codes", col("code")))
          .as(Seq("sub", "c")))
      .join(cells.select(col("vec_id"), col("v")), Seq("vec_id"))
      .withColumn("sv", slice(col("v"), col("sub") * lit(dsub) + 1, lit(dsub)))
    val means = assigned
      .select(col("sub"), col("c"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy(col("sub"), col("c"), col("pos"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("sq"))
      .select(col("sub"), col("c"), col("pos"),
        floor(col("sq").cast("double") / col("n_members") + 0.5).cast("long")
          .as("mean_micro"))
      .collect()
    val refit = means.groupBy(r => (r.getInt(0), r.getInt(1).toLong))
      .map { case ((sub, c), rows) =>
        ((sub, c),
          rows.sortBy(_.getInt(2)).map(_.getLong(3).toDouble / 1e6).toSeq)
      }
    books.map { case (sub, c, bv) =>
      (sub, c, refit.getOrElse((sub, c), bv))
    }
  }

  /** Fixture embedding width — an ORACLE literal only (the generated
    * SQL needs plan-time slice bounds); the engine paths derive the
    * width from data ([[vecDimOf]]). */
  private val PqFixtureDim = 64

  /** Oracle subvector fan-out of the `e` CTE — one literal-sliced
    * branch per subspace (the [[pqSubVectors]] mirror). */
  private def pqSubCteSql(name: String, src: String, vcol: String,
      idCol: String, dim: Int): String = {
    val dsub = dim / PqM
    (0 until PqM).map { j =>
      s"  SELECT $idCol, $j AS sub, $vcol[${j * dsub + 1}:${(j + 1) * dsub}] AS sv FROM $src"
    }.mkString(s"$name AS (\n", "\n  UNION ALL\n", ")")
  }

  /** Oracle mirror of the PQ BUILD + ENCODE over the `e` CTE: `psv`
    * the subvector fan-out, `pb` the seed codebooks (entry c of
    * subspace j = subvector j of vector c — [[pqSeedBooks]]), `pcode`
    * the per-(vec, sub) entry assignment (cosine argmax, ties to the
    * larger entry — the cell-assignment rule text one tier down).
    * ONE rule text shared by q178/q179 so the build and serve
    * certificates can never drift on the code space. */
  private[queries] def pqEncodeCteSql(dim: Int): String =
    s"""${pqSubCteSql("psv", "e", "v", "vec_id", dim)},
       |pb AS (
       |  SELECT sub, CAST(vec_id AS BIGINT) AS c_id, sv AS bv
       |  FROM psv WHERE vec_id < $PqK),
       |${pqEncodeAgainstCteSql("pb", "")}""".stripMargin

  /** Oracle encode of every `psv` subvector against codebook CTE
    * `bookCte` → `pcode$suffix` — second half of [[pqEncodeCteSql]],
    * factored so the refresh certificate re-encodes against the refit
    * books with the SAME rule text. */
  private def pqEncodeAgainstCteSql(bookCte: String, suffix: String): String =
    s"""ps1$suffix AS (
       |  SELECT t.vec_id, t.sub, b.c_id,
       |    ${cosineSqlFor("t.sv", "b.bv")} AS cos
       |  FROM psv t JOIN $bookCte b ON b.sub = t.sub),
       |pa1$suffix AS (
       |  SELECT vec_id, sub, c_id, cos,
       |    row_number() OVER (PARTITION BY vec_id, sub
       |      ORDER BY cos DESC, c_id DESC) AS rn
       |  FROM ps1$suffix),
       |pcode$suffix AS (
       |  SELECT vec_id, sub, c_id AS c, cos FROM pa1$suffix WHERE rn = 1)""".stripMargin

  /** q178 — the PQ tier BUILD certified: one row per codebook entry
    * (sub, c_id) with its member count under the STORED codes, the
    * micro-unit mean reconstruction cosine of those members, and an
    * integer checksum of the stored entry itself — all three from
    * the stored `pq_books`/`cells_pq`/`cells` tables, hash-checked
    * against DuckDB re-deriving seeds, codes and cosines from raw
    * embeddings. A build that mis-sliced a subspace, mis-assigned one
    * code (kernel vs window-argmax drift) or wrote a stale codebook
    * diverges here. Scale: the audit reads index tables only; the
    * heavy leg is one map-side slice+dot per (vector, subspace). */
  def pqIndexCertify(s: SparkSession, dir: String): DataFrame = {
    def stored(t: String) = graft.queries.Warehouse.stored(s, dir, t)
    val books = stored("pq_books")
    books
      .select(col("sub"), col("c_id"),
        aggregate(transform(col("bv"), x => abs(floor(x * 1e6 + 0.5))),
          lit(0.0), (a, x) => a + x).cast("long").as("book_l1_micro"))
      .join(pqMemberStats(books, stored("cells_pq"), stored("cells")),
        Seq("sub", "c_id"), "left")
      .select(col("sub"), col("c_id"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        col("recon_cos_ppm"), col("book_l1_micro"))
      .orderBy("sub", "c_id")
  }

  /** Per codebook entry (sub, c_id): member count under the STORED
    * codes and the micro-unit mean reconstruction cosine of those
    * members — the shared body of the q178/q180 certificates (one
    * rule text, seed and refreshed stores). */
  private def pqMemberStats(books: DataFrame, cellsPq: DataFrame,
      cells: DataFrame): DataFrame = {
    val dsub = books.select(size(col("bv"))).head.getInt(0)
    val codes = cellsPq.select(col("vec_id"),
      posexplode(call_function("graft_pq_codes", col("code")))
        .as(Seq("sub", "c")))
    codes
      .join(cells.select(col("vec_id"), col("v")), Seq("vec_id"))
      .withColumn("sv", slice(col("v"), col("sub") * lit(dsub) + 1, lit(dsub)))
      .join(broadcast(books.select(col("sub"),
        col("c_id").cast("int").as("c"), col("bv"))), Seq("sub", "c"))
      .withColumn("svn", sqrt(dot(col("sv"), col("sv"))))
      .withColumn("bn", sqrt(dot(col("bv"), col("bv"))))
      .withColumn("cos", when(col("svn") * col("bn") === 0.0, lit(-2.0))
        .otherwise(dot(col("sv"), col("bv")) / (col("svn") * col("bn"))))
      .groupBy(col("sub"), col("c"))
      .agg(
        count(lit(1)).as("n_members"),
        floor(sum(floor(col("cos") * 1e6 + 0.5).cast("long")).cast("double")
          / count(lit(1)) + 0.5).cast("long").as("recon_cos_ppm"))
      .select(col("sub"), col("c").cast("long").as("c_id"),
        col("n_members"), col("recon_cos_ppm"))
  }

  val pqIndexCertifySql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |${pqEncodeCteSql(PqFixtureDim)},
       |pg AS (
       |  SELECT sub, c, CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(floor(CAST(sum(CAST(floor(cos * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) + 0.5) AS BIGINT) AS recon_cos_ppm
       |  FROM pcode GROUP BY sub, c)
       |SELECT pb.sub, pb.c_id,
       |  COALESCE(pg.n_members, 0) AS n_members,
       |  pg.recon_cos_ppm,
       |  CAST(list_sum(list_transform(pb.bv, x -> abs(floor(x * 1e6 + 0.5))))
       |    AS BIGINT) AS book_l1_micro
       |FROM pb LEFT JOIN pg ON pg.sub = pb.sub AND pg.c = pb.c_id
       |ORDER BY pb.sub, pb.c_id""".stripMargin

  /** q179 — the PQ serve CERTIFIED against the exact paths (the q157
    * certificate shape one bandwidth rung down; disjoint probe
    * battery [[PqQueryLo]]–[[PqQueryHi]]): per query
    *
    *  - `n_probed`           probed candidates (the IVF pruning);
    *  - `n_overlap_pq`       |ADC-ranked top-k ∩ exact FULL-scan
    *                         top-k| — what serving the 8-byte codes
    *                         alone would give;
    *  - `n_overlap_rescored` the same after full-precision rescore of
    *                         the top-[[PqRescoreR]] ADC window — what
    *                         the PQ serve actually returns;
    *  - `rescore_lossless`   served list == full-precision probed
    *                         top-k, order included (REPORTED, not
    *                         assumed: an 8-byte code ranks coarsely;
    *                         the rescore window is the recovery knob
    *                         and this column is its measurement).
    *
    * The oracle re-derives the IVF index, the seed codebooks, every
    * code, all probes, the two-level ADC sum (per-subspace partials
    * in subspace order — the kernel's exact addition order) and all
    * four leg rankings from raw embeddings in one statement. */
  def pqServeRecall(s: SparkSession, dir: String): DataFrame =
    pqServeRecallFrom(s, graft.queries.Warehouse.stored(s, dir, _))

  /** The three scored legs every PQ serve certificate ranks:
    * full-precision PROBED candidates, the ADC prefilter over the
    * same candidates, and the exact FULL-scan reference — one
    * derivation shared by q179/q184 (serve certificate) and q186
    * (rescore-depth sweep), so the certificates cannot drift on the
    * candidate algebra. */
  private final case class PqServeLegs(
      cand: DataFrame, pre: DataFrame, exact: DataFrame)

  private def pqRankWindow =
    org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)

  /** Per query: the ranked top-`limit` ids of a scored leg, as one
    * array row (rank order preserved). */
  private def pqTopIds(scored: DataFrame, limit: Int): DataFrame = scored
    .withColumn("rk", row_number().over(pqRankWindow))
    .filter(col("rk") <= limit)
    .groupBy("query_id")
    .agg(transform(
      sort_array(collect_list(struct(col("rk"), col("vec_id")))),
      x => x.getField("vec_id")).as("ids"))

  private def pqServeLegsFrom(s: SparkSession,
      stored: String => DataFrame): PqServeLegs = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val nprobe = AnnProbeN
    val books = collectPqBooks(stored("pq_books"))
    val ksub = books.length / books.map(_._1).distinct.length
    val bookVecs = books.map(_._3.toArray)
    val qs = stored("cells")
      .filter(col("vec_id").between(PqQueryLo, PqQueryHi))
      .select(col("vec_id"), col("v"), col("norm"))
      .collect().sortBy(_.getLong(0)).toSeq
      .map { r =>
        val v = r.getSeq[Double](1)
        (r.getLong(0), v, r.getDouble(2),
          graft.functions.PqOps.lut(bookVecs, ksub, v.toArray).toSeq)
      }.toDF("query_id", "qv", "qn", "lut")
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("c_id").desc)
    val qc = stored("centroids").join(broadcast(qs))
      .withColumn("cos_c", cosine(col("v"), col("qv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id").as("qc_query"), col("c_id").as("probe_cell"))
    // Full-precision probed candidates (query row excluded).
    val cand = stored("cells")
      .join(broadcast(qc), col("cell") === col("probe_cell"))
      .join(broadcast(qs), col("qc_query") === col("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", when(col("norm") * col("qn") === 0.0, lit(-2.0))
        .otherwise(dot(col("v"), col("qv")) / (col("norm") * col("qn"))))
      .select("query_id", "vec_id", "cos")
    // ADC prefilter over the same candidates, from the stored codes.
    val pre = stored("cells_pq")
      .join(broadcast(qc), col("cell") === col("probe_cell"))
      .join(broadcast(qs), col("qc_query") === col("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", when(col("norm") * col("qn") === 0.0, lit(-2.0))
        .otherwise(call_function("graft_pq_adc", col("code"), col("lut"))
          / (col("norm") * col("qn"))))
      .select("query_id", "vec_id", "cos")
    // Exact FULL-scan reference (all stored vectors, query excluded).
    val exact = stored("cells").join(broadcast(qs),
        col("vec_id") =!= col("query_id"))
      .withColumn("cos", when(col("norm") * col("qn") === 0.0, lit(-2.0))
        .otherwise(dot(col("v"), col("qv")) / (col("norm") * col("qn"))))
      .select("query_id", "vec_id", "cos")
    PqServeLegs(cand, pre, exact)
  }

  /** The top-k of `cand` RESTRICTED to the ADC window of depth `r` —
    * the PQ serve's selection at an explicit rescore depth. */
  private def pqServedAt(legs: PqServeLegs, r: Int): DataFrame =
    legs.cand.join(
      legs.pre.withColumn("rk", row_number().over(pqRankWindow))
        .filter(col("rk") <= r)
        .select(col("query_id").as("pq"), col("vec_id").as("pv")),
      col("query_id") === col("pq") && col("vec_id") === col("pv"),
      "left_semi")

  /** [[pqServeRecall]] over an explicit table accessor — ONE
    * certificate body for the seed store (q179) and the refreshed
    * store (q184). */
  private def pqServeRecallFrom(s: SparkSession,
      stored: String => DataFrame): DataFrame = {
    val k = AnnServeK
    val legs = pqServeLegsFrom(s, stored)
    val served = pqServedAt(legs, PqRescoreR)
    val nProbed = legs.cand.groupBy("query_id")
      .agg(count(lit(1)).as("n_probed"))
    pqTopIds(legs.exact, k).select(col("query_id"), col("ids").as("exact_ids"))
      .join(pqTopIds(legs.pre, k)
        .select(col("query_id"), col("ids").as("pq_ids")), Seq("query_id"))
      .join(pqTopIds(served, k)
        .select(col("query_id"), col("ids").as("served_ids")), Seq("query_id"))
      .join(pqTopIds(legs.cand, k)
        .select(col("query_id"), col("ids").as("probed_ids")), Seq("query_id"))
      .join(nProbed, Seq("query_id"))
      .select(col("query_id"), col("n_probed"),
        size(array_intersect(col("pq_ids"), col("exact_ids"))).cast("long")
          .as("n_overlap_pq"),
        size(array_intersect(col("served_ids"), col("exact_ids"))).cast("long")
          .as("n_overlap_rescored"),
        (col("served_ids") === col("probed_ids")).as("rescore_lossless"))
      .orderBy("query_id")
  }

  /** The q186 sweep's rescore depths: {k, 2k, 4k, 8k} of the serve's
    * top-[[AnnServeK]] — the bandwidth/recall pricing ladder (each
    * step doubles the full-precision rows the rescore re-reads). */
  private[queries] val PqSweepRs = Seq(1, 2, 4, 8).map(_ * AnnServeK)

  /** q186 — the PQ RESCORE-DEPTH knob measured (r17 verdict #4):
    * q179/q184 report honestly that the codebook refit is
    * served-recall-neutral on the isotropic fixture and that rescore
    * depth R is the recall knob — this certificate prices it. One
    * row per (query, R ∈ [[PqSweepRs]]): recall@k of the PQ serve at
    * window R against the exact full-scan top-k, plus whether R
    * already recovers the full-precision probed ranking verbatim.
    * Monotone in R BY CONSTRUCTION (a deeper ADC window only grows
    * the exact-rescored pool, and a pool member displaced from the
    * top-k is displaced by a strictly better exact cosine —
    * PqTierSpec pins the measured monotonicity), so a deployment
    * reads one column to trade ADC bandwidth against recall. The
    * oracle re-derives the index, codes, ADC windows and all four
    * depths from raw embeddings in one statement. */
  def pqRescoreSweep(s: SparkSession, dir: String): DataFrame = {
    val k = AnnServeK
    val legs = pqServeLegsFrom(s,
      graft.queries.Warehouse.stored(s, dir, _))
    val exactIds = pqTopIds(legs.exact, k)
      .select(col("query_id"), col("ids").as("exact_ids"))
    val probedIds = pqTopIds(legs.cand, k)
      .select(col("query_id"), col("ids").as("probed_ids"))
    PqSweepRs.map { r =>
      pqTopIds(pqServedAt(legs, r), k)
        .select(col("query_id"), col("ids").as("served_ids"))
        .join(exactIds, Seq("query_id"))
        .join(probedIds, Seq("query_id"))
        .select(col("query_id"), lit(r.toLong).as("rescore_r"),
          size(array_intersect(col("served_ids"), col("exact_ids")))
            .cast("long").as("n_overlap_rescored"),
          (col("served_ids") === col("probed_ids")).as("window_lossless"))
    }.reduce(_ unionByName _)
      .orderBy("query_id", "rescore_r")
  }

  /** The explicit left-to-right per-subspace ADC sum — the oracle's
    * mirror of [[graft.functions.PqOps.adc]]'s addition order (a
    * plain SUM() would aggregate in arbitrary order; doubles are not
    * associative). */
  private def pqAdcPivotSql: String =
    (0 until PqM).map(j => s"max(CASE WHEN sub = $j THEN lj END)")
      .reduceLeft((a, b) => s"($a + $b)")

  val pqServeRecallSql: String = pqServeCertSql("", "pcode", "pb")

  /** The q186 oracle: the SAME leg CTEs as q179 ([[pqServeLegsSql]] —
    * one rule text), finished with one branch per sweep depth. */
  val pqRescoreSweepSql: String = {
    val perR = PqSweepRs.map { r =>
      s"""ls$r AS (
         |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
         |    SELECT s0.query_id, s0.vec_id, row_number() OVER (
         |      PARTITION BY s0.query_id
         |      ORDER BY s0.cos DESC, s0.vec_id ASC) AS rk
         |    FROM cand s0 JOIN p8r
         |      ON p8r.query_id = s0.query_id AND p8r.vec_id = s0.vec_id
         |    WHERE p8r.rk <= $r)
         |  WHERE rk <= $AnnServeK GROUP BY query_id)""".stripMargin
    }.mkString(",\n")
    val branches = PqSweepRs.map { r =>
      s"""SELECT le.query_id, CAST($r AS BIGINT) AS rescore_r,
         |  CAST(len(list_intersect(ls$r.ids, le.ids)) AS BIGINT)
         |    AS n_overlap_rescored,
         |  (ls$r.ids = lpp.ids) AS window_lossless
         |FROM le
         |JOIN ls$r ON ls$r.query_id = le.query_id
         |JOIN lpp ON lpp.query_id = le.query_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${pqServeLegsSql("", "pcode", "pb")},
       |$perR
       |$branches
       |ORDER BY query_id, rescore_r""".stripMargin
  }

  /** The q179/q184 oracle statement over a parameterized code/book
    * CTE pair: `extraCtes` splices the refit chain for the refreshed
    * store's form. */
  private def pqServeCertSql(extraCtes: String, codeCte: String,
      bookCte: String): String =
    s"""${pqServeLegsSql(extraCtes, codeCte, bookCte)},
       |l8 AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM p8r
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |ls AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk FROM served0)
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |np AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_probed
       |  FROM cand GROUP BY query_id)
       |SELECT le.query_id, np.n_probed,
       |  CAST(len(list_intersect(l8.ids, le.ids)) AS BIGINT) AS n_overlap_pq,
       |  CAST(len(list_intersect(ls.ids, le.ids)) AS BIGINT) AS n_overlap_rescored,
       |  (ls.ids = lpp.ids) AS rescore_lossless
       |FROM le
       |JOIN l8 ON l8.query_id = le.query_id
       |JOIN ls ON ls.query_id = le.query_id
       |JOIN lpp ON lpp.query_id = le.query_id
       |JOIN np ON np.query_id = le.query_id
       |ORDER BY le.query_id""".stripMargin

  /** Every CTE through the ranked legs — candidates (`cand`), ADC
    * ranking (`p8r`), the [[PqRescoreR]]-window serve (`served0`),
    * exact full-scan top-k (`le`) and probed top-k (`lpp`) — shared
    * verbatim by the serve certificates (q179/q184) and the rescore
    * sweep (q186). */
  private def pqServeLegsSql(extraCtes: String, codeCte: String,
      bookCte: String): String =
    s"""WITH $cellAssignCteSql,
       |sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM a WHERE rn = 1),
       |${pqEncodeCteSql(PqFixtureDim)},$extraCtes
       |cqe AS (
       |  SELECT vec_id AS query_id, v AS qv, norm AS qn FROM sig
       |  WHERE vec_id BETWEEN $PqQueryLo AND $PqQueryHi),
       |${pqSubCteSql("qsv", "cqe", "qv", "query_id", PqFixtureDim)},
       |qc AS (
       |  SELECT query_id, probe_cell FROM (
       |    SELECT cqe.query_id, c.c_id AS probe_cell,
       |      row_number() OVER (PARTITION BY cqe.query_id
       |        ORDER BY ${cosineSqlFor("c.qv", "cqe.qv")} DESC, c.c_id DESC) AS rn
       |    FROM c, cqe) WHERE rn <= $AnnProbeN),
       |cand AS (
       |  SELECT qc.query_id, sig.vec_id,
       |    CASE WHEN sig.norm * cqe.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, cqe.qv) / (sig.norm * cqe.qn)
       |      END AS cos
       |  FROM sig
       |  JOIN qc ON sig.cell = qc.probe_cell
       |  JOIN cqe ON cqe.query_id = qc.query_id
       |  WHERE sig.vec_id <> qc.query_id),
       |lp AS (
       |  SELECT qc.query_id, sig.vec_id, pc.sub,
       |    list_inner_product(pbk.bv, qsv.sv) AS lj
       |  FROM sig
       |  JOIN qc ON sig.cell = qc.probe_cell
       |  JOIN $codeCte pc ON pc.vec_id = sig.vec_id
       |  JOIN $bookCte pbk ON pbk.sub = pc.sub AND pbk.c_id = pc.c
       |  JOIN qsv ON qsv.query_id = qc.query_id AND qsv.sub = pc.sub
       |  WHERE sig.vec_id <> qc.query_id),
       |adc AS (
       |  SELECT query_id, vec_id, $pqAdcPivotSql AS dotpq
       |  FROM lp GROUP BY query_id, vec_id),
       |p8 AS (
       |  SELECT a2.query_id, a2.vec_id,
       |    CASE WHEN s2.norm * cqe.qn = 0 THEN -2.0
       |      ELSE a2.dotpq / (s2.norm * cqe.qn) END AS cos
       |  FROM adc a2
       |  JOIN sig s2 ON s2.vec_id = a2.vec_id
       |  JOIN cqe ON cqe.query_id = a2.query_id),
       |p8r AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM p8),
       |served0 AS (
       |  SELECT cand.query_id, cand.vec_id, cand.cos
       |  FROM cand JOIN p8r
       |    ON p8r.query_id = cand.query_id AND p8r.vec_id = cand.vec_id
       |  WHERE p8r.rk <= $PqRescoreR),
       |ex AS (
       |  SELECT cqe.query_id, sig.vec_id,
       |    CASE WHEN sig.norm * cqe.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, cqe.qv) / (sig.norm * cqe.qn)
       |      END AS cos
       |  FROM sig, cqe WHERE sig.vec_id <> cqe.query_id),
       |le AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk FROM ex)
       |  WHERE rk <= $AnnServeK GROUP BY query_id),
       |lpp AS (
       |  SELECT query_id, list(vec_id ORDER BY rk) AS ids FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rk FROM cand)
       |  WHERE rk <= $AnnServeK GROUP BY query_id)""".stripMargin

  /** Sequential PQ serve — the unified kernel with the 8-byte tier
    * ([[AnnServeOpts]] pq = true): ADC prefilter over `cells_pq`,
    * exact rescore of the top-[[PqRescoreR]] survivors. Filtered /
    * batch / tombstoned forms compose through [[serve]] like every
    * other cell of the matrix. */
  def annServePq(s: SparkSession, dir: String, queryVec: Seq[Double],
      nprobe: Int, k: Int, rescore: Int = PqRescoreR): DataFrame =
    singleServe(serve(s, dir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, rescore = Some(rescore), pq = true)),
      filtered = false)

  /** [[annServePq]] against an explicit warehouse directory. */
  def annServePqFrom(s: SparkSession, whDir: String,
      queryVec: Seq[Double], nprobe: Int, k: Int,
      rescore: Int = PqRescoreR): DataFrame =
    singleServe(serveFrom(s, whDir, Seq((0L, queryVec)),
      AnnServeOpts(nprobe, k, rescore = Some(rescore), pq = true)),
      filtered = false)

  /** Batched PQ serve against an explicit warehouse — the corpus
    * bench's stage form (one job per request population through the
    * 8-byte tier, the q162 discipline on the PQ rung). */
  def annServePqBatchFrom(s: SparkSession, whDir: String,
      requests: Seq[(Long, Seq[Double])], nprobe: Int, k: Int,
      rescore: Int = PqRescoreR): DataFrame =
    serveFrom(s, whDir, requests,
      AnnServeOpts(nprobe, k, rescore = Some(rescore), pq = true))

  private val pqRefreshedWh =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The memoized PQ-REFRESHED fixture store: full warehouse build,
    * then one [[graft.queries.Warehouse.refreshPq]] refit — the
    * quantizer analogue of [[ensureSplit]]. */
  private[queries] def ensurePqRefreshed(s: SparkSession, dir: String): String =
    pqRefreshedWh.computeIfAbsent(dir, _ => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-pqrefresh-wh").toString
      graft.queries.Warehouse.build(s, dir, wh)
      graft.queries.Warehouse.refreshPq(s, wh)
      wh
    })

  /** q180 — the PQ REFRESH certified (the q141 refresh discipline at
    * the quantizer grain): after one [[graft.queries.Warehouse.refreshPq]]
    * refit, every codebook entry's member count and mean
    * reconstruction cosine under the RE-ENCODED stored codes, plus
    * the micro-unit drift of the entry from its seed — all from the
    * refreshed store's tables, hash-checked against DuckDB
    * re-deriving seeds → codes → micro-unit means (carry-forward on
    * empty entries) → re-encode from raw embeddings. A refit that
    * averaged one wrong member, dropped an empty entry, or re-encoded
    * against stale books diverges here. CellSplitSpec-style quality
    * claims (mean recon non-decreasing) live in PqTierSpec. */
  def pqRefreshCertify(s: SparkSession, dir: String): DataFrame = {
    val wh = ensurePqRefreshed(s, dir)
    def at(t: String) = graft.queries.Warehouse.read(s, wh, t)
    val books = at("pq_books")
    val cells = at("cells")
    val dsub = books.select(size(col("bv"))).head.getInt(0)
    // Seed entries re-derived from the stored cells (entry c of
    // subspace j = subvector j of vector c) — the drift baseline.
    val m = books.select(col("sub")).distinct().count().toInt
    val seeds = cells.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("c_id"),
        posexplode(array((0 until m).map(j =>
          slice(col("v"), j * dsub + 1, dsub)): _*)).as(Seq("sub", "seed_bv")))
    val drift = books.join(seeds, Seq("sub", "c_id"))
      .select(col("sub"), col("c_id"),
        posexplode(zip_with(col("bv"), col("seed_bv"),
          (a, b) => abs(floor(a * 1e6 + 0.5) - floor(b * 1e6 + 0.5))))
          .as(Seq("pos", "d")))
      .groupBy(col("sub"), col("c_id"))
      .agg(max(col("d")).cast("long").as("drift_micro"))
    books.select(col("sub"), col("c_id"))
      .join(pqMemberStats(books, at("cells_pq"), cells),
        Seq("sub", "c_id"), "left")
      .join(drift, Seq("sub", "c_id"))
      .select(col("sub"), col("c_id"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        col("recon_cos_ppm"), col("drift_micro"))
      .orderBy("sub", "c_id")
  }

  /** Oracle refit: micro-unit means of `pcode`'s members per (sub,
    * entry, pos) — the [[graft.queries.Warehouse.refreshSemantic]]
    * arithmetic one tier down — carry-forward on empty entries →
    * refit books `pr`. */
  private val pqRefitCteSql: String =
    s"""px AS (
       |  SELECT p.sub, p.c, CAST(i - 1 AS INTEGER) AS pos, t.sv[i] AS x
       |  FROM pcode p
       |  JOIN psv t ON t.vec_id = p.vec_id AND t.sub = p.sub,
       |  LATERAL (SELECT unnest(generate_series(1, len(t.sv))) AS i) r),
       |pm AS (
       |  SELECT sub, c, pos, count(*) AS n,
       |    CAST(floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) + 0.5) AS BIGINT) AS mean_micro
       |  FROM px GROUP BY sub, c, pos),
       |bm AS (
       |  SELECT sub, c AS c_id, list(mean_micro / 1000000.0 ORDER BY pos) AS bv
       |  FROM pm GROUP BY sub, c),
       |pr AS (
       |  SELECT pb.sub, pb.c_id, COALESCE(bm.bv, pb.bv) AS bv
       |  FROM pb LEFT JOIN bm ON bm.sub = pb.sub AND bm.c_id = pb.c_id)""".stripMargin

  val pqRefreshCertifySql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |${pqEncodeCteSql(PqFixtureDim)},
       |$pqRefitCteSql,
       |${pqEncodeAgainstCteSql("pr", "2")},
       |pg AS (
       |  SELECT sub, c, CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(floor(CAST(sum(CAST(floor(cos * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) + 0.5) AS BIGINT) AS recon_cos_ppm
       |  FROM pcode2 GROUP BY sub, c),
       |dz AS (
       |  SELECT pr.sub, pr.c_id,
       |    CAST(max(abs(floor(pr.bv[i] * 1e6 + 0.5)
       |      - floor(pb.bv[i] * 1e6 + 0.5))) AS BIGINT) AS drift_micro
       |  FROM pr
       |  JOIN pb ON pb.sub = pr.sub AND pb.c_id = pr.c_id,
       |  LATERAL (SELECT unnest(generate_series(1, len(pr.bv))) AS i) r
       |  GROUP BY pr.sub, pr.c_id)
       |SELECT pr.sub, pr.c_id,
       |  COALESCE(pg.n_members, 0) AS n_members,
       |  pg.recon_cos_ppm, dz.drift_micro
       |FROM pr
       |LEFT JOIN pg ON pg.sub = pr.sub AND pg.c = pr.c_id
       |JOIN dz ON dz.sub = pr.sub AND dz.c_id = pr.c_id
       |ORDER BY pr.sub, pr.c_id""".stripMargin

  // ---- q183: SNAPSHOT time-travel serve (r17) -------------------------

  /** Serve AT an explicit retained snapshot version — the
    * reproducibility seam: pin the version a training run read, and
    * any query replays against it byte for byte regardless of the
    * merges, refreshes or deletes committed since (within the store's
    * retention window; [[graft.queries.Warehouse.setRetention]] widens
    * it). Tombstones resolve AT that version, so a pre-delete snapshot
    * replays WITH the later-deleted vectors — exactly what "which
    * corpus trained run X" needs. Every [[AnnServeOpts]] cell
    * composes, same as [[serveFrom]]. */
  def serveAt(s: SparkSession, whDir: String, ver: Long,
      requests: Seq[(Long, Seq[Double])], opts: AnnServeOpts): DataFrame =
    annServeUnified(s,
      graft.queries.Warehouse.readAt(s, whDir, _, ver),
      requests, opts,
      graft.queries.Warehouse.vecTombstonesAt(s, whDir, ver))

  /** [[cellAssignCteSql]] with prefixed CTE names and an `e` filter —
    * the q183 oracle runs TWO full assignment chains (standing vs
    * merged corpus state) in one statement. */
  private def cellAssignCteSqlFor(prefix: String, eWhere: String): String =
    s"""${prefix}e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings$eWhere),
       |${prefix}c AS (SELECT vec_id AS c_id, v AS qv FROM ${prefix}e WHERE vec_id < $CentroidK),
       |${prefix}s AS (
       |  SELECT e.vec_id, c.c_id, e.v, $cosineSql AS cos
       |  FROM ${prefix}e e, ${prefix}c c),
       |${prefix}a AS (
       |  SELECT vec_id, v, c_id AS cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id DESC) AS rn
       |  FROM ${prefix}s)""".stripMargin

  /** [[annRequestProbeCteSql]] with prefixed names — second half of
    * the q183 dual-leg oracle. */
  private def annRequestProbeCteSqlFor(prefix: String, vecId: Long,
      nprobe: Int): String =
    s"""${prefix}sig AS (
       |  SELECT vec_id, v, cell, sqrt(list_inner_product(v, v)) AS norm
       |  FROM ${prefix}a WHERE rn = 1),
       |${prefix}aqp AS (SELECT v AS quv, sqrt(list_inner_product(v, v)) AS qn
       |        FROM ${prefix}e WHERE vec_id = $vecId),
       |${prefix}aqc AS (
       |  SELECT c_id AS probe_cell FROM ${prefix}c c, ${prefix}aqp aqp
       |  ORDER BY ${cosineSqlFor("c.qv", "aqp.quv")} DESC, c_id DESC
       |  LIMIT $nprobe),
       |${prefix}aqcand AS (
       |  SELECT sig.vec_id, sig.cell,
       |    CASE WHEN sig.norm * aqp.qn = 0 THEN -2.0
       |      ELSE list_inner_product(sig.v, aqp.quv) / (sig.norm * aqp.qn)
       |      END AS cos
       |  FROM ${prefix}sig sig JOIN ${prefix}aqc aqc ON sig.cell = aqc.probe_cell, ${prefix}aqp aqp)""".stripMargin

  /** q183 — the snapshot time-travel serve CERTIFIED: the q150
    * request replayed against BOTH retained versions of the q139
    * fixture store (v1 = the standing build without today's batches,
    * v2 = the all-grain merge), one stage-labeled ranking each. The
    * oracle re-derives both corpus states from raw embeddings — the
    * standing leg assigns over the corpus MINUS the q126 new-vector
    * slice, the merged leg over all of it (legitimate because the
    * centroid seeds live below the slice boundary: the very invariant
    * q139 certifies) — so a time-travel read that leaked one new
    * vector into the old snapshot, or served the old index under the
    * new pointer, hash-mismatches. The reproducibility claim in one
    * certificate: version pinning replays the EXACT pre-merge
    * ranking after the store moved on. */
  def snapshotServe(s: SparkSession, dir: String): DataFrame = {
    val wh = graft.queries.Warehouse.fullMergedFixture(s, dir)
    val v2 = graft.queries.Warehouse.version(wh)
    val v1 = v2 - 1
    val qv = graft.queries.Warehouse.readAt(s, wh, "cells", v1)
      .filter(col("vec_id") === lit(ParamQueryVecId))
      .select(col("v")).head.getSeq[Double](0)
    def leg(ver: Long, label: String): DataFrame =
      serveAt(s, wh, ver, Seq((0L, qv)),
        AnnServeOpts(ParamNprobe, ParamAnnK))
        .select(lit(label).as("stage"), col("rank"), col("vec_id"),
          col("cell"), col("cosine"))
    leg(v1, "standing").unionByName(leg(v2, "merged"))
      .orderBy("stage", "rank")
  }

  val snapshotServeSql: String = {
    val newVec = s" WHERE vec_id % $IncrSemMod <> ${IncrSemMod - 1}"
    def legSelect(prefix: String, label: String): String =
      s"""SELECT '$label' AS stage, rank, vec_id, cell, cosine FROM (
         |    SELECT row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank,
         |      vec_id, cell, round(cos, 6) AS cosine
         |    FROM ${prefix}aqcand) WHERE rank <= $ParamAnnK""".stripMargin
    s"""WITH ${cellAssignCteSqlFor("m1", newVec)},
       |${annRequestProbeCteSqlFor("m1", ParamQueryVecId, ParamNprobe)},
       |${cellAssignCteSqlFor("m2", "")},
       |${annRequestProbeCteSqlFor("m2", ParamQueryVecId, ParamNprobe)}
       |${legSelect("m1", "standing")}
       |UNION ALL
       |${legSelect("m2", "merged")}
       |ORDER BY stage, rank""".stripMargin
  }

  /** q184 — the PQ serve certified on the REFRESHED store (the
    * production configuration: [[graft.queries.Warehouse.refreshPq]]
    * then serve): the q179 certificate body verbatim, reading the
    * refit books and re-encoded codes, with the oracle re-deriving
    * seeds → codes → carry-forward micro means → re-encode → ADC
    * serve from raw embeddings in one statement. Read q179 and q184
    * side by side for the refresh's effect on served recall — both
    * REPORTED, neither assumed. */
  def pqRefreshServe(s: SparkSession, dir: String): DataFrame =
    pqServeRecallFrom(s,
      graft.queries.Warehouse.read(s, ensurePqRefreshed(s, dir), _))

  val pqRefreshServeSql: String = pqServeCertSql(
    "\n" + pqRefitCteSql + ",\n" + pqEncodeAgainstCteSql("pr", "2") + ",",
    "pcode2", "pr")
}
