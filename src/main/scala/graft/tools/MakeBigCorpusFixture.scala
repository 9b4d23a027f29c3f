package graft.tools

import scala.util.Random

import org.apache.spark.sql.SparkSession

/** Spark-parallel generator for the CORPUS-scale dedup fixture
  * (round-13 verdict #3): a `documents` table at ~100 MB / ~1 GB of
  * raw text with PLANTED near-duplicates, so the q27→q49→q92 chain
  * (the warehouse doc-grain build) can be exercised and attributed at
  * the reference's own input magnitude instead of sf0.1.
  *
  * Generation is one seeded RNG stream per document derived from the
  * doc's SEED id (splitmix-decorrelated, the MakeBigLogFixture
  * discipline), fully parallel, deterministic: same (outRoot, nDocs,
  * seed) → same corpus.
  *
  * Planted structure: docs with `id % 10 ∈ {7, 9}` re-generate the
  * text of `id − (id % 10)` (the cluster BASE) and append one
  * distinct perturbation token — shingle Jaccard ≈ 0.99 against the
  * base, so the 2×4 MinHash banding detects them with near-certainty.
  * Every base at `id % 10 = 0` thus anchors a 3-member near-dup
  * cluster {id, id+7, id+9}; 20% of the corpus is duplicated and the
  * expected purge is 2 docs per cluster — known ground truth the
  * bench sanity-checks (purge rows ≈ 0.2 · nDocs).
  *
  * Vocabulary is 30k tokens at 120–179 words/doc (~1 KB raw text per
  * doc): 10⁵ docs ≈ 10⁸ B. `source` follows the fixture's
  * `src<id % 20>` contract so the chain's quality/purge rules apply
  * unchanged.
  */
object MakeBigCorpusFixture {

  final case class Fixture(dir: String, nDocs: Long, textBytes: Long,
      parquetBytes: Long, genSec: Double)

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic 32-d embedding for vector `id` (one seeded stream
    * per vector, like [[docText]]). Vectors with `id % 10 ∈ {7, 9}`
    * re-generate the BASE vector `id − (id % 10)` and perturb one
    * coordinate by 1% — cosine ≈ 0.9999 against the base, so the
    * semantic chain (cells → sem_purge) sees the same planted
    * 3-member cluster structure the text side has. */
  private[tools] def vecOf(seed: Long, id: Long): Array[Float] = {
    val dup = id % 10 == 7 || id % 10 == 9
    val seedId = if (dup) id - (id % 10) else id
    val rng = new Random(splitmix(seed * 7654321L + seedId))
    val v = Array.fill(32)(rng.nextFloat() * 2f - 1f)
    if (dup) v((id % 97).toInt % 32) += 0.01f
    v
  }

  private[tools] def docText(seed: Long, id: Long): String = {
    val dup = id % 10 == 7 || id % 10 == 9
    val seedId = if (dup) id - (id % 10) else id
    val rng = new Random(splitmix(seed * 1000003L + seedId))
    val n = 120 + rng.nextInt(60)
    val sb = new StringBuilder(n * 7)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append('w').append(rng.nextInt(30000))
      j += 1
    }
    // One distinct perturbation token per copy: near-dup, not exact.
    if (dup) sb.append(" dupmark").append(id % 97)
    sb.toString
  }

  /** Generate (or reuse via the metadata marker) the corpus fixture
    * under `outRoot`; reuse key embeds nDocs AND seed. */
  def ensure(spark: SparkSession, outRoot: String, nDocs: Long,
      seed: Long = 20263L, parts: Int = 32): Fixture = {
    val dir = s"$outRoot/corpus_${nDocs}_s$seed"
    val table = s"$dir/documents.parquet"
    val metaPath = java.nio.file.Paths.get(s"$dir/_GRAFT_META")
    val done = java.nio.file.Files.isRegularFile(metaPath)
    val t0 = System.nanoTime()
    val textBytes: Long =
      if (done) java.nio.file.Files.readString(metaPath).trim.toLong
      else {
        import spark.implicits._
        val sc = spark.sparkContext
        sc.range(0L, nDocs, numSlices = parts)
          .map(id => (id, s"src${id % 20}", docText(seed, id)))
          .toDF("doc_id", "source", "text")
          .write.mode("overwrite").parquet(table)
        val counted = spark.read.parquet(table)
          .selectExpr("CAST(sum(length(text)) AS BIGINT)")
          .first().getLong(0)
        // Marker written AFTER the data = completion flag (a crash
        // mid-generation never leaves a reusable dir).
        java.nio.file.Files.writeString(metaPath, counted.toString)
        counted
      }
    // Embeddings (round-14: the full-warehouse/curation bench needs the
    // semantic grain): n/100 vectors, vec_id k ↔ doc_id k (the leading
    // slice of the corpus carries an embedding — the curation flag
    // join's vec_id→doc_id contract), same planted near-dup structure
    // at the vector grain. Own marker so pre-round-14 fixture dirs
    // upgrade in place.
    val embTable = s"$dir/embeddings.parquet"
    val embMeta = java.nio.file.Paths.get(s"$dir/_GRAFT_META_EMB")
    if (!java.nio.file.Files.isRegularFile(embMeta)) {
      import spark.implicits._
      val sc = spark.sparkContext
      sc.range(0L, nDocs / 100, numSlices = parts)
        .map(id => (id, vecOf(seed, id), (id % 3).toInt))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(embTable)
      java.nio.file.Files.writeString(embMeta, (nDocs / 100).toString)
    }
    val genSec = (System.nanoTime() - t0) / 1e9
    val files = Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    Fixture(dir, nDocs, textBytes, files.map(_.length()).sum,
      if (done) 0.0 else genSec)
  }

  def main(args: Array[String]): Unit = {
    val outRoot = if (args.nonEmpty) args(0) else "/tmp/graft_corpus"
    val nDocs = if (args.length > 1) args(1).toLong else 120000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-make-big-corpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val f = ensure(spark, outRoot, nDocs)
    println(f"[big-corpus] docs=${f.nDocs} text=${f.textBytes / 1048576.0}%.1f MiB " +
      f"parquet=${f.parquetBytes / 1048576.0}%.1f MiB gen=${f.genSec}%.1f s -> ${f.dir}")
    spark.stop()
  }
}
