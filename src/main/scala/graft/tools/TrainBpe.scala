package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Train the q104 BPE piece table (r16 verdict #6) and write it as a
  * committed artifact in the vocab.txt convention (one piece per
  * line, rank order, `#` comments).
  *
  * Standard byte-pair-encoding merges, fully deterministic:
  * lowercase whitespace words with frequencies; start from single
  * characters; each round merge the most frequent adjacent symbol
  * pair (ties to the lexicographically smallest merged string),
  * stopping at `MaxPieces` merges or when the best pair drops under
  * `MinCount`. One deliberate bound: a merge whose result exceeds
  * [[MaxPieceLen]] characters is skipped — the `graft_subwords`
  * kernel's longest-match window is 4, so the table it consumes caps
  * there (a production table swaps the constant and widens the
  * kernel window together).
  *
  *   sbt "runMain graft.tools.TrainBpe /root/testdata/sf0.01 \
  *     src/main/resources/graft/bpe_pieces.txt"
  */
object TrainBpe {

  val MaxPieces = 60
  val MaxPieceLen = 4
  val MinCount = 2L

  /** Deterministic BPE over a word-frequency table; returns the merge
    * results in rank (creation) order. */
  private[tools] def train(words: Seq[(String, Long)], maxPieces: Int,
      maxLen: Int, minCount: Long): Seq[String] = {
    var seqs: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val pieces = mutable.ArrayBuffer[String]()
    var done = false
    while (pieces.size < maxPieces && !done) {
      val pairCounts = mutable.Map[(String, String), Long]()
      seqs.foreach { case (syms, c) =>
        if (syms.length >= 2)
          syms.iterator.zip(syms.iterator.drop(1)).foreach { case (a, b) =>
            if ((a + b).length <= maxLen)
              pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
          }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // Tie key includes the LEFT symbol: two distinct pairs can
        // share both the count and the concatenation ((a, bc) vs
        // (ab, c)), and HashMap iteration order must never decide a
        // committed artifact.
        val ((a, b), cnt) = pairCounts.toSeq
          .minBy { case ((x, y), c) => (-c, x + y, x) }
        if (cnt < minCount) done = true
        else {
          pieces += (a + b)
          seqs = seqs.map { case (syms, c) =>
            val out = mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toVector -> c
          }
        }
      }
    }
    pieces.distinct.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out =
      if (args.length > 1) args(1)
      else "src/main/resources/graft/bpe_pieces.txt"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-train-bpe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val words = graft.core.Tables.documents(spark, dir)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (w, n) => (-n, w) }.toSeq
      val pieces = train(words, MaxPieces, MaxPieceLen, MinCount)
      val header = Seq(
        "# graft BPE piece table — trained by graft.tools.TrainBpe",
        s"# corpus: $dir (lowercase whitespace words)",
        s"# standard most-frequent-pair merges, lexicographic ties,",
        s"# piece length <= $MaxPieceLen (the graft_subwords window),",
        s"# stop at $MaxPieces merges or pair count < $MinCount.",
        "# One piece per line, rank (creation) order.")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (header ++ pieces).mkString("\n").concat("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote ${pieces.size} pieces to $out")
    } finally spark.stop()
  }
}
