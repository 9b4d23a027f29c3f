package graft.tools

import scala.util.Random

/** The raw-log line shapes shared by the two fixture generators:
  * `MakeLogFixture` (the small committed driver fixture — sequential,
  * one RNG for the whole file) and `MakeBigLogFixture` (the scale
  * fixture — Spark-parallel, one RNG stream per block). All functions
  * take the RNG explicitly so the committed fixture's draw sequence is
  * EXACTLY what it was before the extraction (verified by regenerating
  * and diffing against the committed bytes).
  */
private[tools] object LogSynth {

  val components: Vector[(String, String)] = Vector(
    ("dfs.DataNode$DataXceiver", "143"), ("dfs.FSNamesystem", "26"),
    ("dfs.DataNode$PacketResponder", "145"), ("dfs.DataNode", "30"),
    ("dfs.DataBlockScanner", "13"), ("dfs.FSDataset", "81"))

  val dates: Vector[String] = Vector("081109", "081110", "081111")

  def ip(rng: Random): String =
    s"10.25${rng.nextInt(2)}.${rng.nextInt(200)}.${rng.nextInt(250)}"

  def filler(rng: Random): String = rng.nextInt(6) match {
    case 0 => s" /${ip(rng)}:5${1000 + rng.nextInt(9000)} "
    case 1 => s" ${33554432 + rng.nextInt(33554432)} "
    case 2 => s" /mnt/hadoop/dfs/data/current/subdir${rng.nextInt(64)} "
    case 3 => s" ${ip(rng)}:50010 "
    case 4 => s" ${rng.nextInt(9)} "
    case 5 => " "
  }

  /** Instantiate a template's `[*]` holes; hole `blkHole` carries the
    * block token. */
  def instantiate(rng: Random, pattern: String, blockId: String): String = {
    val segs = pattern.split("\\[\\*\\]", -1)
    val holes = segs.length - 1
    val blkHole = if (holes >= 2) 1 else 0
    val sb = new StringBuilder
    var i = 0
    while (i < segs.length) {
      sb.append(segs(i))
      if (i < holes) {
        if (i == blkHole) sb.append(s" $blockId ").append(
          if (rng.nextBoolean()) "" else filler(rng).trim + " ")
        else sb.append(filler(rng))
      }
      i += 1
    }
    sb.toString
  }

  def hhmmss(sec: Int): String = {
    val s = math.min(sec, 86399)
    f"${s / 3600}%02d${s / 60 % 60}%02d${s % 60}%02d"
  }

  def rawLine(rng: Random, date: String, sec: Int,
      tmpl: (String, String), blockId: String): String = {
    val (comp, pid0) = components(rng.nextInt(components.length))
    val pid = if (rng.nextBoolean()) pid0 else (1 + rng.nextInt(998)).toString
    val level = if (rng.nextInt(12) == 0) "WARN" else "INFO"
    s"$date ${hhmmss(sec)} $pid $level $comp: ${instantiate(rng, tmpl._2, blockId)}"
  }

  /** Blockless-but-parseable noise (dropped by the P4 filter). */
  def noiseLine(rng: Random, date: String): String = {
    val (comp, pid) = components(rng.nextInt(components.length))
    s"$date ${hhmmss(rng.nextInt(86400))} $pid INFO $comp: heartbeat from ${ip(rng)} ok seq ${rng.nextInt(100000)}"
  }

  /** Unparseable garbage (NULL datetime, blockless). */
  def garbageLine(rng: Random): String =
    s"#### corrupted segment ${rng.nextInt(100000)} ####"

  /** Read the `EventId,EventTemplate` dimension without a SparkSession. */
  def readTemplates(path: String): Vector[(String, String)] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().drop(1).map { l =>
      val i = l.indexOf(','); (l.substring(0, i), l.substring(i + 1))
    }.toVector
    finally src.close()
  }
}
