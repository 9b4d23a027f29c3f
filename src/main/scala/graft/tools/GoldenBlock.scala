package graft.tools

/** The one block whose numbers the reference notebook documents
  * (`prepare_data_batch.ipynb:317,373,882`): event sequence (31
  * lines), feature counts E3=8 E4=4 E5=3 E9=3 E11=3 E21=3 E22=1
  * E23=3 E26=3, session 2008-11-10 01:19:42 → 10:36:17, duration
  * 33395 s, label Normal.
  *
  * The raw Loghub dataset is not redistributed, so the 31 raw lines
  * are synthesized here from the real 29-template dimension — each
  * message instantiates exactly its intended template (GoldenBatchSpec
  * guards that the match is unambiguous among all 29, so the counts
  * hold under any tie order). ONE definition shared by the committed
  * driver fixture (`MakeLogFixture` embeds these lines in
  * `data/hdfs_synth.log`, putting the numbers under the driver's
  * DuckDB oracle via q61/q62) and by GoldenBatchSpec's in-memory
  * pipeline assertions — the fixture and the spec cannot drift apart.
  */
object GoldenBlock {

  val BlockId = "blk_-1001138135617662562"
  val Date = "081110"
  val Label = "Normal"

  /** The notebook's stored event sequence, time order. */
  val EventSeq: Seq[String] = Seq(
    "E22", "E5", "E5", "E5", "E11", "E9", "E11", "E9", "E26", "E26", "E26",
    "E11", "E9", "E3", "E3", "E4", "E3", "E3", "E4", "E23", "E23", "E23",
    "E3", "E3", "E4", "E3", "E3", "E4", "E21", "E21", "E21")

  /** The notebook's stored feature row (absent ids are 0). */
  val FeatureCounts: Map[String, Int] = Map(
    "E3" -> 8, "E4" -> 4, "E5" -> 3, "E9" -> 3, "E11" -> 3,
    "E21" -> 3, "E22" -> 1, "E23" -> 3, "E26" -> 3)

  /** 01:19:42 and 10:36:17 on 2008-11-10 — span = the golden 33395 s. */
  val StartSecOfDay = 4782
  val EndSecOfDay = 38177
  val DurationSec = 33395L

  /** A realistic raw message for each event id the golden block uses. */
  def message(eid: String, blk: String): String = eid match {
    case "E3"  => s"Served block $blk to /10.251.30.8"
    case "E4"  => s"Got exception while serving $blk to /10.251.30.8:"
    case "E5"  => s"Receiving block $blk src: /10.250.10.6:54106 dest: /10.250.10.6:50010"
    case "E9"  => s"Received block $blk of size 67108864 from /10.250.10.6"
    case "E11" => s"PacketResponder 1 for block $blk terminating"
    case "E21" => s"Deleting block $blk file /mnt/hadoop/dfs/data/current/$blk"
    case "E22" => s"BLOCK* NameSystem.allocateBlock: /user/root/rand/_temporary/part-00123. $blk"
    case "E23" => s"BLOCK* NameSystem.delete: $blk is added to invalidSet of 10.250.10.6:50010"
    case "E26" => s"BLOCK* NameSystem.addStoredBlock: blockMap updated: 10.250.10.6:50010 is added to $blk size 67108864"
  }

  def component(eid: String): (String, String, String) = eid match {
    case "E22" | "E23" | "E26" => ("26", "INFO", "dfs.FSNamesystem")
    case "E21"                 => ("30", "INFO", "dfs.DataNode")
    case "E11" | "E9"          => ("145", "INFO", "dfs.DataNode$PacketResponder")
    case "E4"                  => ("201", "WARN", "dfs.DataNode$DataXceiver")
    case _                     => ("143", "INFO", "dfs.DataNode$DataXceiver")
  }

  private def hhmmss(secOfDay: Int): String =
    f"${secOfDay / 3600}%02d${secOfDay / 60 % 60}%02d${secOfDay % 60}%02d"

  def rawLine(eid: String, blk: String, secOfDay: Int): String = {
    val (pid, level, comp) = component(eid)
    s"$Date ${hhmmss(secOfDay)} $pid $level $comp: ${message(eid, blk)}"
  }

  /** The 31 raw lines, strictly increasing timestamps in golden-
    * sequence order, first at StartSecOfDay, last at EndSecOfDay. */
  val Lines: Seq[String] = EventSeq.zipWithIndex.map { case (eid, i) =>
    rawLine(eid, BlockId,
      if (i == EventSeq.length - 1) EndSecOfDay else StartSecOfDay + i * 1100)
  }
}
