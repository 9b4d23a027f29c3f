package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation — the missing half of every LSH dedup pipeline:
  * candidate PAIRS (q28/q45) are not yet duplicate GROUPS, because
  * near-duplication chains (A~B, B~C ⇒ {A,B,C} even when A·C is
  * below threshold). Clustering the candidate graph and keeping one
  * canonical doc per component is how a 100 TB corpus actually gets
  * deduplicated.
  *
  * Algorithm: every vertex starts labeled with itself; each round
  * takes the min label over its neighborhood (one join + one
  * map-side-combined min aggregation = 2 shuffles/round) until a
  * round changes nothing. Rounds needed = graph diameter, and LSH
  * dup-graphs are short star-chains (diameter ≤ ~log n in practice;
  * GraphX/Pregel and the large-star/small-star algorithm of
  * Kiveris et al. have the same join shape, just fancier edge
  * rewiring to shrink the diameter — worth swapping in if profiles
  * ever show deep chains).
  *
  * Each round `localCheckpoint`s the new labels: the iterative plan
  * would otherwise grow by two joins per round (analysis cost blows
  * up around round ~10) and re-run the whole prefix at every action.
  * The checkpoint is LAZY and the convergence `count` (computed from
  * the old label carried in the same frame — no extra join)
  * materializes it, so a round costs exactly one Spark job; in local
  * mode job-scheduling latency, not data, dominates this loop.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges` (columns
    * `src`, `dst`; direction ignored, self-loops/duplicates fine).
    * Returns (`id`, `component`) for every vertex incident to an
    * edge, `component` = min vertex id reachable.
    *
    * `partitions` sizes the materialized edge layout (the frame every
    * round joins against). The per-round joins/aggregations themselves
    * inherit `spark.sql.shuffle.partitions` — AQE coalesces their tiny
    * outputs, but on a session configured for corpus-scale shuffles,
    * run the component loop under a graph-scale shuffle setting (the
    * candidate graph is orders of magnitude smaller than the corpus:
    * only docs sharing an LSH bucket appear). */
  def run(edges: DataFrame, maxIter: Int = 20, partitions: Int = 8): DataFrame = {
    // Both base frames checkpoint LAZILY: round 1's convergence count
    // is the first action over them, so edges, seed labels and the
    // round-1 step all materialize in that single job (eager
    // checkpoints here cost two extra driver-latency-bound jobs for
    // nothing — the persisted blocks are identical either way).
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(partitions, col("src"))
      .localCheckpoint(false)
    // Seed with round 1 computed directly: every vertex appears as a
    // `src` in the symmetrized edge set, so min(id, min neighbor) is
    // one aggregation — saves a full propagate round (and its jobs)
    // over identity labels. For pure star buckets this is already the
    // fixpoint and the loop below just certifies it.
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("component"))
      .select(col("src").as("id"), col("component"))
      .localCheckpoint(false)
    var iter = 0
    var converged = false
    val roundWall = Seq.newBuilder[Double]
    // ONE Spark job per round (was 3): the 1-hop min, the pointer
    // jump, and the old label all live in one plan, lazily
    // local-checkpointed; the convergence count both materializes the
    // checkpoint and reads `changed` off it in the same action.
    while (!converged && iter < maxIter) {
      val roundT0 = System.nanoTime()
      val nbrMin = sym
        .join(labels.select(col("id").as("_nbr"), col("component").as("_nbr_comp")),
          col("dst") === col("_nbr"))
        .groupBy(col("src"))
        .agg(min(col("_nbr_comp")).as("_min_nbr"))
      // Pointer jumping resolves the stepped label against the
      // PREVIOUS round's labels (already materialized — referencing
      // the frame twice is free, where a mid-round `prelim` self-join
      // needed its own checkpoint because Catalyst does not dedupe
      // common subplans). Labels are ids of reachable vertices either
      // way, so the jump stays a valid contraction; chains still
      // shorten multiplicatively per round. TWO hops per round (r8):
      // the second join against the same materialized frame rides in
      // the same single Spark job, and on chain graphs label depth
      // contracts ~3× per round instead of ~2× — fewer rounds, and
      // in local mode rounds (driver scheduling latency), not data,
      // are the whole cost of this loop.
      val stepped = labels
        .join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("_min_nbr"), col("component")))
            .as("_step"))
      val hop1 = stepped
        .join(labels.select(col("id").as("_pid"), col("component").as("_pcomp")),
          col("_step") === col("_pid"), "left")
        .select(col("id"), col("_old"),
          least(col("_step"), coalesce(col("_pcomp"), col("_step")))
            .as("_jump"))
      val next = hop1
        .join(labels.select(col("id").as("_pid2"), col("component").as("_pcomp2")),
          col("_jump") === col("_pid2"), "left")
        .select(col("id"), col("_old"),
          least(col("_jump"), coalesce(col("_pcomp2"), col("_jump")))
            .as("component"))
        .localCheckpoint(false)
      val changed = next.filter(col("component") =!= col("_old")).count()
      labels = next.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
      roundWall += (System.nanoTime() - roundT0) / 1e9
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(s"[cc] converged after $iter round(s); per-round sec = " +
        roundWall.result().map(t => f"$t%.2f").mkString("[", ", ", "]"))
    labels
  }
}
