package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Farthest-point IVF build seeding (r16 verdict #3): q174 certifies
  * the seeding comparison on the (isotropic) fixture, where seed
  * placement is recall-neutral by measurement. This spec proves the
  * lever where it exists — a PLANTED-cluster corpus arranged so the
  * first-k seeding collapses every seed into one cluster: probed
  * recall craters under first-k and recovers under the spread
  * seeding, strictly.
  */
class SeedSpreadSpec extends AnyFunSuite with SparkFixture {

  /** 96 vectors in 8 planted clusters of 12 (cluster = id / 12), dim
    * 16: v_i = e_cluster + 0.3·e_{8 + (i mod 8)} — a dominant cluster
    * direction plus a small per-member secondary direction. Ids 0–7
    * (the first-k seeds) ALL land in cluster 0 — the adversarial
    * case a corpus sorted by source/crawl produces naturally — and
    * under those seeds every OTHER cluster's members scatter across
    * all 8 cells (the only non-zero cosine to a cluster-0 seed is
    * the secondary-direction match), so a 2-probe search catches
    * ~2/8 of the query's cluster. The probedOverlap battery queries
    * (ids 40–44) live in cluster 3. */
  private def planted() = {
    import spark.implicits._
    val dim = 16
    val rows = (0 until 96).map { i =>
      val c = i / 12
      val sec = 8 + (i % 8)
      val v = (0 until dim).map { d =>
        (if (d == c) 1.0 else 0.0) + (if (d == sec) 0.3 else 0.0)
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "v")
  }

  test("spread seeding covers every planted cluster; first-k collapses into one") {
    val e = planted()
    val spread = Similarity.spreadCentroids(e, 8)
    val clustersHit = spread.map(_._1 / 12).distinct.sorted
    assert(clustersHit.length == 8,
      s"farthest-point must seed all 8 planted clusters, hit: ${clustersHit.mkString(",")}")
    val firstK = Similarity.collectCentroids(e)
    assert(firstK.map(_._1 / 12).distinct.length == 1,
      "the adversarial layout must put every first-k seed in cluster 0")
  }

  test("probed recall strictly lifts under the spread seeding on clustered data") {
    val e = planted()
    val cmp = Similarity.seedCompareOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(cmp.length == 5, "all 5 battery queries must report")
    val sumFirst = cmp.map(_._2).sum
    val sumSpread = cmp.map(_._4).sum
    assert(sumSpread > sumFirst,
      s"spread recall ($sumSpread) must strictly beat first-k ($sumFirst) on planted clusters")
    assert(sumFirst <= 30,
      s"the adversarial layout must crater first-k recall, got $sumFirst/50")
    // The spread seeding must recover essentially the whole cluster:
    // the query's 11 cluster peers dominate its exact top-10, and its
    // cluster's cell is the first probe.
    assert(sumSpread >= 45,
      s"spread recall must be near-exact on planted clusters, got $sumSpread/50")
  }
}
