package graft.queries

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Tables
import graft.functions.I8Quant

/** The quantized dense-index tier (`cells_q8`, q157, r15 verdict #2):
  * the oracle certifies the recall certificate; this spec pins the
  * pieces it can't see — the pack/dot kernels against a pure-Scala
  * replica of the q101 arithmetic, the stored table's derivation, and
  * the serving claim that the int8-prefilter + exact-rescore path
  * returns the full-precision probed ranking verbatim.
  */
class QuantIndexSpec extends AnyFunSuite with SparkFixture {

  test("I8Quant.pack matches the q101 round-half-away-from-zero rule") {
    // Adversarial values: exact halves both signs (where HALF_UP and
    // banker's rounding diverge), the extremes (must hit ±127 with no
    // clamp), and the zero vector (all-zero code).
    val v = Array(1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 0.999, -0.999, 0.0)
    val code = I8Quant.pack(v)
    def expected(x: Double, scale: Double): Int = {
      val y = x * 127.0 / scale
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toInt
    }
    assert(code.toSeq == v.map(x => expected(x, 1.0).toByte).toSeq)
    assert(code(0) == 127 && code(1) == -127)
    assert(I8Quant.pack(Array(0.0, 0.0)).toSeq == Seq[Byte](0, 0))
    // Half-away: 0.5*127 = 63.5 -> 64; -63.5 -> -64.
    assert(code(2) == 64 && code(3) == -64)
    // Exact integer dot.
    assert(I8Quant.dot(Array[Byte](127, -127, 3), Array[Byte](127, 127, -2)) ==
      127L * 127 - 127L * 127 - 6L)
  }

  test("graft_i8_pack/graft_i8_dot agree with the driver statics; dot NULLs on mismatch") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.3, -0.7, 0.1, 0.9)),
      (2L, Seq(-0.5, 0.5, 0.0, 0.25)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0)))
    val df = vecs.toDF("vec_id", "v")
      .withColumn("code", call_function("graft_i8_pack", col("v")))
    val got = df.select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == I8Quant.pack(v.toArray).toSeq, s"vec $id pack")
    }
    val q = lit(I8Quant.pack(Array(0.1, 0.2, 0.3, 0.4)))
    val dots = df.withColumn("d", call_function("graft_i8_dot", col("code"), q))
      .select("vec_id", "d", "code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(dots(id) == I8Quant.dot(I8Quant.pack(v.toArray),
        I8Quant.pack(Array(0.1, 0.2, 0.3, 0.4))), s"vec $id dot")
    }
    val mismatch = Seq((1L, Seq(0.1, 0.2))).toDF("vec_id", "v")
      .withColumn("code", call_function("graft_i8_pack", col("v")))
      .withColumn("d", call_function("graft_i8_dot", col("code"), q))
      .select("d").collect()(0)
    assert(mismatch.isNullAt(0), "length mismatch must surface as NULL")
  }

  test("the stored cells_q8 table is the per-row quantization of cells") {
    val cells = Warehouse.stored(spark, sfDir, "cells")
      .select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val q8 = Warehouse.stored(spark, sfDir, "cells_q8")
      .select("vec_id", "code", "qnorm").collect()
    assert(q8.length == cells.size)
    q8.take(50).foreach { r =>
      val id = r.getLong(0)
      val code = r.getAs[Array[Byte]](1)
      assert(code.toSeq == I8Quant.pack(cells(id).toArray).toSeq,
        s"vec $id stored code")
      assert(r.getDouble(2) ==
        math.sqrt(I8Quant.dot(code, code).toDouble), s"vec $id qnorm")
    }
  }

  test("the quantized serve returns the full-precision probed ranking verbatim") {
    // The q157 lossless claim exercised through the PUBLIC request
    // APIs (the certificate runs its own inline chain): for arbitrary
    // request vectors, int8-prefilter + rescore == the full-precision
    // parameterized serve, rows and order.
    Seq(17L, 123L, 401L).foreach { vid =>
      val qv = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") === lit(vid))
        .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .collect()(0).getSeq[Double](0)
      val exact = Similarity.annServe(spark, sfDir, qv, nprobe = 2, k = 10)
        .collect().map(_.toSeq).toSeq
      val quant = Similarity.annServeQuant(spark, sfDir, qv, nprobe = 2, k = 10)
        .collect().map(_.toSeq).toSeq
      assert(quant == exact, s"query $vid: quantized serve != exact probed serve")
    }
  }
}
