package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The cluster registration path: `--conf
  * spark.sql.extensions=graft.GraftExtensions` makes Spark load the
  * class BY NAME via a zero-arg constructor and apply it as
  * `SparkSessionExtensions => Unit` — a different contract from the
  * programmatic `.withExtensions(new GraftExtensions)` every other
  * spec uses. A rename, package move, or added constructor parameter
  * would break every spark-submit user while all other tests stay
  * green. This spec replicates the loader's reflective steps exactly
  * (a live-session test of the conf string is impossible in this
  * shared-JVM suite: `spark.sql.extensions` is a STATIC conf, fixed
  * when the first SparkContext is created). */
class ExtensionsLoadingSpec extends AnyFunSuite {

  test("GraftExtensions instantiates by name and applies (spark-submit contract)") {
    val instance = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
    val fn = instance.asInstanceOf[SparkSessionExtensions => Unit]
    // Applying to a fresh extensions registry must succeed — this runs
    // every injectFunction/injectOptimizerRule registration.
    fn(new SparkSessionExtensions)
  }
}
