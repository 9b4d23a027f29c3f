package graft.core

import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Shared window specs. */
object Windows {

  /** The bounded GLOBAL window: unpartitioned, unbounded both ways —
    * used to read a whole-frame total/min back onto each row of a
    * frame already known to be SMALL (a ≤10-bin histogram, a
    * |sources|-row totals dim). This is the engine's standard
    * replacement for the `totals = frame.agg(...)` + join/crossJoin
    * branch shape: Spark has no common-subplan reuse across branches,
    * so that shape re-runs the whole upstream pass (probe-confirmed,
    * r10 audit), while a window over the small frame stays on the
    * single branch. WindowExec warns "No Partition Defined" for these
    * — every use site must be bounded by construction (the bench pins
    * that logger to ERROR; `sbt test` keeps it visible so an
    * accidentally-unbounded new global window still surfaces). */
  val all: WindowSpec =
    Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
}
