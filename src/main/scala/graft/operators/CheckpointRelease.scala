package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of a SUPERSEDED `localCheckpoint` frame.
  *
  * Every iterative operator here (min-label CC, star contraction, SSSP,
  * label propagation) cuts its per-round lineage with
  * `localCheckpoint(eager = false)`; the checkpoint pins the round's
  * rows as cached RDD blocks. Dropping the Scala reference only frees
  * them when the ContextCleaner notices a JVM GC — across a 300-query
  * bench suite the un-GC'd rounds accumulate executor memory and skew
  * later timed queries (round-9 ADVICE). This helper walks the
  * checkpointed frame's analyzed plan to the [[LogicalRDD]] Spark
  * wrapped around the materialized rows and unpersists it immediately
  * (non-blocking). Safe on any frame: a plan with no LogicalRDD (a
  * persisted-but-not-checkpointed input, a plain scan) is a no-op, and
  * unpersisting an already-released RDD is idempotent.
  *
  * Callers release a round's frame only AFTER the next round is
  * materialized (the probe action) — never the frame the operator is
  * about to return. */
private[graft] object CheckpointRelease {
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
