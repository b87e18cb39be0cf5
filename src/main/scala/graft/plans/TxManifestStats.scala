package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics => V2Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

import graft.sources.TxV1Scan

/** Manifest statistics → Catalyst, across the V1-fallback seam.
  *
  * [[graft.sources.TxV1Scan]] reports exact row counts and byte sizes
  * from O(files) driver-side manifest metadata
  * (`SupportsReportStatistics`), but Spark's V1 read fallback wraps
  * every `V1Scan` in a [[V1ScanWrapper]] that does NOT forward the
  * interface — so `DataSourceV2ScanRelation.computeStats()` fell back
  * to `defaultSizeInBytes` (8 EiB) and every catalog-resolved txtable
  * join planned stat-blind: sort-merge with two exchanges where one
  * side is 8 rows. This pre-CBO rule (it must run AFTER
  * `V2ScanRelationPushDown` has built the scan, which ordinary injected
  * optimizer rules do not) re-wraps the scan in a stats-forwarding
  * subclass, so the small side of a join plans BROADCAST from the
  * manifest with no hint — at 100 TB the difference between shuffling
  * the fact table and shipping a KB. The physical strategy still
  * pattern-matches `V1ScanWrapper` (subclass), so execution is
  * unchanged; the rule is a no-op on non-txtable scans and idempotent
  * under AQE re-optimization. */
class StatsV1ScanWrapper(v1: V1Scan, handled: Seq[Filter],
    ops: PushedDownOperators, stats: V2Statistics)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics = stats
  // WITHOUT these, the inherited case-class equality makes the rewrapped
  // relation structurally EQUAL to the original, and TreeNode.transform's
  // fastEquals keeps the old (stat-blind) node — the rule silently no-ops
  override def canEqual(other: Any): Boolean = other.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}

object TxManifestStats extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case rel: DataSourceV2ScanRelation if statlessTx(rel.scan) =>
      val w = rel.scan.asInstanceOf[V1ScanWrapper]
      rel.copy(scan = new StatsV1ScanWrapper(w.v1Scan, w.handledFilters,
        w.pushedDownOperators,
        w.v1Scan.asInstanceOf[TxV1Scan].estimateStatistics()))
  }

  private[graft] def statlessTxDebug(scan: org.apache.spark.sql.connector.read.Scan): Boolean =
    statlessTx(scan)

  private def statlessTx(scan: org.apache.spark.sql.connector.read.Scan): Boolean =
    scan match {
      case w: V1ScanWrapper =>
        !w.isInstanceOf[StatsV1ScanWrapper] && w.v1Scan.isInstanceOf[TxV1Scan]
      case _ => false
    }
}
