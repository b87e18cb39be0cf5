package graft.tables

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table ATOMIC transaction coordinator — the lakehouse gap after
  * single-table ACID (SURVEY §2.17): several [[TxTable]]s whose commits
  * must become visible TOGETHER or not at all (the classic shape: move
  * rows from one table to another without any reader ever seeing the
  * rows in both places or neither).
  *
  * Layout:
  * {{{
  *   <root>/_grouplog/v00000001.txt   group manifest: member -> pinned version
  *   <root>/tables/<name>/...         each member is a full TxTable
  * }}}
  *
  * The protocol is two-layer, like every production multi-table design
  * (a catalog commit over per-table logs):
  *
  *  1. each member table commits its OWN new version first — data files,
  *     stats, manifest, all durable but *unreferenced by the group*;
  *  2. ONE put-if-absent hard link publishes the group manifest naming
  *     the member versions jointly visible. That single link is the
  *     all-or-nothing point: a crash before it leaves the group view
  *     unchanged (the members' new versions are invisible-to-group
  *     garbage — exactly the crashed-writer story TxTable already tells
  *     at the file level, lifted one level up); a crash after it has
  *     committed everything.
  *
  * Readers who want cross-table consistency read THROUGH the group
  * ([[read]]): the group manifest pins one version per member, so a
  * multi-table scan is snapshot-isolated against concurrent group
  * commits. Reading a member table directly is still fine — it just
  * opts out of the cross-table guarantee, seeing that table's own
  * latest (the same contract Delta gives you when you bypass a
  * catalog-level transaction).
  *
  * A lost group-commit race ABORTS (the merge/delete precedent): the
  * loser's member versions were validated against a group snapshot that
  * no longer exists, and silently overlaying them could interleave two
  * transactions' pins. Group time travel falls out of the manifest
  * numbering for free: `snapshot(versionAsOf)` replays any historical
  * consistent cut.
  */
final class TxGroup(val root: String) {

  import TxGroup._

  private val logDir: Path = Paths.get(root, "_grouplog")
  Files.createDirectories(logDir)

  /** Member accessor (creates the member's directories on first use).
    * Member tables are ordinary TxTables — every single-table operation
    * (append, merge, delete, compact, evolveStats, vacuum) works
    * unchanged; only VISIBILITY of the results is group-gated. */
  def table(name: String, statCols: Seq[String]): TxTable = {
    require(name.nonEmpty && !name.exists(c => c == '/' || c == '\t' || c == '\n'),
      s"bad member name '$name'")
    new TxTable(Paths.get(root, "tables", name).toString, statCols)
  }

  /** Highest committed group version, 0 if none. */
  def currentVersion: Int = listVersions.lastOption.getOrElse(0)

  /** Member names present on disk (created via [[table]] or the SQL
    * `ALTER GROUP … ADD TABLE`) — what `COMMIT GROUP` pins: every member
    * at its own current version, one atomic cut. */
  def members: Seq[String] =
    Option(Paths.get(root, "tables").toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => Files.isDirectory(f.toPath.resolve("_txlog")))
      .map(_.getName).sorted.toSeq

  private def listVersions: Seq[Int] = {
    val vs = Option(logDir.toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case ManifestName(v) => v.toInt }
    vs.sorted.toSeq
  }

  /** The consistent cut at group version `versionAsOf` (default latest):
    * member name → pinned member version. Version 0 is the empty group. */
  def snapshot(versionAsOf: Option[Int] = None): Map[String, Int] = {
    val v = versionAsOf.getOrElse(currentVersion)
    if (v == 0) Map.empty
    else {
      val p = logDir.resolve(manifestName(v))
      require(Files.exists(p), s"group version $v does not exist (have $listVersions)")
      parseManifest(Files.readAllLines(p))
    }
  }

  /** Read member `name` at the GROUP-consistent snapshot — the pinned
    * member version, never the member's own (possibly newer) latest. */
  def read(spark: SparkSession, name: String, statCols: Seq[String],
      versionAsOf: Option[Int] = None): DataFrame = {
    val pinned = snapshot(versionAsOf).getOrElse(name,
      throw new IllegalArgumentException(
        s"group at $root does not pin a version of member '$name'"))
    table(name, statCols).read(spark, Some(pinned))
  }

  /** Group-aware VACUUM: reclaim member data past the group's retention
    * horizon without ever breaking a retained group cut. Member-level
    * `TxTable.vacuum` counts retention from the member's OWN latest
    * version — run naively it can drop a manifest an old GROUP version
    * still pins, stranding group time travel (the composition hazard of
    * two-layer logs). This computes, per member, the oldest version any
    * retained group manifest pins, and vacuums that member retaining at
    * least back to it; then drops the expired group manifests. Members
    * never pinned by a retained cut are left untouched (conservative).
    * Returns (dataFilesDeleted, groupVersionsDropped); `dryRun` reports
    * both counts and touches NOTHING (the member vacuums run dry and
    * the expired group manifests stay). */
  def vacuum(retainGroupVersions: Int, dryRun: Boolean = false): (Int, Int) = {
    require(retainGroupVersions >= 1, "must retain at least the current group version")
    val versions = listVersions
    val cutoff = currentVersion - retainGroupVersions + 1
    val (expired, retained) = versions.partition(_ < cutoff)
    if (expired.isEmpty) return (0, 0)
    // oldest pin per member across every RETAINED group cut
    val oldestPinned: Map[String, Int] = retained
      .flatMap(v => snapshot(Some(v)).toSeq)
      .groupBy(_._1).map { case (n, pins) => n -> pins.map(_._2).min }
    var deleted = 0
    oldestPinned.foreach { case (name, oldest) =>
      // retain the member's versions [oldest, memberCurrent] — vacuum
      // counts from the member's own latest, so translate
      val member = table(name, Nil)
      val keep = member.currentVersion - oldest + 1
      deleted += member.vacuum(keep, dryRun)._1
    }
    if (!dryRun)
      expired.foreach(v => Files.deleteIfExists(logDir.resolve(manifestName(v))))
    (deleted, expired.size)
  }

  /** GROUP-consistent replication — the cross-table face of
    * `TxTable.applyChangesFrom`: replay this group's history into `dst`
    * cut by cut, so the replica exposes the SAME consistent cuts the
    * source did, never a state that tears across members (per-member
    * replication alone converges each table but lets a cross-table read
    * of the replica see member A at source cut g and member B at g−1 —
    * exactly the anomaly the group layer exists to exclude). For each
    * source group version g: every member whose pin advanced folds its
    * row-change feed over (prevPin, curPin] into the replica member via
    * `applyChangeRows` — watermarked by the SOURCE MEMBER version under
    * `appId`, monotone per member, so a crashed/replayed sync
    * recognizes per-member what already landed — then ONE replica group
    * commit publishes the cut's members jointly. Alignment invariant:
    * replica group version g mirrors source group version g (one
    * publish per cut), which is also the resume point — `dst`'s current
    * group version IS the applied-through source version, so the
    * watermark needs no extra storage. The crash window between member
    * folds and group publish re-enters cleanly: folds no-op on their
    * watermarks, the publish is re-issued. `keys` names each member's
    * replication stat column (the delete-probe key). The replica group
    * must be dedicated (no commits of its own). At 100 TB each cut
    * costs the members' CHANGED files — replication lag tracks change
    * rate per cut, never group size. Returns the source group version
    * applied through. */
  def replicateTo(spark: SparkSession, dst: TxGroup, appId: String,
      keys: Map[String, String]): Int = {
    val srcV = currentVersion
    var applied = dst.currentVersion // one replica group version per source cut
    require(applied <= srcV,
      s"replica group at ${dst.root} is at cut $applied, ahead of this " +
        s"source's cut $srcV — it is not a replica of this group")
    // Alignment validation: the resume point is dst.currentVersion, so an
    // INDEPENDENT commit on the replica group would silently shift which
    // source cuts replay under which replica versions. Each replica
    // member's applied-through watermark (appId → source member version)
    // must sit between the source pins at cut `applied` and at
    // `applied+1` — the upper bound admits the legitimate crash window
    // (member folds landed, group publish didn't). Anything outside that
    // band means the replica was written by someone else: fail loudly
    // rather than replay cuts against a foreign state.
    if (applied > 0) {
      val atApplied = snapshot(Some(applied))
      val atNext = if (applied < srcV) snapshot(Some(applied + 1)) else atApplied
      atApplied.foreach { case (name, pin) =>
        val wm = dst.table(name, Nil).snapshot().txns.getOrElse(appId, 0L)
        val hi = atNext.getOrElse(name, pin).toLong
        if (wm < pin || wm > hi)
          throw new IllegalStateException(
            s"replica group at ${dst.root} is misaligned for member '$name': " +
              s"applied-through source version $wm is outside [$pin, $hi] for " +
              s"replica cut $applied — the replica group must be dedicated to " +
              s"this replication (no commits of its own, one appId)")
      }
    }
    while (applied < srcV) {
      val g = applied + 1
      val prev = snapshot(Some(g - 1))
      val cur = snapshot(Some(g))
      val updates = cur.flatMap { case (name, pin) =>
        val from = prev.getOrElse(name, 0)
        if (pin == from) None // untouched at this cut: replica pin carries
        else if (pin < from)
          // commitFrom permits re-pinning a member to ANY existing version,
          // so a backward pin is representable at the source — but a
          // replica cannot fold a negative range; surface it as what it
          // is instead of rowChangesBetween's generic range require
          throw new IllegalStateException(
            s"source group cut $g re-pins member '$name' backward " +
              s"($from -> $pin); non-monotone member pins cannot be replicated")
        else {
          val key = keys.getOrElse(name, throw new IllegalArgumentException(
            s"no replication key declared for group member '$name'"))
          val dstT = dst.table(name, Seq(key))
          dstT.applyChangeRows(spark,
            table(name, Seq(key)).rowChangesBetween(spark, from, pin),
            appId, pin.toLong, key)
          Some(name -> dstT.currentVersion)
        }
      }
      // a re-pin-only source version still advances the replica cut
      dst.commit(if (updates.nonEmpty) updates else dst.snapshot())
      applied = g
    }
    srcV
  }

  /** Group-consistent RESTORE: rewind every member's DATA state to the
    * cut pinned by group version `versionAsOf`, published as ONE new
    * group commit — the multi-table rollback a single-table
    * [[TxTable.restore]] cannot give (restoring members one by one
    * exposes readers to cuts that never existed: table A already
    * rewound, table B not yet). Two-layer, like every group write:
    * each member commits its own restore first (metadata-only — file
    * lists, zero data I/O), then the single put-if-absent group link
    * makes the rewound cut visible atomically.
    *
    * Members the target cut pins are restored to their pinned versions;
    * a member that JOINED the group after the cut is restored to EMPTY
    * (the cut's world had no such table — keeping its rows would
    * publish a state no group version ever described) but stays a
    * member, its history intact. Group and member histories are never
    * rewritten: the abandoned cuts stay time-travelable, and group
    * vacuum keeps protecting everything a retained cut pins. A lost
    * group-commit race aborts ([[commit]]'s rule); the member restores
    * it already landed are invisible-to-group garbage, exactly the
    * crashed-writer story. Returns the new group version. */
  def restoreTo(versionAsOf: Int): Int = {
    val target = snapshot(Some(versionAsOf)) // validates the cut exists
    val base = currentVersion
    val updates = snapshot(Some(base)).map { case (name, _) =>
      val t = new TxTable(Paths.get(root, "tables", name).toString, Nil)
      name -> t.restore(target.getOrElse(name, 0))
    }
    require(updates.nonEmpty, s"group at $root has no members to restore")
    commitFrom(base, updates)
  }

  /** Atomically publish `updates` (member → freshly committed member
    * version) overlaid on the current pins. The single put-if-absent
    * link is the all-or-nothing point; a lost race ABORTS. Member
    * versions must already exist — this publishes visibility, it never
    * writes data. Returns the new group version. */
  def commit(updates: Map[String, Int]): Int = commitFrom(currentVersion, updates)

  /** Commit against an explicit base group version — the seam that lets
    * a spec interleave a competing group commit between base-read and
    * publish (TxTable.mergeFrom precedent). */
  private[graft] def commitFrom(base: Int, updates: Map[String, Int]): Int = {
    require(updates.nonEmpty, "empty group commit")
    updates.foreach { case (n, v) =>
      require(v >= 1 &&
        Files.exists(Paths.get(root, "tables", n, "_txlog", memberManifestName(v))),
        s"member '$n' has no committed version $v to pin")
    }
    val pinned = snapshot(Some(base)) ++ updates
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, renderManifest(pinned, clockMs()).getBytes("UTF-8"))
    try {
      Files.createLink(logDir.resolve(manifestName(base + 1)), tmp)
      base + 1
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"group commit at $root lost the race for version ${base + 1}; " +
            "re-validate the member commits against the new group snapshot")
    } finally Files.deleteIfExists(tmp)
  }

  /** Wall clock for group-commit timestamps — spec seam, TxTable style. */
  private[tables] var clockMs: () => Long = () => System.currentTimeMillis()

  /** GROUP-LEVEL DESCRIBE HISTORY: newest-first, one row per retained
    * group cut — its member pins, commit time, and which members' pins
    * MOVED in that cut, each mapped to the member-table operation that
    * produced the newly pinned version (read from the member's own
    * op-tagged log; `unknown` if that member manifest predates tagging
    * or was vacuumed). O(group versions × members) tiny driver-side
    * file reads, zero data I/O. The oldest retained cut (its
    * predecessor vacuumed) reports ALL its pins as changed — it is the
    * visible baseline. */
  def history(): Seq[GroupCommitInfo] = {
    val vs = listVersions
    val cuts = vs.map(v => v -> snapshot(Some(v))).toMap
    val memberNames = cuts.values.flatMap(_.keys).toSet
    val memberOps: Map[String, Map[Int, String]] = memberNames.map { n =>
      n -> new TxTable(Paths.get(root, "tables", n).toString, Nil)
        .history().map(i => i.version -> i.operation).toMap
    }.toMap
    vs.reverse.map { v =>
      val pins = cuts(v)
      val prev = cuts.getOrElse(v - 1, Map.empty[String, Int])
      val changed = pins.filter { case (n, mv) => !prev.get(n).contains(mv) }
        .map { case (n, mv) =>
          n -> memberOps(n).getOrElse(mv, "unknown")
        }
      GroupCommitInfo(v, commitMillis(v), pins, changed)
    }
  }

  private def commitMillis(v: Int): Long = {
    import scala.jdk.CollectionConverters._
    val p = logDir.resolve(manifestName(v))
    Files.readAllLines(p).asScala
      .collectFirst { case l if l.startsWith("commitms\t") =>
        l.stripPrefix("commitms\t").toLong }
      .getOrElse(Files.getLastModifiedTime(p).toMillis)
  }
}

object TxGroup {

  /** One group audit-log row ([[TxGroup#history]]): the cut's member
    * pins plus the members whose pins moved, each with the member-table
    * operation that produced the newly pinned version. */
  final case class GroupCommitInfo(version: Int, timestampMs: Long,
    pins: Map[String, Int], changed: Map[String, String])

  private val ManifestName = """v(\d{8})\.txt""".r

  private def manifestName(v: Int): String = f"v$v%08d.txt"

  // TxTable's manifest naming, needed to existence-check member versions
  private def memberManifestName(v: Int): String = f"v$v%08d.txt"

  /** Group manifest line format (tab-separated, the TxTable discipline):
    * a `commitms` stamp plus `table <name> <version>` per member —
    * O(members) tiny, diff-readable. */
  private def renderManifest(pins: Map[String, Int], commitMs: Long): String =
    (Seq("graft-grouplog\t1", s"commitms\t$commitMs") ++
      pins.toSeq.sortBy(_._1).map { case (n, v) => s"table\t$n\t$v" })
      .mkString("\n")

  private def parseManifest(lines: java.util.List[String]): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val all = lines.asScala.toSeq
    require(all.headOption.exists(_.startsWith("graft-grouplog\t")),
      "not a graft grouplog manifest")
    all.tail.filter(l => l.nonEmpty && !l.startsWith("commitms\t")).map { line =>
      val parts = line.split("\t")
      require(parts(0) == "table" && parts.length == 3, s"bad group manifest line: $line")
      parts(1) -> parts(2).toInt
    }.toMap
  }
}
