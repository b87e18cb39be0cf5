package graft.sql

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Storage + resolution for SQL VIEWS over the lakehouse tier (round-12
  * verdict #4): a view is NAMED BY A PATH (the `txtable.`/p`` convention
  * every statement here uses) and holds only its defining QUERY TEXT —
  * `<root>/_view/definition.sql` for persisted views (durable, any later
  * session resolves it), an in-memory entry for `CREATE TEMP VIEW`
  * (session-process-scoped, gone at JVM exit, shadows a persisted
  * definition while present — the Spark temp-view precedence rule).
  *
  * Resolution is EXPANSION AT PARSE TIME: before a statement is
  * delegated to Spark's parser, every `txtable.`/p`` reference whose
  * path holds a view definition is replaced by the parenthesized stored
  * query — recursively, so views compose over views (and over real
  * TxTables, whose references expand to themselves and resolve through
  * the catalog as before). The expansion is pure text → the FULL Spark
  * SQL surface works over a view (joins, windows, subqueries), and the
  * stored definition itself keeps nested view references UNEXPANDED, so
  * a redefinition of an inner view is visible to every outer view at
  * the next read — exactly the late-binding semantics SQL views have.
  * A reference cycle is caught by a depth bound and refused loudly.
  *
  * MATERIALIZED views store their definition at `_view/mview.sql` next
  * to an ordinary TxTable holding the materialized rows; the refresh
  * watermark (applied-through source version) rides the TxTable txn map
  * under [[ViewStore.MviewAppId]] — restart-safe with no extra state,
  * the replication bookkeeping reused. */
object ViewStore {

  /** The txn-map key carrying a materialized view's applied-through
    * source version. */
  val MviewAppId = "mview"

  private val temps = new scala.collection.concurrent.TrieMap[String, String]

  private def defPath(root: String) = Paths.get(root, "_view", "definition.sql")
  private def mviewPath(root: String) = Paths.get(root, "_view", "mview.sql")

  /** Persist (or TEMP-register) a view definition. CREATE is
    * put-if-absent unless `replace`; a path already holding a TxTable
    * or a materialized view refuses — one path, one object. */
  def create(root: String, sql: String, replace: Boolean, temp: Boolean): Unit = {
    require(!graft.tables.TxTable.exists(root),
      s"$root already holds a TxTable — a view cannot shadow it")
    require(!Files.exists(mviewPath(root)),
      s"$root already holds a MATERIALIZED VIEW — DROP it first")
    if (temp) {
      require(replace || !temps.contains(root),
        s"temp view txtable.`$root` already exists (use CREATE OR REPLACE)")
      temps.put(root, sql)
      ()
    } else {
      val p = defPath(root)
      if (!replace) require(!Files.exists(p),
        s"view txtable.`$root` already exists (use CREATE OR REPLACE)")
      Files.createDirectories(p.getParent)
      Files.write(p, sql.getBytes(UTF_8))
      ()
    }
  }

  /** Whether `root` currently resolves to a TEMP definition (shadowing
    * or standalone) — the catalog-surface kind discriminator. */
  def isTemp(root: String): Boolean = temps.contains(root)

  /** Every live TEMP view path in this process. */
  def tempPaths: Seq[String] = temps.keys.toSeq

  /** The stored definition, temp entries shadowing persisted ones. */
  def definition(root: String): Option[String] =
    temps.get(root).orElse {
      val p = defPath(root)
      if (Files.exists(p)) Some(new String(Files.readAllBytes(p), UTF_8))
      else None
    }

  /** Drop ONE layer of a view: the temp entry if present (unshadowing a
    * persisted definition — Spark's own temp-view drop rule), else the
    * persisted definition. Returns whether anything existed. */
  def drop(root: String): Boolean = {
    if (temps.remove(root).isDefined) true
    else {
      val p = defPath(root)
      val d = Files.deleteIfExists(p)
      if (d) Files.deleteIfExists(p.getParent) // _view dir, if now empty
      d
    }
  }

  // ------------------------------------------------------ materialized

  def createMview(root: String, sql: String): Unit = {
    requireMviewCreatable(root)
    registerMview(root, sql)
  }

  /** The one-path-one-object pre-checks for CREATE MATERIALIZED VIEW,
    * split from registration so the definition can be written only
    * AFTER the materialization succeeds — a failed (e.g. unparseable)
    * definition must not leave a half-created view whose path then
    * refuses every corrected retry (ADVICE r14). */
  def requireMviewCreatable(root: String): Unit = {
    require(!graft.tables.TxTable.exists(root),
      s"$root already holds a TxTable — a materialized view cannot overwrite it")
    require(definition(root).isEmpty,
      s"$root already holds a view — a materialized view cannot shadow it")
    require(!Files.exists(mviewPath(root)),
      s"materialized view txtable.`$root` already exists")
  }

  /** Write the definition file — the registration half of
    * [[createMview]]; call only after [[requireMviewCreatable]] and a
    * successful materialization. */
  def registerMview(root: String, sql: String): Unit = {
    val p = mviewPath(root)
    require(!Files.exists(p), s"materialized view txtable.`$root` already exists")
    Files.createDirectories(p.getParent)
    Files.write(p, sql.getBytes(UTF_8))
    ()
  }

  def mviewDefinition(root: String): Option[String] = {
    val p = mviewPath(root)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), UTF_8)) else None
  }

  /** Expand every view reference in `sqlText` to its parenthesized
    * stored query, recursively (late binding; depth-bounded cycle
    * refusal). Non-view `txtable.` references pass through verbatim. */
  def expand(sqlText: String, depth: Int = 0): String = {
    if (depth > 10) throw new IllegalArgumentException(
      "view expansion exceeded depth 10 — view definitions form a cycle")
    TargetRef.replaceAllIn(sqlText, m =>
      java.util.regex.Matcher.quoteReplacement(
        definition(m.group(1)) match {
          case Some(sql) => "(" + expand(sql, depth + 1) + ")"
          case None => m.matched
        }))
  }

  /** Every distinct `txtable.`/p`` path a query text references, in
    * order of first appearance — the refresh planner's source list. */
  def txtableRefs(sql: String): Seq[String] =
    TargetRef.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Pin the named table references to explicit versions (`… VERSION AS
    * OF v`) — the initial-materialization race guard: the watermark is
    * recorded for EXACTLY the version the recompute read, so a source
    * commit racing the refresh lands in the next increment, never lost
    * or doubled (the snapshot-bootstrap discipline, applied textually). */
  def pinVersions(sql: String, pins: Map[String, Int]): String =
    TargetRef.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        pins.get(m.group(1))
          .map(v => s"${m.matched} VERSION AS OF $v")
          .getOrElse(m.matched)))

  private val TargetRef = "txtable\\s*\\.\\s*`([^`]+)`".r
}
