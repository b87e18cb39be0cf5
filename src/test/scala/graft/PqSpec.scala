package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.queries.LlmExt.q_ann_pq]] against a full INDEPENDENT
  * single-threaded recomputation (the BpeSpec discipline): codebook
  * training (per-(subspace, label) floored means), nearest-codeword
  * assignment with the packed argmin's tie rule, the query LUT, ADC
  * scoring, and the final (adc, b_id) top-3 — all re-derived from the
  * raw embeddings with plain Scala arithmetic and compared row for
  * row. The DuckDB oracle already cross-checks the SQL formulation;
  * this pins the semantics against something that is not SQL at all.
  *
  * NOTE the 2026-08-13 testdata regeneration made the embeddings
  * isotropic (same-label and cross-label mean cosine both ≈ 0), so
  * recall-vs-exact assertions would pin a DATA artifact, not an
  * operator property — a 10-codeword/8-dim-subspace quantizer cannot
  * beat chance on label-structureless vectors, and the operator's
  * contract is the ADC arithmetic, not the corpus's clusterability. */
class PqSpec extends AnyFunSuite with SparkFixture {

  // sf inherited from SparkFixture: /root/testdata/sf0.001

  test("q_ann_pq equals an independent driver-side PQ/ADC recomputation") {
    // raw embeddings, micro-quantized exactly as the query does
    val raw = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(x => math.floor(1000000.0 * x.toDouble).toLong).toArray))
      .sortBy(_._1)
    val labels = raw.map(_._2).distinct.sorted
    val nSub = 8
    val dims = 8
    // codebook: per (sub, label, dim) floored mean (exact-integer-input
    // double division, the query's own rule)
    val codebook: Map[(Int, Long), Array[Long]] =
      (for (s <- 0 until nSub; l <- labels) yield {
        val members = raw.filter(_._2 == l)
        val c = Array.tabulate(dims) { d =>
          val vals = members.map(_._3(s * dims + d))
          math.floor(vals.sum.toDouble / vals.length).toLong
        }
        (s, l) -> c
      }).toMap
    def sqDist(v: Array[Long], s: Int, c: Array[Long]): Long =
      (0 until dims).map { d => val x = v(s * dims + d) - c(d); x * x }.sum
    // encode: packed argmin min(dist*16 + label) % 16
    val codes: Map[Long, Array[Long]] = raw.map { case (id, _, v) =>
      id -> Array.tabulate(nSub) { s =>
        labels.map(l => sqDist(v, s, codebook((s, l))) * 16L + l).min % 16L
      }
    }.toMap
    // ADC: queries stay exact; candidates contribute their codeword dists
    val queries = raw.filter(_._1 < 10)
    val expected = queries.flatMap { case (aId, _, va) =>
      val lut = Array.tabulate(nSub)(s =>
        labels.map(l => l -> sqDist(va, s, codebook((s, l)))).toMap)
      val scored = raw.filter(_._1 != aId).map { case (bId, _, _) =>
        val adc = (0 until nSub).map(s => lut(s)(codes(bId)(s))).sum
        (bId, adc)
      }
      scored.sortBy { case (b, adc) => (adc, b) }.take(3).zipWithIndex
        .map { case ((bId, adc), i) => (aId, bId, adc, i + 1) }
    }.toSeq
    val got = queries_run()
    assert(got.size == expected.size, s"row count ${got.size} vs ${expected.size}")
    assert(got == expected, "PQ/ADC rows diverge from the independent reference")
    // structure: 8 one-byte codes per vector, every code a real label
    assert(codes.values.forall(c => c.length == nSub && c.forall(x => labels.contains(x))))
  }

  test("stored-index serve: no corpus re-encode in the plan, answers match the direct path") {
    // the indexed variant must agree row-for-row with the in-query build…
    val direct = graft.queries.LlmExt.q_ann_ivfpq(spark, sf).collect().toSeq
    val df = graft.queries.LlmExt.q_ann_ivfpq_indexed(spark, sf)
    assert(df.collect().toSeq == direct,
      "stored-index ADC diverges from the direct encode")
    // …and its plan must contain exactly ONE Generate (the QUERY-side
    // posexplode): the corpus encode pass lives in the index build, not
    // the serve plan — re-encoding per query is the anti-pattern a
    // persisted index exists to remove
    // AQE prints final AND initial plans — count the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val generates = "Generate explode|Generate posexplode".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 query-side explode, got $generates:\n$plan")
    // the query scan is pushed: only vec_id < 10 rows leave the parquet
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(vec_id,10)"),
      s"query-vector filter not pushed to the embeddings scan:\n$plan")
  }

  test("nprobe serve rides the STORED index: query-side-only explodes, zero index writes") {
    import graft.tables.TxTable
    val root = graft.queries.LlmExt.ivfpqIndexRoot(spark, sf)._1
    val parts = Seq("codes", "codebook", "centroids")
    val before = parts.map(p => TxTable.open(s"$root/$p").currentVersion)
    val df = graft.queries.LlmExt.q_ann_ivfpq_nprobe(spark, sf)
    assert(df.collect().length == 30) // 10 queries × top-3
    // both explodes are QUERY-side (cell ranking + LUT — each over the
    // pushed vec_id < 10 scan); a corpus re-encode would add a third,
    // unpushed one — the anti-pattern the persisted index removes
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val generates = "Generate explode|Generate posexplode".r.findAllIn(plan).size
    assert(generates <= 2, s"expected ≤2 query-side explodes, got $generates:\n$plan")
    assert(plan.contains("LessThan(vec_id,10)"),
      s"query-vector filter not pushed to the embeddings scan:\n$plan")
    // the serve is read-only on every stored index table
    val after = parts.map(p => TxTable.open(s"$root/$p").currentVersion)
    assert(before == after, s"the serve must not write the index: $before -> $after")
  }

  test("incremental refresh: delta-only encode, stored lists never rewrite on monotone ids") {
    import graft.tables.TxTable
    import org.apache.spark.sql.functions._
    // a private index copy (never the shared published root): base =
    // all but the last 50 vectors, codebook trained on the full corpus
    val all = graft.Tables.embeddings(spark, sf)
    val splitId = all.agg(max(col("vec_id"))).head().getLong(0) - 49L
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_refresh").toString
    val dims = graft.queries.LlmExt.pqDimsForSpec(all)
    val cb = dims.groupBy(col("sub"), col("label").as("cw"), col("dim"))
      .agg(floor(sum(col("qv")) / count(lit(1))).as("c"))
    val encBase = graft.queries.LlmExt.pqSdistForSpec(
        dims.filter(col("vec_id") < splitId), cb)
      .groupBy(col("vec_id"), col("label"), col("sub"))
      .agg(pmod(min(col("dist") * lit(16L) + col("cw")), lit(16L)).as("code"))
      .select(col("vec_id").as("b_id"), col("label").as("lb"),
        col("sub"), col("code"))
    new TxTable(s"$tmp/codes", Seq("lb", "b_id"))
      .append(spark, encBase.repartitionByRange(4, col("lb")))
    new TxTable(s"$tmp/codebook", Seq("sub")).append(spark, cb.repartition(1))
    val baseFiles = TxTable.open(s"$tmp/codes").snapshot().files.map(_.path).toSet
    // MONOTONE ingest: the tail batch's ids sit above every stored
    // file's b_id interval — the refresh must append without rewriting
    // a single stored list file
    val r = graft.queries.LlmExt.refreshPqIndex(spark, tmp,
      all.filter(col("vec_id") >= splitId))
    assert(r.rewrittenFiles == 0 && r.newFiles >= 1,
      s"monotone-id refresh must be pure insert, got $r")
    val afterFiles = TxTable.open(s"$tmp/codes").snapshot().files.map(_.path).toSet
    assert(baseFiles.subsetOf(afterFiles), "stored list files must carry BY NAME")
    // refreshed index codes == full-corpus one-shot encode, row for row
    val oneShot = graft.queries.LlmExt.pqSdistForSpec(dims, cb)
      .groupBy(col("vec_id"), col("label"), col("sub"))
      .agg(pmod(min(col("dist") * lit(16L) + col("cw")), lit(16L)).as("code"))
      .select(col("vec_id").as("b_id"), col("label").as("lb"),
        col("sub"), col("code"))
      .collect().map(_.toSeq).toSet
    val refreshed = TxTable.open(s"$tmp/codes").read(spark)
      .select(col("b_id"), col("lb"), col("sub"), col("code"))
      .collect().map(_.toSeq).toSet
    assert(refreshed == oneShot, "refresh path must converge to the one-shot encode")
    // a RE-EMBEDDED vector (overlapping id) re-codes copy-on-write:
    // only files whose b_id interval admits it rewrite
    val r2 = graft.queries.LlmExt.refreshPqIndex(spark, tmp,
      all.filter(col("vec_id") === 3L))
    assert(r2.rewrittenFiles >= 1 && r2.keptFiles >= 1,
      s"overlap refresh must rewrite only the admitting files, got $r2")
    assert(TxTable.open(s"$tmp/codes").read(spark)
      .filter(col("b_id") === 3L).count() == 8, "re-code must not duplicate")
    // TAKEDOWN (r14 verdict #4): tombstone the tail batch by id band.
    // Its monotone-ingest code files hold ONLY band ids (b_id stats
    // prove it), so the delete drops WHOLE FILES metadata-only — zero
    // list rewrites, zero deletion vectors — and the serve-side read
    // excludes the ids immediately, with no corpus re-encode anywhere
    val nBefore = TxTable.open(s"$tmp/codes").read(spark).count()
    val d = graft.queries.LlmExt.deletePqIndex(spark, tmp, splitId, splitId + 49L)
    assert(d.droppedFiles >= 1 && d.dvFiles == 0,
      s"a band-aligned takedown must drop whole files with no vectors, got $d")
    val served = TxTable.open(s"$tmp/codes").read(spark)
    assert(served.filter(col("b_id") >= splitId).count() == 0,
      "deleted ids must stop serving")
    assert(served.count() == nBefore - 50L * 8L,
      "every non-deleted code row must keep serving")
  }

  private def queries_run(): Seq[(Long, Long, Long, Int)] =
    graft.queries.LlmExt.q_ann_pq(spark, sf)
      .select(col("a_id"), col("b_id"), col("adc"), col("rn"))
      .as[(Long, Long, Long, Int)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaInt))
      .collect().toSeq
}
