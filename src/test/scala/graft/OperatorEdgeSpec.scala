package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built edge cases per operator family (SURVEY §5.2(2)): empty join
  * side, NULL keys, tied ranks, first-row lag, decimal sum exactness. */
class OperatorEdgeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("left join against empty right side counts 0, not null rows lost") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val right = Seq((99L, 5.0)).toDF("id", "x").filter(col("x") > 100)
    val out = left.join(right, Seq("id"), "left_outer")
      .groupBy(col("id")).agg(count(col("x")).as("n")).orderBy(col("id"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("NULL keys never equi-join (SQL semantics, not NULL-safe)") {
    val a = Seq(Some(1L), None).toDF("k")
    val b = Seq(Some(1L), None).toDF("k")
    assert(a.join(b, Seq("k")).count() == 1)
    assert(a.join(b, a("k") <=> b("k")).count() == 2) // null-safe variant
  }

  test("rank vs dense_rank vs row_number on ties") {
    val df = Seq(("g", 10.0, 1L), ("g", 10.0, 2L), ("g", 5.0, 3L)).toDF("g", "v", "id")
    val w = Window.partitionBy($"g").orderBy($"v".desc)
    val r = df.select(rank().over(w).as("rk"), dense_rank().over(w).as("drk")).distinct().count()
    assert(r == 2) // (1,1) twice and (3,2)
    val wt = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val rn = df.select($"id", row_number().over(wt).as("rn")).orderBy($"rn")
      .collect().map(_.getLong(0)).toSeq
    assert(rn == Seq(1L, 2L, 3L)) // tiebreaker makes it total
  }

  test("lag yields NULL on first row of each partition") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 15.0), (2L, 3L, 7.0)).toDF("u", "id", "v")
    val w = Window.partitionBy($"u").orderBy($"id")
    val out = df.withColumn("d", $"v" - lag($"v", 1).over(w))
      .orderBy($"u", $"id").collect()
    assert(out(0).isNullAt(3) && out(1).getDouble(3) == 5.0 && out(2).isNullAt(3))
  }

  test("decimal sum is exact where double sum need not be") {
    val vals = Seq.fill(1000)(0.1)
    val df = vals.toDF("v")
    val dec = df.agg(sum($"v".cast("decimal(18,2)")).cast("decimal(18,2)")).head.getDecimal(0)
    assert(dec.toString == "100.00")
  }

  test("empty aggregation group set yields empty result, count-only yields 0") {
    val df = Seq((1, 2)).toDF("a", "b").filter($"a" > 5)
    assert(df.groupBy($"a").count().count() == 0)
    assert(df.agg(count(lit(1))).head.getLong(0) == 0L)
  }

  test("sorted_intersect_size / sorted_jaccard_bp: merge pass vs built-ins") {
    Tables.ensure(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),   // overlap 2, union 4 -> 5000 bp
      (Seq(1L, 2L), Seq(3L, 4L)),           // disjoint -> 0
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),   // identical -> 10000
      (Seq.empty[Long], Seq(1L)),           // one empty -> 0
      (Seq.empty[Long], Seq.empty[Long]))   // both empty -> 10000 by convention
      .toDF("a", "b")
    val got = df.selectExpr("sorted_intersect_size(a, b)", "sorted_jaccard_bp(a, b)")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((2, 5000L), (0, 0L), (3, 10000L), (0, 0L), (0, 10000L)))
    // cross-check against the built-in formulation on the same rows
    val builtin = df.filter(size($"a") + size($"b") > 0).selectExpr(
      "size(array_intersect(a, b)) AS i",
      "CAST(floor(10000.0 * size(array_intersect(a, b)) / (size(a) + size(b) - size(array_intersect(a, b)))) AS BIGINT) AS bp")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got.take(4).map(t => (t._1, t._2)) == builtin)
  }

  test("float_dot: NULL on length mismatch / null elements, == builtin fold") {
    Tables.ensure(spark)
    val df = Seq(
      (Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(3f), Some(4f))))
      .toDF("a", "b")
      .selectExpr("cast(a as array<float>) AS a", "cast(b as array<float>) AS b")
    val viaExpr = df.selectExpr("float_dot(a, b)").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    val viaChain = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (s, v) -> s + v)")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(viaExpr == Seq(Some(11.0), None, None))
    assert(viaExpr == viaChain) // the documented equivalence, incl. null cases
  }

  test("char_ngram_hashes == higher-order-function chain on corpus docs") {
    Tables.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val viaExpr = docs.select($"doc_id", expr("char_ngram_hashes(text, 3)").as("ws"))
    val viaChain = docs.select($"doc_id", expr(
      "array_sort(transform(array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))), g -> xxhash64(g)))").as("ws"))
    val a = viaExpr.as[(Long, Seq[Long])].collect().toMap
    val b = viaChain.as[(Long, Seq[Long])].collect().toMap
    assert(a.nonEmpty && a == b)
    // short-string edge: len < n yields empty (not Spark's descending sequence)
    val short = Seq("ab").toDF("text").selectExpr("char_ngram_hashes(text, 3)")
      .as[Seq[Long]].head
    assert(short.isEmpty)
    // non-BMP: SQL length/substring count code points; the expression must
    // window identically and never split a surrogate pair ("𝕏" and "😀"
    // are each 2 UTF-16 chars / 1 code point)
    val nonBmp = Seq("a𝕏b😀c", "😀😀😀😀", "𝕏").toDF("text")
    val e = nonBmp.selectExpr("char_ngram_hashes(text, 3)").as[Seq[Long]].collect().toSeq
    val c = nonBmp.selectExpr(
      "array_sort(transform(array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))), g -> xxhash64(g)))")
      .as[Seq[Long]].collect().toSeq
    // guard: length(text)-2 < 1 makes sequence() count DOWN in Spark; the
    // 1-code-point row exercises the expression's empty path directly
    assert(e.last.isEmpty)
    assert(e.take(2) == c.take(2))
  }

  test("q_agg_hll_merge: union of daily sketches == single-pass sketch, within bounds of exact") {
    Tables.ensure(spark)
    val merged = SparkEntry.queries("q_agg_hll_merge")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // mergeability is the CLAIM: union of per-day sketches must equal the
    // sketch built in one pass over the same rows
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, s"merged=$merged direct=$direct")
    // and the estimate itself within sketch error of the exact count
    // (lgConfigK=12 default ⇒ rsd ≈ 1.6%; allow 3σ ≈ 5%, min slack 3)
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, est) <- merged) {
      val e = exact(k)
      assert(math.abs(est - e) <= math.max(3.0, 0.05 * e), s"$k est=$est exact=$e")
    }
  }

  test("q_agg_approx: HLL estimates land within error bounds of exact counts") {
    // the one oracle-less relational query gets a quantitative check:
    // approx_count_distinct's default rsd is 5%, so 3σ ≈ 15%
    val approx = SparkEntry.queries("q_agg_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.15, s"$k: approx ${approx(k)} vs exact $n (err $err)")
    }
  }

  test("q_zorder: every tile's min/max span stays inside its 16x16 box") {
    // the point of the Morton key: tile = z >> 8 confines each tile to a
    // 16-aligned 16x16 box in (x, y) space, which is what makes per-tile
    // min/max statistics selective for 2-D predicate file-skipping
    val rows = SparkEntry.queries("q_zorder")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getAs[Long]("min_x"), r.getAs[Long]("max_x"))
      val (minY, maxY) = (r.getAs[Long]("min_y"), r.getAs[Long]("max_y"))
      assert(maxX - minX <= 15 && maxX / 16 == minX / 16,
        s"tile ${r.get(0)} x-span [$minX,$maxX] crosses a 16-box")
      assert(maxY - minY <= 15 && maxY / 16 == minY / 16,
        s"tile ${r.get(0)} y-span [$minY,$maxY] crosses a 16-box")
    }
  }

  test("count_min_sketch: one-sided error bound vs exact counts, partition-order-free bytes") {
    // the mergeable heavy-hitter summary: per-partition sketches sum
    // cell-wise (two-phase agg), so the SQL aggregate ships bounded bytes
    // per partition at any scale. CMS guarantees est >= true and
    // est <= true + eps*N (w.h.p.); cells are plain counters, so the
    // serialized sketch is identical under ANY partitioning — asserted by
    // byte equality across repartitions (the determinism contract that
    // would let this ship as a query if the harness compared binaries)
    val ev = Tables.events(spark, sf)
    def sketchBytes(parts: Int): Array[Byte] = ev.repartition(parts)
      .selectExpr("count_min_sketch(user_id, CAST(0.01 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)")
      .head.getAs[Array[Byte]](0)
    val bytes = sketchBytes(3)
    assert(java.util.Arrays.equals(bytes, sketchBytes(7)),
      "CMS bytes differ across partitionings")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val total = ev.count()
    val slack = math.ceil(0.01 * total).toLong
    val exact = ev.groupBy(col("user_id")).count().collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (u, c) = (r.getLong(0), r.getLong(1))
      val est = cms.estimateCount(java.lang.Long.valueOf(u))
      assert(est >= c && est <= c + slack,
        s"user $u: exact $c, estimate $est outside [+0, +$slack]")
    }
  }

  test("approx_top_k: exact when tracked items cover the domain") {
    // Spark 4's sketch-based top-k: with maxItemsTracked >= |domain| the
    // summary degrades to exact counts — pin that boundary so the sketch
    // path can be confirmed against the exact aggregation it replaces
    val got = Tables.events(spark, sf)
      .selectExpr("explode(approx_top_k(event_type, 5, 100)) AS e")
      .selectExpr("e.item AS event_type", "e.count AS n")
      .orderBy(col("event_type")).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type")).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("pipeline dedup survivor selection keeps MIN doc_id per duplicate group") {
    // the driver corpus has no duplicate texts at the oracle scale
    // factors, so q_pipeline_prepare's dedup stage filters nothing there —
    // synthetic duplicates exercise the survivor rule directly
    import spark.implicits._
    val docs = Seq((5L, "alpha beta"), (2L, "alpha beta"), (9L, "alpha beta"),
      (3L, "gamma"), (7L, "delta")).toDF("doc_id", "text")
    val out = graft.queries.LlmExt.dedupSurvivors(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 3L, 7L))
  }

  test("rolling-hash fingerprint fold matches a reference implementation") {
    val df = Seq("scan merge table").toDF("text")
    val got = df.select(expr(
      "aggregate(transform(split(text, ' '), w -> CAST(ascii(w) + length(w) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)")).head.getLong(0)
    val expected = "scan merge table".split(" ")
      .map(w => w.head.toLong + w.length)
      .foldLeft(0L)((acc, x) => (acc * 31 + x) % 1000000007)
    assert(got == expected)
  }
}
