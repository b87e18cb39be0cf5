package graft

import graft.operators.{ConnectedComponents, MinHashLsh, SetSimilarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random differential tests: the distributed operators vs
  * straightforward driver-side reference implementations on corpora the
  * hand-written edge cases would never enumerate. Fixed seeds keep every
  * trial deterministic (a failure always reproduces), while the random
  * structure — self-loops, duplicate edges, isolated vertices, dense
  * token overlap — probes shapes no fixture was designed around. */
class RandomizedDifferentialSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Reference union-find; returns vertex -> min id of its component. */
  private def unionFindMinLabel(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(v => v.toLong -> find(v).toLong).toMap
  }

  test("trigram search == brute-force substring scan on random corpora") {
    // Soundness of the necessary-condition index: for every pattern,
    // n_matches must equal the brute-force count (a missed candidate
    // would under-count — the one failure mode the trigram recipe must
    // never have), and n_candidates >= n_matches with equality allowed.
    // Small alphabet forces heavy gram collisions (real false-positive
    // pressure); doc lengths straddle the |pattern| and 3-char edges.
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val alpha = "abc"
      def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val docs = (0 until 120).map(i => (i.toLong, randStr(rnd.nextInt(30)))) // incl. len<3
      val pats = Seq(randStr(3), randStr(4), randStr(6)).distinct
      val got = queries.Analytics7
        .trgmSearch(spark, docs.toDF("doc_id", "text"), pats)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      pats.foreach { p =>
        val truth = docs.count(_._2.contains(p)).toLong
        val (nc, nm) = got.getOrElse(p, (0L, 0L))
        assert(nm == truth, s"trial $trial pat '$p': confirmed $nm != brute $truth")
        assert(nc >= nm, s"trial $trial pat '$p': candidates $nc < confirmed $nm")
      }
    }
  }

  test("Morton interleave == reference bit-interleave on random 16-bit pairs") {
    def refMorton(x: Long, y: Long): Long =
      (0 until 16).map { k =>
        (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pts.toDF("x", "y")
      .withColumn("z", graft.queries.Relational.mortonInterleave(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refMorton(x, y), s"($x, $y)")
    }
  }

  test("ConnectedComponents == union-find on random graphs (self-loops, dups, isolates)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(40)
      val m = rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = unionFindMinLabel(n, edges)
      val v = (0L until n.toLong).toDF("id")
      val e = edges.toDF("s", "d")
      val got = ConnectedComponents.minLabel(v, "id", e, "s", "d")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial=$trial n=$n edges=$edges")
    }
  }

  /** floor-quantized basis-point Jaccard of two token sets, as the engine
    * defines it. */
  private def jaccBp(a: Set[String], b: Set[String]): Long = {
    val i = (a & b).size
    val u = a.size + b.size - i
    if (u == 0) 10000L else math.floor(10000.0 * i / u).toLong
  }

  /** Random corpora with a SMALL vocabulary so pair similarities densely
    * cover the threshold region (near-misses included), plus planted
    * exact duplicates (the set-collapse path). */
  private def randomCorpus(rnd: scala.util.Random): Seq[(Long, Seq[String])] = {
    val nDocs = 30 + rnd.nextInt(30)
    val base = (0L until nDocs.toLong).map { d =>
      d -> Seq.fill(4 + rnd.nextInt(10))("t" + rnd.nextInt(12)).distinct
    }
    // ~1 in 5 docs is an exact duplicate of an earlier one
    base.map { case (d, toks) =>
      if (d > 0 && rnd.nextInt(5) == 0) d -> base(rnd.nextInt(d.toInt))._2
      else d -> toks
    }
  }

  test("SetSimilarity.exactJaccardPairs == brute force on random corpora") {
    Tables.ensure(spark)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val corpus = randomCorpus(rnd)
      val expected = (for {
        (da, ta) <- corpus; (db, tb) <- corpus if da < db
        bp = jaccBp(ta.toSet, tb.toSet) if bp >= 5000L
      } yield (da, db) -> bp).toMap
      val sets = corpus.toDF("doc_id", "toks")
        .select(col("doc_id"),
          expr("array_sort(transform(array_distinct(toks), w -> xxhash64(w)))").as("ws"))
      val got = SetSimilarity.exactJaccardPairs(sets, minBp = 5000L)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == expected, s"trial=$trial docs=${corpus.size} " +
        s"spurious=${(got.keySet -- expected.keySet).take(3)} " +
        s"missed=${(expected.keySet -- got.keySet).take(3)}")
    }
  }

  test("sorted_jaccard_ge_bp == (sorted_jaccard_bp >= t) on random arrays + edges") {
    Tables.ensure(spark)
    val rnd = new scala.util.Random(99)
    def arr() = Seq.fill(rnd.nextInt(12))(rnd.nextInt(15).toLong).distinct.sorted
    val thresholds = Seq(0L, 1L, 2500L, 5000L, 8000L, 10000L, 10001L)
    val rows = (1 to 400).map(i => (i.toLong, arr(), arr())) ++
      Seq((900L, Seq.empty[Long], Seq.empty[Long]), // both empty ⇒ jacc 10000
        (901L, Seq.empty[Long], Seq(1L, 2L)),       // one empty ⇒ jacc 0
        (902L, Seq(1L, 2L), Seq(1L, 2L)))           // identical ⇒ jacc 10000
    val df = rows.toDF("id", "a", "b")
    for (t <- thresholds) {
      val bad = df.selectExpr("id",
          s"sorted_jaccard_ge_bp(a, b, ${t}L) AS ge",
          s"(sorted_jaccard_bp(a, b) >= ${t}L) AS cmp")
        .filter(col("ge") =!= col("cmp")).count()
      assert(bad == 0, s"early-exit form diverges at t=$t")
    }
  }

  test("MinHashLsh: exact precision; complete recall on very-high-sim pairs") {
    Tables.ensure(spark)
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val corpus = randomCorpus(rnd)
      val exact = (for {
        (da, ta) <- corpus; (db, tb) <- corpus if da < db
      } yield (da, db) -> jaccBp(ta.toSet, tb.toSet)).toMap
      val docs = corpus.map { case (d, t) => (d, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = MinHashLsh.nearDupPairs(docs, minBp = 7000L)
        .as[(Long, Long, Long)].collect()
      // precision is exact: the confirm stage computes true Jaccard, so
      // every emitted pair must carry the brute-force value and clear the
      // threshold
      for ((da, db, bp) <- got) {
        assert(exact((da, db)) == bp && bp >= 7000L, s"trial=$trial pair=($da,$db)")
      }
      // recall: banding is probabilistic near the threshold (by design —
      // that IS the S-curve), but pairs at >= 0.9 Jaccard have miss
      // probability ~1e-4 per pair; with fixed seeds this either always
      // passes or flags a real recall bug
      val gotKeys = got.map(p => (p._1, p._2)).toSet
      val mustFind = exact.collect { case (k, bp) if bp >= 9000L => k }
      assert(mustFind.forall(gotKeys), s"trial=$trial missed high-sim: " +
        s"${mustFind.filterNot(gotKeys).take(3)}")
    }
  }

  test("skyline == driver-side dominance filter on random point sets") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // small coordinate domain forces heavy ties and duplicate points —
      // exactly where the strict/non-strict dominance cases live
      val raw = Seq.fill(400)((s"g${rnd.nextInt(3)}",
        rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val want = raw.distinct.groupBy(_._1).flatMap { case (_, grp) =>
        grp.filterNot { p =>
          grp.exists(q => q != p && q._2 <= p._2 && q._3 <= p._3 &&
            (q._2 < p._2 || q._3 < p._3))
        }
      }.toSet
      val got = queries.Analytics3.skyline(raw.toDF("g", "x", "y"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"trial=$trial: got ${got.size}, want ${want.size}, " +
        s"diff=${((got diff want) ++ (want diff got)).take(3)}")
    }
  }

  test("bfs == driver-side BFS levels on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val maxHops = 4
      // reference: level-synchronous BFS from vertex 0 over the
      // symmetrized adjacency (self-loops and duplicate edges included)
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      var level = Set(0L)
      var want = Map(0L -> 0L)
      for (k <- 1 to maxHops) {
        level = level.flatMap(adj.getOrElse(_, Set.empty)) -- want.keySet
        want = want ++ level.map(_ -> k.toLong)
      }
      // bfs symmetrizes internally — hand it the raw directed pairs
      val got = queries.Analytics3.bfs(edges.toDF("src", "dst"), Seq(0L).toDF("id"), maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial=$trial: diff=" +
        s"${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    }
  }

  test("winnowing guarantee holds on random docs with planted shared runs") {
    val rnd = new scala.util.Random(17)
    def randStr(len: Int) =
      Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 1 to 3) {
      val shared = randStr(12) // exactly k+w-1: the guarantee's boundary
      val docs = (1L to 6L).map { i =>
        val pre = randStr(5 + rnd.nextInt(30))
        val post = randStr(5 + rnd.nextInt(30))
        (i, pre + shared + post)
      }
      val fp = queries.Analytics2.winnowFingerprints(docs.toDF("doc_id", "text"))
        .select(col("doc_id"), expr("sel div 1048576").as("h"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for (a <- docs.map(_._1); b <- docs.map(_._1) if a < b) {
        assert((fp(a) & fp(b)).nonEmpty,
          s"trial=$trial: docs $a,$b share a 12-char run but no fingerprint")
      }
    }
  }

  test("TxTable random histories == in-memory model at EVERY version (incl. restore)") {
    // Model-based ACID check: a random interleaving of append / delete /
    // overwrite / merge / restore against a driver-side Map model,
    // verified not just at the end but at every historical version via
    // time travel — the multi-op interactions (restore of a merge,
    // delete after overwrite, merge across a restore) no hand-written
    // fixture enumerates. Keys stay unique per table (append draws fresh
    // keys) so the model is a Map; values encode provenance (k*10 + gen).
    import graft.tables.TxTable
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val t = new TxTable(
        java.nio.file.Files.createTempDirectory("graft_randhist").toString, Seq("k"))
      def df(rows: Map[Long, Long]) =
        rows.toSeq.toDF("k", "v").repartition(1 + rnd.nextInt(3))
      var model = Map.empty[Long, Long]
      var nextKey = 0L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = nextKey until (nextKey + n); nextKey += n; ks
      }
      val states = scala.collection.mutable.ArrayBuffer[(Int, Map[Long, Long])]()
      var gen = 0L
      for (_ <- 1 to 8) {
        gen += 1
        val op = if (t.currentVersion == 0) 0 else rnd.nextInt(5)
        val v = op match {
          case 0 => // append fresh keys
            val add = freshKeys(1 + rnd.nextInt(20)).map(k => k -> (k * 10 + gen)).toMap
            model = model ++ add
            t.append(spark, df(add))
          case 1 => // range delete over the live key space
            val lo = rnd.nextLong(nextKey max 1); val hi = lo + rnd.nextInt(15)
            model = model.filterNot { case (k, _) => k >= lo && k <= hi }
            t.delete(spark, "k", lo, hi).version
          case 2 => // overwrite everything
            val nw = freshKeys(1 + rnd.nextInt(10)).map(k => k -> (k * 10 + gen)).toMap
            model = nw
            t.overwrite(spark, df(nw))
          case 3 => // merge: update a random live subset + insert fresh
            val upd = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(10)
              .map(k => k -> (k * 10 + gen)).toMap
            val ins = freshKeys(rnd.nextInt(5)).map(k => k -> (k * 10 + gen)).toMap
            val src = upd ++ ins
            if (src.isEmpty) t.currentVersion // no-op round
            else { model = model ++ src; t.merge(spark, df(src), "k").version }
          case 4 => // restore to a random earlier recorded version
            val (rv, rm) = states(rnd.nextInt(states.size))
            model = rm
            t.restore(rv)
        }
        states += ((v, model))
      }
      // every recorded version must read back as its model — time travel
      // over the whole random history
      states.foreach { case (v, m) =>
        if (m.isEmpty)
          intercept[IllegalStateException](t.read(spark, Some(v)))
        else {
          val got = t.read(spark, Some(v)).select("k", "v")
            .as[(Long, Long)].collect().toMap
          assert(got == m, s"trial=$trial version=$v")
        }
      }
    }
  }

  test("TxTable random histories WITH RENAMES == model at every version") {
    // The column-mapping extension of the model test: random renames of
    // BOTH the value column and the stat/key column interleave with
    // append / delete / merge / restore. The model carries the logical
    // names per version; every data op always speaks the CURRENT logical
    // names (the user contract), and every historical version must read
    // back under the names it had THEN. Restore is FULL-state (Delta's
    // RestoreTableCommand copies the target's metadata): the restored
    // version's naming comes back with its data — the model encodes
    // that by adopting the recorded names of the restore target.
    import graft.tables.TxTable
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val t = new TxTable(
        java.nio.file.Files.createTempDirectory("graft_randren").toString, Seq("k"))
      var kName = "k"
      var vName = "v"
      def df(rows: Map[Long, Long]) =
        rows.toSeq.toDF(kName, vName).repartition(1 + rnd.nextInt(3))
      var model = Map.empty[Long, Long]
      var nextKey = 0L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = nextKey until (nextKey + n); nextKey += n; ks
      }
      val states = scala.collection.mutable.ArrayBuffer[(Int, Map[Long, Long], String, String)]()
      var gen = 0L
      for (_ <- 1 to 10) {
        gen += 1
        val op = if (t.currentVersion == 0) 0 else rnd.nextInt(6)
        val v = op match {
          case 0 =>
            val add = freshKeys(1 + rnd.nextInt(15)).map(k => k -> (k * 10 + gen)).toMap
            model = model ++ add
            t.append(spark, df(add))
          case 1 =>
            val lo = rnd.nextLong(nextKey max 1); val hi = lo + rnd.nextInt(12)
            model = model.filterNot { case (k, _) => k >= lo && k <= hi }
            t.delete(spark, kName, lo, hi).version
          case 2 =>
            val upd = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(8)
              .map(k => k -> (k * 10 + gen)).toMap
            val ins = freshKeys(rnd.nextInt(4)).map(k => k -> (k * 10 + gen)).toMap
            val src = upd ++ ins
            if (src.isEmpty) t.currentVersion
            else { model = model ++ src; t.merge(spark, df(src), kName).version }
          case 3 => // rename the value column (flip between v and amount)
            val to = if (vName == "v") "amount" else "v"
            val nv = t.renameColumn(vName, to); vName = to; nv
          case 4 => // rename the stat/key column (flip between k and id)
            val to = if (kName == "k") "id" else "k"
            val nv = t.renameColumn(kName, to); kName = to; nv
          case 5 =>
            val (rv, rm, rk, rvn) = states(rnd.nextInt(states.size))
            model = rm; kName = rk; vName = rvn
            t.restore(rv)
        }
        states += ((v, model, kName, vName))
      }
      states.foreach { case (v, m, kn, vn) =>
        if (m.isEmpty)
          intercept[IllegalStateException](t.read(spark, Some(v)))
        else {
          val got = t.read(spark, Some(v)).select(kn, vn)
            .as[(Long, Long)].collect().toMap
          assert(got == m, s"trial=$trial version=$v ($kn/$vn)")
        }
      }
    }
  }

  test("TxTable random histories WITH DROPS == model at every version") {
    // The drop-column extension of the model test: random drops of the
    // CURRENT value column interleave with appends (which may introduce
    // a FRESH value column — schema evolution — with old rows reading
    // NULL there), band deletes, and full-state restores. The model is
    // per-row column maps plus the live-column set per version; every
    // historical version must read back exactly its own visible schema
    // and values, restores must resurface dropped columns (the undrop
    // path), and an append that recycles a dropped physical name must be
    // refused loudly (the resurrection guard).
    import graft.tables.TxTable
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val t = new TxTable(
        java.nio.file.Files.createTempDirectory("graft_randdrop").toString, Seq("k"))
      var liveCols = Vector("v1")          // value columns currently visible
      var droppedCols = Set.empty[String]  // physically reserved forever
      var colSeq = 1
      var model = Map.empty[Long, Map[String, Long]] // k -> written cells
      var nextKey = 0L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = nextKey until (nextKey + n); nextKey += n; ks
      }
      def appendDf(keys: Seq[Long], cols: Seq[String], gen: Long) = {
        val rows = keys.map(k => Row.fromSeq(k +: cols.map(c => k * 10 + gen)))
        val schema = StructType(StructField("k", LongType, nullable = false) +:
          cols.map(c => StructField(c, LongType, nullable = false)))
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      }
      val states = scala.collection.mutable.ArrayBuffer[(Int, Map[Long, Map[String, Long]], Vector[String])]()
      var gen = 0L
      for (_ <- 1 to 12) {
        gen += 1
        val op = if (t.currentVersion == 0) 0 else rnd.nextInt(10)
        val v = op match {
          case 0 | 1 | 2 | 3 => // append, sometimes introducing a fresh column
            val cols =
              if (liveCols.isEmpty || rnd.nextInt(3) == 0) {
                colSeq += 1; liveCols = liveCols :+ s"v$colSeq"; liveCols
              } else liveCols
            val ks = freshKeys(1 + rnd.nextInt(10))
            model = model ++ ks.map(k => k -> cols.map(c => c -> (k * 10 + gen)).toMap)
            t.append(spark, appendDf(ks, cols, gen))
          case 4 | 5 => // band delete on the key column
            val lo = rnd.nextLong(nextKey max 1); val hi = lo + rnd.nextInt(12)
            model = model.filterNot { case (k, _) => k >= lo && k <= hi }
            t.delete(spark, "k", lo, hi).version
          case 6 | 7 => // drop a random live value column
            if (liveCols.isEmpty) t.currentVersion
            else {
              val c = liveCols(rnd.nextInt(liveCols.size))
              liveCols = liveCols.filterNot(_ == c); droppedCols += c
              t.dropColumn(c)
            }
          case 8 => // the resurrection guard: recycling a dropped name refuses
            if (droppedCols.isEmpty) t.currentVersion
            else {
              val c = droppedCols.head
              val e = intercept[IllegalArgumentException] {
                t.append(spark, appendDf(freshKeys(2), Seq(c), gen))
              }
              assert(e.getMessage.contains("reserved"), e.getMessage)
              nextKey -= 2 // the refused keys never landed
              t.currentVersion
            }
          case 9 => // full-state restore to a random recorded version
            val (rv, rm, rcols) = states(rnd.nextInt(states.size))
            model = rm
            // restore resurfaces THAT version's columns; physically
            // reserved names stay reserved (droppedCols only grows)
            liveCols = rcols
            t.restore(rv)
        }
        states += ((v, model, liveCols))
      }
      states.foreach { case (v, m, cols) =>
        if (m.isEmpty) {
          intercept[IllegalStateException](t.read(spark, Some(v)))
        } else {
          val got = t.read(spark, Some(v))
          assert(got.columns.toSet == (Set("k") ++ cols),
            s"trial=$trial version=$v: visible ${got.columns.toSet} != expected ${Set("k") ++ cols}")
          val rows = got.collect().map { r =>
            r.getAs[Long]("k") -> cols.flatMap(c =>
              Option(r.getAs[Any](c)).map(x => c -> x.asInstanceOf[Long])).toMap
          }.toMap
          // the model keeps every written cell; the version shows only
          // its LIVE columns — project before comparing
          val visible = m.map { case (k, cells) =>
            k -> cells.filter { case (c, _) => cols.contains(c) }
          }
          assert(rows == visible, s"trial=$trial version=$v")
        }
      }
    }
  }

  // ---- §2.25 graph mechanisms on random graphs: the corpus fixture is
  // one dense similarity graph; paths, stars, cliques and isolates are
  // the shapes its gates never show. Canonical (a<b, distinct) pairs —
  // the cellCosinePairs contract the mechanisms assume.
  private def randPairs(rnd: scala.util.Random, n: Int, m: Int): Seq[(Long, Long)] =
    (Seq((0L, 1L)) ++ Seq.fill(m) {
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }).filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct

  private def refPeel(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] = {
    var es = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (x, v) => x -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    es.groupBy(_._1).toSeq.map { case (x, v) => (x, v.size.toLong) }.sortBy(_._1)
  }

  test("kcore peel == reference fixpoint peel on random graphs and the path worst case") {
    val rnd = new scala.util.Random(19)
    val trials = (1 to 6).map { _ =>
      val n = 2 + rnd.nextInt(30)
      randPairs(rnd, n, rnd.nextInt(50)) -> n
    } :+ ((0L until 11L).map(i => (i, i + 1)) -> 12) :+ // path: 2 nodes peel per round
      ((Seq((0L, 1L), (1L, 2L), (0L, 2L)) ++ // triangle with a 7-node tail:
        (2L until 9L).map(i => (i, i + 1))) -> 10) // exactly ONE node peels per round
    for (((pairs, n), trial) <- trials.zipWithIndex) {
      // rounds = n+1 is the universal bound: every pre-fixpoint round
      // removes at least one node (the corpus gate's fixed 8 is the
      // measured fixpoint there, not a structural bound)
      val got = queries.Analytics9
        .kcoreOf(pairs.toDF("da", "db"), k = 2, rounds = n + 1)
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == refPeel(pairs, 2), s"trial $trial pairs=$pairs")
    }
  }

  test("linkpred wedge join == brute-force neighbor intersection on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val n = 2 + rnd.nextInt(25)
      val pairs = randPairs(rnd, n, rnd.nextInt(40))
      val got = queries.Analytics9.linkpredOf(pairs.toDF("da", "db"), k = 10000)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      val edgeSet = pairs.toSet
      val nbrs = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (x, v) => x -> v.map(_._2).toSet }
      val nodes = nbrs.keys.toSeq.sorted
      val want = (for {
        a <- nodes; b <- nodes if a < b && !edgeSet((a, b))
        common = (nbrs(a) & nbrs(b)).size if common > 0
      } yield {
        val (da, db) = (nbrs(a).size.toLong, nbrs(b).size.toLong)
        (a, b, common.toLong, da, db, 10000L * common / (da + db - common))
      }).sortBy { case (a, b, _, _, _, j) => (-j, a, b) }
      assert(got == want, s"trial $trial pairs=$pairs")
    }
  }

  test("ppr two-round iteration == reference integer fold on random graphs") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 6) {
      val n = 3 + rnd.nextInt(25)
      val pairs = randPairs(rnd, n, rnd.nextInt(40))
      val nodeRows = (0L until n.toLong).map(i => (i, if (i % 3 == 0) 1L else 0L))
      val got = queries.Analytics9
        .pprOf(nodeRows.toDF("id", "seed"), pairs.toDF("da", "db"), top = 10000)
        .as[(Long, Long, Long, Int)].collect().toSeq
      val symE = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = symE.groupBy(_._1).map { case (x, v) => x -> v.size.toLong }
      val seed = nodeRows.toMap
      def push(c: Map[Long, Long]): Map[Long, Long] =
        symE.filter(e => c.contains(e._1))
          .groupBy(_._2).map { case (b, es) => b -> es.map(e => c(e._1)).sum }
      val c1 = nodeRows.collect { case (i, 1L) if deg.contains(i) =>
        i -> 1000000L / deg(i) }.toMap
      val in1 = push(c1)
      val r1 = nodeRows.map { case (i, s) =>
        i -> ((15L * 1000000L * s + 85L * in1.getOrElse(i, 0L)) / 100L) }.toMap
      val c2 = nodeRows.collect { case (i, _) if deg.contains(i) =>
        i -> r1(i) / deg(i) }.toMap
      val in2 = push(c2)
      val top = nodeRows.map { case (i, s) =>
        (i, s, (15L * 1000000L * s + 85L * in2.getOrElse(i, 0L)) / 100L) }
        .filter(_._3 > 0).sortBy(r => (-r._3, r._1))
      val want = top.zipWithIndex.map { case ((i, s, p), k) => (i, s, p, k + 1) }
      assert(got == want, s"trial $trial pairs=$pairs")
    }
  }

  test("assortativity == reference Newman recompute on random, star and near-regular graphs") {
    val rnd = new scala.util.Random(31)
    val shapes: Seq[Seq[(Long, Long)]] = (1 to 4).map { _ =>
      randPairs(rnd, 3 + rnd.nextInt(20), rnd.nextInt(30))
    } :+ (1L to 8L).map(i => (0L, i)) :+ // star: maximally disassortative
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)) // 4-cycle: regular, dx=dy=0
    for ((pairs, trial) <- shapes.zipWithIndex) {
      val row = queries.Analytics9.assortOf(pairs.toDF("da", "db")).collect().head
      val (m, num, dx, dy) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      val symE = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val deg = symE.groupBy(_._1).map { case (x, v) => x -> BigInt(v.size) }
      val ks = symE.map { case (a, b) => (deg(a), deg(b)) }
      val rm = BigInt(ks.size)
      val sx = ks.map(_._1).sum; val sy = ks.map(_._2).sum
      val rnum = rm * ks.map(k => k._1 * k._2).sum - sx * sy
      val rdx = rm * ks.map(k => k._1 * k._1).sum - sx * sx
      val rdy = rm * ks.map(k => k._2 * k._2).sum - sy * sy
      assert((m, num, dx, dy) ==
        ((rm.toLong, rnum.toLong, rdx.toLong, rdy.toLong)), s"trial $trial pairs=$pairs")
      if (rdx > 0 && rdy > 0)
        assert(row.getDouble(4) == rnum.toDouble /
          (math.sqrt(rdx.toDouble) * math.sqrt(rdy.toDouble)), s"trial $trial")
      else assert(row.getDouble(4).isNaN, s"trial $trial: regular graph must yield NaN")
    }
  }
}
