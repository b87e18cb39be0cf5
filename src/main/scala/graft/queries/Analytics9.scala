package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 seventh-continuation additions (SURVEY §2.25): web-pipeline
  * URL canonicalization, lag-1 autocorrelation (the detection tier's
  * periodicity screen), and two graph-analytics faces the family still
  * lacked — common-neighbor link prediction and k-core decomposition.
  * Same disciplines as Analytics8: exact BIGINT statistics (one division
  * at the end, integer cross-multiply flags), fixed unrolled rounds for
  * anything iterative so the computation is deterministic and earns a
  * real SQL oracle, and windows only over key-bounded frames. */
object Analytics9 {

  /** URL CANONICALIZATION + CANONICAL DEDUP — the first operator of every
    * web-crawl pipeline: raw URLs differ in scheme/host case, default
    * ports, fragment, tracking parameters and query-parameter order while
    * naming the same resource; fetching or training on them un-canonicalized
    * double-counts the page. Raw URLs are synthesized deterministically
    * from the corpus keys (the q_ip_lpm recipe — no URL column exists in
    * the testdata), then canonicalized by STRING SURGERY on the URL itself
    * (the real pipeline path): strip fragment, lowercase scheme+host, drop
    * the scheme-default port, drop `utm_*` tracking parameters, sort the
    * surviving query parameters — all codegen'd built-ins
    * (`substring_index`/`split`/`filter`/`array_sort`/`array_join`, no
    * UDF). The dedup is then exact-group on the canonical string with a
    * min-doc_id survivor (the q_dedup_exact contract). The ORACLE takes
    * the opposite route — it rebuilds the canonical form directly from the
    * generating parts, never parsing the raw string — so the gate is a
    * genuine parse-vs-generate differential: a canonicalization bug on the
    * Spark side cannot be mirrored in the oracle. At 100 TB this is one
    * map-side string pass + one exact-key two-phase agg — embarrassingly
    * parallel, the same shape as q_dedup_exact. */
  def q_url_canon(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit("HTTP://WWW."), upper(col("source")), lit(".Example.COM:80/item/"),
        col("doc_id") % 10, lit("?utm_campaign=c"), col("doc_id") % 4,
        lit("&b="), col("doc_id") % 3, lit("&a="), col("doc_id") % 5,
        lit("#sec"), col("doc_id") % 2).as("raw_url"))
    val canon = raw
      .withColumn("nofrag", substring_index(col("raw_url"), "#", 1))
      .withColumn("scheme", lower(substring_index(col("nofrag"), "://", 1)))
      .withColumn("rest", substring_index(col("nofrag"), "://", -1))
      .withColumn("auth", substring_index(col("rest"), "/", 1))
      .withColumn("pathq", expr("substring(rest, length(auth) + 1)"))
      .withColumn("host", lower(substring_index(col("auth"), ":", 1)))
      .withColumn("port",
        when(col("auth").contains(":"), substring_index(col("auth"), ":", -1))
          .otherwise(lit("")))
      .withColumn("portpart",
        when(col("port") === "" ||
          (col("scheme") === "http" && col("port") === "80") ||
          (col("scheme") === "https" && col("port") === "443"), lit(""))
          .otherwise(concat(lit(":"), col("port"))))
      .withColumn("path", substring_index(col("pathq"), "?", 1))
      .withColumn("q",
        when(col("pathq").contains("?"), substring_index(col("pathq"), "?", -1))
          .otherwise(lit("")))
      .withColumn("params", array_join(array_sort(
        filter(split(col("q"), "&"),
          p => !p.startsWith("utm_") && p =!= "")), "&"))
      .withColumn("canon_url", concat(col("scheme"), lit("://"), col("host"),
        col("portpart"), col("path"),
        when(col("params") === "", lit("")).otherwise(concat(lit("?"), col("params")))))
    canon.groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc"))
      .orderBy(col("canon_url"))
  }

  /** LAG-1 AUTOCORRELATION per host — the detection tier's periodicity /
    * trend-memory screen beside q_bot_cadence (regular TIMING) and
    * q_trend_ols (monotone drift): does this host's metric VALUE remember
    * its previous sample? Pearson correlation of the (previous, current)
    * cent-quantized pairs, every sufficient statistic an exact BIGINT
    * carried through one lag window (the same single user_id shuffle the
    * cadence pass uses) and one map-combinable moment agg; the ONLY float
    * is the final num/√(dx·dy) — a single IEEE expression over exact
    * integer inputs, so both engines produce the identical double (the
    * q_ip_lpm v_sum precedent). sqrt(dx)·sqrt(dy) is deliberately two
    * sqrts: dx·dy would overflow BIGINT range before the conversion.
    * Flags by integer cross-multiply: oscillating (num < 0) and sticky
    * (4·num² comparison is avoided the same way — |acf| ≥ ½ via
    * 4·num·num would overflow, so the flag ships as the sign only; the
    * magnitude is the double). Magnitudes: cents ≤ 5.7e4, per-host n ≤
    * low 10³ at sf0.1 ⇒ m·Σxy ≲ 1e14, far from the 9.2e18 edge; at
    * petabyte per-host counts the partials widen to DECIMAL(38,0) (the
    * q_conc_gini note). */
  def q_ts_autocorr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("y"))
      .withColumn("x", lag(col("y"), 1).over(w))
      .filter(col("x").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
      .withColumn("acf_num", col("m") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dx", col("m") * col("sx2") - col("sx") * col("sx"))
      .withColumn("dy", col("m") * col("sy2") - col("sy") * col("sy"))
      .filter(col("dx") > 0 && col("dy") > 0)
      .withColumn("acf", col("acf_num").cast("double") /
        (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))))
      .withColumn("oscillating", col("acf_num") < 0)
      .select(col("user_id"), col("m"), col("acf_num"), col("dx"), col("dy"),
        col("acf"), col("oscillating"))
      .orderBy(col("user_id"))
  }

  /** COMMON-NEIGHBOR LINK PREDICTION — the graph family's "which edge is
    * missing?" face beside BFS (reachability), PageRank (centrality),
    * triangles (closure), CC/LPA (structure): over the cell-bounded
    * similarity graph, every NON-adjacent pair sharing at least one
    * neighbor, scored by common-neighbor count and neighbor-set Jaccard
    * in exact basis points (10⁴·|Γa∩Γb| div (|Γa|+|Γb|−|Γa∩Γb|) — the
    * denominator is ≥ 1 because a shared neighbor exists). Plan: the
    * half-size edge set persisted once (the PageRank discipline), wedges
    * by ONE self-equi-join on the shared-neighbor key (the triangle-count
    * shape — cost Σdeg², the graph-mining bound, never |V|²), existing
    * edges removed by a left-anti on the canonical (a<b) pair, degrees
    * broadcast back on the node key. Top 50 by score with full
    * deterministic tie-break. */
  def q_graph_linkpred(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 1000)
    // minBp 2000 (vs the dedup tier's 3000): link prediction needs a graph
    // with WEDGES — at 3000 this corpus is a near-matching (max common
    // neighbor count 0-1) and the operator has nothing to predict over
    val p = LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).persist()
    linkpredOf(p, k = 50)
  }

  /** The wedge-join mechanism over a canonical (da < db, distinct) pair
    * frame — factored so the randomized differential can drive arbitrary
    * graphs (isolates, paths, cliques) through the identical plan. */
  private[graft] def linkpredOf(p: DataFrame, k: Int): DataFrame = {
    val sym = p.union(p.select(col("db").as("da"), col("da").as("db")))
    val deg = sym.groupBy(col("da")).agg(count(lit(1)).as("dg"))
    val wedges = sym.select(col("da").as("n"), col("db").as("xa"))
      .join(sym.select(col("da").as("n"), col("db").as("xb")), "n")
      .filter(col("xa") < col("xb"))
      .groupBy(col("xa"), col("xb")).agg(count(lit(1)).as("n_common"))
    val cand = wedges.join(p,
        wedges("xa") === p("da") && wedges("xb") === p("db"), "left_anti")
    cand
      .join(deg.select(col("da").as("xa"), col("dg").as("deg_a")), "xa")
      .join(deg.select(col("da").as("xb"), col("dg").as("deg_b")), "xb")
      .withColumn("jac_bp",
        expr("(10000 * n_common) div (deg_a + deg_b - n_common)"))
      .select(col("xa").as("node_a"), col("xb").as("node_b"), col("n_common"),
        col("deg_a"), col("deg_b"), col("jac_bp"))
      .orderBy(col("jac_bp").desc, col("node_a"), col("node_b"))
      .limit(k)
  }

  /** K-CORE DECOMPOSITION (k=2, eight unrolled peeling rounds) — the
    * graph-pruning face: repeatedly remove nodes of degree < k; what
    * survives is the subgraph where every node keeps ≥ k neighbors
    * AMONG SURVIVORS — the standard dense-community seed (a high-degree
    * node whose neighbors are all leaves does NOT survive, which is
    * exactly what a raw degree filter gets wrong). The round count is
    * FIXED at 8 — measured fixpoint is 7/5/2 rounds at sf0.001/0.01/0.1
    * (peeling is idempotent past the fixpoint, so the spare round is a
    * no-op) — which keeps the peel deterministic and SQL-expressible
    * with no per-round driver action (the q_graph_lpa contract, and
    * cheaper than convergence-checked looping: ONE plan, zero
    * driver-side counts; the spec differentials against a run-to-
    * FIXPOINT peel, so a corpus needing a 9th round fails loudly).
    * Each round is one two-phase degree agg + two semi-joins on the
    * node key — O(rounds·|E|), the same shape at 100 TB. Each round's
    * survivor edge set is lineage-cut with a lazy localCheckpoint (the
    * [[graft.operators.ConnectedComponents]] discipline): the round
    * plan references its predecessor THREE times (the degree agg and
    * both semi-joins), so without the cut the logical plan grows 3^rounds
    * and the planner itself OOMs before a byte of data moves. */
  def q_graph_kcore(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 1000)
    val p = LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).persist()
    kcoreOf(p, k = 2, rounds = 8)
      .select(col("da").as("vec_id"), col("deg"))
      .orderBy(col("vec_id"))
  }

  /** The peel mechanism over a canonical pair frame, round count
    * explicit — the gate binds the corpus-measured 8; the randomized
    * differential binds rounds ≥ |V|/2+1 (a path graph needs one round
    * per endpoint pair, the worst case) so the MECHANISM is pinned on
    * graphs the fixture never shows. */
  private[graft] def kcoreOf(p: DataFrame, k: Int, rounds: Int): DataFrame = {
    var sym = p.union(p.select(col("db").as("da"), col("da").as("db")))
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy(col("da")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select(col("da").as("kid"))
      sym = sym
        .join(keep.select(col("kid").as("da")), Seq("da"), "left_semi")
        .join(keep.select(col("kid").as("db")), Seq("db"), "left_semi")
        .select(col("da"), col("db"))
        .localCheckpoint(eager = false) // materialized by the final agg
    }
    sym.groupBy(col("da")).agg(count(lit(1)).as("deg"))
  }

  /** CHI-SQUARE INDEPENDENCE SCREEN (event_type × weekday) — the
    * detection tier's categorical face beside q_ab_welch (two-sample
    * means) and the drift stats (KS/TVD/Hellinger, one dimension): is
    * the event mix independent of the day of week, and WHICH cell
    * deviates? Weekday is computed ARITHMETICALLY from epoch days
    * ((days+4) mod 7, Sunday=0) — `dayofweek` numbering differs across
    * engines (the §2.10 rule), epoch arithmetic cannot. Per cell the
    * exact-BIGINT scaled residual N·O − R·C (sign = over/under-
    * represented, zero exactly at independence) and its χ² contribution
    * (N·O−R·C)²/(N·R·C) as ONE double expression over exact ints —
    * emitting per-cell contributions instead of the summed statistic
    * keeps the gate float-summation-order-free AND is the more useful
    * output (the analyst's first question is "which cell"). Magnitudes:
    * N ≤ 1e5 at sf0.1 ⇒ N·R·C ≤ 1e15, residual ≤ 1e10 — BIGINT-exact
    * with 3 decades of headroom. Plan: one map-combinable cell agg, two
    * broadcast marginal joins, one broadcast 1-row grand total — the
    * contingency table is CELLS-sized (|types|·7), never data-sized. */
  def q_stat_chisq(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        pmod(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 4, lit(7))
          .cast("long").as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r_tot"))
    val ct = cells.groupBy(col("dow")).agg(sum(col("o")).as("c_tot"))
    val nn = cells.agg(sum(col("o")).as("n"))
    cells.join(broadcast(rt), Seq("event_type"))
      .join(broadcast(ct), Seq("dow"))
      .crossJoin(broadcast(nn))
      .withColumn("resid", col("n") * col("o") - col("r_tot") * col("c_tot"))
      .withColumn("contrib",
        (col("resid").cast("double") * col("resid").cast("double")) /
          (col("n") * col("r_tot") * col("c_tot")).cast("double"))
      .withColumn("over_rep", col("resid") > 0)
      .select(col("event_type"), col("dow"), col("o"), col("r_tot"),
        col("c_tot"), col("n"), col("resid"), col("contrib"), col("over_rep"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** HIGHER MOMENTS (skewness + excess kurtosis) per host — the
    * distribution-SHAPE screen the stats family lacked (mean/var/corr/
    * quantiles exist; "is the tail one-sided, is it heavy" did not).
    * Values quantized to WHOLE units (floor(v+0.5) ≤ ~570) so the 3rd-
    * moment numerator m²Σy³ − 3mΣyΣy² + 2(Σy)³ stays BIGINT-exact
    * (≤ ~1e15 at per-host m ≤ 10² — cent quantization would put m²Σy³
    * at 1e20, past the 9.2e18 edge; shape statistics are scale-free, so
    * the coarser unit changes nothing but the safe range). The 4th-
    * moment numerator m³Σy⁴ − 4m²ΣyΣy³ + 6m(Σy)²Σy² − 3(Σy)⁴ tops
    * ~6e23, past ANY 64-bit plan, so it alone widens to DECIMAL(38,0)
    * on the Spark side and HUGEINT on the oracle side (both exact
    * integer domains; both convert the identical integer to the
    * identical nearest double — the engine-portable int128 recipe).
    * Skew √m·M3/M2^{3/2} and excess kurtosis m·M4/M2² − 3 are each ONE
    * double expression over those exact integers; the right_skewed flag
    * is the integer sign of M3. One map-combinable agg, no window. */
  def q_stat_moments(spark: SparkSession, dir: String): DataFrame =
    momentsOf(Tables.events(spark, dir)
      .select(col("user_id"), floor(col("value") + 0.5).cast("long").as("y")))

  /** The moment pipeline over a pre-quantized (user_id, y:long) frame —
    * factored out so the spec can drive a CONSTRUCTED extreme series
    * (m=99, y=570 ⇒ m³Σy⁴ ≈ 1.02e19, past int64) through the identical
    * Column expressions; the corpus only crosses that edge at sf0.1,
    * which the correctness gate never runs. */
  private[graft] def momentsOf(quantized: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    quantized
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("m"),
        sum(col("y")).as("s1"),
        sum(col("y") * col("y")).as("s2"),
        sum(col("y") * col("y") * col("y")).as("s3"),
        sum(col("y") * col("y") * col("y") * col("y")).as("s4"))
      .withColumn("m2n", col("m") * col("s2") - col("s1") * col("s1"))
      .withColumn("m3n",
        col("m") * col("m") * col("s3") -
          lit(3L) * col("m") * col("s1") * col("s2") +
          lit(2L) * col("s1") * col("s1") * col("s1"))
      .withColumn("m4",
        (d(col("m")) * d(col("m")) * d(col("m")) * d(col("s4")) -
          d(lit(4L)) * d(col("m")) * d(col("m")) * d(col("s1")) * d(col("s3")) +
          d(lit(6L)) * d(col("m")) * d(col("s1")) * d(col("s1")) * d(col("s2")) -
          d(lit(3L)) * d(col("s1")) * d(col("s1")) * d(col("s1")) * d(col("s1")))
          .cast("double"))
      .filter(col("m2n") > 0)
      .withColumn("skew",
        (sqrt(col("m").cast("double")) * col("m3n").cast("double")) /
          (col("m2n").cast("double") * sqrt(col("m2n").cast("double"))))
      .withColumn("ex_kurt",
        (col("m").cast("double") * col("m4")) /
          (col("m2n").cast("double") * col("m2n").cast("double")) - lit(3.0))
      .withColumn("right_skewed", col("m3n") > 0)
      .select(col("user_id"), col("m"), col("s1"), col("s2"), col("s3"),
        col("s4"), col("m2n"), col("m3n"), col("m4"), col("skew"),
        col("ex_kurt"), col("right_skewed"))
      .orderBy(col("user_id"))
  }

  /** HAMPEL FILTER — ROLLING-MEDIAN outlier detection per host: a point
    * is anomalous when it deviates from the MEDIAN of its ±2 neighborhood
    * by more than k·1.4826·MAD (the robust z-score recipe; q_anomaly_mad
    * applies it against the GLOBAL per-segment distribution — the Hampel
    * face is LOCAL, so a level shift does not poison the detector and a
    * spike inside a calm stretch still fires). Everything is exact
    * integers: the 5-point window assembled by lag/lead (a FULL window
    * only — 5 is odd, so the median is an order statistic, never an
    * average), median and MAD by sorting the 5-element ARRAY inside the
    * row (array_sort + element_at — no second window, no UDF), and the
    * k·1.4826 threshold cross-multiplied to 10⁴ scale
    * (10000·|y−med| > 44478·mad) so the flag never touches a float.
    * One user_id shuffle; the per-row array work is codegen'd. */
  def q_ts_hampel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("y"))
      .withColumn("l2", lag(col("y"), 2).over(w))
      .withColumn("l1", lag(col("y"), 1).over(w))
      .withColumn("r1", lead(col("y"), 1).over(w))
      .withColumn("r2", lead(col("y"), 2).over(w))
      .filter(col("l2").isNotNull && col("r2").isNotNull)
      .withColumn("arr", array_sort(array(col("l2"), col("l1"), col("y"),
        col("r1"), col("r2"))))
      .withColumn("med", element_at(col("arr"), 3))
      .withColumn("mad", element_at(
        array_sort(transform(col("arr"), v => abs(v - col("med")))), 3))
      .withColumn("dev", abs(col("y") - col("med")))
      .withColumn("outlier", col("dev") * 10000L > col("mad") * 44478L)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("y"),
        col("med"), col("mad"), col("dev"), col("outlier"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** INTERVAL-UNION COVERAGE — per host, the total distinct time covered
    * by overlapping activity intervals (monitoring's "how long was the
    * host actually busy": naive Σduration double-counts overlap;
    * q_sessionize answers a different question — gap-based episode
    * boundaries — where this is the measure-theoretic union length).
    * Interval = [ts, ts + 10 ms·cents] (duration derived from the
    * metric value — the corpus carries no duration column). The
    * sweep-line is ONE window pass: sort by start within host, carry
    * the running max end over ROWS UNBOUNDED PRECEDING..1 PRECEDING,
    * clip each interval's contribution to max(0, end − max(start,
    * prev_max_end)) — exact µs BIGINTs summed map-side after the single
    * user_id shuffle. A row whose start exceeds prev_max_end opens a new
    * connected segment, so n_segments falls out of the same pass. */
  def q_ts_coverage(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          floor(col("value") * 100 + 0.5).cast("long") * 10000L).as("e"))
      .withColumn("pmax", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("contrib", greatest(lit(0L),
        col("e") - greatest(col("s"), coalesce(col("pmax"), col("s")))))
      .withColumn("opens", (col("pmax").isNull || col("s") > col("pmax")).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("e") - col("s")).as("sum_dur_us"),
        sum(col("contrib")).as("covered_us"),
        sum(col("opens")).as("n_segments"))
      .withColumn("overlap_us", col("sum_dur_us") - col("covered_us"))
      .orderBy(col("user_id"))
  }

  /** PERSONALIZED PAGERANK — relevance-to-a-SEED-SET over the similarity
    * graph (the training-data curation face: seeds = a curated
    * high-quality slice; PPR scores every other document by graph
    * proximity for crawl/keep prioritization — where q_graph_pagerank
    * answers "globally central", PPR answers "central RELATIVE TO what I
    * already trust"). Same exact-integer recipe as q_graph_pagerank
    * (scale 10⁶, `div` never `/`): the restart mass 15 % lands ONLY on
    * the 20 seeds (vec_id ≡ 0 mod 50) instead of uniformly, two unrolled
    * synchronous rounds, contributions broadcast per round (the
    * node-bounded frame), one dst aggregation per round over the
    * persisted half-size edge cache. Isolated non-seeds carry exactly
    * zero and are dropped; top-30 via TakeOrderedAndProject + the
    * broadcast rank derivation (Q.rankTopK) — never a global window. */
  def q_graph_ppr(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 1000)
    val p = LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).persist()
    val nodes = e.select(col("vec_id").as("id"),
      (col("vec_id") % 50 === 0).cast("long").as("seed"))
    pprOf(nodes, p, top = 30)
  }

  /** The two-round seeded power iteration over an explicit (id, seed)
    * node frame + canonical pair frame — factored for the randomized
    * differential (arbitrary seed sets, isolates, leaf chains). */
  private[graft] def pprOf(nodes: DataFrame, p: DataFrame, top: Int): DataFrame = {
    val scale = 1000000L
    val sym = p.union(p.select(col("db").as("da"), col("da").as("db")))
    val deg = sym.groupBy(col("da")).agg(count(lit(1)).as("deg"))
    val c1 = nodes.filter(col("seed") === 1)
      .join(deg.select(col("da").as("id"), col("deg")), Seq("id"))
      .select(col("id").as("da"), expr(s"(${scale}L) div deg").as("c"))
    // node-state joins carry no broadcast() hint: AQE size-gates them
    // (forced, they would OOM at the 100× id domain)
    val in1 = sym.join(c1, Seq("da"))
      .groupBy(col("db")).agg(sum(col("c")).as("s"))
    val r1 = nodes.join(in1.select(col("db").as("id"), col("s")), Seq("id"), "left")
      .select(col("id"), col("seed"),
        expr(s"(15L * ${scale}L * seed + 85L * coalesce(s, 0L)) div 100L").as("r"))
    val c2 = r1.join(deg.select(col("da").as("id"), col("deg")), Seq("id"))
      .select(col("id").as("da"), expr("r div deg").as("c"))
    val in2 = sym.join(c2, Seq("da"))
      .groupBy(col("db")).agg(sum(col("c")).as("s"))
    val r2 = nodes.join(in2.select(col("db").as("id"), col("s")), Seq("id"), "left")
      .select(col("id"), col("seed"),
        expr(s"(15L * ${scale}L * seed + 85L * coalesce(s, 0L)) div 100L").as("ppr"))
      .filter(col("ppr") > 0)
    val t = r2.orderBy(col("ppr").desc, col("id")).limit(top).persist()
    Q.rankTopK(t, "ppr", "id")
      .select(col("id"), col("seed"), col("ppr"), col("rk"))
      .orderBy(col("rk"))
  }

  /** BOLLINGER-BAND BREACHES — rolling mean ± 2σ on a trailing 10-sample
    * window per host, the trader's screen beside the Hampel filter's
    * robust one (mean/σ react to every point; median/MAD don't — the two
    * flag DIFFERENT rows and a real monitor runs both). The whole test is
    * INTEGER-exact by cross-multiplying the band condition:
    * |y − Σx/m| > 2·σ  ⇔  (m·y − Σx)² > 4·(m·Σx² − (Σx)²) — no division,
    * no sqrt, no float anywhere in the flag; the emitted band half-width
    * is the only double (one expression over the exact ints). Trailing
    * window = ROWS 9 PRECEDING..CURRENT, full windows only (m = 10).
    * Magnitudes: m·y ≤ 5.7e5, squared ≤ 3.3e11 — five decades inside
    * BIGINT. One user_id shuffle, same discipline as the other sweeps. */
  def q_ts_bollinger(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-9, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("y"))
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("s1", sum(col("y")).over(w))
      .withColumn("s2", sum(col("y") * col("y")).over(w))
      .filter(col("m") === 10)
      .withColumn("dev_n", col("m") * col("y") - col("s1"))
      .withColumn("var_n", col("m") * col("s2") - col("s1") * col("s1"))
      .withColumn("breach", col("dev_n") * col("dev_n") > lit(4L) * col("var_n"))
      .withColumn("above", col("dev_n") > 0)
      .withColumn("band_halfwidth",
        sqrt((lit(4L) * col("var_n")).cast("double")) / col("m").cast("double"))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("y"),
        col("s1"), col("var_n"), col("dev_n"), col("breach"), col("above"),
        col("band_halfwidth"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** DEGREE ASSORTATIVITY — the graph-LEVEL statistic the family lacked
    * (every other graph face emits per-node rows): do high-degree nodes
    * attach to high-degree nodes (r > 0, social-network shape) or to
    * leaves (r < 0, hub-and-spoke)? Pearson correlation of the two
    * endpoint degrees over every DIRECTED edge of the similarity graph —
    * the standard Newman definition — with the q_ts_autocorr integer
    * recipe: degrees joined onto the symmetrized edge list (the deg
    * frame is node-bounded — broadcast), sufficient statistics exact
    * BIGINT in ONE map-combinable agg, the only float the final
    * num/(√dx·√dy). Σ(deg·deg) ≤ |E|·deg_max² ≲ 1e11 at this slice;
    * at web scale the partials widen to DECIMAL(38,0) (the moments
    * note). ONE row out — the whole-graph health number a pipeline
    * tracks over time. */
  def q_graph_assort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 1000)
    val p = LlmExt.cellCosinePairs(e, minBp = 2000)
      .select(col("da"), col("db")).persist()
    assortOf(p)
  }

  /** Newman assortativity over a canonical pair frame — factored for the
    * randomized differential (stars, paths, regular graphs). */
  private[graft] def assortOf(p: DataFrame): DataFrame = {
    val sym = p.union(p.select(col("db").as("da"), col("da").as("db")))
    val deg = sym.groupBy(col("da")).agg(count(lit(1)).as("dg"))
    sym // degree frame unhinted: node-count-sized, AQE size-gates the join
      .join(deg.select(col("da"), col("dg").as("ka")), Seq("da"))
      .join(deg.select(col("da").as("db"), col("dg").as("kb")), Seq("db"))
      .agg(count(lit(1)).as("m"),
        sum(col("ka")).as("sx"), sum(col("kb")).as("sy"),
        sum(col("ka") * col("kb")).as("sxy"),
        sum(col("ka") * col("ka")).as("sx2"),
        sum(col("kb") * col("kb")).as("sy2"))
      .withColumn("num", col("m") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dx", col("m") * col("sx2") - col("sx") * col("sx"))
      .withColumn("dy", col("m") * col("sy2") - col("sy") * col("sy"))
      // a REGULAR graph (all degrees equal) has dx = dy = 0 — the
      // statistic is undefined there; emit NaN explicitly rather than
      // dividing (ANSI mode throws DIVIDE_BY_ZERO even on doubles)
      .withColumn("assort", when(col("dx") > 0 && col("dy") > 0,
        col("num").cast("double") /
          (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))))
        .otherwise(lit(Double.NaN)))
      .withColumn("disassortative", col("num") < 0)
      .select(col("m"), col("num"), col("dx"), col("dy"), col("assort"),
        col("disassortative"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_ppr" -> q_graph_ppr _,
    "q_ts_bollinger" -> q_ts_bollinger _,
    "q_graph_assort" -> q_graph_assort _,
    "q_url_canon" -> q_url_canon _,
    "q_ts_autocorr" -> q_ts_autocorr _,
    "q_graph_linkpred" -> q_graph_linkpred _,
    "q_graph_kcore" -> q_graph_kcore _,
    "q_stat_chisq" -> q_stat_chisq _,
    "q_stat_moments" -> q_stat_moments _,
    "q_ts_hampel" -> q_ts_hampel _,
    "q_ts_coverage" -> q_ts_coverage _)

  // The similarity-graph CTE matches q_graph_lpa's oracle pair generation
  // (Analytics8) at the linkpred/kcore threshold of 2000 bp — the graph
  // is the fixture, the query under test is what differs. `p`/`edges`
  // are MATERIALIZED: DuckDB inlines plain CTEs per reference, and the
  // kcore chain references each round three times — without the pin the
  // inlined tree re-opens the parquet 3^rounds times (the same
  // exponential the Spark side cuts with localCheckpoint) and dies on
  // file handles before the first row.
  private[queries] val GraphCte =
    """WITH v AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 1000),
      |p AS MATERIALIZED (
      |  SELECT a.vec_id AS da, b.vec_id AS db
      |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE floor(10000.0 * list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |        t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))) >= 2000),
      |edges AS MATERIALIZED (SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p)""".stripMargin

  // Eight unrolled peel rounds, generated mechanically: round i keeps
  // nodes of degree >= 2 within e(i-1) and restricts the edge set to
  // them. Every round is MATERIALIZED — see the GraphCte note.
  private val KcoreRounds: String = (1 to 8).map { i =>
    val prev = if (i == 1) "edges" else s"e${i - 1}"
    s""",
       |k$i AS MATERIALIZED (SELECT a FROM $prev GROUP BY a HAVING count(*) >= 2),
       |e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
       |  JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)""".stripMargin
  }.mkString

  val oracle: Map[String, String] = Map(
    // Canonical form rebuilt from the generating parts — the oracle never
    // parses the raw URL, so it cannot share a parsing bug with the query.
    "q_url_canon" ->
      """WITH c AS (SELECT doc_id,
        |    'http://www.' || source || '.example.com/item/'
        |      || CAST(doc_id % 10 AS VARCHAR)
        |      || '?a=' || CAST(doc_id % 5 AS VARCHAR)
        |      || '&b=' || CAST(doc_id % 3 AS VARCHAR) AS canon_url
        |  FROM documents)
        |SELECT canon_url, count(*) AS n_dups, min(doc_id) AS keep_doc
        |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin,
    "q_ts_autocorr" ->
      """WITH b AS (SELECT user_id, ts, event_id,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS y FROM events),
        |s AS (SELECT user_id, y,
        |    lag(y) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
        |  FROM b),
        |g AS (SELECT user_id, count(*) AS m,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sx2,
        |    CAST(sum(y * y) AS BIGINT) AS sy2
        |  FROM s WHERE x IS NOT NULL GROUP BY user_id),
        |d AS (SELECT user_id, m, m * sxy - sx * sy AS acf_num,
        |    m * sx2 - sx * sx AS dx, m * sy2 - sy * sy AS dy
        |  FROM g)
        |SELECT user_id, m, acf_num, dx, dy,
        |  CAST(acf_num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) AS acf,
        |  acf_num < 0 AS oscillating
        |FROM d WHERE dx > 0 AND dy > 0 ORDER BY user_id""".stripMargin,
    "q_graph_linkpred" -> (GraphCte +
      """,
        |wedges AS (SELECT s1.b AS xa, s2.b AS xb, count(*) AS n_common
        |  FROM edges s1 JOIN edges s2 ON s1.a = s2.a AND s1.b < s2.b
        |  GROUP BY 1, 2),
        |cand AS (SELECT w.* FROM wedges w
        |  LEFT JOIN p ON w.xa = p.da AND w.xb = p.db WHERE p.da IS NULL),
        |deg AS (SELECT a AS id, count(*) AS dg FROM edges GROUP BY a)
        |SELECT c.xa AS node_a, c.xb AS node_b, c.n_common,
        |  d1.dg AS deg_a, d2.dg AS deg_b,
        |  (10000 * c.n_common) // (d1.dg + d2.dg - c.n_common) AS jac_bp
        |FROM cand c JOIN deg d1 ON c.xa = d1.id JOIN deg d2 ON c.xb = d2.id
        |ORDER BY jac_bp DESC, node_a, node_b LIMIT 50""".stripMargin),
    "q_graph_kcore" -> (GraphCte + KcoreRounds +
      """
        |SELECT a AS vec_id, count(*) AS deg FROM e8
        |GROUP BY a ORDER BY vec_id""".stripMargin),
    "q_ts_bollinger" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS y FROM events),
        |w AS (SELECT user_id, ts_us, event_id, y,
        |    count(*) OVER win AS m,
        |    CAST(sum(y) OVER win AS BIGINT) AS s1,
        |    CAST(sum(y * y) OVER win AS BIGINT) AS s2
        |  FROM b WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
        |d AS (SELECT user_id, ts_us, event_id, y, s1, m,
        |    m * y - s1 AS dev_n, m * s2 - s1 * s1 AS var_n
        |  FROM w WHERE m = 10)
        |SELECT user_id, ts_us, event_id, y, s1, var_n, dev_n,
        |  dev_n * dev_n > 4 * var_n AS breach,
        |  dev_n > 0 AS above,
        |  sqrt(CAST(4 * var_n AS DOUBLE)) / CAST(m AS DOUBLE) AS band_halfwidth
        |FROM d ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_graph_assort" -> (GraphCte +
      """,
        |dg AS MATERIALIZED (SELECT a, count(*) AS dg FROM edges GROUP BY a),
        |j AS (SELECT d1.dg AS ka, d2.dg AS kb FROM edges e
        |  JOIN dg d1 ON e.a = d1.a JOIN dg d2 ON e.b = d2.a),
        |g AS (SELECT count(*) AS m,
        |    CAST(sum(ka) AS BIGINT) AS sx, CAST(sum(kb) AS BIGINT) AS sy,
        |    CAST(sum(ka * kb) AS BIGINT) AS sxy,
        |    CAST(sum(ka * ka) AS BIGINT) AS sx2,
        |    CAST(sum(kb * kb) AS BIGINT) AS sy2
        |  FROM j)
        |SELECT m, m * sxy - sx * sy AS num,
        |  m * sx2 - sx * sx AS dx, m * sy2 - sy * sy AS dy,
        |  CASE WHEN m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0 THEN
        |    CAST(m * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(m * sx2 - sx * sx AS DOUBLE))
        |         * sqrt(CAST(m * sy2 - sy * sy AS DOUBLE)))
        |  ELSE CAST('nan' AS DOUBLE) END AS assort,
        |  (m * sxy - sx * sy) < 0 AS disassortative
        |FROM g""".stripMargin),
    "q_graph_ppr" -> (GraphCte +
      """,
        |dg AS MATERIALIZED (SELECT a, count(*) AS deg FROM edges GROUP BY a),
        |nodes AS (SELECT vec_id AS id,
        |    CAST(CASE WHEN vec_id % 50 = 0 THEN 1 ELSE 0 END AS BIGINT) AS seed FROM v),
        |c1 AS (SELECT n.id AS a, 1000000 // d.deg AS c
        |  FROM nodes n JOIN dg d ON n.id = d.a WHERE n.seed = 1),
        |i1 AS (SELECT e.b, CAST(sum(c.c) AS BIGINT) AS s
        |  FROM edges e JOIN c1 c ON e.a = c.a GROUP BY e.b),
        |r1 AS (SELECT n.id, n.seed,
        |    (15 * 1000000 * n.seed + 85 * coalesce(i.s, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN i1 i ON n.id = i.b),
        |c2 AS (SELECT r.id AS a, r.r // d.deg AS c
        |  FROM r1 r JOIN dg d ON r.id = d.a),
        |i2 AS (SELECT e.b, CAST(sum(c.c) AS BIGINT) AS s
        |  FROM edges e JOIN c2 c ON e.a = c.a GROUP BY e.b),
        |r2 AS (SELECT n.id, n.seed,
        |    (15 * 1000000 * n.seed + 85 * coalesce(i.s, 0)) // 100 AS ppr
        |  FROM nodes n LEFT JOIN i2 i ON n.id = i.b),
        |t AS (SELECT id, seed, ppr FROM r2 WHERE ppr > 0
        |  ORDER BY ppr DESC, id LIMIT 30)
        |SELECT id, seed, ppr,
        |  CAST(row_number() OVER (ORDER BY ppr DESC, id) AS INT) AS rk
        |FROM t ORDER BY rk""".stripMargin),
    // Weekday by epoch arithmetic ((days+4)%7, Sunday=0) on BOTH sides —
    // never an engine dayofweek (numbering differs, the §2.10 rule).
    "q_stat_chisq" ->
      """WITH e AS (SELECT event_type,
        |    (CAST(ts AS DATE) - DATE '1970-01-01' + 4) % 7 AS dow FROM events),
        |cells AS (SELECT event_type, dow, count(*) AS o FROM e GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r_tot FROM cells GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c_tot FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |j AS (SELECT c.event_type, c.dow, c.o, r.r_tot, t.c_tot, nn.n,
        |    nn.n * c.o - r.r_tot * t.c_tot AS resid
        |  FROM cells c JOIN rt r USING (event_type)
        |  JOIN ct t USING (dow) CROSS JOIN nn)
        |SELECT event_type, dow, o, r_tot, c_tot, n, resid,
        |  (CAST(resid AS DOUBLE) * CAST(resid AS DOUBLE))
        |    / CAST(n * r_tot * c_tot AS DOUBLE) AS contrib,
        |  resid > 0 AS over_rep
        |FROM j ORDER BY event_type, dow""".stripMargin,
    // The 4th-moment numerator alone widens past int64: HUGEINT here,
    // DECIMAL(38,0) on the Spark side — both exact, both converting the
    // identical integer to the identical nearest double.
    "q_stat_moments" ->
      """WITH b AS (SELECT user_id,
        |    CAST(floor("value" + 0.5) AS BIGINT) AS y FROM events),
        |g AS (SELECT user_id, count(*) AS m,
        |    CAST(sum(y) AS BIGINT) AS s1,
        |    CAST(sum(y * y) AS BIGINT) AS s2,
        |    CAST(sum(y * y * y) AS BIGINT) AS s3,
        |    CAST(sum(y * y * y * y) AS BIGINT) AS s4
        |  FROM b GROUP BY user_id),
        |d AS (SELECT user_id, m, s1, s2, s3, s4,
        |    m * s2 - s1 * s1 AS m2n,
        |    m * m * s3 - 3 * m * s1 * s2 + 2 * s1 * s1 * s1 AS m3n,
        |    CAST(CAST(m AS HUGEINT) * CAST(m AS HUGEINT) * CAST(m AS HUGEINT) * CAST(s4 AS HUGEINT)
        |      - 4 * CAST(m AS HUGEINT) * CAST(m AS HUGEINT) * CAST(s1 AS HUGEINT) * CAST(s3 AS HUGEINT)
        |      + 6 * CAST(m AS HUGEINT) * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT)
        |      - 3 * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
        |      AS DOUBLE) AS m4
        |  FROM g)
        |SELECT user_id, m, s1, s2, s3, s4, m2n, m3n, m4,
        |  (sqrt(CAST(m AS DOUBLE)) * CAST(m3n AS DOUBLE))
        |    / (CAST(m2n AS DOUBLE) * sqrt(CAST(m2n AS DOUBLE))) AS skew,
        |  (CAST(m AS DOUBLE) * m4)
        |    / (CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)) - 3.0 AS ex_kurt,
        |  m3n > 0 AS right_skewed
        |FROM d WHERE m2n > 0 ORDER BY user_id""".stripMargin,
    "q_ts_hampel" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS y FROM events),
        |s AS (SELECT user_id, ts_us, event_id, y,
        |    lag(y, 2) OVER w AS l2, lag(y, 1) OVER w AS l1,
        |    lead(y, 1) OVER w AS r1, lead(y, 2) OVER w AS r2
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |a AS (SELECT user_id, ts_us, event_id, y,
        |    list_sort([l2, l1, y, r1, r2]) AS arr
        |  FROM s WHERE l2 IS NOT NULL AND r2 IS NOT NULL),
        |m AS (SELECT user_id, ts_us, event_id, y, arr,
        |    arr[3] AS med FROM a),
        |d AS (SELECT user_id, ts_us, event_id, y, med,
        |    list_sort(list_transform(arr, v -> abs(v - med)))[3] AS mad,
        |    abs(y - med) AS dev
        |  FROM m)
        |SELECT user_id, ts_us, event_id, y, med, mad, dev,
        |  dev * 10000 > mad * 44478 AS outlier
        |FROM d ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_ts_coverage" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(floor("value" * 100.0 + 0.5) AS BIGINT) * 10000 AS e
        |  FROM events),
        |w AS (SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM b),
        |c AS (SELECT user_id, e - s AS dur,
        |    greatest(0, e - greatest(s, coalesce(pmax, s))) AS contrib,
        |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS opens
        |  FROM w),
        |g AS (SELECT user_id, count(*) AS n_intervals,
        |    CAST(sum(dur) AS BIGINT) AS sum_dur_us,
        |    CAST(sum(contrib) AS BIGINT) AS covered_us,
        |    CAST(sum(opens) AS BIGINT) AS n_segments
        |  FROM c GROUP BY user_id)
        |SELECT user_id, n_intervals, sum_dur_us, covered_us, n_segments,
        |  sum_dur_us - covered_us AS overlap_us
        |FROM g ORDER BY user_id""".stripMargin)
}
