package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-dup candidate generation + confirmation (SURVEY §2.9):
  * given per-doc 64-bit signatures, find all pairs within `maxHamming`.
  *
  * Candidates come from 16-BIT CHUNK EQUALITY — the signature splits
  * into 4 chunks and a pair is a candidate iff SOME chunk matches
  * exactly (pigeonhole: hamming ≤ 3 means at most 3 chunks differ, so
  * at least one of the 4 is equal — RECALL-COMPLETE for the ≤3 filter,
  * never an approximation). The join is EQUI on (chunk index, chunk
  * value): at 100 TB it hash-partitions on the chunk key and each
  * reducer sees only same-chunk docs — candidate volume is governed by
  * chunk collision rates (≈ n²/2¹⁶ per chunk on random signatures),
  * not n². Confirmation is exact `bit_count(xor) <= maxHamming`.
  *
  * `maxHamming` must stay ≤ 3: 4 chunks pigeonhole exactly the ≤3
  * band (a wider band needs more/narrower chunks — refused loudly
  * rather than silently losing recall). */
object SimHashDedup {

  def pairsFromSignatures(sig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-chunk pigeonhole is recall-complete only for hamming <= 3, got $maxHamming")
    val chunks = sig.withColumn("c", explode(typedLit((0 until 4).toArray)))
      .withColumn("chunk", expr(s"(`$sigCol` >> (16 * c)) & 65535"))
    def x(n: String): Column = col(s"x.$n")
    def y(n: String): Column = col(s"y.$n")
    val pairs = chunks.as("x").join(chunks.as("y"),
        x("c") === y("c") && x("chunk") === y("chunk") &&
          x(idCol) < y(idCol))
      .select(x(idCol).as("da"), y(idCol).as("db"),
        x(sigCol).as("ha"), y(sigCol).as("hb"))
      .distinct()
    pairs
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("da"), col("db"), col("hamming").cast("long").as("hamming"))
  }
}
