package graft.functions

import net.jpountz.xxhash.XXHashFactory

/** JVM-side replica of Spark SQL's `xxhash64(...)` expression semantics,
  * for use inside typed Aggregators.
  *
  * Spark's `xxhash64(c1, c2, ...)` folds the children left-to-right:
  * starting from seed 42, each child's hash becomes the seed for the next
  * (`HashExpression.computeHash`). For a string child it hashes the UTF-8
  * bytes with the running seed; for a long child it applies the standard
  * xxHash64 single-long round. Both primitives are the public xxHash64
  * algorithm (Cyan4973/xxHash spec), so signatures computed here are
  * byte-equal to the SQL-expression form — HashCompatSpec pins this on the
  * real corpus, which is what lets the Aggregator-based operators replace
  * the expression pipelines without changing a single output row.
  */
object XxHash64Chain {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  val SparkSeed = 42L

  private val byteHasher = XXHashFactory.fastestInstance().hash64()

  private def fmix(h: Long): Long = {
    var hash = h
    hash ^= hash >>> 33
    hash *= P2
    hash ^= hash >>> 29
    hash *= P3
    hash ^= hash >>> 32
    hash
  }

  /** xxHash64 of one 8-byte value with the given seed (the `hashLong`
    * round of the public spec). */
  def hashLong(value: Long, seed: Long): Long = {
    var hash = seed + P5 + 8L
    var k1 = value * P2
    k1 = java.lang.Long.rotateLeft(k1, 31) * P1
    hash ^= k1
    hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
    fmix(hash)
  }

  /** xxHash64 of one 4-byte value with the given seed (the public spec's
    * 4-byte-remainder round — what Spark applies to IntegerType children,
    * e.g. the `lit(seed)` in `xxhash64(word, lit(seed))`). */
  def hashInt(value: Int, seed: Long): Long = {
    var hash = seed + P5 + 4L
    hash ^= (value & 0xFFFFFFFFL) * P1
    hash = java.lang.Long.rotateLeft(hash, 23) * P2 + P3
    fmix(hash)
  }

  /** xxHash64 of a byte array with the given seed. */
  def hashBytes(bytes: Array[Byte], seed: Long): Long =
    byteHasher.hash(bytes, 0, bytes.length, seed)

  /** == Spark `xxhash64(stringCol)` for a non-null string. */
  def hashString(s: String): Long =
    hashBytes(s.getBytes("UTF-8"), SparkSeed)

  /** == Spark `xxhash64(stringCol, lit(i))` for an Int literal: the
    * string's hash seeds the int round. */
  def hashStringInt(s: String, i: Int): Long =
    hashInt(i, hashString(s))
}
