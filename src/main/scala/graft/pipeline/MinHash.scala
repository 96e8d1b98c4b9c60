package graft.pipeline

import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** MinHash signature computation as a narrow per-doc map — zero shuffles.
  *
  * Base hash = xxhash64 (same algorithm/seed as Spark's `xxhash64` column
  * function, via the catalyst XXH64 impl) of each shingle; the k
  * "permutations" are multiply-add universal hashes `a_i*h + b_i` with
  * deterministic splitmix64-derived odd coefficients. Signature[i] = min
  * over shingles.
  *
  * At 100 TB this runs inside the scan stage: no explode, no aggregation
  * shuffle — each doc emits its k-long signature in place.
  */
object MinHash {

  def splitmix64(s0: Long): Long = {
    var z = s0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def coefficients(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(i => splitmix64(2L * i) | 1L) // odd
    val b = Array.tabulate(numHashes)(i => splitmix64(2L * i + 1))
    (a, b)
  }

  /** xxhash64 of the UTF-8 bytes, seed 42 — bit-identical to Spark's
    * `xxhash64(col)` expression. */
  def hashString(s: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
  }

  /** null for an empty shingle set (doc shorter than the shingle size). */
  def signature(shingles: Seq[String], numHashes: Int): Array[Long] = {
    if (shingles == null || shingles.isEmpty) return null
    val (a, b) = coefficients(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val it = shingles.iterator
    while (it.hasNext) {
      val h = hashString(it.next())
      var i = 0
      while (i < numHashes) {
        val v = a(i) * h + b(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  def signatureUdf(numHashes: Int): UserDefinedFunction =
    udf((shingles: Seq[String]) => signature(shingles, numHashes))

  /** md5-60bit seeded hash of a shingle: the first 15 hex digits of
    * `md5("<seed>:<shingle>")` as a long — exactly
    * `('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT` in DuckDB, so
    * signatures built from it are oracle-reproducible. Slower than the
    * xxhash64 path (one digest per (shingle, seed)); use for verification,
    * not the 100 TB hot path.
    */
  def hashMd5(seed: Int, s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((seed.toString + ":" + s)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    h >>> 4 // top 60 bits == first 15 hex digits
  }

  /** null for an empty shingle set, like [[signature]]. */
  def signatureMd5(shingles: Seq[String], numHashes: Int): Array[Long] = {
    if (shingles == null || shingles.isEmpty) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val it = shingles.iterator
    while (it.hasNext) {
      val s = it.next()
      var i = 0
      while (i < numHashes) {
        val v = hashMd5(i, s)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  def signatureMd5Udf(numHashes: Int): UserDefinedFunction =
    udf((shingles: Seq[String]) => signatureMd5(shingles, numHashes))
}
