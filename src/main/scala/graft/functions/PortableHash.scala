package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Driver-side twin of the engine-portable hash `int(md5(x)[:8 hex])` used
  * across dedup/similarity: lets constants (hash-family coefficients, LSH
  * hyperplanes) be precomputed ONCE at plan-build time and inlined as
  * literals into both the Spark expression and the DuckDB oracle —
  * replacing millions of per-row md5 evaluations with constant folding.
  */
object PortableHash {

  def md5Int8(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 bytes, big-endian, unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 12 hex chars (6 bytes, big-endian) of md5 — the 48-bit token
    * hash the SimHash operator uses.
    */
  def md5Int12(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Hyperplane component in [-1, 1) for plane p, dim i — same formula the
    * SQL previously evaluated per row.
    */
  def planeComponent(p: Int, i: Int): Double =
    (md5Int8(s"$p:$i").toDouble / 4294967296.0) * 2 - 1
}
