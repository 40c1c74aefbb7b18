package graft.functions

import java.security.MessageDigest

/** Deterministic pseudo-random hyperplanes for sign-LSH, derived from md5
  * so the SAME integer coefficients can be embedded as literals in both the
  * Spark plan and the DuckDB oracle (no JVM RNG — reproducible anywhere).
  *
  * Coefficient for plane p, dimension d (1-based d to match SQL lists):
  *   c(p,d) = (first-8-hex-chars-of md5("p,d") as int) % 2001 - 1000
  * i.e. uniform-ish integers in [-1000, 1000].
  */
object Planes {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def coeff(p: Int, d: Int): Long =
    java.lang.Long.parseLong(md5hex(s"$p,$d").substring(0, 8), 16) % 2001L - 1000L

  /** `nPlanes` hyperplanes over `dims` dimensions. */
  def planes(nPlanes: Int, dims: Int): Seq[Seq[Long]] =
    (0 until nPlanes).map(p => (1 to dims).map(d => coeff(p, d)))
}
