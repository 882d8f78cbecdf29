package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference scalar normalizers:
  *
  *  - nfkdAscii: `unicodedata.normalize('NFKD', v).encode('ascii','ignore')`
  *    (mrtarget/modules/Drug.py:116-123) — NFKD-decompose (compat: also
  *    unfolds ligatures œ->oe? no: NFKD maps ﬁ->fi, №->No; œ has NO compat
  *    decomposition and is DROPPED by the ascii-ignore step), then keep only
  *    ASCII chars, which both strips combining marks and drops any symbol
  *    without an ASCII decomposition — exactly the reference's behavior
  *  - saferDouble / saferLong: cast-with-fallback
  *    (mrtarget/common/safercast.py:7-89) — `try_cast` + `coalesce`, the
  *    Spark-native form of try/except-return-fallback
  */
object Normalize {

  def nfkdAscii(s: String): String = {
    if (s == null) return null
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (c < 128) sb.append(c)
      i += 1
    }
    sb.toString
  }

  val nfkdAsciiUdf = udf((s: String) => nfkdAscii(s))

  /** try_cast to double with a typed fallback (SaferCast(float, fb)). */
  def saferDouble(c: Column, fallback: Double): Column =
    coalesce(c.try_cast("double"), lit(fallback))

  /** try_cast to long with a typed fallback (SaferCast(int, fb)). */
  def saferLong(c: Column, fallback: Long): Column =
    coalesce(c.try_cast("bigint"), lit(fallback))
}
