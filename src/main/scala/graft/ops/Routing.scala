package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dual-route sink (reference S12: one validated stream fans out to a
  * "right" and a "wrong" index — mrtarget/modules/Evidences.py:290-308).
  * The input is evaluated once (cached) and written to two destinations;
  * the invalid branch keeps the failure explanation as a column, exactly
  * like the reference's explanation_type/explanation_str fields. */
object Routing {

  /** Tag rows with the first failing rule's explanation (null = valid). */
  def explain(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val explanation = rules.foldRight(lit(null: String)) {
      case ((reason, failCond), rest) => when(failCond, lit(reason)).otherwise(rest)
    }
    df.withColumn("explanation", explanation)
  }

  /** Split-and-write: valid rows to `validDir`, invalid (+explanation) to
    * `invalidDir`. Returns (validCount, invalidCount). */
  def routeValidInvalid(
      spark: SparkSession,
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      validDir: String,
      invalidDir: String): (Long, Long) = {
    val tagged = explain(df, rules).cache()
    try {
      val valid = tagged.filter(col("explanation").isNull).drop("explanation")
      val invalid = tagged.filter(col("explanation").isNotNull)
      valid.write.mode("overwrite").parquet(validDir)
      invalid.write.mode("overwrite").parquet(invalidDir)
      // counts from the cached frame — no re-read of what we just wrote
      (tagged.filter(col("explanation").isNull).count(),
        tagged.filter(col("explanation").isNotNull).count())
    } finally tagged.unpersist()
  }
}
