package graft.tools

import org.apache.spark.sql.SparkSession

/** Master resolution for the CLI tools: `SPARK_MASTER` env wins; a master
  * already provided by the launcher (spark-submit sets the `spark.master`
  * system property) is left untouched; otherwise fall back to a local
  * default. Calling `.master()` unconditionally would silently override
  * `spark-submit --master`, pinning cluster runs to one JVM. */
object Sessions {
  def withMaster(b: SparkSession.Builder, localDefault: String): SparkSession.Builder =
    sys.env.get("SPARK_MASTER").filter(_.nonEmpty) match {
      case Some(m) => b.master(m)
      case None if sys.props.get("spark.master").exists(_.nonEmpty) => b
      case None => b.master(localDefault)
    }
}
