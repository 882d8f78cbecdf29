package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J4: ambiguity-checked enrichment lookup — the reference's id-resolution
  * joins error when a key matches MORE than one dimension row instead of
  * silently fanning out (mrtarget/common/LookupTables.py:91-116: "found
  * multiple hits" ValueError; used from modules/Evidences.py:232-261 after
  * exploding accession lists).
  *
  * Distributed form: the dim side is aggregated to one row per key with a
  * match count (map-side combine, no skew risk), the join stays a plain
  * equi-join, and ambiguity surfaces either as a tagged column (`strict =
  * false`, the dual-route shape) or as a fail-fast exception naming an
  * offending key (`strict = true`, the reference's behavior). The check
  * costs one aggregation over the dim side only — never a second pass over
  * the fact table. */
object Lookup {

  /** Left-join `facts` to `dim` on factKey == dimKey. Output keeps every
    * fact row, adds the dim PAYLOAD columns (all dim columns except
    * `dimKey`; null when unmatched) and `n_hits` (0 = miss, 1 = clean,
    * >1 would be ambiguous). The dim key column itself is not re-emitted:
    * a fact column sharing its name must survive untouched (dropping the
    * dim side by NAME would take the fact's copy with it and null the
    * join key on every miss row). When the fact table has a column named
    * `dimKey`, pass `factKey` frame-qualified (`facts("key")`) — a bare
    * `col("key")` is ambiguous at join resolution. */
  def ambiguityChecked(
      facts: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: String,
      strict: Boolean = true): DataFrame = {
    // payload-only struct: dimKey is the group key (constant per group),
    // so excluding it leaves the min-pick ordering unchanged
    val payload = dim.columns.filterNot(_ == dimKey)
    val counted =
      if (payload.isEmpty) // membership-count lookup: key-only dim
        dim.groupBy(col(dimKey)).agg(count(lit(1)).as("n_hits"))
      else dim.groupBy(col(dimKey)).agg(
        count(lit(1)).as("n_hits"),
        min(struct(payload.map(col): _*)).as("_dimrow")) // min = deterministic pick
    require(!facts.columns.contains("n_hits"),
      "ambiguityChecked: the fact table already has an n_hits column - " +
        "rename it (the check decorates results with its own n_hits)")
    payload.foreach(c => require(!facts.columns.contains(c),
      s"ambiguityChecked: fact column '$c' collides with a dim payload " +
        "column - the joined result would carry duplicate names"))
    if (strict) {
      // fail-fast probe (eager action). Deliberately NOT persisted: a
      // persist here would outlive this call — the returned join is lazy,
      // so there is no safe point to unpersist, and each strict lookup
      // would pin one cached aggregation until the session dies. The cost
      // is one recompute of the dim aggregation at join time; dims are
      // lookup-table-sized, so that second pass is cheap.
      // null dim keys can never match a fact row (SQL null equality), so
      // several incomplete dim rows sharing the null key are NOT an
      // ambiguity — without the isNotNull the probe would fail the whole
      // job over rows that cannot fan anything out
      val dup = counted.filter(col("n_hits") > 1 && col(dimKey).isNotNull)
        .select(col(dimKey)).limit(1)
        .collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"ambiguous lookup: key '${dup(0).get(0)}' has multiple $dimKey hits")
    }
    // drop the dim-side key BY REFERENCE — .drop(dimKey) by name would
    // also remove a same-named fact column
    val joined = facts.join(counted, factKey === counted(dimKey), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .drop(counted(dimKey))
    if (payload.isEmpty) joined
    else joined.select(col("*"), col("_dimrow.*")).drop("_dimrow")
  }
}
