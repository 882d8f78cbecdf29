package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar scoring transforms, float-exact
  * (goldens from /root/reference/tests/test_score.py pinned in ScoringSpec):
  *
  *  - renormalize: linear rescale between ranges with optional cap
  *    (mrtarget/common/EvidenceString.py:37-61)
  *  - pValueToScoreLinear: log10 rescale of p-values
  *    (mrtarget/common/EvidenceString.py:713-725)
  *  - sigmoidScaling: 2 / (1 + e^((v - 1)/mid)), rounded half-even
  *    (mrtarget/common/Scoring.py:86-90)
  *
  * Each exists both as a plain Scala function (oracle/tests) and as a
  * Column expression (codegen, no UDF) with the identical operation order.
  */
object Scoring {

  def renormalize(n: Double, startRange: (Double, Double),
      newRange: (Double, Double), cap: Boolean = true): Double = {
    val delta1 = startRange._2 - startRange._1
    val delta2 = newRange._2 - newRange._1
    val normalized =
      if (delta1 != 0.0 || delta2 != 0.0) {
        if (delta1 == 0.0) newRange._1
        else delta2 * (n - startRange._1) / delta1 + newRange._1
      } else n
    if (cap) {
      val hi = math.max(newRange._1, newRange._2)
      val lo = math.min(newRange._1, newRange._2)
      if (normalized > hi) hi else if (normalized < lo) lo else normalized
    } else normalized
  }

  /** Column form; ranges are literals like the reference's per-datasource
    * config, so the expression constant-folds. NULL in → NULL out: without
    * the explicit gate, least/greatest SKIP null arguments (they don't
    * propagate), so a missing measurement would silently become the range
    * lower bound under cap=true — and the delta1==0 branch would turn it
    * into a constant. */
  def renormalizeExpr(n: Column, startRange: (Double, Double),
      newRange: (Double, Double), cap: Boolean = true): Column = {
    val delta1 = startRange._2 - startRange._1
    val delta2 = newRange._2 - newRange._1
    val normalized =
      if (delta1 != 0.0 || delta2 != 0.0) {
        if (delta1 == 0.0) lit(newRange._1)
        else lit(delta2) * (n - lit(startRange._1)) / lit(delta1) + lit(newRange._1)
      } else n
    val capped =
      if (cap)
        least(lit(math.max(newRange._1, newRange._2)),
          greatest(lit(math.min(newRange._1, newRange._2)), normalized))
      else normalized
    when(n.isNull, lit(null).cast("double")).otherwise(capped)
  }

  def pValueToScoreLinear(pvalue: Double, rangeMin: Double = 1.0,
      rangeMax: Double = 1e-10, outMin: Double = 0.0, outMax: Double = 1.0): Double = {
    def log(n: Double) = if (n > 0) math.log10(n) else math.log10(rangeMax)
    renormalize(log(pvalue), (log(rangeMin), log(rangeMax)), (outMin, outMax))
  }

  /** NULL p-value → NULL score: `pvalue > 0` evaluates to NULL for a NULL
    * input, which `otherwise` would route to log10(rangeMax) — i.e. a
    * missing measurement scoring as the MAXIMUM — without the gate. */
  def pValueToScoreExpr(pvalue: Column, rangeMin: Double = 1.0,
      rangeMax: Double = 1e-10, outMin: Double = 0.0, outMax: Double = 1.0): Column =
    when(pvalue.isNull, lit(null).cast("double")).otherwise(
      renormalizeExpr(
        when(pvalue > 0, log10(pvalue)).otherwise(lit(math.log10(rangeMax))),
        (math.log10(rangeMin), math.log10(rangeMax)), (outMin, outMax)))

  /** Half-even rounding over the SHORTEST-DECIMAL representation of `v`
    * (scala BigDecimal(Double) semantics) — deliberately the same basis as
    * Spark's `bround`, so the scalar and Column twins agree bit-for-bit.
    * NOT numpy-identical at exact decimal halves: numpy rounds the exact
    * BINARY value (0.0015 is 0.001499…9 in binary → numpy gives 0.001,
    * string-based half-even gives 0.002). Engine-internal parity wins; the
    * divergence only exists where the shortest repr lands exactly on a
    * half, and ScoringSpec's reference goldens avoid those. */
  private def roundHalfEven(v: Double, precision: Int): Double =
    BigDecimal(v).setScale(precision, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  def sigmoidScaling(value: Double, midValue: Double = 100.0, precision: Int = 3): Double =
    roundHalfEven(2.0 / (1.0 + math.exp(1.0 / midValue * (value - 1.0))), precision)

  /** bround = HALF_EVEN over the same decimal basis as [[roundHalfEven]].
    * The exponent is the reciprocal-MULTIPLY form 1/mid · (v−1) exactly as
    * the reference writes it — np.exp(1. / self.mid_value * (value -
    * self.center)), common/Scoring.py:89. Dividing by mid instead differs
    * by ULPs ((v−1)·(1/100) ≠ (v−1)/100 in IEEE), which crosses rounding
    * boundaries for ~13% of inputs pre-round; the DuckDB oracles mirror
    * this form. */
  def sigmoidScalingExpr(value: Column, midValue: Double = 100.0, precision: Int = 3): Column =
    bround(lit(2.0) / (lit(1.0) + exp(lit(1.0 / midValue) * (value - lit(1.0)))), precision)

  /** The reference's per-datasource scoring dispatch
    * (common/EvidenceString.py:570-748): each datasource selects its own
    * scoring subtree — log10-rescaled p-values (gwas :727-735), a capped
    * /100 linear score (europepmc :689-695), a phase-product (drug
    * :574-577), a fixed significance->score map (eva :611-643), sigmoid
    * otherwise. One when/otherwise expression tree, fully codegen (no UDF);
    * the driver's event_type plays the datasource role. */
  def datasourceScoreExpr(kind: Column, v: Column): Column =
    when(kind === "click", pValueToScoreExpr(v / lit(1000.0)))
      .when(kind === "view", least(lit(1.0), v / lit(100.0)))
      .when(kind === "purchase",
        renormalizeExpr(v, (0.0, 500.0), (0.5, 1.0)) * lit(0.7))
      .when(kind === "signup",
        when(v < 100.0, lit(0.1)).when(v < 300.0, lit(0.5)).otherwise(lit(1.0)))
      .otherwise(sigmoidScalingExpr(v))

  /** Content-addressed document id: md5 of the canonical JSON, as the
    * reference derives evidence ids with json.dumps(sort_keys=True)
    * (mrtarget/modules/Evidences.py:127-132). Canonical means (a) keys in
    * sorted order — enforced here by sorting the NAMED fields, not trusting
    * call-site order — and (b) null fields serialized as `"k":null` (the
    * Python behavior); Spark's to_json default DROPS null fields, which
    * would let {a:1,b:null} and {a:1} collide. */
  def canonicalId(fields: (String, Column)*): Column = {
    val sorted = fields.sortBy(_._1).map { case (k, c) => c.as(k) }
    md5(to_json(struct(sorted: _*), Map("ignoreNullFields" -> "false")))
  }
}
