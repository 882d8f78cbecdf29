package graft.search

import graft.analysis.Analyzer

/** ES-style boolean term query — the reference's entire runtime query
  * surface beyond bare free text: `Match` (analyzed free text, OR of terms),
  * `Bool(should=[...])` (mrtarget/modules/SearchObjects.py:336-338,
  * modules/Association.py:310), unscored `ConstantScore(term)` filters
  * (common/LookupTables.py:100-103, modules/DataDrivenRelation.py:270-276)
  * and `ids` lookups (common/LookupTables.py:91-116). Terms here are
  * post-analysis tokens; use [[BoolQuery.text]] to run raw text through the
  * analyzer chain first.
  *
  * Pinned semantics (shared by the engine and OracleSearch.boolTopK):
  *  - candidates: if any required clause exists (must / filter / ids), docs
  *    containing ALL must terms AND ALL filter terms AND whose url is in
  *    `ids`; otherwise docs containing at least one should term
  *  - mustNot: any doc containing any mustNot term is excluded
  *  - score: sum of BM25 over the doc's matching (must ∪ should) terms,
  *    accumulated in ascending term order (float-order pinned); filter /
  *    ids / mustNot never contribute score. A pure filter/ids query scores
  *    0.0 for every hit (rank = docId asc)
  *  - normalization makes clauses disjoint: a term in both must and should
  *    scores ONCE (ES would sum the two clause scores; single-count is the
  *    pinned choice here and in the oracle)
  *  - a must/filter term absent from the index, a term in both mustNot and
  *    must/filter, or an `ids` list resolving to nothing ⇒ empty result
  */
final case class BoolQuery(
    must: Seq[String] = Nil,
    should: Seq[String] = Nil,
    filter: Seq[String] = Nil,
    mustNot: Seq[String] = Nil,
    ids: Option[Seq[String]] = None) {

  /** Clause-disjoint normal form: distinct sorted terms, should/filter
    * minus must (must implies the filter and already scores). */
  def normalized: BoolQuery = {
    val m = must.distinct.sorted
    BoolQuery(
      must = m,
      should = should.distinct.sorted.diff(m),
      filter = filter.distinct.sorted.diff(m),
      mustNot = mustNot.distinct.sorted,
      ids = ids.map(_.distinct))
  }

  def hasRequired: Boolean = must.nonEmpty || filter.nonEmpty || ids.isDefined

  /** Unsatisfiable by construction: a required term is also excluded. */
  def contradictory: Boolean =
    mustNot.exists(t => must.contains(t) || filter.contains(t))
}

object BoolQuery {
  /** Free-text clauses through the analyzer chain (ES `match` semantics:
    * the text is analyzed and each produced token becomes a term clause). */
  def text(
      shouldText: String,
      mustText: String = "",
      filterText: String = "",
      mustNotText: String = ""): BoolQuery =
    BoolQuery(
      must = Analyzer.tokenize(mustText).toSeq,
      should = Analyzer.tokenize(shouldText).toSeq,
      filter = Analyzer.tokenize(filterText).toSeq,
      mustNot = Analyzer.tokenize(mustNotText).toSeq).normalized

  /** ES `ids` query: restrict to the given document keys (urls — the
    * engine's _id), optionally scored by a free-text should clause. */
  def byIds(urls: Seq[String], shouldText: String = ""): BoolQuery =
    BoolQuery(should = Analyzer.tokenize(shouldText).toSeq,
      ids = Some(urls)).normalized

  // ---- field-scoped clauses for multi-field indexes (IndexConfig.fields;
  // the reference's queries hit NAMED fields everywhere, e.g.
  // Bool(should=[Match(field1), Match(field2)]),
  // mrtarget/common/LookupTables.py:100-103) ----

  /** One field-qualified term (post-analysis token) of an ANALYZED field. */
  def inField(field: String, term: String): String =
    field + graft.index.IndexBuilder.FieldSep + term

  /** ES `match` on a named analyzed field: the text runs through the
    * analyzer chain, each token becomes a field-qualified term. Compose
    * into any clause: BoolQuery(should = fieldText("title", "web index")
    * ++ fieldText("body", "posting list")). */
  def fieldText(field: String, text: String): Seq[String] =
    Analyzer.tokenize(text).map(inField(field, _)).toSeq

  /** ES `term` on a KEYWORD field: exact unanalyzed value match (use in
    * filter/mustNot clauses; keyword terms score like any term if placed
    * in should — tf is pinned to 1 at index time). */
  def keyword(field: String, value: String): String = inField(field, value)
}
