package graft.search

import scala.collection.mutable

/** Conjunctive document-at-a-time scorer for [[BoolQuery]] queries with
  * required clauses (must / filter / ids): candidates are driven by leapfrog
  * alignment of the required cursors (plus the segment's sorted ids
  * allowlist), should cursors are probed per aligned candidate, mustNot
  * cursors veto. Scores accumulate over the must∪should cursors in
  * ascending term order — bit-identical to OracleSearch.boolTopK.
  *
  * Pruning: once the heap holds k hits whose worst score >= the static sum
  * of the scoring terms' upper bounds, no later doc can strictly beat it
  * (equal scores lose the docId-asc tie-break), so the scan stops. The
  * conjunction itself is the dominant prune — required cursors skip via
  * block metadata (PostingIterator.seek), so a selective must/filter term
  * drives the whole evaluation at its own posting density.
  *
  * Pure-should queries do NOT come here — they take the block-max WAND path
  * (Wand.topK), which prunes by score upper bounds instead. */
object BooleanScorer {

  /** `required` = must+filter cursors; `scoring` = must∪should cursors
    * sorted by term asc; `ids` = sorted seg-local docIds or null when the
    * query has no ids clause. All cursors must be started. */
  def conjunctiveTopK(
      required: Array[PostingIterator],
      scoring: Array[PostingIterator],
      excluded: Array[PostingIterator],
      ids: Array[Long],
      segBase: Long,
      k: Int,
      // external lower bound on the GLOBAL kth-best score (see Wand.topK):
      // a segment whose total scoring bound falls strictly below it cannot
      // contribute; equality survives for the global docId tie-break
      floor: Double = Double.NegativeInfinity,
      // search_after paging cursor (see Wand.topK): only docs strictly
      // after (score desc, docId asc)-order position `after` may enter
      after: SegHit = null): Array[SegHit] = {
    require(required.nonEmpty || ids != null,
      "conjunctiveTopK needs a required clause; use Wand for pure-should")
    if (k <= 0) return Array.empty

    implicit val worstFirst: Ordering[SegHit] = SegHit.worstFirst
    val heap = mutable.PriorityQueue.empty[SegHit]
    def theta: Double =
      if (heap.size < k) Double.NegativeInfinity else heap.head.score
    val staticBound = {
      var s = 0.0
      var i = 0
      while (i < scoring.length) { s += scoring(i).maxScore; i += 1 }
      s
    }
    if (staticBound < floor) return Array.empty // globally out, whole segment

    var idsPos = 0
    var candidate = segBase + 1
    var done = false
    while (!done) {
      // no later doc can strictly exceed theta => ties lose on docId asc
      if (heap.size == k && !(staticBound > theta)) done = true
      else {
        if (ids != null) {
          while (idsPos < ids.length && ids(idsPos) < candidate) idsPos += 1
          if (idsPos == ids.length) done = true else candidate = ids(idsPos)
        }
        if (!done) {
          var maxReq = candidate
          var i = 0
          while (i < required.length && !done) {
            val r = required(i)
            r.seek(candidate)
            if (r.exhausted) done = true
            else if (r.curDoc > maxReq) maxReq = r.curDoc
            i += 1
          }
          if (!done) {
            if (maxReq > candidate) candidate = maxReq // leapfrog realign
            else {
              var veto = false
              var e = 0
              while (e < excluded.length) {
                excluded(e).seek(candidate)
                if (excluded(e).curDoc == candidate) veto = true
                e += 1
              }
              if (!veto) {
                var s = 0.0
                var j = 0
                while (j < scoring.length) { // ascending term order
                  val it = scoring(j)
                  it.seek(candidate)
                  if (it.curDoc == candidate) s += it.curScore
                  j += 1
                }
                if (SegHit.strictlyAfter(after, candidate, s)) {
                  if (heap.size < k) heap.enqueue(SegHit(candidate, s))
                  else if (s > theta) { heap.dequeue(); heap.enqueue(SegHit(candidate, s)) }
                }
              }
              candidate += 1
            }
          }
        }
      }
    }
    // best first; sub-floor hits cannot reach the global top-k
    heap.dequeueAll.reverse.filter(_.score >= floor).toArray
  }
}
