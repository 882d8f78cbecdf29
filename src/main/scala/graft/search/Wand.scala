package graft.search

import scala.collection.mutable

final case class SegHit(docId: Long, score: Double)

object SegHit {
  /** ONE home for the paging contract: global order is (score desc,
    * docId asc), so a hit lies strictly after a cursor iff its score is
    * lower, or equal with a higher docId. Shared by the WAND and
    * conjunctive scorers — duplicating this predicate risks the two query
    * shapes desynchronizing at page boundaries. */
  @inline def strictlyAfter(cursor: SegHit, docId: Long, score: Double): Boolean =
    cursor == null || score < cursor.score ||
      (score == cursor.score && docId > cursor.docId)

  /** The public (score, docId) cursor tuple as the scorers' SegHit form. */
  def fromCursor(after: Option[(Double, Long)]): SegHit =
    after.map { case (s, d) => SegHit(d, s) }.orNull

  /** Heap ordering — the dual of [[strictlyAfter]] under the same global
    * (score desc, docId asc) order: in a min-heap the head is the WEAKEST
    * kept hit, so smaller score compares "greater", and at equal score the
    * larger docId is the weaker hit. One home, like the cursor predicate:
    * the WAND and conjunctive scorers share it so the two query shapes
    * cannot desynchronize at page boundaries. */
  val worstFirst: Ordering[SegHit] = (a: SegHit, b: SegHit) => {
    val c = java.lang.Double.compare(b.score, a.score)
    if (c != 0) c else java.lang.Long.compare(a.docId, b.docId)
  }
}

/** Document-at-a-time block-max WAND top-k over one segment's posting
  * cursors (the runtime the reference delegates to Elasticsearch/Lucene —
  * SURVEY.md §2.8 "top-k retrieval"; algorithm per Broder et al. 2003 and
  * Ding & Suel 2011, public literature).
  *
  * Correctness invariants:
  *  - results are exact top-k under (score desc, docId asc): a candidate is
  *    pruned only when its score upper bound cannot strictly exceed the
  *    current kth score, and an equal score arriving later necessarily has a
  *    larger docId (ascending traversal), so it loses the tie anyway;
  *  - full evaluation accumulates term contributions in ascending term
  *    order (`iters` is term-sorted) so floats are bit-identical to the
  *    exhaustive oracle.
  */
object Wand {

  /** `iters` must be sorted by term asc and started; each cursor carries
    * its own norm source (PostingIterator.curScore — global, per-field or
    * norms-disabled). `exclude` cursors (bool mustNot) veto
    * documents without contributing score — exclusion only removes
    * candidates, so the WAND upper-bound pruning stays exact.
    *
    * `floor` is an optional EXTERNAL pruning bound: any valid lower bound
    * on the GLOBAL (cross-segment) kth-best score. A doc with score
    * strictly below the global kth can never enter the global top-k no
    * matter its docId, so dropping on `bound < floor` is exact; equality is
    * NOT dropped (an equal score can still win the global docId-asc
    * tie-break against the segment that produced the floor). The local
    * heap rule keeps its `<=` drop — within one segment a later equal
    * score always loses — and the two rules prune independently.
    *
    * `after` is the search_after paging cursor (the LAST hit of the
    * previous page under the global (score desc, docId asc) order): only
    * docs strictly after it — score < after.score, or equal score with
    * docId > after.docId — may enter the heap. Scores are deterministic
    * (pinned float accumulation order), so the equality compare is exact
    * across pages. An upper-bound filter cannot drive skipping, so WAND's
    * own theta/block-max pruning still does all the work. */
  def topK(
      iters: Array[PostingIterator],
      k: Int,
      exclude: Array[PostingIterator] = Array.empty,
      floor: Double = Double.NegativeInfinity,
      after: SegHit = null): Array[SegHit] = {
    val n = iters.length
    if (n == 0 || k <= 0) return Array.empty

    // min-heap on (score asc, docId desc): head = weakest kept hit
    implicit val worstFirst: Ordering[SegHit] = SegHit.worstFirst
    val heap = mutable.PriorityQueue.empty[SegHit]
    def theta: Double =
      if (heap.size < k) Double.NegativeInfinity else heap.head.score

    // refs sorted by curDoc for pivoting; `iters` keeps term order for eval
    val refs: Array[PostingIterator] = iters.clone()

    def sortRefs(): Unit = {
      // insertion sort: nearly-sorted between iterations, tiny n
      var i = 1
      while (i < refs.length) {
        val x = refs(i)
        var j = i - 1
        while (j >= 0 && refs(j).curDoc > x.curDoc) { refs(j + 1) = refs(j); j -= 1 }
        refs(j + 1) = x
        i += 1
      }
    }

    def evalDoc(doc: Long): Unit = {
      var veto = false
      var e = 0
      while (e < exclude.length) {
        exclude(e).seek(doc) // candidates ascend, so forward-only seeks
        if (exclude(e).curDoc == doc) veto = true
        e += 1
      }
      if (!veto) {
        var s = 0.0
        var i = 0
        while (i < n) { // ascending term order — float-order pinned
          val it = iters(i)
          if (it.curDoc == doc) s += it.curScore
          i += 1
        }
        if (SegHit.strictlyAfter(after, doc, s)) {
          if (heap.size < k) heap.enqueue(SegHit(doc, s))
          else if (s > theta) { heap.dequeue(); heap.enqueue(SegHit(doc, s)) }
        }
      }
      var i = 0
      while (i < n) {
        if (iters(i).curDoc == doc) iters(i).next()
        i += 1
      }
    }

    var continue = true
    while (continue) {
      sortRefs()
      if (refs(0).exhausted) { continue = false }
      else {
        // pivot: first prefix whose summed upper bounds beat theta
        val th = theta
        var acc = 0.0
        var p = 0
        var found = false
        while (p < n && !found) {
          if (refs(p).exhausted) p = n
          else {
            acc += refs(p).maxScore
            if (acc > th && acc >= floor) found = true else p += 1
          }
        }
        if (!found) continue = false
        else {
          val pivotDoc = refs(p).curDoc
          if (refs(0).curDoc == pivotDoc) {
            // extend to every cursor sitting on the pivot document
            var q = p
            while (q + 1 < n && refs(q + 1).curDoc == pivotDoc) q += 1
            // block-max refinement over cursors 0..q
            var bm = 0.0
            var i = 0
            while (i <= q) {
              refs(i).shallowSeek(pivotDoc)
              bm += refs(i).blockMaxScore
              i += 1
            }
            if ((heap.size < k || bm > th) && bm >= floor) evalDoc(pivotDoc)
            else {
              // skip past the smallest block boundary among 0..q, but not
              // past the next cursor's document
              var d = Long.MaxValue
              i = 0
              while (i <= q) {
                val bl = refs(i).blockLastDoc
                if (bl < d) d = bl
                i += 1
              }
              var target = if (d == Long.MaxValue) Long.MaxValue else d + 1
              if (target <= pivotDoc) target = pivotDoc + 1
              if (q + 1 < n && refs(q + 1).curDoc < target) target = refs(q + 1).curDoc
              i = 0
              while (i <= q) { refs(i).seek(target); i += 1 }
            }
          } else {
            // align cursors below the pivot onto it: docs in between can only
            // contain terms whose summed bounds were <= theta
            var i = 0
            while (i < p) {
              if (refs(i).curDoc < pivotDoc) refs(i).seek(pivotDoc)
              i += 1
            }
          }
        }
      }
    }
    // best first; sub-floor stragglers that entered the heap before the
    // bounds tightened are dropped — they cannot reach the global top-k
    heap.dequeueAll.reverse.filter(_.score >= floor).toArray
  }
}
