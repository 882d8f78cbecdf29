package graft.search

import graft.index.{IndexBuilder, PostingRow, Varint}

/** Cursor over one (segment, term) compressed posting list with block-level
  * skipping. Decoding state lives per block; `shallowSeek` advances only the
  * block pointer (reading skip metadata, not postings) so block-max WAND can
  * bound scores without decompressing, and `seek` decodes lazily from the
  * target block's byte offsets.
  *
  * The cursor owns its NORM SOURCE: `lens` is the rank-indexed doc-length
  * table this term scores against — the segment's global table for classic
  * single-field indexes, the term's FIELD table for multi-field indexes
  * (ES per-field similarity), or null for norms-disabled terms (keyword
  * fields; dl/avgdl pinned to 1, so tfNorm = tf(k1+1)/(tf+k1) — with the
  * indexed tf of 1 that is exactly idf, ES's norms-off keyword scoring).
  * Exclusion/enumeration cursors that never score pass null too.
  *
  * Score bounds derive from the stored (maxTf, minDl) pairs: tfNorm is
  * monotone increasing in tf and decreasing in doclen, so
  * idf * tfNorm(maxTf, minDl, avgdl) dominates every posting they cover
  * (for multi-field indexes minDl is the FIELD length by construction,
  * IndexBuilder's doclenCol). */
final class PostingIterator(
    row: PostingRow, val idf: Double, blockSize: Int, avgdl: Double,
    lens: Array[Int]) {

  val term: String = row.term
  private val segBase = IndexBuilder.segBase(row.segId)
  private val nBlocks = row.blockLast.length

  /** Upper bound of this term's contribution within this segment. */
  val maxScore: Double =
    if (lens == null) idf * Bm25.tfNorm(row.maxTf, 1, 1.0)
    else idf * Bm25.tfNorm(row.maxTf, row.minDl, avgdl)

  /** This term's contribution at the CURRENT posting (curDoc/curTf). */
  @inline def curScore: Double =
    if (lens == null) idf * Bm25.tfNorm(curTf, 1, 1.0)
    else idf * Bm25.tfNorm(curTf, lens((curDoc - segBase - 1).toInt), avgdl)

  // shallow (skip-metadata) pointer
  private var blockIdx = 0
  // decode state
  private var decodedBlock = -1
  private var docReader: Varint.Reader = _
  private var tfReader: Varint.Reader = _
  private var posInBlock = 0
  private var blockLen = 0

  var curDoc: Long = -1L
  var curTf: Int = 0

  final def exhausted: Boolean = curDoc == Long.MaxValue

  /** First docId preceding block b in the delta stream. */
  @inline private def baseDoc(b: Int): Long =
    if (b == 0) segBase else row.blockLast(b - 1)

  @inline private def blockPostings(b: Int): Int =
    if (b < nBlocks - 1) blockSize else (row.df - b.toLong * blockSize).toInt

  private def openBlock(b: Int): Unit = {
    decodedBlock = b
    docReader = new Varint.Reader(row.docBytes, row.blockDocOff(b))
    tfReader = new Varint.Reader(row.tfBytes, row.blockTfOff(b))
    curDoc = baseDoc(b)
    posInBlock = 0
    blockLen = blockPostings(b)
  }

  /** Advance to the first posting (call once after construction). */
  def start(): Unit = {
    if (nBlocks == 0) { curDoc = Long.MaxValue; return }
    openBlock(0)
    next()
  }

  /** Advance one posting; curDoc = Long.MaxValue when exhausted. */
  def next(): Unit = {
    if (posInBlock >= blockLen) {
      val nb = decodedBlock + 1
      if (nb >= nBlocks) { curDoc = Long.MaxValue; return }
      openBlock(nb)
    }
    curDoc += docReader.readLong()
    curTf = tfReader.readInt()
    posInBlock += 1
    if (blockIdx < decodedBlock) blockIdx = decodedBlock
  }

  /** Advance the block pointer (metadata only) to the block that could
    * contain `target`. Returns false when the list is exhausted. */
  def shallowSeek(target: Long): Boolean = {
    while (blockIdx < nBlocks && row.blockLast(blockIdx) < target) blockIdx += 1
    blockIdx < nBlocks
  }

  /** Max possible contribution of this term for docs in the current block
    * (valid for docs <= blockLastDoc). Call after shallowSeek. */
  @inline def blockMaxScore: Double =
    if (blockIdx >= nBlocks) 0.0
    else if (lens == null) idf * Bm25.tfNorm(row.blockMaxTf(blockIdx), 1, 1.0)
    else idf * Bm25.tfNorm(row.blockMaxTf(blockIdx), row.blockMinDl(blockIdx), avgdl)

  /** Last docId covered by the current (shallow) block. */
  @inline def blockLastDoc: Long =
    if (blockIdx >= nBlocks) Long.MaxValue else row.blockLast(blockIdx)

  /** Move to the first posting with docId >= target. */
  def seek(target: Long): Unit = {
    if (curDoc >= target) return
    if (!shallowSeek(target)) { curDoc = Long.MaxValue; return }
    if (blockIdx != decodedBlock) openBlock(blockIdx)
    // linear scan within the block (and onward — shallowSeek guarantees the
    // target, if present, is not before blockIdx)
    while (curDoc < target) {
      if (posInBlock >= blockLen) {
        val nb = decodedBlock + 1
        if (nb >= nBlocks) { curDoc = Long.MaxValue; return }
        openBlock(nb)
        if (blockIdx < decodedBlock) blockIdx = decodedBlock
      } else {
        curDoc += docReader.readLong()
        curTf = tfReader.readInt()
        posInBlock += 1
      }
    }
  }
}
