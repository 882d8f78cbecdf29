package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer

/** Golden token fixtures per FIXTURES.md §2 — the reference analyzer chain
  * (mrtarget/resources/es/sea_settings.json:22-51). */
class AnalyzerSpec extends AnyFunSuite {

  test("word_delimiter parts with preserve_original") {
    assert(Analyzer.tokenize("Wi-Fi routers").toSeq ===
      Seq("wi-fi", "wi", "fi", "routers"))
  }

  test("apostrophe splits; possessive 's consumed (ES stem_english_possessive)") {
    // pinned from the ES word_delimiter docs: "O'Neil's" -> [O, Neil], plus
    // preserve_original -> the lowercased original leads its parts
    assert(Analyzer.tokenize("O'Neil's").toSeq === Seq("o'neil's", "o", "neil"))
    assert(Analyzer.tokenize("O'Brien's dog").toSeq ===
      Seq("o'brien's", "o", "brien", "dog"))
    // non-possessive apostrophes still split; the trailing "'s" of a
    // digit-final part is NOT possessive-stemmed (Lucene requires a letter)
    assert(Analyzer.tokenize("don't").toSeq === Seq("don't", "don", "t"))
    assert(Analyzer.tokenize("route66's").toSeq ===
      Seq("route66's", "route66", "s"))
    assert(Analyzer.tokenize("cats'").toSeq === Seq("cats'", "cats"))
    assert(Analyzer.tokenize("'s").toSeq === Seq("'s", "s"))
  }

  test("no split on numerics") {
    assert(Analyzer.tokenize("ENSG00000139618 gene").toSeq ===
      Seq("ensg00000139618", "gene"))
  }

  test("whitespace collapse and hyphen parts") {
    assert(Analyzer.tokenize("anti-TNF   therapy").toSeq ===
      Seq("anti-tnf", "anti", "tnf", "therapy"))
  }

  test("pure punctuation dropped; empty and null safe") {
    assert(Analyzer.tokenize("--- !!! ...").isEmpty)
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
  }

  test("trailing punctuation preserves original") {
    assert(Analyzer.tokenize("done.").toSeq === Seq("done.", "done"))
  }

  test("term frequencies count every emitted token") {
    val tf = Analyzer.termFreqs("data data Wi-Fi")
    assert(tf("data") === 2)
    assert(tf("wi-fi") === 1)
    assert(tf("wi") === 1)
    assert(tf("fi") === 1)
  }

  test("ngram filter (reference edgeNGram_filter: ES ngram 4..10)") {
    val g = Analyzer.ngrams("Data-Tables x").toSeq
    assert(g.contains("data"))       // 4-gram at position 0
    assert(g.contains("able"))       // interior 4-gram
    assert(g.contains("tables"))     // full 6-char token
    assert(!g.contains("data-tables")) // 11 chars: only its 4..10-grams emit
    assert(g.contains("ata-tables"))   // 10-gram spanning the hyphen
    assert(!g.contains("x"))           // below min_gram
    assert(g.forall(x => x.length >= 4 && x.length <= 10))
  }

  test("fingerprint/onechunk analyzer: keyword chain = lowercase + asciifold") {
    // keyword tokenizer: ONE token — no splitting, no dedup across words
    assert(Analyzer.fingerprint("b a b A c") === "b a b a c")
    assert(Analyzer.fingerprint("Café Déjà-Vu") === "cafe deja-vu")
    assert(Analyzer.fingerprint("") === "")
  }
}
