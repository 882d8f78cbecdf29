package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7: RDF/OWL ontology source + eager ancestor materialization.
  *
  * The reference loads OWL ontologies through an external
  * OntologyClassReader and eagerly materializes class paths
  * (mrtarget/modules/EFO.py:132-145, modules/ECO.py:84-96, Reactome's
  * networkx all_simple_paths). Re-expressed Spark-first with no external
  * libraries: RDF/XML IS XML, so `rdfs:subClassOf` edges parse with the
  * same hardened StAX reader ([[XmlSource]]), and ancestor paths
  * materialize via POINTER JUMPING — each round appends the current
  * ancestor chain of the chain's topmost node, doubling path length per
  * round, so a depth-D hierarchy closes in O(log D) self-joins instead of
  * D sequential levels (the naive transitive-closure loop). At web scale
  * each round is one equi-join on the chain head; `localCheckpoint` cuts
  * the growing lineage so round N's plan does not replay rounds 1..N-1. */
object Ontology {

  /** (id, parent) subClassOf edges from one RDF/XML fragment per row:
    * `rdf:about` of the class element, `rdf:resource` of its subClassOf.
    * `stripPrefix` removes a uniform id prefix (ontology IRIs); rows
    * missing either attribute or a numeric id are dropped (root classes
    * have no subClassOf — they simply contribute no edge). */
  def subClassEdges(df: DataFrame, xmlCol: String,
      stripPrefix: String = ""): DataFrame = {
    val parse = udf { (xml: String) =>
      val r = XmlSource.parseAttrs(xml,
        Array(("Class", "about"), ("subClassOf", "resource")))
      (r(0), r(1))
    }
    val quoted = java.util.regex.Pattern.quote(stripPrefix)
    df.withColumn("_e", parse(col(xmlCol)))
      .select(
        regexp_replace(col("_e._1"), s"^$quoted", "").cast("long").as("id"),
        regexp_replace(col("_e._2"), s"^$quoted", "").cast("long").as("parent"))
      .filter(col("id").isNotNull && col("parent").isNotNull)
  }

  /** Root-first ancestor chain per node: for edges (id, parent) forming a
    * forest, returns (id, anc) where anc = [root, ..., grandparent,
    * parent]. Nodes without a parent edge do not appear (their chain is
    * empty). Throws after `maxRounds` doubling rounds without a fixpoint —
    * 2^20 depth exceeds any real ontology, so hitting it means a cycle. */
  def ancestorChain(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    var anc = edges
      .select(col("id").cast("long").as("id"),
        array(col("parent").cast("long")).as("anc"))
      .localCheckpoint(true)
    if (anc.isEmpty) return anc
    var total = anc.agg(sum(size(col("anc")))).head().getLong(0)
    var round = 0
    var done = false
    while (!done) {
      require(round < maxRounds,
        s"ancestorChain: no fixpoint after $maxRounds doubling rounds — cycle in edges?")
      val m = anc.select(col("id").as("_jid"), col("anc").as("_janc"))
      val next = anc.withColumn("_top", element_at(col("anc"), 1))
        .join(m, col("_top") === col("_jid"), "left")
        .select(col("id"),
          when(col("_janc").isNotNull, concat(col("_janc"), col("anc")))
            .otherwise(col("anc")).as("anc"))
        .localCheckpoint(true)
      val t2 = next.agg(sum(size(col("anc")))).head().getLong(0)
      done = t2 == total
      total = t2
      anc = next
      round += 1
    }
    anc
  }
}
