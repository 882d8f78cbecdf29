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
  * the growing lineage so round N's plan does not replay rounds 1..N-1,
  * and superseded checkpoints are unpersisted as rounds advance. */
object Ontology {

  /** ALL (classId, parentId) subClassOf edges of one RDF/XML fragment,
    * structurally scoped: a `subClassOf`'s `rdf:resource` pairs with the
    * `rdf:about` of its ENCLOSING `Class` element — fragments with many
    * classes, root classes without parents, and multi-parent classes
    * (EFO is multi-inheritance) all extract correctly. */
  private[graft] def parseSubClassEdges(xml: String): Array[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val classStack = scala.collection.mutable.ArrayBuffer.empty[String]
    XmlSource.walk(xml)(
      onStart = { (name, attr) =>
        if (name == "Class") classStack += attr("about").orNull
        else if (name == "subClassOf" && classStack.nonEmpty &&
            classStack.last != null)
          attr("resource").foreach(r => out += ((classStack.last, r)))
      },
      onEnd = { name =>
        if (name == "Class" && classStack.nonEmpty)
          classStack.remove(classStack.length - 1)
      })
    out.toArray
  }

  /** (id, parent) subClassOf edge table from one RDF/XML fragment per row
    * (a fragment may contribute many edges). `stripPrefix` removes a
    * uniform id prefix (ontology IRIs); edges whose stripped ids are not
    * numeric are dropped. */
  def subClassEdges(df: DataFrame, xmlCol: String,
      stripPrefix: String = ""): DataFrame = {
    val parse = udf { (xml: String) => parseSubClassEdges(xml) }
    val quoted = java.util.regex.Pattern.quote(stripPrefix)
    df.select(explode(parse(col(xmlCol))).as("_e"))
      .select(
        regexp_replace(col("_e._1"), s"^$quoted", "").cast("long").as("id"),
        regexp_replace(col("_e._2"), s"^$quoted", "").cast("long").as("parent"))
      .filter(col("id").isNotNull && col("parent").isNotNull)
  }

  /** Root-first ancestor chain per node: for edges (id, parent) forming a
    * FOREST, returns (id, anc) where anc = [root, ..., grandparent,
    * parent]. Nodes without a parent edge do not appear (their chain is
    * empty).
    *
    * Preconditions enforced loudly rather than silently mis-answered:
    * a node with more than one parent (a DAG — pointer jumping would
    * multiply its rows combinatorially) is rejected up front; dedupe or
    * explode multi-parent paths before calling. A cycle never reaches a
    * fixpoint and trips the `maxRounds` guard (2^20 depth exceeds any
    * real ontology). */
  def ancestorChain(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val dup = edges.groupBy(col("id")).count()
      .filter(col("count") > 1).select(col("id")).limit(1).collect()
    require(dup.isEmpty,
      s"ancestorChain: node ${if (dup.nonEmpty) dup(0).get(0) else ""} has " +
        "multiple parents — a forest is required (dedupe or path-explode first)")

    // localCheckpoint cuts lineage but registers outside the cache
    // manager, so Dataset.unpersist cannot release it; track the rdd ids
    // each round materializes via getPersistentRDDs and free the
    // superseded round explicitly. (The probe window is this thread's
    // checkpoint call; a concurrent persist landing inside it would at
    // worst be unpersisted early and recompute — never corrupt.)
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      val added = (spark.sparkContext.getPersistentRDDs.keySet -- before).toSet
      (out, added)
    }
    def free(ids: Set[Int]): Unit =
      spark.sparkContext.getPersistentRDDs.view
        .filterKeys(ids.contains).values.foreach(_.unpersist(blocking = false))

    var (anc, held) = checkpointTracked(
      edges.select(col("id").cast("long").as("id"),
        array(col("parent").cast("long")).as("anc")))
    if (anc.isEmpty) return anc
    var total = anc.agg(sum(size(col("anc")))).head().getLong(0)
    var round = 0
    var done = false
    while (!done) {
      require(round < maxRounds,
        s"ancestorChain: no fixpoint after $maxRounds doubling rounds — cycle in edges?")
      val m = anc.select(col("id").as("_jid"), col("anc").as("_janc"))
      val (next, nextHeld) = checkpointTracked(
        anc.withColumn("_top", element_at(col("anc"), 1))
          .join(m, col("_top") === col("_jid"), "left")
          .select(col("id"),
            when(col("_janc").isNotNull, concat(col("_janc"), col("anc")))
              .otherwise(col("anc")).as("anc")))
      val t2 = next.agg(sum(size(col("anc")))).head().getLong(0)
      done = t2 == total
      total = t2
      free(held)
      held = nextHeld
      anc = next
      round += 1
    }
    anc
  }
}
