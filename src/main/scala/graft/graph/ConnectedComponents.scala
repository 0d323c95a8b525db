package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns near-dup PAIRS into dedup GROUPS (keep one representative per
  * component, drop the rest). Reference near-dup tooling stops at
  * pairs; every production dedup pipeline needs the transitive closure
  * (A~B, B~C ⇒ {A,B,C} is one duplicate group even when A≁C directly).
  *
  * Algorithm: min-label propagation to fixpoint — each vertex
  * repeatedly adopts the smallest component label among itself and its
  * neighbors (Hash-Min of Rastogi et al., "Finding Connected
  * Components in Map-Reduce in Logarithmic Rounds", ICDE 2013). Each
  * round is one join + one map-side-combining min-aggregate, both
  * shuffling on the vertex id; rounds needed = graph diameter. For
  * near-dup graphs that is small — duplicate clusters are dense (a
  * shared template connects most members pairwise), so diameter stays
  * in single digits even at corpus scale; the `maxIter` bound plus the
  * returned round count make a pathological chain observable rather
  * than silent. Labels are `localCheckpoint`ed every round: the plan
  * stays O(1) deep instead of O(rounds), and the convergence check is
  * a one-scalar count, not a data collect.
  *
  * At 100 TB: both per-round shuffles key on the vertex id, so AQE
  * coalesces them into the same partitioning; state carried between
  * rounds is one (vertex, label) pair per vertex — O(V) longs across
  * the cluster, never on the driver.
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns `src`, `dst`
    * @param maxIter hard round bound (diameter guard)
    * @return (v, component) — component = min vertex id reachable
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = und.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val viaNeighbors = und.join(labels, und("dst") === labels("v"))
        .select(und("src").as("v"), col("component"),
          lit(null).cast("long").as("own"))
      // each vertex's previous label rides through the same min-agg
      // as max("own") (exactly one self row per v), so the convergence
      // count is a filter over the checkpointed round result — no
      // extra labels join per round
      val next = labels
        .select(col("v"), col("component"), col("component").as("own"))
        .unionByName(viaNeighbors)
        .groupBy("v").agg(min("component").as("component"), max("own").as("own"))
        .localCheckpoint()
      changed = next.filter(col("component") =!= col("own")).count()
      labels = next.select("v", "component")
      iter += 1
    }
    und.unpersist()
    labels
  }
}
