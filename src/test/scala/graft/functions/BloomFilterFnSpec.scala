package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Registration + semantics of the surfaced native Bloom expressions
  * (bloom_filter_agg / might_contain) and the C58 prune-then-verify
  * contract: the bloom admits every true member (no false negatives),
  * and the exact verify join removes any false positive, so the
  * composed pipeline is exact.
  */
class BloomFilterFnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("might_contain admits every member of the built set") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val members = (1L to 1000L).map(_ * 7919L)
    members.toDF("v").createOrReplaceTempView("bloom_members_spec")
    val hits = members.toDF("v")
      .where(expr("might_contain((SELECT bloom_filter_agg(v) FROM bloom_members_spec), v)"))
      .count()
    assert(hits == 1000L) // a Bloom filter has NO false negatives
  }

  test("prune-then-verify is exact despite bloom false positives") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val members = (1L to 500L).map(_ * 104729L)
    members.toDF("v").createOrReplaceTempView("bloom_verify_spec")
    // probe a superset: true members + 20k non-members
    val probes = (members ++ (1L to 20000L).map(_ * 104729L + 13L)).toDF("v")
    val pruned = probes
      .where(expr("might_contain((SELECT bloom_filter_agg(v) FROM bloom_verify_spec), v)"))
    // bloom keeps all members (plus possibly false positives)...
    assert(pruned.count() >= 500L)
    // ...and the exact verify join restores the exact answer
    val exact = pruned.join(broadcast(members.toDF("v")), "v").count()
    assert(exact == 500L)
  }

  test("bloom_filter_agg over an empty relation prunes everything (null bloom)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq.empty[Long].toDF("v").createOrReplaceTempView("bloom_empty_spec")
    val n = Seq(1L, 2L, 3L).toDF("v")
      .where(expr("might_contain((SELECT bloom_filter_agg(v) FROM bloom_empty_spec), v)"))
      .count()
    assert(n == 0L)
  }
}
