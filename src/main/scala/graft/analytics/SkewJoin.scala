package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §5). AQE's skew-join split
  * handles most cases at runtime; salting is the explicit tool when a
  * handful of hot keys dominate (the classic 100 TB failure mode:
  * one entity producing 1% of all events).
  *
  * The big side gets a deterministic salt in [0, n) derived from the
  * whole row (not rand() — replays and retries must salt identically);
  * the small side is replicated n×. The join key becomes (key, salt),
  * splitting each hot key's rows across n reducers.
  */
object SkewJoin {

  def saltedInner(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt.toLong)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
