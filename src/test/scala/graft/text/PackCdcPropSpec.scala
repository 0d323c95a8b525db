package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.DedupOps

/** Property specs for the two sequential kernels that back tx_seqpack
  * and dd_cdc_chunks — the invariants the oracles cannot state
  * directly.
  */
class PackCdcPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("packGreedy: every doc in exactly one pack, budget respected, ids ordered") {
    for (_ <- 1 to 50) {
      val budget = 50L + rnd.nextInt(200)
      val docs = (0 until (1 + rnd.nextInt(400))).map { i =>
        (i % 4L, i.toLong, 1L + rnd.nextInt(120)) // some docs exceed budget
      }.sortBy(d => (d._1, d._2))
      val packs = TextOps.packGreedy(docs.iterator, budget).toSeq

      // every doc accounted for: per-shard doc and token totals match
      assert(packs.map(_._3).sum === docs.size)
      assert(packs.map(_._4).sum === docs.map(_._3).sum)
      // a pack exceeds the budget only as a single oversized doc
      packs.filter(_._4 > budget).foreach(p => assert(p._3 === 1L))
      packs.groupBy(_._1).foreach { case (shard, ps) =>
        // pack ids are 0..n-1 in order; doc ranges don't overlap
        assert(ps.map(_._2) === ps.indices.map(_.toLong))
        ps.sliding(2).foreach {
          case Seq(a, b) => assert(a._6 < b._5) // last_doc < next first_doc
          case _ =>
        }
        // greedy tightness: a pack closes only because the next doc
        // would not fit (or the shard ended)
        val docsByShard = docs.filter(_._1 == shard)
        ps.sliding(2).foreach {
          case Seq(a, b) =>
            val nextDoc = docsByShard.find(_._2 == b._5).get
            assert(a._4 + nextDoc._3 > budget)
          case _ =>
        }
      }
    }
  }

  test("cdcChunks: reassembly, determinism, and window-bounded chunk sizes") {
    for (_ <- 1 to 50) {
      val s = (0 until (1 + rnd.nextInt(500)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val chunks = DedupOps.cdcChunks(s)
      assert(chunks.mkString === s) // chunks partition the string
      assert(chunks.forall(_.nonEmpty))
      assert(DedupOps.cdcChunks(s) === chunks) // deterministic
    }
  }

  test("cdc insert-stability: prepending shifts every boundary >= 8 by exactly k") {
    for (_ <- 1 to 30) {
      val s = (0 until (50 + rnd.nextInt(400)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val prefix = (0 until (1 + rnd.nextInt(40)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val k = prefix.length
      val b0 = DedupOps.cdcBoundaryPositions(s)
      val b1 = DedupOps.cdcBoundaryPositions(prefix + s)
      // beyond the 8-char seam window, boundaries are IDENTICAL up to
      // the shift k — an edit never re-chunks the rest of the document
      assert(b1.filter(_ >= k + 8).map(_ - k) === b0)
    }
  }
}
