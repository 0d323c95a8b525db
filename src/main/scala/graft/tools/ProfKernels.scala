package graft.tools

/** Plain-JVM micro-benchmark of the winnow / gram-hash kernels —
  * no Spark, no scheduler noise: just the per-doc loops.
  */
object ProfKernels {
  def main(args: Array[String]): Unit = {
    val r = new scala.util.Random(5)
    val alpha = "abcdefghij klmnop qrs tuv wx yz 0123456789 "
    val docs = (1 to 200).map { _ =>
      Array.fill(2500)(alpha(r.nextInt(alpha.length))).mkString
    }
    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      f
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/rep")
    }
    time("winnowDoc (current)", 3) {
      docs.foreach(d => graft.text.TextOps.winnowDoc(d, 20, 8))
    }
    time("gram hashes string64Range (current)", 3) {
      docs.foreach { d =>
        val set = new java.util.HashSet[java.lang.Long]()
        var i = 0
        while (i <= d.length - 20) {
          set.add(graft.util.Hashing.string64Range(d, i, 20)); i += 1
        }
      }
    }
    time("gram hashes string64(substring) (old)", 3) {
      docs.foreach { d =>
        val set = new java.util.HashSet[java.lang.Long]()
        var i = 0
        while (i <= d.length - 20) {
          set.add(graft.util.Hashing.string64(d.substring(i, i + 20))); i += 1
        }
      }
    }
    time("winnow md5Hex-all (old shape)", 3) {
      docs.foreach { d =>
        val npos = d.length - 20 + 1
        val hashes = new Array[String](npos)
        var i = 0
        while (i < npos) {
          hashes(i) = graft.util.Hashing.md5Hex(d.substring(i, i + 20)); i += 1
        }
      }
    }
  }
}
