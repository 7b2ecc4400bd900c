package graft.dev

import graft.functions.{Embed, HnswGraph}

/** Scratch harness for HNSW graph diagnostics (run via Test/runMain). */
object HnswDebug {
  def cosSim(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic pseudo-random unit vector (splitmix-ish), the
    * isotropic regime the sf fixtures live in. */
  def randVec(id: Long, dim: Int): Array[Float] = {
    var x = id * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 27
      v(i) = ((x & 0xffffff).toDouble / 0x7fffff.toDouble - 1.0).toFloat
      i += 1
    }
    v
  }

  def run(name: String, ids: Array[Long], vecs: Array[Array[Float]],
          m: Int = 8, efC: Int = 64): Unit = {
    val n = ids.length
    println(s"== $name (m=$m efC=$efC) ==")
    val sims = for (i <- 0 until 50; j <- (i + 1) until 50) yield cosSim(vecs(i), vecs(j))
    println(f"sim sample: min ${sims.min}%.3f max ${sims.max}%.3f mean ${sims.sum / sims.size}%.3f")
    val g = HnswGraph.build(ids, vecs, m, efC)
    val degs = ids.indices.map(i => g.degree(i, 0))
    println(s"layer0 degree: min ${degs.min} max ${degs.max} mean ${degs.sum.toDouble / n}")
    val (_, nd) = g.search(vecs(0), n, n)
    println(s"full-ef search dist-computations: $nd of $n")
    for (ef <- Seq(16, 48, 128)) {
      var hit = 0; var tot = 0; var cands = 0L
      for (qi <- 0 until 10) {
        val q = vecs(qi * 7)
        val exact = ids.indices.map(i => (cosSim(q, vecs(i)), ids(i)))
          .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2).toSet
        val (approx, ndq) = g.search(q, 5, ef)
        hit += approx.map(_._1).count(exact.contains); tot += 5; cands += ndq
      }
      println(f"ef=$ef%4d recall@5 ${hit.toDouble / tot}%.2f avg_dists ${cands / 10}")
    }
  }

  def main(args: Array[String]): Unit = {
    val n = 800
    val dim = 32
    val ids = Array.tabulate(n)(_.toLong)
    run("isotropic", ids, ids.map(randVec(_, dim)))
    run("neardup-embed", ids,
      ids.map(i => Embed.embed(s"synthetic document number $i content", dim)))
    run("neardup-embed", ids,
      ids.map(i => Embed.embed(s"synthetic document number $i content", dim)),
      m = 16, efC = 128)

    // single-shard build throughput at a more scale-like node count
    for (bn <- Seq(10000, 50000)) {
      val bids = Array.tabulate(bn)(_.toLong)
      val bvecs = bids.map(HnswDebug.randVec(_, 64))
      val t0 = System.nanoTime()
      val g = HnswGraph.build(bids, bvecs, 8, 64)
      val secs = (System.nanoTime() - t0) / 1e9
      val (_, nd) = g.search(bvecs(0), 10, 48)
      println(f"build n=$bn%6d dim=64: $secs%.1f s (${bn / secs}%.0f nodes/s); search dists=$nd")
    }
  }
}
