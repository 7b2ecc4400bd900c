package graft.functions

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

/** Deterministic in-memory HNSW graph — the reference's actual index
  * structure (chromadb 0.4.6 → hnswlib, /root/reference/app.py:50-52),
  * re-expressed as a pure Scala kernel the Spark operator
  * ([[graft.operators.VectorSearch.annHnsw]]) instantiates once per
  * corpus shard. Algorithm: Malkov & Yashunin, "Efficient and robust
  * approximate nearest neighbor search using Hierarchical Navigable
  * Small World graphs" (TPAMI 2018) — insert with greedy upper-layer
  * descent + efConstruction beam + neighbor-diversity heuristic
  * (alg. 4), search with the same descent + ef beam on layer 0.
  *
  * Everything is deterministic, by construction, so index builds and
  * Verify re-runs hash-match (SURVEY.md §7.3):
  *   - level assignment is a pure function of the vector id
  *     (MurmurHash3 → uniform (0,1) → floor(-ln(u)·mL)), not a PRNG
  *     stream — insertion order cannot perturb levels;
  *   - nodes are inserted in ascending id order (the caller sorts);
  *   - every heap orders by (distance, node index) so distance ties
  *     break on the smaller node, never on arrival order;
  *   - neighbor lists are scanned in stored order.
  *
  * Distance is cosine distance (1 − cosine similarity) in double
  * precision with precomputed norms — comparable with the exact
  * cosine meters (q67 family).
  */
final class HnswGraph private (
    val ids: Array[Long],
    vecs: Array[Array[Float]],
    norms: Array[Double],
    levels: Array[Int],
    // node -> level -> neighbor node indices (stored order = insertion
    // order of the link, post-shrink)
    links: Array[Array[Array[Int]]],
    entry: Int,
    maxLevel: Int) {

  def size: Int = ids.length

  /** Max out-degree at `level` for node `i` (bounds asserted by
    * HnswSpec). */
  def degree(i: Int, level: Int): Int =
    if (level < links(i).length) links(i)(level).length else 0
  def levelOfNode(i: Int): Int = levels(i)
  /** Adjacency of node `i` (level -> neighbor node indices) — the
    * persistable graph state ([[HnswGraph.fromAdjacency]] round-trips
    * it). */
  def linksOf(i: Int): Array[Array[Int]] = links(i)

  /** Approximate top-`k` by cosine similarity with an `ef`-wide beam.
    * Returns the (id, sim) list sorted by (sim desc, id asc) plus the
    * number of distance computations performed — the honesty metric
    * every ANN result carries (n_candidates in the q67-family
    * meters). */
  def search(q: Array[Float], k: Int, ef: Int): (Array[(Long, Double)], Long) = {
    if (size == 0) return (Array.empty, 0L)
    val qNorm = HnswGraph.norm(q)
    var nDist = 0L
    def d(i: Int): Double = { nDist += 1; HnswGraph.cosDist(q, qNorm, vecs(i), norms(i)) }

    // greedy descent through the upper layers
    var ep = entry
    var epDist = d(ep)
    var lc = maxLevel
    while (lc >= 1) {
      var moved = true
      while (moved) {
        moved = false
        val nbrs = links(ep)(lc)
        var j = 0
        while (j < nbrs.length) {
          val c = nbrs(j)
          val dc = d(c)
          if (dc < epDist || (dc == epDist && c < ep)) { ep = c; epDist = dc; moved = true }
          j += 1
        }
      }
      lc -= 1
    }

    // ef-beam on layer 0
    val visited = new Array[Boolean](size)
    // candidates: min-heap by (dist, idx); results: max-heap by (dist, idx)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.Tuple2[Double, Int].reverse)
    val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.Tuple2[Double, Int])
    visited(ep) = true
    cand.enqueue((epDist, ep))
    res.enqueue((epDist, ep))
    val width = math.max(ef, k)
    while (cand.nonEmpty) {
      val (cd, c) = cand.dequeue()
      if (cd > res.head._1 && res.size >= width) { cand.clear() }
      else {
        val nbrs = links(c)(0)
        var j = 0
        while (j < nbrs.length) {
          val e = nbrs(j)
          if (!visited(e)) {
            visited(e) = true
            val de = d(e)
            if (res.size < width || de < res.head._1 ||
                (de == res.head._1 && e < res.head._2)) {
              cand.enqueue((de, e))
              res.enqueue((de, e))
              if (res.size > width) res.dequeue()
            }
          }
          j += 1
        }
      }
    }
    val out = res.dequeueAll.reverse // asc by (dist, idx)
      .take(k)
      .map { case (dist, i) => (ids(i), 1.0 - dist) }
      .toArray
    (out, nDist)
  }
}

object HnswGraph {
  /** Hard ceiling on assigned levels — floor(-ln(u)·mL) exceeds 30
    * only for u < e^{-30/mL}, never at realistic shard sizes. */
  private val MaxLevelCap = 30
  private val LevelSeed = 0x9e3779b9

  private[functions] def norm(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  private[functions] def cosDist(a: Array[Float], na: Double,
                                 b: Array[Float], nb: Double): Double = {
    var dot = 0.0; var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    val den = na * nb
    if (den == 0.0) 1.0 else 1.0 - dot / den
  }

  /** Geometric level from the id alone: MurmurHash3(id) → u ∈ (0,1) →
    * floor(-ln(u)·mL). The hash replaces the paper's PRNG draw so the
    * level is a property of the vector, not of the build. */
  private def levelOf(id: Long, mL: Double): Int = {
    val h = MurmurHash3.productHash((id, "hnsw-level"), LevelSeed)
    val u = ((h & 0x7fffffff).toDouble + 1.0) / (Int.MaxValue.toDouble + 2.0)
    math.min(MaxLevelCap, math.floor(-math.log(u) * mL).toInt)
  }

  /** Reconstruct a graph from persisted per-node state ([[build]]'s
    * `levelOfNode`/`linksOf` output, stored beside the vectors) —
    * search-time loading never re-pays the build. The entry point is
    * re-derived by [[build]]'s own invariant: the FIRST (lowest-index)
    * node holding the maximum level. */
  def fromAdjacency(ids: Array[Long], vecs: Array[Array[Float]],
                    levels: Array[Int], links: Array[Array[Array[Int]]]): HnswGraph = {
    var entry = -1
    var maxLevel = -1
    var i = 0
    while (i < ids.length) {
      if (levels(i) > maxLevel) { maxLevel = levels(i); entry = i }
      i += 1
    }
    new HnswGraph(ids, vecs, vecs.map(norm), levels, links, entry, maxLevel)
  }

  /** Build a graph over the (id, vector) arrays. `m` is the target
    * out-degree (Mmax = m on upper layers, 2m on layer 0 — hnswlib's
    * convention); `efConstruction` the insert beam width. The caller
    * passes rows sorted by id (asserted) — insertion order is part of
    * the determinism contract. */
  def build(idsIn: Array[Long], vecsIn: Array[Array[Float]],
            m: Int, efConstruction: Int): HnswGraph = {
    val n = idsIn.length
    require(m >= 2, s"m must be >= 2, got $m")
    var i = 1
    while (i < n) {
      require(idsIn(i - 1) < idsIn(i), "HnswGraph.build requires rows sorted by strictly ascending id")
      i += 1
    }
    val mL = 1.0 / math.log(m.toDouble)
    val norms = vecsIn.map(norm)
    val levels = idsIn.map(levelOf(_, mL))
    val links: Array[Array[mutable.ArrayBuffer[Int]]] =
      levels.map(l => Array.fill(l + 1)(mutable.ArrayBuffer.empty[Int]))

    def dist(a: Int, b: Int): Double = cosDist(vecsIn(a), norms(a), vecsIn(b), norms(b))
    def mmax(level: Int): Int = if (level == 0) 2 * m else m

    /** Malkov alg. 4 with keepPrunedConnections = true: scan
      * candidates in ascending (dist-to-q, idx); keep c if it is
      * closer to q than to every already-selected neighbor (the
      * diversity rule that keeps the graph navigable across
      * clusters), then fill remaining slots with the closest pruned
      * candidates — without the fill, near-duplicate-heavy corpora
      * (exactly what a dedup pipeline feeds this index) starve
      * out-degrees and disconnect the graph (measured: 304 of 800
      * nodes unreachable on a mean-0.95-cosine corpus; zero after). */
    def selectNeighbors(q: Int, candsAsc: Seq[(Double, Int)], limit: Int): Seq[Int] = {
      val selected = mutable.ArrayBuffer.empty[Int]
      val pruned = mutable.ArrayBuffer.empty[Int]
      val it = candsAsc.iterator
      while (it.hasNext && selected.length < limit) {
        val (dq, c) = it.next()
        if (c != q) {
          if (selected.forall(s => dist(c, s) >= dq)) selected += c
          else pruned += c
        }
      }
      val fill = pruned.iterator.take(limit - selected.length)
      (selected ++ fill).toSeq
    }

    // epoch-stamped visited marks, allocated ONCE per build: a fresh
    // Array[Boolean](n) per insert per layer would make construction
    // O(n^2) in shard size from zeroing alone, independent of any
    // graph work
    val visitedAt = new Array[Int](n)
    var epoch = 0

    /** ef-beam at `level` from `ep`, returns candidates asc by
      * (dist, idx). Mirror of the search beam, over the partial
      * graph. */
    def searchLayer(q: Int, ep: Int, ef: Int, level: Int): Seq[(Double, Int)] = {
      epoch += 1
      val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.Tuple2[Double, Int].reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.Tuple2[Double, Int])
      val d0 = dist(q, ep)
      visitedAt(ep) = epoch
      cand.enqueue((d0, ep)); res.enqueue((d0, ep))
      while (cand.nonEmpty) {
        val (cd, c) = cand.dequeue()
        if (cd > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          val nbrs = links(c)(level)
          var j = 0
          while (j < nbrs.length) {
            val e = nbrs(j)
            if (visitedAt(e) != epoch) {
              visitedAt(e) = epoch
              val de = dist(q, e)
              if (res.size < ef || de < res.head._1 ||
                  (de == res.head._1 && e < res.head._2)) {
                cand.enqueue((de, e)); res.enqueue((de, e))
                if (res.size > ef) res.dequeue()
              }
            }
            j += 1
          }
        }
      }
      res.dequeueAll.reverse.toSeq
    }

    var entry = -1
    var maxLevel = -1
    var node = 0
    while (node < n) {
      val l = levels(node)
      if (entry < 0) { entry = node; maxLevel = l }
      else {
        var ep = entry
        var epDist = dist(node, ep)
        // greedy descent on layers above the node's level
        var lc = maxLevel
        while (lc > l) {
          var moved = true
          while (moved) {
            moved = false
            val nbrs = links(ep)(lc)
            var j = 0
            while (j < nbrs.length) {
              val c = nbrs(j)
              val dc = dist(node, c)
              if (dc < epDist || (dc == epDist && c < ep)) { ep = c; epDist = dc; moved = true }
              j += 1
            }
          }
          lc -= 1
        }
        // beam insert on layers min(l, maxLevel)..0
        lc = math.min(l, maxLevel)
        while (lc >= 0) {
          val w = searchLayer(node, ep, efConstruction, lc)
          val nbrs = selectNeighbors(node, w, m)
          nbrs.foreach { e =>
            links(node)(lc) += e
            links(e)(lc) += node
            if (links(e)(lc).length > mmax(lc)) {
              val eCands = links(e)(lc).map(x => (dist(e, x), x)).sorted
              val kept = selectNeighbors(e, eCands.toSeq, mmax(lc))
              links(e)(lc).clear()
              links(e)(lc) ++= kept
            }
          }
          ep = w.head._2
          lc -= 1
        }
        if (l > maxLevel) { maxLevel = l; entry = node }
      }
      node += 1
    }
    new HnswGraph(idsIn, vecsIn, norms, levels,
      links.map(_.map(_.toArray)), entry, maxLevel)
  }
}
