package graft.functions

/** Pluggable pairwise (query, document) relevance scorer — the
  * cross-encoder seam of a two-stage retrieve→rerank stack
  * (SURVEY.md §2.5 extensions). A production deployment scores the
  * fetched candidates with a trained cross-encoder (e.g. a public
  * ms-marco MiniLM cross-encoder via ONNX Runtime); that model is
  * unavailable in this zero-egress environment, so the DEFAULT
  * backend is a deterministic lexical-overlap stand-in with the same
  * contract: a pure function of the two strings returning an integer
  * micro-score, higher = more relevant.
  *
  * Contract: `scoreMicros` must be PURE, deterministic and
  * thread-safe — determinism keeps the q161 gate hash-exact across
  * re-runs and engines. Reranking runs on the fetched candidate set
  * (k rows, query-sized — the same place MMR runs, see
  * IndexStore.mmrSelect), so a real model backend needs no executor
  * plumbing: implement [[RerankBackend]], put the jar on the driver
  * classpath, set `-Dgraft.rerank.backend=com.example.OnnxCeBackend`.
  */
trait RerankBackend extends Serializable {
  def scoreMicros(query: String, doc: String): Long
}

object Rerank {

  /** System property naming the [[RerankBackend]] class to load;
    * unset or empty means [[TokenOverlapBackend]]. */
  val BackendProp = "graft.rerank.backend"

  /** Default stand-in: unigram + bigram overlap with the query, each
    * as ONE integer division quantized to micros (the repo-wide
    * no-float discipline, so the DuckDB oracle re-derives identical
    * scores):
    *
    *   score = 1e6 * |Qu ∩ Du| / |Qu|  +  1e6 * |Qb ∩ Db| / |Qb|
    *
    * where Qu/Du are the distinct non-empty whitespace tokens of
    * query/doc and Qb/Db their distinct adjacent-token bigrams
    * (built over the empty-filtered token sequence, joined with one
    * space). A side with no bigrams contributes 0. */
  object TokenOverlapBackend extends RerankBackend {
    private def toks(s: String): Array[String] =
      if (s == null) Array.empty
      else s.split(" ").filter(_.nonEmpty)

    private def bigrams(t: Array[String]): Set[String] =
      if (t.length < 2) Set.empty
      else (0 until t.length - 1).map(i => t(i) + " " + t(i + 1)).toSet

    def scoreMicros(query: String, doc: String): Long = {
      val qt = toks(query)
      val dt = toks(doc)
      val qu = qt.toSet
      val du = dt.toSet
      val qb = bigrams(qt)
      val db = bigrams(dt)
      val uniPart =
        if (qu.isEmpty) 0L else 1000000L * qu.count(du.contains) / qu.size
      val biPart =
        if (qb.isEmpty) 0L else 1000000L * qb.count(db.contains) / qb.size
      uniPart + biPart
    }
  }

  /** Reflectively resolve a backend (object or no-arg class), failing
    * fast on a typo'd property — same resolution contract as
    * [[Embed.loadBackend]]. */
  def loadBackend(className: String): RerankBackend = {
    def moduleOrNew(cls: Class[_]): AnyRef =
      try cls.getField("MODULE$").get(null)
      catch {
        case _: NoSuchFieldException =>
          cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
      }
    val inst =
      try moduleOrNew(Class.forName(className))
      catch {
        case first: ReflectiveOperationException =>
          try moduleOrNew(Class.forName(className + "$"))
          catch {
            case second if scala.util.control.NonFatal(second) ||
                second.isInstanceOf[LinkageError] =>
              val e = new IllegalArgumentException(
                s"$BackendProp=$className could not be instantiated: provide a " +
                  "Scala object or a class with a public no-arg constructor " +
                  "implementing graft.functions.RerankBackend", first)
              e.addSuppressed(second)
              throw e
          }
      }
    inst match {
      case b: RerankBackend => b
      case other => throw new IllegalArgumentException(
        s"$BackendProp=$className (${other.getClass.getName}) does not " +
          "implement graft.functions.RerankBackend")
    }
  }

  private[graft] def resolveBackend(prop: Option[String]): RerankBackend =
    prop.map(_.trim).filter(_.nonEmpty).map(loadBackend)
      .getOrElse(TokenOverlapBackend)

  /** The active backend, resolved once per JVM from [[BackendProp]]. */
  lazy val backend: RerankBackend = resolveBackend(sys.props.get(BackendProp))

  def scoreMicros(query: String, doc: String): Long =
    backend.scoreMicros(query, doc)
}
