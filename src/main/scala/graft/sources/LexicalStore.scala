package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Persisted LEXICAL (inverted) index + BM25-family scoring + RRF
  * fusion with the vector paths — the "hybrid search" half every
  * production vector store pairs with ANN (Elasticsearch, Vespa,
  * Weaviate, pgvector+tsvector). The reference's chromadb engine is
  * vector-only; `where_document $contains` (q104b) is its nearest
  * lexical surface. This module adds the real thing in the same
  * partitioned-parquet idiom as the IVF/HNSW layouts in
  * [[IndexStore]]:
  *
  *   path/bucket=&lt;b&gt;/part-....parquet  postings: (term, doc_id, tf, df, len)
  *   path/_stats/part-....parquet       (n_docs, sum_len)
  *
  * `bucket = pmod(xxhash64(term), NumBuckets)` — the term dictionary
  * is hash-partitioned, so a query's posting reads PRUNE to the
  * buckets of its terms at plan time (the Lucene term-dictionary
  * segment seek, expressed as parquet partition pruning; LexicalSpec
  * pins it). `df` (document frequency) and `len` (document token
  * count) are denormalized into the posting row — Lucene likewise
  * stores docFreq with the term and norms per doc — so scoring is a
  * single pruned scan plus a broadcast of the 1-row `_stats` table:
  * no join against a corpus-sized side at query time.
  *
  * Scoring is BM25 (k1 = 1.2, b = 0.75) with a RATIONAL idf:
  * `(N - df + 0.5) / (df + 0.5)` — the classic Robertson-Sparck Jones
  * idf WITHOUT the `ln`. Two reasons, both deliberate: (1) `ln` is
  * only ~1-ulp-accurate and may differ between libm implementations,
  * so a DuckDB oracle could flip a near-tie the JVM doesn't (the q56
  * division-only-score rationale); (2) each per-term contribution is
  * quantized to integer MICROS — `floor(1e6 * idf * tfnorm)` — and
  * summed as a LONG, which makes the document score EXACT,
  * order-free, and bit-identical across engines, partitionings, and
  * runs (a plain double sum over a shuffle is none of those). The
  * ranking this induces is a documented, deterministic BM25 variant,
  * not an approximation of someone else's scores.
  *
  * At 100 TB: build is one tokenize + two aggregations (tf, then the
  * vocabulary-sized df broadcast back); postings shuffle once on
  * bucket and land sorted-by-term within each directory. Queries
  * read |query-term buckets| directories of a NumBuckets-partitioned
  * layout (raise NumBuckets with corpus size — it bounds the pruned
  * read, and a bucket must fit a task). The rank exchange carries
  * (doc_id, micros) pairs only.
  */
object LexicalStore {

  /** Term-hash partition count. 16 keeps sf-fixture directories
    * non-trivial (multi-term queries still prune); at 100 TB this is
    * 1024+ — it bounds the per-query read and the per-task build
    * memory, exactly like IVF's cell count. */
  val NumBuckets = 16

  /** Integer score quantum: micros of BM25 weight. 1e6 preserves ~6
    * significant digits of each contribution — far below any rank
    * difference BM25 can meaningfully express. Overflow headroom: a
    * contribution is at most `ScoreScale * idf * (k1+1)` and rational
    * idf is at most ~N, so at N = 1e10 docs (the 100 TB regime) a
    * single-occurrence term contributes ≤ 2.2e16 micros and a
    * 100-term query's document score stays ≤ 2.2e18 < 2^63. Queries
    * are short by construction; a thousand-term "query" at that
    * corpus size would need a smaller quantum. */
  val ScoreScale = 1000000.0

  /** RRF quantum (1e9/(k+rank) stays integral and exact). */
  val RrfScale = 1000000000.0

  /** The standard reciprocal-rank-fusion constant (Cormack et al.). */
  val DefaultRrfK = 60

  // ---- analyzers -----------------------------------------------------
  //
  // Lucene-class normalization, as a BUILD-TIME property of the layout:
  // `raw` is the engine's original exact-token rule (whitespace split,
  // nothing folded — every pre-r16 layout and oracle), `folded` is
  // lowercase + ASCII-punctuation-to-space, the minimum analyzer a
  // production lexical stack ships (a query for "The" must match
  // "the", and "sheets," must not be a different term from "sheets").
  // The choice is persisted in a one-row `_analyzer` sidecar written
  // by every build path and read back by every search verb, so index
  // and query time CANNOT drift — the failure mode of letting callers
  // pass an analyzer at query time is answering from an index that
  // folded differently. Layouts without the sidecar are `raw`, so all
  // existing layouts, oracles and hashes are untouched.

  /** Exact whitespace tokens — the engine's original rule. */
  val AnalyzerRaw = "raw"

  /** Lowercase + `[^a-z0-9 ]` → space, then whitespace tokens. The
    * fold is an explicit ASCII class (not `\\p{L}`-family) so the
    * Spark and DuckDB regex engines provably agree byte-for-byte. */
  val AnalyzerFolded = "folded"

  /** The [[AnalyzerFolded]] fold, then the classic English stop set
    * dropped and every surviving token Porter-stemmed — the Lucene
    * EnglishAnalyzer tier (StandardTokenizer + LowerCaseFilter +
    * StopFilter + PorterStemFilter): "Running" matches "runs" and
    * "run", and "the" stops flooding every conjunction. Applied at
    * BUILD time like the other tiers (the `_analyzer` sidecar folds
    * queries through the identical chain, so index and query time
    * cannot drift). Positional note: offsets are dense over the
    * POST-STOPWORD token sequence (Lucene instead leaves position
    * gaps via posIncrement; the dense rule keeps offsets derivable
    * by the oracle from the filtered sequence alone, and phrase
    * adjacency then means "adjacent after stopword removal" —
    * `"quality of data"` matches the phrase `"quality data"`, which
    * is classic stop-phrase behavior). */
  val AnalyzerEnglish = "english"

  /** Lucene StopAnalyzer's classic 33-word English stop set (public
    * knowledge, stable across Lucene's history — the default of its
    * English analysis chain). */
  val EnglishStopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  private val FoldPattern = "[^a-z0-9 ]"

  private def requireAnalyzer(a: String): Unit =
    require(a == AnalyzerRaw || a == AnalyzerFolded || a == AnalyzerEnglish,
      s"unknown analyzer '$a' (expected $AnalyzerRaw, $AnalyzerFolded " +
        s"or $AnalyzerEnglish)")

  /** Plan-side fold of a text column under `analyzer` — applied
    * BEFORE tokenization by every build path of an analyzed layout. */
  def foldText(c: Column, analyzer: String): Column = analyzer match {
    case AnalyzerRaw => c
    case _           => regexp_replace(lower(c), FoldPattern, " ")
  }

  /** Driver-side fold of query terms — evaluates the SAME catalyst
    * Lower + RegExpReplace tree the build plan used (the [[bucketOf]]
    * parity discipline: never trust a JVM locale lowercase to agree
    * with the plan's), then re-splits on the build's whitespace rule.
    * A term that folds to several tokens expands IN ORDER (so a
    * phrase keeps its shape); one that folds to nothing drops. */
  def foldQueryTerms(terms: Seq[String], analyzer: String): Seq[String] =
    analyzer match {
      case AnalyzerRaw => terms
      case _ =>
        import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace}
        val folded = terms.flatMap { t =>
          RegExpReplace(Lower(Literal(t)), Literal(FoldPattern), Literal(" "))
            .eval(null).toString.split(" ").filter(_.nonEmpty)
        }
        // the english tier then applies the SAME stop set and the
        // SAME static stem function the build plan's PorterStem
        // expression calls — one definition, so parity is structural
        if (analyzer == AnalyzerEnglish)
          folded.filterNot(EnglishStopwords.contains)
            .map(graft.functions.PorterStemmer.stem)
        else folded
    }

  // per-(session, path) analyzer memo: one fs stat + 1-row read on
  // first use; build paths pre-populate it, so warm searches never
  // touch the filesystem for this. Entries are STAMPED with the
  // per-path generation observed before the sidecar read and
  // validated against the current generation on every hit, which
  // closes the lost-invalidation race completely: a read that
  // straddles a rebuild may still publish the pre-rebuild value, but
  // the stale stamp makes every later reader reject it and re-read —
  // the check-then-publish window of a bare putIfAbsent (where the
  // sweep lands between the gen re-check and the publish) cannot
  // poison the cache permanently.
  private val analyzerCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Long, String)]
  private val analyzerGen = scala.collection.concurrent.TrieMap
    .empty[String, Long]

  /** Invalidate EVERY session's analyzer memo for `path` — a rebuild
    * or collection delete/rename must not leave another session in
    * the same JVM folding queries under the previous build's rule.
    * The generation bump happens FIRST so an in-flight sidecar read
    * that started before the sweep publishes a dead-on-arrival
    * stamp. */
  private def dropAnalyzerMemos(path: String): Unit = {
    analyzerGen.updateWith(path)(g => Some(g.getOrElse(0L) + 1L))
    analyzerCache.keys.filter(_._2 == path).foreach(analyzerCache.remove)
  }

  private def writeAnalyzer(spark: SparkSession, path: String,
                            analyzer: String): Unit = {
    import spark.implicits._
    Seq(analyzer).toDF("analyzer").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_analyzer")
    dropAnalyzerMemos(path)
    // a rewrite under a NEW analyzer also orphans any _symspell memo
    // (the dictionary it mirrored is gone with the old vocabulary)
    dropSymspellMemos(path)
    analyzerCache((IndexStore.sessionKey(spark), path)) =
      (analyzerGen.getOrElse(path, 0L), analyzer)
  }

  /** The analyzer a layout was built with (`raw` when the sidecar is
    * absent — every pre-analyzer layout). The sidecar value is
    * re-validated on read: a corrupted or hand-edited `_analyzer`
    * file must fail the same [[requireAnalyzer]] gate that guards
    * build-time inputs, not silently switch every search on the
    * layout to the catch-all folded rule. */
  def analyzerOf(spark: SparkSession, path: String): String = {
    val key = (IndexStore.sessionKey(spark), path)
    val g0 = analyzerGen.getOrElse(path, 0L)
    analyzerCache.get(key) match {
      case Some((g, a)) if g == g0 => a
      case _ =>
        val p = new org.apache.hadoop.fs.Path(s"$path/_analyzer")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val a =
          if (fs.exists(p)) {
            val v = Relations.parquet(spark, s"$path/_analyzer").head().getString(0)
            requireAnalyzer(v)
            v
          } else AnalyzerRaw
        // stamped with the generation observed BEFORE the read: if a
        // rebuild bumped it mid-read this entry self-invalidates.
        // CONDITIONAL publish — a reader that started before a
        // rebuild must not overwrite a fresher same-path entry with
        // its stale-stamped one (correct either way, the stale stamp
        // forces a re-read, but the clobber costs an avoidable
        // filesystem round-trip under races)
        analyzerCache.updateWith(key) {
          case fresher @ Some((g, _)) if g > g0 => fresher
          case _ => Some((g0, a))
        }
        if (analyzerGen.getOrElse(path, 0L) == g0) a
        else analyzerOf(spark, path) // a rebuild landed mid-read: retry
    }
  }

  private def bucketCol(term: Column): Column =
    pmod(xxhash64(term), lit(NumBuckets)).cast("int")

  /** Driver-side bucket of a query term — evaluates the SAME catalyst
    * XxHash64(seed=42) the build plan used, so search prunes to
    * exactly the directories build wrote (LexicalSpec pins parity). */
  def bucketOf(term: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(term)), 42L).eval(null).asInstanceOf[Long]
    java.lang.Math.floorMod(h, NumBuckets.toLong).toInt
  }

  /** Restrict posting rows to an id-ALLOWLIST — a 1-column (doc_id)
    * frame, typically the ids surviving a metadata predicate over a
    * metadata-bearing layout (the postings carry no metadata, so a
    * chroma `where=` reaches the lexical side as this semi-join; see
    * Hybrid.searchTopKHybrid). Applied BENEATH the rank, like every
    * `where` in the engine, so the top-k is exact over the filtered
    * set. Small allowlists broadcast; a corpus-sized one shuffles on
    * doc_id — the honest cost of filtering an index that doesn't
    * store the filter column. No broadcast hint: AQE sizes the
    * allowlist at runtime and picks broadcast when it fits. */
  private def allowFilter(post: DataFrame, allow: Option[DataFrame]): DataFrame =
    allow.fold(post)(a =>
      post.join(a.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi"))

  /** Per-(doc, term) BM25 contribution in integer micros. The
    * expression tree is mirrored TOKEN-FOR-TOKEN by the q115 oracle
    * SQL — IEEE +,-,*,/ are exactly specified, so identical trees over
    * identical inputs produce identical doubles in any engine, and the
    * floor-to-long is therefore identical too. Keep the two in sync. */
  def bm25Micros(tf: Column, df: Column, len: Column,
                 nDocs: Column, sumLen: Column): Column = {
    val tfD  = tf.cast(DoubleType)
    val dfD  = df.cast(DoubleType)
    val lenD = len.cast(DoubleType)
    val nD   = nDocs.cast(DoubleType)
    val avg  = sumLen.cast(DoubleType) / nD
    val idf  = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
    val tfn  = (tfD * lit(2.2)) /
      (tfD + lit(1.2) * (lit(0.25) + (lit(0.75) * lenD) / avg))
    floor(lit(ScoreScale) * (idf * tfn)).cast(LongType)
  }

  /** Build the inverted index from a (id, text) document set. Full
    * rebuild (static overwrite) — the df/len/stats denormalization
    * makes incremental append a re-aggregation, so this layout is
    * rebuilt per corpus version, like a Lucene force-merge; build
    * cost is two aggregations over one tokenize pass. A fresh build
    * also clears any `_tombstones` left by [[deleteLexical]] — the
    * new corpus version starts with nothing deleted. */
  def build(spark: SparkSession, docs: DataFrame, path: String,
            idCol: String = "doc_id", textCol: String = "text",
            analyzer: String = AnalyzerRaw): Unit = {
    requireAnalyzer(analyzer)
    // id keeps its native type (long doc ids, string chunk ids — the
    // layout serves doc-level and chunk-level corpora alike)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val tf = termFreqs(base, analyzer)
      .localCheckpoint() // one tokenize pass feeds tf, df, len, stats
    writePostings(spark, tf, path, analyzer)
    clearTombstones(spark, path)
  }

  /** Build a BM25F combined-field layout (Robertson & Zaragoza 2009
    * §2.2; Lucene ships the same idea as CombinedFieldQuery): the
    * principled alternative to per-field score fusion
    * ([[graft.operators.Hybrid]]'s searchTopKFields) when fields
    * should share ONE saturation curve — per-field weighted term
    * frequencies combine BEFORE the BM25 nonlinearity,
    * tf̃(t,d) = Σ_f w_f·tf_f(t,d), document length l̃(d) = Σ_f
    * w_f·len_f(d), df(t) = #docs containing t in ANY field, and the
    * ordinary kernel runs on the combined quantities. With integer
    * field weights every combined quantity is an exact integer, so
    * the layout is literally the standard denormalized layout built
    * from transformed tf rows — [[writePostings]] re-aggregates
    * df/len/stats from them, and EVERY existing search verb
    * (top-k, boolean, prefix/fuzzy/regexp expansion, explain, batch,
    * where-filter) works on it unchanged. Maintenance splits by
    * whether the verb re-tokenizes: [[deleteLexical]] and
    * [[compactLexical]] operate on the already-combined rows and
    * serve the layout as-is; [[upsertLexical]] would tokenize plain
    * single-field text into combined postings and is GUARDED OFF —
    * the stored `_fields` descriptor routes new documents through
    * [[upsertBm25F]] instead. `fieldCols` maps text
    * columns of `docs` to their positive integer weights; fields may
    * overlap (a title repeated inside the body double-counts by
    * design — that is BM25F's field-boost semantic). One tokenize
    * pass per field, one (doc, term) partial agg — the build cost of
    * [[build]] times |fields|, same bucket-partitioned output. */
  def buildBm25F(spark: SparkSession, docs: DataFrame, path: String,
                 fieldCols: Seq[(String, Long)],
                 idCol: String = "doc_id",
                 analyzer: String = AnalyzerRaw): Unit = {
    requireAnalyzer(analyzer)
    requireBm25fFields(fieldCols)
    val combined = combinedTermFreqs(docs, fieldCols, idCol, analyzer)
      .localCheckpoint() // one combined pass feeds tf, df, len, stats
    writePostings(spark, combined, path, analyzer, fields = Some(fieldCols))
    clearTombstones(spark, path)
  }

  private def requireBm25fFields(fieldCols: Seq[(String, Long)]): Unit = {
    require(fieldCols.nonEmpty, "BM25F needs at least one field")
    require(fieldCols.forall(_._2 > 0), "field weights must be positive")
  }

  /** The BM25F combined-tf transform — ONE definition for
    * [[buildBm25F]] and [[upsertBm25F]], so a maintenance batch is
    * provably the same transform the build ran: per-field tokenize
    * under `analyzer`, weight each field's tf by its integer w_f,
    * sum per (doc, term). */
  private def combinedTermFreqs(docs: DataFrame,
                                fieldCols: Seq[(String, Long)],
                                idCol: String,
                                analyzer: String): DataFrame =
    fieldCols.map { case (c, w) =>
        termFreqs(docs.select(col(idCol).as("doc_id"), col(c).as("text")),
            analyzer)
          .select(col("doc_id"), col("term"),
            (col("tf") * lit(w)).as("tf"))
      }
      .reduce(_.union(_))
      .groupBy(col("doc_id"), col("term")).agg(sum(col("tf")).as("tf"))

  /** The BM25F field descriptor stored with the layout — Some((name,
    * weight) in build order) iff the layout was built by
    * [[buildBm25F]] (and kept by [[upsertBm25F]]/[[compactLexical]]),
    * None for a plain layout. A plain [[build]] clears it (its static
    * postings overwrite removes every sidecar — a full rebuild
    * legitimately redefines the layout as single-field). */
  def fieldsOf(spark: SparkSession, path: String): Option[Seq[(String, Long)]] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_fields")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    // collectCached + driver sort on `pos` — the descriptor is a
    // handful of rows; the old per-call orderBy+collect was a one-task
    // job per maintenance/search verb
    else Some(Relations.collectCached(spark, s"$path/_fields")
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getLong(2))).toSeq)
  }

  /** [[buildBm25F]] under the [[buildOnce]] memo — the fields
    * descriptor rides the key's text-column slot, so a same-path
    * build over different fields/weights must not silently no-op. */
  def buildBm25FOnce(spark: SparkSession, docs: => DataFrame, path: String,
                     fieldCols: Seq[(String, Long)],
                     idCol: String = "doc_id",
                     analyzer: String = AnalyzerRaw): Unit =
    builtOnce.getOrElseUpdate(
      (IndexStore.sessionKey(spark), path, idCol,
        fieldCols.map { case (c, w) => s"$c^$w" }.mkString(","),
        s"bm25f/$analyzer"),
      buildBm25F(spark, docs, path, fieldCols, idCol, analyzer))

  /** Token-stage analysis under `analyzer`, applied AFTER the text
    * fold and whitespace split by every build path: the `english`
    * tier drops the stop set and Porter-stems each surviving token
    * through the codegen'd [[graft.functions.PorterStem]] expression
    * (no ScalaUDF ahead of the tf shuffle); raw/folded are the
    * identity. The query side reaches the identical chain via
    * [[foldQueryTerms]] — same stop Seq, same static stem method. */
  private def analyzeTerms(toks: DataFrame, analyzer: String): DataFrame =
    if (analyzer != AnalyzerEnglish) toks
    else toks.filter(!col("term").isInCollection(EnglishStopwords))
      .withColumn("term",
        graft.functions.PorterStem.porterStem(col("term")))

  /** The english stop set as a SQL array literal — the positional
    * builder filters stopwords INSIDE its array lambda so offsets
    * stay dense over the surviving tokens. */
  private def stopArraySql: String =
    EnglishStopwords.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** (doc_id, term, tf) of a (doc_id, text) frame under `analyzer` —
    * the one tokenization kernel every lexical build path shares. */
  private def termFreqs(base: DataFrame, analyzer: String): DataFrame =
    analyzeTerms(
        graft.operators.Corpus.tokens(
          base.withColumn("text", foldText(col("text"), analyzer)),
          "text", "doc_id"),
        analyzer)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Denormalize df(term) and len(doc_id) into each posting row via
    * partial-agg joins: a vocabulary-sized `groupBy(term).count` and
    * a doc-count-sized `groupBy(doc_id).sum(tf)`, joined back to the
    * postings. Hot-term note (the q53/q144 lesson): the previous
    * whole-partition windows buffered EVERY posting of a key in one
    * task's window frame — a stopword present in most documents made
    * that single task corpus-sized. The aggregates here combine
    * map-side to one row per key before their shuffle, and the joins
    * back stream (sort-merge or AQE-broadcast of the vocabulary-sized
    * side, skew-splittable) — no per-key buffering anywhere, so the
    * hottest term costs one streamed join partition, not one
    * buffering task. */
  private def withDfLen(tf: DataFrame): DataFrame = {
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val lenTab = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    tf.join(dfTab, "term").join(lenTab, "doc_id")
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("len"))
  }

  /** Shared write path: (doc_id, term, tf) rows — already
    * materialized, so overwriting a layout they were read from is
    * safe — re-aggregated to df/len/stats and written as the
    * bucket-partitioned layout + `_stats` sidecar.
    *
    * `fields`: Some(descriptor) marks the layout BM25F — its tf rows
    * are combined-field quantities, so plain (id, text) maintenance
    * must not union single-field rows into them ([[upsertLexical]]'s
    * guard reads this sidecar). Written FIRST among the sidecars,
    * before even `_analyzer`: the missing-`_stats` loudness below
    * protects search but NOT maintenance (upsert never reads
    * `_stats`), so any crash window that left combined postings
    * unmarked would let a plain upsert pass the guard silently;
    * fields-first means an interrupted BM25F rewrite either carries
    * its mark or has no `_analyzer` — and analyzerOf fails loudly on
    * every verb. None on a plain rewrite; the static postings
    * overwrite has already cleared any previous sidecar, so absence
    * needs no delete. */
  private def writePostings(spark: SparkSession, tf: DataFrame,
                            path: String, analyzer: String,
                            fields: Option[Seq[(String, Long)]] = None): Unit = {
    // `_symspell` derives from the vocabulary this rewrite replaces:
    // invalidate it FIRST (memo bump, then meta, then index — the
    // meta-present-implies-index-present invariant), so the indexed
    // suggest/fuzzy verbs fail loudly with the named "buildSymSpell
    // first" message on the new vocabulary instead of serving the
    // previous build's deletion dictionary (the r16 silent-drift
    // defect) or an obscure missing-path read through a stale memo.
    invalidateSymSpell(spark, path)
    withDfLen(tf)
      .withColumn("bucket", bucketCol(col("term")))
      // one task per bucket -> one file per directory
      .repartition(NumBuckets, col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket")
      .parquet(path)
    // `_analyzer` is written FIRST among the sidecars (the static
    // postings overwrite above clears the whole path, so every
    // sidecar is gone here): a crash after any later sidecar write
    // then leaves `_stats`/`_vocab` missing — a LOUD missing-path
    // read — whereas analyzer-last left a complete-looking folded
    // layout that silently read back as `raw` and misranked every
    // query with no error.
    // `_fields` lands FIRST among the sidecars on a BM25F rewrite —
    // BEFORE `_analyzer` (self-review r19): the missing-`_stats`
    // loudness argument below protects SEARCH but not MAINTENANCE
    // (upsertLexical reads fieldsOf + analyzerOf + postings, never
    // `_stats`), so a crash that left combined postings UNMARKED
    // would let a later plain upsert pass the BM25F guard and
    // silently corrupt the layout. Fields-first closes every window:
    // crash before `_fields` leaves no `_analyzer` either, and
    // analyzerOf fails loudly on any subsequent verb.
    fields.foreach { fs =>
      import spark.implicits._
      fs.zipWithIndex.map { case ((f, w), i) => (i, f, w) }
        .toDF("pos", "field", "weight")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/_fields")
    }
    writeAnalyzer(spark, path, analyzer)
    // `_stats` and `_vocab` both derive from the checkpointed tf and
    // are ordered only AFTER `_analyzer` (the crash-window discipline
    // above needs analyzer-first; between these two the order is
    // immaterial — a crash leaving either missing is a LOUD
    // missing-path read) — so the two little aggregate+write jobs
    // overlap instead of queueing (guide §2.6).
    // `_vocab` sidecar (term, df) — the term dictionary prefix/
    // wildcard expansion reads (Lucene's terms index): bucket =
    // hash(term) makes the postings unprunable BY DESIGN for a
    // prefix, so [[searchPrefix]] scans this vocabulary-sized
    // sidecar instead of the corpus-sized postings. Rewritten by
    // every postings rewrite (build/compact/upsert), so dictionary
    // and postings can't drift.
    awaitInOrder(Seq(
      () => tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/_stats"),
      () => tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/_vocab")))
  }

  // ---- maintenance: tombstone delete, compact, upsert ---------------
  //
  // The Lucene model, made explicit: a delete only APPENDS doc ids to
  // a `_tombstones` sidecar (O(ids) IO — a takedown never rewrites
  // postings), and every search anti-joins candidates against the
  // tombstone set BENEATH the rank, so deleted docs stop surfacing
  // immediately. What stays stale until compaction — exactly as in
  // Lucene, where docFreq counts deleted docs until segments merge —
  // is df/n_docs/sum_len: surviving docs keep their build-time scores
  // (LexicalSpec pins this). `compactLexical` is the expungeDeletes:
  // rebuild postings from survivors with re-aggregated stats.
  // `upsertLexical` is compact-with-adds: replaced ids drop, new
  // (id, text) rows tokenize in, one rewrite. At 100 TB the rewrite
  // is the honest cost of a layout that denormalizes df into the
  // posting row for single-scan scoring; per-segment layouts trade
  // that write cost for a per-query stats merge.

  private def tombDir(path: String) = s"$path/_tombstones"

  /** The tombstoned doc_id set, or None when nothing was deleted.
    * Read distinct, so replayed deletes (at-least-once takedown
    * queues) change nothing. */
  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombDir(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(Relations.parquet(spark, tombDir(path)).select(col("doc_id")).distinct())
    else None
  }

  private def clearTombstones(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tombDir(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Delete-by-id: append `ids` (a 1-column doc_id frame of the
    * layout's native id type — DataFrame-form, so a 100 TB takedown
    * list never drives through the driver) to the tombstone sidecar.
    * Idempotent under replay; postings untouched. */
  def deleteLexical(spark: SparkSession, path: String, ids: DataFrame): Unit =
    ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .coalesce(1).write.mode(SaveMode.Append).parquet(tombDir(path))

  /** [[deleteLexical]] for a driver-sized id list. */
  def deleteLexical(spark: SparkSession, path: String, ids: Seq[Any]): Unit = {
    import spark.implicits._
    deleteLexical(spark, path,
      ids.map(_.toString).toDF("doc_id")
        .select(col("doc_id").cast(idType(spark, path))))
  }

  private def idType(spark: SparkSession, path: String) =
    Relations.parquet(spark, path).schema("doc_id").dataType

  /** Surviving (doc_id, term, tf) rows: current postings minus
    * tombstoned ids, materialized so the caller can overwrite the
    * layout they came from. */
  private def survivorTf(spark: SparkSession, path: String): DataFrame = {
    val tf = Relations.parquet(spark, path).select(col("doc_id"), col("term"), col("tf"))
    tombstones(spark, path).fold(tf)(t => tf.join(t, Seq("doc_id"), "left_anti"))
      .localCheckpoint()
  }

  /** Rewrite the layout from surviving postings with freshly
    * re-aggregated df/len/stats, then drop the tombstones — after
    * this, scores equal a from-scratch build over the survivors
    * (LexicalSpec compares byte-for-value). */
  def compactLexical(spark: SparkSession, path: String): Unit = {
    val analyzer = analyzerOf(spark, path)
    // a BM25F layout compacts legitimately (survivor tf rows are
    // already combined-field quantities) — but the rewrite must
    // re-thread the `_fields` descriptor or the compacted layout
    // would read back unmarked and accept a corrupting plain upsert
    val fields = fieldsOf(spark, path)
    writePostings(spark, survivorTf(spark, path), path, analyzer, fields)
    clearTombstones(spark, path)
  }

  /** Upsert (id, text) documents: postings of the upserted ids (and
    * any tombstoned ids) drop, the new texts tokenize in, and the
    * merged corpus rewrites with fresh stats — compact-with-adds.
    * An id absent from the layout inserts; a tombstoned id that
    * reappears in `docs` is live again with its new text. */
  def upsertLexical(spark: SparkSession, path: String, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    // the wrong-family-verb guard, lexical edition: on a BM25F layout
    // the survivor tf rows are COMBINED-field quantities — unioning a
    // plain single-field tokenize into them would score revised docs
    // BM25 while survivors score BM25F, a silent ranking corruption
    // with no error anywhere downstream
    require(fieldsOf(spark, path).isEmpty,
      s"$path is a BM25F combined-field layout — a plain (id, text) " +
        "upsert would mix single-field tf rows into combined-field " +
        "postings; use upsertBm25F (it routes the batch through the " +
        "stored field/weight transform)")
    // new texts tokenize under the LAYOUT's analyzer (read from the
    // sidecar) — an upsert must never mix folding rules in one index
    val analyzer = analyzerOf(spark, path)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // the two materializations are independent (newTf reads `docs`,
    // survivors reads the layout) — overlap their jobs (guide §2.6);
    // input order preserves the serial form's error reporting
    val Seq(newTf, survivorsAll) = awaitInOrder(Seq(
      () => termFreqs(base, analyzer)
        .localCheckpoint(), // one tokenize pass feeds the df/len joins + stats
      () => survivorTf(spark, path)))
    val survivors = survivorsAll
      .join(base.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    // survivors are already materialized and newTf never reads `path`,
    // so the union can overwrite the layout without a second checkpoint
    writePostings(spark, survivors.union(newTf), path, analyzer)
    clearTombstones(spark, path)
  }

  /** [[upsertLexical]] for a BM25F layout: the batch's documents
    * carry the SAME field columns the layout was built from — the
    * stored `_fields` descriptor names them — and tokenize through
    * the identical [[combinedTermFreqs]] transform (weighted tf
    * combine before saturation), so revised and surviving documents
    * score under one kernel over one kind of quantity. Same
    * compact-with-adds rewrite as the plain upsert: replaced and
    * tombstoned ids drop, the merged corpus re-aggregates df/len/
    * stats, and the descriptor rides the rewrite. Fails loudly on a
    * plain layout (use [[upsertLexical]]) — the guard pair keeps
    * each maintenance verb on its own layout family. */
  def upsertBm25F(spark: SparkSession, path: String, docs: DataFrame,
                  idCol: String = "doc_id"): Unit = {
    val fields = fieldsOf(spark, path).getOrElse(sys.error(
      s"$path is a plain lexical layout (no _fields descriptor) — " +
        "use upsertLexical"))
    val missing = fields.map(_._1).filterNot(docs.columns.contains)
    require(missing.isEmpty,
      s"BM25F upsert batch is missing field column(s) " +
        s"${missing.mkString(", ")} — the layout was built from " +
        fields.map { case (f, w) => s"$f^$w" }.mkString(", "))
    val analyzer = analyzerOf(spark, path)
    // independent materializations, overlapped (the upsertLexical
    // argument)
    val Seq(newTf, survivorsAll) = awaitInOrder(Seq(
      () => combinedTermFreqs(docs, fields, idCol, analyzer)
        .localCheckpoint(),
      () => survivorTf(spark, path)))
    val ids = docs.select(col(idCol).as("doc_id")).distinct()
    val survivors = survivorsAll
      .join(ids, Seq("doc_id"), "left_anti")
    writePostings(spark, survivors.union(newTf), path, analyzer,
      fields = Some(fields))
    clearTombstones(spark, path)
  }

  // ---- segmented layout: append WITHOUT rewrite ---------------------
  //
  // The denormalized layout above rewrites per corpus version; this is
  // Lucene's other answer, made explicit: each append writes a NEW
  // SEGMENT (its own postings with PER-SEGMENT df, its own stats row),
  // old segments stay byte-untouched (LexicalSpec pins it), and query
  // time merges the term statistics — global df(term) = Σ segments'
  // df, global n_docs/sum_len = Σ stats rows — exactly how a Lucene
  // IndexReader sums docFreq across its segment readers. The trade vs
  // the denormalized layout: append is O(batch) instead of O(corpus),
  // search pays a |query-terms|-row stats merge (vocabulary-pruned,
  // never corpus-sized). Layout:
  //
  //   path/seg=<s>/bucket=<b>/part-*.parquet  (term, doc_id, tf, df, len)
  //   path/_segstats/part-*.parquet           (seg, n_docs, sum_len)
  //
  // df in-row is the SEGMENT's df; a doc lives in exactly one segment,
  // so len is exact and the merged scoring equals a from-scratch build
  // over the union corpus (the q157 gate proves it hash-exact).

  /** Per-segment (doc_id, term, tf, df, len) rows of one document
    * batch — the build() aggregation scoped to the batch. */
  private def segmentRows(docs: DataFrame, idCol: String, textCol: String,
                          analyzer: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val tf = termFreqs(base, analyzer)
      .localCheckpoint() // one tokenize pass feeds the df/len joins
    withDfLen(tf)
  }

  private def segIds(spark: SparkSession, path: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("seg=")).map(_.stripPrefix("seg=").toInt).sorted
  }

  /** Append `docs` as the next segment: one batch-sized aggregation
    * and write; no existing segment file is touched. Caller contract
    * (as in Lucene): a doc id appears in at most one segment —
    * upsert into a segmented layout is therefore delete, then
    * [[compactSegments]] (which expunges the dead rows and clears
    * the tombstones), then append: a tombstoned id cannot be
    * re-appended directly, because this append-only path cannot
    * touch the old segment holding its dead rows (the guard below
    * fails loudly with exactly that message; it deliberately also
    * rejects ids that were tombstoned without ever being indexed —
    * distinguishing those would cost a corpus probe per append for
    * a caller mistake better surfaced than absorbed). */
  def appendLexicalSegment(spark: SparkSession, docs: DataFrame, path: String,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           analyzer: String = AnalyzerRaw): Unit = {
    requireAnalyzer(analyzer)
    val existing = segIds(spark, path)
    // a second batch must fold exactly like the first — a segmented
    // index whose segments disagree on the analyzer is two indexes
    if (existing.nonEmpty) {
      val built = analyzerOf(spark, path)
      require(built == analyzer,
        s"layout at $path was built with analyzer '$built', append got '$analyzer'")
    }
    val seg = existing.lastOption.fold(0)(_ + 1)
    // a tombstoned id cannot be re-appended: its dead rows sit in an
    // old segment this append-only path must not touch, so clearing
    // the tombstone would resurrect them alongside the new rows (a
    // doc in two segments — double-counted everywhere). The
    // denormalized upsert CAN resurrect because it rewrites; here the
    // honest answer is a loud compact-first message. Ids-only check,
    // batch-sized, only when tombstones exist at all.
    tombstones(spark, path).foreach { t =>
      val clash = docs.select(col(idCol).as("doc_id"))
        .join(t, Seq("doc_id"), "left_semi").limit(1).count()
      require(clash == 0L,
        s"batch re-appends tombstoned doc ids — the append-only " +
          s"layout cannot resurrect them: compactSegments($path) first")
    }
    // an append grows the vocabulary, so any `_symspell` index over
    // the merged dictionary is stale the moment the segment lands —
    // same delete-first invalidation as the denormalized rewrites
    invalidateSymSpell(spark, path)
    val rows = segmentRows(docs, idCol, textCol, analyzer).localCheckpoint()
    rows.withColumn("bucket", bucketCol(col("term")))
      .repartition(NumBuckets, col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // only this seg's dirs
      .partitionBy("bucket")
      .parquet(s"$path/seg=$seg")
    // first segment: the analyzer sidecar lands BEFORE `_segstats`
    // (the writePostings ordering argument): a crash between the two
    // leaves a layout without its `_segstats` discriminator, whose
    // next read fails loudly on the missing `_vocab` path — never a
    // complete-looking layout silently reading back as `raw`
    if (existing.isEmpty) writeAnalyzer(spark, path, analyzer)
    // `_segstats` and `_segvocab` both derive from the checkpointed
    // rows and are ordered only after `_analyzer` (the writePostings
    // sidecar discipline) — overlap the two small aggregate+write jobs
    // (guide §2.6); per-segment term dictionary: one (term, df) row
    // per segment term in the SEGMENT's own `_segvocab` directory so
    // the append-only contract holds (query-time merge sums disjoint
    // dfs — the searchTopKSegmented gdf argument).
    awaitInOrder(Seq(
      () => rows.select(col("doc_id"), col("len")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .select(lit(seg).as("seg"), col("n_docs"), col("sum_len"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(s"$path/_segstats"),
      () => rows.select(col("term"), col("df")).distinct()
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/_segvocab/seg=$seg")))
    ()
  }

  /** Merge all segments back into one (the Lucene forceMerge):
    * re-aggregate (doc_id, term, tf) across segments into a single
    * seg=0 with fresh per-segment(=global) df and one stats row.
    * Scores are unchanged by construction — the merge computes
    * exactly the statistics the query-time merge was deriving
    * (LexicalSpec pins it); what it buys is one directory level of
    * fan-in and the smallest possible stats-merge at query time.
    * Amortization policy (when to merge) is the caller's, as in
    * Lucene. */
  def compactSegments(spark: SparkSession, path: String): Unit = {
    val analyzer = analyzerOf(spark, path) // read BEFORE the delete
    // the merge is the segmented layout's expungeDeletes: tombstoned
    // docs drop HERE (search masked them since the delete; the merged
    // segment's re-aggregated df/stats finally stop counting them —
    // Lucene's docFreq-until-merge semantics end at the merge too).
    // One survivor definition with the denormalized compact/upsert;
    // the whole-path delete below also removes the `_tombstones`
    // sidecar, so the rewritten layout starts with nothing deleted.
    val tf = survivorTf(spark, path)
    // the merge rewrites the dictionary the `_symspell` index mirrors
    // (per-segment dfs collapse into global ones): invalidate meta-
    // first BEFORE the whole-path delete, so no crash state and no
    // stale memo can leave the indexed suggest/fuzzy verbs answering
    // from the pre-merge deletion dictionary
    invalidateSymSpell(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val rows = withDfLen(tf)
    rows.withColumn("bucket", bucketCol(col("term")))
      .repartition(NumBuckets, col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(s"$path/seg=0")
    // analyzer sidecar FIRST among the sidecars (the writePostings
    // ordering argument): any later crash leaves `_segstats` missing
    // — the segmented discriminator — so the next read fails loudly
    // instead of silently folding under the wrong rule
    writeAnalyzer(spark, path, analyzer)
    // both sidecars derive from the checkpointed tf — overlap the two
    // small aggregate+write jobs (guide §2.6); the merged dictionary's
    // global df comes straight from tf (rows would re-run the df/len
    // joins a second time)
    awaitInOrder(Seq(
      () => tf.select(col("doc_id"), col("tf"))
        .groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .select(lit(0).as("seg"), col("n_docs"), col("sum_len"))
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/_segstats"),
      () => tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/_segvocab/seg=0")))
    ()
  }

  /** Segmented top-`k`: postings pruned to the query terms' buckets
    * ACROSS all segments, per-term global df merged from the pruned
    * rows (a |query-terms|-row aggregate joined back — AQE
    * broadcasts it), global stats summed from the `_segstats` rows,
    * then the same quantized BM25 and rank as the denormalized path.
    * Scores equal a from-scratch single-layout build over the union
    * corpus (q157 pins it hash-exact). */
  def searchTopKSegmented(spark: SparkSession, path: String,
                          queryTerms: Seq[String], k: Int = 10): DataFrame =
    rankAnalyzedSegmented(spark, path,
      foldQueryTerms(queryTerms, analyzerOf(spark, path)), k)

  /** [[rankAnalyzed]]'s segmented sibling — the post-fold body of
    * [[searchTopKSegmented]], reachable with PRE-ANALYZED terms (the
    * dictionary-expansion verbs route here on segmented layouts; see
    * rankAnalyzed's Scaladoc for why a second fold is wrong). */
  private[graft] def rankAnalyzedSegmented(spark: SparkSession, path: String,
                                           terms0: Seq[String],
                                           k: Int): DataFrame = {
    val scored = contributionsSegmented(spark, path,
        terms0.filter(_.nonEmpty).distinct)
      .groupBy(col("doc_id"), col("seg"))
      .agg(sum(col("micros")).as("lex_micros"))
    scored.orderBy(col("lex_micros").desc, col("doc_id")).limit(k)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("lex_micros").desc, col("doc_id"))))
      .select(col("lex_rank"), col("doc_id"), col("seg"), col("lex_micros"))
  }

  /** [[contributions]]' segmented sibling: the per-(doc, term)
    * frame [[rankAnalyzedSegmented]] aggregates and
    * [[explainScore]] decomposes — ONE definition, so the segmented
    * explanation is the merged-statistics scorer's own code path.
    * Global df merges from the PRE-candidate-filter pruned rows
    * (per-segment dfs sum — disjoint doc sets): a candidate filter
    * narrows whose scores are explained, never the corpus
    * statistics they are computed from. Returns (doc_id, seg, term,
    * tf, df, len, micros) with df already the MERGED global value. */
  private def contributionsSegmented(spark: SparkSession, path: String,
                                     terms: Seq[String],
                                     allow: Option[DataFrame] = None)
      : DataFrame = {
    require(terms.nonEmpty, "lexical search needs at least one term")
    val buckets = terms.map(bucketOf).distinct
    // summed driver-side from the collectCached segment-stats rows —
    // per-segment longs, same Long addition the old 1-row aggregate
    // performed distributively (order-free), minus its per-query scan
    // + broadcast jobs
    val segRows = Relations.collectCached(spark, s"$path/_segstats")
    val nDocs = lit(segRows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum)
    val sumLen = lit(segRows.map(r => r.getLong(r.fieldIndex("sum_len"))).sum)
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
    // global df: per-segment dfs are disjoint doc sets, so they sum;
    // one distinct (seg, term, df) row per segment contributes once.
    // Computed BEFORE the tombstone mask — docFreq counts deleted
    // docs until segments merge, Lucene's own semantics and this
    // layout's settled `_vocab` convention
    val gdf = post.select(col("seg"), col("term"), col("df")).distinct()
      .groupBy(col("term")).agg(sum(col("df")).as("gdf"))
    post.transform(p => allowFilter(p, allow))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
      .join(broadcast(gdf), "term")
      .select(col("doc_id"), col("seg"), col("term"), col("tf"),
        col("gdf").as("df"), col("len"),
        bm25Micros(col("tf"), col("gdf"), col("len"),
          nDocs, sumLen).as("micros"))
  }

  // key includes the LAYOUT KIND: the scoring and positional builders
  // share one memo map, and without the discriminator the second
  // builder aimed at the same path would silently no-op, leaving the
  // wrong layout on disk
  private val builtOnce = scala.collection.concurrent.TrieMap
    .empty[(String, String, String, String, String), Unit]

  /** [[build]] at most once per (session, path, id/text columns) —
    * the Verify gate, spec, and bench share one physical build (the
    * buildIvfOnce discipline; the build is deterministic up to file
    * split, and every reader re-aggregates, so sharing is safe). The
    * column names are part of the key, as build parameters always are
    * (buildIvfOnce/buildHnswOnce) — a same-path build over different
    * columns must not silently no-op. */
  def buildOnce(spark: SparkSession, docs: => DataFrame, path: String,
                idCol: String = "doc_id", textCol: String = "text",
                analyzer: String = AnalyzerRaw): Unit =
    builtOnce.getOrElseUpdate(
      (IndexStore.sessionKey(spark), path, idCol, textCol, s"scoring/$analyzer"),
      build(spark, docs, path, idCol, textCol, analyzer))

  /** [[buildPositional]] under the same once-per-(session, path) memo
    * as [[buildOnce]] — gate paths build each layout once per verify
    * session. */
  def buildPositionalOnce(spark: SparkSession, docs: => DataFrame,
                          path: String, idCol: String = "doc_id",
                          textCol: String = "text",
                          analyzer: String = AnalyzerRaw): Unit =
    builtOnce.getOrElseUpdate(
      (IndexStore.sessionKey(spark), path, idCol, textCol,
        s"positional/$analyzer"),
      buildPositional(spark, docs, path, idCol, textCol, analyzer))

  /** Drop every session's build-once memo for `path` — called by
    * [[IndexStore.renameCollection]]/[[IndexStore.deleteCollection]]
    * when the name frees up, so a later build at it really builds. */
  private[graft] def dropBuildMemos(path: String): Unit = {
    builtOnce.keys.filter(_._2 == path).foreach(builtOnce.remove)
    dropAnalyzerMemos(path)
    // a delete/rename frees the path for a DIFFERENT corpus: a later
    // build there must not serve suggestions through this path's old
    // symspell memo (the memo mirrors the meta sidecar — it must die
    // with every other per-path memo here)
    dropSymspellMemos(path)
  }

  /** Lexical top-`k`: (doc_id, lex_rank, lex_micros) for the documents
    * best matching `queryTerms` under the quantized BM25 above.
    * Reads ONLY the buckets of the query's terms (partition pruning +
    * a pushed `term IN (...)` row-group filter); the TakeOrdered heap
    * and every exchange after the pruned scan carry (doc_id, micros)
    * pairs. `where` optionally filters candidate doc_ids BENEATH the
    * rank (the V9 `where=` composition — a predicate over the posting
    * columns, i.e. doc_id). */
  /** UNRANKED exact BM25 scores of every matching doc — the shared
    * scan-and-aggregate [[searchTopKLexical]] ranks and
    * [[searchTopKFields]] weight-sums across field layouts (a doc in
    * the fused top-k need not be in any single field's top-k, so the
    * field scorer must not truncate). Same pruned read, same
    * (doc_id, micros) exchanges. */
  /** The per-(doc, term) contribution frame every denormalized-layout
    * scorer aggregates: bucket-pruned, term-IN-pushed, allow-filtered,
    * tombstone-masked posting rows with the 1-row stats broadcast in
    * and [[bm25Micros]] evaluated — (doc_id, term, tf, df, len,
    * micros). ONE definition feeds [[scoreLexical]]'s sum AND
    * [[explainScore]]'s decomposition, so the explanation is the
    * score's own code path, not a parallel reimplementation. */
  /** The `_stats` sidecar's single (n_docs, sum_len) row as driver
    * literals. Every denormalized-layout scorer used to crossJoin the
    * broadcast 1-row frame into its plan — a sidecar scan plus a
    * broadcast-exchange job PER QUERY for two constants the driver
    * can hold (guide §2.4); the collectCached read pays one one-task
    * job per layout VERSION instead, invalidated by the sidecar's
    * listing signature on every rewrite. Missing `_stats` still fails
    * loudly (the crash-window contract) — the uncached fallback read
    * throws the same missing-path error at the same verb-call point. */
  private def statsLits(spark: SparkSession, path: String)
      : (Column, Column) = {
    val r = Relations.collectCached(spark, s"$path/_stats").head
    (lit(r.getLong(r.fieldIndex("n_docs"))),
      lit(r.getLong(r.fieldIndex("sum_len"))))
  }

  private def contributions(spark: SparkSession, path: String,
                            terms: Seq[String],
                            where: Option[Column] = None,
                            allow: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "lexical search needs at least one term")
    val buckets = terms.map(bucketOf).distinct
    val (nDocs, sumLen) = statsLits(spark, path)
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .filter(where.getOrElse(lit(true)))
      .transform(p => allowFilter(p, allow))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
    post
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("len"),
        bm25Micros(col("tf"), col("df"), col("len"),
          nDocs, sumLen).as("micros"))
  }

  private def scoreLexical(spark: SparkSession, path: String,
                           terms: Seq[String],
                           where: Option[Column] = None,
                           allow: Option[DataFrame] = None): DataFrame =
    contributions(spark, path, terms, where, allow)
      .select(col("doc_id"), col("micros"))
      .groupBy(col("doc_id")).agg(sum(col("micros")).as("lex_micros"))

  /** Relevance explain — Lucene's Explanation for the quantized
    * BM25: the per-(doc, term) decomposition of a query's scores
    * over a candidate set `cands` (a 1-column doc_id frame,
    * typically the ranked page the caller is debugging — "why does
    * doc X outrank doc Y" reads as two rows per term instead of one
    * opaque integer). Each row carries every factor the
    * contribution is computed FROM — tf, df, len (with n_docs and
    * sum_len folded in by the shared kernel) — plus the integer
    * `micros` itself; because scores are exact integers, the
    * explanation is SUM-EXACT: per-doc Σ micros equals the rank
    * path's lex_micros to the last digit (LexicalSpec pins it for
    * BOTH layout families, and q222/q224 gate it against the
    * oracle), a promise float-BM25 explain APIs cannot make. Serves
    * the denormalized AND the segmented layout — each through the
    * contribution frame its OWN scorer aggregates
    * ([[contributions]] / [[contributionsSegmented]]), so the
    * explanation is the score's code path, not a parallel
    * reimplementation; the segmented frame's df is the merged
    * global value the scorer used. Same bucket-pruned read as the
    * rank path with the candidate spine filtered beneath it;
    * ≤ |cands|·|terms| rows out, ordered (doc_id, term). */
  def explainScore(spark: SparkSession, path: String,
                   queryTerms: Seq[String], cands: DataFrame): DataFrame = {
    val terms = foldQueryTerms(queryTerms, analyzerOf(spark, path))
      .filter(_.nonEmpty).distinct
    val contrib =
      if (isSegmented(spark, path))
        contributionsSegmented(spark, path, terms, Some(cands))
      else contributions(spark, path, terms, allow = Some(cands))
    contrib.select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("len"), col("micros"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** [[explainScore]] for [[searchTopKFields]]: the per-(field,
    * doc, term) decomposition of a weighted multi-field score.
    * `field` is the 0-based position in `fields` (the caller's own
    * ordering); rows carry the UNWEIGHTED micros plus the field's
    * weight, because the field scorer applies its weight to the
    * per-(field, doc) SUBTOTAL through the overflow-safe integer
    * split `w·(S div 1e6) + (w·(S mod 1e6)) div 1e6` — a floor that
    * does NOT distribute over terms, so per-term weighted rows
    * could not sum exactly. The recombination IS exact and pinned
    * (LexicalSpec): group by (field, doc), S = Σ micros, apply the
    * split, sum over fields == field_micros to the last digit. A
    * field whose analyzer folds the whole query away contributes no
    * rows, mirroring the scorer's union-drop. */
  def explainScoreFields(spark: SparkSession,
                         fields: Seq[(String, Long)],
                         queryTerms: Seq[String],
                         cands: DataFrame): DataFrame = {
    require(fields.nonEmpty, "multi-field explain needs at least one field")
    require(fields.forall(_._2 > 0), s"field weights must be positive")
    // fold per field FIRST (driver-side, no jobs): the all-fields-
    // empty require must fire BEFORE any page execution, and the
    // page-sized checkpoint below is only worth its materialization
    // job when >= 2 fields will actually re-read the page (r22,
    // ADVICE item)
    val folded = fields.zipWithIndex.flatMap { case ((path, w), i) =>
      val terms = foldQueryTerms(queryTerms, analyzerOf(spark, path))
        .filter(_.nonEmpty).distinct
      if (terms.isEmpty) None else Some((path, w, i, terms))
    }
    require(folded.nonEmpty,
      s"query $queryTerms folds to nothing under every field's analyzer")
    // page-sized checkpoint: each field's contribution read gates on
    // `cands`, and a lazy search page handed in as cands would
    // otherwise re-execute once PER CONTRIBUTING FIELD (q229 ran its
    // own searchTopKFields three times for a 10-row decomposition —
    // the explainRrf disease, r21)
    val page =
      if (folded.sizeIs > 1 && !isMaterialized(cands)) cands.localCheckpoint()
      else cands
    val perField = folded.map { case (path, w, i, terms) =>
      contributions(spark, path, terms, allow = Some(page))
        .select(lit(i).as("field"), lit(w).as("weight"), col("doc_id"),
          col("term"), col("tf"), col("df"), col("len"), col("micros"))
    }
    perField.reduce(_.union(_))
      .orderBy(col("field"), col("doc_id"), col("term"))
  }

  def searchTopKLexical(spark: SparkSession, path: String,
                        queryTerms: Seq[String], k: Int = 10,
                        where: Option[Column] = None,
                        allow: Option[DataFrame] = None): DataFrame = {
    // query terms fold under the LAYOUT's analyzer (sidecar-read, so
    // index and query time provably agree) — `raw` is the identity;
    // rankAnalyzed normalizes (nonEmpty, distinct)
    rankAnalyzed(spark, path,
      foldQueryTerms(queryTerms, analyzerOf(spark, path)), k, where, allow)
  }

  /** Rank PRE-ANALYZED terms — the internal entry point for every
    * verb whose terms are already in the layout's indexed vocabulary
    * (the dictionary expansions of searchPrefix/searchWildcard/
    * searchGlob, moreLikeThis's mined terms, searchTopKPrf's folded
    * seed). [[foldQueryTerms]] must NOT run again on such terms: the
    * english analyzer is not idempotent — Porter re-stems stems
    * (corpus `agreed` indexes as `agre`, but stem("agre") == "agr")
    * and re-drops stems that collide with stopwords (`thens` indexes
    * as `then`) — so a second fold silently empties the match set.
    * Lucene's rewritten multi-term queries bypass the analysis chain
    * for exactly this reason. User query text enters through
    * [[searchTopKLexical]], which folds exactly once. */
  private[graft] def rankAnalyzed(spark: SparkSession, path: String,
                                  terms: Seq[String], k: Int,
                                  where: Option[Column] = None,
                                  allow: Option[DataFrame] = None): DataFrame = {
    val scored = scoreLexical(spark, path,
      terms.filter(_.nonEmpty).distinct, where, allow)
    scored.orderBy(col("lex_micros").desc, col("doc_id")).limit(k)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("lex_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"), col("lex_micros"))
  }

  /** Keyset pagination — Lucene's IndexSearcher.searchAfter: the
    * page AFTER a (score, doc_id) cursor in the total order
    * (lex_micros DESC, doc_id ASC), i.e. strictly
    * `micros < cursor.micros OR (micros = cursor.micros AND doc_id >
    * cursor.docId)`. Deep paging done right at scale: offset-k
    * pagination re-sorts and DISCARDS o rows per page (page 1000 of a
    * web index heap-sorts 10k rows per executor); the keyset
    * predicate filters BEFORE the top-k heap, so every page costs
    * exactly one k-row TakeOrdered over the pruned scan, independent
    * of page depth. Integer scores make the cursor exact — no
    * float-tie page tearing (the reason Lucene's FieldDoc cursor
    * carries the doc id too). Page rows are numbered 1..k within the
    * page (a global rank would require knowing the offset — the thing
    * keyset pagination exists to avoid). */
  def searchAfter(spark: SparkSession, path: String,
                  queryTerms: Seq[String], k: Int,
                  afterMicros: Long, afterDocId: Any): DataFrame = {
    val terms = foldQueryTerms(queryTerms, analyzerOf(spark, path))
      .filter(_.nonEmpty).distinct
    val scored = scoreLexical(spark, path, terms)
      .filter(col("lex_micros") < afterMicros ||
        (col("lex_micros") === afterMicros && col("doc_id") > lit(afterDocId)))
    scored.orderBy(col("lex_micros").desc, col("doc_id")).limit(k)
      .withColumn("page_rank", row_number().over(
        Window.orderBy(col("lex_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("page_rank"), col("lex_micros"))
  }

  /** Facet counts — Lucene faceting's contract over the MATCH SET
    * (not the top-k): for every value of a metadata facet, how many
    * docs match the query at all. `facets` is the forward metadata
    * (doc_id, facet) — the postings carry no metadata by design (the
    * V9 allowlist argument), so the match set's ids semi-join out of
    * the pruned scan and the facet column joins in by id: ids-only
    * exchanges until the final |facet-values|-row aggregate. The
    * match set is the BM25 OR (any query term) — the set the ranked
    * list is drawn from, which is what makes facet drill-down counts
    * consistent with the visible results. */
  def facetCounts(spark: SparkSession, path: String,
                  queryTerms: Seq[String], facets: DataFrame,
                  facetCol: String = "facet"): DataFrame = {
    val terms = foldQueryTerms(queryTerms, analyzerOf(spark, path))
      .filter(_.nonEmpty).distinct
    val matched = scoreLexical(spark, path, terms).select(col("doc_id"))
    // distinct AFTER the join, over the match-set-sized output (the
    // matched spine is already duplicate-free out of the groupBy):
    // duplicate (doc_id, facet) rows in the caller's metadata must not
    // double-count a document, but a corpus-sized pre-join dedupe
    // would pay a full shuffle for metadata that is usually already
    // clean. A doc with several DISTINCT facet values still counts
    // once per value — Lucene's multi-valued facet semantics.
    matched.join(
        facets.select(col("doc_id"), col(facetCol).as("facet")),
        Seq("doc_id"))
      .distinct()
      .groupBy(col("facet")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("facet"))
  }

  /** Multi-field weighted search — Lucene's MultiFieldQueryParser
    * with per-field boosts (the practical cousin of BM25F: BM25F
    * proper mixes tf ACROSS fields under one idf, which needs a
    * combined-field layout; the weighted SUM of per-field BM25 is
    * what Elasticsearch's `fields: ["title^2", "body"]` best_fields/
    * most_fields family actually computes, and it composes from the
    * per-field layouts already built). `fields` = (layout path,
    * weight in micros; 1e6 = neutral, 2e6 = counts double). Each
    * field scores UNRANKED over its own bucket-pruned read (its own
    * analyzer, its own stats — a short title field normalizes against
    * title lengths, exactly why the fields stay separate layouts); a
    * doc's fused score is Σ ⌊w_f·micros_f/1e6⌋ via the overflow-safe
    * split, missing fields contribute 0 (outer union — a title-only
    * hit still surfaces). Exchanges carry (doc_id, micros) pairs
    * only; the fan-in is |fields| k-free aggregates, never a corpus
    * join. */
  def searchTopKFields(spark: SparkSession,
                       fields: Seq[(String, Long)],
                       queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(fields.nonEmpty, "multi-field search needs at least one field")
    require(fields.forall(_._2 > 0), s"field weights must be positive")
    // a field whose analyzer folds the whole query away contributes 0
    // (it drops out of the union) — it must not fail the search while
    // another field can still match the raw form
    val perField = fields.flatMap { case (path, w) =>
      val terms = foldQueryTerms(queryTerms, analyzerOf(spark, path))
        .filter(_.nonEmpty).distinct
      if (terms.isEmpty) None
      else Some(scoreLexical(spark, path, terms)
        .select(col("doc_id"),
          expr(s"${w}L * (lex_micros div 1000000L) + " +
            s"(${w}L * (lex_micros % 1000000L)) div 1000000L").as("wm")))
    }
    require(perField.nonEmpty,
      s"query $queryTerms folds to nothing under every field's analyzer")
    val fused = perField.reduce(_.union(_))
      .groupBy(col("doc_id")).agg(sum(col("wm")).as("field_micros"))
    fused.orderBy(col("field_micros").desc, col("doc_id")).limit(k)
      .withColumn("field_rank", row_number().over(
        Window.orderBy(col("field_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("field_rank"), col("field_micros"))
  }

  /** Weight an expansion term carries in [[searchTopKPrf]]'s final
    * pass, in micros of an original term's weight (Rocchio's β/α).
    * The flat-λ (binary Rocchio) variant: mined weights SELECT the
    * expansion terms, the final query carries them all at this one
    * deterministic weight — the graded-interpolation variant (RM3)
    * needs a float normalization that would diverge across engines. */
  val PrfExpandMicros = 500000L

  /** Pseudo-relevance-feedback search (Rocchio 1971 SMART; the RM
    * family's query-expansion step): seed BM25 top-`fbDocs`, mine
    * `fbTerms` expansion terms from the feedback docs, re-search once
    * with original terms at 1e6 micros and expansion terms at
    * [[PrfExpandMicros]]. Expansion terms are scored by the SAME
    * quantized [[bm25Micros]] kernel summed over the feedback set
    * (tf·idf with length normalization — the Robertson term-selection
    * value, integer-exact here), ranked (weight DESC, term ASC), and
    * never include an original query term.
    *
    * `docs` is the FORWARD source the index was built from: an
    * inverted layout cannot enumerate a document's terms without a
    * full scan, so the feedback docs' term vectors come from
    * re-tokenizing exactly `fbDocs` rows of the id-keyed corpus (an
    * id-pruned scan — the cheap direction at 100 TB) with the same
    * [[graft.operators.Corpus.tokens]] kernel build() used; their
    * candidate terms' df comes from the bucket-pruned postings, so
    * both stages read |term buckets| directories, never the corpus.
    * Driver round-trips are metadata-bounded: fbDocs ids, the
    * feedback docs' distinct candidate terms, fbTerms weights — the
    * "query rows" convention.
    *
    * Weighted scoring is overflow-safe without DECIMAL: with w ≤ 1e6
    * and a contribution m ≤ 2.2e16 (see [[ScoreScale]]), w·m can pass
    * 2^63, so both engines compute the EXACT floor((w·m)/1e6) by the
    * split w·(m div 1e6) + (w·(m mod 1e6)) div 1e6 — each part ≤
    * 2.2e16, all non-negative, identical integer ops everywhere. */
  def searchTopKPrf(spark: SparkSession, path: String, docs: DataFrame,
                    queryTerms: Seq[String], k: Int = 10, fbDocs: Int = 5,
                    fbTerms: Int = 5, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val scored = scoreWeightedTerms(spark, path,
        prfWeights(spark, path, docs, queryTerms, fbDocs, fbTerms,
          idCol, textCol))
      .withColumnRenamed("micros", "prf_micros")
    scored.orderBy(col("prf_micros").desc, col("doc_id")).limit(k)
      .withColumn("prf_rank", row_number().over(
        Window.orderBy(col("prf_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("prf_rank"), col("prf_micros"))
  }

  /** The Rocchio rewrite itself — seed rank, feedback-doc mining,
    * term selection — returning the weighted term list the final
    * pass scores (originals at 1e6, expansions at
    * [[PrfExpandMicros]]). Deterministic for fixed inputs, and
    * factored so [[searchTopKPrf]] and [[explainPrf]] provably run
    * the SAME rewrite. */
  private def prfWeights(spark: SparkSession, path: String,
                         docs: DataFrame, queryTerms: Seq[String],
                         fbDocs: Int, fbTerms: Int, idCol: String,
                         textCol: String): Seq[(String, Long)] = {
    // the feedback docs re-tokenize under the layout's analyzer, so
    // mined candidate terms live in the same folded vocabulary the
    // postings index (searchTopKLexical folds the seed query itself)
    val analyzer = analyzerOf(spark, path)
    val qTerms = foldQueryTerms(queryTerms, analyzer)
      .filter(_.nonEmpty).distinct
    // qTerms are folded HERE (the weighted final pass needs them in
    // indexed form) — the seed search takes them pre-analyzed, not
    // through searchTopKLexical's second fold (see [[rankAnalyzed]])
    val seedIds = rankAnalyzed(spark, path, qTerms, fbDocs)
      .select(col("doc_id")).collect().map(_.get(0)).toSeq
    // ONE driver round-trip for the feedback docs' term freqs
    // (bounded: fbDocs docs' distinct terms — query-sized); lens and
    // the candidate set derive driver-side, which drops the r20
    // form's checkpoint job and candidate-collect job from the
    // rewrite's serial chain. len counts the WHOLE doc (query terms
    // included) — computed before the candidate exclusion.
    val fbRows = termFreqs(
        docs.filter(col(idCol).isInCollection(seedIds))
          .select(col(idCol).as("doc_id"), col(textCol).as("text")),
        analyzer)
      .collect()
    val lenOf: Map[Any, Long] = fbRows.groupBy(_.get(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).sum }
    val cands = fbRows.iterator.map(_.getString(1)).toSeq.distinct
      .filterNot(qTerms.contains)
    val (nDocs, sumLen) = statsLits(spark, path)
    val expansion: Seq[String] =
      if (cands.isEmpty) Seq.empty
      else {
        val dfTbl = Relations.parquet(spark, path)
          .filter(col("bucket").isin(
              cands.map(bucketOf).distinct.map(Integer.valueOf): _*) &&
            col("term").isin(cands: _*))
          .groupBy(col("term")).agg(max(col("df")).as("df"))
        // the same (doc, term, tf, len) row multiset the r20 join
        // chain produced, now a broadcast-sized local relation; the
        // per-row bm25 micros are integers, so the per-term sum is
        // reduction-order-free
        val fbLocal = spark.createDataFrame(
            fbRows.toSeq.collect {
              case r if !qTerms.contains(r.getString(1)) =>
                (r.getString(1), r.getLong(2), lenOf(r.get(0)))
            })
          .toDF("term", "tf", "len")
        fbLocal.join(dfTbl, "term")
          .select(col("term"),
            bm25Micros(col("tf"), col("df"), col("len"),
              nDocs, sumLen).as("m"))
          .groupBy(col("term")).agg(sum(col("m")).as("w"))
          .orderBy(col("w").desc, col("term")).limit(fbTerms)
          .collect().map(_.getString(0)).toSeq
      }
    qTerms.map((_, 1000000L)) ++ expansion.map((_, PrfExpandMicros))
  }

  /** [[explainScoreWeighted]] with [[searchTopKPrf]]'s own rewrite:
    * re-runs the SAME deterministic Rocchio expansion and decomposes
    * the weighted final pass over `cands` — expansion terms surface
    * as rows at [[PrfExpandMicros]] weight, originals at 1e6, so
    * "why did this off-query doc rank" reads directly. Per-doc
    * Σ weighted_micros equals prf_micros exactly (q228 gates it). */
  def explainPrf(spark: SparkSession, path: String, docs: DataFrame,
                 queryTerms: Seq[String], cands: DataFrame,
                 fbDocs: Int = 5, fbTerms: Int = 5,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    explainScoreWeighted(spark, path,
      prfWeights(spark, path, docs, queryTerms, fbDocs, fbTerms,
        idCol, textCol),
      cands)

  /** [[searchTopKPrf]]'s top-k page AND its [[explainPrf]]
    * decomposition from ONE Rocchio rewrite — the seam the q228 gate
    * composes: [[prfWeights]] is deterministic for fixed inputs, so
    * running its seed-rank / feedback-mining / selection round-trips
    * twice could only reproduce the identical weighted term list at
    * double cost. Returns exactly
    * `explainPrf(..., searchTopKPrf(...).select("doc_id"), ...)`. */
  private[graft] def explainPrfTopK(spark: SparkSession, path: String,
                                    docs: DataFrame,
                                    queryTerms: Seq[String], k: Int = 10,
                                    fbDocs: Int = 5, fbTerms: Int = 5,
                                    idCol: String = "doc_id",
                                    textCol: String = "text"): DataFrame = {
    val weighted = prfWeights(spark, path, docs, queryTerms, fbDocs,
      fbTerms, idCol, textCol)
    val scored = scoreWeightedTerms(spark, path, weighted)
      .withColumnRenamed("micros", "prf_micros")
    val page = scored.orderBy(col("prf_micros").desc, col("doc_id")).limit(k)
      .select(col("doc_id"))
    explainScoreWeighted(spark, path, weighted, page)
  }

  /** Build a POSITIONAL postings layout: one row per (doc, term) with
    * the sorted 0-based offsets of that term in the doc's compacted
    * token sequence (empty tokens dropped first, so offsets are
    * dense and both engines derive them identically). Same
    * term-bucket partitioning as [[build]] — phrase search prunes to
    * its terms' buckets exactly like scoring search does. Positions
    * are the Lucene-class addition the frequency layout cannot
    * express: tf says a doc HAS the words, positions say they are
    * ADJACENT. Kept as a sibling layout rather than a column on the
    * scoring postings so the q115 family's bytes and hashes are
    * untouched; a production deployment would fold both into one
    * layout. Row width is bounded by per-doc term frequency; the
    * build is one tokenize pass + one (doc, term) partial agg. */
  def buildPositional(spark: SparkSession, docs: DataFrame, path: String,
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      analyzer: String = AnalyzerRaw): Unit = {
    requireAnalyzer(analyzer)
    writePositional(spark,
      positionalRows(docs, idCol, textCol, analyzer), path, analyzer)
    clearTombstones(spark, path)
  }

  /** (doc_id, term, positions) of one document batch — build()'s
    * tokenize + offset aggregation, factored so upsert can run it on
    * the replacement docs alone. */
  private def positionalRows(docs: DataFrame, idCol: String,
                             textCol: String, analyzer: String): DataFrame = {
    // english: stopwords drop INSIDE the array lambda, so offsets are
    // dense over the surviving tokens (see [[AnalyzerEnglish]]'s
    // positional note), and the stem applies after the posexplode —
    // a stem never changes a token's position
    val keep =
      if (analyzer == AnalyzerEnglish)
        "filter(split(text, ' '), w -> length(w) > 0 AND NOT " +
          s"array_contains($stopArraySql, w))"
      else "filter(split(text, ' '), w -> length(w) > 0)"
    val exploded = docs.select(col(idCol).as("doc_id"),
        foldText(col(textCol), analyzer).as("text"))
      .select(col("doc_id"), posexplode(expr(keep)).as(Seq("pos", "term")))
    val analyzed =
      if (analyzer == AnalyzerEnglish)
        exploded.withColumn("term",
          graft.functions.PorterStem.porterStem(col("term")))
      else exploded
    analyzed.groupBy(col("doc_id"), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
  }

  /** Shared positional write path (the [[writePostings]] sibling):
    * already-materialized (doc_id, term, positions) rows land
    * bucket-partitioned with the analyzer sidecar rewritten after. */
  private def writePositional(spark: SparkSession, rows: DataFrame,
                              path: String, analyzer: String): Unit = {
    rows.withColumn("bucket", bucketCol(col("term")))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      // static even when a session-level conf says dynamic (the q83
      // stream sets it): a rebuild over a smaller corpus must not
      // leave phantom buckets from the previous build behind
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(path)
    writeAnalyzer(spark, path, analyzer)
  }

  /** Surviving (doc_id, term, positions) rows: current layout minus
    * tombstoned ids, materialized so the caller can overwrite the
    * layout they came from — [[survivorTf]] for the positional
    * sibling. */
  private def survivorPositional(spark: SparkSession,
                                 path: String): DataFrame = {
    val rows = Relations.parquet(spark, path)
      .select(col("doc_id"), col("term"), col("positions"))
    tombstones(spark, path).fold(rows)(t =>
      rows.join(t, Seq("doc_id"), "left_anti")).localCheckpoint()
  }

  /** Rewrite the positional layout from survivors and drop the
    * tombstones — the expungeDeletes [[compactLexical]] performs for
    * the scoring layout. Position rows carry no corpus-derived
    * statistics (no df/len), so this is a pure survivor rewrite; a
    * takedown on the phrase index no longer forces a full rebuild
    * (the r15 gap: compactLexical read `tf`, which positional rows
    * lack, and failed loudly). */
  def compactPositional(spark: SparkSession, path: String): Unit = {
    val analyzer = analyzerOf(spark, path)
    writePositional(spark, survivorPositional(spark, path), path, analyzer)
    clearTombstones(spark, path)
  }

  /** Upsert (id, text) documents into a positional layout: rows of
    * the upserted ids (and any tombstoned ids) drop, the new texts
    * tokenize in under the layout's analyzer, one rewrite — the
    * [[upsertLexical]] shape minus the stats re-aggregation. */
  def upsertPositional(spark: SparkSession, path: String, docs: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): Unit = {
    val analyzer = analyzerOf(spark, path)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // independent materializations, overlapped (the upsertLexical
    // argument)
    val Seq(newRows, survivorsAll) = awaitInOrder(Seq(
      () => positionalRows(base, "doc_id", "text", analyzer)
        .localCheckpoint(),
      () => survivorPositional(spark, path)))
    val survivors = survivorsAll
      .join(base.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    writePositional(spark, survivors.union(newRows), path, analyzer)
    clearTombstones(spark, path)
  }

  /** Exact phrase search over a [[buildPositional]] layout: a doc
    * matches where the phrase's terms occur at CONSECUTIVE offsets,
    * `phrase_tf` counts the occurrences, ranking is (phrase_tf DESC,
    * doc_id) — all integers. Each phrase slot reads only its term's
    * bucket directory; the m−1 doc_id equi-joins intersect candidate
    * sets that are bounded by the rarest term's document frequency
    * (AQE broadcast-sizes them at runtime), and the adjacency test is
    * a scan-side higher-order filter over the joined position arrays
    * — offsets never explode into rows. A repeated-word phrase
    * ("the the") works unchanged: both slots read the same rows and
    * the filter counts overlapping runs. */
  /** Slot indices in ascending document frequency of their term
    * (ties by phrase position) — Lucene's conjunction ordering: the
    * FIRST intersection should be the rarest-vs-next-rarest pair, so
    * every later join streams against a candidate set already bounded
    * by the rarest term's df. Without it, "of the zyzzyva" first
    * intersects the two corpus-wide terms — an n_docs-sized
    * intermediate carrying the position arrays (the widest columns in
    * the layout) that the rare third term then prunes to nothing.
    * Catalyst cannot fix this itself: the pruned reads carry no
    * per-term stats, and AQE sizes broadcast sides but never reorders
    * a left-deep equi-join chain. */
  private[graft] def slotOrderByDf(terms: Seq[String],
                                   df: Map[String, Long]): Seq[Int] =
    terms.indices.sortBy(i => (df.getOrElse(terms(i), 0L), i))

  /** The bucket-pruned, tombstone-masked positional read for a term
    * set, plus per-term df from those same rows — one tiny aggregate
    * (|terms| rows to the driver) that buys the rarest-first join
    * order in [[searchPhrase]]/[[searchSpanNear]]. */
  private def positionalSlots(spark: SparkSession, path: String,
                              terms: Seq[String])
      : (Seq[DataFrame], Map[String, Long]) = {
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(
          terms.distinct.map(bucketOf).distinct.map(Integer.valueOf): _*) &&
        col("term").isin(terms.distinct: _*))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
    // df per query term from the already-pruned read (positions stay
    // unread: column pruning keeps this ids-free and positions-free).
    // With <= 2 distinct terms the rarest-first ordering cannot change
    // the join tree (one equi-join, commutative; the adjacency/span
    // expressions reference slots by PHRASE position) — skip the
    // aggregate+collect job entirely (guide §2.6: it exists only to
    // order a >= 3-way intersection)
    val dfByTerm =
      if (terms.distinct.size <= 2) Map.empty[String, Long]
      else post.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val slots = terms.zipWithIndex.map { case (t, i) =>
      post.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    (slots, dfByTerm)
  }

  /** The exact-adjacency phrase count over slots p0..pm — ONE
    * definition for [[searchPhrase]] and [[phraseMatchSet]], so the
    * parsed-query phrase gate provably matches the ranked verb. */
  private def phraseTfExpr(n: Int): Column = {
    val adjacency = (1 until n)
      .map(i => s"array_contains(p$i, x + $i)").mkString(" AND ")
    expr(s"size(filter(p0, x -> $adjacency))")
  }

  /** The minimum ordered-span gap over slots p0..pm — ONE definition
    * for [[searchSpanNear]] and [[phraseMatchSet]] (see
    * searchSpanNear's Scaladoc for the greedy-chain argument). */
  private def spanGapExpr(n: Int): Column = {
    val chainEnd = (1 until n).foldLeft("x0") { (prev, i) =>
      s"array_min(filter(p$i, y$i -> y$i > $prev))"
    }
    expr(s"array_min(transform(p0, x0 -> $chainEnd - x0 - ${n - 1}))")
  }

  def searchPhrase(spark: SparkSession, path: String,
                   phrase: Seq[String], k: Int = 10): DataFrame = {
    val terms = foldQueryTerms(phrase.filter(_.nonEmpty),
      analyzerOf(spark, path))
    require(terms.size >= 2, "a phrase needs at least two terms")
    val (slots, dfByTerm) = positionalSlots(spark, path, terms)
    // rarest-first intersection; the adjacency filter references the
    // slots by PHRASE position (p0..pm), so join order is free
    val joined = slotOrderByDf(terms, dfByTerm).map(slots)
      .reduce((a, b) => a.join(b, "doc_id"))
    joined
      .select(col("doc_id"), phraseTfExpr(terms.size).as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
      .orderBy(col("phrase_tf").desc, col("doc_id")).limit(k)
      .withColumn("phrase_rank", row_number().over(
        Window.orderBy(col("phrase_tf").desc, col("doc_id"))))
      .select(col("doc_id"), col("phrase_rank"), col("phrase_tf"))
  }

  /** Pairwise proximity search — the NEAR/slop operator, the other
    * positional query [[buildPositional]] unlocks: docs where `a` and
    * `b` occur within `slop` tokens of each other IN ANY ORDER,
    * scored by the minimum absolute offset distance (1 = adjacent
    * somewhere, in either order). Same bucket-pruned read as
    * [[searchPhrase]]; the distance is a scan-side nested
    * higher-order fold over the two position arrays — O(tf_a · tf_b)
    * per doc on in-row arrays, no row explosion, nothing pairwise in
    * the corpus. Ranking (min_dist ASC, doc_id) is all integers. */
  def searchNear(spark: SparkSession, path: String, a0: String, b0: String,
                 slop: Int, k: Int = 10): DataFrame = {
    val analyzer = analyzerOf(spark, path)
    val (a, b) = (foldQueryTerms(Seq(a0), analyzer),
        foldQueryTerms(Seq(b0), analyzer)) match {
      case (Seq(x), Seq(y)) => (x, y)
      case (fa, fb) => sys.error(
        s"NEAR terms must fold to one token each, got $fa / $fb — " +
          "use searchSpanNear for multi-token proximity")
    }
    require(a.nonEmpty && b.nonEmpty && a != b,
      "NEAR takes two distinct non-empty terms")
    require(slop >= 1, s"slop must be >= 1, got $slop")
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(
          Seq(a, b).map(bucketOf).distinct.map(Integer.valueOf): _*) &&
        col("term").isin(a, b))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
    val pa = post.filter(col("term") === a)
      .select(col("doc_id"), col("positions").as("pa"))
    val pb = post.filter(col("term") === b)
      .select(col("doc_id"), col("positions").as("pb"))
    pa.join(pb, "doc_id")
      .select(col("doc_id"), expr(
        "array_min(transform(pa, x -> array_min(transform(pb, y -> abs(x - y)))))")
        .as("min_dist"))
      .filter(col("min_dist") <= slop)
      .orderBy(col("min_dist").asc, col("doc_id")).limit(k)
      .withColumn("near_rank", row_number().over(
        Window.orderBy(col("min_dist").asc, col("doc_id"))))
      .select(col("doc_id"), col("near_rank"), col("min_dist"))
  }

  /** ORDERED sloppy span search — Lucene SpanNearQuery's
    * inOrder=true mode, the m-term generalization [[searchPhrase]]
    * (slop 0, adjacency) and [[searchNear]] (2 terms, unordered)
    * between them could not express: a doc matches where the terms
    * occur IN QUERY ORDER at strictly increasing offsets p0 < p1 <
    * … < pm with at most `slop` extra positions inside the span —
    * gap = pm − p0 − (m−1) ≤ slop (gap 0 is the exact phrase,
    * modulo other terms never interleaving... they may: gap counts
    * ANY intervening tokens, Lucene's definition). Scored by the
    * doc's MINIMUM gap, ranked (gap ASC, doc_id) — all integers.
    *
    * The match test is a scan-side fold: for each anchor x0 in p0,
    * greedily take the EARLIEST next-term offset above the previous
    * one (`array_min(filter(p_i, y -> y > prev))`) — for a fixed
    * anchor the greedy chain minimizes pm (exchange argument), so
    * the min over anchors is the doc's true minimum gap, and a
    * missing link folds to NULL which `array_min` skips and the
    * slop filter drops. O(m · Σ|p_i|) per doc over in-row arrays —
    * no row explosion, nothing pairwise. Same bucket-pruned read
    * and rarest-first doc_id intersection as [[searchPhrase]]. */
  def searchSpanNear(spark: SparkSession, path: String,
                     span: Seq[String], slop: Int,
                     k: Int = 10): DataFrame = {
    val terms = foldQueryTerms(span.filter(_.nonEmpty),
      analyzerOf(spark, path))
    require(terms.size >= 2, "a span query needs at least two terms")
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val (slots, dfByTerm) = positionalSlots(spark, path, terms)
    val joined = slotOrderByDf(terms, dfByTerm).map(slots)
      .reduce((a, b) => a.join(b, "doc_id"))
    joined
      .select(col("doc_id"), spanGapExpr(terms.size).as("span_gap"))
      .filter(col("span_gap") <= slop)
      .orderBy(col("span_gap").asc, col("doc_id")).limit(k)
      .withColumn("span_rank", row_number().over(
        Window.orderBy(col("span_gap").asc, col("doc_id"))))
      .select(col("doc_id"), col("span_rank"), col("span_gap"))
  }

  /** Boolean query — Lucene's BooleanQuery shape over the scoring
    * layout: candidates must contain EVERY `must` term, no `mustNot`
    * term, and rank by summed [[bm25Micros]] over the must+should
    * terms (a should term matched adds score; a must term both gates
    * and scores — the standard semantics). One bucket-pruned read
    * serves all three clauses; the must gate is a (doc_id,
    * distinct-term-count) partial agg equal-to-|must| filter, the
    * mustNot gate an anti-join, both ids-only. Tombstoned docs never
    * surface, like every search verb on this layout. */
  def searchBoolean(spark: SparkSession, path: String,
                    must: Seq[String], should: Seq[String] = Seq.empty,
                    mustNot: Seq[String] = Seq.empty,
                    k: Int = 10, minShouldMatch: Int = 0): DataFrame = {
    val scored = booleanContributions(spark, path, must, should, mustNot,
        minShouldMatch)
      .groupBy(col("doc_id")).agg(sum(col("micros")).as("lex_micros"))
    scored.orderBy(col("lex_micros").desc, col("doc_id")).limit(k)
      .withColumn("bool_rank", row_number().over(
        Window.orderBy(col("lex_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("bool_rank"), col("lex_micros"))
  }

  /** The gated per-(doc, term) frame [[searchBoolean]] aggregates
    * and [[explainBoolean]] decomposes — one definition, the
    * [[contributions]] discipline applied to BooleanQuery: rows are
    * the SCORED clauses' (must + should) postings of documents that
    * pass all three gates (every must term, ≥ msm distinct should
    * terms, no excluded term), with the factors and [[bm25Micros]]
    * evaluated per row. `allow` narrows whose rows come back — each
    * doc's gates depend only on its OWN postings, so filtering the
    * pruned read early is equivalent and keeps the checkpoint
    * candidate-sized when explaining a page. */
  private def booleanContributions(spark: SparkSession, path: String,
                                   must: Seq[String], should: Seq[String],
                                   mustNot: Seq[String],
                                   minShouldMatch: Int,
                                   allow: Option[DataFrame] = None)
      : DataFrame = {
    val analyzer = analyzerOf(spark, path)
    def fold(ts: Seq[String]) =
      foldQueryTerms(ts.filter(_.nonEmpty), analyzer).distinct
    val mustT = fold(must)
    val shouldT = fold(should)
    val notT = fold(mustNot)
    // Lucene's minimum_should_match: candidates must additionally
    // match >= this many DISTINCT should terms — the knob between
    // pure-OR recall (0) and all-terms AND (|should|); counted on the
    // folded distinct set, like the must gate
    require(minShouldMatch >= 0 && minShouldMatch <= shouldT.size,
      s"minShouldMatch=$minShouldMatch outside [0, ${shouldT.size}] " +
        s"(folded should terms: $shouldT)")
    require(mustT.nonEmpty || shouldT.nonEmpty,
      "boolean search needs at least one must or should term")
    require(notT.intersect(mustT ++ shouldT).isEmpty,
      s"terms cannot be both required/scored and excluded: " +
        notT.intersect(mustT ++ shouldT).mkString(", "))
    val allTerms = (mustT ++ shouldT ++ notT).distinct
    val (nDocs, sumLen) = statsLits(spark, path)
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(
          allTerms.map(bucketOf).distinct.map(Integer.valueOf): _*) &&
        col("term").isin(allTerms: _*))
      .transform(p => allowFilter(p, allow))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
      .localCheckpoint() // one pruned read feeds all three clauses
    val gated0 = post.filter(col("term").isin((mustT ++ shouldT): _*))
    val gated1 =
      if (mustT.isEmpty) gated0
      else gated0.join(
        post.filter(col("term").isin(mustT: _*))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("term")).as("nmust"))
          .filter(col("nmust") === mustT.size)
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    val gated2 =
      if (minShouldMatch == 0) gated1
      else gated1.join(
        post.filter(col("term").isin(shouldT: _*))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("term")).as("nshould"))
          .filter(col("nshould") >= minShouldMatch)
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    val gated =
      if (notT.isEmpty) gated2
      else gated2.join(
        post.filter(col("term").isin(notT: _*)).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    gated
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("len"),
        bm25Micros(col("tf"), col("df"), col("len"),
          nDocs, sumLen).as("micros"))
  }

  /** [[explainScore]] for [[searchBoolean]]: the per-(doc, term)
    * decomposition of a boolean query's scores over the candidate
    * page `cands`. Rows exist only for the SCORED clauses (must +
    * should) of documents that pass every gate — the gates are
    * boolean admission, not score factors, which is exactly how
    * Lucene's Explanation reports a BooleanQuery (scoring clauses
    * only; a non-matching doc explains as no-match). Per-doc
    * Σ micros equals searchBoolean's lex_micros exactly
    * (LexicalSpec pins it; q226 gates the decomposition). */
  def explainBoolean(spark: SparkSession, path: String, cands: DataFrame,
                     must: Seq[String], should: Seq[String] = Seq.empty,
                     mustNot: Seq[String] = Seq.empty,
                     minShouldMatch: Int = 0): DataFrame =
    booleanContributions(spark, path, must, should, mustNot,
        minShouldMatch, Some(cands))
      .orderBy(col("doc_id"), col("term"))

  /** Prefix query — Lucene's PrefixQuery with its maxExpansions
    * guard: expand `prefix` against the `_vocab` term dictionary
    * (vocabulary-sized scan, the honest cost of a hash-bucketed
    * layout that CANNOT prune a prefix), keep the `maxExpansions`
    * highest-df matches (df DESC, term ASC — the rewrite cap that
    * stops `a%` from becoming a thousand-term query), then score the
    * expanded terms through [[searchTopKLexical]]'s bucket-pruned
    * path. The expansion round-trips the driver (bounded by
    * maxExpansions — the query-rows convention) because the final
    * search prunes buckets from literal terms. */
  /** True when `path` holds the SEGMENTED layout (its `_segstats`
    * sidecar is the discriminator — the layouts share no other
    * structure a probe could race on). */
  private def isSegmented(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_segstats")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The layout's term dictionary as (term, df) with GLOBAL df:
    * `_vocab` verbatim for the denormalized layout; for the
    * segmented layout, the per-segment `_segvocab` dictionaries with
    * df summed across segments (disjoint doc sets — the
    * [[searchTopKSegmented]] gdf argument, applied to the
    * dictionary). Vocabulary-sized either way, never corpus-sized. */
  private def termDictionary(spark: SparkSession, path: String): DataFrame =
    if (isSegmented(spark, path))
      Relations.parquet(spark, s"$path/_segvocab")
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
    else Relations.parquet(spark, s"$path/_vocab")

  /** Fold a dictionary probe (prefix/needle) to its single token —
    * the shared head of every dictionary-expansion verb. Multi-term
    * queries bypass the analysis chain (Lucene's PrefixQuery /
    * WildcardQuery contract, and [[searchGlob]]'s documented
    * behavior): on an `english` layout the probe only lowercases +
    * strips (the folded rule) — the dictionary holds stems and the
    * user's pattern matches them verbatim. Stemming the probe would
    * make `agre*` unfindable (stem("agre") == "agr") and error out
    * stopword-shaped prefixes like `the` that legitimately prefix
    * stems (`theori`). */
  private def foldProbe(spark: SparkSession, path: String, probe: String,
                        what: String): String = {
    require(probe.nonEmpty, s"$what must be non-empty")
    val rule = analyzerOf(spark, path) match {
      case AnalyzerEnglish => AnalyzerFolded
      case a => a
    }
    val folded = foldQueryTerms(Seq(probe), rule)
    require(folded.size == 1,
      s"$what must fold to one token, '$probe' folded to $folded")
    folded.head
  }

  /** Expand a dictionary match predicate to the `maxExpansions`
    * highest-df terms (df DESC, term ASC — the rewrite cap that stops
    * `a%` from becoming a thousand-term query) — the shared middle of
    * [[searchPrefix]]/[[searchWildcard]]. Bounded driver round-trip
    * (the query-rows convention); the downstream search prunes
    * buckets from the literal expansions. */
  private def expandDictionary(spark: SparkSession, path: String,
                               pred: Column, maxExpansions: Int,
                               noMatch: => String): Seq[String] = {
    require(maxExpansions >= 1, s"maxExpansions must be >= 1")
    val expanded = termDictionary(spark, path)
      .filter(pred)
      .orderBy(col("df").desc, col("term")).limit(maxExpansions)
      .select(col("term")).collect().map(_.getString(0)).toSeq
    require(expanded.nonEmpty, noMatch)
    expanded
  }

  /** Route expanded terms to the layout's own rank path. Dictionary
    * terms are ALREADY analyzed (they come out of `_vocab`), so they
    * enter through the pre-analyzed rankers — re-folding them through
    * the layout analyzer would re-stem stems on an `english` layout
    * (Porter is not idempotent) and silently match nothing; see
    * [[rankAnalyzed]]. */
  private def routeScore(spark: SparkSession, path: String,
                         terms: Seq[String], k: Int): DataFrame =
    if (isSegmented(spark, path))
      rankAnalyzedSegmented(spark, path, terms, k)
    else rankAnalyzed(spark, path, terms, k)

  def searchPrefix(spark: SparkSession, path: String, prefix: String,
                   k: Int = 10, maxExpansions: Int = 16): DataFrame = {
    // the prefix folds like any query text (an analyzed layout's
    // dictionary is all-lowercase, so 'St' must expand as 'st')
    val p = foldProbe(spark, path, prefix, "prefix")
    val expanded = expandDictionary(spark, path,
      col("term").startsWith(p), maxExpansions,
      s"no indexed term starts with '$p' — nothing to search")
    routeScore(spark, path, expanded, k)
  }

  /** The term-range dictionary expansion shared by [[searchTermRange]]
    * and [[searchParsed]]'s `[lo TO hi]` clauses — ONE definition so
    * the parsed form provably expands like the standalone verb: fold
    * both bounds under the probe rule (the dictionary holds analyzed
    * tokens, so 'Merge' bounds as 'merge'; stems stay verbatim —
    * the [[foldProbe]] contract), fail loudly on an inverted range,
    * then walk the dictionary BETWEEN the bounds with the df-ranked
    * `maxExpansions` cap every dictionary atom carries. */
  private def expandTermRange(spark: SparkSession, path: String,
                              lo0: String, hi0: String,
                              inclLo: Boolean, inclHi: Boolean,
                              maxExpansions: Int): Seq[String] = {
    val lo = foldProbe(spark, path, lo0, "range lower bound")
    val hi = foldProbe(spark, path, hi0, "range upper bound")
    require(lo <= hi,
      s"empty term range: folded lower bound '$lo' sorts after upper " +
        s"bound '$hi'")
    val pred =
      (if (inclLo) col("term") >= lo else col("term") > lo) &&
        (if (inclHi) col("term") <= hi else col("term") < hi)
    def b(o: Boolean, c: String, s: String) = if (o) c else s
    expandDictionary(spark, path, pred, maxExpansions,
      s"no indexed term in range ${b(inclLo, "[", "{")}$lo TO $hi" +
        s"${b(inclHi, "]", "}")} — nothing to search")
  }

  /** Term range query — Lucene's TermRangeQuery with its
    * maxExpansions guard (reference: chromadb has no term
    * dictionary at all; Lucene's `[lo TO hi]` is the public
    * contract): expand the dictionary scan between the folded
    * bounds ([[expandTermRange]] — square/curly = inclusive/
    * exclusive per side), keep the `maxExpansions` highest-df
    * matches (df DESC, term ASC — the same rewrite cap the prefix/
    * wildcard family carries), then score the expansions through
    * the layout's own bucket-pruned rank path. Serves both layout
    * families through [[routeScore]] (the dictionary is `_vocab` or
    * the merged `_segvocab`). The vocabulary-sized dictionary walk
    * is the honest cost of a hash-bucketed layout that cannot prune
    * a lexicographic range; the search itself prunes buckets from
    * the literal expansions. */
  def searchTermRange(spark: SparkSession, path: String,
                      lo: String, hi: String,
                      inclLo: Boolean = true, inclHi: Boolean = true,
                      k: Int = 10, maxExpansions: Int = 16): DataFrame =
    routeScore(spark, path,
      expandTermRange(spark, path, lo, hi, inclLo, inclHi, maxExpansions), k)

  /** Best snippet window per candidate doc — the highlighter half of
    * search-result presentation (Lucene's FastVectorHighlighter runs
    * on exactly this: term positions + a fragment size): for each doc
    * in `cands` (a 1-column doc_id frame, typically the ranked
    * top-k), find the `w`-token window covering the most DISTINCT
    * query terms; ties break to the EARLIEST window. An optimal
    * window can always start at a term occurrence, so anchors are the
    * occurrence positions themselves, and the (count, start) argmax
    * is a scan-side fold over in-row arrays — O(m·occ²) per doc on
    * query-term occurrences only, no row explosion. Reads the
    * positional layout pruned to the query terms' buckets, semi-joins
    * the candidate spine (broadcast-sized by construction), and never
    * touches the corpus text — the caller renders the winning
    * [start, start+w) slice from its forward table. Returns
    * (doc_id, win_start, n_terms). */
  def snippetBest(spark: SparkSession, path: String,
                  queryTerms: Seq[String], cands: DataFrame,
                  w: Int): DataFrame = {
    val terms = foldQueryTerms(queryTerms.filter(_.nonEmpty),
      analyzerOf(spark, path)).distinct
    require(terms.nonEmpty, "snippets need at least one query term")
    require(w >= 1, s"window must be >= 1 token, got $w")
    // page-sized checkpoint: `cands` feeds both the postings gate and
    // the result spine, and a lazy search page handed in as cands
    // would re-execute once per reference (the explainRrf disease,
    // r21). Skipped when the page is ALREADY materialized (a local
    // literal or a checkpointed frame) — re-checkpointing those pays
    // a blocking job and parks another block set until RDD GC (r22,
    // ADVICE item).
    val spine0 = cands.select(col("doc_id"))
    val page =
      if (isMaterialized(cands)) spine0 else spine0.localCheckpoint()
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(
          terms.map(bucketOf).distinct.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .join(broadcast(page), Seq("doc_id"), "left_semi")
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
    val spine = page
    val slotted = terms.zipWithIndex.foldLeft(spine) { case (acc, (t, i)) =>
      acc.join(post.filter(col("term") === t)
          .select(col("doc_id"), col("positions").as(s"p$i")),
        Seq("doc_id"), "left_outer")
        .withColumn(s"p$i",
          coalesce(col(s"p$i"), expr("CAST(array() AS ARRAY<INT>)")))
    }
    val slots = terms.indices.map(i => s"p$i")
    val anchors = s"array_sort(concat(${slots.mkString(", ")}))"
    def score(p: String) = slots.map(s =>
      s"IF(exists($s, t -> t >= $p AND t < $p + $w), 1, 0)").mkString(" + ")
    // score each anchor ONCE, then argmax; anchors ascend and the
    // strict > keeps the first (earliest) maximum
    val best = s"""aggregate(
      transform($anchors, p -> named_struct('n', ${score("p")}, 'p', p)),
      named_struct('n', 0, 'p', -1),
      (acc, x) -> IF(x.n > acc.n, x, acc))"""
    slotted.select(col("doc_id"), expr(best).as("best"))
      .filter(col("best.n") > 0)
      .select(col("doc_id"), col("best.p").as("win_start"),
        col("best.n").as("n_terms"))
  }

  /** Did-you-mean — term suggestion against the `_vocab` dictionary
    * (Lucene's DirectSpellChecker contract): candidates within
    * `maxDist` Levenshtein edits of `term`, ranked (distance ASC,
    * df DESC, term ASC) so the closest, most-attested correction
    * wins deterministically. Levenshtein is an exact integer in any
    * engine — nothing here can drift. The scan is vocabulary-sized
    * (Zipf-bounded, orders of magnitude under the corpus); at a
    * billion-term dictionary the scale path is
    * [[buildSymSpell]]/[[suggestTermsIndexed]] — built since r16 and
    * pinned byte-identical to this scan (q217) — which changes the
    * candidate read, not these semantics. An exact dictionary hit
    * still reports at distance 0, so the caller can tell "correctly
    * spelled" from "unknown word". */
  def suggestTerms(spark: SparkSession, path: String, term0: String,
                   maxDist: Int = 2, k: Int = 5): DataFrame = {
    require(maxDist >= 0 && k >= 1, s"bad maxDist=$maxDist / k=$k")
    val term = foldSuggestProbe(spark, path, term0)
    rankTail(editCandidates(spark, path, term, maxDist, k))
  }

  /** Weighted multi-term scoring shared by [[searchTopKPrf]],
    * [[searchFuzzy]] and every verb that rewrites to a
    * term-with-weight OR (Lucene's rewritten BooleanQuery): one
    * bucket-pruned, tombstone-masked read of the weighted terms'
    * postings, each contribution scaled by its term's weight in
    * micros via the overflow-safe split
    * `w·(m div 1e6) + (w·(m mod 1e6)) div 1e6` (see
    * [[searchTopKPrf]]'s Scaladoc for the 2^63 headroom argument),
    * summed per doc. Returns (doc_id, micros) unranked — callers
    * rank under their own column names. */
  private def scoreWeightedTerms(spark: SparkSession, path: String,
                                 weighted: Seq[(String, Long)]): DataFrame =
    contributionsWeighted(spark, path, weighted)
      .select(col("doc_id"), col("wm"))
      .groupBy(col("doc_id")).agg(sum(col("wm")).as("micros"))

  /** The per-(doc, term) frame the weighted-OR scorer aggregates and
    * [[explainScoreWeighted]] decomposes ([[contributions]]' weighted
    * sibling — one definition, so the explanation is the score's own
    * code path): bucket-pruned, tombstone-masked posting rows with
    * the weight table and 1-row stats broadcast in, the raw
    * contribution `m` evaluated, and the weighted contribution `wm`
    * computed by the scorer's own overflow-safe split — which, unlike
    * the multi-field fusion's, applies PER POSTING ROW before the doc
    * sum, so the weighted explain is distributive and sum-exact. */
  private def contributionsWeighted(spark: SparkSession, path: String,
                                    weighted: Seq[(String, Long)],
                                    allow: Option[DataFrame] = None)
      : DataFrame = {
    val (nDocs, sumLen) = statsLits(spark, path)
    val terms = weighted.map(_._1)
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(
          terms.map(bucketOf).distinct.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .transform(p => allowFilter(p, allow))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
    val wdf = spark.createDataFrame(weighted).toDF("term", "w")
    post.join(broadcast(wdf), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("len"), col("w"),
        bm25Micros(col("tf"), col("df"), col("len"),
          nDocs, sumLen).as("m"))
      .withColumn("wm",
        expr("w * (m div 1000000L) + (w * (m % 1000000L)) div 1000000L"))
  }

  /** [[explainScore]] for the weighted-OR family — every verb that
    * rewrites to a term-with-weight OR ([[searchFuzzy]]/
    * [[searchFuzzyIndexed]], [[searchTopKPrf]]'s final pass): the
    * per-(doc, term) decomposition of a weighted query's scores over
    * the candidate page `cands`, each row carrying the factors (tf,
    * df, len), the term's weight (micros of a full term), the raw
    * contribution `micros`, and the weighted contribution
    * `weighted_micros` — the scorer's own per-row split, so per-doc
    * Σ weighted_micros equals the verb's score to the last digit
    * (LexicalSpec pins it; q225 gates the fuzzy form). Callers pass
    * the SAME weighted term list the verb used — [[explainFuzzy]]
    * re-derives fuzzy's deterministically. */
  def explainScoreWeighted(spark: SparkSession, path: String,
                           weighted: Seq[(String, Long)],
                           cands: DataFrame): DataFrame = {
    require(weighted.nonEmpty, "weighted explain needs at least one term")
    contributionsWeighted(spark, path, weighted, Some(cands))
      .select(col("doc_id"), col("term"), col("w").as("weight"),
        col("tf"), col("df"), col("len"), col("m").as("micros"),
        col("wm").as("weighted_micros"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** [[explainScoreWeighted]] with [[searchFuzzy]]'s own expansion:
    * re-runs the SAME deterministic rewrite (dictionary walk →
    * (dist ASC, df DESC, term) cap → integer similarity weights) and
    * decomposes the weighted OR over `cands` — "why did doc X match
    * my misspelling" as one call. Same preconditions as the verb. */
  def explainFuzzy(spark: SparkSession, path: String, term0: String,
                   cands: DataFrame, maxDist: Int = 2,
                   maxExpansions: Int = 16): DataFrame = {
    require(maxDist >= 1 && maxExpansions >= 1,
      s"bad maxDist=$maxDist / maxExpansions=$maxExpansions")
    require(!isSegmented(spark, path),
      s"explainFuzzy needs the denormalized layout's _stats — " +
        s"compactSegments($path) first")
    val term = foldProbe(spark, path, term0, "fuzzy probe")
    explainScoreWeighted(spark, path,
      fuzzyWeights(
        editCandidates(spark, path, term, maxDist, maxExpansions),
        term, maxDist),
      cands)
  }

  // ---- SymSpell deletion-neighborhood index ---------------------------
  //
  // The billion-term scale path the dictionary verbs' Scaladocs have
  // been NAMING since r15, now built: suggest/fuzzy scan the whole
  // `_vocab` per call (Zipf-bounded, fine at fixture scale; a web
  // corpus's dictionary is 1e8-1e9 terms and a full scan per
  // keystroke is not a product). SymSpell (Garbe's symmetric-delete
  // algorithm, public domain): precompute every ≤maxDist-DELETION
  // variant of every dictionary term; at query time generate the
  // probe's own ≤maxDist deletion variants (≤ 1+L+L² strings, driver-
  // bounded) and join — the standard result that lev(a,b) ≤ d implies
  // a common string reachable by ≤d deletions from each side makes
  // the collision set a SUPERSET of the true candidates, and the
  // exact levenshtein verify on that tiny set makes the answer equal
  // the full scan's (q217's oracle IS the scan — hash-equality is the
  // proof). Layout: path/_symspell/vbucket=<b>/(variant, term, df),
  // vbucket = pmod(xxhash64(variant), NumBuckets) — the probe's
  // variant set prunes directories exactly like query terms prune
  // postings (at production bucket counts, ~500 variants open ≤500 of
  // 4096 dirs; the variant IN-list prunes row groups regardless).
  // The EMPTY-STRING variant is load-bearing: 'a'→{'a',''} and
  // 'b'→{'b',''} collide only on '' — dropping it would lose true
  // distance-1 matches between short terms.

  /** ≤`maxDist` deletion variants of `c` (the string itself
    * included), as a SQL array expression — ONE definition evaluated
    * by both the build plan and the query side (which runs it
    * through a 1-row plan, the bucketOf parity discipline: JVM
    * string ops on surrogate pairs need not match Spark's). */
  private def deletionVariantsSql(c: String, maxDist: Int): String = {
    // loud, not silent: a maxDist-3 caller getting <=2-deletion
    // variants would quietly break the superset guarantee
    require(maxDist >= 1 && maxDist <= 2,
      s"symspell supports maxDist 1..2, got $maxDist")
    val v1 = s"transform(sequence(1, length($c)), i -> " +
      s"concat(substring($c, 1, i - 1), substring($c, i + 1, length($c))))"
    if (maxDist == 1) s"array_distinct(concat(array($c), $v1))"
    else {
      val v2 = s"flatten(transform($v1, w -> " +
        "transform(sequence(1, length(w)), j -> " +
        "concat(substring(w, 1, j - 1), substring(w, j + 1, length(w))))))"
      s"array_distinct(concat(array($c), $v1, $v2))"
    }
  }

  // built-maxDist memo, invalidated by every rebuild — the analyzer
  // cache's shape (warm suggestions must not stat+read the meta file
  // per keystroke), including its generation-stamped entries: a
  // straddling read publishes a dead-on-arrival stamp, never a
  // permanently poisoned value.
  private val symspellCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Long, Int)]
  private val symspellGen = scala.collection.concurrent.TrieMap
    .empty[String, Long]

  private def dropSymspellMemos(path: String): Unit = {
    symspellGen.updateWith(path)(g => Some(g.getOrElse(0L) + 1L))
    symspellCache.keys.filter(_._2 == path).foreach(symspellCache.remove)
  }

  /** Invalidate `path`'s `_symspell` sidecar AND its memos — called
    * by every write that changes the term dictionary the index
    * mirrors (build/compact/upsert/append/merge). Memos drop first
    * (an in-flight meta read must not publish a live stamp), then
    * meta, then the index — the meta-present-implies-index-present
    * invariant holds through any crash point, so the indexed verbs
    * fail with the named "buildSymSpell first" message, never an
    * obscure missing-path read and never a stale dictionary. */
  private def invalidateSymSpell(spark: SparkSession, path: String): Unit = {
    dropSymspellMemos(path)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(s"$path/_symspellmeta", s"$path/_symspell").foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** The built maxDist of `path`'s `_symspell` index, or a loud
    * error naming [[buildSymSpell]] when there is none (including
    * the half-built crash state: the meta sidecar is deleted FIRST
    * on rebuild, so meta-present always implies index-present). */
  private def symspellDist(spark: SparkSession, path: String): Int = {
    val key = (IndexStore.sessionKey(spark), path)
    val g0 = symspellGen.getOrElse(path, 0L)
    symspellCache.get(key) match {
      case Some((g, d)) if g == g0 => d
      case _ =>
        val metaP = new org.apache.hadoop.fs.Path(s"$path/_symspellmeta")
        val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(metaP),
          s"no _symspell index at $path — buildSymSpell first")
        val d = Relations.parquet(spark, s"$path/_symspellmeta").head().getInt(0)
        // stamped with the generation observed BEFORE the read — a
        // rebuild landing mid-read self-invalidates this entry; the
        // conditional publish keeps a straggler from clobbering a
        // fresher entry (analyzerOf's avoidable-re-read argument)
        symspellCache.updateWith(key) {
          case fresher @ Some((g, _)) if g > g0 => fresher
          case _ => Some((g0, d))
        }
        if (symspellGen.getOrElse(path, 0L) == g0) d
        else symspellDist(spark, path) // a rebuild landed mid-read: retry
    }
  }

  /** Build the `_symspell` sidecar over the layout's term dictionary.
    * One dictionary pass: explode each term's deletion neighborhood,
    * hash-partition by variant. Rebuild after compact/upsert changes
    * the vocabulary (it derives from [[termDictionary]], so it serves
    * both layout families). */
  def buildSymSpell(spark: SparkSession, path: String,
                    maxDist: Int = 2): Unit = {
    import spark.implicits._
    // meta deleted FIRST (inside invalidateSymSpell): a rebuild that
    // dies between clearing the index and rewriting it leaves NO
    // meta, so the query side fails with the named buildSymSpell-
    // first message, never an obscure missing-path read of a
    // half-built index
    invalidateSymSpell(spark, path)
    termDictionary(spark, path)
      .select(col("term"), col("df"),
        explode(expr(deletionVariantsSql("term", maxDist))).as("variant"))
      .withColumn("vbucket", bucketCol(col("variant")))
      .repartition(NumBuckets, col("vbucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("vbucket")
      .parquet(s"$path/_symspell")
    Seq(maxDist).toDF("max_dist").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_symspellmeta")
    dropSymspellMemos(path)
    symspellCache((IndexStore.sessionKey(spark), path)) =
      (symspellGen.getOrElse(path, 0L), maxDist)
  }

  /** [[suggestTerms]] answered from the `_symspell` index instead of
    * a dictionary scan: generate the probe's deletion variants
    * plan-side (parity with the build), read ONLY their vbucket
    * directories with the variant IN-list pushed down, then the same
    * exact-levenshtein verify and (dist, df DESC, term) ranking —
    * byte-identical output to the scan path (q217 pins it by hash
    * against the scan oracle). */
  def suggestTermsIndexed(spark: SparkSession, path: String,
                          term0: String, maxDist: Int = 2,
                          k: Int = 5): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2 && k >= 1,
      s"bad maxDist=$maxDist / k=$k (symspell serves maxDist 1..2; " +
        "use suggestTerms for exact lookup)")
    val builtDist = symspellDist(spark, path)
    require(maxDist <= builtDist,
      s"index built for maxDist $builtDist, queried with $maxDist")
    val term = foldSuggestProbe(spark, path, term0)
    rankTail(distRanked(symspellCollisions(spark, path, term, maxDist),
      term, maxDist, k))
  }

  /** The symmetric-delete candidate read: the probe's deletion
    * variants (generated plan-side — build parity) prune the
    * `_symspell` read to their vbucket directories with the variant
    * IN-list pushed down; returns the distinct colliding (term, df)
    * set — a SUPERSET of every true ≤maxDist match, which the shared
    * [[distRanked]] verify then makes exact. */
  private def symspellCollisions(spark: SparkSession, path: String,
                                 term: String, maxDist: Int): DataFrame = {
    import spark.implicits._
    val probes = Seq(term).toDF("t")
      .select(explode(expr(deletionVariantsSql("t", maxDist))).as("v"))
      .collect().map(_.getString(0)).toSeq.distinct
    val buckets = probes.map(bucketOf).distinct
    Relations.parquet(spark, s"$path/_symspell")
      .filter(col("vbucket").isin(buckets.map(Integer.valueOf): _*) &&
        col("variant").isin(probes: _*))
      .select(col("term"), col("df")).distinct()
  }

  /** Fold a SUGGESTION probe to its single searched token — one
    * definition for the scan and indexed suggest paths (pinned
    * byte-identical, so their input validation must be too). A
    * did-you-mean corrects the ANALYZED token, so this folds the
    * full chain incl. the stem (an inflected probe exact-matches at
    * distance 0 — the r17-pinned semantic); the FUZZY verbs instead
    * take the multi-term bypass via [[foldProbe]]. A multi-token
    * fold keeps the first token: the caller is correcting ONE
    * word. */
  private def foldSuggestProbe(spark: SparkSession, path: String,
                               term0: String): String = {
    require(term0.nonEmpty, "suggest needs a non-empty term")
    foldQueryTerms(Seq(term0), analyzerOf(spark, path))
      .headOption.getOrElse(
        sys.error(s"'$term0' folds to nothing under this layout's analyzer"))
  }

  /** (term, df) candidates → distance-verified, (dist ASC, df DESC,
    * term ASC)-ranked, capped (term, df, dist) — the shared ranking
    * of every edit-distance verb; the indexed path feeding its
    * collision set here is what makes it provably byte-identical to
    * the scan. */
  private def distRanked(cands: DataFrame, term: String, maxDist: Int,
                         limit: Int): DataFrame =
    cands
      .select(col("term"), col("df"),
        levenshtein(col("term"), lit(term)).as("dist"))
      .filter(col("dist") <= maxDist)
      .orderBy(col("dist").asc, col("df").desc, col("term")).limit(limit)

  /** The suggestion output shape over an already-ranked candidate
    * frame. */
  private def rankTail(ranked: DataFrame): DataFrame =
    ranked.withColumn("sugg_rank", row_number().over(
        Window.orderBy(col("dist").asc, col("df").desc, col("term"))))
      .select(col("sugg_rank"), col("term"), col("dist"), col("df"))

  /** Dictionary candidates within `maxDist` edits of `term`, ranked
    * (distance ASC, df DESC, term ASC) and capped — the shared middle
    * of [[suggestTerms]] and [[searchFuzzy]]'s rewrite. */
  private def editCandidates(spark: SparkSession, path: String,
                             term: String, maxDist: Int,
                             limit: Int): DataFrame =
    distRanked(termDictionary(spark, path), term, maxDist, limit)

  /** Fuzzy search — Lucene's FuzzyQuery with its rewrite made
    * explicit and deterministic: expand `term` against the term
    * dictionary to the `maxExpansions` best candidates within
    * `maxDist` Levenshtein edits (distance ASC, df DESC, term ASC —
    * the [[suggestTerms]] ranking), weight each expansion by the
    * integer-exact similarity `⌊1e6·(maxDist+1−dist)/(maxDist+1)⌋`
    * (an exact term scores full weight, a 2-edit cousin a third at
    * maxDist 2 — Lucene boosts by `1−dist/len`, a float; this is the
    * quantized, engine-independent stand-in), and score the weighted
    * OR through one bucket-pruned read. The dictionary scan is
    * vocabulary-sized (the [[suggestTerms]] SymSpell note applies);
    * the driver round-trip is maxExpansions rows. Denormalized
    * layouts only: the weighted scorer reads `_stats`, so a segmented
    * store fails fast with a compact-first message instead of an
    * obscure missing-path error after the dictionary walk. */
  def searchFuzzy(spark: SparkSession, path: String, term0: String,
                  maxDist: Int = 2, k: Int = 10,
                  maxExpansions: Int = 16): DataFrame = {
    require(maxDist >= 1 && k >= 1 && maxExpansions >= 1,
      s"bad maxDist=$maxDist / k=$k / maxExpansions=$maxExpansions")
    // fail BEFORE the dictionary walk, not in an unrelated-looking
    // _stats read after it: the weighted scorer is denormalized-only
    require(!isSegmented(spark, path),
      s"searchFuzzy needs the denormalized layout's _stats — " +
        s"compactSegments($path) first")
    // fuzzy is a rewritten MULTI-TERM query (Lucene FuzzyQuery
    // bypasses the analysis chain like Prefix/Wildcard/Regexp): the
    // probe folds lowercase-only on an `english` layout, so a probe
    // that IS a dictionary stem ('agre') matches at distance 0 at
    // full weight instead of being re-stemmed to 'agr'. The SUGGEST
    // family deliberately keeps the full fold ([[foldSuggestProbe]]
    // — a did-you-mean corrects the analyzed token, r17-pinned).
    // Like its siblings' probes (and Lucene's single-Term
    // FuzzyQuery), a probe that folds to SEVERAL tokens on an
    // analyzed layout ('data-driven') fails loudly here — suggest's
    // keep-first-token rule is a correction-UI convenience this
    // search verb does not inherit.
    val term = foldProbe(spark, path, term0, "fuzzy probe")
    fuzzyRank(spark, path,
      editCandidates(spark, path, term, maxDist, maxExpansions),
      term, maxDist, k)
  }

  /** Ranked+capped (term, dist) candidates → the fuzzy rewrite's
    * integer similarity weights `⌊1e6·(maxDist+1−dist)/(maxDist+1)⌋`
    * — factored so [[fuzzyRank]] and [[explainFuzzy]] provably weight
    * identically; the candidate collect is the maxExpansions-bounded
    * query-rows convention, and the empty case fails by name here. */
  private def fuzzyWeights(ranked: DataFrame, term: String,
                           maxDist: Int): Seq[(String, Long)] = {
    val cands = ranked.select(col("term"), col("dist"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toSeq
    require(cands.nonEmpty,
      s"no indexed term within $maxDist edits of '$term'")
    cands.map { case (t, dist) =>
      t -> (1000000L * (maxDist + 1 - dist)) / (maxDist + 1)
    }
  }

  /** The fuzzy rewrite's shared back half: ranked+capped (term, dist)
    * candidates → similarity weights → weighted-OR scoring → ranked
    * page. One definition for the scan ([[searchFuzzy]]) and indexed
    * ([[searchFuzzyIndexed]]) paths — they are pinned byte-identical
    * (q218's oracle is q209's), so their scoring must be one code
    * path. */
  private def fuzzyRank(spark: SparkSession, path: String,
                        ranked: DataFrame, term: String, maxDist: Int,
                        k: Int): DataFrame = {
    val scored = scoreWeightedTerms(spark, path,
      fuzzyWeights(ranked, term, maxDist))
      .withColumnRenamed("micros", "fuzzy_micros")
    scored.orderBy(col("fuzzy_micros").desc, col("doc_id")).limit(k)
      .withColumn("fuzzy_rank", row_number().over(
        Window.orderBy(col("fuzzy_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("fuzzy_rank"), col("fuzzy_micros"))
  }

  /** [[searchFuzzy]] answered from the `_symspell` index: the
    * probe's deletion variants prune the collision read (the
    * [[suggestTermsIndexed]] candidate path), then the SAME
    * distance-ranked cap, similarity weights and weighted-OR scoring
    * — the per-keystroke fuzzy query at a billion-term dictionary,
    * byte-identical to the scan rewrite by construction (q218 pins
    * it against q209's oracle). */
  def searchFuzzyIndexed(spark: SparkSession, path: String, term0: String,
                         maxDist: Int = 2, k: Int = 10,
                         maxExpansions: Int = 16): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2 && k >= 1 && maxExpansions >= 1,
      s"bad maxDist=$maxDist / k=$k / maxExpansions=$maxExpansions")
    require(!isSegmented(spark, path),
      s"searchFuzzyIndexed needs the denormalized layout's _stats — " +
        s"compactSegments($path) first")
    val builtDist = symspellDist(spark, path)
    require(maxDist <= builtDist,
      s"index built for maxDist $builtDist, queried with $maxDist")
    // same multi-term analysis-chain bypass as [[searchFuzzy]] — the
    // two paths are pinned byte-identical, so they must fold alike
    val term = foldProbe(spark, path, term0, "fuzzy probe")
    fuzzyRank(spark, path,
      distRanked(symspellCollisions(spark, path, term, maxDist),
        term, maxDist, maxExpansions),
      term, maxDist, k)
  }

  /** Multi-token did-you-mean — the per-position generalization of
    * [[suggestTermsIndexed]] (Lucene's PhraseSuggester contract: a
    * two-word query with a typo in word two gets a whole-query
    * correction, which single-term suggest cannot express): each
    * query position expands independently against the `_symspell`
    * deletion index (symmetric-delete collisions → exact levenshtein
    * verify → the q203 (dist ASC, df DESC, term ASC) rank, capped at
    * `perSlot`), then the corrected QUERY is the joint re-rank of
    * the per-slot candidate cross by CORPUS SUPPORT — total df DESC,
    * ties by total edit distance ASC then phrase ASC — so the
    * correction the corpus attests most wins deterministically.
    *
    * Scale shape: per-slot candidate reads are vbucket-pruned with
    * the variant IN-list pushed down (the q217 path, once per slot);
    * each slot round-trips ≤`perSlot` rows to the driver (the
    * fuzzyRank query-rows convention) and the joint cross is
    * driver-local — ≤perSlot^m rows for an m-token query,
    * query-sized, never corpus-sized. A slot with no candidate
    * within `maxDist` fails loudly naming the token (a silent
    * keep-the-typo would un-correct the query while still reporting
    * corrections). */
  def suggestPhrase(spark: SparkSession, path: String, phrase: Seq[String],
                    maxDist: Int = 2, perSlot: Int = 4,
                    k: Int = 5): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2 && perSlot >= 1 && k >= 1,
      s"bad maxDist=$maxDist / perSlot=$perSlot / k=$k " +
        "(symspell serves maxDist 1..2)")
    val builtDist = symspellDist(spark, path)
    require(maxDist <= builtDist,
      s"index built for maxDist $builtDist, queried with $maxDist")
    val terms = foldQueryTerms(phrase.filter(_.nonEmpty),
      analyzerOf(spark, path))
    require(terms.size >= 2,
      s"a phrase suggestion needs at least two tokens, got $terms — " +
        "use suggestTermsIndexed for one")
    // the combo enumeration below is perSlot^|tokens| driver-side
    // tuples: bounded-input guard like every sibling verb's (Lucene's
    // suggesters cap phrase expansion the same way) — at the cap,
    // 4^8 = 65536 tuples, still query-sized; a pathological 20-token
    // phrase would be ~10^12 and must fail loudly instead
    require(terms.size <= 8,
      s"phrase suggestion serves at most 8 tokens, got ${terms.size} " +
        s"($terms) — correct longer queries per clause")
    // ...and the exponent's BASE needs the same cap: the token guard
    // alone still admits perSlot=50 × 8 tokens ≈ 4e13 tuples. Bound
    // the PRODUCT directly (the quantity the fold below materializes)
    // so any (perSlot, tokens) pair a caller picks either stays
    // query-sized or fails loudly here.
    require(math.pow(perSlot.toDouble, terms.size.toDouble) <= 65536.0,
      s"perSlot=$perSlot over ${terms.size} tokens enumerates " +
        s"~$perSlot^${terms.size} candidate phrases — cap is 65536 " +
        "(= 4^8); lower perSlot or shorten the phrase")
    // per-slot candidates round-trip the driver (≤perSlot rows each —
    // the fuzzyRank query-rows convention), which is also where an
    // empty slot fails by name
    val slots: Seq[Seq[(String, Long, Int)]] = terms.map { t =>
      val cands = distRanked(symspellCollisions(spark, path, t, maxDist),
          t, maxDist, perSlot)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSeq
      require(cands.nonEmpty,
        s"no indexed term within $maxDist edits of '$t' — cannot " +
          "correct this position")
      cands
    }
    val combos = slots.foldLeft(Seq((List.empty[String], 0L, 0))) {
      case (acc, cands) => for {
        (p, df, dist) <- acc
        (t, tdf, tdist) <- cands
      } yield (p :+ t, df + tdf, dist + tdist)
    }.map { case (ts, df, dist) => (ts.mkString(" "), dist, df) }
    import spark.implicits._
    val ord = Seq(col("total_df").desc, col("total_dist").asc, col("phrase"))
    combos.toDF("phrase", "total_dist", "total_df")
      .orderBy(ord: _*).limit(k)
      .withColumn("sugg_rank", row_number().over(Window.orderBy(ord: _*)))
      .select(col("sugg_rank"), col("phrase"), col("total_dist"),
        col("total_df"))
  }

  /** Wildcard (infix-contains) search — Lucene's WildcardQuery for
    * the `*needle*` pattern, INCLUDING the leading-wildcard case its
    * docs warn about: a hash-bucketed postings layout cannot prune
    * any wildcard, and neither can Lucene's sorted terms index — both
    * pay a full dictionary walk. Here that walk is the
    * vocabulary-sized `_vocab`/`_segvocab` scan (Zipf-bounded
    * metadata, never the corpus), capped by the same df-ranked
    * maxExpansions rewrite as [[searchPrefix]], then scored through
    * the layout's own bucket-pruned rank path. */
  def searchWildcard(spark: SparkSession, path: String, needle0: String,
                     k: Int = 10, maxExpansions: Int = 16): DataFrame = {
    val needle = foldProbe(spark, path, needle0, "wildcard needle")
    val expanded = expandDictionary(spark, path,
      col("term").contains(needle), maxExpansions,
      s"no indexed term contains '$needle' — nothing to search")
    routeScore(spark, path, expanded, k)
  }

  /** Lowercase a dictionary pattern through the SAME Catalyst Lower
    * tree the analyzers use (the bucketOf parity discipline — a JVM
    * locale lowercase need not agree with the plan's) — the shared
    * head of [[searchGlob]] and [[searchRegexp]]. */
  private def lowerPattern(pattern0: String, what: String): String = {
    require(pattern0.nonEmpty, s"$what must be non-empty")
    import org.apache.spark.sql.catalyst.expressions.{Literal, Lower}
    Lower(Literal(pattern0)).eval(null).toString
  }

  /** General wildcard search — Lucene's WildcardQuery with `*` and
    * `?` allowed ANYWHERE in the pattern ([[searchWildcard]] serves
    * only the infix `*needle*` form; this serves `ne*dle`, `n??dle`
    * and the leading-wildcard forms Lucene's docs warn about): the
    * pattern lowercases through the same Catalyst Lower tree the
    * analyzers use (glob metachars are case-fold-invariant),
    * translates to an ANCHORED regex — `*` → `.*`, `?` → `.`;
    * literal characters are restricted to `[a-z0-9]`, which are
    * never regex-special, so the translation needs no escaping and
    * Spark's and any oracle engine's regex semantics provably agree
    * — and walks the `_vocab`/`_segvocab` dictionary with `rlike`:
    * the same vocabulary-sized scan (no engine can prune a leading
    * wildcard), the same df-ranked `maxExpansions` rewrite cap, then
    * the layout's own bucket-pruned rank path. On an `english`
    * layout the dictionary holds stems and the pattern matches them
    * verbatim (a glob cannot be stemmed — Lucene's multi-term
    * queries likewise bypass the analysis chain). */
  def searchGlob(spark: SparkSession, path: String, pattern0: String,
                 k: Int = 10, maxExpansions: Int = 16): DataFrame = {
    val (lowered, pred) = globTermPred(pattern0)
    val expanded = expandDictionary(spark, path, pred, maxExpansions,
      s"no indexed term matches glob '$lowered' — nothing to search")
    routeScore(spark, path, expanded, k)
  }

  /** Validate + translate a glob to its anchored dictionary-match
    * predicate — ONE definition for [[searchGlob]] and
    * [[searchParsed]]'s wildcard atoms, so the pinned glob-regexp
    * subsumption holds for both entry points. */
  private def globTermPred(pattern0: String): (String, Column) = {
    val lowered = lowerPattern(pattern0, "glob pattern")
    require(lowered.matches("[a-z0-9*?]+"),
      s"glob pattern must be [a-z0-9*?]+ after lowering, got '$lowered'")
    require(lowered.exists(c => c != '*' && c != '?'),
      "glob pattern needs at least one literal character")
    val rx = "^" + lowered.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c => c.toString
    } + "$"
    (lowered, col("term").rlike(rx))
  }

  /** Regexp query — Lucene's RegexpQuery, the last multi-term query
    * form after prefix ([[searchPrefix]]), infix ([[searchWildcard]])
    * and glob ([[searchGlob]]): expand a regular expression against
    * the term dictionary, cap, score. Pattern contract (the
    * documented escaping rule — REJECT, don't escape-translate):
    * after lowercasing through the same Catalyst Lower tree the
    * analyzers use, the pattern may contain only `[a-z0-9]` literals
    * and the operators `. * + ? | ( ) [ ] -` — character classes
    * over `[a-z0-9]` with ranges included. On that subset Java's
    * regex (Spark's `rlike`) and the RE2/POSIX family agree exactly:
    * no backslash escapes, no brace quantifiers, no anchors or
    * negated classes — every construct where engine dialects diverge
    * is outside the grammar, so an oracle engine provably matches
    * the same terms. The pattern is compiled driver-side first, so
    * an ill-formed one (unbalanced parens, dangling quantifier)
    * fails loudly by name before any read. Anchored `^...$` —
    * Lucene's RegexpQuery matches the WHOLE term, and anchoring also
    * aligns partial-match engines (DuckDB `regexp_matches`). Then
    * the same vocabulary-sized dictionary walk as [[searchGlob]] (no
    * hash-bucketed — or sorted — terms index can prune a general
    * regexp; Lucene intersects its FST the same way), the same
    * df-ranked `maxExpansions` rewrite cap, and the layout's own
    * bucket-pruned rank path with pre-analyzed expansions. On an
    * `english` layout the dictionary holds stems and the pattern
    * matches them verbatim (the multi-term analysis-chain bypass). */
  def searchRegexp(spark: SparkSession, path: String, pattern0: String,
                   k: Int = 10, maxExpansions: Int = 16): DataFrame = {
    val lowered = lowerPattern(pattern0, "regexp pattern")
    require(lowered.matches("""[a-z0-9.*+?|()\[\]\-]+"""),
      s"regexp pattern may contain only [a-z0-9] literals and the " +
        s"operators . * + ? | ( ) [ ] - after lowering, got '$lowered'")
    // stacked quantifiers ('a*+', 'a++') pass the character grammar
    // above but are POSSESSIVE quantifiers to java.util.regex (which
    // can change match EXISTENCE under backtracking) while the
    // RE2/POSIX family rejects them; reluctant forms ('a*?') agree on
    // existence but ride the same adjacency and stay rejected for the
    // grammar's simplicity (the reject-don't-translate rule). INSIDE
    // a character class, '*'/'+'/'?' are literals in BOTH dialects —
    // 'x[*+]y' is portable and passes — so the adjacency scan blanks
    // class contents first (no nesting or escapes exist in this
    // grammar; the first ']' closes).
    val outsideClasses = {
      val sb = new StringBuilder
      var inClass = false
      lowered.foreach {
        case '[' if !inClass => inClass = true; sb += '['
        case ']' if inClass => inClass = false; sb += ']'
        case c => sb += (if (inClass) 'a' else c)
      }
      sb.toString
    }
    require(!outsideClasses.matches(""".*[*+?][*+?].*"""),
      s"stacked quantifiers (possessive/reluctant/double, in " +
        s"'$lowered') are outside the portable grammar — java and " +
        "RE2/POSIX dialects diverge on possessive forms; rewrite " +
        "without adjacent * + ? outside character classes")
    val rx =
      try { java.util.regex.Pattern.compile(lowered); "^" + lowered + "$" }
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          throw new IllegalArgumentException(
            s"invalid regexp '$lowered': ${e.getDescription}")
      }
    val expanded = expandDictionary(spark, path,
      col("term").rlike(rx), maxExpansions,
      s"no indexed term matches regexp '$lowered' — nothing to search")
    routeScore(spark, path, expanded, k)
  }

  /** More-like-this — Lucene's MoreLikeThisQuery: mine the best
    * `maxTerms` query terms from ONE document's text by the same
    * quantized Robertson selection value [[searchTopKPrf]] uses for
    * its feedback set (bm25Micros with the doc's tf/len and the
    * INDEX's df/stats — rare-in-corpus, frequent-in-doc terms win),
    * then run the ordinary top-k search with them. `docs` is the
    * forward corpus the layout was built from (the PRF argument: an
    * inverted layout cannot enumerate one doc's terms without a full
    * scan, the forward table serves exactly that direction as an
    * id-pruned read). The q115 flagship query is the DEGENERATE form
    * of this verb (all of doc 0's terms, unweighted); the selection
    * cap is what makes it usable on long documents, where querying
    * every term floods the bucket pruning. The source doc itself
    * ranking first is correct more-like-this behavior. */
  def moreLikeThis(spark: SparkSession, path: String, docs: DataFrame,
                   docId: Any, maxTerms: Int = 8, k: Int = 10,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(maxTerms >= 1 && k >= 1, s"bad maxTerms=$maxTerms / k=$k")
    val analyzer = analyzerOf(spark, path)
    val docTf = termFreqs(
        docs.filter(col(idCol) === lit(docId))
          .select(col(idCol).as("doc_id"), col(textCol).as("text")),
        analyzer)
      .localCheckpoint() // one doc's distinct terms — bounded
    val docLen = docTf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("len"))
    val cands = docTf.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(cands.nonEmpty, s"doc $docId has no indexed terms")
    val (nDocs, sumLen) = statsLits(spark, path)
    val dfTbl = Relations.parquet(spark, path)
      .filter(col("bucket").isin(
          cands.map(bucketOf).distinct.map(Integer.valueOf): _*) &&
        col("term").isin(cands: _*))
      .groupBy(col("term")).agg(max(col("df")).as("df"))
    val selected = docTf.join(docLen, "doc_id").join(dfTbl, "term")
      .select(col("term"),
        bm25Micros(col("tf"), col("df"), col("len"),
          nDocs, sumLen).as("w"))
      .orderBy(col("w").desc, col("term")).limit(maxTerms)
      .select(col("term")).collect().map(_.getString(0)).toSeq
    // mined terms came out of termFreqs under the layout analyzer —
    // already stems on an `english` layout, so they must not fold
    // again (rankAnalyzed's Porter-non-idempotence argument)
    rankAnalyzed(spark, path, selected, k)
  }

  /** BATCH lexical top-`k`: every query answered from ONE postings
    * scan pruned to the UNION of all queries' term buckets — a
    * broadcast (query_id, term) table fans each posting row to only
    * the queries that contain its term, then per-query exact-integer
    * aggregation and window ranks (the searchTopKIvfBatch shape:
    * amortized scan, narrow rank exchanges carrying (query_id,
    * doc_id, micros)). `queries` = (query_id, queryText); text is
    * tokenized with the build's split rule. */
  def searchTopKLexicalBatch(spark: SparkSession, path: String,
                             queries: Seq[(Long, String)], k: Int = 10,
                             where: Option[Column] = None,
                             allow: Option[DataFrame] = None): DataFrame = {
    val batchAnalyzer = analyzerOf(spark, path)
    val qTerms = queries.flatMap { case (qid, text) =>
      foldQueryTerms(text.split(" ").filter(_.nonEmpty).toSeq, batchAnalyzer)
        .distinct.map(qid -> _)
    }
    require(qTerms.nonEmpty, "batch lexical search needs at least one term")
    val terms = qTerms.map(_._2).distinct
    val buckets = terms.map(bucketOf).distinct
    val (nDocs, sumLen) = statsLits(spark, path)
    val post = Relations.parquet(spark, path)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .filter(where.getOrElse(lit(true)))
      .transform(p => allowFilter(p, allow))
      .transform(p => tombstones(spark, path)
        .fold(p)(t => p.join(t, Seq("doc_id"), "left_anti")))
    import spark.implicits._
    val qt = qTerms.toDF("query_id", "term")
    val scored = post.join(broadcast(qt), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        bm25Micros(col("tf"), col("df"), col("len"),
          nDocs, sumLen).as("micros"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("micros")).as("lex_micros"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("lex_micros").desc, col("doc_id"))
    scored.withColumn("lex_rank", row_number().over(w))
      .filter(col("lex_rank") <= k)
      .select(col("query_id"), col("doc_id"), col("lex_rank"), col("lex_micros"))
  }

  /** Reciprocal-rank fusion of a lexical and a vector rank list
    * (Cormack/Clarke/Buettcher 2009: score = sum 1/(K + rank)) —
    * quantized to exact integer units (floor(1e9/(K+rank)), a
    * division of small integers: deterministic, engine-independent).
    * Inputs need (doc_id, lex_rank) / (doc_id, vec_rank); a doc
    * missing from one list contributes 0 from it (full outer join —
    * both lists are k-row, so this is a driver-trivial merge at any
    * corpus size). Output: top-`k` (rank, doc_id, lex_rank, vec_rank,
    * rrf_micros), ranks NULL where a side didn't surface the doc. */
  // ---- parsed query execution (Lucene QueryParser subset) -----------

  /** The doc_id MATCH SET of a phrase over a positional layout —
    * [[searchPhrase]]'s adjacency test (slop 0) or
    * [[searchSpanNear]]'s ordered-span test (slop > 0) WITHOUT the
    * rank: [[searchParsed]]'s phrase clauses gate on this set (a must
    * phrase admits, a should phrase selects who gets its score), so
    * it must be the whole match set, not a top-k page — and dropping
    * the window keeps it a filter over the pruned positional read,
    * nothing global. Same [[positionalSlots]] read, same rarest-first
    * join order, same fold expressions as the ranked verbs. */
  private def phraseMatchSet(spark: SparkSession, path: String,
                             terms: Seq[String], slop: Int): DataFrame = {
    require(terms.size >= 2, "a phrase needs at least two terms")
    require(slop >= 0, s"slop must be >= 0, got $slop")
    val (slots, dfByTerm) = positionalSlots(spark, path, terms)
    val joined = slotOrderByDf(terms, dfByTerm).map(slots)
      .reduce((a, b) => a.join(b, "doc_id"))
    if (slop == 0)
      joined.select(col("doc_id"), phraseTfExpr(terms.size).as("phrase_tf"))
        .filter(col("phrase_tf") > 0).select(col("doc_id"))
    else
      joined.select(col("doc_id"), spanGapExpr(terms.size).as("span_gap"))
        .filter(col("span_gap") <= slop).select(col("doc_id"))
  }

  /** Execute a [[QueryParser.Parsed]] query — the engine's answer to
    * Lucene's `QueryParser.parse(...)` + `IndexSearcher.search(...)`
    * pair: every clause routes through the SAME internals its
    * standalone verb uses (one analyzer fold per clause at entry;
    * dictionary atoms fold with the lowercase-only probe rule — the
    * r18 multi-term bypass; expansion caps and loud empty-expansion
    * failures identical), so a parsed query provably scores like the
    * hand-assembled calls it abbreviates (LexicalSpec pins the
    * boolean and pure-OR equivalences).
    *
    * `fields` maps query field names to scoring layouts;
    * `positional` maps the fields that may carry phrase clauses to
    * their positional layouts (a phrase on an unmapped field fails
    * loudly — position data cannot be conjured from a frequency
    * layout). Semantics per [[QueryParser]]'s contract:
    *
    *  - each clause yields a MATCH SET and (unless MUST_NOT) a
    *    per-doc integer score: a term's [[bm25Micros]] sum; a
    *    dictionary atom's expansion scored like its verb (prefix/
    *    glob: df-ranked cap then plain sum; fuzzy: similarity-
    *    weighted split sum); a phrase GATES on the positional match
    *    set ([[phraseMatchSet]]) and scores its terms' ordinary BM25
    *    over the scoring layout restricted to that set — one scale
    *    (micros of the shared kernel) for every clause, which is
    *    what makes the fused sum meaningful and exact (Lucene's
    *    phraseFreq saturation is a different curve; documented
    *    divergence, chosen for the integer-exact contract);
    *  - a GROUP clause `(...)` combines its inner clauses by the
    *    same candidate rule ([[parsedCandidates]] — the nested
    *    boolean), scores as the Σ of inner scoring subtotals over
    *    its own match set, and then gates/boosts in the outer query
    *    as ONE clause; a RANGE clause `[lo TO hi]` expands through
    *    [[expandTermRange]] exactly like [[searchTermRange]];
    *  - a clause whose text folds away under its field's analyzer
    *    DROPS silently (Lucene's stopword-clause behavior) — even a
    *    must clause: analyzer-consumed tokens never gate;
    *  - `^n` boosts floor at the per-(clause, doc) SUBTOTAL via the
    *    overflow-safe split (the [[searchTopKFields]] rule; a
    *    group's subtotal is the group Σ, floored once per group);
    *  - candidates: every MUST set intersected (ids-only semi-joins)
    *    minus every MUST_NOT set; no musts → union of SHOULD sets
    *    (minShouldMatch=1, [[searchBoolean]]'s rule);
    *  - score: Σ boosted clause subtotals over must+should clauses,
    *    ranked (parsed_micros DESC, doc_id), top-k.
    *
    * Scale shape: clause reads are bucket-pruned postings or
    * vocabulary-sized dictionary walks (each clause exactly its
    * standalone verb's read); gates and the fuse exchange (doc_id,
    * micros) pairs only. Driver work is the parse plus the
    * query-sized expansion round-trips. */
  def searchParsed(spark: SparkSession, parsed: QueryParser.Parsed,
                   fields: Map[String, String], defaultField: String,
                   positional: Map[String, String] = Map.empty,
                   k: Int = 10, maxExpansions: Int = 16): DataFrame = {
    parsedEntryChecks(spark, parsed, fields, defaultField)
    rankParsedFrames(parsedClauseFrames(spark, parsed, fields, defaultField,
      positional, maxExpansions), k)
  }

  /** The fuse-and-rank tail of [[searchParsed]] over already-built
    * clause frames — split out so a search-plus-explain composition
    * ([[explainParsedTopK]]) builds the frames (and their shared
    * checkpointed reads) ONCE instead of once per verb. */
  private def rankParsedFrames(
      frames: Seq[(Int, QueryParser.Clause, Option[(DataFrame, DataFrame)])],
      k: Int): DataFrame = {
    import QueryParser._
    val built = frames
      .flatMap { case (_, c, fr) =>
        fr.map { case (matches, m) =>
          (c.occur, matches, boostedWm(m, c.boostMicros))
        }
      }
    val scoring = built.filter(_._1 != MustNot)
    require(scoring.nonEmpty,
      "every scoring clause folded away under its field's analyzer")
    val cand = parsedCandidates(built)
    val scored = scoring.map(_._3).reduce(_.union(_))
      .join(cand, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(sum(col("wm")).as("parsed_micros"))
    scored.orderBy(col("parsed_micros").desc, col("doc_id")).limit(k)
      .withColumn("parsed_rank", row_number().over(
        Window.orderBy(col("parsed_micros").desc, col("doc_id"))))
      .select(col("doc_id"), col("parsed_rank"), col("parsed_micros"))
  }

  /** The shared fail-fast entry checks of [[searchParsed]] /
    * [[explainParsed]]: fail BEFORE any clause work, by name (the
    * searchFuzzy discipline) — the clause scorers aggregate through
    * the denormalized layout's `_stats`/`_vocab`, so a segmented
    * field would otherwise die in an unrelated-looking missing-path
    * read halfway through clause 3. */
  private def parsedEntryChecks(spark: SparkSession,
                                parsed: QueryParser.Parsed,
                                fields: Map[String, String],
                                defaultField: String): Unit = {
    require(fields.contains(defaultField),
      s"defaultField '$defaultField' is not in fields " +
        fields.keys.toSeq.sorted.mkString("{", ", ", "}"))
    fields.foreach { case (f, p) =>
      require(!isSegmented(spark, p),
        s"field '$f' ($p) is a segmented layout — parsed queries " +
          s"serve the denormalized family; compactSegments($p) first")
    }
  }

  /** The overflow-safe integer boost split, applied at the
    * per-(clause, doc) SUBTOTAL (the [[searchTopKFields]] rule; for
    * a group clause the subtotal is the group's own Σ, so the split
    * floors once per group, never per inner clause). */
  private def boostedWm(frame: DataFrame, w: Long): DataFrame =
    frame.select(col("doc_id"),
      expr(s"${w}L * (m div 1000000L) + " +
        s"(${w}L * (m % 1000000L)) div 1000000L").as("wm"))

  /** [[searchBoolean]]'s candidate rule over built clause frames:
    * every MUST match set intersected (ids-only semi-joins) minus
    * every MUST_NOT set; no musts → union of SHOULD sets
    * (minShouldMatch=1). One definition for the outer query
    * ([[searchParsed]]/[[explainParsed]]) AND each group's inner
    * combination, so a group provably gates like a nested boolean
    * query. */
  private def parsedCandidates(
      built: Seq[(QueryParser.Occur, DataFrame, DataFrame)]): DataFrame = {
    import QueryParser._
    val musts = built.filter(_._1 == Must)
    val base =
      if (musts.nonEmpty)
        musts.map(_._2.distinct())
          .reduce((a, b) => a.join(b, Seq("doc_id"), "left_semi"))
      else built.filter(_._1 != MustNot).map(_._2)
        .reduce(_.union(_)).distinct()
    built.filter(_._1 == MustNot).map(_._2)
      .foldLeft(base)((acc, n) =>
        acc.join(n.distinct(), Seq("doc_id"), "left_anti"))
  }

  /** One SIMPLE (non-group) atom RESOLVED to its read requirements —
    * the driver-side folding/expansion half of the old
    * simpleClauseFrame, split out so [[parsedClauseFrames]] can issue
    * ONE pruned read per layout over the union of every clause's
    * terms instead of one scan per clause. Resolution is byte-for-
    * byte the standalone verbs' (same folds, same expansion caps,
    * same loud empty-expansion failures). None = the clause folded
    * away under its field's analyzer (Lucene's stopword-clause
    * drop). */
  private sealed trait ResolvedAtom { def path: String }
  /** Plain term set (term / prefix / wildcard / range expansions) —
    * scores as an unweighted BM25 sum. */
  private case class RTerms(path: String, terms: Seq[String])
    extends ResolvedAtom
  /** Similarity-weighted expansion (fuzzy) — scores by the per-row
    * overflow-safe split ([[contributionsWeighted]]'s rule). */
  private case class RWeighted(path: String, weighted: Seq[(String, Long)])
    extends ResolvedAtom
  /** Positional-gated phrase: `matches` is the adjacency match set
    * over the POSITIONAL layout; scoring is the terms' ordinary BM25
    * over the scoring layout restricted to that set. */
  private case class RPhrase(path: String, scoreTerms: Seq[String],
                             matches: DataFrame) extends ResolvedAtom

  /** Bounded daemon pool for the parsed path's independent driver
    * round-trips (dictionary expansions, shared-read checkpoints) —
    * each thunk fires its own query-sized jobs; the scheduler
    * back-fills them concurrently (guide §2.6). */
  private lazy val prepPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => {
        val t = new Thread(r, "graft-parsed-prep")
        t.setDaemon(true)
        t
      })

  /** True when `df` is already a materialized frame — a checkpoint's
    * LogicalRDD or a driver-local relation — possibly under
    * projections/aliases: re-referencing it is cheap (no upstream
    * re-execution), so callers that checkpoint defensively against
    * the lazy-page re-execution disease can skip the extra
    * materialization job for it. */
  private def isMaterialized(df: DataFrame): Boolean = {
    @scala.annotation.tailrec
    def base(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          if pr.projectList.forall(_.deterministic) => base(pr.child)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        base(a.child)
      case other => other
    }
    base(df.queryExecution.analyzed) match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }
  }

  /** Run independent thunks concurrently, return results in input
    * order; the first failure IN INPUT ORDER rethrows, so error
    * reporting is indistinguishable from the serial form. */
  private def awaitInOrder[A](thunks: Seq[() => A]): Seq[A] =
    // caller-runs fallback when already ON a prepPool thread: a
    // nested awaitInOrder would park this pool thread in f.get()
    // while its children queue behind it — pool-exhaustion deadlock
    // risk for a future re-entrant caller (no current path nests,
    // but the invariant is now enforced, not assumed)
    if (thunks.size <= 1
        || Thread.currentThread().getName.startsWith("graft-parsed-prep"))
      thunks.map(_())
    else thunks
      .map(th => prepPool.submit(new java.util.concurrent.Callable[A] {
        override def call(): A = th()
      }))
      .map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }

  private def resolveSimpleAtom(spark: SparkSession, fieldName: String,
                                path: String,
                                positional: Map[String, String],
                                atom: QueryParser.Atom,
                                maxExpansions: Int): Option[ResolvedAtom] = {
    import QueryParser._
    val analyzer = analyzerOf(spark, path)
    atom match {
      case TermAtom(t) =>
        val terms = foldQueryTerms(Seq(t), analyzer)
          .filter(_.nonEmpty).distinct
        if (terms.isEmpty) None else Some(RTerms(path, terms))
      case PhraseAtom(words, slop) =>
        val posPath = positional.getOrElse(fieldName, sys.error(
          s"phrase clause on field '$fieldName' needs a positional " +
            s"layout — pass positional = Map(\"$fieldName\" -> path)"))
        val posTerms = foldQueryTerms(words,
          analyzerOf(spark, posPath)).filter(_.nonEmpty)
        // Lucene's stopword-reduced PhraseQuery degrade: on an
        // analyzed layout "the merge" folds to one token and
        // becomes a TERM clause (no adjacency left to gate on);
        // a pure-stopword phrase folds away and DROPS like any
        // analyzer-consumed clause — never an error
        posTerms.size match {
          case 0 => None
          case 1 =>
            // the POSITIONAL analyzer decides the degrade (gate
            // side) AND which word survived; only THAT word scores —
            // translated into the SCORING field's analyzer like any
            // term clause (the two layouts may carry different
            // chains, r19 advisor note). Folding ALL words here
            // would re-admit positionally-consumed stopwords into
            // the clause's ungated match set — Lucene's degrade is
            // TermQuery(the surviving term), nothing more.
            val survivors = words.filter(w =>
              foldQueryTerms(Seq(w), analyzerOf(spark, posPath))
                .exists(_.nonEmpty))
            val scoreTerms = foldQueryTerms(survivors, analyzer)
              .filter(_.nonEmpty).distinct
            if (scoreTerms.isEmpty) None else Some(RTerms(path, scoreTerms))
          case _ =>
            // checkpoint the ids-only adjacency set: it feeds BOTH the
            // clause gate and the scoring allow-filter, and the fuse's
            // gate pushdown would otherwise re-run the positional read
            // inside every union branch it lands in
            val matches = phraseMatchSet(spark, posPath, posTerms, slop)
              .localCheckpoint()
            val scoreTerms = foldQueryTerms(words, analyzer)
              .filter(_.nonEmpty).distinct
            Some(RPhrase(path, scoreTerms, matches))
        }
      case PrefixAtom(p0) =>
        val p = foldProbe(spark, path, p0, "prefix")
        val expanded = expandDictionary(spark, path,
          col("term").startsWith(p), maxExpansions,
          s"no indexed term starts with '$p' — nothing to search")
        Some(RTerms(path, expanded))
      case WildcardAtom(pat0) =>
        val (lowered, pred) = globTermPred(pat0)
        val expanded = expandDictionary(spark, path, pred, maxExpansions,
          s"no indexed term matches glob '$lowered' — nothing to search")
        Some(RTerms(path, expanded))
      case RangeAtom(lo, hi, inclLo, inclHi) =>
        Some(RTerms(path, expandTermRange(spark, path, lo, hi, inclLo,
          inclHi, maxExpansions)))
      case FuzzyAtom(t, d) =>
        require(!isSegmented(spark, path),
          s"fuzzy clause needs the denormalized layout's _stats — " +
            s"compactSegments($path) first")
        val term = foldProbe(spark, path, t, "fuzzy probe")
        Some(RWeighted(path, fuzzyWeights(
          editCandidates(spark, path, term, d, maxExpansions), term, d)))
      case _: GroupAtom => sys.error(
        "group atom in simple-clause position — QueryParser guarantees " +
          "one level of nesting; this is a parser bug")
    }
  }

  /** One SIMPLE atom's MATCH SET and UNboosted score frame
    * (doc_id, m), sliced from the query's shared per-layout read
    * (`shared(path)` = the checkpointed (doc_id, term, micros)
    * contribution frame over the UNION of the query's terms on that
    * layout). Slicing by `term IN (clause terms)` recovers exactly
    * the rows the clause's own pruned scan would have produced —
    * the bucket filter is a superset prune, the term filter is
    * decisive — and the integer sums are partition-order-free, so
    * each frame is bit-identical to its pre-r21 per-clause-scan
    * form (QueryParserSpec pins the searchBoolean equivalence; q231/
    * q236/q238/q239 gate it against the oracle). */
  private def frameFromResolved(spark: SparkSession,
                                shared: Map[String, DataFrame],
                                r: ResolvedAtom)
      : (DataFrame, DataFrame) = r match {
    case RTerms(p, terms) =>
      val m = slicePlain(shared(p), terms)
      (m.select(col("doc_id")), m)
    case RPhrase(p, scoreTerms, matches) =>
      require(scoreTerms.nonEmpty, "lexical search needs at least one term")
      val m = slicePlain(shared(p), scoreTerms, allow = Some(matches))
      (matches, m)
    case RWeighted(p, weighted) =>
      val wdf = spark.createDataFrame(weighted).toDF("term", "w")
      val m = shared(p)
        .filter(col("term").isin(weighted.map(_._1): _*))
        .join(broadcast(wdf), Seq("term"))
        // micros here IS contributionsWeighted's per-row `m`; the
        // weighted split applies PER POSTING ROW before the doc sum
        .select(col("doc_id"), expr(
          "w * (micros div 1000000L) + " +
            "(w * (micros % 1000000L)) div 1000000L").as("wm"))
        .groupBy(col("doc_id")).agg(sum(col("wm")).as("m"))
      (m.select(col("doc_id")), m)
  }

  /** Unweighted BM25 sum of a clause's terms over the shared
    * contribution frame — [[scoreLexical]]'s aggregation with the
    * read already done. */
  private def slicePlain(sharedRead: DataFrame, terms: Seq[String],
                         allow: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "lexical search needs at least one term")
    sharedRead.filter(col("term").isin(terms: _*))
      .transform(p => allowFilter(p, allow))
      .select(col("doc_id"), col("micros"))
      .groupBy(col("doc_id")).agg(sum(col("micros")).as("m"))
  }

  /** Per-clause execution frames, shared by [[searchParsed]] and
    * [[explainParsed]] (so the explain decomposes the search's own
    * frames, not a parallel reimplementation): for each clause in
    * parse order, (index, clause, None when analyzer-consumed, else
    * (match set, UNboosted (doc_id, m) score frame)). A GROUP clause
    * builds each inner clause through [[simpleClauseFrame]] and
    * combines: match set = [[parsedCandidates]] over the inner
    * frames (the nested-boolean rule), score = Σ inner scoring
    * subtotals restricted to that set — the group then boosts/gates
    * in the outer query as ONE clause. Also prices the exact-integer
    * headroom per clause: boost × innerScoringClauses ×
    * maxExpansions ≤ 256 (= 2^63 / the standing ~2.2e16 per-term
    * micros bound, with margin) — the parser's ^16 cap assumed the
    * default maxExpansions=16 and one clause; the product is the
    * real invariant (r19 advisor note). */
  private def parsedClauseFrames(spark: SparkSession,
                                 parsed: QueryParser.Parsed,
                                 fields: Map[String, String],
                                 defaultField: String,
                                 positional: Map[String, String],
                                 maxExpansions: Int)
      : Seq[(Int, QueryParser.Clause, Option[(DataFrame, DataFrame)])] = {
    import QueryParser._
    def pathOf(fieldName: String): String =
      fields.getOrElse(fieldName, sys.error(
        s"unknown field '$fieldName' — fields: " +
          fields.keys.toSeq.sorted.mkString(", ")))
    // phase 1 — resolve every clause's read requirements (all the
    // driver-side folding, dictionary expansion and positional-gate
    // work, unchanged from the per-clause form — same caps, same
    // loud failures). The expansions are independent query-sized
    // round-trips, so they run CONCURRENTLY (guide §2.6: overlap
    // independent jobs — the scheduler back-fills, wall time ≈ the
    // slowest expansion instead of the sum); awaiting in clause
    // order keeps failure reporting identical to the serial form.
    val resolved: Seq[(Int, QueryParser.Clause,
        Seq[(QueryParser.Occur, ResolvedAtom)])] =
      awaitInOrder(parsed.clauses.zipWithIndex.map { case (c, i) => () => {
        val innerScoring = c.atom match {
          case g: GroupAtom => g.clauses.count(_.occur != MustNot)
          case _ => 1
        }
        require((c.boostMicros / 1000000L) * innerScoring * maxExpansions
            <= 256,
          s"clause ${i + 1}: boost ${c.boostMicros / 1000000L} × " +
            s"$innerScoring scoring clause(s) × maxExpansions=" +
            s"$maxExpansions exceeds the exact-integer headroom product " +
            "of 256 (each per-term contribution is bounded by ~2.2e16 " +
            "micros; the boosted subtotal must stay under 2^63) — lower " +
            "the boost or maxExpansions")
        val fieldName = c.field.getOrElse(defaultField)
        val rs = c.atom match {
          case g: GroupAtom =>
            g.clauses.flatMap { ic =>
              val f = ic.field.getOrElse(defaultField)
              resolveSimpleAtom(spark, f, pathOf(f), positional, ic.atom,
                maxExpansions).map(ic.occur -> _)
            }
          case a =>
            resolveSimpleAtom(spark, fieldName, pathOf(fieldName),
              positional, a, maxExpansions).map(c.occur -> _).toSeq
        }
        (i, c, rs)
      }})
    // phase 2 — ONE bucket-pruned, tombstone-masked read per layout
    // over the UNION of every clause's resolved terms, checkpointed
    // ([[booleanContributions]]'s one-read discipline, applied across
    // clauses): without this, Catalyst pushes the fuse's candidate
    // gate down into every scoring branch and each duplicate re-runs
    // its own parquet scans — the r20 plan re-read the postings 76
    // times for a 7-clause query. The checkpoint is term-postings-
    // sized (exactly the rows the per-clause scans read), so the
    // 100 TB bound is unchanged. Per-layout reads are independent —
    // they materialize concurrently too.
    val shared: Map[String, DataFrame] = {
      val byPath = resolved
        .flatMap(_._3.map(_._2))
        .flatMap {
          case RTerms(p, ts) => ts.map(p -> _)
          case RWeighted(p, w) => w.map { case (t, _) => p -> t }
          case RPhrase(p, ts, _) => ts.map(p -> _)
        }
        .groupBy(_._1).toSeq.sortBy(_._1)
      byPath.map(_._1).zip(awaitInOrder(byPath.map { case (p, xs) => () =>
        contributions(spark, p, xs.map(_._2).distinct)
          .select(col("doc_id"), col("term"), col("micros"))
          .localCheckpoint()
      })).toMap
    }
    // phase 3 — slice each clause's (match set, m) frame from the
    // shared read; a group combines its inner slices by the same
    // nested-boolean rule as before
    resolved.map { case (i, c, rs) =>
      val frames: Option[(DataFrame, DataFrame)] = c.atom match {
        case _: GroupAtom =>
          val inner = rs.map { case (occ, r) =>
            val (mt, m) = frameFromResolved(spark, shared, r)
            (occ, mt, m)
          }
          val scoring = inner.filter(_._1 != MustNot)
          // the whole group analyzer-consumed → drops like a
          // stopword clause (even the inner must-nots: exclusion
          // without a scoring clause is not a group the parser
          // admits, and folded-away exclusions never gate)
          if (scoring.isEmpty) None
          else {
            val matches = parsedCandidates(inner)
            val m = scoring.map(_._3).reduce(_.union(_))
              .join(matches, Seq("doc_id"), "left_semi")
              .groupBy(col("doc_id")).agg(sum(col("m")).as("m"))
            Some((matches, m))
          }
        case _ =>
          rs.headOption.map { case (_, r) =>
            frameFromResolved(spark, shared, r)
          }
      }
      (i, c, frames)
    }
  }

  /** Relevance explain for [[searchParsed]] — the per-(clause, doc)
    * decomposition of a parsed query's fused score over a candidate
    * page `cands`: one row per SCORING clause (must + should; a
    * MUST_NOT clause is boolean admission, not a score factor —
    * exactly how Lucene's Explanation reports a BooleanQuery) and
    * doc that matches it AND passes every gate, carrying the clause's
    * parse-order ordinal, its occur, its field, and `wm` — the
    * BOOSTED per-(clause, doc) subtotal through the same
    * overflow-safe split the fuse applies ([[boostedWm]], which
    * floors at the clause subtotal and does not distribute over
    * terms — the q229 recombination discipline, already folded in
    * here). Because the fuse IS Σ of exactly these subtotals, the
    * explanation is SUM-EXACT by construction: per-doc Σ wm ==
    * parsed_micros to the last digit (QueryParserSpec pins it; q239
    * gates it against the oracle). Same clause frames as the search
    * ([[parsedClauseFrames]] — one definition), same candidate gate,
    * with the page spine semi-joined beneath each clause read;
    * ≤ |cands|·|clauses| rows out, ordered (doc_id, clause). */
  def explainParsed(spark: SparkSession, parsed: QueryParser.Parsed,
                    fields: Map[String, String], defaultField: String,
                    cands: DataFrame,
                    positional: Map[String, String] = Map.empty,
                    maxExpansions: Int = 16): DataFrame = {
    parsedEntryChecks(spark, parsed, fields, defaultField)
    explainParsedFrames(parsedClauseFrames(spark, parsed, fields,
      defaultField, positional, maxExpansions), defaultField, cands)
  }

  /** [[searchParsed]]'s top-k page AND its [[explainParsed]]
    * decomposition from ONE set of clause frames — the seam the q239
    * gate composes: both verbs are deterministic, so running the
    * frame construction (dictionary expansions, shared checkpointed
    * reads) twice could only reproduce identical frames at double
    * cost. Returns exactly
    * `explainParsed(..., searchParsed(...).select("doc_id"), ...)`. */
  private[graft] def explainParsedTopK(spark: SparkSession,
                                       parsed: QueryParser.Parsed,
                                       fields: Map[String, String],
                                       defaultField: String,
                                       positional: Map[String, String] =
                                         Map.empty,
                                       k: Int = 10,
                                       maxExpansions: Int = 16): DataFrame = {
    parsedEntryChecks(spark, parsed, fields, defaultField)
    val frames = parsedClauseFrames(spark, parsed, fields, defaultField,
      positional, maxExpansions)
    explainParsedFrames(frames, defaultField,
      rankParsedFrames(frames, k).select(col("doc_id")))
  }

  /** The decomposition tail of [[explainParsed]] over already-built
    * clause frames (see [[rankParsedFrames]]). */
  private def explainParsedFrames(
      built: Seq[(Int, QueryParser.Clause, Option[(DataFrame, DataFrame)])],
      defaultField: String, cands: DataFrame): DataFrame = {
    import QueryParser._
    val frames = built
      .flatMap { case (i, c, fr) => fr.map { case (mt, m) => (i, c, mt, m) } }
    val scoring = frames.filter(_._2.occur != MustNot)
    require(scoring.nonEmpty,
      "every scoring clause folded away under its field's analyzer")
    val cand = parsedCandidates(frames.map(f => (f._2.occur, f._3, f._4)))
    val gate = cand.join(cands.select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    scoring.map { case (i, c, _, m) =>
        boostedWm(m, c.boostMicros)
          .join(gate, Seq("doc_id"), "left_semi")
          .select(lit(i).as("clause"),
            lit(c.occur match {
              case Must => "must"
              case Should => "should"
              case MustNot => "must_not"
            }).as("occur"),
            lit(c.field.getOrElse(defaultField)).as("field"),
            col("doc_id"), col("wm"))
      }
      .reduce(_.union(_))
      .orderBy(col("doc_id"), col("clause"))
  }

  /** [[QueryParser.parse]] + [[searchParsed]] in one call — the
    * search-box entry point. */
  def searchQueryString(spark: SparkSession, query: String,
                        fields: Map[String, String], defaultField: String,
                        positional: Map[String, String] = Map.empty,
                        k: Int = 10, maxExpansions: Int = 16): DataFrame =
    searchParsed(spark, QueryParser.parse(query), fields, defaultField,
      positional, k, maxExpansions)

  /** One arm's reciprocal-rank contribution in integer nanos —
    * ⌊RrfScale/(rrfK + rank)⌋, 0 for an arm that missed the doc
    * (NULL rank). ONE definition for [[rrfFuse]]/[[rrfFuseBatch]],
    * the tri-hybrid fusion and [[explainRrf]], so the explain is the
    * fusion's own expression, not a parallel reimplementation. */
  def rrfPart(r: Column, rrfK: Int = DefaultRrfK): Column = coalesce(
    floor(lit(RrfScale) / (lit(rrfK) + r)).cast(LongType), lit(0L))

  /** Relevance explain for reciprocal-rank fusion — the hybrid
    * counterpart of [[explainScore]]: decompose a fused page's
    * `rrf_micros` per arm. `fused` is a frame carrying `doc_id` and
    * one `<arm>_rank` column per entry of `arms` (exactly what
    * [[rrfFuse]] and the tri-hybrid fusion return); each output row
    * is one (doc, arm) with the arm's rank (NULL where the arm
    * missed the doc) and its [[rrfPart]] contribution. Scores are
    * exact integers, so the explanation is SUM-EXACT by
    * construction: per-doc Σ rrf_contrib == rrf_micros to the last
    * digit (LexicalSpec pins it against the fused column for both
    * the 2-arm and 3-arm shapes). Page-sized input, |arms|·|page|
    * rows out, ordered (doc_id, arm) — no index read at all: the
    * fusion's inputs ARE the rank lists being explained. */
  def explainRrf(fused: DataFrame, arms: Seq[String],
                 rrfK: Int = DefaultRrfK): DataFrame = {
    require(arms.nonEmpty, "RRF explain needs at least one arm")
    val missing = arms.map(a => s"${a}_rank")
      .filterNot(fused.columns.contains)
    require(missing.isEmpty,
      s"fused frame lacks rank column(s) ${missing.mkString(", ")} — " +
        s"have ${fused.columns.mkString(", ")}")
    // single-pass unpivot (explode of one per-arm struct array), NOT
    // a per-arm union of `fused`: a union references the page subtree
    // once per arm, and when the caller hands in a LAZY search page
    // (q232 passes the whole tri-hybrid pipeline) Catalyst executes
    // that search once per arm — 3x the query for a 30-row unpivot
    // (r21; q232 warm 1.9 s vs its underlying q158's 1.2 s)
    fused.select(col("doc_id"), explode(array(arms.map { a =>
        struct(lit(a).as("arm"), col(s"${a}_rank").as("arm_rank"),
          rrfPart(col(s"${a}_rank"), rrfK).as("rrf_contrib"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("x.arm").as("arm"),
        col("x.arm_rank").as("arm_rank"),
        col("x.rrf_contrib").as("rrf_contrib"))
      .orderBy(col("doc_id"), col("arm"))
  }

  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int,
              rrfK: Int = DefaultRrfK): DataFrame = {
    def part(r: Column): Column = rrfPart(r, rrfK)
    val fused = lex.select(col("doc_id"), col("lex_rank"))
      .join(vec.select(col("doc_id"), col("vec_rank")), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (part(col("lex_rank")) + part(col("vec_rank"))).as("rrf_micros"))
    fused.orderBy(col("rrf_micros").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_micros").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lex_rank"),
        col("vec_rank"), col("rrf_micros"))
  }

  /** [[rrfFuse]] per query: inputs additionally carry `query_id`, the
    * merge keys on (query_id, doc_id), and ranks window per query —
    * two (batch × k)-row lists in, one ranked list per query out. */
  def rrfFuseBatch(lex: DataFrame, vec: DataFrame, k: Int,
                   rrfK: Int = DefaultRrfK): DataFrame = {
    def part(r: Column): Column = rrfPart(r, rrfK)
    val fused = lex.select(col("query_id"), col("doc_id"), col("lex_rank"))
      .join(vec.select(col("query_id"), col("doc_id"), col("vec_rank")),
        Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("lex_rank"), col("vec_rank"),
        (part(col("lex_rank")) + part(col("vec_rank"))).as("rrf_micros"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micros").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("lex_rank"), col("vec_rank"), col("rrf_micros"))
  }
}
