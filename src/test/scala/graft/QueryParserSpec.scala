package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LexicalStore, QueryParser}
import graft.sources.QueryParser._

/** Pins for the Lucene-QueryParser subset: grammar (every atom form,
  * field prefixes, boosts, slop, occurs), operator precedence
  * (AND/OR/NOT vs +/-), loud rejections for everything outside the
  * documented subset, and the executor's routing equivalences — a
  * parsed query must score exactly like the hand-assembled verb
  * calls it abbreviates.
  */
class QueryParserSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
    .getOrCreate()

  // ---- grammar --------------------------------------------------------

  test("atoms: term, phrase(+slop), prefix, wildcard, fuzzy; field; boost") {
    val p = QueryParser.parse(
      """+alpha -beta title:gamma^3 "a b c"~2 pre* w?ld fuzz~1""")
    assert(p.clauses.size == 7)
    assert(p.clauses(0) == Clause(Must, None, TermAtom("alpha"), 1000000L))
    assert(p.clauses(1) == Clause(MustNot, None, TermAtom("beta"), 1000000L))
    assert(p.clauses(2) ==
      Clause(Should, Some("title"), TermAtom("gamma"), 3000000L))
    assert(p.clauses(3) ==
      Clause(Should, None, PhraseAtom(Seq("a", "b", "c"), 2), 1000000L))
    assert(p.clauses(4) == Clause(Should, None, PrefixAtom("pre"), 1000000L))
    assert(p.clauses(5) == Clause(Should, None, WildcardAtom("w?ld"), 1000000L))
    assert(p.clauses(6) == Clause(Should, None, FuzzyAtom("fuzz", 1), 1000000L))
    // bare ~ defaults to distance 2 (checked via a 1-clause parse so
    // the all-negative rule doesn't interfere)
    assert(QueryParser.parse("plain~").clauses.head.atom == FuzzyAtom("plain", 2))
    // phrase with field + boost after the closing quote
    val pb = QueryParser.parse("""t:"x y"~1^4""").clauses.head
    assert(pb == Clause(Should, Some("t"), PhraseAtom(Seq("x", "y"), 1), 4000000L))
    // a one-word phrase degrades to a term (Lucene: "a" == a)
    assert(QueryParser.parse("\"solo\"").clauses.head.atom == TermAtom("solo"))
    // a leading-star pattern is a wildcard, not a prefix
    assert(QueryParser.parse("*tail").clauses.head.atom == WildcardAtom("*tail"))
    assert(QueryParser.parse("mid*dle").clauses.head.atom == WildcardAtom("mid*dle"))
  }

  test("operators: AND promotes both neighbors, NOT negates, OR is default") {
    val p = QueryParser.parse("a AND b OR c AND NOT d e")
    // a AND b -> both must; c stays should but is AND'd with NOT d ->
    // c promoted, d must_not; e should
    assert(p.clauses.map(_.occur) == Seq(Must, Must, Must, MustNot, Should))
    assert(p.clauses.map(_.atom) ==
      Seq(TermAtom("a"), TermAtom("b"), TermAtom("c"), TermAtom("d"),
        TermAtom("e")))
    // an already-negated neighbor keeps its polarity under AND
    val q = QueryParser.parse("x AND -y")
    assert(q.clauses.map(_.occur) == Seq(Must, MustNot))
    // lowercase and/or/not are plain terms (Lucene's convention)
    val r = QueryParser.parse("x and y")
    assert(r.clauses.map(_.atom) ==
      Seq(TermAtom("x"), TermAtom("and"), TermAtom("y")))
  }

  test("rejections: everything outside the subset fails loudly by name") {
    def bad(q: String, msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryParser.parse(q))
      assert(e.getMessage.toLowerCase.contains(msgPart.toLowerCase),
        s"'$q' -> ${e.getMessage}")
    }
    bad("(a b)", "parentheses")
    bad("{a TO b}", "range")
    bad("a^0", "positive integer")
    bad("a^1.5", "positive integer")
    bad("\"a b", "unbalanced quote")
    bad("a~3", "1 or 2")
    bad("a~x", "integer")
    bad("fu*zzy~1", "cannot combine")
    bad(":a", "bad field name")
    bad("f:", "no atom")
    bad("a:b:c", "multiple ':'")
    bad("++a", "doubled")
    bad("\"a b\"^2~1", "positive integer")
    bad("\"a b\"x", "follow a phrase")
    bad("*", "matches everything")
    bad("AND a", "clause on both sides")
    bad("a AND", "clause on both sides")
    bad("a NOT", "dangling NOT")
    bad("NOT NOT a", "followed by a clause")
    bad("NOT +a", "cannot combine")
    bad("-a -b", "all-negative")
    bad("", "empty query")
    // overflow headroom: the split computes w*(m div 1e6) with clause
    // subtotals bounded by 16 expansion terms x ~2.2e16 micros, so
    // the boost factor caps at 16
    bad("a^17", "cap of 16")
    assert(QueryParser.parse("a^16").clauses.head.boostMicros == 16000000L)
  }

  test("every clause's postings read is bucket-pruned to its own terms") {
    buildStores()
    val res = LexicalStore.searchQueryString(spark,
      "+alpha title:gamma^2 \"alpha beta\" -banned",
      fields = Map("body" -> bodyP, "title" -> titleP),
      defaultField = "body", positional = Map("body" -> posP))
    res.collect()
    // postings scans only — the `_stats`/`_vocab`/`_tombstones`
    // sidecars are metadata-sized and legitimately unpartitioned
    val scans = PlanScans.leafScans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists { p =>
        p.toString.contains("test_qp_") && !p.toString.contains("/_")
      })
    assert(scans.nonEmpty, "expected layout scans in the parsed plan")
    // every layout scan carries a bucket partition filter — no clause
    // reads a whole postings table (the searchTopKLexical discipline,
    // clause by clause)
    scans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "bucket")),
        s"unpruned scan in parsed-query plan: $sc")
    }
  }

  // ---- executor routing equivalences ----------------------------------

  private val bodyP = "/root/repo/target/test_qp_body"
  private val titleP = "/root/repo/target/test_qp_title"
  private val posP = "/root/repo/target/test_qp_pos"

  private def buildStores(): Unit = {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta alpha slowpoke"),
      (3L, "beta gamma delta epsilon"),
      (4L, "alpha gamma banned epsilon"),
      (5L, "gamma delta beta alpha")).toDF("doc_id", "text")
    val titles = Seq(
      (1L, "alpha"), (2L, "gamma"), (3L, "gamma"), (4L, "delta"),
      (5L, "alpha")).toDF("doc_id", "text")
    LexicalStore.buildOnce(spark, docs, bodyP)
    LexicalStore.buildOnce(spark, titles, titleP)
    LexicalStore.buildPositionalOnce(spark, docs, posP)
  }

  private def run(q: String, k: Int = 10): Seq[(Long, Int, Long)] =
    LexicalStore.searchQueryString(spark, q,
      fields = Map("body" -> bodyP, "title" -> titleP),
      defaultField = "body", positional = Map("body" -> posP), k = k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("pure-OR query scores exactly like searchTopKLexical") {
    buildStores()
    val want = LexicalStore.searchTopKLexical(spark, bodyP,
        Seq("alpha", "gamma"), 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run("alpha gamma") == want)
  }

  test("+/-/should query scores exactly like searchBoolean") {
    buildStores()
    val want = LexicalStore.searchBoolean(spark, bodyP,
        must = Seq("alpha", "beta"), should = Seq("gamma"),
        mustNot = Seq("banned"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run("+alpha +beta gamma -banned") == want)
    // AND spelling routes identically
    assert(run("alpha AND beta gamma NOT banned") == want)
  }

  test("phrase clause gates on adjacency; slop loosens it in order") {
    buildStores()
    // "alpha beta": docs 1 and 2 adjacent; doc 5 has beta BEFORE
    // alpha (order matters even at slop); doc 4 lacks beta
    val exact = run("\"alpha beta\"")
    assert(exact.map(_._1).toSet == Set(1L, 2L), exact.toString)
    // gamma..alpha within gap 1 IN ORDER: doc 4 (gamma banned alpha?
    // no - gamma..epsilon) -> check doc 5 "gamma delta beta alpha":
    // gap gamma->alpha = 2; slop 2 admits it, slop 1 does not
    assert(run("\"gamma alpha\"~2").map(_._1).toSet == Set(5L))
    // slop 1 matches nothing: the should-only query has an empty
    // candidate union and returns an empty page, not an error
    assert(run("\"gamma alpha\"~1").isEmpty)
  }

  test("boost floors at the clause subtotal; field routes to its layout") {
    buildStores()
    // title:alpha^3 over the title layout: docs 1 and 5 have title
    // alpha; boost triples the subtotal via the split
    val got = run("title:alpha^3").map(t => t._1 -> t._3).toMap
    val base = run("title:alpha").map(t => t._1 -> t._3).toMap
    assert(got.keySet == Set(1L, 5L) && base.keySet == Set(1L, 5L))
    got.foreach { case (d, m) =>
      val s = base(d)
      assert(m == 3000000L * (s / 1000000L)
          + (3000000L * (s % 1000000L)) / 1000000L,
        s"doc $d: $m vs base $s")
    }
  }

  test("executor rejections: unknown field, phrase without positional, " +
      "unknown default field") {
    buildStores()
    val e1 = intercept[RuntimeException](run("nosuch:alpha"))
    assert(e1.getMessage.contains("unknown field"), e1.getMessage)
    val e2 = intercept[RuntimeException] {
      LexicalStore.searchQueryString(spark, "\"alpha beta\"",
        fields = Map("body" -> bodyP), defaultField = "body")
    }
    assert(e2.getMessage.contains("positional layout"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      LexicalStore.searchQueryString(spark, "alpha",
        fields = Map("body" -> bodyP), defaultField = "nope")
    }
    assert(e3.getMessage.contains("defaultField"), e3.getMessage)
  }

  test("phrase clauses degrade under analyzed layouts: a stopword-" +
      "reduced phrase becomes a term clause, an all-stopword one drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "merge the stream"), (2L, "stream only here"),
      (3L, "nothing relevant")).toDF("doc_id", "text")
    val bp = "/root/repo/target/test_qp_eng_body"
    val pp = "/root/repo/target/test_qp_eng_pos"
    LexicalStore.build(spark, docs, bp,
      analyzer = LexicalStore.AnalyzerEnglish)
    LexicalStore.buildPositional(spark, docs, pp,
      analyzer = LexicalStore.AnalyzerEnglish)
    def eng(q: String) = LexicalStore.searchQueryString(spark, q,
      fields = Map("body" -> bp), defaultField = "body",
      positional = Map("body" -> pp))
      .collect().map(_.getLong(0)).toSet
    // "the merge" folds to one token -> a TERM clause (Lucene's
    // stopword-reduced PhraseQuery degrade), matching both merge docs
    assert(eng("\"the merge\"") == Set(1L))
    // an all-stopword phrase DROPS; the surviving should clause serves
    assert(eng("\"the of\" stream") == Set(1L, 2L))
    // ...but a query where EVERY clause folds away fails loudly
    val e = intercept[IllegalArgumentException] {
      LexicalStore.searchQueryString(spark, "\"the of\"",
        fields = Map("body" -> bp), defaultField = "body",
        positional = Map("body" -> pp))
    }
    assert(e.getMessage.contains("folded away"), e.getMessage)
  }

  test("segmented layouts are rejected loudly at entry") {
    import spark.implicits._
    val sp = "/root/repo/target/test_qp_seg"
    val fs = new org.apache.hadoop.fs.Path(sp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sp), true)
    LexicalStore.appendLexicalSegment(spark,
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), sp)
    val e = intercept[IllegalArgumentException] {
      LexicalStore.searchQueryString(spark, "alpha",
        fields = Map("body" -> sp), defaultField = "body")
    }
    assert(e.getMessage.contains("segmented layout"), e.getMessage)
  }

  test("no-must query requires at least one should match (msm=1)") {
    buildStores()
    // epsilon-only docs (3, 4) match nothing of the should set below
    val got = run("alpha delta -banned")
    // candidates = docs with alpha OR delta, minus banned (doc 4):
    // 1, 2, 3, 5
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 5L), got.toString)
  }
}
