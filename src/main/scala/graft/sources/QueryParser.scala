package graft.sources

/** Driver-side compiler for a documented Lucene-QueryParser subset
  * (reference: Lucene's classic QueryParser syntax, app-level search
  * boxes everywhere) — the q223 discipline applied to a whole query
  * language: parse what the engine's verbs can honor EXACTLY, reject
  * everything else loudly by name. The output AST routes to
  * [[LexicalStore.searchParsed]], which executes each clause through
  * the existing verb internals (one fold per clause, the multi-term
  * analysis-chain bypass for dictionary atoms, integer-exact scoring
  * everywhere).
  *
  * Supported grammar (whitespace-separated clauses; parsing is pure
  * string work on the driver — query-sized, no Spark):
  *
  * {{{
  * query    := clause+                    with AND / OR / NOT between
  * clause   := [+|-] [field ':'] atom ['^' posint]
  * atom     := '"' word+ '"' ['~' nonnegint]   -- phrase [slop]
  *           | word '*'                        -- trailing-star prefix
  *           | word '~' [1|2]                  -- fuzzy (default 2)
  *           | word-with-*-or-?                -- wildcard (glob)
  *           | word                            -- plain term
  * }}}
  *
  * Semantics (documented here once; the executor cites this):
  * `+`/`AND` mark clauses MUST, `-`/`NOT` mark MUST_NOT, everything
  * else is SHOULD (Lucene's defaults). `AND` promotes BOTH neighbors
  * to MUST unless a neighbor is already MUST_NOT (`a AND NOT b` = +a
  * -b, Lucene's reading); `OR` asserts its neighbors exist and marks
  * nothing. With ≥1 MUST clause, SHOULD clauses only add score; with
  * none, a candidate must match ≥1 SHOULD clause (minShouldMatch=1
  * implicit — [[LexicalStore.searchBoolean]]'s exact rule). `^n`
  * boosts with POSITIVE INTEGER weights only (n·1e6 micros — the
  * engine's exact-integer contract; fractional boosts are rejected,
  * scale the other clauses up instead).
  *
  * Rejected loudly (outside the honorable subset): grouping parens,
  * fractional or zero boosts, fuzzy distance > 2 (Lucene's own cap),
  * range/regexp syntax (`[a TO b]`, `/re/` — use searchRegexp
  * directly), bare operators, unbalanced quotes, `:` with an empty
  * field or body, and a query whose clauses are all MUST_NOT
  * (nothing would score — Lucene rejects pure-negative queries too).
  */
object QueryParser {

  sealed trait Occur
  case object Must extends Occur
  case object Should extends Occur
  case object MustNot extends Occur

  sealed trait Atom
  /** A single term, analyzed under the target field's chain. */
  final case class TermAtom(text: String) extends Atom
  /** Quoted phrase; slop 0 = exact adjacency ([[LexicalStore.searchPhrase]]),
    * slop > 0 = ordered span with ≤slop gap ([[LexicalStore.searchSpanNear]]). */
  final case class PhraseAtom(words: Seq[String], slop: Int) extends Atom
  /** Trailing-star prefix — [[LexicalStore.searchPrefix]]'s expansion. */
  final case class PrefixAtom(prefix: String) extends Atom
  /** General `*`/`?` pattern — [[LexicalStore.searchGlob]]'s expansion. */
  final case class WildcardAtom(pattern: String) extends Atom
  /** `word~d` — [[LexicalStore.searchFuzzy]]'s distance-ranked rewrite. */
  final case class FuzzyAtom(term: String, maxDist: Int) extends Atom

  final case class Clause(occur: Occur, field: Option[String], atom: Atom,
                          boostMicros: Long)

  final case class Parsed(clauses: Seq[Clause]) {
    require(clauses.nonEmpty, "query has no clauses")
    require(clauses.exists(_.occur != MustNot),
      "query is all-negative — nothing would score (add a scoring clause)")
  }

  private val FieldRx = "[A-Za-z_][A-Za-z0-9_]*".r

  def parse(query: String): Parsed = {
    val raw = lex(query)
    require(raw.nonEmpty, s"empty query '$query'")
    // pass 1: NOT consumes the following clause token
    sealed trait Item
    case class Op(name: String) extends Item
    case class Cl(clause: Clause) extends Item
    val items = scala.collection.mutable.ArrayBuffer.empty[Item]
    var i = 0
    while (i < raw.length) {
      raw(i) match {
        case "AND" | "OR" => items += Op(raw(i)); i += 1
        case "NOT" =>
          require(i + 1 < raw.length, "dangling NOT at end of query")
          require(raw(i + 1) != "AND" && raw(i + 1) != "OR" && raw(i + 1) != "NOT",
            s"NOT must be followed by a clause, got '${raw(i + 1)}'")
          val c = parseClause(raw(i + 1))
          require(c.occur == Should,
            s"NOT cannot combine with +/- on '${raw(i + 1)}'")
          items += Cl(c.copy(occur = MustNot)); i += 2
        case tok => items += Cl(parseClause(tok)); i += 1
      }
    }
    // pass 2: AND promotes both neighbors to MUST (MustNot wins);
    // OR only asserts its neighbors exist
    val arr = items.toArray
    arr.zipWithIndex.foreach {
      case (Op(name), j) =>
        require(j > 0 && j < arr.length - 1 &&
            arr(j - 1).isInstanceOf[Cl] && arr(j + 1).isInstanceOf[Cl],
          s"$name needs a clause on both sides")
        if (name == "AND") Seq(j - 1, j + 1).foreach { n =>
          arr(n) match {
            case Cl(c) if c.occur == Should => arr(n) = Cl(c.copy(occur = Must))
            case _ => ()
          }
        }
      case _ => ()
    }
    Parsed(arr.collect { case Cl(c) => c }.toIndexedSeq)
  }

  /** Whitespace split that keeps a quoted phrase (with its attached
    * prefix/field/suffixes) as one token. */
  private def lex(q: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    q.foreach { c =>
      if (c == '"') { inQ = !inQ; sb += c }
      else if (c.isWhitespace && !inQ) {
        if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      } else sb += c
    }
    require(!inQ, s"unbalanced quote in query '$q'")
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  private def parseClause(tok0: String): Clause = {
    require(!tok0.exists(c => c == '(' || c == ')'),
      s"grouping parentheses are outside the supported subset: '$tok0'")
    require(!tok0.exists(c => c == '{' || c == '}'),
      s"range syntax is outside the supported subset: '$tok0'")
    var tok = tok0
    val occur =
      if (tok.startsWith("+")) { tok = tok.drop(1); Must }
      else if (tok.startsWith("-")) { tok = tok.drop(1); MustNot }
      else Should
    require(!tok.startsWith("+") && !tok.startsWith("-"),
      s"doubled +/- prefix on '$tok0'")
    // field prefix: name ':' with the name outside any quote
    val (field, body0) = tok.indexOf(':') match {
      case -1 => (None, tok)
      case c if tok.indexOf('"') >= 0 && tok.indexOf('"') < c => (None, tok)
      case c =>
        val f = tok.take(c)
        require(FieldRx.pattern.matcher(f).matches(),
          s"bad field name '$f' in '$tok0'")
        val rest = tok.drop(c + 1)
        require(rest.nonEmpty, s"field '$f:' has no atom in '$tok0'")
        require(!rest.contains(':'),
          s"multiple ':' in '$tok0' — one field prefix per clause")
        (Some(f), rest)
    }
    // boost suffix: rightmost '^' outside the quote
    val (body1, boost) = body0.lastIndexOf('^') match {
      case -1 => (body0, 1000000L)
      case c if body0.indexOf('"', c) >= 0 =>
        throw new IllegalArgumentException(
          s"'^' inside a phrase in '$tok0' — boost goes after the closing quote")
      case c =>
        val n = body0.drop(c + 1)
        require(n.nonEmpty && n.forall(_.isDigit) && n.toLong > 0,
          s"boost must be a positive integer in '$tok0', got '^$n' " +
            "(fractional boosts are outside the integer-exact contract)")
        // overflow headroom, computed on the per-CLAUSE subtotal: an
        // expansion clause sums up to maxExpansions = 16 per-term
        // contributions, each inside the engine's standing ~2.2e16
        // micros bound, so m ≤ 3.5e17 and the split's first term
        // w·(m div 1e6) needs n·1e6·3.5e11 < 2^63 — n ≤ 26. Cap at
        // 16 for margin; real relevance boosts are single digits.
        require(n.toLong <= 16,
          s"boost ^$n exceeds the cap of 16 in '$tok0' — larger " +
            "factors overflow the exact-integer scoring headroom " +
            "(16-term expansion clause × 2.2e16 micros × n·1e6 must " +
            "stay under 2^63)")
        (body0.take(c), n.toLong * 1000000L)
    }
    require(body1.nonEmpty, s"empty atom in '$tok0'")
    val atom: Atom =
      if (body1.startsWith("\"")) {
        // "phrase" or "phrase"~slop
        val close = body1.indexOf('"', 1)
        require(close > 0, s"unterminated phrase in '$tok0'")
        val tail = body1.drop(close + 1)
        val slop = if (tail.isEmpty) 0 else {
          require(tail.startsWith("~") && tail.drop(1).nonEmpty &&
              tail.drop(1).forall(_.isDigit),
            s"only '~slop' may follow a phrase, got '$tail' in '$tok0'")
          tail.drop(1).toInt
        }
        val words = body1.substring(1, close).split("\\s+")
          .filter(_.nonEmpty).toIndexedSeq
        require(words.nonEmpty, s"empty phrase in '$tok0'")
        if (words.size == 1) TermAtom(words.head) // Lucene: "a" == a
        else PhraseAtom(words, slop)
      } else body1.lastIndexOf('~') match {
        case -1 => wordAtom(body1, tok0)
        case c =>
          val t = body1.take(c)
          val dStr = body1.drop(c + 1)
          require(t.nonEmpty, s"'~' with no term in '$tok0'")
          require(!t.exists(ch => ch == '*' || ch == '?'),
            s"fuzzy and wildcard cannot combine in '$tok0'")
          val d = if (dStr.isEmpty) 2 else {
            require(dStr.forall(_.isDigit),
              s"fuzzy distance must be an integer in '$tok0'")
            dStr.toInt
          }
          require(d >= 1 && d <= 2,
            s"fuzzy distance must be 1 or 2 (Lucene's cap), got $d in '$tok0'")
          FuzzyAtom(t, d)
      }
    Clause(occur, field, atom, boost)
  }

  private def wordAtom(w: String, tok0: String): Atom = {
    require(!w.contains('"'), s"stray quote in '$tok0'")
    val stars = w.count(_ == '*')
    val quests = w.count(_ == '?')
    if (stars == 0 && quests == 0) TermAtom(w)
    else if (stars == 1 && quests == 0 && w.endsWith("*")) {
      require(w.length > 1, s"bare '*' matches everything — rejected ('$tok0')")
      PrefixAtom(w.dropRight(1))
    } else WildcardAtom(w) // searchGlob validates the pattern grammar
  }
}
