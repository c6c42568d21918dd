package graft

/** DuckDB oracle SQL for the BPE tokenizer pair (q141 train / q142
  * apply) — the round-10 unrolling that graduates both from
  * golden-pinned rows-only checks to full rows+schema+hash
  * verification, following the AnnOracleSql precedent (round 9's
  * integer-Lloyd unroll).
  *
  * Representation trick: each word is carried as a DOUBLE-SPACE-joined
  * symbol string with flanking double spaces — `"  s1  s2  ...  sn  "`.
  * Tokens are whitespace-split upstream, so a space can never occur
  * INSIDE a symbol, which makes the encoding unambiguous; and one
  * greedy `replace(rep, ' a  b ', ' ab ')` is then EXACTLY the
  * left-to-right non-overlapping scan of the native MergeAdjacent
  * expression: the single-space pattern edges anchor full-symbol
  * boundaries (so `b` cannot match a prefix of a longer symbol) while
  * leaving each occurrence's outer spaces in place (so back-to-back
  * occurrences `a b a b` still both merge, and an overlapping `a a a`
  * merges once — both matching MergeAdjacent's skip-ahead semantics).
  *
  * Training (q141) unrolls Text.bpeMerges' nMerges sequential rounds
  * into a CTE chain: t{i} = weighted adjacent-pair argmax with the
  * (count DESC, a ASC, b ASC) tie-break, w{i} = one replace() over
  * w{i-1}. Only the w{i} stages are AS MATERIALIZED: each w is consumed
  * twice (by t{i+1}'s pair scan and w{i+1}'s rewrite), and DuckDB
  * 1.0.0 otherwise INLINES the chain — doubling the plan per stage
  * into 2^30 scans ("too many open files"). The t{i} stages must stay
  * PLAIN: materializing a CTE that feeds both the chain and the q142
  * recursion silently planned the recursive term against an empty
  * pattern set in DuckDB 1.0.0 (recursion produced zero rows; found by
  * bisect while building this oracle), and plain t's inline linearly.
  *
  * Apply (q142) mirrors the native BpeEncode expression's
  * lowest-rank-first loop (NOT in-order merge application — later
  * merges can re-create earlier pairs, see BpeEncode's scaladoc) with
  * a recursive CTE: each step finds the lowest-rank pattern present
  * and replaces all its occurrences, terminating when none applies.
  * Pattern lookup is a pure list-lambda over one aggregated
  * list<struct{pat,repl}> ordered by rank (`list_filter(ps, ...)[1]`),
  * NOT a correlated EXISTS/scalar subquery — correlated subqueries
  * against the CTE chain also mis-evaluated inside the recursive term
  * on DuckDB 1.0.0 (dropped 21 of 31 word trajectories at sf0.001).
  * Terminal states are unique per word (step count strictly shrinks
  * the symbol string), so selecting no-pattern-applies rows from the
  * accumulated recursion yields exactly one row per input word.
  */
object BpeOracleSql {

  /** Shared with the Spark side (Text.q141/q142) so the unrolled CTE
    * count can never drift from the trained merge count. */
  val NMerges = graft.ops.Text.BpeMergeCount
  val TopK    = graft.ops.Text.BpeTopK

  /** w0: the weighted word-count table as symbol strings — mirror of
    * bpeMerges' tokenize+count+split head (string_split on ' ' is the
    * pinned whitespace branch of Cols.tokens, exact for the pure-ASCII
    * driver corpus; length>0 filter mirrored as word <> ''). */
  private val w0 =
    """w0 AS MATERIALIZED (
  SELECT '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS rep,
         CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word)"""

  /** The unrolled training chain: w0, t1, w1, ..., tN, wN. */
  private def chainCtes: Seq[String] =
    w0 +: (1 to NMerges).flatMap { i =>
      val p = i - 1
      val t =
        s"""t$i AS (
  SELECT a, b, CAST(sum(wc) AS BIGINT) AS n FROM (
    SELECT syms[j] AS a, syms[j+1] AS b, wc FROM (
      SELECT syms, wc, unnest(range(1, len(syms))) AS j FROM (
        SELECT list_filter(string_split(rep, '  '), x -> x <> '') AS syms, wc FROM w$p)))
  GROUP BY a, b ORDER BY n DESC, a ASC, b ASC LIMIT 1)"""
      val w =
        s"""w$i AS MATERIALIZED (
  SELECT replace(w.rep, ' ' || t.a || '  ' || t.b || ' ', ' ' || t.a || t.b || ' ') AS rep, w.wc
  FROM w$p w CROSS JOIN t$i t)"""
      Seq(t, w)
    }

  /** q141: the merge table (rank, left, right, merged, pair_count). */
  def q141: String = {
    val union = (1 to NMerges).map { i =>
      s"""SELECT CAST($i AS INTEGER) AS rank, a AS "left", b AS "right", a || b AS merged, n AS pair_count FROM t$i"""
    }.mkString("\nUNION ALL ")
    "WITH " + chainCtes.mkString(",\n") + "\n" + union + "\nORDER BY rank"
  }

  /** q142: token distribution under the learned merges (token, cnt). */
  def q142: String = {
    val pats = (1 to NMerges).map { i =>
      s"SELECT $i AS rank, ' ' || a || '  ' || b || ' ' AS pat, ' ' || a || b || ' ' AS repl FROM t$i"
    }.mkString("\nUNION ALL ")
    "WITH RECURSIVE " + chainCtes.mkString(",\n") +
      s""",
pats AS ($pats),
pl AS MATERIALIZED (
  SELECT list(struct_pack(pat := pat, repl := repl) ORDER BY rank) AS ps FROM pats),
enc AS (
  SELECT rep, wc FROM w0
  UNION ALL
  SELECT replace(e.rep, e.h[1].pat, e.h[1].repl) AS rep, e.wc
  FROM (SELECT rep, wc, list_filter(ps, s -> strpos(rep, s.pat) > 0) AS h
        FROM enc CROSS JOIN pl) e
  WHERE len(e.h) > 0)
SELECT token, cnt FROM (
  SELECT token, CAST(sum(wc) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(string_split(rep, '  '), x -> x <> '')) AS token, wc
    FROM enc CROSS JOIN pl
    WHERE len(list_filter(ps, s -> strpos(rep, s.pat) > 0)) = 0)
  GROUP BY token)
ORDER BY cnt DESC, token ASC LIMIT $TopK"""
  }

  /** q229: per-language fertility — the q142 recursive encode carrying
    * a (lang, wlen) tag per word row (trajectories are word-determined,
    * so a word shared by two languages simply runs twice; terminal
    * states stay unique per (lang, word)), then the per-lang
    * tokens-per-word / chars-per-token integer ratios. The TRAINING
    * chain stays global (corpus-wide merges, exactly the q141 table). */
  def q229: String = {
    val pats = (1 to NMerges).map { i =>
      s"SELECT $i AS rank, ' ' || a || '  ' || b || ' ' AS pat, ' ' || a || b || ' ' AS repl FROM t$i"
    }.mkString("\nUNION ALL ")
    "WITH RECURSIVE " + chainCtes.mkString(",\n") +
      s""",
pats AS ($pats),
pl AS MATERIALIZED (
  SELECT list(struct_pack(pat := pat, repl := repl) ORDER BY rank) AS ps FROM pats),
lw0 AS MATERIALIZED (
  SELECT lang, '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS rep,
         CAST(length(word) AS BIGINT) AS wlen,
         CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY lang, word),
enc AS (
  SELECT lang, rep, wlen, wc FROM lw0
  UNION ALL
  SELECT e.lang, replace(e.rep, e.h[1].pat, e.h[1].repl) AS rep, e.wlen, e.wc
  FROM (SELECT lang, rep, wlen, wc, list_filter(ps, s -> strpos(rep, s.pat) > 0) AS h
        FROM enc CROSS JOIN pl) e
  WHERE len(e.h) > 0),
fin AS (
  SELECT lang, wc, wlen,
         CAST(len(list_filter(string_split(rep, '  '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM enc CROSS JOIN pl
  WHERE len(list_filter(ps, s -> strpos(rep, s.pat) > 0)) = 0)
SELECT lang, CAST(sum(wc) AS BIGINT) AS n_words,
  CAST(sum(wc * n_tok) AS BIGINT) AS n_tokens,
  CAST(10000 * sum(wc * n_tok) // sum(wc) AS BIGINT) AS fertility_bp,
  CAST(10000 * sum(wc * wlen) // sum(wc * n_tok) AS BIGINT) AS chars_per_token_bp
FROM fin GROUP BY lang"""
  }

  /** q235: greedy-vs-optimal gap — the q229-style recursive greedy
    * encode carrying (lang, word), joined to a SECOND recursion: the
    * shortest-segmentation DP as reachability over positions (state
    * (word, pos, steps); edges advance pos by any inventory token
    * matching at pos; single corpus characters are the base alphabet,
    * merge products a||b from the training chain the learned tokens).
    * UNION-dedup bounds states by |word|² per word, and min(steps) at
    * pos = len(word) is the DP optimum. dw/alltoks stay PLAIN (the
    * materialize-into-recursion DuckDB 1.0.0 trap documented above). */
  def q235: String = {
    val pats = (1 to NMerges).map { i =>
      s"SELECT $i AS rank, ' ' || a || '  ' || b || ' ' AS pat, ' ' || a || b || ' ' AS repl FROM t$i"
    }.mkString("\nUNION ALL ")
    val toks = (1 to NMerges).map(i => s"SELECT a || b AS t FROM t$i")
      .mkString("\nUNION ALL ")
    "WITH RECURSIVE " + chainCtes.mkString(",\n") +
      s""",
pats AS ($pats),
pl AS MATERIALIZED (
  SELECT list(struct_pack(pat := pat, repl := repl) ORDER BY rank) AS ps FROM pats),
lw AS MATERIALIZED (
  SELECT lang, word, '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS rep,
         CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY lang, word),
enc AS (
  SELECT lang, word, rep, wc FROM lw
  UNION ALL
  SELECT e.lang, e.word, replace(e.rep, e.h[1].pat, e.h[1].repl) AS rep, e.wc
  FROM (SELECT lang, word, rep, wc, list_filter(ps, s -> strpos(rep, s.pat) > 0) AS h
        FROM enc CROSS JOIN pl) e
  WHERE len(e.h) > 0),
g AS (
  SELECT lang, word, wc,
         CAST(len(list_filter(string_split(rep, '  '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM enc CROSS JOIN pl
  WHERE len(list_filter(ps, s -> strpos(rep, s.pat) > 0)) = 0),
dw AS (SELECT DISTINCT word FROM lw),
alltoks AS (
  SELECT t FROM ($toks)
  UNION
  SELECT DISTINCT unnest(string_split(word, '')) AS t FROM dw),
seg AS (
  SELECT word, 0 AS pos, 0 AS steps FROM dw
  UNION
  SELECT s.word, s.pos + length(a.t) AS pos, s.steps + 1 AS steps
  FROM seg s JOIN alltoks a ON substr(s.word, s.pos + 1, length(a.t)) = a.t
  WHERE s.pos < length(s.word)),
opt AS (SELECT word, CAST(min(steps) AS BIGINT) AS n_opt FROM seg
        WHERE pos = length(word) GROUP BY 1)
SELECT g.lang, CAST(sum(g.wc) AS BIGINT) AS n_words,
  CAST(sum(g.wc * g.n_tok) AS BIGINT) AS n_greedy,
  CAST(sum(g.wc * o.n_opt) AS BIGINT) AS n_opt,
  CAST(10000 * (sum(g.wc * g.n_tok) - sum(g.wc * o.n_opt)) // sum(g.wc * o.n_opt) AS BIGINT) AS overhead_bp
FROM g JOIN opt o USING (word) GROUP BY g.lang"""
  }

  /** q313: compression at every merge-count prefix — each sweep point
    * reads the training chain's OWN corpus state w_m (the symbolized
    * corpus after merges 1..m; prefix-closure means w_m IS the
    * m-merge tokenizer's output, the same equivalence the q141/q142
    * pair pins), so the whole curve costs one chain materialization. */
  def q313(sweep: Seq[Int]): String = {
    val legs = sweep.map { m =>
      s"""SELECT CAST($m AS BIGINT) AS n_merges,
  CAST(sum(wc) AS BIGINT) AS n_words,
  CAST(sum(wc * len(list_filter(string_split(rep, '  '), x -> x <> '')))
    AS BIGINT) AS n_tokens,
  CAST(sum(wc * length(replace(rep, ' ', ''))) AS BIGINT) AS n_chars,
  CAST((10000 * sum(wc * len(list_filter(string_split(rep, '  '), x -> x <> ''))))
    // sum(wc) AS BIGINT) AS fertility_bp,
  CAST((10000 * sum(wc * length(replace(rep, ' ', ''))))
    // sum(wc * len(list_filter(string_split(rep, '  '), x -> x <> '')))
    AS BIGINT) AS chars_per_token_bp
  FROM w$m"""
    }.mkString("\nUNION ALL ")
    "WITH " + chainCtes.mkString(",\n") + "\n" + legs
  }

  /** Oracle unroll horizon for the q351 greedy scan: each step
    * consumes ≥ 1 character, so WpMaxSteps positions cover any word
    * the corpus contract admits (q43: max 8 chars; a longer word's
    * trajectory would stop short and fail the hash gate LOUDLY — the
    * UniMaxWordLen convention). */
  val WpMaxSteps = 12

  /** q351: WordPiece (greedy longest-match-first) token distribution
    * under the q141-learned piece inventory — mirror of the native
    * WordPieceEncode expression, unrolled BY POSITION (the Viterbi
    * oracle convention): each step LEFT-joins the multi-char piece
    * table on a prefix match at the cursor, keeps the LONGEST match
    * (row_number over match length; the single-char fallback is the
    * NULL branch), advances the cursor, and appends to a '|'-joined
    * segmentation string. One row per word per step — no recursion,
    * no correlated subqueries (the DuckDB 1.0.0 traps the q142
    * recursion documents). */
  def q351: String = {
    val vocabUnion = (1 to NMerges)
      .map(i => s"SELECT a || b AS piece FROM t$i").mkString(" UNION ALL ")
    val steps = (1 to WpMaxSteps).map { k =>
      s"""s$k AS (SELECT word, wc, pos, acc FROM (
  SELECT w.word, w.wc,
    CASE WHEN w.pos > length(w.word) THEN w.pos
         WHEN v.piece IS NULL THEN w.pos + 1
         ELSE w.pos + length(v.piece) END AS pos,
    CASE WHEN w.pos > length(w.word) THEN w.acc
         WHEN v.piece IS NULL THEN w.acc || '|' || substr(w.word, CAST(w.pos AS INT), 1)
         ELSE w.acc || '|' || v.piece END AS acc,
    row_number() OVER (PARTITION BY w.word
      ORDER BY CASE WHEN v.piece IS NULL THEN 0 ELSE length(v.piece) END DESC) AS rn
  FROM s${k - 1} w LEFT JOIN vm v
    ON w.pos <= length(w.word)
   AND v.piece = substr(w.word, CAST(w.pos AS INT), CAST(length(v.piece) AS INT)))
  WHERE rn = 1)"""
    }.mkString(",\n")
    "WITH " + chainCtes.mkString(",\n") +
      s""",
vm AS MATERIALIZED (SELECT DISTINCT piece FROM ($vocabUnion)),
s0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS wc, 1 AS pos, '' AS acc
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
$steps
SELECT token, CAST(sum(wc) AS BIGINT) AS cnt FROM (
  SELECT unnest(list_filter(string_split(acc, '|'), x -> x <> '')) AS token, wc
  FROM s$WpMaxSteps)
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT $TopK"""
  }

  def all: Map[String, String] = Map(
    "q141_bpe_vocab"      -> q141,
    "q142_bpe_tokenize"   -> q142,
    "q229_bpe_fertility"  -> q229,
    "q235_seg_gap"        -> q235,
    "q313_bpe_merge_curve" -> q313(graft.ops.Text.BpeMergeSweep),
    "q351_wordpiece"      -> q351)
}
