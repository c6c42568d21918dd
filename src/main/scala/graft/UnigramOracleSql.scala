package graft

import graft.ops.Text

/** DuckDB oracle SQL for the unigram-LM tokenizer family
  * (q319/q320/q321) — the full Viterbi-EM training replayed verbatim,
  * the q141/Lloyd fixed-unroll convention applied to a DP:
  *
  *  - piece costs are Text.lg64's EXACT integer 64·log2 (msb exponent
  *    via a powers-of-two join, 6 fractional bits via the same
  *    truncating fixed-point squaring recurrence) — no float log ever
  *    enters a comparison, so Spark and DuckDB derive identical costs;
  *  - each Viterbi E-step is the DP unrolled BY POSITION: CTE d_i
  *    holds each word's single best state at position i (argmin over
  *    the ≤ maxLen predecessor cells by (cost, pieces, start) — the
  *    UnigramEncode tie order), with the segmentation carried as a
  *    '|'-joined string so no backtracking pass is needed. The unroll
  *    horizon is Text.UniMaxWordLen; a longer word would drop from
  *    the oracle side and fail the hash gate loudly;
  *  - every d_i / model / count CTE is MATERIALIZED — the DP chain
  *    references each d_i up to maxLen times and DuckDB inlines CTEs
  *    per reference, which would otherwise re-expand the whole prefix
  *    exponentially (the q250 materialization discipline).
  *
  * Shared constants come FROM Text so the two sides cannot drift.
  */
object UnigramOracleSql {
  private val L      = Text.UniMaxPieceLen
  private val W      = Text.UniMaxWordLen
  private val Seed   = Text.UniSeedSize
  private val Target = Text.UniVocabTarget
  private val Unk    = Text.UniUnkCost
  private val TopK   = Text.UniTopK

  /** 64·log2(n) as CTE `$name($key, lg)` over `$src($key, n)` —
    * mirror of Text.lg64: e = msb, y normalized to [2²⁰, 2²¹), six
    * square-compare-halve steps with truncating shifts. 2097152 =
    * 2²¹. The msb comes from a pw JOIN + group-by, and nothing here is
    * MATERIALIZED: DuckDB's materialized-CTE execution of bodies with
    * correlated/scalar subqueries over other CTEs OOMed (observed this
    * round) — plain CTEs referenced once or twice inline safely. */
  private[graft] def lgCte(name: String, src: String, key: String,
                    keyRef: String): String = {
    // each step is its own nested subquery LAYER: DuckDB 1.0.0 expands
    // a lateral column alias by COPYING its defining expression into
    // every reference, so a 6-step alias chain (3 references per step)
    // blows up to a ~3⁶-node expression tree (measured: 24 s to bind
    // 65 rows, OOM inside a materialized CTE). A layer's column is a
    // real column — no duplication.
    val base =
      s"""SELECT $key, n, max(p) AS e
              FROM $src CROSS JOIN pw
              WHERE (CAST(1 AS BIGINT) << CAST(p AS INT)) <= n
              GROUP BY $keyRef, n"""
    val y0 =
      s"SELECT *, CASE WHEN e >= 20 THEN n >> (e - 20) ELSE n << (20 - e) END AS y0 FROM ($base)"
    val chain = (1 to 6).foldLeft(y0) { (inner, i) =>
      val t = s"SELECT *, (y${i - 1} * y${i - 1}) >> 20 AS t$i FROM ($inner)"
      s"""SELECT *, CASE WHEN t$i >= 2097152 THEN 1 ELSE 0 END AS b$i,
          CASE WHEN t$i >= 2097152 THEN t$i >> 1 ELSE t$i END AS y$i FROM ($t)"""
    }
    s"""$name AS (
      SELECT $keyRef, e * 64 + b1*32 + b2*16 + b3*8 + b4*4 + b5*2 + b6 AS lg
      FROM ($chain))"""
  }

  /** Cost model `$m(piece, cost)` from a count CTE `$cc(piece, c)`:
    * add-one smoothing, cost = lg64(Σ(c+1)) − lg64(c+1). The one-row
    * total lg joins in by CROSS JOIN (no scalar subquery — see
    * lgCte's materialization note). */
  private def costCtes(m: String, cc: String): String =
    s"""${m}_t AS (SELECT CAST(sum(c + 1) AS BIGINT) AS n FROM $cc),
    ${lgCte(s"${m}_lt", s"${m}_t", "1 AS one", "one")},
    ${m}_pn AS (SELECT piece, CAST(c + 1 AS BIGINT) AS n FROM $cc),
    ${lgCte(s"${m}_lg", s"${m}_pn", "piece", "piece")},
    $m AS MATERIALIZED (
      SELECT g.piece, lt.lg - g.lg AS cost
      FROM ${m}_lg g CROSS JOIN ${m}_lt lt)"""

  /** One Viterbi E-step under model `$m`: CTEs `${tag}d0..dW`,
    * `${tag}fin(w, wc, k, seg)`, `${tag}tok(w, wc, piece)`,
    * `${tag}cnt(piece, c)`. */
  private def viterbiCtes(tag: String, m: String): String = {
    val ds = (1 to W).map { i =>
      val srcs = (math.max(0, i - L) until i)
        .map(j => s"SELECT * FROM ${tag}d$j").mkString(" UNION ALL ")
      s"""${tag}d$i AS MATERIALIZED (
      SELECT w, wc, n, $i AS pos, cost, k, seg FROM (
        SELECT d.w, d.wc, d.n,
          d.cost + COALESCE(mm.cost, $Unk) AS cost,
          d.k + 1 AS k,
          d.seg || '|' || substr(d.w, d.pos + 1, $i - d.pos) AS seg,
          d.pos AS j
        FROM ($srcs) d
        LEFT JOIN $m mm ON mm.piece = substr(d.w, d.pos + 1, $i - d.pos)
        WHERE d.n >= $i AND (mm.piece IS NOT NULL OR $i - d.pos = 1))
      QUALIFY row_number() OVER (PARTITION BY w ORDER BY cost, k, j) = 1)"""
    }.mkString(",\n    ")
    val fins = (1 to W).map(i => s"SELECT * FROM ${tag}d$i")
      .mkString(" UNION ALL ")
    s"""${tag}d0 AS (SELECT w, wc, length(w) AS n, 0 AS pos,
        CAST(0 AS BIGINT) AS cost, 0 AS k, '' AS seg FROM words),
    $ds,
    ${tag}fin AS MATERIALIZED (
      SELECT w, wc, k, seg FROM ($fins) WHERE pos = n),
    ${tag}tok AS (SELECT w, wc,
      unnest(string_split(substr(seg, 2), '|')) AS piece FROM ${tag}fin),
    ${tag}cnt AS MATERIALIZED (
      SELECT piece, CAST(sum(wc) AS BIGINT) AS c FROM ${tag}tok
      GROUP BY piece)"""
  }

  /** Prune `$cc` to the target vocab ∪ all single chars (count 0 if
    * unused) — mirror of unigramTrain's dedup(top ∪ chars). */
  private def pruneCte(name: String, cc: String): String =
    s"""$name AS MATERIALIZED (
      SELECT piece, CAST(max(c) AS BIGINT) AS c FROM (
        SELECT piece, c FROM (
          SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
          FROM $cc) WHERE rk <= $Target
        UNION ALL
        SELECT ch.piece, COALESCE(cc2.c, 0) FROM chars ch
        LEFT JOIN $cc cc2 USING (piece))
      GROUP BY piece)"""

  /** The shared training chain: words → seed model m1 → E1 → pruned
    * m2 → E2 → pruned final m3c, plus m3's cost model for the apply
    * replay. */
  private val trainChain: String =
    s"""words AS MATERIALIZED (
      SELECT word AS w, CAST(count(*) AS BIGINT) AS wc
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word),
    pw AS (SELECT unnest(range(0, 63)) AS p),
    poss AS (SELECT unnest(range(1, ${W + 1})) AS s),
    lens AS (SELECT unnest(range(1, ${L + 1})) AS l),
    subp AS (SELECT substr(w, CAST(s AS INT), CAST(l AS INT)) AS piece, wc
             FROM words CROSS JOIN poss CROSS JOIN lens
             WHERE s + l - 1 <= length(w)),
    seedc AS MATERIALIZED (
      SELECT piece, CAST(sum(wc) AS BIGINT) AS c FROM subp GROUP BY piece),
    chars AS MATERIALIZED (SELECT piece FROM seedc WHERE length(piece) = 1),
    m1c AS (SELECT piece, c FROM (
      SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
      FROM seedc) WHERE rk <= $Seed OR length(piece) = 1),
    ${costCtes("m1", "m1c")},
    ${viterbiCtes("e1", "m1")},
    ${pruneCte("m2c", "e1cnt")},
    ${costCtes("m2", "m2c")},
    ${viterbiCtes("e2", "m2")},
    ${pruneCte("m3c", "e2cnt")},
    ${costCtes("m3", "m3c")}"""

  private val q319Sql: String =
    s"""WITH $trainChain
    SELECT CAST(row_number() OVER (ORDER BY c DESC, piece ASC) AS INT) AS rank,
           piece, c AS cnt
    FROM m3c"""

  private val q320Sql: String =
    s"""WITH $trainChain,
    ${viterbiCtes("ap", "m3")}
    SELECT token, cnt FROM (
      SELECT piece AS token, c AS cnt,
             row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
      FROM apcnt) WHERE rk <= $TopK"""

  private val q321Sql: String =
    s"""WITH $trainChain,
    ${viterbiCtes("ap", "m3")},
    lw AS (SELECT lang, word AS w, CAST(count(*) AS BIGINT) AS wc
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                 FROM documents)
           WHERE word <> '' GROUP BY lang, word)
    SELECT l.lang,
      CAST(sum(l.wc) AS BIGINT) AS n_words,
      CAST(sum(l.wc * f.k) AS BIGINT) AS n_tokens,
      CAST((10000 * sum(l.wc * f.k)) // sum(l.wc) AS BIGINT) AS fertility_bp,
      CAST((10000 * sum(l.wc * length(l.w))) // sum(l.wc * f.k) AS BIGINT)
        AS chars_per_token_bp
    FROM lw l JOIN apfin f ON f.w = l.w
    GROUP BY l.lang"""

  val all: Map[String, String] = Map(
    "q319_unigram_train"     -> q319Sql,
    "q320_unigram_apply"     -> q320Sql,
    "q321_unigram_fertility" -> q321Sql)
}
