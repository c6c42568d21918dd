package graft

import graft.ops.Similarity

/** DuckDB oracle SQL for every k-means-derived operator — the round-9
  * payoff of moving quantizer training and cell assignment onto the
  * integer fixed-point grid (Similarity.QuantScale): training is now an
  * UNROLLED pure-integer recurrence (TrainIters = 2 Lloyd rounds) that
  * DuckDB replays exactly — same MD5-ordered sample, same seeds, same
  * argmin-L2 assignments with the same (distance, cell) tie-break, same
  * floor-division mean updates — so q61/q62/q63/q91/q95/q114/q144/q145/
  * q168/q170 graduate from golden-pinned rows-only checks to full
  * rows+schema+hash verification against an independent engine. Floats
  * appear only in SCORING (cosine), bp-discretized at the output
  * boundary exactly as the long-oracled q60 does.
  *
  * Every fragment mirrors a specific Scala definition (named in each
  * builder); the shared constants come FROM Similarity so the two sides
  * cannot drift silently.
  */
object AnnOracleSql {

  private val S = Similarity.QuantScale // 16384 = 2^14
  private val SampleN = Similarity.TrainSampleN
  private val Iters = Similarity.TrainIters

  /** DuckDB mirror of graft.functions.Md5Hash64 as a SIGNED long (the
    * hashSample order key): md5_number_upper reinterpreted two's-
    * complement. */
  private def md5Signed(c: String): String =
    s"""CAST(CASE WHEN md5_number_upper(CAST($c AS VARCHAR)) >= 9223372036854775808::HUGEINT
       THEN md5_number_upper(CAST($c AS VARCHAR))::HUGEINT - 18446744073709551616::HUGEINT
       ELSE md5_number_upper(CAST($c AS VARCHAR))::HUGEINT END AS BIGINT)"""

  /** Quantize a float-list SQL expression onto the grid (mirror of
    * Similarity.quantizeVal: floor(x·2¹⁴) — float→double widening and
    * the power-of-two multiply are IEEE-exact in both engines). */
  private def quant(e: String): String =
    s"list_transform($e, x -> CAST(floor(CAST(x AS DOUBLE) * $S) AS BIGINT))"

  /** Integer squared L2 between two BIGINT[] expressions (mirror of
    * QuantCellOrder's distance loop). */
  private def l2q(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), t -> ($a[t] - $b[t]) * ($a[t] - $b[t])))"

  private def bpS(e: String): String =
    s"CAST(floor(($e) * 10000 + 0.5) AS BIGINT)"

  /** Cosine between two float-list expressions, mirroring
    * CosineSimilarity's double accumulation (the q60-established
    * cross-engine equivalence). */
  private def cosS(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** Grid centroid (BIGINT[]) dequantized to the exact DOUBLE[] the
    * Spark side's grid floats widen to. */
  private def dequant(c: String): String =
    s"list_transform($c, x -> x / $S.0)"

  /** The unrolled integer Lloyd trainer (mirror of
    * Similarity.trainCentroids): CTEs ending in `cents(cell, c)` where
    * c is the quantized BIGINT[] centroid after `Iters` rounds.
    * `pred` restricts the TRAINING corpus (q168's even-id half). */
  private def trainCtes(k: Int, pred: String = "TRUE"): String = {
    val h = md5Signed("vec_id")
    val head =
      s"""samp AS (
      SELECT row_number() OVER (ORDER BY $h, vec_id) AS rn,
             ${quant("embedding")} AS qe
      FROM embeddings WHERE $pred QUALIFY rn <= $SampleN),
    dimt AS (SELECT unnest(range(1, len(qe)+1)) AS t FROM (SELECT qe FROM samp LIMIT 1)),
    c0 AS (SELECT CAST(rn - 1 AS INT) AS cell, qe AS c FROM samp WHERE rn <= $k)"""
    val iters = (1 to Iters).map { i =>
      val prev = s"c${i - 1}"
      s"""a$i AS (
      SELECT s.rn, s.qe, c.cell, ${l2q("s.qe", "c.c")} AS d
      FROM samp s CROSS JOIN $prev c),
    b$i AS (
      SELECT rn, qe, cell FROM a$i
      QUALIFY row_number() OVER (PARTITION BY rn ORDER BY d, cell) = 1),
    u$i AS (
      SELECT b.cell, d.t, CAST(sum(b.qe[d.t]) AS BIGINT) AS sv, count(*) AS n
      FROM b$i b CROSS JOIN dimt d GROUP BY b.cell, d.t),
    v$i AS (
      SELECT cell, list(CAST((sv - (((sv % n) + n) % n)) // n AS BIGINT) ORDER BY t) AS c
      FROM u$i GROUP BY cell),
    c$i AS (
      SELECT p.cell, COALESCE(v.c, p.c) AS c
      FROM $prev p LEFT JOIN v$i v USING (cell))"""
    }
    val all = (head +: iters).mkString(",\n    ")
    s"$all,\n    cents AS (SELECT cell, c FROM c$Iters)"
  }

  /** Corpus-wide cell assignment (mirror of bestCellId): `asg(vec_id,
    * embedding, qe, cell)` — argmin integer L2, ties to the lower
    * cell. `pred` restricts the ASSIGNED corpus (q375's post-erasure
    * survivors; the quantizer may still have trained on everything). */
  private val assignCtes: String = assignCtesOver("TRUE")

  private def assignCtesOver(pred: String): String =
    s"""qv AS (SELECT vec_id, embedding, ${quant("embedding")} AS qe
           FROM embeddings WHERE $pred),
    ad AS (SELECT q.vec_id, q.embedding, q.qe, c.cell, ${l2q("q.qe", "c.c")} AS d
           FROM qv q CROSS JOIN cents c),
    asg AS (SELECT vec_id, embedding, qe, cell FROM ad
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1)"""

  /** IVF probe + exact-cosine rank (mirror of ivfTopK's probe/score
    * stages on top of `cents` + `asg`). */
  private def ivfProbeSql(probes: Int, topK: Int, numQueries: Int): String =
    ivfProbeSqlWhere(probes, topK, s"vec_id < $numQueries")

  private def ivfProbeSqlWhere(probes: Int, topK: Int,
                               qPred: String): String =
    s"""qq AS (SELECT vec_id AS query_id, embedding, qe FROM qv WHERE $qPred),
    qd AS (SELECT q.query_id, q.embedding, c.cell, ${l2q("q.qe", "c.c")} AS d
           FROM qq q CROSS JOIN cents c),
    pr AS (SELECT query_id, embedding, cell FROM qd
           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, cell) <= $probes),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             ${cosS("p.embedding", "a.embedding")} AS cos
             FROM pr p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
          FROM cand)
    SELECT query_id, rank, neighbor_id, ${bpS("cos")} AS cos_bp FROM r WHERE rank <= $topK"""

  private def ivfOracle(cells: Int, pred: String = "TRUE"): String =
    s"""WITH ${trainCtes(cells, pred)},
    $assignCtes,
    ${ivfProbeSql(Similarity.IvfProbes, Similarity.TopK, Similarity.NumQueries)}"""

  /** q375 erasure replay: quantizer trained on the FULL corpus (the
    * frozen model the index was built with), cells re-assigned over
    * the SURVIVORS only (the even ids — exactly what
    * deleteFromIvfIndex leaves), survivor queries (the q366
    * convention). */
  private def ivfEraseOracle(cells: Int): String =
    s"""WITH ${trainCtes(cells)},
    ${assignCtesOver("vec_id % 2 = 0")},
    ${ivfProbeSqlWhere(Similarity.IvfProbes, Similarity.TopK,
      s"vec_id % 2 = 0 AND vec_id < ${2 * Similarity.NumQueries}")}"""

  /** q302 sweep leg: (nprobe, query_id, neighbor_id) of the IVF top-k
    * at every nprobe in `sweep`, scored ONCE at max(sweep) probes with
    * the probe rank retained (mirror of ivfProbeCurve's single-pass
    * prefix slicing). A complete SELECT for CTE embedding. */
  def ivfSweepSql(cells: Int, sweep: Seq[Int], topK: Int,
                  numQueries: Int): String = {
    val maxP = sweep.max
    val pts = sweep.mkString(", ")
    s"""WITH ${trainCtes(cells)},
    $assignCtes,
    qq AS (SELECT vec_id AS query_id, embedding, qe FROM qv WHERE vec_id < $numQueries),
    qd AS (SELECT q.query_id, q.embedding, c.cell, ${l2q("q.qe", "c.c")} AS d
           FROM qq q CROSS JOIN cents c),
    pr AS (SELECT query_id, embedding, cell,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS INT) AS probe_rank
           FROM qd
           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, cell) <= $maxP),
    cand AS (SELECT p.query_id, p.probe_rank, a.vec_id AS neighbor_id,
             ${cosS("p.embedding", "a.embedding")} AS cos
             FROM pr p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id),
    pts AS (SELECT unnest([$pts]) AS nprobe),
    sw AS (SELECT pts.nprobe, c.query_id, c.neighbor_id, c.cos
           FROM cand c CROSS JOIN pts WHERE c.probe_rank <= pts.nprobe
           QUALIFY row_number() OVER (PARTITION BY pts.nprobe, c.query_id
             ORDER BY c.cos DESC, c.neighbor_id ASC) <= $topK)
    SELECT nprobe, query_id, neighbor_id FROM sw"""
  }

  /** q91 clusterCells: per-cell count, fixed-point mean cosine to the
    * assigned centroid, min/max member id. */
  private val q91Sql: String =
    s"""WITH ${trainCtes(16)},
    $assignCtes,
    coh AS (SELECT a.cell, a.vec_id,
            ${bpS(cosS("a.embedding", dequant("c.c")))} AS cb
            FROM asg a JOIN cents c USING (cell))
    SELECT cell, count(*) AS n_members,
      CAST(floor(CAST(sum(cb) AS DOUBLE) / count(*)) AS BIGINT) AS mean_cos_bp,
      min(vec_id) AS min_id, max(vec_id) AS max_id
    FROM coh GROUP BY cell"""

  /** q95 diversity sample: md5-hex quota cut inside each trained cell. */
  private val q95Sql: String =
    s"""WITH ${trainCtes(16)},
    $assignCtes
    SELECT cell, rn, vec_id FROM (
      SELECT cell, vec_id,
             CAST(row_number() OVER (PARTITION BY cell
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS rn
      FROM asg)
    WHERE rn <= 8"""

  private val Tau = Similarity.SemTau

  /** q114 SemDeDup: intra-cell pairs with cosine ≥ τ drop the higher
    * id; kept rows survive. */
  private val q114Sql: String =
    s"""WITH ${trainCtes(16)},
    $assignCtes,
    dropped AS (SELECT DISTINCT b.vec_id
                FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
                WHERE ${cosS("a.embedding", "b.embedding")} >= $Tau)
    SELECT a.vec_id, a.cell FROM asg a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)"""

  /** q189 persisted-SemDeDup-store apply: quantizer trained on the
    * even-id half (the store build), kept = even-half SemDeDup
    * survivors, then every odd-id vector flagged against the kept
    * representatives of its cell (dup_store) and against earlier
    * odd-id vectors in its cell (dup_batch). Mirrors
    * Similarity.writeSemDedupStore + semDedupApply. */
  private val q189Sql: String =
    s"""WITH ${trainCtes(16, "vec_id % 2 = 0")},
    $assignCtes,
    oldk AS (SELECT vec_id, embedding, cell FROM asg WHERE vec_id % 2 = 0),
    odrop AS (SELECT DISTINCT b.vec_id
              FROM oldk a JOIN oldk b ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE ${cosS("a.embedding", "b.embedding")} >= $Tau),
    okept AS (SELECT * FROM oldk WHERE vec_id NOT IN (SELECT vec_id FROM odrop)),
    newb AS (SELECT vec_id, embedding, cell FROM asg WHERE vec_id % 2 = 1),
    ds AS (SELECT DISTINCT n.vec_id
           FROM newb n JOIN okept o ON o.cell = n.cell
           WHERE ${cosS("n.embedding", "o.embedding")} >= $Tau),
    db AS (SELECT DISTINCT b.vec_id
           FROM newb a JOIN newb b ON a.cell = b.cell AND a.vec_id < b.vec_id
           WHERE ${cosS("a.embedding", "b.embedding")} >= $Tau)
    SELECT n.vec_id, n.cell,
      CAST(CASE WHEN ds.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS dup_store,
      CAST(CASE WHEN db.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS dup_batch,
      CAST(CASE WHEN ds.vec_id IS NULL AND db.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
    FROM newb n LEFT JOIN ds ON ds.vec_id = n.vec_id
    LEFT JOIN db ON db.vec_id = n.vec_id"""

  // ---- PQ (q63 / q145) ----

  private val PqM = Similarity.PqM
  private val PqK = Similarity.PqK

  /** Unrolled per-subspace integer Lloyd (mirror of trainPqCodebook):
    * ends in `cb(sub, j, c)` — quantized BIGINT[] centroids per
    * subspace. ds = dim/m derives in SQL from the sample row. */
  private def pqTrainCtes: String = {
    val h = md5Signed("vec_id")
    val iters = Similarity.PqIters
    val head =
      s"""samp AS (
      SELECT row_number() OVER (ORDER BY $h, vec_id) AS rn,
             ${quant("embedding")} AS qe
      FROM embeddings QUALIFY rn <= $SampleN),
    meta AS (SELECT len(qe) // $PqM AS ds FROM (SELECT qe FROM samp LIMIT 1)),
    subs AS (SELECT unnest(range(0, $PqM)) AS sub),
    sv AS (SELECT s.rn, b.sub,
           list_transform(range(1, m.ds + 1), t -> s.qe[b.sub * m.ds + t]) AS v
           FROM samp s CROSS JOIN subs b CROSS JOIN meta m),
    dst AS (SELECT unnest(range(1, ds + 1)) AS t FROM meta),
    p0 AS (SELECT sub, CAST(rn - 1 AS INT) AS j, v AS c FROM sv WHERE rn <= $PqK)"""
    val steps = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""pa$i AS (
      SELECT s.rn, s.sub, s.v, c.j, ${l2q("s.v", "c.c")} AS d
      FROM sv s JOIN $prev c ON c.sub = s.sub),
    pb$i AS (
      SELECT rn, sub, v, j FROM pa$i
      QUALIFY row_number() OVER (PARTITION BY rn, sub ORDER BY d, j) = 1),
    pu$i AS (
      SELECT b.sub, b.j, d.t, CAST(sum(b.v[d.t]) AS BIGINT) AS svv, count(*) AS n
      FROM pb$i b CROSS JOIN dst d GROUP BY b.sub, b.j, d.t),
    pv$i AS (
      SELECT sub, j, list(CAST((svv - (((svv % n) + n) % n)) // n AS BIGINT) ORDER BY t) AS c
      FROM pu$i GROUP BY sub, j),
    p$i AS (
      SELECT p.sub, p.j, COALESCE(v.c, p.c) AS c
      FROM $prev p LEFT JOIN pv$i v ON v.sub = p.sub AND v.j = p.j)"""
    }
    val all = (head +: steps).mkString(",\n    ")
    s"$all,\n    cb AS (SELECT sub, j, c FROM p$iters)"
  }

  /** PQ ADC sweep + exact rerank (mirror of pqTopK with PqCodeQ /
    * PqTableQ / PqAdcQ): per-subspace integer-L2 code assignment, long
    * ADC dots, shortlist by (adc desc, neighbor asc) with the
    * corpus-scaled rerank bound, exact-cosine top-k. */
  private val pqSql: String =
    s"""WITH $pqTrainCtes,
    qv AS (SELECT vec_id, embedding, ${quant("embedding")} AS qe FROM embeddings),
    nn AS (SELECT GREATEST(${Similarity.PqRerank}, LEAST(count(*) // 6, 65536)) AS rerank FROM embeddings),
    csub AS (SELECT q.vec_id, b.sub,
             list_transform(range(1, m.ds + 1), t -> q.qe[b.sub * m.ds + t]) AS v
             FROM qv q CROSS JOIN (SELECT unnest(range(0, $PqM)) AS sub) b CROSS JOIN meta m),
    cd AS (SELECT s.vec_id, s.sub, c.j, ${l2q("s.v", "c.c")} AS d
           FROM csub s JOIN cb c ON c.sub = s.sub),
    code AS (SELECT vec_id, sub, j FROM cd
             QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, j) = 1),
    qq AS (SELECT vec_id AS query_id, embedding, qe FROM qv WHERE vec_id < ${Similarity.NumQueries}),
    qsub AS (SELECT q.query_id, b.sub,
             list_transform(range(1, m.ds + 1), t -> q.qe[b.sub * m.ds + t]) AS v
             FROM qq q CROSS JOIN (SELECT unnest(range(0, $PqM)) AS sub) b CROSS JOIN meta m),
    tbl AS (SELECT s.query_id, s.sub, c.j,
            list_sum(list_transform(range(1, len(s.v)+1), t -> s.v[t] * c.c[t])) AS dot
            FROM qsub s JOIN cb c ON c.sub = s.sub),
    adc AS (SELECT t.query_id, k.vec_id AS neighbor_id, CAST(sum(t.dot) AS BIGINT) AS adc
            FROM code k JOIN tbl t ON t.sub = k.sub AND t.j = k.j
            WHERE k.vec_id <> t.query_id
            GROUP BY t.query_id, k.vec_id),
    short AS (SELECT query_id, neighbor_id FROM adc CROSS JOIN nn
              QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) <= rerank),
    scored AS (SELECT s.query_id, s.neighbor_id,
               ${cosS("q.embedding", "c.embedding")} AS cos
               FROM short s
               JOIN qq q ON q.query_id = s.query_id
               JOIN qv c ON c.vec_id = s.neighbor_id),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
    SELECT query_id, rank, neighbor_id, ${bpS("cos")} AS cos_bp FROM r WHERE rank <= ${Similarity.TopK}"""

  // ---- IVF-PQ residual (q317/q318) ----

  /** IVFADC replay (mirror of Similarity.ivfPqTopK): coarse Lloyd +
    * corpus assignment (the shared trainCtes/assignCtes), residuals
    * rq = qe − cents[cell] (exact integers — the grid-float residual
    * Spark feeds PQ requantizes to exactly these), the per-subspace
    * Lloyd unrolled over SAMPLED residuals (r-prefixed twins of
    * pqTrainCtes' CTEs), then per query: nearest-`probes` cells with
    * routing distance d = ‖q−c‖², per-cell query-residual dot tables,
    * and the exact ADC L2 identity d + ‖r̂‖² − 2·(q−c)·r̂ ranking the
    * probed candidates; corpus-scaled shortlist, exact-cosine top-k. */
  private def ivfPqSql: String = {
    val cells = Similarity.IvfCells
    val probes = Similarity.IvfProbes
    val iters = Similarity.PqIters
    val h = md5Signed("vec_id")
    val steps = (1 to iters).map { i =>
      val prev = s"rp${i - 1}"
      s"""rpa$i AS (
      SELECT s.rn, s.sub, s.v, c.j, ${l2q("s.v", "c.c")} AS d
      FROM rsv s JOIN $prev c ON c.sub = s.sub),
    rpb$i AS (
      SELECT rn, sub, v, j FROM rpa$i
      QUALIFY row_number() OVER (PARTITION BY rn, sub ORDER BY d, j) = 1),
    rpu$i AS (
      SELECT b.sub, b.j, d.t, CAST(sum(b.v[d.t]) AS BIGINT) AS svv, count(*) AS n
      FROM rpb$i b CROSS JOIN rdst d GROUP BY b.sub, b.j, d.t),
    rpv$i AS (
      SELECT sub, j, list(CAST((svv - (((svv % n) + n) % n)) // n AS BIGINT) ORDER BY t) AS c
      FROM rpu$i GROUP BY sub, j),
    rp$i AS (
      SELECT p.sub, p.j, COALESCE(v.c, p.c) AS c
      FROM $prev p LEFT JOIN rpv$i v ON v.sub = p.sub AND v.j = p.j)"""
    }.mkString(",\n    ")
    s"""WITH ${trainCtes(cells)},
    $assignCtes,
    res AS MATERIALIZED (
      SELECT a.vec_id, a.embedding, a.cell,
             list_transform(range(1, len(a.qe)+1), t -> a.qe[t] - c.c[t]) AS rq
      FROM asg a JOIN cents c USING (cell)),
    rsamp AS (
      SELECT row_number() OVER (ORDER BY $h, vec_id) AS rn, rq
      FROM res QUALIFY rn <= $SampleN),
    rmeta AS (SELECT len(rq) // $PqM AS ds FROM (SELECT rq FROM rsamp LIMIT 1)),
    rsubs AS (SELECT unnest(range(0, $PqM)) AS sub),
    rsv AS (SELECT s.rn, b.sub,
            list_transform(range(1, m.ds + 1), t -> s.rq[b.sub * m.ds + t]) AS v
            FROM rsamp s CROSS JOIN rsubs b CROSS JOIN rmeta m),
    rdst AS (SELECT unnest(range(1, ds + 1)) AS t FROM rmeta),
    rp0 AS (SELECT sub, CAST(rn - 1 AS INT) AS j, v AS c FROM rsv WHERE rn <= $PqK),
    $steps,
    rcb AS MATERIALIZED (SELECT sub, j, c FROM rp$iters),
    csub AS (SELECT r.vec_id, r.cell, b.sub,
             list_transform(range(1, m.ds + 1), t -> r.rq[b.sub * m.ds + t]) AS v
             FROM res r CROSS JOIN rsubs b CROSS JOIN rmeta m),
    cd AS (SELECT s.vec_id, s.cell, s.sub, c.j, ${l2q("s.v", "c.c")} AS d
           FROM csub s JOIN rcb c ON c.sub = s.sub),
    code AS MATERIALIZED (SELECT vec_id, cell, sub, j FROM cd
             QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, j) = 1),
    cwn AS (SELECT sub, j,
            CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS nrm
            FROM rcb),
    rnorm AS (SELECT k.vec_id, CAST(sum(w.nrm) AS BIGINT) AS rn2
              FROM code k JOIN cwn w ON w.sub = k.sub AND w.j = k.j
              GROUP BY k.vec_id),
    nn AS (SELECT GREATEST(${Similarity.PqRerank}, LEAST(count(*) // 6, 65536)) AS rerank FROM embeddings),
    qq AS (SELECT vec_id AS query_id, embedding, qe FROM qv
           WHERE vec_id < ${Similarity.NumQueries}),
    qcd AS (SELECT q.query_id, q.embedding, q.qe, c.cell, c.c,
            ${l2q("q.qe", "c.c")} AS d
            FROM qq q CROSS JOIN cents c),
    pr AS MATERIALIZED (SELECT query_id, qe, cell, c, d FROM qcd
          QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, cell) <= $probes),
    qres AS (SELECT query_id, cell, d,
             list_transform(range(1, len(qe)+1), t -> qe[t] - c[t]) AS qrq
             FROM pr),
    qsub AS (SELECT q.query_id, q.cell, q.d, b.sub,
             list_transform(range(1, m.ds + 1), t -> q.qrq[b.sub * m.ds + t]) AS v
             FROM qres q CROSS JOIN rsubs b CROSS JOIN rmeta m),
    tbl AS MATERIALIZED (SELECT s.query_id, s.cell, s.d, s.sub, c.j,
         CAST(list_sum(list_transform(range(1, len(s.v)+1), t -> s.v[t] * c.c[t])) AS BIGINT) AS dot
         FROM qsub s JOIN rcb c ON c.sub = s.sub),
    adc AS (SELECT t.query_id, k.vec_id AS neighbor_id, t.d AS qd2,
            CAST(sum(t.dot) AS BIGINT) AS dotsum
            FROM code k JOIN tbl t ON t.cell = k.cell AND t.sub = k.sub AND t.j = k.j
            WHERE k.vec_id <> t.query_id
            GROUP BY t.query_id, k.vec_id, t.d),
    scorel AS (SELECT a.query_id, a.neighbor_id, a.qd2 + r.rn2 - 2 * a.dotsum AS adcl2
               FROM adc a JOIN rnorm r ON r.vec_id = a.neighbor_id),
    short AS (SELECT query_id, neighbor_id FROM scorel CROSS JOIN nn
              QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adcl2 ASC, neighbor_id ASC) <= rerank),
    scored AS (SELECT s.query_id, s.neighbor_id,
               ${cosS("q.embedding", "c.embedding")} AS cos
               FROM short s
               JOIN qq q ON q.query_id = s.query_id
               JOIN qv c ON c.vec_id = s.neighbor_id),
    rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
           FROM scored)
    SELECT query_id, rank, neighbor_id, ${bpS("cos")} AS cos_bp FROM rr WHERE rank <= ${Similarity.TopK}"""
  }

  // ---- LSH (q61) ----

  /** q61 lshTopK: the ±1 hyperplane weights are Scala-seeded constants,
    * EMBEDDED here as literal weight vectors per (table, bit); the sign
    * projection replays HyperplaneBuckets' double accumulation in index
    * order via a sequential list_reduce (left fold — same IEEE add
    * sequence). Candidates = same (table, bucket) under multiprobe
    * single-bit XOR flips on the query side; exact cosine rank on
    * candidates. */
  /** The shared LSH bucket CTE chain (planes → ev → proj → bkt):
    * hyperplane masks embedded as literal ±1 weight vectors, sign
    * projection via sequential list_reduce (the IEEE add order
    * HyperplaneBuckets uses). Used by q61 (candidate buckets) and q250
    * (the NN-Descent seed rings). */
  private val lshBucketCtes: String = {
    val bits = Similarity.LshBits
    val masks = Similarity.hyperplaneMasks
    val dim = 64
    val rows = masks.zipWithIndex.map { case (m, i) =>
      val t = i / bits; val b = i % bits
      val ws = (0 until dim).map(j =>
        if (((m >>> (j & 63)) & 1L) == 1L) "1" else "-1").mkString(",")
      s"($t, $b, [$ws])"
    }.mkString(",\n      ")
    s"""planes(t, b, w) AS (VALUES
      $rows),
    ev AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
    proj AS (SELECT e.vec_id, p.t, p.b,
             list_reduce(list_transform(range(1, ${dim + 1}),
               jj -> CAST(e.embedding[jj] AS DOUBLE) * p.w[jj]), (a, b) -> a + b) AS s
             FROM ev e CROSS JOIN planes p),
    bkt AS MATERIALIZED (SELECT vec_id, t,
            CAST(sum(CASE WHEN s >= 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bk
            FROM proj GROUP BY vec_id, t)"""
  }

  private val q61Sql: String = {
    val bits = Similarity.LshBits
    s"""WITH $lshBucketCtes,
    qb AS (SELECT DISTINCT k.vec_id AS query_id, k.t,
             CASE WHEN f.i = $bits THEN k.bk
                  ELSE xor(k.bk, CAST(1 << f.i AS BIGINT)) END AS bk
           FROM bkt k CROSS JOIN (SELECT unnest(range(0, ${bits + 1})) AS i) f
           WHERE k.vec_id < ${Similarity.NumQueries}),
    cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
             FROM qb q JOIN bkt c ON c.t = q.t AND c.bk = q.bk
             WHERE c.vec_id <> q.query_id),
    scored AS (SELECT cd.query_id, cd.neighbor_id,
               ${cosS("q.embedding", "c.embedding")} AS cos
               FROM cand cd
               JOIN ev q ON q.vec_id = cd.query_id
               JOIN ev c ON c.vec_id = cd.neighbor_id),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
    SELECT query_id, rank, neighbor_id, ${bpS("cos")} AS cos_bp FROM r WHERE rank <= ${Similarity.TopK}"""
  }

  /** q312: per-subspace PQ reconstruction distortion — min integer L2
    * to the trained codewords (mirror of pqDistortion's least() over
    * literal rows), norms on the same grid, ALL row sub = −1. */
  def pqDistortionSql: String =
    s"""WITH $pqTrainCtes,
    qv AS (SELECT vec_id, ${quant("embedding")} AS qe FROM embeddings),
    xv AS (SELECT q.vec_id, b.sub,
           list_transform(range(1, m.ds + 1), t -> q.qe[b.sub * m.ds + t]) AS v
           FROM qv q CROSS JOIN subs b CROSS JOIN meta m),
    dd AS (SELECT x.vec_id, x.sub, min(${l2q("x.v", "c.c")}) AS err
           FROM xv x JOIN cb c ON c.sub = x.sub GROUP BY 1, 2),
    nn AS (SELECT vec_id, sub,
           list_sum(list_transform(v, y -> y * y)) AS norm FROM xv),
    per AS (SELECT d.sub, d.err, n.norm
            FROM dd d JOIN nn n ON n.vec_id = d.vec_id AND n.sub = d.sub),
    bs AS (SELECT sub, count(*) AS n_vectors,
           sum(CAST(err AS HUGEINT)) AS sum_err,
           sum(CAST(norm AS HUGEINT)) AS sum_norm FROM per GROUP BY 1),
    al AS (SELECT CAST(-1 AS BIGINT) AS sub,
           sum(n_vectors) // ${Similarity.PqM} AS n_vectors,
           sum(sum_err) AS sum_err, sum(sum_norm) AS sum_norm FROM bs),
    u AS (SELECT CAST(sub AS BIGINT) AS sub, n_vectors, sum_err, sum_norm
          FROM bs UNION ALL SELECT sub, n_vectors, sum_err, sum_norm FROM al)
    SELECT sub, CAST(n_vectors AS BIGINT) AS n_vectors,
      CAST(sum_err AS BIGINT) AS sum_err,
      CAST(sum_err // n_vectors AS BIGINT) AS mse_q,
      CAST(CASE WHEN sum_norm = 0 THEN NULL
           ELSE (10000 * sum_err) // sum_norm END AS BIGINT)
        AS distortion_share_bp
    FROM u"""

  /** q311: per-vector max bp-cosine to any lower-id cell partner over
    * the trained cells, cut at every sweep τ (mirror of
    * semDedupSweep's one-pair-pass prefix discipline). */
  def semDedupSweepSql(cells: Int, taus: Seq[Int]): String =
    s"""WITH ${trainCtes(cells)},
    $assignCtes,
    ml AS (SELECT b.vec_id AS vid,
           max(${bpS(cosS("a.embedding", "b.embedding"))}) AS max_lower_bp
           FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
           GROUP BY 1),
    t AS (SELECT count(*) AS n_total FROM asg),
    pts AS (SELECT CAST(unnest([${taus.mkString(", ")}]) AS BIGINT) AS tau_bp),
    dr AS (SELECT pts.tau_bp, count(*) AS n_dropped
           FROM ml CROSS JOIN pts WHERE ml.max_lower_bp >= pts.tau_bp
           GROUP BY 1)
    SELECT pts.tau_bp, CAST(t.n_total AS BIGINT) AS n_total,
      CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
      CAST(t.n_total - coalesce(dr.n_dropped, 0) AS BIGINT) AS n_kept,
      CAST((10000 * coalesce(dr.n_dropped, 0)) // t.n_total AS BIGINT)
        AS drop_share_bp
    FROM pts LEFT JOIN dr USING (tau_bp) CROSS JOIN t"""

  /** q310 sweep leg: (n_tables, query_id, neighbor_id) of the LSH
    * top-k at every table count in `sweep`, scored ONCE with each
    * candidate's FIRST colliding table retained (mirror of
    * lshTableCurve's prefix slicing over the q61 bucket chain). */
  def lshSweepSql(sweep: Seq[Int]): String = {
    val bits = Similarity.LshBits
    val pts = sweep.mkString(", ")
    s"""WITH $lshBucketCtes,
    qb AS (SELECT DISTINCT k.vec_id AS query_id, k.t,
             CASE WHEN f.i = $bits THEN k.bk
                  ELSE xor(k.bk, CAST(1 << f.i AS BIGINT)) END AS bk
           FROM bkt k CROSS JOIN (SELECT unnest(range(0, ${bits + 1})) AS i) f
           WHERE k.vec_id < ${Similarity.NumQueries}),
    cd AS (SELECT q.query_id, c.vec_id AS neighbor_id, min(q.t) AS first_t
           FROM qb q JOIN bkt c ON c.t = q.t AND c.bk = q.bk
           WHERE c.vec_id <> q.query_id GROUP BY 1, 2),
    scored AS (SELECT cd.query_id, cd.neighbor_id, cd.first_t,
               ${cosS("q.embedding", "c.embedding")} AS cos
               FROM cd
               JOIN ev q ON q.vec_id = cd.query_id
               JOIN ev c ON c.vec_id = cd.neighbor_id),
    pts AS (SELECT unnest([$pts]) AS n_tables),
    sw AS (SELECT pts.n_tables, s.query_id, s.neighbor_id
           FROM scored s CROSS JOIN pts WHERE s.first_t < pts.n_tables
           QUALIFY row_number() OVER (PARTITION BY pts.n_tables, s.query_id
             ORDER BY s.cos DESC, s.neighbor_id ASC) <= ${Similarity.TopK})
    SELECT n_tables, query_id, neighbor_id FROM sw"""
  }

  /** The ten k-means/ANN oracles, keyed by query name. q144 and q170
    * are row-identical to q62 and q168 respectively by the persisted-
    * index contract (spec-pinned), so they share SQL. */
  /** q234 cross-split leakage: quantizer trained on the knuth train
    * split only (the q189 frozen-store discipline), both splits
    * assigned, intra-cell test×train pairs at cosine ≥ τ. */
  private val SplitPred = "((vec_id % 1000003) * 427799) % 1000003 % 10"
  private val q234Sql: String =
    s"""WITH ${trainCtes(16, s"$SplitPred < 8")},
    $assignCtes,
    tr AS (SELECT vec_id, embedding, cell FROM asg WHERE $SplitPred < 8),
    te AS (SELECT vec_id, embedding, cell FROM asg WHERE $SplitPred > 8)
    SELECT te.vec_id, CAST(count(*) AS BIGINT) AS n_leaks,
      CAST(max(${bpS(cosS("te.embedding", "tr.embedding"))}) AS BIGINT) AS max_sim_bp
    FROM te JOIN tr ON tr.cell = te.cell
    WHERE ${cosS("te.embedding", "tr.embedding")} >= $Tau
    GROUP BY te.vec_id"""

  /** q237 simplified silhouette: `ad` already holds every (vector,
    * cell) integer distance; a = the assigned cell's, b = the min over
    * the rest; per-vector bp once, per-cell integer mean. */
  private val q237Sql: String =
    s"""WITH ${trainCtes(16)},
    $assignCtes,
    j AS (SELECT g.vec_id, g.cell,
            max(CASE WHEN ad.cell = g.cell THEN ad.d END) AS da,
            min(CASE WHEN ad.cell <> g.cell THEN ad.d END) AS db
          FROM asg g JOIN ad ON ad.vec_id = g.vec_id GROUP BY 1, 2),
    sbp AS (SELECT cell, CASE WHEN greatest(da, db) = 0 THEN 0
              ELSE (10000 * (db - da)) // greatest(da, db) END AS s_bp FROM j)
    SELECT cell, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(s_bp) // count(*) AS BIGINT) AS mean_sil_bp
    FROM sbp GROUP BY cell"""

  /** q250 graph ANN: NN-Descent + beam walk replayed verbatim — the
    * seed graph from the q61 bucket rings (vid-ordered lead/lag), each
    * refinement round as (undirected ∪ neighbor-of-neighbor) proposals
    * pruned to top-M by (cos DESC, id ASC), each search hop as
    * expand → score → top-beam; cosine through the q60-established
    * list_cosine_similarity equivalence, bp only at the boundary. */
  private def q250SqlTail(tail: Int => String,
                          nodePred: String => String = _ => "TRUE",
                          qPred: String =
                            s"vec_id < ${Similarity.NumQueries}"): String = {
    val m = Similarity.NswM
    val rounds = Similarity.NswRounds
    val beam = Similarity.NswBeam
    val hops = Similarity.NswHops
    val seeds = Similarity.NswSeeds
    def adjCte(j: Int, src: String): String =
      s"""adj$j AS MATERIALIZED (SELECT vid, nbr, cos FROM (
           SELECT s.*, row_number() OVER (PARTITION BY vid ORDER BY cos DESC, nbr ASC) AS rn
           FROM $src s) WHERE rn <= $m)"""
    def scoreCte(name: String, pairs: String): String =
      s"""$name AS (SELECT p.vid, p.nbr, ${cosS("a.embedding", "b.embedding")} AS cos
           FROM $pairs p JOIN ev a ON a.vec_id = p.vid JOIN ev b ON b.vec_id = p.nbr)"""
    val roundCtes = (1 to rounds).map { r =>
      s"""und$r AS MATERIALIZED (SELECT DISTINCT vid, nbr FROM (
             SELECT vid, nbr FROM adj${r - 1} UNION ALL SELECT nbr, vid FROM adj${r - 1})),
         pr$r AS (SELECT DISTINCT vid, nbr FROM (
             SELECT a.vid, b.nbr FROM und$r a
             JOIN (SELECT vid, nbr FROM und$r) b ON b.vid = a.nbr
             UNION ALL SELECT vid, nbr FROM und$r) WHERE vid <> nbr),
         ${scoreCte(s"sc$r", s"pr$r")},
         ${adjCte(r, s"sc$r")}"""
    }.mkString(",\n    ")
    def beamCte(name: String, src: String): String =
      s"""$name AS MATERIALIZED (SELECT query_id, vid, cos FROM (
           SELECT s.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS rn
           FROM $src s) WHERE rn <= $beam)"""
    val hopCtes = (1 to hops).map { h =>
      s"""ex$h AS (SELECT DISTINCT f.query_id, a.nbr AS vid
             FROM f${h - 1} f JOIN adjw a ON a.vid = f.vid),
         sx$h AS (SELECT e.query_id, e.vid,
             ${cosS("q.qe", "c.embedding")} AS cos
             FROM ex$h e JOIN qs q USING (query_id) JOIN ev c ON c.vec_id = e.vid),
         mg$h AS (SELECT query_id, vid, max(cos) AS cos FROM (
             SELECT * FROM f${h - 1} UNION ALL SELECT * FROM sx$h) GROUP BY 1, 2),
         ${beamCte(s"f$h", s"mg$h")}"""
    }.mkString(",\n    ")
    s"""WITH $lshBucketCtes,
    ring AS (SELECT vec_id, t, bk,
             lead(vec_id, 1) OVER w AS n1, lead(vec_id, 2) OVER w AS n2,
             lag(vec_id, 1) OVER w AS p1, lag(vec_id, 2) OVER w AS p2
             FROM bkt WINDOW w AS (PARTITION BY t, bk ORDER BY vec_id)),
    sp AS (SELECT DISTINCT vec_id AS vid, nbr FROM (
             SELECT vec_id, unnest([n1, n2, p1, p2]) AS nbr FROM ring)
           WHERE nbr IS NOT NULL AND nbr <> vec_id),
    ${scoreCte("sc0", "sp")},
    ${adjCte(0, "sc0")},
    $roundCtes,
    adjw AS (SELECT vid, nbr, cos FROM adj$rounds
           WHERE ${nodePred("vid")} AND ${nodePred("nbr")}),
    qs AS (SELECT vec_id AS query_id, embedding AS qe FROM ev
           WHERE $qPred),
    entry AS (SELECT vec_id AS vid FROM ev WHERE ${nodePred("vec_id")}
           ORDER BY vec_id LIMIT $seeds),
    f0s AS (SELECT q.query_id, e.vid, ${cosS("q.qe", "c.embedding")} AS cos
            FROM qs q CROSS JOIN entry e JOIN ev c ON c.vec_id = e.vid),
    ${beamCte("f0", "f0s")},
    $hopCtes,
    ${tail(hops)}"""
  }

  private val q250Sql: String = q250SqlTail(hops =>
    s"""fin AS (SELECT query_id, vid, cos,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS INT) AS rank
            FROM f$hops WHERE vid <> query_id)
    SELECT query_id, rank, vid AS neighbor_id, ${bpS("cos")} AS cos_bp
    FROM fin WHERE rank <= ${Similarity.TopK}""")

  /** q367 SQ8 scalar-quantization distortion: per-dim grid min/max,
    * the 255-step code and its dequantization by exact idiv, per-dim
    * + ALL error rollups — mirrors Similarity.sq8Distortion cell for
    * cell. */
  private val q367Sql: String =
    s"""WITH qv AS (SELECT vec_id, ${quant("embedding")} AS q FROM embeddings),
    qi AS (SELECT u.i - 1 AS i, qv.q[u.i] AS xq
           FROM qv, unnest(range(1, len(qv.q) + 1)) AS u(i)),
    rng AS (SELECT i, min(xq) AS mn, max(xq) AS mx FROM qi GROUP BY 1),
    cd AS (SELECT qi.i, qi.xq, r.mn, r.mx,
        CASE WHEN r.mx = r.mn THEN 0
             ELSE ((qi.xq - r.mn) * 255) // (r.mx - r.mn) END AS code
      FROM qi JOIN rng r USING (i)),
    dq AS (SELECT i, xq,
        mn + CASE WHEN mx = mn THEN 0
                  ELSE (code * (mx - mn)) // 255 END AS dv FROM cd),
    bd AS (SELECT i, count(*) AS n,
        sum(CAST(xq - dv AS HUGEINT) * (xq - dv)) AS se,
        sum(CAST(xq AS HUGEINT) * xq) AS sn FROM dq GROUP BY 1),
    wa AS (SELECT * FROM bd UNION ALL
      SELECT -1, sum(n), sum(se), sum(sn) FROM bd)
    SELECT CAST(i AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
      CAST(se AS BIGINT) AS sum_err_q,
      CAST(se // n AS BIGINT) AS mse_q,
      CAST(CASE WHEN sn = 0 THEN NULL
           ELSE (10000 * se) // sn END AS BIGINT) AS err_share_bp
    FROM wa"""

  /** q366 probe after erasure: the identical build, the adjacency
    * filtered to surviving (even) nodes/neighbors, entry seeds and
    * queries drawn from the survivors, the same walk — the replay of
    * [[graft.ops.Similarity.deleteFromNswIndex]] followed by the
    * standard serve. Byte-equality proves deletion is deterministic
    * and leak-free (no odd id can appear on either side). */
  private val q366Sql: String = q250SqlTail(hops =>
    s"""fin AS (SELECT query_id, vid, cos,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS INT) AS rank
            FROM f$hops WHERE vid <> query_id)
    SELECT query_id, rank, vid AS neighbor_id, ${bpS("cos")} AS cos_bp
    FROM fin WHERE rank <= ${Similarity.TopK}""",
    nodePred = c => s"$c % 2 = 0",
    qPred = s"vec_id % 2 = 0 AND vec_id < ${2 * Similarity.NumQueries}")

  /** q358 filtered graph serve: the identical build + walk, but the
    * final rank runs over the predicate-passing subset of EVERY node
    * the walk scored (entry scores f0s plus each hop's expansion
    * scores sx1..sxH, deduped by max cos) — the engine's
    * beamWalkScoredSet contract replayed verbatim, label equality
    * joined from the embeddings table. */
  private val q358Sql: String = q250SqlTail { hops =>
    val unions = (1 to hops)
      .map(h => s"UNION ALL SELECT query_id, vid, cos FROM sx$h")
      .mkString("\n            ")
    s"""allv AS (SELECT query_id, vid, max(cos) AS cos FROM (
            SELECT query_id, vid, cos FROM f0s
            $unions) GROUP BY 1, 2),
    fin AS (SELECT a.query_id, a.vid, a.cos,
            CAST(row_number() OVER (PARTITION BY a.query_id ORDER BY a.cos DESC, a.vid ASC) AS INT) AS rank
            FROM allv a
            JOIN embeddings cl ON cl.vec_id = a.vid
            JOIN embeddings ql ON ql.vec_id = a.query_id
            WHERE a.vid <> a.query_id AND cl.label = ql.label)
    SELECT query_id, rank, vid AS neighbor_id, ${bpS("cos")} AS cos_bp
    FROM fin WHERE rank <= ${Similarity.TopK}"""
  }

  /** q336 layered (HNSW) graph serve — the q250 replay generalized per
    * layer (round 13; VERDICT r12 item 2): deterministic md5-nibble
    * level assignment, each layer's NN-Descent chain run over its
    * {level >= l} subset (seed rings recomputed WITHIN the subset —
    * the lead/lag window sees only members), then the engine's
    * top-down serve: narrow (upper-beam, upper-hops) walks move each
    * query's entry set down the hierarchy, and layer 0 runs the full
    * beam at HALF the flat hop budget. A layer the build skips (fewer
    * than 2 members, or no seed-ring collision among them) has an
    * EMPTY adjacency; `top` is the highest layer with adjacency rows
    * (the engine's max(level) over the stored graph) and walks above
    * it pass the entry set through unchanged. */
  private val q336Sql: String = hnswSqlWith { hops0 =>
    s"""fin AS (SELECT query_id, vid, cos,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS INT) AS rank
            FROM w0f$hops0 WHERE vid <> query_id)
    SELECT query_id, rank, vid AS neighbor_id, ${bpS("cos")} AS cos_bp
    FROM fin WHERE rank <= ${Similarity.TopK}"""
  }

  /** q376 filtered layered serve: the identical hierarchy placement
    * and layer-0 walk, but the final rank runs over the
    * predicate-passing subset of every node layer 0 scored (entry
    * scores w0f0s plus each hop's expansion scores w0sx1..w0sxH,
    * deduped by max cos) — the q358 tail on the q336 replay. */
  private val q376Sql: String = hnswSqlWith { hops0 =>
    val unions = (1 to hops0)
      .map(h => s"UNION ALL SELECT query_id, vid, cos FROM w0sx$h")
      .mkString("\n            ")
    s"""allv AS (SELECT query_id, vid, max(cos) AS cos FROM (
            SELECT query_id, vid, cos FROM w0f0s
            $unions) GROUP BY 1, 2),
    fin AS (SELECT a.query_id, a.vid, a.cos,
            CAST(row_number() OVER (PARTITION BY a.query_id ORDER BY a.cos DESC, a.vid ASC) AS INT) AS rank
            FROM allv a
            JOIN embeddings cl ON cl.vec_id = a.vid
            JOIN embeddings ql ON ql.vec_id = a.query_id
            WHERE a.vid <> a.query_id AND cl.label = ql.label)
    SELECT query_id, rank, vid AS neighbor_id, ${bpS("cos")} AS cos_bp
    FROM fin WHERE rank <= ${Similarity.TopK}"""
  }

  /** q397 layered probe after erasure (round 16; VERDICT r15 item 4):
    * the q366 contract one hierarchy up — the identical per-layer
    * build, every layer's adjacency filtered to surviving (even)
    * nodes/neighbors, the TOP layer re-derived from surviving node
    * rows, entries drawn from surviving top-layer members, queries
    * from the survivors, the same top-down walk. Byte-equality proves
    * [[graft.ops.Similarity.deleteFromHnswStore]] is deterministic
    * and leak-free on every layer at once. */
  private val q397Sql: String = hnswSqlWith(hops0 =>
    s"""fin AS (SELECT query_id, vid, cos,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS INT) AS rank
            FROM w0f$hops0 WHERE vid <> query_id)
    SELECT query_id, rank, vid AS neighbor_id, ${bpS("cos")} AS cos_bp
    FROM fin WHERE rank <= ${Similarity.TopK}""",
    nodePred = c => s"$c % 2 = 0",
    qPred = s"vec_id % 2 = 0 AND vec_id < ${2 * Similarity.NumQueries}")

  /** The q336 HNSW replay with a caller-supplied TAIL over layer 0's
    * walk CTEs (`w0f$hops0` final beam; `w0f0s`/`w0sx*` scored set) —
    * the q250SqlTail convention one hierarchy up. */
  private def hnswSqlWith(tailOf: Int => String,
                          nodePred: String => String = _ => "TRUE",
                          qPred: String =
                            s"vec_id < ${Similarity.NumQueries}"): String = {
    val m = Similarity.NswM
    val rounds = Similarity.NswRounds
    val ub = Similarity.HnswUpperBeam
    val uh = Similarity.HnswUpperHops
    val beam = Similarity.NswBeam
    val hops0 = Similarity.HnswHops0
    val seeds = Similarity.NswSeeds
    val maxL = Similarity.HnswMaxLevel
    val lb = Similarity.HnswLevelBits
    // level = count of consecutive zero low md5 nibbles, capped
    val h = md5Signed("vec_id")
    val levelExpr = "CASE " + (maxL to 1 by -1).map { l =>
      val mask = (1L << (lb * l)) - 1L
      s"WHEN ($h & $mask) = 0 THEN $l " }.mkString + "ELSE 0 END"
    def scoreCte(name: String, pairs: String): String =
      s"""$name AS (SELECT p.vid, p.nbr, ${cosS("a.embedding", "b.embedding")} AS cos
           FROM $pairs p JOIN ev a ON a.vec_id = p.vid JOIN ev b ON b.vec_id = p.nbr)"""
    def adjCte(p: String, j: Int, src: String): String =
      s"""${p}adj$j AS MATERIALIZED (SELECT vid, nbr, cos FROM (
           SELECT s.*, row_number() OVER (PARTITION BY vid ORDER BY cos DESC, nbr ASC) AS rn
           FROM $src s) WHERE rn <= $m)"""
    // one NN-Descent chain per layer, prefixed; ring partitions see
    // only the layer's members (mirror of nnDescentGraph over the
    // filtered corpus)
    def chain(p: String, lvl: Int): String = {
      val ringSrc =
        if (lvl == 0) "bkt"
        else s"(SELECT k.* FROM bkt k JOIN lv ON lv.vec_id = k.vec_id AND lv.level >= $lvl)"
      val seed =
        s"""${p}ring AS (SELECT vec_id, t, bk,
             lead(vec_id, 1) OVER w AS n1, lead(vec_id, 2) OVER w AS n2,
             lag(vec_id, 1) OVER w AS p1, lag(vec_id, 2) OVER w AS p2
             FROM $ringSrc r WINDOW w AS (PARTITION BY t, bk ORDER BY vec_id)),
           ${p}sp AS (SELECT DISTINCT vec_id AS vid, nbr FROM (
             SELECT vec_id, unnest([n1, n2, p1, p2]) AS nbr FROM ${p}ring)
             WHERE nbr IS NOT NULL AND nbr <> vec_id),
           ${scoreCte(s"${p}sc0", s"${p}sp")},
           ${adjCte(p, 0, s"${p}sc0")}"""
      val rcs = (1 to rounds).map { r =>
        s"""${p}und$r AS MATERIALIZED (SELECT DISTINCT vid, nbr FROM (
               SELECT vid, nbr FROM ${p}adj${r - 1} UNION ALL SELECT nbr, vid FROM ${p}adj${r - 1})),
           ${p}pr$r AS (SELECT DISTINCT vid, nbr FROM (
               SELECT a.vid, b.nbr FROM ${p}und$r a
               JOIN (SELECT vid, nbr FROM ${p}und$r) b ON b.vid = a.nbr
               UNION ALL SELECT vid, nbr FROM ${p}und$r) WHERE vid <> nbr),
           ${scoreCte(s"${p}sc$r", s"${p}pr$r")},
           ${adjCte(p, r, s"${p}sc$r")}"""
      }.mkString(",\n    ")
      seed + ",\n    " + rcs
    }
    // the shared expand->score->prune walk over one layer's adjacency,
    // seeded by an explicit (query_id, vid) entry CTE
    def walk(p: String, adj: String, entries: String, bw: Int,
             hops: Int): String = {
      def beamCte(name: String, src: String): String =
        s"""$name AS MATERIALIZED (SELECT query_id, vid, cos FROM (
             SELECT s.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS rn
             FROM $src s) WHERE rn <= $bw)"""
      val f0 =
        s"""${p}f0s AS (SELECT e.query_id, e.vid, ${cosS("q.qe", "c.embedding")} AS cos
             FROM $entries e JOIN qs q USING (query_id) JOIN ev c ON c.vec_id = e.vid),
           ${beamCte(s"${p}f0", s"${p}f0s")}"""
      val hcs = (1 to hops).map { hh =>
        s"""${p}ex$hh AS (SELECT DISTINCT f.query_id, a.nbr AS vid
               FROM ${p}f${hh - 1} f JOIN $adj a ON a.vid = f.vid),
           ${p}sx$hh AS (SELECT e.query_id, e.vid, ${cosS("q.qe", "c.embedding")} AS cos
               FROM ${p}ex$hh e JOIN qs q USING (query_id) JOIN ev c ON c.vec_id = e.vid),
           ${p}mg$hh AS (SELECT query_id, vid, max(cos) AS cos FROM (
               SELECT * FROM ${p}f${hh - 1} UNION ALL SELECT * FROM ${p}sx$hh) GROUP BY 1, 2),
           ${beamCte(s"${p}f$hh", s"${p}mg$hh")}"""
      }.mkString(",\n    ")
      f0 + ",\n    " + hcs
    }
    val chains = (0 to maxL).map(l => chain(s"l$l", l)).mkString(",\n    ")
    // survivor-filtered adjacency per layer (nodePred = TRUE collapses
    // to the unfiltered build); the TOP layer keys on surviving NODE
    // rows (edge-source vids), not surviving edges — the engine keeps
    // an emptied node row, so a layer whose edges all died but whose
    // nodes survive still counts (deleteFromHnswIndexTo contract)
    val adjw = (0 to maxL).map(l =>
      s"""l${l}adjw AS (SELECT vid, nbr, cos FROM l${l}adj$rounds
           WHERE ${nodePred("vid")} AND ${nodePred("nbr")})""")
      .mkString(",\n    ")
    val topCases = (1 to maxL).map(l =>
      s"""CASE WHEN EXISTS (SELECT 1 FROM l${l}adj$rounds WHERE ${nodePred("vid")}) THEN $l ELSE 0 END""")
      .mkString(", ")
    // upper layers top..1: walk when the layer is at/below top, else
    // pass the entry set through verbatim
    val upper = (maxL to 1 by -1).map { l =>
      s"""${walk(s"w$l", s"l${l}adjw", s"el$l", ub, uh)},
         p$l AS (SELECT query_id, vid FROM (
             SELECT f.*, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid ASC) AS rn
             FROM w${l}f$uh f WHERE vid <> query_id) WHERE rn <= $ub),
         el${l - 1} AS (SELECT p.query_id, p.vid FROM p$l p CROSS JOIN topc t WHERE t.top >= $l
             UNION ALL SELECT e.query_id, e.vid FROM el$l e CROSS JOIN topc t WHERE t.top < $l)"""
    }.mkString(",\n    ")
    s"""WITH $lshBucketCtes,
    lv AS MATERIALIZED (SELECT vec_id, $levelExpr AS level FROM ev),
    $chains,
    $adjw,
    topc AS (SELECT greatest($topCases) AS top),
    qs AS (SELECT vec_id AS query_id, embedding AS qe FROM ev
           WHERE $qPred),
    entry AS (SELECT lv.vec_id AS vid FROM lv CROSS JOIN topc t
              WHERE lv.level >= t.top AND ${nodePred("lv.vec_id")}
              ORDER BY vec_id LIMIT $seeds),
    el$maxL AS (SELECT q.query_id, e.vid FROM qs q CROSS JOIN entry e),
    $upper,
    ${walk("w0", "l0adjw", "el0", beam, hops0)},
    ${tailOf(hops0)}"""
  }

  /** q271 cell balance: the q91 per-cell table rolled up to one row
    * with the q188-convention hot_bp. */
  private val q271Sql: String =
    s"""WITH base AS ($q91Sql)
    SELECT CAST(16 AS BIGINT) AS n_cells,
      CAST(count(*) AS BIGINT) AS occupied_cells,
      CAST(sum(n_members) AS BIGINT) AS n_vectors,
      CAST(max(n_members) AS BIGINT) AS max_cell_n,
      CAST(10000 * max(n_members) // sum(n_members) AS BIGINT) AS max_share_bp,
      CAST(10000 * max(n_members) * 16 // sum(n_members) AS BIGINT) AS hot_bp
    FROM base"""

  /** Mirror of Similarity.anisotropy: the grid quantization, the exact
    * centered second-moment matrix, then AnisotropyIters power sweeps
    * unrolled CTE-for-CTE (the Lloyd/BPE convention) — HUGEINT
    * throughout, each sweep renormalized to maxAbs = 2¹⁴ by the same
    * truncating division the driver BigInt loop performs. */
  private def q281Sql: String = {
    val iters = Similarity.AnisotropyIters
    val base =
      s"""qe AS MATERIALIZED (
    SELECT vec_id, u.i - 1 AS i,
      CAST(floor(CAST(embedding[u.i] AS DOUBLE) * $S) AS BIGINT) AS qi
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
  st AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
  sv AS MATERIALIZED (SELECT i, CAST(sum(qi) AS HUGEINT) AS s FROM qe GROUP BY 1),
  mu AS MATERIALIZED (SELECT i, s, s // n AS m FROM sv, st),
  m0 AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
      sum(CAST(a.qi AS HUGEINT) * b.qi) AS mm
    FROM qe a JOIN qe b ON a.vec_id = b.vec_id GROUP BY 1, 2),
  mc AS MATERIALIZED (SELECT m0.i, m0.j,
      mm - ma.m * mb.s - ma.s * mb.m + st.n * ma.m * mb.m AS mv
    FROM m0 JOIN mu ma ON ma.i = m0.i JOIN mu mb ON mb.i = m0.j, st),
  v0 AS MATERIALIZED (SELECT i AS j, CAST($S AS HUGEINT) AS x FROM sv)"""
    val sweeps = (1 to iters).map { k =>
      val p = k - 1
      s"""w$k AS (SELECT mc.i AS j, sum(mc.mv * v$p.x) AS y
    FROM mc JOIN v$p ON v$p.j = mc.j GROUP BY 1),
  v$k AS MATERIALIZED (SELECT j, y * $S // max(abs(y)) OVER () AS x FROM w$k)"""
    }
    val tail =
      s"""num AS (SELECT sum(a.x * mc.mv * b.x) AS num
    FROM mc JOIN v$iters a ON a.j = mc.i JOIN v$iters b ON b.j = mc.j),
  den AS (SELECT sum(x * x) AS den FROM v$iters),
  lam AS (SELECT num // den AS lambda FROM num, den),
  tr AS (SELECT sum(mv) AS trace FROM mc WHERE i = j),
  ax AS (SELECT j AS top_axis FROM v$iters ORDER BY abs(x) DESC, j ASC LIMIT 1),
  dims AS (SELECT count(*) AS d FROM sv)
  SELECT CAST(st.n AS BIGINT) AS n_vectors, CAST(dims.d AS BIGINT) AS dim,
    CAST(ax.top_axis AS BIGINT) AS top_axis,
    CAST(lam.lambda // st.n AS BIGINT) AS lambda_mean_q,
    CAST(tr.trace // st.n AS BIGINT) AS trace_mean_q,
    CAST(CASE WHEN tr.trace = 0 THEN NULL
         ELSE 10000 * lam.lambda // tr.trace END AS BIGINT) AS anisotropy_bp
  FROM st, dims, ax, lam, tr"""
    ((base +: sweeps).mkString("WITH ", ",\n  ", ",\n  ")) + tail
  }

  val all: Map[String, String] = Map(
    "q281_anisotropy"      -> q281Sql,
    "q250_ann_graph"       -> q250Sql,
    // q316 serves the persisted graph; the build is deterministic, so
    // the probe is row-identical to q250 and shares its replay oracle
    "q316_ann_graph_index" -> q250Sql,
    "q358_ann_filtered_index" -> q358Sql,
    "q366_ann_delete"      -> q366Sql,
    "q367_sq8_distortion"  -> q367Sql,
    "q336_ann_hnsw_index"  -> q336Sql,
    "q376_hnsw_filtered"   -> q376Sql,
    "q397_hnsw_erase"      -> q397Sql,
    "q271_cell_balance"    -> q271Sql,
    "q234_split_leakage"   -> q234Sql,
    "q237_silhouette"      -> q237Sql,
    "q91_embed_clusters"   -> q91Sql,
    "q95_diversity_sample" -> q95Sql,
    "q114_semdedup"        -> q114Sql,
    "q189_semdedup_store"  -> q189Sql,
    "q62_ann_ivf"          -> ivfOracle(Similarity.IvfCells),
    "q144_ann_ivf_index"   -> ivfOracle(Similarity.IvfCells),
    "q168_ann_ivf_append"  -> ivfOracle(Similarity.IvfCells, "vec_id % 2 = 0"),
    "q170_ann_ivf_compact" -> ivfOracle(Similarity.IvfCells, "vec_id % 2 = 0"),
    "q375_ivf_erase"       -> ivfEraseOracle(Similarity.IvfCells),
    "q63_ann_pq"           -> pqSql,
    "q145_ann_pq_index"    -> pqSql,
    "q317_ann_ivfpq"       -> ivfPqSql,
    "q318_ann_ivfpq_index" -> ivfPqSql,
    "q61_ann_lsh"          -> q61Sql)
}
