package graft

/** DuckDB oracle SQL — embedding similarity (cosine/PQ/IVF-SQ top-k),
  * vocabulary/BPE, packing and hybrid-search oracles.
  *
  * One link of the ordered `Oracles` trait chain (split from the
  * original single object purely for file-size hygiene). The chain
  * preserves the original top-down DEFINITION ORDER: vals initialize
  * in linearization order, so a member may only reference members of
  * the same or an earlier link — which is why a handful of members
  * sit next to the CTE helpers they depend on rather than with their
  * nominal domain.
  */
private[graft] trait OraclesAnnSql extends OraclesCorpusSql {

  /** IVF ANN with quantized-mean Lloyd k-means centroids (2 iterations,
    * seeded with vec_id < 16), nProbe=4, exact top-3 within probed lists —
    * mirrors `Similarity.kmeansCentroids` + `ivfTopK`. Centroid means sum
    * floor(x·2²⁰) as BIGINT (exact, associative, no rounding ties) and
    * divide back once — bit-identical to Spark's unordered partial aggs. */
  protected def ivfAssignCte(name: String, cents: String): String = s"""$name AS (
      SELECT vec_id, c_id AS list_id FROM (
        SELECT n.vec_id, c.c_id,
          row_number() OVER (PARTITION BY n.vec_id
            ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.c_id) AS r
        FROM n, $cents c) WHERE r = 1)"""

  protected def ivfLloydStep(assign: String, sums: String, cent: String): String = s"""$sums AS (
      SELECT a.list_id, t.i,
        sum(CAST(floor(e.embedding[t.i] * 1048576.0) AS BIGINT)) AS s,
        count(*) AS cnt
      FROM $assign a JOIN embeddings e USING (vec_id), range(1, 65) t(i)
      GROUP BY a.list_id, t.i),
    $cent AS (
      SELECT list_id AS c_id, list(s::DOUBLE / (1048576.0 * cnt) ORDER BY i) AS c_emb
      FROM $sums GROUP BY list_id),
    ${cent}n AS (SELECT c_id, c_emb, ${normSql("c_emb")} AS c_nrm FROM $cent)"""

  /** The full IVF pipeline as CTEs ending in `topk` (per-query ranked IVF
    * candidates) — shared by `ann_ivf_topk` and `ann_ivf_recall`. */
  protected def ivfCtes: String = s"""
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    cents0 AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < 16),
    ${ivfAssignCte("assign1", "cents0")},
    ${ivfLloydStep("assign1", "sums1", "cent1")},
    ${ivfAssignCte("assign2", "cent1n")},
    ${ivfLloydStep("assign2", "sums2", "cent2")},
    ranked AS (
      SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
        row_number() OVER (PARTITION BY n.vec_id
          ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.c_id) AS c_rank
      FROM n, cent2n c),
    assigned AS (
      SELECT vec_id AS n_id, embedding AS n_emb, nrm AS n_nrm, c_id AS list_id
      FROM ranked WHERE c_rank = 1),
    probes AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id AS list_id
      FROM ranked WHERE c_rank <= 4 AND vec_id < 10),
    scored AS (
      SELECT q_id, n_id,
        ${dotSql("q_emb", "n_emb")} / (q_nrm * n_nrm) AS cos
      FROM probes JOIN assigned USING (list_id)
      WHERE q_id <> n_id),
    topk AS (
      SELECT q_id, n_id, cos,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored)"""

  val annCosineTopK: String = s"""WITH
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT q_id, n_id, cos,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored)
    SELECT q_id, rnk, n_id, cos AS cos_sim
    FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk"""

  /** Filtered-search recall audit — mirrors
    * `Similarity.filteredSearchAudit` (nQueries 10, k 5): one scored
    * stream, global rank, conditional per-query rollup. */
  val annFilteredRecall: String = s"""WITH
    n AS (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm
          FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, q.label AS q_label, c.label AS n_label,
        c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT q_id, q_label, n_label,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored)
    SELECT q_id, q_label,
      count(CASE WHEN n_label = q_label THEN 1 END) AS n_label_pool,
      count(CASE WHEN n_label = q_label AND rnk <= 5 THEN 1 END)
        AS n_in_global_topk,
      CAST(count(CASE WHEN n_label = q_label AND rnk <= 5 THEN 1 END)
        AS DOUBLE) /
        least(CAST(5 AS BIGINT),
          count(CASE WHEN n_label = q_label THEN 1 END))
        AS postfilter_recall
    FROM ranked GROUP BY q_id, q_label ORDER BY q_id"""

  /** Over-fetch tuning curve — mirrors `Similarity.overfetchCurve`
    * (k = 5, factors 1/2/4/8): the same scored stream and rank, swept
    * with conditional counts. */
  val annOverfetchCurve: String = s"""WITH
    n AS (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm
          FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, q.label AS q_label, c.label AS n_label,
        c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT q_id, q_label, n_label,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored),
    per AS (
      SELECT q_id, q_label,
        count(CASE WHEN n_label = q_label THEN 1 END) AS pool,
        count(CASE WHEN n_label = q_label AND rnk <= 5 THEN 1 END) AS k1,
        count(CASE WHEN n_label = q_label AND rnk <= 10 THEN 1 END) AS k2,
        count(CASE WHEN n_label = q_label AND rnk <= 20 THEN 1 END) AS k4,
        count(CASE WHEN n_label = q_label AND rnk <= 40 THEN 1 END) AS k8
      FROM ranked GROUP BY q_id, q_label),
    f(fetch_k) AS (VALUES (CAST(5 AS BIGINT)), (CAST(10 AS BIGINT)),
                          (CAST(20 AS BIGINT)), (CAST(40 AS BIGINT)))
    SELECT per.q_id, per.q_label, f.fetch_k,
      CAST(CASE f.fetch_k WHEN 5 THEN k1 WHEN 10 THEN k2
                          WHEN 20 THEN k4 ELSE k8 END AS BIGINT) AS n_kept,
      CAST(CASE f.fetch_k WHEN 5 THEN k1 WHEN 10 THEN k2
                          WHEN 20 THEN k4 ELSE k8 END AS DOUBLE)
        / least(CAST(5 AS BIGINT), pool) AS recall
    FROM per, f ORDER BY per.q_id, f.fetch_k"""

  /** Int8 symmetric quantization in SQL — mirrors `Similarity.quantizeInt8`:
    * `scale = max|x|/127` (1 for an all-zero vector), `q_i = floor(x_i /
    * scale + 0.5)`. Every quantized intermediate is an exact integer in
    * double, so the scored CTE is bit-stable across engines. Shared by both
    * `ann_quantized_*` oracles. */
  protected val quantizedCte: String = """
    qbase AS (
      SELECT vec_id, embedding,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, 65), i -> abs(embedding[i]::DOUBLE))),
          (a, b) -> greatest(a, b)) AS mx
      FROM embeddings),
    qz AS (
      SELECT vec_id,
        list_transform(range(1, 65),
          i -> floor(embedding[i]::DOUBLE /
                     (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5)) AS qvec
      FROM qbase),
    qn AS (
      SELECT vec_id, qvec,
        greatest(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, 65), i -> qvec[i] * qvec[i])),
          (acc, x) -> acc + x)), 1e-300) AS qnrm
      FROM qz),
    qscored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, 65), i -> q.qvec[i] * c.qvec[i])),
          (acc, x) -> acc + x) / (q.qnrm * c.qnrm) AS cos_q
      FROM qn q JOIN qn c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    qranked AS (
      SELECT q_id, n_id, cos_q,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_q DESC, n_id) AS rnk
      FROM qscored)"""

  val annQuantizedTopK: String = s"""WITH $quantizedCte
    SELECT q_id, rnk, n_id, cos_q
    FROM qranked WHERE rnk <= 5 ORDER BY q_id, rnk"""

  val annQuantizedRecall: String = s"""WITH $quantizedCte,
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored),
    ex AS (SELECT q_id, n_id FROM ranked WHERE rnk <= 5),
    qt AS (SELECT q_id, n_id FROM qranked WHERE rnk <= 5),
    hits AS (
      SELECT ex.q_id, count(*) AS n_hit
      FROM ex JOIN qt ON ex.q_id = qt.q_id AND ex.n_id = qt.n_id
      GROUP BY ex.q_id)
    SELECT q.q_id, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
      coalesce(h.n_hit, 0)::DOUBLE / 5.0 AS recall
    FROM (SELECT DISTINCT q_id FROM ex) q LEFT JOIN hits h ON q.q_id = h.q_id
    ORDER BY q.q_id"""

  /** Left-fold dot product over the first `dims` elements (the
    * [[dotSql]] formula at a parametric width — PQ works on 8-dim
    * subvectors). */
  protected def dotNSql(a: String, b: String, dims: Int): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, ${dims + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
       (acc, x) -> acc + x)"""

  /** Per-(vector, subspace) nearest-codeword assignment — mirrors
    * `Similarity.pqAssign`: rank by `‖c‖² − 2⟨x,c⟩` (the ‖x‖² term is
    * constant per subvector), ties on the smaller code id. */
  protected def pqAssignCte(name: String, cb: String): String = s"""$name AS (
      SELECT vec_id, s, code, sub FROM (
        SELECT subs.vec_id, subs.s, c.code, subs.sub,
          row_number() OVER (PARTITION BY subs.vec_id, subs.s
            ORDER BY c.c_dot - 2.0 * ${dotNSql("subs.sub", "c.c_sub", 8)} ASC,
              c.code) AS r
        FROM subs JOIN $cb c USING (s)) WHERE r = 1)"""

  /** One Lloyd step per subspace — quantized-integer means exactly as
    * `Similarity.pqCodebooks` (Σ floor(x·2²⁰) as BIGINT, one division). */
  protected def pqLloydStep(assign: String, sums: String, cb: String): String = s"""$sums AS (
      SELECT a.s, a.code, t.i,
        sum(CAST(floor(a.sub[t.i] * 1048576.0) AS BIGINT)) AS ssum,
        count(*) AS cnt
      FROM $assign a, range(1, 9) t(i)
      GROUP BY a.s, a.code, t.i),
    $cb AS (
      SELECT s, code, list(ssum::DOUBLE / (1048576.0 * cnt) ORDER BY i) AS c_sub
      FROM $sums GROUP BY s, code),
    ${cb}d AS (SELECT s, code, c_sub, ${dotNSql("c_sub", "c_sub", 8)} AS c_dot
      FROM $cb)"""

  /** Product quantization (m=8 × 8-dim subspaces, kSub=32, 2 Lloyd
    * iterations, seeds = vec_id < 32) + ADC scoring for queries vec_id < 10
    * — mirrors `Similarity.pqCodebooks`/`pqEncode`/`pqTopK`. The ADC sum
    * folds the per-subspace LUT values in ascending subspace order
    * (list_reduce over `ORDER BY s` — the same left fold Spark's
    * `aggregate` over `sequence(0, m-1)` runs). Ends in `pqtopk`. */
  protected def pqCtes: String = s"""
    subs AS (
      SELECT vec_id, t.s,
        list_transform(range(1, 9), i -> (embedding[t.s * 8 + i])::DOUBLE) AS sub
      FROM embeddings, range(0, 8) t(s)),
    cb0d AS (
      SELECT s, vec_id AS code, sub AS c_sub, ${dotNSql("sub", "sub", 8)} AS c_dot
      FROM subs WHERE vec_id < 32),
    ${pqAssignCte("pasg1", "cb0d")},
    ${pqLloydStep("pasg1", "psums1", "pcb1")},
    ${pqAssignCte("pasg2", "pcb1d")},
    ${pqLloydStep("pasg2", "psums2", "pcb2")},
    ${pqAssignCte("pasgf", "pcb2d")},
    enc AS (
      SELECT a.vec_id,
        list(a.code ORDER BY a.s) AS codes,
        greatest(sqrt(list_reduce(
          list_prepend(0.0::DOUBLE, list(c.c_dot ORDER BY a.s)),
          (acc, x) -> acc + x)), 1e-300) AS r_nrm
      FROM pasgf a JOIN pcb2d c USING (s, code)
      GROUP BY a.vec_id),
    pquery AS (SELECT vec_id AS q_id, embedding, ${normSql("embedding")} AS q_nrm
      FROM embeddings WHERE vec_id < 10),
    qsub AS (
      SELECT q_id, q_nrm, t.s,
        list_transform(range(1, 9), i -> (embedding[t.s * 8 + i])::DOUBLE) AS qs
      FROM pquery, range(0, 8) t(s)),
    qlut AS (
      SELECT qsub.q_id, qsub.q_nrm, qsub.s, c.code,
        ${dotNSql("qsub.qs", "c.c_sub", 8)} AS lval
      FROM qsub JOIN pcb2d c USING (s)),
    pqscored AS (
      SELECT l.q_id, e.vec_id AS n_id,
        list_reduce(list_prepend(0.0::DOUBLE, list(l.lval ORDER BY l.s)),
          (acc, x) -> acc + x) / (max(l.q_nrm) * max(e.r_nrm)) AS cos_pq
      FROM enc e JOIN qlut l ON l.code = e.codes[l.s + 1]
      WHERE l.q_id <> e.vec_id
      GROUP BY l.q_id, e.vec_id),
    pqtopk AS (
      SELECT q_id, n_id, cos_pq,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_pq DESC, n_id) AS rnk
      FROM pqscored)"""

  val annPqTopK: String = s"""WITH $pqCtes
    SELECT q_id, rnk, n_id, cos_pq
    FROM pqtopk WHERE rnk <= 5 ORDER BY q_id, rnk"""

  /** PQ recall@k curve — mirrors `Similarity.pqRecallCurve`
    * (ks = 1/3/5, nQueries = 10): both rankings to k=5 once, the
    * agreement join once, conditional counts per cutoff. */
  val annPqRecallCurve: String = s"""WITH $pqCtes,
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored),
    ex AS (SELECT q_id, n_id, rnk AS rnk_e FROM ranked WHERE rnk <= 5),
    pq5 AS (SELECT q_id, n_id, rnk AS rnk_p FROM pqtopk WHERE rnk <= 5),
    h AS (SELECT ex.rnk_e, pq5.rnk_p
          FROM ex JOIN pq5 USING (q_id, n_id)),
    ks(k) AS (VALUES (1), (3), (5))
    SELECT CAST(ks.k AS BIGINT) AS k,
      count(CASE WHEN h.rnk_e <= ks.k AND h.rnk_p <= ks.k THEN 1 END)
        AS n_hits,
      CAST(count(CASE WHEN h.rnk_e <= ks.k AND h.rnk_p <= ks.k THEN 1 END)
        AS DOUBLE) / (ks.k * 10) AS recall
    FROM ks LEFT JOIN h ON true
    GROUP BY ks.k ORDER BY k"""

  /** IVF list-balance ledger — mirrors `Similarity.ivfBalance`
    * (nLists = 16): member counts off the final Lloyd assignment. */
  val annIvfBalance: String = s"""WITH $ivfCtes,
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM embeddings)
    SELECT list_id, count(*) AS n_vecs,
      CAST(max(tot.n_vec) AS DOUBLE) / 16 AS expected_load,
      CAST(count(*) AS DOUBLE) * 16 / max(tot.n_vec) AS balance
    FROM assigned, tot GROUP BY list_id ORDER BY list_id"""

  /** PQ codebook-utilization ledger — mirrors `Similarity.pqBalance`
    * (m=8, kSub=32): per-subspace code loads off the final assignment. */
  val annPqBalance: String = s"""WITH $pqCtes,
    loads AS (SELECT s, code, count(*) AS load FROM pasgf GROUP BY s, code),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM embeddings)
    SELECT CAST(s AS BIGINT) AS s,
      count(*) AS n_codes_used,
      CAST(max(load) AS BIGINT) AS max_load,
      CAST(min(load) AS BIGINT) AS min_load,
      CAST(max(tot.n_vec) AS DOUBLE) / 32 AS expected_load,
      CAST(max(load) AS DOUBLE) * 32 / max(tot.n_vec) AS balance
    FROM loads, tot GROUP BY s ORDER BY s"""

  val annPqRecall: String = s"""WITH $pqCtes,
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    ranked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored),
    ex AS (SELECT q_id, n_id FROM ranked WHERE rnk <= 5),
    pq AS (SELECT q_id, n_id FROM pqtopk WHERE rnk <= 5),
    hits AS (
      SELECT ex.q_id, count(*) AS n_hit
      FROM ex JOIN pq ON ex.q_id = pq.q_id AND ex.n_id = pq.n_id
      GROUP BY ex.q_id)
    SELECT q.q_id, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
      coalesce(h.n_hit, 0)::DOUBLE / 5.0 AS recall
    FROM (SELECT DISTINCT q_id FROM ex) q LEFT JOIN hits h ON q.q_id = h.q_id
    ORDER BY q.q_id"""

  /** PQ coarse top-20 re-scored by exact float cosine — mirrors
    * `Similarity.pqRerank` (the `rescoreExact` stage over `pqtopk`). */
  /** IVF-PQ — mirrors `Similarity.ivfPqTopK`: the validated IVF CTEs for
    * probe selection/list assignment composed with the validated PQ CTEs
    * for codes and per-query LUTs; candidates in probed lists score by the
    * subspace-ordered ADC fold. */
  val annIvfPqTopK: String = s"""WITH $ivfCtes, $pqCtes,
    ivfpq AS (
      SELECT p.q_id, a.n_id,
        list_reduce(list_prepend(0.0::DOUBLE, list(l.lval ORDER BY l.s)),
          (acc, x) -> acc + x) / (max(p.q_nrm) * max(e.r_nrm)) AS cos_pq
      FROM probes p
      JOIN assigned a USING (list_id)
      JOIN enc e ON e.vec_id = a.n_id
      JOIN qlut l ON l.q_id = p.q_id AND l.code = e.codes[l.s + 1]
      WHERE p.q_id <> a.n_id
      GROUP BY p.q_id, a.n_id),
    ivfpqtop AS (
      SELECT q_id, n_id, cos_pq,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_pq DESC, n_id) AS rnk
      FROM ivfpq)
    SELECT q_id, rnk, n_id, cos_pq
    FROM ivfpqtop WHERE rnk <= 5 ORDER BY q_id, rnk"""

  val annPqRerank: String = s"""WITH $pqCtes,
    coarse AS (SELECT q_id, n_id, rnk AS coarse_rnk FROM pqtopk WHERE rnk <= 20),
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    rescored AS (
      SELECT c.q_id, c.n_id, c.coarse_rnk,
        ${dotSql("q.embedding", "x.embedding")} / (q.nrm * x.nrm) AS cos_exact
      FROM coarse c
      JOIN n q ON q.vec_id = c.q_id
      JOIN n x ON x.vec_id = c.n_id),
    reranked AS (
      SELECT q_id, n_id, cos_exact, coarse_rnk,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_exact DESC, n_id) AS rnk
      FROM rescored)
    SELECT q_id, rnk, n_id, cos_exact, coarse_rnk
    FROM reranked WHERE rnk <= 5 ORDER BY q_id, rnk"""

  /** Heaps-law vocabulary growth — mirrors `TextAnalysis.vocabGrowth`. */
  val vocabGrowth: String = s"""WITH
    mx AS (SELECT max(doc_id) AS max_id FROM documents),
    toks AS (
      SELECT d.doc_id * 10 // (m.max_id + 1) AS bucket, t.tok
      FROM documents d, mx m, unnest(string_split(d.text, ' ')) AS t(tok)),
    occ AS (SELECT bucket, count(*) AS n_tokens FROM toks GROUP BY bucket),
    firsts AS (SELECT tok, min(bucket) AS bucket FROM toks GROUP BY tok),
    newt AS (SELECT bucket, count(*) AS n_new_types FROM firsts GROUP BY bucket)
    SELECT o.bucket, CAST(o.n_tokens AS BIGINT) AS n_tokens,
      CAST(coalesce(n.n_new_types, 0) AS BIGINT) AS n_new_types,
      CAST(sum(o.n_tokens) OVER w AS BIGINT) AS cum_tokens,
      CAST(sum(coalesce(n.n_new_types, 0)) OVER w AS BIGINT) AS cum_types,
      (sum(coalesce(n.n_new_types, 0)) OVER w)::DOUBLE /
        (sum(o.n_tokens) OVER w) AS type_token_ratio
    FROM occ o LEFT JOIN newt n USING (bucket)
    WINDOW w AS (ORDER BY o.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o.bucket"""

  /** Zipf frequency-octave ledger — mirrors `TextAnalysis.zipfBuckets`.
    * `octave = len(bin(freq)) - 1` is the integer-exact ⌊log₂⌋ both
    * engines compute identically (no floating log). */
  val vocabZipf: String = """WITH
    f AS (SELECT tok, count(*) AS freq
          FROM documents, unnest(string_split(text, ' ')) AS t(tok)
          GROUP BY tok),
    o AS (SELECT CAST(len(bin(freq)) - 1 AS BIGINT) AS octave,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(freq) AS BIGINT) AS n_tokens
          FROM f GROUP BY 1),
    t AS (SELECT CAST(sum(n_types) AS BIGINT) AS tot_types,
                 CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM o)
    SELECT octave, n_types, n_tokens,
      CAST(n_types AS DOUBLE) / tot_types AS type_share,
      CAST(n_tokens AS DOUBLE) / tot_tokens AS token_share
    FROM o, t ORDER BY octave"""

  /** Fixed-width word-block dedup ledger — mirrors `Dedup.blockDedup`
    * (list_slice is 1-based inclusive and clamps, exactly like Spark's
    * `slice(ws, start, length)` on a short tail). */
  def dedupBlocks(blockWords: Int = 10): String = s"""WITH
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    blk AS (
      SELECT doc_id,
        md5(array_to_string(list_slice(ws, i * $blockWords + 1,
          i * $blockWords + $blockWords), ' ')) AS bh
      FROM (SELECT doc_id, ws,
              unnest(range(0, greatest(
                (len(ws) + ${blockWords - 1}) // $blockWords, 1))) AS i
            FROM w)),
    occ AS (
      SELECT doc_id, count(*) OVER (PARTITION BY bh) AS n_occ FROM blk)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
      CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
      CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        AS dup_frac
    FROM occ GROUP BY doc_id ORDER BY doc_id"""

  /** Curriculum mixture schedule — mirrors `Sampling.mixSchedule`: linear
    * interpolation from the natural token share to uniform across the
    * phases, every term a fixed chain of IEEE ops on exact integers. */
  def mixScheduleSql(steps: Int = 5): String = s"""WITH
    p AS (SELECT source,
            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
                 count(*) AS n_src FROM p),
    e AS (SELECT p.source, p.n_tokens, t.tot, t.n_src,
                 unnest(range(0, $steps)) AS phase
          FROM p, t)
    SELECT CAST(phase AS BIGINT) AS phase, source, n_tokens,
      (CAST(n_tokens AS DOUBLE) / tot) +
        ((1.0::DOUBLE / n_src) - (CAST(n_tokens AS DOUBLE) / tot)) *
        (CAST(phase AS DOUBLE) / ${steps - 1}.0) AS weight,
      ((CAST(n_tokens AS DOUBLE) / tot) +
        ((1.0::DOUBLE / n_src) - (CAST(n_tokens AS DOUBLE) / tot)) *
        (CAST(phase AS DOUBLE) / ${steps - 1}.0)) *
        (CAST(tot AS DOUBLE) / $steps.0) AS phase_tokens
    FROM e ORDER BY phase, source"""

  /** Hybrid retrieval with reciprocal-rank fusion — mirrors
    * `Similarity.hybridRrfTopK`: exact-cosine top-k (the annCosineTopK
    * construction at k=10) fused with exact trigram-Jaccard top-k by
    * `Σ 1/(rrfK + rank)`; the fused score is two divisions and one
    * addition in fixed order. */
  def searchHybridRrf(nQueries: Int = 10, k: Int = 10,
      rrfK: Int = 60): String = s"""WITH $shingles3Cte,
    nrm AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
            FROM embeddings),
    semscored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM nrm q JOIN nrm c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
    semr AS (
      SELECT q_id, doc_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id)
          AS sem_rnk
      FROM semscored),
    semk AS (SELECT q_id, doc_id, CAST(sem_rnk AS BIGINT) AS sem_rnk
             FROM semr WHERE sem_rnk <= $k),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
    inter AS (
      SELECT q.doc_id AS q_id, c.doc_id AS doc_id, count(*) AS n_inter
      FROM sh3 q JOIN sh3 c ON q.shingle = c.shingle
        AND q.doc_id < $nQueries AND c.doc_id <> q.doc_id
      GROUP BY 1, 2),
    lexscored AS (
      SELECT i.q_id, i.doc_id,
        CAST(i.n_inter AS DOUBLE) / (sc.n_sh + sq.n_sh - i.n_inter) AS jaccard
      FROM inter i
      JOIN sizes sc ON sc.doc_id = i.doc_id
      JOIN sizes sq ON sq.doc_id = i.q_id),
    lexr AS (
      SELECT q_id, doc_id,
        row_number() OVER (PARTITION BY q_id ORDER BY jaccard DESC, doc_id)
          AS lex_rnk
      FROM lexscored),
    lexk AS (SELECT q_id, doc_id, CAST(lex_rnk AS BIGINT) AS lex_rnk
             FROM lexr WHERE lex_rnk <= $k),
    fused AS (
      SELECT coalesce(s.q_id, l.q_id) AS q_id,
        coalesce(s.doc_id, l.doc_id) AS doc_id,
        s.sem_rnk, l.lex_rnk,
        coalesce(1.0::DOUBLE / ($rrfK + s.sem_rnk), 0.0::DOUBLE) +
          coalesce(1.0::DOUBLE / ($rrfK + l.lex_rnk), 0.0::DOUBLE) AS rrf
      FROM semk s FULL JOIN lexk l
        ON l.q_id = s.q_id AND l.doc_id = s.doc_id),
    ranked AS (
      SELECT q_id, doc_id, rrf, sem_rnk, lex_rnk,
        row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused)
    SELECT q_id, CAST(rnk AS BIGINT) AS rnk, doc_id, rrf, sem_rnk, lex_rnk
    FROM ranked WHERE rnk <= $k ORDER BY q_id, rnk"""

  /** First BPE merge-round pair table — mirrors
    * `TextAnalysis.bpePairStats`: adjacent char pairs inside words,
    * weighted by word occurrence, top-k with lexical tiebreak. */
  def bpePairs(k: Int = 20): String = s"""WITH
    w AS (SELECT w, count(*) AS wfreq
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w),
    p AS (SELECT substr(w, i, 2) AS pair, wfreq
          FROM (SELECT w, wfreq, unnest(range(1, len(w))) AS i
                FROM w WHERE len(w) >= 2)),
    c AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pair_count
          FROM p GROUP BY pair)
    SELECT pair, pair_count FROM c
    ORDER BY pair_count DESC, pair LIMIT $k"""

  /** Second BPE merge round — mirrors `TextAnalysis.bpeMergeApply`:
    * spaced symbol render, round-1 winner merged via literal replace,
    * round-2 pair recount over the merged type table. */
  def bpeMergeApply(k: Int = 10): String = s"""WITH
    w AS (SELECT w, count(*) AS wfreq
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w),
    sp AS (SELECT w, wfreq,
             array_to_string(string_split(w, ''), ' ') AS spaced
           FROM w),
    p1 AS (SELECT wfreq,
             unnest(list_transform(range(1, len(string_split(spaced, ' '))),
               i -> string_split(spaced, ' ')[i] || ' ' ||
                    string_split(spaced, ' ')[i + 1])) AS pair
           FROM sp WHERE len(string_split(spaced, ' ')) >= 2),
    c1 AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pair_count
           FROM p1 GROUP BY pair),
    best AS (SELECT pair AS merge_applied, replace(pair, ' ', '') AS ms
             FROM c1 ORDER BY pair_count DESC, pair LIMIT 1),
    r2 AS (SELECT wfreq,
             replace(spaced, (SELECT merge_applied FROM best),
               (SELECT ms FROM best)) AS spaced
           FROM sp),
    p2 AS (SELECT wfreq,
             unnest(list_transform(range(1, len(string_split(spaced, ' '))),
               i -> string_split(spaced, ' ')[i] || ' ' ||
                    string_split(spaced, ' ')[i + 1])) AS pair
           FROM r2 WHERE len(string_split(spaced, ' ')) >= 2),
    c2 AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pair_count
           FROM p2 GROUP BY pair)
    SELECT pair, pair_count, (SELECT merge_applied FROM best) AS merge_applied
    FROM c2 ORDER BY pair_count DESC, pair LIMIT $k"""

  /** Watermark-delay curve — mirrors `Capture.watermarkCurve` (mod 17,
    * delays 0/1s/10s/60s): backfill events dropped when their event time
    * trails the live watermark max(live t) − delay. */
  val cdcWatermarkCurve: String = s"""WITH $opsCte,
    m AS (SELECT *, CAST(pk AS BIGINT) % 17 = 0 AS is_backfill FROM ops),
    lv AS (SELECT max(t) AS max_live_t FROM m WHERE NOT is_backfill),
    b AS (SELECT t, max_live_t,
            CAST(unnest([0, 1000, 10000, 60000]) AS BIGINT) AS delay_ms
          FROM m, lv WHERE is_backfill)
    SELECT delay_ms, count(*) AS n_backfill,
      count(CASE WHEN t < max_live_t - delay_ms THEN 1 END) AS n_dropped,
      CAST(count(CASE WHEN t < max_live_t - delay_ms THEN 1 END) AS DOUBLE)
        / count(*) AS drop_frac
    FROM b GROUP BY delay_ms ORDER BY delay_ms"""

  /** Funnel-order audit — mirrors `Corpus.funnelOrder`: keep-best per
    * cluster before vs after the gates, over the validated quality /
    * repetition formulas and near-dup closure. */
  def corpusFunnelOrder: String = s"""WITH RECURSIVE $minhashSigCte,
    ${scalablePairsCtes()},
    $nearDupClosureCtes,
    lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    q AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) *
          (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' '))) *
          (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS DOUBLE)
            / len(string_split(text, ' '))) AS quality_score
      FROM documents),
    g AS (
      SELECT doc_id,
        unnest(list_transform(
          CASE WHEN len(string_split(text, ' ')) >= 2
               THEN range(1, len(string_split(text, ' ')))
               ELSE [] END,
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
      FROM documents),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    r AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_bigram_frac
      FROM gc GROUP BY doc_id),
    base AS (
      SELECT d.doc_id, d.source, l.cluster_id, q.n_tokens, q.quality_score,
        (q.n_tokens >= 20 AND q.quality_score >= 0.2
          AND coalesce(r.top_bigram_frac <= 0.1, true)) AS pass_gates
      FROM documents d
      JOIN lab l ON l.doc_id = d.doc_id
      JOIN q ON q.doc_id = d.doc_id
      LEFT JOIN r ON r.doc_id = d.doc_id),
    ra AS (
      SELECT doc_id,
        row_number() OVER (PARTITION BY cluster_id
          ORDER BY quality_score DESC, doc_id) = 1 AS is_rep_all
      FROM base),
    rp AS (
      SELECT doc_id,
        row_number() OVER (PARTITION BY cluster_id
          ORDER BY quality_score DESC, doc_id) = 1 AS is_rep_pass
      FROM base WHERE pass_gates),
    fl AS (
      SELECT b.source, b.n_tokens,
        (ra.is_rep_all AND b.pass_gates) AS kept_a,
        coalesce(rp.is_rep_pass, false) AS kept_b
      FROM base b
      JOIN ra ON ra.doc_id = b.doc_id
      LEFT JOIN rp ON rp.doc_id = b.doc_id)
    SELECT source, count(*) AS n_docs,
      count(CASE WHEN kept_a THEN 1 END) AS n_kept_dedup_first,
      count(CASE WHEN kept_b THEN 1 END) AS n_kept_filter_first,
      count(CASE WHEN kept_b AND NOT kept_a THEN 1 END)
        AS n_rescued_by_filter_first,
      count(CASE WHEN kept_a AND NOT kept_b THEN 1 END)
        AS n_dropped_by_filter_first,
      coalesce(CAST(sum(CASE WHEN kept_a THEN n_tokens END) AS BIGINT), 0)
        AS tokens_dedup_first,
      coalesce(CAST(sum(CASE WHEN kept_b THEN n_tokens END) AS BIGINT), 0)
        AS tokens_filter_first
    FROM fl GROUP BY source ORDER BY source"""

  /** Semantic decontamination — mirrors
    * `Similarity.semanticDecontaminate`: nearest eval vector (every
    * `mod`-th) per corpus vector, cosine via the deterministic left-fold
    * dot, threshold flag. */
  def annDecontaminate(mod: Long = 17L, threshold: Double = 0.9,
      evalCap: Long = Long.MaxValue): String = s"""WITH
    nrm AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
            FROM embeddings),
    scored AS (
      SELECT c.vec_id, e.vec_id AS eval_id,
        ${dotSql("c.embedding", "e.embedding")} / (c.nrm * e.nrm) AS cos
      FROM nrm c JOIN nrm e
        ON c.vec_id % $mod <> 0 AND e.vec_id % $mod = 0
           AND e.vec_id < $evalCap AND c.vec_id <> e.vec_id),
    ranked AS (
      SELECT vec_id, eval_id, cos,
        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id)
          AS rn
      FROM scored)
    SELECT vec_id, eval_id, cos AS max_cos, cos >= $threshold AS contaminated
    FROM ranked WHERE rn = 1 ORDER BY vec_id"""

  /** Join-key skew ledger — mirrors `SaltedJoin.skewProfile` on the
    * events table (`⌈share × parts⌉` is autoSalts' overload factor; the
    * running share divides an exact integer cumulative count). */
  def eventsSkewProfile(k: Int = 10, parts: Int = 32): String = s"""WITH
    c AS (SELECT user_id, count(*) AS key_count FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(key_count) AS BIGINT) AS total FROM c),
    r AS (SELECT user_id, CAST(key_count AS BIGINT) AS key_count,
            row_number() OVER (ORDER BY key_count DESC, user_id) AS rnk,
            CAST(sum(key_count) OVER (ORDER BY key_count DESC, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_count
          FROM c)
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id, key_count,
      CAST(key_count AS DOUBLE) / total AS share,
      CAST(cum_count AS DOUBLE) / total AS cum_share,
      CAST(ceil(CAST(key_count AS DOUBLE) / total * $parts) AS BIGINT)
        AS salts_needed
    FROM r, t WHERE rnk <= $k ORDER BY rnk"""

  /** Sliding-window chunk plan in SQL — mirrors `Chunking.chunkPlan`. */
  def chunkPlanSql(size: Int = 64, stride: Int = 48): String = s"""WITH
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens FROM t),
    c AS (SELECT doc_id, toks, n_tokens,
            (1 + CAST(ceil(greatest(n_tokens - $size, 0)::DOUBLE / ${stride}.0)
                 AS BIGINT)) AS n_chunks
          FROM n),
    e AS (SELECT doc_id, toks, n_tokens,
            unnest(range(0, n_chunks)) AS chunk_idx
          FROM c)
    SELECT doc_id, chunk_idx, chunk_idx * $stride AS start_tok,
      least($size, n_tokens - chunk_idx * $stride) AS n_tok,
      md5(array_to_string(list_slice(toks, chunk_idx * $stride + 1,
        chunk_idx * $stride + least($size, n_tokens - chunk_idx * $stride)),
        ' ')) AS chunk_md5
    FROM e ORDER BY doc_id, chunk_idx"""

  /** Per-source chunk ledger in SQL — mirrors `Chunking.chunkStats`. */
  def chunkStatsSql(size: Int = 64, stride: Int = 48): String = s"""WITH
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    n AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t),
    c AS (SELECT doc_id, n_tokens,
            (1 + CAST(ceil(greatest(n_tokens - $size, 0)::DOUBLE / ${stride}.0)
                 AS BIGINT)) AS n_chunks
          FROM n),
    e AS (SELECT doc_id, n_tokens, unnest(range(0, n_chunks)) AS chunk_idx
          FROM c),
    p AS (SELECT doc_id,
            least($size, n_tokens - chunk_idx * $stride) AS n_tok
          FROM e),
    j AS (SELECT d.source, p.doc_id, p.n_tok
          FROM p JOIN documents d ON p.doc_id = d.doc_id)
    SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
      CAST(sum(n_tok) AS BIGINT) AS emitted_tokens,
      sum(n_tok)::DOUBLE / (count(*) * $size) AS mean_fill
    FROM j GROUP BY source ORDER BY source"""

  /** LSH bucket id in SQL — mirrors `Similarity.lshBucket`. */
  def lshBucketSql(emb: String, nPlanes: Int): String = {
    val planes = (0 until nPlanes).map { j =>
      val proj = s"""list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(0, 64), i -> $emb[i+1]::DOUBLE *
          ((((${j * 64} + i + 1) * 2654435761) % 1000)::DOUBLE / 1000.0 - 0.5))),
        (acc, x) -> acc + x)"""
      s"CASE WHEN $proj >= 0 THEN ${1L << j} ELSE 0 END"
    }
    planes.mkString(" + ")
  }

  val annLshBuckets: String = s"""
    SELECT bucket, count(*) AS n_vecs
    FROM (SELECT CAST(${lshBucketSql("embedding", 8)} AS BIGINT) AS bucket FROM embeddings)
    GROUP BY bucket ORDER BY bucket"""

  val annNearDup: String = s"""WITH
    b AS (SELECT vec_id, embedding, ${lshBucketSql("embedding", 4)} AS bucket,
                 ${normSql("embedding")} AS nrm
          FROM embeddings),
    cand AS (
      SELECT x.vec_id AS a_id, y.vec_id AS b_id,
        ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
    SELECT DISTINCT a_id, b_id, cos AS cos_sim
    FROM cand WHERE cos >= 0.45 ORDER BY a_id, b_id"""

  /** Band `band`'s bucket key: AND of `bits` hyperplane sign bits, plane
    * index band·bits+i into the same lattice as `lshBucketSql`. */
  def lshBandKeySql(emb: String, band: Int, bits: Int): String = {
    val terms = (0 until bits).map { i =>
      val j = band * bits + i
      val proj = s"""list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(0, 64), i -> $emb[i+1]::DOUBLE *
          ((((${j * 64} + i + 1) * 2654435761) % 1000)::DOUBLE / 1000.0 - 0.5))),
        (acc, x) -> acc + x)"""
      s"CASE WHEN $proj >= 0 THEN ${1L << i} ELSE 0 END"
    }
    terms.mkString(" + ")
  }

  val annNearDupBanded: String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT vec_id, embedding, nrm, $b AS band, ${lshBandKeySql("embedding", b, 8)} AS key FROM base")
      .mkString("\n      UNION ALL ")
    s"""WITH
    base AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    keys AS ($bandSelects),
    cand AS (
      SELECT x.vec_id AS a_id, y.vec_id AS b_id,
        ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
      FROM keys x JOIN keys y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id)
    SELECT DISTINCT a_id, b_id, cos AS cos_sim
    FROM cand WHERE cos >= 0.4 ORDER BY a_id, b_id"""
  }

  /** Incremental embedding near-dup flags — mirrors
    * `Similarity.incrementalNearDup` with the `vec_id % 10` corpus/
    * increment split convention of `dedup_incremental`. */
  val annIncremental: String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT vec_id, embedding, nrm, $b AS band, ${lshBandKeySql("embedding", b, 8)} AS key FROM base")
      .mkString("\n      UNION ALL ")
    s"""WITH
    base AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    keys AS ($bandSelects),
    arr AS (SELECT * FROM keys WHERE vec_id % 10 = 0),
    idx AS (SELECT * FROM keys WHERE vec_id % 10 <> 0),
    cand AS (
      SELECT DISTINCT a.vec_id AS a_id, i.vec_id AS c_id,
        ${dotSql("a.embedding", "i.embedding")} / (a.nrm * i.nrm) AS cos
      FROM arr a JOIN idx i ON a.band = i.band AND a.key = i.key),
    matches AS (SELECT * FROM cand WHERE cos >= 0.4),
    flags AS (
      SELECT a_id, count(*) AS n_matches, max(cos) AS best_cos,
        min(c_id) AS first_match
      FROM matches GROUP BY a_id)
    SELECT e.vec_id, f.a_id IS NOT NULL AS is_dup,
      CAST(coalesce(f.n_matches, 0) AS BIGINT) AS n_matches,
      f.best_cos, f.first_match
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0) e
    LEFT JOIN flags f ON e.vec_id = f.a_id
    ORDER BY e.vec_id"""
  }

  /** Mutual k-NN graph — mirrors `Similarity.knnGraph(k=3, 8 bands × 8
    * bits)`: banded candidates, per-vector top-3 by exact cosine (dst
    * tie-break), edge kept iff both directions rank each other. */
  val annKnnGraph: String = {
    val bandSelects = (0 until 8).map(b =>
      s"SELECT vec_id, embedding, nrm, $b AS band, ${lshBandKeySql("embedding", b, 8)} AS key FROM base")
      .mkString("\n      UNION ALL ")
    s"""WITH
    base AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    keys AS ($bandSelects),
    cand AS (
      SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id,
        ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
      FROM keys x JOIN keys y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
    directed AS (
      SELECT a_id AS src, b_id AS dst, cos FROM cand
      UNION ALL SELECT b_id AS src, a_id AS dst, cos FROM cand),
    topk AS (
      SELECT src, dst, cos,
        row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
      FROM directed)
    SELECT x.src AS a_id, x.dst AS b_id, x.cos AS cos_sim,
      x.rnk AS rnk_ab, y.rnk AS rnk_ba
    FROM topk x JOIN topk y ON x.src = y.dst AND x.dst = y.src
    WHERE x.rnk <= 3 AND y.rnk <= 3 AND x.src < x.dst
    ORDER BY a_id, b_id"""
  }

  // ------------------------------------------------------------ text analysis

  val textQuality: String = s"""WITH t AS (
      SELECT doc_id, length(text) AS n_chars_obs,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars_obs, n_tokens, n_distinct,
      CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
      CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
      CAST(n_chars_obs - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_token_len,
      least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) *
            (CAST(n_distinct AS DOUBLE) / n_tokens) *
            (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) AS quality_score
    FROM t ORDER BY doc_id"""

  /** Source × quality-band matrix — mirrors
    * `TextAnalysis.sourceQualityMatrix`: band = least(4, floor(score·5))
    * on the identical composite IEEE chain; per-source band fractions. */
  val qualitySourceMatrix: String = s"""WITH t AS (
      SELECT source, len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS n_stop
      FROM documents),
    q AS (SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        least(CAST(4 AS BIGINT), CAST(floor(
          (least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) *
            (CAST(n_distinct AS DOUBLE) / n_tokens) *
            (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)) * 5) AS BIGINT))
          AS band
      FROM t),
    cells AS (SELECT source, band, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM q GROUP BY source, band),
    st AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS src_docs
      FROM cells GROUP BY source)
    SELECT cells.source, cells.band, cells.n_docs, cells.n_tokens,
      CAST(cells.n_docs AS DOUBLE) / st.src_docs AS band_frac
    FROM cells JOIN st USING (source)
    ORDER BY cells.source, cells.band"""

  /** Quality-gate threshold sweep — mirrors
    * `Corpus.qualityThresholdSweep` (default 6-threshold grid): the
    * quality composite per doc, conditional counts per cutoff. */
  val qualityThresholdSweep: String = s"""WITH t AS (
      SELECT len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS n_stop
      FROM documents),
    q AS (SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
        least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) *
          (CAST(n_distinct AS DOUBLE) / n_tokens) *
          (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) AS s
      FROM t),
    tot AS (SELECT count(*) AS dall,
        CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS tall FROM q),
    th(threshold) AS (VALUES (CAST(0.0 AS DOUBLE)), (CAST(0.1 AS DOUBLE)),
      (CAST(0.2 AS DOUBLE)), (CAST(0.3 AS DOUBLE)), (CAST(0.4 AS DOUBLE)),
      (CAST(0.5 AS DOUBLE)))
    SELECT th.threshold,
      count(CASE WHEN q.s >= th.threshold THEN 1 END) AS n_docs_kept,
      CAST(coalesce(sum(CASE WHEN q.s >= th.threshold THEN q.n_tokens END), 0)
        AS BIGINT) AS n_tokens_kept,
      CAST(count(CASE WHEN q.s >= th.threshold THEN 1 END) AS DOUBLE)
        / max(tot.dall) AS doc_frac,
      CAST(coalesce(sum(CASE WHEN q.s >= th.threshold THEN q.n_tokens END), 0)
        AS DOUBLE) / max(tot.tall) AS token_frac
    FROM th, q, tot
    GROUP BY th.threshold ORDER BY th.threshold"""

  /** Top-N vocabulary coverage — mirrors `TextAnalysis.vocabCoverage`
    * (anchors 100/1000/10000, frequency desc + token asc total order). */
  val vocabCoverage: String = """WITH
    f AS (SELECT tok, count(*) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok),
    r AS (SELECT *, row_number() OVER (ORDER BY freq DESC, tok) AS rk FROM f),
    tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM f),
    a(n_top) AS (VALUES (100), (1000), (10000))
    SELECT CAST(a.n_top AS BIGINT) AS n_top,
      count(*) AS n_types_used,
      CAST(sum(r.freq) AS BIGINT) AS covered_tokens,
      max(tot.total) AS total_tokens,
      CAST(sum(r.freq) AS DOUBLE) / max(tot.total) AS coverage
    FROM a, r, tot WHERE r.rk <= a.n_top
    GROUP BY a.n_top ORDER BY n_top"""

  /** Top-20 bigram collocations by lift — mirrors
    * `TextAnalysis.collocations` (minPairs = 5, k = 20): adjacent-pair
    * mint from the token list, unigram type table joined twice, lift as
    * the fixed-order IEEE chain (dbl(n_xy)·dbl(N)) / (dbl(n_x)·dbl(n_y)).
    * DuckDB lists are 1-based where Spark arrays are 0-based — both
    * sides index head/tail of the same split. */
  val vocabCollocations: String = """WITH
    d AS (SELECT string_split(text, ' ') AS l FROM documents),
    bg AS (SELECT l[i] || ' ' || l[i + 1] AS bigram
           FROM d, unnest(range(1, len(l))) AS t(i)),
    bc AS (SELECT bigram, count(*) AS n_pairs FROM bg GROUP BY bigram),
    u AS (SELECT unnest(l) AS tok FROM d),
    uc AS (SELECT tok, count(*) AS n FROM u GROUP BY tok),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM uc),
    sc AS (SELECT bc.bigram, bc.n_pairs, x.n AS n_x, y.n AS n_y,
             (CAST(bc.n_pairs AS DOUBLE) * CAST(tot.nn AS DOUBLE)) /
               (CAST(x.n AS DOUBLE) * CAST(y.n AS DOUBLE)) AS lift
           FROM bc, tot, uc x, uc y
           WHERE bc.n_pairs >= 5
             AND x.tok = string_split(bc.bigram, ' ')[1]
             AND y.tok = string_split(bc.bigram, ' ')[2]),
    r AS (SELECT *, row_number() OVER (ORDER BY lift DESC, bigram) AS rnk
          FROM sc)
    SELECT CAST(rnk AS BIGINT) AS rnk, bigram, n_pairs, n_x, n_y, lift
    FROM r WHERE rnk <= 20 ORDER BY rnk"""

  /** Length-distribution drift ledger — mirrors `Corpus.lengthDrift`
    * (bucketWidth = 100, maxBucket = 9, slices = even/odd source index):
    * integer ppm rates and absolute drift, no floats anywhere. */
  val corpusDrift: String = """WITH
    s AS (SELECT least(n_chars // 100, 9) AS bucket,
            (CAST(substr(source, 4) AS BIGINT) % 2 = 0) AS a
          FROM documents),
    p AS (SELECT bucket,
            count(*) FILTER (a) AS cnt_a,
            count(*) FILTER (NOT a) AS cnt_b
          FROM s GROUP BY bucket),
    t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS ta,
                 CAST(sum(cnt_b) AS BIGINT) AS tb FROM p)
    SELECT bucket, cnt_a, cnt_b,
      cnt_a * 1000000 // ta AS ppm_a,
      cnt_b * 1000000 // tb AS ppm_b,
      abs(cnt_a * 1000000 // ta - cnt_b * 1000000 // tb) AS drift_ppm
    FROM p, t ORDER BY bucket"""

  /** Subword-fertility ledger — mirrors `TextAnalysis.subwordFertility`:
    * per source, both token counts summed exactly, fertility one
    * division. */
  val vocabSubwordFertility: String = """WITH
    t AS (SELECT source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
            CAST(len(regexp_extract_all(text,
              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS re
          FROM documents)
    SELECT source, count(*) AS n_docs,
      CAST(sum(ws) AS BIGINT) AS word_tokens,
      CAST(sum(re) AS BIGINT) AS subword_tokens,
      CAST(CAST(sum(re) AS BIGINT) AS DOUBLE) / CAST(sum(ws) AS BIGINT)
        AS fertility
    FROM t GROUP BY source ORDER BY source"""

  /** Packing-efficiency sweep — mirrors `Packing.packEfficiencyCurve`
    * ({128, 256, 512, 1024}): one prefix sum, each window's bins pure
    * arithmetic on the same cumulative column. */
  val packEfficiencyCurve: String = """WITH
    t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM documents),
    c AS (SELECT doc_id, n_tokens,
            sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t),
    w(window_tokens) AS (VALUES (128), (256), (512), (1024)),
    per AS (SELECT w.window_tokens,
              max((c.cum - 1) // w.window_tokens) + 1 AS n_windows,
              count(CASE WHEN (c.cum - 1) // w.window_tokens >
                (c.cum - c.n_tokens) // w.window_tokens THEN 1 END)
                AS n_straddling,
              count(*) AS n_docs,
              CAST(sum(c.n_tokens) AS BIGINT) AS toks
            FROM c, w GROUP BY w.window_tokens)
    SELECT CAST(window_tokens AS BIGINT) AS window_tokens,
      CAST(n_windows AS BIGINT) AS n_windows,
      CAST(n_straddling AS BIGINT) AS n_straddling,
      CAST(n_straddling AS DOUBLE) / n_docs AS straddle_frac,
      CAST(toks AS DOUBLE) / (n_windows * window_tokens) AS mean_fill
    FROM per ORDER BY window_tokens"""

  /** Padding-waste ledger — mirrors `Packing.paddingWaste` (W = 512):
    * per length-octave exact pad-token bill of one-doc-per-sequence
    * training; all integer arithmetic, the waste fraction one IEEE
    * division of exact longs. */
  val packPaddingWaste: String = """WITH
    d AS (SELECT len(string_split(text, ' '))::BIGINT AS n FROM documents),
    o AS (SELECT CAST(len(bin(n)) - 1 AS BIGINT) AS octave,
            count(*) AS n_docs,
            CAST(sum(n) AS BIGINT) AS n_tokens,
            CAST(sum((n + 511) // 512) AS BIGINT) AS n_seqs_padded
          FROM d GROUP BY 1)
    SELECT octave, n_docs, n_tokens, n_seqs_padded,
      CAST(n_seqs_padded * 512 - n_tokens AS BIGINT) AS pad_tokens,
      CAST(n_seqs_padded * 512 - n_tokens AS DOUBLE)
        / (n_seqs_padded * 512) AS waste_frac
    FROM o ORDER BY octave"""

  val textTokens: String = """
    SELECT doc_id,
      len(string_split(text, ' ')) AS ws_tokens,
      len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS re_tokens,
      CAST(ceil(length(text)::DOUBLE / 4.0) AS BIGINT) AS bpe_est
    FROM documents ORDER BY doc_id"""

  def textLangid: String = {
    val words = Map(
      "en" -> Seq("the", "a", "of"), "de" -> Seq("der", "und", "die"),
      "es" -> Seq("el", "y", "los"), "fr" -> Seq("le", "et", "les"),
      "zh" -> Seq("的", "是", "了"))
    val scoreCols = words.toSeq.sortBy(_._1).map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString("(", ",", ")")
      s"len(list_filter(string_split(text, ' '), x -> x IN $inList))::BIGINT AS score_$l"
    }.mkString(",\n      ")
    // argmax by (score, lang), both descending — matches Spark greatest(struct)
    s"""WITH scores AS (
      SELECT doc_id, lang AS labeled_lang, $scoreCols FROM documents),
    u AS (
      SELECT doc_id, labeled_lang, cand, score,
        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
      FROM (
        SELECT doc_id, labeled_lang,
          unnest(['de','en','es','fr','zh']) AS cand,
          unnest([score_de, score_en, score_es, score_fr, score_zh]) AS score
        FROM scores))
    SELECT doc_id, labeled_lang, cand AS pred_lang, score AS pred_score
    FROM u WHERE rn = 1 ORDER BY doc_id"""
  }

  /** Gopher-style bigram repetition stats — mirrors
    * `TextAnalysis.repetitionStats`: bigrams with multiplicity, then the
    * top-bigram and duplicate-bigram occurrence fractions per doc. Sums of
    * BIGINT go HUGEINT in DuckDB, so `n_bigrams` is cast back explicitly. */
  val textRepetition: String = """WITH g AS (
      SELECT doc_id,
        unnest(list_transform(
          CASE WHEN len(string_split(text, ' ')) >= 2
               THEN range(1, len(string_split(text, ' ')))
               ELSE [] END,
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
      FROM documents),
    c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    a AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        max(c) AS top_c, count(*) AS n_distinct
      FROM c GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
      CAST(top_c AS DOUBLE) / n_bigrams AS top_bigram_frac,
      CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams AS dup_bigram_frac
    FROM a ORDER BY doc_id"""

  val textFingerprint: String = s"""
    SELECT doc_id,
      ${h31("text", 1000003L)} AS fp_full,
      list_min(list_transform(range(1, greatest(length(text) - 6, 2)),
        i -> ${h31("substr(text, i, 8)", 1000003L)})) AS fp_winnow
    FROM documents ORDER BY doc_id"""

  /** Corpus vocabulary head — mirrors `TextAnalysis.vocabulary`. */
  val vocabTopk: String = """WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    SELECT tok, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
    FROM t GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 50"""

  /** tf·idf-ratio keyword head — mirrors `TextAnalysis.tfidfTopK`: score =
    * CAST(tf·N AS DOUBLE)/df is exact-integer arithmetic plus ONE IEEE
    * division, so both engines produce identical bits; ties break on tok. */
  val textTfidf: String = """WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (tok) CROSS JOIN n),
    ranked AS (
      SELECT doc_id,
        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk,
        tok, tf, df, score
      FROM scored)
    SELECT doc_id, rnk, tok, tf, df, score
    FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk"""

  /** BM25 top-10 for the query {stream, hash, window} — mirrors
    * `TextAnalysis.bm25TopK(k1=1.2, b=0.75)`: rational idf
    * `(N−df+0.5)/(df+0.5)`, per-term scores summed left-to-right, every
    * constant written as the same IEEE expression Spark evaluates
    * (`(1.2 + 1.0)` not `2.2` — the engines must ADD the same doubles,
    * not parse a different literal). */
  val textBm25: String = {
    val terms = Seq("stream", "hash", "window")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf$i" }.mkString(",\n        ")
    val dfCols = terms.indices.map(i =>
      s"count(CASE WHEN tf$i > 0 THEN 1 END) AS df$i").mkString(",\n        ")
    val termScores = terms.indices.map { i =>
      s"""((CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
         * (CAST(tf$i AS DOUBLE) * (1.2 + 1.0))
         / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))"""
    }.mkString(" + ")
    s"""WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tf AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        $tfCols
      FROM base),
    stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
        $dfCols
      FROM tf),
    scored AS (
      SELECT doc_id, dl,
        $termScores AS bm25
      FROM tf CROSS JOIN (
        SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM stats))
    SELECT doc_id, dl AS n_tokens, bm25
    FROM scored WHERE bm25 > 0.0
    ORDER BY bm25 DESC, doc_id LIMIT 10"""
  }

  /** Filter-funnel verdict per document — mirrors `Corpus.filterFunnel`
    * (length, quality, repetition, FUZZY near-dup dedup gates). The
    * quality and repetition expressions are byte-for-byte the validated
    * `text_quality` / `text_repetition` forms; the dedup gate is the
    * validated `dedup_clusters` transitive closure with the
    * keep-best-by-quality retention policy (pass = doc is its
    * component's quality argmax, doc_id asc tie-break). */
  def corpusFilter: String = s"""WITH RECURSIVE $minhashSigCte,
    q AS (
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) *
          (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' '))) *
          (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS DOUBLE)
            / len(string_split(text, ' '))) AS quality_score
      FROM documents),
    g AS (
      SELECT doc_id,
        unnest(list_transform(
          CASE WHEN len(string_split(text, ' ')) >= 2
               THEN range(1, len(string_split(text, ' ')))
               ELSE [] END,
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
      FROM documents),
    c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    r AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_bigram_frac
      FROM c GROUP BY doc_id),
    ${scalablePairsCtes()},
    $nearDupClosureCtes,
    cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    d AS (
      SELECT cl.doc_id,
        row_number() OVER (PARTITION BY cl.cluster_id
          ORDER BY q.quality_score DESC, cl.doc_id) = 1 AS pass_dedup
      FROM cl JOIN q USING (doc_id))
    SELECT q.doc_id,
      q.n_tokens >= 20 AS pass_length,
      q.quality_score >= 0.2 AS pass_quality,
      coalesce(r.top_bigram_frac <= 0.1, true) AS pass_repetition,
      d.pass_dedup,
      (q.n_tokens >= 20 AND q.quality_score >= 0.2
        AND coalesce(r.top_bigram_frac <= 0.1, true) AND d.pass_dedup) AS kept
    FROM q LEFT JOIN r USING (doc_id) JOIN d USING (doc_id)
    ORDER BY q.doc_id"""

  /** Per-source quality percentiles — mirrors `Corpus.qualityPercentiles`
    * (2^20-quantized scores, exact interpolating quantile, the validated
    * `cdc_lag_percentiles` parity recipe). */
  def qualityPercentiles: String = s"""WITH t AS (
      SELECT doc_id, source,
        least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) *
          (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' '))) *
          (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS DOUBLE)
            / len(string_split(text, ' '))) AS quality_score
      FROM documents),
    j AS (
      SELECT source, CAST(floor(quality_score * 1048576.0) AS BIGINT) AS qs FROM t)
    SELECT source, count(*) AS n_docs,
      round(quantile_cont(qs, 0.25), 3) AS p25_q20,
      round(quantile_cont(qs, 0.5), 3) AS p50_q20,
      round(quantile_cont(qs, 0.75), 3) AS p75_q20,
      max(qs) AS max_q20
    FROM j GROUP BY source ORDER BY source"""

  /** Winnowing-fingerprint dedup candidates — mirrors
    * `Dedup.winnowCandidates` over the `fp_winnow` minimizer. */
  val dedupWinnow: String = s"""WITH f AS (
      SELECT doc_id,
        list_min(list_transform(range(1, greatest(length(text) - 6, 2)),
          i -> ${h31("substr(text, i, 8)", 1000003L)})) AS fp_winnow
      FROM documents)
    SELECT fp_winnow, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM f GROUP BY fp_winnow HAVING count(*) >= 2
    ORDER BY fp_winnow"""

}
