package graft

/** DuckDB oracle SQL — multimodal (decode/phash/frame) oracles, the CDC
  * harness drills (evaluate/broker/throttle), embedding-health ledgers
  * and the ANN curve/matryoshka family.
  *
  * One link of the ordered `Oracles` trait chain (split from the
  * original single object purely for file-size hygiene). The chain
  * preserves the original top-down DEFINITION ORDER: vals initialize
  * in linearization order, so a member may only reference members of
  * the same or an earlier link — which is why a handful of members
  * sit next to the CTE helpers they depend on rather than with their
  * nominal domain.
  */
private[graft] trait OraclesMediaSql extends OraclesAnnSql {
  /** REAL resize — mirrors `Multimodal.resizeBatch`: the payload is a
    * genuine PNG rasterised from the text (pixel i = char i mod len, see
    * `Multimodal.encodePng`), decoded with `javax.imageio` and
    * nearest-neighbor decimated by 2 (out(x,y)=in(2x,2y)). The oracle
    * recomputes the decimated byte stream arithmetically — resized byte k
    * is the char at (2·(k÷w₂)·w + 2·(k mod w₂)) mod n — so the md5 pins
    * encode→decode→resample end-to-end without a SQL-side codec. ASCII
    * corpus ⇒ char codes = bytes. */
  val mmResize: String = """
    WITH base AS (
      SELECT doc_id, text, len(text) AS n,
        8 + len(text) % 24 AS w, 8 + len(text) % 16 AS h
      FROM documents)
    SELECT doc_id,
      w // 2 AS out_width, h // 2 AS out_height,
      (w // 2) * (h // 2) AS out_bytes,
      md5(array_to_string(list_transform(range(0, (w // 2) * (h // 2)),
        k -> substr(text,
          CAST((2 * (k // (w // 2)) * w + 2 * (k % (w // 2))) % n AS INT) + 1, 1)),
        '')) AS resized_md5
    FROM base ORDER BY doc_id"""

  /** Real decoded metadata — dims are the generator contract `dimsFor`
    * recovered by an actual `ImageIO.read`, and sum_red is the decoded
    * red-channel total: cyclic sum of the text's code points over
    * width·height pixels = full_cycles·Σall + Σprefix(remainder). */
  val mmBinaryMeta: String = """
    WITH base AS (
      SELECT doc_id, text, greatest(len(text), 1) AS n,
        8 + len(text) % 24 AS width, 8 + len(text) % 16 AS height
      FROM documents)
    SELECT doc_id, width, height, 1 + len(text) % 120 AS n_frames,
      ((width * height) // n) *
        list_reduce(list_prepend(0::BIGINT,
          list_transform(split(text, ''), c -> ascii(c)::BIGINT)),
          (a, b) -> a + b) +
      list_reduce(list_prepend(0::BIGINT,
        list_transform(split(substr(text, 1, CAST((width * height) % n AS INT)), ''),
          c -> ascii(c)::BIGINT)),
        (a, b) -> a + b) AS sum_red
    FROM base ORDER BY doc_id"""

  /** Pixel-profile ledger — mirrors `Multimodal.pixelProfile`: per
    * modality the per-frame pixel mass, cyclic red-channel total
    * (full_cycles·Σall + Σprefix — the `mm_binary_meta` arithmetic) and
    * its mean, plus the decoded-dimension envelope. */
  val mmPixelProfile: String = """WITH
    base AS (
      SELECT text, greatest(len(text), 1) AS n,
        8 + len(text) % 24 AS w, 8 + len(text) % 16 AS h,
        1 + len(text) % 120 AS f
      FROM documents),
    m AS (
      SELECT CASE WHEN f = 1 THEN 'image'
                  WHEN f <= 60 THEN 'clip'
                  ELSE 'video' END AS modality,
        w, h, CAST(w AS BIGINT) * h AS wh,
        ((w * h) // n) *
          list_reduce(list_prepend(0::BIGINT,
            list_transform(split(text, ''), c -> ascii(c)::BIGINT)),
            (a, b) -> a + b) +
        list_reduce(list_prepend(0::BIGINT,
          list_transform(split(substr(text, 1, CAST((w * h) % n AS INT)), ''),
            c -> ascii(c)::BIGINT)),
          (a, b) -> a + b) AS sum_red
      FROM base)
    SELECT modality, count(*) AS n_docs,
      CAST(sum(wh) AS BIGINT) AS n_pixels,
      CAST(sum(sum_red) AS BIGINT) AS sum_red,
      CAST(CAST(sum(sum_red) AS BIGINT) AS DOUBLE)
        / CAST(sum(wh) AS BIGINT) AS mean_red,
      CAST(min(w) AS BIGINT) AS min_width, CAST(max(w) AS BIGINT) AS max_width,
      CAST(min(h) AS BIGINT) AS min_height, CAST(max(h) AS BIGINT) AS max_height
    FROM m GROUP BY modality ORDER BY modality"""

  /** Modality-mix ledger — mirrors `Multimodal.modalityMix` over the
    * decoded metadata: frame count 1 = image, 2..60 = clip, >60 = video;
    * the oracle predicts dims/frames from the generator contract
    * (`dimsFor`) while the engine reads them off a real decode. */
  /** Aspect-bucket ledger — mirrors `Multimodal.aspectBuckets`: dims
    * re-derived arithmetically (w = 8+len%24, h = 8+len%16, the
    * `dimsFor` contract the decode path realizes), nearest rung by the
    * same exact-integer order key `|w·q − p·h|·(36/q)·8 + idx`
    * (`arg_min` ↔ engine `min_by`), ceil-division letterbox, shares as
    * single IEEE divisions of exact longs. */
  val mmAspectBuckets: String = """WITH
    base AS (SELECT doc_id, CAST(8 + len(text) % 24 AS BIGINT) AS w,
                    CAST(8 + len(text) % 16 AS BIGINT) AS h FROM documents),
    ladder(idx, bucket, p, q, mult) AS (VALUES
      (0,'1:2',1,2,18),(1,'3:4',3,4,9),(2,'1:1',1,1,36),(3,'4:3',4,3,12),
      (4,'16:9',16,9,4),(5,'2:1',2,1,36),(6,'3:1',3,1,36)),
    pick AS (
      SELECT d.doc_id, d.w, d.h,
        arg_min(struct_pack(bucket := l.bucket, p := l.p, q := l.q),
                abs(d.w*l.q - l.p*d.h) * l.mult * 8 + l.idx) AS b
      FROM base d CROSS JOIN ladder l
      GROUP BY d.doc_id, d.w, d.h),
    perdoc AS (
      SELECT b['bucket'] AS bucket, w*h AS px,
        CASE WHEN w*b['q'] >= b['p']*h
             THEN w * ((w*b['q'] + b['p'] - 1) // b['p'])
             ELSE h * ((h*b['p'] + b['q'] - 1) // b['q']) END AS padded
      FROM pick),
    agg AS (SELECT bucket, count(*) AS n_images, sum(px) AS native_pixels,
              sum(padded) AS padded_pixels
            FROM perdoc GROUP BY bucket),
    tot AS (SELECT CAST(sum(n_images) AS BIGINT) AS tn FROM agg)
    SELECT bucket, n_images,
      CAST(n_images AS DOUBLE) / tn AS image_share,
      CAST(native_pixels AS BIGINT) AS native_pixels,
      CAST(padded_pixels AS BIGINT) AS padded_pixels,
      CAST(CAST(padded_pixels AS BIGINT) - CAST(native_pixels AS BIGINT)
           AS DOUBLE) / CAST(padded_pixels AS BIGINT) AS waste_frac
    FROM agg, tot ORDER BY bucket"""

  val mmModalityMix: String = """WITH
    base AS (
      SELECT (8 + len(text) % 24) * (8 + len(text) % 16) AS wh,
        1 + len(text) % 120 AS f
      FROM documents),
    c AS (SELECT CASE WHEN f = 1 THEN 'image'
                      WHEN f <= 60 THEN 'clip'
                      ELSE 'video' END AS modality,
            f, CAST(wh AS BIGINT) * f AS px
          FROM base),
    a AS (SELECT modality, count(*) AS n_docs,
            CAST(sum(f) AS BIGINT) AS n_frames,
            CAST(sum(px) AS BIGINT) AS n_pixels
          FROM c GROUP BY modality),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
            CAST(sum(n_pixels) AS BIGINT) AS tp FROM a)
    SELECT a.modality, a.n_docs, a.n_frames, a.n_pixels,
      CAST(a.n_docs AS DOUBLE) / t.td AS doc_share,
      CAST(a.n_pixels AS DOUBLE) / t.tp AS pixel_share
    FROM a, t ORDER BY a.modality"""

  /** Harness evaluate() report on the polling lane — composes the diffLane
    * counts, delete capture, ordering scan, and state diff
    * (`harness/verifier/index.js:169-205`). */
  val cdcEvaluate: String = s"""WITH $stateCte, $stateFinalCte, $pollCte,
    expected AS (
      SELECT tbl || '::' || $opCodeExpr || '::' || pk AS key, t AS etime,
             row_number() OVER (PARTITION BY tbl || '::' || $opCodeExpr || '::' || pk
                                ORDER BY lsn) AS ordinal
      FROM st),
    actual AS (
      SELECT tbl, tbl || '::' || op_code || '::' || pk AS key, poll_ts AS atime, src_lsn,
             row_number() OVER (PARTITION BY tbl || '::' || op_code || '::' || pk
                                ORDER BY src_lsn) AS ordinal
      FROM poll),
    pairs AS (
      SELECT CASE WHEN e.key IS NOT NULL AND a.key IS NOT NULL THEN 'matched'
                  WHEN e.key IS NOT NULL THEN 'missing' ELSE 'extra' END AS status
      FROM expected e FULL OUTER JOIN actual a USING (key, ordinal)),
    poll_soft_state AS (
      SELECT tbl, pk, after_val AS val, after_k AS k
      FROM (SELECT *, row_number() OVER (PARTITION BY tbl, pk ORDER BY poll_window DESC) AS rn
            FROM poll) WHERE rn = 1 AND op_code <> 'd'),
    smism AS (
      SELECT count(*) AS m FROM state_final l FULL OUTER JOIN poll_soft_state r
        ON l.tbl = r.tbl AND l.pk = r.pk
      WHERE l.tbl IS NULL OR r.tbl IS NULL
         OR (l.val IS DISTINCT FROM r.val) OR (l.k IS DISTINCT FROM r.k)),
    inv AS (
      SELECT count(CASE WHEN src_lsn < run_max THEN 1 END) AS n FROM (
        SELECT src_lsn, max(src_lsn) OVER (PARTITION BY tbl ORDER BY atime, src_lsn
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
        FROM actual)),
    agg AS (
      SELECT
        (SELECT count(*) FROM pairs WHERE status = 'matched') AS matched,
        (SELECT count(*) FROM pairs WHERE status = 'missing') AS missing,
        (SELECT count(*) FROM pairs WHERE status = 'extra') AS extra,
        (SELECT count(*) FROM ops WHERE op = 'delete') AS deletes_expected,
        (SELECT count(*) FROM poll WHERE op_code = 'd') AS deletes_captured,
        (SELECT n FROM inv) AS ordering_issues,
        (SELECT m FROM smism) AS state_mismatches)
    SELECT metric, value FROM (
      SELECT unnest(['matched','missing','extra','deletes_expected','deletes_captured',
                     'ordering_issues','state_mismatches','pass']) AS metric,
             unnest([matched, missing, extra, deletes_expected, deletes_captured,
                     ordering_issues, state_mismatches,
                     CASE WHEN missing = 0 AND ordering_issues = 0 AND state_mismatches = 0
                          THEN 1 ELSE 0 END]) AS value
      FROM agg)
    ORDER BY metric"""

  /** The evaluate() report over the LOG lane — lossless capture, so the
    * report must come out all-zero with pass = 1 (computed, not assumed). */
  val cdcEvaluateLog: String = s"""WITH $stateCte, $stateFinalCte, $logLaneCte,
    expected AS (
      SELECT tbl || '::' || $opCodeExpr || '::' || pk AS key, t AS etime,
             row_number() OVER (PARTITION BY tbl || '::' || $opCodeExpr || '::' || pk
                                ORDER BY lsn) AS ordinal
      FROM st),
    actual AS (
      SELECT tbl, tbl || '::' || op_code || '::' || pk AS key, emitted_ts AS atime, lsn,
             row_number() OVER (PARTITION BY tbl || '::' || op_code || '::' || pk
                                ORDER BY lsn) AS ordinal
      FROM log_lane),
    pairs AS (
      SELECT CASE WHEN e.key IS NOT NULL AND a.key IS NOT NULL THEN 'matched'
                  WHEN e.key IS NOT NULL THEN 'missing' ELSE 'extra' END AS status
      FROM expected e FULL OUTER JOIN actual a USING (key, ordinal)),
    log_state AS (
      SELECT tbl, pk, after_val AS val, after_k AS k
      FROM (SELECT *, row_number() OVER (PARTITION BY tbl, pk ORDER BY lsn DESC) AS rn
            FROM log_lane) WHERE rn = 1 AND op_code <> 'd'),
    smism AS (
      SELECT count(*) AS m FROM state_final l FULL OUTER JOIN log_state r
        ON l.tbl = r.tbl AND l.pk = r.pk
      WHERE l.tbl IS NULL OR r.tbl IS NULL
         OR (l.val IS DISTINCT FROM r.val) OR (l.k IS DISTINCT FROM r.k)),
    inv AS (
      SELECT count(CASE WHEN lsn < run_max THEN 1 END) AS n FROM (
        SELECT lsn, max(lsn) OVER (PARTITION BY tbl ORDER BY atime, lsn
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
        FROM actual)),
    agg AS (
      SELECT
        (SELECT count(*) FROM pairs WHERE status = 'matched') AS matched,
        (SELECT count(*) FROM pairs WHERE status = 'missing') AS missing,
        (SELECT count(*) FROM pairs WHERE status = 'extra') AS extra,
        (SELECT count(*) FROM ops WHERE op = 'delete') AS deletes_expected,
        (SELECT count(*) FROM log_lane WHERE op_code = 'd') AS deletes_captured,
        (SELECT n FROM inv) AS ordering_issues,
        (SELECT m FROM smism) AS state_mismatches)
    SELECT metric, value FROM (
      SELECT unnest(['matched','missing','extra','deletes_expected','deletes_captured',
                     'ordering_issues','state_mismatches','pass']) AS metric,
             unnest([matched, missing, extra, deletes_expected, deletes_captured,
                     ordering_issues, state_mismatches,
                     CASE WHEN missing = 0 AND ordering_issues = 0 AND state_mismatches = 0
                          THEN 1 ELSE 0 END]) AS value
      FROM agg)
    ORDER BY metric"""

  /** Apply-on-commit commit-floor (`src/changefeed/model.ts:169-244`):
    * applied_at = running max of txn delivery-completion over commit order. */
  val cdcCommitFloor: String = s"""WITH $opsCte,
    drifted AS (
      SELECT *, t + (${h31("'tx-' || CAST(lsn AS VARCHAR)", 9973)} % 2) * 50 AS available_at
      FROM ops),
    txns AS (
      SELECT event_id // 3 AS tx_num,
             max(t) + 100 AS commit_ts,
             min(lsn) AS first_lsn,
             max(available_at) AS ready_at
      FROM drifted GROUP BY 1)
    SELECT 'tx-' || CAST(tx_num AS VARCHAR) AS tx_id, commit_ts, first_lsn, ready_at,
      row_number() OVER (ORDER BY commit_ts, first_lsn) AS apply_order,
      max(ready_at) OVER (ORDER BY commit_ts, first_lsn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS applied_at,
      max(ready_at) OVER (ORDER BY commit_ts, first_lsn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ready_at AS held_ms
    FROM txns ORDER BY apply_order"""

  /** Broker per-tick delivery schedule (`src/changefeed/model.ts:246-274`):
    * deliver_tick = max(availability tick, queue-position / per-tick cap). */
  val cdcBrokerDelivery: String = s"""WITH $opsCte,
    routed AS (
      SELECT lsn, ${h31("pk", 9973)} % 3 AS part,
             t + (${h31("'tx-' || CAST(lsn AS VARCHAR)", 9973)} % 2) * 50 AS available_at
      FROM ops),
    q AS (
      SELECT part, lsn, available_at,
             row_number() OVER (PARTITION BY part ORDER BY available_at, lsn) AS queue_pos
      FROM routed)
    SELECT part, lsn, available_at, queue_pos,
      greatest(CAST(ceil(available_at / 50.0) AS BIGINT),
               CAST(ceil(queue_pos / 4.0) AS BIGINT)) AS deliver_tick,
      greatest(CAST(ceil(available_at / 50.0) AS BIGINT),
               CAST(ceil(queue_pos / 4.0) AS BIGINT)) * 50 AS deliver_ms
    FROM q ORDER BY part, queue_pos"""

  /** Stable row hash of the final destination state (canonical concat form;
    * the verifier's stable-equality machinery, `index.js:78-136`). */
  val cdcStateHash: String = s"""WITH $stateCte, $stateFinalCte
    SELECT tbl, pk,
      sha256(tbl || '|' || pk || '|' ||
             coalesce(CAST(val AS VARCHAR), '') || '|' ||
             coalesce(CAST(k AS VARCHAR), '') || '|' ||
             CAST(version AS VARCHAR) || '|' || CAST(updated_at AS VARCHAR)) AS row_hash
    FROM state_final ORDER BY tbl, pk"""

  val qLineitemOrdersJoin: String = """
    SELECT o_orderpriority, count(*) AS cnt,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val qEventsUserTopk: String = """
    SELECT user_id, count(*) AS cnt FROM events
    GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10"""

  /** Same rows as `qLineitemOrdersJoin` — the Spark side must reproduce
    * them through the bucketed co-located join path (storage layout must
    * never change results). */
  val qBucketedJoin: String = qLineitemOrdersJoin

  /** Event op-set + term search over the haystack (`web/App.tsx:1420-1465`). */
  val cdcEventSearch: String = s"""WITH $stateCte, $logLaneCte
    SELECT op_code, count(*) AS cnt
    FROM log_lane
    WHERE op_code IN ('c', 'd')
      AND lower(tbl || ' ' || op_code || ' ' || pk) LIKE '%7%'
    GROUP BY op_code ORDER BY op_code"""

  /** Aggregate bus totals across lanes (`web/App.tsx:2783-2802`). */
  val cdcBusTotals: String = s"""WITH $stateCte, $logLaneCte, $trigLaneCte, $pollCte,
    lanes AS (
      SELECT 'log' AS method, count(*) AS produced FROM log_lane
      UNION ALL SELECT 'poll', count(*) FROM poll
      UNION ALL SELECT 'trigger', count(*) FROM trig_lane)
    SELECT method, produced FROM lanes
    UNION ALL
    SELECT 'total', CAST(sum(produced) AS BIGINT) FROM lanes
    ORDER BY method"""

  val qPartPushdown: String = """
    SELECT p_brand, count(*) AS cnt,
      CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail
    FROM part WHERE p_size > 25 AND p_type = 'ECONOMY'
    GROUP BY p_brand ORDER BY p_brand"""

  /** Per-label norm profile — mirrors `Similarity.normProfile`: norms
    * quantized to floor(norm·2²⁰); the published checksum is the sum
    * reduced modulo ChecksumPrime (the exportManifest contract) so no
    * DECIMAL/HUGEINT type crosses the output boundary; the mean divides
    * the full (overflow-proof) sum once. */
  val embNormProfile: String = s"""WITH
    n AS (SELECT label,
            CAST(floor(${normSql("embedding")} * 1048576.0) AS BIGINT) AS nq
          FROM embeddings)
    SELECT label, count(*) AS n_vecs,
      CAST(sum(nq % 1073741789) % 1073741789 AS BIGINT) AS sum_norm_qm,
      min(nq) AS min_norm_q, max(nq) AS max_norm_q,
      CAST(sum(nq) AS DOUBLE) / 1048576.0 / count(*) AS mean_norm
    FROM n GROUP BY label ORDER BY label"""

  /** Anisotropy audit — mirrors `Similarity.centroidCone`: integer
    * per-dimension sums build the exact centroid (the Lloyd step with one
    * list), per-row centroid-cosines quantize to BIGINT before the
    * rollup. */
  val embCentroidCone: String = s"""WITH
    comps AS (
      SELECT t.i,
        CAST(sum(CAST(floor(e.embedding[t.i]::DOUBLE * 1048576.0) AS BIGINT))
          AS BIGINT) AS s,
        count(*) AS cnt
      FROM embeddings e, range(1, 65) t(i)
      GROUP BY t.i),
    cent AS (
      SELECT list(s::DOUBLE / (1048576.0 * cnt) ORDER BY i) AS c_emb
      FROM comps),
    centn AS (SELECT c_emb, ${normSql("c_emb")} AS c_nrm FROM cent),
    scored AS (
      SELECT c.c_nrm,
        CAST(floor(${dotSql("e.embedding", "c.c_emb")}
          / (${normSql("e.embedding")} * c.c_nrm) * 1048576.0) AS BIGINT)
          AS cq
      FROM embeddings e, centn c)
    SELECT count(*) AS n_vecs, c_nrm AS centroid_norm,
      CAST(CAST(sum(cq) AS BIGINT) AS DOUBLE) / 1048576.0 / count(*)
        AS mean_cos,
      min(cq) AS min_cos_q, max(cq) AS max_cos_q
    FROM scored GROUP BY c_nrm"""

  /** Per-dimension variance — mirrors `Similarity.dimVariance`:
    * components quantized to floor(x·2²⁰); the published Σx² checksum is
    * reduced modulo ChecksumPrime (exportManifest contract, no DECIMAL
    * crosses the output boundary) while the variance divides the full
    * overflow-proof sum once. */
  val embDimVariance: String = """WITH
    x AS (
      SELECT CAST(t.i - 1 AS INTEGER) AS pos,
        CAST(floor(e.embedding[t.i]::DOUBLE * 1048576.0) AS BIGINT) AS xq
      FROM embeddings e, range(1, 65) t(i)),
    s AS (
      SELECT pos, count(*) AS n, CAST(sum(xq) AS BIGINT) AS sum_q,
        CAST(sum((xq * xq) % 1073741789) % 1073741789 AS BIGINT) AS sumsq_qm,
        CAST(sum(xq * xq) AS DOUBLE) AS sumsq_d
      FROM x GROUP BY pos)
    SELECT pos, n, sum_q, sumsq_qm,
      ((sumsq_d / n)
        - (CAST(sum_q AS DOUBLE) / n) * (CAST(sum_q AS DOUBLE) / n))
        / (1048576.0 * 1048576.0) AS variance
    FROM s ORDER BY pos"""

  val annIvfTopK: String = s"""WITH $ivfCtes
    SELECT q_id, rnk, n_id, cos AS cos_sim
    FROM topk WHERE rnk <= 3 ORDER BY q_id, rnk"""

  /** Three CTEs quantizing the `embedding` of `ranked` rows selected by
    * `pred` — mirrors `Similarity.withQuantized` applied to the IVF
    * assignment/probe frames. Emits `<p>q (vec_id, c_id, qvec, qnrm)`. */
  protected def sqCte(p: String, pred: String): String = s"""
    ${p}0 AS (
      SELECT vec_id, c_id, embedding,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, 65), i -> abs(embedding[i]::DOUBLE))),
          (a, b) -> greatest(a, b)) AS mx
      FROM ranked WHERE $pred),
    ${p}1 AS (
      SELECT vec_id, c_id,
        list_transform(range(1, 65),
          i -> floor(embedding[i]::DOUBLE /
                     (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5)) AS qvec
      FROM ${p}0),
    ${p}q AS (
      SELECT vec_id, c_id, qvec,
        greatest(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, 65), i -> qvec[i] * qvec[i])),
          (acc, x) -> acc + x)), 1e-300) AS qnrm
      FROM ${p}1)"""

  /** IVF-SQ — the validated IVF CTEs for list assignment + probe
    * selection (float centroids), with candidate scoring on the int8
    * codes. Mirrors `Similarity.ivfSqTopK`. */
  val annIvfSqTopK: String = s"""WITH $ivfCtes,
    ${sqCte("sqa", "c_rank = 1")},
    ${sqCte("sqp", "c_rank <= 4 AND vec_id < 10")},
    sq_scored AS (
      SELECT p.vec_id AS q_id, a.vec_id AS n_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, 65), i -> p.qvec[i] * a.qvec[i])),
          (acc, x) -> acc + x) / (p.qnrm * a.qnrm) AS cos_q
      FROM sqpq p JOIN sqaq a ON p.c_id = a.c_id
      WHERE p.vec_id <> a.vec_id),
    sq_topk AS (
      SELECT q_id, n_id, cos_q,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_q DESC, n_id) AS rnk
      FROM sq_scored)
    SELECT q_id, rnk, n_id, cos_q
    FROM sq_topk WHERE rnk <= 3 ORDER BY q_id, rnk"""

  /** Per-cluster profile — mirrors `Similarity.clusterProfile`: the
    * validated 2-iteration Lloyd CTEs, members scored against their
    * winning centroid, cohesion = Σ floor(cos·2²⁰) (exact BIGINT) over
    * 2²⁰·n, majority label ties on the smaller id. */
  val annClusterProfile: String = s"""WITH
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    cents0 AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < 16),
    ${ivfAssignCte("assign1", "cents0")},
    ${ivfLloydStep("assign1", "sums1", "cent1")},
    ${ivfAssignCte("assign2", "cent1n")},
    ${ivfLloydStep("assign2", "sums2", "cent2")},
    rankedc AS (
      SELECT n.vec_id, c.c_id,
        ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS c_cos,
        row_number() OVER (PARTITION BY n.vec_id
          ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.c_id) AS r
      FROM n, cent2n c),
    member AS (
      SELECT rc.vec_id, rc.c_id AS list_id,
        CAST(floor(rc.c_cos * 1048576.0) AS BIGINT) AS qcos, e.label
      FROM rankedc rc JOIN embeddings e USING (vec_id) WHERE rc.r = 1),
    bylabel AS (
      SELECT list_id, label, count(*) AS n, CAST(sum(qcos) AS BIGINT) AS qsum
      FROM member GROUP BY list_id, label),
    prof AS (
      SELECT list_id, CAST(sum(n) AS BIGINT) AS n_vecs, count(*) AS n_labels,
        CAST(sum(qsum) AS BIGINT) AS qall
      FROM bylabel GROUP BY list_id),
    top AS (
      SELECT list_id, label AS top_label, n AS top_label_n,
        row_number() OVER (PARTITION BY list_id ORDER BY n DESC, label) AS r
      FROM bylabel)
    SELECT p.list_id, p.n_vecs, p.n_labels, t.top_label, t.top_label_n,
      CAST(p.qall AS DOUBLE) / (1048576.0 * p.n_vecs) AS cohesion
    FROM prof p JOIN top t USING (list_id) WHERE t.r = 1 ORDER BY p.list_id"""

  /** Recall@3 of the IVF probe vs brute force — mirrors
    * `Similarity.ivfRecall` (same k on both sides; n_hits/k is one
    * small-integer division, bit-stable). */
  val annIvfRecall: String = s"""WITH $ivfCtes,
    ivf AS (SELECT q_id, n_id FROM topk WHERE rnk <= 3),
    bscored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    branked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM bscored),
    exact AS (SELECT q_id, n_id FROM branked WHERE rnk <= 3),
    hits AS (
      SELECT e.q_id, count(*) AS n_hits
      FROM exact e JOIN ivf USING (q_id, n_id) GROUP BY e.q_id)
    SELECT q.q_id, coalesce(h.n_hits, 0) AS n_hits,
      CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 3 AS recall_at_k
    FROM (SELECT DISTINCT q_id FROM exact) q LEFT JOIN hits h USING (q_id)
    ORDER BY q_id"""

  /** SemDeDup — mirrors `Similarity.semDedup`: 2-iteration quantized
    * Lloyd clusters (the validated IVF CTE pieces), members ranked by
    * ASCENDING centroid cosine (vec_id ties), each screened against the
    * max cosine to any prior-ranked cluster-mate. */
  /** Incremental IVF assignment — mirrors `Similarity.ivfIncrementalAssign`
    * over the arrival batch SparkEntry synthesizes (reversed embeddings of
    * vec_id < 50, ids offset by 1e6): nearest final-Lloyd centroid by
    * cosine, ties to the smaller c_id, NO retraining. The reversal is the
    * explicit index transform (no list_reverse dependency) and both
    * engines fold the reversed array left-to-right, so the norms/dots
    * match bit-for-bit. */
  val annIvfIncremental: String = s"""WITH $ivfCtes,
    arr0 AS (
      SELECT vec_id + 1000000 AS vec_id,
        list_transform(range(1, 65), i -> embedding[65 - i]) AS embedding
      FROM embeddings WHERE vec_id < 50),
    arrn AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM arr0),
    arrsc AS (
      SELECT a.vec_id, c.c_id,
        ${dotSql("a.embedding", "c.c_emb")} / (a.nrm * c.c_nrm) AS cos_c,
        row_number() OVER (PARTITION BY a.vec_id
          ORDER BY ${dotSql("a.embedding", "c.c_emb")} / (a.nrm * c.c_nrm) DESC, c.c_id) AS r
      FROM arrn a, cent2n c)
    SELECT vec_id, c_id AS list_id, cos_c FROM arrsc WHERE r = 1 ORDER BY vec_id"""

  def annSemDedup(eps: Double, band: Long = 0L): String = {
    val bandCond =
      if (band > 0) s" AND a.rnk >= b.rnk - $band" else ""
    s"""WITH
    n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    cents0 AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n WHERE vec_id < 16),
    ${ivfAssignCte("assign1", "cents0")},
    ${ivfLloydStep("assign1", "sums1", "cent1")},
    ${ivfAssignCte("assign2", "cent1n")},
    ${ivfLloydStep("assign2", "sums2", "cent2")},
    sem AS (
      SELECT vec_id, embedding, nrm, c_id AS list_id, c_cos FROM (
        SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
          ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS c_cos,
          row_number() OVER (PARTITION BY n.vec_id
            ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.c_id) AS r
        FROM n, cent2n c) WHERE r = 1),
    memb AS (
      SELECT *, row_number() OVER (PARTITION BY list_id ORDER BY c_cos ASC, vec_id) AS rnk
      FROM sem),
    prior AS (
      SELECT b.vec_id, max(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)) AS mp
      FROM memb a JOIN memb b ON a.list_id = b.list_id AND a.rnk < b.rnk$bandCond
      GROUP BY b.vec_id)
    SELECT m.vec_id, m.list_id, m.rnk,
      coalesce(p.mp, -1.0) AS max_prior_sim,
      coalesce(p.mp, -1.0) < $eps AS kept
    FROM memb m LEFT JOIN prior p USING (vec_id)
    ORDER BY m.vec_id"""
  }

  /** Source↔sink verify counts via both-direction anti-joins
    * (`scenarios/01-canonical-reference/verifier/verify.mjs:131-221`). */
  val cdcVerifyCounts: String = """WITH
    source AS (SELECT c_custkey AS id FROM customer),
    sink AS (
      SELECT id FROM source WHERE id % 50 <> 0
      UNION ALL SELECT id + 1000000 FROM source WHERE id < 5)
    SELECT metric, cnt FROM (
      SELECT 'source_rows' AS metric, count(*) AS cnt FROM source
      UNION ALL SELECT 'sink_rows', count(*) FROM sink
      UNION ALL SELECT 'missing_in_sink', count(*) FROM source
        WHERE NOT EXISTS (SELECT 1 FROM sink WHERE sink.id = source.id)
      UNION ALL SELECT 'orphans_in_sink', count(*) FROM sink
        WHERE NOT EXISTS (SELECT 1 FROM source WHERE source.id = sink.id))
    ORDER BY metric"""

  /** Frame sampling over stubbed media metadata. */
  val mmFrameSample: String = """
    SELECT doc_id, frame_idx,
      md5(text) || ':' || CAST(frame_idx AS VARCHAR) AS frame_id
    FROM (SELECT doc_id, text,
            unnest(range(0, 1 + octet_length(encode(text)) % 120, 10)) AS frame_idx
          FROM documents)
    ORDER BY doc_id, frame_idx"""

  /** Token-bucket throttle drain (`web/App.tsx:2106-2113,2185-2201`,
    * mirrors `Consumer.throttleDrain` with rate=200, step=50ms, cap 5×rate,
    * batchCap=50): a recursive CTE carries each lane's (tick, allowance,
    * used) state and advances every lane by one event per iteration — the
    * 32 pk-sharded lanes keep the iteration count at maxLaneLen, not total
    * events. The reference's catch-up `while` collapses to a single
    * conditional advance because perTick = rate·step/1000 = 10 ≥ 1 (one
    * tick always replenishes enough for the next drain) — exact, not an
    * approximation, for these parameters. All allowance arithmetic stays on
    * integer-valued doubles (±10, ±1, cap 1000), so Spark and DuckDB agree
    * bit-for-bit. */
  protected def throttleDrainCtes: String = {
    val need = """(e."availableAt" - 1) // 50 + 1"""
    val t1 = s"greatest(d.tick, $need)"
    val a1 = s"CASE WHEN $t1 > d.tick THEN least(d.allowance + 10.0 * ($t1 - d.tick), 1000.0) ELSE d.allowance END"
    val u1 = s"CASE WHEN $t1 > d.tick THEN 0 ELSE d.used END"
    val adv = s"CASE WHEN ($a1) < 1.0 OR ($u1) >= 50 THEN 1 ELSE 0 END"
    val tick2 = s"($t1) + ($adv)"
    val allow2 = s"CASE WHEN ($adv) = 1 THEN least(($a1) + 10.0, 1000.0) ELSE ($a1) END - 1.0"
    val used2 = s"(CASE WHEN ($adv) = 1 THEN 0 ELSE ($u1) END) + 1"
    s"""WITH RECURSIVE $stateCte, $logLaneCte,
    ev AS MATERIALIZED (
      -- MATERIALIZED is load-bearing: the recursive member joins ev every
      -- iteration, and without it DuckDB re-evaluates the whole upstream
      -- window chain per iteration (~25x slower at sf0.01)
      SELECT 'lane-' || lpad(CAST(CAST(pk AS BIGINT) % 32 AS VARCHAR), 2, '0') AS method,
             lsn AS seq, emitted_ts AS "availableAt",
             row_number() OVER (
               PARTITION BY CAST(pk AS BIGINT) % 32 ORDER BY emitted_ts, lsn) AS i
      FROM log_lane),
    drain AS (
      SELECT method, 0::BIGINT AS i, CAST(NULL AS BIGINT) AS seq,
             CAST(NULL AS BIGINT) AS "availableAt",
             0::BIGINT AS tick, 0.0::DOUBLE AS allowance, 0::BIGINT AS used
      FROM (SELECT DISTINCT method FROM ev)
      UNION ALL
      SELECT e.method, e.i, e.seq, e."availableAt",
        CAST($tick2 AS BIGINT), CAST($allow2 AS DOUBLE), CAST($used2 AS BIGINT)
      FROM drain d JOIN ev e ON e.method = d.method AND e.i = d.i + 1)"""
  }

  def cdcThrottleDrain: String = s"""$throttleDrainCtes
    SELECT method, seq, "availableAt", tick AS "drainTick", tick * 50 AS "drainMs"
    FROM drain WHERE i > 0 ORDER BY method, "drainTick", seq"""

  /** Backlog/consumed time series (`src/engine/metrics.ts:23-46`, backlog
    * derivation `src/changefeed/model.ts:375-382`): produced vs drained per
    * 50ms tick per lane, with the running backlog = Σ(produced − drained). */
  def cdcBacklogSeries: String = s"""$throttleDrainCtes,
    prod AS (
      SELECT method, ("availableAt" - 1) // 50 + 1 AS tick, count(*) AS produced
      FROM drain WHERE i > 0 GROUP BY 1, 2),
    cons AS (
      SELECT method, tick, count(*) AS drained
      FROM drain WHERE i > 0 GROUP BY 1, 2),
    merged AS (
      SELECT coalesce(p.method, c.method) AS method,
             coalesce(p.tick, c.tick) AS tick,
             coalesce(p.produced, 0) AS produced,
             coalesce(c.drained, 0) AS drained
      FROM prod p FULL OUTER JOIN cons c ON p.method = c.method AND p.tick = c.tick)
    SELECT method, tick, tick * 50 AS tick_ms, produced, drained,
      CAST(sum(produced - drained) OVER (PARTITION BY method ORDER BY tick) AS BIGINT) AS backlog
    FROM merged ORDER BY method, tick"""

  /** Per-lane schema-change capture timing — mirrors
    * `SchemaEvolution.captureLanes`: log emits at commitTs (bypasses fetch
    * buffer), polling at the next poll boundary, trigger at the next
    * extract tick after commitTs+overhead; version transitions identical
    * across lanes. */
  val cdcSchemaCapture: String = s"""WITH $opsCte,
    chg AS (
      SELECT tbl,
        CASE WHEN event_id % 500 = 0 THEN 'ADD_COLUMN' ELSE 'DROP_COLUMN' END AS action,
        'c' || CAST(event_id % 7 AS VARCHAR) AS col_name,
        t AS src_ts
      FROM ops WHERE event_id % 250 = 0),
    ver AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY tbl ORDER BY src_ts, col_name) + 1 AS BIGINT)
          AS next_version
      FROM chg),
    lanes AS (
      SELECT tbl, col_name, action,
        CASE WHEN action = 'ADD_COLUMN' THEN 'SCHEMA_ADD_COL'
             ELSE 'SCHEMA_DROP_COL' END AS kind,
        next_version - 1 AS prev_version, next_version, method,
        CASE WHEN method = 'trigger' THEN src_ts + 5 ELSE src_ts END AS commit_ts,
        CASE WHEN method = 'log' THEN src_ts
             WHEN method = 'poll' THEN (src_ts // 1000 + 1) * 1000
             ELSE (src_ts + 5) - ((src_ts + 5) % 500) + 500 END AS emitted_ts,
        src_ts
      FROM ver CROSS JOIN (SELECT unnest(['log', 'poll', 'trigger']) AS method) m)
    SELECT tbl, col_name, action, kind, prev_version, next_version, method,
           commit_ts, emitted_ts, emitted_ts - src_ts AS lag_ms
    FROM lanes ORDER BY tbl, next_version, method"""

  /** Exact broker per-tick delivery (`model.ts:246-263` `pollBroker`):
    * FIFO in enqueue (lsn) order with head-of-line blocking; ≤4 consumed
    * per tick per partition, drops consuming quota. Recursive CTE advances
    * all 32 partition queues one event per iteration — mirrors
    * `Consumer.brokerDeliverExact`. */
  def cdcBrokerExact: String = {
    val availTick = """(e."availableAt" - 1) // 50 + 1"""
    val t1 = s"greatest(d.tick, $availTick)"
    val u1 = s"CASE WHEN $t1 > d.tick THEN 0 ELSE d.used END"
    val adv = s"CASE WHEN ($u1) >= 4 THEN 1 ELSE 0 END"
    val tick2 = s"($t1) + ($adv)"
    val used2 = s"(CASE WHEN ($adv) = 1 THEN 0 ELSE ($u1) END) + 1"
    s"""WITH RECURSIVE $opsCte,
    ev AS MATERIALIZED (
      SELECT ${h31("pk", 9973)} % 32 AS part, lsn,
             t + (${h31("'tx-' || CAST(lsn AS VARCHAR)", 9973)} % 2) * 50 AS "availableAt",
             ${h31("CAST(lsn AS VARCHAR)", 9973)} % 100 < 10 AS dropped,
             row_number() OVER (PARTITION BY ${h31("pk", 9973)} % 32 ORDER BY lsn) AS i
      FROM ops),
    q AS (
      SELECT part, 0::BIGINT AS i, CAST(NULL AS BIGINT) AS lsn,
             CAST(NULL AS BIGINT) AS "availableAt", CAST(NULL AS BOOLEAN) AS dropped,
             0::BIGINT AS tick, 0::BIGINT AS used
      FROM (SELECT DISTINCT part FROM ev)
      UNION ALL
      SELECT e.part, e.i, e.lsn, e."availableAt", e.dropped,
        CAST($tick2 AS BIGINT), CAST($used2 AS BIGINT)
      FROM q d JOIN ev e ON e.part = d.part AND e.i = d.i + 1)
    SELECT part, lsn, "availableAt", dropped,
           tick AS "deliverTick", tick * 50 AS "deliverMs"
    FROM q WHERE i > 0 ORDER BY part, lsn"""
  }

  /** EXACT drift-on broker delivery (`src/changefeed/model.ts:141-149,246-263`):
    * with commit drift, every event is spliced into the FRONT of its partition
    * queue, so pending events form a LIFO stack and a drifted head blocks
    * older events beneath it. Mirrors `Consumer.brokerDeliverDriftExact`.
    *
    * Tick-stepped recursion with LIST state: one state row per partition per
    * visited tick, carrying the pending stack head-first. Each step (a) pushes
    * the next arrival group (lsn DESC so the newest sits at the head), then
    * (b) pops up to 4 head events whose avail tick has passed. The clock jumps
    * between relevant ticks (next arrival / next drain), so iterations are
    * O(events), not O(ticks); 32 partitions advance per iteration.
    * NOTE DuckDB's `list_position` returns 0 (not NULL) for not-found.
    */
  def cdcBrokerDriftExact: String = {
    val INF = "9223372036854775807"
    val drainT = s"CASE WHEN len(d.stack) > 0 THEN greatest(d.tick + 1, d.stack[1].avail_tick) ELSE $INF END"
    val arrives = s"g.arr_tick IS NOT NULL AND g.arr_tick <= ($drainT)"
    val firstBlocked = "list_position(list_transform(s.stack2[1:4], x -> x.avail_tick <= s.T), false)"
    s"""WITH RECURSIVE $opsCte,
    ev AS MATERIALIZED (
      SELECT ${h31("pk", 9973)} % 32 AS part, lsn, t,
             t + (${h31("'tx-' || CAST(lsn AS VARCHAR)", 9973)} % 2) * 50 AS avail,
             ${h31("CAST(lsn AS VARCHAR)", 9973)} % 100 < 10 AS dropped,
             (t - 1) // 50 + 1 AS arr_tick,
             (t + (${h31("'tx-' || CAST(lsn AS VARCHAR)", 9973)} % 2) * 50 - 1) // 50 + 1 AS avail_tick
      FROM ops),
    arr AS MATERIALIZED (
      SELECT part, arr_tick,
             list(struct_pack(lsn := lsn, avail_tick := avail_tick) ORDER BY lsn DESC) AS evs,
             row_number() OVER (PARTITION BY part ORDER BY arr_tick) AS gi
      FROM ev GROUP BY part, arr_tick),
    parts AS (SELECT part, count(*) AS gmax FROM arr GROUP BY part),
    q AS (
      SELECT p.part, 0::BIGINT AS gi,
             CAST([] AS STRUCT(lsn BIGINT, avail_tick BIGINT)[]) AS stack,
             0::BIGINT AS tick,
             CAST([] AS STRUCT(lsn BIGINT, avail_tick BIGINT)[]) AS just,
             p.gmax
      FROM parts p
      UNION ALL
      SELECT part, gi2, stack3, T, just2, gmax FROM (
        SELECT d.part,
          CASE WHEN $arrives THEN d.gi + 1 ELSE d.gi END AS gi2,
          CASE WHEN $arrives THEN g.evs || d.stack ELSE d.stack END AS stack2,
          least(coalesce(g.arr_tick, $INF), $drainT) AS T,
          d.gmax
        FROM q d LEFT JOIN arr g ON g.part = d.part AND g.gi = d.gi + 1
        WHERE d.gi < d.gmax OR len(d.stack) > 0
      ) s, LATERAL (
        SELECT CASE WHEN coalesce($firstBlocked, 0) = 0
                    THEN least(4, len(s.stack2))
                    ELSE $firstBlocked - 1 END AS k
      ) kk, LATERAL (
        SELECT s.stack2[kk.k + 1:] AS stack3, s.stack2[1:kk.k] AS just2
      ) fin),
    delivered AS (
      SELECT part, u.x.lsn AS lsn, tick AS deliver_tick
      FROM q, LATERAL unnest(q.just) AS u(x))
    SELECT e.part, e.lsn, e.avail AS "availableAt", e.dropped,
           d.deliver_tick AS "deliverTick", d.deliver_tick * 50 AS "deliverMs"
    FROM delivered d JOIN ev e ON e.part = d.part AND e.lsn = d.lsn
    ORDER BY e.part, e.lsn"""
  }

  /** n-gram novelty — mirrors `TextAnalysis.noveltyStats(n=3)`: per doc,
    * the count/fraction of its distinct trigrams whose first corpus
    * occurrence (min doc_id over docs containing the trigram) is this doc.
    * All integer counts + one exact double division. */
  val textNovelty: String = s"""WITH $shingles3Cte,
    f AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY shingle) AS first_doc
      FROM sh3)
    SELECT doc_id,
      CAST(count(*) AS BIGINT) AS n_shingles,
      CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        AS novelty_rate
    FROM f GROUP BY doc_id ORDER BY doc_id"""

  /** Character-collision diversity — mirrors `TextAnalysis.charStats`:
    * per-doc char histogram (spaces excluded), collision probability
    * Σcnt²/n² and effective alphabet n²/Σcnt² — integer sums, one double
    * division each, no transcendentals. */
  val textCharStats: String = """WITH
    c AS (SELECT doc_id, unnest(split(text, '')) AS ch FROM documents),
    cf AS (SELECT doc_id, ch FROM c WHERE ch <> ' ' AND ch <> ''),
    h AS (SELECT doc_id, ch, count(*) AS cnt FROM cf GROUP BY doc_id, ch),
    s AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS d, CAST(sum(cnt * cnt) AS BIGINT) AS ss
      FROM h GROUP BY doc_id)
    SELECT doc_id, n AS n_chars_nospace, d AS n_distinct_chars,
      CAST(ss AS DOUBLE) / CAST(n * n AS DOUBLE) AS collision_p,
      CAST(n * n AS DOUBLE) / CAST(ss AS DOUBLE) AS renyi2_diversity
    FROM s ORDER BY doc_id"""

  /** Duplicate-rate sweep — mirrors `Dedup.thresholdCurve(n=3)`: exact
    * trigram-Jaccard pairs at the loosest cut fanned out to each threshold
    * they clear; pair and affected-doc counts per threshold. */
  val dedupThresholdCurve: String = s"""WITH $shingles3Cte,
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
      FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    j AS (
      SELECT a_id, b_id,
        CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id),
    p AS (SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.5),
    th AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
    att AS (
      SELECT t.threshold, p.a_id, p.b_id
      FROM p JOIN th t ON p.jaccard >= t.threshold),
    pc AS (SELECT threshold, count(*) AS n_pairs FROM att GROUP BY threshold),
    dc AS (
      SELECT threshold, count(DISTINCT dd) AS n_docs_affected FROM (
        SELECT threshold, unnest([a_id, b_id]) AS dd FROM att)
      GROUP BY threshold)
    SELECT pc.threshold, CAST(pc.n_pairs AS BIGINT) AS n_pairs,
      CAST(dc.n_docs_affected AS BIGINT) AS n_docs_affected
    FROM pc JOIN dc USING (threshold) ORDER BY pc.threshold"""

  /** Capped-candidate threshold sweep — mirrors `Dedup.thresholdCurveCapped`:
    * the dedupVerifyCandidates chain (capped banded pairs + exact trigram
    * Jaccard on candidates only) feeding the same curve aggregation. */
  def dedupThresholdCurveCapped(
      cap: Long = graft.llm.Dedup.DefaultMaxBucket.toLong): String = s"""WITH $minhashSigCte,
    ${bandedPairsCtesCapped(cap)},
    $shingles3Cte,
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY doc_id),
    inter AS (
      SELECT p.a_id, p.b_id, count(*) AS n_inter
      FROM pairs p
      JOIN sh3 a ON a.doc_id = p.a_id
      JOIN sh3 b ON b.doc_id = p.b_id AND b.shingle = a.shingle
      GROUP BY p.a_id, p.b_id),
    v AS (
      SELECT p.a_id, p.b_id,
        CAST(coalesce(i.n_inter, 0) AS DOUBLE) /
          (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)) AS jaccard
      FROM pairs p
      LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
      JOIN sizes sa ON sa.doc_id = p.a_id
      JOIN sizes sb ON sb.doc_id = p.b_id),
    cp AS (SELECT a_id, b_id, jaccard FROM v WHERE jaccard >= 0.5),
    th AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
    att AS (
      SELECT t.threshold, cp.a_id, cp.b_id
      FROM cp JOIN th t ON cp.jaccard >= t.threshold),
    pc AS (SELECT threshold, count(*) AS n_pairs FROM att GROUP BY threshold),
    dc AS (
      SELECT threshold, count(DISTINCT dd) AS n_docs_affected FROM (
        SELECT threshold, unnest([a_id, b_id]) AS dd FROM att)
      GROUP BY threshold)
    SELECT pc.threshold, CAST(pc.n_pairs AS BIGINT) AS n_pairs,
      CAST(dc.n_docs_affected AS BIGINT) AS n_docs_affected
    FROM pc JOIN dc USING (threshold) ORDER BY pc.threshold"""

  /** MinHash calibration — mirrors `Dedup.minhashCalibration`: for every
    * capped banded candidate pair, the signature-match estimate of the
    * 2-gram Jaccard beside the exact 2-gram Jaccard and |error|. */
  def dedupMinhashCalibration(cap: Long = graft.llm.Dedup.DefaultMaxBucket.toLong): String = {
    val matchSum = (0 until 8)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $minhashSigCte,
    ${bandedPairsCtesCapped(cap)},
    est AS (
      SELECT p.a_id, p.b_id,
        CAST($matchSum AS DOUBLE) / 8.0 AS est_jaccard
      FROM pairs p
      JOIN sigs a ON a.doc_id = p.a_id
      JOIN sigs b ON b.doc_id = p.b_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.a_id, p.b_id, count(*) AS n_inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.a_id
      JOIN sh b ON b.doc_id = p.b_id AND b.shingle = a.shingle
      GROUP BY p.a_id, p.b_id),
    v AS (
      SELECT e.a_id, e.b_id, e.est_jaccard,
        CAST(coalesce(i.n_inter, 0) AS DOUBLE) /
          (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)) AS exact_jaccard
      FROM est e
      LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
      JOIN sizes sa ON sa.doc_id = e.a_id
      JOIN sizes sb ON sb.doc_id = e.b_id)
    SELECT a_id, b_id, est_jaccard, exact_jaccard,
      abs(est_jaccard - exact_jaccard) AS abs_err
    FROM v ORDER BY a_id, b_id"""
  }

  /** Two-stage rerank — mirrors `Similarity.rerankTopK`: int8 coarse
    * top-20 (the `ann_quantized_topk` chain) re-scored by the exact float
    * cosine, final top-5 per query with the coarse rank carried. */
  val annRerank: String = s"""WITH $quantizedCte,
    qcand AS (SELECT q_id, n_id, rnk AS coarse_rnk FROM qranked WHERE rnk <= 20),
    fn AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    rescored AS (
      SELECT c.q_id, c.n_id, c.coarse_rnk,
        ${dotSql("q.embedding", "n.embedding")} / (q.nrm * n.nrm) AS cos_exact
      FROM qcand c
      JOIN fn q ON q.vec_id = c.q_id
      JOIN fn n ON n.vec_id = c.n_id),
    rr AS (
      SELECT q_id, n_id, coarse_rnk, cos_exact,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_exact DESC, n_id) AS rnk
      FROM rescored)
    SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, cos_exact,
      CAST(coarse_rnk AS BIGINT) AS coarse_rnk
    FROM rr WHERE rnk <= 5 ORDER BY q_id, rnk"""

  /** Token-budget selection — mirrors `Corpus.tokenBudget(budget=10000)`:
    * qualityLogit ordering (identical IEEE chain), exact BIGINT running
    * token total, selected = fits-in-budget. */
  val corpusTokenBudget: String = s"""WITH t AS (
      SELECT doc_id, length(text) AS nc,
        len(string_split(text, ' ')) AS nt,
        len(list_distinct(string_split(text, ' '))) AS nd,
        len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS ns
      FROM documents),
    f AS (
      SELECT doc_id,
        least(CAST(nt AS DOUBLE) / 100.0, 1.0) AS lenf,
        CAST(nd AS DOUBLE) / nt AS ttr,
        CAST(ns AS DOUBLE) / nt AS stop_r,
        CAST(nc - nt + 1 AS DOUBLE) / nt AS atl,
        nt
      FROM t),
    l AS (
      SELECT doc_id,
        -1.0 + 2.0 * lenf + 1.5 * ttr + -3.0 * stop_r + -0.05 * atl AS logit,
        CAST(nt AS BIGINT) AS n_tokens
      FROM f),
    r AS (
      SELECT doc_id, logit, n_tokens,
        CAST(sum(n_tokens) OVER (ORDER BY logit DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM l)
    SELECT doc_id, logit, n_tokens, cum_tokens,
      cum_tokens <= 10000 AS selected
    FROM r ORDER BY cum_tokens"""

  /** Source containment matrix — mirrors `Dedup.sourceOverlap(n=3)`:
    * distinct (source, trigram) vocabulary, directed pairwise common-gram
    * counts, containment = n_common / |a's grams|. */
  val dedupSourceOverlap: String = s"""WITH $shingles3Cte,
    sg AS (
      SELECT DISTINCT d.source, s.shingle
      FROM sh3 s JOIN documents d USING (doc_id)),
    sizes AS (SELECT source, count(*) AS n_grams FROM sg GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
      FROM sg a JOIN sg b ON a.shingle = b.shingle AND a.source <> b.source
      GROUP BY a.source, b.source)
    SELECT i.source_a, i.source_b, CAST(i.n_common AS BIGINT) AS n_common,
      CAST(z.n_grams AS BIGINT) AS a_grams,
      CAST(i.n_common AS DOUBLE) / z.n_grams AS containment
    FROM inter i JOIN sizes z ON z.source = i.source_a
    ORDER BY i.source_a, i.source_b"""

  /** Bloom ingest gate — mirrors `Dedup.bloomGate` (mBits=65536, k=4,
    * salted hash31 mod 1000003): membership through the bitmask equals
    * membership in the distinct corpus-position set, which is what this
    * SQL tests directly. */
  val dedupBloomGate: String = s"""WITH
    corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
    arriv AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
    cpos AS (SELECT DISTINCT
        ${h31("c.text || ':' || CAST(t.i AS VARCHAR)", 1000003L)} % 65536 AS pos
      FROM corpus c, range(0, 4) t(i)),
    apos AS (SELECT a.doc_id,
        ${h31("a.text || ':' || CAST(t.i AS VARCHAR)", 1000003L)} % 65536 AS pos
      FROM arriv a, range(0, 4) t(i)),
    maybe AS (
      SELECT a.doc_id, bool_and(c.pos IS NOT NULL) AS maybe_present
      FROM apos a LEFT JOIN cpos c USING (pos)
      GROUP BY a.doc_id),
    dup AS (
      SELECT a.doc_id, (d.chash IS NOT NULL) AS is_dup
      FROM arriv a LEFT JOIN (SELECT DISTINCT md5(text) AS chash FROM corpus) d
        ON md5(a.text) = d.chash)
    SELECT m.doc_id, m.maybe_present, p.is_dup,
      (m.maybe_present AND NOT p.is_dup) AS false_positive
    FROM maybe m JOIN dup p USING (doc_id)
    ORDER BY doc_id"""

  /** Duplicate-growth curve — mirrors `Dedup.growthCurve` (10 ingest-order
    * buckets; exact = md5, near = full MinHash-signature equality). */
  val dedupGrowthCurve: String = {
    val sigCols = (0 until 8).map(i => s"m$i").mkString(", ")
    s"""WITH $minhashSigCte,
    ghash AS (SELECT doc_id, md5(text) AS chash FROM documents),
    efirst AS (SELECT chash, min(doc_id) AS first_id FROM ghash GROUP BY chash),
    eflag AS (
      SELECT h.doc_id, (h.doc_id <> f.first_id) AS is_exact
      FROM ghash h JOIN efirst f USING (chash)),
    nfirst AS (SELECT $sigCols, min(doc_id) AS nfirst FROM sigs GROUP BY $sigCols),
    nflag AS (
      SELECT s.doc_id, (s.doc_id <> f.nfirst) AS is_near
      FROM sigs s JOIN nfirst f USING ($sigCols)),
    mx AS (SELECT max(doc_id) AS max_id FROM documents),
    per AS (
      SELECT e.doc_id * 10 // (m.max_id + 1) AS bucket,
        count(*) AS n_docs,
        sum(CASE WHEN e.is_exact THEN 1 ELSE 0 END) AS n_exact,
        sum(CASE WHEN n.is_near THEN 1 ELSE 0 END) AS n_near
      FROM eflag e JOIN nflag n USING (doc_id), mx m
      GROUP BY 1)
    SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs,
      CAST(n_exact AS BIGINT) AS n_exact,
      CAST(n_near AS BIGINT) AS n_near,
      CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
      CAST(sum(n_exact) OVER w AS BIGINT) AS cum_exact,
      CAST(sum(n_near) OVER w AS BIGINT) AS cum_near,
      (sum(n_exact) OVER w)::DOUBLE / (sum(n_docs) OVER w) AS cum_exact_rate,
      (sum(n_near) OVER w)::DOUBLE / (sum(n_docs) OVER w) AS cum_near_rate
    FROM per
    WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bucket"""
  }

  /** IVF probe sweep — mirrors `Similarity.ivfProbeCurve`: the validated
    * IVF CTE chain built once, probed at nProbe ∈ {1,2,4,8}; pooled hits
    * against the exact float top-3 per probe setting. */
  def annIvfProbeCurve(probes: Seq[Int] = Seq(1, 2, 4, 8)): String = {
    val per = probes.map { p =>
      s"""probes$p AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id AS list_id
      FROM ranked WHERE c_rank <= $p AND vec_id < 10),
    scored$p AS (
      SELECT q_id, n_id, ${dotSql("q_emb", "n_emb")} / (q_nrm * n_nrm) AS cos
      FROM probes$p JOIN assigned USING (list_id)
      WHERE q_id <> n_id),
    topk$p AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM scored$p),
    hit$p AS (
      SELECT count(*) AS n_hits
      FROM exact e
      JOIN (SELECT q_id, n_id FROM topk$p WHERE rnk <= 3) i USING (q_id, n_id))"""
    }.mkString(",\n    ")
    val union = probes.map { p =>
      s"SELECT CAST($p AS BIGINT) AS n_probe, CAST((SELECT n_hits FROM hit$p) AS BIGINT) AS n_hits"
    }.mkString("\n    UNION ALL ")
    s"""WITH $ivfCtes,
    bscored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    branked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
      FROM bscored),
    exact AS (SELECT q_id, n_id FROM branked WHERE rnk <= 3),
    $per
    SELECT n_probe, n_hits, CAST(n_hits AS DOUBLE) / 30.0 AS recall
    FROM ($union)
    ORDER BY n_probe"""
  }

  /** aHash CTE shared by the mm_phash oracles — recomputes the decoded
    * raster's 8×8 mean-threshold hash arithmetically from the payload
    * generator contract (`Multimodal.encodePng`: pixel i = code of
    * text[i % len]; w = 8+len%24, h = 8+len%16; `Multimodal.aHash`:
    * sample (x,y) at ((y·h/8)·w + x·w/8), bit ⇔ 64·sample > Σ). Emits
    * `ph (doc_id, sum64, phash_hi, phash_lo)`. */
  protected val phashCte: String = """
    pt AS (SELECT doc_id, text, length(text) AS len,
             8 + length(text) % 24 AS w, 8 + length(text) % 16 AS h
           FROM documents),
    psmp AS (
      SELECT doc_id,
        list_transform(range(0, 64), k ->
          CAST(ascii(text[CAST((((k // 8) * h) // 8) * w + (((k % 8) * w) // 8) AS BIGINT) % len + 1]) AS BIGINT)) AS smp
      FROM pt),
    pm AS (
      SELECT doc_id, smp,
        list_reduce(list_prepend(CAST(0 AS BIGINT), smp), (a, b) -> a + b) AS sum64
      FROM psmp),
    ph AS (
      SELECT doc_id, sum64,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(32, 64), k ->
            CASE WHEN 64 * smp[k + 1] > sum64
                 THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER) ELSE 0 END)),
          (a, b) -> a + b) AS phash_hi,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 32), k ->
            CASE WHEN 64 * smp[k + 1] > sum64
                 THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END)),
          (a, b) -> a + b) AS phash_lo
      FROM pm)"""

  /** Perceptual hash table — mirrors `Multimodal.aHash` over the stored
    * media column. */
  val mmPhash: String = s"""WITH $phashCte
    SELECT doc_id, sum64, phash_hi, phash_lo FROM ph ORDER BY doc_id"""

  /** Banded pHash near-dup pairs — mirrors `Multimodal.phashDups(7)`:
    * eight 8-bit bands, equality join, exact popcount verify. */
  val mmPhashDups: String = s"""WITH $phashCte,
    bands AS (
      SELECT doc_id, phash_hi, phash_lo, j AS band,
        CASE WHEN j < 4 THEN (phash_lo >> CAST(8 * j AS INTEGER)) & 255
             ELSE (phash_hi >> CAST(8 * (j - 4) AS INTEGER)) & 255 END AS band_val
      FROM ph, unnest(range(0, 8)) AS u(j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        a.phash_hi AS a_hi, a.phash_lo AS a_lo,
        b.phash_hi AS b_hi, b.phash_lo AS b_lo
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
    SELECT a_id, b_id,
      CAST(bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 7
    ORDER BY a_id, b_id"""

  /** Image near-dup cluster-size histogram — mirrors the
    * `mm_phash_clusters` entry (star contraction over the banded phash
    * pair set): the same transitive-closure oracle shape as
    * `dedupClusterSizes`, seeded from the media universe. */
  val mmPhashClusters: String = s"""WITH RECURSIVE $phashCte,
    bands AS (
      SELECT doc_id, phash_hi, phash_lo, j AS band,
        CASE WHEN j < 4 THEN (phash_lo >> CAST(8 * j AS INTEGER)) & 255
             ELSE (phash_hi >> CAST(8 * (j - 4) AS INTEGER)) & 255 END AS band_val
      FROM ph, unnest(range(0, 8)) AS u(j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        a.phash_hi AS a_hi, a.phash_lo AS a_lo,
        b.phash_hi AS b_hi, b.phash_lo AS b_lo
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
    ppairs AS (
      SELECT a_id, b_id FROM cand
      WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 7),
    e AS (
      SELECT a_id AS u, b_id AS v FROM ppairs
      UNION SELECT b_id AS u, a_id AS v FROM ppairs),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM ph
      UNION
      SELECT e.u AS id, reach.r FROM e JOIN reach ON reach.id = e.v),
    lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    sized AS (SELECT cluster_id, count(*) AS cluster_size
              FROM lab GROUP BY cluster_id)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
      count(*) AS n_clusters,
      CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sized GROUP BY cluster_size ORDER BY cluster_size"""

  /** Frame-level dedup reclaim — mirrors `Multimodal.frameDedupLedger`:
    * the phash near-dup closure, each cluster keeping its min-doc_id
    * member, priced in stub-model frames (1 + len % 120). */
  val mmFrameDedup: String = s"""WITH RECURSIVE $phashCte,
    bands AS (
      SELECT doc_id, phash_hi, phash_lo, j AS band,
        CASE WHEN j < 4 THEN (phash_lo >> CAST(8 * j AS INTEGER)) & 255
             ELSE (phash_hi >> CAST(8 * (j - 4) AS INTEGER)) & 255 END AS band_val
      FROM ph, unnest(range(0, 8)) AS u(j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        a.phash_hi AS a_hi, a.phash_lo AS a_lo,
        b.phash_hi AS b_hi, b.phash_lo AS b_lo
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
    ppairs AS (
      SELECT a_id, b_id FROM cand
      WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 7),
    e AS (
      SELECT a_id AS u, b_id AS v FROM ppairs
      UNION SELECT b_id AS u, a_id AS v FROM ppairs),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM ph
      UNION
      SELECT e.u AS id, reach.r FROM e JOIN reach ON reach.id = e.v),
    lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    fr AS (SELECT doc_id, 1 + length(text) % 120 AS f FROM documents),
    per AS (
      SELECT lab.cluster_id, count(*) AS n,
        CAST(sum(fr.f) AS BIGINT) AS f_total,
        arg_min(fr.f, lab.doc_id) AS f_kept
      FROM lab JOIN fr USING (doc_id) GROUP BY lab.cluster_id)
    SELECT CAST(sum(n) AS BIGINT) AS n_clips,
      count(*) AS n_clusters,
      CAST(sum(f_total) AS BIGINT) AS n_frames_total,
      CAST(sum(f_total - f_kept) AS BIGINT) AS n_frames_redundant,
      CAST(CAST(sum(f_total - f_kept) AS BIGINT) AS DOUBLE)
        / CAST(sum(f_total) AS BIGINT) AS reclaim_frac
    FROM per"""

  /** The SCALE-path pair CTE chain — mirrors `Multimodal.phashDupsWide`:
    * FOUR 16-bit bands (Hamming ≤ 3 pigeonhole), hot-bucket cap 64
    * applied BEFORE pairing, star edges on identical full hashes. Shared
    * by the two `_capped` media queries. */
  protected val phashWideCte: String = """
    bands AS (
      SELECT doc_id, phash_hi, phash_lo, j AS band,
        CASE WHEN j < 2 THEN (phash_lo >> CAST(16 * j AS INTEGER)) & 65535
             ELSE (phash_hi >> CAST(16 * (j - 2) AS INTEGER)) & 65535
        END AS band_val
      FROM ph, unnest(range(0, 4)) AS u(j)),
    keptb AS (SELECT band, band_val FROM bands
              GROUP BY 1, 2 HAVING count(*) <= 64),
    kb AS (SELECT bands.* FROM bands JOIN keptb USING (band, band_val)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        a.phash_hi AS a_hi, a.phash_lo AS a_lo,
        b.phash_hi AS b_hi, b.phash_lo AS b_lo
      FROM kb a JOIN kb b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
    bp AS (
      SELECT a_id, b_id FROM cand
      WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 3),
    grp AS (SELECT phash_hi, phash_lo, min(doc_id) AS a_id
            FROM ph GROUP BY 1, 2 HAVING count(*) > 1),
    stars AS (SELECT grp.a_id, ph.doc_id AS b_id
              FROM ph JOIN grp USING (phash_hi, phash_lo)
              WHERE ph.doc_id > grp.a_id),
    ppairs AS (SELECT a_id, b_id FROM bp
               UNION SELECT a_id, b_id FROM stars)"""

  /** Cluster-size histogram over the SCALE-path pair set — mirrors
    * `mm_phash_clusters_capped`. */
  val mmPhashClustersCapped: String = s"""WITH RECURSIVE $phashCte,
    $phashWideCte,
    e AS (
      SELECT a_id AS u, b_id AS v FROM ppairs
      UNION SELECT b_id AS u, a_id AS v FROM ppairs),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM ph
      UNION
      SELECT e.u AS id, reach.r FROM e JOIN reach ON reach.id = e.v),
    lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    sized AS (SELECT cluster_id, count(*) AS cluster_size
              FROM lab GROUP BY cluster_id)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
      count(*) AS n_clusters,
      CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sized GROUP BY cluster_size ORDER BY cluster_size"""

  /** Frame-reclaim ledger over the SCALE-path pair set — mirrors
    * `mm_frame_dedup_capped`. */
  val mmFrameDedupCapped: String = s"""WITH RECURSIVE $phashCte,
    $phashWideCte,
    e AS (
      SELECT a_id AS u, b_id AS v FROM ppairs
      UNION SELECT b_id AS u, a_id AS v FROM ppairs),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM ph
      UNION
      SELECT e.u AS id, reach.r FROM e JOIN reach ON reach.id = e.v),
    lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    fr AS (SELECT doc_id, 1 + length(text) % 120 AS f FROM documents),
    per AS (
      SELECT lab.cluster_id, count(*) AS n,
        CAST(sum(fr.f) AS BIGINT) AS f_total,
        arg_min(fr.f, lab.doc_id) AS f_kept
      FROM lab JOIN fr USING (doc_id) GROUP BY lab.cluster_id)
    SELECT CAST(sum(n) AS BIGINT) AS n_clips,
      count(*) AS n_clusters,
      CAST(sum(f_total) AS BIGINT) AS n_frames_total,
      CAST(sum(f_total - f_kept) AS BIGINT) AS n_frames_redundant,
      CAST(CAST(sum(f_total - f_kept) AS BIGINT) AS DOUBLE)
        / CAST(sum(f_total) AS BIGINT) AS reclaim_frac
    FROM per"""

  /** Hamming-threshold curve — mirrors `Multimodal.phashThresholdCurve`:
    * the same banded pair set rolled up by exact distance, cumulative
    * count per candidate gate (exact over the whole sweep — every
    * threshold ≤ the 8-band pigeonhole bound). */
  val mmPhashThreshold: String = s"""WITH $phashCte,
    bands AS (
      SELECT doc_id, phash_hi, phash_lo, j AS band,
        CASE WHEN j < 4 THEN (phash_lo >> CAST(8 * j AS INTEGER)) & 255
             ELSE (phash_hi >> CAST(8 * (j - 4) AS INTEGER)) & 255 END AS band_val
      FROM ph, unnest(range(0, 8)) AS u(j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        a.phash_hi AS a_hi, a.phash_lo AS a_lo,
        b.phash_hi AS b_hi, b.phash_lo AS b_lo
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
    d AS (
      SELECT CAST(bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo))
        AS BIGINT) AS hamming
      FROM cand
      WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 7),
    p AS (SELECT hamming AS threshold, count(*) AS n_at FROM d GROUP BY 1)
    SELECT threshold, n_at,
      CAST(sum(n_at) OVER (ORDER BY threshold
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS n_pairs_le
    FROM p ORDER BY threshold"""

  /** Matryoshka truncation sweep — mirrors `Similarity.matryoshkaRecall`:
    * per candidate width d, cosine over the first d dims (same
    * left-to-right fold), top-5 per query, pooled hits vs the full-width
    * exact top-5. */
  def annMatryoshka(dims: Seq[Int] = Seq(16, 32, 64)): String = {
    def dotD(a: String, b: String, d: Int): String =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(range(1, ${d + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
         (acc, x) -> acc + x)"""
    val per = dims.map { d =>
      s"""n$d AS (
      SELECT vec_id, embedding,
        sqrt(${dotD("embedding", "embedding", d)}) AS nrm
      FROM embeddings),
    scored$d AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotD("q.embedding", "c.embedding", d)} / (q.nrm * c.nrm) AS cos
      FROM n$d q JOIN n$d c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    top$d AS (
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
        FROM scored$d) WHERE rnk <= 5),
    hit$d AS (
      SELECT count(*) AS n_hits FROM exact e JOIN top$d t USING (q_id, n_id))"""
    }.mkString(",\n    ")
    val union = dims.map { d =>
      s"SELECT CAST($d AS BIGINT) AS dims, CAST((SELECT n_hits FROM hit$d) AS BIGINT) AS n_hits"
    }.mkString("\n    UNION ALL ")
    s"""WITH
    fn AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
    fscored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
      FROM fn q JOIN fn c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
    exact AS (
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
        FROM fscored) WHERE rnk <= 5),
    $per
    SELECT dims, n_hits, CAST(n_hits AS DOUBLE) / 50.0 AS recall
    FROM ($union)
    ORDER BY dims"""
  }

  /** Per-source budget gate — mirrors `Corpus.sourceBudget(2000)`: running
    * token total per source in doc_id order, admitted = fits the budget.
    * (The window form IS the oracle; the engine side computes the same
    * totals with the keyed distributed prefix sum.) */
  val corpusBudgetBySource: String = """WITH t AS (
      SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, source, n_tokens,
      CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cum_source_tokens,
      (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) <= 2000 AS admitted
    FROM t ORDER BY source, doc_id"""

}
