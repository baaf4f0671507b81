package graft.oracle

/** DuckDB oracle SQL, part 1/5 of the split registry (r12 verdict ask
  * #7 — SparkEntry.scala had grown past 6,000 lines): entries q_scan_project
  * … q_curation_funnel, in the original registration order, concatenated back
  * into `SparkEntry.oracleSql`. Contents are byte-identical to the
  * pre-split map (the Verify/DuckDB hash gate is the proof). */
private[graft] object OracleSql1 {
  val m: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
         (round(l_extendedprice * (1.0 - l_discount), 4) + 0.0) AS revenue
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
                CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 40
         ORDER BY l_orderkey, l_linenumber""",
    "q_scan_multifile" ->
      """SELECT CAST(year(ts) AS INT) AS yr, count(*) AS n
         FROM (SELECT o_orderdate AS ts FROM orders
               UNION ALL SELECT ts::TIMESTAMP AS ts FROM events) t
         GROUP BY 1 ORDER BY 1""",
    "q_scan_partitioned" ->
      """SELECT CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS day,
                event_type, count(*) AS n, (round(sum(value), 4) + 0.0) AS val
         FROM events
         WHERE CAST(date_trunc('day', ts::TIMESTAMP) AS DATE)
               BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
         FROM orders
         WHERE o_orderstatus IN ('O','F') AND o_totalprice > 1000.0
           AND o_orderpriority NOT LIKE '1-%' AND o_orderpriority IS NOT NULL
         ORDER BY o_orderkey""",
    "q_case_when" ->
      """SELECT CASE WHEN l_discount < 0.02 THEN 'low'
                     WHEN l_discount < 0.06 THEN 'mid'
                     ELSE 'high' END AS disc_bucket,
                count(*) AS n, (round(sum(l_extendedprice), 4) + 0.0) AS sum_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_join_inner" ->
      """SELECT c_mktsegment, (round(sum(o_totalprice), 4) + 0.0) AS revenue,
                count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_broadcast" ->
      """SELECT p_brand,
                (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
                       JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_multiway" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
                (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                (round(coalesce(sum(o_totalprice), 0.0), 4) + 0.0) AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_full" ->
      """SELECT category, count(*) AS n
         FROM (SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                           WHEN o.o_custkey IS NULL THEN 'cust_only'
                           ELSE 'both' END AS category
               FROM customer c
               FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o
                 ON c.c_custkey = o.o_custkey) t
         GROUP BY 1 ORDER BY 1""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_range" ->
      """SELECT e1.user_id, count(*) AS n_pairs
         FROM events e1 JOIN events e2
           ON e1.user_id = e2.user_id
          AND e2.ts::TIMESTAMP > e1.ts::TIMESTAMP
          AND e2.ts::TIMESTAMP <= e1.ts::TIMESTAMP + INTERVAL 1 HOUR
         GROUP BY 1 ORDER BY 1""",
    "q_join_asof" ->
      """SELECT event_id, user_id, prev_event_id, prev_event_type
         FROM (SELECT event_id, user_id, event_type,
                      lag(event_id) OVER w AS prev_event_id,
                      lag(event_type) OVER w AS prev_event_type
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts::TIMESTAMP, event_id)) t
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "q_join_asof_stream" ->
      """WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS tsu
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id, user_id, ts::TIMESTAMP AS tsu
                  FROM events WHERE event_type = 'click'),
            u AS (SELECT user_id, tsu, 0 AS side, event_id,
                         NULL::BIGINT AS click_id FROM p
                  UNION ALL
                  SELECT user_id, tsu, 1, NULL::BIGINT, event_id FROM c),
            w AS (SELECT *, last_value(click_id IGNORE NULLS) OVER
                    (PARTITION BY user_id
                     ORDER BY tsu, side, coalesce(click_id, event_id)
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS prev_click
                  FROM u)
         SELECT event_id, user_id, prev_click
         FROM w WHERE side = 0 ORDER BY event_id""",
    "q_join_theta" ->
      """SELECT p1.p_brand, count(*) AS n_pairs
         FROM part p1 JOIN part p2
           ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
         GROUP BY 1 ORDER BY 1""",
    "q_join_bloom" ->
      """SELECT l_returnflag, count(*) AS n_items,
                (round(sum(l_extendedprice * (1 - l_discount)), 4) + 0.0) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY 1""",
    "q_zorder_stats" ->
      """WITH mx AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms
                     FROM lineitem),
            c AS (SELECT (l_partkey * 256) // (mp + 1) AS a8,
                         (l_suppkey * 256) // (ms + 1) AS b8,
                         l_partkey, l_suppkey
                  FROM lineitem CROSS JOIN mx),
            z AS (SELECT l_partkey, l_suppkey,
                         CAST((SELECT sum(
                             (((a8 >> CAST(i AS INT)) & 1)
                                << CAST(2 * i + 1 AS INT)) +
                             (((b8 >> CAST(i AS INT)) & 1)
                                << CAST(2 * i AS INT)))
                           FROM range(0, 8) r(i)) AS BIGINT) AS zval
                  FROM c),
            f AS (SELECT l_partkey, l_suppkey,
                         CAST((zval * 256) // 65536 AS BIGINT) AS file_id
                  FROM z)
         SELECT file_id, count(*) AS n_rows,
                min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
                min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
         FROM f GROUP BY 1 ORDER BY 1""",
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                (round(sum(l_quantity), 4) + 0.0) AS sum_qty,
                (round(sum(l_extendedprice), 4) + 0.0) AS sum_base_price,
                (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS sum_disc_price,
                (round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) + 0.0) AS sum_charge,
                (round(avg(l_quantity), 4) + 0.0) AS avg_qty,
                (round(avg(l_extendedprice), 4) + 0.0) AS avg_price,
                (round(avg(l_discount), 4) + 0.0) AS avg_disc,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_agg_having" ->
      """SELECT c_nationkey, count(*) AS n_cust FROM customer
         GROUP BY 1 HAVING count(*) > 60 ORDER BY 1""",
    "q_agg_rollup" ->
      """SELECT r_name, n_name,
                CAST(grouping(r_name) AS INT) AS g_r,
                CAST(grouping(n_name) AS INT) AS g_n,
                count(*) AS n_cust, (round(sum(c_acctbal), 4) + 0.0) AS acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q_agg_cube" ->
      """SELECT event_type,
                CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS day,
                count(*) AS n, (round(sum(value), 4) + 0.0) AS val
         FROM events GROUP BY CUBE(event_type, day)
         ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""",
    "q_agg_grouping_sets" ->
      """SELECT event_type,
                CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS day,
                count(*) AS n, (round(sum(value), 4) + 0.0) AS val
         FROM events GROUP BY GROUPING SETS ((event_type), (day), ())
         ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""",
    "q_udaf_geomean" ->
      """SELECT l_returnflag,
                (round(exp(avg(ln(l_extendedprice))), 4) + 0.0) AS geomean_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk,
                CAST(drk AS INT) AS drk
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER w AS rn, rank() OVER w AS rk,
                      dense_rank() OVER w AS drk
               FROM orders
               WINDOW w AS (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)) t
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
                (round(sum(o_totalprice) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) + 0.0) AS running,
                (round(avg(o_totalprice) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) + 0.0) AS mavg3
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_window_range_frame" ->
      """SELECT event_id,
                (round(sum(value) OVER
                  (PARTITION BY event_type ORDER BY ts_sec
                   RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW), 4) + 0.0) AS day_sum
         FROM (SELECT event_id, event_type, value,
                      epoch_us(ts::TIMESTAMP)//1000000 AS ts_sec FROM events) t
         ORDER BY event_id""",
    "q_window_lag" ->
      """SELECT event_id, user_id, gap_sec, next_type
         FROM (SELECT event_id, user_id,
                      ts_sec - lag(ts_sec) OVER w AS gap_sec,
                      lead(event_type) OVER w AS next_type
               FROM (SELECT *, epoch_us(ts::TIMESTAMP)//1000000 AS ts_sec
                     FROM events) a
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts::TIMESTAMP, event_id)) b
         ORDER BY event_id""",
    "q_topk_per_group" ->
      """SELECT p_brand, p_partkey, revenue, CAST(rn AS INT) AS rn
         FROM (SELECT p_brand, p_partkey, revenue,
                      row_number() OVER (PARTITION BY p_brand
                                         ORDER BY revenue DESC, p_partkey) AS rn
               FROM (SELECT p_brand, p_partkey,
                            (round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0) AS revenue
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                     GROUP BY 1, 2) a) b
         WHERE rn <= 3 ORDER BY p_brand, rn""",
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_union_all" ->
      """SELECT nationkey, count(*) AS n
         FROM (SELECT c_nationkey AS nationkey FROM customer
               UNION ALL SELECT s_nationkey FROM supplier) t
         GROUP BY 1 ORDER BY 1""",
    "q_union_distinct" ->
      """SELECT DISTINCT nationkey
         FROM (SELECT c_nationkey AS nationkey FROM customer
               UNION ALL SELECT s_nationkey FROM supplier) t
         ORDER BY nationkey""",
    "q_intersect" ->
      """SELECT nationkey
         FROM (SELECT c_nationkey AS nationkey FROM customer
               INTERSECT SELECT s_nationkey FROM supplier) t
         ORDER BY 1""",
    "q_except" ->
      """SELECT nationkey
         FROM (SELECT c_nationkey AS nationkey FROM customer
               EXCEPT SELECT s_nationkey FROM supplier) t
         ORDER BY 1""",
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
                substr(p_type, 1, 4) AS type4,
                concat_ws('|', p_brand, p_type) AS brand_type,
                CAST(length(p_name) AS INT) AS name_len,
                regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
         FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
                CAST(quarter(o_orderdate) AS INT) AS qtr,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                CAST(datediff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS INT) AS days_since,
                CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_returnflag,
                (round(avg(sqrt(l_extendedprice)), 4) + 0.0) AS avg_sqrt_price,
                (round(avg(pow(l_discount, 2)), 4) + 0.0) AS avg_disc_sq,
                (round(avg(ln(l_extendedprice + 1)), 4) + 0.0) AS avg_ln_price,
                (round(abs(min(l_quantity - 10)), 4) + 0.0) AS abs_min_qty,
                (round(sum(round(l_tax, 2)), 4) + 0.0) AS sum_round_tax
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_json_funcs" ->
      """SELECT event_type, (round(avg(k), 4) + 0.0) AS avg_k, count(*) AS n,
                min(k) AS min_k, max(k) AS max_k
         FROM (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS INT) AS k
               FROM events) t
         GROUP BY 1 ORDER BY 1""",
    "q_array_funcs" ->
      """SELECT label, count(*) AS n, min(dim) AS min_dim, max(dim) AS max_dim,
                (round(avg(l2), 4) + 0.0) AS avg_l2, (round(avg(e1), 4) + 0.0) AS avg_e1
         FROM (SELECT label, CAST(len(embedding) AS INT) AS dim,
                      sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])) AS l2,
                      CAST(embedding[1] AS DOUBLE) AS e1
               FROM embeddings) t
         GROUP BY 1 ORDER BY 1""",
    "q_explode" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         WHERE length(token) > 0
         GROUP BY 1 ORDER BY n DESC, token LIMIT 20""",
    "q_map_funcs" ->
      """SELECT CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT) AS pos,
                event_type AS k, n
         FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1) t
         ORDER BY pos""",
    "q_udf_scalar" ->
      """SELECT band, count(*) AS n
         FROM (SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                           WHEN o_totalprice < 200000 THEN 'mid'
                           ELSE 'high' END AS band FROM orders) t
         GROUP BY 1 ORDER BY 1""",
    "q_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs
         FROM (SELECT lang, row_number() OVER
                 (PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) AS rn
               FROM documents) t
         WHERE rn = 1 GROUP BY 1 ORDER BY 1""",
    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, lang,
                           sha256(lower(trim(text))) AS h,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             ::BIGINT % 10 AS bucket
                    FROM documents),
            corpus AS (SELECT DISTINCT h FROM d WHERE bucket < 8),
            batch AS (SELECT doc_id, lang, h FROM d WHERE bucket >= 8),
            fb AS (SELECT h, min(doc_id) AS first_id FROM batch GROUP BY 1)
         SELECT b.lang,
                CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                     WHEN b.doc_id <> f.first_id THEN 'dup_in_batch'
                     ELSE 'kept' END AS status,
                count(*) AS n_docs
         FROM batch b LEFT JOIN corpus c ON b.h = c.h
                      JOIN fb f ON b.h = f.h
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, tok
                       FROM (SELECT doc_id,
                                    unnest(string_split(text, ' ')) AS tok
                             FROM documents) t0
                       WHERE length(tok) > 0),
            h AS (SELECT doc_id,
                         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
                  FROM toks),
            contrib AS (SELECT doc_id, i,
                               ((hv >> CAST(i AS INT)) & 1) * 2 - 1 AS c
                        FROM h, range(0, 32) t(i)),
            bits AS (SELECT doc_id, i,
                            CASE WHEN sum(c) > 0 THEN 1 ELSE 0 END AS b
                     FROM contrib GROUP BY 1, 2)
         SELECT doc_id,
                CAST(sum(b * (1::BIGINT << CAST(i AS INT))) AS BIGINT) AS simhash
         FROM bits GROUP BY 1 ORDER BY 1""",
    "q_dedup_ngram" ->
      """WITH base AS (SELECT doc_id, lang, source,
                              string_split(text, ' ') AS toks FROM documents),
            ng AS (SELECT doc_id, lang, source,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngs
                   FROM base),
            nz AS (SELECT doc_id, lang, source, ngs
                   FROM ng WHERE len(ngs) > 0),
            ex0 AS (SELECT doc_id, lang, source, unnest(ngs) AS g FROM nz),
            df AS (SELECT g, count(*) AS df FROM ex0 GROUP BY 1),
            ex AS (SELECT ex0.* FROM ex0 JOIN df USING (g) WHERE df <= 100),
            sz AS (SELECT doc_id, count(*) AS nsz FROM ex GROUP BY 1),
            inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                             count(*) AS inter
                      FROM ex a JOIN ex b
                        ON a.lang = b.lang AND a.source = b.source
                       AND a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT d1, d2,
                (round(CAST(inter AS DOUBLE) / (s1.nsz + s2.nsz - inter), 4) + 0.0) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
         ORDER BY jaccard DESC, d1, d2 LIMIT 20""",
    "q_dedup_embcos" ->
      // mirrors the engine's sign-LSH candidate rule (the
      // q_similarity_lsh hash) with the corpus-size-derived plane
      // count: pl = clamp(ceil(log2(n/256)), 4, 8) spelled as exact
      // integer thresholds; table t plane j reads component
      // ((t*pl+j) % 64) + 1 — identical to the engine's knob
      """WITH em AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            nv AS (SELECT (CASE WHEN count(*) <= 4096 THEN 4
                                WHEN count(*) <= 8192 THEN 5
                                WHEN count(*) <= 16384 THEN 6
                                WHEN count(*) <= 32768 THEN 7
                                WHEN count(*) <= 65536 THEN 8
                                WHEN count(*) <= 131072 THEN 9
                                ELSE 10 END) AS pl FROM em),
            tb AS (SELECT label, vec_id, t,
                          CAST(sum(CASE WHEN v[CAST(((t*pl + j) % 64) + 1 AS INT)] > 0
                                        THEN (1 << j) ELSE 0 END) AS INT) AS bucket
                   FROM em, nv, range(0, 8) r(t), range(0, 10) p(j)
                   WHERE j < pl
                   GROUP BY label, vec_id, t),
            cand AS (SELECT DISTINCT a.label, a.vec_id AS v1, b.vec_id AS v2
                     FROM tb a JOIN tb b ON a.label = b.label AND a.t = b.t
                                        AND a.bucket = b.bucket
                                        AND a.vec_id < b.vec_id)
         SELECT cand.label, v1, v2,
                (round(list_dot_product(e1.v, e2.v) /
                      (sqrt(list_dot_product(e1.v, e1.v)) *
                       sqrt(list_dot_product(e2.v, e2.v))), 4) + 0.0) AS sim
         FROM cand JOIN em e1 ON e1.vec_id = v1
                   JOIN em e2 ON e2.vec_id = v2
         ORDER BY sim DESC, v1, v2 LIMIT 20""",
    "q_similarity_topk" ->
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS q_id, v AS qv FROM em WHERE vec_id < 10),
            sims AS (SELECT q_id, vec_id AS n_id,
                            (round(list_dot_product(qv, v) /
                                  (sqrt(list_dot_product(qv, qv)) *
                                   sqrt(list_dot_product(v, v))), 4) + 0.0) AS sim
                     FROM em, q WHERE vec_id <> q_id),
            rk AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INT) AS rn
                   FROM sims)
         SELECT q_id, n_id, sim, rn FROM rk WHERE rn <= 5 ORDER BY q_id, rn""",
    "q_similarity_lsh" ->
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            tb AS (SELECT vec_id, t,
                          (CASE WHEN v[CAST(t*4+1 AS INT)] > 0 THEN 1 ELSE 0 END +
                           CASE WHEN v[CAST(t*4+2 AS INT)] > 0 THEN 2 ELSE 0 END +
                           CASE WHEN v[CAST(t*4+3 AS INT)] > 0 THEN 4 ELSE 0 END +
                           CASE WHEN v[CAST(t*4+4 AS INT)] > 0 THEN 8 ELSE 0 END) AS bucket
                   FROM em, range(0, 8) r(t)),
            q AS (SELECT vec_id AS q_id, t AS qt, bucket AS qbk
                  FROM tb WHERE vec_id < 10),
            cand AS (SELECT DISTINCT q_id, tb.vec_id AS n_id
                     FROM tb JOIN q ON tb.t = qt AND tb.bucket = qbk
                                   AND tb.vec_id <> q_id),
            sims AS (SELECT q_id, n_id,
                            (round(list_dot_product(qe.v, ne.v) /
                                  (sqrt(list_dot_product(qe.v, qe.v)) *
                                   sqrt(list_dot_product(ne.v, ne.v))), 4) + 0.0) AS sim
                     FROM cand JOIN em qe ON qe.vec_id = q_id
                               JOIN em ne ON ne.vec_id = n_id),
            rk AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INT) AS rn
                   FROM sims)
         SELECT q_id, n_id, sim, rn FROM rk WHERE rn <= 3 ORDER BY q_id, rn""",
    "q_similarity_ivf" ->
      // mirrors the 2 fixed Lloyd rounds: assign to argmax ROUNDED
      // cosine (ties to smaller c_id), new centroid = per-dim
      // round(avg, 4) — the same rounded arithmetic the Spark side uses,
      // so the refined codebook is bit-identical across engines
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent0 AS (SELECT vec_id AS c_id, v AS cv FROM em WHERE vec_id < 8),
            as0 AS (SELECT vec_id, v, c_id
                    FROM (SELECT e.vec_id, e.v, c.c_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              (round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                              c.c_id) AS rn
                          FROM em e, cent0 c) t
                    WHERE rn = 1),
            cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                      FROM (SELECT a.c_id, CAST(t.i AS INT) AS pos,
                                   (round(avg(a.v[CAST(t.i AS INT) + 1]), 4) + 0.0) AS cx
                            FROM as0 a, range(0, 64) t(i)
                            GROUP BY 1, 2) g
                      GROUP BY 1),
            as1 AS (SELECT vec_id, v, c_id
                    FROM (SELECT e.vec_id, e.v, c.c_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              (round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                              c.c_id) AS rn
                          FROM em e, cent1 c) t
                    WHERE rn = 1),
            cent2 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                      FROM (SELECT a.c_id, CAST(t.i AS INT) AS pos,
                                   (round(avg(a.v[CAST(t.i AS INT) + 1]), 4) + 0.0) AS cx
                            FROM as1 a, range(0, 64) t(i)
                            GROUP BY 1, 2) g
                      GROUP BY 1),
            assigned AS (SELECT vec_id, v, c_id
                         FROM (SELECT e.vec_id, e.v, c.c_id,
                                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                                   (round(list_dot_product(e.v, c.cv) /
                                         (sqrt(list_dot_product(e.v, e.v)) *
                                          sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                                   c.c_id) AS rn
                               FROM em e, cent2 c) t
                         WHERE rn = 1),
            q AS (SELECT vec_id AS q_id, v AS qv, c_id AS qc
                  FROM assigned WHERE vec_id < 10),
            sims AS (SELECT q_id, a.vec_id AS n_id,
                            (round(list_dot_product(qv, a.v) /
                                  (sqrt(list_dot_product(qv, qv)) *
                                   sqrt(list_dot_product(a.v, a.v))), 4) + 0.0) AS sim
                     FROM assigned a JOIN q
                       ON a.c_id = qc AND a.vec_id <> q_id),
            rk AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INT) AS rn
                   FROM sims)
         SELECT q_id, n_id, sim, rn FROM rk WHERE rn <= 3 ORDER BY q_id, rn""",
    "q_similarity_ivf2" ->
      // same 2-Lloyd-round codebook as q_similarity_ivf; queries probe
      // their TWO nearest cells (row_number <= 2 mirrors top_k_pairs'
      // (csim DESC, c_id ASC) preference) and candidates union over both
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent0 AS (SELECT vec_id AS c_id, v AS cv FROM em WHERE vec_id < 8),
            as0 AS (SELECT vec_id, v, c_id
                    FROM (SELECT e.vec_id, e.v, c.c_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              (round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                              c.c_id) AS rn
                          FROM em e, cent0 c) t
                    WHERE rn = 1),
            cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                      FROM (SELECT a.c_id, CAST(t.i AS INT) AS pos,
                                   (round(avg(a.v[CAST(t.i AS INT) + 1]), 4) + 0.0) AS cx
                            FROM as0 a, range(0, 64) t(i)
                            GROUP BY 1, 2) g
                      GROUP BY 1),
            as1 AS (SELECT vec_id, v, c_id
                    FROM (SELECT e.vec_id, e.v, c.c_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              (round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                              c.c_id) AS rn
                          FROM em e, cent1 c) t
                    WHERE rn = 1),
            cent2 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                      FROM (SELECT a.c_id, CAST(t.i AS INT) AS pos,
                                   (round(avg(a.v[CAST(t.i AS INT) + 1]), 4) + 0.0) AS cx
                            FROM as1 a, range(0, 64) t(i)
                            GROUP BY 1, 2) g
                      GROUP BY 1),
            assigned AS (SELECT vec_id, v, c_id
                         FROM (SELECT e.vec_id, e.v, c.c_id,
                                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                                   (round(list_dot_product(e.v, c.cv) /
                                         (sqrt(list_dot_product(e.v, e.v)) *
                                          sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                                   c.c_id) AS rn
                               FROM em e, cent2 c) t
                         WHERE rn = 1),
            q2 AS (SELECT vec_id AS q_id, c_id AS qc
                   FROM (SELECT e.vec_id, c.c_id,
                           row_number() OVER (PARTITION BY e.vec_id ORDER BY
                             (round(list_dot_product(e.v, c.cv) /
                                   (sqrt(list_dot_product(e.v, e.v)) *
                                    sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                             c.c_id) AS rn
                         FROM em e, cent2 c WHERE e.vec_id < 10) t
                   WHERE rn <= 2),
            qv AS (SELECT vec_id AS q_id, v AS qv FROM em WHERE vec_id < 10),
            sims AS (SELECT q2.q_id, a.vec_id AS n_id,
                            (round(list_dot_product(qv.qv, a.v) /
                                  (sqrt(list_dot_product(qv.qv, qv.qv)) *
                                   sqrt(list_dot_product(a.v, a.v))), 4) + 0.0) AS sim
                     FROM assigned a
                       JOIN q2 ON a.c_id = q2.qc AND a.vec_id <> q2.q_id
                       JOIN qv ON qv.q_id = q2.q_id),
            rk AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INT) AS rn
                   FROM sims)
         SELECT q_id, n_id, sim, rn FROM rk WHERE rn <= 3 ORDER BY q_id, rn""",
    "q_similarity_ivfpq" ->
      // the composed IVF-PQ index: IVF (2 Lloyd rounds) prunes to each
      // query's 2 nearest cells, PQ-ADC scores the survivors from their
      // codes, top-64 pool exact-cosine re-ranks — every CTE reuses the
      // verified arithmetic of the q_similarity_ivf2 / q_similarity_pq
      // oracles
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent0 AS (SELECT vec_id AS c_id, v AS cv FROM em WHERE vec_id < 8),
            as0 AS (SELECT vec_id, v, c_id
                    FROM (SELECT e.vec_id, e.v, c.c_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              (round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                              c.c_id) AS rn
                          FROM em e, cent0 c) t
                    WHERE rn = 1),
            cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                      FROM (SELECT a.c_id, CAST(t.i AS INT) AS pos,
                                   (round(avg(a.v[CAST(t.i AS INT) + 1]), 4) + 0.0) AS cx
                            FROM as0 a, range(0, 64) t(i)
                            GROUP BY 1, 2) g
                      GROUP BY 1),
            as1 AS (SELECT vec_id, v, c_id
                    FROM (SELECT e.vec_id, e.v, c.c_id,
                            row_number() OVER (PARTITION BY e.vec_id ORDER BY
                              (round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                              c.c_id) AS rn
                          FROM em e, cent1 c) t
                    WHERE rn = 1),
            cent2 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                      FROM (SELECT a.c_id, CAST(t.i AS INT) AS pos,
                                   (round(avg(a.v[CAST(t.i AS INT) + 1]), 4) + 0.0) AS cx
                            FROM as1 a, range(0, 64) t(i)
                            GROUP BY 1, 2) g
                      GROUP BY 1),
            assigned AS (SELECT vec_id, v, c_id
                         FROM (SELECT e.vec_id, e.v, c.c_id,
                                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                                   (round(list_dot_product(e.v, c.cv) /
                                         (sqrt(list_dot_product(e.v, e.v)) *
                                          sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                                   c.c_id) AS rn
                               FROM em e, cent2 c) t
                         WHERE rn = 1),
            q2 AS (SELECT vec_id AS q_id, c_id AS qc
                   FROM (SELECT e.vec_id, c.c_id,
                           row_number() OVER (PARTITION BY e.vec_id ORDER BY
                             (round(list_dot_product(e.v, c.cv) /
                                   (sqrt(list_dot_product(e.v, e.v)) *
                                    sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) DESC,
                             c.c_id) AS rn
                         FROM em e, cent2 c WHERE e.vec_id < 10) t
                   WHERE rn <= 2),
            sub AS (SELECT vec_id, CAST(i.sp AS INT) AS sp,
                           v[(CAST(i.sp AS INT) * 16 + 1):(CAST(i.sp AS INT) * 16 + 16)] AS sv
                    FROM em, range(0, 4) i(sp)),
            cb AS (SELECT sp, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id < 8),
            scored AS (SELECT s.vec_id, s.sp, c.c_id,
                              (round(list_dot_product(s.sv, c.cv) /
                                    (sqrt(list_dot_product(s.sv, s.sv)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) AS cs
                       FROM sub s JOIN cb c ON s.sp = c.sp),
            enc AS (SELECT vec_id, sp, c_id AS code
                    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sp
                            ORDER BY cs DESC, c_id) AS rn FROM scored) t
                    WHERE rn = 1),
            lut AS (SELECT vec_id AS q_id, sp, c_id AS code, cs AS ls
                    FROM scored WHERE vec_id < 10),
            cand AS (SELECT q2.q_id, a.vec_id AS n_id
                     FROM assigned a
                       JOIN q2 ON a.c_id = q2.qc AND a.vec_id <> q2.q_id),
            adc AS (SELECT c.q_id, c.n_id, (round(sum(l.ls), 4) + 0.0) AS adc
                    FROM cand c
                      JOIN enc e ON e.vec_id = c.n_id
                      JOIN lut l ON l.sp = e.sp AND l.code = e.code
                                AND l.q_id = c.q_id
                    GROUP BY 1, 2),
            pool AS (SELECT q_id, n_id
                     FROM (SELECT q_id, n_id,
                             row_number() OVER (PARTITION BY q_id
                               ORDER BY adc DESC, n_id) AS crn FROM adc) t
                     WHERE crn <= 64),
            sims AS (SELECT q_id, n_id,
                            (round(list_dot_product(qe.v, ne.v) /
                                  (sqrt(list_dot_product(qe.v, qe.v)) *
                                   sqrt(list_dot_product(ne.v, ne.v))), 4) + 0.0) AS sim
                     FROM pool JOIN em qe ON qe.vec_id = q_id
                               JOIN em ne ON ne.vec_id = n_id),
            rk AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INT) AS rn
                   FROM sims)
         SELECT q_id, n_id, sim, rn FROM rk WHERE rn <= 3 ORDER BY q_id, rn""",
    "q_similarity_pq" ->
      // ADC search over the q_embedding_pq codes: per-query 4×8 rounded
      // cosine lookup table, candidate score = sum of the 4 selected
      // entries (sum of 4-decimal values — never a .00005 tie), top-64
      // by (adc DESC, n_id) then exact-cosine re-rank top-3
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            sub AS (SELECT vec_id, CAST(i.sp AS INT) AS sp,
                           v[(CAST(i.sp AS INT) * 16 + 1):(CAST(i.sp AS INT) * 16 + 16)] AS sv
                    FROM em, range(0, 4) i(sp)),
            cb AS (SELECT sp, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id < 8),
            scored AS (SELECT s.vec_id, s.sp, c.c_id,
                              (round(list_dot_product(s.sv, c.cv) /
                                    (sqrt(list_dot_product(s.sv, s.sv)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) AS cs
                       FROM sub s JOIN cb c ON s.sp = c.sp),
            enc AS (SELECT vec_id, sp, c_id AS code
                    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sp
                            ORDER BY cs DESC, c_id) AS rn FROM scored) t
                    WHERE rn = 1),
            lut AS (SELECT vec_id AS q_id, sp, c_id AS code, cs AS ls
                    FROM scored WHERE vec_id < 10),
            adc AS (SELECT l.q_id, e.vec_id AS n_id, (round(sum(l.ls), 4) + 0.0) AS adc
                    FROM enc e JOIN lut l ON l.sp = e.sp AND l.code = e.code
                    WHERE e.vec_id <> l.q_id
                    GROUP BY 1, 2),
            cand AS (SELECT q_id, n_id
                     FROM (SELECT q_id, n_id,
                             row_number() OVER (PARTITION BY q_id
                               ORDER BY adc DESC, n_id) AS crn FROM adc) t
                     WHERE crn <= 64),
            sims AS (SELECT q_id, n_id,
                            (round(list_dot_product(qe.v, ne.v) /
                                  (sqrt(list_dot_product(qe.v, qe.v)) *
                                   sqrt(list_dot_product(ne.v, ne.v))), 4) + 0.0) AS sim
                     FROM cand JOIN em qe ON qe.vec_id = q_id
                               JOIN em ne ON ne.vec_id = n_id),
            rk AS (SELECT q_id, n_id, sim,
                          CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id) AS INT) AS rn
                   FROM sims)
         SELECT q_id, n_id, sim, rn FROM rk WHERE rn <= 3 ORDER BY q_id, rn""",
    "q_embedding_pq" ->
      // spherical product quantization: same rounded-cosine argmax +
      // c_id tie-break determinism rule as the IVF oracle
      """WITH em AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            sub AS (SELECT vec_id, CAST(i.sp AS INT) AS sp,
                           v[(CAST(i.sp AS INT) * 16 + 1):(CAST(i.sp AS INT) * 16 + 16)] AS sv
                    FROM em, range(0, 4) i(sp)),
            cb AS (SELECT sp, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id < 8),
            scored AS (SELECT s.vec_id, s.sp, c.c_id,
                              (round(list_dot_product(s.sv, c.cv) /
                                    (sqrt(list_dot_product(s.sv, s.sv)) *
                                     sqrt(list_dot_product(c.cv, c.cv))), 4) + 0.0) AS cs
                       FROM sub s JOIN cb c ON s.sp = c.sp),
            enc AS (SELECT vec_id, sp, c_id AS code, cs
                    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sp
                            ORDER BY cs DESC, c_id) AS rn FROM scored) t
                    WHERE rn = 1)
         SELECT vec_id,
                CAST(max(CASE WHEN sp = 0 THEN code END) AS BIGINT) AS code0,
                CAST(max(CASE WHEN sp = 1 THEN code END) AS BIGINT) AS code1,
                CAST(max(CASE WHEN sp = 2 THEN code END) AS BIGINT) AS code2,
                CAST(max(CASE WHEN sp = 3 THEN code END) AS BIGINT) AS code3,
                (round(sum(1.0 - cs), 4) + 0.0) AS q_err
         FROM enc GROUP BY 1 ORDER BY 1""",
    "q_embedding_centroid" ->
      """SELECT label, CAST(i AS INT) AS pos,
                (round(avg(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)), 4) + 0.0) AS c
         FROM embeddings, range(0, 64) t(i)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_text_stats" ->
      """WITH base AS (SELECT lang, count(*) AS n_docs,
                              (round(avg(n_chars), 4) + 0.0) AS avg_chars,
                              (round(avg(len(string_split(text, ' '))), 4) + 0.0) AS avg_tokens
                       FROM documents GROUP BY 1),
            vocab AS (SELECT lang, count(DISTINCT tok) AS n_vocab
                      FROM (SELECT lang,
                                   unnest(string_split(text, ' ')) AS tok
                            FROM documents) t
                      WHERE length(tok) > 0 GROUP BY 1)
         SELECT base.lang AS lang, n_docs, avg_chars, avg_tokens, n_vocab
         FROM base JOIN vocab ON base.lang = vocab.lang ORDER BY lang""",
    "q_text_quality" ->
      """SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tokens,
                CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
                (round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) + 0.0) AS uniq_ratio,
                (round(round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) *
                      least(1.0, len(toks) / 50.0), 4) + 0.0) AS quality
         FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents) t
         ORDER BY doc_id""",
    "q_token_count" ->
      """SELECT lang,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
                CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))) AS BIGINT) AS re_tokens
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_fingerprint" ->
      """SELECT doc_id,
                list_min(list_transform(range(1, len(toks) - 1),
                  i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS fp
         FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
         WHERE len(toks) >= 3 ORDER BY doc_id""",
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            tf AS (SELECT tok, count(*) AS tf FROM t
                   WHERE length(tok) > 0 GROUP BY 1),
            top AS (SELECT tok, tf FROM tf ORDER BY tf DESC, tok LIMIT 50)
         SELECT tok, tf FROM top ORDER BY tok""",
    "q_pmi_bigrams" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
            u AS (SELECT unnest(ws) AS w FROM t),
            uni AS (SELECT w, count(*) AS n FROM u
                    WHERE length(w) > 0 GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM uni),
            bg0 AS (SELECT unnest(list_transform(range(1, len(ws)),
                             i -> {'a': ws[i], 'b': ws[i+1]})) AS p
                    FROM t),
            bg AS (SELECT p.a AS a, p.b AS b FROM bg0
                   WHERE length(p.a) > 0 AND length(p.b) > 0),
            np AS (SELECT count(*) AS np FROM bg),
            cnt AS (SELECT a, b, count(*) AS n_ab FROM bg GROUP BY 1, 2
                    HAVING count(*) >= 5)
         SELECT c.a, c.b, c.n_ab,
                (round(ln((c.n_ab * 1.0 * tot.nn * tot.nn) /
                         (np.np * 1.0 * ua.n * ub.n)), 4) + 0.0) AS pmi
         FROM cnt c
         JOIN uni ua ON c.a = ua.w
         JOIN uni ub ON c.b = ub.w
         CROSS JOIN tot CROSS JOIN np
         ORDER BY c.a, c.b""",
    "q_negative_pairs" ->
      """WITH docs AS (SELECT doc_id, lang FROM documents),
            nn AS (SELECT count(*) AS n FROM docs),
            slots AS (SELECT unnest([1, 2]) AS slot),
            a AS (SELECT doc_id, lang, slot, n,
                         ('0x' || substr(md5(doc_id || ':' || slot), 1, 8))
                           ::BIGINT % n AS h
                  FROM docs CROSS JOIN nn CROSS JOIN slots),
            pairs AS (SELECT doc_id, lang, slot,
                             CASE WHEN h = doc_id THEN (h + 1) % n
                                  ELSE h END AS neg_id
                      FROM a)
         SELECT p.doc_id, p.slot, p.neg_id, p.lang, d.lang AS neg_lang
         FROM pairs p JOIN docs d ON p.neg_id = d.doc_id
         ORDER BY p.doc_id, p.slot""",
    "q_lang_id" ->
      """SELECT lang, pred_lang, count(*) AS n
         FROM (SELECT lang,
                      CASE WHEN rr > 0.02 THEN 'zh'
                           WHEN vr > 0.40 THEN 'es'
                           WHEN vr > 0.36 THEN 'fr'
                           WHEN vr > 0.32 THEN 'en'
                           ELSE 'de' END AS pred_lang
               FROM (SELECT lang,
                            CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
                              / length(text) AS vr,
                            CAST(length(text) - length(regexp_replace(text, '[zxq]', '', 'g')) AS DOUBLE)
                              / length(text) AS rr
                     FROM documents) a) b
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_multimodal_meta" ->
      // closed-form mirror of the REAL containers the engine writes
      // then parses back: BMP = 54-byte header + 4-byte-padded 24bpp
      // rows; WAV = 44-byte header + 2 bytes/sample at 8 kHz mono;
      // video = (1 + n%10) concatenated BMP frames at 40 ms each
      """WITH d AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n
                    FROM documents),
            m AS (SELECT doc_id, n,
                         CASE WHEN doc_id % 3 = 0 THEN 'image'
                              WHEN doc_id % 3 = 1 THEN 'audio'
                              ELSE 'video' END AS kind,
                         4 + n % 60 AS w, 4 + (7 * n) % 44 AS h,
                         1 + n % 10 AS f
                  FROM d),
            g AS (SELECT kind,
                         CASE WHEN kind = 'audio' THEN 0 ELSE w END AS width,
                         CASE WHEN kind = 'audio' THEN 0 ELSE h END AS height,
                         CASE kind
                           WHEN 'image' THEN 54 + ((3*w+3) - (3*w+3) % 4) * h
                           WHEN 'audio' THEN 44 + 2 * n
                           ELSE f * (54 + ((3*w+3) - (3*w+3) % 4) * h)
                         END AS byte_len,
                         CASE kind
                           WHEN 'audio' THEN (n * 1000) // 8000
                           WHEN 'video' THEN f * 40
                           ELSE 0
                         END AS dur
                  FROM m)
         SELECT kind, count(*) AS n,
                CAST(sum(byte_len) AS BIGINT) AS total_bytes,
                (round(avg(width), 4) + 0.0) AS avg_width,
                (round(avg(height), 4) + 0.0) AS avg_height,
                CAST(sum(dur) AS BIGINT) AS total_duration_ms
         FROM g GROUP BY 1 ORDER BY 1""",
    "q_multimodal_frames" ->
      """WITH v AS (SELECT doc_id AS asset_id,
                           CAST(octet_length(encode(text)) AS INT) AS n
                    FROM documents WHERE doc_id % 3 = 2),
            m AS (SELECT asset_id, n, 1 + (n % 10) AS frames,
                         4 + n % 60 AS w, 4 + (7 * n) % 44 AS h
                  FROM v),
            s AS (SELECT asset_id, frames,
                         54 + ((3*w+3) - (3*w+3) % 4) * h AS frame_bytes
                  FROM m)
         SELECT asset_id,
                CAST((frames + 1) // 2 AS BIGINT) AS n_sampled,
                CAST(((frames + 1) // 2) * frame_bytes AS BIGINT) AS sampled_bytes
         FROM s ORDER BY asset_id""",
    "q_text_filter" ->
      """SELECT doc_id, lang, n_tokens, mean_tok_len, uniq_ratio, stop_ratio,
                CAST((n_tokens BETWEEN 10 AND 5000)
                     AND (mean_tok_len BETWEEN 2.0 AND 12.0)
                     AND uniq_ratio > 0.2
                     AND stop_ratio < 0.3 AS INT) AS keep
         FROM (SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tokens,
                      (round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                            / len(toks), 4) + 0.0) AS mean_tok_len,
                      (round(CAST(len(list_distinct(toks)) AS DOUBLE)
                            / len(toks), 4) + 0.0) AS uniq_ratio,
                      (round(CAST(len(list_filter(toks,
                              t -> t IN ('the', 'a'))) AS DOUBLE)
                            / len(toks), 4) + 0.0) AS stop_ratio
               FROM (SELECT doc_id, lang, text,
                            string_split(text, ' ') AS toks
                     FROM documents) t0) t1
         ORDER BY doc_id""",
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            bg AS (SELECT doc_id, unnest(list_transform(list_zip(toks, toks[2:]),
                                         p -> p[1] || ' ' || p[2])) AS bigram
                   FROM t),
            bgs AS (SELECT doc_id, count(*) AS n_bg,
                           count(DISTINCT bigram) AS n_bg_d
                    FROM bg WHERE bigram IS NOT NULL GROUP BY 1),
            tokc AS (SELECT doc_id, tok, count(*) AS c
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents) u
                     GROUP BY 1, 2),
            topf AS (SELECT doc_id, max(c) AS maxc, CAST(sum(c) AS BIGINT) AS n
                     FROM tokc GROUP BY 1)
         SELECT f.doc_id, CAST(f.n AS INT) AS n_tokens,
                (round(f.maxc::DOUBLE / f.n, 4) + 0.0) AS top_tok_frac,
                (round(coalesce((b.n_bg - b.n_bg_d)::DOUBLE / nullif(b.n_bg, 0),
                               0.0), 4) + 0.0) AS dup_bigram_frac
         FROM topf f LEFT JOIN bgs b ON f.doc_id = b.doc_id
         ORDER BY f.doc_id""",
    "q_pii_redact" ->
      """SELECT event_id,
                CAST(len(regexp_extract_all(props, '[0-9]+', 0)) AS INT) AS n_redact,
                md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS red_hash
         FROM events ORDER BY event_id""",
    "q_contamination" ->
      // benchmark-contamination: fraction of each corpus doc's distinct
      // 3-grams present in the benchmark set (doc_id < 50). The oracle
      // compares raw string grams where Spark compares their int64
      // hashes — counts agree absent hash collisions (q_dedup_ngram's
      // documented contract)
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            ng AS (SELECT doc_id,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngs
                   FROM base),
            nz AS (SELECT doc_id, ngs FROM ng WHERE len(ngs) > 0),
            bench AS (SELECT DISTINCT unnest(ngs) AS g FROM nz
                      WHERE doc_id < 50),
            corpus AS (SELECT doc_id, unnest(ngs) AS g FROM nz
                       WHERE doc_id >= 50),
            sz AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
            ov AS (SELECT c.doc_id, count(*) AS n_overlap
                   FROM corpus c JOIN bench USING (g) GROUP BY 1)
         SELECT sz.doc_id AS doc_id, n_grams,
                CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
                (round(CAST(coalesce(n_overlap, 0) AS DOUBLE) / n_grams, 4) + 0.0)
                  AS contamination
         FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
         ORDER BY doc_id""",
    "q_corpus_mix" ->
      """WITH cells AS (SELECT lang, source, count(*) AS n_docs,
                               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
                        FROM documents GROUP BY 1, 2),
            t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM cells)
         SELECT lang, source, n_docs, tokens,
                (round(CAST(tokens AS DOUBLE) / total_tokens, 4) + 0.0) AS share
         FROM cells, t ORDER BY lang, source""",
    "q_mix_temperature" ->
      """WITH bl AS (SELECT lang, count(*) AS n_docs,
                            CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                              AS tokens
                     FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM bl),
            sh AS (SELECT lang, n_docs, tokens,
                          CAST(tokens AS DOUBLE) / total_tokens AS q,
                          sqrt(CAST(tokens AS DOUBLE) / total_tokens) AS wt
                   FROM bl, t),
            ws AS (SELECT sum(wt) AS wt_sum FROM sh)
         SELECT lang, n_docs, tokens,
                (round(q, 4) + 0.0) AS natural_share,
                (round(wt / wt_sum, 4) + 0.0) AS temp_share,
                (round(wt / wt_sum / q, 4) + 0.0) AS boost
         FROM sh, ws ORDER BY lang""",
    "q_mix_apply" ->
      """WITH bl AS (SELECT lang, count(*) AS n_docs,
                            CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                              AS tokens
                     FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM bl),
            sh AS (SELECT lang,
                          CAST(tokens AS DOUBLE) / total_tokens AS q,
                          sqrt(CAST(tokens AS DOUBLE) / total_tokens) AS wt
                   FROM bl, t),
            ws AS (SELECT sum(wt) AS wt_sum FROM sh),
            rates AS (SELECT lang, (round(wt / wt_sum / q, 4) + 0.0) AS boost
                      FROM sh, ws),
            dd AS (SELECT d.doc_id, d.lang, r.boost,
                          ('0x' || substr(md5(d.doc_id || ':mix'), 1, 8))
                            ::BIGINT / 4294967296.0 AS u
                   FROM documents d JOIN rates r USING (lang)),
            c AS (SELECT lang,
                         CAST(floor(boost) AS BIGINT) +
                           CASE WHEN u < boost - floor(boost) THEN 1
                                ELSE 0 END AS n_copies
                  FROM dd)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(n_copies) AS BIGINT) AS n_copies_out,
                (round(CAST(sum(n_copies) AS DOUBLE) / count(*), 4) + 0.0)
                  AS realized_rate
         FROM c GROUP BY 1 ORDER BY 1""",
    "q_chunk_docs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
            n AS (SELECT doc_id, toks,
                         1 + (greatest(len(toks) - 50, 0) + 39) // 40
                           AS n_chunks
                  FROM d),
            st AS (SELECT doc_id, toks,
                          unnest(generate_series(0, (n_chunks - 1) * 40, 40))
                            AS start
                   FROM n),
            ch AS (SELECT doc_id,
                          CAST(start // 40 AS BIGINT) AS chunk_id,
                          CAST(start AS BIGINT) AS start_tok,
                          list_slice(toks, start + 1, start + 50) AS chunk
                   FROM st)
         SELECT doc_id, chunk_id, start_tok,
                CAST(len(chunk) AS BIGINT) AS n_tok_chunk,
                md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM ch ORDER BY doc_id, chunk_id""",
    "q_dup_spans" ->
      // Duplicated-span detection: positions whose word-8-gram occurs
      // in >= 2 docs, merged into spans when the position gap <= 7
      // (overlapping [p, p+8) windows); covered tokens = 8 per opener
      // + the gap per continuation. Raw-string grams — hash-free.
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
                           len(string_split(text, ' ')) AS m
                    FROM documents),
            dd AS (SELECT * FROM d WHERE m >= 8),
            pos AS (SELECT doc_id, m, w,
                           unnest(generate_series(0, m - 8)) AS p
                    FROM dd),
            grams AS (SELECT doc_id, m, p,
                             array_to_string(
                               list_slice(w, p + 1, p + 8), ' ') AS g
                      FROM pos),
            common AS (SELECT g FROM grams
                       GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
            dup AS (SELECT doc_id, m, p FROM grams
                    WHERE g IN (SELECT g FROM common)),
            marked AS (SELECT doc_id, m, p,
                              lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                                AS prev_p
                       FROM dup),
            c AS (SELECT doc_id, m,
                         CASE WHEN prev_p IS NULL OR p - prev_p > 7
                              THEN 1 ELSE 0 END AS new_span,
                         CASE WHEN prev_p IS NULL OR p - prev_p > 7
                              THEN 8 ELSE p - prev_p END AS cover
                  FROM marked)
         SELECT doc_id, CAST(m AS BIGINT) AS n_tokens,
                count(*) AS n_dup_grams,
                CAST(sum(new_span) AS BIGINT) AS n_spans,
                CAST(sum(cover) AS BIGINT) AS covered,
                (round(CAST(sum(cover) AS DOUBLE) / m, 4) + 0.0) AS dup_frac
         FROM c GROUP BY doc_id, m ORDER BY doc_id""",
    "q_doc_length_histogram" ->
      """SELECT CAST((len(string_split(text, ' ')) // 10) * 10 AS BIGINT) AS bucket,
                count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_shard_export" ->
      """WITH k AS (SELECT n_chars,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             AS skey
                    FROM documents)
         SELECT skey % 16 AS shard, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(skey) AS key_min, max(skey) AS key_max
         FROM k GROUP BY 1 ORDER BY 1""",
    "q_sample_stratified" ->
      """SELECT doc_id, lang, bucket
         FROM (SELECT doc_id, lang,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 100 AS bucket
               FROM documents) t
         WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
         ORDER BY doc_id""",
    "q_sample_quota" ->
      """WITH k AS (SELECT lang, doc_id,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             ::BIGINT AS hkey
                    FROM documents),
            r AS (SELECT lang, doc_id, hkey,
                         row_number() OVER (PARTITION BY lang
                           ORDER BY hkey, doc_id) AS rk
                  FROM k)
         SELECT lang, rk, doc_id, hkey FROM r
         WHERE rk <= 100 ORDER BY lang, rk""",
    "q_token_entropy" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            tf AS (SELECT source, tok, count(*) AS tf FROM t
                   WHERE length(tok) > 0 GROUP BY 1, 2),
            ag AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens,
                          count(*) AS n_distinct,
                          CAST(sum(CAST(round(tf * ln(tf) * 1000000.0)
                                        AS BIGINT)) AS BIGINT) AS tl_micro
                   FROM tf GROUP BY 1)
         SELECT source, n_tokens, n_distinct,
                (round(n_distinct / CAST(n_tokens AS DOUBLE), 4) + 0.0) AS ttr,
                (round(ln(n_tokens) - tl_micro / 1000000.0 / n_tokens, 4) + 0.0)
                  AS entropy
         FROM ag ORDER BY 1""",
    "q_sample_weighted" ->
      """WITH k AS (SELECT lang, doc_id,
                           (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              ::BIGINT + 0.5) / 4294967296.0 / n_chars AS pri
                    FROM documents WHERE n_chars > 0),
            r AS (SELECT lang, doc_id, pri,
                         row_number() OVER (PARTITION BY lang
                           ORDER BY pri, doc_id) AS rk
                  FROM k)
         SELECT lang, rk, doc_id, pri AS priority FROM r
         WHERE rk <= 100 ORDER BY lang, rk""",
    "q_dedup_cluster" ->
      """WITH RECURSIVE
            base AS (SELECT doc_id, lang, source,
                            string_split(text, ' ') AS toks FROM documents),
            ng AS (SELECT doc_id, lang, source,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngs
                   FROM base),
            nz AS (SELECT doc_id, lang, source, ngs FROM ng WHERE len(ngs) > 0),
            ex0 AS (SELECT doc_id, lang, source, unnest(ngs) AS g FROM nz),
            dfreq AS (SELECT g, count(*) AS df FROM ex0 GROUP BY 1),
            ex AS (SELECT ex0.* FROM ex0 JOIN dfreq USING (g) WHERE df <= 100),
            sz AS (SELECT doc_id, count(*) AS nsz FROM ex GROUP BY 1),
            inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                      FROM ex a JOIN ex b
                        ON a.lang = b.lang AND a.source = b.source
                       AND a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pairs AS (SELECT d1, d2
                      FROM inter JOIN sz s1 ON s1.doc_id = d1
                                 JOIN sz s2 ON s2.doc_id = d2
                      WHERE (round(CAST(inter AS DOUBLE)
                                  / (s1.nsz + s2.nsz - inter), 4) + 0.0) >= 0.5),
            edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                      UNION ALL SELECT d2, d1 FROM pairs),
            reach AS (SELECT doc_id AS v, doc_id AS r FROM documents
                      UNION
                      SELECT e.b AS v, reach.r AS r
                      FROM reach JOIN edges e ON e.a = reach.v)
         SELECT v AS doc_id, min(r) AS component
         FROM reach GROUP BY 1 ORDER BY 1""",
    "q_dedup_keep_best" ->
      """WITH RECURSIVE
            base AS (SELECT doc_id, lang, source,
                            string_split(text, ' ') AS toks FROM documents),
            ng AS (SELECT doc_id, lang, source,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngs
                   FROM base),
            nz AS (SELECT doc_id, lang, source, ngs FROM ng WHERE len(ngs) > 0),
            ex0 AS (SELECT doc_id, lang, source, unnest(ngs) AS g FROM nz),
            dfreq AS (SELECT g, count(*) AS df FROM ex0 GROUP BY 1),
            ex AS (SELECT ex0.* FROM ex0 JOIN dfreq USING (g) WHERE df <= 100),
            sz AS (SELECT doc_id, count(*) AS nsz FROM ex GROUP BY 1),
            inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                      FROM ex a JOIN ex b
                        ON a.lang = b.lang AND a.source = b.source
                       AND a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pairs AS (SELECT d1, d2
                      FROM inter JOIN sz s1 ON s1.doc_id = d1
                                 JOIN sz s2 ON s2.doc_id = d2
                      WHERE (round(CAST(inter AS DOUBLE)
                                  / (s1.nsz + s2.nsz - inter), 4) + 0.0) >= 0.5),
            edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                      UNION ALL SELECT d2, d1 FROM pairs),
            reach AS (SELECT doc_id AS v, doc_id AS r FROM documents
                      UNION
                      SELECT e.b AS v, reach.r AS r
                      FROM reach JOIN edges e ON e.a = reach.v),
            comp AS (SELECT v AS doc_id, min(r) AS component
                     FROM reach GROUP BY 1),
            quality AS (SELECT doc_id,
                               (round(round(CAST(len(list_distinct(toks)) AS DOUBLE)
                                            / len(toks), 4)
                                      * least(1.0, len(toks) / 50.0), 4) + 0.0) AS quality
                        FROM base),
            scored AS (SELECT c.component, c.doc_id, q.quality
                       FROM comp c JOIN quality q USING (doc_id)),
            best AS (SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
                            max(quality) AS best_quality
                     FROM scored GROUP BY 1)
         SELECT s.component, b.n_docs, min(s.doc_id) AS keep_doc_id,
                b.best_quality
         FROM scored s JOIN best b ON s.component = b.component
         WHERE s.quality = b.best_quality
         GROUP BY 1, 2, 4 ORDER BY 1""",
    "q_curation_funnel" ->
      // per-source staged attrition: benchmark split -> quality gate ->
      // cluster-canonical keeper -> contamination gate; token sum over
      // final survivors. Gram overlap compares raw strings where Spark
      // compares int64 hashes (the q_contamination contract).
      """WITH RECURSIVE
            base AS (SELECT doc_id, lang, source,
                            string_split(text, ' ') AS toks FROM documents),
            ng AS (SELECT doc_id, lang, source,
                          list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngs
                   FROM base),
            nz AS (SELECT doc_id, lang, source, ngs FROM ng WHERE len(ngs) > 0),
            ex0 AS (SELECT doc_id, lang, source, unnest(ngs) AS g FROM nz),
            dfreq AS (SELECT g, count(*) AS df FROM ex0 GROUP BY 1),
            ex AS (SELECT ex0.* FROM ex0 JOIN dfreq USING (g) WHERE df <= 100),
            sz AS (SELECT doc_id, count(*) AS nsz FROM ex GROUP BY 1),
            inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                      FROM ex a JOIN ex b
                        ON a.lang = b.lang AND a.source = b.source
                       AND a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pairs AS (SELECT d1, d2
                      FROM inter JOIN sz s1 ON s1.doc_id = d1
                                 JOIN sz s2 ON s2.doc_id = d2
                      WHERE (round(CAST(inter AS DOUBLE)
                                  / (s1.nsz + s2.nsz - inter), 4) + 0.0) >= 0.5),
            edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                      UNION ALL SELECT d2, d1 FROM pairs),
            reach AS (SELECT doc_id AS v, doc_id AS r FROM documents
                      UNION
                      SELECT e.b AS v, reach.r AS r
                      FROM reach JOIN edges e ON e.a = reach.v),
            comp AS (SELECT v AS doc_id, min(r) AS component
                     FROM reach GROUP BY 1),
            quality AS (SELECT doc_id,
                               (round(round(CAST(len(list_distinct(toks)) AS DOUBLE)
                                            / len(toks), 4)
                                      * least(1.0, len(toks) / 50.0), 4) + 0.0) AS quality
                        FROM base),
            scored AS (SELECT c.component, c.doc_id, q.quality
                       FROM comp c JOIN quality q USING (doc_id)),
            best AS (SELECT component, max(quality) AS best_quality
                     FROM scored GROUP BY 1),
            keepers AS (SELECT min(s.doc_id) AS doc_id
                        FROM scored s JOIN best b ON s.component = b.component
                        WHERE s.quality = b.best_quality
                        GROUP BY s.component),
            bench AS (SELECT DISTINCT unnest(ngs) AS g FROM nz
                      WHERE doc_id < 50),
            corpus AS (SELECT doc_id, unnest(ngs) AS g FROM nz
                       WHERE doc_id >= 50),
            csz AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
            cov AS (SELECT c.doc_id, count(*) AS n_overlap
                    FROM corpus c JOIN bench USING (g) GROUP BY 1),
            contam AS (SELECT csz.doc_id,
                              (round(CAST(coalesce(n_overlap, 0) AS DOUBLE)
                                     / n_grams, 4) + 0.0) AS contamination
                       FROM csz LEFT JOIN cov ON csz.doc_id = cov.doc_id),
            flags AS (SELECT b.source, len(b.toks) AS tokens,
                             CASE WHEN b.doc_id >= 50 THEN 1 ELSE 0 END AS f1,
                             CASE WHEN b.doc_id >= 50
                                   AND q.quality >= 0.5 THEN 1 ELSE 0 END AS f2,
                             CASE WHEN b.doc_id >= 50 AND q.quality >= 0.5
                                   AND k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f3,
                             CASE WHEN b.doc_id >= 50 AND q.quality >= 0.5
                                   AND k.doc_id IS NOT NULL
                                   AND coalesce(c.contamination, 0.0) < 0.2
                                  THEN 1 ELSE 0 END AS f4
                      FROM base b
                      JOIN quality q ON q.doc_id = b.doc_id
                      LEFT JOIN keepers k ON k.doc_id = b.doc_id
                      LEFT JOIN contam c ON c.doc_id = b.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_total,
                CAST(sum(f1) AS BIGINT) AS n_corpus,
                CAST(sum(f2) AS BIGINT) AS n_quality,
                CAST(sum(f3) AS BIGINT) AS n_dedup,
                CAST(sum(f4) AS BIGINT) AS n_clean,
                CAST(sum(tokens * f4) AS BIGINT) AS tokens_kept
         FROM flags GROUP BY 1 ORDER BY 1""",
  )
}
