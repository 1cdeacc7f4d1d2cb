package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ann.Ann
import graft.operators.Analytics
import graft.rbac.Rbac

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query key has (a) a Spark implementation and (b) unless marked
  * rows-only in SURVEY.md, a DuckDB oracle SQL over the same parquet
  * tables producing identical column names, types, and values.
  */
object SparkEntry {

  /** Flagship: permission-aware exact vector top-k (the reference's core
    * query) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rbac.prefilterTopK(spark, "/root/testdata/sf0.001", userId = 1, k = 10)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- A. RBAC vector search core ---
    "rbac_accessible_docs" -> ((s, d) => Rbac.accessibleDocs(s, d, 1).orderBy("document_id")),
    "rbac_prefilter_topk" -> ((s, d) => Rbac.prefilterTopK(s, d, 1, 10)),
    "rbac_postfilter_topk" -> ((s, d) => Rbac.postfilterTopK(s, d, 1, 10)),
    "rbac_rls_topk" -> ((s, d) => Rbac.rlsTopK(s, d, 1, 10)),
    "rbac_selectivity_stats" -> ((s, d) => Rbac.selectivityStats(s, d)),
    "rbac_permission_matrix" -> ((s, d) => Rbac.permissionMatrix(s, d)),
    "rbac_user_role_stats" -> ((s, d) => Rbac.userRoleStats(s, d)),
    // --- B. ANN / vector ops ---
    "ann_bruteforce_topk" -> ((s, d) => Ann.bruteForceCosineTopK(s, d, 10)),
    "ann_bruteforce_l2_topk" -> ((s, d) => Ann.bruteForceL2TopK(s, d, 10)),
    "ann_batch_topk" -> ((s, d) => Ann.batchTopK(s, d, nq = 8, k = 10)),
    "ann_range_search" -> ((s, d) => Ann.rangeSearch(s, d, tau = 1.3)),
    "vector_norms" -> ((s, d) => Ann.vectorNorms(s, d, n = 100)),
    // --- E. Relational analytics ---
    "q1_pricing_summary" -> ((s, d) => Analytics.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Analytics.q3ShippingPriority(s, d)),
    "q5_local_volume" -> ((s, d) => Analytics.q5LocalVolume(s, d)),
    "q_top_suppliers" -> ((s, d) => Analytics.topSuppliers(s, d)),
    "q_order_priority" -> ((s, d) => Analytics.orderPriority(s, d)),
    "events_sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
    "events_window_agg" -> ((s, d) => Analytics.eventsWindowAgg(s, d)),
  )

  // Shared oracle CTE fragments (must mirror graft.rbac.Rbac's derivation
  // arithmetic EXACTLY — SURVEY.md §3).
  private val urAll =
    """ur_all AS (
      |  SELECT c_custkey AS user_id, c_custkey % 10 AS role_id FROM customer
      |  UNION
      |  SELECT c_custkey, (c_custkey * 3 + 1) % 10 FROM customer
      |)""".stripMargin
  private val ur1 =
    """ur AS (
      |  SELECT c_custkey % 10 AS role_id FROM customer WHERE c_custkey = 1
      |  UNION
      |  SELECT (c_custkey * 3 + 1) % 10 FROM customer WHERE c_custkey = 1
      |)""".stripMargin
  private val perm =
    """perm AS (
      |  SELECT doc_id % 10 AS role_id, doc_id AS document_id FROM documents
      |  UNION
      |  SELECT (doc_id // 10) % 10, doc_id FROM documents
      |)""".stripMargin
  private val acc = "acc AS (SELECT DISTINCT document_id FROM perm JOIN ur USING (role_id))"
  private val qv = "q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)"

  def oracleSql: Map[String, String] = Map(
    "rbac_accessible_docs" ->
      s"""WITH $ur1, $perm
         |SELECT DISTINCT document_id FROM perm JOIN ur USING (role_id)
         |ORDER BY document_id""".stripMargin,
    "rbac_prefilter_topk" ->
      s"""WITH $ur1, $perm, $acc, $qv
         |SELECT e.vec_id AS block_id, e.vec_id AS document_id
         |FROM embeddings e JOIN acc ON e.vec_id = acc.document_id, q
         |ORDER BY list_distance(e.embedding::DOUBLE[], q.v), e.vec_id
         |LIMIT 10""".stripMargin,
    "rbac_postfilter_topk" ->
      s"""WITH $ur1, $perm, $acc, $qv,
         |cand AS (
         |  SELECT e.vec_id, list_distance(e.embedding::DOUBLE[], q.v) AS dist
         |  FROM embeddings e, q
         |  ORDER BY dist, e.vec_id LIMIT 100
         |)
         |SELECT c.vec_id AS block_id, c.vec_id AS document_id
         |FROM cand c JOIN acc ON c.vec_id = acc.document_id
         |ORDER BY c.dist, c.vec_id LIMIT 10""".stripMargin,
    "rbac_rls_topk" ->
      s"""WITH $ur1, $perm, $acc, $qv
         |SELECT e.vec_id AS block_id, e.vec_id AS document_id
         |FROM embeddings e JOIN acc ON e.vec_id = acc.document_id, q
         |ORDER BY list_distance(e.embedding::DOUBLE[], q.v), e.vec_id
         |LIMIT 10""".stripMargin,
    "rbac_selectivity_stats" ->
      s"""WITH $urAll, $perm,
         |uracc AS (
         |  SELECT DISTINCT u.user_id, p.document_id
         |  FROM ur_all u JOIN perm p USING (role_id)
         |)
         |SELECT a.user_id,
         |       count(*)::BIGINT AS accessible_blocks,
         |       round(count(*) / (SELECT count(*) FROM embeddings)::DOUBLE, 4) AS selectivity
         |FROM uracc a JOIN embeddings e ON a.document_id = e.vec_id
         |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "rbac_permission_matrix" ->
      s"""WITH $perm
         |SELECT role_id, count(*)::BIGINT AS n_docs,
         |       min(document_id) AS min_doc, max(document_id) AS max_doc
         |FROM perm GROUP BY role_id ORDER BY role_id""".stripMargin,
    "rbac_user_role_stats" ->
      s"""WITH $urAll
         |SELECT role_id, count(*)::BIGINT AS n_users
         |FROM ur_all GROUP BY role_id ORDER BY role_id""".stripMargin,
    "ann_bruteforce_topk" ->
      s"""WITH $qv
         |SELECT e.vec_id FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.v) DESC, e.vec_id
         |LIMIT 10""".stripMargin,
    "ann_bruteforce_l2_topk" ->
      s"""WITH $qv
         |SELECT e.vec_id FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY list_distance(e.embedding::DOUBLE[], q.v), e.vec_id
         |LIMIT 10""".stripMargin,
    "ann_batch_topk" ->
      """SELECT q.vec_id AS query_id, e.vec_id AS block_id
        |FROM embeddings q, embeddings e
        |WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id
        |QUALIFY row_number() OVER (
        |  PARTITION BY q.vec_id
        |  ORDER BY list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), e.vec_id) <= 10
        |ORDER BY query_id, block_id""".stripMargin,
    "ann_range_search" ->
      s"""WITH $qv
         |SELECT e.vec_id FROM embeddings e, q
         |WHERE e.vec_id <> 0 AND list_distance(e.embedding::DOUBLE[], q.v) < 1.3
         |ORDER BY e.vec_id""".stripMargin,
    "vector_norms" ->
      s"""WITH $qv
         |SELECT e.vec_id,
         |       round(sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 4) AS norm,
         |       round(list_inner_product(e.embedding::DOUBLE[], q.v), 4) AS dot_q
         |FROM embeddings e, q WHERE e.vec_id < 100
         |ORDER BY e.vec_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o.o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l.l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_volume" ->
      """SELECT n.n_name,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_suppliers" ->
      """WITH rev AS (
        |  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |  FROM lineitem GROUP BY l_suppkey
        |)
        |SELECT s.s_nationkey, s.s_suppkey, s.s_name, r.revenue,
        |       rank() OVER (PARTITION BY s.s_nationkey
        |                    ORDER BY r.revenue DESC, s.s_suppkey) AS rank_in_nation
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |QUALIFY rank_in_nation <= 3
        |ORDER BY s_nationkey, rank_in_nation, s_suppkey""".stripMargin,
    "q_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
        |         lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), y AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM x
        |), z AS (
        |  SELECT user_id, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
        |  FROM y
        |)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM z GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "events_window_agg" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
