package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage truncation for ITERATIVE builds (r10).
  *
  * An iteratively-built DataFrame (NN-Descent rounds, graph repair
  * chains, walk rounds) references its previous round's plan several
  * times per step, so the LOGICAL plan grows multiplicatively per
  * iteration even when every round is persisted — and every downstream
  * action re-pays plan analysis over the whole tree (observed: the NND
  * serving graph cost ~7 s of pure driver-side analysis per action at
  * sf0.001, 25× its sibling, with zero executor work). Persisting alone
  * does not help: InMemoryRelation substitution happens AFTER analysis.
  *
  * `checkpointed` materializes the frame, REBASES it onto its computed
  * row RDD (the plan becomes a flat scan — the Bpe/cutRound convention),
  * and re-persists the rebased frame so that:
  *   - downstream plans embed one LogicalRDD leaf, not the build tree;
  *   - the returned frame's own unpersist() releases its storage
  *     normally (a bare createDataFrame(p.rdd, _) rebase would leave
  *     unpersist a silent no-op — the original plan, not the rebased
  *     one, is what CacheManager knows);
  *   - eviction stays safe: a lost block recomputes through the
  *     original lineage held by the underlying RDD DAG.
  * The original's cache entry is released (blocking) before returning,
  * so the transient double-copy never outlives the call. On a cluster
  * this is exactly a per-step RDD checkpoint of the build.
  */
private[graft] object PlanCut {
  def checkpointed(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count()
    val rb = spark.createDataFrame(p.rdd, df.schema).persist()
    rb.count()
    p.unpersist(blocking = true)
    rb
  }
}
