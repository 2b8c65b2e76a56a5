package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Union

/** Library bridge into Spark's `private[sql]` Dataset factory, for the ONE
  * construction the public API prices quadratically: an N-ary union.
  *
  * `Dataset.union`/`unionByName` are pairwise, and every intermediate
  * Dataset eagerly re-analyzes its whole subtree — a left-deep reduce over
  * n frames visits O(n²) plan nodes, which at training-set-export width is
  * DRIVER-side minutes (measured ~88 s of the 100-feature wide fan-in's
  * plan assembly at n=100; ~100× that at n=1000) before a single task
  * runs. Building the n-ary [[Union]] node over the children's ANALYZED
  * plans and analyzing ONCE is O(n) — the same shape Spark itself uses for
  * multi-path `spark.read.parquet(p1, p2, ...)`.
  *
  * Scope deliberately minimal: positional union of same-schema frames
  * (callers align columns first), nothing else reaches into the internals.
  */
object GraftSqlBridge {
  /** Positional N-ary union of same-schema frames, analyzed once. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll of no frames")
    if (dfs.size == 1) dfs.head
    else {
      val head = dfs.head.asInstanceOf[classic.Dataset[Row]]
      val first = head.schema.fieldNames.toSeq
      dfs.drop(1).zipWithIndex.foreach { case (d, i) =>
        val names = d.schema.fieldNames.toSeq
        require(names == first,
          s"unionAll: frame ${i + 1} columns $names != head columns $first " +
            "— align columns before the n-ary union (it is positional)")
      }
      classic.Dataset.ofRows(head.sparkSession,
        Union(dfs.map(_.queryExecution.analyzed)))
    }
  }
}
