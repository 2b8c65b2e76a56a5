package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Drift measurement beyond the feature store's numeric histograms
  * ([[graft.api.FeatureStore.profileDrift]] and friends): categorical
  * shares and the summary scalars. Everything integer-exact (the ppm
  * contract) so reports and alert thresholds are bit-reproducible.
  */
object DriftOps {

  /** Categorical drift between a reference and a current row set: per
    * category, counts and integer floor-ppm shares of each set plus the
    * delta — same output contract as the numeric histogram report, with
    * the category value in place of the bin. Categories absent from one
    * side get zero counts (never dropped — a vanished or new category is
    * exactly what categorical drift must surface). One hash aggregate
    * over the union; the share window is bounded by the category count.
    */
  def categoricalDrift(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    val u = ref.select(col(catCol).as("category"), lit(0).as("__w"))
      .unionAll(cur.select(col(catCol).as("category"), lit(1).as("__w")))
    val h = u.groupBy(col("category"))
      .agg(sum(when(col("__w") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__w") === 1, 1L).otherwise(0L)).as("n_cur"))
    ppmShares(h, Seq("category"))
  }

  /** The shared report tail of every drift flavor: append integer
    * floor-ppm shares of each side + the delta to an
    * `(keyCols..., n_ref, n_cur)` frame. The total window is bounded by
    * the key count (bins/categories), never data volume; empty-side
    * shares are null, never a division error. ONE implementation —
    * numeric, stored, streamed, and categorical reports must stay
    * bit-identical to their shared oracles.
    */
  private[graft] def ppmShares(h: DataFrame, keyCols: Seq[String]): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    h.withColumn("__tr", sum(col("n_ref")).over(all))
      .withColumn("__tc", sum(col("n_cur")).over(all))
      .select(keyCols.map(col) ++ Seq(col("n_ref"), col("n_cur"),
        when(col("__tr") > 0, expr("n_ref * 1000000 div __tr")).as("ref_ppm"),
        when(col("__tc") > 0, expr("n_cur * 1000000 div __tc")).as("cur_ppm")): _*)
      .withColumn("delta_ppm", col("cur_ppm") - col("ref_ppm"))
  }

  /** One-row summary of any drift report (numeric or categorical —
    * anything with `ref_ppm`/`cur_ppm`/`delta_ppm` columns):
    *  - `tv_ppm`: total-variation distance = Σ|delta|/2, the EXACT
    *    integer drift scalar;
    *  - `psi_q`: a PSI-shaped divergence with the repo's engine-exact
    *    bit-length log surrogate — Σ (cur−ref) · (bitlen(cur+1) −
    *    bitlen(ref+1)) over ppm shares. Like true PSI it is symmetric-
    *    positive when mass moves between bins and 0 when nothing moved;
    *    unlike float PSI it is bit-reproducible. Null shares count as 0.
    */
  def driftSummary(report: DataFrame): DataFrame = {
    def bitlen(x: org.apache.spark.sql.Column) = length(bin(x))
    val r = coalesce(col("ref_ppm"), lit(0L))
    val c = coalesce(col("cur_ppm"), lit(0L))
    report.agg(
      (sum(abs(col("delta_ppm"))).cast("bigint") / lit(2)).cast("bigint")
        .as("tv_ppm"),
      sum((c - r) * (bitlen(c + 1) - bitlen(r + 1)).cast("bigint"))
        .cast("bigint").as("psi_q"))
  }
}
