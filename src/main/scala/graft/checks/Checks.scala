package graft.checks

import graft.catalog.{CheckFailedException, CheckSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Write-side quality gate.
  *
  * Mirrors the reference's pandera validation on save (reference
  * src/qafs/core.py:414-427): dtype conformance plus value predicates such as
  * `value > 0`. Unlike the reference (whose `check_raise_error` flag was
  * broken — src/qafs/core.py:34 vs 424), failure behavior is an explicit
  * constructor flag on the store.
  *
  * Scale note: all predicates are fused into ONE aggregate pass
  * (`sum(violations)` per predicate in a single job) rather than one
  * `filter().count()` job per predicate; via [[Checks.observed]] they can be
  * fused into the write scan itself with zero extra passes.
  */
object Checks {

  case class Violation(predicate: String, count: Long) {
    override def toString = s"check '$predicate' failed for $count rows"
  }

  /** Per-predicate violation-count aggregates. Predicates are full SQL
    * boolean expressions over the frame's columns (by contract over
    * `value` — the dtype check is what consumes an explicit column name).
    */
  private def violationCols(spec: CheckSpec): Seq[(String, Column)] =
    spec.predicates.map { p =>
      p -> sum(when(!expr(p), 1L).otherwise(0L))
    }

  /** Validate dtype + predicates; returns violations (empty = pass).
    * One Spark job total for all predicates.
    */
  def validate(df: DataFrame, spec: CheckSpec, valueCol: String = "value"): Seq[Violation] = {
    val dtypeViolation = spec.dtype.flatMap { d =>
      val want = DataType.fromDDL(d)
      val got = df.schema(valueCol).dataType
      if (got.catalogString == want.catalogString) None
      else Some(Violation(s"dtype $valueCol == $d", -1L)) // -1: schema-level, not row count
    }
    val predViolations =
      if (spec.predicates.isEmpty) Nil
      else {
        val aggs = violationCols(spec).map { case (p, c) => c.as(p) }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        spec.predicates.zipWithIndex.collect {
          case (p, i) if !row.isNullAt(i) && row.getLong(i) > 0 => Violation(p, row.getLong(i))
        }
      }
    dtypeViolation.toSeq ++ predViolations
  }

  /** Fuse predicate counting into a downstream action via `Observation`:
    * returns the instrumented frame + a callback that yields violations after
    * the action ran. Used for log-only mode where the write proceeds and the
    * check must not cost a second scan of the input.
    */
  def observed(df: DataFrame, spec: CheckSpec, valueCol: String = "value")
      : (DataFrame, () => Seq[Violation]) = {
    if (spec.predicates.isEmpty) (df, () => Nil)
    else {
      val obs = Observation()
      val aggs = spec.predicates.zipWithIndex.map { case (p, i) =>
        sum(when(!expr(p), 1L).otherwise(0L)).as(s"v$i")
      }
      val out = df.observe(obs, aggs.head, aggs.tail: _*)
      val get = () => {
        val m = obs.get
        spec.predicates.zipWithIndex.collect {
          case (p, i) if m.get(s"v$i").exists(v => v != null && v.asInstanceOf[Long] > 0) =>
            Violation(p, m(s"v$i").asInstanceOf[Long])
        }
      }
      (out, get)
    }
  }

  def enforce(df: DataFrame, spec: CheckSpec, feature: String, failOnError: Boolean,
      valueCol: String = "value"): Unit = {
    val vs = validate(df, spec, valueCol)
    if (vs.nonEmpty) {
      val msg = s"quality check failed for $feature: ${vs.mkString("; ")}"
      if (failOnError) throw new CheckFailedException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
  }
}
