package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Product-quantization kernels (encode / ADC table / ADC score) as native
  * codegen'd expressions.
  *
  * Why custom expressions (the [[LongDotProduct]] bar): the declarative
  * alternative — explode each vector into m sub-vectors, broadcast-join
  * ksub centroids per sub-space, argmin via `max_by` aggregation — streams
  * n·m·ksub joined rows through an aggregation whose buffer holds a struct
  * and an array, which Spark can only run as ObjectHashAggregate; past the
  * (tiny, 128-key) in-memory threshold that FALLS BACK TO SORT-BASED
  * aggregation, i.e. a full sort-spill of the joined stream (measured: a
  * 1M×64d corpus at m=8/ksub=256 is 2×10⁹ joined rows — the smoke filled
  * 80 GB of disk before finishing). The codebook itself is k-means-small
  * (≤ m·ksub·subDim = 16K longs at those parameters), so it travels as two
  * flat broadcast arrays and each kernel is one tight primitive loop per
  * row: encode touches n rows, not n·m·ksub.
  *
  * Shared layout (FAISS-style flat codebook, jagged per-sub-space):
  *  - `cents`: array<bigint> — all live centroids' components, concatenated
  *    in (sub-space j, cell rank, component) order; centroid with GLOBAL
  *    rank g occupies [g·subDim, (g+1)·subDim).
  *  - `joff`:  array<bigint>, length m+1 — joff[j] = global rank of
  *    sub-space j's first cell (so j has joff[j+1]−joff[j] live cells; a
  *    refinement round may empty a cell, hence "live": the layout has no
  *    holes and no padding).
  * Codes are PER-SUB-SPACE ranks (0-based, dense over live cells); the ADC
  * table is indexed by GLOBAL rank, so a lookup is table[joff[j]+code[j]].
  */
private[functions] trait PqLayout {
  protected def isIntArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  protected def intableArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }
}

/** `graft_pq_encode(v, cents, joff)` → array<int> of m codes: per
  * sub-space, the rank of the live centroid minimizing the exact integer
  * L2 distance Σ(x−c)² (ties to the lowest rank — scan order).
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with PqLayout {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (intableArray(first.dataType) && intableArray(second.dataType) &&
        intableArray(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${PqEncode.name} expects (array<int/bigint> vec, array<bigint> cents, " +
        s"array<bigint> joff), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")

  @transient private lazy val vIsInt = isIntArray(first.dataType)
  @transient private lazy val cIsInt = isIntArray(second.dataType)
  @transient private lazy val oIsInt = isIntArray(third.dataType)

  def compute(vA: ArrayData, cA: ArrayData, oA: ArrayData): ArrayData = {
    val m = oA.numElements() - 1
    val n = vA.numElements()
    require(m > 0 && n % m == 0,
      s"pq_encode: vector dim $n not divisible by m=$m sub-spaces")
    val sub = n / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val c0 = if (oIsInt) oA.getInt(j).toLong else oA.getLong(j)
      val c1 = if (oIsInt) oA.getInt(j + 1).toLong else oA.getLong(j + 1)
      var best = Long.MaxValue
      var bestG = c0
      var g = c0
      while (g < c1) {
        var d = 0L
        var i = 0
        val vb = j * sub
        val cb = g * sub
        while (i < sub) {
          val x = if (vIsInt) vA.getInt(vb + i).toLong else vA.getLong(vb + i)
          val c = if (cIsInt) cA.getInt((cb + i).toInt).toLong else cA.getLong((cb + i).toInt)
          val df = x - c
          d += df * df
          i += 1
        }
        if (d < best) { best = d; bestG = g } // strict <: lowest rank wins ties
        g += 1
      }
      codes(j) = (bestG - c0).toInt
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any, c: Any, o: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], o.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (v, c, o) => s"${ev.value} = $ref.compute($v, $c, $o);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqEncode = copy(first = f, second = s, third = t)
}

object PqEncode {
  val name = "graft_pq_encode"
  private val info = new ExpressionInfo(classOf[PqEncode].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$name takes (vec, cents, joff)")
    PqEncode(children(0), children(1), children(2))
  }
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

/** `graft_pq_adc_table(qv, cents, joff)` → array<bigint>: the query's ADC
  * table — exact long dot of the query's j-th sub-vector with EVERY live
  * centroid of sub-space j, indexed by global rank (length joff[m]).
  */
case class PqAdcTable(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with PqLayout {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (intableArray(first.dataType) && intableArray(second.dataType) &&
        intableArray(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${PqAdcTable.name} expects (array<int/bigint> vec, array<bigint> cents, " +
        s"array<bigint> joff), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")

  @transient private lazy val vIsInt = isIntArray(first.dataType)
  @transient private lazy val cIsInt = isIntArray(second.dataType)
  @transient private lazy val oIsInt = isIntArray(third.dataType)

  def compute(vA: ArrayData, cA: ArrayData, oA: ArrayData): ArrayData = {
    val m = oA.numElements() - 1
    val n = vA.numElements()
    require(m > 0 && n % m == 0,
      s"pq_adc_table: vector dim $n not divisible by m=$m sub-spaces")
    val sub = n / m
    val total = (if (oIsInt) oA.getInt(m).toLong else oA.getLong(m)).toInt
    val table = new Array[Long](total)
    var j = 0
    while (j < m) {
      val c0 = (if (oIsInt) oA.getInt(j).toLong else oA.getLong(j)).toInt
      val c1 = (if (oIsInt) oA.getInt(j + 1).toLong else oA.getLong(j + 1)).toInt
      var g = c0
      while (g < c1) {
        var acc = 0L
        var i = 0
        val vb = j * sub
        val cb = g * sub
        while (i < sub) {
          val x = if (vIsInt) vA.getInt(vb + i).toLong else vA.getLong(vb + i)
          val c = if (cIsInt) cA.getInt(cb + i).toLong else cA.getLong(cb + i)
          acc += x * c
          i += 1
        }
        table(g) = acc
        g += 1
      }
      j += 1
    }
    new GenericArrayData(table)
  }

  override def nullSafeEval(v: Any, c: Any, o: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], o.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, (v, c, o) => s"${ev.value} = $ref.compute($v, $c, $o);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqAdcTable = copy(first = f, second = s, third = t)
}

object PqAdcTable {
  val name = "graft_pq_adc_table"
  private val info = new ExpressionInfo(classOf[PqAdcTable].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$name takes (vec, cents, joff)")
    PqAdcTable(children(0), children(1), children(2))
  }
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

/** `graft_pq_adc_score(codes, table, joff)` → bigint: the approximate dot —
  * Σ_j table[joff[j] + codes[j]], m gathers and adds per corpus row. This
  * is the entire per-(query, vector) scan cost of a PQ probe.
  */
case class PqAdcScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with PqLayout {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntArray(first.dataType) && intableArray(second.dataType) &&
        intableArray(third.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${PqAdcScore.name} expects (array<int> codes, array<bigint> table, " +
        s"array<bigint> joff), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")

  @transient private lazy val oIsInt = isIntArray(third.dataType)

  override def nullSafeEval(cd: Any, tb: Any, o: Any): Any = {
    val cA = cd.asInstanceOf[ArrayData]
    val tA = tb.asInstanceOf[ArrayData]
    val oA = o.asInstanceOf[ArrayData]
    val m = oA.numElements() - 1
    var acc = 0L
    var j = 0
    while (j < m) {
      val base = if (oIsInt) oA.getInt(j).toLong else oA.getLong(j)
      acc += tA.getLong((base + cA.getInt(j)).toInt)
      j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getOff = if (oIsInt) "getInt" else "getLong"
    nullSafeCodeGen(ctx, ev, (cd, tb, o) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $o.numElements() - 1;
         |long $acc = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $tb.getLong((int) ($o.$getOff($j) + $cd.getInt($j)));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqAdcScore = copy(first = f, second = s, third = t)
}

object PqAdcScore {
  val name = "graft_pq_adc_score"
  private val info = new ExpressionInfo(classOf[PqAdcScore].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$name takes (codes, table, joff)")
    PqAdcScore(children(0), children(1), children(2))
  }
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
