package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** `graft_ivf_best_cell(v, cents, cns)` → int: index of the coarse cell
  * maximizing cosine with `v` (ties to the LOWEST index — scan order), where
  * `cents` is the flat concatenation of nCells centroid vectors in cell-id
  * order and `cns` their precomputed norms.
  *
  * Why a custom expression (the [[PqEncode]] bar): the declarative
  * assignment — broadcast-join every row against nCells centroids, then
  * `max_by` — streams n·nCells joined rows each dragging BOTH full vectors
  * through an ObjectHashAggregate; at 1M×64 cells that is 64M ~1 KB rows
  * (measured: 1352 s of the 1M IVF+PQ smoke's build). Here the centroid
  * block (nCells·dim longs — 512 KB at 64×64d·8B) rides one broadcast row
  * and assignment is ONE tight loop per corpus row: n rows, not n·nCells.
  *
  * Exactness contract: reproduces the joined `max_by(cell, struct(cos,
  * -cell))` bit for bit — dot products are exact longs; the vector norm is
  * `sqrt((double) Σx²)` (the same IEEE ops [[graft.operators.SimilarityOps]]
  * prep uses); comparisons use `Double.compare`, which orders NaN largest
  * exactly like Spark's struct ordering.
  */
case class IvfBestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with PqLayout {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = third.dataType match {
    case ArrayType(DoubleType, _)
        if intableArray(first.dataType) && intableArray(second.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${IvfBestCell.name} expects (array<int/bigint> vec, array<bigint> cents, " +
        s"array<double> cns), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  @transient private lazy val vIsInt = isIntArray(first.dataType)
  @transient private lazy val cIsInt = isIntArray(second.dataType)

  def compute(vA: ArrayData, cA: ArrayData, nA: ArrayData): Int = {
    val n = vA.numElements()
    val nc = nA.numElements()
    require(nc > 0 && cA.numElements() == n.toLong * nc,
      s"ivf_best_cell: flat centroid length ${cA.numElements()} != dim $n x $nc cells")
    var vv = 0L
    var i = 0
    while (i < n) {
      val x = if (vIsInt) vA.getInt(i).toLong else vA.getLong(i)
      vv += x * x
      i += 1
    }
    val nrm = math.sqrt(vv.toDouble)
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var g = 0
    while (g < nc) {
      var dot = 0L
      val cb = g * n
      i = 0
      while (i < n) {
        val x = if (vIsInt) vA.getInt(i).toLong else vA.getLong(i)
        val c = if (cIsInt) cA.getInt(cb + i).toLong else cA.getLong(cb + i)
        dot += x * c
        i += 1
      }
      val cos = dot.toDouble / (nrm * nA.getDouble(g))
      if (java.lang.Double.compare(cos, best) > 0) { best = cos; bestIdx = g }
      g += 1
    }
    bestIdx
  }

  override def nullSafeEval(v: Any, c: Any, cn: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      cn.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfBestCell", this, classOf[IvfBestCell].getName)
    nullSafeCodeGen(ctx, ev, (v, c, cn) => s"${ev.value} = $ref.compute($v, $c, $cn);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IvfBestCell = copy(first = f, second = s, third = t)
}

object IvfBestCell {
  val name = "graft_ivf_best_cell"
  private val info = new ExpressionInfo(classOf[IvfBestCell].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 3, s"$name takes (vec, cents, cns)")
    IvfBestCell(children(0), children(1), children(2))
  }
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
