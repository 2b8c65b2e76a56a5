package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native codegen'd integer dot product over two integral array columns
  * (`array<int>` or `array<bigint>` on either side; accumulation is long).
  *
  * The generic alternative — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * runs interpreted (higher-order lambdas are not whole-stage codegen'd)
  * and allocates an intermediate array per row; this expression compiles
  * to a tight primitive loop inside the stage. It is the hot inner loop of
  * every pairwise similarity operator (SimilarityOps), which is exactly
  * the "custom Expression only where built-ins can't express it fast
  * enough" bar (SURVEY §4.3). `array<int>` support exists because
  * fixed-point-quantized embeddings fit int32 — shipping vectors as ints
  * HALVES the verify-join shuffle volume, the dominant cost of the
  * pairwise operators.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  private def elemOk(t: DataType) = t match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_long expects integral arrays (array<int>/array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isInt(t: DataType) = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xi = isInt(left.dataType); val yi = isInt(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (xi) x.getInt(i).toLong else x.getLong(i)
      val yv = if (yi) y.getInt(i).toLong else y.getLong(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ax = if (isInt(left.dataType)) s"(long) $a.getInt($i)" else s"$a.getLong($i)"
      val bx = if (isInt(right.dataType)) s"(long) $b.getInt($i)" else s"$b.getLong($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $ax * $bx;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongDotProduct = copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  val name = "graft_dot_long"

  private val info = new ExpressionInfo(classOf[LongDotProduct].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, s"$name takes exactly 2 arguments")
    LongDotProduct(children.head, children(1))
  }

  /** Builder-time registration: `SparkSession.builder.withExtensions(...)`. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))

  /** Runtime registration for sessions we didn't build (driver-supplied). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

/** All graft session extensions in one injector:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    LongDotProduct.inject(ext)
    Md5Prefix60.inject(ext)
    RademacherBands.inject(ext)
    QuantizeVec.inject(ext)
    PqEncode.inject(ext)
    PqAdcTable.inject(ext)
    PqAdcScore.inject(ext)
    IvfBestCell.inject(ext)
    NfcNormalize.inject(ext)
  }
}
