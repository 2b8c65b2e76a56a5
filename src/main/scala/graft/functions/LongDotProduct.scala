package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The generic alternative — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * runs interpreted (higher-order lambdas are not whole-stage codegen'd)
  * and allocates an intermediate array per row; this expression compiles
  * to a tight primitive loop inside the stage. It is the hot inner loop of
  * every pairwise similarity operator (SimilarityOps), which is exactly
  * the "custom Expression only where built-ins can't express it fast
  * enough" bar (SURVEY §4.3).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_long expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
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
  }
}
