package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Fixed-point quantization of an embedding (`array<float>`/`array<double>`
  * → `array<int>`, element = floor(x · scale)) in one codegen'd pass.
  *
  * The built-in spelling — `transform(v, x -> floor(x * scale).cast(int))`
  * — runs the lambda INTERPRETED per element; this is the first thing
  * every similarity operator does to every vector, so at corpus scale the
  * lambda shows up as minutes of pure overhead. Same custom-Expression
  * bar as [[LongDotProduct]]: a hot inner loop the built-ins can't run
  * compiled.
  */
case class QuantizeVec(child: Expression, scale: Long) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${QuantizeVec.name} expects array<float>/array<double>, got ${other.simpleString}")
    }

  @transient private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Called from both interpreted eval and generated code. */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = math.floor(x * scale).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeVec", this, classOf[QuantizeVec].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.quantize($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {
  val name = "graft_quantize_vec"

  private val info = new ExpressionInfo(classOf[QuantizeVec].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 2, s"$name takes (vec, scale)")
    val scale = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(s"$name scale must be an integer literal, got $other")
    }
    QuantizeVec(children.head, scale)
  }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
