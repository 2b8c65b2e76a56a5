package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** First 60 bits of md5(string) as a bigint — numerically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (the cross-engine-reproducible
  * base hash used by MinHash), but computed straight from the digest bytes:
  * no 32-char hex string materialization, no string→BigInteger parse. This
  * is the per-shingle inner loop of signature computation.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  val name = "graft_md5_prefix60"

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** (first 8 digest bytes as unsigned big-endian) >>> 4 == value of the
    * first 15 hex chars — 60 bits, always non-negative.
    */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private val info = new ExpressionInfo(classOf[Md5Prefix60].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 1, s"$name takes exactly 1 argument")
    Md5Prefix60(children.head)
  }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
