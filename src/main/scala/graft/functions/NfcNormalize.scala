package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (JDK `java.text.Normalizer` — no
  * dependency): composes decomposed sequences ("e" + COMBINING ACUTE →
  * "é") so byte-level operators downstream — fingerprints, shingles,
  * line dedup — treat canonically-equal text as equal. Web crawls mix
  * NFC and NFD freely (macOS filenames, some CMSes emit NFD), and a
  * corpus-wide dedup that misses the composed/decomposed split silently
  * keeps both copies.
  *
  * The common case (already-NFC ASCII-heavy text) takes the
  * `isNormalized` fast path and returns the INPUT buffer unchanged — no
  * allocation, no copy; only genuinely denormalized strings pay the
  * round-trip through `String`. A Spark UDF doing the same would break
  * whole-stage codegen for every downstream expression in the stage;
  * this stays inside the generated code (SURVEY §4.3's custom-Expression
  * bar).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${NfcNormalize.name} expects a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val name = "graft_nfc"

  /** Static kernel shared by eval and codegen. Pure-ASCII (the bulk of a
    * web corpus) is NFC by definition and short-circuits without even the
    * String round-trip; already-normalized non-ASCII pays one `toString`
    * + `isNormalized` scan and returns the input buffer unchanged.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val info = new ExpressionInfo(classOf[NfcNormalize].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 1, s"$name takes exactly 1 argument")
    NfcNormalize(children.head)
  }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
