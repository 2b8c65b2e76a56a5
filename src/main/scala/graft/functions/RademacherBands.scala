package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Random-hyperplane (sign-random-projection) LSH band keys for a quantized
  * embedding (`array<bigint>`), as one codegen'd pass.
  *
  * Bit j of the signature is `sign(<v, h_j>)` where `h_j` is a Rademacher
  * (±1) hyperplane derived deterministically from (seed, j, dim index) via a
  * splitmix64 mix — no stored model, identical on every executor and every
  * run. The `bands * rowsPerBand` bits are packed into `bands` long keys
  * (one per band), ready for `posexplode` → band-bucket joins.
  *
  * P[bit collision] for a pair at angle θ is 1 - θ/π (Charikar'02 SimHash
  * bound — the standard public construction), so banding with r rows gives
  * the usual (1-(1-p^r)^b) candidate-recall curve. Effective for HIGH
  * cosine thresholds (≥ ~0.8); at low thresholds the collision gap vs
  * unrelated pairs is too small for any banding to separate — use the
  * exact blocked path there.
  *
  * A custom Expression for the same reason as [[LongDotProduct]]: the
  * built-in alternative (explode × broadcast-joined hyperplane rows) blows
  * each vector up by bands*rows*dim rows, and higher-order-function lambdas
  * run interpreted. The hyperplane matrix is materialized once per
  * (executor, dim) and the inner loop is primitive long arithmetic.
  */
case class RademacherBands(child: Expression, bands: Int, rowsPerBand: Int,
    seed: Long) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${RademacherBands.name} expects array<int>/array<bigint>, got ${other.simpleString}")
    }

  @transient private lazy val elemIsInt = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
    case _ => false
  }

  // one ±1 matrix per vector dimensionality, built lazily per JVM
  @transient private lazy val planes =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Long]]]()

  private def planeFor(dim: Int): Array[Array[Long]] =
    planes.computeIfAbsent(dim, _ => {
      val nBits = bands * rowsPerBand
      Array.tabulate(nBits, dim) { (j, i) =>
        // splitmix64 finalizer over (seed, bit, dim index)
        var z = seed + j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if ((z & 1L) == 0L) 1L else -1L
      }
    })

  /** Called from both interpreted eval and generated code. */
  def computeBands(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val pl = planeFor(dim)
    val keys = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val h = pl(j * rowsPerBand + r)
        var acc = 0L
        var i = 0
        if (elemIsInt) while (i < dim) { acc += v.getInt(i) * h(i); i += 1 }
        else while (i < dim) { acc += v.getLong(i) * h(i); i += 1 }
        key = (key << 1) | (if (acc >= 0L) 1L else 0L)
        r += 1
      }
      keys(j) = key
      j += 1
    }
    new GenericArrayData(keys)
  }

  override def nullSafeEval(input: Any): Any =
    computeBands(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rademacherBands", this, classOf[RademacherBands].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.computeBands($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): RademacherBands =
    copy(child = newChild)
}

object RademacherBands {
  val name = "graft_rademacher_bands"

  private val info = new ExpressionInfo(classOf[RademacherBands].getName, name)
  private val builder = (children: Seq[Expression]) => {
    require(children.length == 4, s"$name takes (vec, bands, rowsPerBand, seed)")
    def lit(e: Expression): Long = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"$name parameters must be integer literals, got $other")
    }
    RademacherBands(children.head, lit(children(1)).toInt, lit(children(2)).toInt,
      lit(children(3)))
  }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(name), info, builder))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
