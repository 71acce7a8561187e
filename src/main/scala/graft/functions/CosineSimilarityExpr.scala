package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over numeric arrays —
  * the §2-I4 extension point, escalated per SURVEY.md §7.5 on bench
  * evidence: the higher-order-function formulation
  * (`aggregate(zip_with(...))`) evaluates its lambdas interpreted, one
  * closure dispatch per element; this expression is a single fused loop
  * with full whole-stage codegen (`doGenCode`), ~an order of magnitude
  * less per-row overhead in brute-force KNN scans.
  *
  * Semantics match `VectorFunctions.cosineHof` bit-for-bit on equal-length
  * arrays: elements upcast to double, sequential left-to-right sums,
  * `null` for zero-norm inputs, and `null` when any element in the
  * compared prefix is null (the HOF's null-propagating arithmetic).
  * Mismatched lengths use the common prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float>/array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    // Every local goes through ctx.freshName: two instances of this
    // expression in one codegen scope (e.g. cosine(a,b) and cosine(b,a)
    // in the same projection) must not collide on Java local names —
    // a collision is a Janino failure and a silent interpreted fallback.
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi"); val denom = ctx.freshName("denom")
    val hasNull = ctx.freshName("hasNullElem")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |  double $xi = (double) $a.$xGet($i);
         |  double $yi = (double) $b.$yGet($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = Math.sqrt($nx) * Math.sqrt($ny);
         |if ($hasNull || $denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))
}
