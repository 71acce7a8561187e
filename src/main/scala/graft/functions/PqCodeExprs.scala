package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Byte-pack PQ codeword ids: `array<int>` of 1-based ids (each ≤ 256 —
  * the `k ≤ 256` regime every production PQ deployment runs) → a
  * BinaryType value of m bytes, byte `i` = `code(i) - 1`. This is the
  * storage half of the r10 verdict's "codes are array<int>, not
  * byte-packed" finding: an m=8 int-array row carried ~32 B + Spark array
  * header vs the 8 B the PQ scaladoc's 32× compression arithmetic
  * assumes; packed, the shipped bytes ARE the claimed bytes.
  *
  * Null array → null; a null element or an id outside 1..256 → null
  * (defensive — [[NearestCentroid]] can only produce nulls, never
  * out-of-range ids, and a null code row is dropped by the ADC join
  * rather than silently mis-scored).
  */
case class PackCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_codes expects array<int>, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val c = arr.getInt(i)
      if (c < 1 || c > 256) return null
      out(i) = (c - 1).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val c = ctx.freshName("c"); val out = ctx.freshName("out")
    val ok = ctx.freshName("ok")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |boolean $ok = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $ok = false; break; }
         |  int $c = $a.getInt($i);
         |  if ($c < 1 || $c > 256) { $ok = false; break; }
         |  $out[$i] = (byte) ($c - 1);
         |}
         |if ($ok) {
         |  ${ev.value} = $out;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PackCodes =
    copy(child = newChild)
}

object PackCodes {
  def apply(codes: Column): Column =
    GraftBridge.column(PackCodes(GraftBridge.expression(codes)))
}

/** ADC (asymmetric-distance) scoring over byte-packed PQ codes: given a
  * row's m-byte code and the query's flat m×k distance table (`k`
  * derived as `table.length / m` — the table is built per query from the
  * same model that produced the codes), returns
  * `Σ_{mi} table[mi·k + byte(mi)]` summed left-to-right in double — the
  * same sequential order the previous `aggregate`-HOF formulation used,
  * so scores are bit-identical.
  *
  * This is the hot expression of every compressed-domain scan (pqKnn,
  * ivfPqKnn shortlists): a fused codegen loop of m array reads replaces
  * an interpreted `aggregate(sequence(...))` chain that allocated a
  * sequence array per row and dispatched two lambdas per subspace.
  *
  * Null code or table → null; a table not divisible by m or a byte
  * addressing past it → null (a mismatched model — the callers' liveness
  * guards refuse those states loudly before any scan).
  */
case class AdcDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_distance expects (binary, array<double>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val tab = b.asInstanceOf[ArrayData]
    val m = code.length
    if (m == 0 || tab.numElements() % m != 0) return null
    val k = tab.numElements() / m
    var d = 0.0d
    var mi = 0
    while (mi < m) {
      val ki = code(mi) & 0xff
      if (ki >= k || tab.isNullAt(mi * k + ki)) return null
      d += tab.getDouble(mi * k + ki)
      mi += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.freshName("m"); val k = ctx.freshName("k")
    val mi = ctx.freshName("mi"); val ki = ctx.freshName("ki")
    val d = ctx.freshName("d"); val ok = ctx.freshName("ok")
    val idx = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $m = $a.length;
         |boolean $ok = $m > 0 && $b.numElements() % $m == 0;
         |double $d = 0.0;
         |if ($ok) {
         |  int $k = $b.numElements() / $m;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    int $ki = $a[$mi] & 0xff;
         |    int $idx = $mi * $k + $ki;
         |    if ($ki >= $k || $b.isNullAt($idx)) { $ok = false; break; }
         |    $d += $b.getDouble($idx);
         |  }
         |}
         |if ($ok) {
         |  ${ev.value} = $d;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  def apply(code: Column, table: Column): Column =
    GraftBridge.column(
      AdcDistance(GraftBridge.expression(code), GraftBridge.expression(table)))
}
