package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the k-component MinHash signature over a
  * pre-hashed shingle array — the §2-I4 extension point escalated on the
  * same evidence trail as [[CosineSimilarity]] (SURVEY.md §7.5):
  *
  *  - the HOF formulation ([[TextFunctions.minhashSignatureFast]], kept as
  *    the differential-test witness) builds k nested array-transform
  *    lambdas, whose inlined codegen measured >1 MB / ~25 s of Janino
  *    compilation at k=16 (Dedup.scala round-1 note);
  *  - the explode → groupBy(k × min) formulation the pipeline used instead
  *    keeps codegen small but materializes ONE ROW PER SHINGLE through a
  *    hash aggregate — a per-gram explode plus a shuffle (map-side
  *    combined, but still an exchange) just to compute a per-document
  *    value.
  *
  * This expression is one tight fused loop per document — O(|hs| × k)
  * register arithmetic, no explode, no shuffle, whole-stage codegen — so
  * signature computation becomes a pure map over the cached projection.
  *
  * Semantics (bit-equal to the witness): component i = min over non-null
  * h of (h · a_i + b_i) mod P with the shared [[TextFunctions.minhashA]] /
  * [[TextFunctions.minhashB]] / [[TextFunctions.MinhashP]] constants.
  * Inputs are hashes in [0, P), so every product stays below 2^62 (exact
  * in 64-bit) and `%` equals `pmod`. An empty (or all-null) array yields
  * NULL — callers filter shingle-less docs, exactly as the explode form
  * dropped them.
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, s"k must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val aConsts: Array[Long] =
    Array.tabulate(k)(TextFunctions.minhashA)
  private lazy val bConsts: Array[Long] =
    Array.tabulate(k)(TextFunctions.minhashB)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          val v = (h * aConsts(i) + bConsts(i)) % TextFunctions.MinhashP
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aConsts, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bConsts, "long[]")
    val p = TextFunctions.MinhashP
    // fresh locals: two instances in one codegen scope must not collide
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val h = ctx.freshName("h")
    val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
    val seen = ctx.freshName("seen")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    $seen = true;
         |    long $h = $a.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ($h * $aRef[$i] + $bRef[$i]) % ${p}L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-level entry point. */
  def apply(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashes), k))
}
