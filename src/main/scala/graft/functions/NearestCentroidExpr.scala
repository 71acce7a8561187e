package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the nearest-centroid argmin — the §2-I4
  * extension point, escalated per SURVEY.md §7.5 on the same evidence
  * trail as [[CosineSimilarity]] and `MinHashSignature`: the HOF
  * formulation (`transform(centroids, c => aggregate(zip_with(v, c, …)))`
  * + `array_position(array_min(…))`) allocates an intermediate distance
  * per centroid per row THROUGH interpreted lambdas and never enters
  * whole-stage codegen — and it sits in the one pass that runs
  * `lloydRounds + 1` times over the full corpus (IVF build, k-means
  * assignment). This expression is a single fused compiled loop: no
  * intermediate arrays, no closure dispatch, full `doGenCode`.
  *
  * Returns the 1-BASED index of the nearest centroid by squared L2
  * distance (a drop-in for `array_position(dists, array_min(dists))`, so
  * `element_at(ids, NearestCentroid(v, cents))` keeps working). Ties
  * break to the FIRST minimum, exactly like `array_position`.
  *
  * Arithmetic parity with the HOF witness, bit for bit:
  *  - both element types integral (long) → pure long math
  *    (`(a-b)*(a-b)` summed in long, Java wrap-around overflow included)
  *    — the fixed-point k-means contract;
  *  - otherwise → element-wise upcast to double, sequential
  *    left-to-right sum (float corpus vs double centroids in IVF).
  * A null element, a null centroid row, or a length-mismatched centroid
  * makes THAT centroid's distance undefined and skips it — mirroring
  * `zip_with`'s null padding propagating through `aggregate` and
  * `array_min` ignoring nulls. All centroids undefined (or none) → null.
  * A NaN distance (NaN vector or centroid element on the double path) is
  * ALSO skipped — `array_min` orders NaN greater than every value and
  * returns the finite minimum, so a `d < bestD` comparison chain that
  * let the first NaN win would diverge from the witness (r8 advice).
  * Sole remaining divergence: EVERY distance NaN → null here vs the
  * witness's NaN-equality quirk (array_position finds array_min's NaN)
  * returning position 1; all-NaN vectors are declared out of contract.
  */
case class NearestCentroid(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(t @ (FloatType | DoubleType | LongType | IntegerType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = elemType(left.dataType).isDefined
    val centsOk = right.dataType match {
      case ArrayType(inner, _) => elemType(inner).isDefined
      case _ => false
    }
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<numeric>, array<array<numeric>>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def vecElem: DataType = elemType(left.dataType).get
  private def centElem: DataType =
    elemType(right.dataType.asInstanceOf[ArrayType].elementType).get

  /** Long math iff BOTH sides are integral — the fixed-point contract. */
  private def longMath: Boolean =
    (vecElem == LongType || vecElem == IntegerType) &&
      (centElem == LongType || centElem == IntegerType)

  private def getLongAt(arr: ArrayData, i: Int, t: DataType): Long = t match {
    case LongType => arr.getLong(i)
    case IntegerType => arr.getInt(i).toLong
    case _ => throw new IllegalStateException(s"non-integral $t on long path")
  }

  private def getDoubleAt(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = -1
    if (longMath) {
      var bestD = 0L
      var j = 0
      while (j < cs.numElements()) {
        if (!cs.isNullAt(j)) {
          val c = cs.getArray(j)
          if (c.numElements() == n) {
            var d = 0L; var i = 0; var bad = false
            while (i < n && !bad) {
              if (v.isNullAt(i) || c.isNullAt(i)) bad = true
              else {
                val t = getLongAt(v, i, vecElem) - getLongAt(c, i, centElem)
                d += t * t; i += 1
              }
            }
            if (!bad && (best == -1 || d < bestD)) { best = j; bestD = d }
          }
        }
        j += 1
      }
    } else {
      var bestD = 0.0d
      var j = 0
      while (j < cs.numElements()) {
        if (!cs.isNullAt(j)) {
          val c = cs.getArray(j)
          if (c.numElements() == n) {
            var d = 0.0d; var i = 0; var bad = false
            while (i < n && !bad) {
              if (v.isNullAt(i) || c.isNullAt(i)) bad = true
              else {
                val t = getDoubleAt(v, i, vecElem) - getDoubleAt(c, i, centElem)
                d += t * t; i += 1
              }
            }
            // NaN skipped like an undefined centroid (array_min parity)
            if (!bad && !java.lang.Double.isNaN(d) && (best == -1 || d < bestD)) {
              best = j; bestD = d
            }
          }
        }
        j += 1
      }
    }
    if (best == -1) null else java.lang.Integer.valueOf(best + 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case LongType => "getLong"
      case IntegerType => "getInt"
    }
    val (numT, zero) = if (longMath) ("long", "0L") else ("double", "0.0")
    val vGet = getter(vecElem); val cGet = getter(centElem)
    val arrCls = classOf[ArrayData].getName
    // fresh names: two instances in one codegen scope must not collide
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val m = ctx.freshName("m")
    val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
    val d = ctx.freshName("d"); val t = ctx.freshName("t")
    val bad = ctx.freshName("bad"); val c = ctx.freshName("c")
    // long math cannot produce NaN; emit the parity guard only for doubles
    val nanGuard = if (longMath) "" else s" && !Double.isNaN($d)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $best = -1;
         |$numT $bestD = $zero;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($b.isNullAt($j)) continue;
         |  $arrCls $c = $b.getArray($j);
         |  if ($c.numElements() != $n) continue;
         |  $numT $d = $zero;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $c.isNullAt($i)) { $bad = true; break; }
         |    $numT $t = ($numT) $a.$vGet($i) - ($numT) $c.$cGet($i);
         |    $d += $t * $t;
         |  }
         |  if (!$bad$nanGuard && ($best == -1 || $d < $bestD)) { $best = $j; $bestD = $d; }
         |}
         |if ($best == -1) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $best + 1;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** Column-level entry point: 1-based argmin index of squared-L2
    * distance from `vec` to each row of `centroids`.
    */
  def apply(vec: Column, centroids: Column): Column =
    GraftBridge.column(
      NearestCentroid(GraftBridge.expression(vec), GraftBridge.expression(centroids)))
}

/** [[NearestCentroid]]'s sibling: the min squared-L2 DISTANCE itself (a
  * double) instead of the argmin index — the per-subspace quantization
  * error of PQ drift tracking. Escalated round 12 on the same §7.5
  * evidence: the HOF witness
  * (`array_min(transform(cents, c => aggregate(zip_with(v, c, …))))`)
  * runs through interpreted lambdas, and it sits in the encode-time
  * drift pass over the full corpus — measured as the dominant cost of
  * `k4_ivf_pq_encode` (the r11 2× regression). Same loop, same
  * null/length/NaN-skip semantics, always double arithmetic (the
  * witness's `cast("double")` path); no defined centroid → null.
  * Same declared witness divergence as [[NearestCentroid]]: EVERY
  * distance NaN (a NaN-bearing vector) → null here where the HOF's
  * `array_min` would return NaN — all-NaN vectors are out of contract,
  * and aggregates over the drift column treat both as absent.
  */
case class MinCentroidDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(t @ (FloatType | DoubleType | LongType | IntegerType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = elemType(left.dataType).isDefined
    val centsOk = right.dataType match {
      case ArrayType(inner, _) => elemType(inner).isDefined
      case _ => false
    }
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_centroid_distance expects (array<numeric>, array<array<numeric>>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def vecElem: DataType = elemType(left.dataType).get
  private def centElem: DataType =
    elemType(right.dataType.asInstanceOf[ArrayType].elementType).get

  private def getDoubleAt(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    var found = false
    var bestD = 0.0d
    var j = 0
    while (j < cs.numElements()) {
      if (!cs.isNullAt(j)) {
        val c = cs.getArray(j)
        if (c.numElements() == n) {
          var d = 0.0d; var i = 0; var bad = false
          while (i < n && !bad) {
            if (v.isNullAt(i) || c.isNullAt(i)) bad = true
            else {
              val t = getDoubleAt(v, i, vecElem) - getDoubleAt(c, i, centElem)
              d += t * t; i += 1
            }
          }
          if (!bad && !java.lang.Double.isNaN(d) && (!found || d < bestD)) {
            found = true; bestD = d
          }
        }
      }
      j += 1
    }
    if (!found) null else java.lang.Double.valueOf(bestD)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case LongType => "getLong"
      case IntegerType => "getInt"
    }
    val vGet = getter(vecElem); val cGet = getter(centElem)
    val arrCls = classOf[ArrayData].getName
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val j = ctx.freshName("j"); val m = ctx.freshName("m")
    val found = ctx.freshName("found"); val bestD = ctx.freshName("bestD")
    val d = ctx.freshName("d"); val t = ctx.freshName("t")
    val bad = ctx.freshName("bad"); val c = ctx.freshName("c")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |boolean $found = false;
         |double $bestD = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($b.isNullAt($j)) continue;
         |  $arrCls $c = $b.getArray($j);
         |  if ($c.numElements() != $n) continue;
         |  double $d = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $c.isNullAt($i)) { $bad = true; break; }
         |    double $t = (double) $a.$vGet($i) - (double) $c.$cGet($i);
         |    $d += $t * $t;
         |  }
         |  if (!$bad && !Double.isNaN($d) && (!$found || $d < $bestD)) {
         |    $found = true; $bestD = $d;
         |  }
         |}
         |if (!$found) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $bestD;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinCentroidDistance =
    copy(left = newLeft, right = newRight)
}

object MinCentroidDistance {
  /** Column-level entry point: min squared-L2 distance from `vec` to the
    * rows of `centroids` (double; null when no centroid is defined).
    */
  def apply(vec: Column, centroids: Column): Column =
    GraftBridge.column(
      MinCentroidDistance(GraftBridge.expression(vec), GraftBridge.expression(centroids)))
}
