package graft.core

import graft.functions.{CosineSimilarity, MinHashSignature, NearestCentroid}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SURVEY §2-I4's second half: the engine's native Catalyst expressions
  * surfaced to SQL callers through `SparkSessionExtensions` — the public,
  * supported injection point (enable with
  * `spark.sql.extensions=graft.core.GraftExtensions`, or
  * `builder.withExtensions(new GraftExtensions)`).
  *
  * Injection happens per-session at build time, so a cluster-wide conf line
  * gives every SQL/JDBC/notebook user `cosine_similarity(a, b)` with the
  * fused codegen loop — no Scala import, no UDF registration, full
  * whole-stage codegen at 100 TB scan width.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  /** The injectable function table (shared by the extension class and
    * [[Engine.registerFunctions]] for sessions that already exist).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(arrayA, arrayB) takes 2 arguments")
        CosineSimilarity(args.head, args(1))
      }),
    (new FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "nearest_centroid(vector, centroids) takes 2 arguments")
        NearestCentroid(args.head, args(1))
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(hashes, k) takes 2 arguments")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature k must be an INT literal, got ${other.sql}")
        }
        MinHashSignature(args.head, k)
      }))
}
