package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contract's own invariants — drift here is silent and poisons the
  * correctness gate itself:
  *  - SparkEntry composes the seven contract objects with `Map ++`,
  *    which silently SHADOWS a duplicated query name (one of the two
  *    implementations would never run, while its oracle still matches
  *    the survivor's output by accident or fails mysteriously);
  *  - an oracle keyed to a name absent from `queries` would never be
  *    exercised at all;
  *  - a new query that forgets its oracle lands as a weak rows-only
  *    check without anyone deciding that — the rows-only set must stay
  *    exactly the DECLARED exclusions (SURVEY §5.1: approx sketches,
  *    seeded samples, engine-internal hashes, merge-order MG), each of
  *    which carries its own bounding scalatest instead.
  */
class ContractIntegritySpec extends AnyFunSuite {

  /** SURVEY §5.1's declared rows-only classes — the ONLY queries allowed
    * to ship without a DuckDB oracle.
    */
  private val declaredRowsOnly = Set(
    "e4_approx_distinct", "e4_sketch_merge", "e5_approx_percentiles",
    "g8_sample", "k8_stratified_sample", "h7_spark_hashes",
    "e13_heavy_hitters")

  test("no query name is shadowed by the Map ++ composition") {
    import graft.contract._
    val parts = Seq(
      "RelationalQueries" -> RelationalQueries.queries.keySet,
      "ScalarQueries" -> ScalarQueries.queries.keySet,
      "CdcQueries" -> CdcQueries.queries.keySet,
      "LlmQueries" -> LlmQueries.queries.keySet,
      "StreamingQueries" -> StreamingQueries.queries.keySet,
      "SourceSinkQueries" -> SourceSinkQueries.queries.keySet,
      "ExtraQueries" -> ExtraQueries.queries.keySet,
      "GauntletQueries" -> GauntletQueries.queries.keySet)
    val dupes = parts.combinations(2).flatMap { case Seq((an, a), (bn, b)) =>
      (a intersect b).map(n => s"$n (in both $an and $bn)")
    }.toSeq
    assert(dupes.isEmpty, s"shadowed query names:\n${dupes.mkString("\n")}")
    assert(parts.map(_._2.size).sum === SparkEntry.queries.size)
  }

  test("every oracle points at a real query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles keyed to no query (never exercised): ${orphans.mkString(", ")}")
  }

  test("the rows-only set is exactly the declared exclusions") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = rowsOnly -- declaredRowsOnly
    val stale = declaredRowsOnly -- rowsOnly
    assert(undeclared.isEmpty,
      s"queries silently landing rows-only (add an oracle or declare the " +
        s"exclusion in SURVEY §5.1 AND here): ${undeclared.mkString(", ")}")
    assert(stale.isEmpty,
      s"declared exclusions that now HAVE oracles (tighten the list): " +
        stale.mkString(", "))
  }
}
