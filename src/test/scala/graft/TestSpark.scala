package graft

import graft.core.Engine
import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Engine conf, small core
  * count so the suite stays fast).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Engine.local(cores = 4, shufflePartitions = 4)
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
