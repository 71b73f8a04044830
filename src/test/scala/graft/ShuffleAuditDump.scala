package graft

import graft.plans.ShuffleAudit

/** Dev tool: print each audited query's shuffle-volume line for
  * [[ShuffleVolumeSpec]]'s budget table — regenerate ONLY for a
  * deliberate volume change, in the same commit, with the reason in
  * the message (the GoldenPlanDump contract, for bytes). */
object ShuffleAuditDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    ShuffleVolumeSpec.audited.foreach { name =>
      val v = ShuffleAudit.audit(SparkEntry.queries(name)(spark, sfDir))
      println(f"""    "$name" -> (${v.totalBytes}L, ${v.maxAvgRowBytes}%.1f),""" +
        f" // ${v.exchanges.size} exchanges, ${v.totalRecords} records")
    }
    spark.stop()
  }
}
