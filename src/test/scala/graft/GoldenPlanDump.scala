package graft

/** Dev tool: regenerate the [[GoldenPlans.table]] literal after a
  * DELIBERATE plan change — `sbt "Test/runMain graft.GoldenPlanDump"`,
  * paste the output into GoldenPlans.scala, and explain the shape
  * change in the commit message. */
object GoldenPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = "/root/testdata/sf0.001"
    val out = GoldenPlans.pinned.map { name =>
      val (shuffles, broadcasts, joins) =
        GoldenPlans.shape(spark, name, sfDir)
      val joinsLit = joins.toSeq.sorted
        .map { case (k, v) => s""""$k" -> $v""" }.mkString(", ")
      s"""    "$name" -> ($shuffles, $broadcasts, Map[String, Int]($joinsLit)),"""
    }
    println(out.mkString("\n"))
    spark.stop()
  }
}
