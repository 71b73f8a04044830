package graft

/** Dev tool: band ONE query solo on a quiet host —
  * `sbt "Test/runMain graft.SoloBand <query> [runs] [sfDir]"`.
  * Prints warm-up + each timed run + the run-window steal/iowait
  * fractions, so a ">1.3x mover" flag can be separated into plan
  * drift (GoldenPlanSpec), real regression (band moves on quiet
  * host), or host noise (band flat, noisy window) with one command. */
object SoloBand {
  private def cpuStat(): (Long, Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val p = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      (p.take(8).sum, p(4), if (p.length > 7) p(7) else 0L)
    } finally src.close()
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-solo", 32)
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val (t0, io0, st0) = cpuStat()
    println(f"[solo] $name warmup: ${once()}%.3fs")
    val times = (1 to runs).map { i =>
      val t = once()
      println(f"[solo] $name run $i: $t%.3fs")
      t
    }
    val (t1, io1, st1) = cpuStat()
    val d = (t1 - t0).toDouble
    println(f"[solo] $name min=${times.min}%.3fs median=" +
      f"${times.sorted.apply(times.size / 2)}%.3fs " +
      f"iowait_frac=${(io1 - io0) / d}%.4f steal_frac=${(st1 - st0) / d}%.4f")
    spark.stop()
  }
}
