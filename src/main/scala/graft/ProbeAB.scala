package graft

/**
 * Dev measurement tool for optimization rounds: interleaved same-session
 * A/B of the TEMPORARY `graft.ab` variant switch (see
 * [[graft.operators.AbFlag]]), plus per-run Spark JOB counts — the
 * honest statistic for driver-orchestration-bound queries whose final
 * physical plan is just a checkpoint scan.
 *
 * Methodology (r19, reproduced from OPTIMIZATION_r19.md): the sandbox
 * host shows ambient co-tenancy drift up to 2x between sessions with
 * /proc/stat steal ~ 0 throughout, so cross-session numbers are
 * ordering hints only; accepted changes need variants ALTERNATED
 * A,B,A,B within one JVM, min of >=3 runs per variant, 5% tie band.
 *
 * Usage: runMain graft.ProbeAB q_name [q_name ...]
 *   env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench; rounds via
 *   SPARK_GRAFT_PROBE_ROUNDS (default 3).
 */
object ProbeAB {

  private final class JobCounter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var verbose = false
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      if (verbose) {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
    }
    override def onJobEnd(
        je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      if (verbose) Option(starts.remove(je.jobId)).foreach {
        case (t0, site) =>
          log.add(f"    job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3fs  $site")
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeAB q_name [q_name ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    val spark = GraftSession.local("graft-probe", cpus)
    val byName = SparkEntry.queries
    val names = args.toSeq
    names.foreach(n => require(byName.contains(n), s"unknown query $n"))

    val counter = new JobCounter
    spark.sparkContext.addSparkListener(counter)

    // optional per-variant session-conf overrides (runtime-settable
    // SQLConf keys only), e.g. SPARK_GRAFT_PROBE_CONF_NEW=
    //   "spark.sql.adaptive.coalescePartitions.parallelismFirst=false"
    def confOf(envKey: String): Seq[(String, String)] =
      sys.env.getOrElse(envKey, "").split(',').toSeq
        .map(_.trim).filter(_.nonEmpty)
        .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val confNew = confOf("SPARK_GRAFT_PROBE_CONF_NEW")
    val confOld = confOf("SPARK_GRAFT_PROBE_CONF_OLD")
    def setVariant(v: String): Unit = {
      if (v == "old") System.setProperty("graft.ab", "old")
      else System.clearProperty("graft.ab")
      (if (v == "old") confOld else confNew)
        .foreach { case (k, value) => spark.conf.set(k, value) }
    }

    def run(n: String): (Double, Int) = {
      val j0 = counter.jobs.get()
      val t0 = System.nanoTime()
      byName(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, counter.jobs.get() - j0)
    }

    // warm-up both variants (codegen/JIT for both code paths)
    names.foreach { n =>
      Seq("old", "new").foreach { v => setVariant(v); run(n) }
    }
    val res = scala.collection.mutable.Map
      .empty[(String, String), Vector[(Double, Int)]]
    (1 to rounds).foreach { r =>
      names.foreach { n =>
        // alternate within the round so a drift window hits both sides
        Seq("old", "new", "new", "old").foreach { v =>
          setVariant(v)
          val t = run(n)
          res((n, v)) = res.getOrElse((n, v), Vector.empty) :+ t
        }
      }
      System.err.println(s"[probe] round $r done")
    }
    setVariant("new")
    // verbose per-job profile of one extra run per query (new variant):
    // the honest breakdown for driver-orchestration-bound queries
    if (sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1")) {
      names.foreach { n =>
        counter.verbose = true
        counter.log.clear()
        val (t, j) = run(n)
        counter.verbose = false
        Thread.sleep(200) // let listener drain
        println(f"  [jobs] $n: $t%.3fs, $j jobs")
        counter.log.forEach(l => println(l))
      }
    }
    println(f"${"query"}%-36s ${"old_min"}%8s ${"new_min"}%8s ${"delta"}%8s  jobs old->new")
    names.foreach { n =>
      val o = res((n, "old")); val w = res((n, "new"))
      val om = o.map(_._1).min; val nm = w.map(_._1).min
      val verdict =
        if (nm < om * 0.95) "WIN" else if (nm > om * 1.05) "LOSS" else "tie"
      println(f"$n%-36s $om%8.3f $nm%8.3f ${(nm - om) / om * 100}%7.1f%%  ${o.map(_._2).min}->${w.map(_._2).min}  $verdict")
    }
    spark.stop()
  }
}
