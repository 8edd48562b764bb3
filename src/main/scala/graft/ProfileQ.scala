package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement tool (guide §1): splits a query's wall-clock into
  * CONSTRUCTION (the `fn(spark, dir)` call — blocking Materialize jobs
  * land here), PLANNING (analysis + optimization + physical planning of
  * the final frame) and EXECUTION (the `count()` action), and prints
  * every Spark job observed with its duration and description — the
  * local-mode substitute for the UI's job timeline. Not part of the
  * bench contract; bench methodology is untouched.
  *
  *   sbt "runMain graft.ProfileQ q1,q2,..."   (SPARK_GRAFT_SF_DIR honored)
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    @volatile var collect = false
    val sb = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val desc = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(s.jobId, (s.time, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collect) {
        Option(jobs.get(e.jobId)).foreach { case (t0, desc) =>
          sb.synchronized {
            sb.append(f"    job ${e.jobId}%4d ${(e.time - t0) / 1e3}%7.3f s  $desc%n")
          }
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collect) {
          val si = e.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield (a - b) / 1e3).getOrElse(-1.0)
          val cpu = si.taskMetrics.executorRunTime / 1e3
          sb.synchronized {
            sb.append(f"      stage ${si.stageId}%4d wall=$wall%7.3f s cpu=$cpu%8.3f s tasks=${si.numTasks}%4d  ${si.name.take(90)}%n")
          }
        }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warm: sf0.001 then full-size once (codegen + page cache)
      fn(spark, "/root/testdata/sf0.001").count()
      fn(spark, dir).count()
      sb.clear(); collect = true
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      collect = false
      Thread.sleep(200) // let listener drain
      println(f"PROFILE $name total=${(t3 - t0) / 1e9}%.3f construct=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      print(sb.toString)
    }
    spark.stop()
  }
}
