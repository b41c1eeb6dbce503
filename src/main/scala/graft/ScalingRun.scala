package graft

import org.apache.spark.sql.SparkSession

/** Single-configuration scaling measurement, meant to run in a FRESH JVM
  * (forked by Bench) so the two parallelism levels don't share heap/JIT
  * state. Prints "RATE <urls/sec>" on stdout.
  *
  * args: <threads> <nUrls> <reps>
  */
object ScalingRun {
  def main(args: Array[String]): Unit = {
    val p = args(0).toInt
    val n = args(1).toLong
    val reps = args(2).toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "1").toInt
    val s = Udfs.newSession(s"local[$p]", p * mult, s"graft-scaling-$p")
    s.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("SPARK_GRAFT_STAGE_DEBUG")) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          val m = si.taskMetrics
          System.err.println(f"STAGE ${si.stageId}%3d ${si.name.take(40)}%-40s wall=${ms}ms " +
            f"tasks=${si.numTasks} cpu=${m.executorCpuTime / 1000000}ms run=${m.executorRunTime}ms " +
            f"gc=${m.jvmGCTime}ms shW=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1048576}MB spill=${m.diskBytesSpilled / 1048576}MB")
        }
      })
    }
    Bench.scheduleDedupJob(s, n / 8, n / 16) // JIT + codegen warmup
    val best = (1 to reps).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      Bench.scheduleDedupJob(s, n, n / 2)
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"RATE ${n / best}%.0f")
    s.stop()
  }
}
