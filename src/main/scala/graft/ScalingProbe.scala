package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: measure N->4N thread scaling of the schedule+dedup job.
  * Run: sbt "runMain graft.ScalingProbe <n> <reps> [threadsCsv]" */
object ScalingProbe {
  def time[A](f: => A): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

  def measure(p: Int, n: Long, reps: Int): Double = {
    val s = Udfs.newSession(s"local[$p]", p, s"probe-$p")
    Bench.scheduleDedupJob(s, n / 8, n / 16) // warmup: JIT + codegen
    val best = (1 to reps).map { _ =>
      System.gc()
      time(Bench.scheduleDedupJob(s, n, n / 2))
    }.min
    s.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    System.gc()
    best
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 16000000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val threads = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq else Seq(8, 32)
    val times = threads.map(p => p -> measure(p, n, reps))
    times.foreach { case (p, t) =>
      println(f"PROBE threads=$p%-3d n=$n best=${t}%7.2fs rate=${n / t}%.0f urls/s")
    }
    if (times.size == 2) {
      val eff = (times.head._2 / times.last._2) / (times.last._1.toDouble / times.head._1)
      println(f"PROBE efficiency ${times.head._1}->${times.last._1}: ${eff}%.3f")
    }
  }
}
