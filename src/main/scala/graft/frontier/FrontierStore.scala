package graft.frontier

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-SEMANTICS snapshot store on plain Parquet (no Iceberg runtime jar
 * exists in this offline sandbox — verified /opt/spark/jars; SURVEY §7.1).
 * The layout keeps Iceberg's contract so `iceberg-spark-runtime` can slot in
 * unchanged later:
 *
 *   root/VERSION                  current snapshot id (atomic swap)
 *   root/snap-NNNNNN/manifest.json   step, now, per-partition lineage,
 *                                    per-project counters, totals
 *   root/snap-NNNNNN/frontier/    frontier table  (repartitioned by
 *                                 pmod(xxhash64(host), P) — salted host hash,
 *                                 stable across snapshots)
 *   root/snap-NNNNNN/budgets/     politeness token state
 *   root/snap-NNNNNN/results/     cumulative crawl results
 *
 * Writes go to `snap-NNNNNN.tmp/` then an atomic directory rename, then the
 * VERSION pointer is swapped via tmp+ATOMIC_MOVE — a reader never observes a
 * half-written snapshot, and a resumed run starts from exactly the state a
 * killed run last committed (resume contract, SURVEY §3.2).
 */
final class FrontierStore(rootDir: String, numPartitions: Int) {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  final case class Snapshot(id: Long, step: Int, now: Double,
      frontier: DataFrame, budgets: DataFrame, results: DataFrame)

  private def snapDir(id: Long): Path = root.resolve(f"snap-$id%06d")

  def currentId: Option[Long] = {
    val v = root.resolve("VERSION")
    if (Files.exists(v)) Some(Files.readString(v).trim.toLong) else None
  }

  /** Salted-host partitioning expression — frontier layout key (north_rule:
    * salted-hash partition by host to kill hot-domain skew; the salt is the
    * project so one hot host of one project spreads across project rows). */
  private def layout(df: DataFrame): DataFrame =
    df.repartition(numPartitions, pmod(xxhash64(col("host"), col("project")), lit(numPartitions)))

  def write(spark: SparkSession, step: Int, now: Double,
      frontier: DataFrame, budgets: DataFrame, results: DataFrame,
      counters: DataFrame): Long = {
    val id = currentId.getOrElse(0L) + 1
    val tmp = root.resolve(f"snap-$id%06d.tmp")
    deleteRecursively(tmp)

    val partitioned = layout(frontier).persist()
    partitioned.write.mode(SaveMode.Overwrite).parquet(tmp.resolve("frontier").toString)
    budgets.coalesce(math.max(1, numPartitions / 8))
      .write.mode(SaveMode.Overwrite).parquet(tmp.resolve("budgets").toString)
    results.write.mode(SaveMode.Overwrite).parquet(tmp.resolve("results").toString)

    // per-partition lineage: row count per physical partition of this snapshot
    val lineage = partitioned
      .groupBy(spark_partition_id().as("partition")).count()
      .orderBy("partition").collect()
      .map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
      .mkString("[", ",", "]")
    val perProject = counters.orderBy("project").collect().map { r =>
      val fields = r.schema.fieldNames.map { f =>
        val v = r.getAs[Any](f)
        val vs = v match { case s: String => "\"" + s + "\""; case other => String.valueOf(other) }
        s""""$f":$vs"""
      }.mkString(",")
      s"{$fields}"
    }.mkString("[", ",", "]")
    val total = partitioned.count()
    partitioned.unpersist()

    val manifest =
      s"""{"snapshot":$id,"step":$step,"now":$now,"frontier_rows":$total,
         |"partitions":$lineage,
         |"counters":$perProject}""".stripMargin
    Files.writeString(tmp.resolve("manifest.json"), manifest)

    val fin = snapDir(id)
    deleteRecursively(fin)
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    val vTmp = root.resolve("VERSION.tmp")
    Files.writeString(vTmp, id.toString)
    Files.move(vTmp, root.resolve("VERSION"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retain last 2 snapshots (time travel + cheap gc)
    (1L until id - 1).foreach(old => deleteRecursively(snapDir(old)))
    id
  }

  def read(spark: SparkSession): Option[Snapshot] = currentId.map { id =>
    val d = snapDir(id)
    val manifest = Files.readString(d.resolve("manifest.json"))
    val step = "\"step\":(\\d+)".r.findFirstMatchIn(manifest).map(_.group(1).toInt).getOrElse(0)
    val now = "\"now\":([0-9.E]+)".r.findFirstMatchIn(manifest).map(_.group(1).toDouble).getOrElse(0.0)
    Snapshot(id, step, now,
      spark.read.parquet(d.resolve("frontier").toString),
      spark.read.parquet(d.resolve("budgets").toString),
      spark.read.parquet(d.resolve("results").toString))
  }

  def manifestJson(id: Long): String = Files.readString(snapDir(id).resolve("manifest.json"))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
