package graft.frontier

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/**
 * Iceberg-SEMANTICS snapshot store on plain Parquet (no Iceberg runtime jar
 * exists in this offline sandbox — verified /opt/spark/jars; SURVEY §7.1).
 * The layout keeps Iceberg's contract (snapshots + manifests + per-partition
 * lineage, atomic pointer swap) so `iceberg-spark-runtime` can slot in later.
 *
 * Round-2 storage model: COPY-ON-WRITE OF TOUCHED BUCKETS ONLY. Round 1
 * rewrote the whole frontier every superstep — O(frontier) I/O per step
 * regardless of batch size, the 100 TB scale-killer. Now:
 *
 *   root/VERSION                     current snapshot id (atomic swap)
 *   root/snap-N/manifest.json        step, now, per-bucket OWNER lineage
 *                                    (which snapshot last wrote each bucket),
 *                                    per-bucket row counts, counters
 *   root/snap-N/frontier/bucket=B/   ONLY the buckets this step touched;
 *                                    untouched buckets resolve through the
 *                                    owner lineage to older snapshots
 *   root/snap-N/seen-delta/bucket=B/ key-only (project, url_hash, skey)
 *                                    APPEND deltas of newly-seen URLs,
 *                                    bucketed by pmod(xxhash64(project,
 *                                    url_hash), seenBuckets)
 *   root/snap-N/blooms/B.bloom       full Bloom per touched seen-bucket
 *                                    (old bloom + this step's keys); the
 *                                    partition-local probe (SeenFilter)
 *   root/snap-N/budgets/, results-delta/
 *
 * A write is O(touched buckets + step size), not O(frontier). Every
 * `compactEvery` snapshots a FULL rewrite (compaction) re-bases the lineage
 * so the chain stays bounded, and older snapshots are garbage-collected.
 * Writes stage into `snap-N.tmp/` and commit via atomic directory rename +
 * VERSION pointer swap — a reader never observes a half-written snapshot
 * (resume contract, SURVEY §3.2).
 *
 * The frontier buckets by pmod(xxhash64(host, project), P) — the salted
 * host-hash politeness layout (north_rule) — while the seen index buckets
 * by the dedup key: two independent physical layouts for two access paths.
 */
final class FrontierStore(rootDir: String, numPartitions: Int,
    val seenBuckets: Int = 64,
    bloomItemsPerBucket: Long = 1L << 22,
    bloomFpp: Double = 0.01,
    compactEvery: Int = 32) {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  final case class Snapshot(id: Long, step: Int, now: Double,
      frontier: DataFrame, budgets: DataFrame, results: DataFrame)

  private def snapDir(id: Long): Path = root.resolve(f"snap-$id%06d")

  def currentId: Option[Long] = {
    val v = root.resolve("VERSION")
    if (Files.exists(v)) Some(Files.readString(v).trim.toLong) else None
  }

  /** Frontier bucket — salted host-hash layout (north_rule): a hot host of
    * one project spreads across projects, and the politeness agg and ranked
    * selection see co-located (project, host) groups. */
  def frontierBucket = pmod(xxhash64(col("host"), col("project")), lit(numPartitions)).cast("int")
  private def seenBucket(skey: org.apache.spark.sql.Column) =
    pmod(skey, lit(seenBuckets)).cast("int")

  // ---------------- manifest ----------------

  private final case class Manifest(id: Long, step: Int, now: Double, base: Long,
      frontierOwner: Array[Long], rowsPerBucket: Array[Long],
      seenOwner: Array[Long], resultSnaps: Seq[Long],
      seenChain: Seq[(Long, Set[Int])])

  private def field(m: String, key: String): Option[String] =
    (s""""$key":"([^"]*)"""".r.findFirstMatchIn(m).map(_.group(1)))
      .orElse(s""""$key":([-0-9.E]+)""".r.findFirstMatchIn(m).map(_.group(1)))

  private def longs(s: String): Array[Long] =
    if (s.isEmpty) Array.empty else s.split(",").map(_.toLong)

  private def parseManifest(id: Long): Manifest = {
    val m = Files.readString(snapDir(id).resolve("manifest.json"))
    val chain = field(m, "seen_chain").get match {
      case "" => Seq.empty[(Long, Set[Int])]
      case s => s.split(";").toSeq.map { e =>
        val Array(snap, bs) = e.split(":", 2)
        (snap.toLong, if (bs.isEmpty) Set.empty[Int] else bs.split("\\|").map(_.toInt).toSet)
      }
    }
    Manifest(id,
      field(m, "step").get.toInt, field(m, "now").get.toDouble,
      field(m, "base").get.toLong,
      longs(field(m, "frontier_owner").get), longs(field(m, "rows_per_bucket").get),
      longs(field(m, "seen_owner").get), longs(field(m, "results_snaps").get).toSeq,
      chain)
  }

  // ---------------- read ----------------

  private def frontierView(spark: SparkSession, mf: Manifest): DataFrame = {
    val paths = mf.frontierOwner.zipWithIndex.collect {
      case (owner, b) if owner != 0L => snapDir(owner).resolve(s"frontier/bucket=$b").toString
    }
    if (paths.isEmpty) emptyFrontier(spark) else spark.read.parquet(paths.toIndexedSeq: _*)
  }

  private def resultsView(spark: SparkSession, mf: Manifest): DataFrame = {
    val paths = mf.resultSnaps.map(s => snapDir(s).resolve("results-delta").toString)
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.sched.Crawler.resultSchema)
    else spark.read.parquet(paths: _*)
  }

  private def emptyFrontier(spark: SparkSession): DataFrame =
    graft.sched.Crawler.seedFrontier(spark, Seq.empty, 0.0)

  def read(spark: SparkSession): Option[Snapshot] = currentId.map { id =>
    val mf = parseManifest(id)
    Snapshot(id, mf.step, mf.now, frontierView(spark, mf),
      spark.read.parquet(snapDir(id).resolve("budgets").toString),
      resultsView(spark, mf))
  }

  /** The distributed URL-seen probe for the current snapshot (None before
    * the first write). */
  def seenFilter(spark: SparkSession): Option[SeenFilter] = currentId.map { id =>
    val mf = parseManifest(id)
    SeenFilter(seenBuckets, rootDir, mf.seenOwner, mf.seenChain)
  }

  // ---------------- write ----------------

  /**
   * Commit one superstep as a new snapshot: copy-on-write of the frontier
   * buckets touched by `upserts`, append-only seen-key + results deltas,
   * bloom refresh for touched seen-buckets. O(touched + step), never
   * O(frontier) — except on compaction snapshots.
   *
   * @param upserts   full frontier rows to insert-or-replace (frontierCols)
   * @param freshKeys (project, url_hash) subset of upserts that are NEW —
   *                  these enter the seen index
   */
  def writeIncremental(spark: SparkSession, step: Int, now: Double,
      upserts: DataFrame, freshKeys: DataFrame,
      budgets: DataFrame, newResults: DataFrame, counters: DataFrame): Long = {
    val prevId = currentId.getOrElse(0L)
    val prev = if (prevId == 0) None else Some(parseManifest(prevId))
    val id = prevId + 1
    val full = prev.isEmpty || (id - prev.get.base) >= compactEvery
    val tmp = root.resolve(f"snap-$id%06d.tmp")
    deleteRecursively(tmp)
    Files.createDirectories(tmp)

    val keyCols = Seq("project", "url_hash")
    val up = upserts.withColumn("bucket", frontierBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- frontier COW
    val touched: Array[Int] =
      if (full) (0 until numPartitions).toArray
      else up.select("bucket").distinct().collect().map(_.getInt(0)).sorted
    val oldTouched = prev match {
      case None => None
      case Some(mf) =>
        val paths = touched.collect {
          case b if mf.frontierOwner(b) != 0L =>
            snapDir(mf.frontierOwner(b)).resolve(s"frontier/bucket=$b").toString
        }
        if (paths.isEmpty) None else Some(spark.read.parquet(paths.toIndexedSeq: _*))
    }
    val mergedTouched = oldTouched match {
      case None => up
      case Some(old) =>
        old.join(up.select(keyCols.map(col): _*), keyCols, "left_anti")
          .withColumn("bucket", frontierBucket)
          .unionByName(up)
    }
    mergedTouched.write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(tmp.resolve("frontier").toString)

    // per-bucket lineage: owner + row count, carried forward for untouched
    val writtenCounts = spark.read.parquet(tmp.resolve("frontier").toString)
      .groupBy("bucket").count().collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count")).toMap
    val frontierOwner = Array.tabulate(numPartitions) { b =>
      if (writtenCounts.contains(b)) id
      else prev.map(_.frontierOwner(b)).getOrElse(0L)
    }
    val rowsPerBucket = Array.tabulate(numPartitions) { b =>
      if (writtenCounts.contains(b)) writtenCounts(b)
      else if (touched.contains(b)) 0L // touched but now empty (possible on full)
      else prev.map(_.rowsPerBucket(b)).getOrElse(0L)
    }

    // ---- seen index: delta + bloom refresh (append-only; compaction
    // rewrites the full key set so the chain re-bases)
    val seenSrc =
      if (full && prev.nonEmpty)
        prev.map(mf => SeenFilter(seenBuckets, rootDir, mf.seenOwner, mf.seenChain)
          .keysFor(spark, 0 until seenBuckets)).get
          .unionByName(freshKeys.select("project", "url_hash"))
      else freshKeys.select("project", "url_hash")
    val seenKeyed = seenSrc
      .withColumn("skey", xxhash64(col("project"), col("url_hash")))
      .withColumn("bucket", seenBucket(col("skey")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seenTouched: Array[Int] =
      seenKeyed.select("bucket").distinct().collect().map(_.getInt(0)).sorted
    if (seenTouched.nonEmpty) {
      seenKeyed.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(tmp.resolve("seen-delta").toString)
      // bloom refresh: executors write side-files into the staged snapshot
      // (shared FS — same contract as any shuffle/output commit); file names
      // are deterministic so task retries overwrite identically
      Files.createDirectories(tmp.resolve("blooms"))
      val prevOwner = prev.map(_.seenOwner).getOrElse(Array.fill(seenBuckets)(0L))
      val rootStr = rootDir; val tmpStr = tmp.toString
      val items = bloomItemsPerBucket; val fpp = bloomFpp
      val mergeOld = !full // full rewrite rebuilds blooms from scratch
      seenKeyed.select(col("bucket"), col("skey")).as[(Int, Long)](
          org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaInt,
            org.apache.spark.sql.Encoders.scalaLong))
        .repartition(math.max(1, seenTouched.length), col("bucket"))
        .foreachPartition { (it: Iterator[(Int, Long)]) =>
          val byBucket = scala.collection.mutable.HashMap
            .empty[Int, org.apache.spark.util.sketch.BloomFilter]
          it.foreach { case (b, k) =>
            val bloom = byBucket.getOrElseUpdate(b, {
              if (mergeOld && prevOwner(b) != 0L) {
                val in = Files.newInputStream(
                  Paths.get(SeenFilter.bloomPath(rootStr, prevOwner(b), b)))
                try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
              } else org.apache.spark.util.sketch.BloomFilter.create(items, fpp)
            })
            bloom.putLong(k)
          }
          byBucket.foreach { case (b, bloom) =>
            val out = Files.newOutputStream(Paths.get(s"$tmpStr/blooms/$b.bloom"))
            try bloom.writeTo(out) finally out.close()
          }
        }
    }
    val seenOwner = Array.tabulate(seenBuckets) { b =>
      if (seenTouched.contains(b)) id
      else if (full) 0L
      else prev.map(_.seenOwner(b)).getOrElse(0L)
    }
    val seenChain =
      if (full) Seq(id -> seenTouched.toSet)
      else prev.map(_.seenChain).getOrElse(Seq.empty) ++
        (if (seenTouched.nonEmpty) Seq(id -> seenTouched.toSet) else Seq.empty)
    seenKeyed.unpersist(false)

    // ---- budgets (small, full write) + results (append-only delta)
    budgets.coalesce(math.max(1, numPartitions / 8))
      .write.mode(SaveMode.Overwrite).parquet(tmp.resolve("budgets").toString)
    val resultsSrc =
      if (full && prev.nonEmpty)
        resultsView(spark, prev.get).unionByName(newResults)
      else newResults
    val hasResults = !resultsSrc.isEmpty
    if (hasResults)
      resultsSrc.write.mode(SaveMode.Overwrite).parquet(tmp.resolve("results-delta").toString)
    val resultSnaps =
      if (full) (if (hasResults) Seq(id) else Seq.empty)
      else prev.map(_.resultSnaps).getOrElse(Seq.empty) ++
        (if (hasResults) Seq(id) else Seq.empty)

    // ---- manifest + atomic commit
    val perProject = counters.orderBy("project").collect().map { r =>
      val fields = r.schema.fieldNames.map { f =>
        val v = r.getAs[Any](f)
        val vs = v match { case s: String => "\"" + s + "\""; case other => String.valueOf(other) }
        s""""$f":$vs"""
      }.mkString(",")
      s"{$fields}"
    }.mkString("[", ",", "]")
    val total = rowsPerBucket.sum
    val lineageJson = touched
      .map(b => s"""{"partition":$b,"rows":${rowsPerBucket(b)},"owner":$id}""")
      .mkString("[", ",", "]")
    val base = if (full) id else prev.get.base
    val manifest =
      s"""{"snapshot":$id,"step":$step,"now":$now,"base":$base,"full":$full,
         |"num_partitions":$numPartitions,"seen_buckets":$seenBuckets,
         |"frontier_rows":$total,
         |"frontier_owner":"${frontierOwner.mkString(",")}",
         |"rows_per_bucket":"${rowsPerBucket.mkString(",")}",
         |"seen_owner":"${seenOwner.mkString(",")}",
         |"seen_chain":"${seenChain.map { case (s, bs) => s"$s:${bs.toSeq.sorted.mkString("|")}" }.mkString(";")}",
         |"results_snaps":"${resultSnaps.mkString(",")}",
         |"touched_partitions":$lineageJson,
         |"counters":$perProject}""".stripMargin
    Files.writeString(tmp.resolve("manifest.json"), manifest)
    up.unpersist(false)

    val fin = snapDir(id)
    deleteRecursively(fin)
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    val vTmp = root.resolve("VERSION.tmp")
    Files.writeString(vTmp, id.toString)
    Files.move(vTmp, root.resolve("VERSION"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // gc: after a compaction nothing references snapshots older than base
    if (full) (1L until id).foreach(old => deleteRecursively(snapDir(old)))
    id
  }

  def manifestJson(id: Long): String = Files.readString(snapDir(id).resolve("manifest.json"))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
