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
    compactEvery: Int = 32,
    /** At compaction, drop all rows (and seen keys) of projects whose
      * ACTIVE set has drained to zero — the reference deletes a FINISHED
      * project's taskdb (scheduler.py:348-374 delete_project); without this
      * dead projects accumulate in the frontier forever at 100x scale. */
    dropDrainedOnCompact: Boolean = true) extends SnapshotStore {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

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
      seenChain: Seq[(Long, Set[Int])],
      /** cumulative seen-key count per seen-bucket — drives bloom re-sizing */
      seenRows: Array[Long],
      /** current bloom capacity (expectedNumItems) per seen-bucket */
      seenCap: Array[Long],
      /** cumulative per-project counter totals across all steps (reference
        * reloads counters on restart: scheduler.py:135-137) */
      counterTotals: Map[String, Map[String, Long]])

  private def field(m: String, key: String): Option[String] =
    (s""""$key":"([^"]*)"""".r.findFirstMatchIn(m).map(_.group(1)))
      .orElse(s""""$key":([-0-9.E]+)""".r.findFirstMatchIn(m).map(_.group(1)))

  private def req(m: String, key: String, id: Long): String =
    field(m, key).getOrElse(throw new IllegalStateException(
      s"frontier-store manifest for snapshot $id is missing field '$key' — " +
        s"incompatible or corrupt store at $rootDir (expected format ${FrontierStore.FormatVersion})"))

  private def longs(s: String): Array[Long] =
    if (s.isEmpty) Array.empty else s.split(",").map(_.toLong)

  private def parseManifest(id: Long): Manifest = {
    val m = Files.readString(snapDir(id).resolve("manifest.json"))
    val fmt = field(m, "format").map(_.toInt).getOrElse(0)
    if (fmt != FrontierStore.FormatVersion)
      throw new IllegalStateException(
        s"frontier store at $rootDir has manifest format $fmt but this build " +
          s"reads format ${FrontierStore.FormatVersion}; recreate the store " +
          "(snapshot layouts are not cross-version compatible)")
    val chain = req(m, "seen_chain", id) match {
      case "" => Seq.empty[(Long, Set[Int])]
      case s => s.split(";").toSeq.map { e =>
        val Array(snap, bs) = e.split(":", 2)
        (snap.toLong, if (bs.isEmpty) Set.empty[Int] else bs.split("\\|").map(_.toInt).toSet)
      }
    }
    val totals = FrontierStore.parseCounterTotals(m)
    Manifest(id,
      req(m, "step", id).toInt, req(m, "now", id).toDouble,
      req(m, "base", id).toLong,
      longs(req(m, "frontier_owner", id)), longs(req(m, "rows_per_bucket", id)),
      longs(req(m, "seen_owner", id)), longs(req(m, "results_snaps", id)).toSeq,
      chain,
      longs(req(m, "seen_rows", id)), longs(req(m, "seen_cap", id)),
      totals)
  }

  // ---------------- read ----------------

  private def frontierView(spark: SparkSession, mf: Manifest): DataFrame = {
    val paths = mf.frontierOwner.zipWithIndex.collect {
      case (owner, b) if owner != 0L => snapDir(owner).resolve(s"frontier/bucket=$b").toString
    }
    // explicit schema on every store read: the layout is ours, so paying
    // parquet schema inference (footer reads + a listing pass per read, at
    // superstep cadence) buys nothing (guide §6: the store read path is
    // fixed-cost-bound at small step sizes)
    if (paths.isEmpty) emptyFrontier(spark)
    else spark.read.schema(FrontierStore.frontierSchema)
      .parquet(paths.toIndexedSeq: _*)
  }

  private def resultsView(spark: SparkSession, mf: Manifest): DataFrame = {
    val paths = mf.resultSnaps.map(s => snapDir(s).resolve("results-delta").toString)
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.sched.Crawler.resultSchema)
    else spark.read.schema(graft.sched.Crawler.resultSchema).parquet(paths: _*)
  }

  private def emptyFrontier(spark: SparkSession): DataFrame =
    graft.sched.Crawler.seedFrontier(spark, Seq.empty, 0.0)

  def read(spark: SparkSession): Option[StoreSnapshot] = currentId.map { id =>
    val mf = parseManifest(id)
    StoreSnapshot(id, mf.step, mf.now, frontierView(spark, mf),
      spark.read.schema(FrontierStore.budgetsSchema)
        .parquet(snapDir(id).resolve("budgets").toString),
      resultsView(spark, mf), mf.counterTotals,
      frontierRows = mf.rowsPerBucket.sum)
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

    // The four payloads (frontier/, seen-delta/+blooms/, budgets/,
    // results-delta/) commit to INDEPENDENT directories inside the staged
    // snapshot, so their writes overlap on driver threads (Spark job
    // submission is thread-safe; the manifest rename below is still the
    // single atomic commit point). Ordering constraints: a compaction's
    // seen AND results rewrites consume keepProjects from the frontier
    // merge, so full snapshots run frontier -> {seen, results} sequentially.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val writeEc: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // counters may arrive LAZY (Superstep collectCounters=false): collect on
    // a concurrent future started before any write job, so the counters
    // aggregate's driver planning + stage waves overlap the commit's write
    // jobs instead of costing their own serial action. A LocalRelation
    // counters frame (eager callers, tests) resolves in microseconds here.
    val fCounterRows = Future(counters.collect())
    val fBudgets = Future {
      budgets.coalesce(math.max(1, numPartitions / 8))
        .write.mode(SaveMode.Overwrite).parquet(tmp.resolve("budgets").toString)
    }
    // results are written UNCONDITIONALLY and emptiness is read from the
    // written files' parquet footers on the driver (a few ms) — the old
    // `.isEmpty` probe was a full plan + 1-task job per superstep that the
    // non-empty (common) case paid ON TOP of the write (guide §1.2: fixed
    // cost per step is the store path's bottleneck, not bytes)
    def resultsSection(keep: Option[DataFrame]): Boolean = {
      val resultsSrc0 =
        if (full && prev.nonEmpty)
          resultsView(spark, prev.get).unionByName(newResults)
        else newResults
      // compaction cleanup (drain IS deletion, matching frontier/seen): a
      // dropped project's result rows go with it — otherwise a later
      // re-seed of the same URL starts crawled_ok=false and appends a
      // duplicate (project, url_hash) the first-writer-wins contract
      // promises never exists (StepResult.firstResults invariant)
      val resultsSrc = keep match {
        case Some(k) if full => resultsSrc0.join(broadcast(k), Seq("project"), "left_semi")
        case _ => resultsSrc0
      }
      val dir = tmp.resolve("results-delta")
      resultsSrc.write.mode(SaveMode.Overwrite).parquet(dir.toString)
      val has = FrontierStore.footerRowCount(spark, dir) > 0
      if (!has) deleteRecursively(dir) // keep zero-row dirs out of the view
      has
    }
    // incremental snapshots never drop projects -> results write starts now;
    // full snapshots defer it until keepProjects exists (below)
    val fResultsInc: Option[Future[Boolean]] =
      if (full) None else Some(Future(resultsSection(None)))

    val keyCols = Seq("project", "url_hash")
    val up = upserts.withColumn("bucket", frontierBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Incremental steps: ONE stats job covers both per-bucket breakdowns
    // (frontier buckets touched by upserts + seen buckets of fresh keys),
    // materializing both persisted frames as it goes — previously two
    // separate jobs (a distinct().collect() and a groupBy().count()) paid
    // two plan+schedule rounds per superstep for the same information.
    val seenKeyedInc: Option[DataFrame] =
      if (full) None
      else Some(freshKeys.select("project", "url_hash")
        .withColumn("skey", xxhash64(col("project"), col("url_hash")))
        .withColumn("bucket", seenBucket(col("skey")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val incStats: Map[(Int, Int), Long] =
      if (full) Map.empty
      else up.select(col("bucket"), lit(0).as("kind"))
        .unionByName(seenKeyedInc.get.select(col("bucket"), lit(1).as("kind")))
        .groupBy("kind", "bucket").count().collect()
        .map(r => (r.getAs[Int]("kind"), r.getAs[Int]("bucket")) -> r.getAs[Long]("count"))
        .toMap

    // ---- frontier COW
    val touched: Array[Int] =
      if (full) (0 until numPartitions).toArray
      else incStats.keys.collect { case (0, b) => b }.toArray.sorted
    // Zero-upsert superstep (retry backoff / politeness lull while ACTIVE
    // tasks remain): a partitionBy write of an empty frame produces NO
    // parquet files, so the read-back would throw UNABLE_TO_INFER_SCHEMA.
    // Skip the frontier write entirely and carry the lineage forward
    // unchanged — the snapshot still commits budgets/results/manifest.
    val skipFrontierWrite = !full && touched.isEmpty
    // set when a compaction drops drained (FINISHED) projects — the seen
    // rewrite below filters those projects' keys with the same frame
    var keepProjects: Option[DataFrame] = None
    // compaction-persisted merge frame, released only after the seen
    // section (keepProjects derives from it)
    var compactCache: Option[DataFrame] = None
    def frontierSection(): Map[Int, Long] =
      if (skipFrontierWrite) Map.empty
      else {
        val oldTouched = prev match {
          case None => None
          case Some(mf) =>
            val paths = touched.collect {
              case b if mf.frontierOwner(b) != 0L =>
                snapDir(mf.frontierOwner(b)).resolve(s"frontier/bucket=$b").toString
            }
            if (paths.isEmpty) None
            else Some(spark.read.schema(FrontierStore.frontierSchema)
              .parquet(paths.toIndexedSeq: _*))
        }
        // broadcast-hint the step-sized key side of the COW anti-join when
        // small (known exactly from incStats, no extra job): without the
        // hint a plan-time SMJ shuffles the touched buckets' full row set
        // every commit — two materialized exchanges of pure fixed cost at
        // politeness-small step sizes (same rationale as
        // Superstep.Config.smallStep; threshold shared)
        val smallThreshold = spark.conf.getOption("spark.graft.smallStepBroadcastRows")
          .map(_.toLong).getOrElse(100000L)
        val upRows = incStats.collect { case ((0, _), n) => n }.sum
        val upKeys0 = up.select(keyCols.map(col): _*)
        val upKeys = if (!full && upRows < smallThreshold) broadcast(upKeys0) else upKeys0
        val merged0 = oldTouched match {
          case None => up
          case Some(old) =>
            old.join(upKeys, keyCols, "left_anti")
              .withColumn("bucket", frontierBucket)
              .unionByName(up)
        }
        // FINISHED-project cleanup: at compaction a project with zero
        // ACTIVE rows has drained — drop all its rows. This matches the
        // reference EXACTLY: when a project's unfinished count reaches 0
        // the scheduler sets status FINISHED and calls taskdb.drop
        // (scheduler.py:372-373) — drain IS deletion there too, and a
        // re-seeded URL after the drop is legitimately brand-new. Projects
        // with ACTIVE work (incl. STOP-ed ones awaiting re-activation)
        // keep their full row set.
        val merged1 =
          if (full && dropDrainedOnCompact)
            // compaction reads every live bucket; persist so the ACTIVE-
            // project scan and the partitionBy write don't both re-read
            // the whole frontier from parquet
            merged0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else merged0
        val mergedTouched =
          if (full && dropDrainedOnCompact) {
            val act = merged1.where(col("status") === graft.model.TaskStatus.Active)
              .select("project").distinct()
            keepProjects = Some(act)
            merged1.join(broadcast(act), Seq("project"), "left_semi")
          } else merged1
        // one writer task per touched bucket: without this, every upstream
        // task writes into every bucket dir — O(tasks x buckets) tiny files
        // per snapshot, and the read-back + every later resume pays a
        // footer-read per file. Bucket = the store's read parallelism unit,
        // so one file per bucket is the intended layout.
        mergedTouched.repartition(math.max(1, touched.length), col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("bucket").parquet(tmp.resolve("frontier").toString)
        if (merged1 ne merged0) compactCache = Some(merged1)
        // per-bucket lineage: owner + row count — from the parquet FOOTERS
        // of the files just written (driver-side metadata reads, a few ms
        // per touched bucket), NOT a read-back scan job: the scan was a
        // full re-read of every touched bucket per snapshot — at the
        // all-buckets-touched steady state, an extra O(frontier) pass per
        // step for numbers the footers already hold.
        val d = tmp.resolve("frontier")
        if (!Files.exists(d)) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          val conf = spark.sessionState.newHadoopConf()
          val ls = Files.list(d)
          val bucketDirs = try ls.iterator().asScala
            .filter(_.getFileName.toString.startsWith("bucket=")).toList
            finally ls.close()
          bucketDirs.map { bd =>
            val b = bd.getFileName.toString.stripPrefix("bucket=").toInt
            val fs = Files.list(bd)
            val rows = try fs.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map { f =>
                val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                  new org.apache.hadoop.fs.Path(f.toUri), conf)
                val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                try r.getRecordCount finally r.close()
              }.sum
              finally fs.close()
            b -> rows
          }.toMap
        }
      }
    val fFrontier = Future(frontierSection())
    // compaction: the frontier merge must complete before the seen and
    // results rewrites (keepProjects); incremental snapshots overlap all
    if (full) Await.ready(fFrontier, Duration.Inf)
    val fResultsFull: Option[Future[Boolean]] =
      if (full) Some(Future(resultsSection(keepProjects))) else None

    // ---- seen index: delta + bloom refresh (append-only; compaction
    // rewrites the full key set so the chain re-bases). The whole section
    // runs as ANOTHER concurrent write future: on incremental snapshots it
    // is independent of the frontier COW (on full ones keepProjects was
    // already awaited above), and its jobs' driver-side planning gaps
    // overlap the frontier write's instead of summing — the superstep
    // commit path is fixed-cost-bound at small step sizes.
    def seenSection(): (Array[Long], Array[Long], Array[Long], Seq[(Long, Set[Int])]) = {
    val seenKeyed = seenKeyedInc.getOrElse {
      // full snapshot: re-base from the whole committed key set + fresh keys
      val seenSrc0 =
        if (prev.nonEmpty)
          prev.map(mf => SeenFilter(seenBuckets, rootDir, mf.seenOwner, mf.seenChain)
            .keysFor(spark, 0 until seenBuckets)).get
            .unionByName(freshKeys.select("project", "url_hash"))
        else freshKeys.select("project", "url_hash")
      // compaction cleanup: a dropped (drained) project's seen keys go with
      // it — the reference forgets a deleted project's taskdb entirely
      val seenSrc = keepProjects match {
        case Some(keep) => seenSrc0.join(broadcast(keep), Seq("project"), "left_semi")
        case _ => seenSrc0
      }
      seenSrc
        .withColumn("skey", xxhash64(col("project"), col("url_hash")))
        .withColumn("bucket", seenBucket(col("skey")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val freshPerBucket: Map[Int, Long] =
      if (full)
        seenKeyed.groupBy("bucket").count().collect()
          .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("count")).toMap
      else incStats.collect { case ((1, b), n) => b -> n }
    val seenTouched: Array[Int] = freshPerBucket.keys.toArray.sorted
    val prevSeenRows = prev.map(_.seenRows).getOrElse(Array.fill(seenBuckets)(0L))
    val prevSeenCap = prev.map(_.seenCap)
      .getOrElse(Array.fill(seenBuckets)(bloomItemsPerBucket))
    // cumulative item count per bucket; on full, seenSrc IS the full key set
    // so the per-bucket counts are exact re-bases
    val seenRows = Array.tabulate(seenBuckets) { b =>
      if (full) freshPerBucket.getOrElse(b, 0L)
      else prevSeenRows(b) + freshPerBucket.getOrElse(b, 0L)
    }
    val prevOwner = prev.map(_.seenOwner).getOrElse(Array.fill(seenBuckets)(0L))
    // Bloom capacity guard: append-only merging keeps the ORIGINAL filter's
    // sizing, so once a bucket's cumulative count crosses ~80% of capacity
    // the FPP starts collapsing (probe selectivity, not correctness — the
    // exact anti-join backstops). Rebuild that bucket's bloom from its full
    // key set at 2x the current count.
    val rebuild: Array[Boolean] = Array.tabulate(seenBuckets) { b =>
      !full && prevOwner(b) != 0L && freshPerBucket.contains(b) &&
        seenRows(b) > (prevSeenCap(b) * 4 / 5)
    }
    val capThisSnap = Array.tabulate(seenBuckets) { b =>
      if (full || rebuild(b) || prevOwner(b) == 0L)
        math.max(bloomItemsPerBucket, seenRows(b) * 2)
      else prevSeenCap(b)
    }
    if (seenTouched.nonEmpty) {
      seenKeyed.repartition(math.max(1, seenTouched.length), col("bucket"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(tmp.resolve("seen-delta").toString)
      // bloom refresh: executors write side-files into the staged snapshot
      // (shared FS — same contract as any shuffle/output commit); file names
      // are deterministic so task retries overwrite identically
      Files.createDirectories(tmp.resolve("blooms"))
      val rootStr = rootDir; val tmpStr = tmp.toString
      val fpp = bloomFpp
      val isFull = full
      val rebuildArr = rebuild; val capArr = capThisSnap; val ownerArr = prevOwner
      // rebuild buckets re-insert their ENTIRE committed key set (pruned
      // chain read of only those buckets) alongside this step's fresh keys
      val rebuildBuckets = (0 until seenBuckets).filter(rebuildArr(_))
      val bloomFeed0 = seenKeyed.select(col("bucket"), col("skey"))
      val bloomFeed =
        if (rebuildBuckets.isEmpty) bloomFeed0
        else bloomFeed0.unionByName(
          prev.map(mf => SeenFilter(seenBuckets, rootDir, mf.seenOwner, mf.seenChain)
            .keysFor(spark, rebuildBuckets)).get
            .withColumn("skey", xxhash64(col("project"), col("url_hash")))
            .withColumn("bucket", seenBucket(col("skey")))
            .select(col("bucket"), col("skey")))
      bloomFeed.as[(Int, Long)](
          org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaInt,
            org.apache.spark.sql.Encoders.scalaLong))
        .repartition(math.max(1, seenTouched.length), col("bucket"))
        .foreachPartition { (it: Iterator[(Int, Long)]) =>
          val byBucket = scala.collection.mutable.HashMap
            .empty[Int, org.apache.spark.util.sketch.BloomFilter]
          it.foreach { case (b, k) =>
            val bloom = byBucket.getOrElseUpdate(b, {
              if (!isFull && !rebuildArr(b) && ownerArr(b) != 0L) {
                val in = Files.newInputStream(
                  Paths.get(SeenFilter.bloomPath(rootStr, ownerArr(b), b)))
                try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
              } else org.apache.spark.util.sketch.BloomFilter.create(capArr(b), fpp)
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
    val seenCap = Array.tabulate(seenBuckets) { b =>
      if (seenTouched.contains(b)) capThisSnap(b)
      else if (full) bloomItemsPerBucket
      else prevSeenCap(b)
    }
    val seenChain =
      if (full) Seq(id -> seenTouched.toSet)
      else prev.map(_.seenChain).getOrElse(Seq.empty) ++
        (if (seenTouched.nonEmpty) Seq(id -> seenTouched.toSet) else Seq.empty)
    seenKeyed.unpersist(false)
    (seenOwner, seenCap, seenRows, seenChain)
    }
    val fSeen = Future(seenSection())

    // ---- join the concurrent frontier/budgets/results/seen writes
    val writtenCounts: Map[Int, Long] = Await.result(fFrontier, Duration.Inf)
    val (seenOwner, seenCap, seenRows, seenChain) = Await.result(fSeen, Duration.Inf)
    val frontierOwner = Array.tabulate(numPartitions) { b =>
      if (writtenCounts.contains(b)) id
      // a touched-but-now-empty bucket must NOT keep pointing at an old
      // snapshot: on a compaction snapshot the old owners are GC'd below
      else if (full || touched.contains(b)) 0L
      else prev.map(_.frontierOwner(b)).getOrElse(0L)
    }
    val rowsPerBucket = Array.tabulate(numPartitions) { b =>
      if (writtenCounts.contains(b)) writtenCounts(b)
      else if (full || touched.contains(b)) 0L
      else prev.map(_.rowsPerBucket(b)).getOrElse(0L)
    }
    val hasResults = Await.result(fResultsInc.orElse(fResultsFull).get, Duration.Inf)
    Await.result(fBudgets, Duration.Inf)
    val resultSnaps =
      if (full) (if (hasResults) Seq(id) else Seq.empty)
      else prev.map(_.resultSnaps).getOrElse(Seq.empty) ++
        (if (hasResults) Seq(id) else Seq.empty)

    // ---- manifest + atomic commit. The counters frame is a LocalRelation
    // (Superstep collects it once) — sort on the driver instead of paying a
    // SortExec job per snapshot for a handful of rows.
    val counterRowsC = Await.result(fCounterRows, Duration.Inf)
      .sortBy(_.getAs[String]("project"))
    val perProject = counterRowsC.map { r =>
      val fields = r.schema.fieldNames.map { f =>
        val v = r.getAs[Any](f)
        val vs = v match {
          case s: String => FrontierStore.jsonStr(s)
          case other => String.valueOf(other)
        }
        s"""${FrontierStore.jsonStr(f)}:$vs"""
      }.mkString(",")
      s"{$fields}"
    }.mkString("[", ",", "]")
    // cumulative per-project totals (reference counter reload semantics):
    // prev totals + this step's numeric counter fields
    val counterTotals: Map[String, Map[String, Long]] =
      counterRowsC.foldLeft(prev.map(_.counterTotals).getOrElse(Map.empty))(
        FrontierStore.foldCounterRow)
    val total = rowsPerBucket.sum
    val lineageJson = touched
      .map(b => s"""{"partition":$b,"rows":${rowsPerBucket(b)},"owner":$id}""")
      .mkString("[", ",", "]")
    val base = if (full) id else prev.get.base
    val manifest =
      s"""{"format":${FrontierStore.FormatVersion},
         |"snapshot":$id,"step":$step,"now":$now,"base":$base,"full":$full,
         |"num_partitions":$numPartitions,"seen_buckets":$seenBuckets,
         |"frontier_rows":$total,
         |"frontier_owner":"${frontierOwner.mkString(",")}",
         |"rows_per_bucket":"${rowsPerBucket.mkString(",")}",
         |"seen_owner":"${seenOwner.mkString(",")}",
         |"seen_rows":"${seenRows.mkString(",")}",
         |"seen_cap":"${seenCap.mkString(",")}",
         |"seen_chain":"${seenChain.map { case (s, bs) => s"$s:${bs.toSeq.sorted.mkString("|")}" }.mkString(";")}",
         |"results_snaps":"${resultSnaps.mkString(",")}",
         |"counter_totals":"${FrontierStore.encodeCounterTotals(counterTotals)}",
         |"touched_partitions":$lineageJson,
         |"counters":$perProject}""".stripMargin
    Files.writeString(tmp.resolve("manifest.json"), manifest)
    up.unpersist(false)
    compactCache.foreach(_.unpersist(false))

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

object FrontierStore {
  /** Bumped whenever the snapshot/manifest layout changes — a mismatched
    * store fails fast with a descriptive error instead of a regex NPE.
    * v4: frontier rows carry `crawled_ok` (first-writer-wins result dedup
    * without an O(history) anti-join). */
  val FormatVersion = 4

  /** Static schemas of the store's own layouts: every read passes them
    * explicitly, so no superstep pays parquet schema inference (a listing +
    * footer pass per `spark.read.parquet` call — pure fixed cost at
    * superstep cadence, guide §6). The frontier schema is derived from the
    * [[graft.model.Task]] case class, whose field order IS `frontierCols`. */
  val frontierSchema: StructType =
    org.apache.spark.sql.Encoders.product[graft.model.Task].schema
  val budgetsSchema: StructType = StructType(Seq(
    StructField("project", StringType), StructField("host", StringType),
    StructField("tokens", DoubleType), StructField("last_update", DoubleType)))
  val seenKeySchema: StructType = StructType(Seq(
    StructField("project", StringType), StructField("url_hash", LongType),
    StructField("skey", LongType)))

  /** Sum of parquet-footer record counts under `dir` (recursive) — a
    * driver-side metadata read of a few ms, replacing `.isEmpty` probe jobs
    * on the store's write path. */
  def footerRowCount(spark: SparkSession, dir: Path): Long = {
    if (!Files.exists(dir)) return 0L
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val walk = Files.walk(dir)
    try walk.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toUri), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    finally walk.close()
  }

  /** Fold one per-project counter Row's Long fields into running totals —
    * ONE implementation shared by the store's persisted manifest totals and
    * Crawler's in-memory totals, so the two can never silently diverge. */
  def foldCounterRow(acc: Map[String, Map[String, Long]],
      row: org.apache.spark.sql.Row): Map[String, Map[String, Long]] = {
    val p = row.getAs[String]("project")
    acc.updated(p, foldCounterRowOne(acc.getOrElse(p, Map.empty[String, Long]), row))
  }

  /** Single-project fold: this row's Long fields into that project's running
    * entry only — the per-row form Crawler uses so updating one project is
    * O(fields), not an O(projects) snapshot of the whole accumulator. */
  def foldCounterRowOne(prevForProject: Map[String, Long],
      row: org.apache.spark.sql.Row): Map[String, Long] =
    row.schema.fields.collect {
      case f if f.name != "project" && row.getAs[Any](f.name).isInstanceOf[Long] =>
        f.name -> row.getAs[Long](f.name)
    }.foldLeft(prevForProject) {
      case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v)
    }

  /** Minimal JSON string escaping (quote, backslash, control chars). */
  def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2); sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"'); sb.toString
  }

  /** Counter totals travel inside a JSON string field; project names are
    * URL-encoded so the payload stays regex-parseable regardless of what
    * characters a project name contains. */
  def encodeCounterTotals(t: Map[String, Map[String, Long]]): String =
    t.toSeq.sortBy(_._1).map { case (p, m) =>
      val enc = java.net.URLEncoder.encode(p, "UTF-8")
      s"$enc=" + m.toSeq.sorted.map { case (k, v) => s"$k~$v" }.mkString("|")
    }.mkString(";")

  def parseCounterTotals(manifest: String): Map[String, Map[String, Long]] = {
    val raw = """"counter_totals":"([^"]*)"""".r
      .findFirstMatchIn(manifest).map(_.group(1)).getOrElse("")
    if (raw.isEmpty) Map.empty
    else raw.split(";").map { e =>
      val Array(p, ms) = e.split("=", 2)
      val m = if (ms.isEmpty) Map.empty[String, Long]
        else ms.split("\\|").map { kv =>
          val Array(k, v) = kv.split("~", 2); k -> v.toLong
        }.toMap
      java.net.URLDecoder.decode(p, "UTF-8") -> m
    }.toMap
  }
}
