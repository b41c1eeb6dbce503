package graft.frontier

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Distributed URL-seen probe over a bucketed Bloom side-file index — the
 * scale replacement for round 1's driver-held Bloom (which collected the
 * whole filter to the driver and re-broadcast it every superstep; at 10^10
 * URLs a 1% Bloom is ~12 GB on one node — a hard ceiling).
 *
 * Here the seen set is sharded into `numBuckets` buckets by
 * `pmod(xxhash64(project, url_hash), numBuckets)`; each bucket owns
 *  - a Bloom side-file (`snap-N/blooms/<b>.bloom`), rewritten only when the
 *    bucket receives fresh keys (manifest lineage tracks the owning
 *    snapshot), and
 *  - key-delta parquet (`snap-N/seen-delta/bucket=<b>/`), append-only.
 *
 * The probe is a partition-local function: each executor lazily loads the
 * blooms for the buckets its rows touch (JVM-wide cache keyed by file path
 * — snapshot paths are immutable so the cache never invalidates). No
 * driver round-trip, no per-step broadcast, memory bounded per executor by
 * the buckets it actually probes. False positives fall through to the exact
 * anti-join over ONLY the probed buckets' key files (partition-pruned read)
 * — the Bloom is never the source of truth (SURVEY §2.4).
 */
final case class SeenFilter(
    numBuckets: Int,
    root: String,
    /** bloom-owning snapshot id per bucket; 0 = bucket has no keys yet */
    bloomOwner: Array[Long],
    /** (snapshotId, seen-buckets touched in it) — the delta chain */
    deltaChain: Seq[(Long, Set[Int])]) {

  def bucketCol(project: Column, urlHash: Column): Column =
    pmod(xxhash64(project, urlHash), lit(numBuckets)).cast("int")

  /** might-contain probe usable as a filter column: (bucket, skey) -> bool.
    * A codegen'd native expression (not a Scala UDF): the probe sits on the
    * J1 hot path — every follow candidate of every superstep — where UDF
    * dispatch + Int/Long boxing would be the single highest-volume per-row
    * overhead in the crawl. */
  def probe: (Column, Column) => Column = {
    val r = root; val owners = bloomOwner
    (bucket, skey) =>
      org.apache.spark.sql.GraftColumnShim.column(BloomSeenProbe(
        org.apache.spark.sql.GraftColumnShim.expression(bucket),
        org.apache.spark.sql.GraftColumnShim.expression(skey),
        r, owners))
  }

  /** Exact seen keys (project, url_hash) for the given buckets only —
    * reads just those buckets' delta files across the snapshot chain. */
  def keysFor(spark: SparkSession, buckets: Seq[Int]): DataFrame = {
    val want = buckets.toSet
    val paths = for {
      (snap, touched) <- deltaChain
      b <- want if touched.contains(b)
    } yield SeenFilter.deltaPath(root, snap, b)
    val existing = paths.filter(p => Files.exists(Paths.get(p)))
    if (existing.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("project", StringType), StructField("url_hash", LongType))))
    // explicit schema: the delta layout is ours — don't pay parquet schema
    // inference per probe (this read happens at superstep cadence)
    else spark.read.schema(FrontierStore.seenKeySchema).parquet(existing: _*)
      .select("project", "url_hash")
  }
}

object SeenFilter {
  def bloomPath(root: String, snap: Long, bucket: Int): String =
    f"$root/snap-$snap%06d/blooms/$bucket.bloom"
  def deltaPath(root: String, snap: Long, bucket: Int): String =
    f"$root/snap-$snap%06d/seen-delta/bucket=$bucket"

  /** Executor-JVM-wide bloom cache. Snapshot files are immutable so an
    * entry is never WRONG — but every superstep that touches a bucket
    * writes a NEW bloom file under the new snapshot id, so a path-keyed
    * unbounded cache grows by ~bloom-size per touched bucket per step for
    * the JVM's life (stale snapshots' entries linger after GC). Bounded
    * byte-budget LRU: stale paths simply age out. */
  private val maxBytes: Long =
    sys.env.getOrElse("GRAFT_BLOOM_CACHE_BYTES", (512L * 1024 * 1024).toString).toLong
  private var cachedBytes = 0L
  private val cache = new java.util.LinkedHashMap[String, (BloomFilter, Long)](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, (BloomFilter, Long)]): Boolean =
      false // eviction handled explicitly (byte budget, not entry count)
  }
  def load(path: String): BloomFilter = {
    val hit = cache.synchronized(cache.get(path))
    if (hit != null) hit._1
    else {
      // deserialize OUTSIDE the monitor: concurrent tasks loading different
      // buckets must not serialize their multi-MB reads behind one lock
      // (a rare duplicate same-path load is benign — first insert wins)
      val bytes = Files.size(Paths.get(path))
      val in = Files.newInputStream(Paths.get(path))
      val bloom = try BloomFilter.readFrom(in) finally in.close()
      cache.synchronized {
        val raced = cache.get(path)
        if (raced != null) raced._1
        else {
          cache.put(path, (bloom, bytes))
          cachedBytes += bytes
          val it = cache.entrySet().iterator()
          while (cachedBytes > maxBytes && cache.size() > 1 && it.hasNext) {
            val eldest = it.next()
            if (eldest.getKey != path) { cachedBytes -= eldest.getValue._2; it.remove() }
          }
          bloom
        }
      }
    }
  }
  /** test hooks */
  private[frontier] def cacheSize: Int = cache.synchronized(cache.size())
  private[frontier] def cacheBytes: Long = cache.synchronized(cachedBytes)

  /** Static single-probe entry point for codegen (called from generated
    * Java): owner-0 short-circuiting lives in the generated code. */
  def probeOne(root: String, owner: Long, bucket: Int, key: Long): Boolean =
    load(bloomPath(root, owner, bucket)).mightContainLong(key)
}

/**
 * Codegen'd Bloom-probe predicate `(bucket:int, skey:long) -> boolean` over
 * the filter's side-files — stays inside whole-stage codegen with primitive
 * locals (the generated code indexes the owners array and calls the static
 * [[SeenFilter.probeOne]]), replacing the boxed per-row ScalaUDF that used
 * to sit on the J1 dedup hot path (SURVEY §2.4; verdict r03 item 2).
 */
case class BloomSeenProbe(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    root: String,
    owners: Array[Long])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def nullIntolerant: Boolean = true
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_seen_probe"

  override protected def nullSafeEval(b: Any, k: Any): Any = {
    val bi = b.asInstanceOf[Int]
    val o = owners(bi)
    o != 0L && SeenFilter.probeOne(root, o, bi, k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ownersRef = ctx.addReferenceObj("bloomOwners", owners, "long[]")
    val rootRef = ctx.addReferenceObj("bloomRoot", root, "java.lang.String")
    val o = ctx.freshName("owner")
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"""
         |final long $o = $ownersRef[$b];
         |${ev.value} = $o != 0L && graft.frontier.SeenFilter.probeOne($rootRef, $o, $b, $k);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): BloomSeenProbe =
    copy(left = newLeft, right = newRight)
}
