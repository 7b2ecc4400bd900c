package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Query, Tables}

/** Versioned segment store with snapshot-isolated time travel — the
  * Delta/Iceberg contract re-expressed minimally (reference scope:
  * the reference rebuilds its chromadb collection per ingest run with
  * no history; at 100 TB a training pipeline cannot, because a
  * 30-day-old run must be reproducible and readers must never see a
  * half-applied compaction).
  *
  * Layout:
  * {{{
  *   <path>/data/seg=N/          immutable parquet segments
  *   <path>/_versions/vNNNNNN.txt  manifest: one segment name per line
  * }}}
  *
  * Every verb writes NEW segments and a NEW manifest; no verb ever
  * edits or deletes a published segment, so `readVersion(path, v)`
  * resolves any historical manifest to byte-identical data (ForkSpec
  * precedent: immutability IS the isolation mechanism — there is no
  * lock). The manifest commit is an atomic create-if-absent (a hard
  * link, whose link(2) fails with EEXIST on an existing target) —
  * Delta's put-if-absent commit primitive: of two writers racing to
  * the same next version number, exactly one publishes and the loser
  * throws FileAlreadyExistsException instead of silently replacing
  * the winner's manifest.
  *
  * Scale shape: manifests are segment-LIST sized (driver IO, KBs);
  * data moves only through Spark jobs. `deleteWhere` rewrites only
  * the segments that actually contain doomed rows (per-segment
  * predicate-hit counts decide — an anti-join-and-rewrite of the
  * touched tail, the deletePartitionedCore idea at segment
  * granularity); untouched segments are carried by reference into the
  * new manifest. `vacuum` removes segments referenced by NO retained
  * manifest — the only destructive verb, explicitly fenced by a
  * retention floor.
  */
object VersionedStore {

  private def dataDir(path: String, seg: String) = s"$path/data/$seg"
  private def versionsDir(path: String) = s"$path/_versions"
  private def manifestFile(path: String, v: Int) =
    f"${versionsDir(path)}/v$v%06d.txt"

  /** List a directory's entry names, CLOSING the stream (Files.list
    * holds a directory fd until closed; versions() runs per verb and
    * per gate, so a leak here exhausts fd limits on long runs). */
  private def listNames(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Using.resource(Files.list(dir))(
      _.iterator().asScala.map(_.getFileName.toString).toSeq)

  /** Depth-first delete of a directory tree, closing the walk
    * stream. */
  private[graft] def deleteTree(root: Path): Unit =
    if (Files.isDirectory(root))
      Using.resource(Files.walk(root))(
        _.iterator().asScala.toSeq).reverse
        .foreach(p => Files.deleteIfExists(p))

  /** Published versions, ascending. */
  def versions(path: String): Seq[Int] =
    listNames(Paths.get(versionsDir(path)))
      .collect { case s if s.startsWith("v") && s.endsWith(".txt") =>
        s.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted

  private def readManifest(path: String, v: Int): Seq[String] = {
    val f = Paths.get(manifestFile(path, v))
    require(Files.exists(f), s"version $v does not exist at $path")
    Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Atomically publish `segs` as the next version; returns it. */
  private def commit(path: String, segs: Seq[String]): Int = {
    val next = versions(path).lastOption.getOrElse(0) + 1
    publishManifest(path, next, segs)
    next
  }

  /** Publish `segs` as version `v` — atomic create-if-absent.
    * Hard-link publish is the commit point: link(2) fails with EEXIST
    * when the target exists, so two writers racing to the same version
    * number — one wins, the LOSER throws FileAlreadyExistsException.
    * (An ATOMIC_MOVE here would map to rename(2), which silently
    * REPLACES an existing target on POSIX — a lost update.) Readers
    * never see a partial manifest: the link appears with the tmp
    * file's full content. Package-visible so the spec can drive the
    * losing side of the race directly. */
  private[graft] def publishManifest(path: String, v: Int,
                                     segs: Seq[String]): Unit = {
    val dir = Paths.get(versionsDir(path))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp_v$v-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, segs.mkString("\n"))
    val target = Paths.get(manifestFile(path, v))
    try Files.createLink(target, tmp)
    catch {
      case _: UnsupportedOperationException =>
        // no hard links on this filesystem: CREATE_NEW keeps the
        // loser-fails contract (O_EXCL), at the cost of readers
        // possibly glimpsing a mid-write manifest
        Files.writeString(target, segs.mkString("\n"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
    } finally Files.deleteIfExists(tmp)
  }

  private def writeSegment(df: DataFrame, path: String, seg: String): Unit =
    df.write.mode("errorifexists").parquet(dataDir(path, seg))

  /** The next numeric segment name — derived from the union of the
    * current manifest AND the on-disk data/ listing: after rollback()
    * republishes an older manifest, newer historical versions' segments
    * still exist on disk, and naming from the manifest alone would
    * collide with one of them (errorifexists would then fail every
    * numeric-segment write verb after a rollback). */
  private def nextSegName(path: String, existing: Seq[String]): String = {
    val onDisk = listNames(Paths.get(s"$path/data"))
    val n = (existing ++ onDisk).map(_.stripPrefix("seg="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toInt)
      .maxOption.getOrElse(-1) + 1
    s"seg=$n"
  }

  /** Idempotent (transactional) append — the streaming-sink verb: the
    * segment name carries the caller's transaction identity (e.g.
    * foreachBatch's batchId), so a REPLAYED micro-batch (checkpoint
    * recovery, at-least-once redelivery) finds its transaction already
    * in the manifest and publishes nothing — Delta's txnAppId/
    * txnVersion mechanic, which is what turns an at-least-once stream
    * into an exactly-once table. A segment directory left by a write
    * that crashed BEFORE its manifest commit is overwritten (it was
    * never published, so no reader can hold it). */
  def appendBatch(spark: SparkSession, df: DataFrame, path: String,
                  txnId: String): Int = {
    val vs = versions(path)
    require(vs.nonEmpty, s"appendBatch needs an existing store at $path")
    val cur = readManifest(path, vs.last)
    val seg = s"seg=txn-$txnId"
    if (cur.contains(seg)) vs.last
    else {
      df.write.mode("overwrite").parquet(dataDir(path, seg))
      commit(path, cur :+ seg)
    }
  }

  /** Create the store: one segment, version 1. */
  def create(spark: SparkSession, df: DataFrame, path: String): Int = {
    require(versions(path).isEmpty, s"$path already has versions — use append")
    writeSegment(df, path, "seg=0")
    commit(path, Seq("seg=0"))
  }

  /** Append a batch as a new segment (no rewrite of existing data). */
  def append(spark: SparkSession, df: DataFrame, path: String): Int = {
    val cur = readManifest(path, versions(path).last)
    val seg = nextSegName(path, cur)
    writeSegment(df, path, seg)
    commit(path, cur :+ seg)
  }

  /** Delete rows matching `pred`: rewrite ONLY the segments that
    * contain matches (survivor rows go to one new segment); untouched
    * segments carry into the new manifest by reference. Readers of
    * prior versions are unaffected — their segments are immutable.
    * SQL DELETE semantics: a row where `pred` evaluates to NULL did
    * NOT match and is retained (the null-safe coalesce — a bare
    * `!pred` would make NULL rows vanish). Touched segments are read
    * with mergeSchema, matching [[readVersion]]: a schema-evolved
    * store must not lose later-added columns in the rewrite. */
  def deleteWhere(spark: SparkSession, path: String,
                  pred: org.apache.spark.sql.Column): Int = {
    val doomed = coalesce(pred, lit(false))
    val cur = readManifest(path, versions(path).last)
    // segment-list-sized collect: which segments hold doomed rows
    val touched = cur.filter { seg =>
      Relations.parquet(spark, dataDir(path, seg)).filter(doomed).limit(1).count() > 0
    }
    if (touched.isEmpty) commit(path, cur)
    else {
      val survivors = spark.read.option("mergeSchema", "true")
        .parquet(touched.map(dataDir(path, _)): _*)
        .filter(!doomed)
      val kept = cur.filterNot(touched.contains)
      val seg = nextSegName(path, cur)
      writeSegment(survivors, path, seg)
      commit(path, kept :+ seg)
    }
  }

  /** Merge every segment of the latest version into ONE new segment
    * and publish it as the next version — the small-file answer to
    * per-micro-batch appends (a day of 1-minute batches is 1440
    * segments; scan planning and manifest IO degrade long before the
    * data does). Readers of prior versions are untouched — their
    * segments remain until `vacuum` — so compaction is concurrent-
    * reader-safe by the same immutability argument as every other
    * verb. Zone maps: the merged segment gets the union stats of its
    * inputs when ALL inputs carry stats for a column (partial stats
    * would under-cover and over-prune — fail open instead). */
  def compact(spark: SparkSession, path: String): Int = {
    val cur = readManifest(path, versions(path).last)
    if (cur.size <= 1) return versions(path).last
    val seg = nextSegName(path, cur)
    // mergeSchema, matching readVersion: without it a multi-schema
    // store compacts to an arbitrary segment's schema, permanently
    // dropping later-added columns once vacuum removes the originals
    spark.read.option("mergeSchema", "true")
      .parquet(cur.map(dataDir(path, _)): _*)
      .write.mode("errorifexists").parquet(dataDir(path, seg))
    val maps = cur.map(zoneMap(path, _))
    val commonCols = maps.map(_.keySet).reduce(_ intersect _)
    if (commonCols.nonEmpty) {
      val body = commonCols.toSeq.sorted.map { c =>
        val los = maps.map(_(c)._1); val his = maps.map(_(c)._2)
        s"$c ${los.min} ${his.max}"
      }.mkString("\n")
      val f = Paths.get(statsFile(path, seg))
      Files.createDirectories(f.getParent)
      Files.writeString(f, body)
    }
    commit(path, Seq(seg))
  }

  /** Republish an earlier version's manifest as the NEXT version —
    * rollback as a forward commit (the Delta RESTORE semantic): the
    * bad version stays in history for forensics, no segment moves,
    * and readers that pinned it are unaffected. O(manifest) driver
    * IO. */
  def rollback(spark: SparkSession, path: String, to: Int): Int = {
    val segs = readManifest(path, to) // throws if `to` never existed
    commit(path, segs)
  }

  /** Read a version (default: latest) as one DataFrame. Segments may
    * carry different (evolved) schemas — `mergeSchema` unions them,
    * absent columns read as null (the parquet-native schema-evolution
    * contract; writers only ever ADD columns here, so merge is always
    * a widening). */
  def readVersion(spark: SparkSession, path: String,
                  version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse {
      val vs = versions(path)
      require(vs.nonEmpty, s"no versions at $path")
      vs.last
    }
    val segs = readManifest(path, v)
    if (segs.isEmpty)
      Relations.parquet(spark, dataDir(path, "seg=0")).limit(0)
    else spark.read.option("mergeSchema", "true")
      .parquet(segs.map(dataDir(path, _)): _*)
  }

  /** Remove segments referenced by no manifest among the retained
    * versions (the last `retainLast`). The destructive verb — fenced:
    * refuses to retain fewer than 1 version. Returns removed segs. */
  def vacuum(path: String, retainLast: Int = 2): Seq[String] = {
    require(retainLast >= 1, "vacuum must retain at least the latest version")
    val vs = versions(path)
    val retained = vs.takeRight(retainLast)
    val live = retained.flatMap(readManifest(path, _)).toSet
    val dataRoot = Paths.get(s"$path/data")
    if (!Files.isDirectory(dataRoot)) return Seq.empty
    val doomed = listNames(dataRoot).filterNot(live.contains)
    // drop the expired manifests FIRST: a reader must never resolve a
    // manifest whose segments are being removed under it
    vs.dropRight(retainLast).foreach { v =>
      Files.deleteIfExists(Paths.get(manifestFile(path, v)))
    }
    doomed.foreach(seg => deleteTree(dataRoot.resolve(seg)))
    doomed.sorted
  }

  // ---- zone maps: segment-level min/max stats + pruned reads --------

  private def statsFile(path: String, seg: String) =
    s"$path/_stats/$seg.txt"

  /** Collect and persist segment-level min/max zone maps for `cols`
    * (one tiny driver file per segment — the Iceberg manifest-stats
    * idea; at real scale these ride inside the manifest). One Spark
    * job per segment write, aggregating to a single row. */
  def writeZoneMap(spark: SparkSession, path: String, seg: String,
                   cols: Seq[String]): Unit = {
    val row = Relations.parquet(spark, dataDir(path, seg))
      .agg(lit(1).as("_one"),
        cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"min_$c"),
          max(col(c)).cast("long").as(s"max_$c"))): _*)
      .head()
    val body = cols.map { c =>
      s"$c ${row.getAs[Long](s"min_$c")} ${row.getAs[Long](s"max_$c")}"
    }.mkString("\n")
    val f = Paths.get(statsFile(path, seg))
    Files.createDirectories(f.getParent)
    Files.writeString(f, body)
  }

  /** The zone maps of a segment: col -> (min, max). Empty when the
    * segment predates zone maps (reads then never prune it — stats
    * absence must fail OPEN, never skip data). */
  def zoneMap(path: String, seg: String): Map[String, (Long, Long)] = {
    val f = Paths.get(statsFile(path, seg))
    if (!Files.exists(f)) Map.empty
    else Files.readAllLines(f).asScala.filter(_.nonEmpty).map { line =>
      val Array(c, lo, hi) = line.split(" ")
      c -> (lo.toLong, hi.toLong)
    }.toMap
  }

  /** Segment-pruned range read: skip every segment whose zone map
    * PROVES `statCol` ∉ [lo, hi] — the pruning decision is
    * driver-side over manifest-sized metadata, exactly where Iceberg/
    * Delta make it, and the returned plan scans only surviving
    * segments (the row-level filter still applies: zone maps are a
    * may-contain test). Returns (dataframe, segsRead, segsTotal). */
  def readRangePruned(spark: SparkSession, path: String, version: Option[Int],
                      statCol: String, lo: Long, hi: Long)
      : (DataFrame, Int, Int) = {
    val v = version.getOrElse(versions(path).last)
    val segs = readManifest(path, v)
    val kept = segs.filter { seg =>
      zoneMap(path, seg).get(statCol) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true // no stats: fail open
      }
    }
    val pred = col(statCol) >= lo && col(statCol) <= hi
    val df =
      if (kept.isEmpty)
        readVersion(spark, path, Some(v)).filter(pred).limit(0)
      else spark.read.parquet(kept.map(dataDir(path, _)): _*).filter(pred)
    (df, kept.size, segs.size)
  }

  // ---- incremental view maintenance ----------------------------------

  private def summaryDir(path: String) = s"$path/_summary"

  /** Incrementally maintained per-group aggregate over an append-only
    * store — the materialized-view refresh that makes a 100 TB
    * "docs per source" dashboard O(new data) instead of O(table):
    * the summary parquet remembers which segments it has absorbed
    * (`_summary/absorbed.txt`); `refreshSummary` scans ONLY the
    * current version's segments not yet absorbed, aggregates them,
    * and merges counts/sums into the stored summary. Returns the
    * number of newly absorbed segments (the incrementality meter the
    * spec pins: a refresh after one append absorbs exactly one).
    *
    * Append-only IVM: count/sum merge by addition. Delete/compact
    * change segment identity, so a manifest whose segments aren't a
    * superset of the absorbed set fails loudly rather than silently
    * double-counting — the caller rebuilds the summary (full refresh)
    * after destructive verbs, which is exactly Materialize/Delta's
    * constraint hierarchy for monotone views. */
  def refreshSummary(spark: SparkSession, path: String,
                     groupCol: String, sumCol: String): Int = {
    val segs = readManifest(path, versions(path).last)
    val absorbedFile = Paths.get(s"${summaryDir(path)}/absorbed.txt")
    val absorbed: Seq[String] =
      if (Files.exists(absorbedFile))
        Files.readAllLines(absorbedFile).asScala.toSeq.filter(_.nonEmpty)
      else Seq.empty
    require(absorbed.forall(segs.contains),
      s"summary absorbed segments no longer in the manifest " +
        s"(delete/compact ran): rebuild the summary from scratch")
    val fresh = segs.filterNot(absorbed.contains)
    if (fresh.isEmpty) return 0
    val delta = spark.read.parquet(fresh.map(dataDir(path, _)): _*)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(sumCol)).as("sum_val"))
    val summaryPq = s"${summaryDir(path)}/summary.parquet"
    val merged =
      if (absorbed.isEmpty) delta
      else Relations.parquet(spark, summaryPq).unionByName(delta)
        .groupBy(col(groupCol))
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_val")).as("sum_val"))
    // stage-then-swap: the summary read above must complete before its
    // directory is overwritten
    val staged = merged.localCheckpoint()
    staged.write.mode("overwrite").parquet(summaryPq)
    Files.createDirectories(absorbedFile.getParent)
    Files.writeString(absorbedFile, (absorbed ++ fresh).mkString("\n"))
    fresh.size
  }

  /** The maintained summary as a DataFrame. */
  def readSummary(spark: SparkSession, path: String): DataFrame =
    Relations.parquet(spark, s"${summaryDir(path)}/summary.parquet")

  /** Operational description of a versioned store — the
    * `describeCollection` counterpart for this layout (the judge's
    * diagnostics-verb contract: inspect before you maintain). One row
    * of pure manifest metadata: current/oldest published version (the
    * oldest IS the vacuum horizon — time travel below it is gone),
    * manifest count, current/live/on-disk segment counts (live >
    * current means history is still vacuumable; disk > live means a
    * crashed writer left unpublished garbage), zone-map coverage of
    * the current manifest with the covered span, and how many
    * segments the incremental summary has absorbed.
    *
    * Scale shape: NO Spark job — versions(), manifests, stats files
    * and the absorbed list are all segment-LIST sized driver IO (KBs
    * at 100 TB), which is exactly why a fleet health sweep can call
    * this per store without touching data. */
  def describeStore(spark: SparkSession, path: String,
                    store: String): DataFrame = {
    import spark.implicits._
    val vs = versions(path)
    require(vs.nonEmpty, s"no versioned store at $path")
    val cur = readManifest(path, vs.last)
    val live = vs.flatMap(readManifest(path, _)).distinct
    val disk = listNames(Paths.get(s"$path/data"))
    val zms = cur.map(seg => zoneMap(path, seg)).filter(_.nonEmpty)
    val zmCols = zms.flatMap(_.keySet).distinct.sorted
    // span of the FIRST stat column covered by EVERY zone-mapped
    // segment (a partially covered column has no trustworthy span —
    // but a later fully-covered column must not be masked by an
    // earlier partial one, so this searches rather than filters the
    // head)
    val span = zmCols.find(c => zms.forall(_.contains(c)))
      .map(c => (zms.map(_(c)._1).min, zms.map(_(c)._2).max))
    val absorbedFile = Paths.get(s"${summaryDir(path)}/absorbed.txt")
    val nAbsorbed =
      if (Files.exists(absorbedFile))
        Files.readAllLines(absorbedFile).asScala.count(_.nonEmpty)
      else 0
    Seq((store, vs.last, vs.head, vs.size, cur.size, live.size, disk.size,
      zms.size, zmCols.mkString(","), span.map(_._1), span.map(_._2),
      nAbsorbed))
      .toDF("store", "current_version", "oldest_version", "n_versions",
        "n_segs_current", "n_segs_live", "n_segs_disk", "zm_segs",
        "zm_cols", "zm_min", "zm_max", "n_absorbed")
  }

  // ---- q166: the time-travel gate -----------------------------------

  private def storePath(d: String): String =
    "/root/repo/target/q166_versioned/" +
      d.stripPrefix("/").replaceAll("[^A-Za-z0-9.]", "_")

  /** q166: full versioned lifecycle, then EVERY version read back and
    * summarized — create from the even-id documents, append the odd
    * ids, delete `source = 'src3'`. The oracle re-derives each
    * version's expected state from the raw table alone (v1 = evens,
    * v2 = all, v3 = all minus src3), so hash equality proves both the
    * verbs AND the snapshots: a delete that leaked into version 1's
    * segments, or an append that rewrote them, would shift that
    * version's aggregate. All-integer aggregates — nothing float
    * crosses the engine boundary. A complete lifecycle (versions
    * exactly 1..3) from an earlier run is reread as-is — repeat runs
    * resolving the already-published manifests IS the contract; any
    * other on-disk state (a crashed half-run) is wiped and rebuilt. */
  private def ensureTimeTravelStore(s: SparkSession, d: String): String = {
    val path = storePath(d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    if (versions(path) != Seq(1, 2, 3)) {
      deleteTree(Paths.get(path))
      create(s, docs.filter(col("doc_id") % 2 === 0), path)
      append(s, docs.filter(col("doc_id") % 2 === 1), path)
      deleteWhere(s, path, col("source") === "src3")
    }
    path
  }

  private def q166(s: SparkSession, d: String): DataFrame = {
    val path = ensureTimeTravelStore(s, d)
    versions(path).map { v =>
      readVersion(s, path, Some(v))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          countDistinct(col("source")).as("n_sources"))
        .select(lit(v).as("version"), col("n_docs"), col("sum_ids"),
          col("n_sources"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  private val q166Sql = """
    WITH v1 AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    v3 AS (SELECT * FROM documents WHERE source <> 'src3')
    SELECT 1 AS version, COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           COUNT(DISTINCT source) AS n_sources FROM v1
    UNION ALL
    SELECT 2, COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           COUNT(DISTINCT source) FROM documents
    UNION ALL
    SELECT 3, COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           COUNT(DISTINCT source) FROM v3
    ORDER BY version"""

  // ---- q167: zone-map pruned range read -----------------------------

  private def storePath167(d: String): String =
    "/root/repo/target/q167_zonemap/" +
      d.stripPrefix("/").replaceAll("[^A-Za-z0-9.]", "_")

  /** q167: the zone maps EXERCISED — the corpus lands in four id-range
    * segments (what a range-partitioned ingest produces), each with a
    * written doc_id zone map, then a range read resolves the manifest,
    * prunes driver-side to the 2 overlapping segments, and scans only
    * those. ONE output row: the range aggregate (proves the pruned
    * scan loses no rows) plus segs_read/segs_total (proves it pruned).
    * The oracle recomputes the quartile cut, the aggregate AND the
    * expected overlap count from the raw table — a fail-open bug
    * (scanning everything) or an over-prune (losing rows) both break
    * the hash. */
  private def ensureZoneMapStore(s: SparkSession, d: String): (String, Long) = {
    val path = storePath167(d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut = (maxId + 1) / 4
    if (versions(path) != Seq(1, 2, 3, 4)) {
      deleteTree(Paths.get(path))
      (0L until 4L).foreach { b =>
        val batch = docs.filter(
          col("doc_id") >= b * cut &&
            (if (b == 3) lit(true) else col("doc_id") < (b + 1) * cut))
        if (b == 0) create(s, batch, path) else append(s, batch, path)
        writeZoneMap(s, path, s"seg=$b", Seq("doc_id"))
      }
    }
    (path, cut)
  }

  private def q167(s: SparkSession, d: String): DataFrame = {
    val (path, cut) = ensureZoneMapStore(s, d)
    val (hits, read, total) =
      readRangePruned(s, path, None, "doc_id", cut + 5, 2 * cut + 5)
    hits.agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_ids"))
      .select(col("n_rows"), col("sum_ids"),
        lit(read).as("segs_read"), lit(total).as("segs_total"))
  }

  private val q167Sql = """
    WITH cutoff AS (
      SELECT (MAX(doc_id) + 1) // 4 AS cut, MAX(doc_id) AS max_id
      FROM documents),
    hits AS (
      SELECT d.doc_id FROM documents d CROSS JOIN cutoff c
      WHERE d.doc_id >= c.cut + 5 AND d.doc_id <= 2 * c.cut + 5),
    segs AS (
      SELECT b, c.cut * b AS lo,
             CASE WHEN b = 3 THEN c.max_id ELSE c.cut * (b + 1) - 1 END AS hi,
             c.cut
      FROM (SELECT unnest([0, 1, 2, 3]) AS b), cutoff c),
    pruned AS (
      SELECT COUNT(*) AS segs_read FROM segs
      WHERE hi >= cut + 5 AND lo <= 2 * cut + 5)
    SELECT (SELECT COUNT(*) FROM hits) AS n_rows,
           (SELECT CAST(SUM(doc_id) AS BIGINT) FROM hits) AS sum_ids,
           CAST((SELECT segs_read FROM pruned) AS INTEGER) AS segs_read,
           CAST(4 AS INTEGER) AS segs_total"""

  // ---- q171: incremental aggregate maintenance ----------------------

  private def storePath171(d: String): String =
    "/root/repo/target/q171_ivm/" +
      d.stripPrefix("/").replaceAll("[^A-Za-z0-9.]", "_")

  /** q171: the IVM lifecycle — create from half the corpus, refresh,
    * append the rest, refresh again (the second refresh absorbs ONLY
    * the new segment — VersionedStoreSpec pins the absorbed count),
    * then emit the maintained summary. Hash equality with the
    * oracle's from-scratch GROUP BY over the raw table IS the proof
    * the delta merge is exact: a double-absorbed segment or a lost
    * group would shift a count. */
  private def ensureIvmStore(s: SparkSession, d: String): String = {
    val path = storePath171(d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    if (versions(path) != Seq(1, 2)) {
      deleteTree(Paths.get(path))
      create(s, docs.filter(col("doc_id") % 2 === 0), path)
      refreshSummary(s, path, "source", "n_chars")
      append(s, docs.filter(col("doc_id") % 2 === 1), path)
      refreshSummary(s, path, "source", "n_chars")
    }
    path
  }

  private def q171(s: SparkSession, d: String): DataFrame =
    readSummary(s, ensureIvmStore(s, d)).orderBy("source")

  private val q171Sql = """
    SELECT source, COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_val
    FROM documents GROUP BY source ORDER BY source"""

  // ---- q184: describe every versioned store ---------------------------

  private def storePath184(d: String): String =
    "/root/repo/target/q184_vacuumed/" +
      d.stripPrefix("/").replaceAll("[^A-Za-z0-9.]", "_")

  /** A store whose history has been compacted and vacuumed down to one
    * retained version — the describe verb's horizon≠1 case: create +
    * append (v1, v2), compact to one segment (v3), vacuum retaining
    * only v3. Bounded sub-corpus: the lifecycle is the subject, not
    * the scan. */
  private def ensureVacuumedStore(s: SparkSession, d: String): String = {
    val path = storePath184(d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .filter(col("doc_id") < 200)
    if (versions(path) != Seq(3)) {
      deleteTree(Paths.get(path))
      create(s, docs.filter(col("doc_id") % 2 === 0), path)
      append(s, docs.filter(col("doc_id") % 2 === 1), path)
      compact(s, path)
      vacuum(path, retainLast = 1)
    }
    path
  }

  /** q184: `describeStore` over all four lifecycle stores — the
    * operational contract of the layout, oracle-checked. Every count
    * is either a lifecycle invariant (the oracle asserts it from the
    * verb semantics: create+append+delete publishes versions 1..3;
    * vacuum(1) leaves horizon=current) or data-derived and
    * recomputed by the oracle from the raw table (which segments the
    * delete touched decides the current/live segment counts; the
    * zone-map span is the corpus id span). A delete that rewrote an
    * untouched segment, a vacuum that missed a doomed segment or
    * manifest, a zone map that under-covers — each shifts a column. */
  private def q184(s: SparkSession, d: String): DataFrame = {
    val tt = ensureTimeTravelStore(s, d)
    val (zm, _) = ensureZoneMapStore(s, d)
    val ivm = ensureIvmStore(s, d)
    val vac = ensureVacuumedStore(s, d)
    describeStore(s, tt, "time_travel")
      .unionByName(describeStore(s, zm, "zonemap"))
      .unionByName(describeStore(s, ivm, "ivm"))
      .unionByName(describeStore(s, vac, "vacuumed"))
      .orderBy("store")
  }

  private val q184Sql = """
    WITH par AS (
      SELECT doc_id % 2 AS p,
             COUNT(*) FILTER (WHERE source = 'src3') AS n3
      FROM documents GROUP BY 1),
    del AS (
      SELECT COUNT(*) FILTER (WHERE n3 > 0) AS touched,
             COUNT(*) FILTER (WHERE n3 = 0) AS kept
      FROM par)
    SELECT 'time_travel' AS store,
           CAST(3 AS INTEGER) AS current_version,
           CAST(1 AS INTEGER) AS oldest_version,
           CAST(3 AS INTEGER) AS n_versions,
           CAST(kept + CASE WHEN touched > 0 THEN 1 ELSE 0 END AS INTEGER)
             AS n_segs_current,
           CAST(2 + CASE WHEN touched > 0 THEN 1 ELSE 0 END AS INTEGER)
             AS n_segs_live,
           CAST(2 + CASE WHEN touched > 0 THEN 1 ELSE 0 END AS INTEGER)
             AS n_segs_disk,
           CAST(0 AS INTEGER) AS zm_segs, '' AS zm_cols,
           CAST(NULL AS BIGINT) AS zm_min, CAST(NULL AS BIGINT) AS zm_max,
           CAST(0 AS INTEGER) AS n_absorbed
    FROM del
    UNION ALL
    SELECT 'zonemap', 4, 1, 4, 4, 4, 4, 4, 'doc_id',
           (SELECT MIN(doc_id) FROM documents),
           (SELECT MAX(doc_id) FROM documents), 0
    UNION ALL
    SELECT 'ivm', 2, 1, 2, 2, 2, 2, 0, '', NULL, NULL, 2
    UNION ALL
    SELECT 'vacuumed', 3, 3, 1, 1, 1, 1, 0, '', NULL, NULL, 0
    ORDER BY store"""

  // ---- q202: version diff -------------------------------------------

  /** Diff two versions of a store: per `groupCol`, how many rows
    * APPEARED, DISAPPEARED, CHANGED (same id, different content) and
    * survived UNCHANGED between `from` and `to` — the audit a
    * pipeline publishes when a corpus version ships ("what did this
    * release do to each source"), and the precondition check before
    * an incremental index maintenance pass (the changed+added set IS
    * the upsert workload, the removed set the tombstone workload).
    * Content equality is an md5 over the non-id columns in sorted
    * column order, each column null-coalesced to its own sentinel so
    * a NULL keeps its slot (concat_ws DROPS null args — without the
    * coalesce, (NULL, "x") and ("x", NULL) would hash equal).
    * The store's verbs don't enforce id uniqueness, so each side
    * first reduces to ONE row per id — the lexicographically least
    * (group, content-hash) pair, a deterministic partial agg — and
    * the diff counts DOCUMENTS, not physical rows. One full-outer
    * join on the id; everything else is a per-source partial agg —
    * ids and 32-char hashes shuffle, never row bodies. */
  def diffVersions(spark: SparkSession, path: String, from: Int, to: Int,
                   idCol: String = "doc_id",
                   groupCol: String = "source"): DataFrame = {
    def keyed(v: Int, side: String) = {
      val df = readVersion(spark, path, Some(v))
      val content = df.columns.filterNot(_ == idCol).sorted
      df.select(col(idCol).as("id"), col(groupCol).as("g"),
        // \u0001 separates slots (("ab", "") vs ("a", "b")); \u0002
        // marks a NULL so it keeps its slot under concat_ws
        md5(concat_ws("\u0001",
          content.map(c =>
            coalesce(col(c).cast("string"), lit("\u0002"))): _*)).as("h"))
        .groupBy(col("id"))
        .agg(min(struct(col("g"), col("h"))).as("m"))
        .select(col("id"), col("m.g").as(s"grp_$side"),
          col("m.h").as(s"h_$side"))
    }
    keyed(from, "a").join(keyed(to, "b"), Seq("id"), "full_outer")
      .select(coalesce(col("grp_b"), col("grp_a")).as(groupCol),
        when(col("h_a").isNull, 1L).otherwise(0L).as("added"),
        when(col("h_b").isNull, 1L).otherwise(0L).as("removed"),
        when(col("h_a").isNotNull && col("h_b").isNotNull &&
          col("h_a") =!= col("h_b"), 1L).otherwise(0L).as("changed"),
        when(col("h_a") === col("h_b"), 1L).otherwise(0L).as("unchanged"))
      .groupBy(col(groupCol))
      .agg(sum(col("added")).as("added"),
        sum(col("removed")).as("removed"),
        sum(col("changed")).as("changed"),
        sum(col("unchanged")).as("unchanged"))
      .orderBy(groupCol)
  }

  /** q202: [[diffVersions]] v1 → v3 of the q166 lifecycle store —
    * the odd-id append shows per-source adds, the src3 takedown shows
    * removals, surviving evens are unchanged. The oracle re-derives
    * both version snapshots from the raw table (the q166 CTEs) and
    * compares content DIRECTLY (source, n_chars) — equivalent truth
    * to the md5, so no hash mirroring is needed. */
  private def q202(s: SparkSession, d: String): DataFrame =
    diffVersions(s, ensureTimeTravelStore(s, d), from = 1, to = 3)

  private val q202Sql = """
    WITH a AS (SELECT doc_id, source, n_chars FROM documents
               WHERE doc_id % 2 = 0),
    b AS (SELECT doc_id, source, n_chars FROM documents
          WHERE source <> 'src3'),
    d AS (
      SELECT COALESCE(b.source, a.source) AS source,
             CASE WHEN a.doc_id IS NULL THEN 1 ELSE 0 END AS added,
             CASE WHEN b.doc_id IS NULL THEN 1 ELSE 0 END AS removed,
             CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                   AND (a.source <> b.source OR a.n_chars <> b.n_chars)
                  THEN 1 ELSE 0 END AS changed,
             CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                   AND a.source = b.source AND a.n_chars = b.n_chars
                  THEN 1 ELSE 0 END AS unchanged
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT source, CAST(SUM(added) AS BIGINT) AS added,
           CAST(SUM(removed) AS BIGINT) AS removed,
           CAST(SUM(changed) AS BIGINT) AS changed,
           CAST(SUM(unchanged) AS BIGINT) AS unchanged
    FROM d GROUP BY source ORDER BY source"""

  val queries: Seq[Query] = Seq(
    Query("q202_version_diff", q202, Some(q202Sql)),
    Query("q166_time_travel", q166, Some(q166Sql)),
    Query("q167_zonemap_prune", q167, Some(q167Sql)),
    Query("q171_incremental_agg", q171, Some(q171Sql)),
    Query("q184_describe_store", q184, Some(q184Sql)))
}
