package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IndexStore

/** Collection fork (chroma `collection.fork`): independent copies,
  * byte-level isolation, sidecars included. */
class ForkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  /** md5 of every regular file under `root`, keyed by relative path —
    * the byte-identity fingerprint of a layout. */
  private def fingerprint(root: String): Map[String, String] = {
    val base = Paths.get(root)
    val walk = Files.walk(base)
    try
      walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map { p: Path =>
          val rel = base.relativize(p).toString
          val md = MessageDigest.getInstance("MD5")
          rel -> md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
        }.toMap
    finally walk.close()
  }

  private def rmIfExists(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  test("fork copies the whole layout incl. sidecars; mutating the fork " +
       "leaves the original byte-identical") {
    val orig = "/root/repo/target/test_fork_orig"
    val fork = "/root/repo/target/test_fork_copy"
    rmIfExists(orig); rmIfExists(fork)
    val docs = Tables.documents(spark, d).limit(40)
    IndexStore.buildIvf(spark, docs, orig, nCells = 4)
    val before = fingerprint(orig)
    IndexStore.forkCollection(spark, orig, fork)
    // the trained quantizer sidecar rides along — the fork serves
    // searches immediately
    assert(Files.exists(Paths.get(s"$fork/_centroids")))
    val r = IndexStore.searchTopKIvf(spark, fork, "alpha", k = 3,
      probes = 2, overfetch = 8).collect()
    assert(r.length == 3)
    // delete half the docs from the FORK only
    val doomed = spark.read.parquet(fork)
      .filter(col("doc_id") % 2 === 0)
      .select("chunk_id").collect().map(_.getString(0)).toSeq
    // the wrong-family verb fails loudly instead of corrupting the
    // cell-partitioned layout with source= directories
    intercept[IllegalArgumentException] {
      IndexStore.deleteIds(spark, fork, doomed)
    }
    IndexStore.deleteIdsIvf(spark, fork, doomed)
    assert(spark.read.parquet(fork)
      .filter(col("doc_id") % 2 === 0).count() == 0,
      "fork must drop the deleted docs")
    assert(fingerprint(orig) == before,
      "the original layout must be byte-identical after mutating the fork")
    assert(spark.read.parquet(orig)
      .filter(col("doc_id") % 2 === 0).count() > 0,
      "the original keeps the rows the fork deleted")
  }

  test("fork refuses a missing source or an existing destination") {
    val orig = "/root/repo/target/test_fork_orig" // exists from the test above
    intercept[IllegalArgumentException] {
      IndexStore.forkCollection(spark, "/root/repo/target/no_such_coll",
        "/root/repo/target/test_fork_x")
    }
    intercept[IllegalArgumentException] {
      IndexStore.forkCollection(spark, orig, orig)
    }
  }
}
