package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed (pre-partitioned) table layout: the co-located-join story at
 * 100 TB. Both join sides are written `bucketBy(N, key)` + sorted within
 * buckets, so the per-key shuffle is paid ONCE at write time; every
 * subsequent equi-join on the bucket key plans as a sort-merge join with
 * NO exchange on either side (asserted in PlanSpec) — the difference
 * between re-shuffling a fact table per query and never shuffling it
 * again. The reference has no table layout at all (in-RAM numpy); this is
 * the Spark-native analogue of its "load once, query many" shape.
 */
object Bucketed {

  final val NumBuckets = 8

  /** Layout-version stamp baked into the on-disk path AND the table name:
    * the metadata-only re-attach below re-declares the bucket spec over
    * pre-existing files, so files written under an older spec (different
    * NumBuckets / sort spec / schema) must never be attachable under a
    * newer DDL — rows would sit in buckets the catalog doesn't claim and
    * the exchange-free sort-merge join would silently return wrong
    * results. Bump on ANY change to NumBuckets, the sort columns, or the
    * written schema (same discipline as Ivf.IndexVersion). */
  final val LayoutVersion = 1

  /** Write orders+customer bucketed by custkey under the tmp warehouse
    * and register them in the session catalog. The bucketed FILES are
    * written once per sf-dir (the one-time shuffle this layout exists to
    * amortize); a new session with an in-memory catalog re-attaches the
    * existing files with a metadata-only CREATE TABLE, so repeat sessions
    * never pay the write again. Returns the table names. */
  def ensureTables(spark: SparkSession, sfDir: String): (String, String) = {
    val safe = s"_v${LayoutVersion}b$NumBuckets" +
      sfDir.replaceAll("[^A-Za-z0-9_]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft_buckets$safe"
    val ot = s"graft_orders_bkt$safe"
    val ct = s"graft_customer_bkt$safe"
    // source version (max file mtime) in the DIRECTORY name: published
    // bucket layouts are immutable, so fresh == exists and two processes
    // racing the one-time write can never interleave overwrite jobs into
    // the same dir (each builds a scratch dir and atomically renames)
    def ver(p: String): Long = {
      val f = new java.io.File(p)
      val fs = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      (f.lastModified +: fs.map(_.lastModified)).max
    }
    ensure(spark, ot, s"$base/orders_v${ver(s"$sfDir/orders.parquet")}",
      "o_custkey", graft.Tables.orders(spark, sfDir))
    ensure(spark, ct, s"$base/customer_v${ver(s"$sfDir/customer.parquet")}",
      "c_custkey", graft.Tables.customer(spark, sfDir))
    (ot, ct)
  }

  private def ensure(spark: SparkSession, tbl: String, path: String,
                     key: String, src: => DataFrame): Unit =
    synchronized {
      import java.nio.file.{Files, Paths}
      if (spark.catalog.tableExists(tbl)) return
      val dst = Paths.get(path)
      Files.createDirectories(dst.getParent)
      if (!Files.exists(dst.resolve("_SUCCESS"))) {
        // build the bucketed files under a scratch EXTERNAL table, drop
        // the table (external: files stay), and publish the file set with
        // one atomic rename; losing a cross-process race just discards
        // byte-identical work
        val tmp = Files.createTempDirectory(dst.getParent, "bkt-")
        val tmpTbl = s"${tbl}_build"
        spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")
        src.write.mode("overwrite").option("path", tmp.toString)
          .bucketBy(NumBuckets, key).sortBy(key)
          .format("parquet").saveAsTable(tmpTbl)
        spark.sql(s"DROP TABLE $tmpTbl")
        try Files.move(tmp, dst)
        catch { case _: java.nio.file.FileSystemException =>
          VecFiles.deleteRecursively(tmp) }
        require(Files.exists(dst.resolve("_SUCCESS")),
          s"bucketed layout publish failed: $dst")
      }
      // attach the published files metadata-only (bucketed CREATE TABLE
      // requires an explicit column list — read it off the files; bucket
      // spec re-declared to match what the writer produced)
      val cols = spark.read.parquet(path).schema.toDDL
      spark.sql(s"CREATE TABLE $tbl ($cols) USING parquet " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
        s"LOCATION '$path'")
    }

  /** Orders-per-segment revenue over the bucketed layout. The `merge`
    * hint keeps the small side out of a broadcast so the plan
    * demonstrates the exchange-free bucketed sort-merge join (values are
    * layout-independent — the oracle runs the plain join). */
  def segmentRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val (ot, ct) = ensureTables(spark, sfDir)
    val cents = (c: org.apache.spark.sql.Column) => round(c * 100).cast("long")
    spark.table(ot).hint("merge")
      .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
  }
}
