package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.util.SerializableConfiguration

/**
 * Serializable carrier for the SESSION-layered Hadoop configuration, so
 * executor-side Hadoop FS users (the sharded vector exports) see the
 * same settings as the built-in sources: `sessionState.newHadoopConf()`
 * overlays runtime `spark.conf.set("fs.s3a...")` / per-session
 * `spark.hadoop.*` values on the context configuration, which a bare
 * `sparkContext.hadoopConfiguration` would miss. `SerializableConfiguration`
 * and `sessionState` are `private[spark]`/`private[sql]`, hence this
 * doorway lives in an `org.apache.spark` package like [[VecExprs]].
 */
final class HadoopConfBroadcast private[graft] (
    private val b: Broadcast[SerializableConfiguration]) extends Serializable {
  def value: Configuration = b.value.value
}

object HadoopConfBroadcast {
  /** The session-layered Hadoop configuration (what built-in file sources
    * resolve paths against). */
  def sessionConf(spark: org.apache.spark.sql.SparkSession): Configuration =
    spark.asInstanceOf[SparkSession].sessionState.newHadoopConf()

  /** Broadcast the session-layered configuration once per export. */
  def apply(spark: org.apache.spark.sql.SparkSession): HadoopConfBroadcast =
    new HadoopConfBroadcast(SerializableConfiguration.broadcast(
      spark.sparkContext, sessionConf(spark)))
}
