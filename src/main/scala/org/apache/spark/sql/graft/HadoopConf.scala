package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/**
 * Serializable carrier for the session Hadoop configuration, so
 * executor-side Hadoop FS users (the sharded vector exports) see the
 * same `spark.hadoop.*` settings — S3A credentials, filesystem impls,
 * endpoints — as the driver. `SerializableConfiguration` is
 * `private[spark]`, hence this doorway lives in an `org.apache.spark`
 * package like [[VecExprs]]/[[KernelPlan]].
 */
final class HadoopConfBroadcast private[graft] (
    private val b: Broadcast[SerializableConfiguration]) extends Serializable {
  def value: Configuration = b.value.value
}

object HadoopConfBroadcast {
  /** Broadcast the context's Hadoop configuration once per export. */
  def apply(sc: SparkContext): HadoopConfBroadcast =
    new HadoopConfBroadcast(SerializableConfiguration.broadcast(sc))
}
