// Hosted in the spark.sql package tree for Dataset.ofRows and the
// internal-row utilities (private[sql]).
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.operators.{Refine, TopK}

/**
 * Whole-operator integration of the sequential refinement kernel into
 * Catalyst: a custom logical node, planner strategy, and physical
 * operator (SURVEY §4.3 ladder step (c) — the mapPartitions form in
 * [[graft.operators.RefineKernel]] is step (d); this variant processes
 * the child's InternalRows directly, no Dataset encoder round-trip).
 *
 * The physical node emits each partition's local top-K candidate rows
 * (qid, id, score) after the running-threshold walk; the public API wraps
 * the global partial-merge on top. EXPLAIN shows `RefineKernelExec` as a
 * first-class operator in the plan.
 */
object KernelPlan {

  final case class QueryData(qid: Long, qvec: Array[Float])

  /** Fresh output attributes for one plan instance. */
  def outputAttrsFor(): Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("id", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())

  /** Logical node: refinement kernel over the child vector relation.
    * `output` is a constructor parameter — were it a val, every tree
    * copy during analysis would mint fresh exprIds and orphan upstream
    * references. */
  case class RefineKernelNode(
      child: LogicalPlan,
      queries: Seq[QueryData],
      params: Refine.Params,
      output: Seq[Attribute]) extends UnaryNode {
    // the kernel consumes every child column; without this the column
    // pruner sees no references and projects the child down to nothing
    override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      child.outputSet
    // output attrs are created here, not passed through from the child
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
    override protected def withNewChildInternal(newChild: LogicalPlan): RefineKernelNode =
      copy(child = newChild)
  }

  /** Physical operator: per-partition running-tau walk over InternalRows. */
  case class RefineKernelExec(
      child: SparkPlan,
      outputAttrs: Seq[Attribute],
      queries: Seq[QueryData],
      params: Refine.Params) extends UnaryExecNode {
    override def output: Seq[Attribute] = outputAttrs
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)
    override protected def withNewChildInternal(newChild: SparkPlan): RefineKernelExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.schema
      val idIdx = schema.fieldIndex("id")
      val vecIdx = schema.fieldIndex("vec")
      val rvecIdx = schema.fieldIndex("rvec")
      val deltaIdx = schema.fieldIndex("delta")
      // ship the query matrix once per job via broadcast, not inside
      // every task closure (mirrors the Dataset kernel)
      val bq = sparkContext.broadcast(queries.toArray)
      val p = params
      val outSchema = StructType(Seq(
        StructField("qid", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false)))

      child.execute().mapPartitionsInternal { it =>
        // materialize the partition block once (same block-kernel shape
        // as the reference's in-RAM walk, bounded by partition size)
        val rows = it.map { r =>
          graft.operators.RefineKernel.VecRow(
            r.getLong(idIdx),
            r.getArray(vecIdx).toFloatArray(),
            r.getArray(rvecIdx).toFloatArray(),
            r.getArray(deltaIdx).toFloatArray())
        }.toArray
        val proj = UnsafeProjection.create(outSchema)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
        if (rows.isEmpty) Iterator.empty
        else {
          // one kernel per partition: block decode + norm precompute
          // amortized across the whole query matrix
          val kern = new graft.operators.RefineKernel.PartitionKernel(rows, p)
          bq.value.iterator.flatMap { q =>
            kern.topKFor(q.qid, q.qvec).map { c =>
              row.update(0, c.qid); row.update(1, c.id); row.update(2, c.score)
              proj(row)
            }
          }
        }
      }
    }
  }

  /** Planner strategy turning the logical node into the exec. */
  object KernelStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: RefineKernelNode =>
        RefineKernelExec(planLater(n.child), n.output, n.queries, n.params) :: Nil
      case _ => Nil
    }
  }

  /** Public API: plan the kernel as a first-class operator and merge the
    * per-partition partials into the global top-K. */
  def refineTopK(vectors: DataFrame, queriesDf: DataFrame,
                 p: Refine.Params): DataFrame = {
    val spark = vectors.sparkSession
    if (!spark.experimental.extraStrategies.contains(KernelStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ KernelStrategy
    import spark.implicits._
    // same driver-collect cap as the Dataset kernel (see
    // RefineKernel.MaxQueryRows): the query matrix is broadcast, so an
    // unbounded relation here would be a silent driver OOM
    val qs = graft.operators.RefineKernel.collectQueries(
        queriesDf.select("qid", "qvec"))
      .map(q => QueryData(q.qid, q.qvec)).toSeq
    val node = RefineKernelNode(
      vectors.select("id", "vec", "rvec", "delta").queryExecution.analyzed,
      qs, p, outputAttrsFor())
    val partials = Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
    TopK.aggregate(partials, p.k, ascending = !p.isCos)
  }
}
