package graft.plans

import org.apache.spark.{Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, AttributeReference, Descending, ExprId, SortOrder
}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, Sort
}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{
  SortExec, SparkPlan, SparkStrategy, UnaryExecNode
}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.sources.GraftLogScan

/** Planner strategy: a GLOBAL sort by `seq` over a graft-log scan is
  * a no-op (ascending) or a partition reversal (descending) — never a
  * shuffle.
  *
  * The connector plans one partition per packed run of adjacent
  * segments, in ascending seq order, disjoint in seq range, each
  * internally seq-sorted (segments are written
  * `sortWithinPartitions(seq)`; packing preserves manifest order).
  * So the scan's output already IS the global ascending order under
  * Spark's partition-index contract (collect/limit/write consume
  * partitions in index order), and Spark's default plan for
  * `orderBy(seq)` — a RangePartitioning Exchange plus per-partition
  * sort, i.e. a full-log shuffle at 100 TB — does pure redundant
  * work. The reference gets the same property from its offset file:
  * a log IS its seq order (offset2/qry.go:86-99 walks it directly).
  *
  * The strategy fires only on trees it can prove order-preserving:
  * `Sort(seq)` over any chain of Project/Filter (narrow, 1:1
  * partition-preserving) over a single graft-log DSv2 relation, with
  * the sort key resolving (through aliases) to the scan's own `seq`
  * attribute. Everything else falls through to Spark's planner.
  * Top-N (`orderBy(seq).limit(n)`) never reaches here — the scan
  * builder's [[graft.sources.GraftLogScanBuilder.pushTopN]] folds it
  * into seq bounds at pushdown time.
  *
  *   - ascending: the Sort is DROPPED — [[SeqOrderedDrainExec]] just
  *     passes the child through, declaring `outputOrdering` so a
  *     downstream merge join doesn't re-sort.
  *   - descending: partition INDEX order is reversed (a zero-copy RDD
  *     remap, [[ReversePartitionsExec]]) and each partition is
  *     locally sorted desc (spillable [[SortExec]], no Exchange) —
  *     global descending order without moving a row between
  *     executors.
  */
object OrderedLogScan extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Sort(Seq(so @ SortOrder(attr: AttributeReference, direction, _, _)),
          true, child, _) if seqOfLogScan(attr.exprId, child) =>
      direction match {
        case Ascending =>
          SeqOrderedDrainExec(planLater(child), so) :: Nil
        case Descending =>
          SortExec(so :: Nil, global = false,
            child = ReversePartitionsExec(planLater(child))) :: Nil
      }
    case _ => Nil
  }

  /** Does `id` resolve to the `seq` output of a single ascending
    * graft-log scan under an order-preserving Project/Filter chain? */
  private def seqOfLogScan(id: ExprId, plan: LogicalPlan): Boolean =
    plan match {
      case r: DataSourceV2ScanRelation =>
        r.scan match {
          // a descending (top-N-cut) scan is already ordered; don't
          // stack passthroughs on a shape pushdown owns
          case s: GraftLogScan if !s.isDescending =>
            r.output.exists(a => a.exprId == id && a.name == "seq")
          case _ => false
        }
      case f: Filter => seqOfLogScan(id, f.child)
      case p: Project =>
        p.projectList.find(_.exprId == id) match {
          case Some(a: AttributeReference) => seqOfLogScan(id, p.child)
          case Some(al: Alias) =>
            al.child match {
              case ar: AttributeReference => seqOfLogScan(ar.exprId, p.child)
              case _ => false
            }
          case _ => false
        }
      case _ => false
    }

  /** Idempotently install the strategy into a session's experimental
    * strategies — the runtime path for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions`.
    * [[graft.storage.ParquetLog.open]] calls this, so any session
    * that opens an engine log plans ordered drains shuffle-free; the
    * strategy is a pure physical-plan optimization (rewritten plans
    * are row-for-row identical), additive and session-scoped.
    *
    * The read-modify-write on `extraStrategies` is synchronized:
    * concurrent `ParquetLog.open` calls on one session would otherwise
    * race the check-then-act (duplicate installs are harmless, but a
    * concurrent unrelated strategy assignment could be lost). */
  def install(spark: SparkSession): Unit = OrderedLogScan.synchronized {
    if (!spark.experimental.extraStrategies.contains(OrderedLogScan))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ OrderedLogScan
  }
}

/** Ascending ordered drain: pass the child through unchanged, but
  * declare its (true) per-partition ordering so downstream operators
  * don't re-sort. The global ordering across partition indexes is a
  * property of the connector's partition planning, carried implicitly
  * exactly as Spark's own global Sort carries it (RangePartitioning +
  * partition index). */
final case class SeqOrderedDrainExec(child: SparkPlan, order: SortOrder)
    extends UnaryExecNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    child.output
  override def outputOrdering: Seq[SortOrder] = order :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Reverse the PARTITION INDEX order of the child — no rows move, no
  * buffering: partition i of this node is partition (n-1-i) of the
  * child. Within-partition row order is untouched (still seq asc), so
  * a local descending sort above completes the global reverse. */
final case class ReversePartitionsExec(child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    new ReversedPartitionsRDD(child.execute())
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

private final class ReversedPartition(val index: Int, val parent: Partition)
    extends Partition

private final class ReversedPartitionsRDD(prev: RDD[InternalRow])
    extends RDD[InternalRow](
      prev.context,
      // an honest narrow dependency: partition i depends on parent
      // partition n-1-i. (The one-arg RDD ctor would declare
      // OneToOneDependency, and the scheduler's locality walk follows
      // DECLARED dependencies — a mismatch schedules reversed-drain
      // tasks against the wrong parent's blocks on a real cluster.)
      Seq(new org.apache.spark.NarrowDependency[InternalRow](prev) {
        override def getParents(partitionId: Int): Seq[Int] =
          Seq(prev.partitions.length - 1 - partitionId)
      })) {
  override def getPartitions: Array[Partition] = {
    val n = prev.partitions.length
    Array.tabulate[Partition](n)(i =>
      new ReversedPartition(i, prev.partitions(n - 1 - i)))
  }
  override def compute(
      split: Partition,
      context: TaskContext
  ): Iterator[InternalRow] =
    firstParent[InternalRow]
      .iterator(split.asInstanceOf[ReversedPartition].parent, context)
  override def getPreferredLocations(split: Partition): Seq[String] =
    firstParent[InternalRow]
      .preferredLocations(split.asInstanceOf[ReversedPartition].parent)
}
