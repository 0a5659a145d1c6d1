package graft.sources

import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared metadata-aggregate pushdown for the three connectors: the
  * translate / answer / schema logic for the aggregates a connector's
  * METADATA resolves exactly — `count(*)`, `count(key)`, `min(key)`,
  * `max(key)` over a single long key column, no grouping. One
  * implementation so a semantics fix (e.g. the zero-row-segment
  * min/max guard) can't silently diverge between graft-log,
  * graft-table and graft-offset2. */
private[sources] object MetaAgg {

  sealed trait Kind extends Serializable
  case object CountAll extends Kind
  case object MinKey extends Kind
  case object MaxKey extends Kind

  /** Translate `agg` against `key`; `keyUnique` admits
    * `count(distinct key)` (== count when the key is unique — log
    * seqs; table `_ver` repeats so it must refuse). None = something
    * metadata can't answer → caller plans the normal scan. */
  def translate(
      agg: Aggregation,
      key: String,
      keyUnique: Boolean
  ): Option[Seq[Kind]] = {
    def keyRef(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference => r.fieldNames.sameElements(Array(key))
        case _ => false
      }
    if (agg.groupByExpressions.nonEmpty) return None
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => CountAll
      case c: Count if keyRef(c.column) && (!c.isDistinct || keyUnique) =>
        CountAll // key is non-null (and unique when distinct)
      case m: Min if keyRef(m.column) => MinKey
      case m: Max if keyRef(m.column) => MaxKey
      case _ => return None
    }
    Some(kinds)
  }

  /** Build the one-row aggregate scan from the metadata answers.
    * `min`/`max` must already exclude anything no row carries (e.g.
    * zero-row segments); both are ignored when `count == 0` (SQL:
    * min/max over empty input are NULL). */
  def scan(
      label: String,
      kinds: Seq[Kind],
      count: Long,
      min: => Long,
      max: => Long
  ): GraftLogAggScan = {
    val row = kinds.map {
      case CountAll => java.lang.Long.valueOf(count)
      case MinKey => if (count == 0) null else java.lang.Long.valueOf(min)
      case MaxKey => if (count == 0) null else java.lang.Long.valueOf(max)
    }
    val fields = kinds.zipWithIndex.map {
      case (CountAll, i) => StructField(s"count_$i", LongType, nullable = false)
      case (MinKey, i) => StructField(s"min_$i", LongType, nullable = true)
      case (MaxKey, i) => StructField(s"max_$i", LongType, nullable = true)
    }
    new GraftLogAggScan(label, StructType(fields), row)
  }
}
