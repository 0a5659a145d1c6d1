package graft.core

/** The reference's complete query algebra, re-expressed as a Scala ADT.
  *
  * Mirrors the 8-method `QuerySpec` interface of ssbc/margaret
  * (reference: qry.go:10-32, combinators qry.go:59-113) including its
  * validation semantics:
  *   - lower bound may be set only once (offset2/qry.go:35-51)
  *   - upper bound may be set only once (offset2/qry.go:53-69)
  *   - `Reverse` + `Live` is rejected (offset2/log.go:418-420)
  *
  * Folding a list of specs produces a [[QueryPlan]] — the engine's tiny
  * "logical plan" that the query layer lowers onto a Spark DataFrame
  * pipeline (filter → sort → limit → project), letting Catalyst do
  * predicate pushdown / limit short-circuit / top-k for free.
  */
sealed trait QuerySpec extends Product with Serializable

object QuerySpec {
  /** Entries with seq strictly greater than `seq`. */
  final case class Gt(seq: Long) extends QuerySpec
  /** Entries with seq greater than or equal to `seq`. */
  final case class Gte(seq: Long) extends QuerySpec
  /** Entries with seq strictly less than `seq`. */
  final case class Lt(seq: Long) extends QuerySpec
  /** Entries with seq less than or equal to `seq`. */
  final case class Lte(seq: Long) extends QuerySpec
  /** At most `n` entries; -1 = unlimited (offset2/qry.go:71-74). */
  final case class Limit(n: Long) extends QuerySpec
  /** Iterate from the tail downward (offset2/qry.go:86-99). */
  final case class Reverse(yes: Boolean) extends QuerySpec
  /** Keep following appends after the backlog is drained. */
  final case class Live(yes: Boolean) extends QuerySpec
  /** Emit (seq, value) pairs instead of bare values. */
  final case class SeqWrap(yes: Boolean) extends QuerySpec
}

/** Errors surfaced by query construction / reads, mirroring the
  * reference's error identities (log.go:52-56, seq.go:7-20). */
object GraftErrors {
  final case class InvalidQuery(msg: String)
      extends IllegalArgumentException(msg)
  /** Reading a redacted entry by point lookup (offset2/log.go:364-367). */
  final case class ErrNulled(seq: Long)
      extends RuntimeException(s"margaret: Entry Nulled (seq=$seq)")
  /** Point read past the end of the log. */
  final case class ErrOutOfBounds(seq: Long)
      extends RuntimeException(s"out of bounds (seq=$seq)")
  /** Operation on a deleted sublog (multilog/roaring/sublog.go:47-49). */
  final case class ErrSublogDeleted(addr: String)
      extends RuntimeException(s"sublog deleted (addr=$addr)")
}

/** Sequence-number sentinels (reference: seq.go:7-20). */
object Seqs {
  val SeqEmpty: Long = -1L
  val SeqErrored: Long = -2L
  val SeqSublogDeleted: Long = -255L
}

/** The folded form of a spec list — bounds resolved to a half-open
  * cursor range exactly as offset2 does (start = first seq to read,
  * ltExclusive = first seq NOT to read). */
final case class QueryPlan(
    lower: Option[Long] = None, // inclusive start cursor
    upper: Option[Long] = None, // exclusive end cursor
    limit: Long = -1L,
    reverse: Boolean = false,
    live: Boolean = false,
    seqWrap: Boolean = false
)

object QueryPlan {
  import QuerySpec._
  import GraftErrors.InvalidQuery

  /** Fold specs with the reference's single-set validation. */
  def fromSpecs(specs: Seq[QuerySpec]): Either[InvalidQuery, QueryPlan] = {
    val init: Either[InvalidQuery, QueryPlan] = Right(QueryPlan())
    val folded = specs.foldLeft(init) { (acc, spec) =>
      acc.flatMap { p =>
        spec match {
          case Gt(s) =>
            if (p.lower.isDefined)
              Left(InvalidQuery("lower bound already set"))
            else
              // saturate: Gt(Long.MaxValue) means "nothing", not a
              // wrapped Long.MinValue bound selecting everything
              Right(p.copy(lower =
                Some(if (s == Long.MaxValue) Long.MaxValue else s + 1)))
          case Gte(s) =>
            if (p.lower.isDefined)
              Left(InvalidQuery("lower bound already set"))
            else Right(p.copy(lower = Some(s)))
          case Lt(s) =>
            if (p.upper.isDefined)
              Left(InvalidQuery("upper bound already set"))
            else Right(p.copy(upper = Some(s)))
          case Lte(s) =>
            if (p.upper.isDefined)
              Left(InvalidQuery("upper bound already set"))
            else
              // saturate: Lte(Long.MaxValue) means "no upper limit",
              // not a wrapped Long.MinValue bound selecting nothing
              Right(p.copy(upper =
                Some(if (s == Long.MaxValue) Long.MaxValue else s + 1)))
          case Limit(n)     => Right(p.copy(limit = n))
          case Reverse(yes) => Right(p.copy(reverse = yes))
          case Live(yes)    => Right(p.copy(live = yes))
          case SeqWrap(yes) => Right(p.copy(seqWrap = yes))
        }
      }
    }
    folded.flatMap { p =>
      if (p.reverse && p.live)
        Left(InvalidQuery("can't do reverse and live"))
      else Right(p)
    }
  }

  /** Throwing variant for the public API. */
  def of(specs: QuerySpec*): QueryPlan =
    fromSpecs(specs).fold(throw _, identity)
}
