package graft.indexes

import org.apache.spark.sql.DataFrame

/** The index-layer contract (reference: indexes/index.go:27-70),
  * backend-independent — the reference runs its sink-index suites over
  * a registry of KV backends (in-memory map, mkv, badger;
  * indexes/test/registry.go:9-47), and this trait is what that matrix
  * instantiates here: [[KVIndex]] (TableStore/parquet — durable,
  * cluster-scale) and [[MemKV]] (driver-memory — the `mapidx` twin for
  * fast conformance runs).
  *
  * Watch semantics are part of the contract: `watch(addr)(cb)` fires
  * immediately with the current state and after every committed write
  * to that addr, `None` = unset (the reference's UnsetValue).
  */
trait KV {

  /** Upsert batch `(addr, value[, tombstone][, useq])`; `useq` orders
    * within the batch, commit order across batches. */
  def applyBatch(df: DataFrame): Unit

  def set(addr: String, value: String): Unit
  def delete(addr: String): Unit

  /** Point read; None = unset. */
  def get(addr: String): Option[String]

  /** Materialized last-write-wins snapshot `(addr, value)`. */
  def current: DataFrame

  /** Register a per-key observer; cancel the returned watcher to
    * deregister. */
  def watch(addr: String)(cb: Option[String] => Unit): KV.Watcher

  /** Persisted resume cursor (SetSeq/GetSeq). */
  def setSeq(seq: Long): Unit
  def getSeq: Long

  /** Fold the change history into its compacted snapshot. */
  def compact(): Unit

  // ---- shared watcher machinery -----------------------------------
  protected val watcherReg =
    scala.collection.concurrent.TrieMap.empty[String, List[KV.Watcher]]

  // Delivery discipline: callbacks NEVER run under the index monitor.
  // A callback that (directly or via another thread it waits on)
  // touches the index would otherwise deadlock against a writer
  // holding the monitor. Instead, each commit takes a TICKET while
  // still inside the monitor (so tickets are in commit order) and
  // invokes the callbacks outside it, serialized in ticket order — so
  // watchers still observe commits in the order they happened.
  private val deliveryMonitor = new Object
  private val ticketCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private var nextTicketToDeliver = 0L
  // non-null while THIS thread is inside a delivery: a watcher
  // callback that writes back into the index (legal — the old
  // reentrant-synchronized delivery allowed it) parks its nested
  // deliveries here instead of waiting on its own ticket, which
  // would self-deadlock (the outer delivery can't finish while the
  // callback is blocked inside the nested one)
  private val pendingNested =
    new ThreadLocal[java.util.ArrayDeque[(Long, Seq[(KV.Watcher, Option[String])])]]
  // tickets abandoned by an INTERRUPTED waiter: an InterruptedException
  // out of deliveryMonitor.wait() used to leave the ticket undelivered
  // and nextTicketToDeliver stuck below it — every later delivery on
  // the index then stalled forever. Abandoned tickets are skipped by
  // the advance walk instead; the interrupted watcher misses that one
  // notification (the commit itself is already durable).
  private val abandonedTickets = scala.collection.mutable.Set.empty[Long]

  // advance past `from` plus any consecutively-abandoned successors;
  // MUST be called while holding deliveryMonitor
  private def advanceLocked(from: Long): Unit = {
    nextTicketToDeliver = from + 1
    while (abandonedTickets.remove(nextTicketToDeliver))
      nextTicketToDeliver += 1
    deliveryMonitor.notifyAll()
  }

  private def abandonTicket(t: Long): Unit = deliveryMonitor.synchronized {
    if (t == nextTicketToDeliver) advanceLocked(t)
    else if (t > nextTicketToDeliver) abandonedTickets += t
    // t < nextTicketToDeliver: already delivered — nothing to skip
  }

  /** Take a delivery ticket — MUST be called while holding the index
    * monitor (ticket order = commit order), and MUST be the LAST
    * fallible step before the monitor is released: a ticket taken and
    * never passed to [[deliverOrdered]] stalls every later delivery. */
  protected def takeDeliveryTicket(): Long = ticketCounter.getAndIncrement()

  /** Invoke the queued deliveries for `ticket`, outside the index
    * monitor, in strict ticket order. Reentrant-safe: called from
    * inside a callback (same thread), the nested deliveries are
    * queued and drained — still in ticket order — right after the
    * outer delivery completes. */
  protected def deliverOrdered(
      ticket: Long,
      deliveries: Seq[(KV.Watcher, Option[String])]
  ): Unit = {
    val nested = pendingNested.get()
    if (nested != null) { nested.add(ticket -> deliveries); return }
    deliveryMonitor.synchronized {
      try while (ticket != nextTicketToDeliver) deliveryMonitor.wait()
      catch {
        case ie: InterruptedException =>
          // abandon the ticket (advancing past it if it is current) so
          // later deliveries don't stall, then propagate the interrupt
          if (ticket == nextTicketToDeliver) advanceLocked(ticket)
          else abandonedTickets += ticket
          throw ie
      }
    }
    val mine =
      new java.util.ArrayDeque[(Long, Seq[(KV.Watcher, Option[String])])]
    pendingNested.set(mine)
    try deliveries.foreach { case (w, v) => w.deliver(v) }
    finally {
      pendingNested.remove()
      deliveryMonitor.synchronized(advanceLocked(ticket))
      // commits the callbacks made on this thread: already durable, so
      // deliver them now as ordinary (no-longer-reentrant) deliveries.
      // FIFO = ticket order for this thread; other threads' tickets
      // interleave correctly because each drain waits its turn.
      while (!mine.isEmpty) {
        val (t, ds) = mine.poll()
        try deliverOrdered(t, ds)
        catch {
          case ie: InterruptedException =>
            // the rest of this thread's nested tickets would stall
            // later deliveries if left queued — abandon them too
            while (!mine.isEmpty) abandonTicket(mine.poll()._1)
            throw ie
        }
      }
    }
  }

  protected def registerWatcher(
      addr: String,
      cb: Option[String] => Unit
  ): KV.Watcher = {
    val w = new KV.Watcher(addr, this, cb)
    // the initial snapshot is read INSIDE the monitor (atomic with the
    // registration point, so no commit can slip between them) but
    // delivered outside it like every other delivery
    val (ticket, snap) = synchronized {
      watcherReg.updateWith(addr) {
        case Some(ws) => Some(w :: ws)
        case None     => Some(List(w))
      }
      // snapshot read BEFORE the ticket: if get() throws (a Spark read
      // can), no ticket is orphaned — an orphaned ticket would stall
      // every later delivery forever
      val snap = get(addr)
      (takeDeliveryTicket(), snap)
    }
    deliverOrdered(ticket, Seq(w -> snap))
    w
  }

  private[indexes] def unregister(w: KV.Watcher): Unit = synchronized {
    watcherReg.updateWith(w.addr) {
      case Some(ws) =>
        val rest = ws.filterNot(_ eq w)
        if (rest.isEmpty) None else Some(rest) // empty lists GC'd
      case None => None
    }
    (): Unit
  }
}

object KV {

  /** Handle for one registered per-key observer; cancel() deregisters
    * (the reference's watcher GC, obv.go:38-51). */
  final class Watcher private[indexes] (
      val addr: String,
      idx: KV,
      cb: Option[String] => Unit
  ) {
    @volatile private var active = true
    private[indexes] def deliver(v: Option[String]): Unit =
      if (active) cb(v)
    def cancel(): Unit = {
      active = false
      idx.unregister(this)
    }
  }
}
