package graft.storage

/** Kill-point seam for the committer write paths — the fault-injection
  * counterpart of the reference's corruption-recovery tests
  * (reference: offset2/rw_test.go:148-191 TestRecover, which truncates
  * files on disk and reopens). Those tests CONSTRUCT crash states;
  * this seam lets a test INTERRUPT a real append/rewrite/compact after
  * any individual side-effect step (tmp spill written, segment file
  * moved, manifest tmp written, commit done but old files not yet
  * swept) and then reopen, proving the recovery contract holds at
  * every boundary an OS crash could expose, not just the ones we
  * thought to build by hand.
  *
  * Production cost: one volatile read + a no-op lambda call per
  * OPERATION step (never per row). The hook must only be installed
  * from tests; the write paths treat a hook throw exactly like any
  * other I/O failure at that point.
  */
object FaultPoints {
  @volatile private var hook: String => Unit = _ => ()

  /** Fired by the write paths at each named side-effect boundary. */
  private[graft] def reach(point: String): Unit = hook(point)

  /** Install a test hook; it receives each reached point name and
    * simulates a crash by throwing. `private[graft]` makes the
    * tests-only contract structural: production code outside the graft
    * package cannot install a throwing hook. The single global slot
    * additionally assumes suites run sequentially (the default; do not
    * enable forked-parallel test execution). */
  private[graft] def install(h: String => Unit): Unit =
    hook = if (h == null) (_ => ()) else h

  private[graft] def clear(): Unit = hook = _ => ()
}
