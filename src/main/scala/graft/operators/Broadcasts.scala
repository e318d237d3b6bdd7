package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Guarded broadcast — `broadcast()` below a row cap, the plain frame
  * (shuffle join) above it, behind one documented door.
  *
  * Why: a `broadcast()` hint is unconditional — Catalyst ships the whole
  * side to the driver and every executor regardless of size, so a hint
  * on a frame whose size is DATA-dependent (a predicate's matching-node
  * set, an unbounded ingest batch) is a driver OOM waiting for the first
  * non-selective predicate or oversized batch at 100 TB. The guard prices
  * the decision: the caller supplies the frame's known row count (cheap —
  * the call sites either already count the frame or count a
  * materialized checkpoint) and the cap the deployment tolerates;
  * above the cap the join falls back to Spark's shuffle strategies,
  * which are exactly right for a big side.
  *
  * The two paths are row-equal by construction (a broadcast hint never
  * changes join semantics) — spec-pinned in BroadcastGuardSpec by
  * running the call sites at cap 0 (forced shuffle) and default cap.
  */
private[graft] object Broadcasts {

  /** Default cap: 4M rows. An id-only long column at 4M rows is ~32 MB
    * serialized — comfortably inside a 1 GiB driver heap slice and the
    * 8 GB torrent-block limit, while anything past it (a non-selective
    * predicate over a 10^9-row corpus) must shuffle. */
  val DefaultCap: Long = 4L * 1000 * 1000

  def upTo(df: DataFrame, rows: Long, cap: Long = DefaultCap): DataFrame =
    if (rows <= cap) broadcast(df) else df
}
