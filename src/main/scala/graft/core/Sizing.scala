package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Size-aware persist policy for frames a fan-out re-reads (the pipeline's
  * normalized/repaired caches).
  *
  * At gate scale the columnar in-memory default (`MEMORY_AND_DISK`) is
  * fastest. Above [[spillBytes]] the cached batches compete with the
  * executor heap for the whole run — the 60M-row repair probe spent >25%
  * of wall in GC (medians 22–28 s/rep) with the heap-resident cache — so
  * large frames go `DISK_ONLY`: the SAME RDD partitioning (FastFill's
  * assumeSorted layout contract survives, unlike a parquet round-trip,
  * whose file splits lose the global partition order), but the serialized
  * batches live in spark.local.dir (page-cache-backed scratch) instead of
  * the heap.
  */
object Sizing {

  /** Catalyst's "don't know" sentinel region: a LogicalRDD lineage (the
    * InternalRow bridge) reports defaultSizeInBytes ≈ Long.MaxValue;
    * anything this large is a missing estimate, not a measurement.
    */
  private val UnknownFloor = BigInt(1L) << 50

  /** Spill threshold: a quarter of the JVM heap (local mode runs driver
    * and executors in one JVM), overridable via GRAFT_MAT_SPILL_BYTES.
    * Two large frames are live at once in the pipeline (normalized +
    * repaired), so together they stay under half the heap.
    */
  def spillBytes: Long = sys.props.get("graft.mat.spill.bytes")
    .orElse(sys.env.get("GRAFT_MAT_SPILL_BYTES")).map(_.toLong)
    .getOrElse(Runtime.getRuntime.maxMemory / 4)

  /** Optimizer size estimate; None when Catalyst has no real number. */
  def planEstimate(df: DataFrame): Option[Long] = {
    val s = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (s >= UnknownFloor || s < 0) None else Some(s.toLong)
  }

  /** Storage level for a frame of (estimated) `estBytes`: spill past the
    * threshold, default otherwise — including when the estimate is
    * missing, because every gate-scale caller must keep today's in-memory
    * behavior (a false spill is a constant-factor read regression on
    * every query; a false keep degrades exactly the huge-frame case the
    * caller should be passing a hint for).
    */
  def storageFor(estBytes: Option[Long]): StorageLevel = estBytes match {
    case Some(b) if b > spillBytes => StorageLevel.DISK_ONLY
    case _ => StorageLevel.MEMORY_AND_DISK
  }
}
