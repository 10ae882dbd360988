package org.apache.spark

import org.apache.spark.storage.BroadcastBlockId

/** Test-only bridge into `private[spark]` surface: the bloom-bitmap
  * lifecycle test needs to observe the block manager's live broadcast
  * blocks to prove repeated scoring calls stop leaking one broadcast
  * per call. Lives under src/test only — production code never touches
  * Spark internals beyond the documented GraftSqlBridge. */
object GraftTestBridge {
  /** Distinct broadcast ids with at least one live block anywhere. */
  def liveBroadcastIds(sc: SparkContext): Set[Long] =
    sc.env.blockManager.master.getMatchingBlockIds({
      case BroadcastBlockId(_, _) => true
      case _ => false
    }, askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }.toSet
}
