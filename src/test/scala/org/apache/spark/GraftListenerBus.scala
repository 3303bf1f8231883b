package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: the status
  * tracker is fed asynchronously, so a job that just finished may not be
  * visible to `getJobIdsForGroup` yet. Draining the bus first makes the
  * PlanGuardSpec pre-action count deterministic.
  */
object GraftListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
