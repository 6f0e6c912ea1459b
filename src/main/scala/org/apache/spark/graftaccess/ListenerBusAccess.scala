package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Single-purpose bridge into the `private[spark]` listener bus:
  * `graft.exec.SparkMetrics` must drain pending events before reading
  * its totals (listener delivery is async), and `waitUntilEmpty` is
  * the supported way Spark's own tests do it. Nothing else of the
  * internal API is exposed.
  */
object ListenerBusAccess {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
