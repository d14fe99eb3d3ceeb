package org.apache.spark.sql.graftfns

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Session hygiene for repeated short-lived streaming queries in one
  * long-lived JVM (the bench / verify runners execute hundreds of
  * queries per session; each streaming run loads one state-store
  * provider per shuffle partition into the global
  * `StateStore.loadedProviders` registry keyed by its unique temp
  * checkpoint — entries a terminated query only releases when the
  * 60 s maintenance tick gets around to them). Unloading after the
  * query has terminated is pure cleanup: the providers belong to a
  * finished run whose temp checkpoint is already deleted, and the
  * next query loads its own fresh providers regardless. */
object StreamHygiene {
  /** Unload every loaded state-store provider and stop their
    * maintenance work queue (it re-arms lazily on the next streaming
    * query). Callers must only invoke this with NO streaming query
    * active in the session. */
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
