package graft

/** The repo's one concurrent-memoize idiom, shared by `Tables` and
  * `Scratch.dirFor`. get/putIfAbsent rather than computeIfAbsent: a
  * mapping function that touches the same map (memoized frames derived
  * from other memoized frames) throws "Recursive update" under
  * computeIfAbsent; with get/putIfAbsent an occasional racing
  * double-compute is harmless and the first insert wins.
  */
object Memo {
  def getOrPut[K, V](map: java.util.concurrent.ConcurrentHashMap[K, V], key: K)
                    (mk: => V): V = {
    val cached = map.get(key)
    if (cached != null) cached
    else {
      val v = mk
      val prev = map.putIfAbsent(key, v)
      if (prev != null) prev else v
    }
  }
}
