package graft.operators

/** md5 hex of a cache key, for deriving on-disk memo paths and table
  * names. ONE shared definition: every per-JVM memo (minhash/simhash/
  * ngram/winnow index tables, IVF/PQ artifacts, z-ordered copies,
  * bucketed tables) must key its directory on the FULL cache key — a
  * 32-bit `hashCode` name lets two distinct keys collide and silently
  * share (and overwrite) one artifact.
  */
private[graft] object KeyDigest {
  def apply(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
}
