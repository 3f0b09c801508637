package graft.sources

/** Collision-free key for /tmp staging paths derived from a source
  * dir. `String.hashCode` is 32-bit and collides easily (classic
  * "Aa"/"BB" family), which would let two distinct corpus dirs
  * silently share scratch space — an MD5 prefix cannot. */
object StagePath {
  def key(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
}
