package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The ONE definition of the engine's non-cryptographic hash family.
  * Several kernels must agree bit-for-bit on these (the stream side of
  * near-dup detection probes the corpus side's hash space directly, and
  * MinHash signatures are derived from ShingleHashes output), so the
  * constants and the finalizer live here once — an edit can't silently
  * desynchronize two private copies. */
private[functions] object Hashing {

  /** FNV-1a offset basis (the real one, used for BYTE hashing). */
  final val FnvOffset = 0xcbf29ce484222325L
  /** FNV-1a prime — also the polynomial base for rolling/window hashes. */
  final val FnvPrime = 0x100000001b3L
  /** Seed of the window/deletion POLYNOMIAL hashes. Historical value —
    * a decimal truncation of the FNV basis, NOT equal to [[FnvOffset]];
    * it is pinned by every persisted suite replay and by cross-kernel
    * hash-space equality, so it must never silently change. */
  final val PolySeed = 1469598103934665603L

  /** splitmix64 finalizer — full-avalanche mixing. */
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a over UTF-8 bytes, splitmix-finalized; null hashes like the
    * empty string. */
  def fnv1a(t: UTF8String): Long = {
    var h = FnvOffset
    if (t != null) {
      val bytes = t.getBytes
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    }
    mix(h)
  }
}
