package graft.functions

import org.apache.spark.sql.SparkSession

/** Shared conf plumbing for the candidate-mass pre-flight guards
  * (banded SimHash, fixed-nlist IVF, MinHash LSH, PPJoin prefix —
  * one budget key + one mode key each).
  *
  * Centralized so a malformed budget value fails NAMED: a bare
  * `s.toLong` surfaces as a raw NumberFormatException with no hint of
  * which conf key carried the bad value — and inside simHashPairs'
  * catch-unpersist-rethrow path it was indistinguishable from a
  * genuine guard refusal (r18 ADVICE). */
private[graft] object GuardConf {
  /** Parse the long budget at `key` (default when unset/blank). A
    * malformed value throws IllegalArgumentException naming the key and
    * the offending text — never a bare NumberFormatException. */
  def budget(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.get(key, "").trim match {
      case "" => default
      case s =>
        val v =
          try s.toLong
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"$key must be a long candidate budget, got '$s'")
          }
        // a zero/negative budget would make every guarded operator refuse
        // unconditionally with a message blaming the corpus — fail NAMED
        // at the conf value instead (r19 ADVICE)
        require(v > 0, s"$key must be a positive candidate budget, got '$s'")
        v
    }

  /** Guard mode at `key`: `enforce` (default) | `warn` | `off`; any
    * other value fails named rather than silently enforcing. */
  def mode(spark: SparkSession, key: String): String = {
    val m = spark.conf.get(key, "enforce")
    require(m == "enforce" || m == "warn" || m == "off",
      s"$key must be one of enforce|warn|off, got '$m'")
    m
  }
}
