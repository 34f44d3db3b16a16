package graft.bench

/** Guard on the committed bench record (`bench/last_run.json`): the
  * record may only get CLEANER. Round 13's driver run committed a
  * 4.52%-steal run over a 1.07%-steal record because the write was
  * unconditional — the min-steal discipline lived in the operator's
  * head, not in code (VERDICT r13 ask #1a). The rule: a candidate run
  * may replace the record only when its steal_pct is at or below the
  * CLEAN BAR — max(1.0, recorded steal_pct). The 1.0 floor is the
  * contention gate's own "clean" threshold; without it the record
  * would ratchet monotonically toward 0% and a perfectly clean 0.9%
  * run could never replace a 0.4% one, freezing the record forever.
  * A candidate with NO steal measurement (cpuTicks unavailable) may
  * not replace a measured record either (ADVICE r14: an unmeasured
  * run is not known-clean — the inverse of the guard's intent).
  * Rejected runs are parked under `bench/runs/` so no measurement is
  * lost — they just never become the record.
  */
object BenchRecord {

  /** The run-level steal_pct of a last_run.json blob, anchored to the
    * `"host":{` block (r14 ask #4: a first-match regex depended on the
    * host block serializing before the gate block's skipped-attempt
    * entries — a reordering would silently flip the guard's input).
    * None when the blob has no host block or the block carries no
    * steal_pct (non-Linux record) — treated as replaceable by
    * [[accepts]]. */
  def stealPctOf(json: String): Option[Double] = {
    val at = json.indexOf("\"host\":{")
    if (at < 0) None
    else {
      // Bound the search to the host object's own fields (ADVICE r15):
      // the nested gate block's skipped_attempts carry their own
      // steal_pct entries, so a host block that serialized WITHOUT a
      // run-level steal_pct must read None, not the first nested one.
      val sub = json.substring(at)
      val end = sub.indexOf("\"gate\"") match {
        case -1 => sub.length
        case i  => i
      }
      """"steal_pct"\s*:\s*([0-9.eE+-]+)""".r
        .findFirstMatchIn(sub.substring(0, end))
        .flatMap(m => m.group(1).toDoubleOption)
    }
  }

  /** The run's total seconds (`"value":N` of the top-level metric) —
    * park-message context so a driver reading the rejection line also
    * sees the canonical number (r14 ask #5). */
  def totalOf(json: String): Option[Double] =
    """"metric"\s*:\s*"total"\s*,\s*"value"\s*:\s*([0-9.eE+-]+)""".r
      .findFirstMatchIn(json)
      .flatMap(m => m.group(1).toDoubleOption)

  /** True iff a candidate run whose measured steal is
    * `candidateStealPct` (None = no host measurement) may overwrite
    * the record whose JSON is `existing` (None = no record yet:
    * always accept). */
  def accepts(existing: Option[String],
      candidateStealPct: Option[Double]): Boolean =
    existing match {
      case None => true // no record at all: anything beats nothing
      case Some(rec) => stealPctOf(rec) match {
        case Some(recorded) => candidateStealPct match {
          case Some(cand) => cand <= math.max(1.0, recorded)
          case None       => false // unmeasured never beats measured
        }
        // Record exists but carries no run-level steal (non-Linux
        // write): a MEASURED-dirty candidate still parks — the ratchet
        // stays monotone (ADVICE r16 #3). An unmeasured candidate on
        // the same unmeasured host is accepted, so non-Linux records
        // keep updating.
        case None => candidateStealPct.forall(_ <= 1.0)
      }
    }

  /** Back-compat overload: a measured candidate. */
  def accepts(existing: Option[String], candidateStealPct: Double): Boolean =
    accepts(existing, Some(candidateStealPct))

  /** The guard's park message, carrying the kept record's canonical
    * total + steal alongside the rejection (r14 ask #5) — built here
    * so BenchRecordSpec pins the format. */
  def parkMessage(existing: Option[String],
      candidateStealPct: Option[Double]): String = {
    val cand = candidateStealPct
      .map(p => f"candidate steal $p%.2f%%")
      .getOrElse("candidate has no steal measurement")
    val rec = existing.map { j =>
      val pct = stealPctOf(j).map(p => f"$p%.2f%%").getOrElse("?")
      val tot = totalOf(j).map(t => f"$t%.1f s").getOrElse("?")
      f" — record kept: $tot @ $pct steal"
    }.getOrElse("")
    s"[bench] record guard: $cand exceeds the clean bar$rec" +
      " — parking under bench/runs/"
  }
}
