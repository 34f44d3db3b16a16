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
  * Rejected runs are parked under `bench/runs/` so no measurement is
  * lost — they just never become the record.
  */
object BenchRecord {

  /** The run-level steal_pct of a last_run.json blob. The host block's
    * steal_pct is serialized BEFORE the nested gate block's
    * skipped-attempt entries (Bench.scala writes `"host":{...,
    * "steal_pct":P,...,"gate":{...}}`), so the first match is the
    * run-level figure. None when the blob has no host block (non-Linux
    * record) — treated as replaceable by [[accepts]]. */
  def stealPctOf(json: String): Option[Double] =
    """"steal_pct"\s*:\s*([0-9.eE+-]+)""".r
      .findFirstMatchIn(json)
      .flatMap(m => m.group(1).toDoubleOption)

  /** True iff a candidate run at `candidateStealPct` may overwrite the
    * record whose JSON is `existing` (None = no record yet: always
    * accept). */
  def accepts(existing: Option[String], candidateStealPct: Double): Boolean =
    existing.flatMap(stealPctOf) match {
      case Some(recorded) => candidateStealPct <= math.max(1.0, recorded)
      case None           => true
    }
}
