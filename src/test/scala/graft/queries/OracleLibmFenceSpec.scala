package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The rounded-log fence, promoted from prose convention to invariant
  * (r11 ask #4): every libm call in a registered DuckDB oracle must be
  * enclosed by a `round(...)` quantization — the discipline
  * q90/q119/q177/q185/q190/q280/q295/q300/q308 follow — or carry a
  * documented exemption below. Why `round` and not `floor`: libm
  * transcendentals carry a 1-ulp license that differs across libm
  * versions and JIT states; `floor` of a scaled libm result cliffs at
  * every integer boundary, so a value landing within 1 ulp of a
  * boundary flips the output bit-for-bit run to run — exactly q198's
  * pre-r10 `floor(ln(f)·1e9)` hash flake, which THIS rule flags
  * (revert-verified: that form has no enclosing `round`). `round` of
  * a micro-scaled value only cliffs at .5-micro boundaries that the
  * fenced families' constants provably sit away from.
  *
  * `sqrt` is exempt wholesale: IEEE-754 requires it correctly rounded
  * (it is arithmetic, not libm), so it is cross-engine stable.
  */
class OracleLibmFenceSpec extends AnyFunSuite {

  /** Queries whose raw (round-less) libm use is deliberate, with the
    * reason the divergence window is acceptable. Every entry must
    * still trip the detector — a stale exemption fails the suite. */
  private val exemptions: Map[String, String] = Map(
    "q90_unigram_logprob" -> ("per-token -ln feeds round(avg(nll), 6) " +
      "at output: the 6-dp output round is the fence; per-row " +
      "quantization would bias the mean"),
    "q119_bigram_logprob" -> "same round(avg, 6) output fence as q90",
    "q128_ccnet_buckets" -> ("q90's nll pipeline; ntile reads the " +
      "round(avg, 6) column, ties broken by doc_id"),
    "q177_dsir_weights" -> ("per-feature ln(lambda) feeds " +
      "round(sum(n*l), 6) at output — one shared lambda table, " +
      "6-dp output fence"),
    "q200_benford_audit" -> ("log10(1+1/d) is one of NINE constants; " +
      "each cell floors n·p·1e6 where n·p sits O(n) away from the " +
      "nearest boundary — documented in the query comment"),
    "q205_stream_benford" -> "q200's verbatim oracle (stream twin)")

  private val token =
    """(?i)(?<![a-zA-Z_0-9])(ln|log|log10|log2|exp|pow|power)\s*\(""".r

  /** True when the match position sits inside an enclosing round(...)
    * call — a backward paren walk, counting close-parens so sibling
    * calls don't fool it. */
  private def fenced(sql: String, pos: Int): Boolean = {
    var depth = 0
    var i = pos - 1
    while (i >= 0) {
      val c = sql.charAt(i)
      if (c == ')') depth += 1
      else if (c == '(') {
        if (depth == 0) {
          var j = i - 1
          while (j >= 0 && (sql.charAt(j).isLetterOrDigit ||
            sql.charAt(j) == '_')) j -= 1
          if (sql.substring(j + 1, i).equalsIgnoreCase("round")) return true
        } else depth -= 1
      }
      i -= 1
    }
    false
  }

  test("every oracle libm call is round-fenced or exempted") {
    val violations = SparkEntry.allQueries.flatMap { q =>
      q.oracle.toSeq.flatMap { sql =>
        token.findAllMatchIn(sql)
          .filterNot(m => fenced(sql, m.start))
          .map(m => q.name -> m.group(1))
      }
    }
    val unexempted = violations.filterNot { case (n, _) =>
      exemptions.contains(n)
    }
    assert(unexempted.isEmpty,
      s"unfenced libm in oracles (add round(...·1e6) quantization or a " +
        s"justified exemption):\n${unexempted.mkString("\n")}")
    // exemptions must stay live: one that no longer trips the detector
    // is stale documentation and must be deleted
    val tripped = violations.map(_._1).toSet
    val stale = exemptions.keySet -- tripped
    assert(stale.isEmpty, s"stale libm exemptions (no raw call left): $stale")
  }
}
