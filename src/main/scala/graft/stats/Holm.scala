package graft.stats

/** Holm step-down (step-down Bonferroni) multiple-comparison adjustment.
  *
  * Reference: `proc multtest ... stepdownbonferroni` per panel
  * (Categorical_Check.sas:435-466, groupComparisons.sas:472-476).
  *
  * Given m raw p-values, sort ascending; adjusted p at sorted position i
  * (1-based) is max over j<=i of min(1, (m-j+1) * p_(j)). Results are
  * returned in the ORIGINAL input order. NaN inputs stay NaN and do not
  * count toward m (matching PROC MULTTEST's treatment of missing p-values).
  */
object Holm {
  def adjust(ps: Seq[Double]): Seq[Double] = {
    val idx = ps.zipWithIndex.filterNot(_._1.isNaN)
    val m = idx.size
    val sorted = idx.sortBy(_._1)
    val out = Array.fill(ps.size)(Double.NaN)
    var runningMax = 0.0
    var j = 1
    for ((p, origIdx) <- sorted) {
      val adj = math.min(1.0, (m - j + 1).toDouble * p)
      runningMax = math.max(runningMax, adj)
      out(origIdx) = runningMax
      j += 1
    }
    out.toSeq
  }
}
