package graft

import graft.queries.ExtensionQueries

/** The Sizing-gated keyless-window decompositions (r17): q273's doc-order
  * cumsums and q274's top-15 token ranking keep the lazy single-window
  * plan at gate scale and switch to the bucket-decomposed / two-phase
  * form past the fan-out threshold. The gate must be value-neutral: the
  * decomposed plan's ranks, running sums and top-k set equal the lazy
  * plan's exactly, row for row, on the same input.
  */
class ScaleWindowGateSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[String] =
    ExtensionQueries.defs(q)(spark, d).collect()
      .map(_.toString).toIndexedSeq

  private def plan(q: String): String =
    ExtensionQueries.defs(q)(spark, d)
      .queryExecution.optimizedPlan.toString

  test("q273/q274: gate-scale plans keep the lazy single window") {
    // default threshold (256 MB) — sf0.001 inputs are far below it
    assert(!plan("q273_heaps_law").contains("_bkt"),
      "gate-scale q273 must not decompose (committed bench baseline)")
    assert(!plan("q274_burrows_delta").contains("_srn"),
      "gate-scale q274 must not pre-rank in sub-buckets")
  }

  private def whRows(q: String): Seq[String] =
    graft.queries.WarehouseQueries.defs(q)(spark, d).collect()
      .map(_.toString).toIndexedSeq

  test("q273/q274: the decomposed at-scale plan is value-identical") {
    val lazyQ273 = rows("q273_heaps_law")
    val lazyQ274 = rows("q274_burrows_delta")
    sys.props("graft.fanout.ckpt.bytes") = "0" // force the at-scale form
    try {
      assert(plan("q273_heaps_law").contains("_bkt"),
        "forced-low threshold must decompose q273")
      assert(plan("q274_burrows_delta").contains("_srn"),
        "forced-low threshold must two-phase q274")
      assert(rows("q273_heaps_law") == lazyQ273,
        "q273 decomposed ranks/cumsums must equal the lazy window's")
      assert(rows("q274_burrows_delta") == lazyQ274,
        "q274 two-phase top-15 must equal the global window's")
    } finally sys.props -= "graft.fanout.ckpt.bytes"
  }

  test("q330: the range-decomposed cumulative share is value-identical") {
    val lazyQ330 = whRows("q330_abc_xyz")
    sys.props("graft.fanout.ckpt.bytes") = "0"
    try
      assert(whRows("q330_abc_xyz") == lazyQ330,
        "q330 range-partitioned cum-share must equal the global window's")
    finally sys.props -= "graft.fanout.ckpt.bytes"
  }

  test("q218: the range-decomposed ABC share is value-identical") {
    val lazyQ218 = whRows("q218_abc_analysis")
    sys.props("graft.fanout.ckpt.bytes") = "0"
    try
      assert(whRows("q218_abc_analysis") == lazyQ218,
        "q218 range-partitioned cum-share must equal the global window's")
    finally sys.props -= "graft.fanout.ckpt.bytes"
  }

  private def anyPlan(q: String): String =
    graft.SparkEntry.queries(q)(spark, d)
      .queryExecution.optimizedPlan.toString

  private def anyRows(q: String): Seq[String] =
    graft.SparkEntry.queries(q)(spark, d).collect()
      .map(_.toString).toIndexedSeq

  // the gatedCensusCumsum class: q224 rides rankedCensus keyless ("all"),
  // q181 rides it keyed (c_mktsegment), q142/q262/q263/q137 are inline
  // censuses, q253 is the double global row_number, q22 the global ntile
  private val censusQs = Seq("q224_lorenz_curve", "q142_equidepth_hist",
    "q262_mann_whitney", "q181_percentile_cont", "q263_kruskal_wallis",
    "q137_gini", "q253_rank_footrule", "q22_ntile_frames",
    "q143_ks_test", "q288_anderson_darling", "q292_cpk",
    "q326_hill_tail", "q325_wilcoxon_signed_rank", "q327_mood_median",
    "q318_jonckheere", "q155_quantile_norm")

  test("census cumsums: gate-scale plans keep the lazy window") {
    for (q <- censusQs :+ "q220_bigram_coverage")
      assert(!anyPlan(q).contains("_gpid")
          && !anyPlan(q).contains("_srn"),
        s"$q gate-scale census cumsum must not range-decompose " +
          "(committed bench baseline)")
  }

  test("census cumsums: the range-decomposed form is value-identical") {
    val lazyRows = censusQs.map(q => q -> anyRows(q)).toMap
    sys.props("graft.fanout.ckpt.bytes") = "0"
    try censusQs.foreach { q =>
      assert(anyPlan(q).contains("_gpid"),
        s"forced-low threshold must range-decompose $q")
      assert(anyRows(q) == lazyRows(q),
        s"$q decomposed census cumsum must equal the lazy window's")
    } finally sys.props -= "graft.fanout.ckpt.bytes"
  }

  test("q220: the two-phase top-100 coverage is value-identical") {
    val lazyQ220 = anyRows("q220_bigram_coverage")
    sys.props("graft.fanout.ckpt.bytes") = "0"
    try {
      assert(anyPlan("q220_bigram_coverage").contains("_srn"),
        "forced-low threshold must two-phase q220's ranking")
      assert(anyRows("q220_bigram_coverage") == lazyQ220,
        "q220 two-phase top-100 coverage must equal the global window's")
    } finally sys.props -= "graft.fanout.ckpt.bytes"
  }
}
