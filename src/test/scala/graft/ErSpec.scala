package graft

import org.apache.spark.sql.functions._
import graft.ext.EntityResolution

/** Entity resolution: blocking recall, comparator boundaries, and the
  * group-size quality arithmetic (EntityResolution.scala). */
class ErSpec extends SparkSpec {

  private lazy val resolved = EntityResolution.resolved(spark, sf001)
    .persist()

  test("format noise resolves: every billing record joins its " +
    "registry twin") {
    // bill perturbs FORMAT only ('acct ' prefix + zero strip) — the
    // normalized names are identical, so a bill record left as a
    // singleton would mean normalization itself is broken.
    val lonelyBills = resolved.where(col("src") === "bill")
      .join(resolved.where(col("src") === "reg")
          .select(col("true_key"), col("cluster_id").as("reg_cl")),
        Seq("true_key"))
      .where(col("cluster_id") =!= col("reg_cl"))
      .count()
    assert(lonelyBills === 0L)
  }

  test("within-decade numeric typo matches; decade-crossing typo is " +
    "a measured recall miss") {
    // crm's off-by-one typo: custkey 42 → '43' sits at edit distance
    // 1 from '42' (same decade) and MUST match. custkey 9 → '10' is
    // edit distance 2 from '9' — below no threshold we ship, so it
    // must stay unmatched; the quality row, not silent luck, is
    // where that loss shows up.
    val cl = resolved.select(col("rec_id"), col("cluster_id"))
    def clusterOf(recId: Long): Long =
      cl.where(col("rec_id") === recId).collect()(0).getLong(1)
    assert(clusterOf(42L * 4 + 1) === clusterOf(42L * 4))
    assert(clusterOf(9L * 4 + 1) !== clusterOf(9L * 4))
  }

  test("quality row: C(n,2) identities hold and both losses are real") {
    val q = EntityResolution.qualityRow(resolved).collect()(0)
    val (pred, truth, tp) =
      (q.getLong(2), q.getLong(3), q.getLong(4))
    assert(tp <= pred && tp <= truth)
    assert(tp > 0L)
    // decade-crossing typos guarantee recall < 1; off-by-one typos
    // landing on a neighboring customer's number with matching
    // (nation, segment) guarantee precision < 1 on any non-trivial sf
    assert(q.getLong(6) < 10000L, "recall should be < 1")
    assert(q.getLong(5) < 10000L, "precision should be < 1")
  }

  test("blocking passes stay under the cap and candidates are deduped") {
    val norm = EntityResolution.normalized(
      EntityResolution.records(spark, sf001))
    val cands = EntityResolution.candidatePairs(norm)
    assert(cands.count() === cands.distinct().count())
    // coarse pass width is 100 numvals: expected block size is
    // corpus-density × 100 / segments — constant in sf, comfortably
    // under the cap on the test corpus
    assert(cands.count() > 0L)
  }

  test("survivorship: registry record is canonical whenever present") {
    val audit = EntityResolution.clusterAudit(resolved)
    val bad = audit.where(col("n_reg") > 0 &&
      !col("canonical_name").startsWith("Customer#")).count()
    assert(bad === 0L)
  }
}
