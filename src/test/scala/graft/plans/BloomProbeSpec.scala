package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  test("BloomProbe == mightContainString exactly; no false negatives; stage stays codegen'd") {
    val inserted = (1 to 500).map(i => s"sig-$i")
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.03)
    inserted.foreach(bloom.putString)
    val b = spark.sparkContext.broadcast(bloom)
    try {
      val probeSet = inserted ++ (1 to 500).map(i => s"other-$i")
      val df = probeSet.toDF("sig")
        .select(col("sig"), BloomProbe.mightContain(col("sig"), b).as("hit"))
      val out = df.as[(String, Boolean)].collect().toMap
      // exact agreement with the driver-side probe (false positives and all)
      probeSet.foreach { s =>
        assert(out(s) === bloom.mightContainString(s),
          s"probe diverged from mightContainString on '$s'")
      }
      // a Bloom filter never false-negatives its own insertions
      assert(inserted.forall(out(_)), "false negative on an inserted value")
      // the point of the native expression: the filter stage keeps its
      // whole-stage codegen span (a UDF here would break it). A range
      // scan (not a LocalRelation, which the optimizer folds) shows the
      // real stage shape — and executing it proves doGenCode compiles.
      val ranged = spark.range(1, 400)
        .select(concat(lit("sig-"), col("id")).as("sig"))
        .where(BloomProbe.mightContain(col("sig"), b))
      assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Filter"),
        "bloom-probe filter fell out of whole-stage codegen")
      assert(ranged.count() === 399L, "codegen probe lost inserted values")
    } finally { b.destroy(); () }
  }
}
