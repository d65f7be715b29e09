package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-checked Morton order)") {
    // 2 cols, 2 bits each, domain [0,4): z(x,y) interleaves x/y bits
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (1.0, 2.0))
      .toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")),
      Seq(0.0, 0.0), Seq(4.0, 4.0), bits = 2).as("z"))
      .as[Long].collect().toSeq
    // norm = floor(v): (0,0)->0, (3,0)->x=3 bits 11 at even positions = 5,
    // (0,3)->y=3 at odd positions = 10, (3,3)->15, (1,2)->x=1 bit0, y=2
    // bit1 -> 1 + 8 = 9
    assert(z === Seq(0L, 5L, 10L, 15L, 9L))
  }

  test("z-order files prune a 2-D box query far better than a linear sort") {
    // two independent dimensions: a full 200x200 grid
    val df = (0 until 40000)
      .map(i => (i.toLong, (i % 200).toDouble, (i / 200).toDouble))
      .toDF("id", "x", "y")
    val dir = Files.createTempDirectory("zorder").toString
    ZOrder.write(df, s"$dir/z", Seq("x", "y"), nFiles = 16)
    // baseline: same file count, sorted on x only
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")

    // per-FILE bounding boxes == what parquet footer stats give a scanner
    def boxes(path: String): Seq[(Double, Double, Double, Double)] = {
      val files = spark.read.parquet(path).inputFiles.toSeq
      assert(files.length === 16)
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
    }
    def touched(bs: Seq[(Double, Double, Double, Double)],
                xLo: Double, xHi: Double, yLo: Double, yHi: Double): Int =
      bs.count { case (mnx, mxx, mny, mxy) =>
        mxx >= xLo && mnx <= xHi && mxy >= yLo && mny <= yHi }
    val zb = boxes(s"$dir/z")
    val lb = boxes(s"$dir/linear")
    // query on the NON-sorted dimension: the x-sorted layout cannot prune
    // at all (every file spans all of y); z-order keeps y bounded per file
    val lY = touched(lb, 0.0, 200.0, 20.0, 40.0)
    val zY = touched(zb, 0.0, 200.0, 20.0, 40.0)
    assert(lY >= 15, s"x-sorted baseline pruned a y-only query: $lY")
    assert(zY * 2 <= lY, s"z-order touched $zY of 16 vs linear $lY")
    // 2-D box: z-order stays at least as prunable as the x-sort
    assert(touched(zb, 20.0, 40.0, 20.0, 40.0)
      <= touched(lb, 20.0, 40.0, 20.0, 40.0) + 1)

    // layout changes bytes, never rows
    assert(spark.read.parquet(s"$dir/z").as[(Long, Double, Double)]
      .collect().toSet === df.as[(Long, Double, Double)].collect().toSet)
  }
}
