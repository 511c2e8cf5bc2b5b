package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unrolled (codegen) row-stats pass must agree with the UDF path —
  * same arithmetic, just expressed as column expressions over the
  * broadcast-joined fit row.
  */
class OlsPassSpec extends SparkSpec {
  import spark.implicits._

  test("rowStats unrolled ≡ UDF path on a scoped class+continuous design") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 300).map { i =>
      val g = if (i % 2 == 0) "G1" else "G2"
      val sex = Seq("M", "F", "U")(i % 3)
      val x = i * 0.1
      (s"id$i", g, sex, x, 1.0 + 2.0 * x + (if (sex == "M") 3.0 else 0.0) + rng.nextGaussian())
    }
    val df = rows.toDF("id", "g", "sex", "x", "y")
    val d = OlsPass.design(df, Seq("x"), Seq("sex"))
    val fits = OlsPass.fitPerGroup(df, "y", d, Seq("g"))
    val keyed = df.withColumn("__key", col("g").cast("string"))
    val un = OlsPass.rowStatsUnrolled(keyed, "y", d, fits)
      .select("id", "resid", "leverage", "rstudent", "cookd", "dfe", "s2")
      .collect().map(r => r.getString(0) -> r).toMap
    val ud = OlsPass.rowStatsUdf(keyed, "y", d, fits)
      .select("id", "resid", "leverage", "rstudent", "cookd", "dfe", "s2")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(un.keySet == ud.keySet)
    un.foreach { case (id, a) =>
      val b = ud(id)
      for (i <- 1 to 6) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        assert((x.isNaN && y.isNaN) || math.abs(x - y) < 1e-12, s"$id col$i: $x vs $y")
      }
    }
  }

  test("rowStats plan keeps whole-stage codegen (no per-row UDF on the hot path)") {
    val df = (1 to 100).map(i => (i * 1.0, 2.0 + 3.0 * i)).toDF("x", "y")
    val d = OlsPass.design(df, Seq("x"), Nil)
    val fits = OlsPass.fitPerGroup(df, "y", d, Nil)
    val out = OlsPass.rowStats(df, "y", d, Nil, fits)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "unrolled path must not evaluate a UDF per row")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "fit row must arrive via broadcast join")
  }
}
