package graft.tools

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dev-only timing probe for the q196 replicate pass (not a correctness
  * spec; run with -Dgraft.probe=1). */
class BootstrapProbe extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("component timing of the bootstrap replicate pass") {
    assume(sys.props.get("graft.probe").contains("1"))
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_returnflag").as("g"),
        concat(col("l_orderkey").cast("string"), lit("|"),
          col("l_linenumber").cast("string")).as("key"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    t("explode only") {
      li.withColumn("b", explode(sequence(lit(0), lit(63)))).count()
    }
    t("explode+concat") {
      li.withColumn("b", explode(sequence(lit(0), lit(63))))
        .select(concat(col("key"), lit("|"), col("b").cast("string")).as("k2"))
        .agg(count(lit(1))).head().getLong(0)
    }
    t("explode+md5") {
      li.withColumn("b", explode(sequence(lit(0), lit(63))))
        .select(md5(concat(col("key"), lit("|"), col("b").cast("string"))
          .cast("binary")).as("m"))
        .where(length(col("m")) > 0).agg(count(lit(1))).head().getLong(0)
    }
    t("explode+hash60") {
      li.withColumn("b", explode(sequence(lit(0), lit(63))))
        .select(graft.operators.Sketches.hash60(
          concat(col("key"), lit("|"), col("b").cast("string"))).as("h"))
        .where(col("h") >= 0).agg(count(lit(1))).head().getLong(0)
    }
    t("full replicate agg") {
      li.withColumn("b", explode(sequence(lit(0), lit(63))))
        .withColumn("w", graft.operators.Bootstrap.poissonWeight(
          graft.operators.Sketches.hash60(
            concat(col("key"), lit("|"), col("b").cast("string")))))
        .where(col("w") > 0)
        .groupBy("g", "b")
        .agg(sum(col("w") * col("cents")).as("s"), sum(col("w")).as("n"))
        .count()
    }
  }
}
