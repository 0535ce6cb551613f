package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toy(rows: (Long, String, Long)*) =
    rows.toDF("k", "g", "v")

  test("signedDelta emits nothing for identical snapshots") {
    val a = toy((1L, "x", 10L), (2L, "y", 20L))
    assert(Materialize.signedDelta(a, a, "k", Seq("g", "v")).count() == 0L)
  }

  test("signedDelta classifies insert, delete and update; unchanged rows are silent") {
    val a = toy((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L))
    val b = toy((1L, "x", 10L), (2L, "y", 25L), (4L, "z", 40L))
    val d = Materialize.signedDelta(a, b, "k", Seq("g", "v"))
      .select("k", "__sign", "g", "v").as[(Long, Int, String, Long)]
      .collect().toSet
    assert(d == Set(
      (2L, -1, "y", 20L), (2L, 1, "y", 25L), // update: old out, new in
      (3L, -1, "x", 30L),                    // delete
      (4L, 1, "z", 40L)))                    // insert
  }

  test("signedDelta null-safe attr compare: null-valued unchanged rows stay silent") {
    val a = Seq((1L, Option.empty[String], 10L), (2L, Some("y"), 20L))
      .toDF("k", "g", "v")
    val b = Seq((1L, Option.empty[String], 10L), (2L, Option.empty[String], 20L))
      .toDF("k", "g", "v")
    val d = Materialize.signedDelta(a, b, "k", Seq("g", "v"))
      .select("k", "__sign").as[(Long, Int)].collect().toSet
    // key 1 unchanged (null == null under <=>); key 2 updated to null
    assert(d == Set((2L, -1), (2L, 1)))
  }

  test("maintain lands exactly on the recompute, including new and dropped groups") {
    val a = toy((1L, "x", 10L), (2L, "x", 5L), (3L, "y", 7L), (4L, "z", 1L))
    // b: x loses k=2 (group shrinks), y updated, z fully deleted
    // (group must DROP), w appears (group must be created)
    val b = toy((1L, "x", 10L), (3L, "y", 9L), (5L, "w", 2L))
    val mv = Materialize.groupedMv(a, "g", col("v"))
    val delta = Materialize.signedDelta(a, b, "k", Seq("g", "v"))
    val maintained = Materialize.maintain(mv, delta, "g", col("v"))
      .as[(String, Long, Long)].collect().toSet
    val recomputed = Materialize.groupedMv(b, "g", col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(maintained == recomputed)
    assert(!maintained.exists(_._1 == "z")) // zero-count group dropped
  }

  test("maintenance over the drifted orders snapshot equals direct recompute") {
    val a = Tables.orders(spark, "/root/testdata/sf0.001").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("decimal(18,2)").as("pr"))
    val b = a.where(pmod(col("k"), lit(131)) =!= 0)
      .select(col("k"), col("st"),
        when(pmod(col("k"), lit(97)) === 0,
          (col("pr") + lit(1).cast("decimal(18,2)")).cast("decimal(18,2)"))
          .otherwise(col("pr")).as("pr"))
      .unionByName(a.where(pmod(col("k"), lit(211)) === 0)
        .select((col("k") + 100000000L).as("k"), lit("N").as("st"), col("pr")))
    val cents = (col("pr") * 100).cast("long")
    val mv = Materialize.groupedMv(a, "st", cents)
    val delta = Materialize.signedDelta(a, b, "k", Seq("st", "pr"))
    val maintained = Materialize.maintain(mv, delta, "st", cents)
      .as[(String, Long, Long)].collect().toSet
    val recomputed = Materialize.groupedMv(b, "st", cents)
      .as[(String, Long, Long)].collect().toSet
    assert(maintained == recomputed)
    // the delta is O(changed), not O(table): only keys hit by the
    // drift's modulus rules may appear
    val deltaKeys = Materialize.signedDelta(a, b, "k", Seq("st", "pr"))
      .select("k").as[Long].collect()
    assert(deltaKeys.forall(k =>
      k % 131 == 0 || k % 97 == 0 || k >= 100000000L))
  }

  test("maintain is partitioning-invariant (exact integral sums)") {
    val a = toy((1 to 500).map(i => (i.toLong, s"g${i % 7}", i.toLong * 3)): _*)
    val b = toy((1 to 500).filter(_ % 11 != 0)
      .map(i => (i.toLong, s"g${i % 7}",
        if (i % 5 == 0) i.toLong * 4 else i.toLong * 3)): _*)
    val mv = Materialize.groupedMv(a.repartition(13), "g", col("v"))
    val delta = Materialize.signedDelta(a.repartition(3), b.repartition(17),
      "k", Seq("g", "v"))
    val maintained = Materialize.maintain(mv, delta, "g", col("v"))
      .as[(String, Long, Long)].collect().toSet
    val recomputed = Materialize.groupedMv(b, "g", col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(maintained == recomputed)
  }
}
