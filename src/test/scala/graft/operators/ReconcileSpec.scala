package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def orders =
    Tables.orders(spark, "/root/testdata/sf0.001").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("decimal(18,2)").as("pr"))

  private val cols =
    Seq(col("k").cast("string"), col("st"), col("pr").cast("string"))

  test("identical snapshots produce zero mismatched buckets") {
    val a = orders
    assert(Reconcile.diffBuckets(a, a, col("k"), cols, 64).count() == 0L)
    assert(Reconcile.drillDown(a, a, col("k"), "k", cols, 64).count() == 0L)
  }

  test("a single-row update is localized to exactly its bucket and key") {
    val a = orders
    val target = a.orderBy("k").select("k").as[Long].head()
    val b = a.withColumn("pr",
      when(col("k") === target, (col("pr") + lit(1).cast("decimal(18,2)"))
        .cast("decimal(18,2)")).otherwise(col("pr")))
    val bad = Reconcile.diffBuckets(a, b, col("k"), cols, 64)
      .select("bucket", "n_a", "n_b").as[(Int, Long, Long)].collect()
    assert(bad.length == 1)
    assert(bad.head._1 == (target % 64).toInt)
    // update: counts agree, only the fingerprint moved
    assert(bad.head._2 == bad.head._3)
    val dd = Reconcile.drillDown(a, b, col("k"), "k", cols, 64)
      .as[(Long, String)].collect().toSet
    assert(dd == Set((target, "A"), (target, "B")))
  }

  test("deletes and inserts show counts and one-sided keys") {
    val a = orders
    val del = a.orderBy("k").select("k").as[Long].head()
    val b = a.where(col("k") =!= del)
      .unionByName(a.limit(1).select((col("k") + 1000000L).as("k"),
        lit("X").as("st"), col("pr")))
    val dd = Reconcile.drillDown(a, b, col("k"), "k", cols, 64)
      .as[(Long, String)].collect().toSet
    val aOnly = dd.collect { case (k, "A") => k }
    val bOnly = dd.collect { case (k, "B") => k }
    assert(aOnly == Set(del))
    assert(bOnly.forall(_ >= 1000000L) && bOnly.size == 1)
  }

  test("fingerprint is shuffle-order independent (repartition invariant)") {
    val a = orders
    val f1 = Reconcile.fingerprint(a, col("k"), cols, 64)
      .as[(Int, Long, Long)].collect().toSet
    val f2 = Reconcile.fingerprint(a.repartition(13), col("k"), cols, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(f1 == f2)
  }
}
