package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.types._

class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._
  import SchemaCompat._
  import SchemaEvolution._

  private val v1 = VersionedSchema("rec", Some(1),
    StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
  private val v2 = VersionedSchema("rec", Some(2),
    StructType(Seq(StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", DoubleType))))

  private def b1() = VersionedBatch(v1, Seq((1, "x"), (2, "y")).toDF("a", "b"))
  private def b2() = VersionedBatch(v2,
    Seq((3, "z", 1.5)).toDF("a", "b", "c"))

  test("BACKWARD: newer batch rotates+adopts, then older batches project " +
    "onto the newer schema (one write group on v2)") {
    val groups = resolve(Backward, Seq(b2(), b1()))
    assert(groups.map(_.as) == Seq(v2))
    val rows = groups.head.frame.orderBy("a").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows(0).isNullAt(2) && rows(2).getDouble(2) == 1.5)
    assert(groups.head.sourceVersions.sorted == Seq(1, 2))
  }

  test("BACKWARD with older-first arrival: v1 files rotate when v2 arrives " +
    "(two write groups)") {
    val groups = resolve(Backward, Seq(b1(), b2()))
    assert(groups.map(_.as) == Seq(v1, v2))
    assert(groups.map(_.frame.count()).toSeq == Seq(2L, 1L))
  }

  test("FORWARD: newer batch projects DOWN onto the current older schema") {
    val groups = resolve(Forward, Seq(b1(), b2()))
    assert(groups.map(_.as) == Seq(v1))
    val g = groups.head
    assert(g.frame.count() == 3)
    assert(g.frame.schema.fieldNames.toSeq == Seq("a", "b")) // c dropped
  }

  test("NONE: every schema change rotates — one group per version run") {
    val groups = resolve(None, Seq(b1(), b2(), b1()))
    assert(groups.map(_.as) == Seq(v1, v2))
    // third batch re-adopts v1 and lands in its existing group
    assert(groups.head.frame.count() == 4)
  }

  test("splitByVersion: version churn WITHIN one frame splits per registry " +
    "id, projects each onto its declared struct, and feeds resolve") {
    // superset physical schema; v1 rows have c = null
    val mixed = Seq(
      (1, "x", Option.empty[Double], 1),
      (2, "y", Option.empty[Double], 1),
      (3, "z", Some(1.5), 2)).toDF("a", "b", "c", "ver")
    val batches = SchemaEvolution.splitByVersion(mixed, "ver",
      Map(1 -> v1, 2 -> v2))
    assert(batches.map(_.schema) == Seq(v1, v2))
    assert(batches.head.frame.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(batches(1).frame.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    // end-to-end under BACKWARD: one write group on v2, all rows aligned
    val groups = resolve(Backward, batches.reverse)
    assert(groups.map(_.as) == Seq(v2))
    assert(groups.head.frame.count() == 3)
    val ex = intercept[IllegalArgumentException] {
      SchemaEvolution.splitByVersion(mixed, "ver", Map(1 -> v1))
    }
    assert(ex.getMessage.contains("version 2"))
  }
}
