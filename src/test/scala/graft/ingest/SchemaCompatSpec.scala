package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantics pinned by the reference's SchemaCompatibilityTest.java:73-170. */
class SchemaCompatSpec extends SparkSuite {
  import SchemaCompat._

  private val v1 = VersionedSchema("rec", Some(1),
    StructType(Seq(StructField("a", IntegerType))))
  private val v2 = VersionedSchema("rec", Some(2),
    StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType))))

  test("identical schema is compatible under every mode") {
    for (m <- Seq(None, Backward, Forward, Full))
      assert(decide(m, v1, v1) == Identical)
  }

  test("NONE: any change rotates, even same-version structural change " +
    "(SchemaCompatibilityTest.java:158-166)") {
    val v1b = v1.copy(struct = StructType(Seq(StructField("a", LongType))))
    assert(decide(None, v1, v1b) == Rotate(DifferentType))
    assert(decide(None, v1, v2) == Rotate(DifferentVersion))
  }

  test("BACKWARD/FULL: newer incoming rotates+adopts; older projects onto " +
    "current (SchemaCompatibilityTest.java:131-138)") {
    for (m <- Seq(Backward, Full)) {
      assert(decide(m, v1, v2) == Rotate(DifferentVersion))
      assert(decide(m, v2, v1) == Project(v2))
    }
  }

  test("FORWARD: inverse — older rotates, newer projects down " +
    "(SchemaCompatibilityTest.java:139-146)") {
    assert(decide(Forward, v2, v1) == Rotate(DifferentVersion))
    assert(decide(Forward, v1, v2) == Project(v1))
  }

  test("versionless schema under non-NONE mode is an error " +
    "(SchemaCompatibilityTest.java:96-112)") {
    val noVer = v1.copy(version = scala.None)
    intercept[IllegalArgumentException](decide(Backward, noVer, v2))
    intercept[IllegalArgumentException](decide(Full, v1, v2.copy(version = scala.None)))
  }

  test("different schema name classifies DIFFERENT_NAME") {
    val other = v1.copy(name = "other")
    assert(decide(Backward, v1, other) == Rotate(DifferentName))
  }

  test("projection aligns columns, fills missing with null, casts types") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b")
    val target = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val out = project(df, target)
    // compare names/types; nullability may tighten when the source column
    // is provably non-null
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      target.map(f => (f.name, f.dataType)))
    val row = out.head
    assert(row.getLong(0) == 1L && row.getString(1) == "x" && row.isNullAt(2))
  }
}
