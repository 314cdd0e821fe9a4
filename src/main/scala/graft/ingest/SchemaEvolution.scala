package graft.ingest

import org.apache.spark.sql.DataFrame

/** R5+P5 integrated: ingest a stream whose batches arrive under different
  * schema versions (SURVEY §1.3).
  *
  * A Spark DataFrame is single-schema, so mixed-version data arrives as one
  * frame per version (in practice: deserialized per schema-registry id).
  * Under the configured compatibility mode this resolves which version each
  * batch is written AS — the reference's rotate-or-project decision matrix
  * (SchemaCompatibilityTest.java:73-170) applied batch-wise:
  *
  *  - versions that PROJECT are column-aligned onto the target schema and
  *    unioned into the target's write group (one file sequence);
  *  - versions that ROTATE keep their own schema and their own file group
  *    (distinct files — exactly what R5 rotation produces record-wise).
  */
object SchemaEvolution {

  final case class VersionedBatch(schema: SchemaCompat.VersionedSchema,
                                  frame: DataFrame)

  /** Version churn WITHIN one physical frame: rows tagged with a schema
    * version (the schema-registry id that deserialized them) split into one
    * VersionedBatch per distinct version, each projected onto its declared
    * struct — feed the result to `resolve`. The distinct-version list is
    * collected to the driver (it is bounded by registry churn, a handful,
    * never row count); the row data itself splits lazily via filters over
    * the one superset-schema frame. */
  def splitByVersion(frame: DataFrame, versionCol: String,
                     catalog: Map[Int, SchemaCompat.VersionedSchema])
      : Seq[VersionedBatch] = {
    import org.apache.spark.sql.functions.col
    val versions = frame.select(versionCol).distinct()
      .collect().map(_.getInt(0)).sorted
    versions.toSeq.map { v =>
      val vs = catalog.getOrElse(v, throw new IllegalArgumentException(
        s"row carries schema version $v absent from the catalog"))
      VersionedBatch(vs, SchemaCompat.project(
        frame.filter(col(versionCol) === v).drop(versionCol), vs.struct))
    }
  }
  /** One write group per surviving schema: the schema it is written as and
    * the (possibly unioned+projected) data. */
  final case class WriteGroup(as: SchemaCompat.VersionedSchema,
                              frame: DataFrame, sourceVersions: Seq[Int])

  def resolve(mode: SchemaCompat.CompatMode,
              batches: Seq[VersionedBatch]): Seq[WriteGroup] = {
    require(batches.nonEmpty)
    // Determine the "current" schema the way the reference does as records
    // stream through: scan batches in arrival order, rotating/adopting per
    // the decision matrix.
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[SchemaCompat.VersionedSchema, scala.collection.mutable.Buffer[VersionedBatch]]
    var current = batches.head.schema
    groups.getOrElseUpdate(current, scala.collection.mutable.Buffer()) +=
      batches.head
    batches.tail.foreach { b =>
      SchemaCompat.decide(mode, current, b.schema) match {
        case SchemaCompat.Identical =>
          groups(current) += b
        case SchemaCompat.Project(target) =>
          groups(target) += b
        case SchemaCompat.Rotate(_) =>
          current = b.schema
          groups.getOrElseUpdate(current,
            scala.collection.mutable.Buffer()) += b
      }
    }
    groups.map { case (as, bs) =>
      val projected = bs.map(b =>
        if (b.schema == as) b.frame
        else SchemaCompat.project(b.frame, as.struct))
      WriteGroup(as, projected.reduce(_ unionByName _),
        bs.map(_.schema.version.getOrElse(-1)).distinct.toSeq)
    }.toSeq
  }
}
