package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P5 schema-compatibility projection + R5 rotation decision (SURVEY §1.3).
  *
  * Semantics pinned by the reference's
  * `SchemaCompatibilityTest.java:73-170`:
  *  - NONE: any schema object change (even same version) is incompatible →
  *    rotate (`:158-166`).
  *  - BACKWARD / FULL: higher-versioned incoming schema rotates + adopts;
  *    lower-or-equal versioned records are projected onto the current
  *    (newer) schema (`:131-138`).
  *  - FORWARD: inverse — lower version rotates, higher is projected down
  *    (`:139-146`).
  *  - Versionless schemas under non-NONE modes are an error (`:96-112`).
  * Incompatibility classification mirrors `util/FileRotationTracker.java:48-67`.
  */
object SchemaCompat {

  sealed trait CompatMode
  case object None extends CompatMode
  case object Backward extends CompatMode
  case object Forward extends CompatMode
  case object Full extends CompatMode

  object CompatMode {
    def parse(s: String): CompatMode = s.toUpperCase match {
      case "NONE" => None
      case "BACKWARD" => Backward
      case "FORWARD" => Forward
      case "FULL" => Full
      case other => throw new IllegalArgumentException(
        s"unknown schema.compatibility '$other'")
    }
  }

  /** Why two schemas are incompatible (util/FileRotationTracker.java:48-67). */
  sealed trait IncompatReason
  case object DifferentName extends IncompatReason
  case object DifferentSchema extends IncompatReason
  case object DifferentParams extends IncompatReason
  case object DifferentType extends IncompatReason
  case object DifferentVersion extends IncompatReason

  /** A per-record schema as the reference sees it: Connect schemas carry a
    * name and version next to the structural type. */
  final case class VersionedSchema(name: String, version: Option[Int],
                                   struct: StructType)

  sealed trait Decision
  /** Incoming records are written as-is (identical schema). */
  case object Identical extends Decision
  /** Incoming records must be projected onto `target` before writing. */
  final case class Project(target: VersionedSchema) extends Decision
  /** Rotate the current file, adopt the incoming schema. */
  final case class Rotate(reason: IncompatReason) extends Decision

  def decide(mode: CompatMode, current: VersionedSchema,
             incoming: VersionedSchema): Decision = {
    if (current == incoming) return Identical
    mode match {
      case None =>
        Rotate(classify(current, incoming))
      case Backward | Full | Forward =>
        val cv = current.version.getOrElse(versionless(current))
        val iv = incoming.version.getOrElse(versionless(incoming))
        if (current.name != incoming.name) Rotate(DifferentName)
        else if (iv == cv) {
          if (current.struct == incoming.struct) Identical
          else Rotate(classify(current, incoming))
        } else {
          val incomingNewer = iv > cv
          val adoptIncoming = if (mode == Forward) !incomingNewer else incomingNewer
          if (adoptIncoming) Rotate(DifferentVersion) else Project(current)
        }
    }
  }

  private def versionless(s: VersionedSchema): Nothing =
    throw new IllegalArgumentException(
      s"schema '${s.name}' has no version but schema.compatibility != NONE " +
        "(reference: SchemaCompatibilityTest.java:96-112)")

  private def classify(current: VersionedSchema,
                       incoming: VersionedSchema): IncompatReason =
    if (current.name != incoming.name) DifferentName
    else if (current.version != incoming.version) DifferentVersion
    else if (typesDiffer(current.struct, incoming.struct)) DifferentType
    else DifferentSchema

  private def typesDiffer(a: StructType, b: StructType): Boolean = {
    val shared = a.fieldNames.toSet intersect b.fieldNames.toSet
    shared.exists(f => a(f).dataType != b(f).dataType)
  }

  /** Column-aligning projection of `df` onto `target`: kept fields are cast,
    * fields missing from `df` become their default (or null when nullable).
    * This is the Spark equivalent of storage-common's
    * `StorageSchemaCompatibility.project` (call site
    * TopicPartitionWriter.java:505). */
  def project(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = target.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
