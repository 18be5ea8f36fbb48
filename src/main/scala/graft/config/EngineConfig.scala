package graft.config

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/**
 * One output column of the coercion schema: name + Spark SQL DDL type
 * string + a human comment stored as column metadata. The optional
 * `format` key is accepted but (deliberately) unused, mirroring the
 * reference engine where the `date` format hint is ignored and a plain
 * cast is applied (reference: motor_ingesta/motor_ingesta.py:39-43,
 * config/config.json:4-7).
 */
case class ColumnSpec(
    name: String,
    `type`: String,
    comment: Option[String] = None,
    format: Option[String] = None) {
  def sparkType: String = `type`
  def metadata: Metadata = comment match {
    case Some(c) => new MetadataBuilder().putString("comment", c).build()
    case None    => Metadata.empty
  }
}

/**
 * Engine configuration: the fixed output schema plus sink options.
 * Mirrors the reference's config/config.json keys
 * (reference: config/config.json:2-97, flujo_diario.py:24-25).
 */
case class EngineConfig(
    data_columns: Seq[ColumnSpec],
    output_table: Option[String] = None,
    output_partitions: Option[Int] = None) {
  def dataColumns: Seq[ColumnSpec] = data_columns
  /** Required for sink flows; fails fast like the reference's raw
    * config["output_table"] lookup (flujo_diario.py:62-67). */
  def outputTable: String = output_table.getOrElse(
    throw new IllegalArgumentException(
      "output_table missing from engine config"))
  /** Reference default: 1 (config/config.json:96 overrides to 10). */
  def outputPartitions: Int = output_partitions.getOrElse(1)
}

object EngineConfig {
  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Parse a config JSON string. */
  def fromJson(json: String): EngineConfig =
    mapper.readValue(json, classOf[EngineConfig])

  /** Load a config from a local file path. */
  def fromFile(path: String): EngineConfig =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
