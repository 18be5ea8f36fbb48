package graft.operators

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Recursive schema flattening — the engine's signature restructuring
 * operator (reference: motor_ingesta/motor_ingesta.py:47-75).
 *
 * Per pass over the top-level schema:
 *   - primitive columns are kept by name;
 *   - `array<...>` columns are `explode`d and re-aliased to the same
 *     name (inner-explode semantics: rows whose array is NULL or empty
 *     are DROPPED, exactly like the reference);
 *   - `struct<...>` columns are star-expanded to their leaf names;
 *   - `map<...>` columns are dropped (the reference's type dispatch
 *     silently projects them away; we keep that contract and document
 *     it here rather than silently changing semantics).
 * Passes repeat until no array/struct remains. Leaf names are assumed
 * globally unique (same contract as the reference); duplicate leaves
 * surface as an AnalysisException downstream.
 *
 * Deviation (documented, opt-out): when two or more array columns
 * appear at the same nesting level the reference would throw (only one
 * generator per SELECT — motor_ingesta/motor_ingesta.py:53-54); by
 * default we explode one array per pass, which converges to the
 * cartesian product instead of failing. `strict = true` restores the
 * reference contract and raises on the second generator. Single-array
 * inputs — the only case the reference supports — behave identically
 * in both modes.
 *
 * Scale note: every pass is pure plan construction; Catalyst's
 * CollapseProject fuses the stacked SELECTs, so nesting depth adds zero
 * execution stages. `explode` is codegen'd (GenerateExec) and fully
 * distributed — no driver-side data movement, only driver-side schema
 * inspection.
 */
object Flatten {

  private def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType => true
    case _                            => false
  }

  @tailrec
  def flatten(df: DataFrame, strict: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    if (!fields.exists(f => isNested(f.dataType) || f.dataType.isInstanceOf[MapType])) df
    else {
      if (strict) {
        val arrays = fields.filter(_.dataType.isInstanceOf[ArrayType])
        require(arrays.length <= 1,
          "flatten(strict = true): more than one array column at the same " +
            s"nesting level (${arrays.map(_.name).mkString(", ")}) — the " +
            "reference allows a single generator per pass")
      }
      // Explode at most one array per pass (generator-per-select limit).
      var explodedOne = false
      val cols: Seq[Column] = fields.toSeq.flatMap { f =>
        f.dataType match {
          case _: ArrayType if !explodedOne =>
            explodedOne = true
            Seq(explode(col(quoted(f.name))).as(f.name))
          case _: ArrayType => Seq(col(quoted(f.name)))
          case st: StructType =>
            st.fields.toSeq.map(inner =>
              col(quoted(f.name) + "." + quoted(inner.name)).as(inner.name))
          case _: MapType => Seq.empty // reference drops map columns
          case _ => Seq(col(quoted(f.name)))
        }
      }
      flatten(df.select(cols: _*), strict)
    }
  }

  private def quoted(name: String): String = "`" + name.replace("`", "``") + "`"
}
