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
 *   - `map<...>` columns follow the `maps` flag (round 10): the
 *     default `"drop"` keeps reference parity — the reference's type
 *     dispatch silently projects maps away
 *     (motor_ingesta/motor_ingesta.py:63-72) — EXCEPT under
 *     `strict = true`, where a map column now raises instead of
 *     silently losing data (strict's whole point is the loud
 *     reference contract); `maps = "explode"` opts into the
 *     documented improvement, exploding each map to `<name>_key` /
 *     `<name>_value` columns (inner-explode semantics like the array
 *     branch: NULL/empty-map rows drop; map VALUES that are
 *     themselves nested keep flattening on later passes). Map
 *     explosion shares the one-generator-per-pass budget with
 *     arrays.
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
  def flatten(
      df: DataFrame, strict: Boolean = false,
      maps: String = "drop"): DataFrame = {
    require(maps == "drop" || maps == "explode",
      s"""flatten: maps must be "drop" or "explode", got "$maps"""")
    val fields = df.schema.fields
    if (!fields.exists(f => isNested(f.dataType) || f.dataType.isInstanceOf[MapType])) df
    else {
      if (strict) {
        val arrays = fields.filter(_.dataType.isInstanceOf[ArrayType])
        require(arrays.length <= 1,
          "flatten(strict = true): more than one array column at the same " +
            s"nesting level (${arrays.map(_.name).mkString(", ")}) — the " +
            "reference allows a single generator per pass")
        if (maps == "drop") {
          val mapCols = fields.filter(_.dataType.isInstanceOf[MapType])
          require(mapCols.isEmpty,
            "flatten(strict = true): map column(s) " +
              s"(${mapCols.map(_.name).mkString(", ")}) would be silently "
              + "dropped (the reference's documented data-loss wart) — " +
              """pass maps = "explode" or drop them explicitly upstream""")
        }
      }
      // Explode at most one generator per pass (generator-per-select
      // limit) — arrays and exploded maps share the budget.
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
          case _: MapType if maps == "explode" && !explodedOne =>
            explodedOne = true
            Seq(explode(col(quoted(f.name)))
              .as(Seq(s"${f.name}_key", s"${f.name}_value")))
          case _: MapType if maps == "explode" => Seq(col(quoted(f.name)))
          case _: MapType => Seq.empty // reference drops map columns
          case _ => Seq(col(quoted(f.name)))
        }
      }
      flatten(df.select(cols: _*), strict, maps)
    }
  }

  private def quoted(name: String): String = "`" + name.replace("`", "``") + "`"
}
