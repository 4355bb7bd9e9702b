package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scenario fixture scan + normaliser.
  *
  * Fixtures are the reference's scenario JSON shape
  * (`src/features/shared-scenarios.ts:33-48`: `{id, name, seed, table,
  * schema[], rows[], ops[]}` with ops `{t, table?, op, pk?, after?, txn?}`).
  * The normaliser reproduces `shared-scenario-normaliser.ts:224-400`:
  *   - op-code normalisation: c/create/r/read/s/snapshot → insert, u →
  *     update, d → delete (`:262-271`);
  *   - pk derivation: explicit pk, else from `after[pkColumn]` (`:224-260`);
  *   - fallback table and timestamps (cumulative index when `t` missing);
  *   - ops without a derivable pk are dropped;
  *   - ops sorted by `t` (`harness/generator/generator.js:11-13`).
  */
object ScenarioSource {

  /** Read one scenario fixture (multi-line JSON). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)

  /** `pk` may be a `{id}` struct (inferred) or absent/null. */
  private def explicitPk(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("pk").dataType match {
      case _: org.apache.spark.sql.types.StructType => col("pk.id").cast("string")
      case _ => col("pk").cast("string")
    }

  /** `after` is a struct when any op carries a payload, else the null
    * string placeholder (to_json on a non-struct would fail analysis). */
  private def afterJson(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("after").dataType match {
      case _: org.apache.spark.sql.types.StructType => to_json(col("after"))
      case _ => col("after").cast("string")
    }

  /** Normalise the `ops` array of a scenario into the canonical op stream:
    * (t, tbl, pk, op, after_json). `pkColumn` names the pk field inside
    * `after` payloads (the fixture schema's pk column, default "id"). */
  def normaliseOps(scenario: DataFrame, pkColumn: String = "id", fallbackTable: String = "data"): DataFrame = {
    // shared scenarios carry a top-level `table`; harness fixtures don't
    val scenarioTable =
      if (scenario.columns.contains("table")) coalesce(col("table"), lit(fallbackTable))
      else lit(fallbackTable)
    val ops = scenario
      .select(scenarioTable.as("scenario_table"), explode(col("ops")).as("op"))
      .select(col("scenario_table"), col("op.*"))
    // ops may omit per-op fields entirely (schema inferred from JSON) — a
    // delete-only fixture, for instance, has no `after` anywhere
    val withOptional = Seq("table", "pk", "t", "after").foldLeft(ops) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }
    val normalised = withOptional
      .withColumn("op_norm",
        when(lower(col("op")).isin("c", "create", "r", "read", "s", "snapshot", "insert"), "insert")
          .when(lower(col("op")).isin("u", "update"), "update")
          .when(lower(col("op")).isin("d", "delete"), "delete"))
      .filter(col("op_norm").isNotNull)
      .withColumn("tbl", coalesce(col("table"), col("scenario_table")))
      .withColumn("pk_norm", coalesce(
        explicitPk(withOptional),
        get_json_object(afterJson(withOptional), s"$$.$pkColumn")))
      .filter(col("pk_norm").isNotNull)
    val withT = normalised.withColumn("t_norm",
      coalesce(col("t").cast("long"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("tbl").orderBy(monotonically_increasing_id())) * 10).cast("long")))
    withT
      .select(
        col("t_norm").as("t"), col("tbl"), col("pk_norm").as("pk"),
        col("op_norm").as("op"), afterJson(withOptional).as("after_json"))
      .orderBy("t", "pk")
  }
}
