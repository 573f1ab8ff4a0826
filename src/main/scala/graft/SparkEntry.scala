package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §0.1/§7.
  *
  * Each module under graft.operators/functions/streaming contributes a
  * `defs: Map[String, Q]`; a Q is the Spark DataFrame builder plus (when
  * SQL-expressible) a DuckDB-1.0 oracle over the same parquet tables.
  */
object SparkEntry {

  private def modules: Seq[Map[String, Q]] = Seq(
    operators.Relational.defs,
    operators.Windows.defs,
    operators.TimeSeries.defs,
    operators.Scalar.defs,
    operators.Text.defs,
    operators.TextPipeline.defs,
    operators.Similarity.defs,
    operators.ML.defs,
    operators.Multimodal.defs
  )

  private lazy val all: Map[String, Q] = {
    val merged = modules.flatten.toMap
    val dupes = modules.map(_.keySet).flatten
      .groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    require(dupes.isEmpty, s"duplicate query keys: $dupes")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.aggGroup(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.build }

  /** DuckDB-runnable oracle SQL per SQL-expressible query key. (No
    * whitespace normalization: a regex over the whole string would also
    * rewrite runs of spaces inside quoted literals; the JSON dump in
    * Verify escapes newlines safely.) */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql.trim }
}
