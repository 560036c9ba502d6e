package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family registers an [[OpGroup]] here; `queries` and
  * `oracleSql` are the merged registries the driver runs (Verify → DuckDB
  * hash-compare at sf0.01; Bench wall-clock at sf0.1).
  */
object SparkEntry {
  /** All operator groups, in SURVEY.md §2 section order. */
  def groups: Seq[OpGroup] = Seq(
    operators.CoreOps,
    operators.JoinOps,
    operators.ExplodeOps,
    operators.AggWindowOps,
    operators.SetOps,
    operators.ScalarFuncOps,
    operators.SourceOps,
    operators.StreamBatchOps,
    operators.LlmOps,
    operators.TrainingDataOps,
    operators.MultimodalOps,
    operators.PipelineOps,
    operators.ScaleOps,
    operators.ExtendedOps,
    operators.SemiStructuredOps,
    operators.SpotifyOps,
    operators.CurationOps,
    operators.MergeOps,
    operators.RankingOps,
    operators.EventAnalyticsOps,
    operators.LangModelOps,
    operators.StatOps,
    operators.CorpusDedupOps,
    operators.QualityOps,
    operators.InfoStatOps,
    operators.GovernanceOps,
    operators.CalibrationOps,
    operators.TelemetryOps,
    operators.SmoothingOps,
    operators.AuditOps,
    operators.TemporalOps,
    operators.EmbeddingAlgebraOps,
    operators.ModelPrepOps,
    operators.ParetoStatOps,
    operators.SketchFillOps,
    operators.SeriesInfraOps,
    operators.SampleAuditOps,
    operators.ExperimentOps,
    operators.UpliftOps,
    operators.MiningOps,
    operators.RankStatOps,
    operators.RetrievalEvalOps,
    operators.LinkPredOps,
    operators.SeriesStatOps,
    operators.StorageLayoutOps,
    operators.EventSequenceOps,
    operators.SurvivorshipOps,
    operators.DriftOps,
    operators.CorpusEvalOps,
    operators.InfraPlanOps,
    operators.AgreementOps,
    operators.CausalEvalOps,
    operators.CommerceOps,
    operators.ScopedRankOps,
    operators.CurriculumOps,
    operators.GraphAudienceOps,
    operators.TokenDistOps,
    operators.QualitySignalOps,
    operators.CorpusHygieneOps,
    operators.PlanEvalOps,
    operators.LexRichnessOps,
    operators.DistShapeOps,
    operators.IncrementalMaintainOps,
    operators.SeriesTestOps,
    operators.IncrementalIvfOps,
    operators.IncrementalBm25Ops,
    operators.IncrementalPhashOps,
    operators.IncrementalKnnOps,
    operators.StreamMaintainOps,
    operators.LmLayoutOps,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreOps.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracleSql).toMap
}
