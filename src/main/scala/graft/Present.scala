package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic presentation ordering for verification outputs.
  *
  * A global ORDER BY plans a range-partitioned sort whose sampling pass
  * RE-EXECUTES the entire query child to estimate bounds — fine when the
  * sorted result is the product (100 TB ETL output), pure tax when the
  * ordering only exists so the oracle can hash-compare rows. Verification
  * outputs are small (aggregates, pair lists, capped scans), so one
  * round-robin shuffle to a single partition + in-partition sort gives
  * the same total order with the query executed exactly once.
  *
  * The single-partition form is applied ONLY when the input is provably
  * presentation-small (metadata probe below, same discipline as
  * Engine.spread); a provably large input keeps the scalable range sort
  * — identical total order, it just parallelizes — so no declared query
  * funnels a cluster-scale result through one task. Every call site uses
  * a TOTAL order (unique tiebreak columns), so either physical form
  * yields the identical row sequence.
  */
object Present {

  /** Above this provable input size (bytes summed over file-scan
    * leaves, metadata only) the presentation sort stays a range sort.
    * Local testdata is ≤ tens of MB, so the default never flips a
    * local plan; a 100 TB table flips every scan-shaped pipeline.
    * Overridable for tests/deployments via system property
    * `graft.present.maxbytes` or env SPARK_GRAFT_PRESENT_MAXBYTES. */
  private def maxSmallBytes: Long =
    sys.props.get("graft.present.maxbytes")
      .orElse(sys.env.get("SPARK_GRAFT_PRESENT_MAXBYTES"))
      .map(_.toLong).getOrElse(1L << 30)

  /** Metadata-only largeness probe: file-scan leaves contribute their
    * FileIndex size; a checkpointed intermediate (LogicalRDD) counts as
    * large when its partition count says it was produced by a far wider
    * cluster than this session (a local checkpoint of a small
    * intermediate has at most `defaultParallelism` partitions). Never
    * runs a job. Unknown shapes stay "small" — the status quo — because
    * every such call site is an aggregate/pair output bounded well
    * below its input. */
  private[graft] def provablyLarge(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val bound = maxSmallBytes
    val wide = 4L * df.sparkSession.sparkContext.defaultParallelism
    var bytes = 0L
    var large = false
    df.queryExecution.analyzed.foreach {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => bytes += fs.location.sizeInBytes
        case _ =>
      }
      case l: LogicalRDD => if (l.rdd.getNumPartitions > wide) large = true
      case _ =>
    }
    large || bytes > bound
  }

  implicit class PresentOps(private val df: DataFrame) extends AnyVal {
    def presentSorted(cols: Column*): DataFrame =
      if (Present.provablyLarge(df)) df.orderBy(cols: _*)
      else df.repartition(1).sortWithinPartitions(cols: _*)
    def presentSorted(c: String, cs: String*): DataFrame =
      if (Present.provablyLarge(df)) df.orderBy(c, cs: _*)
      else df.repartition(1).sortWithinPartitions(c, cs: _*)
  }
}
