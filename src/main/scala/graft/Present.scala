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
  * Every call site uses a TOTAL order (unique tiebreak columns), so the
  * result is identical to the equivalent ORDER BY.
  */
object Present {
  implicit class PresentOps(private val df: DataFrame) extends AnyVal {
    def presentSorted(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
    def presentSorted(c: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c, cs: _*)
  }
}
