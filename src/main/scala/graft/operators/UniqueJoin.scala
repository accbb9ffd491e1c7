package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hive's UNIQUEJOIN (`FROM UNIQUEJOIN [PRESERVE] t1 a (a.key), ...`)
  * — the multi-way key-aligned join (ql/plan/JoinDesc.java:42
  * UNIQUE_JOIN; parsed in ql/parse/FromClauseParser.g; semantics pinned
  * by clientpositive/uniquejoin.q goldens):
  *
  *   - one output row group per key: sides holding the key contribute
  *     their rows cross-product style, absent sides contribute NULLs;
  *   - a key is emitted iff it appears in at least one PRESERVE side,
  *     or in EVERY side (so no PRESERVE anywhere degenerates to the
  *     inner intersection);
  *   - key expressions are per-side (they need not be column names:
  *     `T2 b (b.key - 1)` aligns b shifted by one).
  *
  * Spark-first: a chain of full-outer joins on the running coalesced
  * key — each step shuffles both sides by the same key so the chain is
  * one exchange per side (AQE merges the rest) — followed by a
  * presence-flag filter encoding the PRESERVE rule. No custom physical
  * operator needed: full outer + filter IS the unique-join state
  * machine.
  */
object UniqueJoin {

  /** One join side: frame, key expressions over it, PRESERVE flag. */
  case class Side(df: DataFrame, keys: Seq[Column], preserve: Boolean)

  /** @param sides   2+ sides, joined positionally on their key tuples
    * @param aliases one per side; output columns are `<alias>_<col>`
    */
  def uniqueJoin(sides: Seq[Side], aliases: Seq[String]): DataFrame = {
    require(sides.length >= 2 && sides.length == aliases.length)
    val nKeys = sides.head.keys.length
    require(sides.forall(_.keys.length == nKeys),
      "all sides must have the same number of key expressions")

    val prepared = sides.zip(aliases).map { case (s, a) =>
      s.df.select(
        s.df.columns.map(c => col(c).as(s"${a}_$c")) ++
          s.keys.zipWithIndex.map { case (k, j) => k.as(s"__k${j}_$a") } :+
          lit(true).as(s"__p_$a"): _*)
    }
    var acc = prepared.head
    var accKeys: Seq[Column] =
      (0 until nKeys).map(j => col(s"__k${j}_${aliases.head}"))
    for (i <- 1 until sides.length) {
      val a = aliases(i)
      val rightKeys = (0 until nKeys).map(j => col(s"__k${j}_$a"))
      val cond = accKeys.zip(rightKeys).map { case (l, r) => l === r }
        .reduce(_ && _)
      acc = acc.join(prepared(i), cond, "full_outer")
      accKeys = accKeys.zip(rightKeys).map { case (l, r) => coalesce(l, r) }
    }
    val present = aliases.map(a => coalesce(col(s"__p_$a"), lit(false)))
    val preservedAny = sides.zip(present)
      .collect { case (s, p) if s.preserve => p }
      .reduceOption(_ || _).getOrElse(lit(false))
    val inAll = present.reduce(_ && _)
    val helper = aliases.flatMap(a =>
      (0 until nKeys).map(j => s"__k${j}_$a") :+ s"__p_$a")
    acc.filter(preservedAny || inAll).drop(helper: _*)
  }
}
