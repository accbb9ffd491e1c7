package graft

/** One-shot generator for the committed v2.1 ledger fixture
  * (`src/test/resources/ledger_v21/`): a base snapshot with
  * PER-ENTRY partition/grant lines plus a delta segment carrying an
  * update and a TOMBSTONE, under a nonce-stamped segment name —
  * pinning the round-12 on-disk format the way fixture_v2.ledger
  * pins the round-11 whole-map format.
  *
  * Run: sbt "Test/runMain graft.GenLedgerFixture <outDir>"
  * then copy the outDir contents into src/test/resources/ledger_v21/.
  */
object GenLedgerFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/ledger_v21")
    val spark = Engine.session(appName = "gen-ledger-fixture",
      master = "local[2]", shufflePartitions = 2)
    spark.sparkContext.setLogLevel("ERROR")
    val ledger = s"$out/ms.ledger"
    spark.conf.set("spark.graft.metastore.path", ledger)
    val h = new HiveStatements(spark)
    h.sql("CREATE TABLE fix21_t (k INT) COMMENT 'pinned v2.1' " +
      "PARTITIONED BY (ds STRING) STORED AS PARQUET")
    h.sql("ALTER TABLE fix21_t ADD PARTITION (ds='a')")
    h.sql("ALTER TABLE fix21_t ADD PARTITION (ds='b')")
    h.sql("GRANT SELECT ON TABLE fix21_t TO USER pinuser")
    // the drop lands in a DELTA segment as a TOMBSTONE over the
    // earlier segment's ds='a' entry
    h.sql("ALTER TABLE fix21_t DROP PARTITION (ds='a')")
    println(s"wrote $out")
    spark.stop()
  }
}
