package graft
import org.scalatest.funsuite.AnyFunSuite
class LastRestProbe extends AnyFunSuite {
  private lazy val spark = Engine.session(appName = "probe",
    master = "local[2]", shufflePartitions = 2)
  test("probe") {
    val d = new HiveDialect(spark)
    val q = """INSERT OVERWRITE TABLE dest1
SELECT TRANSFORM(*)
  USING 'cat'
  AS mydata STRING
    ROW FORMAT SERDE
      'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe'
    WITH SERDEPROPERTIES (
      'serialization.last.column.takes.rest'='true'
    )
    RECORDREADER 'org.apache.hadoop.hive.ql.exec.BinaryRecordReader'
FROM src"""
    println("REWRITTEN>>> " + d.rewrite(q))
  }
}
