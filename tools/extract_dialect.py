#!/usr/bin/env python3
"""One-shot refactor: move the pure HiveQL->SparkSQL dialect rewrites
out of the test-tree GoldenHarness into src/main HiveDialect."""
import io, sys

HARNESS = 'src/test/scala/graft/GoldenHarness.scala'
DIALECT = 'src/main/scala/graft/HiveDialect.scala'

with open(HARNESS, encoding='utf-8', errors='surrogateescape') as f:
    text = f.read()

# (name, start_marker, end_marker) -- start inclusive, end exclusive.
REGIONS = [
    ('unionLimitSplit', '  /** Hive executes `(A union all B limit N)`',
     '  override protected def insertSegment'),
    ('usingRe', '  private val usingRe', '  /** TRANSFORM scripts:'),
    ('tsOnRe', '  private val tsOnRe', '\n  /** Hive dialect shims'),
    ('dialectShims', '  /** Hive dialect shims',
     '  /** Hive 2.x `GROUPING__ID` encodes'),
    ('groupingShim', '  /** Hive 2.x `GROUPING__ID` encodes',
     '  /** PTF names bound to the reference'),
    ('matchpathFns', '  /** PTF names bound to the reference',
     '  /** `from matchpath(on <rel>'),
    ('rewriteMatchPath', '  /** `from matchpath(on <rel>',
     '  /** Physical file layout of the multi-file fixtures'),
    ('noops', '  private val noopCallRe',
     '  /** Fallback for floating-point accumulation-order tails'),
    ('udtfCount2', '  private val udtfCount2Names',
     "  /** Hive-2.3 function semantics Spark's same-named built-ins"),
    ('macros', '  /** CREATE TEMPORARY MACRO bodies',
     '  /** SORT_AND_HASH goldens append'),
    ('windowInline', '  // ---- Hive window-dialect retry rewrites',
     '  /** Hive compares timestamp with numbers as epoch seconds'),
    ('errorRewrites', '  /** Hive compares timestamp with numbers as epoch seconds',
     '  /** Hive gives `||` the LOWEST precedence'),
    ('pipeConcat', '  /** Hive gives `||` the LOWEST precedence',
     '  private def emptyView'),
]

moved = {}
for name, start, end in REGIONS:
    i = text.find(start)
    assert i >= 0, f'start marker not found: {name}'
    assert text.find(start, i + 1) < 0, f'start marker not unique: {name}'
    j = text.find(end, i)
    assert j > i, f'end marker not found after start: {name}'
    moved[name] = text[i:j]
    text = text[:i] + text[j:]

# Drop the harness-local session-state vars (moving into HiveDialect).
state_block_start = '  /** Databases created by the replayed script:'
i = text.find(state_block_start)
assert i >= 0
j = text.find('  private var cboStructNames = false', i)
assert j > i
j = text.index('\n', j) + 1
text = text[:i] + text[j:]

# Harness call sites -> dialect.
SUBS = [
    ('withCharCastRetry(unionLimitSplit(mapReduceSugar(selSql)))',
     'dialect.withCharCastRetry(dialect.unionLimitSplit(\n      dialect.mapReduceSugar(selSql)))'),
    ('spark.sql(s"FROM $from ${mapReduceSugar(sel)}")',
     'spark.sql(s"FROM $from ${dialect.mapReduceSugar(sel)}")'),
    ('spark.sql(dialectShims(', 'spark.sql(dialect.rewrite('),
    ('tailExec(dialectShims(', 'tailExec(dialect.rewrite('),
    ('val q = dialectShims(repairMasked', 'val q = dialect.rewrite(repairMasked'),
    ('var ok = windowRewrites(query)', 'var ok = dialect.windowRewrites(query)'),
    ('val cands = errorRewrites(cur,', 'val cands = dialect.errorRewrites(cur,'),
    ('withCharCastRetry(sel) { s =>', 'dialect.withCharCastRetry(sel) { s =>'),
    ('matchpathFns += fname.toLowerCase', 'dialect.matchpathFns += fname.toLowerCase'),
    ('case "GenericUDTFCount2" => udtfCount2Names +=',
     'case "GenericUDTFCount2" => dialect.udtfCount2Names +='),
    ('cboStructNames = file.startsWith("cbo_")',
     'dialect.cboStructNames = file.startsWith("cbo_")'),
    ("if (t0.contains(\".\")) t0.split('.').head else currentDb",
     "if (t0.contains(\".\")) t0.split('.').head else dialect.currentDb"),
    ('(Seq(db, "default") ++ knownDbs)', '(Seq(db, "default") ++ dialect.knownDbs)'),
    ('macros(name.toLowerCase) = ', 'dialect.macros(name.toLowerCase) = '),
    ('macros.remove(m.group(1).toLowerCase))',
     'dialect.macros.remove(m.group(1).toLowerCase))'),
    ('case createDbRe(db) => knownDbs += db.toLowerCase',
     'case createDbRe(db) => dialect.knownDbs += db.toLowerCase'),
    ('currentDb = ql.stripPrefix("use ").trim.replace("`", "")',
     'dialect.currentDb = ql.stripPrefix("use ").trim.replace("`", "")'),
]
for old, new in SUBS:
    assert text.count(old) == 1, f'sub not unique or missing: {old!r} x{text.count(old)}'
    text = text.replace(old, new)

# Wire the harness fixture hooks into the dialect, right after the
# legacy timeParserPolicy conf line in the constructor.
anchor = '  spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")\n'
assert text.count(anchor) == 1
wiring = anchor + '''
  // Bind the main-tree HiveQL dialect pre-processor (HiveDialect) to
  // this harness's fixture machinery: virtual-column table rewrites,
  // deterministic qtest sampling, and vendored script-path shims.
  dialect.preRewrite = { q =>
    val q1 =
      if (q.toLowerCase.contains("input__file__name") ||
          q.toLowerCase.contains("block__offset__inside__file"))
        rewriteVcTables(q)
      else q
    testModeSample(randSeedViews(bucketFileSample(q1)))
  }
  dialect.scriptResolver = (s: String) => scriptShims.get(s)
'''
text = text.replace(anchor, wiring)

with open(HARNESS, 'w', encoding='utf-8', errors='surrogateescape') as f:
    f.write(text)

# ---------------- build the dialect file ----------------
body = []
order = ['usingRe', 'tsOnRe', 'dialectShims', 'groupingShim', 'matchpathFns',
         'rewriteMatchPath', 'noops', 'udtfCount2', 'macros', 'windowInline',
         'errorRewrites', 'pipeConcat', 'unionLimitSplit']
for name in order:
    body.append(moved[name].rstrip() + '\n')
code = '\n'.join(body)

# Adaptations.
ADAPT = [
    # public entry points
    ('  private def dialectShims(q000: String): String = {',
     '  def rewrite(q000: String): String = {'),
    ('  private def unionLimitSplit(sql: String): String = {',
     '  def unionLimitSplit(sql: String): String = {'),
    ('  private def mapReduceSugar(sel: String): String = sel match {',
     '  def mapReduceSugar(sel: String): String = sel match {'),
    ('  private def windowRewrites(q: String): Seq[String] = {',
     '  def windowRewrites(q: String): Seq[String] = {'),
    ('  private def errorRewrites(q: String, msg: String): Seq[String] = {',
     '  def errorRewrites(q: String, msg: String): Seq[String] = {'),
    ('  private def withCharCastRetry(sel: String)(body: String => Unit): Unit =',
     '  def withCharCastRetry(sel: String)(body: String => Unit): Unit ='),
    ('  private def intervalSugar(q: String): Option[String] = {',
     '  def intervalSugar(q: String): Option[String] = {'),
    ('  private def inlineWindowClauses(q0: String): String =',
     '  def inlineWindowClauses(q0: String): String ='),
    # state -> public fields (declared in class header; drop local defs)
    ('  private val matchpathFns =\n    scala.collection.mutable.Set[String]("matchpath")\n',
     '  val matchpathFns =\n    scala.collection.mutable.Set[String]("matchpath")\n'),
    ('  private val udtfCount2Names =\n    scala.collection.mutable.Set[String]()\n',
     '  val udtfCount2Names =\n    scala.collection.mutable.Set[String]()\n'),
    ('  private val macros = scala.collection.mutable\n    .Map[String, (Seq[String], String)]()\n',
     '  val macros = scala.collection.mutable\n    .Map[String, (Seq[String], String)]()\n'),
    # harness fixture sampling -> hook
    ('''    val q00x =
      if (q000.toLowerCase.contains("input__file__name") ||
          q000.toLowerCase.contains("block__offset__inside__file"))
        rewriteVcTables(q000)
      else q000
    val q00 = testModeSample(randSeedViews(bucketFileSample(q00x)))''',
     '    val q00 = preRewrite(q000)'),
    # script resolution -> hook
    ('scriptShims.get(\n        m.group(1).trim)', 'scriptResolver(\n        m.group(1).trim)'),
    # helper script: self-materialized, not a test resource
    ('''          val repo = new java.io.File("src/test/resources/scripts")
            .getAbsolutePath''',
     '          val repo = HiveDialect.helperScriptDir'),
    ('GoldenFixtures.splitTop', 'splitTop'),
]
for old, new in ADAPT:
    assert code.count(old) == 1, f'adapt not unique/missing: {old[:60]!r} x{code.count(old)}'
    code = code.replace(old, new)

header = '''package graft

import org.apache.spark.sql.SparkSession

/** HiveQL → Spark SQL dialect pre-processor: the pure text rewrites
  * that make Hive-2.3 query text parse — and mean what Hive meant —
  * under Spark's parser/analyzer. One instance per session; the
  * statement dispatcher ([[HiveStatements]]) owns one and routes SQL
  * text through [[rewrite]] before dispatch.
  *
  * Surface covered (reference grammar: ql/parse/HiveParser.g,
  * IdentifiersParser.g, ql/parse/WindowingSpec.java):
  *  - WINDOW-clause inheritance, forward refs and aliases, inlined
  *    into OVER sites ([[inlineWindowClauses]]);
  *  - `LIMIT offset,count`, FLOOR(ts TO unit), charset literals,
  *    `GROUP BY ()`, IN-predicate comparisons, Hive interval sugar
  *    ([[intervalSugar]]), `||` precedence, TABLESAMPLE(BUCKET..),
  *    MAP/REDUCE → TRANSFORM sugar ([[mapReduceSugar]]);
  *  - Hive function semantics spelled onto Spark equivalents
  *    (hash→hive_hash, population stddev/variance, struct field
  *    names, GROUPING__ID encoding, char/varchar truncating casts);
  *  - union-limit round-robin splits ([[unionLimitSplit]]), MatchPath
  *    PTF invocation, noop-PTF stripping, TRANSFORM tab-delimited IO;
  *  - error-driven retries ([[errorRewrites]], [[windowRewrites]]) for
  *    coercions Spark rejects outright (timestamp-vs-number compares,
  *    DISTINCT window aggregates, RANGE frame value semantics).
  *
  * Session state (current database, known databases, temporary macros,
  * matchpath function aliases) is mutated by the statement layer as
  * DDL executes. `preRewrite`/`scriptResolver` are binding hooks: test
  * harnesses attach fixture-aware table rewrites and script path
  * shims; production callers leave the identity defaults.
  */
class HiveDialect(val spark: SparkSession) {
  import HiveStatements.splitTop

  /** Database the session is USE-ing (current_database() folds to
    * this under the flat temp-view namespace). */
  var currentDb: String = "default"

  /** Databases created this session: db-qualified references to them
    * flatten onto the temp-view namespace. */
  val knownDbs = scala.collection.mutable.Set[String]()

  /** hive.cbo.returnpath.hiveop struct-field naming (expr$0..) — the
    * cbo_rp goldens record Calcite's names instead of col1..colN. */
  var cboStructNames: Boolean = false

  /** Fixture-aware rewrites applied before the dialect chain (test
    * harness hook; identity in production). */
  var preRewrite: String => String = identity

  /** Resolve a `USING '<script>'` command to a runnable replacement
    * (test harness hook; None keeps the original text). */
  var scriptResolver: String => Option[String] = _ => None

'''

tail = '''}

object HiveDialect {

  /** Directory holding the schema-less TRANSFORM helper filter
    * (materialized once per JVM): replays Hive's TextRecordReader
    * output contract — the line splits at the FIRST tab only (key =
    * first field, value = rest of line, tabs preserved), expressed by
    * rewriting just that tab to \\x01 for a delimited serde downstream
    * (ref ql/exec/ScriptOperator.java + TextRecordReader). */
  lazy val helperScriptDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dialect")
      .toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "first_tab_to_soh.py")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.print("import sys\\nfor line in sys.stdin:\\n" +
      "    sys.stdout.write(line.replace(\\"\\\\t\\", \\"\\\\x01\\", 1))\\n")
    w.close()
    f.deleteOnExit()
    dir.getAbsolutePath
  }
}
'''

with open(DIALECT, 'w', encoding='utf-8') as f:
    f.write(header + code + tail)
print('ok: wrote', DIALECT)
