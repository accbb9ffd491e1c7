package graft

/** A clean-room interpreter for the HPL/SQL procedural layer — the
  * reference's fourth entry point (`bin/hplsql`, grammar
  * hplsql/src/main/antlr4/.../Hplsql.g4, executor
  * hplsql/src/main/java/org/apache/hive/hplsql/Exec.java): procedural
  * control flow AROUND the SQL engine, with every embedded SQL
  * statement delegated to the session's [[HiveStatements]] dialect
  * dispatcher (where Exec.java delegates to JDBC connections).
  *
  * Implemented subset (the reference's local-test core):
  *  - DECLARE — standalone (`DECLARE a, b INT DEFAULT 1;`, several
  *    comma-separated declarations) and the PL/SQL anonymous-block
  *    header form (`DECLARE decls BEGIN body END;`)
  *  - assignment: `v := e;`, `v = e;` (bare, when v is declared),
  *    `SET v = e[, v2 = e2]`, `SET (a, b) = (e1, e2)`
  *  - PRINT expr
  *  - IF / ELSIF / ELSEIF / ELSE / END IF
  *  - WHILE cond LOOP body END LOOP  (END WHILE accepted)
  *  - FOR i IN [REVERSE] a..b [BY s] LOOP body END LOOP — the loop
  *    variable is scoped to the loop (for_range.sql prints the outer
  *    binding after END LOOP)
  *  - FOR rec IN (SELECT ...) LOOP body END LOOP — `rec.col`
  *    references bind per row
  *  - EXIT [label] [WHEN cond], BREAK
  *  - BEGIN body [EXCEPTION WHEN OTHERS THEN handler] END
  *  - EXECUTE IMMEDIATE expr
  *  - SELECT ... INTO v1, v2 ... FROM ...
  *  - anything else → one SQL statement through the engine, with
  *    declared variables substituted as literals (Exec.java's
  *    variable interpolation)
  *
  * Expressions evaluate through Spark SQL (`SELECT <expr>`) after
  * variable substitution — HPL/SQL's expression semantics ARE its
  * SQL dialect's, so delegating to the engine keeps `||`, BETWEEN,
  * IS NULL, CASE and every scalar function consistent with queries.
  *
  * Scale note: the procedural layer is driver-side control flow —
  * each embedded statement is still a full distributed Spark query;
  * the interpreter adds no data-path cost.
  */
final class Hplsql(engine: HiveStatements) {
  private val spark = engine.spark

  /** Variable store with LEXICAL routine scoping (var_scope.sql: a
    * local declared in p2 is invisible to p1 even when p2 calls p1,
    * and dies at p2's END): a routine invocation pushes a frame;
    * name lookup consults the CURRENT frame and the globals only —
    * never intermediate callers. Assignment writes where the name
    * lives (frame, then global), else creates in the current scope;
    * `declare` always creates in the current scope (shadowing). */
  private object vars {
    private val global =
      scala.collection.mutable.LinkedHashMap[String, Any]()
    private var frames: List[
      scala.collection.mutable.LinkedHashMap[String, Any]] = Nil
    private def scope = frames.headOption.getOrElse(global)
    private def pkgKey(n: String): Option[String] =
      if (currentPkg.nonEmpty && !n.contains("."))
        Some(currentPkg + "." + n).filter(global.contains)
      else None
    def get(n: String): Option[Any] =
      frames.headOption.flatMap(_.get(n)) match {
        case s @ Some(_) => s
        case None => global.get(n) match {
          case s @ Some(_) => s
          case None => pkgKey(n).flatMap(global.get)
        }
      }
    def contains(n: String): Boolean =
      frames.headOption.exists(_.contains(n)) || global.contains(n) ||
        pkgKey(n).isDefined
    def apply(n: String): Any = get(n).orNull
    def update(n: String, v: Any): Unit =
      if (frames.nonEmpty && frames.head.contains(n)) frames.head(n) = v
      else if (global.contains(n)) global(n) = v
      else pkgKey(n) match {
        case Some(k) => global(k) = v
        case None => scope(n) = v
      }
    def declare(n: String, v: Any): Unit = scope(n) = v
    def remove(n: String): Unit =
      if (frames.nonEmpty && frames.head.contains(n))
        frames.head.remove(n)
      else global.remove(n)
    def push(): Unit = frames ::=
      scala.collection.mutable.LinkedHashMap[String, Any]()
    def pop(): Unit = frames = frames.tail
  }
  private val out = Vector.newBuilder[String]

  /** Emit the reference's ctx-less trace lines (`EXEC PROCEDURE x` /
    * `EXEC FUNCTION x` on no-argument paren invocations, `INCLUDE
    * CONTENT <path> (non-empty)`) — the recorded local-test outputs
    * were made with trace on, and these are the only trace lines
    * that carry no `Ln:` prefix (Exec.java trace(null, ...)). Off by
    * default: programmatic callers get pure PRINT output. */
  var trace: Boolean = false

  /** Base directory for INCLUDE's relative paths (the reference
    * resolves them against the process working directory). */
  var includeDir: String = "."

  // the reference's predefined host-status variables (Exec.java
  // registers ERRORCODE/SQLCODE/HOSTCODE at startup)
  vars.declare("errorcode", 0)
  vars.declare("sqlcode", 0)
  vars.declare("hostcode", 0)

  // Oracle-semantics INSTR (negative start searches backward from
  // end+pos, occurrence counts in the search direction) — HPL/SQL's
  // Function.specExecSql instr; Spark's locate has neither form
  if (!spark.catalog.functionExists("hplsql_instr"))
  spark.udf.register("hplsql_instr",
    (s: String, sub: String, pos: Int, occ: Int) => {
      if (s == null || sub == null) null.asInstanceOf[java.lang.Integer]
      else if (pos == 0 || occ <= 0) Integer.valueOf(0)
      else if (pos > 0) {
        var idx = pos - 1
        var found = -1
        var k = occ
        var dead = false
        while (k > 0 && !dead) {
          found = s.indexOf(sub, idx)
          if (found < 0) dead = true else { idx = found + 1; k -= 1 }
        }
        Integer.valueOf(if (dead) 0 else found + 1)
      } else {
        var start = s.length + pos
        var found = -1
        var k = occ
        var dead = false
        while (k > 0 && !dead) {
          found = if (start < 0) -1 else s.lastIndexOf(sub, start)
          if (found < 0) dead = true else { start = found - 1; k -= 1 }
        }
        Integer.valueOf(if (dead) 0 else found + 1)
      }
    })

  private case class ExitLoop(label: String) extends RuntimeException
  private case class ReturnValue(v: Any) extends RuntimeException
  /** BTEQ `.QUIT` / an EXIT-mode condition handler ends the script. */
  private case class StopScript() extends RuntimeException

  /** DECLARE [CONTINUE|EXIT] HANDLER FOR <condition> <statement> —
    * SIGNAL looks the handler up by condition name; SQL errors match
    * the SQLEXCEPTION handlers. */
  private case class CondHandler(cond: String, exitMode: Boolean,
      stmt: String)
  private val condHandlers =
    scala.collection.mutable.ArrayBuffer[CondHandler]()

  /** Explicit cursors (DECLARE CURSOR c IS|FOR <query>; OPEN/FETCH/
    * CLOSE; c%ISOPEN / c%FOUND / c%NOTFOUND). The row buffer is
    * driver-side — the reference's JDBC fetch semantics; each
    * embedded query is still a full distributed job. */
  private final class Cursor(val query: String) {
    var rows: Iterator[org.apache.spark.sql.Row] = Iterator.empty
    var open: Boolean = false
    var lastFound: Option[Boolean] = None
  }
  private val cursors =
    scala.collection.mutable.LinkedHashMap[String, Cursor]()

  /** Stored procedures/functions (Exec.java functions map): body kept
    * as text, re-tokenized per invocation in its own cursor frame. */
  private case class Param(name: String, mode: String)
  private case class Routine(params: Seq[Param], body: String,
      isFunc: Boolean, pkg: String = "")
  private val routines =
    scala.collection.mutable.LinkedHashMap[String, Routine]()

  /** Package whose routine body is currently executing — bare
    * sibling-member and package-variable references resolve through
    * it (CREATE PACKAGE BODY; Package.java's package scope). */
  private var currentPkg: String = ""

  // ---------------------------------------------------------------
  // tokens — (text, lower, start, end) over the original script so
  // SQL statements and expressions slice out verbatim
  // ---------------------------------------------------------------

  private case class Tok(s: String, lo: String, a: Int, b: Int)

  private def tokenize(src: String): Vector[Tok] = {
    val ts = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && src.charAt(i + 1) == '-') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n &&
          !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '\'' || c == '"') {
        val q = c
        val a = i
        i += 1
        while (i < n && src.charAt(i) != q) {
          if (src.charAt(i) == '\\' && i + 1 < n) i += 1
          i += 1
        }
        i = math.min(n, i + 1)
        val s = src.substring(a, i)
        ts += Tok(s, s.toLowerCase, a, i)
      } else if (c.isLetter || c == '_') {
        val a = i
        while (i < n && (src.charAt(i).isLetterOrDigit ||
          src.charAt(i) == '_')) i += 1
        val s = src.substring(a, i)
        ts += Tok(s, s.toLowerCase, a, i)
      } else if (c.isDigit) {
        val a = i
        while (i < n && (src.charAt(i).isDigit ||
          src.charAt(i) == '.') &&
          // `1..10` keeps the range operator out of the number
          !(src.charAt(i) == '.' && i + 1 < n &&
            src.charAt(i + 1) == '.')) i += 1
        val s = src.substring(a, i)
        ts += Tok(s, s, a, i)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        val sym = if (Set(":=", "..", "||", "<=", ">=", "<>", "!=",
          "==").contains(two)) two else c.toString
        ts += Tok(sym, sym, i, i + sym.length)
        i += sym.length
      }
    }
    ts.result()
  }

  // ---------------------------------------------------------------
  // interpreter state over the token stream
  // ---------------------------------------------------------------

  private var toks: Vector[Tok] = Vector.empty
  private var src: String = ""
  private var p = 0

  private def cur: String = if (p < toks.size) toks(p).lo else ""
  private def at(i: Int): String =
    if (p + i < toks.size) toks(p + i).lo else ""
  private def eof: Boolean = p >= toks.size
  private def slice(a: Int, b: Int): String =
    src.substring(toks(a).a, toks(b - 1).b)

  /** Index just past this statement's terminating `;` (or block end),
    * tracking compound keywords so nested `;` don't split. */
  private def skipToSemi(from: Int): Int = {
    var i = from
    var depth = 0
    while (i < toks.size) {
      toks(i).lo match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case ";" if depth == 0 => return i + 1
        case _ =>
      }
      i += 1
    }
    toks.size
  }

  /** End of an EXPRESSION statement (PRINT's operand or a bare
    * top-level expression): the next top-level `;`, a block
    * terminator (END/ELSE/ELSIF/WHEN outside a CASE), or — the
    * reference's newline-delimited style (case.sql, cast2.sql have
    * no semicolons at all) — a token on a NEW LINE that starts a
    * statement. Returns the index of the terminator token. */
  private def exprEnd(from: Int): Int = {
    var i = from
    var depth = 0
    var caseDepth = 0
    while (i < toks.size) {
      val t = toks(i).lo
      if (t == "(") depth += 1
      else if (t == ")") depth -= 1
      else if (t == "case") caseDepth += 1
      else if (t == "end" && caseDepth > 0) caseDepth -= 1
      else if (depth == 0 && caseDepth == 0) {
        if (t == ";" || t == "end" || t == "else" || t == "elsif" ||
            t == "elseif" || t == "when") return i
        if (i > from &&
            src.substring(toks(i - 1).b, toks(i).a).contains('\n') && {
              stmtStarts.contains(t) || sqlHeads.contains(t) ||
                t == "." ||
                (isIdent(t) && i + 1 < toks.size &&
                  (toks(i + 1).lo == "=" || toks(i + 1).lo == ":=")) ||
                // a balanced expression followed on a NEW line by a
                // token that cannot continue it starts a new
                // statement (date.sql runs semicolon-less literals)
                (!exprContinuers.contains(toks(i - 1).lo) &&
                  !exprContinuers.contains(t))
            }) return i
      }
      i += 1
    }
    toks.size
  }

  /** Run statements until one of the `until` keywords appears at this
    * nesting level; leaves the cursor ON the terminator. */
  private def runUntil(until: Set[String]): Unit = {
    while (!eof && !until.contains(cur)) statement()
  }

  private def expect(kw: String): Unit = {
    if (cur != kw) throw new IllegalArgumentException(
      s"hplsql: expected '$kw' but found '${cur}' near ${ctx()}")
    p += 1
  }

  private def ctx(): String =
    toks.slice(math.max(0, p - 3), math.min(toks.size, p + 4))
      .map(_.s).mkString(" ")

  private def skipSemi(): Unit = if (cur == ";") p += 1

  // ---------------------------------------------------------------
  // expression / SQL evaluation through the engine
  // ---------------------------------------------------------------

  /** Render a variable value as a SQL literal. */
  private def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => b.toString
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case o => o.toString
  }

  /** Substitute declared variables into SQL text as literals —
    * Exec.java interpolates the same way before handing statements
    * to the database. `rec.col` row-field references substitute too. */
  private def substitute(sqlText: String): String = {
    val id = "(?<![\\w'])([A-Za-z_][\\w]*(?:\\.[A-Za-z_][\\w]*)?)".r
    val sb = new StringBuilder
    var last = 0
    // string literals are opaque: split on them, substitute between
    val parts = "('(?:[^']|'')*')".r.split(sqlText)
    val strs = "('(?:[^']|'')*')".r.findAllIn(sqlText).toVector
    parts.zipWithIndex.foreach { case (part, i) =>
      val rewritten = id.replaceAllIn(part, m => {
        val k = m.group(1).toLowerCase
        if (vars.contains(k))
          java.util.regex.Matcher.quoteReplacement(lit(vars(k)))
        else m.group(1)
      })
      sb.append(rewritten)
      if (i < strs.size) sb.append(strs(i))
    }
    sb.append(if (parts.size <= strs.size) strs.drop(parts.size)
      .mkString else "")
    last = 0
    sb.result()
  }

  /** Split an argument list at top-level commas (parens + strings
    * respected). */
  private def splitArgs(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = ' '
    s.foreach { c =>
      if (inStr != ' ') { cur.append(c); if (c == inStr) inStr = ' ' }
      else c match {
        case '\'' | '"' => cur.append(c); inStr = c
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case c2 => cur.append(c2)
      }
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Replace invocations of DECLARED HPL/SQL functions in an
    * expression with their evaluated results (as literals) — the
    * function body runs in its own cursor frame, its PRINTs emit
    * before the surrounding expression finishes, like Exec.java's
    * eager function evaluation. */
  private def resolveFunctionCalls(text0: String): String = {
    var s = text0
    var changed = true
    while (changed) {
      changed = false
      // every function under its stored key, plus bare aliases for
      // the executing package's own members (sibling calls)
      val aliases = routines.iterator.filter(_._2.isFunc).map(_._1)
        .flatMap { k =>
          val bare =
            if (currentPkg.nonEmpty &&
                k.startsWith(currentPkg + "."))
              Seq(k.substring(currentPkg.length + 1) -> k)
            else Nil
          Seq(k -> k) ++ bare
        }.toVector
      aliases
        .find { case (alias, name) =>
          val re = ("(?i)(?<![\\w.'])" +
            java.util.regex.Pattern.quote(alias) + "\\s*\\(").r
          re.findFirstMatchIn(s) match {
            case Some(m) =>
              var i = m.end
              var depth = 1
              var inStr = ' '
              while (i < s.length && depth > 0) {
                val c = s.charAt(i)
                if (inStr != ' ') { if (c == inStr) inStr = ' ' }
                else c match {
                  case '\'' | '"' => inStr = c
                  case '(' => depth += 1
                  case ')' => depth -= 1
                  case _ =>
                }
                i += 1
              }
              val argText = s.substring(m.end, i - 1)
              val args =
                if (argText.trim.isEmpty) Nil
                else splitArgs(argText)
              // the reference's ctx-less trace on no-arg calls
              if (trace && args.isEmpty) {
                val r = routines(name)
                out +=
                  (if (r.pkg.nonEmpty)
                    s"EXEC PACKAGE FUNCTION ${r.pkg.toUpperCase}." +
                      name.substring(r.pkg.length + 1)
                  else s"EXEC FUNCTION $name")
              }
              val v = invokeRoutine(name, args)
              s = s.substring(0, m.start) + lit(v) + s.substring(i)
              changed = true
              true
            case None => false
          }
        }
    }
    s
  }

  /** Rewrite one `name(args)` call site at a time until none match —
    * balanced-paren arg capture, same scan as resolveFunctionCalls. */
  private def rewriteCalls(s0: String, name: String)(
      f: Seq[String] => String): String = {
    var s = s0
    val re = ("(?i)(?<![\\w.'])" + java.util.regex.Pattern.quote(name) +
      "\\s*\\(").r
    var from = 0
    var guard = 0
    var m0 = re.findFirstMatchIn(s.substring(from))
    while (m0.isDefined && guard < 64) {
      guard += 1
      val m = m0.get
      val start = from + m.start
      var i = from + m.end
      var depth = 1
      var inStr = ' '
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (inStr != ' ') { if (c == inStr) inStr = ' ' }
        else c match {
          case '\'' | '"' => inStr = c
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      val args = splitArgs(s.substring(from + m.end, i - 1))
      val repl = f(args)
      s = s.substring(0, start) + repl + s.substring(i)
      // resume past the replacement: same-name calls INSIDE it are
      // already in final form (identity or rewritten args)
      from = start + repl.length
      m0 = if (from >= s.length) None
        else re.findFirstMatchIn(s.substring(from))
    }
    s
  }

  /** Split on a top-level two-char operator (strings and parens
    * respected); returns the single input when absent. */
  private def splitTopLevel(s: String, op: String): Seq[String] = {
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr != ' ') { cur.append(c); if (c == inStr) inStr = ' ' }
      else if (c == '\'' || c == '"') { cur.append(c); inStr = c }
      else if (c == '(') { depth += 1; cur.append(c) }
      else if (c == ')') { depth -= 1; cur.append(c) }
      else if (depth == 0 && i + 1 < s.length &&
          s.substring(i, i + 2) == op) {
        parts += cur.result(); cur.clear(); i += 1
      } else cur.append(c)
      i += 1
    }
    parts += cur.result()
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  /** HPL/SQL → Spark SQL expression surface: the dialect quirks the
    * reference's Exec.java/Function.java evaluate natively, rendered
    * as equivalent Spark expressions (recorded local-test semantics;
    * see the results/local recordings for each): `||`/CONCAT skip NULL
    * operands (NULL only when ALL are NULL), LEN trims trailing
    * blanks, CHAR(x)/1-arg TO_CHAR cast to string, CAST AS
    * CHAR(n)/VARCHAR(n) truncate, TIMESTAMP_ISO / DB2 dash-dot
    * timestamp literals, Oracle TO_TIMESTAMP formats, `<n> DAY[S]`
    * interval sugar (MICROSECOND adds a millisecond, matching the
    * recorded interval.out.txt), and int-only `/` divides
    * integrally. */
  private def rewriteExpr(s0: String): String = {
    var s = s0
    // cursor attributes evaluate against CURRENT cursor state:
    // %ISOPEN -> bool, %FOUND/%NOTFOUND -> NULL before first FETCH
    s = "(?i)([A-Za-z_]\\w*)\\s*%\\s*(isopen|found|notfound)".r
      .replaceAllIn(s, m => cursors.get(m.group(1).toLowerCase) match {
        case Some(c) => m.group(2).toLowerCase match {
          case "isopen" => c.open.toString
          case "found" => c.lastFound.map(_.toString).getOrElse("NULL")
          case _ => c.lastFound.map(b => (!b).toString).getOrElse("NULL")
        }
        case None => m.matched
      })
    // DB2 timestamp literal TIMESTAMP '2015-03-03-11.39.31.123'
    s = ("(?i)TIMESTAMP\\s*'(\\d{4}-\\d{2}-\\d{2})-(\\d{2})\\." +
      "(\\d{2})\\.(\\d{2})(\\.\\d+)?'").r
      .replaceAllIn(s, m => "TIMESTAMP '" + m.group(1) + " " +
        m.group(2) + ":" + m.group(3) + ":" + m.group(4) +
        Option(m.group(5)).getOrElse("") + "'")
    // null-skipping concatenation (top level)
    val cat = splitTopLevel(s, "||")
    if (cat.size > 1)
      s = "CASE WHEN " + cat.map(a => s"($a) IS NULL")
        .mkString(" AND ") + " THEN NULL ELSE CONCAT_WS(''," +
        cat.map(a => s"CAST(($a) AS STRING)").mkString(",") + ") END"
    s = rewriteCalls(s, "concat") { args =>
      "CASE WHEN " + args.map(a => s"($a) IS NULL")
        .mkString(" AND ") + " THEN NULL ELSE CONCAT_WS(''," +
        args.map(a => s"CAST(($a) AS STRING)").mkString(",") + ") END"
    }
    s = rewriteCalls(s, "cast") { a =>
      val one = a.mkString(", ")
      val m = "(?is)^(.*\\S)\\s+AS\\s+(CHAR|VARCHAR)\\s*" +
        "(?:\\(\\s*(\\d+)\\s*\\))?\\s*$"
      one match {
        case x if x.matches(m) =>
          val mm = m.r.findFirstMatchIn(x).get
          val base = s"CAST(${mm.group(1)} AS STRING)"
          Option(mm.group(3)) match {
            case Some(n) => s"SUBSTR($base, 1, $n)"
            case None => base
          }
        case x => s"CAST($x)"
      }
    }
    s = rewriteCalls(s, "nvl")(a => s"COALESCE(${a.mkString(", ")})")
    s = rewriteCalls(s, "char")(a => s"CAST(${a.head} AS STRING)")
    s = rewriteCalls(s, "len")(a => s"LENGTH(RTRIM(${a.head}))")
    s = rewriteCalls(s, "timestamp_iso")(a =>
      s"CAST(${a.head} AS TIMESTAMP)")
    s = rewriteCalls(s, "to_char") { a =>
      if (a.size == 1) s"CAST(${a.head} AS STRING)"
      else s"TO_CHAR(${a.mkString(", ")})"
    }
    s = rewriteCalls(s, "to_timestamp") { a =>
      if (a.size == 2 && a(1).trim.startsWith("'")) {
        val fmt = a(1).trim.stripPrefix("'").stripSuffix("'")
          .toUpperCase.replace("YYYY", "yyyy").replace("DD", "dd")
          .replace("HH24", "HH").replace("MI", "mm").replace("SS", "ss")
        s"TO_TIMESTAMP(${a.head}, '$fmt')"
      } else s"TO_TIMESTAMP(${a.mkString(", ")})"
    }
    s = rewriteCalls(s, "instr") { a =>
      val p4 = a.padTo(3, "1").padTo(4, "1")
      s"hplsql_instr(${p4.mkString(", ")})"
    }
    s = rewriteCalls(s, "date")(a => s"TO_DATE(${a.mkString(", ")})")
    // interval sugar
    val dateHead =
      "(?is)^\\s*(DATE\\s*'[^']*')\\s*([+-])\\s*(.+?)\\s+DAYS?\\s*$".r
    s = dateHead.findFirstMatchIn(s)
        .filter(m => !m.group(3).toLowerCase.contains("interval")) match {
      case Some(m) =>
        val fn = if (m.group(2) == "+") "DATE_ADD" else "DATE_SUB"
        s"$fn(${m.group(1)}, (${m.group(3)}))"
      case None =>
        val operand = "([A-Za-z_]\\w*\\s*\\([^()]*\\)|\\d+(?:\\.\\d+)?)"
        var t = ("(?i)([+-])\\s*" + operand + "\\s+DAYS?\\b").r
          .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
            s"${m.group(1)} make_interval(0, 0, 0, (${m.group(2)}))"))
        t = ("(?i)([+-])\\s*" + operand + "\\s+MICROSECONDS?\\b").r
          .replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(
            s"${m.group(1)} make_interval(0, 0, 0, 0, 0, 0, " +
              s"(${m.group(2)}) * 0.001)"))
        // a fraction-less TIMESTAMP literal has scale 0, and the
        // reference PRINTS scale-0 timestamp arithmetic truncated to
        // 19 chars (Var.toString len = 19 + scale) — interval.out.txt
        // records `- 1 DAY - 1 MICROSECOND` as 23:59:59, not .999
        if (t != s &&
            t.matches("(?is)^\\s*TIMESTAMP\\s*'[^'.]*'.*"))
          t = s"CAST(DATE_TRUNC('SECOND', ($t)) AS TIMESTAMP)"
        t
    }
    // integer division on an all-integer arithmetic expression
    if (s.contains("/") && s.matches("^[\\d\\s().+\\-*/%]+$"))
      s = s.replace("/", " div ")
    s
  }

  /** Evaluate `SELECT <body>` ANSI-first: ANSI raises divide-by-zero
    * (exception_divide_by_zero.out.txt expects the handler to fire
    * where non-ANSI Spark would return NULL); anything else that only
    * fails under ANSI falls back to the engine's normal mode. */
  private def evalRaw(body: String): Any = {
    val q = s"SELECT $body"
    val key = "spark.sql.ansi.enabled"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      try spark.sql(q).collect().head.get(0)
      catch {
        case ex: Throwable if String.valueOf(ex.getMessage)
            .contains("DIVIDE_BY_ZERO") =>
          throw new RuntimeException("hplsql: divide by zero")
        case _: org.apache.spark.SparkThrowable |
            _: java.lang.ArithmeticException =>
          spark.conf.set(key, "false")
          spark.sql(q).collect().head.get(0)
      }
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Evaluate an expression. An identifier that resolves to nothing
    * is an UNDECLARED VARIABLE and reads as NULL (Exec.java returns
    * an empty Var) — retried textually off Spark's unresolved-column
    * error so SQL-visible names never get clobbered up front. */
  private def evalExpr(e: String): Any = {
    var rendered = rewriteExpr(substitute(resolveFunctionCalls(e.trim)))
    var attempts = 0
    while (true) {
      try return evalRaw(rendered)
      catch {
        case ex: Throwable if attempts < 5 &&
            String.valueOf(ex.getMessage)
              .contains("UNRESOLVED_COLUMN") =>
          val name = "`([A-Za-z_][\\w.]*)`".r
            .findFirstMatchIn(String.valueOf(ex.getMessage))
            .map(_.group(1))
            .getOrElse(throw ex)
          val re = ("(?i)(?<![\\w.'])" +
            java.util.regex.Pattern.quote(name) + "(?![\\w.(])").r
          // string literals are opaque — replace only between them
          val lit = "('(?:[^']|'')*')".r
          val parts = lit.pattern.split(rendered, -1)
          val strs = lit.findAllIn(rendered).toVector
          val next = parts.zipWithIndex.map { case (part, i) =>
            re.replaceAllIn(part, "NULL") +
              (if (i < strs.size) strs(i) else "")
          }.mkString
          if (next == rendered) throw ex
          rendered = next
          attempts += 1
      }
    }
    null // unreachable
  }

  private def evalCond(c: String): Boolean = {
    val rendered = rewriteExpr(substitute(resolveFunctionCalls(c.trim)))
    evalRaw(s"CASE WHEN ($rendered) THEN true ELSE false END") match {
      case b: java.lang.Boolean => b.booleanValue()
      case _ => false
    }
  }

  /** Run a routine: IN args evaluate in the caller's scope, params
    * bind as shadowing locals, OUT/INOUT params write back to bare
    * caller variables after the body, RETURN supplies the function
    * value. */
  private def invokeRoutine(name: String, argExprs: Seq[String]): Any = {
    val r = routines(name)
    val padded = argExprs.map(Option(_)).padTo(r.params.size, None)
    val argVals = r.params.zip(padded).map {
      case (pm, _) if pm.mode == "OUT" => null
      case (_, Some(e)) => evalExpr(e)
      case (_, None) => null
    }
    vars.push()
    r.params.zip(argVals).foreach { case (pm, v) =>
      vars.declare(pm.name, v) }
    var ret: Any = null
    val (t0, s0, p0) = (toks, src, p)
    val pkg0 = currentPkg
    currentPkg = r.pkg
    toks = tokenize(r.body); src = r.body; p = 0
    var outVals: Seq[Any] = Nil
    try runUntil(Set.empty)
    catch {
      case ReturnValue(v) => ret = v
      case ExitLoop(_) =>
    } finally {
      toks = t0; src = s0; p = p0
      currentPkg = pkg0
      outVals = r.params.map(pm => vars.get(pm.name).orNull)
      vars.pop()
    }
    r.params.zipWithIndex.foreach { case (pm, i) =>
      if ((pm.mode == "OUT" || pm.mode == "INOUT") &&
          i < argExprs.size && argExprs(i) != null) {
        val target = argExprs(i).trim.toLowerCase
        if (target.matches("[a-z_]\\w*")) vars(target) = outVals(i)
      }
    }
    ret
  }

  private def runSql(text: String): Option[Seq[org.apache.spark.sql.Row]] =
    engine.sql(substitute(text)).map(_.collect().toSeq)

  // ---------------------------------------------------------------
  // statements
  // ---------------------------------------------------------------

  /** Statement heads that are SQL for the engine, not bare
    * expressions (the reference evaluates and PRINTS a top-level
    * expression statement — lang.sql, add.sql, twopipes.sql). */
  private val sqlHeads = Set("select", "insert", "update", "delete",
    "merge", "create", "drop", "alter", "grant", "revoke", "use",
    "show", "describe", "desc", "load", "truncate", "with", "analyze",
    "msck", "explain", "import", "export", "values", "refresh",
    "cache", "uncache", "commit", "rollback", "copy", "host")

  /** Statement-opening keywords a Transact-SQL IF condition cannot
    * contain — the scan for the condition's end. */
  private val stmtStarts = Set("print", "begin", "break", "set", "if",
    "while", "for", "call", "return", "exit", "signal", "leave",
    "select", "insert", "update", "delete", "declare", "execute")

  /** Tokens that continue an expression across a newline — if the
    * last token of the line or the first of the next is one of
    * these, the expression is unfinished. */
  private val exprContinuers = Set("+", "-", "*", "/", "%", "||",
    "=", "==", "!=", "<>", "<", ">", "<=", ">=", ",", ".", "(",
    "and", "or", "not", "in", "is", "between", "like", "div",
    "when", "then", "else", "case")

  /** Label pending for the next loop statement (`lbl:` / `<<lbl>>`). */
  private var pendingLabel: String = ""

  private def statement(): Unit = cur match {
    case ";" => p += 1
    case "null" if at(1) == ";" || at(1) == "" =>
      p += 1; skipSemi() // the PL/SQL no-op statement
    case "declare" => declare()
    case "set" => setStmt()
    case "print" =>
      p += 1
      val stop = exprEnd(p)
      // hplsql's grammar has no double-quoted strings: `print "x"`
      // echoes the quotes (create_package3.out.txt)
      if (stop - p == 1 && toks(p).s.startsWith("\""))
        out += toks(p).s
      else out += Option(evalExpr(slice(p, stop))).map(formatValue)
        .getOrElse("null")
      p = stop
      skipSemi()
    case "dbms_output" if at(1) == "." && at(2) == "put_line" =>
      p += 3
      expect("(")
      var depth = 1
      val a = p
      while (!eof && depth > 0) {
        if (cur == "(") depth += 1
        if (cur == ")") depth -= 1
        p += 1
      }
      out += Option(evalExpr(slice(a, p - 1))).map(formatValue)
        .getOrElse("null")
      skipSemi()
    case "if" => ifStmt()
    case "while" => whileStmt()
    case "for" => forStmt()
    case "begin" => beginBlock()
    case "exit" | "break" =>
      val isBreak = cur == "break"
      p += 1
      if (!isBreak && cur == "when") {
        p += 1
        val end = skipToSemi(p)
        val stop = if (toks(end - 1).lo == ";") end - 1 else end
        val cond = slice(p, stop)
        p = end
        if (evalCond(cond)) throw ExitLoop("")
      } else if (!isBreak && isIdent(cur) && cur != ";") {
        val label = cur
        p += 1
        skipSemi()
        throw ExitLoop(label)
      } else {
        skipSemi()
        throw ExitLoop("")
      }
    case "leave" =>
      p += 1
      val label = if (isIdent(cur)) { val l = cur; p += 1; l } else ""
      skipSemi()
      throw ExitLoop(label)
    case "open" if cursors.contains(at(1)) =>
      p += 1
      val c = cursors(cur)
      p += 1
      if (cur == "(") { // parameterized-open arguments unsupported;
        var d = 0       // consume the list
        while (!eof && { val c0 = cur
          if (c0 == "(") d += 1
          if (c0 == ")") d -= 1
          p += 1
          d > 0 }) {}
      }
      skipSemi()
      c.rows = spark.sql(substitute(resolveFunctionCalls(c.query)))
        .collect().iterator
      c.open = true
      c.lastFound = None
    case "fetch" =>
      p += 1
      val name = cur
      p += 1
      expect("into")
      val targets = Vector.newBuilder[String]
      targets += cur
      p += 1
      while (cur == ",") { p += 1; targets += cur; p += 1 }
      skipSemi()
      cursors.get(name) match {
        case Some(c) if c.open =>
          if (c.rows.hasNext) {
            val r = c.rows.next()
            targets.result().zipWithIndex.foreach { case (t, i) =>
              if (i < r.length) vars(t) = r.get(i) }
            c.lastFound = Some(true)
          } else c.lastFound = Some(false)
        case _ =>
          // the reference's runtime error text (exception.sql's
          // recorded trace) — catchable by EXCEPTION handlers
          throw new RuntimeException(s"Cursor not found: $name")
      }
    case "close" if cursors.contains(at(1)) =>
      p += 1
      cursors(cur).open = false
      cursors(cur).lastFound = None
      p += 1
      skipSemi()
    case "signal" =>
      p += 1
      val name = cur
      p += 1
      skipSemi()
      raiseCondition(name)
    case "include" =>
      includeStmt()
    case "." if at(1) == "if" =>
      // BTEQ dot-command: `.if <cond> then .quit <code>` — the only
      // recorded form (if3_bteq.sql); .quit ends the script
      p += 2
      val cond = condUntil(Set("then"))
      expect("then")
      val lineEnd = {
        val nl = src.indexOf('\n', if (p < toks.size) toks(p).a else
          src.length)
        if (nl < 0) src.length else nl
      }
      val isQuit = cur == "." && at(1) == "quit"
      while (!eof && toks(p).a < lineEnd) p += 1
      if (isQuit && evalCond(cond)) throw StopScript()
    case "create" if (at(1) == "package" ||
        (at(1) == "or" && at(2) == "replace" && at(3) == "package")) =>
      createPackage()
    case "create" if routineCreateAhead => createRoutine()
    case "function" | "procedure" | "proc"
        if isIdent(at(1)) && Set("(", "begin", "returns", "return",
          "as", "is", "declare").contains(at(2)) =>
      createRoutine(consumeCreate = false)
    case "call" =>
      p += 1
      if (isIdent(cur) && at(1) == "." &&
          routines.contains(cur + "." + at(2)))
        invokeFromCursor(viaCall = true,
          nameOverride = cur + "." + at(2), nameTokens = 3)
      else invokeFromCursor(viaCall = true)
    case "return" =>
      p += 1
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      val v = if (stop > p) evalExpr(slice(p, stop)) else null
      p = end
      throw ReturnValue(v)
    case n if routines.contains(n) &&
        (at(1) == "(" || at(1) == ";" || at(1) == "") =>
      invokeFromCursor(viaCall = false)
    case n if isIdent(n) && at(1) == "." &&
        routines.contains(n + "." + at(2)) &&
        (at(3) == "(" || at(3) == ";" || at(3) == "") =>
      // qualified package-member invocation: pack.member(...)
      invokeFromCursor(viaCall = false,
        nameOverride = n + "." + at(2), nameTokens = 3)
    case n if currentPkg.nonEmpty &&
        routines.contains(currentPkg + "." + n) &&
        (at(1) == "(" || at(1) == ";" || at(1) == "") =>
      // bare sibling-member invocation inside a package body
      invokeFromCursor(viaCall = false,
        nameOverride = currentPkg + "." + n, nameTokens = 1)
    case "execute" if at(1) == "immediate" =>
      p += 2
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      val text = String.valueOf(evalExpr(slice(p, stop)))
      p = end
      runSql(text)
    case "select" if hasTopLevelInto(p) => selectInto()
    case "values" if hasTopLevelInto(p) => valuesInto()
    case _ if isAssignment => assignment()
    case l if isIdent(l) && at(1) == ":" &&
        Set("while", "for", "begin", "loop").contains(at(2)) =>
      pendingLabel = l
      p += 2
      statement()
    case "<" if at(1) == "<" && isIdent(at(2)) && at(3) == ">" &&
        at(4) == ">" =>
      pendingLabel = at(2)
      p += 5
      statement()
    case h if sqlHeads.contains(h) =>
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      val text = slice(p, stop)
      p = end
      runSql(text)
    case _ =>
      // top-level expression statement: evaluate and print the
      // value (Exec.java visitExpr_stmt)
      val stop = exprEnd(p)
      out += Option(evalExpr(slice(p, stop))).map(formatValue)
        .getOrElse("null")
      p = stop
      skipSemi()
  }

  /** SIGNAL <name> / a raised SQL error: run the innermost matching
    * handler; an EXIT handler then ends the enclosing script. */
  private def raiseCondition(name: String): Unit =
    condHandlers.reverseIterator.find(_.cond == name.toLowerCase) match {
      case Some(h) =>
        runInline(h.stmt)
        if (h.exitMode) throw StopScript()
      case None =>
        throw new RuntimeException(s"hplsql: unhandled condition $name")
    }

  /** Execute a statement-list text in the CURRENT scope (include
    * files, condition-handler bodies). */
  private def runInline(text: String): Unit = {
    val (t0, s0, p0) = (toks, src, p)
    toks = tokenize(text); src = text; p = 0
    try runUntil(Set.empty)
    finally { toks = t0; src = s0; p = p0 }
  }

  /** INCLUDE <path-to-end-of-line> | INCLUDE <string expression>. */
  private def includeStmt(): Unit = {
    p += 1 // include
    val lineEnd = {
      val nl = src.indexOf('\n', if (p < toks.size) toks(p).a
        else src.length)
      if (nl < 0) src.length else nl
    }
    val a = p
    while (!eof && toks(p).a < lineEnd) p += 1
    val raw = slice(a, p).trim
    val path =
      if (raw.startsWith("'")) String.valueOf(evalExpr(raw))
      else raw
    val f0 = new java.io.File(path)
    val f = if (f0.isAbsolute) f0 else new java.io.File(includeDir, path)
    val content = {
      val srcF = scala.io.Source.fromFile(f, "UTF-8")
      try srcF.mkString finally srcF.close()
    }
    if (trace) out += s"INCLUDE CONTENT $path " +
      (if (content.trim.nonEmpty) "(non-empty)" else "(empty)")
    runInline(content)
  }

  private def formatValue(v: Any): String = v match {
    case d: java.math.BigDecimal =>
      // literals keep their written scale (lang.out.txt records 1.0);
      // computed decimals shed noise zeros beyond that
      if (d.scale <= 0 || d.remainder(java.math.BigDecimal.ONE)
          .compareTo(java.math.BigDecimal.ZERO) != 0)
        d.stripTrailingZeros.toPlainString
      else d.setScale(1, java.math.RoundingMode.UNNECESSARY)
        .toPlainString
    case t: java.sql.Timestamp =>
      // the reference prints timestamps at millisecond precision with
      // trailing zeros (and an empty fraction) dropped
      // (timestamp.out.txt: .123456 renders .123, :31 renders bare) —
      // rendered in the SESSION time zone (Timestamp.toString would
      // use the JVM zone, which the golden test JVM pins elsewhere)
      val zone = java.time.ZoneId.of(
        spark.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID))
      val ldt = java.time.LocalDateTime.ofInstant(t.toInstant, zone)
      val base = ldt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
      val ms = ldt.getNano / 1000000
      if (ms == 0) base
      else base + "." + f"$ms%03d".reverse.dropWhile(_ == '0').reverse
    case o => String.valueOf(o)
  }

  /** `name := expr` always assigns; `name = expr` assigns when the
    * name is declared OR is a plain identifier heading the statement
    * (the reference auto-creates variables on assignment —
    * assign.sql runs with nothing declared and records no output). */
  private def isAssignment: Boolean =
    isIdent(cur) && !routines.contains(cur) &&
      (at(1) == ":=" ||
        (at(1) == "=" && (vars.contains(cur) ||
          (!sqlHeads.contains(cur) && !stmtStarts.contains(cur)))))

  private def assignment(): Unit = {
    val name = cur
    p += 2 // name, :=/=
    val end = skipToSemi(p)
    val stop = if (toks(end - 1).lo == ";") end - 1 else end
    vars(name) = evalExpr(slice(p, stop))
    p = end
  }

  private val stmtKws = Set("print", "if", "while", "for", "set",
    "select", "insert", "update", "delete", "merge", "create", "drop",
    "alter", "execute", "grant", "revoke", "use", "show", "describe",
    "desc", "load", "truncate", "exit", "break", "values", "with",
    "declare")

  /** Does a BEGIN follow with only declaration-shaped statements
    * before it? Distinguishes the PL/SQL anonymous-block header from
    * a standalone DECLARE followed later by an unrelated block. */
  private def blockAhead(): Boolean = {
    var i = p
    while (i < toks.size) {
      if (toks(i).lo == ";") i += 1
      else if (toks(i).lo == "begin") return true
      else if (stmtKws.contains(toks(i).lo)) return false
      else {
        while (i < toks.size && toks(i).lo != ";") {
          if (stmtKws.contains(toks(i).lo)) return false
          i += 1
        }
      }
    }
    false
  }

  /** DECLARE — one or more `names type [:=|=|DEFAULT expr]` groups,
    * the anonymous-block header (`DECLARE decls BEGIN ... END`), a
    * named CONDITION, or a [CONTINUE|EXIT] HANDLER registration. */
  private def declare(): Unit = {
    p += 1 // declare
    if (isIdent(cur) && at(1) == "condition" &&
        (at(2) == ";" || at(2) == "")) {
      // DECLARE <name> CONDITION; — names exist only to be SIGNALed
      p += 2
      skipSemi()
      return
    }
    if ((cur == "exit" || cur == "continue") && at(1) == "handler" &&
        at(2) == "for") {
      val exitMode = cur == "exit"
      p += 3
      val conds = Vector.newBuilder[String]
      conds += cur
      p += 1
      // `NOT FOUND` is a two-token condition
      if (conds.result().lastOption.contains("not") && cur == "found") {
        p += 1
      }
      while (cur == ",") { p += 1; conds += cur; p += 1 }
      // the handler body is ONE statement — possibly a (labeled)
      // BEGIN..END block
      val hs = p
      if (cur == "begin" ||
          (isIdent(cur) && at(1) == ":" && at(2) == "begin")) {
        if (cur != "begin") p += 2
        p += 1
        skipBody(Set("end"))
        p += 1 // end
        skipSemi()
      } else p = skipToSemi(p)
      val stmt = slice(hs, p)
      conds.result().foreach(c =>
        condHandlers += CondHandler(c.toLowerCase, exitMode, stmt))
      skipSemi()
      return
    }
    declGroup()
    if (cur == ";" && blockAhead()) {
      while (cur == ";") {
        p += 1
        if (cur != "begin" && !eof) declGroup()
      }
      if (cur == "begin") beginBlock()
    } else skipSemi()
  }

  /** `a, b INT := 1, c SMALLINT, d INT DEFAULT 100` — names collect
    * until a non-name token, the type tokens skip, an initializer
    * assigns every name in the group. */
  private def declGroup(): Unit = {
    while (!eof && cur != ";" && cur != "begin") {
      // CURSOR c IS|FOR <query> / c CURSOR IS|FOR <query>
      if (cur == "cursor" || at(1) == "cursor") {
        val name = if (cur == "cursor") { p += 1; val n = cur; p += 1; n }
          else { val n = cur; p += 2; n }
        if (cur == "is" || cur == "for") p += 1
        val stop = skipToSemi(p)
        val e = if (toks(stop - 1).lo == ";") stop - 1 else stop
        cursors(name) = new Cursor(slice(p, e))
        p = stop - (if (toks(stop - 1).lo == ";") 1 else 0)
        return
      }
      val names = Vector.newBuilder[String]
      names += cur
      p += 1
      while (cur == "," && at(1) != "" && isIdent(at(1)) &&
          (at(2) == "," || isTypeTok(at(2)) || at(2) == ";" ||
            at(2) == ":=" || at(2) == "=" || at(2) == "default")) {
        p += 1
        names += cur
        p += 1
      }
      // type tokens (CHAR(10), UTL_FILE.FILE_TYPE, INT, ...)
      while (!eof && cur != ";" && cur != "," && cur != ":=" &&
          cur != "=" && cur != "default" && cur != "begin") {
        if (cur == "(") { // type precision
          var depth = 0
          while (!eof && { val c0 = cur
            if (c0 == "(") depth += 1
            if (c0 == ")") depth -= 1
            p += 1
            depth > 0 }) {}
        } else p += 1
      }
      val init: Any =
        if (cur == ":=" || cur == "=" || cur == "default") {
          p += 1
          val stop = {
            var i = p
            var depth = 0
            while (i < toks.size && !(depth == 0 &&
                (toks(i).lo == ";" || toks(i).lo == "," ||
                  toks(i).lo == "begin"))) {
              if (toks(i).lo == "(") depth += 1
              if (toks(i).lo == ")") depth -= 1
              i += 1
            }
            i
          }
          val v = evalExpr(slice(p, stop))
          p = stop
          v
        } else null
      names.result().foreach(n => vars.declare(n, init))
      if (cur == ",") p += 1 else return
    }
  }

  private def isIdent(s: String): Boolean =
    s.nonEmpty && (s.head.isLetter || s.head == '_')
  private def isTypeTok(s: String): Boolean = isIdent(s)

  /** SET v = e[, v2 = e2];  SET (a, b) = (e1, e2); */
  private def setStmt(): Unit = {
    p += 1 // set
    if (cur == "(") {
      p += 1
      val names = Vector.newBuilder[String]
      while (cur != ")") { if (cur != ",") names += cur; p += 1 }
      p += 1 // )
      expect("=")
      expect("(")
      val ns = names.result()
      ns.foreach { n =>
        var depth = 0
        val a = p
        while (!eof && !(depth == 0 &&
            (cur == "," || cur == ")"))) {
          if (cur == "(") depth += 1
          if (cur == ")") depth -= 1
          p += 1
        }
        vars(n) = evalExpr(slice(a, p))
        if (cur == ",") p += 1
      }
      if (cur == ")") p += 1
      skipSemi()
    } else {
      var more = true
      while (more) {
        val name = cur
        p += 1
        if (cur == ":=") p += 1 else expect("=")
        var depth = 0
        val a = p
        while (!eof && !(depth == 0 &&
            (cur == "," || cur == ";"))) {
          if (cur == "(") depth += 1
          if (cur == ")") depth -= 1
          p += 1
        }
        vars(name) = evalExpr(slice(a, p))
        if (cur == ",") p += 1 else more = false
      }
      skipSemi()
    }
  }

  private def condUntil(stops: Set[String]): String = {
    var depth = 0
    val a = p
    while (!eof && !(depth == 0 && stops.contains(cur))) {
      if (cur == "(") depth += 1
      if (cur == ")") depth -= 1
      p += 1
    }
    slice(a, p)
  }

  /** Does a top-level THEN appear before the first statement keyword?
    * Distinguishes classic `IF c THEN ... END IF` from the
    * Transact-SQL `IF c <stmt>` / `IF c BEGIN ... END` forms, both in
    * dispatch and in balanced skipping (a T-SQL IF closes with no
    * END). */
  private def thenAhead(from: Int): Boolean = {
    var i = from
    var depth = 0
    while (i < toks.size) {
      toks(i).lo match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case "then" if depth == 0 => return true
        case ";" if depth == 0 => return false
        case k if depth == 0 && stmtStarts.contains(k) => return false
        case _ =>
      }
      i += 1
    }
    false
  }

  /** Skip a balanced statement-list without executing (the untaken
    * IF branches), tracking nested compound statements. WHILE/FOR
    * open one level and their intro token (LOOP/DO/THEN/BEGIN) is
    * swallowed without double-counting; a Transact-SQL IF opens
    * nothing (it has no END IF). */
  private def skipBody(until: Set[String]): Unit = {
    var depth = 0
    var pendingIntro = false
    while (!eof) {
      cur match {
        case k if depth == 0 && !pendingIntro && until.contains(k) =>
          return
        case "while" | "for" =>
          depth += 1; pendingIntro = true; p += 1
        case "loop" | "do" | "then" | "begin" if pendingIntro =>
          pendingIntro = false; p += 1
        case "if" =>
          if (thenAhead(p + 1)) depth += 1
          p += 1
        case "begin" | "case" => depth += 1; p += 1
        case "loop" if toks(math.max(0, p - 1)).lo != "end" =>
          depth += 1; p += 1
        case "end" =>
          if (at(1) == "if" || at(1) == "loop" || at(1) == "while" ||
              at(1) == "case") {
            depth -= 1; p += 2
          } else { depth -= 1; p += 1 }
        case _ => p += 1
      }
    }
  }

  /** Skip exactly one statement (the untaken branch of a T-SQL IF):
    * a BEGIN...END block or a single `...;` statement. */
  private def skipOneStatement(): Unit = cur match {
    case "begin" =>
      p += 1
      skipBody(Set("end"))
      expect("end")
      skipSemi()
    case _ => p = skipToSemi(p)
  }

  private def ifStmt(): Unit = {
    p += 1 // if
    if (!thenAhead(p)) { tsqlIf(); return }
    var done = false
    var taken = false
    while (!done) {
      val cond = condUntil(Set("then"))
      expect("then")
      if (!taken && evalCond(cond)) {
        taken = true
        runUntil(Set("elsif", "elseif", "else", "end"))
      } else skipBody(Set("elsif", "elseif", "else", "end"))
      cur match {
        case "elsif" | "elseif" => p += 1
        case "else" =>
          p += 1
          if (!taken) runUntil(Set("end"))
          else skipBody(Set("end"))
          done = true
        case _ => done = true
      }
    }
    expect("end")
    expect("if")
    skipSemi()
  }

  /** Transact-SQL IF: `IF cond <stmt>` / `IF cond BEGIN ... END`,
    * optional `ELSE <stmt-or-block>`; no THEN, no END IF. */
  private def tsqlIf(): Unit = {
    val cond = condUntil(stmtStarts)
    val taken = evalCond(cond)
    if (taken) statement() else skipOneStatement()
    if (cur == "else") {
      p += 1
      if (taken) skipOneStatement() else statement()
    }
  }

  private def whileStmt(): Unit = {
    val label = { val l = pendingLabel; pendingLabel = ""; l }
    p += 1 // while
    val condStart = p
    condUntil(Set("loop", "do", "then", "begin"))
    val condEnd = p
    val cond = slice(condStart, condEnd)
    p += 1 // loop/do/then/begin (T-SQL WHILE c BEGIN ... END)
    val bodyStart = p
    skipBody(Set("end"))
    val bodyEnd = p
    try {
      while (evalCond(cond)) {
        p = bodyStart
        runUntil(Set("end"))
      }
    } catch {
      case ExitLoop(l) if l == "" || l.equalsIgnoreCase(label) =>
    }
    p = bodyEnd
    expect("end")
    if (cur == "loop" || cur == "while") p += 1
    skipSemi()
  }

  private def forStmt(): Unit = {
    val forLabel = { val l = pendingLabel; pendingLabel = ""; l }
    p += 1 // for
    val v = cur
    p += 1
    expect("in")
    if (cur == "(") {
      // cursor loop: FOR rec IN (SELECT ...) LOOP
      var depth = 0
      val a = p
      do {
        if (cur == "(") depth += 1
        if (cur == ")") depth -= 1
        p += 1
      } while (!eof && depth > 0)
      val query = slice(a, p).trim.stripPrefix("(").stripSuffix(")")
      expect("loop")
      val bodyStart = p
      skipBody(Set("end"))
      val bodyEnd = p
      val rows = spark.sql(substitute(query))
      val fields = rows.schema.fieldNames.map(_.toLowerCase)
      val saved = fields.map(f => s"$v.$f" -> vars.get(s"$v.$f"))
      try {
        rows.collect().foreach { r =>
          fields.zipWithIndex.foreach { case (f, i) =>
            vars(s"$v.$f") = r.get(i)
          }
          p = bodyStart
          runUntil(Set("end"))
        }
      } catch {
        case ExitLoop(l) if l == "" || l.equalsIgnoreCase(forLabel) =>
      }
      saved.foreach { case (k, old) =>
        old match { case Some(x) => vars(k) = x
          case None => vars.remove(k) } }
      p = bodyEnd
      expect("end")
      if (cur == "loop") p += 1
      skipSemi()
    } else {
      val reverse = cur == "reverse"
      if (reverse) p += 1
      val a0 = p
      condUntil(Set(".."))
      val fromE = slice(a0, p)
      expect("..")
      val a1 = p
      condUntil(Set("by", "loop"))
      val toE = slice(a1, p)
      val step =
        if (cur == "by") {
          p += 1
          val a2 = p
          condUntil(Set("loop"))
          math.max(1L, String.valueOf(evalExpr(slice(a2, p))).toDouble
            .toLong)
        } else 1L
      expect("loop")
      val bodyStart = p
      skipBody(Set("end"))
      val bodyEnd = p
      val lo = String.valueOf(evalExpr(fromE)).toDouble.toLong
      val hi = String.valueOf(evalExpr(toE)).toDouble.toLong
      // the loop variable SHADOWS an outer binding (for_range.sql:
      // `i` prints 3 again after the loop)
      val outer = vars.get(v)
      val range =
        if (reverse) hi.to(lo, -step) else lo.to(hi, step)
      try {
        range.foreach { i =>
          vars(v) = i
          p = bodyStart
          runUntil(Set("end"))
        }
      } catch {
        case ExitLoop(l) if l == "" || l.equalsIgnoreCase(forLabel) =>
      }
      outer match {
        case Some(x) => vars(v) = x
        case None => vars.remove(v)
      }
      p = bodyEnd
      expect("end")
      if (cur == "loop") p += 1
      skipSemi()
    }
  }

  /** BEGIN body [EXCEPTION WHEN cond THEN handler [WHEN ...]] END —
    * only the FIRST matching WHEN arm runs (the recorded
    * exception.out.txt stops at the next WHEN; OTHERS matches
    * everything). */
  private def beginBlock(): Unit = {
    expect("begin")
    val bodyStart = p
    skipBody(Set("end", "exception"))
    val bodyEnd = p
    var handlerRange: Option[(Int, Int)] = None
    if (cur == "exception") {
      p += 1 // exception
      expect("when")
      // WHEN OTHERS THEN (also accepts a named condition)
      p += 1
      expect("then")
      val hs = p
      skipBody(Set("end", "when"))
      handlerRange = Some((hs, p))
      // further WHEN arms: recorded semantics run only the first
      while (cur == "when") {
        p += 1 // when
        p += 1 // condition name
        if (cur == "then") p += 1
        skipBody(Set("end", "when"))
      }
    }
    val endPos = p
    try {
      p = bodyStart
      runUntil(Set("end", "exception"))
    } catch {
      case e @ (_: ExitLoop | _: ReturnValue | _: StopScript) => throw e
      case _: Throwable if handlerRange.isDefined =>
        val (hs, he) = handlerRange.get
        p = hs
        runUntil(Set("end", "when"))
        p = he
    }
    p = endPos
    expect("end")
    skipSemi()
  }

  /** Is this CREATE an HPL/SQL routine (vs a SQL CREATE FUNCTION UDF
    * registration)? Routines carry RETURNS/BEGIN before the first
    * top-level `;` (their header has none — the first `;` sits inside
    * the BEGIN body). */
  private def routineCreateAhead: Boolean = {
    var i = p + 1
    if (at(1) == "or" && at(2) == "replace") i += 2
    val kind = if (i - p == 1) at(1) else at(3)
    if (kind == "procedure" || kind == "proc") return true
    if (kind != "function" && kind != "func") return false
    var j = i + 1
    var depth = 0
    while (j < toks.size) {
      toks(j).lo match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case ";" if depth == 0 => return false
        case "returns" | "begin" if depth == 0 => return true
        case _ =>
      }
      j += 1
    }
    false
  }

  private def createRoutine(consumeCreate: Boolean = true,
      pkg: String = ""): Unit = {
    if (consumeCreate) {
      p += 1 // create
      if (cur == "or" && at(1) == "replace") p += 2
    }
    val isFunc = cur == "function" || cur == "func"
    p += 1 // kind
    val name =
      (if (pkg.nonEmpty) pkg + "." else "") + cur.toLowerCase
    p += 1
    val params = Vector.newBuilder[Param]
    if (cur == "(") {
      p += 1
      while (!eof && cur != ")") {
        val mode =
          if (Set("in", "out", "inout").contains(cur) &&
              at(1) != "," && at(1) != ")") {
            val m = cur.toUpperCase; p += 1; m
          } else "IN"
        val pname = cur
        p += 1
        while (!eof && cur != "," && cur != ")") {
          if (cur == "(") {
            var d = 0
            while (!eof && { val c0 = cur
              if (c0 == "(") d += 1
              if (c0 == ")") d -= 1
              p += 1
              d > 0 }) {}
          } else p += 1
        }
        params += Param(pname, mode)
        if (cur == ",") p += 1
      }
      p += 1 // )
    }
    if (isFunc && (cur == "returns" || cur == "return")) {
      // RETURNS <type> (HPL/SQL) / RETURN <type> (Oracle)
      p += 1
      while (!eof && cur != "begin" && cur != "as" && cur != "is" &&
          cur != "declare")
        p += 1
    }
    // declaration section before the body: `AS|IS decls BEGIN` (the
    // Oracle keyword-less form) or an explicit `DECLARE decls BEGIN`
    var declPrefix = ""
    if (cur == "as" || cur == "is") {
      p += 1
      if (cur != "begin" && cur != "declare") {
        val ds = p
        while (!eof && cur != "begin") p += 1
        if (p > ds) declPrefix = "declare " + slice(ds, p) + "\n"
      }
    }
    if (cur == "declare") {
      val ds = p
      while (!eof && cur != "begin") p += 1
      declPrefix = slice(ds, p) + "\n"
    }
    if (cur != "begin") throw new IllegalArgumentException(
      s"hplsql: routine $name body must be BEGIN..END near ${ctx()}")
    val a = p
    p += 1
    skipBody(Set("end"))
    val b = p // on the matching "end"
    p += 1
    routines(name) = Routine(params.result().map(pm =>
      Param(pm.name.toLowerCase, pm.mode)),
      declPrefix + slice(a, b + 1), isFunc, pkg)
    skipSemi()
  }

  /** CREATE [OR REPLACE] PACKAGE name AS|IS spec END; and
    * CREATE ... PACKAGE BODY name AS|IS defs END; — package
    * variables persist globally under `pkg.name` (package state,
    * Package.java), spec routine SIGNATURES are skipped, body
    * routines register as `pkg.member`. */
  private def createPackage(): Unit = {
    p += 1 // create
    if (cur == "or" && at(1) == "replace") p += 2
    p += 1 // package
    val isBody = cur == "body"
    if (isBody) p += 1
    val pkg = cur.toLowerCase
    p += 1
    if (cur == "as" || cur == "is") p += 1
    while (!eof && !(cur == "end" &&
        (at(1) == ";" || at(1) == ""))) {
      if (Set("function", "procedure", "proc", "func").contains(cur)) {
        // signature (no body before the terminating `;`) vs definition
        var i = p
        var sig = true
        var depth = 0
        var scanning = true
        while (i < toks.size && scanning) {
          toks(i).lo match {
            case "(" => depth += 1
            case ")" => depth -= 1
            case ";" if depth == 0 => scanning = false
            case "begin" | "is" | "as" if depth == 0 =>
              sig = false; scanning = false
            case _ =>
          }
          i += 1
        }
        if (sig) p = skipToSemi(p)
        else createRoutine(consumeCreate = false, pkg = pkg)
      } else if (isIdent(cur)) {
        // package variable: name type [:=|=|DEFAULT expr];
        val vname = cur
        p += 1
        while (!eof && cur != ";" && cur != ":=" && cur != "=" &&
            cur != "default") {
          if (cur == "(") {
            var d = 0
            while (!eof && { val c0 = cur
              if (c0 == "(") d += 1
              if (c0 == ")") d -= 1
              p += 1
              d > 0 }) {}
          } else p += 1
        }
        val init: Any =
          if (cur == ":=" || cur == "=" || cur == "default") {
            p += 1
            val stop = skipToSemi(p)
            val e = if (toks(stop - 1).lo == ";") stop - 1 else stop
            val v = evalExpr(slice(p, e))
            p = stop
            v
          } else { p = skipToSemi(p); null }
        // the spec declares; the body's re-declarations must not
        // clobber state a prior statement already built up
        if (!vars.contains(pkg + "." + vname) || !isBody)
          vars.declare(pkg + "." + vname, init)
      } else p += 1
    }
    p += 1 // end
    skipSemi()
  }

  /** `name` / `name(arg, ...)` at the cursor → invoke. A bare (no
    * CALL) no-argument `name()` statement emits the reference's
    * ctx-less `EXEC PROCEDURE|FUNCTION` trace line; a bare FUNCTION
    * statement prints its return value (it IS an expression
    * statement — var_scope2's `f1(i);` prints 7). */
  private def invokeFromCursor(viaCall: Boolean,
      nameOverride: String = null, nameTokens: Int = 1): Unit = {
    val name = if (nameOverride != null) nameOverride else cur
    p += nameTokens
    var hadParens = false
    val args = Vector.newBuilder[String]
    if (cur == "(") {
      hadParens = true
      p += 1
      var depth = 0
      var a = p
      while (!eof && !(depth == 0 && cur == ")")) {
        if (cur == "(") depth += 1
        if (cur == ")") depth -= 1
        if (depth == 0 && cur == ",") {
          args += slice(a, p); p += 1; a = p
        } else p += 1
      }
      if (p > a) args += slice(a, p)
      p += 1 // )
    }
    skipSemi()
    val argList = args.result()
    val r = routines(name)
    if (trace && !viaCall && hadParens && argList.isEmpty) {
      val kind = if (r.isFunc) "FUNCTION" else "PROCEDURE"
      out +=
        (if (r.pkg.nonEmpty)
          s"EXEC PACKAGE $kind ${r.pkg.toUpperCase}." +
            name.substring(r.pkg.length + 1)
        else s"EXEC $kind $name")
    }
    val ret = invokeRoutine(name, argList)
    if (!viaCall && r.isFunc)
      out += Option(ret).map(formatValue).getOrElse("null")
  }

  private def hasTopLevelInto(from: Int): Boolean = {
    var i = from
    var depth = 0
    while (i < toks.size && !(depth == 0 && toks(i).lo == ";")) {
      toks(i).lo match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case "into" if depth == 0 => return true
        case "from" if depth == 0 => return false
        case _ =>
      }
      i += 1
    }
    false
  }

  /** VALUES e INTO v; VALUES (e1, e2) INTO (v1, v2); — evaluate and
    * bind positionally (auto-creating, like assignment). */
  private def valuesInto(): Unit = {
    p += 1 // values
    var depth = 0
    val a = p
    while (!eof && !(depth == 0 && cur == "into")) {
      if (cur == "(") depth += 1
      if (cur == ")") depth -= 1
      p += 1
    }
    val valText = slice(a, p).trim
    p += 1 // into
    val targets = Vector.newBuilder[String]
    if (cur == "(") {
      p += 1
      while (!eof && cur != ")") { if (cur != ",") targets += cur; p += 1 }
      p += 1
    } else { targets += cur; p += 1 }
    skipSemi()
    val exprs =
      if (valText.startsWith("(") && valText.endsWith(")"))
        splitArgs(valText.stripPrefix("(").stripSuffix(")"))
      else Seq(valText)
    targets.result().zip(exprs).foreach { case (t, e) =>
      vars(t) = evalExpr(e) }
  }

  /** SELECT c1, c2 INTO v1, v2 FROM ... — run without the INTO
    * clause, bind the first row. */
  private def selectInto(): Unit = {
    val a = p
    var depth = 0
    var intoA = -1
    var intoB = -1
    while (!eof && !(depth == 0 && cur == ";")) {
      cur match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case "into" if depth == 0 && intoA < 0 => intoA = p
        case "from" if depth == 0 && intoA >= 0 && intoB < 0 =>
          intoB = p
        case _ =>
      }
      p += 1
    }
    val end = p
    skipSemi()
    if (intoB < 0) intoB = end
    val targets = toks.slice(intoA + 1, intoB).map(_.lo)
      .filter(_ != ",")
    val query = slice(a, intoA) + " " +
      (if (intoB < end) slice(intoB, end) else "")
    val row = spark.sql(substitute(query)).collect().headOption
    row.foreach { r =>
      targets.zipWithIndex.foreach { case (t, i) =>
        if (i < r.length) vars(t) = r.get(i)
      }
    }
  }

  // ---------------------------------------------------------------
  // entry
  // ---------------------------------------------------------------

  /** Run a script; returns the PRINT output lines. */
  def run(script: String): Seq[String] = {
    src = script
    toks = tokenize(script)
    p = 0
    try runUntil(Set.empty)
    catch {
      case ExitLoop(_) =>
      case ReturnValue(_) => // top-level RETURN ends the script
      case StopScript() => // BTEQ .quit / EXIT-mode handler
    }
    out.result()
  }

  /** Current value of a variable (for tests / host callers). */
  def variable(name: String): Option[Any] = vars.get(name.toLowerCase)
}

object Hplsql {
  /** One-shot convenience: run a script against a session. */
  def run(spark: org.apache.spark.sql.SparkSession,
      script: String): Seq[String] =
    new Hplsql(new HiveStatements(spark)).run(script)
}
