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
  private val vars =
    scala.collection.mutable.LinkedHashMap[String, Any]()
  private val out = Vector.newBuilder[String]

  private case class ExitLoop(label: String) extends RuntimeException
  private case class ReturnValue(v: Any) extends RuntimeException

  /** Stored procedures/functions (Exec.java functions map): body kept
    * as text, re-tokenized per invocation in its own cursor frame. */
  private case class Param(name: String, mode: String)
  private case class Routine(params: Seq[Param], body: String,
      isFunc: Boolean)
  private val routines =
    scala.collection.mutable.LinkedHashMap[String, Routine]()

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
      routines.iterator.filter(_._2.isFunc).map(_._1)
        .find { name =>
          val re = ("(?i)(?<![\\w.'])" +
            java.util.regex.Pattern.quote(name) + "\\s*\\(").r
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

  private def evalExpr(e: String): Any = {
    val rendered = substitute(resolveFunctionCalls(e.trim))
    spark.sql(s"SELECT ${rendered}").collect().head.get(0)
  }

  private def evalCond(c: String): Boolean = {
    val rendered = substitute(resolveFunctionCalls(c.trim))
    val r = spark.sql(
      s"SELECT CASE WHEN ($rendered) THEN true ELSE false END")
      .collect().head
    !r.isNullAt(0) && r.getBoolean(0)
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
    val saved = r.params.map(pm => pm.name -> vars.get(pm.name))
    r.params.zip(argVals).foreach { case (pm, v) => vars(pm.name) = v }
    var ret: Any = null
    val (t0, s0, p0) = (toks, src, p)
    toks = tokenize(r.body); src = r.body; p = 0
    try runUntil(Set.empty)
    catch {
      case ReturnValue(v) => ret = v
      case ExitLoop(_) =>
    } finally { toks = t0; src = s0; p = p0 }
    val outVals = r.params.map(pm => vars.get(pm.name).orNull)
    saved.foreach { case (k, old) => old match {
      case Some(x) => vars(k) = x
      case None => vars.remove(k)
    } }
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

  private def statement(): Unit = cur match {
    case ";" => p += 1
    case "declare" => declare()
    case "set" => setStmt()
    case "print" =>
      p += 1
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      out += Option(evalExpr(slice(p, stop))).map(formatValue)
        .getOrElse("null")
      p = end
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
      } else {
        skipSemi()
        throw ExitLoop("")
      }
    case "create" if routineCreateAhead => createRoutine()
    case "call" =>
      p += 1
      invokeFromCursor()
    case "return" =>
      p += 1
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      val v = if (stop > p) evalExpr(slice(p, stop)) else null
      p = end
      throw ReturnValue(v)
    case n if routines.contains(n) &&
        (at(1) == "(" || at(1) == ";" || at(1) == "") =>
      invokeFromCursor()
    case "execute" if at(1) == "immediate" =>
      p += 2
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      val text = String.valueOf(evalExpr(slice(p, stop)))
      p = end
      runSql(text)
    case "select" if hasTopLevelInto(p) => selectInto()
    case _ if isAssignment => assignment()
    case _ =>
      // plain SQL statement through the engine
      val end = skipToSemi(p)
      val stop = if (toks(end - 1).lo == ";") end - 1 else end
      val text = slice(p, stop)
      p = end
      runSql(text)
  }

  private def formatValue(v: Any): String = v match {
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case o => String.valueOf(o)
  }

  /** `name := ...` / `name = ...` with a declared name. */
  private def isAssignment: Boolean =
    (at(1) == ":=" || at(1) == "=") && vars.contains(cur)

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
    * or the anonymous-block header (`DECLARE decls BEGIN ... END`). */
  private def declare(): Unit = {
    p += 1 // declare
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
      names.result().foreach(n => vars(n) = init)
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
        expect("=")
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

  /** Skip a balanced statement-list without executing (the untaken
    * IF branches), tracking nested compound statements. */
  private def skipBody(until: Set[String]): Unit = {
    var depth = 0
    while (!eof) {
      cur match {
        case k if depth == 0 && until.contains(k) => return
        case "if" | "while" | "for" | "begin" | "loop" | "case" =>
          // `end [if|loop|while|case]`/`end` all close one level;
          // SQL CASE expressions balance with their END too
          if (cur == "if" || cur == "begin" || cur == "case") depth += 1
          else if (cur == "loop" &&
            toks(math.max(0, p - 1)).lo != "end") depth += 1
          p += 1
        case "end" =>
          if (at(1) == "if" || at(1) == "loop" || at(1) == "while" ||
              at(1) == "case") {
            depth -= 1; p += 2
          } else { depth -= 1; p += 1 }
        case _ => p += 1
      }
    }
  }

  private def ifStmt(): Unit = {
    p += 1 // if
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

  private def whileStmt(): Unit = {
    p += 1 // while
    val condStart = p
    condUntil(Set("loop", "do", "then"))
    val condEnd = p
    val cond = slice(condStart, condEnd)
    p += 1 // loop/do/then
    val bodyStart = p
    skipBody(Set("end"))
    val bodyEnd = p
    try {
      while (evalCond(cond)) {
        p = bodyStart
        runUntil(Set("end"))
      }
    } catch { case ExitLoop("") => }
    p = bodyEnd
    expect("end")
    if (cur == "loop" || cur == "while") p += 1
    skipSemi()
  }

  private def forStmt(): Unit = {
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
      } catch { case ExitLoop("") => }
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
      } catch { case ExitLoop("") => }
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

  /** BEGIN body [EXCEPTION WHEN OTHERS THEN handler] END */
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
      skipBody(Set("end"))
      handlerRange = Some((hs, p))
    }
    val endPos = p
    try {
      p = bodyStart
      runUntil(Set("end", "exception"))
    } catch {
      case e: ExitLoop => throw e
      case _: Throwable if handlerRange.isDefined =>
        val (hs, he) = handlerRange.get
        p = hs
        runUntil(Set("end"))
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

  private def createRoutine(): Unit = {
    p += 1 // create
    if (cur == "or" && at(1) == "replace") p += 2
    val isFunc = cur == "function" || cur == "func"
    p += 1 // kind
    val name = cur.toLowerCase
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
    if (isFunc && cur == "returns") {
      p += 1
      while (!eof && cur != "begin" && cur != "as" && cur != "is")
        p += 1
    }
    if (cur == "as" || cur == "is") p += 1
    if (cur != "begin") throw new IllegalArgumentException(
      s"hplsql: routine $name body must be BEGIN..END near ${ctx()}")
    val a = p
    p += 1
    skipBody(Set("end"))
    val b = p // on the matching "end"
    p += 1
    routines(name) = Routine(params.result().map(pm =>
      Param(pm.name.toLowerCase, pm.mode)),
      slice(a, b + 1), isFunc)
    skipSemi()
  }

  /** `name` / `name(arg, ...)` at the cursor → invoke. */
  private def invokeFromCursor(): Unit = {
    val name = cur
    p += 1
    val args = Vector.newBuilder[String]
    if (cur == "(") {
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
    invokeRoutine(name, args.result())
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
    catch { case ExitLoop(_) => }
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
