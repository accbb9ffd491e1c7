package graft.meta

import scala.collection.mutable

/** The GRANT/REVOKE/ROLE authorization METADATA surface in Hive's
  * recorded wire layout — the bookkeeping half of the reference's
  * authorization stack (ref ql/exec/DDLTask.java grantOrRevoke
  * Privileges/grantOrRevokeRole/roleDDL/showGrants, metastore
  * ObjectStore GLOBAL_PRIVS/DB_PRIVS/TBL_PRIVS/TBL_COL_PRIVS/
  * PART_PRIVS/ROLES/ROLE_MAP tables). Privilege ENFORCEMENT is a
  * pluggable policy layer in the reference (HiveAuthorizer) and is
  * out of scope here; what multi-user deployments and the recorded
  * goldens exercise is this store: who granted what to whom, shown
  * back in the exact SHOW GRANT / SHOW ROLE GRANT / SHOW PRINCIPALS
  * layouts.
  *
  * Display conventions (DDLTask.writeGrantInfo — verified against the
  * recorded authorization_*.q.out goldens):
  *  - SHOW GRANT rows: db, table, [partValues], [column], principal,
  *    principalType, privilege, grantOption, grantTime, grantor —
  *    tab-separated; absent scopes render empty. The goldens mask
  *    grant times to -1 and this store keeps no wall clock, so the
  *    time field always renders -1.
  *  - role names render in their STORED case: the sqlstd authorizer
  *    lowercases at CREATE ROLE, the legacy provider keeps the
  *    authored case (sRc_roLE renders back as written); matching is
  *    case-insensitive either way. User/group principal names
  *    preserve case (userA stays userA).
  *  - GRANT ALL expands to DELETE/INSERT/SELECT/UPDATE when
  *    `expandAll` (the SQL-standard authorizer's behavior); the
  *    legacy provider stores the literal ALL.
  *
  * Partition-level privileges (legacy `PARTITION_LEVEL_PRIVILEGE`
  * table property): a partition SNAPSHOTS the table's privileges
  * when it is created ([[partitionCreated]]); table-level revokes do
  * not touch the copies, partition-scoped grant/revoke edit only the
  * copy, renames re-key it, drops destroy it — the recorded
  * authorization_2 / alter_rename_partition_authorization behavior.
  *
  * Scale: pure driver-side metadata (KBs), persisted through the
  * metastore ledger; zero cost in any data path. */
final class AuthStore extends Serializable {
  import AuthStore._

  /** The authenticator's current user (SessionStateConfigUser
    * Authenticator's `user.name`). Grantor of explicit GRANTs.
    * Changing identity starts a fresh authorization session — any
    * SET ROLE choice resets to the new user's default role set. */
  private var _currentUser: String = "hive_test_user"
  def currentUser: String = _currentUser
  def currentUser_=(u: String): Unit = {
    if (u != _currentUser) currentRoles = None
    _currentUser = u
  }

  /** GRANT ALL expands to the four DML privileges (SQL-standard
    * authorizer) instead of storing literal ALL (legacy provider). */
  var expandAll: Boolean = false

  /** The grantor recorded on automatic owner grants. The reference
    * pins it when the session's authorization stack initializes
    * (CreateTableAutomaticGrant.create runs once and captures
    * SessionState.getUserFromAuthenticator —
    * ql/session/CreateTableAutomaticGrant.java:94), which is why a
    * table created by user1 can show owner grants from
    * hive_admin_user. [[pinGrantor]] sets it on first auth use. */
  var ownerGrantor: Option[String] = None
  def pinGrantor(): Unit =
    if (ownerGrantor.isEmpty) ownerGrantor = Some(currentUser)

  /** One privilege row; part/col empty = not partition/column scoped. */
  case class Grant(db: String, table: String, part: String, col: String,
      principal: String, ptype: String, priv: String,
      grantOpt: Boolean, grantor: String) {
    def key: (String, String, String, String, String, String, String) =
      (db, table, part, col, principal, ptype, priv)
  }

  val grants = mutable.LinkedHashSet[Grant]()
  /** (db, table) → owning user — OBJECT OWNERSHIP for the sqlstd
    * enforcement rules (the metastore's TBLS.OWNER column). Recorded
    * at CREATE when enforcement is on; renames re-key, drops clear. */
  val owners = mutable.LinkedHashMap[(String, String), String]()
  /** Known roles by DISPLAY name (the sqlstd authorizer lowercases
    * at CREATE; the legacy provider keeps the authored case —
    * sRc_roLE renders back as written). Matching is always
    * case-insensitive. admin/public are built-in. */
  val roles = mutable.LinkedHashSet[String]("admin", "public")

  /** Resolve a role reference to its stored display name. */
  def canonRole(name0: String): String = {
    val n = name0.replace("`", "")
    roles.find(_.equalsIgnoreCase(n)).getOrElse(
      if (expandAll) n.toLowerCase else n)
  }
  /** (role, principal, ptype, adminOption, grantor, grantorType). */
  val roleGrants = mutable.LinkedHashSet[
    (String, String, String, Boolean, String, String)]()
  /** None = default (granted roles + public); Some = SET ROLE. */
  var currentRoles: Option[Seq[String]] = None

  private def addGrant(g: Grant): Unit = {
    grants.filterInPlace(_.key != g.key)
    grants += g
  }

  /** Expand a privilege for storage (ALL → the 4 under sqlstd). */
  private def privsOf(p: String): Seq[String] = {
    val u = p.toUpperCase
    if (u == "ALL" && expandAll) Seq("DELETE", "INSERT", "SELECT", "UPDATE")
    else Seq(u)
  }

  /** Owner grants on object creation: the 4 DML privileges with
    * grant option under sqlstd (SQLStdHiveAccessController default
    * table policy); the configured literal list under the legacy
    * provider (`hive.security.authorization.createtable.owner.grants`
    * — ALL stays one ALL row). */
  def ownerGrantsOnCreate(db: String, table: String, owner: String,
      privList: Seq[String]): Unit = {
    pinGrantor()
    owners((db, table)) = owner
    privList.foreach(p => addGrant(Grant(db, table, "", "", owner,
      "USER", p.toUpperCase, grantOpt = true,
      ownerGrantor.getOrElse(owner))))
  }

  /** Partition creation under PARTITION_LEVEL_PRIVILEGE: snapshot the
    * table's current privilege rows for the new partition object. */
  def partitionCreated(db: String, table: String, part: String): Unit = {
    grants.filterInPlace(g =>
      !(g.db == db && g.table == table && g.part == part))
    grants.toVector.filter(g =>
      g.db == db && g.table == table && g.part.isEmpty)
      .foreach(g => grants += g.copy(part = part))
  }

  def partitionDropped(db: String, table: String, part: String): Unit =
    grants.filterInPlace(g =>
      !(g.db == db && g.table == table && g.part == part))

  def partitionRenamed(db: String, table: String, from: String,
      to: String): Unit = {
    val hit = grants.toVector.filter(g =>
      g.db == db && g.table == table && g.part == from)
    grants --= hit
    grants ++= hit.map(_.copy(part = to))
  }

  def tableDropped(db: String, table: String): Unit = {
    grants.filterInPlace(g => !(g.db == db && g.table == table))
    owners.remove((db, table))
  }

  def tableRenamed(db: String, from: String, to: String): Unit = {
    val hit = grants.toVector.filter(g => g.db == db && g.table == from)
    grants --= hit
    grants ++= hit.map(_.copy(table = to))
    owners.remove((db, from)).foreach(owners((db, to)) = _)
  }

  /** DROP DATABASE destroys the DB_PRIVS rows and (CASCADE) every
    * contained table's privileges with it. */
  def databaseDropped(db: String): Unit = {
    grants.filterInPlace(g => g.db != db)
    owners.filterInPlace((k, _) => k._1 != db)
  }

  // ---------------------------------------------------------------
  // enforcement support (SQLStdHiveAuthorizationValidator semantics)
  // ---------------------------------------------------------------

  /** Is the ADMIN role active (only via an explicit SET ROLE admin —
    * SQLStdHiveAccessController.getCurrentRoleNames)? Admin holds
    * every privilege (RequiredPrivileges.findMissingPrivs). */
  def adminActive: Boolean =
    currentRolesOf(currentUser).exists(_.equalsIgnoreCase("admin"))

  /** The privilege descriptors `user` holds on (db, table):
    * grants to the user, to any ACTIVE role (transitive, + public),
    * plus "X with grant" for grant-option rows and OBJECT OWNERSHIP
    * for the recorded owner (SQLAuthorizationUtils
    * getPrivilegesFromMetaStore). Table-level rows only — sqlstd
    * manages privileges at table/view granularity. */
  def availableOn(user: String, db: String, table: String): Set[String] = {
    val activeRoles = currentRolesOf(user).map(_.toLowerCase).toSet
    val out = mutable.Set[String]()
    grants.foreach { g =>
      if (g.db == db && g.table == table && g.part.isEmpty &&
          g.col.isEmpty) {
        val hit = (g.ptype == "USER" && g.principal == user) ||
          (g.ptype == "ROLE" &&
            activeRoles.contains(g.principal.toLowerCase))
        if (hit) {
          val ps =
            if (g.priv == "ALL")
              Seq("SELECT", "INSERT", "UPDATE", "DELETE")
            else Seq(g.priv)
          ps.foreach { p =>
            out += p
            if (g.grantOpt) out += s"$p with grant"
          }
        }
      }
    }
    if (owners.get((db, table)).contains(user)) out += "OBJECT OWNERSHIP"
    out.toSet
  }

  // ---------------------------------------------------------------
  // statement surface
  // ---------------------------------------------------------------

  /** Apply one authorization statement (GRANT/REVOKE privilege or
    * role, CREATE/DROP ROLE, SET ROLE). False = not an authorization
    * statement. `db`: the session's current database for unqualified
    * table names. */
  def executeStatement(q0: String, db: String): Boolean = {
    val q = q0.trim.stripSuffix(";").trim
    val ql = q.toLowerCase

    val createRoleRe = "(?is)^create\\s+role\\s+`?([\\w-]+)`?\\s*$".r
    createRoleRe.findFirstMatchIn(q).foreach { m =>
      pinGrantor()
      val r = m.group(1)
      if (!roles.exists(_.equalsIgnoreCase(r)))
        roles += (if (expandAll) r.toLowerCase else r)
      return true
    }
    val dropRoleRe = "(?is)^drop\\s+role\\s+`?([\\w-]+)`?\\s*$".r
    dropRoleRe.findFirstMatchIn(q).foreach { m =>
      val r = m.group(1)
      roles.filterInPlace(!_.equalsIgnoreCase(r))
      roleGrants.filterInPlace(!_._1.equalsIgnoreCase(r))
      grants.filterInPlace(g =>
        !(g.ptype == "ROLE" && g.principal.equalsIgnoreCase(r)))
      return true
    }
    val setRoleRe = "(?is)^set\\s+role\\s+`?([\\w-]+)`?\\s*$".r
    setRoleRe.findFirstMatchIn(q).foreach { m =>
      pinGrantor()
      currentRoles = m.group(1).toLowerCase match {
        case "all" => None
        case "none" => Some(Nil)
        case _ => Some(Seq(canonRole(m.group(1))))
      }
      return true
    }

    if (ql.startsWith("grant") || ql.startsWith("revoke")) {
      val grant = ql.startsWith("grant")
      // REVOKE [GRANT OPTION FOR] / [ADMIN OPTION FOR]
      val optionForRe =
        "(?is)^revoke\\s+(grant|admin)\\s+option\\s+for\\s+(.*)$".r
      val (optionOnly, body0) = q match {
        case optionForRe(_, rest) =>
          (true, (if (grant) "grant " else "revoke ") + rest)
        case _ => (false, q)
      }
      val body = body0.trim.stripSuffix(";")
      // split head(list) / ON object / TO-FROM principals / options
      val mainRe = ("(?is)^(?:grant|revoke)\\s+(role\\s+)?(.*?)" +
        "(?:\\s+on\\s+(.*?))?\\s+(?:to|from)\\s+(.+?)" +
        "(\\s+with\\s+grant\\s+option|\\s+with\\s+admin\\s+option)?" +
        "\\s*$").r
      val m = mainRe.findFirstMatchIn(body).getOrElse(return false)
      val roleKw = m.group(1) != null
      val listTxt = m.group(2).trim
      val objTxt = Option(m.group(3)).map(_.trim)
      val prinTxt = m.group(4).trim
      val withOpt = m.group(5) != null

      val principals = parsePrincipals(prinTxt).map {
        case ("ROLE", n) => ("ROLE", canonRole(n))
        case p => p
      }
      if (principals.isEmpty) return false

      // role grant vs privilege grant: ROLE keyword, or no ON clause
      // with names outside the privilege vocabulary
      val items = splitList(listTxt)
      val isRole = roleKw || (objTxt.isEmpty &&
        !items.forall(i => privilegeNames.contains(
          i.takeWhile(_ != '(').trim.toLowerCase)))

      if (isRole) {
        pinGrantor()
        val rs = items.map(i => canonRole(i.trim))
        principals.foreach { case (pt, pn) =>
          rs.foreach { r =>
            if (grant) {
              roleGrants.filterInPlace(e =>
                !(e._1 == r && e._2 == pn && e._3 == pt))
              roleGrants += ((r, pn, pt, withOpt, currentUser, "USER"))
            } else if (optionOnly) {
              val hit = roleGrants.toVector.filter(e =>
                e._1 == r && e._2 == pn && e._3 == pt)
              roleGrants --= hit
              roleGrants ++= hit.map(e =>
                (e._1, e._2, e._3, false, e._5, e._6))
            } else roleGrants.filterInPlace(e =>
              !(e._1 == r && e._2 == pn && e._3 == pt))
          }
        }
        return true
      }

      // privilege grant/revoke
      pinGrantor()
      val (gdb, gtable, gpart) = objTxt match {
        case None => ("", "", "")
        case Some(o) =>
          val dbRe = "(?is)^database\\s+`?([\\w-]+)`?\\s*$".r
          val tRe = ("(?is)^(?:table\\s+)?`?([\\w.-]+)`?" +
            "(?:\\s+partition\\s*\\((.*)\\))?\\s*$").r
          o match {
            case dbRe(d) => (d.toLowerCase, "", "")
            case tRe(t, part) =>
              val base = t.split('.').last.toLowerCase
              val d =
                if (t.contains(".")) t.split('.').head.toLowerCase
                else db.toLowerCase
              (d, base,
                Option(part).map(partDisplay).getOrElse(""))
            case _ => return false
          }
      }
      val privItems: Seq[(String, Seq[String])] = items.map { it =>
        val name = it.takeWhile(_ != '(').trim
        val cols = if (it.contains("("))
          it.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
            .split(",").map(_.trim.replace("`", ""))
            .filter(_.nonEmpty).toSeq
        else Nil
        (name, cols)
      }
      if (!privItems.forall(p =>
          privilegeNames.contains(p._1.toLowerCase))) return false
      principals.foreach { case (pt, pn) =>
        privItems.foreach { case (p0, cols) =>
          privsOf(p0).foreach { p =>
            val colScopes = if (cols.isEmpty) Seq("") else cols
            colScopes.foreach { c =>
              if (grant)
                addGrant(Grant(gdb, gtable, gpart, c, pn, pt, p,
                  withOpt, currentUser))
              else if (optionOnly) {
                val hit = grants.toVector.filter(g =>
                  g.db == gdb && g.table == gtable && g.part == gpart &&
                    g.col == c && g.principal == pn && g.ptype == pt &&
                    (g.priv == p || p == "ALL"))
                grants --= hit
                grants ++= hit.map(_.copy(grantOpt = false))
              } else grants.filterInPlace(g =>
                !(g.db == gdb && g.table == gtable && g.part == gpart &&
                  g.col == c && g.principal == pn && g.ptype == pt &&
                  (g.priv == p || p == "ALL")))
            }
          }
        }
      }
      return true
    }
    false
  }

  // ---------------------------------------------------------------
  // display surface
  // ---------------------------------------------------------------

  /** Render a SHOW GRANT / SHOW ROLES / SHOW CURRENT ROLES /
    * SHOW ROLE GRANT / SHOW PRINCIPALS statement as (result schema
    * column names, tab-joined lines), or None when the text is not
    * one. Lines are sorted (DDLTask sorts its output). */
  def showLines(q0: String, db: String)
      : Option[(Seq[String], Seq[String])] = {
    val q = q0.trim.stripSuffix(";").trim
    val ql = q.toLowerCase

    if (ql.matches("(?s)^show\\s+roles\\s*$"))
      return Some((Seq("role"), roles.toSeq.sorted))
    if (ql.matches("(?s)^show\\s+current\\s+roles\\s*$"))
      return Some((Seq("role"), currentRolesOf(currentUser)))
    val rgRe = ("(?is)^show\\s+role\\s+grant\\s+" +
      "(user|group|role)\\s+`?([\\w-]+)`?\\s*$").r
    rgRe.findFirstMatchIn(q).foreach { m =>
      val pt = m.group(1).toUpperCase
      val pn = if (pt == "ROLE") canonRole(m.group(2)) else m.group(2)
      val rows = roleGrants.toVector
        .filter(e => e._2 == pn && e._3 == pt)
        .map(e => s"${e._1}\t${e._4}\t-1\t${e._5}")
      val pub = if (pt == "USER") Seq(s"public\tfalse\t-1\t") else Nil
      return Some((Seq("role", "grant_option", "grant_time", "grantor"),
        (pub ++ rows).sorted))
    }
    val spRe = "(?is)^show\\s+principals\\s+`?([\\w-]+)`?\\s*$".r
    spRe.findFirstMatchIn(q).foreach { m =>
      val r = canonRole(m.group(1))
      return Some((Seq("principal_name", "principal_type",
        "grant_option", "grantor", "grantor_type", "grant_time"),
        roleGrants.toVector.filter(_._1 == r)
          .map(e => s"${e._2}\t${e._3}\t${e._4}\t${e._5}\t${e._6}\t-1")
          .sorted))
    }

    val sgRe = ("(?is)^show\\s+grant" +
      "(?:\\s+(user|group|role)\\s+`?([\\w-]+)`?)?" +
      "(?:\\s+on\\s+(.*?))?\\s*$").r
    sgRe.findFirstMatchIn(q).foreach { m =>
      val prin: Option[(String, String)] = Option(m.group(1)).map { k =>
        val pt = k.toUpperCase
        val pn = if (pt == "ROLE") canonRole(m.group(2))
          else m.group(2)
        (pt, pn)
      }
      val obj = Option(m.group(3)).map(_.trim).filter(_.nonEmpty)
      val rows: Seq[Grant] = obj match {
        case None => grants.toVector
        case Some(a) if a.equalsIgnoreCase("all") => grants.toVector
        case Some(o) =>
          val dbRe = "(?is)^database\\s+`?([\\w-]+)`?$".r
          val tRe = ("(?is)^(?:table\\s+)?`?([\\w.-]+)`?\\s*" +
            "(?:\\(([^)]*)\\))?" +
            "(?:\\s+partition\\s*\\((.*)\\))?$").r
          o match {
            case dbRe(d) =>
              grants.toVector.filter(g =>
                g.db == d.toLowerCase && g.table.isEmpty)
            case tRe(t, cols, part) =>
              val base = t.split('.').last.toLowerCase
              val d = if (t.contains(".")) t.split('.').head.toLowerCase
                else db.toLowerCase
              val wantPart = Option(part).map(partDisplay).getOrElse("")
              val wantCols = Option(cols).toSeq
                .flatMap(_.split(",")).map(_.trim.replace("`", ""))
                .filter(_.nonEmpty)
              grants.toVector.filter { g =>
                g.db == d && g.table == base && g.part == wantPart &&
                  (if (wantCols.isEmpty) g.col.isEmpty
                  else wantCols.exists(_.equalsIgnoreCase(g.col)))
              }
            case _ => return None
          }
      }
      val filtered = prin match {
        case Some((pt, pn)) =>
          rows.filter(g => g.ptype == pt && g.principal == pn)
        case None => rows
      }
      return Some((Seq("database", "table", "partition", "column",
        "principal_name", "principal_type", "privilege",
        "grant_option", "grant_time", "grantor"),
        filtered.map(renderGrant).sorted))
    }
    None
  }

  /** The session's active roles (SHOW CURRENT ROLES): SET ROLE's
    * choice, else every granted role — direct AND through role→role
    * grants (transitive membership, like the metastore's
    * get_role_grants closure) — plus public; admin only ever
    * activates through an explicit SET ROLE ADMIN
    * (SQLStdHiveAccessController.getCurrentRoleNames). */
  def currentRolesOf(user: String): Seq[String] = currentRoles match {
    case Some(rs) => rs.sorted
    case None =>
      val all = mutable.LinkedHashSet[String]()
      var frontier = roleGrants.toVector.collect {
        case (r, p, "USER", _, _, _) if p == user => r
      }
      while (frontier.nonEmpty) {
        val fresh = frontier.filterNot(all.contains)
        all ++= fresh
        frontier = roleGrants.toVector.collect {
          case (r, p, "ROLE", _, _, _)
              if fresh.exists(_.equalsIgnoreCase(p)) => r
        }
      }
      (all.toVector.filterNot(_.equalsIgnoreCase("admin")) :+ "public")
        .distinct.sorted
  }

  private def renderGrant(g: Grant): String = {
    val part = if (g.part.isEmpty) "" else s"[${g.part}]"
    val col = if (g.col.isEmpty) "" else s"[${g.col}]"
    Seq(g.db, g.table, part, col, g.principal, g.ptype, g.priv,
      g.grantOpt.toString, "-1", g.grantor).mkString("\t")
  }
}

object AuthStore {
  /** The legacy PrivilegeRegistry vocabulary (ql/security/
    * authorization/PrivilegeRegistry.java) + the SQL-standard four. */
  val privilegeNames: Set[String] = Set("all", "alter", "update",
    "create", "drop", "index", "lock", "select", "insert", "delete",
    "show_database")

  /** `USER a, GROUP b, ROLE c` (a bare name after the first keyword
    * inherits it: `TO USER u1, u2`). Backquotes strip; ROLE names
    * canonicalize at the call site (instance state decides case). */
  def parsePrincipals(txt: String): Seq[(String, String)] = {
    var lastType = "USER"
    txt.split(",").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val kw = "(?is)^(user|group|role)\\s+(.+)$".r
      val (pt, pn0) = p match {
        case kw(k, n) => (k.toUpperCase, n.trim)
        case n => (lastType, n)
      }
      lastType = pt
      val pn = pn0.replace("`", "")
      if (pn.isEmpty) None else Some((pt, pn))
    }
  }

  /** Split `drop,select(key), select(value)` at top-level commas. */
  def splitList(txt: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    txt.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur.append(c)
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Partition spec body → the display key: the partition VALUES
    * joined by '/' (Partition.getValues order; the recorded goldens
    * show `[2010]` for `partition (ds='2010')`). */
  def partDisplay(spec: String): String =
    splitList(spec).map { kv =>
      kv.split("=", 2).lift(1).getOrElse("").trim
        .stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")
    }.mkString("/")
}
