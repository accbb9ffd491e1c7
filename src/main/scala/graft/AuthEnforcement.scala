package graft

import graft.meta.AuthStore

/** SQL-standard authorization ENFORCEMENT, conf-gated behind
  * `spark.graft.authorization=true` — the ENGINE conf only; the
  * scripts' `hive.security.authorization.enabled` deliberately does
  * NOT engage it (see HiveStatements.authEnforcementOn for why the
  * golden bookkeeping corpus must replay un-enforced). Before a
  * statement runs, its required privileges are checked against the
  * session
  * [[AuthStore]] and a denial raises [[HiveAccessControlException]]
  * with the reference's exact message layout.
  *
  * Semantics follow the reference's sqlstd plugin:
  *  - operation → required-privilege mapping per
  *    ql/security/authorization/plugin/sqlstd/Operation2Privilege.java
  *    (QUERY: SELECT on inputs, INSERT/DELETE/UPDATE on outputs by
  *    action; DROP/ALTER: object ownership; CREATE VIEW and SHOW
  *    CREATE TABLE: SELECT with grant; ANALYZE: SELECT+INSERT)
  *  - available privileges = explicit grants to the user and to any
  *    ACTIVE role (transitive closure + public) + OBJECT OWNERSHIP
  *    for the recorded owner (SQLAuthorizationUtils
  *    .getPrivilegesFromMetaStore)
  *  - an active admin role (SET ROLE admin) holds every privilege
  *    (RequiredPrivileges.findMissingPrivs early-out)
  *  - missing privileges sort in SQLPrivTypeGrant ordinal order,
  *    denied objects sort by rendered text, and the message is
  *    `Permission denied: Principal [name=U, type=USER] does not
  *    have following privileges for operation OP [[privs] on Object
  *    [type=TABLE_OR_VIEW, name=db.t, action=...]]`
  *    (SQLAuthorizationUtils.assertNoDeniedPermissions,
  *    HivePrincipal/HivePrivilegeObject.toString).
  */
object AuthEnforcement {

  /** The reference's HiveAccessControlException (same simple-name so
    * error renderings match `FAILED: HiveAccessControlException ...`). */
  class HiveAccessControlException(msg: String)
      extends RuntimeException(msg)

  /** SQLPrivTypeGrant ordinal order — missing-priv lists sort by it. */
  private val privOrder: Map[String, Int] = Seq(
    "SELECT", "SELECT with grant", "INSERT", "INSERT with grant",
    "UPDATE", "UPDATE with grant", "DELETE", "DELETE with grant",
    "OBJECT OWNERSHIP", "ADMIN PRIVILEGE").zipWithIndex.toMap

  /** One object to check: required privileges must ALL be available.
    * `objType` is TABLE_OR_VIEW or DATABASE (database objects check
    * ownership/admin; their name renders without a table part). The
    * action suffix renders only for INSERT/INSERT_OVERWRITE —
    * HivePrivilegeObject.toString's switch falls through for
    * UPDATE/DELETE actions. */
  case class Check(db: String, table: String, required: Seq[String],
      action: String = "", objType: String = "TABLE_OR_VIEW") {
    def render: String = {
      val act =
        if (action == "INSERT" || action == "INSERT_OVERWRITE")
          s", action=$action"
        else ""
      val name = if (objType == "DATABASE") db else s"$db.$table"
      s"Object [type=$objType, name=$name$act]"
    }
  }

  def enforce(op: String, checks: Seq[Check], auth: AuthStore): Unit = {
    if (checks.isEmpty || auth.adminActive) return
    val user = auth.currentUser
    val denied = checks.map { c =>
      val avail = auth.availableOn(user, c.db, c.table)
      val missing = c.required.filterNot(avail.contains)
        .distinct.sortBy(p => privOrder.getOrElse(p, 99))
      if (missing.isEmpty) None
      else Some(missing.mkString("[", ", ", "]") + " on " + c.render)
    }.collect { case Some(m) => m }.sorted
    if (denied.nonEmpty)
      throw new HiveAccessControlException(
        s"Permission denied: Principal [name=$user, type=USER] does " +
          s"not have following privileges for operation $op " +
          denied.mkString("[", ", ", "]"))
  }
}
