package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry contracts for the driver surface — pure map checks, no
  * Spark session. A new query that forgets its oracle (or an oracle
  * whose key drifts from its query) would silently downgrade the
  * driver's check to rows-only; this makes that a CI failure instead.
  */
class ContractSpec extends AnyFunSuite {

  // Empty since r11: q34 (the last rows-only entry — no LR trainer in
  // the oracle engine) now pins the TRAINED model's coefficients as
  // literals and oracle-checks the confusion matrix through the q59
  // literal-weight arithmetic. Every registered query must carry
  // oracle SQL; a new rows-only entry needs a documented reason here.
  private val rowsOnly = Set.empty[String]

  test("every query has oracle SQL unless documented rows-only") {
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == rowsOnly)
  }

  test("no orphan oracle SQL (every oracle key is a registered query)") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("the pinned bench core tier is 20 registered queries") {
    assert(Bench.coreTier.size == 20)
    val orphans = Bench.coreTier -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"core-tier names not in the registry: $orphans")
  }

  test("query names follow the qNN_ prefix contract with unique numbers") {
    val nums = SparkEntry.queries.keys.map { k =>
      assert(k.matches("q\\d{2,3}_[a-z0-9_]+"), s"bad query name: $k")
      k.drop(1).takeWhile(_.isDigit).toInt
    }
    assert(nums.toSeq.sorted == (1 to SparkEntry.queries.size))
  }

  test("oracle SQL references only driver-provided tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // Conservative scan: any FROM/JOIN identifier must be a known
    // table or a CTE defined in the same statement. Table FUNCTIONS
    // (`read_csv(...)` for the committed raw-log fixture) are
    // excluded by the no-open-paren lookahead.
    // Possessive `*+` so the name can't backtrack a character to
    // sneak past the function-call lookahead (read_csv → "read_cs").
    // Lookbehind: the keyword must not be the TAIL of an identifier —
    // the q154 battery's corpus vocabulary contains the literal word
    // "join", so generated columns like `tf_join AS ...` would
    // otherwise scan as `join AS`.
    val ident = "(?i)(?<![a-z0-9_])(?:from|join)\\s+([a-z_][a-z0-9_]*+)(?!\\s*\\()".r
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      // Blank out string literals first: log-pattern literals contain
      // SQL-looking prose ("... from neededReplications ...").
      val sql = rawSql.replaceAll("'[^']*'", "''")
        // EXTRACT(unit FROM expr) is not a relation reference.
        .replaceAll("(?i)extract\\s*\\([^)]*\\)", "x")
      // CTE names, with or without a column list: `x AS (`, `x(a,b) AS (`.
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+as\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      ident.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(tables.contains(t) || ctes.contains(t),
          s"$name references unknown relation '$t'")
      }
    }
  }
}
