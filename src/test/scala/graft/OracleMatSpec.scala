package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rel.Oracle

/** Oracle.mat() must materialize exactly the CTE heads of a WITH
  * list and nothing else — in particular never the `name AS (…)`
  * items of a WINDOW clause, whose comma-continued form is locally
  * byte-identical to a CTE list continuation. */
class OracleMatSpec extends AnyFunSuite {

  test("single CTE head is materialized") {
    assert(Oracle.mat("WITH a AS (SELECT 1) SELECT * FROM a") ==
      "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
  }

  test("comma-continued CTE list: every head materialized") {
    val in = "WITH a AS (SELECT 1), b AS (SELECT 2),\nc AS (SELECT 3) SELECT *"
    val out = Oracle.mat(in)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("))
    assert(out.contains("c AS MATERIALIZED ("))
  }

  test("WITH RECURSIVE head is materialized (legacy behavior kept)") {
    val out = Oracle.mat("WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r")
    assert(out.startsWith("WITH RECURSIVE r AS MATERIALIZED ("))
  }

  test("single-window WINDOW clause untouched") {
    val in = "SELECT sum(x) OVER w FROM t WINDOW w AS (ORDER BY x)"
    assert(Oracle.mat(in) == in)
  }

  test("multi-window WINDOW clause untouched (the regex footgun)") {
    val in = "WITH a AS (SELECT 1) SELECT sum(x) OVER w1, avg(x) OVER w2 " +
      "FROM a WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y)"
    val out = Oracle.mat(in)
    assert(out.contains("a AS MATERIALIZED (SELECT 1)"))
    assert(out.contains("WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y)"))
    assert(!out.contains("w1 AS MATERIALIZED"))
    assert(!out.contains("w2 AS MATERIALIZED"))
  }

  test("double-space before AS still classified (the other footgun)") {
    val out = Oracle.mat("SELECT 1 WINDOW w  AS (ORDER BY x)")
    assert(!out.contains("MATERIALIZED"))
    val out2 = Oracle.mat("WITH cte  AS (SELECT 1) SELECT * FROM cte")
    assert(out2.contains("cte AS MATERIALIZED ("))
  }

  test("nested WITH inside a CTE body: both levels, windows spared") {
    val in = "WITH outer_c AS (WITH inner_c AS (SELECT 1) " +
      "SELECT x, row_number() OVER w FROM inner_c " +
      "WINDOW w AS (ORDER BY x)), second_c AS (SELECT 2) SELECT *"
    val out = Oracle.mat(in)
    assert(out.contains("outer_c AS MATERIALIZED ("))
    assert(out.contains("inner_c AS MATERIALIZED (SELECT 1)"))
    assert(out.contains("second_c AS MATERIALIZED (SELECT 2)"))
    assert(out.contains("WINDOW w AS (ORDER BY x)"))
  }

  test("window clause followed by same-depth CTE continuation never bleeds") {
    // w2 after the comma inherits WINDOW (same depth as w1), not the
    // depth-0 CTE classification of the WITH list.
    val in = "WITH a AS (SELECT row_number() OVER w1 " +
      "WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y)), b AS (SELECT 2) SELECT *"
    val out = Oracle.mat(in)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("))
    assert(out.contains("w1 AS (ORDER BY x), w2 AS (ORDER BY y)"))
  }

  test("apostrophe inside a -- comment never flips string state") {
    // "engine's" in a comment would leave a naive scanner in-string
    // for the rest of the text, suppressing MATERIALIZED on every
    // later CTE head.
    val in = "WITH a AS ( -- the engine's first step\nSELECT 1), " +
      "b AS (SELECT 2) SELECT *"
    val out = Oracle.mat(in)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED (SELECT 2)"))
  }

  test("a CTE-head-shaped token inside a -- comment is inert") {
    val in = "WITH a AS (SELECT 1) -- note: x AS (nope)\nSELECT * FROM a"
    val out = Oracle.mat(in)
    assert(out.contains("a AS MATERIALIZED (SELECT 1)"))
    assert(!out.contains("x AS MATERIALIZED"))
  }

  test("-- inside a string literal does not open a comment") {
    val in = "WITH a AS (SELECT '--not a comment' AS s), b AS (SELECT 2) SELECT *"
    val out = Oracle.mat(in)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED (SELECT 2)"))
  }

  test("string literals are inert") {
    val in = "WITH a AS (SELECT 'x AS (' AS s) SELECT * FROM a"
    val out = Oracle.mat(in)
    assert(out == "WITH a AS MATERIALIZED (SELECT 'x AS (' AS s) SELECT * FROM a")
  }

  test("seeded-random compositions: mat only inserts MATERIALIZED " +
    "tokens and is idempotent") {
    // Generator over the grammar that bit us historically: WITH
    // lists, nested WITH, WINDOW clauses, string literals with
    // quotes, and -- comments carrying apostrophes and head-shaped
    // bait. Two invariants hold for ANY input: stripping the
    // inserted token restores the input byte-for-byte (mat never
    // rewrites anything else), and mat is idempotent (an inserted
    // token never re-matches).
    val rnd = new scala.util.Random(1234)
    def name() = "c" + rnd.nextInt(20)
    def body(depth: Int): String =
      if (depth > 1 || rnd.nextInt(3) > 0) "SELECT " + rnd.nextInt(9)
      else withText(depth + 1)
    def cte(depth: Int) = s"${name()} AS (${body(depth)})"
    def windowClause() =
      s" WINDOW w${rnd.nextInt(5)} AS (ORDER BY x)" +
        (if (rnd.nextBoolean()) s", w${5 + rnd.nextInt(5)} AS (ORDER BY y)"
         else "")
    def noise() = rnd.nextInt(4) match {
      case 0 => " -- the engine's x AS (bait)\n"
      case 1 => " 'it''s a ''quoted'' str' "
      case 2 => " '--not a comment' "
      case _ => " "
    }
    def withText(depth: Int): String =
      "WITH " + Seq.fill(1 + rnd.nextInt(3))(cte(depth))
        .mkString(", ") + noise() +
        " SELECT sum(x) OVER w1 FROM t" +
        (if (rnd.nextBoolean()) windowClause() else "")
    (1 to 200).foreach { _ =>
      val in = withText(0)
      val out = Oracle.mat(in)
      assert(out.replace(" AS MATERIALIZED (", " AS (") == in,
        s"mat rewrote more than the insertion token:\nin=$in\nout=$out")
      assert(Oracle.mat(out) == out, s"mat not idempotent on:\n$out")
      assert(!out.matches("""(?s).*WINDOW w\d+ AS MATERIALIZED.*"""),
        s"window head materialized:\n$out")
    }
  }

  test("every mat()'d production oracle gains at least one MATERIALIZED") {
    // The production call sites wrap WITH-headed texts; a mat() that
    // silently stopped matching would regress the exponential-replay
    // fix without failing any value oracle.
    val texts = graft.SparkEntry.oracleSql.values.toSeq
    val matted = texts.count(_.contains("AS MATERIALIZED ("))
    assert(matted >= 8, s"expected >=8 materialized oracles, got $matted")
  }
}
