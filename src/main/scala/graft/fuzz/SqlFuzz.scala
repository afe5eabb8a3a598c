package graft.fuzz

import scala.util.Random

/** Randomized differential SQL generator: emits seeded queries in the
  * common Spark/DuckDB ANSI subset over the driver's corpus tables, so
  * the SAME text can run on both engines and hash-compare — the
  * query-scale analogue of the reference's differential plan tests
  * (`/root/reference/tests/integration_optimizer.rs:149-212`), and the
  * tier above the 107 fixed gate queries.
  *
  * Cross-engine exactness rules baked into the grammar (each learned
  * the hard way by the fixed gate, see operators/Relational.scala):
  *  - SUM/AVG over doubles is order-dependent → always
  *    `CAST(SUM(CAST(x AS DECIMAL(14,2))) AS DOUBLE)`; decimal
  *    addition is exact, the final double render is deterministic.
  *  - LIMIT requires a TOTAL order → ORDER BY every output column.
  *    (Duplicate full rows at the boundary are interchangeable — the
  *    sorted-rows compare can't tell copies apart.)
  *  - Default null ordering differs (Spark: NULLS FIRST on ASC;
  *    DuckDB: NULLS LAST) → every ORDER BY key carries an explicit
  *    NULLS FIRST/LAST.
  *  - Window functions order by a unique key so ranks are total.
  *  - `events.ts` is TIMESTAMP(NANOS) parquet (engines read it
  *    differently) → excluded from the column catalog.
  *  - No division anywhere (integer `/` semantics and decimal
  *    division precision both diverge).
  */
object SqlFuzz {

  /** Grammar version — stamped into FuzzRun's `fuzz_meta.json` and its
    * summary line. Bump on ANY change to [[gen]]'s shape distribution
    * or the generators: seeds remap to different queries across
    * versions, so recorded per-seed corpora/hashes are only comparable
    * within one version (ADVICE r7 — stale recorded corpora must fail
    * loudly, not silently compare re-mapped queries).
    *
    * v2: LATERAL shape, NOT EXISTS + correlated IN subqueries,
    * aggregate-expression HAVING, NULL-dense derived-corpus shape. */
  val grammarVersion = 2

  private case class Col(name: String, kind: Kind)
  private sealed trait Kind
  private case object IntK extends Kind
  private case object DblK extends Kind
  private case object StrK extends Kind
  private case object TsK extends Kind

  /** unique = the ORDER BY key for window shapes. keyIsTotal=false
    * marks tables where that key has duplicates (lineitem:
    * (l_orderkey, l_linenumber) is NOT unique in the driver corpus —
    * found by this fuzzer's first run); such tables only get
    * tie-stable window functions (rank/dense_rank), since
    * row_number/lag/running-sum are tie-order-nondeterministic. */
  private case class Tbl(name: String, unique: Seq[String], cols: Seq[Col],
                         strDomains: Map[String, Seq[String]],
                         intRanges: Map[String, (Long, Long)],
                         dblRanges: Map[String, (Double, Double)],
                         keyIsTotal: Boolean = true)

  private val lineitem = Tbl("lineitem", Seq("l_orderkey", "l_linenumber"),
    Seq(Col("l_orderkey", IntK), Col("l_partkey", IntK), Col("l_suppkey", IntK),
      Col("l_linenumber", IntK), Col("l_quantity", DblK),
      Col("l_extendedprice", DblK), Col("l_discount", DblK), Col("l_tax", DblK),
      Col("l_returnflag", StrK), Col("l_linestatus", StrK), Col("l_shipdate", TsK)),
    Map("l_returnflag" -> Seq("A", "N", "R"), "l_linestatus" -> Seq("F", "O")),
    Map("l_orderkey" -> (0L, 149999L), "l_partkey" -> (0L, 19999L),
      "l_suppkey" -> (0L, 999L), "l_linenumber" -> (1L, 7L)),
    Map("l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (900.0, 105000.0),
      "l_discount" -> (0.0, 0.1), "l_tax" -> (0.0, 0.08)),
    keyIsTotal = false)

  private val orders = Tbl("orders", Seq("o_orderkey"),
    Seq(Col("o_orderkey", IntK), Col("o_custkey", IntK),
      Col("o_orderstatus", StrK), Col("o_totalprice", DblK),
      Col("o_orderdate", TsK), Col("o_orderpriority", StrK)),
    Map("o_orderstatus" -> Seq("F", "O", "P"),
      "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
    Map("o_orderkey" -> (0L, 149999L), "o_custkey" -> (0L, 14999L)),
    Map("o_totalprice" -> (1000.0, 500000.0)))

  private val customer = Tbl("customer", Seq("c_custkey"),
    Seq(Col("c_custkey", IntK), Col("c_nationkey", IntK),
      Col("c_acctbal", DblK), Col("c_mktsegment", StrK), Col("c_name", StrK)),
    Map("c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
    Map("c_custkey" -> (0L, 14999L), "c_nationkey" -> (0L, 24L)),
    Map("c_acctbal" -> (-1000.0, 10000.0)))

  private val supplier = Tbl("supplier", Seq("s_suppkey"),
    Seq(Col("s_suppkey", IntK), Col("s_nationkey", IntK),
      Col("s_acctbal", DblK), Col("s_name", StrK)),
    Map(),
    Map("s_suppkey" -> (0L, 999L), "s_nationkey" -> (0L, 24L)),
    Map("s_acctbal" -> (-1000.0, 10000.0)))

  private val part = Tbl("part", Seq("p_partkey"),
    Seq(Col("p_partkey", IntK), Col("p_size", IntK),
      Col("p_retailprice", DblK), Col("p_brand", StrK),
      Col("p_type", StrK), Col("p_name", StrK)),
    Map("p_brand" -> (1 to 25).map(i => s"Brand#$i"),
      "p_type" -> Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")),
    Map("p_partkey" -> (0L, 19999L), "p_size" -> (1L, 50L)),
    Map("p_retailprice" -> (900.0, 1000.0)))

  private val nation = Tbl("nation", Seq("n_nationkey"),
    Seq(Col("n_nationkey", IntK), Col("n_regionkey", IntK), Col("n_name", StrK)),
    Map("n_name" -> (0 to 24).map(i => s"NATION_$i")),
    Map("n_nationkey" -> (0L, 24L), "n_regionkey" -> (0L, 4L)), Map())

  private val region = Tbl("region", Seq("r_regionkey"),
    Seq(Col("r_regionkey", IntK), Col("r_name", StrK)),
    Map("r_name" -> Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")),
    Map("r_regionkey" -> (0L, 4L)), Map())

  private val events = Tbl("events", Seq("event_id"),
    Seq(Col("event_id", IntK), Col("user_id", IntK),
      Col("value", DblK), Col("event_type", StrK)),
    Map("event_type" -> Seq("click", "error", "purchase", "signup", "view")),
    Map("event_id" -> (0L, 99999L), "user_id" -> (0L, 1499L)),
    Map("value" -> (0.0, 500.0)))

  private val documents = Tbl("documents", Seq("doc_id"),
    Seq(Col("doc_id", IntK), Col("n_chars", IntK),
      Col("lang", StrK), Col("source", StrK)),
    Map("lang" -> Seq("de", "en", "es", "fr", "zh"),
      "source" -> (0 until 20).map(i => s"src$i")),
    Map("doc_id" -> (0L, 4999L), "n_chars" -> (40L, 600L)), Map())

  /** (left, right, ON clause) — the star schema's FK edges */
  private val edges: Seq[(Tbl, Tbl, String)] = Seq(
    (lineitem, orders, "lineitem.l_orderkey = orders.o_orderkey"),
    (lineitem, part, "lineitem.l_partkey = part.p_partkey"),
    (lineitem, supplier, "lineitem.l_suppkey = supplier.s_suppkey"),
    (orders, customer, "orders.o_custkey = customer.c_custkey"),
    (customer, nation, "customer.c_nationkey = nation.n_nationkey"),
    (supplier, nation, "supplier.s_nationkey = nation.n_nationkey"),
    (nation, region, "nation.n_regionkey = region.r_regionkey"))

  private val soloTables = Seq(lineitem, orders, customer, supplier, part,
    nation, events, documents)

  // ------------------------------------------------------------ helpers

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private def intLit(r: Random, lo: Long, hi: Long): String =
    (lo + (r.nextDouble() * (hi - lo)).toLong).toString

  private def dblLit(r: Random, lo: Double, hi: Double): String = {
    val v = lo + r.nextDouble() * (hi - lo)
    // 2 decimals: parses to the same double in both engines
    f"$v%.2f"
  }

  private def tsLit(r: Random): String = {
    val y = 1995 + r.nextInt(7)
    val m = 1 + r.nextInt(12)
    val d = 1 + r.nextInt(28)
    f"TIMESTAMP '$y%04d-$m%02d-$d%02d 00:00:00'"
  }

  /** One comparison/membership predicate on a column in scope. */
  private def atom(r: Random, t: Tbl, c: Col): String = {
    val col = s"${t.name}.${c.name}"
    c.kind match {
      case IntK =>
        val (lo, hi) = t.intRanges.getOrElse(c.name, (0L, 1000L))
        r.nextInt(3) match {
          case 0 => s"$col ${pick(r, Seq("<", "<=", ">", ">=", "=", "<>"))} ${intLit(r, lo, hi)}"
          case 1 => s"$col BETWEEN ${intLit(r, lo, (lo + hi) / 2)} AND ${intLit(r, (lo + hi) / 2, hi)}"
          case _ => s"$col IN (${Seq.fill(3)(intLit(r, lo, hi)).mkString(", ")})"
        }
      case DblK =>
        val (lo, hi) = t.dblRanges.getOrElse(c.name, (0.0, 1000.0))
        s"$col ${pick(r, Seq("<", "<=", ">", ">="))} ${dblLit(r, lo, hi)}"
      case StrK =>
        t.strDomains.get(c.name) match {
          case Some(dom) if r.nextBoolean() =>
            s"$col IN (${r.shuffle(dom).take(1 + r.nextInt(3)).map(q).mkString(", ")})"
          case Some(dom) => s"$col ${pick(r, Seq("=", "<>"))} ${q(pick(r, dom))}"
          case None => s"$col LIKE ${q(pick(r, Seq("C%", "S%", "%1%", "%a%")))}"
        }
      case TsK =>
        if (r.nextBoolean()) s"$col >= ${tsLit(r)}"
        else { val (a, b) = (tsLit(r), tsLit(r)); s"$col BETWEEN LEAST($a, $b) AND GREATEST($a, $b)" }
    }
  }

  /** 1-3 atoms joined with AND/OR (parenthesized). */
  private def pred(r: Random, scope: Seq[Tbl]): String = {
    val n = 1 + r.nextInt(3)
    val parts = Seq.fill(n) {
      val t = pick(r, scope)
      atom(r, t, pick(r, t.cols))
    }
    parts.reduce((a, b) => s"($a ${pick(r, Seq("AND", "OR"))} $b)")
  }

  /** A select item (no aggregates); returns (sqlExpr, deterministic). */
  private def item(r: Random, scope: Seq[Tbl]): String = {
    val t = pick(r, scope)
    val c = pick(r, t.cols)
    val col = s"${t.name}.${c.name}"
    (c.kind, r.nextInt(4)) match {
      case (IntK, 0) => s"($col + ${1 + r.nextInt(100)})"
      case (IntK, 1) => s"($col * 2)"
      case (DblK, 0) => s"($col * 2)"
      case (DblK, 1) =>
        val t2 = pick(r, scope)
        t2.cols.find(_.kind == DblK) match {
          case Some(c2) => s"($col + ${t2.name}.${c2.name})"
          case None => col
        }
      case (StrK, 0) => s"upper($col)"
      case (StrK, 1) => s"substring($col, 1, 3)"
      case (StrK, 2) => s"length($col)"
      case (TsK, 0) => s"EXTRACT(YEAR FROM $col)"
      case (IntK, 2) =>
        s"(CASE WHEN ${atom(r, t, c)} THEN $col ELSE ${intLit(r, 0, 100)} END)"
      case _ => col
    }
  }

  /** FROM clause: a table or a 2-3 table join along FK edges. */
  private def fromClause(r: Random): (String, Seq[Tbl]) = {
    r.nextInt(3) match {
      case 0 =>
        val t = pick(r, soloTables)
        (t.name, Seq(t))
      case 1 =>
        val (a, b, on) = pick(r, edges)
        // all four outer-join shapes: null-extended rows exercise null
        // grouping/ordering semantics downstream
        val jt = pick(r, Seq("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"))
        (s"${a.name} $jt ${b.name} ON $on", Seq(a, b))
      case _ =>
        // chain two adjacent edges (shared middle table)
        val chains = Seq(
          (lineitem, orders, customer,
            "lineitem.l_orderkey = orders.o_orderkey",
            "orders.o_custkey = customer.c_custkey"),
          (orders, customer, nation,
            "orders.o_custkey = customer.c_custkey",
            "customer.c_nationkey = nation.n_nationkey"),
          (customer, nation, region,
            "customer.c_nationkey = nation.n_nationkey",
            "nation.n_regionkey = region.r_regionkey"),
          (lineitem, part, supplier,
            "lineitem.l_partkey = part.p_partkey",
            "lineitem.l_suppkey = supplier.s_suppkey"))
        val (a, b, c, on1, on2) = pick(r, chains)
        (s"${a.name} JOIN ${b.name} ON $on1 JOIN ${c.name} ON $on2", Seq(a, b, c))
    }
  }

  private def lowCard(t: Tbl): Seq[Col] =
    t.cols.filter(c => t.strDomains.contains(c.name) ||
      (c.kind == IntK && t.intRanges.get(c.name).exists { case (lo, hi) => hi - lo <= 60 }))

  // ------------------------------------------------------------ shapes

  private def scanQ(r: Random): String = {
    val (from, scope) = fromClause(r)
    val n = 2 + r.nextInt(3)
    val items = (0 until n).map(i => s"${item(r, scope)} AS c$i")
    val order = (0 until n).map(i =>
      s"c$i ${pick(r, Seq("ASC", "DESC"))} ${pick(r, Seq("NULLS FIRST", "NULLS LAST"))}")
    s"""SELECT ${items.mkString(", ")}
       |FROM $from
       |WHERE ${pred(r, scope)}
       |ORDER BY ${order.mkString(", ")}
       |LIMIT ${1 + r.nextInt(200)}""".stripMargin
  }

  private def aggExprs(r: Random, scope: Seq[Tbl], n0: Int): Seq[String] = {
    var i = n0
    def nm(): String = { i += 1; s"c${i - 1}" }
    val aggs = scala.collection.mutable.Buffer[String](s"count(*) AS ${nm()}")
    (0 until 1 + r.nextInt(3)).foreach { _ =>
      val t = pick(r, scope)
      val c = pick(r, t.cols)
      val col = s"${t.name}.${c.name}"
      c.kind match {
        case IntK => aggs += s"${pick(r, Seq("min", "max", "sum", "count"))}($col) AS ${nm()}"
        case DblK =>
          if (r.nextBoolean()) aggs += s"${pick(r, Seq("min", "max"))}($col) AS ${nm()}"
          else aggs += s"CAST(SUM(CAST($col AS DECIMAL(14,2))) AS DOUBLE) AS ${nm()}"
        case StrK => aggs += s"${pick(r, Seq("min", "max", "count"))}($col) AS ${nm()}"
        case TsK => aggs += s"${pick(r, Seq("min", "max"))}($col) AS ${nm()}"
      }
      if (r.nextInt(4) == 0) aggs += s"count(DISTINCT $col) AS ${nm()}"
    }
    aggs.toSeq
  }

  private def aggQ(r: Random): String = {
    val (from, scope) = fromClause(r)
    val keyPool = scope.flatMap(t => lowCard(t).map(c => s"${t.name}.${c.name}"))
    val keys = if (keyPool.isEmpty) Seq.empty
               else r.shuffle(keyPool).take(1 + r.nextInt(2))
    val keyItems = keys.zipWithIndex.map { case (k, i) => s"$k AS k$i" }
    val aggs = aggExprs(r, scope, 0)
    // HAVING on count(*) or on a re-stated aggregate expression (both
    // engines require repeating the expr — HAVING sees no aliases)
    val having = if (keys.nonEmpty && r.nextInt(3) == 0) {
      val t = pick(r, scope)
      val hExpr = t.cols.find(_.kind == IntK) match {
        case Some(c) if r.nextBoolean() =>
          s"${pick(r, Seq("min", "max"))}(${t.name}.${c.name}) " +
            s"${pick(r, Seq("<", "<=", ">", ">="))} " +
            intLit(r, t.intRanges.get(c.name).map(_._1).getOrElse(0L),
              t.intRanges.get(c.name).map(_._2).getOrElse(1000L))
        case _ => s"count(*) >= ${1 + r.nextInt(3)}"
      }
      s"\nHAVING $hExpr"
    } else ""
    val groupBy = if (keys.isEmpty) "" else s"\nGROUP BY ${keys.mkString(", ")}"
    s"""SELECT ${(keyItems ++ aggs).mkString(", ")}
       |FROM $from
       |WHERE ${pred(r, scope)}$groupBy$having""".stripMargin
  }

  private def setQ(r: Random): String = {
    val t = pick(r, soloTables)
    val n = 2 + r.nextInt(2)
    val items = (0 until n).map(i => s"${item(r, Seq(t))} AS c$i").mkString(", ")
    val op = pick(r, Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT"))
    s"""SELECT $items FROM ${t.name} WHERE ${pred(r, Seq(t))}
       |$op
       |SELECT $items FROM ${t.name} WHERE ${pred(r, Seq(t))}""".stripMargin
  }

  private def winQ(r: Random): String = {
    val t = pick(r, soloTables)
    val partCols = lowCard(t)
    val part = if (partCols.isEmpty) "" else
      s"PARTITION BY ${t.name}.${pick(r, partCols).name} "
    val ord = t.unique.map(u => s"${t.name}.$u ${pick(r, Seq("ASC", "DESC"))}").mkString(", ")
    val fns =
      if (t.keyIsTotal) Seq("row_number()", "rank()", "dense_rank()",
        s"lag(${t.name}.${t.unique.head}, 1)", s"sum(${t.name}.${t.unique.head})")
      else Seq("rank()", "dense_rank()") // ties in the order key
    val fn = pick(r, fns)
    val frame =
      if (fn.startsWith("sum")) " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      else ""
    val winExpr = s"$fn OVER ($part\nORDER BY $ord$frame)"
    val n = 1 + r.nextInt(2)
    val items = (0 until n).map(i => s"${item(r, Seq(t))} AS c$i") :+ s"$winExpr AS w0"
    s"""SELECT ${items.mkString(", ")}
       |FROM ${t.name}
       |WHERE ${pred(r, Seq(t))}""".stripMargin
  }

  private def subQ(r: Random): String = {
    val (a, b, on) = pick(r, edges)
    r.nextInt(5) match {
      case 3 => // NOT EXISTS correlated on the FK edge
        s"""SELECT ${a.name}.${a.unique.head} AS c0
           |FROM ${a.name}
           |WHERE NOT EXISTS (SELECT 1 FROM ${b.name} WHERE $on AND ${pred(r, Seq(b))})
           |  AND ${pred(r, Seq(a))}
           |ORDER BY c0 ASC NULLS FIRST
           |LIMIT ${50 + r.nextInt(150)}""".stripMargin
      case 4 => // correlated IN: membership against an edge-correlated list
        val ac = pick(r, a.cols.filter(_.kind == IntK))
        val bc = pick(r, b.cols.filter(_.kind == IntK))
        s"""SELECT ${a.name}.${a.unique.mkString(s" AS c0, ${a.name}.")} AS c${a.unique.size - 1}
           |FROM ${a.name}
           |WHERE ${a.name}.${ac.name} IN
           |  (SELECT ${b.name}.${bc.name} FROM ${b.name} WHERE $on AND ${pred(r, Seq(b))})
           |ORDER BY ${(0 until a.unique.size).map(i => s"c$i ASC NULLS FIRST").mkString(", ")}
           |LIMIT ${50 + r.nextInt(150)}""".stripMargin
      case 0 => // scalar subquery bound
        val key = a.unique.head
        s"""SELECT ${a.name}.$key AS c0
           |FROM ${a.name}
           |WHERE ${a.name}.$key > (SELECT min(${b.name}.${b.unique.head}) FROM ${b.name} WHERE ${pred(r, Seq(b))})
           |  AND ${pred(r, Seq(a))}
           |ORDER BY c0 ASC NULLS FIRST
           |LIMIT ${50 + r.nextInt(150)}""".stripMargin
      case 1 => // EXISTS correlated on the FK edge
        s"""SELECT ${a.name}.${a.unique.head} AS c0
           |FROM ${a.name}
           |WHERE EXISTS (SELECT 1 FROM ${b.name} WHERE $on AND ${pred(r, Seq(b))})
           |ORDER BY c0 ASC NULLS FIRST
           |LIMIT ${50 + r.nextInt(150)}""".stripMargin
      case _ => // NOT IN (non-null FK side)
        val (fk, pk) = {
          val parts = on.split(" = ")
          (parts(0), parts(1))
        }
        s"""SELECT $fk AS c0, count(*) AS c1
           |FROM ${a.name}
           |WHERE $fk NOT IN (SELECT $pk FROM ${b.name} WHERE ${pred(r, Seq(b))})
           |GROUP BY $fk""".stripMargin
    }
  }

  /** Multi-level grouping: ROLLUP / CUBE / GROUPING SETS over low-card
    * keys. Super-aggregate rows surface NULL keys plus GROUPING()
    * markers — a classic cross-engine divergence surface (null
    * placement, grouping-id semantics) the fixed gate only covers with
    * hand-written queries. GROUPING(k) is emitted per key so a NULL
    * key VALUE and a rolled-up key are distinguishable in the hash.
    *
    * The grand-total `()` grouping set is deliberately NEVER emitted
    * (so ROLLUP/CUBE are spelled as explicit GROUPING SETS minus the
    * empty set): on EMPTY filtered input ANSI semantics give the ()
    * set one row (count=0) — DuckDB and Postgres do — while Spark
    * returns zero rows. Found by this fuzzer's first extended run
    * (seeds 107/152/175/242, all `rows spark=0 duck=1` under
    * row-eliminating predicates); a real engine divergence, outside
    * the common subset this grammar targets. */
  private def rollQ(r: Random): String = {
    val (from, scope) = fromClause(r)
    val keyPool = scope.flatMap(t => lowCard(t).map(c => s"${t.name}.${c.name}"))
    if (keyPool.isEmpty) return aggQ(r) // no groupable key in scope
    val keys = r.shuffle(keyPool).take(2.min(keyPool.size)).distinct
    val keyItems = keys.zipWithIndex.map { case (k, i) => s"$k AS k$i" }
    val marks = keys.zipWithIndex.map { case (k, i) => s"GROUPING($k) AS g$i" }
    val spec = r.nextInt(3) match {
      case 0 => // rollup minus the grand total
        val sets = (keys.size to 1 by -1).map(n => s"(${keys.take(n).mkString(", ")})")
        s"GROUPING SETS (${sets.mkString(", ")})"
      case 1 => // cube minus the grand total
        val sets = (s"(${keys.mkString(", ")})" +: keys.map(k => s"($k)")).distinct
        s"GROUPING SETS (${sets.mkString(", ")})"
      case _ =>
        val sets = Seq(s"(${keys.mkString(", ")})", s"(${keys.head})").distinct
        s"GROUPING SETS (${sets.mkString(", ")})"
    }
    val aggs = aggExprs(r, scope, 0)
    s"""SELECT ${(keyItems ++ marks ++ aggs).mkString(", ")}
       |FROM $from
       |WHERE ${pred(r, scope)}
       |GROUP BY $spec""".stripMargin
  }

  /** SELECT DISTINCT with a total order + LIMIT: distinct-then-limit
    * exercises dedup before the sort boundary (Spark: HashAggregate
    * feeding TakeOrderedAndProject), where partial-limit pushdown bugs
    * would surface as missing rows. */
  private def distQ(r: Random): String = {
    val (from, scope) = fromClause(r)
    val n = 2 + r.nextInt(2)
    val items = (0 until n).map(i => s"${item(r, scope)} AS c$i")
    val order = (0 until n).map(i =>
      s"c$i ${pick(r, Seq("ASC", "DESC"))} ${pick(r, Seq("NULLS FIRST", "NULLS LAST"))}")
    s"""SELECT DISTINCT ${items.mkString(", ")}
       |FROM $from
       |WHERE ${pred(r, scope)}
       |ORDER BY ${order.mkString(", ")}
       |LIMIT ${1 + r.nextInt(200)}""".stripMargin
  }

  private def cteQ(r: Random): String = {
    val (from, scope) = fromClause(r)
    val t = pick(r, scope)
    val kc = lowCard(t)
    val key = if (kc.isEmpty) s"${t.name}.${t.unique.head}" else s"${t.name}.${pick(r, kc).name}"
    s"""WITH base AS (
       |  SELECT $key AS k, count(*) AS cnt
       |  FROM $from
       |  WHERE ${pred(r, scope)}
       |  GROUP BY $key
       |)
       |SELECT k AS c0, cnt AS c1, (cnt * 2) AS c2 FROM base WHERE cnt >= ${1 + r.nextInt(4)}""".stripMargin
  }

  /** LATERAL correlated derived table: a per-outer-row aggregate over
    * the FK edge, computed inside the lateral subquery (always exactly
    * one row — count over empty is 0, min/max over empty is NULL, so
    * the null-extended value also exercises null ordering). c0 is the
    * CORRELATION column (not just any key): rows sharing c0 share the
    * same lateral result, so ties at the LIMIT boundary are full-row
    * duplicates — interchangeable under the sorted compare.
    *
    * LEFT JOIN LATERAL ... ON true, NOT comma-LATERAL: DuckDB 1.0's
    * decorrelation of a comma-LATERAL aggregate DROPS empty groups
    * (the classic COUNT bug — ANSI and Spark produce one NULL row per
    * empty group; minimal repro in the round-8 notes). The LEFT JOIN
    * form null-extends on both engines, so the texts agree. */
  private def latQ(r: Random): String = {
    val (a, b, on) = pick(r, edges)
    val fk = on.split(" = ")(0)
    val bi = pick(r, b.cols.filter(_.kind == IntK))
    val agg = pick(r, Seq("count(*)",
      s"min(${b.name}.${bi.name})", s"max(${b.name}.${bi.name})"))
    s"""SELECT $fk AS c0, l.m AS c1
       |FROM ${a.name} LEFT JOIN LATERAL (
       |  SELECT $agg AS m FROM ${b.name}
       |  WHERE $on AND ${pred(r, Seq(b))}
       |) l ON true
       |WHERE ${pred(r, Seq(a))}
       |ORDER BY c0 ASC NULLS FIRST, c1 ASC NULLS FIRST
       |LIMIT ${50 + r.nextInt(150)}""".stripMargin
  }

  /** NULL-dense derived corpus: deterministically NULL out a key-slice
    * of one column (CASE on key modulus — identical rows on both
    * engines), then exercise the classic null-semantics surfaces the
    * almost-null-free base corpus can't reach: NULL groups, count(col)
    * vs count(*), COALESCE, IS [NOT] NULL, three-valued NOT IN, and
    * explicit null placement in ORDER BY. */
  private def nullQ(r: Random): String = {
    val t = pick(r, Seq(orders, customer, events, documents, part, supplier))
    val key = t.unique.head
    val c = pick(r, t.cols.filterNot(_.name == key))
    val mod = 2 + r.nextInt(4)
    val nc = s"CASE WHEN ${t.name}.$key % $mod = 0 THEN NULL ELSE ${t.name}.${c.name} END"
    val base = s"""base AS (
       |  SELECT ${t.name}.$key AS k, $nc AS v
       |  FROM ${t.name}
       |  WHERE ${pred(r, Seq(t))}
       |)""".stripMargin
    r.nextInt(4) match {
      case 0 => // NULL group: GROUP BY the nullable value
        s"""WITH $base
           |SELECT v AS c0, count(*) AS c1, count(v) AS c2 FROM base GROUP BY v""".stripMargin
      case 1 => // null placement in ORDER BY + COALESCE render
        val coal = c.kind match {
          case IntK => s"COALESCE(v, ${-1 - r.nextInt(100)})"
          case DblK => s"COALESCE(v, ${-1 - r.nextInt(100)}.5)"
          case StrK => s"COALESCE(v, '~missing~')"
          case TsK => "COALESCE(v, TIMESTAMP '1970-01-01 00:00:00')"
        }
        s"""WITH $base
           |SELECT k AS c0, v AS c1, $coal AS c2 FROM base
           |ORDER BY c1 ${pick(r, Seq("ASC", "DESC"))} ${pick(r, Seq("NULLS FIRST", "NULLS LAST"))}, c0 ASC NULLS FIRST
           |LIMIT ${1 + r.nextInt(200)}""".stripMargin
      case 2 => // three-valued NOT IN: one NULL in the list kills every row
        val ic = pick(r, t.cols.filter(x => x.kind == IntK && x.name != key))
        val ncInt = s"CASE WHEN ${t.name}.$key % $mod = 0 THEN NULL ELSE ${t.name}.${ic.name} END"
        s"""SELECT count(*) AS c0, count(${t.name}.$key) AS c1
           |FROM ${t.name}
           |WHERE ${t.name}.$key NOT IN
           |  (SELECT $ncInt FROM ${t.name} WHERE ${pred(r, Seq(t))})""".stripMargin
      case _ => // IS [NOT] NULL predicate + null-skipping aggregates
        s"""WITH $base
           |SELECT count(*) AS c0, count(v) AS c1, min(v) AS c2, max(v) AS c3
           |FROM base WHERE v IS ${if (r.nextBoolean()) "" else "NOT "}NULL OR k % ${2 + r.nextInt(5)} = 1""".stripMargin
    }
  }

  /** Deterministic query text for a seed. */
  def gen(seed: Long): String = {
    val r = new Random(seed)
    r.nextInt(100) match {
      case x if x < 18 => scanQ(r)
      case x if x < 34 => aggQ(r)
      case x if x < 45 => setQ(r)
      case x if x < 56 => winQ(r)
      case x if x < 66 => subQ(r)
      case x if x < 74 => cteQ(r)
      case x if x < 83 => rollQ(r)
      case x if x < 90 => distQ(r)
      case x if x < 95 => latQ(r)
      case _ => nullQ(r)
    }
  }

  /** Stable name for a seed's query in Verify-style output dirs. */
  def name(seed: Long): String = f"fz$seed%04d"
}
