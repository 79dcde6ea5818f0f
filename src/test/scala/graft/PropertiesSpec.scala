package graft

import java.sql.Date

import graft.etl.{Transform, Validate}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties (SURVEY §5.2): the invariants the reference
  * states in prose, checked over generated inputs.
  *  - row conservation: clean ∪ rejected ≡ input, disjoint
  *    ("never drops rows silently", reference src/validate.py:53)
  *  - upsert idempotency: applying last-write-wins twice ≡ once
  *    (reference README.md:150)
  *  - date parse: every date round-trips through each of the 3 accepted
  *    formats; garbage coerces to null (reference src/transform.py:7-23)
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genRow: Gen[(String, String, String, String)] = for {
    id <- Gen.oneOf(Gen.const(null: String), Gen.const("  "),
      Gen.alphaNumStr.map(s => s"t$s"))
    qty <- Gen.oneOf(Gen.const("x"), Gen.choose(-3, 9).map(_.toString))
    price <- Gen.oneOf(Gen.const(null: String), Gen.const("-1.0"),
      Gen.const("junk"), Gen.choose(1, 9999).map(c => f"${c / 100.0}%.2f"))
    date <- Gen.oneOf("2024-01-05", "05/02/2024", "Jan 08 2024", "garbage", "")
  } yield (id, qty, price, date)

  test("property: validation conserves rows and the forks are disjoint") {
    val prop = Prop.forAll(Gen.listOfN(30, genRow)) { rows =>
      val df = rows.toDF("transaction_id", "quantity", "unit_price", "transaction_date")
        .withColumn("customer_id", lit("1"))
        .withColumn("product_name", lit("Widget"))
        .withColumn("region", lit("north"))
        .withColumn("status", lit("completed"))
      val (clean, rejected) = Validate.split(Transform(df))
      try {
        val n = df.count()
        val c = clean.count()
        val r = rejected.count()
        n == c + r
      } finally {
        // split persists internally; drop the cache entry between samples
        spark.sharedState.cacheManager.clearCache()
      }
    }
    check(prop, n = 10)
  }

  test("property: last-write-wins merge is idempotent") {
    def merge(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("batch").desc, col("v"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    val genKv = for {
      k <- Gen.choose(0, 8)
      batch <- Gen.choose(1, 3)
      v <- Gen.choose(0, 100)
    } yield (k, batch, v)
    val prop = Prop.forAll(Gen.nonEmptyListOf(genKv)) { kvs =>
      val df = kvs.toDF("k", "batch", "v")
      val once = merge(df).orderBy("k").collect().toSeq
      val twice = merge(merge(df)).orderBy("k").collect().toSeq
      once == twice && once.map(_.getInt(0)).distinct.size == once.size
    }
    check(prop, n = 10)
  }

  test("property: every date round-trips through each accepted format; garbage is null") {
    val fmts = Seq(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd"),
      java.time.format.DateTimeFormatter.ofPattern("dd/MM/yyyy"),
      java.time.format.DateTimeFormatter.ofPattern("MMM dd yyyy", java.util.Locale.US))
    val genDate = Gen.choose(0L, 20000L).map(java.time.LocalDate.ofEpochDay)
    val prop = Prop.forAll(genDate, Gen.choose(0, 2)) { (d, fi) =>
      val s = fmts(fi).format(d)
      val parsed = Seq(s).toDF("c")
        .select(Transform.parseDate(col("c")).as("d"))
        .collect().head.getAs[Date]("d")
      parsed != null && parsed.toLocalDate == d
    }
    check(prop)

    val garbage = Seq("2024-13-45", "9/9/9/9", "tomorrow", "", "05-02-2024")
    val parsed = garbage.toDF("c")
      .select(Transform.parseDate(col("c")).as("d")).collect()
    assert(parsed.forall(_.isNullAt(0)))
  }

  test("property: custom top-k per group ≡ window row_number, any data, any k") {
    val genScores = Gen.listOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 5)))
    val prop = Prop.forAll(genScores, Gen.choose(1, 4)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((g, s), i) => (s"g$g", i.toLong, s.toDouble) }
        .toDF("grp", "id", "score")
      val custom = graft.ops.TopK.perGroup(df, Seq("grp"),
          Seq(col("score").desc, col("id").asc), k)
        .orderBy("grp", "id").collect().map(_.toSeq).toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(col("score").desc, col("id").asc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("grp", "id").collect().map(_.toSeq).toSeq
      custom == windowed
    }
    check(prop, n = 8)
  }

  test("property: block-pair cells cover every unordered pair exactly once") {
    // the emb_neardup_pairs partitioning scheme (Similarity.nearDup):
    // left emits (b, j) for j in b..B-1, right emits (i, b) for i in 0..b;
    // keep kx<ky or id order on the diagonal ⇒ each pair meets once
    val prop = Prop.forAll(Gen.choose(2, 40), Gen.choose(1, 9)) { (n, b) =>
      val ids = (0L until n.toLong).toDF("id")
      val l = ids.select(col("id").as("id_l"))
        .withColumn("kx", pmod(col("id_l"), lit(b)))
        .withColumn("ky", explode(sequence(col("kx"), lit(b - 1))))
      val r = ids.select(col("id").as("id_r"))
        .withColumn("ky", pmod(col("id_r"), lit(b)))
        .withColumn("kx", explode(sequence(lit(0), col("ky"))))
      val met = l.join(r, Seq("kx", "ky"))
        .filter(col("kx") < col("ky") || col("id_l") < col("id_r"))
        .select(least(col("id_l"), col("id_r")).as("a"),
          greatest(col("id_l"), col("id_r")).as("b"))
        .groupBy("a", "b").count().collect()
      met.length == n * (n - 1) / 2 && met.forall(_.getLong(2) == 1L)
    }
    check(prop, n = 6)
  }

  test("property: two-level connected components ≡ driver union-find") {
    val genEdges = Gen.listOf(Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L)))
      .map(_.filter(e => e._1 != e._2))
    val prop = Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        // min-relabel: expected label = min id reachable
        val byRoot = parent.keys.toSeq.groupBy(find)
        val expected = byRoot.values.flatMap { ms =>
          val m = ms.min; ms.map(_ -> m)
        }.toMap
        val got = graft.ops.Graph
          .connectedComponents(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected
      }
    }
    check(prop, n = 6)
  }

  test("property: dense ids equal the sort rank for any unique key set") {
    val prop = Prop.forAll(
      Gen.listOfN(60, Gen.choose(-100000L, 100000L)).map(_.distinct),
      Gen.choose(1, 7)) { (keys, parts) =>
      keys.isEmpty || {
        val df = keys.toDF("k").repartition(parts)
        val got = graft.ops.DenseIds.assign(df, "k", "id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val expected = keys.sorted.zipWithIndex
          .map { case (k, i) => k -> i.toLong }.toMap
        got == expected
      }
    }
    check(prop, n = 8)
  }

  test("property: z-order covering cells always contain every in-box point") {
    val genBounds = for {
      lo <- Gen.choose(-1000L, 1000L)
      w <- Gen.choose(1L, 5000L)
    } yield (lo, lo + w)
    val prop = Prop.forAll(genBounds, genBounds, Gen.choose(0L, 1L << 40)) {
      case ((xLo, xHi), (yLo, yHi), seed) =>
        // a deterministic pseudo-random box + point set inside the domain
        def mix(i: Long) = (seed + i * 2654435761L) & Long.MaxValue
        val (x1, x2) = { val a = xLo + mix(1) % (xHi - xLo + 1)
          val b = xLo + mix(2) % (xHi - xLo + 1); (a.min(b), a.max(b)) }
        val (y1, y2) = { val a = yLo + mix(3) % (yHi - yLo + 1)
          val b = yLo + mix(4) % (yHi - yLo + 1); (a.min(b), a.max(b)) }
        val pts = (0 until 200).map(i =>
          (xLo + mix(10 + i) % (xHi - xLo + 1), yLo + mix(300 + i) % (yHi - yLo + 1)))
        val covering = graft.ops.ZOrder
          .coveringCells(x1, x2, xLo, xHi, y1, y2, yLo, yHi).toSet
        val cells = graft.ops.ZOrder.withZ(
            pts.toDF("x", "y"), col("x"), col("y"), xLo, xHi, yLo, yHi)
          .filter(col("x").between(x1, x2) && col("y").between(y1, y2))
          .select("zcell").distinct().collect().map(_.getInt(0)).toSet
        cells.subsetOf(covering)
    }
    check(prop, n = 10)
  }
}
