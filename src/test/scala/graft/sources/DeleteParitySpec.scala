package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import graft.SparkTestBase

/** DIFFERENTIAL property test for the mutation predicate: `deleteWhere(F)`
  * must retract exactly the rows Spark's own `df.filter(F)` selects, for
  * random data (nulls, NaN, signed zero, cross-type fractional literals)
  * under random predicate trees. This is the strongest statement of the
  * 3VL contract: DELETE removes the definitively-TRUE rows and keeps
  * FALSE and NULL — where "TRUE" is decided by the SAME semantics the
  * engine's SELECT uses (NaN greatest and equal to itself, -0.0 = 0.0,
  * decimal-exact integer-vs-fractional compares), because SQL DELETE now
  * hands us predicates from Spark's own DML rewrite. */
class DeleteParitySpec extends SparkTestBase {

  private def fmt = classOf[ManifestFileSink].getName

  /** A predicate in both vocabularies: the DSv2 Filter the sink
    * evaluates, and the Column Spark evaluates. */
  private case class P(f: Filter, c: Column)

  private val words = Seq("alpha", "beta", "gamma", "alphabet", "", "Zed")

  private def atom(rng: scala.util.Random): P = rng.nextInt(10) match {
    case 0 =>
      val lit0 = rng.nextInt(15).toLong - 5L
      P(EqualTo("n", lit0), col("n") === lit0)
    case 1 =>
      // Fractional double literal against the LONG column — the
      // truncation trap (n < 2.5 must see 2.5 between 2 and 3).
      val d = rng.nextInt(20) / 2.0 - 4.5
      if (rng.nextBoolean()) P(LessThan("n", d), col("n") < d)
      else P(GreaterThanOrEqual("n", d), col("n") >= d)
    case 2 =>
      val d = Seq(rng.nextDouble() * 4 - 2, 0.0, -0.0, Double.NaN)(rng.nextInt(4))
      rng.nextInt(3) match {
        case 0 => P(EqualTo("v", d), col("v") === d)
        case 1 => P(GreaterThan("v", d), col("v") > d)
        case 2 => P(LessThanOrEqual("v", d), col("v") <= d)
      }
    case 3 =>
      val vs = Array.fill(3)(rng.nextInt(15).toLong - 5L)
      P(In("n", vs.map(_.asInstanceOf[Any])), col("n").isin(vs: _*))
    case 4 =>
      val s = words(rng.nextInt(words.length))
      P(EqualTo("s", s), col("s") === s)
    case 5 =>
      val p = Seq("al", "b", "Z", "x")(rng.nextInt(4))
      P(StringStartsWith("s", p), col("s").startsWith(p))
    case 6 =>
      val p = Seq("a", "et", "mm")(rng.nextInt(3))
      P(StringContains("s", p), col("s").contains(p))
    case 7 => P(IsNull("v"), col("v").isNull)
    case 8 => P(IsNotNull("s"), col("s").isNotNull)
    case 9 =>
      val d = Seq(1.0, Double.NaN, -0.0)(rng.nextInt(3))
      P(EqualNullSafe("v", d), col("v") <=> d)
  }

  private def gen(rng: scala.util.Random, depth: Int): P =
    if (depth == 0 || rng.nextInt(3) == 0) atom(rng)
    else rng.nextInt(3) match {
      case 0 => val (a, b) = (gen(rng, depth - 1), gen(rng, depth - 1))
        P(And(a.f, b.f), a.c && b.c)
      case 1 => val (a, b) = (gen(rng, depth - 1), gen(rng, depth - 1))
        P(Or(a.f, b.f), a.c || b.c)
      case 2 => val a = gen(rng, depth - 1); P(Not(a.f), !a.c)
    }

  private def randomData(rng: scala.util.Random): DataFrame = {
    import spark.implicits._
    (0 until 40).map { i =>
      val n: java.lang.Long =
        if (rng.nextInt(7) == 0) null else java.lang.Long.valueOf(rng.nextInt(15).toLong - 5L)
      val v: java.lang.Double =
        rng.nextInt(10) match {
          case 0 => null
          case 1 => java.lang.Double.valueOf(Double.NaN)
          case 2 => java.lang.Double.valueOf(-0.0)
          case 3 => java.lang.Double.valueOf(0.0)
          case _ => java.lang.Double.valueOf(rng.nextDouble() * 4 - 2)
        }
      val s: String = if (rng.nextInt(6) == 0) null else words(rng.nextInt(words.length))
      (i.toLong, n, v, s)
    }.toDF("id", "n", "v", "s")
  }

  test("deleteWhere retracts exactly what Spark's filter selects: 30 random trials") {
    for (trial <- 0 until 30) {
      val rng = new scala.util.Random(0xDE1E7E + trial * 104729)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-par$trial").toString
      val df = randomData(rng)
      df.coalesce(2).write.format(fmt).option("path", dir).mode("append").save()
      val p = gen(rng, 3)
      val toDelete = df.filter(p.c).select("id").collect().map(_.getLong(0)).toSet
      val n = ManifestFileSink.deleteWhere(dir, p.f)
      assert(n === toDelete.size.toLong,
        s"trial $trial: deleteWhere($p) removed $n rows, Spark filter selects ${toDelete.size}")
      val kept = spark.read.format(fmt).option("path", dir).load()
        .select("id").collect().map(_.getLong(0)).toSet
      assert(kept === (0L until 40L).toSet -- toDelete,
        s"trial $trial: kept set diverges for ${p.f}")
    }
  }
}
