package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{GraftFunctions => GF, PolyHash}

class FunctionsSpec extends SparkTestBase {

  private def refHash(s: String): Long = {
    var acc = 0L
    s.codePoints().forEach(cp => acc = (acc * 31 + cp) % 1000000007L)
    acc
  }

  test("PolyHash matches the reference fold (property)") {
    val prop = Prop.forAll(Gen.asciiPrintableStr) { s =>
      PolyHash.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s)) == refHash(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("variant: malformed JSON → NULL via try_parse_json; typed variant_get extraction") {
    import spark.implicits._
    val rows = Seq("""{"k": 7}""", """{"k": "s"}""", "not json").toDF("j")
      .selectExpr("try_parse_json(j) AS v")
      .selectExpr("try_variant_get(v, '$.k', 'bigint') AS k")
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq
    // well-formed int extracts; type-mismatched and malformed both NULL
    // (the q85 drop-malformed policy), never an error
    assert(rows == Seq(Some(7L), None, None))
  }

  test("q88 backbone matches Spark's built-in corr/regr_slope/regr_intercept") {
    // The oracle-gated q88 computes slope/intercept/corr from exact decimal
    // moments (order-insensitive); the built-ins are one-pass and
    // order-dependent in the last ulps. Pin agreement to 1e-9 so the
    // backbone can't drift from the semantics it claims to implement.
    val backbone = SparkEntry.queries("q88_stats_aggregates")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val builtin = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("regr_slope(l_discount, l_quantity)").as("slope"),
        expr("regr_intercept(l_discount, l_quantity)").as("intercept"),
        expr("corr(l_quantity, l_discount)").as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(backbone.keySet == builtin.keySet)
    for ((k, (s1, i1, c1)) <- backbone; (s2, i2, c2) = builtin(k)) {
      assert(math.abs(s1 - s2) < 1e-9, s"$k slope $s1 vs $s2")
      assert(math.abs(i1 - i2) < 1e-9, s"$k intercept $i1 vs $i2")
      assert(math.abs(c1 - c2) < 1e-9, s"$k corr $c1 vs $c2")
    }
  }

  test("poly_hash evaluates in a plan (codegen path) and handles null") {
    import spark.implicits._
    val df = Seq(Some("hello world"), Some(""), None).toDF("s")
      .select(GF.poly_hash(col("s")).as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == refHash("hello world"))
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0))
  }

  test("poly_hash stays inside whole-stage codegen") {
    // range() (not a local relation) so constant folding can't erase the plan
    val df = spark.range(10)
      .select(GF.poly_hash(concat(lit("doc"), col("id"))).as("h"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [poly_hash"), s"plan lacked codegen:\n$plan")
    assert(df.agg(count(col("h"))).head().getLong(0) == 10)
  }

  test("native DotDecimal matches the lambda-fold reference on fixture vectors") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
    val mismatches = emb.select(
      GF.dotDecimal(col("e"), col("e")).as("native"),
      GF.dotDecimalFold(col("e"), col("e")).as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(mismatches == 0)
  }

  test("DotDecimal yields null (not NPE) for mismatched lengths under codegen") {
    val s0 = spark
    import s0.implicits._
    // RDD-backed so the projection actually codegens (LocalRelation would fold)
    val df = s0.createDataset(s0.sparkContext.parallelize(
      Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0)), (Array(1.0, 2.0), Array(3.0, 4.0))), 1))
      .toDF("a", "b")
    val rows = df.select(GF.dotDecimal(col("a"), col("b")).cast("double").as("d"))
      .collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.exists(r => !r.isNullAt(0) && r.getDouble(0) == 11.0))
  }

  test("DotPositive agrees with dotDecimal > 0, including near-orthogonal pairs (property)") {
    import graft.functions.{DotDecimal, DotPositive}
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Seq[Double]) = ArrayData.toArrayData(xs.toArray)
    val genVec = Gen.listOfN(8, Gen.choose(-1.0, 1.0))
    val prop = Prop.forAll(genVec, genVec) { (a, b) =>
      val exact = Option(DotDecimal.dot(arr(a), arr(b))).map(_.toBigDecimal.signum > 0)
      val fast = Option(DotPositive.positive(arr(a), arr(b))).map(_.booleanValue)
      exact == fast
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
    // adversarial: dots within the ambiguity band around zero must take the
    // exact fallback and still agree (incl. an exactly-zero decimal dot)
    for (tiny <- Seq(0.0, 1e-15, -1e-15, 5e-13, -5e-13, 1e-12, -1e-12)) {
      val a = arr(Seq(1.0, 1.0)); val b = arr(Seq(tiny, 0.0))
      val exact = DotDecimal.dot(a, b).toBigDecimal.signum > 0
      assert(DotPositive.positive(a, b).booleanValue == exact, s"tiny=$tiny")
    }
  }

  test("NearestSeeds fast path matches the exact argmax, including ties (property)") {
    import graft.functions.{DotDecimal, NearestSeeds}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    def arr(xs: Seq[Double]) = ArrayData.toArrayData(xs.toArray)
    def seedRow(id: Long, v: Seq[Double]): InternalRow = {
      val dec = DotDecimal.dot(arr(v), arr(v))
      InternalRow(id, arr(v), math.sqrt(dec.toDouble))
    }
    // exact reference: decimal scores ranked DESC with first-wins ties
    def ref(seeds: Seq[(Long, Seq[Double])], emb: Seq[Double]): Seq[Long] = {
      val e = arr(emb)
      val n = math.sqrt(DotDecimal.dot(e, e).toDouble)
      val scored = seeds.flatMap { case (id, v) =>
        Option(DotDecimal.dot(e, arr(v))).map { d =>
          val sv = arr(v)
          (id, d.toDouble / (n * math.sqrt(DotDecimal.dot(sv, sv).toDouble)))
        }
      }
      // stable sort: score DESC (NaN first, like SQL DESC), then input order
      val ranked = scored.zipWithIndex.sortBy { case ((_, s), ix) =>
        (if (s.isNaN) Double.NegativeInfinity else -s, ix)
      }.map(_._1._1)
      (ranked ++ Seq(-1L, -1L)).take(2)
    }
    val genVec = Gen.listOfN(6, Gen.choose(-1.0, 1.0))
    val prop = Prop.forAll(Gen.listOfN(5, genVec), genVec) { (seedVecs, emb) =>
      val seeds = seedVecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val sarr = new GenericArrayData(seeds.map { case (id, v) => seedRow(id, v) }.toArray)
      val e = arr(emb)
      val norm = math.sqrt(DotDecimal.dot(e, e).toDouble)
      val got = NearestSeeds.twoBest(sarr, e, norm)
      got.toLongArray().toSeq == ref(seeds, emb)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
    // adversarial: duplicate seed vectors force an exact tie — the fast
    // path cannot certify and must fall back, keeping the LOWEST seed id
    val tied = Seq(0L -> Seq(0.5, 0.5), 1L -> Seq(0.5, 0.5), 2L -> Seq(-0.5, 0.5))
    val sarr = new GenericArrayData(tied.map { case (id, v) => seedRow(id, v) }.toArray)
    val e = arr(Seq(1.0, 0.9))
    val norm = math.sqrt(DotDecimal.dot(e, e).toDouble)
    assert(NearestSeeds.twoBest(sarr, e, norm).toLongArray().toSeq == Seq(0L, 1L))
    // zero-norm embedding ⇒ NaN scores ⇒ exact path owns the ordering
    val z = arr(Seq(0.0, 0.0))
    assert(NearestSeeds.twoBest(sarr, z, 0.0).toLongArray().toSeq == Seq(0L, 1L))
  }

  test("NormalizeAlnum matches trim(regexp_replace(lower(s), '[^a-z0-9]+', ' ')) (property)") {
    import graft.functions.NormalizeAlnum
    import org.apache.spark.unsafe.types.UTF8String
    def ref(s: String): String =
      UTF8String.fromString(s).toLowerCase.toString.replaceAll("[^a-z0-9]+", " ").trim
    val gen = Gen.oneOf(Gen.asciiPrintableStr, Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const('\n'), Gen.const('É'),
      Gen.const('ß'), Gen.const('中'))).map(_.mkString))
    val prop = Prop.forAll(gen) { s =>
      NormalizeAlnum.normalize(UTF8String.fromString(s)).toString == ref(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    assert(NormalizeAlnum.normalize(UTF8String.fromString("  Héllo,  WORLD-42! ")).toString
      == ref("  Héllo,  WORLD-42! "))
  }

  test("dotDecimal/cosine are exact on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      GF.dotDecimal(col("a"), col("b")).cast("double").as("dot"),
      GF.cosine(col("a"), col("a")).as("self")).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("SimHashSig aggregate equals the 32-column vote formulation") {
    // parity pin for p04's imperative aggregate: identical vote math as the
    // sum(when(affineHash > half)) column form it replaced, group by group
    import spark.implicits._
    val bits = 32
    val p = PolyHash.Mod
    val half = p / 2
    val as = (0 until bits).map(j => ((j + 1) * 73939L + 3) % p).toArray
    val bs = (0 until bits).map(j => ((j + 1) * 104729L + 17) % p).toArray
    val rows = (1 to 500).map(i => (i % 17L, (i * 2654435761L) % p))
    val df = rows.toDF("g", "h")
    val viaAgg = df.groupBy(col("g"))
      .agg(graft.functions.SimHashSig.simhash_sig(col("h"), as, bs, p, half).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val voteCols = (0 until bits).map(j =>
      sum(when(GF.affineHash(col("h"), as(j), bs(j)) > half, 1).otherwise(-1)).as(s"w$j"))
    val viaCols = df.groupBy(col("g")).agg(voteCols.head, voteCols.tail: _*)
      .select(col("g"),
        (0 until bits).map(j => when(col(s"w$j") > 0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaCols)
  }

  test("simhashSigPacked equals the SimHashSig udaf group by group") {
    // optimization r16: p04's registry entry switched from the typed udaf
    // to the lane-packed codegen'd sum formulation — pin bit-equality of
    // the two on a keyed hash table wide enough to exercise every lane,
    // tie cases included (even group sizes can yield w_j = 0)
    import spark.implicits._
    val bits = 32
    val p = PolyHash.Mod
    val half = p / 2
    val as = (0 until bits).map(j => ((j + 1) * 73939L + 3) % p).toArray
    val bs = (0 until bits).map(j => ((j + 1) * 104729L + 17) % p).toArray
    val rows = (1 to 700).map(i => (i % 23L, (i * 1103515245L + 12345L) % p))
    val df = rows.toDF("doc_id", "h")
    val viaUdaf = df.groupBy(col("doc_id"))
      .agg(graft.functions.SimHashSig.simhash_sig(col("h"), as, bs, p, half).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPacked = QueriesPipeline.simhashSigPacked(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPacked == viaUdaf)
  }
}
