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

  test("dotDecimal/cosine are exact on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      GF.dotDecimal(col("a"), col("b")).cast("double").as("dot"),
      GF.cosine(col("a"), col("a")).as("self")).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 1.0)
  }
}
