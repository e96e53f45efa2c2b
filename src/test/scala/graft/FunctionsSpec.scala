package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.SimHash.simhash64
import graft.functions.VectorFunctions.{cosFxF, cosineF, dotF, l2normF}
import graft.operators.ImporterPipeline.dimensionNames

/** Custom-expression kernels + ScalaCheck-generated laws for the scalar
  * functions the reference tests pointwise. (The scalatest-scalacheck
  * bridge is not in the offline cache, so generators are sampled with a
  * fixed seed instead of via `forAll`.)
  */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("dotF/l2normF match reference arithmetic (double accumulation)") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(4.0f, -5.0f, 6.0f)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        dotF(col("a"), col("b")).as("dot"),
        l2normF(col("a")).as("na"),
        cosineF(col("a"), col("b")).as("cos"))
      .as[(Double, Double, Double)].head()
    val expDot = 1.0 * 4 + 2.0 * -5 + 3.0 * 6
    val expNa = math.sqrt(1.0 + 4 + 9)
    val expNb = math.sqrt(16.0 + 25 + 36)
    assert(row._1 === expDot)
    assert(row._2 === expNa)
    assert(math.abs(row._3 - expDot / (expNa * expNb)) < 1e-12)
  }

  test("cosineF of a vector with itself is 1; zero vector yields 0") {
    val v = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val z = Array.fill(64)(0.0f)
    val got = Seq((v, v, z)).toDF("a", "b", "z")
      .select(cosineF(col("a"), col("b")), cosineF(col("a"), col("z")))
      .as[(Double, Double)].head()
    assert(math.abs(got._1 - 1.0) < 1e-12)
    assert(got._2 === 0.0)
  }

  test("fixed-point scale parity: operator layer and codegen kernels agree") {
    // PqAnn.FxScale is an alias of FloatVecUtil.FxScaleLong; this pins the
    // tie so a future re-definition (the silent engine-vs-oracle desync
    // class) fails here instead of in a hash mismatch three rounds later
    assert(graft.operators.PqAnn.FxScale ===
      graft.functions.FloatVecUtil.FxScaleLong)
  }

  test("fxCosine fails loudly on dimension mismatch") {
    val e = intercept[Exception] {
      Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
        .select(cosFxF(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("simhash64: equal token lists hash equal; near lists land near") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 40).map(i => s"other$i")
    val df = Seq(
      ("a", base), ("b", base), ("c", near), ("d", far))
      .toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("h"))
    val m = df.as[(String, Long)].collect().toMap
    assert(m("a") === m("b"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("c")) <= 16)
    assert(ham(m("a"), m("d")) > 16)
  }

  test("simhash64 stays inside whole-stage codegen") {
    // a LocalTableScan never codegens — use a range-backed plan
    val exec = spark.range(10)
      .select(simhash64(split(concat(lit("a b c "), col("id")), " ")))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty, s"expected WholeStageCodegenExec in:\n$exec")
  }

  test("property: P9 name extraction inverts id construction") {
    val alnum = for {
      n <- Gen.chooseNum(1, 12)
      cs <- Gen.listOfN(n, Gen.alphaNumChar)
    } yield cs.mkString
    val pairs = samples(Gen.zip(alnum, alnum), 60).distinct
    assert(pairs.size > 30)
    val df = pairs.map { case (inst, name) => (inst, s"${inst}_$name") }
      .toDF("instance_id", "dimension_id")
    val got = dimensionNames(df).as[(String, String)].collect().toMap
    pairs.foreach { case (inst, name) =>
      assert(got(s"${inst}_$name") === name, s"inst=$inst name=$name")
    }
  }

  test("property: P9 matches Go strings.Replace(s, old, '', 2) on adversarial 3+-occurrence ids") {
    // JVM port of Go's strings.Replace(s, old, "", n=2): remove up to two
    // occurrences left-to-right, resuming the scan AT each seam (never
    // revisiting earlier text) — reference model/models.go:47-52.
    def goReplace2(s: String, old: String): String = {
      val out = new StringBuilder
      var rest = s
      var n = 2
      while (n > 0) {
        val j = rest.indexOf(old)
        if (j < 0) n = 0
        else { out.append(rest.substring(0, j)); rest = rest.substring(j + old.length); n -= 1 }
      }
      out.append(rest).toString
    }
    val inst = Gen.oneOf("a", "ab", "i7")
    // dimension ids assembled from underscores, the instance infix, and
    // alnum junk — 0..5 infix occurrences, including seam-creating shapes
    val dimGen = for {
      id <- inst
      parts <- Gen.listOfN(6, Gen.oneOf(
        Gen.const(s"_${id}_"), Gen.const(s"${id}_"), Gen.const(s"_$id"),
        Gen.const("_"), Gen.const(""), Gen.alphaNumStr.map(_.take(3))))
    } yield (id, parts.mkString)
    val cases = samples(dimGen, 200).distinct ++ Seq(
      ("a", "_a_a_"),     // seam creates an occurrence BEFORE the scan point
      ("a", "a__a__a_"),  // three occurrences: the cap must leave the third
      ("a", "_a__a__a__a_"))
    val df = cases.toDF("instance_id", "dimension_id")
    val got = df.select(col("instance_id"), col("dimension_id"),
        graft.operators.ImporterPipeline.nameCol.as("name"))
      .as[(String, String, String)].collect()
    assert(got.length === cases.size)
    got.foreach { case (id, dim, name) =>
      val want = goReplace2("_" + dim, s"_${id}_")
      assert(name === want, s"inst=$id dim=$dim: got $name want $want")
    }
    // the cap is observable: "_a__a__a_" has three occurrences of "_a_";
    // the capped strip leaves the third ("_a_") where all-replace gives ""
    val capped = got.find { case (id, dim, _) => (id, dim) == (("a", "a__a__a_")) }.get._3
    assert(capped === "_a_", s"cap not observed: $capped")
    assert("_a__a__a_".replace("_a_", "") === "", "adversarial case lost its power")
  }

  test("property: GopherFracs equals the Spark-built-in formulation on random spacey text") {
    // random strings over a tiny alphabet with frequent spaces: exercises
    // empty tokens (leading/trailing/double spaces), heavy repetition
    // (2-char alphabet → many duplicate n-grams) and short docs
    val textGen = for {
      n <- Gen.chooseNum(1, 60)
      cs <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const(' '), 2 -> Gen.const('a'),
        2 -> Gen.const('b'), 1 -> Gen.const('c')))
    } yield cs.mkString
    val texts = samples(textGen, 150).distinct.filter(_.split(" ", -1).length >= 2)
    assert(texts.size > 50)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fast = graft.operators.TextAnalysis.gopherSignals(df)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val ref = graft.operators.TextAnalysis.gopherSignalsExploded(df)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fast.keySet === ref.keySet)
    fast.keys.foreach(k => assert(fast(k) === ref(k), s"text=${texts(k.toInt)}"))
  }

  test("property: shard rules match a pure-JVM md5 reference on arbitrary doc ids") {
    import graft.operators.TrainingPrep
    val ids = samples(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), 60).distinct
    val df = ids.toDF("doc_id")
      .withColumn("text", lit("a b c"))
      // the engine-side expressions, evaluated outside any corpus context
    val skey = md5(concat(col("doc_id").cast("string"), lit("|t26")))
    val got = df.select(
        col("doc_id"),
        skey.as("skey"),
        (instr(lit("0123456789abcdef"), substring(skey, 1, 1)) - 1).cast("int").as("shard"))
      .as[(Long, String, Int)].collect()
    got.foreach { case (id, hex, shard) =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|t26".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(hex === ref, s"md5 mismatch for $id")
      assert(shard === Integer.parseInt(ref.substring(0, 1), 16),
        s"stable shard rule diverged for $id")
      assert(shard >= 0 && shard < 16)
    }
  }

  test("property: ADC lookup-sum kernel equals the higher-order-function formulation") {
    import graft.functions.VectorFunctions.adcSumF
    val m = 8; val ks = 16
    val dtGen = Gen.listOfN(m, Gen.listOfN(ks, Gen.chooseNum(0L, 1L << 40)))
    val codesGen = Gen.listOfN(m, Gen.chooseNum(0, ks - 1))
    val cases = samples(Gen.zip(dtGen, codesGen), 30)
    val df = cases.toDF("dt", "codes")
      .select(
        adcSumF(col("dt"), col("codes")).as("kernel"),
        expr("aggregate(zip_with(dt, codes, (t, c) -> element_at(t, c + 1)), 0L, (a, x) -> a + x)")
          .as("hof"))
      .as[(Long, Long)].collect()
    df.foreach { case (k, h) => assert(k === h) }
    assert(df.nonEmpty)
  }

  test("ADC kernel fails loud on an out-of-range code (never a silent read)") {
    import graft.functions.VectorFunctions.adcSumF
    // UnsafeArrayData reads are unchecked, so a code >= Ks (codebook /
    // corpus mismatch) must throw, not return adjacent-memory garbage
    val dt = Seq(Seq(Seq(1L, 2L), Seq(3L, 4L)))
    def run(codes: Seq[Int]) =
      dt.map(d => (d, codes)).toDF("dt", "codes")
        .select(adcSumF(col("dt"), col("codes")).as("s")).as[Long].head()
    assert(run(Seq(1, 0)) === 2L + 3L)
    // surfaces as IllegalArgumentException when folded driver-side, wrapped
    // in SparkException from an executor — either way the message survives
    def loudly(codes: Seq[Int]): String =
      intercept[Exception](run(codes)).getMessage
    assert(loudly(Seq(0, 2)).contains("out of [0, 2)"))
    assert(loudly(Seq(-1, 0)).contains("out of [0, 2)"))
  }

  test("property: dot product is symmetric and matches scala fold") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_.toFloat / 10f))
    val cases = samples(Gen.zip(vecGen, vecGen), 25)
    val df = cases.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      .select(dotF(col("a"), col("b")), dotF(col("b"), col("a")),
        col("a"), col("b"))
      .as[(Double, Double, Array[Float], Array[Float])].collect()
    df.foreach { case (ab, ba, a, b) =>
      assert(ab === ba)
      val exp = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(ab - exp) < 1e-9)
    }
  }
}
