package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.checks.SpanInvariant
import graft.model.{Doc, Span}
import graft.rules.RuleCompiler

/** Property-based tests (which the reference lacks — FIXTURES.md):
  * invariants that must hold for ALL documents, checked over generated
  * corpora with ScalaCheck.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genSpan: Gen[Span] = for {
    kind <- Gen.oneOf("text", "image", "audio")
    text <- Gen.option(Gen.alphaNumStr.map(_.take(12)))
    ref <- Gen.option(Gen.choose(0, 60).map(i => s"m$i"))
    off <- Gen.choose(0, 7)
  } yield Span(kind, text.orNull, ref.orNull, off)

  private val genDoc: Gen[Doc] = for {
    id <- Gen.identifier.map(_.take(10))
    n <- Gen.choose(1, 8)
    spans <- Gen.listOfN(n, genSpan)
  } yield Doc(id, spans, "p")

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"$name: $res")
  }

  test("a doc equal to its reference spans never violates the invariant") {
    check("self-invariant", Prop.forAll(Gen.listOfN(5, genDoc)) { docs =>
      val distinct = docs.groupBy(_.doc_id).map(_._2.head).toSeq
      if (distinct.isEmpty) true
      else {
        val df = spark.createDataFrame(distinct)
        val bad = SpanInvariant.verdicts(df, df).filter(!col("valid"))
        bad.count() == 0L
      }
    })
  }

  test("any single-field span corruption is detected by the invariant") {
    val corrupt = Gen.choose(0, 3)
    check("corruption-detected",
      Prop.forAll(genDoc, corrupt) { (doc, field) =>
        val s = doc.spans.head
        val mutated = field match {
          case 0 => s.copy(kind = s.kind + "X")
          case 1 => s.copy(text = Option(s.text).getOrElse("") + "X")
          case 2 => s.copy(media_ref = Option(s.media_ref).getOrElse("") + "X")
          case _ => s.copy(offset = s.offset + 100)
        }
        val ref = spark.createDataFrame(Seq(doc))
        val docs = spark.createDataFrame(
          Seq(doc.copy(spans = mutated +: doc.spans.tail)))
        SpanInvariant.verdicts(docs, ref).filter(!col("valid")).count() == 1L
      })
  }

  test("rule violations are monotone: adding spans never removes one") {
    check("monotone", Prop.forAll(genDoc, genSpan) { (doc, extra) =>
      val df1 = spark.createDataFrame(Seq(doc))
      val df2 = spark.createDataFrame(
        Seq(doc.copy(spans = doc.spans :+ extra)))
      def viols(df: org.apache.spark.sql.DataFrame): Long =
        df.select(explode(RuleCompiler.violations(col("spans"),
          RuleCompiler.docRules))).count()
      viols(df2) >= viols(df1)
    })
  }
}
