package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark

class GraftFunctionsSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("runtime-registered SQL functions agree with the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "The cat and the dog sat.", Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))
      .toDF("id", "text", "a", "b")
      .createOrReplaceTempView("gfs_t")
    val row = spark.sql("""
      SELECT graft_token_count(text) AS tc,
             graft_bpeish_count(text) AS bc,
             graft_langid(text) AS lang,
             graft_cosine(a, b) AS cos,
             graft_simhash(text, 3) AS sh,
             graft_fingerprint(text) AS fp,
             graft_lsn_format(id * 4294967296 + 255) AS lsn,
             graft_lsn_parse(graft_lsn_format(id * 4294967296 + 255)) AS lsn_v,
             graft_word_ngrams(text, 3) AS ng,
             graft_jaccard(text, text, 3) AS jac
      FROM gfs_t""").collect()(0)
    val expected = spark.table("gfs_t").select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.bpeishTokenCount(col("text")),
      TextAnalysis.langId(col("text")),
      VectorMath.cosine(col("a"), col("b")),
      Sketches.simhash64(col("text"), 3),
      Fingerprint.fingerprint64(col("text")),
      graft.cdc.Lsn.formatCol(col("id") * 4294967296L + 255),
      lit(1L * 4294967296L + 255),
      TextAnalysis.wordNgrams(col("text"), 3),
      lit(1.0)).collect()(0) // jaccard(text, text) = 1
    row shouldBe expected
    row.getString(2) shouldBe "en"
  }

  test("extension-injected session exposes the same functions") {
    // The fixture context was created with
    // spark.sql.extensions=graft.functions.GraftExtensions (a STATIC conf,
    // appliable only at context creation — the user-facing injection
    // path). newSession() builds a FRESH SessionState whose function
    // registry is populated purely from those captured extensions, so this
    // resolves graft_* with no register() call anywhere and fails if the
    // GraftExtensions wiring breaks.
    val s2 = spark.newSession()
    import s2.implicits._
    Seq(("hello world foo")).toDF("text").createOrReplaceTempView("gfs_e")
    s2.sql("SELECT graft_token_count(text) AS n FROM gfs_e")
      .collect()(0).getInt(0) shouldBe 3
  }

  test("builder appends to, never replaces, caller-supplied extensions") {
    import graft.GraftSession.mergedExtensions
    mergedExtensions(None) shouldBe "graft.functions.GraftExtensions"
    mergedExtensions(Some("their.Ext")) shouldBe
      "their.Ext,graft.functions.GraftExtensions"
    // already present (any position, whitespace-tolerant) → unchanged
    mergedExtensions(Some("a.B, graft.functions.GraftExtensions ,c.D")) shouldBe
      "a.B, graft.functions.GraftExtensions ,c.D"
    mergedExtensions(Some("  ")) shouldBe "graft.functions.GraftExtensions"
  }

  test("arity and literal-argument misuse fail loudly") {
    GraftFunctions.register(spark)
    Seq(("x")).toDF("text").createOrReplaceTempView("gfs_b")
    an[Exception] should be thrownBy
      spark.sql("SELECT graft_cosine(text) FROM gfs_b").collect()
    an[Exception] should be thrownBy // non-literal k
      spark.sql("SELECT graft_simhash(text, length(text)) FROM gfs_b").collect()
  }
}
