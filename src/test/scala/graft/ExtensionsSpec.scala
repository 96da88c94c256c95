package graft

/** The SQL surface of the native expressions — registered via
  * GraftExtensions (the SparkSessionExtensions route for new sessions,
  * `register` for existing ones, both driving the same function list). */
class ExtensionsSpec extends SparkSpec {

  override def withFixture(test: NoArgTest) = {
    GraftExtensions.register(spark)
    super.withFixture(test)
  }

  test("graft_dot computes an exact dot product from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    r shouldBe 32.0
  }

  test("graft_shingles / graft_minhash / graft_simhash compose in SQL") {
    val row = spark.sql(
      """SELECT graft_shingles(split('a b c d', ' '), 3) AS sh,
        |       graft_minhash(graft_shingles(split('a b c d', ' '), 3), 4) AS mh,
        |       graft_simhash(split('a b c d', ' ')) AS fp""".stripMargin)
      .collect().head
    row.getSeq[String](0) shouldBe Seq("a b c", "b c d")
    row.getSeq[Long](1).length shouldBe 4
    row.getSeq[Long](1).foreach(v => v should (be >= 0L and be < 2147483647L))
    row.getString(2) should fullyMatch regex "[01]{64}"
  }

  test("graft_hamming counts differing bit positions") {
    spark.sql("SELECT graft_hamming('1100', '1010') AS h")
      .collect().head.getInt(0) shouldBe 2
  }

  test("graft_winnow selects windowed-min k-gram fingerprints from SQL") {
    // 3 tokens → one 3-gram → exactly its md5; agrees with the operator
    val one = spark.sql(
      "SELECT graft_winnow(split('alpha beta gamma', ' '), 3, 4) AS fps")
      .collect().head.getSeq[String](0)
    one shouldBe Seq(java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    // non-literal k rejected at analysis, like the other param'd kernels
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_winnow(split('a b c', ' '), CAST(id AS INT), 4) FROM range(1)")
        .collect()
    }
    ex.getMessage should include ("integer literal")
  }

  test("NULL literals are accepted and yield NULL, like built-ins") {
    val row = spark.sql(
      """SELECT graft_hamming(NULL, '1010') AS h,
        |       graft_simhash(NULL) AS fp,
        |       graft_dot(NULL, array(1.0d)) AS d""".stripMargin)
      .collect().head
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
    row.isNullAt(2) shouldBe true
  }

  test("SQL graft_simhash agrees with the DataFrame-side operator") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT graft_simhash(split(text, ' ')) AS fp FROM ext_docs")
      .collect().head.getString(0)
    val viaDf = df.select(graft.functions.Exprs.simhash64(
      org.apache.spark.sql.functions.split($"text", " ")).as("fp"))
      .collect().head.getString(0)
    viaSql shouldBe viaDf
  }

  test("driver contract: every declared query has an oracle and every oracle has a query") {
    // The driver grades oracle_sql.json's keys; a query registered
    // without an oracle would silently skip correctness grading, and
    // an orphaned oracle would FAIL the run on a missing parquet dump.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    withClue(s"queries-without-oracle: ${(q -- o).toSeq.sorted.mkString(",")}; " +
      s"oracles-without-query: ${(o -- q).toSeq.sorted.mkString(",")}: ") {
      q shouldBe o
    }
    // and the flagship smoke query returns rows (the driver's check)
    SparkEntry.entry(spark).count() should be > 0L
  }
}
