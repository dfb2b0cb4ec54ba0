package graft.scale

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the corpus-governance suite (values are pinned by the
  * DuckDB oracles; these pin the properties the oracle can't express). */
class CorpusOpsSpec extends SparkSpec {

  test("symspell blocking is lossless vs brute-force levenshtein <= 2") {
    // ground truth: quadratic self-join over the (tiny) spec-SF vocab
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(array_distinct(Dedup.tokens(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(length(col("tok")).between(4, 20))
      .select(col("tok")).as("a")
    val brute = vocab.crossJoin(vocab.withColumnRenamed("tok", "tok2"))
      .filter(col("tok") < col("tok2") &&
        levenshtein(col("tok"), col("tok2")) <= 2)
      .select(col("tok").as("tok_a"), col("tok2").as("tok_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val blocked = CorpusOps.vocabSymspell(spark, sfDir)
      .select(col("tok_a"), col("tok_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "spec fixture should contain near pairs")
  }

  test("winsorize: clamped rows flagged, all outputs inside the band") {
    val out = CorpusOps.featWinsorize(spark, sfDir)
    assert(out.filter(col("value_winsorized") < col("p05") ||
      col("value_winsorized") > col("p95")).count() === 0)
    assert(out.filter(!col("clamped") &&
      col("value") =!= col("value_winsorized")).count() === 0)
    assert(out.filter(col("clamped")).count() > 0)
  }

  test("temperature weights: shares sum to 1, alpha<1 flattens the mixture") {
    val rows = CorpusOps.sampleTemperature(spark, sfDir).collect()
    val nat = rows.map(_.getAs[Double]("natural_share")).sum
    val sca = rows.map(_.getAs[Double]("scaled_share")).sum
    assert(math.abs(nat - 1.0) < 1e-4 && math.abs(sca - 1.0) < 1e-4)
    // temperature scaling boosts below-average domains, shrinks the top
    val top = rows.maxBy(_.getAs[Double]("natural_share"))
    val bottom = rows.minBy(_.getAs[Double]("natural_share"))
    assert(top.getAs[Double]("weight") <= 1.0 + 1e-9)
    assert(bottom.getAs[Double]("weight") >= 1.0 - 1e-9)
  }

  test("diverse sample: members partition the corpus, reps are members") {
    val buckets = CorpusOps.sampleDiverse(spark, sfDir)
    val total = Tables.embeddings(spark, sfDir).count()
    val summed = buckets.agg(sum(col("n_members"))).head().getLong(0)
    assert(summed === total)
    assert(buckets.filter(col("n_removed") =!= col("n_members") - 1).count() === 0)
  }

  test("novelty: fractions in [0,1], earliest doc fully novel") {
    val out = CorpusOps.ngramNovelty(spark, sfDir).cache()
    assert(out.filter(col("novelty_frac") < 0 || col("novelty_frac") > 1).count() === 0)
    val minDoc = out.agg(min(col("doc_id"))).head().getLong(0)
    val first = out.filter(col("doc_id") === minDoc).head()
    assert(first.getAs[Long]("n_novel") === first.getAs[Long]("n_shingles"))
  }

  test("curriculum two-phase rank equals a direct global row_number") {
    val out = CorpusOps.curriculumOrder(spark, sfDir).cache()
    val n = out.count()
    // ranks are a permutation of 1..n
    assert(out.select(col("rank")).distinct().count() === n)
    assert(out.agg(min(col("rank")), max(col("rank"))).head() ===
      org.apache.spark.sql.Row(1L, n))
    // two-phase (bucket offset + within-bucket row_number) == global sort
    val direct = out.withColumn("direct_rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
    assert(direct.filter(col("rank") =!= col("direct_rank")).count() === 0)
    // chunks are full except the tail
    assert(out.groupBy(col("chunk_id")).count()
      .filter(col("count") > 64).count() === 0)
  }

  test("sequence packing: every doc placed once, budget kept, offsets contiguous, next-fit tight") {
    import org.apache.spark.sql.expressions.Window
    val out = CorpusOps.packNextFit(spark, sfDir).cache()
    try {
      assert(out.count() === Tables.documents(spark, sfDir)
          .filter(TextAnalysis.wsTokenCount > 0).count(),
        "every non-empty doc placed exactly once (zero-token docs have " +
          "no loader placement and are dropped before packing)")
      // no sequence exceeds the token budget
      val fills = out.groupBy(col("lang"), col("source"), col("seq_no"))
        .agg(sum(col("n_tokens")).as("fill"))
      assert(fills.filter(col("fill") > CorpusOps.PackBudget).isEmpty)
      // offsets are the exact running fill in doc_id order
      val w = Window.partitionBy(col("lang"), col("source"), col("seq_no"))
        .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
      assert(out.withColumn("expected", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .filter(col("tok_offset") =!= col("expected")).isEmpty)
      // next-fit tightness: a doc opening sequence s > 0 must not have
      // fit at the end of sequence s − 1
      val prev = fills.select(col("lang"), col("source"),
        (col("seq_no") + 1).as("seq_no"), col("fill").as("prev_fill"))
      val loose = out.filter(col("tok_offset") === 0 && col("seq_no") > 0)
        .join(prev, Seq("lang", "source", "seq_no"))
        .filter(col("prev_fill") + col("n_tokens") <= CorpusOps.PackBudget)
      assert(loose.isEmpty, "doc started a new sequence it didn't need")
    } finally out.unpersist()
  }

  test("sequence packing drops zero-token docs even at an exactly-full boundary") {
    import spark.implicits._
    // doc 2 fills sequence 0 to exactly PackBudget (2048 = 2x1024);
    // the zero-token doc 3 used to land AT tok_offset 2048 inside it
    // (the fold only rolls when fill + n EXCEEDS the budget) — it must
    // instead be absent from the placement index entirely
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-pack0").toString)
    val tok1024 = (1 to 1024).map(i => s"t$i").mkString(" ")
    Seq(
      (1L, tok1024, "en", "web", 1L),
      (2L, tok1024, "en", "web", 1L),
      (3L, "", "en", "web", 0L),
      (4L, "tail doc", "en", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.packNextFit(spark, tmp)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 4L))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(2L).getAs[Long]("seq_no") === 0L)
    assert(byId(2L).getAs[Long]("tok_offset") === 1024L)
    // the doc after the exactly-full sequence opens the next one at 0
    assert(byId(4L).getAs[Long]("seq_no") === 1L)
    assert(byId(4L).getAs[Long]("tok_offset") === 0L)
  }

  test("k-anonymity census: suppression bounded by class counts") {
    val out = CorpusOps.kAnonymity(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val frac = r.getAs[Double]("suppressed_frac")
      assert(frac >= 0 && frac <= 1)
      assert(r.getAs[Long]("rows_suppressed") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_small_classes") <= r.getAs[Long]("n_classes"))
      if (r.getAs[Boolean]("k_anonymous"))
        assert(r.getAs[Long]("rows_suppressed") === 0L)
    }
  }
}
