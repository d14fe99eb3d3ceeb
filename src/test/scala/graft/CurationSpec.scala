package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

/** §2.P verification: chunk coverage/overlap invariants, int8
  * quantization error bounds, TF-IDF ranking sanity, SCD-2 interval
  * chaining. The cross-engine value parity of each registered query is
  * the driver's DuckDB gate; these tests pin the SEMANTIC properties the
  * hash compare can't express. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 32
  private val S = 24

  private def docs = Seq(
    (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens → 4 chunks
    (2L, (1 to 32).map(i => s"w$i").mkString(" ")),  // exactly one window
    (3L, "a"),                                       // shorter than stride
    (4L, (1 to 40).map(i => s"w$i").mkString(" "))   // tail inside overlap
  ).toDF("doc_id", "text")

  test("bloom decontamination: no false negatives, bounded FP drop, deterministic") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val evalDocs = corpus.filter(col("doc_id") % 97 === 0)
    val kept = Curation.decontaminateBloom(corpus, "text",
      evalDocs, "text", expectedN = 1L << 16, fpp = 0.01)
    // 1. the one-sided guarantee that makes Bloom admissible here: a
    //    true eval member can NEVER survive (no false negatives) —
    //    exact, not a tolerance
    val evalShas = evalDocs
      .select(sha2(col("text"), 256).as("s")).distinct()
    val leaked = kept.join(evalShas, col("text_sha") === col("s")).count()
    assert(leaked == 0L,
      s"$leaked eval documents survived bloom decontamination")
    // 2. the false-positive cost is bounded: docs dropped BEYOND the
    //    exact anti-join ≤ 3×fpp of the corpus (3× headroom over the
    //    expected rate; deterministic for fixed seeds/fixture)
    val exactKept =
      Curation.decontaminate(corpus, "text", evalDocs, "text").count()
    val bloomKept = kept.count()
    assert(bloomKept <= exactKept,
      "bloom kept MORE than the exact anti-join — impossible without " +
        "false negatives")
    val slack = 3 * 0.01 * corpus.count()
    assert(exactKept - bloomKept <= slack,
      s"FP drops ${exactKept - bloomKept} exceed slack $slack")
    // 3. determinism: rebuild reproduces the same kept set size
    val again = Curation.decontaminateBloom(corpus, "text",
      evalDocs, "text", expectedN = 1L << 16, fpp = 0.01).count()
    assert(again == bloomKept, "bloom build is not deterministic")
    // 4. null text KEEPS the row — the anti-join's null-never-matches
    //    semantics, and the probe must not NPE on a null sha
    val withNull = Seq((1L, "hello"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val keptNull = Curation.decontaminateBloom(withNull, "text",
      evalDocs, "text", expectedN = 1L << 16, fpp = 0.01)
    assert(keptNull.filter(col("doc_id") === 2L).count() == 1L,
      "null-text row must survive bloom decontamination")
  }

  test("ngram decontamination matches a brute-force set intersection") {
    val docs = Tables.load(spark, sf0001, "documents")
    def gramsOf(text: String, n: Int): Set[String] =
      Option(text).map(_.toLowerCase.split(" ", -1).toSeq)
        .filter(_.size >= n)
        .map(w => w.sliding(n).map(_.mkString(" ")).toSet)
        .getOrElse(Set.empty)
    val texts = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val evalGrams = texts.collect {
      case (id, t) if id % 97 == 0 => gramsOf(t, 3)
    }.fold(Set.empty)(_ ++ _)
    assert(evalGrams.nonEmpty, "vacuous fixture: eval slice has no grams")
    val expected = texts.collect { case (id, t) if id % 97 != 0 =>
      val g = gramsOf(t, 3)
      id -> ((g.size.toLong, g.count(evalGrams).toLong))
    }
    val got = Curation.decontaminateNgrams(
        docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", n = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected.toMap)
    // the gate must discriminate on this fixture: some docs flagged,
    // some clean — all-hit or no-hit proves nothing about the join
    val hits = got.values.count(_._2 > 0)
    assert(hits > 0 && hits < got.size,
      s"non-discriminating fixture: $hits/${got.size} flagged")
  }

  test("chunks cover every token and start on the stride grid") {
    val rows = Curation.chunkTokens(docs, "doc_id", "text", W, S)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val nTokens = Map(1L -> 100, 2L -> 32, 3L -> 1, 4L -> 40)
    for ((doc, n) <- nTokens) {
      val chunks = byDoc(doc)
      // chunk_idx is dense from 0; start = idx·stride; the last covered
      // index is start + n_tokens which must reach n exactly
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong),
        s"doc $doc: non-dense chunk_idx")
      val covered = chunks.map { case (_, idx, len, _) => idx * S + len }.max
      assert(covered == n, s"doc $doc: covered $covered of $n tokens")
      // every non-final chunk is a full window
      chunks.dropRight(1).foreach { case (_, idx, len, _) =>
        assert(len == W, s"doc $doc chunk $idx: $len tokens, want $W")
      }
      // no tail chunk that adds nothing: a start inside the final
      // `overlap` tokens would be fully contained in the previous window
      val lastStart = chunks.last._2 * S
      assert(lastStart == 0 || lastStart < n - (W - S),
        s"doc $doc: redundant tail start $lastStart for n=$n")
    }
    // 100 tokens → starts 0,24,48,72 (96 ≥ 100−8 excluded)
    assert(byDoc(1L).size == 4)
    // 32 tokens → exactly one full window (start 24 ≥ 32−8 is redundant)
    assert(byDoc(2L).size == 1)
    // 40 tokens → 0 and 24 (the 24-start window adds tokens 33..40)
    assert(byDoc(4L).size == 2 && byDoc(4L).last._3 == 16L)
  }

  test("property: chunk invariants hold for every doc length 1..130") {
    // one doc per length; tokens are position-numbered so slices are
    // checkable by value, not just by count
    val docs = (1 to 130).map(n =>
      (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Curation.chunkTokens(docs, "doc_id", "text", W, S)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    val byDoc = rows.groupBy(_._1)
    (1 to 130).foreach { n =>
      val chunks = byDoc(n.toLong).sortBy(_._2)
      // dense indices from 0
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
      // full coverage: the final chunk reaches token n exactly
      assert(chunks.map(c => c._2 * S + c._3).max == n, s"n=$n")
      // every non-final chunk is a full window; the final one is 1..W
      chunks.dropRight(1).foreach(c => assert(c._3 == W, s"n=$n"))
      assert(chunks.last._3 >= 1 && chunks.last._3 <= W)
      // no redundant tail: a start inside the last `overlap` tokens
      // would add no token the previous window lacks
      val lastStart = chunks.last._2 * S
      assert(lastStart == 0 || lastStart < n - (W - S), s"n=$n")
      // chunk count is the closed form of the grid rule
      val expected = math.max(1,
        math.ceil((n - (W - S)).toDouble / S).toInt)
      assert(chunks.size == expected, s"n=$n: ${chunks.size} != $expected")
    }
  }

  test("quantization reconstructs within half a step, codes within int8") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Curation.quantizeInt8(emb, "vec_id", "embedding")
    val joined = emb.join(q, "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("codes"), col("scale_r"))
      .as[(Long, Seq[Double], Seq[Int], Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, v, codes, scaleR) =>
      assert(v.size == codes.size)
      // recover the unrounded scale from the data (scale_r is rounded)
      val maxAbs = v.map(math.abs).max max 1e-30
      val scale = 127.0 / maxAbs
      assert(math.abs(scale - scaleR) <= 5e-5 * (1 + scale))
      codes.foreach(c => assert(c >= -127 && c <= 127,
        s"vec $id: code $c outside int8 range"))
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c / scale) <= 0.5 / scale + 1e-12,
          s"vec $id: reconstruction error above half a quantization step")
      }
    }
  }

  test("quantize/adc codegen kernels match the higher-order formulations") {
    import org.apache.spark.sql.graftfns.QuantFunctions
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // the interpreted HOF reference the expression replaced — kept here
    // as the executable spec of the kernel's arithmetic
    val maxAbs = array_max(transform(col("v"), x => abs(x)))
    val hof = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        (lit(127.0) / greatest(maxAbs, lit(1e-30))).as("scale"))
      .select(col("vec_id"),
        transform(col("v"),
          x => floor(x * col("scale") + lit(0.5)).cast("int")).as("codes"),
        col("scale"))
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    val expr = emb.select(col("vec_id"),
        QuantFunctions.quantize_int8(
          col("embedding").cast("array<double>")).as("q"))
      .select(col("vec_id"), col("q.codes"), col("q.scale"))
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(expr.toSeq == hof.toSeq,
      "codegen kernel diverges from the HOF reference")
    // ADC: reference-object lut vs literal-array fold, same sums
    val lut = Array(Array(0.5, -1.0), Array(2.0, 4.0))
    val codes = Seq((Seq(0, 1), 4.5), (Seq(1, 0), 1.0)).toDF("codes", "want")
    val got = codes.select(
        QuantFunctions.adc_score(col("codes"), lut).as("s"), col("want"))
      .as[(Double, Double)].collect()
    got.foreach { case (s, want) => assert(s == want) }
    // loud null on a corrupt code, not a truncated sum
    val bad = Seq(Seq(0, 7)).toDF("codes")
      .select(QuantFunctions.adc_score(col("codes"), lut).as("s"))
      .head()
    assert(bad.isNullAt(0), "out-of-range code must score NULL")
    // token_hashes ≡ transform(tokens, xxhash64) bit-for-bit — the
    // contract that lets the MinHash/SimHash pipelines swap kernels
    // without moving a single candidate pair
    val toks = Seq("the quick brown fox", "a", "").toDF("text")
      .select(split(col("text"), " ").as("w"))
    val viaHof = toks.select(transform(col("w"), x => xxhash64(x)).as("h"))
      .as[Seq[Long]].collect().toSeq
    val viaExpr = toks.select(QuantFunctions.token_hashes(col("w")).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(viaExpr == viaHof, "token_hashes diverges from xxhash64")
  }

  test("tfidf ranks are dense, scores non-increasing, tf exact") {
    val d = Seq(
      (1L, "apple apple apple banana common"),
      (2L, "banana banana cherry common"),
      (3L, "cherry date common")).toDF("doc_id", "text")
    val rows = Curation.tfidfTopK(d, "doc_id", "text", 3)
      .orderBy("doc_id", "rn")
      .as[(Long, Long, String, Long, Double)].collect()
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (doc, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.size).toSeq)
      val scores = rs.sortBy(_._2).map(_._5)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc: scores increase along rank")
    }
    // doc 1: apple tf=3, df=1, n_docs=3 → score 9; beats banana (1·3/2)
    // and common (1·3/3)
    val top1 = rows.filter(r => r._1 == 1L && r._2 == 1L).head
    assert(top1._3 == "apple" && top1._4 == 3L && top1._5 == 9.0)
    // rarity ranks doc 3's equal-tf terms: date (df=1, score 3) >
    // cherry (df=2, 1.5) > common (df=3, 1 — idf can't lift a term
    // present everywhere)
    val doc3 = rows.filter(_._1 == 3L).sortBy(_._2)
    assert(doc3.map(_._3).toSeq == Seq("date", "cherry", "common"))
  }

  test("scd2 intervals chain per key with exactly one open row") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_id", "event_type", "ts")
    val rows = Curation.scd2(ev, "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"),
        col("valid_from").cast("long").as("from_us"),
        col("valid_to").cast("long").as("to_us"),
        col("is_current"))
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
    assert(rows.length == ev.count())
    rows.groupBy(_._1).foreach { case (user, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2))
      // exactly one open (current) interval, and it is the last one
      assert(ordered.count(_._5) == 1, s"user $user: open-row count != 1")
      assert(ordered.last._5 && ordered.last._4.isEmpty)
      // each closed interval's end is exactly the next interval's start
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3),
          s"user $user: interval chain broken at event ${a._2}")
        assert(!a._5)
      }
    }
  }

  test("token_bigrams codegen kernel equals the shingles(·,2) HOF path") {
    import graft.ops.TextSim
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
        org.apache.spark.sql.graftfns.QuantFunctions
          .token_bigrams(TextSim.tokens(col("text"))).as("fast"),
        TextSim.shingles(col("text"), 2).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    assert(both.nonEmpty)
    both.foreach { case (fast, hof) => assert(fast == hof) }
    // edge cases the corpus may not cover: empty, 1-token, 2-token
    val edge = Seq("", "one", "a b", "x y z").toDF("text")
    val got = edge.select(org.apache.spark.sql.graftfns.QuantFunctions
        .token_bigrams(TextSim.tokens(col("text"))))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(), Seq(), Seq("a b"), Seq("x y", "y z")))
  }

  test("token_ngrams codegen kernel equals the shingles(·,n) HOF path") {
    import graft.ops.TextSim
    import org.apache.spark.sql.graftfns.QuantFunctions.token_ngrams
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    Seq(1, 3, 5, 7).foreach { n =>
      val both = docs.select(
          token_ngrams(TextSim.tokens(col("text")), n).as("fast"),
          TextSim.shingles(col("text"), n).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      assert(both.nonEmpty)
      both.foreach { case (fast, hof) =>
        assert(fast == hof, s"n=$n: $fast != $hof")
      }
    }
    // edge cases: shorter-than-n arrays yield empty, exact-n yields one
    val edge = Seq("", "one", "a b", "w x y z").toDF("text")
    val got = edge.select(token_ngrams(TextSim.tokens(col("text")), 3))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(), Seq(), Seq(), Seq("w x y", "x y z")))
    // the SQL registration resolves and agrees with the column API
    val viaSql = spark.sql(
      "SELECT token_ngrams(split('p q r s', ' '), 3)")
      .as[Seq[String]].head()
    assert(viaSql == Seq("p q r", "q r s"))
  }

  test("q_vec_centroid equals the exact per-cluster mean, long format") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val dim = vecs.head._2.length
    // exact replica of the query's arithmetic: per-element decimal-12
    // rounding (the cast), exact sums, one double division
    val expected = vecs.groupBy(_._1 % 8).flatMap { case (cl, g) =>
      (0 until dim).map { pos =>
        val sx = g.map(v => BigDecimal(v._2(pos))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        val mean = BigDecimal(sx.toDouble / g.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cl, pos.toLong, g.length.toLong, mean)
      }
    }.toSet
    val got = SparkEntry.queries("q_vec_centroid")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 8 * dim, s"expected ${8 * dim} long-format rows")
    val mismatches = got.toSet.diff(expected)
    assert(mismatches.isEmpty,
      s"${mismatches.size} cells diverge, e.g. ${mismatches.take(3)}")
  }
  test("deflate ratio separates repetition from prose and stays in band") {
    val repeated = ("lorem ipsum dolor sit amet " * 60).trim
    val varied = (1 to 60).map(i =>
      java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString)
      .mkString(" ")
    val df = Seq((1L, repeated), (2L, varied), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val got = Curation.deflateStats(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byId = got.map(t => t._1 -> t).toMap
    // verbatim repetition compresses an order of magnitude better
    val rRep = byId(1L)._3.toDouble / byId(1L)._2
    val rVar = byId(2L)._3.toDouble / byId(2L)._2
    assert(rRep < 0.1, s"repeated text ratio $rRep")
    assert(rVar > 0.3, s"varied text ratio $rVar")
    assert(rRep < rVar / 3, s"no separation: $rRep vs $rVar")
    // null/empty rows survive the kernel (deflate of 0 bytes is a
    // small constant header, n_bytes 0)
    assert(byId(3L)._2 == 0L && byId(4L)._2 == 0L)
    // determinism within a JVM: same bytes, same lengths
    val again = Curation.deflateStats(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == again.toSeq)
    // the registered query over the fixture: ratios in the honest band
    val q = graft.queries.TextQueries.textCompressRatioRaw(spark,
        "/root/testdata/sf0.001")
      .select("ratio").as[Double].collect()
    assert(q.length == 500)
    assert(q.forall(r => r > 0.2 && r < 1.3),
      s"ratio out of band: ${q.filter(r => r <= 0.2 || r >= 1.3).take(3).mkString(",")}")
  }
}

