package graft

import graft.ops.HoursParser
import org.apache.spark.sql.functions._

/** Golden vectors from the reference's executable docstring spec
  * (`database/parse_and_upload_to_db.py:58-81`; corpus FIXTURES.md §3)
  * plus seeded randomized properties (SURVEY.md §5.2), batched into one
  * Spark job each. */
class HoursParserSpec extends SparkSpecBase {
  import spark.implicits._

  private def parse(s: String): (Seq[Long], Seq[Long]) = {
    val row = Seq(s).toDF("hours_str")
      .select(HoursParser.opens(col("hours_str")).as("o"),
        HoursParser.closes(col("hours_str")).as("c"))
      .head()
    (row.getSeq[Long](0), row.getSeq[Long](1))
  }

  test("golden corpus from the reference docstring") {
    assert(parse("11:00 AM - 3:00 PM") == (Seq(39600L), Seq(54000L)))
    assert(parse("11:00 AM - 3:00 PM4:30 PM - 10:00 PM") ==
      (Seq(39600L, 59400L), Seq(54000L, 79200L)))
    assert(parse("Closed") == (Seq(), Seq()))
    assert(parse("Open 24 hours") == (Seq(0L), Seq(86399L)))
    assert(parse("4:00 PM - 12:00 AM (Next day)") == (Seq(57600L), Seq(0L)))
    assert(parse("12:00 PM - 12:00 AM") == (Seq(43200L), Seq(0L)))
    assert(parse("11 AM - 3 PM") == (Seq(39600L), Seq(54000L)))
  }

  test("garbage is flagged unparseable, valid strings are not") {
    val flags = Seq("gibberish", "11:00 AM - 3:00 PM", "Closed", "3:00 PM",
      "11:99 AM - 3:00 PM", // minute out of range — strptime would raise
      "19:00 AM - 9:00 PM", // hour 19 impossible on a 12-hour clock
      "0:30 AM - 1:00 PM", //  hour 0 likewise
      "1:5 PM - 2:00 PM", //   single-digit minute: must not re-tokenize
      "11:00 AM - 3:00 PM4:30 PM - 10:00 PM", // glued ranges are valid
      "4:00 PM - 12:00 AM (Next day)", "11 AM - 3 PM")
      .toDF("s").select(HoursParser.isParseable(col("s"))).as[Boolean]
      .collect()
    assert(flags.toSeq ==
      Seq(false, true, true, false, false, false, false, false,
        true, true, true))
  }

  private def fmt12(sec: Long): String = {
    val h24 = (sec / 3600).toInt; val m = ((sec % 3600) / 60).toInt
    val h12 = if (h24 % 12 == 0) 12 else h24 % 12
    f"$h12%d:$m%02d ${if (h24 < 12) "AM" else "PM"}"
  }

  test("property: format → parse round-trips (200 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(3)
      val secs = Seq.fill(2 * n)(
        rnd.nextInt(24) * 3600L + rnd.nextInt(60) * 60L)
      val str = secs.map(fmt12).grouped(2)
        .map(p => s"${p.head} - ${p(1)}").mkString
      (i, str, secs)
    }
    val got = cases.map { case (i, str, _) => (i, str) }.toDF("i", "s")
      .select(col("i"), HoursParser.opens(col("s")).as("o"),
        HoursParser.closes(col("s")).as("c"))
      .orderBy("i")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    cases.zip(got).foreach { case ((i, str, secs), (gi, o, c)) =>
      assert(i == gi)
      val expected = secs.grouped(2).map(p => (p.head, p(1))).toSeq
      assert(o.zip(c) == expected, s"case $i: '$str'")
    }
  }

  test("property: overnight membership matches naive circle membership") {
    val rnd = new scala.util.Random(7)
    val cases = (0 until 500).map { i =>
      (i, rnd.nextInt(86400).toLong, rnd.nextInt(86400).toLong,
        rnd.nextInt(86400).toLong)
    } ++ Seq((500, 100L, 100L, 100L), (501, 0L, 86399L, 86399L),
      (502, 50000L, 10000L, 10000L), (503, 50000L, 10000L, 9999L))
    val got = cases.toDF("i", "o", "c", "p")
      .select(col("i"), HoursParser.isOpenAt(col("o"), col("c"), col("p"))
        .as("open"))
      .orderBy("i").as[(Int, Boolean)].collect()
    cases.zip(got).foreach { case ((i, o, c, p), (gi, isOpen)) =>
      assert(i == gi)
      val expected =
        if (o == c) false
        else if (c > o) p >= o && p < c
        else p >= o || p < c
      assert(isOpen == expected, s"case $i: open=$o close=$c probe=$p")
    }
  }

  test("minutesUntilClose rolls over midnight like the reference") {
    // app.py:219-224: close 01:00 with now=12:00 → tomorrow, 13 h away
    val df = Seq((3600L, 43200L), (50400L, 43200L), (43200L, 43200L))
      .toDF("close", "now")
      .select(HoursParser.minutesUntilClose(col("close"), col("now"))
        .cast("long"))
    assert(df.as[Long].collect().toSeq == Seq(780L, 120L, 0L))
  }
}
