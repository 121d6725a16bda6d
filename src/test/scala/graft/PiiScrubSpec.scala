package graft

import org.apache.spark.sql.functions._

import graft.functions.PiiScrub

/** PII redaction: placeholders, cascade order, and counts (planted
  * data — the driver corpus contains no digits or @ at all, so the
  * cross-engine oracle would be a no-op there; the behavior is
  * spec-verified here instead). */
class PiiScrubSpec extends SparkSpec {

  test("scrub redacts emails, IPv4s and phones with correct counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+spam@ex-corp.co.uk or call +1 (555) 123-4567 now"),
      (2L, "server 192.168.001.100 replied; backup at 10.0.0.1"),
      (3L, "order 12 items from aisle 7"), // short numbers survive
      (4L, "mixed: a@b.io then 8005551234 then 172.16.0.9"),
      (5L, ""),
      (6L, "revenue grew 2020 - 2024 by 1500 units")) // spaced numerics survive
      .toDF("doc_id", "text")
    val out = docs.select(
        col("doc_id") +: PiiScrub.scrub(col("text")).as("clean") +:
          PiiScrub.counts(col("text")): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1) == (("contact [EMAIL] or call [PHONE] now", 1, 0, 1)), out(1))
    assert(out(2) == (("server [IP] replied; backup at [IP]", 0, 2, 0)), out(2))
    assert(out(3) == (("order 12 items from aisle 7", 0, 0, 0)), out(3))
    assert(out(4) == (("mixed: [EMAIL] then [PHONE] then [IP]", 1, 1, 1)), out(4))
    assert(out(5) == (("", 0, 0, 0)), out(5))
    assert(out(6) == (("revenue grew 2020 - 2024 by 1500 units", 0, 0, 0)), out(6))
  }
}
