package graft

import org.apache.spark.sql.functions._

/** Discounted episode returns: horizon bound, and an independent
  * driver-side recomputation (plain Scala sessionization + exact
  * scaled-integer discounting) for a sample of users — the
  * oracle-independent proof the window algebra (running-max session
  * start, step index, γᵏ scaling) is right.
  */
class EpisodeReturnsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 12
  private val gapUs = 1800L * 1000000L

  test("n_steps respects the horizon and sessions are 1-based") {
    val out = SparkEntry.queries("events_episode_returns")(spark, sfDir)
      .select("n_steps", "session_seq").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (n, s) => n >= 1 && n <= H + 1 && s >= 1 })
  }

  test("returns match a plain-Scala recomputation for sampled users") {
    val sample = Tables.load(spark, sfDir, "events")
      .where(col("user_id") % 37 === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    val expected = sample.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // sessionize, then exact scaled-integer discounting with γ=0.1
      var seq = 0L
      var prev = Long.MinValue
      var k = 0
      val acc = scala.collection.mutable.Map.empty[Long, (Long, BigInt)]
      ordered.foreach { case (_, us, _, v) =>
        if (prev == Long.MinValue || us - prev > gapUs) { seq += 1; k = 0 }
        else k += 1
        if (k <= H) {
          val v6 = BigInt(math.round(
            BigDecimal(v).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6))
          val term = v6 * BigInt(10).pow(H - k)
          val (n, s) = acc.getOrElse(seq, (0L, BigInt(0)))
          acc(seq) = (n + 1, s + term)
        }
        prev = us
      }
      acc.map { case (s, (n, sum)) =>
        (uid, s, n, BigDecimal(math.round(
          sum.toDouble / math.pow(10.0, 6 + H) * 1e6), 6).toDouble)
      }
    }.toSet
    val got = SparkEntry.queries("events_episode_returns")(spark, sfDir)
      .where(col("user_id") % 37 === 0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"diff: ${(got diff expected).take(3)} vs ${(expected diff got).take(3)}")
  }
}
