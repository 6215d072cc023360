package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.expressions.{Kll, KllBuf}

/** Streaming split-conformal quality gate — the online form of the
  * batch `quality_conformal_gate`: calibration rewards maintain a
  * threshold (the q-th smallest calibration score, guaranteeing
  * ~(1−q) of exchangeable future docs clear it), and test rewards are
  * audited against the CURRENT threshold, all in bounded state.
  *
  * Where the batch gate finds the exact integer-rank order statistic
  * (a global sort-limit), a stream cannot hold the calibration set —
  * the threshold here is the [[Kll]] sketch's rank-q estimate, whose
  * EXACT worst-case rank error (`errBound`, 2^h per compaction) is
  * carried in the emitted row, so a consumer knows the coverage
  * promise is (1−q) ± errBound/n_calib — the same sketch-for-exact
  * trade as `sketch_quantile_kll` vs `group_quantiles_exact`,
  * spec-pinned against the batch order statistic.
  *
  * State per group: one KLL sketch (O(k·log(n/k)) doubles) + three
  * counters. Semantics: within a micro-batch, calibration rows are
  * absorbed FIRST, then test rows gate against the refreshed
  * threshold — the deployment reading (ship today's gate, audit
  * today's traffic), documented rather than hidden.
  *
  * Cold start (ADVICE r9): before ANY calibration row has arrived
  * (n_calib = 0) there is no threshold to gate against — test rows in
  * that window are NOT audited (n_test/n_pass don't move, threshold
  * emits as -Infinity). Counting them as passes would permanently
  * bake an ungated prefix into the coverage counters; a consumer can
  * see the window via n_calib = 0 rows.
  */
object ConformalGateStream {

  /** One observation: side 0 = calibration, 1 = test; reward is the
    * round-6 quality score (the batch gate's contract).
    */
  final case class GateObs(g: String, side: Int, reward: Double)

  /** Audit row; `version` = total observations absorbed (monotone).
    * `err_rank` is the sketch's exact worst-case rank error at this
    * state — the coverage bar is q ± err_rank/n_calib.
    */
  final case class GateRow(g: String, version: Long, n_calib: Long,
                           threshold: Double, err_rank: Long,
                           n_test: Long, n_pass: Long)

  final case class GateState(sketch: Array[Byte], nTest: Long,
                             nPass: Long, seen: Long)

  def conformalGateStream(in: Dataset[GateObs], k: Int, q: Double)
      : DataFrame = {
    require(k >= 8 && k % 2 == 0, s"kll needs even k >= 8, got $k")
    require(q > 0 && q < 1, s"q must be in (0, 1): $q")
    import in.sparkSession.implicits._
    in.filter(o => !o.reward.isNaN)
      .groupByKey(_.g)
      .flatMapGroupsWithState[GateState, GateRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[GateObs], state) =>
          val st = state.getOption
            .getOrElse(GateState(Kll.serialize(new KllBuf()), 0L, 0L, 0L))
          val buf = Kll.deserialize(st.sketch)
          var nTest = st.nTest
          var nPass = st.nPass
          var seen = st.seen
          // calibration first: the gate tests against the freshest
          // threshold this batch can know
          val rows = it.toSeq
          rows.foreach { o =>
            seen += 1
            if (o.side == 0) Kll.insert(buf, k, o.reward)
          }
          val thr = if (buf.n == 0) Double.NegativeInfinity
                    else Kll.estimates(buf, Seq(q))(0)
          // no calibration yet → no gate to audit against: skip the
          // counters rather than recording an all-pass prefix
          if (buf.n > 0) rows.foreach { o =>
            if (o.side != 0) {
              nTest += 1
              if (o.reward >= thr) nPass += 1
            }
          }
          state.update(GateState(Kll.serialize(buf), nTest, nPass, seen))
          Iterator.single(GateRow(g, seen, buf.n, thr, buf.errBound,
            nTest, nPass))
      }.toDF()
  }
}
