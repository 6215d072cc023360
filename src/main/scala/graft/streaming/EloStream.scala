package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Elo ratings — the sequential, online complement to the
  * batch Bradley–Terry fit ([[graft.ops.Reward.btStrengths]]): an
  * unbounded stream of pairwise outcomes (human preference votes,
  * A/B duels between model versions, judge-panel matchups) folds into
  * per-player ratings as it arrives.
  *
  * Elo is ORDER-DEPENDENT by definition (later matches move ratings
  * less as opponents' ratings settle), so the operator makes the fold
  * order explicit: matches carry a monotone `seq`, each micro-batch
  * folds its matches in seq order, and the result is therefore
  * independent of HOW the stream was sliced into micro-batches — the
  * same total order folds either way (the slicing-invariance the spec
  * pins). A match touches TWO players, so state cannot be per-player
  * keyed; the stream is keyed by `league` (tournament, eval track,
  * model family) and state is that league's rating table —
  * O(players) doubles per league, corpus-size-independent, the same
  * bounded-state class as the other streams (a league with millions
  * of players wants the batch BT fit instead; Elo leagues are
  * player-bounded by construction).
  *
  * Emission mirrors KllStream: after an absorbing micro-batch, one
  * row per TOUCHED player (league, player, version, rating, games),
  * version = league match count which strictly increases, so
  * (league, player, version) is unique in the Append sink and
  * max-version consumers are safe.
  */
object EloStream {

  /** One pairwise outcome: `sa` is A's score — 1 win, 0.5 draw, 0
    * loss. `seq` defines the fold order (must be unique per league).
    */
  final case class Match(league: String, seq: Long, a: String, b: String,
                         sa: Double)
  final case class Rating(league: String, player: String, version: Long,
                          rating: Double, games: Long)
  final case class LeagueState(nMatches: Long, players: Seq[String],
                               ratings: Seq[Double], games: Seq[Long])

  val InitialRating = 1000.0
  val KFactor = 32.0

  /** Expected score of a rated `ra` player against `rb`. */
  def expected(ra: Double, rb: Double): Double =
    1.0 / (1.0 + math.pow(10.0, (rb - ra) / 400.0))

  /** Reference fold used by both the stream and the spec: applies
    * matches IN THE GIVEN ORDER to (rating, games) maps.
    */
  def fold(matches: Seq[Match],
           init: Map[String, (Double, Long)] = Map.empty)
      : Map[String, (Double, Long)] = {
    val m = scala.collection.mutable.Map(init.toSeq: _*)
    matches.foreach { mt =>
      require(mt.sa == 0.0 || mt.sa == 0.5 || mt.sa == 1.0,
        s"score must be 0, 0.5 or 1: ${mt.sa}")
      val (ra, ga) = m.getOrElse(mt.a, (InitialRating, 0L))
      val (rb, gb) = m.getOrElse(mt.b, (InitialRating, 0L))
      val ea = expected(ra, rb)
      m(mt.a) = (ra + KFactor * (mt.sa - ea), ga + 1)
      m(mt.b) = (rb + KFactor * ((1.0 - mt.sa) - (1.0 - ea)), gb + 1)
    }
    m.toMap
  }

  def eloStream(in: Dataset[Match]): DataFrame = {
    import in.sparkSession.implicits._
    in.groupByKey(_.league)
      .flatMapGroupsWithState[LeagueState, Rating](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (league: String, it: Iterator[Match], state) =>
          val st = state.getOption.getOrElse(LeagueState(0L, Nil, Nil, Nil))
          val cur = st.players.indices
            .map(i => st.players(i) -> (st.ratings(i), st.games(i))).toMap
          // seq order makes the fold micro-batch-slicing-invariant
          val batch = it.toSeq.sortBy(_.seq)
          if (batch.isEmpty) Iterator.empty
          else {
            val next = fold(batch, cur)
            val n = st.nMatches + batch.size
            val players = next.keys.toSeq.sorted
            state.update(LeagueState(n, players,
              players.map(p => next(p)._1), players.map(p => next(p)._2)))
            val touched = batch.flatMap(m => Seq(m.a, m.b)).distinct.sorted
            touched.iterator.map { p =>
              val (r, g) = next(p)
              Rating(league, p, n, r, g)
            }
          }
      }
      .toDF()
  }
}
