package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.expressions.{Kll, KllBuf}

/** Streaming per-group quantile monitoring — the unbounded-stream form
  * of [[graft.expressions.KllQuantileAgg]], sharing the SAME sketch
  * kernel ([[graft.expressions.Kll]]) so stream and batch cannot
  * drift: a stream absorbed in any micro-batch slicing carries the
  * same hard errBound invariant as one batch aggregate over the same
  * rows (the bound is order-independent by construction, and the spec
  * pins it empirically).
  *
  * State per group is one serialized sketch — O(k·log(n/k)) doubles,
  * corpus-size-independent — updated by insert-per-row and emitted as
  * a versioned estimate row each micro-batch (Append mode; consumers
  * take the max-version row per group, the HeavyHittersStream
  * contract). This is the shape of a p99-latency monitor that never
  * re-reads history: the alternative (windowed percentile over raw
  * retained events) holds every event in state.
  */
object KllStream {

  final case class Obs(g: Int, v: Double)
  final case class GroupQuantiles(g: Int, version: Long, n: Long,
                                  err_bound: Long, est: Seq[Double])

  def kllStream(in: Dataset[Obs], k: Int, qs: Seq[Double]): DataFrame = {
    require(k >= 8 && k % 2 == 0, s"kll needs even k >= 8, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    import in.sparkSession.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[Array[Byte], GroupQuantiles](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: Int, it: Iterator[Obs], state) =>
          val buf = state.getOption.map(Kll.deserialize)
            .getOrElse(new KllBuf())
          val nBefore = buf.n
          it.foreach { o => if (!o.v.isNaN) Kll.insert(buf, k, o.v) }
          // emit only when the sketch absorbed something: version is
          // buf.n, so a batch whose rows were all NaN-filtered would
          // otherwise re-emit a DUPLICATE (g, version) row and break
          // max-version consumers (ADVICE r8). n strictly increases
          // per accepted value, so (g, version) is unique in the sink.
          if (buf.n == nBefore) Iterator.empty
          else {
            state.update(Kll.serialize(buf))
            Iterator.single(GroupQuantiles(g, buf.n, buf.n, buf.errBound,
              Kll.estimates(buf, qs).toSeq))
          }
      }
      .toDF()
  }
}
