package graft.etl

import java.time.{Instant, ZoneOffset}

/**
 * Batch-coordinate counters for the incremental extract driver — the
 * resumable-watermark contract (reference: mysql_to_s3/counter.py:20-87;
 * behavior fixed by tests/test_counters.py:22-199 which replays from every
 * cut point and requires identical coordinates).
 *
 * A counter chain maps each strictly-increasing key tuple (time, id, …) to
 * a coordinate vector: DurationCounter buckets a time axis, BatchCounter
 * groups N child advances, Counter numbers rows. `reset(coords)` restores
 * the exact mid-stream state so a restart reproduces the tail.
 */
sealed trait BatchCounterLike {
  /** value: the remaining dims of the key tuple. Returns this level's
    * coordinate prefix. */
  def next(value: Seq[Any]): Seq[Long]
  def reset(start: Option[Seq[Long]]): Unit
}

/** Plain row counter (reference counter.py:20-33). */
final class RowCounter(start: Long) extends BatchCounterLike {
  private var count = start
  def next(value: Seq[Any]): Seq[Long] = { val o = count; count += 1; Seq(o) }
  def reset(start: Option[Seq[Long]]): Unit =
    count = start.map(_.head).getOrElse(0L)
}

/** Emits the same batch index until the child has produced `size` values,
  * then advances and resets the child (reference counter.py:36-55). */
final class BatchCounter(start: Long, size: Long, child: BatchCounterLike) extends BatchCounterLike {
  private var nextOutput = start
  def next(value: Seq[Any]): Seq[Long] = {
    val out = nextOutput
    val c = child.next(value.drop(1))
    if (c.head >= size - 1) { nextOutput += 1; child.reset(None) }
    out +: c
  }
  def reset(start: Option[Seq[Long]]): Unit = start match {
    case Some(s) => nextOutput = s.head; child.reset(Some(s.drop(1)))
    case None    => nextOutput = 0; child.reset(None)
  }
}

/** Buckets a strictly-increasing time axis into `duration` intervals from
  * `start`; child resets on each new bucket (reference counter.py:58-87). */
final class DurationCounter(startAt: Instant, duration: DurationUnit, child: BatchCounterLike) extends BatchCounterLike {
  private val start = duration.floor(startAt)
  private var lastValue = start
  private var batch = 0L

  def next(value: Seq[Any]): Seq[Long] = {
    val v = DurationCounter.toInstant(value.head)
    if (duration.floor(lastValue).isAfter(v))
      throw new IllegalArgumentException("Expecting strictly increasing")
    lastValue = v
    val key = duration.between(start, duration.floor(v))
    if (key != batch) { child.reset(None); batch = key }
    batch +: child.next(value.drop(1))
  }

  def reset(start: Option[Seq[Long]]): Unit = start match {
    case Some(s) => batch = s.head; child.reset(Some(s.drop(1)))
    case None    => batch = 0L; child.reset(None)
  }
}

object DurationCounter {
  def toInstant(v: Any): Instant = v match {
    case i: Instant            => i
    case t: java.sql.Timestamp => t.toInstant
    case d: java.util.Date     => d.toInstant
    case l: Long               => Instant.ofEpochSecond(l)
    case i: Int                => Instant.ofEpochSecond(i.toLong) // JDBC INT
    case d: Double             => Instant.ofEpochMilli((d * 1000).toLong)
    case f: Float              => Instant.ofEpochMilli((f.toDouble * 1000).toLong)
    case s: String             => graft.jx.DateMath.parse(s).toInstant
    case other => throw new IllegalArgumentException(s"not a time value: $other")
  }
}

/** Calendar-aware duration with floor/between, matching mo_times semantics
  * (weeks start Sunday; months/years are calendar units). */
sealed trait DurationUnit {
  def floor(t: Instant): Instant
  /** whole durations between two floored instants */
  def between(a: Instant, b: Instant): Long
}

object DurationUnit {
  private val DAY = 86400L

  case class Seconds(n: Long) extends DurationUnit {
    def floor(t: Instant): Instant = Instant.ofEpochSecond(Math.floorDiv(t.getEpochSecond, n) * n)
    def between(a: Instant, b: Instant): Long = (b.getEpochSecond - a.getEpochSecond) / n
  }

  /** Weeks floor to Sunday (epoch day 0 = Thursday, offset +4). */
  case object Week extends DurationUnit {
    def floor(t: Instant): Instant = {
      val days = Math.floorDiv(t.getEpochSecond, DAY)
      val wk = Math.floorDiv(days + 4, 7L)
      Instant.ofEpochSecond((wk * 7 - 4) * DAY)
    }
    def between(a: Instant, b: Instant): Long =
      (b.getEpochSecond - a.getEpochSecond) / (7 * DAY)
  }

  case object Month extends DurationUnit {
    def floor(t: Instant): Instant =
      t.atZone(ZoneOffset.UTC).toLocalDate.withDayOfMonth(1).atStartOfDay(ZoneOffset.UTC).toInstant
    def between(a: Instant, b: Instant): Long = {
      val za = a.atZone(ZoneOffset.UTC); val zb = b.atZone(ZoneOffset.UTC)
      (zb.getYear * 12L + zb.getMonthValue) - (za.getYear * 12L + za.getMonthValue)
    }
  }

  case object Year extends DurationUnit {
    def floor(t: Instant): Instant =
      t.atZone(ZoneOffset.UTC).toLocalDate.withDayOfYear(1).atStartOfDay(ZoneOffset.UTC).toInstant
    def between(a: Instant, b: Instant): Long =
      b.atZone(ZoneOffset.UTC).getYear.toLong - a.atZone(ZoneOffset.UTC).getYear.toLong
  }

  def parse(s: String): DurationUnit = s.trim.toLowerCase.stripSuffix("s") match {
    case "second" => Seconds(1)
    case "minute" => Seconds(60)
    case "hour"   => Seconds(3600)
    case "day"    => Seconds(86400)
    case "week"   => Week
    case "month"  => Month
    case "year"   => Year
    case other => throw new IllegalArgumentException(s"unknown duration: $other")
  }
}
