package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Anomaly

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("cold start and zero-variance baselines yield null scores, not flags") {
    // 20 perfectly flat hours of 5 events, then a 50-event spike: the
    // flat baseline has sd == 0, so NOTHING is scorable — the guard must
    // return null rather than dividing by zero or flagging everything
    val events =
      (0 until 20).flatMap(h => (0 until 5).map(i => (ts(h, i), "click"))) ++
        (0 until 50).map(i => (ts(20, i), "click"))
    val out = Anomaly
      .hourlyZScores(events.toDF("ts", "event_type"), "ts", Seq("event_type"),
        baselineHours = 24, minBaseline = 12, zThreshold = 3.0)
      .orderBy("hour")
      .collect()
    assert(out.length == 21)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("z")), s"row $r should be unscorable")
      assert(r.isNullAt(r.fieldIndex("is_anomaly")))
    }
    // but the warm hours DO see a full baseline (mean_n present)
    val warm = out.drop(12)
    warm.foreach(r => assert(!r.isNullAt(r.fieldIndex("mean_n"))))
  }

  test("spike over a noisy baseline scores |z| >= 3 and flags") {
    // alternating 4/6 counts for 20 hours (mean 5, sd 1), then 50
    val events =
      (0 until 20).flatMap { h =>
        val n = if (h % 2 == 0) 4 else 6
        (0 until n).map(i => (ts(h, i), "click"))
      } ++ (0 until 50).map(i => (ts(20, i), "click"))
    val out = Anomaly
      .hourlyZScores(events.toDF("ts", "event_type"), "ts", Seq("event_type"),
        baselineHours = 24, minBaseline = 12, zThreshold = 3.0)
      .orderBy("hour")
      .collect()
    val spike = out.last
    assert(spike.getLong(spike.fieldIndex("n")) == 50)
    assert(spike.getDouble(spike.fieldIndex("z")) > 3.0)
    assert(spike.getInt(spike.fieldIndex("is_anomaly")) == 1)
    // warm steady hours score near zero and stay unflagged
    val steadyWarm = out.drop(12).dropRight(1)
    steadyWarm.foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("z"))) < 3.0)
      assert(r.getInt(r.fieldIndex("is_anomaly")) == 0)
    }
  }

  test("silent hours age out of the baseline on the clock (range frame)") {
    // 15 busy hours, a 30-hour gap, then one more hour: the baseline
    // window (24h) contains NO observations for the post-gap hour
    val events =
      (0 until 15).flatMap(h => (0 until 5).map(i => (ts(h, i), "x"))) ++
        Seq((Timestamp.valueOf("2024-01-02 21:00:00"), "x"))
    val out = Anomaly
      .hourlyZScores(events.toDF("ts", "event_type"), "ts", Seq("event_type"))
      .orderBy("hour")
      .collect()
    val last = out.last
    assert(last.getLong(last.fieldIndex("base_cnt")) == 0,
      "post-gap hour must see an empty baseline, not 24 stale rows")
    assert(last.isNullAt(last.fieldIndex("z")))
  }

  test("seasonal baseline: a diurnal surge is normal, an off-pattern one is not") {
    // 10 days: hour 9 always gets 20 events (plus tiny jitter), all other
    // hours get 2. On day 10, hour 9 is NORMAL for the seasonal model,
    // but hour 3 suddenly carrying 20 is anomalous.
    def at(day: Int, hour: Int, minute: Int) =
      Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$minute%02d:00")
    val events =
      (1 to 10).flatMap { d =>
        val nine = 20 + (d % 2) // jitter so sd > 0
        (0 until nine).map(i => (at(d, 9, i), "x")) ++
          (0 until 24).filter(_ != 9).flatMap { h =>
            val n = 2 + ((d + h) % 2)
            (0 until n).map(i => (at(d, h, i), "x"))
          }
      } ++ (0 until 20).map(i => (at(10, 3, 30 + i), "x"))
    val out = graft.operators.Anomaly
      .seasonalZScores(events.toDF("ts", "event_type"), "ts", Seq("event_type"),
        baselineDays = 7, minBaseline = 3, zThreshold = 3.0)
      .filter(col("hour") >= lit(Timestamp.valueOf("2024-01-10 00:00:00")))
      .collect()
      .map(r => r.getInt(r.fieldIndex("hod")) ->
        (if (r.isNullAt(r.fieldIndex("is_anomaly"))) -1
         else r.getInt(r.fieldIndex("is_anomaly"))))
      .toMap
    assert(out(9) == 0, "the usual 9am surge must be in-pattern")
    assert(out(3) == 1, "a night hour at 9am volume must flag")
  }

  test("changepoint: locates a level shift; stable series score low") {
    // key "shift": 30 hours at ~5, then 30 hours at ~15 -> cp at the jump
    // key "flat": alternating 5/7 throughout -> small normalized stat
    val events =
      (0 until 60).flatMap { h =>
        val d = 1 + h / 24
        val hh = h % 24
        def at(m: Int) = Timestamp.valueOf(f"2024-01-$d%02d $hh%02d:$m%02d:00")
        val nShift = (if (h < 30) 5 else 15) + (h % 2)
        val nFlat = 5 + 2 * (h % 2)
        (0 until nShift).map(m => (at(m), "shift")) ++
          (0 until nFlat).map(m => (at(m), "flat"))
      }
    val out = graft.operators.Anomaly
      .changepoint(events.toDF("ts", "event_type"), "ts", Seq("event_type"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val shiftRow = out("shift")
    // |S| peaks at the last pre-shift hour (hour index 29)
    assert(shiftRow.getTimestamp(shiftRow.fieldIndex("cp_hour")) ==
      Timestamp.valueOf("2024-01-02 05:00:00"))
    val shiftStat = shiftRow.getDouble(shiftRow.fieldIndex("stat"))
    val flatStat = out("flat").getDouble(out("flat").fieldIndex("stat"))
    assert(shiftStat > 3 * flatStat,
      s"shift stat $shiftStat must dominate flat $flatStat")
  }

  test("series are scored per key: one key's burst does not taint another") {
    // key a alternates 4/6 then bursts; key b alternates 1/3 throughout
    val events =
      (0 until 20).flatMap { h =>
        val na = if (h % 2 == 0) 4 else 6
        val nb = if (h % 2 == 0) 1 else 3
        (0 until na).map(i => (ts(h, i), "a")) ++
          (0 until nb).map(i => (ts(h, 30 + i), "b"))
      } ++ (0 until 50).map(i => (ts(20, i), "a")) ++
        Seq((ts(20, 30), "b"))
    val out = Anomaly
      .hourlyZScores(events.toDF("ts", "event_type"), "ts", Seq("event_type"))
      .filter(col("event_type") === "b")
      .orderBy("hour")
      .collect()
    val lastB = out.last
    assert(lastB.getInt(lastB.fieldIndex("is_anomaly")) == 0,
      "in-band series b must stay unflagged while a bursts")
  }
}
