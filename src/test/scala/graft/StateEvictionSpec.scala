package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.{Assigned, Ev}

/** Event-time state eviction across real micro-batches: a key idle past the
  * session gap is dropped from the state store (bounded state for unbounded
  * key spaces); when it reappears, numbering restarts. */
class StateEvictionSpec extends AnyFunSuite {

  test("idle key state is evicted once the watermark passes its gap") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val inDir = Files.createTempDirectory("evict-in-").toString
    val ckpt = Files.createTempDirectory("evict-ck-").toString
    val h = 3600L * 1000 // hour in millis
    // NOTE: event times must sit above the initial watermark (epoch 0) or
    // the very first rows are discarded as late — a real-world gotcha worth
    // keeping visible here
    val base = 1700000000000L

    def writeBatch(rows: Seq[Ev], part: Int): Unit =
      rows.toDS().write.mode("append").parquet(inDir)

    def runBatch(name: String): Seq[Assigned] = {
      val schema = implicitly[org.apache.spark.sql.Encoder[Ev]].schema
      val stream = spark.readStream.schema(schema).parquet(inDir).as[Ev]
        .withWatermark("ts", "10 minutes")
      val collected = scala.collection.mutable.ArrayBuffer[Assigned]()
      // foreachBatch (memory sink cannot recover from a checkpoint)
      val q = StatefulSessionizer.sessionizeWithEviction(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Assigned], _: Long) =>
          collected ++= b.collect(); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      collected.toSeq
    }

    // batch 1: user 99 (will go idle) and user 1
    writeBatch(Seq(Ev(99, 1, new Timestamp(base)), Ev(1, 2, new Timestamp(base))), 1)
    val b1 = runBatch("ev_b1")
    assert(b1.toSet == Set(Assigned(99, 1, 1), Assigned(1, 2, 1)))

    // batch 2: only user 1, three hours later — watermark advances far past
    // user 99's 30-minute gap, so user 99's state is evicted this batch
    writeBatch(Seq(Ev(1, 3, new Timestamp(base + 3 * h))), 2)
    val b2 = runBatch("ev_b2")
    assert(b2.contains(Assigned(1, 3, 2))) // new session for user 1 (gap)

    // batch 3: user 99 reappears — fresh state, numbering restarts at 1
    // (without eviction the surviving state would make this session 2)
    writeBatch(Seq(Ev(99, 4, new Timestamp(base + 3 * h + 60000))), 3)
    val b3 = runBatch("ev_b3")
    assert(b3.contains(Assigned(99, 4, 1)))
  }
}
