package graft

import graft.entity.EntityStore
import graft.entity.EntityStore.{EntityEvent, Modify}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EntityStoreSpec extends SparkSpec {
  import spark.implicits._

  test("latestState picks the row with max (ts, tieBreak) per key") {
    val df = Seq(
      (1L, "a", 10.0, 100L), (1L, "b", 20.0, 200L),
      (2L, "c", 5.0, 50L), (2L, "d", 7.0, 50L) // ts tie -> tieBreak decides
    ).toDF("k", "name", "v", "ts")
    val out = EntityStore.latestState(df, "k", col("ts"), col("name"),
      col("name") -> "last_name", col("v") -> "last_v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, "b", 20.0), (2L, "d", 7.0)))
  }

  test("streaming entity db emits created=true on first-seen keys only (E2)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Modify[String]]
    val q = EntityStore.streamingEntityDb[String](in.toDS())
      .writeStream.format("memory").queryName("entities").outputMode("update").start()
    try {
      in.addData(Modify("e1", "s1", 1L), Modify("e1", "s2", 2L), Modify("e2", "x", 1L))
      q.processAllAvailable()
      val batch1 = spark.table("entities").as[EntityEvent[String]].collect().sortBy(_.id)
      assert(batch1.toSeq === Seq(
        EntityEvent("e1", "s2", created = true), // latest-by-ts within the batch
        EntityEvent("e2", "x", created = true)))

      in.addData(Modify("e1", "s3", 3L))
      q.processAllAvailable()
      val all = spark.table("entities").as[EntityEvent[String]].collect()
      assert(all.count(e => e.id == "e1" && e.state == "s3" && !e.created) === 1)
    } finally q.stop()
  }
}
