package graft.entity

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed entity state — the reference's only "table"
  * (reference: typebus/src/main/scala/io/surfkit/typebus/entity/
  * EntityDb.scala:12-25: `getState(id)` / `modifyState(id, s)` over Akka
  * cluster-sharded persistent actors, 50 shards, cluster/Actor.scala:7).
  *
  * Spark shape (SURVEY.md §2 E1/E2):
  *  - streaming: `mapGroupsWithState` — the state store IS the sharded
  *    entity db; shard count = `spark.sql.shuffle.partitions` (the analog
  *    of the reference's fixed 50).
  *  - batch: latest-state-per-key aggregation.
  *
  * Scale: `latestState` is a single hash-shuffle on the key with
  * map-side partial aggregation (max_by combines partials), so it does
  * NOT materialize per-key groups — at 100 TB this is one exchange and a
  * streaming aggregate, no sort, no window buffering. A window/row_number
  * formulation would sort every partition; max_by is strictly better.
  */
object EntityStore {

  /** Batch analog of the entity db's current state: latest `stateCols`
    * per `key` ordered by (`ts`, `tieBreak`). Implemented with `max_by`
    * over a packed struct — one shuffle, partial-agg friendly.
    */
  def latestState(df: DataFrame, key: String, ts: Column, tieBreak: Column,
                  stateCols: (Column, String)*): DataFrame = {
    val packed = struct(stateCols.map { case (c, n) => c.as(n) }: _*)
    df.groupBy(col(key))
      .agg(max_by(packed, struct(ts, tieBreak)).as("_state"))
      .select(col(key) +: stateCols.map { case (_, n) =>
        col(s"_state.$n").as(n) }: _*)
  }

  /** Commands applied to entity state in arrival order. */
  final case class Modify[S](id: String, state: S, ts: Long)

  /** E2: lifecycle event published on first instantiation
    * (reference: EntityDb.scala:17-21 `createEntity` -> `EntityCreated`).
    */
  final case class EntityEvent[S](id: String, state: S, created: Boolean)

  /** Streaming entity db: `modifyState` stream in, current state +
    * `EntityCreated`-flagged side output. `GroupState` is the sharded
    * persistent actor; first-seen key (`!state.exists`) emits
    * created=true, the E2 lifecycle event.
    */
  def streamingEntityDb[S](commands: Dataset[Modify[S]])
                          (implicit encS: Encoder[S],
                           encOut: Encoder[EntityEvent[S]],
                           encTuple: Encoder[(String, S)]): Dataset[EntityEvent[S]] = {
    import commands.sparkSession.implicits._
    commands
      .groupByKey(_.id)
      .mapGroupsWithState[S, EntityEvent[S]](GroupStateTimeout.NoTimeout()) {
        (id: String, cmds: Iterator[Modify[S]], state: GroupState[S]) =>
          val created = !state.exists
          val last = cmds.toSeq.maxBy(_.ts)
          state.update(last.state)
          EntityEvent(id, last.state, created)
      }
  }
}
