package graft

/** Test event types (top-level, so Spark Encoders can reflect them). */
final case class Ping(n: Int, tag: String)
final case class Pong(doubled: Int, tag: String)

final case class RichEvent(
    id: Long,
    name: String,
    note: Option[String],
    at: java.sql.Timestamp,
    attrs: Map[String, String],
    inner: Inner
)
final case class Inner(x: Int, y: Option[Double])

final case class UserState(userId: String, total: Double)
final case class GetUser(userId: String)
