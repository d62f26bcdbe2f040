package graft.gen

import graft.service.ServiceDescriptor
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** Descriptor persistence for the offline generator: a descriptor is a
  * one-row Spark JSON dataset, readable back with the Encoder-derived
  * schema (no inference pass). This is the durable twin of the
  * control-plane broadcast (D2) — the reference persists descriptors in
  * the consuming project's `.typebus` store for its `gen` command to
  * read offline (reference: typebus/src/main/scala/io/surfkit/typebus/
  * cli/CommandParser.scala:56-123); here the store is any path Spark can
  * reach, so a 1000-node deployment can drop descriptors on shared
  * storage and run codegen anywhere.
  */
object DescriptorIO {

  private implicit val enc: Encoder[ServiceDescriptor] =
    Encoders.product[ServiceDescriptor]

  def save(spark: SparkSession, desc: ServiceDescriptor, path: String): Unit =
    spark.createDataset(Seq(desc)).coalesce(1)
      .write.mode("overwrite").json(path)

  def load(spark: SparkSession, path: String): ServiceDescriptor =
    spark.read.schema(enc.schema).json(path).as[ServiceDescriptor].head()
}
