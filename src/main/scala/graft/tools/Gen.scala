package graft.tools

import graft.gen.{ClientGen, DescriptorIO}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** C3 CLI driver — the runnable end of the generator, the analog of the
  * reference's `gen` command (reference: typebus/src/main/scala/io/
  * surfkit/typebus/cli/CommandParser.scala:56-123 driving
  * gen/package.scala:276-317): read a persisted [[graft.service.ServiceDescriptor]],
  * emit the typed client facade and the payload case classes as Scala
  * source files into a target directory.
  *
  * Usage: `runMain graft.tools.Gen <descriptorJson> <outDir> [clientPkg] [dataPkg]`
  */
object Gen {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Gen <descriptorJson> <outDir> [clientPkg] [dataPkg]")
    val descPath = args(0)
    val outDir = args(1)
    val clientPkg = if (args.length > 2) args(2) else "generated"
    val dataPkg = if (args.length > 3) args(3) else clientPkg + ".data"

    // reuse a live session when invoked in-process (specs); build a small
    // local one when run as a CLI — and only stop what this main created
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    val spark = preExisting.getOrElse(SparkSession.builder()
      .master("local[2]")
      .appName("graft-gen")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

    try {
      val desc = DescriptorIO.load(spark, descPath)
      val base = desc.service.substring(desc.service.lastIndexOf('.') + 1).capitalize
      Files.createDirectories(Paths.get(outDir))
      val clientFile = Paths.get(outDir, s"${base}Client.scala")
      Files.writeString(clientFile, ClientGen.clientSource(desc, clientPkg))
      println(s"[gen] wrote $clientFile")
      if (desc.types.nonEmpty) {
        val dataFile = Paths.get(outDir, s"${base}Data.scala")
        Files.writeString(dataFile, ClientGen.dataSource(desc, dataPkg))
        println(s"[gen] wrote $dataFile")
      }
    } finally if (preExisting.isEmpty) spark.stop()
  }
}
