package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
object DebugKernelize {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ')) AS n")
    val plan = df.queryExecution.optimizedPlan
    plan.transformAllExpressions {
      case e @ StringTrim(inner, tr) =>
        println(s"TRIM matched: inner=${inner.getClass.getSimpleName} trimStr=$tr")
        inner match {
          case RegExpReplace(subj, re, rep, pos) =>
            println(s"  RRE: subj=${subj.getClass.getSimpleName} re=${re.getClass.getSimpleName}:$re rep=[$rep] pos=$pos posCls=${pos.getClass}")
            subj match {
              case Lower(t) => println(s"  LOWER child ok: ${t.getClass.getSimpleName}")
              case other => println(s"  subj NOT Lower: $other")
            }
            re match {
              case Literal(s: org.apache.spark.unsafe.types.UTF8String, dt) =>
                println(s"  re literal dt=$dt value bytes=${s.toString.getBytes("UTF-8").map(b => f"$b%02x").mkString(" ")}")
              case _ => println("  re not literal")
            }
          case other => println(s"  inner NOT RRE: ${other.getClass}")
        }
        e
    }
    spark.stop()
  }
}
