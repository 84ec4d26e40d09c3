package graft

import org.apache.spark.sql.functions.col

/** The reference README's front-door pipeline (`README.md:60-85`:
  * read_csv → filter(startswith) → map(select columns) → first 3 →
  * collect), re-expressed in graft calls — the code block in this repo's
  * README Quickstart compiles HERE, so the doc cannot rot.
  * Run: `sbt "runMain graft.Quickstart"` (optionally pass a CSV path/URL).
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "graft-quickstart", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the reference demo reads duckdb-releases.csv from a URL; default to
    // a local stand-in with the same shape so the example is egress-free
    val path = args.headOption.getOrElse {
      val p = java.nio.file.Files.createTempFile("releases-", ".csv")
      java.nio.file.Files.writeString(p,
        "version_number,release_date\n0.9.2,2023-11-14\n" +
          "0.10.0,2024-02-13\n0.10.1,2024-03-18\n0.10.2,2024-04-17\n" +
          "1.0.0,2024-06-03\n")
      p.toFile.deleteOnExit()
      p.toString
    }

    // reference:  @p read_csv(rowtable, url) |>
    //                filter(startswith(_.version_number, "0.10.")) |>
    //                map((;_.version_number, _.release_date)) |>
    //                first(__, 3)
    val releases =
      if (path.contains("://")) QuackIO.readUrl(spark, path)
      else QuackIO.readFile(spark, Seq(path))
    val out = releases
      .filter(col("version_number").startsWith("0.10."))
      .select("version_number", "release_date")
      .limit(3)

    // rowtable materializer = collect(); columntable = collectColumns
    out.collect().foreach(println)
    QuackIO.collectColumns(out).foreach { case (name, values) =>
      println(s"$name: ${values.mkString("[", ", ", "]")}")
    }
    spark.stop()
  }
}
