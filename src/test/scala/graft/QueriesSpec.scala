package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query-operation semantics against the parsed bash-example fixture
  * (reference query_test.go / query_seek_test.go / query_cli.go).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark.{spark, linesDF}

  private lazy val parsed =
    LogParser.parse(spark, "/root/reference/testdata/bash-example.log").cache()

  test("list-groups: 13 groups ordered by first_seen, counts sum to total") {
    val groups = Queries.listGroups(parsed).collect()
    assert(groups.length == 13)
    assert(groups.map(_.getAs[Long]("entry_count")).sum == 212L)
    assert(groups.map(_.getAs[Long]("commands")).sum == 15L)
    assert(groups.map(_.getAs[Long]("progress")).sum == 4L)
    val firstSeen = groups.map(_.getAs[java.sql.Timestamp]("first_seen").getTime)
    assert(firstSeen.sameElements(firstSeen.sorted), "ordered by first_seen")
  }

  test("by-group: case-insensitive substring; every match contains pattern") {
    // query_test.go:59-83 invariant
    val matched = Queries.byGroup(parsed, "Environment").collect()
    assert(matched.nonEmpty)
    assert(matched.forall(_.getAs[String]("group").toLowerCase.contains("environment")))
  }

  test("by-group: '<no group>' pattern selects ungrouped rows") {
    // query.go:343-348 — normalization happens BEFORE the match
    val df = LogParser.parseLines(linesDF(Seq("pre1", "pre2", "~~~ G", "post")))
    assert(Queries.byGroup(df, "no group").count() == 2L)
  }

  test("filter by type") {
    assert(Queries.filterByType(parsed, "command").count() == 15L)
    assert(Queries.filterByType(parsed, "group").count() == 13L)
    assert(Queries.filterByType(parsed, "section").count() == 13L)
    assert(Queries.filterByType(parsed, "progress").count() == 4L)
    assert(Queries.filterByType(parsed, "anything-else").count() == 212L)
  }

  test("tail returns the last n rows in order") {
    val rows = Queries.tail(parsed, 5).select("line_no").collect().map(_.getLong(0))
    assert(rows.sameElements(Array(207L, 208L, 209L, 210L, 211L)))
    // n larger than file -> whole file (query_cli.go:319-327 clamps to 0)
    assert(Queries.tail(parsed, 1000).count() == 212L)
  }

  test("tail of an empty entries table is empty, not an error") {
    assert(Queries.tail(parsed.filter(col("line_no") < 0), 5).count() == 0L)
  }

  test("tail/seek over multiple files use the global row space, not per-file line_no") {
    // line_no restarts per file (advisor finding, round 1): tail(n) must
    // return the last n rows of the CONCATENATED stream (files in name
    // order), not the tail of each file
    val tmp = java.nio.file.Files.createTempDirectory("multitail")
    java.nio.file.Files.write(tmp.resolve("a.log"), (0 until 10).map(i => s"a$i").mkString("\n").getBytes)
    java.nio.file.Files.write(tmp.resolve("b.log"), (0 until 10).map(i => s"b$i").mkString("\n").getBytes)
    val entries = LogParser.parse(spark, tmp.toString + "/*.log")
    assert(entries.count() == 20L)
    val t3 = Queries.tail(entries, 3).select("content").collect().map(_.getString(0))
    assert(t3.toSeq == Seq("b7", "b8", "b9"), s"got ${t3.toSeq}")
    val t12 = Queries.tail(entries, 12).select("content").collect().map(_.getString(0))
    assert(t12.toSeq == (8 until 10).map(i => s"a$i") ++ (0 until 10).map(i => s"b$i"),
      s"tail crossing the file boundary, got ${t12.toSeq}")
    val s15 = Queries.seek(entries, 15, Some(3)).select("content").collect().map(_.getString(0))
    assert(s15.toSeq == Seq("b5", "b6", "b7"), s"got ${s15.toSeq}")
    val sAll = Queries.seek(entries, 8).select("content").collect().map(_.getString(0))
    assert(sAll.toSeq == Seq("a8", "a9") ++ (0 until 10).map(i => s"b$i"))
  }

  test("seek/tail over many files (>64) take the broadcast-offset path") {
    // above OrChainMaxFiles the per-file predicates become a broadcast
    // join on per-file offsets; semantics must be identical
    import spark.implicits._
    val rows = for (f <- 0 until 80; i <- 0 until 5)
      yield (f"file$f%03d", i.toLong, s"f$f-l$i")
    val entries = rows.toDF(Schema.File, Schema.LineNo, "content")
    val t3 = Queries.tail(entries, 3).select("content").collect().map(_.getString(0))
    assert(t3.toSeq == Seq("f79-l2", "f79-l3", "f79-l4"), s"got ${t3.toSeq}")
    // global row 202 = file 40 (offset 200), line 2; crosses into file 41
    val s = Queries.seek(entries, 202, Some(4)).select("content").collect().map(_.getString(0))
    assert(s.toSeq == Seq("f40-l2", "f40-l3", "f40-l4", "f41-l0"), s"got ${s.toSeq}")
    assert(Queries.seek(entries, 400).count() == 0L)
  }

  test("seek streams from row k with optional limit") {
    val rows = Queries.seek(parsed, 100, Some(10)).select("line_no").collect().map(_.getLong(0))
    assert(rows.toSeq == (100L to 109L).toSeq)
    assert(Queries.seek(parsed, 200).count() == 12L)
    // beyond EOF -> empty (the reference errors; we return empty, which is
    // the idiomatic lazy-DataFrame shape of the same condition)
    assert(Queries.seek(parsed, 5000).count() == 0L)
  }

  test("summary equals the reference A2 counters") {
    val r = Queries.summary(parsed).head()
    assert(r.getAs[Long]("total_entries") == 212L)
    assert(r.getAs[Long]("regular_output") ==
      212L - r.getAs[Long]("commands") - r.getAs[Long]("sections") - r.getAs[Long]("progress"))
  }

  test("group filter pushes down to the parquet scan") {
    // P6 over a persisted entries table: predicate must reach the scan.
    val dir = java.nio.file.Files.createTempDirectory("graft-pd").toString + "/e"
    ParquetIO.write(parsed, dir)
    val back = ParquetIO.read(spark, dir).filter(col(Schema.IsCommand))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(is_command), EqualTo(is_command,true)]")
      || plan.contains("EqualTo(is_command,true)"), plan)
  }
}
