package graft

import org.scalatest.funsuite.AnyFunSuite

/** A filtered (SPARK_GRAFT_ONLY) bench run must never truncate the
  * full-battery artifact — round 7 shipped two commits with a one-entry
  * BENCH_LOCAL.json exactly that way. */
class BenchMergeSpec extends AnyFunSuite {

  test("merge overlays the updated key and keeps every other entry") {
    val full = """{"q_a":0.100,"q_b":0.200,"q_c":0.300}"""
    val out = Bench.mergeJson(full, Seq("q_b" -> "0.250"))
    assert(out.trim == """{"q_a":0.1,"q_b":0.250,"q_c":0.3}""")
  }

  test("merge appends a key the battery has not seen yet") {
    val out = Bench.mergeJson("""{"q_a":0.1}""", Seq("q_new" -> "1.5"))
    assert(out.trim == """{"q_a":0.1,"q_new":1.5}""")
  }

  test("merge into an empty/missing file is just the updates") {
    assert(Bench.mergeJson("", Seq("q_a" -> "0.5")).trim == """{"q_a":0.5}""")
  }

  test("array-valued entries (BENCH_RUNS shape, incl. null) survive a merge") {
    val runsFile = """{"q_a":[0.1,0.2,0.3],"q_b":[0.4,null,0.5]}"""
    val out = Bench.mergeJson(runsFile, Seq("q_a" -> "[0.15,0.16,0.17]"))
    assert(out.trim == """{"q_a":[0.15,0.16,0.17],"q_b":[0.4,null,0.5]}""")
  }

  test("a 273-entry battery survives a single-query run untouched minus the one key") {
    val entries = (1 to 273).map(i => s"q_$i" -> s"0.$i")
    val full = entries.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val out = Bench.mergeJson(full, Seq("q_7" -> "9.999"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(out)
    assert(tree.size() == 273)
    assert(tree.get("q_7").asDouble() == 9.999)
    assert(tree.get("q_200").asDouble() == 0.200)
  }
}
