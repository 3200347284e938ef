package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-12 bench tail contract (VERDICT r11 item 2): the
  * per-query seconds are printed LAST as chunked JSON lines, each a
  * complete object under ~1800 chars, reassembling to the full query
  * map, with the headline scalars riding the FINAL chunk so a bare
  * ~2000-char tail capture still carries them. A regression here is
  * invisible locally but zeroes the driver's whole per-query comparison
  * (PERF n_common was 0 for two rounds because of exactly this).
  */
class BenchDigestSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(line: String) = mapper.readTree(line)

  private val results: Seq[(String, Double)] =
    (1 to 175).map(i => f"family${i % 20}%02d_query_name_$i%03d" -> i * 0.017)

  test("chunks are complete JSON lines under 1800 chars and reassemble to every query") {
    val chunks = Bench.perQueryChunks(results, total = 123.456,
      eps = 61000.0, epsNorm = 62000.0, trickleEps = 7000.0,
      trickleNorm = 7100.0, gateMin = 0.97, subsetMode = false)
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      assert(c.length < 1800, s"chunk too long for the tail budget: ${c.length}")
      assert(!c.contains("\n"))
      parse(c) // throws on malformed JSON
    }
    val reassembled = chunks.flatMap { c =>
      val qs = parse(c).get("queries")
      import scala.jdk.CollectionConverters._
      qs.properties().asScala.map(e => e.getKey -> e.getValue.asDouble())
    }.toMap
    assert(reassembled.keySet == results.map(_._1).toSet)
    results.foreach { case (k, v) =>
      assert(math.abs(reassembled(k) - v) < 0.0005, s"$k lost precision")
    }
    // part/nparts are consistent and ordered
    val metas = chunks.map(parse)
    assert(metas.map(_.get("part").asInt()) == (1 to chunks.size))
    assert(metas.forall(_.get("nparts").asInt() == chunks.size))
  }

  test("the FINAL chunk carries the headline scalars (tail-only consumers)") {
    val chunks = Bench.perQueryChunks(results, total = 123.456,
      eps = 61000.0, epsNorm = 62000.0, trickleEps = 7000.0,
      trickleNorm = 7100.0, gateMin = 0.97, subsetMode = false)
    val last = parse(chunks.last)
    assert(last.get("total_sec").asDouble() == 123.456)
    assert(last.get("n_queries").asInt() == 175)
    assert(last.get("cdc_events_per_sec").asDouble() == 61000.0)
    assert(last.get("cdc_eps_norm").asDouble() == 62000.0)
    assert(last.get("cdc_trickle_norm").asDouble() == 7100.0)
    assert(last.get("thr_gate_share").asDouble() == 0.97)
    // earlier chunks carry only queries
    chunks.init.foreach(c => assert(parse(c).get("total_sec") == null))
  }

  test("subset mode omits the throughput scalars instead of emitting zeros") {
    val chunks = Bench.perQueryChunks(results.take(3), total = 1.5,
      eps = 0.0, epsNorm = 0.0, trickleEps = 0.0, trickleNorm = 0.0,
      gateMin = 1.0, subsetMode = true)
    assert(chunks.size == 1)
    val d = parse(chunks.head)
    assert(d.get("total_sec").asDouble() == 1.5)
    assert(d.get("cdc_events_per_sec") == null,
      "subset mode must not emit zero-valued throughput fields")
    assert(d.get("cdc_trickle_norm") == null)
  }

  test("empty result set emits no chunk lines (eps-only mode)") {
    assert(Bench.perQueryChunks(Seq.empty, 0.0, 0, 0, 0, 0, 1.0,
      subsetMode = false).isEmpty)
  }
}
