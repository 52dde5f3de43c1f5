package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ActiveLearnSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("active-learning loop grows the labeled set and does not degrade F1") {
    val rounds = ActiveLearn.run(spark, sfDir,
      rounds = 3, batch = 10, seedLabels = 6)
    info(rounds.map(r => s"round ${r.round}: n=${r.nLabeled} f1=${r.f1}")
      .mkString("; "))
    assert(rounds.size == 3)
    // each round adds `batch` annotations (uncertainty top-k → oracle)
    assert(rounds.map(_.nLabeled) == Seq(6L, 16L, 26L))
    // retraining on more labels never degrades the end metric here
    assert(rounds.last.f1 >= rounds.head.f1)
    assert(rounds.last.f1 >= 0.99)
  }

  test("HTTP annotator adapter drives the loop through a REST stub " +
    "(post tasks, poll annotations, retrain)") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.net.InetSocketAddress

    // planted truth the stub consults — the in-process stand-in for the
    // reference's LabelStudio human (lsapi.py:176-204 semantics)
    val truth = graft.block.Labels.truthPairs(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

    val taskRe = """\{"id_l":"([^"]*)","id_r":"([^"]*)"\}""".r
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/tasks", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        taskRe.findAllMatchIn(body).foreach(m =>
          queue.add((m.group(1), m.group(2))))
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.createContext("/annotations", new HttpHandler {
      // annotations "complete" one poll at a time: the first GET after a
      // post returns a partial set, so the adapter's poll loop is
      // genuinely exercised (not just a single-round trip)
      val released = new java.util.concurrent.atomic.AtomicInteger(0)
      def handle(ex: HttpExchange): Unit = {
        val all = queue.toArray(Array.empty[(String, String)])
        val n = math.min(all.length,
          released.updateAndGet(r => math.min(r + 7, all.length)))
        // keys deliberately NOT in id_l/id_r/label order, plus an
        // extra field — real JSON serializers guarantee neither, and
        // the adapter must parse fields, not a fixed key sequence
        val body = all.take(n).map { case (l, r) =>
          val lab = if (truth.contains((l, r))) 1 else 0
          s"""{"label":$lab,"task":7,"id_r":"$r","id_l":"$l"}"""
        }.mkString("[", ",", "]").getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length); ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val rounds = ActiveLearn.run(spark, sfDir,
        rounds = 3, batch = 10, seedLabels = 6,
        annotate = new HttpAnnotator(base, pollMs = 50))
      // same loop shape as the oracle-annotator case: the adapter
      // returned a label for every posted pair, so the labeled set
      // grows by `batch` per round and the metric holds
      assert(rounds.map(_.nLabeled) == Seq(6L, 16L, 26L))
      assert(rounds.last.f1 >= 0.99)
      // both rounds' batches actually travelled through the stub
      assert(queue.size == 20)
    } finally server.stop(0)
  }
}
