package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.DataFrame

/** HTTP annotator adapter for [[ActiveLearn.run]]'s pluggable
  * `annotate` seam — the production counterpart of the planted-truth
  * oracle, mirroring the reference's LabelStudio round trip
  * (oagdedupe labelstudio/lsapi.py:176-204: `post_tasks` pushes the
  * uncertain pairs into a labeling project, `get_new_labels` polls the
  * project's completed annotations; fastapi/main.py:54-79 drives that
  * cycle from the learner side).
  *
  * Protocol (two endpoints, JSON over HTTP):
  *   - `POST {base}/tasks` — body `[{"id_l":"…","id_r":"…"}, …]`, the
  *     batch of uncertain pairs to label (lsapi.post_tasks analog).
  *   - `GET {base}/annotations` — returns
  *     `[{"id_l":"…","id_r":"…","label":0|1}, …]`, the annotations
  *     completed so far (lsapi.get_new_labels analog). Polled until
  *     every posted pair is labeled or `timeoutMs` elapses.
  *
  * The uncertain batch is inherently small (ActiveLearn's `batch`
  * top-k, human-labelable sizes), so collecting it to the driver is
  * the correct shape — a labeling queue is driver-side I/O, exactly as
  * the reference's FastAPI hop is. Ids must not contain `"` or `\`
  * (conv_ids are synthesized alphanumerics; enforced with a loud
  * failure rather than an escaping layer the protocol doesn't need).
  */
final class HttpAnnotator(base: String, pollMs: Long = 200,
                          timeoutMs: Long = 30000)
    extends (DataFrame => DataFrame) with Serializable {

  private def jsonStr(s: String): String = {
    require(!s.exists(c => c == '"' || c == '\\' || c < ' '),
      s"id not JSON-safe without escaping: $s")
    "\"" + s + "\""
  }

  private val rowRe =
    """\{\s*"id_l"\s*:\s*"([^"]*)"\s*,\s*"id_r"\s*:\s*"([^"]*)"\s*,\s*"label"\s*:\s*(\d+)\s*\}""".r

  def apply(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val todo = pairs.select("id_l", "id_r")
      .collect().map(r => (r.getString(0), r.getString(1)))
    if (todo.isEmpty) return Seq.empty[(String, String, Int)]
      .toDF("id_l", "id_r", "label")

    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    val body = todo.map { case (l, r) =>
      s"""{"id_l":${jsonStr(l)},"id_r":${jsonStr(r)}}"""
    }.mkString("[", ",", "]")
    val post = HttpRequest.newBuilder(URI.create(s"$base/tasks"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val postResp = client.send(post, HttpResponse.BodyHandlers.ofString())
    require(postResp.statusCode() / 100 == 2,
      s"POST /tasks failed: HTTP ${postResp.statusCode()}")

    // poll until every posted pair is annotated (the reference's
    // webhook inversion — polling — keeps the adapter dependency-free;
    // a webhook receiver would need a server inside the driver)
    val wanted = todo.toSet
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var got: Map[(String, String), Int] = Map.empty
    while (!wanted.forall(got.contains) && System.nanoTime() < deadline) {
      val get = HttpRequest.newBuilder(URI.create(s"$base/annotations"))
        .GET().build()
      val resp = client.send(get, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"GET /annotations failed: HTTP ${resp.statusCode()}")
      got = rowRe.findAllMatchIn(resp.body()).map(m =>
        ((m.group(1), m.group(2)), m.group(3).toInt)).toMap
      if (!wanted.forall(got.contains)) Thread.sleep(pollMs)
    }
    val missing = wanted.filterNot(got.contains)
    require(missing.isEmpty,
      s"annotator timed out with ${missing.size}/${wanted.size} pairs unlabeled")
    todo.map { case (l, r) => (l, r, got((l, r))) }.toSeq
      .toDF("id_l", "id_r", "label")
  }
}
