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

  // annotation objects are parsed field-by-field, NOT with one
  // ordered regex: JSON serializers don't guarantee key order and a
  // real backend may attach extra scalar fields — both must parse,
  // not time out as "unlabeled"
  private val objRe = """\{[^{}]*\}""".r
  private val idLRe = """"id_l"\s*:\s*"([^"]*)"""".r
  private val idRRe = """"id_r"\s*:\s*"([^"]*)"""".r
  private val labelRe = """"label"\s*:\s*(\d+)""".r

  private def parseAnnotations(body: String): Map[(String, String), Int] =
    objRe.findAllIn(body).flatMap { o =>
      for {
        l <- idLRe.findFirstMatchIn(o)
        r <- idRRe.findFirstMatchIn(o)
        v <- labelRe.findFirstMatchIn(o)
      } yield ((l.group(1), r.group(1)), v.group(1).toInt)
    }.toMap

  def apply(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val todo = pairs.select("id_l", "id_r")
      .collect().map(r => (r.getString(0), r.getString(1)))
    if (todo.isEmpty) return Seq.empty[(String, String, Int)]
      .toDF("id_l", "id_r", "label")

    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    // every request carries its own .timeout() bounded by the overall
    // deadline: connectTimeout alone does not bound a server that
    // accepts the connection and then stalls mid-response — without a
    // request timeout the poll loop would hang in send() forever
    // instead of failing after timeoutMs
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def remaining = Duration.ofMillis(
      math.max(1L, (deadline - System.nanoTime()) / 1000000L))
    val body = todo.map { case (l, r) =>
      s"""{"id_l":${jsonStr(l)},"id_r":${jsonStr(r)}}"""
    }.mkString("[", ",", "]")
    val post = HttpRequest.newBuilder(URI.create(s"$base/tasks"))
      .header("Content-Type", "application/json")
      .timeout(remaining)
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val postResp = client.send(post, HttpResponse.BodyHandlers.ofString())
    require(postResp.statusCode() / 100 == 2,
      s"POST /tasks failed: HTTP ${postResp.statusCode()}")

    // poll until every posted pair is annotated (the reference's
    // webhook inversion — polling — keeps the adapter dependency-free;
    // a webhook receiver would need a server inside the driver)
    val wanted = todo.toSet
    var got: Map[(String, String), Int] = Map.empty
    while (!wanted.forall(got.contains) && System.nanoTime() < deadline) {
      val get = HttpRequest.newBuilder(URI.create(s"$base/annotations"))
        .timeout(remaining).GET().build()
      val resp =
        try client.send(get, HttpResponse.BodyHandlers.ofString())
        catch { // a stalled response burns the deadline, not forever;
                // the loop exits and the unlabeled require reports it
          case _: java.net.http.HttpTimeoutException => null
        }
      if (resp != null) {
        require(resp.statusCode() / 100 == 2,
          s"GET /annotations failed: HTTP ${resp.statusCode()}")
        got = parseAnnotations(resp.body())
      }
      if (!wanted.forall(got.contains) && System.nanoTime() < deadline)
        Thread.sleep(pollMs)
    }
    val missing = wanted.filterNot(got.contains)
    require(missing.isEmpty,
      s"annotator timed out with ${missing.size}/${wanted.size} pairs unlabeled")
    todo.map { case (l, r) => (l, r, got((l, r))) }.toSeq
      .toDF("id_l", "id_r", "label")
  }
}
