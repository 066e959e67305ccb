package graft.plans

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper

/** Real HTTP implementation of the [[Notifications.WrikeClient]]
  * boundary — the reference's Wrike v4 create-task call
  * (service/api/wrike.py:105-143 via `request`, :27-66):
  * `POST {base}/folders/{id}/tasks` with a JSON body of title,
  * description and optional responsibles, `Authorization: bearer` +
  * `Accept: application/json` headers. Non-200 responses and responses
  * whose `data` array is not exactly one task THROW (wrike.py:58-66,
  * 141-143) — the dispatcher contract upstream re-enqueues the batch.
  *
  * `baseUrl` replaces the reference's host allow-list (API_HOST_GLOBAL /
  * API_HOST_EU): pass `https://www.wrike.com/api/v4` or the EU host —
  * or an in-process server in tests, which is how NotificationsSpec
  * drives this without egress. JSON goes through Jackson (already on
  * the Spark classpath), not string concatenation. */
final class WrikeHttpClient(apiToken: String, baseUrl: String,
                            timeoutMs: Long = 30000L)
    extends Notifications.WrikeClient {

  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def createTask(folderId: String, title: String,
                          description: String,
                          responsibles: Seq[String]): Unit = {
    require(title.nonEmpty, "Missing required title in task data") // wrike.py:114
    val body = mapper.createObjectNode()
    body.put("title", title)
    body.put("description", description)
    if (responsibles.nonEmpty) {
      val arr = body.putArray("responsibles")
      responsibles.foreach(arr.add)
    }
    val req = HttpRequest.newBuilder(
        URI.create(s"$baseUrl/folders/$folderId/tasks"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Accept", "application/json")
      .header("Authorization", s"bearer $apiToken")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"Wrike API error ${resp.statusCode()}: ${resp.body().take(500)}")
    val data = mapper.readTree(resp.body()).path("data")
    if (!data.isArray || data.size() != 1)
      throw new RuntimeException("Failed to create task") // wrike.py:141-143
  }
}
