package graft
object HttpProbe extends App {
  val s = TestSpark.spark
  val srv = graft.search.StacHttp.start(s, TestSpark.sf)
  val c = java.net.http.HttpClient.newHttpClient()
  def get(p: String) = c.send(java.net.http.HttpRequest.newBuilder(
    java.net.URI.create(srv.base + p)).GET().build(),
    java.net.http.HttpResponse.BodyHandlers.ofString())
  val r = get("/search?collections=click&limit=1&fields=-assets,-properties.value")
  println(r.statusCode); println(r.body())
  srv.stop(); s.stop()
}
