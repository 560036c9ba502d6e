package graft.sources

/** Minimal HTTP GET with the reference's retry discipline
  * (/root/reference/app.py:94-127: bounded retries, exponential
  * `pow(2, attempt)` backoff, a 429's `Retry-After` honored when the
  * server names a wait). Used by [[PagedJsonSource]] when `path` is an
  * http(s) URL: each page fetch is an independent GET issued from its
  * own Spark task — the reference's page fan-out, with the retry loop
  * living in the PartitionReader instead of imperative client code.
  *
  * Retry matrix:
  *   - 200            → return body
  *   - 429            → sleep `Retry-After` seconds when present (capped),
  *                      else the exponential schedule; retry
  *   - 5xx / IO error → exponential schedule; retry
  *   - other 4xx      → fail immediately (a malformed request never
  *                      heals by retrying)
  * After `maxRetries` failed attempts the fetch throws — a partial page
  * failure must fail the TASK loudly (Spark then retries the task
  * itself, and ultimately the job fails visibly), never silently yield
  * a short read.
  *
  * `sleeper` is injectable so specs can pin the backoff schedule
  * without real waits; executors use the default `Thread.sleep`.
  */
object HttpPages {
  val MaxRetries = 5
  /** Base of the exponential schedule, ms: sleep = base * 2^attempt. */
  val BackoffBaseMs = 100L
  /** Ceiling on any single sleep, ms (a hostile Retry-After of hours
    * must not wedge an executor slot).
    */
  val MaxSleepMs = 10000L

  def fetch(url: String, maxRetries: Int = MaxRetries,
      sleeper: Long => Unit = Thread.sleep): String = {
    var attempt = 0
    while (true) {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val code =
        try conn.getResponseCode
        catch { case _: java.io.IOException => -1 }
      if (code == 200) {
        val in = conn.getInputStream
        try return new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
      Option(conn.getErrorStream)
        .foreach(s => try s.close() catch { case _: Throwable => })
      val retryable = code == 429 || code >= 500 || code == -1
      if (!retryable)
        throw new java.io.IOException(s"GET $url failed: HTTP $code")
      if (attempt >= maxRetries)
        throw new java.io.IOException(
          s"GET $url failed: HTTP $code after $attempt retries")
      val exponential = BackoffBaseMs * (1L << attempt)
      val sleepMs =
        if (code == 429)
          Option(conn.getHeaderField("Retry-After"))
            .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
            .map(_ * 1000L).getOrElse(exponential)
        else exponential
      sleeper(math.min(sleepMs, MaxSleepMs))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
