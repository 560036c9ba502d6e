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

  /** The reference's API concurrency semaphore
    * (/root/reference/app.py:36-45,101: `API_CONCURRENCY_LIMIT = 10`,
    * deliberately lowered to avoid 429 storms against the throttled
    * API). Default in-flight GET cap per (JVM, authority); override per
    * read with the `graft.http.maxConcurrent` session conf. Per-JVM is
    * exactly the reference's scope (one Python process, one semaphore);
    * on a 1000-executor cluster the cap multiplies per executor JVM, so
    * a deployment sizes the conf to requestBudget / executors.
    */
  val DefaultMaxConcurrent = 10

  /** One fair permit pool per (authority, configured limit), JVM-global
    * so EVERY page task in the executor shares it — without this, 32
    * task slots against a rate-limited API trip exactly the 429 cascade
    * the reference's semaphore exists to prevent (per-task retry
    * absorbs it but multiplies latency). Keying by the limit too means
    * a reconfigured `graft.http.maxConcurrent` takes effect on the next
    * read instead of being frozen at first touch (all fetches of ONE
    * read share one limit, so within a read the cap is exact; two
    * concurrent reads configured differently against one host are a
    * misconfiguration, as they would be in the reference's
    * one-process-one-constant setup).
    */
  private val limiters = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.Semaphore]()

  private[graft] def resetLimiters(): Unit = limiters.clear()

  def fetch(url: String, maxRetries: Int = MaxRetries,
      sleeper: Long => Unit = Thread.sleep,
      maxConcurrent: Int = DefaultMaxConcurrent): String = {
    val authority = new java.net.URL(url).getAuthority
    val sem = limiters.computeIfAbsent(s"$authority#$maxConcurrent",
      _ => new java.util.concurrent.Semaphore(maxConcurrent, true))
    var attempt = 0
    while (true) {
      // the permit brackets ONE request round-trip; backoff sleeps
      // happen OUTSIDE it so a throttled task never starves the pool
      sem.acquire()
      val (code, retryAfterHdr, body) =
        try {
          val conn = new java.net.URL(url).openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("GET")
          conn.setConnectTimeout(10000)
          conn.setReadTimeout(30000)
          val c =
            try conn.getResponseCode
            catch { case _: java.io.IOException => -1 }
          if (c == 200) {
            val in = conn.getInputStream
            try (c, None, Some(new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)))
            finally in.close()
          } else {
            Option(conn.getErrorStream)
              .foreach(s => try s.close() catch { case _: Throwable => })
            (c, Option(conn.getHeaderField("Retry-After")), None)
          }
        } finally sem.release()
      body.foreach(return _)
      val retryable = code == 429 || code >= 500 || code == -1
      if (!retryable)
        throw new java.io.IOException(s"GET $url failed: HTTP $code")
      if (attempt >= maxRetries)
        throw new java.io.IOException(
          s"GET $url failed: HTTP $code after $attempt retries")
      val exponential = BackoffBaseMs * (1L << attempt)
      val sleepMs =
        if (code == 429)
          retryAfterHdr
            .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
            .map(_ * 1000L).getOrElse(exponential)
        else exponential
      sleeper(math.min(sleepMs, MaxSleepMs))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
