package graft.events

/** Long-poll loop with exponential backoff (reference:
  * rpatterns/poll.go — poll the stream, back off while it is idle or
  * erroring, reset to the base period on progress).
  *
  * The body is any unit of consumption that reports how many events it
  * handled — typically `Runner.runToHead(spec).consumed`. Backoff
  * doubles from `initialBackoffMs` up to `maxBackoffMs` across idle
  * polls and snaps back to the base after any productive one, the
  * standard long-poll shape for a consumer tailing a mostly-quiet log.
  */
object Poller {

  final case class PollStats(polls: Long, consumed: Long, idlePolls: Long)

  /** Poll until `stop` returns true (checked between polls).
    * @param body one poll; returns events consumed (0 = idle)
    * @param sleep injectable for tests (default Thread.sleep)
    */
  def run(
      initialBackoffMs: Long = 100L,
      maxBackoffMs: Long = 10000L,
      stop: PollStats => Boolean,
      sleep: Long => Unit = Thread.sleep)(body: () => Long): PollStats = {
    require(initialBackoffMs > 0 && maxBackoffMs >= initialBackoffMs)
    var stats = PollStats(0L, 0L, 0L)
    var backoff = initialBackoffMs
    while (!stop(stats)) {
      val n = body()
      stats = stats.copy(
        polls = stats.polls + 1,
        consumed = stats.consumed + n,
        idlePolls = if (n == 0) stats.idlePolls + 1 else stats.idlePolls)
      if (stop(stats)) return stats
      if (n == 0) {
        sleep(backoff)
        backoff = math.min(backoff * 2, maxBackoffMs)
      } else backoff = initialBackoffMs
    }
    stats
  }
}
