package graft.util

import scala.concurrent.duration._
import scala.util.control.NonFatal

/** Exponential-backoff retry for *control-plane* calls (metastore lookups,
  * admin requests). Parity with the reference's `RetryDriver.java:28-153`
  * and its defaults (10 attempts, 1 s base, ×2, 30 s cap, `:31-34`) — but
  * deliberately NOT used in the data path: Spark's Kafka source owns fetch
  * retry/failover there (reference O6 is engine-side now, SURVEY.md §4).
  */
object Retry {

  final case class Policy(
      maxAttempts: Int = 10,
      baseDelay: FiniteDuration = 1.second,
      maxDelay: FiniteDuration = 30.seconds,
      factor: Double = 2.0,
      /** exceptions that abort immediately (reference `stopOn`) */
      stopOn: Seq[Class[_ <: Throwable]] = Nil,
      /** hook before each re-attempt (reference `onRetry`, used there to
        * refresh cached consumers)
        */
      onRetry: () => Unit = () => (),
      sleep: Long => Unit = Thread.sleep)

  def apply[T](name: String, policy: Policy = Policy())(body: => T): T = {
    var attempt = 0
    var delay = policy.baseDelay.toMillis
    while (true) {
      attempt += 1
      try return body
      catch {
        case NonFatal(e) =>
          val fatal = policy.stopOn.exists(_.isInstance(e))
          if (fatal || attempt >= policy.maxAttempts) throw e
          policy.sleep(delay)
          delay = math.min((delay * policy.factor).toLong, policy.maxDelay.toMillis)
          policy.onRetry()
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
