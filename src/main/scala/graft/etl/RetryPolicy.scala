package graft.etl

import scala.annotation.tailrec

/** src_retry_backoff + f4_required_env (SURVEY.md §2.1/§2.3): the ingest
  * client's retry/backoff protocol (tiny_api_v2_cliente.py:225-302) as a
  * pure, clock-injected policy — a driver-side concern, deliberately NOT a
  * DataFrame op (inside jobs, Spark task retry covers failures).
  *
  * Reference semantics preserved:
  *  - ≤3 retries, exponential backoff 2 s doubling, capped at 30 s
  *    (ref :231-236)
  *  - HTTP 429 → fixed 30 s wait (RETRY_DELAY_429, ref :48,:290)
  *  - other 4xx → abort, no retry (ref :291)
  *  - network errors → retry (ref :292-295)
  *  - API codigo "35" → forced retry (ref :268-270)
  *  - API codigo "2" (bad token) → fatal, stop immediately (ref :272)
  */
object RetryPolicy {

  sealed trait Failure
  case class Http(status: Int) extends Failure
  case object NetworkError extends Failure
  case class ApiCodigo(code: String) extends Failure

  val MaxRetries = 3            // ref :225
  val InitialBackoffSec = 2     // ref :231
  val BackoffCapSec = 30        // ref :236
  val Delay429Sec = 30          // ref :48

  /** Should attempt N+1 happen after `failure`, and after what delay? */
  def nextDelay(failure: Failure, attempt: Int): Option[Int] =
    if (attempt >= MaxRetries) None
    else failure match {
      case Http(429) => Some(Delay429Sec)
      case Http(s) if s >= 400 && s < 500 => None // 4xx: abort (ref :291)
      case Http(_) => Some(expBackoff(attempt))   // 5xx: retry
      case NetworkError => Some(expBackoff(attempt))
      case ApiCodigo("2") => None                 // fatal bad token
      case ApiCodigo("35") => Some(expBackoff(attempt))
      case ApiCodigo(_) => None
    }

  /** 2 s doubling per attempt, capped at 30 s: 2, 4, 8, ..., ≤30. */
  def expBackoff(attempt: Int): Int =
    math.min(InitialBackoffSec * math.pow(2, attempt.toDouble).toInt,
      BackoffCapSec)

  /** Run `op` under the policy. `sleep` is injected for testability. */
  def retrying[A](op: Int => Either[Failure, A],
                  sleep: Int => Unit = s => Thread.sleep(s * 1000L)): Either[Failure, A] = {
    @tailrec def loop(attempt: Int): Either[Failure, A] =
      op(attempt) match {
        case Right(a) => Right(a)
        case Left(f) =>
          nextDelay(f, attempt) match {
            case Some(delay) => sleep(delay); loop(attempt + 1)
            case None => Left(f)
          }
      }
    loop(0)
  }

  /** f4_required_env (ref :311-315): validate required configuration,
    * reporting ALL missing keys at once like the reference's
    * list-comprehension check. */
  def requireConfig(config: Map[String, String], required: Seq[String]): Unit = {
    val missing = required.filter(k =>
      config.get(k).forall(_.trim.isEmpty))
    require(missing.isEmpty,
      s"missing required config: ${missing.mkString(", ")}")
  }
}
