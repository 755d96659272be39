package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.RetryPolicy
import graft.etl.RetryPolicy._

/** src_retry_backoff goldens (reference constants :47-48,:225,:231-236). */
class RetryPolicySpec extends AnyFunSuite {

  test("backoff doubles from 2 s and caps at 30 s") {
    assert((0 to 5).map(expBackoff) === Seq(2, 4, 8, 16, 30, 30))
  }

  test("429 gets the fixed 30 s delay") {
    assert(nextDelay(Http(429), 0) === Some(30))
    assert(nextDelay(Http(429), 2) === Some(30))
  }

  test("other 4xx aborts immediately; 5xx and network retry") {
    assert(nextDelay(Http(404), 0) === None)
    assert(nextDelay(Http(500), 1) === Some(4))
    assert(nextDelay(NetworkError, 0) === Some(2))
  }

  test("codigo 2 is fatal, codigo 35 forces retry") {
    assert(nextDelay(ApiCodigo("2"), 0) === None)
    assert(nextDelay(ApiCodigo("35"), 0) === Some(2))
  }

  test("retry budget is 3: the 4th failure is terminal") {
    assert(nextDelay(NetworkError, 3) === None)
  }

  test("retrying: succeeds after transient failures, sleeps per policy") {
    var sleeps = Vector.empty[Int]
    val result = retrying[String](
      attempt => if (attempt < 2) Left(NetworkError) else Right("ok"),
      sleep = sleeps :+= _)
    assert(result === Right("ok"))
    assert(sleeps === Vector(2, 4))
  }

  test("retrying: fatal failure short-circuits with no sleep") {
    var slept = false
    val result = retrying[String](_ => Left(ApiCodigo("2")), _ => slept = true)
    assert(result === Left(ApiCodigo("2")))
    assert(!slept)
  }

  test("f4: requireConfig reports all missing keys at once") {
    val e = intercept[IllegalArgumentException] {
      requireConfig(Map("A" -> "1", "B" -> " "), Seq("A", "B", "C"))
    }
    assert(e.getMessage.contains("B") && e.getMessage.contains("C"))
    requireConfig(Map("A" -> "1"), Seq("A")) // no throw
  }
}
