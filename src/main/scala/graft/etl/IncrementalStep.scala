package graft.etl

import java.time.Instant

import org.apache.spark.sql.DataFrame

import graft.state.{FilterResolver, StateStore}
import graft.state.StateStore._

/** s6_step_driver: the generic incremental paged step executor
  * (`executar_etapa_paginada`, tiny_api_v2_cliente.py:324-375), driving the
  * full stateful loop:
  *
  *   ts_inicio := now (future watermark — START time, ref :326)
  *   filter    := s4 decision tree (FilterResolver)
  *   page0     := s5 init/resume (same filter + EM_ANDAMENTO/ERRO resumes at
  *                saved+1, ref :194-196; new filter or CONCLUIDO resets,
  *                ref :190-193)
  *   loop page ≤ maxPages (ref MAX_PAGINAS_POR_ETAPA=10000 :50,:345):
  *     fetch page → fail ⇒ status ERRO, abort (ref :350-353,372-373)
  *     sink(page batch)  — per-page commit (ref :352-353)
  *     progress upsert (running record count, ref :205-215)
  *     page ≥ total ⇒ CONCLUIDO + watermark := ts_inicio (ref :360-363)
  *   budget exhausted ⇒ EM_ANDAMENTO, next run resumes (ref :368-370)
  */
object IncrementalStep {

  /** One fetched page: the batch plus the API-reported total page count. */
  case class FetchedPage(batch: DataFrame, totalPages: Int)

  /** Outcome mirrors the reference's terminal states. */
  sealed trait Outcome
  case class Completed(pages: Int, records: Long) extends Outcome
  case class BudgetExhausted(lastPage: Int, records: Long) extends Outcome
  case class Failed(atPage: Int, reason: String) extends Outcome

  def run(store: StateStore,
          process: String,
          fetchPage: (Instant, Int) => Either[String, Option[FetchedPage]],
          sink: DataFrame => Long,
          now: Instant,
          maxDataDate: => Option[Instant] = None,
          maxPages: Int = 10000,
          fixedWindowDays: Option[Int] = None): Outcome = {

    val tsInicio = now // future watermark: START time, never end time
    val res = FilterResolver.resolve(store, process, maxDataDate, now,
      fixedWindowDays)
    val filterStr = res.filter.toString

    // s5 init/resume
    val startPage = store.getProgress(process) match {
      case Some(p) if p.filter == filterStr &&
          (p.status == StatusRunning || p.status == StatusError) =>
        p.page + 1 // resume (ref :194-196)
      case _ =>
        store.upsertProgress(Progress(process, filterStr, 0, 0, 0L,
          StatusPending)) // reset (ref :190-193)
        1
    }
    var records = store.getProgress(process)
      .filter(_.filter == filterStr).map(_.records).getOrElse(0L)

    // budget counts pages processed THIS RUN (ref paginas_processadas_
    // execucao :345) — bounding the absolute page number instead would
    // make a resume past maxPages a permanent no-op stall
    var pagesThisRun = 0
    var page = startPage
    while (pagesThisRun < maxPages) {
      fetchPage(res.filter, page) match {
        case Left(err) =>
          // progress tracks pages successfully PROCESSED: the failed page
          // itself is retried on resume (saved+1, ref :194-196)
          store.upsertProgress(Progress(process, filterStr, page - 1, 0,
            records, StatusError))
          return Failed(page, err)
        case Right(None) | Right(Some(FetchedPage(_, 0))) =>
          // empty result set: complete immediately (ref :360 total==0)
          store.upsertProgress(Progress(process, filterStr, page, 0, records,
            StatusDone))
          store.setWatermark(process, tsInicio) // unconditional, ref :363
          return Completed(pagesThisRun, records)
        case Right(Some(FetchedPage(batch, totalPages))) =>
          records += sink(batch) // per-page transactional commit analog
          pagesThisRun += 1
          store.upsertProgress(Progress(process, filterStr, page, totalPages,
            records, StatusRunning))
          if (page >= totalPages) {
            store.upsertProgress(Progress(process, filterStr, page, totalPages,
              records, StatusDone))
            store.setWatermark(process, tsInicio) // unconditional, ref :363
            return Completed(pagesThisRun, records)
          }
          page += 1
      }
    }
    // page budget exhausted: stay EM_ANDAMENTO, resume next run (ref :368-370)
    BudgetExhausted(page - 1, records)
  }
}
