package graft.state

import java.time.temporal.ChronoUnit
import java.time.Instant

/** s3/s4/w3: the incremental-filter decision tree
  * (`determinar_data_filtro_inteligente`, tiny_api_v2_cliente.py:160-181 +
  * synthetic bootstrap :146-158 + estoques override :330-331).
  *
  * Pure function of (watermark, max data date, now) so every branch is
  * golden-testable; StateStore side effects happen in the thin `resolve`
  * wrapper. Semantics preserved bit-for-bit (SURVEY.md §7.4):
  *  - watermark exists → use it (already +1 s exclusive from s1), clamped
  *    to now−60 d (`DIAS_JANELA_SEGURANCA`, ref :49,:163-167)
  *  - no watermark but data exists → synthetic = max(data date) + 1 day @
  *    midnight UTC, persisted as the new watermark (ref :146-158,172-177)
  *  - neither → now−60 d (ref :179-181)
  *  - fixed-window processes (estoques) → always now−N d, no watermark
  *    involvement (ref :330-331, N=29)
  */
object FilterResolver {

  val SafetyWindowDays = 60 // DIAS_JANELA_SEGURANCA, ref :49

  sealed trait Source
  case object FromWatermark extends Source
  case object SyntheticFromData extends Source
  case object DefaultWindow extends Source
  case object FixedWindow extends Source

  case class Resolution(filter: Instant, source: Source,
                        persistSynthetic: Option[Instant])

  /** The pure decision tree. `watermarkExclusive` must already carry the
    * +1 s bound (StateStore.watermarkExclusive). */
  def decide(watermarkExclusive: Option[Instant],
             maxDataDate: Option[Instant],
             now: Instant,
             fixedWindowDays: Option[Int] = None,
             safetyWindowDays: Int = SafetyWindowDays): Resolution = {
    fixedWindowDays match {
      case Some(days) =>
        Resolution(now.minus(days.toLong, ChronoUnit.DAYS), FixedWindow, None)
      case None =>
        val floor = now.minus(safetyWindowDays.toLong, ChronoUnit.DAYS)
        (watermarkExclusive, maxDataDate) match {
          case (Some(wm), _) =>
            // w3 clamp: never look back more than the safety window
            val clamped = if (wm.isBefore(floor)) floor else wm
            Resolution(clamped, FromWatermark, None)
          case (None, Some(maxDate)) =>
            // s3 synthetic bootstrap: next midnight UTC after newest data
            val synthetic = maxDate.truncatedTo(ChronoUnit.DAYS)
              .plus(1, ChronoUnit.DAYS)
            Resolution(synthetic, SyntheticFromData, Some(synthetic))
          case (None, None) =>
            Resolution(floor, DefaultWindow, None)
        }
    }
  }

  /** Resolve against the store, persisting a synthetic watermark exactly
    * like the reference does (ref :176: the synthetic value is committed
    * before the step runs). */
  def resolve(store: StateStore, process: String,
              maxDataDate: => Option[Instant], now: Instant,
              fixedWindowDays: Option[Int] = None): Resolution = {
    val wm = if (fixedWindowDays.isDefined) None
             else store.watermarkExclusive(process)
    val res = decide(wm, if (wm.isDefined) None else maxDataDate, now,
      fixedWindowDays)
    res.persistSynthetic.foreach(ts => store.setWatermark(process, ts))
    res
  }
}
