package graft.session

/** Debounced auto-save policy (`crates/tss-persistence/src/autosave/config.rs`).
  *
  * Two clocks race: a save fires once the study has been quiet for
  * `debounceMs` (each new change resets that timer), or unconditionally
  * once `maxDelayMs` has elapsed since the first unsaved change — so a
  * continuous edit stream can't postpone persistence forever.
  */
case class AutoSaveConfig(
    enabled: Boolean = true,
    debounceMs: Long = 2000L,
    maxDelayMs: Long = 30000L) {

  def shouldSave(sinceLastChangeMs: Long, sinceFirstUnsavedMs: Long): Boolean =
    enabled &&
      (sinceLastChangeMs >= debounceMs || sinceFirstUnsavedMs >= maxDelayMs)
}

object AutoSaveConfig {
  def disabled: AutoSaveConfig = AutoSaveConfig(enabled = false)
}

/** Unsaved-change tracking for debounced auto-save and a dirty indicator
  * (`crates/tss-persistence/src/autosave/tracker.rs`). Driver-side session
  * state, deliberately tiny and Spark-free.
  *
  * The clock is injected (milliseconds, monotonic preferred) so policy
  * decisions are unit-testable without sleeping; production callers use
  * the default `System.nanoTime`-based clock.
  */
final class DirtyTracker(clock: () => Long = DirtyTracker.monotonicMs) {
  private var dirty = false
  private var saving = false
  private var lastChange: Option[Long] = None
  private var firstUnsavedChange: Option[Long] = None

  def isDirty: Boolean = dirty
  def isSaving: Boolean = saving

  /** Record a mutation. The first change since the last successful save
    * also anchors the max-delay clock. */
  def markDirty(): Unit = {
    val now = clock()
    dirty = true
    lastChange = Some(now)
    if (firstUnsavedChange.isEmpty) firstUnsavedChange = Some(now)
  }

  def startSave(): Unit = saving = true

  def saveComplete(): Unit = {
    dirty = false
    saving = false
    firstUnsavedChange = None
  }

  /** A failed save stays dirty so the next tick retries. */
  def saveFailed(): Unit = saving = false

  def msSinceLastChange: Option[Long] = lastChange.map(clock() - _)
  def msSinceFirstUnsaved: Option[Long] = firstUnsavedChange.map(clock() - _)

  /** One auto-save tick: true when the policy says persist now. Never true
    * while a save is already in flight. */
  def shouldAutoSave(config: AutoSaveConfig): Boolean =
    dirty && !saving && config.enabled &&
      ((msSinceLastChange, msSinceFirstUnsaved) match {
        case (Some(l), Some(f)) => config.shouldSave(l, f)
        case _                  => false
      })
}

object DirtyTracker {
  /** Wall-clock-independent millisecond clock. */
  val monotonicMs: () => Long = () => System.nanoTime() / 1000000L
}
