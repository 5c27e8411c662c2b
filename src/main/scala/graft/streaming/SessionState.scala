package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-client chat-history state as a streaming operator (SURVEY.md §2.8):
  * the reference keeps history in a LangGraph `MemorySaver` checkpointer
  * keyed by client thread id (`src/server/agents/chatbot.py:371-372`,
  * replayed at `src/server/endpoints.py:718-738`; a new client id resets
  * state, `st_common.py:113-127`).
  *
  * Spark shape: `groupByKey(session).flatMapGroupsWithState` — each
  * incoming message updates the session's running history with the same
  * pop semantics as the batch [[graft.ops.Chat.cleanHistory]] (system
  * skipped, tool pops the previous surviving message), emits the current
  * history length, and a `reset` control message clears the state. State
  * lives in the streaming state store (checkpointed, partitioned by
  * session key — scales with sessions, not messages).
  */
object SessionState {

  case class Msg(session: String, seq: Long, role: String, content: String)
  case class HistoryState(messages: List[(Long, String, String)])
  case class SessionUpdate(session: String, historyLen: Int, lastSeq: Long)

  /** Apply one message batch to a session's history, reference pop
    * semantics. `reset` role clears (new-client-id behavior).
    */
  private[streaming] def applyMsgs(history: List[(Long, String, String)],
                                   msgs: Seq[Msg]): List[(Long, String, String)] =
    msgs.sortBy(_.seq).foldLeft(history) { (h, m) =>
      m.role match {
        case "reset"  => Nil
        case "system" => h
        case "tool"   => if (h.nonEmpty) h.init else h
        case _        => h :+ ((m.seq, m.role, m.content))
      }
    }

  /** Attach the stateful operator to a stream of messages. Emits one
    * [[SessionUpdate]] per (session, micro-batch).
    *
    * State hygiene at scale: an emptied history (reset / all popped) is
    * `state.remove()`d rather than stored as an empty entry — otherwise
    * the state store grows with all-time sessions, not live ones. Pass
    * `idleTimeout = Some("30 minutes")` to additionally expire idle
    * sessions by processing time (opt-in: with a timeout set, the
    * streaming engine schedules batches even without new data to fire
    * expirations, which makes `processAllAvailable`-style test drives
    * spin — production churny-session deployments want it on).
    */
  def track(messages: Dataset[Msg],
            idleTimeout: Option[String] = None): Dataset[SessionUpdate] = {
    implicit val stateEnc = Encoders.product[HistoryState]
    implicit val outEnc = Encoders.product[SessionUpdate]
    import messages.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    messages
      .groupByKey(_.session)
      .flatMapGroupsWithState[HistoryState, SessionUpdate](
        OutputMode.Append, timeoutConf) {
        (session: String, msgs: Iterator[Msg], state: GroupState[HistoryState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val current = state.getOption.map(_.messages).getOrElse(Nil)
            val next = applyMsgs(current, msgs.toSeq)
            if (next.isEmpty) state.remove()
            else {
              state.update(HistoryState(next))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            Iterator.single(SessionUpdate(session, next.length,
              next.lastOption.map(_._1).getOrElse(-1L)))
          }
      }
  }
}
