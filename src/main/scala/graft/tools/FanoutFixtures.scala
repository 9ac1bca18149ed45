package graft.tools

import graft.streaming.Subscription

/** The canonical N-subscription mix used by BOTH the bench's
  * `streaming_fanout500` row and [[FanoutProfile]] — one definition so the
  * profile always decomposes exactly what the benchmark measures
  * (tag-contains, id-glob, table+tag conjunction, negation; 4-way cycle). */
object FanoutFixtures {
  private val Types = Seq("purchase", "view", "error", "signup")

  def subscriptionMix(n: Int): Seq[Subscription] = (1 to n).map { i =>
    val cond = i % 4 match {
      case 0 => s"""{..,"~tags":contains("${Types(i % Types.size)}")}"""
      // event keys are numeric user_id strings (EventLog.changes) — the
      // glob must anchor on a DIGIT or this whole quarter of the mix never
      // matches and the glob-match path goes unexercised by the bench
      // ("0*" stays as the one never-matching prefix: ids start at 1)
      case 1 => s"""intrinsic("~id":like("${i % 10}*"))"""
      case 2 => """and(intrinsic("~table":"events"),{..,"~tags":containsAny("error","view")})"""
      case _ => s"""not({..,"~tags":contains("${Types(i % Types.size)}")})"""
    }
    Subscription(s"sub$i", cond)
  }
}
