package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OIDC login-path operators (reference
  * `operations/src/register_or_get_oidc_user.rs` +
  * `operations/src/ensure_canonical_user_token_subject.rs` +
  * `core/src/structs/structs.rs:20-26` `oidc_subject_key`).
  *
  * These are the two operations every token-authenticated request crosses:
  * registration resolves an (issuer, sub) claim pair to a user — creating
  * one on first contact — and the canonical-subject check re-proves that
  * every subject a user document claims still points back at that user in
  * the subject index (us3's merge input shape).
  */
object Oidc {

  /** The structured subject key (`structs.rs:20-26`): JSON, NOT string
    * concatenation — `oidc_subject_key_avoids_delimiter_collisions` pins
    * that ("a:b","c") and ("a","b:c") must differ. serde_json escapes only
    * what JSON requires; the fixture alphabet is clean, so a literal
    * concat of the three fields in struct order reproduces it. */
  def subjectKey(issuer: org.apache.spark.sql.Column,
      sub: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("""{"kind":"oidc","issuer":""""), issuer,
      lit("""","sub":""""), sub, lit("\"}"))

  /** Literal twin of [[subjectKey]] for fixture construction. */
  def subjectKeyStr(issuer: String, sub: String): String =
    s"""{"kind":"oidc","issuer":"$issuer","sub":"$sub"}"""

  /** Register-or-get fold (`register_or_get_oidc_user.rs:154-345`).
    *
    *  - subject-index HIT → the existing user is read and returned
    *    (adopt): `announce` false, no admin outbox drain
    *    (`handle_commit_txn` `:345-355`);
    *  - MISS → a user is created under the request's fresh user_id with
    *    `subject_ids = [subject_key]`, the index + claims rows are
    *    written, and the commit schedules the outbox drain
    *    (`announce` true);
    *  - batch fold: requests are transactionally sequential, so two
    *    requests carrying the SAME claim pair resolve first-wins — the
    *    first creates, every later one observes the just-written index
    *    row and adopts the FIRST request's user_id (the cb1 shape).
    *
    * `requests(seq, req_id, issuer, sub, new_user_id)`;
    * `subjectIndex(subject_key, user_id)` — the maintained index keyspace.
    *
    * Scale: the subject index is corpus-scale — request subject keys
    * broadcast INTO it; the in-batch fold windows over batch-sized
    * subject-key groups. */
  def registerOrGet(requests: DataFrame, subjectIndex: DataFrame): DataFrame = {
    val keyed = requests.withColumn("subject_key",
      subjectKey(col("issuer"), col("sub")))
    val probe = keyed.select("subject_key").distinct()
    val hits = subjectIndex
      .join(broadcast(probe), Seq("subject_key"))
      .select(col("subject_key"), col("user_id").as("indexed_user"))
    val w = Window.partitionBy("subject_key").orderBy("seq")
    keyed
      .join(broadcast(hits), Seq("subject_key"), "left")
      .withColumn("nth", row_number().over(w))
      .withColumn("first_new", first("new_user_id").over(w))
      .select(
        col("req_id"),
        col("subject_key"),
        when(col("indexed_user").isNotNull || col("nth") > 1, "Adopted")
          .otherwise("Created").as("mode"),
        coalesce(col("indexed_user"),
          when(col("nth") > 1, col("first_new")),
          col("new_user_id")).as("user_id"),
        // only a create announces (schedules the admin outbox drain)
        (col("indexed_user").isNull && col("nth") === 1).as("announce"))
  }

  /** GetOidcUser point read (`operations/src/get_oidc_user.rs`): the bare
    * two-hop ladder — subject key → subject index (absent → UserNotFound,
    * `:137` `emit_read_existing_user`), indexed id → user record (absent →
    * UserNotFound as well: a DANGLING index row reads as not-found,
    * `:170` `emit_commit_txn`); both hits return the user document.
    *
    * `requests(req_id, issuer, sub)`; `subjectIndex(subject_key,
    * user_id)`; `users(user_id, display_name, created_at_ms)`.
    *
    * Scale: both keyspaces are corpus-scale — the batch's subject keys
    * broadcast INTO the index, then the indexed ids broadcast INTO users
    * (the Reads-batch shape: two point-probe joins, neither store
    * shuffles). */
  def getUsers(requests: DataFrame, subjectIndex: DataFrame,
      users: DataFrame): DataFrame = {
    val keyed = requests.withColumn("subject_key",
      subjectKey(col("issuer"), col("sub")))
    val hits = subjectIndex
      .join(broadcast(keyed.select("subject_key").distinct()),
        Seq("subject_key"))
      .select(col("subject_key"), col("user_id").as("indexed_user"))
    val userHits = users
      .join(broadcast(hits.select(col("indexed_user").as("user_id"))
        .distinct()), Seq("user_id"))
      .select(col("user_id").as("indexed_user"), col("display_name"),
        col("created_at_ms"), lit(true).as("found"))
    keyed
      .join(broadcast(hits), Seq("subject_key"), "left_outer")
      .join(broadcast(userHits), Seq("indexed_user"), "left_outer")
      .select(col("req_id"),
        when(coalesce(col("found"), lit(false)), "Ok")
          .otherwise("UserNotFound").as("verdict"),
        when(col("found"), col("indexed_user")).as("user_id"),
        when(col("found"), col("display_name")).as("display_name"),
        when(col("found"), col("created_at_ms")).cast("long")
          .as("created_at_ms"))
  }

  /** Canonical-subject walk (`ensure_canonical_user_token_subject.rs`):
    *
    *  1. user read: absent, or a stored id disagreeing with the key
    *     (corruption), → Unauthorized (`:106-117`);
    *  2. zero claimed subjects → Ok without any index read (`:121-123`);
    *  3. the claimed subjects are walked IN ORDER: an index row absent,
    *     or pointing at a DIFFERENT user, → Forbidden — the walk stops at
    *     the first failure (`:139-148`), so `n_checked` reports how many
    *     index reads the reference actually issued.
    *
    * `requests(req_id, user_id)`; `users(user_id, stored_id)`;
    * `userSubjects(user_id, ord, subject_key)` — the user document's
    * ordered subject list; `subjectIndex(subject_key, user_id)`.
    *
    * Scale: users/userSubjects/subjectIndex are corpus keyspaces — request
    * user ids broadcast into users and the subject list, and only the
    * probed users' subject keys probe the index; per-user folds run over
    * document-bounded subject lists (≤ a few claims). */
  def canonicalSubject(requests: DataFrame, users: DataFrame,
      userSubjects: DataFrame, subjectIndex: DataFrame): DataFrame = {
    val probeUsers = requests.select("user_id").distinct()
    val userHits = users.join(broadcast(probeUsers), Seq("user_id"))
      .select(col("user_id"), col("stored_id"))
    val subjHits = userSubjects.join(broadcast(probeUsers), Seq("user_id"))
    val idxHits = subjectIndex
      .join(broadcast(subjHits.select("subject_key").distinct()),
        Seq("subject_key"))
      .select(col("subject_key"), col("user_id").as("indexed_user"))

    // per-user walk fold: first failing ord (0-based) and the claim count
    val walk = subjHits
      .join(broadcast(idxHits), Seq("subject_key"), "left")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_subjects"),
        min(when(col("indexed_user").isNull ||
          col("indexed_user") =!= col("user_id"), col("ord")))
          .as("first_fail_ord"))

    requests
      .join(broadcast(userHits), Seq("user_id"), "left")
      .join(broadcast(walk), Seq("user_id"), "left")
      .select(
        col("req_id"),
        when(col("stored_id").isNull ||
          col("stored_id") =!= col("user_id"), "Unauthorized")
          .when(col("first_fail_ord").isNotNull, "Forbidden")
          .otherwise("Ok").as("verdict"),
        // reads issued: the walk stops AT the first failure
        when(col("stored_id").isNull ||
          col("stored_id") =!= col("user_id"), lit(null).cast("long"))
          .otherwise(coalesce(col("first_fail_ord") + 1,
            col("n_subjects"), lit(0L))).as("n_checked"))
  }
}
