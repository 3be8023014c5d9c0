package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] PII / identifier scrubbing — the redaction pass every
  * training-data pipeline runs before text leaves the trust boundary:
  * emails, phone-shaped numbers, and residual numeric identifiers are
  * replaced with typed placeholder tags, with per-row counts of what was
  * redacted kept for audit.
  *
  * Redaction is applied in precedence order (email, then phone, then bare
  * digit run) on the string as rewritten by the previous stage, so a
  * digit that is part of an email or phone is never double-counted as an
  * id. Counts are taken from the same intermediate strings, making
  * (n_emails, n_phones, n_ids) an exact audit of the placeholders
  * inserted.
  *
  * Scale shape: pure row-local regex work in a single scan-project —
  * whole-stage codegen, no shuffle (the final ORDER BY is presentation
  * only). The fixture's `events.props` JSON exercises the digit-run path
  * end-to-end against the oracle; the email/phone paths are pinned by
  * ExtSpec on crafted rows (the fixture contains no emails by
  * construction, which the spec proves rather than assumes).
  *
  * The regexes stay inside the dialect intersection of Java regex (Spark)
  * and RE2 (DuckDB): character classes, bounded repetition, no
  * backreferences or lookaround.
  */
object Redact {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?\\d{3}[- ]?\\d{3,4}[- ]?\\d{4}"
  private val IdRe = "\\d+"

  /** (scrubbed, n_emails, n_phones, n_ids) staged columns over `raw`. */
  private[graft] def stages(raw: Column): (Column, Column, Column, Column) = {
    val noEmail = regexp_replace(raw, EmailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRe, "<PHONE>")
    val clean = regexp_replace(noPhone, IdRe, "<ID>")
    (clean,
      regexp_count(raw, lit(EmailRe)).cast("long"),
      regexp_count(noEmail, lit(PhoneRe)).cast("long"),
      regexp_count(noPhone, lit(IdRe)).cast("long"))
  }

  /** Scrub `events.props`: typed placeholders in, audit counts out. */
  val piiScrub: Q = Q(
    "ext_pii_scrub",
    s"""WITH s AS (
       |  SELECT event_id, props,
       |    regexp_replace(props, '$EmailRe', '<EMAIL>', 'g') AS no_email
       |  FROM events),
       |p AS (
       |  SELECT event_id, props, no_email,
       |    regexp_replace(no_email, '$PhoneRe', '<PHONE>', 'g') AS no_phone
       |  FROM s)
       |SELECT event_id,
       |  regexp_replace(no_phone, '$IdRe', '<ID>', 'g') AS props_scrubbed,
       |  len(regexp_extract_all(props, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(no_email, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all(no_phone, '$IdRe')) AS n_ids
       |FROM p ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val (clean, nEmails, nPhones, nIds) = stages(col("props"))
    Tables.events(s, d)
      .select(col("event_id"), clean.as("props_scrubbed"),
        nEmails.as("n_emails"), nPhones.as("n_phones"), nIds.as("n_ids"))
      .orderBy("event_id")
  }

  /** k-anonymity audit (Sweeney IJUFKS'02, the release-gate census):
    * group the person-level table by a QUASI-IDENTIFIER set — here
    * (nation, market segment, account-balance band of 1000) on
    * `customer`, the classic coarse-demographics + binned-numeric QI
    * shape — and report the k-distribution: how many QI groups (and how
    * many ROWS) sit at k = 1 (unique — directly re-identifiable), 2-4,
    * 5-9, and 10+. A training-data release policy reads this row the
    * way a load gate reads `ext_dq_audit`: rows in the low buckets must
    * be suppressed or generalized before user-joined data leaves the
    * trust boundary.
    *
    * Scale shape: one map-side-combined QI aggregate (the group frame is
    * QI-cardinality-sized, never row-sized) + one 4-row bucket rollup —
    * exact BIGINT counts throughout; the band edge uses FLOOR on the
    * same IEEE division both engines evaluate identically. */
  val kanonAudit: Q = Q(
    "ext_privacy_kanon",
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CASE WHEN k = 1 THEN '1' WHEN k < 5 THEN '2-4'
      |            WHEN k < 10 THEN '5-9' ELSE '10+' END AS k_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(k) AS BIGINT) AS n_rows,
      |  CAST(MIN(k) AS BIGINT) AS min_k,
      |  CAST(MAX(k) AS BIGINT) AS max_k
      |FROM g GROUP BY 1 ORDER BY k_bucket""".stripMargin
  ) { (s, d) =>
    val groups = Tables.load(s, d, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"))
    groups.groupBy(
        when(col("k") === 1, "1").when(col("k") < 5, "2-4")
          .when(col("k") < 10, "5-9").otherwise("10+").as("k_bucket"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("k")).cast("long").as("n_rows"),
        min(col("k")).cast("long").as("min_k"),
        max(col("k")).cast("long").as("max_k"))
      .orderBy("k_bucket")
  }

  val all: Seq[Q] = Seq(piiScrub, kanonAudit)
}
