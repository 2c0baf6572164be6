package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt politeness filter (RFC 9309 / REP class): the crawl-lane
  * stage the front door runs between URL dedup and fetch/curation —
  * parse each host's robots.txt into an allow/disallow rule relation,
  * then annotate a URL table with whether this crawler's agent may fetch
  * each path. Ref: hadoop-gis has no crawl lane; this extends the WARC
  * front door (WarcSource → UrlCurate → Robots → Boilerplate).
  *
  * Semantics implemented (the widely-deployed subset):
  *   - records: one or more `User-agent:` lines followed by
  *     `Allow:`/`Disallow:` lines; `#` starts a comment anywhere; keys
  *     are case-insensitive; unknown keys (Crawl-delay, Sitemap, ...)
  *     are ignored without breaking the record
  *   - group selection: if ANY record on the host names this agent's
  *     product token (case-insensitive, first whitespace-delimited token
  *     of the User-agent value), the union of those records' rules
  *     applies and every `*` record is ignored — including the case
  *     where the named records carry zero rules (an explicit allow-all);
  *     otherwise the union of the `*` records applies
  *   - rule paths support the de-facto wildcards: `*` matches any run of
  *     characters, a trailing `$` anchors the end; everything else is a
  *     literal prefix match
  *   - precedence: the longest matching rule path wins (octet length of
  *     the raw rule value, the documented Google tie rule); on equal
  *     length Allow beats Disallow; no matching rule → allowed; host
  *     with no robots.txt (absent from the relation) or an empty/
  *     rule-free file → everything allowed
  *   - an empty rule value (`Disallow:` with nothing after it) is the
  *     traditional allow-all and contributes no rule; rules appearing
  *     before the first `User-agent:` line belong to no record and are
  *     dropped (RFC: rules outside a group are invalid)
  *
  * Shape at 100 TB: parsing is an explode + one window over `host` —
  * each window partition is one robots.txt's lines (bounded by file
  * size, never by corpus size). The compiled rule relation is one row
  * per (host, rule) — a few rules per host — so [[annotateAllowed]]
  * folds it to one array row per host and BROADCASTS it: the URL table
  * is annotated in a single scan-local pass, no shuffle, no fanout, no
  * window over the corpus. The per-row match is a built-in `filter` HOF
  * over the rank-sorted rule array (first match = highest precedence),
  * with `LIKE ... ESCAPE` doing the wildcard work — SQL-replayable
  * bit-for-bit from the checkpointed rule relation.
  */
object Robots {

  /** Parse robots.txt bodies into the compiled rule relation:
    * `(host, rule ∈ {allow,disallow}, prefix, prec, rank, like_pat)`
    * holding exactly the rules that apply to `agent` on each host.
    * `prec` is the rule path's octet length, `rank = 2·prec + (rule=allow)`
    * (higher rank = higher precedence, allow wins length ties), and
    * `like_pat` is the LIKE-translation of the path (`%`/`_`/`\`
    * escaped with `\`, `*` → `%`, trailing `$` anchors, else a trailing
    * `%`). Null robots text parses as an empty file. */
  def parseRules(robots: DataFrame, hostCol: String, textCol: String,
                 agent: String): DataFrame = {
    require(agent.nonEmpty && agent != "*",
      "parseRules: agent must be a concrete product token, not '*'")
    val lines = robots.select(
      col(hostCol).as("host"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("pos", "raw")))
    // comment strip + key/value split; a line with no ':' is not a
    // directive (k stays null and the isin filter drops it). RFC 9309
    // lines end CRLF and whitespace around ':' may be HTAB — a bare
    // trim() strips only spaces, which would leave '\r' inside every
    // token/value of a CRLF file and silently disable the whole filter
    def ws(c: Column): Column = trim(c, " \t\r")
    val bare = when(instr(col("raw"), "#") > 0,
        col("raw").substr(lit(1), instr(col("raw"), "#") - 1))
      .otherwise(col("raw"))
    val kv = lines.select(col("host"), col("pos"),
        when(instr(bare, ":") > 0,
          lower(ws(substring_index(bare, ":", 1)))).as("k"),
        when(instr(bare, ":") > 0,
          ws(bare.substr(instr(bare, ":") + 1, length(bare)))).as("v"))
      .where(col("k").isin("user-agent", "allow", "disallow"))
    // record assignment: a user-agent line opens a new record unless the
    // previous directive line was also user-agent (consecutive UA lines
    // share one record); the window partition is ONE robots file's lines
    val w = Window.partitionBy("host").orderBy("pos")
    val isUa = col("k") === "user-agent"
    val opens = (isUa && !coalesce(lag(isUa, 1).over(w), lit(false)))
    val grouped = kv.withColumn("grp", sum(opens.cast("int")).over(w))
      .where(col("grp") >= 1) // rules before any user-agent line: invalid
    // which records apply: named-agent records if any exist on the host
    // (even rule-free ones — an explicit allow-all), else the `*` records
    val tok = lower(substring_index(translate(col("v"), "\t", " "), " ", 1))
    val records = grouped.where(isUa).groupBy("host", "grp").agg(
      max((tok === lit(agent.toLowerCase)).cast("int")).as("m_specific"),
      max((tok === "*").cast("int")).as("m_star"))
    val hostHasSpecific = records.groupBy("host")
      .agg(max(col("m_specific")).as("any_specific"))
    val selected = grouped
      .where((col("k") === "allow" || col("k") === "disallow") &&
        length(col("v")) > 0)
      .join(records, Seq("host", "grp"))
      .join(hostHasSpecific, Seq("host"))
      .where(when(col("any_specific") === 1, col("m_specific") === 1)
        .otherwise(col("m_star") === 1))
    // LIKE translation: escape LIKE metacharacters with `\`, then map the
    // robots `*` wildcard to `%`; a trailing `$` anchors (no trailing %)
    val esc = replace(replace(replace(col("v"),
      lit("\\"), lit("\\\\")), lit("%"), lit("\\%")), lit("_"), lit("\\_"))
    val star = replace(esc, lit("*"), lit("%"))
    val pat = when(star.endsWith("$"),
        star.substr(lit(1), length(star) - 1))
      .otherwise(concat(star, lit("%")))
    // precedence = OCTET length of the raw rule value (the documented
    // Google/RFC tie rule) — char length would mis-rank multi-byte paths
    selected.select(col("host"), col("k").as("rule"), col("v").as("prefix"),
        octet_length(col("v")).as("prec"),
        (octet_length(col("v")) * 2 +
          (col("k") === "allow").cast("int")).as("rank"),
        pat.as("like_pat"))
      .distinct() // duplicate rule lines carry no extra information
  }

  /** Annotate `urls` with `robots_allowed`: one broadcast of the
    * host-folded rule arrays, one scan-local pass over the URL table —
    * the corpus never shuffles. The match picks the first element of the
    * rank-descending rule array whose pattern matches the path; no match
    * (or no robots for the host) → allowed. `pathCol` is matched as
    * given — pass path+query if query matching is wanted. */
  def annotateAllowed(urls: DataFrame, hostCol: String, pathCol: String,
                      rules: DataFrame,
                      outCol: String = "robots_allowed"): DataFrame = {
    Seq(outCol, "__rhost", "__rules", "__hit").foreach { c =>
      require(!urls.columns.contains(c),
        s"annotateAllowed: urls already has a '$c' column " +
          "(reserved for the robots match)") }
    val sets = rules.groupBy(col("host").as("__rhost"))
      .agg(reverse(sort_array(collect_list(
        struct(col("rank"), col("rule"), col("like_pat"))))).as("__rules"))
    val verdict = coalesce(
      col("__hit.rule") === "allow", lit(true)).as(outCol)
    urls.join(broadcast(sets), col(hostCol) === col("__rhost"), "left")
      // first matching rule in rank-desc order = the rule that governs;
      // get() is OOB-null-safe where arr[0]/element_at throw under ANSI
      .withColumn("__hit", expr(
        s"get(filter(__rules, r -> `$pathCol` LIKE r.like_pat ESCAPE '\\\\'), 0)"))
      .withColumn(outCol, verdict)
      .drop("__rhost", "__rules", "__hit")
  }

  /** Host of a canonical http(s) URL ([[UrlCurate.canonicalizeUrl]]
    * output): authority up to the first `/`, explicit port dropped —
    * robots.txt governs per host regardless of port spelling. */
  def hostOf(urlCanon: Column): Column =
    substring_index(substring_index(
      substring_index(urlCanon, "://", -1), "/", 1), ":", 1)

  /** Path+query of a canonical http(s) URL (`/` for a bare authority) —
    * the string robots rules match against. */
  def pathOf(urlCanon: Column): Column = {
    val rest = substring_index(urlCanon, "://", -1)
    when(instr(rest, "/") > 0,
      rest.substr(instr(rest, "/"), length(rest))).otherwise(lit("/"))
  }

  /** Keep only the fetchable rows (the filter form of
    * [[annotateAllowed]]; original projection preserved). */
  def filterAllowed(urls: DataFrame, hostCol: String, pathCol: String,
                    rules: DataFrame): DataFrame = {
    val out = "__robots_allowed"
    annotateAllowed(urls, hostCol, pathCol, rules, out)
      .where(col(out)).drop(out)
  }
}
