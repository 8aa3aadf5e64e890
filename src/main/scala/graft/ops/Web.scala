package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table

/** §2j web-crawl URL surface — the stage-0 operators of a crawl corpus
  * build, upstream even of `extract_main_text`: URL canonicalization and
  * URL-level deduplication. A web-scale pipeline dedups its frontier and
  * its fetched corpus BY URL before any content op runs (the same page
  * fetched via `HTTP://WWW.x.com:80/a/?utm_source=feed#top` and
  * `http://www.x.com/a` must collapse), so the canonicalizer is the most
  * executed string op in the whole system and must be a pure scan-stage
  * projection.
  *
  * The demo keys plant a deterministic URL per document (doc-id
  * arithmetic, the `htmlStructured` discipline) with every variance the
  * normalizer undoes — scheme/host case, default ports, tracking params,
  * unsorted query params, trailing slashes, fragments — and with
  * RULE-PLANTED duplicate pairs (two raw URLs per decade canonicalize to
  * the same page), so both the normalization arithmetic and the dedup
  * keep-rule are exercised at every scale and fully hash-checked.
  */
object Web {

  /** Deterministic raw-URL planting over the documents corpus. Page
    * identity is `page_n`, with two planted duplicate-pair kinds per
    * score of docs: `{20k, 20k+1}` share page `20k` (an even/odd
    * STRADDLING pair — under the incremental key's parity split the odd
    * doc is a corpus dup) and `{20k+11, 20k+13}` share page `20k+11`
    * (an odd-only pair — a within-BATCH dup under the same split); all
    * other docs get their own page. Everything CANONICAL derives from
    * `page_n` (host label, path, kept query params), everything the
    * normalizer strips derives from `doc_id` (case variance, `:443`,
    * `utm_*` params, trailing slash, fragment) — so a pair's raw URLs
    * differ in every noisy dimension but canonicalize identically. Pure
    * in-row projection.
    */
  private[graft] def urlStructured(docs: DataFrame): DataFrame = {
    val pageN = when(col("doc_id") % 20 <= 1,
      col("doc_id") - col("doc_id") % 20)
      .when(col("doc_id") % 20 === 13, col("doc_id") - 2)
      .otherwise(col("doc_id"))
    docs.select(col("doc_id"), pageN.as("page_n"))
      .select(col("doc_id"), concat(
        when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
        lit("://"),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
        lit("s"), (col("page_n") % 7).cast(StringType),
        lit(".example.com"),
        when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/docs/page"), col("page_n").cast(StringType),
        when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")),
        {
          val params = concat_ws("&",
            when(col("doc_id") % 3 === 0, lit("utm_source=feed"))
              .otherwise(lit(null).cast(StringType)),
            when(col("page_n") % 4 === 0,
              concat(lit("b="), (col("page_n") % 9).cast(StringType)))
              .otherwise(lit(null).cast(StringType)),
            when(col("page_n") % 4 === 0, lit("a=1"))
              .otherwise(lit(null).cast(StringType)),
            when(col("doc_id") % 3 === 0, lit("utm_medium=rss"))
              .otherwise(lit(null).cast(StringType)))
          when(params === "", lit("")).otherwise(concat(lit("?"), params))
        },
        when(col("doc_id") % 4 === 1, lit("#sec2")).otherwise(lit("")))
        .as("url"))
  }

  /** URL CANONICALIZATION — in-row over any (…, url) frame: lowercase
    * scheme and host, strip the fragment, strip scheme-default ports
    * (`:80` http, `:443` https; explicit non-default ports survive),
    * drop tracking parameters (`utm_*`, `fbclid`, `gclid` — the
    * standard crawl blocklist), SORT the surviving query params (param
    * order is transport noise, not page identity), and strip a trailing
    * slash from non-root paths (an empty path serves as `/`). The path
    * itself keeps its case — URL paths are case-sensitive by spec.
    *
    * INPUT CONTRACT (ADVICE r13): absolute `scheme://host[:port]/path`
    * URLs with at most ONE trailing slash — the shape a crawl frontier
    * carries. Scheme-less input would canonicalize to `://host…` and a
    * doubled trailing slash (`/a//`) loses only one slash; a deployment
    * fronting messier feeds adds a pre-normalizer, it does not change
    * this canonicalizer.
    *
    * Scale shape: regex/string expressions plus one bounded in-row
    * param-list filter+sort — a zero-shuffle scan-stage projection
    * (PlanSpec-pinned), which is what lets a crawler run it on every
    * frontier URL.
    */
  def urlNormalizeOn(urls: DataFrame): DataFrame = {
    val noFrag = regexp_replace(col("url"), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?]+)", 1)
    val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portKept = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQ = regexp_replace(rest, "^[^/?]+", "")
    val path0 = regexp_extract(pathQ, "^([^?]*)", 1)
    val path = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(when(path0 === "", lit("/")).otherwise(path0))
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)=")))
    val qNorm = array_join(kept, "&")
    urls.withColumn("url_norm", concat(
      scheme, lit("://"), host, portKept, path,
      when(qNorm === "", lit("")).otherwise(concat(lit("?"), qNorm))))
  }

  /** MESSY-URL PRE-NORMALIZER — the tolerant stage-0 front of
    * [[urlNormalizeOn]]'s documented strict contract (ADVICE r13 made
    * the contract explicit; this closes the gap for real crawl feeds):
    *
    *  - surrounding whitespace trimmed;
    *  - scheme defaults: `//host/…` (protocol-relative) and bare
    *    `host/…` (scheme-less) both become `http://…` — the crawl
    *    default (a frontier cannot know https works before fetching);
    *  - one trailing FQDN dot stripped from the authority
    *    (`example.com.` ≡ `example.com`, port preserved);
    *  - slash RUNS in the path collapse to one (`/a//b///c` → `/a/b/c`;
    *    query/fragment untouched — `//` is legal data there);
    *  - percent-escape hex uppercases (`%2f` → `%2F`, RFC 3986 §2.1's
    *    canonical form) — only valid two-hex-digit escapes; a literal
    *    `%` followed by non-hex passes through.
    *
    * NOT handled here (a deployment adapter, not expression work): IDN
    * punycode conversion needs a real IDNA library on both the engine
    * and the oracle side — neither engine's SQL can express it, so a
    * unicode-host feed converts hosts BEFORE this stage via
    * [[idnHostsToAscii]] (the adapter made executable, r19 — JDK IDNA
    * as a typed per-partition map, suite-verified; no oracle twin by
    * construction).
    *
    * Scale shape: regex/string scan-stage expressions plus one bounded
    * in-row split/transform over the `%`-pieces — zero shuffle, same
    * class as the canonicalizer it fronts. Emits `url_pre` (satisfying
    * the strict contract) alongside the untouched input column.
    */
  def urlPrenormalizeOn(urls: DataFrame): DataFrame = {
    val t = trim(col("url"))
    val schemed = when(substring(t, 1, 2) === "//",
        concat(lit("http:"), t))
      .when(!t.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
        concat(lit("http://"), t))
      .otherwise(t)
    val prefix = regexp_extract(schemed,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val prefixFixed = regexp_replace(prefix, "\\.(:[0-9]+)?$", "$1")
    val rest = regexp_replace(schemed,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val pathFixed = regexp_replace(
      regexp_extract(rest, "^([^?#]*)", 1), "/{2,}", "/")
    val tail = regexp_replace(rest, "^[^?#]*", "")
    urls
      .withColumn("__graft_u2", concat(prefixFixed, pathFixed, tail))
      .withColumn("url_pre", expr(
        """CASE WHEN instr(__graft_u2, '%') = 0 THEN __graft_u2 ELSE
          |  concat(element_at(split(__graft_u2, '%', -1), 1),
          |    array_join(transform(
          |      slice(split(__graft_u2, '%', -1), 2,
          |        size(split(__graft_u2, '%', -1)) - 1),
          |      p -> concat('%',
          |        CASE WHEN substring(p, 1, 2) RLIKE '^[0-9a-fA-F]{2}$'
          |             THEN upper(substring(p, 1, 2))
          |             ELSE substring(p, 1, 2) END,
          |        substring(p, 3))), '')) END""".stripMargin))
      .drop("__graft_u2")
  }

  private val SchemePrefixRe = "^([A-Za-z][A-Za-z0-9+.-]*://)(.*)$".r

  /** One URL's authority host converted to its RFC 3490
    * ASCII-compatible (punycode) form — scheme prefix (or a
    * protocol-relative `//`), port and path/query/fragment untouched.
    * ASCII hosts take the identity fast path WITHOUT entering the IDNA
    * library (load-bearing: `IDN.toASCII` rejects shapes the strict
    * canonicalizer tolerates, e.g. a trailing FQDN dot's empty label —
    * ASCII feeds must pass through byte-identical). A unicode host the
    * JDK's IDNA rejects fails LOUDLY (the decodeImages corrupt-asset
    * policy: a malformed host in a crawl feed is a data bug to surface,
    * not a row to silently mangle).
    */
  private[graft] def idnToAsciiUrl(url: String): String = {
    val (prefix, tail) =
      if (url.startsWith("//")) ("//", url.substring(2))
      else url match {
        case SchemePrefixRe(s, rest) => (s, rest)
        case other => ("", other)
      }
    val cut = tail.indexWhere(c => c == '/' || c == '?' || c == '#')
    val authEnd = if (cut == -1) tail.length else cut
    val fullAuth = tail.substring(0, authEnd)
    val path = tail.substring(authEnd)
    // userinfo is not a host label: split on the LAST '@' (RFC 3986 —
    // the host starts after it) and convert only the host part, or a
    // unicode userinfo would be punycoded INTO the host (ADVICE r19)
    val atIdx = fullAuth.lastIndexOf('@')
    val (userinfo, auth) =
      if (atIdx >= 0) (fullAuth.substring(0, atIdx + 1),
        fullAuth.substring(atIdx + 1))
      else ("", fullAuth)
    val portIdx = auth.lastIndexOf(':')
    val (host, port) =
      if (portIdx >= 0 && portIdx < auth.length - 1 &&
          auth.substring(portIdx + 1).forall(_.isDigit))
        (auth.substring(0, portIdx), auth.substring(portIdx))
      else (auth, "")
    val asciiHost =
      if (host.forall(_ < 128)) host else java.net.IDN.toASCII(host)
    prefix + userinfo + asciiHost + port + path
  }

  /** IDN PUNYCODE ADAPTER — the one declared deployment stub of the URL
    * family made EXECUTABLE (r18 verdict, missing #4): convert unicode
    * authority hosts of a (doc_id, url) feed to their punycode ASCII
    * form so the feed satisfies [[urlPrenormalizeOn]] →
    * [[urlNormalizeOn]]'s strict host alphabet. This is JVM-library
    * work, not expression work — the reason it was declared an adapter:
    * IDNA's nameprep tables exist in neither engine's SQL, so there is
    * no DuckDB twin by construction — and it therefore runs as a typed
    * per-partition map (the [[Multimodal.decodeImages]] discipline for
    * library code) and is SUITE-verified against JDK-computed fixtures
    * plus a known ACE anchor. Idempotent (punycode hosts are ASCII and
    * take the identity path), so it composes safely in front of every
    * URL key whether or not the feed was already converted.
    *
    * Scale shape: in-row string work, zero shuffle — the same class as
    * the pre-normalizer it fronts.
    */
  def idnHostsToAscii(urls: DataFrame): DataFrame = {
    val spark2 = urls.sparkSession
    import spark2.implicits._
    urls.select(col("doc_id"), col("url"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, u) => (id, idnToAsciiUrl(u)) })
      .toDF("doc_id", "url")
  }

  /** Messy-URL plant for the graded key: the raw planted URLs re-messed
    * BY RULE with exactly the noise classes the pre-normalizer undoes —
    * all rows gain surrounding whitespace, then per residue class:
    * scheme stripped (doc_id % 4 = 0), protocol-relative plus a
    * trailing FQDN host dot (% 4 = 1), slash runs doubled in the path
    * (% 4 = 2), a lowercase percent-escape path segment planted
    * (% 4 = 3). Pure in-row string surgery; the twin applies the
    * identical surgery to the identical plant.
    */
  private[graft] def urlMessyStructured(docs: DataFrame): DataFrame = {
    val stripScheme =
      regexp_replace(col("url"), "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    urlStructured(docs).select(col("doc_id"), concat(lit("  "),
      when(col("doc_id") % 4 === 0, stripScheme)
        .when(col("doc_id") % 4 === 1,
          concat(lit("//"),
            regexp_replace(stripScheme, "^([^/:?#]+)", "$1.")))
        .when(col("doc_id") % 4 === 2,
          regexp_replace(col("url"), "/docs/", "//docs///"))
        .otherwise(regexp_replace(col("url"), "/docs/", "/docs%2fv1/")),
      lit(" ")).as("url"))
  }

  /** `url_normalize_messy` checked key: the messy plant through the
    * pre-normalizer into the strict canonicalizer — (doc_id, url_messy,
    * url_pre, url_norm), fully hash-checked (the twin re-messes the
    * plant, pre-normalizes, and canonicalizes with independent SQL).
    * Scheme-less rows canonicalize under the `http` default, so their
    * url_norm differs from the clean plant's `https` — deterministic,
    * and exactly what a crawler records for a scheme-less feed.
    */
  def urlNormalizeMessy(spark: SparkSession, sfDir: String): DataFrame = {
    val pre = urlPrenormalizeOn(
      urlMessyStructured(table(spark, sfDir, "documents")))
    urlNormalizeOn(pre
        .select(col("doc_id"), col("url").as("url_messy"),
          col("url_pre").as("url")))
      .select(col("doc_id"), col("url_messy"), col("url").as("url_pre"),
        col("url_norm"))
      .orderBy(col("doc_id"))
  }

  /** URL-LEVEL DEDUP — the family keep-min rule on the canonical URL:
    * one survivor per `url_norm` (lowest doc_id), with the variant count
    * kept as the census signal a frontier scheduler reads. One shuffle
    * keyed on the canonical string; survivors only.
    */
  def dedupUrlOn(urls: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url_norm"))
    val n = urlNormalizeOn(urls)
      .withColumn("n_variants", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
    n.filter(col("rn") === 1)
      .select(col("doc_id"), col("url_norm"), col("n_variants"))
  }

  /** `url_normalize` checked key: the canonicalizer over the planted
    * corpus — (doc_id, url, url_norm), fully hash-checked (the twin
    * replants the same URLs and normalizes them with independent SQL
    * string arithmetic).
    */
  def urlNormalize(spark: SparkSession, sfDir: String): DataFrame =
    urlNormalizeOn(urlStructured(table(spark, sfDir, "documents")))
      .orderBy(col("doc_id"))

  /** Graded blocklist: domain rules (exact host OR any subdomain — the
    * adblock/C4 semantics; `s3`/`s5` fire the SUBDOMAIN branch against
    * the planted `www.`-hosts, `www.s6.example.com` the EXACT branch)
    * and one canonical-URL prefix rule.
    */
  val BlockedDomains = Seq("s3.example.com", "s5.example.com",
    "www.s6.example.com")
  val BlockedPrefixes = Seq("https://www.s4.example.com/docs/page11")

  /** URL BLOCKLIST — the stage-0 crawl deny-list gate (C4/CCNet drop
    * entire domains before fetching a byte; RefinedWeb's URL filtering
    * stage): canonicalize, then match DOMAIN rules (exact host or any
    * subdomain, first match wins in list order) and canonical-URL
    * PREFIX rules (domain rules take priority). Emits every URL with
    * its verdict and the firing rule — the measuring+acting pair in one
    * frame; callers filter `blocked = 0` to act.
    *
    * Scale shape: zero shuffle — normalization and both rule kinds are
    * scan-stage expressions; a seed-list-sized blocklist (thousands of
    * rules) compiles into the plan exactly like this literal fold, and
    * a mega-blocklist (millions of domains) switches the DOMAIN branch
    * to a broadcast join on the host's registrable suffix — the
    * `mix_sample` literal→frame graduation, documented not built.
    */
  def urlBlocklistOn(urls: DataFrame, domains: Seq[String],
      prefixes: Seq[String]): DataFrame = {
    require(domains.nonEmpty || prefixes.nonEmpty, "empty blocklist")
    val norm = urlNormalizeOn(urls)
    val host = regexp_extract(col("url_norm"),
      "^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)
    val hits =
      domains.map(d => when(host === d || host.endsWith("." + d),
        lit(s"domain:$d"))) ++
      prefixes.map(p => when(col("url_norm").startsWith(p),
        lit(s"prefix:$p")))
    norm
      .withColumn("rule", coalesce(hits: _*))
      .select(col("doc_id"), col("url_norm"),
        when(col("rule").isNotNull, 1).otherwise(0).as("blocked"),
        col("rule"))
  }

  /** `url_blocklist` checked key: [[urlBlocklistOn]] with the graded
    * rules over the planted corpus.
    */
  def urlBlocklist(spark: SparkSession, sfDir: String): DataFrame =
    urlBlocklistOn(urlStructured(table(spark, sfDir, "documents")),
      BlockedDomains, BlockedPrefixes)
      .orderBy(col("doc_id"))

  /** `dedup_url` checked key: keep-min per canonical URL over the same
    * planted corpus. The planted pairs make the keep rule non-vacuous at
    * every scale: each score's `{20k, 20k+1}` and `{20k+11, 20k+13}`
    * docs canonicalize pairwise to one page (n_variants 2, the lower doc
    * survives), everything else is a singleton.
    */
  def dedupUrl(spark: SparkSession, sfDir: String): DataFrame =
    dedupUrlOn(urlStructured(table(spark, sfDir, "documents")))
      .orderBy(col("doc_id"))

  /** CANONICAL-URL CENSUS — the maintained corpus-side state of
    * incremental URL dedup: `(url_norm, n_variants, min_doc)`. An
    * ADDITIVE sketch: censuses over disjoint document sets merge by
    * summing `n_variants` and taking the min of `min_doc` per
    * `url_norm` (suite-pinned law), so a production frontier maintains
    * it as a running table — append each crawl batch's census, compact
    * by sum/min — without ever re-reading the corpus. Canonical-string
    * rows only; no payloads.
    */
  def urlCensus(urls: DataFrame): DataFrame =
    urlNormalizeOn(urls).groupBy(col("url_norm"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("min_doc"))

  /** INCREMENTAL URL DEDUP — the crawl-batch shape at URL granularity
    * (the frontier screen: completing the incremental family alongside
    * documents/lines/embeddings/images/semantic): a NEW batch of raw
    * URLs is canonicalized and screened against a MAINTAINED corpus
    * census ([[urlCensus]]) plus itself. A batch URL seen in the corpus
    * at all is `is_dup_corpus`; an unseen canonical URL keeps exactly
    * its min-doc batch variant, the rest are `is_dup_batch`. Because
    * corpus docs always predate the batch in the keep-min order, the
    * keep set is EXACTLY [[dedupUrlOn]]'s survivors over corpus ∪ batch
    * restricted to the batch (suite-pinned), computed without touching
    * corpus rows.
    *
    * Scale shape: the census table is canonical-string-sized and probed
    * with batch-census volume (at 100 TB: bucket it by `url_norm` once,
    * every batch probes shuffle-free); the within-batch window shuffles
    * batch rows only. Corpus cost per batch: a census probe, never a
    * corpus scan.
    */
  def dedupUrlIncrementalOn(corpusCensus: DataFrame, batch: DataFrame)
      : DataFrame = {
    val w = Window.partitionBy(col("url_norm"))
    val n = urlNormalizeOn(batch)
      .withColumn("n_batch", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
    n.join(corpusCensus
        .select(col("url_norm"), col("n_variants").as("n_corpus")),
        Seq("url_norm"), "left")
      .withColumn("n_corpus", coalesce(col("n_corpus"), lit(0L)))
      .withColumn("is_dup_corpus", col("n_corpus") > 0)
      .withColumn("is_dup_batch", !col("is_dup_corpus") && col("rn") > 1)
      .withColumn("keep", !col("is_dup_corpus") && col("rn") === 1)
      .select(col("doc_id"), col("url_norm"), col("n_corpus"),
        col("n_batch"), col("is_dup_corpus"), col("is_dup_batch"),
        col("keep"))
  }

  /** `dedup_url_incremental` checked key: the parity split (even doc_id
    * = existing corpus, odd = incoming batch — the `dedup_incremental`
    * convention). The planted pair kinds populate both dup branches at
    * every scale: straddling `{20k, 20k+1}` pairs make `20k+1` a corpus
    * dup; odd-only `{20k+11, 20k+13}` pairs keep `20k+11` and flag
    * `20k+13` as the batch dup.
    */
  def dedupUrlIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val all = urlStructured(table(spark, sfDir, "documents"))
    dedupUrlIncrementalOn(
      urlCensus(all.filter(col("doc_id") % 2 === 0)),
      all.filter(col("doc_id") % 2 === 1))
      .orderBy(col("doc_id"))
  }

  /** Registrable host of a canonical URL — the per-domain key every
    * crawl-politeness and cap rule groups by. In-row regex over
    * `url_norm` (scheme-lowercased by the normalizer, so the pattern
    * anchors on the canonical shape).
    */
  private def hostOf(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)

  /** Frozen per-host cap for the checked key — the C4/RefinedWeb
    * "max pages per domain" dial. 40 < docs-per-planted-host at every
    * harness sf (≥ ~64 at sf0.001's 500-doc floor ÷ 7 hosts), so the
    * cut is non-vacuous at every scale.
    */
  val HostCap = 40

  /** PER-HOST CAP — the C4/RefinedWeb anti-domination rule: keep at most
    * `k` documents per registrable host, chosen as a UNIFORM sample of
    * the host's pages rather than crawl order — rank within host by
    * `md5(host:doc_id)` (deterministic, engine-reproducible; doc_id
    * tiebreak), keep `host_rank <= k`. Ranking by hash is what makes the
    * cap a sample instead of a recency/discovery-order bias, and it
    * makes re-runs and backfills reproducible.
    *
    * Scale shape: one shuffle keyed on host; the rank-≤-k filter is a
    * group-limit Spark's InferWindowGroupLimit turns into MAP-SIDE
    * partial limiting (PlanSpec-pinned WindowGroupLimit), so a skewed
    * giant host never materializes more than k+ rows per map partition
    * before the exchange — the skew story is handled by the optimizer's
    * own partial top-k, the same physical shape as `window_top1`.
    */
  def capPerHostOn(urls: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    val w = Window.partitionBy(col("host"))
    urlNormalizeOn(urls)
      .withColumn("host", hostOf(col("url_norm")))
      .withColumn("ord",
        md5(concat(col("host"), lit(":"), col("doc_id").cast(StringType))))
      .withColumn("host_rank",
        row_number().over(w.orderBy(col("ord"), col("doc_id"))))
      .filter(col("host_rank") <= k)
      .select(col("doc_id"), col("host"), col("host_rank"))
  }

  /** `cap_per_host` checked key: [[capPerHostOn]] at [[HostCap]] over the
    * planted corpus (7 hosts ⇒ every host is over-cap at every sf).
    */
  def capPerHost(spark: SparkSession, sfDir: String): DataFrame =
    capPerHostOn(urlStructured(table(spark, sfDir, "documents")), HostCap)
      .orderBy(col("doc_id"))

  /** HOST STATS — the per-domain prioritization table a crawl scheduler
    * reads: document count, distinct canonical pages, duplicate-fetch
    * count (docs minus pages — wasted fetches), total and mean text
    * volume. One groupBy(host) with map-side partials; text volume
    * arrives via the documents join keyed on doc_id (at 100 TB both
    * sides are doc_id-bucketed, co-located). Mean is the exact BIGINT
    * total divided once as DOUBLE — one IEEE division of identical
    * operands, bit-stable across engines (the repo's avg discipline).
    */
  def hostStatsOn(urls: DataFrame, docs: DataFrame): DataFrame =
    urlNormalizeOn(urls)
      .withColumn("host", hostOf(col("url_norm")))
      .join(docs.select(col("doc_id"), length(col("text")).as("chars")),
        Seq("doc_id"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_pages"),
        (count(lit(1)) - countDistinct(col("url_norm")))
          .as("n_dup_fetches"),
        sum(col("chars").cast(LongType)).as("total_chars"),
        (sum(col("chars").cast(LongType)).cast(DoubleType) /
          count(lit(1))).as("mean_chars"))

  /** `host_stats` checked key over the planted corpus (7 hosts). */
  def hostStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = table(spark, sfDir, "documents")
    hostStatsOn(urlStructured(docs), docs).orderBy(col("host"))
  }

  /** SQL-literal / LIKE-pattern escaping for the rule→oracle generation
    * (ADVICE r14 — the escaping replaces the old require that rejected
    * legitimate underscored rules): quotes double per the SQL literal
    * rule; LIKE metacharacters (backslash, %, _) are escaped under
    * `ESCAPE '\'`, so a deny-list entry like `/user_profiles/` matches
    * itself literally in the generated twin instead of as a wildcard.
    * The runtime API accepts any rule string — only the SQL TEXT is
    * escaped; the matched values are unchanged.
    */
  private[graft] def sqlLit(s: String): String = s.replace("'", "''")
  private[graft] def likeLit(s: String): String =
    sqlLit(s).replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  /** Shared planting CTE for the twins — page identity + the raw URL,
    * mirrored from [[urlStructured]]'s arithmetic. Parameterized by the
    * source CTE/table so `corpus_pipeline`'s composed twin can plant over
    * its own base set.
    */
  private[graft] def plantSqlFrom(src: String): String =
    plantSqlP("", src)

  /** Prefixed plant: every CTE name (`p`/`u`/`norm`/`canon`) gets `pre`,
    * so two plants can coexist in one composed statement — the
    * incremental-pipeline twin plants the corpus and the batch side by
    * side (callers reference `${pre}canon`).
    */
  private[graft] def plantSqlP(pre: String, src: String): String =
    plantRawTemplate
      .replace("FROM documents)", s"FROM $src)")
      .replace("@", pre) + ",\n" + canonSqlFrom(pre, pre + "u")

  /** The normalizer CTE pair (`norm`/`canon`) over ANY `(doc_id, url)`
    * source — the canonicalization arithmetic shared by every URL twin,
    * including the messy-plant twin that canonicalizes its
    * PRE-normalized column instead of a raw plant.
    */
  private[graft] def canonSqlFrom(pre: String, src: String): String =
    canonTemplate
      .replace("@SRC", src)
      .replace("@", pre)

  private def plantSql: String = plantSqlP("", "documents")

  private val plantRawTemplate: String =
    """@p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 20 <= 1 THEN doc_id - doc_id % 20
      |         WHEN doc_id % 20 = 13 THEN doc_id - 2
      |         ELSE doc_id END AS page_n
      |  FROM documents),
      |@u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) ||
      |    '://' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END) ||
      |    's' || CAST(page_n % 7 AS VARCHAR) || '.example.com' ||
      |    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
      |    '/docs/page' || CAST(page_n AS VARCHAR) ||
      |    (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
      |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) ||
      |    (CASE WHEN doc_id % 4 = 1 THEN '#sec2' ELSE '' END) AS url
      |  FROM (
      |    SELECT doc_id, page_n,
      |      concat_ws('&',
      |        CASE WHEN doc_id % 3 = 0 THEN 'utm_source=feed' END,
      |        CASE WHEN page_n % 4 = 0
      |             THEN 'b=' || CAST(page_n % 9 AS VARCHAR) END,
      |        CASE WHEN page_n % 4 = 0 THEN 'a=1' END,
      |        CASE WHEN doc_id % 3 = 0 THEN 'utm_medium=rss' END) AS q
      |    FROM @p))""".stripMargin

  private val canonTemplate: String =
    """@norm AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS scheme,
      |    lower(regexp_replace(regexp_extract(rest, '^([^/?]+)', 1),
      |      ':[0-9]+$', '')) AS host,
      |    regexp_extract(regexp_extract(rest, '^([^/?]+)', 1),
      |      ':([0-9]+)$', 1) AS port,
      |    regexp_extract(regexp_replace(rest, '^[^/?]+', ''),
      |      '^([^?]*)', 1) AS path0,
      |    regexp_extract(regexp_replace(rest, '^[^/?]+', ''),
      |      '\?(.*)$', 1) AS query
      |  FROM (
      |    SELECT doc_id, url, nf,
      |      regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      |    FROM (SELECT doc_id, url,
      |            regexp_replace(url, '#.*$', '') AS nf FROM @SRC))),
      |@canon AS (
      |  SELECT doc_id, url,
      |    scheme || '://' || host ||
      |    (CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
      |               OR (scheme = 'http' AND port = '80')
      |          THEN '' ELSE ':' || port END) ||
      |    (CASE WHEN length(path0) > 1
      |          THEN regexp_replace(path0, '/$', '')
      |          WHEN path0 = '' THEN '/' ELSE path0 END) ||
      |    (CASE WHEN qn = '' THEN '' ELSE '?' || qn END) AS url_norm
      |  FROM (
      |    SELECT doc_id, url, scheme, host, port, path0,
      |      coalesce(array_to_string(list_sort(list_filter(
      |        string_split(query, '&'),
      |        x -> x <> '' AND NOT regexp_matches(x,
      |          '^(utm_[^=]*|fbclid|gclid)='))), '&'), '') AS qn
      |    FROM @norm))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "url_normalize" ->
      s"""WITH $plantSql
         |SELECT doc_id, url, url_norm FROM canon
         |ORDER BY doc_id""".stripMargin,
    // identical mess surgery over the identical plant, independent SQL
    // pre-normalization (scheme default / FQDN dot / slash runs /
    // percent case), then the shared canon CTEs over the PRE column
    "url_normalize_messy" -> {
      val strip = "regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
      s"""WITH $plantSql,
         |messy AS (
         |  SELECT doc_id, '  ' ||
         |    CASE WHEN doc_id % 4 = 0 THEN $strip
         |         WHEN doc_id % 4 = 1 THEN '//' || regexp_replace(
         |           $strip, '^([^/:?#]+)', '\\1.')
         |         WHEN doc_id % 4 = 2
         |           THEN regexp_replace(url, '/docs/', '//docs///', 'g')
         |         ELSE regexp_replace(url, '/docs/', '/docs%2fv1/', 'g')
         |    END || ' ' AS url_messy
         |  FROM u),
         |sch AS (
         |  SELECT doc_id, url_messy,
         |    CASE WHEN starts_with(t, '//') THEN 'http:' || t
         |         WHEN NOT regexp_matches(t,
         |             '^[A-Za-z][A-Za-z0-9+.-]*://') THEN 'http://' || t
         |         ELSE t END AS s
         |  FROM (SELECT doc_id, url_messy, trim(url_messy) AS t
         |        FROM messy)),
         |fx AS (
         |  SELECT doc_id, url_messy,
         |    regexp_replace(regexp_extract(s,
         |        '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1),
         |      '\\.(:[0-9]+)?$$', '\\1')
         |    || regexp_replace(regexp_extract(regexp_replace(s,
         |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
         |        '^([^?#]*)', 1), '/{2,}', '/', 'g')
         |    || regexp_replace(regexp_replace(s,
         |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
         |        '^[^?#]*', '') AS u2
         |  FROM sch),
         |mpre AS (
         |  SELECT doc_id, url_messy,
         |    CASE WHEN strpos(u2, '%') = 0 THEN u2 ELSE
         |      string_split(u2, '%')[1] ||
         |      array_to_string(list_transform(string_split(u2, '%')[2:],
         |        pp -> '%' ||
         |          CASE WHEN regexp_matches(substr(pp, 1, 2),
         |              '^[0-9a-fA-F]{2}$$')
         |            THEN upper(substr(pp, 1, 2))
         |            ELSE substr(pp, 1, 2) END
         |          || substr(pp, 3)), '')
         |    END AS url
         |  FROM fx),
         |${canonSqlFrom("m", "mpre")}
         |SELECT mp.doc_id, mp.url_messy, mc.url AS url_pre, mc.url_norm
         |FROM mpre mp JOIN mcanon mc USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // rules GENERATED from the same frozen lists as the Spark fold, so
    // the two sides cannot drift; coalesce order == list order priority
    "url_blocklist" -> {
      val cases =
        BlockedDomains.map(d =>
          s"""CASE WHEN host = '${sqlLit(d)}'
             |        OR host LIKE '%.${likeLit(d)}' ESCAPE '\\'
             |      THEN 'domain:${sqlLit(d)}' END""".stripMargin) ++
        BlockedPrefixes.map(p =>
          s"""CASE WHEN url_norm LIKE '${likeLit(p)}%' ESCAPE '\\'
             |      THEN 'prefix:${sqlLit(p)}' END""".stripMargin)
      s"""WITH $plantSql,
         |h AS (
         |  SELECT doc_id, url_norm,
         |    regexp_extract(url_norm,
         |      '^[a-z][a-z0-9+.-]*://([^/:?]+)', 1) AS host
         |  FROM canon),
         |v AS (
         |  SELECT doc_id, url_norm,
         |    coalesce(
         |${cases.mkString(",\n")}) AS rule
         |  FROM h)
         |SELECT doc_id, url_norm,
         |  CASE WHEN rule IS NOT NULL THEN 1 ELSE 0 END AS blocked, rule
         |FROM v ORDER BY doc_id""".stripMargin
    },
    "dedup_url" ->
      s"""WITH $plantSql
         |SELECT doc_id, url_norm, n_variants FROM (
         |  SELECT doc_id, url_norm,
         |    CAST(count(*) OVER (PARTITION BY url_norm) AS BIGINT)
         |      AS n_variants,
         |    row_number() OVER (PARTITION BY url_norm ORDER BY doc_id)
         |      AS rn
         |  FROM canon)
         |WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,
    "dedup_url_incremental" ->
      s"""WITH $plantSql,
         |corpus AS (
         |  SELECT url_norm, CAST(count(*) AS BIGINT) AS n_corpus
         |  FROM canon WHERE doc_id % 2 = 0 GROUP BY url_norm),
         |batch AS (
         |  SELECT doc_id, url_norm,
         |    CAST(count(*) OVER (PARTITION BY url_norm) AS BIGINT)
         |      AS n_batch,
         |    row_number() OVER (PARTITION BY url_norm ORDER BY doc_id)
         |      AS rn
         |  FROM canon WHERE doc_id % 2 = 1)
         |SELECT b.doc_id, b.url_norm,
         |  coalesce(c.n_corpus, 0) AS n_corpus, b.n_batch,
         |  (coalesce(c.n_corpus, 0) > 0) AS is_dup_corpus,
         |  (coalesce(c.n_corpus, 0) = 0 AND b.rn > 1) AS is_dup_batch,
         |  (coalesce(c.n_corpus, 0) = 0 AND b.rn = 1) AS keep
         |FROM batch b LEFT JOIN corpus c ON b.url_norm = c.url_norm
         |ORDER BY b.doc_id""".stripMargin,
    "cap_per_host" ->
      s"""WITH $plantSql,
         |hosted AS (
         |  SELECT doc_id,
         |    regexp_extract(url_norm,
         |      '^[a-z][a-z0-9+.-]*://([^/:?]+)', 1) AS host,
         |    url_norm
         |  FROM canon)
         |SELECT doc_id, host, host_rank FROM (
         |  SELECT doc_id, host,
         |    CAST(row_number() OVER (PARTITION BY host
         |      ORDER BY md5(host || ':' || CAST(doc_id AS VARCHAR)),
         |        doc_id) AS INTEGER) AS host_rank
         |  FROM hosted)
         |WHERE host_rank <= $HostCap
         |ORDER BY doc_id""".stripMargin,
    "host_stats" ->
      s"""WITH $plantSql,
         |hosted AS (
         |  SELECT c.doc_id,
         |    regexp_extract(c.url_norm,
         |      '^[a-z][a-z0-9+.-]*://([^/:?]+)', 1) AS host,
         |    c.url_norm, length(d.text) AS chars
         |  FROM canon c JOIN documents d ON c.doc_id = d.doc_id)
         |SELECT host,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT url_norm) AS BIGINT) AS n_pages,
         |  CAST(count(*) - count(DISTINCT url_norm) AS BIGINT)
         |    AS n_dup_fetches,
         |  CAST(sum(chars) AS BIGINT) AS total_chars,
         |  CAST(CAST(sum(chars) AS BIGINT) AS DOUBLE) / count(*)
         |    AS mean_chars
         |FROM hosted GROUP BY host
         |ORDER BY host""".stripMargin)
}
