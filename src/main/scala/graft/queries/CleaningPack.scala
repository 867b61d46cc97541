package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.clean.{Cleaning, Urls}
import graft.license.Licenses
import graft.loadmerge.Merge
import graft.popularity.Popularity

/** Cleaning kernel, license resolution, the J1 merge, and the
  * popularity pipeline, each exercised through the engine packages
  * over the driver testdata with hand-derived DuckDB oracles.
  */
object CleaningPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.9 sanitize family (columns.py:30-57): quote swap, backspace
    // drop, backslash escape, whitespace collapse — on synthesized
    // dirty strings.
    "q_sanitize" -> ((s, d) => {
      val dirty = concat(lit("  \""), substring(col("text"), 1, 30),
        lit("x\\y"), lit("\b"), lit("  z  "))
      Tables.documents(s, d)
        .select(col("doc_id"), Cleaning.sanitizeString(dirty).as("cleaned"),
          Cleaning.enforceCharLimit(col("text"), 50, truncate = true).as("capped"),
          Cleaning.enforceCharLimit(col("text"), 50, truncate = false).as("strict"))
        .orderBy(col("doc_id"))
    }),

    // §2.9 recursive nested-JSON sanitize (columns.py:131-173): leaf
    // strings inside a nested object are sanitized through the
    // depth-capped walker; the leaves are read back out so the oracle
    // compares sanitized VALUES, not serialization details.
    "q_sanitize_nested" -> ((s, d) => {
      val dirtyLeaf = concat(lit("  \""), substring(col("text"), 1, 30),
        lit("\"  tail  "))
      val nested = to_json(struct(
        struct(dirtyLeaf.as("t"), col("lang").as("lang")).as("inner"),
        col("source").as("src")))
      val clean = Cleaning.sanitizeJsonString(nested)
      Tables.documents(s, d)
        .select(col("doc_id"),
          get_json_object(clean, "$.inner.t").as("clean_t"),
          get_json_object(clean, "$.inner.lang").as("clean_lang"),
          get_json_object(clean, "$.src").as("src_out"))
        .orderBy(col("doc_id"))
    }),

    // §2.9 casts (columns.py:70-118): best-int-approx + bool mapping.
    "q_casts" -> ((s, d) => {
      val numStr = concat(col("user_id").cast("string"), lit("."),
        (col("event_id") % 100).cast("string"))
      val boolStr = element_at(
        array(lit("t"), lit("True"), lit("false"), lit("F"), lit("yes"),
          lit("1"), lit("TRUE")),
        (col("event_id") % 7 + 1).cast("int"))
      Tables.events(s, d)
        .select(col("event_id"),
          Cleaning.intCast(numStr).as("int_val"),
          Cleaning.intCast(col("event_type")).as("int_bad"),
          Cleaning.boolCast(boolStr).as("bool_val"))
        .orderBy(col("event_id"))
    }),

    // §2.9 URL family: parse_url projections
    // (ExtractCCLinks.py:172,179-183).
    "q_url_parse" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"), lit(".example.org/p/"),
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "?q=1").otherwise(""))
      Tables.documents(s, d)
        .select(col("doc_id"), Urls.host(url).as("host"),
          Urls.path(url).as("upath"), Urls.query(url).as("uquery"))
        .orderBy(col("doc_id"))
    }),

    // §2.9 license resolution (licenses.py:28-83): URL-derived wins,
    // pair fallback incl. the 2.1 -> 2.0 downgrade; six shapes cycled
    // by doc_id.
    "q_license_resolve" -> ((s, d) => {
      val url = when(col("doc_id") % 6 === 0,
          lit("https://creativecommons.org/licenses/by/4.0/"))
        .when(col("doc_id") % 6 === 1,
          lit("HTTP://CreativeCommons.org/licenses/by-nc-nd/2.0/"))
        .when(col("doc_id") % 6 === 2,
          lit("https://creativecommons.org/publicdomain/zero/1.0/"))
        .when(col("doc_id") % 6 === 3,
          lit("creativecommons.org/publicdomain/mark/1.0/"))
        .when(col("doc_id") % 6 === 4,
          lit("https://example.com/licenses/by/4.0/"))
        .otherwise(lit("https://creativecommons.org/about/"))
      val fallbackLic = when(col("doc_id") % 6 === 4, "by-sa").otherwise("by")
      val fallbackVer = when(col("doc_id") % 6 === 4, "2").otherwise("2.1")
      val info = Licenses.getLicenseInfoUdf(url, fallbackLic, fallbackVer)
      Tables.documents(s, d)
        .select(col("doc_id"), info.getField("_1").as("lic"),
          info.getField("_2").as("ver"), info.getField("_3").as("lic_url"))
        .orderBy(col("doc_id"))
    }),

    // §2.9 license regex-from-path variant (Provider.py:181-209).
    "q_license_regex" -> ((s, d) => {
      val path = when(col("doc_id") % 5 === 0, lit("/licenses/by/4.0/"))
        .when(col("doc_id") % 5 === 1, lit("/licenses/by-nc/3.0/deed.en"))
        .when(col("doc_id") % 5 === 2, lit("/publicdomain/zero/1.0/"))
        .when(col("doc_id") % 5 === 3, lit("/publicdomain/mark/1.0/"))
        .otherwise(lit("/about/cclicenses/"))
      val (lic, ver) = Licenses.licenseFromPath(path)
      Tables.documents(s, d)
        .select(col("doc_id"), lic.as("lic"), ver.as("ver"))
        .orderBy(col("doc_id"))
    }),

    // J1/U4: the upsert-merge, run through Merge.upsertMerge on two
    // overlapping event slices ('view' source rows carry a null value
    // to prove no-null-replacement).
    "q_j1_merge_upsert" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val t = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_type").as("provider"),
          col("event_id").cast("string").as("fid"),
          col("value").as("val"), col("user_id"))
      val src = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_type").as("provider"),
          col("event_id").cast("string").as("fid"),
          when(col("event_type") === "view", lit(null))
            .otherwise(col("value") + 1).as("val"),
          col("user_id"))
      Merge.upsertMerge(t, src,
          Merge.MergeSpec(provider = "provider", foreignId = "fid",
            scalarCols = Seq("val", "user_id")))
        .select(col("fid").cast("long").as("event_id"), col("provider"),
          col("val"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    // J2: overwrite-update — matched rows take source data verbatim,
    // unmatched kept, source-only rows NOT inserted (sql.py:274-316).
    "q_j2_overwrite" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val t = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_type").as("provider"),
          col("event_id").cast("string").as("fid"),
          col("value").as("val"), col("user_id"))
      val src = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_type").as("provider"),
          col("event_id").cast("string").as("fid"),
          (col("value") * 2).as("val"), col("user_id"))
      Merge.overwriteUpdate(t, src,
          Merge.MergeSpec(provider = "provider", foreignId = "fid",
            scalarCols = Seq("val", "user_id")))
        .select(col("fid").cast("long").as("event_id"), col("provider"),
          col("val"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    // J7/A6: migration replay — per key, each column takes its last
    // non-null value in ts order, one windowed pass instead of the
    // reference's 12-bucket loop (02_migrate_to_new_image.sql).
    "q_j7_replay" -> ((s, d) => {
      val hist = Tables.events(s, d)
        .select(col("event_type").as("provider"),
          col("user_id").cast("string").as("fid"), col("ts"),
          when(col("event_type") === "error", lit(null))
            .otherwise(col("value")).as("v"))
      Merge.replayNewestNonNull(hist, "provider", "fid", "ts", Seq("v"))
        .orderBy(col("provider"), col("fid"))
    }),

    // A7/U1: jsonb-array union-distinct merge (sql.py:206-214) over
    // adjacent documents' tag sets.
    "q_a7_tag_union" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val d1 = docs.select(col("doc_id"), split(col("text"), " ").as("tags_a"))
      val d2 = docs.select((col("doc_id") - 1).as("doc_id"),
        split(col("text"), " ").as("tags_b"))
      d1.join(d2, Seq("doc_id"))
        .select(col("doc_id"),
          concat_ws(",", Merge.mergeJsonbArrays(col("tags_a"), col("tags_b")))
            .as("merged_tags"))
        .orderBy(col("doc_id"))
    }),

    // A8: jsonb-object merge with strip-nulls + new-wins
    // (sql.py:194-204); output canonicalized as sorted k=v pairs.
    "q_a8_meta_merge" -> ((s, d) => {
      val oldMap = map(lit("lang"), col("lang"), lit("src"), col("source"),
        lit("n"), col("n_chars").cast("string"))
      val newMap = map(lit("src"), upper(col("source")),
        lit("n"), lit(null).cast("string"),
        lit("extra"), concat(lit("x"), col("doc_id")))
      val merged = Merge.mergeJsonbObjects(oldMap, newMap)
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws(",", array_sort(transform(map_entries(merged),
            e => concat(e.getField("key"), lit("="), e.getField("value")))))
            .as("meta_merged"))
        .orderBy(col("doc_id"))
    }),

    // A5+J8+math: the full popularity pipeline through
    // Popularity.percentileConstants + standardized.
    "q_popularity" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // p=0.25 keeps (1-p)/p an exact IEEE value (3.0) so the oracle
      // can't diverge by an ulp in the folded constant.
      val consts = Popularity.percentileConstants(ev, "event_type", col("value"), 0.25)
      Popularity.standardized(ev, "event_type", col("value"), consts)
        .select(col("event_id"), col("event_type"), col("standardized_popularity"))
        .orderBy(col("event_id"))
    }),

    // J5: unit-code -> sub-provider lookup via exploded broadcast dim
    // (sql.py:568-618).
    "q_j5_unitcode" -> ((s, d) => {
      implicit val sp: SparkSession = s
      val lookup = (0 until 20).map(i => s"g${i % 4}" -> s"src$i")
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
      graft.maintain.Maintenance.unitCodeLookup(
          Tables.documents(s, d), "source", "sub_provider", lookup)
        .groupBy(col("sub_provider"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("sub_provider"))
    }),

    // J6: transformed-key join (merge_cc_tags.py:29-67) — scheme and
    // trailing-slash variants of the same URL must join.
    "q_j6_normalized_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val left = docs.select(col("doc_id"), col("source"),
        concat(lit("https://"), col("source"), lit(".org/d/"), col("doc_id"),
          lit("/")).as("url"))
      val right = docs.filter(col("doc_id") % 2 === 0)
        .select(concat(lit("HTTP://"), col("source"), lit(".org/d/"),
          col("doc_id")).as("url2"))
      graft.maintain.Maintenance.transformedKeyJoin(left, right, "url", "url2")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .orderBy(col("source"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_sanitize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(
        |      '  "' || substr(text, 1, 30) || 'x\y' || chr(8) || '  z  ',
        |      '"', ''''), chr(8), ''), '\', '\\'),
        |    '\s+', ' ', 'g')) AS cleaned,
        |  CASE WHEN length(text) > 50 THEN substr(text, 1, 50) ELSE text END AS capped,
        |  CASE WHEN length(text) > 50 THEN NULL ELSE text END AS strict
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sanitize_nested" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(
        |      '  "' || substr(text, 1, 30) || '"  tail  ',
        |      '"', ''''), chr(8), ''), '\', '\\'),
        |    '\s+', ' ', 'g')) AS clean_t,
        |  lang AS clean_lang,
        |  source AS src_out
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_casts" ->
      """SELECT event_id,
        |  CAST(trunc(TRY_CAST(CAST(user_id AS VARCHAR) || '.' ||
        |    CAST(event_id % 100 AS VARCHAR) AS DOUBLE)) AS INTEGER) AS int_val,
        |  CAST(NULL AS INTEGER) AS int_bad,
        |  CASE WHEN ['t','True','false','F','yes','1','TRUE'][CAST(event_id % 7 AS INTEGER) + 1]
        |         IN ('true','True','t','T') THEN 't'
        |       WHEN ['t','True','false','F','yes','1','TRUE'][CAST(event_id % 7 AS INTEGER) + 1]
        |         IN ('false','False','f','F') THEN 'f'
        |       ELSE NULL END AS bool_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q_url_parse" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.org/p/' || doc_id ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?q=1' ELSE '' END AS url
        |FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS upath,
        |  nullif(regexp_extract(url, '\?(.*)$', 1), '') AS uquery
        |FROM u ORDER BY doc_id""".stripMargin,
    "q_license_resolve" ->
      """SELECT doc_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'by' WHEN 1 THEN 'by-nc-nd'
        |    WHEN 2 THEN 'cc0' WHEN 3 THEN 'pdm'
        |    WHEN 4 THEN 'by-sa' ELSE 'by' END AS lic,
        |  CASE doc_id % 6 WHEN 0 THEN '4.0' WHEN 1 THEN '2.0'
        |    WHEN 2 THEN '1.0' WHEN 3 THEN '1.0'
        |    WHEN 4 THEN '2.0' ELSE '2.1' END AS ver,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'https://creativecommons.org/licenses/by/4.0'
        |    WHEN 1 THEN 'https://creativecommons.org/licenses/by-nc-nd/2.0'
        |    WHEN 2 THEN 'https://creativecommons.org/publicdomain/zero/1.0'
        |    WHEN 3 THEN 'https://creativecommons.org/publicdomain/mark/1.0'
        |    WHEN 4 THEN 'https://creativecommons.org/licenses/by-sa/2.0/'
        |    ELSE 'https://creativecommons.org/licenses/by/2.0/' END AS lic_url
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_license_regex" ->
      """SELECT doc_id,
        |  CASE doc_id % 5 WHEN 0 THEN 'by' WHEN 1 THEN 'by-nc'
        |    WHEN 2 THEN 'cc0' WHEN 3 THEN 'pdm' ELSE NULL END AS lic,
        |  CASE doc_id % 5 WHEN 0 THEN '4.0' WHEN 1 THEN '3.0'
        |    WHEN 2 THEN '1.0' WHEN 3 THEN '1.0' ELSE NULL END AS ver
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_j1_merge_upsert" ->
      """WITH t AS (SELECT event_type AS provider, CAST(event_id AS VARCHAR) AS fid,
        |    value AS val, user_id FROM events WHERE event_id % 2 = 0),
        |  s AS (SELECT event_type AS provider, CAST(event_id AS VARCHAR) AS fid,
        |    CASE WHEN event_type = 'view' THEN NULL ELSE value + 1 END AS val,
        |    user_id FROM events WHERE event_id % 3 = 0)
        |SELECT CAST(COALESCE(s.fid, t.fid) AS BIGINT) AS event_id,
        |  COALESCE(s.provider, t.provider) AS provider,
        |  COALESCE(s.val, t.val) AS val,
        |  COALESCE(s.user_id, t.user_id) AS user_id
        |FROM t FULL OUTER JOIN s
        |  ON t.provider = s.provider AND md5(t.fid) = md5(s.fid)
        |ORDER BY event_id""".stripMargin,
    "q_j2_overwrite" ->
      """WITH t AS (SELECT event_type AS provider, CAST(event_id AS VARCHAR) AS fid,
        |    value AS val, user_id FROM events WHERE event_id % 2 = 0),
        |  s AS (SELECT event_type AS provider, CAST(event_id AS VARCHAR) AS fid,
        |    value * 2 AS val, user_id FROM events WHERE event_id % 3 = 0)
        |SELECT CAST(t.fid AS BIGINT) AS event_id, t.provider,
        |  CASE WHEN s.fid IS NOT NULL THEN s.val ELSE t.val END AS val,
        |  CASE WHEN s.fid IS NOT NULL THEN s.user_id ELSE t.user_id END AS user_id
        |FROM t LEFT JOIN s ON t.provider = s.provider AND md5(t.fid) = md5(s.fid)
        |ORDER BY event_id""".stripMargin,
    "q_j7_replay" ->
      """WITH base AS (SELECT event_type AS provider,
        |    CAST(user_id AS VARCHAR) AS fid, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT g.provider, g.fid, g.ts, nn.v
        |FROM (SELECT provider, fid, max(ts) AS ts FROM base GROUP BY 1, 2) g
        |LEFT JOIN (SELECT provider, fid, arg_max(v, ts) AS v FROM base
        |           WHERE v IS NOT NULL GROUP BY 1, 2) nn
        |USING (provider, fid)
        |ORDER BY provider, fid""".stripMargin,
    "q_a7_tag_union" ->
      """SELECT d1.doc_id, array_to_string(list_sort(list_distinct(
        |    list_concat(string_split(d1.text, ' '), string_split(d2.text, ' ')))),
        |  ',') AS merged_tags
        |FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        |ORDER BY d1.doc_id""".stripMargin,
    "q_a8_meta_merge" ->
      """SELECT doc_id,
        |  'extra=x' || doc_id || ',lang=' || lang || ',n=' || n_chars ||
        |    ',src=' || upper(source) AS meta_merged
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_popularity" ->
      """WITH c AS (SELECT event_type, quantile_disc(value, 0.25) AS raw_value
        |    FROM events GROUP BY event_type),
        |  c2 AS (SELECT event_type,
        |    ((1.0 - 0.25) / 0.25) * (CASE WHEN raw_value = 0 THEN 1 ELSE raw_value END)
        |      AS constant FROM c)
        |SELECT e.event_id, e.event_type,
        |  e.value / (e.value + c2.constant) AS standardized_popularity
        |FROM events e JOIN c2 USING (event_type) ORDER BY e.event_id""".stripMargin,
    "q_j5_unitcode" ->
      """SELECT 'g' || (CAST(substr(source, 4) AS INTEGER) % 4) AS sub_provider,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY sub_provider""".stripMargin,
    "q_j6_normalized_join" ->
      """SELECT source, count(*) AS n FROM documents WHERE doc_id % 2 = 0
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
