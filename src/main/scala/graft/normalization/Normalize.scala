package graft.normalization

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native re-expression of PyDI's normalization operators
  * (reference: PyDI/normalization/ — TextNormalizer, HeaderNormalizer,
  * TokenizationNormalizer, NullDetector, BooleanParser, NumericParser,
  * DateNormalizer, LinkNormalizer, UnitNormalizer, CoordinateParser).
  *
  * Everything here is a pure `Column → Column` (or `DataFrame →
  * DataFrame`) projection built from `org.apache.spark.sql.functions`
  * — whole-stage-codegen'd, no UDFs, no shuffle. At 100 TB these run
  * at scan speed and never become the bottleneck.
  */
object Normalize {

  // ---- text (PyDI/normalization/text_normalizer.py) ----

  /** lower → strip punctuation → collapse whitespace → trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))

  // ---- headers (PyDI/normalization/header_normalizer.py) ----

  /** snake_case one header: lower, non-alnum runs → `_`, trim `_`. */
  def cleanHeader(name: String): String = {
    val s = name.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (s.isEmpty) "col" else s
  }

  /** Clean all headers; duplicates get positional suffixes (`_2`, …). */
  def cleanHeaders(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val cleaned = df.columns.map { c =>
      val base = cleanHeader(c)
      val n = seen.getOrElse(base, 0) + 1
      seen(base) = n
      if (n == 1) base else s"${base}_$n"
    }
    df.toDF(cleaned.toIndexedSeq: _*)
  }

  // ---- tokenization (PyDI/normalization/tokenization_normalizer.py) ----

  /** Lowercase word tokens, empties and stopwords removed, order and
    * duplicates preserved (matches the reference's tokenizer).
    */
  def tokenize(c: Column, stopwords: Seq[String] = Nil): Column = {
    val toks = filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    if (stopwords.isEmpty) toks
    else filter(toks, t => !t.isInCollection(stopwords))
  }

  // ---- null sentinels (PyDI/normalization/null_detector.py) ----

  val DefaultNullTokens: Seq[String] =
    Seq("", "null", "none", "n/a", "na", "nan", "-", "?", "unknown")

  /** Map sentinel strings (case-insensitive, trimmed) to real NULL. */
  def cleanNulls(c: Column, tokens: Seq[String] = DefaultNullTokens): Column =
    when(lower(trim(c)).isInCollection(tokens), lit(null)).otherwise(c)

  // ---- boolean (PyDI/normalization/boolean_parser.py) ----

  val TrueTokens: Seq[String] = Seq("true", "t", "yes", "y", "1", "on")
  val FalseTokens: Seq[String] = Seq("false", "f", "no", "n", "0", "off")

  /** Truthy/falsy token sets → BooleanType; unparseable → NULL. */
  def parseBoolean(c: Column): Column = {
    val t = lower(trim(c))
    when(t.isInCollection(TrueTokens), lit(true))
      .when(t.isInCollection(FalseTokens), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  // ---- numeric (PyDI/normalization/numeric_parser.py) ----

  /** Parse numbers in common locale formats:
    *   "1,234.56"  (comma thousands)   "123,45" (decimal comma)
    *   "85%"       (percent → /100)    "123e-2" (scientific)
    * Unparseable → NULL. One codegen'd when-chain, no UDF.
    */
  def parseNumeric(c: Column): Column = {
    val t = regexp_replace(trim(c), "\\s+", "")
    val isPct = t.rlike("%$")
    val core = regexp_replace(t, "%$", "")
    val parsed = parseCore(core)
    when(isPct, parsed / 100.0).otherwise(parsed)
  }

  private def parseCore(core: Column): Column =
    when(core.rlike("^-?\\d{1,3}(,\\d{3})+(\\.\\d+)?$"),
        regexp_replace(core, ",", "").cast("double"))
      .when(core.rlike("^-?\\d+,\\d+$"),
        regexp_replace(core, ",", ".").cast("double"))
      .when(core.rlike("^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"),
        core.cast("double"))
      .otherwise(lit(null).cast("double"))

  // ---- dates (PyDI/normalization/date_normalizer.py) ----

  /** Try each format in order; first parse wins (NULL if none). */
  def parseDate(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  val DefaultDateFormats: Seq[String] = Seq(
    "yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "yyyy.MM.dd",
    "yyyy/MM/dd", "MMM d, yyyy", "d MMM yyyy", "yyyyMMdd")

  // ---- urls (PyDI/normalization/link_normalizer.py) ----

  /** Canonical form: lowercase, scheme + `www.` + query/fragment +
    * trailing slash stripped.
    */
  def canonicalizeUrl(c: Column): Column = {
    val low = lower(trim(c))
    val noScheme = regexp_replace(low, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noQuery = regexp_replace(noWww, "[?#].*$", "")
    regexp_replace(noQuery, "/$", "")
  }

  // ---- units (PyDI/normalization/unit_normalizer.py) ----

  /** (unit symbol → factor to grams) registry, broadcast-joined.
    * `quantityToGrams(df, "qty")` adds `qty_value`, `qty_unit`,
    * `qty_grams` columns; unknown unit → NULL grams.
    */
  val MassUnitsToGrams: Seq[(String, Double)] =
    Seq("mg" -> 0.001, "g" -> 1.0, "kg" -> 1000.0, "t" -> 1000000.0)

  def quantityToGrams(df: DataFrame, col: String,
      registry: Seq[(String, Double)] = MassUnitsToGrams): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reg = registry.toDF("_unit", "_factor")
    df.withColumn(s"${col}_value",
        regexp_extract(org.apache.spark.sql.functions.col(col),
          "^\\s*(-?\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)\\s*$", 1).cast("double"))
      .withColumn(s"${col}_unit",
        lower(regexp_extract(org.apache.spark.sql.functions.col(col),
          "^\\s*(-?\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)\\s*$", 2)))
      .join(broadcast(reg), org.apache.spark.sql.functions.col(s"${col}_unit") === $"_unit", "left")
      .withColumn(s"${col}_grams",
        org.apache.spark.sql.functions.col(s"${col}_value") * $"_factor")
      .drop("_unit", "_factor")
  }

  /** Multi-category unit registry (PyDI/normalization/units.py:22 spans
    * many categories, not just mass): (unit, category, factor to the
    * category's base unit — g, m, s, byte).
    */
  val UnitRegistry: Seq[(String, String, Double)] = Seq(
    ("mg", "mass", 0.001), ("g", "mass", 1.0), ("kg", "mass", 1000.0), ("t", "mass", 1e6),
    ("mm", "length", 0.001), ("cm", "length", 0.01), ("m", "length", 1.0), ("km", "length", 1000.0),
    ("ms", "time", 0.001), ("s", "time", 1.0), ("min", "time", 60.0), ("h", "time", 3600.0),
    ("b", "data", 1.0), ("kb", "data", 1024.0), ("mb", "data", 1048576.0), ("gb", "data", 1073741824.0),
    // rules.py:121 parse_power_w / :147 parse_frequency_hz categories
    ("w", "power", 1.0), ("kw", "power", 1000.0), ("mw", "power", 1e6),
    ("hz", "frequency", 1.0), ("khz", "frequency", 1000.0),
    ("mhz", "frequency", 1e6), ("ghz", "frequency", 1e9))

  /** General quantity parser: "12.5 kg" → value, unit, category and
    * base_value columns (broadcast registry join; unknown unit → NULLs).
    */
  def parseQuantity(df: DataFrame, col: String,
      registry: Seq[(String, String, Double)] = UnitRegistry): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reg = registry.toDF("_unit", s"${col}_category", "_factor")
    df.withColumn(s"${col}_value",
        regexp_extract(org.apache.spark.sql.functions.col(col),
          "^\\s*(-?\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)\\s*$", 1).cast("double"))
      .withColumn(s"${col}_unit",
        lower(regexp_extract(org.apache.spark.sql.functions.col(col),
          "^\\s*(-?\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)\\s*$", 2)))
      .join(broadcast(reg), org.apache.spark.sql.functions.col(s"${col}_unit") === $"_unit", "left")
      .withColumn(s"${col}_base",
        org.apache.spark.sql.functions.col(s"${col}_value") * $"_factor")
      .drop("_unit", "_factor")
  }

  // ---- web tables (PyDI/normalization/text.py:502 WebTableNormalizer,
  //      :676 BracketContentHandler) ----

  /** The reference's literal entity→replacement map (text.py:546),
    * applied in its insertion order — order matters: `&nbsp;` must fire
    * before `&nbsp` before the bare `nbsp` fallback.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&nbsp" -> " ", "nbsp" -> " ",
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&apos;" -> "'", "&ndash;" -> "-",
    "&mdash;" -> "-", "&hellip;" -> "...", "&copy;" -> "(c)",
    "&reg;" -> "(r)", "&trade;" -> "tm", "&cent;" -> "c",
    "&pound;" -> "GBP", "&yen;" -> "JPY", "&euro;" -> "EUR")

  /** Extended web-null tokens (text.py:533). */
  val WebNullTokens: Seq[String] = Seq(
    "", "__", "-", "_", "?", "unknown", "- -", "•", "- - -", ".",
    "??", "(n/a)", "null", "none", "nil", "na", "n/a", "missing",
    "undefined", "void", "tbd", "tba", "not available", "not applicable",
    "no data", "no info", "---", "___", "...", "n.a.", "n.d.", "nd",
    "n\\a")

  /** WebTableNormalizer.normalize_value (text.py:561) as one codegen'd
    * projection: newline/tab → space, entity map + decimal numeric
    * entities (`&#65;`), strip tags (non-greedy, like the reference),
    * lowercase + trim, web null tokens → `nullValue`, optional bracket-
    * content removal, whitespace collapse; empty → `nullValue`.
    * Deviation (documented): the reference ends with Python
    * `html.unescape` over the FULL named-entity table; here the
    * catch-all is the map above + decimal entities — the long tail of
    * named entities is out of scope without an ICU-sized table.
    */
  def webTableNormalize(c: Column, nullValue: String = "NULL",
      removeBrackets: Boolean = false): Column = {
    val sp = regexp_replace(c, "[\\n\\r\\t]", " ")
    val ent = HtmlEntities.foldLeft(sp) { case (acc, (e, r)) =>
      replace(acc, lit(e), lit(r))
    }
    val noNum = regexp_replace(ent, "[&\\\\?]#[0-9]{1,3};", " ")
    val noTag = regexp_replace(noNum, "<.*?>", "")
    val low = trim(lower(noTag))
    val nulled = when(low.isInCollection(WebNullTokens), lit(nullValue)).otherwise(low)
    val deb =
      if (removeBrackets) trim(regexp_replace(nulled, "\\(.*?\\)", ""))
      else nulled
    val collapsed = trim(regexp_replace(deb, "\\s+", " "))
    when(c.isNull, lit(nullValue))
      .when(collapsed === "", lit(nullValue))
      .otherwise(collapsed)
  }

  /** BracketContentHandler.remove_content (text.py:676): strip the
    * content of every requested bracket pair (non-greedy, like the
    * reference's compiled patterns), then collapse whitespace.
    */
  def removeBracketContent(c: Column, types: String = "()[]{}"): Column = {
    val pairs = Seq("(" -> ")", "[" -> "]", "{" -> "}", "<" -> ">")
      .filter { case (o, cl) => types.contains(o) && types.contains(cl) }
    val stripped = pairs.foldLeft(c) { case (acc, (o, cl)) =>
      regexp_replace(acc, "\\" + o + ".*?" + "\\" + cl, "")
    }
    trim(regexp_replace(stripped, "\\s+", " "))
  }

  // ---- unit conversion (units.py:483 UnitConverter, :428 UnitDetector) ----

  /** Conversion factor to the category base unit (when-chain over the
    * registry — codegen'd, no join needed for scalar conversion).
    */
  def unitFactor(unit: Column,
      registry: Seq[(String, String, Double)] = UnitRegistry): Column =
    registry.foldLeft(lit(null).cast("double")) { case (acc, (u, _, f)) =>
      when(unit === u, f).otherwise(acc)
    }

  /** Category name of a unit symbol; NULL if unknown (UnitDetector.
    * detect_category over the registry, minus the free-text search).
    */
  def unitCategory(unit: Column,
      registry: Seq[(String, String, Double)] = UnitRegistry): Column =
    registry.foldLeft(lit(null).cast("string")) { case (acc, (u, c, _)) =>
      when(unit === u, c).otherwise(acc)
    }

  private val TempUnits = Seq("c", "°c", "f", "°f", "k")

  /** UnitConverter.convert (units.py:493): value × factor(from) /
    * factor(to) within one category; NULL when categories differ
    * (can_convert) or a unit is unknown. Temperature is the reference's
    * special case (units.py:507): affine through Celsius — C/F/K cross-
    * convert but never convert to/from linear categories. Arithmetic
    * shape matches the reference exactly (((v−32)·5)/9 etc.) so the
    * DuckDB oracle reproduces identical IEEE doubles.
    */
  def convertUnit(value: Column, fromUnit: Column, toUnit: Column,
      registry: Seq[(String, String, Double)] = UnitRegistry): Column = {
    val f = lower(trim(fromUnit))
    val t = lower(trim(toUnit))
    val celsius = when(f.isin("f", "°f"), (value - lit(32.0)) * lit(5.0) / lit(9.0))
      .when(f === "k", value - lit(273.15))
      .otherwise(value)
    val fromTemp = when(t.isin("f", "°f"), celsius * lit(9.0) / lit(5.0) + lit(32.0))
      .when(t === "k", celsius + lit(273.15))
      .otherwise(celsius)
    val fIsT = f.isInCollection(TempUnits)
    val tIsT = t.isInCollection(TempUnits)
    val ff = unitFactor(f, registry)
    val tf = unitFactor(t, registry)
    val sameCat = unitCategory(f, registry) === unitCategory(t, registry)
    when(fIsT && tIsT, fromTemp)
      .when(fIsT || tIsT, lit(null).cast("double"))
      .when(sameCat, value * ff / tf)
      .otherwise(lit(null).cast("double"))
  }

  // ---- applied type conversion (types.py:838 TypeConverter,
  //      columns.py:405 ColumnTypeInference) ----

  /** Apply a (column → detected type) table back onto the frame —
    * the piece TypeConverter.convert_column adds on top of
    * [[detectTypes]] (which only REPORTS). Parses are regex-guarded
    * (same regexes as detection) so malformed rows go NULL instead of
    * throwing under ANSI mode.
    */
  def convertTypes(df: DataFrame, detected: Seq[(String, String)]): DataFrame =
    detected.foldLeft(df) { case (d, (c, t)) =>
      val s = trim(col(c).cast("string"))
      t match {
        case "long" => d.withColumn(c, when(s.rlike("^-?\\d+$"), s.cast("long")))
        case "double" =>
          d.withColumn(c, when(s.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$"), s.cast("double")))
        case "datetime" => d.withColumn(c, parseDate(s, DefaultDateFormats))
        case "bool" => d.withColumn(c, parseBoolean(s))
        case _ => d
      }
    }

  /** detect → apply in one call (DatasetNormalizer's auto mode). */
  def applyDetectedTypes(df: DataFrame): DataFrame = {
    val det = detectTypes(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    convertTypes(df, det)
  }

  // ---- value functions (PyDI/utils/normalization.py) ----

  /** remove_html_tags (:77). */
  def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** normalize_phone_number (:106), US layout: 10 digits (optionally
    * 1-prefixed) → "+1-XXX-XXX-XXXX"; anything else → NULL.
    */
  def normalizePhone(c: Column): Column = {
    val digits = regexp_replace(c, "[^0-9]", "")
    val ten = when(length(digits) === 11 && substring(digits, 1, 1) === "1",
        substring(digits, 2, 10))
      .when(length(digits) === 10, digits)
    when(ten.isNotNull,
      concat(lit("+1-"), substring(ten, 1, 3), lit("-"),
        substring(ten, 4, 3), lit("-"), substring(ten, 7, 4)))
  }

  /** parse_currency (:145): "$1,234.56" → 1234.56; NULL if unparseable. */
  def parseCurrency(c: Column): Column =
    regexp_extract(regexp_replace(trim(c), "[$,\\s]", ""), "^(-?\\d+(?:\\.\\d+)?)$", 1)
      .cast("double")

  /** parse_percentage (:182): "12.5%" → 0.125. */
  def parsePercentage(c: Column): Column =
    (regexp_extract(trim(c), "^(-?\\d+(?:\\.\\d+)?)\\s*%$", 1).cast("double") / 100.0)

  /** normalize_whitespace (:330). */
  /** remove_punctuation (utils/__init__.py:116): translate out the ASCII
    * string.punctuation set, nothing else (no space insertion).
    */
  val PunctChars: String = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
  def removePunctuation(c: Column): Column = translate(c, PunctChars, "")

  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** remove_accents (:353) for the Latin-1 accent range — a literal
    * translate map, identical in any engine (no ICU dependency).
    */
  val AccentFrom = "àáâãäåèéêëìíîïòóôõöùúûüýçñÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÇÑ"
  val AccentTo = "aaaaaaeeeeiiiiooooouuuuycnAAAAAAEEEEIIIIOOOOOUUUUYCN"
  def removeAccents(c: Column): Column = translate(c, AccentFrom, AccentTo)

  /** extract_numeric (:295), first match. */
  def extractNumeric(c: Column): Column =
    nullif(regexp_extract(c, "(-?\\d+(?:\\.\\d+)?)", 1), lit("")).cast("double")

  // ---- country standardization (utils/normalization.py:246) ----

  /** Default map of standardize_country_name (:266). Order matters —
    * the reference returns the FIRST partial match in dict order.
    */
  val DefaultCountryMap: Seq[(String, String)] = Seq(
    "usa" -> "United States", "us" -> "United States",
    "united states of america" -> "United States",
    "uk" -> "United Kingdom", "britain" -> "United Kingdom",
    "great britain" -> "United Kingdom", "england" -> "United Kingdom",
    "deutschland" -> "Germany", "de" -> "Germany")

  /** Per-space-token ucfirst — the deterministic title-case both engines
    * replay identically (Python str.title additionally capitalizes after
    * ANY non-letter; documented deviation).
    */
  def titleCase(c: Column): Column =
    array_join(transform(split(trim(c), " "),
      w => concat(upper(w.substr(lit(1), lit(1))),
        lower(w.substr(lit(2), length(w))))), " ")

  /** standardize_country_name (:246): direct map hit first, then the
    * first substring match in map order (either containment direction),
    * else title-cased passthrough. The bounded map compiles to one
    * codegen'd when-chain — scan work, no join, no broadcast.
    */
  def standardizeCountry(c: Column,
      mapping: Seq[(String, String)] = DefaultCountryMap): Column = {
    val cleaned = lower(trim(c))
    val start: Column = when(lit(false), lit(null).cast("string"))
    val direct = mapping.foldLeft(start) { case (acc, (k, v)) =>
      acc.when(cleaned === k, lit(v))
    }
    val full = mapping.foldLeft(direct) { case (acc, (k, v)) =>
      acc.when(cleaned.contains(k) || lit(k).contains(cleaned), lit(v))
    }
    when(c.isNotNull, coalesce(full, titleCase(c)))
  }

  // ---- encoding issues (utils/normalization.py:411 detect, :441 fix) ----

  /** The reference's mojibake literals (exact codepoints from
    * normalization.py fixes dict), in dict order — replacements apply
    * SEQUENTIALLY, so the bare "â€" rule consumes the prefix of the
    * em-dash pattern before that later rule can fire; replicated
    * faithfully by the ordered fold below.
    */
  val EncodingFixes: Seq[(String, String)] = Seq(
    "\u00e2\u20ac\u2122" -> "'", // mojibake curly apostrophe
    "\u00e2\u20ac\u0153" -> "\"", // mojibake left double quote
    "\u00e2\u20ac" -> "\"", // mojibake right double quote (prefix of the next)
    "\u00e2\u20ac\u0022" -> "\u2014", // mojibake em dash (dead after the rule above)
    "\u00c3\u00a1" -> "\u00e1", // mojibake a-acute
    "\u00c3\u00a9" -> "\u00e9", // mojibake e-acute
    "\u00c3\u00ad" -> "\u00ed", // mojibake i-acute (key ends in soft hyphen)
    "\u00c3\u00b3" -> "\u00f3", // mojibake o-acute
    "\u00c3\u00ba" -> "\u00fa") // mojibake u-acute

  /** detect_encoding_issues tokens (:427): U+FFFD plus the fix keys. */
  val EncodingIssueTokens: Seq[String] = "\ufffd" +: EncodingFixes.map(_._1)

  /** detect_encoding_issues (:411): any mojibake token present
    * (false for NULL, matching the reference's non-string guard).
    */
  def detectEncodingIssues(c: Column): Column =
    coalesce(EncodingIssueTokens.map(t => c.contains(t)).reduce(_ || _), lit(false))

  /** fix_encoding (:441) fallback chain (ftfy absent by design — this
    * is a zero-dependency build): ordered literal replaces, identical
    * in any engine.
    */
  def fixEncoding(c: Column): Column =
    EncodingFixes.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  // ---- column quality (normalization/columns.py:526 analyze_column_quality) ----

  /** analyze_column_quality for ALL listed columns in one stacked pass
    * (+ one quantile-fence pass for the IQR outlier count — quartiles
    * inherently need their own scan). Null semantics = NullDetector
    * (web null sentinels count as null). Numeric stats come from exact
    * moment sums (Σx, Σx²) with the sample-std formula evaluated in raw
    * IEEE arithmetic: on integer-scaled inputs (ids, money in cents)
    * this is bit-identical under any partitioning, unlike builtin
    * stddev whose partial-merge order varies with the shuffle.
    * Ratios are raw IEEE divisions of exact longs (SURVEY §4 rule).
    */
  /** Numeric-literal gate shared with the oracle replay: ANSI casts
    * throw on junk, and TRY_CAST dialects disagree on 'inf'/'1e999' —
    * an explicit regex keeps both engines on the identical domain.
    */
  val NumericLiteral = "^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$"

  /** Decimal → double through a string round-trip: string→double parse
    * is correctly rounded in every engine, while direct decimal→double
    * casts are not (DuckDB divides the unscaled int by 10^scale in
    * floats — off by an ulp from Spark's BigDecimal path; observed as a
    * 3-ulp std divergence before this).
    */
  private def decToDouble(c: Column): Column = c.cast("string").cast("double")

  def columnQuality(df: DataFrame, columns: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(columns.map { c =>
        struct(lit(c).as("column_name"),
          cleanNulls(col(c).cast("string")).as("value"))
      }: _*)).as("cv"))
      .select(col("cv.column_name").as("column_name"), col("cv.value").as("value"))
      .withColumn("num",
        when(col("value").rlike(NumericLiteral), col("value").cast("double")))
    val base = stacked.groupBy("column_name").agg(
      count(lit(1)).as("total_values"),
      sum(col("value").isNull.cast("long")).as("null_count"),
      count_distinct(col("value")).as("unique_count"),
      // Moment sums in exact decimal: a double running sum past 2^53
      // would round differently per partition fold order (the
      // invariance gate would catch it); decimal addition is exact and
      // associative, and the one decimal→double cast at the end is a
      // single deterministic rounding.
      sum(col("num").cast("decimal(38,6)")).as("_sx"),
      sum((col("num") * col("num")).cast("decimal(38,6)")).as("_sxx"),
      count(col("num")).as("_n"),
      min("num").as("min_value"),
      max("num").as("max_value"),
      percentile(col("num"), lit(0.25)).as("_q1"),
      percentile(col("num"), lit(0.75)).as("_q3"))
    // Quartile fences are one tiny row per column — broadcast them back
    // over the stacked frame; no second wide shuffle.
    val fences = broadcast(base.select("column_name", "_q1", "_q3"))
    val iqr = col("_q3") - col("_q1")
    val outliers = stacked.join(fences, "column_name")
      .filter(col("num") < col("_q1") - lit(1.5) * iqr ||
              col("num") > col("_q3") + lit(1.5) * iqr)
      .groupBy("column_name").agg(count(lit(1)).as("outlier_count"))
    base.join(outliers, Seq("column_name"), "left")
      .select(col("column_name").as("column"),
        col("total_values"), col("null_count"),
        (col("null_count") * lit(100.0) / col("total_values")).as("null_percentage"),
        col("unique_count"),
        (col("unique_count") / col("total_values").cast("double")).as("uniqueness_ratio"),
        ((col("total_values") - col("null_count")) / col("total_values").cast("double"))
          .as("completeness"),
        coalesce(col("outlier_count"), lit(0L)).as("outlier_count"),
        (decToDouble(col("_sx")) / col("_n")).as("mean"),
        when(col("_n") > 1,
          sqrt((decToDouble(col("_sxx"))
            - decToDouble(col("_sx")) * decToDouble(col("_sx")) / col("_n"))
            / (col("_n") - 1)))
          .as("std"),
        col("min_value"), col("max_value"))
  }

  // ---- duplicate detection (detectors.py:360 DuplicateDetector) ----

  /** duplicate_summary (detectors.py:392): per column — total rows,
    * distinct non-null values, count of values belonging to any
    * duplicate group (pandas `duplicated(keep=False)`, case-insensitive
    * like the reference default), duplicate share as round(x, 2).
    * ONE long-form pass over all listed columns (stack → two-level
    * count), not a per-column loop. Deviation (documented): the
    * reference also groups NaNs as duplicates of each other; here nulls
    * are excluded from the duplicate count.
    */
  def duplicateSummary(df: DataFrame, columns: Seq[String]): DataFrame = {
    val total = df.count()
    val stacked = df.select(explode(array(columns.map(c =>
        struct(lit(c).as("column_name"),
          lower(col(c).cast("string")).as("value"))): _*)).as("cv"))
      .select(col("cv.column_name").as("column_name"), col("cv.value").as("value"))
      .filter(col("value").isNotNull)
    stacked.groupBy("column_name", "value").agg(count(lit(1)).as("_cnt"))
      .groupBy("column_name")
      .agg(count(lit(1)).as("unique_values"),
        sum(when(col("_cnt") > 1, col("_cnt")).otherwise(0L)).as("duplicate_values"))
      .select(col("column_name").as("column"), lit(total).as("total_values"),
        col("unique_values"), col("duplicate_values"),
        round(col("duplicate_values") * 100.0 / lit(total.toDouble), 2)
          .as("duplicate_percentage"))
  }

  // ---- dataset-level orchestration (datasets.py:287 DatasetNormalizer) ----

  /** DatasetNormalizer.normalize_dataset as a declarative strategy
    * table — (column → normalizer name), mirroring Fusion.runEngine's
    * API shape. Every transform is a Column→Column projection, so the
    * whole table folds into ONE codegen'd select: scan-speed at 100 TB,
    * no per-column jobs (the reference loops columns in Python).
    */
  def normalizeDataset(df: DataFrame, strategies: Seq[(String, String)]): DataFrame =
    strategies.foldLeft(df) { case (d, (c, strat)) =>
      val fn: Column => Column = strat match {
        case "text" => normalizeText
        case "nulls" => cleanNulls(_, DefaultNullTokens)
        case "boolean" => parseBoolean
        case "numeric" => parseNumeric
        case "date" => parseDate(_, DefaultDateFormats)
        case "url" => canonicalizeUrl
        case "phone" => normalizePhone
        case "currency" => parseCurrency
        case "percentage" => parsePercentage
        case "whitespace" => normalizeWhitespace
        case "accents" => removeAccents
        case "html" => stripHtml
        case "webtable" => webTableNormalize(_)
        case other =>
          throw new IllegalArgumentException(s"unknown normalizer: $other")
      }
      d.withColumn(c, fn(col(c)))
    }

  // ---- coordinates (PyDI/normalization/coordinate_parser.py) ----

  /** "12.34N" / "56.78W" → signed double (S/W negative); NULL if
    * unparseable.
    */
  def parseCoord(c: Column): Column = {
    val v = regexp_extract(trim(c), "^(\\d+(?:\\.\\d+)?)\\s*([NSEWnsew])$", 1).cast("double")
    val d = upper(regexp_extract(trim(c), "^(\\d+(?:\\.\\d+)?)\\s*([NSEWnsew])$", 2))
    when(d.isin("S", "W"), -v).when(d.isin("N", "E"), v)
      .otherwise(lit(null).cast("double"))
  }

  // ---- type detection (PyDI/normalization/type_detector.py) ----

  /** Per-column majority type vote over stringified values, one pass.
    * Emits (column, detected, share_parsed). Detection order:
    * long → double → datetime → bool → string.
    */
  def detectTypes(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val aggs = df.columns.flatMap { c =>
      val s = trim(col(c).cast("string"))
      Seq(
        avg(s.rlike("^-?\\d+$").cast("double")).as(s"${c}__long"),
        avg(s.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$").cast("double")).as(s"${c}__double"),
        avg(s.rlike("^\\d{4}-\\d{2}-\\d{2}([ T].*)?$").cast("double")).as(s"${c}__datetime"),
        avg(lower(s).isInCollection(TrueTokens ++ FalseTokens).cast("double")).as(s"${c}__bool"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    val out = df.columns.zipWithIndex.map { case (c, i) =>
      val shares = Seq("long", "double", "datetime", "bool").zipWithIndex.map {
        case (t, j) => t -> Option(row.get(i * 4 + j)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      }
      val (best, share) = shares.maxBy(_._2)
      if (share >= 0.5) (c, best, share) else (c, "string", 0.0)
    }
    import spark.implicits._
    out.toSeq.toDF("column", "detected", "share_parsed")
  }

  /** Column recommendations (PyDI/normalization/columns.py:446
    * `get_normalization_recommendations`, :575
    * `get_column_recommendations`): the advisory layer over
    * [[detectTypes]] + per-column null profiling. One extra aggregation
    * pass (driver result bounded by column count, like detectTypes)
    * computes null shares; the rule set mirrors the reference's: null
    * rate >20% → imputation; string → text normalization; datetime →
    * date standardization; parsed-majority <0.9 on a non-string type →
    * verify ("low confidence"). Columns with no findings emit an
    * explicit 'ok' row so every column appears in the frame.
    */
  def columnRecommendations(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nullAggs = df.columns.map(c => avg(col(c).isNull.cast("double")).as(s"_n_$c"))
    val row = df.agg(nullAggs.head, nullAggs.tail.toIndexedSeq: _*).collect()(0)
    val nulls = df.columns.zipWithIndex.map { case (c, i) =>
      (c, Option(row.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0))
    }.toSeq.toDF("column", "null_share")
    val recsArr = array(
      when(col("null_share") > 0.2, lit("high null rate - consider imputation")),
      when(col("detected") === "string", lit("text data - consider text normalization")),
      when(col("detected") === "datetime", lit("date data - consider date standardization")),
      when(col("detected") =!= "string" && col("share_parsed") < 0.9,
        lit("low parse confidence - verify data type")))
    detectTypes(df).join(nulls, "column")
      .withColumn("recommendation", explode_outer(filter(recsArr, x => x.isNotNull)))
      .select(col("column"), col("detected"), col("share_parsed"), col("null_share"),
        coalesce(col("recommendation"), lit("ok")).as("recommendation"))
  }

  // ---- outliers (PyDI/normalization/outlier_detector.py) ----

  /** Rows outside [q1 - k·iqr, q3 + k·iqr] on `valueCol` (exact
    * percentiles — interpolated, matching quantile_cont).
    */
  def iqrOutliers(df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame = {
    val q = df.agg(
      percentile(col(valueCol), lit(0.25)).as("q1"),
      percentile(col(valueCol), lit(0.75)).as("q3"))
    df.crossJoin(broadcast(q))
      .filter(col(valueCol) < col("q1") - lit(k) * (col("q3") - col("q1")) ||
              col(valueCol) > col("q3") + lit(k) * (col("q3") - col("q1")))
      .drop("q1", "q3")
  }

  /** Median/mean imputation — the fix `columnRecommendations`' "high
    * null rate - consider imputation" advice points at. The fill value
    * is ONE exact statistic (interpolated median, or mean as an exact
    * sum ratio over non-nulls) broadcast onto a scan-shaped coalesce;
    * no shuffle of the data itself.
    */
  def imputeNumeric(df: DataFrame, valueCol: String,
      strategy: String = "median"): DataFrame = {
    val fill = strategy match {
      case "median" => df.agg(percentile(col(valueCol), lit(0.5)).as("_fill"))
      case "mean" => df.agg(
        (sum(col(valueCol)).cast("double") / count(col(valueCol))).as("_fill"))
      case other => throw new IllegalArgumentException(s"unknown strategy: $other")
    }
    df.crossJoin(broadcast(fill))
      .withColumn(valueCol, coalesce(col(valueCol), col("_fill")))
      .drop("_fill")
  }

  /** Winsorization (pandas `clip(lower=q_lo, upper=q_hi)` on exact
    * interpolated quantiles): tail values are CLAMPED to the percentile
    * bounds instead of dropped — the outlier treatment that keeps row
    * counts stable. One 1-row percentile agg broadcast onto a
    * scan-shaped least/greatest projection. NULLs stay NULL (pandas
    * `clip` preserves NaN) — without the guard, least/greatest skip
    * nulls and a NULL value would silently clamp to the lower bound.
    */
  def winsorize(df: DataFrame, valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val q = df.agg(
      percentile(col(valueCol), lit(lo)).as("_qlo"),
      percentile(col(valueCol), lit(hi)).as("_qhi"))
    df.crossJoin(broadcast(q))
      .withColumn(valueCol,
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("_qlo")), col("_qhi"))))
      .drop("_qlo", "_qhi")
  }

  /** Robust (median/MAD) outliers: rows with
    * |x − median| > k · 1.4826 · MAD, where MAD = median(|x − median|)
    * — the modified-z-score detector that, unlike mean/stddev, is not
    * itself dragged by the outliers it hunts. Two aggregation passes
    * (median, then MAD over the residuals — MAD is not a single-pass
    * statistic), each an exact interpolated percentile; both 1-row
    * frames broadcast.
    */
  def madOutliers(df: DataFrame, valueCol: String, k: Double = 3.5): DataFrame = {
    val med = df.agg(percentile(col(valueCol), lit(0.5)).as("_med"))
    val withMed = df.crossJoin(broadcast(med))
    val mad = withMed
      .agg(percentile(abs(col(valueCol) - col("_med")), lit(0.5)).as("_mad"))
    withMed.crossJoin(broadcast(mad))
      .filter(abs(col(valueCol) - col("_med")) > lit(k) * lit(1.4826) * col("_mad"))
      .drop("_med", "_mad")
  }

  /** Rows with |value - mean| > k·stddev (population stddev). */
  def zscoreOutliers(df: DataFrame, valueCol: String, k: Double = 3.0): DataFrame = {
    val q = df.agg(avg(col(valueCol)).as("_mu"), stddev_pop(col(valueCol)).as("_sd"))
    df.crossJoin(broadcast(q))
      .filter(abs(col(valueCol) - col("_mu")) > lit(k) * col("_sd"))
      .drop("_mu", "_sd")
  }

  // ---- validation (PyDI/normalization/validators.py) ----

  val EmailPattern = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  /** Declarative rule → violation count, one aggregate pass per rule
    * family (all rules fold into a single `agg`, one job total).
    */
  sealed trait Rule { def name: String; def violations: Column }
  case class PatternRule(name: String, c: Column, pattern: String) extends Rule {
    def violations: Column = sum((!c.rlike(pattern) || c.isNull).cast("long"))
  }
  case class RangeRule(name: String, c: Column, lo: Double, hi: Double) extends Rule {
    def violations: Column = sum((c < lo || c > hi || c.isNull).cast("long"))
  }
  case class CompletenessRule(name: String, c: Column) extends Rule {
    def violations: Column = sum(c.isNull.cast("long"))
  }

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.agg(rules.head.violations.as(rules.head.name),
      rules.tail.map(r => r.violations.as(r.name)).toIndexedSeq: _*).collect()(0)
    rules.zipWithIndex.map { case (r, i) =>
      (r.name, Option(row.get(i)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }.toDF("rule", "violations")
  }

  /** Count of key values appearing more than once (uniqueness check —
    * needs its own groupBy, unlike the single-pass rules above).
    */
  def duplicateKeyCount(df: DataFrame, keyCol: String): Long =
    df.groupBy(keyCol).count().filter(col("count") > 1).count()
}
