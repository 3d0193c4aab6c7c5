package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Countries

/** Country-code mapping joins (J4/J5).
  *
  * J4 `replace_country_metadata` (`utils.py:117-155`): map one code
  * system to another through the packaged country table; non-matches
  * become null (the reference's documented semantics — rows then drop
  * in the M49 membership filter).
  *
  * J5 fuzzy name→ISO3 (`country_converter` usage, e.g.
  * `world_bank_api.py:177-180`): the one genuinely non-relational
  * dependency of the reference. Re-expressed as a broadcast dictionary
  * join on a normalised name key — exact names, curated aliases, and a
  * parenthetical-stripping normaliser. Divergence from the regex-based
  * original on exotic spellings is accepted and fixture-tested.
  */
object CountryCodes {

  /** Apply a code→code dictionary to a column; unmapped values → null. */
  def replaceCodes(df: DataFrame, colName: String, mapping: Map[String, String]): DataFrame =
    df.withColumn(colName,
      element_at(typedLit(mapping), col(colName).cast("string")))

  /** m49 (as string, zero-unpadded int) → iso3. */
  lazy val m49ToIso3: Map[String, String] =
    Countries.all.map(c => c.m49.toString -> c.iso3).toMap

  /** Accent-folding table applied identically on the Scala (map-key)
    * and Spark (column) sides — one source of truth so "Türkiye",
    * "Mexico"/"México", "Perú" all land on the same key. 1:1
    * char↔char, so it works through both `translate` and a char map. */
  private val accentFrom = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿ"
  private val accentTo = "aaaaaaceeeeiiiinoooooouuuuyy"
  private val accentMap: Map[Char, Char] = accentFrom.zip(accentTo).toMap

  /** Normalised-name key: lower, fold accents, drop parentheticals,
    * strip non-letters, collapse runs. */
  def normalizeName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(translate(lower(c), accentFrom, accentTo), "\\(.*?\\)", " "),
      "[^a-z]+", " "))

  private def normalize(s: String): String =
    s.toLowerCase.map(c => accentMap.getOrElse(c, c))
      .replaceAll("\\(.*?\\)", " ").replaceAll("[^a-z]+", " ").trim

  /** Curated aliases beyond the packaged names (the hand-maintained
    * core of the fuzzy matcher), keyed in normalized form. Covers the
    * name styles the reference's sources actually emit: World Bank API
    * short forms ("Korea, Rep.", "Venezuela, RB"), WHO/UN official
    * long forms without parentheses ("Iran, Islamic Republic of"),
    * SIPRI compass forms ("Korea, South"), and common informal names.
    * Parenthetical official forms ("Bolivia (Plurinational State of)")
    * need no alias — the normalizer strips parentheticals, so they
    * collapse onto the packaged short key. */
  val aliases: Map[String, String] = Map(
    "united states" -> "USA", "usa" -> "USA", "us" -> "USA", "u s" -> "USA",
    "united kingdom" -> "GBR", "uk" -> "GBR", "great britain" -> "GBR",
    "south korea" -> "KOR", "korea rep" -> "KOR", "republic of korea" -> "KOR",
    "korea south" -> "KOR", "korea" -> "KOR",
    "russia" -> "RUS", "vietnam" -> "VNM", "viet nam" -> "VNM",
    "bolivia" -> "BOL", "venezuela" -> "VEN", "iran" -> "IRN",
    "iran islamic rep" -> "IRN", "iran islamic republic of" -> "IRN",
    "venezuela rb" -> "VEN", "venezuela bolivarian republic of" -> "VEN",
    "bolivia plurinational state of" -> "BOL",
    "tanzania" -> "TZA", "tanzania united rep" -> "TZA",
    "united rep of tanzania" -> "TZA",
    "laos" -> "LAO", "lao pdr" -> "LAO",
    "turkey" -> "TUR", "turkiye" -> "TUR", "czech republic" -> "CZE",
    "slovak republic" -> "SVK", "holland" -> "NLD", "brasil" -> "BRA",
    "egypt arab rep" -> "EGY", "myanmar burma" -> "MMR", "burma" -> "MMR")

  lazy val nameToIso3: Map[String, String] =
    Countries.all.map(c => normalize(c.name) -> c.iso3).toMap ++
      aliases.map { case (k, v) => normalize(k) -> v }

  /** Fuzzy name→ISO3 as a broadcast-dictionary lookup; not-found →
    * null (reference `not_found=None`). */
  def namesToIso3(df: DataFrame, nameCol: String, out: String): DataFrame =
    df.withColumn(out,
      element_at(typedLit(nameToIso3), normalizeName(col(nameCol))))

  /** Sex-category standardisation (reference `SexEnum`,
    * `validation.py:18-30`, applied `healthdata_ghdx.py:76-83`). */
  val sexLabels: Map[String, String] = Map(
    "male" -> "Male", "m" -> "Male",
    "female" -> "Female", "f" -> "Female",
    "both" -> "Both", "both sexes" -> "Both",
    "other" -> "Other", "total" -> "Total",
    "not applicable" -> "Not applicable",
    "unknown" -> "Unknown", "non response" -> "Non response")

  def standardizeSex(c: Column): Column =
    coalesce(element_at(typedLit(sexLabels), lower(trim(c))), c)
}
