package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** License detection over file/document headers — the license-aware
  * filtering step every permissively-licensed code/text corpus needs
  * (The Stack's lineage: keep permissive, drop copyleft/unknown, and
  * record WHICH license for attribution). Two signals, in precedence
  * order:
  *
  *   1. an explicit `SPDX-License-Identifier:` tag (the machine-
  *      readable convention) — its id is taken VERBATIM;
  *   2. characteristic license-text phrases over the normalized header
  *      (lowercased, whitespace collapsed, first `headChars` chars —
  *      license boilerplate leads the file), most-specific first:
  *      Apache-2.0, GPL-3.0/2.0 ("or later" not distinguished),
  *      LGPL, AGPL, MPL-2.0, MIT, BSD-3-Clause vs BSD-2-Clause (the
  *      "neither the name" endorsement clause separates them),
  *      Unlicense, CC-BY(-SA)-4.0.
  *
  * Everything is a PURE column expression (contains/regexp over one
  * bounded substring) — codegen'd, no UDF, no shuffle; the
  * per-category booleans stay exact across engines so the oracle
  * replays the whole decision tree.
  */
object License {

  /** Normalized header: first `headChars` chars, lowercased,
    * whitespace collapsed — the text every phrase probe runs on.
    */
  def header(text: Column, headChars: Int = 1500): Column =
    lower(regexp_replace(substring(text, 1, headChars), "\\s+", " "))

  /** The SPDX tag's id, or null — `SPDX-License-Identifier: <id>`
    * case-insensitive, id = the token run to end-of-line.
    */
  def spdxId(text: Column, headChars: Int = 1500): Column = {
    val m = regexp_extract(substring(text, 1, headChars),
      "(?i)SPDX-License-Identifier:\\s*([A-Za-z0-9.+-]+(?:\\s+(?:OR|AND|WITH)\\s+[A-Za-z0-9.+-]+)*)",
      1)
    when(m =!= "", m)
  }

  /** `(license, method)`: the detected license id and how it was
    * found (`spdx` / `phrase` / `none` → license `unknown`).
    */
  def detect(text: Column, headChars: Int = 1500): Column = {
    val h = header(text, headChars)
    val spdx = spdxId(text, headChars)
    val phrase =
      when(h.contains("licensed under the apache license, version 2.0") ||
        h.contains("apache license version 2.0") ||
        h.contains("apache license, version 2.0"), "Apache-2.0")
      .when(h.contains("gnu affero general public license"), "AGPL-3.0")
      .when(h.contains("gnu lesser general public license"), "LGPL-3.0")
      .when(h.contains("gnu general public license") &&
        h.rlike("version 3|gplv3"), "GPL-3.0")
      .when(h.contains("gnu general public license") &&
        h.rlike("version 2|gplv2"), "GPL-2.0")
      .when(h.contains("mozilla public license") && h.contains("2.0"), "MPL-2.0")
      .when(h.contains("permission is hereby granted, free of charge"), "MIT")
      .when(h.contains("redistribution and use in source and binary forms") &&
        h.contains("neither the name"), "BSD-3-Clause")
      .when(h.contains("redistribution and use in source and binary forms"),
        "BSD-2-Clause")
      .when(h.contains("this is free and unencumbered software"), "Unlicense")
      .when(h.contains("creative commons attribution-sharealike 4.0"), "CC-BY-SA-4.0")
      .when(h.contains("creative commons attribution 4.0"), "CC-BY-4.0")
    struct(
      coalesce(spdx, phrase, lit("unknown")).as("license"),
      when(spdx.isNotNull, "spdx")
        .when(phrase.isNotNull, "phrase")
        .otherwise(lit("none")).as("method"))
  }

  /** Permissive-for-training gate over a DETECTED id — the policy set
    * most corpus builders start from (MIT/BSD/Apache/Unlicense/MPL/CC-BY;
    * copyleft and unknown excluded). Unknown SPDX ids gate false.
    */
  def isPermissive(license: Column): Column =
    license.isInCollection(Seq("MIT", "BSD-2-Clause", "BSD-3-Clause",
      "Apache-2.0", "Unlicense", "MPL-2.0", "CC-BY-4.0", "0BSD", "ISC",
      "CC0-1.0", "Zlib"))
}
