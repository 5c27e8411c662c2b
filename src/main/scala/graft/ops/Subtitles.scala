package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SubRip (.srt) subtitle parsing — the transcript side of a
  * speech/video corpus: every cue's time span and text, as PURE column
  * expressions (split on blank lines → per-cue regexp over the
  * timecode line → remaining lines joined) — no UDF, whole-stage
  * codegen, and the same arithmetic replays in any SQL engine.
  *
  * Tolerances (real subtitle rips are messy): CRLF and LF both split;
  * a missing/malformed timecode drops the cue (null span — filtered);
  * the numeric cue counter is ignored (renumbered rips are common);
  * multi-line cue text joins with a single space.
  */
object Subtitles {

  /** `ARRAY<STRUCT<start_ms, end_ms, text>>` of the document's cues. */
  def srtCues(srt: Column): Column = {
    val blocks = split(regexp_replace(srt, "\r\n", "\n"), "\n{2,}")
    val cue = transform(blocks, b => {
      val tc = regexp_extract(b,
        "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3}) *--> *" +
          "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})", 0)
      def part(i: Int): Column =
        regexp_extract(b,
          "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3}) *--> *" +
            "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})", i).cast("long")
      val startMs = part(1) * 3600000L + part(2) * 60000L +
        part(3) * 1000L + part(4)
      val endMs = part(5) * 3600000L + part(6) * 60000L +
        part(7) * 1000L + part(8)
      // text = the block's lines minus the numeric counter line and
      // the timecode line, joined with one space
      val lines = split(b, "\n")
      val textLines = filter(lines, l =>
        !l.rlike("^\\s*\\d+\\s*$") &&
          !l.rlike("\\d{2}:\\d{2}:\\d{2}[,.]\\d{3} *-->") &&
          (l =!= ""))
      val text = trim(regexp_replace(array_join(textLines, " "), "\\s+", " "))
      when(tc =!= "", struct(startMs.as("start_ms"), endMs.as("end_ms"),
        text.as("text")))
    })
    filter(cue, c => c.isNotNull)
  }

  /** WebVTT cues — same output shape as [[srtCues]], with the VTT
    * grammar: `WEBVTT` header and `NOTE`/`STYLE` blocks dropped,
    * OPTIONAL hours in timecodes (`MM:SS.mmm` is legal), cue settings
    * after the end timecode ignored, arbitrary cue-identifier lines
    * (not just numeric) skipped because the text is everything AFTER
    * the arrow line, inline markup (`<v Name>`, `<b>`, timestamps)
    * stripped.
    */
  def vttCues(vtt: Column): Column = {
    val blocks = split(regexp_replace(vtt, "\r\n", "\n"), "\n{2,}")
    val tcRe = "(?:(\\d+):)?(\\d{2}):(\\d{2})\\.(\\d{3})\\s*-->\\s*" +
      "(?:(\\d+):)?(\\d{2}):(\\d{2})\\.(\\d{3})"
    val cue = transform(blocks, b => {
      val tc = regexp_extract(b, tcRe, 0)
      def part(i: Int): Column = {
        // the hour group is optional: "" must become 0, and ANSI mode
        // refuses to cast "" — branch before the cast
        val g = regexp_extract(b, tcRe, i)
        coalesce(when(g =!= "", g).cast("long"), lit(0L))
      }
      val startMs = part(1) * 3600000L + part(2) * 60000L +
        part(3) * 1000L + part(4)
      val endMs = part(5) * 3600000L + part(6) * 60000L +
        part(7) * 1000L + part(8)
      val textRaw = regexp_extract(b, "(?s)-->[^\\n]*\\n(.*)$", 1)
      val text = trim(regexp_replace(
        regexp_replace(textRaw, "<[^>]*>", ""), "\\s+", " "))
      when(tc =!= "" && !trim(b).startsWith("NOTE") &&
        !trim(b).startsWith("STYLE") && !trim(b).startsWith("WEBVTT"),
        struct(startMs.as("start_ms"), endMs.as("end_ms"), text.as("text")))
    })
    filter(cue, c => c.isNotNull)
  }
}
